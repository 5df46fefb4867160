"""True multi-process DP integration test.

Everything else in the suite emulates multi-host at the unit level (sharded
BatchLoader, broadcast trigger, wrap padding). This test runs the real
thing: two separate JAX processes form a Gloo-backed CPU cluster
(jax.distributed.initialize, 4 fake devices each -> one 8-device global
mesh) and run DiffusionTraining end to end over it — global batch assembly
via make_array_from_process_local_data, a dataset size that does NOT divide
by the process count (exercising the DistributedSampler-style wrap padding;
a desync would hang the collective step and trip the timeout), the
collective orbax checkpoint save at the end, and the resume path.
"""
import os
import os.path as osp
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = osp.dirname(osp.dirname(osp.abspath(__file__)))

WORKER = """
import os, sys
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
import jax
jax.config.update("jax_platforms", "cpu")
pid, nproc, port, out_dir = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3], sys.argv[4]
jax.distributed.initialize(f"localhost:{port}", num_processes=nproc, process_id=pid)
assert jax.process_count() == nproc and jax.device_count() == 4 * nproc

import numpy as np
from npcd_tpu.data import PointNeRFDataset
from npcd_tpu.models.diffusion import DiffusionModel
from npcd_tpu.parallel.mesh import make_mesh
from npcd_tpu.train import DiffusionTraining

rng = np.random.default_rng(0)  # same data on every process
n_obj, p, f = 9, 8, 4  # 9 objects over 2 shards: non-divisible -> wrap pad
ds = PointNeRFDataset(all_coords=rng.normal(size=(n_obj, p, 3)).astype(np.float32),
                      all_feats=rng.normal(size=(n_obj, p, f)).astype(np.float32))
dm = DiffusionModel(coords_dim=3, feats_dim=f, num_points=p,
                    width=16, layers=1, heads=2, attn_impl="einsum")
tr = DiffusionTraining(out_dir, dm, ds, batch_size=8, base_learning_rate=7e-5,
                       weight_decay=0.01, max_iterations=4, use_ema=True,
                       ema_params=[(1, 0.9999, 0.9999, False)],
                       save_checkpoint_interval_min=1e9, mesh=make_mesh())
state = tr()
leaf_sum = sum(float(abs(x).sum()) for x in jax.tree_util.tree_leaves(
    jax.device_get(state.params)))
with open(os.path.join(out_dir, f"result_{pid}.txt"), "w") as fh:
    fh.write(f"{leaf_sum:.10e}")

# resume path: a fresh Training over the same out_dir restores the final
# checkpoint and reports already-finished without running a step
tr2 = DiffusionTraining(out_dir, dm, ds, batch_size=8, base_learning_rate=7e-5,
                        weight_decay=0.01, max_iterations=4, use_ema=True,
                        ema_params=[(1, 0.9999, 0.9999, False)],
                        save_checkpoint_interval_min=1e9, mesh=make_mesh())
assert tr2.finished_iterations == 4, tr2.finished_iterations
print(f"proc {pid} OK", flush=True)
"""


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_diffusion_training(tmp_path):
    worker = tmp_path / "worker.py"
    worker.write_text(WORKER)
    port = _free_port()
    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    env["PYTHONPATH"] = REPO
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), str(i), "2", str(port), str(tmp_path)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            cwd=REPO, env=env,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=480)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("multi-process training hung (desync?)")
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out[-3000:]}"

    # both processes computed the identical replicated final state
    sums = [
        float((tmp_path / f"result_{i}.txt").read_text()) for i in range(2)
    ]
    assert sums[0] == pytest.approx(sums[1], rel=0, abs=0), sums
    assert np.isfinite(sums[0])

    # the collective orbax save produced exactly one shared checkpoint tree
    # (plus its qkv-layout-version sidecar, utils/checkpoint._LAYOUT_SUFFIX)
    ckpts = sorted(
        d for d in os.listdir(tmp_path / "checkpoints")
        if d.startswith("diffusion_training-iter-")
    )
    assert ckpts == [
        "diffusion_training-iter-000000004",
        "diffusion_training-iter-000000004.layout.json",
    ], ckpts
