"""A/B: stage-2 train-step compiler options on the real TPU.

XLA_FLAGS can't carry TPU backend flags through the axon tunnel (the
local CPU XLA parser rejects them before the remote compile is reached),
but per-jit `compiler_options` travel inside the PJRT compile request.
This sweeps candidate options over the production 302M/batch-32 step and
prints steps/s per config — the closing evidence for the last ~7% of
stage-2 matmul-fusion overhead (docs/PERF.md ceiling section).

Usage: python tools/ab_stage2_flags.py [--iters 20]
"""
import argparse
import os.path as osp
import sys
import time

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

import jax
import jax.numpy as jnp

CONFIGS = [
    ("baseline", None),
    ("vmem32M", {"xla_tpu_scoped_vmem_limit_kib": "32768"}),
    ("vmem48M", {"xla_tpu_scoped_vmem_limit_kib": "49152"}),
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--config", default=None,
                    help="run a single named config (subprocess-friendly)")
    args = ap.parse_args()
    configs = [c for c in CONFIGS if args.config in (None, c[0])]

    from npcd_tpu.models.diffusion import DiffusionModel
    from npcd_tpu.train.diffusion_training import (
        DiffusionTrainState, make_diffusion_train_step)
    from npcd_tpu.train.fused_update import FusedAdamWEma
    from npcd_tpu.utils.ema import EmaConfig

    model = DiffusionModel(coords_dim=3, width=1024, layers=24, heads=16,
                           num_points=512, feats_dim=32, dtype=jnp.bfloat16,
                           remat=False)
    ema_cfgs = (EmaConfig.from_tuple((1, 0.9999, 0.9999, False)),)
    fused = FusedAdamWEma(7e-5, 0.01, ema_cfgs=ema_cfgs)
    tx = fused.make_tx()
    batch = 32
    p = model.num_points
    batch_data = {
        "coords": jax.random.normal(jax.random.PRNGKey(1), (batch, 3, p)),
        "feats": jax.random.normal(jax.random.PRNGKey(2),
                                   (batch, model.feats_dim, p)),
    }
    # the inner (unjitted) step so each config can re-jit with its options
    # (state is donated and rebuilt per config; non-donated OOMs 16G HBM)
    inner = make_diffusion_train_step(model, fused, ema_cfgs,
                                      donate=True).__wrapped__

    for name, opts in configs:
        dstate = model.init(jax.random.PRNGKey(0))
        state = DiffusionTrainState(
            params=dstate.params,
            opt_state=tx.init(dstate.params),
            ema_params=(jax.tree_util.tree_map(jnp.copy, dstate.params),),
            step=jnp.zeros((), jnp.int32),
            coords_norm=dstate.coords_norm,
            feats_norm=dstate.feats_norm,
        )
        kw = {"compiler_options": opts} if opts else {}
        try:
            step = jax.jit(inner, donate_argnums=(0,), **kw)
            state, metrics = step(state, batch_data, jax.random.PRNGKey(3))
            float(metrics["loss"])
        except Exception as e:
            print(f"RESULT {name}: FAILED {type(e).__name__}: {e}",
                  flush=True)
            continue
        t0 = time.perf_counter()
        for i in range(args.iters):
            state, metrics = step(
                state, batch_data,
                jax.random.fold_in(jax.random.PRNGKey(4), i))
        float(metrics["loss"])
        dt = (time.perf_counter() - t0) / args.iters
        print(f"RESULT {name}: {1.0/dt:.4f} steps/s ({dt*1e3:.1f} ms)",
              flush=True)


if __name__ == "__main__":
    main()
