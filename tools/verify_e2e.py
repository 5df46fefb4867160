#!/usr/bin/env python
"""End-to-end CPU verification drive: both training stages, eval, generation.

The checked-in form of the verify-skill recipe (.claude/skills/verify):
dataset factory -> PointNeRF training -> PSNR eval -> latent dataset ->
diffusion training (EMA) -> scan-sampler generation, all at tiny geometry
on a forced-CPU backend. Exits non-zero on any failure; ~1-3 min on one
core.

    python tools/verify_e2e.py
"""
import os
import os.path as osp
import sys
import tempfile

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import dataclasses  # noqa: E402

from npcd_tpu.data import PointNeRFDataset, create_dataset  # noqa: E402
from npcd_tpu.eval import PointNeRFEvaluation  # noqa: E402
from npcd_tpu.models.diffusion import DiffusionModel  # noqa: E402
from npcd_tpu.models.pointnerf import PointNeRF, PointNeRFRenderConfig  # noqa: E402
from npcd_tpu.train import DiffusionTraining, PointNeRFTraining  # noqa: E402
from npcd_tpu.utils.config import pointnerf_default_options  # noqa: E402


def main() -> None:
    td = tempfile.mkdtemp(prefix="npcd_verify_")
    ds = create_dataset("SyntheticNPCTrain", n_obj=8, num_views=2,
                        image_size=16, num_points=32)
    opts = pointnerf_default_options(num_points=32, feat_dim=8)
    opts = dataclasses.replace(
        opts,
        renderer=dataclasses.replace(opts.renderer, depth_resolution=24,
                                     ray_subsamples=32),
        aggregator=dataclasses.replace(opts.aggregator, max_shading_pts=8),
        default_resolution=16,
    )
    pn = PointNeRF(
        n_obj=8, feats_dim=8, num_points=32, opts=opts,
        render_config=PointNeRFRenderConfig(train_rays=16, train_ray_chunk=16,
                                            eval_ray_chunk=64),
    )
    tr = PointNeRFTraining(osp.join(td, "pn"), pn, ds, batch_size=4,
                           base_learning_rate=1e-3, max_epochs=2,
                           save_checkpoint_interval_min=1e9)
    state = tr()
    print("stage1 done")

    ev = PointNeRFEvaluation(osp.join(td, "pn_eval"), eval_batch_size=1)
    frame = ev(ds, pn, jax.device_get(state.params), samples=2, resolution=16)
    print("eval PSNR:", float(frame["psnr"].mean()))

    lat = PointNeRFDataset(pointnerf=pn, params=jax.device_get(state.params))
    dm = DiffusionModel(coords_dim=3, feats_dim=8, num_points=32, width=32,
                        layers=1, heads=2)
    dt = DiffusionTraining(osp.join(td, "diff"), dm, lat, batch_size=4,
                           base_learning_rate=7e-5, weight_decay=0.01,
                           max_iterations=5, use_ema=True,
                           ema_params=[(1, 0.9999, 0.9999, False)],
                           save_checkpoint_interval_min=1e9)
    dstate = dt()
    print("stage2 done")

    c, f = dm.generate(dstate.diffusion_state(params=dstate.ema_params[0]),
                       jax.random.PRNGKey(0), num=2, batch_size=2)
    assert c.shape == (2, 3, 32) and f.shape == (2, 8, 32), (c.shape, f.shape)
    print("generated:", c.shape, f.shape)
    print("E2E VERIFY OK")


if __name__ == "__main__":
    main()
