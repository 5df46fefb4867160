"""End-to-end two-stage pipeline smoke tests (tiny shapes)."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from npcd_tpu.data import PointNeRFDataset, create_dataset
from npcd_tpu.models.diffusion import DiffusionModel
from npcd_tpu.models.pointnerf import PointNeRF, PointNeRFRenderConfig
from npcd_tpu.train import DiffusionTraining, PointNeRFTraining
from npcd_tpu.utils.config import pointnerf_default_options


@pytest.mark.slow
def test_two_stage_pipeline(tmp_path):
    ds = create_dataset("SyntheticNPCTrain", n_obj=4, num_views=2,
                        image_size=12, num_points=16, verbose=False)
    opts = pointnerf_default_options(num_points=16, feat_dim=4)
    opts = dataclasses.replace(
        opts,
        renderer=dataclasses.replace(opts.renderer, depth_resolution=16, ray_subsamples=24),
        aggregator=dataclasses.replace(opts.aggregator, max_shading_pts=6),
        default_resolution=12,
    )
    pn = PointNeRF(n_obj=4, feats_dim=4, num_points=16, opts=opts,
                   render_config=PointNeRFRenderConfig(train_rays=8, train_ray_chunk=8, eval_ray_chunk=48))
    tr = PointNeRFTraining(str(tmp_path / "pn"), pn, ds, batch_size=2,
                           base_learning_rate=1e-3, max_epochs=1,
                           save_checkpoint_interval_min=1e9, verbose=False)
    state = tr()
    assert int(state.step) == 2  # 4 objects / batch 2 * 1 epoch

    lat = PointNeRFDataset(pointnerf=pn, params=jax.device_get(state.params), verbose=False)
    dm = DiffusionModel(coords_dim=3, feats_dim=4, num_points=16,
                        width=16, layers=1, heads=2, attn_impl="einsum")
    dt = DiffusionTraining(str(tmp_path / "diff"), dm, lat, batch_size=2,
                           base_learning_rate=7e-5, weight_decay=0.01,
                           max_iterations=3, use_ema=True,
                           ema_params=[(1, 0.9999, 0.9999, False)],
                           save_checkpoint_interval_min=1e9,
                           weights_only_interval=10 ** 9, verbose=False)
    dstate = dt()
    assert int(dstate.step) == 3

    coords, feats = dm.generate(
        dstate.diffusion_state(params=dstate.ema_params[0]),
        jax.random.PRNGKey(0), num=2, batch_size=2,
    )
    assert coords.shape == (2, 3, 16) and feats.shape == (2, 4, 16)
    assert np.isfinite(coords).all() and np.isfinite(feats).all()
    # generated coords live in (roughly) the denormalized latent range
    assert np.abs(coords).max() < 50


@pytest.mark.slow
def test_pointnerf_overfits_single_scene(tmp_path):
    """Training on one tiny scene must reduce the reconstruction loss —
    the executable counterpart of the reference's PSNR regression."""
    import optax

    from npcd_tpu.losses import PointNeRFLossWeights, pointnerf_loss
    from npcd_tpu.train.pointnerf_training import (
        PointNeRFTrainState,
        make_pointnerf_optimizer,
        make_pointnerf_train_step,
    )

    ds = create_dataset("SyntheticNPCTrain", n_obj=2, num_views=2,
                        image_size=12, num_points=16, verbose=False)
    opts = pointnerf_default_options(num_points=16, feat_dim=4)
    opts = dataclasses.replace(
        opts,
        renderer=dataclasses.replace(opts.renderer, depth_resolution=16, ray_subsamples=32),
        aggregator=dataclasses.replace(opts.aggregator, max_shading_pts=6),
        default_resolution=12,
    )
    pn = PointNeRF(n_obj=2, feats_dim=4, num_points=16, opts=opts,
                   render_config=PointNeRFRenderConfig(train_rays=16, train_ray_chunk=16, eval_ray_chunk=48))
    params = pn.set_all_coords(pn.init_params(jax.random.PRNGKey(0)), ds.get_all_coords())
    # shrink the variational std (log_var -6) so the overfit signal isn't
    # swamped by unit-variance reparametrization noise within a short run
    params["feats_table"] = params["feats_table"].at[..., 4:].set(-6.0)
    tx = make_pointnerf_optimizer(5e-3)
    state = PointNeRFTrainState(params=params, opt_state=tx.init(params),
                                step=jnp.zeros((), jnp.int32))
    step = make_pointnerf_train_step(pn, tx, PointNeRFLossWeights(1.0, 1e-7, 3.5e-7))

    from npcd_tpu.data.dataset import collate

    batch = collate([ds[0], ds[1]])
    feed = {k: batch[k] for k in ("obj_idx", "images", "intrinsics", "extrinsics")}

    losses = []
    for i in range(200):
        state, metrics = step(state, feed, jax.random.fold_in(jax.random.PRNGKey(1), i))
        losses.append(float(metrics["loss"]))
    assert np.mean(losses[-10:]) < np.mean(losses[:5]) * 0.7, (np.mean(losses[:5]), np.mean(losses[-10:]))
