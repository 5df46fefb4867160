"""Stage-1 loss golden tests (reference npcd/losses/)."""
import jax.numpy as jnp
import numpy as np
import pytest

from npcd_tpu.losses import (
    image_reconstruction_loss,
    neural_point_cloud_kl_loss,
    neural_point_cloud_tv_loss,
)
from npcd_tpu.utils.config import pointnerf_default_options


def test_kl_closed_form():
    # KL(N(mu, sigma^2) || N(0,1)) summed over feat dim, mean over (B, P)
    mean = jnp.asarray([[[1.0, 0.0]]])
    log_var = jnp.asarray([[[0.0, jnp.log(4.0)]]])
    aux = {"feats_mean": mean, "feats_log_var": log_var}
    # per-dim: -0.5*(1 + lv - mu^2 - e^lv)
    expected = -0.5 * ((1 + 0 - 1 - 1) + (1 + np.log(4) - 0 - 4))
    got = float(neural_point_cloud_kl_loss(aux, weight=2.0))
    assert got == pytest.approx(2.0 * expected, rel=1e-5)


def test_kl_zero_at_standard_normal_init():
    aux = {
        "feats_mean": jnp.zeros((2, 4, 3)),
        "feats_log_var": jnp.zeros((2, 4, 3)),
    }
    assert float(neural_point_cloud_kl_loss(aux)) == 0.0


def test_tv_two_point_cloud():
    """Two points, distance 0.1 (inside radius): TV per point =
    w * |f_i - f_j|_1 with w = 1/(0.1 + 1e-5); self-pairs contribute 0."""
    opts = pointnerf_default_options(num_points=2, feat_dim=2)
    coords = jnp.asarray([[[0.0, 0, 0], [0.1, 0, 0]]])
    feats = jnp.asarray([[[1.0, 2.0], [2.0, 4.0]]])
    aux = {"coords": coords, "feats": feats}
    w = 1.0 / (0.1 + 1e-5)
    per_point = w * 3.0  # |1-2| + |2-4| = 3 for both directions
    expected = per_point  # mean over 2 points, both equal
    got = float(neural_point_cloud_tv_loss(aux, opts, weight=1.0))
    assert got == pytest.approx(expected, rel=1e-4)


def test_tv_out_of_radius_is_zero():
    opts = pointnerf_default_options(num_points=2, feat_dim=2)
    coords = jnp.asarray([[[0.0, 0, 0], [0.9, 0, 0]]])  # 0.9 > radius 0.16
    feats = jnp.asarray([[[1.0, 2.0], [5.0, 4.0]]])
    aux = {"coords": coords, "feats": feats}
    assert float(neural_point_cloud_tv_loss(aux, opts)) == 0.0


def test_recon_masked_gather():
    gt = jnp.arange(2 * 1 * 4 * 3, dtype=jnp.float32).reshape(2, 1, 4, 3) / 10
    pred = {
        "channels": jnp.zeros((2, 1, 2, 3)),
        "ray_idx": jnp.asarray([[[0, 2]], [[1, 3]]]),
        "ray_valid": jnp.asarray([[[True, False]], [[True, True]]]),
    }
    got = float(image_reconstruction_loss(gt, pred))
    # masked mean over the 3 valid rays' squared pixels
    g = np.asarray(gt)
    sel = np.stack([g[0, 0, 0], g[1, 0, 1], g[1, 0, 3]])
    assert got == pytest.approx(float((sel ** 2).mean()), rel=1e-5)


def test_presampled_images_step_matches_full_frame():
    """host_pixel_presample path: a step fed only the presampled pixel
    subset ([B, V, R_pre, 3] + draws['pixel_idx']) must produce the SAME
    loss and gradients as the full-frame path with the same injected
    pixel_idx — the gather moves from device (by flat pixel id) to host
    (slice) + device (by in-presample position)."""
    import dataclasses

    import jax

    from npcd_tpu.data.synthetic import random_cameras
    from npcd_tpu.models.pointnerf import PointNeRF, PointNeRFRenderConfig
    from npcd_tpu.train.pointnerf_training import (
        PointNeRFTrainState,
        make_pointnerf_optimizer,
        make_pointnerf_train_step,
    )

    res, n_obj, p = 12, 3, 16
    opts = pointnerf_default_options(num_points=p, feat_dim=8)
    opts = dataclasses.replace(
        opts,
        renderer=dataclasses.replace(
            opts.renderer, depth_resolution=12, ray_subsamples=24
        ),
        aggregator=dataclasses.replace(opts.aggregator, max_shading_pts=6),
        default_resolution=res,
    )
    pn = PointNeRF(
        n_obj=n_obj, feats_dim=8, num_points=p, opts=opts,
        render_config=PointNeRFRenderConfig(train_rays=16, train_ray_chunk=8),
    )
    params = pn.init_params(jax.random.PRNGKey(0))
    coords = jax.random.uniform(
        jax.random.PRNGKey(1), (n_obj, p, 3), minval=-0.4, maxval=0.4
    )
    params = pn.set_all_coords(params, coords)
    tx = make_pointnerf_optimizer(1e-3)
    state = PointNeRFTrainState(
        params=params, opt_state=tx.init(params), step=jnp.zeros((), jnp.int32)
    )
    extr, intr = random_cameras(2, res, seed=3)
    images = jax.random.uniform(jax.random.PRNGKey(4), (n_obj, 2, res * res, 3))
    pixel_idx = np.random.default_rng(5).choice(
        res * res, size=24, replace=False
    ).astype(np.int32)
    base = {
        "obj_idx": jnp.arange(n_obj),
        "intrinsics": jnp.tile(jnp.asarray(intr)[None], (n_obj, 1, 1, 1)),
        "extrinsics": jnp.tile(jnp.asarray(extr)[None], (n_obj, 1, 1, 1)),
    }
    from npcd_tpu.losses import PointNeRFLossWeights

    lw = PointNeRFLossWeights(1.0, 1e-7, 3.5e-7)
    step_full = make_pointnerf_train_step(pn, tx, lw, donate=False)
    step_pre = make_pointnerf_train_step(
        pn, tx, lw, donate=False, presampled_images=True
    )
    rng = jax.random.PRNGKey(7)
    s_full, m_full = step_full(
        state,
        {**base, "images": images,
         "draws": {"pixel_idx": jnp.asarray(pixel_idx)}},
        rng,
    )
    s_pre, m_pre = step_pre(
        state,
        {**base, "images": images[:, :, pixel_idx, :],
         "draws": {"pixel_idx": jnp.asarray(pixel_idx)}},
        rng,
    )
    np.testing.assert_allclose(
        float(m_full["loss"]), float(m_pre["loss"]), rtol=0, atol=0
    )
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        s_full.params, s_pre.params,
    )
