"""PointNeRF forward/gradient behavior tests."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from npcd_tpu.data.synthetic import random_cameras
from npcd_tpu.models.pointnerf import PointNeRF, PointNeRFRenderConfig
from npcd_tpu.utils.config import pointnerf_default_options


@pytest.fixture(scope="module")
def setup():
    opts = pointnerf_default_options(num_points=24, feat_dim=8)
    opts = dataclasses.replace(
        opts,
        renderer=dataclasses.replace(opts.renderer, depth_resolution=24, ray_subsamples=32),
        aggregator=dataclasses.replace(opts.aggregator, max_shading_pts=8),
        default_resolution=12,
    )
    pn = PointNeRF(
        n_obj=3, feats_dim=8, num_points=24, opts=opts,
        render_config=PointNeRFRenderConfig(train_rays=12, train_ray_chunk=8, eval_ray_chunk=48),
    )
    params = pn.init_params(jax.random.PRNGKey(0))
    coords = jax.random.uniform(jax.random.PRNGKey(1), (3, 24, 3), minval=-0.4, maxval=0.4)
    params = pn.set_all_coords(params, coords)
    extr, intr = random_cameras(2, 12, seed=3)
    extr = jnp.tile(jnp.asarray(extr)[None], (2, 1, 1, 1))
    intr = jnp.tile(jnp.asarray(intr)[None], (2, 1, 1, 1))
    return pn, params, extr, intr


def test_forward_shapes_train(setup):
    pn, params, extr, intr = setup
    pred, aux = pn.forward(params, jnp.array([0, 1]), intr, extr,
                           rng=jax.random.PRNGKey(2), train=True)
    assert pred["channels"].shape == (2, 2, 12, 3)
    assert pred["ray_idx"].shape == (2, 2, 12)
    assert aux["feats_mean"].shape == (2, 24, 8)
    # ray indices are valid pixel ids
    assert (np.asarray(pred["ray_idx"]) >= 0).all()
    assert (np.asarray(pred["ray_idx"]) < 144).all()


def test_forward_eval_full_resolution(setup):
    pn, params, extr, intr = setup
    pred, _ = pn.forward(params, jnp.array([0, 1]), intr, extr, train=False)
    assert pred["channels"].shape == (2, 2, 144, 3)
    ch = np.asarray(pred["channels"])
    # white background where rays miss everything
    invalid = ~np.asarray(pred["ray_valid"])
    assert invalid.any()
    np.testing.assert_allclose(ch[invalid], 1.0, atol=1e-5)
    assert (ch >= 0).all() and (ch <= 1 + 1e-5).all()


def test_render_explicit_cloud(setup):
    pn, params, extr, intr = setup
    coords = jax.random.uniform(jax.random.PRNGKey(5), (1, 24, 3), minval=-0.4, maxval=0.4)
    feats = jax.random.normal(jax.random.PRNGKey(6), (1, 24, 8)) * 0.1
    out = pn.render(params, coords, feats, extr[:1], intr[:1], resolution=12)
    assert out["channels"].shape == (1, 2, 144, 3)
    assert np.isfinite(np.asarray(out["channels"])).all()


def test_gradients_respect_frozen_coords(setup):
    pn, params, extr, intr = setup

    def loss_fn(p):
        pred, aux = pn.forward(p, jnp.array([0, 1]), intr, extr,
                               rng=jax.random.PRNGKey(3), train=True)
        valid = pred["ray_valid"][..., None]
        return jnp.sum(pred["channels"] * valid) + jnp.sum(aux["feats_mean"] ** 2) * 0.0

    grads = jax.grad(loss_fn)(params)
    # feats table gets gradient (through reparametrized render)
    assert np.abs(np.asarray(grads["feats_table"])).max() > 0
    # aggregator MLP gets gradient
    assert np.abs(np.asarray(grads["aggregator"]["local_field"][0]["w"])).max() > 0
    # coords influence only via stop_gradient paths -> zero gradient
    assert np.abs(np.asarray(grads["coords_table"])).max() == 0


def test_train_eval_rays_consistent(setup):
    """Rendering the pixels selected in train mode should roughly agree with
    the same pixels from a full eval render using mean feats (train-mode
    variational sampling is the only stochastic difference; zero-init
    log_var gives std 1, so compare masks not colors)."""
    pn, params, extr, intr = setup
    pred_t, _ = pn.forward(params, jnp.array([0, 1]), intr, extr,
                           rng=jax.random.PRNGKey(4), train=True)
    pred_e, _ = pn.forward(params, jnp.array([0, 1]), intr, extr, train=False)
    idx = np.asarray(pred_t["ray_idx"])  # [B, V, R]
    valid_t = np.asarray(pred_t["ray_valid"])
    valid_e = np.take_along_axis(np.asarray(pred_e["ray_valid"]), idx, axis=2)
    # train-selected valid rays are overwhelmingly valid in the eval pass too
    # (train depth jitter can flip validity of grazing rays, so not exactly all)
    agreement = valid_e[valid_t].mean() if valid_t.any() else 1.0
    assert agreement > 0.85, agreement
