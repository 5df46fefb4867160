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
