"""Ray sampling / AABB / compositing golden tests
(reference renderers/{renderer,volume_renderer,ray_sampler,math_utils}.py)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from npcd_tpu.models.pointnerf.math_utils import (
    fill_invalid_ray_limits,
    get_ray_limits_box,
)
from npcd_tpu.models.pointnerf.ray_sampler import generate_rays
from npcd_tpu.models.pointnerf.renderer import (
    composite_kp_weights,
    fix_shading_depths,
    ray_march,
    sample_depths,
)


def test_ray_box_limits_hit_and_miss():
    o = jnp.asarray([[0.0, 0.0, -5.0], [0.0, 5.0, -5.0]])
    d = jnp.asarray([[0.0, 0.0, 1.0], [0.0, 0.0, 1.0]])
    tmin, tmax = get_ray_limits_box(o, d, box_size=1.0)
    # central ray enters at z=-1 (t=4), exits z=1 (t=6)
    assert float(tmin[0, 0]) == pytest.approx(4.0)
    assert float(tmax[0, 0]) == pytest.approx(6.0)
    # ray at y=5 misses: (-1, -2) convention
    assert float(tmin[1, 0]) == -1.0 and float(tmax[1, 0]) == -2.0


def test_fill_invalid_ray_limits():
    start = jnp.asarray([[4.0], [-1.0]])
    end = jnp.asarray([[6.0], [-2.0]])
    s, e = fill_invalid_ray_limits(start, end)
    assert float(s[1, 0]) == 4.0 and float(e[1, 0]) == 6.0


def test_ray_sampler_center_pixel():
    res = 4
    focal = 10.0
    intr = jnp.asarray([[[focal, 0, res / 2], [0, focal, res / 2], [0, 0, 1]]])
    extr = jnp.eye(4)[None]  # camera at origin looking +z
    o, d = generate_rays(extr, intr, res)
    assert o.shape == (1, 16, 3) and d.shape == (1, 16, 3)
    np.testing.assert_allclose(np.asarray(o), 0.0, atol=1e-6)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(d), axis=-1), 1.0, rtol=1e-5)
    # all rays point forward (+z)
    assert (np.asarray(d)[..., 2] > 0).all()
    # pixel (row 1, col 1) center = (1.5, 1.5): dir x/z = (1.5-2)/10
    ray = np.asarray(d)[0, 1 * res + 1]
    np.testing.assert_allclose(ray[0] / ray[2], (1.5 - 2.0) / focal, rtol=1e-5)
    np.testing.assert_allclose(ray[1] / ray[2], (1.5 - 2.0) / focal, rtol=1e-5)


def test_ray_sampler_extrinsics_inversion():
    """world2cam with camera at (0,0,-3): rays originate there."""
    extr = jnp.eye(4).at[2, 3].set(3.0)[None]  # world2cam translate +3 in z
    intr = jnp.asarray([[[10.0, 0, 2], [0, 10.0, 2], [0, 0, 1]]])
    o, d = generate_rays(extr, intr, 4)
    np.testing.assert_allclose(np.asarray(o)[0, 0], [0, 0, -3.0], atol=1e-6)


def test_sample_depths_uniform_and_jitter():
    start = jnp.full((2, 3), 1.0)
    end = jnp.full((2, 3), 2.0)
    d = sample_depths(start, end, 5)
    np.testing.assert_allclose(np.asarray(d)[0, 0], [1.0, 1.25, 1.5, 1.75, 2.0], rtol=1e-6)
    dj = sample_depths(start, end, 5, rng=jax.random.PRNGKey(0))
    delta = 0.25
    assert (np.asarray(dj) >= np.asarray(d) - 1e-6).all()
    assert (np.asarray(dj) <= np.asarray(d) + delta + 1e-6).all()


def test_fix_shading_depths():
    depths = jnp.asarray([[1.0, 2.0, 0.0, 0.0]])
    mask = jnp.asarray([[True, True, False, False]])
    ray_end = jnp.asarray([9.0])
    d = np.asarray(fix_shading_depths(depths, mask, ray_end))
    # trailing invalid slots carry the last valid depth (cummax roll-forward)
    np.testing.assert_allclose(d, [[1.0, 2.0, 2.0, 2.0]])
    # all-invalid ray -> ray_end everywhere
    d2 = np.asarray(
        fix_shading_depths(depths, jnp.zeros_like(mask), ray_end)
    )
    np.testing.assert_allclose(d2, 9.0)


def test_ray_march_single_opaque_sample():
    """One very dense sample -> alpha ~1 -> channels = rgb of that sample."""
    sigma = jnp.asarray([[1e8, 0.0, 0.0]])
    depths = jnp.asarray([[1.0, 2.0, 3.0]])
    rgb = jnp.asarray([[[0.2, 0.4, 0.6], [0.9, 0.9, 0.9], [0.9, 0.9, 0.9]]])
    out = ray_march(sigma, depths, rgb, white_back=False)
    np.testing.assert_allclose(np.asarray(out["channels"])[0], [0.2, 0.4, 0.6], rtol=1e-5)
    assert float(out["mask"][0]) == pytest.approx(1.0)
    assert float(out["depth"][0]) == pytest.approx(1.0)


def test_ray_march_white_back():
    sigma = jnp.zeros((1, 3))
    depths = jnp.asarray([[1.0, 2.0, 3.0]])
    rgb = jnp.zeros((1, 3, 3))
    out = ray_march(sigma, depths, rgb, white_back=True)
    np.testing.assert_allclose(np.asarray(out["channels"])[0], 1.0, atol=1e-6)
    assert float(out["mask"][0]) == pytest.approx(0.0)


def test_ray_march_last_sample_zero_delta():
    """The trailing delta is zero (reference volume_renderer.py:36): the last
    sample never contributes."""
    sigma = jnp.asarray([[0.0, 0.0, 1e8]])
    depths = jnp.asarray([[1.0, 2.0, 3.0]])
    rgb = jnp.full((1, 3, 3), 0.5)
    out = ray_march(sigma, depths, rgb, white_back=False)
    assert float(out["mask"][0]) == pytest.approx(0.0)


def test_ray_march_two_semitransparent():
    """Hand-computed two-sample compositing."""
    import math

    s1, s2 = 1.0, 2.0
    d1, d2, d3 = 1.0, 1.5, 2.0
    sigma = jnp.asarray([[s1, s2, 0.0]])
    depths = jnp.asarray([[d1, d2, d3]])
    rgb = jnp.asarray([[[1.0, 0, 0], [0, 1.0, 0], [0, 0, 1.0]]])
    a1 = 1 - math.exp(-s1 * (d2 - d1))
    a2 = 1 - math.exp(-s2 * (d3 - d2))
    w1 = a1
    w2 = a2 * (1 - a1 + 1e-10)
    out = ray_march(sigma, depths, rgb, white_back=False)
    np.testing.assert_allclose(
        np.asarray(out["channels"])[0], [w1, w2, 0.0], rtol=1e-5
    )
    assert float(out["depth"][0]) == pytest.approx(
        (w1 * d1 + w2 * d2) / (w1 + w2), rel=1e-5
    )


def test_composite_kp_weights_oracle():
    """Dense kp_weights compositing == the reference's sparse index_add_
    formulation (renderer.py:177-184): composite[ray, p] = sum over valid
    (sample, neighbor) pairs with kp_idx == p of
    march_weight[sample] * agg_weight[pair], re-derived here in numpy from
    the sparse triple (shading_idx, kp_idx, weights)."""
    rng = np.random.default_rng(0)
    R, M, K, P = 5, 6, 3, 11
    sample_w = rng.uniform(size=(R, M)).astype(np.float32)
    agg_w = rng.uniform(size=(R, M, K)).astype(np.float32)
    nb_mask = rng.uniform(size=(R, M, K)) < 0.7
    agg_w = agg_w * nb_mask  # masked pairs carry zero weight (aggregator contract)
    nb_idx = rng.integers(0, P, size=(R, M, K))

    # sparse reference formulation: flatten valid pairs into triples
    expected = np.zeros((R, P), np.float32)
    for r in range(R):
        for m in range(M):
            for k in range(K):
                if nb_mask[r, m, k]:
                    expected[r, nb_idx[r, m, k]] += sample_w[r, m] * agg_w[r, m, k]

    got = composite_kp_weights(
        jnp.asarray(sample_w), jnp.asarray(agg_w), jnp.asarray(nb_idx), P
    )
    np.testing.assert_allclose(np.asarray(got), expected, rtol=1e-5, atol=1e-6)


def test_ray_march_sample_weights_partition():
    """return_weights exposes the per-sample compositing weights; they must
    reproduce mask (their sum) and channels (their contraction with rgb)."""
    sigma = jnp.asarray([[0.5, 2.0, 0.1, 0.0]])
    depths = jnp.asarray([[1.0, 1.2, 1.7, 2.0]])
    rgb = jax.random.uniform(jax.random.PRNGKey(0), (1, 4, 3))
    out = ray_march(sigma, depths, rgb, white_back=False, return_weights=True)
    w = np.asarray(out["sample_weights"])
    np.testing.assert_allclose(w.sum(-1), np.asarray(out["mask"]), rtol=1e-6)
    np.testing.assert_allclose(
        (w[..., None] * np.asarray(rgb)).sum(-2), np.asarray(out["channels"]),
        rtol=1e-6,
    )


def test_posenc_recurrence_matches_direct():
    from npcd_tpu.models.pointnerf.nn_core import positional_encoding

    x = jax.random.uniform(jax.random.PRNGKey(0), (100, 3), minval=-1, maxval=1)
    direct = positional_encoding(x, 10, method="direct")
    rec = positional_encoding(x, 10, method="recurrence")
    assert direct.shape == rec.shape == (100, 63)
    np.testing.assert_allclose(np.asarray(rec), np.asarray(direct), atol=1e-2)


def test_posenc_anchored_matches_direct():
    """The production default: anchored recurrence must stay within one
    bf16 ulp of the reference 'direct' evaluation (the qualified bound in
    utils/config.AggregatorOptions)."""
    from npcd_tpu.models.pointnerf.nn_core import positional_encoding

    x = jax.random.uniform(jax.random.PRNGKey(0), (20000, 3), minval=-1,
                           maxval=1)
    direct = positional_encoding(x, 10, method="direct")
    anc = positional_encoding(x, 10, method="anchored")
    np.testing.assert_allclose(np.asarray(anc), np.asarray(direct), atol=2e-5)
    # anchor octaves (0 and 5) are bitwise equal to direct. Layout:
    # [x (3 cols) | per-dim 20-col blocks of [sin0..9, cos0..9]]
    d_np, a_np = np.asarray(direct), np.asarray(anc)
    for d in range(3):
        for j in (0, 5, 10, 15):  # sin0, sin5, cos0, cos5
            col = 3 + d * 20 + j
            np.testing.assert_array_equal(a_np[:, col], d_np[:, col])
    # the bf16 cast absorbs nearly all of the residual deviation
    bd = np.asarray(direct.astype(jnp.bfloat16))
    ba = np.asarray(anc.astype(jnp.bfloat16))
    assert (bd != ba).mean() < 1e-3
