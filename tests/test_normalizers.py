"""Normalizer fitting/round-trip tests
(reference diffusion_model.py:10-97 semantics)."""
import jax.numpy as jnp
import numpy as np
import pytest

from npcd_tpu.models.diffusion.normalizers import (
    denormalize,
    fit_minus_one_to_one,
    fit_unit_gaussian,
    normalize,
)


def test_unit_gaussian_stats():
    rng = np.random.default_rng(0)
    data = rng.normal(3.0, 2.0, (3, 5000))
    stats = fit_unit_gaussian(data)
    np.testing.assert_allclose(np.asarray(stats.shift), data.mean(1), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(stats.scale)[0], data.std(ddof=1), rtol=1e-5)
    normed = (data - data.mean(1, keepdims=True)) / data.std(ddof=1)
    assert np.asarray(stats.min)[0] == pytest.approx(normed.min(), rel=1e-5)
    assert np.asarray(stats.max)[0] == pytest.approx(normed.max(), rel=1e-5)


def test_minus_one_to_one_bounds():
    rng = np.random.default_rng(1)
    data = rng.uniform(-5, 9, (4, 2000))
    stats = fit_minus_one_to_one(data)
    normed = (data - np.asarray(stats.shift)[:, None]) / np.asarray(stats.scale)[0]
    assert normed.min() >= -1 - 1e-5 and normed.max() <= 1 + 1e-5
    # the widest axis exactly spans [-1, 1]
    assert np.asarray(stats.max)[0] == pytest.approx(1.0, abs=1e-5)


def test_round_trip():
    rng = np.random.default_rng(2)
    data = rng.normal(0, 3, (3, 100))
    stats = fit_unit_gaussian(data)
    x = jnp.asarray(rng.normal(0, 3, (5, 3, 7)).astype(np.float32))
    np.testing.assert_allclose(
        np.asarray(denormalize(stats, normalize(stats, x))), np.asarray(x), rtol=1e-4, atol=1e-5
    )
