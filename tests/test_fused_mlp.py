"""Fused-MLP Pallas kernel vs the XLA apply_mlp path (values + grads)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from npcd_tpu.models.pointnerf.nn_core import apply_mlp, init_mlp
from npcd_tpu.ops.pallas.fused_mlp import fused_mlp


def _setup(d_in=95, dims=(256, 256, 256, 256), d_out=256, m=70):
    layers = init_mlp(jax.random.PRNGKey(0), dims, d_in, d_out)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, m, d_in))
    return layers, x


def test_fused_mlp_interpret_matches_xla():
    layers, x = _setup()
    ref = apply_mlp(layers, x, impl="xla")
    weights = tuple((l["w"], l["b"]) for l in layers)
    try:
        with pltpu.force_tpu_interpret_mode():
            got = np.asarray(fused_mlp(x, weights, True))
    except Exception as e:  # pragma: no cover
        pytest.skip(f"pallas interpret mode unavailable: {e}")
    np.testing.assert_allclose(got, np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_fused_mlp_grads_match_xla():
    layers, x = _setup(d_in=64, dims=(128, 128), d_out=128, m=40)
    ct = jax.random.normal(jax.random.PRNGKey(2), (2, 40, 128))
    weights = tuple((l["w"], l["b"]) for l in layers)

    def loss_ref(x, weights):
        ls = [{"w": w, "b": b} for w, b in weights]
        return (apply_mlp(ls, x, impl="xla") * ct).sum()

    def loss_pl(x, weights):
        return (fused_mlp(x, weights, True) * ct).sum()

    ref_dx, ref_dw = jax.grad(loss_ref, argnums=(0, 1))(x, weights)
    try:
        with pltpu.force_tpu_interpret_mode():
            pl_dx, pl_dw = jax.grad(loss_pl, argnums=(0, 1))(x, weights)
            pl_dx = np.asarray(pl_dx)
            pl_dw = jax.tree_util.tree_map(np.asarray, pl_dw)
    except Exception as e:  # pragma: no cover
        pytest.skip(f"pallas interpret mode unavailable: {e}")
    np.testing.assert_allclose(pl_dx, np.asarray(ref_dx), rtol=1e-4, atol=1e-5)
    for (rw, rb), (pw, pb), i in zip(ref_dw, pl_dw, range(len(ref_dw))):
        np.testing.assert_allclose(pw, np.asarray(rw), rtol=1e-4, atol=1e-5,
                                   err_msg=f"dW{i}")
        np.testing.assert_allclose(pb, np.asarray(rb), rtol=1e-4, atol=1e-5,
                                   err_msg=f"db{i}")


def test_fused_mlp_small_out_dim():
    """shape_net-like head: d_out=1."""
    layers, x = _setup(d_in=256, dims=(256,), d_out=1, m=24)
    ref = apply_mlp(layers, x, impl="xla")
    weights = tuple((l["w"], l["b"]) for l in layers)
    try:
        with pltpu.force_tpu_interpret_mode():
            got = np.asarray(fused_mlp(x, weights, True))
    except Exception as e:  # pragma: no cover
        pytest.skip(f"pallas interpret mode unavailable: {e}")
    np.testing.assert_allclose(got, np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_fused_mlp_ragged_block_grads():
    """Regression: the ragged last row-block (rows % block size != 0) must
    not poison dW with out-of-bounds input rows (0 * garbage). Forces a
    tiny block size so m=37 spans 3 blocks with a ragged tail."""
    from npcd_tpu.ops.pallas import fused_mlp as fm

    layers, _ = _setup(d_in=64, dims=(128,), d_out=128, m=37)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 37, 64))
    ct = jax.random.normal(jax.random.PRNGKey(2), (1, 37, 128))
    weights = tuple((l["w"], l["b"]) for l in layers)

    def loss_ref(x, weights):
        ls = [{"w": w, "b": b} for w, b in weights]
        return (apply_mlp(ls, x, impl="xla") * ct).sum()

    def loss_pl(x, weights):
        return (fm.fused_mlp(x, weights, True) * ct).sum()

    ref_dx, ref_dw = jax.grad(loss_ref, argnums=(0, 1))(x, weights)
    orig_blk = fm._BLK
    fm._BLK = 16
    try:
        with pltpu.force_tpu_interpret_mode():
            pl_dx, pl_dw = jax.grad(loss_pl, argnums=(0, 1))(x, weights)
            pl_dx = np.asarray(pl_dx)
            pl_dw = jax.tree_util.tree_map(np.asarray, pl_dw)
    except Exception as e:  # pragma: no cover
        pytest.skip(f"pallas interpret mode unavailable: {e}")
    finally:
        fm._BLK = orig_blk
    assert np.isfinite(pl_dx).all()
    np.testing.assert_allclose(pl_dx, np.asarray(ref_dx), rtol=1e-4, atol=1e-5)
    for (rw, rb), (pw, pb) in zip(ref_dw, pl_dw):
        assert np.isfinite(pw).all() and np.isfinite(pb).all()
        np.testing.assert_allclose(pw, np.asarray(rw), rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(pb, np.asarray(rb), rtol=1e-4, atol=1e-5)
