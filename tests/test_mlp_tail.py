"""Fused-bias-grad Dense (ops/mlp_tail.py).

Plain autodiff over the same expression is the executable spec; the fused
custom-vjp path (production c_fc on TPU) must match forward byte-exactly
and all three gradients numerically (db changes only reduction algorithm:
MXU f32 row accumulation instead of a VPU tree reduce).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from npcd_tpu.ops.mlp_tail import _dense_fused_bias_grad, _plain_dense, dense_bias_in_dw


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_fused_bias_grad_matches_autodiff(dtype):
    m, fin, fout = 24, 64, 128
    kx, kk, kb, kg = jax.random.split(jax.random.PRNGKey(0), 4)
    x = jax.random.normal(kx, (m, fin)).astype(dtype)
    kernel = jax.random.normal(kk, (fin, fout)) * 0.05
    bias = jax.random.normal(kb, (fout,)) * 0.1
    dy = jax.random.normal(kg, (m, fout))

    def loss(f):
        # a nonlinear consumer so the cotangent at the dense output is an
        # expression (the production situation), not a constant
        return lambda x, k, b: jnp.vdot(
            jnp.tanh(f(x, k, b).astype(jnp.float32)), dy)

    y0 = _plain_dense(x, kernel, bias, dtype)
    y1 = _dense_fused_bias_grad(x, kernel, bias, dtype)
    np.testing.assert_array_equal(np.asarray(y0), np.asarray(y1))

    g0 = jax.grad(loss(lambda x, k, b: _plain_dense(x, k, b, dtype)),
                  argnums=(0, 1, 2))(x, kernel, bias)
    g1 = jax.grad(loss(lambda x, k, b: _dense_fused_bias_grad(x, k, b, dtype)),
                  argnums=(0, 1, 2))(x, kernel, bias)
    tol = dict(rtol=2e-2, atol=2e-2) if dtype == jnp.bfloat16 else dict(
        rtol=1e-5, atol=1e-6)
    for ref, got, name in zip(g0[:2], g1[:2], ("dx", "dkernel")):
        assert ref.dtype == got.dtype, name
        np.testing.assert_allclose(
            np.asarray(ref, np.float32), np.asarray(got, np.float32),
            err_msg=name, **tol)
    # db differs in reduction algorithm only (MXU f32 row accumulation vs
    # autodiff's storage-dtype tree reduce): check both against the exact
    # f64 colsum of the incoming cotangent, fused at least as accurate
    assert g0[2].dtype == g1[2].dtype
    y = _plain_dense(x, kernel, bias, dtype)
    g_at_dense = jax.grad(
        lambda yy: jnp.vdot(jnp.tanh(yy.astype(jnp.float32)), dy))(y)
    db_exact = np.sum(np.asarray(g_at_dense, np.float64), axis=0)
    err_plain = np.abs(np.asarray(g0[2], np.float64) - db_exact).max()
    err_fused = np.abs(np.asarray(g1[2], np.float64) - db_exact).max()
    assert err_fused <= err_plain + 1e-6, (err_fused, err_plain)


def test_auto_dispatch_plain_off_tpu():
    """On CPU "auto" must take the plain path (== spec by construction)."""
    x = jax.random.normal(jax.random.PRNGKey(1), (8, 64), jnp.float32)
    kernel = jax.random.normal(jax.random.PRNGKey(2), (64, 32)) * 0.05
    bias = jnp.ones((32,))
    y = dense_bias_in_dw(x, kernel, bias, jnp.float32)
    np.testing.assert_array_equal(
        np.asarray(y), np.asarray(_plain_dense(x, kernel, bias, jnp.float32))
    )


def test_fusedbiasgrad_dense_param_tree_and_forward():
    """FusedBiasGradDense keeps nn.Dense's c_fc param tree and forward
    values, so checkpoints and the torch weight converter are unaffected."""
    import flax.linen as nn

    from npcd_tpu.models.diffusion.transformer import FusedBiasGradDense

    class Ref(nn.Module):
        @nn.compact
        def __call__(self, x):
            return nn.Dense(
                24, kernel_init=nn.initializers.normal(0.02), name="c_fc")(x)

    class New(nn.Module):
        @nn.compact
        def __call__(self, x):
            return FusedBiasGradDense(
                features=24, kernel_init=nn.initializers.normal(0.02),
                name="c_fc")(x)

    x = jax.random.normal(jax.random.PRNGKey(3), (8, 64))
    p_ref = Ref().init(jax.random.PRNGKey(4), x)["params"]
    p_new = New().init(jax.random.PRNGKey(4), x)["params"]
    assert jax.tree_util.tree_structure(p_ref) == jax.tree_util.tree_structure(p_new)
    for r, n in zip(jax.tree_util.tree_leaves(p_ref), jax.tree_util.tree_leaves(p_new)):
        np.testing.assert_array_equal(np.asarray(r), np.asarray(n))
    y_ref = Ref().apply({"params": p_ref}, x)
    y_new = New().apply({"params": p_new}, x)
    np.testing.assert_array_equal(np.asarray(y_ref), np.asarray(y_new))
