"""Attention backend equivalence tests (reference transformer.py:68-84)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from npcd_tpu.ops.attention import multi_head_attention


def _qkv(b=2, s=9, h=2, d=4, seed=0):
    ks = jax.random.split(jax.random.PRNGKey(seed), 3)
    shape = (b, s, h, d)
    return tuple(jax.random.normal(k, shape) for k in ks)


def test_einsum_matches_numpy():
    q, k, v = _qkv()
    out = np.asarray(multi_head_attention(q, k, v, impl="einsum"))
    qn, kn, vn = map(np.asarray, (q, k, v))
    d = qn.shape[-1]
    # [B, H, S, S]
    logits = np.einsum("bthc,bshc->bhts", qn, kn) / np.sqrt(d)
    w = np.exp(logits - logits.max(-1, keepdims=True))
    w = w / w.sum(-1, keepdims=True)
    expected = np.einsum("bhts,bshc->bthc", w, vn)
    np.testing.assert_allclose(out, expected, rtol=1e-4, atol=1e-5)


def test_xla_matches_einsum():
    q, k, v = _qkv(seed=1)
    out_e = np.asarray(multi_head_attention(q, k, v, impl="einsum"))
    out_x = np.asarray(multi_head_attention(q, k, v, impl="xla"))
    np.testing.assert_allclose(out_e, out_x, rtol=1e-4, atol=1e-5)


def test_pallas_interpret_matches_einsum():
    """Run the Pallas kernel in interpreter mode on CPU against the einsum
    reference, including the padded-sequence masking (S=9 -> padded 128)."""
    from jax.experimental.pallas import tpu as pltpu

    q, k, v = _qkv(b=1, s=9, h=2, d=64, seed=2)
    out_e = np.asarray(multi_head_attention(q, k, v, impl="einsum"))
    try:
        with pltpu.force_tpu_interpret_mode():
            out_p = np.asarray(multi_head_attention(q, k, v, impl="pallas"))
    except Exception as e:  # pragma: no cover - interpret mode support varies
        pytest.skip(f"pallas interpret mode unavailable: {e}")
    np.testing.assert_allclose(out_e, out_p, rtol=1e-4, atol=1e-5)


def test_pallas_bwd_interpret_matches_einsum_grads():
    """The Pallas backward kernel (dq/dk/dv) vs XLA autodiff of the einsum
    formulation, in interpreter mode on CPU, with S=9 padded to 128 so the
    padded-row/column handling of the bwd kernel is exercised."""
    from jax.experimental.pallas import tpu as pltpu

    q, k, v = _qkv(b=2, s=9, h=2, d=64, seed=4)
    cotangent = jax.random.normal(jax.random.PRNGKey(5), q.shape)

    def loss(impl):
        def f(q, k, v):
            out = multi_head_attention(q, k, v, impl=impl)
            return (out * cotangent).sum()
        return f

    grads_e = jax.grad(loss("einsum"), argnums=(0, 1, 2))(q, k, v)
    try:
        with pltpu.force_tpu_interpret_mode():
            grads_p = jax.grad(loss("pallas"), argnums=(0, 1, 2))(q, k, v)
            grads_p = jax.tree_util.tree_map(np.asarray, grads_p)
    except Exception as e:  # pragma: no cover - interpret mode support varies
        pytest.skip(f"pallas interpret mode unavailable: {e}")
    for ge, gp, name in zip(grads_e, grads_p, "qkv"):
        np.testing.assert_allclose(
            np.asarray(ge), gp, rtol=1e-4, atol=1e-5, err_msg=f"d{name}"
        )


def test_fused_qkv_pallas_interpret_matches_einsum():
    """The zero-copy fused-qkv kernel (fwd + bwd) vs the einsum path, on the
    global [Q|K|V] channel layout."""
    from jax.experimental.pallas import tpu as pltpu

    from npcd_tpu.ops.attention import fused_qkv_attention

    b, s, h, d = 2, 9, 2, 64
    qkv = jax.random.normal(jax.random.PRNGKey(7), (b, s, 3 * h * d))
    ct = jax.random.normal(jax.random.PRNGKey(8), (b, s, h * d))

    def loss(impl):
        return lambda qkv: (fused_qkv_attention(qkv, h, impl=impl) * ct).sum()

    out_e = np.asarray(fused_qkv_attention(qkv, h, impl="einsum"))
    grad_e = np.asarray(jax.grad(loss("einsum"))(qkv))
    try:
        with pltpu.force_tpu_interpret_mode():
            out_p = np.asarray(fused_qkv_attention(qkv, h, impl="pallas"))
            grad_p = np.asarray(jax.grad(loss("pallas"))(qkv))
    except Exception as e:  # pragma: no cover - interpret mode support varies
        pytest.skip(f"pallas interpret mode unavailable: {e}")
    np.testing.assert_allclose(out_e, out_p, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(grad_e, grad_p, rtol=1e-4, atol=1e-5)


def test_attention_gradients_flow():
    q, k, v = _qkv(seed=3)

    def f(q, k, v):
        return multi_head_attention(q, k, v, impl="einsum").sum()

    grads = jax.grad(f, argnums=(0, 1, 2))(q, k, v)
    for g in grads:
        assert np.isfinite(np.asarray(g)).all()
        assert np.abs(np.asarray(g)).max() > 0


def test_grouped_qkv_split_matches_permutation():
    """split_grouped_qkv on a grouped-layout tensor returns the same q/k/v a
    global-layout split returns after the inverse column permutation."""
    from npcd_tpu.ops.attention import split_grouped_qkv

    b, s, h, d, groups = 2, 5, 4, 8, 2
    w = h * d
    rng = np.random.default_rng(0)
    qkv_g = rng.normal(size=(b, s, 3 * w)).astype(np.float32)

    q, k, v = split_grouped_qkv(jnp.asarray(qkv_g), h, groups)
    # manual unpack: group g occupies columns [g*3*wg, (g+1)*3*wg), ordered
    # [Q_g | K_g | V_g], heads contiguous within each third
    hg = h // groups
    wg = hg * d
    x = qkv_g.reshape(b, s, groups, 3, hg, d)
    np.testing.assert_array_equal(
        np.asarray(q), x[:, :, :, 0].reshape(b, s, h, d))
    np.testing.assert_array_equal(
        np.asarray(k), x[:, :, :, 1].reshape(b, s, h, d))
    np.testing.assert_array_equal(
        np.asarray(v), x[:, :, :, 2].reshape(b, s, h, d))


@pytest.mark.parametrize("groups", [2, 4])
def test_fused_qkv_grouped_einsum_matches_global(groups):
    """The einsum path on a grouped layout == global layout on the
    correspondingly permuted channels (pure relabeling)."""
    from npcd_tpu.ops.attention import fused_qkv_attention

    b, s, h, d = 2, 7, 4, 8
    w = h * d
    rng = np.random.default_rng(3)
    qkv_g = rng.normal(size=(b, s, 3 * w)).astype(np.float32)

    hg = h // groups
    # grouped -> global [Q|K|V]: [B,S,G,3,hg,d] -> [B,S,3,G,hg,d]
    qkv_glob = (
        qkv_g.reshape(b, s, groups, 3, hg, d)
        .transpose(0, 1, 3, 2, 4, 5)
        .reshape(b, s, 3 * w)
    )
    out_g = fused_qkv_attention(
        jnp.asarray(qkv_g), h, impl="einsum", groups=groups)
    out_glob = fused_qkv_attention(jnp.asarray(qkv_glob), h, impl="einsum")
    np.testing.assert_allclose(
        np.asarray(out_g), np.asarray(out_glob), rtol=1e-5, atol=1e-6)


def test_fused_qkv_grouped_pallas_interpret_matches_einsum():
    """The Pallas kernel's grouped index maps (fwd + bwd), groups=2, vs the
    grouped einsum path — including valid_len masking (flagship geometry is
    16 heads / G=2 / seq 520 valid 513)."""
    from jax.experimental.pallas import tpu as pltpu

    from npcd_tpu.ops.attention import fused_qkv_attention

    b, s, h, d, groups, valid_len = 2, 16, 4, 64, 2, 13
    qkv = jax.random.normal(jax.random.PRNGKey(21), (b, s, 3 * h * d))
    ct = jax.random.normal(jax.random.PRNGKey(22), (b, s, h * d))
    ct = ct * (jnp.arange(s) < valid_len).astype(ct.dtype)[None, :, None]

    def loss(impl):
        return lambda qkv: (
            fused_qkv_attention(
                qkv, h, impl=impl, valid_len=valid_len, groups=groups
            ) * ct
        ).sum()

    out_e = np.asarray(
        fused_qkv_attention(qkv, h, impl="einsum", valid_len=valid_len,
                            groups=groups))
    grad_e = np.asarray(jax.grad(loss("einsum"))(qkv))
    try:
        with pltpu.force_tpu_interpret_mode():
            out_p = np.asarray(
                fused_qkv_attention(qkv, h, impl="pallas", valid_len=valid_len,
                                    groups=groups))
            grad_p = np.asarray(jax.grad(loss("pallas"))(qkv))
    except Exception as e:  # pragma: no cover - interpret mode support varies
        pytest.skip(f"pallas interpret mode unavailable: {e}")
    np.testing.assert_allclose(
        out_e[:, :valid_len], out_p[:, :valid_len], rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(grad_e, grad_p, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("b,s,h,d,valid_len", [(2, 16, 2, 64, 13), (1, 8, 2, 64, 5)])
def test_fused_qkv_pallas_interpret_valid_len(b, s, h, d, valid_len):
    """valid_len masking (the path production ALWAYS takes on TPU: seq padded
    520, valid 513) in the fused-qkv kernel, forward + LSE-residual backward,
    vs the einsum fallback's masking. Pad-query outputs are unspecified, so
    the forward compares valid rows only and the backward uses a cotangent
    that is zero on pad rows (their grads are then exactly zero both ways)."""
    from jax.experimental.pallas import tpu as pltpu

    from npcd_tpu.ops.attention import fused_qkv_attention

    qkv = jax.random.normal(jax.random.PRNGKey(11), (b, s, 3 * h * d))
    ct = jax.random.normal(jax.random.PRNGKey(12), (b, s, h * d))
    ct = ct * (jnp.arange(s) < valid_len).astype(ct.dtype)[None, :, None]

    def loss(impl):
        return lambda qkv: (
            fused_qkv_attention(qkv, h, impl=impl, valid_len=valid_len) * ct
        ).sum()

    out_e = np.asarray(fused_qkv_attention(qkv, h, impl="einsum", valid_len=valid_len))
    grad_e = np.asarray(jax.grad(loss("einsum"))(qkv))
    try:
        with pltpu.force_tpu_interpret_mode():
            out_p = np.asarray(
                fused_qkv_attention(qkv, h, impl="pallas", valid_len=valid_len)
            )
            grad_p = np.asarray(jax.grad(loss("pallas"))(qkv))
    except Exception as e:  # pragma: no cover - interpret mode support varies
        pytest.skip(f"pallas interpret mode unavailable: {e}")
    np.testing.assert_allclose(
        out_e[:, :valid_len], out_p[:, :valid_len], rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(grad_e, grad_p, rtol=1e-4, atol=1e-5)
    # pad KEY columns got softmax weight 0 -> their dk/dv must be exactly 0
    w = h * d
    dk = grad_p[:, :, w : 2 * w]
    dv = grad_p[:, :, 2 * w :]
    assert np.abs(dk[:, valid_len:]).max() == 0.0
    assert np.abs(dv[:, valid_len:]).max() == 0.0
