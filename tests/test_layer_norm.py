"""Pallas fused LayerNorm vs flax nn.LayerNorm (values and grads)."""
import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from npcd_tpu.ops.pallas.layer_norm import layer_norm


def _ref_ln(x, gamma, beta, eps=1e-5):
    x32 = x.astype(jnp.float32)
    mean = x32.mean(-1, keepdims=True)
    var = ((x32 - mean) ** 2).mean(-1, keepdims=True)
    y = (x32 - mean) * jax.lax.rsqrt(var + eps) * gamma + beta
    return y.astype(x.dtype)


def test_layer_norm_matches_reference():
    n, s, w = 2, 9, 128
    x = jax.random.normal(jax.random.PRNGKey(0), (n, s, w)) * 2 + 0.5
    gamma = jax.random.normal(jax.random.PRNGKey(1), (w,)) + 1.0
    beta = jax.random.normal(jax.random.PRNGKey(2), (w,))
    try:
        with pltpu.force_tpu_interpret_mode():
            y = np.asarray(layer_norm(x, gamma, beta))
    except Exception as e:  # pragma: no cover
        pytest.skip(f"pallas interpret mode unavailable: {e}")
    np.testing.assert_allclose(y, np.asarray(_ref_ln(x, gamma, beta)),
                               rtol=1e-5, atol=1e-5)


def test_layer_norm_grads_match_reference():
    n, s, w = 2, 9, 128
    x = jax.random.normal(jax.random.PRNGKey(0), (n, s, w))
    gamma = jax.random.normal(jax.random.PRNGKey(1), (w,)) + 1.0
    beta = jax.random.normal(jax.random.PRNGKey(2), (w,))
    ct = jax.random.normal(jax.random.PRNGKey(3), (n, s, w))

    def loss(fn):
        return lambda x, g, b: (fn(x, g, b) * ct).sum()

    ref_grads = jax.grad(loss(_ref_ln), argnums=(0, 1, 2))(x, gamma, beta)
    try:
        with pltpu.force_tpu_interpret_mode():
            pl_grads = jax.grad(loss(layer_norm), argnums=(0, 1, 2))(x, gamma, beta)
            pl_grads = jax.tree_util.tree_map(np.asarray, pl_grads)
    except Exception as e:  # pragma: no cover
        pytest.skip(f"pallas interpret mode unavailable: {e}")
    for r, p, name in zip(ref_grads, pl_grads, ("dx", "dgamma", "dbeta")):
        np.testing.assert_allclose(np.asarray(r), p, rtol=1e-4, atol=1e-5,
                                   err_msg=name)


def test_layer_norm_bf16_io():
    n, s, w = 1, 5, 256
    x = (jax.random.normal(jax.random.PRNGKey(0), (n, s, w))).astype(jnp.bfloat16)
    gamma = jnp.ones((w,))
    beta = jnp.zeros((w,))
    try:
        with pltpu.force_tpu_interpret_mode():
            y = layer_norm(x, gamma, beta)
    except Exception as e:  # pragma: no cover
        pytest.skip(f"pallas interpret mode unavailable: {e}")
    assert y.dtype == jnp.bfloat16
    ref = _ref_ln(x, gamma, beta)
    np.testing.assert_allclose(np.asarray(y, np.float32),
                               np.asarray(ref, np.float32),
                               rtol=2e-2, atol=2e-2)


@pytest.mark.parametrize("rows", ["16", "auto"])
def test_layer_norm_row_block_layout(monkeypatch, rows):
    """NPCD_LN_ROWS re-blocks the grid over flattened [N*S] rows; numerics
    must be identical to the default per-batch slab layout (each row is
    normalized independently, so the layout is a pure scheduling choice)."""
    from npcd_tpu.ops.pallas import layer_norm as ln_mod

    n, s, w = 2, 32, 128  # ns=64: rows=16 -> grid 4; auto -> 64 -> grid 1
    x = jax.random.normal(jax.random.PRNGKey(0), (n, s, w)) * 2 + 0.5
    delta = jax.random.normal(jax.random.PRNGKey(1), (n, s, w))
    gamma = jax.random.normal(jax.random.PRNGKey(2), (w,)) + 1.0
    beta = jax.random.normal(jax.random.PRNGKey(3), (w,))
    gr = jax.random.normal(jax.random.PRNGKey(4), (n, s, w))
    gy = jax.random.normal(jax.random.PRNGKey(5), (n, s, w))

    def loss(x, delta, gamma, beta):
        r, y = ln_mod.layer_norm_residual(x, delta, gamma, beta)
        return (r * gr).sum() + (y * gy).sum()

    def run():
        y = ln_mod.layer_norm(x, gamma, beta)
        grads = jax.grad(loss, argnums=(0, 1, 2, 3))(x, delta, gamma, beta)
        return jax.tree_util.tree_map(np.asarray, (y, grads))

    try:
        with pltpu.force_tpu_interpret_mode():
            monkeypatch.delenv("NPCD_LN_ROWS", raising=False)
            base = run()
            monkeypatch.setenv("NPCD_LN_ROWS", rows)
            assert ln_mod._grid_layout(n, s) != (n, s)  # layout actually changed
            blocked = run()
    except Exception as e:  # pragma: no cover
        pytest.skip(f"pallas interpret mode unavailable: {e}")
    # dgamma/dbeta are cross-row sums whose f32 accumulation order depends
    # on the blocking, so allow reduction-order rounding noise.
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-5),
        base, blocked)


def test_grid_layout_fallbacks(monkeypatch):
    """Invalid NPCD_LN_ROWS settings must fall back to the slab layout."""
    from npcd_tpu.ops.pallas.layer_norm import _grid_layout

    for bad in ("7", "24", "100000", "nonsense", "0", ""):
        monkeypatch.setenv("NPCD_LN_ROWS", bad)
        assert _grid_layout(32, 520) == (32, 520), bad
    monkeypatch.setenv("NPCD_LN_ROWS", "auto")
    gn, gs = _grid_layout(32, 520)  # ns=16640
    assert gn * gs == 32 * 520 and gs % 16 == 0 and gs <= 1024
    monkeypatch.setenv("NPCD_LN_ROWS", "640")
    assert _grid_layout(32, 520) == (26, 640)


def test_grid_layout_large_input_guard(monkeypatch):
    """Default-path VMEM guard: >=32768-row inputs get their row dim split
    into 16-multiple blocks (bf16 sublane-tile alignment); when s has no
    16-multiple divisor the proven slab layout is kept; explicit
    NPCD_LN_ROWS=0 skips the guard entirely."""
    from npcd_tpu.ops.pallas.layer_norm import _grid_layout

    monkeypatch.delenv("NPCD_LN_ROWS", raising=False)
    # Every measured training/eval config stays on the slab layout.
    assert _grid_layout(32, 520) == (32, 520)    # stage-2 train, 16,640 rows
    assert _grid_layout(16, 513) == (16, 513)
    # s=1040 (generate_batch 128 equivalent rows): 16-multiple split found.
    assert _grid_layout(64, 1040) == (320, 208)
    # s=520 above threshold: no 16-multiple divisor of 520 -> slab fallback
    # (a mult-of-8-only split like r=104 would 16-misalign bf16 tiles).
    assert _grid_layout(64, 520) == (64, 520)
    # Explicit 0 forces slab even where the guard would re-block.
    monkeypatch.setenv("NPCD_LN_ROWS", "0")
    assert _grid_layout(64, 1040) == (64, 1040)


def test_layer_norm_guard_numerics_large_input(monkeypatch):
    """Numerics parity of the guard's re-blocked layout on a >=32768-row
    input against the forced slab layout (NPCD_LN_ROWS=0)."""
    from npcd_tpu.ops.pallas import layer_norm as ln_mod

    n, s, w = 32, 1040, 128  # ns=33280 >= 32768 -> guard splits s into 208s
    monkeypatch.delenv("NPCD_LN_ROWS", raising=False)
    assert ln_mod._grid_layout(n, s) == (160, 208)
    x = jax.random.normal(jax.random.PRNGKey(0), (n, s, w)) * 2 + 0.5
    gamma = jax.random.normal(jax.random.PRNGKey(1), (w,)) + 1.0
    beta = jax.random.normal(jax.random.PRNGKey(2), (w,))
    try:
        with pltpu.force_tpu_interpret_mode():
            y_guard = np.asarray(ln_mod.layer_norm(x, gamma, beta))
            monkeypatch.setenv("NPCD_LN_ROWS", "0")
            y_slab = np.asarray(ln_mod.layer_norm(x, gamma, beta))
    except Exception as e:  # pragma: no cover
        pytest.skip(f"pallas interpret mode unavailable: {e}")
    np.testing.assert_allclose(y_guard, y_slab, rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(y_guard, np.asarray(_ref_ln(x, gamma, beta)),
                               rtol=1e-5, atol=1e-5)


def test_layer_norm_residual_values_and_grads():
    """Fused residual-add LayerNorm (used by every transformer block on
    TPU): values and all four gradients, incl. both incoming cotangents
    (residual-stream gr and norm-consumer gy)."""
    from npcd_tpu.ops.pallas.layer_norm import layer_norm_residual

    n, s, w = 2, 9, 128
    x = jax.random.normal(jax.random.PRNGKey(0), (n, s, w))
    delta = jax.random.normal(jax.random.PRNGKey(1), (n, s, w))
    gamma = jax.random.normal(jax.random.PRNGKey(2), (w,)) + 1.0
    beta = jax.random.normal(jax.random.PRNGKey(3), (w,))
    gr = jax.random.normal(jax.random.PRNGKey(4), (n, s, w))
    gy = jax.random.normal(jax.random.PRNGKey(5), (n, s, w))

    def ref(x, delta, gamma, beta):
        r = x + delta
        return r, _ref_ln(r, gamma, beta)

    def loss(fn):
        def f(x, delta, gamma, beta):
            r, y = fn(x, delta, gamma, beta)
            return (r * gr).sum() + (y * gy).sum()
        return f

    r_ref, y_ref = ref(x, delta, gamma, beta)
    ref_grads = jax.grad(loss(ref), argnums=(0, 1, 2, 3))(x, delta, gamma, beta)
    try:
        with pltpu.force_tpu_interpret_mode():
            r_pl, y_pl = layer_norm_residual(x, delta, gamma, beta)
            pl_grads = jax.grad(loss(layer_norm_residual), argnums=(0, 1, 2, 3))(
                x, delta, gamma, beta)
            r_pl, y_pl = np.asarray(r_pl), np.asarray(y_pl)
            pl_grads = jax.tree_util.tree_map(np.asarray, pl_grads)
    except Exception as e:  # pragma: no cover
        pytest.skip(f"pallas interpret mode unavailable: {e}")
    np.testing.assert_allclose(r_pl, np.asarray(r_ref), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(y_pl, np.asarray(y_ref), rtol=1e-5, atol=1e-5)
    for g_ref_, g_pl_, name in zip(ref_grads, pl_grads,
                                   ("dx", "ddelta", "dgamma", "dbeta")):
        np.testing.assert_allclose(np.asarray(g_ref_), g_pl_,
                                   rtol=1e-4, atol=1e-5, err_msg=name)
