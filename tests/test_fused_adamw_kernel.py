"""Pallas AdamW+EMA kernel (interpret mode) == the XLA closure path."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from npcd_tpu.ops.pallas import fused_adamw
from npcd_tpu.train.fused_update import FusedAdamWEma
from npcd_tpu.utils.ema import EmaConfig, ema_decay


@pytest.mark.parametrize("shape,n_ema,use_clip", [
    ((64, 256), 1, False),
    ((48, 128), 2, True),
    ((8, 384), 0, False),
])
def test_kernel_matches_closure(monkeypatch, shape, n_ema, use_clip):
    # route pallas_call through the interpreter (no TPU in CI)
    import functools
    from jax.experimental import pallas as pl

    orig = pl.pallas_call
    monkeypatch.setattr(
        fused_adamw.pl, "pallas_call",
        functools.partial(orig, interpret=True),
    )

    rng = np.random.RandomState(0)
    mk = lambda: jnp.asarray(rng.randn(*shape), jnp.float32)
    g, p, mu, nu = mk(), mk(), jnp.abs(mk()) * 1e-3, jnp.abs(mk()) * 1e-3
    emas = tuple(mk() for _ in range(n_ema))
    cfgs = tuple(EmaConfig(max_value=0.99) for _ in range(n_ema))
    step = jnp.asarray(7, jnp.int32)
    fused = FusedAdamWEma(1e-3, 0.02, ema_cfgs=cfgs,
                          clip_max_norm=0.5 if use_clip else None)

    bc1 = 1.0 - fused.b1 ** 8.0
    bc2 = 1.0 - fused.b2 ** 8.0
    gn = jnp.sqrt(jnp.sum(g * g))
    clip_scale = (
        jnp.where(gn < 0.5, 1.0, 0.5 / gn) if use_clip
        else jnp.ones((), jnp.float32)
    )
    decays = [ema_decay(c, step) for c in cfgs]
    scalars = jnp.stack([jnp.asarray(bc1, jnp.float32),
                         jnp.asarray(bc2, jnp.float32), clip_scale] + decays)

    p2, mu2, nu2, emas2, sumsq = fused_adamw.adamw_ema_leaf(
        scalars, g, p, mu, nu, emas,
        b1=fused.b1, b2=fused.b2, eps=fused.eps,
        lr=fused.learning_rate, wd=fused.weight_decay, use_clip=use_clip,
    )

    # reference: the closure math
    gc = g * clip_scale if use_clip else g
    mu_ref = (1 - fused.b1) * gc + fused.b1 * mu
    nu_ref = (1 - fused.b2) * (gc * gc) + fused.b2 * nu
    upd = (mu_ref / bc1) / (jnp.sqrt(nu_ref / bc2) + fused.eps)
    p_ref = p - fused.learning_rate * (upd + fused.weight_decay * p)

    np.testing.assert_allclose(np.asarray(p2), np.asarray(p_ref), rtol=1e-6,
                               atol=5e-7)
    np.testing.assert_allclose(np.asarray(mu2), np.asarray(mu_ref), rtol=1e-6, atol=1e-8)
    np.testing.assert_allclose(np.asarray(nu2), np.asarray(nu_ref), rtol=1e-6, atol=1e-8)
    np.testing.assert_allclose(float(sumsq), float(jnp.sum(g * g)), rtol=1e-5)
    for e0, e, d in zip(emas, emas2, decays):
        e_ref = e0 * d + p_ref * (1 - d)
        np.testing.assert_allclose(np.asarray(e), np.asarray(e_ref), rtol=1e-6,
                                   atol=5e-7)


def test_update_pallas_path_matches_closure_path(monkeypatch):
    """FusedAdamWEma.update(pallas=True, interpreted) == update(pallas=False)
    on a mixed tree (eligible 2-D leaves + ineligible bias leaves)."""
    import functools
    from jax.experimental import pallas as pl

    orig = pl.pallas_call
    monkeypatch.setattr(
        fused_adamw.pl, "pallas_call",
        functools.partial(orig, interpret=True),
    )

    rng = np.random.RandomState(1)
    params = {
        "w": jnp.asarray(rng.randn(32, 256), jnp.float32),
        "b": jnp.asarray(rng.randn(256), jnp.float32),
        "tiny": jnp.asarray(rng.randn(4, 35), jnp.float32),
    }
    grads = jax.tree_util.tree_map(
        lambda p: jnp.asarray(rng.randn(*p.shape), jnp.float32), params
    )
    cfgs = (EmaConfig(),)
    fused = FusedAdamWEma(1e-3, 0.01, ema_cfgs=cfgs)
    tx = fused.make_tx()
    opt_state = tx.init(params)
    emas = (jax.tree_util.tree_map(jnp.copy, params),)
    step = jnp.asarray(5, jnp.int32)

    # make "w" large enough to pass the eligibility size gate
    import npcd_tpu.ops.pallas.fused_adamw as fk
    monkeypatch.setattr(fk, "_TARGET_BLOCK_BYTES", 8 * 256 * 4)
    monkeypatch.setattr(
        fk, "leaf_eligible",
        lambda x: x.ndim == 2 and x.shape[1] % 128 == 0,
    )

    out_p = fused.update(grads, opt_state, params, emas, step, pallas=True)
    out_c = fused.update(grads, opt_state, params, emas, step, pallas=False)
    for a, b in zip(jax.tree_util.tree_leaves(out_p),
                    jax.tree_util.tree_leaves(out_c)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6,
                                   atol=5e-7)
