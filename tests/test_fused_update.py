"""FusedAdamWEma == optax.chain([clip,] adamw) + ema_update, multi-step.

The fused path (train/fused_update.py) re-derives the optax math as one
closure per leaf; these tests pin numerical equivalence against the
untouched optax reference path on a real (tiny) denoiser train step.
"""
import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from npcd_tpu.models.diffusion import DiffusionModel
from npcd_tpu.train.diffusion_training import (
    DiffusionTrainState,
    make_diffusion_train_step,
)
from npcd_tpu.train.fused_update import FusedAdamWEma
from npcd_tpu.utils.ema import EmaConfig, ema_update


def _tiny_model():
    return DiffusionModel(
        coords_dim=3, feats_dim=4, num_points=16, width=32, layers=2, heads=2
    )


def _init_state(model, tx, ema_cfgs, seed=0):
    dstate = model.init(jax.random.PRNGKey(seed))
    coords = jax.random.normal(jax.random.PRNGKey(1), (3, 64))
    feats = jax.random.normal(jax.random.PRNGKey(2), (4, 64))
    dstate = model.fit_normalizers(dstate, coords, feats)
    return DiffusionTrainState(
        params=dstate.params,
        opt_state=tx.init(dstate.params),
        ema_params=tuple(
            jax.tree_util.tree_map(jnp.copy, dstate.params) for _ in ema_cfgs
        ),
        step=jnp.zeros((), jnp.int32),
        coords_norm=dstate.coords_norm,
        feats_norm=dstate.feats_norm,
    )


def _batch(key, n=4):
    kc, kf = jax.random.split(key)
    return {
        "coords": jax.random.normal(kc, (n, 3, 16)),
        "feats": jax.random.normal(kf, (n, 4, 16)),
    }


@pytest.mark.parametrize("clip", [None, 0.05])
def test_fused_matches_optax_multi_step(clip):
    model = _tiny_model()
    ema_cfgs = (EmaConfig(power=1.0, min_value=0.9, max_value=0.999),)
    fused = FusedAdamWEma(
        learning_rate=7e-3, weight_decay=0.01, clip_max_norm=clip,
        ema_cfgs=ema_cfgs,
    )
    tx = fused.make_tx()

    state_ref = _init_state(model, tx, ema_cfgs)
    state_fused = jax.tree_util.tree_map(jnp.copy, state_ref)

    step_ref = make_diffusion_train_step(model, tx, ema_cfgs, donate=False)
    step_fused = make_diffusion_train_step(model, fused, ema_cfgs, donate=False)

    for i in range(4):
        rng = jax.random.PRNGKey(100 + i)
        batch = _batch(jax.random.PRNGKey(200 + i))
        state_ref, m_ref = step_ref(state_ref, batch, rng)
        state_fused, m_fused = step_fused(state_fused, batch, rng)

    np.testing.assert_allclose(
        float(m_ref["grad_norm"]), float(m_fused["grad_norm"]), rtol=1e-6
    )
    for a, b in zip(
        jax.tree_util.tree_leaves(state_ref.params),
        jax.tree_util.tree_leaves(state_fused.params),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-6,
                                   atol=1e-7)
    for a, b in zip(
        jax.tree_util.tree_leaves(state_ref.ema_params),
        jax.tree_util.tree_leaves(state_fused.ema_params),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-6,
                                   atol=1e-7)
    # optimizer state: same pytree structure (checkpoint compat) and values
    assert jax.tree_util.tree_structure(state_ref.opt_state) == (
        jax.tree_util.tree_structure(state_fused.opt_state)
    )
    for a, b in zip(
        jax.tree_util.tree_leaves(state_ref.opt_state),
        jax.tree_util.tree_leaves(state_fused.opt_state),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-6,
                                   atol=1e-7)


def test_fused_update_standalone_exact():
    """Direct (no-model) check: one fused update == optax ops, incl. the
    EMA lerp and the count increment, starting from a warm state."""
    params = {
        "w": jnp.asarray(np.random.RandomState(0).randn(8, 8), jnp.float32),
        "b": jnp.asarray(np.random.RandomState(1).randn(8), jnp.float32),
    }
    grads = jax.tree_util.tree_map(
        lambda p: jnp.asarray(np.random.RandomState(2).randn(*p.shape),
                              jnp.float32), params
    )
    ema_cfgs = (EmaConfig(), EmaConfig(power=2.0, max_value=0.99))
    fused = FusedAdamWEma(1e-3, 0.02, ema_cfgs=ema_cfgs)
    tx = fused.make_tx()
    opt_state = tx.init(params)
    emas = tuple(jax.tree_util.tree_map(jnp.copy, params) for _ in ema_cfgs)
    step = jnp.asarray(3, jnp.int32)

    # warm the moments with one optax step first
    upd0, opt_state = tx.update(grads, opt_state, params)
    params = optax.apply_updates(params, upd0)

    upd_ref, opt_ref = tx.update(grads, opt_state, params)
    params_ref = optax.apply_updates(params, upd_ref)
    emas_ref = tuple(
        ema_update(cfg, step, e, params_ref) for cfg, e in zip(ema_cfgs, emas)
    )

    params_f, opt_f, emas_f, gn = fused.update(
        grads, opt_state, params, emas, step
    )
    np.testing.assert_allclose(float(gn), float(optax.global_norm(grads)),
                               rtol=1e-6)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                                rtol=1e-6, atol=1e-8),
        (params_ref, emas_ref, opt_ref), (params_f, emas_f, opt_f),
    )
