"""Distributed tests without hardware: 8 fake CPU devices
(SURVEY.md §4 item 4). DP-sharded train steps must match single-device."""
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from npcd_tpu.models.diffusion import DiffusionModel
from npcd_tpu.parallel import make_mesh, replicate, shard_batch
from npcd_tpu.train.diffusion_training import (
    DiffusionTrainState,
    make_diffusion_train_step,
)
from npcd_tpu.utils.ema import EmaConfig


def test_mesh_has_8_devices():
    mesh = make_mesh()
    assert mesh.devices.size == 8


def _make_state(model, tx):
    dstate = model.init(jax.random.PRNGKey(0))
    return DiffusionTrainState(
        params=dstate.params,
        opt_state=tx.init(dstate.params),
        ema_params=(jax.tree_util.tree_map(jnp.copy, dstate.params),),
        step=jnp.zeros((), jnp.int32),
        coords_norm=dstate.coords_norm,
        feats_norm=dstate.feats_norm,
    )


def test_dp_train_step_matches_single_device():
    model = DiffusionModel(coords_dim=3, feats_dim=4, num_points=16,
                           width=32, layers=1, heads=2, attn_impl="einsum")
    tx = optax.adamw(1e-3)
    ema_cfgs = (EmaConfig(power=1.0, min_value=0.9, max_value=0.9),)
    step = make_diffusion_train_step(model, tx, ema_cfgs, donate=False)

    batch = {
        "coords": jax.random.normal(jax.random.PRNGKey(1), (8, 3, 16)),
        "feats": jax.random.normal(jax.random.PRNGKey(2), (8, 4, 16)),
    }
    rng = jax.random.PRNGKey(3)

    state_single = _make_state(model, tx)
    new_single, metrics_single = step(state_single, batch, rng)

    mesh = make_mesh()
    state_dp = replicate(_make_state(model, tx), mesh)
    batch_dp = shard_batch(batch, mesh)
    new_dp, metrics_dp = step(state_dp, batch_dp, rng)

    assert float(metrics_single["loss"]) == pytest.approx(
        float(metrics_dp["loss"]), rel=1e-5
    )
    for a, b in zip(
        jax.tree_util.tree_leaves(new_single.params),
        jax.tree_util.tree_leaves(new_dp.params),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6)
    # EMA updated inside the same jitted step
    for a, b in zip(
        jax.tree_util.tree_leaves(new_single.ema_params[0]),
        jax.tree_util.tree_leaves(new_dp.ema_params[0]),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6)
