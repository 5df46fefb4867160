"""Explicit shard_map DP step: numerical equivalence to the GSPMD step
on 8 fake devices (the claim in npcd_tpu/parallel/shard_map_step.py:5-9)."""
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from npcd_tpu.models.diffusion import DiffusionModel
from npcd_tpu.parallel import make_mesh
from npcd_tpu.parallel.shard_map_step import make_shard_map_diffusion_step
from npcd_tpu.train.diffusion_training import (
    DiffusionTrainState,
    make_diffusion_train_step,
)
from npcd_tpu.utils.ema import EmaConfig


def _make_state(model, tx):
    d = model.init(jax.random.PRNGKey(0))
    return DiffusionTrainState(
        params=d.params, opt_state=tx.init(d.params),
        ema_params=(jax.tree_util.tree_map(jnp.copy, d.params),),
        step=jnp.zeros((), jnp.int32),
        coords_norm=d.coords_norm, feats_norm=d.feats_norm,
    )


def test_shard_map_step_matches_gspmd_step():
    model = DiffusionModel(coords_dim=3, feats_dim=4, num_points=16,
                           width=32, layers=1, heads=2, attn_impl="einsum")
    tx = optax.adamw(1e-3)
    ema_cfgs = (EmaConfig(min_value=0.9, max_value=0.9),)
    batch = {
        "coords": jax.random.normal(jax.random.PRNGKey(1), (8, 3, 16)),
        "feats": jax.random.normal(jax.random.PRNGKey(2), (8, 4, 16)),
    }
    rng = jax.random.PRNGKey(3)

    ref_step = make_diffusion_train_step(model, tx, ema_cfgs, donate=False)
    ref_new, ref_metrics = ref_step(_make_state(model, tx), batch, rng)

    mesh = make_mesh()
    sm_step = make_shard_map_diffusion_step(model, tx, ema_cfgs, mesh)
    sm_new, sm_metrics = sm_step(_make_state(model, tx), batch, rng)

    assert int(sm_new.step) == 1
    assert float(sm_metrics["loss"]) == pytest.approx(
        float(ref_metrics["loss"]), rel=1e-5
    )
    for a, b in zip(
        jax.tree_util.tree_leaves(ref_new.params),
        jax.tree_util.tree_leaves(sm_new.params),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)
    for a, b in zip(
        jax.tree_util.tree_leaves(ref_new.ema_params[0]),
        jax.tree_util.tree_leaves(sm_new.ema_params[0]),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)
