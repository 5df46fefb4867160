"""Explicit shard_map data-parallel train steps.

Alternative to the GSPMD path (jit + sharded inputs): the per-device program
is written explicitly with shard_map and the gradient reduction is a visible
psum over the 'data' axis of the ICI mesh. Numerically equivalent to the
GSPMD step (asserted in tests/test_shard_map.py): per-example rng keys make
the (t, noise) draws shard-invariant, and psum of per-shard means equals the
global-batch mean up to float reduction order. Useful when collective
placement must be controlled by hand.
"""
from __future__ import annotations

from functools import partial
from typing import Any, Sequence

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from ..models.diffusion import DiffusionModel
from ..train.diffusion_training import DiffusionTrainState
from ..utils.ema import EmaConfig, ema_update


def make_shard_map_diffusion_step(
    model: DiffusionModel,
    tx: optax.GradientTransformation,
    ema_cfgs: Sequence[EmaConfig],
    mesh: Mesh,
    axis: str = "data",
):
    """Returns step(state, batch, rng): state replicated, batch sharded on
    its leading dim over `axis`. Requires batch_size % mesh.shape[axis] == 0."""
    n_shards = mesh.shape[axis]

    def per_device(state: DiffusionTrainState, batch, rng):
        # per-example rng: pass this shard's global example offset so every
        # example gets the same (t, noise) draws it would get single-device —
        # the step is numerically equivalent to the GSPMD/jit step up to
        # float reduction order
        shard_n = batch["coords"].shape[0]
        offset = jax.lax.axis_index(axis) * shard_n

        def loss_fn(params):
            dstate = state.diffusion_state(params)
            loss, sub_losses, _ = model.compute_loss(
                dstate, rng, batch["coords"], batch["feats"],
                example_offset=offset,
            )
            return loss, sub_losses

        (loss, sub_losses), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        # mean-of-means: each shard's grad is already a mean over its
        # sub-batch, so the global mean is the psum / n_shards
        grads = jax.tree_util.tree_map(
            lambda g: jax.lax.psum(g, axis) / n_shards, grads
        )
        loss = jax.lax.psum(loss, axis) / n_shards
        sub_losses = jax.tree_util.tree_map(
            lambda v: jax.lax.psum(v, axis) / n_shards, sub_losses
        )

        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        ema_params = tuple(
            ema_update(cfg, state.step, ema, params)
            for cfg, ema in zip(ema_cfgs, state.ema_params)
        )
        new_state = state.replace(
            params=params,
            opt_state=opt_state,
            ema_params=ema_params,
            step=state.step + 1,
        )
        return new_state, {"loss": loss, **sub_losses}

    state_spec = P()  # replicated
    batch_spec = {"coords": P(axis), "feats": P(axis)}

    sharded = shard_map(
        per_device,
        mesh=mesh,
        in_specs=(state_spec, batch_spec, P()),
        out_specs=(state_spec, P()),
        check_vma=False,
    )
    return jax.jit(sharded)
