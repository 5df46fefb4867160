"""Explicit shard_map tensor(+data)-parallel stage-2 train step.

The GSPMD TP path (tp.py shardings + jit) works for XLA-native attention,
but the production Pallas attention kernel is an opaque custom call GSPMD
cannot partition — it would all-gather the activations and replicate the
kernel. This module writes the per-shard program explicitly instead
(Megatron-style, over a ('data', 'model') mesh):

  * params are sharded with the tp.py specs; inside shard_map each device
    holds its local column/row shard and the transformer modules run with
    tp = mesh.shape['model'] (models/diffusion/transformer.py): the fused
    qkv projection computes this shard's 3W/tp columns — whole head groups,
    thanks to the grouped [Q|K|V] layout — the Pallas attention kernel runs
    on the local heads with zero communication, and the row-parallel
    projections psum their partial results over 'model'
  * tp_replicate (identity fwd / psum bwd) at each column-parallel input
    makes every replicated parameter's gradient complete without a separate
    model-axis gradient reduction
  * the batch is sharded over 'data'; gradient psum over 'data' is the only
    data-parallel collective, exactly as in shard_map_step.py

Numerical equivalence to the single-device step (same loss, same updated
params up to float reduction order) is asserted in tests/test_tp.py.
"""
from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from typing import TYPE_CHECKING

from ..models.diffusion import DiffusionModel
from ..utils.ema import EmaConfig, ema_update
from .tp import denoiser_param_specs

if TYPE_CHECKING:  # runtime import would be circular (train -> parallel.mesh)
    from ..train.diffusion_training import DiffusionTrainState


def _has_axis(spec: P, axis: str) -> bool:
    for part in spec:
        if part == axis or (isinstance(part, tuple) and axis in part):
            return True
    return False


def train_state_specs(
    state: DiffusionTrainState,
    tx: optax.GradientTransformation,
    model_axis: str = "model",
) -> DiffusionTrainState:
    """PartitionSpec pytree matching a DiffusionTrainState: params (and EMA
    copies, and the optimizer moments, which mirror the param tree) carry
    the tp.py specs; everything else is replicated."""
    from ..train.diffusion_training import DiffusionTrainState

    param_specs = denoiser_param_specs(state.params, model_axis)
    opt_shapes = jax.eval_shape(tx.init, state.params)
    opt_specs = optax.tree_map_params(
        tx,
        lambda _, spec: spec,
        opt_shapes,
        param_specs,
        transform_non_params=lambda _: P(),
    )
    return DiffusionTrainState(
        params=param_specs,
        opt_state=opt_specs,
        ema_params=tuple(param_specs for _ in state.ema_params),
        step=P(),
        coords_norm=jax.tree_util.tree_map(lambda _: P(), state.coords_norm),
        feats_norm=jax.tree_util.tree_map(lambda _: P(), state.feats_norm),
    )


def shard_train_state(
    state: DiffusionTrainState,
    tx: optax.GradientTransformation,
    mesh: Mesh,
    model_axis: str = "model",
) -> DiffusionTrainState:
    specs = train_state_specs(state, tx, model_axis)
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), state, specs
    )


def make_tp_diffusion_train_step(
    model: DiffusionModel,
    tx,
    ema_cfgs: Sequence[EmaConfig],
    mesh: Mesh,
    data_axis: str = "data",
    model_axis: str = "model",
    donate: bool = True,
):
    """Returns step(state, batch, rng) running DP over `data_axis` and
    Megatron TP over `model_axis`. `state` must be sharded with
    shard_train_state; batch["coords"/"feats"] sharded on their leading dim
    over `data_axis` (batch_size % mesh.shape[data_axis] == 0).

    `tx` is either an optax GradientTransformation (reference update path)
    or a train.fused_update.FusedAdamWEma (single-fusion-per-leaf update).

    WARNING: a plain optax `tx` runs tx.update INSIDE shard_map, where each
    model shard sees only its local grad leaves. Any transform that reduces
    ACROSS leaves — optax.clip_by_global_norm above all — would compute a
    different norm on every model shard and silently diverge the replicated
    params. Pass grad clipping via FusedAdamWEma(clip_max_norm=...) instead:
    its update takes the mesh-correct `grad_norm` computed below (model-axis
    psum over sharded leaves). Per-leaf transforms (adamw, scale) are safe."""
    from ..train.fused_update import FusedAdamWEma

    fused = tx if isinstance(tx, FusedAdamWEma) else None
    if fused is not None:
        tx = fused.make_tx()
    n_data = mesh.shape[data_axis]
    tp = mesh.shape[model_axis]
    local_denoiser = model.denoiser.clone(tp=tp, tp_axis=model_axis)

    def per_device(state: DiffusionTrainState, batch, rng):
        shard_n = batch["coords"].shape[0]
        offset = jax.lax.axis_index(data_axis) * shard_n

        def loss_fn(params):
            dstate = state.diffusion_state(params)
            loss, sub_losses, _ = model.compute_loss(
                dstate, rng, batch["coords"], batch["feats"],
                example_offset=offset, denoiser=local_denoiser,
            )
            return loss, sub_losses

        (loss, sub_losses), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        # DP mean-of-means over the data axis. No model-axis reduction is
        # needed: sharded params' grads are shard-local by construction and
        # replicated params' grads are already complete (tp_replicate's
        # backward psum).
        grads = jax.tree_util.tree_map(
            lambda g: jax.lax.psum(g, data_axis) / n_data, grads
        )
        loss = jax.lax.psum(loss, data_axis) / n_data
        sub_losses = jax.tree_util.tree_map(
            lambda v: jax.lax.psum(v, data_axis) / n_data, sub_losses
        )

        # global grad norm: model-sharded leaves contribute their local
        # sum-of-squares psum'd over the model axis; replicated leaves once
        param_specs = denoiser_param_specs(state.params, model_axis)
        pairs = list(
            zip(
                jax.tree_util.tree_leaves(grads),
                jax.tree_util.tree_leaves(
                    param_specs, is_leaf=lambda s: isinstance(s, P)
                ),
            )
        )
        sq_sharded = sum(
            (jnp.sum(jnp.square(g)) for g, s in pairs if _has_axis(s, model_axis)),
            start=jnp.zeros(()),
        )
        sq_repl = sum(
            (jnp.sum(jnp.square(g)) for g, s in pairs if not _has_axis(s, model_axis)),
            start=jnp.zeros(()),
        )
        grad_norm = jnp.sqrt(jax.lax.psum(sq_sharded, model_axis) + sq_repl)

        if fused is not None:
            params, opt_state, ema_params, _ = fused.update(
                grads, state.opt_state, state.params, state.ema_params,
                state.step, grad_norm=grad_norm,
            )
        else:
            updates, opt_state = tx.update(grads, state.opt_state, state.params)
            params = optax.apply_updates(state.params, updates)
            ema_params = tuple(
                ema_update(cfg, state.step, ema, params)
                for cfg, ema in zip(ema_cfgs, state.ema_params)
            )

        metrics = {"loss": loss, **sub_losses, "grad_norm": grad_norm}
        new_state = state.replace(
            params=params,
            opt_state=opt_state,
            ema_params=ema_params,
            step=state.step + 1,
        )
        return new_state, metrics

    def step(state, batch, rng):
        specs = train_state_specs(state, tx, model_axis)
        batch_specs = {k: P(data_axis) for k in batch}
        sharded = shard_map(
            per_device,
            mesh=mesh,
            in_specs=(specs, batch_specs, P()),
            out_specs=(specs, P()),
            check_vma=False,
        )
        return sharded(state, batch, rng)

    return jax.jit(step, donate_argnums=(0,) if donate else ())
