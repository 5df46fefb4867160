"""Stage-2 (diffusion) training loop.

Rebuild of the reference DiffusionTraining (npcd/train/diffusion_training.py):
AdamW at constant LR over the denoiser params, normalizers fitted from the
whole latent dataset up front, per-step EMA. TPU-native differences:

  * loss + grads + AdamW update + every EMA lerp are ONE jitted function
    with donated state (the reference runs EMA as a separate Python-level
    pass over 302M params per step)
  * mixed precision is bf16 compute (no GradScaler needed, unlike the
    reference's fp16 AMP path)
  * data parallelism: params replicated, batch sharded over a ('data',)
    mesh; GSPMD inserts the gradient psum over ICI
  * checkpoints via orbax with the reference's naming/retention scheme
"""
from __future__ import annotations

import functools
import time
from typing import Any, Optional, Sequence, Tuple

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..models.diffusion import DiffusionModel, DiffusionState
from ..models.diffusion.normalizers import NormalizerStats
from ..data.dataset import prefetch_to_device
from ..parallel.mesh import data_sharding, make_mesh, replicate, shard_batch
from ..utils import logging, writer
from ..utils.checkpoint import CheckpointSaver, save_weights_only, timed_save_due
from ..utils.ema import EmaConfig, ema_update
from ..utils.util import count_parameters
from .fused_update import FusedAdamWEma


@flax.struct.dataclass
class DiffusionTrainState:
    params: Any
    opt_state: Any
    ema_params: Tuple[Any, ...]
    step: jnp.ndarray
    coords_norm: NormalizerStats
    feats_norm: NormalizerStats

    def diffusion_state(self, params=None) -> DiffusionState:
        return DiffusionState(
            params=self.params if params is None else params,
            coords_norm=self.coords_norm,
            feats_norm=self.feats_norm,
        )


def make_diffusion_train_step(
    model: DiffusionModel,
    tx,
    ema_cfgs: Sequence[EmaConfig],
    donate: bool = True,
):
    """`tx` is either an optax GradientTransformation (reference update
    path, used by the equivalence tests) or a FusedAdamWEma (production
    path: one fusion per leaf for the whole AdamW+EMA update)."""
    fused = tx if isinstance(tx, FusedAdamWEma) else None

    def step(state: DiffusionTrainState, batch, rng):
        def loss_fn(params):
            dstate = state.diffusion_state(params)
            loss, sub_losses, _ = model.compute_loss(
                dstate, rng, batch["coords"], batch["feats"]
            )
            return loss, sub_losses

        (loss, sub_losses), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        metrics = {"loss": loss, **sub_losses}
        if fused is not None:
            params, opt_state, ema_params, grad_norm = fused.update(
                grads, state.opt_state, state.params, state.ema_params,
                state.step,
            )
            metrics["grad_norm"] = grad_norm
        else:
            updates, opt_state = tx.update(grads, state.opt_state, state.params)
            params = optax.apply_updates(state.params, updates)
            ema_params = tuple(
                ema_update(cfg, state.step, ema, params)
                for cfg, ema in zip(ema_cfgs, state.ema_params)
            )
            metrics["grad_norm"] = optax.global_norm(grads)
        return (
            state.replace(
                params=params,
                opt_state=opt_state,
                ema_params=ema_params,
                step=state.step + 1,
            ),
            metrics,
        )

    return jax.jit(step, donate_argnums=(0,) if donate else ())


class DiffusionTraining:
    def __init__(
        self,
        out_dir: str,
        model: DiffusionModel,
        dataset,
        batch_size: int,
        base_learning_rate: float,
        weight_decay: float,
        max_iterations: int,
        use_ema: bool = False,
        ema_params: Optional[Sequence[Tuple[float, float, float, bool]]] = None,
        grad_clip_max_norm: Optional[float] = None,
        init_state: Optional[DiffusionState] = None,
        seed: int = 42,
        mesh=None,
        tp: int = 1,
        print_interval: int = 100,
        log_scalars_interval: int = 100,
        save_checkpoint_interval_min: float = 20.0,
        weights_only_interval: int = 200_000,
        verbose: bool = True,
        **_,
    ):
        import os

        self.out_dir = out_dir
        self.checkpoints_dir = os.path.join(out_dir, "checkpoints")
        self.weights_dir = os.path.join(out_dir, "weights_only_checkpoints_dir")
        os.makedirs(self.checkpoints_dir, exist_ok=True)
        os.makedirs(self.weights_dir, exist_ok=True)

        self.model = model
        self.dataset = dataset
        self.batch_size = batch_size
        self.max_iterations = max_iterations
        self.print_interval = print_interval
        self.log_scalars_interval = log_scalars_interval
        self.save_checkpoint_interval_min = save_checkpoint_interval_min
        self.weights_only_interval = weights_only_interval
        self.verbose = verbose
        self.mesh = mesh
        self.tp = tp
        if tp > 1 and mesh is None:
            # default 2-D mesh: tp-way Megatron TP inside each replica group,
            # DP across them (parallel/tp_step.py)
            n = jax.device_count()
            if n % tp:
                raise ValueError(f"tp={tp} does not divide device count {n}")
            self.mesh = make_mesh(axis_names=("data", "model"),
                                  shape=(n // tp, tp))
        self.rng = jax.random.PRNGKey(seed)

        self.ema_cfgs = tuple(
            EmaConfig.from_tuple(t) for t in (ema_params or [])
        ) if use_ema else ()

        # normalizers from the full latent dataset (reference :44-45)
        dstate = init_state if init_state is not None else model.init(
            jax.random.PRNGKey(seed)
        )
        dstate = model.fit_normalizers(
            dstate, dataset.get_all_coords(), dataset.get_all_feats()
        )

        self.fused = FusedAdamWEma(
            learning_rate=base_learning_rate,
            weight_decay=weight_decay,
            clip_max_norm=grad_clip_max_norm,
            ema_cfgs=self.ema_cfgs,
        )
        # the equivalent optax chain: state-structure source of truth for
        # init / checkpoints / TP sharding specs
        self.tx = self.fused.make_tx()
        self.state = DiffusionTrainState(
            params=dstate.params,
            opt_state=self.tx.init(dstate.params),
            ema_params=tuple(
                jax.tree_util.tree_map(jnp.copy, dstate.params) for _ in self.ema_cfgs
            ),
            step=jnp.zeros((), jnp.int32),
            coords_norm=dstate.coords_norm,
            feats_norm=dstate.feats_norm,
        )

        # async: the 20-min full-state snapshot serializes on a background
        # thread instead of blocking the 302M-param step loop
        # layout_meta: the fused-qkv channel grouping is recorded with every
        # checkpoint — a checkpoint saved under a different qkv_groups has
        # identical shapes but permuted c_qkv columns, which a plain restore
        # would silently accept (see utils/checkpoint.check_layout_meta)
        self.layout_meta = {"qkv_groups": model.denoiser.resolved_qkv_groups()}
        self.saver = CheckpointSaver(self.checkpoints_dir, "diffusion_training",
                                     async_save=True, layout_meta=self.layout_meta)
        self._restore()

        if self.tp > 1:
            from ..parallel.tp_step import make_tp_diffusion_train_step

            self.train_step = make_tp_diffusion_train_step(
                model, self.fused, self.ema_cfgs, self.mesh
            )
        else:
            self.train_step = make_diffusion_train_step(model, self.fused, self.ema_cfgs)

        if verbose:
            logging.info(
                f"DiffusionTraining: {count_parameters(self.state.params)} params, "
                f"batch {batch_size}, max_iterations {max_iterations}, "
                f"dataset size {len(dataset)}"
            )

    @staticmethod
    def _make_optimizer(lr, weight_decay, grad_clip_max_norm):
        chain = []
        if grad_clip_max_norm:
            chain.append(optax.clip_by_global_norm(grad_clip_max_norm))
        chain.append(optax.adamw(lr, b1=0.9, b2=0.999, weight_decay=weight_decay))
        return optax.chain(*chain)

    def _restore(self):
        latest = self.saver.latest()
        self.finished_iterations = 0
        if latest is not None:
            self.state, self.finished_iterations = self.saver.restore(self.state)
            logging.info(f"Restored checkpoint at iteration {self.finished_iterations}")

    # -- loop ----------------------------------------------------------------

    def __call__(self):
        if self.finished_iterations >= self.max_iterations:
            logging.info("Training already finished.")
            return self.state

        if self.tp > 1:
            from ..parallel.tp_step import shard_train_state

            self.state = shard_train_state(self.state, self.tx, self.mesh)
        elif self.mesh is not None:
            self.state = replicate(self.state, self.mesh)

        writer.set_max_iterations(self.max_iterations)
        # multi-host DP: each process draws its shard of the global batch
        # (BatchLoader strided partition); shard_batch assembles the global
        # array from the process-local slices
        loader = self.dataset.get_loader(
            batch_size=self.batch_size, shuffle=True, drop_last=True,
            seed=int(jax.random.randint(self.rng, (), 0, 2**31 - 1)),
            num_shards=jax.process_count(), shard_index=jax.process_index(),
        )
        it = self.finished_iterations
        last_ckpt_time = time.time()
        t_print = time.time()

        def to_device(batch):
            batch = {k: v for k, v in batch.items() if k in ("coords", "feats")}
            if self.mesh is not None:
                return shard_batch(batch, self.mesh)
            return jax.device_put(batch)

        while it < self.max_iterations:
            for batch in prefetch_to_device(loader, to_device):
                if it >= self.max_iterations:
                    break
                rng_iter = jax.random.fold_in(self.rng, it)
                self.state, metrics = self.train_step(self.state, batch, rng_iter)
                it += 1

                if it % self.print_interval == 0:
                    metrics = jax.device_get(metrics)
                    dt = (time.time() - t_print) / self.print_interval
                    t_print = time.time()
                    logging.info(
                        f"iter {it}/{self.max_iterations} "
                        f"loss {float(metrics['loss']):.5f} ({dt*1000:.1f} ms/it)"
                    )
                if it % self.log_scalars_interval == 0 and jax.process_index() == 0:
                    writer.put_scalar_dict("diffusion_train", jax.device_get(metrics), it)
                    writer.write_out_storage()
                if timed_save_due(last_ckpt_time, self.save_checkpoint_interval_min,
                                  iteration=it):
                    # all processes must agree (the save is collective), so
                    # the wall-clock decision is broadcast from process 0
                    # (gated on the iteration counter to keep the blocking
                    # collective off the hot path)
                    # on-device snapshot + background host fetch: the
                    # blocking device_get cost ~140 s/save over the TPU
                    # tunnel (r05 sustained capture)
                    self.saver.save_async_from_device(self.state, it)
                    last_ckpt_time = time.time()
                if it % self.weights_only_interval == 0:
                    self._save_weights_only(it)

        self.saver.save(jax.device_get(self.state), it)
        self._save_weights_only(it)
        self.saver.finish()  # final snapshot must be durable before returning
        self.finished_iterations = it
        return self.state

    def _save_weights_only(self, it: int):
        import os

        save_weights_only(
            os.path.join(self.weights_dir, f"npcd-iter-{it:09d}"),
            jax.device_get(self.state.diffusion_state()),
            layout_meta=self.layout_meta,
        )
        for cfg, ema in zip(self.ema_cfgs, self.state.ema_params):
            save_weights_only(
                os.path.join(
                    self.weights_dir, f"npcd-ema_{cfg.param_string()}-iter-{it:09d}"
                ),
                jax.device_get(self.state.diffusion_state(params=ema)),
                layout_meta=self.layout_meta,
            )
