"""Stage-1 (PointNeRF autodecoder) training loop.

Rebuild of the reference PointNeRFTraining (npcd/train/pointnerf_training.py):
Adam at constant LR over the pointnerf params with the coords table frozen
(reference freezes it via requires_grad; here via an optax mask), coords
seeded once from the dataset's FPS point clouds, loss = reconstruction +
KL + TV. The whole step (embed -> render -> 3 losses -> masked Adam update)
is one jitted, donated function; DP shards the object batch across the
('data',) mesh.
"""
from __future__ import annotations

import time
from typing import Any, Optional

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..losses import PointNeRFLossWeights, pointnerf_loss
from ..models.pointnerf import PointNeRF
from ..data.dataset import prefetch_to_device
from ..parallel.mesh import replicate, shard_batch
from ..utils import logging, writer
from ..utils.checkpoint import CheckpointSaver, save_weights_only, timed_save_due
from ..utils.util import count_parameters


@flax.struct.dataclass
class PointNeRFTrainState:
    params: Any
    opt_state: Any
    step: jnp.ndarray


def make_pointnerf_optimizer(lr: float, grad_clip_max_norm: Optional[float] = None):
    """Adam over everything except the frozen coords table
    (reference pointnerf.py:22-24, pointnerf_training.py:101-102)."""
    chain = []
    if grad_clip_max_norm:
        chain.append(optax.clip_by_global_norm(grad_clip_max_norm))
    chain.append(optax.adam(lr))
    tx = optax.chain(*chain)

    def label_fn(params):
        return {
            k: ("freeze" if k == "coords_table" else "train") for k in params
        }

    return optax.multi_transform(
        {"train": tx, "freeze": optax.set_to_zero()}, label_fn
    )


def make_pointnerf_train_step(
    model: PointNeRF,
    tx: optax.GradientTransformation,
    loss_weights: PointNeRFLossWeights,
    donate: bool = True,
    presampled_images: bool = False,
):
    """presampled_images: batch['images'] hold only the shared presampled
    pixel subset ([B, V, R_pre, 3], positions in batch['draws']
    ['pixel_idx']) instead of full frames — the host ships ~0.7% of the
    pixel data per step (PointNeRFTraining host_pixel_presample); the
    recon loss gathers GT by in-presample position. Loss/grads identical
    to the full-frame path (tests/test_losses.py)."""

    def step(state: PointNeRFTrainState, batch, rng):
        def loss_fn(params):
            pred, aux = model.forward(
                params,
                batch["obj_idx"],
                batch["intrinsics"],
                batch["extrinsics"],
                rng=rng,
                train=True,
                # matched-draw parity experiments (tools/ref_dynamics.py)
                # inject recorded reference draws via an optional subdict
                draws=batch.get("draws"),
            )
            total, sub_losses = pointnerf_loss(
                batch, pred, aux, model.opts, loss_weights,
                presampled_images=presampled_images,
            )
            return total, sub_losses

        (loss, sub_losses), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        metrics = {"loss": loss, **sub_losses}
        return (
            state.replace(params=params, opt_state=opt_state, step=state.step + 1),
            metrics,
        )

    return jax.jit(step, donate_argnums=(0,) if donate else ())


class PointNeRFTraining:
    def __init__(
        self,
        out_dir: str,
        model: PointNeRF,
        dataset,
        batch_size: int,
        base_learning_rate: float,
        max_epochs: int,
        loss_weights: PointNeRFLossWeights = PointNeRFLossWeights(1.0, 1e-7, 3.5e-7),
        grad_clip_max_norm: Optional[float] = None,
        init_params: Optional[Any] = None,
        seed: int = 42,
        mesh=None,
        print_interval: int = 100,
        log_scalars_interval: int = 100,
        log_interval: int = 5000,
        save_checkpoint_interval_min: float = 20.0,
        host_pixel_presample: Optional[bool] = None,
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
        self.print_interval = print_interval
        self.log_scalars_interval = log_scalars_interval
        self.log_interval = log_interval
        self.save_checkpoint_interval_min = save_checkpoint_interval_min
        self.verbose = verbose
        self.mesh = mesh
        self.rng = jax.random.PRNGKey(seed)

        steps_per_epoch = len(dataset) // batch_size
        self.max_iterations = steps_per_epoch * max_epochs

        params = init_params if init_params is not None else model.init_params(
            jax.random.PRNGKey(seed)
        )
        # Seed coords from dataset FPS clouds once (reference :119).
        params = model.set_all_coords(params, dataset.get_all_coords())

        self.tx = make_pointnerf_optimizer(base_learning_rate, grad_clip_max_norm)
        self.state = PointNeRFTrainState(
            params=params,
            opt_state=self.tx.init(params),
            step=jnp.zeros((), jnp.int32),
        )

        # async: the 20-min full-state snapshot serializes on a background
        # thread instead of blocking the step loop
        self.saver = CheckpointSaver(self.checkpoints_dir, "pointnerf_training",
                                     async_save=True)
        self.finished_iterations = 0
        if self.saver.latest() is not None:
            self.state, self.finished_iterations = self.saver.restore(self.state)
            logging.info(f"Restored checkpoint at iteration {self.finished_iterations}")

        # Host-side shared-pixel presampling (default on): the step only
        # consumes ray_subsamples pixels/view (the reference's shared
        # randperm, renderer.py:232-238, drawn on the host RNG instead of
        # on device), so the loop ships [B, V, R_pre, 3] GT pixels
        # (~0.7% of the full frames — the full-frame H2D was measured as
        # the sustained-loop wall at 1.3 s/step over this environment's
        # TPU tunnel, docs/experiments/sustained_capture.json).
        r_pre = model.opts.renderer.ray_subsamples
        self.host_pixel_presample = (
            bool(r_pre) if host_pixel_presample is None
            else host_pixel_presample
        )
        self._presample_rng = np.random.default_rng(seed + 0x51D)

        self.train_step = make_pointnerf_train_step(
            model, self.tx, loss_weights,
            presampled_images=self.host_pixel_presample,
        )

        if verbose:
            logging.info(
                f"PointNeRFTraining: {count_parameters(self.state.params)} params, "
                f"batch {batch_size}, max_iterations {self.max_iterations}"
            )

    def __call__(self):
        if self.finished_iterations >= self.max_iterations:
            logging.info("Training already finished.")
            return self.state

        if self.mesh is not None:
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
            feed = {
                k: batch[k]
                for k in ("obj_idx", "images", "intrinsics", "extrinsics")
            }
            draws = None
            if self.host_pixel_presample:
                res2 = feed["images"].shape[2]
                r_pre = self.model.opts.renderer.ray_subsamples
                pixel_idx = self._presample_rng.choice(
                    res2, size=r_pre, replace=False
                ).astype(np.int32)
                feed["images"] = np.ascontiguousarray(
                    feed["images"][:, :, pixel_idx, :]
                )
                draws = {"pixel_idx": pixel_idx}
            if self.mesh is not None:
                feed = shard_batch(feed, self.mesh)
                if draws is not None:
                    # pixel_idx has no batch dim — replicate it (every
                    # shard renders the same shared pixel subset, the
                    # reference's shared-randperm semantic)
                    feed["draws"] = replicate(draws, self.mesh)
            else:
                feed = jax.device_put(feed)
                if draws is not None:
                    feed["draws"] = jax.device_put(draws)
            return feed, batch

        while it < self.max_iterations:
            # collate + H2D transfer of the next batch overlaps the current
            # step (stage-1 batches are ~150 MB of images)
            for feed, batch in prefetch_to_device(loader, to_device):
                if it >= self.max_iterations:
                    break
                rng_iter = jax.random.fold_in(self.rng, it)
                self.state, metrics = self.train_step(self.state, feed, rng_iter)
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
                    writer.put_scalar_dict("pointnerf_train", jax.device_get(metrics), it)
                    writer.write_out_storage()
                if (
                    self.log_interval and it % self.log_interval == 0
                    and jax.process_count() == 1
                ):
                    # multi-host: the un-jitted eval forward cannot consume
                    # the non-fully-addressable global params; skip
                    self._log_qualitative(batch, it)
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

        return self._finalize(it)

    def _log_qualitative(self, batch, it: int):
        """Eval-mode full re-render of the first object's first view + PSNR
        (reference pointnerf_training.py:232-300) and feature statistics."""
        import jax.numpy as jnp

        from ..utils.util import psnr

        try:
            obj_idx = jnp.asarray(batch["obj_idx"][:1])
            intr = jnp.asarray(batch["intrinsics"][:1, :1])
            extr = jnp.asarray(batch["extrinsics"][:1, :1])
            pred, aux = self.model.forward(
                self.state.params, obj_idx, intr, extr, train=False
            )
            res = self.model.opts.default_resolution
            img = np.clip(np.asarray(pred["channels"][0, 0]).reshape(res, res, 3), 0, 1)
            gt = np.asarray(batch["images"][0, 0]).reshape(res, res, 3)
            writer.put_scalar("pointnerf_train/full_render_psnr", psnr(img, gt), it)
            writer.put_image("pointnerf_train/render", img, it)
            writer.put_image("pointnerf_train/gt", gt, it)
            feats_mean = np.asarray(aux["feats_mean"])
            feats_std = np.asarray(aux["feats_std"])
            writer.put_scalar("pointnerf_train/feats_mean_abs", float(np.abs(feats_mean).mean()), it)
            writer.put_scalar("pointnerf_train/feats_std_mean", float(feats_std.mean()), it)
            writer.write_out_storage()
        except Exception as e:  # logging must never kill training
            logging.warning(f"qualitative logging failed at iter {it}: {e}")

    def _finalize(self, it: int):
        self.saver.save(jax.device_get(self.state), it)
        import os

        save_weights_only(
            os.path.join(self.weights_dir, f"pointnerf-iter-{it:09d}"),
            jax.device_get(self.state.params),
        )
        self.saver.finish()  # final snapshot must be durable before returning
        self.finished_iterations = it
        return self.state
