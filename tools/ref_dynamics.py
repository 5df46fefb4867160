#!/usr/bin/env python
"""N-step training-dynamics comparison: the REAL reference training classes
(torch CPU, /root/reference) vs npcd_tpu, on identical data with
converter-matched initialization.

The deterministic paths are pinned exactly by tests/test_reference_oracle.py;
what remains unprovable there is the stochastic training loop (ray/timestep/
noise draws come from different RNGs in torch vs JAX). This tool runs both
frameworks' training for N steps and compares EMA-smoothed loss trajectories
within a band — the methodology of tools/budget_qualify.py.

Stage 1 drives the reference's own PointNeRFTraining (real class, real
PointNeRFLoss, real Adam loop, pointnerf_training.py:130-147) with a loss
recorder wrapped around the real loss module; stage 2 drives the reference
DiffusionTraining (diffusion_training.py:143-174) with compute_loss wrapped.
The npcd_tpu side runs the same jitted steps its Training classes use.

Usage:
  python tools/ref_dynamics.py --stage both --steps 300 \
      --out docs/experiments/ref_dynamics.json
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def ema_smooth(xs, span=20):
    xs = np.asarray(xs, np.float64)
    alpha = 2.0 / (span + 1.0)
    out = np.empty_like(xs)
    acc = xs[0]
    for i, x in enumerate(xs):
        acc = alpha * x + (1 - alpha) * acc
        out[i] = acc
    return out


def band_stats(ref_losses, tpu_losses, span=20, tail_frac=0.5):
    """Relative deviation of EMA-smoothed curves over the trailing window."""
    n = min(len(ref_losses), len(tpu_losses))
    r = ema_smooth(ref_losses[:n], span)
    t = ema_smooth(tpu_losses[:n], span)
    lo = int(n * (1 - tail_frac))
    rel = np.abs(t[lo:] - r[lo:]) / np.maximum(np.abs(r[lo:]), 1e-12)
    return {
        "steps": int(n),
        "tail_rel_dev_mean": float(rel.mean()),
        "tail_rel_dev_max": float(rel.max()),
        "ref_final_smoothed": float(r[-1]),
        "tpu_final_smoothed": float(t[-1]),
        "ref_first_smoothed": float(r[0]),
        "tpu_first_smoothed": float(t[0]),
    }


# ---------------------------------------------------------------------------
# stage 1
# ---------------------------------------------------------------------------


def run_stage1(steps: int, seed: int = 0):
    import torch

    from tools.ref_oracle.harness import (
        TinyGeometry, build_ref_pointnerf, tpu_pointnerf_from_ref,
    )
    from tools.ref_oracle.shims import import_reference

    import_reference()
    from npcd.data.dataset import Dataset as RefDataset, Sample as RefSample
    from npcd.losses import PointNeRFLoss as RefPointNeRFLoss
    from npcd.train.pointnerf_training import (
        PointNeRFTraining as RefPointNeRFTraining,
    )

    geom = TinyGeometry(resolution=16)
    n_views = 2

    # ---- shared data (one numpy source feeds both frameworks) ----------
    from npcd_tpu.data import create_dataset

    ds = create_dataset(
        "SyntheticNPCTrain", n_obj=geom.n_obj, num_views=n_views,
        image_size=geom.resolution, num_points=geom.num_points, seed=seed,
        verbose=False,
    )

    class StaticSample(RefSample):
        def __init__(self, d):
            self.d = d

        def load(self, root):
            return self.d

    class RefSynthetic(RefDataset):
        """Serves the SAME numpy arrays in the reference sample format
        (images [V, 3, H, W]; the npcd_tpu loader uses [V, H*W, 3])."""

        def _init_samples(self):
            res = geom.resolution
            for s in ds.samples:
                img = np.asarray(s["images"], np.float32)
                self.samples.append(StaticSample({
                    "obj_idx": np.int64(s["obj_idx"]),
                    "images": img.reshape(n_views, res, res, 3)
                              .transpose(0, 3, 1, 2).copy(),
                    "intrinsics": np.asarray(s["intrinsics"], np.float32),
                    "extrinsics": np.asarray(s["extrinsics"], np.float32),
                }))

        def get_all_coords(self):
            return torch.from_numpy(np.asarray(ds.get_all_coords(), np.float32))

    ref_ds = RefSynthetic(root=None, verbose=False)

    # ---- matched models -------------------------------------------------
    pn_ref = build_ref_pointnerf(geom, seed=seed)
    pn, params = tpu_pointnerf_from_ref(pn_ref, geom)

    class RefModelWrapper(torch.nn.Module):
        """What the reference NPCD facade provides to PointNeRFTraining."""

        def __init__(self, pointnerf):
            super().__init__()
            self.pointnerf = pointnerf

    wrapper = RefModelWrapper(pn_ref)

    ref_losses = []

    class LossRecorder(torch.nn.Module):
        def __init__(self, inner):
            super().__init__()
            self.inner = inner

        def forward(self, **kw):
            loss, sub, pw = self.inner(**kw)
            ref_losses.append(float(loss.detach()))
            return loss, sub, pw

    lw = (1.0, 1e-7, 3.5e-7)  # reference train_pointnerf.py:56-59
    loss = LossRecorder(RefPointNeRFLoss(
        model=wrapper, image_reconstruction_loss_weight=lw[0],
        neural_point_cloud_kl_loss_weight=lw[1],
        neural_point_cloud_tv_loss_weight=lw[2], verbose=False,
    ))

    lr = 1e-3  # reference configs/npcd_srncars.yaml pointnerf_training
    torch.manual_seed(seed + 100)
    t0 = time.time()
    with tempfile.TemporaryDirectory() as tmp:
        training = RefPointNeRFTraining(
            out_dir=tmp, model=wrapper, dataset=ref_ds, loss=loss,
            batch_size=geom.n_obj,  # full-dataset batches: order-invariant
            base_learning_rate=lr, max_epochs=steps, num_workers=0,
            print_interval=max(1, steps // 4), log_loss_interval=10**9,
            log_interval=10**9, save_checkpoint_interval_min=10**9,
            verbose=False,
        )
        # log_interval fires at iteration 0 (0 % N == 0); _log_pred re-renders
        # one view for TB images, which is irrelevant to loss dynamics.
        training._log_all = lambda *a, **k: None
        training()
    ref_sec = time.time() - t0

    # ---- npcd_tpu side: the same jitted step PointNeRFTraining uses ----
    import jax
    import jax.numpy as jnp

    from npcd_tpu.losses import PointNeRFLossWeights
    from npcd_tpu.train.pointnerf_training import (
        PointNeRFTrainState, make_pointnerf_optimizer, make_pointnerf_train_step,
    )

    params = pn.set_all_coords(params, ds.get_all_coords())
    tx = make_pointnerf_optimizer(lr)
    state = PointNeRFTrainState(
        params=params, opt_state=tx.init(params),
        step=jnp.zeros((), jnp.int32),
    )
    step_fn = make_pointnerf_train_step(pn, tx, PointNeRFLossWeights(*lw))

    batch = {
        "obj_idx": jnp.arange(geom.n_obj),
        "images": jnp.asarray(np.stack([s["images"] for s in ds.samples])),
        "intrinsics": jnp.asarray(np.stack([s["intrinsics"] for s in ds.samples])),
        "extrinsics": jnp.asarray(np.stack([s["extrinsics"] for s in ds.samples])),
    }
    rng = jax.random.PRNGKey(seed + 200)
    tpu_losses = []
    t0 = time.time()
    for it in range(steps):
        state, metrics = step_fn(state, batch, jax.random.fold_in(rng, it))
        tpu_losses.append(float(metrics["loss"]))
    tpu_sec = time.time() - t0

    stats = band_stats(ref_losses, tpu_losses)
    return {
        "geometry": vars(geom) if not hasattr(geom, "__dataclass_fields__")
        else {f: getattr(geom, f) for f in geom.__dataclass_fields__},
        "lr": lr, "loss_weights": lw,
        "ref_losses": ref_losses, "tpu_losses": tpu_losses,
        "ref_sec": ref_sec, "tpu_sec": tpu_sec,
        **stats,
    }


def run_stage1_matched(steps: int, seed: int = 0):
    """Matched-draw stage-1 comparison: record the reference trainer's
    actual random draws (variational eps, shared pixel randperm, depth
    jitter, subsample_valid_rays selection, DataLoader batch order) and
    inject them into the JAX step via PointNeRF.forward(draws=...), so RNG
    is eliminated and only semantics remain. With matched draws the two
    trainers optimize the SAME stochastic objective realization; any
    trajectory gap is a semantic difference, not sampling noise.

    Reference draw sites (all torch global RNG, CPU):
      * VariationalEmbedding randn_like (variational_embedding.py:54)
      * renderer randperm(res^2)[:ray_subsamples] (renderer.py:233)
      * Renderer.sample rand_like depth jitter (renderer.py:74-76; train()
        sets randomize_depth_samples=True, pointnerf.py:29-32)
      * Aggregator.subsample_valid_rays randperm (aggregator.py:96) —
        captured via pred['ray_idx'] (the resulting pixel selection)
      * DataLoader shuffle — captured via sample['obj_idx']
    """
    import torch

    from tools.ref_oracle.harness import (
        TinyGeometry, build_ref_pointnerf, tpu_pointnerf_from_ref,
    )
    from tools.ref_oracle.shims import import_reference

    import_reference()
    from npcd.data.dataset import Dataset as RefDataset, Sample as RefSample
    from npcd.losses import PointNeRFLoss as RefPointNeRFLoss
    from npcd.train.pointnerf_training import (
        PointNeRFTraining as RefPointNeRFTraining,
    )

    geom = TinyGeometry(resolution=16)
    n_views = 2
    res = geom.resolution
    r_pre = geom.renderer_ray_subsamples

    from npcd_tpu.data import create_dataset

    ds = create_dataset(
        "SyntheticNPCTrain", n_obj=geom.n_obj, num_views=n_views,
        image_size=res, num_points=geom.num_points, seed=seed,
        verbose=False,
    )

    class StaticSample(RefSample):
        def __init__(self, d):
            self.d = d

        def load(self, root):
            return self.d

    class RefSynthetic(RefDataset):
        def _init_samples(self):
            for s in ds.samples:
                img = np.asarray(s["images"], np.float32)
                self.samples.append(StaticSample({
                    "obj_idx": np.int64(s["obj_idx"]),
                    "images": img.reshape(n_views, res, res, 3)
                              .transpose(0, 3, 1, 2).copy(),
                    "intrinsics": np.asarray(s["intrinsics"], np.float32),
                    "extrinsics": np.asarray(s["extrinsics"], np.float32),
                }))

        def get_all_coords(self):
            return torch.from_numpy(np.asarray(ds.get_all_coords(), np.float32))

    ref_ds = RefSynthetic(root=None, verbose=False)
    pn_ref = build_ref_pointnerf(geom, seed=seed)
    pn, params = tpu_pointnerf_from_ref(pn_ref, geom)

    class RefModelWrapper(torch.nn.Module):
        def __init__(self, pointnerf):
            super().__init__()
            self.pointnerf = pointnerf

    wrapper = RefModelWrapper(pn_ref)

    # ---- draw-recording hooks ------------------------------------------
    rec_steps = []
    cur = {"randperms": [], "rand_likes": [], "randn_likes": []}
    orig_randperm = torch.randperm
    orig_rand_like = torch.rand_like
    orig_randn_like = torch.randn_like

    def randperm_hook(n, *a, **k):
        out = orig_randperm(n, *a, **k)
        cur["randperms"].append((int(n), out.clone().numpy()))
        return out

    def rand_like_hook(t, *a, **k):
        out = orig_rand_like(t, *a, **k)
        cur["rand_likes"].append(out.clone().numpy())
        return out

    def randn_like_hook(t, *a, **k):
        out = orig_randn_like(t, *a, **k)
        cur["randn_likes"].append(out.clone().numpy())
        return out

    ref_losses = []

    class DrawRecorder(torch.nn.Module):
        """Flush the draws accumulated during the preceding forward, plus
        the batch order and the resulting ray selection."""

        def __init__(self, inner):
            super().__init__()
            self.inner = inner

        def forward(self, **kw):
            loss, sub, pw = self.inner(**kw)
            ref_losses.append(float(loss.detach()))
            rec_steps.append({
                "obj_idx": kw["sample"]["obj_idx"].numpy().copy(),
                "ray_idx": kw["pred"]["ray_idx"].detach().numpy().copy(),
                "sub": {k: float(v) for k, v in sub.items()},
                **{k: list(v) for k, v in cur.items()},
            })
            for v in cur.values():
                v.clear()
            return loss, sub, pw

    lw = (1.0, 1e-7, 3.5e-7)
    loss = DrawRecorder(RefPointNeRFLoss(
        model=wrapper, image_reconstruction_loss_weight=lw[0],
        neural_point_cloud_kl_loss_weight=lw[1],
        neural_point_cloud_tv_loss_weight=lw[2], verbose=False,
    ))

    lr = 1e-3
    torch.manual_seed(seed + 100)
    torch.randperm = randperm_hook
    torch.rand_like = rand_like_hook
    torch.randn_like = randn_like_hook
    t0 = time.time()
    try:
        with tempfile.TemporaryDirectory() as tmp:
            training = RefPointNeRFTraining(
                out_dir=tmp, model=wrapper, dataset=ref_ds, loss=loss,
                batch_size=geom.n_obj, base_learning_rate=lr,
                max_epochs=steps, num_workers=0,
                print_interval=max(1, steps // 4), log_loss_interval=10**9,
                log_interval=10**9, save_checkpoint_interval_min=10**9,
                verbose=False,
            )
            training._log_all = lambda *a, **k: None
            training()
    finally:
        torch.randperm = orig_randperm
        torch.rand_like = orig_rand_like
        torch.randn_like = orig_randn_like
    ref_sec = time.time() - t0
    assert len(rec_steps) == steps, (len(rec_steps), steps)

    # ---- parse the recorded draws per step ------------------------------
    def parse_step(rec):
        # variational eps: the [B, P, F] randn (the only randn_like drawn
        # inside the training forward)
        eps = [a for a in rec["randn_likes"]
               if a.shape == (geom.n_obj, geom.num_points, geom.feat_dim)]
        assert len(eps) == 1, [a.shape for a in rec["randn_likes"]]
        # pixel subset: the first randperm over res^2 (a leading
        # randperm(n_obj) from the DataLoader shuffle may precede it at
        # epoch starts; subsample_valid_rays' perm over total_valid comes
        # after and is recovered from ray_idx instead)
        pix = [p for (n, p) in rec["randperms"] if n == res * res]
        assert len(pix) >= 1, [n for n, _ in rec["randperms"]]
        pixel_idx = pix[0][:r_pre].astype(np.int32)
        # depth jitter: rand_like over [B*V, r_pre, S, 1]
        jit = [a for a in rec["rand_likes"]
               if a.shape == (geom.n_obj * n_views, r_pre,
                              geom.depth_resolution, 1)]
        assert len(jit) == 1, [a.shape for a in rec["rand_likes"]]
        # ray selection -> [B, V, r_pre] mask over pixel_idx positions
        pos = {int(p): r for r, p in enumerate(pixel_idx)}
        ray_idx = rec["ray_idx"]  # [B, V, num_samples, 1]
        mask = np.zeros((geom.n_obj, n_views, r_pre), np.bool_)
        for b in range(ray_idx.shape[0]):
            for v in range(ray_idx.shape[1]):
                for p in ray_idx[b, v, :, 0]:
                    mask[b, v, pos[int(p)]] = True
        return {
            "feats_eps": eps[0].astype(np.float32),
            "pixel_idx": pixel_idx,
            "depth_jitter": jit[0][..., 0].astype(np.float32),
            "ray_mask": mask,
        }, rec["obj_idx"].astype(np.int32), int(ray_idx.shape[2])

    # ---- npcd_tpu side: same jitted step, injected draws ----------------
    import jax
    import jax.numpy as jnp

    from npcd_tpu.losses import PointNeRFLossWeights
    from npcd_tpu.train.pointnerf_training import (
        PointNeRFTrainState, make_pointnerf_optimizer, make_pointnerf_train_step,
    )

    params = pn.set_all_coords(params, ds.get_all_coords())
    tx = make_pointnerf_optimizer(lr)
    state = PointNeRFTrainState(
        params=params, opt_state=tx.init(params),
        step=jnp.zeros((), jnp.int32),
    )
    step_fn = make_pointnerf_train_step(pn, tx, PointNeRFLossWeights(*lw))

    images = np.stack([s["images"] for s in ds.samples])
    intr = np.stack([s["intrinsics"] for s in ds.samples])
    extr = np.stack([s["extrinsics"] for s in ds.samples])

    rng = jax.random.PRNGKey(seed + 200)  # consumed only by the dead
    # residual draws (the top-k selection score, which with ray_mask
    # injected only permutes the masked ray set)
    tpu_losses = []
    num_samples_per_step = []
    t0 = time.time()
    for it in range(steps):
        draws, obj_order, n_sel = parse_step(rec_steps[it])
        num_samples_per_step.append(n_sel)
        batch = {
            "obj_idx": jnp.asarray(obj_order),
            "images": jnp.asarray(images[obj_order]),
            "intrinsics": jnp.asarray(intr[obj_order]),
            "extrinsics": jnp.asarray(extr[obj_order]),
            "draws": {
                "feats_eps": jnp.asarray(draws["feats_eps"]),
                "pixel_idx": jnp.asarray(draws["pixel_idx"]),
                "depth_jitter": jnp.asarray(
                    draws["depth_jitter"]),
                "ray_mask": jnp.asarray(draws["ray_mask"].reshape(
                    geom.n_obj * n_views, r_pre)),
            },
        }
        state, metrics = step_fn(state, batch, jax.random.fold_in(rng, it))
        tpu_losses.append(float(metrics["loss"]))
    tpu_sec = time.time() - t0

    ref_l, tpu_l = np.asarray(ref_losses), np.asarray(tpu_losses)
    per_step_rel = np.abs(tpu_l - ref_l) / np.maximum(np.abs(ref_l), 1e-12)
    stats = band_stats(ref_losses, tpu_losses)
    return {
        "mode": "matched_draws",
        "geometry": {f: getattr(geom, f) for f in geom.__dataclass_fields__},
        "lr": lr, "loss_weights": lw,
        "ref_losses": ref_losses, "tpu_losses": tpu_losses,
        "num_samples_per_step": num_samples_per_step,
        "per_step_rel_dev_mean": float(per_step_rel.mean()),
        "per_step_rel_dev_max": float(per_step_rel.max()),
        "ref_sec": ref_sec, "tpu_sec": tpu_sec,
        **stats,
    }


# ---------------------------------------------------------------------------
# stage 2
# ---------------------------------------------------------------------------


def run_stage2(steps: int, seed: int = 0, n_obj: int = 8):
    import torch

    from tools.ref_oracle.harness import build_ref_diffusion, tpu_diffusion_from_ref
    from tools.ref_oracle.shims import import_reference

    import_reference()
    from npcd.train.diffusion_training import (
        DiffusionTraining as RefDiffusionTraining,
    )

    ref_dm = build_ref_diffusion(seed=seed)
    dm, dstate = tpu_diffusion_from_ref(ref_dm, qkv_groups=1)

    rng_np = np.random.default_rng(seed + 1)
    all_coords = rng_np.normal(size=(n_obj, 3, ref_dm.num_points)).astype(np.float32)
    all_feats = (rng_np.normal(size=(n_obj, ref_dm.feats_dim, ref_dm.num_points))
                 .astype(np.float32))

    class RefLatentDataset(torch.utils.data.Dataset):
        name = "RefLatentDataset"

        def __len__(self):
            return n_obj

        def __getitem__(self, i):
            return {"coords": all_coords[i], "feats": all_feats[i]}

        def get_loader(self, batch_size, shuffle, pin_memory, num_workers,
                       drop_last):
            return torch.utils.data.DataLoader(
                self, batch_size=batch_size, shuffle=shuffle,
                pin_memory=pin_memory, num_workers=num_workers,
                drop_last=drop_last,
            )

        def get_all_coords(self):
            return np.concatenate(list(all_coords), axis=-1)

        def get_all_feats(self):
            return np.concatenate(list(all_feats), axis=-1)

    class RefModelWrapper(torch.nn.Module):
        def __init__(self, diffusion):
            super().__init__()
            self.diffusion = diffusion

    wrapper = RefModelWrapper(ref_dm)
    ref_losses = []
    orig_compute_loss = ref_dm.compute_loss

    def recording_compute_loss(coords, feats):
        loss, sub, pw = orig_compute_loss(coords=coords, feats=feats)
        ref_losses.append(float(loss.detach()))
        return loss, sub, pw

    ref_dm.compute_loss = recording_compute_loss

    lr, wd = 7e-5, 0.01  # reference configs/npcd_srncars.yaml diffusion_training
    torch.manual_seed(seed + 100)
    t0 = time.time()
    with tempfile.TemporaryDirectory() as tmp:
        training = RefDiffusionTraining(
            out_dir=tmp, model=wrapper, dataset=RefLatentDataset(),
            batch_size=n_obj, base_learning_rate=lr, weight_decay=wd,
            max_iterations=steps, use_ema=True,
            ema_params=[(1, 0.9999, 0.9999, False)], dtype="float32",
            num_workers=0, print_interval=max(1, steps // 4),
            log_scalars_interval=10**9, log_interval=10**9,
            save_checkpoint_interval_min=10**9, verbose=False,
        )
        training()
    ref_sec = time.time() - t0

    # ---- npcd_tpu side: the same jitted step DiffusionTraining uses ----
    import jax
    import jax.numpy as jnp

    from npcd_tpu.train.diffusion_training import (
        DiffusionTrainState, make_diffusion_train_step,
    )
    from npcd_tpu.train.fused_update import FusedAdamWEma
    from npcd_tpu.utils.ema import EmaConfig

    dstate = dm.fit_normalizers(
        dstate, np.concatenate(list(all_coords), axis=-1),
        np.concatenate(list(all_feats), axis=-1),
    )
    ema_cfgs = (EmaConfig.from_tuple((1, 0.9999, 0.9999, False)),)
    fused = FusedAdamWEma(learning_rate=lr, weight_decay=wd, clip_max_norm=None,
                          ema_cfgs=ema_cfgs)
    tx = fused.make_tx()
    state = DiffusionTrainState(
        params=dstate.params, opt_state=tx.init(dstate.params),
        ema_params=(jax.tree_util.tree_map(jnp.copy, dstate.params),),
        step=jnp.zeros((), jnp.int32),
        coords_norm=dstate.coords_norm, feats_norm=dstate.feats_norm,
    )
    step_fn = make_diffusion_train_step(dm, fused, ema_cfgs)
    batch = {"coords": jnp.asarray(all_coords), "feats": jnp.asarray(all_feats)}
    rng = jax.random.PRNGKey(seed + 200)
    tpu_losses = []
    t0 = time.time()
    for it in range(steps):
        state, metrics = step_fn(state, batch, jax.random.fold_in(rng, it))
        tpu_losses.append(float(metrics["loss"]))
    tpu_sec = time.time() - t0

    stats = band_stats(ref_losses, tpu_losses)
    return {
        "model": {"width": 32, "layers": 2, "heads": 2,
                  "num_points": ref_dm.num_points,
                  "feats_dim": ref_dm.feats_dim},
        "lr": lr, "weight_decay": wd, "n_obj": n_obj,
        "ref_losses": ref_losses, "tpu_losses": tpu_losses,
        "ref_sec": ref_sec, "tpu_sec": tpu_sec,
        **stats,
    }


def run_stage2_matched(steps: int, seed: int = 0, n_obj: int = 8):
    """Matched-draw stage-2 comparison: record the reference trainer's
    actual random draws (timestep randint, the two q_sample randn_likes,
    DataLoader batch order) and inject them into a jitted npcd_tpu step
    that calls the same normalize + p_losses + fused-AdamW pieces
    DiffusionTraining composes. RNG eliminated; any trajectory gap is a
    semantic difference.

    Reference draw sites (all torch global RNG, CPU):
      * t ~ randint(0, 1000, [N]) (diffusion_model.py:104)
      * q_sample coords noise randn_like [N, 3, P]  (gaussian_diffusion.py:68-76)
      * q_sample feats noise randn_like [N, F, P]
      * DataLoader shuffle — recovered by matching recorded batch rows
        against the known latent set
    """
    import torch

    from tools.ref_oracle.harness import build_ref_diffusion, tpu_diffusion_from_ref
    from tools.ref_oracle.shims import import_reference

    import_reference()
    from npcd.train.diffusion_training import (
        DiffusionTraining as RefDiffusionTraining,
    )

    ref_dm = build_ref_diffusion(seed=seed)
    dm, dstate = tpu_diffusion_from_ref(ref_dm, qkv_groups=1)
    feat_dim, num_points = ref_dm.feats_dim, ref_dm.num_points

    rng_np = np.random.default_rng(seed + 1)
    all_coords = rng_np.normal(size=(n_obj, 3, num_points)).astype(np.float32)
    all_feats = rng_np.normal(size=(n_obj, feat_dim, num_points)).astype(
        np.float32)

    class RefLatentDataset(torch.utils.data.Dataset):
        name = "RefLatentDataset"

        def __len__(self):
            return n_obj

        def __getitem__(self, i):
            return {"coords": all_coords[i], "feats": all_feats[i]}

        def get_loader(self, batch_size, shuffle, pin_memory, num_workers,
                       drop_last):
            return torch.utils.data.DataLoader(
                self, batch_size=batch_size, shuffle=shuffle,
                pin_memory=pin_memory, num_workers=num_workers,
                drop_last=drop_last,
            )

        def get_all_coords(self):
            return np.concatenate(list(all_coords), axis=-1)

        def get_all_feats(self):
            return np.concatenate(list(all_feats), axis=-1)

    class RefModelWrapper(torch.nn.Module):
        def __init__(self, diffusion):
            super().__init__()
            self.diffusion = diffusion

    wrapper = RefModelWrapper(ref_dm)

    # ---- draw-recording hooks ------------------------------------------
    rec_steps = []
    cur = {"randints": [], "randns": []}
    orig_randint = torch.randint
    orig_randn = torch.randn

    def randint_hook(*a, **k):
        out = orig_randint(*a, **k)
        cur["randints"].append(out.clone().numpy())
        return out

    # p_losses draws noise via torch.randn(shape, ...) (reference
    # gaussian_diffusion.py:208,213), not randn_like
    def randn_hook(*a, **k):
        out = orig_randn(*a, **k)
        cur["randns"].append(out.clone().numpy())
        return out

    ref_losses = []
    orig_compute_loss = ref_dm.compute_loss

    def recording_compute_loss(coords, feats):
        loss, sub, pw = orig_compute_loss(coords=coords, feats=feats)
        ref_losses.append(float(loss.detach()))
        rec_steps.append({
            "batch_coords": coords.detach().numpy().copy(),
            **{k: list(v) for k, v in cur.items()},
        })
        for v in cur.values():
            v.clear()
        return loss, sub, pw

    ref_dm.compute_loss = recording_compute_loss

    lr, wd = 7e-5, 0.01
    torch.manual_seed(seed + 100)
    torch.randint = randint_hook
    torch.randn = randn_hook
    t0 = time.time()
    try:
        with tempfile.TemporaryDirectory() as tmp:
            training = RefDiffusionTraining(
                out_dir=tmp, model=wrapper, dataset=RefLatentDataset(),
                batch_size=n_obj, base_learning_rate=lr, weight_decay=wd,
                max_iterations=steps, use_ema=True,
                ema_params=[(1, 0.9999, 0.9999, False)], dtype="float32",
                num_workers=0, print_interval=max(1, steps // 4),
                log_scalars_interval=10**9, log_interval=10**9,
                save_checkpoint_interval_min=10**9, verbose=False,
            )
            training()
    finally:
        torch.randint = orig_randint
        torch.randn = orig_randn
        ref_dm.compute_loss = orig_compute_loss
    ref_sec = time.time() - t0
    assert len(rec_steps) == steps, (len(rec_steps), steps)

    def parse_step(rec):
        # batch order: match each recorded row to the known latents
        bc = rec["batch_coords"]
        order = np.array(
            [int(np.argmin(np.abs(all_coords - row).sum(axis=(1, 2))))
             for row in bc], np.int32)
        assert len(set(order.tolist())) == n_obj, order
        ts = [a for a in rec["randints"] if a.shape == (n_obj,)]
        assert len(ts) == 1, [a.shape for a in rec["randints"]]
        nc = [a for a in rec["randns"]
              if a.shape == (n_obj, 3, num_points)]
        nf = [a for a in rec["randns"]
              if a.shape == (n_obj, feat_dim, num_points)]
        assert len(nc) == 1 and len(nf) == 1, \
            [a.shape for a in rec["randns"]]
        return order, ts[0].astype(np.int32), nc[0], nf[0]

    # ---- npcd_tpu side: normalize + p_losses + fused AdamW with the
    # recorded draws injected --------------------------------------------
    import jax
    import jax.numpy as jnp

    from npcd_tpu.models.diffusion.normalizers import normalize
    from npcd_tpu.train.diffusion_training import DiffusionTrainState
    from npcd_tpu.train.fused_update import FusedAdamWEma
    from npcd_tpu.utils.ema import EmaConfig

    dstate = dm.fit_normalizers(
        dstate, np.concatenate(list(all_coords), axis=-1),
        np.concatenate(list(all_feats), axis=-1),
    )
    ema_cfgs = (EmaConfig.from_tuple((1, 0.9999, 0.9999, False)),)
    fused = FusedAdamWEma(learning_rate=lr, weight_decay=wd,
                          clip_max_norm=None, ema_cfgs=ema_cfgs)
    tx = fused.make_tx()
    state = DiffusionTrainState(
        params=dstate.params, opt_state=tx.init(dstate.params),
        ema_params=(jax.tree_util.tree_map(jnp.copy, dstate.params),),
        step=jnp.zeros((), jnp.int32),
        coords_norm=dstate.coords_norm, feats_norm=dstate.feats_norm,
    )

    coords_norm, feats_norm = dstate.coords_norm, dstate.feats_norm

    @jax.jit
    def matched_step(state, coords, feats, t, noise_c, noise_f):
        def loss_fn(params):
            c = normalize(coords_norm, coords)
            f = normalize(feats_norm, feats)
            # noise was drawn by the reference on the NORMALIZED tensors;
            # shapes match either way
            loss, sub, _ = dm.process.p_losses(
                jax.random.PRNGKey(0), dm.denoise_fn(params), c, f, t,
                noise=(noise_c, noise_f),
            )
            return loss, sub

        (loss, sub), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params)
        new_params, new_opt, new_emas, _ = fused.update(
            grads, state.opt_state, state.params, state.ema_params,
            state.step,
        )
        return state.replace(
            params=new_params, opt_state=new_opt, ema_params=new_emas,
            step=state.step + 1,
        ), loss

    tpu_losses = []
    t0 = time.time()
    for it in range(steps):
        order, ts, nc, nf = parse_step(rec_steps[it])
        state, loss = matched_step(
            state,
            jnp.asarray(all_coords[order]),
            jnp.asarray(all_feats[order]),
            jnp.asarray(ts),
            jnp.asarray(nc),
            jnp.asarray(nf),
        )
        tpu_losses.append(float(loss))
    tpu_sec = time.time() - t0

    ref_l, tpu_l = np.asarray(ref_losses), np.asarray(tpu_losses)
    per_step_rel = np.abs(tpu_l - ref_l) / np.maximum(np.abs(ref_l), 1e-12)
    stats = band_stats(ref_losses, tpu_losses)
    return {
        "mode": "matched_draws",
        "model": {"width": 32, "layers": 2, "heads": 2,
                  "num_points": num_points, "feats_dim": feat_dim},
        "lr": lr, "weight_decay": wd, "n_obj": n_obj,
        "ref_losses": ref_losses, "tpu_losses": tpu_losses,
        "per_step_rel_dev_mean": float(per_step_rel.mean()),
        "per_step_rel_dev_max": float(per_step_rel.max()),
        "ref_sec": ref_sec, "tpu_sec": tpu_sec,
        **stats,
    }


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--stage", choices=["1", "2", "both"], default="both")
    p.add_argument("--steps", type=int, default=300)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--matched", action="store_true",
                   help="Matched-draw stage-1 mode: record the reference "
                        "trainer's RNG draws and inject them into the JAX "
                        "step (eliminates sampling noise; only semantic "
                        "differences remain)")
    p.add_argument("--num-seeds", type=int, default=1,
                   help="Run seeds seed..seed+N-1 and report per-seed stats "
                        "(separates cross-framework gap from RNG noise band)")
    p.add_argument("--out", default="docs/experiments/ref_dynamics.json")
    p.add_argument("--platform", default="cpu",
                   help="JAX platform (cpu: reference torch runs on CPU "
                        "anyway, keep both sides on the same arithmetic)")
    args = p.parse_args(argv)

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    out = {"steps": args.steps, "seed": args.seed,
           "num_seeds": args.num_seeds}
    seeds = list(range(args.seed, args.seed + args.num_seeds))
    stage1_runner = run_stage1_matched if args.matched else run_stage1
    stage2_runner = run_stage2_matched if args.matched else run_stage2
    for stage, runner in (("stage1", stage1_runner), ("stage2", stage2_runner)):
        if args.stage not in (stage[-1], "both"):
            continue
        print(f"== {stage}: reference training vs npcd_tpu ==")
        runs = []
        for sd in seeds:
            r = runner(args.steps, sd)
            runs.append(r)
            print(f"{stage} seed {sd}: tail EMA rel dev mean "
                  f"{r['tail_rel_dev_mean']:.4f} max {r['tail_rel_dev_max']:.4f} "
                  f"(ref {r['ref_final_smoothed']:.5f} vs "
                  f"tpu {r['tpu_final_smoothed']:.5f})")
        out[stage] = runs[0] if len(runs) == 1 else {"per_seed": runs}
        if len(runs) > 1:
            refs = np.array([r["ref_final_smoothed"] for r in runs])
            tpus = np.array([r["tpu_final_smoothed"] for r in runs])
            out[stage]["summary"] = {
                "ref_final_mean": float(refs.mean()),
                "ref_final_std": float(refs.std(ddof=1)),
                "tpu_final_mean": float(tpus.mean()),
                "tpu_final_std": float(tpus.std(ddof=1)),
                "gap_over_ref_std": float(
                    abs(tpus.mean() - refs.mean())
                    / max(refs.std(ddof=1), 1e-12)),
            }
            s = out[stage]["summary"]
            print(f"{stage} summary: ref {s['ref_final_mean']:.5f}"
                  f"±{s['ref_final_std']:.5f} vs tpu {s['tpu_final_mean']:.5f}"
                  f"±{s['tpu_final_std']:.5f} "
                  f"(gap = {s['gap_over_ref_std']:.2f}x ref std)")

    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
