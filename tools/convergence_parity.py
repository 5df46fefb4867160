#!/usr/bin/env python
"""Train-to-convergence quality parity: the REAL reference training stacks
(torch CPU, /root/reference) vs npcd_tpu, on a shared fully-fittable toy
scene, compared at the level the blocked real-data numbers would measure —
final reconstruction PSNR (stage 1) and generated-sample statistics
(stage 2 through generation).

This is the asset-free proxy for the PSNR-30.2 / FID-28.6 parity numbers
(reference README.md:70-72,89-93), which cannot be produced in this
zero-egress image (no SRN data / released weights / Inception graph — see
ASSETS.md). Short-horizon loss-band and matched-draw comparisons
(tools/ref_dynamics.py) pin per-step semantics; this tool closes the
remaining gap: *do both frameworks' full training loops reach the same
quality?*

Protocol
  * Scene: n_obj random point clouds + a "teacher" PointNeRF (random MLPs,
    density bias raised so objects are opaque) rendering V views per object
    at --res. The teacher is inside the model family, so a perfect student
    fit is possible; teacher images are rendered by the npcd_tpu eval
    forward, which tests/test_reference_oracle.py pins to the reference
    torch forward to float precision (framework-neutral GT).
  * Stage 1 (per seed): both frameworks start from converter-matched
    random init (identical weights) and run their OWN full training loops
    (reference npcd/train/pointnerf_training.py:130-147 vs the jitted
    npcd_tpu step) with their own RNG streams for --steps1 full-batch
    steps at the reference lr. Final metric: eval-mode full-image PSNR
    against the teacher GT, evaluated by each framework's own renderer.
  * Stage 2 (per seed): a DDPM (matched init) trains on the stage-1
    latents of the npcd_tpu seed-0 student (same latent set for every run;
    reference npcd/train/diffusion_training.py:143-174 vs the fused jitted
    npcd_tpu step) for --steps2 steps, then generates --gen samples with
    its own sampler. Final metrics: generated-sample moments vs the data,
    nearest-data-neighbor distances, and energy distances, with the
    within-framework seed-to-seed energy distance as the noise floor.

Pass rule (reported in the output json): the cross-framework final-metric
gap is within the seed-noise band — |mean_ref - mean_tpu| <= max(seed std)
on stage-1 PSNR, and cross-framework energy distance <= the within-
framework range on stage-2 samples.

Runtime: torch runs on the single CPU core; the npcd_tpu side runs on the
default JAX backend (TPU when present; --platform cpu forces same-
arithmetic CPU). Full protocol (3 seeds) is a few tens of minutes.

Usage:
  python tools/convergence_parity.py --seeds 3 --steps1 2000 --steps2 3000 \
      --out docs/experiments/convergence_parity.json
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


# ---------------------------------------------------------------------------
# shared scene
# ---------------------------------------------------------------------------


def build_scene(geom, n_views: int, teacher_seed: int, teacher_bias: float):
    """Clouds, cameras, and teacher-rendered GT images (numpy).

    Returns dict with clouds [N, P, 3], extr/intr [N, V, ...], images
    [N, V, res*res, 3] in [0, 1], and teacher image stats."""
    import jax
    import jax.numpy as jnp

    from npcd_tpu.data.synthetic import random_cameras
    from tools.ref_oracle.harness import build_ref_pointnerf, tpu_pointnerf_from_ref

    rng = np.random.default_rng(teacher_seed)
    clouds = rng.uniform(-0.8, 0.8, (geom.n_obj, geom.num_points, 3)).astype(
        np.float32
    )
    extr1, intr1 = random_cameras(n_views, geom.resolution, seed=teacher_seed + 1)
    extr = np.tile(extr1[None], (geom.n_obj, 1, 1, 1)).astype(np.float32)
    intr = np.tile(intr1[None], (geom.n_obj, 1, 1, 1)).astype(np.float32)

    # teacher: random reference init (randomized tables), density bias
    # raised so the clouds render opaque instead of near-transparent
    pn_ref = build_ref_pointnerf(geom, seed=teacher_seed + 2)
    pn, params = tpu_pointnerf_from_ref(pn_ref, geom)
    params = pn.set_all_coords(params, clouds)
    shape_last = dict(params["field"]["shape_net"][-1])
    shape_last["b"] = shape_last["b"] + teacher_bias
    params = {
        **params,
        "field": {
            **params["field"],
            "shape_net": params["field"]["shape_net"][:-1] + [shape_last],
        },
    }

    # one jitted eval forward, shared by the teacher render and every
    # student PSNR eval (identical geometry -> one compile; the un-jitted
    # forward would dispatch eagerly op-by-op, minutes over the TPU
    # tunnel). Exact-f32 matmul precision: at the TPU DEFAULT the render
    # deviates ~2% RMS from the reference/CPU semantics and the teacher
    # GT would carry that flavor, biasing the PSNR comparison toward
    # whichever side evaluates in the same flavor (measured +7 dB,
    # docs/experiments/renderer_precision.json).
    import dataclasses as _dc

    pn.cfg = _dc.replace(pn.cfg, matmul_precision="highest")
    eval_fn = jax.jit(
        lambda p, oi, ii, ee: pn.forward(
            p, oi, ii, ee, train=False, resolution=geom.resolution
        )[0]
    )
    pred = eval_fn(
        params, jnp.arange(geom.n_obj), jnp.asarray(intr), jnp.asarray(extr)
    )
    images = np.asarray(pred["channels"], np.float32)  # [N, V, res^2, 3]
    mask = np.asarray(pred["mask"], np.float32)[..., 0] > 0  # [N, V, res^2]
    return {
        "clouds": clouds,
        "extr": extr,
        "intr": intr,
        "images": images,
        "mask": mask,
        "teacher_img_std": float(images.std()),
        "teacher_mask_mean": float(mask.mean()),
        "eval_fn": eval_fn,
    }


def psnr_per_view(pred_imgs: np.ndarray, gt_imgs: np.ndarray,
                  mask: np.ndarray = None) -> float:
    """Mean over (object, view) of per-view PSNR at data_range 1 — the
    reference protocol (npcd/eval/pointnerf_evaluation.py:242-257 computes
    per-view skimage PSNR and pandas-means it). With `mask` [N, V, R] the
    MSE is restricted to the teacher's object pixels — the background is
    trivially white under white_back, so the full-frame PSNR is inflated
    by ~90% background; the masked number is the discriminative one."""
    p = np.asarray(pred_imgs, np.float64).reshape(*pred_imgs.shape[:2], -1, 3)
    g = np.asarray(gt_imgs, np.float64).reshape(*gt_imgs.shape[:2], -1, 3)
    se = np.mean((p - g) ** 2, axis=-1)  # [N, V, R]
    if mask is None:
        mse = se.mean(axis=-1)
    else:
        m = np.asarray(mask, bool)
        cnt = np.maximum(m.sum(axis=-1), 1)
        mse = np.where(m, se, 0.0).sum(axis=-1) / cnt
    return float(np.mean(10.0 * np.log10(1.0 / np.maximum(mse, 1e-12))))


# ---------------------------------------------------------------------------
# stage 1
# ---------------------------------------------------------------------------


def make_ref_dataset(scene, geom, n_views):
    """Serve the shared numpy scene in the reference Dataset format
    (images [V, 3, H, W]; world2cam extrinsics)."""
    import torch

    from tools.ref_oracle.shims import import_reference

    import_reference()
    from npcd.data.dataset import Dataset as RefDataset, Sample as RefSample

    res = geom.resolution

    class StaticSample(RefSample):
        def __init__(self, d):
            self.d = d

        def load(self, root):
            return self.d

    class RefScene(RefDataset):
        def _init_samples(self):
            for i in range(geom.n_obj):
                img = scene["images"][i].reshape(n_views, res, res, 3)
                self.samples.append(
                    StaticSample(
                        {
                            "obj_idx": np.int64(i),
                            "images": img.transpose(0, 3, 1, 2).copy(),
                            "intrinsics": scene["intr"][i].copy(),
                            "extrinsics": scene["extr"][i].copy(),
                        }
                    )
                )

        def get_all_coords(self):
            return torch.from_numpy(scene["clouds"].copy())

    return RefScene(root=None, verbose=False)


def ref_eval_preds(pn_ref, scene, geom) -> np.ndarray:
    """Reference eval-mode full-image render, object-batched for CPU RAM."""
    import torch

    pn_ref.eval()
    preds = []
    with torch.no_grad():
        for i in range(geom.n_obj):
            pred, _ = pn_ref(
                obj_idx=torch.as_tensor([i], dtype=torch.long),
                intrinsics=torch.as_tensor(scene["intr"][i : i + 1]),
                extrinsics=torch.as_tensor(scene["extr"][i : i + 1]),
                sample_rays=False,
            )
            preds.append(pred["channels"][0].detach().numpy())
    pn_ref.train()
    return np.stack(preds)


def run_stage1_ref(scene, geom, n_views, steps, seed, lr=1e-3):
    """Reference stage-1 training to convergence (real classes, own RNG)."""
    import torch

    from tools.ref_oracle.harness import build_ref_pointnerf
    from tools.ref_oracle.shims import import_reference

    import_reference()
    from npcd.losses import PointNeRFLoss as RefPointNeRFLoss
    from npcd.train.pointnerf_training import (
        PointNeRFTraining as RefPointNeRFTraining,
    )

    ref_ds = make_ref_dataset(scene, geom, n_views)
    pn_ref = build_ref_pointnerf(geom, seed=seed)

    class RefModelWrapper(torch.nn.Module):
        def __init__(self, pointnerf):
            super().__init__()
            self.pointnerf = pointnerf

    wrapper = RefModelWrapper(pn_ref)
    ref_losses = []
    ref_rays = []  # the batch-min trained-ray count per step
    # (reference aggregator.py:78-119: num_samples = min over instances of
    # the valid-ray count — the whole batch trains on that many rays; the
    # npcd_tpu fixed-shape selection instead trains each instance on
    # min(valid_i, train_rays) rays, so it consumes more gradient signal
    # per step. Quantified here for the convergence-speed comparison.)

    class LossRecorder(torch.nn.Module):
        def __init__(self, inner):
            super().__init__()
            self.inner = inner

        def forward(self, **kw):
            loss, sub, pw = self.inner(**kw)
            ref_losses.append(float(loss.detach()))
            ref_rays.append(int(kw["pred"]["ray_idx"].shape[2]))
            return loss, sub, pw

    lw = (1.0, 1e-7, 3.5e-7)  # reference train_pointnerf.py:56-59
    loss = LossRecorder(
        RefPointNeRFLoss(
            model=wrapper,
            image_reconstruction_loss_weight=lw[0],
            neural_point_cloud_kl_loss_weight=lw[1],
            neural_point_cloud_tv_loss_weight=lw[2],
            verbose=False,
        )
    )
    torch.manual_seed(seed + 100)
    t0 = time.time()
    with tempfile.TemporaryDirectory() as tmp:
        training = RefPointNeRFTraining(
            out_dir=tmp,
            model=wrapper,
            dataset=ref_ds,
            loss=loss,
            batch_size=geom.n_obj,
            base_learning_rate=lr,
            max_epochs=steps,
            num_workers=0,
            print_interval=max(1, steps // 4),
            log_loss_interval=10**9,
            log_interval=10**9,
            save_checkpoint_interval_min=10**9,
            verbose=False,
        )
        training._log_all = lambda *a, **k: None
        training()
    sec = time.time() - t0
    preds = ref_eval_preds(pn_ref, scene, geom)
    return {
        "final_psnr": psnr_per_view(preds, scene["images"]),
        "final_psnr_masked": psnr_per_view(preds, scene["images"],
                                           scene["mask"]),
        "losses": ref_losses,
        "rays_per_step_mean": float(np.mean(ref_rays)),
        "sec": sec,
    }, pn_ref


def run_stage1_tpu(scene, geom, n_views, steps, seed, lr=1e-3):
    """npcd_tpu stage-1 training (matched init via the converter, own RNG,
    the same jitted step PointNeRFTraining uses)."""
    import jax
    import jax.numpy as jnp

    from npcd_tpu.losses import PointNeRFLossWeights
    from npcd_tpu.train.pointnerf_training import (
        PointNeRFTrainState,
        make_pointnerf_optimizer,
        make_pointnerf_train_step,
    )
    from tools.ref_oracle.harness import build_ref_pointnerf, tpu_pointnerf_from_ref

    pn_ref = build_ref_pointnerf(geom, seed=seed)
    pn, params = tpu_pointnerf_from_ref(pn_ref, geom)
    params = pn.set_all_coords(params, scene["clouds"])

    lw = (1.0, 1e-7, 3.5e-7)
    tx = make_pointnerf_optimizer(lr)
    state = PointNeRFTrainState(
        params=params, opt_state=tx.init(params), step=jnp.zeros((), jnp.int32)
    )
    step_fn = make_pointnerf_train_step(pn, tx, PointNeRFLossWeights(*lw))
    batch = {
        "obj_idx": jnp.arange(geom.n_obj),
        "images": jnp.asarray(scene["images"]),
        "intrinsics": jnp.asarray(scene["intr"]),
        "extrinsics": jnp.asarray(scene["extr"]),
    }
    rng = jax.random.PRNGKey(seed + 200)
    losses = []
    t0 = time.time()
    for it in range(steps):
        state, metrics = step_fn(state, batch, jax.random.fold_in(rng, it))
        losses.append(float(metrics["loss"]))
    sec = time.time() - t0

    # shared jitted eval (students share the teacher's geometry)
    pred = scene["eval_fn"](
        state.params, jnp.arange(geom.n_obj),
        batch["intrinsics"], batch["extrinsics"],
    )
    preds = np.asarray(pred["channels"])
    return {
        "final_psnr": psnr_per_view(preds, scene["images"]),
        "final_psnr_masked": psnr_per_view(preds, scene["images"],
                                           scene["mask"]),
        "losses": losses,
        "sec": sec,
    }, (pn, state.params)


# ---------------------------------------------------------------------------
# stage 2
# ---------------------------------------------------------------------------


def latents_from_student(pn, params, clouds) -> tuple[np.ndarray, np.ndarray]:
    """[N, 3, P] coords + [N, F, P] feats (the PointNeRFDataset layout,
    reference pointnerf_dataset.py:25-29) from a trained stage-1 student."""
    feats = np.asarray(pn.get_all_feats(params), np.float32)  # [N, P, F]
    coords = np.asarray(clouds, np.float32)
    return coords.transpose(0, 2, 1), feats.transpose(0, 2, 1)


def run_stage2_ref(coords_lat, feats_lat, steps, seed, gen, width, layers,
                   heads, lr=7e-5, wd=0.01):
    """Reference stage-2: real DiffusionTraining (own RNG) + real
    1000-step generate loop."""
    import torch

    from tools.ref_oracle.harness import build_ref_diffusion
    from tools.ref_oracle.shims import import_reference

    import_reference()
    from npcd.train.diffusion_training import (
        DiffusionTraining as RefDiffusionTraining,
    )

    n_obj, _, num_points = coords_lat.shape
    feat_dim = feats_lat.shape[1]
    ref_dm = build_ref_diffusion(
        feat_dim=feat_dim, num_points=num_points, width=width, layers=layers,
        heads=heads, seed=seed,
    )

    class RefLatentDataset(torch.utils.data.Dataset):
        name = "RefLatentDataset"

        def __len__(self):
            return n_obj

        def __getitem__(self, i):
            return {"coords": coords_lat[i], "feats": feats_lat[i]}

        def get_loader(self, batch_size, shuffle, pin_memory, num_workers,
                       drop_last):
            return torch.utils.data.DataLoader(
                self, batch_size=batch_size, shuffle=shuffle,
                pin_memory=pin_memory, num_workers=num_workers,
                drop_last=drop_last,
            )

        def get_all_coords(self):
            return np.concatenate(list(coords_lat), axis=-1)

        def get_all_feats(self):
            return np.concatenate(list(feats_lat), axis=-1)

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

    torch.manual_seed(seed + 100)
    t0 = time.time()
    with tempfile.TemporaryDirectory() as tmp:
        training = RefDiffusionTraining(
            out_dir=tmp, model=wrapper, dataset=RefLatentDataset(),
            batch_size=n_obj, base_learning_rate=lr, weight_decay=wd,
            max_iterations=steps, use_ema=False, dtype="float32",
            num_workers=0, print_interval=max(1, steps // 4),
            log_scalars_interval=10**9, log_interval=10**9,
            save_checkpoint_interval_min=10**9, verbose=False,
        )
        training()
    train_sec = time.time() - t0

    ref_dm.compute_loss = orig_compute_loss
    torch.manual_seed(seed + 300)
    t0 = time.time()
    ref_dm.eval()
    with torch.no_grad():
        coords_list, feats_list = ref_dm.generate(num=gen, batch_size=gen)
    gen_sec = time.time() - t0
    gen_coords = np.stack([c.detach().numpy() for c in coords_list])
    gen_feats = np.stack([f.detach().numpy() for f in feats_list])
    return {
        "losses": ref_losses,
        "train_sec": train_sec,
        "gen_sec": gen_sec,
    }, (gen_coords, gen_feats)


def run_stage2_tpu(coords_lat, feats_lat, steps, seed, gen, width, layers,
                   heads, lr=7e-5, wd=0.01):
    """npcd_tpu stage-2: matched init via the converter, own RNG, the same
    fused jitted step DiffusionTraining uses, scan sampler for generation."""
    import jax
    import jax.numpy as jnp

    from npcd_tpu.train.diffusion_training import (
        DiffusionTrainState,
        make_diffusion_train_step,
    )
    from npcd_tpu.train.fused_update import FusedAdamWEma
    from tools.ref_oracle.harness import build_ref_diffusion, tpu_diffusion_from_ref

    feat_dim = feats_lat.shape[1]
    num_points = coords_lat.shape[2]
    ref_dm = build_ref_diffusion(
        feat_dim=feat_dim, num_points=num_points, width=width, layers=layers,
        heads=heads, seed=seed,
    )
    dm, dstate = tpu_diffusion_from_ref(ref_dm, qkv_groups=1)
    dstate = dm.fit_normalizers(
        dstate,
        np.concatenate(list(coords_lat), axis=-1),
        np.concatenate(list(feats_lat), axis=-1),
    )
    fused = FusedAdamWEma(
        learning_rate=lr, weight_decay=wd, clip_max_norm=None, ema_cfgs=()
    )
    tx = fused.make_tx()
    state = DiffusionTrainState(
        params=dstate.params,
        opt_state=tx.init(dstate.params),
        ema_params=(),
        step=jnp.zeros((), jnp.int32),
        coords_norm=dstate.coords_norm,
        feats_norm=dstate.feats_norm,
    )
    step_fn = make_diffusion_train_step(dm, fused, ())
    batch = {
        "coords": jnp.asarray(coords_lat),
        "feats": jnp.asarray(feats_lat),
    }
    rng = jax.random.PRNGKey(seed + 200)
    losses = []
    t0 = time.time()
    for it in range(steps):
        state, metrics = step_fn(state, batch, jax.random.fold_in(rng, it))
        losses.append(float(metrics["loss"]))
    train_sec = time.time() - t0

    t0 = time.time()
    # the jitted step donates its state; the generation state must use the
    # final state's own (freshly returned) normalizer arrays
    gen_state = dstate.replace(
        params=state.params,
        coords_norm=state.coords_norm,
        feats_norm=state.feats_norm,
    )
    gen_coords, gen_feats = dm.generate(
        gen_state,
        jax.random.PRNGKey(seed + 300),
        num=gen,
        batch_size=gen,
    )
    gen_coords = np.asarray(gen_coords, np.float32)
    gen_feats = np.asarray(gen_feats, np.float32)
    gen_sec = time.time() - t0
    return {
        "losses": losses,
        "train_sec": train_sec,
        "gen_sec": gen_sec,
    }, (gen_coords, gen_feats)


# ---------------------------------------------------------------------------
# sample statistics
# ---------------------------------------------------------------------------


def _flat(gen):
    coords, feats = gen
    return np.concatenate(
        [coords.reshape(coords.shape[0], -1), feats.reshape(feats.shape[0], -1)],
        axis=1,
    ).astype(np.float64)


def energy_distance(x: np.ndarray, y: np.ndarray) -> float:
    """Szekely energy distance between two sample sets [n, d], [m, d]."""

    def mean_pdist(a, b):
        d2 = (
            np.sum(a * a, 1)[:, None]
            + np.sum(b * b, 1)[None, :]
            - 2.0 * (a @ b.T)
        )
        return float(np.sqrt(np.maximum(d2, 0.0)).mean())

    return 2.0 * mean_pdist(x, y) - mean_pdist(x, x) - mean_pdist(y, y)


def sample_stats(gen, data_coords, data_feats):
    """Moments + nearest-data-neighbor distances of a generated set."""
    coords, feats = gen
    g = _flat(gen)
    d = _flat((data_coords, data_feats))
    d2 = (
        np.sum(g * g, 1)[:, None] + np.sum(d * d, 1)[None, :] - 2.0 * (g @ d.T)
    )
    nn = np.sqrt(np.maximum(d2.min(axis=1), 0.0))
    scale = float(np.sqrt((d**2).sum(1)).mean())
    return {
        "coords_mean": float(coords.mean()),
        "coords_std": float(coords.std()),
        "feats_mean": float(feats.mean()),
        "feats_std": float(feats.std()),
        "nn_dist_mean": float(nn.mean()),
        "nn_dist_rel": float(nn.mean() / max(scale, 1e-12)),
        "energy_vs_data": energy_distance(g, d),
    }


# ---------------------------------------------------------------------------
# driver
# ---------------------------------------------------------------------------


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--stage", choices=["1", "2", "both"], default="both")
    p.add_argument("--seeds", type=int, default=3)
    p.add_argument("--seed0", type=int, default=0)
    p.add_argument("--steps1", type=int, default=2000)
    p.add_argument("--steps1-ref-mult", type=float, default=1.0,
                   help="multiply the REFERENCE side's stage-1 steps (the "
                        "fixed-shape selection trains each instance on "
                        "min(valid, train_rays) rays/step vs the "
                        "reference's batch-min count — roughly 2x the "
                        "signal; a mult >= 2 compares PLATEAUS instead of "
                        "equal-step convergence speed)")
    p.add_argument("--steps2", type=int, default=3000)
    p.add_argument("--gen", type=int, default=64)
    p.add_argument("--res", type=int, default=32)
    p.add_argument("--views", type=int, default=4)
    p.add_argument("--n_obj", type=int, default=8)
    p.add_argument("--num_points", type=int, default=48)
    p.add_argument("--feat_dim", type=int, default=8)
    p.add_argument("--width", type=int, default=64)
    p.add_argument("--layers", type=int, default=2)
    p.add_argument("--heads", type=int, default=2)
    p.add_argument("--teacher_bias", type=float, default=3.0)
    p.add_argument("--platform", default=None,
                   help="JAX platform override (default: whatever the "
                        "image provides — TPU when tunneled; 'cpu' forces "
                        "same-arithmetic CPU)")
    p.add_argument("--out", default="docs/experiments/convergence_parity.json")
    args = p.parse_args(argv)

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    from tools.ref_oracle.harness import TinyGeometry

    geom = TinyGeometry(
        n_obj=args.n_obj,
        num_points=args.num_points,
        feat_dim=args.feat_dim,
        resolution=args.res,
        depth_resolution=24,
        max_shading_pts=8,
        renderer_ray_subsamples=64,
        aggregator_ray_subsamples=64,
        train_rays=64,
    )
    scene = build_scene(geom, args.views, teacher_seed=1234,
                        teacher_bias=args.teacher_bias)
    print(
        f"scene: {args.n_obj} obj x {args.views} views @ {args.res}^2, "
        f"teacher img std {scene['teacher_img_std']:.3f} "
        f"mask {scene['teacher_mask_mean']:.3f} "
        f"[jax backend: {jax.default_backend()}]",
        flush=True,
    )

    out = {
        "geometry": {f: getattr(geom, f) for f in geom.__dataclass_fields__},
        "views": args.views,
        "steps1": args.steps1,
        "steps2": args.steps2,
        "gen": args.gen,
        "teacher_img_std": scene["teacher_img_std"],
        "teacher_mask_mean": scene["teacher_mask_mean"],
        "jax_backend": jax.default_backend(),
        "stage2_model": {
            "width": args.width, "layers": args.layers, "heads": args.heads,
        },
    }
    seeds = list(range(args.seed0, args.seed0 + args.seeds))
    student0 = None

    if args.stage in ("1", "both"):
        runs = []
        ref_steps = int(args.steps1 * args.steps1_ref_mult)
        for sd in seeds:
            r_ref, _ = run_stage1_ref(scene, geom, args.views, ref_steps, sd)
            print(
                f"stage1 seed {sd} ref: PSNR {r_ref['final_psnr']:.2f} "
                f"(masked {r_ref['final_psnr_masked']:.2f}) "
                f"({r_ref['sec']:.0f}s)",
                flush=True,
            )
            r_tpu, student = run_stage1_tpu(
                scene, geom, args.views, args.steps1, sd
            )
            if sd == seeds[0]:
                student0 = student
            print(
                f"stage1 seed {sd} tpu: PSNR {r_tpu['final_psnr']:.2f} "
                f"(masked {r_tpu['final_psnr_masked']:.2f}) "
                f"({r_tpu['sec']:.0f}s)",
                flush=True,
            )
            runs.append(
                {
                    "seed": sd,
                    "ref_final_psnr": r_ref["final_psnr"],
                    "tpu_final_psnr": r_tpu["final_psnr"],
                    "ref_final_psnr_masked": r_ref["final_psnr_masked"],
                    "tpu_final_psnr_masked": r_tpu["final_psnr_masked"],
                    "ref_final_loss": float(np.mean(r_ref["losses"][-50:])),
                    "tpu_final_loss": float(np.mean(r_tpu["losses"][-50:])),
                    "ref_losses_every10": r_ref["losses"][::10],
                    "tpu_losses_every10": r_tpu["losses"][::10],
                    "ref_rays_per_step_mean": r_ref["rays_per_step_mean"],
                    "ref_steps": ref_steps,
                    "ref_sec": r_ref["sec"],
                    "tpu_sec": r_tpu["sec"],
                }
            )
        refs = np.array([r["ref_final_psnr_masked"] for r in runs])
        tpus = np.array([r["tpu_final_psnr_masked"] for r in runs])
        seed_std = max(
            float(refs.std(ddof=1)) if len(refs) > 1 else 0.0,
            float(tpus.std(ddof=1)) if len(tpus) > 1 else 0.0,
        )
        gap = float(abs(refs.mean() - tpus.mean()))
        out["stage1"] = {
            "per_seed": runs,
            "summary": {
                "metric": "masked_psnr",
                "ref_full_psnr_mean": float(np.mean(
                    [r["ref_final_psnr"] for r in runs])),
                "tpu_full_psnr_mean": float(np.mean(
                    [r["tpu_final_psnr"] for r in runs])),
                "ref_psnr_mean": float(refs.mean()),
                "ref_psnr_std": float(refs.std(ddof=1)) if len(refs) > 1 else 0.0,
                "tpu_psnr_mean": float(tpus.mean()),
                "tpu_psnr_std": float(tpus.std(ddof=1)) if len(tpus) > 1 else 0.0,
                "psnr_gap": gap,
                "seed_std": seed_std,
                "within_seed_noise": bool(gap <= max(seed_std, 0.1)),
            },
        }
        s = out["stage1"]["summary"]
        print(
            f"stage1 summary: ref {s['ref_psnr_mean']:.2f}±{s['ref_psnr_std']:.2f} "
            f"vs tpu {s['tpu_psnr_mean']:.2f}±{s['tpu_psnr_std']:.2f} dB "
            f"(gap {s['psnr_gap']:.2f}, within noise: {s['within_seed_noise']})",
            flush=True,
        )

    if args.stage in ("2", "both"):
        if student0 is None:
            # stage-2-only invocation still needs the latents: train one
            # quick tpu student at seed0
            _, student0 = run_stage1_tpu(
                scene, geom, args.views, args.steps1, seeds[0]
            )
        pn0, params0 = student0
        coords_lat, feats_lat = latents_from_student(pn0, params0, scene["clouds"])
        gens_ref, gens_tpu, runs = [], [], []
        for sd in seeds:
            r_ref, gen_ref = run_stage2_ref(
                coords_lat, feats_lat, args.steps2, sd, args.gen,
                args.width, args.layers, args.heads,
            )
            print(
                f"stage2 seed {sd} ref: final loss "
                f"{np.mean(r_ref['losses'][-50:]):.4f} "
                f"(train {r_ref['train_sec']:.0f}s gen {r_ref['gen_sec']:.0f}s)",
                flush=True,
            )
            r_tpu, gen_tpu = run_stage2_tpu(
                coords_lat, feats_lat, args.steps2, sd, args.gen,
                args.width, args.layers, args.heads,
            )
            print(
                f"stage2 seed {sd} tpu: final loss "
                f"{np.mean(r_tpu['losses'][-50:]):.4f} "
                f"(train {r_tpu['train_sec']:.0f}s gen {r_tpu['gen_sec']:.0f}s)",
                flush=True,
            )
            gens_ref.append(gen_ref)
            gens_tpu.append(gen_tpu)
            runs.append(
                {
                    "seed": sd,
                    "ref_final_loss": float(np.mean(r_ref["losses"][-50:])),
                    "tpu_final_loss": float(np.mean(r_tpu["losses"][-50:])),
                    "ref_losses_every10": r_ref["losses"][::10],
                    "tpu_losses_every10": r_tpu["losses"][::10],
                    "ref_stats": sample_stats(gen_ref, coords_lat, feats_lat),
                    "tpu_stats": sample_stats(gen_tpu, coords_lat, feats_lat),
                    "ref_train_sec": r_ref["train_sec"],
                    "tpu_train_sec": r_tpu["train_sec"],
                }
            )
        # energy distances: cross-framework (same seed) vs within-framework
        # (seed pairs) — the latter is the seed-noise floor
        cross = [
            energy_distance(_flat(a), _flat(b))
            for a, b in zip(gens_ref, gens_tpu)
        ]
        within = []
        for gens in (gens_ref, gens_tpu):
            for i in range(len(gens)):
                for j in range(i + 1, len(gens)):
                    within.append(energy_distance(_flat(gens[i]), _flat(gens[j])))
        cross_mean = float(np.mean(cross))
        within_max = float(np.max(within)) if within else float("nan")
        out["stage2"] = {
            "per_seed": runs,
            "energy": {
                "cross_framework": cross,
                "within_framework": within,
                "cross_mean": cross_mean,
                "within_max": within_max,
                "within_noise": bool(
                    not within or cross_mean <= 1.5 * within_max
                ),
            },
        }
        e = out["stage2"]["energy"]
        print(
            f"stage2 energy: cross {e['cross_mean']:.4f} vs within-framework "
            f"max {e['within_max']:.4f} (within noise: {e['within_noise']})",
            flush=True,
        )

    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
