#!/usr/bin/env python
"""Qualify the 'knn' vs 'voxel' sample-validity semantic for the parity
eval (docs/PARITY.md "validity").

Background: the published reference weights were trained and evaluated
under the CUDA voxel-grid query (reference npcd/models/pointnerf/
pointnerf.py:67-75 — always constructed), whose validity test is "the
sample's kernel-window voxel neighborhood contains a point". The
reference's pure-tensor fallback (aggregator.py:42-58) — npcd_tpu's
production default — instead tests "nearest point within the absolute
radius r * max(scaled_voxel_size)". Both keep the first max_shading_pts
valid samples per ray; the selected sets differ only where a sample is
within the window diagonally but farther than the radius (voxel-validity
corners), or inside the radius but in an unoccupied voxel (cannot happen:
a point within r of the sample occupies a window voxel for the SRN config
where the window reach r_w = (kernel//2 + 1) * max(vsize) = 0.16 >=
knn_radius = 0.16 — the asymmetry is one-sided).

This tool quantifies the cross-semantic delta at the production geometry:

  1. selection overlap (weight-independent — validity only consumes
     coords/rays): per-sample validity agreement, selected-shading-set
     IoU, and ray-mask IoU over SRN-cars test poses x car-box clouds;
  2. rendered-image delta on a TRAINED model: a tiny stage-1 student
     (trained on the convergence-parity teacher scene) rendered under
     both semantics — cross-PSNR between the two renders and each
     semantic's PSNR against the GT it was trained on.

Writes docs/experiments/validity_ab.json, cited from PARITY.md. The
parity-eval knob is tools/parity_eval.py --validity.

Usage: python tools/ab_validity.py [--train-steps 600]
"""
from __future__ import annotations

import argparse
import dataclasses
import json
import os
import os.path as osp
import sys
import time

import numpy as np

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))


def selection_overlap(n_views: int = 8, n_clouds: int = 4, res: int = 128):
    """Weight-independent validity/selection agreement at the production
    geometry (512 points, SRN voxel config, real test poses)."""
    import jax
    import jax.numpy as jnp

    from npcd_tpu.models.pointnerf.math_utils import (
        fill_invalid_ray_limits, get_ray_limits_box,
    )
    from npcd_tpu.models.pointnerf.ray_sampler import generate_rays
    from npcd_tpu.models.pointnerf.renderer import sample_depths
    from npcd_tpu.ops.knn import VoxelOccupancy, within_radius
    from npcd_tpu.utils.config import pointnerf_default_options

    opts = pointnerf_default_options()
    repo = osp.dirname(osp.dirname(osp.abspath(__file__)))
    extr = np.load(osp.join(repo, "data", "srncars_test_poses.npy"))[:n_views]
    intr = np.load(
        osp.join(repo, "data", "srncars_test_intrinsics.npy")
    )[:n_views].astype(np.float32)

    rays_o, rays_d = generate_rays(
        jnp.asarray(extr, jnp.float32), jnp.asarray(intr), res
    )  # [V, R, 3]
    ray_start, ray_end = get_ray_limits_box(
        rays_o, rays_d, opts.renderer.cube_scale
    )
    ray_start, ray_end = fill_invalid_ray_limits(ray_start, ray_end)
    depths = sample_depths(
        ray_start[..., 0], ray_end[..., 0], opts.renderer.depth_resolution,
        None,
    )  # [V, R, S]
    x = rays_o[:, :, None, :] + depths[..., None] * rays_d[:, :, None, :]
    m = opts.aggregator.max_shading_pts

    rng = np.random.default_rng(0)
    stats = []
    for ci in range(n_clouds):
        pts = rng.uniform(-1, 1, (1, opts.num_points, 3)) * np.array(
            [0.42, 0.18, 0.16]
        )
        coords = jnp.asarray(
            np.broadcast_to(pts, (n_views, opts.num_points, 3)), jnp.float32
        )

        # the two validity semantics over the identical sample grid
        valid_knn = np.asarray(
            within_radius(
                x.reshape(n_views, -1, 3), coords, opts.knn_radius
            ).reshape(depths.shape)
        )
        occ = VoxelOccupancy.build(coords, opts.voxel_grid)
        valid_vox = np.asarray(
            occ.query(x.reshape(n_views, -1, 3)).reshape(depths.shape)
        )

        # selected shading sets: first <= max_shading_pts valid samples per
        # ray (the compaction rule, aggregator.py compact_valid_samples /
        # reference aggregator.py:42-58 cumsum cap), expressed on the
        # original [V, R, S] grid so the IoU compares actual sample picks
        sel_knn = valid_knn & (np.cumsum(valid_knn, axis=-1) <= m)
        sel_vox = valid_vox & (np.cumsum(valid_vox, axis=-1) <= m)

        def iou(a, b):
            return float(
                np.logical_and(a, b).sum() / max(np.logical_or(a, b).sum(), 1)
            )

        mk = valid_knn.any(-1)
        mv = valid_vox.any(-1)
        stats.append(
            {
                "validity_agree_frac": float((valid_knn == valid_vox).mean()),
                "validity_iou": iou(valid_knn, valid_vox),
                "selected_sample_iou": iou(sel_knn, sel_vox),
                "ray_mask_iou": iou(mk, mv),
                "knn_valid_frac": float(valid_knn.mean()),
                "voxel_valid_frac": float(valid_vox.mean()),
                "knn_ray_frac": float(mk.mean()),
                "voxel_ray_frac": float(mv.mean()),
            }
        )
    agg = {
        f"{k}_mean": float(np.mean([s[k] for s in stats]))
        for k in stats[0]
    }
    return {
        "n_views": n_views,
        "n_clouds": n_clouds,
        "max_shading_pts": m,
        "per_cloud": stats,
        **agg,
    }


def trained_model_delta(train_steps: int, res: int = 32, views: int = 4):
    """Cross-semantic render delta on a trained tiny student (the
    convergence-parity scene): train under the production 'knn' semantic,
    render evals under both."""
    import jax
    import jax.numpy as jnp

    from tools.convergence_parity import build_scene, psnr_per_view, run_stage1_tpu
    from tools.ref_oracle.harness import TinyGeometry

    geom = TinyGeometry(
        n_obj=8, num_points=24, feat_dim=8, resolution=res,
        depth_resolution=24, max_shading_pts=8,
        renderer_ray_subsamples=64, aggregator_ray_subsamples=64,
        train_rays=64,
    )
    scene = build_scene(geom, views, teacher_seed=1234, teacher_bias=3.0)
    _, (pn, params) = run_stage1_tpu(scene, geom, views, train_steps, seed=0)

    preds = {}
    for validity in ("knn", "voxel"):
        pn_v = type(pn)(
            n_obj=geom.n_obj, feats_dim=geom.feat_dim,
            num_points=geom.num_points, opts=pn.opts,
            render_config=dataclasses.replace(pn.cfg, validity=validity),
        )
        fwd = jax.jit(
            lambda p, oi, ii, ee, m=pn_v: m.forward(
                p, oi, ii, ee, train=False, resolution=res
            )[0]
        )
        pred = fwd(
            params, jnp.arange(geom.n_obj),
            jnp.asarray(scene["intr"]), jnp.asarray(scene["extr"]),
        )
        preds[validity] = np.asarray(pred["channels"], np.float32)

    return {
        "train_steps": train_steps,
        "trained_under": "knn",
        "psnr_vs_gt_knn": psnr_per_view(preds["knn"], scene["images"]),
        "psnr_vs_gt_voxel": psnr_per_view(preds["voxel"], scene["images"]),
        "cross_psnr_knn_vs_voxel": psnr_per_view(
            preds["knn"], preds["voxel"]
        ),
        "max_abs_pixel_delta": float(
            np.abs(preds["knn"] - preds["voxel"]).max()
        ),
    }


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--train-steps", type=int, default=600)
    p.add_argument("--skip-trained", action="store_true")
    p.add_argument("--skip-overlap", action="store_true")
    p.add_argument("--out", default="docs/experiments/validity_ab.json")
    args = p.parse_args(argv)

    import jax

    out = {"backend": jax.default_backend()}
    if not args.skip_overlap:
        t0 = time.time()
        out["selection_overlap"] = selection_overlap()
        print(
            f"selection overlap (production geometry): ray-mask IoU "
            f"{out['selection_overlap']['ray_mask_iou_mean']:.4f} "
            f"({time.time() - t0:.0f}s)",
            flush=True,
        )
    if not args.skip_trained:
        t0 = time.time()
        out["trained_model"] = trained_model_delta(args.train_steps)
        tm = out["trained_model"]
        print(
            f"trained model: PSNR(gt) knn {tm['psnr_vs_gt_knn']:.2f} vs "
            f"voxel {tm['psnr_vs_gt_voxel']:.2f}, cross-PSNR "
            f"{tm['cross_psnr_knn_vs_voxel']:.2f} ({time.time() - t0:.0f}s)",
            flush=True,
        )

    os.makedirs(osp.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
