#!/usr/bin/env python
"""Generate neural point clouds from a trained NPCD checkpoint.

Serving-style entry point: load weights, sample `--num` point clouds with
the scan-based DDPM sampler, save them as one .npz (coords [N, 3, P],
feats [N, F, P]) and optionally render a few from the fixed test poses.
The reference exposes generation only inside its FID evaluation
(npcd/eval/diffusion_evaluation.py:146-152); this CLI makes it a
first-class capability, with the same DP mesh support as the evals.

Examples:
  python tools/generate_samples.py --config configs/npcd_srncars.yaml \
      --weights runs/diff/weights.ckpt --num 64 --out runs/samples
  python tools/generate_samples.py ... --mesh --render 4 \
      --poses data/srncars_test_poses.npy \
      --intrinsics data/srncars_test_intrinsics.npy
"""
from __future__ import annotations

import argparse
import os
import os.path as osp
import sys

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--config", required=True)
    p.add_argument("--weights", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--num", type=int, default=16)
    p.add_argument("--batch-size", type=int, default=16)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--mesh", action="store_true",
                   help="data-parallel sampling over all local devices")
    p.add_argument("--trajectory-stride", type=int, default=0,
                   help="if > 0, also save the reverse-process trajectory "
                        "subsampled by this stride (memory-bound)")
    p.add_argument("--render", type=int, default=0,
                   help="render the first N generated objects from "
                        "--poses/--intrinsics (PNG per object)")
    p.add_argument("--poses", help="[V,4,4] .npy of world2cam poses")
    p.add_argument("--intrinsics", help="[V,3,3] .npy")
    p.add_argument("--render-poses", type=int, default=4,
                   help="poses per rendered object")
    p.add_argument("--swap", type=int, default=0,
                   help="disentanglement demo: render an NxN grid crossing "
                        "the first N samples' SHAPES (coords, rows) with "
                        "their APPEARANCES (feats, columns) from the first "
                        "pose — the paper's headline capability (shape and "
                        "appearance are separate latents, so they recombine "
                        "freely). Requires --poses/--intrinsics.")
    p.add_argument("--resolution", type=int, default=128)
    p.add_argument("--platform", default=None, choices=["cpu", "tpu"])
    args = p.parse_args(argv)

    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)
    import jax
    import jax.numpy as jnp
    import numpy as np

    from npcd_tpu.models.npcd import NPCD
    from npcd_tpu.utils import load_config, logging
    from npcd_tpu.utils.checkpoint import load_weights_only

    config = load_config(args.config)
    model = NPCD.from_config(config)
    params = model.init_params(jax.random.PRNGKey(args.seed))
    params = load_weights_only(
        args.weights, params,
        expected_layout={"qkv_groups": model.diffusion.denoiser.resolved_qkv_groups()},
    )
    logging.info(f"Loaded weights from {args.weights}")

    data_sharding = None
    if args.mesh:
        from jax.sharding import NamedSharding, PartitionSpec

        from npcd_tpu.parallel import make_mesh

        mesh = make_mesh()
        data_sharding = NamedSharding(mesh, PartitionSpec("data"))
        params = jax.device_put(params, NamedSharding(mesh, PartitionSpec()))

    rng = jax.random.PRNGKey(args.seed)
    out = model.diffusion.generate(
        params["diffusion"], rng, num=args.num, batch_size=args.batch_size,
        progress=True, data_sharding=data_sharding,
        return_trajectory=args.trajectory_stride > 0,
        trajectory_stride=max(args.trajectory_stride, 1),
    )
    coords, feats = out[0], out[1]

    os.makedirs(args.out, exist_ok=True)
    path = osp.join(args.out, "samples.npz")
    arrays = {"coords": coords, "feats": feats}
    if args.trajectory_stride > 0:
        traj = out[2]
        arrays["trajectory_coords"] = np.asarray(traj.coords_ts)
        arrays["trajectory_feats"] = np.asarray(traj.feats_ts)
    np.savez(path, **arrays)
    logging.info(f"Saved {args.num} point clouds to {path}")

    if args.swap > 0:
        if not (args.poses and args.intrinsics):
            raise SystemExit("--swap requires --poses and --intrinsics")
        n = min(args.swap, args.num)
        pose = np.load(args.poses)[:1].astype(np.float32)
        k = np.load(args.intrinsics)[:1].astype(np.float32)
        # cross product: instance (i, j) = shape of sample i + appearance of
        # sample j; the generated latents factor cleanly because coords and
        # feats are separate channels of the NPC (paper §1; reference
        # models/npcd.py keeps them separate end to end)
        ci = np.repeat(coords[:n].transpose(0, 2, 1), n, axis=0)  # [n*n,P,3]
        fj = np.tile(feats[:n].transpose(0, 2, 1), (n, 1, 1))     # [n*n,P,F]

        @jax.jit
        def render_swap(pn_params, c, f, extr, kk):
            out = model.pointnerf.render(
                pn_params, c, f, extr, kk, resolution=args.resolution
            )
            return out["channels"]

        nn = n * n
        channels = render_swap(
            params["pointnerf"], jnp.asarray(ci), jnp.asarray(fj),
            jnp.asarray(np.broadcast_to(pose[None], (nn,) + pose.shape)),
            jnp.asarray(np.broadcast_to(k[None], (nn,) + k.shape)),
        )  # [n*n, 1, H*W, 3]
        grid = np.clip(np.asarray(channels), 0, 1).reshape(
            n * n, args.resolution, args.resolution, 3
        )
        from npcd_tpu.utils.vis import tile_images, vis_image

        img = vis_image(tile_images(list(grid), cols=n))
        img.save(osp.join(args.out, "swap_grid.png"))
        logging.info(
            f"Saved {n}x{n} shape(rows) x appearance(cols) grid to "
            f"{osp.join(args.out, 'swap_grid.png')}"
        )

    if args.render > 0:
        if not (args.poses and args.intrinsics):
            raise SystemExit("--render requires --poses and --intrinsics")
        poses = np.load(args.poses)[: args.render_poses].astype(np.float32)
        intr = np.load(args.intrinsics)[: args.render_poses].astype(np.float32)
        n = min(args.render, args.num)

        @jax.jit
        def render(pn_params, c, f, extr, k):
            out = model.pointnerf.render(
                pn_params, c, f, extr, k, resolution=args.resolution
            )
            return out["channels"]

        channels = render(
            params["pointnerf"],
            jnp.asarray(coords[:n].transpose(0, 2, 1)),
            jnp.asarray(feats[:n].transpose(0, 2, 1)),
            jnp.asarray(np.broadcast_to(poses[None], (n,) + poses.shape)),
            jnp.asarray(np.broadcast_to(intr[None], (n,) + intr.shape)),
        )  # [n, V, H*W, 3]
        images = np.clip(np.asarray(channels), 0, 1).reshape(
            n, len(poses), args.resolution, args.resolution, 3
        )
        from npcd_tpu.utils.vis import vis_image

        for i in range(n):
            img = vis_image(images[i].transpose(0, 3, 1, 2), full_batch=True)
            img.save(osp.join(args.out, f"sample{i:04d}.png"))
        logging.info(f"Rendered {n} objects x {len(poses)} poses to {args.out}")


if __name__ == "__main__":
    main()
