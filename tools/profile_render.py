"""Profile the eval render path on the real TPU at representative shapes.

Measures device-time per call for PointNeRF.render at the FID-eval config
(128^2 rays, 512 points, S=128 depth samples, M=50 shading slots) across
instance-batch shapes, and dumps a per-op XLA breakdown for the largest.

Usage: python tools/profile_render.py [--shapes 2,8,32] [--chunk 2048]
"""
from __future__ import annotations

import argparse
import glob
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np



def make_scene(args, num_points, g, vb, seed=0):
    import jax
    import jax.numpy as jnp
    import numpy as np
    from npcd_tpu.data.synthetic import random_cameras

    if args.srn:
        poses = np.load("data/srncars_test_poses.npy")[:vb]
        intr = np.load("data/srncars_test_intrinsics.npy")[:vb]
        if args.res != 128:
            intr = intr * (args.res / 128.0)
        extr = jnp.asarray(poses)[None].repeat(g, 0)
        intr = jnp.asarray(intr)[None].repeat(g, 0)
        # car-shaped cloud: flat box, roughly SRN-cars normalized extents
        rng = np.random.default_rng(seed)
        pts = rng.uniform(-1, 1, (g, num_points, 3)).astype(np.float32)
        pts *= np.array([0.42, 0.18, 0.16], np.float32)
        coords = jnp.asarray(pts)
    else:
        coords = jax.random.uniform(
            jax.random.PRNGKey(1), (g, num_points, 3), minval=-0.5, maxval=0.5)
        extr, intr = random_cameras(vb, args.res, seed=seed)
        extr = jnp.asarray(extr)[None].repeat(g, 0)
        intr = jnp.asarray(intr)[None].repeat(g, 0)
    feats = jax.random.normal(jax.random.PRNGKey(2), (g, num_points, 32)) * 0.1
    return coords, feats, extr, intr

def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--shapes", default="2,8,32")
    ap.add_argument("--chunk", type=int, default=2048)
    ap.add_argument("--sb", type=int, default=None,
                    help="eval_slot_block override (staircase block size)")
    ap.add_argument("--res", type=int, default=128)
    ap.add_argument("--dtype", default="f32", choices=["f32", "bf16"])
    ap.add_argument("--prec", default=None,
                    help="render matmul_precision (default ambient; "
                         "'highest' = parity-exact, 'tensorfloat32' = "
                         "bf16x3 middle setting)")
    ap.add_argument("--topn", type=int, default=18)
    ap.add_argument("--srn", action="store_true",
                    help="use the real SRN-Cars test poses + a car-shaped "
                         "point cloud (the FID-protocol workload) instead "
                         "of random cameras over a uniform cube cloud")
    args = ap.parse_args()

    from npcd_tpu.data.synthetic import random_cameras
    from npcd_tpu.models.pointnerf import PointNeRF, PointNeRFRenderConfig
    from npcd_tpu.utils.config import pointnerf_default_options
    from tools.tputime import device_time

    num_points = 512
    opts = pointnerf_default_options()
    cdt = jnp.float32 if args.dtype == "f32" else jnp.bfloat16
    pn = PointNeRF(
        n_obj=1, feats_dim=32, num_points=num_points, opts=opts,
        render_config=PointNeRFRenderConfig(
            eval_ray_chunk=args.chunk, compute_dtype=cdt,
            matmul_precision=args.prec,
            **({"eval_slot_block": args.sb} if args.sb is not None else {})),
    )
    params = pn.init_params(jax.random.PRNGKey(0))
    res = args.res
    rays = res * res

    results = {}
    for n_inst in [int(s) for s in args.shapes.split(",")]:
        # emulate g objects x Vb poses; g=1 keeps memory bounded, the render
        # core flattens to I = g*Vb instances either way
        g, vb = 1, n_inst
        coords, feats, extr, intr = make_scene(args, num_points, g, vb)

        def render(params, coords, feats):
            return pn.render(params, coords, feats, extr, intr,
                             resolution=res)["channels"]

        dt = device_time(f"render_i{n_inst}", render,
                         (params, coords, feats), iters=3)
        rps = g * vb * rays / dt
        results[n_inst] = (dt, rps)
        print(f"I={n_inst:4d}: {dt*1e3:9.2f} ms/call  "
              f"{dt*1e3/(g*vb):7.2f} ms/view  {rps/1e3:8.1f}k rays/s",
              flush=True)

    # per-op breakdown at the largest shape
    n_inst = max(int(s) for s in args.shapes.split(","))
    g, vb = 1, n_inst
    coords, feats, extr, intr = make_scene(args, num_points, g, vb)

    @jax.jit
    def render(params, coords, feats):
        return pn.render(params, coords, feats, extr, intr,
                         resolution=res)["channels"]

    out = render(params, coords, feats)
    out.block_until_ready()
    tracedir = tempfile.mkdtemp(prefix="render_prof_")
    jax.profiler.start_trace(tracedir)
    for _ in range(3):
        out = render(params, coords, feats)
    out.block_until_ready()
    jax.profiler.stop_trace()
    pb = glob.glob(os.path.join(tracedir, "**/*.xplane.pb"), recursive=True)
    if pb:
        os.system(
            f"python {os.path.dirname(os.path.abspath(__file__))}"
            f"/xplane_summary.py {pb[0]} {args.topn} 3")


if __name__ == "__main__":
    main()
