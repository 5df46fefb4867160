"""Same-process loss-parity A/B of the aggregation impls inside the REAL
stage-1 train step at the full SRN geometry (the 1e78129 methodology,
extended to three impls): run N identical training steps with

  xla           - one-hot gathers + apply_mlp + external einsum reduction
  posenc_fused  - fused kernel, external einsum reduction
  wsum          - fused kernel with the in-kernel weighted k-reduction
                  (need_dw/need_dp=False; the production auto-dispatch)

and print the per-step losses side by side. All three must agree to MXU
reduction-order noise (~1e-4 relative in bf16) — a per-impl deviation
beyond that is a kernel bug, not noise.

Usage: python tools/ab_losses.py [--steps 5]
"""
import argparse
import os.path as osp
import sys

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

import dataclasses
import functools

import jax
import jax.numpy as jnp


def build(impl: str, steps: int):
    from npcd_tpu.data.synthetic import random_cameras
    from npcd_tpu.losses import PointNeRFLossWeights
    from npcd_tpu.models.pointnerf import PointNeRF, PointNeRFRenderConfig
    from npcd_tpu.models.pointnerf import aggregator as agg_mod
    from npcd_tpu.models.pointnerf import pointnerf as pn_mod
    from npcd_tpu.train.pointnerf_training import (
        PointNeRFTrainState,
        make_pointnerf_optimizer,
        make_pointnerf_train_step,
    )
    from npcd_tpu.utils.config import pointnerf_default_options

    b, v, res, p, n_obj = 8, 50, 128, 512, 2347
    opts = pointnerf_default_options()
    cfg = PointNeRFRenderConfig(
        train_rays=112, train_instance_chunk=400,
        compute_dtype=jnp.bfloat16, shading_budget=1792,
    )
    pn = PointNeRF(n_obj=n_obj, feats_dim=32, num_points=p, opts=opts,
                   render_config=cfg)
    params = pn.init_params(jax.random.PRNGKey(0))
    coords = jax.random.uniform(jax.random.PRNGKey(1), (n_obj, p, 3),
                                minval=-0.4, maxval=0.4)
    params = pn.set_all_coords(params, coords)
    tx = make_pointnerf_optimizer(1e-3)
    state = PointNeRFTrainState(params=params, opt_state=tx.init(params),
                                step=jnp.zeros((), jnp.int32))

    # force the impl through the train step's direct-import call sites
    forced = functools.partial(agg_mod.aggregate_features, impl=impl)
    pn_mod.aggregate_features = forced

    step = make_pointnerf_train_step(pn, tx, PointNeRFLossWeights(1.0, 1e-7, 3.5e-7))

    extr, intr = random_cameras(v, res, seed=0)
    key = jax.random.PRNGKey(7)
    img = jax.random.uniform(key, (b, v, res * res, 3))
    feed = {
        "obj_idx": jnp.arange(b),
        "images": img,
        "intrinsics": jnp.tile(jnp.asarray(intr)[None], (b, 1, 1, 1)),
        "extrinsics": jnp.tile(jnp.asarray(extr)[None], (b, 1, 1, 1)),
    }
    losses = []
    for i in range(steps):
        state, metrics = step(state, feed,
                              jax.random.fold_in(jax.random.PRNGKey(3), i))
        losses.append(float(metrics["loss"]))
    # restore
    pn_mod.aggregate_features = agg_mod.aggregate_features
    return losses


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=5)
    ap.add_argument("--impls", nargs="+",
                    default=["xla", "posenc_fused", "auto"])
    args = ap.parse_args()
    results = {}
    for impl in args.impls:
        results[impl] = build(impl, args.steps)
        print(f"{impl:>14}: " + " ".join(f"{x:.6f}" for x in results[impl]),
              flush=True)
    base = results[args.impls[0]]
    for impl, ls in results.items():
        rel = max(abs(a - b) / max(abs(a), 1e-9) for a, b in zip(base, ls))
        print(f"max rel dev vs {args.impls[0]}: {impl:>14} {rel:.2e}",
              flush=True)


if __name__ == "__main__":
    main()
