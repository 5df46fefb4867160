#!/usr/bin/env python
"""Qualify the shading-budget fast path for stage-1 training dynamics.

The shading-budget path (PointNeRFRenderConfig.shading_budget, see
models/pointnerf/pointnerf.py) packs the ~26%-valid [ray, depth-sample]
grid into a fixed per-instance budget before the per-pair aggregator MLP —
the measured-fastest training configuration (bench.py, ~4.16 vs ~3.6
steps/s dense on v5e). It is PROVEN exact when the budget covers every
valid sample (tests/test_pointnerf.py); this experiment qualifies the
OVERFLOW regime, where instances with more valid samples than the budget
drop their deepest samples (evenly across rays):

  train the same model from the same init on the same batch/rng schedule
  under (a) the dense exact-parity path, (b) each --budgets value, and
  compare loss trajectories and gradient norms step by step.

Outcome rule (printed + saved as budget_qualify.json): a budget PASSES if
its EMA-smoothed loss stays within --tol (default 5%) of the dense run's
over the whole horizon and the final smoothed losses agree within tol/2.

Run on a TPU (a few minutes per 1000 steps):
  python tools/budget_qualify.py --steps 1500 --budgets 1792,1024
"""
from __future__ import annotations

import argparse
import json
import os.path as osp
import sys
import time

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

import numpy as np


def _run(budget, steps, record_every, batch_size, n_obj, views, seed,
         geom=None):
    import dataclasses

    import jax
    import jax.numpy as jnp

    from npcd_tpu.data import create_dataset
    from npcd_tpu.losses import PointNeRFLossWeights
    from npcd_tpu.models.pointnerf import PointNeRF, PointNeRFRenderConfig
    from npcd_tpu.train.pointnerf_training import (
        PointNeRFTrainState,
        make_pointnerf_optimizer,
        make_pointnerf_train_step,
    )
    from npcd_tpu.utils.config import pointnerf_default_options

    # geom: optional (rays, depth, max_shading, image_size) downscale for
    # CPU feasibility — the overflow *dynamics* question is geometry-scaled
    # (budget below the valid-sample count), the default is the production
    # geometry (112, 128, 50, 128).
    rays, depth, max_shading, image_size = geom or (112, 128, 50, 128)
    ds = create_dataset(
        "SyntheticNPCTrain", n_obj=n_obj, num_views=views,
        image_size=image_size, num_points=512, seed=seed,
    )
    opts = pointnerf_default_options()  # reference geometry: 512 pts, 112
    # rays, 128 depth samples, max_shading_pts 50
    opts = dataclasses.replace(
        opts,
        renderer=dataclasses.replace(
            opts.renderer, depth_resolution=depth, ray_subsamples=rays),
        aggregator=dataclasses.replace(
            opts.aggregator, max_shading_pts=max_shading),
        default_resolution=image_size,
    )
    cfg = PointNeRFRenderConfig(
        train_rays=rays,
        train_instance_chunk=batch_size * views,
        compute_dtype=jnp.bfloat16,
        shading_budget=budget,
    )
    pn = PointNeRF(n_obj=n_obj, feats_dim=32, num_points=512, opts=opts,
                   render_config=cfg)
    params = pn.init_params(jax.random.PRNGKey(seed))
    params = pn.set_all_coords(params, jnp.asarray(ds.get_all_coords()))
    tx = make_pointnerf_optimizer(1e-3)
    state = PointNeRFTrainState(
        params=params, opt_state=tx.init(params), step=jnp.zeros((), jnp.int32)
    )
    step = make_pointnerf_train_step(
        pn, tx, PointNeRFLossWeights(1.0, 1e-7, 3.5e-7)
    )

    # deterministic batch schedule shared by every run
    order_rng = np.random.default_rng(seed + 1)
    extr = jnp.asarray(ds.samples[0]["extrinsics"])  # shared cameras
    intr = jnp.asarray(ds.samples[0]["intrinsics"])
    all_images = jnp.asarray(
        np.stack([s["images"] for s in ds.samples])
    )  # [n_obj, V, H*W, 3]

    trace = []
    t0 = time.perf_counter()
    for it in range(steps):
        idx = order_rng.choice(n_obj, batch_size, replace=False)
        batch = {
            "obj_idx": jnp.asarray(idx),
            "images": all_images[jnp.asarray(idx)],
            "intrinsics": jnp.tile(intr[None], (batch_size, 1, 1, 1)),
            "extrinsics": jnp.tile(extr[None], (batch_size, 1, 1, 1)),
        }
        state, metrics = step(
            state, batch, jax.random.fold_in(jax.random.PRNGKey(seed + 2), it)
        )
        if it % record_every == 0 or it == steps - 1:
            trace.append(
                {"it": it, **{k: float(v) for k, v in metrics.items()}}
            )
    rate = steps / (time.perf_counter() - t0)
    return trace, rate


def _ema(xs, alpha=0.05):
    out, m = [], xs[0]
    for x in xs:
        m = (1 - alpha) * m + alpha * x
        out.append(m)
    return np.asarray(out)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=1500)
    p.add_argument("--record-every", type=int, default=10)
    p.add_argument("--budgets", default="1792,1024")
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--n-obj", type=int, default=32)
    p.add_argument("--views", type=int, default=50)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--tol", type=float, default=0.05)
    p.add_argument("--out", default="runs/budget_qualify")
    p.add_argument("--geom", default=None,
                   help="rays,depth,max_shading,image_size downscale for "
                        "CPU runs (default: production 112,128,50,128)")
    p.add_argument("--platform", default=None, choices=["cpu", "tpu"],
                   help="force a jax backend in-process (the axon plugin "
                        "ignores the JAX_PLATFORMS env var)")
    args = p.parse_args(argv)
    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)
    geom = (tuple(int(x) for x in args.geom.split(","))
            if args.geom else None)

    import os

    os.makedirs(args.out, exist_ok=True)
    budgets = [int(b) for b in args.budgets.split(",") if b]

    runs = {}
    dense_trace, dense_rate = _run(
        None, args.steps, args.record_every, args.batch_size, args.n_obj,
        args.views, args.seed, geom,
    )
    runs["dense"] = {"trace": dense_trace, "steps_per_sec": round(dense_rate, 3)}
    print(f"dense: {dense_rate:.3f} steps/s", file=sys.stderr)

    dense_loss = _ema([t["loss"] for t in dense_trace])
    verdicts = {}
    for b in budgets:
        trace, rate = _run(
            b, args.steps, args.record_every, args.batch_size, args.n_obj,
            args.views, args.seed, geom,
        )
        runs[f"budget_{b}"] = {"trace": trace, "steps_per_sec": round(rate, 3)}
        loss = _ema([t["loss"] for t in trace])
        rel = np.abs(loss - dense_loss) / np.maximum(np.abs(dense_loss), 1e-8)
        verdicts[str(b)] = {
            "max_rel_dev": round(float(rel.max()), 4),
            "final_rel_dev": round(float(rel[-1]), 4),
            "speedup_vs_dense": round(rate / dense_rate, 3),
            "pass": bool(rel.max() <= args.tol and rel[-1] <= args.tol / 2),
        }
        print(f"budget {b}: {rate:.3f} steps/s, max_rel_dev "
              f"{rel.max():.4f}, final {rel[-1]:.4f} -> "
              f"{'PASS' if verdicts[str(b)]['pass'] else 'FAIL'}",
              file=sys.stderr)

    result = {"steps": args.steps, "geom": geom, "verdicts": verdicts,
              "dense_steps_per_sec": runs["dense"]["steps_per_sec"]}
    with open(osp.join(args.out, "budget_qualify.json"), "w") as f:
        json.dump({**result, "runs": runs}, f)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
