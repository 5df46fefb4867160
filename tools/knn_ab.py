"""Measure the stage-1 kNN/validity kernels on the real TPU.

History: the first-generation kernels (queries on sublanes, points on
lanes, MXU depth-8 distance dot) cost 34.2 ms (kNN) / 37.2 ms (validity)
at this geometry; the transposed VPU-chain redesign in
npcd_tpu/ops/pallas/knn.py brought them to ~5 / ~7 ms (see docs/PERF.md).
This tool times the production paths:

  knn_prod_t:      dense_knn_batched (transposed kernel + [B, N, k] contract)
  knn_t_native:    pallas_knn_t on already-transposed queries
  min_d2_t_native: within_radius_t on samples assembled in [I, 3, N] layout

Run from the repo root: python tools/knn_ab.py
"""
import functools
import os.path as osp
import sys

REPO = osp.dirname(osp.dirname(osp.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, osp.join(REPO, "tools"))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tputime import device_time
from npcd_tpu.ops.pallas import knn as prod

I, R, S, P, K = 400, 112, 128, 512, 8
CAP = 1792  # shading budget (queries for the kNN), padded to 2048 by blk


def main():
    print(f"backend={jax.default_backend()} device={jax.devices()[0]}")
    key = jax.random.PRNGKey(0)
    xq = jax.random.normal(key, (I, CAP, 3), jnp.float32)
    pts = jax.random.normal(jax.random.PRNGKey(1), (I, P, 3), jnp.float32)

    # production batched path (transposed kernel + legacy [B, N, k] contract)
    from npcd_tpu.ops.knn import dense_knn_batched, within_radius_t

    def knn(x, p):
        return dense_knn_batched(x, p, K, 0.5, impl="pallas")

    jax.jit(knn)(xq, pts)
    dt = device_time("knn_prod", knn, (xq, pts), iters=10)
    print(f"{'knn_prod_t':18s} {dt*1e3:8.2f} ms/call", flush=True)

    # native transposed queries (what knn_neighbors pays minus one transpose)
    def knn_t(xt, p):
        return prod.pallas_knn_t(xt, p, K)

    xt = jnp.swapaxes(xq, 1, 2)
    jax.jit(knn_t)(xt, pts)
    dt = device_time("knn_t", knn_t, (xt, pts), iters=10)
    print(f"{'knn_t_native':18s} {dt*1e3:8.2f} ms/call", flush=True)

    # validity over all I*R*S samples, assembled in the transposed layout
    ro = jax.random.normal(jax.random.PRNGKey(2), (I, R, 3), jnp.float32)
    rd = jax.random.normal(jax.random.PRNGKey(3), (I, R, 3), jnp.float32)
    dep = jax.random.uniform(jax.random.PRNGKey(4), (I, R, S), jnp.float32)

    def md2(ro, rd, dep, pts):
        xt = (jnp.swapaxes(ro, 1, 2)[:, :, :, None]
              + dep[:, None] * jnp.swapaxes(rd, 1, 2)[:, :, :, None])
        return within_radius_t(xt.reshape(I, 3, R * S), pts, 0.2,
                               impl="pallas")

    jax.jit(md2)(ro, rd, dep, pts)
    dt = device_time("min_d2_t", md2, (ro, rd, dep, pts), iters=10)
    print(f"{'min_d2_t_native':18s} {dt*1e3:8.2f} ms/call", flush=True)


if __name__ == "__main__":
    main()
