"""Fused kNN Pallas kernels (transposed: points on sublanes, queries on lanes).

TPU-native replacement for the reference's torch_knnquery CUDA voxel-grid
query (SURVEY.md §2.9): for each query sample, the k nearest of the object's
P neural points within an absolute radius. The voxel occupancy pre-filter
lives upstream (npcd_tpu/ops/knn.py VoxelOccupancy).

Layout rationale (r03 TPU trace, docs/PERF.md stage-1 section): the first
generation of these kernels put queries on sublanes and points on lanes and
computed distances through an MXU dot over 8 coordinate lanes. At the SRN
stage-1 geometry that design cost 28.8 ms (kNN) + ~35 ms (validity) per
step, for three reasons all fixed here:

  * the depth-3 contraction pads to the MXU's 128-deep pipeline -> 16-40x
    wasted MACs. Distances are now a VPU broadcast-FMA chain
    (pts[p,c] - x[c,n])^2 — one fused pass over the [P, BLK] output, no
    materialized cross-product term;
  * min/top-k reduced across LANES (the expensive cross-lane direction,
    log-shuffle per step). The [P_pad, BLK] layout reduces across SUBLANES
    (plain vreg-row accumulation);
  * [N, k<=8]-minor outputs and [N, 8]-padded query inputs tile to 128
    lanes in HBM (16x physical inflation). Queries now travel as
    [B, 3->8 sublanes, N] (coords on sublanes, compact N-minor) and
    outputs as [B, k8, N].

Tie-breaking matches lax.top_k: equal distances resolve to the lower point
index, and outputs are ordered by ascending distance. Distances are the
numerically-direct sum of squared differences (the old x^2 - 2xp + p^2 dot
form differs by float rounding; ops/knn.py's XLA fallback keeps the dot
form, so cross-impl comparisons can swap near-exact ties).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANE = 128
_MAXKEY = 0x7F7FFFFF  # f32 +max as int32: larger than any packed key


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _pick_blk(n: int, p_pad: int) -> int:
    """Query-lane block size: large for DMA efficiency, capped so the
    [P_pad, BLK] f32 distance/key buffers stay ~<= 8 MB of VMEM."""
    cap = max(128, (8 * 1024 * 1024) // (p_pad * 4 * 2))
    return min(_round_up(n, _LANE), _round_up(min(cap, 2048), _LANE))


def _d2_chain(x, pts_pm, coords: int = 3):
    """Squared distances [P_pad, BLK] from x [8, BLK] (coords on sublanes)
    and pts_pm [P_pad, 8] (points-major): a fused VPU broadcast-FMA chain —
    the depth-`coords` MXU dot runs at coords/128 pipeline utilization, so
    the VPU chain is faster and skips the cross-term materialization."""
    d2 = (pts_pm[:, 0:1] - x[0:1, :]) ** 2
    for c in range(1, coords):
        d2 = d2 + (pts_pm[:, c:c + 1] - x[c:c + 1, :]) ** 2
    return d2


def _min_d2_kernel(x_ref, p_ref, out_ref, *, num_points: int):
    x = x_ref[0]  # [8, BLK]
    pts = p_ref[0]  # [P_pad, 8]
    d2 = _d2_chain(x, pts)
    row = jax.lax.broadcasted_iota(jnp.int32, d2.shape, 0)
    d2 = jnp.where(row < num_points, d2, jnp.inf)
    m = jnp.min(d2, axis=0)  # sublane reduction -> [BLK]
    # lane-compact output tile: [BLK] -> [BLK/128, 128]
    out_ref[0, 0] = m.reshape(out_ref.shape[-2:])


def _knn_kernel(x_ref, p_ref, idx_ref, d2_ref, *, k: int, num_points: int):
    x = x_ref[0]  # [8, BLK]
    pts = p_ref[0]  # [P_pad, 8]
    d2 = _d2_chain(x, pts)

    # Packed-key top-k: d2 >= 0 so its f32 bit pattern is order-preserving
    # as int32; steal the low index_bits of the mantissa for the point
    # index (row), so one min yields the nearest point with lowest-index
    # tie-breaking. Distances lose index_bits of mantissa (~2^-14
    # relative) — far below the f32 noise of the computation itself.
    index_bits = max((num_points - 1).bit_length(), 1)
    mask_idx = (1 << index_bits) - 1
    row = jax.lax.broadcasted_iota(jnp.int32, d2.shape, 0)
    key = jax.lax.bitcast_convert_type(jnp.maximum(d2, 0.0), jnp.int32)
    key = jnp.where(row < num_points, (key & ~mask_idx) | row,
                    jnp.int32(_MAXKEY))

    # k rounds of sublane-min. Keys are unique (index bits), so round j
    # takes the min over keys strictly greater than round j-1's — one
    # fused compare+select+min read pass, no updated-matrix writeback.
    m = jnp.min(key, axis=0, keepdims=True)  # [1, BLK]
    for j in range(k):
        idx_ref[0, j, :] = (m & mask_idx)[0]
        d2_ref[0, j, :] = jax.lax.bitcast_convert_type(
            m & ~mask_idx, jnp.float32)[0]
        if j + 1 < k:
            m = jnp.min(jnp.where(key > m, key, jnp.int32(_MAXKEY)),
                        axis=0, keepdims=True)
    for j in range(k, idx_ref.shape[1]):  # k8 alignment rows
        idx_ref[0, j, :] = jnp.zeros_like(m[0])
        d2_ref[0, j, :] = jnp.full_like(m[0], jnp.inf, jnp.float32)


def _prep(xt: jnp.ndarray, points: jnp.ndarray, blk: int):
    """Pad transposed queries [B, 3, N] -> [B, 8, n_pad] (compact N-minor)
    and points [B, P, 3] -> [B, P_pad, 8]."""
    b, c, n = xt.shape
    p = points.shape[1]
    n_pad = _round_up(n, blk)
    p_pad = _round_up(p, 8)
    xq = jnp.pad(xt.astype(jnp.float32), ((0, 0), (0, 8 - c), (0, n_pad - n)))
    pp = jnp.pad(points.astype(jnp.float32),
                 ((0, 0), (0, p_pad - p), (0, 5)))
    return xq, pp, n_pad, p_pad


@jax.jit
def pallas_min_d2_t(xt: jnp.ndarray, points: jnp.ndarray) -> jnp.ndarray:
    """xt: [B, 3, N] queries (coords on sublanes), points: [B, P, 3] ->
    min squared distance [B, N] f32, natively batched."""
    b, _, n = xt.shape
    p = points.shape[1]
    p_pad8 = _round_up(p, 8)
    blk = _pick_blk(n, p_pad8)
    # The kernel's [BLK] -> [BLK/128, 128] output reshape is a Mosaic
    # shape cast that requires the sublane count BLK/128 to be 1 or a
    # multiple of 8 (measured: 16 rows compiles, 12 rows fails with
    # 'infer-vector-layout: unsupported shape cast'). Round the block up
    # to 8 lane-tiles when the [P_pad, BLK] VMEM buffers allow, else drop
    # to the single-row block.
    if (blk // _LANE) % 8 and blk // _LANE != 1:
        if p_pad8 * 8 * _LANE * 4 * 2 <= 12 * 1024 * 1024:
            blk = _round_up(blk, 8 * _LANE)
        else:
            blk = _LANE
    xq, pp, n_pad, p_pad = _prep(xt, points, blk)
    rows = blk // _LANE
    out = pl.pallas_call(
        functools.partial(_min_d2_kernel, num_points=p),
        out_shape=jax.ShapeDtypeStruct((b, n_pad // blk, rows, _LANE),
                                       jnp.float32),
        grid=(b, n_pad // blk),
        in_specs=[
            pl.BlockSpec((1, 8, blk), lambda b_, i: (b_, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, p_pad, 8), lambda b_, i: (b_, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, rows, _LANE),
                               lambda b_, i: (b_, i, 0, 0),
                               memory_space=pltpu.VMEM),
    )(xq, pp)
    return out.reshape(b, n_pad)[:, :n]


@functools.partial(jax.jit, static_argnums=(2,))
def pallas_knn_t(xt: jnp.ndarray, points: jnp.ndarray, k: int):
    """xt: [B, 3, N] queries (coords on sublanes), points: [B, P, 3] ->
    (idx [B, k, N] int32, d2 [B, k, N] f32), ascending distance, natively
    batched. Radius masking is applied by the caller."""
    b, _, n = xt.shape
    p = points.shape[1]
    blk = _pick_blk(n, _round_up(p, 8))
    xq, pp, n_pad, p_pad = _prep(xt, points, blk)
    k8 = _round_up(k, 8)
    idx, d2 = pl.pallas_call(
        functools.partial(_knn_kernel, k=min(k, p), num_points=p),
        out_shape=(
            jax.ShapeDtypeStruct((b, k8, n_pad), jnp.int32),
            jax.ShapeDtypeStruct((b, k8, n_pad), jnp.float32),
        ),
        grid=(b, n_pad // blk),
        in_specs=[
            pl.BlockSpec((1, 8, blk), lambda b_, i: (b_, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, p_pad, 8), lambda b_, i: (b_, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, k8, blk), lambda b_, i: (b_, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k8, blk), lambda b_, i: (b_, 0, i),
                         memory_space=pltpu.VMEM),
        ),
    )(xq, pp)
    return idx[:, :k, :n], d2[:, :k, :n]


# ---------------------------------------------------------------------------
# Legacy single-object entry points (kept for dense_knn's per-object path
# and the interpret-mode tests; new code should pass transposed queries).


def pallas_min_d2(x: jnp.ndarray, points: jnp.ndarray) -> jnp.ndarray:
    """x: [B, N, 3] queries, points: [B, P, 3] -> min squared distance
    [B, N] f32. Shim over pallas_min_d2_t — prefer building queries in the
    transposed [B, 3, N] layout to skip the [.., 3]-minor HBM round-trip."""
    return pallas_min_d2_t(jnp.swapaxes(x, 1, 2), points)


@functools.partial(jax.jit, static_argnums=(2,))
def pallas_knn(x: jnp.ndarray, points: jnp.ndarray, k: int):
    """x: [N, 3] queries, points: [P, 3] -> (idx [N, k] int32, d2 [N, k]).
    Single-object shim over pallas_knn_t."""
    idx, d2 = pallas_knn_t(x.T[None], points[None], k)
    return idx[0].T, d2[0].T
