"""Fused kNN Pallas kernel.

TPU-native replacement for the reference's torch_knnquery CUDA voxel-grid
query (SURVEY.md §2.9): for each query sample, the k nearest of the object's
P neural points within an absolute radius. The voxel occupancy pre-filter
lives upstream (npcd_tpu/ops/knn.py VoxelOccupancy); this kernel fuses the
distance computation and top-k so that

  * the [N, P] squared-distance matrix never round-trips through HBM
    (the XLA path materializes it and runs a sort-based top_k), and
  * the top-k is k iterations of a VPU min-reduction instead of a sort.

Layout: grid over query blocks; the point cloud (P <= a few thousand) lives
in VMEM for every program. Distances via one MXU matmul on coordinate
blocks padded to the 128-lane tile.

Tie-breaking matches lax.top_k: equal distances resolve to the lower point
index, and outputs are ordered by ascending distance.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANE = 128


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _knn_kernel(x_ref, p_ref, idx_ref, d2_ref, *, k: int, num_points: int):
    x = x_ref[...]  # [BLK, 8]  (3 coords zero-padded to 8)
    pts = p_ref[...]  # [P_pad, 8]

    x2 = jnp.sum(x * x, axis=-1, keepdims=True)  # [BLK, 1]
    p2 = jnp.sum(pts * pts, axis=-1)  # [P_pad]
    xp = jax.lax.dot_general(
        x, pts,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [BLK, P_pad]
    d2 = x2 - 2.0 * xp + p2[None, :]

    col = jax.lax.broadcasted_iota(jnp.int32, d2.shape, 1)

    # Packed-key top-k: d2 >= 0 so its f32 bit pattern is order-preserving
    # as int32; steal the low index_bits of the mantissa for the point
    # index. One min-reduce per round then yields the nearest point with
    # lowest-index tie-breaking (exact ties compare on the index bits),
    # halving the VPU passes vs a min+argmin formulation. Distances lose
    # index_bits of mantissa (~2^-14 relative) - far below the f32 noise of
    # the distance computation itself.
    index_bits = max((num_points - 1).bit_length(), 1)
    mask_idx = (1 << index_bits) - 1
    d2 = jnp.maximum(d2, 0.0)  # bit-order trick needs non-negative floats
    key = jax.lax.bitcast_convert_type(d2, jnp.int32)
    key = jnp.where(col < num_points, (key & ~mask_idx) | col, jnp.int32(0x7F7FFFFF))

    for j in range(k):
        m = jnp.min(key, axis=-1, keepdims=True)  # [BLK, 1]
        arg = m[:, 0] & mask_idx
        idx_ref[:, j] = arg
        d2_ref[:, j] = jax.lax.bitcast_convert_type(m[:, 0] & ~mask_idx, jnp.float32)
        key = jnp.where(key == m, jnp.int32(0x7F7FFFFF), key)


def _min_d2_kernel(x_ref, p_ref, out_ref, *, num_points: int):
    x = x_ref[0]  # [BLK, 8]
    pts = p_ref[0]  # [P_pad, 8]
    x2 = jnp.sum(x * x, axis=-1, keepdims=True)
    p2 = jnp.sum(pts * pts, axis=-1)
    xp = jax.lax.dot_general(
        x, pts,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    d2 = x2 - 2.0 * xp + p2[None, :]
    col = jax.lax.broadcasted_iota(jnp.int32, d2.shape, 1)
    d2 = jnp.where(col < num_points, d2, jnp.inf)
    m = jnp.min(d2, axis=-1)  # [BLK]
    # lane-compact output: BLK mins land as an [BLK/128, 128] tile
    out_ref[0, 0] = m.reshape(out_ref.shape[-2:])


@jax.jit
def pallas_min_d2(x: jnp.ndarray, points: jnp.ndarray) -> jnp.ndarray:
    """x: [B, N, 3] queries, points: [B, P, 3] -> min squared distance
    [B, N] f32, natively batched (the per-batch point cloud is selected by
    the grid index map — no vmap, whose squeezed batch dim would make the
    lane-compact output block illegal).

    The k=1 validity special case of pallas_knn with no index bookkeeping
    and a lane-compact output: pallas_knn's (idx, d2) outputs are padded to
    128 lanes, so using it for the sample-validity test wrote (and re-read)
    ~12 GB/step of 94%-padding at the SRN stage-1 config."""
    b, n, _ = x.shape
    p = points.shape[1]
    blk = 1024
    n_pad = _round_up(n, blk)
    p_pad = _round_up(p, _LANE)
    rows = blk // _LANE  # output tile rows per program
    # jnp.pad, not zeros().at[].set(): the scatter form cost 8.9 ms/step on
    # the 400x14k-query stage-1 validity pass; pad lowers to cheap pad ops
    xp8 = jnp.pad(x.astype(jnp.float32), ((0, 0), (0, n_pad - n), (0, 5)))
    pp8 = jnp.pad(points.astype(jnp.float32), ((0, 0), (0, p_pad - p), (0, 5)))
    out = pl.pallas_call(
        functools.partial(_min_d2_kernel, num_points=p),
        out_shape=jax.ShapeDtypeStruct((b, n_pad // blk, rows, _LANE), jnp.float32),
        grid=(b, n_pad // blk),
        in_specs=[
            pl.BlockSpec((1, blk, 8), lambda b_, i: (b_, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, p_pad, 8), lambda b_, i: (b_, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, rows, _LANE), lambda b_, i: (b_, i, 0, 0),
                               memory_space=pltpu.VMEM),
    )(xp8, pp8)
    return out.reshape(b, n_pad)[:, :n]


@functools.partial(jax.jit, static_argnums=(2,))
def pallas_knn(x: jnp.ndarray, points: jnp.ndarray, k: int):
    """x: [N, 3] queries, points: [P, 3] -> (idx [N, k] int32, d2 [N, k]).

    Returns squared distances; radius masking is applied by the caller.
    """
    n, _ = x.shape
    p = points.shape[0]
    blk = 512
    n_pad = _round_up(n, blk)
    p_pad = _round_up(p, _LANE)

    xp8 = jnp.pad(x.astype(jnp.float32), ((0, n_pad - n), (0, 5)))
    pp8 = jnp.pad(points.astype(jnp.float32), ((0, p_pad - p), (0, 5)))

    k_pad = _round_up(k, _LANE)  # output lane alignment; trimmed below

    idx, d2 = pl.pallas_call(
        functools.partial(_knn_kernel, k=k, num_points=p),
        out_shape=(
            jax.ShapeDtypeStruct((n_pad, k_pad), jnp.int32),
            jax.ShapeDtypeStruct((n_pad, k_pad), jnp.float32),
        ),
        grid=(n_pad // blk,),
        in_specs=[
            pl.BlockSpec((blk, 8), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((p_pad, 8), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((blk, k_pad), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((blk, k_pad), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ),
    )(xp8, pp8)
    return idx[:n, :k], d2[:n, :k]
