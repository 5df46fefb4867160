"""Dense masked kNN aggregation — the PointNeRF inner loop.

TPU-native rebuild of the reference aggregator
(npcd/models/pointnerf/fields/aggregators/{aggregator,mlp}.py). The
reference compacts ragged valid samples with masked_select and scatters with
index_add_; here everything is fixed-shape:

  * compact_valid_samples keeps the first `max_shading_pts` valid depth
    samples per ray via a stable argsort on the validity mask (the dense
    equivalent of the CUDA kernel's "first M in-occupied-voxel samples").
  * aggregate_features runs kNN (one MXU matmul per object), gathers
    neighbor positions/features densely, weights by normalized inverse
    distance, and contracts the per-pair MLP output with a masked einsum —
    the fixed-shape equivalent of the reference's index_add_ scatter
    (aggregators/mlp.py:102-125).

Gradient semantics match the reference: neighbor positions are detached
(detach_points=True, aggregators/mlp.py:58-59), so gradients flow through
neighbor features only.
"""
from __future__ import annotations

import functools
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ...ops.knn import dense_knn, dense_knn_batched
from ...utils.config import AggregatorOptions
from .nn_core import apply_mlp, positional_encoding


def compact_valid_samples(
    valid: jnp.ndarray, depths: jnp.ndarray, max_shading_pts: int
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Pack the first `max_shading_pts` valid samples of each ray to the
    front, preserving depth order.

    Args:
      valid:  [..., S] bool per depth sample.
      depths: [..., S] float sample depths (sorted ascending along S).
    Returns:
      depths_c: [..., M] compacted depths (garbage where mask is False).
      mask:     [..., M] bool, a prefix mask per ray.
    """
    m = max_shading_pts
    csum = jnp.cumsum(valid.astype(jnp.int32), axis=-1)
    keep = valid & (csum <= m)
    # One-hot matmul compaction: kept sample s lands in slot csum[s]-1.
    # An MXU contraction beats the stable-argsort formulation ~4x on TPU
    # (sorting is expensive, [S]x[S, M] matmuls are not).
    pos = jnp.where(keep, csum - 1, m)  # dropped samples -> overflow slot m
    onehot = jax.nn.one_hot(pos, m, dtype=depths.dtype)  # [..., S, M]
    depths_c = jnp.einsum("...s,...sm->...m", depths, onehot)
    mask = jnp.einsum("...s,...sm->...m", keep.astype(depths.dtype), onehot) > 0
    return depths_c, mask


@jax.custom_vjp
def gather_rows(table: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """table [B, P, C], idx [B, ..., ] int -> [B, ..., C] via one-hot MXU
    matmul. Backward saves only the indices and recomputes the one-hot, so
    no [.., P] tensor is ever kept as a residual; dtable is again a matmul
    (the dense analogue of index_add_)."""
    onehot = jax.nn.one_hot(idx, table.shape[1], dtype=table.dtype)
    return jnp.einsum("b...p,bpc->b...c", onehot, table)


def _gather_rows_fwd(table, idx):
    # token carries P and the dtype through the residuals (residuals must
    # be jax types)
    token = jnp.zeros((table.shape[1], 0), table.dtype)
    return gather_rows(table, idx), (idx, token)


def _gather_rows_bwd(res, g):
    idx, token = res
    onehot = jax.nn.one_hot(idx, token.shape[0], dtype=token.dtype)
    dtable = jnp.einsum("b...p,b...c->bpc", onehot, g.astype(token.dtype))
    return dtable, None


gather_rows.defvjp(_gather_rows_fwd, _gather_rows_bwd)


@jax.custom_vjp
def gather_cols(table_t: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Transposed gather: table_t [B, C, P], idx [B, M] int -> [B, C, M].

    The column analogue of gather_rows for the compact channels-on-sublanes
    layout consumed by the posenc-fused aggregation kernel: the output's
    minor dim is M (dense in HBM), where a row-major [B, M, C<128] gather
    output tiles its minor dim to 128 lanes (4-16x physical inflation).
    Same one-hot-MXU formulation, same s32-only residuals."""
    onehot = jax.nn.one_hot(idx, table_t.shape[-1], dtype=table_t.dtype)
    return jnp.einsum("bcp,bmp->bcm", table_t, onehot)


def _gather_cols_fwd(table_t, idx):
    token = jnp.zeros((table_t.shape[-1], 0), table_t.dtype)
    return gather_cols(table_t, idx), (idx, token)


def _gather_cols_bwd(res, g):
    idx, token = res
    onehot = jax.nn.one_hot(idx, token.shape[0], dtype=token.dtype)
    dtable_t = jnp.einsum("bcm,bmp->bcp", g.astype(token.dtype), onehot)
    return dtable_t, None


gather_cols.defvjp(_gather_cols_fwd, _gather_cols_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def pack_rows(table: jnp.ndarray, rank: jnp.ndarray, cap: int) -> jnp.ndarray:
    """Scatter rows to their target positions: out[b, rank[b, n]] =
    table[b, n] for rank[b, n] < cap (one-hot MXU matmul; ranks >= cap
    produce all-zero one-hot rows, i.e. those table rows are dropped).

    The inverse of gather_rows(out, rank): packs a dense slot table to a
    fixed budget using the DESTINATION index per source row, so no source
    index list (and no argsort producing one) is ever needed. Same
    s32-only-residual backward as gather_rows — dtable is the expand
    gather."""
    onehot = jax.nn.one_hot(rank, cap, dtype=table.dtype)  # [B, N, cap]
    return jnp.einsum("bnp,bnc->bpc", onehot, table)


def _pack_rows_fwd(table, rank, cap):
    token = jnp.zeros((0,), table.dtype)
    return pack_rows(table, rank, cap), (rank, token)


def _pack_rows_bwd(cap, res, g):
    rank, token = res
    onehot = jax.nn.one_hot(rank, cap, dtype=token.dtype)
    dtable = jnp.einsum("bnp,bpc->bnc", onehot, g.astype(token.dtype))
    return dtable, None


pack_rows.defvjp(_pack_rows_fwd, _pack_rows_bwd)


def knn_neighbors(
    shading_pts: jnp.ndarray,
    pts_mask: jnp.ndarray,
    kp_pos: jnp.ndarray,
    k: int,
    radius: float,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """kNN indices + in-radius mask for each shading point.

    Separated from aggregate_features so the training path can run it once
    outside the rematerialized chunk (the indices are a small s32 tensor;
    recomputing the kNN kernel in the backward pass is pure waste)."""
    idx, nb_mask = dense_knn_batched(
        shading_pts, jax.lax.stop_gradient(kp_pos), k, radius
    )  # [B, N, k] each
    return idx, nb_mask & pts_mask[..., None]


def aggregate_features(
    params: Dict[str, Any],
    opts: AggregatorOptions,
    radius: float,
    shading_pts: jnp.ndarray,
    pts_mask: jnp.ndarray,
    kp_pos: jnp.ndarray,
    kp_feat: jnp.ndarray,
    compute_dtype: Any = jnp.float32,
    neighbors: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None,
    return_weights: bool = False,
    impl: str = "auto",
    diff_pts: bool = False,
):
    """Per-shading-point aggregated features.

    Args:
      params:      {'local_field': mlp params} (see pointnerf.init_params).
      shading_pts: [B, N, 3] compacted sample positions.
      pts_mask:    [B, N] validity of each shading point.
      kp_pos:      [B, P, 3] neural point coords.
      kp_feat:     [B, P, F] neural point features.
      neighbors:   optional precomputed (idx, nb_mask) from knn_neighbors.
      return_weights: additionally return the per-pair aggregation weights
        and neighbor indices (the dense analogue of the reference's sparse
        agg_res {"weights", "shading_idx", "kp_idx"} triple,
        fields/field.py:148-149) for the kp_weights compositing diagnostic.
    Returns:
      feat:     [B, N, out_dim] aggregated features (zeros where invalid).
      valid_pt: [B, N] final validity (had >= 1 neighbor within radius).
      (if return_weights) w:   [B, N, k] normalized inv-dist weights
                               (zeros at masked pairs).
      (if return_weights) idx: [B, N, k] keypoint index of each pair.

    Gradient contract: the inverse-distance aggregation weights are
    NON-DIFFERENTIABLE in every impl (explicit stop_gradient in the XLA
    and fused paths; need_dw=False in the wsum kernel), and by default
    (diff_pts=False) so is x_rel — the shading-point cotangent through
    this function is structurally zero (need_dp=False lets the wsum
    kernel skip its dpos output + posenc derivative chain). This matches
    the reference exactly today — kp_pos is detached (detach_points=True,
    aggregators/mlp.py:58-59) and shading_pts derives from cameras/depths
    with no trainable ancestors (the coords table is frozen, reference
    pointnerf.py:22-24). Pass diff_pts=True to restore the reference's
    full autodiff through shading points (posenc/MLP-input path live, w
    still dead) in every impl — trainable shading points need that
    deliberate flag, not a silent per-path divergence;
    tests/test_fused_mlp.py::test_agg_weight_cotangent_dead pins both
    contracts.
    """
    kp_pos = jax.lax.stop_gradient(kp_pos)  # detach_points=True

    if neighbors is None:
        neighbors = knn_neighbors(shading_pts, pts_mask, kp_pos, opts.k, radius)
    idx, nb_mask = neighbors  # [B, N, k] each

    if impl == "auto":
        # f32 is allowed too: the kernel's layer math is f32-MXU-accumulate
        # in both dtypes, and the win is HBM traffic, not precision-specific
        # (eval render A/B on v5e, f32 end-to-end: 176k -> 370k rays/s with
        # output sums identical to the XLA path at the bench geometry)
        rows = shading_pts.shape[0] * shading_pts.shape[1] * opts.k
        impl = (
            "posenc_fused"
            if (
                jax.default_backend() == "tpu"
                and opts.activation == "leaky_relu"
                and compute_dtype in (jnp.bfloat16, jnp.float32)
                and kp_feat.shape[-1] % 8 == 0
                and rows >= 4096
            )
            else "xla"
        )
    if impl == "posenc_fused":
        return _aggregate_posenc_fused(
            params, opts, shading_pts, pts_mask, kp_pos, kp_feat,
            compute_dtype, idx, nb_mask, return_weights, diff_pts)

    # Neighbor gather as one-hot MXU matmuls: row-gathers of 3/F-wide rows
    # run on the scalar core at ~60 cycles/row (measured 350 ms/step at the
    # SRN config); XLA streams the iota-compare one-hot into the matmul, so
    # this is pure MXU work and the feature-gather *backward* becomes a
    # matmul as well (instead of a segment-sum scatter). gather_rows is a
    # custom_vjp so only the s32 indices are saved for the backward — a
    # saved one-hot would be [B, N, k, P] (~18 GB/step at the SRN config).
    nb_pos = gather_rows(kp_pos, idx)  # [B, N, k, 3] f32: feeds dist/weights
    nb_feat = gather_rows(
        kp_feat.astype(compute_dtype), idx
    ).astype(kp_feat.dtype)  # [B, N, k, F]

    x_rel = shading_pts[:, :, None, :] - nb_pos  # [B, N, k, 3]
    if not diff_pts:
        # default contract: x_rel non-differentiable in every impl (see
        # docstring; kp_pos detached, shading points camera/depth-derived)
        x_rel = jax.lax.stop_gradient(x_rel)
    dist = jnp.linalg.norm(x_rel, axis=-1)
    w = (1.0 / (dist + 1e-5)) * nb_mask.astype(dist.dtype)  # [B, N, k]
    w_sum = jnp.sum(w, axis=-1, keepdims=True)
    w = jnp.where(w_sum > 0, w / w_sum, 0.0)
    # Contract: the inverse-distance weights are non-differentiable in
    # EVERY impl (see the module-level note in aggregate_features' docstring)
    w = jax.lax.stop_gradient(w)

    x_enc = positional_encoding(x_rel, opts.n_freqs, opts.freq_mult, method=opts.posenc_method)
    field_in = jnp.concatenate([nb_feat, x_enc], axis=-1)  # [B, N, k, F + enc]
    # Flatten the (N, k) pair dims before the MLP: the 4D tensor's einsum
    # layout makes XLA run the [*, 256]x[256, 256] matmuls ~10x below peak;
    # a flat [B, N*k, C] view restores clean MXU tiling.
    b_dim, n_dim, k_dim = field_in.shape[:3]
    local_feat = apply_mlp(
        params["local_field"],
        field_in.reshape(b_dim, n_dim * k_dim, -1),
        act=opts.activation,
        compute_dtype=compute_dtype,
    ).reshape(b_dim, n_dim, k_dim, -1)  # [B, N, k, out_dim]

    feat = jnp.einsum(
        "bnk,bnkc->bnc", w.astype(local_feat.dtype), local_feat
    )
    valid_pt = pts_mask & jnp.any(nb_mask, axis=-1)
    if return_weights:
        return feat, valid_pt, w, idx
    return feat, valid_pt


def _aggregate_posenc_fused(
    params, opts, shading_pts, pts_mask, kp_pos, kp_feat,
    compute_dtype, idx, nb_mask, return_weights, diff_pts=False,
):
    """TPU production path of aggregate_features: transposed gathers feed
    the posenc-fused MLP kernel (ops/pallas/fused_mlp.py fused_mlp_posenc).

    Same math as the XLA path — gathers are one-hot MXU matmuls, x_rel and
    the distance weights are f32, enc is computed from f32 x_rel — but the
    concat([feat, x_rel, posenc]) layer-1 input and the sin/cos octaves
    never touch HBM (r03b trace: 8.3 ms pad+concat + 5.8 ms posenc +
    ~6 ms x_rel assembly per step at the SRN geometry), and every
    intermediate travels channels-on-sublanes so nothing tiles a <128
    minor dim to 128 lanes."""
    from ...ops.pallas.fused_mlp import (
        fused_mlp_posenc, fused_mlp_posenc_wsum, wsum_supported)

    # Explicit impl="posenc_fused" bypasses the auto-gate, so re-check the
    # kernel's hard preconditions here: the kernel hardcodes leaky_relu
    # (fused_mlp._act) and requires lane-aligned feature width.
    if opts.activation != "leaky_relu":
        raise ValueError(
            f"posenc_fused kernel hardcodes leaky_relu; got activation="
            f"{opts.activation!r} (use impl='xla')")
    if kp_feat.shape[-1] % 8 != 0:
        raise ValueError(
            f"posenc_fused kernel needs feat_dim % 8 == 0; got "
            f"{kp_feat.shape[-1]} (use impl='xla')")

    b_dim, n_dim, k_dim = idx.shape
    m_flat = n_dim * k_dim
    idx_flat = idx.reshape(b_dim, m_flat)

    kp_pos_t = jnp.swapaxes(kp_pos, 1, 2)  # [B, 3, P] (already detached)
    kp_feat_t = jnp.swapaxes(kp_feat.astype(compute_dtype), 1, 2)  # [B, F, P]
    nb_pos_t = gather_cols(kp_pos_t, idx_flat)  # [B, 3, M] f32
    feat_t = gather_cols(kp_feat_t, idx_flat)  # [B, F, M]

    x_t = jnp.swapaxes(shading_pts, 1, 2)  # [B, 3, N]
    x_rel_t = (x_t[:, :, :, None] - nb_pos_t.reshape(b_dim, 3, n_dim, k_dim)
               ).reshape(b_dim, 3, m_flat)  # [B, 3, M] f32
    if not diff_pts:
        # default contract: x_rel non-differentiable in every impl (see
        # aggregate_features' docstring) — kp_pos is detached above and
        # shading points derive from cameras/depths with no trainable
        # ancestors, so its cotangent is structurally dead; making that
        # explicit lets the wsum kernel skip the dpos output + posenc
        # derivative chain (need_dp below) without per-path divergence.
        x_rel_t = jax.lax.stop_gradient(x_rel_t)

    dist = jnp.sqrt(jnp.sum(x_rel_t * x_rel_t, axis=1)
                    ).reshape(b_dim, n_dim, k_dim)
    w = (1.0 / (dist + 1e-5)) * nb_mask.astype(dist.dtype)
    w_sum = jnp.sum(w, axis=-1, keepdims=True)
    w = jnp.where(w_sum > 0, w / w_sum, 0.0)
    # see aggregate_features' gradient contract: w is non-differentiable
    # in every impl, matching the wsum kernel's need_dw=False
    w = jax.lax.stop_gradient(w)

    weights = tuple(
        (l["w"].astype(compute_dtype), l["b"].astype(compute_dtype))
        for l in params["local_field"]
    )
    if wsum_supported(m_flat, k_dim):
        # w rides pos row 3 and the k-neighbor weighted reduction happens
        # inside the kernel (output [B, N, out] instead of [B, N*k, out]):
        # /k output+cotangent HBM traffic, and the einsum below disappears
        pos_t = jnp.concatenate(
            [x_rel_t, w.reshape(b_dim, 1, m_flat),
             jnp.zeros((b_dim, 4, m_flat), x_rel_t.dtype)], axis=1)
        # need_dw=False: w is stop_gradient'ed above (the uniform gradient
        # contract of aggregate_features — see its docstring), so the w
        # cotangent is structurally zero in every path and skipping the
        # in-kernel dw pass (a measured 3.6 ms/step) cannot diverge from
        # the XLA path.
        feat = fused_mlp_posenc_wsum(
            feat_t, pos_t, weights, k_dim, opts.n_freqs, opts.freq_mult,
            True, opts.posenc_method, need_dw=False, need_dp=diff_pts,
        )  # [B, N, out_dim]
    else:
        pos_t = jnp.pad(x_rel_t, ((0, 0), (0, 5), (0, 0)))  # [B, 8, M]
        local_feat = fused_mlp_posenc(
            feat_t, pos_t, weights, opts.n_freqs, opts.freq_mult,
            True, opts.posenc_method,
        ).reshape(b_dim, n_dim, k_dim, -1)
        feat = jnp.einsum(
            "bnk,bnkc->bnc", w.astype(local_feat.dtype), local_feat)
    valid_pt = pts_mask & jnp.any(nb_mask, axis=-1)
    if return_weights:
        return feat, valid_pt, w, idx
    return feat, valid_pt
