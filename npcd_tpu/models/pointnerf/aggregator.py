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

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from ...ops.knn import dense_knn
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


def aggregate_features(
    params: Dict[str, Any],
    opts: AggregatorOptions,
    radius: float,
    shading_pts: jnp.ndarray,
    pts_mask: jnp.ndarray,
    kp_pos: jnp.ndarray,
    kp_feat: jnp.ndarray,
    compute_dtype: Any = jnp.float32,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-shading-point aggregated features.

    Args:
      params:      {'local_field': mlp params} (see pointnerf.init_params).
      shading_pts: [B, N, 3] compacted sample positions.
      pts_mask:    [B, N] validity of each shading point.
      kp_pos:      [B, P, 3] neural point coords.
      kp_feat:     [B, P, F] neural point features.
    Returns:
      feat:     [B, N, out_dim] aggregated features (zeros where invalid).
      valid_pt: [B, N] final validity (had >= 1 neighbor within radius).
    """
    kp_pos = jax.lax.stop_gradient(kp_pos)  # detach_points=True

    idx, nb_mask = jax.vmap(lambda x, p: dense_knn(x, p, opts.k, radius))(
        shading_pts, kp_pos
    )  # [B, N, k], [B, N, k]
    nb_mask = nb_mask & pts_mask[..., None]

    nb_pos = jax.vmap(lambda t, i: t[i])(kp_pos, idx)  # [B, N, k, 3]
    nb_feat = jax.vmap(lambda t, i: t[i])(kp_feat, idx)  # [B, N, k, F]

    x_rel = shading_pts[:, :, None, :] - nb_pos  # [B, N, k, 3]
    dist = jnp.linalg.norm(x_rel, axis=-1)
    w = (1.0 / (dist + 1e-5)) * nb_mask.astype(dist.dtype)  # [B, N, k]
    w_sum = jnp.sum(w, axis=-1, keepdims=True)
    w = jnp.where(w_sum > 0, w / w_sum, 0.0)

    x_enc = positional_encoding(x_rel, opts.n_freqs, opts.freq_mult, method=opts.posenc_method)
    field_in = jnp.concatenate([nb_feat, x_enc], axis=-1)  # [B, N, k, F + enc]
    local_feat = apply_mlp(
        params["local_field"], field_in, act=opts.activation,
        compute_dtype=compute_dtype,
    )  # [B, N, k, out_dim]

    feat = jnp.einsum(
        "bnk,bnkc->bnc", w.astype(local_feat.dtype), local_feat
    )
    valid_pt = pts_mask & jnp.any(nb_mask, axis=-1)
    return feat, valid_pt
