"""Field heads: density and color from aggregated features.

Rebuild of the reference Field/fields.MLP
(npcd/models/pointnerf/fields/{field,mlp}.py): shape head (MLP -> softplus
shifted by -1 for better initialization, field.py:30) and channel head
(MLP -> sigmoid). The SRN-Cars config is view-independent (use_dir=False);
the optional view-direction conditioning concatenates (encoded) ray dirs
before the channel MLP.
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ...utils.config import FieldOptions
from .nn_core import apply_mlp, positional_encoding


def field_heads(
    params: Dict[str, Any],
    opts: FieldOptions,
    feat: jnp.ndarray,
    valid_pt: jnp.ndarray,
    ray_dir: Optional[jnp.ndarray] = None,
    compute_dtype: Any = jnp.float32,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """feat: [..., hid], valid_pt: [...] -> (sigma [...], rgb [..., 3]).

    sigma is zeroed outside valid points (the dense analogue of the
    reference's scatter into a zero tensor, field.py:62-67)."""
    if opts.feat_freqs > 0:
        feat = positional_encoding(feat, opts.feat_freqs)

    shape = apply_mlp(
        params["shape_net"], feat, act=opts.activation, compute_dtype=compute_dtype
    )[..., 0]
    if opts.nerf:
        sigma = jax.nn.softplus(shape.astype(jnp.float32) - 1.0)
    else:
        sigma = shape.astype(jnp.float32)
    sigma = jnp.where(valid_pt, sigma, 0.0)

    channel_in = feat
    if opts.use_dir and ray_dir is not None:
        if opts.dir_freqs > 0:
            ray_dir = positional_encoding(ray_dir, opts.dir_freqs)
        ray_dir = jnp.broadcast_to(
            ray_dir[..., None, :], feat.shape[:-1] + (ray_dir.shape[-1],)
        ) if ray_dir.ndim < feat.ndim else ray_dir
        channel_in = jnp.concatenate([feat, ray_dir.astype(feat.dtype)], axis=-1)

    rgb = apply_mlp(
        params["channel_net"], channel_in, act=opts.activation,
        compute_dtype=compute_dtype,
    )
    rgb = jax.nn.sigmoid(rgb.astype(jnp.float32))
    return sigma, rgb
