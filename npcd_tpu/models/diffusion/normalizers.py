"""Latent normalization for the diffusion stage.

The reference implements two nn.Modules whose *forward polarity depends on
train/eval mode* (normalize when training, denormalize in eval;
npcd/models/diffusion/diffusion_model.py:40-44,81-85). Here normalization is
an explicit pair of pure functions over an immutable stats pytree — the stats
live in the train state / checkpoint exactly like the reference's buffers.

Two fitting rules (reference diffusion_model.py:21-38,58-79):
  * unit gaussian (used for coords): shift = per-axis mean, scale = global std.
  * minus-one-to-one (used for feats): shift = per-axis midrange,
    scale = global max half-range.
Both record the min/max of the *normalized* data; those bounds are used to
clip x0 predictions during sampling.
"""
from __future__ import annotations

import flax.struct
import jax.numpy as jnp
import numpy as np


@flax.struct.dataclass
class NormalizerStats:
    shift: jnp.ndarray  # [dim]
    scale: jnp.ndarray  # [1] (global scale)
    min: jnp.ndarray    # [1] min of normalized data
    max: jnp.ndarray    # [1] max of normalized data

    @classmethod
    def identity(cls, dim: int) -> "NormalizerStats":
        return cls(
            shift=jnp.zeros((dim,), jnp.float32),
            scale=jnp.ones((1,), jnp.float32),
            min=jnp.full((1,), -jnp.inf, jnp.float32),
            max=jnp.full((1,), jnp.inf, jnp.float32),
        )


def _as_2d(data) -> np.ndarray:
    data = np.asarray(data, dtype=np.float64)
    return data.reshape(data.shape[0], -1)  # [dim, num_data_points]


def fit_unit_gaussian(data) -> NormalizerStats:
    """data: [dim, num_data_points] (or [dim, ...])."""
    data = _as_2d(data)
    shift = data.mean(axis=1)
    # global scale (scale_per_axis=False); ddof=1 matches torch.std's default
    # unbiased estimator used by the reference
    scale = data.std(ddof=1)
    normed = (data - shift[:, None]) / scale
    return NormalizerStats(
        shift=jnp.asarray(shift, jnp.float32),
        scale=jnp.asarray([scale], jnp.float32),
        min=jnp.asarray([normed.min()], jnp.float32),
        max=jnp.asarray([normed.max()], jnp.float32),
    )


def fit_minus_one_to_one(data) -> NormalizerStats:
    """data: [dim, num_data_points] (or [dim, ...])."""
    data = _as_2d(data)
    dmin, dmax = data.min(axis=1), data.max(axis=1)
    shift = (dmin + dmax) / 2.0
    scale = ((dmax - dmin) / 2.0).max()  # global scale
    normed = (data - shift[:, None]) / scale
    return NormalizerStats(
        shift=jnp.asarray(shift, jnp.float32),
        scale=jnp.asarray([scale], jnp.float32),
        min=jnp.asarray([normed.min()], jnp.float32),
        max=jnp.asarray([normed.max()], jnp.float32),
    )


def normalize(stats: NormalizerStats, x: jnp.ndarray) -> jnp.ndarray:
    """x: [N, dim, num_points] -> normalized x."""
    return (x - stats.shift[None, :, None]) / stats.scale[None, :, None]


def denormalize(stats: NormalizerStats, x: jnp.ndarray) -> jnp.ndarray:
    """x: [N, dim, num_points] -> data-space x."""
    return x * stats.scale[None, :, None] + stats.shift[None, :, None]
