"""Farthest point sampling.

TPU-native replacement for the reference's pytorch3d
``sample_farthest_points`` (used once per object to subsample GT point
clouds to 512; reference npcd/data/srn.py:179-188). O(K*N) lax.fori_loop —
offline preprocessing, perf-uncritical.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnums=(1,))
def farthest_point_sampling(points: jnp.ndarray, k: int, start_idx: int = 0):
    """points: [N, 3] -> (sampled [k, 3], idx [k])."""
    n = points.shape[0]

    def body(i, carry):
        min_d2, idx = carry
        last = points[idx[i - 1]]
        d2 = jnp.sum((points - last) ** 2, axis=-1)
        min_d2 = jnp.minimum(min_d2, d2)
        idx = idx.at[i].set(jnp.argmax(min_d2))
        return min_d2, idx

    idx0 = jnp.zeros((k,), jnp.int32).at[0].set(start_idx)
    min_d2 = jnp.full((n,), jnp.inf, jnp.float32)
    _, idx = jax.lax.fori_loop(1, k, body, (min_d2, idx0))
    return points[idx], idx
