"""Ray-box intersection (slab method).

Semantics match the reference's EG3D-derived helper
(npcd/models/pointnerf/renderers/math_utils.py:46-97): intersect rays with
the centered cube of half-size `box_size`; invalid rays get (tmin, tmax) =
(-1, -2) so that downstream `tmax > tmin` identifies validity.
"""
from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp


def get_ray_limits_box(
    rays_o: jnp.ndarray, rays_d: jnp.ndarray, box_size: float = 1.0
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """rays_o/rays_d: [..., 3] -> (tmin [..., 1], tmax [..., 1])."""
    inv_d = 1.0 / rays_d
    # For each axis: entry at the near slab, exit at the far slab.
    t_lo = (-box_size - rays_o) * inv_d
    t_hi = (box_size - rays_o) * inv_d
    t_near = jnp.minimum(t_lo, t_hi)
    t_far = jnp.maximum(t_lo, t_hi)

    tmin = jnp.max(t_near, axis=-1)
    tmax = jnp.min(t_far, axis=-1)
    is_valid = tmax >= tmin

    tmin = jnp.where(is_valid, tmin, -1.0)
    tmax = jnp.where(is_valid, tmax, -2.0)
    return tmin[..., None], tmax[..., None]


def fill_invalid_ray_limits(
    ray_start: jnp.ndarray, ray_end: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Replace limits of rays that miss the box with the global min start /
    max end over valid rays (reference renderer.py:38-43), so every ray gets
    a sane sampling interval."""
    is_valid = ray_end > ray_start
    any_valid = jnp.any(is_valid)
    min_start = jnp.min(jnp.where(is_valid, ray_start, jnp.inf))
    max_end = jnp.max(jnp.where(is_valid, ray_end, -jnp.inf))
    ray_start = jnp.where(is_valid | ~any_valid, ray_start, min_start)
    ray_end = jnp.where(is_valid | ~any_valid, ray_end, max_end)
    return ray_start, ray_end
