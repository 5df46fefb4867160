"""Pinhole camera ray generation.

Rebuild of the reference RaySampler
(npcd/models/pointnerf/renderers/ray_sampler.py): back-project pixel centers
through the intrinsics to camera space, then transform with the inverted
world2cam extrinsics to world-space ray origins/directions.

Pixel convention: ray index = row * resolution + col, pixel centers at
(col + 0.5, row + 0.5).
"""
from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp


def generate_rays(
    extr: jnp.ndarray,
    intr: jnp.ndarray,
    resolution: int,
    pixel_idx: jnp.ndarray | None = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """extr: [N, 4, 4] world2cam, intr: [N, 3, 3] ->
    (origins [N, R, 3], unit-norm dirs [N, R, 3]) with R = res*res, or
    R = len(pixel_idx) when a flat pixel subset is given (training
    presamples ~112 of 16384 pixels — generating only those avoids
    materializing the full ray grid)."""
    n = extr.shape[0]

    fx = intr[:, 0, 0][:, None]
    fy = intr[:, 1, 1][:, None]
    cx = intr[:, 0, 2][:, None]
    cy = intr[:, 1, 2][:, None]
    sk = intr[:, 0, 1][:, None]

    if pixel_idx is None:
        u = jnp.arange(resolution, dtype=jnp.float32) + 0.5
        yy, xx = jnp.meshgrid(u, u, indexing="ij")  # row-major: y slowest
        xs, ys = xx.reshape(-1), yy.reshape(-1)
    else:
        pixel_idx = pixel_idx.astype(jnp.int32)
        ys = (pixel_idx // resolution).astype(jnp.float32) + 0.5
        xs = (pixel_idx % resolution).astype(jnp.float32) + 0.5
    num = xs.shape[0]
    x_cam = jnp.broadcast_to(xs.reshape(1, -1), (n, num))
    y_cam = jnp.broadcast_to(ys.reshape(1, -1), (n, num))
    z_cam = jnp.ones_like(x_cam)

    x_lift = (x_cam - cx + cy * sk / fy - sk * y_cam / fy) / fx * z_cam
    y_lift = (y_cam - cy) / fy * z_cam
    cam_points = jnp.stack([x_lift, y_lift, z_cam], axis=-1)  # [N, M, 3]

    # Invert world2cam: R' = R^T, t' = -R^T t
    rot = extr[:, :3, :3]
    trans = extr[:, :3, 3:]
    rot_c2w = jnp.swapaxes(rot, -1, -2)
    cam_locs = (-rot_c2w @ trans)[..., 0]  # [N, 3]

    world_points = jnp.einsum("nij,nmj->nmi", rot_c2w, cam_points) + cam_locs[:, None, :]
    ray_dirs = world_points - cam_locs[:, None, :]
    ray_dirs = ray_dirs / jnp.linalg.norm(ray_dirs, axis=-1, keepdims=True)
    ray_origins = jnp.broadcast_to(cam_locs[:, None, :], ray_dirs.shape)
    return ray_origins, ray_dirs
