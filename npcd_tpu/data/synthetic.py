"""Synthetic datasets for tests and benchmarks.

No reference equivalent (the reference has no tests); these provide
deterministic tiny stand-ins for SRN data so the full train/eval pipelines
run without the (externally downloaded) SRN-ShapeNet assets.
"""
from __future__ import annotations

from typing import Optional

import numpy as np

from .dataset import Dataset
from .registry import register_dataset


def _look_at_world2cam(eye: np.ndarray) -> np.ndarray:
    fwd = -eye / np.linalg.norm(eye)
    up = np.array([0.0, 1.0, 0.0], np.float32)
    if abs(np.dot(up, fwd)) > 0.99:
        up = np.array([1.0, 0.0, 0.0], np.float32)
    right = np.cross(up, fwd)
    right /= np.linalg.norm(right)
    up2 = np.cross(fwd, right)
    rot = np.stack([right, up2, fwd], 0).astype(np.float32)
    ext = np.eye(4, dtype=np.float32)
    ext[:3, :3] = rot
    ext[:3, 3] = -rot @ eye
    return ext


def random_cameras(
    num_views: int, image_size: int, radius: float = 2.2, seed: int = 0
):
    """Cameras on a sphere looking at the origin, SRN-like world2cam + intr."""
    rng = np.random.default_rng(seed)
    extr, intr = [], []
    focal = image_size * 1.1
    k = np.array(
        [[focal, 0, image_size / 2], [0, focal, image_size / 2], [0, 0, 1]],
        np.float32,
    )
    for _ in range(num_views):
        theta = rng.uniform(0, 2 * np.pi)
        phi = rng.uniform(0.2, np.pi - 0.2)
        eye = radius * np.array(
            [np.sin(phi) * np.cos(theta), np.cos(phi), np.sin(phi) * np.sin(theta)],
            np.float32,
        )
        extr.append(_look_at_world2cam(eye))
        intr.append(k)
    return np.stack(extr), np.stack(intr)


@register_dataset
class SyntheticNPCTrain(Dataset):
    """Random point clouds + white-background images (flat gray blobs).

    The images are not physically rendered from the clouds; they exist to
    exercise the training plumbing with correct shapes and ranges.
    """

    def __init__(
        self,
        n_obj: int = 8,
        num_views: int = 4,
        image_size: int = 32,
        num_points: int = 64,
        seed: int = 0,
        **kwargs,
    ):
        super().__init__(
            root=None,
            n_obj=n_obj,
            num_views=num_views,
            image_size=image_size,
            num_points=num_points,
            seed=seed,
            **kwargs,
        )

    def _init_samples(self, n_obj, num_views, image_size, num_points, seed):
        rng = np.random.default_rng(seed)
        self.pcs = []
        extr, intr = random_cameras(num_views, image_size, seed=seed)
        for i in range(n_obj):
            pc = rng.uniform(-0.5, 0.5, (num_points, 3)).astype(np.float32)
            self.pcs.append(pc)
            images = np.ones((num_views, image_size * image_size, 3), np.float32)
            images *= rng.uniform(0.3, 1.0, (1, 1, 3)).astype(np.float32)
            self.samples.append(
                {
                    "obj_idx": np.int32(i),
                    "images": images,
                    "extrinsics": extr,
                    "intrinsics": intr,
                    "view_indices": np.arange(num_views, dtype=np.int32),
                }
            )

    def get_all_coords(self) -> np.ndarray:
        return np.stack(self.pcs)
