"""Stage-2 dataset of stage-1 latents.

Rebuild of the reference PointNeRFDataset (npcd/data/pointnerf_dataset.py):
snapshots the trained autodecoder's coordinate and (mean) feature tables to
numpy, one sample per object, each [C, num_points].
"""
from __future__ import annotations

import numpy as np

from .dataset import Dataset
from .registry import register_dataset


@register_dataset
class PointNeRFDataset(Dataset):
    def __init__(self, pointnerf=None, params=None, all_coords=None, all_feats=None, **kwargs):
        super().__init__(
            root=None,
            pointnerf=pointnerf,
            params=params,
            all_coords=all_coords,
            all_feats=all_feats,
            **kwargs,
        )

    def _init_samples(self, pointnerf=None, params=None, all_coords=None, all_feats=None):
        if all_coords is None:
            assert pointnerf is not None and params is not None
            all_coords = np.asarray(pointnerf.get_all_coords(params))  # [n_obj, P, 3]
            all_feats = np.asarray(pointnerf.get_all_feats(params))  # [n_obj, P, F]
        all_coords = np.asarray(all_coords, np.float32).transpose(0, 2, 1)  # [n_obj, 3, P]
        all_feats = np.asarray(all_feats, np.float32).transpose(0, 2, 1)  # [n_obj, F, P]
        for coords, feats in zip(all_coords, all_feats):
            self.samples.append({"coords": coords, "feats": feats})

    def get_all_coords(self) -> np.ndarray:
        return np.concatenate([s["coords"] for s in self.samples], axis=-1)

    def get_all_feats(self) -> np.ndarray:
        return np.concatenate([s["feats"] for s in self.samples], axis=-1)
