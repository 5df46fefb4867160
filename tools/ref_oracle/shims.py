"""Minimal import shims so /root/reference's code runs on CPU torch in this
image.

Each stub implements ONLY what the reference's import chain touches on the
training/eval paths we use as oracles. Nothing here is copied from the real
packages — they are empty stand-ins plus a ~20-line attribute-dict.

Shimmed (absent from the image):
  easydict        — EasyDict attribute-access dict (config containers)
  torch_knnquery  — VoxelGrid stub; the harness forces the reference's own
                    voxel-grid-free torch fallback (aggregator.py:42-57),
                    so no CUDA query is ever called
  wandb           — no-op logging surface (writer.py imports it eagerly)
  skimage         — vis.py imports skimage.transform; unused by training
  mmcv / mmgen    — fidkid.py imports them; FID oracle is not exercised
  torch._six      — removed in torch 2.x; util.py needs string_classes
"""
from __future__ import annotations

import sys
import types


class EasyDict(dict):
    """dict with attribute access, recursively converting nested dicts
    (the subset of pip `easydict` the reference config containers use)."""

    def __init__(self, d=None, **kwargs):
        super().__init__()
        d = dict(d or {}, **kwargs)
        for k, v in d.items():
            self[k] = v

    @staticmethod
    def _wrap(value):
        if isinstance(value, dict) and not isinstance(value, EasyDict):
            return EasyDict(value)
        if isinstance(value, (list, tuple)):
            return type(value)(EasyDict._wrap(v) for v in value)
        return value

    def __setitem__(self, key, value):
        super().__setitem__(key, EasyDict._wrap(value))

    def __setattr__(self, key, value):
        self[key] = value

    def __getattr__(self, key):
        try:
            return self[key]
        except KeyError as e:
            raise AttributeError(key) from e


class VoxelGridStub:
    """Stands in for torch_knnquery.VoxelGrid (CUDA-only upstream). The
    oracle harness sets every aggregator's voxel_grid to None right after
    model construction, routing queries to the reference's pure-torch
    fallback; only the constructor surface and vsize_tup (used for
    scaled_r) are ever touched."""

    def __init__(self, voxel_size=(0.04, 0.04, 0.04), voxel_scale=(2, 2, 2),
                 kernel_size=(3, 3, 3), max_points_per_voxel=4,
                 max_occ_voxels_per_example=5000,
                 ranges=(-1.0, -1.0, -1.0, 1.0, 1.0, 1.0), **_):
        self.vsize_tup = tuple(
            s * c for s, c in zip(voxel_size, voxel_scale)
        )

    def set_pointset(self, *a, **k):  # called by PointNeRF.forward
        pass

    def query(self, *a, **k):
        raise RuntimeError(
            "VoxelGridStub.query should be unreachable: the oracle harness "
            "must set aggregator.voxel_grid = None (see force_knn_fallback)"
        )


def _module(name: str, **attrs) -> types.ModuleType:
    mod = types.ModuleType(name)
    for k, v in attrs.items():
        setattr(mod, k, v)
    sys.modules[name] = mod
    return mod


def install_shims() -> None:
    """Idempotently install stub modules for the reference's missing deps."""
    if "easydict" not in sys.modules:
        _module("easydict", EasyDict=EasyDict)
    if "torch_knnquery" not in sys.modules:
        _module("torch_knnquery", VoxelGrid=VoxelGridStub)
    if "wandb" not in sys.modules:
        noop = lambda *a, **k: None
        _module("wandb", init=noop, log=noop, finish=noop, run=None,
                Image=lambda *a, **k: None, config={})
    if "skimage" not in sys.modules:
        import numpy as _np

        def _psnr(image_true, image_test, data_range=1):
            # numpy stand-in for skimage.metrics.peak_signal_noise_ratio
            err = _np.mean(
                (_np.asarray(image_true, _np.float64)
                 - _np.asarray(image_test, _np.float64)) ** 2)
            return 10.0 * _np.log10((float(data_range) ** 2) / err)

        sk = _module("skimage")
        sk.transform = _module("skimage.transform", resize=None)
        sk.metrics = _module("skimage.metrics",
                             peak_signal_noise_ratio=_psnr)
    if "torchvision" not in sys.modules:
        import numpy as _np
        import torch as _torch

        def _to_tensor(pic):
            # numpy/PIL [H, W, C] uint8/float -> float CHW in [0, 1]
            # (the one torchvision op srn.py:132 uses)
            arr = _np.asarray(pic)
            if arr.dtype == _np.uint8:
                arr = arr.astype(_np.float32) / 255.0
            return _torch.from_numpy(arr.astype(_np.float32)).permute(2, 0, 1)

        tv = _module("torchvision")
        tv.transforms = _module("torchvision.transforms")
        tv.transforms.functional = _module(
            "torchvision.transforms.functional", to_tensor=_to_tensor)
    if "pytoml" not in sys.modules:
        import tomllib as _tomllib

        def _pytoml_load(f):
            # pytoml.load takes a text file object; tomllib wants bytes
            data = f.read()
            if isinstance(data, str):
                data = data.encode()
            return _tomllib.loads(data.decode())

        _module("pytoml", load=_pytoml_load)
    if "mmcv" not in sys.modules:
        _module("mmcv")
    if "mmgen" not in sys.modules:
        _module("mmgen")
        _module("mmgen.core")
        _module("mmgen.core.evaluation")
        _module("mmgen.core.evaluation.metrics", FID=object)
    import torch

    if not hasattr(torch, "_six"):
        torch._six = _module("torch._six", string_classes=(str, bytes))


def import_reference(path: str = "/root/reference"):
    """Install shims, put the reference on sys.path, and return the imported
    top-level `npcd` package (the reference's, not this repo's)."""
    install_shims()
    if path not in sys.path:
        sys.path.insert(0, path)
    import npcd as reference_npcd  # noqa: F401

    return reference_npcd


def force_knn_fallback(ref_pointnerf) -> None:
    """Route the reference model's keypoint queries to its own pure-torch
    voxel-grid-free path (aggregator.py:42-57): absolute-distance kNN with
    first-max_shading_pts-valid-per-ray compaction — the exact semantic
    npcd_tpu's nn-validity mode implements. scaled_r keeps the value the
    voxel path would have used (r voxels x max scaled voxel size), because
    field.scatter_shape's non-nerf fill and any norm_displacements division
    read it as an absolute distance; self.r becomes the same absolute
    radius so the fallback's `topk.values < self.r` matches."""
    agg = ref_pointnerf.field.aggregator
    scaled_r = agg.r * max(ref_pointnerf.voxel_grid.vsize_tup)
    agg.voxel_grid = None
    agg.r = scaled_r
    agg.scaled_r = scaled_r
