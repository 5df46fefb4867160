"""Model/dataset construction from config dicts.

Centralizes what the reference scatters across its four CLI scripts: given
the (schema-preserved) YAML config, build the PointNeRF / DiffusionModel /
NPCD objects. Two optional, additive config sections extend the reference
schema without breaking it:

  pointnerf_options:   flat overrides for the PointNeRF option dataclasses
                       (depth_resolution, max_shading_pts, default_resolution,
                       ray_subsamples, ...)
  render_config:       PointNeRFRenderConfig fields (train_rays, chunks, ...)
  dataset_kwargs:      extra kwargs for create_dataset
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional

from ..utils.config import (
    PointNeRFOptions,
    pointnerf_default_options,
)


def _apply_flat_overrides(opts: PointNeRFOptions, overrides: Dict[str, Any]) -> PointNeRFOptions:
    """Route flat override keys to the right sub-dataclass."""
    overrides = dict(overrides)
    consumed = set()
    for field in ("voxel_grid", "aggregator", "field", "renderer"):
        sub = getattr(opts, field)
        sub_overrides = {
            k: v for k, v in overrides.items()
            if k in {f.name for f in dataclasses.fields(sub)}
        }
        if sub_overrides:
            # a key present in several sub-configs (e.g. ray_subsamples,
            # activation) is applied to each of them
            consumed |= set(sub_overrides)
            opts = dataclasses.replace(opts, **{field: dataclasses.replace(sub, **sub_overrides)})
    scalar_fields = {
        f.name for f in dataclasses.fields(opts)
        if not dataclasses.is_dataclass(getattr(opts, f.name))
    }
    top = {k: v for k, v in overrides.items() if k in scalar_fields}
    consumed |= set(top)
    unknown = set(overrides) - consumed
    if unknown:
        raise KeyError(f"unknown pointnerf_options overrides: {sorted(unknown)}")
    if top:
        opts = dataclasses.replace(opts, **top)
    return opts


def build_pointnerf_options(config: Dict[str, Any]) -> PointNeRFOptions:
    model_cfg = config["model"]
    opts = pointnerf_default_options(
        num_points=model_cfg["num_points"],
        feat_dim=model_cfg["feats_dim"],
        use_view_dir=model_cfg.get("use_view_dir", False),
    )
    if "pointnerf_options" in config:
        opts = _apply_flat_overrides(opts, config["pointnerf_options"])
    return opts


def build_pointnerf(config: Dict[str, Any]):
    from ..models.pointnerf import PointNeRF, PointNeRFRenderConfig

    model_cfg = config["model"]
    render_config = None
    if "render_config" in config:
        kwargs = dict(config["render_config"])
        if isinstance(kwargs.get("compute_dtype"), str):
            # YAML carries dtype names; normalize so identity checks like
            # resolved_train_remat's `!= jnp.bfloat16` work
            import jax.numpy as jnp

            kwargs["compute_dtype"] = jnp.dtype(kwargs["compute_dtype"]).type
        render_config = PointNeRFRenderConfig(**kwargs)
    return PointNeRF(
        n_obj=model_cfg["n_obj"],
        feats_dim=model_cfg["feats_dim"],
        num_points=model_cfg["num_points"],
        use_view_dir=model_cfg.get("use_view_dir", False),
        opts=build_pointnerf_options(config),
        render_config=render_config,
    )


def build_diffusion_model(config: Dict[str, Any], dtype=None, remat: bool = False):
    import jax.numpy as jnp

    from ..models.diffusion import DiffusionModel

    model_cfg = config["model"]
    return DiffusionModel(
        coords_dim=model_cfg["coords_dim"],
        feats_dim=model_cfg["feats_dim"],
        num_points=model_cfg["num_points"],
        width=model_cfg["width"],
        layers=model_cfg["layers"],
        heads=model_cfg["heads"],
        dtype=dtype if dtype is not None else jnp.float32,
        # optional (additive) config key: grouped-qkv layout group count —
        # set to the desired TP degree for tp>2 (default auto, G=2 at the
        # flagship geometry)
        qkv_groups=model_cfg.get("qkv_groups"),
        remat=remat,
    )


def build_dataset(config: Dict[str, Any]):
    from ..data import create_dataset

    return create_dataset(config["train_dataset"], **config.get("dataset_kwargs", {}))
