"""NPCD facade: PointNeRF autodecoder + diffusion model.

Rebuild of the reference NPCD (npcd/models/npcd.py:8-25). The reference's
`freeze_pointnerf` flag (requires_grad=False + pinned eval mode) is realized
functionally: stage-2 training simply never differentiates w.r.t. or updates
the pointnerf params, and always uses mean (eval-mode) embeddings.
"""
from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from .diffusion import DiffusionModel, DiffusionState
from .pointnerf import PointNeRF, PointNeRFRenderConfig


class NPCD:
    def __init__(
        self,
        n_obj: int,
        coords_dim: int = 3,
        feats_dim: int = 32,
        num_points: int = 512,
        use_view_dir: bool = False,
        width: int = 1024,
        layers: int = 24,
        heads: int = 16,
        pointnerf_only: bool = False,
        dtype: jnp.dtype = jnp.float32,
        attn_impl: str = "auto",
        render_config: Optional[PointNeRFRenderConfig] = None,
    ):
        self.pointnerf = PointNeRF(
            n_obj=n_obj,
            feats_dim=feats_dim,
            num_points=num_points,
            use_view_dir=use_view_dir,
            render_config=render_config,
        )
        self.pointnerf_only = pointnerf_only
        self.diffusion: Optional[DiffusionModel] = None
        if not pointnerf_only:
            self.diffusion = DiffusionModel(
                coords_dim=coords_dim,
                feats_dim=feats_dim,
                num_points=num_points,
                width=width,
                layers=layers,
                heads=heads,
                dtype=dtype,
                attn_impl=attn_impl,
            )

    def init_params(self, rng: jax.Array) -> Dict[str, Any]:
        k1, k2 = jax.random.split(rng)
        params: Dict[str, Any] = {"pointnerf": self.pointnerf.init_params(k1)}
        if self.diffusion is not None:
            params["diffusion"] = self.diffusion.init(k2)
        return params

    @classmethod
    def from_config(
        cls,
        config: Dict[str, Any],
        pointnerf_only: bool = False,
        dtype: jnp.dtype = jnp.float32,
        remat: bool = False,
    ) -> "NPCD":
        """Build from a (reference-schema) config dict, honoring the optional
        pointnerf_options / render_config extension sections."""
        from ..utils.builders import build_diffusion_model, build_pointnerf

        self = cls.__new__(cls)
        self.pointnerf = build_pointnerf(config)
        self.pointnerf_only = pointnerf_only
        self.diffusion = None
        if not pointnerf_only:
            self.diffusion = build_diffusion_model(config, dtype=dtype, remat=remat)
        return self
