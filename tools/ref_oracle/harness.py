"""Builders pairing the ACTUAL reference torch models with matched npcd_tpu
models (identical weights via utils/convert_reference.py) on tiny CPU
geometry, plus comparison drivers.

Used by tests/test_reference_oracle.py (deterministic eval-forward parity)
and tools/ref_dynamics.py (N-step training-dynamics band comparison).
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import numpy as np

from .shims import force_knn_fallback, import_reference


@dataclasses.dataclass(frozen=True)
class TinyGeometry:
    """One knob set applied to BOTH frameworks. Reference knobs that are
    baked into `_get_pointnerf_options` (reference pointnerf.py:134-194)
    are mutated post-construction on the torch modules; they are plain
    attributes read at runtime, so this is safe."""

    n_obj: int = 4
    num_points: int = 24
    feat_dim: int = 8
    depth_resolution: int = 24
    max_shading_pts: int = 8
    resolution: int = 16
    # train-path knobs
    renderer_ray_subsamples: int = 32   # rays presampled per view
    aggregator_ray_subsamples: int = 32  # valid-ray cap in the reference
    train_rays: int = 32


def build_ref_pointnerf(geom: TinyGeometry, seed: int = 0):
    """Reference PointNeRF (real torch classes) on CPU, voxel-grid-free
    fallback forced, runtime geometry shrunk, tables randomized."""
    import torch

    import_reference()
    from npcd.models.pointnerf.pointnerf import PointNeRF as RefPointNeRF

    torch.manual_seed(seed)
    pn = RefPointNeRF(
        n_obj=geom.n_obj, feats_dim=geom.feat_dim,
        num_points=geom.num_points, use_view_dir=False,
    )
    force_knn_fallback(pn)
    pn.renderer.depth_resolution = geom.depth_resolution
    pn.renderer.ray_subsamples = geom.renderer_ray_subsamples
    pn.field.aggregator.max_shading_pts = geom.max_shading_pts
    pn.field.aggregator.ray_subsamples = geom.aggregator_ray_subsamples
    pn.opt.sizes.default_resolution = geom.resolution

    # tables are zeros-initialized in the reference (embedding.py:26);
    # randomize so the comparison exercises a non-trivial field
    g = torch.Generator().manual_seed(seed + 1)
    with torch.no_grad():
        coords = (torch.rand(
            (geom.n_obj, geom.num_points * 3), generator=g
        ) - 0.5) * 0.8
        pn.coords.get_emb().weight.copy_(coords)
        feats = torch.randn(
            (geom.n_obj, geom.num_points * 2 * geom.feat_dim), generator=g
        ) * 0.3
        pn.feats.get_emb().weight.copy_(feats)
    return pn


def ref_state_numpy(model) -> Dict[str, Any]:
    """state_dict with tensors converted to numpy (nested extra-state dicts
    handled by convert_reference's np.asarray calls).

    MUST deep-copy: `.numpy()` on a CPU tensor shares storage with the live
    torch parameter, and downstream np.asarray/transpose keep that view, so
    any in-place torch update (an optimizer step, set_all_coords's copy_)
    would silently mutate the 'converted' JAX params. This exact aliasing
    made ref_dynamics.py's stage-1 comparison start the JAX trainer from
    the reference's POST-training weights (the r03 'TPU ends 20% lower'
    deviation — a harness bug, not a framework difference)."""
    import torch

    def conv(v):
        if torch.is_tensor(v):
            return v.detach().cpu().numpy().copy()
        if isinstance(v, dict):
            return {k: conv(x) for k, x in v.items()}
        return v

    return {k: conv(v) for k, v in model.state_dict().items()}


def tpu_pointnerf_from_ref(pn_ref, geom: TinyGeometry,
                           render_config=None):
    """npcd_tpu PointNeRF with matching geometry and the reference model's
    exact weights (converted via utils/convert_reference.py)."""
    from npcd_tpu.models.pointnerf import PointNeRF, PointNeRFRenderConfig
    from npcd_tpu.utils.config import pointnerf_default_options
    from npcd_tpu.utils.convert_reference import convert_pointnerf_params

    opts = pointnerf_default_options(
        num_points=geom.num_points, feat_dim=geom.feat_dim
    )
    opts = dataclasses.replace(
        opts,
        renderer=dataclasses.replace(
            opts.renderer,
            depth_resolution=geom.depth_resolution,
            ray_subsamples=geom.renderer_ray_subsamples,
        ),
        aggregator=dataclasses.replace(
            opts.aggregator, max_shading_pts=geom.max_shading_pts
        ),
        default_resolution=geom.resolution,
    )
    if render_config is None:
        render_config = PointNeRFRenderConfig(
            train_rays=geom.train_rays,
            train_ray_chunk=geom.train_rays,
            eval_ray_chunk=geom.resolution * geom.resolution,
        )
    pn = PointNeRF(
        n_obj=geom.n_obj, feats_dim=geom.feat_dim,
        num_points=geom.num_points, opts=opts, render_config=render_config,
    )
    state = ref_state_numpy(pn_ref)
    # the converter expects the NPCD-level "pointnerf." prefix; the bare
    # model's keys have none
    params = convert_pointnerf_params(
        {f"pointnerf.{k}": v for k, v in state.items()},
        n_obj=geom.n_obj, num_points=geom.num_points, feat_dim=geom.feat_dim,
    )
    return pn, params


def make_cameras(geom: TinyGeometry, n_views: int = 2, seed: int = 3):
    """Shared camera set as numpy (fed to torch and jax identically)."""
    from npcd_tpu.data.synthetic import random_cameras

    extr, intr = random_cameras(n_views, geom.resolution, seed=seed)
    extr = np.tile(np.asarray(extr, np.float32)[None], (geom.n_obj, 1, 1, 1))
    intr = np.tile(np.asarray(intr, np.float32)[None], (geom.n_obj, 1, 1, 1))
    return extr, intr


def ref_eval_forward(pn_ref, obj_idx, intrinsics, extrinsics):
    """Deterministic reference eval forward: eval() disables the variational
    reparam noise (variational_embedding.py:31-34) and the depth jitter
    (renderer randomize_depth_samples), sample_rays=False renders every
    pixel — so the output depends only on weights and cameras."""
    import torch

    pn_ref.eval()
    with torch.no_grad():
        pred, aux = pn_ref(
            obj_idx=torch.as_tensor(obj_idx, dtype=torch.long),
            intrinsics=torch.as_tensor(intrinsics, dtype=torch.float32),
            extrinsics=torch.as_tensor(extrinsics, dtype=torch.float32),
            sample_rays=False,
        )
    return (
        {k: v.detach().cpu().numpy() for k, v in pred.items() if v is not None},
        {k: v.detach().cpu().numpy() for k, v in aux.items()},
    )


def build_ref_diffusion(feat_dim: int = 8, num_points: int = 32,
                        width: int = 32, layers: int = 2, heads: int = 2,
                        seed: int = 0):
    """Reference DiffusionModel (real torch classes: NPCDTransformer +
    GaussianDiffusion + both normalizers), randomly initialized on CPU."""
    import torch

    import_reference()
    from npcd.models.diffusion.diffusion_model import DiffusionModel as RefDM

    torch.manual_seed(seed)
    return RefDM(coords_dim=3, feats_dim=feat_dim, num_points=num_points,
                 width=width, layers=layers, heads=heads,
                 use_flash_attn=False)


def tpu_diffusion_from_ref(ref_dm, qkv_groups: int = 1):
    """npcd_tpu DiffusionModel with the reference model's exact denoiser
    weights (convert_denoiser_params) and normalizer buffers."""
    import jax

    from npcd_tpu.models.diffusion import DiffusionModel
    from npcd_tpu.models.diffusion.normalizers import NormalizerStats
    from npcd_tpu.utils.convert_reference import convert_denoiser_params

    layers = len(ref_dm.denoiser.backbone.resblocks)
    heads = ref_dm.denoiser.backbone.resblocks[0].attn.heads
    width = ref_dm.denoiser.input_proj.out_features

    state = ref_state_numpy(ref_dm)
    params = convert_denoiser_params(
        {f"diffusion.{k}": v for k, v in state.items()},
        layers=layers, heads=heads, qkv_groups=qkv_groups,
    )
    dm = DiffusionModel(
        coords_dim=ref_dm.coords_dim, feats_dim=ref_dm.feats_dim,
        num_points=ref_dm.num_points, width=width, layers=layers,
        heads=heads, attn_impl="einsum", qkv_groups=qkv_groups,
    )
    dstate = dm.init(jax.random.PRNGKey(0))

    def norm_stats(ref_norm):
        return NormalizerStats(
            shift=np.asarray(ref_norm.shift.numpy(), np.float32),
            scale=np.asarray(ref_norm.scale.numpy(), np.float32),
            min=np.asarray(ref_norm.min.numpy(), np.float32),
            max=np.asarray(ref_norm.max.numpy(), np.float32),
        )

    dstate = dstate.replace(
        params=params,
        coords_norm=norm_stats(ref_dm.coords_normalization),
        feats_norm=norm_stats(ref_dm.feats_normalization),
    )
    return dm, dstate


def tpu_eval_forward(pn, params, obj_idx, intrinsics, extrinsics,
                     resolution: int):
    import jax.numpy as jnp

    pred, aux = pn.forward(
        params, jnp.asarray(obj_idx), jnp.asarray(intrinsics),
        jnp.asarray(extrinsics), train=False, resolution=resolution,
    )
    return (
        {k: np.asarray(v) for k, v in pred.items()},
        {k: np.asarray(v) for k, v in aux.items()},
    )
