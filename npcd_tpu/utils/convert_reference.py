"""Convert a reference PyTorch checkpoint (npcd_srncars.pt) into npcd_tpu
parameter pytrees, for PSNR/FID parity evaluation without retraining
(SURVEY.md §7 hard part 4).

Source layout (the reference NPCD state_dict):
  pointnerf.feats._extra_state        {"emb": {"weight": [n_obj, P*2F]}}
                                      (FlexEmbedding persists via extra state,
                                      reference flex_embedding.py:9-26)
  pointnerf.coords._extra_state       {"emb": {"weight": [n_obj, P*3]}}
  pointnerf.field.aggregator.local_field.{0,2,4,6,8}.weight/bias
  pointnerf.field.shape_net.{0,2}.weight/bias
  pointnerf.field.channel_net.{0,2,4,6,8}.weight/bias
  diffusion.denoiser.{input_proj,output_proj,ln_pre,ln_post,time_embed.*}
  diffusion.denoiser.backbone.resblocks.N.{ln_1,ln_2,attn.c_qkv,attn.c_proj,
                                           mlp.c_fc,mlp.c_proj}
  diffusion.{coords,feats}_normalization.{shift,scale,min,max}

torch Linear stores weight as [out, in]; flax/our Dense kernels are
[in, out] -> transpose. The reference's fused qkv projection emits per-head
[q|k|v] channel groups (transformer.py:71-73); the TPU build uses a grouped
[Q|K|V] order (qkv_groups head groups, each internally [Q_g|K_g|V_g]) so
the Pallas attention kernel can view the fused tensor without HBM copies
and tensor-parallel column splits land on whole head groups — the converter
applies that column permutation once here (see
ops/pallas/fused_qkv_attention.py, parallel/tp.py).
"""
from __future__ import annotations

from typing import Any, Dict

import numpy as np


def _t(w) -> np.ndarray:
    return np.ascontiguousarray(np.asarray(w, np.float32).T)


def _a(w) -> np.ndarray:
    return np.asarray(w, np.float32)


def load_torch_state_dict(path: str) -> Dict[str, Any]:
    import torch

    state = torch.load(path, map_location="cpu")
    if isinstance(state, dict) and "model" in state:
        state = state["model"]
    return {k: (v.numpy() if hasattr(v, "numpy") else v) for k, v in state.items()}


def _mlp_from_sequential(state: Dict[str, Any], prefix: str, num_linears: int):
    """Reference define_mlp Sequential: Linear at even indices."""
    layers = []
    for i in range(num_linears):
        idx = 2 * i
        layers.append(
            {
                "w": _t(state[f"{prefix}.{idx}.weight"]),
                "b": _a(state[f"{prefix}.{idx}.bias"]),
            }
        )
    return layers


def convert_pointnerf_params(
    state: Dict[str, Any],
    n_obj: int,
    num_points: int = 512,
    feat_dim: int = 32,
    prefix: str = "pointnerf.",
) -> Dict[str, Any]:
    def extra_weight(key):
        extra = state[f"{prefix}{key}._extra_state"]
        w = extra["emb"]["weight"]
        return np.asarray(w, np.float32)

    coords = extra_weight("coords").reshape(n_obj, num_points, 3)
    feats = extra_weight("feats").reshape(n_obj, num_points, 2 * feat_dim)

    return {
        "coords_table": coords,
        "feats_table": feats,
        "aggregator": {
            "local_field": _mlp_from_sequential(
                state, f"{prefix}field.aggregator.local_field", 5
            )
        },
        "field": {
            "shape_net": _mlp_from_sequential(state, f"{prefix}field.shape_net", 2),
            "channel_net": _mlp_from_sequential(state, f"{prefix}field.channel_net", 5),
        },
    }


def _permute_qkv_grouped(
    kernel: np.ndarray, bias: np.ndarray, heads: int, groups: int
):
    """Per-head [q|k|v] output channels -> grouped [Q|K|V] layout.

    kernel: [in, 3W]; bias: [3W]. The target layout (see
    ops/pallas/fused_qkv_attention.py) has `groups` head groups; group g
    owns columns [g*3*Wg, (g+1)*3*Wg) ordered [Q_g | K_g | V_g] with heads
    contiguous inside each third (groups=1 is the global [Q|K|V] order).
    Source column h*3d + t*d + j maps to
    (h//hg)*3*hg*d + t*hg*d + (h%hg)*d + j with hg = heads/groups."""
    in_dim, w3 = kernel.shape
    d = w3 // (3 * heads)
    hg = heads // groups
    k = (
        kernel.reshape(in_dim, groups, hg, 3, d)
        .transpose(0, 1, 3, 2, 4)
        .reshape(in_dim, w3)
    )
    b = bias.reshape(groups, hg, 3, d).transpose(0, 2, 1, 3).reshape(w3)
    return np.ascontiguousarray(k), np.ascontiguousarray(b)


def relayout_qkv(
    kernel: np.ndarray,
    bias: np.ndarray,
    heads: int,
    from_groups: int,
    to_groups: int,
):
    """Permute fused-qkv projection output channels between grouped [Q|K|V]
    layouts (e.g. migrate a checkpoint saved under the old global layout,
    from_groups=1, to the flagship default qkv_groups=2)."""
    if from_groups == to_groups:
        return kernel, bias
    in_dim, w3 = kernel.shape
    d = w3 // (3 * heads)
    hg_f = heads // from_groups

    # grouped -> per-head [q|k|v] (inverse of _permute_qkv_grouped)
    k = (
        kernel.reshape(in_dim, from_groups, 3, hg_f, d)
        .transpose(0, 1, 3, 2, 4)
        .reshape(in_dim, w3)
    )
    b = bias.reshape(from_groups, 3, hg_f, d).transpose(0, 2, 1, 3).reshape(w3)
    return _permute_qkv_grouped(np.ascontiguousarray(k), np.ascontiguousarray(b),
                                heads, to_groups)


def convert_denoiser_params(
    state: Dict[str, Any],
    layers: int = 24,
    heads: int = 16,
    prefix: str = "diffusion.denoiser.",
    qkv_groups: int | None = None,
) -> Dict[str, Any]:
    def dense(key):
        return {
            "kernel": _t(state[f"{prefix}{key}.weight"]),
            "bias": _a(state[f"{prefix}{key}.bias"]),
        }

    def qkv_dense(key):
        d = dense(key)
        groups = qkv_groups
        if groups is None:
            from ..ops.attention import default_qkv_groups

            head_dim = d["kernel"].shape[1] // (3 * heads)
            groups = default_qkv_groups(heads, head_dim)
        kernel, bias = _permute_qkv_grouped(d["kernel"], d["bias"], heads, groups)
        return {"kernel": kernel, "bias": bias}

    def ln(key):
        return {
            "scale": _a(state[f"{prefix}{key}.weight"]),
            "bias": _a(state[f"{prefix}{key}.bias"]),
        }

    params: Dict[str, Any] = {
        "input_proj": dense("input_proj"),
        "output_proj": dense("output_proj"),
        "ln_pre": ln("ln_pre"),
        "ln_post": ln("ln_post"),
        "time_embed": {
            "c_fc": dense("time_embed.c_fc"),
            "c_proj": dense("time_embed.c_proj"),
        },
    }
    for i in range(layers):
        b = f"backbone.resblocks.{i}."
        params[f"resblocks_{i}"] = {
            "ln_1": ln(b + "ln_1"),
            "ln_2": ln(b + "ln_2"),
            "attn": {
                "c_qkv": qkv_dense(b + "attn.c_qkv"),
                "c_proj": dense(b + "attn.c_proj"),
            },
            "mlp": {
                "c_fc": dense(b + "mlp.c_fc"),
                "c_proj": dense(b + "mlp.c_proj"),
            },
        }
    return params


def convert_normalizer_stats(state: Dict[str, Any], prefix: str):
    from ..models.diffusion.normalizers import NormalizerStats
    import jax.numpy as jnp

    return NormalizerStats(
        shift=jnp.asarray(_a(state[f"{prefix}.shift"])),
        scale=jnp.asarray(_a(state[f"{prefix}.scale"])),
        min=jnp.asarray(_a(state[f"{prefix}.min"])),
        max=jnp.asarray(_a(state[f"{prefix}.max"])),
    )


def convert_checkpoint(
    path: str,
    n_obj: int,
    num_points: int = 512,
    feat_dim: int = 32,
    layers: int = 24,
) -> Dict[str, Any]:
    """Full reference checkpoint -> {'pointnerf': ..., 'diffusion': DiffusionState}."""
    from ..models.diffusion.diffusion_model import DiffusionState

    state = load_torch_state_dict(path)
    out: Dict[str, Any] = {
        "pointnerf": convert_pointnerf_params(state, n_obj, num_points, feat_dim)
    }
    if any(k.startswith("diffusion.") for k in state):
        out["diffusion"] = DiffusionState(
            params=convert_denoiser_params(state, layers),
            coords_norm=convert_normalizer_stats(state, "diffusion.coords_normalization"),
            feats_norm=convert_normalizer_stats(state, "diffusion.feats_normalization"),
        )
    return out
