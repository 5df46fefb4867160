"""Tensor-parallel sharding rules for the NPCD denoiser.

New capability vs the reference (which is single-GPU; SURVEY.md §2.10):
Megatron-style TP of the transformer blocks expressed as GSPMD sharding
hints over a ('data', 'model') mesh —

  * column-parallel: fused qkv and MLP up-projection kernels split on the
    output dim. The qkv projection's grouped [Q|K|V] channel layout
    (ops/pallas/fused_qkv_attention.py) makes the split head-aligned: with
    tp dividing the model's qkv_groups, each shard owns whole head groups —
    complete (q, k, v) triples for heads [g*H/tp, (g+1)*H/tp) — so
    attention is shard-local and GSPMD needs no activation all-gather
    (asserted on the compiled HLO in tests/test_tp.py).
  * row-parallel: attention output and MLP down-projection kernels split on
    the input dim (XLA inserts the all-reduce over ICI)
  * everything else (layernorms, embeddings, input/output projections)
    replicated

Requires tp | qkv_groups (the flagship 16-head/D-64 config defaults to
qkv_groups=2; set qkv_groups=4 or 8 in the model for higher TP degrees).

Two ways to run it:
  * GSPMD: apply these shardings with jax.device_put / jit; XLA inserts the
    collectives. Works with the einsum attention path (XLA partitions the
    per-head einsums); the Pallas attention custom call is opaque to GSPMD,
    so production TP uses —
  * shard_map: parallel/tp_step.py writes the per-shard program explicitly
    (local head-group attention through the Pallas kernel, psum after the
    row-parallel projections).
"""
from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

_COL_PARALLEL = ("c_qkv", "c_fc")   # kernel [in, out] -> split out
_ROW_PARALLEL = ("c_proj",)          # kernel [in, out] -> split in


def denoiser_param_specs(params: Any, model_axis: str = "model") -> Any:
    """PartitionSpec pytree for NPCDTransformer params."""

    def spec_for(path, leaf) -> P:
        names = [getattr(k, "key", str(k)) for k in path]
        in_block = any(n.startswith("resblocks_") or n == "time_embed" for n in names)
        module = names[-2] if len(names) >= 2 else ""
        kind = names[-1]
        if in_block and module in _COL_PARALLEL:
            if kind == "kernel":
                return P(None, model_axis)
            if kind == "bias":
                return P(model_axis)
        if in_block and module in _ROW_PARALLEL and kind == "kernel":
            return P(model_axis, None)
        return P()

    return jax.tree_util.tree_map_with_path(spec_for, params)


def denoiser_param_shardings(params: Any, mesh: Mesh, model_axis: str = "model") -> Any:
    specs = denoiser_param_specs(params, model_axis)
    return jax.tree_util.tree_map(lambda s: NamedSharding(mesh, s), specs)


def shard_denoiser_params(params: Any, mesh: Mesh, model_axis: str = "model") -> Any:
    shardings = denoiser_param_shardings(params, mesh, model_axis)
    return jax.tree_util.tree_map(jax.device_put, params, shardings)
