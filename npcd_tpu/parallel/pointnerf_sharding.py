"""Sharding rules for PointNeRF parameters.

New capability vs the reference (single-GPU; SURVEY.md §2.10): the
per-object embedding tables are the dominant stage-1 state (feats table
n_obj x P x 2F ~= 77M params at the SRN-Cars config, plus Adam moments) and
partition cleanly by object row — exactly the axis the data-parallel batch
is sharded over. Sharding them over the 'data' mesh axis scales stage-1
memory with the mesh instead of replicating the tables per device; XLA
inserts the (cheap, row-aligned) collectives for the obj_idx gathers and
the scatter-add of table gradients.

MLP parameters (aggregator/field heads, ~0.6M) stay replicated.
"""
from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

_TABLE_KEYS = ("coords_table", "feats_table")


def pointnerf_param_specs(params: Any, data_axis: str = "data") -> Any:
    """PartitionSpec pytree: embedding tables row-sharded, MLPs replicated."""

    def spec_for(path, leaf) -> P:
        names = [getattr(k, "key", str(k)) for k in path]
        if names and names[0] in _TABLE_KEYS:
            return P(data_axis)
        return P()

    return jax.tree_util.tree_map_with_path(spec_for, params)


def pointnerf_param_shardings(params: Any, mesh: Mesh, data_axis: str = "data") -> Any:
    specs = pointnerf_param_specs(params, data_axis)
    return jax.tree_util.tree_map(lambda s: NamedSharding(mesh, s), specs)


def shard_pointnerf_params(params: Any, mesh: Mesh, data_axis: str = "data") -> Any:
    shardings = pointnerf_param_shardings(params, mesh, data_axis)
    return jax.tree_util.tree_map(jax.device_put, params, shardings)
