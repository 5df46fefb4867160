"""Device mesh + sharding helpers.

The reference has no parallelism beyond single-GPU SIMT (SURVEY.md §2.10);
scale-out is a new first-class capability of the TPU build. Both training
stages use data parallelism over a 1-D ``('data',)`` mesh: parameters are
replicated, batches are sharded on their leading axis, and jit/GSPMD inserts
the psum gradient reduction over ICI. The denoiser additionally supports a
2-D ``('data', 'model')`` mesh for tensor-parallel evaluation of the MLP/
attention blocks (see parallel/tp.py).
"""
from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_devices: Optional[int] = None,
    axis_names: Sequence[str] = ("data",),
    shape: Optional[Sequence[int]] = None,
) -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    if shape is None:
        shape = (len(devices),) if len(axis_names) == 1 else None
    assert shape is not None, "shape required for multi-axis meshes"
    dev_array = np.asarray(devices).reshape(shape)
    return Mesh(dev_array, axis_names)


def data_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    return NamedSharding(mesh, P(axis))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Any, mesh: Mesh, axis: str = "data") -> Any:
    """Shard every leaf on its leading dimension across the data axis.

    Single-host: a plain sharded device_put. Multi-host: each process holds
    only its local slice of the global batch (BatchLoader with
    num_shards=process_count), so the global array is assembled with
    make_array_from_process_local_data — the leading dim of each local
    leaf is 1/process_count of the global batch."""
    sharding = data_sharding(mesh, axis)
    if jax.process_count() > 1:
        def put(x):
            local = np.asarray(x)
            global_shape = (local.shape[0] * jax.process_count(),) + local.shape[1:]
            return jax.make_array_from_process_local_data(
                sharding, local, global_shape
            )

        return jax.tree_util.tree_map(put, batch)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), batch
    )


def replicate(tree: Any, mesh: Mesh) -> Any:
    sharding = replicated_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)
