"""Mesh construction and sharding specs (the `mesh.py` module SURVEY §2.3
calls for).

Parity note: the reference's only parallelism is intra-node DataParallel;
this module is its TPU-native superset — pure data parallelism over ICI by
default (`Mesh(('data',))` on v5e-8), with the axis list kept general so a
model-parallel axis can be added without touching call sites.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def create_mesh(
    mesh_shape: Optional[Sequence[int]] = None,
    axis_names: Sequence[str] = ("data",),
    devices=None,
) -> Mesh:
    """Build a device mesh. Defaults to all devices on one 'data' axis."""
    devices = devices if devices is not None else jax.devices()
    if mesh_shape is None:
        mesh_shape = (len(devices),)
    n = int(np.prod(mesh_shape))
    if n > len(devices):
        raise ValueError(f"mesh {tuple(mesh_shape)} needs {n} devices, have {len(devices)}")
    dev_array = np.asarray(devices[:n]).reshape(mesh_shape)
    return Mesh(dev_array, axis_names)


def batch_sharding(mesh: Mesh, batch_axis: str = "data") -> NamedSharding:
    """Shard the leading (batch) dim over the data axis."""
    return NamedSharding(mesh, P(batch_axis))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    """Fully replicated (params, opt state)."""
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh, batch_axis: str = "data"):
    """Device-put a host batch pytree with the leading dim sharded."""
    sharding = batch_sharding(mesh, batch_axis)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), batch)
