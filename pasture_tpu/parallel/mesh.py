"""Mesh construction + batch sharding helpers.

A :class:`~pasture_tpu.buffers.device.PointBatch` is a pytree of SoA
arrays, so sharding it is one NamedSharding per leaf: point-axis leaves
shard over the ``points`` mesh axis, scalar leaves (count, meta) replicate.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple, Union

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..buffers.device import PointBatch

__all__ = ["make_mesh", "batch_sharding", "shard_batch"]

POINTS_AXIS = "points"


def make_mesh(n_devices: Optional[int] = None,
              axes: Union[str, Sequence[str]] = POINTS_AXIS,
              shape: Optional[Tuple[int, ...]] = None) -> Mesh:
    """Build a mesh over the first ``n_devices`` devices.

    Default: 1-D ``("points",)`` mesh — pasture's per-point ops are
    embarrassingly parallel along the point axis (SURVEY.md §2.5)."""
    devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    devs = np.asarray(devices[:n_devices])
    if isinstance(axes, str):
        axes = (axes,)
    if shape is None:
        shape = (n_devices,) if len(axes) == 1 else None
    if shape is None:
        raise ValueError("shape required for multi-axis meshes")
    return Mesh(devs.reshape(shape), tuple(axes))


def batch_sharding(mesh: Mesh, batch: PointBatch,
                   axis: str = POINTS_AXIS) -> PointBatch:
    """A PointBatch-shaped pytree of NamedShardings: data columns sharded on
    their first (point) axis, count + meta replicated."""
    def col_spec(v):
        return NamedSharding(mesh, P(axis, *([None] * (v.ndim - 1))))

    data = {k: col_spec(v) for k, v in batch.data.items()}
    rep = NamedSharding(mesh, P())
    meta = {k: rep for k in batch.meta}
    return PointBatch(data, rep, batch.schema, meta)


def shard_batch(batch: PointBatch, mesh: Mesh,
                axis: str = POINTS_AXIS) -> PointBatch:
    """Place a batch onto the mesh, points sharded over ``axis``.

    The capacity must divide evenly by the axis size (pad_to first if not).
    """
    n_shards = mesh.shape[axis]
    if batch.capacity % n_shards:
        batch = batch.pad_to(
            (batch.capacity + n_shards - 1) // n_shards * n_shards)
    shardings = batch_sharding(mesh, batch, axis)
    return jax.tree_util.tree_map(jax.device_put, batch, shardings)
