"""Sharded, host-parallel file ingest.

Replaces the reference's sequential ``PointReader`` streaming loop
(SURVEY.md §2.5 mapping (d)): files are read concurrently on host threads
(mmap + vectorised decode are GIL-friendly), converted to a common schema,
concatenated, padded, and placed on the mesh points-sharded — one call from
a directory of LAS/LAZ files to a device-resident sharded batch.
"""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor
from pathlib import Path
from typing import Iterable, Optional, Sequence, Union

from ..buffers.device import PointBatch
from ..buffers.host import HostPointBuffer
from ..io import open_reader
from ..layout.dtypes import DevicePolicy
from ..layout.schema import PointSchema
from .mesh import POINTS_AXIS, shard_batch

__all__ = ["sharded_read_all", "read_files_parallel"]


def read_files_parallel(paths: Sequence[Union[str, Path]],
                        schema: Optional[PointSchema] = None,
                        max_workers: int = 8) -> HostPointBuffer:
    """Read many point-cloud files concurrently into one host buffer.

    Without ``schema`` the first file's default schema is used; every other
    file converts into it (zero-filled where attributes are missing)."""
    paths = list(paths)
    if not paths:
        raise ValueError("no input files")
    if schema is None:
        with open_reader(paths[0]) as r:
            schema = r.get_default_point_schema()

    def read_one(path):
        with open_reader(path) as r:
            return r.read_all(schema=schema)

    with ThreadPoolExecutor(max_workers=min(max_workers, len(paths))) as ex:
        buffers = list(ex.map(read_one, paths))
    return HostPointBuffer.concat(buffers)


def sharded_read_all(paths: Sequence[Union[str, Path]], mesh,
                     schema: Optional[PointSchema] = None,
                     axis: str = POINTS_AXIS,
                     policy: DevicePolicy = DevicePolicy.NARROW,
                     max_workers: int = 8) -> PointBatch:
    """files -> host-parallel read -> device batch sharded over the mesh."""
    host = read_files_parallel(paths, schema, max_workers)
    n_shards = mesh.shape[axis]
    cap = (len(host) + n_shards - 1) // n_shards * n_shards
    batch = PointBatch.from_host(host, policy=policy, capacity=max(cap, n_shards))
    return shard_batch(batch, mesh, axis)
