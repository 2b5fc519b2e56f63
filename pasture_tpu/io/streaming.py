"""Out-of-core streaming: bounded-memory file-to-device pipelines.

The reference processes files in bounded chunks (1-MiB reads, 50k-point
writes, 1M-point analysis chunks — SURVEY.md §2.5 "chunked streaming");
this module is the device-era equivalent: a generator of fixed-capacity
:class:`PointBatch` chunks with host read-ahead overlapping device compute,
plus streaming reductions that fold over chunks (bounds, minmax,
voxel downsampling via the two-stage merge).
"""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor
from pathlib import Path
from typing import Iterator, Optional, Union

import numpy as np

from ..buffers.device import PointBatch
from ..layout import attributes as att
from ..layout.dtypes import DevicePolicy
from ..layout.schema import PointSchema
from ..math.aabb import AABB
from .base import open_reader

__all__ = ["stream_batches", "streaming_bounds", "streaming_voxel_downsample"]


def stream_batches(path: Union[str, Path], chunk_points: int = 1 << 20,
                   schema: Optional[PointSchema] = None,
                   policy: DevicePolicy = DevicePolicy.NARROW,
                   read_ahead: bool = True) -> Iterator[PointBatch]:
    """Yield fixed-capacity device batches of ``chunk_points`` each.

    With ``read_ahead`` the next chunk is parsed on a host thread while the
    caller computes on the current one (the async-ingest pattern replacing
    the reference's sequential reader loop).  Every batch has capacity
    ``chunk_points``; the last one is padded (check ``batch.count``).
    """
    reader = open_reader(path)

    def read_chunk():
        buf = reader.read(chunk_points, schema=schema)
        return buf if len(buf) else None

    try:
        if not read_ahead:
            while True:
                host = read_chunk()
                if host is None:
                    return
                yield PointBatch.from_host(host, policy=policy,
                                           capacity=chunk_points)
        else:
            with ThreadPoolExecutor(max_workers=1) as ex:
                future = ex.submit(read_chunk)
                while True:
                    host = future.result()
                    if host is None:
                        return
                    future = ex.submit(read_chunk)
                    yield PointBatch.from_host(host, policy=policy,
                                               capacity=chunk_points)
    finally:
        close = getattr(reader, "close", None)
        if close:
            close()


def streaming_bounds(path: Union[str, Path],
                     chunk_points: int = 1 << 20) -> Optional[AABB]:
    """AABB of an arbitrarily large file in bounded memory (the reference's
    chunked min/max scan, info.rs:95-160, on device)."""
    from ..ops.reductions import batch_bounds

    mn = mx = None
    for batch in stream_batches(path, chunk_points):
        bmin, bmax = batch_bounds(batch.data[att.POSITION_3D.name],
                                  batch.valid_mask())
        bmin, bmax = np.asarray(bmin, np.float64), np.asarray(bmax, np.float64)
        mn = bmin if mn is None else np.minimum(mn, bmin)
        mx = bmax if mx is None else np.maximum(mx, bmax)
    if mn is None:
        return None
    return AABB.from_min_max_unchecked(mn, mx)


def streaming_voxel_downsample(path: Union[str, Path], leaf_size: float,
                               chunk_points: int = 1 << 20,
                               grid_bits: int = 20,
                               semantics: str = "floor",
                               **voxel_kwargs) -> PointBatch:
    """Voxel-downsample a file larger than device memory.

    Two-stage: each chunk voxelizes against a common grid origin (the file
    bounds from a first streaming pass), then the concatenated per-chunk
    centroids voxelize once more.  Exact for mean policies up to the
    per-chunk weighting (chunks split voxels only at chunk boundaries along
    the read order; the final pass re-merges them with count weights folded
    into the mean of means being a close approximation — documented
    behaviour of the two-stage merge, see parallel.ops).

    Extra ``voxel_kwargs`` (e.g. ``position_quantization_bits``,
    ``sort_tiles``) forward to :func:`~pasture_tpu.ops.voxel_downsample`
    for its fast paths — chunks from a spatially tiled file qualify for
    tiled sorting.
    """
    import jax.numpy as jnp

    from ..ops.voxel import voxel_downsample

    bounds = streaming_bounds(path, chunk_points)
    if bounds is None:
        raise ValueError("empty input")
    gmin = jnp.asarray(bounds.min, jnp.float32)

    partials = []
    for batch in stream_batches(path, chunk_points):
        out = voxel_downsample(batch, leaf_size, bounds=(gmin, None),
                               semantics=semantics, grid_bits=grid_bits,
                               **voxel_kwargs)
        host = out.to_host(trim=True)
        partials.append(host)
    from ..buffers.host import HostPointBuffer
    merged = HostPointBuffer.concat(partials)
    final = PointBatch.from_host(merged)
    return voxel_downsample(final, leaf_size, bounds=(gmin, None),
                            semantics=semantics, grid_bits=grid_bits)
