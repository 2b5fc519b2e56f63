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
                               with_aux: bool = False,
                               **voxel_kwargs) -> PointBatch:
    """Voxel-downsample a file larger than device memory — EXACTLY.

    Two-stage: each chunk voxelizes against a common grid origin (the file
    bounds from a first streaming pass) with merge statistics
    (``with_aux`` — per-voxel counts, cell keys, winning-mode counts), and
    an on-device accumulator folds each chunk in with
    :func:`~pasture_tpu.ops.merge_voxel_batches`.  The result equals the
    one-shot global voxelization: exactly for the mean/max policies
    (weighted mean of partial means / max of maxes; integer mean columns
    may differ by one unit of the final integer cast, both paths rounding
    f32), and mode within the documented weighted-vote envelope
    (ops/voxel_merge.py — exact unless the global mode value loses in
    EVERY chunk it appears in).  Value-level equality is asserted in
    tests/test_streaming.py.

    The hot loop never round-trips point data through the host: partial
    centroid batches stay on device and only the voxel-count scalar is
    fetched to size the accumulator, which grows geometrically (a new
    XLA program per doubling, not per chunk).

    Extra ``voxel_kwargs`` (e.g. ``position_quantization_bits``,
    ``sort_tiles``) forward to :func:`~pasture_tpu.ops.voxel_downsample`
    for its fast paths — chunks from a spatially tiled file qualify for
    tiled sorting.

    ``with_aux``: also return the accumulated merge statistics (the
    ``(batch, aux)`` form), letting callers fold further partials in.
    """
    import jax.numpy as jnp

    from ..ops.voxel import voxel_downsample
    from ..ops.voxel_merge import merge_voxel_batches

    bounds = streaming_bounds(path, chunk_points)
    if bounds is None:
        raise ValueError("empty input")
    gmin = jnp.asarray(bounds.min, jnp.float32)

    def trim(part, aux, cap):
        """Slice accumulator columns to ``cap`` rows (valid voxels form a
        prefix; rows beyond carry the invalid key / zero counts)."""
        data = {n: c[:cap] for n, c in part.data.items()}
        a = {"keys": tuple(k[:cap] for k in aux["keys"]),
             "counts": aux["counts"][:cap],
             "mode_counts": {n: c[:cap]
                             for n, c in aux["mode_counts"].items()},
             "raw_means": {n: c[:cap]
                           for n, c in aux.get("raw_means", {}).items()}}
        return PointBatch(data, part.count, part.schema, part.meta), a

    acc = None
    for batch in stream_batches(path, chunk_points):
        part, aux = voxel_downsample(batch, leaf_size, bounds=(gmin, None),
                                     semantics=semantics,
                                     grid_bits=grid_bits, with_aux=True,
                                     **voxel_kwargs)
        if acc is None:
            acc = (part, aux)
            continue
        merged = merge_voxel_batches([acc, (part, aux)],
                                     policies=voxel_kwargs.get("policies"))
        # geometric capacity schedule: O(log) distinct program shapes
        nv = int(merged[0].count)
        cap = merged[0].data[next(iter(merged[0].data))].shape[0]
        want = chunk_points
        while want < nv:
            want <<= 1
        acc = trim(*merged, min(want, cap))
    if acc is None:
        raise ValueError("empty input")
    if with_aux:
        return acc
    return acc[0]
