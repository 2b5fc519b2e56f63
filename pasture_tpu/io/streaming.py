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
from functools import partial
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

from functools import lru_cache


@lru_cache(maxsize=64)
def _vox_jit(leaf_size: float, semantics: str, grid_bits: int, vk_key):
    """Jitted per-chunk voxelize, cached by static config so repeated
    streaming runs reuse compiled programs (a fresh lambda per call would
    recompile everything every run)."""
    import jax

    from ..ops.voxel import voxel_downsample
    # 'policies' is the only dict-valued kwarg; it was frozen for hashing
    vk = {k: (dict(v) if k == "policies" and v is not None else v)
          for k, v in vk_key}
    return jax.jit(lambda b, g: voxel_downsample(
        b, leaf_size, bounds=(g, None), semantics=semantics,
        grid_bits=grid_bits, with_aux=True, **vk))


@lru_cache(maxsize=16)
def _merge_trim_jit(policies_key):
    """Jitted merge+trim of two partial voxelizations, cached like
    :func:`_vox_jit`.  Slicing to ``cap`` rows loses nothing while cap >=
    the voxel count (valid voxels form a prefix; rows beyond carry the
    invalid key / zero counts)."""
    import jax

    from ..ops.voxel_merge import merge_voxel_batches
    policies = dict(policies_key) if policies_key else None

    @partial(jax.jit, static_argnames=("cap",))
    def merge_trim(acc, part, cap):
        # mode_runs_cap sizes the merged run tables (exact-mode path) to
        # the same static capacity as the voxel rows; ignored otherwise
        b, a = merge_voxel_batches([acc, part], policies=policies,
                                   mode_runs_cap=cap)
        data = {n: c[:cap] for n, c in b.data.items()}
        # aux is a pytree of per-voxel-row columns — trim generically so
        # new statistics (e.g. the mode runner-up votes) flow through;
        # scalars (the run-table num_runs counters) pass untouched
        import jax.numpy as jnp
        aa = jax.tree.map(
            lambda c: c if jnp.ndim(c) == 0 else c[:cap], a)
        return (PointBatch(data, b.count, b.schema, b.meta), aa)

    return merge_trim


def stream_batches(path: Union[str, Path], chunk_points: int = 1 << 20,
                   schema: Optional[PointSchema] = None,
                   policy: DevicePolicy = DevicePolicy.NARROW,
                   read_ahead: bool = True) -> Iterator[PointBatch]:
    """Yield fixed-capacity device batches of ``chunk_points`` each.

    With ``read_ahead`` the next chunk is parsed AND uploaded to the
    device on a host thread while the caller computes on the current one
    (the async-ingest pattern replacing the reference's sequential reader
    loop; keeping the host->device transfer in the worker matters most on
    tethered/tunneled accelerators, where the upload is the slowest
    stage).  Every batch has capacity ``chunk_points``; the last one is
    padded (check ``batch.count``).
    """
    reader = open_reader(path)

    def read_chunk():
        buf = reader.read(chunk_points, schema=schema)
        if not len(buf):
            return None
        return PointBatch.from_host(buf, policy=policy,
                                    capacity=chunk_points)

    try:
        if not read_ahead:
            while True:
                batch = read_chunk()
                if batch is None:
                    return
                yield batch
        else:
            with ThreadPoolExecutor(max_workers=1) as ex:
                future = ex.submit(read_chunk)
                while True:
                    batch = future.result()
                    if batch is None:
                        return
                    future = ex.submit(read_chunk)
                    yield batch
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
                               bounds: Optional[AABB] = None,
                               use_metadata_bounds: bool = False,
                               schema: Optional[PointSchema] = None,
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
    f32), and mode either EXACTLY (pass ``mode_runs=True`` to carry each
    chunk's full per-(voxel, value) histogram through the fold — the
    accumulator's run tables ride the same geometric capacity schedule,
    truncation-free since runs <= points) or, by default, within the
    documented top-2 weighted-vote envelope (ops/voxel_merge.py — exact
    unless the global mode value ranks third or lower in some chunk,
    losing votes to the carry; measured ~0.06% worst case).  Value-level
    equality is asserted in tests/test_streaming.py.

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

    ``bounds`` / ``use_metadata_bounds``: the grid origin needs the cloud
    minimum, which by default costs a dedicated streaming pass over the
    file.  Pass an :class:`~pasture_tpu.math.AABB` (or set
    ``use_metadata_bounds`` to trust the file header's bounds, which the
    LAS spec requires to be exact) to skip that pass — the single-pass
    shape production pipelines want.

    Example — chunked streaming equals one-shot voxelization:

    >>> import numpy as np, os, tempfile
    >>> from pasture_tpu.buffers.host import HostPointBuffer
    >>> from pasture_tpu.io import write_all
    >>> from pasture_tpu.io.streaming import streaming_voxel_downsample
    >>> from pasture_tpu.layout import attributes as att
    >>> from pasture_tpu.layout.schema import PointSchema
    >>> rng = np.random.default_rng(0)
    >>> buf = HostPointBuffer.from_columns(
    ...     PointSchema.from_attributes([att.POSITION_3D]),
    ...     {att.POSITION_3D.name:
    ...          np.round(rng.uniform(0, 8, (4000, 3)), 3)})
    >>> path = os.path.join(tempfile.mkdtemp(), "cloud.las")
    >>> write_all(buf, path)
    >>> out = streaming_voxel_downsample(path, 1.0, chunk_points=1024,
    ...                                  use_metadata_bounds=True)
    >>> int(out.count)                       # 8^3 cells, all occupied
    512
    """
    import jax.numpy as jnp

    from ..ops.voxel import voxel_downsample
    from ..ops.voxel_merge import merge_voxel_batches

    if bounds is None and use_metadata_bounds:
        reader = open_reader(path)
        try:
            bounds = reader.get_metadata().bounds()
        finally:
            close = getattr(reader, "close", None)
            if close:
                close()
    if bounds is None:
        bounds = streaming_bounds(path, chunk_points)
    if bounds is None:
        raise ValueError("empty input")
    gmin = jnp.asarray(bounds.min, jnp.float32)

    # every per-chunk step is ONE jitted dispatch (on a remote/tunneled
    # accelerator, eager op-by-op execution pays an RPC per primitive and
    # dominates the pipeline), and the jitted callables are CACHED at
    # module level so repeated streaming runs reuse compiled programs
    def freeze(v):
        return tuple(sorted(v.items())) if isinstance(v, dict) else v

    vk_key = tuple(sorted((k, freeze(v)) for k, v in voxel_kwargs.items()))
    vox_fn = _vox_jit(float(leaf_size), semantics, grid_bits, vk_key)
    policies = voxel_kwargs.get("policies")
    merge_trim_fn = _merge_trim_jit(freeze(policies) if policies else None)

    acc = None
    acc_cap = chunk_points
    seen = 0                 # host-known upper bound on accumulated voxels
    for batch in stream_batches(path, chunk_points, schema=schema):
        part = vox_fn(batch, gmin)
        seen += chunk_points
        if acc is None:
            acc = part
            continue
        # geometric capacity schedule, O(log) shapes AND O(log) count
        # fetches: grow only when the host-side points-seen bound says
        # the current capacity might overflow, and then size by the TRUE
        # voxel count (one scalar fetch)
        if seen > acc_cap:
            nv = int(acc[0].count)
            # exact-mode run tables share the capacity schedule: total
            # runs <= total points, and each chunk adds <= chunk_points
            # runs, so sizing by the larger of (voxels, runs) keeps the
            # fold truncation-free.  num_runs is being fetched anyway, so
            # check the inductive invariant (runs fit the current table)
            # right here — truncation mid-fold would otherwise corrupt
            # the histogram before the final backstop assert fires
            for n, rt in acc[1].get("mode_runs", {}).items():
                runs_n = int(rt["num_runs"])
                if runs_n > rt["values"].shape[0]:  # pragma: no cover
                    raise AssertionError(
                        f"mode run table for {n!r} overflowed mid-fold "
                        f"({runs_n} > {rt['values'].shape[0]}) — "
                        "capacity schedule bug")
                nv = max(nv, runs_n)
            want = chunk_points
            while want < nv + chunk_points:
                want <<= 1
            # never beyond the merged length (slicing can't pad)
            acc_cap = min(want, acc_cap + chunk_points)
            seen = nv + chunk_points
        acc = merge_trim_fn(acc, part, acc_cap)
    if acc is None:
        raise ValueError("empty input")
    # backstop for the inductive invariant proven at the growth branch
    # (runs <= points <= seen <= acc_cap) — the per-growth assert above
    # catches a violation mid-fold; this catches one after the last growth
    for n, rt in acc[1].get("mode_runs", {}).items():
        if int(rt["num_runs"]) > rt["values"].shape[0]:  # pragma: no cover
            raise AssertionError(
                f"mode run table for {n!r} overflowed its capacity — "
                "exactness lost (capacity schedule bug)")
    if with_aux:
        return acc
    return acc[0]
