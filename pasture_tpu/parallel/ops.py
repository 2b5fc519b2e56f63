"""Sharded map-style ops over the mesh.

Two styles, both used deliberately:

* **pjit style** (``sharded_bounds``): jit the single-device op over sharded
  inputs and let XLA insert the collectives — right for pure reductions.
* **shard_map style** (``sharded_voxel_downsample``): explicit per-shard
  compute + collective merge — right when the op has a natural two-stage
  decomposition (local voxelize, then merge voxel statistics), which keeps
  the expensive sort local to each device and reduces only voxel
  *statistics* over ICI.

The two-stage voxel merge (``sharded_voxel_downsample`` ``with_aux=True``
+ :func:`~pasture_tpu.ops.merge_voxel_batches`, or the one-call
:func:`sharded_voxel_downsample_merged`) EXACTLY reproduces the one-shot
global voxelization for the mean/max policies — per-shard partials carry
per-voxel counts and unrounded means, and the merge computes the weighted
mean of means / max of maxes (value-level tests in tests/test_parallel.py).
Mode is EXACT too when the per-shard voxelize carries full run tables
(pass ``mode_runs=True`` through ``voxel_kwargs`` — each shard ships its
per-(voxel, value) histogram and the merge elects the true global mode);
without them it merges by weighted vote over per-shard winners and
runner-ups: exact unless the global mode value ranks third or lower in
every shard that sees it — the documented envelope of ops/voxel_merge.py.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from ..buffers.device import PointBatch
from ..layout import attributes as att
from ..ops.reductions import batch_bounds
from ..ops.voxel import voxel_downsample
from .halo import halo_exchange_local
from .mesh import POINTS_AXIS, batch_sharding
from .partition import morton_partition

__all__ = ["sharded_bounds", "sharded_voxel_downsample",
           "sharded_voxel_downsample_merged",
           "distributed_normals"]


def sharded_bounds(batch: PointBatch, mesh: Mesh,
                   axis: str = POINTS_AXIS
                   ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Global AABB of a sharded batch — pjit style: XLA turns the masked
    min/max into per-shard reductions + an all-reduce over ``axis``."""
    shardings = batch_sharding(mesh, batch, axis)
    rep = NamedSharding(mesh, P())

    @partial(jax.jit, in_shardings=(shardings,), out_shardings=(rep, rep))
    def run(b: PointBatch):
        return batch_bounds(b.data[att.POSITION_3D.name], b.valid_mask())

    return run(batch)


def sharded_voxel_downsample(batch: PointBatch, mesh: Mesh, leaf_size,
                             axis: str = POINTS_AXIS,
                             semantics: str = "floor",
                             per_shard_counts: Optional[jnp.ndarray] = None,
                             with_aux: bool = False,
                             **voxel_kwargs) -> PointBatch:
    """Two-stage distributed voxel downsample.

    Stage 1 (per shard, no communication): Morton-sorted local voxelize.
    Stage 2 (collective): global bounds via pmin so every shard quantizes
    against the same grid origin.  The result keeps per-shard voxel
    centroids sharded in place; a voxel whose points straddle a shard
    boundary appears once per shard.  Callers needing the single globally
    merged result pass ``with_aux=True`` and feed the output to
    :func:`~pasture_tpu.ops.merge_voxel_batches` (or use
    :func:`sharded_voxel_downsample_merged`), which is EXACT for mean/max
    (see module doc).

    Returns ``(batch, per_shard_counts)`` — or ``(batch,
    per_shard_counts, aux)`` with ``with_aux`` — where the batch is
    sharded like the input, each shard's prefix holding its local voxel
    centroids; ``per_shard_counts`` is an (n_shards,) int32 array of
    local voxel counts (the batch's ``count`` is their global sum); and
    ``aux`` holds the sharded per-voxel merge statistics of
    :func:`~pasture_tpu.ops.voxel_downsample` (rows past each shard's
    prefix carry the invalid key, so the global view is directly
    mergeable without masks).

    Extra ``voxel_kwargs`` (``grid_bits``, ``position_quantization_bits``,
    ``sort_tiles`` ...) forward to the per-shard
    :func:`~pasture_tpu.ops.voxel_downsample` — Morton-partitioned shards
    qualify for the tiled/quantized fast paths.
    """
    shardings = batch_sharding(mesh, batch, axis)
    data_specs = {k: s.spec for k, s in shardings.data.items()}
    meta_specs = {k: P() for k in batch.meta}
    n_shards = mesh.shape[axis]
    if per_shard_counts is None:
        # valid rows form one global prefix: derive each shard's slice.
        # After morton_partition, validity is per-shard instead — pass its
        # counts through this parameter.
        per_row = batch.capacity // n_shards
        per_shard_counts = jnp.clip(
            batch.count - jnp.arange(n_shards, dtype=jnp.int32) * per_row,
            0, per_row)

    def shard_fn(data, counts, meta):
        pos = data[att.POSITION_3D.name]
        local_count = counts[0]
        local = PointBatch(dict(data), local_count, batch.schema, dict(meta))
        mask = local.valid_mask()
        lmin, _ = batch_bounds(pos, mask)
        gmin = jax.lax.pmin(lmin, axis)
        out = voxel_downsample(local, leaf_size, bounds=(gmin, None),
                               semantics=semantics, with_aux=with_aux,
                               **voxel_kwargs)
        if with_aux:
            out, aux = out
            if "mode_runs" in aux:
                # the scalar run counters must be rank-1 to shard on the
                # axis (global view: one entry per shard)
                aux["mode_runs"] = {
                    n: {**rt, "num_runs": jnp.reshape(rt["num_runs"], (1,))}
                    for n, rt in aux["mode_runs"].items()}
            return out.data, out.count[None], aux
        return out.data, out.count[None]

    if with_aux:
        # every aux leaf is a per-voxel-row column sharded on axis: the
        # single P(axis) acts as a pytree-prefix spec for the whole subtree
        out_data, counts, aux = shard_map(
            shard_fn, mesh=mesh,
            in_specs=(data_specs, P(axis), meta_specs),
            out_specs=(data_specs, P(axis), P(axis)), check_vma=False)(
            batch.data, per_shard_counts.astype(jnp.int32), batch.meta)
        total = jnp.sum(counts).astype(jnp.int32)
        return (PointBatch(out_data, total, batch.schema, batch.meta),
                counts, aux)

    out_data, counts = shard_map(
        shard_fn, mesh=mesh,
        in_specs=(data_specs, P(axis), meta_specs),
        out_specs=(data_specs, P(axis)), check_vma=False)(
        batch.data, per_shard_counts.astype(jnp.int32), batch.meta)
    total = jnp.sum(counts).astype(jnp.int32)
    return PointBatch(out_data, total, batch.schema, batch.meta), counts


def sharded_voxel_downsample_merged(batch: PointBatch, mesh: Mesh, leaf_size,
                                    axis: str = POINTS_AXIS,
                                    semantics: str = "floor",
                                    per_shard_counts: Optional[jnp.ndarray]
                                    = None,
                                    **voxel_kwargs):
    """Distributed voxelize + EXACT global merge in one call.

    Runs :func:`sharded_voxel_downsample` ``with_aux``, then merges the
    per-shard partials with :func:`~pasture_tpu.ops.merge_voxel_batches`
    — the result's centroid VALUES equal the one-shot single-device
    voxelization for mean/max policies (mode: exact with
    ``mode_runs=True`` in ``voxel_kwargs``, weighted-vote envelope
    otherwise).
    The merge operates on the global view of the sharded arrays (voxel
    statistics, bounded by the voxel count — not raw points); XLA
    inserts the gather/resharding collectives.

    Returns ``(batch, aux)`` in the merged (replicated-logical) layout.
    """
    vox, _, aux = sharded_voxel_downsample(
        batch, mesh, leaf_size, axis=axis, semantics=semantics,
        per_shard_counts=per_shard_counts, with_aux=True, **voxel_kwargs)
    from ..ops.voxel_merge import merge_voxel_batches
    return merge_voxel_batches([(vox, aux)],
                               policies=voxel_kwargs.get("policies"))


def distributed_normals(batch: PointBatch, mesh: Mesh, k: int,
                        window: int = 64,
                        axis: str = POINTS_AXIS,
                        capacity_factor: float = 2.0):
    """Normals + curvature over a mesh-sharded cloud — halo-windowed.

    Morton-partitions the cloud (per-shard blocks SORTED by Morton key,
    :func:`~pasture_tpu.parallel.morton_partition` ``sort_local``), then
    fits each shard's points against its sorted block padded with the
    ring neighbours' ``window`` boundary rows
    (:func:`~pasture_tpu.parallel.halo_exchange_local`) — the per-shard
    twin of :func:`pasture_tpu.algorithms.compute_normals`
    ``method="morton"``, with the halo standing in for the global curve's
    continuation across shard boundaries.  Single curve (the partition's);
    accuracy matches the single-device Morton path's documented envelope.

    Returns ``(part, normals, curvature, counts, dropped)``: ``part`` is
    the partitioned position batch the results align with (row i of shard
    d describes part's row i of shard d; rows beyond ``counts[d]`` are
    garbage), ``normals``/``curvature`` sharded over ``axis``.
    """
    from ..algorithms.normals import window_fit

    pos_name = att.POSITION_3D.name
    pos_only = PointBatch({pos_name: batch.data[pos_name]}, batch.count,
                          batch.schema, {})
    part, counts, dropped = morton_partition(
        pos_only, mesh, axis, capacity_factor, sort_local=True)
    n_shards = mesh.shape[axis]
    w = window
    dtype = part.data[pos_name].dtype

    def shard_fn(pos_s, cnt):
        per = pos_s.shape[0]
        valid = jnp.arange(per, dtype=jnp.int32) < cnt[0]
        halo_cols, halo_counts = halo_exchange_local(
            {pos_name: pos_s}, cnt[0], n_shards, w, axis)
        halo_pos = halo_cols[pos_name]                 # (2w, 3)
        hidx = jnp.arange(w, dtype=jnp.int32)
        left = jnp.where((hidx < halo_counts[0])[:, None],
                         halo_pos[:w], jnp.inf)
        right = jnp.where((hidx < halo_counts[1])[:, None],
                          halo_pos[w:], jnp.inf)
        sp = jnp.where(valid[:, None], pos_s, jnp.inf).astype(dtype)
        pp = jnp.concatenate([left.astype(dtype), sp, right.astype(dtype)])
        normal, curvature, _ = window_fit(sp, pp, k, w)
        return normal, curvature

    normals, curvature = shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P(axis, None), P(axis)),
        out_specs=(P(axis, None), P(axis)),
        check_vma=False)(part.data[pos_name], counts.astype(jnp.int32))
    return part, normals, curvature, counts, dropped
