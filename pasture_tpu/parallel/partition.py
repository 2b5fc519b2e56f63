"""Morton-keyed spatial repartitioning across the mesh.

Neighbourhood ops (k-NN, ICP correspondence, per-block normals) want points
that are spatially close to live on the same device.  ``morton_partition``
redistributes a points-sharded batch so device ``d`` owns the ``d``-th
contiguous range of the global Morton curve:

1. per shard: Morton keys from a globally-agreed grid (pmin bounds);
2. global histogram over the top Morton bits (psum) -> equal-mass splitters;
3. ``all_to_all`` exchange with a fixed per-destination capacity
   (static shapes; overflow points are dropped and reported, never silently
   — the capacity factor is caller-controlled).

This is the TPU-native stand-in for the absent distributed layer of the
reference (SURVEY.md §2.5 mapping (c)).
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..buffers.device import PointBatch
from ..layout import attributes as att
from ..math.morton import morton_encode_dual32
from ..ops.reductions import batch_bounds
from .mesh import POINTS_AXIS, batch_sharding

__all__ = ["morton_partition", "MortonPartitionSpec"]


class MortonPartitionSpec(NamedTuple):
    """The splitters of one partition run: a global grid (``gmin``,
    ``extent``) plus the bucket->shard map.  Pass it back into
    :func:`morton_partition` to co-partition a second cloud onto the SAME
    Morton ranges (scan-to-map: partition the map, then partition each scan
    with the map's spec so shard ``d`` holds spatially coincident blocks of
    both clouds)."""

    gmin: jnp.ndarray            # (3,) f32/f64 — global grid origin
    extent: jnp.ndarray          # (3,) — global grid extent
    dest_of_bucket: jnp.ndarray  # (4096,) i32 — top-bits bucket -> shard

_HIST_BITS = 12  # histogram over the top 12 Morton bits (4096 buckets)


def _morton_hi_bucket(pos, mask, gmin, extent, axis):
    """Bucket index from the top _HIST_BITS of the (hi, lo) Morton key."""
    cell = jnp.clip(((pos - gmin[None, :]) / extent[None, :])
                    * (1 << 20), 0, (1 << 20) - 1).astype(jnp.int32)
    hi, lo = morton_encode_dual32(cell[:, 0], cell[:, 1], cell[:, 2])
    # hi holds morton bits 30..59 of the 60-bit key; take its top bits
    bucket = (hi >> jnp.uint32(30 - _HIST_BITS)).astype(jnp.int32)
    bucket = jnp.clip(bucket, 0, (1 << _HIST_BITS) - 1)
    return jnp.where(mask, bucket, (1 << _HIST_BITS) - 1), (hi, lo)


def morton_partition(batch: PointBatch, mesh: Mesh,
                     axis: str = POINTS_AXIS,
                     capacity_factor: float = 2.0,
                     spec: Optional[MortonPartitionSpec] = None,
                     return_spec: bool = False,
                     sort_local: bool = False):
    """Repartition so each device owns a contiguous Morton range.

    Returns ``(partitioned batch, per_shard_counts, per_shard_dropped)``;
    the batch stays sharded over ``axis``, each shard's valid prefix = its
    Morton block.  ``per_shard_dropped[d]`` counts points shard ``d`` could
    not send because a destination's ``slot = capacity_factor * per / n``
    budget overflowed — callers must check ``dropped.sum() == 0`` (or raise
    ``capacity_factor``); the pipeline wrappers assert this for you.
    The slot budget is per (source, destination) PAIR: input that is
    already spatially sorted concentrates each shard's sends on one
    destination and needs ``capacity_factor`` up to ``n_shards`` (randomly
    ordered input spreads sends evenly and 2.0 is ample).

    ``spec``: reuse the splitters of a previous run (co-partitioning, see
    :class:`MortonPartitionSpec`) instead of computing equal-mass splitters
    from this batch.  ``return_spec``: also return this run's
    :class:`MortonPartitionSpec` as a fourth element.  ``sort_local``:
    additionally sort each shard's block by Morton key, so the valid
    prefix's first/last rows are the block's key-extremal boundary rows —
    required by consumers of :func:`~pasture_tpu.parallel.halo
    .halo_exchange` (boundary slabs are only meaningful on sorted blocks).

    Example — 512 points over a 4-device mesh, nothing dropped, every
    point accounted for:

    >>> import numpy as np
    >>> from pasture_tpu.buffers.device import PointBatch
    >>> from pasture_tpu.buffers.host import HostPointBuffer
    >>> from pasture_tpu.layout import attributes as att
    >>> from pasture_tpu.layout.dtypes import DevicePolicy
    >>> from pasture_tpu.layout.schema import PointSchema
    >>> from pasture_tpu.parallel import (make_mesh, morton_partition,
    ...                                   shard_batch)
    >>> rng = np.random.default_rng(0)
    >>> schema = PointSchema.from_attributes([att.POSITION_3D])
    >>> host = HostPointBuffer.from_columns(schema, {
    ...     att.POSITION_3D.name: rng.uniform(0, 8, (512, 3))})
    >>> mesh = make_mesh(4)
    >>> batch = shard_batch(PointBatch.from_host(
    ...     host, policy=DevicePolicy.NARROW, capacity=512), mesh)
    >>> part, counts, dropped = morton_partition(batch, mesh,
    ...                                          capacity_factor=4.0)
    >>> int(np.asarray(counts).sum()), int(np.asarray(dropped).sum())
    (512, 0)
    """
    n_shards = mesh.shape[axis]
    per = batch.capacity // n_shards
    cap_out = int(per * capacity_factor)
    # per-destination send slots
    slot = (cap_out + n_shards - 1) // n_shards

    shardings = batch_sharding(mesh, batch, axis)
    data_specs = {k: s.spec for k, s in shardings.data.items()}

    def shard_fn(data, count, *spec_in):
        pos = data[att.POSITION_3D.name]
        idx = jax.lax.axis_index(axis)
        offset = idx.astype(jnp.int32) * per
        local_count = jnp.clip(count - offset, 0, per)
        mask = jnp.arange(per, dtype=jnp.int32) < local_count

        if spec_in:
            gmin, extent, dest_of_bucket = spec_in
            bucket, (hi, lo) = _morton_hi_bucket(pos, mask, gmin, extent,
                                                 axis)
        else:
            lmin, lmax = batch_bounds(pos, mask)
            gmin = jax.lax.pmin(lmin, axis)
            gmax = jax.lax.pmax(lmax, axis)
            # ISOTROPIC cells (same metres-per-cell on every axis):
            # per-axis normalisation would stretch a thin axis (e.g. a
            # survey's z) across the full cell range, shredding the
            # curve's spatial locality — the property every consumer
            # (halo neighbourhoods, tiled voxel sorts, window k-NN)
            # relies on.  Equal-mass splitters are unaffected.
            extent = jnp.broadcast_to(
                jnp.maximum(jnp.max(gmax - gmin), 1e-9), (3,))

            bucket, (hi, lo) = _morton_hi_bucket(pos, mask, gmin, extent,
                                                 axis)
            hist = jnp.zeros((1 << _HIST_BITS,), jnp.int32).at[bucket].add(
                mask.astype(jnp.int32))
            ghist = jax.lax.psum(hist, axis)

            # equal-mass splitters: destination shard per bucket
            csum = jnp.cumsum(ghist)
            total = jnp.maximum(csum[-1], 1)
            dest_of_bucket = jnp.clip(
                ((csum - ghist // 2) * n_shards) // total, 0, n_shards - 1
            ).astype(jnp.int32)
        dest = dest_of_bucket[bucket]
        dest = jnp.where(mask, dest, n_shards)  # invalid -> nowhere

        # pack up to `slot` points per destination (static shape):
        # sort by destination, rank within group via a cummax of group starts
        out_cols = {}
        order = jnp.argsort(dest, stable=True)
        dest_sorted = dest[order]
        arange = jnp.arange(per, dtype=jnp.int32)
        first = jnp.concatenate([
            jnp.ones((1,), bool), dest_sorted[1:] != dest_sorted[:-1]])
        group_start = jax.lax.associative_scan(
            jnp.maximum, jnp.where(first, arange, 0))
        pos_in_group = arange - group_start
        valid_send = (dest_sorted < n_shards) & (pos_in_group < slot)
        # invalid rows get out-of-bounds indices so mode="drop" discards them
        row = jnp.where(valid_send, dest_sorted, n_shards)
        col = jnp.where(valid_send, pos_in_group, slot)
        sent_counts = jnp.zeros((n_shards,), jnp.int32).at[row].add(
            valid_send.astype(jnp.int32), mode="drop")
        dropped = local_count - jnp.sum(valid_send.astype(jnp.int32))

        for name, v in data.items():
            shape = (n_shards, slot) + v.shape[1:]
            buf = jnp.zeros(shape, v.dtype)
            vv = v[order]
            buf = buf.at[row, col].set(vv, mode="drop")
            out_cols[name] = buf

        # exchange: after all_to_all, shard d holds the (n_shards, slot)
        # block of points destined for it
        recv_counts = jax.lax.all_to_all(
            sent_counts[:, None], axis, 0, 0, tiled=False)[:, 0]
        recv = {
            name: jax.lax.all_to_all(buf, axis, 0, 0, tiled=False)
            for name, buf in out_cols.items()
        }
        # compact each source block's valid prefix into one buffer
        new_cols = {}
        src_idx = jnp.repeat(jnp.arange(n_shards, dtype=jnp.int32), slot)
        within = jnp.tile(jnp.arange(slot, dtype=jnp.int32), n_shards)
        keep = within < recv_counts[src_idx]
        dest_pos = jnp.cumsum(keep.astype(jnp.int32)) - 1
        new_count = jnp.sum(recv_counts)
        for name, buf in recv.items():
            flat = buf.reshape((n_shards * slot,) + buf.shape[2:])
            out = jnp.zeros((cap_out,) + buf.shape[2:], buf.dtype)
            rowt = jnp.where(keep, dest_pos, cap_out)
            out = out.at[rowt].set(flat, mode="drop")
            new_cols[name] = out
        if sort_local:
            # Morton-sort the received block so its first/last valid rows
            # are the key-extremal boundary rows (halo_exchange contract).
            posn = new_cols[att.POSITION_3D.name]
            maskn = jnp.arange(cap_out, dtype=jnp.int32) < new_count
            _, (hi2, lo2) = _morton_hi_bucket(posn, maskn, gmin, extent,
                                              axis)
            big = jnp.uint32(0xFFFFFFFF)
            hi2 = jnp.where(maskn, hi2, big)
            lo2 = jnp.where(maskn, lo2, big)
            order = jnp.argsort(lo2, stable=True)
            order = order[jnp.argsort(hi2[order], stable=True)]
            new_cols = {k: v[order] for k, v in new_cols.items()}
        return (new_cols, new_count[None], dropped[None],
                gmin, extent, dest_of_bucket)

    out_specs_data = {k: P(axis, *[None] * (v.ndim - 1))
                      for k, v in batch.data.items()}
    spec_args = tuple(spec) if spec is not None else ()
    spec_in_specs = (P(), P(), P()) if spec is not None else ()
    new_data, counts, dropped, gmin, extent, dob = shard_map(
        shard_fn, mesh=mesh,
        in_specs=(data_specs, P()) + spec_in_specs,
        out_specs=(out_specs_data, P(axis), P(axis), P(), P(), P()),
        check_vma=False)(batch.data, batch.count, *spec_args)
    total = jnp.sum(counts).astype(jnp.int32)
    out_batch = PointBatch(new_data, total, batch.schema, batch.meta)
    if return_spec:
        return out_batch, counts, dropped, MortonPartitionSpec(
            gmin, extent, dob)
    return out_batch, counts, dropped
