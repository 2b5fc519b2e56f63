"""Halo exchange: ring-style neighbour block exchange over the mesh.

After :func:`~pasture_tpu.parallel.partition.morton_partition` each device
owns a contiguous Morton range; spatially adjacent ranges live on
neighbouring devices.  Neighbourhood ops (k-NN, normals, ICP
correspondence) near a block boundary need points from those neighbours:
``halo_exchange`` ships each shard's first/last ``halo`` rows to its ring
neighbours with ``ppermute`` — the context-parallel / ring-attention analog
for the point axis (SURVEY.md §5 mapping).

Two entry points:

* :func:`halo_exchange` — standalone (wraps its own ``shard_map``);
* :func:`halo_exchange_local` — the per-shard body, for calling INSIDE an
  enclosing ``shard_map`` (how
  :func:`~pasture_tpu.parallel.distributed.distributed_icp_partitioned`
  consumes it: one shard_map runs partition-aware ICP with the halo rows
  exchanged in the same program, so XLA overlaps the ppermute with local
  compute).
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from ..buffers.device import PointBatch
from .mesh import POINTS_AXIS, batch_sharding

__all__ = ["halo_exchange", "halo_exchange_local"]


def halo_exchange_local(data: Dict[str, jnp.ndarray], count: jnp.ndarray,
                        n_shards: int, halo: int, axis: str = POINTS_AXIS
                        ) -> Tuple[Dict[str, jnp.ndarray], jnp.ndarray]:
    """Per-shard halo exchange body — call inside ``shard_map``.

    ``data``: this shard's columns (valid prefix of ``count`` rows).
    Returns ``(halo_cols, halo_counts)``: ``2*halo`` rows per column — the
    last ``halo`` valid rows of the left ring neighbour, then the first
    ``halo`` valid rows of the right — and ``halo_counts = (left_n,
    right_n)`` validity counts for them.
    """
    per = next(iter(data.values())).shape[0]
    fwd = [(i, (i + 1) % n_shards) for i in range(n_shards)]   # to right
    bwd = [(i, (i - 1) % n_shards) for i in range(n_shards)]   # to left

    head_n = jnp.minimum(count, halo)
    tail_n = jnp.minimum(count, halo)
    tail_start = jnp.maximum(count - halo, 0)

    halo_cols = {}
    for name, v in data.items():
        head = v[:halo]
        # tail: rows [tail_start, tail_start + halo) via a static-size
        # dynamic slice (clamped; masked by tail_n)
        tail = jax.lax.dynamic_slice_in_dim(
            v, jnp.clip(tail_start, 0, per - halo), halo, axis=0)
        # my tail -> right neighbour's LEFT halo;
        # my head -> left neighbour's RIGHT halo
        left_recv = jax.lax.ppermute(tail, axis, fwd)
        right_recv = jax.lax.ppermute(head, axis, bwd)
        halo_cols[name] = jnp.concatenate([left_recv, right_recv], axis=0)
    left_cnt = jax.lax.ppermute(tail_n, axis, fwd)
    right_cnt = jax.lax.ppermute(head_n, axis, bwd)
    return halo_cols, jnp.stack([left_cnt, right_cnt])


def halo_exchange(batch: PointBatch, per_shard_counts: jnp.ndarray,
                  mesh: Mesh, halo: int, axis: str = POINTS_AXIS
                  ) -> Tuple[Dict[str, jnp.ndarray], jnp.ndarray]:
    """Exchange boundary rows with ring neighbours.

    ``batch`` is points-sharded with per-shard valid prefixes (the
    morton_partition layout).  Each shard receives up to ``halo`` rows from
    the *end* of its left neighbour's valid prefix and up to ``halo`` rows
    from the *start* of its right neighbour — the spatially closest foreign
    points along the Morton curve.

    Returns ``(halo_columns, halo_counts)``: per shard, ``2*halo`` rows per
    column (left halo then right halo, zero-padded) and an (n_shards, 2)
    count array; globally the columns are (n_shards*2*halo, ...) sharded
    over ``axis``.
    """
    n_shards = mesh.shape[axis]
    shardings = batch_sharding(mesh, batch, axis)
    data_specs = {k: s.spec for k, s in shardings.data.items()}

    def shard_fn(data, counts):
        halo_cols, halo_counts = halo_exchange_local(
            data, counts[0], n_shards, halo, axis)
        return halo_cols, halo_counts[None, :]

    out_specs_data = {k: P(axis, *[None] * (v.ndim - 1))
                      for k, v in batch.data.items()}
    halo_cols, halo_counts = shard_map(
        shard_fn, mesh=mesh,
        in_specs=(data_specs, P(axis)),
        out_specs=(out_specs_data, P(axis, None)),
        check_vma=False)(batch.data, per_shard_counts.astype(jnp.int32))
    return halo_cols, halo_counts
