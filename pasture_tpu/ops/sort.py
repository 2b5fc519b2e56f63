"""Spatial sorting of point batches.

Replaces pasture's sorted-``Vec`` voxel insertion (reference:
pasture-algorithms/src/voxel_grid.rs:130-153, an O(n·v) linear scan + binary
search insert) with one XLA sort over Morton keys — the canonical
sort-based regrouping on accelerators.  Keys are dual-u32 Morton codes
(pasture_tpu.math.morton) so no 64-bit integers are needed on TPU.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp

from ..buffers.device import PointBatch
from ..math.morton import morton_encode_dual32

__all__ = ["sort_by_keys", "morton_sort"]


def sort_by_keys(batch: PointBatch, *keys: jnp.ndarray
                 ) -> Tuple[PointBatch, Tuple[jnp.ndarray, ...], jnp.ndarray]:
    """Sort a batch by one or more u32/i32 key columns (lexicographic).

    Invalid (padded) rows must already carry a key that sorts last.  Returns
    ``(sorted_batch, sorted_keys, permutation)``.
    """
    n = batch.capacity
    iota = jnp.arange(n, dtype=jnp.int32)
    operands = tuple(keys) + (iota,)
    sorted_all = jax.lax.sort(operands, num_keys=len(keys))
    perm = sorted_all[-1]
    sorted_keys = sorted_all[:-1]
    return batch.gather(perm), sorted_keys, perm


def morton_sort(batch: PointBatch, cell_indices: jnp.ndarray
                ) -> Tuple[PointBatch, Tuple[jnp.ndarray, jnp.ndarray], jnp.ndarray]:
    """Sort by the Morton code of integer cell indices ``(N, 3)``.

    Invalid rows should carry the maximal cell index so they sort last."""
    hi, lo = morton_encode_dual32(cell_indices[:, 0], cell_indices[:, 1],
                                  cell_indices[:, 2])
    return sort_by_keys(batch, hi, lo)
