"""Device-side predicate filtering (prefix compaction).

TPU-native counterpart of pasture's ``HashMapBuffer::filter`` /
``filter_into`` (reference pasture-core/src/containers/point_buffer.rs:1030-
1120) and the predicate-filter benchmark dimension
(pasture-core/benches/buffer_filter_bench.rs:71-79).

On TPU, compaction by computed destination index is a scatter (measured
~250ms for 4M rows on v5e — see ops/segscan.py); instead the kept rows are
moved to the front by staged power-of-two shifts (ops/compact.py), which
stream at HBM speed (~0.2ms per 4M column) and preserve relative order —
matching the reference's order-preserving filter.
"""

from __future__ import annotations

from typing import Callable, Dict

import jax.numpy as jnp

from ..buffers.device import PointBatch
from .compact import compact_columns
from .voxel import _flatten_cols, _unflatten_cols

__all__ = ["compact_batch", "filter_batch"]


def compact_batch(batch: PointBatch, keep: jnp.ndarray) -> PointBatch:
    """Move rows where ``keep`` is True to the front, in order; ``count``
    becomes the number of kept valid rows.  ``keep`` is a (capacity,) bool
    array; rows past ``batch.count`` are dropped regardless."""
    keep = keep & batch.valid_mask()
    ops, layout = _flatten_cols(batch.data)
    compacted, new_count = compact_columns(ops, keep)
    data = _unflatten_cols(compacted, layout)
    return PointBatch(data, new_count, batch.schema, batch.meta)


def filter_batch(batch: PointBatch,
                 predicate: Callable[[Dict[str, jnp.ndarray]], jnp.ndarray]
                 ) -> PointBatch:
    """Filter by a vectorised predicate over the SoA columns.

    ``predicate`` receives ``batch.data`` (dict of (capacity,[C]) arrays)
    and returns a (capacity,) bool mask — the whole-column analog of the
    reference's per-point ``filter(|point| ...)`` closure."""
    return compact_batch(batch, predicate(batch.data))
