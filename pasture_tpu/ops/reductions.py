"""Masked and segmented reductions.

Device-side equivalents of pasture's reduction loops: ``minmax_attribute``
(reference: pasture-algorithms/src/minmax.rs:13-52), ``calculate_bounds``
(bounds.rs:12-100) and the per-voxel centroid reductions
(voxel_grid.rs:168-441).  Everything is static-shaped: a batch is padded to
capacity and reductions mask out the invalid tail; segmented ops take a
per-point segment id and a static segment capacity.

NaN semantics match the reference's ``MinMax`` trait (minmax.rs): plain
``<``/``>`` comparisons, so NaNs never win — i.e. NaN-ignoring min/max.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

__all__ = [
    "masked_min", "masked_max", "masked_minmax", "batch_bounds",
    "segment_sum", "segment_min", "segment_max", "segment_mean",
    "segment_mode",
]


def _identity(dtype, for_min: bool):
    """Neutral element so padded rows never win a min/max."""
    if jnp.issubdtype(dtype, jnp.floating):
        return jnp.asarray(jnp.inf if for_min else -jnp.inf, dtype)
    info = jnp.iinfo(dtype)
    return jnp.asarray(info.max if for_min else info.min, dtype)


def _apply_mask(x: jnp.ndarray, mask: jnp.ndarray, fill) -> jnp.ndarray:
    m = mask
    while m.ndim < x.ndim:
        m = m[..., None]
    return jnp.where(m, x, fill)


def masked_min(x: jnp.ndarray, mask: jnp.ndarray, axis=0) -> jnp.ndarray:
    """Min over valid rows; NaN-ignoring for floats (minmax.rs semantics)."""
    filled = _apply_mask(x, mask, _identity(x.dtype, True))
    if jnp.issubdtype(x.dtype, jnp.floating):
        filled = jnp.where(jnp.isnan(filled), jnp.inf, filled)
    return jnp.min(filled, axis=axis)


def masked_max(x: jnp.ndarray, mask: jnp.ndarray, axis=0) -> jnp.ndarray:
    """Max over ``axis`` ignoring masked-out rows and NaNs (the
    NaN-skipping float semantics of the reference's minmax,
    algorithms/minmax.rs)."""
    filled = _apply_mask(x, mask, _identity(x.dtype, False))
    if jnp.issubdtype(x.dtype, jnp.floating):
        filled = jnp.where(jnp.isnan(filled), -jnp.inf, filled)
    return jnp.max(filled, axis=axis)


def masked_minmax(x: jnp.ndarray, mask: jnp.ndarray
                  ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(min, max) per component over valid rows — device analog of
    ``minmax_attribute`` (minmax.rs:13-52)."""
    return masked_min(x, mask), masked_max(x, mask)


def batch_bounds(positions: jnp.ndarray, mask: jnp.ndarray
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """AABB (min, max) of POSITION_3D — device ``calculate_bounds``
    (bounds.rs:12-100)."""
    return masked_minmax(positions, mask)


# ---- segmented ops -------------------------------------------------------------

def segment_sum(x: jnp.ndarray, segment_ids: jnp.ndarray, num_segments: int,
                indices_are_sorted: bool = True) -> jnp.ndarray:
    """Per-segment sum (thin jax.ops wrapper; prefer the sorted-segment
    jump scans of :mod:`pasture_tpu.ops.segscan` in hot paths — XLA
    lowers scatter-based segment reductions to element loops on TPU)."""
    return jax.ops.segment_sum(x, segment_ids, num_segments,
                               indices_are_sorted=indices_are_sorted)


def segment_min(x: jnp.ndarray, segment_ids: jnp.ndarray, num_segments: int,
                indices_are_sorted: bool = True) -> jnp.ndarray:
    """Per-segment min (see :func:`segment_sum` for the TPU caveat)."""
    return jax.ops.segment_min(x, segment_ids, num_segments,
                               indices_are_sorted=indices_are_sorted)


def segment_max(x: jnp.ndarray, segment_ids: jnp.ndarray, num_segments: int,
                indices_are_sorted: bool = True) -> jnp.ndarray:
    """Per-segment max (see :func:`segment_sum` for the TPU caveat)."""
    return jax.ops.segment_max(x, segment_ids, num_segments,
                               indices_are_sorted=indices_are_sorted)


def segment_mean(x: jnp.ndarray, segment_ids: jnp.ndarray, num_segments: int,
                 counts: Optional[jnp.ndarray] = None,
                 acc_dtype=jnp.float32) -> jnp.ndarray:
    """Per-segment mean, accumulated in ``acc_dtype``.

    The reference's ``centroid_average_vec``/``_num`` (voxel_grid.rs:333-441)
    accumulate in f64; on TPU the default accumulator is f32 (the host-exact
    algorithms layer uses f64 on CPU)."""
    xs = x.astype(acc_dtype)
    sums = segment_sum(xs, segment_ids, num_segments)
    if counts is None:
        counts = segment_sum(jnp.ones(x.shape[0], acc_dtype), segment_ids,
                             num_segments)
    denom = jnp.maximum(counts, 1).astype(acc_dtype)
    while denom.ndim < sums.ndim:
        denom = denom[..., None]
    return sums / denom


def segment_mode(values: jnp.ndarray, segment_ids: jnp.ndarray,
                 num_segments: int) -> jnp.ndarray:
    """Per-segment most-common value ("mode") for integer-valued columns.

    Device form of ``centroid_most_common`` (voxel_grid.rs:218-330).  The
    reference's HashMap iteration breaks count ties nondeterministically; we
    deterministically pick the *smallest* value among the tied ones.

    Requires ``segment_ids`` sorted ascending (rows of the same segment
    contiguous).  Runs in O(n log n): sort (segment, value) pairs, run-length
    encode, then two segmented extrema.
    """
    n = values.shape[0]
    v = values.astype(jnp.int32)
    # sort values within segments (segment_ids already sorted, stable sort
    # by value with segment as primary key keeps segments contiguous)
    seg_sorted, val_sorted = jax.lax.sort((segment_ids.astype(jnp.int32), v),
                                          num_keys=2)
    # run-length encode equal (segment, value) pairs
    first = jnp.concatenate([
        jnp.ones((1,), jnp.int32),
        ((seg_sorted[1:] != seg_sorted[:-1])
         | (val_sorted[1:] != val_sorted[:-1])).astype(jnp.int32)])
    run_id = jnp.cumsum(first) - 1                      # 0..num_runs-1
    run_len = segment_sum(jnp.ones(n, jnp.int32), run_id, n)
    # representative (segment, value) of each run
    run_seg = jax.ops.segment_max(seg_sorted, run_id, n)
    run_val = jax.ops.segment_max(val_sorted, run_id, n)
    # empty runs (tail padding of the run arrays) must never win
    valid_run = run_len > 0
    run_seg = jnp.where(valid_run, run_seg, num_segments)
    run_seg_c = jnp.clip(run_seg, 0, num_segments - 1).astype(jnp.int32)
    ok = valid_run & (run_seg < num_segments)
    # max run length per segment
    best_len = jax.ops.segment_max(jnp.where(ok, run_len, -1), run_seg_c,
                                   num_segments, indices_are_sorted=True)
    # smallest value among runs achieving the max length
    is_best = ok & (run_len == best_len[run_seg_c])
    big = jnp.iinfo(jnp.int32).max
    mode = jax.ops.segment_min(jnp.where(is_best, run_val, big), run_seg_c,
                               num_segments, indices_are_sorted=True)
    return mode
