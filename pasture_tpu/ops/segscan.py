"""Segmented scans — gather/scatter-free segmented reductions.

TPU rationale: XLA lowers ``segment_sum``-style scatters and large gathers
to element-at-a-time loops (measured ~250ms for 4M rows on v5e), while
sorts and ``associative_scan`` stream sequentially through HBM.  All
segmented reductions in the voxel pipeline therefore run as *reverse
segmented scans* over sorted, contiguous segments: the segment total lands
on the segment's FIRST row, and a later key-carrying sort compacts those
first rows to the front — never indexing by computed positions.

The combiner is the classic segmented-scan monoid
``(v1,f1) ⊕ (v2,f2) = (f2 ? v2 : v1·v2, f1|f2)`` which is associative for
any associative ``·``.
"""

from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp

__all__ = ["seg_totals_sum", "seg_totals_max", "seg_totals_lexmax2"]


def _rev_flags(first: jnp.ndarray) -> jnp.ndarray:
    """Head flags for the REVERSED scan: the reversed-direction segment
    starts are the original segments' LAST rows, i.e. rows whose successor
    starts a new segment."""
    last = jnp.concatenate([first[1:], jnp.ones((1,), bool)])
    return last[::-1]


def _rev_seg_scan(vals, first, merge):
    """Reverse segmented scan; returns per-row array where each segment's
    FIRST row holds the segment total under ``merge``."""
    flags = _rev_flags(first)
    if vals.ndim > 1:
        flags_b = jnp.broadcast_to(flags[:, None], vals[::-1].shape)
    else:
        flags_b = flags

    def combine(a, b):
        va, fa = a
        vb, fb = b
        return jnp.where(fb, vb, merge(va, vb)), fa | fb

    out, _ = jax.lax.associative_scan(combine, (vals[::-1], flags_b), axis=0)
    return out[::-1]


def seg_totals_sum(vals: jnp.ndarray, first: jnp.ndarray) -> jnp.ndarray:
    """Per-segment sums, landed on first-of-segment rows.  ``vals`` is
    (N,) or (N, C); segments are contiguous runs flagged by ``first``."""
    return _rev_seg_scan(vals, first, lambda a, b: a + b)


def seg_totals_max(vals: jnp.ndarray, first: jnp.ndarray) -> jnp.ndarray:
    return _rev_seg_scan(vals, first, jnp.maximum)


def seg_totals_lexmax2(primary: jnp.ndarray, secondary: jnp.ndarray,
                       first: jnp.ndarray
                       ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-segment lexicographic max over (primary, secondary) pairs,
    landed on first rows — the mode-selection primitive (max count, then
    max secondary, i.e. encode tie preference into ``secondary``)."""
    flags = _rev_flags(first)

    def combine(a, b):
        pa, sa, fa = a
        pb, sb, fb = b
        a_wins = (pa > pb) | ((pa == pb) & (sa >= sb))
        p = jnp.where(a_wins, pa, pb)
        s = jnp.where(a_wins, sa, sb)
        return (jnp.where(fb, pb, p), jnp.where(fb, sb, s), fa | fb)

    p, s, _ = jax.lax.associative_scan(
        combine, (primary[::-1], secondary[::-1], flags), axis=0)
    return p[::-1], s[::-1]
