"""Segmented scans — gather/scatter-free segmented reductions.

TPU rationale: XLA lowers ``segment_sum``-style scatters and large gathers
to element-at-a-time loops (measured ~250ms for 4M rows on v5e), while
sorts and shift/select passes stream through HBM.  All segmented
reductions in the voxel pipeline therefore run as *reverse segmented
scans* over sorted, contiguous segments: the segment total lands on the
segment's FIRST row, and a staged-shift compaction (ops/compact.py) moves
those first rows to the front — never indexing by computed positions.

Implementation: Hillis-Steele jump scans (steps d = 1, 2, 4, ... of
shift/compare/select/add) inside a ``lax.while_loop`` that EXITS as soon
as every row is "blocked" (a segment start lies within (i, i+d]), i.e.
after ``ceil(log2(max segment length))`` steps instead of ``log2(N)``.
Real point clouds have short voxel segments (a handful of points), so
this turns a 22-pass ladder into a 2-5 pass one (measured: the mean
reductions of the 4M-row bench drop from 8.9ms to ~2ms).  Shifts use a
concat + ``lax.dynamic_slice`` (dynamic start, static size) because the
step size is now a traced value.

``jax.lax.associative_scan`` with a custom combiner and native ``cumsum``
compile pathologically slowly on the tunneled TPU backend (>25 min for
one 4M-row program, measured); slice/select/add formulations compile in
seconds.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import jax.numpy as jnp
from jax import lax

__all__ = ["seg_totals_sum", "seg_totals_max", "seg_totals_lexmax2",
           "seg_totals_top2_max", "seg_totals_top2_lexmax2"]


def _dshift_up(x: jnp.ndarray, d: jnp.ndarray, fill) -> jnp.ndarray:
    """x[i+d] with ``fill`` past the end; ``d`` may be a traced scalar."""
    n = x.shape[0]
    pad = jnp.full((n,) + x.shape[1:], fill, x.dtype)
    return lax.dynamic_slice_in_dim(jnp.concatenate([x, pad]), d, n)


def _match_vma(ref: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """No-op select making ``x`` depend on ``ref``: under ``shard_map``,
    while_loop carries must have consistent varying manual axes, and
    constant-valued columns (e.g. the all-ones counts column) would
    otherwise enter the carry as unvarying.  XLA folds select(p, x, x)
    away at compile time."""
    r = ref.reshape(ref.shape + (1,) * (x.ndim - ref.ndim))
    return jnp.where(jnp.broadcast_to(r, x.shape), x, x)


def _ladder_while(first: jnp.ndarray, cols, combine, fills) -> List:
    """Run ``cols = combine(cols, shifted_cols, ok)`` for d = 1, 2, 4...
    until every row is blocked (or d >= n).  ``cols`` is a sequence;
    ``combine`` receives equal-length tuples plus the ``ok`` mask;
    ``fills`` are the per-column shift-in values."""
    n = first.shape[0]
    cols = [_match_vma(first, c) for c in cols]
    blocked0 = jnp.concatenate([first[1:], jnp.ones((1,), bool)])
    fills = tuple(fills)

    def cond(state):
        d, blocked, _ = state
        return (d < n) & ~jnp.all(blocked)

    def body(state):
        d, blocked, cols = state
        ok = ~blocked
        shifted = tuple(_dshift_up(c, d, f) for c, f in zip(cols, fills))
        cols = combine(cols, shifted, ok)
        blocked = blocked | _dshift_up(blocked, d, True)
        return (d * 2, blocked, cols)

    _, _, out = lax.while_loop(
        cond, body, (jnp.asarray(1, jnp.int32), blocked0, tuple(cols)))
    return list(out)


def seg_totals_sum(vals, first: jnp.ndarray):
    """Per-segment sums, landed on first-of-segment rows.

    ``vals`` is an (N,) array, an (N, C) array, or a LIST of (N,) arrays
    (preferred on TPU: 1-D arrays use the full 128-lane vector layout,
    while an (N, small-C) array pads C to 128 lanes — measured 20ms vs
    ~0.5ms/column for 4M rows).  Lists share one blocked-flag ladder.
    """
    single = not isinstance(vals, (list, tuple))
    cols = [vals] if single else list(vals)

    def combine(cols, shifted, ok):
        return tuple(
            c + jnp.where(ok[(...,) + (None,) * (c.ndim - 1)], s,
                          jnp.zeros_like(s))
            for c, s in zip(cols, shifted))

    out = _ladder_while(first, cols, combine,
                        [jnp.zeros((), c.dtype) for c in cols])
    return out[0] if single else out


def seg_totals_max(vals: jnp.ndarray, first: jnp.ndarray) -> jnp.ndarray:
    """Per-segment max over contiguous segments marked by ``first``
    flags, landed on each segment's first row (reverse jump-scan ladder;
    see module doc for why not scatter-based segment_max)."""
    neutral = (-jnp.inf if jnp.issubdtype(vals.dtype, jnp.floating)
               else jnp.iinfo(vals.dtype).min)

    def combine(cols, shifted, ok):
        (c,), (s,) = cols, shifted
        ok = ok[(...,) + (None,) * (c.ndim - 1)]
        return (jnp.maximum(c, jnp.where(ok, s, jnp.full_like(s, neutral))),)

    return _ladder_while(first, [vals], combine, [neutral])[0]


def seg_totals_top2_max(vals: jnp.ndarray, first: jnp.ndarray
                        ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-segment (largest, second largest) of ``vals``, landed on first
    rows.  The top-2 "semiring" is associative (merging two internally
    sorted pairs: ``max(a1,b1)`` then ``max(min(a1,b1), max(a2,b2))``),
    so it rides the same jump-scan ladder as :func:`seg_totals_max`;
    segments with a single row return ``neutral`` as the second value.
    Used by the mode reduction to carry a RUNNER-UP (value, count) per
    voxel so two-stage merges can out-vote wrong local winners
    (ops/voxel_merge.py)."""
    neutral = (-jnp.inf if jnp.issubdtype(vals.dtype, jnp.floating)
               else jnp.iinfo(vals.dtype).min)

    def combine(cols, shifted, ok):
        a1, a2 = cols
        b1 = jnp.where(ok, shifted[0], neutral)
        b2 = jnp.where(ok, shifted[1], neutral)
        return (jnp.maximum(a1, b1),
                jnp.maximum(jnp.minimum(a1, b1), jnp.maximum(a2, b2)))

    m1, m2 = _ladder_while(first, [vals, jnp.full_like(vals, neutral)],
                           combine, [neutral, neutral])
    return m1, m2


def seg_totals_top2_lexmax2(primary: jnp.ndarray, secondary: jnp.ndarray,
                            first: jnp.ndarray):
    """Per-segment top-2 under the lexicographic (primary, secondary)
    order of :func:`seg_totals_lexmax2`, landed on first rows.  Returns
    ``(p1, s1, p2, s2)``; single-element segments report the neutral
    (min, min) pair as second place."""
    pmin = jnp.iinfo(primary.dtype).min
    smin = jnp.iinfo(secondary.dtype).min

    def lexmax(ap, as_, bp, bs):
        a_wins = (ap > bp) | ((ap == bp) & (as_ >= bs))
        return (jnp.where(a_wins, ap, bp), jnp.where(a_wins, as_, bs),
                jnp.where(a_wins, bp, ap), jnp.where(a_wins, bs, as_))

    def combine(cols, shifted, ok):
        p1, s1, p2, s2 = cols
        q1 = jnp.where(ok, shifted[0], pmin)
        t1 = jnp.where(ok, shifted[1], smin)
        q2 = jnp.where(ok, shifted[2], pmin)
        t2 = jnp.where(ok, shifted[3], smin)
        n1p, n1s, lp, ls = lexmax(p1, s1, q1, t1)      # winner + loser
        m2p, m2s, _, _ = lexmax(p2, s2, q2, t2)        # best runner-up
        n2p, n2s, _, _ = lexmax(lp, ls, m2p, m2s)
        return (n1p, n1s, n2p, n2s)

    return tuple(_ladder_while(
        first,
        [primary, secondary, jnp.full_like(primary, pmin),
         jnp.full_like(secondary, smin)],
        combine, [pmin, smin, pmin, smin]))


def seg_totals_lexmax2(primary: jnp.ndarray, secondary: jnp.ndarray,
                       first: jnp.ndarray
                       ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-segment lexicographic max over (primary, secondary) pairs,
    landed on first rows — the mode-selection primitive (max count, then
    max secondary, i.e. encode tie preference into ``secondary``)."""
    pmin = jnp.iinfo(primary.dtype).min
    smin = jnp.iinfo(secondary.dtype).min

    def combine(cols, shifted, ok):
        p, s = cols
        p2 = jnp.where(ok, shifted[0], pmin)
        s2 = jnp.where(ok, shifted[1], smin)
        cur_wins = (p > p2) | ((p == p2) & (s >= s2))
        return (jnp.where(cur_wins, p, p2), jnp.where(cur_wins, s, s2))

    p, s = _ladder_while(first, [primary, secondary], combine, [pmin, smin])
    return p, s
