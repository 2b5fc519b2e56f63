"""Prefix compaction by staged shifts — the sort-free stream compactor.

Moves rows where ``keep`` is True to the front, preserving order, without
sorts, gathers or scatters.  Each kept row's displacement is
``i - rank(i)`` (rank = exclusive count of kept rows before i), which is
non-decreasing in ``i``; processing the displacement bits LSB-first, one
power-of-two shift per stage, never collides (two kept rows can only meet
if their final destinations collided, and destinations are strictly
increasing — verified exhaustively in tests/test_compact.py).

Cost model (measured on v5e, 4M rows): shift/select passes stream at HBM
speed like the jump scans in ops/segscan.py (~0.2ms per column for the
full 22-stage ladder), while every extra ``lax.sort`` operand costs
~1.9ms — so compaction by shifts is ~5-7x cheaper than the unique-key
compaction sort for typical column counts.

Reference semantics mirrored: order-preserving predicate filtering
(pasture-core/src/containers/point_buffer.rs:1030-1120 ``filter``).
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import jax.numpy as jnp
from jax import lax

from .segscan import _dshift_up, _match_vma

__all__ = ["compact_columns"]


def _cumsum_jump(x: jnp.ndarray) -> jnp.ndarray:
    """Inclusive prefix sum via Hillis-Steele jump steps (see segscan.py for
    why not ``jnp.cumsum``: pathological compile times on the TPU backend)."""
    n = x.shape[0]
    d = 1
    while d < n:
        x = x + jnp.concatenate([jnp.zeros((d,), x.dtype), x[:-d]])
        d <<= 1
    return x


def compact_columns(cols: Sequence[jnp.ndarray], keep: jnp.ndarray
                    ) -> Tuple[List[jnp.ndarray], jnp.ndarray]:
    """Compact 1-D ``cols`` so rows with ``keep`` move to the front in
    order.  Returns (compacted columns, kept count).  Rows past the kept
    count hold unspecified values."""
    n = keep.shape[0]
    rank_incl = _cumsum_jump(keep.astype(jnp.int32))
    count = rank_incl[-1]
    dist = jnp.where(keep, jnp.arange(n, dtype=jnp.int32) - (rank_incl - 1),
                     0)
    # staged shifts inside a while_loop exiting once no displacement
    # remains (log2(max displacement) stages, data-adaptive: for a mostly-
    # kept array the ladder is much shorter than log2(N))
    def cond(state):
        s, k, dist, occ, _ = state
        return (s < n) & jnp.any(occ & (dist > 0))

    def body(state):
        s, k, dist, occ, vals = state
        move = occ & (((dist >> k) & 1) == 1)
        inc = _dshift_up(move, s, False)
        vals = tuple(jnp.where(inc, _dshift_up(v, s, jnp.zeros((), v.dtype)),
                               v) for v in vals)
        dist = jnp.where(inc, _dshift_up(dist, s, 0) - s, dist)
        occ = (occ & ~move) | inc
        return (s * 2, k + 1, dist, occ, vals)

    state = (jnp.asarray(1, jnp.int32), jnp.asarray(0, jnp.int32),
             dist, keep, tuple(_match_vma(keep, c) for c in cols))
    _, _, _, _, vals = lax.while_loop(cond, body, state)
    return list(vals), count
