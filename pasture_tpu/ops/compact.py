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

__all__ = ["compact_columns", "pack_int_columns", "unpack_int_columns"]


def pack_int_columns(cols: Sequence[jnp.ndarray]):
    """Greedily pack narrow (<=16-bit) integer 1-D columns into shared u32
    words so fewer streams ride a shift ladder or sort.  Returns
    ``(packed_cols, plan)``; feed ``plan`` to :func:`unpack_int_columns`.
    Wide/float columns pass through untouched."""
    words: List = []      # u32 accumulator columns
    word_bits: List[int] = []
    out_cols: List = []
    plan = []             # per input: ("pass", out_idx) | ("packed", word_idx, shift, width, dtype)
    word_index: dict = {}
    for c in cols:
        w = jnp.dtype(c.dtype).itemsize * 8
        if not (jnp.issubdtype(c.dtype, jnp.integer) and c.ndim == 1
                and w <= 16):
            plan.append(("pass", len(out_cols)))
            out_cols.append(c)
            continue
        slot = next((i for i, b in enumerate(word_bits) if b + w <= 32),
                    None)
        if slot is None:
            words.append(jnp.zeros(c.shape, jnp.uint32))
            word_bits.append(0)
            slot = len(words) - 1
        shift = word_bits[slot]
        bits = c.astype(jnp.uint32) & jnp.uint32((1 << w) - 1)
        words[slot] = words[slot] | (bits << shift)
        word_bits[slot] += w
        plan.append(("packed", slot, shift, w, jnp.dtype(c.dtype)))
    return out_cols + words, (plan, len(out_cols))


def unpack_int_columns(cols: Sequence[jnp.ndarray], plan_info) -> List:
    plan, n_pass = plan_info
    out = []
    for entry in plan:
        if entry[0] == "pass":
            out.append(cols[entry[1]])
            continue
        _, slot, shift, w, dtype = entry
        u = (cols[n_pass + slot] >> jnp.uint32(shift)) & jnp.uint32(
            (1 << w) - 1)
        if jnp.issubdtype(dtype, jnp.signedinteger):
            sb = jnp.int32(1 << (w - 1))
            out.append(((u.astype(jnp.int32) ^ sb) - sb).astype(dtype))
        else:
            out.append(u.astype(dtype))
    return out


def _cumsum_jump(x: jnp.ndarray) -> jnp.ndarray:
    """Inclusive prefix sum via Hillis-Steele jump steps (see segscan.py for
    why not ``jnp.cumsum``: pathological compile times on the TPU backend)."""
    n = x.shape[0]
    d = 1
    while d < n:
        x = x + jnp.concatenate([jnp.zeros((d,), x.dtype), x[:-d]])
        d <<= 1
    return x


def _cumsum_blocked(x: jnp.ndarray) -> jnp.ndarray:
    """Inclusive prefix sum of an int32 array in TWO data passes instead of
    log2(N): reshape to (rows, 128) lanes, compute each row's prefix with
    ONE lower-triangular matmul on the MXU (f32 is exact for sums < 2^24),
    then add jump-scanned row offsets.  Falls back to the jump ladder for
    small or oddly-sized inputs."""
    n = x.shape[0]
    if n % 128 != 0 or n <= 4096 or n >= (1 << 24):
        return _cumsum_jump(x)
    rows = x.reshape(-1, 128).astype(jnp.float32)
    lt = jnp.tril(jnp.ones((128, 128), jnp.float32))
    row_inc = rows @ lt.T          # row_inc[r, j] = sum(rows[r, :j+1])
    row_tot = row_inc[:, -1]
    offs = _cumsum_jump(row_tot) - row_tot  # exclusive row offsets
    return (row_inc + offs[:, None]).astype(jnp.int32).reshape(-1)


def compact_columns(cols: Sequence[jnp.ndarray], keep: jnp.ndarray
                    ) -> Tuple[List[jnp.ndarray], jnp.ndarray]:
    """Compact 1-D ``cols`` so rows with ``keep`` move to the front in
    order.  Returns (compacted columns, kept count).  Rows past the kept
    count hold unspecified values."""
    n = keep.shape[0]
    rank_incl = _cumsum_blocked(keep.astype(jnp.int32))
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
