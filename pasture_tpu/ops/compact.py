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

import jax
import jax.numpy as jnp
from jax import lax

from .segscan import _dshift_up, _match_vma

__all__ = ["compact_columns", "pack_int_columns", "unpack_int_columns"]

# probe override for the sequential tile-merge unroll factor (None =
# auto: 8 tiles per fori_loop step, the round-4 measured choice) — see
# benches/reduce_block_probe.py
_MERGE_UNROLL = None


def pack_int_columns(cols: Sequence[jnp.ndarray]):
    """Greedily pack narrow (<=16-bit) integer 1-D columns into shared u32
    words so fewer streams ride a shift ladder or sort.  Returns
    ``(packed_cols, plan)``; feed ``plan`` to :func:`unpack_int_columns`.
    Wide/float columns pass through untouched."""
    words: List = []      # u32 accumulator columns
    word_bits: List[int] = []
    out_cols: List = []
    plan = []             # per input: ("pass", out_idx) | ("packed", word_idx, shift, width, dtype)
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
    """Inverse of :func:`pack_int_columns`: recover the original narrow
    integer columns (sign-extended) from the shared u32 words."""
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


def compact_columns(cols: Sequence[jnp.ndarray], keep: jnp.ndarray,
                    tiles: int = 0) -> Tuple[List[jnp.ndarray], jnp.ndarray]:
    """Compact 1-D ``cols`` so rows with ``keep`` move to the front in
    order.  Returns (compacted columns, kept count).  Rows past the kept
    count hold unspecified values.

    ``tiles`` (0 = auto): compact that many contiguous row-tiles
    independently — within-tile displacements are bounded by the tile's
    dropped-row count, so the shift ladder exits after far fewer stages —
    then merge by writing each tile's full block at its running output
    offset in a sequential ``fori_loop`` (later writes overwrite earlier
    tiles' garbage suffixes, which is exactly right because offsets
    advance by each tile's kept count)."""
    n = keep.shape[0]
    if tiles == 0:
        # 64 tiles measured best on v5e at 4M rows: finer tiles shorten the
        # ladder but the sequential merge's per-iteration cost dominates
        # (256 tiles: 546 vs 578 Mpts/s in the voxel bench)
        tiles = 64 if (n % (64 * 128) == 0 and n // 64 >= 4096) else 1
    if tiles > 1 and n % tiles == 0 and (n // tiles) % 128 == 0:
        return _compact_tiled(list(cols), keep, tiles)
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


def _dshift_up2(x: jnp.ndarray, d, fill) -> jnp.ndarray:
    """x[:, j+d] with ``fill`` past each row's end; ``d`` may be traced."""
    t, l = x.shape
    pad = jnp.full((t, l), fill, x.dtype)
    return lax.dynamic_slice_in_dim(jnp.concatenate([x, pad], axis=1),
                                    d, l, axis=1)


def _compact_tiled(cols: List[jnp.ndarray], keep: jnp.ndarray, t: int
                   ) -> Tuple[List[jnp.ndarray], jnp.ndarray]:
    n = keep.shape[0]
    l = n // t

    # Pallas fast path: the per-tile ladder runs entirely in VMEM (one HBM
    # read + write per stream instead of one per ladder stage)
    from .kernels.compact_kernel import (PALLAS_COMPACT_BLOCK,
                                         blockwise_compact_pallas)
    if (l == PALLAS_COMPACT_BLOCK and jax.default_backend() != "cpu"
            and all(jnp.dtype(c.dtype).itemsize == 4 and c.ndim == 1
                    for c in cols)):
        outs, cnt = blockwise_compact_pallas(list(cols), keep)
        return _merge_tiles([o.reshape(t, l) for o in outs], cnt, keep,
                            n, l)

    keep2 = keep.reshape(t, l)
    kint = keep2.astype(jnp.int32)

    # per-tile inclusive rank: 128-lane prefixes via one MXU matmul +
    # within-tile row offsets (f32 exact: l < 2^24)
    rpt = l // 128
    lanes = kint.reshape(t * rpt, 128).astype(jnp.float32)
    lt = jnp.tril(jnp.ones((128, 128), jnp.float32))
    row_inc = lanes @ lt.T
    row_tot = row_inc[:, -1].reshape(t, rpt)
    row_offs = row_tot
    d = 1
    while d < rpt:  # tiny within-tile row scan
        row_offs = row_offs + jnp.concatenate(
            [jnp.zeros((t, d), jnp.float32), row_offs[:, :-d]], axis=1)
        d <<= 1
    row_offs = row_offs - row_tot
    rank_incl = (row_inc.reshape(t, rpt, 128)
                 + row_offs[:, :, None]).astype(jnp.int32).reshape(t, l)
    cnt = rank_incl[:, -1]                       # kept per tile (t,)

    iota_l = _cumsum_jump(jnp.ones((l,), jnp.int32)) - 1
    dist = jnp.where(keep2, iota_l[None, :] - (rank_incl - 1), 0)

    # per-tile staged shifts: displacements are bounded by each tile's
    # dropped-row count, so the ladder exits after log2(max dropped) stages
    def cond(state):
        s, k, dist, occ, _ = state
        return (s < l) & jnp.any(occ & (dist > 0))

    def body(state):
        s, k, dist, occ, vals = state
        move = occ & (((dist >> k) & 1) == 1)
        inc = _dshift_up2(move, s, False)
        vals = tuple(jnp.where(inc, _dshift_up2(v, s, jnp.zeros((), v.dtype)),
                               v) for v in vals)
        dist = jnp.where(inc, _dshift_up2(dist, s, 0) - s, dist)
        occ = (occ & ~move) | inc
        return (s * 2, k + 1, dist, occ, vals)

    state = (jnp.asarray(1, jnp.int32), jnp.asarray(0, jnp.int32),
             dist, keep2,
             tuple(_match_vma(keep2, c.reshape(t, l)) for c in cols))
    _, _, _, _, vals2 = lax.while_loop(cond, body, state)

    return _merge_tiles(vals2, cnt, keep, n, l)


def _merge_tiles(vals2, cnt, keep, n, l):
    """Merge per-tile compacted (t, l) blocks: write each tile's FULL
    block at its running output offset; offsets advance by the tile's kept
    count, so the next write overwrites exactly the previous tile's
    garbage suffix.  Buffers are padded by one tile so the last full-block
    write stays in bounds.

    The sequential loop is overhead-bound (per-op dispatch, not HBM), so
    all 4-byte streams are bitcast to i32 and STACKED into one (g, t, l)
    array — the loop then issues ONE ``dynamic_update_slice`` per tile
    regardless of stream count (measured ~2.5x faster at 4 streams) —
    and each ``fori_loop`` iteration handles ``U`` consecutive tiles
    (static unroll; writes stay ordered through the carry chain), which
    amortizes the per-iteration dispatch the loop is bound by."""
    t = vals2[0].shape[0]
    count = jnp.sum(cnt)
    offs = _cumsum_jump(cnt) - cnt
    ref = keep[:1]
    unroll_override = _MERGE_UNROLL

    four = [i for i, v in enumerate(vals2)
            if jnp.dtype(v.dtype).itemsize == 4]
    rest = [i for i, v in enumerate(vals2) if i not in four]
    stacked = (jnp.stack([lax.bitcast_convert_type(vals2[i], jnp.int32)
                          for i in four]) if four else None)
    g = len(four)

    outs_rest = tuple(_match_vma(ref, jnp.zeros((n + l,), vals2[i].dtype))
                      for i in rest)
    out_stk = (_match_vma(ref, jnp.zeros((g, n + l), jnp.int32))
               if four else None)

    cands = (unroll_override,) if unroll_override else (8, 4, 2, 1)
    unroll = next((u for u in cands if t % u == 0), 1)

    def merge(i, state):
        out_stk, outs_rest = state
        for u in range(unroll):
            idx = i * unroll + u
            off = lax.dynamic_index_in_dim(offs, idx, keepdims=False)
            if four:
                blk = lax.dynamic_index_in_dim(stacked, idx, axis=1,
                                               keepdims=False)
                out_stk = lax.dynamic_update_slice(out_stk, blk,
                                                   (jnp.int32(0), off))
            outs_rest = tuple(
                lax.dynamic_update_slice_in_dim(
                    o, lax.dynamic_index_in_dim(vals2[j], idx,
                                                keepdims=False),
                    off, 0)
                for o, j in zip(outs_rest, rest))
        return (out_stk, outs_rest)

    out_stk, outs_rest = lax.fori_loop(0, t // unroll, merge,
                                       (out_stk, outs_rest))

    merged: List = [None] * len(vals2)
    for k, i in enumerate(four):
        merged[i] = lax.bitcast_convert_type(out_stk[k],
                                             vals2[i].dtype)[:n]
    for o, j in zip(outs_rest, rest):
        merged[j] = o[:n]
    return merged, count
