"""Blockwise fused voxel reduction + compaction — the post-sort half of
the voxel pipeline as ONE Pallas kernel.

Input: the tiled-sorted operands of ops/voxel.py's quantized fast path —
Morton key, the packed secondary word (mode value in the top bits, narrow
mean fields below), and the packed position-residual word.  Because the
sort runs per spatial tile and 64K-element kernel blocks contain whole
tiles, NO key segment ever spans a block — every segmented reduction and
the prefix compaction are block-local, so the whole chain (segment flags,
mean sums + counts, run-length mode selection, centroid reconstruction
from key + mean residual, Rust-`as` output casts, prefix compaction) runs
in VMEM with one HBM read per input stream and one write per output.

Semantics are bit-compatible with the generic path in ops/voxel.py
(asserted by tests/test_pallas_kernels.py); reduction-policy reference:
pasture-algorithms/src/voxel_grid.rs:443-700.
"""

from __future__ import annotations

from functools import partial
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .compact_kernel import _flat_shift_up
from .fused_transform import _auto_interpret, _expand10, _int_cell_base

__all__ = ["fused_sorted_voxel_reduce", "REDUCE_BLOCK"]

_LANES = 128
_BLOCK_ROWS = 512
REDUCE_BLOCK = _BLOCK_ROWS * _LANES
_INVALID = 0xFFFFFFFF

# tiered-ladder static prefixes (stages always run; the rest sit behind
# one lax.cond).  Module-level so perf probes can A/B them; defaults
# chosen by measurement on v5e (benches/reduce_split_probe.py)
_SEG_SPLIT = 4        # covers segments up to 2^_SEG_SPLIT points
_COMPACT_SPLIT = 10   # covers compaction displacements up to 2^split


def _flat_shift_down(x, s, fill):
    """Element i-s of x (row-major flattened); ``fill`` before the start."""
    q, r = s // _LANES, s % _LANES
    rows = x.shape[0]

    def rshift_down(y, qq):
        if qq == 0:
            return y
        rolled = pltpu.roll(y, qq, 0)
        rid = jax.lax.broadcasted_iota(jnp.int32, y.shape, 0)
        return jnp.where(rid >= qq, rolled, jnp.full_like(y, fill))

    a = rshift_down(x, q)
    if r == 0:
        return a
    b = rshift_down(x, q + 1)
    ar = pltpu.roll(a, r, 1)
    br = pltpu.roll(b, r, 1)
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    return jnp.where(lane >= r, ar, br)


def _compact10(v):
    v = v & jnp.uint32(0x09249249)
    v = (v | (v >> 2)) & jnp.uint32(0x030C30C3)
    v = (v | (v >> 4)) & jnp.uint32(0x0300F00F)
    v = (v | (v >> 8)) & jnp.uint32(0x030000FF)
    v = (v | (v >> 16)) & jnp.uint32(0x3FF)
    return v


def _tiered_ladder(state, stage_fns, pending, split):
    """Run statically-unrolled ladder ``stage_fns`` with ONE runtime skip
    point: stages[:split] always run, stages[split:] run inside a single
    ``lax.cond`` on ``pending(state)``.  Typical data (tiny segments,
    small displacements) skips the tail at runtime while every shift
    amount stays STATIC.  Both finer-grained alternatives measured SLOWER
    on v5e: a ``while_loop`` with dynamic ``pltpu.roll`` shifts (~2x cost
    per stage), and a cond per 3-stage tier (each cond boundary forces the
    full vector carry through VMEM, swamping the skipped work)."""
    def run(st, fns):
        for f in fns:
            st = f(st)
        return st

    state = run(state, stage_fns[:split])
    tail = stage_fns[split:]
    if not tail:
        return state
    return jax.lax.cond(pending(state),
                        lambda st: run(st, tail),
                        lambda st: st, state)


def _seg_totals(cols, first, rows, max_seg=None):
    """Reverse segmented sums: totals land on each segment's FIRST row.
    Tiered static ladder: stages come in groups of ``_TIER``, each later
    group behind a ``lax.cond`` on "any window still open", so the ladder
    effectively exits at log2(actual max segment length) instead of the
    static log2(max_seg) worst case (segments are typically a handful of
    points: ~3 live stages instead of 12)."""
    total = rows * _LANES
    bound = min(total, max_seg or total)
    flat_idx = (jax.lax.broadcasted_iota(jnp.int32, first.shape, 0) * _LANES
                + jax.lax.broadcasted_iota(jnp.int32, first.shape, 1))
    blk0 = (_flat_shift_up(first.astype(jnp.int32), 1)
            | (flat_idx == total - 1).astype(jnp.int32))

    def make_stage(s):
        def stage(st):
            blk, cs = st
            ok = blk == 0
            cs = tuple(c + jnp.where(ok, _flat_shift_up(c, s),
                                     jnp.zeros_like(c)) for c in cs)
            blk = (blk | _flat_shift_up(blk, s)
                   | (flat_idx >= total - s).astype(jnp.int32))
            return (blk, cs)
        return stage

    stages = []
    s = 1
    while s < bound:
        stages.append(make_stage(s))
        s <<= 1
    # static prefix covers segments up to 16 points; longer ones take the
    # conditional tail
    blk, out = _tiered_ladder((blk0, tuple(cols)), stages,
                              lambda st: jnp.any(st[0] == 0),
                              split=_SEG_SPLIT)
    return list(out)


def _seg_max(col, first, rows, neutral, max_seg=None):
    """Reverse segmented max landing on first rows.  Unlike the sum ladder
    (where the zero shift-fill past the block end is additive-neutral),
    max needs rows past the end to read as BLOCKED — the flat index guard
    handles the tail.  Tiered skip as in :func:`_seg_totals`."""
    total = rows * _LANES
    bound = min(total, max_seg or total)
    flat_idx = (jax.lax.broadcasted_iota(jnp.int32, col.shape, 0) * _LANES
                + jax.lax.broadcasted_iota(jnp.int32, col.shape, 1))
    blk0 = (_flat_shift_up(first.astype(jnp.int32), 1)
            | (flat_idx == total - 1).astype(jnp.int32))

    def make_stage(s):
        def stage(st):
            blk, c = st
            ok = blk == 0
            c = jnp.maximum(c, jnp.where(ok, _flat_shift_up(c, s),
                                         jnp.full_like(c, neutral)))
            blk = (blk | _flat_shift_up(blk, s)
                   | (flat_idx >= total - s).astype(jnp.int32))
            return (blk, c)
        return stage

    stages = []
    s = 1
    while s < bound:
        stages.append(make_stage(s))
        s <<= 1
    _, out = _tiered_ladder((blk0, col), stages,
                            lambda st: jnp.any(st[0] == 0),
                            split=_SEG_SPLIT)
    return out


def _make_kernel(mode_bits: int, fields, qbits: int, qwindow: float,
                 tile_len: int, exact_pos: bool = False,
                 exact_local: bool = False):
    """``fields``: static list of (shift, width, signed, imin, imax) mean
    fields packed in the secondary word below the mode_bits.

    ``exact_pos``: positions arrive as three sorted f32 operands instead of
    the packed residual word — the centroid is their exact block-local
    segmented f32 mean (no quantization, no reconstruction from the key).

    ``exact_local``: the residual word holds EXACT 10-bit i32
    local-coordinate residuals relative to the per-cell base (see
    fused_transform.fused_voxel_head_exact_local) — the centroid is the
    affine image of the exact local mean: base(cell) + mean(residual)
    scaled and rotated to world.  No quantization; residual sums (<=2^22)
    are exact in f32.  Params carry the affine (scale, rot, trans)."""
    rows = _BLOCK_ROWS
    total = rows * _LANES

    def kernel(key_ref, word_ref, *rest):
        coef = None
        if exact_pos:
            (pxi_ref, pyi_ref, pzi_ref, params_ref,
             px_ref, py_ref, pz_ref, word_out_ref, cnt_ref) = rest
        elif exact_local:
            (q_ref, params_ref, coef_ref,
             px_ref, py_ref, pz_ref, word_out_ref, cnt_ref) = rest
            coef = coef_ref[:]
        else:
            (q_ref, params_ref,
             px_ref, py_ref, pz_ref, word_out_ref, cnt_ref) = rest
        p = params_ref[:]
        bmin, leaf = p[0:3], p[3]
        if exact_local:
            scale, rot, trans = p[4:7], p[7:16].reshape(3, 3), p[16:19]

        key = key_ref[...]
        word = word_ref[...]

        flat_idx = (jax.lax.broadcasted_iota(jnp.int32, key.shape, 0)
                    * _LANES
                    + jax.lax.broadcasted_iota(jnp.int32, key.shape, 1))
        valid = key != jnp.uint32(_INVALID)
        prev_key = _flat_shift_down(key, 1, _INVALID)
        first = valid & ((key != prev_key)
                         | (flat_idx % tile_len == 0))

        # ---- mean sums (+ counts) over segments -------------------------
        cols = []
        if exact_pos:
            for ref in (pxi_ref, pyi_ref, pzi_ref):
                cols.append(jnp.where(valid, ref[...], 0.0))
        else:
            qw = q_ref[...]
            qm = jnp.uint32((1 << qbits) - 1)
            for sh in (2 * qbits, qbits, 0):
                # u32 -> i32 -> f32 (Mosaic lacks direct u32<->f32 casts)
                qc = ((qw >> jnp.uint32(sh)) & qm).astype(jnp.int32) \
                    .astype(jnp.float32)
                cols.append(jnp.where(valid, qc, 0.0))
        for (fsh, fw, fsigned, _, _) in fields:
            u = (word >> jnp.uint32(fsh)) & jnp.uint32((1 << fw) - 1)
            if fsigned:
                sb = jnp.int32(1 << (fw - 1))
                v = ((u.astype(jnp.int32) ^ sb) - sb).astype(jnp.float32)
            else:
                v = u.astype(jnp.int32).astype(jnp.float32)
            cols.append(jnp.where(valid, v, 0.0))
        cols.append(jnp.where(valid, 1.0, 0.0))
        sums = _seg_totals(cols, first, rows, max_seg=tile_len)
        cnt = jnp.maximum(sums[-1], 1.0)
        qmeans = [s / cnt for s in sums[:3]]
        fmeans = [s / cnt for s in sums[3:-1]]

        # ---- mode of the top bits (max run, then smallest value) ---------
        out_word = jnp.zeros_like(word)
        if mode_bits:
            mv = (word >> jnp.uint32(32 - mode_bits)).astype(jnp.int32)
            prev_mv = _flat_shift_down(mv, 1, -1)
            run_new = first | (valid & (mv != prev_mv))
            runs = run_new & valid
            (run_len,) = _seg_totals(
                [jnp.where(valid, 1.0, 0.0)], run_new, rows,
                max_seg=tile_len)
            vmax_enc = jnp.int32((1 << mode_bits) - 1)
            packed = jnp.where(runs,
                               (run_len.astype(jnp.int32) << mode_bits)
                               | (vmax_enc - mv), -1)
            best = _seg_max(packed, first, rows, -1, max_seg=tile_len)
            mode = vmax_enc - (best & vmax_enc)
            out_word = (mode.astype(jnp.uint32)
                        << jnp.uint32(32 - mode_bits))

        # ---- Rust-`as` casts of field means back into the word ----------
        for (fsh, fw, fsigned, imin, imax), m in zip(fields, fmeans):
            t = jnp.trunc(m)
            t = jnp.clip(t, float(imin), float(imax))
            bits = (jax.lax.bitcast_convert_type(t.astype(jnp.int32),
                                                 jnp.uint32)
                    & jnp.uint32((1 << fw) - 1))
            out_word = out_word | (bits << jnp.uint32(fsh))

        if exact_pos:
            # ---- centroid = exact segmented f32 mean ---------------------
            px, py, pz = qmeans
        elif exact_local:
            # ---- centroid = affine(base(cell) + exact local mean) --------
            # the base is the SAME integer fixed-point expression the head
            # kernel encoded residuals against (bit-exact on any backend)
            cx = _compact10(key).astype(jnp.int32)
            cy = _compact10(key >> 1).astype(jnp.int32)
            cz = _compact10(key >> 2).astype(jnp.int32)
            blx = _int_cell_base(coef, cx, cy, cz, 0).astype(jnp.float32)
            bly = _int_cell_base(coef, cx, cy, cz, 1).astype(jnp.float32)
            blz = _int_cell_base(coef, cx, cy, cz, 2).astype(jnp.float32)
            mlx = (blx + qmeans[0]) * scale[0]
            mly = (bly + qmeans[1]) * scale[1]
            mlz = (blz + qmeans[2]) * scale[2]
            px = rot[0, 0] * mlx + rot[0, 1] * mly + rot[0, 2] * mlz \
                + trans[0]
            py = rot[1, 0] * mlx + rot[1, 1] * mly + rot[1, 2] * mlz \
                + trans[1]
            pz = rot[2, 0] * mlx + rot[2, 1] * mly + rot[2, 2] * mlz \
                + trans[2]
        else:
            # ---- centroid reconstruction from key + mean residual -------
            cx = _compact10(key).astype(jnp.int32).astype(jnp.float32)
            cy = _compact10(key >> 1).astype(jnp.int32).astype(jnp.float32)
            cz = _compact10(key >> 2).astype(jnp.int32).astype(jnp.float32)
            scale_q = qwindow / (1 << qbits)
            px = (cx + (qmeans[0] + 0.5) * scale_q) * leaf + bmin[0]
            py = (cy + (qmeans[1] + 0.5) * scale_q) * leaf + bmin[1]
            pz = (cz + (qmeans[2] + 0.5) * scale_q) * leaf + bmin[2]

        # ---- prefix compaction of first rows -----------------------------
        kf = first.astype(jnp.float32)
        lt = jnp.tril(jnp.ones((_LANES, _LANES), jnp.float32))
        row_inc = jnp.dot(kf, lt.T, preferred_element_type=jnp.float32)
        row_tot = row_inc[:, -1:]
        offs = row_tot
        rid1 = jax.lax.broadcasted_iota(jnp.int32, row_tot.shape, 0)
        d = 1
        while d < rows:
            down = pltpu.roll(offs, d, 0)
            offs = offs + jnp.where(rid1 >= d, down, jnp.zeros_like(offs))
            d <<= 1
        rank_incl = (row_inc + (offs - row_tot)).astype(jnp.int32)
        dist = jnp.where(first, flat_idx - (rank_incl - 1), 0)

        # tiered LSB-first ladder: later stage groups are skipped via
        # lax.cond once every kept row has reached its destination
        # (log2(max displacement) live stages; displacement is bounded by
        # the block's dropped-row count, typically far below the static
        # log2(block) = 16)
        def make_stage(s, k):
            def stage(st):
                dist, occ, vals = st
                move = (occ != 0) & (((dist >> k) & 1) == 1)
                inc = _flat_shift_up(move.astype(jnp.int32), s) != 0
                vals = tuple(jnp.where(inc, _flat_shift_up(v, s), v)
                             for v in vals)
                dist = jnp.where(inc, _flat_shift_up(dist, s) - s, dist)
                occ = ((occ != 0) & ~move | inc).astype(jnp.int32)
                return (dist, occ, vals)
            return stage

        stages = []
        s, k = 1, 0
        while s < total:
            stages.append(make_stage(s, k))
            s <<= 1
            k += 1
        state = (dist, first.astype(jnp.int32), (px, py, pz, out_word))
        # static prefix covers displacements up to 1024 (a block can drop
        # that many rows before the cond tail ever fires)
        _, _, vals = _tiered_ladder(
            state, stages,
            lambda st: jnp.any((st[1] != 0) & (st[0] > 0)),
            split=_COMPACT_SPLIT)

        px_ref[...] = vals[0]
        py_ref[...] = vals[1]
        pz_ref[...] = vals[2]
        word_out_ref[...] = vals[3]
        cnt_ref[pl.program_id(0), 0] = jnp.sum(kf).astype(jnp.int32)
    return kernel


@partial(jax.jit, static_argnames=("mode_bits", "fields", "qbits",
                                   "qwindow", "tile_len", "semantics",
                                   "interpret"))
def fused_sorted_voxel_reduce(skey: jnp.ndarray, sword: jnp.ndarray,
                              sqword: jnp.ndarray, bounds_min: jnp.ndarray,
                              leaf_size: float, mode_bits: int,
                              fields: tuple, qbits: int, qwindow: float,
                              tile_len: int, semantics: str = "floor",
                              interpret: bool = None,
                              spos: tuple = None,
                              local_affine: tuple = None):
    """All post-sort voxel work in one blockwise kernel.  Returns
    ``(pos_x, pos_y, pos_z, out_word, per_block_counts)`` with each 64K
    block's voxels compacted to its front (merge with
    ops.compact._merge_tiles).  Requires: single-u32-key path, every
    non-position payload packed into ``sword`` (mode value in the top
    ``mode_bits``), and ``tile_len`` dividing the 64K block.

    Positions, one of three forms:

    * ``sqword`` packed q-bit residual word — the QUANTIZED fast path;
    * ``sqword`` + ``local_affine=(scale, rot, trans, coeffs)`` — the
      EXACT-LOCAL path: the word holds exact 10-bit i32 local residuals
      (fused_voxel_head_exact_local) and the centroid is the affine image
      of the exact local mean; ``coeffs`` is the SAME
      exact_local_base_coeffs array the head used (``qbits`` must be 10);
    * ``spos=(px, py, pz)`` sorted f32 operands — the EXACT-f32 path:
      centroids are block-local segmented f32 means."""
    interpret = _auto_interpret(interpret)
    exact_pos = spos is not None
    exact_local = local_affine is not None
    assert (sqword is None) == exact_pos, \
        "pass exactly one of sqword / spos"
    assert not (exact_pos and exact_local)
    assert not exact_local or qbits == 10
    n = skey.shape[0]
    assert n % REDUCE_BLOCK == 0 and REDUCE_BLOCK % tile_len == 0
    grid = (n // REDUCE_BLOCK,)
    rows_total = n // _LANES

    parts = [bounds_min.astype(jnp.float32).reshape(3),
             jnp.asarray([leaf_size], jnp.float32)]
    coeff_ins = ()
    if exact_local:
        scale, rot, trans, coeffs = local_affine
        parts += [scale.astype(jnp.float32).reshape(3),
                  rot.astype(jnp.float32).reshape(9),
                  trans.astype(jnp.float32).reshape(3)]
        coeff_ins = (coeffs.astype(jnp.int32),)
    params = jnp.concatenate(parts)
    nparams = 19 if exact_local else 4
    block = pl.BlockSpec((_BLOCK_ROWS, _LANES), lambda i: (i, 0))
    ins = (skey, sword) + (tuple(spos) if exact_pos else (sqword,))
    shaped = [x.reshape(rows_total, _LANES) for x in ins]

    outs = pl.pallas_call(
        # (exact-local needs no mid here: the cell reference point is
        # baked into the shared exact_local_base_coeffs array)
        _make_kernel(mode_bits, fields, qbits, qwindow, tile_len,
                     exact_pos=exact_pos, exact_local=exact_local),
        grid=grid,
        in_specs=[block] * len(shaped)
        + [pl.BlockSpec((nparams,), lambda i: (0,))]
        + ([pl.BlockSpec((15,), lambda i: (0,))] if exact_local else []),
        out_specs=[block, block, block, block,
                   pl.BlockSpec((grid[0], 1), lambda i: (0, 0),
                                memory_space=pltpu.SMEM)],
        out_shape=[jax.ShapeDtypeStruct((rows_total, _LANES), jnp.float32)]
        * 3
        + [jax.ShapeDtypeStruct((rows_total, _LANES), jnp.uint32),
           jax.ShapeDtypeStruct((grid[0], 1), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(*shaped, params, *coeff_ins)
    return ([o.reshape(-1) for o in outs[:4]], outs[4][:, 0])
