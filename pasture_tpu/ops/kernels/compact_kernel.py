"""Pallas per-block prefix compaction: the staged-shift ladder runs
entirely in VMEM, one HBM read + one HBM write per stream.

The XLA staged-shift compactor (ops/compact.py) pays HBM traffic for every
shift stage; here each 64K-element block loads once, runs the full ladder
on-chip, and stores its locally-compacted block.  The caller (the tiled
path in ops/compact.py) merges blocks exactly as before: sequential
full-block ``dynamic_update_slice`` writes at running offsets, later
writes overwriting earlier garbage suffixes.

Within-block algorithm (identical semantics to ops/compact.py):

* local ranks: one (ROWS, 128) @ lower-triangular matmul on the MXU for
  lane prefixes + a small staged scan over row totals;
* "flattened" shifts by s on the (ROWS, 128) layout decompose into a row
  shift by s//128 (+1) and a lane roll by s%128 with a lane-boundary
  select (``pltpu.roll``);
* LSB-first staged moves, displacement = local index - local rank.
"""

from __future__ import annotations

from functools import partial
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .fused_transform import _auto_interpret

__all__ = ["blockwise_compact_pallas", "PALLAS_COMPACT_BLOCK"]

_LANES = 128
_BLOCK_ROWS = 512
PALLAS_COMPACT_BLOCK = _BLOCK_ROWS * _LANES   # 64K elements


def _row_shift(x, q):
    """Rows up by q, zero-fill — as a sublane roll + mask (Mosaic rejects
    concat of sublane-misaligned slices)."""
    rows = x.shape[0]
    if q == 0:
        return x
    if q >= rows:
        return jnp.zeros_like(x)
    rolled = pltpu.roll(x, rows - q, 0)
    rid = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
    return jnp.where(rid < rows - q, rolled, jnp.zeros_like(x))


def _flat_shift_up(x, s):
    """Element i+s of x viewed as row-major flattened, zero-fill."""
    q, r = s // _LANES, s % _LANES
    a = _row_shift(x, q)
    if r == 0:
        return a
    b = _row_shift(x, q + 1)
    # pltpu.roll takes non-negative shifts: left-roll by r == right-roll
    # by LANES - r
    ar = pltpu.roll(a, _LANES - r, 1)
    br = pltpu.roll(b, _LANES - r, 1)
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    return jnp.where(lane < _LANES - r, ar, br)


def _make_kernel(n_cols: int):
    rows = _BLOCK_ROWS

    def kernel(*refs):
        keep_ref = refs[0]
        col_refs = refs[1:1 + n_cols]
        out_refs = refs[1 + n_cols:1 + 2 * n_cols]
        cnt_ref = refs[-1]

        keep = keep_ref[...] != 0
        kf = keep.astype(jnp.float32)
        lt = jnp.tril(jnp.ones((_LANES, _LANES), jnp.float32))
        row_inc = jnp.dot(kf, lt.T, preferred_element_type=jnp.float32)
        row_tot = row_inc[:, -1:]
        offs = row_tot
        rid1 = jax.lax.broadcasted_iota(jnp.int32, row_tot.shape, 0)
        d = 1
        while d < rows:
            down = pltpu.roll(offs, d, 0)   # offs shifted down by d
            offs = offs + jnp.where(rid1 >= d, down,
                                    jnp.zeros_like(offs))
            d <<= 1
        rank_incl = (row_inc + (offs - row_tot)).astype(jnp.int32)

        flat_idx = (jax.lax.broadcasted_iota(jnp.int32, keep.shape, 0)
                    * _LANES
                    + jax.lax.broadcasted_iota(jnp.int32, keep.shape, 1))
        dist = jnp.where(keep, flat_idx - (rank_incl - 1), 0)

        occ = keep
        vals = [r[...] for r in col_refs]
        s, k = 1, 0
        while s < rows * _LANES:
            move = occ & (((dist >> k) & 1) == 1)
            # Mosaic rotates are 32-bit only: shift the mask widened
            inc = _flat_shift_up(move.astype(jnp.int32), s) != 0
            vals = [jnp.where(inc, _flat_shift_up(v, s), v) for v in vals]
            dist = jnp.where(inc, _flat_shift_up(dist, s) - s, dist)
            occ = (occ & ~move) | inc
            s <<= 1
            k += 1

        for v, o in zip(vals, out_refs):
            o[...] = v
        cnt_ref[pl.program_id(0), 0] = jnp.sum(kf).astype(jnp.int32)
    return kernel


@partial(jax.jit, static_argnames=("interpret",))
def blockwise_compact_pallas(cols: Sequence[jnp.ndarray],
                             keep: jnp.ndarray,
                             interpret: bool = None
                             ) -> Tuple[List[jnp.ndarray], jnp.ndarray]:
    """Compact every 64K-element block of 1-D ``cols`` independently (kept
    rows to each block's front, in order).  Returns (blocked-compacted
    columns, per-block kept counts) — feed to the tiled merge in
    ops/compact.py.  ``len(keep)`` must be a multiple of 64K."""
    interpret = _auto_interpret(interpret)
    n = keep.shape[0]
    assert n % PALLAS_COMPACT_BLOCK == 0
    grid = (n // PALLAS_COMPACT_BLOCK,)
    rows_total = n // _LANES

    keep8 = keep.astype(jnp.uint8).reshape(rows_total, _LANES)
    shaped = [c.reshape(rows_total, _LANES) for c in cols]
    block = pl.BlockSpec((_BLOCK_ROWS, _LANES), lambda i: (i, 0))

    outs = pl.pallas_call(
        _make_kernel(len(cols)),
        grid=grid,
        in_specs=[block] * (1 + len(cols)),
        out_specs=[block] * len(cols) + [
            pl.BlockSpec((grid[0], 1), lambda i: (0, 0),
                         memory_space=pltpu.SMEM)],
        out_shape=[jax.ShapeDtypeStruct((rows_total, _LANES), c.dtype)
                   for c in cols]
        + [jax.ShapeDtypeStruct((grid[0], 1), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(keep8, *shaped)
    cnts = outs[-1][:, 0]
    return [o.reshape(-1) for o in outs[:-1]], cnts
