"""Blockwise bitonic tile sort — the Pallas replacement for ``lax.sort``
on the voxel pipeline's hot path.

The headline pipeline sorts 8192 independent 512-row tiles of 3 u32
operands (Morton key, packed word, residual word) through XLA's general
sort network — ~1.7 ms of the ~3.7 ms total at 4M rows, ~19x the pure
HBM floor (round-3 verdict).  A 512-element tile is VMEM-trivial: this
kernel runs the full bitonic network (45 compare-exchange substages for
512) entirely in VMEM with ONE HBM read + write per stream, vectorised
over 128 tiles per grid step.

Layout: flat streams are viewed as (rows, 128) with flat index
``row * 128 + lane`` (the convention of voxel_reduce_kernel.py).  A
``tile_len``-element tile therefore spans ``tile_len/128`` consecutive
rows.  A bitonic exchange at distance ``d`` pairs flat indices ``i`` and
``i ^ d``:

* ``d < 128`` flips a LANE bit — partner values come from two lane
  rotations (``pltpu.roll`` axis 1) selected by the bit;
* ``d >= 128`` flips a ROW bit within the tile — two sublane rotations
  (axis 0).

Rotation wrap-around never leaks across tiles: an XOR partner always
lies in the same tile, and the select mask picks exactly the non-wrapped
value.  Ties keep their current position (the network is applied to the
key operand(s) only; payload operands move with their row).

Output is bit-identical to ``lax.sort`` on the same operands up to the
order WITHIN equal-key runs (both are unstable sorts; the voxel
pipeline's reductions are invariant to that order, asserted in
tests/test_pallas_kernels.py).
"""

from __future__ import annotations

from functools import partial
from typing import List, Sequence

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["tile_sort_pallas", "supports_tile_sort"]

_LANES = 128
_BLOCK_ROWS = 512  # 64k elements per grid step


def supports_tile_sort(n: int, tile_len: int, n_streams: int) -> bool:
    """Static feasibility of the Pallas tile sort for ``n`` flat elements
    in ``tile_len`` tiles."""
    if tile_len < 2 * _LANES or tile_len & (tile_len - 1):
        return False
    rows_per_tile = tile_len // _LANES
    if tile_len % _LANES or _BLOCK_ROWS % rows_per_tile:
        return False
    block = _BLOCK_ROWS * _LANES
    return n % block == 0 and n_streams >= 1


def _make_kernel(n_streams: int, num_keys: int, rows_per_tile: int):
    tile_len = rows_per_tile * _LANES

    def kernel(*refs):
        vals: List[jnp.ndarray] = [r[:] for r in refs[:n_streams]]
        outs = refs[n_streams:]
        rid = jax.lax.broadcasted_iota(jnp.int32, vals[0].shape, 0)
        lane = jax.lax.broadcasted_iota(jnp.int32, vals[0].shape, 1)
        idx = (rid % rows_per_tile) * _LANES + lane  # index within tile

        def partner(vs, d):
            if d < _LANES:
                axis, sh = 1, d
            else:
                axis, sh = 0, d // _LANES
            size = vs[0].shape[axis]
            fwd = [pltpu.roll(v, size - sh, axis) for v in vs]  # v[i + d]
            bwd = [pltpu.roll(v, sh, axis) for v in vs]         # v[i - d]
            bit = (idx & d) != 0
            return [jnp.where(bit, b, f) for f, b in zip(fwd, bwd)], bit

        k = 2
        while k <= tile_len:
            j = k // 2
            while j >= 1:
                pvals, bit = partner(vals, j)
                # lexicographic key compare (self vs partner)
                p_less = pvals[0] < vals[0]
                p_greater = pvals[0] > vals[0]
                for q in range(1, num_keys):
                    eq = pvals[q - 1] == vals[q - 1]
                    p_less = p_less | (eq & (pvals[q] < vals[q]))
                    p_greater = p_greater | (eq & (pvals[q] > vals[q]))
                ascending = (idx & k) == 0
                # element keeps the MIN of the pair iff it is the lower
                # index (bit clear) in an ascending run, or the higher in
                # a descending one
                want_min = (~bit) == ascending
                # boolean select via logic ops: jnp.where on i1 vectors
                # trips Mosaic's bitwidth truncation
                take = (want_min & p_less) | (~want_min & p_greater)
                vals = [jnp.where(take, p, v)
                        for p, v in zip(pvals, vals)]
                j //= 2
            k *= 2
        for o, v in zip(outs, vals):
            o[:] = v

    return kernel


@partial(jax.jit, static_argnames=("tile_len", "num_keys", "interpret"))
def tile_sort_pallas(streams: Sequence[jnp.ndarray], tile_len: int,
                     num_keys: int = 1, interpret: bool = None):
    """Sort each contiguous ``tile_len``-element tile of the flat u32/i32
    ``streams`` by the first ``num_keys`` operands (lexicographic,
    ascending), permuting all streams together.  Drop-in for
    ``lax.sort(ops reshaped to (tiles, tile_len), dimension=1)`` modulo
    the order within equal-key runs."""
    from .fused_transform import _auto_interpret
    interpret = _auto_interpret(interpret)
    streams = list(streams)
    n = streams[0].shape[0]
    assert supports_tile_sort(n, tile_len, len(streams)), \
        (n, tile_len, len(streams))
    rows_per_tile = tile_len // _LANES
    rows = n // _LANES
    grid = (rows // _BLOCK_ROWS,)
    block = pl.BlockSpec((_BLOCK_ROWS, _LANES), lambda i: (i, 0))
    shaped = [s.reshape(rows, _LANES) for s in streams]
    outs = pl.pallas_call(
        _make_kernel(len(streams), num_keys, rows_per_tile),
        grid=grid,
        in_specs=[block] * len(streams),
        out_specs=[block] * len(streams),
        out_shape=[jax.ShapeDtypeStruct((rows, _LANES), s.dtype)
                   for s in shaped],
        interpret=interpret,
    )(*shaped)
    return tuple(o.reshape(n) for o in outs)
