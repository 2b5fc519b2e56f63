"""Blockwise Pallas Morton-window plane fit — the scalable-normals hot
loop in VMEM.

The XLA formulation of :func:`pasture_tpu.algorithms.normals.window_fit`
lowers to ~2 x (2w+1) separate fusions, EVERY one of which re-streams
the k threshold registers / 11 moment accumulators through HBM (measured
round 5: ~0.53 s for 2M points at w=64 — ~50x the VPU-compute bound).
This kernel runs both passes per 64K-element block entirely in VMEM: one
HBM read per position stream (plus its two halo neighbours), one write
per moment stream.

Layout trick: window candidates are the +-w flattened-order neighbours
of the Morton-sorted array.  The candidate array rides in THREE block
views (prev/cur/next — the same array with index maps i, i+1, i+2 over a
front-padded copy), so a shift by s (|s| <= w < block) is a lane
roll + row shift + boundary select between two of the views
(compact_kernel._flat_shift_up / voxel_reduce_kernel._flat_shift_down).

Numerics: moments accumulate in EACH QUERY'S OWN FRAME (candidate minus
query), which is shift-invariant for the covariance and strictly better
conditioned than the XLA path's absolute second moments at survey
coordinates.  Selection (k-th-smallest threshold via k sorted
min-registers, ties admitted, finite-candidate guard) matches the XLA
path decision-for-decision.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .fused_transform import _auto_interpret

__all__ = ["window_fit_moments_pallas", "supports_window_fit",
           "WINDOW_BLOCK"]

_LANES = 128
_ROWS = 256
WINDOW_BLOCK = _ROWS * _LANES
_FIN = 3.0e38          # finite-candidate guard (inf marks padding)


def _make_kernel(k: int, w: int):
    rows = _ROWS
    total = rows * _LANES

    def kernel(qx_ref, qy_ref, qz_ref,
               pxp_ref, pxc_ref, pxn_ref,
               pyp_ref, pyc_ref, pyn_ref,
               pzp_ref, pzc_ref, pzn_ref,
               cnt_ref, tight_ref, sx_ref, sy_ref, sz_ref,
               mxx_ref, myy_ref, mzz_ref, mxy_ref, mxz_ref, myz_ref):
        qx, qy, qz = qx_ref[...], qy_ref[...], qz_ref[...]
        # one (3*rows, 128) candidate strip per axis: prev|cur|next — a
        # shift by s becomes ONE dynamic flat shift into the strip.  A
        # fully unrolled 2w+1-shift body blows Mosaic's scoped-VMEM
        # budget (measured 87 MB at w=64); the fori_loop body is ~10^2
        # ops with dynamic roll amounts instead.
        vx = jnp.concatenate([pxp_ref[...], pxc_ref[...], pxn_ref[...]])
        vy = jnp.concatenate([pyp_ref[...], pyc_ref[...], pyn_ref[...]])
        vz = jnp.concatenate([pzp_ref[...], pzc_ref[...], pzn_ref[...]])
        rows3 = 3 * rows
        lane = jax.lax.broadcasted_iota(jnp.int32, qx.shape, 1)

        # every window shift d = total + s (|s| <= w < LANES) needs row
        # offsets in {qlo, qlo + 1, qlo + 2} only, where qlo is the row
        # part of the smallest d.  Row-roll the strip by those three
        # offsets ONCE and slice to the query rows — the per-iteration
        # work is then lane rolls + selects on (rows, LANES) arrays
        # (row-rolling the 3x strip per iteration measured ~3x slower).
        qlo = (total - w) // _LANES

        def base(x, q):
            return pltpu.roll(x, rows3 - q, 0)[:rows]   # x[j + q]

        bases = tuple(tuple(base(v, qlo + j) for j in range(3))
                      for v in (vx, vy, vz))

        def shift_dyn(axis, d):
            """flat y[i] = cand[i + d], d in [total - w, total + w]."""
            q = d // _LANES - qlo                    # 0 or 1
            r = d % _LANES
            b0, b1, b2 = bases[axis]
            a = jnp.where(q == 0, b0, b1)
            b = jnp.where(q == 0, b1, b2)
            rr = jnp.remainder(_LANES - r, _LANES)   # 0 when r == 0
            ar = pltpu.roll(a, rr, 1)
            br = pltpu.roll(b, rr, 1)
            return jnp.where(r == 0, a,
                             jnp.where(lane < _LANES - r, ar, br))

        def d2_at(idx):
            d = idx + (total - w)
            cx = shift_dyn(0, d)
            cy = shift_dyn(1, d)
            cz = shift_dyn(2, d)
            dx = cx - qx
            dy = cy - qy
            dz = cz - qz
            return dx * dx + dy * dy + dz * dz, (cx, cy, cz)

        # ---- pass 1: per-query k-th smallest window distance ----------
        big = jnp.float32(jnp.inf)

        def body1(idx, regs):
            v, _ = d2_at(idx)
            regs = list(regs)
            for i in range(k):
                lo = jnp.minimum(regs[i], v)
                v = jnp.maximum(regs[i], v)
                regs[i] = lo
            return tuple(regs)

        regs0 = tuple(jnp.full(qx.shape, big, jnp.float32)
                      for _ in range(k))
        regs = jax.lax.fori_loop(0, 2 * w + 1, body1, regs0)
        # few-ulp relative margin: the compiler may contract the d2
        # expression (FMA) DIFFERENTLY in the two loops, so pass 2's
        # recomputed d2 for the exact k-th candidate can land an ulp
        # above the stored threshold and silently drop it (measured: ~5%
        # of rows in interpret mode).  The margin re-admits it; it can
        # only also admit a candidate within ~1e-6 relative of the k-th
        # — an effective tie, which the selection policy admits anyway.
        thr = regs[k - 1] * jnp.float32(1.0 + 1e-6)

        # ---- pass 2: query-frame selected moments ---------------------
        def body2(idx, acc):
            (cnt, tight, sx, sy, sz,
             mxx, myy, mzz, mxy, mxz, myz) = acc
            d2, (cx, cy, cz) = d2_at(idx)
            sel = (d2 <= thr) & (cx <= _FIN)
            cnt = cnt + jnp.where(sel, 1.0, 0.0)
            tight = tight + jnp.where(sel, d2, 0.0)
            dx = jnp.where(sel, cx - qx, 0.0)
            dy = jnp.where(sel, cy - qy, 0.0)
            dz = jnp.where(sel, cz - qz, 0.0)
            return (cnt, tight, sx + dx, sy + dy, sz + dz,
                    mxx + dx * dx, myy + dy * dy, mzz + dz * dz,
                    mxy + dx * dy, mxz + dx * dz, myz + dy * dz)

        zero = jnp.zeros(qx.shape, jnp.float32)
        acc = jax.lax.fori_loop(0, 2 * w + 1, body2, (zero,) * 11)
        (cnt, tight, sx, sy, sz,
         mxx, myy, mzz, mxy, mxz, myz) = acc

        cnt_ref[...] = cnt
        tight_ref[...] = tight
        sx_ref[...] = sx
        sy_ref[...] = sy
        sz_ref[...] = sz
        mxx_ref[...] = mxx
        myy_ref[...] = myy
        mzz_ref[...] = mzz
        mxy_ref[...] = mxy
        mxz_ref[...] = mxz
        myz_ref[...] = myz

    return kernel


def supports_window_fit(n: int, w: int, dtype) -> bool:
    """Kernel applicability: f32 and a window no wider than half a lane
    row — the three precomputed row-roll bases cover every shift's row
    offset only while (total+w)//LANES - (total-w)//LANES <= 1 (the
    default window 64 qualifies; wider windows fall back to XLA)."""
    return (jnp.dtype(dtype) == jnp.float32 and 0 < w <= _LANES // 2
            and n >= 1)


@partial(jax.jit, static_argnames=("k", "w", "interpret"))
def window_fit_moments_pallas(sp: jnp.ndarray, pp: jnp.ndarray, k: int,
                              w: int, interpret: bool = None):
    """Selected-neighbourhood moments of the +-``w`` Morton window.

    ``sp``: (n, 3) query positions (rows beyond the caller's valid count
    may hold garbage — their outputs are garbage too, as in the XLA
    path).  ``pp``: (n + 2w, 3) candidate positions, inf where invalid,
    row ``i + w`` aligned with ``sp`` row ``i`` (exactly
    :func:`~pasture_tpu.algorithms.normals.window_fit`'s contract).

    Returns ``(cnt, tight_sum, s (n, 3), m6 (n, 6))`` where ``s``/``m6``
    are query-frame first/second moment SUMS over the selected
    candidates and ``m6`` is ordered (xx, yy, zz, xy, xz, yz).
    """
    interpret = _auto_interpret(interpret)
    n = sp.shape[0]
    L = WINDOW_BLOCK
    nblocks = -(-n // L)
    npad = nblocks * L

    qcols = [jnp.pad(sp[:, a], (0, npad - n)) for a in range(3)]
    # candidate stream: front pad of (L - w) infs aligns candidate block
    # j with query block j-1's "prev" view (see module doc); back pad to
    # (nblocks + 2) whole blocks
    back = (nblocks + 2) * L - (L - w) - pp.shape[0]
    ccols = [jnp.pad(pp[:, a], (L - w, back),
                     constant_values=jnp.inf) for a in range(3)]

    rows_q = npad // _LANES
    rows_c = (nblocks + 2) * L // _LANES
    qs = [c.reshape(rows_q, _LANES) for c in qcols]
    cs = [c.reshape(rows_c, _LANES) for c in ccols]

    qspec = pl.BlockSpec((_ROWS, _LANES), lambda i: (i, 0))
    cspecs = [pl.BlockSpec((_ROWS, _LANES), m) for m in
              (lambda i: (i, 0), lambda i: (i + 1, 0),
               lambda i: (i + 2, 0))]
    outspec = pl.BlockSpec((_ROWS, _LANES), lambda i: (i, 0))

    outs = pl.pallas_call(
        _make_kernel(k, w),
        grid=(nblocks,),
        in_specs=[qspec] * 3 + cspecs * 3,
        out_specs=[outspec] * 11,
        out_shape=[jax.ShapeDtypeStruct((rows_q, _LANES), jnp.float32)]
        * 11,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(qs[0], qs[1], qs[2],
      cs[0], cs[0], cs[0], cs[1], cs[1], cs[1], cs[2], cs[2], cs[2])

    flat = [o.reshape(-1)[:n] for o in outs]
    cnt, tight = flat[0], flat[1]
    s = jnp.stack(flat[2:5], axis=1)
    m6 = jnp.stack(flat[5:11], axis=1)
    return cnt, tight, s, m6
