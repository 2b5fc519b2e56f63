"""Fused decode + rigid transform + Morton key as one Pallas kernel.

The pipeline head (i32 local -> world f32 -> rotate/translate -> quantize ->
Morton key) is elementwise; XLA fuses it well already, but doing it in one
Pallas kernel guarantees a single HBM pass regardless of surrounding
graph structure and is the template for further hand kernels.  Data is
processed in (BLOCK, 128)-shaped column tiles (VPU lanes = 128).

Layout note: positions arrive as three separate 1-D component arrays (SoA),
each reshaped to (N/128, 128) tiles — the per-point vec3 stays in VMEM
registers, never materialised interleaved.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["fused_decode_transform_key", "fused_world_bounds",
           "fused_voxel_head", "fused_voxel_head_exact_local",
           "exact_local_max_leaf"]

_LANES = 128


def _auto_interpret(interpret):
    """None -> run the kernel in interpret mode on CPU backends (tests,
    host-only environments) and compiled on TPU."""
    return jax.default_backend() == "cpu" if interpret is None else interpret
_BLOCK_ROWS = 256  # rows of 128 lanes per grid step -> 32k points/block


def _expand10(v):
    v = v & jnp.uint32(0x3FF)
    v = (v | (v << 16)) & jnp.uint32(0x030000FF)
    v = (v | (v << 8)) & jnp.uint32(0x0300F00F)
    v = (v | (v << 4)) & jnp.uint32(0x030C30C3)
    v = (v | (v << 2)) & jnp.uint32(0x09249249)
    return v


def _kernel(lx_ref, ly_ref, lz_ref, params_ref,
            x_ref, y_ref, z_ref, key_ref):
    p = params_ref[:]
    scale = p[0:3]
    rot = p[3:12].reshape(3, 3)
    trans = p[12:15]
    bmin = p[15:18]
    inv_leaf = p[18]

    wx = lx_ref[:].astype(jnp.float32) * scale[0]
    wy = ly_ref[:].astype(jnp.float32) * scale[1]
    wz = lz_ref[:].astype(jnp.float32) * scale[2]

    tx = rot[0, 0] * wx + rot[0, 1] * wy + rot[0, 2] * wz + trans[0]
    ty = rot[1, 0] * wx + rot[1, 1] * wy + rot[1, 2] * wz + trans[1]
    tz = rot[2, 0] * wx + rot[2, 1] * wy + rot[2, 2] * wz + trans[2]

    cx = jnp.clip(jnp.floor((tx - bmin[0]) * inv_leaf), 0, 1023)
    cy = jnp.clip(jnp.floor((ty - bmin[1]) * inv_leaf), 0, 1023)
    cz = jnp.clip(jnp.floor((tz - bmin[2]) * inv_leaf), 0, 1023)

    # Mosaic supports f32->i32 but not f32->u32; values are clipped >= 0
    key = (_expand10(cx.astype(jnp.int32).astype(jnp.uint32))
           | (_expand10(cy.astype(jnp.int32).astype(jnp.uint32)) << 1)
           | (_expand10(cz.astype(jnp.int32).astype(jnp.uint32)) << 2))

    x_ref[:] = tx
    y_ref[:] = ty
    z_ref[:] = tz
    key_ref[:] = key


@partial(jax.jit, static_argnames=("interpret",))
def fused_decode_transform_key(local: jnp.ndarray, scale: jnp.ndarray,
                               rotation: jnp.ndarray,
                               translation: jnp.ndarray,
                               bounds_min: jnp.ndarray, leaf_size,
                               interpret: bool = None):
    """(N, 3) i32 local coords -> (world (N, 3) f32, morton key (N,) u32).

    ``N`` must be a multiple of 32768 (pad the batch); the grid is 1024^3
    cells over ``bounds_min`` + ``leaf_size``.
    """
    interpret = _auto_interpret(interpret)
    n = local.shape[0]
    tile = _BLOCK_ROWS * _LANES
    assert n % tile == 0, f"N must be a multiple of {tile}"
    rows = n // _LANES

    params = jnp.concatenate([
        scale.astype(jnp.float32).reshape(3),
        rotation.astype(jnp.float32).reshape(9),
        translation.astype(jnp.float32).reshape(3),
        bounds_min.astype(jnp.float32).reshape(3),
        jnp.asarray([1.0 / leaf_size], jnp.float32),
    ])

    comps = [local[:, i].reshape(rows, _LANES) for i in range(3)]
    grid = (rows // _BLOCK_ROWS,)
    block = pl.BlockSpec((_BLOCK_ROWS, _LANES), lambda i: (i, 0))
    pspec = pl.BlockSpec((19,), lambda i: (0,))

    x, y, z, key = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[block, block, block, pspec],
        out_specs=[block, block, block, block],
        out_shape=[
            jax.ShapeDtypeStruct((rows, _LANES), jnp.float32),
            jax.ShapeDtypeStruct((rows, _LANES), jnp.float32),
            jax.ShapeDtypeStruct((rows, _LANES), jnp.float32),
            jax.ShapeDtypeStruct((rows, _LANES), jnp.uint32),
        ],
        interpret=interpret,
    )(comps[0], comps[1], comps[2], params)

    world = jnp.stack([x.reshape(n), y.reshape(n), z.reshape(n)], axis=1)
    return world, key.reshape(n)


# ---- fused voxel-pipeline head ---------------------------------------------
# decode + rigid transform + Morton key + quantized in-cell residuals in ONE
# HBM pass, never materialising world positions (the voxel pipeline
# reconstructs centroids from key + mean residual; ops/voxel.py).  A second
# tiny kernel reduces per-block world minima for grid anchoring.

def _bounds_kernel(lx_ref, ly_ref, lz_ref, params_ref, out_ref):
    p = params_ref[:]
    scale, rot, trans = p[0:3], p[3:12].reshape(3, 3), p[12:15]
    wx = lx_ref[:].astype(jnp.float32) * scale[0]
    wy = ly_ref[:].astype(jnp.float32) * scale[1]
    wz = lz_ref[:].astype(jnp.float32) * scale[2]
    tx = rot[0, 0] * wx + rot[0, 1] * wy + rot[0, 2] * wz + trans[0]
    ty = rot[1, 0] * wx + rot[1, 1] * wy + rot[1, 2] * wz + trans[1]
    tz = rot[2, 0] * wx + rot[2, 1] * wy + rot[2, 2] * wz + trans[2]
    # per-block minima/maxima land in SMEM (scalar stores); the whole
    # (grid, 6) output is mapped to every step, indexed by program_id
    i = pl.program_id(0)
    out_ref[i, 0] = jnp.min(tx)
    out_ref[i, 1] = jnp.min(ty)
    out_ref[i, 2] = jnp.min(tz)
    out_ref[i, 3] = jnp.max(tx)
    out_ref[i, 4] = jnp.max(ty)
    out_ref[i, 5] = jnp.max(tz)


@partial(jax.jit, static_argnames=("interpret",))
def fused_world_bounds(local: jnp.ndarray, scale: jnp.ndarray,
                       rotation: jnp.ndarray, translation: jnp.ndarray,
                       interpret: bool = None):
    """(min, max) world AABB of transformed local coords in one fused pass
    (no world-position materialisation)."""
    interpret = _auto_interpret(interpret)
    n = local.shape[0]
    tile = _BLOCK_ROWS * _LANES
    assert n % tile == 0, f"N must be a multiple of {tile}"
    rows = n // _LANES
    params = jnp.concatenate([
        scale.astype(jnp.float32).reshape(3),
        rotation.astype(jnp.float32).reshape(9),
        translation.astype(jnp.float32).reshape(3),
    ])
    comps = [local[:, i].reshape(rows, _LANES) for i in range(3)]
    grid = (rows // _BLOCK_ROWS,)
    block = pl.BlockSpec((_BLOCK_ROWS, _LANES), lambda i: (i, 0))
    out = pl.pallas_call(
        _bounds_kernel,
        grid=grid,
        in_specs=[block, block, block, pl.BlockSpec((15,), lambda i: (0,))],
        out_specs=pl.BlockSpec((grid[0], 6), lambda i: (0, 0),
                               memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((grid[0], 6), jnp.float32),
        interpret=interpret,
    )(comps[0], comps[1], comps[2], params)
    return jnp.min(out[:, 0:3], axis=0), jnp.max(out[:, 3:6], axis=0)


def _make_head_kernel(qbits: int, nearest: bool):
    qmax = float((1 << qbits) - 1)
    qscale = float(1 << qbits) / (1.5 if nearest else 1.0)

    def kernel(lx_ref, ly_ref, lz_ref, params_ref, key_ref, q_ref):
        p = params_ref[:]
        scale, rot, trans = p[0:3], p[3:12].reshape(3, 3), p[12:15]
        bmin, inv_leaf = p[15:18], p[18]
        wx = lx_ref[:].astype(jnp.float32) * scale[0]
        wy = ly_ref[:].astype(jnp.float32) * scale[1]
        wz = lz_ref[:].astype(jnp.float32) * scale[2]
        tx = rot[0, 0] * wx + rot[0, 1] * wy + rot[0, 2] * wz + trans[0]
        ty = rot[1, 0] * wx + rot[1, 1] * wy + rot[1, 2] * wz + trans[1]
        tz = rot[2, 0] * wx + rot[2, 1] * wy + rot[2, 2] * wz + trans[2]
        ux = (tx - bmin[0]) * inv_leaf
        uy = (ty - bmin[1]) * inv_leaf
        uz = (tz - bmin[2]) * inv_leaf
        if nearest:
            cx = jnp.clip(jnp.floor(ux - 0.5), 0, 1023)
            cy = jnp.clip(jnp.floor(uy - 0.5), 0, 1023)
            cz = jnp.clip(jnp.floor(uz - 0.5), 0, 1023)
        else:
            cx = jnp.clip(jnp.floor(ux), 0, 1023)
            cy = jnp.clip(jnp.floor(uy), 0, 1023)
            cz = jnp.clip(jnp.floor(uz), 0, 1023)
        # Mosaic supports f32->i32 but not f32->u32 (values clipped >= 0)
        key_ref[:] = (
            _expand10(cx.astype(jnp.int32).astype(jnp.uint32))
            | (_expand10(cy.astype(jnp.int32).astype(jnp.uint32)) << 1)
            | (_expand10(cz.astype(jnp.int32).astype(jnp.uint32)) << 2))
        qx = jnp.clip(jnp.floor((ux - cx) * qscale), 0, qmax)
        qy = jnp.clip(jnp.floor((uy - cy) * qscale), 0, qmax)
        qz = jnp.clip(jnp.floor((uz - cz) * qscale), 0, qmax)
        q_ref[:] = (
            (qx.astype(jnp.int32).astype(jnp.uint32) << (2 * qbits))
            | (qy.astype(jnp.int32).astype(jnp.uint32) << qbits)
            | qz.astype(jnp.int32).astype(jnp.uint32))
    return kernel


# ---- EXACT pipeline head: integer local-coordinate residuals ---------------
# The rigid transform is affine, so the per-voxel centroid commutes with it:
# mean(world) = affine(mean(local)).  Each point's i32 LAS local coordinate
# is carried as an EXACT 10-bit integer residual relative to a per-cell
# deterministic base (the inverse affine of the cell's reference world
# point, floored, minus 512) — three residuals packed into ONE u32 sort
# operand.  Residual sums over <=4096-point segments stay exact in f32
# (<= 2^22), so the voxel centroid is the affine image of the EXACT local
# mean: strictly more accurate than summing rounded f32 world positions,
# with no quantization anywhere.  This cuts the voxel sort from 5 operands
# (key, word, x, y, z) to 3 (key, word, resword): sort cost on TPU scales
# with operand count (benches/sort_ablation.py).
#
# Contract: the residual window must fit 10 bits.  Points of a cell lie
# within L-inf distance sqrt(3)*halfwidth_u*leaf/scale_a of the cell's
# reference point in local units (rotation rows have unit L2 norm), so the
# path requires leaf_size <= exact_local_max_leaf(scale, semantics).
#
# Determinism: the per-cell base MUST be bit-identical between the head
# (residual encode) and the reduce kernel (centroid reconstruction); an
# f32 floor of the inverse affine is fragile (different backends/fusion
# round differently near integers and the floor flips).  The base is
# therefore an INTEGER fixed-point function of the cell,
#     base_a = ((M[a,0]*cx + M[a,1]*cy + M[a,2]*cz + C_lo[a]) >> 8)
#              + C_hi[a] - 512,
# with (M, C_hi, C_lo) computed ONCE (exact_local_base_coeffs) and passed
# to both kernels — integer arithmetic is exact everywhere.  Coefficient
# rounding costs < ~8 local units of window margin (guarded in
# exact_local_max_leaf).

def exact_local_max_leaf(scale, semantics: str = "floor") -> float:
    """Largest ``leaf_size`` the exact-local residual path supports
    (10-bit window; 12-unit guard for fixed-point base rounding)."""
    halfwidth_u = 0.75 if semantics == "nearest" else 0.5
    import numpy as _onp
    smin = float(_onp.min(_onp.asarray(scale)))
    return (499.0 / (3.0 ** 0.5 * halfwidth_u)) * smin


_BASE_SHIFT = 8  # fixed-point fractional bits of the base coefficients


def exact_local_base_coeffs(scale: jnp.ndarray, rotation: jnp.ndarray,
                            translation: jnp.ndarray,
                            bounds_min: jnp.ndarray, leaf_size: float,
                            semantics: str = "floor") -> jnp.ndarray:
    """(15,) i32 fixed-point base coefficients (M row-major, C_hi, C_lo)
    shared by the exact-local head and reduce kernels.  Compute ONCE per
    pipeline and pass the same array to both (determinism contract)."""
    mid = 0.75 if semantics == "nearest" else 0.5
    # Runtime contract enforcement: residuals are clipped to [0, 1023] in
    # the head kernel, so a too-large leaf would yield wrong centroids with
    # no error.  leaf_size and scale are host-known in every caller; the
    # check is skipped only when scale is an abstract tracer (and then the
    # caller computed coeffs concretely beforehand anyway).
    import jax.core as _jcore
    if not isinstance(scale, _jcore.Tracer) \
            and not isinstance(leaf_size, _jcore.Tracer):
        max_leaf = exact_local_max_leaf(scale, semantics)
        if float(leaf_size) > max_leaf:
            raise ValueError(
                f"exact-local residual path: leaf_size {float(leaf_size)} "
                f"exceeds exact_local_max_leaf(scale, {semantics!r}) = "
                f"{max_leaf:.6g}; residuals would overflow the 10-bit "
                f"window and be silently clipped")
    scale = scale.astype(jnp.float32).reshape(3)
    rot = rotation.astype(jnp.float32).reshape(3, 3)
    trans = translation.astype(jnp.float32).reshape(3)
    bmin = bounds_min.astype(jnp.float32).reshape(3)
    leaf = jnp.float32(leaf_size)
    # l_ref_a(c) = sum_b Rinv[a,b]*((c_b+mid)*leaf + bmin_b - t_b)/scale_a
    # Rinv = rot^T; split into per-cell slope M and constant C = Chi+Clo
    #
    # LAYOUT-BUG WORKAROUND (found by bench.py's device-vs-CPU numeric
    # verification, round 4): on the tunneled TPU backend,
    # ``jnp.round(x.T * ...)`` rounds the UNDERLYING BUFFER and drops the
    # transpose — the off-diagonal coefficients came back sign-flipped,
    # residuals overflowed their window and centroids were silently wrong
    # on device.  Collapsing to 1-D BEFORE the round sidesteps the broken
    # round-on-transposed-layout pattern (verified on-chip; the reshape
    # itself lowers correctly).
    m9 = (rot.T * leaf / scale[:, None] * float(1 << _BASE_SHIFT)
          ).reshape(9)
    const = jnp.sum(rot.T * (mid * leaf + bmin - trans)[None, :],
                    axis=1) / scale
    c_hi = jnp.floor(const)
    c_lo = jnp.round((const - c_hi) * float(1 << _BASE_SHIFT))
    return jnp.concatenate([
        jnp.round(m9).astype(jnp.int32),
        c_hi.astype(jnp.int32), c_lo.astype(jnp.int32)])


def _int_cell_base(coef, cx, cy, cz, axis):
    """base_a from i32 cell coords — identical integer expression in head
    and reduce kernels (bit-exact on every backend)."""
    m = coef[3 * axis:3 * axis + 3]
    acc = m[0] * cx + m[1] * cy + m[2] * cz + coef[12 + axis]
    return (acc >> _BASE_SHIFT) + coef[9 + axis] - 512


def _make_exact_local_head_kernel(nearest: bool):
    def kernel(lx_ref, ly_ref, lz_ref, params_ref, coef_ref,
               key_ref, r_ref):
        p = params_ref[:]
        scale, rot, trans = p[0:3], p[3:12].reshape(3, 3), p[12:15]
        bmin, inv_leaf = p[15:18], p[18]
        coef = coef_ref[:]
        lx = lx_ref[:]
        ly = ly_ref[:]
        lz = lz_ref[:]
        wx = lx.astype(jnp.float32) * scale[0]
        wy = ly.astype(jnp.float32) * scale[1]
        wz = lz.astype(jnp.float32) * scale[2]
        tx = rot[0, 0] * wx + rot[0, 1] * wy + rot[0, 2] * wz + trans[0]
        ty = rot[1, 0] * wx + rot[1, 1] * wy + rot[1, 2] * wz + trans[1]
        tz = rot[2, 0] * wx + rot[2, 1] * wy + rot[2, 2] * wz + trans[2]
        ux = (tx - bmin[0]) * inv_leaf
        uy = (ty - bmin[1]) * inv_leaf
        uz = (tz - bmin[2]) * inv_leaf
        if nearest:
            cxf = jnp.clip(jnp.floor(ux - 0.5), 0, 1023)
            cyf = jnp.clip(jnp.floor(uy - 0.5), 0, 1023)
            czf = jnp.clip(jnp.floor(uz - 0.5), 0, 1023)
        else:
            cxf = jnp.clip(jnp.floor(ux), 0, 1023)
            cyf = jnp.clip(jnp.floor(uy), 0, 1023)
            czf = jnp.clip(jnp.floor(uz), 0, 1023)
        cx = cxf.astype(jnp.int32)
        cy = cyf.astype(jnp.int32)
        cz = czf.astype(jnp.int32)
        key_ref[:] = (
            _expand10(cx.astype(jnp.uint32))
            | (_expand10(cy.astype(jnp.uint32)) << 1)
            | (_expand10(cz.astype(jnp.uint32)) << 2))
        rx = jnp.clip(lx - _int_cell_base(coef, cx, cy, cz, 0), 0, 1023)
        ry = jnp.clip(ly - _int_cell_base(coef, cx, cy, cz, 1), 0, 1023)
        rz = jnp.clip(lz - _int_cell_base(coef, cx, cy, cz, 2), 0, 1023)
        r_ref[:] = ((rx.astype(jnp.uint32) << 20)
                    | (ry.astype(jnp.uint32) << 10)
                    | rz.astype(jnp.uint32))
    return kernel


@partial(jax.jit, static_argnames=("leaf_size", "semantics", "interpret"))
def fused_voxel_head_exact_local(local: jnp.ndarray, scale: jnp.ndarray,
                                 rotation: jnp.ndarray,
                                 translation: jnp.ndarray,
                                 bounds_min: jnp.ndarray, leaf_size: float,
                                 coeffs: jnp.ndarray,
                                 semantics: str = "floor",
                                 interpret: bool = None):
    """(N,) Morton keys + (N,) packed EXACT 10-bit local residual words
    for the exact voxel pipeline (``voxel_downsample``
    ``precomputed=(keys, resword)`` + ``local_affine=``), one HBM pass
    over i32 locals.  ``coeffs`` is the shared
    :func:`exact_local_base_coeffs` array (pass the SAME array to
    ``voxel_downsample``).  Requires
    ``leaf_size <= exact_local_max_leaf(scale, semantics)``."""
    interpret = _auto_interpret(interpret)
    n = local.shape[0]
    tile = _BLOCK_ROWS * _LANES
    assert n % tile == 0, f"N must be a multiple of {tile}"
    rows = n // _LANES
    params = jnp.concatenate([
        scale.astype(jnp.float32).reshape(3),
        rotation.astype(jnp.float32).reshape(9),
        translation.astype(jnp.float32).reshape(3),
        bounds_min.astype(jnp.float32).reshape(3),
        jnp.asarray([1.0 / leaf_size], jnp.float32),
    ])
    comps = [local[:, i].reshape(rows, _LANES) for i in range(3)]
    grid = (rows // _BLOCK_ROWS,)
    block = pl.BlockSpec((_BLOCK_ROWS, _LANES), lambda i: (i, 0))
    key, rword = pl.pallas_call(
        _make_exact_local_head_kernel(semantics == "nearest"),
        grid=grid,
        in_specs=[block, block, block,
                  pl.BlockSpec((19,), lambda i: (0,)),
                  pl.BlockSpec((15,), lambda i: (0,))],
        out_specs=[block, block],
        out_shape=[
            jax.ShapeDtypeStruct((rows, _LANES), jnp.uint32),
            jax.ShapeDtypeStruct((rows, _LANES), jnp.uint32),
        ],
        interpret=interpret,
    )(comps[0], comps[1], comps[2], params,
      coeffs.astype(jnp.int32))
    return key.reshape(n), rword.reshape(n)


@partial(jax.jit,
         static_argnames=("leaf_size", "qbits", "semantics", "interpret"))
def fused_voxel_head(local: jnp.ndarray, scale: jnp.ndarray,
                     rotation: jnp.ndarray, translation: jnp.ndarray,
                     bounds_min: jnp.ndarray, leaf_size: float,
                     qbits: int = 10, semantics: str = "floor",
                     interpret: bool = None):
    """(N,) Morton keys + (N,) packed q-bit residual words for the
    quantized voxel pipeline (``voxel_downsample`` ``precomputed=``), one
    HBM pass over i32 locals.  Residual windows match ops/voxel.py: [0, 1)
    leaves for ``floor``, [0, 1.5) for ``nearest`` (low-edge clamp)."""
    interpret = _auto_interpret(interpret)
    n = local.shape[0]
    tile = _BLOCK_ROWS * _LANES
    assert n % tile == 0, f"N must be a multiple of {tile}"
    assert 3 * qbits <= 32
    rows = n // _LANES
    params = jnp.concatenate([
        scale.astype(jnp.float32).reshape(3),
        rotation.astype(jnp.float32).reshape(9),
        translation.astype(jnp.float32).reshape(3),
        bounds_min.astype(jnp.float32).reshape(3),
        jnp.asarray([1.0 / leaf_size], jnp.float32),
    ])
    comps = [local[:, i].reshape(rows, _LANES) for i in range(3)]
    grid = (rows // _BLOCK_ROWS,)
    block = pl.BlockSpec((_BLOCK_ROWS, _LANES), lambda i: (i, 0))
    key, qword = pl.pallas_call(
        _make_head_kernel(qbits, semantics == "nearest"),
        grid=grid,
        in_specs=[block, block, block, pl.BlockSpec((19,), lambda i: (0,))],
        out_specs=[block, block],
        out_shape=[
            jax.ShapeDtypeStruct((rows, _LANES), jnp.uint32),
            jax.ShapeDtypeStruct((rows, _LANES), jnp.uint32),
        ],
        interpret=interpret,
    )(comps[0], comps[1], comps[2], params)
    return key.reshape(n), qword.reshape(n)
