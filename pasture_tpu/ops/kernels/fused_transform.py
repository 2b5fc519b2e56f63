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
           "fused_voxel_head"]

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
