"""Position transforms on device.

The device analog of pasture's LAS position decode/encode
(reference: pasture-io/src/las/raw_readers.rs:39-58 and
write_helpers.rs:10-24) and of the per-point coordinate transforms that the
reference runs through PROJ or nalgebra.  All ops are elementwise over SoA
columns — XLA fuses them into surrounding kernels.

Precision model (SURVEY.md §7 hard part (a)): TPUs have no fast f64, so
world positions on device are f32 *relative to a per-batch f64 anchor* kept
in ``meta``.  Decoding LAS i32 local coords against the anchor loses nothing:
``(local - local_anchor) * scale`` stays within f32's 24-bit mantissa for any
realistic tile extent, which is the same trick the LAS format itself uses.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp

__all__ = [
    "decode_las_positions", "encode_las_positions",
    "affine_transform", "transform_positions",
]


def decode_las_positions(local: jnp.ndarray, scale: jnp.ndarray,
                         offset: jnp.ndarray,
                         anchor: Optional[jnp.ndarray] = None,
                         dtype=jnp.float32) -> jnp.ndarray:
    """i32 local coords -> world positions (raw_readers.rs:39-50 semantics).

    With ``anchor`` (i32 local-space anchor, e.g. the batch min), positions
    are returned relative to the anchor in ``dtype``: exact in f32 for
    realistic extents.  Without it, the absolute position is computed in
    ``dtype`` directly (lossy in f32 for large UTM-style offsets).
    """
    if anchor is not None:
        rel = (local - anchor[None, :]).astype(dtype)
        return rel * scale.astype(dtype)[None, :]
    return local.astype(dtype) * scale.astype(dtype)[None, :] \
        + offset.astype(dtype)[None, :]


def encode_las_positions(world: jnp.ndarray, scale: jnp.ndarray,
                         offset: Optional[jnp.ndarray] = None,
                         anchor: Optional[jnp.ndarray] = None,
                         rounding: str = "trunc") -> jnp.ndarray:
    """World -> i32 local coords.  ``rounding="trunc"`` truncates toward zero
    (write_helpers.rs:10-24 ``as i64`` parity, minus the range panic —
    clamping saturates on device); ``"round"`` rounds to nearest, which makes
    decode->encode an exact bit round trip."""
    w = world
    if offset is not None:
        w = w - offset[None, :].astype(w.dtype)
    q = w / scale[None, :].astype(w.dtype)
    q = jnp.trunc(q) if rounding == "trunc" else jnp.round(q)
    q = jnp.clip(q, float(jnp.iinfo(jnp.int32).min),
                 float(jnp.iinfo(jnp.int32).max)).astype(jnp.int32)
    if anchor is not None:
        q = q + anchor[None, :]
    return q


def affine_transform(positions: jnp.ndarray, matrix: jnp.ndarray,
                     translation: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """``p @ M^T + t`` over an (N, 3) column.  A 3x3 ``matrix`` (+optional
    translation) or a 4x4 homogeneous matrix are accepted.  The matmul hits
    the MXU for large N."""
    if matrix.shape == (4, 4):
        translation = matrix[:3, 3]
        matrix = matrix[:3, :3]
    out = positions @ matrix.T.astype(positions.dtype)
    if translation is not None:
        out = out + translation[None, :].astype(positions.dtype)
    return out


def transform_positions(positions: jnp.ndarray, rotation: jnp.ndarray,
                        translation: jnp.ndarray) -> jnp.ndarray:
    """Rigid SE(3) transform — the ICP/pose-graph building block."""
    return affine_transform(positions, rotation, translation)
