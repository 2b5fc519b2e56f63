"""Voxel-grid downsampling on device.

TPU-native re-design of pasture's ``voxelgrid_filter``
(reference: pasture-algorithms/src/voxel_grid.rs:109-165): where the
reference scans markers linearly per point and inserts into a sorted Vec
(O(n·v)), this op quantizes positions to integer cells, sorts once by Morton
key, and computes every centroid with segmented reductions — O(n log n) and
fully vectorised.

Per-attribute reduction policies reproduce set_all_attributes
(voxel_grid.rs:443-700):

=====================  ==========================================
mean                   Position3D, ColorRGB, Normal, Intensity, NIR
mode (most common)     ReturnNumber, NumberOfReturns, ScannerChannel,
                       ScanDirectionFlag, EdgeOfFlightLine,
                       Classification, ScanAngleRank, ScanAngle,
                       UserData, PointSourceID
max (clamped at 0)     ClassificationFlags, GpsTime
rejected               the five waveform attributes
=====================  ==========================================

Unknown attributes default to mean for floats and mode for integers (the
reference leaves them zero; policies can be overridden per attribute, which
is the configurable-reduction design the reference's TODO asks for).

Cell-index semantics ``"nearest"`` reproduces the reference's nearest-marker
clamp (voxel_grid.rs:22-51): ``i = clamp(floor((p - min)/leaf - 0.5), 0,
n-1)``; ``"floor"`` is the standard half-open voxel binning.  Averages
accumulate in f32 on device (f64 in the host-exact algorithms layer).
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax.numpy as jnp

from ..buffers.device import PointBatch
from ..layout import attributes as att
from .reductions import (
    batch_bounds, segment_max, segment_mean, segment_mode, segment_sum,
)
from .sort import morton_sort

__all__ = ["voxel_indices", "voxel_downsample", "DEFAULT_POLICIES"]

_MAX_CELL = (1 << 20) - 1  # dual-u32 Morton supports 20 bits per axis

DEFAULT_POLICIES: Dict[str, str] = {
    att.POSITION_3D.name: "mean",
    att.COLOR_RGB.name: "mean",
    att.NORMAL.name: "mean",
    att.INTENSITY.name: "mean",
    att.NIR.name: "mean",
    att.RETURN_NUMBER.name: "mode",
    att.NUMBER_OF_RETURNS.name: "mode",
    att.SCANNER_CHANNEL.name: "mode",
    att.SCAN_DIRECTION_FLAG.name: "mode",
    att.EDGE_OF_FLIGHT_LINE.name: "mode",
    att.CLASSIFICATION.name: "mode",
    att.SCAN_ANGLE_RANK.name: "mode",
    att.SCAN_ANGLE.name: "mode",
    att.USER_DATA.name: "mode",
    att.POINT_SOURCE_ID.name: "mode",
    att.CLASSIFICATION_FLAGS.name: "max",
    att.GPS_TIME.name: "max",
}

_WAVEFORM_NAMES = frozenset({
    att.WAVE_PACKET_DESCRIPTOR_INDEX.name, att.WAVEFORM_DATA_OFFSET.name,
    att.WAVEFORM_PACKET_SIZE.name, att.RETURN_POINT_WAVEFORM_LOCATION.name,
    att.WAVEFORM_PARAMETERS.name,
})


def _cast_as(x: jnp.ndarray, dtype) -> jnp.ndarray:
    """Rust ``as``-style cast of a float reduction result back to the
    column dtype: truncate toward zero + saturate for ints."""
    dtype = jnp.dtype(dtype)
    if jnp.issubdtype(dtype, jnp.floating):
        return x.astype(dtype)
    info = jnp.iinfo(dtype)
    t = jnp.trunc(x)
    t = jnp.where(jnp.isnan(t), 0.0, t)
    return jnp.clip(t, float(info.min), float(info.max)).astype(dtype)


def voxel_indices(positions: jnp.ndarray, mask: jnp.ndarray,
                  leaf_size, bounds_min: jnp.ndarray,
                  semantics: str = "nearest") -> jnp.ndarray:
    """Integer cell indices (N, 3) for each point; invalid rows get the
    maximal index so they sort last."""
    leaf = jnp.broadcast_to(jnp.asarray(leaf_size, positions.dtype), (3,))
    u = (positions - bounds_min[None, :].astype(positions.dtype)) / leaf[None, :]
    if semantics == "nearest":
        idx = jnp.floor(u - 0.5)
    elif semantics == "floor":
        idx = jnp.floor(u)
    else:
        raise ValueError(f"unknown voxel semantics {semantics!r}")
    idx = jnp.clip(idx, 0, _MAX_CELL).astype(jnp.int32)
    return jnp.where(mask[:, None], idx, _MAX_CELL)


def voxel_downsample(batch: PointBatch, leaf_size,
                     bounds: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None,
                     policies: Optional[Dict[str, str]] = None,
                     semantics: str = "nearest",
                     position_attribute: str = att.POSITION_3D.name,
                     ) -> PointBatch:
    """Voxel-grid downsample a batch; returns a batch of voxel centroids
    (same schema/capacity, ``count`` = number of occupied voxels, ordered by
    Morton code — the reference orders voxels by (x,y,z) tuple instead).
    """
    if position_attribute not in batch.data:
        raise ValueError(
            f"batch has no {position_attribute!r} attribute, required for "
            f"voxel grid construction")
    for name in batch.data:
        if name in _WAVEFORM_NAMES:
            raise ValueError("waveform data currently not supported "
                             "(voxel_grid.rs:452-459 parity)")

    pol = dict(DEFAULT_POLICIES)
    if policies:
        pol.update(policies)

    pos = batch.data[position_attribute]
    mask = batch.valid_mask()
    if bounds is None:
        bmin, _ = batch_bounds(pos, mask)
    else:
        bmin = jnp.asarray(bounds[0])

    cells = voxel_indices(pos, mask, leaf_size, bmin, semantics)
    sorted_batch, (hi, lo), perm = morton_sort(batch, cells)
    valid_sorted = perm < batch.count  # valid rows are a sorted prefix

    cap = batch.capacity
    new_seg = jnp.concatenate([
        jnp.ones((1,), bool),
        (hi[1:] != hi[:-1]) | (lo[1:] != lo[:-1])])
    seg_start = new_seg & valid_sorted
    seg_id_valid = jnp.cumsum(seg_start.astype(jnp.int32)) - 1
    num_voxels = jnp.sum(seg_start.astype(jnp.int32))
    # invalid rows go to the overflow segment `cap`, sliced off below
    seg_id = jnp.where(valid_sorted, jnp.clip(seg_id_valid, 0, cap - 1), cap)
    nseg = cap + 1

    counts = segment_sum(jnp.ones(cap, jnp.float32), seg_id, nseg)

    out_data = {}
    for name, col in sorted_batch.data.items():
        dtype = col.dtype
        p = pol.get(name)
        if p is None:
            p = "mean" if jnp.issubdtype(dtype, jnp.floating) else "mode"
        if p == "mean":
            acc = jnp.float64 if col.dtype == jnp.float64 else jnp.float32
            red = segment_mean(col, seg_id, nseg, counts=counts,
                               acc_dtype=acc)[:cap]
            out_data[name] = _cast_as(red, dtype)
        elif p == "mode":
            if col.ndim != 1:
                raise ValueError(f"mode policy needs a scalar column: {name}")
            red = segment_mode(col, seg_id, nseg)[:cap]
            out_data[name] = _cast_as(red.astype(jnp.float32), dtype)
        elif p == "max":
            # reference centroid_max_pool starts its running max at 0.0
            # (voxel_grid.rs:168-216), clamping negatives to zero
            acc = col.dtype if jnp.issubdtype(col.dtype, jnp.floating) \
                else jnp.float32
            red = segment_max(col.astype(acc), seg_id, nseg)[:cap]
            out_data[name] = _cast_as(jnp.maximum(red, 0.0), dtype)
        else:
            raise ValueError(f"unknown reduction policy {p!r} for {name!r}")

    return PointBatch(out_data, num_voxels.astype(jnp.int32), batch.schema,
                      batch.meta)
