"""Voxel-grid downsampling on device.

TPU-native re-design of pasture's ``voxelgrid_filter``
(reference: pasture-algorithms/src/voxel_grid.rs:109-165): where the
reference scans markers linearly per point and inserts into a sorted Vec
(O(n·v)), this op quantizes positions to integer cells and regroups with
Morton-key sorts.

Implementation notes (measured on v5e): XLA lowers big gathers and
scatter-based segmented reductions to element-at-a-time loops (~100-250ms
for 4M rows), so the pipeline avoids both entirely —

1. ONE key sort that carries every payload column through the sort network
   (no post-sort gather).  Sort cost scales with OPERAND COUNT (~0.8ms
   per extra u32 operand on a tiled 4M sort; u64 operands cost MORE than
   two u32s — benches/sort_ablation.py), so narrow integer payloads are
   bit-packed into the low bits of the secondary sort key — the first
   mode column's values occupy the TOP bits of that word, grouping runs
   for free — and the exact-local path packs all three position
   components into ONE u32 residual word;
2. segmented reductions as reverse segmented jump scans over the
   contiguous segments (pasture_tpu.ops.segscan), totals landing on each
   segment's first row;
3. staged-shift prefix compaction (pasture_tpu.ops.compact) moving first
   rows to the front — shift/select passes at HBM speed instead of a
   second key sort (measured ~1.1ms vs ~10ms for 4M rows).

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

Unknown attributes default to mean for floats and mode for integers; ties
in mode go to the smallest value (the reference's HashMap iteration is
nondeterministic there).  Cell-index semantics ``"nearest"`` reproduces the
reference's nearest-marker clamp (voxel_grid.rs:22-51); ``"floor"`` is
standard voxel binning.  Averages accumulate in f32 on device (f64 when the
column is f64 — the host-exact algorithms layer is always f64).

``grid_bits`` bounds the cell grid per axis: 10 (default 1024³ cells) uses
a single u32 Morton sort key; up to 20 uses a dual-u32 key (two-key sort,
~40% slower).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from ..buffers.device import PointBatch
from ..layout import attributes as att
from ..math.morton import (_expand10_u32, morton_decode_u32,
                           morton_encode_dual32)
from .compact import compact_columns, pack_int_columns, unpack_int_columns
from .reductions import batch_bounds
from .segscan import (seg_totals_lexmax2, seg_totals_max, seg_totals_sum,
                      seg_totals_top2_lexmax2, seg_totals_top2_max)

__all__ = ["voxel_indices", "voxel_downsample", "DEFAULT_POLICIES"]

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

import numpy as _np

# numpy scalar, NOT jnp: a module-level jnp constant would become a leaked
# tracer if this module were first imported inside a jit trace
_INVALID_KEY = _np.uint32(0xFFFFFFFF)

# tests may force the fused Pallas reduce path on/off (None = auto:
# real accelerator only — interpret mode is too slow for production use)
_FORCE_FUSED_REDUCE = None

# Pallas blockwise bitonic tile sort (kernels/tile_sort_kernel): replaces
# lax.sort for the tiled hot path when the operands are 32-bit and the tile
# length is a supported power of two.  OFF by default (None = off): the
# VMEM-resident 45-substage network measured 2.7x SLOWER than XLA's sort
# for the headline shape (632 vs 1142 Mpts/s end-to-end on v5e, round 4) —
# XLA's sort network is compute-bound, not HBM-bound, and already
# well-tuned for batched row sorts; see benches/sort_ablation.py and
# README "sort kernel ablation".  True forces it on (A/B probes, tests).
_FORCE_PALLAS_TILE_SORT = None


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
                  semantics: str = "nearest",
                  grid_bits: int = 20) -> jnp.ndarray:
    """Integer cell indices (N, 3) for each point; invalid rows get the
    maximal index so they sort last."""
    max_cell = (1 << grid_bits) - 1
    leaf = jnp.broadcast_to(jnp.asarray(leaf_size, positions.dtype), (3,))
    u = (positions - bounds_min[None, :].astype(positions.dtype)) / leaf[None, :]
    if semantics == "nearest":
        idx = jnp.floor(u - 0.5)
    elif semantics == "floor":
        idx = jnp.floor(u)
    else:
        raise ValueError(f"unknown voxel semantics {semantics!r}")
    idx = jnp.clip(idx, 0, max_cell).astype(jnp.int32)
    return jnp.where(mask[:, None], idx, max_cell)


def _keys(cells: jnp.ndarray, mask: jnp.ndarray, grid_bits: int
          ) -> List[jnp.ndarray]:
    """Sort keys: one u32 Morton key for <=10-bit grids, else (hi, lo);
    invalid rows get the maximal key."""
    cu = cells.astype(jnp.uint32)
    if grid_bits <= 10:
        key = (_expand10_u32(cu[:, 0]) | (_expand10_u32(cu[:, 1]) << 1)
               | (_expand10_u32(cu[:, 2]) << 2))
        return [jnp.where(mask, key, _INVALID_KEY)]
    hi, lo = morton_encode_dual32(cu[:, 0], cu[:, 1], cu[:, 2])
    return [jnp.where(mask, hi, _INVALID_KEY), jnp.where(mask, lo, _INVALID_KEY)]


def _flatten_cols(data: Dict[str, jnp.ndarray]):
    """Split (N, C) columns into C 1-D operands; remember the layout."""
    ops, layout = [], []
    for name, col in data.items():
        if col.ndim == 1:
            layout.append((name, 1))
            ops.append(col)
        else:
            layout.append((name, col.shape[1]))
            ops.extend(col[:, i] for i in range(col.shape[1]))
    return ops, layout


def _unflatten_cols(ops, layout):
    out, i = {}, 0
    for name, c in layout:
        if c == 1:
            out[name] = ops[i]
            i += 1
        else:
            out[name] = jnp.stack(ops[i:i + c], axis=1)
            i += c
    return out


def voxel_downsample(batch: PointBatch, leaf_size,
                     bounds: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None,
                     policies: Optional[Dict[str, str]] = None,
                     semantics: str = "nearest",
                     position_attribute: str = att.POSITION_3D.name,
                     grid_bits: int = 20,
                     position_quantization_bits: Optional[int] = None,
                     sort_tiles: int = 1,
                     precomputed: Optional[Tuple[jnp.ndarray, jnp.ndarray]]
                     = None,
                     local_affine: Optional[Tuple[jnp.ndarray, jnp.ndarray,
                                                  jnp.ndarray, jnp.ndarray]]
                     = None,
                     with_aux: bool = False,
                     mode_runs: bool = False) -> PointBatch:
    """Voxel-grid downsample a batch; returns a batch of voxel centroids
    (same schema/capacity, ``count`` = number of occupied voxels, ordered by
    Morton code — the reference orders voxels by (x,y,z) tuple instead).

    ``position_quantization_bits`` (opt-in fast path, default off = exact):
    carry each point's in-cell position as a q-bit residual packed into ONE
    u32 sort operand instead of three f32 operands, cutting the dominant
    sort cost by ~2 operands.  Centroids then deviate from the exact mean
    by at most ``leaf_size / 2**q`` per axis (``1.5 * leaf_size / 2**q``
    for ``"nearest"`` semantics, whose residual window is 1.5 leaves) —
    q=10: ~1/1024 of a leaf, far below sensor noise; the quantizer is
    centered so the error is unbiased.  Requires ``grid_bits <= 10`` and
    ``3*q <= 32``; silently falls back to the exact path otherwise.

    ``sort_tiles`` (default 1 = one global sort): split the batch into
    that many contiguous row-tiles and sort each independently — batched
    row sorts are ~35% cheaper on TPU than one flat sort.  Semantics:
    each tile is voxelized independently and the results concatenated
    (exactly the contract of chunked/streaming voxelization).  When the
    tiles are spatially disjoint at voxel granularity — the natural shape
    after Morton partitioning or tiled ingest — this equals the global
    voxelization; overlapping tiles emit one centroid per (tile, voxel).
    Output voxels are ordered by (tile, Morton) instead of global Morton.

    ``precomputed``: ``(morton_keys, residual_qword)`` from the fused
    Pallas pipeline head (ops/kernels fused_voxel_head) — skips the
    position decode entirely (the batch need not even carry a position
    column; centroids are reconstructed from key + mean residual).
    Requires the quantized path and explicit ``bounds``.
    ``precomputed=(morton_keys, None)`` is the EXACT-f32 variant (paired
    with kernels fused_decode_transform_key): keys are taken as given, the
    batch's position column rides the sort as f32 operands, and centroids
    are exact segmented means.  Requires ``grid_bits <= 10`` and explicit
    ``bounds`` (the keys' grid anchor).

    ``precomputed=(morton_keys, resword)`` WITH ``local_affine=(scale,
    rot, trans, coeffs)`` — ``coeffs`` being the SAME
    kernels.exact_local_base_coeffs array the head used — is the
    EXACT-LOCAL variant (paired with kernels
    fused_voxel_head_exact_local): ``resword`` packs each point's i32 LAS
    local coordinate as an exact 10-bit integer residual of a per-cell
    base, and the centroid is the affine image of the EXACT local mean
    (mean commutes with the rigid transform) — no quantization, one u32
    sort operand instead of three f32, and strictly tighter error than
    summing f32 world positions.  Requires ``grid_bits <= 10``, explicit
    ``bounds``, scalar ``leaf_size``
    <= kernels.exact_local_max_leaf(scale, semantics), and the batch need
    not carry a position column.

    Example — four corner points collapse to two 1m voxels, centroids =
    per-voxel means (reference ``voxelgrid_filter``, voxel_grid.rs:109-165):

    >>> import numpy as np, jax.numpy as jnp
    >>> from pasture_tpu.buffers.device import PointBatch
    >>> from pasture_tpu.layout import attributes as att
    >>> from pasture_tpu.layout.schema import PointSchema
    >>> from pasture_tpu.ops import voxel_downsample
    >>> schema = PointSchema.from_attributes([att.POSITION_3D])
    >>> pos = jnp.asarray([[0.2, 0.2, 0.2], [0.4, 0.4, 0.4],
    ...                    [5.1, 5.1, 5.1], [5.3, 5.3, 5.3]])
    >>> batch = PointBatch({att.POSITION_3D.name: pos},
    ...                    jnp.asarray(4), schema, {})
    >>> out = voxel_downsample(batch, 1.0, semantics="floor",
    ...                        bounds=(jnp.zeros(3), None))
    >>> int(out.count)
    2
    >>> np.asarray(out.data[att.POSITION_3D.name][:2]).round(2).tolist()
    [[0.3, 0.3, 0.3], [5.2, 5.2, 5.2]]

    ``with_aux``: also return the per-voxel merge statistics that make the
    two-stage (chunked/streaming/sharded) voxelization EXACTLY equal the
    one-shot global result — the return value becomes ``(batch, aux)``
    with ``aux = {"keys": (nk,)-tuple of u32 cell-key columns, "counts":
    i32 points per voxel, "mode_counts": {name: i32 count of the winning
    mode value}, "mode2_values"/"mode2_counts": {name: the RUNNER-UP mode
    value and its count (0, 0 when the voxel holds a single distinct
    value) — a second vote per voxel that lets the merge elect the global
    mode even where it wins no partial}, "raw_means": {name: f32 UNROUNDED
    mean for integer mean columns, whose output cast truncates}}``, each
    aligned with the output rows (rows past
    ``count`` hold the invalid key / zero counts, so concatenated partial
    results feed :func:`~pasture_tpu.ops.merge_voxel_batches` without
    masks).  Reference: voxel_grid.rs:443-700 reduction semantics carried
    across chunk boundaries.

    ``mode_runs`` (requires ``with_aux``): additionally emit, per mode
    column, the FULL per-(voxel, value) run table —
    ``aux["mode_runs"][name] = {"keys": (nk,)-tuple of u32 cell keys,
    "values": i32, "counts": i32}`` (capacity rows, key-ordered, padded
    with the invalid key / zeros).  The run table is the voxel's complete
    value histogram, so :func:`~pasture_tpu.ops.merge_voxel_batches` over
    run-table-carrying partials elects the global mode EXACTLY (no vote
    envelope) at the cost of one extra compaction here and histogram-width
    merge columns there.
    """
    pre = precomputed is not None
    pre_exact = pre and precomputed[1] is None
    exact_local = pre and precomputed[1] is not None \
        and local_affine is not None
    if local_affine is not None and not exact_local:
        raise ValueError("local_affine requires precomputed=(keys, "
                         "resword) from fused_voxel_head_exact_local")
    if pre:
        if grid_bits > 10:
            raise ValueError("precomputed keys require grid_bits <= 10 "
                             "(single-u32 Morton keys)")
        if (not pre_exact and not exact_local
                and position_quantization_bits is None):
            raise ValueError("precomputed (keys, qword) requires the "
                             "quantized path (position_quantization_bits "
                             "set) or local_affine (exact-local path)")
        if bounds is None:
            raise ValueError("precomputed keys require explicit bounds "
                             "(the grid anchor, for centroid "
                             "reconstruction)")
        if pre_exact and position_attribute not in batch.data:
            raise ValueError("precomputed (keys, None) requires the batch "
                             "to carry the position column")
    if position_attribute not in batch.data and not (pre and not pre_exact):
        raise ValueError(
            f"batch has no {position_attribute!r} attribute, required for "
            f"voxel grid construction")
    for name in batch.data:
        if name in _WAVEFORM_NAMES:
            raise ValueError("waveform data currently not supported "
                             "(voxel_grid.rs:452-459 parity)")
    if mode_runs and not with_aux:
        raise ValueError("mode_runs requires with_aux=True (it is a merge "
                         "statistic)")

    pol = dict(DEFAULT_POLICIES)
    if policies:
        pol.update(policies)

    def policy_of(name, col):
        p = pol.get(name)
        if p is None:
            p = "mean" if jnp.issubdtype(col.dtype, jnp.floating) else "mode"
        if p == "mode" and col.ndim != 1:
            raise ValueError(f"mode policy needs a scalar column: {name}")
        return p

    pos = batch.data.get(position_attribute)
    pdt = pos.dtype if pos is not None else jnp.float32
    mask = batch.valid_mask()
    if bounds is None:
        bmin, _ = batch_bounds(pos, mask)
    else:
        bmin = jnp.asarray(bounds[0])
    cap = batch.capacity
    qbits = position_quantization_bits
    qwindow = 1.5 if semantics == "nearest" else 1.0

    if pre:
        pkeys, qword = precomputed
        keys = [jnp.where(mask, pkeys, _INVALID_KEY)]
        nk = 1
        quantize_pos = not pre_exact and not exact_local
        if exact_local:
            qbits = 10   # residual ladder layout (exact i32 residuals)
        cells = None
    else:
        cells = voxel_indices(pos, mask, leaf_size, bmin, semantics,
                              grid_bits)
        keys = _keys(cells, mask, grid_bits)
        nk = len(keys)
        quantize_pos = (
            qbits is not None and grid_bits <= 10 and 3 * qbits <= 32
            and jnp.issubdtype(pos.dtype, jnp.floating)
            and policy_of(position_attribute, pos) == "mean")
        qword = None
    if quantize_pos and not pre:
        leaf = jnp.broadcast_to(jnp.asarray(leaf_size, pos.dtype), (3,))
        u = (pos - bmin[None, :].astype(pos.dtype)) / leaf[None, :]
        # residual window relative to the (clipped) cell: [0, 1) for floor;
        # [0, 1.5) for nearest (the low-edge clamp of voxel_indices puts
        # cell-0 residuals in [0, 0.5))
        r = u - cells.astype(pos.dtype)
        qv = jnp.clip(jnp.floor(r * ((1 << qbits) / qwindow)), 0,
                      (1 << qbits) - 1).astype(jnp.uint32)
        qword = ((qv[:, 0] << (2 * qbits)) | (qv[:, 1] << qbits) | qv[:, 2])

    # ---- sort 1: keys carry every non-mode payload column ------------------
    # sort cost on TPU scales with OPERAND COUNT (~1.9ms per extra 4M
    # operand), so one u32 "packed word" rides as an extra minor key: the
    # FIRST mode column's bits occupy the TOP of the word (its values
    # become contiguous runs within segments — mode needs grouping only),
    # and narrow integer payload columns fill the remaining low bits
    # (they only permute rows within a (voxel, mode) run, which the
    # mean/max reductions are invariant to).
    mode_names = [n for n, c in batch.data.items()
                  if policy_of(n, c) == "mode"]

    def _width(dtype):
        return jnp.dtype(dtype).itemsize * 8

    fused_mode = next(
        (n for n in mode_names
         if jnp.issubdtype(batch.data[n].dtype, jnp.integer)
         and _width(batch.data[n].dtype) <= 32),
        None)
    carry_data = {name: col for name, col in batch.data.items()
                  if policy_of(name, col) != "mode"
                  and not (quantize_pos and name == position_attribute)}
    ops, layout = _flatten_cols(carry_data)
    flat_names = [name for name, c in layout for _ in range(c)]

    mode_bits = 0
    packed_word = None
    if fused_mode is not None:
        mcol = batch.data[fused_mode]
        mode_bits = _width(mcol.dtype)
        mbits = (mcol.astype(jnp.uint32)
                 & jnp.uint32((1 << mode_bits) - 1 if mode_bits < 32
                              else 0xFFFFFFFF))
        packed_word = mbits << (32 - mode_bits) if mode_bits < 32 else mbits
    avail = 32 - mode_bits
    pack_plan = []  # (op index, shift, width, dtype)
    loose_idx = []
    for i, op in enumerate(ops):
        w = _width(op.dtype)
        if jnp.issubdtype(op.dtype, jnp.integer) and op.ndim == 1 and w <= avail:
            shift = avail - w
            bits = op.astype(jnp.uint32) & jnp.uint32((1 << w) - 1)
            word = bits << shift
            packed_word = word if packed_word is None else packed_word | word
            pack_plan.append((i, shift, w, op.dtype))
            avail -= w
        else:
            loose_idx.append(i)

    if cap % sort_tiles != 0:
        raise ValueError(f"capacity {cap} not divisible by "
                         f"sort_tiles={sort_tiles}")

    def _tiled_sort(operands, num_keys):
        """Sort each of ``sort_tiles`` contiguous row-tiles independently —
        batched row sorts are ~35% cheaper than one flat sort (measured
        (64, 64K) vs 4M flat on v5e) and equal the global sort when tiles
        are spatially disjoint (every segment then stays within a tile).

        When every operand is 32-bit and the tile length is a supported
        power of two, the sort runs as a blockwise Pallas bitonic network
        entirely in VMEM (kernels/tile_sort_kernel.py) instead of XLA's
        general sort — one HBM pass per stream; equal to ``lax.sort`` up
        to the order within equal-key runs, which every downstream
        reduction is invariant to."""
        if sort_tiles == 1:
            return lax.sort(operands, num_keys=num_keys, is_stable=False)
        from .kernels.tile_sort_kernel import (supports_tile_sort,
                                               tile_sort_pallas)
        tlen = cap // sort_tiles
        use_pallas = bool(_FORCE_PALLAS_TILE_SORT)
        if (use_pallas and supports_tile_sort(cap, tlen, len(operands))
                and all(jnp.dtype(o.dtype).itemsize == 4 for o in operands)
                and all(jnp.issubdtype(o.dtype, jnp.integer)
                        for o in operands[:num_keys])):
            dts = [o.dtype for o in operands]
            streams = [o if jnp.issubdtype(o.dtype, jnp.integer)
                       else lax.bitcast_convert_type(o, jnp.uint32)
                       for o in operands]
            out = tile_sort_pallas(tuple(streams), tlen, num_keys=num_keys)
            return tuple(o if o.dtype == dt
                         else lax.bitcast_convert_type(o, dt)
                         for o, dt in zip(out, dts))
        shaped = tuple(o.reshape(sort_tiles, -1) for o in operands)
        out = lax.sort(shaped, dimension=1, num_keys=num_keys,
                       is_stable=False)
        return tuple(o.reshape(-1) for o in out)

    extra_keys = (packed_word,) if packed_word is not None else ()
    loose_ops = tuple(ops[i] for i in loose_idx)
    carry_q = quantize_pos or exact_local
    extra_vals = (qword,) if carry_q else ()
    sorted_all = _tiled_sort(
        tuple(keys) + extra_keys + tuple(loose_ops) + extra_vals,
        num_keys=nk + len(extra_keys))
    skeys = sorted_all[:nk]
    sword = sorted_all[nk] if packed_word is not None else None
    sqword = sorted_all[-1] if carry_q else None

    # ---- fully-fused blockwise reduce+compact (Pallas fast path) -----------
    # when every payload is packed into the secondary word, positions are
    # quantized, the key is a single u32, and the sort tiles divide the
    # kernel block (so no segment spans a block), the ENTIRE post-sort
    # chain — segment flags, mean/count scans, mode selection, centroid
    # reconstruction, output casts, prefix compaction — runs in one
    # blockwise Pallas kernel (kernels/voxel_reduce_kernel.py)
    from .kernels.voxel_reduce_kernel import (REDUCE_BLOCK,
                                              fused_sorted_voxel_reduce)
    from .compact import _merge_tiles
    tile_len = cap // sort_tiles
    _scalar_leaf = jnp.ndim(leaf_size) == 0
    # exact-position variant: the three f32 position components are the
    # ONLY loose sort operands; centroids become block-local segmented
    # f32 means inside the kernel (no quantization anywhere)
    exact_pos_fused = (
        not quantize_pos and pos is not None and pdt == jnp.float32
        and len(loose_idx) == 3
        and all(flat_names[i] == position_attribute for i in loose_idx)
        and policy_of(position_attribute, pos) == "mean")
    use_fused_reduce = (
        (carry_q and not loose_idx or exact_pos_fused)
        and not with_aux  # the fused kernel doesn't emit merge statistics
        and nk == 1 and packed_word is not None and _scalar_leaf
        and all(policy_of(flat_names[i], batch.data[flat_names[i]])
                == "mean" for i, _, _, _ in pack_plan)
        and set(mode_names) <= ({fused_mode} if fused_mode else set())
        and (fused_mode is None
             or not jnp.issubdtype(batch.data[fused_mode].dtype,
                                   jnp.signedinteger))
        and cap % REDUCE_BLOCK == 0 and REDUCE_BLOCK % tile_len == 0
        and (_FORCE_FUSED_REDUCE if _FORCE_FUSED_REDUCE is not None
             else jax.default_backend() != "cpu"))
    if use_fused_reduce:
        fields = tuple(
            (shift, w,
             bool(jnp.issubdtype(jnp.dtype(dt_), jnp.signedinteger)),
             int(jnp.iinfo(dt_).min), int(jnp.iinfo(dt_).max))
            for _, shift, w, dt_ in pack_plan)
        if exact_pos_fused:
            base = nk + len(extra_keys)
            spos = tuple(sorted_all[base + j] for j in range(3))
            streams, cnts = fused_sorted_voxel_reduce(
                skeys[0], sword, None, bmin.astype(jnp.float32), leaf_size,
                mode_bits, fields, 0, qwindow, tile_len, semantics,
                spos=spos)
        else:
            streams, cnts = fused_sorted_voxel_reduce(
                skeys[0], sword, sqword, bmin.astype(jnp.float32),
                leaf_size, mode_bits, fields, qbits, qwindow, tile_len,
                semantics,
                local_affine=local_affine if exact_local else None)
        blocks = cap // REDUCE_BLOCK
        merged, num_voxels = _merge_tiles(
            [s.reshape(blocks, REDUCE_BLOCK) for s in streams], cnts,
            mask, cap, REDUCE_BLOCK)
        px, py, pz, oword = merged
        reduced_f: Dict[str, jnp.ndarray] = {
            position_attribute:
                jnp.stack([px, py, pz], axis=1).astype(pdt)}
        for i, shift, w, dt_ in pack_plan:
            u = (oword >> jnp.uint32(shift)) & jnp.uint32((1 << w) - 1)
            if jnp.issubdtype(jnp.dtype(dt_), jnp.signedinteger):
                sb = jnp.int32(1 << (w - 1))
                u = (u.astype(jnp.int32) ^ sb) - sb
            reduced_f[flat_names[i]] = u.astype(dt_)
        if fused_mode is not None:
            mu = oword >> jnp.uint32(32 - mode_bits)
            reduced_f[fused_mode] = mu.astype(batch.data[fused_mode].dtype)
        return PointBatch(reduced_f, num_voxels, batch.schema, batch.meta)

    def _unpack(shift, w, dtype):
        u = (sword >> jnp.uint32(shift)) & jnp.uint32((1 << w) - 1)
        dtype = jnp.dtype(dtype)
        if jnp.issubdtype(dtype, jnp.signedinteger):
            if w == 32:  # astype would clamp, not wrap
                return lax.bitcast_convert_type(u, jnp.int32)
            sb = jnp.int32(1 << (w - 1))
            return ((u.astype(jnp.int32) ^ sb) - sb).astype(dtype)
        return u.astype(dtype)

    fused_vals = None
    if fused_mode is not None:
        # sign-extended decode so mode tie-breaking ("smallest value wins")
        # keeps signed semantics for i8/i16 columns
        fv = _unpack(32 - mode_bits, mode_bits, batch.data[fused_mode].dtype)
        if fv.dtype != jnp.int32:
            fv = (lax.bitcast_convert_type(fv, jnp.int32)
                  if _width(fv.dtype) == 32 else fv.astype(jnp.int32))
        fused_vals = fv

    sorted_ops: List = [None] * len(ops)
    for j, i in enumerate(loose_idx):
        sorted_ops[i] = sorted_all[nk + len(extra_keys) + j]
    for i, shift, w, dtype in pack_plan:
        sorted_ops[i] = _unpack(shift, w, dtype)
    sorted_cols = _unflatten_cols(sorted_ops, layout)

    # the valid prefix survives tiled sorting: the unsorted batch is
    # prefix-valid, so at most one tile is partially valid and its invalid
    # rows (maximal keys) sort to that tile's end — globally rows [0,count)
    # remain exactly the valid ones
    valid = jnp.arange(cap, dtype=jnp.int32) < batch.count
    tile_start = ((jnp.arange(cap, dtype=jnp.int32)
                   % (cap // sort_tiles)) == 0) if sort_tiles > 1 else None
    new_key = jnp.concatenate([
        jnp.ones((1,), bool),
        jnp.any(jnp.stack([k[1:] != k[:-1] for k in skeys]), axis=0)
        if nk > 1 else (skeys[0][1:] != skeys[0][:-1])])
    if tile_start is not None:
        new_key = new_key | tile_start
    first = new_key & valid

    reduced: Dict[str, jnp.ndarray] = {}

    # ---- mean: one batched scan per accumulator dtype ----------------------
    # the per-segment count rides as an extra column of the first stack
    # (one scan covers sums AND counts)
    ones = jnp.where(valid, 1.0, 0.0).astype(jnp.float32)
    counts32 = None
    qsums = None
    raw_means: Dict[str, jnp.ndarray] = {}
    for acc_dtype in (jnp.float32, jnp.float64):
        group = [(n, c) for n, c in sorted_cols.items()
                 if policy_of(n, batch.data[n]) == "mean"
                 and ((c.dtype == jnp.float64) == (acc_dtype == jnp.float64))]
        is_f32 = acc_dtype == jnp.float32
        if not group and not (is_f32 and (counts32 is None or carry_q)):
            continue
        comps, glayout = _flatten_cols(dict(group))
        # scan as a LIST of 1-D columns (full lane utilization; see segscan)
        cols_acc = [jnp.where(valid, c.astype(acc_dtype), 0) for c in comps]
        nq = 0
        if is_f32 and carry_q:
            # quantized position residuals share this ladder
            qm = jnp.uint32((1 << qbits) - 1)
            for sh in (2 * qbits, qbits, 0):
                qc = ((sqword >> jnp.uint32(sh)) & qm).astype(jnp.float32)
                cols_acc.append(jnp.where(valid, qc, 0.0))
            nq = 3
        add_counts = counts32 is None
        if add_counts:
            cols_acc.append(ones.astype(acc_dtype))
        sums = seg_totals_sum(cols_acc, first)
        if add_counts:
            counts32 = sums[-1].astype(jnp.float32)
            sums = sums[:-1]
        if nq:
            qsums = sums[-nq:]
            sums = sums[:-nq]
        cnt = jnp.maximum(counts32, 1.0).astype(acc_dtype)
        cols = _unflatten_cols([s / cnt for s in sums], glayout)
        for n, c in cols.items():
            if with_aux and not jnp.issubdtype(batch.data[n].dtype,
                                               jnp.floating):
                # integer mean columns: the cast truncates, so merging
                # partials needs the UNROUNDED partial mean
                raw_means[n] = c.astype(jnp.float32)
            reduced[n] = _cast_as(c, batch.data[n].dtype)

    if quantize_pos:
        # centroid = cell base (decoded from the sorted Morton key) +
        # unbiased mean of the centered q-bit residuals
        cnt = jnp.maximum(counts32, 1.0)
        cell_xyz = morton_decode_u32(skeys[0])
        leaf3 = jnp.broadcast_to(jnp.asarray(leaf_size, pdt), (3,))
        comps = []
        for axis, (ci, qs) in enumerate(zip(cell_xyz, qsums)):
            mean_r = (qs / cnt + 0.5) * (qwindow / (1 << qbits))
            comps.append((ci.astype(pdt) + mean_r.astype(pdt)) * leaf3[axis]
                         + bmin[axis].astype(pdt))
        reduced[position_attribute] = jnp.stack(comps, axis=1)
    elif exact_local:
        # centroid = affine image of the EXACT local mean: per-cell base
        # (the SAME integer fixed-point expression the head kernel encoded
        # residuals against — bit-exact on any backend) + exact mean of
        # the 10-bit integer residuals, scaled and rotated back to world
        # (mean commutes with the rigid transform)
        from .kernels.fused_transform import _int_cell_base
        cnt = jnp.maximum(counts32, 1.0)
        la_scale, la_rot, la_trans, la_coeffs = local_affine
        la_scale = la_scale.astype(jnp.float32)
        la_rot = la_rot.astype(jnp.float32)
        la_trans = la_trans.astype(jnp.float32)
        coef = la_coeffs.astype(jnp.int32)
        cells = [c.astype(jnp.int32) for c in morton_decode_u32(skeys[0])]
        bl = [_int_cell_base(coef, cells[0], cells[1], cells[2],
                             a).astype(jnp.float32) for a in range(3)]
        ml = [(bl[a] + qsums[a] / cnt) * la_scale[a] for a in range(3)]
        comps = [la_rot[a, 0] * ml[0] + la_rot[a, 1] * ml[1]
                 + la_rot[a, 2] * ml[2] + la_trans[a] for a in range(3)]
        reduced[position_attribute] = jnp.stack(
            [c.astype(pdt) for c in comps], axis=1)

    # ---- max: clamped at 0 (centroid_max_pool parity) ----------------------
    for n, c in sorted_cols.items():
        if policy_of(n, batch.data[n]) != "max":
            continue
        acc = c.dtype if jnp.issubdtype(c.dtype, jnp.floating) \
            else jnp.float32
        v = jnp.where(valid, c.astype(acc), -jnp.inf)
        m = seg_totals_max(v, first)
        reduced[n] = _cast_as(jnp.maximum(m, 0.0), batch.data[n].dtype)

    # ---- mode: run-length scans over (key, value)-sorted values ------------
    def _mode_from_sorted(sv, nk_new, vbits, vmin, want2=False):
        """``sv``: i32 values in ``[vmin, vmin + 2**vbits)``.  When run
        length + value fit one i32 (log2(cap)+vbits <= 31) the (max run,
        then min value) selection collapses to ONE packed max ladder
        instead of the two-column lexicographic one.  Returns
        ``(mode value, count of that value, runner-up value, runner-up
        count, run-first mask, run length)`` per segment (value/count
        columns landed on segment first rows; the run columns on
        (voxel, value)-run first rows — the full histogram, for
        ``mode_runs``); the runner-up pair is ``(None, None)`` unless
        ``want2`` (the ``with_aux`` merge statistics — a second
        (value, count) vote per voxel lets
        :func:`~pasture_tpu.ops.merge_voxel_batches` elect the global
        mode even where it wins no partial)."""
        run_new = nk_new | jnp.concatenate([jnp.ones((1,), bool),
                                            sv[1:] != sv[:-1]])
        f2 = nk_new & valid
        runs = run_new & valid
        run_len = seg_totals_sum(jnp.where(valid, 1, 0).astype(jnp.int32),
                                 runs)
        if vbits + max(cap - 1, 1).bit_length() <= 31:
            vmax_enc = jnp.int32((1 << vbits) - 1)
            comp = vmax_enc - (sv - vmin)          # descending value order
            packed = jnp.where(runs, (run_len << vbits) | comp, -1)

            def unpack(b):
                c = jnp.maximum(b >> vbits, 0)
                v = jnp.where(c > 0, (vmax_enc - (b & vmax_enc)) + vmin, 0)
                return v, c

            if not want2:
                v1, c1 = unpack(seg_totals_max(packed, f2))
                return v1, c1, None, None, runs, run_len
            b1, b2 = seg_totals_top2_max(packed, f2)
            return unpack(b1) + unpack(b2) + (runs, run_len)
        primary = jnp.where(runs, run_len, -1)
        secondary = jnp.where(runs, -sv, jnp.iinfo(jnp.int32).min)
        if not want2:
            best_len, best_neg = seg_totals_lexmax2(primary, secondary, f2)
            return (-best_neg, jnp.maximum(best_len, 0), None, None,
                    runs, run_len)
        p1, s1, p2, s2 = seg_totals_top2_lexmax2(primary, secondary, f2)
        c2 = jnp.maximum(p2, 0)
        return (-s1, jnp.maximum(p1, 0),
                jnp.where(c2 > 0, -s2, 0), c2, runs, run_len)

    def _value_range(dtype):
        """(bits, min encodable value) for the packed-mode fast path; i32
        width forces the two-column fallback."""
        dtype = jnp.dtype(dtype)
        if not jnp.issubdtype(dtype, jnp.integer):
            return 32, 0
        w = _width(dtype)
        vmin = -(1 << (w - 1)) if jnp.issubdtype(dtype, jnp.signedinteger) \
            else 0
        return w, jnp.int32(vmin) if w < 32 else 0

    mode_win_counts: Dict[str, jnp.ndarray] = {}
    mode2_values: Dict[str, jnp.ndarray] = {}
    mode2_counts: Dict[str, jnp.ndarray] = {}
    mode_run_tables: Dict[str, Dict[str, jnp.ndarray]] = {}
    for n in mode_names:
        col = batch.data[n]
        vbits, vmin = _value_range(col.dtype)
        if n == fused_mode:
            # already value-ordered by the fused extra key of sort 1
            sv_n, sk_n = fused_vals, skeys
            mv, mc, m2v, m2c, runs_n, rlen_n = _mode_from_sorted(
                fused_vals, new_key, vbits, vmin, want2=with_aux)
        else:
            s = _tiled_sort(tuple(keys) + (col.astype(jnp.int32),),
                            num_keys=nk + 1)
            sv = s[nk]
            sk = s[:nk]
            nk_new = jnp.concatenate([
                jnp.ones((1,), bool),
                jnp.any(jnp.stack([k[1:] != k[:-1] for k in sk]), axis=0)
                if nk > 1 else (sk[0][1:] != sk[0][:-1])])
            if tile_start is not None:
                nk_new = nk_new | tile_start
            sv_n, sk_n = sv, sk
            mv, mc, m2v, m2c, runs_n, rlen_n = _mode_from_sorted(
                sv, nk_new, vbits, vmin, want2=with_aux)
        reduced[n] = _cast_as(mv.astype(jnp.float32), col.dtype)
        if with_aux:
            mode_win_counts[n] = mc
            mode2_values[n] = m2v
            mode2_counts[n] = m2c
        if mode_runs:
            # full per-(voxel, value) histogram: compact run-first rows
            # (key-ordered) to the front; padded rows carry the invalid
            # key / zeros so concatenated tables merge mask-free
            rcols = (list(sk_n)
                     + [sv_n.astype(jnp.int32), rlen_n.astype(jnp.int32)])
            rcomp, nruns = compact_columns(rcols, runs_n)
            rvalid = jnp.arange(cap, dtype=jnp.int32) < nruns
            mode_run_tables[n] = {
                "keys": tuple(jnp.where(rvalid, k, _INVALID_KEY)
                              for k in rcomp[:nk]),
                "values": jnp.where(rvalid, rcomp[nk], 0),
                "counts": jnp.where(rvalid, rcomp[nk + 1], 0),
                "num_runs": nruns,
            }

    # ---- prefix compaction: first rows to the front -------------------------
    # rows are already in Morton order and staged shifts preserve order, so
    # no second sort is needed (ops/compact.py); narrow integer outputs
    # share u32 words through the ladder (fewer streams)
    if with_aux:
        # merge statistics ride the same compaction: the voxel's cell keys,
        # its point count, and each mode column's winning-value count
        for i in range(nk):
            reduced[f"__aux_key{i}"] = skeys[i]
        reduced["__aux_counts"] = counts32.astype(jnp.int32)
        for n, mc in mode_win_counts.items():
            reduced[f"__aux_mode:{n}"] = mc
            reduced[f"__aux_m2v:{n}"] = mode2_values[n]
            reduced[f"__aux_m2c:{n}"] = mode2_counts[n]
        for n, rm in raw_means.items():
            reduced[f"__aux_raw:{n}"] = rm
    cops, clayout = _flatten_cols(reduced)
    packed_ops, pack_info = pack_int_columns(cops)
    compacted, num_voxels = compact_columns(packed_ops, first)
    out_data = _unflatten_cols(unpack_int_columns(compacted, pack_info),
                               clayout)

    if with_aux:
        # rows past the voxel count get the invalid key / zero counts so
        # concatenated partial results are mask-free merge inputs
        valid_out = jnp.arange(cap, dtype=jnp.int32) < num_voxels
        aux = {
            "keys": tuple(
                jnp.where(valid_out, out_data.pop(f"__aux_key{i}"),
                          _INVALID_KEY) for i in range(nk)),
            "counts": jnp.where(valid_out,
                                out_data.pop("__aux_counts"), 0),
            "mode_counts": {
                n: jnp.where(valid_out, out_data.pop(f"__aux_mode:{n}"), 0)
                for n in mode_win_counts},
            "mode2_values": {
                n: jnp.where(valid_out, out_data.pop(f"__aux_m2v:{n}"), 0)
                for n in mode_win_counts},
            "mode2_counts": {
                n: jnp.where(valid_out, out_data.pop(f"__aux_m2c:{n}"), 0)
                for n in mode_win_counts},
            "raw_means": {n: out_data.pop(f"__aux_raw:{n}")
                          for n in raw_means},
        }
        if mode_runs:
            aux["mode_runs"] = mode_run_tables
        return (PointBatch(out_data, num_voxels, batch.schema, batch.meta),
                aux)

    return PointBatch(out_data, num_voxels, batch.schema, batch.meta)
