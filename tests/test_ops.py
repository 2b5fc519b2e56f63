"""Device ops tests (CPU-backend jax): masked/segmented reductions, sorting,
voxel downsample vs a naive numpy oracle with pasture semantics."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pasture_tpu.buffers.device import PointBatch
from pasture_tpu.buffers.host import HostPointBuffer
from pasture_tpu.layout import attributes as att
from pasture_tpu.layout.schema import PointSchema
from pasture_tpu.ops import (
    affine_transform,
    batch_bounds,
    decode_las_positions,
    encode_las_positions,
    masked_minmax,
    morton_sort,
    segment_mean,
    segment_mode,
    voxel_downsample,
    voxel_indices,
)


def test_masked_minmax_ignores_padding_and_nan(rng):
    x = rng.normal(size=(16, 3))
    x[3, 1] = np.nan
    x[12:] = 1e12  # padding rows
    mask = np.arange(16) < 12
    mn, mx = jax.jit(masked_minmax)(jnp.asarray(x), jnp.asarray(mask))
    valid = x[:12]
    np.testing.assert_allclose(np.asarray(mn), np.nanmin(valid, axis=0))
    np.testing.assert_allclose(np.asarray(mx), np.nanmax(valid, axis=0))


def test_segment_mean():
    x = jnp.asarray([1.0, 2.0, 3.0, 10.0, 20.0, 0.0])
    seg = jnp.asarray([0, 0, 0, 1, 1, 2])
    out = segment_mean(x, seg, 4)
    np.testing.assert_allclose(np.asarray(out[:3]), [2.0, 15.0, 0.0])


def test_segment_mode_majority_and_tie_break():
    vals = jnp.asarray([5, 5, 7, 7, 7, 2, 9, 9, 3, 3], jnp.int32)
    seg = jnp.asarray([0, 0, 0, 0, 0, 1, 1, 1, 1, 1], jnp.int32)
    out = segment_mode(vals, seg, 3)
    assert int(out[0]) == 7       # clear majority
    assert int(out[1]) == 3       # 9 and 3 tie at 2 -> smallest value wins


def test_las_position_roundtrip():
    scale = jnp.asarray([0.001, 0.001, 0.001], jnp.float64)
    offset = jnp.asarray([100.0, 200.0, -50.0], jnp.float64)
    local = jnp.asarray(np.random.default_rng(0).integers(
        -10**6, 10**6, (100, 3)), jnp.int32)
    world = decode_las_positions(local, scale, offset, dtype=jnp.float64)
    # rounding mode: exact bit round trip
    back = encode_las_positions(world, scale, offset, rounding="round")
    np.testing.assert_array_equal(np.asarray(back), np.asarray(local))
    # parity (truncating) mode: within one LSB, like the reference
    back_t = encode_las_positions(world, scale, offset)
    assert int(np.abs(np.asarray(back_t) - np.asarray(local)).max()) <= 1


def test_decode_with_anchor_is_exact_in_f32():
    # large UTM-style offsets: anchored decode stays exact where the
    # unanchored f32 decode loses millimetres
    scale = jnp.asarray([0.001] * 3, jnp.float64)
    offset = jnp.asarray([500000.0, 4_000_000.0, 0.0], jnp.float64)
    local = jnp.asarray([[1_000_000, 2_000_000, 3000],
                         [1_000_001, 2_000_001, 3001]], jnp.int32)
    anchor = jnp.asarray([1_000_000, 2_000_000, 3000], jnp.int32)
    rel = decode_las_positions(local, scale, offset, anchor=anchor)
    np.testing.assert_allclose(np.asarray(rel),
                               [[0, 0, 0], [0.001, 0.001, 0.001]], atol=1e-9)


def test_affine_transform_matches_numpy(rng):
    p = rng.normal(size=(50, 3)).astype(np.float32)
    m = rng.normal(size=(3, 3)).astype(np.float32)
    t = rng.normal(size=3).astype(np.float32)
    out = affine_transform(jnp.asarray(p), jnp.asarray(m), jnp.asarray(t))
    np.testing.assert_allclose(np.asarray(out), p @ m.T + t, rtol=1e-5)


def _make_batch(rng, n=100, cap=128):
    schema = PointSchema.from_attributes([
        att.POSITION_3D, att.INTENSITY, att.CLASSIFICATION, att.GPS_TIME])
    cols = {
        att.POSITION_3D.name: rng.uniform(0, 10, (n, 3)),
        att.INTENSITY.name: rng.integers(0, 1000, n).astype(np.uint16),
        att.CLASSIFICATION.name: rng.integers(0, 4, n).astype(np.uint8),
        att.GPS_TIME.name: rng.uniform(-5, 5, n),
    }
    host = HostPointBuffer.from_columns(schema, cols)
    from pasture_tpu.layout.dtypes import DevicePolicy
    return HostPointBuffer.from_columns(schema, cols), PointBatch.from_host(
        host, policy=DevicePolicy.EXACT, capacity=cap)


def _oracle_voxels(cols, leaf, semantics="nearest"):
    """Naive per-point voxel assignment + per-policy reduction."""
    pos = cols[att.POSITION_3D.name]
    bmin = pos.min(axis=0)
    u = (pos - bmin) / leaf
    if semantics == "nearest":
        idx = np.floor(u - 0.5).astype(np.int64)
    else:
        idx = np.floor(u).astype(np.int64)
    idx = np.maximum(idx, 0)
    voxels = {}
    for i, key in enumerate(map(tuple, idx)):
        voxels.setdefault(key, []).append(i)
    out = {}
    for key, members in voxels.items():
        m = np.asarray(members)
        intensity = np.trunc(
            cols[att.INTENSITY.name][m].astype(np.float64).mean())
        cls_vals, cls_counts = np.unique(cols[att.CLASSIFICATION.name][m],
                                         return_counts=True)
        mode = cls_vals[np.argmax(cls_counts == cls_counts.max())]
        best = cls_vals[cls_counts == cls_counts.max()].min()
        gps = max(0.0, cols[att.GPS_TIME.name][m].max())
        out[key] = (pos[m].mean(axis=0), intensity, best, gps)
    return out


def test_voxel_downsample_matches_oracle(rng):
    host, batch = _make_batch(rng)
    leaf = 1.0
    result = jax.jit(lambda b: voxel_downsample(b, 1.0))(batch)
    n_vox = int(result.count)
    got = result.to_host()

    oracle = _oracle_voxels(host.columns, leaf)
    assert n_vox == len(oracle)

    # match voxels by rounded centroid position
    got_pos = got.get(att.POSITION_3D.name)
    got_int = got.get(att.INTENSITY.name)
    got_cls = got.get(att.CLASSIFICATION.name)
    got_gps = got.get(att.GPS_TIME.name)
    want = list(oracle.values())
    want_pos = np.stack([v[0] for v in want])
    for i in range(n_vox):
        d = np.linalg.norm(want_pos - got_pos[i][None, :], axis=1)
        j = int(np.argmin(d))
        # device means accumulate in f32; centroids agree to ~1e-5
        assert d[j] < 1e-4, f"unexpected voxel centroid {got_pos[i]}"
        wpos, wint, wcls, wgps = want[j]
        assert got_int[i] == wint
        assert got_cls[i] == wcls
        np.testing.assert_allclose(got_gps[i], wgps, atol=1e-12)


def test_voxel_downsample_reduces_grid(rng):
    """The reference doc example: 100x100 planar grid, leaf 1.5 ->
    less than half the points (voxel_grid.rs:86-108)."""
    n = 100 * 100
    ii, jj = np.meshgrid(np.arange(100.0), np.arange(100.0))
    pos = np.stack([np.zeros(n), ii.ravel(), jj.ravel()], axis=1)
    schema = PointSchema.from_attributes([att.POSITION_3D])
    host = HostPointBuffer.from_columns(schema, {att.POSITION_3D.name: pos})
    from pasture_tpu.layout.dtypes import DevicePolicy
    batch = PointBatch.from_host(host, policy=DevicePolicy.EXACT)
    out = voxel_downsample(batch, 1.5)
    assert int(out.count) < n / 2


def test_morton_sort_groups_cells(rng):
    host, batch = _make_batch(rng, n=64, cap=64)
    pos = batch.data[att.POSITION_3D.name]
    mask = batch.valid_mask()
    bmin, _ = batch_bounds(pos, mask)
    cells = voxel_indices(pos, mask, 2.0, bmin)
    sorted_batch, (hi, lo), perm = morton_sort(batch, cells)
    keys = np.asarray(hi).astype(np.uint64) << np.uint64(32) | np.asarray(lo)
    assert np.all(keys[:-1] <= keys[1:])


def test_compact_batch_filters_in_order(rng):
    from pasture_tpu.ops import compact_batch, filter_batch

    host, batch = _make_batch(rng, n=100, cap=128)
    cls = np.asarray(batch.data[att.CLASSIFICATION.name])[:100]
    keep = batch.data[att.CLASSIFICATION.name] < 8
    out = jax.jit(compact_batch)(batch, keep)
    want = np.flatnonzero(cls < 8)
    assert int(out.count) == len(want)
    got = out.to_host()
    # order-preserving, exact column match (HashMapBuffer::filter parity)
    np.testing.assert_array_equal(got.get(att.CLASSIFICATION), cls[want])
    np.testing.assert_allclose(
        got.get(att.POSITION_3D),
        host.get(att.POSITION_3D)[want], rtol=1e-6)

    # padded rows never survive, even if the mask says keep
    out2 = filter_batch(batch, lambda d: jnp.ones(128, bool))
    assert int(out2.count) == 100


def test_voxel_downsample_packed_payloads_signed(rng):
    """Exercises the packed-word sort path: a signed fused mode column with
    negatives, plus signed/unsigned narrow mean payloads that bit-pack into
    the secondary sort key (sign extension must round-trip)."""
    from pasture_tpu.layout.attributes import PointAttribute
    from pasture_tpu.layout import dtypes as dt
    from pasture_tpu.layout.dtypes import DevicePolicy

    n = 400
    C16 = PointAttribute("Custom16", dt.I16)
    schema = PointSchema.from_attributes(
        [att.POSITION_3D, att.SCAN_ANGLE_RANK, att.USER_DATA, att.NIR, C16])
    pos = rng.uniform(0, 8, (n, 3))
    angle = rng.integers(-90, 90, n).astype(np.int8)
    user = rng.integers(0, 256, n).astype(np.uint8)
    nir = rng.integers(0, 65536, n).astype(np.uint16)
    c16 = rng.integers(-30000, 30000, n).astype(np.int16)
    host = HostPointBuffer.from_columns(schema, {
        att.POSITION_3D.name: pos, att.SCAN_ANGLE_RANK.name: angle,
        att.USER_DATA.name: user, att.NIR.name: nir, C16.name: c16,
    })
    batch = PointBatch.from_host(host, policy=DevicePolicy.EXACT)
    out = jax.jit(lambda b: voxel_downsample(
        b, 2.0, semantics="floor", policies={C16.name: "mean"}))(batch)
    got = out.to_host()

    # numpy oracle: group by floor cell
    bmin = pos.min(axis=0)
    cell = np.floor((pos - bmin) / 2.0).astype(np.int64)
    cell = np.clip(cell, 0, (1 << 20) - 1)
    keys = {}
    for i in range(n):
        keys.setdefault(tuple(cell[i]), []).append(i)
    assert int(out.count) == len(keys)
    got_pos = got.get(att.POSITION_3D)
    for j in range(len(keys)):
        d = np.linalg.norm(
            np.array([pos[idx].mean(axis=0) for idx in keys.values()])
            - got_pos[j][None, :], axis=1)
        members = list(keys.values())[int(np.argmin(d))]
        assert d.min() < 1e-4
        # mean payloads (Rust-as cast back to the column dtype: trunc+sat)
        for col, attr in ((nir, att.NIR), (c16, C16)):
            want = np.trunc(col[members].astype(np.float64).mean())
            want = np.clip(want, np.iinfo(col.dtype).min,
                           np.iinfo(col.dtype).max).astype(col.dtype)
            assert got.get(attr)[j] == want, attr.name
        # mode payloads, smallest-value tie break
        for col, attr in ((angle, att.SCAN_ANGLE_RANK), (user, att.USER_DATA)):
            vals, counts = np.unique(col[members], return_counts=True)
            best = vals[counts == counts.max()].min()
            assert got.get(attr)[j] == best, attr.name


def test_voxel_downsample_quantized_positions(rng):
    """Opt-in quantized-residual path: centroids within leaf/2^q of the
    exact path, every other policy bit-identical."""
    host, batch = _make_batch(rng, n=3000, cap=4096)
    f = jax.jit(lambda b: voxel_downsample(b, 2.0, semantics="floor",
                                           grid_bits=10))
    g = jax.jit(lambda b: voxel_downsample(b, 2.0, semantics="floor",
                                           grid_bits=10,
                                           position_quantization_bits=10))
    exact, quant = f(batch), g(batch)
    assert int(exact.count) == int(quant.count)
    n_vox = int(exact.count)
    pe = np.asarray(exact.data[att.POSITION_3D.name])[:n_vox]
    pq = np.asarray(quant.data[att.POSITION_3D.name])[:n_vox]
    # same Morton order; per-axis deviation bounded by leaf / 2^10
    np.testing.assert_allclose(pq, pe, atol=2.0 / 1024 + 1e-5)
    for name in (att.INTENSITY.name, att.CLASSIFICATION.name,
                 att.GPS_TIME.name):
        np.testing.assert_array_equal(
            np.asarray(exact.data[name])[:n_vox],
            np.asarray(quant.data[name])[:n_vox])


def test_voxel_downsample_quantized_nearest_semantics(rng):
    host, batch = _make_batch(rng, n=2000, cap=2048)
    exact = voxel_downsample(batch, 1.5, grid_bits=10)
    quant = voxel_downsample(batch, 1.5, grid_bits=10,
                             position_quantization_bits=10)
    n_vox = int(exact.count)
    assert n_vox == int(quant.count)
    np.testing.assert_allclose(
        np.asarray(quant.data[att.POSITION_3D.name])[:n_vox],
        np.asarray(exact.data[att.POSITION_3D.name])[:n_vox],
        atol=1.5 * 1.5 / 1024 + 1e-5)  # window 1.5 leaves for nearest


def test_voxel_downsample_sort_tiles_disjoint_equals_global(rng):
    """Spatially-disjoint tiles + sort_tiles == one global voxelization
    (up to voxel output order, which becomes (tile, Morton))."""
    t, l = 8, 512
    n = t * l
    # tile i owns x in [4*i, 4*i+4) -> leaf 1.0 cells never span tiles
    pos = np.concatenate([
        np.stack([rng.uniform(4 * i, 4 * i + 4, l),
                  rng.uniform(0, 8, l), rng.uniform(0, 8, l)], axis=1)
        for i in range(t)])
    inten = rng.integers(0, 65536, n).astype(np.uint16)
    cls = rng.integers(0, 32, n).astype(np.uint8)
    schema = PointSchema.from_attributes(
        [att.POSITION_3D, att.INTENSITY, att.CLASSIFICATION])
    host = HostPointBuffer.from_columns(schema, {
        att.POSITION_3D.name: pos, att.INTENSITY.name: inten,
        att.CLASSIFICATION.name: cls})
    from pasture_tpu.layout.dtypes import DevicePolicy
    batch = PointBatch.from_host(host, policy=DevicePolicy.EXACT)
    bounds = (jnp.zeros(3), None)
    g = voxel_downsample(batch, 1.0, bounds=bounds, semantics="floor",
                         grid_bits=10)
    tl = voxel_downsample(batch, 1.0, bounds=bounds, semantics="floor",
                          grid_bits=10, sort_tiles=t)
    assert int(g.count) == int(tl.count)
    nv = int(g.count)

    def key_of(out):
        p = np.asarray(out.data[att.POSITION_3D.name])[:nv]
        return np.lexsort((p[:, 2], p[:, 1], p[:, 0]))

    gi, ti = key_of(g), key_of(tl)
    for name in (att.POSITION_3D.name, att.INTENSITY.name,
                 att.CLASSIFICATION.name):
        a = np.asarray(g.data[name])[:nv][gi]
        b = np.asarray(tl.data[name])[:nv][ti]
        np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-6)


def test_voxel_downsample_sort_tiles_dual_key(rng):
    """Tiled sorting also works on the dual-u32-key (>10-bit grid) path."""
    t, l = 4, 512
    n = t * l
    pos = np.concatenate([
        np.stack([rng.uniform(4 * i, 4 * i + 4, l),
                  rng.uniform(0, 8, l), rng.uniform(0, 8, l)], axis=1)
        for i in range(t)])
    schema = PointSchema.from_attributes([att.POSITION_3D, att.INTENSITY])
    host = HostPointBuffer.from_columns(schema, {
        att.POSITION_3D.name: pos,
        att.INTENSITY.name: rng.integers(0, 65536, n).astype(np.uint16)})
    from pasture_tpu.layout.dtypes import DevicePolicy
    batch = PointBatch.from_host(host, policy=DevicePolicy.EXACT)
    bounds = (jnp.zeros(3), None)
    g = voxel_downsample(batch, 1.0, bounds=bounds, semantics="floor",
                         grid_bits=16)
    tl = voxel_downsample(batch, 1.0, bounds=bounds, semantics="floor",
                          grid_bits=16, sort_tiles=t)
    assert int(g.count) == int(tl.count)
    nv = int(g.count)

    def canon(o):
        p = np.asarray(o.data[att.POSITION_3D.name])[:nv]
        i = np.lexsort((p[:, 2], p[:, 1], p[:, 0]))
        return (p[i], np.asarray(o.data[att.INTENSITY.name])[:nv][i])

    for a, b in zip(canon(g), canon(tl)):
        np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-6)
