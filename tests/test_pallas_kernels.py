"""Pallas kernel tests (interpret mode on CPU)."""

import jax.numpy as jnp
import numpy as np

from pasture_tpu.math.morton import morton_encode_u64
from pasture_tpu.ops.kernels import fused_decode_transform_key


def test_fused_decode_transform_key_matches_reference(rng):
    n = 32768
    local = rng.integers(0, 100_000, (n, 3)).astype(np.int32)
    scale = np.asarray([0.001, 0.001, 0.001], np.float32)
    theta = 0.3
    rot = np.asarray([[np.cos(theta), -np.sin(theta), 0],
                      [np.sin(theta), np.cos(theta), 0],
                      [0, 0, 1]], np.float32)
    trans = np.asarray([5.0, -2.0, 1.0], np.float32)
    bmin = np.asarray([-80.0, -80.0, 0.0], np.float32)
    leaf = 0.25

    world, key = fused_decode_transform_key(
        jnp.asarray(local), jnp.asarray(scale), jnp.asarray(rot),
        jnp.asarray(trans), jnp.asarray(bmin), leaf, interpret=True)

    expect_world = (local.astype(np.float32) * scale) @ rot.T + trans
    np.testing.assert_allclose(np.asarray(world), expect_world, rtol=1e-5,
                               atol=1e-3)

    cell = np.clip(np.floor((expect_world - bmin) / leaf), 0, 1023
                   ).astype(np.uint64)
    expect_key = morton_encode_u64(cell[:, 0], cell[:, 1], cell[:, 2]
                                   ).astype(np.uint32)
    got = np.asarray(key)
    # f32 rounding can flip a cell at boundaries for a few points
    mismatch = np.mean(got != expect_key)
    assert mismatch < 0.001, mismatch


def test_fused_voxel_head_matches_internal_path(rng):
    """fused_voxel_head (keys, qword) + voxel_downsample(precomputed=...)
    must equal the internal quantized path exactly."""
    import jax
    import jax.numpy as jnp
    from pasture_tpu.buffers.device import PointBatch
    from pasture_tpu.layout import attributes as att
    from pasture_tpu.layout.schema import PointSchema
    from pasture_tpu.ops import (affine_transform, decode_las_positions,
                                 voxel_downsample)
    from pasture_tpu.ops.kernels import fused_voxel_head

    n = 32768
    local = rng.integers(0, 100_000, (n, 3)).astype(np.int32)
    inten = rng.integers(0, 65536, n).astype(np.uint16)
    cls = rng.integers(0, 32, n).astype(np.uint8)
    scale = np.asarray([0.001] * 3, np.float32)
    th = 0.25
    rot = np.asarray([[np.cos(th), -np.sin(th), 0],
                      [np.sin(th), np.cos(th), 0], [0, 0, 1]], np.float32)
    trans = np.asarray([5.0, -2.0, 1.0], np.float32)
    leaf = 0.5

    pos = decode_las_positions(jnp.asarray(local), jnp.asarray(scale),
                               jnp.zeros(3, jnp.float32))
    pos = affine_transform(pos, jnp.asarray(rot), jnp.asarray(trans))
    bmin = jnp.min(pos, axis=0)
    schema = PointSchema.from_attributes(
        [att.POSITION_3D, att.INTENSITY, att.CLASSIFICATION])
    data = {att.POSITION_3D.name: pos,
            att.INTENSITY.name: jnp.asarray(inten),
            att.CLASSIFICATION.name: jnp.asarray(cls)}
    full = PointBatch(data, jnp.asarray(n, jnp.int32), schema, {})

    from pasture_tpu.math.morton import morton_decode_u32
    from pasture_tpu.ops.voxel import _keys, voxel_indices

    for sem in ("floor", "nearest"):
        want = voxel_downsample(full, leaf, bounds=(bmin, None),
                                semantics=sem, grid_bits=10,
                                position_quantization_bits=10)
        keys, qword = fused_voxel_head(
            jnp.asarray(local), jnp.asarray(scale), jnp.asarray(rot),
            jnp.asarray(trans), bmin, leaf, qbits=10, semantics=sem,
            interpret=True)

        # (a) kernel keys match the XLA path except for rare float-boundary
        # cell flips (different op orders round differently at cell edges)
        mask = jnp.ones((n,), bool)
        cells = voxel_indices(pos, mask, leaf, bmin, sem, 10)
        xla_key = _keys(cells, mask, 10)[0]
        frac = float(np.mean(np.asarray(keys) == np.asarray(xla_key)))
        assert frac > 0.998, (sem, frac)

        # (b) given the kernel's keys/qword, the precomputed path must
        # reproduce the internal quantized pipeline bit-for-bit: feed the
        # SAME (keys, qword) through a full batch carrying positions too
        nopos = PointBatch({att.INTENSITY.name: jnp.asarray(inten),
                            att.CLASSIFICATION.name: jnp.asarray(cls)},
                           jnp.asarray(n, jnp.int32), schema, {})
        got = voxel_downsample(nopos, leaf, bounds=(bmin, None),
                               semantics=sem, grid_bits=10,
                               position_quantization_bits=10,
                               precomputed=(keys, qword))
        assert int(want.count) in range(int(got.count) - 40,
                                        int(got.count) + 41), sem
        # exact check against an oracle built from the kernel's own cells
        kx, ky, kz = (np.asarray(c) for c in morton_decode_u32(keys))
        qw = np.asarray(qword)
        window = 1.5 if sem == "nearest" else 1.0
        groups = {}
        for i in range(n):
            groups.setdefault((kx[i], ky[i], kz[i]), []).append(i)
        nv = int(got.count)
        assert nv == len(groups)
        gp = np.asarray(got.data[att.POSITION_3D.name])[:nv]
        bm = np.asarray(bmin)
        want_pos = {}
        for cell, members in groups.items():
            qs = np.stack([(qw[members] >> 20) & 1023,
                           (qw[members] >> 10) & 1023,
                           qw[members] & 1023], axis=1).astype(np.float64)
            mean_r = (qs.mean(axis=0) + 0.5) * (window / 1024)
            want_pos[cell] = (np.asarray(cell) + mean_r) * leaf + bm
        wp = np.stack(list(want_pos.values()))
        for j in range(nv):
            d = np.linalg.norm(wp - gp[j][None, :], axis=1)
            assert d.min() < 1e-4, (sem, j, d.min())


def test_blockwise_compact_pallas_matches_boolean_indexing(rng):
    from pasture_tpu.ops.kernels.compact_kernel import (
        PALLAS_COMPACT_BLOCK, blockwise_compact_pallas)

    n = 2 * PALLAS_COMPACT_BLOCK
    keep = rng.random(n) < 0.9
    vals = np.arange(n, dtype=np.int32)
    f = rng.random(n).astype(np.float32)
    (c1, c2), cnts = blockwise_compact_pallas(
        [jnp.asarray(vals), jnp.asarray(f)], jnp.asarray(keep),
        interpret=True)
    c1, c2, cnts = np.asarray(c1), np.asarray(c2), np.asarray(cnts)
    B = PALLAS_COMPACT_BLOCK
    for b in range(2):
        kb = keep[b * B:(b + 1) * B]
        m = kb.sum()
        assert cnts[b] == m
        np.testing.assert_array_equal(c1[b * B:b * B + m],
                                      vals[b * B:(b + 1) * B][kb])
        np.testing.assert_array_equal(c2[b * B:b * B + m],
                                      f[b * B:(b + 1) * B][kb])


def test_fused_sorted_voxel_reduce_matches_generic_path(rng):
    """The fully-fused blockwise reduce+compact kernel must reproduce the
    generic quantized pipeline exactly (same keys/qwords, same policies)."""
    import jax
    import jax.numpy as jnp
    from pasture_tpu.buffers.device import PointBatch
    from pasture_tpu.layout import attributes as att
    from pasture_tpu.layout.schema import PointSchema
    from pasture_tpu.ops import voxel_downsample
    from pasture_tpu.ops import voxel as voxel_mod
    from pasture_tpu.ops.kernels.voxel_reduce_kernel import REDUCE_BLOCK

    n = REDUCE_BLOCK  # one kernel block, 16 sort tiles inside
    tiles = 16
    l = n // tiles
    # spatially-disjoint x-slabs so tiled sorting is exact
    pos = np.concatenate([np.stack([
        rng.uniform(4 * i, 4 * i + 4, l), rng.uniform(0, 64, l),
        rng.uniform(0, 64, l)], axis=1) for i in range(tiles)]
    ).astype(np.float32)
    inten = rng.integers(0, 65536, n).astype(np.uint16)
    cls = rng.integers(0, 32, n).astype(np.uint8)
    schema = PointSchema.from_attributes(
        [att.POSITION_3D, att.INTENSITY, att.CLASSIFICATION])
    data = {att.POSITION_3D.name: jnp.asarray(pos),
            att.INTENSITY.name: jnp.asarray(inten),
            att.CLASSIFICATION.name: jnp.asarray(cls)}
    count = n - 1000   # exercise the invalid tail too
    batch = PointBatch(data, jnp.asarray(count, jnp.int32), schema, {})
    bounds = (jnp.zeros(3, jnp.float32), None)

    def run():
        return voxel_downsample(batch, 2.0, bounds=bounds,
                                semantics="floor", grid_bits=10,
                                position_quantization_bits=10,
                                sort_tiles=tiles)

    want = run()
    voxel_mod._FORCE_FUSED_REDUCE = True
    try:
        got = run()
    finally:
        voxel_mod._FORCE_FUSED_REDUCE = None
    assert int(want.count) == int(got.count)
    nv = int(want.count)
    for name in data:
        np.testing.assert_allclose(
            np.asarray(want.data[name])[:nv],
            np.asarray(got.data[name])[:nv], rtol=1e-6, atol=2e-5,
            err_msg=name)


def test_fused_world_bounds_matches_numpy(rng):
    from pasture_tpu.ops.kernels import fused_world_bounds

    n = 2 * 32768
    local = rng.integers(-50_000, 150_000, (n, 3)).astype(np.int32)
    scale = np.asarray([0.001, 0.002, 0.0005], np.float32)
    th = 0.7
    rot = np.asarray([[np.cos(th), -np.sin(th), 0],
                      [np.sin(th), np.cos(th), 0], [0, 0, 1]], np.float32)
    trans = np.asarray([3.0, -8.0, 0.5], np.float32)
    mn, mx = fused_world_bounds(jnp.asarray(local), jnp.asarray(scale),
                                jnp.asarray(rot), jnp.asarray(trans),
                                interpret=True)
    world = (local.astype(np.float32) * scale) @ rot.T + trans
    np.testing.assert_allclose(np.asarray(mn), world.min(0), atol=1e-3)
    np.testing.assert_allclose(np.asarray(mx), world.max(0), atol=1e-3)


def test_fused_sorted_voxel_reduce_exact_positions(rng):
    """The EXACT fused path (positions ride the sort as f32 operands, no
    quantization) must reproduce the generic exact pipeline bit-for-bit up
    to f32 reduction order."""
    import jax.numpy as jnp
    from pasture_tpu.buffers.device import PointBatch
    from pasture_tpu.layout import attributes as att
    from pasture_tpu.layout.schema import PointSchema
    from pasture_tpu.ops import voxel_downsample
    from pasture_tpu.ops import voxel as voxel_mod
    from pasture_tpu.ops.kernels.voxel_reduce_kernel import REDUCE_BLOCK

    n = REDUCE_BLOCK
    tiles = 16
    l = n // tiles
    pos = np.concatenate([np.stack([
        rng.uniform(4 * i, 4 * i + 4, l), rng.uniform(0, 64, l),
        rng.uniform(0, 64, l)], axis=1) for i in range(tiles)]
    ).astype(np.float32)
    inten = rng.integers(0, 65536, n).astype(np.uint16)
    cls = rng.integers(0, 32, n).astype(np.uint8)
    schema = PointSchema.from_attributes(
        [att.POSITION_3D, att.INTENSITY, att.CLASSIFICATION])
    data = {att.POSITION_3D.name: jnp.asarray(pos),
            att.INTENSITY.name: jnp.asarray(inten),
            att.CLASSIFICATION.name: jnp.asarray(cls)}
    count = n - 777
    batch = PointBatch(data, jnp.asarray(count, jnp.int32), schema, {})
    bounds = (jnp.zeros(3, jnp.float32), None)

    def run():
        # NO position_quantization_bits: the exact configuration
        return voxel_downsample(batch, 2.0, bounds=bounds,
                                semantics="floor", grid_bits=10,
                                sort_tiles=tiles)

    want = run()
    voxel_mod._FORCE_FUSED_REDUCE = True
    try:
        got = run()
    finally:
        voxel_mod._FORCE_FUSED_REDUCE = None
    assert int(want.count) == int(got.count)
    nv = int(want.count)
    for name in data:
        np.testing.assert_allclose(
            np.asarray(want.data[name])[:nv],
            np.asarray(got.data[name])[:nv], rtol=1e-6, atol=1e-4,
            err_msg=name)


def test_precomputed_exact_keys(rng):
    """voxel_downsample(precomputed=(keys, None)): given keys + the batch's
    own position column, results match computing keys internally."""
    import jax.numpy as jnp
    from pasture_tpu.buffers.device import PointBatch
    from pasture_tpu.layout import attributes as att
    from pasture_tpu.layout.schema import PointSchema
    from pasture_tpu.ops import voxel_downsample
    from pasture_tpu.ops.voxel import voxel_indices, _keys

    n = 4096
    pos = rng.uniform(0, 64, (n, 3)).astype(np.float32)
    inten = rng.integers(0, 65536, n).astype(np.uint16)
    schema = PointSchema.from_attributes([att.POSITION_3D, att.INTENSITY])
    data = {att.POSITION_3D.name: jnp.asarray(pos),
            att.INTENSITY.name: jnp.asarray(inten)}
    batch = PointBatch(data, jnp.asarray(n, jnp.int32), schema, {})
    bmin = jnp.zeros(3, jnp.float32)

    want = voxel_downsample(batch, 2.0, bounds=(bmin, None),
                            semantics="floor", grid_bits=10)
    cells = voxel_indices(batch.data[att.POSITION_3D.name],
                          batch.valid_mask(), 2.0, bmin, "floor", 10)
    keys = _keys(cells, batch.valid_mask(), 10)[0]
    got = voxel_downsample(batch, 2.0, bounds=(bmin, None),
                           semantics="floor", grid_bits=10,
                           precomputed=(keys, None))
    assert int(want.count) == int(got.count)
    nv = int(want.count)
    for name in data:
        np.testing.assert_allclose(np.asarray(want.data[name])[:nv],
                                   np.asarray(got.data[name])[:nv],
                                   rtol=1e-6, atol=1e-5, err_msg=name)


def test_exact_local_residual_path_matches_exact_f32(rng):
    """EXACT-LOCAL path (10-bit integer local residuals, one u32 sort
    operand; centroid = affine(exact local mean)) vs the EXACT-f32 path
    (positions as 3 f32 sort operands) on the SAME precomputed keys, plus
    an f64 oracle: the local path must agree with exact-f32 to f32
    precision and be at least as close to the f64 ground truth."""
    import jax.numpy as jnp
    from pasture_tpu.buffers.device import PointBatch
    from pasture_tpu.layout import attributes as att
    from pasture_tpu.layout.schema import PointSchema
    from pasture_tpu.math.morton import morton_decode_u32
    from pasture_tpu.ops import voxel_downsample
    from pasture_tpu.ops import voxel as voxel_mod
    from pasture_tpu.ops.kernels import (exact_local_max_leaf,
                                         fused_voxel_head_exact_local)
    from pasture_tpu.ops.kernels.fused_transform import (
        exact_local_base_coeffs)
    from pasture_tpu.ops.kernels.voxel_reduce_kernel import REDUCE_BLOCK

    n = REDUCE_BLOCK
    tiles = 16
    l = n // tiles
    scale = np.asarray([0.001, 0.001, 0.001], np.float32)
    th = 0.25
    rot = np.asarray([[np.cos(th), -np.sin(th), 0.0],
                      [np.sin(th), np.cos(th), 0.0],
                      [0.0, 0.0, 1.0]], np.float32)
    trans = np.asarray([10.0, -5.0, 2.0], np.float32)
    # spatially-disjoint z-slabs, 500 locals (= 1 leaf) each
    zs = np.concatenate([rng.integers(i * 500, (i + 1) * 500, l)
                         for i in range(tiles)])
    local = np.stack([rng.integers(0, 100_000, n),
                      rng.integers(0, 100_000, n), zs],
                     axis=1).astype(np.int32)
    world = ((local.astype(np.float32) * scale) @ rot.T
             + trans).astype(np.float32)
    inten = rng.integers(0, 65536, n).astype(np.uint16)
    cls = rng.integers(0, 32, n).astype(np.uint8)
    schema = PointSchema.from_attributes(
        [att.POSITION_3D, att.INTENSITY, att.CLASSIFICATION])
    count = n - 777
    bmin = jnp.asarray(world.min(axis=0))
    bounds = (bmin, None)

    for sem in ("floor", "nearest"):
        # "nearest" has a tighter residual window (1.5 leaves): use a leaf
        # within its exact_local_max_leaf bound (0.25 <= ~0.384); slab
        # boundaries (multiples of 0.5 world units) stay leaf multiples
        leaf = 0.5 if sem == "floor" else 0.25
        assert leaf <= exact_local_max_leaf(scale, sem)
        coeffs = exact_local_base_coeffs(
            jnp.asarray(scale), jnp.asarray(rot), jnp.asarray(trans),
            bmin, leaf, semantics=sem)
        keys, rword = fused_voxel_head_exact_local(
            jnp.asarray(local), jnp.asarray(scale), jnp.asarray(rot),
            jnp.asarray(trans), bmin, leaf, coeffs, semantics=sem,
            interpret=True)

        # reference: exact-f32 path on the SAME keys
        fbatch = PointBatch(
            {att.POSITION_3D.name: jnp.asarray(world),
             att.INTENSITY.name: jnp.asarray(inten),
             att.CLASSIFICATION.name: jnp.asarray(cls)},
            jnp.asarray(count, jnp.int32), schema, {})
        want = voxel_downsample(fbatch, leaf, bounds=bounds, semantics=sem,
                                grid_bits=10, sort_tiles=tiles,
                                precomputed=(keys, None))

        nopos = PointBatch(
            {att.INTENSITY.name: jnp.asarray(inten),
             att.CLASSIFICATION.name: jnp.asarray(cls)},
            jnp.asarray(count, jnp.int32), schema, {})
        affine = (jnp.asarray(scale), jnp.asarray(rot), jnp.asarray(trans),
                  coeffs)
        results = {}
        for forced in (False, True):
            voxel_mod._FORCE_FUSED_REDUCE = forced
            try:
                results[forced] = voxel_downsample(
                    nopos, leaf, bounds=bounds, semantics=sem,
                    grid_bits=10, sort_tiles=tiles,
                    precomputed=(keys, rword), local_affine=affine)
            finally:
                voxel_mod._FORCE_FUSED_REDUCE = None

        for forced, got in results.items():
            assert int(got.count) == int(want.count), (sem, forced)
            nv = int(want.count)
            for name in (att.INTENSITY.name, att.CLASSIFICATION.name):
                np.testing.assert_array_equal(
                    np.asarray(want.data[name])[:nv],
                    np.asarray(got.data[name])[:nv],
                    err_msg=f"{sem} forced={forced} {name}")
            np.testing.assert_allclose(
                np.asarray(want.data[att.POSITION_3D.name])[:nv],
                np.asarray(got.data[att.POSITION_3D.name])[:nv],
                atol=2e-4, err_msg=f"{sem} forced={forced}")

        # f64 oracle: affine of the exact local mean per (tile, voxel)
        # (sort_tiles semantics: one centroid per tile a voxel touches)
        kx, ky, kz = (np.asarray(c) for c in morton_decode_u32(keys))
        groups = {}
        for i in range(count):
            groups.setdefault((i // l, kx[i], ky[i], kz[i]),
                              []).append(i)
        got = results[True]
        nv = int(got.count)
        assert nv == len(groups)
        gp = np.asarray(got.data[att.POSITION_3D.name])[:nv]
        oracle = np.stack([
            (local[m].astype(np.float64).mean(axis=0) * scale) @ rot.T
            + trans for m in map(list, groups.values())])
        for j in range(nv):
            d = np.linalg.norm(oracle - gp[j][None, :], axis=1)
            assert d.min() < 5e-4, (sem, j, d.min())


def test_exact_local_leaf_contract_enforced():
    """A leaf_size beyond exact_local_max_leaf must raise (residuals would
    silently clip to the 10-bit window otherwise — advisor r3 medium)."""
    import jax.numpy as jnp
    import pytest
    from pasture_tpu.ops.kernels import exact_local_max_leaf
    from pasture_tpu.ops.kernels.fused_transform import (
        exact_local_base_coeffs)

    scale = jnp.asarray([0.001, 0.001, 0.001], jnp.float32)
    eye = jnp.eye(3, dtype=jnp.float32)
    zero = jnp.zeros(3, jnp.float32)
    for sem in ("floor", "nearest"):
        bound = exact_local_max_leaf(scale, sem)
        # at the bound: fine
        exact_local_base_coeffs(scale, eye, zero, zero, bound * 0.999,
                                semantics=sem)
        with pytest.raises(ValueError, match="exact_local_max_leaf"):
            exact_local_base_coeffs(scale, eye, zero, zero, bound * 1.01,
                                    semantics=sem)


def test_tile_sort_pallas_matches_lax_sort(rng):
    """Blockwise bitonic tile sort == lax.sort on (tiles, tile_len) rows:
    keys bit-identical; (key, payload...) tuples form identical per-tile
    multisets (both sorts are unstable within equal keys); 2-key
    lexicographic mode matches on both key streams."""
    import jax.numpy as jnp
    from jax import lax
    from pasture_tpu.ops.kernels.tile_sort_kernel import (
        supports_tile_sort, tile_sort_pallas)

    n, tile = 2 * 65536, 512
    assert supports_tile_sort(n, tile, 3)
    assert not supports_tile_sort(n, 96, 3)       # not a supported tile
    assert not supports_tile_sort(n + 4, tile, 3)  # not block-aligned
    key = rng.integers(0, 1 << 10, n).astype(np.uint32)  # many duplicates
    a = rng.integers(0, 1 << 32, n).astype(np.uint32)
    f = rng.random(n).astype(np.float32)
    ops = (jnp.asarray(key), jnp.asarray(a),
           lax.bitcast_convert_type(jnp.asarray(f), jnp.uint32))
    got = tile_sort_pallas(ops, tile, num_keys=1, interpret=True)
    want = tuple(w.reshape(-1) for w in lax.sort(
        tuple(o.reshape(-1, tile) for o in ops), dimension=1, num_keys=1,
        is_stable=False))
    np.testing.assert_array_equal(np.asarray(got[0]), np.asarray(want[0]))

    def canon(cols, i):
        t = np.stack([np.asarray(c).reshape(-1, tile)[i] for c in cols],
                     axis=1)
        return np.sort(np.ascontiguousarray(t).view(
            [('k', '<u4'), ('a', '<u4'), ('b', '<u4')]).ravel())

    for i in range(0, n // tile, 17):
        np.testing.assert_array_equal(canon(got, i), canon(want, i))

    got2 = tile_sort_pallas(ops, tile, num_keys=2, interpret=True)
    want2 = tuple(w.reshape(-1) for w in lax.sort(
        tuple(o.reshape(-1, tile) for o in ops), dimension=1, num_keys=2,
        is_stable=False))
    for g2, w2 in zip(got2[:2], want2[:2]):
        np.testing.assert_array_equal(np.asarray(g2), np.asarray(w2))


def test_voxel_pipeline_with_pallas_tile_sort(rng):
    """The full exact-local voxel pipeline with the Pallas tile sort forced
    on must reproduce the lax.sort pipeline's outputs exactly."""
    import jax.numpy as jnp
    from pasture_tpu.buffers.device import PointBatch
    from pasture_tpu.layout import attributes as att
    from pasture_tpu.layout.schema import PointSchema
    from pasture_tpu.ops import voxel_downsample
    from pasture_tpu.ops import voxel as voxel_mod
    from pasture_tpu.ops.kernels import fused_voxel_head_exact_local
    from pasture_tpu.ops.kernels.fused_transform import (
        exact_local_base_coeffs)

    n, tiles = 65536 * 2, 256          # tile_len = 512
    l = n // tiles
    leaf = 0.5
    scale = np.asarray([0.001] * 3, np.float32)
    rot = np.eye(3, dtype=np.float32)
    trans = np.zeros(3, np.float32)
    zs = np.concatenate([rng.integers(i * 500, (i + 1) * 500, l)
                         for i in range(tiles)])
    local = np.stack([rng.integers(0, 100_000, n),
                      rng.integers(0, 100_000, n), zs],
                     axis=1).astype(np.int32)
    inten = rng.integers(0, 65536, n).astype(np.uint16)
    cls = rng.integers(0, 32, n).astype(np.uint8)
    schema = PointSchema.from_attributes(
        [att.POSITION_3D, att.INTENSITY, att.CLASSIFICATION])
    bmin = jnp.zeros(3, jnp.float32)
    coeffs = exact_local_base_coeffs(
        jnp.asarray(scale), jnp.asarray(rot), jnp.asarray(trans), bmin,
        leaf, semantics="floor")
    keys, rword = fused_voxel_head_exact_local(
        jnp.asarray(local), jnp.asarray(scale), jnp.asarray(rot),
        jnp.asarray(trans), bmin, leaf, coeffs, semantics="floor",
        interpret=True)
    batch = PointBatch(
        {att.INTENSITY.name: jnp.asarray(inten),
         att.CLASSIFICATION.name: jnp.asarray(cls)},
        jnp.asarray(n, jnp.int32), schema, {})
    affine = (jnp.asarray(scale), jnp.asarray(rot), jnp.asarray(trans),
              coeffs)
    results = {}
    for forced in (False, True):
        voxel_mod._FORCE_PALLAS_TILE_SORT = forced
        try:
            results[forced] = voxel_downsample(
                batch, leaf, bounds=(bmin, None), semantics="floor",
                grid_bits=10, sort_tiles=tiles, precomputed=(keys, rword),
                local_affine=affine)
        finally:
            voxel_mod._FORCE_PALLAS_TILE_SORT = None
    a, b = results[False], results[True]
    assert int(a.count) == int(b.count)
    nv = int(a.count)
    for name in a.data:
        np.testing.assert_allclose(np.asarray(a.data[name])[:nv],
                                   np.asarray(b.data[name])[:nv],
                                   atol=1e-5, err_msg=name)


def test_window_fit_moments_kernel_matches_oracle(rng):
    """Blockwise window-fit kernel (round 5): selected-neighbourhood
    moments equal a numpy sliding-window oracle — selection (k-th
    smallest threshold, ties, finite guard) and query-frame sums, across
    a block boundary and with invalid (inf) candidates."""
    import numpy as np

    from pasture_tpu.ops.kernels.window_fit_kernel import (
        WINDOW_BLOCK, window_fit_moments_pallas)

    k, w = 4, 8
    n = WINDOW_BLOCK + WINDOW_BLOCK // 2          # 2 blocks, padded tail
    pos = rng.uniform(0, 30, (n, 3)).astype(np.float32)
    validc = rng.random(n) > 0.02                 # some invalid candidates
    ppc = np.where(validc[:, None], pos, np.inf).astype(np.float32)
    pp = np.concatenate([np.full((w, 3), np.inf, np.float32), ppc,
                         np.full((w, 3), np.inf, np.float32)])

    cnt, tight, s, m6 = window_fit_moments_pallas(
        jnp.asarray(pos), jnp.asarray(pp), k=k, w=w, interpret=True)

    win = np.lib.stride_tricks.sliding_window_view(
        pp, 2 * w + 1, axis=0)                    # (n, 3, 2w+1)
    d = win - pos[:, :, None]
    d2 = np.einsum("nci,nci->ni", d, d)           # inf for invalid cands
    thr = np.sort(d2, axis=1)[:, k - 1]
    sel = (d2 <= thr[:, None]) & np.isfinite(win[:, 0, :])
    np.testing.assert_array_equal(np.asarray(cnt),
                                  sel.sum(axis=1).astype(np.float32))
    np.testing.assert_allclose(np.asarray(tight),
                               np.where(sel, d2, 0).sum(axis=1),
                               rtol=1e-5, atol=1e-4)
    dq = np.where(sel[:, None, :], d, 0.0)
    np.testing.assert_allclose(np.asarray(s), dq.sum(axis=2),
                               rtol=1e-5, atol=1e-4)
    pairs = [(0, 0), (1, 1), (2, 2), (0, 1), (0, 2), (1, 2)]
    ref_m6 = np.stack([(dq[:, a, :] * dq[:, b, :]).sum(axis=1)
                       for a, b in pairs], axis=1)
    np.testing.assert_allclose(np.asarray(m6), ref_m6, rtol=1e-4,
                               atol=1e-3)
