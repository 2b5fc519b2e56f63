"""AABB / minmax / Morton tests (reference: pasture-core/src/math/)."""

import numpy as np
import pytest

from pasture_tpu.math import (AABB, align_to, expand_bits_by_3, infimum,
                              minmax_column, morton_encode_dual32,
                              morton_encode_u64, reverse_bits, supremum)


class TestAABB:
    def test_from_min_max_checks(self):
        with pytest.raises(ValueError):
            AABB.from_min_max([1, 0, 0], [0, 1, 1])
        b = AABB.from_min_max([0, 0, 0], [1, 2, 3])
        assert np.array_equal(b.extent, [1, 2, 3])
        assert np.array_equal(b.center, [0.5, 1.0, 1.5])

    def test_union_extend_intersects_contains(self):
        a = AABB.from_min_max([0, 0, 0], [1, 1, 1])
        b = AABB.from_min_max([2, 2, 2], [3, 3, 3])
        assert not a.intersects(b)
        u = a.union(b)
        assert u == AABB.from_min_max([0, 0, 0], [3, 3, 3])
        assert u.intersects(a) and u.intersects(b)
        e = a.extend_with_point([5, -1, 0.5])
        assert e == AABB.from_min_max([0, -1, 0], [5, 1, 1])
        assert a.contains([0.5, 0.5, 0.5]) and not a.contains([1.5, 0, 0])
        assert a.contains_approx([1.0 + 1e-7, 0, 0])

    def test_as_cubic(self):
        b = AABB.from_min_max([0, 0, 0], [4, 2, 2]).as_cubic()
        assert np.array_equal(b.extent, [4, 4, 4])
        assert np.array_equal(b.center, [2, 1, 1])

    def test_from_points(self):
        assert AABB.from_points([]) is None
        b = AABB.from_points([[1, 2, 3], [-1, 5, 0]])
        assert b == AABB.from_min_max([-1, 2, 0], [1, 5, 3])


class TestMinMax:
    def test_nan_ignoring(self):
        col = np.array([1.0, np.nan, -3.0, 2.0])
        mn, mx = minmax_column(col)
        assert mn == -3.0 and mx == 2.0
        assert infimum(np.array([np.nan]), np.array([1.0]))[0] == 1.0
        assert supremum(np.array([2.0]), np.array([np.nan]))[0] == 2.0

    def test_vector_componentwise(self):
        col = np.array([[1, 5], [3, 2]], np.int32)
        mn, mx = minmax_column(col)
        assert list(mn) == [1, 2] and list(mx) == [3, 5]

    def test_empty(self):
        assert minmax_column(np.zeros((0,))) is None


class TestMorton:
    def test_expand_bits_by_3(self):
        # each input bit i lands at output bit 3*i
        assert expand_bits_by_3(np.uint64(0b1))[()] == 0b1
        assert expand_bits_by_3(np.uint64(0b11))[()] == 0b1001
        assert expand_bits_by_3(np.uint64(1 << 20))[()] == np.uint64(1) << np.uint64(60)

    def test_reverse_bits(self):
        assert reverse_bits(np.uint64(1))[()] == np.uint64(1) << np.uint64(63)
        x = np.uint64(0x123456789ABCDEF0)
        assert reverse_bits(reverse_bits(x))[()] == x

    def test_morton_order_is_z_order(self):
        # sorted morton codes of a 2x2x2 grid follow z-order
        codes = [int(morton_encode_u64(x, y, z)[()])
                 for z in range(2) for y in range(2) for x in range(2)]
        assert codes == [0, 1, 2, 3, 4, 5, 6, 7]

    def test_dual32_matches_u64(self):
        import jax.numpy as jnp
        rng = np.random.default_rng(0)
        ix = rng.integers(0, 1 << 20, 64).astype(np.uint32)
        iy = rng.integers(0, 1 << 20, 64).astype(np.uint32)
        iz = rng.integers(0, 1 << 20, 64).astype(np.uint32)
        hi, lo = morton_encode_dual32(jnp.asarray(ix), jnp.asarray(iy), jnp.asarray(iz))
        combined = (np.asarray(hi).astype(np.uint64) << np.uint64(30)) | \
            np.asarray(lo).astype(np.uint64)
        expected = morton_encode_u64(ix, iy, iz)
        assert np.array_equal(combined, expected)


def test_align_to_reexport():
    assert align_to(5, 8) == 8
