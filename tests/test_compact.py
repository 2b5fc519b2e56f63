"""Staged-shift prefix compaction: exhaustive-random oracle tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pasture_tpu.ops.compact import compact_columns


@pytest.fixture
def rng():
    return np.random.default_rng(42)


@pytest.mark.parametrize("n", [1, 2, 7, 64, 100, 257, 1024])
def test_compact_matches_boolean_indexing(rng, n):
    f = jax.jit(lambda cols, keep: compact_columns(cols, keep))
    for density in (0.0, 0.03, 0.5, 0.97, 1.0):
        for _ in range(8):
            keep = rng.random(n) < density
            vals = rng.integers(0, 10_000, n).astype(np.int32)
            vals2 = rng.random(n).astype(np.float32)
            (c1, c2), cnt = f([jnp.asarray(vals), jnp.asarray(vals2)],
                              jnp.asarray(keep))
            m = int(keep.sum())
            assert int(cnt) == m
            np.testing.assert_array_equal(np.asarray(c1)[:m], vals[keep])
            np.testing.assert_array_equal(np.asarray(c2)[:m], vals2[keep])


def test_compact_order_preserved_large(rng):
    n = 1 << 15
    keep = rng.random(n) < 0.2
    vals = np.arange(n, dtype=np.int32)
    (c,), cnt = jax.jit(compact_columns)([jnp.asarray(vals)],
                                         jnp.asarray(keep))
    got = np.asarray(c)[: int(cnt)]
    np.testing.assert_array_equal(got, vals[keep])
    assert np.all(np.diff(got) > 0)


@pytest.mark.parametrize("tiles", [2, 8, 32])
def test_compact_tiled_matches_flat(rng, tiles):
    n = tiles * 1024
    for density in (0.02, 0.5, 0.97, 1.0):
        keep = rng.random(n) < density
        vals = rng.integers(0, 1 << 30, n).astype(np.int32)
        vals2 = rng.random(n).astype(np.float32)
        f = jax.jit(lambda c, k: compact_columns(c, k, tiles=tiles),
                    static_argnames=())
        (c1, c2), cnt = f([jnp.asarray(vals), jnp.asarray(vals2)],
                          jnp.asarray(keep))
        m = int(keep.sum())
        assert int(cnt) == m
        np.testing.assert_array_equal(np.asarray(c1)[:m], vals[keep])
        np.testing.assert_array_equal(np.asarray(c2)[:m], vals2[keep])


def test_compact_auto_tiling_large(rng):
    n = 64 * 8192
    keep = rng.random(n) < 0.9
    vals = np.arange(n, dtype=np.int32)
    (c,), cnt = jax.jit(compact_columns)([jnp.asarray(vals)],
                                         jnp.asarray(keep))
    got = np.asarray(c)[: int(cnt)]
    np.testing.assert_array_equal(got, vals[keep])
