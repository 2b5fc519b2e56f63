"""Segmented-scan primitive tests vs naive oracles."""

import jax.numpy as jnp
import numpy as np

from pasture_tpu.ops.segscan import (
    seg_totals_lexmax2,
    seg_totals_max,
    seg_totals_sum,
)


def _random_segments(rng, n=257):
    first = rng.random(n) < 0.2
    first[0] = True
    return first


def test_seg_totals_sum_matches_oracle(rng):
    n = 257
    first = _random_segments(rng, n)
    vals = rng.normal(size=(n, 3))
    out = np.asarray(seg_totals_sum(jnp.asarray(vals), jnp.asarray(first)))
    starts = np.flatnonzero(first)
    ends = np.append(starts[1:], n)
    for s, e in zip(starts, ends):
        np.testing.assert_allclose(out[s], vals[s:e].sum(axis=0), atol=1e-9)


def test_seg_totals_max_matches_oracle(rng):
    n = 100
    first = _random_segments(rng, n)
    vals = rng.normal(size=n)
    out = np.asarray(seg_totals_max(jnp.asarray(vals), jnp.asarray(first)))
    starts = np.flatnonzero(first)
    ends = np.append(starts[1:], n)
    for s, e in zip(starts, ends):
        assert out[s] == vals[s:e].max()


def test_seg_totals_lexmax2(rng):
    n = 64
    first = _random_segments(rng, n)
    prim = rng.integers(0, 5, n)
    sec = rng.integers(-10, 10, n)
    p, s = seg_totals_lexmax2(jnp.asarray(prim, jnp.int32),
                              jnp.asarray(sec, jnp.int32),
                              jnp.asarray(first))
    p, s = np.asarray(p), np.asarray(s)
    starts = np.flatnonzero(first)
    ends = np.append(starts[1:], n)
    for a, b in zip(starts, ends):
        pairs = list(zip(prim[a:b], sec[a:b]))
        best = max(pairs)
        assert (p[a], s[a]) == best
