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


def test_seg_totals_top2_max_matches_oracle(rng):
    from pasture_tpu.ops.segscan import seg_totals_top2_max
    n = 300
    first = _random_segments(rng, n)
    vals = rng.integers(-50, 50, n).astype(np.int32)
    m1, m2 = seg_totals_top2_max(jnp.asarray(vals), jnp.asarray(first))
    m1, m2 = np.asarray(m1), np.asarray(m2)
    starts = np.flatnonzero(first)
    ends = np.append(starts[1:], n)
    neutral = np.iinfo(np.int32).min
    for s, e in zip(starts, ends):
        seg = np.sort(vals[s:e])[::-1]
        assert m1[s] == seg[0]
        assert m2[s] == (seg[1] if len(seg) > 1 else neutral)


def test_seg_totals_top2_lexmax2_matches_oracle(rng):
    from pasture_tpu.ops.segscan import seg_totals_top2_lexmax2
    n = 300
    first = _random_segments(rng, n)
    p = rng.integers(0, 6, n).astype(np.int32)     # many primary ties
    s_ = rng.integers(-40, 40, n).astype(np.int32)
    p1, s1, p2, s2 = seg_totals_top2_lexmax2(
        jnp.asarray(p), jnp.asarray(s_), jnp.asarray(first))
    p1, s1, p2, s2 = map(np.asarray, (p1, s1, p2, s2))
    starts = np.flatnonzero(first)
    ends = np.append(starts[1:], n)
    imin = np.iinfo(np.int32).min
    for st, e in zip(starts, ends):
        pairs = sorted(zip(p[st:e], s_[st:e]), reverse=True)
        assert (p1[st], s1[st]) == pairs[0]
        want2 = pairs[1] if len(pairs) > 1 else (imin, imin)
        assert (p2[st], s2[st]) == want2
