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
