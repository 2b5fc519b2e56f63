"""TILES sweep for the exact-local headline: is the per-tile sort cheaper
with more, smaller spatially-disjoint tiles?  (sort_ablation showed
batched sorts get cheaper as rows shrink: fewer bitonic stages.)

Tiles are (z-slab, x-stripe) blocks: 1024 z-slabs (the 10-bit grid cap)
times 1..4 x-stripes, stripe boundaries voxel-aligned so per-tile
voxelization still equals global.

Run:  timeout 5400 /opt/venv/bin/python benches/tile_probe.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from pasture_tpu.buffers.device import PointBatch
from pasture_tpu.layout import attributes as att
from pasture_tpu.layout.schema import PointSchema
from pasture_tpu.ops import voxel_downsample
from pasture_tpu.ops.kernels import (fused_voxel_head_exact_local,
                                     fused_world_bounds)
from pasture_tpu.ops.kernels.fused_transform import exact_local_base_coeffs

N = 1 << 22
LEAF = 0.5
K = 8
ZTILES = 1024


def chk(x):
    return jnp.sum(x[:16].astype(jnp.float32)).astype(jnp.int32)


def timed(fn, *args, repeats=3):
    t0 = time.perf_counter()
    int(fn(*args))
    print(f"  (compile+first {time.perf_counter()-t0:.0f}s)", flush=True)
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        int(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best


def make_batch(n, xtiles):
    """(z-slab, x-stripe)-ordered points; stripe width 200_000/xtiles
    locals (multiple of 500 = one leaf)."""
    rng = np.random.default_rng(7)
    tiles = ZTILES * xtiles
    per = n // tiles
    stripe = 200_000 // xtiles
    assert stripe % 500 == 0
    parts = []
    for zi in range(ZTILES):
        for xi in range(xtiles):
            parts.append(np.stack([
                rng.integers(xi * stripe, (xi + 1) * stripe, per,
                             dtype=np.int32),
                rng.integers(0, 200_000, per, dtype=np.int32),
                rng.integers(zi * 500, (zi + 1) * 500, per,
                             dtype=np.int32)], axis=1))
    local = np.concatenate(parts)
    schema = PointSchema.from_attributes(
        [att.POSITION_3D, att.INTENSITY, att.CLASSIFICATION])
    data = {
        "LASLocalPosition": jnp.asarray(local),
        att.INTENSITY.name: jnp.asarray(
            rng.integers(0, 65536, n).astype(np.uint16)),
        att.CLASSIFICATION.name: jnp.asarray(
            rng.integers(0, 32, n).astype(np.uint8)),
    }
    return PointBatch(data, jnp.asarray(n, jnp.int32), schema, {})


def make_run(tiles):
    def one(batch, shift):
        scale = jnp.asarray([0.001] * 3, jnp.float32)
        local = batch.data["LASLocalPosition"]
        # rotation about z would break x-stripe disjointness; identity
        # rotation keeps stripes axis-aligned (ingest-shaped data)
        rot = jnp.eye(3, dtype=jnp.float32)
        t = jnp.asarray([10., -5., 2.], jnp.float32) + shift
        wmin, _ = fused_world_bounds(local, scale, rot, t)
        bmin = jnp.stack([t[0], wmin[1], t[2]])
        coeffs = exact_local_base_coeffs(scale, rot, t, bmin, LEAF,
                                         "floor")
        keys, rword = fused_voxel_head_exact_local(
            local, scale, rot, t, bmin, LEAF, coeffs, semantics="floor")
        data = dict(batch.data)
        del data["LASLocalPosition"]
        b = PointBatch(data, batch.count, batch.schema, batch.meta)
        out = voxel_downsample(
            b, LEAF, bounds=(bmin, None), semantics="floor",
            grid_bits=10, sort_tiles=tiles, precomputed=(keys, rword),
            local_affine=(scale, rot, t, coeffs))
        checksum = out.count
        for col in out.data.values():
            checksum = checksum + chk(col)
        return checksum

    @jax.jit
    def run(b):
        def bf(i, carry):
            return carry + one(b, (carry.astype(jnp.float32) % 7.) * 1e-6)
        return lax.fori_loop(0, K, bf, jnp.asarray(0, jnp.int32))
    return run


def main():
    b1 = make_batch(N, 1)

    @jax.jit
    def overhead(b):
        return chk(b.data["LASLocalPosition"][:, 0])
    t0 = timed(overhead, b1)
    print(f"overhead {t0*1e3:7.2f} ms", flush=True)

    for xtiles in (1, 2, 4):
        batch = make_batch(N, xtiles) if xtiles > 1 else b1
        tiles = ZTILES * xtiles
        print(f"tiles={tiles} ...", flush=True)
        t = (timed(make_run(tiles), batch) - t0) / K * 1e3
        print(f"tiles={tiles:5d}  {t:6.2f} ms  "
              f"({N / (t / 1e3) / 1e6:.0f} Mpts/s)", flush=True)


if __name__ == "__main__":
    main()


def make_batch_world_stripes(n, xtiles, theta=0.25):
    """Points sampled per (z-slab, WORLD-x stripe) under a z-rotation:
    ingest-ordered tiles that stay voxel-disjoint in the OUTPUT frame
    even though the transform rotates.  Locals are the inverse-affine
    images rounded to i32 (boundary straddle <= 2 locals: a voxel on a
    stripe edge may emit per-tile centroids, which the sort_tiles
    contract allows)."""
    rng = np.random.default_rng(7)
    tiles = ZTILES * xtiles
    per = n // tiles
    c, s = np.cos(theta), np.sin(theta)
    rot = np.asarray([[c, -s, 0], [s, c, 0], [0, 0, 1]], np.float32)
    t = np.asarray([10., -5., 2.], np.float64)
    # world xy region = rotated image of the local [0,200]^2 km box;
    # carve stripes along world x within a conservative inner box
    wx_lo, wx_hi = 60.0, 140.0
    stripe_w = (wx_hi - wx_lo) / xtiles
    assert abs(stripe_w / 0.5 - round(stripe_w / 0.5)) < 1e-9
    parts = []
    for zi in range(ZTILES):
        for xi in range(xtiles):
            wx = rng.uniform(wx_lo + xi * stripe_w,
                             wx_lo + (xi + 1) * stripe_w, per)
            wy = rng.uniform(-40.0, 40.0, per)
            wz = t[2] + (zi * 500 + rng.uniform(0, 500, per)) * 0.001
            w = np.stack([wx, wy, wz], 1)
            loc = ((w - t) @ rot.astype(np.float64)) / 0.001
            parts.append(np.round(loc).astype(np.int32))
    local = np.concatenate(parts)
    schema = PointSchema.from_attributes(
        [att.POSITION_3D, att.INTENSITY, att.CLASSIFICATION])
    data = {
        "LASLocalPosition": jnp.asarray(local),
        att.INTENSITY.name: jnp.asarray(
            rng.integers(0, 65536, n).astype(np.uint16)),
        att.CLASSIFICATION.name: jnp.asarray(
            rng.integers(0, 32, n).astype(np.uint8)),
    }
    return PointBatch(data, jnp.asarray(n, jnp.int32), schema, {}), rot


def make_run_rot(tiles, rot_np):
    def one(batch, shift):
        scale = jnp.asarray([0.001] * 3, jnp.float32)
        local = batch.data["LASLocalPosition"]
        rot = jnp.asarray(rot_np, jnp.float32)
        t = jnp.asarray([10., -5., 2.], jnp.float32) + shift
        wmin, _ = fused_world_bounds(local, scale, rot, t)
        bmin = jnp.stack([jnp.floor(wmin[0] * 2.0) * 0.5, wmin[1], t[2]])
        coeffs = exact_local_base_coeffs(scale, rot, t, bmin, LEAF,
                                         "floor")
        keys, rword = fused_voxel_head_exact_local(
            local, scale, rot, t, bmin, LEAF, coeffs, semantics="floor")
        data = dict(batch.data)
        del data["LASLocalPosition"]
        b = PointBatch(data, batch.count, batch.schema, batch.meta)
        out = voxel_downsample(
            b, LEAF, bounds=(bmin, None), semantics="floor",
            grid_bits=10, sort_tiles=tiles, precomputed=(keys, rword),
            local_affine=(scale, rot, t, coeffs))
        checksum = out.count
        for col in out.data.values():
            checksum = checksum + chk(col)
        return checksum

    @jax.jit
    def run(b):
        def bf(i, carry):
            return carry + one(b, (carry.astype(jnp.float32) % 7.) * 1e-6)
        return lax.fori_loop(0, K, bf, jnp.asarray(0, jnp.int32))
    return run


def main_rot():
    import bench as B

    @jax.jit
    def overhead(b):
        return chk(b.data["LASLocalPosition"][:, 0])

    b_head = B.make_batch(N)
    t0 = timed(overhead, b_head)
    print(f"overhead {t0*1e3:7.2f} ms", flush=True)
    # current headline (rotated, 1024 z-slabs) for same-process reference
    print("headline-1024 ...", flush=True)
    t = (timed(B.run_pipeline, b_head) - t0) / B.K * 1e3
    print(f"headline-1024  {t:6.2f} ms ({N/(t/1e3)/1e6:.0f} Mpts/s)",
          flush=True)
    for xt in (8, 16):
        batch, rot_np = make_batch_world_stripes(N, xt)
        tiles = ZTILES * xt
        print(f"rot-tiles={tiles} ...", flush=True)
        t = (timed(make_run_rot(tiles, rot_np), batch) - t0) / K * 1e3
        print(f"rot-tiles={tiles:5d}  {t:6.2f} ms  "
              f"({N / (t / 1e3) / 1e6:.0f} Mpts/s)", flush=True)


if __name__ == "__main__" and "--rot" in sys.argv:
    main_rot()
