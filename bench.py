"""Headline benchmark: coordinate-transform + voxel-grid throughput.

Runs the flagship device pipeline (LAS i32 decode -> rigid transform ->
Morton-sorted voxel downsample) on one chip and prints ONE JSON line:
``{"metric": ..., "value": N, "unit": ..., "vs_baseline": N}``.

The headline path is EXACT — no quantization anywhere: each point's i32
LAS local coordinate rides the sort as a 10-bit integer residual of a
per-cell base (one u32 operand instead of three f32), and the voxel
centroid is the affine image of the EXACT local mean (the mean commutes
with the rigid transform; residual sums are exact in f32).  This is
strictly MORE accurate than summing rounded f32 world positions — see
ops/kernels/fused_transform.py and the equivalence/oracle tests in
tests/test_pallas_kernels.py.

Baseline: the driver-set north star of 1 Gpoint/s/chip on TPU v5e
(/root/repo/BASELINE.json; the reference publishes no numbers — BASELINE.md).
``vs_baseline`` is the fraction of that target achieved.

Timing methodology: on the tunneled TPU backend ``block_until_ready`` does
not actually wait for device compute, and a device->host fetch has a fixed
RPC overhead.  The pipeline therefore runs K times *inside one jitted
``lax.fori_loop``* with a data dependence between iterations, ends in a
scalar fetch, and the per-iteration time is the difference quotient between
a K1-iteration and a K2-iteration program — constant overhead cancels.
"""

import json
import sys
import time

if "--cpu-reference" in sys.argv:
    # reference process: force the CPU backend BEFORE any jax use (the
    # sitecustomize hook would otherwise register the TPU backend)
    import jax
    jax.config.update("jax_platforms", "cpu")

import jax
import jax.numpy as jnp
import numpy as np

from pasture_tpu.buffers.device import PointBatch
from pasture_tpu.layout import attributes as att
from pasture_tpu.layout.schema import PointSchema
from pasture_tpu.ops import voxel_downsample
from pasture_tpu.ops.kernels import (fused_voxel_head_exact_local,
                                     fused_world_bounds)
from pasture_tpu.ops.kernels.fused_transform import exact_local_base_coeffs

N = 1 << 22  # 4M points
LEAF = 0.5
TARGET_POINTS_PER_S = 1e9
K = 16  # pipeline iterations inside the single timed program
ZTILES = 1024   # z-slabs (one leaf thick; the 10-bit grid's z capacity)
XTILES = 8      # world-x stripes per slab (voxel-aligned boundaries)
TILES = ZTILES * XTILES  # spatially-disjoint ingest tiles, the shape
#        tiled ingest / Morton partitioning hands the voxelizer
#        (pasture_tpu.parallel.partition); per-tile batched sorts get
#        cheaper as tiles shrink (fewer sorting-network stages) — 8192
#        512-row tiles measured ~10-20% faster than 1024 4096-row ones
#        (benches/tile_probe.py)

_THETA = 0.25
_ROT = np.asarray([[np.cos(_THETA), -np.sin(_THETA), 0.0],
                   [np.sin(_THETA), np.cos(_THETA), 0.0],
                   [0.0, 0.0, 1.0]], np.float32)
_TRANS = np.asarray([10.0, -5.0, 2.0], np.float64)


def make_batch(n: int) -> PointBatch:
    """Random points arranged as TILES spatially-disjoint (z-slab,
    world-x-stripe) tiles — the shape in which streaming ingest and the
    Morton partitioner hand batches to the voxelizer.  Tile boundaries
    are voxel multiples in the OUTPUT frame (the transform rotates about
    z: z-slabs stay axis-aligned, and the x stripes are carved in world
    space, locals being the inverse-affine images) so per-tile
    voxelization equals global voxelization."""
    rng = np.random.default_rng(7)
    per = n // TILES
    wx_lo, wx_hi = 60.0, 140.0    # inner box of the rotated local region
    stripe = (wx_hi - wx_lo) / XTILES
    assert (stripe / LEAF) == round(stripe / LEAF)
    parts = []
    for zi in range(ZTILES):
        for xi in range(XTILES):
            wx = rng.uniform(wx_lo + xi * stripe,
                             wx_lo + (xi + 1) * stripe, per)
            wy = rng.uniform(-40.0, 40.0, per)
            wz = _TRANS[2] + (zi * 500 + rng.uniform(0, 500, per)) * 0.001
            w = np.stack([wx, wy, wz], axis=1)
            loc = ((w - _TRANS) @ _ROT.astype(np.float64)) / 0.001
            parts.append(np.round(loc).astype(np.int32))
    local = np.concatenate(parts)
    intensity = rng.integers(0, 65536, size=n, dtype=np.uint16)
    cls = rng.integers(0, 32, size=n, dtype=np.uint8)
    schema = PointSchema.from_attributes(
        [att.POSITION_3D, att.INTENSITY, att.CLASSIFICATION])
    data = {
        "LASLocalPosition": jnp.asarray(local),
        att.INTENSITY.name: jnp.asarray(intensity),
        att.CLASSIFICATION.name: jnp.asarray(cls),
    }
    return PointBatch(data, jnp.asarray(n, jnp.int32), schema, {})


def pipeline_batch(batch: PointBatch, shift: jnp.ndarray,
                   tiles: int = TILES) -> PointBatch:
    """One EXACT transform+voxelize step, returning the voxel batch."""
    scale = jnp.asarray([0.001, 0.001, 0.001], jnp.float32)
    local = batch.data["LASLocalPosition"]
    rot = jnp.asarray(_ROT)
    t = jnp.asarray([10.0, -5.0, 2.0], jnp.float32) + shift
    # Pallas pipeline head: decode + rigid transform + Morton key + EXACT
    # 10-bit integer local residuals in ONE HBM pass over the i32 locals —
    # world positions are never materialised (centroids are reconstructed
    # as affine(base(cell) + exact local residual mean))
    wmin, _ = fused_world_bounds(local, scale, rot, t)
    # grid anchored at leaf multiples in x (stripe boundaries stay
    # voxel-aligned) and at the z-translation (z-slab boundaries ditto);
    # the y anchor is data-driven as usual
    bmin = jnp.stack([jnp.floor(wmin[0] / LEAF) * LEAF, wmin[1], t[2]])
    coeffs = exact_local_base_coeffs(scale, rot, t, bmin, LEAF, "floor")
    keys, rword = fused_voxel_head_exact_local(
        local, scale, rot, t, bmin, LEAF, coeffs, semantics="floor")
    data = dict(batch.data)
    del data["LASLocalPosition"]
    b = PointBatch(data, batch.count, batch.schema, batch.meta)
    return voxel_downsample(b, LEAF, bounds=(bmin, None), semantics="floor",
                            grid_bits=10, sort_tiles=tiles,
                            precomputed=(keys, rword),
                            local_affine=(scale, rot, t, coeffs))


def pipeline(batch: PointBatch, shift: jnp.ndarray) -> jnp.ndarray:
    """One EXACT transform+voxelize step.  Returns a checksum that depends
    on EVERY output column so XLA cannot dead-code-eliminate any
    reduction."""
    out = pipeline_batch(batch, shift)
    checksum = out.count
    for col in out.data.values():
        checksum = checksum + jnp.sum(col[:16].astype(jnp.float32)
                                      ).astype(jnp.int32)
    return checksum


@jax.jit
def run_pipeline(batch: PointBatch) -> jnp.ndarray:
    def body(i, carry):
        # carry feeds the transform so iterations can't be elided/fused
        shift = (carry.astype(jnp.float32) % 7.0) * 1e-6
        return carry + pipeline(batch, shift)

    return jax.lax.fori_loop(0, K, body, jnp.asarray(0, jnp.int32))


@jax.jit
def run_overhead(batch: PointBatch) -> jnp.ndarray:
    """Near-zero compute with the same dispatch+fetch path — measures the
    constant per-call overhead that the difference cancels."""
    return jnp.sum(batch.data["LASLocalPosition"][:8].astype(jnp.int32))


def timed_fetch(fn, batch, repeats: int = 5) -> float:
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        v = int(fn(batch))  # scalar device->host fetch forces completion
        best = min(best, time.perf_counter() - t0)
        assert v != 0
    return best


N_VERIFY = 1 << 19        # verification shape (full 4M would double compile)
_VERIFY_ROWS = 1 << 15    # output rows compared elementwise


def _verify_arrays() -> dict:
    """Run ONE pipeline step at N_VERIFY on the current backend and fetch
    (count, leading output rows) — the numeric fingerprint compared
    between the device and the CPU reference."""
    batch = make_batch(N_VERIFY)
    out = jax.jit(lambda b: pipeline_batch(b, jnp.float32(0)))(batch)
    arrays = {"count": np.asarray(int(out.count))}
    for name, col in out.data.items():
        arrays[name] = np.asarray(col[:_VERIFY_ROWS])
    return arrays


def verify_device_vs_cpu() -> None:
    """TPU numerics check (round-3 verdict task 4): the device pipeline —
    Mosaic head kernel, tiled sort, fused reduce kernel, compaction —
    must reproduce the CPU/interpret pipeline's values, not merely run.
    Exact for count and integer columns (all integer sums stay below
    2^24, so they are order-independent in f32); positions to f32
    fusion/FMA tolerance.  A wrong-result kernel or collective fails the
    bench here instead of shipping a wrong headline."""
    import os
    import subprocess
    dev = _verify_arrays()
    ref_path = "/tmp/pasture_bench_cpu_ref.npz"
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    subprocess.run([sys.executable, __file__, "--cpu-reference", ref_path],
                   check=True, env=env)
    ref = np.load(ref_path)
    assert int(dev["count"]) == int(ref["count"]), \
        (int(dev["count"]), int(ref["count"]))
    for name in ref.files:
        if name == "count":
            continue
        a, b = dev[name], ref[name]
        if np.issubdtype(a.dtype, np.floating):
            np.testing.assert_allclose(a, b, atol=1e-4, err_msg=name)
        else:
            di = np.abs(a.astype(np.int64) - b.astype(np.int64)).max()
            assert di <= 1, (name, di)  # trunc cast of two f32 roundings
    print(f"verify: device == cpu reference over {int(dev['count'])} "
          f"voxels", file=sys.stderr)


def main() -> None:
    if "--cpu-reference" in sys.argv:
        out_path = sys.argv[sys.argv.index("--cpu-reference") + 1]
        assert jax.default_backend() == "cpu"
        np.savez(out_path, **_verify_arrays())
        return

    verify_device_vs_cpu()
    batch = make_batch(N)
    int(run_overhead(batch))  # compile + first-fetch path setup
    int(run_pipeline(batch))

    t0 = timed_fetch(run_overhead, batch)
    tk = timed_fetch(run_pipeline, batch)
    per_iter = max((tk - t0) / K, 1e-9)

    pps = N / per_iter
    print(json.dumps({
        "metric": "transform_voxelize_throughput",
        "value": round(pps / 1e6, 2),
        "unit": "Mpoints/s/chip",
        "vs_baseline": round(pps / TARGET_POINTS_PER_S, 4),
    }))


if __name__ == "__main__":
    main()
