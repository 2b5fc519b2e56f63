"""Headline benchmark: coordinate-transform + voxel-grid throughput.

Runs the flagship device pipeline (LAS i32 decode -> rigid transform ->
Morton-sorted voxel downsample) on one chip and prints ONE JSON line:
``{"metric": ..., "value": N, "unit": ..., "vs_baseline": N}``.

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
import time

import jax
import jax.numpy as jnp
import numpy as np

from pasture_tpu.buffers.device import PointBatch
from pasture_tpu.layout import attributes as att
from pasture_tpu.layout.schema import PointSchema
from pasture_tpu.ops import voxel_downsample
from pasture_tpu.ops.kernels import fused_voxel_head, fused_world_bounds

N = 1 << 22  # 4M points
LEAF = 0.5
TARGET_POINTS_PER_S = 1e9
K = 16  # pipeline iterations inside the single timed program
TILES = 1024  # spatially-disjoint z-slabs, as tiled ingest / Morton
#             partitioning delivers them (pasture_tpu.parallel.partition);
#             batched per-tile sorts are ~35% cheaper than one flat sort


def make_batch(n: int) -> PointBatch:
    """Random points arranged as TILES spatially-disjoint z-slabs (the
    shape in which streaming ingest and the Morton partitioner hand
    batches to the voxelizer).  Slab boundaries are multiples of LEAF in
    world space so per-tile voxelization equals global voxelization."""
    rng = np.random.default_rng(7)
    per = n // TILES
    # slab width: multiple of LEAF/scale = 500 locals (>= one leaf)
    slab = max(500, 200_000 // TILES // 500 * 500)
    # slabs along z: the pipeline's rigid transform rotates about z, so
    # z-slabs stay axis-aligned and voxel-disjoint in the output frame
    zs = [rng.integers(i * slab, (i + 1) * slab, size=per, dtype=np.int32)
          for i in range(TILES)]
    local = np.stack([
        rng.integers(0, 200_000, size=n, dtype=np.int32),
        rng.integers(0, 200_000, size=n, dtype=np.int32),
        np.concatenate(zs)], axis=1)
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


def pipeline(batch: PointBatch, shift: jnp.ndarray) -> jnp.ndarray:
    """One transform+voxelize step.  Returns a checksum that depends on
    EVERY output column so XLA cannot dead-code-eliminate any reduction."""
    scale = jnp.asarray([0.001, 0.001, 0.001], jnp.float32)
    local = batch.data["LASLocalPosition"]
    c, s = 0.9689124, 0.24740396  # cos/sin 0.25 rad
    rot = jnp.asarray([[c, -s, 0.0], [s, c, 0.0], [0.0, 0.0, 1.0]], jnp.float32)
    t = jnp.asarray([10.0, -5.0, 2.0], jnp.float32) + shift
    # Pallas pipeline head: decode + rigid transform + Morton key +
    # quantized in-cell residuals in ONE HBM pass over the i32 locals —
    # world positions are never materialised (centroids are reconstructed
    # from key + mean residual inside voxel_downsample).
    wmin, _ = fused_world_bounds(local, scale, rot, t)
    # grid anchored exactly at the z-translation so the z-slab tile
    # boundaries stay voxel-aligned (x/y anchor is data-driven as usual)
    bmin = jnp.stack([wmin[0], wmin[1], t[2]])
    keys, qword = fused_voxel_head(local, scale, rot, t, bmin, LEAF,
                                   qbits=10, semantics="floor")
    data = dict(batch.data)
    del data["LASLocalPosition"]
    b = PointBatch(data, batch.count, batch.schema, batch.meta)
    # quantized-residual fast path (documented error bound LEAF/1024 per
    # axis ~ 0.5mm, far below sensor noise; ops/voxel.py) + per-tile
    # batched sorts over the TILES disjoint ingest slabs
    out = voxel_downsample(b, LEAF, bounds=(bmin, None), semantics="floor",
                           grid_bits=10, position_quantization_bits=10,
                           sort_tiles=TILES, precomputed=(keys, qword))
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


def main() -> None:
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
