"""EXACT-path headline bench: transform + voxelize with no approximation.

Same pipeline shape as bench.py (LAS i32 decode -> rigid transform ->
Morton-sorted voxel downsample on TPU) but positions are carried through
the sort as f32 operands and centroids are exact segmented f32 means — no
residual quantization anywhere.  The structural fast paths that do NOT
change results on tiled ingest (per-slab batched sorts, fused Pallas head,
blockwise fused reduce) stay on.

Prints one JSON line like bench.py.  Run on the TPU (default env).
"""

import json
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from pasture_tpu.buffers.device import PointBatch
from pasture_tpu.layout import attributes as att
from pasture_tpu.layout.schema import PointSchema
from pasture_tpu.ops import voxel_downsample
from pasture_tpu.ops.kernels import (fused_decode_transform_key,
                                     fused_world_bounds)

N = 1 << 22
LEAF = 0.5
TARGET_POINTS_PER_S = 1e9
K = 16
TILES = 1024

sys.path.insert(0, "/root/repo")
from bench import make_batch, run_overhead, timed_fetch  # noqa: E402


def pipeline(batch: PointBatch, shift: jnp.ndarray) -> jnp.ndarray:
    scale = jnp.asarray([0.001, 0.001, 0.001], jnp.float32)
    local = batch.data["LASLocalPosition"]
    c, s = 0.9689124, 0.24740396
    rot = jnp.asarray([[c, -s, 0.0], [s, c, 0.0], [0.0, 0.0, 1.0]],
                      jnp.float32)
    t = jnp.asarray([10.0, -5.0, 2.0], jnp.float32) + shift
    wmin, _ = fused_world_bounds(local, scale, rot, t)
    bmin = jnp.stack([wmin[0], wmin[1], t[2]])
    # exact head: world f32 positions + Morton keys in one HBM pass
    world, keys = fused_decode_transform_key(local, scale, rot, t, bmin,
                                             LEAF)
    data = dict(batch.data)
    del data["LASLocalPosition"]
    data[att.POSITION_3D.name] = world
    schema = PointSchema.from_attributes(
        [att.POSITION_3D, att.INTENSITY, att.CLASSIFICATION])
    b = PointBatch(data, batch.count, schema, batch.meta)
    out = voxel_downsample(b, LEAF, bounds=(bmin, None), semantics="floor",
                           grid_bits=10, sort_tiles=TILES,
                           precomputed=(keys, None))
    checksum = out.count
    for col in out.data.values():
        checksum = checksum + jnp.sum(col[:16].astype(jnp.float32)
                                      ).astype(jnp.int32)
    return checksum


@jax.jit
def run_pipeline(batch: PointBatch) -> jnp.ndarray:
    def body(i, carry):
        shift = (carry.astype(jnp.float32) % 7.0) * 1e-6
        return carry + pipeline(batch, shift)

    return jax.lax.fori_loop(0, K, body, jnp.asarray(0, jnp.int32))


def main() -> None:
    batch = make_batch(N)
    int(run_overhead(batch))
    int(run_pipeline(batch))

    t0 = timed_fetch(run_overhead, batch)
    tk = timed_fetch(run_pipeline, batch)
    per_iter = max((tk - t0) / K, 1e-9)

    pps = N / per_iter
    print(json.dumps({
        "metric": "transform_voxelize_exact_throughput",
        "value": round(pps / 1e6, 2),
        "unit": "Mpoints/s/chip",
        "vs_baseline": round(pps / TARGET_POINTS_PER_S, 4),
    }))


if __name__ == "__main__":
    main()
