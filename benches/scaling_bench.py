"""Scaling benchmark: sharded transform+voxelize throughput vs mesh size.

Reports points/s at 1, 2, 4, ... devices and the parallel efficiency
relative to 1 device (the north-star "scaling efficiency at 1 chip /
1 host / N hosts" measurement).  On a virtual CPU mesh the ABSOLUTE
numbers are meaningless (tiny shapes, host emulation) — only the
efficiency column and the fact that the sharded program compiles and
runs are informative; run on a real multi-chip slice for real numbers.

Usage:
  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python benches/scaling_bench.py
"""

import json
import os
import sys
import time

sys.path.insert(0, ".")

import jax  # noqa: E402

if os.environ.get("JAX_PLATFORMS", "") == "cpu":
    # env alone is too late here: a sitecustomize hook may have registered
    # a TPU plugin already — force the platform before any computation
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from pasture_tpu.buffers.device import PointBatch  # noqa: E402
from pasture_tpu.layout import attributes as att  # noqa: E402
from pasture_tpu.layout.schema import PointSchema  # noqa: E402
from pasture_tpu.parallel import make_mesh, shard_batch, \
    sharded_voxel_downsample  # noqa: E402

N_PER_DEVICE = 1 << 14


def run(n_devices: int, repeats: int = 3) -> float:
    mesh = make_mesh(n_devices)
    n = N_PER_DEVICE * n_devices
    rng = np.random.default_rng(0)
    schema = PointSchema.from_attributes([att.POSITION_3D, att.INTENSITY])
    data = {
        att.POSITION_3D.name: jnp.asarray(
            rng.uniform(0, 100, (n, 3)).astype(np.float32)),
        att.INTENSITY.name: jnp.asarray(
            rng.integers(0, 65536, n, dtype=np.uint16)),
    }
    batch = shard_batch(
        PointBatch(data, jnp.asarray(n, jnp.int32), schema, {}), mesh)

    out, counts = sharded_voxel_downsample(batch, mesh, 0.5)  # compile
    total = int(np.asarray(out.count))
    assert total > 0

    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        out, counts = sharded_voxel_downsample(batch, mesh, 0.5)
        int(np.asarray(out.count))  # forces completion (host fetch)
        best = min(best, time.perf_counter() - t0)
    return n / best


def main() -> None:
    max_dev = len(jax.devices())
    sizes = [d for d in (1, 2, 4, 8) if d <= max_dev]
    base = None
    for d in sizes:
        pps = run(d)
        if base is None:
            base = pps
        eff = pps / (base * d)
        print(json.dumps({
            "metric": "sharded_voxelize_throughput",
            "devices": d,
            "value": round(pps / 1e6, 3),
            "unit": "Mpoints/s",
            "efficiency_vs_1dev": round(eff, 3),
        }))


if __name__ == "__main__":
    main()
