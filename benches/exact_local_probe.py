"""Quick TPU probe of the EXACT-LOCAL voxel pipeline (3-operand sort,
integer residuals): per-iteration time + projected Mpts/s, plus stage
splits.  bench.py-style methodology.

Run:  timeout 5400 /opt/venv/bin/python benches/exact_local_probe.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

import bench as B
from pasture_tpu.buffers.device import PointBatch
from pasture_tpu.layout import attributes as att
from pasture_tpu.ops import voxel_downsample
from pasture_tpu.ops.kernels import (fused_voxel_head_exact_local,
                                     fused_world_bounds)
from pasture_tpu.ops.kernels.fused_transform import exact_local_base_coeffs

K = 8


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


def stage(upto):
    def one(batch, shift):
        scale = jnp.asarray([0.001] * 3, jnp.float32)
        local = batch.data["LASLocalPosition"]
        c, s = 0.9689124, 0.24740396
        rot = jnp.asarray([[c, -s, 0.], [s, c, 0.], [0., 0., 1.]],
                          jnp.float32)
        t = jnp.asarray([10., -5., 2.], jnp.float32) + shift
        wmin, _ = fused_world_bounds(local, scale, rot, t)
        bmin = jnp.stack([wmin[0], wmin[1], t[2]])
        coeffs = exact_local_base_coeffs(scale, rot, t, bmin, B.LEAF,
                                         "floor")
        keys, rword = fused_voxel_head_exact_local(
            local, scale, rot, t, bmin, B.LEAF, coeffs, semantics="floor")
        if upto == 0:
            return chk(keys) + chk(rword)
        data = dict(batch.data)
        del data["LASLocalPosition"]
        b = PointBatch(data, batch.count, batch.schema, batch.meta)
        out = voxel_downsample(
            b, B.LEAF, bounds=(bmin, None), semantics="floor",
            grid_bits=10, sort_tiles=B.TILES, precomputed=(keys, rword),
            local_affine=(scale, rot, t, coeffs))
        checksum = out.count
        for col in out.data.values():
            checksum = checksum + chk(col)
        return checksum
    return one


def main():
    batch = B.make_batch(B.N)

    @jax.jit
    def overhead(b):
        return chk(b.data["LASLocalPosition"][:, 0])
    t0 = timed(overhead, batch)
    print(f"overhead {t0*1e3:7.2f} ms", flush=True)

    for upto, name in ((0, "head"), (1, "full")):
        body = stage(upto)

        @jax.jit
        def run(b, _body=body):
            def bf(i, carry):
                return carry + _body(b, (carry.astype(jnp.float32) % 7.)
                                     * 1e-6)
            return lax.fori_loop(0, K, bf, jnp.asarray(0, jnp.int32))
        print(f"{name} ...", flush=True)
        t = (timed(run, batch) - t0) / K * 1e3
        print(f"{name:12s} cum {t:7.2f} ms  "
              f"({B.N / (t / 1e3) / 1e6:.0f} Mpts/s)", flush=True)


if __name__ == "__main__":
    main()
