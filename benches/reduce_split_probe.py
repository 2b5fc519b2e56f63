"""A/B the reduce-kernel tiered-ladder static splits on the TPU.

The xprof trace (artifacts/xprof_bench_r3) shows the blockwise reduce is
now the headline's dominant stage (~1.8 ms of ~3.7); its ladders run
``split`` static stages unconditionally.  Sweep (_SEG_SPLIT,
_COMPACT_SPLIT) on the real bench pipeline.

Run:  timeout 5400 /opt/venv/bin/python benches/reduce_split_probe.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
from jax import lax

import bench as B
from pasture_tpu.ops.kernels import voxel_reduce_kernel as VRK

K = 8


def timed(fn, *args, repeats=6):
    t0 = time.perf_counter()
    int(fn(*args))
    print(f"  (compile+first {time.perf_counter()-t0:.0f}s)", flush=True)
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        int(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    batch = B.make_batch(B.N)

    @jax.jit
    def overhead(b):
        return jnp.sum(b.data["LASLocalPosition"][:8].astype(jnp.int32))
    t0 = timed(overhead, batch)
    print(f"overhead {t0*1e3:7.2f} ms", flush=True)

    for seg, comp in ((4, 10), (2, 6), (4, 6), (2, 6), (4, 10)):
        VRK._SEG_SPLIT = seg
        VRK._COMPACT_SPLIT = comp
        jax.clear_caches()

        @jax.jit
        def run(b):
            def bf(i, carry):
                shift = (carry.astype(jnp.float32) % 7.0) * 1e-6
                return carry + B.pipeline(b, shift)
            return lax.fori_loop(0, K, bf, jnp.asarray(0, jnp.int32))

        print(f"seg={seg} comp={comp} ...", flush=True)
        t = (timed(run, batch) - t0) / K * 1e3
        print(f"seg={seg} comp={comp:2d}  {t:6.2f} ms  "
              f"({B.N / (t / 1e3) / 1e6:.0f} Mpts/s)", flush=True)
    VRK._SEG_SPLIT, VRK._COMPACT_SPLIT = 4, 10


if __name__ == "__main__":
    main()
