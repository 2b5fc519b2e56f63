"""A/B the reduce-kernel block size and tile-merge unroll on the TPU.

Round-5 stage split (benches/component_times.py): head+sort 0.90 ms,
blockwise reduce 1.77 ms, tile merge 0.77 ms of 3.60 ms total — the
post-sort stages now dominate.  Two structural knobs:

* ``rows`` — kernel block rows (_BLOCK_ROWS; 512 = 64K-element blocks,
  64 merge steps at 4M; 1024 halves the merge step count at the cost of
  one extra compaction-ladder stage per block);
* ``unroll`` — tiles merged per sequential fori_loop step in
  ops/compact._merge_tiles (8 = round-4 choice; the loop is
  dispatch-overhead-bound, so deeper unrolls may amortize further).

Each variant re-times the FULL bench.py pipeline (K iterations in one
fori_loop, scalar fetch, overhead-subtracted).

Run:  timeout 5400 /opt/venv/bin/python benches/reduce_block_probe.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
from jax import lax

import bench as B
from pasture_tpu.ops import compact as C
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

    variants = [(512, None), (512, 16), (512, 64), (1024, None),
                (1024, 16), (512, None)]
    for rows, unroll in variants:
        VRK._BLOCK_ROWS = rows
        VRK.REDUCE_BLOCK = rows * 128
        C._MERGE_UNROLL = unroll
        jax.clear_caches()

        @jax.jit
        def run(b):
            def bf(i, carry):
                shift = (carry.astype(jnp.float32) % 7.0) * 1e-6
                return carry + B.pipeline(b, shift)
            return lax.fori_loop(0, K, bf, jnp.asarray(0, jnp.int32))

        print(f"rows={rows} unroll={unroll} ...", flush=True)
        t = (timed(run, batch) - t0) / K * 1e3
        print(f"rows={rows} unroll={unroll}  {t:6.2f} ms  "
              f"({B.N / (t / 1e3) / 1e6:.0f} Mpts/s)", flush=True)
    VRK._BLOCK_ROWS = 512
    VRK.REDUCE_BLOCK = 512 * 128
    C._MERGE_UNROLL = None


if __name__ == "__main__":
    main()
