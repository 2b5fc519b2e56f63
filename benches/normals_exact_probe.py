"""Pass-1 merge A/B for the EXACT normals path (TPU).

Round-5 finding (trace: artifacts/xprof_normals_r5): XLA's TopK custom
call cost ~1 ms per (1024, 8192) block visit — ~80% of the whole exact
run.  The default merge is now the k-register/butterfly scheme
(algorithms/normals.py pass1_merge="registers", bit-identical
thresholds); measured per 256k-query x 1M-target slice on v5e:

  registers   0.92 s        (the default)
  topk        2.94 s        (--topk re-times the old formulation)

Run on the real TPU:

    timeout 5400 python benches/normals_exact_probe.py [--topk]
        [--queries 262144] [--trace DIR]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

N = 1 << 20
K = 12


def make_cloud(n):
    rng = np.random.default_rng(3)
    xy = rng.uniform(-100, 100, (n, 2)).astype(np.float32)
    z = (0.4 * np.sin(xy[:, 0] * 0.7)
         + 0.3 * np.cos(xy[:, 1] * 0.5)).astype(np.float32)
    return jnp.asarray(np.stack([xy[:, 0], xy[:, 1], z], axis=1))


def main():
    from functools import partial

    from pasture_tpu.algorithms.normals import _normals_scan_exact

    queries = 1 << 18
    if "--queries" in sys.argv:
        queries = int(sys.argv[sys.argv.index("--queries") + 1])
    pos = make_cloud(N)
    valid = jnp.ones((N,), bool)
    q = pos[:queries]

    fn = jax.jit(_normals_scan_exact, static_argnums=(2,))
    fn_topk = jax.jit(partial(_normals_scan_exact, pass1_merge="topk"),
                      static_argnums=(2,))

    def timed(label, f):
        t0 = time.perf_counter()
        out = f()
        s = float(jnp.sum(out[0][:64]) + jnp.sum(out[1][:64]))
        compile_s = time.perf_counter() - t0
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            out = f()
            s = float(jnp.sum(out[0][:64]) + jnp.sum(out[1][:64]))
            best = min(best, time.perf_counter() - t0)
        print(json.dumps({"variant": label, "seconds": round(best, 2),
                          "compile_s": round(compile_s, 1),
                          "checksum": s, "queries": queries, "n": N,
                          "k": K}), flush=True)
        return best

    full = timed("registers", lambda: fn(pos, valid, K, queries=q))
    if "--topk" in sys.argv:
        timed("topk", lambda: fn_topk(pos, valid, K, queries=q))

    if "--trace" in sys.argv:
        tdir = sys.argv[sys.argv.index("--trace") + 1]
        from pasture_tpu.utils.profiling import trace
        with trace(tdir):
            out = fn(pos, valid, K, queries=q)
            float(jnp.sum(out[0][:64]))
        print("trace written to", tdir, flush=True)


if __name__ == "__main__":
    main()
