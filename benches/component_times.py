"""Component-level TPU timing for the transform+voxelize pipeline.

Uses the bench.py difference-quotient methodology (K-iteration fori_loop
with a data dependence, scalar fetch, subtract trivial-program baseline)
to attribute the ~40ms pipeline time to sorts vs segmented scans vs the
elementwise transform.  Run on the real TPU:

    timeout 2400 python benches/component_times.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from pasture_tpu.ops.segscan import seg_totals_sum, seg_totals_lexmax2

N = 1 << 22
K = 8


def make_data():
    rng = np.random.default_rng(7)
    key = jnp.asarray(rng.integers(0, 1 << 30, size=N, dtype=np.uint32))
    mode = jnp.asarray(rng.integers(0, 32, size=N, dtype=np.int32))
    cols = [jnp.asarray(rng.random(N, dtype=np.float32)) for _ in range(4)]
    first = jnp.asarray(rng.random(N) < 0.02)
    return key, mode, cols, first


def timed(fn, *args, repeats=3):
    v = int(fn(*args))  # compile
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        v = int(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best


def loop(body_fn):
    @jax.jit
    def run(key, mode, cols, first):
        def body(i, carry):
            return carry + body_fn(key ^ carry.astype(jnp.uint32),
                                   mode, cols, first)
        return lax.fori_loop(0, K, body, jnp.asarray(0, jnp.int32))
    return run


def chk(x):
    return jnp.sum(x[:16].astype(jnp.float32)).astype(jnp.int32)


def main():
    key, mode, cols, first = make_data()

    progs = {}

    # trivial baseline
    progs["overhead"] = loop(lambda k, m, c, f: chk(k))

    # sort: 1 key alone
    progs["sort_1key"] = loop(
        lambda k, m, c, f: chk(lax.sort((k,), num_keys=1, is_stable=False)[0]))

    # sort: key + mode key + 4 payloads (main sort shape)
    def main_sort(k, m, c, f):
        out = lax.sort((k, m) + tuple(c), num_keys=2, is_stable=False)
        return sum(chk(o) for o in out[1:])
    progs["sort_2k4p"] = loop(main_sort)

    # segmented sum over 5 columns (mean reductions + counts)
    def scan5(k, m, c, f):
        outs = seg_totals_sum(list(c) + [jnp.where(f, 1.0, 0.0)], f)
        return sum(chk(o) for o in outs)
    progs["segsum_5col"] = loop(scan5)

    # mode machinery: run-length sum + lexmax2
    def mode_scan(k, m, c, f):
        runs = f | jnp.concatenate([jnp.ones((1,), bool), m[1:] != m[:-1]])
        run_len = seg_totals_sum(jnp.ones((N,), jnp.int32), runs)
        p, s = seg_totals_lexmax2(jnp.where(runs, run_len, -1),
                                  jnp.where(runs, -m, jnp.iinfo(jnp.int32).min),
                                  f)
        return chk(p) + chk(s)
    progs["mode_scans"] = loop(mode_scan)

    t0 = None
    for name, fn in progs.items():
        t = timed(fn, key, mode, cols, first)
        if name == "overhead":
            t0 = t
            print(f"{name:14s} raw {t*1e3:8.2f} ms", flush=True)
        else:
            per = (t - t0) / K * 1e3
            print(f"{name:14s} per-iter {per:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
