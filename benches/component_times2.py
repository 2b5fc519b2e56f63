"""Second TPU measurement round for voxel-pipeline redesign.

Questions:
  * does sorting (64, 65536) rows independently beat one flat 4M sort?
  * cost of a 5-operand flat sort (packed cls|intensity secondary key)?
  * cost of staged-shift compaction (LSB-first) vs the compaction sort?
  * is a u64 single-key sort viable?
  * does materializing an (N, 3) array (lane-padded) cost real time?
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

N = 1 << 22
K = 8


def make_data():
    rng = np.random.default_rng(7)
    key = jnp.asarray(rng.integers(0, 1 << 30, size=N, dtype=np.uint32))
    packed = jnp.asarray(rng.integers(0, 1 << 21, size=N, dtype=np.int32))
    cols = [jnp.asarray(rng.random(N, dtype=np.float32)) for _ in range(3)]
    first = jnp.asarray(rng.random(N) < 0.98)  # ~unique voxels, like bench
    return key, packed, cols, first


def timed(fn, *args, repeats=3):
    v = int(fn(*args))
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        v = int(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best


def loop(body_fn):
    @jax.jit
    def run(key, packed, cols, first):
        def body(i, carry):
            return carry + body_fn(key ^ carry.astype(jnp.uint32),
                                   packed, cols, first)
        return lax.fori_loop(0, K, body, jnp.asarray(0, jnp.int32))
    return run


def chk(x):
    return jnp.sum(x[:16].astype(jnp.float32)).astype(jnp.int32)


def staged_shift_compact(cols, keep):
    """LSB-first staged-shift prefix compaction (empirically exact for
    monotone displacements; see tests)."""
    n = keep.shape[0]
    # rank via jump-scan inclusive cumsum of keep
    r = keep.astype(jnp.int32)
    d = 1
    while d < n:
        r = r + jnp.concatenate([jnp.zeros((d,), jnp.int32), r[:-d]])
        d <<= 1
    dist = jnp.where(keep, jnp.arange(n, dtype=jnp.int32) - (r - 1), 0)
    occ = keep
    vals = list(cols)
    s = 1
    k = 0
    while s < n:
        move = occ & (((dist >> k) & 1) == 1)
        inc = jnp.concatenate([move[s:], jnp.zeros((s,), bool)])
        def shift(x, fill=0):
            return jnp.concatenate(
                [x[s:], jnp.full((s,), fill, x.dtype)])
        vals = [jnp.where(inc, shift(v), v) for v in vals]
        dist = jnp.where(inc, shift(dist) - s, dist)
        occ = (occ & ~move) | inc
        s <<= 1
        k += 1
    return vals


def main():
    key, packed, cols, first = make_data()

    progs = {}
    progs["overhead"] = loop(lambda k, p, c, f: chk(k))

    def sort5(k, p, c, f):
        out = lax.sort((k, p) + tuple(c), num_keys=2, is_stable=False)
        return sum(chk(o) for o in out[1:])
    progs["sort_flat_2k3p"] = loop(sort5)

    def sortb1(k, p, c, f):
        kb = k.reshape(64, -1)
        return chk(lax.sort((kb,), dimension=1, num_keys=1,
                            is_stable=False)[0].reshape(-1))
    progs["sort_rows_1key"] = loop(sortb1)

    def sortb5(k, p, c, f):
        ops = (k.reshape(64, -1), p.reshape(64, -1)) + tuple(
            x.reshape(64, -1) for x in c)
        out = lax.sort(ops, dimension=1, num_keys=2, is_stable=False)
        return sum(chk(o.reshape(-1)) for o in out[1:])
    progs["sort_rows_2k3p"] = loop(sortb5)

    def sortu64(k, p, c, f):
        k64 = k.astype(jnp.uint64) << jnp.uint64(21) | p.astype(jnp.uint64)
        out = lax.sort((k64,) + tuple(c), num_keys=1, is_stable=False)
        return sum(chk(o) for o in out[1:])
    progs["sort_u64_1k3p"] = loop(sortu64)

    def compact(k, p, c, f):
        outs = staged_shift_compact(list(c) + [p.astype(jnp.float32)], f)
        return sum(chk(o) for o in outs)
    progs["shift_compact4"] = loop(compact)

    def stack_cost(k, p, c, f):
        m = jnp.stack(c, axis=1)          # (N, 3) materialized?
        m = m * 1.000001
        return chk(m[:, 0]) + chk(m[:, 1]) + chk(m[:, 2])
    progs["stack_n3"] = loop(stack_cost)

    t0 = None
    for name, fn in progs.items():
        t = timed(fn, key, packed, cols, first)
        if name == "overhead":
            t0 = t
            print(f"{name:16s} raw {t*1e3:8.2f} ms", flush=True)
        else:
            per = (t - t0) / K * 1e3
            print(f"{name:16s} per-iter {per:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
