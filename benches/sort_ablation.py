"""Sort-operand packing ablation for the voxel pipeline (TPU).

Question: does the tiled `lax.sort` cost scale with the NUMBER of
operands (per-operand permute-network overhead) or with total BYTES
moved?  If per-operand, packing two u32 streams into one u64 operand
roughly halves the sort's payload cost and the EXACT voxel path can
shed 2 of its 5 operands losslessly:

* key<<32|word  -> ONE u64 sort key with identical lexicographic order
* bitcast(x)<<32|bitcast(y) -> ONE u64 payload operand (bit-exact f32s)

Variants (all (TILES, N/TILES)-batched like the pipeline):

  s5_u32    key,word | x,y,z f32      — current EXACT sort
  s4_xy64   key,word | xy u64, z      — pack positions only
  s3_kw64   kw u64   | xy u64, z      — pack keys too
  s3_quant  key,word | qword          — current QUANTIZED sort
  s2_kw64q  kw u64   | qword          — quantized, packed keys
  s1        key                        — single-key floor
  s2_kw64   kw u64                     — u64 single-key floor

Methodology: bench.py style — K iterations inside one jitted fori_loop,
carry XORed into the key operand (sort has a varying input so no stage
can be hoisted), scalar fetch, subtract the trivial-program baseline.

Run:  timeout 5400 /opt/venv/bin/python benches/sort_ablation.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

if "--pallas512" not in sys.argv:
    # u64 operands (script-local); the pallas512 mode keeps x64 OFF —
    # its kernels need no u64 and x64 trips a jax lowering-cache bug
    # (KeyError in _lower_jaxpr_to_fun_cached) for pallas inside fori_loop
    jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np
from jax import lax

N = 1 << 22
TILES = 1024
K = 8


def chk(x):
    return jnp.sum(x[:16].astype(jnp.float32)).astype(jnp.int32)


def timed(fn, *args, repeats=3):
    t_compile0 = time.perf_counter()
    int(fn(*args))
    print(f"  (compile+first {time.perf_counter()-t_compile0:.0f}s)",
          flush=True)
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        int(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    rng = np.random.default_rng(7)
    key = jnp.asarray(rng.integers(0, 1 << 30, size=N, dtype=np.uint32))
    word = jnp.asarray(rng.integers(0, 1 << 32, size=N, dtype=np.uint64)
                       .astype(np.uint32))
    qword = jnp.asarray(rng.integers(0, 1 << 30, size=N, dtype=np.uint32))
    x, y, z = (jnp.asarray(rng.random(N, dtype=np.float32))
               for _ in range(3))

    def tiled(ops, nk, tiles=TILES):
        shaped = tuple(o.reshape(tiles, -1) for o in ops)
        out = lax.sort(shaped, dimension=1, num_keys=nk, is_stable=False)
        return sum(chk(o.reshape(-1)) for o in out)

    def pallas_tiled(ops, nk, tile_len):
        from pasture_tpu.ops.kernels.tile_sort_kernel import tile_sort_pallas
        out = tile_sort_pallas(tuple(ops), tile_len, num_keys=nk)
        return sum(chk(o) for o in out)

    def loop(body_fn):
        @jax.jit
        def run(key, word, qword, x, y, z):
            def body(i, carry):
                k = key ^ carry.astype(jnp.uint32)
                return carry + body_fn(k, word, qword, x, y, z)
            return lax.fori_loop(0, K, body, jnp.asarray(0, jnp.int32))
        return run

    def kw64(k, w):
        return (k.astype(jnp.uint64) << 32) | w.astype(jnp.uint64)

    def xy64(a, b):
        au = lax.bitcast_convert_type(a, jnp.uint32).astype(jnp.uint64)
        bu = lax.bitcast_convert_type(b, jnp.uint32).astype(jnp.uint64)
        return (au << 32) | bu

    progs = [
        ("overhead", loop(lambda k, w, q, x, y, z: chk(k))),
        ("s5_u32", loop(lambda k, w, q, x, y, z:
                        tiled((k, w, x, y, z), 2))),
        ("s3_kw64", loop(lambda k, w, q, x, y, z:
                         tiled((kw64(k, w), xy64(x, y), z), 1))),
        ("s4_xy64", loop(lambda k, w, q, x, y, z:
                         tiled((k, w, xy64(x, y), z), 2))),
        ("s2_kw64q", loop(lambda k, w, q, x, y, z:
                          tiled((kw64(k, w), q), 1))),
        ("s3_quant", loop(lambda k, w, q, x, y, z:
                          tiled((k, w, q), 2))),
        ("s1", loop(lambda k, w, q, x, y, z: tiled((k,), 1))),
        ("s2_kw64", loop(lambda k, w, q, x, y, z:
                         tiled((kw64(k, w),), 1))),
    ]

    t0 = None
    for name, fn in progs:
        print(f"{name} ...", flush=True)
        t = timed(fn, key, word, qword, x, y, z)
        if name == "overhead":
            t0 = t
            print(f"{name:9s} raw {t*1e3:8.2f} ms", flush=True)
        else:
            print(f"{name:9s} per-iter {(t - t0) / K * 1e3:8.2f} ms",
                  flush=True)


def main_pallas512():
    """Headline shape (8192 tiles x 512): XLA's sort network vs the
    Pallas VMEM-resident bitonic (kernels/tile_sort_kernel.py) on the
    exact-local 3-operand sort — round-4 verdict task 3.  The checksum
    touches the head of EVERY tile so XLA cannot slice the sort down to
    the first tile (which dead-code-eliminates 8191/8192 of the work and
    times as negative)."""
    rng = np.random.default_rng(7)
    key = jnp.asarray(rng.integers(0, 1 << 30, size=N, dtype=np.uint32))
    word = jnp.asarray(rng.integers(0, 1 << 31, size=N, dtype=np.uint32))
    qword = jnp.asarray(rng.integers(0, 1 << 30, size=N, dtype=np.uint32))
    tiles, tl = 8192, 512

    def chk_tiles(streams):
        return sum(
            jnp.sum(o.reshape(tiles, tl)[:, :2].astype(jnp.uint32)
                    ).astype(jnp.int32) for o in streams)

    def xla(k, w, q):
        shaped = tuple(o.reshape(tiles, tl) for o in (k, w, q))
        out = lax.sort(shaped, dimension=1, num_keys=2, is_stable=False)
        return chk_tiles(tuple(o.reshape(-1) for o in out))

    def pallas(k, w, q):
        from pasture_tpu.ops.kernels.tile_sort_kernel import (
            tile_sort_pallas)
        return chk_tiles(tile_sort_pallas((k, w, q), tl, num_keys=2))

    def loop(body_fn):
        @jax.jit
        def run(key, word, qword):
            def body(i, carry):
                k = key ^ carry.astype(jnp.uint32)
                return carry + body_fn(k, word, qword)
            return lax.fori_loop(0, K, body, jnp.asarray(0, jnp.int32))
        return run

    progs = [("overhead", loop(lambda k, w, q: chk_tiles((k,)))),
             ("s3_xla512", loop(xla)),
             ("s3_pal512", loop(pallas))]
    t0 = None
    for name, fn in progs:
        print(f"{name} ...", flush=True)
        t = timed(fn, key, word, qword)
        if name == "overhead":
            t0 = t
            print(f"{name:9s} raw {t*1e3:8.2f} ms", flush=True)
        else:
            print(f"{name:9s} per-iter {(t - t0) / K * 1e3:8.2f} ms",
                  flush=True)


if __name__ == "__main__":
    if "--pallas512" in sys.argv:
        main_pallas512()
    else:
        main()
