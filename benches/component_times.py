"""Component-level TPU timing for the transform+voxelize pipeline.

One maintained harness, two modes (the findings of the six round-1
experiment generations live in CLAUDE.md "Environment gotchas"):

* ``--primitives`` — cost of the underlying device primitives (flat sorts
  with varying operand counts, segmented-scan ladders, mode machinery) so
  regressions in XLA codegen show up independent of the pipeline.
* ``--pipeline`` (default) — cumulative-prefix attribution of the ACTUAL
  bench.py pipeline: each program runs the pipeline up to stage k and
  checksums the live intermediates; successive differences attribute the
  full per-iteration time to head+sort / reduce kernel / tile merge.

Methodology (see bench.py): K-iteration ``fori_loop`` with a data
dependence threaded into EVERY timed input (loop-invariant inputs get
hoisted by XLA and the stage times lie), scalar fetch, subtract a
trivial-program baseline.  Run on the real TPU:

    timeout 2400 python benches/component_times.py [--primitives]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

K = 8


def chk(x):
    return jnp.sum(x[:16].astype(jnp.float32)).astype(jnp.int32)


def timed(fn, *args, repeats=3):
    v = int(fn(*args))  # compile + first-fetch path setup
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        v = int(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best


# ---------------------------------------------------------------- primitives

def run_primitives():
    from pasture_tpu.ops.segscan import seg_totals_sum, seg_totals_lexmax2

    N = 1 << 22
    rng = np.random.default_rng(7)
    key = jnp.asarray(rng.integers(0, 1 << 30, size=N, dtype=np.uint32))
    mode = jnp.asarray(rng.integers(0, 32, size=N, dtype=np.int32))
    cols = [jnp.asarray(rng.random(N, dtype=np.float32)) for _ in range(4)]
    first = jnp.asarray(rng.random(N) < 0.02)

    def loop(body_fn):
        @jax.jit
        def run(key, mode, cols, first):
            def body(i, carry):
                return carry + body_fn(key ^ carry.astype(jnp.uint32),
                                       mode, cols, first)
            return lax.fori_loop(0, K, body, jnp.asarray(0, jnp.int32))
        return run

    def main_sort(k, m, c, f):
        out = lax.sort((k, m) + tuple(c), num_keys=2, is_stable=False)
        return sum(chk(o) for o in out[1:])

    def scan5(k, m, c, f):
        outs = seg_totals_sum(list(c) + [jnp.where(f, 1.0, 0.0)], f)
        return sum(chk(o) for o in outs)

    def mode_scan(k, m, c, f):
        runs = f | jnp.concatenate([jnp.ones((1,), bool), m[1:] != m[:-1]])
        run_len = seg_totals_sum(jnp.ones((N,), jnp.int32), runs)
        p, s = seg_totals_lexmax2(jnp.where(runs, run_len, -1),
                                  jnp.where(runs, -m, jnp.iinfo(jnp.int32).min),
                                  f)
        return chk(p) + chk(s)

    progs = {
        "overhead": loop(lambda k, m, c, f: chk(k)),
        "sort_1key": loop(lambda k, m, c, f: chk(
            lax.sort((k,), num_keys=1, is_stable=False)[0])),
        "sort_2k4p": loop(main_sort),
        "segsum_5col": loop(scan5),
        "mode_scans": loop(mode_scan),
    }

    t0 = None
    for name, fn in progs.items():
        t = timed(fn, key, mode, cols, first)
        if name == "overhead":
            t0 = t
            print(f"{name:14s} raw {t*1e3:8.2f} ms", flush=True)
        else:
            print(f"{name:14s} per-iter {(t - t0) / K * 1e3:8.2f} ms",
                  flush=True)


# ------------------------------------------------------------------ pipeline

def run_pipeline_stages():
    import bench as B
    from pasture_tpu.ops.kernels import fused_voxel_head, fused_world_bounds
    from pasture_tpu.ops.kernels.voxel_reduce_kernel import (
        REDUCE_BLOCK, fused_sorted_voxel_reduce)
    from pasture_tpu.ops.compact import _merge_tiles

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
            keys, qword = fused_voxel_head(local, scale, rot, t, bmin,
                                           B.LEAF, qbits=10,
                                           semantics="floor")
            word = ((batch.data["Classification"].astype(jnp.uint32) << 24)
                    | batch.data["Intensity"].astype(jnp.uint32) << 8)
            shaped = tuple(o.reshape(B.TILES, -1)
                           for o in (keys, word, qword))
            srt = lax.sort(shaped, dimension=1, num_keys=2, is_stable=False)
            outs = tuple(o.reshape(-1) for o in srt)
            if upto == 1:
                return sum(chk(o) for o in outs)
            fields = ((8, 16, False, 0, 65535),)
            tile_len = B.N // B.TILES
            streams, cnts = fused_sorted_voxel_reduce(
                outs[0], outs[1], outs[2], bmin.astype(jnp.float32), B.LEAF,
                8, fields, 10, 1.0, tile_len, "floor")
            if upto == 2:
                return sum(chk(o) for o in streams) + chk(cnts)
            blocks = B.N // REDUCE_BLOCK
            mask = jnp.arange(B.N, dtype=jnp.int32) < batch.count
            merged, nv = _merge_tiles(
                [s.reshape(blocks, REDUCE_BLOCK) for s in streams], cnts,
                mask, B.N, REDUCE_BLOCK)
            return sum(chk(o) for o in merged) + nv.astype(jnp.int32)
        return one

    batch = B.make_batch(B.N)

    @jax.jit
    def overhead(b):
        return chk(b.data["LASLocalPosition"][:, 0])
    t0 = timed(overhead, batch)
    print(f"overhead {t0*1e3:7.2f} ms", flush=True)

    for upto, name in ((1, "head+sort"), (2, "+reduce_krn"), (3, "+merge")):
        body = stage(upto)

        @jax.jit
        def run(b, _body=body):
            def bf(i, carry):
                return carry + _body(b, (carry.astype(jnp.float32) % 7.)
                                     * 1e-6)
            return lax.fori_loop(0, K, bf, jnp.asarray(0, jnp.int32))
        t = (timed(run, batch) - t0) / K * 1e3
        print(f"{name:12s} cum {t:7.2f} ms", flush=True)

    t = (timed(B.run_pipeline, batch) - t0) / B.K * 1e3
    print(f"{'full':12s} cum {t:7.2f} ms", flush=True)


def run_exact_stages():
    """Stage attribution for the EXACT path (positions as f32 sort
    operands, exact fused reduce — benches/exact_path_bench.py)."""
    import bench as B
    from pasture_tpu.ops.kernels import (fused_decode_transform_key,
                                         fused_world_bounds)
    from pasture_tpu.ops.kernels.voxel_reduce_kernel import (
        REDUCE_BLOCK, fused_sorted_voxel_reduce)
    from pasture_tpu.ops.compact import _merge_tiles

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
            world, keys = fused_decode_transform_key(local, scale, rot, t,
                                                     bmin, B.LEAF)
            if upto == 0:
                return chk(keys) + chk(world[:, 0])
            word = ((batch.data["Classification"].astype(jnp.uint32) << 24)
                    | batch.data["Intensity"].astype(jnp.uint32) << 8)
            shaped = tuple(o.reshape(B.TILES, -1) for o in
                           (keys, word, world[:, 0], world[:, 1],
                            world[:, 2]))
            srt = lax.sort(shaped, dimension=1, num_keys=2, is_stable=False)
            outs = tuple(o.reshape(-1) for o in srt)
            if upto == 1:
                return sum(chk(o) for o in outs)
            fields = ((8, 16, False, 0, 65535),)
            tile_len = B.N // B.TILES
            streams, cnts = fused_sorted_voxel_reduce(
                outs[0], outs[1], None, bmin.astype(jnp.float32), B.LEAF,
                8, fields, 0, 1.0, tile_len, "floor",
                spos=(outs[2], outs[3], outs[4]))
            if upto == 2:
                return sum(chk(o) for o in streams) + chk(cnts)
            blocks = B.N // REDUCE_BLOCK
            mask = jnp.arange(B.N, dtype=jnp.int32) < batch.count
            merged, nv = _merge_tiles(
                [s.reshape(blocks, REDUCE_BLOCK) for s in streams], cnts,
                mask, B.N, REDUCE_BLOCK)
            return sum(chk(o) for o in merged) + nv.astype(jnp.int32)
        return one

    batch = B.make_batch(B.N)

    @jax.jit
    def overhead(b):
        return chk(b.data["LASLocalPosition"][:, 0])
    t0 = timed(overhead, batch)
    print(f"overhead {t0*1e3:7.2f} ms", flush=True)

    for upto, name in ((0, "head"), (1, "+sort5op"), (2, "+reduce_krn"),
                       (3, "+merge")):
        body = stage(upto)

        @jax.jit
        def run(b, _body=body):
            def bf(i, carry):
                return carry + _body(b, (carry.astype(jnp.float32) % 7.)
                                     * 1e-6)
            return lax.fori_loop(0, K, bf, jnp.asarray(0, jnp.int32))
        t = (timed(run, batch) - t0) / K * 1e3
        print(f"{name:12s} cum {t:7.2f} ms", flush=True)


if __name__ == "__main__":
    if "--primitives" in sys.argv:
        run_primitives()
    elif "--exact" in sys.argv:
        run_exact_stages()
    else:
        run_pipeline_stages()
