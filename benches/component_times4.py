TILES_COMPACT = 1

"""Cumulative-prefix timing of the CURRENT bench pipeline (tiled sort +
quantized residuals + adaptive ladders + tiled compaction)."""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
from jax import lax

import bench as B
from pasture_tpu.buffers.device import PointBatch
from pasture_tpu.layout import attributes as att
from pasture_tpu.ops import (affine_transform, batch_bounds,
                             decode_las_positions)
from pasture_tpu.ops import voxel as V
from pasture_tpu.ops.compact import compact_columns, pack_int_columns
from pasture_tpu.ops.segscan import seg_totals_sum, seg_totals_max

K = 8


def chk(x):
    return jnp.sum(x[:16].astype(jnp.float32)).astype(jnp.int32)


def stage_fn(upto):
    def run_once(batch, shift):
        scale = jnp.asarray([0.001] * 3, jnp.float32)
        pos = decode_las_positions(batch.data["LASLocalPosition"], scale,
                                   jnp.zeros(3, jnp.float32))
        c, s = 0.9689124, 0.24740396
        rot = jnp.asarray([[c, -s, 0.], [s, c, 0.], [0., 0., 1.]],
                          jnp.float32)
        t = jnp.asarray([10., -5., 2.], jnp.float32) + shift
        pos = affine_transform(pos, rot, t)
        mask = jnp.ones((B.N,), bool)
        bxy, _ = batch_bounds(pos, mask)
        bmin = jnp.stack([bxy[0], bxy[1], t[2]])
        cells = V.voxel_indices(pos, mask, B.LEAF, bmin, "floor", 10)
        key = V._keys(cells, mask, 10)[0]
        leaf = jnp.asarray(B.LEAF, jnp.float32)
        u = (pos - bmin[None, :]) / leaf
        r = u - cells.astype(jnp.float32)
        qv = jnp.clip(jnp.floor(r * 1024.), 0, 1023).astype(jnp.uint32)
        qword = (qv[:, 0] << 20) | (qv[:, 1] << 10) | qv[:, 2]
        word = ((batch.data[att.CLASSIFICATION.name].astype(jnp.uint32) << 24)
                | batch.data[att.INTENSITY.name].astype(jnp.uint32))
        if upto == 0:
            return chk(key) + chk(qword) + chk(word)
        tiles = B.TILES
        shaped = tuple(o.reshape(tiles, -1) for o in (key, word, qword))
        srt = lax.sort(shaped, dimension=1, num_keys=2, is_stable=False)
        skey, sword, sq = (o.reshape(-1) for o in srt)
        if upto == 1:
            return chk(skey) + chk(sword) + chk(sq)
        n = B.N
        tile_start = (jnp.arange(n, dtype=jnp.int32) % (n // tiles)) == 0
        first = jnp.concatenate([jnp.ones((1,), bool),
                                 skey[1:] != skey[:-1]]) | tile_start
        qm = jnp.uint32(1023)
        cols = [((sq >> jnp.uint32(sh)) & qm).astype(jnp.float32)
                for sh in (20, 10, 0)]
        cols.append((sword & 0xFFFFFF).astype(jnp.float32))
        cols.append(jnp.ones((n,), jnp.float32))
        sums = seg_totals_sum(cols, first)
        cnt = jnp.maximum(sums[-1], 1.)
        means = [x / cnt for x in sums[:-1]]
        if upto == 2:
            return sum(chk(m) for m in means)
        sv = (sword >> 24).astype(jnp.int32)
        run_new = first | jnp.concatenate([jnp.ones((1,), bool),
                                           sv[1:] != sv[:-1]])
        run_len = seg_totals_sum(jnp.ones((n,), jnp.int32), run_new)
        packed = jnp.where(run_new, (run_len << 8) | (255 - sv), -1)
        best = seg_totals_max(packed, first)
        mode = (255 - (best & 255)).astype(jnp.float32)
        if upto == 3:
            return sum(chk(m) for m in means) + chk(mode)
        outs, nvox = compact_columns(means + [mode], first,
                                     tiles=TILES_COMPACT)
        return sum(chk(o) for o in outs) + nvox
    return run_once


def timed(fn, *args, repeats=3):
    v = int(fn(*args))
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        v = int(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    batch = B.make_batch(B.N)
    names = ["keys+quant", "+tiled_sort", "+mean_scans", "+mode",
             "+compact"]

    @jax.jit
    def overhead(b):
        return chk(b.data["LASLocalPosition"][:, 0])
    t0 = timed(overhead, batch)
    print(f"overhead raw {t0*1e3:8.2f} ms", flush=True)

    prev = 0.0
    for upto, name in enumerate(names):
        body = stage_fn(upto)

        @jax.jit
        def run(b, _body=body):
            def bf(i, carry):
                return carry + _body(b, (carry.astype(jnp.float32) % 7.)
                                     * 1e-6)
            return lax.fori_loop(0, K, bf, jnp.asarray(0, jnp.int32))

        t = (timed(run, batch) - t0) / K * 1e3
        print(f"{name:12s} cum {t:8.2f} ms   (+{t - prev:6.2f})", flush=True)
        prev = t


if __name__ == "__main__":
    main()
