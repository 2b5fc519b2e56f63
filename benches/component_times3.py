"""Cumulative-prefix timing of the ACTUAL bench pipeline stages.

Each program runs the pipeline up to stage k and checksums the live
intermediates; successive differences attribute the full 33ms.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from pasture_tpu.layout import attributes as att
from pasture_tpu.ops import affine_transform, decode_las_positions
from pasture_tpu.ops.reductions import batch_bounds
from pasture_tpu.ops.voxel import voxel_indices, _keys, _INVALID_KEY
from pasture_tpu.ops.segscan import seg_totals_sum, seg_totals_lexmax2
from pasture_tpu.ops.compact import compact_columns

N = 1 << 22
K = 8
LEAF = 0.5


def make_data():
    rng = np.random.default_rng(7)
    local = jnp.asarray(rng.integers(0, 200_000, size=(N, 3), dtype=np.int32))
    intensity = jnp.asarray(rng.integers(0, 65536, size=N, dtype=np.uint16))
    cls = jnp.asarray(rng.integers(0, 32, size=N, dtype=np.uint8))
    return local, intensity, cls


def chk(x):
    return jnp.sum(x[:16].astype(jnp.float32)).astype(jnp.int32)


def stage_fn(upto):
    def run_once(local, intensity, cls, shift):
        scale = jnp.asarray([0.001] * 3, jnp.float32)
        offset = jnp.zeros(3, jnp.float32)
        pos = decode_las_positions(local, scale, offset)
        c, s = 0.9689124, 0.24740396
        rot = jnp.asarray([[c, -s, 0.], [s, c, 0.], [0., 0., 1.]], jnp.float32)
        pos = affine_transform(pos, rot,
                               jnp.asarray([10., -5., 2.], jnp.float32) + shift)
        if upto == 0:   # transform only
            return chk(pos[:, 0]) + chk(pos[:, 1]) + chk(pos[:, 2])
        mask = jnp.ones((N,), bool)
        bmin, _ = batch_bounds(pos, mask)
        cells = voxel_indices(pos, mask, LEAF, bmin, "floor", grid_bits=10)
        key = _keys(cells, mask, 10)[0]
        if upto == 1:   # + bounds + keys
            return chk(key)
        word = (cls.astype(jnp.uint32) << 24) | intensity.astype(jnp.uint32)
        srt = lax.sort((key, word, pos[:, 0], pos[:, 1], pos[:, 2]),
                       num_keys=2, is_stable=False)
        skey, sword = srt[0], srt[1]
        sx, sy, sz = srt[2], srt[3], srt[4]
        if upto == 2:   # + main sort
            return chk(skey) + chk(sword) + chk(sx) + chk(sy) + chk(sz)
        new_key = jnp.concatenate([jnp.ones((1,), bool),
                                   skey[1:] != skey[:-1]])
        first = new_key
        sums = seg_totals_sum([sx, sy, sz,
                               (sword & 0xFFFFFF).astype(jnp.float32),
                               jnp.ones((N,), jnp.float32)], first)
        cnt = jnp.maximum(sums[-1], 1.0)
        means = [s / cnt for s in sums[:-1]]
        if upto == 3:   # + mean scans
            return sum(chk(m) for m in means)
        sv = (sword >> 24).astype(jnp.int32)
        run_new = new_key | jnp.concatenate([jnp.ones((1,), bool),
                                             sv[1:] != sv[:-1]])
        run_len = seg_totals_sum(jnp.ones((N,), jnp.int32), run_new)
        p, s2 = seg_totals_lexmax2(jnp.where(run_new, run_len, -1),
                                   jnp.where(run_new, -sv,
                                             jnp.iinfo(jnp.int32).min),
                                   first)
        mode = (-s2).astype(jnp.float32)
        if upto == 4:   # + mode machinery
            return sum(chk(m) for m in means) + chk(mode)
        outs, nvox = compact_columns(means + [mode], first)
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
    local, intensity, cls = make_data()
    names = ["transform", "+bounds+keys", "+sort", "+mean_scans",
             "+mode", "+compact"]

    @jax.jit
    def overhead(local, intensity, cls):
        return chk(local[:, 0])
    t0 = timed(overhead, local, intensity, cls)
    print(f"overhead raw {t0*1e3:8.2f} ms", flush=True)

    prev = 0.0
    for upto, name in enumerate(names):
        body = stage_fn(upto)

        @jax.jit
        def run(local, intensity, cls, _body=body):
            def bf(i, carry):
                return carry + _body(local, intensity, cls,
                                     (carry.astype(jnp.float32) % 7.) * 1e-6)
            return lax.fori_loop(0, K, bf, jnp.asarray(0, jnp.int32))

        t = (timed(run, local, intensity, cls) - t0) / K * 1e3
        print(f"{name:14s} cum {t:8.2f} ms   (+{t - prev:6.2f})", flush=True)
        prev = t


if __name__ == "__main__":
    main()
