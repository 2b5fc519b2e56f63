"""Post-sort split probe: sort / +reduce kernel / +merge / full."""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
from jax import lax

import bench as B
from pasture_tpu.ops.kernels import fused_voxel_head, fused_world_bounds
from pasture_tpu.ops.kernels.voxel_reduce_kernel import (
    REDUCE_BLOCK, fused_sorted_voxel_reduce)
from pasture_tpu.ops.compact import _merge_tiles

K = 8


def chk(x):
    return jnp.sum(x[:16].astype(jnp.float32)).astype(jnp.int32)


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
        keys, qword = fused_voxel_head(local, scale, rot, t, bmin, B.LEAF,
                                       qbits=10, semantics="floor")
        word = ((batch.data["Classification"].astype(jnp.uint32) << 24)
                | batch.data["Intensity"].astype(jnp.uint32) << 8)
        shaped = tuple(o.reshape(B.TILES, -1) for o in (keys, word, qword))
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
        if upto == 3:
            return sum(chk(o) for o in merged) + nv.astype(jnp.int32)
        return None
    return one


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


if __name__ == "__main__":
    main()
