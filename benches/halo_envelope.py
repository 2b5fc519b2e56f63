"""Partitioned-ICP quality envelope on a realistic scene vs halo size.

Round-2 verdict #6: rotated + partially-overlapping 3-D scans (two
walls + rough ground, NOT a Morton-friendly diagonal curve); for each
halo in {32, 64, 128, 256, 512} measure

* correspondence-miss rate at the initial pose: fraction of source
  points whose TRUE nearest map neighbour (host brute force) is farther
  than the match the halo'd Morton path finds by more than 1 mm;
* final ATE (translation error) and rotation error of
  ``distributed_icp_partitioned`` on the virtual 8-device mesh.

Writes a markdown table to stdout (pasted into LIMITATIONS.md) and a
JSON line per halo.  CPU run:

    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python benches/halo_envelope.py
"""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np

from pasture_tpu.buffers.device import PointBatch
from pasture_tpu.layout import attributes as att
from pasture_tpu.layout.schema import PointSchema
from pasture_tpu.parallel import make_mesh
from pasture_tpu.parallel.distributed import distributed_icp_partitioned
from pasture_tpu.registration.icp import morton_nearest_target


def make_scene(rng, n=24_000):
    """Two walls + rough ground: strong 3-D structure, no Morton-aligned
    diagonal."""
    n3 = n // 3
    ground = np.stack([rng.uniform(0, 20, n3), rng.uniform(0, 20, n3),
                       0.15 * rng.standard_normal(n3)], axis=1)
    wall1 = np.stack([rng.uniform(0, 20, n3),
                      np.full(n3, 2.0) + 0.05 * rng.standard_normal(n3),
                      rng.uniform(0, 5, n3)], axis=1)
    wall2 = np.stack([np.full(n3, 15.0) + 0.05 * rng.standard_normal(n3),
                      rng.uniform(0, 20, n3),
                      rng.uniform(0, 5, n3)], axis=1)
    return np.concatenate([ground, wall1, wall2])


def batch_of(p):
    schema = PointSchema.from_attributes([att.POSITION_3D])
    cap = max(-(-len(p) // 8) * 8, 8)
    col = jnp.asarray(np.pad(np.asarray(p, np.float64),
                             [(0, cap - len(p)), (0, 0)]))
    return PointBatch({att.POSITION_3D.name: col},
                      jnp.asarray(len(p), jnp.int32), schema, {})


def main():
    rng = np.random.default_rng(12)
    target = make_scene(rng)
    th = np.deg2rad(3.0)
    rot_true = np.asarray([[np.cos(th), -np.sin(th), 0],
                           [np.sin(th), np.cos(th), 0], [0, 0, 1.0]])
    t_true = np.asarray([0.3, -0.2, 0.1])
    # partially overlapping source: crop to x<16 (drops most of wall2)
    src_world = target[target[:, 0] < 16.0]
    # source in its own frame: world = R src + t  ->  src = R^T (world-t)
    source = (src_world - t_true) @ rot_true

    mesh = make_mesh(8)
    rows = []
    for halo in (32, 64, 128, 256, 512):
        res, dropped = distributed_icp_partitioned(
            batch_of(source), batch_of(target), mesh, halo=halo,
            capacity_factor=4.0, max_correspondence_distance=1.0,
            iterations=15)
        r = np.asarray(res.rotation)
        t = np.asarray(res.translation)
        ate = float(np.linalg.norm(t - t_true))
        cos = (np.trace(r @ rot_true.T) - 1.0) / 2.0
        rot_err = float(np.degrees(np.arccos(np.clip(cos, -1, 1))))

        # correspondence-miss rate at the initial (identity) pose via the
        # single-device morton window as a stand-in halo'd matcher vs
        # host-exact NN
        sv = jnp.ones(len(source), bool)
        tv = jnp.ones(len(target), bool)
        tmin = jnp.asarray(target.min(0))
        extent = jnp.asarray(target.max(0) - target.min(0))
        matched, d2 = morton_nearest_target(
            jnp.asarray(source), sv, jnp.asarray(target), tv, tmin,
            extent, min(halo, 256))
        d2 = np.asarray(d2)
        # host-exact NN distances (blocked)
        best = np.full(len(source), np.inf)
        for i in range(0, len(source), 4096):
            blk = source[i:i + 4096]
            d = ((blk[:, None, :] - target[None, :, :]) ** 2).sum(-1)
            best[i:i + 4096] = d.min(1)
        miss = float(np.mean(np.sqrt(d2) > np.sqrt(best) + 1e-3))

        rows.append((halo, miss, ate, rot_err, int(dropped)))
        print(json.dumps({"halo": halo, "miss_rate": round(miss, 4),
                          "ate_m": round(ate, 4),
                          "rot_err_deg": round(rot_err, 4),
                          "dropped": int(dropped)}), flush=True)

    print("\n| halo | corr-miss rate | ATE (m) | rot err (deg) |")
    print("|---|---|---|---|")
    for halo, miss, ate, rot_err, _ in rows:
        print(f"| {halo} | {miss:.1%} | {ate:.4f} | {rot_err:.3f} |")


if __name__ == "__main__":
    main()
