"""ICP throughput on TPU: million-point scan-to-map registration.

The morton-correspondence path (registration/icp.py — per-iteration
co-sort of both clouds on one Morton curve + windowed running-min
matching, zero gathers) is the multi-million-point ICP; this bench
records its wall time and pose recovery at 1M x 1M on one chip, for
point-to-point AND point-to-plane (window-fit target normals).

One JSON line per row like bench.py.  Timing: the tunneled backend's
``block_until_ready`` does not wait for compute, so each run is timed to
the pose FETCH (device->host), best-of-3, minus a trivial-program fetch
baseline.

Run:  timeout 5400 /opt/venv/bin/python benches/icp_bench.py
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
ITERS = 30
THETA = np.deg2rad(1.0)          # ground-truth misalignment
SHIFT = np.asarray([0.21, -0.13, 0.08], np.float32)


def make_scene():
    """Survey-like scene: rolling terrain + two wall planes, 1M points in
    a ~200 m tile (morton-window correspondences need spatial locality, a
    pure uniform volume is the hard case for any NN matcher)."""
    rng = np.random.default_rng(11)
    n_ground = N - (N // 8) * 2
    xy = rng.uniform(0, 200, (n_ground, 2)).astype(np.float32)
    z = (2.0 * np.sin(xy[:, 0] * 0.05) + 1.5 * np.cos(xy[:, 1] * 0.04)
         + rng.normal(0, 0.02, n_ground)).astype(np.float32)
    ground = np.stack([xy[:, 0], xy[:, 1], z], axis=1)
    walls = []
    for x0 in (60.0, 140.0):
        yz = rng.uniform(0, 1, (N // 8, 2)).astype(np.float32)
        walls.append(np.stack([
            np.full(N // 8, x0, np.float32) + rng.normal(
                0, 0.02, N // 8).astype(np.float32),
            yz[:, 0] * 200, yz[:, 1] * 8], axis=1))
    return np.concatenate([ground] + walls).astype(np.float32)


def main() -> None:
    from pasture_tpu.registration import icp

    target = make_scene()
    c, s = np.cos(THETA), np.sin(THETA)
    rot_true = np.asarray([[c, -s, 0], [s, c, 0], [0, 0, 1]], np.float32)
    # the scan: the misaligned view of the same scene
    source = (target - target.mean(0)) @ rot_true.T + target.mean(0) + SHIFT
    tgt = jnp.asarray(target)
    src = jnp.asarray(source.astype(np.float32))

    triv = jax.jit(lambda p: jnp.sum(p[:8]))
    float(triv(tgt))
    t0 = time.perf_counter()
    float(triv(tgt))
    overhead = time.perf_counter() - t0

    for p2pl in (False, True):
        def run_fn(s_, t_, p=p2pl):
            r = icp(s_, t_, max_correspondence_distance=4.0,
                    iterations=ITERS, correspondence="morton",
                    point_to_plane=p)
            return r.rotation, r.translation
        run = jax.jit(run_fn)
        rm, tr = run(src, tgt)                   # compile + warm
        float(jnp.sum(tr))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            rm, tr = run(src, tgt)
            tr = np.asarray(tr)
            rm = np.asarray(rm)
            best = min(best, time.perf_counter() - t0)
        dt = max(best - overhead, 1e-9)
        # pose recovery: rows of source/target correspond one-to-one, so
        # the per-point residual after the estimated pose is the error
        aligned = source @ np.asarray(rm).T + tr
        resid = float(np.abs(aligned - target).mean())
        print(json.dumps({
            "metric": ("icp_morton_1m_point_to_plane" if p2pl
                       else "icp_morton_1m_point_to_point"),
            "value": round(N * ITERS / dt / 1e6, 1),
            "unit": "Mcorrespondences/s/chip",
            "seconds": round(dt, 2), "iterations": ITERS, "n": N,
            "mean_abs_residual_m": round(resid, 4),
        }), flush=True)
        assert resid < 0.02, f"ICP failed to recover the pose: {resid}"


if __name__ == "__main__":
    main()
