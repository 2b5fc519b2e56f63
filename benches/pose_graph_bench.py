"""Pose-graph solver scaling bench: solve time vs keyframe count.

Runs the block-sparse PCG solver (solver="cg") at N = 1k..20k poses and the
dense Cholesky at small N for reference, printing one JSON line per point.
The dense path is O(N^3) flops / O(N^2) memory and is not attempted beyond
2k; the CG path is O(E) per inner iteration.

Usage: python benches/pose_graph_bench.py [--tpu]
  (default forces CPU so the bench is runnable anywhere; --tpu uses the
  default backend and fetch-based timing per CLAUDE.md.)
"""

import json
import sys
import time

if "--tpu" not in sys.argv:
    import jax
    jax.config.update("jax_platforms", "cpu")
else:
    import jax

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from pasture_tpu.registration import PoseGraph, optimize_pose_graph  # noqa: E402


def circle_graph(n_poses, rng, drift=0.02):
    angles = np.linspace(0, 2 * np.pi, n_poses, endpoint=False)
    true_t = np.stack([np.cos(angles), np.sin(angles),
                       np.zeros(n_poses)], axis=1) * 5.0
    edges, rel_t = [], []
    for i in range(n_poses - 1):
        edges.append([i, i + 1])
        rel_t.append(true_t[i + 1] - true_t[i] + rng.normal(0, drift, 3))
    for i in range(3, n_poses, 3):     # loop closures
        edges.append([i, 0])
        rel_t.append(true_t[0] - true_t[i])
    est_t = np.concatenate([true_t[:1],
                            true_t[:1] + np.cumsum(rel_t[:n_poses - 1],
                                                   axis=0)])
    e = len(edges)
    eye = np.broadcast_to(np.eye(3), (e, 3, 3))
    return PoseGraph(
        rotations=jnp.asarray(np.broadcast_to(np.eye(3), (n_poses, 3, 3))),
        translations=jnp.asarray(est_t),
        edges=jnp.asarray(edges, jnp.int32),
        rel_rotations=jnp.asarray(eye),
        rel_translations=jnp.asarray(np.stack(rel_t)),
    ), true_t


def run(n, solver, rng, iterations=3):
    graph, true_t = circle_graph(n, rng)
    kwargs = dict(iterations=iterations, solver=solver)
    if solver == "cg":
        kwargs.update(cg_iterations=600, cg_tol=1e-10)
    # compile + warm
    opt, costs = optimize_pose_graph(graph, **kwargs)
    float(costs[-1])
    t0 = time.perf_counter()
    opt, costs = optimize_pose_graph(graph, **kwargs)
    final = float(costs[-1])   # device->host fetch forces completion
    dt = time.perf_counter() - t0
    ate = float(np.linalg.norm(
        np.asarray(opt.translations) - true_t, axis=1).mean())
    print(json.dumps({
        "metric": f"pose_graph_solve_{solver}",
        "n_poses": n, "n_edges": int(graph.num_edges),
        "value": round(dt / iterations * 1e3, 2), "unit": "ms/GN-iteration",
        "ate_m": round(ate, 6), "final_cost": final,
    }), flush=True)


def main():
    rng = np.random.default_rng(11)
    for n in (256, 1024, 2048):
        run(n, "dense", rng)
    for n in (1024, 5000, 10000, 20000):
        run(n, "cg", rng)


if __name__ == "__main__":
    main()
