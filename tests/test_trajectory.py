"""End-to-end registration sequence: scans -> ICP odometry -> pose graph ->
ATE check (the BASELINE.json registration-accuracy metric)."""

import jax.numpy as jnp
import numpy as np

from pasture_tpu.registration import (
    PoseGraph,
    icp,
    optimize_pose_graph,
    so3_exp,
    transform_points,
)


def _scene(rng, n=1500):
    """A structured scene with geometry in all directions."""
    u = rng.uniform(-8, 8, (n, 2))
    z = (np.sin(u[:, 0] * 0.8) + 0.5 * np.cos(u[:, 1] * 1.1)
         + 0.1 * u[:, 0])
    pts = np.stack([u[:, 0], u[:, 1], z], axis=1)
    # add some vertical structure
    poles = rng.uniform(-8, 8, (n // 10, 2))
    heights = rng.uniform(0, 3, n // 10)
    pole_pts = np.stack([poles[:, 0], poles[:, 1], heights], axis=1)
    return np.concatenate([pts, pole_pts])


def _simulate_scans(rng, scene, n_poses=6):
    """True poses along a short trajectory; each scan = scene in the local
    frame of its pose (world -> local: R^T (x - t))."""
    true_rot, true_t, scans = [], [], []
    for k in range(n_poses):
        phi = np.asarray([0.0, 0.0, 0.12 * k])
        rot = np.asarray(so3_exp(jnp.asarray(phi)))
        t = np.asarray([0.5 * k, 0.2 * k, 0.05 * k])
        local = (scene - t) @ rot  # R^T (x - t)
        local = local + rng.normal(0, 0.005, local.shape)  # sensor noise
        true_rot.append(rot)
        true_t.append(t)
        scans.append(local)
    return np.stack(true_rot), np.stack(true_t), scans


def test_sequence_ate_within_bounds(rng):
    scene = _scene(rng)
    true_rot, true_t, scans = _simulate_scans(rng, scene)
    n_poses = len(scans)

    # scan-to-scan ICP odometry: align scan k+1 to scan k
    edges, rel_rots, rel_ts = [], [], []
    for k in range(n_poses - 1):
        res = icp(jnp.asarray(scans[k + 1]), jnp.asarray(scans[k]),
                  max_correspondence_distance=1.5, iterations=25,
                  point_to_plane=True)
        edges.append([k, k + 1])
        rel_rots.append(np.asarray(res.rotation))
        rel_ts.append(np.asarray(res.translation))

    # integrate odometry into initial world poses
    est_rot = [np.eye(3)]
    est_t = [np.zeros(3)]
    for k in range(n_poses - 1):
        est_rot.append(est_rot[-1] @ rel_rots[k])
        est_t.append(est_rot[-2] @ rel_ts[k] + est_t[-1])

    graph = PoseGraph(
        rotations=jnp.asarray(np.stack(est_rot)),
        translations=jnp.asarray(np.stack(est_t)),
        edges=jnp.asarray(edges, jnp.int32),
        rel_rotations=jnp.asarray(np.stack(rel_rots)),
        rel_translations=jnp.asarray(np.stack(rel_ts)))
    optimized, costs = optimize_pose_graph(graph, iterations=5)

    # align estimate to ground truth (first pose anchored at origin = the
    # first true pose frame), then absolute trajectory error
    # true poses relative to pose 0:
    r0, t0 = true_rot[0], true_t[0]
    rel_true_t = np.stack([(r0.T @ (true_t[k] - t0)) for k in range(n_poses)])
    est = np.asarray(optimized.translations)
    ate = np.sqrt(np.mean(np.sum((est - rel_true_t) ** 2, axis=1)))
    assert ate < 0.05, f"ATE {ate:.4f} exceeds bound"

    # each scan, moved by its estimated pose, overlays the scene
    rot1 = np.asarray(optimized.rotations[1])
    t1 = np.asarray(optimized.translations[1])
    moved = np.asarray(transform_points(jnp.asarray(rot1), jnp.asarray(t1),
                                        jnp.asarray(scans[1])))
    scene_rel = (scene - t0) @ r0
    d = np.linalg.norm(moved[:100, None, :] - scene_rel[None, :500, :],
                       axis=2).min(axis=1)
    assert np.median(d) < 0.05
