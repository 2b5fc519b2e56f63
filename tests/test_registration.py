"""Registration layer tests: SE(3) ops, ICP alignment, pose-graph solve."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pasture_tpu.registration import (
    IcpResult,
    PoseGraph,
    icp,
    optimize_pose_graph,
    se3_exp,
    se3_log,
    so3_exp,
    so3_log,
)


def test_so3_exp_log_roundtrip(rng):
    phi = rng.normal(size=(32, 3)) * 0.8
    rot = so3_exp(jnp.asarray(phi))
    back = so3_log(rot)
    np.testing.assert_allclose(np.asarray(back), phi, atol=1e-6)
    # orthonormality
    ident = np.einsum("nij,nkj->nik", np.asarray(rot), np.asarray(rot))
    np.testing.assert_allclose(ident, np.broadcast_to(np.eye(3), (32, 3, 3)),
                               atol=1e-6)


def test_se3_exp_log_roundtrip(rng):
    xi = rng.normal(size=(16, 6)) * 0.5
    rot, t = se3_exp(jnp.asarray(xi))
    back = se3_log(rot, t)
    np.testing.assert_allclose(np.asarray(back), xi, atol=1e-6)


def _cloud(rng, n=1500):
    # a structured, non-degenerate surface
    u = rng.uniform(-3, 3, (n, 2))
    z = 0.3 * np.sin(u[:, 0] * 2.0) + 0.2 * np.cos(u[:, 1] * 1.5)
    return np.stack([u[:, 0], u[:, 1], z], axis=1)


def test_icp_point_to_point_recovers_transform(rng):
    target = _cloud(rng)
    phi = np.array([0.03, -0.05, 0.08])
    rot_true = np.asarray(so3_exp(jnp.asarray(phi)))
    t_true = np.array([0.2, -0.1, 0.15])
    # source: target moved by the inverse transform
    source = (target - t_true) @ rot_true  # == R^-1 (x - t)
    result = icp(jnp.asarray(source), jnp.asarray(target),
                 max_correspondence_distance=2.0, iterations=30)
    np.testing.assert_allclose(np.asarray(result.rotation), rot_true,
                               atol=2e-3)
    np.testing.assert_allclose(np.asarray(result.translation), t_true,
                               atol=5e-3)
    assert float(result.rmse) < 0.02


def test_icp_point_to_plane_converges_faster(rng):
    target = _cloud(rng)
    t_true = np.array([0.05, 0.08, -0.06])
    source = target - t_true
    res_plane = icp(jnp.asarray(source), jnp.asarray(target),
                    max_correspondence_distance=2.0, iterations=8,
                    point_to_plane=True)
    np.testing.assert_allclose(np.asarray(res_plane.translation), t_true,
                               atol=1e-2)


def test_icp_with_padding_mask(rng):
    target = _cloud(rng, 1000)
    source = np.concatenate([target + 0.02, np.full((100, 3), 1e6)])
    valid = np.arange(1100) < 1000
    result = icp(jnp.asarray(source), jnp.asarray(target),
                 source_valid=jnp.asarray(valid),
                 max_correspondence_distance=1.0, iterations=10)
    np.testing.assert_allclose(np.asarray(result.translation),
                               [-0.02, -0.02, -0.02], atol=3e-3)


def _circle_graph(n_poses, rng, drift=0.02):
    """Odometry chain around a circle with drift + one loop closure."""
    angles = np.linspace(0, 2 * np.pi, n_poses, endpoint=False)
    true_t = np.stack([np.cos(angles), np.sin(angles),
                       np.zeros(n_poses)], axis=1) * 5.0
    true_rot = np.broadcast_to(np.eye(3), (n_poses, 3, 3)).copy()

    edges, rel_rot, rel_t = [], [], []
    for i in range(n_poses - 1):
        edges.append([i, i + 1])
        rel_rot.append(np.eye(3))
        rel_t.append(true_t[i + 1] - true_t[i] + rng.normal(0, drift, 3))
    # loop closures: exact relative measurements back to pose 0
    for i in range(3, n_poses, 3):
        edges.append([i, 0])
        rel_rot.append(np.eye(3))
        rel_t.append(true_t[0] - true_t[i])

    # initial guess: integrate noisy odometry
    est_t = [true_t[0]]
    for i in range(n_poses - 1):
        est_t.append(est_t[-1] + rel_t[i])
    est_t = np.stack(est_t)
    return PoseGraph(
        rotations=jnp.asarray(true_rot),
        translations=jnp.asarray(est_t),
        edges=jnp.asarray(edges, jnp.int32),
        rel_rotations=jnp.asarray(np.stack(rel_rot)),
        rel_translations=jnp.asarray(np.stack(rel_t)),
    ), true_t


def test_pose_graph_closes_loop(rng):
    graph, true_t = _circle_graph(24, rng)
    drift_before = np.linalg.norm(
        np.asarray(graph.translations) - true_t, axis=1)
    optimized, costs = optimize_pose_graph(graph, iterations=8)
    drift_after = np.linalg.norm(
        np.asarray(optimized.translations) - true_t, axis=1)
    # ATE drops substantially and the cost decreases monotonically-ish
    assert drift_after.mean() < drift_before.mean() * 0.7
    assert float(costs[-1]) < float(costs[0]) + 1e-9
    # anchored pose stays put
    np.testing.assert_allclose(np.asarray(optimized.translations[0]),
                               true_t[0], atol=1e-4)


def test_pose_graph_with_rotation_noise(rng):
    n = 12
    graph, true_t = _circle_graph(n, rng, drift=0.05)
    # perturb initial rotations too
    phi = rng.normal(0, 0.05, (n, 3))
    graph = PoseGraph(
        rotations=so3_exp(jnp.asarray(phi)) @ graph.rotations,
        translations=graph.translations,
        edges=graph.edges,
        rel_rotations=graph.rel_rotations,
        rel_translations=graph.rel_translations)
    from pasture_tpu.registration.pose_graph import edge_residuals
    r0 = np.asarray(edge_residuals(graph))
    initial_cost = float((r0 * r0).sum())
    optimized, costs = optimize_pose_graph(graph, iterations=10)
    # the perturbed rotations are inconsistent with the measurements; GN
    # should still cut the cost by a large factor
    assert float(costs[-1]) < initial_cost * 0.05


def test_pose_graph_cg_matches_dense(rng):
    """Block-sparse PCG solves the same normal equations as the dense
    Cholesky — solutions must agree to solver tolerance."""
    graph, true_t = _circle_graph(48, rng)
    dense, costs_d = optimize_pose_graph(graph, iterations=5)
    sparse, costs_s = optimize_pose_graph(graph, iterations=5, solver="cg",
                                          cg_iterations=2000, cg_tol=1e-12)
    np.testing.assert_allclose(np.asarray(sparse.translations),
                               np.asarray(dense.translations), atol=1e-6)
    np.testing.assert_allclose(np.asarray(sparse.rotations),
                               np.asarray(dense.rotations), atol=1e-6)
    np.testing.assert_allclose(np.asarray(costs_s), np.asarray(costs_d),
                               rtol=1e-6, atol=1e-10)


def test_pose_graph_cg_5000_poses(rng):
    """The ≥5k-keyframe scale target: the dense path would need a
    (30000, 30000) factorization; the block-sparse CG path runs in O(E)."""
    n = 5000
    graph, true_t = _circle_graph(n, rng)
    drift_before = np.linalg.norm(
        np.asarray(graph.translations) - true_t, axis=1)
    optimized, costs = optimize_pose_graph(graph, iterations=3, solver="cg",
                                           cg_iterations=600, cg_tol=1e-10)
    drift_after = np.linalg.norm(
        np.asarray(optimized.translations) - true_t, axis=1)
    assert drift_after.mean() < drift_before.mean() * 0.2, (
        drift_before.mean(), drift_after.mean())
    assert float(costs[-1]) < float(costs[0]) + 1e-9
    np.testing.assert_allclose(np.asarray(optimized.translations[0]),
                               true_t[0], atol=1e-4)


def test_icp_morton_correspondence_matches_exact(rng):
    """Morton-window correspondence (O((N+M)·window) per iteration, no
    gathers) converges to the same transform as brute-force matching."""
    u = rng.uniform(-3, 3, (4096, 2))
    z = 0.3 * np.sin(u[:, 0] * 2) + 0.2 * np.cos(u[:, 1] * 1.5)
    target = np.stack([u[:, 0], u[:, 1], z], axis=1)
    t_true = np.array([0.1, -0.08, 0.05])
    source = target - t_true

    exact = icp(jnp.asarray(source), jnp.asarray(target),
                max_correspondence_distance=2.0, iterations=10)
    fast = icp(jnp.asarray(source), jnp.asarray(target),
               max_correspondence_distance=2.0, iterations=10,
               correspondence="morton", window=64)
    np.testing.assert_allclose(np.asarray(fast.translation), t_true,
                               atol=5e-3)
    np.testing.assert_allclose(np.asarray(fast.translation),
                               np.asarray(exact.translation), atol=2e-3)
    np.testing.assert_allclose(np.asarray(fast.rotation),
                               np.asarray(exact.rotation), atol=2e-3)


def test_icp_unknown_correspondence_rejected():
    with pytest.raises(ValueError, match="unknown correspondence"):
        icp(jnp.zeros((8, 3)), jnp.zeros((8, 3)), correspondence="kdtree")


def test_icp_morton_point_to_plane_matches_exact(rng):
    """Morton-window point-to-plane (matched normals ride the
    correspondence sorts, window-fit target normals — the same
    construction as the partitioned distributed path) converges to the
    exact-correspondence point-to-plane result."""
    u = rng.uniform(-3, 3, (4096, 2))
    z = 0.3 * np.sin(u[:, 0] * 2) + 0.2 * np.cos(u[:, 1] * 1.5)
    target = np.stack([u[:, 0], u[:, 1], z], axis=1)
    t_true = np.array([0.1, -0.08, 0.05])
    source = target - t_true

    exact = icp(jnp.asarray(source), jnp.asarray(target),
                max_correspondence_distance=2.0, iterations=10,
                point_to_plane=True)
    fast = icp(jnp.asarray(source), jnp.asarray(target),
               max_correspondence_distance=2.0, iterations=10,
               correspondence="morton", window=64, point_to_plane=True)
    np.testing.assert_allclose(np.asarray(fast.translation), t_true,
                               atol=5e-3)
    np.testing.assert_allclose(np.asarray(fast.translation),
                               np.asarray(exact.translation), atol=3e-3)
    np.testing.assert_allclose(np.asarray(fast.rotation),
                               np.asarray(exact.rotation), atol=3e-3)
