"""Algorithm library tests (parity scenarios from the reference test suites:
segmentation.rs, convexhull.rs:498-1341, normal_estimation.rs:504-699,
voxel_grid.rs doc example, bounds/minmax)."""

import numpy as np
import pytest

from pasture_tpu.algorithms import (
    Projection,
    calculate_bounds,
    compute_normals,
    convex_hull_as_points,
    convex_hull_as_triangle_mesh,
    minmax_attribute,
    ransac_line_device,
    ransac_line_serial,
    ransac_plane_device,
    ransac_plane_serial,
    reproject_point_cloud_within,
    voxelgrid_filter,
)
from pasture_tpu.buffers.device import PointBatch
from pasture_tpu.buffers.host import HostPointBuffer
from pasture_tpu.layout import attributes as att
from pasture_tpu.layout.dtypes import DevicePolicy
from pasture_tpu.layout.schema import PointSchema


def _pos_buffer(pos, extra=None):
    attrs = [att.POSITION_3D] + ([a for a, _ in extra] if extra else [])
    schema = PointSchema.from_attributes(attrs)
    cols = {att.POSITION_3D.name: np.asarray(pos, np.float64)}
    if extra:
        for a, v in extra:
            cols[a.name] = v
    return HostPointBuffer.from_columns(schema, cols)


def _batch(buffer, cap=None):
    return PointBatch.from_host(buffer, policy=DevicePolicy.EXACT,
                                capacity=cap)


# ---- bounds / minmax -----------------------------------------------------------

def test_bounds_host_and_device(rng):
    pos = rng.uniform(-5, 5, (100, 3))
    buf = _pos_buffer(pos)
    bb = calculate_bounds(buf)
    np.testing.assert_allclose(bb.min, pos.min(axis=0))
    np.testing.assert_allclose(bb.max, pos.max(axis=0))
    bb2 = calculate_bounds(_batch(buf, cap=128))
    np.testing.assert_allclose(bb2.min, pos.min(axis=0))
    np.testing.assert_allclose(bb2.max, pos.max(axis=0))


def test_minmax_vector_and_scalar(rng):
    pos = rng.uniform(-5, 5, (50, 3))
    inten = rng.integers(0, 1000, 50).astype(np.uint16)
    buf = _pos_buffer(pos, extra=[(att.INTENSITY, inten)])
    mn, mx = minmax_attribute(buf, att.INTENSITY)
    assert mn == inten.min() and mx == inten.max()
    mn3, mx3 = minmax_attribute(buf, att.POSITION_3D)
    np.testing.assert_allclose(mn3, pos.min(axis=0))
    np.testing.assert_allclose(mx3, pos.max(axis=0))
    # device path
    mnd, mxd = minmax_attribute(_batch(buf), att.INTENSITY.name)
    assert mnd == inten.min() and mxd == inten.max()


# ---- voxel grid ----------------------------------------------------------------

def test_voxelgrid_filter_host_reference_example():
    """Reference doc example: 100x100 grid, leaf 1.5 -> < half the points
    (voxel_grid.rs:86-108)."""
    ii, jj = np.meshgrid(np.arange(100.0), np.arange(100.0))
    pos = np.stack([np.zeros(10000), ii.ravel(), jj.ravel()], axis=1)
    buf = _pos_buffer(pos)
    out = voxelgrid_filter(buf, 1.5, 1.5, 1.5)
    assert 0 < len(out) < len(buf) / 2


def test_voxelgrid_host_vs_device_counts(rng):
    pos = rng.uniform(0, 10, (500, 3))
    inten = rng.integers(0, 100, 500).astype(np.uint16)
    buf = _pos_buffer(pos, extra=[(att.INTENSITY, inten)])
    host_out = voxelgrid_filter(buf, 1.0)
    dev_out = voxelgrid_filter(_batch(buf, cap=512), 1.0)
    assert len(host_out) == int(dev_out.count)
    # same centroid set (order differs: tuple-sorted vs Morton)
    hp = np.sort(host_out.get(att.POSITION_3D.name), axis=0)
    dp = np.sort(dev_out.to_host().get(att.POSITION_3D.name), axis=0)
    np.testing.assert_allclose(hp, dp, atol=1e-5)


# ---- RANSAC --------------------------------------------------------------------

def _plane_cloud(rng, n_plane=400, n_noise=60):
    xy = rng.uniform(-10, 10, (n_plane, 2))
    plane_pts = np.stack([xy[:, 0], xy[:, 1],
                          0.5 * xy[:, 0] - 0.25 * xy[:, 1] + 3.0], axis=1)
    noise = rng.uniform(-30, 30, (n_noise, 3))
    return np.concatenate([plane_pts, noise])


def test_ransac_plane_serial_finds_plane(rng):
    pos = _plane_cloud(rng)
    buf = _pos_buffer(pos)
    plane, inliers = ransac_plane_serial(buf, 0.1, 64, seed=1)
    assert plane.ranking >= 390
    assert np.all(inliers < len(pos))
    # verify inliers actually lie on the plane
    d = plane.distance(pos[inliers])
    assert d.max() < 0.1


def test_ransac_plane_device_finds_plane(rng):
    pos = _plane_cloud(rng)
    buf = _pos_buffer(pos)
    plane, inliers = ransac_plane_device(_batch(buf, cap=512), 0.1, 64, seed=1)
    assert plane.ranking >= 390
    d = plane.distance(pos[inliers])
    assert d.max() < 0.1


def test_ransac_line_finds_line(rng):
    t = rng.uniform(-10, 10, 300)
    line_pts = np.stack([t, 2 * t + 1, -t], axis=1)
    noise = rng.uniform(-30, 30, (50, 3))
    pos = np.concatenate([line_pts, noise])
    buf = _pos_buffer(pos)
    line, inliers = ransac_line_serial(buf, 0.05, 64, seed=2)
    assert line.ranking >= 290
    line_d, inliers_d = ransac_line_device(_batch(buf, cap=512), 0.05, 64,
                                           seed=2)
    assert line_d.ranking >= 290


# ---- convex hull ---------------------------------------------------------------

def test_convex_hull_cube_with_interior_points(rng):
    corners = np.array([[x, y, z] for x in (0, 1) for y in (0, 1)
                        for z in (0, 1)], np.float64)
    interior = rng.uniform(0.1, 0.9, (50, 3))
    pos = np.concatenate([corners, interior])
    buf = _pos_buffer(pos)
    hull_points = convex_hull_as_points(buf)
    assert set(hull_points) == set(range(8))
    tris = convex_hull_as_triangle_mesh(buf)
    assert len(tris) == 12  # cube hull has 12 triangles
    _assert_all_inside(pos, tris)


def _assert_all_inside(pos, tris):
    """Oracle from the reference tests (test_all_points_inside_hull,
    convexhull.rs:498+): every point lies on the inner side of every face."""
    for a, b, c in tris:
        n = np.cross(pos[b] - pos[a], pos[c] - pos[a])
        s = (pos - pos[a]) @ n
        assert (s <= 1e-6 * max(1.0, np.abs(pos).max()) ** 2).all() or \
               (s >= -1e-6 * max(1.0, np.abs(pos).max()) ** 2).all()


def test_convex_hull_random_cloud(rng):
    pos = rng.normal(size=(200, 3))
    buf = _pos_buffer(pos)
    tris = convex_hull_as_triangle_mesh(buf)
    _assert_all_inside(pos, tris)
    # Euler: V - E + F = 2 with E = 3F/2 -> V = F/2 + 2
    verts = set(np.asarray(tris).ravel())
    assert len(verts) == len(tris) // 2 + 2


def test_convex_hull_degenerate_cases():
    # single point repeated
    buf1 = _pos_buffer(np.zeros((3, 3)))
    assert list(convex_hull_as_points(buf1)) == [0]
    with pytest.raises(ValueError):
        convex_hull_as_triangle_mesh(buf1)
    # collinear
    t = np.linspace(0, 1, 7)
    buf2 = _pos_buffer(np.stack([t, 2 * t, 3 * t], axis=1))
    pts = convex_hull_as_points(buf2)
    assert set(pts) == {0, 6}
    with pytest.raises(ValueError):
        convex_hull_as_triangle_mesh(buf2)
    # coplanar square
    sq = np.array([[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0],
                   [0.5, 0.5, 0]], np.float64)
    pts = convex_hull_as_points(_pos_buffer(sq))
    assert set(pts) == {0, 1, 2, 3}
    tris = convex_hull_as_triangle_mesh(_pos_buffer(sq))
    assert len(tris) == 2


# ---- normals -------------------------------------------------------------------

def test_normals_on_plane(rng):
    """Known-plane case (reference normal_estimation.rs:504+): normals of a
    z=const plane are +-z, curvature ~0."""
    xy = rng.uniform(-5, 5, (300, 2))
    pos = np.stack([xy[:, 0], xy[:, 1], np.full(300, 2.0)], axis=1)
    buf = _pos_buffer(pos)
    normals, curvature = compute_normals(buf, 8)
    nz = np.abs(normals[:, 2])
    np.testing.assert_allclose(nz, 1.0, atol=1e-5)
    assert curvature.max() < 1e-6


def test_normals_validation():
    buf = _pos_buffer(np.zeros((2, 3)))
    with pytest.raises(ValueError):
        compute_normals(buf, 8)
    buf3 = _pos_buffer(np.eye(3))
    with pytest.raises(ValueError):
        compute_normals(buf3, 2)


# ---- reprojection --------------------------------------------------------------

def test_utm_known_point():
    """Central-meridian point of UTM zone 32N: E=500000 exactly."""
    p = Projection("EPSG:4326", "EPSG:32632")
    out = p.transform(np.array([9.0, 0.0, 0.0]))
    np.testing.assert_allclose(out[0], 500000.0, atol=1e-6)
    np.testing.assert_allclose(out[1], 0.0, atol=1e-6)


def test_utm_roundtrip(rng):
    lon = rng.uniform(6.5, 11.5, 100)
    lat = rng.uniform(-80, 84, 100)
    h = rng.uniform(0, 100, 100)
    llh = np.stack([lon, lat, h], axis=1)
    p = Projection("EPSG:4326", "EPSG:32632")
    back = Projection("EPSG:32632", "EPSG:4326").transform(p.transform(llh))
    np.testing.assert_allclose(back, llh, atol=1e-8)


def test_ecef_roundtrip(rng):
    lon = rng.uniform(-180, 180, 50)
    lat = rng.uniform(-89, 89, 50)
    h = rng.uniform(-100, 4000, 50)
    llh = np.stack([lon, lat, h], axis=1)
    ecef = Projection("EPSG:4326", "EPSG:4978").transform(llh)
    back = Projection("EPSG:4978", "EPSG:4326").transform(ecef)
    np.testing.assert_allclose(back, llh, atol=1e-6)


def test_webmerc_known():
    p = Projection("EPSG:4326", "EPSG:3857")
    out = p.transform(np.array([180.0, 0.0, 0.0]))
    np.testing.assert_allclose(out[0], 20037508.342789244, rtol=1e-12)


def test_reproject_point_cloud_within(rng):
    lon = rng.uniform(8, 10, 20)
    lat = rng.uniform(45, 55, 20)
    pos = np.stack([lon, lat, np.zeros(20)], axis=1)
    buf = _pos_buffer(pos)
    reproject_point_cloud_within(buf, "EPSG:4326", "EPSG:32632")
    out = buf.get(att.POSITION_3D.name)
    assert np.all(out[:, 0] > 100000) and np.all(out[:, 0] < 900000)
    assert np.all(out[:, 1] > 4000000)


def test_normals_morton_window_matches_exact(rng):
    """The O(N·window) Morton-window path agrees with the exact O(N²)
    path on a smooth surface: normals within a few degrees, curvature
    close (neighbour sets may differ slightly at cell boundaries)."""
    n = 4000
    xy = rng.uniform(-10, 10, (n, 2))
    z = 0.4 * np.sin(xy[:, 0] * 0.7) + 0.3 * np.cos(xy[:, 1] * 0.5)
    pos = np.stack([xy[:, 0], xy[:, 1], z], axis=1)
    schema = PointSchema.from_attributes([att.POSITION_3D])
    buf = HostPointBuffer.from_columns(schema, {att.POSITION_3D.name: pos})

    n_exact, c_exact = compute_normals(buf, 12, method="exact")
    n_win, c_win = compute_normals(buf, 12, method="morton", window=48)

    # unoriented normals: compare |cos(angle)|
    cos = np.abs(np.sum(n_exact * n_win, axis=1))
    frac_close = float((cos > 0.995).mean())   # within ~5.7 degrees
    assert frac_close > 0.95, frac_close
    assert float(np.median(np.abs(c_exact - c_win))) < 0.01


def test_normals_morton_window_plane(rng):
    """Known plane: Morton-window normals recover the plane normal."""
    n = 3000
    xy = rng.uniform(0, 20, (n, 2))
    z = 0.3 * xy[:, 0] - 0.1 * xy[:, 1] + 2.0
    pos = np.stack([xy[:, 0], xy[:, 1], z], axis=1)
    true_n = np.array([-0.3, 0.1, 1.0])
    true_n /= np.linalg.norm(true_n)
    schema = PointSchema.from_attributes([att.POSITION_3D])
    buf = HostPointBuffer.from_columns(schema, {att.POSITION_3D.name: pos})
    normals, curvature = compute_normals(buf, 10, method="morton",
                                         window=32)
    cos = np.abs(normals @ true_n)
    assert float((cos > 0.999).mean()) > 0.98
    assert float(np.median(curvature)) < 1e-4


def test_normals_method_validation(rng):
    pos = rng.uniform(0, 1, (100, 3))
    schema = PointSchema.from_attributes([att.POSITION_3D])
    buf = HostPointBuffer.from_columns(schema, {att.POSITION_3D.name: pos})
    with pytest.raises(ValueError, match="unknown method"):
        compute_normals(buf, 5, method="kdtree")
    with pytest.raises(ValueError, match="window"):
        compute_normals(buf, 10, method="morton", window=4)


def test_scan_exact_normals_match_gather_path(rng):
    """The zero-gather scan-tiled exact k-NN (removes the ~64k cap;
    normal_estimation.rs:79-484 parity at scale) must agree with the
    index-gather exact path."""
    import jax
    import jax.numpy as jnp

    from pasture_tpu.algorithms.normals import (_normals_device,
                                                _normals_scan_exact)

    u = rng.uniform(-5, 5, (8192, 2))
    z = 0.3 * np.sin(u[:, 0] * 2) + 0.2 * np.cos(u[:, 1])
    pos = jnp.asarray(np.stack([u[:, 0], u[:, 1], z], axis=1), jnp.float32)
    valid = jnp.ones(8192, bool)
    n1, c1 = jax.jit(_normals_device, static_argnums=(2, 3))(
        pos, valid, 10, 2048)
    n2, c2 = jax.jit(_normals_scan_exact, static_argnums=(2,))(
        pos, valid, 10)
    dot = np.abs(np.sum(np.asarray(n1) * np.asarray(n2), axis=1))
    assert (dot > np.cos(np.deg2rad(1.0))).mean() > 0.995
    np.testing.assert_allclose(np.asarray(c1), np.asarray(c2), atol=1e-3)


def test_scan_exact_normals_at_scale(rng):
    """EXACT normals through the >64k dispatch (scan-tiled path + query
    slicing) via the public compute_normals(method='exact').  The
    thresholds are shrunk so the 2-core CPU suite exercises the same
    code paths the TPU runs at 1M+ (the real-scale run is
    benches/normals_bench.py --exact)."""
    import pasture_tpu.algorithms.normals as normals_mod
    from pasture_tpu.algorithms import compute_normals

    n = 24_000
    u = rng.uniform(-40, 40, (n, 2))
    z = 0.3 * np.sin(u[:, 0]) + 0.2 * np.cos(u[:, 1] * 1.3)
    pos = np.stack([u[:, 0], u[:, 1], z], axis=1)
    buf = _pos_buffer(pos.astype(np.float32))
    old_max = normals_mod._EXACT_NORMALS_MAX
    old_slice = normals_mod._EXACT_SLICE
    normals_mod._EXACT_NORMALS_MAX = 4096   # force the scan path
    normals_mod._EXACT_SLICE = 8192         # force query slicing (3 calls)
    try:
        nrm, curv = compute_normals(buf, 10, method="exact")
    finally:
        normals_mod._EXACT_NORMALS_MAX = old_max
        normals_mod._EXACT_SLICE = old_slice
    # oracle: the small-N exact gather path on the SAME data (the
    # analytic surface bends over a k=10 neighbourhood at this density,
    # so the plane fit legitimately tilts a few degrees)
    ref, _ = compute_normals(buf, 10, method="exact")
    dot = np.abs(np.sum(nrm * ref, axis=1))
    assert (dot > np.cos(np.deg2rad(1.0))).mean() > 0.99
    analytic = np.stack([-0.3 * np.cos(u[:, 0]),
                         0.26 * np.sin(u[:, 1] * 1.3),
                         np.ones(n)], axis=1)
    analytic /= np.linalg.norm(analytic, axis=1, keepdims=True)
    adot = np.abs(np.sum(nrm * analytic, axis=1))
    assert (adot > np.cos(np.deg2rad(10.0))).mean() > 0.97


def test_scan_exact_register_merge_matches_topk(rng):
    """The pass-1 k-register/butterfly merge (round 5: replaces XLA's
    TopK custom call, ~80% of the exact runtime on TPU) must be
    BIT-identical to the top_k formulation — critically across MULTIPLE
    target blocks: the carried per-lane registers must stay disjoint
    multisets (merging into the carry would replicate the global top-k
    into every lane and collapse the k-th threshold on the next round —
    the bug this test pins)."""
    from functools import partial

    import jax
    import jax.numpy as jnp

    from pasture_tpu.algorithms.normals import _normals_scan_exact

    n = 1 << 14          # chunk=8192 -> 2 target blocks
    u = rng.uniform(-80, 80, (n, 2))
    z = 0.3 * np.sin(u[:, 0] * 0.5) + 0.2 * np.cos(u[:, 1] * 0.8)
    pos = jnp.asarray(np.stack([u[:, 0], u[:, 1], z], axis=1), jnp.float32)
    valid = jnp.asarray(np.arange(n) < n - 13)
    q = pos[:2048]
    a = jax.jit(_normals_scan_exact, static_argnums=(2,))(
        pos, valid, 8, queries=q)
    b = jax.jit(partial(_normals_scan_exact, pass1_merge="topk"),
                static_argnums=(2,))(pos, valid, 8, queries=q)
    np.testing.assert_array_equal(np.asarray(a[0]), np.asarray(b[0]))
    np.testing.assert_array_equal(np.asarray(a[1]), np.asarray(b[1]))
