"""Port of the reference convex-hull test battery.

Scenario-for-scenario adaptation of the reference's 25-test module
(pasture-algorithms/src/convexhull.rs:498-1341) to this API:

* ``create_convex_hull`` returns DOUBLE-sided triangles for planar hulls
  (each face twice, opposite normals); ``convex_hull_as_triangle_mesh``
  here is single-sided, so planar counts are half the reference's.
* degenerate inputs (<3 distinct points, collinear) raise ``ValueError``
  from the mesh API; ``convex_hull_as_points`` handles them (the
  reference returns degenerate edge/point "triangles" instead).
"""

import numpy as np
import pytest

from pasture_tpu.algorithms import (convex_hull_as_points,
                                    convex_hull_as_triangle_mesh)
from pasture_tpu.buffers.host import HostPointBuffer
from pasture_tpu.layout import attributes as att
from pasture_tpu.layout.schema import PointSchema


def _buf(pos):
    pos = np.asarray(pos, np.float64).reshape(-1, 3)
    schema = PointSchema.from_attributes([att.POSITION_3D])
    return HostPointBuffer(schema, {att.POSITION_3D.name: pos},
                           validate=False)


def _tri_normals(pos, tris):
    out = []
    for a, b, c in tris:
        n = np.cross(pos[b] - pos[a], pos[c] - pos[a])
        ln = np.linalg.norm(n)
        out.append(n / ln if ln > 0 else n)
    return np.asarray(out)


def _assert_normals(pos, tris, expected, signed=False):
    """Every triangle normal appears in ``expected`` (up to sign unless
    ``signed``), the reference's test_normals_for_triangles oracle
    (convexhull.rs:485-497)."""
    got = _tri_normals(pos, np.asarray(tris))
    exp = np.asarray(expected, np.float64)
    exp = exp / np.linalg.norm(exp, axis=1, keepdims=True)
    for n in got:
        d = np.abs(exp @ n)
        if not signed:
            assert d.max() > 1.0 - 1e-9, n
        else:
            assert (exp @ n).max() > 1.0 - 1e-9, n


def _assert_all_inside(pos, tris):
    """Reference test_all_points_inside_hull (convexhull.rs:498-529):
    every input point lies on the inner side of every face plane."""
    scale = max(1.0, np.abs(pos).max()) ** 2
    for a, b, c in tris:
        n = np.cross(pos[b] - pos[a], pos[c] - pos[a])
        s = (pos - pos[a]) @ n
        assert (s <= 1e-9 * scale).all() or (s >= -1e-9 * scale).all()


# ---- simple simplices (convexhull.rs:530-613) -------------------------------

def test_simple_triangle():
    pos = np.asarray([[0, 0, 0], [1, 0, 0], [0, 0, 1]], np.float64)
    tris = convex_hull_as_triangle_mesh(_buf(pos))
    assert len(tris) == 1   # reference: 2 double-sided
    _assert_normals(pos, tris, [[0, 1, 0]])


def test_simple_tet_4_points():
    pos = np.asarray([[0, 0, 0], [1, 0, 0], [0, 0, 1], [0, 1, 0]],
                     np.float64)
    tris = convex_hull_as_triangle_mesh(_buf(pos))
    assert len(tris) == 4
    _assert_normals(pos, tris,
                    [[-1, 0, 0], [0, -1, 0], [0, 0, -1], [1, 1, 1]])
    _assert_all_inside(pos, tris)


def test_simple_tet_5_points():
    pos = np.asarray([[0, 0, 0], [1, 0, 0], [0, 0, 1], [0, 1, 0],
                      [-1, -1, -1]], np.float64)
    tris = convex_hull_as_triangle_mesh(_buf(pos))
    assert len(tris) == 4
    _assert_normals(pos, tris, [[1, 1, 1], [1, 1, -3], [1, -3, 1],
                                [-3, 1, 1]])
    _assert_all_inside(pos, tris)
    # the interior origin point is on no face
    assert 0 not in set(np.asarray(tris).ravel())


# ---- degenerate inputs (convexhull.rs:614-690, 1164-1298) -------------------

def test_1_point():
    assert list(convex_hull_as_points(_buf([[0, 0, 0]]))) == [0]
    with pytest.raises(ValueError):
        convex_hull_as_triangle_mesh(_buf([[0, 0, 0]]))


def test_line_2_points():
    pts = convex_hull_as_points(_buf([[0, 0, 0], [1, 0, 0]]))
    assert set(pts) == {0, 1}
    with pytest.raises(ValueError):
        convex_hull_as_triangle_mesh(_buf([[0, 0, 0], [1, 0, 0]]))


def test_line_3_points():
    pts = convex_hull_as_points(
        _buf([[0, 0, 0], [1, 0, 0], [2, 0, 0]]))
    assert set(pts) == {0, 2}


def test_line_4_points():
    pts = convex_hull_as_points(
        _buf([[0, 0, 0], [1, 0, 0], [2, 0, 0], [-1, 0, 0]]))
    assert set(pts) == {3, 2}


def test_0_points_mesh_error():
    with pytest.raises(ValueError):
        convex_hull_as_triangle_mesh(_buf(np.zeros((0, 3))))


def test_2_points_mesh_error():
    with pytest.raises(ValueError):
        convex_hull_as_triangle_mesh(_buf([[0, 0, 0], [1, 1, 1]]))


def test_3_same_points_mesh_error():
    with pytest.raises(ValueError):
        convex_hull_as_triangle_mesh(_buf(np.zeros((3, 3))))


def test_3_collinear_mesh_error():
    with pytest.raises(ValueError):
        convex_hull_as_triangle_mesh(
            _buf([[0, 0, 0], [1, 0, 0], [2, 0, 0]]))


def test_3_distinct_points_mesh():
    pos = np.asarray([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float64)
    tris = convex_hull_as_triangle_mesh(_buf(pos))
    assert len(tris) == 1   # reference: 2 double-sided
    assert set(np.asarray(tris).ravel()) == {0, 1, 2}


def test_3_point_output_points_line():
    pts = convex_hull_as_points(_buf([[0, 0, 0], [1, 0, 0], [2, 0, 0]]))
    assert set(pts) == {0, 2}


def test_4_point_output_point_in_triangle():
    pts = convex_hull_as_points(
        _buf([[0, 0, 0], [-1, -1, 0], [1, -1, 0], [0, 1, 0]]))
    assert set(pts) == {1, 2, 3}


def test_no_positions_error():
    schema = PointSchema.from_attributes([att.INTENSITY])
    buf = HostPointBuffer(
        schema, {att.INTENSITY.name: np.zeros(4, np.uint16)},
        validate=False)
    with pytest.raises((ValueError, KeyError)):
        convex_hull_as_points(buf)


# ---- planar squares (convexhull.rs:691-855, 939-1034) -----------------------

_SQUARE = [[-1, -1, 0], [1, -1, 0], [1, 1, 0], [-1, 1, 0]]


def test_plane_4_points():
    pos = np.asarray([[0, 0, 0], [0, 0, 1], [1, 0, 0], [1, 0, 1]],
                     np.float64)
    tris = convex_hull_as_triangle_mesh(_buf(pos))
    assert len(tris) == 2   # reference: 4 double-sided
    _assert_normals(pos, tris, [[0, 1, 0]])
    _assert_all_inside(pos, tris)


def test_2d_point_in_square():
    pos = np.asarray([[0, 0, 0]] + _SQUARE, np.float64)
    tris = convex_hull_as_triangle_mesh(_buf(pos))
    assert len(tris) == 2
    _assert_normals(pos, tris, [[0, 0, 1]])
    _assert_all_inside(pos, tris)
    assert set(convex_hull_as_points(_buf(pos))) == {1, 2, 3, 4}


@pytest.mark.parametrize("extra,nhull", [
    ([2.0, 0.0, 0.0], 5),   # next_to_square_1: reference 6 (=2*3) tris
    ([0.0, 2.0, 0.0], 5),   # next_to_square_2
    ([2.0, 2.0, 0.0], 4),   # next_to_square_3: absorbs corner, ref 4
    ([-2.0, 2.0, 0.0], 4),  # next_to_square_4
])
def test_2d_point_next_to_square(extra, nhull):
    pos = np.asarray(_SQUARE + [extra], np.float64)
    tris = convex_hull_as_triangle_mesh(_buf(pos))
    assert len(tris) == nhull - 2   # fan of the hull polygon
    _assert_normals(pos, tris, [[0, 0, 1]])
    _assert_all_inside(pos, tris)
    assert len(convex_hull_as_points(_buf(pos))) == nhull


@pytest.mark.parametrize("box_first", [True, False])
def test_random_1d_points_in_box(rng, box_first):
    inner = [[x, 0.0, 0.0] for x in rng.uniform(-0.9, 0.9, 20)]
    ends = [[-1, 0, 0], [1, 0, 0]]
    pos = ends + inner if box_first else inner + ends
    pts = set(convex_hull_as_points(_buf(pos)))
    assert pts == ({0, 1} if box_first else {20, 21})


@pytest.mark.parametrize("box_first", [True, False])
def test_random_2d_points_in_box(rng, box_first):
    inner = np.stack([rng.uniform(-0.9, 0.9, 20),
                      rng.uniform(-0.9, 0.9, 20),
                      np.zeros(20)], axis=1)
    pos = (np.concatenate([_SQUARE, inner]) if box_first
           else np.concatenate([inner, _SQUARE]))
    tris = convex_hull_as_triangle_mesh(_buf(pos))
    assert len(tris) == 2   # reference: 4 double-sided
    _assert_normals(pos, tris, [[0, 0, 1]])
    _assert_all_inside(pos, tris)
    corner0 = 0 if box_first else 20
    assert set(convex_hull_as_points(_buf(pos))) == set(
        range(corner0, corner0 + 4))


@pytest.mark.parametrize("inner", [
    [[0.5, 0.2, 0], [-0.5, -0.3, 0]],                     # case 1
    [[0.2, 0.1, 0], [-0.9, 0.3, 0]],                      # case 2
    [[-0.3, -0.3, 0], [0.9, -0.4, 0], [0.2, 0.1, 0]],     # case 3
])
def test_2d_points_in_box_create_box_last(inner):
    pos = np.asarray(inner + _SQUARE, np.float64)
    tris = convex_hull_as_triangle_mesh(_buf(pos))
    assert len(tris) == 2   # reference: 4
    _assert_normals(pos, tris, [[0, 0, 1]])
    _assert_all_inside(pos, tris)
    k = len(inner)
    assert set(convex_hull_as_points(_buf(pos))) == {k, k + 1, k + 2,
                                                     k + 3}


# ---- 3-D boxes + random clouds (convexhull.rs:1035-1163) --------------------

_CUBE = [[x, y, z] for x in (-1.0, 1.0) for y in (-1.0, 1.0)
         for z in (-1.0, 1.0)]
_AXES = [[1, 0, 0], [0, 1, 0], [0, 0, 1], [-1, 0, 0], [0, -1, 0],
         [0, 0, -1]]


@pytest.mark.parametrize("box_first", [True, False])
def test_random_points_in_box_3d(rng, box_first):
    inner = rng.uniform(-0.9, 0.9, (20, 3))
    pos = (np.concatenate([_CUBE, inner]) if box_first
           else np.concatenate([inner, _CUBE]))
    tris = convex_hull_as_triangle_mesh(_buf(pos))
    assert len(tris) == 12
    _assert_normals(pos, tris, _AXES)
    _assert_all_inside(pos, tris)


def test_random_points_large(rng):
    pos = rng.uniform(-100.0, 100.0, (100, 3))
    tris = convex_hull_as_triangle_mesh(_buf(pos))
    _assert_all_inside(pos, tris)
    verts = set(np.asarray(tris).ravel())
    assert len(verts) == len(tris) // 2 + 2   # Euler for triangulated hull


def test_duplicate_heavy_cloud(rng):
    """Beyond the reference: many exact duplicates must not break the
    incremental construction."""
    base = rng.normal(size=(40, 3))
    pos = np.concatenate([base, base, base])
    tris = convex_hull_as_triangle_mesh(_buf(pos))
    _assert_all_inside(pos, tris)


def test_sphere_surface(rng):
    """Beyond the reference: all points extreme (on a sphere) — every
    input point is a hull vertex, Euler characteristic holds."""
    v = rng.normal(size=(60, 3))
    pos = v / np.linalg.norm(v, axis=1, keepdims=True)
    tris = convex_hull_as_triangle_mesh(_buf(pos))
    _assert_all_inside(pos, tris)
    verts = set(np.asarray(tris).ravel())
    assert verts == set(range(60))
    assert len(tris) == 2 * 60 - 4
