"""Generate PROJ golden fixtures for the builtin reprojection engine.

Runs the system ``cs2cs`` (PROJ 9.x) over a set of in-domain test points for
every CRS pair the builtin engine claims to support, and records the results
as JSON.  The fixtures are checked in so the tests do NOT need PROJ at test
time; re-run this script only to regenerate (requires cs2cs on PATH).

Parity target: reference reprojection.rs:10-170 delegates all of this to
libproj; our builtin engine re-implements the EPSG methods and must agree
with PROJ to <1 mm on projection math.  For datum-shifted pairs the golden
run pins the Helmert pipeline via +towgs84 so the comparison is
grid-independent (PROJ would otherwise prefer NTv2 grids when installed,
which is a different — more accurate — transformation, not an error in
either implementation).
"""

import json
import pathlib
import subprocess

HERE = pathlib.Path(__file__).resolve().parent

# (name, src CRS, dst CRS, tolerance_m, [(lon, lat, h), ...])
# CRS strings are exactly what both cs2cs and pasture_tpu.Projection receive.
CASES = [
    ("wgs84_to_utm32n", "EPSG:4326", "EPSG:32632", 1e-4,
     [(9.0, 48.0, 100.0), (6.1, 52.9, 0.0), (11.9, 37.2, -30.0)]),
    ("wgs84_to_utm19s", "EPSG:4326", "EPSG:32719", 1e-4,
     [(-70.6, -33.4, 520.0), (-68.2, -54.8, 0.0)]),
    ("etrs89_to_utm32n_etrs", "EPSG:4258", "EPSG:25832", 1e-4,
     [(8.4, 49.0, 120.0), (10.0, 53.55, 6.0)]),
    ("nad83_to_utm17n", "EPSG:4269", "EPSG:26917", 1e-4,
     [(-79.4, 43.7, 76.0), (-81.7, 41.5, 200.0)]),
    ("wgs84_to_lambert93", "EPSG:4326", "EPSG:2154", 1e-4,
     [(2.3522, 48.8566, 35.0), (5.37, 43.3, 0.0), (-1.55, 47.22, 20.0)]),
    ("wgs84_to_maryland_lcc", "EPSG:4326", "EPSG:26985", 1e-4,
     [(-76.61, 39.29, 10.0), (-77.04, 38.9, 20.0)]),
    ("wgs84_to_laea_europe", "EPSG:4326", "EPSG:3035", 1e-4,
     [(10.0, 52.0, 0.0), (24.9, 60.2, 15.0), (-3.7, 40.4, 650.0)]),
    ("wgs84_to_conus_albers", "EPSG:4326", "EPSG:5070", 1e-4,
     [(-96.0, 23.0, 0.0), (-122.33, 47.6, 50.0), (-74.0, 40.7, 10.0)]),
    ("wgs84_to_nsidc_north", "EPSG:4326", "EPSG:3413", 1e-4,
     [(-45.0, 70.0, 0.0), (10.0, 78.9, 450.0), (-156.8, 71.3, 5.0)]),
    ("wgs84_to_antarctic_south", "EPSG:4326", "EPSG:3031", 1e-4,
     [(0.0, -71.0, 0.0), (166.67, -77.85, 30.0)]),
    ("wgs84_to_ups_north", "EPSG:4326", "EPSG:32661", 1e-4,
     [(30.0, 85.0, 0.0), (-120.0, 88.5, 100.0)]),
    ("wgs84_to_nztm2000", "EPSG:4326", "EPSG:2193", 1e-4,
     [(174.78, -41.29, 0.0), (172.64, -43.53, 8.0)]),
    ("wgs84_to_webmerc", "EPSG:4326", "EPSG:3857", 1e-4,
     [(0.0, 0.0, 0.0), (139.69, 35.68, 40.0), (-58.38, -34.6, 25.0)]),
    ("wgs84_to_ecef", "EPSG:4326", "EPSG:4978", 1e-4,
     [(9.0, 48.0, 250.0), (-70.6, -33.4, 520.0)]),
    # Datum-shifted pairs: pin the builtin engine's published Helmert
    # parameters on BOTH sides so golden == the same 7-param path
    # (EPSG:1314 for OSGB36, EPSG:15934 for RD/Amersfoort, BD72's 15929).
    ("osgb36_bng_helmert",
     "+proj=longlat +datum=WGS84 +no_defs",
     "+proj=tmerc +lat_0=49 +lon_0=-2 +k=0.9996012717 +x_0=400000 "
     "+y_0=-100000 +ellps=airy "
     "+towgs84=446.448,-125.157,542.06,0.15,0.247,0.842,-20.489 +no_defs",
     1e-3,
     [(-0.1276, 51.5074, 11.0), (-3.19, 55.95, 47.0), (-5.93, 54.6, 10.0)]),
    ("rd_new_helmert",
     "+proj=longlat +datum=WGS84 +no_defs",
     "+proj=sterea +lat_0=52.15616055555555 +lon_0=5.38763888888889 "
     "+k=0.9999079 +x_0=155000 +y_0=463000 +ellps=bessel "
     "+towgs84=565.417,50.3319,465.552,-0.398957,0.343988,-1.8774,4.0725 "
     "+no_defs",
     1e-3,
     [(4.9, 52.37, 0.0), (5.12, 52.09, 2.0), (6.57, 53.22, 5.0)]),
    ("belgian_lambert72_helmert",
     "+proj=longlat +datum=WGS84 +no_defs",
     "+proj=lcc +lat_0=90 +lon_0=4.367486666666666 +lat_1=51.16666723333333 "
     "+lat_2=49.8333339 +x_0=150000.013 +y_0=5400088.438 +ellps=intl "
     "+towgs84=-106.8686,52.2978,-103.7239,0.3366,-0.457,1.8422,-1.2747 "
     "+no_defs",
     1e-3,
     [(4.35, 50.85, 13.0), (3.72, 51.05, 8.0), (5.57, 50.63, 70.0)]),
    # Inverse-direction pair (projected -> geographic); tolerance in degrees.
    ("lambert93_to_wgs84", "EPSG:2154", "EPSG:4326", 1e-9,
     [(652469.02, 6862035.26, 35.0), (892390.22, 6247035.73, 0.0)]),
    # projected -> projected crossing a datum shift
    ("bng_to_utm30n_helmert",
     "+proj=tmerc +lat_0=49 +lon_0=-2 +k=0.9996012717 +x_0=400000 "
     "+y_0=-100000 +ellps=airy "
     "+towgs84=446.448,-125.157,542.06,0.15,0.247,0.842,-20.489 +no_defs",
     "+proj=utm +zone=30 +datum=WGS84 +no_defs",
     1e-3,
     [(530047.0, 180422.0, 11.0), (325561.0, 673617.0, 47.0)]),
]


# cs2cs honors the authority axis order: geographic EPSG CRSs are
# (lat, lon) and some projected CRSs are (northing, easting), while
# pasture_tpu is always GIS (x=east, y=north) — swap at the cs2cs
# boundary.  +proj strings are always lon/lat (east/north) in cs2cs.
_LATLON_EPSG = {"EPSG:4326", "EPSG:4258", "EPSG:4269"}
_NORTH_FIRST_EPSG = {"EPSG:2193", "EPSG:3035", "EPSG:32661", "EPSG:32761"}
_SWAPPED = _LATLON_EPSG | _NORTH_FIRST_EPSG


def cs2cs(src: str, dst: str, pts):
    if src in _SWAPPED:
        pts = [(y, x, z) for x, y, z in pts]
    inp = "\n".join(f"{x!r} {y!r} {z!r}" for x, y, z in pts)
    out = subprocess.run(
        ["cs2cs", "-f", "%.10f", src, "+to", dst],
        input=inp, capture_output=True, text=True, check=True)
    res = []
    for line in out.stdout.strip().splitlines():
        vals = line.split()
        xyz = [float(vals[0]), float(vals[1]), float(vals[2])]
        if dst in _SWAPPED:
            xyz = [xyz[1], xyz[0], xyz[2]]
        res.append(xyz)
    return res


def main():
    fixtures = []
    for name, src, dst, tol, pts in CASES:
        expected = cs2cs(src, dst, pts)
        fixtures.append({
            "name": name, "src": src, "dst": dst, "tol": tol,
            "points": [list(p) for p in pts], "expected": expected,
        })
        print(f"{name}: {len(pts)} points")
    path = HERE / "reprojection_golden.json"
    path.write_text(json.dumps(fixtures, indent=1))
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
