"""CRS reprojection (parity: pasture-algorithms/src/reprojection.rs:10-170).

The reference binds the C PROJ library via ``proj-sys`` FFI and transforms
one point per call.  This build ships a self-contained, vectorised geodesy
engine instead (PROJ is not available in the image): transforms route
src -> geodetic (WGS84 lon/lat) -> dst, with closed-form conversions

* geographic      EPSG:4326 / ``+proj=longlat``  (lon, lat, h in degrees/m)
* geocentric      EPSG:4978 / ``+proj=geocent`` (ECEF)
* web mercator    EPSG:3857 / ``+proj=webmerc`` (spherical)
* UTM             EPSG:326zz / 327zz / ``+proj=utm +zone=Z [+south]``
* transverse mercator  ``+proj=tmerc +lon_0 +lat_0 +k +x_0 +y_0``

using the Karney/Krüger series (4th order in n — sub-mm for UTM extents).
All math is f64 numpy on host; whole columns transform in one call (the
reference loops ``proj_trans`` per point, reprojection.rs:38-47).
"""

from __future__ import annotations

import re
from typing import Tuple, Union

import numpy as np

from ..buffers.device import PointBatch
from ..buffers.host import HostPointBuffer
from ..layout import attributes as att
from ..math.aabb import AABB

__all__ = ["Projection", "reproject_point_cloud_within",
           "reproject_point_cloud_between"]

_A = 6378137.0                       # WGS84 semi-major
_F = 1.0 / 298.257223563
_E2 = _F * (2.0 - _F)
_E = np.sqrt(_E2)
_N = _F / (2.0 - _F)
_K0 = 0.9996

# Krüger series coefficients (4th order in n)
_A_BAR = _A / (1 + _N) * (1 + _N**2 / 4 + _N**4 / 64)
_ALPHA = (
    _N / 2 - 2 * _N**2 / 3 + 5 * _N**3 / 16 + 41 * _N**4 / 180,
    13 * _N**2 / 48 - 3 * _N**3 / 5 + 557 * _N**4 / 1440,
    61 * _N**3 / 240 - 103 * _N**4 / 140,
    49561 * _N**4 / 161280,
)
_BETA = (
    _N / 2 - 2 * _N**2 / 3 + 37 * _N**3 / 96 - _N**4 / 360,
    _N**2 / 48 + _N**3 / 15 - 437 * _N**4 / 1440,
    17 * _N**3 / 480 - 37 * _N**4 / 840,
    4397 * _N**4 / 161280,
)
_DELTA = (
    2 * _N - 2 * _N**2 / 3 - 2 * _N**3,
    7 * _N**2 / 3 - 8 * _N**3 / 5,
    56 * _N**3 / 15,
)


def _tm_forward(lon, lat, lon0, k0=_K0, fe=500000.0, fn=0.0):
    lam = np.radians(lon) - np.radians(lon0)
    phi = np.radians(lat)
    s = np.sin(phi)
    t = np.sinh(np.arctanh(s) - _E * np.arctanh(_E * s))
    xi = np.arctan2(t, np.cos(lam))
    eta = np.arcsinh(np.sin(lam) / np.sqrt(t * t + np.cos(lam) ** 2))
    xs, es = xi.copy(), eta.copy()
    for j, a in enumerate(_ALPHA, start=1):
        xs = xs + a * np.sin(2 * j * xi) * np.cosh(2 * j * eta)
        es = es + a * np.cos(2 * j * xi) * np.sinh(2 * j * eta)
    return fe + k0 * _A_BAR * es, fn + k0 * _A_BAR * xs


def _tm_inverse(e_, n_, lon0, k0=_K0, fe=500000.0, fn=0.0):
    xi = (n_ - fn) / (k0 * _A_BAR)
    eta = (e_ - fe) / (k0 * _A_BAR)
    xs, es = xi.copy(), eta.copy()
    for j, b in enumerate(_BETA, start=1):
        xs = xs - b * np.sin(2 * j * xi) * np.cosh(2 * j * eta)
        es = es - b * np.cos(2 * j * xi) * np.sinh(2 * j * eta)
    chi = np.arcsin(np.sin(xs) / np.cosh(es))
    phi = chi.copy()
    for j, d in enumerate(_DELTA, start=1):
        phi = phi + d * np.sin(2 * j * chi)
    lam = np.arctan2(np.sinh(es), np.cos(xs))
    return np.degrees(lam) + lon0, np.degrees(phi)


def _geodetic_to_ecef(lon, lat, h):
    phi, lam = np.radians(lat), np.radians(lon)
    n = _A / np.sqrt(1 - _E2 * np.sin(phi) ** 2)
    x = (n + h) * np.cos(phi) * np.cos(lam)
    y = (n + h) * np.cos(phi) * np.sin(lam)
    z = (n * (1 - _E2) + h) * np.sin(phi)
    return x, y, z


def _ecef_to_geodetic(x, y, z):
    # Bowring's method, one iteration refined
    lam = np.arctan2(y, x)
    p = np.hypot(x, y)
    b = _A * (1 - _F)
    e2p = (_A**2 - b**2) / b**2
    theta = np.arctan2(z * _A, p * b)
    phi = np.arctan2(z + e2p * b * np.sin(theta) ** 3,
                     p - _E2 * _A * np.cos(theta) ** 3)
    for _ in range(2):
        n = _A / np.sqrt(1 - _E2 * np.sin(phi) ** 2)
        h = p / np.cos(phi) - n
        phi = np.arctan2(z, p * (1 - _E2 * n / (n + h)))
    n = _A / np.sqrt(1 - _E2 * np.sin(phi) ** 2)
    h = p / np.cos(phi) - n
    return np.degrees(lam), np.degrees(phi), h


class _Crs:
    """Parsed CRS: kind + parameters."""

    def __init__(self, text: str) -> None:
        self.text = text
        t = text.strip()
        m = re.fullmatch(r"(?i)epsg:\s*(\d+)", t)
        if m:
            code = int(m.group(1))
            if code == 4326:
                self.kind = "longlat"
            elif code == 4978:
                self.kind = "geocent"
            elif code == 3857:
                self.kind = "webmerc"
            elif 32601 <= code <= 32660:
                self.kind, self.zone, self.south = "utm", code - 32600, False
            elif 32701 <= code <= 32760:
                self.kind, self.zone, self.south = "utm", code - 32700, True
            else:
                raise ValueError(
                    f"unsupported EPSG code {code} (supported: 4326, 4978, "
                    f"3857, UTM 326xx/327xx; or a +proj= string)")
            return
        if t.startswith("+"):
            kv = dict()
            for tok in t.split():
                if "=" in tok:
                    k, v = tok[1:].split("=", 1)
                    kv[k] = v
                else:
                    kv[tok[1:]] = True
            proj = kv.get("proj")
            if proj in ("longlat", "latlong", "lonlat"):
                self.kind = "longlat"
            elif proj == "geocent":
                self.kind = "geocent"
            elif proj in ("webmerc", "merc"):
                self.kind = "webmerc"
            elif proj == "utm":
                self.kind = "utm"
                self.zone = int(kv["zone"])
                self.south = bool(kv.get("south", False))
            elif proj == "tmerc":
                self.kind = "tmerc"
                self.lon0 = float(kv.get("lon_0", 0.0))
                self.k0 = float(kv.get("k", _K0))
                self.fe = float(kv.get("x_0", 0.0))
                self.fn = float(kv.get("y_0", 0.0))
            else:
                raise ValueError(f"unsupported +proj={proj!r}")
            return
        raise ValueError(f"cannot parse CRS {text!r}")

    # ---- to geodetic (lon, lat, h) --------------------------------------------
    def to_geodetic(self, xyz: np.ndarray) -> np.ndarray:
        x, y, z = xyz[:, 0], xyz[:, 1], xyz[:, 2]
        if self.kind == "longlat":
            return xyz
        if self.kind == "geocent":
            lon, lat, h = _ecef_to_geodetic(x, y, z)
        elif self.kind == "webmerc":
            lon = np.degrees(x / _A)
            lat = np.degrees(2 * np.arctan(np.exp(y / _A)) - np.pi / 2)
            h = z
        elif self.kind == "utm":
            lon0 = self.zone * 6.0 - 183.0
            fn = 10000000.0 if self.south else 0.0
            lon, lat = _tm_inverse(x, y, lon0, fn=fn)
            h = z
        else:  # tmerc
            lon, lat = _tm_inverse(x, y, self.lon0, self.k0, self.fe, self.fn)
            h = z
        return np.stack([lon, lat, h], axis=1)

    def from_geodetic(self, llh: np.ndarray) -> np.ndarray:
        lon, lat, h = llh[:, 0], llh[:, 1], llh[:, 2]
        if self.kind == "longlat":
            return llh
        if self.kind == "geocent":
            x, y, z = _geodetic_to_ecef(lon, lat, h)
        elif self.kind == "webmerc":
            x = _A * np.radians(lon)
            y = _A * np.log(np.tan(np.pi / 4 + np.radians(lat) / 2))
            z = h
        elif self.kind == "utm":
            lon0 = self.zone * 6.0 - 183.0
            fn = 10000000.0 if self.south else 0.0
            x, y = _tm_forward(lon, lat, lon0, fn=fn)
            z = h
        else:
            x, y = _tm_forward(lon, lat, self.lon0, self.k0, self.fe, self.fn)
            z = h
        return np.stack([x, y, z], axis=1)


class Projection:
    """src->dst coordinate transform (reference Projection::new,
    reprojection.rs:16-47)."""

    def __init__(self, source_crs: str, target_crs: str) -> None:
        self.source = _Crs(source_crs)
        self.target = _Crs(target_crs)

    def transform(self, position: np.ndarray) -> np.ndarray:
        """Transform one point (3,) or a column (N, 3)."""
        p = np.asarray(position, np.float64)
        single = p.ndim == 1
        p = p.reshape(-1, 3)
        out = self.target.from_geodetic(self.source.to_geodetic(p))
        return out[0] if single else out

    def transform_bounds(self, bounds: AABB) -> AABB:
        """Transform min/max corners, keeping the box axis-aligned
        (reference reprojection.rs:49-60)."""
        corners = self.transform(np.stack([bounds.min, bounds.max]))
        return AABB.from_min_max_unchecked(corners.min(axis=0),
                                           corners.max(axis=0))


def reproject_point_cloud_within(
        buffer: Union[HostPointBuffer, PointBatch],
        source_crs: str, target_crs: str) -> None:
    """In-place reprojection of Position3D (reference
    reprojection.rs:132-199)."""
    proj = Projection(source_crs, target_crs)
    if isinstance(buffer, PointBatch):
        import jax.numpy as jnp
        pos = np.asarray(buffer.data[att.POSITION_3D.name], np.float64)
        out = proj.transform(pos)
        buffer.data[att.POSITION_3D.name] = jnp.asarray(
            out.astype(np.asarray(buffer.data[att.POSITION_3D.name]).dtype))
        return
    m = buffer.schema.member(att.POSITION_3D.name)
    out = proj.transform(buffer.get_converted(att.POSITION_3D))
    buffer.set(att.POSITION_3D.name,
               out.astype(m.dtype.np_component_dtype))


def reproject_point_cloud_between(
        source: HostPointBuffer, target: HostPointBuffer,
        source_crs: str, target_crs: str) -> None:
    """src buffer -> dst buffer reprojection (reference
    reprojection.rs:201-260); buffers must have equal point counts."""
    if len(source) != len(target):
        raise ValueError(
            "target buffer must have the same number of points as the "
            "source buffer")
    proj = Projection(source_crs, target_crs)
    out = proj.transform(source.get_converted(att.POSITION_3D))
    m = target.schema.member(att.POSITION_3D.name)
    target.set(att.POSITION_3D.name, out.astype(m.dtype.np_component_dtype))
