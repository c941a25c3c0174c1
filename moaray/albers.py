"""Albers Equal Area Conic (ellipsoidal, 2SP), from scratch.

Per the published public formulation (Snyder, USGS PP 1395, 14-1..14-21;
EPSG Guidance Note 7-2 method 9822). The projection behind the US CONUS
grid (Landsat ARD / NLCD, EPSG:5070) and the Australian national grid
(EPSG:3577). Unlike TM/LCC/stereographic it is EQUAL-AREA, not conformal
— the Jacobian determinant of the forward map is exactly 1 everywhere,
which the tests exploit as a definitional oracle.

Supported CRS names (tmerc._geodetic_system routes recognized pairs):
- ``EPSG:5070`` — NAD83 / CONUS Albers (lat1=29.5, lat2=45.5, lat0=23,
  lon0=-96).
- ``EPSG:3577`` — GDA94 / Australian Albers (lat1=-18, lat2=-36, lat0=0,
  lon0=132).
- ``ALBERS:lat1,lat2,lat0,lon0[,fe,fn]`` — parametric WGS84 form.

GRS80 (NAD83/GDA94) vs WGS84 flattening differs at the 1e-10 level —
treated as identical, as for the LCC grids (moaray/lcc.py).
"""

from __future__ import annotations

import numpy as np

from . import geodesy
from .lcc import _E, _m

_A = geodesy.WGS84.a
_E2 = float(_E) ** 2


def _q(phi: np.ndarray, e: float = _E) -> np.ndarray:
    """Snyder 3-12: the equal-area latitude kernel q(phi)."""
    s = np.sin(phi)
    e2 = e * e
    return (1.0 - e2) * (
        s / (1.0 - e2 * s * s)
        - (1.0 / (2.0 * e)) * np.log((1.0 - e * s) / (1.0 + e * s))
    )


class AlbersParams:
    __slots__ = ("lat1", "lat2", "lat0", "lon0", "fe", "fn",
                 "n", "big_c", "rho0", "datum", "a", "e", "e2")

    def __init__(self, lat1: float, lat2: float, lat0: float, lon0: float,
                 fe: float = 0.0, fn: float = 0.0,
                 datum: "geodesy.Datum" = geodesy.WGS84_DATUM):
        self.lat1, self.lat2 = lat1, lat2
        self.lat0, self.lon0 = lat0, lon0
        self.fe, self.fn = fe, fn
        self.datum = datum
        self.a = datum.ellipsoid.a
        self.e = datum.ellipsoid.e
        self.e2 = datum.ellipsoid.e2
        p1, p2, p0 = np.deg2rad([lat1, lat2, lat0])
        m1, m2 = float(_m(p1, self.e)), float(_m(p2, self.e))
        q1 = float(_q(p1, self.e))
        q2 = float(_q(p2, self.e))
        q0 = float(_q(p0, self.e))
        if abs(lat1 - lat2) > 1e-12:
            self.n = (m1 * m1 - m2 * m2) / (q2 - q1)  # Snyder 14-14
        else:
            self.n = float(np.sin(p1))
        self.big_c = m1 * m1 + self.n * q1  # Snyder 14-13
        self.rho0 = self.a * np.sqrt(self.big_c - self.n * q0) / self.n


def albers_forward(
    lat_deg: np.ndarray, lon_deg: np.ndarray, p: AlbersParams
) -> tuple[np.ndarray, np.ndarray]:
    """Snyder 14-1..14-4: E = FE + rho sin(theta),
    N = FN + rho0 - rho cos(theta), rho = a sqrt(C - n q)/n,
    theta = n (lambda - lambda0)."""
    phi = np.deg2rad(np.asarray(lat_deg, dtype=np.float64))
    dlon = (np.asarray(lon_deg, dtype=np.float64) - p.lon0 + 180.0) % 360.0 - 180.0
    theta = p.n * np.deg2rad(dlon)
    rho = p.a * np.sqrt(np.maximum(p.big_c - p.n * _q(phi, p.e), 0.0)) / p.n
    return (
        p.fe + rho * np.sin(theta),
        p.fn + p.rho0 - rho * np.cos(theta),
    )


def albers_inverse(
    easting: np.ndarray, northing: np.ndarray, p: AlbersParams
) -> tuple[np.ndarray, np.ndarray]:
    """Snyder 14-10/14-11 with the 3-8 fixed-point iteration for the
    geodetic latitude."""
    x = np.asarray(easting, dtype=np.float64) - p.fe
    y = p.rho0 - (np.asarray(northing, dtype=np.float64) - p.fn)
    sign = 1.0 if p.n >= 0 else -1.0
    rho = sign * np.sqrt(x * x + y * y)
    theta = np.arctan2(sign * x, sign * y)
    qp = (p.big_c - (rho * p.n / p.a) ** 2) / p.n
    # spherical start, then Snyder 3-16 iteration
    phi = np.arcsin(np.clip(qp / 2.0, -1.0, 1.0))
    for _ in range(10):
        s = np.sin(phi)
        den = 1.0 - p.e2 * s * s
        corr = (den ** 2 / (2.0 * np.cos(phi))) * (
            qp / (1.0 - p.e2)
            - s / den
            + (1.0 / (2.0 * p.e)) * np.log((1.0 - p.e * s) / (1.0 + p.e * s))
        )
        phi = phi + corr
    lat = np.rad2deg(phi)
    lon = p.lon0 + np.rad2deg(theta / p.n)
    lon = (lon + 180.0) % 360.0 - 180.0
    return lat, lon


_EPSG_ALBERS = {
    # NAD83 / CONUS Albers and GDA94 / Australian Albers (both GRS80)
    5070: AlbersParams(29.5, 45.5, 23.0, -96.0, 0.0, 0.0,
                       geodesy.NAD83_DATUM),
    3577: AlbersParams(-18.0, -36.0, 0.0, 132.0, 0.0, 0.0,
                       geodesy.GDA94_DATUM),
}


def parse_albers(crs: str) -> AlbersParams | None:
    """AlbersParams for a recognized Albers CRS name, else None."""
    if crs.startswith("ALBERS:"):
        parts = [v.strip() for v in crs[len("ALBERS:"):].split(",")]
        if len(parts) not in (4, 6, 7):
            raise ValueError(
                f"bad ALBERS crs {crs!r}: need lat1,lat2,lat0,lon0"
                "[,fe,fn[,DATUM]]"
            )
        datum = geodesy.WGS84_DATUM
        if len(parts) == 7:
            dname = parts[6].upper()
            if dname not in geodesy.DATUMS:
                raise ValueError(f"unknown datum {dname!r} in {crs!r}")
            datum = geodesy.DATUMS[dname]
            parts = parts[:6]
        return AlbersParams(*[float(v) for v in parts], datum=datum)
    if crs.startswith("EPSG:") and crs[5:].isdigit():
        return _EPSG_ALBERS.get(int(crs[5:]))
    return None
