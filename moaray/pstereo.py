"""Polar Stereographic (ellipsoidal), from scratch.

Variant A (scale factor at the pole — UPS) and Variant B (standard
parallel — the NSIDC/Antarctic grids) per the published public
formulation (Snyder, USGS PP 1395, 21-17..21-40; EPSG Guidance Note 7-2
methods 9810/9829). With moaray/tmerc.py (cylindrical) and moaray/lcc.py
(conic) this completes the three projection families behind essentially
every national/production grid the reference warps between via gdal.Warp
(ref /root/reference/moamosaic/reproj.py:194-216).

Supported CRS names (tmerc._geodetic_system routes recognized pairs):

- ``EPSG:32661`` / ``EPSG:32761`` — UPS North / South (k0=0.994,
  FE=FN=2000000, lon0=0).
- ``EPSG:3413`` — NSIDC Sea Ice Polar Stereographic North (lat_ts=70,
  lon0=-45); ``EPSG:3976`` — NSIDC South (lat_ts=-70, lon0=0);
  ``EPSG:3031`` — Antarctic Polar Stereographic (lat_ts=-71, lon0=0).
- ``PSTEREO:lat0,lat_ts,lon0[,fe,fn]`` — parametric: lat0 is +90 or -90
  (which pole), lat_ts the standard parallel (pass +-90 itself for a
  Variant-A k0=1 grid).

All functions are vectorized numpy.
"""

from __future__ import annotations

import numpy as np

from . import geodesy
from .lcc import _E, _m, _t

_A = geodesy.WGS84.a

# sqrt((1+e)^(1+e) (1-e)^(1-e)) — Snyder 21-39 denominator
_C = np.sqrt((1.0 + _E) ** (1.0 + _E) * (1.0 - _E) ** (1.0 - _E))


class PolarParams:
    """Precomputed constants for one polar-stereographic definition (on
    the datum's ellipsoid; Snyder's formulation is ellipsoid-generic)."""

    __slots__ = ("south", "lat_ts", "lon0", "fe", "fn", "k0",
                 "datum", "a", "e", "c")

    def __init__(self, lat0: float, lat_ts: float, lon0: float,
                 fe: float = 0.0, fn: float = 0.0, k0: float | None = None,
                 datum: "geodesy.Datum" = geodesy.WGS84_DATUM):
        if abs(lat0) != 90.0:
            raise ValueError(f"polar stereographic needs lat0=+-90, got {lat0}")
        self.south = lat0 < 0
        self.lat_ts, self.lon0 = lat_ts, lon0
        self.fe, self.fn = fe, fn
        self.datum = datum
        self.a = datum.ellipsoid.a
        self.e = datum.ellipsoid.e
        self.c = float(np.sqrt(
            (1.0 + self.e) ** (1.0 + self.e)
            * (1.0 - self.e) ** (1.0 - self.e)
        ))
        if k0 is not None:
            self.k0 = k0  # Variant A (UPS)
        else:
            ts = abs(lat_ts)
            if ts >= 90.0:
                self.k0 = 1.0
            else:
                p = np.deg2rad(ts)
                # Variant B: rho = a m_F t / t_F == 2 a k0 t / C
                self.k0 = (float(_m(p, self.e)) * self.c
                           / (2.0 * float(_t(p, self.e))))


def ps_forward(
    lat_deg: np.ndarray, lon_deg: np.ndarray, p: PolarParams
) -> tuple[np.ndarray, np.ndarray]:
    """(easting, northing) from geographic degrees.

    North aspect (Snyder 21-30/21-31): E = FE + rho sin(dlam),
    N = FN - rho cos(dlam). South aspect: t evaluates at -phi and the
    northing cosine flips sign (EPSG 9810 south case):
    N = FN + rho cos(dlam); the easting formula is identical."""
    lat = np.asarray(lat_deg, dtype=np.float64)
    lon = np.asarray(lon_deg, dtype=np.float64)
    phi = np.deg2rad(-lat if p.south else lat)
    dlam = np.deg2rad((lon - p.lon0 + 180.0) % 360.0 - 180.0)
    rho = 2.0 * p.a * p.k0 * _t(phi, p.e) / p.c
    if p.south:
        return p.fe + rho * np.sin(dlam), p.fn + rho * np.cos(dlam)
    return p.fe + rho * np.sin(dlam), p.fn - rho * np.cos(dlam)


def ps_inverse(
    easting: np.ndarray, northing: np.ndarray, p: PolarParams
) -> tuple[np.ndarray, np.ndarray]:
    """(lat_deg, lon_deg) from projected coordinates (Snyder 21-39/21-40
    with the geodetic-latitude fixed point shared with the LCC inverse)."""
    x = np.asarray(easting, dtype=np.float64) - p.fe
    y = np.asarray(northing, dtype=np.float64) - p.fn
    rho = np.sqrt(x * x + y * y)
    tp = rho * p.c / (2.0 * p.a * p.k0)
    phi = np.pi / 2.0 - 2.0 * np.arctan(tp)
    for _ in range(8):
        s = p.e * np.sin(phi)
        phi = np.pi / 2.0 - 2.0 * np.arctan(
            tp * ((1.0 - s) / (1.0 + s)) ** (p.e / 2.0)
        )
    lam = np.arctan2(x, y) if p.south else np.arctan2(x, -y)
    lat = np.rad2deg(phi)
    if p.south:
        lat = -lat
    lon = p.lon0 + np.rad2deg(lam)
    lon = (lon + 180.0) % 360.0 - 180.0
    return lat, lon


_EPSG_PS = {
    32661: PolarParams(90.0, 90.0, 0.0, 2000000.0, 2000000.0, k0=0.994),
    32761: PolarParams(-90.0, -90.0, 0.0, 2000000.0, 2000000.0, k0=0.994),
    3413: PolarParams(90.0, 70.0, -45.0, 0.0, 0.0),
    3976: PolarParams(-90.0, -70.0, 0.0, 0.0, 0.0),
    3031: PolarParams(-90.0, -71.0, 0.0, 0.0, 0.0),
}


def parse_pstereo(crs: str) -> PolarParams | None:
    """PolarParams for a recognized polar-stereographic CRS, else None."""
    if crs.startswith("PSTEREO:"):
        parts = [v.strip() for v in crs[len("PSTEREO:"):].split(",")]
        if len(parts) not in (3, 5, 6):
            raise ValueError(
                f"bad PSTEREO crs {crs!r}: need lat0,lat_ts,lon0"
                "[,fe,fn[,DATUM]]"
            )
        datum = geodesy.WGS84_DATUM
        if len(parts) == 6:
            dname = parts[5].upper()
            if dname not in geodesy.DATUMS:
                raise ValueError(f"unknown datum {dname!r} in {crs!r}")
            datum = geodesy.DATUMS[dname]
            parts = parts[:5]
        vals = [float(v) for v in parts]
        return PolarParams(*vals, datum=datum)
    if crs.startswith("EPSG:") and crs[5:].isdigit():
        return _EPSG_PS.get(int(crs[5:]))
    return None
