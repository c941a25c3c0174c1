"""Mercator family + Sinusoidal, from scratch (no pyproj/GDAL in sandbox).

Closes the remaining high-demand slice of the reference's arbitrary-SRS
warp path (moamosaic warps via gdal.Warp between any EPSG SRSs, ref
/root/reference/moamosaic/reproj.py:194-216):

- ``EPSG:3857`` — WGS 84 / Pseudo-Mercator ("Web Mercator", EPSG method
  1024): the web-tile CRS behind every slippy-map basemap. Spherical
  formulas on R = a = 6378137 applied to the GEODETIC latitude (that
  deliberate sphere-on-ellipsoid mismatch is the method's definition —
  it is conformal nowhere, which is why EPSG gives it its own method
  code). Published EPSG Guidance Note 7-2 §1.3.3.2 test point:
  lat 24°22'54.433"N, lon 100°20'00.000"W ->
  E = -11169055.58 m, N = 2800000.00 m.
- ``EPSG:3395`` — WGS 84 / World Mercator (EPSG method 9804 variant A,
  k0=1): the true ellipsoidal Mercator. N = a * psi(phi) where psi is the
  isometric latitude; shares the _t() helper form with moaray/lcc.py
  (Snyder 15-9: psi = -ln t). Cross-checked in tests against
  moaray/tmerc.py's independent conformal-latitude chain
  (y = a*arcsinh(tau') on the central meridian).
- ``MERC:lat_ts[,lon0[,fe,fn]]`` — parametric ellipsoidal Mercator
  variant B (EPSG method 9805): standard parallel lat_ts sets the
  effective scale k0 = m(lat_ts) (Snyder 14-15), degrees/metres.
- ``SINU:lon0[,R]`` — spherical Sinusoidal (Snyder pp. 243-245), the
  MODIS land-grid projection. R defaults to 6371007.181 m (the MODIS
  authalic sphere); the global half-width pi*R = 20015109.354 m is the
  published MODIS grid constant used as the test anchor.

All functions are vectorized numpy — the warp kernel evaluates them on
full per-window coordinate grids (stages/reproject.py).
"""

from __future__ import annotations

import numpy as np

# WGS84 ellipsoid (shared with moaray/tmerc.py / moaray/lcc.py)
_A = 6378137.0
_F = 1.0 / 298.257223563
_E = np.sqrt(_F * (2.0 - _F))  # first eccentricity

#: MODIS authalic sphere radius (metres)
MODIS_R = 6371007.181


# ---------------------------------------------------------------- Web Mercator

def webmerc_forward(
    lat_deg: np.ndarray, lon_deg: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """(easting, northing) for EPSG:3857. Sphere R=a on geodetic latitude."""
    phi = np.deg2rad(np.asarray(lat_deg, dtype=np.float64))
    dlon = (np.asarray(lon_deg, dtype=np.float64) + 180.0) % 360.0 - 180.0
    lam = np.deg2rad(dlon)
    return _A * lam, _A * np.log(np.tan(np.pi / 4.0 + phi / 2.0))


def webmerc_inverse(
    easting: np.ndarray, northing: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """(lat_deg, lon_deg) for EPSG:3857."""
    x = np.asarray(easting, dtype=np.float64)
    y = np.asarray(northing, dtype=np.float64)
    lat = np.rad2deg(np.pi / 2.0 - 2.0 * np.arctan(np.exp(-y / _A)))
    lon = np.rad2deg(x / _A)
    return lat, lon


# ------------------------------------------------------- ellipsoidal Mercator

def _m(phi: float) -> float:
    """Snyder 14-15 particular-scale factor (same as lcc._m)."""
    s = np.sin(phi)
    return float(np.cos(phi) / np.sqrt(1.0 - (_E * s) ** 2))


class MercParams:
    """Precomputed constants for one ellipsoidal-Mercator definition."""

    __slots__ = ("k0", "lon0", "fe", "fn")

    def __init__(self, k0: float = 1.0, lon0: float = 0.0,
                 fe: float = 0.0, fn: float = 0.0):
        self.k0, self.lon0, self.fe, self.fn = k0, lon0, fe, fn


def merc_forward(
    lat_deg: np.ndarray, lon_deg: np.ndarray, p: MercParams
) -> tuple[np.ndarray, np.ndarray]:
    """(easting, northing), Snyder 7-7/7-8: E = a k0 dlam,
    N = a k0 psi with isometric latitude
    psi = ln(tan(pi/4 + phi/2) ((1 - e sin phi)/(1 + e sin phi))^(e/2))."""
    phi = np.deg2rad(np.asarray(lat_deg, dtype=np.float64))
    dlon = (np.asarray(lon_deg, dtype=np.float64) - p.lon0 + 180.0) % 360.0 - 180.0
    lam = np.deg2rad(dlon)
    s = _E * np.sin(phi)
    psi = np.log(np.tan(np.pi / 4.0 + phi / 2.0)) + (_E / 2.0) * np.log(
        (1.0 - s) / (1.0 + s)
    )
    return p.fe + _A * p.k0 * lam, p.fn + _A * p.k0 * psi


def merc_inverse(
    easting: np.ndarray, northing: np.ndarray, p: MercParams
) -> tuple[np.ndarray, np.ndarray]:
    """(lat_deg, lon_deg); the latitude solves the isometric-latitude fixed
    point phi = pi/2 - 2 atan(t ((1-e sin phi)/(1+e sin phi))^(e/2)) with
    t = exp(-psi) (Snyder 7-9/7-10 iteration)."""
    x = np.asarray(easting, dtype=np.float64) - p.fe
    y = np.asarray(northing, dtype=np.float64) - p.fn
    t = np.exp(-y / (_A * p.k0))
    phi = np.pi / 2.0 - 2.0 * np.arctan(t)
    for _ in range(8):
        s = _E * np.sin(phi)
        phi = np.pi / 2.0 - 2.0 * np.arctan(
            t * ((1.0 - s) / (1.0 + s)) ** (_E / 2.0)
        )
    return np.rad2deg(phi), p.lon0 + np.rad2deg(x / (_A * p.k0))


# ---------------------------------------------------------------- Sinusoidal

class SinuParams:
    """Spherical Sinusoidal: central meridian + sphere radius."""

    __slots__ = ("lon0", "radius")

    def __init__(self, lon0: float = 0.0, radius: float = MODIS_R):
        self.lon0, self.radius = lon0, radius


def sinu_forward(
    lat_deg: np.ndarray, lon_deg: np.ndarray, p: SinuParams
) -> tuple[np.ndarray, np.ndarray]:
    """(x, y), Snyder 30-1/30-2: x = R dlam cos(phi), y = R phi."""
    phi = np.deg2rad(np.asarray(lat_deg, dtype=np.float64))
    dlon = (np.asarray(lon_deg, dtype=np.float64) - p.lon0 + 180.0) % 360.0 - 180.0
    lam = np.deg2rad(dlon)
    return p.radius * lam * np.cos(phi), p.radius * phi


def sinu_inverse(
    x: np.ndarray, y: np.ndarray, p: SinuParams
) -> tuple[np.ndarray, np.ndarray]:
    """(lat_deg, lon_deg), Snyder 30-6/30-7. At the poles cos(phi)=0 and the
    longitude is indeterminate — return the central meridian there."""
    phi = np.asarray(y, dtype=np.float64) / p.radius
    c = np.cos(phi)
    with np.errstate(divide="ignore", invalid="ignore"):
        dlam = np.where(
            np.abs(c) > 1e-12, np.asarray(x, dtype=np.float64) / (p.radius * c), 0.0
        )
    return np.rad2deg(phi), p.lon0 + np.rad2deg(dlam)


# ------------------------------------------------------------------- parsing

def parse_merc(crs: str):
    """('web', None) | ('ell', MercParams) | ('sinu', SinuParams) for a
    recognized Mercator/Sinusoidal CRS name, else None."""
    if crs == "EPSG:3857":
        return ("web", None)
    if crs == "EPSG:3395":
        return ("ell", MercParams())
    if crs.startswith("MERC:"):
        parts = crs[5:].split(",")
        if len(parts) not in (1, 2, 4):
            raise ValueError(
                f"bad MERC crs {crs!r}: need lat_ts[,lon0[,fe,fn]]"
            )
        vals = [float(v) for v in parts]
        k0 = _m(float(np.deg2rad(vals[0])))
        lon0 = vals[1] if len(vals) > 1 else 0.0
        fe, fn = (vals[2], vals[3]) if len(vals) == 4 else (0.0, 0.0)
        return ("ell", MercParams(k0, lon0, fe, fn))
    if crs.startswith("SINU:"):
        parts = crs[5:].split(",")
        if len(parts) not in (1, 2):
            raise ValueError(f"bad SINU crs {crs!r}: need lon0[,R]")
        lon0 = float(parts[0])
        radius = float(parts[1]) if len(parts) == 2 else MODIS_R
        return ("sinu", SinuParams(lon0, radius))
    return None


def merc_system(crs: str):
    """(to_geo, from_geo) closure pair for tmerc._geodetic_system routing,
    else None."""
    p = parse_merc(crs)
    if p is None:
        return None
    kind, params = p
    if kind == "web":
        return (
            lambda xs, ys: webmerc_inverse(xs, ys),
            lambda lat, lon: webmerc_forward(lat, lon),
        )
    if kind == "ell":
        return (
            lambda xs, ys: merc_inverse(xs, ys, params),
            lambda lat, lon: merc_forward(lat, lon, params),
        )
    return (
        lambda xs, ys: sinu_inverse(xs, ys, params),
        lambda lat, lon: sinu_forward(lat, lon, params),
    )
