"""Lambert Conformal Conic (2SP), from scratch (no pyproj/GDAL in sandbox).

Ellipsoidal LCC with two standard parallels per the published public
formulation (Snyder, "Map Projections — A Working Manual", USGS PP 1395,
pp. 107-109; identical to EPSG Guidance Note 7-2 method 9802). This is the
projection family behind most national grids (Lambert-93, Canada Atlas,
US State Plane north-south states, ETRS89-LCC) — closing the reference's
arbitrary-SRS warp path (moamosaic warps via gdal.Warp between any EPSG
SRSs, ref /root/reference/moamosaic/reproj.py:194-216) for conic CRSs the
same way moaray/tmerc.py closed it for cylindrical ones.

Supported CRS names (crs.py/tmerc.py route recognized pairs here):

- ``LCC:lat1,lat2,lat0,lon0[,fe,fn]`` — parametric WGS84 LCC-2SP (degrees,
  metres; fe/fn default 0).
- ``EPSG:2154`` — RGF93 / Lambert-93 (France): lat1=49, lat2=44,
  lat0=46.5, lon0=3, FE=700000, FN=6600000.
- ``EPSG:3978`` — NAD83 / Canada Atlas Lambert: lat1=49, lat2=77,
  lat0=49, lon0=-95, FE=FN=0.

The GRS80 ellipsoid (RGF93/NAD83) differs from WGS84 only in flattening at
the 1e-10 level (sub-0.1 mm anywhere on Earth); the engine's single-datum
WGS84 model treats them as identical, as GDAL does for coordinate work at
these tolerances.

All functions are vectorized numpy — the warp kernel evaluates them on
full per-window coordinate grids.
"""

from __future__ import annotations

import numpy as np

from . import geodesy

# WGS84 constants (module defaults, kept for existing callers)
_A = geodesy.WGS84.a
_E = geodesy.WGS84.e


def _m(phi: np.ndarray, e: float = _E) -> np.ndarray:
    """Snyder 14-15: cos(phi) / sqrt(1 - e^2 sin^2 phi)."""
    s = np.sin(phi)
    return np.cos(phi) / np.sqrt(1.0 - (e * s) ** 2)


def _t(phi: np.ndarray, e: float = _E) -> np.ndarray:
    """Snyder 15-9: tan(pi/4 - phi/2) / ((1 - e sin phi)/(1 + e sin phi))^(e/2)."""
    s = np.sin(phi)
    return np.tan(np.pi / 4.0 - phi / 2.0) / (
        (1.0 - e * s) / (1.0 + e * s)
    ) ** (e / 2.0)


class LccParams:
    """Precomputed projection constants for one LCC-2SP definition (on the
    datum's ellipsoid — Snyder's formulation is ellipsoid-generic)."""

    __slots__ = ("lat1", "lat2", "lat0", "lon0", "fe", "fn",
                 "n", "big_f", "rho0", "datum", "a", "e")

    def __init__(self, lat1: float, lat2: float, lat0: float, lon0: float,
                 fe: float = 0.0, fn: float = 0.0,
                 datum: "geodesy.Datum" = geodesy.WGS84_DATUM):
        self.lat1, self.lat2 = lat1, lat2
        self.lat0, self.lon0 = lat0, lon0
        self.fe, self.fn = fe, fn
        self.datum = datum
        self.a = datum.ellipsoid.a
        self.e = datum.ellipsoid.e
        p1, p2, p0 = np.deg2rad([lat1, lat2, lat0])
        m1, m2 = float(_m(p1, self.e)), float(_m(p2, self.e))
        t1 = float(_t(p1, self.e))
        t2 = float(_t(p2, self.e))
        t0 = float(_t(p0, self.e))
        if abs(lat1 - lat2) > 1e-12:
            self.n = (np.log(m1) - np.log(m2)) / (np.log(t1) - np.log(t2))
        else:  # 1SP degeneracy: cone tangent at lat1
            self.n = float(np.sin(p1))
        self.big_f = m1 / (self.n * t1 ** self.n)
        self.rho0 = self.a * self.big_f * t0 ** self.n


def lcc_forward(
    lat_deg: np.ndarray, lon_deg: np.ndarray, p: LccParams
) -> tuple[np.ndarray, np.ndarray]:
    """(easting, northing) from geographic coordinates (degrees).
    Snyder 15-1/15-2: E = FE + rho sin(theta), N = FN + rho0 - rho cos(theta)
    with rho = a F t^n, theta = n (lambda - lambda0)."""
    phi = np.deg2rad(np.asarray(lat_deg, dtype=np.float64))
    # wrap the longitude difference into (-180, 180] so the cone seam
    # (opposite the central meridian) doesn't flip theta's sign
    dlon = (np.asarray(lon_deg, dtype=np.float64) - p.lon0 + 180.0) % 360.0 - 180.0
    theta = p.n * np.deg2rad(dlon)
    rho = p.a * p.big_f * _t(phi, p.e) ** p.n
    return (
        p.fe + rho * np.sin(theta),
        p.fn + p.rho0 - rho * np.cos(theta),
    )


def lcc_inverse(
    easting: np.ndarray, northing: np.ndarray, p: LccParams
) -> tuple[np.ndarray, np.ndarray]:
    """(lat_deg, lon_deg) from projected coordinates. Snyder 15-10/14-11
    with the fixed-point iteration for the geodetic latitude."""
    x = np.asarray(easting, dtype=np.float64) - p.fe
    y = p.rho0 - (np.asarray(northing, dtype=np.float64) - p.fn)
    sign = 1.0 if p.n >= 0 else -1.0
    rho = sign * np.sqrt(x * x + y * y)
    theta = np.arctan2(sign * x, sign * y)
    with np.errstate(divide="ignore"):
        tp = (rho / (p.a * p.big_f)) ** (1.0 / p.n)
    # phi = pi/2 - 2 atan(t' ((1 - e sin phi)/(1 + e sin phi))^(e/2)),
    # iterated from the spherical start (Snyder 7-9/3-5 trig series also
    # works; the fixed point converges quadratically in a few rounds)
    phi = np.pi / 2.0 - 2.0 * np.arctan(tp)
    for _ in range(8):
        s = p.e * np.sin(phi)
        phi = np.pi / 2.0 - 2.0 * np.arctan(
            tp * ((1.0 - s) / (1.0 + s)) ** (p.e / 2.0)
        )
    lat = np.rad2deg(phi)
    lon = p.lon0 + np.rad2deg(theta / p.n)
    return lat, lon


# well-known EPSG LCC-2SP definitions (exact ellipsoid per datum; GRS80
# differs from WGS84 only at the 0.1 mm level but we carry it exactly now
# that the registry is parametric)
_EPSG_LCC = {
    # RGF93 / Lambert-93 (France national grid, ETRS89-compatible)
    2154: LccParams(49.0, 44.0, 46.5, 3.0, 700000.0, 6600000.0,
                    geodesy.ETRS89_DATUM),
    # NAD83 / Canada Atlas Lambert
    3978: LccParams(49.0, 77.0, 49.0, -95.0, 0.0, 0.0,
                    geodesy.NAD83_DATUM),
}


def parse_lcc(crs: str) -> LccParams | None:
    """LccParams for a recognized LCC CRS name, else None. The parametric
    token is ``LCC:lat1,lat2,lat0,lon0[,fe,fn[,DATUM]]`` (datum names from
    moaray/geodesy.py, default WGS84)."""
    if crs.startswith("LCC:"):
        parts = [v.strip() for v in crs[4:].split(",")]
        if len(parts) not in (4, 6, 7):
            raise ValueError(
                f"bad LCC crs {crs!r}: need lat1,lat2,lat0,lon0"
                "[,fe,fn[,DATUM]]"
            )
        datum = geodesy.WGS84_DATUM
        if len(parts) == 7:
            dname = parts[6].upper()
            if dname not in geodesy.DATUMS:
                raise ValueError(f"unknown datum {dname!r} in {crs!r}")
            datum = geodesy.DATUMS[dname]
            parts = parts[:6]
        vals = [float(v) for v in parts]
        return LccParams(*vals, datum=datum)
    if crs.startswith("EPSG:") and crs[5:].isdigit():
        return _EPSG_LCC.get(int(crs[5:]))
    return None
