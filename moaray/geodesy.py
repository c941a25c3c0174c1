"""Ellipsoids and datum shifts, from scratch (no pyproj/GDAL in sandbox).

Closes the reference's arbitrary-SRS gap for non-WGS84 datums (moamosaic
feeds any EPSG/WKT into osr.SpatialReference + gdal.Warp, ref
/root/reference/moamosaic/reproj.py:40-64): the projection families in
moaray/tmerc.py etc. are parametrized on an :class:`Ellipsoid`, and
:func:`to_wgs84` / :func:`from_wgs84` chain geodetic coordinates between
datums through geocentric XYZ with a Helmert 7-parameter transform
(position-vector convention, EPSG method 9606 — the convention the
published OSGB36 parameters use).

All published constants here are public (EPSG registry / national mapping
agency guidance notes); all math is the standard textbook formulation
(Snyder USGS PP 1395; EPSG Guidance Note 7-2).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import lru_cache

import numpy as np


@dataclass(frozen=True)
class Ellipsoid:
    """Reference ellipsoid: semi-major axis a (m) and flattening f."""

    name: str
    a: float
    f: float

    @property
    def b(self) -> float:
        return self.a * (1.0 - self.f)

    @property
    def e2(self) -> float:
        """First eccentricity squared."""
        return self.f * (2.0 - self.f)

    @property
    def e(self) -> float:
        return float(np.sqrt(self.e2))

    @property
    def n3(self) -> float:
        """Third flattening n = f / (2 - f)."""
        return self.f / (2.0 - self.f)


# classic ellipsoids (EPSG registry values)
WGS84 = Ellipsoid("WGS84", 6378137.0, 1.0 / 298.257223563)
GRS80 = Ellipsoid("GRS80", 6378137.0, 1.0 / 298.257222101)
AIRY1830 = Ellipsoid("AIRY1830", 6377563.396, 1.0 / 299.3249646)
CLARKE1866 = Ellipsoid("CLARKE1866", 6378206.4, 1.0 / 294.978698214)
INTL1924 = Ellipsoid("INTL1924", 6378388.0, 1.0 / 297.0)
BESSEL1841 = Ellipsoid("BESSEL1841", 6377397.155, 1.0 / 299.1528128)

ELLIPSOIDS = {e.name: e for e in
              (WGS84, GRS80, AIRY1830, CLARKE1866, INTL1924, BESSEL1841)}


@dataclass(frozen=True)
class Helmert:
    """7-parameter similarity transform TO WGS84, position-vector
    convention (EPSG 9606): translations m, rotations arc-seconds,
    scale ppm."""

    tx: float
    ty: float
    tz: float
    rx: float = 0.0
    ry: float = 0.0
    rz: float = 0.0
    s_ppm: float = 0.0


@dataclass(frozen=True)
class Datum:
    """A geodetic datum: its ellipsoid plus the Helmert shift to WGS84
    (None = WGS84-equivalent at coordinate-work tolerances, e.g. NAD83,
    ETRS89, GDA94 — the stance GDAL takes with a null TOWGS84)."""

    name: str
    ellipsoid: Ellipsoid
    to_wgs84_params: Helmert | None = None


WGS84_DATUM = Datum("WGS84", WGS84)
# NAD83 / ETRS89 / GDA94: GRS80, null shift (agree with WGS84 to ~1 m,
# identical for raster work — the published TOWGS84 is 0,0,0)
NAD83_DATUM = Datum("NAD83", GRS80)
ETRS89_DATUM = Datum("ETRS89", GRS80)
GDA94_DATUM = Datum("GDA94", GRS80)
# OSGB36: the OS's published single-set national Helmert (±3.5 m vs the
# definitive OSTN grid shift; "A guide to coordinate systems in Great
# Britain", Annexe B / EPSG 1314)
OSGB36_DATUM = Datum(
    "OSGB36", AIRY1830,
    Helmert(tx=446.448, ty=-125.157, tz=542.060,
            rx=0.1502, ry=0.2470, rz=0.8421, s_ppm=-20.4894),
)
# NAD27: CONUS mean Molodensky translations (EPSG 1173 / DMA TR8350.2)
NAD27_DATUM = Datum("NAD27", CLARKE1866, Helmert(tx=-8.0, ty=160.0, tz=176.0))
# ED50: European mean (EPSG 1133)
ED50_DATUM = Datum("ED50", INTL1924, Helmert(tx=-87.0, ty=-98.0, tz=-121.0))

DATUMS = {d.name: d for d in
          (WGS84_DATUM, NAD83_DATUM, ETRS89_DATUM, GDA94_DATUM,
           OSGB36_DATUM, NAD27_DATUM, ED50_DATUM)}


def geodetic_to_geocentric(
    lat_deg, lon_deg, ell: Ellipsoid, h: float = 0.0
):
    """(X, Y, Z) metres from geodetic lat/lon degrees at height h."""
    phi = np.deg2rad(np.asarray(lat_deg, dtype=np.float64))
    lam = np.deg2rad(np.asarray(lon_deg, dtype=np.float64))
    s, c = np.sin(phi), np.cos(phi)
    nu = ell.a / np.sqrt(1.0 - ell.e2 * s * s)  # prime vertical radius
    return (
        (nu + h) * c * np.cos(lam),
        (nu + h) * c * np.sin(lam),
        (nu * (1.0 - ell.e2) + h) * s,
    )


def geocentric_to_geodetic(X, Y, Z, ell: Ellipsoid):
    """(lat_deg, lon_deg) from geocentric XYZ (Bowring's method, then a
    couple of Newton refinements of the standard fixed point — converges
    to double precision for any surface-adjacent point)."""
    X = np.asarray(X, dtype=np.float64)
    Y = np.asarray(Y, dtype=np.float64)
    Z = np.asarray(Z, dtype=np.float64)
    p = np.hypot(X, Y)
    # Bowring start
    ep2 = ell.e2 / (1.0 - ell.e2)
    theta = np.arctan2(Z * ell.a, p * ell.b)
    phi = np.arctan2(
        Z + ep2 * ell.b * np.sin(theta) ** 3,
        p - ell.e2 * ell.a * np.cos(theta) ** 3,
    )
    # fixed-point refinement: tan(phi) = (Z + e2 nu sin phi) / p
    for _ in range(4):
        s = np.sin(phi)
        nu = ell.a / np.sqrt(1.0 - ell.e2 * s * s)
        phi = np.arctan2(Z + ell.e2 * nu * s, p)
    return np.rad2deg(phi), np.rad2deg(np.arctan2(Y, X))


@lru_cache(maxsize=64)
def _helmert_matrix(h: Helmert) -> tuple:
    """(M, t, Minv): X_wgs = M @ X_src + t, exact inverse via 3x3 solve so
    round trips are bit-stable (negating the params is only approximate)."""
    arc = np.pi / (180.0 * 3600.0)
    rx, ry, rz = h.rx * arc, h.ry * arc, h.rz * arc
    scale = 1.0 + h.s_ppm * 1e-6
    # position-vector small-angle rotation matrix
    m = scale * np.array([
        [1.0, -rz, ry],
        [rz, 1.0, -rx],
        [-ry, rx, 1.0],
    ])
    t = np.array([h.tx, h.ty, h.tz])
    return m, t, np.linalg.inv(m)


def helmert_to_wgs84(X, Y, Z, h: Helmert):
    m, t, _ = _helmert_matrix(h)
    return (
        t[0] + m[0, 0] * X + m[0, 1] * Y + m[0, 2] * Z,
        t[1] + m[1, 0] * X + m[1, 1] * Y + m[1, 2] * Z,
        t[2] + m[2, 0] * X + m[2, 1] * Y + m[2, 2] * Z,
    )


def helmert_from_wgs84(X, Y, Z, h: Helmert):
    m, t, mi = _helmert_matrix(h)
    X, Y, Z = X - t[0], Y - t[1], Z - t[2]
    return (
        mi[0, 0] * X + mi[0, 1] * Y + mi[0, 2] * Z,
        mi[1, 0] * X + mi[1, 1] * Y + mi[1, 2] * Z,
        mi[2, 0] * X + mi[2, 1] * Y + mi[2, 2] * Z,
    )


def to_wgs84(lat_deg, lon_deg, datum: Datum):
    """Geodetic coordinates on `datum` -> WGS84 geodetic (h=0 on the
    source ellipsoid; the height mismatch contributes < 1e-9 deg
    horizontally, far below the Helmert parameters' own accuracy)."""
    if datum.to_wgs84_params is None and datum.ellipsoid is WGS84:
        return (np.asarray(lat_deg, dtype=np.float64),
                np.asarray(lon_deg, dtype=np.float64))
    X, Y, Z = geodetic_to_geocentric(lat_deg, lon_deg, datum.ellipsoid)
    if datum.to_wgs84_params is not None:
        X, Y, Z = helmert_to_wgs84(X, Y, Z, datum.to_wgs84_params)
    return geocentric_to_geodetic(X, Y, Z, WGS84)


def from_wgs84(lat_deg, lon_deg, datum: Datum):
    """WGS84 geodetic -> geodetic coordinates on `datum`."""
    if datum.to_wgs84_params is None and datum.ellipsoid is WGS84:
        return (np.asarray(lat_deg, dtype=np.float64),
                np.asarray(lon_deg, dtype=np.float64))
    X, Y, Z = geodetic_to_geocentric(lat_deg, lon_deg, WGS84)
    if datum.to_wgs84_params is not None:
        X, Y, Z = helmert_from_wgs84(X, Y, Z, datum.to_wgs84_params)
    return geocentric_to_geodetic(X, Y, Z, datum.ellipsoid)


def datum_shift(lat_deg, lon_deg, src: Datum, dst: Datum):
    """Geodetic on src datum -> geodetic on dst datum (via WGS84 pivot;
    identity fast-path when both are WGS84-equivalent on one ellipsoid)."""
    if src is dst or (
        src.to_wgs84_params is None and dst.to_wgs84_params is None
        and src.ellipsoid == dst.ellipsoid
    ):
        return (np.asarray(lat_deg, dtype=np.float64),
                np.asarray(lon_deg, dtype=np.float64))
    lat, lon = to_wgs84(lat_deg, lon_deg, src)
    return from_wgs84(lat, lon, dst)
