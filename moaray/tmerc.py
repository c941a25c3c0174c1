"""WGS84 Transverse Mercator, from scratch (no pyproj/GDAL in sandbox).

Implements the forward (lat/lon -> easting/northing) and inverse projection
with the exact-TM Krüger/Karney series to n^6 — the published public
formulation (Karney 2011, "Transverse Mercator with an accuracy of a few
nanometers"; coefficients are the standard alpha/beta series). Accuracy is
sub-millimetre anywhere within a UTM zone's normal extent.

This closes the reference's real-CRS warp path (moamosaic warps between
arbitrary EPSG SRSs via gdal.Warp, ref /root/reference/moamosaic/
reproj.py:194-216): a WGS84 lat/lon catalog can now mosaic onto a UTM grid.
All functions are vectorized numpy — the warp kernel evaluates them on full
per-window coordinate grids.

Supported CRS names (crs.py routes recognized pairs here):
- ``EPSG:4326``      geographic WGS84, x = longitude deg, y = latitude deg
  (GDAL traditional x/y axis order — the engine's K8 stance)
- ``EPSG:326zz``     UTM zone zz north (k0=0.9996, FE=500000, FN=0)
- ``EPSG:327zz``     UTM zone zz south (FN=10000000)
"""

from __future__ import annotations

import numpy as np

# WGS84 ellipsoid
_A = 6378137.0
_F = 1.0 / 298.257223563
_E = np.sqrt(_F * (2.0 - _F))  # first eccentricity
_N = _F / (2.0 - _F)  # third flattening n

# rectifying radius A = a/(1+n) * (1 + n^2/4 + n^4/64 + n^6/256)
_RECT_A = _A / (1.0 + _N) * (
    1.0 + _N ** 2 / 4.0 + _N ** 4 / 64.0 + _N ** 6 / 256.0
)

_n = _N
_ALPHA = np.array(
    [
        _n / 2 - 2 * _n ** 2 / 3 + 5 * _n ** 3 / 16 + 41 * _n ** 4 / 180
        - 127 * _n ** 5 / 288 + 7891 * _n ** 6 / 37800,
        13 * _n ** 2 / 48 - 3 * _n ** 3 / 5 + 557 * _n ** 4 / 1440
        + 281 * _n ** 5 / 630 - 1983433 * _n ** 6 / 1935360,
        61 * _n ** 3 / 240 - 103 * _n ** 4 / 140 + 15061 * _n ** 5 / 26880
        + 167603 * _n ** 6 / 181440,
        49561 * _n ** 4 / 161280 - 179 * _n ** 5 / 168
        + 6601661 * _n ** 6 / 7257600,
        34729 * _n ** 5 / 80640 - 3418889 * _n ** 6 / 1995840,
        212378941 * _n ** 6 / 319334400,
    ]
)
_BETA = np.array(
    [
        _n / 2 - 2 * _n ** 2 / 3 + 37 * _n ** 3 / 96 - _n ** 4 / 360
        - 81 * _n ** 5 / 512 + 96199 * _n ** 6 / 604800,
        _n ** 2 / 48 + _n ** 3 / 15 - 437 * _n ** 4 / 1440
        + 46 * _n ** 5 / 105 - 1118711 * _n ** 6 / 3870720,
        17 * _n ** 3 / 480 - 37 * _n ** 4 / 840 - 209 * _n ** 5 / 4480
        + 5569 * _n ** 6 / 90720,
        4397 * _n ** 4 / 161280 - 11 * _n ** 5 / 504
        - 830251 * _n ** 6 / 7257600,
        4583 * _n ** 5 / 161280 - 108847 * _n ** 6 / 3991680,
        20648693 * _n ** 6 / 638668800,
    ]
)

UTM_K0 = 0.9996
UTM_FE = 500000.0
UTM_FN_SOUTH = 10000000.0


def tm_forward(
    lat_deg: np.ndarray,
    lon_deg: np.ndarray,
    lon0_deg: float,
    k0: float = UTM_K0,
    false_e: float = UTM_FE,
    false_n: float = 0.0,
) -> tuple[np.ndarray, np.ndarray]:
    """(easting, northing) from geographic coordinates (degrees)."""
    phi = np.deg2rad(np.asarray(lat_deg, dtype=np.float64))
    lam = np.deg2rad(np.asarray(lon_deg, dtype=np.float64) - lon0_deg)
    s = np.sin(phi)
    # conformal latitude: tau' = sinh(asinh(tan phi) - e atanh(e sin phi)).
    # At the exact poles arctanh(+-1) = +-inf, and the inf propagates
    # CORRECTLY through the chain (t = +-inf -> xi_p = +-pi/2 exactly,
    # eta_p = arcsinh(0) = 0) — clamping would shave ~9 m off the
    # quarter-meridian; only the divide-by-zero warning needs silencing.
    with np.errstate(divide="ignore"):
        t = np.sinh(np.arctanh(s) - _E * np.arctanh(_E * s))
        xi_p = np.arctan2(t, np.cos(lam))
        eta_p = np.arcsinh(np.sin(lam) / np.sqrt(t * t + np.cos(lam) ** 2))
    xi = xi_p.copy()
    eta = eta_p.copy()
    for j in range(6):
        m = 2.0 * (j + 1)
        xi += _ALPHA[j] * np.sin(m * xi_p) * np.cosh(m * eta_p)
        eta += _ALPHA[j] * np.cos(m * xi_p) * np.sinh(m * eta_p)
    return (
        false_e + k0 * _RECT_A * eta,
        false_n + k0 * _RECT_A * xi,
    )


def tm_inverse(
    easting: np.ndarray,
    northing: np.ndarray,
    lon0_deg: float,
    k0: float = UTM_K0,
    false_e: float = UTM_FE,
    false_n: float = 0.0,
) -> tuple[np.ndarray, np.ndarray]:
    """(lat_deg, lon_deg) from projected coordinates."""
    xi = (np.asarray(northing, dtype=np.float64) - false_n) / (k0 * _RECT_A)
    eta = (np.asarray(easting, dtype=np.float64) - false_e) / (k0 * _RECT_A)
    xi_p = xi.copy()
    eta_p = eta.copy()
    for j in range(6):
        m = 2.0 * (j + 1)
        xi_p -= _BETA[j] * np.sin(m * xi) * np.cosh(m * eta)
        eta_p -= _BETA[j] * np.cos(m * xi) * np.sinh(m * eta)
    # conformal -> geodetic latitude: solve sin(phi) fixed point of
    # atanh(sin phi) = asinh(tau') + e atanh(e sin phi)
    tau_p = np.sin(xi_p) / np.sqrt(np.sinh(eta_p) ** 2 + np.cos(xi_p) ** 2)
    psi = np.arcsinh(tau_p)
    s = np.tanh(psi)
    for _ in range(8):
        s = np.tanh(psi + _E * np.arctanh(_E * s))
    lat = np.rad2deg(np.arcsin(np.clip(s, -1.0, 1.0)))
    lon = lon0_deg + np.rad2deg(np.arctan2(np.sinh(eta_p), np.cos(xi_p)))
    return lat, lon


def parse_utm(crs: str) -> tuple[float, float] | None:
    """(central meridian deg, false northing) for EPSG:326zz / EPSG:327zz,
    else None."""
    if not crs.startswith("EPSG:"):
        return None
    code = crs[5:]
    if len(code) != 5 or not code.isdigit():
        return None
    head, zone = int(code[:3]), int(code[3:])
    if not (1 <= zone <= 60):
        return None
    if head == 326:
        return (-183.0 + 6.0 * zone, 0.0)
    if head == 327:
        return (-183.0 + 6.0 * zone, UTM_FN_SOUTH)
    return None


def is_geographic(crs: str) -> bool:
    return crs == "EPSG:4326"


def _geodetic_system(crs: str):
    """(to_geo, from_geo) pair for a recognized curvilinear CRS, where
    to_geo(xs, ys) -> (lat, lon) and from_geo(lat, lon) -> (xs, ys) in
    GDAL traditional x/y order; "geo" for EPSG:4326 itself; None for
    anything affine."""
    if is_geographic(crs):
        return "geo"
    u = parse_utm(crs)
    if u is not None:
        lon0, fn = u
        return (
            lambda xs, ys: tm_inverse(xs, ys, lon0, false_n=fn),
            lambda lat, lon: tm_forward(lat, lon, lon0, false_n=fn),
        )
    from .lcc import lcc_forward, lcc_inverse, parse_lcc

    p = parse_lcc(crs)
    if p is not None:
        return (
            lambda xs, ys: lcc_inverse(xs, ys, p),
            lambda lat, lon: lcc_forward(lat, lon, p),
        )
    from .pstereo import parse_pstereo, ps_forward, ps_inverse

    sp = parse_pstereo(crs)
    if sp is not None:
        return (
            lambda xs, ys: ps_inverse(xs, ys, sp),
            lambda lat, lon: ps_forward(lat, lon, sp),
        )
    from .albers import albers_forward, albers_inverse, parse_albers

    ap = parse_albers(crs)
    if ap is not None:
        return (
            lambda xs, ys: albers_inverse(xs, ys, ap),
            lambda lat, lon: albers_forward(lat, lon, ap),
        )
    from .merc import merc_system

    return merc_system(crs)


def geodetic_transformer(src_crs: str, dst_crs: str):
    """Callable (xs, ys) -> (xs', ys') when BOTH CRSs are recognized
    geodetic/projected systems (EPSG:4326, UTM via moaray/tmerc.py,
    Lambert Conformal Conic via moaray/lcc.py, Polar Stereographic via
    moaray/pstereo.py) and differ; None otherwise
    (caller falls back to the affine model). x/y follow GDAL traditional
    order: x=lon/easting, y=lat/northing. Any pair routes through the
    geographic pivot: src -> (lat, lon) -> dst."""
    if src_crs == dst_crs:
        return None
    ssys = _geodetic_system(src_crs)
    dsys = _geodetic_system(dst_crs)
    if ssys is None or dsys is None:
        return None

    if ssys == "geo":
        def to_geo(xs, ys):
            return ys, xs
    else:
        to_geo = ssys[0]
    if dsys == "geo":
        def from_geo(lat, lon):
            return lon, lat
    else:
        from_geo = dsys[1]

    def chain(xs, ys):
        lat, lon = to_geo(xs, ys)
        return from_geo(lat, lon)

    return chain
