"""Coordinate reference systems for the moaray engine (pure affine, no GDAL).

The sandbox has no GDAL/osr/pyproj, so the engine defines a minimal,
fully-documented CRS model that carries the exact *mechanics* of the
reference's reprojection path (corner transform, grid snap, inverse-mapping
resample — ref /root/reference/moamosaic/reproj.py:130-261) without
pretending to do geodesy:

- Every CRS maps to one shared world frame by an affine transform.
- A *named* CRS (e.g. ``"EPSG:32756"``) is identity onto the world frame:
  two different names are distinct labels for the same mapping, and
  transforming between them is allowed (identity), mirroring how the
  reference treats WKT strings that ``osr.IsSame`` judges equal.
- ``"AFFINE:a,b,c,d,e,f"`` maps CRS coords to world coords by
  ``world_x = a + b*x + c*y``, ``world_y = d + e*x + f*y`` — scale,
  offset, rotation and shear, which is the full space of transforms our
  affine warp kernel can express exactly.

A real deployment swaps this module for pyproj behind the same three
functions (``to_world``, ``transform_affine``, ``transform_points``); every
caller is agnostic to the implementation.
"""

from __future__ import annotations

import numpy as np

# affine 6-tuple in GDAL geotransform layout:
# x' = t[0] + t[1]*x + t[2]*y ;  y' = t[3] + t[4]*x + t[5]*y
Affine = tuple[float, float, float, float, float, float]

IDENTITY: Affine = (0.0, 1.0, 0.0, 0.0, 0.0, 1.0)


class ProjectionError(Exception):
    """Analog of the reference's MoaProjectionError (reproj.py:264-271)."""


def to_world(crs: str) -> Affine:
    """CRS -> world-frame affine."""
    if crs.startswith("AFFINE:"):
        parts = crs[len("AFFINE:"):].split(",")
        if len(parts) != 6:
            raise ProjectionError(f"bad AFFINE crs {crs!r}: need 6 params")
        return tuple(float(p) for p in parts)  # type: ignore[return-value]
    return IDENTITY


def invert(t: Affine) -> Affine:
    det = t[1] * t[5] - t[2] * t[4]
    if det == 0.0:
        raise ProjectionError(f"non-invertible affine {t}")
    inv_det = 1.0 / det
    a = t[5] * inv_det
    b = -t[2] * inv_det
    c = -t[4] * inv_det
    d = t[1] * inv_det
    x0 = -(a * t[0] + b * t[3])
    y0 = -(c * t[0] + d * t[3])
    return (x0, a, b, y0, c, d)


def compose(outer: Affine, inner: Affine) -> Affine:
    """outer ∘ inner (apply inner first)."""
    return (
        outer[0] + outer[1] * inner[0] + outer[2] * inner[3],
        outer[1] * inner[1] + outer[2] * inner[4],
        outer[1] * inner[2] + outer[2] * inner[5],
        outer[3] + outer[4] * inner[0] + outer[5] * inner[3],
        outer[4] * inner[1] + outer[5] * inner[4],
        outer[4] * inner[2] + outer[5] * inner[5],
    )


def transform_affine(src_crs: str, dst_crs: str) -> Affine:
    """The affine mapping src-CRS coords -> dst-CRS coords
    (``inv(world(dst)) ∘ world(src)``; identity when the CRSs are equal)."""
    if src_crs == dst_crs:
        return IDENTITY
    return compose(invert(to_world(dst_crs)), to_world(src_crs))


def transform_points(
    t: Affine, xs: np.ndarray, ys: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized affine point transform (the osr.CoordinateTransformation
    analog used by reprojCorners, ref reproj.py:221-234)."""
    return (
        t[0] + t[1] * xs + t[2] * ys,
        t[3] + t[4] * xs + t[5] * ys,
    )


def point_transformer(src_crs: str, dst_crs: str):
    """General point transform src CRS -> dst CRS.

    Returns a callable ``(xs, ys) -> (xs', ys')`` for recognized CURVILINEAR
    pairs — any combination of WGS84 geographic (EPSG:4326), UTM
    (EPSG:326zz/327zz, moaray/tmerc.py), Lambert Conformal Conic
    (EPSG:2154/3978 + LCC:..., moaray/lcc.py), Polar Stereographic
    (UPS/NSIDC/Antarctic + PSTEREO:..., moaray/pstereo.py), Albers
    Equal Area (EPSG:5070/3577 + ALBERS:..., moaray/albers.py), Mercator
    (EPSG:3857 web / EPSG:3395 world / MERC:..., moaray/merc.py) and
    MODIS Sinusoidal (SINU:..., moaray/merc.py), chained
    through the geographic pivot — the projection families behind
    essentially every production grid (the reference's arbitrary-SRS
    gdal.Warp path, ref reproj.py:194-216).
    Returns ``None`` when the pair is expressible as an affine — callers
    then use :func:`transform_affine`, which stays the exact fast path."""
    from . import tmerc

    return tmerc.geodetic_transformer(src_crs, dst_crs)
