"""Reprojection: per-input warp planning + inverse-mapping resample kernel.

The reference builds one warp VRT per input (makeReprojVRTs,
ref /root/reference/moamosaic/reproj.py:130-218) — a *lazy* warped raster
whose windows are resampled on read. The moaray analog fuses the same
semantics into the decode stage: planning runs on the warped metadata
(computed here, pure math, no pixels), and window reads sample the source
array through the composed dst-pixel -> src-pixel affine.

Exact reference semantics preserved:
- corner transform + min/max bounds  (reprojCorners, reproj.py:221-234)
- floor/ceil grid snap to resolution multiples (alignGrid/snapValue,
  reproj.py:237-261)
- default output resolution = first input's resolution
  (reproj.py:183-192; the linear-units guard is not applicable to the
  affine CRS model — see moaray/crs.py)
- src/dst nodata = the mosaic null value; resampleAlg near/bilinear
  (WarpOptions, reproj.py:211-216)
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import numpy as np

from .. import crs as crs_mod
from ..geo import GeoTransform, ImageMeta, inv_geotransform


@dataclass(frozen=True)
class WarpSpec:
    """Requested output projection (the outprojepsg/wktfile/wkt trio of the
    reference collapses to one CRS string here; P9 dispatch,
    reproj.py:14-69)."""

    dst_crs: str
    xres: float | None = None
    yres: float | None = None
    # full GDAL resampleAlg set (ref reproj.py:211-216 passes the string
    # through to gdal.Warp): near | bilinear | cubic | cubicspline |
    # lanczos | average | rms | mode | min | max | med | q1 | q3 | sum
    resample: str = "near"
    # lattice anchor (x, y) the warped extent snaps RELATIVE to; None = the
    # reference's alignGrid behaviour (multiples of res, anchored at 0).
    # update_mosaic/extend_mosaic anchor at the STORED grid origin so
    # warped inputs land on the committed lattice even when that origin is
    # not itself a multiple of the resolution.
    anchor: tuple[float, float] | None = None


def snap_value(val: float, res: float, ceil: bool) -> float:
    """Snap to a multiple of res (floor or ceil) — bit-identical to the
    reference's snapValue (reproj.py:252-261)."""
    n = val / res
    n = math.ceil(n) if ceil else math.floor(n)
    return res * n


def align_grid(
    x_min: float, x_max: float, y_min: float, y_max: float,
    xres: float, yres: float,
) -> tuple[float, float, float, float]:
    """alignGrid semantics (reproj.py:237-249)."""
    return (
        snap_value(x_min, xres, False),
        snap_value(x_max, xres, True),
        snap_value(y_min, yres, False),
        snap_value(y_max, yres, True),
    )


def reproj_corners(
    t: crs_mod.Affine, meta: ImageMeta
) -> tuple[float, float, float, float]:
    """Transform the 4 extent corners, take min/max (reprojCorners,
    reproj.py:221-234)."""
    xs = np.array([meta.x_min, meta.x_max, meta.x_min, meta.x_max])
    ys = np.array([meta.y_max, meta.y_max, meta.y_min, meta.y_min])
    tx, ty = crs_mod.transform_points(t, xs, ys)
    return (float(tx.min()), float(tx.max()), float(ty.min()), float(ty.max()))


def _edge_points(meta: ImageMeta, per_edge: int = 33):
    """Points along the 4 extent edges — a curvilinear transform bows the
    edges, so corner-only bounds (exact for affines) under-cover; GDAL's
    SuggestedWarpOutput samples edges the same way."""
    xs = np.linspace(meta.x_min, meta.x_max, per_edge)
    ys = np.linspace(meta.y_min, meta.y_max, per_edge)
    ex = np.concatenate([xs, xs, np.full(per_edge, meta.x_min),
                         np.full(per_edge, meta.x_max)])
    ey = np.concatenate([np.full(per_edge, meta.y_min),
                         np.full(per_edge, meta.y_max), ys, ys])
    return ex, ey


def warped_meta(meta: ImageMeta, spec: WarpSpec) -> ImageMeta:
    """Metadata of the (virtual) warped raster — size, transform, CRS —
    without touching pixels. The planning phase runs entirely on these."""
    xres = spec.xres if spec.xres is not None else meta.x_res
    yres = spec.yres if spec.yres is not None else meta.y_res
    fn = crs_mod.point_transformer(meta.crs, spec.dst_crs)
    if fn is not None:
        # curvilinear pair (e.g. EPSG:4326 -> UTM): units change, so the
        # source resolution is not a meaningful default
        if spec.xres is None or spec.yres is None:
            raise crs_mod.ProjectionError(
                f"warping {meta.crs} -> {spec.dst_crs} changes units; "
                "out_xres/out_yres must be given explicitly"
            )
        ex, ey = _edge_points(meta)
        tx, ty = fn(ex, ey)
        x_min, x_max = float(tx.min()), float(tx.max())
        y_min, y_max = float(ty.min()), float(ty.max())
    else:
        t = crs_mod.transform_affine(meta.crs, spec.dst_crs)
        x_min, x_max, y_min, y_max = reproj_corners(t, meta)
    ax, ay = spec.anchor if spec.anchor is not None else (0.0, 0.0)
    x_min, x_max, y_min, y_max = align_grid(
        x_min - ax, x_max - ax, y_min - ay, y_max - ay, xres, abs(yres)
    )
    x_min, x_max, y_min, y_max = x_min + ax, x_max + ax, y_min + ay, y_max + ay
    ncols = max(1, int(round((x_max - x_min) / xres)))
    nrows = max(1, int(round((y_max - y_min) / abs(yres))))
    return ImageMeta(
        image_id=meta.image_id,
        ncols=ncols,
        nrows=nrows,
        transform=(x_min, xres, 0.0, y_max, 0.0, -abs(yres)),
        crs=spec.dst_crs,
        dtype=meta.dtype,
        nullval=meta.nullval,
        nbands=meta.nbands,
        fmt=meta.fmt,
    )


def dst_to_src_pixel(meta: ImageMeta, wmeta: ImageMeta) -> crs_mod.Affine:
    """Composed affine: warped-raster pixel coords -> source pixel coords.

    dst px -> dst CRS (wmeta.transform) -> src CRS (crs transform) ->
    src px (inverse of the source geotransform). All affine, so the warp
    kernel evaluates ONE affine per output pixel.
    """
    to_src_crs = crs_mod.transform_affine(wmeta.crs, meta.crs)
    return crs_mod.compose(
        inv_geotransform(meta.transform),
        crs_mod.compose(to_src_crs, wmeta.transform),
    )


def dst_to_src_mapper(meta: ImageMeta, wmeta: ImageMeta):
    """dst-pixel -> src-pixel mapping: the affine 6-tuple when the CRS pair
    is affine (fast separable path in warp_window), else a vectorized
    callable ``(cols, rows) -> (sx, sy)`` chaining dst-px -> dst CRS
    (affine) -> src CRS (Transverse Mercator point transform) -> src px
    (inverse source geotransform)."""
    fn = crs_mod.point_transformer(wmeta.crs, meta.crs)
    if fn is None:
        return dst_to_src_pixel(meta, wmeta)
    wt = wmeta.transform
    src_inv = inv_geotransform(meta.transform)

    def mapper(cols, rows):
        wx = wt[0] + wt[1] * cols + wt[2] * rows
        wy = wt[3] + wt[4] * cols + wt[5] * rows
        cx, cy = fn(wx, wy)
        return crs_mod.transform_points(src_inv, cx, cy)

    return mapper


def warp_window(
    src: np.ndarray,
    px_map: crs_mod.Affine,
    top: int,
    left: int,
    h: int,
    w: int,
    nullval,
    resample: str = "near",
) -> np.ndarray:
    """Resample one window of the warped raster by inverse mapping.

    ``px_map`` is the dst->src pixel affine from :func:`dst_to_src_pixel`,
    or a vectorized callable from :func:`dst_to_src_mapper` (curvilinear
    CRS pairs); ``(top, left, h, w)`` the requested window in warped-raster
    pixel coords. Out-of-source pixels get ``nullval`` (the src/dst nodata
    semantics of WarpOptions, reproj.py:211-214).
    """
    rows = np.arange(top, top + h, dtype=np.float64) + 0.5
    cols = np.arange(left, left + w, dtype=np.float64) + 0.5
    if callable(px_map):
        cg, rg = np.meshgrid(cols, rows)
        sx, sy = px_map(cg, rg)
    else:
        # affine separates: evaluate per-axis then broadcast
        sx = px_map[0] + px_map[1] * cols[None, :] + px_map[2] * rows[:, None]
        sy = px_map[3] + px_map[4] * cols[None, :] + px_map[5] * rows[:, None]
    out = np.full((h, w), nullval, dtype=src.dtype)
    if resample == "near":
        ci = np.floor(sx).astype(np.int64)
        ri = np.floor(sy).astype(np.int64)
        valid = (ri >= 0) & (ri < src.shape[0]) & (ci >= 0) & (ci < src.shape[1])
        out[valid] = src[ri[valid], ci[valid]]
        return out
    if resample == "bilinear":
        fx = sx - 0.5
        fy = sy - 0.5
        c0 = np.floor(fx).astype(np.int64)
        r0 = np.floor(fy).astype(np.int64)
        wx = fx - c0
        wy = fy - r0
        valid = (
            (r0 >= 0) & (r0 + 1 < src.shape[0])
            & (c0 >= 0) & (c0 + 1 < src.shape[1])
        )
        rv, cv = r0[valid], c0[valid]
        wxv, wyv = wx[valid], wy[valid]
        p00 = src[rv, cv].astype(np.float64)
        p01 = src[rv, cv + 1].astype(np.float64)
        p10 = src[rv + 1, cv].astype(np.float64)
        p11 = src[rv + 1, cv + 1].astype(np.float64)
        # null-aware: if any corner is null, fall back to nearest
        if np.isnan(nullval):
            anynull = np.isnan(p00) | np.isnan(p01) | np.isnan(p10) | np.isnan(p11)
        else:
            nv = float(nullval)
            anynull = (p00 == nv) | (p01 == nv) | (p10 == nv) | (p11 == nv)
        blend = (
            p00 * (1 - wxv) * (1 - wyv)
            + p01 * wxv * (1 - wyv)
            + p10 * (1 - wxv) * wyv
            + p11 * wxv * wyv
        )
        nearest = src[
            np.clip(np.rint(fy[valid]).astype(np.int64), 0, src.shape[0] - 1),
            np.clip(np.rint(fx[valid]).astype(np.int64), 0, src.shape[1] - 1),
        ]
        vals = np.where(anynull, nearest.astype(np.float64), blend)
        if not np.isnan(nullval) and np.issubdtype(src.dtype, np.integer):
            vals = np.rint(vals)
        out[valid] = vals.astype(src.dtype)
        # edge band where a 2x2 neighborhood doesn't exist: nearest
        edge = (
            ~valid
            & (np.floor(sy).astype(np.int64) >= 0)
            & (np.floor(sy).astype(np.int64) < src.shape[0])
            & (np.floor(sx).astype(np.int64) >= 0)
            & (np.floor(sx).astype(np.int64) < src.shape[1])
        )
        out[edge] = src[
            np.floor(sy[edge]).astype(np.int64),
            np.floor(sx[edge]).astype(np.int64),
        ]
        return out
    if resample in _CONV_KERNELS:
        weights_fn, lo, ntaps = _CONV_KERNELS[resample]
        return _warp_conv(src, sx, sy, out, nullval, weights_fn, lo, ntaps)
    if resample in _FOOTPRINT_STATS:
        return _warp_footprint(
            src, px_map, top, left, h, w, out, nullval, resample
        )
    raise ValueError(f"unknown resample method {resample!r}")


def _cubic_weights(t: np.ndarray) -> list[np.ndarray]:
    """Cubic-convolution (Keys, a=-0.5 — GDAL's 'cubic') weights for the 4
    taps at offsets -1..2 around the sample, t = fractional position."""
    a = -0.5
    d0, d1, d2, d3 = 1.0 + t, t, 1.0 - t, 2.0 - t

    def outer(d):  # 1 < |d| <= 2
        return a * d ** 3 - 5 * a * d ** 2 + 8 * a * d - 4 * a

    def inner(d):  # |d| <= 1
        return (a + 2) * d ** 3 - (a + 3) * d ** 2 + 1

    return [outer(d0), inner(d1), inner(d2), outer(d3)]


def _bspline_weights(t: np.ndarray) -> list[np.ndarray]:
    """Cubic B-spline (GDAL 'cubicspline') weights for the 4 taps at
    offsets -1..2. Smoothing (not interpolating) kernel; reproduces
    constant and linear fields exactly (partition of unity + symmetry)."""
    d0, d1, d2, d3 = 1.0 + t, t, 1.0 - t, 2.0 - t

    def outer(d):  # 1 <= d <= 2
        e = 2.0 - d
        return e * e * e / 6.0

    def inner(d):  # 0 <= d <= 1
        return 2.0 / 3.0 - d * d + d * d * d / 2.0

    return [outer(d0), inner(d1), inner(d2), outer(d3)]


def _lanczos_weights(t: np.ndarray) -> list[np.ndarray]:
    """Lanczos a=3 (GDAL 'lanczos') weights for the 6 taps at offsets
    -2..3, normalized to sum 1 (keeps constants exact, as GDAL does).
    sinc-windowed-sinc interpolates exactly at sample points."""
    ws = [np.sinc(t - off) * np.sinc((t - off) / 3.0) for off in range(-2, 4)]
    s = ws[0] + ws[1] + ws[2] + ws[3] + ws[4] + ws[5]
    return [w / s for w in ws]


# resample -> (per-axis weight fn, first tap offset, tap count)
_CONV_KERNELS = {
    "cubic": (_cubic_weights, -1, 4),
    "cubicspline": (_bspline_weights, -1, 4),
    "lanczos": (_lanczos_weights, -2, 6),
}

# GDAL footprint-statistic resampleAlg values (dst pixel = stat of the
# non-null src pixels whose centers fall inside its footprint)
_FOOTPRINT_STATS = (
    "average", "sum", "rms", "min", "max", "mode", "med", "q1", "q3",
)


def _warp_conv(src, sx, sy, out, nullval, weights_fn, lo, ntaps):
    """Separable ntaps x ntaps convolution (cubic / cubicspline / lanczos);
    any-null neighborhood and the edge band fall back to nearest (mirrors
    the bilinear kernel's null policy)."""
    hi = lo + ntaps - 1
    fx = sx - 0.5
    fy = sy - 0.5
    c0 = np.floor(fx).astype(np.int64)
    r0 = np.floor(fy).astype(np.int64)
    tx = fx - c0
    ty = fy - r0
    valid = (
        (r0 + lo >= 0) & (r0 + hi < src.shape[0])
        & (c0 + lo >= 0) & (c0 + hi < src.shape[1])
    )
    rv, cv = r0[valid], c0[valid]
    wxs = [w[valid] for w in weights_fn(tx)]
    wys = [w[valid] for w in weights_fn(ty)]
    acc = np.zeros(rv.shape, dtype=np.float64)
    anynull = np.zeros(rv.shape, dtype=bool)
    nan_null = isinstance(nullval, float) and np.isnan(nullval)
    for i in range(ntaps):
        for j in range(ntaps):
            p = src[rv + i + lo, cv + j + lo].astype(np.float64)
            if nan_null:
                anynull |= np.isnan(p)
            else:
                anynull |= p == float(nullval)
            acc += wys[i] * wxs[j] * p
    nearest = src[
        np.clip(np.rint(fy[valid]).astype(np.int64), 0, src.shape[0] - 1),
        np.clip(np.rint(fx[valid]).astype(np.int64), 0, src.shape[1] - 1),
    ]
    vals = np.where(anynull, nearest.astype(np.float64), acc)
    if np.issubdtype(src.dtype, np.integer):
        info = np.iinfo(src.dtype)
        vals = np.clip(np.rint(vals), info.min, info.max)
    out[valid] = vals.astype(src.dtype)
    # pixels whose full neighborhood leaves the source: nearest
    ri = np.floor(sy).astype(np.int64)
    ci = np.floor(sx).astype(np.int64)
    edge = (
        ~valid
        & (ri >= 0) & (ri < src.shape[0])
        & (ci >= 0) & (ci < src.shape[1])
    )
    out[edge] = src[ri[edge], ci[edge]]
    return out


def _warp_footprint(src, px_map, top, left, h, w, out, nullval, stat):
    """GDAL footprint-statistic semantics ('average', 'sum', 'rms', 'min',
    'max', 'mode', 'med', 'q1', 'q3'): each destination pixel is the stat
    of the non-null SOURCE pixels whose centers fall inside the destination
    pixel's footprint (exact for axis-aligned affines — the moaray warp
    model; a rotated map would need a polygon coverage test).

    Streaming stats (average/sum/rms/min/max) accumulate in O(h*w); rank
    stats (mode/med/q1/q3) gather a (taps, h, w) candidate stack, chunked
    over rows so memory stays bounded for large downsample factors. Ties
    in 'mode' go to the smallest value (deterministic); med/q1/q3 use
    numpy linear interpolation between ranks."""
    # dst pixel corner grid -> src coords (corners, not centers)
    rows_c = np.arange(top, top + h + 1, dtype=np.float64)
    cols_c = np.arange(left, left + w + 1, dtype=np.float64)
    if callable(px_map):
        cg, rg = np.meshgrid(cols_c, rows_c)
        gx, gy = px_map(cg, rg)
    else:
        gx = px_map[0] + px_map[1] * cols_c[None, :] + px_map[2] * rows_c[:, None]
        gy = px_map[3] + px_map[4] * cols_c[None, :] + px_map[5] * rows_c[:, None]
    x_lo = np.minimum(gx[:-1, :-1], gx[1:, 1:])
    x_hi = np.maximum(gx[:-1, :-1], gx[1:, 1:])
    y_lo = np.minimum(gy[:-1, :-1], gy[1:, 1:])
    y_hi = np.maximum(gy[:-1, :-1], gy[1:, 1:])
    kx = max(1, int(math.ceil(float(np.max(x_hi - x_lo)))) + 1)
    ky = max(1, int(math.ceil(float(np.max(y_hi - y_lo)))) + 1)
    nan_null = isinstance(nullval, float) and np.isnan(nullval)
    if stat in ("mode", "med", "q1", "q3"):
        # bound the candidate stack to ~32 MB per chunk
        chunk = max(1, int(4_000_000 // max(1, w * kx * ky)))
        for r0 in range(0, h, chunk):
            r1 = min(h, r0 + chunk)
            sl = np.s_[r0:r1]
            _footprint_rank(
                src, x_lo[sl], x_hi[sl], y_lo[sl], y_hi[sl],
                kx, ky, out[sl], nullval, nan_null, stat,
            )
        return out
    base_c = np.floor(x_lo).astype(np.int64)
    base_r = np.floor(y_lo).astype(np.int64)
    acc = np.zeros((h, w), dtype=np.float64)
    cnt = np.zeros((h, w), dtype=np.int64)
    mn = np.full((h, w), np.inf)
    mx = np.full((h, w), -np.inf)
    want_sq = stat == "rms"
    want_ext = stat in ("min", "max")
    for i in range(ky):
        rr = base_r + i
        cy = rr + 0.5  # src pixel center
        in_y = (cy >= y_lo) & (cy < y_hi) & (rr >= 0) & (rr < src.shape[0])
        if not in_y.any():
            continue
        for j in range(kx):
            cc = base_c + j
            cx = cc + 0.5
            sel = in_y & (cx >= x_lo) & (cx < x_hi) & (cc >= 0) & (cc < src.shape[1])
            if not sel.any():
                continue
            p = src[rr[sel], cc[sel]].astype(np.float64)
            nonnull = ~np.isnan(p) if nan_null else p != float(nullval)
            vals = np.where(nonnull, p, 0.0)
            a = acc[sel]
            a += vals * vals if want_sq else vals
            acc[sel] = a
            c = cnt[sel]
            c += nonnull.astype(np.int64)
            cnt[sel] = c
            if want_ext:
                live = np.where(nonnull, p, np.inf)
                mn[sel] = np.minimum(mn[sel], live)
                live = np.where(nonnull, p, -np.inf)
                mx[sel] = np.maximum(mx[sel], live)
    have = cnt > 0
    if stat == "average":
        vals = acc[have] / cnt[have]
    elif stat == "sum":
        vals = acc[have]
    elif stat == "rms":
        vals = np.sqrt(acc[have] / cnt[have])
    elif stat == "min":
        vals = mn[have]
    elif stat == "max":
        vals = mx[have]
    else:  # pragma: no cover - dispatch guarantees membership
        raise ValueError(f"unknown footprint stat {stat!r}")
    out[have] = _cast_stat(vals, src.dtype)
    return out


def _footprint_rank(
    src, x_lo, x_hi, y_lo, y_hi, kx, ky, out, nullval, nan_null, stat
):
    """Rank-based footprint stats over one row-chunk: gather all candidate
    src values per dst pixel into a NaN-padded stack, then reduce."""
    hh, ww = x_lo.shape
    base_c = np.floor(x_lo).astype(np.int64)
    base_r = np.floor(y_lo).astype(np.int64)
    stack = np.full((ky * kx, hh, ww), np.nan)
    for i in range(ky):
        rr = base_r + i
        cy = rr + 0.5
        in_y = (cy >= y_lo) & (cy < y_hi) & (rr >= 0) & (rr < src.shape[0])
        if not in_y.any():
            continue
        for j in range(kx):
            cc = base_c + j
            cx = cc + 0.5
            sel = in_y & (cx >= x_lo) & (cx < x_hi) & (cc >= 0) & (cc < src.shape[1])
            if not sel.any():
                continue
            p = src[rr[sel], cc[sel]].astype(np.float64)
            nonnull = ~np.isnan(p) if nan_null else p != float(nullval)
            layer = stack[i * kx + j]
            layer[sel] = np.where(nonnull, p, np.nan)
    have = ~np.all(np.isnan(stack), axis=0)
    if not have.any():
        return
    live = stack[:, have]  # (taps, npix) — no all-NaN slices -> no warnings
    if stat == "med":
        vals = np.nanmedian(live, axis=0)
    elif stat == "q1":
        vals = np.nanquantile(live, 0.25, axis=0)
    elif stat == "q3":
        vals = np.nanquantile(live, 0.75, axis=0)
    else:  # mode: most frequent value; ties -> smallest (deterministic)
        vals = _nan_mode(live)
    out[have] = _cast_stat(vals, src.dtype)


def _nan_mode(stack: np.ndarray) -> np.ndarray:
    """Most frequent non-NaN value along axis 0 (ties -> smallest value).
    Vectorized: sort puts NaNs last and equal values adjacent, then a
    run-length sweep keeps the first (= smallest) longest run."""
    svals = np.sort(stack, axis=0)
    n = svals.shape[0]
    best_cnt = np.zeros(svals.shape[1:], dtype=np.int64)
    best_val = np.full(svals.shape[1:], np.nan)
    run = np.zeros(svals.shape[1:], dtype=np.int64)
    for k in range(n):
        cur = svals[k]
        ok = ~np.isnan(cur)
        if k > 0:
            same = ok & (cur == svals[k - 1])
            run = np.where(same, run + 1, np.where(ok, 1, 0))
        else:
            run = ok.astype(np.int64)
        better = run > best_cnt
        best_cnt = np.where(better, run, best_cnt)
        best_val = np.where(better, cur, best_val)
    return best_val


def _cast_stat(vals: np.ndarray, dtype) -> np.ndarray:
    if np.issubdtype(dtype, np.integer):
        info = np.iinfo(dtype)
        vals = np.clip(np.rint(vals), info.min, info.max)
    return vals.astype(dtype)
