"""Raster analytics over assembled mosaic tiles (north-star raster<->vector
components; no reference counterpart — moamosaic stops at the merged mosaic,
ref mosaic.py:286-394 writes blocks and exits).

Four operators, all expressed over the engine's own tile rows
(stages/assemble.TILE_SCHEMA) so they compose with do_mosaic without any
driver-side canvas:

- ``zonal_stats``: per-polygon pixel statistics (the classic vector-zones ×
  raster overlay). Zones are the SMALL side — broadcast once via ``ray.put``,
  PIP-rasterized per tile inside ``map_batches``; only fixed-size partial
  rows reach the (tiny, zone-keyed) reduce.
- ``band_math``: per-pixel multi-band arithmetic (NDVI-style normalized
  difference or any user fn over the band stack). One groupby(tile_id)
  co-locates a tile's bands; output is a new single-band tile dataset.
- ``focal_stats``: neighborhood (2r+1)² statistics with an explicit
  tile-HALO exchange: every tile flat_maps its edge strips to the 8
  neighbor tile ids, one groupby(tile_id) reassembles each tile plus halo,
  and the kernel runs vectorized on the padded canvas. The partitioning
  assumption: a tile plus its radius-r halo fits a worker's heap (r is
  1-2 px vs a 512-4096 px tile), and each pixel ships to at most 3 extra
  tiles — O(perimeter) duplication, never O(area).
- ``terrain``: slope / aspect / hillshade (Horn 1981 3×3, the gdaldem
  algorithm) on the same halo machinery (radius-1 stencil).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..geo import OutputGrid
from ..stages.assemble import (
    TILE_SCHEMA,
    decode_payload,
    encode_payload,
    _nonnull_mask,
)
from .vector import point_in_polygon

_STATS = ("count", "px_sum", "px_ssq", "px_min", "px_max")


# ---------------------------------------------------------------------------
# zonal_stats
# ---------------------------------------------------------------------------

def _tile_pixel_centers(gt, top, left, ys, xs):
    """World coordinates of a tile's pixel centers under the grid
    geotransform (same convention as vector.footprint_tile_coverage:
    zones live in the output grid's map space)."""
    px = left + 0.5 + np.arange(xs, dtype=np.float64)
    py = top + 0.5 + np.arange(ys, dtype=np.float64)
    pxg, pyg = np.meshgrid(px, py)
    x = gt[0] + gt[1] * pxg + gt[2] * pyg
    y = gt[3] + gt[4] * pxg + gt[5] * pyg
    return x, y


def zonal_stats(tiles_ds, grid: OutputGrid, zones, band: int = 0):
    """Per-zone pixel statistics over an assembled mosaic.

    ``zones``: sequence of ``(zone_id, polygon)`` with polygon an (k, 2)
    float array of WORLD coordinates in the output grid's map space
    (the same space vector.footprint_polygon emits for an aligned grid).
    Zones are broadcast once (``ray.put``); each tile rasterizes only the
    zones whose bbox intersects its extent, masks nulls, and emits one
    fixed-size partial row per touched zone. The reduce is zone-keyed —
    zones are analytics-query-sized (thousands), never corpus-sized.

    Returns (zone_id, count, vmin, vmax, mean, px_sum); zones touching no
    valid pixel report count 0 and null min/max/mean.
    """
    import ray

    zlist = [(int(zid), np.asarray(poly, dtype=np.float64))
             for zid, poly in zones]
    zones_ref = ray.put(zlist)
    gt = grid.transform
    nullval = grid.nullval
    np_dtype = np.dtype(grid.dtype)

    class ZonalPartials:
        def __init__(self):
            self._zones = ray.get(zones_ref)
            self._bbox = [
                (p[:, 0].min(), p[:, 1].min(), p[:, 0].max(), p[:, 1].max())
                for _, p in self._zones
            ]

        def __call__(self, batch: pa.Table) -> pa.Table:
            axis_aligned = gt[2] == 0.0 and gt[4] == 0.0
            out = {k: [] for k in ("zone_id",) + _STATS}
            for i in range(batch.num_rows):
                if batch["band"][i].as_py() != band:
                    continue
                top = batch["out_top"][i].as_py()
                left = batch["out_left"][i].as_py()
                ys = batch["out_ysize"][i].as_py()
                xs = batch["out_xsize"][i].as_py()
                arr = decode_payload(
                    batch["pixels"][i].as_buffer(),
                    batch["pixels_codec"][i].as_py(), np_dtype,
                ).reshape(ys, xs)
                valid = _nonnull_mask(arr, nullval)
                if not valid.any():
                    continue
                x, y = _tile_pixel_centers(gt, top, left, ys, xs)
                txmin, txmax = x.min(), x.max()
                tymin, tymax = y.min(), y.max()
                for (zid, poly), (bx0, by0, bx1, by1) in zip(
                    self._zones, self._bbox
                ):
                    if bx1 < txmin or bx0 > txmax or by1 < tymin or by0 > tymax:
                        continue
                    if axis_aligned:
                        # PIP only inside the zone's bbox subwindow — a
                        # zone touching one tile corner tests O(bbox px),
                        # not O(tile px)
                        csel = (x[0, :] >= bx0) & (x[0, :] <= bx1)
                        rsel = (y[:, 0] >= by0) & (y[:, 0] <= by1)
                        if not csel.any() or not rsel.any():
                            continue
                        sub = np.ix_(rsel, csel)
                        inside = np.zeros((ys, xs), dtype=bool)
                        inside[sub] = point_in_polygon(
                            x[sub].ravel(), y[sub].ravel(), poly
                        ).reshape(int(rsel.sum()), int(csel.sum()))
                    else:  # rotated geotransform: bbox isn't separable
                        inside = point_in_polygon(
                            x.ravel(), y.ravel(), poly
                        ).reshape(ys, xs)
                    m = inside & valid
                    cnt = int(m.sum())
                    if not cnt:
                        continue
                    v = arr[m].astype(np.float64)
                    out["zone_id"].append(zid)
                    out["count"].append(cnt)
                    out["px_sum"].append(float(v.sum()))
                    out["px_ssq"].append(float((v * v).sum()))
                    out["px_min"].append(float(v.min()))
                    out["px_max"].append(float(v.max()))
            return pa.table(
                {
                    "zone_id": pa.array(out["zone_id"], pa.int64()),
                    "count": pa.array(out["count"], pa.int64()),
                    "px_sum": pa.array(out["px_sum"], pa.float64()),
                    "px_ssq": pa.array(out["px_ssq"], pa.float64()),
                    "px_min": pa.array(out["px_min"], pa.float64()),
                    "px_max": pa.array(out["px_max"], pa.float64()),
                }
            )

    import ray.data  # noqa: F401

    # zero rows keep never-touched zones in the output
    zeros = ray.data.from_arrow(
        pa.table(
            {
                "zone_id": pa.array([z for z, _ in zlist], pa.int64()),
                "count": pa.array([0] * len(zlist), pa.int64()),
                "px_sum": pa.array([0.0] * len(zlist), pa.float64()),
                "px_ssq": pa.array([0.0] * len(zlist), pa.float64()),
                "px_min": pa.array([np.inf] * len(zlist), pa.float64()),
                "px_max": pa.array([-np.inf] * len(zlist), pa.float64()),
            }
        )
    )

    def finalize(group: pa.Table) -> pa.Table:
        cnt = int(group["count"].to_numpy().sum())
        s = float(group["px_sum"].to_numpy().sum())
        vmin = float(group["px_min"].to_numpy().min())
        vmax = float(group["px_max"].to_numpy().max())
        return pa.table(
            {
                "zone_id": pa.array(
                    [group["zone_id"][0].as_py()], pa.int64()),
                "count": pa.array([cnt], pa.int64()),
                "vmin": pa.array(
                    [vmin if cnt else None], pa.float64()),
                "vmax": pa.array(
                    [vmax if cnt else None], pa.float64()),
                "mean": pa.array(
                    [s / cnt if cnt else None], pa.float64()),
                "px_sum": pa.array([s], pa.float64()),
            }
        )

    partials = tiles_ds.map_batches(
        ZonalPartials, concurrency=(1, 8), batch_format="pyarrow"
    )
    return (
        partials.union(zeros)
        .groupby("zone_id")
        .map_groups(finalize, batch_format="pyarrow")
    )


# ---------------------------------------------------------------------------
# band_math
# ---------------------------------------------------------------------------

def normalized_difference(a: int = 1, b: int = 0):
    """(band_a - band_b) / (band_a + band_b) — the NDVI/NDWI family."""

    def fn(stack: dict[int, np.ndarray]) -> np.ndarray:
        A = stack[a]
        B = stack[b]
        den = A + B
        with np.errstate(divide="ignore", invalid="ignore"):
            out = (A - B) / den
        out[den == 0] = np.nan
        return out

    return fn


def band_math(tiles_ds, grid: OutputGrid, fn) -> tuple["object", OutputGrid]:
    """Per-pixel arithmetic over a tile's band stack -> new single-band
    float32 tile dataset (nullval NaN) + its OutputGrid.

    ``fn(stack)`` receives {band: float64 array (NaN at nulls)} and
    returns the output array. One groupby(tile_id) co-locates each tile's
    bands (the same shuffle granularity as assembly itself); pixels never
    widen beyond one tile per task.
    """
    nullval = grid.nullval
    np_dtype = np.dtype(grid.dtype)

    def per_tile(group: pa.Table) -> pa.Table:
        top = group["out_top"][0].as_py()
        left = group["out_left"][0].as_py()
        ys = group["out_ysize"][0].as_py()
        xs = group["out_xsize"][0].as_py()
        stack = {}
        for i in range(group.num_rows):
            arr = decode_payload(
                group["pixels"][i].as_buffer(),
                group["pixels_codec"][i].as_py(), np_dtype,
            ).reshape(ys, xs).astype(np.float64)
            arr[~_nonnull_mask(arr, nullval)] = np.nan
            stack[group["band"][i].as_py()] = arr
        out = fn(stack).astype(np.float32)
        payload, codec_tag = encode_payload(out, None)
        finite = out[np.isfinite(out)]
        return pa.Table.from_pydict(
            {
                "tile_id": [group["tile_id"][0].as_py()],
                "band": [0],
                "out_top": [top],
                "out_left": [left],
                "out_xsize": [xs],
                "out_ysize": [ys],
                "n_inputs": [group.num_rows],
                "input_ids": [[]],
                "nonnull_count": [int(np.isfinite(out).sum())],
                "px_sum": [float(finite.sum()) if len(finite) else 0.0],
                "px_ssq": [float((finite.astype(np.float64) ** 2).sum())
                           if len(finite) else 0.0],
                "px_min": [float(finite.min()) if len(finite) else np.inf],
                "px_max": [float(finite.max()) if len(finite) else -np.inf],
                "pixels_codec": [codec_tag],
                "pixels": [payload],
            },
            schema=TILE_SCHEMA,
        )

    out_grid = OutputGrid(
        ncols=grid.ncols, nrows=grid.nrows, transform=grid.transform,
        crs=grid.crs, dtype="float32", nullval=float("nan"), nbands=1,
        blocksize=grid.blocksize,
        row_edges=grid.row_edges, col_edges=grid.col_edges,
    )
    out_ds = tiles_ds.groupby("tile_id").map_groups(
        per_tile, batch_format="pyarrow"
    )
    return out_ds, out_grid


# ---------------------------------------------------------------------------
# focal_stats — tile-halo exchange stencil
# ---------------------------------------------------------------------------

_PIECE_SCHEMA = pa.schema(
    [
        ("tile_id", pa.int64()),      # TARGET tile
        ("band", pa.int32()),
        ("g_top", pa.int32()),        # piece position in GLOBAL pixels
        ("g_left", pa.int32()),
        ("g_ysize", pa.int32()),
        ("g_xsize", pa.int32()),
        ("pixels", pa.binary()),      # float64 C-order, NaN at nulls
    ]
)


def focal_stats(tiles_ds, grid: OutputGrid, stat: str = "mean",
                radius: int = 1, band: int = 0):
    """(2r+1)² neighborhood statistic over the mosaic with distributed
    halo exchange — the stencil pattern Ray Data lacks natively.

    Stage 1 (flat_map): every tile emits its full body to itself plus the
    <= 8 edge strips (width ``radius``) each neighbor tile needs — pieces
    are addressed in GLOBAL pixel coordinates, so assembly is pure
    paste-by-offset. Stage 2 (groupby(tile_id)): reassemble tile + halo
    on a padded canvas and run the kernel vectorized (shift-accumulate,
    9 adds for r=1 — no Python per pixel). A window's statistic uses the
    valid (non-null, in-bounds) cells only; a window with zero valid
    cells yields null (NaN).

    Output: float64 single-band tile dataset + its OutputGrid. Supported
    ``stat``: mean, min, max, range, sum, count.

    Partitioning assumption (documented per the custom-operator contract):
    tile + 2·radius halo fits one worker's heap, and halo duplication is
    O(tile perimeter × radius) — for a 512 px tile at r=1 that is < 1%
    payload overhead through the shuffle.
    """
    if stat not in ("mean", "min", "max", "range", "sum", "count"):
        raise ValueError(f"unsupported focal stat: {stat}")
    r = int(radius)
    pieces = _halo_pieces(grid, band, r)

    def body_fn(canvas: np.ndarray, ys: int, xs: int) -> np.ndarray:
        # shift-accumulate over the window, valid-cells-only semantics;
        # canvas is fully NaN-padded, so out-of-mosaic cells never count
        valid = np.isfinite(canvas)
        vals = np.where(valid, canvas, 0.0)
        cnt = np.zeros((ys, xs))
        ssum = np.zeros((ys, xs))
        smin = np.full((ys, xs), np.inf)
        smax = np.full((ys, xs), -np.inf)
        for dy in range(2 * r + 1):
            for dx in range(2 * r + 1):
                src = (slice(dy, dy + ys), slice(dx, dx + xs))
                v = valid[src]
                cnt += v
                ssum += vals[src]
                np.minimum(smin, np.where(v, canvas[src], np.inf), out=smin)
                np.maximum(smax, np.where(v, canvas[src], -np.inf), out=smax)
        with np.errstate(invalid="ignore", divide="ignore"):
            if stat == "mean":
                out = ssum / cnt
            elif stat == "sum":
                out = np.where(cnt > 0, ssum, np.nan)
            elif stat == "count":
                out = cnt.astype(np.float64)
            elif stat == "min":
                out = np.where(cnt > 0, smin, np.nan)
            elif stat == "max":
                out = np.where(cnt > 0, smax, np.nan)
            else:  # range
                out = np.where(cnt > 0, smax - smin, np.nan)
        out[cnt == 0] = np.nan if stat != "count" else 0.0
        return out

    return _stencil_reduce(tiles_ds, grid, pieces, r, body_fn)


def _halo_pieces(grid: OutputGrid, band: int, r: int):
    """Stage 1 of a halo-exchange stencil: every tile emits its full body
    to itself plus the <= 8 edge strips (width ``r``) each neighbor needs,
    addressed in GLOBAL pixel coordinates. Validates the one-hop reach."""
    min_dim = int(min(np.diff(grid.row_edges).min(),
                      np.diff(grid.col_edges).min()))
    if r > min_dim:
        # a window would reach past the adjacent tile; the one-hop halo
        # exchange only ships neighbor strips
        raise ValueError(
            f"radius {r} exceeds the smallest tile dimension "
            f"{min_dim}; re-tile with a larger blocksize"
        )
    nullval = grid.nullval
    np_dtype = np.dtype(grid.dtype)
    n_tile_cols = grid.n_tile_cols
    n_tile_rows = grid.n_tile_rows

    def pieces(batch: pa.Table) -> pa.Table:
        out = {k.name: [] for k in _PIECE_SCHEMA}
        for i in range(batch.num_rows):
            if batch["band"][i].as_py() != band:
                continue
            tid = batch["tile_id"][i].as_py()
            top = batch["out_top"][i].as_py()
            left = batch["out_left"][i].as_py()
            ys = batch["out_ysize"][i].as_py()
            xs = batch["out_xsize"][i].as_py()
            arr = decode_payload(
                batch["pixels"][i].as_buffer(),
                batch["pixels_codec"][i].as_py(), np_dtype,
            ).reshape(ys, xs).astype(np.float64)
            arr[~_nonnull_mask(arr, nullval)] = np.nan
            trow, tcol = divmod(tid, n_tile_cols)

            def emit(target, a, g_top, g_left):
                out["tile_id"].append(target)
                out["band"].append(band)
                out["g_top"].append(g_top)
                out["g_left"].append(g_left)
                out["g_ysize"].append(a.shape[0])
                out["g_xsize"].append(a.shape[1])
                out["pixels"].append(np.ascontiguousarray(a).tobytes())

            emit(tid, arr, top, left)
            for dr in (-1, 0, 1):
                for dc in (-1, 0, 1):
                    if dr == 0 and dc == 0:
                        continue
                    nr, nc = trow + dr, tcol + dc
                    if not (0 <= nr < n_tile_rows and 0 <= nc < n_tile_cols):
                        continue
                    # the strip the neighbor's halo needs is the edge of
                    # THIS tile facing it: a dr=-1 neighbor sits ABOVE and
                    # needs this tile's TOP r rows, etc.; dr/dc == 0 spans
                    # the full axis (regular grid => aligned tile edges)
                    if dr < 0:
                        ys0s, ys1s = 0, min(r, ys)
                    elif dr > 0:
                        ys0s, ys1s = max(ys - r, 0), ys
                    else:
                        ys0s, ys1s = 0, ys
                    if dc < 0:
                        xs0s, xs1s = 0, min(r, xs)
                    elif dc > 0:
                        xs0s, xs1s = max(xs - r, 0), xs
                    else:
                        xs0s, xs1s = 0, xs
                    strip = arr[ys0s:ys1s, xs0s:xs1s]
                    if strip.size == 0:
                        continue
                    emit(
                        int(nr * n_tile_cols + nc), strip,
                        top + ys0s, left + xs0s,
                    )
        return pa.Table.from_pydict(out, schema=_PIECE_SCHEMA)

    return pieces


def _assemble_padded(group: pa.Table, r: int, row_edges, col_edges,
                     n_tile_cols: int):
    """Reassemble one tile plus its radius-r halo onto a fully NaN-padded
    (ys+2r, xs+2r) canvas — out-of-mosaic cells stay NaN. Returns
    (tid, top, left, ys, xs, canvas)."""
    tid = group["tile_id"][0].as_py()
    trow, tcol = divmod(tid, n_tile_cols)
    top = int(row_edges[trow])
    ys = int(row_edges[trow + 1]) - top
    left = int(col_edges[tcol])
    xs = int(col_edges[tcol + 1]) - left
    canvas = np.full((ys + 2 * r, xs + 2 * r), np.nan)
    for i in range(group.num_rows):
        gt_ = group["g_top"][i].as_py()
        gl = group["g_left"][i].as_py()
        gy = group["g_ysize"][i].as_py()
        gx = group["g_xsize"][i].as_py()
        a = np.frombuffer(
            group["pixels"][i].as_buffer(), dtype=np.float64
        ).reshape(gy, gx)
        # clip the piece to this tile's padded window
        y0 = max(gt_, top - r)
        y1 = min(gt_ + gy, top + ys + r)
        x0 = max(gl, left - r)
        x1 = min(gl + gx, left + xs + r)
        if y1 <= y0 or x1 <= x0:
            continue
        canvas[y0 - (top - r):y1 - (top - r),
               x0 - (left - r):x1 - (left - r)] = \
            a[y0 - gt_:y1 - gt_, x0 - gl:x1 - gl]
    return tid, top, left, ys, xs, canvas


def _stencil_reduce(tiles_ds, grid: OutputGrid, pieces, r: int, body_fn):
    """Stage 2 of any halo-exchange stencil: groupby(tile_id) reassembles
    each tile plus halo onto a fully NaN-padded (ys+2r, xs+2r) canvas —
    out-of-mosaic cells stay NaN — and ``body_fn(canvas, ys, xs)`` returns
    the (ys, xs) float64 body, which becomes a TILE row."""
    n_tile_cols = grid.n_tile_cols
    row_edges = grid.row_edges.copy()
    col_edges = grid.col_edges.copy()

    def per_tile(group: pa.Table) -> pa.Table:
        tid, top, left, ys, xs, canvas = _assemble_padded(
            group, r, row_edges, col_edges, n_tile_cols)
        body = np.ascontiguousarray(body_fn(canvas, ys, xs))
        payload, codec_tag = encode_payload(body, None)
        finite = body[np.isfinite(body)]
        return pa.Table.from_pydict(
            {
                "tile_id": [tid],
                "band": [0],
                "out_top": [top],
                "out_left": [left],
                "out_xsize": [xs],
                "out_ysize": [ys],
                "n_inputs": [group.num_rows],
                "input_ids": [[]],
                "nonnull_count": [int(np.isfinite(body).sum())],
                "px_sum": [float(finite.sum()) if len(finite) else 0.0],
                "px_ssq": [float((finite ** 2).sum()) if len(finite) else 0.0],
                "px_min": [float(finite.min()) if len(finite) else np.inf],
                "px_max": [float(finite.max()) if len(finite) else -np.inf],
                "pixels_codec": [codec_tag],
                "pixels": [payload],
            },
            schema=TILE_SCHEMA,
        )

    out_grid = OutputGrid(
        ncols=grid.ncols, nrows=grid.nrows, transform=grid.transform,
        crs=grid.crs, dtype="float64", nullval=float("nan"), nbands=1,
        blocksize=grid.blocksize,
        row_edges=grid.row_edges, col_edges=grid.col_edges,
    )
    out_ds = (
        tiles_ds.map_batches(pieces, batch_format="pyarrow")
        .groupby("tile_id")
        .map_groups(per_tile, batch_format="pyarrow")
    )
    return out_ds, out_grid


# ---------------------------------------------------------------------------
# terrain — slope / aspect / hillshade (Horn 3x3 stencil on the halo machinery)
# ---------------------------------------------------------------------------

def terrain(tiles_ds, grid: OutputGrid, mode: str = "slope", band: int = 0,
            z_factor: float = 1.0, azimuth: float = 315.0,
            altitude: float = 45.0):
    """Terrain derivatives over the mosaic treated as a DEM, computed with
    the same tile-halo exchange as focal_stats (radius-1 Horn 1981 stencil,
    the algorithm gdaldem uses).

    Gradients per pixel over the 3x3 window (a..i row-major, e = center):
        dz/dx = ((c + 2f + i) - (a + 2d + g)) / (8 * xres)
        dz/dy = ((g + 2h + i) - (a + 2b + c)) / (8 * yres)   # toward SOUTH
    A pixel whose window touches a null or out-of-mosaic cell yields NaN
    (gdaldem's edge/nodata behavior).

    Modes:
    - "slope": degrees, atan(z_factor * hypot(dz/dx, dz/dy)).
    - "aspect": downslope azimuth in degrees clockwise from north
      (0=N, 90=E): degrees(atan2(-dz/dx, dz/dy)) mod 360; flat cells
      (zero gradient) yield NaN.
    - "hillshade": 0..255 illumination, sun at ``azimuth`` degrees
      (clockwise from north) and ``altitude`` degrees above horizon:
      255 * max(0, cos(zen)cos(s) + sin(zen)sin(s)cos(az - aspect)).

    Output: float64 single-band tile dataset + grid, like focal_stats.
    Same partitioning assumption: tile + 2px halo per worker, O(perimeter)
    shuffle duplication.
    """
    if mode not in ("slope", "aspect", "hillshade"):
        raise ValueError(f"unsupported terrain mode: {mode}")
    xres = abs(grid.transform[1])
    yres = abs(grid.transform[5])
    pieces = _halo_pieces(grid, band, 1)
    zf = float(z_factor)
    az_rad = np.deg2rad(float(azimuth))
    zen_rad = np.deg2rad(90.0 - float(altitude))

    def body_fn(canvas: np.ndarray, ys: int, xs: int) -> np.ndarray:
        a = canvas[0:ys, 0:xs]
        b = canvas[0:ys, 1:xs + 1]
        c = canvas[0:ys, 2:xs + 2]
        d = canvas[1:ys + 1, 0:xs]
        f = canvas[1:ys + 1, 2:xs + 2]
        g = canvas[2:ys + 2, 0:xs]
        h = canvas[2:ys + 2, 1:xs + 1]
        i_ = canvas[2:ys + 2, 2:xs + 2]
        # NaN anywhere in the window propagates -> NaN output
        dzdx = ((c + 2.0 * f + i_) - (a + 2.0 * d + g)) / (8.0 * xres)
        dzdy = ((g + 2.0 * h + i_) - (a + 2.0 * b + c)) / (8.0 * yres)
        with np.errstate(invalid="ignore"):
            if mode == "slope":
                return np.degrees(np.arctan(zf * np.hypot(dzdx, dzdy)))
            flat = np.hypot(dzdx, dzdy) == 0.0
            asp = np.arctan2(-dzdx, dzdy)  # radians, cw from north
            if mode == "aspect":
                out = np.degrees(asp) % 360.0
                out[flat] = np.nan
                return out
            slope_rad = np.arctan(zf * np.hypot(dzdx, dzdy))
            hs = (np.cos(zen_rad) * np.cos(slope_rad)
                  + np.sin(zen_rad) * np.sin(slope_rad)
                  * np.cos(az_rad - asp))
            return 255.0 * np.clip(hs, 0.0, 1.0)

    return _stencil_reduce(tiles_ds, grid, pieces, 1, body_fn)


# ---------------------------------------------------------------------------
# contour_lines — raster -> vector isolines (marching squares on the halo)
# ---------------------------------------------------------------------------

# case index: 8*TL + 4*TR + 2*BR + 1*BL (bit set = corner >= level);
# values are (edge, edge) pairs from {t, r, b, l}; 5/10 are saddles
# resolved by the cell-center average (standard marching squares)
_MS_SEGMENTS = {
    1: (("l", "b"),), 2: (("b", "r"),), 3: (("l", "r"),),
    4: (("t", "r"),), 6: (("t", "b"),), 7: (("l", "t"),),
    8: (("l", "t"),), 9: (("t", "b"),), 11: (("t", "r"),),
    12: (("l", "r"),), 13: (("b", "r"),), 14: (("l", "b"),),
}


def contour_lines(tiles_ds, grid: OutputGrid, levels, band: int = 0):
    """Isoline extraction (marching squares with linear interpolation —
    the gdal_contour algorithm) as a raster->vector halo stencil.

    Each 2x2-pixel cell is OWNED by the tile holding its top-left pixel;
    the radius-1 halo supplies the right/bottom neighbors, so seam cells
    compute identically to a single-canvas run — segments need no
    stitching pass. Cells touching a null (NaN) pixel emit nothing.
    Saddle cells disambiguate by the cell-center average, endpoints are
    normalized lexicographically: output is fully deterministic.

    Output rows: (tile_id, level, x0, y0, x1, y1) in world coordinates.
    Same partitioning contract as focal_stats/terrain.
    """
    levels = [float(lv) for lv in levels]
    gt = grid.transform
    pieces = _halo_pieces(grid, band, 1)
    n_tile_cols = grid.n_tile_cols
    row_edges = grid.row_edges.copy()
    col_edges = grid.col_edges.copy()
    nrows, ncols = grid.nrows, grid.ncols

    def per_tile(group: pa.Table) -> pa.Table:
        tid, top, left, ys, xs, canvas = _assemble_padded(
            group, 1, row_edges, col_edges, n_tile_cols)
        # owned cells: top-left pixel inside the tile body AND not on the
        # mosaic's last row/col (a cell spans two pixels per axis)
        ch = min(ys, nrows - 1 - top)
        cw = min(xs, ncols - 1 - left)
        out_lv, out_seg = [], []
        if ch > 0 and cw > 0:
            z00 = canvas[1:1 + ch, 1:1 + cw]
            z01 = canvas[1:1 + ch, 2:2 + cw]
            z10 = canvas[2:2 + ch, 1:1 + cw]
            z11 = canvas[2:2 + ch, 2:2 + cw]
            valid = (np.isfinite(z00) & np.isfinite(z01)
                     & np.isfinite(z10) & np.isfinite(z11))
            # global pixel-center coords of each cell's TL corner
            gr = top + np.arange(ch, dtype=np.float64)[:, None] + 0.5
            gc = left + np.arange(cw, dtype=np.float64)[None, :] + 0.5
            gr = np.broadcast_to(gr, (ch, cw))
            gc = np.broadcast_to(gc, (ch, cw))
            for lv in levels:
                idx = np.where(
                    valid,
                    8 * (z00 >= lv) + 4 * (z01 >= lv)
                    + 2 * (z11 >= lv) + 1 * (z10 >= lv),
                    0,
                )

                def edge_pts(name, m):
                    with np.errstate(divide="ignore", invalid="ignore"):
                        if name == "t":
                            t = (lv - z00[m]) / (z01[m] - z00[m])
                            return gc[m] + t, gr[m]
                        if name == "b":
                            t = (lv - z10[m]) / (z11[m] - z10[m])
                            return gc[m] + t, gr[m] + 1.0
                        if name == "l":
                            t = (lv - z00[m]) / (z10[m] - z00[m])
                            return gc[m], gr[m] + t
                        t = (lv - z01[m]) / (z11[m] - z01[m])
                        return gc[m] + 1.0, gr[m] + t

                def emit(m, segs):
                    if not m.any():
                        return
                    for e0, e1 in segs:
                        x0, y0 = edge_pts(e0, m)
                        x1, y1 = edge_pts(e1, m)
                        # lexicographic endpoint normalization
                        swap = (x1 < x0) | ((x1 == x0) & (y1 < y0))
                        nx0 = np.where(swap, x1, x0)
                        ny0 = np.where(swap, y1, y0)
                        nx1 = np.where(swap, x0, x1)
                        ny1 = np.where(swap, y0, y1)
                        out_lv.append(np.full(nx0.size, lv))
                        out_seg.append(np.stack([nx0, ny0, nx1, ny1], 1))

                for case, segs in _MS_SEGMENTS.items():
                    emit(idx == case, segs)
                center = (z00 + z01 + z10 + z11) / 4.0
                emit((idx == 5) & (center >= lv), (("l", "t"), ("b", "r")))
                emit((idx == 5) & (center < lv), (("l", "b"), ("t", "r")))
                emit((idx == 10) & (center >= lv), (("t", "r"), ("l", "b")))
                emit((idx == 10) & (center < lv), (("l", "t"), ("b", "r")))
        if out_lv:
            lv_col = np.concatenate(out_lv)
            seg = np.concatenate(out_seg, axis=0)
        else:
            lv_col = np.empty(0)
            seg = np.empty((0, 4))
        # pixel coords -> world via the grid geotransform
        wx0 = gt[0] + gt[1] * seg[:, 0] + gt[2] * seg[:, 1]
        wy0 = gt[3] + gt[4] * seg[:, 0] + gt[5] * seg[:, 1]
        wx1 = gt[0] + gt[1] * seg[:, 2] + gt[2] * seg[:, 3]
        wy1 = gt[3] + gt[4] * seg[:, 2] + gt[5] * seg[:, 3]
        return pa.table({
            "tile_id": pa.array(np.full(lv_col.size, tid, np.int64)),
            "level": pa.array(lv_col, pa.float64()),
            "x0": pa.array(wx0, pa.float64()),
            "y0": pa.array(wy0, pa.float64()),
            "x1": pa.array(wx1, pa.float64()),
            "y1": pa.array(wy1, pa.float64()),
        })

    return (
        tiles_ds.map_batches(pieces, batch_format="pyarrow")
        .groupby("tile_id")
        .map_groups(per_tile, batch_format="pyarrow")
    )


def proximity(tiles_ds, grid: OutputGrid, target_value: float | None = None,
              max_distance: int = 8, band: int = 0):
    """Proximity raster (the gdal_proximity analog): per-pixel exact
    Euclidean distance, in PIXELS, to the nearest target pixel within
    ``max_distance`` — target pixels read 0, pixels with no target in
    range read NaN (beyond-range, like GDAL's nodata fill).

    ``target_value=None`` targets every non-null pixel; otherwise pixels
    equal to ``target_value``.

    Distributed shape: the focal/terrain halo-exchange stencil with
    radius = max_distance (exactness bound: any target within the radius
    lives in the tile-plus-halo canvas, so tiles compute independently and
    seams are exact). Per-tile kernel is a vectorized offset scan over the
    <= (2r+1)^2 in-disk displacements — no per-pixel Python. Halo payload
    grows O(perimeter x r); the one-hop constraint (r <= tile dim) is
    validated by _halo_pieces.
    """
    r = int(max_distance)
    pieces = _halo_pieces(grid, band, r)
    r2 = r * r

    def body_fn(canvas: np.ndarray, ys: int, xs: int) -> np.ndarray:
        if target_value is None:
            tgt = np.isfinite(canvas)
        else:
            tgt = canvas == float(target_value)
        best = np.full((ys, xs), np.inf)
        for dy in range(-r, r + 1):
            row2 = dy * dy
            if row2 > r2:
                continue
            for dx in range(-r, r + 1):
                d2 = row2 + dx * dx
                if d2 > r2:
                    continue
                sub = tgt[r + dy: r + dy + ys, r + dx: r + dx + xs]
                np.minimum(best, np.where(sub, float(d2), np.inf),
                           out=best)
        out = np.sqrt(best)
        out[~np.isfinite(out)] = np.nan
        return out

    return _stencil_reduce(tiles_ds, grid, pieces, r, body_fn)
