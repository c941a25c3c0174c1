"""Raster analytics operators (ops/raster.py) vs independent driver-side
oracles: zonal stats against per-pixel PIP over the reassembled canvas,
band math against the per-band truth arrays, focal stats against a
brute-force window scan (no shift-accumulate shortcuts)."""

import numpy as np
import pytest

from moaray import MosaicConfig, do_mosaic
from moaray.geo import apply_geotransform
from moaray.ops.raster import (
    band_math,
    focal_stats,
    normalized_difference,
    zonal_stats,
)
from moaray.ops.vector import point_in_polygon
from moaray.pipelines.mosaic import mosaic_array
from moaray.testgen import Layout, gen_images_table, images_path


def _mosaic(layout_name="grid3x3", n=9, size=64, **cfg_kw):
    layout = Layout(layout_name, n, size)
    path = images_path(layout)
    cfg = MosaicConfig(layout=layout, blocksize=64, **cfg_kw)
    res = do_mosaic(path, cfg)
    return res, mosaic_array(res.tiles_ds, res.grid)


def _world_rect(gt, px0, py0, px1, py1):
    """Pixel-space rect corners -> world-coordinate polygon."""
    pts = [(px0, py0), (px1, py0), (px1, py1), (px0, py1)]
    return np.array(
        [apply_geotransform(gt, x, y) for x, y in pts], dtype=np.float64
    )


def _centers(grid):
    gt = grid.transform
    px = 0.5 + np.arange(grid.ncols, dtype=np.float64)
    py = 0.5 + np.arange(grid.nrows, dtype=np.float64)
    pxg, pyg = np.meshgrid(px, py)
    return (gt[0] + gt[1] * pxg + gt[2] * pyg,
            gt[3] + gt[4] * pxg + gt[5] * pyg)


def test_zonal_stats_vs_pip_oracle(ray_session):
    res, canvas = _mosaic()
    grid = res.grid
    gt = grid.transform
    # a rect inside the mosaic, a triangle straddling tile boundaries,
    # and a rect far outside (zero pixels)
    zones = [
        (1, _world_rect(gt, 10, 20, 50, 80)),
        (2, np.array([apply_geotransform(gt, 30.0, 30.0),
                      apply_geotransform(gt, 170.0, 40.0),
                      apply_geotransform(gt, 90.0, 160.0)])),
        (3, _world_rect(gt, 10000, 10000, 10010, 10010)),
    ]
    out = (zonal_stats(res.tiles_ds, grid, zones).to_pandas()
           .set_index("zone_id").sort_index())
    assert list(out.index) == [1, 2, 3]

    x, y = _centers(grid)
    valid = canvas != grid.nullval
    for zid, poly in zones:
        inside = point_in_polygon(x.ravel(), y.ravel(), poly).reshape(
            canvas.shape)
        m = inside & valid
        vals = canvas[m].astype(np.float64)
        row = out.loc[zid]
        assert row["count"] == m.sum()
        if m.sum():
            assert row["vmin"] == vals.min()
            assert row["vmax"] == vals.max()
            assert row["px_sum"] == pytest.approx(vals.sum(), rel=1e-12)
            assert row["mean"] == pytest.approx(vals.mean(), rel=1e-12)
        else:
            assert np.isnan(row["vmin"]) and np.isnan(row["mean"])


def test_band_math_ndi_vs_truth(ray_session, tmp_path):
    import pyarrow.parquet as pq

    layout = Layout("grid3x3", 9, 64)
    tbl = gen_images_table(layout, ("raw16",), nbands=2)
    p = tmp_path / "imgs"
    p.mkdir()
    pq.write_table(tbl, str(p / "part-0.parquet"))
    res = do_mosaic(str(p), MosaicConfig(layout=layout, blocksize=64))

    out_ds, out_grid = band_math(res.tiles_ds, res.grid,
                                 normalized_difference(1, 0))
    got = mosaic_array(out_ds, out_grid)
    assert got.dtype == np.float32 and out_grid.nbands == 1

    b0 = mosaic_array(res.tiles_ds, res.grid, band=0).astype(np.float64)
    b1 = mosaic_array(res.tiles_ds, res.grid, band=1).astype(np.float64)
    b0[b0 == res.grid.nullval] = np.nan
    b1[mosaic_array(res.tiles_ds, res.grid, band=1) == res.grid.nullval] \
        = np.nan
    den = b1 + b0
    with np.errstate(divide="ignore", invalid="ignore"):
        truth = (b1 - b0) / den
    truth[den == 0] = np.nan
    assert (np.isnan(got) == np.isnan(truth)).all()
    ok = ~np.isnan(truth)
    assert np.allclose(got[ok], truth[ok].astype(np.float32), rtol=1e-6)


def _focal_oracle(canvas_nan, r, stat):
    h, w = canvas_nan.shape
    out = np.full((h, w), np.nan)
    for i in range(h):
        for j in range(w):
            win = canvas_nan[max(i - r, 0):i + r + 1,
                             max(j - r, 0):j + r + 1]
            v = win[np.isfinite(win)]
            if stat == "count":
                out[i, j] = len(v)
                continue
            if not len(v):
                continue
            if stat == "mean":
                out[i, j] = v.mean()
            elif stat == "min":
                out[i, j] = v.min()
            elif stat == "max":
                out[i, j] = v.max()
            elif stat == "range":
                out[i, j] = v.max() - v.min()
            elif stat == "sum":
                out[i, j] = v.sum()
    return out


@pytest.mark.parametrize("stat,radius", [("mean", 1), ("min", 2),
                                         ("count", 1), ("range", 1)])
def test_focal_stats_vs_bruteforce(ray_session, stat, radius):
    # sparse_gap has genuinely empty tiles -> null windows cross tile
    # boundaries, exercising the halo exchange against missing data
    res, canvas = _mosaic("sparse_gap", 4, 64)
    grid = res.grid
    cf = canvas.astype(np.float64)
    cf[canvas == grid.nullval] = np.nan

    out_ds, out_grid = focal_stats(res.tiles_ds, grid, stat=stat,
                                   radius=radius)
    got = mosaic_array(out_ds, out_grid)
    truth = _focal_oracle(cf, radius, stat)
    assert (np.isnan(got) == np.isnan(truth)).all()
    ok = ~np.isnan(truth)
    if stat in ("min", "max", "count", "range"):
        assert (got[ok] == truth[ok]).all()
    else:
        assert np.allclose(got[ok], truth[ok], rtol=1e-12)


def test_focal_radius_guard(ray_session):
    res, _ = _mosaic("pair_overlap", 2, 64)
    with pytest.raises(ValueError, match="radius"):
        focal_stats(res.tiles_ds, res.grid, radius=10_000)


# ---------------------------------------------------------------------------
# terrain (slope / aspect / hillshade)
# ---------------------------------------------------------------------------

def _dem_mosaic(dem, tmp_path, blocksize=64):
    """Feed a float64 DEM array through do_mosaic as a 1-image catalog."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from moaray import codecs
    from moaray.testgen import ORIGIN_X, ORIGIN_Y, PIX

    gt = (ORIGIN_X, PIX, 0.0, ORIGIN_Y, 0.0, -PIX)
    tbl = pa.table({
        "image_id": ["img00000000"],
        "bytes": pa.array([codecs.encode(dem, "z16")], pa.binary()),
        "w": pa.array([dem.shape[1]], pa.int32()),
        "h": pa.array([dem.shape[0]], pa.int32()),
        "fmt": ["z16"], "caption": ["dem"],
        "phash": pa.array([0], pa.int64()),
        "gt": pa.array([list(gt)], pa.list_(pa.float64(), 6)),
        "crs": ["EPSG:32756"],
        "nullval": pa.array([float("nan")], pa.float64()),
        "dtype": ["float64"],
    })
    d = tmp_path / "dem"
    d.mkdir()
    pq.write_table(tbl, str(d / "p.parquet"))
    return do_mosaic(str(d), MosaicConfig(blocksize=blocksize,
                                          do_pyramids=False, do_stats=False))


def _terrain_oracle(dem, mode, xres, yres, z_factor=1.0,
                    azimuth=315.0, altitude=45.0):
    """Per-pixel nested-loop Horn stencil (independent of the vectorized
    engine path): NaN wherever the 3x3 window leaves the array."""
    h, w = dem.shape
    out = np.full((h, w), np.nan)
    for rr in range(1, h - 1):
        for cc in range(1, w - 1):
            win = dem[rr - 1:rr + 2, cc - 1:cc + 2]
            if not np.isfinite(win).all():
                continue
            a, b, c = win[0]
            d, _e, f = win[1]
            g, hh, i = win[2]
            dzdx = ((c + 2 * f + i) - (a + 2 * d + g)) / (8 * xres)
            dzdy = ((g + 2 * hh + i) - (a + 2 * b + c)) / (8 * yres)
            slope = np.arctan(z_factor * np.hypot(dzdx, dzdy))
            if mode == "slope":
                out[rr, cc] = np.degrees(slope)
            elif mode == "aspect":
                if dzdx == 0 and dzdy == 0:
                    continue
                out[rr, cc] = np.degrees(np.arctan2(-dzdx, dzdy)) % 360.0
            else:
                az = np.deg2rad(azimuth)
                zen = np.deg2rad(90.0 - altitude)
                asp = np.arctan2(-dzdx, dzdy)
                hs = (np.cos(zen) * np.cos(slope)
                      + np.sin(zen) * np.sin(slope) * np.cos(az - asp))
                out[rr, cc] = 255.0 * min(max(hs, 0.0), 1.0)
    return out


def test_terrain_planar_closed_form(tmp_path, ray_session):
    """z = 3*col + 5*row plane: constant analytic slope/aspect everywhere
    in the interior, NaN ring at the mosaic boundary; exercises the halo
    across the 2x2 tile seams (128px DEM, 64px tiles)."""
    from moaray.ops.raster import terrain
    from moaray.testgen import PIX

    rr, cc = np.meshgrid(np.arange(128.0), np.arange(128.0), indexing="ij")
    dem = 3.0 * cc + 5.0 * rr
    res = _dem_mosaic(dem, tmp_path)

    slope_ds, sgrid = terrain(res.tiles_ds, res.grid, mode="slope")
    slope = mosaic_array(slope_ds, sgrid)
    want_slope = np.degrees(np.arctan(np.hypot(3.0 / PIX, 5.0 / PIX)))
    assert np.isnan(slope[0]).all() and np.isnan(slope[:, -1]).all()
    interior = slope[1:-1, 1:-1]
    assert np.allclose(interior, want_slope, atol=1e-9)

    aspect_ds, agrid = terrain(res.tiles_ds, res.grid, mode="aspect")
    aspect = mosaic_array(aspect_ds, agrid)
    # z grows east+south -> downslope west+north: atan2(-0.3, 0.5)
    want_aspect = np.degrees(np.arctan2(-3.0 / PIX, 5.0 / PIX)) % 360.0
    assert np.allclose(aspect[1:-1, 1:-1], want_aspect, atol=1e-9)


def test_terrain_random_dem_vs_oracle(tmp_path, ray_session):
    """Random rough DEM, all three modes vs the per-pixel nested-loop
    oracle — including NaN placement (boundary ring)."""
    from moaray.ops.raster import terrain
    from moaray.testgen import PIX

    rng = np.random.default_rng(7)
    dem = np.cumsum(rng.normal(0, 2.0, (96, 96)), axis=1) + \
        np.cumsum(rng.normal(0, 2.0, (96, 96)), axis=0) + 500.0
    res = _dem_mosaic(dem, tmp_path, blocksize=32)
    for mode in ("slope", "aspect", "hillshade"):
        kw = dict(z_factor=2.0) if mode == "slope" else {}
        out_ds, ogrid = terrain(res.tiles_ds, res.grid, mode=mode, **kw)
        got = mosaic_array(out_ds, ogrid)
        truth = _terrain_oracle(dem, mode, PIX, PIX, **kw)
        assert np.array_equal(np.isnan(got), np.isnan(truth)), mode
        m = ~np.isnan(truth)
        assert np.allclose(got[m], truth[m], atol=1e-9), mode


# ---------------------------------------------------------------------------
# contour_lines (marching squares)
# ---------------------------------------------------------------------------

def _contour_oracle(dem, levels, gt):
    """Scalar marching squares over the full canvas (independent of the
    engine's vectorized per-case path): returns a set of rounded segment
    tuples with lexicographically normalized endpoints."""
    segs = set()
    h, w = dem.shape
    for rr in range(h - 1):
        for cc in range(w - 1):
            z00, z01 = dem[rr, cc], dem[rr, cc + 1]
            z10, z11 = dem[rr + 1, cc], dem[rr + 1, cc + 1]
            if not np.isfinite([z00, z01, z10, z11]).all():
                continue
            for lv in levels:
                idx = (8 * (z00 >= lv) + 4 * (z01 >= lv)
                       + 2 * (z11 >= lv) + 1 * (z10 >= lv))
                if idx in (0, 15):
                    continue

                def pt(edge):
                    if edge == "t":
                        t = (lv - z00) / (z01 - z00)
                        return cc + 0.5 + t, rr + 0.5
                    if edge == "b":
                        t = (lv - z10) / (z11 - z10)
                        return cc + 0.5 + t, rr + 1.5
                    if edge == "l":
                        t = (lv - z00) / (z10 - z00)
                        return cc + 0.5, rr + 0.5 + t
                    t = (lv - z01) / (z11 - z01)
                    return cc + 1.5, rr + 0.5 + t

                table = {
                    1: (("l", "b"),), 2: (("b", "r"),), 3: (("l", "r"),),
                    4: (("t", "r"),), 6: (("t", "b"),), 7: (("l", "t"),),
                    8: (("l", "t"),), 9: (("t", "b"),), 11: (("t", "r"),),
                    12: (("l", "r"),), 13: (("b", "r"),), 14: (("l", "b"),),
                }
                if idx == 5:
                    pairs = ((("l", "t"), ("b", "r"))
                             if (z00 + z01 + z10 + z11) / 4.0 >= lv
                             else (("l", "b"), ("t", "r")))
                elif idx == 10:
                    pairs = ((("t", "r"), ("l", "b"))
                             if (z00 + z01 + z10 + z11) / 4.0 >= lv
                             else (("l", "t"), ("b", "r")))
                else:
                    pairs = table[idx]
                for e0, e1 in pairs:
                    p0, p1 = pt(e0), pt(e1)
                    if p1 < p0:
                        p0, p1 = p1, p0
                    w0 = (gt[0] + gt[1] * p0[0] + gt[2] * p0[1],
                          gt[3] + gt[4] * p0[0] + gt[5] * p0[1])
                    w1 = (gt[0] + gt[1] * p1[0] + gt[2] * p1[1],
                          gt[3] + gt[4] * p1[0] + gt[5] * p1[1])
                    # float() first: round(np.float64) rounds via scaled
                    # np.round and can differ from python-float rounding
                    # by 1 in the last digit at exact .5 boundaries
                    segs.add((float(lv), round(float(w0[0]), 6),
                              round(float(w0[1]), 6),
                              round(float(w1[0]), 6),
                              round(float(w1[1]), 6)))
    return segs


def test_contour_ramp_vertical_lines(tmp_path, ray_session):
    """Linear ramp z = col: every contour is a vertical line at the
    interpolated column; seams across the 2x2 tile grid must be seamless."""
    from moaray.ops.raster import contour_lines
    from moaray.testgen import ORIGIN_X, PIX

    rr, cc = np.meshgrid(np.arange(128.0), np.arange(128.0), indexing="ij")
    dem = cc.copy()
    res = _dem_mosaic(dem, tmp_path)
    out = contour_lines(res.tiles_ds, res.grid, levels=[40.5]).to_pandas()
    # one vertical segment per cell row: 127 segments at x where col=40.5
    assert len(out) == 127
    want_x = ORIGIN_X + (40.5 + 0.5) * PIX
    assert np.allclose(out["x0"], want_x) and np.allclose(out["x1"], want_x)
    # vertical continuity: unit-pixel segments tiling the full height
    ys = np.sort(np.concatenate([out["y0"].values, out["y1"].values]))
    assert np.isclose(ys.max() - ys.min(), 127 * PIX)


def test_contour_random_dem_vs_oracle(tmp_path, ray_session):
    """Random rough DEM with a null hole: engine segments (across 9 tile
    seams) must equal the single-canvas scalar oracle exactly, including
    saddle disambiguation and NaN-cell suppression."""
    from moaray.ops.raster import contour_lines

    rng = np.random.default_rng(11)
    dem = np.cumsum(rng.normal(0, 1.0, (96, 96)), axis=0) + 50.0
    dem[40:48, 50:60] = np.nan  # null hole
    res = _dem_mosaic(dem, tmp_path, blocksize=32)
    levels = [45.0, 50.0, 55.0]
    out = contour_lines(res.tiles_ds, res.grid, levels=levels).to_pandas()
    got = {
        (float(lv), round(float(a), 6), round(float(b), 6),
         round(float(c), 6), round(float(d), 6))
        for lv, a, b, c, d in zip(out["level"], out["x0"], out["y0"],
                                  out["x1"], out["y1"])
    }
    truth = _contour_oracle(dem, levels, res.grid.transform)
    assert truth, "oracle produced no segments — fixture degenerate"
    assert got == truth


def test_zonal_stats_rotated_geotransform(ray_session):
    """Rotated grids can't separate the bbox test per axis — zonal_stats
    must take the full-tile PIP fallback and still match the per-pixel
    oracle. Hand-built 2x2-tile dataset on a 30-degree-rotated grid."""
    import pyarrow as pa
    import ray

    from moaray.geo import OutputGrid
    from moaray.stages.assemble import TILE_SCHEMA, encode_payload

    rng = np.random.RandomState(3)
    n = 64
    canvas = (rng.rand(n, n) * 60000).astype(np.uint16)
    canvas[canvas == 0] = 1
    canvas[10:20, 40:50] = 0  # a null hole
    c, s = np.cos(np.deg2rad(30)), np.sin(np.deg2rad(30))
    gt = (1000.0, 2.0 * c, -2.0 * s, 500.0, 2.0 * s, 2.0 * c)
    grid = OutputGrid(ncols=n, nrows=n, transform=gt, crs="local",
                      dtype="uint16", nullval=0.0, nbands=1, blocksize=32)
    rows = {k.name: [] for k in TILE_SCHEMA}
    for tr in range(2):
        for tc in range(2):
            a = canvas[tr * 32:(tr + 1) * 32, tc * 32:(tc + 1) * 32]
            payload, codec = encode_payload(a, None)
            fin = a[a != 0].astype(np.float64)
            rows["tile_id"].append(tr * 2 + tc)
            rows["band"].append(0)
            rows["out_top"].append(tr * 32)
            rows["out_left"].append(tc * 32)
            rows["out_xsize"].append(32)
            rows["out_ysize"].append(32)
            rows["n_inputs"].append(1)
            rows["input_ids"].append([])
            rows["nonnull_count"].append(int((a != 0).sum()))
            rows["px_sum"].append(float(fin.sum()))
            rows["px_ssq"].append(float((fin ** 2).sum()))
            rows["px_min"].append(float(fin.min()))
            rows["px_max"].append(float(fin.max()))
            rows["pixels_codec"].append(codec)
            rows["pixels"].append(payload)
    tiles = ray.data.from_arrow(pa.Table.from_pydict(rows, schema=TILE_SCHEMA))

    zones = [
        (1, _world_rect(gt, 4, 4, 28, 28)),        # inside one tile
        (2, _world_rect(gt, 16, 8, 56, 48)),       # straddles all 4 tiles
        (3, _world_rect(gt, 500, 500, 510, 510)),  # far outside
    ]
    out = {r["zone_id"]: r for r in
           zonal_stats(tiles, grid, zones).take_all()}
    x, y = _centers(grid)
    valid = canvas != 0
    for zid, poly in zones:
        inside = point_in_polygon(x.ravel(), y.ravel(), poly).reshape(n, n)
        m = inside & valid
        r = out[zid]
        assert r["count"] == m.sum(), zid
        if m.sum():
            v = canvas[m].astype(np.float64)
            assert r["vmin"] == v.min() and r["vmax"] == v.max()
            assert r["px_sum"] == pytest.approx(v.sum(), rel=1e-12)
        else:
            assert r["vmin"] is None or np.isnan(r["vmin"])


def _proximity_oracle(dem, target_value, r):
    """Single-canvas brute force: exact min distance to target, cap r."""
    if target_value is None:
        tgt = np.isfinite(dem)
    else:
        tgt = dem == target_value
    ty, tx = np.nonzero(tgt)
    out = np.full(dem.shape, np.nan)
    for y in range(dem.shape[0]):
        for x in range(dem.shape[1]):
            if len(ty) == 0:
                continue
            d2 = (ty - y) ** 2 + (tx - x) ** 2
            d = np.sqrt(d2.min())
            if d <= r:
                out[y, x] = np.sqrt(float(d2.min()))
    return out


def test_proximity_vs_oracle(tmp_path, ray_session):
    """Sparse targets + NaN holes across 9 tile seams must equal the
    single-canvas brute force bitwise (sqrt of identical int d2)."""
    from moaray.ops.raster import proximity
    from moaray.pipelines.mosaic import mosaic_array

    rng = np.random.default_rng(13)
    dem = np.full((96, 96), 7.0)
    # scatter 40 target pixels (value 99), some near seams
    yy = rng.integers(0, 96, 40)
    xx = rng.integers(0, 96, 40)
    dem[yy, xx] = 99.0
    dem[50:58, 10:20] = np.nan  # hole may swallow a target — exclude those
    keep = ~((yy >= 50) & (yy < 58) & (xx >= 10) & (xx < 20))
    yy, xx = yy[keep], xx[keep]
    res = _dem_mosaic(dem, tmp_path, blocksize=32)
    out_ds, out_grid = proximity(res.tiles_ds, res.grid,
                                 target_value=99.0, max_distance=7)
    got = mosaic_array(out_ds, out_grid)
    want = _proximity_oracle(dem, 99.0, 7)
    assert np.array_equal(np.isnan(got), np.isnan(want))
    m = ~np.isnan(want)
    assert np.array_equal(got[m], want[m])
    # target pixels read 0
    assert (got[yy, xx] == 0).all()
