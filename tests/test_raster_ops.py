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
