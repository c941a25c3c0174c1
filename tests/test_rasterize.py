"""Vector -> raster burn-in (ops/vector.py:rasterize_features) vs the
independent SCANLINE-fill oracle (moaray/oracle.py:rasterize — a different
fill algorithm from the engine's per-point ray cast). No reference
counterpart (moamosaic is raster-only); this is the gdal_rasterize analog
and the inverse of polygonize_footprints."""

import numpy as np
import pyarrow as pa
import ray

from moaray import oracle
from moaray.geo import OutputGrid, make_output_grid
from moaray.ops.vector import (
    footprint_polygon,
    parse_wkt_polygon,
    polygon_wkt,
    rasterize_features,
)
from moaray.pipelines.mosaic import mosaic_array
from moaray.testgen import ORIGIN_X, ORIGIN_Y, PIX, Layout, metas_for_layout


def _grid(n=192, blocksize=64):
    return OutputGrid(
        ncols=n, nrows=n,
        transform=(ORIGIN_X, PIX, 0.0, ORIGIN_Y, 0.0, -PIX),
        crs="EPSG:32756", dtype="uint16", nullval=0.0,
        nbands=1, blocksize=blocksize,
    )


def _run(grid, wkts, values):
    feats = ray.data.from_arrow(pa.table({
        "wkt": pa.array(wkts, pa.string()),
        "value": pa.array([float(v) for v in values], pa.float64()),
        "seq": pa.array(np.arange(len(wkts), dtype=np.int64)),
    }))
    tiles = rasterize_features(feats, grid)
    return mosaic_array(tiles, grid)


def _truth(grid, wkts, values):
    feats = [(i, v, parse_wkt_polygon(w))
             for i, (w, v) in enumerate(zip(wkts, values))]
    return oracle.rasterize(grid, feats)


def test_pixel_aligned_rectangle_exact_count(ray_session):
    """A rectangle on pixel boundaries burns exactly its pixel area (the
    center-inside rule has no boundary ambiguity here)."""
    grid = _grid()
    x0 = ORIGIN_X + 10 * PIX
    x1 = ORIGIN_X + 50 * PIX
    y0 = ORIGIN_Y - 70 * PIX  # lower edge (y decreases downward)
    y1 = ORIGIN_Y - 20 * PIX  # upper edge
    wkt = (f"POLYGON (({x0} {y0}, {x1} {y0}, {x1} {y1}, {x0} {y1}, "
           f"{x0} {y0}))")
    got = _run(grid, [wkt], [7])
    assert int((got == 7).sum()) == 40 * 50
    assert (got[20:70, 10:50] == 7).all()
    truth = _truth(grid, [wkt], [7])
    assert (got == truth).all()


def test_footprints_roundtrip_vs_oracle(ray_session):
    """polygonize -> rasterize composition: burn each image's footprint
    with value i+1 in seq order; engine == scanline oracle everywhere."""
    layout = Layout("grid3x3", 9, 64)
    metas = metas_for_layout(layout, ("raw16",))
    grid = make_output_grid(metas, blocksize=64)
    wkts = [polygon_wkt(footprint_polygon(m)) for m in metas]
    values = list(range(1, len(metas) + 1))
    got = _run(grid, wkts, values)
    truth = _truth(grid, wkts, values)
    assert (got == truth).all()
    # overlaps exist and resolve last-wins: the later value owns the seam
    assert (truth > 0).any()
    assert set(np.unique(truth)) - {0} == set(values[:])


def test_random_triangles_cross_tiles(ray_session):
    """Seeded triangles spanning tile boundaries; exact engine == oracle,
    with genuine overlap (last-wins exercised) and multi-tile fan-out."""
    grid = _grid()
    rng = np.random.RandomState(11)
    wkts, values = [], []
    for i in range(12):
        pts = rng.uniform(0, 192, size=(3, 2))
        ring = [(ORIGIN_X + c * PIX, ORIGIN_Y - r * PIX) for c, r in pts]
        pts_s = ", ".join(f"{x:.6f} {y:.6f}" for x, y in ring)
        wkts.append(f"POLYGON (({pts_s}, {ring[0][0]:.6f} {ring[0][1]:.6f}))")
        values.append(i + 1)
    got = _run(grid, wkts, values)
    truth = _truth(grid, wkts, values)
    assert (got == truth).all()
    assert len(set(np.unique(truth)) - {0}) >= 6
