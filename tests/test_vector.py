"""Raster<->vector operators: polygonization, point-in-polygon, clipping,
and the polygon-refined tile coverage (agrees exactly with the window-math
join for axis-aligned footprints)."""

import numpy as np

from moaray import MosaicConfig
from moaray.geo import make_output_grid, window_overlap
from moaray.ops.vector import (
    clip_polygon,
    footprint_polygon,
    footprint_tile_coverage,
    point_in_polygon,
    polygon_area,
)
from moaray.testgen import Layout, images_path, meta_for, metas_for_layout

PIX = 10.0


def test_footprint_polygon_axis_aligned():
    m = meta_for(0, Layout("grid3x3", 9, 64))
    poly = footprint_polygon(m)
    assert polygon_area(poly) == 640.0 * 640.0
    assert poly[0].tolist() == [300000.0, 7000000.0]


def test_footprint_polygon_rotated_crs():
    """A 45-degree-rotation AFFINE CRS rotates the footprint but preserves
    its area (rotation is an isometry)."""
    import math

    a = math.pi / 6  # 30 degrees: no symmetry-induced coordinate ties
    c, s_ = math.cos(a), math.sin(a)
    m = meta_for(0, Layout("grid3x3", 1, 64))
    m.crs = f"AFFINE:0,{c},{-s_},0,{s_},{c}"
    poly = footprint_polygon(m)
    assert abs(polygon_area(poly) - 640.0 * 640.0) < 0.1
    # corners are genuinely rotated: no two share an x or y
    assert len(set(np.round(poly[:, 0], 3))) == 4


def test_point_in_polygon_square_and_triangle():
    sq = np.array([[0, 0], [10, 0], [10, 10], [0, 10]], dtype=float)
    xs = np.array([5.0, 15.0, 9.9, -0.1])
    ys = np.array([5.0, 5.0, 0.1, 5.0])
    assert point_in_polygon(xs, ys, sq).tolist() == [True, False, True, False]
    tri = np.array([[0, 0], [10, 0], [0, 10]], dtype=float)
    xs = np.array([1.0, 6.0, 4.0])
    ys = np.array([1.0, 6.0, 4.0])
    assert point_in_polygon(xs, ys, tri).tolist() == [True, False, True]


def test_clip_polygon_cases():
    sq = np.array([[0, 0], [10, 0], [10, 10], [0, 10]], dtype=float)
    # fully inside
    assert polygon_area(clip_polygon(sq, -5, -5, 15, 15)) == 100.0
    # half clip
    assert polygon_area(clip_polygon(sq, 5, 0, 15, 10)) == 50.0
    # corner clip
    assert polygon_area(clip_polygon(sq, 8, 8, 20, 20)) == 4.0
    # disjoint
    assert polygon_area(clip_polygon(sq, 20, 20, 30, 30)) == 0.0
    # triangle diagonal against rect
    tri = np.array([[0, 0], [10, 0], [0, 10]], dtype=float)
    assert abs(polygon_area(clip_polygon(tri, 0, 0, 5, 10)) - 37.5) < 1e-9


def test_coverage_matches_window_math():
    """Axis-aligned: clipped-polygon area == window-overlap pixel area x
    pixel area, for every assignment."""
    layout = Layout("grid3x3", 9, 64)
    path = images_path(layout)
    cfg = MosaicConfig(layout=layout, blocksize=64)
    cov = footprint_tile_coverage(path, cfg).to_pandas()
    assert len(cov) > 0

    metas = {m.image_id: m for m in metas_for_layout(layout)}
    grid = make_output_grid(list(metas.values()), blocksize=64)
    for _i, row in cov.iterrows():
        m = metas[row["image_id"]]
        block = grid.block_for_tile(int(row["tile_id"]))
        win = window_overlap(block, grid.transform, m)
        assert win is not None
        ftop, fleft, fxs, fys = win
        # clip the window to the image extent (the polygon clip does the
        # same geometrically)
        t0, l0 = max(ftop, 0), max(fleft, 0)
        b0 = min(ftop + fys, m.nrows)
        r0 = min(fleft + fxs, m.ncols)
        want = max(b0 - t0, 0) * max(r0 - l0, 0) * PIX * PIX
        assert abs(row["clip_area"] - want) < 1e-6, row["image_id"]


def test_cell_density_hierarchy(ray_session):
    """Hierarchical quadkey density rollup: base counts match a driver-side
    footprint oracle; each coarser level sums its children exactly."""
    from collections import Counter

    from moaray import MosaicConfig
    from moaray.geo import inv_geotransform
    from moaray.crs import transform_points
    from moaray.ops.vector import cell_density
    from moaray.pipelines.mosaic import grid_for
    from moaray.testgen import Layout, images_path, metas_for_layout

    lay = Layout("grid3x3", 9, 96)
    cfg = MosaicConfig(layout=lay, blocksize=64)
    path = images_path(lay)
    rows = cell_density(path, cfg, res=0, max_res=2, base_px=64).take_all()

    # driver oracle at res 0 (64-px cells)
    grid = grid_for(path, cfg)
    inv = inv_geotransform(grid.transform)
    truth: Counter = Counter()
    import numpy as np

    for m in metas_for_layout(lay):
        px0, py0 = transform_points(
            inv, np.array([m.x_min]), np.array([m.y_max])
        )
        px1, py1 = transform_points(
            inv, np.array([m.x_max]), np.array([m.y_min])
        )
        for r in range(int(py0[0] // 64), int((py1[0] - 1e-9) // 64) + 1):
            for c in range(int(px0[0] // 64), int((px1[0] - 1e-9) // 64) + 1):
                truth[(0, r, c)] += 1
    got0 = {
        (r["cell_res"], r["cell_row"], r["cell_col"]): r["n_images"]
        for r in rows
        if r["cell_res"] == 0
    }
    assert got0 == {k: v for k, v in truth.items()}

    # every parent equals the sum of its children
    by_level = {}
    for r in rows:
        by_level.setdefault(r["cell_res"], {})[
            (r["cell_row"], r["cell_col"])
        ] = r["n_images"]
    for res in (1, 2):
        child = by_level[res - 1]
        expect: Counter = Counter()
        for (cr, cc), n in child.items():
            expect[(cr // 2, cc // 2)] += n
        assert by_level[res] == dict(expect)


# ---------------------------------------------------------------------------
# cell-bucketed spatial joins
# ---------------------------------------------------------------------------

def _random_points(n=400, seed=3):
    import pyarrow as pa
    import ray.data

    rng = np.random.default_rng(seed)
    x = rng.uniform(-1.0, 1.0, n)
    y = rng.uniform(-1.0, 1.0, n)
    ids = np.arange(n, dtype=np.int64)
    ds = ray.data.from_arrow(pa.table({
        "id": pa.array(ids), "x": pa.array(x), "y": pa.array(y),
    })).repartition(8)  # force pairs to straddle blocks
    return ds, ids, x, y


def test_distance_join_vs_bruteforce(ray_session):
    from moaray.ops.vector import distance_join_2d

    ds, ids, x, y = _random_points()
    R = 0.11
    out = (distance_join_2d(ds, R).to_pandas()
           .sort_values(["a_id", "b_id"]).reset_index(drop=True))
    d2 = (x[:, None] - x[None, :]) ** 2 + (y[:, None] - y[None, :]) ** 2
    ii, jj = np.nonzero((d2 <= R * R) & (ids[:, None] < ids[None, :]))
    assert len(out) == len(ii)
    assert (out["a_id"].values == ids[ii]).all()
    assert (out["b_id"].values == ids[jj]).all()
    assert np.array_equal(out["d2"].values, d2[ii, jj])


def test_knn_join_vs_bruteforce(ray_session):
    from moaray.ops.vector import knn_join_2d

    ds, ids, x, y = _random_points(n=300, seed=9)
    K, MR = 4, 0.25
    out = (knn_join_2d(ds, K, MR).to_pandas()
           .sort_values(["a_id", "rank"]).reset_index(drop=True))
    d2 = (x[:, None] - x[None, :]) ** 2 + (y[:, None] - y[None, :]) ** 2
    rows = []
    for a in range(len(ids)):
        cand = sorted(
            (d2[a, b], ids[b]) for b in range(len(ids))
            if b != a and d2[a, b] <= MR * MR
        )
        for r, (dd, bid) in enumerate(cand[:K], 1):
            rows.append((ids[a], bid, r))
    assert len(out) == len(rows)
    got = list(zip(out["a_id"], out["b_id"], out["rank"]))
    assert got == rows


def test_distance_join_negative_coords_cell_edges(ray_session):
    """Points exactly on cell boundaries and straddling the origin
    (negative cells): the half-neighborhood ghosting must neither drop
    nor duplicate pairs."""
    import pyarrow as pa
    import ray.data

    from moaray.ops.vector import distance_join_2d

    R = 0.5
    # lattice points at multiples of R/2 around the origin, incl. exact
    # cell-edge coordinates
    g = np.arange(-3, 4) * (R / 2)
    gx, gy = np.meshgrid(g, g)
    x, y = gx.ravel(), gy.ravel()
    ids = np.arange(len(x), dtype=np.int64)
    ds = ray.data.from_arrow(pa.table({
        "id": pa.array(ids), "x": pa.array(x), "y": pa.array(y)}))
    out = (distance_join_2d(ds, R).to_pandas()
           .sort_values(["a_id", "b_id"]).reset_index(drop=True))
    d2 = (x[:, None] - x[None, :]) ** 2 + (y[:, None] - y[None, :]) ** 2
    ii, jj = np.nonzero((d2 <= R * R) & (ids[:, None] < ids[None, :]))
    assert len(out) == len(ii)
    assert (out["a_id"].values == ids[ii]).all()
    assert (out["b_id"].values == ids[jj]).all()


# ---------------------------------------------------------------------------
# polyline chaining + Douglas-Peucker simplification


def test_simplify_polyline_basics():
    from moaray.ops.vector import simplify_polyline

    # collinear points collapse to endpoints
    line = np.stack([np.arange(50.0), 2.0 * np.arange(50.0)], axis=1)
    assert simplify_polyline(line, 0.0).tolist() == [0, 49]
    # a V keeps its apex when tol < deviation, drops it when tol > deviation
    v = np.array([[0.0, 0.0], [5.0, 1.0], [10.0, 0.0]])
    assert simplify_polyline(v, 0.5).tolist() == [0, 1, 2]
    assert simplify_polyline(v, 2.0).tolist() == [0, 2]


def _dist_point_chord(p, a, b):
    d = b - a
    norm = float(np.hypot(*d))
    if norm == 0.0:
        return float(np.hypot(*(p - a)))
    return abs((p[0] - a[0]) * d[1] - (p[1] - a[1]) * d[0]) / norm


def test_simplify_polyline_deviation_bound():
    # the DP invariant: every dropped point lies within tol of the CHORD
    # of its enclosing kept pair (perpendicular line distance)
    from moaray.ops.vector import simplify_polyline

    rng = np.random.default_rng(3)
    for _ in range(20):
        n = int(rng.integers(5, 120))
        pts = np.cumsum(rng.normal(0, 1, (n, 2)), axis=0)
        tol = float(rng.uniform(0.1, 3.0))
        keep = simplify_polyline(pts, tol)
        assert keep[0] == 0 and keep[-1] == n - 1
        for k in range(len(keep) - 1):
            a, b = keep[k], keep[k + 1]
            for i in range(a + 1, b):
                d = _dist_point_chord(pts[i], pts[a], pts[b])
                assert d <= tol + 1e-9, (i, d, tol)


def test_chain_segments_open_and_cycle():
    from moaray.ops.vector import chain_segments

    rng = np.random.default_rng(4)
    # open polyline cut into segments, shuffled
    pts = np.cumsum(rng.normal(0, 1, (40, 2)), axis=0)
    seg = np.concatenate([pts[:-1], pts[1:]], axis=1)
    perm = rng.permutation(len(seg))
    chains = chain_segments(seg[perm])
    assert len(chains) == 1 and len(chains[0]) == 40
    ends = {tuple(np.round(chains[0][0], 6)),
            tuple(np.round(chains[0][-1], 6))}
    assert ends == {tuple(np.round(pts[0], 6)), tuple(np.round(pts[-1], 6))}
    # closed square -> one cycle, first == last
    sq = np.array([[0, 0, 1, 0], [1, 0, 1, 1], [1, 1, 0, 1],
                   [0, 1, 0, 0]], dtype=float)
    chains = chain_segments(sq)
    assert len(chains) == 1 and len(chains[0]) == 5
    assert np.allclose(chains[0][0], chains[0][-1])
    # partition property: two disjoint pieces
    two = np.concatenate([seg[:10], sq + 100.0])
    chains = chain_segments(two)
    assert sum(len(c) - 1 for c in chains) == len(two)


def test_contour_polylines_ramp(tmp_path, ray_session):
    from moaray.ops.vector import contour_polylines
    from moaray.testgen import ORIGIN_X, PIX

    # reuse the raster-op DEM fixture helper
    from tests.test_raster_ops import _dem_mosaic

    rr, cc = np.meshgrid(np.arange(128.0), np.arange(128.0), indexing="ij")
    res = _dem_mosaic(cc.copy(), tmp_path)
    rows = contour_polylines(res.tiles_ds, res.grid, levels=[40.5],
                             tol=0.01).take_all()
    # one straight chain of 127 unit segments, simplified to 2 points
    assert len(rows) == 1
    r = rows[0]
    assert r["level"] == 40.5 and r["n_points"] == 128
    assert r["n_simplified"] == 2
    want_x = ORIGIN_X + (40.5 + 0.5) * PIX
    assert f"{want_x:.6f}" in r["wkt"]


def test_contour_polylines_partition_random_dem(tmp_path, ray_session):
    from moaray.ops.raster import contour_lines
    from moaray.ops.vector import chain_segments, contour_polylines
    from tests.test_raster_ops import _dem_mosaic

    rng = np.random.default_rng(11)
    dem = np.cumsum(rng.normal(0, 1.0, (96, 96)), axis=0) + 50.0
    dem[40:48, 50:60] = np.nan
    res = _dem_mosaic(dem, tmp_path, blocksize=32)
    segs = contour_lines(res.tiles_ds, res.grid, levels=[50.0]).to_pandas()
    rows = contour_polylines(res.tiles_ds, res.grid, levels=[50.0],
                             tol=0.0).take_all()
    # every input segment lands in exactly one chain
    assert sum(r["n_points"] - 1 for r in rows) == len(segs)
    assert all(r["n_simplified"] <= r["n_points"] for r in rows)


def test_convex_hull_properties():
    from moaray.ops.vector import convex_hull, point_in_polygon

    # unit square + interior noise -> exactly the 4 corners, CCW from min
    rng = np.random.default_rng(5)
    inner = rng.uniform(0.05, 0.95, (200, 2))
    corners = np.array([[0, 0], [1, 0], [1, 1], [0, 1]], dtype=float)
    pts = np.concatenate([inner, corners])
    hull = convex_hull(pts)
    assert np.array_equal(hull, np.array([[0, 0], [1, 0], [1, 1], [0, 1]]))
    # random clouds: every point inside-or-on the hull; hull of hull = hull
    for _ in range(10):
        pts = rng.normal(0, 3, (int(rng.integers(3, 300)), 2))
        hull = convex_hull(pts)
        assert np.array_equal(convex_hull(hull), hull)
        if len(hull) >= 3:
            grow = hull.mean(axis=0) + (hull - hull.mean(axis=0)) * (1 + 1e-9)
            inside = point_in_polygon(pts[:, 0], pts[:, 1], grow)
            assert inside.all()
        # convexity: all cross products CCW
        if len(hull) >= 3:
            a = hull
            b = np.roll(hull, -1, axis=0)
            c = np.roll(hull, -2, axis=0)
            cross = (b[:, 0] - a[:, 0]) * (c[:, 1] - a[:, 1]) - (
                b[:, 1] - a[:, 1]) * (c[:, 0] - a[:, 0])
            assert (cross > 0).all()


def test_coverage_hulls(ray_session):
    from moaray.ops.s2join import latlng_points
    from moaray.ops.vector import coverage_hulls

    pts = latlng_points("/root/testdata/sf0.001/embeddings.parquet")
    rows = coverage_hulls(pts, level=3).take_all()
    assert sum(r["n_points"] for r in rows) == 500
    assert all(r["hull_wkt"].startswith("POLYGON ((") for r in rows)
    assert all(r["hull_area"] >= 0 for r in rows)
    toks = [r["cell_token"] for r in rows]
    assert len(set(toks)) == len(toks)
