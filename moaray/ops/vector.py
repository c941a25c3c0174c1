"""Raster <-> vector operators (north-star component; no reference
counterpart — moamosaic's join is rect-rect only, mosaic.py:501-535).

Pure-numpy computational geometry as Arrow-native batch kernels:

- ``polygonize_footprints``: image raster -> footprint polygon in WORLD
  coordinates (a rotated quad under a rotated/sheared AFFINE CRS).
- ``point_in_polygon``: vectorized ray-casting over point arrays.
- ``clip_polygon``: Sutherland–Hodgman polygon ∩ axis-aligned rect
  (tile-extent clipping).
- ``footprint_tile_coverage``: per (tile, image) assignment, the exact
  clipped-polygon area fraction of the tile — the polygon-refine analog of
  the engine's window-overlap join (for axis-aligned footprints the two
  agree exactly; the polygon path additionally handles rotated footprints).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .. import crs as crs_mod
from ..geo import ImageMeta, apply_geotransform


def footprint_polygon(meta: ImageMeta) -> np.ndarray:
    """(4, 2) world-coordinate corners of the image footprint, CCW-ordered
    for a north-up image; rotation/shear of the CRS carries through."""
    w = crs_mod.to_world(meta.crs)
    corners_px = [(0.0, 0.0), (meta.ncols, 0.0),
                  (meta.ncols, meta.nrows), (0.0, meta.nrows)]
    out = []
    for px, py in corners_px:
        x, y = apply_geotransform(meta.transform, px, py)
        out.append((w[0] + w[1] * x + w[2] * y, w[3] + w[4] * x + w[5] * y))
    return np.asarray(out, dtype=np.float64)


def polygon_wkt(poly: np.ndarray) -> str:
    pts = ", ".join(f"{x:.6f} {y:.6f}" for x, y in poly)
    first = f"{poly[0][0]:.6f} {poly[0][1]:.6f}"
    return f"POLYGON (({pts}, {first}))"


def polygon_area(poly: np.ndarray) -> float:
    """Shoelace |area| (works for any simple polygon, any orientation)."""
    if len(poly) < 3:
        return 0.0
    x, y = poly[:, 0], poly[:, 1]
    return 0.5 * abs(
        float(np.dot(x, np.roll(y, -1)) - np.dot(np.roll(x, -1), y))
    )


def point_in_polygon(
    xs: np.ndarray, ys: np.ndarray, poly: np.ndarray
) -> np.ndarray:
    """Vectorized ray casting: bool mask for points inside a simple polygon
    (edge-inclusive behaviour follows the standard crossing rule)."""
    n = len(poly)
    inside = np.zeros(len(xs), dtype=bool)
    px, py = poly[:, 0], poly[:, 1]
    for i in range(n):
        x1, y1 = px[i], py[i]
        x2, y2 = px[(i + 1) % n], py[(i + 1) % n]
        crosses = (y1 > ys) != (y2 > ys)
        with np.errstate(divide="ignore", invalid="ignore"):
            xint = x1 + (ys - y1) * (x2 - x1) / (y2 - y1)
        inside ^= crosses & (xs < xint)
    return inside


def clip_polygon(
    poly: np.ndarray, x_min: float, y_min: float, x_max: float, y_max: float
) -> np.ndarray:
    """Sutherland–Hodgman clip of a polygon against an axis-aligned rect.
    Returns the clipped polygon's vertices ((0, 2) if no intersection)."""

    def clip_edge(pts, inside_fn, intersect_fn):
        out = []
        n = len(pts)
        for i in range(n):
            cur, nxt = pts[i], pts[(i + 1) % n]
            cin, nin = inside_fn(cur), inside_fn(nxt)
            if cin:
                out.append(cur)
                if not nin:
                    out.append(intersect_fn(cur, nxt))
            elif nin:
                out.append(intersect_fn(cur, nxt))
        return out

    def ix_at_x(x0):
        def f(a, b):
            t = (x0 - a[0]) / (b[0] - a[0])
            return (x0, a[1] + t * (b[1] - a[1]))
        return f

    def ix_at_y(y0):
        def f(a, b):
            t = (y0 - a[1]) / (b[1] - a[1])
            return (a[0] + t * (b[0] - a[0]), y0)
        return f

    pts = [tuple(p) for p in poly]
    for inside_fn, intersect_fn in (
        (lambda p: p[0] >= x_min, ix_at_x(x_min)),
        (lambda p: p[0] <= x_max, ix_at_x(x_max)),
        (lambda p: p[1] >= y_min, ix_at_y(y_min)),
        (lambda p: p[1] <= y_max, ix_at_y(y_max)),
    ):
        if not pts:
            break
        pts = clip_edge(pts, inside_fn, intersect_fn)
    return np.asarray(pts, dtype=np.float64).reshape(-1, 2)


def polygonize_footprints(meta_ds) -> "object":
    """probe-metadata Dataset -> (image_id, footprint_wkt, area) — the
    footprint-polygonization raster->vector op, batch-kernel only."""

    def batch_fn(batch: pa.Table) -> pa.Table:
        ids, wkts, areas = [], [], []
        for i in range(batch.num_rows):
            m = ImageMeta(
                image_id=batch["image_id"][i].as_py(),
                ncols=batch["w"][i].as_py(),
                nrows=batch["h"][i].as_py(),
                transform=tuple(batch["gt"][i].as_py()),
                crs=batch["crs"][i].as_py(),
            )
            poly = footprint_polygon(m)
            ids.append(m.image_id)
            wkts.append(polygon_wkt(poly))
            areas.append(round(polygon_area(poly), 4))
        return pa.table(
            {
                "image_id": pa.array(ids, pa.string()),
                "footprint_wkt": pa.array(wkts, pa.string()),
                "area": pa.array(areas, pa.float64()),
            }
        )

    return meta_ds.map_batches(batch_fn, batch_format="pyarrow")


def footprint_tile_coverage(images_path: str, cfg) -> "object":
    """Per (tile, image) assignment: exact clipped-footprint area and its
    fraction of the tile — polygon-refine over the cell/direct join output
    (tile-extent clipping as an Arrow batch kernel).

    No driver-side catalog materialization (round-1 verdict fix): the
    assignment rows carry the full image geometry (img_gt/img_crs/img_w/
    img_h, plan.ASSIGN_SCHEMA), so the refine is a pure streaming
    map_batches over the join output."""
    from ..pipelines.mosaic import grid_for, plan_assignments

    grid = grid_for(images_path, cfg)
    gt = grid.transform
    assignments = plan_assignments(images_path, cfg, grid=grid)

    def refine(batch: pa.Table) -> pa.Table:
        rows = {"tile_id": [], "image_id": [], "clip_area": [],
                "tile_fraction": [], "clipped_wkt": []}
        gts = batch["img_gt"].to_pylist()
        for i in range(batch.num_rows):
            image_id = batch["image_id"][i].as_py()
            m = ImageMeta(image_id=image_id,
                          ncols=batch["img_w"][i].as_py(),
                          nrows=batch["img_h"][i].as_py(),
                          transform=tuple(gts[i]),
                          crs=batch["img_crs"][i].as_py())
            poly = footprint_polygon(m)
            top = batch["out_top"][i].as_py()
            left = batch["out_left"][i].as_py()
            xs = batch["out_xsize"][i].as_py()
            ys = batch["out_ysize"][i].as_py()
            x0, y0 = apply_geotransform(gt, left, top + ys)
            x1, y1 = apply_geotransform(gt, left + xs, top)
            clipped = clip_polygon(poly, min(x0, x1), min(y0, y1),
                                   max(x0, x1), max(y0, y1))
            area = polygon_area(clipped)
            tile_area = abs((x1 - x0) * (y1 - y0))
            rows["tile_id"].append(batch["tile_id"][i].as_py())
            rows["image_id"].append(image_id)
            rows["clip_area"].append(round(area, 4))
            rows["tile_fraction"].append(
                round(area / tile_area if tile_area else 0.0, 6)
            )
            rows["clipped_wkt"].append(
                polygon_wkt(clipped) if len(clipped) >= 3 else "POLYGON EMPTY"
            )
        return pa.table(
            {
                "tile_id": pa.array(rows["tile_id"], pa.int64()),
                "image_id": pa.array(rows["image_id"], pa.string()),
                "clip_area": pa.array(rows["clip_area"], pa.float64()),
                "tile_fraction": pa.array(rows["tile_fraction"], pa.float64()),
                "clipped_wkt": pa.array(rows["clipped_wkt"], pa.string()),
            }
        )

    return assignments.map_batches(refine, batch_format="pyarrow")


def cell_density(images_path: str, cfg, res: int = 0, max_res: int = 2,
                 base_px: int | None = None):
    """Hierarchical image-density rollup over the quadkey cell index (the
    H3/S2-style analytics surface): (cell_res, cell_row, cell_col,
    n_images) for every resolution ``res..max_res``.

    The classic hierarchical-index trick: footprints are counted into BASE
    cells once (per-batch partial combiner — counts, never rows, reach the
    groupby), then coarser levels derive by integer parent arithmetic
    (row//2, col//2) from the already-aggregated level below — no re-scan
    per level, so a 10^12-image catalog pays one footprint pass total."""
    import pyarrow.compute as pc
    import ray

    from ..geo import CELL_BASE
    from ..pipelines.mosaic import grid_for, meta_columns, read_images
    from ..stages.plan import probe_metadata

    grid = grid_for(images_path, cfg)
    inv_t = crs_mod.invert(grid.transform)
    size0 = (base_px if base_px is not None else CELL_BASE) * (2 ** res)

    def partial(batch: pa.Table) -> pa.Table:
        xmin = batch["xmin"].to_numpy()
        xmax = batch["xmax"].to_numpy()
        ymin = batch["ymin"].to_numpy()
        ymax = batch["ymax"].to_numpy()
        # world extents -> output pixel rects (y axis flips)
        px0, py0 = crs_mod.transform_points(inv_t, xmin, ymax)
        px1, py1 = crs_mod.transform_points(inv_t, xmax, ymin)
        from collections import Counter

        counts: Counter = Counter()
        for i in range(len(xmin)):
            r0 = int(np.floor(py0[i] / size0))
            r1 = int(np.floor(max(py0[i], py1[i] - 1e-9) / size0))
            c0 = int(np.floor(px0[i] / size0))
            c1 = int(np.floor(max(px0[i], px1[i] - 1e-9) / size0))
            for r in range(r0, r1 + 1):
                for c in range(c0, c1 + 1):
                    counts[(r, c)] += 1
        keys = list(counts)
        return pa.table(
            {
                "cell_row": pa.array([k[0] for k in keys], pa.int64()),
                "cell_col": pa.array([k[1] for k in keys], pa.int64()),
                "n_images": pa.array(
                    [counts[k] for k in keys], pa.int64()
                ),
            }
        )

    meta = probe_metadata(
        read_images(images_path, meta_columns(images_path)), cfg.layout
    )
    base = (
        meta.map_batches(partial, batch_format="pyarrow")
        .groupby(["cell_row", "cell_col"])
        .map_groups(
            lambda g: pa.table(
                {
                    "cell_row": [g["cell_row"][0].as_py()],
                    "cell_col": [g["cell_col"][0].as_py()],
                    "n_images": [int(pc.sum(g["n_images"]).as_py())],
                }
            ),
            batch_format="pyarrow",
        )
    )
    levels = []
    cur = base.map_batches(
        lambda b: b.append_column(
            "cell_res", pa.array([res] * b.num_rows, pa.int32())
        ),
        batch_format="pyarrow",
    )
    levels.append(cur)
    for r in range(res + 1, max_res + 1):
        def coarsen(b: pa.Table, _r=r) -> pa.Table:
            return pa.table(
                {
                    "cell_row": pc.floor(
                        pc.divide(pc.cast(b["cell_row"], pa.float64()), 2.0)
                    ).cast(pa.int64()),
                    "cell_col": pc.floor(
                        pc.divide(pc.cast(b["cell_col"], pa.float64()), 2.0)
                    ).cast(pa.int64()),
                    "n_images": b["n_images"],
                }
            )

        parent = (
            levels[-1]
            .map_batches(coarsen, batch_format="pyarrow")
            .groupby(["cell_row", "cell_col"])
            .map_groups(
                lambda g: pa.table(
                    {
                        "cell_row": [g["cell_row"][0].as_py()],
                        "cell_col": [g["cell_col"][0].as_py()],
                        "n_images": [int(pc.sum(g["n_images"]).as_py())],
                    }
                ),
                batch_format="pyarrow",
            )
        )
        levels.append(
            parent.map_batches(
                lambda b, _r=r: b.append_column(
                    "cell_res", pa.array([_r] * b.num_rows, pa.int32())
                ),
                batch_format="pyarrow",
            )
        )
    out = levels[0]
    for lv in levels[1:]:
        out = out.union(lv)
    return out.select_columns(["cell_res", "cell_row", "cell_col", "n_images"])


# ---------------------------------------------------------------------------
# cell-bucketed point spatial joins (distance join, kNN join)
# ---------------------------------------------------------------------------

# half-neighborhood: each unordered cell pair (c, c+h) is owned by exactly
# one cell (no two opposite vectors in the set), so every cross-cell
# candidate pair is generated exactly once
_HALF_NEIGHBORHOOD = ((0, 1), (1, -1), (1, 0), (1, 1))
_CELL_OFFSET = 1 << 20  # grid coords are small; packing headroom


def _pack_cell(cx: np.ndarray, cy: np.ndarray) -> np.ndarray:
    return ((cx + _CELL_OFFSET) << 21) | (cy + _CELL_OFFSET)


def points_2d(embeddings_path: str, columns=("vec_id", "embedding")):
    """(id, x, y) point dataset from the first two embedding dimensions —
    the 2D projection used by the spatial-join demos/queries. float64 math
    from float32 storage (exactly representable, so both the engine and a
    DOUBLE-casting SQL oracle run identical IEEE arithmetic)."""
    import ray.data

    id_col, emb_col = columns

    def extract(batch: pa.Table) -> pa.Table:
        emb = batch[emb_col].combine_chunks()
        flat = emb.values.to_numpy(zero_copy_only=False).astype(np.float64)
        n = len(batch)
        dim = flat.size // n if n else 1
        pts = flat.reshape(n, dim)
        return pa.table({
            "id": batch[id_col].cast(pa.int64()),
            "x": pa.array(pts[:, 0], pa.float64()),
            "y": pa.array(pts[:, 1], pa.float64()),
        })

    return ray.data.read_parquet(
        embeddings_path, columns=list(columns)
    ).map_batches(extract, batch_format="pyarrow")


def _cell_pieces(radius: float):
    """Stage 1 of both point joins: each point lands in its home cell
    (cell size == radius) and ghosts into the 4 inverse-half-neighborhood
    cells, so every within-radius pair meets in exactly one group."""
    cell = float(radius)

    def pieces(batch: pa.Table) -> pa.Table:
        ids = batch["id"].to_numpy().astype(np.int64)
        x = batch["x"].to_numpy()
        y = batch["y"].to_numpy()
        cx = np.floor(x / cell).astype(np.int64)
        cy = np.floor(y / cell).astype(np.int64)
        out_key, out_id, out_x, out_y, out_home = [], [], [], [], []
        out_key.append(_pack_cell(cx, cy))
        out_id.append(ids)
        out_x.append(x)
        out_y.append(y)
        out_home.append(np.ones(len(ids), dtype=bool))
        for dr, dc in _HALF_NEIGHBORHOOD:
            # ghost into the cell that OWNS the pair with our home cell
            out_key.append(_pack_cell(cx - dr, cy - dc))
            out_id.append(ids)
            out_x.append(x)
            out_y.append(y)
            out_home.append(np.zeros(len(ids), dtype=bool))
        return pa.table({
            "cell": pa.array(np.concatenate(out_key), pa.int64()),
            "id": pa.array(np.concatenate(out_id), pa.int64()),
            "x": pa.array(np.concatenate(out_x), pa.float64()),
            "y": pa.array(np.concatenate(out_y), pa.float64()),
            "home": pa.array(np.concatenate(out_home), pa.bool_()),
        })

    return pieces


def distance_join_2d(pts_ds, radius: float, emit_both: bool = False):
    """All point pairs within ``radius``: cell-bucketed candidate
    generation (cell size = radius, half-neighborhood ghosting) + exact
    brute-force refine per cell group — the canonical scalable shape for
    a self distance-join (no all-pairs, no broadcast).

    Output: (a_id, b_id, d2) with a_id < b_id and d2 the raw squared
    distance (query layers round for SQL parity); ``emit_both``
    additionally emits the mirrored (b, a) rows (used by the kNN join).

    Partitioning assumption (custom-operator contract): points per cell
    are bounded by data density × radius² — pick radius at the query's
    natural scale, not the extent's. Each point ships to exactly 5 cells
    (O(1) duplication).
    """
    r2 = float(radius) * float(radius)
    # cells group on a BOUNDED partition key (per-cell map_groups pays one
    # Python call per populated cell — unbounded at fine grids); the exact
    # refine runs over ALL cells' candidate pairs in one vectorized pass
    # (pair-index expansion + home/ghost masks instead of per-cell outer
    # products)
    n_partitions = 512

    def add_part(batch: pa.Table) -> pa.Table:
        part = batch["cell"].to_numpy() % np.int64(n_partitions)
        return batch.append_column("part", pa.array(part, pa.int64()))

    def per_cells(group: pa.Table) -> pa.Table:
        from ..ops.dedup import _pair_index_expansion

        empty = pa.table({
            "a_id": pa.array([], pa.int64()),
            "b_id": pa.array([], pa.int64()),
            "d2": pa.array([], pa.float64()),
        })
        if group.num_rows < 2:
            return empty
        cell = group["cell"].to_numpy()
        order = np.argsort(cell, kind="stable")
        cell = cell[order]
        ids = group["id"].to_numpy().astype(np.int64)[order]
        x = group["x"].to_numpy()[order]
        y = group["y"].to_numpy()[order]
        home = group["home"].to_numpy(zero_copy_only=False)[order]
        starts = np.concatenate(([0], np.nonzero(np.diff(cell))[0] + 1))
        counts = np.diff(np.concatenate((starts, [cell.size])))
        ga, gb = _pair_index_expansion(counts)
        if ga.size == 0:
            return empty
        ha, hb = home[ga], home[gb]
        # home x home pairs count once with a < b; home x ghost pairs are
        # unique per group by the half-neighborhood construction; ghost x
        # ghost pairs belong to another cell
        keep = (ha & hb & (ids[ga] != ids[gb])) | (ha ^ hb)
        if not keep.any():
            return empty
        ga, gb = ga[keep], gb[keep]
        d2 = (x[ga] - x[gb]) ** 2 + (y[ga] - y[gb]) ** 2
        near = d2 <= r2
        if not near.any():
            return empty
        ga, gb, d2 = ga[near], gb[near], d2[near]
        a = np.minimum(ids[ga], ids[gb])
        b = np.maximum(ids[ga], ids[gb])
        if emit_both:
            a, b = np.concatenate([a, b]), np.concatenate([b, a])
            d2 = np.concatenate([d2, d2])
        return pa.table({
            "a_id": pa.array(a, pa.int64()),
            "b_id": pa.array(b, pa.int64()),
            "d2": pa.array(d2, pa.float64()),
        })

    return (
        pts_ds.map_batches(_cell_pieces(radius), batch_format="pyarrow")
        .map_batches(add_part, batch_format="pyarrow")
        .groupby("part")
        .map_groups(per_cells, batch_format="pyarrow")
    )


def knn_join_2d(pts_ds, k: int, max_radius: float):
    """k nearest neighbors per point among neighbors within ``max_radius``
    (a radius-bounded kNN self-join — the bound is what keeps the
    candidate generation cell-local; points with fewer than k in-radius
    neighbors return fewer rows, mirroring the SQL-filter semantics).

    Ties on distance break by neighbor id, fully deterministic.
    Output: (a_id, b_id, rank, d2r), rank 1-based by (d2, b_id).
    """
    pairs = distance_join_2d(pts_ds, max_radius, emit_both=True)

    # per-point grouping pays one Python call per POINT; bounded partition
    # + one lexsort ranks every point's neighbors at once
    n_partitions = 512

    def add_part(batch: pa.Table) -> pa.Table:
        part = batch["a_id"].to_numpy() % np.int64(n_partitions)
        return batch.append_column("part", pa.array(part, pa.int64()))

    def topk(group: pa.Table) -> pa.Table:
        empty = pa.table({
            "a_id": pa.array([], pa.int64()),
            "b_id": pa.array([], pa.int64()),
            "rank": pa.array([], pa.int64()),
            "d2r": pa.array([], pa.float64()),
        })
        if group.num_rows == 0:
            return empty
        a = group["a_id"].to_numpy().astype(np.int64)
        b = group["b_id"].to_numpy().astype(np.int64)
        d2 = group["d2"].to_numpy()
        order = np.lexsort((b, d2, a))
        a, b, d2 = a[order], b[order], d2[order]
        starts = np.concatenate(([0], np.nonzero(np.diff(a))[0] + 1))
        counts = np.diff(np.concatenate((starts, [a.size])))
        rank = (
            np.arange(a.size, dtype=np.int64)
            - np.repeat(starts, counts)
            + 1
        )
        keep = rank <= k
        # half-away rounding to mirror SQL round() (CLAUDE.md float rule)
        d2r = pc.round(pa.array(d2[keep], pa.float64()), 8,
                       round_mode="half_towards_infinity")
        return pa.table({
            "a_id": pa.array(a[keep], pa.int64()),
            "b_id": pa.array(b[keep], pa.int64()),
            "rank": pa.array(rank[keep], pa.int64()),
            "d2r": d2r,
        })

    return (
        pairs.map_batches(add_part, batch_format="pyarrow")
        .groupby("part")
        .map_groups(topk, batch_format="pyarrow")
    )


# ---------------------------------------------------------------------------
# GeoJSON geometry builders (for sinks/partitioned.write_geojsonl)
# ---------------------------------------------------------------------------

def wkt_polygon_geometries(batch: pa.Table, col: str = "footprint_wkt"):
    """POLYGON wkt column -> GeoJSON Polygon dicts (one exterior ring)."""
    out = []
    for wkt in batch[col].to_pylist():
        inner = wkt[wkt.index("((") + 2: wkt.rindex("))")]
        ring = [[float(x) for x in pt.split()] for pt in inner.split(",")]
        out.append({"type": "Polygon", "coordinates": [ring]})
    return out


def segment_geometries(batch: pa.Table, cols=("x0", "y0", "x1", "y1")):
    """(x0, y0, x1, y1) columns -> GeoJSON LineString dicts (one segment
    each — e.g. contour_lines output)."""
    x0 = batch[cols[0]].to_numpy()
    y0 = batch[cols[1]].to_numpy()
    x1 = batch[cols[2]].to_numpy()
    y1 = batch[cols[3]].to_numpy()
    return [
        {"type": "LineString",
         "coordinates": [[float(a), float(b)], [float(c), float(d)]]}
        for a, b, c, d in zip(x0, y0, x1, y1)
    ]


# ---------------------------------------------------------------------------
# Vector -> raster burn-in (gdal_rasterize analog; inverse of polygonize)
# ---------------------------------------------------------------------------

def parse_wkt_polygon(wkt: str) -> np.ndarray:
    """Single-ring ``POLYGON ((x y, ...))`` -> (n, 2) float64 vertices
    (closing vertex dropped). Multi-ring/multi-polygon is out of scope —
    the documented contract of the rasterize op."""
    inner = wkt[wkt.index("((") + 2 : wkt.index("))")]
    pts = np.array(
        [[float(v) for v in p.split()] for p in inner.split(",")],
        dtype=np.float64,
    )
    if len(pts) > 1 and np.array_equal(pts[0], pts[-1]):
        pts = pts[:-1]
    return pts


def rasterize_features(feat_ds, grid, value_col: str = "value",
                       wkt_col: str = "wkt", seq_col: str = "seq"):
    """Vector -> raster burn-in: each polygon's value is burned into every
    output-grid pixel whose CENTER lies inside it (gdal_rasterize default
    pixel rule); overlapping features resolve LAST-wins in ``seq_col``
    order, mirroring the mosaic's merge-order rule. Returns tile rows
    (band=0, out_top/left/size, pixels+pixels_codec) for TOUCHED tiles
    only — the same shape assemble_tiles emits, so mosaic_array /
    export_gtiff / the partitioned sink all compose.

    Scale shape (the mosaic plan's, with polygons for images): stage 1
    fans each feature out to its covering tiles (bbox -> searchsorted on
    the grid's edge arrays, refined by the exact PIP burn — over-coverage
    is harmless), shipping only the ring floats; stage 2 is ONE
    groupby(tile_id) shuffle whose map_groups burns the tile canvas with
    the vectorized ray-casting kernel over pixel centers. Features per
    tile bound the group, exactly like inputs-per-tile in the mosaic.

    Contract: single-ring simple polygons (parse_wkt_polygon); ``seq``
    must be a total order (ties burn in undefined order across workers).
    """
    from ..geo import inv_geotransform
    from ..stages.assemble import encode_payload

    gt = grid.transform
    inv = inv_geotransform(gt)
    row_edges, col_edges = grid.row_edges, grid.col_edges
    n_tile_cols = grid.n_tile_cols
    n_tile_rows = grid.n_tile_rows
    np_dtype = np.dtype(grid.dtype)
    nullval = grid.nullval
    codec = "z16"

    def fanout(batch: pa.Table) -> pa.Table:
        tids, seqs, vals, rings = [], [], [], []
        wkts = batch[wkt_col].to_pylist()
        seq = batch[seq_col].to_numpy()
        val = batch[value_col].to_numpy()
        for i, wkt in enumerate(wkts):
            ring = parse_wkt_polygon(wkt)
            # conservative pixel-space bbox (full inverse affine: rotation-safe)
            pxy = np.array([apply_geotransform(inv, x, y) for x, y in ring])
            left = np.floor(pxy[:, 0].min()) - 1
            right = np.ceil(pxy[:, 0].max()) + 1
            top = np.floor(pxy[:, 1].min()) - 1
            bottom = np.ceil(pxy[:, 1].max()) + 1
            tc0 = max(0, int(np.searchsorted(col_edges, left, "right") - 1))
            tc1 = min(n_tile_cols, int(np.searchsorted(col_edges, right, "left")))
            tr0 = max(0, int(np.searchsorted(row_edges, top, "right") - 1))
            tr1 = min(n_tile_rows, int(np.searchsorted(row_edges, bottom, "left")))
            buf = ring.tobytes()
            for tr in range(tr0, tr1):
                for tc in range(tc0, tc1):
                    tids.append(tr * n_tile_cols + tc)
                    seqs.append(int(seq[i]))
                    vals.append(float(val[i]))
                    rings.append(buf)
        return pa.table({
            "tile_id": pa.array(tids, pa.int64()),
            "seq": pa.array(seqs, pa.int64()),
            "value": pa.array(vals, pa.float64()),
            "ring": pa.array(rings, pa.binary()),
        })

    def burn(group: pa.Table) -> pa.Table:
        tile_id = int(group["tile_id"][0].as_py())
        trow, tcol = divmod(tile_id, n_tile_cols)
        top = int(row_edges[trow])
        left = int(col_edges[tcol])
        ysize = int(row_edges[trow + 1]) - top
        xsize = int(col_edges[tcol + 1]) - left
        # world coordinates of the tile's pixel centers
        jj, ii = np.meshgrid(np.arange(xsize), np.arange(ysize))
        pxc = (left + jj + 0.5).ravel()
        pyc = (top + ii + 0.5).ravel()
        xs = gt[0] + gt[1] * pxc + gt[2] * pyc
        ys = gt[3] + gt[4] * pxc + gt[5] * pyc
        canvas = np.full(ysize * xsize, nullval, dtype=np_dtype)
        order = np.argsort(group["seq"].to_numpy(), kind="stable")
        vals = group["value"].to_numpy()
        for i in order:
            ring = np.frombuffer(
                group["ring"][int(i)].as_buffer(), np.float64
            ).reshape(-1, 2)
            inside = point_in_polygon(xs, ys, ring)
            canvas[inside] = np_dtype.type(vals[i])
        canvas = canvas.reshape(ysize, xsize)
        payload, codec_tag = encode_payload(canvas, codec)
        nonnull = int(
            (~np.isnan(canvas)).sum() if isinstance(nullval, float)
            and np.isnan(nullval) else (canvas != nullval).sum()
        )
        return pa.table({
            "tile_id": pa.array([tile_id], pa.int64()),
            "band": pa.array([0], pa.int32()),
            "out_top": pa.array([top], pa.int32()),
            "out_left": pa.array([left], pa.int32()),
            "out_xsize": pa.array([xsize], pa.int32()),
            "out_ysize": pa.array([ysize], pa.int32()),
            "n_features": pa.array([group.num_rows], pa.int32()),
            "nonnull_count": pa.array([nonnull], pa.int64()),
            "pixels_codec": pa.array([codec_tag], pa.string()),
            "pixels": pa.array([payload], pa.binary()),
        })

    return (
        feat_ds.map_batches(fanout, batch_format="pyarrow")
        .groupby("tile_id")
        .map_groups(burn, batch_format="pyarrow")
    )


def simplify_polyline(pts: np.ndarray, tol: float) -> np.ndarray:
    """Douglas–Peucker: indices of the kept vertices (first/last always).

    Iterative stack form, vectorized point-to-chord distances per split —
    no recursion limits, O(n log n) typical. ``tol`` is the max allowed
    perpendicular deviation in coordinate units; 0 keeps only exactly
    collinear removals."""
    pts = np.asarray(pts, dtype=np.float64)
    n = len(pts)
    if n <= 2:
        return np.arange(n)
    keep = np.zeros(n, dtype=bool)
    keep[0] = keep[-1] = True
    stack = [(0, n - 1)]
    while stack:
        a, b = stack.pop()
        if b - a < 2:
            continue
        seg = pts[a + 1: b]
        d = pts[b] - pts[a]
        norm = np.hypot(d[0], d[1])
        if norm == 0.0:
            dist = np.hypot(seg[:, 0] - pts[a, 0], seg[:, 1] - pts[a, 1])
        else:
            dist = np.abs(
                (seg[:, 0] - pts[a, 0]) * d[1]
                - (seg[:, 1] - pts[a, 1]) * d[0]
            ) / norm
        imax = int(np.argmax(dist))
        if dist[imax] > tol:
            m = a + 1 + imax
            keep[m] = True
            stack.append((a, m))
            stack.append((m, b))
    return np.nonzero(keep)[0]


def chain_segments(seg: np.ndarray, decimals: int = 6) -> list[np.ndarray]:
    """Stitch unit segments (n, 4) = (x0, y0, x1, y1) into polylines.

    Endpoints are matched after rounding to ``decimals`` (contour segments
    from the halo stencil are bitwise identical across tile seams, so this
    is purely defensive). Deterministic: open chains start at the
    lexicographically smallest odd-degree node, then remaining cycles at
    their smallest node; at junctions (degree > 2) the smallest-index
    unused segment is taken. Every input segment appears in exactly one
    chain."""
    seg = np.asarray(seg, dtype=np.float64)
    if len(seg) == 0:
        return []
    q = np.round(seg, decimals)
    pts = np.concatenate([q[:, :2], q[:, 2:]])
    nodes, inv = np.unique(pts, axis=0, return_inverse=True)
    a_n, b_n = inv[: len(seg)], inv[len(seg):]
    adj: dict[int, list[int]] = {}
    for si in range(len(seg)):
        adj.setdefault(int(a_n[si]), []).append(si)
        adj.setdefault(int(b_n[si]), []).append(si)
    used = np.zeros(len(seg), dtype=bool)
    chains = []

    def walk(start_node: int):
        line = [start_node]
        cur = start_node
        while True:
            nxt_si = None
            for si in adj.get(cur, ()):
                if not used[si]:
                    nxt_si = si
                    break
            if nxt_si is None:
                break
            used[nxt_si] = True
            cur = int(b_n[nxt_si] if a_n[nxt_si] == cur else a_n[nxt_si])
            line.append(cur)
        return np.asarray([nodes[i] for i in line])

    degree = {n_: len(s) for n_, s in adj.items()}
    odd = sorted(n_ for n_, d in degree.items() if d % 2 == 1)
    for n_ in odd:
        while any(not used[si] for si in adj[n_]):
            chains.append(walk(n_))
    for n_ in sorted(adj):
        while any(not used[si] for si in adj[n_]):
            chains.append(walk(n_))
    return chains


def linestring_wkt(pts: np.ndarray) -> str:
    inner = ", ".join(f"{x:.6f} {y:.6f}" for x, y in pts)
    return f"LINESTRING ({inner})"


def contour_polylines(tiles_ds, grid, levels, band: int = 0,
                      tol: float = 0.0):
    """Marching-squares contours stitched into simplified polylines:
    contour_lines' per-tile unit segments -> one groupby(level) ->
    chain_segments + Douglas–Peucker per isoline level.

    Scale note: chaining is inherently sequential per connected component,
    so each level's segments meet in one group — bounded by isoline
    complexity per level (not by raster size for smooth fields); levels
    parallelize across the group shuffle. Output: (level, chain_id, wkt,
    n_points, n_simplified), chain enumeration deterministic."""
    import pyarrow as _pa

    from .raster import contour_lines

    segs = contour_lines(tiles_ds, grid, levels, band=band)

    def per_level(group: pa.Table) -> pa.Table:
        lv = float(group["level"][0].as_py())
        arr = np.stack([
            group["x0"].to_numpy(), group["y0"].to_numpy(),
            group["x1"].to_numpy(), group["y1"].to_numpy(),
        ], axis=1)
        rows = {"level": [], "chain_id": [], "wkt": [],
                "n_points": [], "n_simplified": []}
        for cid, line in enumerate(chain_segments(arr)):
            keep = simplify_polyline(line, tol)
            rows["level"].append(lv)
            rows["chain_id"].append(cid)
            rows["wkt"].append(linestring_wkt(line[keep]))
            rows["n_points"].append(len(line))
            rows["n_simplified"].append(len(keep))
        return _pa.table({
            "level": _pa.array(rows["level"], _pa.float64()),
            "chain_id": _pa.array(rows["chain_id"], _pa.int64()),
            "wkt": _pa.array(rows["wkt"], _pa.string()),
            "n_points": _pa.array(rows["n_points"], _pa.int64()),
            "n_simplified": _pa.array(rows["n_simplified"], _pa.int64()),
        })

    return segs.groupby("level").map_groups(per_level,
                                            batch_format="pyarrow")


def convex_hull(pts: np.ndarray) -> np.ndarray:
    """Andrew's monotone chain: CCW hull vertices (world axes, y up),
    starting at the lexicographically smallest point, no repeated last
    point. Collinear boundary points are dropped. O(n log n)."""
    pts = np.unique(np.asarray(pts, dtype=np.float64), axis=0)
    n = len(pts)
    if n <= 2:
        return pts

    def half(points):
        out = []
        for p in points:
            while len(out) >= 2:
                o, a = out[-2], out[-1]
                if (a[0] - o[0]) * (p[1] - o[1]) - (a[1] - o[1]) * (
                        p[0] - o[0]) <= 0:
                    out.pop()
                else:
                    break
            out.append(p)
        return out

    lower = half(pts)
    upper = half(pts[::-1])
    return np.asarray(lower[:-1] + upper[:-1])


def polygon_wkt_closed(poly: np.ndarray) -> str:
    ring = np.concatenate([poly, poly[:1]])
    inner = ", ".join(f"{x:.6f} {y:.6f}" for x, y in ring)
    return f"POLYGON (({inner}))"


def coverage_hulls(pts_ds, level: int = 4):
    """Per-S2-cell convex hull of a lat/lng point set: the compact
    "where is my corpus" footprint census (one groupby on the Hilbert-
    ordered cell id; hull + shoelace area per group, vectorized keying).

    Output: (cell_token, n_points, hull_wkt, hull_area) — area in squared
    degrees of the planar lng/lat chart (a census diagnostic, not a
    geodesic measure)."""
    import pyarrow.compute as _pc

    from .. import s2

    def keyed(batch: pa.Table) -> pa.Table:
        lat = batch["lat"].to_numpy()
        lng = batch["lng"].to_numpy()
        cells = s2.cell_from_latlng(lat, lng, level)
        return pa.table({
            "cell": pa.array(cells.astype(np.int64), pa.int64()),
            "lng": batch["lng"],
            "lat": batch["lat"],
        })

    def per_cell(group: pa.Table) -> pa.Table:
        pts = np.stack([group["lng"].to_numpy(),
                        group["lat"].to_numpy()], axis=1)
        hull = convex_hull(pts)
        area = float(polygon_area(hull)) if len(hull) >= 3 else 0.0
        tok = s2.cell_token(np.uint64(group["cell"][0].as_py()))
        return pa.table({
            "cell_token": pa.array([tok], pa.string()),
            "n_points": pa.array([len(pts)], pa.int64()),
            "hull_wkt": pa.array([polygon_wkt_closed(hull)], pa.string()),
            "hull_area": pa.array([round(area, 9)], pa.float64()),
        })

    return (
        pts_ds.map_batches(keyed, batch_format="pyarrow")
        .groupby("cell")
        .map_groups(per_cell, batch_format="pyarrow")
    )
