"""End-to-end mosaic pipeline (the reference's doMosaic, Ray-Data-native).

ref lifecycle being replaced: /root/reference/moamosaic/mosaic.py:111-224.

Dataflow (SURVEY.md §3.5) — ONE all-to-all shuffle:

    read_parquet(images, pruned cols)                # S1
      └─ probe_metadata (stateless map_batches)      # S2   (no bytes read)
           └─ aggregate Min/Max → OutputGrid         # P1/P2 (tiny)
    read_parquet(images, + bytes)
      └─ DecodeSlice actor pool                      # P3-P5 + S4/K1 fused:
         (spatial join fused into the scan;           #   join, window clip,
          windows only — bytes never shuffle twice)   #   windowed decode
           └─ [resume filter: drop committed tiles]
           └─ groupby(tile_id).map_groups(assemble)  # K2/K9 — THE shuffle
               ├─ write_tiles (committed partitions + manifest + lineage)
               ├─ build_pyramids (map_batches)       # K3
               └─ aggregate(band_stats)              # A1

The planning-only path (``plan_assignments``) runs the same join standalone
for parity checks and as a queryable operator.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
from ray.data.aggregate import Max, Min

from ..geo import OutputGrid, make_output_grid
from ..stages import plan as plan_stage
from ..stages.assemble import (
    assemble_tiles,
    build_pyramids,
    overview_dims,
)
from ..stages.decode import decode_windows
from ..stages.plan import assign_cell_join, assign_direct, probe_metadata
from ..stages.stats import stats_from_tile_columns as compute_stats_from_columns
from ..state import manifest as manifest_mod
from ..testgen import Layout

IMAGE_META_COLS = ["image_id", "w", "h", "fmt"]
# Optional catalog columns: explicit per-image metadata wins over the
# synthetic placement layout (stages/plan.py metas_from_batch).
OPTIONAL_META_COLS = ["gt", "crs", "nullval", "seq", "dtype", "layer_type"]


def meta_columns(images_path: str) -> list[str]:
    """Pruned metadata column list for this table (footer peek only; local
    paths and s3:// prefixes alike via io.catalog_files)."""
    from ..io import catalog_files, parquet_file

    try:
        fs, files = catalog_files(images_path)
        if not files:
            return IMAGE_META_COLS
        names = set(parquet_file(fs, files[0]).schema_arrow.names)
    except Exception:
        return IMAGE_META_COLS
    return IMAGE_META_COLS + [c for c in OPTIONAL_META_COLS if c in names]


def _bands_of(images_path: str) -> list[int]:
    """Distinct band ids from the catalog's band column (single-column
    driver-side read; bands are [0] when the column is absent). At extreme
    catalog sizes the band set is known from schema metadata instead."""
    import pyarrow.parquet as _pq

    from ..io import catalog_files, parquet_file

    try:
        fs, files = catalog_files(images_path)
        if not files:
            return [0]
        names = set(parquet_file(fs, files[0]).schema_arrow.names)
    except Exception:
        return [0]
    if "band" not in names:
        return [0]
    if _parquet_num_rows(images_path) <= 1_000_000:
        tbl = _pq.read_table(
            files if fs is not None else images_path,
            columns=["band"], filesystem=fs,
        )
        return sorted(set(tbl["band"].to_pylist()))
    # extreme catalogs: distributed unique() — only the distinct band ids
    # reach the driver (round-1 ADVICE)
    return sorted(
        read_images(images_path, columns=["band"]).unique("band")
    )


def _first_meta(images_path: str, layout):
    """Metadata of the first image (row 0 of the first fragment) — supplies
    warp default resolution (ref reproj.py:183-192) without a Ray execution."""
    from ..io import catalog_files, parquet_file
    from ..stages.plan import metas_from_batch

    fs, files = catalog_files(images_path)
    pf = parquet_file(fs, files[0])
    tbl = pf.read_row_group(0, columns=meta_columns(images_path))
    return metas_from_batch(tbl.slice(0, 1), layout)[0][1]


@dataclass
class MosaicConfig:
    layout: Layout | None = None  # synthetic placement; None => the images
    # table must carry explicit gt/crs metadata columns
    blocksize: int = 1024
    nullval: float | None = None
    # "last" (parity) | "feather" (edge-distance blend) | "nearest"
    # (per-pixel nearest-image-center — kNN overlap resolution) | "mean" |
    # "median" | "max" | "min" (per-pixel stack composites — the temporal
    # cloud-free composites incl. maximum-value compositing; max/min have
    # a salted two-level path (extremes merge from disjoint partials),
    # median stays single-level by design, see _merge_median)
    merge: str = "last"
    # Persist per-tile feather num/den float64 partials (zlib) as extra tile
    # columns so update_mosaic(merge="feather") can fold new images into the
    # weighted sums without re-reading any original source. Roughly doubles
    # sink bytes for feather outputs; ignored for merge="last".
    feather_partials: bool = False
    include_empty: bool = True  # emit all-null tiles (full-extent parity mode)
    min_overview_size: int = 1024  # ref DFLT_MINOVERVIEWSIZE (mosaic.py:29)
    do_pyramids: bool = True
    do_stats: bool = True
    # "direct" | "cell_join" (planar quadkeys) | "cell_join_s2" (S2 cells;
    # geographic grids whose world coordinates are lon/lat degrees)
    join_strategy: str = "direct"
    s2_level: int | None = None  # None = auto (~one tile per cell)
    decode_concurrency: tuple | None = None  # None = stateless tasks
    # None = whole-block batches: the decode map fuses with the parquet read
    # into one task (no rebatch barrier, no extra object-store round-trip);
    # block size is bounded by DataContext.target_max_block_size. Set an int
    # to cap images per batch when payloads are very large.
    decode_batch_size: int | None = None
    validate_projections: bool = True
    # Tiles with >= salt_threshold contributing images get a salted
    # two-level merge (contiguous-seq salts; SURVEY.md §4.2). None = off.
    # The threshold guards per-worker group bytes: with z16-compressed
    # windows a few hundred inputs per tile merge fine in one task, and the
    # two-level path costs a whole extra sort barrier — engage it only for
    # genuinely pathological stacks.
    salt_threshold: int | None = 256
    inputs_per_salt: int = 32
    max_salts: int = 64
    # Planning mode: "auto" collects metadata to the driver when the input
    # is small (< driver_plan_limit images — the reference's whole analysis
    # phase is driver-side, mosaic.py:187-195) and stays fully distributed
    # beyond it. One metadata execution instead of five.
    planning: str = "auto"  # "auto" | "driver" | "distributed"
    driver_plan_limit: int = 100_000
    # Distributed-plan collection guard: the per-tile count/seq aggregate is
    # collected to the driver (old fast path — one tiny take_all) while the
    # assigned-tile count stays below this; above it, only over-threshold
    # (hot) tiles reach the driver and the empty-tile anti-join runs as a
    # bucket groupby against the assigned-id DATASET (round-2 verdict #4:
    # a 10^8-tile grid is several GB of driver dict).
    plan_collect_limit: int = 1_000_000
    # commit granularity of the tile sink (tiles per parquet file/manifest
    # record) — smaller = finer resume, more files
    tiles_per_file: int = 16
    # Output projection (reference's outprojepsg/wktfile/wkt trio + res +
    # resamplemethod, ref mosaic.py:111-116 / reproj.py:14-69). When out_crs
    # is set every input is warped on read (the VRT analog); default output
    # resolution is the first input's (reproj.py:183-192).
    out_crs: str | None = None
    out_xres: float | None = None
    out_yres: float | None = None
    # any GDAL resampleAlg string (reproject._CONV_KERNELS/_FOOTPRINT_STATS)
    resample: str = "near"
    # Compress window payloads before the tile-assembly shuffle ("z16") —
    # on a multi-node cluster the groupby moves every decoded window over
    # the network, so shuffle bytes bound throughput. None = raw. Only
    # applies to uint16 pixels (the codec's dtype).
    shuffle_codec: str | None = "z16"
    # "skip": a corrupt payload drops only that image (logged in the
    # worker), instead of failing the job — the at-scale operational
    # posture for 10^12-object corpora. Default "raise" = strict parity.
    on_decode_error: str = "raise"
    # Codec for assembled tile / pyramid payloads ("z16" | None=raw). Encoded
    # tiles shrink the post-assembly object-store traffic and the sink files;
    # rows are self-describing via the pixels_codec column.
    tile_codec: str | None = "z16"
    # Ray Data reserves op_resource_reservation_ratio (default 0.5) of the
    # cluster equally across ALL operators in a plan. The mosaic plan has up
    # to 6 operators but ~95% of its CPU-seconds live in ONE (the fused
    # read+decode), so at low CPU counts reservation starves decode to ~1
    # concurrent task (measured: salted soak 76s -> 41s at 8 cpus, 12.8s ->
    # 7.2s at 32 cpus with the ratio at 0). None = leave Ray's default.
    op_reservation_ratio: float | None = 0.0


@dataclass
class MosaicResult:
    grid: OutputGrid
    tiles_ds: "ray.data.Dataset"
    stats: dict | None = None  # band-0 stats (single-band convenience)
    stats_by_band: dict[int, dict] | None = None
    pyramids_ds: "ray.data.Dataset | None" = None
    manifest: pa.Table | None = None
    skipped_tiles: int = 0
    metrics: dict = field(default_factory=dict)


def read_images(images_path: str, columns: list[str] | None = None):
    """Column-pruned catalog read. Lance is the nominal format per
    BASELINE.json (`.lance` paths dispatch to ray.data.read_lance when
    pylance is installed); parquet is the in-sandbox fallback
    (SURVEY.md §1.3). Both prune columns at the scan."""
    if images_path.endswith(".lance"):
        try:
            return ray.data.read_lance(images_path, columns=columns)
        except (ImportError, AttributeError) as exc:
            raise ImportError(
                "reading a .lance dataset requires the pylance package, "
                "which is not installed in this environment; materialize "
                "the table as parquet instead"
            ) from exc
    from ..io import resolve_filesystem

    fs, p = resolve_filesystem(images_path)
    return ray.data.read_parquet(p, columns=columns, filesystem=fs)


def _parquet_num_rows(images_path: str) -> int:
    """Row count straight from parquet footers — no Ray execution."""
    from ..io import catalog_files, parquet_file

    try:
        fs, files = catalog_files(images_path)
        return sum(parquet_file(fs, f).metadata.num_rows for f in files)
    except Exception:
        return 1 << 62  # unknown -> fall back to distributed planning


def compute_grid(meta_ds, cfg: MosaicConfig) -> OutputGrid:
    """Union-extent aggregate (ref makeOutputGrid, mosaic.py:429-456).

    Bounds come from a distributed Min/Max aggregate; resolution / dtype /
    nullval / CRS come from the first input (seq == 0), matching the
    reference's first-file-wins rule.
    """
    agg = meta_ds.aggregate(
        Min("xmin"), Max("xmax"), Min("ymin"), Max("ymax")
    )
    first_rows = meta_ds.map_batches(
        lambda t: t.filter(pc.equal(t["seq"], 0)), batch_format="pyarrow"
    ).take(1)
    if not first_rows:
        raise ValueError("no image with seq == 0 found")
    first = first_rows[0]
    gt = first["gt"]
    x_min, x_max = agg["min(xmin)"], agg["max(xmax)"]
    y_min, y_max = agg["min(ymin)"], agg["max(ymax)"]
    x_res, y_res = gt[1], abs(gt[5])
    ncols = int(round((x_max - x_min) / x_res))
    nrows = int(round((y_max - y_min) / y_res))
    return OutputGrid(
        ncols=ncols,
        nrows=nrows,
        transform=(x_min, x_res, 0.0, y_max, 0.0, -y_res),
        crs=first["crs"],
        dtype=first["dtype"],
        nullval=first["nullval"] if cfg.nullval is None else cfg.nullval,
        nbands=1,
        blocksize=cfg.blocksize,
        layer_type=first.get("layer_type", "athematic"),
    )


def grid_for(images_path: str, cfg: MosaicConfig) -> OutputGrid:
    cols = meta_columns(images_path)
    meta_ds = probe_metadata(read_images(images_path, cols), cfg.layout)
    return compute_grid(meta_ds, cfg)


def plan_assignments(images_path: str, cfg: MosaicConfig, grid: OutputGrid | None = None):
    """Standalone spatial-join operator: images -> assignment table."""
    cols = meta_columns(images_path)
    meta_ds = probe_metadata(read_images(images_path, cols), cfg.layout)
    if grid is None:
        grid = compute_grid(meta_ds, cfg)
        meta_ds = probe_metadata(read_images(images_path, cols), cfg.layout)
    if cfg.join_strategy == "cell_join":
        return assign_cell_join(meta_ds, grid)
    if cfg.join_strategy == "cell_join_s2":
        from ..stages.plan import assign_cell_join_s2

        return assign_cell_join_s2(meta_ds, grid, level=cfg.s2_level)
    return assign_direct(meta_ds, grid)


def do_mosaic(
    images_path: str,
    cfg: MosaicConfig,
    out_dir: str | None = None,
    resume: bool = False,
) -> MosaicResult:
    """Run the full mosaic. If ``out_dir`` is given, tiles are written through
    the committed-partition sink (resumable); otherwise the tiles dataset is
    returned lazily for the caller to consume.

    ``result.metrics["phase_s"]`` records per-phase wall times (the
    reference's Monitoring.timestamps phases "analysis"/"domosaic",
    ref monitoring.py:64-217, mosaic.py:169-176)."""
    if cfg.op_reservation_ratio is None:
        return _do_mosaic_impl(images_path, cfg, out_dir, resume)
    data_ctx = ray.data.DataContext.get_current()
    prev = data_ctx.op_resource_reservation_ratio
    data_ctx.op_resource_reservation_ratio = cfg.op_reservation_ratio
    try:
        # Datasets capture the context at creation, so the whole plan —
        # including a lazily-returned tiles_ds — runs with the tuned ratio.
        return _do_mosaic_impl(images_path, cfg, out_dir, resume)
    finally:
        data_ctx.op_resource_reservation_ratio = prev


def _do_mosaic_impl(
    images_path: str,
    cfg: MosaicConfig,
    out_dir: str | None = None,
    resume: bool = False,
) -> MosaicResult:
    import time as _time
    from collections import Counter

    from ..geo import covering_tile_range, window_overlap

    phase_s: dict[str, float] = {}
    _t = _time.monotonic()

    def _mark(name: str):
        nonlocal _t
        now = _time.monotonic()
        phase_s[name] = round(now - _t, 4)
        _t = now

    if out_dir is not None and not resume:
        # Fresh-run semantics (ref mosaic.py:634-636: existing output is
        # deleted and recreated) — otherwise stale committed partitions from
        # a prior run double-count in every read-back.
        manifest_mod.clear_output(out_dir)

    warp = None
    if cfg.out_crs is not None:
        from ..stages.reproject import WarpSpec

        xres, yres = cfg.out_xres, cfg.out_yres
        if xres is None or yres is None:
            # reference default: first input's resolution (reproj.py:183-192)
            from .. import crs as _crs

            first = _first_meta(images_path, cfg.layout)
            if _crs.point_transformer(first.crs, cfg.out_crs) is not None:
                # curvilinear pair (e.g. degrees -> metres): the source
                # resolution is in different units and is not a usable
                # default
                raise _crs.ProjectionError(
                    f"warping {first.crs} -> {cfg.out_crs} changes units; "
                    "set out_xres/out_yres explicitly"
                )
            xres = first.x_res if xres is None else xres
            yres = first.y_res if yres is None else yres
        warp = WarpSpec(cfg.out_crs, xres, yres, cfg.resample)

    bands = _bands_of(images_path)

    need_counts = cfg.salt_threshold is not None or cfg.include_empty
    nbands = len(bands)  # stamped onto the grid after it's built

    use_driver_plan = cfg.planning == "driver"
    if cfg.planning == "auto":
        use_driver_plan = _parquet_num_rows(images_path) <= cfg.driver_plan_limit

    tile_counts: dict[int, int] = {}
    tile_seq_bounds: dict[int, tuple[int, int]] = {}
    assigned_ids_ds = None  # distributed-plan assigned-tile ids (Dataset)
    if use_driver_plan:
        # The reference's whole analysis phase is driver-side
        # (mosaic.py:187-195); for small inputs one local pruned-column
        # parquet read beats five distributed executions. Metadata only —
        # never pixel bytes.
        import pyarrow.parquet as _pq

        tbl = _pq.read_table(images_path, columns=meta_columns(images_path))
        from ..stages.plan import metas_from_batch

        pairs = metas_from_batch(tbl, cfg.layout)
        if warp is not None:
            from ..stages.reproject import warped_meta

            pairs = [(seq, warped_meta(m, warp)) for seq, m in pairs]
        metas = [m for _seq, m in sorted(pairs, key=lambda p: p[0])]
        grid = make_output_grid(metas, cfg.blocksize, cfg.nullval)
        if cfg.validate_projections:
            from ..crs import ProjectionError

            tol = 0.0001  # ref reproj.py:117-127
            for m in metas:
                if m.crs != grid.crs:
                    raise ProjectionError(
                        f"CRS mismatch: {m.image_id} {m.crs}"
                    )
                if (
                    abs(m.transform[1] - grid.transform[1]) > tol
                    or abs(m.transform[5] - grid.transform[5]) > tol
                ):
                    raise ProjectionError(f"resolution mismatch: {m.image_id}")
                dx = (m.transform[0] - grid.transform[0]) / grid.transform[1]
                dy = (m.transform[3] - grid.transform[3]) / grid.transform[5]
                if abs(dx - round(dx)) > tol or abs(dy - round(dy)) > tol:
                    raise ProjectionError(f"grid misalignment: {m.image_id}")
        if need_counts:
            counter: Counter = Counter()
            seen_ids = set()
            for seq, m in sorted(pairs, key=lambda p: p[0]):
                # bands of one image share a footprint — count each image once
                if m.image_id in seen_ids:
                    continue
                seen_ids.add(m.image_id)
                tr0, tr1, tc0, tc1 = covering_tile_range(m, grid)
                for trow in range(tr0, tr1):
                    for tcol in range(tc0, tc1):
                        tid = grid.tile_id(trow, tcol)
                        if window_overlap(
                            grid.block_for_tile(tid), grid.transform, m
                        ):
                            counter[tid] += 1
                            lo, hi = tile_seq_bounds.get(tid, (seq, seq))
                            tile_seq_bounds[tid] = (min(lo, seq), max(hi, seq))
            tile_counts = dict(counter)
        n_images = len({m.image_id for m in metas})
    else:
        meta_ds = probe_metadata(
            read_images(images_path, meta_columns(images_path)), cfg.layout, warp
        ).materialize()
        grid = compute_grid(meta_ds, cfg)
        if cfg.validate_projections:
            plan_stage.check_projections(meta_ds, grid)
        if need_counts:
            # distributed count + seq extent per tile. Only OVER-THRESHOLD
            # (hot) tiles ever reach the driver — the full per-tile count
            # table stays a Dataset (round-2 verdict: a take_all of one row
            # per assigned tile is several GB of driver dict at the
            # ~10^8-tile grids the 100 TB target implies). Per-band rows
            # inflate counts by |bands| (same footprint per band) —
            # normalize for the salt-threshold heuristic.
            from ray.data.aggregate import Count

            counts_ds = (
                assign_direct(meta_ds, grid)
                .select_columns(["tile_id", "seq"])
                .groupby("tile_id")
                .aggregate(Count(), Min("seq"), Max("seq"))
                .materialize()
            )
            nb = len(bands)
            if counts_ds.count() <= cfg.plan_collect_limit:
                # small assigned set: one tiny take_all is cheaper than the
                # extra filter pass + bucket-groupby of the driver-free path
                count_rows = counts_ds.take_all()
                tile_counts = {
                    r["tile_id"]: -(-r["count()"] // nb) for r in count_rows
                }
                tile_seq_bounds = {
                    r["tile_id"]: (r["min(seq)"], r["max(seq)"])
                    for r in count_rows
                }
            else:
                if cfg.salt_threshold is not None:
                    thr = cfg.salt_threshold

                    def hot_only(b: pa.Table) -> pa.Table:
                        cnt = b["count()"].to_numpy()
                        return b.filter(pa.array(-(-cnt // nb) >= thr))

                    hot_rows = counts_ds.map_batches(
                        hot_only, batch_format="pyarrow"
                    ).take_all()
                    tile_counts = {
                        r["tile_id"]: -(-r["count()"] // nb) for r in hot_rows
                    }
                    tile_seq_bounds = {
                        r["tile_id"]: (r["min(seq)"], r["max(seq)"])
                        for r in hot_rows
                    }
                if cfg.include_empty:
                    assigned_ids_ds = counts_ds.select_columns(["tile_id"])
        n_images = meta_ds.count() // len(bands)
    grid.nbands = nbands

    # hot_tiles: tile_id -> (n_salts, seq_min, seq_span). Salting over the
    # TILE's own seq extent keeps salts evenly loaded when a hot stack sits
    # in a narrow slice of the global input list (a global-range mapping
    # left 3/4 of the salts empty on the soak workload).
    hot_tiles: dict[int, tuple[int, int, int]] = {}
    if cfg.salt_threshold is not None:
        for tid, cnt in tile_counts.items():
            if cnt >= cfg.salt_threshold:
                mn, mx = tile_seq_bounds.get(tid, (0, max(n_images - 1, 0)))
                hot_tiles[tid] = (
                    min(cfg.max_salts, max(2, -(-cnt // cfg.inputs_per_salt))),
                    int(mn),
                    max(int(mx) - int(mn) + 1, 1),
                )

    # z16 (zlib raw) is dtype-generic; only the lossy q12 is uint16-bound.
    def _codec_for_dtype(codec):
        return None if (codec == "q12" and grid.dtype != "uint16") else codec

    shuffle_codec = _codec_for_dtype(cfg.shuffle_codec)
    images_ds = read_images(images_path)  # all cols incl. bytes
    windows = decode_windows(
        images_ds,
        grid,
        cfg.layout,
        concurrency=cfg.decode_concurrency,
        batch_size=cfg.decode_batch_size,
        hot_tiles=hot_tiles,
        shuffle_codec=shuffle_codec,
        warp=warp,
        on_decode_error=cfg.on_decode_error,
    )

    skipped = 0
    committed: set[tuple[int, int]] = set()
    if resume and out_dir:
        manifest_mod.sweep_tmp(out_dir)
        committed = manifest_mod.committed_keys(out_dir)
        if committed:
            skipped = len(committed)
            # pack (tile_id, band) into one int64 so the filter is a single
            # vectorized np.isin against a sorted array (a committed set at
            # scale is millions of keys — no per-row Python membership)
            packed = np.sort(np.array(
                [(t << 20) | b for t, b in committed], dtype=np.int64
            ))
            committed_ref = ray.put(packed)

            def drop_committed(batch: pa.Table) -> pa.Table:
                done = ray.get(committed_ref)
                keys = (
                    batch["tile_id"].to_numpy().astype(np.int64) << 20
                ) | batch["band"].to_numpy().astype(np.int64)
                return batch.filter(pa.array(~np.isin(keys, done)))

            windows = windows.map_batches(drop_committed, batch_format="pyarrow")

    tile_codec = _codec_for_dtype(cfg.tile_codec)
    emit_partials = cfg.feather_partials and cfg.merge == "feather"
    if hot_tiles and cfg.merge == "feather":
        from ..stages.assemble import assemble_tiles_salted_feather

        tiles = assemble_tiles_salted_feather(
            windows, grid,
            window_codec=shuffle_codec, tile_codec=tile_codec,
            multiband=len(bands) > 1, emit_partials=emit_partials,
        )
    elif hot_tiles and cfg.merge == "last":
        from ..stages.assemble import assemble_tiles_salted

        tiles = assemble_tiles_salted(
            windows, grid, cfg.merge,
            window_codec=shuffle_codec, tile_codec=tile_codec,
            multiband=len(bands) > 1,
        )
    elif hot_tiles and cfg.merge == "nearest":
        from ..stages.assemble import assemble_tiles_salted_nearest

        tiles = assemble_tiles_salted_nearest(
            windows, grid,
            window_codec=shuffle_codec, tile_codec=tile_codec,
            multiband=len(bands) > 1,
        )
    elif hot_tiles and cfg.merge == "mean":
        from ..stages.assemble import assemble_tiles_salted_feather

        # mean = feather with unit weights: order-free sum/count partials
        tiles = assemble_tiles_salted_feather(
            windows, grid,
            window_codec=shuffle_codec, tile_codec=tile_codec,
            multiband=len(bands) > 1, uniform=True,
        )
    elif hot_tiles and cfg.merge in ("max", "min"):
        from ..stages.assemble import assemble_tiles_salted_extreme

        # per-pixel extremes ARE mergeable from disjoint partials
        tiles = assemble_tiles_salted_extreme(
            windows, grid, cfg.merge,
            window_codec=shuffle_codec, tile_codec=tile_codec,
            multiband=len(bands) > 1,
        )
    else:
        # merge == "median" lands here even with hot tiles BY DESIGN:
        # per-pixel medians are not mergeable from disjoint partials
        # (_merge_median docstring has the memory contract).
        tiles = assemble_tiles(
            windows, grid, cfg.merge,
            windows_encoded=shuffle_codec is not None, tile_codec=tile_codec,
            multiband=len(bands) > 1, emit_partials=emit_partials,
        )

    if cfg.include_empty:
        # Tiles intersecting no input -> all-null canvases (ref
        # mosaic.py:351-359), synthesized DISTRIBUTED: an anti-join of
        # range(num_tiles) against the broadcast assigned ids, filtered per
        # (tile_id, band) against the resume keys so a kill landing between
        # two partitions of one empty tile's bands re-emits only the
        # uncommitted band (round-1 ADVICE).
        from ..stages.assemble import empty_tiles_ds, empty_tiles_ds_from_assigned

        # Materialize the (tiny, z16-compressed all-null) empty-tile branch
        # BEFORE the union: a lazy union adds its operators to the main
        # plan and the streaming executor's slot split starves the
        # CPU-heavy decode stage at low CPU counts (measured 2x on the
        # 8-cpu soak). The branch stays distributed — only its execution is
        # decoupled.
        if assigned_ids_ds is not None:
            # distributed plan: the assigned set never touches the driver —
            # the anti-join is a bucket groupby against the id dataset
            empties = empty_tiles_ds_from_assigned(
                grid, assigned_ids_ds, committed, bands, tile_codec,
                emit_partials=emit_partials,
            ).materialize()
        else:
            empties = empty_tiles_ds(
                grid, set(tile_counts), committed, bands, tile_codec,
                emit_partials=emit_partials,
            ).materialize()
        if empties.count() > 0:
            tiles = tiles.union(empties)

    _mark("analysis")
    result = MosaicResult(grid=grid, tiles_ds=tiles, skipped_tiles=skipped)

    if out_dir is not None:
        # grid + seq high-water mark persist beside the manifest so
        # incremental updates (pipelines/update.py) plan on the same grid.
        # The mark is max(seq)+1, NOT the image count: an explicit catalog
        # seq column may be non-dense/non-0-based, and a later update must
        # hand out seqs strictly above every existing one or last-non-null
        # precedence inverts vs append order.
        if use_driver_plan:
            n_seq_hwm = (max(s for s, _ in pairs) + 1) if pairs else 0
        else:
            mx = meta_ds.max("seq")
            n_seq_hwm = int(mx) + 1 if mx is not None else 0
        manifest_mod.write_grid_meta(out_dir, grid, n_seq_hwm, bands)
        result.manifest = manifest_mod.write_tiles(
            tiles, out_dir, tiles_per_file=cfg.tiles_per_file
        )
        # generation barrier: every partition above is committed, so the
        # newest manifest stamp marks a known-complete state (feather
        # updates pin their base reads to it; see state/manifest.py)
        manifest_mod.write_grid_meta(
            out_dir, grid, n_seq_hwm, bands,
            gen_hwm=manifest_mod.max_manifest_commit(out_dir),
            applied_updates=[],
        )
        result.tiles_ds = manifest_mod.read_committed_tiles(out_dir)
        _mark("domosaic")

    if cfg.do_pyramids:
        result.pyramids_ds = build_pyramids(
            result.tiles_ds, grid, cfg.min_overview_size
        )
    if cfg.do_stats:
        # Pure columnar aggregate over the per-tile partials emitted by
        # assemble — no pixel re-decode. When reading back from the sink,
        # prune to just the stat columns.
        if out_dir is not None:
            # partials already rode the manifest rows — driver-side sum only
            result.stats_by_band = manifest_mod.stats_from_manifest(out_dir)
        else:
            result.stats_by_band = compute_stats_from_columns(result.tiles_ds)
        result.stats = result.stats_by_band.get(0)
        _mark("stats")
    result.metrics["phase_s"] = phase_s
    return result


# ---------------------------------------------------------------------------
# Test / small-scale helpers (drivers-side; NOT the scale path)
# ---------------------------------------------------------------------------

def mosaic_array(tiles_ds, grid: OutputGrid, band: int = 0) -> np.ndarray:
    """Reassemble one band's full mosaic ndarray from tile rows (tests
    only)."""
    np_dtype = np.dtype(grid.dtype)
    out = np.full((grid.nrows, grid.ncols), grid.nullval, dtype=np_dtype)
    from ..stages.assemble import decode_payload

    for batch in tiles_ds.iter_batches(batch_format="pyarrow"):
        for i in range(batch.num_rows):
            if batch["band"][i].as_py() != band:
                continue
            top = batch["out_top"][i].as_py()
            left = batch["out_left"][i].as_py()
            ys = batch["out_ysize"][i].as_py()
            xs = batch["out_xsize"][i].as_py()
            arr = decode_payload(
                batch["pixels"][i].as_buffer(),
                batch["pixels_codec"][i].as_py(),
                np_dtype,
            )
            out[top : top + ys, left : left + xs] = arr.reshape(ys, xs)
    return out


def iter_band_slabs(tiles_ds, grid: OutputGrid, band: int | None = None):
    """Stream the mosaic as full-width row slabs in (band, top) order —
    the bounded-memory feed for single-file exports (sinks/gtiff.py).

    Ray sorts the tile rows (tile_id is row-major, geo.py:168) so the
    driver only ever holds ONE grid-tile row of ONE band — O(tile_row_h
    x ncols), never the full canvas (the reference writes block-by-block
    through its single writer for the same reason, ref mosaic.py:286-394).
    Yields ``(band, top, slab)`` with slab shaped (out_ysize, grid.ncols),
    missing tiles left at nullval; absent tile ROWS are simply skipped
    (callers gap-fill from `top`)."""
    from ..stages.assemble import decode_payload

    np_dtype = np.dtype(grid.dtype)
    fill = grid.nullval if grid.nullval is not None else 0
    cols = ["band", "tile_id", "out_top", "out_left", "out_ysize",
            "out_xsize", "pixels", "pixels_codec"]
    ds = tiles_ds.select_columns(cols)
    if band is not None:
        def _only(b: pa.Table) -> pa.Table:
            return b.filter(pc.equal(b["band"], band))

        ds = ds.map_batches(_only, batch_format="pyarrow")
        ds = ds.sort("tile_id")
    else:
        ds = ds.sort(["band", "tile_id"])
    cur: tuple[int, int] | None = None
    slab = None
    for batch in ds.iter_batches(batch_format="pyarrow"):
        for i in range(batch.num_rows):
            b = batch["band"][i].as_py()
            top = batch["out_top"][i].as_py()
            if cur != (b, top):
                if slab is not None:
                    yield cur[0], cur[1], slab
                ys0 = batch["out_ysize"][i].as_py()
                slab = np.full((ys0, grid.ncols), fill, dtype=np_dtype)
                cur = (b, top)
            left = batch["out_left"][i].as_py()
            ys = batch["out_ysize"][i].as_py()
            xs = batch["out_xsize"][i].as_py()
            arr = decode_payload(
                batch["pixels"][i].as_buffer(),
                batch["pixels_codec"][i].as_py(),
                np_dtype,
            )
            slab[:ys, left : left + xs] = arr.reshape(ys, xs)
    if slab is not None:
        yield cur[0], cur[1], slab


def overview_array(
    pyramids_ds, grid: OutputGrid, lvl: int, band: int = 0
) -> np.ndarray:
    """Reassemble one overview level, pasting in row-major tile order like
    the reference's ordered writer (tests only)."""
    np_dtype = np.dtype(grid.dtype)
    ov_r, ov_c = overview_dims(grid, lvl)
    out = np.full((ov_r, ov_c), grid.nullval, dtype=np_dtype)
    rows = []
    for batch in pyramids_ds.iter_batches(batch_format="pyarrow"):
        for i in range(batch.num_rows):
            if batch["level"][i].as_py() != lvl:
                continue
            if batch["band"][i].as_py() != band:
                continue
            rows.append(
                (
                    batch["tile_id"][i].as_py(),
                    batch["yoff"][i].as_py(),
                    batch["xoff"][i].as_py(),
                    batch["h"][i].as_py(),
                    batch["w"][i].as_py(),
                    batch["pixels_codec"][i].as_py(),
                    batch["pixels"][i].as_py(),
                )
            )
    from ..stages.assemble import decode_payload

    for tid, yoff, xoff, h, w, codec, buf in sorted(rows):
        arr = decode_payload(buf, codec, np_dtype).reshape(h, w)
        out[yoff : yoff + h, xoff : xoff + w] = arr
    return out


def tile_caption_manifest(images_path: str, cfg: MosaicConfig):
    """(tile_id, image_id, seq, caption) — the caption-passthrough surface
    of the image+caption data model: every (tile, contributing image) pair
    from the spatial join carries its catalog caption BYTE-EQUAL (captions
    broadcast once via ray.put; assignment rows never carry text through
    the join itself)."""
    import pyarrow.parquet as _pq

    cap_tbl = _pq.read_table(images_path, columns=["image_id", "caption"])
    cap_map = dict(
        zip(cap_tbl["image_id"].to_pylist(), cap_tbl["caption"].to_pylist())
    )
    ref = ray.put(cap_map)

    def attach(batch: pa.Table) -> pa.Table:
        cmap = ray.get(ref)
        caps = [cmap.get(i) for i in batch["image_id"].to_pylist()]
        return batch.select(["tile_id", "image_id", "seq"]).append_column(
            "caption", pa.array(caps, pa.string())
        )

    return plan_assignments(images_path, cfg).map_batches(
        attach, batch_format="pyarrow"
    )
