"""Incremental mosaic update: merge NEW images into a committed output.

Beyond-reference capability (the reference always deletes and rebuilds the
whole output, ref /root/reference/moamosaic/mosaic.py:634-636): given an
out_dir produced by ``do_mosaic(..., out_dir=...)``, ``update_mosaic`` folds
a new image catalog in by rewriting ONLY the tiles the new footprints touch.

Mechanics (all streaming, one shuffle over the affected subset):

1. The stored grid + seq high-water mark load from ``grid.json``
   (state/manifest.py) — planning runs on the exact original grid, and new
   images get sequence numbers ABOVE every original input, so last-non-null
   gives them precedence exactly as if they had been appended to the input
   list of a full rebuild.
2. New windows decode through the normal fused join+decode stage.
3. Committed tiles for the affected (tile, band) keys are read back (column
   pruned? no — pixels needed) and converted to synthetic full-canvas window
   rows with ``seq = -1`` (before every real input), so one groupby merge
   overlays new windows onto the existing canvas.
4. Updated tiles write through the SAME committed sink. Old partitions are
   not touched: each tile row carries a ``committed_at`` stamp and readers
   resolve the newest generation per key (manifest.read_committed_tiles), so
   a kill mid-update leaves a readable output (old generation) and the
   update is idempotent — rerunning it converges to the same content.

Stats after an update are recomputed from the winning tiles' stat COLUMNS
(pixels pruned at the scan) — the manifest partial-sum fast path would
double-count superseded generations.

``merge="feather"`` updates need the base mosaic built with
``MosaicConfig(feather_partials=True)``: the committed tiles then carry
their zlib(float64) num/den weighted sums, the update adds the new
windows' contributions (base partial first, new partials after — the same
salt-ordered summation the salted feather merge uses) and re-blends, and
the updated sums persist again so updates chain indefinitely. Parity vs a
full rebuild is within one code value (float-sum reassociation), the same
bound the salted/unsalted feather equivalence carries.

The new catalog's CRS/alignment must match the stored grid (validated
like any mosaic input). Footprints beyond the stored extent clip in
``update_mosaic`` (the grid is fixed); use ``extend_mosaic`` to GROW the
grid — committed pixels migrate as base windows onto the union-extent
grid (old sources never re-read) and a complete re-keyed output writes
to a new directory (``merge="last"`` only).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray

from ..stages.assemble import assemble_tiles, decode_payload
from ..stages.decode import WINDOW_SCHEMA, decode_windows
from ..state import manifest as manifest_mod
from .mosaic import MosaicConfig, MosaicResult, meta_columns, read_images


def _existing_as_feather_partials(tiles_ds, affected_ref):
    """Committed tile rows (with persisted num/den) -> FEATHER_PARTIAL rows
    (salt = 0, so the final sum folds the base in before the new images)."""
    from ..stages.assemble import FEATHER_PARTIAL_SCHEMA

    def to_partials(batch: pa.Table) -> pa.Table:
        affected = ray.get(affected_ref)
        if "num" not in batch.schema.names or "den" not in batch.schema.names:
            raise ValueError(
                "feather update needs persisted num/den partials — rebuild "
                "the base mosaic with MosaicConfig(merge='feather', "
                "feather_partials=True)"
            )
        rows = {n: [] for n in FEATHER_PARTIAL_SCHEMA.names}
        for i in range(batch.num_rows):
            tid = batch["tile_id"][i].as_py()
            band = batch["band"][i].as_py()
            if (tid, band) not in affected:
                continue
            num = batch["num"][i].as_py()
            den = batch["den"][i].as_py()
            if num is None or den is None:
                raise ValueError(
                    f"tile {tid} band {band} has no persisted feather "
                    "partials — rebuild with feather_partials=True"
                )
            rows["tile_id"].append(tid)
            rows["band"].append(band)
            rows["salt"].append(0)
            rows["out_top"].append(batch["out_top"][i].as_py())
            rows["out_left"].append(batch["out_left"][i].as_py())
            rows["out_xsize"].append(batch["out_xsize"][i].as_py())
            rows["out_ysize"].append(batch["out_ysize"][i].as_py())
            rows["n_inputs"].append(batch["n_inputs"][i].as_py())
            rows["input_ids"].append(batch["input_ids"][i].as_py())
            rows["num"].append(num)
            rows["den"].append(den)
        return pa.Table.from_pydict(rows, schema=FEATHER_PARTIAL_SCHEMA)

    return tiles_ds.map_batches(to_partials, batch_format="pyarrow")


def _existing_as_windows(tiles_ds, affected_ref, np_dtype, shuffle_codec):
    """Committed tile rows -> synthetic WINDOW_SCHEMA rows (seq = -1)."""
    from .. import codecs

    def to_windows(batch: pa.Table) -> pa.Table:
        affected = ray.get(affected_ref)
        rows = {n: [] for n in WINDOW_SCHEMA.names}
        codec_col = batch["pixels_codec"].to_pylist()
        for i in range(batch.num_rows):
            tid = batch["tile_id"][i].as_py()
            band = batch["band"][i].as_py()
            if (tid, band) not in affected:
                continue
            ys = batch["out_ysize"][i].as_py()
            xs = batch["out_xsize"][i].as_py()
            canvas = decode_payload(
                batch["pixels"][i].as_buffer(), codec_col[i], np_dtype
            ).reshape(ys, xs)
            rows["tile_id"].append(tid)
            rows["band"].append(band)
            rows["salt"].append(0)
            rows["seq"].append(-1)  # before every real input
            rows["image_id"].append("__existing__")
            rows["out_top"].append(batch["out_top"][i].as_py())
            rows["out_left"].append(batch["out_left"][i].as_py())
            rows["out_xsize"].append(xs)
            rows["out_ysize"].append(ys)
            rows["dst_top"].append(0)
            rows["dst_left"].append(0)
            rows["win_h"].append(ys)
            rows["win_w"].append(xs)
            rows["src_top"].append(0)
            rows["src_left"].append(0)
            rows["src_h"].append(ys)
            rows["src_w"].append(xs)
            wire = (
                np_dtype.newbyteorder("<") if np_dtype.itemsize > 1 else np_dtype
            )
            arr = np.ascontiguousarray(canvas, dtype=wire)
            if shuffle_codec:
                rows["pixels"].append(codecs.encode(arr, shuffle_codec))
            else:
                rows["pixels"].append(arr.tobytes())
        return pa.Table.from_pydict(rows, schema=WINDOW_SCHEMA)

    return tiles_ds.map_batches(to_windows, batch_format="pyarrow")


def _update_content_id(images_path: str) -> str:
    """Content id of an update-delta catalog: sorted (image_id, seq,
    sha256(payload)) triples — PAYLOAD bytes included, so a second,
    genuinely different delta that reuses image_ids (corrected imagery
    re-delivered under the same ids) hashes differently and is applied
    rather than silently no-op'd. Streams the bytes column one row-group
    at a time; the delta is <= driver_plan_limit rows by the caller's
    guard, so this stays a bounded local read."""
    import hashlib as _hashlib

    from ..io import catalog_files, parquet_file

    fs, files = catalog_files(images_path)
    triples = []
    for f in files:
        pf = parquet_file(fs, f)
        names = set(pf.schema_arrow.names)
        cols = ["image_id"] + (["seq"] if "seq" in names else []) + (
            ["bytes"] if "bytes" in names else []
        )
        for rb in pf.iter_batches(columns=cols):
            ids = rb.column("image_id").to_pylist()
            seqs = (
                rb.column("seq").to_pylist()
                if "seq" in cols
                else [None] * rb.num_rows
            )
            if "bytes" in cols:
                payloads = [
                    _hashlib.sha256(v.as_py()).hexdigest()[:16]
                    if v.is_valid
                    else ""
                    for v in rb.column("bytes")
                ]
            else:
                payloads = [""] * rb.num_rows
            triples.extend(zip(ids, seqs, payloads))
    return _hashlib.sha256(repr(sorted(triples)).encode()).hexdigest()[:16]


def update_mosaic(
    images_path: str,
    cfg: MosaicConfig,
    out_dir: str,
) -> MosaicResult:
    """Fold a new image catalog into the committed mosaic at ``out_dir``.

    Planning is deliberately driver-side: an incremental update's catalog is
    the DELTA (typically a few images against a huge committed mosaic), so a
    pruned-column local read of the delta is the right cost model. A delta
    too large for the driver (>~10^6 rows) is no longer an "update" — run
    ``do_mosaic`` (which auto-dispatches to distributed planning above
    ``driver_plan_limit``) over the concatenated catalog instead.

    Deltas in a foreign CRS / resolution / alignment warp on read when
    ``cfg.out_crs`` names the STORED grid CRS: the WarpSpec anchors at the
    stored origin so warped inputs land on the committed lattice exactly;
    committed pixels are never resampled (ref reproj.py:130-218 semantics
    applied to the delta only)."""
    if cfg.merge not in ("last", "feather"):
        raise ValueError(
            f"update_mosaic supports 'last' and 'feather', got {cfg.merge!r}"
        )
    # guard the driver-side cost model BEFORE touching anything: a delta
    # past driver_plan_limit is a rebuild, not an update (see docstring)
    from .mosaic import _parquet_num_rows

    n_delta = _parquet_num_rows(images_path)
    if n_delta > cfg.driver_plan_limit:
        raise ValueError(
            f"update delta has {n_delta} rows > driver_plan_limit "
            f"({cfg.driver_plan_limit}): that is a rebuild, not an update — "
            "run do_mosaic over the concatenated catalog (it dispatches to "
            "distributed planning above the same limit)"
        )
    grid, n_seq0, bands = manifest_mod.load_grid_meta(out_dir)
    np_dtype = np.dtype(grid.dtype)

    # --- plan the new images on the stored grid -------------------------
    import pyarrow.parquet as _pq

    from ..geo import covering_tile_range, window_overlap
    from ..stages.plan import metas_from_batch

    cols = meta_columns(images_path)
    from ..io import resolve_filesystem as _rfs

    _fs, _p = _rfs(images_path)
    try:
        # band is not a planning column (meta_columns prunes it) but the
        # affected-key set is per (tile, band) — read it when present
        tbl = _pq.read_table(_p, columns=cols + ["band"], filesystem=_fs)
    except Exception:
        tbl = _pq.read_table(_p, columns=cols, filesystem=_fs)
    pairs = metas_from_batch(tbl, cfg.layout)
    new_bands = (
        sorted(set(tbl["band"].to_pylist()))
        if "band" in tbl.schema.names
        else [0]
    )
    # warp-on-read onto the STORED grid when requested: cfg.out_crs must
    # name the committed CRS (an update cannot change it), and the WarpSpec
    # anchors at the stored origin so every warped input lands on the
    # committed lattice by construction (ref reproj.py:130-218 semantics,
    # applied to the delta only — committed pixels are never resampled)
    warp = None
    if cfg.out_crs is not None:
        if cfg.out_crs != grid.crs:
            raise ValueError(
                f"update out_crs {cfg.out_crs!r} != stored grid CRS "
                f"{grid.crs!r}: an update folds into the committed grid — "
                "to change CRS, rebuild with do_mosaic"
            )
        from ..stages.reproject import WarpSpec, warped_meta

        warp = WarpSpec(
            grid.crs,
            grid.transform[1],
            abs(grid.transform[5]),
            cfg.resample,
            anchor=(grid.transform[0], grid.transform[3]),
        )
        pairs = [(s, warped_meta(m, warp)) for s, m in pairs]
    # same homogeneity validation as a fresh mosaic (ref reproj.py:72-127):
    # without a warp, inputs must already live on the stored grid (with one,
    # the anchored warped metas pass by construction)
    if cfg.validate_projections:
        from ..crs import ProjectionError

        tol = 0.0001
        for _seq, m in pairs:
            if m.crs != grid.crs:
                raise ProjectionError(
                    f"update input {m.image_id}: CRS {m.crs} != stored grid "
                    f"CRS {grid.crs} (set out_crs to the stored CRS to warp "
                    "the delta on read)"
                )
            if (
                abs(m.transform[1] - grid.transform[1]) > tol
                or abs(m.transform[5] - grid.transform[5]) > tol
            ):
                raise ProjectionError(
                    f"update input {m.image_id}: resolution mismatch"
                )
            dx = (m.transform[0] - grid.transform[0]) / grid.transform[1]
            dy = (m.transform[3] - grid.transform[3]) / grid.transform[5]
            if abs(dx - round(dx)) > tol or abs(dy - round(dy)) > tol:
                raise ProjectionError(
                    f"update input {m.image_id}: grid misalignment"
                )

    affected: set[tuple[int, int]] = set()
    seen = set()
    for _seq, m in pairs:
        if m.image_id in seen:
            continue
        seen.add(m.image_id)
        tr0, tr1, tc0, tc1 = covering_tile_range(m, grid)
        for tr in range(tr0, tr1):
            for tc in range(tc0, tc1):
                tid = grid.tile_id(tr, tc)
                if window_overlap(grid.block_for_tile(tid), grid.transform, m):
                    for b in new_bands:
                        affected.add((tid, b))
    n_new = len(seen)
    if not affected:
        return MosaicResult(
            grid=grid,
            tiles_ds=manifest_mod.read_committed_tiles(out_dir),
        )

    def _codec_for_dtype(codec):
        return None if (codec == "q12" and grid.dtype != "uint16") else codec

    shuffle_codec = _codec_for_dtype(cfg.shuffle_codec)
    tile_codec = _codec_for_dtype(cfg.tile_codec)

    # --- new windows, seqs shifted above the original high-water mark ---
    has_seq_col = "seq" in tbl.schema.names
    if has_seq_col:
        # explicit catalog seq: shift BEFORE decode so merge order among the
        # new inputs is preserved above the original high-water mark
        def shift_seq(batch: pa.Table) -> pa.Table:
            names = batch.schema.names
            shifted = pa.compute.add(batch["seq"], pa.scalar(n_seq0))
            return batch.set_column(names.index("seq"), "seq", shifted)

        images_ds = read_images(images_path).map_batches(
            shift_seq, batch_format="pyarrow"
        )
    else:
        images_ds = read_images(images_path)
    new_windows = decode_windows(
        images_ds, grid, cfg.layout, shuffle_codec=shuffle_codec, warp=warp
    )
    if not has_seq_col:
        # layout-derived seq (= image index): shift after decode
        def shift_window_seq(batch: pa.Table) -> pa.Table:
            names = batch.schema.names
            shifted = pa.compute.add(batch["seq"], pa.scalar(n_seq0))
            return batch.set_column(names.index("seq"), "seq", shifted)

        new_windows = new_windows.map_batches(
            shift_window_seq, batch_format="pyarrow"
        )

    # drop windows of unaffected tiles? impossible: every new window's tile
    # is affected by construction.

    affected_ref = ray.put(affected)
    multiband = len(set(bands) | set(new_bands)) > 1
    extras = manifest_mod.load_grid_extras(out_dir)
    if cfg.merge == "feather":
        # --- weighted-sum continuation: persisted num/den partials -------
        # base partials (salt 0) + new-window partials (salt 1) sum in salt
        # order and re-blend; the updated sums persist again (emit_partials)
        # so updates chain indefinitely. No original source is re-read.
        #
        # Unlike last-wins, re-adding a delta DOUBLES its weight, so two
        # guards make this safe: (1) a content id of the update catalog in
        # grid.json's applied_updates makes a completed update's rerun a
        # no-op; (2) the base read pins to gen_hwm (the last known-COMPLETE
        # generation barrier), so a KILLED update's partial commits are
        # invisible to the retry, whose rewrite then supersedes them.
        from ..stages.assemble import (
            make_feather_final_fn,
            make_feather_partial_fn,
        )

        update_id = _update_content_id(images_path)
        if update_id in extras["applied_updates"]:
            # already folded in (rerun of a completed update): no-op
            result = MosaicResult(
                grid=grid,
                tiles_ds=manifest_mod.read_committed_tiles(out_dir),
            )
            if cfg.do_stats:
                from ..stages.stats import stats_from_tile_columns

                stat_cols = [
                    "tile_id", "band", "nonnull_count", "px_sum", "px_ssq",
                    "px_min", "px_max", "committed_at",
                ]
                pruned = manifest_mod.read_committed_tiles(
                    out_dir, columns=stat_cols
                )
                result.stats_by_band = stats_from_tile_columns(pruned)
                result.stats = result.stats_by_band.get(0)
            return result

        base_paths = manifest_mod.committed_paths(out_dir, extras["gen_hwm"])
        if base_paths:
            from ..io import parquet_file
            from ..state.fsio import OutputFS

            _ofs = OutputFS(out_dir)
            schema_names = parquet_file(_ofs.fs, base_paths[0]).schema_arrow.names
            if "num" not in schema_names or "den" not in schema_names:
                raise ValueError(
                    "feather update needs persisted num/den partials — "
                    "rebuild the base mosaic with MosaicConfig("
                    "merge='feather', feather_partials=True)"
                )
        existing = manifest_mod.read_committed_tiles(
            out_dir,
            columns=[
                "tile_id", "band", "out_top", "out_left", "out_xsize",
                "out_ysize", "n_inputs", "input_ids", "num", "den",
            ],
            max_committed_at=extras["gen_hwm"],
        )
        base_partials = _existing_as_feather_partials(
            existing, affected_ref
        ).materialize()

        def to_salt1(batch: pa.Table) -> pa.Table:
            names = batch.schema.names
            ones = pa.array(
                np.ones(batch.num_rows, dtype=np.int32), pa.int32()
            )
            return batch.set_column(names.index("salt"), "salt", ones)

        k1 = ["tile_id", "band", "salt"] if multiband else ["tile_id", "salt"]
        k2 = ["tile_id", "band"] if multiband else "tile_id"
        new_partials = (
            new_windows.map_batches(to_salt1, batch_format="pyarrow")
            .groupby(k1)
            .map_groups(
                make_feather_partial_fn(grid, shuffle_codec),
                batch_format="pyarrow",
            )
        )
        merged = (
            base_partials.union(new_partials)
            .groupby(k2)
            .map_groups(
                make_feather_final_fn(grid, tile_codec, emit_partials=True),
                batch_format="pyarrow",
            )
        )
    else:
        # --- existing affected tiles as base windows --------------------
        existing = manifest_mod.read_committed_tiles(out_dir)
        base_windows = _existing_as_windows(
            existing, affected_ref, np_dtype, shuffle_codec
        ).materialize()

        merged = assemble_tiles(
            base_windows.union(new_windows),
            grid,
            "last",
            windows_encoded=shuffle_codec is not None,
            tile_codec=tile_codec,
            multiband=multiband,
        )

    result = MosaicResult(grid=grid, tiles_ds=merged)
    result.manifest = manifest_mod.write_tiles(
        merged, out_dir, tiles_per_file=cfg.tiles_per_file
    )
    # seq high-water mark for the NEXT update: with an explicit (possibly
    # non-dense / non-0-based) catalog seq the shifted seqs reach
    # n_seq0 + max(seq), so recording n_seq0 + n_new would let a later
    # update hand out seqs BELOW this one's, inverting last-non-null
    # precedence vs the append-order full rebuild.
    if has_seq_col:
        max_seq = pa.compute.max(tbl["seq"]).as_py()
        n_seq_next = n_seq0 + int(max_seq) + 1
    else:
        n_seq_next = n_seq0 + n_new
    applied = list(extras["applied_updates"])
    if cfg.merge == "feather":
        applied.append(update_id)
    manifest_mod.write_grid_meta(
        out_dir, grid, n_seq_next, sorted(set(bands) | set(new_bands)),
        gen_hwm=manifest_mod.max_manifest_commit(out_dir),
        applied_updates=applied,
    )
    result.tiles_ds = manifest_mod.read_committed_tiles(out_dir)
    if cfg.do_pyramids:
        # overviews regenerate from the WINNING tile generations (pyramids
        # are derived data — never persisted by the sink — so a full-extent
        # rebuild from the resolved tiles is always consistent)
        from ..stages.assemble import build_pyramids

        result.pyramids_ds = build_pyramids(
            result.tiles_ds, grid, cfg.min_overview_size
        )
    if cfg.do_stats:
        # manifest partial-sums would double-count superseded generations:
        # aggregate the WINNING tiles' stat columns (pixels pruned upstream
        # by the resolve filter reading only stat columns would be ideal;
        # the resolve filter needs tile_id/band/committed_at which the
        # pruned read includes)
        from ..stages.stats import stats_from_tile_columns

        stat_cols = [
            "tile_id", "band", "nonnull_count", "px_sum", "px_ssq",
            "px_min", "px_max", "committed_at",
        ]
        pruned = manifest_mod.read_committed_tiles(out_dir, columns=stat_cols)
        result.stats_by_band = stats_from_tile_columns(pruned)
        result.stats = result.stats_by_band.get(0)
    return result


def _tiles_overlapping_rect(grid, top: int, left: int, h: int, w: int):
    """Tile ids of ``grid`` whose blocks intersect the pixel rect
    [top, top+h) x [left, left+w) — a searchsorted over the edge arrays."""
    r0 = int(np.searchsorted(grid.row_edges, top, side="right")) - 1
    r1 = int(np.searchsorted(grid.row_edges, top + h - 1, side="right")) - 1
    c0 = int(np.searchsorted(grid.col_edges, left, side="right")) - 1
    c1 = int(np.searchsorted(grid.col_edges, left + w - 1, side="right")) - 1
    r0, c0 = max(r0, 0), max(c0, 0)
    r1 = min(r1, grid.n_tile_rows - 1)
    c1 = min(c1, grid.n_tile_cols - 1)
    return [
        grid.tile_id(r, c)
        for r in range(r0, r1 + 1)
        for c in range(c0, c1 + 1)
    ]


def _migrate_tiles_as_windows(
    tiles_ds, new_grid, row_off: int, col_off: int, np_dtype, shuffle_codec
):
    """Committed OLD-grid tile rows -> WINDOW_SCHEMA rows on the NEW grid.

    Each old tile's pixel rect shifts by (row_off, col_off) whole pixels
    (grid alignment is validated) and splits across the 1-4 new tiles it
    overlaps; the payload decodes once and slices — old SOURCE IMAGES are
    never re-read or re-decoded. seq = -1 puts every migrated pixel below
    every real input, preserving append-order precedence."""
    from .. import codecs

    grid_ref = ray.put(new_grid)

    def to_windows(batch: pa.Table) -> pa.Table:
        g = ray.get(grid_ref)
        rows = {n: [] for n in WINDOW_SCHEMA.names}
        codec_col = batch["pixels_codec"].to_pylist()
        wire = (
            np_dtype.newbyteorder("<") if np_dtype.itemsize > 1 else np_dtype
        )
        for i in range(batch.num_rows):
            ys = batch["out_ysize"][i].as_py()
            xs = batch["out_xsize"][i].as_py()
            top = batch["out_top"][i].as_py() + row_off
            left = batch["out_left"][i].as_py() + col_off
            band = batch["band"][i].as_py()
            canvas = decode_payload(
                batch["pixels"][i].as_buffer(), codec_col[i], np_dtype
            ).reshape(ys, xs)
            for tid in _tiles_overlapping_rect(g, top, left, ys, xs):
                blk = g.block_for_tile(tid)
                it = max(top, blk.top)
                il = max(left, blk.left)
                ib = min(top + ys, blk.top + blk.ysize)
                ir = min(left + xs, blk.left + blk.xsize)
                if ib <= it or ir <= il:
                    continue
                sub = canvas[it - top : ib - top, il - left : ir - left]
                rows["tile_id"].append(tid)
                rows["band"].append(band)
                rows["salt"].append(0)
                rows["seq"].append(-1)
                rows["image_id"].append("__existing__")
                rows["out_top"].append(blk.top)
                rows["out_left"].append(blk.left)
                rows["out_xsize"].append(blk.xsize)
                rows["out_ysize"].append(blk.ysize)
                rows["dst_top"].append(it - blk.top)
                rows["dst_left"].append(il - blk.left)
                rows["win_h"].append(ib - it)
                rows["win_w"].append(ir - il)
                rows["src_top"].append(it - top)
                rows["src_left"].append(il - left)
                rows["src_h"].append(ys)
                rows["src_w"].append(xs)
                arr = np.ascontiguousarray(sub, dtype=wire)
                if shuffle_codec:
                    rows["pixels"].append(codecs.encode(arr, shuffle_codec))
                else:
                    rows["pixels"].append(arr.tobytes())
        return pa.Table.from_pydict(rows, schema=WINDOW_SCHEMA)

    return tiles_ds.map_batches(to_windows, batch_format="pyarrow")


def extend_mosaic(
    images_path: str,
    cfg: MosaicConfig,
    out_dir: str,
    new_out_dir: str,
) -> MosaicResult:
    """Fold new images whose footprints EXCEED the committed grid: the grid
    extends to the union extent and every committed pixel migrates as a
    base window — old source images are never re-read, never re-decoded.

    This closes update_mosaic's fixed-extent restriction: row-major tile
    ids are grid-relative, so growth re-keys tiles; rather than rewriting
    the committed generation in place, the extension writes a COMPLETE new
    output at ``new_out_dir`` (grid.json + all tiles) whose pixels equal a
    full rebuild over the concatenated catalog (append order) — at the
    cost of one mosaic-sized copy instead of a full source re-decode.
    ``merge="last"`` only, same CRS/resolution/alignment validation (and
    the same out_crs warp-on-read dispatch for off-grid deltas) as
    update_mosaic."""
    import pyarrow.parquet as _pq

    from ..geo import OutputGrid
    from ..stages.assemble import empty_tiles_ds
    from ..stages.plan import metas_from_batch

    if cfg.merge != "last":
        raise ValueError("extend_mosaic supports the 'last' merge kernel only")
    grid, n_seq0, bands = manifest_mod.load_grid_meta(out_dir)
    np_dtype = np.dtype(grid.dtype)
    res = grid.transform[1]

    cols = meta_columns(images_path)
    from ..io import resolve_filesystem as _rfs

    _fs, _p = _rfs(images_path)
    try:
        tbl = _pq.read_table(_p, columns=cols + ["band"], filesystem=_fs)
    except Exception:
        tbl = _pq.read_table(_p, columns=cols, filesystem=_fs)
    pairs = metas_from_batch(tbl, cfg.layout)
    # warp-on-read for the delta, anchored at the stored origin (same
    # dispatch as update_mosaic): the union extent then snaps to whole
    # stored-grid pixels because every warped meta is lattice-aligned
    warp = None
    if cfg.out_crs is not None:
        if cfg.out_crs != grid.crs:
            raise ValueError(
                f"extend out_crs {cfg.out_crs!r} != stored grid CRS "
                f"{grid.crs!r}: an extension keeps the committed CRS — "
                "to change CRS, rebuild with do_mosaic"
            )
        from ..stages.reproject import WarpSpec, warped_meta

        warp = WarpSpec(
            grid.crs,
            grid.transform[1],
            abs(grid.transform[5]),
            cfg.resample,
            anchor=(grid.transform[0], grid.transform[3]),
        )
        pairs = [(s, warped_meta(m, warp)) for s, m in pairs]
    if cfg.validate_projections:
        from ..crs import ProjectionError

        tol = 0.0001
        for _seq, m in pairs:
            if m.crs != grid.crs:
                raise ProjectionError(
                    f"extend input {m.image_id}: CRS {m.crs} != stored grid "
                    f"CRS {grid.crs} (set out_crs to the stored CRS to warp "
                    "the delta on read)"
                )
            if (
                abs(m.transform[1] - grid.transform[1]) > tol
                or abs(m.transform[5] - grid.transform[5]) > tol
            ):
                raise ProjectionError(
                    f"extend input {m.image_id}: resolution mismatch"
                )
            dx = (m.transform[0] - grid.transform[0]) / grid.transform[1]
            dy = (m.transform[3] - grid.transform[3]) / grid.transform[5]
            if abs(dx - round(dx)) > tol or abs(dy - round(dy)) > tol:
                raise ProjectionError(
                    f"extend input {m.image_id}: grid misalignment"
                )

    # union extent, snapped to WHOLE pixels of the stored grid so committed
    # tiles shift by integer offsets (the same grid a full rebuild over the
    # concatenated catalog would produce, since inputs are grid-aligned)
    old_x_min = grid.transform[0]
    old_y_max = grid.transform[3]
    old_x_max = old_x_min + grid.ncols * res
    old_y_min = old_y_max - grid.nrows * res
    metas = [m for _s, m in pairs]
    x_min = min([old_x_min] + [m.x_min for m in metas])
    x_max = max([old_x_max] + [m.x_max for m in metas])
    y_min = min([old_y_min] + [m.y_min for m in metas])
    y_max = max([old_y_max] + [m.y_max for m in metas])
    col_off = int(round((old_x_min - x_min) / res))
    row_off = int(round((y_max - old_y_max) / res))
    x_min = old_x_min - col_off * res
    y_max = old_y_max + row_off * res
    ncols = max(grid.ncols + col_off, int(round((x_max - x_min) / res)))
    nrows = max(grid.nrows + row_off, int(round((y_max - y_min) / res)))
    new_grid = OutputGrid(
        ncols=ncols,
        nrows=nrows,
        transform=(x_min, res, 0.0, y_max, 0.0, -res),
        crs=grid.crs,
        dtype=grid.dtype,
        nullval=grid.nullval,
        nbands=grid.nbands,
        blocksize=grid.blocksize,
        layer_type=grid.layer_type,
    )

    def _codec_for_dtype(codec):
        return None if (codec == "q12" and grid.dtype != "uint16") else codec

    shuffle_codec = _codec_for_dtype(cfg.shuffle_codec)
    tile_codec = _codec_for_dtype(cfg.tile_codec)

    # migrated base windows (seq -1) + new image windows (seqs above HWM)
    base_windows = _migrate_tiles_as_windows(
        manifest_mod.read_committed_tiles(out_dir),
        new_grid, row_off, col_off, np_dtype, shuffle_codec,
    ).materialize()

    has_seq_col = "seq" in tbl.schema.names
    if has_seq_col:
        def shift_seq(batch: pa.Table) -> pa.Table:
            names = batch.schema.names
            shifted = pa.compute.add(batch["seq"], pa.scalar(n_seq0))
            return batch.set_column(names.index("seq"), "seq", shifted)

        images_ds = read_images(images_path).map_batches(
            shift_seq, batch_format="pyarrow"
        )
    else:
        images_ds = read_images(images_path)
    new_windows = decode_windows(
        images_ds, new_grid, cfg.layout, shuffle_codec=shuffle_codec,
        warp=warp,
    )
    if not has_seq_col:
        def shift_window_seq(batch: pa.Table) -> pa.Table:
            names = batch.schema.names
            shifted = pa.compute.add(batch["seq"], pa.scalar(n_seq0))
            return batch.set_column(names.index("seq"), "seq", shifted)

        new_windows = new_windows.map_batches(
            shift_window_seq, batch_format="pyarrow"
        )

    new_bands = (
        sorted(set(tbl["band"].to_pylist()))
        if "band" in tbl.schema.names
        else [0]
    )
    all_bands = sorted(set(bands) | set(new_bands))
    merged = assemble_tiles(
        base_windows.union(new_windows),
        new_grid,
        "last",
        windows_encoded=shuffle_codec is not None,
        tile_codec=tile_codec,
        multiband=len(all_bands) > 1,
    )

    if cfg.include_empty:
        # assigned tiles on the NEW grid: everything the old extent covers
        # plus every tile a new image touches (driver-side — the extension
        # catalog is a delta, same cost model as update_mosaic)
        from ..geo import covering_tile_range, window_overlap

        assigned = set(
            _tiles_overlapping_rect(
                new_grid, row_off, col_off, grid.nrows, grid.ncols
            )
        )
        seen = set()
        for _seq, m in pairs:
            if m.image_id in seen:
                continue
            seen.add(m.image_id)
            tr0, tr1, tc0, tc1 = covering_tile_range(m, new_grid)
            for tr in range(tr0, tr1):
                for tc in range(tc0, tc1):
                    tid = new_grid.tile_id(tr, tc)
                    if window_overlap(
                        new_grid.block_for_tile(tid), new_grid.transform, m
                    ):
                        assigned.add(tid)
        empties = empty_tiles_ds(
            new_grid, assigned, None, all_bands, tile_codec
        ).materialize()
        if empties.count() > 0:
            merged = merged.union(empties)

    manifest_mod.clear_output(new_out_dir)
    result = MosaicResult(grid=new_grid, tiles_ds=merged)
    result.manifest = manifest_mod.write_tiles(
        merged, new_out_dir, tiles_per_file=cfg.tiles_per_file
    )
    if has_seq_col:
        max_seq = pa.compute.max(tbl["seq"]).as_py()
        n_seq_next = n_seq0 + int(max_seq) + 1
    else:
        n_seq_next = n_seq0 + len({m.image_id for m in metas})
    manifest_mod.write_grid_meta(
        new_out_dir, new_grid, n_seq_next, all_bands,
        gen_hwm=manifest_mod.max_manifest_commit(new_out_dir),
        applied_updates=[],
    )
    result.tiles_ds = manifest_mod.read_committed_tiles(new_out_dir)
    if cfg.do_pyramids:
        from ..stages.assemble import build_pyramids

        result.pyramids_ds = build_pyramids(
            result.tiles_ds, new_grid, cfg.min_overview_size
        )
    if cfg.do_stats:
        by_band = manifest_mod.stats_from_manifest(new_out_dir)
        result.stats_by_band = by_band
        result.stats = by_band.get(0)
    return result
