"""Resumable tile sink: partitioned parquet + commit manifest + metrics.

The reference has no checkpointing — it deletes and recreates the output file
(ref /root/reference/moamosaic/mosaic.py:634-636). The north rule requires a
killed job to resume from the last committed tile set, so the sink here:

- writes one parquet file per output batch under ``<out>/tiles/``, named by
  its tile-id range, via tmp-file + atomic rename;
- appends one manifest line per committed file to ``<out>/manifest/`` as a
  JSON record carrying the tile ids, row count, byte size, wall time and
  lineage (which images fed the partition) — the per-partition lineage +
  metrics records of the north rule;
- on resume, ``committed_tile_ids`` reads only the (tiny) manifest — never
  the data files — and the pipeline drops windows whose tile is already
  committed before any decode work happens.

Manifest files are also atomically committed (tmp+rename locally, single
PUT on object stores — see state/fsio.py), so a kill at any point leaves
either a fully-committed (data file + manifest line) partition or nothing.
``out_dir`` may be a local path or an ``s3://`` URI: the OutputFS shim
routes every read/write, and the commit protocol needs no rename on S3
because a PUT is atomic and the manifest's existence is the commit marker.
"""

from __future__ import annotations

import time
import uuid

import pyarrow as pa

from .fsio import OutputFS


class TileWriter:
    """map_batches callable: writes each batch as one committed partition and
    returns the manifest row (small) instead of the data."""

    def __init__(self, out_dir: str, run_id: str, ofs: OutputFS | None = None):
        # ofs is built DRIVER-side by write_tiles and shipped in the task
        # closure: the resolver reads credential/endpoint env vars that Ray
        # workers may not carry
        self.ofs = ofs if ofs is not None else OutputFS(out_dir)
        self.tiles_dir = self.ofs.join(self.ofs.root, "tiles")
        self.manifest_dir = self.ofs.join(self.ofs.root, "manifest")
        self.ofs.makedirs(self.tiles_dir)
        self.ofs.makedirs(self.manifest_dir)
        self.run_id = run_id

    _EMPTY = {
        "path": pa.string(), "n_tiles": pa.int64(), "bytes": pa.int64(),
        "wall_s": pa.float64(), "px_sum": pa.float64(), "px_ssq": pa.float64(),
        "px_min": pa.float64(), "px_max": pa.float64(),
        "nonnull_count": pa.int64(),
    }

    def __call__(self, batch: pa.Table) -> pa.Table:
        t0 = time.monotonic()
        if batch.num_rows == 0:
            return pa.table(
                {n: pa.array([], t) for n, t in self._EMPTY.items()}
            )
        # Version stamp per row: an incremental update writes NEW partitions
        # for affected (tile, band) keys without touching old files; readers
        # resolve the winner per key by the newest committed_at (see
        # read_committed_tiles). Monotonic within a run_id by wall clock.
        commit_ts = time.time()
        batch = batch.append_column(
            "committed_at", pa.array([commit_ts] * batch.num_rows, pa.float64())
        )
        tids = batch["tile_id"].to_pylist()
        bands_col = batch["band"].to_pylist()
        lo, hi = min(tids), max(tids)
        # Deterministic, content-keyed partition name: a Ray task RETRY of
        # the same batch rewrites the same files (tmp+rename = idempotent
        # replace) instead of minting a duplicate partition — exactly-once
        # output under task retries without any coordination.
        import hashlib as _hashlib

        key = _hashlib.sha256(
            (",".join(f"{t}:{b}" for t, b in sorted(zip(tids, bands_col))))
            .encode()
        ).hexdigest()[:12]
        part = f"part-{lo:010d}-{hi:010d}-{key}"
        data_path = self.ofs.join(self.tiles_dir, part + ".parquet")
        n_bytes = self.ofs.put_table(data_path, batch)
        id_lists = batch["input_ids"].to_pylist()
        lineage = sorted({iid for ids in id_lists for iid in ids})
        # tile rows carry BOUNDED lineage (assemble.LINEAGE_CAP: first/last
        # ids only on hot tiles) — record when this partition's lineage is
        # therefore a sample, not the full input set
        n_inputs_col = batch["n_inputs"].to_pylist()
        lineage_truncated = any(
            n > len(ids) for n, ids in zip(n_inputs_col, id_lists)
        )
        # Partial band stats ride the manifest row (StatsAccumulator partials,
        # ref mosaic.py:758-771, one accumulator per band mosaic.py:204-208)
        # so final stats are a driver-side sum over the tiny manifest table —
        # no extra Ray execution, no pixel re-read.
        import pyarrow.compute as pc

        px_min = pc.min(batch["px_min"]).as_py()
        px_max = pc.max(batch["px_max"]).as_py()
        px_sum = pc.sum(batch["px_sum"]).as_py() or 0.0
        px_ssq = pc.sum(batch["px_ssq"]).as_py() or 0.0
        nonnull = pc.sum(batch["nonnull_count"]).as_py() or 0
        band_stats = {}
        for band in set(batch["band"].to_pylist()):
            bb = batch.filter(pc.equal(batch["band"], band))
            band_stats[str(band)] = {
                "px_sum": pc.sum(bb["px_sum"]).as_py() or 0.0,
                "px_ssq": pc.sum(bb["px_ssq"]).as_py() or 0.0,
                "px_min": pc.min(bb["px_min"]).as_py(),
                "px_max": pc.max(bb["px_max"]).as_py(),
                "nonnull_count": pc.sum(bb["nonnull_count"]).as_py() or 0,
            }
        wall = time.monotonic() - t0
        record = {
            "run_id": self.run_id,
            "path": data_path,
            "tile_ids": tids,
            "keys": [[t, b] for t, b in zip(tids, bands_col)],
            "n_tiles": len(tids),
            "bytes": n_bytes,
            "wall_s": wall,
            "lineage_images": lineage,
            "lineage_truncated": lineage_truncated,
            "committed_at": commit_ts,
            "px_sum": px_sum,
            "px_ssq": px_ssq,
            "px_min": px_min,
            "px_max": px_max,
            "nonnull_count": nonnull,
            "band_stats": band_stats,
        }
        man_path = self.ofs.join(self.manifest_dir, part + ".json")
        self.ofs.put_json(man_path, record)
        return pa.table(
            {
                "path": pa.array([data_path], pa.string()),
                "n_tiles": pa.array([len(tids)], pa.int64()),
                "bytes": pa.array([record["bytes"]], pa.int64()),
                "wall_s": pa.array([wall], pa.float64()),
                "px_sum": pa.array([px_sum], pa.float64()),
                "px_ssq": pa.array([px_ssq], pa.float64()),
                "px_min": pa.array([px_min], pa.float64()),
                "px_max": pa.array([px_max], pa.float64()),
                "nonnull_count": pa.array([nonnull], pa.int64()),
            }
        )


def write_tiles(
    tiles_ds,
    out_dir: str,
    *,
    tiles_per_file: int = 16,
):
    """Consume the tiles dataset through the committed sink. Returns the
    (small) manifest summary rows as a pyarrow Table.

    Stateless tasks (TileWriter instantiation is just two mkdirs) — writes
    run wherever the assembled tile block already lives."""
    run_id = uuid.uuid4().hex
    ofs = OutputFS(out_dir)  # resolve credentials/endpoint on the driver

    def write_batch(batch: pa.Table) -> pa.Table:
        return TileWriter(out_dir, run_id, ofs)(batch)

    manifest_ds = tiles_ds.map_batches(
        write_batch,
        batch_format="pyarrow",
        batch_size=tiles_per_file,
    )
    # Manifest rows are tiny — materializing them IS the sink consumption.
    # Driver memory bound: ONE ~200-byte row per committed partition
    # (tiles/tiles_per_file partitions; a 10^9-tile job at 16 tiles/file
    # is ~60M rows -> raise tiles_per_file before that, or consume the
    # manifest dataset streaming).
    return pa.Table.from_pylist(manifest_ds.take_all())


def clear_output(out_dir: str) -> None:
    """Fresh-run semantics: delete any prior tiles + manifest under out_dir
    (the reference deletes and recreates an existing output file,
    ref /root/reference/moamosaic/mosaic.py:634-636). Without this, a
    non-resume rerun into the same directory would leave two generations of
    data files and double-count every read-back."""
    ofs = OutputFS(out_dir)
    for sub in ("tiles", "manifest"):
        ofs.rmtree(ofs.join(ofs.root, sub))


def sweep_tmp(out_dir: str) -> int:
    """Remove *.tmp orphans left by a killed run (write happens as
    tmp+atomic-rename, so a .tmp file is never a commit). Called on resume;
    returns the number of files removed."""
    n = 0
    ofs = OutputFS(out_dir)
    for sub in ("tiles", "manifest"):
        d = ofs.join(ofs.root, sub)
        for name in ofs.list_names(d):
            if name.endswith(".tmp"):
                ofs.remove(ofs.join(d, name))
                n += 1
    return n


def _iter_manifest_records(ofs: OutputFS):
    """(record dicts) from every manifest JSON under the output root."""
    manifest_dir = ofs.join(ofs.root, "manifest")
    for name in sorted(ofs.list_names(manifest_dir)):
        if not name.endswith(".json"):
            continue
        yield ofs.read_json(ofs.join(manifest_dir, name))


def committed_paths(
    out_dir: str, max_committed_at: float | None = None
) -> list[str]:
    """Data-file paths listed in the manifest — the only files a reader may
    trust. Orphaned .parquet files from a killed run (data written, manifest
    line not yet committed) are invisible here by construction.
    ``max_committed_at`` pins the read to a known-complete generation
    barrier (grid.json's gen_hwm): partitions a killed later run managed to
    commit are excluded, so a retry recomputes from the true base."""
    paths: list[str] = []
    for rec in _iter_manifest_records(OutputFS(out_dir)):
        if (
            max_committed_at is not None
            and rec.get("committed_at", 0.0) > max_committed_at
        ):
            continue
        paths.append(rec["path"])
    return paths


def committed_keys(out_dir: str) -> set[tuple[int, int]]:
    """Read the manifest (never the data files) -> committed
    (tile_id, band) pairs — the resume-filter key."""
    out: set[tuple[int, int]] = set()
    for rec in _iter_manifest_records(OutputFS(out_dir)):
        if "keys" in rec:
            out.update((int(t), int(b)) for t, b in rec["keys"])
        else:
            out.update((int(t), 0) for t in rec["tile_ids"])
    return out


def _finalize(acc: dict) -> dict:
    import math

    count = acc["nonnull_count"]
    if count == 0:
        return {"min": None, "max": None, "mean": None, "stddev": None,
                "count": 0}
    mean = acc["px_sum"] / count
    var = acc["px_ssq"] / count - mean ** 2
    return {
        "min": acc["px_min"],
        "max": acc["px_max"],
        "mean": mean,
        "stddev": math.sqrt(var) if var >= 0 else 0.0,
        "count": count,
    }


def stats_from_manifest(out_dir: str) -> dict[int, dict]:
    """Final per-band stats from the partial-stat fields of the manifest
    records — pure driver-side arithmetic over a tiny table. Identical
    float64 math to StatsAccumulator.finalStats (ref mosaic.py:779-794, one
    accumulator per band mosaic.py:204-208). Covers resumed runs too:
    committed records from prior runs carry their partials."""
    accs: dict[int, dict] = {}
    for rec in _iter_manifest_records(OutputFS(out_dir)):
        per_band = rec.get("band_stats") or {"0": rec}
        for bkey, p in per_band.items():
            acc = accs.setdefault(
                int(bkey),
                {"px_sum": 0.0, "px_ssq": 0.0, "nonnull_count": 0,
                 "px_min": None, "px_max": None},
            )
            acc["px_sum"] += p.get("px_sum") or 0.0
            acc["px_ssq"] += p.get("px_ssq") or 0.0
            acc["nonnull_count"] += p.get("nonnull_count") or 0
            v = p.get("px_min")
            if v is not None:
                acc["px_min"] = (
                    v if acc["px_min"] is None else min(acc["px_min"], v)
                )
            v = p.get("px_max")
            if v is not None:
                acc["px_max"] = (
                    v if acc["px_max"] is None else max(acc["px_max"], v)
                )
    if not accs:
        return {0: _finalize(
            {"px_sum": 0.0, "px_ssq": 0.0, "nonnull_count": 0,
             "px_min": None, "px_max": None}
        )}
    return {b: _finalize(a) for b, a in sorted(accs.items())}


def winning_commits(
    out_dir: str, max_committed_at: float | None = None
) -> dict[tuple[int, int], tuple[float, str]]:
    """(tile_id, band) -> (newest committed_at, data path) across all
    manifest records.

    After an incremental update (pipelines/update.py) a key can appear in
    two generations of partitions; the newest record wins, with the data
    path as a deterministic tie-break when two commits share an identical
    float timestamp. Pure driver-side read of the tiny manifest.
    ``max_committed_at``: see committed_paths."""
    winners: dict[tuple[int, int], tuple[float, str]] = {}
    for rec in _iter_manifest_records(OutputFS(out_dir)):
        if (
            max_committed_at is not None
            and rec.get("committed_at", 0.0) > max_committed_at
        ):
            continue
        cand = (rec.get("committed_at", 0.0), rec.get("path", ""))
        keys = rec.get("keys") or [[t, 0] for t in rec["tile_ids"]]
        for t, b in keys:
            k = (int(t), int(b))
            if k not in winners or cand > winners[k]:
                winners[k] = cand
    return winners


def read_committed_tiles(
    out_dir: str,
    columns: list[str] | None = None,
    max_committed_at: float | None = None,
):
    """Manifest-committed tile files as one Dataset (for verification /
    downstream reads). Reads ONLY manifest-listed paths — never a raw
    directory listing — so uncommitted orphans from a killed run are
    excluded. When incremental updates left superseded generations of a
    (tile, band) key, only the newest generation's rows survive (winner map
    broadcast once via ray.put; vectorized filter per batch); the
    version-stamp column is dropped so downstream schemas are unchanged.
    ``max_committed_at`` pins the read to a generation barrier (see
    committed_paths) — the feather-update base read uses grid.json's
    gen_hwm so a killed update's partial new generation is invisible."""
    import numpy as np
    import ray

    ofs = OutputFS(out_dir)
    winners = winning_commits(out_dir, max_committed_at)
    total_keys = 0
    for rec in _iter_manifest_records(ofs):
        if (
            max_committed_at is not None
            and rec.get("committed_at", 0.0) > max_committed_at
        ):
            continue
        total_keys += len(rec.get("keys") or rec["tile_ids"])
    has_dupes = total_keys > len(winners)

    if not has_dupes:
        # fresh output: no superseded generations, no filter stage needed
        ds = ray.data.read_parquet(
            committed_paths(out_dir, max_committed_at), columns=columns,
            filesystem=ofs.fs,
        )

        def drop_stamp(batch: pa.Table) -> pa.Table:
            if "committed_at" in batch.schema.names:
                return batch.drop_columns(["committed_at"])
            return batch

        return ds.map_batches(drop_stamp, batch_format="pyarrow")

    # superseded generations exist: the resolve filter NEEDS the key + stamp
    # columns regardless of the caller's pruned column list — force-include
    # them in the read (and include per-row file provenance for the
    # timestamp tie-break), then drop whatever the caller didn't ask for.
    read_cols = columns
    if columns is not None:
        read_cols = list(columns)
        for c in ("tile_id", "band", "committed_at"):
            if c not in read_cols:
                read_cols.append(c)
    drop_after = ["committed_at", "path"] + [
        c
        for c in ("tile_id", "band")
        if columns is not None and c not in columns
    ]
    ds = ray.data.read_parquet(
        committed_paths(out_dir, max_committed_at),
        columns=read_cols,
        include_paths=True,
        filesystem=ofs.fs,
    )
    # normalize both sides of the tie-break — Ray's include_paths reports
    # resolved filesystem paths (absolute locally, scheme-less on object
    # stores), the manifest stores whatever data_path the writer was given
    norm = ofs.normalize
    ref = ray.put(
        {k: (ts, norm(p)) for k, (ts, p) in winners.items()}
    )

    def resolve(batch: pa.Table) -> pa.Table:
        win = ray.get(ref)
        ts = batch["committed_at"].to_numpy()
        paths = [norm(p) for p in batch["path"].to_pylist()]
        tids = batch["tile_id"].to_numpy()
        bands = batch["band"].to_numpy()
        keep = np.array(
            [
                (ts[i], paths[i])
                >= win.get((int(tids[i]), int(bands[i])), (-1.0, ""))
                for i in range(len(ts))
            ],
            dtype=bool,
        )
        out = batch.filter(pa.array(keep))
        return out.drop_columns([c for c in drop_after if c in out.schema.names])

    return ds.map_batches(resolve, batch_format="pyarrow")


GRID_META = "grid.json"


def write_grid_meta(
    out_dir: str,
    grid,
    n_seq: int,
    bands: list[int],
    gen_hwm: float | None = None,
    applied_updates: list[str] | None = None,
) -> None:
    """Persist the output grid + input-sequence high-water mark so a later
    incremental update can plan against the exact same grid.

    ``gen_hwm`` (generation high-water mark): max committed_at of the
    known-COMPLETE output state, written only after every partition of a
    run committed. A feather update reads its base pinned to this barrier,
    so partitions a killed update managed to commit are ignored on retry
    (the retry's rewrite then supersedes them by timestamp).
    ``applied_updates``: content ids of update catalogs already folded in —
    the rerun-idempotence guard for the weighted-sum (feather) path, where
    re-adding a delta would double its weight (last-wins needs no guard)."""
    ofs = OutputFS(out_dir)
    ofs.makedirs(ofs.root)
    rec = {
        "ncols": grid.ncols,
        "nrows": grid.nrows,
        "transform": list(grid.transform),
        "crs": grid.crs,
        "dtype": grid.dtype,
        "nullval": grid.nullval if grid.nullval == grid.nullval else "nan",
        "nbands": grid.nbands,
        "blocksize": grid.blocksize,
        "layer_type": grid.layer_type,
        "n_seq": n_seq,
        "bands": bands,
    }
    if gen_hwm is not None:
        rec["gen_hwm"] = gen_hwm
    if applied_updates is not None:
        rec["applied_updates"] = applied_updates
    ofs.put_json(ofs.join(ofs.root, GRID_META), rec)


def load_grid_extras(out_dir: str) -> dict:
    """gen_hwm / applied_updates from grid.json (empty defaults when the
    output predates these fields)."""
    ofs = OutputFS(out_dir)
    try:
        rec = ofs.read_json(ofs.join(ofs.root, GRID_META))
    except FileNotFoundError:
        return {"gen_hwm": None, "applied_updates": []}
    return {
        "gen_hwm": rec.get("gen_hwm"),
        "applied_updates": list(rec.get("applied_updates", [])),
    }


def max_manifest_commit(out_dir: str) -> float | None:
    """Newest committed_at across manifest records (None if none)."""
    best = None
    for rec in _iter_manifest_records(OutputFS(out_dir)):
        ts = rec.get("committed_at", 0.0)
        if best is None or ts > best:
            best = ts
    return best


def load_grid_meta(out_dir: str):
    """(OutputGrid, n_seq, bands) from a committed output directory."""
    from ..geo import OutputGrid

    ofs = OutputFS(out_dir)
    rec = ofs.read_json(ofs.join(ofs.root, GRID_META))
    nv = float("nan") if rec["nullval"] == "nan" else float(rec["nullval"])
    grid = OutputGrid(
        ncols=rec["ncols"],
        nrows=rec["nrows"],
        transform=tuple(rec["transform"]),
        crs=rec["crs"],
        dtype=rec["dtype"],
        nullval=nv,
        nbands=rec["nbands"],
        blocksize=rec["blocksize"],
        layer_type=rec.get("layer_type", "athematic"),
    )
    return grid, int(rec["n_seq"]), list(rec["bands"])
