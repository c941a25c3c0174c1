"""Generic resumable partitioned parquet sink for ops outputs.

The mosaic's committed-tile sink (state/manifest.py) generalized to ANY
dataset: rows hash-partition on a key column into a fixed bucket count,
each bucket commits atomically (tmp+rename locally, single PUT on
object stores — state/fsio.py; data THEN manifest),
and every manifest record carries lineage + metrics (row count, bytes,
wall time, key-hash) — the north-rule contract ("every partition emits
lineage + metrics records so a killed job resumes from the last
checkpointed set") for dedup/text/ANN outputs, not just tiles.

Resume semantics: a rerun skips re-WRITING buckets whose manifest is
already committed (their upstream compute still streams — the sink cannot
know an arbitrary upstream is pure — but the output directory converges
and never holds torn partitions). A killed run leaves only .tmp files
(local) or manifest-less orphans (object store), both invisible to
readers. ``out_dir`` may be a local path or ``s3://bucket/prefix``.
"""

from __future__ import annotations

import os
import time
import zlib

import pyarrow as pa

from ..state.fsio import OutputFS

_MANIFEST_DIR = "manifest"


def _bucket_of(batch: pa.Table, key: str, n: int) -> pa.Table:
    import numpy as np
    import pyarrow.compute as pc

    col = batch[key]
    if pa.types.is_integer(col.type):
        vals = col.to_numpy(zero_copy_only=False).astype(np.uint64)
        # splitmix-style avalanche: consecutive ids spread across buckets
        vals = (vals ^ (vals >> 30)) * np.uint64(0xBF58476D1CE4E5B9)
        vals = vals ^ (vals >> 27)
        bucket = pa.array((vals % np.uint64(n)).astype(np.int32))
    else:
        h = pc.hash64(col) if hasattr(pc, "hash64") else None
        if h is not None:
            bucket = pc.cast(
                pc.bit_wise_and(h, n - 1) if (n & (n - 1)) == 0
                else pc.mod(pc.cast(h, pa.uint64()), n), pa.int32()
            )
        else:  # stable fallback: crc32 of the string bytes
            import numpy as np

            bucket = pa.array(
                [zlib.crc32(str(v).encode()) % n for v in col.to_pylist()],
                pa.int32(),
            )
    return batch.append_column("__bucket", bucket)


def committed_buckets(out_dir: str) -> set[int]:
    ofs = OutputFS(out_dir)
    man_dir = ofs.join(ofs.root, _MANIFEST_DIR)
    out = set()
    for f in ofs.list_names(man_dir):
        if f.endswith(".json"):
            out.add(int(f.split("-")[1].split(".")[0]))
    return out


def write_partitioned(
    ds,
    out_dir: str,
    key: str,
    n_partitions: int = 64,
    resume: bool = True,
) -> dict:
    """Write ``ds`` as ``n_partitions`` hash-partitioned parquet files with
    per-partition manifests; returns {written, skipped, rows} totals.

    One directory holds ``part-<bucket>.parquet`` + ``manifest/
    bucket-<bucket>.json``; a bucket is committed iff its manifest exists
    (data renames before manifest, so a manifest never points at a torn
    file)."""
    ofs = OutputFS(out_dir)  # driver-side: captures endpoint/credentials
    ofs.makedirs(ofs.join(ofs.root, _MANIFEST_DIR))
    # sweep torn tmp files from a killed attempt (local-only artifact)
    for root in (ofs.root, ofs.join(ofs.root, _MANIFEST_DIR)):
        for f in ofs.list_names(root):
            if f.endswith(".tmp"):
                ofs.remove(ofs.join(root, f))
    done = committed_buckets(out_dir) if resume else set()

    def commit_bucket(group: pa.Table) -> pa.Table:
        b = int(group["__bucket"][0].as_py())
        tbl = group.drop_columns(["__bucket"])
        if b in done:
            return pa.table({
                "bucket": pa.array([b], pa.int32()),
                "rows": pa.array([tbl.num_rows], pa.int64()),
                "written": pa.array([False], pa.bool_()),
            })
        t0 = time.time()
        data_path = ofs.join(ofs.root, f"part-{b:05d}.parquet")
        n_bytes = ofs.put_table(data_path, tbl)
        man_path = ofs.join(
            ofs.root, _MANIFEST_DIR, f"bucket-{b:05d}.json"
        )
        rec = {
            "bucket": b,
            "rows": tbl.num_rows,
            "bytes": n_bytes,
            "wall_s": round(time.time() - t0, 4),
            "key": key,
            "key_hash": zlib.crc32(
                b"".join(str(v).encode() for v in tbl[key].to_pylist()[:64])
            ),
            "path": data_path,
            "committed_at": time.time(),
        }
        ofs.put_json(man_path, rec)
        return pa.table({
            "bucket": pa.array([b], pa.int32()),
            "rows": pa.array([tbl.num_rows], pa.int64()),
            "written": pa.array([True], pa.bool_()),
        })

    stats = (
        ds.map_batches(
            lambda b: _bucket_of(b, key, n_partitions),
            batch_format="pyarrow",
        )
        .groupby("__bucket")
        .map_groups(commit_bucket, batch_format="pyarrow")
        .take_all()  # one 3-field row per bucket (n_partitions total)
    )
    written = sum(1 for r in stats if r["written"])
    return {
        "written": written,
        "skipped": len(stats) - written,
        "rows": int(sum(r["rows"] for r in stats)),
        "n_partitions": n_partitions,
    }


def read_partitioned(out_dir: str):
    """Read back committed partitions only (manifest-gated)."""
    import ray

    ofs = OutputFS(out_dir)
    done = committed_buckets(out_dir)
    paths = [
        ofs.join(ofs.root, f"part-{b:05d}.parquet") for b in sorted(done)
    ]
    if not paths:
        raise FileNotFoundError(f"no committed partitions under {out_dir}")
    return ray.data.read_parquet(paths, filesystem=ofs.fs)


def write_geojsonl(
    ds,
    out_dir: str,
    geometry_fn,
    key: str,
    n_partitions: int = 16,
    resume: bool = True,
) -> dict:
    """Vector-output sibling of ``write_partitioned``: newline-delimited
    RFC-7946 GeoJSON Features (``part-<bucket>.geojsonl`` — the
    streaming-friendly interchange format every GIS reads), same
    hash-partition + atomic data-then-manifest commit + resume contract.

    ``geometry_fn(batch) -> list[dict]`` builds one GeoJSON geometry per
    row (see ops/vector.py helpers); every other column becomes a feature
    property. Feature lines are serialized with sorted keys, so a bucket's
    bytes are deterministic given its rows.
    """
    import json

    ofs = OutputFS(out_dir)
    ofs.makedirs(ofs.join(ofs.root, _MANIFEST_DIR))
    for root in (ofs.root, ofs.join(ofs.root, _MANIFEST_DIR)):
        for f in ofs.list_names(root):
            if f.endswith(".tmp"):
                ofs.remove(ofs.join(root, f))
    done = committed_buckets(out_dir) if resume else set()

    def commit_bucket(group: pa.Table) -> pa.Table:
        b = int(group["__bucket"][0].as_py())
        tbl = group.drop_columns(["__bucket"])
        if b in done:
            return pa.table({
                "bucket": pa.array([b], pa.int32()),
                "rows": pa.array([tbl.num_rows], pa.int64()),
                "written": pa.array([False], pa.bool_()),
            })
        t0 = time.time()
        geoms = geometry_fn(tbl)
        props_cols = {
            n: tbl[n].to_pylist() for n in tbl.schema.names
        }
        lines = []
        for i in range(tbl.num_rows):
            feat = {
                "type": "Feature",
                "geometry": geoms[i],
                "properties": {n: v[i] for n, v in props_cols.items()},
            }
            lines.append(json.dumps(feat, sort_keys=True,
                                    separators=(",", ":")))
        payload = ("\n".join(lines) + "\n").encode() if lines else b""
        data_path = ofs.join(ofs.root, f"part-{b:05d}.geojsonl")
        ofs.put_bytes(data_path, payload)
        man_path = ofs.join(ofs.root, _MANIFEST_DIR, f"bucket-{b:05d}.json")
        ofs.put_json(man_path, {
            "bucket": b,
            "rows": tbl.num_rows,
            "bytes": len(payload),
            "wall_s": round(time.time() - t0, 4),
            "key": key,
            "crc32": zlib.crc32(payload),
            "path": data_path,
            "format": "geojsonl",
            "committed_at": time.time(),
        })
        return pa.table({
            "bucket": pa.array([b], pa.int32()),
            "rows": pa.array([tbl.num_rows], pa.int64()),
            "written": pa.array([True], pa.bool_()),
        })

    stats = (
        ds.map_batches(
            lambda b: _bucket_of(b, key, n_partitions),
            batch_format="pyarrow",
        )
        .groupby("__bucket")
        .map_groups(commit_bucket, batch_format="pyarrow")
        .take_all()  # one 3-field row per bucket
    )
    written = sum(1 for r in stats if r["written"])
    return {
        "written": written,
        "skipped": len(stats) - written,
        "rows": int(sum(r["rows"] for r in stats)),
        "n_partitions": n_partitions,
    }
