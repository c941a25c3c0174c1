"""WebDataset-style tar-shard sink: the training-sample delivery format.

A curated corpus ships to trainers as sequential ``.tar`` shards whose
entries are ``{key}.{ext}`` files — one sample = adjacent entries sharing
a key stem (the public WebDataset convention). This sink hash-partitions
rows into a fixed shard count and writes each shard as ONE tar through
the committed-sink protocol shared with sinks/partitioned.py: data file
first, manifest record second (tmp+rename locally, single PUT on object
stores via state/fsio.OutputFS), so a killed run leaves no torn shard
visible and a rerun rewrites exactly the severed shards.

Column -> entry mapping: string columns write ``.txt`` (utf-8), binary
columns ``.bin``, everything else ``.json``. Entries within a shard are
sorted by key so the tar bytes are deterministic given the row set
(mtime is pinned to 0 for the same reason).
"""

from __future__ import annotations

import io
import json
import tarfile
import time
import zlib

import pyarrow as pa
import pyarrow.compute as pc

from ..state.fsio import OutputFS

_MANIFEST_DIR = "manifest"


def _entry_ext(typ: pa.DataType) -> str:
    if pa.types.is_string(typ) or pa.types.is_large_string(typ):
        return "txt"
    if pa.types.is_binary(typ) or pa.types.is_large_binary(typ):
        return "bin"
    return "json"


def _entry_bytes(val, ext: str) -> bytes:
    if ext == "txt":
        return val.encode("utf-8")
    if ext == "bin":
        return bytes(val)
    return json.dumps(val, sort_keys=True).encode("utf-8")


def _shard_tar_bytes(tbl: pa.Table, key_col: str) -> bytes:
    """Deterministic tar image for one shard: entries sorted by key,
    mtime 0, ustar format."""
    idx = pc.sort_indices(tbl[key_col])
    tbl = tbl.take(idx)
    exts = {c: _entry_ext(tbl.schema.field(c).type)
            for c in tbl.column_names if c != key_col}
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w", format=tarfile.USTAR_FORMAT) \
            as tf:
        keys = tbl[key_col].to_pylist()
        cols = {c: tbl[c].to_pylist() for c in exts}
        for i, k in enumerate(keys):
            stem = f"{int(k):012d}" if isinstance(k, int) else str(k)
            for c, ext in sorted(exts.items()):
                data = _entry_bytes(cols[c][i], ext)
                info = tarfile.TarInfo(name=f"{stem}.{c}.{ext}")
                info.size = len(data)
                info.mtime = 0
                tf.addfile(info, io.BytesIO(data))
    return buf.getvalue()


def committed_shards(out_dir: str) -> set[int]:
    ofs = OutputFS(out_dir)
    man = ofs.join(ofs.root, _MANIFEST_DIR)
    out = set()
    for name in ofs.list_names(man):
        if name.startswith("shard-") and name.endswith(".json"):
            out.add(int(name[len("shard-"):-len(".json")]))
    return out


def write_wds_shards(
    ds,
    out_dir: str,
    key: str = "doc_id",
    n_shards: int = 16,
    resume: bool = True,
) -> dict:
    """Write ``ds`` as ``n_shards`` tar shards + per-shard manifests;
    returns {written, skipped, rows, samples_per_shard_max}.

    Shard assignment is the hash partitioner of sinks/partitioned.py
    (splitmix avalanche on integer keys), so the same key always lands in
    the same shard across reruns and re-shardings — resumable by
    construction."""
    from .partitioned import _bucket_of

    ofs = OutputFS(out_dir)
    ofs.makedirs(ofs.join(ofs.root, _MANIFEST_DIR))
    for root in (ofs.root, ofs.join(ofs.root, _MANIFEST_DIR)):
        for f in ofs.list_names(root):
            if f.endswith(".tmp"):
                ofs.remove(ofs.join(root, f))
    done = committed_shards(out_dir) if resume else set()

    def commit_shard(group: pa.Table) -> pa.Table:
        b = int(group["__bucket"][0].as_py())
        tbl = group.drop_columns(["__bucket"])
        if b in done:
            return pa.table({
                "shard": pa.array([b], pa.int32()),
                "rows": pa.array([tbl.num_rows], pa.int64()),
                "written": pa.array([False], pa.bool_()),
            })
        t0 = time.time()
        blob = _shard_tar_bytes(tbl, key)
        data_path = ofs.join(ofs.root, f"shard-{b:05d}.tar")
        ofs.put_bytes(data_path, blob)
        rec = {
            "shard": b,
            "rows": tbl.num_rows,
            "bytes": len(blob),
            "wall_s": round(time.time() - t0, 4),
            "key": key,
            "crc32": zlib.crc32(blob),
            "path": data_path,
            "committed_at": time.time(),
        }
        ofs.put_json(
            ofs.join(ofs.root, _MANIFEST_DIR, f"shard-{b:05d}.json"), rec
        )
        return pa.table({
            "shard": pa.array([b], pa.int32()),
            "rows": pa.array([tbl.num_rows], pa.int64()),
            "written": pa.array([True], pa.bool_()),
        })

    stats = (
        ds.map_batches(
            lambda batch: _bucket_of(batch, key, n_shards),
            batch_format="pyarrow",
        )
        .groupby("__bucket")
        .map_groups(commit_shard, batch_format="pyarrow")
        .take_all()  # one 3-field row per shard
    )
    written = sum(1 for r in stats if r["written"])
    return {
        "written": written,
        "skipped": len(stats) - written,
        "rows": int(sum(r["rows"] for r in stats)),
        "samples_per_shard_max": int(max((r["rows"] for r in stats),
                                         default=0)),
        "n_shards": n_shards,
    }


def read_wds_shards(out_dir: str, key: str = "doc_id"):
    """Round-trip reader: committed shards -> Ray Dataset of samples.

    Reads only MANIFESTED shards (torn/uncommitted tars are invisible,
    same contract as read_partitioned). One read task per shard."""
    import ray

    ofs = OutputFS(out_dir)
    shards = sorted(committed_shards(out_dir))
    paths = [ofs.join(ofs.root, f"shard-{b:05d}.tar") for b in shards]
    if not paths:
        return ray.data.from_items([])

    def load(row: dict) -> list:
        p = row["path"]
        if ofs.is_local:
            raw = open(p, "rb").read()
        else:
            with ofs.fs.open_input_stream(p) as f:
                raw = f.read()
        out: dict[str, dict] = {}
        with tarfile.open(fileobj=io.BytesIO(raw)) as tf:
            for m in tf.getmembers():
                stem, col, ext = m.name.rsplit(".", 2)
                data = tf.extractfile(m).read()
                if ext == "txt":
                    val = data.decode("utf-8")
                elif ext == "bin":
                    val = data
                else:
                    val = json.loads(data)
                out.setdefault(stem, {})[col] = val
        rows = []
        for stem in sorted(out):
            r = dict(out[stem])
            r[key] = int(stem) if stem.isdigit() else stem
            rows.append(r)
        return rows

    return ray.data.from_items([{"path": p} for p in paths]).flat_map(load)
