"""Generic resumable partitioned sink (moaray/sinks/partitioned.py):
atomic per-bucket commits, kill-resume convergence, manifest metrics."""

import glob
import json
import os

import numpy as np
import pytest
import ray

from moaray.sinks.partitioned import (
    committed_buckets,
    read_partitioned,
    write_partitioned,
)


def _ds(n=4000):
    return ray.data.range(n).map_batches(
        lambda b: {"doc_id": b["id"], "score": b["id"] * 0.5},
        batch_format="numpy",
    )


def test_write_read_roundtrip(ray_session, tmp_path):
    out = str(tmp_path / "p")
    r = write_partitioned(_ds(), out, key="doc_id", n_partitions=16)
    assert r == {"written": 16, "skipped": 0, "rows": 4000,
                 "n_partitions": 16}
    back = read_partitioned(out).to_pandas()
    assert sorted(back["doc_id"].tolist()) == list(range(4000))
    # manifests carry metrics + lineage fields
    rec = json.loads(
        open(sorted(glob.glob(f"{out}/manifest/*.json"))[0]).read()
    )
    assert rec["rows"] > 0 and rec["bytes"] > 0 and rec["key"] == "doc_id"
    assert "wall_s" in rec and "committed_at" in rec


def test_kill_resume_converges(ray_session, tmp_path):
    out = str(tmp_path / "p")
    write_partitioned(_ds(), out, key="doc_id", n_partitions=16)
    mans = sorted(glob.glob(f"{out}/manifest/*.json"))
    for m in mans[::4][:4]:  # simulate a kill: lose 4 partitions
        os.remove(json.loads(open(m).read())["path"])
        os.remove(m)
    assert len(committed_buckets(out)) == 12
    r = write_partitioned(_ds(), out, key="doc_id", n_partitions=16)
    assert r["written"] == 4 and r["skipped"] == 12
    back = read_partitioned(out).to_pandas()
    assert sorted(back["doc_id"].tolist()) == list(range(4000))
    # idempotent rerun: nothing rewritten
    r2 = write_partitioned(_ds(), out, key="doc_id", n_partitions=16)
    assert r2["written"] == 0 and r2["skipped"] == 16


def test_string_keys_and_torn_tmp_sweep(ray_session, tmp_path):
    out = str(tmp_path / "p")
    ds = ray.data.range(300).map_batches(
        lambda b: {"doc_id": [f"d{int(i):04d}" for i in b["id"]],
                   "v": b["id"]},
        batch_format="numpy",
    )
    os.makedirs(f"{out}/manifest", exist_ok=True)
    open(f"{out}/part-00000.parquet.tmp", "wb").write(b"torn")
    r = write_partitioned(ds, out, key="doc_id", n_partitions=8)
    assert r["written"] == 8
    assert not glob.glob(f"{out}/*.tmp")
    assert len(read_partitioned(out).to_pandas()) == 300


def test_ops_output_through_sink(ray_session, tmp_path):
    # a real ops output (exact dedup) checkpoints through the sink
    import pyarrow as pa

    from moaray.ops.dedup import exact_dedup

    tbl = pa.table({
        "doc_id": pa.array(list(range(40)), pa.int64()),
        "text": [f"text {i % 25}" for i in range(40)],
    })
    out = str(tmp_path / "dedup")
    r = write_partitioned(
        exact_dedup(ray.data.from_arrow(tbl)), out, key="doc_id",
        n_partitions=4,
    )
    assert r["rows"] == 25
    assert len(read_partitioned(out).to_pandas()) == 25
