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


def test_kill_resume_via_fsspec_scheme(ray_session, tmp_path):
    """The same kill-resume contract through a SECOND URI scheme:
    ``local://`` resolves via fsspec (io.py resolve_filesystem's generic
    fallback) into a pyarrow PyFileSystem, driving OutputFS's REMOTE code
    path (single-PUT open_output_stream commits, prefix-listing isdir) on
    real disk — proving no s3-specific assumption leaks into the commit
    logic (round-4 verdict #6)."""
    from moaray.io import resolve_filesystem

    fs, p = resolve_filesystem(f"local://{tmp_path}/q")
    assert fs is not None and p == f"{tmp_path}/q"

    out_uri = f"local://{tmp_path}/q"
    out_disk = str(tmp_path / "q")
    r = write_partitioned(_ds(), out_uri, key="doc_id", n_partitions=8)
    assert r == {"written": 8, "skipped": 0, "rows": 4000,
                 "n_partitions": 8}
    # the objects landed on real disk (shared state across Ray workers,
    # unlike an in-memory mock fs)
    mans = sorted(glob.glob(f"{out_disk}/manifest/*.json"))
    assert len(mans) == 8
    for m in mans[::3][:3]:  # kill: lose 3 partitions
        rec = json.loads(open(m).read())
        path = rec["path"]
        os.remove(path if os.path.isabs(path) else f"/{path}")
        os.remove(m)
    assert len(committed_buckets(out_uri)) == 5
    r2 = write_partitioned(_ds(), out_uri, key="doc_id", n_partitions=8)
    assert r2["written"] == 3 and r2["skipped"] == 5
    back = read_partitioned(out_uri).to_pandas()
    assert sorted(back["doc_id"].tolist()) == list(range(4000))
    r3 = write_partitioned(_ds(), out_uri, key="doc_id", n_partitions=8)
    assert r3["written"] == 0 and r3["skipped"] == 8


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


# ---------------------------------------------------------------------------
# GeoJSONL vector sink
# ---------------------------------------------------------------------------

def test_write_geojsonl_roundtrip_and_resume(tmp_path, ray_session):
    import json
    import os

    import numpy as np

    from moaray import MosaicConfig
    from moaray.ops.vector import (
        footprint_polygon,
        polygonize_footprints,
        wkt_polygon_geometries,
    )
    from moaray.sinks.partitioned import committed_buckets, write_geojsonl
    from moaray.stages.plan import probe_metadata
    from moaray.testgen import Layout, images_path, metas_for_layout

    from moaray.io import read_parquet_clean

    layout = Layout("grid3x3", 9, 64)
    metas = metas_for_layout(layout)
    meta_ds = probe_metadata(read_parquet_clean(images_path(layout)), layout)
    fp = polygonize_footprints(meta_ds)
    out = str(tmp_path / "fp_geo")
    stats = write_geojsonl(fp, out, wkt_polygon_geometries, key="image_id",
                           n_partitions=4)
    assert stats["rows"] == 9 and stats["written"] == 4

    # read back every feature, compare rings vs footprint_polygon truth
    feats = {}
    for fn in os.listdir(out):
        if not fn.endswith(".geojsonl"):
            continue
        for line in open(os.path.join(out, fn)):
            f = json.loads(line)
            assert f["type"] == "Feature"
            feats[f["properties"]["image_id"]] = f
    assert len(feats) == 9
    for m in metas:
        ring = np.array(feats[m.image_id]["geometry"]["coordinates"][0])
        truth = footprint_polygon(m)
        # ring closes back to the first vertex
        assert np.allclose(ring[:-1], truth, atol=1e-6)
        assert np.allclose(ring[-1], truth[0], atol=1e-6)
        assert feats[m.image_id]["properties"]["footprint_wkt"].startswith(
            "POLYGON")

    # kill-resume: sever one manifest -> rerun rewrites exactly that bucket
    victim = sorted(committed_buckets(out))[0]
    os.remove(os.path.join(out, "manifest", f"bucket-{victim:05d}.json"))
    fp2 = polygonize_footprints(probe_metadata(
        read_parquet_clean(images_path(layout)), layout))
    stats2 = write_geojsonl(fp2, out, wkt_polygon_geometries,
                            key="image_id", n_partitions=4)
    assert stats2["written"] == 1 and stats2["skipped"] == 3


def test_geojsonl_contour_linestrings(tmp_path, ray_session):
    import json
    import os

    from moaray import MosaicConfig, do_mosaic
    from moaray.ops.raster import contour_lines
    from moaray.ops.vector import segment_geometries
    from moaray.sinks.partitioned import write_geojsonl
    from moaray.testgen import Layout, images_path

    layout = Layout("grid3x3", 9, 64)
    res = do_mosaic(images_path(layout),
                    MosaicConfig(layout=layout, blocksize=64,
                                 do_pyramids=False, do_stats=False))
    segs = contour_lines(res.tiles_ds, res.grid, levels=[30.5])
    out = str(tmp_path / "ct_geo")
    stats = write_geojsonl(segs, out, segment_geometries, key="tile_id",
                           n_partitions=2)
    assert stats["rows"] > 0
    n = 0
    for fn in os.listdir(out):
        if fn.endswith(".geojsonl"):
            for line in open(os.path.join(out, fn)):
                f = json.loads(line)
                assert f["geometry"]["type"] == "LineString"
                assert len(f["geometry"]["coordinates"]) == 2
                assert f["properties"]["level"] == 30.5
                n += 1
    assert n == stats["rows"]


def test_wds_shards_roundtrip_determinism_resume(ray_session, tmp_path):
    """WebDataset tar-shard sink: exact round-trip, deterministic shard
    bytes, convention-compliant entry names, and kill-resume that rewrites
    exactly the severed shard."""
    import json
    import tarfile
    import zlib

    import pyarrow as pa

    from moaray.sinks.wds import (read_wds_shards, write_wds_shards)

    src = pa.table({
        "doc_id": pa.array(range(100), pa.int64()),
        "text": pa.array([f"doc number {i}" for i in range(100)],
                         pa.string()),
        "payload": pa.array([bytes([i % 256, 255 - i % 256])
                             for i in range(100)], pa.binary()),
        "meta": pa.array([float(i) / 4 for i in range(100)], pa.float64()),
    })
    out = str(tmp_path / "wds")
    m1 = write_wds_shards(ray.data.from_arrow(src), out, key="doc_id",
                          n_shards=8)
    assert m1["rows"] == 100 and m1["written"] == 8

    got = sorted(read_wds_shards(out).take_all(),
                 key=lambda r: r["doc_id"])
    assert len(got) == 100
    for i, r in enumerate(got):
        assert r["doc_id"] == i
        assert r["text"] == f"doc number {i}"
        assert r["payload"] == bytes([i % 256, 255 - i % 256])
        assert r["meta"] == float(i) / 4

    # convention: entries named {key:012d}.{col}.{ext}, mtime 0, sorted
    with tarfile.open(f"{out}/shard-00000.tar") as tf:
        names = [m.name for m in tf.getmembers()]
        assert all(m.mtime == 0 for m in tf.getmembers())
        stems = [n.rsplit(".", 2) for n in names]
        assert all(s[2] in ("txt", "bin", "json") for s in stems)
        assert names == sorted(names)

    # determinism: full rewrite produces byte-identical shards
    crc_before = {
        b: json.load(open(f"{out}/manifest/shard-{b:05d}.json"))["crc32"]
        for b in range(8)
    }
    m2 = write_wds_shards(ray.data.from_arrow(src), out, key="doc_id",
                          n_shards=8, resume=False)
    assert m2["written"] == 8
    for b in range(8):
        blob = open(f"{out}/shard-{b:05d}.tar", "rb").read()
        assert zlib.crc32(blob) == crc_before[b], b

    # resume: rerun rewrites nothing; sever one shard -> exactly 1 rewrite
    m3 = write_wds_shards(ray.data.from_arrow(src), out, key="doc_id",
                          n_shards=8)
    assert m3["written"] == 0 and m3["skipped"] == 8
    import os
    os.remove(f"{out}/shard-00003.tar")
    os.remove(f"{out}/manifest/shard-00003.json")
    m4 = write_wds_shards(ray.data.from_arrow(src), out, key="doc_id",
                          n_shards=8)
    assert m4["written"] == 1
    again = sorted(read_wds_shards(out).take_all(),
                   key=lambda r: r["doc_id"])
    assert again == got
