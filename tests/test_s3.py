"""S3-protocol ingestion: the reference's raison d'être is mosaicking
straight from object storage (/vsis3/, ref moamosaic/__init__.py:4-7).
These tests run a REAL S3 HTTP endpoint in-process (moto's threaded
server), upload the image catalog with boto3, and drive the catalog read
+ full mosaic over ``s3://`` URIs — the filesystem (with the endpoint and
credentials baked in) serializes into every Ray read task."""

import os
import socket

import numpy as np
import pytest

moto = pytest.importorskip("moto")
boto3 = pytest.importorskip("boto3")

from moto.server import ThreadedMotoServer  # noqa: E402


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.fixture(scope="module")
def s3_endpoint():
    port = _free_port()
    server = ThreadedMotoServer(ip_address="127.0.0.1", port=port,
                                verbose=False)
    server.start()
    url = f"http://127.0.0.1:{port}"
    old = {k: os.environ.get(k) for k in (
        "AWS_ACCESS_KEY_ID", "AWS_SECRET_ACCESS_KEY",
        "AWS_ENDPOINT_URL_S3", "AWS_REGION",
    )}
    os.environ["AWS_ACCESS_KEY_ID"] = "testing"
    os.environ["AWS_SECRET_ACCESS_KEY"] = "testing"
    os.environ["AWS_ENDPOINT_URL_S3"] = url
    os.environ["AWS_REGION"] = "us-east-1"
    try:
        yield url
    finally:
        for k, v in old.items():
            if v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = v
        server.stop()


@pytest.fixture(scope="module")
def s3_catalog(s3_endpoint):
    """grid3x3 catalog uploaded to s3://moaray-test/cat/p.parquet."""
    import io

    import pyarrow.parquet as pq

    from moaray.testgen import Layout, gen_images_table

    layout = Layout("grid3x3", 9, 64)
    tbl = gen_images_table(layout, ("raw16",))
    buf = io.BytesIO()
    pq.write_table(tbl, buf)
    client = boto3.client("s3", endpoint_url=s3_endpoint,
                          region_name="us-east-1")
    client.create_bucket(Bucket="moaray-test")
    client.put_object(Bucket="moaray-test", Key="cat/p.parquet",
                      Body=buf.getvalue())
    return layout, "s3://moaray-test/cat"


def test_catalog_footer_peeks_over_s3(s3_catalog):
    """Driver-side footer peeks (column pruning, row counts, band set)
    work against the object store without downloading payloads."""
    from moaray.pipelines.mosaic import (
        _bands_of,
        _parquet_num_rows,
        meta_columns,
    )

    _layout, uri = s3_catalog
    assert _parquet_num_rows(uri) == 9
    assert set(meta_columns(uri)) >= {"image_id", "w", "h", "fmt"}
    assert _bands_of(uri) == [0]


def test_catalog_read_over_s3(ray_session, s3_catalog):
    import ray  # noqa: F401

    from moaray.pipelines.mosaic import read_images

    _layout, uri = s3_catalog
    ds = read_images(uri, columns=["image_id", "w", "h"])
    rows = ds.take_all()
    assert len(rows) == 9
    assert {r["w"] for r in rows} == {64}


def test_mosaic_over_s3_matches_local(ray_session, s3_catalog, tmp_path):
    """Full pipeline over s3://: identical stats and pixels to the local
    run of the same catalog (the seam row pins merge order)."""
    from moaray import MosaicConfig, do_mosaic
    from moaray.pipelines.mosaic import mosaic_array
    from moaray.testgen import images_path

    layout, uri = s3_catalog
    cfg = MosaicConfig(layout=layout, blocksize=64, do_pyramids=False)
    res_s3 = do_mosaic(uri, cfg, out_dir=str(tmp_path / "out_s3"))
    arr_s3 = mosaic_array(res_s3.tiles_ds, res_s3.grid)
    assert list(arr_s3[0, 60:66]) == [60, 61, 62, 1, 2, 3]
    assert res_s3.stats["count"] == 35156

    res_local = do_mosaic(images_path(layout), cfg)
    arr_local = mosaic_array(res_local.tiles_ds, res_local.grid)
    assert res_s3.grid.transform == res_local.grid.transform
    assert np.array_equal(arr_s3, arr_local)


def test_resolve_filesystem_local_paths_untouched():
    from moaray.io import resolve_filesystem

    fs, p = resolve_filesystem("/tmp/x")
    assert fs is None and p == "/tmp/x"
    fs, p = resolve_filesystem("file:///tmp/x")
    assert fs is None and p == "/tmp/x"


def test_update_mosaic_delta_over_s3(ray_session, s3_endpoint, tmp_path):
    """Incremental update with the DELTA catalog on s3://: the content-id
    guard, driver-side planning reads and the window decode all route
    through the object store; result equals the local-delta update."""
    import io

    import pyarrow as pa
    import pyarrow.parquet as pq

    from moaray import MosaicConfig, do_mosaic
    from moaray.pipelines.mosaic import mosaic_array
    from moaray.pipelines.update import update_mosaic
    from moaray.testgen import Layout, gen_images_table

    layout = Layout("grid3x3", 9, 64)
    tbl = gen_images_table(layout)
    base_dir = tmp_path / "base"
    base_dir.mkdir()
    pq.write_table(tbl.take(pa.array([0, 1, 2, 3, 5, 6, 7, 8])),
                   str(base_dir / "p.parquet"))
    delta = tbl.take(pa.array([4]))
    buf = io.BytesIO()
    pq.write_table(delta, buf)
    client = boto3.client("s3", endpoint_url=s3_endpoint,
                          region_name="us-east-1")
    client.create_bucket(Bucket="moaray-upd")
    client.put_object(Bucket="moaray-upd", Key="delta/p.parquet",
                      Body=buf.getvalue())

    cfg = MosaicConfig(layout=layout, blocksize=64, do_pyramids=False)
    out_s3 = str(tmp_path / "out_s3")
    do_mosaic(str(base_dir), cfg, out_dir=out_s3)
    res = update_mosaic("s3://moaray-upd/delta", cfg, out_s3)
    got = mosaic_array(res.tiles_ds, res.grid)

    out_local = str(tmp_path / "out_local")
    local_delta = tmp_path / "delta_local"
    local_delta.mkdir()
    pq.write_table(delta, str(local_delta / "p.parquet"))
    do_mosaic(str(base_dir), cfg, out_dir=out_local)
    res2 = update_mosaic(str(local_delta), cfg, out_local)
    want = mosaic_array(res2.tiles_ds, res2.grid)
    assert np.array_equal(got, want)


def test_committed_sink_over_s3(ray_session, s3_endpoint, s3_catalog,
                                tmp_path):
    """The committed tile sink writes to s3:// — data partitions +
    manifest records + grid.json all as atomic PUTs (no rename on object
    stores; the manifest's existence is the commit marker). Pixels,
    stats-from-manifest and the seam row equal a local-out_dir run."""
    from moaray import MosaicConfig, do_mosaic
    from moaray.pipelines.mosaic import mosaic_array
    from moaray.state.manifest import (
        committed_keys,
        read_committed_tiles,
        stats_from_manifest,
    )

    layout, uri = s3_catalog
    client = boto3.client("s3", endpoint_url=s3_endpoint,
                          region_name="us-east-1")
    client.create_bucket(Bucket="moaray-out")
    out_uri = "s3://moaray-out/mosaic1"
    cfg = MosaicConfig(layout=layout, blocksize=64, do_pyramids=False)
    res = do_mosaic(uri, cfg, out_dir=out_uri)
    arr = mosaic_array(res.tiles_ds, res.grid)
    assert list(arr[0, 60:66]) == [60, 61, 62, 1, 2, 3]
    assert res.stats["count"] == 35156

    # the manifest protocol works against the store
    assert len(committed_keys(out_uri)) == res.grid.num_tiles
    assert stats_from_manifest(out_uri)[0]["count"] == 35156
    back = mosaic_array(read_committed_tiles(out_uri), res.grid)
    assert np.array_equal(back, arr)

    # objects actually live in the bucket (data + manifest + grid.json)
    keys = [o["Key"] for o in client.list_objects_v2(
        Bucket="moaray-out", Prefix="mosaic1/")["Contents"]]
    assert any(k.startswith("mosaic1/tiles/") for k in keys)
    assert any(k.startswith("mosaic1/manifest/") for k in keys)
    assert "mosaic1/grid.json" in keys


def test_s3_sink_kill_resume(ray_session, s3_endpoint, s3_catalog):
    """Resume semantics against the object store: delete one partition's
    manifest record (simulating a kill between data PUT and manifest PUT)
    and rerun with resume=True — only the uncommitted keys recompute and
    the reassembled mosaic is identical."""
    from moaray import MosaicConfig, do_mosaic
    from moaray.pipelines.mosaic import mosaic_array
    from moaray.state.manifest import committed_keys

    layout, uri = s3_catalog
    client = boto3.client("s3", endpoint_url=s3_endpoint,
                          region_name="us-east-1")
    client.create_bucket(Bucket="moaray-out2")
    out_uri = "s3://moaray-out2/mosaic"
    cfg = MosaicConfig(layout=layout, blocksize=64, do_pyramids=False)
    res1 = do_mosaic(uri, cfg, out_dir=out_uri)
    truth = mosaic_array(res1.tiles_ds, res1.grid)
    n_tiles = res1.grid.num_tiles

    # sever one partition's commit: data object stays (orphan), manifest
    # object goes — exactly the state a kill between the two PUTs leaves
    mans = [o["Key"] for o in client.list_objects_v2(
        Bucket="moaray-out2", Prefix="mosaic/manifest/")["Contents"]]
    client.delete_object(Bucket="moaray-out2", Key=mans[0])
    missing = n_tiles - len(committed_keys(out_uri))
    assert missing > 0

    res2 = do_mosaic(uri, cfg, out_dir=out_uri, resume=True)
    assert res2.skipped_tiles == n_tiles - missing
    assert len(committed_keys(out_uri)) == n_tiles
    got = mosaic_array(res2.tiles_ds, res2.grid)
    assert np.array_equal(got, truth)


def test_partitioned_ops_sink_over_s3(ray_session, s3_endpoint):
    """The generic resumable ops sink also targets s3://: write, lose one
    manifest object, rerun -> exactly that bucket rewrites; read-back
    round-trips."""
    import ray

    from moaray.sinks.partitioned import (
        committed_buckets,
        read_partitioned,
        write_partitioned,
    )

    client = boto3.client("s3", endpoint_url=s3_endpoint,
                          region_name="us-east-1")
    client.create_bucket(Bucket="moaray-ops")
    out = "s3://moaray-ops/dedup_out"
    ds = ray.data.range(1000).map_batches(
        lambda b: {"id": b["id"], "val": b["id"] * 2},
        batch_format="numpy",
    )
    st = write_partitioned(ds, out, key="id", n_partitions=8)
    assert st["written"] == 8 and st["rows"] == 1000
    assert committed_buckets(out) == set(range(8))

    # sever one bucket's commit marker, rerun -> only it rewrites
    client.delete_object(Bucket="moaray-ops",
                         Key="dedup_out/manifest/bucket-00003.json")
    st2 = write_partitioned(ds, out, key="id", n_partitions=8)
    assert st2["written"] == 1 and st2["skipped"] == 7

    back = read_partitioned(out)
    rows = back.take_all()
    assert len(rows) == 1000
    assert sorted(r["id"] for r in rows) == list(range(1000))


def test_feather_update_into_s3_out_dir(ray_session, s3_endpoint,
                                        s3_catalog, tmp_path):
    """Feather-partial incremental update writing INTO an s3:// output:
    grid.json generations, num/den schema probe, base read pinned to
    gen_hwm and the rerun no-op guard all work against the store."""
    import io

    import pyarrow as pa
    import pyarrow.parquet as pq

    from moaray import MosaicConfig, do_mosaic
    from moaray.pipelines.mosaic import mosaic_array
    from moaray.pipelines.update import update_mosaic
    from moaray.testgen import Layout, gen_images_table

    layout = Layout("grid3x3", 9, 64)
    tbl = gen_images_table(layout)
    base_dir = tmp_path / "fbase"
    base_dir.mkdir()
    pq.write_table(tbl.take(pa.array([0, 1, 2, 3, 5, 6, 7, 8])),
                   str(base_dir / "p.parquet"))
    delta_dir = tmp_path / "fdelta"
    delta_dir.mkdir()
    pq.write_table(tbl.take(pa.array([4])), str(delta_dir / "p.parquet"))

    client = boto3.client("s3", endpoint_url=s3_endpoint,
                          region_name="us-east-1")
    client.create_bucket(Bucket="moaray-fupd")
    out = "s3://moaray-fupd/out"
    cfg = MosaicConfig(layout=layout, blocksize=64, merge="feather",
                       feather_partials=True, do_pyramids=False)
    do_mosaic(str(base_dir), cfg, out_dir=out)
    res1 = update_mosaic(str(delta_dir), cfg, out)
    got1 = mosaic_array(res1.tiles_ds, res1.grid)
    # rerun of the same delta is a no-op (content-id guard via s3 grid.json)
    res2 = update_mosaic(str(delta_dir), cfg, out)
    got2 = mosaic_array(res2.tiles_ds, res2.grid)
    assert np.array_equal(got1, got2)
    # equals the same flow against a local out_dir
    out_l = str(tmp_path / "fout_local")
    do_mosaic(str(base_dir), cfg, out_dir=out_l)
    res3 = update_mosaic(str(delta_dir), cfg, out_l)
    assert np.array_equal(got1, mosaic_array(res3.tiles_ds, res3.grid))


def test_export_gtiff_to_s3(ray_session, s3_endpoint, s3_catalog, tmp_path):
    """Single-file GeoTIFF export straight to an s3:// URI: spools to a
    local temp (the format needs a seekable target for offset
    back-patching), uploads as one object; the downloaded bytes decode
    identically to a local export of the same mosaic."""
    from moaray import MosaicConfig, do_mosaic
    from moaray.sinks.gtiff import export_gtiff, read_gtiff

    layout, uri = s3_catalog
    cfg = MosaicConfig(layout=layout, blocksize=64, do_pyramids=False,
                       do_stats=False)
    res = do_mosaic(uri, cfg)
    dest = "s3://moaray-test/exports/mosaic.tif"
    export_gtiff(res, dest, compress="deflate", predictor=2)

    client = boto3.client("s3", endpoint_url=s3_endpoint,
                          region_name="us-east-1")
    body = client.get_object(Bucket="moaray-test",
                             Key="exports/mosaic.tif")["Body"].read()
    remote_copy = tmp_path / "remote.tif"
    remote_copy.write_bytes(body)
    local = tmp_path / "local.tif"
    export_gtiff(res, str(local), compress="deflate", predictor=2)
    assert remote_copy.read_bytes() == local.read_bytes()
    arr, gt, nullval = read_gtiff(str(remote_copy))
    assert list(arr[0, 60:66]) == [60, 61, 62, 1, 2, 3]


def test_wds_shards_over_s3(ray_session, s3_endpoint):
    """The WebDataset tar-shard sink targets s3:// both directions:
    write, sever one shard's manifest, rerun rewrites exactly it,
    read_wds_shards round-trips from the store."""
    import boto3
    import pyarrow as pa
    import ray

    from moaray.sinks.wds import read_wds_shards, write_wds_shards

    client = boto3.client("s3", endpoint_url=s3_endpoint,
                          region_name="us-east-1")
    client.create_bucket(Bucket="moaray-wds")
    out = "s3://moaray-wds/shards"
    src = pa.table({
        "doc_id": pa.array(range(60), pa.int64()),
        "text": pa.array([f"s3 doc {i}" for i in range(60)], pa.string()),
        "payload": pa.array([bytes([i, i + 1]) for i in range(60)],
                            pa.binary()),
    })
    m1 = write_wds_shards(ray.data.from_arrow(src), out, key="doc_id",
                          n_shards=4)
    assert m1["written"] == 4 and m1["rows"] == 60

    client.delete_object(Bucket="moaray-wds",
                         Key="shards/manifest/shard-00002.json")
    m2 = write_wds_shards(ray.data.from_arrow(src), out, key="doc_id",
                          n_shards=4)
    assert m2["written"] == 1 and m2["skipped"] == 3

    back = sorted(read_wds_shards(out).take_all(),
                  key=lambda r: r["doc_id"])
    assert len(back) == 60
    assert back[7]["text"] == "s3 doc 7"
    assert back[7]["payload"] == bytes([7, 8])
