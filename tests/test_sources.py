"""File-based ingestion (sources/files.py): loose PNG + world files and
GeoTIFF inputs must mosaic identically to the catalog-table path."""

import os

import numpy as np
import pytest

from moaray import MosaicConfig, do_mosaic
from moaray.pipelines.mosaic import mosaic_array
from moaray.sources.files import (
    catalog_from_files,
    read_image_files,
    read_world_file,
)
from moaray.testgen import Layout, images_path, pixel_array, place

LAYOUT = Layout("grid3x3", 9, 64)


def _write_loose_pngs(root: str) -> str:
    from moaray import codecs

    d = os.path.join(root, "imgs")
    os.makedirs(d)
    for i in range(LAYOUT.n):
        arr = pixel_array(i, LAYOUT)
        name = os.path.join(d, f"img{i:08d}.png")
        with open(name, "wb") as f:
            f.write(codecs.encode(arr, "png"))
        gt = place(i, LAYOUT)
        # world file: center of top-left pixel
        with open(os.path.join(d, f"img{i:08d}.wld"), "w") as f:
            f.write(
                f"{gt[1]}\n{gt[4]}\n{gt[2]}\n{gt[5]}\n"
                f"{gt[0] + gt[1] / 2}\n{gt[3] + gt[5] / 2}\n"
            )
    with open(os.path.join(d, "crs.txt"), "w") as f:
        f.write("EPSG:32756\n")
    return d


def test_world_file_roundtrip(tmp_path):
    gt = (300000.0, 10.0, 0.0, 7000000.0, 0.0, -10.0)
    p = str(tmp_path / "a.wld")
    with open(p, "w") as f:
        f.write("10.0\n0.0\n0.0\n-10.0\n300005.0\n6999995.0\n")
    assert read_world_file(p) == gt


def test_loose_png_mosaic_equals_catalog(ray_session, tmp_path):
    d = _write_loose_pngs(str(tmp_path))
    catalog = catalog_from_files(d, str(tmp_path / "catalog"))
    cfg = MosaicConfig(layout=None, blocksize=64, do_pyramids=False)
    res = do_mosaic(catalog, cfg)
    got = mosaic_array(res.tiles_ds, res.grid)

    ref_cfg = MosaicConfig(layout=LAYOUT, blocksize=64, do_pyramids=False)
    ref = do_mosaic(images_path(LAYOUT), ref_cfg)
    expected = mosaic_array(ref.tiles_ds, ref.grid)
    assert np.array_equal(got, expected)
    assert res.stats == ref.stats


def test_missing_world_file_raises(ray_session, tmp_path):
    from moaray import codecs

    d = str(tmp_path / "imgs")
    os.makedirs(d)
    with open(os.path.join(d, "a.png"), "wb") as f:
        f.write(codecs.encode(pixel_array(0, LAYOUT), "png"))
    with pytest.raises(Exception, match="world file"):
        read_image_files(d).take_all()


def test_gtiff_file_ingest_roundtrip(ray_session, tmp_path):
    """Export a mosaic as GeoTIFF, ingest the FILE back as the sole input:
    the re-mosaic must reproduce the array bit-exactly (full circle through
    the from-scratch TIFF reader)."""
    from moaray.sinks.gtiff import export_gtiff

    ref = do_mosaic(
        images_path(LAYOUT),
        MosaicConfig(layout=LAYOUT, blocksize=64, do_pyramids=False),
    )
    expected = mosaic_array(ref.tiles_ds, ref.grid)
    tif_dir = str(tmp_path / "tifs")
    os.makedirs(tif_dir)
    export_gtiff(ref, os.path.join(tif_dir, "mosaic.tif"))

    catalog = catalog_from_files(tif_dir, str(tmp_path / "cat2"))
    res = do_mosaic(
        catalog, MosaicConfig(layout=None, blocksize=64, do_pyramids=False)
    )
    got = mosaic_array(res.tiles_ds, res.grid)
    assert np.array_equal(got, expected)


def test_catalog_read_through_uri_scheme(ray_session):
    """Remote-path catalog ingestion: the planner (pyarrow) and the decode
    scan (ray.data.read_parquet) both resolve URI schemes via
    FileSystem.from_uri, so an object-store catalog (s3://...) uses the
    exact same code path as this file:// rehearsal — the reference's
    /vsis3/ story (moamosaic/__init__.py:4-7) without GDAL."""
    from moaray import MosaicConfig, do_mosaic
    from moaray.testgen import Layout, images_path

    lay = Layout("grid3x3", 9, 64)
    uri = "file://" + images_path(lay)
    res = do_mosaic(uri, MosaicConfig(layout=lay, blocksize=64,
                                      do_pyramids=False))
    assert res.stats["count"] == 35156
    assert res.stats["min"] == 1 and res.stats["max"] == 63


def test_loose_jpeg_files_with_world_files(ray_session, tmp_path):
    """A directory of .jpg files + .wld sidecars mosaics through the
    from-scratch JPEG decoder — the real-world image-corpus-on-disk shape."""
    import numpy as np

    from moaray import MosaicConfig, do_mosaic
    from moaray.jpeg import jpeg_encode
    from moaray.pipelines.mosaic import mosaic_array

    from moaray.jpeg import jpeg_decode

    d = tmp_path / "jpgs"
    d.mkdir()
    size = 64
    # two flat-valued tiles side by side; the null column's hard edge
    # rings under DCT, so parity is vs the DECODED-lossy source (the same
    # contract as the q12/jpeg mosaic parity tests)
    expected = []
    for i, val in enumerate((50, 180)):
        arr = np.full((size, size), val, np.uint8)
        arr[:, 0] = 0
        blob = jpeg_encode(arr, quality=95)
        expected.append(jpeg_decode(blob))
        (d / f"img{i}.jpg").write_bytes(blob)
        x0 = 300000.0 + i * size * 10.0
        # world file stores the CENTER of the top-left pixel
        (d / f"img{i}.wld").write_text(
            f"10.0\n0.0\n0.0\n-10.0\n{x0 + 5.0}\n{7000000.0 - 5.0}\n"
        )
    (d / "crs.txt").write_text("EPSG:32756")
    from moaray.sources.files import catalog_from_files

    cat = catalog_from_files(str(d), str(tmp_path / "cat"))
    res = do_mosaic(cat, MosaicConfig(blocksize=64, do_pyramids=False,
                                      do_stats=False))
    got = mosaic_array(res.tiles_ds, res.grid)
    assert got.shape == (size, 2 * size)
    assert got.dtype == np.uint8
    # last-non-null merge of the two decoded-lossy arrays
    truth = np.zeros((size, 2 * size), np.uint8)
    for i, dec in enumerate(expected):
        dst = truth[:, i * size : (i + 1) * size]
        np.copyto(dst, dec, where=dec != 0)
    assert np.array_equal(got, truth)
    assert np.abs(got[:, 1:size].astype(int) - 50).max() <= 3
    assert np.abs(got[:, size + 1 :].astype(int) - 180).max() <= 3


def test_gif_bmp_file_ingest(ray_session, tmp_path):
    """Loose .gif/.bmp files with world-file sidecars import as COLOR
    catalogs (one shared payload per band row, plane-sliced at decode)
    and mosaic per band."""
    import numpy as np

    from moaray.codecs import bmp_encode
    from moaray.gif import gif_encode
    from moaray.pipelines.mosaic import MosaicConfig, do_mosaic, mosaic_array
    from moaray.sources.files import catalog_from_files

    pal = np.random.RandomState(0).randint(1, 256, (64, 3)).astype(np.uint8)
    rng = np.random.RandomState(1)
    d = tmp_path / "files"
    d.mkdir()
    imgs = []
    for i, (ext, enc) in enumerate((("gif", gif_encode), ("bmp", bmp_encode))):
        img = pal[rng.randint(0, 64, (64, 64))]
        imgs.append(img)
        (d / f"im{i}.{ext}").write_bytes(enc(img))
        (d / f"im{i}.wld").write_text(
            f"10.0\n0.0\n0.0\n-10.0\n{300005.0 + i * 640}\n6999995.0\n"
        )
    cat = catalog_from_files(str(d), str(tmp_path / "cat"))
    res = do_mosaic(cat, MosaicConfig(blocksize=64))
    assert set(res.stats_by_band.keys()) == {0, 1, 2}
    for b in range(3):
        band = mosaic_array(res.tiles_ds, res.grid, band=b)
        # each image's region equals its own channel plane exactly
        assert np.array_equal(band[:64, :64], imgs[0][:, :, b])
        assert np.array_equal(band[:64, 64:128], imgs[1][:, :, b])


def test_read_documents_formats(ray_session, tmp_path):
    """parquet / jsonl / jsonl.gz / csv document ingestion all produce the
    same rows, and the text ops run identically on each."""
    import gzip
    import json

    import pyarrow.parquet as pq

    from moaray.ops.text import token_count_batch
    from moaray.sources.docs import read_documents

    t = pq.read_table("/root/testdata/sf0.001/documents.parquet",
                      columns=["doc_id", "text"]).slice(0, 50)
    rows = t.to_pylist()

    jl = tmp_path / "docs.jsonl"
    jl.write_text("\n".join(json.dumps(r) for r in rows) + "\n")
    jgz = tmp_path / "docs.jsonl.gz"
    with gzip.open(jgz, "wt") as f:
        f.write("\n".join(json.dumps(r) for r in rows) + "\n")
    cs = tmp_path / "docs.csv"
    import csv as _csv

    with open(cs, "w", newline="") as f:
        w = _csv.DictWriter(f, fieldnames=["doc_id", "text"])
        w.writeheader()
        w.writerows(rows)
    pqd = tmp_path / "docs.parquet"
    pq.write_table(t, pqd)

    def counted(path):
        ds = read_documents(str(path), columns=["doc_id", "text"])
        out = ds.map_batches(token_count_batch,
                             batch_format="pyarrow").take_all()
        return sorted((r["doc_id"], r["n_tokens"]) for r in out)

    base = counted(pqd)
    assert len(base) == 50
    assert counted(jl) == base
    assert counted(jgz) == base
    assert counted(cs) == base


def test_read_lance_dispatch(ray_session, tmp_path):
    """Pin the .lance read path (round-4 verdict #7): with pylance
    installed a .lance catalog round-trips; without it the dispatch must
    raise the documented ImportError naming the missing wheel — the gap
    is explicit, not latent."""
    try:
        import lance  # noqa: F401
        have_lance = True
    except ImportError:
        have_lance = False

    from moaray.pipelines.mosaic import read_images

    if not have_lance:
        with pytest.raises(ImportError, match="pylance"):
            read_images(str(tmp_path / "cat.lance"), columns=["image_id"])
        pytest.skip(
            "pylance wheel not installed in this sandbox (SURVEY §10): "
            ".lance ingest dispatch verified to fail loudly; parquet is "
            "the tested fallback"
        )
    # with the wheel present: write a lance dataset and mosaic from it
    import lance as _lance
    import pyarrow as _pa

    from moaray import codecs

    size = 32
    img = np.full((size, size), 7, dtype=np.uint16)
    tbl = _pa.table({
        "image_id": _pa.array(["a"], _pa.string()),
        "bytes": _pa.array([codecs.encode(img, "z16")], _pa.binary()),
        "w": _pa.array([size], _pa.int32()),
        "h": _pa.array([size], _pa.int32()),
        "fmt": _pa.array(["z16"], _pa.string()),
        "gt": _pa.array([[0.0, 1.0, 0.0, 0.0, 0.0, -1.0]],
                        _pa.list_(_pa.float64(), 6)),
        "crs": _pa.array(["EPSG:32756"], _pa.string()),
        "nullval": _pa.array([0.0], _pa.float64()),
        "seq": _pa.array([0], _pa.int64()),
    })
    path = str(tmp_path / "cat.lance")
    _lance.write_dataset(tbl, path)
    ds = read_images(path, columns=["image_id", "w", "h"])
    assert ds.count() == 1
