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
