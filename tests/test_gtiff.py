"""Single-file GeoTIFF export (the reference's primary output shape,
openOutfile mosaic.py:604-660): byte-level round-trip + mosaic export."""

import struct

import numpy as np

from moaray import MosaicConfig, do_mosaic
from moaray.sinks.gtiff import export_gtiff, read_gtiff, write_gtiff
from moaray.testgen import Layout, images_path

from test_mosaic_parity import oracle_mosaic


def test_gtiff_roundtrip(tmp_path):
    arr = (np.arange(137 * 211, dtype=np.uint32) % 65536).astype(np.uint16)
    arr = arr.reshape(137, 211)
    gt = (300000.0, 10.0, 0.0, 7000000.0, 0.0, -10.0)
    p = str(tmp_path / "x.tif")
    write_gtiff(p, arr, gt, "EPSG:32756", nullval=0.0, rows_per_strip=50)
    back, gt2, nodata = read_gtiff(p)
    assert (back == arr).all()
    assert gt2 == gt
    assert nodata == 0.0
    # structural sanity: TIFF magic + several strips
    raw = open(p, "rb").read()
    assert raw[:4] == b"II*\x00"
    (n_entries,) = struct.unpack_from("<H", raw, 8)
    assert n_entries >= 12


def test_export_mosaic_gtiff(tmp_path):
    layout = Layout("grid3x3", 9, 64)
    _grid, truth = oracle_mosaic(layout)
    res = do_mosaic(
        images_path(layout),
        MosaicConfig(layout=layout, blocksize=64, do_pyramids=False),
    )
    p = str(tmp_path / "mosaic.tif")
    export_gtiff(res, p)
    arr, gt, nodata = read_gtiff(p)
    assert (arr == truth).all()
    assert gt == res.grid.transform
    assert nodata == res.grid.nullval


def test_tiled_gtiff_with_overviews_roundtrip():
    import numpy as np

    from moaray.sinks.gtiff import (
        read_gtiff_bytes,
        read_gtiff_full,
        write_gtiff_tiled,
    )

    rng = np.random.RandomState(4)
    arr = (rng.rand(1100, 900) * 60000).astype(np.uint16)
    path = "/tmp/test_tiled_ov.tif"
    levels = write_gtiff_tiled(
        path, arr, (300000.0, 10.0, 0.0, 7000000.0, 0.0, -10.0),
        "EPSG:32756", 0.0, tile=256, min_overview_size=128,
    )
    full, ovs, gt, nd = read_gtiff_full(path)
    assert np.array_equal(full, arr)
    assert len(ovs) == len(levels) == 2
    for lvl, ov in zip(levels, ovs):
        assert np.array_equal(ov, arr[lvl // 2 :: lvl, lvl // 2 :: lvl])
    assert gt == (300000.0, 10.0, 0.0, 7000000.0, 0.0, -10.0) and nd == 0.0
    # the plain reader sees the full-res IFD of a tiled file too
    with open(path, "rb") as f:
        arr2, gt2, nd2 = read_gtiff_bytes(f.read())
    assert np.array_equal(arr2, arr) and gt2 == gt


def test_cli_gtiff_tiled_export(tmp_path, ray_session):
    import subprocess
    import sys

    import numpy as np

    from moaray.cli import main_cmd
    from moaray.sinks.gtiff import read_gtiff_full
    from moaray.testgen import Layout, images_path

    path = images_path(Layout("grid3x3", 9, 64))
    out = str(tmp_path / "out.tif")
    rc = main_cmd([
        "-i", path, "-o", out, "-d", "GTiff", "--co", "TILED=YES",
        "--layout", "grid3x3,9,64", "-b", "64", "--minoverviewsize", "16",
        "--nopyramids",
    ])
    assert rc == 0
    full, ovs, gt, nd = read_gtiff_full(out)
    assert full[0, 60:66].tolist() == [60, 61, 62, 1, 2, 3]
    assert len(ovs) >= 1  # embedded overview IFDs present
    for lvl, ov in zip([4, 8], ovs):
        assert np.array_equal(ov, full[lvl // 2 :: lvl, lvl // 2 :: lvl])
