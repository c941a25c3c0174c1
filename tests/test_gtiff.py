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
