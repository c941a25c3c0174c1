"""ENVI export/read (moaray/sinks/envi.py): the third output driver after
tile-parquet and GeoTIFF (reference surface: any GDAL driver name,
ref mosaic.py:30-35)."""

import numpy as np
import pytest

from moaray import Layout, MosaicConfig, do_mosaic
from moaray.pipelines.mosaic import mosaic_array
from moaray.sinks.envi import export_envi, read_envi
from moaray.testgen import gen_images_table, images_path


def test_export_envi_roundtrip_single_band(ray_session, tmp_path):
    layout = Layout("grid3x3", 9, 64)
    path = images_path(layout)
    res = do_mosaic(path, MosaicConfig(layout=layout, blocksize=64,
                                       do_pyramids=False))
    truth = mosaic_array(res.tiles_ds, res.grid)
    out = str(tmp_path / "m.dat")
    export_envi(res, out)
    arr, gt, nullval, crs = read_envi(out)
    assert arr.dtype == truth.dtype
    assert np.array_equal(arr, truth)
    assert gt == tuple(res.grid.transform)
    assert nullval == res.grid.nullval
    assert crs == res.grid.crs
    # the seam row survives the byte stream (merge-order witness)
    assert arr[0, 60:66].tolist() == [60, 61, 62, 1, 2, 3]
    # header is plain ASCII with the ENVI magic
    hdr = open(str(tmp_path / "m.hdr")).read()
    assert hdr.startswith("ENVI\n")
    assert "interleave = bsq" in hdr


def test_export_envi_multiband(ray_session, tmp_path):
    import os

    import pyarrow.parquet as pq

    layout = Layout("grid3x3", 9, 48)
    tbl = gen_images_table(layout, nbands=3)
    cat = str(tmp_path / "cat")
    os.makedirs(cat)
    pq.write_table(tbl, os.path.join(cat, "p.parquet"))
    res = do_mosaic(cat, MosaicConfig(layout=layout, blocksize=48,
                                      do_pyramids=False))
    out = str(tmp_path / "mb.dat")
    export_envi(res, out, band="all")
    arr, gt, nullval, crs = read_envi(out)
    assert arr.shape[0] == 3
    for b in range(3):
        truth = mosaic_array(res.tiles_ds, res.grid, band=b)
        assert np.array_equal(arr[b], truth), b


def test_cli_envi_driver(ray_session, tmp_path):
    import subprocess
    import sys

    layout = Layout("grid3x3", 9, 64)
    src = images_path(layout)
    out = str(tmp_path / "cli.dat")
    proc = subprocess.run(
        [sys.executable, "-m", "moaray", "-i", src, "-o", out,
         "--layout", "grid3x3,9,64", "--blocksize", "64", "-d", "ENVI",
         "--nopyramids", "--numcpus", "4"],
        capture_output=True, text=True, timeout=300,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    arr, gt, nullval, crs = read_envi(out)
    assert arr[0, 60:66].tolist() == [60, 61, 62, 1, 2, 3]
    assert arr.shape == (188, 188)  # 3x64 px minus the 2x2 px overlaps


def test_envi_rejects_unsupported(ray_session, tmp_path):
    layout = Layout("grid3x3", 4, 32)
    path = images_path(Layout("sparse_gap", 4, 32))
    res = do_mosaic(path, MosaicConfig(layout=Layout("sparse_gap", 4, 32),
                                       blocksize=32, do_pyramids=False))
    out = str(tmp_path / "x.dat")
    export_envi(res, out)
    hdr_path = str(tmp_path / "x.hdr")
    hdr = open(hdr_path).read()
    open(hdr_path, "w").write(hdr.replace("interleave = bsq",
                                          "interleave = bil"))
    with pytest.raises(ValueError, match="interleave"):
        read_envi(out)
    open(hdr_path, "w").write("not a header\n")
    with pytest.raises(ValueError, match="ENVI"):
        read_envi(out)


def test_envi_full_circle_ingest(ray_session, tmp_path):
    """export_envi -> ingest the .dat/.hdr pair straight back through
    catalog_from_files -> re-mosaic bit-exact (the GeoTIFF full-circle
    contract, extended to the third driver)."""
    import os

    from moaray.sources.files import catalog_from_files

    layout = Layout("grid3x3", 9, 64)
    path = images_path(layout)
    res = do_mosaic(path, MosaicConfig(layout=layout, blocksize=64,
                                       do_pyramids=False))
    truth = mosaic_array(res.tiles_ds, res.grid)
    loose = tmp_path / "loose"
    os.makedirs(loose)
    export_envi(res, str(loose / "m.dat"))

    cat = catalog_from_files(str(loose), str(tmp_path / "cat"))
    res2 = do_mosaic(cat, MosaicConfig(blocksize=64, do_pyramids=False))
    got = mosaic_array(res2.tiles_ds, res2.grid)
    assert got.dtype == truth.dtype
    assert np.array_equal(got, truth)
    assert tuple(res2.grid.transform) == tuple(res.grid.transform)
    assert res2.grid.crs == res.grid.crs


def test_envi_sparse_gap_fill(ray_session, tmp_path):
    """Absent tile rows must come back as nullval bytes (the pad_to
    stream contract), not stale/short file content."""
    layout = Layout("sparse_gap", 4, 64)
    path = images_path(layout)
    res = do_mosaic(path, MosaicConfig(layout=layout, blocksize=64,
                                       do_pyramids=False))
    truth = mosaic_array(res.tiles_ds, res.grid)
    out = str(tmp_path / "sp.dat")
    export_envi(res, out)
    arr, _, nullval, _ = read_envi(out)
    assert np.array_equal(arr, truth)
    # the sparse layout really has an all-null region
    assert (arr == (nullval if nullval is not None else 0)).any()
