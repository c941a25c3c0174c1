"""HFA / Erdas Imagine export+read (moaray/sinks/hfa.py): the fourth
output driver (reference surface: KEA/HFA/GTiff creation options, ref
mosaic.py:30-35; KEA is an HDF5 container and stays gated — HFA is the
documented binary format we CAN write from scratch).

The reader decodes records through the file's own data dictionary, so
these tests double as a dictionary-grammar regression suite.
"""

import numpy as np
import pytest

from moaray import Layout, MosaicConfig, do_mosaic
from moaray.pipelines.mosaic import mosaic_array
from moaray.sinks.hfa import (_parse_dictionary, export_hfa, parse_hfa_bytes,
                              read_hfa)
from moaray.testgen import gen_images_table, images_path


def test_export_hfa_roundtrip_single_band(ray_session, tmp_path):
    layout = Layout("grid3x3", 9, 64)
    path = images_path(layout)
    res = do_mosaic(path, MosaicConfig(layout=layout, blocksize=64,
                                       do_pyramids=False))
    truth = mosaic_array(res.tiles_ds, res.grid)
    out = str(tmp_path / "m.img")
    export_hfa(res, out)
    arr, gt, nullval, crs = read_hfa(out)
    assert arr.dtype == truth.dtype
    assert np.array_equal(arr, truth)
    assert gt == pytest.approx(tuple(res.grid.transform))
    assert nullval == res.grid.nullval
    assert crs == res.grid.crs
    # the seam row survives the blocked stream (merge-order witness)
    assert arr[0, 60:66].tolist() == [60, 61, 62, 1, 2, 3]
    # file leads with the HFA magic
    assert open(out, "rb").read(16) == b"EHFA_HEADER_TAG\x00"


def test_export_hfa_multiband(ray_session, tmp_path):
    import os

    import pyarrow.parquet as pq

    layout = Layout("grid3x3", 9, 48)
    tbl = gen_images_table(layout, nbands=3)
    cat = str(tmp_path / "cat")
    os.makedirs(cat)
    pq.write_table(tbl, os.path.join(cat, "p.parquet"))
    res = do_mosaic(cat, MosaicConfig(layout=layout, blocksize=48,
                                      do_pyramids=False))
    out = str(tmp_path / "mb.img")
    export_hfa(res, out, band="all")
    arr, gt, nullval, crs = read_hfa(out)
    assert arr.shape[0] == 3
    for b in range(3):
        truth = mosaic_array(res.tiles_ds, res.grid, band=b)
        assert np.array_equal(arr[b], truth), b


def test_cli_hfa_driver(ray_session, tmp_path):
    import subprocess
    import sys

    layout = Layout("grid3x3", 9, 64)
    src = images_path(layout)
    out = str(tmp_path / "cli.img")
    proc = subprocess.run(
        [sys.executable, "-m", "moaray", "-i", src, "-o", out,
         "--layout", "grid3x3,9,64", "--blocksize", "64", "-d", "HFA",
         "--nopyramids", "--numcpus", "4"],
        capture_output=True, text=True, timeout=300,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    arr, gt, nullval, crs = read_hfa(out)
    assert arr[0, 60:66].tolist() == [60, 61, 62, 1, 2, 3]
    assert arr.shape == (188, 188)  # 3x64 px minus the 2x2 px overlaps


def test_hfa_rejects_bad_magic(tmp_path):
    with pytest.raises(ValueError, match="EHFA_HEADER_TAG"):
        parse_hfa_bytes(b"not an hfa file" + b"\x00" * 64)


def test_hfa_full_circle_ingest(ray_session, tmp_path):
    """export_hfa -> ingest the .img straight back through
    catalog_from_files -> re-mosaic bit-exact (the GeoTIFF/ENVI
    full-circle contract, extended to the fourth driver)."""
    import os

    from moaray.sources.files import catalog_from_files

    layout = Layout("grid3x3", 9, 64)
    path = images_path(layout)
    res = do_mosaic(path, MosaicConfig(layout=layout, blocksize=64,
                                       do_pyramids=False))
    truth = mosaic_array(res.tiles_ds, res.grid)
    loose = tmp_path / "loose"
    os.makedirs(loose)
    export_hfa(res, str(loose / "m.img"))

    cat = catalog_from_files(str(loose), str(tmp_path / "cat"))
    res2 = do_mosaic(cat, MosaicConfig(blocksize=64, do_pyramids=False))
    got = mosaic_array(res2.tiles_ds, res2.grid)
    assert got.dtype == truth.dtype
    assert np.array_equal(got, truth)
    assert tuple(res2.grid.transform) == pytest.approx(
        tuple(res.grid.transform))
    assert res2.grid.crs == res.grid.crs


def test_hfa_sparse_gap_fill(ray_session, tmp_path):
    """Stripes no tile row touched must come back as explicit nullval
    blocks, not file holes of stale zeros."""
    layout = Layout("sparse_gap", 4, 64)
    path = images_path(layout)
    res = do_mosaic(path, MosaicConfig(layout=layout, blocksize=64,
                                       do_pyramids=False))
    truth = mosaic_array(res.tiles_ds, res.grid)
    out = str(tmp_path / "sp.img")
    export_hfa(res, out)
    arr, _, nullval, _ = read_hfa(out)
    assert np.array_equal(arr, truth)
    assert (arr == (nullval if nullval is not None else 0)).any()


def test_hfa_float32_and_nonaligned_size(ray_session, tmp_path):
    """Non-multiple-of-64 raster in a non-default dtype: edge blocks are
    padded on disk and cropped on read."""
    import os

    import pyarrow.parquet as pq

    layout = Layout("grid3x3", 4, 50)  # 2x2 of 50px -> 98x98 output
    tbl = gen_images_table(layout, dtype="float32", explicit_meta=True)
    cat = str(tmp_path / "cat")
    os.makedirs(cat)
    pq.write_table(tbl, os.path.join(cat, "p.parquet"))
    res = do_mosaic(cat, MosaicConfig(layout=layout, blocksize=50,
                                      do_pyramids=False))
    truth = mosaic_array(res.tiles_ds, res.grid)
    out = str(tmp_path / "f.img")
    export_hfa(res, out)
    arr, _, _, _ = read_hfa(out)
    assert arr.dtype == np.float32
    assert arr.shape == truth.shape
    assert np.array_equal(arr, truth)


def test_hfa_rejects_rotated_grid(ray_session):
    layout = Layout("grid3x3", 4, 32)
    res = do_mosaic(images_path(layout),
                    MosaicConfig(layout=layout, blocksize=32,
                                 do_pyramids=False))
    res.grid.transform = (0.0, 1.0, 0.5, 0.0, 0.5, -1.0)
    with pytest.raises(ValueError, match="north-up"):
        export_hfa(res, "/tmp/never.img")


def test_hfa_dictionary_parser():
    """The dictionary grammar drives the reader — exercise counts,
    pointer flags, enums (labels with spaces), and nested 'o' refs."""
    d = _parse_dictionary(
        "{1:dx,1:dy,}Pt,"
        "{0:pcname,1:*oPt,corner,1:e3:no,yes,fft of real-valued data,"
        "flag,4:Ltab,}Rec,."
    )
    assert d["Pt"] == [(1, "", "d", None, "x"), (1, "", "d", None, "y")]
    cnt, ptr, ch, extra, name = d["Rec"][0]
    assert (cnt, ptr, ch, name) == (0, "p", "c", "name")
    assert d["Rec"][1] == (1, "*", "o", "Pt", "corner")
    assert d["Rec"][2][3] == ["no", "yes", "fft of real-valued data"]
    assert d["Rec"][3] == (4, "", "L", None, "tab")
