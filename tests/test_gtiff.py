"""Single-file GeoTIFF export (the reference's primary output shape,
openOutfile mosaic.py:604-660): byte-level round-trip + mosaic export."""

import struct

import numpy as np
import pytest

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


def test_deflate_tiled_roundtrip_and_predictor():
    """DEFLATE-compressed tiled GeoTIFF (the reference's default creation
    options COMPRESS=DEFLATE TILED=YES, ref mosaic.py:30-35): bit-exact
    round trip for predictor 1 and 2, and the compressed file is actually
    smaller on smooth content."""
    import os
    import tempfile

    from moaray.sinks.gtiff import read_gtiff_full, write_gtiff_tiled

    gt = (300000.0, 10.0, 0.0, 7000000.0, 0.0, -10.0)
    ramp = np.tile(np.arange(512, dtype=np.uint16), (512, 1))
    with tempfile.TemporaryDirectory() as d:
        p_none = os.path.join(d, "n.tif")
        p_defl = os.path.join(d, "z.tif")
        write_gtiff_tiled(p_none, ramp, gt, nullval=0.0, compress=None,
                          min_overview_size=64)
        write_gtiff_tiled(p_defl, ramp, gt, nullval=0.0, compress="deflate",
                          predictor=2, min_overview_size=64)
        for p in (p_none, p_defl):
            full, ovs, t, nd = read_gtiff_full(p)
            assert np.array_equal(full, ramp)
            assert t == gt and nd == 0.0
            for lvl, ov in zip([4, 8], ovs):
                assert np.array_equal(ov, ramp[lvl // 2 :: lvl, lvl // 2 :: lvl])
        assert os.path.getsize(p_defl) < os.path.getsize(p_none) / 5


def test_deflate_strip_roundtrip_float_nan():
    import os
    import tempfile

    from moaray.sinks.gtiff import read_gtiff, write_gtiff

    gt = (0.0, 1.0, 0.0, 0.0, 0.0, -1.0)
    arr = np.arange(80 * 60, dtype=np.float32).reshape(80, 60) / 7.0
    arr[0, 0] = np.nan
    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "f.tif")
        write_gtiff(p, arr, gt, compress="deflate")
        back, t, _ = read_gtiff(p)
        assert t == gt
        assert np.array_equal(
            np.nan_to_num(back, nan=-1), np.nan_to_num(arr, nan=-1)
        )
    with pytest.raises(ValueError, match="integer-only"):
        write_gtiff("/tmp/never.tif", arr, gt, compress="deflate", predictor=2)


def test_lzw_packbits_roundtrip():
    """LZW (Compression=5, the wild's most common GeoTIFF codec) and
    PackBits (32773): bit-exact strip + tiled round trips, LZW+Predictor=2
    (the classic GDAL combo), and LZW genuinely compresses smooth content."""
    import os
    import tempfile

    from moaray.sinks.gtiff import (
        read_gtiff,
        read_gtiff_full,
        write_gtiff,
        write_gtiff_tiled,
    )

    gt = (300000.0, 10.0, 0.0, 7000000.0, 0.0, -10.0)
    rng = np.random.RandomState(4)
    ramp = np.tile(np.arange(512, dtype=np.uint16), (300, 1))
    noise = (rng.rand(80, 60) * 65535).astype(np.uint16)
    with tempfile.TemporaryDirectory() as d:
        for comp in ("lzw", "packbits"):
            for pred in (1, 2):
                for arr in (ramp, noise):
                    p = os.path.join(d, f"{comp}{pred}{arr.shape[0]}.tif")
                    write_gtiff(p, arr, gt, nullval=0.0,
                                compress=comp, predictor=pred)
                    back, t, nd = read_gtiff(p)
                    assert np.array_equal(back, arr), (comp, pred)
                    assert t == gt and nd == 0.0
        # tiled + overviews
        p_t = os.path.join(d, "t.tif")
        write_gtiff_tiled(p_t, ramp, gt, nullval=0.0, compress="lzw",
                          predictor=2, min_overview_size=64)
        full, ovs, t, nd = read_gtiff_full(p_t)
        assert np.array_equal(full, ramp)
        # compression is real on smooth content
        p_n = os.path.join(d, "n.tif")
        write_gtiff(p_n, ramp, gt, compress=None)
        p_l = os.path.join(d, "l.tif")
        write_gtiff(p_l, ramp, gt, compress="lzw", predictor=2)
        assert os.path.getsize(p_l) < os.path.getsize(p_n) / 5


def test_lzw_codec_boundary_widths():
    # random bytes force 9->12-bit codes and a mid-stream table reset
    from moaray.sinks.gtiff import _lzw_decode, _lzw_encode

    rng = np.random.RandomState(1)
    for raw in (b"", b"Q", b"A" * 4000, rng.bytes(1_200_000),
                bytes(range(256)) * 500):
        assert _lzw_decode(_lzw_encode(raw)) == raw


def test_jpeg_in_tiff_roundtrip():
    """Compression=7 (new-style JPEG-in-TIFF, TTN2) — the standard lossy
    aerial-imagery GeoTIFF: self-contained 8-bit strips, 12-bit (SOF1)
    tiles with overviews, and abbreviated streams merged against a shared
    JPEGTables tag (what GDAL emits)."""
    import os
    import struct
    import tempfile

    from moaray import codecs
    from moaray.jpeg import jpeg_encode
    from moaray.sinks.gtiff import (
        COMPRESSION_JPEG,
        _decode_block,
        read_gtiff,
        read_gtiff_full,
        write_gtiff,
        write_gtiff_tiled,
    )

    gt = (300000.0, 10.0, 0.0, 7000000.0, 0.0, -10.0)
    rr, cc = np.mgrid[0:300, 0:256]
    img8 = ((rr + cc) % 256).astype(np.uint8)
    img12 = ((rr * 13 + cc * 7) % 4096).astype(np.uint16)
    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "j8.tif")
        write_gtiff(p, img8, gt, compress="jpeg")
        back, t, _ = read_gtiff(p)
        assert t == gt and back.dtype == np.uint8
        assert codecs.psnr(img8.astype(float), back.astype(float),
                           peak=255.0) >= 40.0
        p2 = os.path.join(d, "j12.tif")
        write_gtiff_tiled(p2, img12, gt, nullval=0.0, compress="jpeg",
                          min_overview_size=64)
        full, _ovs, t2, _ = read_gtiff_full(p2)
        assert t2 == gt and full.dtype == np.uint16
        assert codecs.psnr(img12.astype(float), full.astype(float),
                           peak=4095.0) >= 40.0
    with pytest.raises(ValueError, match="does not apply"):
        write_gtiff("/tmp/never.tif", img8, gt, compress="jpeg", predictor=2)

    # abbreviated stream: split a self-contained JPEG into a JPEGTables
    # stream (SOI + DQT/DHT + EOI) and a scan stream (SOI + SOF/SOS...)
    buf = jpeg_encode(img8[:32, :32], quality=90)
    segs, pos = [], 2
    while pos + 4 <= len(buf):
        marker = buf[pos + 1]
        if marker == 0xDA:
            rest = buf[pos:]
            break
        (ln,) = struct.unpack_from(">H", buf, pos + 2)
        segs.append((marker, buf[pos : pos + 2 + ln]))
        pos += 2 + ln
    tables = b"\xff\xd8" + b"".join(
        s for m, s in segs if m in (0xDB, 0xC4)) + b"\xff\xd9"
    scan = b"\xff\xd8" + b"".join(
        s for m, s in segs if m not in (0xDB, 0xC4)) + rest
    out = _decode_block(scan, (32, 32), np.dtype("uint8"),
                        COMPRESSION_JPEG, 1, tables)
    assert np.array_equal(out, codecs.decode(buf, "jpeg"))


def test_bigtiff_roundtrip():
    """BigTIFF (version 43, 8-byte offsets — the reference's BIGTIFF
    creation option, required past 4 GB): strip + tiled round trips across
    compressions, format exercised at small size."""
    import os
    import tempfile

    from moaray.sinks.gtiff import (
        read_gtiff,
        read_gtiff_full,
        read_layer_type,
        write_gtiff,
        write_gtiff_tiled,
    )

    gt = (300000.0, 10.0, 0.0, 7000000.0, 0.0, -10.0)
    rng = np.random.RandomState(2)
    arr = (rng.rand(300, 256) * 60000).astype(np.uint16)
    with tempfile.TemporaryDirectory() as d:
        for comp in (None, "deflate", "lzw"):
            p = os.path.join(d, f"s{comp}.tif")
            write_gtiff(p, arr, gt, nullval=0.0, compress=comp,
                        bigtiff=True, layer_type="thematic")
            with open(p, "rb") as f:
                assert f.read(4) == b"II+\x00"  # version 43
            back, t, nd = read_gtiff(p)
            assert np.array_equal(back, arr) and t == gt and nd == 0.0
            assert read_layer_type(p) == "thematic"
            p2 = os.path.join(d, f"t{comp}.tif")
            write_gtiff_tiled(p2, arr, gt, nullval=0.0, compress=comp,
                              bigtiff=True, min_overview_size=64)
            full, ovs, t2, _ = read_gtiff_full(p2)
            assert np.array_equal(full, arr) and t2 == gt and len(ovs) >= 1


def test_multiband_gtiff_roundtrip_and_export(ray_session):
    """Planar multi-band GeoTIFF (SamplesPerPixel=n, PlanarConfiguration=2
    — the reference's numBands output, ref mosaic.py:604-660): write/read
    round trips across compressions, and export_gtiff(band='all') writes
    every mosaic band into one file."""
    import os
    import tempfile

    from moaray import MosaicConfig, do_mosaic
    from moaray.pipelines.mosaic import mosaic_array
    from moaray.sinks.gtiff import read_gtiff, write_gtiff
    from moaray.testgen import Layout, images_path

    gt = (300000.0, 10.0, 0.0, 7000000.0, 0.0, -10.0)
    rng = np.random.RandomState(4)
    with tempfile.TemporaryDirectory() as d:
        for comp in (None, "deflate", "lzw"):
            arr = (rng.rand(3, 70, 50) * 60000).astype(np.uint16)
            p = os.path.join(d, f"mb{comp}.tif")
            write_gtiff(p, arr, gt, nullval=0.0, compress=comp,
                        predictor=2 if comp else 1)
            back, t, nd = read_gtiff(p)
            assert back.shape == (3, 70, 50)
            assert np.array_equal(back, arr) and t == gt

        layout = Layout("grid3x3", 9, 64)
        path = images_path(layout, nbands=2, explicit_meta=True)
        res = do_mosaic(path, MosaicConfig(layout=layout, blocksize=64))
        out = os.path.join(d, "mosaic_mb.tif")
        from moaray.sinks.gtiff import export_gtiff

        export_gtiff(res, out, band="all", compress="deflate")
        back, t, _ = read_gtiff(out)
        assert back.ndim == 3 and back.shape[0] == 2
        for b in range(2):
            assert np.array_equal(
                back[b], mosaic_array(res.tiles_ds, res.grid, band=b)
            )


def test_streaming_writers_match_batch_writers(tmp_path):
    """Streaming strip/tiled writers (data first, IFD at end) read back
    identically to the batch writers, fed in awkward slab sizes that
    straddle strip and tile boundaries."""
    from moaray.sinks.gtiff import (
        StreamingGtiffTiledWriter,
        StreamingGtiffWriter,
        read_gtiff,
        read_gtiff_full,
        read_layer_type,
    )

    gt = (300000.0, 10.0, 0.0, 7000000.0, 0.0, -10.0)
    rng = np.random.RandomState(9)
    arr = (rng.rand(701, 530) * 60000).astype(np.uint16)
    slab_sizes = [1, 63, 64, 100, 256, 7, 210]  # sums to 701

    for bigtiff in (False, True):
        for comp in (None, "deflate", "lzw"):
            p = str(tmp_path / f"s_{bigtiff}_{comp}.tif")
            w = StreamingGtiffWriter(
                p, 701, 530, np.uint16, gt, "EPSG:32756", 0.0,
                rows_per_strip=96, compress=comp,
                predictor=2 if comp else 1, layer_type="athematic",
                bigtiff=bigtiff,
            )
            r = 0
            for k in slab_sizes:
                w.write_rows(arr[r : r + k])
                r += k
            w.close()
            back, t, nd = read_gtiff(p)
            assert np.array_equal(back, arr) and t == gt and nd == 0.0
            assert read_layer_type(p) == "athematic"

        pt = str(tmp_path / f"t_{bigtiff}.tif")
        wt = StreamingGtiffTiledWriter(
            pt, 701, 530, np.uint16, gt, "EPSG:32756", 0.0,
            tile=256, min_overview_size=128, compress="deflate",
            predictor=2, bigtiff=bigtiff,
        )
        r = 0
        for k in slab_sizes:
            wt.write_rows(arr[r : r + k])
            r += k
        levels = wt.close()
        full, ovs, t2, nd2 = read_gtiff_full(pt)
        assert np.array_equal(full, arr) and t2 == gt and nd2 == 0.0
        assert levels == [4] and len(ovs) == 1
        assert np.array_equal(ovs[0], arr[2::4, 2::4])


def test_streaming_multiband_planar(tmp_path):
    from moaray.sinks.gtiff import StreamingGtiffWriter, read_gtiff

    gt = (0.0, 1.0, 0.0, 0.0, 0.0, -1.0)
    rng = np.random.RandomState(3)
    arr = (rng.rand(3, 130, 77) * 60000).astype(np.uint16)
    p = str(tmp_path / "mb_stream.tif")
    w = StreamingGtiffWriter(p, 130, 77, np.uint16, gt, nbands=3,
                             rows_per_strip=48, compress="deflate",
                             predictor=2)
    # interleave bands out of order on purpose — offsets are per band
    for r in range(0, 130, 13):
        for b in (2, 0, 1):
            w.write_rows(arr[b, r : r + 13], band=b)
    w.close()
    back, t, _ = read_gtiff(p)
    assert back.shape == (3, 130, 77) and np.array_equal(back, arr)


def test_streaming_multiband_tiled_planar(tmp_path):
    """Tiled PlanarConfig=2 multi-band with embedded overviews: bands are
    streamed sequentially (plane-major tile order, TIFF 6.0 §planar) and
    every overview level strides each band independently."""
    from moaray.sinks.gtiff import StreamingGtiffTiledWriter, read_gtiff_full

    gt = (300000.0, 10.0, 0.0, 7000000.0, 0.0, -10.0)
    rng = np.random.RandomState(11)
    arr = (rng.rand(3, 701, 530) * 60000).astype(np.uint16)
    slab_sizes = [1, 63, 64, 100, 256, 7, 210]  # sums to 701
    for bigtiff in (False, True):
        p = str(tmp_path / f"mbt_{bigtiff}.tif")
        w = StreamingGtiffTiledWriter(
            p, 701, 530, np.uint16, gt, "EPSG:32756", 0.0,
            tile=256, min_overview_size=128, compress="deflate",
            predictor=2, bigtiff=bigtiff, nbands=3,
        )
        for b in range(3):
            r = 0
            for k in slab_sizes:
                w.write_rows(arr[b, r : r + k])
                r += k
            w.end_band()
        levels = w.close()
        full, ovs, t2, nd2 = read_gtiff_full(p)
        assert full.shape == (3, 701, 530) and np.array_equal(full, arr)
        assert t2 == gt and nd2 == 0.0
        assert levels == [4] and len(ovs) == 1
        assert np.array_equal(ovs[0], arr[:, 2::4, 2::4])


def test_export_gtiff_multiband_tiled(ray_session, tmp_path):
    """export_gtiff(band='all', tiled=True): one planar tiled file with
    overview IFDs, every band matching the per-band canvas."""
    from moaray import MosaicConfig, do_mosaic
    from moaray.pipelines.mosaic import mosaic_array
    from moaray.sinks.gtiff import export_gtiff, read_gtiff_full
    from moaray.testgen import Layout, images_path

    layout = Layout("grid3x3", 9, 64)
    path = images_path(layout, nbands=2, explicit_meta=True)
    res = do_mosaic(path, MosaicConfig(layout=layout, blocksize=64))
    out = str(tmp_path / "mosaic_mbt.tif")
    export_gtiff(res, out, band="all", tiled=True, min_overview_size=32,
                 compress="deflate")
    full, ovs, t, _ = read_gtiff_full(out)
    assert full.ndim == 3 and full.shape[0] == 2 and len(ovs) >= 1
    for b in range(2):
        canvas = mosaic_array(res.tiles_ds, res.grid, band=b)
        assert np.array_equal(full[b], canvas)
        assert np.array_equal(ovs[0][b], canvas[2::4, 2::4])


def test_export_gtiff_driver_memory_is_bounded(tmp_path):
    """The export path must never build the full canvas on the driver:
    feeding a 64 MB-canvas image through the streaming writer in slabs
    keeps Python-side peak allocation far below the canvas size."""
    import tracemalloc

    from moaray.sinks.gtiff import StreamingGtiffTiledWriter, read_gtiff

    nrows = ncols = 5760  # ~64 MB uint16 canvas (multiple of the slab height)
    gt = (0.0, 1.0, 0.0, 0.0, 0.0, -1.0)
    p = str(tmp_path / "big_stream.tif")
    row_vals = (np.arange(ncols, dtype=np.uint16) % 251) + 1
    tracemalloc.start()
    w = StreamingGtiffTiledWriter(p, nrows, ncols, np.uint16, gt,
                                  nullval=0.0, tile=256,
                                  min_overview_size=512,
                                  compress="deflate", predictor=2)
    slab = np.tile(row_vals, (64, 1))
    for _r in range(0, nrows, 64):
        w.write_rows(slab)
    w.close()
    _cur, peak = tracemalloc.get_traced_memory()
    tracemalloc.stop()
    canvas_bytes = nrows * ncols * 2
    assert peak < canvas_bytes // 4, (peak, canvas_bytes)
    arr, _t, _nd = read_gtiff(p)
    assert arr.shape == (nrows, ncols)
    assert np.array_equal(arr[17], row_vals)


def test_export_gtiff_streams_without_mosaic_array(tmp_path, ray_session,
                                                   monkeypatch):
    """export_gtiff must not fall back to the full-canvas helper."""
    import moaray.pipelines.mosaic as mz

    layout = Layout("grid3x3", 9, 64)
    _grid, truth = oracle_mosaic(layout)
    res = do_mosaic(
        images_path(layout),
        MosaicConfig(layout=layout, blocksize=64, do_pyramids=False),
    )

    def boom(*_a, **_k):
        raise AssertionError("export_gtiff materialized the full canvas")

    monkeypatch.setattr(mz, "mosaic_array", boom)
    p = str(tmp_path / "stream.tif")
    export_gtiff(res, p, tiled=True, min_overview_size=32)
    from moaray.sinks.gtiff import read_gtiff_full

    full, ovs, _t, _nd = read_gtiff_full(p)
    assert (full == truth).all()
    assert len(ovs) >= 1
    assert np.array_equal(ovs[0], truth[2::4, 2::4])


def test_geokeys_carry_epsg_code(tmp_path):
    """GeoKey directory round trip: EPSG CRSs write Geographic/
    ProjectedCSTypeGeoKey (what GDAL reads as the SRS) across all three
    writers; non-EPSG names keep the minimal directory; file ingest
    prefers the file's own GeoKeys over the directory default."""
    from moaray.sinks.gtiff import (
        StreamingGtiffWriter,
        crs_from_geokeys,
        write_gtiff,
        write_gtiff_tiled,
    )

    gt = (300000.0, 10.0, 0.0, 7000000.0, 0.0, -10.0)
    arr = np.arange(64 * 48, dtype=np.uint16).reshape(64, 48)
    for crs, expect in (
        ("EPSG:32756", "EPSG:32756"),   # projected -> 3072
        ("EPSG:4326", "EPSG:4326"),     # geographic -> 2048
        ("EPSG:3413", "EPSG:3413"),     # polar stereo
        ("AFFINE:0,1,0,0,0,1", None),   # engine-internal: minimal dir
        ("", None),
    ):
        p = str(tmp_path / "k.tif")
        write_gtiff(p, arr, gt, crs=crs, nullval=0.0)
        with open(p, "rb") as f:
            assert crs_from_geokeys(f.read()) == expect, crs
        p2 = str(tmp_path / "k2.tif")
        write_gtiff_tiled(p2, arr, gt, crs=crs, nullval=0.0,
                          min_overview_size=64)
        with open(p2, "rb") as f:
            assert crs_from_geokeys(f.read()) == expect, crs
        p3 = str(tmp_path / "k3.tif")
        w = StreamingGtiffWriter(p3, 64, 48, np.uint16, gt, crs, 0.0)
        w.write_rows(arr)
        w.close()
        with open(p3, "rb") as f:
            assert crs_from_geokeys(f.read()) == expect, crs


def test_tif_ingest_reads_geokey_crs(ray_session, tmp_path):
    """export_gtiff -> loose-file ingest: the catalog row's crs comes from
    the file's GeoKeys, not the EPSG:32756 directory default."""
    import os

    from moaray.sinks.gtiff import write_gtiff
    from moaray.sources.files import catalog_from_files

    gt = (15.0, 0.01, 0.0, 78.5, 0.0, -0.002)
    arr = (np.arange(32 * 32) % 251).astype(np.uint16).reshape(32, 32) + 1
    d = tmp_path / "loose"
    d.mkdir()
    write_gtiff(str(d / "a.tif"), arr, gt, crs="EPSG:3413", nullval=0.0)
    out = str(tmp_path / "cat.parquet")
    catalog_from_files(str(d), out)
    import pyarrow.parquet as pq

    tbl = pq.read_table(out)
    assert tbl["crs"].to_pylist() == ["EPSG:3413"]


def test_export_all_bands_without_stats(ray_session, tmp_path):
    """band='all' with do_stats=False: bands come from the grid's nbands
    instead of crashing on a None stats_by_band."""
    from moaray import MosaicConfig, do_mosaic
    from moaray.pipelines.mosaic import mosaic_array
    from moaray.testgen import Layout, images_path

    layout = Layout("grid3x3", 9, 64)
    path = images_path(layout, nbands=2, explicit_meta=True)
    res = do_mosaic(path, MosaicConfig(layout=layout, blocksize=64,
                                       do_pyramids=False, do_stats=False))
    p = str(tmp_path / "nostats.tif")
    export_gtiff(res, p, band="all", compress="deflate")
    back, _t, _nd = read_gtiff(p)
    assert back.ndim == 3 and back.shape[0] == 2
    for b in range(2):
        assert np.array_equal(
            back[b], mosaic_array(res.tiles_ds, res.grid, band=b)
        )
