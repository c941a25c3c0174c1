"""Pixel-dtype generality: non-uint16 codecs, NaN-null float mosaics, and
the from-scratch PNG codec (round 2; ref GDALTypeCodeToNumericTypeCode,
/root/reference/moamosaic/mosaic.py:16,354 and the StatsAccumulator NaN
case mosaic.py:762-767)."""

import struct
import zlib

import numpy as np
import pytest

from moaray import codecs, oracle
from moaray.geo import make_output_grid
from moaray.pipelines.mosaic import MosaicConfig, do_mosaic, mosaic_array
from moaray.testgen import (
    Layout,
    band_pixel_array,
    images_path,
    metas_for_layout,
)

ALL_DTYPES = ["uint16", "uint8", "int16", "int32", "uint32", "float32", "float64"]


@pytest.mark.parametrize("dtype", ALL_DTYPES)
@pytest.mark.parametrize("fmt", ["raw16", "z16"])
def test_codec_roundtrip_all_dtypes(dtype, fmt):
    rng = np.random.RandomState(7)
    arr = (rng.rand(23, 31) * 100).astype(dtype)
    buf = codecs.encode(arr, fmt)
    assert codecs.probe_header(buf) == (fmt, 23, 31)
    assert codecs.header_dtype(buf) == np.dtype(dtype)
    back = codecs.decode(buf)
    assert back.dtype == np.dtype(dtype)
    assert np.array_equal(back, arr)
    win = codecs.decode_window(buf, 2, 3, 7, 11)
    assert np.array_equal(win, arr[2:9, 3:14])


def test_codec_nan_roundtrip():
    arr = np.full((9, 9), np.nan, dtype=np.float32)
    arr[2:6, 1:4] = 2.75
    back = codecs.decode(codecs.encode(arr, "z16"))
    assert np.array_equal(np.isnan(back), np.isnan(arr))
    assert np.array_equal(back[2:6, 1:4], arr[2:6, 1:4])


def test_q12_rejects_non_uint16():
    with pytest.raises(ValueError):
        codecs.encode(np.zeros((4, 4), np.float32), "q12")


@pytest.mark.parametrize("dtype", ["uint8", "uint16"])
def test_png_roundtrip(dtype):
    rng = np.random.RandomState(3)
    peak = 255 if dtype == "uint8" else 65535
    arr = (rng.rand(17, 29) * peak).astype(dtype)
    buf = codecs.encode(arr, "png")
    assert buf[:8] == codecs.PNG_SIG
    assert codecs.probe_header(buf) == ("png", 17, 29)
    assert codecs.header_dtype(buf) == np.dtype(dtype)
    back = codecs.decode(buf, "png")
    assert back.dtype == np.dtype(dtype)
    assert np.array_equal(back, arr)


def _foreign_png(arr: np.ndarray, filt: int) -> bytes:
    """Hand-filtered 16-bit grayscale PNG (filters 1-4) to exercise decode of
    foreign encoders (our own encoder always emits filter 0)."""
    h, w = arr.shape
    data = np.ascontiguousarray(arr, dtype=">u2").view(np.uint8).reshape(h, -1)
    bpp, stride = 2, w * 2
    out_rows = []
    prev = np.zeros(stride, dtype=np.int64)
    for y in range(h):
        recon = data[y].astype(np.int64)
        if filt == 1:
            filtered = recon.copy()
            filtered[bpp:] = (recon[bpp:] - recon[:-bpp]) % 256
        elif filt == 2:
            filtered = (recon - prev) % 256
        elif filt == 3:
            left = np.zeros(stride, dtype=np.int64)
            left[bpp:] = recon[:-bpp]
            filtered = (recon - (left + prev) // 2) % 256
        else:  # Paeth
            filtered = np.empty(stride, dtype=np.int64)
            for x in range(stride):
                a = recon[x - bpp] if x >= bpp else 0
                b = prev[x]
                c = prev[x - bpp] if x >= bpp else 0
                p = a + b - c
                pa_, pb_, pc_ = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa_ <= pb_ and pa_ <= pc_) else (b if pb_ <= pc_ else c)
                filtered[x] = (recon[x] - pred) % 256
        out_rows.append(bytes([filt]) + bytes(filtered.astype(np.uint8)))
        prev = recon
    ihdr = struct.pack(">IIBBBBB", w, h, 16, 0, 0, 0, 0)
    return (
        codecs.PNG_SIG
        + codecs._chunk(b"IHDR", ihdr)
        + codecs._chunk(b"IDAT", zlib.compress(b"".join(out_rows)))
        + codecs._chunk(b"IEND", b"")
    )


@pytest.mark.parametrize("filt", [1, 2, 3, 4])
def test_png_decode_foreign_filters(filt):
    rng = np.random.RandomState(11)
    arr = (rng.rand(13, 17) * 65535).astype(np.uint16)
    assert np.array_equal(codecs.png_decode(_foreign_png(arr, filt)), arr)


# ---------------------------------------------------------------------------
# End-to-end mosaics
# ---------------------------------------------------------------------------

LAYOUT = Layout("grid3x3", 9, 96)


def _oracle_mosaic(dtype: str, nullval: float):
    metas = metas_for_layout(LAYOUT)
    for m in metas:
        m.dtype, m.nullval = dtype, nullval
    arrays = {
        m.image_id: band_pixel_array(i, LAYOUT, 0, dtype, nullval)
        for i, m in enumerate(metas)
    }
    grid = make_output_grid(metas, 64)
    return grid, oracle.build_mosaic(grid, metas, arrays)


def test_float32_nan_mosaic_parity(ray_session):
    nv = float("nan")
    path = images_path(
        LAYOUT, fmts=("z16",), explicit_meta=True, dtype="float32", nullval=nv
    )
    cfg = MosaicConfig(layout=LAYOUT, blocksize=64)
    res = do_mosaic(path, cfg)
    assert res.grid.dtype == "float32"
    got = mosaic_array(res.tiles_ds, res.grid)
    grid, exp = _oracle_mosaic("float32", nv)
    assert got.dtype == np.float32
    assert np.array_equal(np.isnan(got), np.isnan(exp))
    assert np.array_equal(got[~np.isnan(got)], exp[~np.isnan(exp)])
    omin, omax, omean, ostd, ocount = oracle.stats(exp, nv)
    s = res.stats
    assert s["count"] == ocount
    assert s["min"] == omin and s["max"] == omax
    assert abs(s["mean"] - omean) < 1e-9
    assert abs(s["stddev"] - ostd) < 1e-9


def test_float32_nan_mosaic_salted_feather_run(ray_session):
    # NaN-null input through the feather kernel: blend must never emit NaN
    # where any source pixel was valid.
    nv = float("nan")
    path = images_path(
        LAYOUT, fmts=("raw16",), explicit_meta=True, dtype="float32", nullval=nv
    )
    cfg = MosaicConfig(layout=LAYOUT, blocksize=64, merge="feather")
    res = do_mosaic(path, cfg)
    got = mosaic_array(res.tiles_ds, res.grid)
    _grid, exp = _oracle_mosaic("float32", nv)
    # same coverage pattern (feather blends values but not validity)
    assert np.array_equal(np.isnan(got), np.isnan(exp))


@pytest.mark.parametrize("dtype", ["uint8", "int16"])
def test_integer_dtype_mosaic_parity(ray_session, dtype):
    path = images_path(
        LAYOUT, fmts=("z16",), explicit_meta=True, dtype=dtype, nullval=0.0
    )
    cfg = MosaicConfig(layout=LAYOUT, blocksize=64)
    res = do_mosaic(path, cfg)
    got = mosaic_array(res.tiles_ds, res.grid)
    _grid, exp = _oracle_mosaic(dtype, 0.0)
    assert got.dtype == np.dtype(dtype)
    assert np.array_equal(got, exp)


def test_png_mosaic_bit_exact_vs_raw(ray_session):
    cfg = MosaicConfig(layout=LAYOUT, blocksize=64)
    g_png = mosaic_array(
        do_mosaic(images_path(LAYOUT, fmts=("png",)), cfg).tiles_ds,
        do_mosaic(images_path(LAYOUT, fmts=("png",)), cfg).grid,
    )
    res_raw = do_mosaic(images_path(LAYOUT, fmts=("raw16",)), cfg)
    g_raw = mosaic_array(res_raw.tiles_ds, res_raw.grid)
    assert np.array_equal(g_png, g_raw)


def test_image_features_png(ray_session):
    import ray

    from moaray.ops.multimodal import image_features

    path = images_path(LAYOUT, fmts=("png",))
    ds = ray.data.read_parquet(path)
    rows = image_features(ds).sort("image_id").take_all()
    assert len(rows) == LAYOUT.n
    assert all(r["nonnull_frac"] > 0.9 for r in rows)


def test_q12_nonzero_nullval_rejected(ray_session):
    # q12's reserved null bucket is 0; a nonzero nullval must refuse loudly.
    path = images_path(
        LAYOUT, fmts=("q12",), explicit_meta=True, dtype="uint16", nullval=7.0
    )
    cfg = MosaicConfig(layout=LAYOUT, blocksize=64)
    with pytest.raises(Exception, match="q12"):
        res = do_mosaic(path, cfg)
        res.tiles_ds.materialize()


def test_mixed_format_catalog_bit_exact(ray_session):
    # the input_hint's fmt column is PER ROW: one catalog mixing raw16,
    # z16 and png payloads (fmt_for cycles the tuple) must mosaic
    # bit-identically to a raw16-only catalog — the decode stage
    # dispatches per row, never per dataset
    cfg = MosaicConfig(layout=LAYOUT, blocksize=64)
    res_mix = do_mosaic(images_path(LAYOUT, fmts=("raw16", "z16", "png")), cfg)
    g_mix = mosaic_array(res_mix.tiles_ds, res_mix.grid)
    res_raw = do_mosaic(images_path(LAYOUT, fmts=("raw16",)), cfg)
    g_raw = mosaic_array(res_raw.tiles_ds, res_raw.grid)
    assert np.array_equal(g_mix, g_raw)


def test_qoi_roundtrips_and_spec_semantics():
    from moaray.qoi import _hash, qoi_decode, qoi_encode

    rng = np.random.RandomState(7)
    g = (rng.rand(37, 53) * 255).astype(np.uint8)
    blob = codecs.encode(g, "qoi")
    assert codecs.probe_header(blob) == ("qoi", 37, 53)
    assert codecs.header_dtype(blob) == np.dtype("uint8")
    assert np.array_equal(codecs.decode(blob), g)
    # RGB and RGBA
    c = (rng.rand(24, 31, 3) * 255).astype(np.uint8)
    assert np.array_equal(qoi_decode(qoi_encode(c)), c)
    c4 = (rng.rand(9, 11, 4) * 255).astype(np.uint8)
    assert np.array_equal(qoi_decode(qoi_encode(c4)), c4)
    # run/diff/luma-heavy content compresses and round-trips
    flat = np.zeros((8, 200, 3), dtype=np.uint8)
    flat[:, 100:, 0] = np.arange(100, dtype=np.uint8)
    blob2 = qoi_encode(flat)
    assert len(blob2) < flat.size // 4
    assert np.array_equal(qoi_decode(blob2), flat)
    # hand-built op stream pins spec semantics independent of our encoder
    import struct

    s = b"qoif" + struct.pack(">IIBB", 2, 2, 3, 0)
    s += bytes((0xFE, 10, 20, 30))            # RGB
    s += bytes((0xC0,))                        # RUN 1
    s += bytes((0x40 | (3 << 4) | (3 << 2) | 3,))  # DIFF +1,+1,+1
    s += bytes((_hash(10, 20, 30, 255),))      # INDEX -> first color
    s += b"\x00" * 7 + b"\x01"
    exp = np.array([[[10, 20, 30], [10, 20, 30]],
                    [[11, 21, 31], [10, 20, 30]]], dtype=np.uint8)
    assert np.array_equal(qoi_decode(s), exp)


def test_qoi_mosaic_bit_exact_vs_raw(ray_session):
    cfg = MosaicConfig(blocksize=64)
    res_q = do_mosaic(
        images_path(LAYOUT, fmts=("qoi",), explicit_meta=True,
                    dtype="uint8"),
        cfg,
    )
    g_qoi = mosaic_array(res_q.tiles_ds, res_q.grid)
    res_raw = do_mosaic(
        images_path(LAYOUT, fmts=("raw16",), explicit_meta=True,
                    dtype="uint8"),
        cfg,
    )
    g_raw = mosaic_array(res_raw.tiles_ds, res_raw.grid)
    assert g_qoi.dtype == np.dtype("uint8")
    assert np.array_equal(g_qoi, g_raw)
