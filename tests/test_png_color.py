"""Color PNG: RGB/RGBA/palette decode + the lossless color-corpus mosaic.

Color types per the PNG spec (W3C PNG, ISO/IEC 15948): 0 gray, 2 RGB,
3 palette, 4 gray+alpha, 6 RGBA. The reference reads color rasters through
GDAL (any band count); moaray carries ONE color payload shared by an
image's band rows and plane-slices at decode (stages/decode.py), same as
the color-JPEG path — PNG being lossless makes the parity check EXACT
against the pristine per-band ramps.
"""

import struct
import zlib

import numpy as np
import pytest

from moaray import codecs


@pytest.mark.parametrize("dtype", ["uint8", "uint16"])
@pytest.mark.parametrize("channels", [3, 4])
def test_color_png_roundtrip(dtype, channels):
    rng = np.random.RandomState(7)
    peak = 255 if dtype == "uint8" else 65535
    arr = (rng.rand(11, 13, channels) * peak).astype(dtype)
    buf = codecs.png_encode(arr)
    back = codecs.png_decode(buf)
    assert back.dtype == np.dtype(dtype)
    assert back.shape == (11, 13, channels)
    assert np.array_equal(back, arr)


def _foreign_color_png(arr: np.ndarray, filt: int) -> bytes:
    """Hand-filtered 8-bit RGB PNG (filters 1-4): foreign encoders filter
    at the per-pixel byte distance bpp=3."""
    h, w, _ = arr.shape
    data = np.ascontiguousarray(arr).reshape(h, -1)
    bpp, stride = 3, w * 3
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
                pred = a if (pa_ <= pb_ and pa_ <= pc_) else (
                    b if pb_ <= pc_ else c
                )
                filtered[x] = (recon[x] - pred) % 256
        out_rows.append(bytes([filt]) + bytes(filtered.astype(np.uint8)))
        prev = recon
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (
        codecs.PNG_SIG
        + codecs._chunk(b"IHDR", ihdr)
        + codecs._chunk(b"IDAT", zlib.compress(b"".join(out_rows)))
        + codecs._chunk(b"IEND", b"")
    )


@pytest.mark.parametrize("filt", [1, 2, 3, 4])
def test_color_png_decode_foreign_filters(filt):
    rng = np.random.RandomState(13)
    arr = (rng.rand(9, 14, 3) * 255).astype(np.uint8)
    assert np.array_equal(codecs.png_decode(_foreign_color_png(arr, filt)), arr)


def _palette_png(idx: np.ndarray, palette: np.ndarray,
                 trns: bytes | None = None) -> bytes:
    h, w = idx.shape
    rows = b"".join(b"\x00" + bytes(idx[y]) for y in range(h))
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 3, 0, 0, 0)
    buf = codecs.PNG_SIG + codecs._chunk(b"IHDR", ihdr)
    buf += codecs._chunk(b"PLTE", palette.tobytes())
    if trns is not None:
        buf += codecs._chunk(b"tRNS", trns)
    return buf + codecs._chunk(b"IDAT", zlib.compress(rows)) + codecs._chunk(
        b"IEND", b""
    )


def test_palette_png_decode():
    palette = np.array([[255, 0, 0], [0, 255, 0], [0, 0, 255], [7, 8, 9]],
                       dtype=np.uint8)
    idx = np.array([[0, 1, 2], [3, 2, 1]], dtype=np.uint8)
    rgb = codecs.png_decode(_palette_png(idx, palette))
    assert rgb.shape == (2, 3, 3)
    assert np.array_equal(rgb, palette[idx])
    # tRNS -> RGBA; entries past the tRNS length default opaque (spec)
    rgba = codecs.png_decode(_palette_png(idx, palette, trns=bytes([128, 0])))
    assert rgba.shape == (2, 3, 4)
    assert np.array_equal(rgba[..., :3], palette[idx])
    assert rgba[0, 0, 3] == 128 and rgba[0, 1, 3] == 0 and rgba[1, 0, 3] == 255


def test_gray_alpha_png_decode():
    # colortype 4: 2 channels
    rng = np.random.RandomState(5)
    ga = (rng.rand(6, 7, 2) * 255).astype(np.uint8)
    rows = b"".join(
        b"\x00" + bytes(ga.reshape(6, -1)[y]) for y in range(6)
    )
    ihdr = struct.pack(">IIBBBBB", 7, 6, 8, 4, 0, 0, 0)
    buf = (codecs.PNG_SIG + codecs._chunk(b"IHDR", ihdr)
           + codecs._chunk(b"IDAT", zlib.compress(rows))
           + codecs._chunk(b"IEND", b""))
    assert np.array_equal(codecs.png_decode(buf), ga)


def test_color_png_mosaic_per_band_parity(ray_session, tmp_path):
    """A color-PNG catalog (ONE RGB payload shared by an image's three band
    rows) mosaics band-for-band BIT-EXACTLY against the pristine per-band
    planes — the lossless strict form of the color-JPEG PSNR test."""
    import pyarrow.parquet as pq

    from moaray import oracle
    from moaray.geo import make_output_grid
    from moaray.pipelines.mosaic import MosaicConfig, do_mosaic, mosaic_array
    from moaray.testgen import (
        Layout,
        gen_images_table,
        metas_for_layout,
        rgb_pixel_array,
    )
    from dataclasses import replace

    layout = Layout("grid3x3", 9, 64)
    metas = [
        replace(m, dtype="uint8", fmt="png") for m in metas_for_layout(layout)
    ]
    grid = make_output_grid(metas, blocksize=64)
    tbl = gen_images_table(
        layout, ("png",), explicit_meta=True, nbands=3, dtype="uint8",
        color_png=True,
    )
    assert tbl.num_rows == 27
    blobs = tbl.column("bytes").to_pylist()
    assert blobs[0] == blobs[1] == blobs[2]  # shared payload
    path = tmp_path / "imgs"
    path.mkdir()
    pq.write_table(tbl, str(path / "part-00000.parquet"), row_group_size=4)

    res = do_mosaic(str(path), MosaicConfig(layout=layout, blocksize=64))
    for band in range(3):
        clean = {
            m.image_id: rgb_pixel_array(i, layout)[:, :, band]
            for i, m in enumerate(metas)
        }
        truth = oracle.build_mosaic(grid, metas, clean)
        got = mosaic_array(res.tiles_ds, res.grid, band=band)
        assert got.dtype == np.uint8
        assert np.array_equal(got, truth), f"band {band} mismatch"


ADAM7 = ((0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
         (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2))


def _adam7_png(arr: np.ndarray) -> bytes:
    """Interlaced (Adam7) PNG with filter-0 scanlines per pass — a foreign
    encoder shape our own encoder never produces."""
    arr3 = arr[:, :, None] if arr.ndim == 2 else arr
    h, w, ch = arr3.shape
    bd = 16 if arr.dtype == np.uint16 else 8
    ctype = {1: 0, 2: 4, 3: 2, 4: 6}[ch]
    data = bytearray()
    for x0, y0, dx, dy in ADAM7:
        sub = arr3[y0::dy, x0::dx, :]
        if sub.size == 0:
            continue
        wire = np.ascontiguousarray(sub, dtype=">u2" if bd == 16 else np.uint8)
        for r in wire.view(np.uint8).reshape(sub.shape[0], -1):
            data += b"\x00" + r.tobytes()
    ihdr = struct.pack(">IIBBBBB", w, h, bd, ctype, 0, 0, 1)  # interlace=1
    return (codecs.PNG_SIG + codecs._chunk(b"IHDR", ihdr)
            + codecs._chunk(b"IDAT", zlib.compress(bytes(data)))
            + codecs._chunk(b"IEND", b""))


@pytest.mark.parametrize("shape,dt,ch", [
    ((13, 17), "uint8", 1), ((16, 16), "uint16", 1), ((9, 23), "uint8", 3),
    ((12, 7), "uint8", 4), ((1, 1), "uint8", 1), ((3, 5), "uint16", 1),
    ((2, 2), "uint8", 2),
])
def test_adam7_interlaced_decode(shape, dt, ch):
    rng = np.random.RandomState(shape[0] * 31 + shape[1] + ch)
    peak = 255 if dt == "uint8" else 65535
    full = (shape + (ch,)) if ch > 1 else shape
    arr = (rng.rand(*full) * peak).astype(dt)
    assert np.array_equal(codecs.png_decode(_adam7_png(arr)), arr)
