"""GIF (87a/89a): lossless palette round trips, interlace, animations,
LZW width growth, codecs dispatch, frame sampling."""

import numpy as np
import pyarrow as pa
import pytest

from moaray import codecs
from moaray.gif import gif_decode, gif_encode, gif_frames, gif_probe


_PALETTE = np.random.RandomState(99).randint(0, 256, (200, 3)).astype(np.uint8)


def _pal_img(shape, n_colors=200, seed=0):
    rng = np.random.RandomState(seed)
    return _PALETTE[rng.randint(0, n_colors, shape)]


def test_still_roundtrip():
    img = _pal_img((33, 47))
    buf = gif_encode(img)
    assert gif_probe(buf) == (33, 47)
    assert np.array_equal(gif_decode(buf), img)


def test_full_palette_and_width_growth():
    # 256 colors + a large image: LZW grows through every code width and
    # resets its table mid-stream
    img = np.zeros((16, 16, 3), np.uint8)
    img[..., 0] = np.arange(256, dtype=np.uint8).reshape(16, 16)
    assert np.array_equal(gif_decode(gif_encode(img)), img)
    big = _pal_img((200, 300), seed=3)
    assert np.array_equal(gif_decode(gif_encode(big)), big)


def test_interlaced_roundtrip():
    img = _pal_img((37, 23), seed=5)
    assert np.array_equal(gif_decode(gif_encode(img, interlace=True)), img)


def test_animation_frames_and_delays():
    frames = [_pal_img((20, 24), seed=s) for s in range(5)]
    buf = gif_encode(frames, delays_cs=[3, 5, 7, 9, 11])
    got = list(gif_frames(buf))
    assert len(got) == 5
    for (fr, d), exp, want_d in zip(got, frames, (3, 5, 7, 9, 11)):
        assert d == want_d
        assert np.array_equal(fr, exp)


def test_codecs_dispatch():
    img = _pal_img((12, 18), seed=7)
    buf = gif_encode(img)
    assert codecs.probe_header(buf) == ("gif", 12, 18)
    assert codecs.header_dtype(buf) == np.dtype("uint8")
    out = codecs.decode(buf, "gif")
    assert np.array_equal(out, img)
    with pytest.raises(ValueError, match="payload is GIF"):
        codecs.decode(buf, "png")
    with pytest.raises(ValueError, match="not a GIF"):
        gif_decode(b"NOPE")


def test_frame_sample_gif():
    from moaray.ops.multimodal import FrameSample

    frames = [_pal_img((16, 20), seed=s) for s in range(9)]
    buf = gif_encode(frames)
    batch = pa.table({"video_id": ["g0"], "bytes": [buf], "fmt": ["gif"]})
    out = FrameSample(stride=3)(batch)
    assert out.num_rows == 3
    assert out["frame_idx"].to_pylist() == [0, 3, 6]
    assert out["fmt"].to_pylist() == ["raw16"] * 3
    for row, k in zip(out["bytes"].to_pylist(), (0, 3, 6)):
        plane = codecs.decode(row, "raw16")
        assert np.array_equal(plane, frames[k][:, :, 0])


def test_transparency_compositing():
    # two full-frame images; frame 2 declares palette index T transparent:
    # its T-pixels must keep frame 1's values (and output grows an alpha
    # channel because a transparent index exists somewhere in the stream)
    f1 = _pal_img((10, 12), seed=1)
    f2 = _pal_img((10, 12), seed=2)
    buf = bytearray(gif_encode([f1, f2]))
    # find the SECOND graphic-control extension and set transparency
    first = buf.find(b"\x21\xf9")
    second = buf.find(b"\x21\xf9", first + 2)
    assert second > 0
    # GCE layout: 21 F9 04 packed delay(2) transparent_idx 00
    t_idx = 7
    buf[second + 3] |= 0x01          # transparent color flag
    buf[second + 6] = t_idx          # transparent index
    frames = list(gif_frames(bytes(buf)))
    assert len(frames) == 2
    a1, _ = frames[0]
    a2, _ = frames[1]
    assert a1.shape[2] == 4 and a2.shape[2] == 4  # alpha channel appears
    # recover frame-2's palette indices to locate its transparent pixels
    # transparent pixels of frame 2 = where composited a2 still equals a1
    from moaray.gif import gif_decode  # noqa: F401
    stored = np.unique(
        np.concatenate([f1.reshape(-1, 3), f2.reshape(-1, 3)]), axis=0
    )  # the encoder writes the np.unique-sorted palette
    trans_color = stored[t_idx]
    was_trans = (f2 == trans_color).all(axis=2)
    assert was_trans.any(), "fixture must contain the transparent color"
    assert np.array_equal(a2[..., :3][was_trans], a1[..., :3][was_trans])
    assert np.array_equal(a2[..., :3][~was_trans], f2[~was_trans])


def test_gce_scope_is_one_block():
    """GIF89a: a graphic-control extension governs exactly ONE rendering
    block. In a foreign animation where frame 2 declares transparency and
    frame 3 carries NO GCE of its own, frame 3 must composite fully
    opaque — it must not inherit frame 2's transparent index."""
    f1 = _pal_img((8, 10), seed=1)
    f2 = _pal_img((8, 10), seed=2)
    f3 = _pal_img((8, 10), seed=3)
    buf = bytearray(gif_encode([f1, f2, f3]))
    g1 = buf.find(b"\x21\xf9")
    g2 = buf.find(b"\x21\xf9", g1 + 2)
    g3 = buf.find(b"\x21\xf9", g2 + 2)
    assert g3 > g2 > g1 > 0
    # pick a transparent index whose color actually occurs in frame 3
    stored = np.unique(
        np.concatenate([f.reshape(-1, 3) for f in (f1, f2, f3)]), axis=0
    )
    t_idx = int(
        np.nonzero((stored == f3[0, 0]).all(axis=1))[0][0]
    )
    assert t_idx < 256
    buf[g2 + 3] |= 0x01   # frame 2: transparent color flag
    buf[g2 + 6] = t_idx
    del buf[g3 : g3 + 8]  # frame 3: strip its GCE entirely
    frames = list(gif_frames(bytes(buf)))
    assert len(frames) == 3
    a3 = frames[2][0]
    trans_color = stored[t_idx]
    hits = (f3 == trans_color).all(axis=2)
    assert hits.any(), "fixture must contain the would-be transparent color"
    # every frame-3 pixel lands, including those matching the old index
    assert np.array_equal(a3[..., :3], f3)
    # and a GCE-less frame's delay resets to 0 rather than inheriting
    assert frames[2][1] == 0


# --- BMP (lives in codecs.py; tested here with the other legacy formats) ---

def test_bmp_roundtrip_and_dispatch():
    from moaray.codecs import bmp_decode, bmp_encode

    rng = np.random.RandomState(6)
    rgb = (rng.rand(13, 17, 3) * 255).astype(np.uint8)
    buf = bmp_encode(rgb)
    assert np.array_equal(bmp_decode(buf), rgb)
    assert codecs.probe_header(buf) == ("bmp", 13, 17)
    assert codecs.header_dtype(buf) == np.dtype("uint8")
    assert np.array_equal(codecs.decode(buf, "bmp"), rgb)
    with pytest.raises(ValueError, match="not a BMP"):
        bmp_decode(b"XXXX")


def test_bmp_rle8_palette_and_topdown():
    import struct

    from moaray.codecs import bmp_decode

    # 8-bit palette + RLE8, bottom-up
    pal = np.zeros((256, 4), np.uint8)
    pal[:, 2] = np.arange(256)  # red channel = index
    rle = bytes([3, 3, 1, 7, 0, 0, 2, 9, 2, 2, 0, 1])
    hdr = b"BM" + struct.pack("<IHHI", 0, 0, 0, 14 + 40 + 1024)
    info = struct.pack("<IiiHHIIiiII", 40, 4, 2, 1, 8, 1, len(rle),
                       0, 0, 256, 0)
    out = bmp_decode(hdr + info + pal.tobytes() + rle)
    exp_idx = np.array([[3, 3, 3, 7], [9, 9, 2, 2]], np.uint8)[::-1]
    assert np.array_equal(out[..., 0], exp_idx)
    assert (out[..., 1:] == 0).all()
    # 24-bit top-down (negative height)
    rng = np.random.RandomState(8)
    rgb = (rng.rand(4, 5, 3) * 255).astype(np.uint8)
    row_len = (5 * 3 + 3) & ~3
    body = b"".join(
        np.ascontiguousarray(rgb[y, :, ::-1]).tobytes().ljust(row_len, b"\0")
        for y in range(4)  # top-down order
    )
    hdr = b"BM" + struct.pack("<IHHI", 0, 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, 5, -4, 1, 24, 0, len(body),
                       0, 0, 0, 0)
    assert np.array_equal(bmp_decode(hdr + info + body), rgb)


# --- netpbm + TGA (codecs.py; grouped with the other legacy formats) ------

def test_pnm_roundtrip_and_dispatch():
    from moaray.codecs import pnm_decode, pnm_encode

    rng = np.random.RandomState(3)
    for arr in ((rng.rand(9, 13) * 255).astype(np.uint8),
                (rng.rand(7, 5) * 65535).astype(np.uint16),
                (rng.rand(6, 8, 3) * 255).astype(np.uint8)):
        buf = pnm_encode(arr)
        assert np.array_equal(pnm_decode(buf), arr)
        assert codecs.probe_header(buf)[0] == "pnm"
        assert np.array_equal(codecs.decode(buf, "pnm"), arr)
    # comments + ascii whitespace in the header
    buf = b"P5\n# comment line\n3 2\n255\n" + bytes(range(6))
    assert np.array_equal(
        pnm_decode(buf), np.arange(6, dtype=np.uint8).reshape(2, 3)
    )


def test_tga_decode_paths():
    from moaray.codecs import tga_decode

    rng = np.random.RandomState(4)
    rgb = (rng.rand(4, 5, 3) * 255).astype(np.uint8)
    hdr = (bytes([0, 0, 2]) + b"\x00" * 9
           + (5).to_bytes(2, "little") + (4).to_bytes(2, "little")
           + bytes([24, 0]))  # uncompressed 24-bit, bottom-up
    assert np.array_equal(
        tga_decode(hdr + rgb[::-1][:, :, ::-1].tobytes()), rgb
    )
    # RLE 32-bit top-down: run of 3 + raw of 1
    hdr = (bytes([0, 0, 10]) + b"\x00" * 9
           + (2).to_bytes(2, "little") + (2).to_bytes(2, "little")
           + bytes([32, 0x20]))
    body = bytes([0x82, 30, 20, 10, 255, 0x00, 3, 2, 1, 4])
    out = tga_decode(hdr + body)
    exp = np.array([[10, 20, 30, 255]] * 3 + [[1, 2, 3, 4]],
                   np.uint8).reshape(2, 2, 4)
    assert np.array_equal(out, exp)
    # explicit-fmt dispatch (no magic bytes in TGA)
    assert np.array_equal(codecs.decode(hdr + body, "tga"), exp)
    with pytest.raises(NotImplementedError):
        tga_decode(bytes([0, 1, 1]) + b"\x00" * 15)  # colormapped gated
