"""Baseline JPEG (DCT, grayscale + YCbCr color, 8-bit) — from scratch per
ITU-T T.81.

The sandbox ships no image libraries, and the reference reads any
GDAL-supported raster — including JPEG/JPEG-in-TIFF, the format every real
image+caption corpus uses (ref /root/reference/moamosaic/mosaic.py:16 opens
arbitrary GDAL datasets). This module closes that gap without Pillow or
libjpeg: a conformant baseline sequential encoder + decoder built only from
the public JPEG specification (ITU-T T.81 / ISO 10918-1) — marker segments,
Annex-K quantization + Huffman tables, zigzag, 8x8 DCT, MCU-interleaved
multi-component scans with arbitrary divisible sampling factors (4:4:4,
4:2:0, 4:2:2), JFIF/BT.601 YCbCr color conversion.

Scope (honest gates, consistent with the PNG/WAV codecs):
- Baseline sequential only; progressive and arithmetic-coded streams
  raise NotImplementedError. 1-component (grayscale) and 3-component
  (YCbCr) interleaved scans decode; the encoder emits grayscale for 2-D
  input and YCbCr 4:2:0 (or 4:4:4) for (h, w, 3) input.
- 8-bit precision (JPEG baseline is 8-bit by definition); the engine's
  uint16 rasters go through PNG/z16 for lossless or q12 for lossy-uint16.
- Restart markers (DRI/RSTn) round-trip (restart_interval counts MCUs,
  DC predictors reset per component).

Encoder: vectorized 8x8 forward DCT over ALL blocks at once (einsum with a
precomputed basis), IJG-style quality scaling of the Annex K.1/K.2 tables,
standard K.3 Huffman tables; chroma subsampling by 2x2 box average. Decoder:
DQT/DHT/SOF0/SOS parsing with canonical Huffman reconstruction (tables come
from the stream, so foreign baseline JPEGs decode too), byte-unstuffing,
MCU-ordered entropy decode into raster-ordered per-component planes,
vectorized dequantize + inverse DCT, chroma upsample by pixel replication.
"""

from __future__ import annotations

import struct

import numpy as np

SOI = b"\xff\xd8"

# Annex K.1 luminance quantization table, in natural (row-major) order.
_K1_LUMA = np.array(
    [
        16, 11, 10, 16, 24, 40, 51, 61,
        12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56,
        14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77,
        24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101,
        72, 92, 95, 98, 112, 100, 103, 99,
    ],
    dtype=np.int64,
)

# Zigzag scan order: _ZIGZAG[i] = natural index of the i-th zigzag element.
_ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10,
        17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34,
        27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36,
        29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46,
        53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)
_UNZIGZAG = np.argsort(_ZIGZAG)

# Annex K.3.1 / K.3.2: standard luminance Huffman tables.
# BITS = count of codes per length 1..16; VALS = symbols in code order.
_DC_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_DC_VALS = list(range(12))
_AC_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
_AC_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]


# 12-bit (SOF1 extended sequential — the aerial/medical precision) needs
# DC size categories 0..15 and AC sizes 1..14 (T.81 Table F.1), which the
# Annex-K 8-bit tables do not cover: uniform-length canonical tables.
_DC12_VALS = list(range(16))
_DC12_BITS = [0, 0, 0, 0, 16] + [0] * 11
_AC12_VALS = sorted(
    [0x00, 0xF0] + [(r << 4) | s for r in range(16) for s in range(1, 15)]
)
_AC12_BITS = [0] * 7 + [len(_AC12_VALS)] + [0] * 8


# Annex K.2 chrominance quantization table, natural order.
_K2_CHROMA = np.array(
    [
        17, 18, 24, 47, 99, 99, 99, 99,
        18, 21, 26, 66, 99, 99, 99, 99,
        24, 26, 56, 99, 99, 99, 99, 99,
        47, 66, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
    ],
    dtype=np.int64,
)

# Annex K.3.3 / K.3.4: standard chrominance Huffman tables.
_DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
_DC_CHROMA_VALS = list(range(12))
_AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
_AC_CHROMA_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
    0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
    0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
    0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
    0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
    0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
    0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
    0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
    0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
    0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
    0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]


def _dct_basis() -> np.ndarray:
    """Orthonormal 8-point DCT-II basis matrix C: coef = C @ block @ C.T."""
    x = np.arange(8)
    c = np.cos((2 * x[None, :] + 1) * x[:, None] * np.pi / 16)
    c[0] *= 1 / np.sqrt(2)
    return c * 0.5


_C = _dct_basis()


def _quality_table(quality: int, base: np.ndarray = _K1_LUMA) -> np.ndarray:
    """IJG-style quality scaling of an Annex-K base table (1..100)."""
    quality = min(max(int(quality), 1), 100)
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    tbl = (base * scale + 50) // 100
    return np.clip(tbl, 1, 255).astype(np.int64)


def _canonical_codes(bits: list[int], vals: list[int]):
    """(symbol -> (code, length)) per the canonical construction (C.2)."""
    out = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _magnitude(v: int) -> tuple[int, int]:
    """(category, appended-bit value) for a DC diff / AC coefficient."""
    if v == 0:
        return 0, 0
    a = abs(v)
    size = a.bit_length()
    return size, (v if v > 0 else v + (1 << size) - 1)


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, length: int):
        acc = (self.acc << length) | (value & ((1 << length) - 1))
        nbits = self.nbits + length
        out = self.out
        while nbits >= 8:
            nbits -= 8
            byte = (acc >> nbits) & 0xFF
            out.append(byte)
            if byte == 0xFF:  # byte stuffing (B.1.1.5)
                out.append(0x00)
        # truncate the accumulator — an unbounded big int turns every
        # subsequent shift into O(total bits written)
        self.acc = acc & ((1 << nbits) - 1)
        self.nbits = nbits

    def flush(self):
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # 1-fill padding


def _seg(marker: int, payload: bytes) -> bytes:
    return struct.pack(">BBH", 0xFF, marker, len(payload) + 2) + payload


def _huff_payload(tclass: int, tid: int, bits, vals) -> bytes:
    return bytes([tclass << 4 | tid] + bits + vals)


def _rgb_to_ycbcr(rgb: np.ndarray):
    """JFIF / BT.601 full-range RGB -> (Y, Cb, Cr) float64 planes."""
    r = rgb[..., 0].astype(np.float64)
    g = rgb[..., 1].astype(np.float64)
    b = rgb[..., 2].astype(np.float64)
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
    cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
    return y, cb, cr


def _ycbcr_to_rgb(y: np.ndarray, cb: np.ndarray, cr: np.ndarray) -> np.ndarray:
    """Inverse JFIF conversion to a clipped (h, w, 3) uint8 array."""
    cb = cb - 128.0
    cr = cr - 128.0
    rgb = np.empty(y.shape + (3,), dtype=np.float64)
    rgb[..., 0] = y + 1.402 * cr
    rgb[..., 1] = y - 0.344136 * cb - 0.714136 * cr
    rgb[..., 2] = y + 1.772 * cb
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


def _box_down2(plane: np.ndarray) -> np.ndarray:
    """2x2 box-average downsample (edge-replicated to even dims first)."""
    h, w = plane.shape
    ph, pw = -(-h // 2) * 2, -(-w // 2) * 2
    p = np.pad(plane, ((0, ph - h), (0, pw - w)), mode="edge")
    return (p[0::2, 0::2] + p[0::2, 1::2] + p[1::2, 0::2] + p[1::2, 1::2]) / 4.0


def _mcu_order(mcuy: int, mcux: int, v: int, h: int) -> np.ndarray:
    """Raster-ordered block index for each stream position of one component.

    The entropy stream visits MCUs in raster order and, within each MCU,
    the component's v x h blocks in raster order (A.2.3); element i of the
    result is the index into the component's plane-raster block array."""
    bh = mcux * h
    my, mx = np.meshgrid(np.arange(mcuy), np.arange(mcux), indexing="ij")
    base = (
        (my[..., None, None] * v + np.arange(v)[None, None, :, None]) * bh
        + mx[..., None, None] * h
        + np.arange(h)[None, None, None, :]
    )
    return base.reshape(-1)


def _plane_to_zz(plane: np.ndarray, bv: int, bh: int, q: np.ndarray):
    """Pad a float64 plane to (bv*8, bh*8), forward-DCT every block at once,
    quantize, zigzag; returns (zz, sizes, bits_mat) int64 matrices."""
    p = np.pad(
        plane,
        ((0, bv * 8 - plane.shape[0]), (0, bh * 8 - plane.shape[1])),
        mode="edge",
    )
    blocks = (
        p.reshape(bv, 8, bh, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8) - 128.0
    )
    coef = np.einsum("ux,nxy,vy->nuv", _C, blocks, _C)
    qcoef = np.round(coef / q.reshape(8, 8)).astype(np.int64)
    zz = qcoef.reshape(-1, 64)[:, _ZIGZAG]
    absz = np.abs(zz)
    sizes = np.where(
        absz == 0, 0, np.floor(np.log2(np.maximum(absz, 1))).astype(np.int64) + 1
    )
    bits_mat = np.where(zz >= 0, zz, zz + (1 << sizes) - 1)
    return zz, sizes, bits_mat


def _encode_block(bw, zz, sizes, bits_mat, bi, dc_codes, ac_codes, prev_dc):
    """Huffman-encode one block row; returns the block's DC for prediction."""
    write = bw.write
    dc = int(zz[bi, 0])
    size, dbits = _magnitude(dc - prev_dc)
    code, length = dc_codes[size]
    write(code, length)
    if size:
        write(dbits, size)
    nz = np.nonzero(zz[bi, 1:])[0] + 1
    zrl_code, zrl_len = ac_codes[0xF0]
    prev = 0
    for i in nz:
        run = int(i) - prev - 1
        while run > 15:
            write(zrl_code, zrl_len)
            run -= 16
        s = int(sizes[bi, i])
        code, length = ac_codes[(run << 4) | s]
        write(code, length)
        write(int(bits_mat[bi, i]), s)
        prev = int(i)
    if prev < 63:
        code, length = ac_codes[0x00]
        write(code, length)
    return dc


def _jpeg_encode_color(
    arr: np.ndarray,
    quality: int,
    restart_interval: int,
    subsampling: str,
) -> bytes:
    """Encode an (h, w, 3) uint8 RGB array as a baseline YCbCr JFIF stream
    (components Y=1, Cb=2, Cr=3; 4:2:0 chroma by 2x2 box average, or 4:4:4)."""
    if arr.dtype != np.uint8:
        raise ValueError(f"baseline JPEG is 8-bit; got {arr.dtype}")
    if subsampling not in ("420", "444"):
        raise ValueError(f"subsampling must be '420' or '444', got {subsampling!r}")
    h, w = arr.shape[:2]
    qy = _quality_table(quality)
    qc = _quality_table(quality, _K2_CHROMA)
    y, cb, cr = _rgb_to_ycbcr(arr)
    hmax, vmax = (2, 2) if subsampling == "420" else (1, 1)
    if subsampling == "420":
        cb, cr = _box_down2(cb), _box_down2(cr)
    mcux, mcuy = -(-w // (8 * hmax)), -(-h // (8 * vmax))
    dc_tabs = [
        _canonical_codes(_DC_BITS, _DC_VALS),
        _canonical_codes(_DC_CHROMA_BITS, _DC_CHROMA_VALS),
    ]
    ac_tabs = [
        _canonical_codes(_AC_BITS, _AC_VALS),
        _canonical_codes(_AC_CHROMA_BITS, _AC_CHROMA_VALS),
    ]
    # (plane, Hi, Vi, quant table, Huffman table id 0=luma/1=chroma)
    specs = [(y, hmax, vmax, qy, 0), (cb, 1, 1, qc, 1), (cr, 1, 1, qc, 1)]
    comps = []
    for plane, hi, vi, q, tid in specs:
        bh, bv = mcux * hi, mcuy * vi
        zz, sizes, bits_mat = _plane_to_zz(plane, bv, bh, q)
        order = _mcu_order(mcuy, mcux, vi, hi).tolist()
        comps.append(
            (zz, sizes, bits_mat, order, dc_tabs[tid], ac_tabs[tid], vi * hi)
        )
    bw = _BitWriter()
    prev = [0, 0, 0]
    ptr = [0, 0, 0]
    rst_n = 0
    for m in range(mcuy * mcux):
        if restart_interval and m and m % restart_interval == 0:
            bw.flush()
            bw.out += bytes([0xFF, 0xD0 + (rst_n % 8)])
            rst_n += 1
            prev = [0, 0, 0]
        for ci, (zz, sizes, bits_mat, order, dct, act, bpm) in enumerate(comps):
            for _ in range(bpm):
                bi = order[ptr[ci]]
                ptr[ci] += 1
                prev[ci] = _encode_block(
                    bw, zz, sizes, bits_mat, bi, dct, act, prev[ci]
                )
    bw.flush()

    out = bytearray()
    out += SOI
    out += _seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += _seg(0xDB, bytes([0]) + bytes(int(x) for x in qy[_ZIGZAG]))
    out += _seg(0xDB, bytes([1]) + bytes(int(x) for x in qc[_ZIGZAG]))
    sof = struct.pack(">BHHB", 8, h, w, 3)
    sof += bytes([1, (hmax << 4) | vmax, 0, 2, 0x11, 1, 3, 0x11, 1])
    out += _seg(0xC0, sof)
    out += _seg(0xC4, _huff_payload(0, 0, _DC_BITS, _DC_VALS))
    out += _seg(0xC4, _huff_payload(1, 0, _AC_BITS, _AC_VALS))
    out += _seg(0xC4, _huff_payload(0, 1, _DC_CHROMA_BITS, _DC_CHROMA_VALS))
    out += _seg(0xC4, _huff_payload(1, 1, _AC_CHROMA_BITS, _AC_CHROMA_VALS))
    if restart_interval:
        out += _seg(0xDD, struct.pack(">H", restart_interval))
    out += _seg(0xDA, bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0]))
    out += bw.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


def jpeg_encode(
    arr: np.ndarray,
    quality: int = 95,
    restart_interval: int = 0,
    subsampling: str = "420",
) -> bytes:
    """Encode a 2-D uint8 array as a baseline grayscale JFIF stream, or an
    (h, w, 3) uint8 array as a YCbCr color stream (``subsampling`` '420' or
    '444'; ignored for grayscale).

    ``restart_interval`` > 0 emits a DRI marker and RSTn markers every that
    many MCUs (byte-aligned, DC predictor reset) — the structure real-world
    encoders produce for error resilience; mainly here so the decoder's
    restart path is exercised by round-trip tests."""
    if arr.ndim == 3 and arr.shape[2] == 3:
        return _jpeg_encode_color(arr, quality, restart_interval, subsampling)
    if arr.ndim != 2:
        raise ValueError(f"jpeg_encode expects 2-D or (h, w, 3), got {arr.shape}")
    if arr.dtype == np.uint8:
        prec = 8
    elif arr.dtype == np.uint16:
        # 12-bit extended sequential (SOF1): the precision aerial imagery
        # and DICOM use; values must fit the 12-bit sample range
        if arr.size and int(arr.max()) > 4095:
            raise ValueError(
                "12-bit JPEG requires values <= 4095 (full-range uint16 "
                "goes through png/z16 lossless or q12 lossy)"
            )
        prec = 12
    else:
        raise ValueError(
            f"JPEG is 8- or 12-bit; got {arr.dtype}"
        )
    h, w = arr.shape
    q = _quality_table(quality)
    # pad to 8x8 multiples by edge replication (standard practice)
    ph, pw = -(-h // 8) * 8, -(-w // 8) * 8
    img = np.pad(arr, ((0, ph - h), (0, pw - w)), mode="edge")
    blocks = (
        img.reshape(ph // 8, 8, pw // 8, 8)
        .transpose(0, 2, 1, 3)
        .reshape(-1, 8, 8)
        .astype(np.float64)
        - float(1 << (prec - 1))
    )
    # forward DCT of every block at once, then quantize + zigzag
    coef = np.einsum("ux,nxy,vy->nuv", _C, blocks, _C)
    qcoef = np.round(coef / q.reshape(8, 8)).astype(np.int64)
    zz = qcoef.reshape(-1, 64)[:, _ZIGZAG]

    if prec == 8:
        dc_bits, dc_vals = _DC_BITS, _DC_VALS
        ac_bits, ac_vals = _AC_BITS, _AC_VALS
    else:
        dc_bits, dc_vals = _DC12_BITS, _DC12_VALS
        ac_bits, ac_vals = _AC12_BITS, _AC12_VALS
    dc_codes = _canonical_codes(dc_bits, dc_vals)
    ac_codes = _canonical_codes(ac_bits, ac_vals)
    # Vectorized magnitude coding for the whole coefficient matrix: size
    # (bit length of |v|) and appended bits (one's-complement negatives)
    # computed once in numpy, so the per-symbol loop only does table
    # lookups + bit packing.
    absz = np.abs(zz)
    sizes = np.where(
        absz == 0, 0, np.floor(np.log2(np.maximum(absz, 1))).astype(np.int64) + 1
    )
    bits_mat = np.where(zz >= 0, zz, zz + (1 << sizes) - 1)
    bw = _BitWriter()
    write = bw.write
    prev_dc = 0
    rst_n = 0
    zrl_code, zrl_len = ac_codes[0xF0]
    eob_code, eob_len = ac_codes[0x00]
    for bi in range(zz.shape[0]):
        if restart_interval and bi and bi % restart_interval == 0:
            # byte-align, emit RSTn, reset the DC predictor (E.2.4)
            bw.flush()
            bw.out += bytes([0xFF, 0xD0 + (rst_n % 8)])
            rst_n += 1
            prev_dc = 0
        dc = int(zz[bi, 0])
        size, dbits = _magnitude(dc - prev_dc)
        prev_dc = dc
        code, length = dc_codes[size]
        write(code, length)
        if size:
            write(dbits, size)
        nz = np.nonzero(zz[bi, 1:])[0] + 1
        prev = 0
        for i in nz:
            run = int(i) - prev - 1
            while run > 15:
                write(zrl_code, zrl_len)
                run -= 16
            size = int(sizes[bi, i])
            code, length = ac_codes[(run << 4) | size]
            write(code, length)
            write(int(bits_mat[bi, i]), size)
            prev = int(i)
        if prev < 63:
            write(eob_code, eob_len)
    bw.flush()

    def huff_payload(tclass: int, tid: int, bits, vals) -> bytes:
        return bytes([tclass << 4 | tid] + bits + vals)

    out = bytearray()
    out += SOI
    out += _seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += _seg(0xDB, bytes([0]) + bytes(int(x) for x in q[_ZIGZAG]))
    # 8-bit: baseline SOF0; 12-bit: extended sequential SOF1 (B.2.2)
    out += _seg(0xC0 if prec == 8 else 0xC1,
                struct.pack(">BHHB", prec, h, w, 1) + bytes([1, 0x11, 0]))
    out += _seg(0xC4, huff_payload(0, 0, dc_bits, dc_vals))
    out += _seg(0xC4, huff_payload(1, 0, ac_bits, ac_vals))
    if restart_interval:
        out += _seg(0xDD, struct.pack(">H", restart_interval))
    out += _seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
    out += bw.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


def _build_decode_table(bits: list[int], vals: list[int]):
    """Flat 16-bit-peek lookup arrays (sym, length): every canonical code,
    left-aligned to 16 bits, fills its 2^(16-len) slot range — one array
    index decodes a symbol instead of up-to-16 bit-by-bit dict probes."""
    sym = np.full(1 << 16, -1, dtype=np.int16)
    length = np.zeros(1 << 16, dtype=np.int8)
    code = 0
    k = 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            base = code << (16 - ln)
            sym[base : base + (1 << (16 - ln))] = vals[k]
            length[base : base + (1 << (16 - ln))] = ln
            code += 1
            k += 1
        code <<= 1
    # plain Python lists: list indexing returns ints in ~50ns where numpy
    # scalar extraction costs microseconds — this IS the decode hot loop
    return sym.tolist(), length.tolist()


class _BitReader:
    """Reads the entropy-coded segment (already unstuffed). Keeps a >=16-bit
    accumulator so Huffman symbols decode with one table lookup."""

    def __init__(self, data: bytes):
        self.data = data
        self.n = len(data)
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def _fill(self, need: int):
        acc = self.acc
        nbits = self.nbits
        pos = self.pos
        data = self.data
        n = self.n
        while nbits < need:
            if pos < n:
                acc = (acc << 8) | data[pos]
                pos += 1
            else:
                acc <<= 8  # trailing pad (0s: safe for final EOB)
            nbits += 8
        self.acc = acc
        self.nbits = nbits
        self.pos = pos

    def read_bits(self, n: int) -> int:
        if n == 0:
            return 0
        if self.nbits < n:
            self._fill(n)
        self.nbits -= n
        v = (self.acc >> self.nbits) & ((1 << n) - 1)
        self.acc &= (1 << self.nbits) - 1
        return v

    def decode_symbol(self, table) -> int:
        sym_arr, len_arr = table
        nbits = self.nbits
        if nbits < 16:
            self._fill(16)
            nbits = self.nbits
        peek = (self.acc >> (nbits - 16)) & 0xFFFF
        s = sym_arr[peek]
        if s < 0:
            raise ValueError("invalid JPEG Huffman code")
        nbits -= len_arr[peek]
        self.nbits = nbits
        self.acc &= (1 << nbits) - 1
        return s


def _extend(v: int, size: int) -> int:
    """Sign-extend a magnitude-coded value (F.2.2.1 EXTEND)."""
    if size == 0:
        return 0
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


def jpeg_probe(buf: bytes) -> tuple[int, int]:
    """(h, w) from the SOF marker, no pixel decode."""
    if not isinstance(buf, bytes):
        buf = bytes(buf)  # pyarrow memoryviews are SIGNED ('b'): 0xFF -> -1
    pos = 2
    n = len(buf)
    while pos + 4 <= n:
        if buf[pos] != 0xFF:
            raise ValueError("bad JPEG marker stream")
        marker = buf[pos + 1]
        if marker in (0xC0, 0xC1, 0xC2, 0xC3):
            _prec, h, w = struct.unpack_from(">BHH", buf, pos + 4)
            return h, w
        if marker == 0xD9 or marker == 0xDA:
            break
        (length,) = struct.unpack_from(">H", buf, pos + 2)
        pos += 2 + length
    raise ValueError("JPEG stream has no SOF header")


def jpeg_precision(buf: bytes) -> int:
    """Sample precision (8 or 12) from the SOF marker, no pixel decode."""
    if not isinstance(buf, bytes):
        buf = bytes(buf)
    pos = 2
    n = len(buf)
    while pos + 4 <= n:
        if buf[pos] != 0xFF:
            raise ValueError("bad JPEG marker stream")
        marker = buf[pos + 1]
        if marker in (0xC0, 0xC1, 0xC2, 0xC3):
            return buf[pos + 4]
        if marker == 0xD9 or marker == 0xDA:
            break
        (length,) = struct.unpack_from(">H", buf, pos + 2)
        pos += 2 + length
    raise ValueError("JPEG stream has no SOF header")


def jpeg_decode(buf: bytes) -> np.ndarray:
    """Decode a baseline JPEG: grayscale streams to a 2-D uint8 array,
    3-component YCbCr streams to an (h, w, 3) uint8 RGB array.

    Handles MCU-interleaved scans with any divisible sampling-factor
    combination (4:4:4, 4:2:0, 4:2:2, ...); chroma upsampling is pixel
    replication (the spec leaves the filter to the decoder)."""
    if not isinstance(buf, bytes):
        buf = bytes(buf)  # pyarrow memoryviews are SIGNED ('b'): 0xFF -> -1
    if bytes(buf[:2]) != SOI:
        raise ValueError("not a JPEG stream (missing SOI)")
    pos = 2
    n = len(buf)
    qtables: dict[int, np.ndarray] = {}
    htables: dict[tuple[int, int], dict] = {}
    h = w = None
    sof_comps: list[tuple[int, int, int, int]] = []  # (cid, Hi, Vi, Tq)
    scan_tabs: dict[int, tuple[int, int]] = {}  # cid -> (Td, Ta)
    scan_order: list[int] = []  # component ids in scan order
    restart_interval = 0
    scan_start = None
    while pos + 2 <= n:
        if buf[pos] != 0xFF:
            raise ValueError("bad JPEG marker stream")
        marker = buf[pos + 1]
        if marker == 0xD9:  # EOI
            break
        if marker == 0xC2:  # progressive DCT, Huffman
            from .jpeg_progressive import jpeg_decode_progressive

            return jpeg_decode_progressive(buf)
        if marker in (0xC6, 0xCA, 0xCE):
            raise NotImplementedError(
                "differential/lossless JPEG variants not supported"
            )
        if marker in (0xC9, 0xCB, 0xCD):
            raise NotImplementedError("arithmetic-coded JPEG not supported")
        (length,) = struct.unpack_from(">H", buf, pos + 2)
        data = bytes(buf[pos + 4 : pos + 2 + length])
        if marker == 0xDB:  # DQT
            dpos = 0
            while dpos < len(data):
                pq, tq = data[dpos] >> 4, data[dpos] & 0xF
                dpos += 1
                if pq == 0:
                    tbl = np.frombuffer(
                        data[dpos : dpos + 64], dtype=np.uint8
                    ).astype(np.int64)
                    dpos += 64
                else:
                    tbl = np.frombuffer(
                        data[dpos : dpos + 128], dtype=">u2"
                    ).astype(np.int64)
                    dpos += 128
                qtables[tq] = tbl[_UNZIGZAG]  # store in natural order
        elif marker == 0xC4:  # DHT
            dpos = 0
            while dpos < len(data):
                tclass, tid = data[dpos] >> 4, data[dpos] & 0xF
                bits = list(data[dpos + 1 : dpos + 17])
                nv = sum(bits)
                vals = list(data[dpos + 17 : dpos + 17 + nv])
                htables[(tclass, tid)] = _build_decode_table(bits, vals)
                dpos += 17 + nv
        elif marker in (0xC0, 0xC1, 0xC3):  # SOF baseline/ext-sequential
            prec, h, w, ncomp = struct.unpack_from(">BHHB", data, 0)
            if prec not in (8, 12):
                raise NotImplementedError(
                    f"only 8- and 12-bit JPEG supported (precision={prec})"
                )
            if prec == 12 and ncomp != 1:
                raise NotImplementedError(
                    "12-bit JPEG is grayscale-only (YCbCr constants are "
                    "8-bit; moaray's band-per-row model carries color as "
                    "per-band payloads anyway)"
                )
            if ncomp not in (1, 3):
                raise NotImplementedError(
                    f"{ncomp}-component JPEG not supported (grayscale and "
                    "YCbCr only; CMYK streams are out of scope)"
                )
            sof_comps = []
            for c in range(ncomp):
                cid = data[6 + 3 * c]
                samp = data[7 + 3 * c]
                sof_comps.append((cid, samp >> 4, samp & 0xF, data[8 + 3 * c]))
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", data, 0)
        elif marker == 0xDA:  # SOS
            ns = data[0]
            if ns != len(sof_comps):
                raise NotImplementedError(
                    "non-interleaved (multi-scan) sequential JPEG not supported"
                )
            for c in range(ns):
                cid = data[1 + 2 * c]
                tds = data[2 + 2 * c]
                scan_tabs[cid] = (tds >> 4, tds & 0xF)
                scan_order.append(cid)
            scan_start = pos + 2 + length
            break
        pos += 2 + length
    if h is None or scan_start is None:
        raise ValueError("JPEG stream missing SOF/SOS")

    # entropy segment: vectorized marker scan, then bulk unstuffing — the
    # byte-wise Python loop was ~25% of decode wall time
    seg = buf[scan_start:]
    arr = np.frombuffer(seg, np.uint8)
    ff = np.where(arr[:-1] == 0xFF)[0]
    nxt = arr[ff + 1] if len(ff) else np.empty(0, np.uint8)
    is_stuff = nxt == 0x00
    is_rst = (nxt >= 0xD0) & (nxt <= 0xD7)
    real = ff[~(is_stuff | is_rst)]
    end = int(real[0]) if len(real) else len(arr)
    rst_pos = ff[is_rst]
    rst_pos = rst_pos[rst_pos < end]
    pieces = []
    start = 0
    for rp in rst_pos.tolist():
        pieces.append(seg[start:rp].replace(b"\xff\x00", b"\xff"))
        start = rp + 2
    pieces.append(seg[start:end].replace(b"\xff\x00", b"\xff"))

    # scan geometry: MCU grid from the max sampling factors (A.2.3); every
    # component's blocks live in plane-raster order, the stream visits them
    # in MCU order through the per-component index map
    by_cid = {c[0]: c for c in sof_comps}
    comps = [by_cid[cid] for cid in scan_order]
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    for _cid, hi, vi, _tq in comps:
        if hmax % hi or vmax % vi:
            raise NotImplementedError(
                f"non-divisible sampling factors {hi}x{vi} vs max {hmax}x{vmax}"
            )
    mcux, mcuy = -(-w // (8 * hmax)), -(-h // (8 * vmax))
    n_mcus = mcux * mcuy
    state = []
    for cid, hi, vi, tq in comps:
        bh_c, bv_c = mcux * hi, mcuy * vi
        td, ta = scan_tabs[cid]
        state.append(
            {
                "zz": np.zeros((bh_c * bv_c, 64), dtype=np.float64),
                "order": _mcu_order(mcuy, mcux, vi, hi).tolist(),
                "dc": htables[(0, td)],
                "ac": htables[(1, ta)],
                "bpm": vi * hi,
                "q": qtables[tq],
                "hi": hi,
                "vi": vi,
                "bh": bh_c,
                "bv": bv_c,
            }
        )

    # THE decode hot loop: the bit-reader state (acc/nbits/pos) lives in
    # locals (method-call overhead was ~35% of decode wall time) and
    # coefficients accumulate into flat position/value lists scattered in
    # ONE numpy write per component (per-element ndarray stores are ~1 µs
    # each; a 0.26 Mpx image has ~10^5 of them).
    mcu_done = 0
    ptr = [0] * len(state)
    per_seg = restart_interval if restart_interval else n_mcus
    for st in state:
        st["pos_l"] = []
        st["val_l"] = []
    for seg_data in pieces:
        data = seg_data
        n_data = len(data)
        pos = 0
        acc = 0
        nbits = 0
        prev = [0] * len(state)
        for _ in range(min(per_seg, n_mcus - mcu_done)):
            for ci, st in enumerate(state):
                order = st["order"]
                dc_sym, dc_len = st["dc"]
                ac_sym, ac_len = st["ac"]
                pos_l = st["pos_l"]
                val_l = st["val_l"]
                for _b in range(st["bpm"]):
                    bi64 = order[ptr[ci]] << 6
                    ptr[ci] += 1
                    # --- DC: one table peek + magnitude bits ---
                    while nbits < 16:
                        acc = (acc << 8) | (data[pos] if pos < n_data else 0)
                        pos += 1
                        nbits += 8
                    peek = (acc >> (nbits - 16)) & 0xFFFF
                    size = dc_sym[peek]
                    if size < 0:
                        raise ValueError("invalid JPEG Huffman code")
                    nbits -= dc_len[peek]
                    if size:
                        while nbits < size:
                            acc = (acc << 8) | (
                                data[pos] if pos < n_data else 0
                            )
                            pos += 1
                            nbits += 8
                        nbits -= size
                        v = (acc >> nbits) & ((1 << size) - 1)
                        prev[ci] += (
                            v if v >= (1 << (size - 1))
                            else v - (1 << size) + 1
                        )
                    acc &= (1 << nbits) - 1
                    pos_l.append(bi64)
                    val_l.append(prev[ci])
                    # --- AC run-length loop ---
                    k = 1
                    while k < 64:
                        if nbits < 16:
                            while nbits < 16:
                                acc = (acc << 8) | (
                                    data[pos] if pos < n_data else 0
                                )
                                pos += 1
                                nbits += 8
                        peek = (acc >> (nbits - 16)) & 0xFFFF
                        sym = ac_sym[peek]
                        if sym < 0:
                            raise ValueError("invalid JPEG Huffman code")
                        nbits -= ac_len[peek]
                        acc &= (1 << nbits) - 1
                        if sym == 0x00:  # EOB
                            break
                        if sym == 0xF0:  # ZRL
                            k += 16
                            continue
                        k += sym >> 4
                        size = sym & 0xF
                        if k > 63:
                            raise ValueError(
                                "AC coefficient index out of range"
                            )
                        while nbits < size:
                            acc = (acc << 8) | (
                                data[pos] if pos < n_data else 0
                            )
                            pos += 1
                            nbits += 8
                        nbits -= size
                        v = (acc >> nbits) & ((1 << size) - 1)
                        acc &= (1 << nbits) - 1
                        pos_l.append(bi64 | k)
                        val_l.append(
                            v if v >= (1 << (size - 1))
                            else v - (1 << size) + 1
                        )
                        k += 1
            mcu_done += 1
    if mcu_done != n_mcus:
        raise ValueError(f"JPEG scan decoded {mcu_done}/{n_mcus} MCUs")
    for st in state:
        if st["pos_l"]:
            st["zz"].reshape(-1)[np.array(st["pos_l"], dtype=np.int64)] = (
                np.array(st["val_l"], dtype=np.float64)
            )

    planes = []
    for st in state:
        q = st["q"].reshape(8, 8).astype(np.float64)
        coef = st["zz"][:, _UNZIGZAG].reshape(-1, 8, 8) * q
        pix = (np.einsum("xu,nuv,yv->nxy", _C.T, coef, _C.T)
               + float(1 << (prec - 1)))
        bv_c, bh_c = st["bv"], st["bh"]
        plane = (
            pix.reshape(bv_c, bh_c, 8, 8)
            .transpose(0, 2, 1, 3)
            .reshape(bv_c * 8, bh_c * 8)
        )
        # crop to the component's own dims, then replicate up to full res
        ch = -(-h * st["vi"] // vmax)
        cw = -(-w * st["hi"] // hmax)
        plane = plane[:ch, :cw]
        if st["vi"] != vmax or st["hi"] != hmax:
            plane = np.repeat(
                np.repeat(plane, vmax // st["vi"], axis=0),
                hmax // st["hi"],
                axis=1,
            )
        planes.append(plane[:h, :w])
    if len(planes) == 1:
        peak = (1 << prec) - 1
        out_dt = np.uint8 if prec == 8 else np.uint16
        return np.clip(np.round(planes[0]), 0, peak).astype(out_dt)
    # JFIF fixes component ids 1=Y, 2=Cb, 3=Cr; honor them regardless of
    # the (almost always identical) scan order
    ids = [c[0] for c in comps]
    if sorted(ids) == [1, 2, 3]:
        by_id = dict(zip(ids, planes))
        return _ycbcr_to_rgb(by_id[1], by_id[2], by_id[3])
    return _ycbcr_to_rgb(planes[0], planes[1], planes[2])
