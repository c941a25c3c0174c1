"""Baseline JPEG (DCT, grayscale, 8-bit) — from scratch per ITU-T T.81.

The sandbox ships no image libraries, and the reference reads any
GDAL-supported raster — including JPEG/JPEG-in-TIFF, the format every real
image+caption corpus uses (ref /root/reference/moamosaic/mosaic.py:16 opens
arbitrary GDAL datasets). This module closes that gap without Pillow or
libjpeg: a conformant baseline sequential encoder + decoder for single-
component (grayscale) images, built only from the public JPEG specification
(ITU-T T.81 / ISO 10918-1) — marker segments, Annex-K quantization +
Huffman tables, zigzag, 8x8 DCT.

Scope (honest gates, consistent with the PNG/WAV codecs):
- 1-component baseline sequential only; progressive, arithmetic-coded and
  3-component (color) streams raise NotImplementedError.
- 8-bit precision (JPEG baseline is 8-bit by definition); the engine's
  uint16 rasters go through PNG/z16 for lossless or q12 for lossy-uint16.
- Restart markers (DRI/RSTn) are handled on decode; the encoder never
  emits them.

Encoder: vectorized 8x8 forward DCT over ALL blocks at once (einsum with a
precomputed basis), IJG-style quality scaling of the Annex K.1 luminance
table, standard K.3 Huffman tables. Decoder: DQT/DHT/SOF0/SOS parsing with
canonical Huffman reconstruction (tables come from the stream, so foreign
baseline grayscale JPEGs decode too), byte-unstuffing, per-block entropy
decode, vectorized dequantize + inverse DCT.
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


def _dct_basis() -> np.ndarray:
    """Orthonormal 8-point DCT-II basis matrix C: coef = C @ block @ C.T."""
    x = np.arange(8)
    c = np.cos((2 * x[None, :] + 1) * x[:, None] * np.pi / 16)
    c[0] *= 1 / np.sqrt(2)
    return c * 0.5


_C = _dct_basis()


def _quality_table(quality: int) -> np.ndarray:
    """IJG-style quality scaling of the K.1 luminance table (1..100)."""
    quality = min(max(int(quality), 1), 100)
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    tbl = (_K1_LUMA * scale + 50) // 100
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


def jpeg_encode(
    arr: np.ndarray, quality: int = 95, restart_interval: int = 0
) -> bytes:
    """Encode a 2-D uint8 array as a baseline grayscale JFIF stream.

    ``restart_interval`` > 0 emits a DRI marker and RSTn markers every that
    many MCUs (byte-aligned, DC predictor reset) — the structure real-world
    encoders produce for error resilience; mainly here so the decoder's
    restart path is exercised by round-trip tests."""
    if arr.ndim != 2:
        raise ValueError(f"jpeg_encode expects 2-D, got {arr.shape}")
    if arr.dtype != np.uint8:
        raise ValueError(
            f"baseline JPEG is 8-bit; got {arr.dtype} (uint16 goes through "
            "png/z16 lossless or q12 lossy)"
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
        - 128.0
    )
    # forward DCT of every block at once, then quantize + zigzag
    coef = np.einsum("ux,nxy,vy->nuv", _C, blocks, _C)
    qcoef = np.round(coef / q.reshape(8, 8)).astype(np.int64)
    zz = qcoef.reshape(-1, 64)[:, _ZIGZAG]

    dc_codes = _canonical_codes(_DC_BITS, _DC_VALS)
    ac_codes = _canonical_codes(_AC_BITS, _AC_VALS)
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
    out += _seg(0xC0, struct.pack(">BHHB", 8, h, w, 1) + bytes([1, 0x11, 0]))
    out += _seg(0xC4, huff_payload(0, 0, _DC_BITS, _DC_VALS))
    out += _seg(0xC4, huff_payload(1, 0, _AC_BITS, _AC_VALS))
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


def jpeg_decode(buf: bytes) -> np.ndarray:
    """Decode a baseline grayscale JPEG to a 2-D uint8 array."""
    if not isinstance(buf, bytes):
        buf = bytes(buf)  # pyarrow memoryviews are SIGNED ('b'): 0xFF -> -1
    if bytes(buf[:2]) != SOI:
        raise ValueError("not a JPEG stream (missing SOI)")
    pos = 2
    n = len(buf)
    qtables: dict[int, np.ndarray] = {}
    htables: dict[tuple[int, int], dict] = {}
    h = w = None
    comp_q = 0
    dc_id = ac_id = 0
    restart_interval = 0
    scan_start = None
    while pos + 2 <= n:
        if buf[pos] != 0xFF:
            raise ValueError("bad JPEG marker stream")
        marker = buf[pos + 1]
        if marker == 0xD9:  # EOI
            break
        if marker in (0xC2, 0xC6, 0xCA, 0xCE):
            raise NotImplementedError("progressive JPEG not supported")
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
            if prec != 8:
                raise NotImplementedError("only 8-bit JPEG supported")
            if ncomp != 1:
                raise NotImplementedError(
                    f"{ncomp}-component (color) JPEG not supported — the "
                    "engine's image model is single-band"
                )
            # per-component fields follow the 6-byte frame header
            samp = data[7]
            if samp != 0x11:
                raise NotImplementedError("subsampled JPEG not supported")
            comp_q = data[8]
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", data, 0)
        elif marker == 0xDA:  # SOS
            ns = data[0]
            if ns != 1:
                raise NotImplementedError("multi-component scan")
            dc_id, ac_id = data[2] >> 4, data[2] & 0xF
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

    dc_tbl = htables[(0, dc_id)]
    ac_tbl = htables[(1, ac_id)]
    q = qtables[comp_q].reshape(8, 8).astype(np.float64)
    bh, bw_ = -(-h // 8), -(-w // 8)
    nblocks = bh * bw_
    zz = np.zeros((nblocks, 64), dtype=np.float64)
    # restart intervals chopped the stream into independently-decodable
    # chunks during unstuffing
    segments = pieces
    bi = 0
    per_seg = restart_interval if restart_interval else nblocks
    for seg_data in segments:
        br = _BitReader(seg_data)
        prev_dc = 0
        for _ in range(min(per_seg, nblocks - bi)):
            size = br.decode_symbol(dc_tbl)
            prev_dc += _extend(br.read_bits(size), size)
            zz[bi, 0] = prev_dc
            k = 1
            while k < 64:
                sym = br.decode_symbol(ac_tbl)
                if sym == 0x00:  # EOB
                    break
                if sym == 0xF0:  # ZRL
                    k += 16
                    continue
                k += sym >> 4
                size = sym & 0xF
                if k > 63:
                    raise ValueError("AC coefficient index out of range")
                zz[bi, k] = _extend(br.read_bits(size), size)
                k += 1
            bi += 1
    if bi != nblocks:
        raise ValueError(f"JPEG scan decoded {bi}/{nblocks} blocks")

    coef = zz[:, _UNZIGZAG].reshape(-1, 8, 8) * q
    pix = np.einsum("xu,nuv,yv->nxy", _C.T, coef, _C.T) + 128.0
    img = (
        np.clip(np.round(pix), 0, 255)
        .astype(np.uint8)
        .reshape(bh, bw_, 8, 8)
        .transpose(0, 2, 1, 3)
        .reshape(bh * 8, bw_ * 8)
    )
    return img[:h, :w].copy()
