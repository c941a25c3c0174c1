"""FLAC (lossless audio) — from scratch, per the public FLAC format spec
(RFC 9639 / xiph.org format docs). Closes the `flac` half of the mp3/flac
codec gate the same way PNG/WAV/JPEG were closed: a real decoder plus an
encoder used by the round-trip tests (no audio library in the sandbox).

Decoder coverage (the shapes real FLAC encoders emit):
- STREAMINFO metadata (other blocks skipped), fixed-blocksize streams
- frame headers: all block-size codes, sample-rate-from-STREAMINFO or
  inline codes, UTF-8 coded frame numbers, CRC-8 check
- channels: mono, independent stereo, left/side, right/side, mid/side
- subframes: CONSTANT, VERBATIM, FIXED orders 0-4, LPC any order (with
  quantized-coefficient shift), wasted-bits flag
- residuals: rice (4-bit) and rice2 (5-bit) methods, partition orders
  0-15, escape (raw n-bit) partitions
- frame CRC-16 check

Encoder (subset, for tests): 16-bit mono/stereo, FIXED order 0-2 or an
LPC subframe mathematically equal to fixed order 2 (coeffs [2,-1],
shift 0 — exercises the decoder's LPC path), CONSTANT for silent blocks,
mid/side stereo decorrelation, rice partitions order 0, final partial
block via the 16-bit blocksize-at-end code.

Lossless invariant: decode(encode(x)) == x bit-exactly, asserted in
tests/test_flac.py across waveforms, block boundaries and channel modes.
"""

from __future__ import annotations

import struct

import numpy as np

_MAGIC = b"fLaC"
_SYNC = 0b11111111111110

_FIXED_COEFFS = {
    0: [],
    1: [1],
    2: [2, -1],
    3: [3, -3, 1],
    4: [4, -6, 4, -1],
}


def _make_crc_table(poly: int, width: int) -> list[int]:
    mask = (1 << width) - 1
    top = 1 << (width - 1)
    table = []
    for b in range(256):
        crc = b << (width - 8)
        for _ in range(8):
            crc = ((crc << 1) ^ poly) & mask if crc & top else (crc << 1) & mask
        table.append(crc)
    return table


_CRC8_TABLE = _make_crc_table(0x07, 8)
_CRC16_TABLE = _make_crc_table(0x8005, 16)


def _crc8(data: bytes) -> int:
    crc = 0
    tbl = _CRC8_TABLE
    for b in data:
        crc = tbl[crc ^ b]
    return crc


def _crc16(data: bytes) -> int:
    crc = 0
    tbl = _CRC16_TABLE
    for b in data:
        crc = ((crc << 8) & 0xFFFF) ^ tbl[(crc >> 8) ^ b]
    return crc


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, length: int):
        self.acc = (self.acc << length) | (value & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            self.out.append((self.acc >> self.nbits) & 0xFF)
        self.acc &= (1 << self.nbits) - 1

    def write_unary(self, q: int):
        while q >= 32:
            self.write(0, 32)
            q -= 32
        self.write(1, q + 1)  # q zeros then a 1

    def align(self):
        if self.nbits:
            self.write(0, 8 - self.nbits)


class _BitReader:
    def __init__(self, data: bytes, pos_bits: int = 0):
        self.data = data
        self.pos = pos_bits

    def read(self, n: int) -> int:
        v = 0
        pos = self.pos
        data = self.data
        while n > 0:
            byte = data[pos >> 3]
            avail = 8 - (pos & 7)
            take = min(avail, n)
            v = (v << take) | ((byte >> (avail - take)) & ((1 << take) - 1))
            pos += take
            n -= take
        self.pos = pos
        return v

    def read_signed(self, n: int) -> int:
        v = self.read(n)
        return v - (1 << n) if v >= (1 << (n - 1)) else v

    def read_unary(self) -> int:
        q = 0
        while self.read(1) == 0:
            q += 1
        return q

    def align(self):
        self.pos = (self.pos + 7) & ~7


def _zigzag(v: np.ndarray) -> np.ndarray:
    return np.where(v >= 0, v << 1, ((-v) << 1) - 1)


def _utf8_number(n: int) -> bytes:
    """FLAC frame numbers use UTF-8-style coding (extended to 36 bits)."""
    if n < 0x80:
        return bytes([n])
    out = []
    nbytes = 2
    # payload capacity of an nbytes sequence: (7 - nbytes) lead bits +
    # 6 * (nbytes - 1) continuation bits = 1 + 5 * nbytes bits total
    while n >= (1 << (1 + 5 * nbytes)):
        nbytes += 1
    lead = (0xFF << (8 - nbytes)) & 0xFF
    shift = 6 * (nbytes - 1)
    out.append(lead | (n >> shift))
    for i in range(nbytes - 1):
        shift -= 6
        out.append(0x80 | ((n >> shift) & 0x3F))
    return bytes(out)


def _read_utf8_number(br: _BitReader) -> int:
    b0 = br.read(8)
    if b0 < 0x80:
        return b0
    nbytes = 0
    mask = 0x80
    while b0 & mask:
        nbytes += 1
        mask >>= 1
    n = b0 & (mask - 1)
    for _ in range(nbytes - 1):
        n = (n << 6) | (br.read(8) & 0x3F)
    return n


# ---------------------------------------------------------------------------
# encoder
# ---------------------------------------------------------------------------

def _write_residual(bw: _BitWriter, res: np.ndarray):
    """Rice-code a residual vector as one partition (order 0)."""
    bw.write(0, 2)   # coding method: rice (4-bit params)
    bw.write(0, 4)   # partition order 0
    u = _zigzag(res.astype(np.int64))
    mean = float(u.mean()) if len(u) else 0.0
    k = 0
    while (1 << (k + 1)) < mean + 1 and k < 14:
        k += 1
    bw.write(k, 4)
    for q, r in zip((u >> k).tolist(), (u & ((1 << k) - 1)).tolist()):
        bw.write_unary(q)
        if k:
            bw.write(r, k)


def _encode_subframe(bw: _BitWriter, x: np.ndarray, bps: int, use_lpc: bool):
    x64 = x.astype(np.int64)
    if len(x64) and (x64 == x64[0]).all():
        bw.write(0, 1)
        bw.write(0b000000, 6)  # CONSTANT
        bw.write(0, 1)         # no wasted bits
        bw.write(int(x64[0]), bps)
        return
    order = min(2, max(0, len(x64) - 1))
    if use_lpc and len(x64) > 2:
        # LPC subframe equal to fixed order 2: coeffs [2,-1], shift 0 —
        # a valid quantized-LPC stream that exercises the decoder LPC path
        bw.write(0, 1)
        bw.write(0b100000 | (2 - 1), 6)  # LPC, order 2
        bw.write(0, 1)
        for w in x64[:2].tolist():
            bw.write(int(w), bps)
        bw.write(4 - 1, 4)   # precision 4 bits
        bw.write(0, 5)       # shift 0
        bw.write(2, 4)       # coeff 2
        bw.write(-1, 4)      # coeff -1
        res = x64[2:] - (2 * x64[1:-1] - x64[:-2])
        _write_residual(bw, res)
        return
    bw.write(0, 1)
    bw.write(0b001000 | order, 6)  # FIXED
    bw.write(0, 1)
    for w in x64[:order].tolist():
        bw.write(int(w), bps)
    res = x64  # fixed-predictor residual = order-th difference
    for _ in range(order):
        res = res[1:] - res[:-1]
    _write_residual(bw, res)


def flac_encode(samples: np.ndarray, sample_rate: int = 16000,
                block_size: int = 4096) -> bytes:
    """Encode int16 mono ``(n,)`` or stereo ``(n, 2)`` samples as a FLAC
    stream (subset encoder; see module docstring)."""
    if samples.dtype != np.int16:
        raise ValueError(f"flac_encode expects int16, got {samples.dtype}")
    stereo = samples.ndim == 2
    if stereo and samples.shape[1] != 2:
        raise ValueError(f"expected (n,) or (n, 2), got {samples.shape}")
    n = len(samples)
    bps = 16
    out = bytearray()
    out += _MAGIC
    # STREAMINFO, marked last metadata block
    si = struct.pack(">HH", block_size, block_size)
    si += b"\x00\x00\x00" * 2  # min/max framesize unknown
    packed = (sample_rate << 44) | (((2 if stereo else 1) - 1) << 41) \
        | ((bps - 1) << 36) | n
    si += packed.to_bytes(8, "big")
    si += b"\x00" * 16  # MD5 unset
    out += bytes([0x80]) + len(si).to_bytes(3, "big") + si

    frame_no = 0
    for start in range(0, n, block_size):
        blk = samples[start : start + block_size]
        bs = len(blk)
        bw = _BitWriter()
        bw.write(_SYNC, 14)
        bw.write(0, 1)  # reserved
        bw.write(0, 1)  # fixed blocksize stream
        pow2 = {256: 8, 512: 9, 1024: 10, 2048: 11, 4096: 12,
                8192: 13, 16384: 14, 32768: 15}
        if bs == block_size and bs in pow2:
            bs_code, bs_at_end = pow2[bs], None
        else:
            bs_code, bs_at_end = 7, bs - 1  # 16-bit blocksize-1 at end
        bw.write(bs_code, 4)
        bw.write(0, 4)  # sample rate: from STREAMINFO
        if stereo:
            bw.write(10, 4)  # mid/side
        else:
            bw.write(0, 4)   # 1 channel
        bw.write(0b100, 3)   # 16 bps
        bw.write(0, 1)       # reserved
        for b in _utf8_number(frame_no):
            bw.write(b, 8)
        if bs_at_end is not None:
            bw.write(bs_at_end, 16)
        # every header field is a whole number of bytes at this point
        assert bw.nbits == 0, "frame header must be byte-aligned for CRC-8"
        bw.write(_crc8(bytes(bw.out)), 8)
        if stereo:
            left = blk[:, 0].astype(np.int64)
            right = blk[:, 1].astype(np.int64)
            mid = (left + right) >> 1
            side = left - right
            _encode_subframe(bw, mid, 16, use_lpc=True)
            _encode_subframe(bw, side, 17, use_lpc=False)
        else:
            _encode_subframe(bw, blk.astype(np.int64), 16,
                             use_lpc=(frame_no % 2 == 1))
        bw.align()
        frame = bytes(bw.out)
        out += frame + struct.pack(">H", _crc16(frame))
        frame_no += 1
    return bytes(out)


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------

def _read_residual(br: _BitReader, bs: int, order: int) -> np.ndarray:
    """Rice-partition residual decode — THE flac hot loop. The bit reader
    state lives in locals and unary quotients are found with 64-bit
    windowed ``bit_length`` scans instead of per-bit reads (method-call
    per bit made decode ~6x slower)."""
    method = br.read(2)
    if method > 1:
        raise ValueError(f"reserved residual coding method {method}")
    plen = 4 if method == 0 else 5
    escape = (1 << plen) - 1
    porder = br.read(4)
    nparts = 1 << porder
    if bs % nparts:
        raise ValueError("partition count does not divide block size")
    res = np.empty(bs - order, dtype=np.int64)
    data = br.data
    pos = br.pos
    idx = 0
    for p in range(nparts):
        count = (bs >> porder) - (order if p == 0 else 0)
        # k parameter (plen bits), inline
        byte_i = pos >> 3
        sl = data[byte_i : byte_i + 2]
        valid = 8 * len(sl) - (pos & 7)
        k = (int.from_bytes(sl, "big") >> (valid - plen)) & escape
        pos += plen
        if k == escape:
            byte_i = pos >> 3
            sl = data[byte_i : byte_i + 2]
            valid = 8 * len(sl) - (pos & 7)
            nbits = (int.from_bytes(sl, "big") >> (valid - 5)) & 31
            pos += 5
            half = 1 << (nbits - 1) if nbits else 0
            full = 1 << nbits
            for i in range(count):
                if nbits == 0:
                    res[idx + i] = 0
                    continue
                byte_i = pos >> 3
                sl = data[byte_i : byte_i + 8]
                valid = 8 * len(sl) - (pos & 7)
                v = (int.from_bytes(sl, "big") >> (valid - nbits)) & (full - 1)
                pos += nbits
                res[idx + i] = v - full if v >= half else v
        else:
            mask = (1 << k) - 1
            for i in range(count):
                # unary quotient: windowed leading-zero scan
                q = 0
                while True:
                    byte_i = pos >> 3
                    sl = data[byte_i : byte_i + 8]
                    valid = 8 * len(sl) - (pos & 7)
                    if valid <= 0:
                        raise ValueError("truncated FLAC residual")
                    window = int.from_bytes(sl, "big") & ((1 << valid) - 1)
                    if window:
                        lead = valid - window.bit_length()
                        q += lead
                        pos += lead + 1
                        break
                    q += valid
                    pos += valid
                if k:
                    byte_i = pos >> 3
                    sl = data[byte_i : byte_i + 8]
                    valid = 8 * len(sl) - (pos & 7)
                    r = (int.from_bytes(sl, "big") >> (valid - k)) & mask
                    pos += k
                    u = (q << k) | r
                else:
                    u = q
                res[idx + i] = (u >> 1) ^ -(u & 1)  # un-zigzag
        idx += count
    br.pos = pos
    return res


def _decode_subframe(br: _BitReader, bs: int, bps: int) -> np.ndarray:
    if br.read(1):
        raise ValueError("subframe padding bit set")
    t = br.read(6)
    wasted = 0
    if br.read(1):
        wasted = 1 + br.read_unary()
        bps -= wasted
    if t == 0:  # CONSTANT
        out = np.full(bs, br.read_signed(bps), dtype=np.int64)
    elif t == 1:  # VERBATIM
        out = np.array([br.read_signed(bps) for _ in range(bs)], np.int64)
    elif 8 <= t <= 12:  # FIXED order t-8
        order = t - 8
        warm = np.array([br.read_signed(bps) for _ in range(order)],
                        dtype=np.int64)
        res = _read_residual(br, bs, order)
        # the fixed residual is the order-th forward difference of the
        # signal: invert with `order` SEEDED cumulative sums (the seed of
        # level o is the o-th difference of the warmups at position o) —
        # no per-sample Python loop. L_o = [seed, seed + cumsum(L_{o+1})].
        cur = res
        for o in range(order - 1, -1, -1):
            seed = int(np.diff(warm, n=o)[0])  # n=0 -> warm[0]
            cur = np.concatenate(([seed], seed + np.cumsum(cur)))
        out = cur if order else res.copy()
    elif t >= 32:  # LPC order t-31
        order = t - 31
        warm = [br.read_signed(bps) for _ in range(order)]
        precision = br.read(4) + 1
        if precision == 16:
            raise ValueError("invalid LPC precision escape")
        shift = br.read_signed(5)
        coefs = [br.read_signed(precision) for _ in range(order)]
        res = _read_residual(br, bs, order)
        # sequential by nature; rolling Python ints beat per-sample
        # ndarray indexing ~4x
        vals = [int(v) for v in warm]
        if order == 1:
            (c0,) = coefs
            a = vals[-1]
            for r in res.tolist():
                a = r + ((c0 * a) >> shift)
                vals.append(a)
        elif order == 2:
            c0, c1 = coefs
            b, a = vals[-2], vals[-1]
            for r in res.tolist():
                v = r + ((c0 * a + c1 * b) >> shift)
                vals.append(v)
                b = a
                a = v
        else:
            for r in res.tolist():
                acc = 0
                for j in range(order):
                    acc += coefs[j] * vals[-1 - j]
                vals.append(r + (acc >> shift))
        out = np.array(vals, dtype=np.int64)
    else:
        raise ValueError(f"reserved subframe type {t}")
    return out << wasted


_BLOCKSIZE_CODE = {1: 192, 2: 576, 3: 1152, 4: 2304, 5: 4608,
                   8: 256, 9: 512, 10: 1024, 11: 2048, 12: 4096,
                   13: 8192, 14: 16384, 15: 32768}
_RATE_CODE = {1: 88200, 2: 176400, 3: 192000, 4: 8000, 5: 16000, 6: 22050,
              7: 24000, 8: 32000, 9: 44100, 10: 48000, 11: 96000}
_BPS_CODE = {1: 8, 2: 12, 4: 16, 5: 20, 6: 24, 7: 32}


def flac_decode(buf: bytes) -> tuple[np.ndarray, int]:
    """Decode a FLAC stream; returns (int16 samples — ``(n,)`` mono or
    ``(n, channels)`` — and the sample rate)."""
    if bytes(buf[:4]) != _MAGIC:
        raise ValueError("not a FLAC stream")
    pos = 4
    # metadata blocks: parse STREAMINFO, skip the rest
    si = None
    while True:
        hdr = buf[pos]
        btype = hdr & 0x7F
        last = bool(hdr & 0x80)
        blen = int.from_bytes(buf[pos + 1 : pos + 4], "big")
        body = buf[pos + 4 : pos + 4 + blen]
        if btype == 0:
            si = body
        pos += 4 + blen
        if last:
            break
    if si is None:
        raise ValueError("FLAC stream missing STREAMINFO")
    packed = int.from_bytes(si[10:18], "big")
    si_rate = packed >> 44
    si_channels = ((packed >> 41) & 0x7) + 1
    si_bps = ((packed >> 36) & 0x1F) + 1
    total = packed & ((1 << 36) - 1)

    chans = [[] for _ in range(si_channels)]
    got = 0
    n = len(buf)
    while pos < n and (total == 0 or got < total):
        frame_start = pos
        br = _BitReader(buf, pos * 8)
        if br.read(14) != _SYNC:
            raise ValueError("lost FLAC frame sync")
        br.read(1)
        br.read(1)  # blocking strategy (frame/sample number both handled)
        bs_code = br.read(4)
        sr_code = br.read(4)
        ch_code = br.read(4)
        bps_code = br.read(3)
        br.read(1)
        _read_utf8_number(br)
        if bs_code == 6:
            bs = br.read(8) + 1
        elif bs_code == 7:
            bs = br.read(16) + 1
        elif bs_code in _BLOCKSIZE_CODE:
            bs = _BLOCKSIZE_CODE[bs_code]
        else:
            raise ValueError(f"reserved blocksize code {bs_code}")
        if sr_code == 0:
            rate = si_rate
        elif sr_code in _RATE_CODE:
            rate = _RATE_CODE[sr_code]
        elif sr_code == 12:
            rate = br.read(8) * 1000
        elif sr_code == 13:
            rate = br.read(16)
        elif sr_code == 14:
            rate = br.read(16) * 10
        else:
            raise ValueError(f"invalid sample rate code {sr_code}")
        bps = si_bps if bps_code == 0 else _BPS_CODE[bps_code]
        hdr_end = br.pos >> 3
        crc8 = br.read(8)
        if _crc8(buf[frame_start:hdr_end]) != crc8:
            raise ValueError("FLAC frame header CRC-8 mismatch")

        if ch_code < 8:
            nch = ch_code + 1
            subs = [_decode_subframe(br, bs, bps) for _ in range(nch)]
        elif ch_code == 8:  # left/side
            left = _decode_subframe(br, bs, bps)
            side = _decode_subframe(br, bs, bps + 1)
            subs = [left, left - side]
        elif ch_code == 9:  # right/side
            side = _decode_subframe(br, bs, bps + 1)
            right = _decode_subframe(br, bs, bps)
            subs = [right + side, right]
        elif ch_code == 10:  # mid/side
            mid = _decode_subframe(br, bs, bps)
            side = _decode_subframe(br, bs, bps + 1)
            m2 = (mid << 1) | (side & 1)
            subs = [(m2 + side) >> 1, (m2 - side) >> 1]
        else:
            raise ValueError(f"reserved channel assignment {ch_code}")
        br.align()
        frame_end = br.pos >> 3
        (crc16,) = struct.unpack_from(">H", buf, frame_end)
        if _crc16(buf[frame_start:frame_end]) != crc16:
            raise ValueError("FLAC frame CRC-16 mismatch")
        pos = frame_end + 2
        for c, s in zip(chans, subs):
            c.append(s)
        got += bs

    cols = [np.concatenate(c) if c else np.empty(0, np.int64) for c in chans]
    out = cols[0] if len(cols) == 1 else np.stack(cols, axis=1)
    if total:
        out = out[:total] if out.ndim == 1 else out[:total, :]
    if si_bps > 16:  # 20/24/32-bit masters: scale to int16 (WAV-path rule)
        out = out >> (si_bps - 16)
    elif si_bps < 16:
        out = out << (16 - si_bps)
    info = np.iinfo(np.int16)
    if out.size and (out.max() > info.max or out.min() < info.min):
        raise ValueError(f"{si_bps}-bit FLAC sample exceeds its range")
    return out.astype(np.int16), rate if got else si_rate


# ---------------------------------------------------------------------------
# MP3 frame-header metadata (probe only — synthesis decode stays gated)
# ---------------------------------------------------------------------------

_MP3_BITRATES = {  # kbps, MPEG-1 Layer III
    1: 32, 2: 40, 3: 48, 4: 56, 5: 64, 6: 80, 7: 96, 8: 112,
    9: 128, 10: 160, 11: 192, 12: 224, 13: 256, 14: 320,
}
_MP3_RATES = {0: 44100, 1: 48000, 2: 32000}


def mp3_probe(buf: bytes) -> dict:
    """Metadata from an MPEG-1 Layer III stream by walking frame headers
    (the public MPEG-1 audio framing): sample rate, channel count, average
    bitrate, frame count and a duration estimate. Skips a leading ID3v2
    tag. Audio SYNTHESIS (huffman + IMDCT) is the declared mp3 gate — this
    probe gives pipelines the catalog metadata layer without it."""
    if not isinstance(buf, bytes):
        buf = bytes(buf)
    pos = 0
    if buf[:3] == b"ID3":  # ID3v2: 10-byte header + syncsafe size
        size = ((buf[6] & 0x7F) << 21) | ((buf[7] & 0x7F) << 14) \
            | ((buf[8] & 0x7F) << 7) | (buf[9] & 0x7F)
        pos = 10 + size
    n = len(buf)
    frames = 0
    samples = 0
    rate = None
    channels = None
    kbps_total = 0
    while pos + 4 <= n:
        h = int.from_bytes(buf[pos : pos + 4], "big")
        if (h >> 21) != 0x7FF or ((h >> 19) & 3) != 3 or ((h >> 17) & 3) != 1:
            break  # not an MPEG-1 Layer III header
        br_idx = (h >> 12) & 0xF
        sr_idx = (h >> 10) & 3
        if br_idx not in _MP3_BITRATES or sr_idx not in _MP3_RATES:
            break
        kbps = _MP3_BITRATES[br_idx]
        rate = _MP3_RATES[sr_idx]
        padding = (h >> 9) & 1
        channels = 1 if ((h >> 6) & 3) == 3 else 2
        frame_len = 144 * kbps * 1000 // rate + padding
        frames += 1
        samples += 1152  # MPEG-1 Layer III samples per frame
        kbps_total += kbps
        pos += frame_len
    if frames == 0:
        raise ValueError("no MPEG-1 Layer III frames found")
    return {
        "sample_rate": rate,
        "channels": channels,
        "n_frames": frames,
        "duration_s": round(samples / rate, 4),
        "avg_kbps": round(kbps_total / frames, 1),
    }


def flac_probe(buf: bytes) -> dict:
    """STREAMINFO-only metadata (no frame decode): sample rate, channels,
    bits per sample, total samples, duration."""
    if bytes(buf[:4]) != _MAGIC:
        raise ValueError("not a FLAC stream")
    pos = 4
    while True:
        hdr = buf[pos]
        blen = int.from_bytes(buf[pos + 1 : pos + 4], "big")
        if (hdr & 0x7F) == 0:
            si = buf[pos + 4 : pos + 4 + blen]
            packed = int.from_bytes(si[10:18], "big")
            rate = packed >> 44
            nch = ((packed >> 41) & 0x7) + 1
            bps = ((packed >> 36) & 0x1F) + 1
            total = packed & ((1 << 36) - 1)
            return {
                "sample_rate": rate, "channels": nch, "bits": bps,
                "n_samples": total,
                "duration_s": round(total / rate, 4) if rate else 0.0,
            }
        pos += 4 + blen
        if hdr & 0x80:
            break
    raise ValueError("FLAC stream missing STREAMINFO")
