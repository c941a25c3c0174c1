"""GIF (87a/89a) — from scratch, per the public GIF89a specification.

Web corpora are full of GIFs (and animated GIFs are short videos in
disguise): this module decodes stills AND animations with zero image
libraries, feeding the same multimodal stages as PNG/JPEG/MP4.

- ``gif_decode``: first frame as (h, w, 3) uint8 RGB (or (h, w, 4) when
  a transparent index is declared), composited on the logical screen.
- ``gif_frames``: every frame of an animation composited in sequence
  (disposal methods: unspecified/keep, restore-background,
  restore-previous), with per-frame delays — FrameSample uses this for
  ``fmt == "gif"`` payloads.
- ``gif_encode``: single- or multi-frame encoder for round-trip tests
  (<=256 distinct colors; GIF-flavor LZW).

GIF LZW differs from the TIFF flavor (sinks/gtiff.py): LSB-first bit
packing, code width grows at 2^width (NO early change), dynamic initial
code size, data carried in 255-byte sub-blocks.
"""

from __future__ import annotations

import struct

import numpy as np

_HDR89 = b"GIF89a"
_HDR87 = b"GIF87a"


# ---------------------------------------------------------------------------
# GIF-flavor LZW (LSB-first, no early change)
# ---------------------------------------------------------------------------

def _gif_lzw_encode(indices: bytes, mcs: int) -> bytes:
    clear = 1 << mcs
    eoi = clear + 1
    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int, width: int):
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    table = {bytes([i]): i for i in range(clear)}
    next_code = eoi + 1
    width = mcs + 1
    emit(clear, width)
    w = b""
    for b in indices:
        wc = w + bytes([b])
        if wc in table:
            w = wc
            continue
        emit(table[w], width)
        table[wc] = next_code
        next_code += 1
        if next_code == (1 << width) + 1 and width < 12:
            # decoder bumps when ITS next entry would not fit; encoder's
            # table leads by one entry, hence the +1
            width += 1
        w = bytes([b])
        if next_code >= 4095:
            emit(table[w], width)
            emit(clear, width)
            table = {bytes([i]): i for i in range(clear)}
            next_code = eoi + 1
            width = mcs + 1
            w = b""
    if w:
        emit(table[w], width)
    emit(eoi, width)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def _gif_lzw_decode(data: bytes, mcs: int, n_expected: int) -> bytes:
    clear = 1 << mcs
    eoi = clear + 1
    out = bytearray()
    pos = 0
    total = len(data) * 8
    width = mcs + 1
    table: list[bytes] = []
    prev: bytes | None = None
    while pos + width <= total and len(out) < n_expected:
        byte0 = pos >> 3
        window = int.from_bytes(data[byte0 : byte0 + 4], "little")
        code = (window >> (pos & 7)) & ((1 << width) - 1)
        pos += width
        if code == eoi:
            break
        if code == clear:
            table = [bytes([i]) for i in range(clear)] + [b"", b""]
            width = mcs + 1
            prev = None
            continue
        if prev is None:
            if code >= clear:
                raise ValueError("GIF LZW stream must start with a literal")
            entry = table[code]
        else:
            if code < len(table):
                entry = table[code]
            elif code == len(table):  # KwKwK
                entry = prev + prev[:1]
            else:
                raise ValueError(f"corrupt GIF LZW stream (code {code})")
            table.append(prev + entry[:1])
        out += entry
        prev = entry
        if len(table) == (1 << width) and width < 12:
            width += 1  # standard (late) change — unlike TIFF
    return bytes(out)


# ---------------------------------------------------------------------------
# container
# ---------------------------------------------------------------------------

_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _deinterlace(idx: np.ndarray) -> np.ndarray:
    h = idx.shape[0]
    out = np.empty_like(idx)
    src = 0
    for y0, dy in _INTERLACE_PASSES:
        n = len(range(y0, h, dy))
        out[y0::dy] = idx[src : src + n]
        src += n
    return out


def gif_frames(buf: bytes):
    """Yield (rgb_or_rgba uint8 array, delay_centiseconds) per frame,
    composited on the logical screen per the disposal method."""
    if not isinstance(buf, bytes):
        buf = bytes(buf)
    if buf[:6] not in (_HDR89, _HDR87):
        raise ValueError("not a GIF stream")
    w, h, packed, bg, _aspect = struct.unpack_from("<HHBBB", buf, 6)
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 7)
        gct = np.frombuffer(buf[pos : pos + 3 * n], np.uint8).reshape(-1, 3)
        pos += 3 * n
    any_alpha = False
    # first pass: detect transparency anywhere (stable output channel count)
    p = pos
    while p < len(buf) and buf[p] != 0x3B:
        if buf[p] == 0x21 and p + 1 < len(buf) and buf[p + 1] == 0xF9:
            if buf[p + 3] & 1:
                any_alpha = True
        if buf[p] == 0x21:
            p += 2
            while p < len(buf) and buf[p]:
                p += 1 + buf[p]
            p += 1
        elif buf[p] == 0x2C:
            p += 9
            lpk = buf[p]
            p += 1
            if lpk & 0x80:
                p += 3 * (2 << (lpk & 7))
            p += 1  # min code size
            while p < len(buf) and buf[p]:
                p += 1 + buf[p]
            p += 1
        else:
            raise ValueError(f"unknown GIF block 0x{buf[p]:02x}")
    channels = 4 if any_alpha else 3

    canvas = np.zeros((h, w, channels), np.uint8)
    if gct is not None and channels == 3:
        canvas[:] = gct[bg]
    transparent = None
    delay = 0
    disposal = 0
    prev_canvas = None
    while pos < len(buf) and buf[pos] != 0x3B:
        block = buf[pos]
        if block == 0x21:  # extension
            label = buf[pos + 1]
            pos += 2
            if label == 0xF9:  # graphic control
                size = buf[pos]
                gpk = buf[pos + 1]
                (delay,) = struct.unpack_from("<H", buf, pos + 2)
                transparent = buf[pos + 4] if gpk & 1 else None
                disposal = (gpk >> 2) & 7
                pos += 1 + size
            else:  # comment/app/plain text: skip sub-blocks
                while buf[pos]:
                    pos += 1 + buf[pos]
            pos += 1  # block terminator
        elif block == 0x2C:  # image descriptor
            left, top, iw, ih = struct.unpack_from("<HHHH", buf, pos + 1)
            lpk = buf[pos + 9]
            pos += 10
            pal = gct
            if lpk & 0x80:
                n = 2 << (lpk & 7)
                pal = np.frombuffer(
                    buf[pos : pos + 3 * n], np.uint8
                ).reshape(-1, 3)
                pos += 3 * n
            if pal is None:
                raise ValueError("GIF image has no color table")
            mcs = buf[pos]
            pos += 1
            chunks = []
            while buf[pos]:
                ln = buf[pos]
                chunks.append(buf[pos + 1 : pos + 1 + ln])
                pos += 1 + ln
            pos += 1
            idx = np.frombuffer(
                _gif_lzw_decode(b"".join(chunks), mcs, iw * ih), np.uint8
            )
            if len(idx) < iw * ih:
                raise ValueError("truncated GIF image data")
            idx = idx[: iw * ih].reshape(ih, iw)
            if lpk & 0x40:
                idx = _deinterlace(idx)
            if disposal == 3:
                prev_canvas = canvas.copy()
            rgb = pal[idx]  # (ih, iw, 3)
            region = canvas[top : top + ih, left : left + iw]
            if transparent is not None:
                opaque = idx != transparent
                region[..., :3][opaque] = rgb[opaque]
                if channels == 4:
                    region[..., 3][opaque] = 255
            else:
                region[..., :3] = rgb
                if channels == 4:
                    region[..., 3] = 255
            yield canvas.copy(), delay
            if disposal == 2:  # restore to background
                area = canvas[top : top + ih, left : left + iw]
                if channels == 4:
                    area[:] = 0
                elif gct is not None:
                    area[:] = gct[bg]
                else:
                    area[:] = 0
            elif disposal == 3 and prev_canvas is not None:
                canvas = prev_canvas
            # GIF89a: a graphic-control extension applies to exactly ONE
            # rendering block — reset so a later frame without its own
            # GCE doesn't inherit this frame's transparency/disposal
            transparent = None
            delay = 0
            disposal = 0
        else:
            raise ValueError(f"unknown GIF block 0x{block:02x}")


def gif_probe(buf: bytes) -> tuple[int, int]:
    if bytes(buf[:6]) not in (_HDR89, _HDR87):
        raise ValueError("not a GIF stream")
    w, h = struct.unpack_from("<HH", buf, 6)
    return h, w


def gif_census(buf: bytes) -> dict:
    """Header-only animation census: frame count and total duration from a
    block walk that SKIPS the LZW image data (sub-block length hopping) —
    the no-synthesis probe the video_metadata pass runs at corpus scale."""
    if not isinstance(buf, bytes):
        buf = bytes(buf)
    if buf[:6] not in (_HDR89, _HDR87):
        raise ValueError("not a GIF stream")
    w, h, packed, _bg, _aspect = struct.unpack_from("<HHBBB", buf, 6)
    pos = 13
    if packed & 0x80:
        pos += 3 * (2 << (packed & 7))
    n_frames = 0
    total_delay_cs = 0
    while pos < len(buf) and buf[pos] != 0x3B:
        if buf[pos] == 0x21:  # extension
            if pos + 1 < len(buf) and buf[pos + 1] == 0xF9:
                total_delay_cs += struct.unpack_from("<H", buf, pos + 4)[0]
            pos += 2
            while pos < len(buf) and buf[pos]:
                pos += 1 + buf[pos]
            pos += 1
        elif buf[pos] == 0x2C:  # image descriptor
            n_frames += 1
            pos += 9
            lpk = buf[pos]
            pos += 1
            if lpk & 0x80:
                pos += 3 * (2 << (lpk & 7))
            pos += 1  # LZW minimum code size
            while pos < len(buf) and buf[pos]:
                pos += 1 + buf[pos]
            pos += 1
        else:
            raise ValueError(f"unknown GIF block 0x{buf[pos]:02x}")
    return {
        "width": int(w), "height": int(h), "n_frames": n_frames,
        "duration_s": round(total_delay_cs / 100.0, 4),
    }


def gif_decode(buf: bytes) -> np.ndarray:
    """First frame as (h, w, 3|4) uint8."""
    for frame, _delay in gif_frames(buf):
        return frame
    raise ValueError("GIF stream has no image data")


def gif_encode(frames, delays_cs=None, interlace: bool = False) -> bytes:
    """Encode one (h, w, 3) uint8 array or a list of them (animation,
    ``delays_cs`` per frame) as GIF89a. All frames together must use
    <= 256 distinct colors (the format's palette model)."""
    if isinstance(frames, np.ndarray):
        frames = [frames]
    if delays_cs is None:
        delays_cs = [10] * len(frames)
    h, w = frames[0].shape[:2]
    stack = np.concatenate([f.reshape(-1, 3) for f in frames])
    palette, inverse = np.unique(stack, axis=0, return_inverse=True)
    if len(palette) > 256:
        raise ValueError(
            f"GIF needs <= 256 distinct colors, got {len(palette)}"
        )
    pal_bits = max(1, int(len(palette) - 1).bit_length())
    pal_n = 1 << pal_bits
    pal_bytes = np.zeros((pal_n, 3), np.uint8)
    pal_bytes[: len(palette)] = palette
    out = bytearray()
    out += _HDR89
    out += struct.pack("<HHBBB", w, h, 0x80 | (pal_bits - 1), 0, 0)
    out += pal_bytes.tobytes()
    mcs = max(2, pal_bits)
    frame_sizes = [f.shape[0] * f.shape[1] for f in frames]
    starts = np.cumsum([0] + frame_sizes[:-1])
    for fi, f in enumerate(frames):
        fh, fw = f.shape[:2]
        out += bytes([0x21, 0xF9, 4, 0])
        out += struct.pack("<H", delays_cs[fi]) + bytes([0, 0])
        out += bytes([0x2C]) + struct.pack("<HHHH", 0, 0, fw, fh)
        out += bytes([0x40 if interlace else 0])
        idx = inverse[starts[fi] : starts[fi] + fh * fw].astype(np.uint8)
        if interlace:
            rows = idx.reshape(fh, fw)
            parts = [rows[y0::dy] for y0, dy in _INTERLACE_PASSES]
            idx = np.concatenate(parts).reshape(-1)
        out += bytes([mcs])
        lzw = _gif_lzw_encode(idx.tobytes(), mcs)
        for i in range(0, len(lzw), 255):
            chunk = lzw[i : i + 255]
            out += bytes([len(chunk)]) + chunk
        out += b"\x00"
    out += b"\x3b"
    return bytes(out)
