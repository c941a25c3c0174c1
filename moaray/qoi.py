"""QOI ("Quite OK Image") codec from the published one-page spec.

8-bit RGB(A) lossless: 64-entry hash-indexed color cache, 2-bit channel
diffs, luma diffs, and run-length ops. Encode/decode are exact inverses;
grayscale 2-D uint8 arrays ride as replicated RGB and collapse back on
decode. The per-pixel op loop is inherent to the format's sequential
state (cache + previous pixel) — QOI is a fixture/interchange codec here,
not the mosaic hot path (raw16/z16/png are).

Layout: "qoif" magic, BE u32 width/height, channels (3/4), colorspace;
ops 0xFE RGB, 0xFF RGBA, 00xxxxxx INDEX, 01xxxxxx DIFF (bias 2),
10xxxxxx LUMA (dg bias 32; dr-dg / db-dg bias 8), 11xxxxxx RUN
(bias -1, max 62); stream ends with 7*0x00 + 0x01.
"""

from __future__ import annotations

import struct

import numpy as np

QOI_MAGIC = b"qoif"


def _hash(r: int, g: int, b: int, a: int) -> int:
    return (r * 3 + g * 5 + b * 7 + a * 11) % 64


def qoi_encode(arr: np.ndarray) -> bytes:
    """(h, w) uint8 grayscale, (h, w, 3) RGB or (h, w, 4) RGBA -> QOI."""
    a8 = np.asarray(arr)
    if a8.dtype != np.uint8:
        raise ValueError("QOI is 8-bit only")
    if a8.ndim == 2:
        px = np.repeat(a8[:, :, None], 3, axis=2)
        channels = 3
    elif a8.ndim == 3 and a8.shape[2] in (3, 4):
        px = a8
        channels = a8.shape[2]
    else:
        raise ValueError(f"unsupported shape {a8.shape}")
    h, w = px.shape[:2]
    flat = px.reshape(-1, channels)
    out = bytearray()
    out += QOI_MAGIC + struct.pack(">IIBB", w, h, channels, 0)
    cache = [(0, 0, 0, 0)] * 64
    pr, pg, pb, pa = 0, 0, 0, 255
    run = 0
    for i in range(len(flat)):
        r, g, b = int(flat[i, 0]), int(flat[i, 1]), int(flat[i, 2])
        a = int(flat[i, 3]) if channels == 4 else 255
        if (r, g, b, a) == (pr, pg, pb, pa):
            run += 1
            if run == 62:
                out.append(0xC0 | (run - 1))
                run = 0
            continue
        if run:
            out.append(0xC0 | (run - 1))
            run = 0
        idx = _hash(r, g, b, a)
        if cache[idx] == (r, g, b, a):
            out.append(idx)
        else:
            cache[idx] = (r, g, b, a)
            if a == pa:
                dr = (r - pr + 256) % 256
                dg = (g - pg + 256) % 256
                db = (b - pb + 256) % 256
                sdr = dr - 256 if dr > 127 else dr
                sdg = dg - 256 if dg > 127 else dg
                sdb = db - 256 if db > 127 else db
                if -2 <= sdr <= 1 and -2 <= sdg <= 1 and -2 <= sdb <= 1:
                    out.append(0x40 | ((sdr + 2) << 4) | ((sdg + 2) << 2)
                               | (sdb + 2))
                elif (-32 <= sdg <= 31 and -8 <= sdr - sdg <= 7
                      and -8 <= sdb - sdg <= 7):
                    out.append(0x80 | (sdg + 32))
                    out.append(((sdr - sdg + 8) << 4) | (sdb - sdg + 8))
                else:
                    out += bytes((0xFE, r, g, b))
            else:
                out += bytes((0xFF, r, g, b, a))
        pr, pg, pb, pa = r, g, b, a
    if run:
        out.append(0xC0 | (run - 1))
    out += b"\x00" * 7 + b"\x01"
    return bytes(out)


def qoi_decode(buf: bytes) -> np.ndarray:
    """QOI -> (h, w) uint8 if all channels equal, else (h, w, 3|4)."""
    buf = bytes(buf)
    if buf[:4] != QOI_MAGIC:
        raise ValueError("not a QOI stream")
    w, h, channels, _cs = struct.unpack_from(">IIBB", buf, 4)
    if channels not in (3, 4):
        raise ValueError(f"bad channel count {channels}")
    n = w * h
    out = np.empty((n, 4), dtype=np.uint8)
    cache = [(0, 0, 0, 0)] * 64
    r, g, b, a = 0, 0, 0, 255
    pos = 14
    i = 0
    end = len(buf) - 8
    while i < n and pos < end:
        op = buf[pos]
        pos += 1
        if op == 0xFE:
            r, g, b = buf[pos], buf[pos + 1], buf[pos + 2]
            pos += 3
        elif op == 0xFF:
            r, g, b, a = buf[pos], buf[pos + 1], buf[pos + 2], buf[pos + 3]
            pos += 4
        else:
            tag = op >> 6
            if tag == 0:  # INDEX
                r, g, b, a = cache[op & 0x3F]
            elif tag == 1:  # DIFF
                r = (r + ((op >> 4) & 3) - 2) % 256
                g = (g + ((op >> 2) & 3) - 2) % 256
                b = (b + (op & 3) - 2) % 256
            elif tag == 2:  # LUMA
                dg = (op & 0x3F) - 32
                nxt = buf[pos]
                pos += 1
                r = (r + dg + ((nxt >> 4) & 0x0F) - 8) % 256
                g = (g + dg) % 256
                b = (b + dg + (nxt & 0x0F) - 8) % 256
            else:  # RUN
                run = (op & 0x3F) + 1
                out[i: i + run] = (r, g, b, a)
                i += run
                cache[_hash(r, g, b, a)] = (r, g, b, a)
                continue
        cache[_hash(r, g, b, a)] = (r, g, b, a)
        out[i] = (r, g, b, a)
        i += 1
    if i != n:
        raise ValueError("truncated QOI stream")
    if buf[end:] != b"\x00" * 7 + b"\x01":
        raise ValueError("bad QOI end marker")
    px = out[:, :channels].reshape(h, w, channels)
    if channels == 3 and (px[:, :, 0] == px[:, :, 1]).all() and (
            px[:, :, 1] == px[:, :, 2]).all():
        return px[:, :, 0].copy()
    return px.copy()
