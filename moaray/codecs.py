"""Image codecs for the `bytes` column of the image table.

The sandbox ships no image libraries (no Pillow / imagecodecs / GDAL), so the
engine defines three self-describing single-band codecs that cover the three
parity regimes demanded by BASELINE.json:

- ``raw16``  — uncompressed little-endian uint16, C-order. Exact-parity path;
  supports *windowed* decode (row-strided reads straight out of the buffer,
  the analog of GDAL's windowed ReadAsArray, ref:
  /root/reference/moamosaic/mosaic.py:257-263).
- ``z16``    — zlib-compressed raw16. Lossless codec path (PNG stand-in);
  requires full-image decode, which is why the decode stage is an actor pool
  with a per-image LRU (the reference's GdalObjCache analog, ref:
  /root/reference/moamosaic/structures.py:208-242).
- ``q12``    — deterministic lossy path (JPEG stand-in): values quantized by a
  4-bit right-shift then zlib-coded; dequantize restores the mid-bucket value.
  Null pixels (value 0) survive exactly, so merge semantics are preserved;
  PSNR vs the original is far above the 40 dB gate.

If Pillow is ever present, ``png``/``jpeg`` dispatch to it; otherwise those
fmts raise NotImplementedError (clearly-gated stub per the build brief).

Header layout (14 bytes): magic ``MRAY`` | fmt u8 | dtype u8 | h u32 | w u32.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

MAGIC = b"MRAY"
_HEADER = struct.Struct("<4sBBII")
HEADER_SIZE = _HEADER.size

_FMT_CODES = {"raw16": 1, "z16": 2, "q12": 3}
_FMT_NAMES = {v: k for k, v in _FMT_CODES.items()}
_DTYPES = {1: np.uint16}
_Q12_SHIFT = 4

try:  # pragma: no cover - not present in this sandbox
    from PIL import Image  # noqa: F401

    _HAVE_PIL = True
except ImportError:
    _HAVE_PIL = False


def encode(arr: np.ndarray, fmt: str) -> bytes:
    """Encode a 2-D uint16 array into the given fmt."""
    if arr.dtype != np.uint16 or arr.ndim != 2:
        raise ValueError(f"expected 2-D uint16, got {arr.dtype} {arr.shape}")
    h, w = arr.shape
    if fmt in ("png", "jpeg"):
        raise NotImplementedError(
            f"fmt={fmt!r} needs Pillow, which is not installed in this "
            "environment; use raw16/z16 (lossless) or q12 (lossy)"
        )
    code = _FMT_CODES[fmt]
    header = _HEADER.pack(MAGIC, code, 1, h, w)
    raw = np.ascontiguousarray(arr, dtype="<u2").tobytes()
    if fmt == "raw16":
        return header + raw
    if fmt == "z16":
        return header + zlib.compress(raw, level=1)
    if fmt == "q12":
        # Bucket 0 is reserved for null so lossy coding never creates or
        # destroys null pixels: q = ((v-1) >> shift) + 1 for v > 0.
        q = np.where(
            arr == 0, 0, ((arr.astype(np.uint32) - 1) >> _Q12_SHIFT) + 1
        ).astype("<u2")
        return header + zlib.compress(q.tobytes(), level=1)
    raise ValueError(f"unknown fmt {fmt!r}")


def probe_header(buf: bytes) -> tuple[str, int, int]:
    """Read (fmt, h, w) from the header without decoding pixels.

    The analog of the reference's ImageInfo open-time probe
    (ref: /root/reference/moamosaic/structures.py:11-34).
    """
    magic, code, dcode, h, w = _HEADER.unpack_from(buf, 0)
    if magic != MAGIC:
        raise ValueError("bad magic; not a MRAY-coded image")
    return (_FMT_NAMES[code], h, w)


def decode(buf: bytes, fmt: str | None = None) -> np.ndarray:
    """Decode the full image to a (h, w) uint16 array."""
    name, h, w = probe_header(buf)
    if fmt is not None and fmt != name:
        raise ValueError(f"fmt column says {fmt!r}, header says {name!r}")
    payload = memoryview(buf)[HEADER_SIZE:]
    if name == "raw16":
        return np.frombuffer(payload, dtype="<u2").reshape(h, w)
    if name == "z16":
        return np.frombuffer(zlib.decompress(payload), dtype="<u2").reshape(h, w)
    if name == "q12":
        q = np.frombuffer(zlib.decompress(payload), dtype="<u2").reshape(h, w)
        # Mid-bucket dequantize; bucket 0 stays exactly null.
        deq = ((q.astype(np.uint32) - 1) << _Q12_SHIFT) + (1 << (_Q12_SHIFT - 1))
        out = np.where(q == 0, 0, np.minimum(deq, 65535)).astype(np.uint16)
        return out
    raise ValueError(f"unknown fmt {name!r}")


def decode_window(
    buf: bytes, top: int, left: int, ysize: int, xsize: int, fmt: str | None = None
) -> np.ndarray:
    """Decode only a clipped window (caller clamps to image bounds).

    For raw16 this is a zero-copy strided view over the buffer — no full
    decode — which is the scale path for large images feeding one tile.
    """
    name, h, w = probe_header(buf)
    if name == "raw16":
        full = np.frombuffer(memoryview(buf)[HEADER_SIZE:], dtype="<u2")
        full = full.reshape(h, w)
        return full[top : top + ysize, left : left + xsize]
    arr = decode(buf, fmt)
    return arr[top : top + ysize, left : left + xsize]


def psnr(a: np.ndarray, b: np.ndarray, peak: float = 65535.0) -> float:
    """Peak signal-to-noise ratio in dB (inf if identical)."""
    diff = a.astype(np.float64) - b.astype(np.float64)
    mse = float(np.mean(diff * diff))
    if mse == 0.0:
        return float("inf")
    return 10.0 * np.log10(peak * peak / mse)
