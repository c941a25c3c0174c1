"""AVI (RIFF) container parsing — from scratch, per the public Microsoft
AVI RIFF file format (the `RIFF 'AVI '` / `LIST hdrl` / `LIST movi` / `idx1`
layout; reference counterpart: none — moamosaic has no video path, this
serves the brief's multimodal-column requirement alongside moaray/mp4.py).

Like the MP4 module, the CONTAINER layer is fully real: chunk walk, stream
headers (``strh``/``strf``), per-frame byte ranges from a direct ``movi``
walk (robust even when ``idx1`` is absent or inconsistent), and keyframe
flags from ``idx1`` when present. Codec payloads pass through opaque —
Motion-JPEG streams (``MJPG``/``jpeg``/``dmb1``) decode for REAL through
the engine's from-scratch baseline JPEG decoder (moaray/jpeg.py); anything
needing an external codec (xvid/h264) stays behind the honest
NotImplementedError gate in ops/multimodal.FrameSample.

``avi_mux`` is a minimal single-video-stream muxer for test fixtures (the
sandbox has no media library); it writes spec-shaped avih/strh/strf
headers, an even-padded ``movi`` list and a standard ``idx1`` index.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass, field

_AVIIF_KEYFRAME = 0x10


@dataclass
class AviStream:
    stream_id: int
    fcc_type: str          # 'vids' / 'auds'
    handler: str           # strh fccHandler fourcc (e.g. 'MJPG')
    codec: str             # vids: strf biCompression fourcc; else handler
    width: int
    height: int
    fps: float             # strh dwRate / dwScale
    n_frames: int          # strh dwLength (declared)
    sizes: list[int] = field(default_factory=list)
    offsets: list[int] = field(default_factory=list)  # absolute file offsets
    sync: list[bool] = field(default_factory=list)    # keyframe flags


def _chunks(buf: bytes, start: int, end: int):
    """Yield (fourcc, body_start, body_end) for each RIFF chunk in
    [start, end); chunk bodies are padded to even length."""
    pos = start
    while pos + 8 <= end:
        fourcc = buf[pos : pos + 4].decode("latin1")
        (size,) = struct.unpack_from("<I", buf, pos + 4)
        body = pos + 8
        if body + size > end:
            raise ValueError(f"corrupt AVI chunk {fourcc!r} at {pos}")
        yield fourcc, body, body + size
        pos = body + size + (size & 1)


def avi_parse(buf: bytes) -> list[AviStream]:
    """Parse stream headers + the ``movi`` list; returns one AviStream per
    ``strl`` with fully-resolved per-frame (offset, size, sync)."""
    if not isinstance(buf, bytes):
        buf = bytes(buf)
    if buf[:4] != b"RIFF" or buf[8:12] != b"AVI ":
        raise ValueError("not an AVI: missing RIFF/'AVI ' header")
    streams: list[AviStream] = []
    movi_span = None
    idx1_span = None
    for fc, b, e in _chunks(buf, 12, len(buf)):
        if fc == "LIST":
            ltype = buf[b : b + 4].decode("latin1")
            if ltype == "hdrl":
                _parse_hdrl(buf, b + 4, e, streams)
            elif ltype == "movi":
                movi_span = (b, e)
        elif fc == "idx1":
            idx1_span = (b, e)
    if movi_span is None:
        raise ValueError("AVI missing the movi list")
    # frame byte ranges from a direct movi walk — never trust idx1 offsets
    # (writers disagree on whether they are movi-relative or absolute)
    for fc, b, e in _chunks(buf, movi_span[0] + 4, movi_span[1]):
        if fc == "LIST":  # 'rec ' grouping — descend
            for fc2, b2, e2 in _chunks(buf, b + 4, e):
                _add_sample(streams, fc2, b2, e2)
            continue
        _add_sample(streams, fc, b, e)
    for s in streams:
        s.sync = [True] * len(s.sizes)
    if idx1_span is not None:
        _apply_idx1(buf, idx1_span, streams)
    return streams


def _parse_hdrl(buf, start, end, streams):
    for fc, b, e in _chunks(buf, start, end):
        if fc != "LIST" or buf[b : b + 4] != b"strl":
            continue
        handler = codec = ""
        fcc_type = ""
        w = h = 0
        fps = 0.0
        n_frames = 0
        for sfc, sb, se in _chunks(buf, b + 4, e):
            if sfc == "strh":
                fcc_type = buf[sb : sb + 4].decode("latin1")
                handler = buf[sb + 4 : sb + 8].decode("latin1").strip("\x00")
                scale, rate = struct.unpack_from("<II", buf, sb + 20)
                (n_frames,) = struct.unpack_from("<I", buf, sb + 32)
                fps = rate / scale if scale else 0.0
            elif sfc == "strf" and fcc_type == "vids":
                # BITMAPINFOHEADER: biWidth @+4, biHeight @+8,
                # biCompression @+16 (fourcc, 0 = uncompressed 'DIB ')
                w, h = struct.unpack_from("<ii", buf, sb + 4)
                comp = buf[sb + 16 : sb + 20]
                codec = (
                    comp.decode("latin1").strip("\x00")
                    if comp != b"\x00\x00\x00\x00" else "DIB "
                )
        streams.append(AviStream(
            stream_id=len(streams), fcc_type=fcc_type, handler=handler,
            codec=codec or handler, width=w, height=abs(h), fps=fps,
            n_frames=n_frames,
        ))


def _add_sample(streams, fourcc, body_start, body_end):
    if len(fourcc) != 4 or not fourcc[:2].isdigit():
        return
    sid = int(fourcc[:2])
    kind = fourcc[2:]
    if kind not in ("dc", "db", "wb"):
        return
    if sid >= len(streams):
        raise ValueError(f"movi chunk {fourcc!r} for undeclared stream")
    streams[sid].offsets.append(body_start)
    streams[sid].sizes.append(body_end - body_start)


def _apply_idx1(buf, span, streams):
    b, e = span
    counters = [0] * len(streams)
    for off in range(b, e - 15, 16):
        ckid = buf[off : off + 4].decode("latin1")
        (flags,) = struct.unpack_from("<I", buf, off + 4)
        if len(ckid) != 4 or not ckid[:2].isdigit():
            continue
        sid = int(ckid[:2])
        if sid >= len(streams) or ckid[2:] not in ("dc", "db", "wb"):
            continue
        k = counters[sid]
        if k < len(streams[sid].sync):
            streams[sid].sync[k] = bool(flags & _AVIIF_KEYFRAME)
        counters[sid] += 1


# ---------------------------------------------------------------------------
# minimal muxer (test fixtures; single video stream)
# ---------------------------------------------------------------------------

def _chunk(fourcc: bytes, body: bytes) -> bytes:
    pad = b"\x00" if len(body) & 1 else b""
    return fourcc + struct.pack("<I", len(body)) + body + pad


def _list(ltype: bytes, body: bytes) -> bytes:
    return _chunk(b"LIST", ltype + body)


def avi_mux(frames: list[bytes], w: int, h: int, fps: int = 30,
            handler: str = "MJPG", sync_every: int = 1) -> bytes:
    """Write a single-video-stream AVI holding ``frames`` as opaque encoded
    samples (``00dc`` chunks; payload bytes are NOT validated). Real
    avih/strh/strf headers and a standard idx1 index whose offsets are
    relative to the ``movi`` fourcc per the common convention."""
    n = len(frames)
    fcc = handler.encode("latin1")[:4].ljust(4, b"\x00")
    max_sz = max((len(f) for f in frames), default=0)
    strh = _chunk(b"strh", struct.pack(
        "<4s4sIHHIIIIIIIi4H",
        b"vids", fcc, 0, 0, 0, 0,
        1, fps,              # dwScale / dwRate
        0, n, max_sz,
        0xFFFFFFFF & -1, 0,  # dwQuality (-1 = default), dwSampleSize
        0, 0, w, h,          # rcFrame
    ))
    strf = _chunk(b"strf", struct.pack(
        "<IiiHH4sIiiII", 40, w, h, 1, 24, fcc, w * h * 3, 0, 0, 0, 0))
    strl = _list(b"strl", strh + strf)
    avih = _chunk(b"avih", struct.pack(
        "<IIIIIIIIII4I",
        int(1_000_000 / fps) if fps else 0, 0, 0,
        0x10,                # AVIF_HASINDEX
        n, 0, 1, max_sz, w, h, 0, 0, 0, 0,
    ))
    hdrl = _list(b"hdrl", avih + strl)

    movi_body = b"movi"
    idx_entries = []
    for i, f in enumerate(frames):
        # idx1 offset convention: from the 'movi' fourcc to this chunk's id
        idx_entries.append((len(movi_body), len(f), i))
        movi_body += _chunk(b"00dc", f)
    movi = _chunk(b"LIST", movi_body)
    idx1 = _chunk(b"idx1", b"".join(
        b"00dc" + struct.pack(
            "<III",
            _AVIIF_KEYFRAME if (i % max(sync_every, 1)) == 0 else 0,
            off, sz)
        for off, sz, i in idx_entries
    ))
    body = b"AVI " + hdrl + movi + idx1
    return b"RIFF" + struct.pack("<I", len(body)) + body
