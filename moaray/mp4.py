"""MP4 / ISO-BMFF container parsing — from scratch, per the public
ISO/IEC 14496-12 box structure.

Upgrades the video gate from a whole-container stub to the shape the
brief asks for: the CONTAINER layer (box walk, track headers, sample
tables, per-frame byte ranges + timestamps + keyframe flags) is real and
tested; only the codec-payload decode (H.264/H.265 entropy coding) stays
behind an explicit NotImplementedError — that genuinely needs
pyav/ffmpeg, which this sandbox does not have. FrameSample uses this to
slice ENCODED frame samples out of `fmt == "mp4"` payloads zero-copy.

`mp4_mux` is a minimal single-track muxer used by the round-trip tests
(no media library can produce fixtures here); it writes a spec-shaped
ftyp/mdat/moov file with real stts/stsc/stsz/stco/stss tables.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass, field


@dataclass
class Mp4Track:
    track_id: int
    handler: str          # 'vide' / 'soun'
    codec: str            # sample-entry fourcc, e.g. 'avc1'
    width: int
    height: int
    timescale: int
    sizes: list[int] = field(default_factory=list)
    offsets: list[int] = field(default_factory=list)   # absolute file offsets
    timestamps: list[int] = field(default_factory=list)  # decode ts (track ts units)
    sync: list[bool] = field(default_factory=list)     # keyframe flags


def _walk(buf: bytes, start: int, end: int):
    """Yield (fourcc, body_start, body_end) for each box in [start, end)."""
    pos = start
    while pos + 8 <= end:
        (size,) = struct.unpack_from(">I", buf, pos)
        fourcc = buf[pos + 4 : pos + 8].decode("latin1")
        body = pos + 8
        if size == 1:  # 64-bit largesize
            (size,) = struct.unpack_from(">Q", buf, pos + 8)
            body = pos + 16
        elif size == 0:  # to end of file
            size = end - pos
        if size < 8 or pos + size > end:
            raise ValueError(f"corrupt box {fourcc!r} at {pos}")
        yield fourcc, body, pos + size
        pos += size


def _find(buf, start, end, fourcc):
    for fc, b, e in _walk(buf, start, end):
        if fc == fourcc:
            return b, e
    return None


def mp4_parse(buf: bytes) -> list[Mp4Track]:
    """Parse the moov sample tables; returns one Mp4Track per trak with
    fully-resolved per-sample (offset, size, timestamp, sync)."""
    if not isinstance(buf, bytes):
        buf = bytes(buf)
    moov = _find(buf, 0, len(buf), "moov")
    if moov is None:
        raise ValueError("not an MP4: no moov box")
    tracks = []
    for fc, b, e in _walk(buf, *moov):
        if fc != "trak":
            continue
        tracks.append(_parse_trak(buf, b, e))
    return tracks


def _parse_trak(buf, b, e) -> Mp4Track:
    tkhd = _find(buf, b, e, "tkhd")
    version = buf[tkhd[0]]
    # width/height: last 8 bytes of tkhd, 16.16 fixed point
    w = struct.unpack_from(">I", buf, tkhd[1] - 8)[0] >> 16
    h = struct.unpack_from(">I", buf, tkhd[1] - 4)[0] >> 16
    tid_off = tkhd[0] + (4 + 8 + 4 if version == 0 else 4 + 16 + 4)
    # layout: version/flags(4) + times + track_id; for v0: ctime(4)+mtime(4)
    track_id = struct.unpack_from(
        ">I", buf, tkhd[0] + (12 if version == 0 else 20)
    )[0]
    del tid_off
    mdia = _find(buf, b, e, "mdia")
    mdhd = _find(buf, *mdia, "mdhd")
    mver = buf[mdhd[0]]
    timescale = struct.unpack_from(
        ">I", buf, mdhd[0] + (12 if mver == 0 else 20)
    )[0]
    hdlr = _find(buf, *mdia, "hdlr")
    handler = buf[hdlr[0] + 8 : hdlr[0] + 12].decode("latin1")
    minf = _find(buf, *mdia, "minf")
    stbl = _find(buf, *minf, "stbl")

    stsd = _find(buf, *stbl, "stsd")
    codec = buf[stsd[0] + 8 + 4 : stsd[0] + 8 + 8].decode("latin1")

    def table(fourcc):
        t = _find(buf, *stbl, fourcc)
        return t

    # stsz: sample sizes
    stsz = table("stsz")
    uniform, count = struct.unpack_from(">II", buf, stsz[0] + 4)
    if uniform:
        sizes = [uniform] * count
    else:
        sizes = list(struct.unpack_from(f">{count}I", buf, stsz[0] + 12))

    # stts: decode timestamps
    stts = table("stts")
    (n_ent,) = struct.unpack_from(">I", buf, stts[0] + 4)
    timestamps = []
    t = 0
    off = stts[0] + 8
    for _ in range(n_ent):
        cnt, delta = struct.unpack_from(">II", buf, off)
        off += 8
        for _ in range(cnt):
            timestamps.append(t)
            t += delta

    # stco / co64: chunk offsets
    stco = table("stco")
    if stco is not None:
        (n_chunks,) = struct.unpack_from(">I", buf, stco[0] + 4)
        chunk_offsets = list(
            struct.unpack_from(f">{n_chunks}I", buf, stco[0] + 8)
        )
    else:
        co64 = table("co64")
        (n_chunks,) = struct.unpack_from(">I", buf, co64[0] + 4)
        chunk_offsets = list(
            struct.unpack_from(f">{n_chunks}Q", buf, co64[0] + 8)
        )

    # stsc: samples per chunk (runs of chunks)
    stsc = table("stsc")
    (n_runs,) = struct.unpack_from(">I", buf, stsc[0] + 4)
    runs = [
        struct.unpack_from(">III", buf, stsc[0] + 8 + 12 * i)
        for i in range(n_runs)
    ]  # (first_chunk 1-based, samples_per_chunk, sample_desc_idx)

    # resolve absolute per-sample offsets
    offsets = []
    si = 0
    for ci, coff in enumerate(chunk_offsets):
        spc = 0
        for first, n_spc, _d in runs:
            if ci + 1 >= first:
                spc = n_spc
        pos = coff
        for _ in range(spc):
            if si >= len(sizes):
                break
            offsets.append(pos)
            pos += sizes[si]
            si += 1

    # stss: sync (key) samples; absent => every sample is sync
    stss = table("stss")
    sync = [True] * len(sizes)
    if stss is not None:
        sync = [False] * len(sizes)
        (n_sync,) = struct.unpack_from(">I", buf, stss[0] + 4)
        for i in range(n_sync):
            (snum,) = struct.unpack_from(">I", buf, stss[0] + 8 + 4 * i)
            sync[snum - 1] = True

    if len(offsets) != len(sizes):
        raise ValueError(
            f"sample table mismatch: {len(offsets)} offsets vs "
            f"{len(sizes)} sizes"
        )
    return Mp4Track(
        track_id=track_id, handler=handler, codec=codec, width=w, height=h,
        timescale=timescale, sizes=sizes, offsets=offsets,
        timestamps=timestamps, sync=sync,
    )


# ---------------------------------------------------------------------------
# minimal muxer (test fixtures; single video track, one chunk per N samples)
# ---------------------------------------------------------------------------

def _box(fourcc: bytes, body: bytes) -> bytes:
    return struct.pack(">I", 8 + len(body)) + fourcc + body


def mp4_mux(frames: list[bytes], w: int, h: int, fps: int = 30,
            codec: str = "avc1", samples_per_chunk: int = 5,
            sync_every: int = 5) -> bytes:
    """Write a single-video-track MP4 holding ``frames`` as opaque encoded
    samples (the payload bytes are NOT validated — the container does not
    care). Real stts/stsc/stsz/stco/stss tables; used by tests and any
    pipeline that needs a spec-shaped fixture."""
    timescale = fps * 100
    delta = 100
    n = len(frames)
    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isommp41")
    mdat_payload = b"".join(frames)
    # mdat follows ftyp; moov goes LAST so chunk offsets are known early
    mdat_start = len(ftyp) + 8

    sizes = [len(f) for f in frames]
    chunk_offsets = []
    pos = mdat_start
    for i in range(0, n, samples_per_chunk):
        chunk_offsets.append(pos)
        pos += sum(sizes[i : i + samples_per_chunk])

    unity = struct.pack(">9i", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0,
                        0x40000000)  # identity transform matrix
    # mvhd v0: flags, ctime, mtime, timescale, duration, rate 1.0,
    # volume 1.0, 10 reserved bytes, matrix, 24 predefined, next_track_id
    mvhd = _box(b"mvhd",
                struct.pack(">B3x", 0)
                + struct.pack(">IIII", 0, 0, timescale, n * delta)
                + struct.pack(">iH", 0x00010000, 0x0100) + b"\x00" * 10
                + unity + b"\x00" * 24 + struct.pack(">I", 2))
    # tkhd v0 (flags=7: enabled+in-movie+in-preview): ctime, mtime,
    # track_id, 4 reserved, duration, 8 reserved, layer, alt_group,
    # volume, 2 reserved, matrix, width/height as 16.16
    tkhd = _box(b"tkhd",
                struct.pack(">B3B", 0, 0, 0, 7)
                + struct.pack(">III4xI8x", 0, 0, 1, n * delta)
                + struct.pack(">hhH2x", 0, 0, 0)
                + unity + struct.pack(">II", w << 16, h << 16))
    mdhd = _box(b"mdhd", struct.pack(
        ">B3xIIII", 0, 0, 0, timescale, n * delta) + struct.pack(">HH", 0x55C4, 0))
    hdlr = _box(b"hdlr", b"\x00" * 8 + b"vide" + b"\x00" * 12 + b"moaray\x00")
    # sample entry: fourcc + 78-byte visual sample entry (zero-filled except
    # data_reference_index / width / height)
    entry = codec.encode("latin1") + b"\x00" * 6 + struct.pack(">H", 1)
    entry += b"\x00" * 16 + struct.pack(">HH", w, h)
    entry += struct.pack(">II", 0x480000, 0x480000) + b"\x00" * 4
    entry += struct.pack(">H", 1) + b"\x00" * 32
    entry += struct.pack(">Hh", 0x18, -1)
    stsd = _box(b"stsd", struct.pack(">B3xI", 0, 1)
                + struct.pack(">I", 8 + len(entry)) + entry)
    stts = _box(b"stts", struct.pack(">B3xIII", 0, 1, n, delta))
    stsc_runs = struct.pack(">III", 1, samples_per_chunk, 1)
    stsc = _box(b"stsc", struct.pack(">B3xI", 0, 1) + stsc_runs)
    stsz = _box(b"stsz", struct.pack(">B3xII", 0, 0, n)
                + struct.pack(f">{n}I", *sizes))
    stco = _box(b"stco", struct.pack(">B3xI", 0, len(chunk_offsets))
                + struct.pack(f">{len(chunk_offsets)}I", *chunk_offsets))
    syncs = list(range(1, n + 1, sync_every))
    stss = _box(b"stss", struct.pack(">B3xI", 0, len(syncs))
                + struct.pack(f">{len(syncs)}I", *syncs))
    dref = _box(b"dref", struct.pack(">B3xI", 0, 1)
                + _box(b"url ", struct.pack(">B3B", 0, 0, 0, 1)))
    dinf = _box(b"dinf", dref)
    vmhd = _box(b"vmhd", struct.pack(">B3BHHHH", 0, 0, 0, 1, 0, 0, 0, 0))
    stbl = _box(b"stbl", stsd + stts + stsc + stsz + stco + stss)
    minf = _box(b"minf", vmhd + dinf + stbl)
    mdia = _box(b"mdia", mdhd + hdlr + minf)
    trak = _box(b"trak", tkhd + mdia)
    moov = _box(b"moov", mvhd + trak)
    return ftyp + _box(b"mdat", mdat_payload) + moov
