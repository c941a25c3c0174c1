"""Minimal single-band GeoTIFF writer/reader (no GDAL, from the public TIFF
6.0 + GeoTIFF 1.1 specs).

The reference's primary sink is a single GDAL raster file (openOutfile,
ref /root/reference/moamosaic/mosaic.py:604-660). moaray's native sink is
the tile-sharded parquet layout (resumable, parallel); this module is the
single-file assembly step for GDAL-parity workflows: little-endian,
uncompressed, strip-organized uint16, carrying the geotransform
(ModelPixelScale + ModelTiepoint), a minimal GeoKey directory, and GDAL's
NODATA ASCII tag — the fields GDAL reads back for georeferencing.

Write path is deliberately a serial driver-side step (the reference's
single-writer constraint, README.md:21); at scale the parquet sink is the
real output and this is an export.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

from ..geo import GeoTransform

_II = b"II*\x00"

# TIFF tag ids
T_WIDTH = 256
T_LENGTH = 257
T_BITSPERSAMPLE = 258
T_COMPRESSION = 259
T_PHOTOMETRIC = 262
T_STRIPOFFSETS = 273
T_SAMPLESPERPIXEL = 277
T_PLANARCONFIG = 284  # 1 = chunky (interleaved), 2 = planar (band-major)
T_ROWSPERSTRIP = 278
T_STRIPBYTECOUNTS = 279
T_PREDICTOR = 317
T_SAMPLEFORMAT = 339
T_MODELPIXELSCALE = 33550
T_MODELTIEPOINT = 33922
T_GEOKEYDIR = 34735
T_GDAL_METADATA = 42112
T_GDAL_NODATA = 42113

TYPE_SHORT = 3
TYPE_LONG = 4
TYPE_DOUBLE = 12
TYPE_ASCII = 2
TYPE_LONG8 = 16  # BigTIFF 8-byte unsigned

_TYPE_SIZE = {TYPE_SHORT: 2, TYPE_LONG: 4, TYPE_DOUBLE: 8, TYPE_ASCII: 1,
              TYPE_LONG8: 8}
_FMT_FOR_TYPE = {TYPE_SHORT: "H", TYPE_LONG: "I", TYPE_DOUBLE: "d",
                 TYPE_LONG8: "Q"}

_II_BIG = b"II+\x00"  # BigTIFF: version 43


def _first_ifd(data: bytes) -> tuple[int, bool]:
    """(first IFD offset, is_bigtiff) from the TIFF header; raises on
    anything that is not little-endian classic (42) or BigTIFF (43)."""
    if data[:4] == _II:
        (off,) = struct.unpack_from("<I", data, 4)
        return off, False
    if data[:4] == _II_BIG:
        bytesize, zero = struct.unpack_from("<HH", data, 4)
        if bytesize != 8 or zero != 0:
            raise ValueError("malformed BigTIFF header")
        (off,) = struct.unpack_from("<Q", data, 8)
        return off, True
    raise ValueError("not a little-endian TIFF/BigTIFF")


# TIFF SampleFormat values per dtype kind
_SAMPLEFORMAT = {"u": 1, "i": 2, "f": 3}
_KIND_FOR_FORMAT = {v: k for k, v in _SAMPLEFORMAT.items()}

COMPRESSION_NONE = 1
COMPRESSION_LZW = 5      # the most common compression on real-world
                         # GeoTIFFs (GDAL COMPRESS=LZW)
COMPRESSION_DEFLATE = 8  # zlib streams, the reference's default GTiff
                         # creation option (COMPRESS=DEFLATE, mosaic.py:30-35)
COMPRESSION_PACKBITS = 32773  # Apple PackBits RLE (TIFF 6.0 §9)
COMPRESSION_JPEG = 7     # new-style JPEG-in-TIFF (TTN2): each strip/tile
                         # is a JPEG stream, optionally abbreviated against
                         # a shared JPEGTables tag — the standard lossy
                         # aerial-imagery GeoTIFF combo
T_JPEGTABLES = 347

_COMPRESSION_TAG = {
    None: COMPRESSION_NONE,
    "deflate": COMPRESSION_DEFLATE,
    "lzw": COMPRESSION_LZW,
    "packbits": COMPRESSION_PACKBITS,
    "jpeg": COMPRESSION_JPEG,
}

_LZW_CLEAR, _LZW_EOI = 256, 257


def _lzw_encode(raw: bytes) -> bytes:
    """TIFF-flavor LZW (TIFF 6.0 §13): MSB-first variable-width codes
    starting at 9 bits with the 'early change' width bump (one code early,
    i.e. when the next entry would be 511/1023/2047), ClearCode=256,
    EOI=257, table reset before entry 4094."""
    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int, width: int):
        nonlocal acc, nbits
        acc = (acc << width) | code
        nbits += width
        while nbits >= 8:
            nbits -= 8
            out.append((acc >> nbits) & 0xFF)
        acc &= (1 << nbits) - 1

    table: dict[bytes, int] = {bytes([i]): i for i in range(256)}
    next_code = 258
    width = 9
    emit(_LZW_CLEAR, width)
    w = b""
    for b in raw:
        wc = w + bytes([b])
        if wc in table:
            w = wc
            continue
        emit(table[w], width)
        table[wc] = next_code
        next_code += 1
        # the encoder's table leads the decoder's by one entry (the decoder
        # appends on the NEXT code), so its early-change point is one later
        if next_code == (1 << width) and width < 12:
            width += 1
        w = bytes([b])
        if next_code >= 4094:  # keep inside 12-bit space (spec)
            emit(table[w], width)
            emit(_LZW_CLEAR, width)
            table = {bytes([i]): i for i in range(256)}
            next_code = 258
            width = 9
            w = b""
    if w:
        emit(table[w], width)
    emit(_LZW_EOI, width)
    if nbits:
        out.append((acc << (8 - nbits)) & 0xFF)
    return bytes(out)


def _lzw_decode(buf: bytes) -> bytes:
    """Inverse of :func:`_lzw_encode`; accepts any spec-conforming TIFF LZW
    stream (early-change width rule, mid-stream Clear codes).

    Codes are extracted in vectorized BATCHES: between width changes the
    code width is constant and the number of codes until the next early
    change is known, so a numpy gather pulls them all at once (per-code
    ``int.from_bytes`` halved throughput); Clear/EOI inside a batch just
    truncate it."""
    out = bytearray()
    data = np.frombuffer(buf, np.uint8)
    padded = np.concatenate([data, np.zeros(4, np.uint8)]).astype(np.uint32)
    total = len(buf) * 8
    pos = 0
    width = 9
    table: list[bytes] = []
    prev: bytes | None = None
    pending: list[int] = []  # batch of extracted codes, consumed in order
    pi = 0
    while True:
        if pi >= len(pending):
            avail = (total - pos) // width
            if avail <= 0:
                break
            # codes until the early-change point (or table reset ceiling)
            room = max(1, ((1 << width) - 1) - len(table)) if table else 1
            n = min(avail, room, 65536)
            bp = pos + width * np.arange(n, dtype=np.int64)
            bi = bp >> 3
            w32 = (
                (padded[bi] << 24) | (padded[bi + 1] << 16)
                | (padded[bi + 2] << 8) | padded[bi + 3]
            )
            pending = (
                (w32 >> (32 - (bp & 7) - width).astype(np.uint32))
                & ((1 << width) - 1)
            ).tolist()
            pi = 0
        code = pending[pi]
        pi += 1
        pos += width
        if code == _LZW_EOI:
            break
        if code == _LZW_CLEAR:
            table = [bytes([i]) for i in range(256)] + [b"", b""]
            width = 9
            prev = None
            pending = []  # width/table changed: re-extract
            continue
        if prev is None:
            if code > 255:
                raise ValueError("LZW stream must start with a literal")
            entry = table[code]
        else:
            if code < len(table):
                entry = table[code]
            elif code == len(table):  # KwKwK case
                entry = prev + prev[:1]
            else:
                raise ValueError(f"corrupt LZW stream (code {code})")
            table.append(prev + entry[:1])
        out += entry
        prev = entry
        if len(table) == (1 << width) - 1 and width < 12:
            width += 1  # early change, mirroring the encoder
            pending = []
    return bytes(out)


def _packbits_encode(raw: bytes) -> bytes:
    """PackBits RLE (TIFF 6.0 §9): runs of >=3 equal bytes become
    (257-n, byte); literals batch up to 128."""
    out = bytearray()
    i = 0
    n = len(raw)
    while i < n:
        run = 1
        while i + run < n and run < 128 and raw[i + run] == raw[i]:
            run += 1
        if run >= 3:
            out.append(257 - run)
            out.append(raw[i])
            i += run
            continue
        # literal stretch: until the next >=3 run or 128 bytes
        j = i + 1
        while j < n and (j - i) < 128:
            if j + 2 < n and raw[j] == raw[j + 1] == raw[j + 2]:
                break
            j += 1
        out.append(j - i - 1)
        out += raw[i:j]
        i = j
    return bytes(out)


def _packbits_decode(buf: bytes) -> bytes:
    out = bytearray()
    i = 0
    n = len(buf)
    while i < n:
        c = buf[i]
        i += 1
        if c < 128:
            out += buf[i : i + c + 1]
            i += c + 1
        elif c > 128:
            out += bytes([buf[i]]) * (257 - c)
            i += 1
        # c == 128: no-op
    return bytes(out)


def _encode_block(block: np.ndarray, wire, compress: str | None,
                  predictor: int) -> bytes:
    """Serialize one tile/strip: optional horizontal differencing
    (TIFF Predictor=2, per-sample diff along rows) then optional
    DEFLATE / LZW / PackBits."""
    if predictor == 2:
        d = block.astype(wire).astype(np.int64)
        d[:, 1:] = d[:, 1:] - d[:, :-1]
        # differences wrap modulo the sample width (TIFF spec)
        block = d.astype(wire)
    if compress == "jpeg":
        # self-contained JPEG per strip/tile (legal without JPEGTables);
        # 8-bit baseline for uint8, 12-bit SOF1 for uint16 <= 4095
        from ..jpeg import jpeg_encode

        return jpeg_encode(np.ascontiguousarray(block))
    raw = np.ascontiguousarray(block).astype(wire).tobytes()
    if compress == "deflate":
        return zlib.compress(raw, 6)
    if compress == "lzw":
        return _lzw_encode(raw)
    if compress == "packbits":
        return _packbits_encode(raw)
    if compress is not None:
        raise ValueError(f"unsupported compression {compress!r}")
    return raw


def _decode_block(buf: bytes, shape, dt_le, compression: int,
                  predictor: int, jpeg_tables: bytes | None = None) -> np.ndarray:
    if compression == COMPRESSION_JPEG:
        from ..jpeg import jpeg_decode

        buf = bytes(buf)
        if jpeg_tables:
            # abbreviated stream (TTN2): shared tables minus EOI spliced
            # ahead of the strip's scan data minus its SOI
            tb = bytes(jpeg_tables)
            if tb[-2:] == b"\xff\xd9":
                tb = tb[:-2]
            buf = tb + buf[2:]
        arr = jpeg_decode(buf)
        out = np.zeros(shape, dtype=arr.dtype)
        h = min(shape[0], arr.shape[0])
        w = min(shape[1], arr.shape[1])
        out[:h, :w] = arr[:h, :w]
        return out.astype(dt_le, copy=False)
    if compression == COMPRESSION_DEFLATE:
        buf = zlib.decompress(buf)
    elif compression == COMPRESSION_LZW:
        buf = _lzw_decode(buf)
    elif compression == COMPRESSION_PACKBITS:
        buf = _packbits_decode(buf)
    elif compression != COMPRESSION_NONE:
        raise ValueError(f"unsupported TIFF compression {compression}")
    arr = np.frombuffer(buf, dtype=dt_le).reshape(shape)
    if predictor == 2:
        arr = np.cumsum(arr.astype(np.int64), axis=1).astype(dt_le)
    return arr


def _geokey_payload(crs: str | None) -> bytes:
    """GeoKeyDirectory shorts for a CRS string. For ``EPSG:nnnn`` emits
    GTModelType (2=geographic for 4326, else 1=projected), GTRasterType=1
    (PixelIsArea) and the Geographic/ProjectedCSTypeGeoKey carrying the
    EPSG code — what GDAL reads back as the SRS. Non-EPSG names (AFFINE:,
    LCC:..., engine-internal) keep the minimal projected directory."""
    code = None
    if crs and crs.startswith("EPSG:") and crs[5:].isdigit():
        n = int(crs[5:])
        if n <= 0xFFFF:  # GeoKey values are TIFF SHORTs
            code = n
    if code is None:
        return struct.pack("<8H", 1, 1, 0, 1, 1024, 0, 1, 1)
    if code == 4326:
        keys = [(1024, 2), (1025, 1), (2048, code)]
    else:
        keys = [(1024, 1), (1025, 1), (3072, code)]
    out = [1, 1, 0, len(keys)]
    for kid, val in keys:
        out += [kid, 0, 1, val]
    return struct.pack(f"<{len(out)}H", *out)


def crs_from_geokeys(data: bytes) -> str | None:
    """"EPSG:nnnn" from a GeoTIFF buffer's GeoKey directory (None when the
    file carries no Geographic/ProjectedCSType key)."""
    ifd_off, big = _first_ifd(data)
    tags, _next = _parse_ifd(data, ifd_off, big)
    if T_GEOKEYDIR not in tags:
        return None
    _typ, count, payload = tags[T_GEOKEYDIR]
    vals = struct.unpack(f"<{count}H", payload)
    n_keys = vals[3]
    for i in range(n_keys):
        kid, loc, _cnt, val = vals[4 + 4 * i : 8 + 4 * i]
        if loc == 0 and kid in (2048, 3072):
            return f"EPSG:{val}"
    return None


def write_gtiff(
    path: str,
    arr: np.ndarray,
    transform: GeoTransform,
    crs: str = "",
    nullval: float | None = None,
    rows_per_strip: int = 256,
    compress: str | None = None,
    predictor: int = 1,
    layer_type: str | None = None,
    bigtiff: bool = False,
) -> None:
    """Write a 2-D array (any uint/int/float dtype — the reference writes
    whatever GDAL dtype the inputs carry, mosaic.py:16,354) as a
    little-endian GeoTIFF; ``compress="deflate"`` writes zlib strips
    (TIFF Compression=8), optional integer horizontal-differencing
    Predictor=2. ``bigtiff=True`` writes BigTIFF (version 43, 8-byte
    offsets — the reference's BIGTIFF creation option; required past
    4 GB). A 3-D ``(nbands, h, w)`` array writes a MULTI-BAND file
    (SamplesPerPixel=n, PlanarConfiguration=2, band-major strips — the
    reference's numBands output, ref mosaic.py:604-660)."""
    if arr.ndim == 2:
        bands = arr[None, :, :]
    elif arr.ndim == 3:
        bands = arr
    else:
        raise ValueError(f"expected 2-D or (nbands, h, w), got {arr.shape}")
    if arr.dtype.kind not in _SAMPLEFORMAT:
        raise ValueError(f"unsupported dtype {arr.dtype}")
    if predictor == 2 and arr.dtype.kind == "f":
        raise ValueError("Predictor=2 is integer-only (use 1 for floats)")
    if compress == "jpeg" and predictor == 2:
        raise ValueError("Predictor does not apply to JPEG compression")
    nbands, nrows, ncols = bands.shape
    wire = arr.dtype.newbyteorder("<") if arr.dtype.itemsize > 1 else arr.dtype
    strips = [
        _encode_block(band[r : r + rows_per_strip], wire, compress, predictor)
        for band in bands
        for r in range(0, nrows, rows_per_strip)
    ]

    # out-of-line payloads
    pixel_scale = struct.pack("<3d", transform[1], abs(transform[5]), 0.0)
    tiepoint = struct.pack("<6d", 0.0, 0.0, 0.0, transform[0], transform[3], 0.0)
    geokeys = _geokey_payload(crs)
    nodata_ascii = (
        (f"{nullval:g}".encode() + b"\x00") if nullval is not None else None
    )
    meta_ascii = _gdal_metadata_xml(layer_type)

    entries: list[tuple[int, int, int, bytes]] = []  # (tag, type, count, payload)

    def entry(tag, typ, values):
        if typ == TYPE_ASCII:
            payload = values
            count = len(values)
        else:
            fmt = _FMT_FOR_TYPE[typ]
            if not isinstance(values, (list, tuple)):
                values = [values]
            payload = struct.pack(f"<{len(values)}{fmt}", *values)
            count = len(values)
        entries.append((tag, typ, count, payload))

    n_strips = len(strips)
    off_type = TYPE_LONG8 if bigtiff else TYPE_LONG
    entry(T_WIDTH, TYPE_LONG, ncols)
    entry(T_LENGTH, TYPE_LONG, nrows)
    entry(T_BITSPERSAMPLE, TYPE_SHORT, [arr.dtype.itemsize * 8] * nbands)
    entry(T_COMPRESSION, TYPE_SHORT, _COMPRESSION_TAG[compress])
    entry(T_PHOTOMETRIC, TYPE_SHORT, 1)
    if predictor == 2:
        entry(T_PREDICTOR, TYPE_SHORT, 2)
    entry(T_STRIPOFFSETS, off_type, [0] * n_strips)  # patched below
    entry(T_SAMPLESPERPIXEL, TYPE_SHORT, nbands)
    if nbands > 1:
        entry(T_PLANARCONFIG, TYPE_SHORT, 2)  # band-major planes
    entry(T_ROWSPERSTRIP, TYPE_LONG, rows_per_strip)
    entry(T_STRIPBYTECOUNTS, off_type, [len(s) for s in strips])
    entry(T_SAMPLEFORMAT, TYPE_SHORT,
          [_SAMPLEFORMAT[arr.dtype.kind]] * nbands)
    entries.append((T_MODELPIXELSCALE, TYPE_DOUBLE, 3, pixel_scale))
    entries.append((T_MODELTIEPOINT, TYPE_DOUBLE, 6, tiepoint))
    entries.append((T_GEOKEYDIR, TYPE_SHORT, len(geokeys) // 2, geokeys))
    if nodata_ascii:
        entries.append((T_GDAL_NODATA, TYPE_ASCII, len(nodata_ascii), nodata_ascii))
    if meta_ascii:
        entries.append((T_GDAL_METADATA, TYPE_ASCII, len(meta_ascii), meta_ascii))
    entries.sort(key=lambda e: e[0])

    # layout: header | IFD | out-of-line payloads | strips
    if bigtiff:
        ifd_offset, inline_cap = 16, 8
        ifd_size = 8 + len(entries) * 20 + 8
        ehead, ofmt = "<HHQ", "<Q"
    else:
        ifd_offset, inline_cap = 8, 4
        ifd_size = 2 + len(entries) * 12 + 4
        ehead, ofmt = "<HHI", "<I"
    payload_offset = ifd_offset + ifd_size
    # assign out-of-line payload offsets
    inline: list[bytes] = []
    offsets: list[int] = []
    pos = payload_offset
    for tag, typ, count, payload in entries:
        if len(payload) <= inline_cap:
            inline.append(payload.ljust(inline_cap, b"\x00"))
            offsets.append(-1)
        else:
            inline.append(b"")
            offsets.append(pos)
            pos += len(payload)
    strips_start = pos
    # patch strip offsets payload
    strip_offsets = []
    sp = strips_start
    for s in strips:
        strip_offsets.append(sp)
        sp += len(s)
    for i, (tag, typ, count, payload) in enumerate(entries):
        if tag == T_STRIPOFFSETS:
            payload = struct.pack(
                f"<{n_strips}{'Q' if bigtiff else 'I'}", *strip_offsets
            )
            entries[i] = (tag, typ, count, payload)
            if len(payload) <= inline_cap:
                inline[i] = payload.ljust(inline_cap, b"\x00")

    with open(path, "wb") as f:
        if bigtiff:
            f.write(_II_BIG + struct.pack("<HHQ", 8, 0, ifd_offset))
            f.write(struct.pack("<Q", len(entries)))
        else:
            f.write(_II + struct.pack("<I", ifd_offset))
            f.write(struct.pack("<H", len(entries)))
        for i, (tag, typ, count, payload) in enumerate(entries):
            f.write(struct.pack(ehead, tag, typ, count))
            if len(payload) <= inline_cap:
                f.write(inline[i])
            else:
                f.write(struct.pack(ofmt, offsets[i]))
        f.write(struct.pack(ofmt, 0))  # next IFD
        for tag, typ, count, payload in entries:
            if len(payload) > inline_cap:
                f.write(payload)
        for s in strips:
            f.write(s)


def read_gtiff(path: str) -> tuple[np.ndarray, GeoTransform, float | None]:
    """Read back a GeoTIFF written by :func:`write_gtiff` (little-endian,
    uncompressed, single-band, any uint/int/float sample format).
    Returns (array, transform, nodata)."""
    with open(path, "rb") as f:
        return read_gtiff_bytes(f.read())


def read_gtiff_bytes(
    data: bytes,
) -> tuple[np.ndarray, GeoTransform, float | None]:
    """Parse a GeoTIFF from an in-memory buffer (the streaming-ingest path:
    file bytes arrive via ray.data.read_binary_files, never a second open).
    Handles both strip- and tile-organized layouts; returns the full-res
    (first) IFD only — use read_gtiff_full for embedded overviews."""
    ifd_off, big = _first_ifd(data)
    tags, _next = _parse_ifd(data, ifd_off, big)

    def vals(tag, fmt=None):
        typ, count, payload = tags[tag]
        f = _FMT_FOR_TYPE.get(typ, fmt)
        return struct.unpack(f"<{count}{f}", payload)

    fmt_code = vals(T_SAMPLEFORMAT, "H")[0] if T_SAMPLEFORMAT in tags else 1
    if fmt_code not in _KIND_FOR_FORMAT:
        raise ValueError(f"unsupported TIFF SampleFormat {fmt_code}")
    arr = _ifd_image(data, tags)
    sx, sy, _ = vals(T_MODELPIXELSCALE, "d")
    tp = vals(T_MODELTIEPOINT, "d")
    transform = (tp[3], sx, 0.0, tp[4], 0.0, -sy)
    nodata = None
    if T_GDAL_NODATA in tags:
        nodata = float(tags[T_GDAL_NODATA][2].rstrip(b"\x00").decode())
    return arr, transform, nodata


def read_layer_type(path: str) -> str | None:
    """LAYER_TYPE from the GDAL_METADATA tag (None when absent)."""
    with open(path, "rb") as f:
        data = f.read()
    ifd_off, big = _first_ifd(data)
    tags, _ = _parse_ifd(data, ifd_off, big)
    if T_GDAL_METADATA not in tags:
        return None
    xml = tags[T_GDAL_METADATA][2].rstrip(b"\x00").decode()
    key = 'name="LAYER_TYPE"'
    i = xml.find(key)
    if i < 0:
        return None
    j = xml.find(">", i)
    k = xml.find("<", j)
    return xml[j + 1 : k]


def export_gtiff(res, path: str, band=0, tiled: bool = False,
                 min_overview_size: int = 1024,
                 compress: str | None = "deflate",
                 predictor: int = 1,
                 bigtiff: bool | None = None,
                 rows_per_strip: int = 256) -> None:
    """MosaicResult -> single-file GeoTIFF, STREAMED: tile rows are pulled
    from ``res.tiles_ds`` in row-major order (iter_band_slabs — a Ray-side
    sort, one grid-tile row on the driver at a time) and encoded into
    strips/tiles as they arrive; the IFD lands at the end of the file.
    Driver memory is O(tile_row_height x ncols) regardless of mosaic size,
    which is what makes BigTIFF-scale ``--gtiff`` exports viable (the
    parallel parquet sink remains the at-scale output; the reference's
    single writer streams block-by-block for the same reason, ref
    mosaic.py:286-394).

    ``tiled=True`` writes the reference's default output shape — TILED
    organization with embedded strided-overview IFDs (GTiff TILED +
    writeBlockPyramids, ref mosaic.py:604-660, 720-743).
    ``band="all"`` writes every band of a multi-band mosaic into ONE
    planar multi-band file (the reference's numBands output).

    ``path`` may be an ``s3://`` URI: a single-file TIFF needs a seekable
    target while writing (strip/tile offsets are back-patched into the
    trailing IFD), so the export spools to a local temp file and then
    uploads it as one object (boto3 when available — works on any S3
    dialect — else a chunked pyarrow output stream)."""
    from ..pipelines.mosaic import iter_band_slabs

    if "://" in path:
        if path.startswith("file://"):
            path = path[len("file://"):]
        else:
            import os as _os
            import tempfile

            fd, local = tempfile.mkstemp(suffix=".tif")
            _os.close(fd)
            try:
                export_gtiff(
                    res, local, band=band, tiled=tiled,
                    min_overview_size=min_overview_size, compress=compress,
                    predictor=predictor, bigtiff=bigtiff,
                    rows_per_strip=rows_per_strip,
                )
                _upload_local_file(local, path)
            finally:
                _os.remove(local)
            return

    grid = res.grid
    np_dtype = np.dtype(grid.dtype)
    fill = grid.nullval if grid.nullval is not None else 0
    if band == "all":
        # stats_by_band is None when do_stats=False — derive the band set
        # from the tile table (single-column distinct, tiny) rather than
        # crashing on .keys()
        by_band = getattr(res, "stats_by_band", None)
        if by_band:
            bands = sorted(by_band.keys())
        else:
            bands = sorted(
                int(b) for b in res.tiles_ds.select_columns(["band"])
                .unique("band")
            )
    else:
        bands = [band]
    if predictor == 2 and np_dtype.kind == "f":
        predictor = 1  # Predictor=2 is integer-only
    if bigtiff is None:
        # BIGTIFF=IF_SAFER (the reference's default creation option):
        # classic TIFF offsets are 32-bit, so size on the uncompressed
        # upper bound with headroom (+1/3 for the overview pyramid)
        est = grid.nrows * grid.ncols * np_dtype.itemsize * len(bands)
        if tiled:
            est += est // 3
        bigtiff = est > 3_500_000_000
    ltype = getattr(grid, "layer_type", None)

    if tiled:
        # Multi-band: PlanarConfig=2, bands streamed sequentially —
        # iter_band_slabs(band=None) sorts (band, tile_id), so slabs
        # arrive plane-major, matching the writer's contract.
        w = StreamingGtiffTiledWriter(
            path, grid.nrows, grid.ncols, np_dtype, grid.transform,
            grid.crs, grid.nullval, min_overview_size=min_overview_size,
            compress=compress, predictor=predictor, layer_type=ltype,
            bigtiff=bigtiff, nbands=len(bands),
        )

        def _pad_to(written: int, upto: int) -> int:
            if upto > written:
                w.write_rows(np.full((upto - written, grid.ncols), fill,
                                     dtype=np_dtype))
            return upto

        only = None if len(bands) > 1 else bands[0]
        band_index = {b: i for i, b in enumerate(bands)}
        cur_bi, written = 0, 0
        for b, top, slab in iter_band_slabs(res.tiles_ds, grid, band=only):
            bi = band_index.get(b)
            if bi is None:
                continue
            while bi > cur_bi:  # close out any earlier (possibly empty) band
                _pad_to(written, grid.nrows)
                w.end_band()
                cur_bi, written = cur_bi + 1, 0
            written = _pad_to(written, top)
            w.write_rows(slab)
            written += len(slab)
        while cur_bi < len(bands):  # final band(s) gap-fill
            _pad_to(written, grid.nrows)
            w.end_band()
            cur_bi, written = cur_bi + 1, 0
        w.close()
        return

    w = StreamingGtiffWriter(
        path, grid.nrows, grid.ncols, np_dtype, grid.transform, grid.crs,
        grid.nullval, nbands=len(bands), rows_per_strip=rows_per_strip,
        compress=compress, predictor=predictor, layer_type=ltype,
        bigtiff=bigtiff,
    )
    band_index = {b: i for i, b in enumerate(bands)}
    written = {i: 0 for i in range(len(bands))}
    only = None if len(bands) > 1 else bands[0]
    for b, top, slab in iter_band_slabs(res.tiles_ds, grid, band=only):
        bi = band_index.get(b)
        if bi is None:
            continue
        if top > written[bi]:
            w.write_rows(np.full((top - written[bi], grid.ncols), fill,
                                 dtype=np_dtype), band=bi)
            written[bi] = top
        w.write_rows(slab, band=bi)
        written[bi] += len(slab)
    for bi in range(len(bands)):
        if written[bi] < grid.nrows:
            w.write_rows(np.full((grid.nrows - written[bi], grid.ncols),
                                 fill, dtype=np_dtype), band=bi)
    w.close()


def _upload_local_file(local: str, uri: str, chunk: int = 8 << 20) -> None:
    """Upload a finished local file to one object at ``uri`` (s3://...).

    boto3's managed upload (single PUT below the multipart threshold,
    multipart above — both correct on any S3 implementation) when
    available; else a chunked pyarrow output stream. The export is not
    part of the commit protocol, so multipart is acceptable here — a
    half-uploaded export key is simply re-exported."""
    from ..state.fsio import OutputFS

    parent, name = uri.rsplit("/", 1)
    ofs = OutputFS(parent)
    dest = ofs.join(ofs.root, name)
    client = ofs._put_client()
    if client is not None:
        bucket, key = dest.split("/", 1)
        client.upload_file(local, bucket, key)
        return
    with open(local, "rb") as src, ofs.fs.open_output_stream(dest) as out:
        while True:
            buf = src.read(chunk)
            if not buf:
                break
            out.write(buf)


# ---------------------------------------------------------------------------
# Tiled multi-IFD GeoTIFF with embedded overviews (the reference's default
# output shape: GTiff TILED + overview levels, ref mosaic.py:604-660 +
# writeBlockPyramids mosaic.py:720-743)
# ---------------------------------------------------------------------------

T_NEWSUBFILETYPE = 254
T_TILEWIDTH = 322
T_TILELENGTH = 323
T_TILEOFFSETS = 324
T_TILEBYTECOUNTS = 325


def _gdal_metadata_xml(layer_type: str | None) -> bytes | None:
    """GDAL_METADATA (tag 42112) XML carrying per-band LAYER_TYPE — the
    reference propagates thematic/athematic onto the output band
    (ref structures.py:31-34, mosaic.py:627-633)."""
    if not layer_type:
        return None
    xml = (
        "<GDALMetadata>\n"
        f'  <Item name="LAYER_TYPE" sample="0">{layer_type}</Item>\n'
        "</GDALMetadata>\n"
    )
    return xml.encode() + b"\x00"


def _tile_bytes(arr: np.ndarray, tile: int, compress: str | None = None,
                predictor: int = 1) -> tuple[list[bytes], int, int]:
    """Row-major tile payloads, edge tiles padded to the full tile size
    (TIFF 6.0 requires complete tiles); optional DEFLATE + Predictor=2."""
    wire = arr.dtype.newbyteorder("<") if arr.dtype.itemsize > 1 else arr.dtype
    nrows, ncols = arr.shape
    tiles_down = -(-nrows // tile)
    tiles_across = -(-ncols // tile)
    out = []
    for tr in range(tiles_down):
        for tc in range(tiles_across):
            block = arr[tr * tile : (tr + 1) * tile, tc * tile : (tc + 1) * tile]
            if block.shape != (tile, tile):
                padded = np.zeros((tile, tile), dtype=arr.dtype)
                padded[: block.shape[0], : block.shape[1]] = block
                block = padded
            out.append(_encode_block(block, wire, compress, predictor))
    return out, tiles_down, tiles_across


def write_gtiff_tiled(
    path: str,
    arr: np.ndarray,
    transform: GeoTransform,
    crs: str = "",
    nullval: float | None = None,
    tile: int = 256,
    min_overview_size: int = 256,
    compress: str | None = "deflate",
    predictor: int = 1,
    layer_type: str | None = None,
    bigtiff: bool = False,
) -> list[int]:
    """Tiled GeoTIFF with embedded overview IFDs (``bigtiff=True`` writes
    BigTIFF — version 43, 8-byte offsets).

    Overview levels follow the reference rule (2**i while size//lvl >=
    min_overview_size, mosaic.py:646-658) and each overview is the exact
    strided subsample ``arr[lvl//2::lvl, lvl//2::lvl]`` (nearest, the
    reference's only overview resampler). Returns the level list."""
    if arr.ndim != 2 or arr.dtype.kind not in _SAMPLEFORMAT:
        raise ValueError(f"expected a 2-D numeric array, got {arr.dtype} {arr.shape}")
    out_size = max(arr.shape)
    levels = []
    i = 2
    while out_size // (2 ** i) >= min_overview_size:
        levels.append(2 ** i)
        i += 1
    images = [arr] + [arr[lvl // 2 :: lvl, lvl // 2 :: lvl] for lvl in levels]

    pixel_scale = struct.pack("<3d", transform[1], abs(transform[5]), 0.0)
    tiepoint = struct.pack("<6d", 0.0, 0.0, 0.0, transform[0], transform[3], 0.0)
    geokeys = _geokey_payload(crs)
    nodata_ascii = (
        (f"{nullval:g}".encode() + b"\x00") if nullval is not None else None
    )
    meta_ascii = _gdal_metadata_xml(layer_type)

    # build per-IFD entry lists with placeholder tile offsets
    per_ifd = []  # (entries, tiles)
    for idx, img in enumerate(images):
        tiles, _td, _ta = _tile_bytes(img, tile, compress, predictor)
        nrows, ncols = img.shape
        entries = []

        def entry(tag, typ, values):
            fmt = _FMT_FOR_TYPE[typ]
            if not isinstance(values, (list, tuple)):
                values = [values]
            entries.append(
                (tag, typ, len(values), struct.pack(f"<{len(values)}{fmt}", *values))
            )

        if idx > 0:
            entry(T_NEWSUBFILETYPE, TYPE_LONG, 1)  # reduced-resolution image
        entry(T_WIDTH, TYPE_LONG, ncols)
        entry(T_LENGTH, TYPE_LONG, nrows)
        entry(T_BITSPERSAMPLE, TYPE_SHORT, img.dtype.itemsize * 8)
        entry(T_COMPRESSION, TYPE_SHORT, _COMPRESSION_TAG[compress])
        entry(T_PHOTOMETRIC, TYPE_SHORT, 1)
        if predictor == 2:
            entry(T_PREDICTOR, TYPE_SHORT, 2)
        entry(T_SAMPLESPERPIXEL, TYPE_SHORT, 1)
        entry(T_SAMPLEFORMAT, TYPE_SHORT, _SAMPLEFORMAT[img.dtype.kind])
        entry(T_TILEWIDTH, TYPE_LONG, tile)
        entry(T_TILELENGTH, TYPE_LONG, tile)
        off_type = TYPE_LONG8 if bigtiff else TYPE_LONG
        entry(T_TILEOFFSETS, off_type, [0] * len(tiles))  # patched
        entry(T_TILEBYTECOUNTS, off_type, [len(t) for t in tiles])
        if idx == 0:
            entries.append((T_MODELPIXELSCALE, TYPE_DOUBLE, 3, pixel_scale))
            entries.append((T_MODELTIEPOINT, TYPE_DOUBLE, 6, tiepoint))
            entries.append((T_GEOKEYDIR, TYPE_SHORT, len(geokeys) // 2, geokeys))
            if nodata_ascii:
                entries.append(
                    (T_GDAL_NODATA, TYPE_ASCII, len(nodata_ascii), nodata_ascii)
                )
            if meta_ascii:
                entries.append(
                    (T_GDAL_METADATA, TYPE_ASCII, len(meta_ascii), meta_ascii)
                )
        entries.sort(key=lambda e: e[0])
        per_ifd.append((entries, tiles))

    # layout pass: header | (IFD + payloads)* | tile data
    if bigtiff:
        pos, inline_cap = 16, 8
        head_sz, entry_sz, next_sz = 8, 20, 8
        ehead, ofmt = "<HHQ", "<Q"
    else:
        pos, inline_cap = 8, 4
        head_sz, entry_sz, next_sz = 2, 12, 4
        ehead, ofmt = "<HHI", "<I"
    ifd_offsets = []
    payload_offsets = []  # per ifd: list parallel to entries (-1 = inline)
    for entries, _tiles in per_ifd:
        ifd_offsets.append(pos)
        pos += head_sz + len(entries) * entry_sz + next_sz
        offs = []
        for _tag, _typ, _count, payload in entries:
            if len(payload) <= inline_cap:
                offs.append(-1)
            else:
                offs.append(pos)
                pos += len(payload)
        payload_offsets.append(offs)
    data_start = pos
    # assign tile data offsets + patch the TileOffsets payloads
    dp = data_start
    for i_ifd, (entries, tiles) in enumerate(per_ifd):
        tile_offs = []
        for t in tiles:
            tile_offs.append(dp)
            dp += len(t)
        for j, (tag, typ, count, payload) in enumerate(entries):
            if tag == T_TILEOFFSETS:
                entries[j] = (
                    tag, typ, count,
                    struct.pack(
                        f"<{len(tile_offs)}{'Q' if bigtiff else 'I'}",
                        *tile_offs,
                    ),
                )

    with open(path, "wb") as f:
        if bigtiff:
            f.write(_II_BIG + struct.pack("<HHQ", 8, 0, ifd_offsets[0]))
        else:
            f.write(_II + struct.pack("<I", ifd_offsets[0]))
        for i_ifd, (entries, _tiles) in enumerate(per_ifd):
            f.write(struct.pack("<Q" if bigtiff else "<H", len(entries)))
            for j, (tag, typ, count, payload) in enumerate(entries):
                f.write(struct.pack(ehead, tag, typ, count))
                if len(payload) <= inline_cap:
                    f.write(payload.ljust(inline_cap, b"\x00"))
                else:
                    f.write(struct.pack(ofmt, payload_offsets[i_ifd][j]))
            nxt = ifd_offsets[i_ifd + 1] if i_ifd + 1 < len(per_ifd) else 0
            f.write(struct.pack(ofmt, nxt))
            for j, (tag, typ, count, payload) in enumerate(entries):
                if len(payload) > inline_cap:
                    f.write(payload)
        for _entries, tiles in per_ifd:
            for t in tiles:
                f.write(t)
    return levels


# ---------------------------------------------------------------------------
# Streaming single-file export: data blocks are written to disk as row
# slabs arrive (strips/tiles encoded incrementally), the IFD(s) land at the
# END of the file and the header's root-IFD offset is patched last. Driver
# memory is O(rows_per_strip x ncols) — never the full canvas — which is
# what makes `--gtiff` viable on BigTIFF-sized outputs (the reference
# writes block-by-block through its single writer for the same reason,
# ref mosaic.py:286-394).
# ---------------------------------------------------------------------------


def _pack_entry(tag, typ, values):
    """(tag, typ, count, payload) for scalar/sequence values (ASCII takes
    pre-encoded bytes)."""
    if typ == TYPE_ASCII:
        return (tag, typ, len(values), values)
    fmt = _FMT_FOR_TYPE[typ]
    if not isinstance(values, (list, tuple)):
        values = [values]
    return (tag, typ, len(values), struct.pack(f"<{len(values)}{fmt}", *values))


def _geo_entries(transform, nullval, layer_type, crs=None):
    """The GeoTIFF georeferencing + GDAL metadata entries (full-res IFD
    only), identical to write_gtiff's."""
    out = [
        (T_MODELPIXELSCALE, TYPE_DOUBLE, 3,
         struct.pack("<3d", transform[1], abs(transform[5]), 0.0)),
        (T_MODELTIEPOINT, TYPE_DOUBLE, 6,
         struct.pack("<6d", 0.0, 0.0, 0.0, transform[0], transform[3], 0.0)),
    ]
    gk = _geokey_payload(crs)
    out.append((T_GEOKEYDIR, TYPE_SHORT, len(gk) // 2, gk))
    if nullval is not None:
        nd = f"{nullval:g}".encode() + b"\x00"
        out.append((T_GDAL_NODATA, TYPE_ASCII, len(nd), nd))
    meta = _gdal_metadata_xml(layer_type)
    if meta:
        out.append((T_GDAL_METADATA, TYPE_ASCII, len(meta), meta))
    return out


def _finish_ifds(f, per_ifd, bigtiff: bool) -> None:
    """Append the chained IFDs (entries sorted by tag, payloads final) at
    the file's end and patch the header's root-IFD offset."""
    if f.tell() % 2:
        f.write(b"\x00")  # IFDs must begin on a word boundary
    if bigtiff:
        inline_cap, head_sz, entry_sz, next_sz = 8, 8, 20, 8
        ehead, ofmt, hdr_at, hdr_fmt = "<HHQ", "<Q", 8, "<Q"
    else:
        inline_cap, head_sz, entry_sz, next_sz = 4, 2, 12, 4
        ehead, ofmt, hdr_at, hdr_fmt = "<HHI", "<I", 4, "<I"
    pos = f.tell()
    ifd_offsets, payload_offsets = [], []
    for entries in per_ifd:
        ifd_offsets.append(pos)
        pos += head_sz + len(entries) * entry_sz + next_sz
        offs = []
        for _tag, _typ, _count, payload in entries:
            if len(payload) <= inline_cap:
                offs.append(-1)
            else:
                offs.append(pos)
                pos += len(payload)
        payload_offsets.append(offs)
    for i, entries in enumerate(per_ifd):
        f.write(struct.pack("<Q" if bigtiff else "<H", len(entries)))
        for j, (tag, typ, count, payload) in enumerate(entries):
            f.write(struct.pack(ehead, tag, typ, count))
            if len(payload) <= inline_cap:
                f.write(payload.ljust(inline_cap, b"\x00"))
            else:
                f.write(struct.pack(ofmt, payload_offsets[i][j]))
        nxt = ifd_offsets[i + 1] if i + 1 < len(per_ifd) else 0
        f.write(struct.pack(ofmt, nxt))
        for payload_off, (_tag, _typ, _count, payload) in zip(
            payload_offsets[i], entries
        ):
            if payload_off >= 0:
                f.write(payload)
    end = f.tell()
    f.seek(hdr_at)
    f.write(struct.pack(hdr_fmt, ifd_offsets[0]))
    f.seek(end)


class StreamingGtiffWriter:
    """Strip-organized streaming GeoTIFF writer.

    Feed row slabs top-down via :meth:`write_rows` (per band for planar
    multi-band files); each full ``rows_per_strip`` window is encoded and
    written immediately. :meth:`close` validates coverage, writes the IFD
    and patches the header."""

    def __init__(self, path, nrows, ncols, dtype, transform, crs="",
                 nullval=None, nbands=1, rows_per_strip=256,
                 compress=None, predictor=1, layer_type=None,
                 bigtiff=False):
        dtype = np.dtype(dtype)
        if dtype.kind not in _SAMPLEFORMAT:
            raise ValueError(f"unsupported dtype {dtype}")
        if predictor == 2 and dtype.kind == "f":
            raise ValueError("Predictor=2 is integer-only (use 1 for floats)")
        if compress == "jpeg" and predictor == 2:
            raise ValueError("Predictor does not apply to JPEG compression")
        self.nrows, self.ncols, self.nbands = nrows, ncols, nbands
        self.dtype = dtype
        self.wire = dtype.newbyteorder("<") if dtype.itemsize > 1 else dtype
        self.transform, self.crs = transform, crs
        self.nullval, self.layer_type = nullval, layer_type
        self.rows_per_strip = rows_per_strip
        self.compress, self.predictor = compress, predictor
        self.bigtiff = bigtiff
        self._pend = {b: [] for b in range(nbands)}
        self._pend_rows = {b: 0 for b in range(nbands)}
        self._written_rows = {b: 0 for b in range(nbands)}
        self._offs = {b: [] for b in range(nbands)}
        self._lens = {b: [] for b in range(nbands)}
        self.f = open(path, "wb")
        if bigtiff:
            self.f.write(_II_BIG + struct.pack("<HHQ", 8, 0, 0))
        else:
            self.f.write(_II + struct.pack("<I", 0))

    def write_rows(self, rows: np.ndarray, band: int = 0) -> None:
        if rows.ndim != 2 or rows.shape[1] != self.ncols:
            raise ValueError(f"expected (k, {self.ncols}) rows, got {rows.shape}")
        self._pend[band].append(np.ascontiguousarray(rows, dtype=self.dtype))
        self._pend_rows[band] += len(rows)
        while self._pend_rows[band] >= self.rows_per_strip:
            self._emit(band, self.rows_per_strip)

    def _emit(self, band: int, take: int) -> None:
        block = self._pend[band][0] if len(self._pend[band]) == 1 \
            else np.concatenate(self._pend[band])
        chunk, rest = block[:take], block[take:]
        self._pend[band] = [rest] if len(rest) else []
        self._pend_rows[band] = len(rest)
        payload = _encode_block(chunk, self.wire, self.compress, self.predictor)
        self._offs[band].append(self.f.tell())
        self._lens[band].append(len(payload))
        self.f.write(payload)
        self._written_rows[band] += take

    def close(self) -> None:
        for b in range(self.nbands):
            if self._pend_rows[b]:
                self._emit(b, self._pend_rows[b])
            if self._written_rows[b] != self.nrows:
                self.f.close()
                raise ValueError(
                    f"band {b}: wrote {self._written_rows[b]} rows, "
                    f"expected {self.nrows}"
                )
            n_expect = -(-self.nrows // self.rows_per_strip)
            if len(self._offs[b]) != n_expect:
                self.f.close()
                raise ValueError(
                    f"band {b}: {len(self._offs[b])} strips != {n_expect}"
                )
        off_type = TYPE_LONG8 if self.bigtiff else TYPE_LONG
        all_offs = [o for b in range(self.nbands) for o in self._offs[b]]
        all_lens = [n for b in range(self.nbands) for n in self._lens[b]]
        entries = [
            _pack_entry(T_WIDTH, TYPE_LONG, self.ncols),
            _pack_entry(T_LENGTH, TYPE_LONG, self.nrows),
            _pack_entry(T_BITSPERSAMPLE, TYPE_SHORT,
                        [self.dtype.itemsize * 8] * self.nbands),
            _pack_entry(T_COMPRESSION, TYPE_SHORT,
                        _COMPRESSION_TAG[self.compress]),
            _pack_entry(T_PHOTOMETRIC, TYPE_SHORT, 1),
            _pack_entry(T_STRIPOFFSETS, off_type, all_offs),
            _pack_entry(T_SAMPLESPERPIXEL, TYPE_SHORT, self.nbands),
            _pack_entry(T_ROWSPERSTRIP, TYPE_LONG, self.rows_per_strip),
            _pack_entry(T_STRIPBYTECOUNTS, off_type, all_lens),
            _pack_entry(T_SAMPLEFORMAT, TYPE_SHORT,
                        [_SAMPLEFORMAT[self.dtype.kind]] * self.nbands),
        ]
        if self.predictor == 2:
            entries.append(_pack_entry(T_PREDICTOR, TYPE_SHORT, 2))
        if self.nbands > 1:
            entries.append(_pack_entry(T_PLANARCONFIG, TYPE_SHORT, 2))
        entries += _geo_entries(self.transform, self.nullval,
                                self.layer_type, self.crs)
        entries.sort(key=lambda e: e[0])
        _finish_ifds(self.f, [entries], self.bigtiff)
        self.f.close()


class StreamingGtiffTiledWriter:
    """Tiled streaming GeoTIFF writer with embedded strided overviews.

    Feed consecutive full-res rows top-down; every level (full-res + each
    2**i overview, reference rule mosaic.py:646-658) keeps at most one
    tile-row of pixels buffered; complete tile rows are encoded and
    written immediately, IFDs land at close().

    Multi-band: pass ``nbands > 1`` and write bands SEQUENTIALLY —
    stream band 0's rows, call :meth:`end_band`, stream band 1's, ... —
    producing one PlanarConfig=2 file whose per-level tile-offset arrays
    are plane-major (TIFF 6.0 planar tile order)."""

    def __init__(self, path, nrows, ncols, dtype, transform, crs="",
                 nullval=None, tile=256, min_overview_size=256,
                 compress="deflate", predictor=1, layer_type=None,
                 bigtiff=False, nbands=1):
        dtype = np.dtype(dtype)
        if dtype.kind not in _SAMPLEFORMAT:
            raise ValueError(f"unsupported dtype {dtype}")
        if predictor == 2 and dtype.kind == "f":
            raise ValueError("Predictor=2 is integer-only (use 1 for floats)")
        self.nrows, self.ncols = nrows, ncols
        self.dtype = dtype
        self.wire = dtype.newbyteorder("<") if dtype.itemsize > 1 else dtype
        self.transform, self.crs = transform, crs
        self.nullval, self.layer_type = nullval, layer_type
        self.tile = tile
        self.compress, self.predictor = compress, predictor
        self.bigtiff = bigtiff
        out_size = max(nrows, ncols)
        self.levels = []
        i = 2
        while out_size // (2 ** i) >= min_overview_size:
            self.levels.append(2 ** i)
            i += 1
        self._lv = [1] + self.levels
        # per level: output dims (strided subsample shape), pending rows,
        # recorded tile offsets/lengths
        self._dims = []
        for lvl in self._lv:
            if lvl == 1:
                self._dims.append((nrows, ncols))
            else:
                self._dims.append((
                    len(range(lvl // 2, nrows, lvl)),
                    len(range(lvl // 2, ncols, lvl)),
                ))
        self._buf = [[] for _ in self._lv]
        self._buf_rows = [0 for _ in self._lv]
        self._offs = [[] for _ in self._lv]
        self._lens = [[] for _ in self._lv]
        self._row = 0  # next full-res row index (within the current band)
        self.nbands = nbands
        self._band = 0  # completed bands
        self.f = open(path, "wb")
        if bigtiff:
            self.f.write(_II_BIG + struct.pack("<HHQ", 8, 0, 0))
        else:
            self.f.write(_II + struct.pack("<I", 0))

    def write_rows(self, rows: np.ndarray) -> None:
        if rows.ndim != 2 or rows.shape[1] != self.ncols:
            raise ValueError(f"expected (k, {self.ncols}) rows, got {rows.shape}")
        rows = np.ascontiguousarray(rows, dtype=self.dtype)
        r0, k = self._row, len(rows)
        for li, lvl in enumerate(self._lv):
            if lvl == 1:
                sub = rows
            else:
                # global rows r >= lvl//2 with (r - lvl//2) % lvl == 0
                first = lvl // 2
                if r0 > first:
                    first += -(-(r0 - lvl // 2) // lvl) * lvl
                if first >= r0 + k:
                    continue
                sub = rows[first - r0 :: lvl][:, lvl // 2 :: lvl]
            if not len(sub):
                continue
            self._buf[li].append(sub)
            self._buf_rows[li] += len(sub)
            while self._buf_rows[li] >= self.tile:
                self._emit_tile_row(li, self.tile)
        self._row += k

    def _emit_tile_row(self, li: int, take: int) -> None:
        block = np.concatenate(self._buf[li]) if len(self._buf[li]) > 1 \
            else self._buf[li][0]
        chunk, rest = block[:take], block[take:]
        self._buf[li] = [rest] if len(rest) else []
        self._buf_rows[li] = len(rest)
        t = self.tile
        if chunk.shape[0] < t:
            padded = np.zeros((t, chunk.shape[1]), dtype=self.dtype)
            padded[: chunk.shape[0]] = chunk
            chunk = padded
        lc = self._dims[li][1]
        for tc in range(-(-lc // t)):
            blk = chunk[:, tc * t : (tc + 1) * t]
            if blk.shape[1] < t:
                p = np.zeros((t, t), dtype=self.dtype)
                p[:, : blk.shape[1]] = blk
                blk = p
            payload = _encode_block(blk, self.wire, self.compress,
                                    self.predictor)
            self._offs[li].append(self.f.tell())
            self._lens[li].append(len(payload))
            self.f.write(payload)

    def end_band(self) -> None:
        """Flush the current band's partial tile rows and start the next.
        Tile offsets accumulate per level in plane-major order."""
        if self._row != self.nrows:
            self.f.close()
            raise ValueError(f"wrote {self._row} rows, expected {self.nrows}")
        for li, lvl in enumerate(self._lv):
            if self._buf_rows[li]:
                self._emit_tile_row(li, self._buf_rows[li])
            lr, lc = self._dims[li]
            n_expect = (-(-lr // self.tile) * -(-lc // self.tile)
                        * (self._band + 1))
            if len(self._offs[li]) != n_expect:
                self.f.close()
                raise ValueError(
                    f"level {lvl}: {len(self._offs[li])} tiles != {n_expect}"
                )
            self._buf[li] = []
            self._buf_rows[li] = 0
        self._band += 1
        self._row = 0

    def close(self) -> list[int]:
        if self._band < self.nbands:
            self.end_band()  # single-band back-compat / final band flush
        if self._band != self.nbands:
            self.f.close()
            raise ValueError(
                f"wrote {self._band} bands, expected {self.nbands}"
            )
        per_ifd = []
        nb = self.nbands
        for li, lvl in enumerate(self._lv):
            lr, lc = self._dims[li]
            off_type = TYPE_LONG8 if self.bigtiff else TYPE_LONG
            entries = [
                _pack_entry(T_WIDTH, TYPE_LONG, lc),
                _pack_entry(T_LENGTH, TYPE_LONG, lr),
                _pack_entry(T_BITSPERSAMPLE, TYPE_SHORT,
                            [self.dtype.itemsize * 8] * nb),
                _pack_entry(T_COMPRESSION, TYPE_SHORT,
                            _COMPRESSION_TAG[self.compress]),
                _pack_entry(T_PHOTOMETRIC, TYPE_SHORT, 1),
                _pack_entry(T_SAMPLESPERPIXEL, TYPE_SHORT, nb),
                _pack_entry(T_SAMPLEFORMAT, TYPE_SHORT,
                            [_SAMPLEFORMAT[self.dtype.kind]] * nb),
                _pack_entry(T_TILEWIDTH, TYPE_LONG, self.tile),
                _pack_entry(T_TILELENGTH, TYPE_LONG, self.tile),
                _pack_entry(T_TILEOFFSETS, off_type, self._offs[li]),
                _pack_entry(T_TILEBYTECOUNTS, off_type, self._lens[li]),
            ]
            if nb > 1:
                entries.append(_pack_entry(T_PLANARCONFIG, TYPE_SHORT, 2))
            if self.predictor == 2:
                entries.append(_pack_entry(T_PREDICTOR, TYPE_SHORT, 2))
            if li > 0:
                entries.append(_pack_entry(T_NEWSUBFILETYPE, TYPE_LONG, 1))
            else:
                entries += _geo_entries(self.transform, self.nullval,
                                        self.layer_type, self.crs)
            entries.sort(key=lambda e: e[0])
            per_ifd.append(entries)
        _finish_ifds(self.f, per_ifd, self.bigtiff)
        self.f.close()
        return self.levels


def _parse_ifd(data: bytes, ifd_off: int, big: bool = False):
    if big:  # BigTIFF: 8-byte counts/offsets, 20-byte entries
        (n_entries,) = struct.unpack_from("<Q", data, ifd_off)
        head, esize, inline_cap, voff = 8, 20, 8, 12
        entry_fmt, off_fmt = "<HHQ", "<Q"
    else:
        (n_entries,) = struct.unpack_from("<H", data, ifd_off)
        head, esize, inline_cap, voff = 2, 12, 4, 8
        entry_fmt, off_fmt = "<HHI", "<I"
    tags: dict[int, tuple[int, int, bytes]] = {}
    for i in range(n_entries):
        base = ifd_off + head + i * esize
        tag, typ, count = struct.unpack_from(entry_fmt, data, base)
        size = _TYPE_SIZE[typ] * count
        if size <= inline_cap:
            payload = data[base + voff : base + voff + size]
        else:
            (off,) = struct.unpack_from(off_fmt, data, base + voff)
            payload = data[off : off + size]
        tags[tag] = (typ, count, payload)
    (nxt,) = struct.unpack_from(
        off_fmt, data, ifd_off + head + n_entries * esize
    )
    return tags, nxt


def _ifd_image(data: bytes, tags) -> np.ndarray:
    def vals(tag, fmt=None):
        typ, count, payload = tags[tag]
        f = _FMT_FOR_TYPE.get(typ, fmt)
        return struct.unpack(f"<{count}{f}", payload)

    ncols = vals(T_WIDTH, "I")[0]
    nrows = vals(T_LENGTH, "I")[0]
    bits = vals(T_BITSPERSAMPLE, "H")[0]
    fmt_code = vals(T_SAMPLEFORMAT, "H")[0] if T_SAMPLEFORMAT in tags else 1
    kind = _KIND_FOR_FORMAT[fmt_code]
    dt_le = np.dtype(f"<{kind}{bits // 8}") if bits > 8 else np.dtype(f"{kind}1")
    dt = np.dtype(f"{kind}{bits // 8}")
    compression = (
        vals(T_COMPRESSION, "H")[0] if T_COMPRESSION in tags
        else COMPRESSION_NONE
    )
    predictor = vals(T_PREDICTOR, "H")[0] if T_PREDICTOR in tags else 1
    jpeg_tables = tags[T_JPEGTABLES][2] if T_JPEGTABLES in tags else None
    spp = (vals(T_SAMPLESPERPIXEL, "H")[0]
           if T_SAMPLESPERPIXEL in tags else 1)
    planar = (vals(T_PLANARCONFIG, "H")[0]
              if T_PLANARCONFIG in tags else 1)
    if spp > 1 and T_TILEOFFSETS in tags and planar != 2:
        raise NotImplementedError("chunky multi-band tiled TIFF not supported")
    if T_TILEOFFSETS in tags:
        tile_w = vals(T_TILEWIDTH, "I")[0]
        tile_h = vals(T_TILELENGTH, "I")[0]
        offs = vals(T_TILEOFFSETS, "I")
        counts = vals(T_TILEBYTECOUNTS, "I")
        tiles_across = -(-ncols // tile_w)
        per_plane = tiles_across * (-(-nrows // tile_h))
        planes = []
        for b in range(spp):
            out = np.zeros((nrows, ncols), dtype=dt)
            for k in range(per_plane):
                o = offs[b * per_plane + k]
                c = counts[b * per_plane + k]
                block = _decode_block(
                    data[o : o + c], (tile_h, tile_w), dt_le, compression,
                    predictor, jpeg_tables,
                )
                tr, tc = divmod(k, tiles_across)
                r0, c0 = tr * tile_h, tc * tile_w
                h = min(tile_h, nrows - r0)
                w = min(tile_w, ncols - c0)
                out[r0 : r0 + h, c0 : c0 + w] = block[:h, :w]
            planes.append(out)
        if spp == 1:
            return planes[0]
        return np.stack(planes)
    strip_offs = vals(T_STRIPOFFSETS, "I")
    strip_counts = vals(T_STRIPBYTECOUNTS, "I")
    rps = vals(T_ROWSPERSTRIP, "I")[0] if T_ROWSPERSTRIP in tags else nrows
    if spp > 1 and planar == 2:
        # band-major planes: n strips per band, stacked (nbands, h, w)
        per_band = -(-nrows // rps)
        planes = []
        for b in range(spp):
            parts = []
            for si in range(per_band):
                o = strip_offs[b * per_band + si]
                c = strip_counts[b * per_band + si]
                h = min(rps, nrows - si * rps)
                parts.append(
                    _decode_block(data[o : o + c], (h, ncols), dt_le,
                                  compression, predictor, jpeg_tables)
                )
            planes.append(np.vstack(parts))
        return np.stack(planes).astype(dt, copy=False)
    if spp > 1:  # chunky (interleaved) — what photo tools write
        if predictor == 2:
            raise NotImplementedError(
                "Predictor=2 with chunky multi-band TIFF not supported"
            )
        parts = []
        for si, (o, c) in enumerate(zip(strip_offs, strip_counts)):
            h = min(rps, nrows - si * rps)
            parts.append(
                _decode_block(data[o : o + c], (h, ncols * spp), dt_le,
                              compression, 1, jpeg_tables)
            )
        full = np.vstack(parts).reshape(nrows, ncols, spp)
        return np.ascontiguousarray(
            full.transpose(2, 0, 1)
        ).astype(dt, copy=False)
    parts = []
    for si, (o, c) in enumerate(zip(strip_offs, strip_counts)):
        h = min(rps, nrows - si * rps)
        parts.append(
            _decode_block(data[o : o + c], (h, ncols), dt_le, compression,
                          predictor, jpeg_tables)
        )
    return np.vstack(parts).astype(dt, copy=False)


def read_gtiff_full(
    path: str,
) -> tuple[np.ndarray, list[np.ndarray], GeoTransform, float | None]:
    """Read a (possibly tiled, possibly multi-IFD) GeoTIFF: returns
    (full-res array, [overview arrays], transform, nodata)."""
    with open(path, "rb") as f:
        data = f.read()
    ifd_off, big = _first_ifd(data)
    images = []
    geo_tags = None
    while ifd_off:
        tags, ifd_off = _parse_ifd(data, ifd_off, big)
        if geo_tags is None:
            geo_tags = tags
        images.append(_ifd_image(data, tags))

    def vals(tag, fmt=None):
        typ, count, payload = geo_tags[tag]
        f = _FMT_FOR_TYPE.get(typ, fmt)
        return struct.unpack(f"<{count}{f}", payload)

    sx, sy, _ = vals(T_MODELPIXELSCALE, "d")
    tp = vals(T_MODELTIEPOINT, "d")
    transform = (tp[3], sx, 0.0, tp[4], 0.0, -sy)
    nodata = None
    if T_GDAL_NODATA in geo_tags:
        nodata = float(geo_tags[T_GDAL_NODATA][2].rstrip(b"\x00").decode())
    return images[0], images[1:], transform, nodata
