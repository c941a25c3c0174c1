"""EXIF (APP1/TIFF-IFD) metadata from JPEG streams — from scratch.

The image-corpus census needs camera metadata (orientation, capture time,
make/model, exposure) without decoding pixels; EXIF is a little TIFF file
embedded in a JPEG APP1 segment, so this walks JPEG markers to APP1,
then parses the TIFF header + IFD0 + the Exif sub-IFD (both byte orders).
A minimal APP1 builder exists for fixtures.

Tag coverage is the census set: Make(271) Model(272) Orientation(274)
DateTime(306) and from the Exif IFD DateTimeOriginal(36867)
ExposureTime(33434) FNumber(33437) ISO(34855) FocalLength(37386)
PixelXDimension(40962) PixelYDimension(40963).
"""

from __future__ import annotations

import struct

_IFD0_TAGS = {271: "make", 272: "model", 274: "orientation",
              306: "datetime"}
_EXIF_TAGS = {36867: "datetime_original", 33434: "exposure_s",
              33437: "f_number", 34855: "iso", 37386: "focal_mm",
              40962: "pixel_x", 40963: "pixel_y"}
_EXIF_IFD_POINTER = 34665
_TYPE_SIZES = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 7: 1, 9: 4, 10: 8}


def _find_app1(buf: bytes) -> bytes | None:
    """Walk JPEG markers; return the APP1 Exif payload (after Exif\\0\\0)."""
    if len(buf) < 4 or buf[0:2] != b"\xff\xd8":
        raise ValueError("not a JPEG stream")
    pos = 2
    while pos + 4 <= len(buf):
        if buf[pos] != 0xFF:
            break
        marker = buf[pos + 1]
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        if marker == 0xDA:  # SOS: entropy data follows, no more APP1
            break
        (seglen,) = struct.unpack_from(">H", buf, pos + 2)
        if marker == 0xE1 and buf[pos + 4: pos + 10] == b"Exif\x00\x00":
            return bytes(buf[pos + 10: pos + 2 + seglen])
        pos += 2 + seglen
    return None


def _read_value(tiff: bytes, endian: str, vtype: int, count: int,
                value_field: bytes):
    size = _TYPE_SIZES.get(vtype)
    if size is None:
        return None
    total = size * count
    if total <= 4:
        raw = value_field[:total]
    else:
        (off,) = struct.unpack(endian + "I", value_field)
        raw = tiff[off: off + total]
        if len(raw) < total:
            return None
    if vtype == 2:  # ascii, NUL-terminated
        return raw.split(b"\x00")[0].decode("ascii", "replace")
    if vtype == 3:
        vals = struct.unpack(endian + "H" * count, raw)
    elif vtype in (4, 9):
        code = "i" if vtype == 9 else "I"
        vals = struct.unpack(endian + code * count, raw)
    elif vtype == 1:
        vals = tuple(raw)
    elif vtype in (5, 10):
        code = "ii" if vtype == 10 else "II"
        flat = struct.unpack(endian + code * count, raw)
        vals = tuple(
            (flat[2 * i] / flat[2 * i + 1]) if flat[2 * i + 1] else 0.0
            for i in range(count)
        )
    else:
        return None
    return vals[0] if count == 1 else vals


def _parse_ifd(tiff: bytes, endian: str, off: int, tag_map: dict,
               out: dict) -> int | None:
    """Fill `out` from one IFD; return the Exif sub-IFD offset if seen."""
    if off + 2 > len(tiff):
        return None
    (n,) = struct.unpack_from(endian + "H", tiff, off)
    sub = None
    for i in range(n):
        base = off + 2 + 12 * i
        if base + 12 > len(tiff):
            break
        tag, vtype, count = struct.unpack_from(endian + "HHI", tiff, base)
        value_field = tiff[base + 8: base + 12]
        if tag == _EXIF_IFD_POINTER:
            (sub,) = struct.unpack(endian + "I", value_field)
        elif tag in tag_map:
            v = _read_value(tiff, endian, vtype, count, value_field)
            if v is not None:
                out[tag_map[tag]] = v
    return sub


def exif_probe(jpeg_bytes: bytes) -> dict:
    """EXIF census dict from a JPEG stream; {'has_exif': False} when the
    stream carries no APP1 Exif segment."""
    tiff = _find_app1(jpeg_bytes)
    if tiff is None:
        return {"has_exif": False}
    if tiff[:2] == b"II":
        endian = "<"
    elif tiff[:2] == b"MM":
        endian = ">"
    else:
        raise ValueError("bad TIFF byte order in EXIF")
    magic, ifd0 = struct.unpack_from(endian + "HI", tiff, 2)
    if magic != 42:
        raise ValueError("bad TIFF magic in EXIF")
    out: dict = {"has_exif": True}
    sub = _parse_ifd(tiff, endian, ifd0, _IFD0_TAGS, out)
    if sub is not None:
        _parse_ifd(tiff, endian, sub, _EXIF_TAGS, out)
    return out


# ---------------------------------------------------------------------------
# fixture builder


def _enc_value(endian: str, vtype: int, values) -> tuple[int, bytes, bytes]:
    if vtype == 2:
        raw = values.encode("ascii") + b"\x00"
        return len(raw), raw, b""
    if vtype == 5 and isinstance(values, tuple) and len(values) == 2 \
            and all(isinstance(v, int) for v in values):
        values = [values]  # a single (num, den) rational
    if not isinstance(values, (list, tuple)):
        values = [values]
    if vtype == 3:
        raw = struct.pack(endian + "H" * len(values), *values)
    elif vtype == 4:
        raw = struct.pack(endian + "I" * len(values), *values)
    elif vtype == 5:
        flat = []
        for num, den in values:
            flat += [num, den]
        raw = struct.pack(endian + "II" * len(values), *flat)
    else:
        raise ValueError(vtype)
    return len(values), raw, b""


def build_exif_app1(fields: dict, endian: str = "<") -> bytes:
    """Minimal APP1 Exif segment (IFD0 + Exif sub-IFD) for fixtures.
    `fields` uses the same keys exif_probe emits."""
    ifd0_items = []
    exif_items = []
    spec = {
        "make": (271, 2, ifd0_items), "model": (272, 2, ifd0_items),
        "orientation": (274, 3, ifd0_items),
        "datetime": (306, 2, ifd0_items),
        "datetime_original": (36867, 2, exif_items),
        "exposure_s": (33434, 5, exif_items),
        "f_number": (33437, 5, exif_items),
        "iso": (34855, 3, exif_items),
        "focal_mm": (37386, 5, exif_items),
        "pixel_x": (40962, 4, exif_items),
        "pixel_y": (40963, 4, exif_items),
    }
    for k, v in fields.items():
        tag, vtype, bucket = spec[k]
        bucket.append((tag, vtype, v))
    have_sub = bool(exif_items)

    def build_ifd(items, ifd_off, extra_entry=None):
        entries = sorted(items)
        n = len(entries) + (1 if extra_entry else 0)
        data_off = ifd_off + 2 + 12 * n + 4
        ent_bytes = b""
        data_bytes = b""
        rows = list(entries)
        if extra_entry:
            rows.append(extra_entry)
            rows.sort()
        for tag, vtype, val in rows:
            if vtype == 0:  # pre-encoded pointer entry
                ent_bytes += struct.pack(endian + "HHI", tag, 4, 1)
                ent_bytes += struct.pack(endian + "I", val)
                continue
            count, raw, _ = _enc_value(endian, vtype, val)
            if len(raw) <= 4:
                field = raw + b"\x00" * (4 - len(raw))
            else:
                field = struct.pack(endian + "I", data_off + len(data_bytes))
                data_bytes += raw + (b"\x00" if len(raw) & 1 else b"")
            ent_bytes += struct.pack(endian + "HHI", tag, vtype, count)
            ent_bytes += field
        body = (struct.pack(endian + "H", n) + ent_bytes
                + struct.pack(endian + "I", 0) + data_bytes)
        return body

    # two-pass: IFD0 (with pointer) then sub-IFD right after it
    ifd0_off = 8
    probe = build_ifd(ifd0_items, ifd0_off,
                      (34665, 0, 0) if have_sub else None)
    sub_off = ifd0_off + len(probe)
    ifd0 = build_ifd(ifd0_items, ifd0_off,
                     (34665, 0, sub_off) if have_sub else None)
    assert len(ifd0) == len(probe)
    sub = build_ifd(exif_items, sub_off) if have_sub else b""
    tiff = ((b"II" if endian == "<" else b"MM")
            + struct.pack(endian + "HI", 42, ifd0_off) + ifd0 + sub)
    payload = b"Exif\x00\x00" + tiff
    return b"\xff\xe1" + struct.pack(">H", len(payload) + 2) + payload


def splice_app1(jpeg_bytes: bytes, app1: bytes) -> bytes:
    """Insert an APP1 segment right after SOI (fixture helper)."""
    if jpeg_bytes[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG stream")
    return jpeg_bytes[:2] + app1 + jpeg_bytes[2:]
