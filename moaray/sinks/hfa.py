"""HFA (Erdas Imagine ``.img``) writer/reader, from scratch.

The reference accepts any GDAL driver name and its own docs single out
KEA/HFA/GTiff creation options (ref mosaic.py:30-35).  KEA is an HDF5
container (out of honest from-scratch reach), but HFA — ERDAS's
Hierarchical File Architecture — is a publicly documented binary format
(the "ERDAS IMAGINE .img HFA" white paper; GDAL ships an independent
implementation as its ``HFA`` driver), so the fourth output driver after
tile-parquet / GeoTIFF / ENVI is a real blocked-raster HFA writer plus an
honest reader that decodes the file THROUGH its embedded data dictionary,
not through hardcoded struct offsets.

Format shape (all integers little-endian):

- offset 0: ``Ehfa_HeaderTag`` — 16-byte magic ``EHFA_HEADER_TAG\\0`` +
  u32 offset of the ``Ehfa_File`` record.
- ``Ehfa_File``: i32 version, u32 freeList, u32 rootEntryPtr,
  i16 entryHeaderLength (128), u32 dictionaryPtr.
- A tree of 128-byte ``Ehfa_Entry`` nodes (next/prev/parent/child/data
  pointers + dataSize + name[64] + type[32] + modTime), rooted at
  ``root``.  Each node's payload is a record whose layout is defined by
  the ASCII *data dictionary* — a ``{count:type name,...}TypeName,``
  grammar terminated by ``.`` — so readers decode structurally.
- Raster data lives in fixed 64x64 blocks; each band is an
  ``Eimg_Layer`` node (width/height/layerType/pixelType/blockWidth/
  blockHeight) with an ``Edms_State`` child ("RasterDMS") holding the
  virtual-block table (per block: fileCode, file offset, size, logvalid,
  compressionType) and an ``Ehfa_Layer`` child pointing at a mini
  dictionary describing one block.

Georeferencing rides in the standard ``Eprj_MapInfo`` record
(upperLeftCenter / lowerRightCenter are PIXEL-CENTER coordinates);
north-up grids only — exactly the grids the reference's makeOutputGrid
emits (ref mosaic.py:214-260).  The CRS string travels in
``proName`` (full ``Eprj_ProParameters`` datum/projection trees are out
of scope; moaray round-trips its own CRS tokens/WKT through it, the same
contract as the ENVI sink's ``coordinate system string``).  The nodata
value is an ``Eimg_NonInitializedValue`` basedata record, GDAL's own
convention for HFA nodata.

Export STREAMS: iter_band_slabs feeds (band, top)-ordered row slabs; the
writer buffers ONE 64-row block stripe (O(64 x ncols)) and seeks blocks
to their precomputed offsets — never a full canvas, any mosaic size.
"""

from __future__ import annotations

import os
import struct

import numpy as np

from ..geo import OutputGrid

BLOCK = 64  # standard Imagine block edge

_MAGIC = b"EHFA_HEADER_TAG\x00"

# EPT pixel-type enum (position in the dictionary's pixelType enum list)
_EPT_NAMES = ["u1", "u2", "u4", "u8", "s8", "u16", "s16", "u32", "s32",
              "f32", "f64", "c64", "c128"]
_DTYPE_TO_EPT = {
    "uint8": 3, "int8": 4, "uint16": 5, "int16": 6,
    "uint32": 7, "int32": 8, "float32": 9, "float64": 10,
    "complex64": 11, "complex128": 12,
}
_EPT_TO_DTYPE = {v: k for k, v in _DTYPE_TO_EPT.items()}
# block mini-dictionary item char per EPT (informational, Imagine-style)
_EPT_CHAR = {3: "c", 4: "C", 5: "s", 6: "S", 7: "L", 8: "l",
             9: "f", 10: "d", 11: "m", 12: "M"}

# The data dictionary written into every file.  Types referenced by 'o'
# items are defined before use; '.' terminates.  Matches the public HFA
# layout (and GDAL's default dictionary) for every record we emit.
_DICTIONARY = (
    "{1:lversion,1:LfreeList,1:LrootEntryPtr,1:sentryHeaderLength,"
    "1:LdictionaryPtr,}Ehfa_File,"
    "{1:Lnext,1:Lprev,1:Lparent,1:Lchild,1:Ldata,1:ldataSize,"
    "64:cname,32:ctype,1:tmodTime,}Ehfa_Entry,"
    "{16:clabel,1:LheaderPtr,}Ehfa_HeaderTag,"
    "{1:lwidth,1:lheight,"
    "1:e3:thematic,athematic,fft of real-valued data,layerType,"
    "1:e13:u1,u2,u4,u8,s8,u16,s16,u32,s32,f32,f64,c64,c128,pixelType,"
    "1:lblockWidth,1:lblockHeight,}Eimg_Layer,"
    "{1:e2:raster,vector,type,1:LdictionaryPtr,}Ehfa_Layer,"
    "{1:lmin,1:lmax,}Edms_FreeIDList,"
    "{1:SfileCode,1:Loffset,1:lsize,1:e2:false,true,logvalid,"
    "1:e2:no compression,ESRI GRID compression,compressionType,}"
    "Edms_VirtualBlockInfo,"
    "{1:lnumvirtualblocks,1:lnumobjectsperblock,1:lnextobjectnum,"
    "1:e2:no compression,ESRI GRID compression,compressionType,"
    "0:poEdms_VirtualBlockInfo,blockinfo,0:poEdms_FreeIDList,freelist,"
    "1:tmodTime,}Edms_State,"
    "{1:dx,1:dy,}Eprj_Coordinate,"
    "{1:dwidth,1:dheight,}Eprj_Size,"
    "{0:pcproName,1:*oEprj_Coordinate,upperLeftCenter,"
    "1:*oEprj_Coordinate,lowerRightCenter,1:*oEprj_Size,pixelSize,"
    "0:pcunits,}Eprj_MapInfo,"
    "{1:*bvalueBD,}Eimg_NonInitializedValue,"
    "."
)


# ---------------------------------------------------------------- writer

def _pack_entry(next_=0, prev=0, parent=0, child=0, data=0, datasize=0,
                name="", etype="") -> bytes:
    return struct.pack(
        "<IIIIIi64s32sI", next_, prev, parent, child, data, datasize,
        name.encode()[:63], etype.encode()[:31], 0,
    )


def _enum(v: int) -> bytes:
    return struct.pack("<H", v)


def _pstring(s: str) -> bytes:
    """'p c' item: u32 count + u32 ptr (informational; data follows
    inline, the layout every HFA reader actually uses) + NUL-terminated
    chars."""
    raw = s.encode() + b"\x00"
    return struct.pack("<II", len(raw), 0) + raw


def _pobj(payload: bytes, count: int = 1) -> bytes:
    """'*'/'p' object item: u32 count + u32 ptr + inline object data."""
    return struct.pack("<II", count, 0) + payload


def _mapinfo_bytes(grid: OutputGrid) -> bytes:
    t = grid.transform
    ulx = t[0] + t[1] / 2.0
    uly = t[3] + t[5] / 2.0
    lrx = t[0] + (grid.ncols - 0.5) * t[1]
    lry = t[3] + (grid.nrows - 0.5) * t[5]
    pro = (grid.crs or "").replace("\n", " ")
    return b"".join([
        _pstring(pro),
        _pobj(struct.pack("<dd", ulx, uly)),
        _pobj(struct.pack("<dd", lrx, lry)),
        _pobj(struct.pack("<dd", abs(t[1]), abs(t[5]))),
        _pstring("meters"),
    ])


def _noninit_bytes(nullval: float) -> bytes:
    # basedata: i32 nrows, i32 ncols, i16 itemtype (EPT f64), i16
    # objecttype (scalar), then the value — behind a '*' pointer item.
    bd = struct.pack("<iihh", 1, 1, 10, 0) + struct.pack("<d",
                                                         float(nullval))
    return _pobj(bd)


def export_hfa(res, path: str, band=0) -> None:
    """MosaicResult -> single-file Erdas Imagine ``.img``, streamed in
    64x64 blocks.  ``band="all"`` writes every band as Layer_1..Layer_N;
    an int selects one band.  North-up grids only (HFA MapInfo has no
    rotation terms; neither do reference output grids)."""
    from ..pipelines.mosaic import iter_band_slabs

    grid = res.grid
    t = grid.transform
    if t[2] != 0.0 or t[4] != 0.0:
        raise ValueError("HFA export supports north-up grids only "
                         "(rotated geotransform)")
    dt = np.dtype(grid.dtype)
    ept = _DTYPE_TO_EPT.get(dt.name)
    if ept is None:
        raise ValueError(f"dtype {grid.dtype!r} has no HFA pixel type")
    np_dtype = dt.newbyteorder("<")
    fill = grid.nullval if grid.nullval is not None else 0

    if band == "all":
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
    only = None if band == "all" else band

    nbx = -(-grid.ncols // BLOCK)
    nby = -(-grid.nrows // BLOCK)
    nblocks = nbx * nby
    block_bytes = BLOCK * BLOCK * np_dtype.itemsize

    # ---- fixed metadata layout (every size deterministic up front) ----
    layer_data_sz = 20                       # 2l + 2e + 2l
    ehfa_layer_sz = 6                        # e + L
    dms_sz = 34 + 14 * nblocks               # 3l+e + p(blockinfo) + p + t
    mapinfo = _mapinfo_bytes(grid)
    noninit = (_noninit_bytes(grid.nullval)
               if grid.nullval is not None else None)
    mini_dict = (f"{{{BLOCK * BLOCK}:{_EPT_CHAR[ept]}data,}}RasterDMS,."
                 .encode())

    def align(o: int) -> int:
        return (o + 3) & ~3

    pos = len(_MAGIC) + 4                    # 20: end of header tag
    file_rec_at = pos
    pos = align(pos + 18)                    # Ehfa_File record

    # entry tree: root -> Layer_i -> (Ehfa_Layer, RasterDMS,
    #                                 Map_Info, [NonInitValue])
    entry_at: dict[str, int] = {}
    names: list[tuple[str, str, str]] = [("root", "root", "")]
    for i in range(len(bands)):
        ln = f"Layer_{i + 1}"
        names.append((ln, "Eimg_Layer", "root"))
        names.append((f"{ln}/Ehfa_Layer", "Ehfa_Layer", ln))
        names.append((f"{ln}/RasterDMS", "Edms_State", ln))
        names.append((f"{ln}/Map_Info", "Eprj_MapInfo", ln))
        if noninit is not None:
            names.append((f"{ln}/Eimg_NonInitializedValue",
                          "Eimg_NonInitializedValue", ln))
    for key, _, _ in names:
        entry_at[key] = pos
        pos += 128

    data_at: dict[str, tuple[int, int]] = {}

    def place(key: str, size: int) -> None:
        nonlocal pos
        data_at[key] = (pos, size)
        pos = align(pos + size)

    mini_dict_at: list[int] = []
    for i in range(len(bands)):
        ln = f"Layer_{i + 1}"
        place(ln, layer_data_sz)
        place(f"{ln}/Ehfa_Layer", ehfa_layer_sz)
        place(f"{ln}/RasterDMS", dms_sz)
        place(f"{ln}/Map_Info", len(mapinfo))
        if noninit is not None:
            place(f"{ln}/Eimg_NonInitializedValue", len(noninit))
        mini_dict_at.append(pos)
        pos = align(pos + len(mini_dict))
    dict_at = pos
    pos = align(pos + len(_DICTIONARY))
    blocks_at = pos                           # band-major block region

    def block_off(b_idx: int, stripe: int, col: int) -> int:
        return blocks_at + ((b_idx * nblocks + stripe * nbx + col)
                            * block_bytes)

    # ---- write metadata ----
    with open(path, "wb") as f:
        f.write(_MAGIC + struct.pack("<I", file_rec_at))
        f.write(struct.pack("<IIIhI", 1, 0, entry_at["root"], 128,
                            dict_at))
        f.seek(entry_at["root"])
        f.write(_pack_entry(
            child=entry_at["Layer_1"] if bands else 0,
            name="root", etype="root"))
        for i in range(len(bands)):
            ln = f"Layer_{i + 1}"
            nxt = (entry_at[f"Layer_{i + 2}"]
                   if i + 1 < len(bands) else 0)
            prv = entry_at[f"Layer_{i}"] if i > 0 else 0
            kids = [f"{ln}/Ehfa_Layer", f"{ln}/RasterDMS",
                    f"{ln}/Map_Info"]
            if noninit is not None:
                kids.append(f"{ln}/Eimg_NonInitializedValue")
            f.seek(entry_at[ln])
            at, sz = data_at[ln]
            f.write(_pack_entry(next_=nxt, prev=prv,
                                parent=entry_at["root"],
                                child=entry_at[kids[0]], data=at,
                                datasize=sz, name=ln,
                                etype="Eimg_Layer"))
            for k, key in enumerate(kids):
                f.seek(entry_at[key])
                at, sz = data_at[key]
                f.write(_pack_entry(
                    next_=entry_at[kids[k + 1]] if k + 1 < len(kids)
                    else 0,
                    prev=entry_at[kids[k - 1]] if k > 0 else 0,
                    parent=entry_at[ln], data=at, datasize=sz,
                    name=key.split("/")[1],
                    etype=names[[n for n, _, _ in names].index(key)][1]))
            # node payloads
            at, _ = data_at[ln]
            f.seek(at)
            f.write(struct.pack("<ll", grid.ncols, grid.nrows)
                    + _enum(1)                      # athematic
                    + _enum(ept)
                    + struct.pack("<ll", BLOCK, BLOCK))
            at, _ = data_at[f"{ln}/Ehfa_Layer"]
            f.seek(at)
            f.write(_enum(0) + struct.pack("<I", mini_dict_at[i]))
            at, _ = data_at[f"{ln}/RasterDMS"]
            f.seek(at)
            f.write(struct.pack("<lll", nblocks, BLOCK * BLOCK,
                                nblocks * BLOCK * BLOCK) + _enum(0))
            f.write(struct.pack("<II", nblocks, f.tell() + 8))
            for s in range(nby):
                for c in range(nbx):
                    f.write(struct.pack(
                        "<HIl", 0, block_off(i, s, c), block_bytes)
                        + _enum(1) + _enum(0))      # logvalid=true
            f.write(struct.pack("<II", 0, 0))       # empty freelist
            f.write(struct.pack("<I", 0))           # modTime
            at, _ = data_at[f"{ln}/Map_Info"]
            f.seek(at)
            f.write(mapinfo)
            if noninit is not None:
                at, _ = data_at[f"{ln}/Eimg_NonInitializedValue"]
                f.seek(at)
                f.write(noninit)
            f.seek(mini_dict_at[i])
            f.write(mini_dict)
        f.seek(dict_at)
        f.write(_DICTIONARY.encode())

        # ---- stream pixel blocks: one 64-row stripe in memory ----
        order = {b: i for i, b in enumerate(bands)}
        stripe_w = nbx * BLOCK
        written: set[tuple[int, int]] = set()
        cur: tuple[int, int] | None = None   # (band_idx, stripe_idx)
        stripe = np.full((BLOCK, stripe_w), fill, dtype=np_dtype)

        def flush() -> None:
            nonlocal cur
            if cur is None:
                return
            bi, s = cur
            for c in range(nbx):
                f.seek(block_off(bi, s, c))
                f.write(np.ascontiguousarray(
                    stripe[:, c * BLOCK:(c + 1) * BLOCK]).tobytes())
            written.add(cur)
            stripe.fill(fill)
            cur = None

        for b, top, slab in iter_band_slabs(res.tiles_ds, grid,
                                            band=only):
            bi = order[b]
            slab = np.asarray(slab, dtype=np_dtype)
            r = 0
            while r < slab.shape[0]:
                s = (top + r) // BLOCK
                if cur != (bi, s):
                    flush()
                    cur = (bi, s)
                r0 = (top + r) % BLOCK
                n = min(BLOCK - r0, slab.shape[0] - r)
                stripe[r0:r0 + n, :grid.ncols] = slab[r:r + n]
                r += n
                if r0 + n == BLOCK:
                    flush()
        flush()
        # stripes no slab touched (sparse layouts): explicit fill blocks
        fill_block = np.full((BLOCK, BLOCK), fill, dtype=np_dtype).tobytes()
        for bi in range(len(bands)):
            for s in range(nby):
                if (bi, s) not in written:
                    for c in range(nbx):
                        f.seek(block_off(bi, s, c))
                        f.write(fill_block)


# ---------------------------------------------------------------- reader

def _parse_dictionary(text: str) -> dict[str, list]:
    """HFA data dictionary -> {typename: [(count, pointer, char, extra,
    name), ...]}.  ``extra`` is the enum label list for 'e' items and the
    referenced type name for 'o' items."""
    types: dict[str, list] = {}
    i = 0
    while i < len(text) and text[i] != ".":
        if text[i] != "{":
            raise ValueError(f"dictionary parse error at {i}")
        i += 1
        items = []
        while text[i] != "}":
            j = text.index(":", i)
            count = int(text[i:j])
            i = j + 1
            pointer = ""
            if text[i] in "p*":
                pointer = text[i]
                i += 1
            ch = text[i]
            i += 1
            extra = None
            if ch == "e":
                j = text.index(":", i)
                nvals = int(text[i:j])
                i = j + 1
                extra = []
                for _ in range(nvals):
                    j = text.index(",", i)
                    extra.append(text[i:j])
                    i = j + 1
            elif ch in "ox":
                j = text.index(",", i)
                extra = text[i:j]
                i = j + 1
            j = text.index(",", i)
            items.append((count, pointer, ch, extra, text[i:j]))
            i = j + 1
        i += 1  # '}'
        j = text.index(",", i)
        types[text[i:j]] = items
        i = j + 1
    return types


_FIXED = {"c": 1, "C": 1, "s": 2, "S": 2, "e": 2, "t": 4,
          "l": 4, "L": 4, "f": 4, "d": 8}
_FMT = {"c": "B", "C": "b", "s": "H", "S": "h", "e": "H", "t": "I",
        "l": "i", "L": "I", "f": "f", "d": "d"}


def _decode_record(buf: bytes, off: int, typename: str,
                   types: dict) -> tuple[dict, int]:
    """Decode one record at ``off`` via the parsed dictionary.  Returns
    (fields, next offset).  Pointer items ('p'/'*') read their u32
    count + u32 ptr prefix and take the payload INLINE after it — the
    layout HFA writers (GDAL included) actually produce."""
    out: dict = {}
    for count, pointer, ch, extra, name in types[typename]:
        if pointer:
            count = struct.unpack_from("<I", buf, off)[0]
            off += 8
        if ch == "o":
            vals = []
            for _ in range(count):
                v, off = _decode_record(buf, off, extra, types)
                vals.append(v)
            out[name] = vals[0] if count == 1 else vals
        elif ch == "b":
            rows, cols, it, _obj = struct.unpack_from("<iihh", buf, off)
            off += 12
            bdt = np.dtype(_EPT_TO_DTYPE.get(it, "float64"))
            n = rows * cols
            vals = np.frombuffer(buf, dtype=bdt.newbyteorder("<"),
                                 count=n, offset=off)
            off += n * bdt.itemsize
            out[name] = vals[0] if n == 1 else vals
        elif ch in ("c", "C") and (count != 1 or pointer):
            raw = buf[off:off + count]
            off += count
            out[name] = raw.split(b"\x00", 1)[0].decode("latin-1")
        else:
            sz = _FIXED[ch]
            vals = list(struct.unpack_from(f"<{count}{_FMT[ch]}",
                                           buf, off))
            off += sz * count
            if ch == "e" and extra is not None:
                vals = [extra[v] if v < len(extra) else v for v in vals]
            out[name] = vals[0] if count == 1 else vals
    return out, off


def _walk_entries(buf: bytes, at: int, out: list, parent: str) -> None:
    (nxt, _prev, _par, child, data, datasize, name, etype,
     _mod) = struct.unpack_from("<IIIIIi64s32sI", buf, at)
    name = name.split(b"\x00", 1)[0].decode("latin-1")
    etype = etype.split(b"\x00", 1)[0].decode("latin-1")
    out.append({"name": name, "type": etype, "parent": parent,
                "data": data, "size": datasize})
    if child:
        _walk_entries(buf, child, out, name)
    if nxt:
        _walk_entries(buf, nxt, out, parent)


def parse_hfa_bytes(buf: bytes):
    """Raw ``.img`` bytes -> (array (nbands, nrows, ncols), geotransform,
    nullval, crs).  Fully dictionary-driven: record layouts come from the
    file's own data dictionary."""
    if buf[:16] != _MAGIC:
        raise ValueError("not an HFA file (missing EHFA_HEADER_TAG)")
    (file_at,) = struct.unpack_from("<I", buf, 16)
    version, _free, root_at, _ehl, dict_at = struct.unpack_from(
        "<IIIhI", buf, file_at)
    if version != 1:
        raise ValueError(f"unsupported HFA version {version}")
    end = buf.index(b".", dict_at)
    types = _parse_dictionary(buf[dict_at:end + 1].decode("latin-1"))

    nodes: list[dict] = []
    _walk_entries(buf, root_at, nodes, "")
    layers = [n for n in nodes if n["type"] == "Eimg_Layer"]
    if not layers:
        raise ValueError("HFA file has no Eimg_Layer raster bands")

    planes, gt, nullval, crs = [], None, None, ""
    for layer in layers:
        rec, _ = _decode_record(buf, layer["data"], "Eimg_Layer", types)
        w, h = rec["width"], rec["height"]
        dt = np.dtype(
            _EPT_TO_DTYPE[_EPT_NAMES.index(rec["pixelType"])]
        ).newbyteorder("<")
        bw, bh = rec["blockWidth"], rec["blockHeight"]
        nbx = -(-w // bw)
        nby = -(-h // bh)
        kids = [n for n in nodes if n["parent"] == layer["name"]]
        dms = next(n for n in kids if n["type"] == "Edms_State")
        st, _ = _decode_record(buf, dms["data"], "Edms_State", types)
        infos = st["blockinfo"]
        if isinstance(infos, dict):
            infos = [infos]
        canvas = np.zeros((nby * bh, nbx * bw), dtype=dt)
        for k, bi in enumerate(infos):
            if bi["compressionType"] != "no compression":
                raise ValueError("compressed HFA blocks not supported")
            s, c = divmod(k, nbx)
            blk = np.frombuffer(buf, dtype=dt, count=bw * bh,
                                offset=bi["offset"]).reshape(bh, bw)
            if bi["logvalid"] == "true":
                canvas[s * bh:(s + 1) * bh, c * bw:(c + 1) * bw] = blk
        planes.append(canvas[:h, :w])
        mi = next((n for n in kids if n["type"] == "Eprj_MapInfo"), None)
        if mi is not None and gt is None:
            m, _ = _decode_record(buf, mi["data"], "Eprj_MapInfo", types)
            px, py = m["pixelSize"]["width"], m["pixelSize"]["height"]
            ul = m["upperLeftCenter"]
            gt = (ul["x"] - px / 2.0, px, 0.0,
                  ul["y"] + py / 2.0, 0.0, -py)
            crs = m["proName"]
        nz = next((n for n in kids
                   if n["type"] == "Eimg_NonInitializedValue"), None)
        if nz is not None and nullval is None:
            v, _ = _decode_record(buf, nz["data"],
                                  "Eimg_NonInitializedValue", types)
            nullval = float(v["valueBD"])
    if gt is None:
        gt = (0.0, 1.0, 0.0, 0.0, 0.0, -1.0)
    return np.stack(planes), gt, nullval, crs


def read_hfa(path: str):
    """``.img`` file -> (array, geotransform, nullval, crs).  Array is
    (nrows, ncols) for one band, (nbands, nrows, ncols) otherwise."""
    arr, gt, nullval, crs = parse_hfa_bytes(open(path, "rb").read())
    if arr.shape[0] == 1:
        return arr[0], gt, nullval, crs
    return arr, gt, nullval, crs
