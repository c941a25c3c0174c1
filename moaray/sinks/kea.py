"""KEA output driver: single-file ``.kea`` raster on the from-scratch
minimal HDF5 container (moaray/hdf5.py).

KEA is the reference's DEFAULT test driver (ref tests.py:15 ``DFLT_DRIVER
= 'KEA'``; creation-option table ref mosaic.py:30-35) — this closes the
last output-driver gap after GTiff/ENVI/HFA.  The layout follows the
published format description (Bunting & Gillingham 2013, "The KEA image
file format", Computers & Geosciences; the kealib sources are the public
reference):

- ``/HEADER``: SIZE uint64[2] = (ncols, nrows), TL float64[2],
  RES float64[2], ROT float64[2], WKT (CRS string), NUMBANDS uint16,
  VERSION "1.1", FILETYPE "KEA", GENERATOR.
- ``/BAND<n>``: DATA (2-D chunked + deflate, HDF5 IMAGE attrs),
  DATATYPE uint16 (KEADataType enum), DESCRIPTION, LAYER_TYPE uint16
  (0 continuous / 1 thematic), LAYER_USAGE uint16, NO_DATA_VAL (band
  dtype; present iff the grid has a nodata value), plus empty METADATA /
  OVERVIEWS groups.

Strings are fixed-length null-terminated (the container's supported
datatype class); kealib writes variable-length strings — readers built
on libhdf5 handle both classes, and our reader round-trips this one.
An absent DATA chunk stands for an all-nodata block (HDF5 fill-value
semantics), so sparse mosaics stay sparse on disk.

Like export_hfa/export_gtiff the writer STREAMS: one blocksize-row
stripe is in memory at a time; compressed chunks append to the file as
slabs arrive and all HDF5 metadata is assembled at close().
"""

from __future__ import annotations

import numpy as np

from ..hdf5 import MiniHdf5Writer, h5_open

# kealib KEADataType enum (kea-format public headers)
_KEA_DTYPE = {
    "int8": 1, "int16": 2, "int32": 3, "int64": 4,
    "uint8": 5, "uint16": 6, "uint32": 7, "uint64": 8,
    "float32": 9, "float64": 10,
}
_KEA_TO_NP = {v: k for k, v in _KEA_DTYPE.items()}


def export_kea(res, path: str, band=0, blocksize: int = 256,
               min_overview_size: int = 256) -> None:
    """MosaicResult -> single-file ``.kea``, streamed in blocksize-row
    stripes.  ``band="all"`` writes BAND1..BANDn; an int selects one.

    Overviews follow the reference rule (levels 2**i while the long axis
    divided by 2**i stays >= min_overview_size; each level is the exact
    lvl//2-offset stride — ref mosaic.py:646-658, tests.py:162-167) and
    land as ``BANDn/OVERVIEWS/OVERVIEW<k>`` chunked datasets.  Overview
    canvases are buffered whole during the stream — levels start at 4 so
    the bound is sum(1/lvl^2) < 1/12 of one band.  Band statistics are
    written as STATISTICS_* string datasets under ``BANDn/METADATA``
    (the GDAL metadata shape, like the GeoTIFF driver)."""
    from ..pipelines.mosaic import iter_band_slabs

    grid = res.grid
    dt = np.dtype(grid.dtype)
    if dt.name not in _KEA_DTYPE:
        raise ValueError(f"dtype {grid.dtype!r} has no KEA data type")
    np_dtype = dt.newbyteorder("<")

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

    bs = int(blocksize)
    nbx = -(-grid.ncols // bs)
    nby = -(-grid.nrows // bs)
    nullval = grid.nullval
    fill = nullval if nullval is not None else 0
    fill_is_nan = nullval is not None and np.isnan(nullval)

    levels, i = [], 2
    while max(grid.nrows, grid.ncols) // (2 ** i) >= min_overview_size:
        levels.append(2 ** i)
        i += 1
    ov_dims = [(len(range(lvl // 2, grid.nrows, lvl)),
                len(range(lvl // 2, grid.ncols, lvl))) for lvl in levels]

    t = grid.transform
    with open(path, "wb") as f:
        w = MiniHdf5Writer(f)
        w.create_array("HEADER/SIZE",
                       np.array([grid.ncols, grid.nrows], np.uint64))
        w.create_array("HEADER/TL", np.array([t[0], t[3]], np.float64))
        w.create_array("HEADER/RES", np.array([t[1], t[5]], np.float64))
        w.create_array("HEADER/ROT", np.array([t[2], t[4]], np.float64))
        w.create_array("HEADER/WKT", grid.crs or "")
        w.create_array("HEADER/NUMBANDS",
                       np.array([len(bands)], np.uint16))
        w.create_array("HEADER/VERSION", "1.1")
        w.create_array("HEADER/FILETYPE", "KEA")
        w.create_array("HEADER/GENERATOR", "moaray")
        w.add_group("METADATA")
        for i in range(len(bands)):
            g = f"BAND{i + 1}"
            w.create_chunked(
                f"{g}/DATA", (grid.nrows, grid.ncols), np_dtype, (bs, bs),
                attrs={"CLASS": "IMAGE", "IMAGE_VERSION": "1.2",
                       "BLOCK_SIZE": np.uint16(bs)})
            w.create_array(f"{g}/DATATYPE",
                           np.array([_KEA_DTYPE[dt.name]], np.uint16))
            w.create_array(f"{g}/DESCRIPTION", f"Band {i + 1}")
            w.create_array(
                f"{g}/LAYER_TYPE",
                np.array([1 if grid.layer_type == "thematic" else 0],
                         np.uint16))
            w.create_array(f"{g}/LAYER_USAGE", np.array([0], np.uint16))
            if nullval is not None:
                w.create_array(f"{g}/NO_DATA_VAL",
                               np.array([nullval]).astype(np_dtype))
            w.add_group(f"{g}/METADATA")
            w.add_group(f"{g}/OVERVIEWS")
            for li, (orr, occ) in enumerate(ov_dims):
                w.create_chunked(f"{g}/OVERVIEWS/OVERVIEW{li}",
                                 (orr, occ), np_dtype, (bs, bs))
            by_band = getattr(res, "stats_by_band", None)
            st = (by_band.get(bands[i]) if by_band
                  else getattr(res, "stats", None))
            if st:
                for key in ("min", "max", "mean", "stddev", "count"):
                    if key in st and st[key] is not None:
                        w.create_array(
                            f"{g}/METADATA/STATISTICS_{key.upper()}",
                            str(st[key]))

        # ---- stream pixel chunks: one stripe per (band, chunk-row) ----
        order = {b: i for i, b in enumerate(bands)}
        stripe = np.full((bs, nbx * bs), fill, dtype=np_dtype)
        cur: tuple[int, int] | None = None  # (band_idx, stripe_idx)
        ov_canvas = {
            (bi, li): np.full(ov_dims[li], fill, dtype=np_dtype)
            for bi in range(len(bands)) for li in range(len(levels))
        }

        def is_fill(block: np.ndarray) -> bool:
            if nullval is None:
                return False  # ambiguous without nodata: write every chunk
            if fill_is_nan:
                return bool(np.isnan(block).all())
            return bool((block == fill).all())

        def flush() -> None:
            nonlocal cur
            if cur is None:
                return
            bi, s = cur
            for c in range(nbx):
                block = stripe[:, c * bs:(c + 1) * bs]
                if not is_fill(block):
                    w.write_chunk(f"BAND{bi + 1}/DATA", (s * bs, c * bs),
                                  block)
            # scatter this stripe's strided rows into the overview canvases
            lo, hi = s * bs, min(s * bs + bs, grid.nrows)
            for li, lvl in enumerate(levels):
                off = lvl // 2
                first = off if lo <= off else off + (-(-(lo - off) // lvl)) * lvl
                if first >= hi:
                    continue
                rows = np.arange(first, hi, lvl)
                cv = ov_canvas[(bi, li)]
                cv[(rows - off) // lvl] = \
                    stripe[rows - lo, off::lvl][:, :cv.shape[1]]
            stripe.fill(fill)
            cur = None

        for b, top, slab in iter_band_slabs(res.tiles_ds, grid, band=only):
            bi = order[b]
            slab = np.asarray(slab, dtype=np_dtype)
            r = 0
            while r < slab.shape[0]:
                s = (top + r) // bs
                if cur != (bi, s):
                    flush()
                    cur = (bi, s)
                r0 = (top + r) % bs
                n = min(bs - r0, slab.shape[0] - r)
                stripe[r0:r0 + n, :grid.ncols] = slab[r:r + n]
                r += n
                if r0 + n == bs:
                    flush()
        flush()
        for (bi, li), cv in ov_canvas.items():
            for r in range(0, cv.shape[0], bs):
                for c in range(0, cv.shape[1], bs):
                    block = np.full((bs, bs), fill, dtype=np_dtype)
                    sub = cv[r:r + bs, c:c + bs]
                    block[:sub.shape[0], :sub.shape[1]] = sub
                    if not is_fill(block):
                        w.write_chunk(
                            f"BAND{bi + 1}/OVERVIEWS/OVERVIEW{li}",
                            (r, c), block)
        w.close()


# ---------------------------------------------------------------- reader

def parse_kea_bytes(buf: bytes):
    """Raw ``.kea`` bytes -> (array (nbands, nrows, ncols), geotransform,
    nullval, crs).  Walks the HDF5 object tree; missing DATA chunks read
    back as the band's NO_DATA_VAL."""
    h5 = h5_open(buf)
    root = h5.root()
    if "HEADER" not in root:
        raise ValueError("HDF5 file has no KEA /HEADER group")
    hdr = root["HEADER"]
    ncols, nrows = (int(v) for v in hdr["SIZE"].read())
    tl = hdr["TL"].read()
    res_ = hdr["RES"].read()
    rot = (hdr["ROT"].read() if "ROT" in hdr else np.zeros(2))
    gt = (float(tl[0]), float(res_[0]), float(rot[0]),
          float(tl[1]), float(rot[1]), float(res_[1]))
    crs = hdr["WKT"].read_scalar() if "WKT" in hdr else ""
    nbands = int(hdr["NUMBANDS"].read_scalar()) if "NUMBANDS" in hdr else 1

    planes, nullval = [], None
    for i in range(nbands):
        band = root[f"BAND{i + 1}"]
        nv = None
        if "NO_DATA_VAL" in band:
            nv = band["NO_DATA_VAL"].read().reshape(-1)[0]
            if nullval is None:
                nullval = float(nv)
        data = band["DATA"]
        arr = data.read(fill=nv if nv is not None else 0)
        if arr.shape != (nrows, ncols):
            raise ValueError(
                f"BAND{i + 1}/DATA shape {arr.shape} != header "
                f"({nrows}, {ncols})")
        if "DATATYPE" in band:
            want = _KEA_TO_NP.get(int(band["DATATYPE"].read_scalar()))
            if want is not None and np.dtype(want) != arr.dtype:
                raise ValueError(
                    f"BAND{i + 1} DATATYPE {want} != stored {arr.dtype}")
        planes.append(arr)
    return np.stack(planes), gt, nullval, crs


def read_kea_full(path: str, band: int = 1):
    """``.kea`` file -> (band array, [overview arrays], geotransform,
    nullval, crs, stats dict) — mirrors read_gtiff_full's shape, plus the
    STATISTICS_* metadata strings."""
    from ..hdf5 import h5_open

    buf = open(path, "rb").read()
    arr, gt, nullval, crs = parse_kea_bytes(buf)
    h5 = h5_open(buf)
    bg = h5[f"BAND{band}"]
    fillv = nullval if nullval is not None else 0
    ovs = []
    if "OVERVIEWS" in bg:
        og = bg["OVERVIEWS"]
        for li in range(len(og.keys())):
            ovs.append(og[f"OVERVIEW{li}"].read(fill=fillv))
    stats = {}
    if "METADATA" in bg:
        mg = bg["METADATA"]
        for k in mg.keys():
            if k.startswith("STATISTICS_"):
                stats[k[len("STATISTICS_"):].lower()] = \
                    mg[k].read_scalar()
    plane = arr[band - 1] if arr.ndim == 3 else arr
    return plane, ovs, gt, nullval, crs, stats


def read_kea(path: str):
    """``.kea`` file -> (array, geotransform, nullval, crs).  Array is
    (nrows, ncols) for one band, (nbands, nrows, ncols) otherwise."""
    arr, gt, nullval, crs = parse_kea_bytes(open(path, "rb").read())
    if arr.shape[0] == 1:
        return arr[0], gt, nullval, crs
    return arr, gt, nullval, crs
