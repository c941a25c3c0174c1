"""ENVI raster writer/reader, from scratch.

The simplest real single-file raster interchange format: a flat binary
data file (band-sequential, row-major) plus an ASCII ``.hdr`` sidecar —
publicly documented by its vendor and supported by every GIS stack (GDAL
driver "ENVI"). This is the third output driver after the tile-parquet
sink and GeoTIFF, answering the reference's multi-driver surface
(moamosaic accepts any GDAL driver name, ref mosaic.py:30-35; its own
test default is KEA — an HDF5 container that cannot be honestly written
from scratch, so ENVI is the from-scratch-verifiable stand-in).

Export STREAMS row slabs exactly like export_gtiff (iter_band_slabs: a
Ray-side sort, one grid-tile row of one band on the driver at a time,
yielded in (band, top) order — which IS band-sequential file order), so
driver memory is O(tile_row_height x ncols) regardless of mosaic size.

Georeferencing: north-up grids get a standard ``map info`` record; every
grid additionally records the full affine in ``geo transform`` (GDAL
order) and the CRS string (EPSG name, moaray token, or full WKT) in
``coordinate system string`` — both fields ENVI/GDAL also use.
"""

from __future__ import annotations

import os

import numpy as np

from ..geo import GeoTransform, OutputGrid

# ENVI data type codes <-> numpy dtypes (little-endian; byte order = 0)
_DTYPE_TO_ENVI = {
    "uint8": 1, "int16": 2, "int32": 3, "float32": 4, "float64": 5,
    "complex64": 6, "complex128": 9, "uint16": 12, "uint32": 13,
    "int64": 14, "uint64": 15,
}
_ENVI_TO_DTYPE = {v: k for k, v in _DTYPE_TO_ENVI.items()}


def _header_text(grid: OutputGrid, nbands: int, interleave: str = "bsq",
                 description: str = "moaray mosaic export") -> str:
    code = _DTYPE_TO_ENVI.get(str(np.dtype(grid.dtype)))
    if code is None:
        raise ValueError(f"dtype {grid.dtype!r} has no ENVI type code")
    t = grid.transform
    lines = [
        "ENVI",
        f"description = {{{description}}}",
        f"samples = {grid.ncols}",
        f"lines = {grid.nrows}",
        f"bands = {nbands}",
        "header offset = 0",
        "file type = ENVI Standard",
        f"data type = {code}",
        f"interleave = {interleave}",
        "byte order = 0",
    ]
    if t[2] == 0.0 and t[4] == 0.0:
        # north-up: standard map info (pixel 1,1 ties to the upper-left
        # corner; ENVI's convention). Projection name is informational —
        # the authoritative CRS rides in `coordinate system string`.
        lines.append(
            "map info = {Arbitrary, 1, 1, "
            f"{t[0]!r}, {t[3]!r}, {t[1]!r}, {abs(t[5])!r}, units=Meters}}"
        )
    # full affine, GDAL geotransform order (covers rotated/sheared grids)
    lines.append(
        "geo transform = {"
        + ", ".join(repr(float(v)) for v in t) + "}"
    )
    crs = (grid.crs or "").replace("\n", " ")
    if crs:
        lines.append(f"coordinate system string = {{{crs}}}")
    if grid.nullval is not None:
        lines.append(f"data ignore value = {grid.nullval!r}")
    lt = getattr(grid, "layer_type", None)
    if lt:
        lines.append(f"; layer type = {lt}")
    return "\n".join(lines) + "\n"


def export_envi(res, path: str, band=0) -> None:
    """MosaicResult -> ENVI pair (``path`` = data file, ``path`` with the
    extension swapped to ``.hdr`` = header), streamed band-sequentially.
    ``band="all"`` writes every band of a multi-band mosaic (BSQ planes in
    band order); an int selects one band."""
    from ..pipelines.mosaic import iter_band_slabs

    grid = res.grid
    np_dtype = np.dtype(grid.dtype).newbyteorder("<")
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
    row_bytes = grid.ncols * np_dtype.itemsize
    plane_rows = grid.nrows
    fill_row = np.full((1, grid.ncols), fill, dtype=np_dtype)

    hdr_path = os.path.splitext(path)[0] + ".hdr"
    with open(path, "wb") as f:
        order = {b: i for i, b in enumerate(bands)}

        def pad_to(plane: int, row: int):
            # fill any skipped rows/planes with nullval so absent tile
            # rows leave correct bytes (same contract as the gtiff path)
            target = plane * plane_rows + row
            cur_rows = f.tell() // row_bytes
            for _ in range(target - cur_rows):
                f.write(fill_row.tobytes())

        for b, top, slab in iter_band_slabs(res.tiles_ds, grid, band=only):
            pad_to(order[b], top)
            f.write(np.ascontiguousarray(slab, dtype=np_dtype).tobytes())
        pad_to(len(bands) - 1, plane_rows)  # trailing gap fill
    with open(hdr_path, "w") as f:
        f.write(_header_text(grid, len(bands)))


def _parse_header(text: str) -> dict:
    """ENVI .hdr -> dict (lowercased keys; {}-values joined across lines)."""
    if not text.lstrip().startswith("ENVI"):
        raise ValueError("not an ENVI header (missing ENVI magic)")
    out: dict = {}
    body = text.split("\n", 1)[1] if "\n" in text else ""
    i = 0
    lines = body.splitlines()
    while i < len(lines):
        line = lines[i].strip()
        i += 1
        if not line or line.startswith(";") or "=" not in line:
            continue
        key, _, val = line.partition("=")
        key = key.strip().lower()
        val = val.strip()
        if val.startswith("{") and "}" not in val:
            while i < len(lines):
                val += " " + lines[i].strip()
                i += 1
                if "}" in val:
                    break
        if val.startswith("{") and val.endswith("}"):
            val = val[1:-1].strip()
        out[key] = val
    return out


def parse_envi_bytes(buf: bytes, hdr_text: str):
    """(array (nbands, nrows, ncols), geotransform, nullval, crs) from the
    raw data bytes + header text (the in-worker ingest entry)."""
    hdr = _parse_header(hdr_text)
    if hdr.get("interleave", "bsq").lower() != "bsq":
        raise ValueError(
            f"interleave {hdr.get('interleave')!r} not supported (bsq only)"
        )
    if int(hdr.get("byte order", "0")) != 0:
        raise ValueError("big-endian ENVI files not supported")
    ncols = int(hdr["samples"])
    nrows = int(hdr["lines"])
    nbands = int(hdr.get("bands", "1"))
    off = int(hdr.get("header offset", "0"))
    dt = np.dtype(_ENVI_TO_DTYPE[int(hdr["data type"])]).newbyteorder("<")
    raw = np.frombuffer(buf, dtype=dt, count=nbands * nrows * ncols,
                        offset=off)
    arr = raw.reshape(nbands, nrows, ncols)
    if "geo transform" in hdr:
        gt: GeoTransform = tuple(
            float(v) for v in hdr["geo transform"].split(","))
    elif "map info" in hdr:
        p = [v.strip() for v in hdr["map info"].split(",")]
        x0, y0, xr, yr = (float(p[3]), float(p[4]), float(p[5]),
                          float(p[6]))
        gt = (x0, xr, 0.0, y0, 0.0, -yr)
    else:
        gt = (0.0, 1.0, 0.0, 0.0, 0.0, -1.0)
    nullval = (float(hdr["data ignore value"])
               if "data ignore value" in hdr else None)
    crs = hdr.get("coordinate system string", "")
    return arr, gt, nullval, crs


def read_envi(path: str):
    """ENVI pair -> (array, geotransform, nullval, crs). Array shape is
    (nrows, ncols) for one band, (nbands, nrows, ncols) otherwise."""
    hdr_path = os.path.splitext(path)[0] + ".hdr"
    arr, gt, nullval, crs = parse_envi_bytes(
        open(path, "rb").read(), open(hdr_path).read())
    if arr.shape[0] == 1:
        return arr[0], gt, nullval, crs
    return arr, gt, nullval, crs
