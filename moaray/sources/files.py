"""File-based image ingestion: a directory of loose rasters -> image catalog.

The reference consumes a text filelist of raster FILES (makeFilelist, ref
/root/reference/moamosaic/mosaic.py:112-128, GDAL opens each path); moaray's
native input is a catalog table. This source closes the gap: point the
engine at a directory (or explicit path list) of ``.png`` / ``.jpg`` /
``.mray`` / ``.tif`` files and get the standard images Dataset,
georeferenced from sidecar metadata:

- ``<name>.wld`` — the six-line ESRI world file (public spec: x-res, rot,
  rot, -y-res, center-x of top-left pixel, center-y). GDAL reads the same
  sidecars for PNG; we translate to the GDAL geotransform convention
  (corner-anchored).
- ``<name>.tif`` — the geotransform comes from the GeoTIFF tags themselves
  (from-scratch reader, sinks/gtiff.py); pixels are re-encoded as raw16
  MRAY payloads so the fused decode stage gets its windowed zero-copy path.
- ``crs.txt`` in the directory (optional) — one CRS string for all files.
- ``seq`` = lexicographic filename rank (the reference's filelist order).

Reads stream through ``ray.data.read_binary_files`` — file bytes never
gather on the driver; probing/transcoding happens inside ``map_batches``.
"""

from __future__ import annotations

import glob
import os

import numpy as np
import pyarrow as pa

from .. import codecs

IMG_EXTS = (".png", ".jpg", ".jpeg", ".mray", ".tif", ".tiff",
            ".gif", ".bmp", ".pgm", ".ppm", ".qoi", ".dat", ".img",
            ".kea")


def _world_file_for(path: str) -> str | None:
    base, ext = os.path.splitext(path)
    for cand in (base + ".wld", base + ext[:2] + ext[-1] + "w", base + ".pgw",
                 base + ".tfw"):
        if os.path.isfile(cand):
            return cand
    return None


def read_world_file(path: str):
    """Six-line world file -> GDAL geotransform (corner-anchored: the world
    file stores the CENTER of the top-left pixel)."""
    with open(path) as f:
        vals = [float(line.strip()) for line in f if line.strip()][:6]
    a, d, b, e, cx, cy = vals
    # corner = center - half a pixel step
    x0 = cx - a / 2.0 - b / 2.0
    y0 = cy - d / 2.0 - e / 2.0
    return (x0, a, b, y0, d, e)


def list_image_files(src) -> list[str]:
    """Directory, text filelist (reference-style), or explicit list ->
    sorted image paths."""
    if isinstance(src, (list, tuple)):
        return sorted(src)
    if os.path.isdir(src):
        out = []
        for ext in IMG_EXTS:
            out.extend(glob.glob(os.path.join(src, f"*{ext}")))
        return sorted(out)
    # reference-style text filelist: one path per line (mosaic.py:112-128)
    with open(src) as f:
        return [line.strip() for line in f if line.strip()]


def read_image_files(src, crs: str | None = None, nullval: float = 0.0):
    """Loose image files -> the standard images Dataset (explicit-catalog
    shape: image_id/bytes/w/h/fmt + gt/crs/nullval/seq/dtype columns)."""
    import ray

    paths = list_image_files(src)
    if not paths:
        raise ValueError(f"no image files found under {src!r}")
    seq_of = {p: i for i, p in enumerate(paths)}
    # sidecar CRS (one per directory) — tiny driver-side read
    if crs is None:
        for p in paths:
            cand = os.path.join(os.path.dirname(p), "crs.txt")
            if os.path.isfile(cand):
                with open(cand) as f:
                    crs = f.read().strip()
                break
    crs = crs or "EPSG:32756"
    seq_ref = ray.put(seq_of)

    def to_catalog(batch: pa.Table) -> pa.Table:
        seqs = ray.get(seq_ref)
        rows = {
            "image_id": [], "bytes": [], "w": [], "h": [], "fmt": [],
            "gt": [], "crs": [], "nullval": [], "seq": [], "dtype": [],
            "band": [],
        }
        for i in range(batch.num_rows):
            path = batch["path"][i].as_py()
            buf = batch["bytes"][i].as_py()
            ext = os.path.splitext(path)[1].lower()
            nv = nullval
            row_crs = crs
            payloads = None  # (fmt, [per-band payload bytes], dtype, h, w)
            if ext in (".tif", ".tiff"):
                from ..sinks.gtiff import crs_from_geokeys, read_gtiff_bytes

                arr, gt, nodata = read_gtiff_bytes(buf)
                if nodata is not None:
                    nv = nodata
                # the file's own GeoKey directory beats the directory-level
                # default (export_gtiff now writes the EPSG code)
                gk_crs = crs_from_geokeys(buf)
                if gk_crs is not None:
                    row_crs = gk_crs
                planes = arr if arr.ndim == 3 else arr[None]
                payloads = (
                    "raw16",
                    [codecs.encode(np.ascontiguousarray(p), "raw16")
                     for p in planes],
                    arr.dtype.name, planes.shape[1], planes.shape[2],
                )
            elif ext == ".img":
                # Erdas Imagine HFA: self-contained (dictionary-driven
                # reader, sinks/hfa.py) — geotransform from Eprj_MapInfo,
                # nodata from Eimg_NonInitializedValue, CRS from proName
                from ..sinks.hfa import parse_hfa_bytes

                arr, gt, h_nv, h_crs = parse_hfa_bytes(buf)
                if h_nv is not None:
                    nv = h_nv
                if h_crs:
                    row_crs = h_crs
                payloads = (
                    "raw16",
                    [codecs.encode(np.ascontiguousarray(p), "raw16")
                     for p in arr],
                    arr.dtype.name, arr.shape[1], arr.shape[2],
                )
            elif ext == ".kea":
                # KEA (.kea): self-contained minimal-HDF5 raster
                # (sinks/kea.py) — geotransform from /HEADER TL/RES/ROT,
                # nodata from BANDn/NO_DATA_VAL, CRS from /HEADER/WKT
                from ..sinks.kea import parse_kea_bytes

                arr, gt, k_nv, k_crs = parse_kea_bytes(buf)
                if k_nv is not None:
                    nv = k_nv
                if k_crs:
                    row_crs = k_crs
                payloads = (
                    "raw16",
                    [codecs.encode(np.ascontiguousarray(p), "raw16")
                     for p in arr],
                    arr.dtype.name, arr.shape[1], arr.shape[2],
                )
            elif ext == ".dat":
                # ENVI pair: the .hdr sidecar carries geotransform, CRS,
                # nullval and dtype (sinks/envi.py writes these)
                from ..sinks.envi import parse_envi_bytes

                hdr_path = os.path.splitext(path)[0] + ".hdr"
                arr, gt, e_nv, e_crs = parse_envi_bytes(
                    buf, open(hdr_path).read())
                if e_nv is not None:
                    nv = e_nv
                if e_crs:
                    row_crs = e_crs
                payloads = (
                    "raw16",
                    [codecs.encode(np.ascontiguousarray(p), "raw16")
                     for p in arr],
                    arr.dtype.name, arr.shape[1], arr.shape[2],
                )
            else:
                fmt, h, w = codecs.probe_header(buf)
                dtype = codecs.header_dtype(buf).name
                wld = _world_file_for(path)
                gt = read_world_file(wld) if wld else None
                if gt is None:
                    raise ValueError(
                        f"{path}: no world file (.wld) found — loose "
                        "image files need sidecar georeferencing"
                    )
                # color containers (gif/bmp/color png-jpg) carry one shared
                # payload per band row, plane-sliced at decode
                nb = 1
                if ext in (".gif", ".bmp", ".ppm", ".qoi"):
                    shp = codecs.decode(buf).shape
                    nb = shp[2] if len(shp) == 3 else 1
                payloads = (fmt, [buf] * nb, dtype, h, w)
            fmt, blobs, dtype, h, w = payloads
            for b, blob in enumerate(blobs):
                rows["image_id"].append(
                    os.path.splitext(os.path.basename(path))[0]
                )
                rows["bytes"].append(blob)
                rows["w"].append(w)
                rows["h"].append(h)
                rows["fmt"].append(fmt)
                rows["gt"].append(list(gt))
                rows["crs"].append(row_crs)
                rows["nullval"].append(float(nv))
                rows["seq"].append(seqs[path])
                rows["dtype"].append(dtype)
                rows["band"].append(b)
        return pa.table(
            {
                "image_id": pa.array(rows["image_id"], pa.string()),
                "bytes": pa.array(rows["bytes"], pa.binary()),
                "w": pa.array(rows["w"], pa.int32()),
                "h": pa.array(rows["h"], pa.int32()),
                "fmt": pa.array(rows["fmt"], pa.string()),
                "gt": pa.array(rows["gt"], pa.list_(pa.float64(), 6)),
                "crs": pa.array(rows["crs"], pa.string()),
                "nullval": pa.array(rows["nullval"], pa.float64()),
                "seq": pa.array(rows["seq"], pa.int64()),
                "dtype": pa.array(rows["dtype"], pa.string()),
                "band": pa.array(rows["band"], pa.int32()),
            }
        )

    ds = ray.data.read_binary_files(paths, include_paths=True)
    return ds.map_batches(to_catalog, batch_format="pyarrow")


def catalog_from_files(src, out_path: str, crs: str | None = None,
                       nullval: float = 0.0) -> str:
    """Materialize a file directory as a parquet catalog (one-time import;
    do_mosaic then runs on the catalog with full column pruning)."""
    ds = read_image_files(src, crs, nullval)
    ds.write_parquet(out_path)
    return out_path
