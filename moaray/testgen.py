"""Deterministic synthetic image-table generator (FIXTURES.md).

Produces the exact input_hint schema from BASELINE.json:
``(image_id: string, bytes: binary, w: int32, h: int32, fmt: string,
caption: string, phash: int64)`` — with pixel content and geo placement
mirroring the reference's test construction
(ref: /root/reference/moamosaic/tests.py:69-106): column-index ramp pixels
(column 0 == nullval 0), EPSG:32756, 10 m pixels, origin (300000, 7000000),
2-pixel overlaps between adjacent images.

Placement is NOT stored in the table (input_hint carries no geo columns);
it is derived by the pure function :func:`place` shared by the engine's
probe stage, the test oracle, and bench — keyed only by (image index,
layout params).
"""

from __future__ import annotations

import hashlib
import os
from dataclasses import dataclass

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from . import codecs
from .geo import GeoTransform, ImageMeta

ORIGIN_X = 300000.0
ORIGIN_Y = 7000000.0
PIX = 10.0
CRS = "EPSG:32756"
OVERLAP = 2  # pixels of overlap between adjacent images (tests.py:84-87)


@dataclass(frozen=True)
class Layout:
    """Deterministic placement spec carried in the pipeline config."""

    name: str  # pair_overlap | grid | hotspot | sparse_gap | bench
    n: int  # number of images
    size: int  # w == h per image

    def grid_side(self) -> int:
        side = int(np.ceil(np.sqrt(self.n)))
        return max(side, 1)


def image_idx(image_id: str) -> int:
    return int(image_id[3:])


def make_image_id(idx: int) -> str:
    return f"img{idx:08d}"


def place(idx: int, layout: Layout) -> GeoTransform:
    """Pure placement function: image index -> GDAL geotransform."""
    s = layout.size
    step = (s - OVERLAP) * PIX
    if layout.name == "pair_overlap":
        # ref tests.py:84-87 — second image shifted by (ncols-2)*xres
        return (ORIGIN_X + idx * step, PIX, 0.0, ORIGIN_Y, 0.0, -PIX)
    if layout.name in ("grid", "grid3x3"):
        side = 3 if layout.name == "grid3x3" else layout.grid_side()
        r, c = divmod(idx, side)
        return (ORIGIN_X + c * step, PIX, 0.0, ORIGIN_Y - r * step, 0.0, -PIX)
    if layout.name == "hotspot":
        # n-8 images stacked on the same extent; last 8 form a sparse ring
        # two image-widths out, exercising skew in the tile-assembly shuffle.
        n_hot = max(layout.n - 8, 1)
        if idx < n_hot:
            return (ORIGIN_X, PIX, 0.0, ORIGIN_Y, 0.0, -PIX)
        ring_positions = [(-2, -2), (-2, 0), (-2, 2), (0, -2),
                          (0, 2), (2, -2), (2, 0), (2, 2)]
        rr, cc = ring_positions[(idx - n_hot) % 8]
        off = s * PIX
        return (ORIGIN_X + cc * off, PIX, 0.0, ORIGIN_Y - rr * off, 0.0, -PIX)
    if layout.name == "sparse_gap":
        # Two pairs separated by a > one-image gap: middle tiles see no input
        # (pins the all-null-tile path, ref mosaic.py:351-359).
        col = idx if idx < 2 else idx + 2
        return (ORIGIN_X + col * step, PIX, 0.0, ORIGIN_Y, 0.0, -PIX)
    if layout.name == "mixed_crs":
        # image 0 in the default CRS; images >0 in a scaled CRS
        # ("AFFINE:0,2,0,0,0,2": crs coords -> world doubled) placed so their
        # WORLD footprint continues the pair_overlap tiling. Pins the
        # heterogeneous-projection error path (ref reproj.py:72-127) and the
        # warp path that resolves it.
        if idx == 0:
            return (ORIGIN_X, PIX, 0.0, ORIGIN_Y, 0.0, -PIX)
        world_x0 = ORIGIN_X + idx * step
        return (world_x0 / 2.0, PIX / 2.0, 0.0, ORIGIN_Y / 2.0, 0.0, -PIX / 2.0)
    if layout.name == "bench":
        # grid placement for the first 3/4, hotspot stack for the rest —
        # realistic mix of sparse coverage and a skewed dense region.
        n_grid = (layout.n * 3) // 4
        if idx < n_grid:
            side = max(int(np.ceil(np.sqrt(n_grid))), 1)
            r, c = divmod(idx, side)
            return (ORIGIN_X + c * step, PIX, 0.0, ORIGIN_Y - r * step, 0.0, -PIX)
        return (ORIGIN_X, PIX, 0.0, ORIGIN_Y, 0.0, -PIX)
    raise ValueError(f"unknown layout {layout.name!r}")


def pixel_array(
    idx: int, layout: Layout, dtype: str = "uint16", nullval: float = 0.0
) -> np.ndarray:
    """Column-index ramp (column 0 == null), per-image offset for layouts
    where overlapping images must be distinguishable (FIXTURES.md §1).

    Non-uint16 dtypes mirror the reference's any-GDAL-dtype capability
    (ref mosaic.py:16,354): the ramp is cast, column 0 carries ``nullval``
    (NaN for NaN-null float rasters, exercising the StatsAccumulator NaN
    case, ref mosaic.py:762-767)."""
    s = layout.size
    np_dtype = np.dtype(dtype)
    if np.issubdtype(np_dtype, np.floating):
        arr = np.tile(
            np.arange(s, dtype=np.float64) + 0.5, (s, 1)
        ).astype(np_dtype)
    else:
        arr = np.tile(np.arange(s, dtype=np_dtype), (s, 1))
    if layout.name in ("hotspot", "bench"):
        offset = np_dtype.type((idx % 7) + 1)
        arr = (arr + offset).astype(np_dtype)
    arr[:, 0] = np_dtype.type(nullval) if not np.isnan(nullval) else np.nan
    return arr


def phash_for(image_id: str) -> int:
    return int.from_bytes(
        hashlib.sha256(image_id.encode()).digest()[:8], "little", signed=True
    )


def caption_for(image_id: str, seed: int = 42) -> str:
    return f"synthetic tile {image_id} seed{seed}"


def fmt_for(idx: int, fmts: tuple[str, ...]) -> str:
    return fmts[idx % len(fmts)]


def crs_for(idx: int, layout: Layout) -> str:
    if layout.name == "mixed_crs" and idx > 0:
        return "AFFINE:0,2,0,0,0,2"
    return CRS


def meta_for(idx: int, layout: Layout, fmt: str = "raw16") -> ImageMeta:
    return ImageMeta(
        image_id=make_image_id(idx),
        ncols=layout.size,
        nrows=layout.size,
        transform=place(idx, layout),
        crs=crs_for(idx, layout),
        dtype="uint16",
        nullval=0.0,
        nbands=1,
        fmt=fmt,
    )


def metas_for_layout(layout: Layout, fmts: tuple[str, ...] = ("raw16",)) -> list[ImageMeta]:
    return [meta_for(i, layout, fmt_for(i, fmts)) for i in range(layout.n)]


def band_pixel_array(
    idx: int, layout: Layout, band: int,
    dtype: str = "uint16", nullval: float = 0.0,
) -> np.ndarray:
    """Band b = base ramp + 100*b (column 0 stays null)."""
    arr = pixel_array(idx, layout, dtype, nullval)
    if band:
        np_dtype = np.dtype(dtype)
        arr = (arr + np_dtype.type(100 * band)).astype(np_dtype)
        arr[:, 0] = np_dtype.type(nullval) if not np.isnan(nullval) else np.nan
    return arr


def rgb_pixel_array(idx: int, layout: Layout) -> np.ndarray:
    """(size, size, 3) uint8 image: band b = clipped ramp + 8*(b+1), NO
    null pixels. Two deliberate differences from the multiband fixtures:

    - offsets are CLIPPED, not wrapped — the +100*b offsets wrap in uint8
      and a 200-level sawtooth in the blue plane puts chroma ringing all
      over the image (a fixture artifact, not a codec property);
    - no null column — lossy codecs cannot preserve a value-coded null
      (chroma ringing turns a 0 into a 1, the pixel stops being null and
      overwrites real data in overlap merges; the engine documents the
      same hazard for q12 and GDAL behaves identically on lossy nodata).
      Minimum value 8 with max codec error ~5 keeps every decoded pixel
      strictly positive, so null semantics never engage."""
    base = pixel_array(idx, layout, "uint8").astype(np.int32)
    planes = []
    for b in range(3):
        p = np.clip(base + 8 * (b + 1), 8, 255).astype(np.uint8)
        planes.append(p)
    return np.stack(planes, axis=2)


def gen_images_table(
    layout: Layout,
    fmts: tuple[str, ...] = ("raw16",),
    seed: int = 42,
    explicit_meta: bool = False,
    nbands: int = 1,
    dtype: str = "uint16",
    nullval: float = 0.0,
    color_jpeg: bool = False,
    jpeg_subsampling: str = "420",
    color_png: bool = False,
    jpeg_progressive: bool = False,
) -> pa.Table:
    """Build the full images table in memory (small scales only).

    With ``explicit_meta``, per-image ``gt`` (6-double geotransform), ``crs``
    and ``nullval`` columns are stored on the table — the at-scale input
    shape where footprints come from the catalog itself (the analog of the
    reference probing each file, structures.py:11-34) instead of the
    synthetic placement function.
    """
    if dtype != "uint16" and not explicit_meta:
        raise ValueError(
            "non-uint16 fixtures need explicit_meta=True so the catalog "
            "carries the dtype/nullval columns"
        )
    if color_jpeg and (nbands != 3 or dtype != "uint8" or fmts != ("jpeg",)):
        raise ValueError(
            "color_jpeg fixtures require nbands=3, dtype='uint8', "
            "fmts=('jpeg',)"
        )
    if color_png and (nbands != 3 or dtype != "uint8" or fmts != ("png",)):
        raise ValueError(
            "color_png fixtures require nbands=3, dtype='uint8', "
            "fmts=('png',)"
        )
    ids, blobs, ws, hs, fmt_col, captions, phashes = [], [], [], [], [], [], []
    gts, crss, nulls, band_col, dtypes = [], [], [], [], []
    for idx in range(layout.n):
      if color_jpeg:
          from .jpeg import jpeg_encode

          color_blob = jpeg_encode(
              rgb_pixel_array(idx, layout), subsampling=jpeg_subsampling
          )
      elif color_png:
          # lossless color: the SAME rgb planes as color_jpeg, so the two
          # color paths share parity fixtures (png is bit-exact)
          color_blob = codecs.png_encode(rgb_pixel_array(idx, layout))
      else:
          color_blob = None
      for band in range(nbands):
        image_id = make_image_id(idx)
        fmt = fmt_for(idx, fmts)
        if color_jpeg or color_png:
            # one color payload, shared verbatim by the three band rows
            blobs.append(color_blob)
        else:
            arr = band_pixel_array(idx, layout, band, dtype, nullval)
            if fmt == "jpeg" and jpeg_progressive:
                from .jpeg_progressive import jpeg_encode_progressive

                blobs.append(jpeg_encode_progressive(arr, quality=95))
            else:
                blobs.append(codecs.encode(arr, fmt))
        ids.append(image_id)
        ws.append(layout.size)
        hs.append(layout.size)
        fmt_col.append(fmt)
        captions.append(caption_for(image_id, seed))
        phashes.append(phash_for(image_id))
        band_col.append(band)
        if explicit_meta:
            gts.append(list(place(idx, layout)))
            crss.append(crs_for(idx, layout))
            nulls.append(nullval)
            dtypes.append(dtype)
    cols = {
        "image_id": pa.array(ids, pa.string()),
        "bytes": pa.array(blobs, pa.binary()),
        "w": pa.array(ws, pa.int32()),
        "h": pa.array(hs, pa.int32()),
        "fmt": pa.array(fmt_col, pa.string()),
        "caption": pa.array(captions, pa.string()),
        "phash": pa.array(phashes, pa.int64()),
    }
    if nbands > 1:
        cols["band"] = pa.array(band_col, pa.int32())
    if explicit_meta:
        cols["gt"] = pa.array(gts, pa.list_(pa.float64(), 6))
        cols["crs"] = pa.array(crss, pa.string())
        cols["nullval"] = pa.array(nulls, pa.float64())
        cols["dtype"] = pa.array(dtypes, pa.string())
    return pa.table(cols)


def images_path(
    layout: Layout,
    fmts: tuple[str, ...] = ("raw16",),
    seed: int = 42,
    root: str = "/tmp/moaray_fixtures",
    images_per_shard: int = 16,
    explicit_meta: bool = False,
    nbands: int = 1,
    dtype: str = "uint16",
    nullval: float = 0.0,
    color_jpeg: bool = False,
    jpeg_subsampling: str = "420",
    color_png: bool = False,
    jpeg_progressive: bool = False,
) -> str:
    """Write (once, cached) the images table as sharded parquet; return the
    dataset directory path.

    Lance is the nominal format per BASELINE.json but pylance is not in this
    sandbox, so parquet is the documented fallback (SURVEY.md §1.3 S1).
    Sharding matters: Ray's read parallelism (and the fused decode stage's)
    is bounded by input fragments, so one giant file would serialize the
    whole scan — at real scale the 10^12-image table is thousands of Lance
    fragments for exactly this reason.
    """
    os.makedirs(root, exist_ok=True)
    tag = f"{layout.name}_n{layout.n}_s{layout.size}_{'-'.join(fmts)}_seed{seed}"
    if explicit_meta or nbands > 1 or dtype != "uint16":
        nv_tag = "nan" if np.isnan(nullval) else f"{nullval:g}"
        tag += f"_x{int(explicit_meta)}_b{nbands}_{dtype}_nv{nv_tag}"
    if color_jpeg:
        tag += f"_rgb{jpeg_subsampling}"
    if color_png:
        tag += "_rgbpng"
    if jpeg_progressive:
        tag += "_prog"
    path = os.path.join(root, f"images_{tag}")
    done = path + ".done"  # marker outside the dir so dataset readers only
    # ever see parquet files inside
    if not os.path.exists(done):
        tbl = gen_images_table(
            layout, fmts, seed,
            explicit_meta=explicit_meta, nbands=nbands,
            dtype=dtype, nullval=nullval, color_jpeg=color_jpeg,
            jpeg_subsampling=jpeg_subsampling, color_png=color_png,
            jpeg_progressive=jpeg_progressive,
        )
        os.makedirs(path, exist_ok=True)
        rows_per_shard = images_per_shard * nbands
        n_shards = max(1, -(-tbl.num_rows // rows_per_shard))
        for s in range(n_shards):
            shard = tbl.slice(s * rows_per_shard, rows_per_shard)
            fp = os.path.join(path, f"part-{s:05d}.parquet")
            pq.write_table(shard, fp + ".tmp", row_group_size=4)
            os.replace(fp + ".tmp", fp)
        with open(done, "w") as f:
            f.write(tag)
    return path


def geo_images_path(n: int = 16, size: int = 48, seed: int = 7,
                    root: str = "/tmp/moaray_fixtures") -> str:
    """Write (once, cached) an explicit-meta catalog of overlapping images
    whose world coordinates are EPSG:4326 degrees — the input shape for the
    S2-cell-keyed spatial join (stages/plan.py assign_cell_join_s2)."""
    os.makedirs(root, exist_ok=True)
    path = os.path.join(root, f"geoimages_n{n}_s{size}_seed{seed}")
    done = path + ".done"
    if not os.path.exists(done):
        pix = 0.01
        rng = np.random.default_rng(seed)
        ids, blobs, gts, seqs = [], [], [], []
        for k in range(n):
            arr = np.full((size, size), k + 1, dtype=np.uint16)
            x0 = 150.0 + float(rng.uniform(0, 1.2))
            y0 = -30.0 - float(rng.uniform(0, 1.2))
            ids.append(f"geo{k:03d}")
            blobs.append(codecs.encode(arr, "z16"))
            gts.append([x0, pix, 0.0, y0, 0.0, -pix])
            seqs.append(k)
        tbl = pa.table({
            "image_id": pa.array(ids, pa.string()),
            "bytes": pa.array(blobs, pa.binary()),
            "w": pa.array([size] * n, pa.int32()),
            "h": pa.array([size] * n, pa.int32()),
            "fmt": pa.array(["z16"] * n, pa.string()),
            "gt": pa.array(gts, pa.list_(pa.float64(), 6)),
            "crs": pa.array(["EPSG:4326"] * n, pa.string()),
            "nullval": pa.array([0.0] * n, pa.float64()),
            "seq": pa.array(seqs, pa.int64()),
        })
        os.makedirs(path, exist_ok=True)
        fp = os.path.join(path, "part-00000.parquet")
        pq.write_table(tbl, fp + ".tmp", row_group_size=4)
        os.replace(fp + ".tmp", fp)
        with open(done, "w") as f:
            f.write(path)
    return path
