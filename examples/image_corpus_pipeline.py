"""End-to-end image+caption corpus walkthrough on moaray.

The shape a real training-data pipeline takes on this engine, start to
finish — every stage from-scratch, no GDAL/Pillow/pyproj:

1. a directory of loose ``.jpg`` files with world-file sidecars imports to
   a catalog (sources/files.py; baseline-DCT decode via moaray/jpeg.py);
2. perceptual-hash dedup over the catalog's ``phash`` column drops
   re-encoded near-duplicates BEFORE any pixel work;
3. the surviving lat/lon (EPSG:4326) images mosaic onto a UTM grid through
   the from-scratch Transverse Mercator warp;
4. captions ride through byte-equal and attach per tile assignment;
5. the mosaic exports as a DEFLATE-compressed tiled GeoTIFF.

Run: PYTHONPATH=/root/repo python examples/image_corpus_pipeline.py
"""

import os
import shutil

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray

if not ray.is_initialized():
    ray.init(address="local", num_cpus=8, include_dashboard=False)

from moaray import MosaicConfig, do_mosaic
from moaray.jpeg import jpeg_encode
from moaray.ops.dedup import phash_neardup_pairs
from moaray.pipelines.mosaic import mosaic_array, tile_caption_manifest
from moaray.sinks.gtiff import read_gtiff_full
from moaray.sources.files import catalog_from_files

ROOT = "/tmp/moaray_corpus_demo"
shutil.rmtree(ROOT, ignore_errors=True)
os.makedirs(f"{ROOT}/jpgs")

# ---- 1. a tiny corpus of JPEG files: 2x2 lat/lon grid + one re-encode ----
SIZE = 64
rng = np.random.RandomState(7)
for i in range(4):
    r, c = divmod(i, 2)
    arr = (np.full((SIZE, SIZE), 40 + 50 * i) + rng.randint(0, 8, (SIZE, SIZE))).astype(np.uint8)
    arr[:, 0] = 0
    open(f"{ROOT}/jpgs/img{i}.jpg", "wb").write(jpeg_encode(arr, quality=95))
    lon0 = 152.90 + c * SIZE * 0.001
    lat0 = -29.90 - r * SIZE * 0.001
    # world file: CENTER of the top-left pixel
    open(f"{ROOT}/jpgs/img{i}.wld", "w").write(
        f"0.001\n0.0\n0.0\n-0.001\n{lon0 + 0.0005}\n{lat0 - 0.0005}\n"
    )
open(f"{ROOT}/jpgs/crs.txt", "w").write("EPSG:4326")

raw_cat = catalog_from_files(f"{ROOT}/jpgs", f"{ROOT}/catalog_raw")
tbl = pq.read_table(raw_cat).sort_by("seq")
print(f"catalog: {tbl.num_rows} images, columns {tbl.schema.names}")

# attach captions + phashes (the Lance-table contract columns); img3 is a
# re-encode of img0 (same phash +- 2 bits) that dedup must drop
caps = [f"scene {i}: synthetic tile over UTM 56S" for i in range(tbl.num_rows)]
ph = [11111111, 22222222, 33333333, 11111111 ^ 0b11]
tbl = tbl.append_column("caption", pa.array(caps, pa.string()))
tbl = tbl.append_column("phash", pa.array(ph, pa.int64()))
cat = f"{ROOT}/catalog"
os.makedirs(cat)
pq.write_table(tbl, f"{cat}/part-0.parquet")

# ---- 2. perceptual-hash dedup before any pixel decode ----
pairs = phash_neardup_pairs(
    ray.data.read_parquet(cat).select_columns(["image_id", "phash"]),
    max_hamming=3,
).take_all()
drop = {p["image_b"] for p in pairs}  # keep the lexicographically-first
print(f"phash near-dups: {[(p['image_a'], p['image_b']) for p in pairs]} "
      f"-> dropping {sorted(drop)}")
kept = tbl.filter(
    pc.invert(pc.is_in(tbl["image_id"], value_set=pa.array(sorted(drop))))
)
pq.write_table(kept, f"{ROOT}/catalog/part-0.parquet")

# ---- 3. mosaic the survivors onto a UTM grid (Transverse Mercator) ----
cfg = MosaicConfig(
    blocksize=32, out_crs="EPSG:32756", out_xres=100.0, out_yres=100.0,
    resample="near", do_pyramids=False,
)
res = do_mosaic(cat, cfg, out_dir=f"{ROOT}/out")
arr = mosaic_array(res.tiles_ds, res.grid)
print(f"mosaic: {res.grid.ncols}x{res.grid.nrows} px on {res.grid.crs}, "
      f"stats {res.stats}")
assert res.grid.crs == "EPSG:32756" and (arr > 0).sum() > 1000

# ---- 4. captions attach per tile assignment, byte-equal ----
man = tile_caption_manifest(cat, cfg).take_all()
truth = dict(zip(kept["image_id"].to_pylist(), kept["caption"].to_pylist()))
assert all(r["caption"] == truth[r["image_id"]] for r in man)
print(f"caption manifest: {len(man)} (tile, image) rows, byte-equal")

# ---- 5. DEFLATE tiled GeoTIFF export ----
from moaray.sinks.gtiff import export_gtiff

export_gtiff(res, f"{ROOT}/mosaic.tif", tiled=True, min_overview_size=32,
             compress="deflate", predictor=2)
full, ovs, gt, nd = read_gtiff_full(f"{ROOT}/mosaic.tif")
assert np.array_equal(full, arr)
print(f"GeoTIFF: {os.path.getsize(f'{ROOT}/mosaic.tif')} bytes, "
      f"{len(ovs)} overview level(s), round-trip bit-exact")
# ---- 6. mosaic tiles -> fixed-size training patches -> tar shards ----
# The geospatial-to-training handoff: decode each committed tile payload,
# cut 16x16 patches (clamp tiling so every pixel ships), and write
# WebDataset-style shards a trainer can stream.
from moaray.ops.multimodal import image_patches
from moaray.sinks.wds import read_wds_shards, write_wds_shards
from moaray.stages.assemble import decode_payload

_dtype = res.grid.dtype


def tiles_to_images(b: pa.Table) -> pa.Table:
    from moaray import codecs as _codecs

    ids, blobs = [], []
    for i in range(b.num_rows):
        a = decode_payload(
            b["pixels"][i].as_py(), b["pixels_codec"][i].as_py(), _dtype
        ).reshape(b["out_ysize"][i].as_py(), b["out_xsize"][i].as_py())
        ids.append(f"tile{b['tile_id'][i].as_py():06d}")
        blobs.append(_codecs.encode(a, "png"))
    return pa.table({
        "image_id": pa.array(ids, pa.string()),
        "bytes": pa.array(blobs, pa.binary()),
        "fmt": pa.array(["png"] * len(ids), pa.string()),
    })


patches = image_patches(
    res.tiles_ds.map_batches(tiles_to_images, batch_format="pyarrow"),
    16, 16, stride=16, pad="clamp", concurrency=(1, 4),
).map_batches(
    lambda b: b.append_column(
        "sample_id",
        pc.binary_join_element_wise(
            b["image_id"], pc.cast(b["patch_id"], pa.string()), "/"
        ),
    ),
    batch_format="pyarrow",
)
shutil.rmtree(f"{ROOT}/shards", ignore_errors=True)
w = write_wds_shards(patches, f"{ROOT}/shards", key="sample_id",
                     n_shards=8)
n_back = read_wds_shards(f"{ROOT}/shards", key="sample_id").count()
print(f"patch shards: {w['rows']} 16x16 patches in {w['written']} tars, "
      f"{n_back} read back")
assert n_back == w["rows"] > 0

print("corpus pipeline OK")
ray.shutdown()
