"""The reference's end-to-end workflow, re-expressed on moaray.

moamosaic usage (README of the reference):

    moamosaic -i filelist.txt -o mosaic.tif --blocksize 1024 --nullval 0 \
              --outprojepsg 32756 --monitorjson mon.json

moaray equivalent (this script, or the CLI shown at the bottom): the text
filelist becomes an images catalog table, the GDAL output file becomes the
resumable tile-sharded sink plus an optional single-file GeoTIFF export,
and the projection trio collapses to one CRS string.

Run standalone:  python examples/reference_workflow.py
"""

import os
import shutil

import ray

from moaray import MosaicConfig, do_mosaic
from moaray.sinks.gtiff import export_gtiff, read_gtiff
from moaray.testgen import Layout, images_path

if not ray.is_initialized():
    ray.init(address="local", include_dashboard=False)

# 1. The input "filelist": a catalog table of images (parquet here; Lance at
#    scale). Fixture generator stands in for a real catalog.
layout = Layout("grid3x3", 9, 256)
catalog = images_path(layout)

# 2. doMosaic(filelist, outfile, ...) -> do_mosaic(catalog, cfg, out_dir)
out_dir = "/tmp/moaray_example_out"
shutil.rmtree(out_dir, ignore_errors=True)
cfg = MosaicConfig(
    layout=layout,          # omit for catalogs with explicit gt/crs columns
    blocksize=1024,         # ref --blocksize
    nullval=None,           # ref --nullval (None = first input's)
    min_overview_size=64,   # ref --minoverviewsize (pyramids)
    # reprojection (ref --outprojepsg/--outprojwkt/--outprojwktfile):
    # out_crs="AFFINE:0,2,0,0,0,2", resample="near",
)
res = do_mosaic(catalog, cfg, out_dir=out_dir, resume=False)

# 3. Outputs: committed tile partitions + manifest (resumable), band stats
#    (the STATISTICS_* metadata), pyramid overviews, phase timings (the
#    Monitoring record).
print("tiles committed:", res.manifest.num_rows, "manifest files")
print("band stats:", res.stats)
print("overview levels:", res.grid.overview_levels(64))
print("phase timings:", res.metrics["phase_s"])

# 4. Single-file raster for GDAL-consumer workflows (the reference's native
#    output shape).
tif = os.path.join(out_dir, "mosaic.tif")
export_gtiff(res, tif)
arr, gt, nodata = read_gtiff(tif)
print("GeoTIFF:", arr.shape, "transform:", gt[:2], "nodata:", nodata)

# 4b. KEA — the reference's own test suite writes KEA (ref tests.py:15);
#     moaray carries it on a from-scratch minimal-HDF5 container.
from moaray.sinks.kea import export_kea, read_kea  # noqa: E402

kea = os.path.join(out_dir, "mosaic.kea")
export_kea(res, kea)
karr, kgt, knodata, kcrs = read_kea(kea)
assert (karr == arr).all()
print("KEA:", karr.shape, "crs:", kcrs, "(bit-equal to the GeoTIFF)")

# 5. A killed run resumes from the committed tile set:
res2 = do_mosaic(catalog, cfg, out_dir=out_dir, resume=True)
print("resume skipped:", res2.skipped_tiles, "of", res2.grid.num_tiles, "keys")

ray.shutdown()

# CLI equivalent:
#   python -m moaray -i <catalog> -o /tmp/out --layout grid3x3,9,256 \
#       --blocksize 1024 --gtiff /tmp/out/mosaic.tif --monitorjson mon.json
# Cluster launch:  ray job submit -- python -m moaray ...
