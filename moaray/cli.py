"""Command-line entry point (the reference's `moamosaic` console script).

Mirrors mainCmd/getCmdargs (ref /root/reference/moamosaic/mosaic.py:38-108):
an images table path replaces the text filelist (`-i`), a tile-sharded
output directory replaces the single GDAL file (`-o`), and the projection
trio collapses to one CRS string (`--outprojcrs`, see moaray/crs.py).

Run standalone (owns its Ray session)::

    python -m moaray -i /tmp/moaray_fixtures/images_grid3x3_... -o /tmp/out \
        --layout grid3x3,9,64 --blocksize 64 --monitorjson /tmp/mon.json

or submit to a cluster: ``ray job submit -- python -m moaray ...``.
"""

from __future__ import annotations

import argparse
import json
import sys


def get_cmdargs(argv=None):
    p = argparse.ArgumentParser(
        prog="moaray",
        description="Make a mosaic of the input image table (Ray Data).",
    )
    p.add_argument("-i", "--infile", required=True,
                   help="images table path (parquet dir/file; Lance at scale)")
    p.add_argument("-o", "--outdir", required=True,
                   help="output directory (tiles/ + manifest/)")
    p.add_argument("--layout", default=None,
                   help="synthetic placement spec 'name,n,size' (e.g. "
                        "grid3x3,9,64); omit when the images table carries "
                        "explicit gt/crs metadata columns")
    p.add_argument("-b", "--blocksize", type=int, default=1024,
                   help="output tile size in pixels (default %(default)s)")
    p.add_argument("-n", "--numthreads", type=int, default=None,
                   help="reference-compat alias for --numcpus (the engine "
                        "parallelism knob is the Ray session CPU count)")
    p.add_argument("-d", "--driver", default="parquet",
                   choices=["parquet", "GTiff", "ENVI", "HFA", "KEA"],
                   help="output driver: 'parquet' = tile-sharded resumable "
                        "sink at -o (the scale path); 'ENVI' = flat-binary "
                        "pair (-o = data file, sibling .hdr); 'HFA' = single "
                        "Erdas Imagine .img FILE at -o (blocked, from-scratch "
                        "writer); 'KEA' = single .kea FILE at -o (the "
                        "reference's default test driver; from-scratch "
                        "minimal-HDF5 container); 'GTiff' = single GeoTIFF "
                        "FILE at -o (reference-compat; tiles spool through "
                        "a temp dir)")
    p.add_argument("--co", action="append", default=[],
                   help="creation option, reference-style KEY=VALUE; "
                        "COMPRESS=NONE disables the z16 tile codec, "
                        "COMPRESS=DEFLATE (default) keeps it; other keys "
                        "are accepted and ignored with a note")
    p.add_argument("--nullval", type=float, default=None,
                   help="null value override (default: first input's)")
    p.add_argument("--merge", default="last",
                   choices=["last", "feather", "nearest", "mean", "median",
                            "max", "min"],
                   help="overlap merge kernel (default %(default)s)")
    p.add_argument("--feather-partials", action="store_true",
                   help="with --merge feather: persist per-tile num/den "
                        "blend partials so a later --update can fold new "
                        "images in without re-reading any original source")
    p.add_argument("--resume", action="store_true",
                   help="skip tiles already committed in the output manifest")
    p.add_argument("--update", action="store_true",
                   help="incremental update: fold the input catalog's images "
                        "into the EXISTING committed mosaic at -o, rewriting "
                        "only affected tiles (merge=feather needs a base "
                        "built with --feather-partials)")
    p.add_argument("--extend", metavar="NEW_OUT", default=None,
                   help="like --update but the input may EXCEED the stored "
                        "extent: the grid grows to the union extent and a "
                        "complete re-keyed output writes to NEW_OUT "
                        "(committed pixels migrate; old sources never "
                        "re-read)")
    p.add_argument("--on-decode-error", default="raise",
                   choices=["raise", "skip"], dest="on_decode_error",
                   help="corrupt-payload policy: 'skip' drops only the bad "
                        "image (logged) instead of failing the job")
    p.add_argument("--nopyramids", action="store_true",
                   help="skip overview pyramid generation")
    p.add_argument("--minoverviewsize", type=int, default=1024,
                   help="smallest overview dimension (default %(default)s)")
    proj = p.add_argument_group("projection")
    proj.add_argument("--outprojcrs", default=None,
                      help="output CRS string (name or AFFINE:a,b,c,d,e,f); "
                           "inputs are warped on read when set")
    proj.add_argument("--outprojepsg", type=int, default=None,
                      help="reference-compat: output EPSG number "
                           "(becomes CRS 'EPSG:<n>')")
    proj.add_argument("--outprojwktfile", default=None,
                      help="reference-compat: file whose contents name the "
                           "output CRS")
    proj.add_argument("--outprojwkt", default=None,
                      help="reference-compat: inline WKT (or CRS name) "
                           "string naming the output CRS")
    proj.add_argument("--xres", type=float, default=None,
                      help="output X pixel size (default: first input's)")
    proj.add_argument("--yres", type=float, default=None,
                      help="output Y pixel size (default: first input's)")
    proj.add_argument("--resamplemethod", "--resample", default="near",
                      choices=["near", "bilinear", "cubic", "cubicspline",
                               "lanczos", "average", "rms", "mode", "min",
                               "max", "med", "q1", "q3", "sum"],
                      help="warp resampling method (default %(default)s); "
                           "--resample is the reference-compat alias")
    p.add_argument("--gtiff", default=None,
                   help="also export the (band-0) mosaic as a single GeoTIFF "
                        "file at this path (driver-side assembly; the "
                        "tile-sharded parquet sink remains the scale output)")
    p.add_argument("--contour", default=None, metavar="LEVELS",
                   help="comma-separated isoline levels; writes contour "
                        "segments as partitioned GeoJSONL next to the "
                        "output (<outdir>_contours or --contour-out)")
    p.add_argument("--contour-out", default=None, metavar="DIR",
                   help="directory for --contour GeoJSONL output")
    p.add_argument("--webtiles", default=None, metavar="DIR",
                   help="also export a z/x/y PNG web-tile tree (TMS-style "
                        "pyramid) under this directory")
    p.add_argument("--webtile-size", type=int, default=256,
                   help="web tile edge in pixels (default 256)")
    p.add_argument("--monitorjson", default=None,
                   help="write run metrics (phase times, stats, manifest "
                        "summary) to this JSON file")
    p.add_argument("--numcpus", type=int, default=None,
                   help="ray.init(num_cpus=...) when Ray is not already up")
    return p.parse_args(argv)


def main_cmd(argv=None) -> int:
    args = get_cmdargs(argv)

    import ray

    owns_ray = not ray.is_initialized()
    if owns_ray:
        kw = {"include_dashboard": False}
        cpus = args.numcpus or args.numthreads
        if cpus:
            kw["num_cpus"] = cpus
        ray.init(address="local", **kw)

    try:
        from .pipelines.mosaic import MosaicConfig, do_mosaic
        from .testgen import Layout

        layout = None
        if args.layout is not None:
            name, n, size = args.layout.split(",")
            layout = Layout(name, int(n), int(size))
        # file-based input (reference-style): a directory of loose
        # png/mray/tif files (world-file georeferencing), or a .txt
        # filelist, imports to a parquet catalog first
        infile = args.infile
        import glob as _glob
        import os as _os

        is_file_input = infile.endswith(".txt") or (
            _os.path.isdir(infile)
            and not _glob.glob(_os.path.join(infile, "*.parquet"))
            and any(
                _glob.glob(_os.path.join(infile, f"*{ext}"))
                for ext in (".png", ".jpg", ".jpeg", ".mray", ".tif",
                            ".tiff", ".gif", ".bmp", ".pgm", ".ppm")
            )
        )
        if is_file_input:
            from .sources.files import catalog_from_files

            infile = catalog_from_files(
                infile, args.outdir.rstrip("/") + ".catalog"
            )
        # reference projection trio collapses to one CRS string
        out_crs = args.outprojcrs
        if out_crs is None and args.outprojepsg is not None:
            out_crs = f"EPSG:{args.outprojepsg}"
        if out_crs is None and args.outprojwktfile is not None:
            with open(args.outprojwktfile) as f:
                out_crs = f.read().strip()
        if out_crs is None and args.outprojwkt is not None:
            out_crs = args.outprojwkt.strip()
        # creation options (reference --co KEY=VALUE): COMPRESS toggles the
        # tile codec; anything else is accepted with a note (the parquet
        # sink has no GDAL creation-option surface)
        tile_codec = "z16"
        gtiff_tiled = False
        gtiff_compress = "deflate"  # reference default: COMPRESS=DEFLATE
        gtiff_predictor = 1
        gtiff_bigtiff = None  # None = IF_SAFER (size-based)
        for co in args.co:
            key, _, val = co.partition("=")
            if key.upper() == "COMPRESS":
                tile_codec = None if val.upper() == "NONE" else "z16"
                gtiff_compress = {
                    "NONE": None, "DEFLATE": "deflate", "LZW": "lzw",
                    "PACKBITS": "packbits", "JPEG": "jpeg",
                }.get(val.upper(), "deflate")
            elif key.upper() == "PREDICTOR":
                gtiff_predictor = int(val)
            elif key.upper() == "BIGTIFF":
                # reference default creation option BIGTIFF=IF_SAFER
                # (ref mosaic.py:30-35): YES forces BigTIFF, NO forces
                # classic, IF_SAFER sizes it from the uncompressed array
                v = val.upper()
                gtiff_bigtiff = (True if v in ("YES", "TRUE", "1")
                                 else False if v == "NO" else None)
            elif key.upper() == "TILED":
                # reference GTiff creation option: tiled organization with
                # embedded overview IFDs (sinks/gtiff.py write_gtiff_tiled)
                gtiff_tiled = val.upper() in ("YES", "TRUE", "1")
            else:
                print(f"note: creation option {co!r} not applicable to the "
                      "parquet sink; ignored")
        # layout=None requires explicit gt/crs catalog columns on the table
        # (stages/plan.py metas_from_batch)
        cfg = MosaicConfig(
            layout=layout,
            blocksize=args.blocksize,
            nullval=args.nullval,
            merge=args.merge,
            feather_partials=args.feather_partials,
            do_pyramids=not args.nopyramids,
            min_overview_size=args.minoverviewsize,
            out_crs=out_crs,
            out_xres=args.xres,
            out_yres=args.yres,
            resample=args.resamplemethod,
            tile_codec=tile_codec,
            on_decode_error=args.on_decode_error,
        )
        single_file = args.driver in ("GTiff", "ENVI", "HFA", "KEA")
        out_dir = args.outdir
        if single_file:
            # reference-compat: -o names a single GeoTIFF FILE; the
            # resumable tile sink spools through a sibling work dir
            out_dir = args.outdir + ".tiles"
        if args.extend:
            from .pipelines.update import extend_mosaic

            res = extend_mosaic(infile, cfg, out_dir, args.extend)
        elif args.update:
            from .pipelines.update import update_mosaic

            res = update_mosaic(infile, cfg, out_dir)
        else:
            res = do_mosaic(infile, cfg, out_dir=out_dir,
                            resume=args.resume)

        # the reference writes every band into the one output file
        # (numBands, ref mosaic.py:604-660) — mirror that for multi-band
        exp_band = "all" if getattr(res.grid, "nbands", 1) > 1 else 0
        if single_file and args.driver == "ENVI":
            from .sinks.envi import export_envi

            export_envi(res, args.outdir, band=exp_band)
        elif single_file and args.driver == "HFA":
            from .sinks.hfa import export_hfa

            export_hfa(res, args.outdir, band=exp_band)
        elif single_file and args.driver == "KEA":
            from .sinks.kea import export_kea

            export_kea(res, args.outdir, band=exp_band)
        elif single_file:
            from .sinks.gtiff import export_gtiff

            export_gtiff(res, args.outdir, band=exp_band, tiled=gtiff_tiled,
                         min_overview_size=args.minoverviewsize,
                         compress=gtiff_compress, predictor=gtiff_predictor,
                         bigtiff=gtiff_bigtiff)
        if args.gtiff:
            from .sinks.gtiff import export_gtiff

            export_gtiff(res, args.gtiff, band=exp_band, tiled=gtiff_tiled,
                         min_overview_size=args.minoverviewsize,
                         compress=gtiff_compress, predictor=gtiff_predictor,
                         bigtiff=gtiff_bigtiff)
        if args.contour:
            from .ops.raster import contour_lines
            from .ops.vector import segment_geometries
            from .sinks.partitioned import write_geojsonl

            levels = [float(v) for v in args.contour.split(",")]
            segs = contour_lines(res.tiles_ds, res.grid, levels=levels)
            ct_out = args.contour_out or (args.outdir.rstrip("/")
                                          + "_contours")
            ct_stats = write_geojsonl(segs, ct_out, segment_geometries,
                                      key="tile_id")
            print(f"contours: {ct_stats['rows']} segments "
                  f"({ct_stats['written']} partitions) -> {ct_out}")
        if args.webtiles:
            from .sinks.webtiles import export_web_tiles

            n_written = export_web_tiles(
                res.tiles_ds, res.grid, args.webtiles,
                tile_size=args.webtile_size,
                band=0 if exp_band == "all" else exp_band,
            ).count()
            print(f"webtiles: {n_written} tiles -> {args.webtiles}")

        n_tiles = res.grid.num_tiles
        print(
            f"mosaic: {res.grid.ncols}x{res.grid.nrows} px, "
            f"{n_tiles} tiles ({res.skipped_tiles} skipped), "
            f"stats={res.stats}"
        )
        if args.monitorjson:
            record = {
                "params": vars(args),
                "grid": {
                    "ncols": res.grid.ncols,
                    "nrows": res.grid.nrows,
                    "num_tiles": n_tiles,
                    "crs": res.grid.crs,
                },
                "skipped_tiles": res.skipped_tiles,
                "phase_s": res.metrics.get("phase_s", {}),
                "stats": res.stats,
                "stats_by_band": res.stats_by_band,
                "manifest_files": (
                    res.manifest.num_rows if res.manifest is not None else 0
                ),
            }
            with open(args.monitorjson, "w") as f:
                json.dump(record, f, indent=2)
        return 0
    finally:
        if owns_ray:
            ray.shutdown()


if __name__ == "__main__":
    sys.exit(main_cmd())
