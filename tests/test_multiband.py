"""Multi-band mosaics: the band column parallelizes what the reference
serializes (one ThreadPoolExecutor round per band, ref mosaic.py:206-219).

Catalog shape: one row per (image, band); assembly groups by
(tile_id, band); stats/pyramids carry the band dimension."""

import numpy as np
import pyarrow.parquet as pq

from moaray import MosaicConfig, do_mosaic, oracle
from moaray.geo import make_output_grid
from moaray.pipelines.mosaic import mosaic_array, overview_array
from moaray.testgen import (
    Layout,
    band_pixel_array,
    gen_images_table,
    metas_for_layout,
)


def _band_truth(layout, band, blocksize=64):
    metas = metas_for_layout(layout)
    grid = make_output_grid(metas, blocksize=blocksize)
    arrays = {
        m.image_id: band_pixel_array(i, layout, band)
        for i, m in enumerate(metas)
    }
    return grid, oracle.build_mosaic(grid, metas, arrays)


def _write(tbl, tmp_path):
    p = tmp_path / "imgs"
    p.mkdir()
    pq.write_table(tbl, str(p / "part-0.parquet"))
    return str(p)


def test_two_band_mosaic_per_band_parity(tmp_path):
    layout = Layout("grid3x3", 9, 64)
    tbl = gen_images_table(layout, ("raw16",), nbands=2)
    assert "band" in tbl.schema.names and tbl.num_rows == 18
    path = _write(tbl, tmp_path)

    res = do_mosaic(path, MosaicConfig(layout=layout, blocksize=64,
                                       min_overview_size=16))
    for band in (0, 1):
        grid, truth = _band_truth(layout, band)
        got = mosaic_array(res.tiles_ds, res.grid, band=band)
        assert (got == truth).all(), f"band {band} mismatch"

    # per-band stats parity
    assert set(res.stats_by_band) == {0, 1}
    for band in (0, 1):
        _grid, truth = _band_truth(layout, band)
        tmin, tmax, tmean, tstd, tcount = oracle.stats(truth, 0.0)
        s = res.stats_by_band[band]
        assert s["min"] == tmin and s["max"] == tmax
        assert abs(s["mean"] - tmean) < 1e-9
        assert s["count"] == tcount
    assert res.stats == res.stats_by_band[0]

    # pyramids carry bands
    for band in (0, 1):
        _grid, truth = _band_truth(layout, band)
        for lvl in res.grid.overview_levels(16):
            true_ov = oracle.overview(truth, lvl)
            got_ov = overview_array(res.pyramids_ds, res.grid, lvl, band=band)
            r = min(true_ov.shape[0], got_ov.shape[0])
            c = min(true_ov.shape[1], got_ov.shape[1])
            assert (true_ov[:r, :c] == got_ov[:r, :c]).all()


def test_two_band_resume_per_band(tmp_path):
    layout = Layout("grid3x3", 4, 64)
    tbl = gen_images_table(layout, ("raw16",), nbands=2)
    path = _write(tbl, tmp_path)
    out = tmp_path / "out"
    cfg = MosaicConfig(layout=layout, blocksize=64)

    res = do_mosaic(path, cfg, out_dir=str(out))
    base0 = mosaic_array(res.tiles_ds, res.grid, band=0)
    base1 = mosaic_array(res.tiles_ds, res.grid, band=1)
    n_keys = res.grid.num_tiles * 2

    res2 = do_mosaic(path, cfg, out_dir=str(out), resume=True)
    assert res2.skipped_tiles == n_keys
    assert (mosaic_array(res2.tiles_ds, res2.grid, band=0) == base0).all()
    assert (mosaic_array(res2.tiles_ds, res2.grid, band=1) == base1).all()


def test_multiband_with_warp(tmp_path):
    """2-band catalog warped to a scale-2 CRS: each band equals the strided
    subsample of its own unwarped truth."""
    from moaray.geo import make_output_grid
    from moaray.testgen import metas_for_layout

    layout = Layout("grid3x3", 4, 64)
    tbl = gen_images_table(layout, ("raw16",), nbands=2)
    path = _write(tbl, tmp_path)
    res = do_mosaic(
        path,
        MosaicConfig(layout=layout, blocksize=64, do_pyramids=False,
                     out_crs="AFFINE:0,2,0,0,0,2"),
    )
    for band in (0, 1):
        _grid, truth = _band_truth(layout, band)
        got = mosaic_array(res.tiles_ds, res.grid, band=band)
        expect = truth[1::2, 1::2]
        assert got.shape == expect.shape
        assert (got == expect).all(), f"band {band}"


def test_resume_through_salted_path(tmp_path):
    """Kill nothing — just verify a resumed run whose remaining windows go
    through the SALTED merge produces the same mosaic as one fresh run."""
    import json, os

    layout = Layout("hotspot", 16, 64)
    from moaray.testgen import images_path as ip

    path = ip(layout)
    cfg = MosaicConfig(layout=layout, blocksize=64, do_pyramids=False,
                       salt_threshold=4, inputs_per_salt=2, tiles_per_file=1)
    out = tmp_path / "out"
    res = do_mosaic(path, cfg, out_dir=str(out))
    full = mosaic_array(res.tiles_ds, res.grid)

    # drop half the committed partitions, resume
    mans = sorted((out / "manifest").glob("*.json"))
    for m in mans[::2]:
        rec = json.loads(m.read_text())
        os.remove(rec["path"])
        m.unlink()
    res2 = do_mosaic(path, cfg, out_dir=str(out), resume=True)
    assert res2.skipped_tiles > 0
    got = mosaic_array(res2.tiles_ds, res2.grid)
    assert (got == full).all()


def test_color_jpeg_mosaic_per_band_parity(tmp_path):
    """A color-JPEG catalog (ONE YCbCr payload shared by an image's three
    band rows — the real image+caption corpus shape from input_hint's fmt
    column) mosaics band-for-band EXACTLY like an oracle built from the
    same decoder's planes (the north-star lossy invariant compares against
    the REFERENCE's decode of the same file — exact parity is its strict
    form), and clears the PSNR>=40dB gate vs the pristine per-band ramps
    at both 4:4:4 and 4:2:0 (the fixture is null-free: lossy codecs
    cannot preserve value-coded nulls, see rgb_pixel_array)."""
    from dataclasses import replace

    from moaray import codecs
    from moaray.jpeg import jpeg_encode
    from moaray.pipelines.mosaic import mosaic_array
    from moaray.testgen import (
        metas_for_layout,
        rgb_pixel_array,
    )

    layout = Layout("grid3x3", 9, 64)
    metas = [
        replace(m, dtype="uint8", fmt="jpeg") for m in metas_for_layout(layout)
    ]
    grid = make_output_grid(metas, blocksize=64)
    for sub, psnr_gate in (("444", 40.0), ("420", 40.0)):
        tbl = gen_images_table(
            layout, ("jpeg",), explicit_meta=True, nbands=3, dtype="uint8",
            color_jpeg=True, jpeg_subsampling=sub,
        )
        assert tbl.num_rows == 27
        # one payload per image, byte-identical across its three band rows
        blobs = tbl.column("bytes").to_pylist()
        assert blobs[0] == blobs[1] == blobs[2]
        sub_dir = tmp_path / f"sub{sub}"
        sub_dir.mkdir()
        path = _write(tbl, sub_dir)

        res = do_mosaic(path, MosaicConfig(layout=layout, blocksize=64))
        for band in range(3):
            lossy = {}
            clean = {}
            for i, m in enumerate(metas):
                rgb = rgb_pixel_array(i, layout)
                clean[m.image_id] = rgb[:, :, band]
                dec = codecs.decode(jpeg_encode(rgb, subsampling=sub))
                lossy[m.image_id] = dec[:, :, band]
            truth_lossy = oracle.build_mosaic(grid, metas, lossy)
            got = mosaic_array(res.tiles_ds, res.grid, band=band)
            assert got.dtype == np.uint8
            assert (got == truth_lossy).all(), f"{sub} band {band} mismatch"
            truth_clean = oracle.build_mosaic(grid, metas, clean)
            assert codecs.psnr(truth_clean, got, peak=255.0) >= psnr_gate
