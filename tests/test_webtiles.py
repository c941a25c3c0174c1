"""z/x/y web-tile PNG export: tree structure, strided-overview parity vs
the driver-side oracle, full-canvas reconstruction at level 0."""

import numpy as np

from moaray import MosaicConfig, do_mosaic, codecs, oracle
from moaray.pipelines.mosaic import mosaic_array
from moaray.sinks.webtiles import export_web_tiles, max_web_level
from moaray.testgen import Layout, images_path


def _run(tmp_path, ts=64):
    layout = Layout("grid3x3", 9, 64)
    res = do_mosaic(images_path(layout),
                    MosaicConfig(layout=layout, blocksize=64,
                                 do_pyramids=False, do_stats=False))
    out = str(tmp_path / "tiles")
    manifest = export_web_tiles(res.tiles_ds, res.grid, out,
                                tile_size=ts).to_pandas()
    return res, out, manifest, ts


def _read_level(out, z, ts, nrows, ncols, dtype):
    import os

    lvl = np.zeros((nrows, ncols), dtype=dtype)
    zdir = os.path.join(out, str(z))
    for wx in os.listdir(zdir):
        for fn in os.listdir(os.path.join(zdir, wx)):
            wy = int(fn[:-4])
            png = open(os.path.join(zdir, wx, fn), "rb").read()
            img = codecs.png_decode(png)
            x0, y0 = int(wx) * ts, wy * ts
            h = min(ts, nrows - y0)
            w = min(ts, ncols - x0)
            if h > 0 and w > 0:
                lvl[y0:y0 + h, x0:x0 + w] = img[:h, :w]
    return lvl


def test_webtiles_level0_and_overviews(tmp_path, ray_session):
    res, out, manifest, ts = _run(tmp_path)
    grid = res.grid
    truth = mosaic_array(res.tiles_ds, grid)
    zmax = max_web_level(grid, ts)
    assert manifest["z"].max() == zmax
    # every manifest row exists on disk with the recorded size
    import os
    for _, row in manifest.iterrows():
        assert os.path.getsize(row["path"]) == row["nbytes"]
    # level 0 reconstructs the mosaic exactly (padding zeros outside)
    lvl0 = _read_level(out, 0, ts, grid.nrows, grid.ncols, truth.dtype)
    assert (lvl0 == truth).all()
    # every level equals the strided-overview oracle
    for z in range(1, zmax + 1):
        s = 1 << z
        ov = oracle.overview(truth, s)
        got = _read_level(out, z, ts, ov.shape[0], ov.shape[1], truth.dtype)
        assert (got == ov).all(), f"level {z}"
    # top level is a single tile
    top = manifest[manifest["z"] == zmax]
    assert len(top) == 1


def test_webtiles_float_needs_scale(tmp_path, ray_session):
    layout = Layout("grid3x3", 9, 64)
    res = do_mosaic(images_path(layout),
                    MosaicConfig(layout=layout, blocksize=64,
                                 do_pyramids=False, do_stats=False))
    grid = res.grid
    # fake a float grid: the guard must fire before any execution
    import dataclasses
    fgrid = dataclasses.replace(grid, dtype="float32")
    import pytest
    with pytest.raises(ValueError, match="scale"):
        export_web_tiles(res.tiles_ds, fgrid, str(tmp_path / "x"))
