"""merge="nearest" parity: per-pixel nearest-image-center overlap resolution
(the north star's "kNN for nearest-neighbor overlap resolution") vs the
independent nested-loop oracle (moaray/oracle.py:build_mosaic_nearest).
Reference merge semantics for overlap are last-non-null (ref mosaic.py:663-689);
nearest is the extended mode, so parity is against our own oracle, with a
tie-degeneracy check that identical footprints reduce to last-non-null.
"""

import numpy as np

from moaray import MosaicConfig, do_mosaic, oracle
from moaray.geo import make_output_grid
from moaray.pipelines.mosaic import mosaic_array
from moaray.testgen import Layout, images_path, metas_for_layout, pixel_array


def oracle_nearest(layout, blocksize=64):
    metas = metas_for_layout(layout, ("raw16",))
    grid = make_output_grid(metas, blocksize=blocksize)
    arrays = {
        m.image_id: pixel_array(i, layout) for i, m in enumerate(metas)
    }
    return grid, metas, arrays


def run_engine(layout, **cfg_kw):
    path = images_path(layout, ("raw16",))
    cfg = MosaicConfig(layout=layout, blocksize=64, merge="nearest", **cfg_kw)
    res = do_mosaic(path, cfg)
    return res, mosaic_array(res.tiles_ds, res.grid)


def test_pair_overlap_nearest_exact():
    layout = Layout("pair_overlap", 2, 64)
    grid, metas, arrays = oracle_nearest(layout)
    truth = oracle.build_mosaic_nearest(grid, metas, arrays)
    _res, got = run_engine(layout)
    assert (got == truth).all()


def test_hotspot_nearest_exact():
    """Stock layouts overlap symmetrically or coincidentally, so nearest
    ties everywhere and must equal last-non-null — a strong degeneracy
    check of the tie rule on a deep stack + ring."""
    layout = Layout("hotspot", 16, 64)
    grid, metas, arrays = oracle_nearest(layout)
    truth = oracle.build_mosaic_nearest(grid, metas, arrays)
    _res, got = run_engine(layout)
    assert (got == truth).all()
    last = oracle.build_mosaic(grid, metas, arrays)
    assert (got == last).all()


def test_asymmetric_overlap_nearest_differs_from_last(tmp_path):
    """A small late image embedded in a big early one: pixels near the big
    image's center must KEEP the big image (nearest) even though the small
    one is later in seq order (last would overwrite). Engine vs oracle,
    plus an explicit differs-from-last witness."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from moaray import codecs
    from moaray.geo import ImageMeta
    from moaray.testgen import ORIGIN_X, ORIGIN_Y, PIX

    big = np.tile(np.arange(64, dtype=np.uint16), (64, 1))
    big[:, 0] = 0
    small = np.full((32, 32), 500, dtype=np.uint16)
    small[:, 0] = 0
    # small image top-left at big pixel (16, 24): covers big's center
    gt_big = (ORIGIN_X, PIX, 0.0, ORIGIN_Y, 0.0, -PIX)
    gt_small = (ORIGIN_X + 24 * PIX, PIX, 0.0, ORIGIN_Y - 16 * PIX, 0.0, -PIX)
    metas = [
        ImageMeta("img00000000", 64, 64, gt_big),
        ImageMeta("img00000001", 32, 32, gt_small),
    ]
    grid = make_output_grid(metas, blocksize=64)
    arrays = {"img00000000": big, "img00000001": small}
    truth = oracle.build_mosaic_nearest(grid, metas, arrays)
    last = oracle.build_mosaic(grid, metas, arrays)
    assert (truth != last).any(), "fixture must discriminate the kernels"
    # big's center pixel (31,31) is inside small's footprint but nearest to
    # big's own center -> keeps the ramp value, not 500
    assert truth[31, 31] == 31 and last[31, 31] == 500

    tbl = pa.table({
        "image_id": pa.array(["img00000000", "img00000001"], pa.string()),
        "bytes": pa.array(
            [codecs.encode(big, "raw16"), codecs.encode(small, "raw16")],
            pa.binary(),
        ),
        "w": pa.array([64, 32], pa.int32()),
        "h": pa.array([64, 32], pa.int32()),
        "fmt": pa.array(["raw16", "raw16"], pa.string()),
        "caption": pa.array(["a", "b"], pa.string()),
        "phash": pa.array([0, 1], pa.int64()),
        "gt": pa.array([list(gt_big), list(gt_small)], pa.list_(pa.float64(), 6)),
        "crs": pa.array(["EPSG:32756"] * 2, pa.string()),
        "nullval": pa.array([0.0, 0.0], pa.float64()),
        "dtype": pa.array(["uint16"] * 2, pa.string()),
    })
    p = tmp_path / "imgs"
    p.mkdir()
    pq.write_table(tbl, str(p / "part-0.parquet"))
    res = do_mosaic(str(p), MosaicConfig(blocksize=64, merge="nearest"))
    got = mosaic_array(res.tiles_ds, res.grid)
    assert (got == truth).all()


def test_hotspot_salted_nearest_two_level_exact():
    """Force the salted (tile_id, salt) two-level nearest merge; the packed
    best-distance partials must reconstruct the global per-pixel argmin."""
    layout = Layout("hotspot", 16, 64)
    grid, metas, arrays = oracle_nearest(layout)
    truth = oracle.build_mosaic_nearest(grid, metas, arrays)
    res, got = run_engine(layout, salt_threshold=4, inputs_per_salt=2)
    assert (got == truth).all()
    # stats flow through the nearest canvases too
    tmin, tmax, tmean, _tstd, tcount = oracle.stats(truth, grid.nullval)
    assert res.stats["min"] == tmin and res.stats["max"] == tmax
    assert res.stats["count"] == tcount


def test_identical_footprints_degrade_to_last():
    """Exact center ties: every image covers the same extent, so all
    distances tie per-pixel and the <= rule must reproduce last-non-null."""
    layout = Layout("hotspot", 16, 64)  # hot stack: first 8 share the extent
    metas = metas_for_layout(layout, ("raw16",))
    # keep only the fully-coincident subset (same gt + dims)
    key = (metas[0].transform, metas[0].nrows, metas[0].ncols)
    co = [m for m in metas if (m.transform, m.nrows, m.ncols) == key]
    assert len(co) >= 2, "layout no longer has coincident images"
    grid = make_output_grid(co, blocksize=64)
    arrays = {
        m.image_id: pixel_array(i, layout)
        for i, m in enumerate(metas)
        if (m.transform, m.nrows, m.ncols) == key
    }
    near = oracle.build_mosaic_nearest(grid, co, arrays)
    last = oracle.build_mosaic(grid, co, arrays)
    assert (near == last).all()
