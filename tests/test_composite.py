"""merge="mean" / merge="median" per-pixel stack composites (the temporal
cloud-free composite: reduce the stack of overlapping scenes per pixel) vs
the independent nested-loop oracles (moaray/oracle.py:build_mosaic_mean /
build_mosaic_median). Reference overlap semantics are last-non-null
(ref mosaic.py:663-689); mean/median are extended modes, so parity is
against our own oracle, plus explicit differs-from-last witnesses and the
salted-dispatch contracts (mean = two-level sum/count partials; median
stays single-level by design)."""

import numpy as np

from moaray import MosaicConfig, do_mosaic, oracle
from moaray.geo import make_output_grid
from moaray.pipelines.mosaic import mosaic_array
from moaray.testgen import (
    Layout,
    band_pixel_array,
    images_path,
    metas_for_layout,
    pixel_array,
)


def _fixture(layout):
    metas = metas_for_layout(layout, ("raw16",))
    grid = make_output_grid(metas, blocksize=64)
    arrays = {m.image_id: pixel_array(i, layout) for i, m in enumerate(metas)}
    return grid, metas, arrays


def run_engine(layout, merge, **cfg_kw):
    path = images_path(layout, ("raw16",))
    cfg = MosaicConfig(layout=layout, blocksize=64, merge=merge, **cfg_kw)
    res = do_mosaic(path, cfg)
    return res, mosaic_array(res.tiles_ds, res.grid)


def test_pair_overlap_median_exact(ray_session):
    layout = Layout("pair_overlap", 2, 64)
    grid, metas, arrays = _fixture(layout)
    truth = oracle.build_mosaic_median(grid, metas, arrays)
    last = oracle.build_mosaic(grid, metas, arrays)
    assert (truth != last).any(), "fixture must discriminate the kernels"
    _res, got = run_engine(layout, "median")
    assert (got == truth).all()


def test_pair_overlap_mean_exact(ray_session):
    layout = Layout("pair_overlap", 2, 64)
    grid, metas, arrays = _fixture(layout)
    truth = oracle.build_mosaic_mean(grid, metas, arrays)
    _res, got = run_engine(layout, "mean")
    assert (got == truth).all()


def test_hotspot_median_exact_and_salt_stays_single_level(ray_session):
    """Deep coincident stack + ring; the salted config must be a no-op for
    median (no mergeable partials exist), producing identical pixels."""
    layout = Layout("hotspot", 16, 64)
    grid, metas, arrays = _fixture(layout)
    truth = oracle.build_mosaic_median(grid, metas, arrays)
    res, got = run_engine(layout, "median")
    assert (got == truth).all()
    _res2, salted = run_engine(layout, "median",
                               salt_threshold=4, inputs_per_salt=2)
    assert (salted == got).all()
    # stats flow through the composite canvases
    tmin, tmax, _m, _s, tcount = oracle.stats(truth, grid.nullval)
    assert res.stats["min"] == tmin and res.stats["max"] == tmax
    assert res.stats["count"] == tcount


def test_hotspot_mean_salted_two_level_exact(ray_session):
    """Force the salted two-level mean (feather machinery, unit weights):
    sum/count partials summed across salts must equal the single-level
    mean bit-for-bit (integer sums of uint16 values are exact in
    float64, so no reorder tolerance is needed)."""
    layout = Layout("hotspot", 16, 64)
    grid, metas, arrays = _fixture(layout)
    truth = oracle.build_mosaic_mean(grid, metas, arrays)
    _r1, plain = run_engine(layout, "mean", salt_threshold=None)
    _r2, salted = run_engine(layout, "mean",
                             salt_threshold=4, inputs_per_salt=2)
    assert (plain == truth).all()
    assert (salted == truth).all()


def test_float32_nan_median_parity(ray_session):
    """NaN-null float stack: median must preserve the coverage geography
    exactly (NaN only where no source pixel was valid)."""
    layout = Layout("grid3x3", 9, 96)
    nv = float("nan")
    path = images_path(layout, fmts=("z16",), explicit_meta=True,
                       dtype="float32", nullval=nv)
    metas = metas_for_layout(layout)
    for m in metas:
        m.dtype, m.nullval = "float32", nv
    arrays = {
        m.image_id: band_pixel_array(i, layout, 0, "float32", nv)
        for i, m in enumerate(metas)
    }
    grid = make_output_grid(metas, 64)
    truth = oracle.build_mosaic_median(grid, metas, arrays)
    res = do_mosaic(path, MosaicConfig(layout=layout, blocksize=64,
                                       merge="median"))
    got = mosaic_array(res.tiles_ds, res.grid)
    assert got.dtype == np.float32
    assert np.array_equal(np.isnan(got), np.isnan(truth))
    assert np.array_equal(got[~np.isnan(got)], truth[~np.isnan(truth)])


def test_pair_overlap_max_min_exact(ray_session):
    layout = Layout("pair_overlap", 2, 64)
    grid, metas, arrays = _fixture(layout)
    for kind in ("max", "min"):
        truth = oracle.build_mosaic_extreme(grid, metas, arrays, kind)
        _res, got = run_engine(layout, kind)
        assert (got == truth).all(), kind
    # max/min differ from each other in the overlap (per-image offsets)
    tmax = oracle.build_mosaic_extreme(grid, metas, arrays, "max")
    tmin = oracle.build_mosaic_extreme(grid, metas, arrays, "min")
    assert (tmax != tmin).any()


def test_hotspot_max_salted_two_level_exact(ray_session):
    """Per-pixel extremes ARE mergeable: the salted two-level path must be
    bit-identical to both the single-level run and the oracle."""
    layout = Layout("hotspot", 16, 64)
    grid, metas, arrays = _fixture(layout)
    truth = oracle.build_mosaic_extreme(grid, metas, arrays, "max")
    _res, salted = run_engine(layout, "max", salt_threshold=4)
    _res2, single = run_engine(layout, "max", salt_threshold=None)
    assert (salted == truth).all()
    assert (single == truth).all()
    _res3, smin = run_engine(layout, "min", salt_threshold=4)
    assert (smin == oracle.build_mosaic_extreme(grid, metas, arrays,
                                                "min")).all()
