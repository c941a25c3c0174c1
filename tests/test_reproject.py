"""Reprojection parity: warp planning math + warp-on-read mosaic results.

The reference reprojects through per-input warp VRTs
(/root/reference/moamosaic/reproj.py:130-218); moaray warps on read inside
the decode stage over the affine CRS model (moaray/crs.py). These tests pin:

- snapValue / alignGrid floor-ceil semantics (reproj.py:237-261)
- identity warp == unwarped mosaic, bit-exact
- 2x scale warp == strided subsample of the unwarped truth (exact nearest-
  neighbour oracle by construction: grid origins divisible by 2*res)
- explicit out_xres/out_yres override
- heterogeneous-projection inputs fail without a warp (MoaProjectionError
  analog, reproj.py:72-127) and succeed with one
- bilinear on the ramp fixture interior == nearest of the ramp midpoint
"""

import numpy as np
import pytest

from moaray import MosaicConfig, do_mosaic
from moaray.crs import ProjectionError, transform_affine
from moaray.pipelines.mosaic import mosaic_array
from moaray.stages.reproject import (
    WarpSpec,
    align_grid,
    dst_to_src_pixel,
    snap_value,
    warp_window,
    warped_meta,
)
from moaray.testgen import Layout, images_path, meta_for, pixel_array

from test_mosaic_parity import oracle_mosaic, run_engine


def test_snap_value_floor_ceil():
    # reproj.py:252-261 semantics
    assert snap_value(305.0, 10.0, False) == 300.0
    assert snap_value(305.0, 10.0, True) == 310.0
    assert snap_value(300.0, 10.0, False) == 300.0
    assert snap_value(300.0, 10.0, True) == 300.0
    assert snap_value(-305.0, 10.0, False) == -310.0
    assert snap_value(-305.0, 10.0, True) == -300.0
    assert align_grid(301.0, 649.0, -12.0, 95.0, 10.0, 10.0) == (
        300.0, 650.0, -20.0, 100.0
    )


def test_identity_warp_bit_exact():
    """Warping to a different CRS *name* with the identity affine must
    reproduce the unwarped mosaic exactly."""
    layout = Layout("grid3x3", 9, 64)
    _grid, truth = oracle_mosaic(layout)
    res, got = run_engine(layout, out_crs="AFFINE:0,1,0,0,0,1")
    assert res.grid.crs == "AFFINE:0,1,0,0,0,1"
    assert got.shape == truth.shape
    assert (got == truth).all()


def test_scale2_warp_strided_oracle():
    """dst CRS = world/2 with the default (source) resolution: each output
    pixel's center inverse-maps to source pixel (2r+1, 2c+1) exactly, so the
    warped mosaic equals truth[1::2, 1::2]."""
    layout = Layout("grid3x3", 9, 64)
    _grid, truth = oracle_mosaic(layout)
    res, got = run_engine(layout, out_crs="AFFINE:0,2,0,0,0,2")
    expect = truth[1::2, 1::2]
    assert got.shape == expect.shape
    assert (got == expect).all()


def test_warped_meta_and_res_override():
    layout = Layout("grid3x3", 9, 64)
    m = meta_for(0, layout)
    wm = warped_meta(m, WarpSpec("AFFINE:0,2,0,0,0,2", xres=10.0, yres=10.0))
    # source extent 640 world units -> 320 in dst CRS -> 32 pixels at res 10
    assert (wm.ncols, wm.nrows) == (32, 32)
    wm5 = warped_meta(m, WarpSpec("AFFINE:0,2,0,0,0,2", xres=5.0, yres=5.0))
    assert (wm5.ncols, wm5.nrows) == (64, 64)
    # default res = source res (reproj.py:183-192)
    wmd = warped_meta(m, WarpSpec("AFFINE:0,2,0,0,0,2"))
    assert (wmd.ncols, wmd.nrows) == (32, 32)


def test_res_override_upsamples():
    """out_xres/out_yres at half the native pixel size doubles output dims;
    nearest-neighbour duplicates source pixels 2x2."""
    layout = Layout("grid3x3", 1, 64)
    res, got = run_engine(
        layout, out_crs="AFFINE:0,1,0,0,0,1", out_xres=5.0, out_yres=5.0
    )
    src = pixel_array(0, layout)
    assert got.shape == (128, 128)
    assert (got == np.repeat(np.repeat(src, 2, axis=0), 2, axis=1)).all()


def test_warp_window_bilinear_interior():
    """Bilinear on the column-ramp at an offset sampling position blends the
    two neighbouring columns."""
    layout = Layout("grid3x3", 1, 64)
    m = meta_for(0, layout)
    src = pixel_array(0, layout)
    # shift dst grid by half a pixel in x: dst px c samples src x = c + 1.0
    spec = WarpSpec("AFFINE:0,1,0,0,0,1", resample="bilinear")
    wm = warped_meta(m, spec)
    px_map = dst_to_src_pixel(m, wm)
    shifted = (px_map[0] + 0.5, *px_map[1:])
    out = warp_window(src, shifted, 10, 10, 4, 4, np.uint16(0), "bilinear")
    # src cols 10..13 have values 10..13 (ramp); sampling at col+0.5 centers
    # blends cols c and c+1 -> value c + 0.5 -> rint -> even-round
    expect_cols = np.rint(np.arange(10, 14) + 0.5)
    assert (out == np.tile(expect_cols, (4, 1)).astype(np.uint16)).all()


def test_mixed_projection_requires_warp(tmp_path):
    """Two inputs in different CRSs: plain mosaic raises the projection
    error (reproj.py:72-127); with out_crs set it succeeds."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from moaray import codecs
    from moaray.testgen import (
        caption_for,
        gen_images_table,
        make_image_id,
        phash_for,
    )

    # Build a 2-image table where image 1 claims a scaled CRS via the
    # mixed-crs layout below.
    layout = Layout("mixed_crs", 2, 64)
    tbl = gen_images_table(layout, ("raw16",))
    p = tmp_path / "imgs"
    p.mkdir()
    pq.write_table(tbl, str(p / "part-0.parquet"))

    with pytest.raises(ProjectionError):
        do_mosaic(str(p), MosaicConfig(layout=layout, blocksize=64))

    res = do_mosaic(
        str(p),
        MosaicConfig(
            layout=layout, blocksize=64, out_crs="AFFINE:0,1,0,0,0,1"
        ),
    )
    arr = mosaic_array(res.tiles_ds, res.grid)
    # image 0 occupies the left 64 cols; image 1 (scaled CRS, world extent
    # 2x) occupies cols >= its warped offset — just assert both contributed
    assert (arr[:, :64] != 0).any() and (arr[:, 80:] != 0).any()


def test_transform_affine_roundtrip():
    t = transform_affine("EPSG:32756", "AFFINE:100,2,0,-50,0,4")
    inv = transform_affine("AFFINE:100,2,0,-50,0,4", "EPSG:32756")
    x, y = 12345.0, -678.0
    tx = t[0] + t[1] * x + t[2] * y
    ty = t[3] + t[4] * x + t[5] * y
    rx = inv[0] + inv[1] * tx + inv[2] * ty
    ry = inv[3] + inv[4] * tx + inv[5] * ty
    assert rx == pytest.approx(x) and ry == pytest.approx(y)


def test_rotation_warp_exact_rot90():
    """A 90-degree rotation CRS ("AFFINE:0,0,1,0,-1,0") warps the mosaic to
    exactly numpy.rot90 of the source — pixel centers align, nearest
    sampling is an exact permutation."""
    from moaray import do_mosaic as dm

    layout = Layout("grid3x3", 1, 64)
    res, got = run_engine(
        layout, out_crs="AFFINE:0,0,1,0,-1,0", do_pyramids=False
    )
    src = pixel_array(0, layout)
    assert (got == np.rot90(src, 1)).all()


def test_crs_error_paths():
    import pytest as _pytest

    from moaray.crs import ProjectionError, invert, to_world

    with _pytest.raises(ProjectionError):
        to_world("AFFINE:1,2,3")  # wrong arity
    with _pytest.raises(ProjectionError):
        invert((0.0, 0.0, 0.0, 0.0, 0.0, 0.0))  # singular
    assert to_world("EPSG:32756") == (0.0, 1.0, 0.0, 0.0, 0.0, 1.0)


# ---------------------------------------------------------------------------
# cubic + average resample kernels (round 2; ref reproj.py:207 resample set)
# ---------------------------------------------------------------------------

def _ident():
    return (0.0, 1.0, 0.0, 0.0, 0.0, 1.0)


def test_cubic_identity_reproduces_source():
    # cubic convolution interpolates exactly at sample points: an identity
    # warp must return the source bit-for-bit on the interior
    from moaray.stages.reproject import warp_window

    rng = np.random.RandomState(5)
    src = (rng.rand(16, 16) * 1000 + 1).astype(np.uint16)
    out = warp_window(src, _ident(), 0, 0, 16, 16, np.uint16(0), "cubic")
    assert np.array_equal(out[2:14, 2:14], src[2:14, 2:14])


def test_cubic_linear_precision():
    # Keys a=-0.5 kernel reproduces linear functions exactly: upsampling a
    # ramp must yield the ramp evaluated at the sample positions
    from moaray.stages.reproject import warp_window

    rr, cc = np.mgrid[0:32, 0:32]
    src = (2.0 * cc + 3.0 * rr + 5.0).astype(np.float64)
    # scale-0.5 map: dst has twice the resolution
    px_map = (0.0, 0.5, 0.0, 0.0, 0.0, 0.5)
    out = warp_window(src, px_map, 4, 4, 40, 40, float("nan"), "cubic")
    rows = np.arange(4, 44, dtype=np.float64) + 0.5
    cols = np.arange(4, 44, dtype=np.float64) + 0.5
    sx = 0.5 * cols[None, :] - 0.5
    sy = 0.5 * rows[:, None] - 0.5
    expected = 2.0 * sx + 3.0 * sy + 5.0
    inner = np.s_[4:36, 4:36]
    assert np.allclose(out[inner], expected[inner], atol=1e-9)


def test_average_downsample_equals_block_mean():
    from moaray.stages.reproject import warp_window

    rng = np.random.RandomState(9)
    src = (rng.rand(20, 24) * 1000 + 1).astype(np.float64)
    px_map = (0.0, 2.0, 0.0, 0.0, 0.0, 2.0)  # dst pixel covers 2x2 src
    out = warp_window(src, px_map, 0, 0, 10, 12, float("nan"), "average")
    expected = src.reshape(10, 2, 12, 2).mean(axis=(1, 3))
    assert np.allclose(out, expected)


def test_average_excludes_nulls():
    from moaray.stages.reproject import warp_window

    src = np.full((4, 4), 0, dtype=np.uint16)
    src[0, 0] = 10
    src[0, 1] = 20
    # 2x2 block (0,0): values 10,20,null,null -> mean 15
    px_map = (0.0, 2.0, 0.0, 0.0, 0.0, 2.0)
    out = warp_window(src, px_map, 0, 0, 2, 2, np.uint16(0), "average")
    assert out[0, 0] == 15
    assert out[1, 1] == 0  # all-null block stays null


# ---------------------------------------------------------------------------
# round-3 completion of the GDAL resampleAlg set (ref reproj.py:211-216
# passes any method string through to gdal.Warp): cubicspline, lanczos,
# and the footprint stats rms/mode/min/max/med/q1/q3/sum
# ---------------------------------------------------------------------------

def test_lanczos_identity_reproduces_source():
    # lanczos (sinc-windowed sinc) interpolates exactly at sample points
    from moaray.stages.reproject import warp_window

    rng = np.random.RandomState(5)
    src = (rng.rand(16, 16) * 1000 + 1).astype(np.uint16)
    out = warp_window(src, _ident(), 0, 0, 16, 16, np.uint16(0), "lanczos")
    assert np.array_equal(out[3:13, 3:13], src[3:13, 3:13])


def test_cubicspline_linear_precision():
    # cubic B-spline is smoothing, not interpolating, but reproduces
    # linear fields exactly (partition of unity + first-moment symmetry)
    from moaray.stages.reproject import warp_window

    rr, cc = np.mgrid[0:32, 0:32]
    src = (2.0 * cc + 3.0 * rr + 5.0).astype(np.float64)
    px_map = (0.0, 0.5, 0.0, 0.0, 0.0, 0.5)
    out = warp_window(src, px_map, 4, 4, 40, 40, float("nan"), "cubicspline")
    rows = np.arange(4, 44, dtype=np.float64) + 0.5
    cols = np.arange(4, 44, dtype=np.float64) + 0.5
    sx = 0.5 * cols[None, :] - 0.5
    sy = 0.5 * rows[:, None] - 0.5
    expected = 2.0 * sx + 3.0 * sy + 5.0
    inner = np.s_[4:36, 4:36]
    assert np.allclose(out[inner], expected[inner], atol=1e-9)


def test_footprint_stats_match_block_oracles():
    # 2x2-block downsample: every footprint stat vs its numpy oracle
    from moaray.stages.reproject import warp_window

    rng = np.random.RandomState(11)
    src = (rng.rand(20, 24) * 1000 + 1).astype(np.float64)
    px_map = (0.0, 2.0, 0.0, 0.0, 0.0, 2.0)
    blocks = src.reshape(10, 2, 12, 2).transpose(0, 2, 1, 3).reshape(10, 12, 4)
    oracles = {
        "min": blocks.min(axis=2),
        "max": blocks.max(axis=2),
        "sum": blocks.sum(axis=2),
        "rms": np.sqrt((blocks ** 2).mean(axis=2)),
        "med": np.median(blocks, axis=2),
        "q1": np.quantile(blocks, 0.25, axis=2),
        "q3": np.quantile(blocks, 0.75, axis=2),
    }
    for stat, expected in oracles.items():
        out = warp_window(src, px_map, 0, 0, 10, 12, float("nan"), stat)
        assert np.allclose(out, expected), stat


def test_footprint_stats_exclude_nulls():
    from moaray.stages.reproject import warp_window

    src = np.zeros((4, 4), dtype=np.uint16)
    src[0, 0] = 10
    src[0, 1] = 20
    px_map = (0.0, 2.0, 0.0, 0.0, 0.0, 2.0)
    for stat, want in [("min", 10), ("max", 20), ("sum", 30), ("med", 15)]:
        out = warp_window(src, px_map, 0, 0, 2, 2, np.uint16(0), stat)
        assert out[0, 0] == want, stat
        assert out[1, 1] == 0, stat  # all-null block stays null


def test_mode_majority_and_tie_break():
    from moaray.stages.reproject import warp_window

    # blocks: {4,4,7,9} -> 4 (majority); {3,3,5,5} -> 3 (tie -> smallest)
    src = np.array([[4, 4], [7, 9], [3, 3], [5, 5]], dtype=np.uint16)
    px_map = (0.0, 2.0, 0.0, 0.0, 0.0, 2.0)
    out = warp_window(src, px_map, 0, 0, 2, 1, np.uint16(0), "mode")
    assert out[0, 0] == 4
    assert out[1, 0] == 3


@pytest.mark.parametrize("method", ["cubic", "average", "cubicspline", "mode"])
def test_mosaic_warp_methods_end_to_end(ray_session, method):
    # scale-2 affine CRS warp through the full pipeline: output must cover
    # the same extent as nearest and carry plausible ramp statistics
    from moaray.pipelines.mosaic import MosaicConfig, do_mosaic, mosaic_array
    from moaray.testgen import Layout, images_path

    layout = Layout("grid3x3", 9, 96)
    path = images_path(layout)
    cfg = MosaicConfig(
        layout=layout, blocksize=64, out_crs="AFFINE:0,2,0,0,0,2",
        out_xres=5.0, out_yres=5.0, resample=method,
        do_pyramids=False, do_stats=True,
    )
    res = do_mosaic(path, cfg)
    arr = mosaic_array(res.tiles_ds, res.grid)
    base_cfg = MosaicConfig(
        layout=layout, blocksize=64, out_crs="AFFINE:0,2,0,0,0,2",
        out_xres=5.0, out_yres=5.0, resample="near",
        do_pyramids=False, do_stats=True,
    )
    base = do_mosaic(path, base_cfg)
    assert arr.shape == mosaic_array(base.tiles_ds, base.grid).shape
    # ramp range preserved (interpolation never extrapolates past the ramp)
    assert res.stats["min"] >= 1 and res.stats["max"] <= 95
    assert abs(res.stats["mean"] - base.stats["mean"]) < 2.0


# ---------------------------------------------------------------------------
# Transverse Mercator (moaray/tmerc.py): property pins + UTM warp end-to-end
# ---------------------------------------------------------------------------

def test_tm_roundtrip_zone_wide():
    from moaray.tmerc import tm_forward, tm_inverse

    lat = np.linspace(-80, 80, 33)
    lon = np.linspace(148, 158, 11)
    LA, LO = np.meshgrid(lat, lon)
    E, N = tm_forward(LA, LO, 153.0, false_n=1e7)
    la2, lo2 = tm_inverse(E, N, 153.0, false_n=1e7)
    assert np.abs(la2 - LA).max() < 1e-9
    assert np.abs(lo2 - LO).max() < 1e-9


def test_tm_absolute_anchors():
    """Anchors derivable from the public definition of UTM/WGS84: the
    central-meridian equator point, the quarter-meridian arc length
    (10001965.7293 m), central-meridian scale 0.9996, and E/W symmetry."""
    from moaray.tmerc import tm_forward

    E, N = tm_forward(np.array([0.0]), np.array([153.0]), 153.0)
    assert abs(E[0] - 500000.0) < 1e-6 and abs(N[0]) < 1e-6
    _E90, N90 = tm_forward(np.array([90.0]), np.array([153.0]), 153.0)
    assert abs(N90[0] / 0.9996 - 10001965.7293) < 0.01
    # scale on the central meridian == k0 (numeric derivative vs the
    # meridional radius of curvature)
    d = 1e-7
    _x, N1 = tm_forward(np.array([-33.0]), np.array([153.0]), 153.0)
    _x, N2 = tm_forward(np.array([-33.0 + d]), np.array([153.0]), 153.0)
    e2 = 0.0066943799901413165
    M = 6378137.0 * (1 - e2) / (1 - e2 * np.sin(np.deg2rad(-33.0)) ** 2) ** 1.5
    k = (N2[0] - N1[0]) / np.deg2rad(d) / M
    assert abs(k - 0.9996) < 1e-6
    Ea, Na = tm_forward(np.array([-30.0]), np.array([151.0]), 153.0)
    Eb, Nb = tm_forward(np.array([-30.0]), np.array([155.0]), 153.0)
    assert abs((Ea[0] - 500000.0) + (Eb[0] - 500000.0)) < 1e-6
    assert abs(Na[0] - Nb[0]) < 1e-6


def test_tm_pole_is_finite_and_warning_free():
    """|lat| -> 90 deg: arctanh(sin phi) diverges at the exact pole but the
    inf propagates to the exact answer (xi_p = pi/2, eta_p = 0); the
    forward transform must return finite values, emit NO runtime warning,
    and stay monotone in latitude right up to the pole."""
    import warnings

    from moaray.tmerc import tm_forward

    lats = np.array([89.0, 89.9, 89.999, 89.999999, 90.0 - 1e-12, 90.0])
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        E, N = tm_forward(lats, np.full_like(lats, 154.0), 153.0)
        _Es, Ns = tm_forward(-lats, np.full_like(lats, 154.0), 153.0)
    assert np.isfinite(E).all() and np.isfinite(N).all()
    assert (np.diff(N) >= 0).all()          # monotone approach
    assert np.allclose(Ns, -N)              # hemisphere symmetry
    # pole: on the central meridian regardless of longitude, arc exact
    Ep, Np = tm_forward(np.array([90.0]), np.array([11.0]), 153.0)
    assert abs(Ep[0] - 500000.0) < 1e-6
    assert abs(Np[0] / 0.9996 - 10001965.7293) < 0.01


def test_tm_utm_zone_parsing_and_transformer():
    from moaray.crs import point_transformer
    from moaray.tmerc import parse_utm

    assert parse_utm("EPSG:32756") == (153.0, 10000000.0)
    assert parse_utm("EPSG:32631") == (3.0, 0.0)
    assert parse_utm("EPSG:4326") is None
    assert parse_utm("EPSG:99999") is None
    assert point_transformer("EPSG:32756", "EPSG:32756") is None
    assert point_transformer("AFFINE:0,2,0,0,0,2", "EPSG:32756") is None
    fn = point_transformer("EPSG:4326", "EPSG:32756")
    x, y = fn(np.array([153.0]), np.array([0.0]))
    assert abs(x[0] - 500000.0) < 1e-6 and abs(y[0] - 1e7) < 1e-6
    # zone-to-zone chains inverse+forward
    chain = point_transformer("EPSG:32756", "EPSG:32755")
    x2, y2 = chain(np.array([500000.0]), np.array([1e7]))
    fn55 = point_transformer("EPSG:4326", "EPSG:32755")
    ex, ey = fn55(np.array([153.0]), np.array([0.0]))
    assert abs(x2[0] - ex[0]) < 1e-6 and abs(y2[0] - ey[0]) < 1e-6


def test_mosaic_latlon_to_utm_nearest(ray_session, tmp_path):
    """End-to-end curvilinear warp: an EPSG:4326 catalog mosaicked onto a
    UTM 56S grid; every output pixel must equal the source pixel its
    UTM-center inverse-projects into (nearest), nulls outside."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from moaray import MosaicConfig, codecs, do_mosaic
    from moaray.pipelines.mosaic import mosaic_array
    from moaray.tmerc import tm_inverse

    size = 64
    ramp = np.tile(np.arange(size, dtype=np.uint16), (size, 1))
    ramp[:, 0] = 0  # null column, as in the standard fixtures
    gt = (152.90, 0.001, 0.0, -29.90, 0.0, -0.001)  # ~100m pixels
    tbl = pa.table(
        {
            "image_id": pa.array(["ll0000"], pa.string()),
            "bytes": pa.array([codecs.encode(ramp, "z16")], pa.binary()),
            "w": pa.array([size], pa.int32()),
            "h": pa.array([size], pa.int32()),
            "fmt": pa.array(["z16"], pa.string()),
            "gt": pa.array([list(gt)], pa.list_(pa.float64(), 6)),
            "crs": pa.array(["EPSG:4326"], pa.string()),
            "nullval": pa.array([0.0], pa.float64()),
            "seq": pa.array([0], pa.int64()),
        }
    )
    path = str(tmp_path / "ll")
    os.makedirs(path)
    pq.write_table(tbl, os.path.join(path, "p.parquet"))

    cfg = MosaicConfig(
        blocksize=32, out_crs="EPSG:32756", out_xres=100.0, out_yres=100.0,
        resample="near", do_pyramids=False, do_stats=False,
    )
    res = do_mosaic(path, cfg)
    assert res.grid.crs == "EPSG:32756"
    got = mosaic_array(res.tiles_ds, res.grid)

    # independent per-pixel oracle: output UTM center -> lat/lon -> src px
    t = res.grid.transform
    rows = np.arange(res.grid.nrows, dtype=np.float64) + 0.5
    cols = np.arange(res.grid.ncols, dtype=np.float64) + 0.5
    cg, rg = np.meshgrid(cols, rows)
    ux = t[0] + t[1] * cg
    uy = t[3] + t[5] * rg
    lat, lon = tm_inverse(ux, uy, 153.0, false_n=1e7)
    sc = np.floor((lon - gt[0]) / gt[1]).astype(np.int64)
    sr = np.floor((lat - gt[3]) / gt[5]).astype(np.int64)
    truth = np.zeros_like(got)
    valid = (sr >= 0) & (sr < size) & (sc >= 0) & (sc < size)
    truth[valid] = ramp[sr[valid], sc[valid]]
    assert got.shape == truth.shape
    assert (got == truth).all()
    # the warp actually bent the grid: output must contain real data
    assert (got != 0).sum() > 1000


def test_mosaic_latlon_to_utm_requires_res(tmp_path):
    from moaray.crs import ProjectionError
    from moaray.geo import ImageMeta
    from moaray.stages.reproject import WarpSpec, warped_meta

    m = ImageMeta("x", 64, 64, (152.9, 0.001, 0.0, -29.9, 0.0, -0.001),
                  crs="EPSG:4326")
    with pytest.raises(ProjectionError, match="units"):
        warped_meta(m, WarpSpec("EPSG:32756"))


def test_mosaic_latlon_to_utm_bilinear(ray_session, tmp_path):
    """Curvilinear warp with the bilinear kernel: the nonlinear px mapper
    feeds every resample kernel, not just nearest."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from moaray import MosaicConfig, codecs, do_mosaic
    from moaray.pipelines.mosaic import mosaic_array

    size = 64
    ramp = np.tile(np.arange(size, dtype=np.uint16) * 100, (size, 1))
    ramp[:, 0] = 0
    gt = (152.90, 0.001, 0.0, -29.90, 0.0, -0.001)
    tbl = pa.table(
        {
            "image_id": pa.array(["ll0000"], pa.string()),
            "bytes": pa.array([codecs.encode(ramp, "z16")], pa.binary()),
            "w": pa.array([size], pa.int32()),
            "h": pa.array([size], pa.int32()),
            "fmt": pa.array(["z16"], pa.string()),
            "gt": pa.array([list(gt)], pa.list_(pa.float64(), 6)),
            "crs": pa.array(["EPSG:4326"], pa.string()),
            "nullval": pa.array([0.0], pa.float64()),
            "seq": pa.array([0], pa.int64()),
        }
    )
    path = str(tmp_path / "ll")
    os.makedirs(path)
    pq.write_table(tbl, os.path.join(path, "p.parquet"))
    got = {}
    for resample in ("near", "bilinear"):
        res = do_mosaic(
            path,
            MosaicConfig(
                blocksize=32, out_crs="EPSG:32756", out_xres=100.0,
                out_yres=100.0, resample=resample, do_pyramids=False,
                do_stats=False,
            ),
        )
        got[resample] = mosaic_array(res.tiles_ds, res.grid)
    near, bil = got["near"], got["bilinear"]
    assert near.shape == bil.shape
    # bilinear smooths but stays within the source value range and close
    # to nearest (the ramp's neighbor delta is 100)
    nz = (near != 0) & (bil != 0)
    assert nz.sum() > 1000
    diff = np.abs(near[nz].astype(np.int64) - bil[nz].astype(np.int64))
    assert diff.max() <= 200 and (diff > 0).any()


# ---------------------------------------------------------------------------
# Lambert Conformal Conic (moaray/lcc.py)


def test_lcc_definitional_anchors():
    """Anchors derivable from the public LCC-2SP definition (Snyder PP1395
    15-1..15-10): the false origin maps to (FE, FN), the scale factor is
    exactly 1 on BOTH standard parallels, E/W symmetry about the central
    meridian holds, and forward/inverse round-trip to ~1e-13 deg. Plus the
    well-known Lambert-93 coordinates of central Paris."""
    from moaray.lcc import _A, _E as _ecc, lcc_forward, lcc_inverse, parse_lcc

    p = parse_lcc("EPSG:2154")  # RGF93 / Lambert-93
    E, N = lcc_forward(np.array([46.5]), np.array([3.0]), p)
    assert abs(E[0] - 700000.0) < 1e-6 and abs(N[0] - 6600000.0) < 1e-6
    # k == 1 on the standard parallels (numeric derivative vs meridional
    # radius of curvature, same construction as the TM anchor test)
    d = 1e-7
    for latsp in (49.0, 44.0):
        _e1, n1 = lcc_forward(np.array([latsp]), np.array([3.0]), p)
        _e2, n2 = lcc_forward(np.array([latsp + d]), np.array([3.0]), p)
        e2 = _ecc ** 2
        M = _A * (1 - e2) / (1 - e2 * np.sin(np.deg2rad(latsp)) ** 2) ** 1.5
        k = abs(n2[0] - n1[0]) / np.deg2rad(d) / M
        assert abs(k - 1.0) < 1e-6, latsp
    # E/W symmetry
    Ea, Na = lcc_forward(np.array([45.0]), np.array([1.0]), p)
    Eb, Nb = lcc_forward(np.array([45.0]), np.array([5.0]), p)
    assert abs((Ea[0] - 700000.0) + (Eb[0] - 700000.0)) < 1e-6
    assert abs(Na[0] - Nb[0]) < 1e-6
    # well-known Lambert-93 value: central Paris (48.8566N, 2.3522E)
    E, N = lcc_forward(np.array([48.8566]), np.array([2.3522]), p)
    assert abs(E[0] - 652469.0) < 5.0 and abs(N[0] - 6862035.0) < 5.0
    # grid round trip
    la = np.linspace(41, 51, 25)
    lo = np.linspace(-5, 10, 25)
    LA, LO = np.meshgrid(la, lo)
    E, N = lcc_forward(LA, LO, p)
    la2, lo2 = lcc_inverse(E, N, p)
    assert np.abs(la2 - LA).max() < 1e-11
    assert np.abs(lo2 - LO).max() < 1e-11


def test_lcc_parametric_and_routing():
    from moaray.crs import point_transformer
    from moaray.lcc import parse_lcc

    import pytest as _pytest

    # parametric form with and without false origin
    p = parse_lcc("LCC:49,77,49,-95")
    assert (p.lat1, p.lat2, p.lat0, p.lon0, p.fe, p.fn) == (
        49.0, 77.0, 49.0, -95.0, 0.0, 0.0)
    assert parse_lcc("LCC:49,44,46.5,3,700000,6600000").fe == 700000.0
    with _pytest.raises(ValueError, match="LCC"):
        parse_lcc("LCC:1,2,3")
    assert parse_lcc("EPSG:32756") is None  # UTM is not LCC
    # routing: 4326 <-> LCC, LCC <-> UTM chain through the geographic pivot
    # exact on the native datum (ETRS89 geographic -> Lambert-93, GRS80)
    fn = point_transformer("EPSG:4258", "EPSG:2154")
    x, y = fn(np.array([3.0]), np.array([46.5]))
    assert abs(x[0] - 700000.0) < 1e-6 and abs(y[0] - 6600000.0) < 1e-6
    # from WGS84 the ellipsoid change (WGS84 -> GRS80 through geocentric)
    # moves the origin ~0.1 mm — correct geodesy, not a regression
    fn = point_transformer("EPSG:4326", "EPSG:2154")
    x, y = fn(np.array([3.0]), np.array([46.5]))
    assert abs(x[0] - 700000.0) < 1e-3 and abs(y[0] - 6600000.0) < 1e-3
    back = point_transformer("EPSG:2154", "EPSG:4326")
    lo, la = back(x, y)
    assert abs(lo[0] - 3.0) < 1e-11 and abs(la[0] - 46.5) < 1e-11
    chain = point_transformer("EPSG:2154", "EPSG:32631")
    from moaray.tmerc import tm_forward

    ex, ey = chain(x, y)
    te, tn = tm_forward(np.array([46.5]), np.array([3.0]), 3.0)
    assert abs(ex[0] - te[0]) < 1e-6 and abs(ey[0] - tn[0]) < 1e-6
    # same CRS or affine pairs stay on the exact affine fast path
    assert point_transformer("EPSG:2154", "EPSG:2154") is None
    assert point_transformer("AFFINE:0,2,0,0,0,2", "EPSG:2154") is None


def test_mosaic_latlon_to_lcc_nearest(ray_session, tmp_path):
    """End-to-end conic warp: an EPSG:4326 catalog mosaicked onto a
    Lambert-93 grid; every output pixel must equal the source pixel its
    LCC-center inverse-projects into (nearest), nulls outside — the same
    independent per-pixel oracle as the UTM test."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from moaray import MosaicConfig, codecs, do_mosaic
    from moaray.lcc import lcc_inverse, parse_lcc
    from moaray.pipelines.mosaic import mosaic_array

    size = 64
    ramp = np.tile(np.arange(size, dtype=np.uint16), (size, 1))
    ramp[:, 0] = 0
    gt = (2.30, 0.001, 0.0, 48.90, 0.0, -0.001)  # ~70-110m pixels near Paris
    tbl = pa.table(
        {
            "image_id": pa.array(["ll0000"], pa.string()),
            "bytes": pa.array([codecs.encode(ramp, "z16")], pa.binary()),
            "w": pa.array([size], pa.int32()),
            "h": pa.array([size], pa.int32()),
            "fmt": pa.array(["z16"], pa.string()),
            "gt": pa.array([list(gt)], pa.list_(pa.float64(), 6)),
            "crs": pa.array(["EPSG:4326"], pa.string()),
            "nullval": pa.array([0.0], pa.float64()),
            "seq": pa.array([0], pa.int64()),
        }
    )
    path = str(tmp_path / "ll_lcc")
    os.makedirs(path)
    pq.write_table(tbl, os.path.join(path, "p.parquet"))

    cfg = MosaicConfig(
        blocksize=32, out_crs="EPSG:2154", out_xres=100.0, out_yres=100.0,
        resample="near", do_pyramids=False, do_stats=False,
    )
    res = do_mosaic(path, cfg)
    assert res.grid.crs == "EPSG:2154"
    got = mosaic_array(res.tiles_ds, res.grid)

    # independent per-pixel oracle: output LCC center -> lat/lon -> src px
    t = res.grid.transform
    rows = np.arange(res.grid.nrows, dtype=np.float64) + 0.5
    cols = np.arange(res.grid.ncols, dtype=np.float64) + 0.5
    cg, rg = np.meshgrid(cols, rows)
    px = t[0] + t[1] * cg
    py = t[3] + t[5] * rg
    lat, lon = lcc_inverse(px, py, parse_lcc("EPSG:2154"))
    sc = np.floor((lon - gt[0]) / gt[1]).astype(np.int64)
    sr = np.floor((lat - gt[3]) / gt[5]).astype(np.int64)
    truth = np.zeros_like(got)
    valid = (sr >= 0) & (sr < size) & (sc >= 0) & (sc < size)
    truth[valid] = ramp[sr[valid], sc[valid]]
    assert got.shape == truth.shape
    assert (got == truth).all()
    assert (got != 0).sum() > 1000  # the warp bent real data in


# ---------------------------------------------------------------------------
# Polar Stereographic (moaray/pstereo.py)


def test_polar_stereographic_anchors():
    """Definitional + published anchors: both poles map exactly to the
    false origin; the scale factor is 1 on the standard parallel (3413 at
    70N, 3031 at 71S); a 90-degree longitude shift rotates the point 90
    degrees about the origin; round trips hit 1e-13; and the EPSG
    Guidance Note 7-2 Variant-A test point (73N 44E on the UPS-North
    grid) lands on the published coordinates to the centimetre."""
    from moaray.lcc import _A, _E as _ecc
    from moaray.pstereo import parse_pstereo, ps_forward, ps_inverse

    for crs, pole in (("EPSG:32661", 90.0), ("EPSG:32761", -90.0),
                      ("EPSG:3413", 90.0), ("EPSG:3031", -90.0)):
        p = parse_pstereo(crs)
        E, N = ps_forward(np.array([pole]), np.array([33.0]), p)
        assert abs(E[0] - p.fe) < 1e-6 and abs(N[0] - p.fn) < 1e-6, crs
    # EPSG GN7-2 example (Polar Stereographic variant A): 73N 44E ->
    # E 3320416.75, N 632668.43 on UPS North
    p = parse_pstereo("EPSG:32661")
    E, N = ps_forward(np.array([73.0]), np.array([44.0]), p)
    assert abs(E[0] - 3320416.75) < 0.01
    assert abs(N[0] - 632668.43) < 0.01
    # k == 1 on the standard parallels (derivative along the parallel)
    d = 1e-7
    for crs, lat_ts in (("EPSG:3413", 70.0), ("EPSG:3031", -71.0)):
        p = parse_pstereo(crs)
        E1, N1 = ps_forward(np.array([lat_ts]), np.array([10.0]), p)
        E2, N2 = ps_forward(np.array([lat_ts]), np.array([10.0 + d]), p)
        phi = np.deg2rad(abs(lat_ts))
        nu = _A / np.sqrt(1 - _ecc ** 2 * np.sin(phi) ** 2)
        k = np.hypot(E2[0] - E1[0], N2[0] - N1[0]) / (
            np.deg2rad(d) * nu * np.cos(phi))
        assert abs(k - 1.0) < 1e-6, crs
    # rotation about the origin (north aspect)
    p = parse_pstereo("EPSG:3413")
    Ea, Na = ps_forward(np.array([80.0]), np.array([-45.0]), p)
    Eb, Nb = ps_forward(np.array([80.0]), np.array([45.0]), p)
    assert abs(Ea[0]) < 1e-6 and abs(Nb[0]) < 1e-6
    assert abs(Na[0] + Eb[0]) < 1e-6  # (0, -rho) -> (rho, 0)
    # grid round trips, both hemispheres + parametric
    for crs in ("EPSG:32661", "EPSG:32761", "EPSG:3413", "EPSG:3031",
                "PSTEREO:90,75,-100,1000,2000"):
        p = parse_pstereo(crs)
        la = np.linspace(60, 89.9, 15) * (-1 if p.south else 1)
        lo = np.linspace(-180, 179, 15)
        LA, LO = np.meshgrid(la, lo)
        E, N = ps_forward(LA, LO, p)
        la2, lo2 = ps_inverse(E, N, p)
        assert np.abs(la2 - LA).max() < 1e-11, crs
        assert np.abs(((lo2 - LO + 180) % 360) - 180).max() < 1e-11, crs


def test_polar_routing_and_rejects():
    from moaray.crs import point_transformer
    from moaray.pstereo import parse_pstereo

    import pytest as _pytest

    with _pytest.raises(ValueError, match="lat0"):
        parse_pstereo("PSTEREO:45,70,0")  # not a pole
    with _pytest.raises(ValueError, match="PSTEREO"):
        parse_pstereo("PSTEREO:90,70")  # wrong arity
    assert parse_pstereo("EPSG:32756") is None
    fn = point_transformer("EPSG:4326", "EPSG:3413")
    x, y = fn(np.array([-45.0]), np.array([90.0]))
    assert abs(x[0]) < 1e-6 and abs(y[0]) < 1e-6
    assert point_transformer("EPSG:3413", "EPSG:32633") is not None
    assert point_transformer("EPSG:2154", "EPSG:3031") is not None
    assert point_transformer("EPSG:3413", "EPSG:3413") is None


def test_mosaic_latlon_to_polar_nearest(ray_session, tmp_path):
    """End-to-end polar warp: an EPSG:4326 catalog near Svalbard mosaicked
    onto the NSIDC EPSG:3413 grid; per-pixel inverse-projection oracle."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from moaray import MosaicConfig, codecs, do_mosaic
    from moaray.pipelines.mosaic import mosaic_array
    from moaray.pstereo import parse_pstereo, ps_inverse

    size = 64
    ramp = np.tile(np.arange(size, dtype=np.uint16), (size, 1))
    ramp[:, 0] = 0
    gt = (15.0, 0.01, 0.0, 78.5, 0.0, -0.002)  # ~220x110m px at 78N
    tbl = pa.table(
        {
            "image_id": pa.array(["sv0000"], pa.string()),
            "bytes": pa.array([codecs.encode(ramp, "z16")], pa.binary()),
            "w": pa.array([size], pa.int32()),
            "h": pa.array([size], pa.int32()),
            "fmt": pa.array(["z16"], pa.string()),
            "gt": pa.array([list(gt)], pa.list_(pa.float64(), 6)),
            "crs": pa.array(["EPSG:4326"], pa.string()),
            "nullval": pa.array([0.0], pa.float64()),
            "seq": pa.array([0], pa.int64()),
        }
    )
    path = str(tmp_path / "sv")
    os.makedirs(path)
    pq.write_table(tbl, os.path.join(path, "p.parquet"))

    cfg = MosaicConfig(
        blocksize=32, out_crs="EPSG:3413", out_xres=100.0, out_yres=100.0,
        resample="near", do_pyramids=False, do_stats=False,
    )
    res = do_mosaic(path, cfg)
    assert res.grid.crs == "EPSG:3413"
    got = mosaic_array(res.tiles_ds, res.grid)

    t = res.grid.transform
    rows = np.arange(res.grid.nrows, dtype=np.float64) + 0.5
    cols = np.arange(res.grid.ncols, dtype=np.float64) + 0.5
    cg, rg = np.meshgrid(cols, rows)
    px = t[0] + t[1] * cg
    py = t[3] + t[5] * rg
    lat, lon = ps_inverse(px, py, parse_pstereo("EPSG:3413"))
    sc = np.floor((lon - gt[0]) / gt[1]).astype(np.int64)
    sr = np.floor((lat - gt[3]) / gt[5]).astype(np.int64)
    truth = np.zeros_like(got)
    valid = (sr >= 0) & (sr < size) & (sc >= 0) & (sc < size)
    truth[valid] = ramp[sr[valid], sc[valid]]
    assert (got == truth).all()
    assert (got != 0).sum() > 1000


# ---------------------------------------------------------------------------
# Albers Equal Area (moaray/albers.py)


def test_albers_equal_area_anchors():
    """Definitional anchors: the false origin maps to (FE, FN); the map is
    EQUAL-AREA — the Jacobian determinant of (E, N) w.r.t. (lon, lat)
    equals the ellipsoid surface element M*nu*cos(phi) everywhere (the
    property that defines the projection, checked numerically at points
    across CONUS); E/W symmetry; round trips at 1e-13."""
    from moaray.albers import albers_forward, albers_inverse, parse_albers
    from moaray.lcc import _A, _E as _ecc

    p = parse_albers("EPSG:5070")  # NAD83 / CONUS Albers (Landsat ARD)
    E, N = albers_forward(np.array([23.0]), np.array([-96.0]), p)
    assert abs(E[0]) < 1e-6 and abs(N[0]) < 1e-6
    d = 1e-6
    for lat, lon in ((30.0, -110.0), (40.0, -80.0), (47.0, -96.0),
                     (25.0, -70.0)):
        E0, N0 = albers_forward(np.array([lat]), np.array([lon]), p)
        E1, N1 = albers_forward(np.array([lat + d]), np.array([lon]), p)
        E2, N2 = albers_forward(np.array([lat]), np.array([lon + d]), p)
        J = abs((E1[0] - E0[0]) * (N2[0] - N0[0])
                - (E2[0] - E0[0]) * (N1[0] - N0[0])) / np.deg2rad(d) ** 2
        phi = np.deg2rad(lat)
        e2 = _ecc ** 2
        M = _A * (1 - e2) / (1 - e2 * np.sin(phi) ** 2) ** 1.5
        nu = _A / np.sqrt(1 - e2 * np.sin(phi) ** 2)
        assert abs(J / (M * nu * np.cos(phi)) - 1.0) < 1e-6, (lat, lon)
    Ea, _ = albers_forward(np.array([40.0]), np.array([-100.0]), p)
    Eb, _ = albers_forward(np.array([40.0]), np.array([-92.0]), p)
    assert abs(Ea[0] + Eb[0]) < 1e-6
    la = np.linspace(24, 49, 20)
    lo = np.linspace(-125, -66, 20)
    LA, LO = np.meshgrid(la, lo)
    E, N = albers_forward(LA, LO, p)
    la2, lo2 = albers_inverse(E, N, p)
    assert np.abs(la2 - LA).max() < 1e-11
    assert np.abs(lo2 - LO).max() < 1e-11
    # southern-hemisphere grid (negative n cone): Australian Albers
    pa_ = parse_albers("EPSG:3577")
    la = np.linspace(-44, -10, 15)
    lo = np.linspace(112, 154, 15)
    LA, LO = np.meshgrid(la, lo)
    E, N = albers_forward(LA, LO, pa_)
    la2, lo2 = albers_inverse(E, N, pa_)
    assert np.abs(la2 - LA).max() < 1e-11
    assert np.abs(lo2 - LO).max() < 1e-11


def test_albers_routing():
    from moaray.albers import parse_albers
    from moaray.crs import point_transformer

    import pytest as _pytest

    with _pytest.raises(ValueError, match="ALBERS"):
        parse_albers("ALBERS:1,2,3")
    assert parse_albers("ALBERS:29.5,45.5,23,-96").fe == 0.0
    assert parse_albers("EPSG:32756") is None
    # exact on the native datum (NAD83 geographic -> CONUS Albers, GRS80)
    fn = point_transformer("EPSG:4269", "EPSG:5070")
    x, y = fn(np.array([-96.0]), np.array([23.0]))
    assert abs(x[0]) < 1e-6 and abs(y[0]) < 1e-6
    # from WGS84 the GRS80 ellipsoid change contributes ~0.1 mm
    fn = point_transformer("EPSG:4326", "EPSG:5070")
    x, y = fn(np.array([-96.0]), np.array([23.0]))
    assert abs(x[0]) < 1e-3 and abs(y[0]) < 1e-3
    # chains across all four families
    assert point_transformer("EPSG:5070", "EPSG:32614") is not None
    assert point_transformer("EPSG:5070", "EPSG:3413") is not None
    assert point_transformer("EPSG:5070", "EPSG:2154") is not None


def test_mosaic_latlon_to_albers_nearest(ray_session, tmp_path):
    """End-to-end equal-area warp: EPSG:4326 catalog over Kansas onto the
    CONUS Albers grid (EPSG:5070); per-pixel inverse-projection oracle."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from moaray import MosaicConfig, codecs, do_mosaic
    from moaray.albers import albers_inverse, parse_albers
    from moaray.pipelines.mosaic import mosaic_array

    size = 64
    ramp = np.tile(np.arange(size, dtype=np.uint16), (size, 1))
    ramp[:, 0] = 0
    gt = (-98.0, 0.001, 0.0, 38.9, 0.0, -0.001)
    tbl = pa.table(
        {
            "image_id": pa.array(["ks0000"], pa.string()),
            "bytes": pa.array([codecs.encode(ramp, "z16")], pa.binary()),
            "w": pa.array([size], pa.int32()),
            "h": pa.array([size], pa.int32()),
            "fmt": pa.array(["z16"], pa.string()),
            "gt": pa.array([list(gt)], pa.list_(pa.float64(), 6)),
            "crs": pa.array(["EPSG:4326"], pa.string()),
            "nullval": pa.array([0.0], pa.float64()),
            "seq": pa.array([0], pa.int64()),
        }
    )
    path = str(tmp_path / "ks")
    os.makedirs(path)
    pq.write_table(tbl, os.path.join(path, "p.parquet"))

    cfg = MosaicConfig(
        blocksize=32, out_crs="EPSG:5070", out_xres=100.0, out_yres=100.0,
        resample="near", do_pyramids=False, do_stats=False,
    )
    res = do_mosaic(path, cfg)
    assert res.grid.crs == "EPSG:5070"
    got = mosaic_array(res.tiles_ds, res.grid)

    t = res.grid.transform
    rows = np.arange(res.grid.nrows, dtype=np.float64) + 0.5
    cols = np.arange(res.grid.ncols, dtype=np.float64) + 0.5
    cg, rg = np.meshgrid(cols, rows)
    px = t[0] + t[1] * cg
    py = t[3] + t[5] * rg
    lat, lon = albers_inverse(px, py, parse_albers("EPSG:5070"))
    sc = np.floor((lon - gt[0]) / gt[1]).astype(np.int64)
    sr = np.floor((lat - gt[3]) / gt[5]).astype(np.int64)
    truth = np.zeros_like(got)
    valid = (sr >= 0) & (sr < size) & (sc >= 0) & (sc < size)
    truth[valid] = ramp[sr[valid], sc[valid]]
    assert (got == truth).all()
    assert (got != 0).sum() > 1000


def test_webmerc_published_anchor():
    """EPSG:3857 against the published EPSG Guidance Note 7-2 test point
    (method 1024, Popular Visualisation Pseudo Mercator):
    24°22'54.433"N, 100°20'00.000"W -> E=-11169055.58, N=2800000.00 (cm)."""
    from moaray.merc import webmerc_forward, webmerc_inverse

    lat = 24 + 22 / 60 + 54.433 / 3600
    lon = -(100 + 20 / 60)
    E, N = webmerc_forward(np.array([lat]), np.array([lon]))
    assert abs(E[0] - (-11169055.58)) < 0.01
    assert abs(N[0] - 2800000.00) < 0.01
    # definitional anchors: equator -> N=0; antimeridian -> the web-tile
    # half-width pi*a = 20037508.342789244 (every slippy map's constant)
    E, N = webmerc_forward(np.array([0.0]), np.array([179.9999999]))
    assert abs(N[0]) < 1e-9
    assert abs(abs(E[0]) - 20037508.342789244) < 0.05
    la = np.linspace(-85, 85, 25)
    lo = np.linspace(-179, 179, 25)
    LA, LO = np.meshgrid(la, lo)
    E, N = webmerc_forward(LA, LO)
    la2, lo2 = webmerc_inverse(E, N)
    assert np.abs(la2 - LA).max() < 1e-11
    assert np.abs(lo2 - LO).max() < 1e-11


def test_world_mercator_isometric_latitude():
    """EPSG:3395 (ellipsoidal Mercator, k0=1): the central-meridian northing
    equals a * psi(phi) with the isometric latitude computed through
    moaray/tmerc.py's INDEPENDENT conformal chain (psi = arctanh(sin phi)
    - e arctanh(e sin phi)); the web/ellipsoidal northing ratio is the
    documented ~0.5% sphere-vs-ellipsoid stretch; MERC:0 == EPSG:3395."""
    from moaray.merc import (
        MercParams, merc_forward, merc_inverse, parse_merc, webmerc_forward,
    )
    from moaray.tmerc import _A as a, _E as ecc

    p = MercParams()
    for lat in (15.0, 45.0, 70.0, -33.0):
        E, N = merc_forward(np.array([lat]), np.array([0.0]), p)
        s = np.sin(np.deg2rad(lat))
        psi = np.arctanh(s) - ecc * np.arctanh(ecc * s)
        assert abs(N[0] - a * psi) < 1e-6, lat
    _, Nw = webmerc_forward(np.array([45.0]), np.array([0.0]))
    _, Ne = merc_forward(np.array([45.0]), np.array([0.0]), p)
    assert 1.004 < Nw[0] / Ne[0] < 1.007
    # variant B: MERC:0 (standard parallel at the equator -> k0 = 1)
    kind, p0 = parse_merc("MERC:0")
    assert kind == "ell"
    E1, N1 = merc_forward(np.array([45.0]), np.array([10.0]), p0)
    E2, N2 = merc_forward(np.array([45.0]), np.array([10.0]), p)
    assert abs(E1[0] - E2[0]) < 1e-9 and abs(N1[0] - N2[0]) < 1e-9
    # MERC:45 shrinks x by cos(45)-ish (k0 = m(45) ~ 0.709)
    kind, p45 = parse_merc("MERC:45")
    E3, _ = merc_forward(np.array([0.0]), np.array([10.0]), p45)
    assert 0.70 < E3[0] / E1[0] < 0.715
    la = np.linspace(-80, 80, 20)
    lo = np.linspace(-170, 170, 20)
    LA, LO = np.meshgrid(la, lo)
    E, N = merc_forward(LA, LO, p45)
    la2, lo2 = merc_inverse(E, N, p45)
    assert np.abs(la2 - LA).max() < 1e-11
    assert np.abs(lo2 - LO).max() < 1e-11


def test_sinusoidal_modis_grid_anchors():
    """SINU (MODIS land grid): global half-width pi*R = 20015109.354 m (the
    published MODIS grid constant, R = 6371007.181); pole northing pi*R/2;
    EQUAL-AREA Jacobian det == R^2 cos(phi) everywhere; round trips."""
    from moaray.merc import MODIS_R, SinuParams, sinu_forward, sinu_inverse

    p = SinuParams()
    x, _ = sinu_forward(np.array([0.0]), np.array([-180.0]), p)
    assert abs(abs(x[0]) - 20015109.354) < 0.01
    _, y = sinu_forward(np.array([90.0]), np.array([0.0]), p)
    assert abs(y[0] - np.pi * MODIS_R / 2.0) < 1e-6
    d = 1e-6
    for lat, lon in ((10.0, 20.0), (45.0, -100.0), (-60.0, 140.0)):
        x0, y0 = sinu_forward(np.array([lat]), np.array([lon]), p)
        x1, y1 = sinu_forward(np.array([lat + d]), np.array([lon]), p)
        x2, y2 = sinu_forward(np.array([lat]), np.array([lon + d]), p)
        J = abs((x1[0] - x0[0]) * (y2[0] - y0[0])
                - (x2[0] - x0[0]) * (y1[0] - y0[0])) / np.deg2rad(d) ** 2
        truth = MODIS_R ** 2 * np.cos(np.deg2rad(lat))
        assert abs(J / truth - 1.0) < 1e-6, (lat, lon)
    la = np.linspace(-80, 80, 20)
    lo = np.linspace(-170, 170, 20)
    LA, LO = np.meshgrid(la, lo)
    x, y = sinu_forward(LA, LO, p)
    la2, lo2 = sinu_inverse(x, y, p)
    assert np.abs(la2 - LA).max() < 1e-11
    assert np.abs(lo2 - LO).max() < 1e-11


def test_mercator_routing_and_chains():
    from moaray.crs import point_transformer
    from moaray.merc import parse_merc

    with pytest.raises(ValueError, match="MERC"):
        parse_merc("MERC:1,2,3")
    with pytest.raises(ValueError, match="SINU"):
        parse_merc("SINU:1,2,3")
    assert parse_merc("EPSG:32756") is None
    fn = point_transformer("EPSG:4326", "EPSG:3857")
    x, y = fn(np.array([0.0]), np.array([0.0]))
    assert abs(x[0]) < 1e-9 and abs(y[0]) < 1e-9
    # chains across all six registered families
    assert point_transformer("EPSG:3857", "EPSG:32614") is not None
    assert point_transformer("EPSG:3857", "EPSG:5070") is not None
    assert point_transformer("EPSG:3395", "EPSG:3413") is not None
    assert point_transformer("SINU:0", "EPSG:2154") is not None
    assert point_transformer("SINU:0", "EPSG:3857") is not None
    assert point_transformer("EPSG:3857", "EPSG:3857") is None  # identity


def test_mosaic_latlon_to_webmerc_nearest(ray_session, tmp_path):
    """End-to-end web-tile warp: EPSG:4326 catalog onto the EPSG:3857 grid;
    per-pixel inverse-projection oracle (mirrors the Albers e2e test)."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from moaray import codecs
    from moaray.merc import webmerc_inverse

    size = 64
    ramp = np.tile(np.arange(size, dtype=np.uint16), (size, 1))
    ramp[:, 0] = 0
    gt = (-0.03, 0.001, 0.0, 51.53, 0.0, -0.001)  # London-ish
    tbl = pa.table(
        {
            "image_id": pa.array(["ldn000"], pa.string()),
            "bytes": pa.array([codecs.encode(ramp, "z16")], pa.binary()),
            "w": pa.array([size], pa.int32()),
            "h": pa.array([size], pa.int32()),
            "fmt": pa.array(["z16"], pa.string()),
            "gt": pa.array([list(gt)], pa.list_(pa.float64(), 6)),
            "crs": pa.array(["EPSG:4326"], pa.string()),
            "nullval": pa.array([0.0], pa.float64()),
            "seq": pa.array([0], pa.int64()),
        }
    )
    path = str(tmp_path / "ldn")
    os.makedirs(path)
    pq.write_table(tbl, os.path.join(path, "p.parquet"))

    cfg = MosaicConfig(
        blocksize=32, out_crs="EPSG:3857", out_xres=100.0, out_yres=100.0,
        resample="near", do_pyramids=False, do_stats=False,
    )
    res = do_mosaic(path, cfg)
    assert res.grid.crs == "EPSG:3857"
    got = mosaic_array(res.tiles_ds, res.grid)

    t = res.grid.transform
    rows = np.arange(res.grid.nrows, dtype=np.float64) + 0.5
    cols = np.arange(res.grid.ncols, dtype=np.float64) + 0.5
    cg, rg = np.meshgrid(cols, rows)
    px = t[0] + t[1] * cg
    py = t[3] + t[5] * rg
    lat, lon = webmerc_inverse(px, py)
    sc = np.floor((lon - gt[0]) / gt[1]).astype(np.int64)
    sr = np.floor((lat - gt[3]) / gt[5]).astype(np.int64)
    truth = np.zeros_like(got)
    valid = (sr >= 0) & (sr < size) & (sc >= 0) & (sc < size)
    truth[valid] = ramp[sr[valid], sc[valid]]
    assert (got == truth).all()
    assert (got != 0).sum() > 1000
