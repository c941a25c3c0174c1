"""Unit parity for the pure geometry layer vs reference semantics."""

import numpy as np
import pytest

from moaray import codecs
from moaray.geo import (
    BlockSpec,
    OutputGrid,
    apply_geotransform,
    axis_edges,
    cell_id,
    cell_rc,
    cells_for_pixel_rect,
    inv_geotransform,
    make_output_grid,
)
from moaray.testgen import Layout, metas_for_layout, pixel_array


def test_inv_geotransform_roundtrip():
    gt = (300000.0, 10.0, 0.0, 7000000.0, 0.0, -10.0)
    inv = inv_geotransform(gt)
    for px, py in [(0, 0), (123, 456), (-5, 7.5)]:
        x, y = apply_geotransform(gt, px, py)
        rpx, rpy = apply_geotransform(inv, x, y)
        assert rpx == pytest.approx(px, abs=1e-9)
        assert rpy == pytest.approx(py, abs=1e-9)


def reference_block_list(nrows, ncols, blocksize):
    """Verbatim re-statement of makeOutputBlockList (mosaic.py:459-487)."""
    blocks = []
    top = 0
    while top < nrows:
        ysize = min(blocksize, nrows - top)
        if (nrows - (top + ysize)) < (blocksize // 4):
            ysize = nrows - top
        left = 0
        while left < ncols:
            xsize = min(blocksize, ncols - left)
            if (ncols - (left + xsize)) < (blocksize // 4):
                xsize = ncols - left
            blocks.append((top, left, xsize, ysize))
            left += xsize
        top += ysize
    return blocks


@pytest.mark.parametrize(
    "nrows,ncols,bs",
    [
        (5000, 9998, 1024),  # reference test scale: sliver rule fires
        (1024, 1024, 1024),
        (1025, 1023, 256),
        (100, 100, 64),  # edge remainder < 25%
        (130, 190, 64),
        (7, 7, 1024),  # single sub-size block
    ],
)
def test_sliver_rule_block_list_parity(nrows, ncols, bs):
    grid = OutputGrid(
        ncols=ncols, nrows=nrows,
        transform=(0.0, 1.0, 0.0, 0.0, 0.0, -1.0),
        crs="EPSG:32756", dtype="uint16", nullval=0.0, nbands=1, blocksize=bs,
    )
    got = [(b.top, b.left, b.xsize, b.ysize) for b in grid.block_list()]
    assert got == reference_block_list(nrows, ncols, bs)


def test_axis_edges_cover_everything():
    e = axis_edges(5000, 1024)
    assert e[0] == 0 and e[-1] == 5000
    assert (np.diff(e) > 0).all()


def test_make_output_grid_pair_overlap():
    layout = Layout("pair_overlap", 2, 64)
    metas = metas_for_layout(layout)
    grid = make_output_grid(metas, blocksize=1024)
    # two 64-wide images with 2-px overlap -> 126 cols
    assert grid.ncols == 126
    assert grid.nrows == 64
    assert grid.transform[0] == 300000.0
    assert grid.transform[3] == 7000000.0
    assert grid.nullval == 0.0


def test_block_transform_to_file_coords():
    layout = Layout("pair_overlap", 2, 64)
    metas = metas_for_layout(layout)
    grid = make_output_grid(metas, blocksize=1024)
    block = BlockSpec(0, 0, grid.ncols, grid.nrows)
    # whole grid in image-1 coords: image 1 starts at column 62 of the grid
    l, t, r, b = block.transform_to_file_pixel_coords(grid.transform, metas[1])
    assert (l, t) == (-62, 0)
    assert (r, b) == (126 - 62, 64)


def test_cell_id_roundtrip():
    cid = cell_id(3, 12345, 6789)
    assert cell_rc(cid) == (3, 12345, 6789)


def test_cells_for_pixel_rect():
    cells = cells_for_pixel_rect(0, 0, 1024, 1024, res=0)
    assert cells == [cell_id(0, 0, 0)]
    cells = cells_for_pixel_rect(0, 0, 1025, 2049, res=0)
    assert len(cells) == 2 * 3


def test_codec_roundtrip_lossless():
    arr = pixel_array(0, Layout("grid", 9, 64))
    for fmt in ("raw16", "z16"):
        buf = codecs.encode(arr, fmt)
        assert codecs.probe_header(buf) == (fmt, 64, 64)
        out = codecs.decode(buf, fmt)
        assert (out == arr).all()
        win = codecs.decode_window(buf, 3, 5, 10, 20, fmt)
        assert (win == arr[3:13, 5:25]).all()


def test_codec_q12_lossy_psnr_and_null_preservation():
    arr = pixel_array(0, Layout("grid", 9, 512))
    buf = codecs.encode(arr, "q12")
    out = codecs.decode(buf, "q12")
    assert codecs.psnr(arr, out) >= 40.0
    # null pixels must survive exactly (merge semantics)
    assert (out[arr == 0] == 0).all()
    assert (out[arr != 0] != 0).all()
