"""Driver-side reference-semantics oracle (tests only — NOT the engine).

A direct, independent reimplementation of the reference's planning and merge
semantics used as the truth source for parity tests:

- nested-loop spatial join `find_inputs_per_block`
  (ref: /root/reference/moamosaic/mosaic.py:501-535)
- numpy mosaic construction with last-non-null merge
  (ref: mosaic.py:663-689 and the test construction tests.py:89-101)
- per-band stats (ref: mosaic.py:746-794)
- pyramid levels by strided subsampling (ref: mosaic.py:720-743, tests.py:134-177)

Deliberately O(blocks × files): it is the thing the engine's cell-keyed join
must match, not the thing that scales.
"""

from __future__ import annotations

import numpy as np

from .geo import BlockSpec, ImageMeta, OutputGrid, window_overlap


def find_inputs_per_block(
    grid: OutputGrid, metas: list[ImageMeta]
) -> list[tuple[int, BlockSpec, str, tuple[int, int, int, int]]]:
    """Nested-loop join: (tile_id, outblock, image_id, (ftop, fleft, xs, ys)).

    Order: output-block row-major, then input-list order — the load-bearing
    merge order of the reference (mosaic.py:538-553).
    """
    out = []
    for tile_id, block in enumerate(grid.block_list()):
        for meta in metas:
            win = window_overlap(block, grid.transform, meta)
            if win is not None:
                out.append((tile_id, block, meta.image_id, win))
    return out


def build_mosaic(
    grid: OutputGrid,
    metas: list[ImageMeta],
    arrays: dict[str, np.ndarray],
) -> np.ndarray:
    """Construct the full output mosaic the way the reference writer would.

    Walks blocks row-major; for each block merges its clipped+padded input
    windows in input order with last-non-null; blocks with no inputs get
    all-null (mosaic.py:351-359).
    """
    nullval = grid.nullval
    dtype = np.dtype(grid.dtype)
    mosaic = np.full((grid.nrows, grid.ncols), nullval, dtype=dtype)
    for _tid, block, image_id, (ftop, fleft, fxs, fys) in find_inputs_per_block(
        grid, metas
    ):
        arr = arrays[image_id]
        padded = np.full((block.ysize, block.xsize), nullval, dtype=dtype)
        # clip window to file extent then paste at negative-offset position
        # (ref mosaic.py:257-273)
        t0 = max(ftop, 0)
        l0 = max(fleft, 0)
        b0 = min(ftop + fys, arr.shape[0])
        r0 = min(fleft + fxs, arr.shape[1])
        if b0 > t0 and r0 > l0:
            clipped = arr[t0:b0, l0:r0]
            padded[t0 - ftop : t0 - ftop + clipped.shape[0],
                   l0 - fleft : l0 - fleft + clipped.shape[1]] = clipped
        dst = mosaic[block.top : block.top + block.ysize,
                     block.left : block.left + block.xsize]
        if nullval is not None and np.isnan(nullval):
            non_null = ~np.isnan(padded)
        else:
            non_null = padded != nullval
        dst[non_null] = padded[non_null]
    return mosaic


def build_mosaic_nearest(
    grid: OutputGrid,
    metas: list[ImageMeta],
    arrays: dict[str, np.ndarray],
) -> np.ndarray:
    """Nearest-image-center overlap resolution, nested-loop truth source.

    Each output pixel takes the value of the non-null contributing input
    whose image center is nearest (squared distance in file pixel coords);
    exact ties go to the LATER input in list order (``<=`` while iterating
    forward), matching the engine's seq-order tie rule."""
    nullval = grid.nullval
    dtype = np.dtype(grid.dtype)
    mosaic = np.full((grid.nrows, grid.ncols), nullval, dtype=dtype)
    best = np.full((grid.nrows, grid.ncols), np.inf, dtype=np.float64)
    for _tid, block, image_id, (ftop, fleft, fxs, fys) in find_inputs_per_block(
        grid, metas
    ):
        arr = arrays[image_id]
        t0, l0 = max(ftop, 0), max(fleft, 0)
        b0 = min(ftop + fys, arr.shape[0])
        r0 = min(fleft + fxs, arr.shape[1])
        if b0 <= t0 or r0 <= l0:
            continue
        clipped = arr[t0:b0, l0:r0]
        rr = np.arange(t0, b0, dtype=np.float64) - (arr.shape[0] - 1) / 2.0
        cc = np.arange(l0, r0, dtype=np.float64) - (arr.shape[1] - 1) / 2.0
        dist = np.add.outer(rr * rr, cc * cc)
        gt = block.top + (t0 - ftop)
        gl = block.left + (l0 - fleft)
        sl = (slice(gt, gt + clipped.shape[0]), slice(gl, gl + clipped.shape[1]))
        if nullval is not None and np.isnan(nullval):
            non_null = ~np.isnan(clipped)
        else:
            non_null = clipped != nullval
        take = non_null & (dist <= best[sl])
        np.copyto(mosaic[sl], clipped, where=take)
        np.copyto(best[sl], dist, where=take)
    return mosaic


def stats(mosaic: np.ndarray, nullval: float):
    """(min, max, mean, stddev, count) over non-null pixels, float64 math
    identical to StatsAccumulator (mosaic.py:746-794)."""
    if nullval is not None and np.isnan(nullval):
        values = mosaic[~np.isnan(mosaic)]
    elif nullval is not None:
        values = mosaic[mosaic != nullval]
    else:
        values = mosaic.ravel()
    if values.size == 0:
        return (None, None, None, None, 0)
    s = values.astype(np.float64).sum()
    ssq = (values.astype(np.float64) ** 2).sum()
    n = values.size
    mean = s / n
    var = ssq / n - mean ** 2
    std = float(np.sqrt(var)) if var >= 0 else 0.0
    return (values.min(), values.max(), mean, std, n)


def overview(mosaic: np.ndarray, lvl: int) -> np.ndarray:
    """Whole-mosaic nearest-neighbour overview: every lvl-th pixel starting
    at offset lvl//2 (tests.py:162-167)."""
    o = lvl // 2
    return mosaic[o::lvl, o::lvl]
