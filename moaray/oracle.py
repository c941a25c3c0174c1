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


def _composite_finalize(vals: np.ndarray, has: np.ndarray, grid: OutputGrid):
    """Round a float composite to the grid dtype with the engine's
    null-collision bump rule: integer dtypes rint (half-to-even); a
    legitimately composited pixel landing exactly on a non-NaN nullval is
    nudged one code value away (down at the dtype max)."""
    nullval = grid.nullval
    dtype = np.dtype(grid.dtype)
    vals = vals if np.issubdtype(dtype, np.floating) else np.rint(vals)
    out = np.where(has, vals, nullval)
    if nullval is not None and not (isinstance(nullval, float) and np.isnan(nullval)):
        info = np.iinfo(dtype) if np.issubdtype(dtype, np.integer) else None
        bump = 1 if (info is None or nullval < info.max) else -1
        out = np.where(has & (out == nullval), out + bump, out)
    return out.astype(dtype)


def _composite_stack(
    grid: OutputGrid,
    metas: list[ImageMeta],
    arrays: dict[str, np.ndarray],
) -> tuple[np.ndarray, np.ndarray]:
    """(n_images, nrows, ncols) float64 NaN-stack: layer i holds image i's
    non-null pixels pasted at their mosaic position — the per-pixel value
    stack every composite reduces over. Nested-loop truth source; O(n·H·W)
    memory on purpose."""
    nullval = grid.nullval
    ids = [m.image_id for m in metas]
    stack = np.full((len(metas), grid.nrows, grid.ncols), np.nan,
                    dtype=np.float64)
    for _tid, block, image_id, (ftop, fleft, fxs, fys) in find_inputs_per_block(
        grid, metas
    ):
        arr = arrays[image_id]
        t0, l0 = max(ftop, 0), max(fleft, 0)
        b0 = min(ftop + fys, arr.shape[0])
        r0 = min(fleft + fxs, arr.shape[1])
        if b0 <= t0 or r0 <= l0:
            continue
        clipped = arr[t0:b0, l0:r0].astype(np.float64)
        if nullval is not None and np.isnan(nullval):
            non_null = ~np.isnan(clipped)
        else:
            non_null = clipped != nullval
        gt = block.top + (t0 - ftop)
        gl = block.left + (l0 - fleft)
        layer = stack[ids.index(image_id),
                      gt : gt + clipped.shape[0], gl : gl + clipped.shape[1]]
        layer[non_null] = clipped[non_null]
    has = ~np.isnan(stack).all(axis=0)
    return stack, has


def build_mosaic_median(
    grid: OutputGrid,
    metas: list[ImageMeta],
    arrays: dict[str, np.ndarray],
) -> np.ndarray:
    """Per-pixel median across the contributing stack (temporal composite);
    even depth takes the midpoint mean, then the engine's rint + null-bump."""
    stack, has = _composite_stack(grid, metas, arrays)
    import warnings

    with warnings.catch_warnings():
        warnings.simplefilter("ignore", RuntimeWarning)
        med = np.nanmedian(stack, axis=0)
    return _composite_finalize(np.where(has, med, 0.0), has, grid)


def build_mosaic_mean(
    grid: OutputGrid,
    metas: list[ImageMeta],
    arrays: dict[str, np.ndarray],
) -> np.ndarray:
    """Per-pixel mean across the contributing stack."""
    stack, has = _composite_stack(grid, metas, arrays)
    import warnings

    with warnings.catch_warnings():
        warnings.simplefilter("ignore", RuntimeWarning)
        mean = np.nanmean(stack, axis=0)
    return _composite_finalize(np.where(has, mean, 0.0), has, grid)


def build_mosaic_extreme(
    grid: OutputGrid,
    metas: list[ImageMeta],
    arrays: dict[str, np.ndarray],
    kind: str = "max",
) -> np.ndarray:
    """Per-pixel max/min across the contributing stack (maximum-value
    compositing and its dual)."""
    stack, has = _composite_stack(grid, metas, arrays)
    import warnings

    with warnings.catch_warnings():
        warnings.simplefilter("ignore", RuntimeWarning)
        red = (np.nanmax if kind == "max" else np.nanmin)(stack, axis=0)
    return _composite_finalize(np.where(has, red, 0.0), has, grid)


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


def rasterize(grid: OutputGrid, feats) -> np.ndarray:
    """Vector->raster burn-in truth source, by SCANLINE even-odd fill — a
    deliberately different algorithm from the engine's per-point ray cast
    (ops/vector.py:rasterize_features). ``feats`` = iterable of
    (seq, value, (n, 2) ring ndarray); features burn in seq order,
    last-wins; a pixel burns when its CENTER is inside (strict world-x <
    intersection-x crossing count, matching the engine's rule exactly).
    North-up grids only (rotated grids need per-pixel y; the engine
    handles them, this oracle doesn't)."""
    gt = grid.transform
    assert gt[2] == 0 and gt[4] == 0, "scanline oracle is north-up only"
    canvas = np.full((grid.nrows, grid.ncols), grid.nullval,
                     dtype=np.dtype(grid.dtype))
    xcs = gt[0] + gt[1] * (np.arange(grid.ncols, dtype=np.float64) + 0.5)
    for _seq, value, ring in sorted(feats, key=lambda f: f[0]):
        x1 = ring[:, 0]
        y1 = ring[:, 1]
        x2 = np.roll(x1, -1)
        y2 = np.roll(y1, -1)
        for r in range(grid.nrows):
            yc = gt[3] + gt[5] * (r + 0.5)
            crosses = (y1 > yc) != (y2 > yc)
            if not crosses.any():
                continue
            with np.errstate(divide="ignore", invalid="ignore"):
                xint = x1 + (yc - y1) * (x2 - x1) / (y2 - y1)
            xints = np.sort(xint[crosses])
            # inside <=> an odd number of intersections strictly right of
            # the pixel center
            n_le = np.searchsorted(xints, xcs, side="right")
            inside = ((len(xints) - n_le) % 2) == 1
            canvas[r, inside] = np.dtype(grid.dtype).type(value)
    return canvas
