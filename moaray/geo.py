"""Pure-numpy geospatial math for the moaray engine.

Re-implements (from public GDAL conventions, no GDAL dependency) the exact
geometry semantics of the reference engine so that tile assignments are
bit-identical:

- GDAL 6-tuple geotransform apply/invert
  (ref: /root/reference/moamosaic/structures.py:72-99)
- output-grid union extent (ref: mosaic.py:429-456)
- block tiling with the 25%-sliver merge rule (ref: mosaic.py:459-487)
- block -> file pixel-window transform with int(round()) rounding
  (ref: structures.py:98-99)
- window-overlap intersection test (ref: mosaic.py:519-520)

Everything here is driver-side-cheap scalar/np math or vectorized batch
kernels; no Ray dependency.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

import numpy as np

# GDAL geotransform: (x0, xres, rot1, y0, rot2, -yres)
GeoTransform = tuple[float, float, float, float, float, float]


def apply_geotransform(gt: GeoTransform, px: float, py: float) -> tuple[float, float]:
    """Pixel coords -> world coords (GDAL ApplyGeoTransform semantics)."""
    x = gt[0] + px * gt[1] + py * gt[2]
    y = gt[3] + px * gt[4] + py * gt[5]
    return (x, y)


def inv_geotransform(gt: GeoTransform) -> GeoTransform:
    """Invert an affine geotransform (GDAL InvGeoTransform semantics)."""
    det = gt[1] * gt[5] - gt[2] * gt[4]
    if det == 0.0:
        raise ValueError(f"Non-invertible geotransform {gt}")
    inv_det = 1.0 / det
    # Solves [px,py] = inv(A) @ ([x,y] - [x0,y0])
    a = gt[5] * inv_det
    b = -gt[2] * inv_det
    c = -gt[4] * inv_det
    d = gt[1] * inv_det
    x0 = -(a * gt[0] + b * gt[3])
    y0 = -(c * gt[0] + d * gt[3])
    return (x0, a, b, y0, c, d)


@dataclass
class ImageMeta:
    """Per-image raster metadata (the reference's ImageInfo, sans GDAL).

    ref: /root/reference/moamosaic/structures.py:11-58
    """

    image_id: str
    ncols: int
    nrows: int
    transform: GeoTransform
    crs: str = "EPSG:32756"
    dtype: str = "uint16"
    nullval: float = 0.0
    nbands: int = 1
    fmt: str = "raw16"
    # per-band LAYER_TYPE metadata (thematic = categorical, athematic =
    # continuous; ref structures.py:31-34) — propagated to the output
    layer_type: str = "athematic"

    @property
    def x_min(self) -> float:
        return self.transform[0]

    @property
    def x_max(self) -> float:
        return self.transform[0] + self.ncols * self.transform[1]

    @property
    def y_max(self) -> float:
        return self.transform[3]

    @property
    def y_min(self) -> float:
        return self.transform[3] + self.nrows * self.transform[5]

    @property
    def x_res(self) -> float:
        return self.transform[1]

    @property
    def y_res(self) -> float:
        return abs(self.transform[5])


@dataclass(frozen=True)
class BlockSpec:
    """Output-grid pixel window (ref: structures.py:61-114)."""

    top: int
    left: int
    xsize: int
    ysize: int

    def transform_to_file_pixel_coords(
        self, gt: GeoTransform, img: ImageMeta
    ) -> tuple[int, int, int, int]:
        """Block corners -> file pixel coords, int(round()) like the reference.

        ref: structures.py:72-99
        """
        x_left, y_top = apply_geotransform(gt, self.left, self.top)
        x_right, y_bottom = apply_geotransform(
            gt, self.left + self.xsize, self.top + self.ysize
        )
        inv = inv_geotransform(img.transform)
        file_left, file_top = apply_geotransform(inv, x_left, y_top)
        file_right, file_bottom = apply_geotransform(inv, x_right, y_bottom)
        return (
            int(round(file_left)),
            int(round(file_top)),
            int(round(file_right)),
            int(round(file_bottom)),
        )


@dataclass
class OutputGrid:
    """The output mosaic grid (reference's synthetic output ImageInfo).

    ref: mosaic.py:429-456. Includes the per-axis tile edges under the
    25%-sliver rule (ref: mosaic.py:459-487) so any (row, col) -> BlockSpec
    is O(1) and footprint -> covering-tile-range is a searchsorted.
    """

    ncols: int
    nrows: int
    transform: GeoTransform
    crs: str
    dtype: str
    nullval: float
    nbands: int
    blocksize: int
    layer_type: str = "athematic"  # LAYER_TYPE passthrough (ref mosaic.py:627-633)
    row_edges: np.ndarray = field(default=None, repr=False)  # len n_tile_rows+1
    col_edges: np.ndarray = field(default=None, repr=False)

    def __post_init__(self):
        if self.row_edges is None:
            self.row_edges = axis_edges(self.nrows, self.blocksize)
        if self.col_edges is None:
            self.col_edges = axis_edges(self.ncols, self.blocksize)

    @property
    def n_tile_rows(self) -> int:
        return len(self.row_edges) - 1

    @property
    def n_tile_cols(self) -> int:
        return len(self.col_edges) - 1

    @property
    def num_tiles(self) -> int:
        return self.n_tile_rows * self.n_tile_cols

    def tile_id(self, trow: int, tcol: int) -> int:
        return trow * self.n_tile_cols + tcol

    def tile_rc(self, tile_id: int) -> tuple[int, int]:
        return divmod(tile_id, self.n_tile_cols)

    def block_for_tile(self, tile_id: int) -> BlockSpec:
        trow, tcol = self.tile_rc(tile_id)
        top = int(self.row_edges[trow])
        left = int(self.col_edges[tcol])
        return BlockSpec(
            top,
            left,
            int(self.col_edges[tcol + 1]) - left,
            int(self.row_edges[trow + 1]) - top,
        )

    def block_list(self) -> list[BlockSpec]:
        """Row-major BlockSpec list, identical to makeOutputBlockList.

        ref: mosaic.py:459-487
        """
        return [self.block_for_tile(t) for t in range(self.num_tiles)]

    def overview_levels(self, min_overview_size: int = 33) -> list[int]:
        """Overview levels 2**i (i>=2) while size//level >= min_overview_size.

        ref: mosaic.py:646-658
        """
        out_size = max(self.ncols, self.nrows)
        levels = []
        i = 2
        while out_size // (2 ** i) >= min_overview_size:
            levels.append(2 ** i)
            i += 1
        return levels


def axis_edges(npix: int, blocksize: int) -> np.ndarray:
    """Tile-edge positions along one axis with the 25%-sliver merge rule.

    Reproduces the loop of the reference exactly (ref: mosaic.py:466-487):
    each block is `blocksize`, but if fewer than blocksize//4 pixels would
    remain after it, the block absorbs them.
    """
    edges = [0]
    pos = 0
    while pos < npix:
        size = min(blocksize, npix - pos)
        if (npix - (pos + size)) < (blocksize // 4):
            size = npix - pos
        pos += size
        edges.append(pos)
    return np.asarray(edges, dtype=np.int64)


def make_output_grid(
    metas: list[ImageMeta],
    blocksize: int = 1024,
    nullval: float | None = None,
) -> OutputGrid:
    """Union extent of all inputs snapped to the first input's resolution.

    First image supplies projection/res/dtype/nullval (ref: mosaic.py:429-456).
    """
    if not metas:
        raise ValueError("No input images")
    x_min = min(m.x_min for m in metas)
    x_max = max(m.x_max for m in metas)
    y_min = min(m.y_min for m in metas)
    y_max = max(m.y_max for m in metas)
    first = metas[0]
    x_res, y_res = first.x_res, first.y_res
    ncols = int(round((x_max - x_min) / x_res))
    nrows = int(round((y_max - y_min) / y_res))
    return OutputGrid(
        ncols=ncols,
        nrows=nrows,
        transform=(x_min, x_res, 0.0, y_max, 0.0, -y_res),
        crs=first.crs,
        dtype=first.dtype,
        nullval=first.nullval if nullval is None else nullval,
        nbands=first.nbands,
        blocksize=blocksize,
        layer_type=first.layer_type,
    )


def window_overlap(
    block: BlockSpec, gt: GeoTransform, img: ImageMeta
) -> tuple[int, int, int, int] | None:
    """Exact intersection test + input window, reference semantics.

    Returns (file_top, file_left, xsize, ysize) of the block in the image's
    pixel coords (may extend beyond the image; the decode kernel clips and
    null-pads, ref: mosaic.py:257-273), or None if no overlap.
    ref: mosaic.py:511-526
    """
    file_left, file_top, file_right, file_bottom = (
        block.transform_to_file_pixel_coords(gt, img)
    )
    intersects = (
        file_right > 0
        and file_bottom > 0
        and file_left < img.ncols
        and file_top < img.nrows
    )
    if not intersects:
        return None
    return (file_top, file_left, file_right - file_left, file_bottom - file_top)


def covering_tile_range(
    img: ImageMeta, grid: OutputGrid
) -> tuple[int, int, int, int]:
    """Conservative (trow0, trow1, tcol0, tcol1) half-open tile-index range
    whose blocks could intersect the image.

    Computed from the image's bounds in output pixel space, expanded by one
    pixel to absorb the int(round()) boundary behaviour; every candidate is
    then refined with the exact `window_overlap` test, so over-coverage is
    harmless and parity is exact.
    """
    inv = inv_geotransform(grid.transform)
    xs = (img.x_min, img.x_max)
    ys = (img.y_min, img.y_max)
    px = []
    py = []
    for x in xs:
        for y in ys:
            c, r = apply_geotransform(inv, x, y)
            px.append(c)
            py.append(r)
    left = math.floor(min(px)) - 1
    right = math.ceil(max(px)) + 1
    top = math.floor(min(py)) - 1
    bottom = math.ceil(max(py)) + 1
    # Map pixel range -> tile range via the edge arrays.
    tcol0 = int(np.searchsorted(grid.col_edges, left, side="right") - 1)
    tcol1 = int(np.searchsorted(grid.col_edges, right, side="left"))
    trow0 = int(np.searchsorted(grid.row_edges, top, side="right") - 1)
    trow1 = int(np.searchsorted(grid.row_edges, bottom, side="left"))
    tcol0 = max(0, tcol0)
    trow0 = max(0, trow0)
    tcol1 = min(grid.n_tile_cols, tcol1)
    trow1 = min(grid.n_tile_rows, trow1)
    return (trow0, trow1, tcol0, tcol1)


# ---------------------------------------------------------------------------
# Quadkey cell index (H3/S2 stand-in; pure python, no external libs).
# ---------------------------------------------------------------------------

def cell_id(res: int, row: int, col: int) -> int:
    """Pack an (resolution, row, col) quadkey-style cell into one int64.

    Cells partition the output pixel plane into squares of
    ``CELL_BASE * 2**res`` pixels. Used as the equi-join key of the
    cell-keyed spatial join (SURVEY.md §2 P3).
    """
    return (res << 56) | ((row & 0xFFFFFFF) << 28) | (col & 0xFFFFFFF)


def cell_rc(cid: int) -> tuple[int, int, int]:
    return (cid >> 56, (cid >> 28) & 0xFFFFFFF, cid & 0xFFFFFFF)


CELL_BASE = 1024  # pixels per cell at res 0


def cells_for_pixel_rect(
    top: float, left: float, bottom: float, right: float, res: int = 0
) -> list[int]:
    """All cells (at `res`) covering a pixel-space rectangle (half-open)."""
    size = CELL_BASE * (2 ** res)
    r0 = math.floor(top / size)
    r1 = math.floor(max(top, bottom - 1e-9) / size)
    c0 = math.floor(left / size)
    c1 = math.floor(max(left, right - 1e-9) / size)
    return [
        cell_id(res, r, c)
        for r in range(r0, r1 + 1)
        for c in range(c0, c1 + 1)
    ]
