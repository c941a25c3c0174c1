"""z/x/y web-map tile-tree export (TMS-style pyramid of fixed-size PNGs).

No reference counterpart (moamosaic stops at the GDAL file, ref
mosaic.py:286-394); this is the serving-side sink a mosaic at scale
actually feeds. The tree is a power-of-two pyramid over the NATIVE grid:
level 0 is full resolution, level z samples every 2^z-th pixel at offset
2^(z-1) (the same strided-overview convention as the pyramid stage and
the reference's overview semantics, ref tests.py:162-167), and each
(z, x, y) tile is a ``tile_size``² PNG at ``<out>/<z>/<x>/<y>.png``.

Distributed shape: one map_batches re-keys every mosaic tile's strided
pixels to the web tiles they land in (each source pixel goes to exactly
ONE web tile per level — O(levels) duplication, never O(area²)); one
groupby on the packed (z, x, y) key assembles and PNG-encodes each web
tile and writes it through OutputFS (atomic PUT remotely, tmp+rename
locally — a rerun idempotently overwrites, so a killed export is safe to
re-run). Only small manifest rows come back to the caller.
"""

from __future__ import annotations

import zlib

import numpy as np
import pyarrow as pa

from ..geo import OutputGrid
from ..stages.assemble import _nonnull_mask, decode_payload
from ..state.fsio import OutputFS

_PIECE_SCHEMA = pa.schema(
    [
        ("key", pa.int64()),     # packed (z, wx, wy)
        ("z", pa.int32()),
        ("wx", pa.int32()),
        ("wy", pa.int32()),
        ("off_y", pa.int32()),   # position inside the web tile
        ("off_x", pa.int32()),
        ("h", pa.int32()),
        ("w", pa.int32()),
        ("pixels", pa.binary()),  # native-dtype C-order strided sample
    ]
)


def _pack_key(z: int, wx: np.ndarray, wy: np.ndarray) -> np.ndarray:
    return (np.int64(z) << 58) | (wx.astype(np.int64) << 29) | wy.astype(
        np.int64)


def max_web_level(grid: OutputGrid, tile_size: int) -> int:
    """Smallest z whose level image fits one tile (top of the pyramid)."""
    z = 0
    while (int(np.ceil(grid.nrows / (1 << z))) > tile_size
           or int(np.ceil(grid.ncols / (1 << z))) > tile_size):
        z += 1
    return z


def export_web_tiles(tiles_ds, grid: OutputGrid, out_dir: str,
                     tile_size: int = 256, band: int = 0,
                     scale: tuple | None = None):
    """Write the mosaic as a z/x/y PNG tile tree; returns a small manifest
    dataset (z, x, y, path, nbytes, crc32), one row per written tile.

    uint8 / uint16 mosaics encode directly (8-/16-bit grayscale PNG);
    other dtypes require ``scale=(vmin, vmax)`` and are linearly mapped
    to 16-bit. Null pixels (and padding outside the mosaic) encode as 0 —
    pass a ``scale`` whose vmin sits above the data floor if 0 must stay
    distinguishable.
    """
    np_dtype = np.dtype(grid.dtype)
    if scale is None and np_dtype not in (np.dtype("uint8"),
                                          np.dtype("uint16")):
        raise ValueError(
            f"dtype {grid.dtype} needs scale=(vmin, vmax) for PNG export"
        )
    ts = int(tile_size)
    zmax = max_web_level(grid, ts)
    nullval = grid.nullval
    fs = OutputFS(out_dir)

    def pieces(batch: pa.Table) -> pa.Table:
        out = {n: [] for n in _PIECE_SCHEMA.names}
        for i in range(batch.num_rows):
            if batch["band"][i].as_py() != band:
                continue
            top = batch["out_top"][i].as_py()
            left = batch["out_left"][i].as_py()
            ys = batch["out_ysize"][i].as_py()
            xs = batch["out_xsize"][i].as_py()
            arr = decode_payload(
                batch["pixels"][i].as_buffer(),
                batch["pixels_codec"][i].as_py(), np_dtype,
            ).reshape(ys, xs)
            for z in range(zmax + 1):
                s, o = 1 << z, (1 << z) // 2
                # level-z pixel k samples global row o + k*s
                k0 = -((top - o) // -s)            # ceil
                k1 = (top + ys - 1 - o) // s       # floor (inclusive)
                j0 = -((left - o) // -s)
                j1 = (left + xs - 1 - o) // s
                if k1 < k0 or j1 < j0:
                    continue
                sub = arr[o + k0 * s - top: o + k1 * s - top + 1: s,
                          o + j0 * s - left: o + j1 * s - left + 1: s]
                # split the strided sample at web-tile boundaries
                for wy in range(k0 // ts, k1 // ts + 1):
                    r0 = max(k0, wy * ts)
                    r1 = min(k1, (wy + 1) * ts - 1)
                    for wx in range(j0 // ts, j1 // ts + 1):
                        c0 = max(j0, wx * ts)
                        c1 = min(j1, (wx + 1) * ts - 1)
                        piece = sub[r0 - k0: r1 - k0 + 1,
                                    c0 - j0: c1 - j0 + 1]
                        out["key"].append(int(_pack_key(
                            z, np.int64(wx), np.int64(wy))))
                        out["z"].append(z)
                        out["wx"].append(wx)
                        out["wy"].append(wy)
                        out["off_y"].append(r0 - wy * ts)
                        out["off_x"].append(c0 - wx * ts)
                        out["h"].append(piece.shape[0])
                        out["w"].append(piece.shape[1])
                        out["pixels"].append(
                            np.ascontiguousarray(piece).tobytes())
        return pa.Table.from_pydict(out, schema=_PIECE_SCHEMA)

    def write_tile(group: pa.Table) -> pa.Table:
        from .. import codecs

        z = group["z"][0].as_py()
        wx = group["wx"][0].as_py()
        wy = group["wy"][0].as_py()
        canvas = np.zeros((ts, ts), dtype=np_dtype)
        touched = np.zeros((ts, ts), dtype=bool)
        for i in range(group.num_rows):
            oy = group["off_y"][i].as_py()
            ox = group["off_x"][i].as_py()
            h = group["h"][i].as_py()
            w = group["w"][i].as_py()
            a = np.frombuffer(
                group["pixels"][i].as_buffer(), dtype=np_dtype
            ).reshape(h, w)
            canvas[oy:oy + h, ox:ox + w] = a
            touched[oy:oy + h, ox:ox + w] = True
        if scale is not None:
            vmin, vmax = float(scale[0]), float(scale[1])
            f = canvas.astype(np.float64)
            valid = _nonnull_mask(canvas, nullval) & touched
            lin = np.clip((f - vmin) / (vmax - vmin), 0.0, 1.0)
            img = np.where(valid, np.rint(lin * 65535.0), 0).astype(
                np.uint16)
        else:
            # docstring contract: null pixels encode as 0 (not nullval)
            img = np.where(
                touched & _nonnull_mask(canvas, nullval), canvas, 0
            ).astype(np_dtype)
        png = codecs.png_encode(img)
        path = fs.join(fs.root, str(z), str(wx), f"{wy}.png")
        fs.makedirs(fs.join(fs.root, str(z), str(wx)))
        fs.put_bytes(path, png)
        return pa.table({
            "z": pa.array([z], pa.int32()),
            "x": pa.array([wx], pa.int32()),
            "y": pa.array([wy], pa.int32()),
            "path": pa.array([path], pa.string()),
            "nbytes": pa.array([len(png)], pa.int64()),
            "crc32": pa.array([zlib.crc32(png)], pa.int64()),
        })

    return (
        tiles_ds.map_batches(pieces, batch_format="pyarrow")
        .groupby("key")
        .map_groups(write_tile, batch_format="pyarrow")
    )
