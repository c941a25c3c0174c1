"""Decode + window-slice stage: the engine's hot path.

Replaces the reference's threaded block reader (readFunc,
ref /root/reference/moamosaic/mosaic.py:227-283) with a ``map_batches``
stage (stateless tasks by default; an actor pool when decoder state is
worth caching). For each image row it:

1. derives the footprint (shared pure placement fn),
2. finds the covering output tiles via searchsorted on broadcast tile edges
   (fusing the spatial join into the scan — one pass over the bytes, no
   bytes-through-shuffle),
3. runs the exact reference overlap test per candidate tile,
4. decodes only the clipped window (raw16: strided view, no full decode;
   z16/q12: full decode once, held in a per-actor LRU — the analog of
   GdalObjCache, ref structures.py:208-242),
5. emits one row per (tile, image) with the clipped window bytes + paste
   offsets. Null-padding to the full block (ref mosaic.py:264-273) is
   deferred to assembly, so only real pixels cross the shuffle.

The per-row Python loop iterates *images* (each iteration slices KBs..MBs of
pixels with numpy) — the per-pixel work is fully vectorized.

Scale note: the broadcast OutputGrid stays tiny at ANY grid size because the
tile-edge arrays are PER-AXIS — O(sqrt(num_tiles)) entries each (a 10^8-tile
grid broadcasts ~10^4 + 10^4 int64 edges). The cell-keyed join
(stages/plan.py assign_cell_join) remains as the equi-join alternative for
planning-side joins against materialized tile tables.
"""

from __future__ import annotations

from collections import OrderedDict

import numpy as np
import pyarrow as pa
import ray

from .. import codecs
from ..geo import OutputGrid, covering_tile_range, window_overlap
from ..testgen import Layout

WINDOW_SCHEMA = pa.schema(
    [
        ("tile_id", pa.int64()),
        ("band", pa.int32()),
        ("salt", pa.int32()),
        ("seq", pa.int64()),
        ("image_id", pa.string()),
        ("out_top", pa.int32()),
        ("out_left", pa.int32()),
        ("out_xsize", pa.int32()),
        ("out_ysize", pa.int32()),
        # paste position of the clipped window inside the tile block
        ("dst_top", pa.int32()),
        ("dst_left", pa.int32()),
        ("win_h", pa.int32()),
        ("win_w", pa.int32()),
        # position of the clipped window inside the source image (for
        # feather-blend weights)
        ("src_top", pa.int32()),
        ("src_left", pa.int32()),
        ("src_h", pa.int32()),
        ("src_w", pa.int32()),
        ("pixels", pa.binary()),
    ]
)


class DecodeSlice:
    """Callable: images batch -> per-(tile, image) window rows.

    ``hot_tiles`` maps tile_id -> (num_salts, seq_min, seq_span) for skewed
    tiles: their windows get ``salt = (seq - seq_min) * num_salts //
    seq_span`` — contiguous seq ranges, so the two-level merge preserves
    last-non-null order (SURVEY.md §4.2), and the range is the TILE's own
    seq extent (not the global input count) so salts stay evenly loaded
    even when a hot stack occupies a narrow slice of the input list. All
    other windows get salt 0.
    """

    def __init__(
        self,
        grid_ref,
        layout: Layout,
        lru_images: int = 8,
        hot_tiles: dict | None = None,
        shuffle_codec: str | None = None,
        warp=None,
        on_decode_error: str = "raise",
    ):
        if on_decode_error not in ("raise", "skip"):
            raise ValueError(
                f"on_decode_error must be 'raise' or 'skip', "
                f"got {on_decode_error!r}"
            )
        # "skip": a corrupt payload drops ONLY that image's windows (logged)
        # instead of killing the job — at 10^12-image scale corrupt objects
        # are a certainty, and the merge semantics already treat a missing
        # image as absent (its pixels fall through to lower-seq inputs or
        # null). "raise" (default) keeps strict parity behavior.
        self.on_decode_error = on_decode_error
        self.grid: OutputGrid = (
            ray.get(grid_ref) if isinstance(grid_ref, ray.ObjectRef) else grid_ref
        )
        self.layout = layout
        self.lru_images = lru_images
        self.hot_tiles = hot_tiles or {}
        # When set ("z16"), window payloads are re-encoded before they enter
        # the tile-assembly shuffle: on a multi-node cluster the groupby moves
        # every window over the network, so shuffle bytes — not decode CPU —
        # bound throughput. The merge kernels are told explicitly
        # (windows_encoded / window_codec) whether payloads are encoded.
        self.shuffle_codec = shuffle_codec
        # WarpSpec: warp-on-read, the analog of reading through the
        # reference's per-input warp VRTs (reproj.py:130-218). Planning and
        # window math run on the warped metadata; pixel fetch decodes the
        # source and inverse-maps the requested window only.
        self.warp = warp
        # windows shuffle in the OUTPUT grid's dtype (little-endian): inputs
        # whose codec dtype differs are cast here, matching the reference's
        # write-through-GDAL cast on output (ref mosaic.py:340-348).
        self.np_dtype = np.dtype(self.grid.dtype)
        self.wire_dtype = (
            self.np_dtype.newbyteorder("<")
            if self.np_dtype.itemsize > 1
            else self.np_dtype
        )
        self._cache: OrderedDict[str, np.ndarray] = OrderedDict()

    def _full_decode(self, key, buf: bytes, fmt: str) -> np.ndarray:
        # key = (image_id, band): bands of one image usually carry distinct
        # payloads; a color JPEG is the exception — ONE payload shared by
        # its three band rows, decoded once and plane-sliced per band.
        arr = self._cache.get(key)
        if arr is None:
            full = codecs.decode(buf, fmt)
            if full.ndim == 3:
                image_id, band = key
                if band >= full.shape[2]:
                    raise ValueError(
                        f"image {image_id}: band {band} out of range for a "
                        f"{full.shape[2]}-plane color payload"
                    )
                for b in range(full.shape[2]):
                    self._cache[(image_id, b)] = np.ascontiguousarray(
                        full[:, :, b]
                    )
                arr = self._cache[key]
            else:
                self._cache[key] = arr = full
            while len(self._cache) > self.lru_images:
                self._cache.popitem(last=False)
        else:
            self._cache.move_to_end(key)
        return arr

    def __call__(self, batch: pa.Table) -> pa.Table:
        grid = self.grid
        rows = {name: [] for name in WINDOW_SCHEMA.names}
        blobs = batch["bytes"]
        bands = (
            batch["band"].to_pylist()
            if "band" in batch.schema.names
            else [0] * batch.num_rows
        )
        from .plan import metas_from_batch

        for i, (seq, meta) in enumerate(metas_from_batch(batch, self.layout)):
            image_id, fmt = meta.image_id, meta.fmt
            mark = len(rows["tile_id"])  # rollback point for skip-on-error
            if fmt == "q12" and meta.nullval != 0:
                # q12 reserves bucket 0: only pixel value 0 survives
                # quantization exactly, so a nonzero nullval would let lossy
                # coding create/destroy null pixels and corrupt the
                # last-non-null merge (ADVICE round 1).
                raise ValueError(
                    f"image {image_id}: fmt='q12' requires nullval == 0 "
                    f"(got {meta.nullval}); use z16/raw16/png for this input"
                )
            try:
                # zero-copy view of the arrow cell (no bytes copy per image)
                buf = memoryview(blobs[i].as_buffer())
                if self.warp is not None:
                    from .reproject import dst_to_src_mapper, warp_window, warped_meta

                    plan_meta = warped_meta(meta, self.warp)
                    # affine 6-tuple for affine CRS pairs; a vectorized TM
                    # callable for curvilinear ones (EPSG:4326 <-> UTM)
                    px_map = dst_to_src_mapper(meta, plan_meta)
                else:
                    plan_meta = meta
                trow0, trow1, tcol0, tcol1 = covering_tile_range(plan_meta, grid)
                full = None
                for trow in range(trow0, trow1):
                    for tcol in range(tcol0, tcol1):
                        tid = grid.tile_id(trow, tcol)
                        block = grid.block_for_tile(tid)
                        win = window_overlap(block, grid.transform, plan_meta)
                        if win is None:
                            continue
                        ftop, fleft, fxs, fys = win
                        # clip to the (warped) image extent (ref mosaic.py:257-263)
                        t0, l0 = max(ftop, 0), max(fleft, 0)
                        b0 = min(ftop + fys, plan_meta.nrows)
                        r0 = min(fleft + fxs, plan_meta.ncols)
                        if b0 <= t0 or r0 <= l0:
                            continue
                        if self.warp is not None:
                            if full is None:
                                full = self._full_decode(
                                    (image_id, bands[i]), buf, fmt
                                )
                            clipped = warp_window(
                                full, px_map, t0, l0, b0 - t0, r0 - l0,
                                np.dtype(grid.dtype).type(grid.nullval),
                                self.warp.resample,
                            )
                        elif fmt == "raw16":
                            clipped = codecs.decode_window(
                                buf, t0, l0, b0 - t0, r0 - l0, fmt
                            )
                        else:
                            if full is None:
                                full = self._full_decode(
                                    (image_id, bands[i]), buf, fmt
                                )
                            clipped = full[t0:b0, l0:r0]
                        hot = self.hot_tiles.get(tid)
                        if hot is not None and hot[0] > 1:
                            n_salts, seq_min, seq_span = hot
                            salt = min(
                                ((seq - seq_min) * n_salts) // seq_span,
                                n_salts - 1,
                            )
                        else:
                            salt = 0
                        rows["tile_id"].append(tid)
                        rows["band"].append(bands[i])
                        rows["salt"].append(salt)
                        rows["seq"].append(seq)
                        rows["image_id"].append(image_id)
                        rows["out_top"].append(block.top)
                        rows["out_left"].append(block.left)
                        rows["out_xsize"].append(block.xsize)
                        rows["out_ysize"].append(block.ysize)
                        rows["dst_top"].append(t0 - ftop)
                        rows["dst_left"].append(l0 - fleft)
                        rows["win_h"].append(clipped.shape[0])
                        rows["win_w"].append(clipped.shape[1])
                        rows["src_top"].append(t0)
                        rows["src_left"].append(l0)
                        rows["src_h"].append(plan_meta.nrows)
                        rows["src_w"].append(plan_meta.ncols)
                        win_arr = np.ascontiguousarray(clipped, dtype=self.wire_dtype)
                        if self.shuffle_codec:
                            rows["pixels"].append(
                                codecs.encode(win_arr, self.shuffle_codec)
                            )
                        else:
                            rows["pixels"].append(win_arr.tobytes())
            except Exception as exc:
                if self.on_decode_error != "skip":
                    raise
                # corrupt payload: drop THIS image's windows only
                for col in rows.values():
                    del col[mark:]
                print(
                    f"moaray decode: skipping image {image_id!r} "
                    f"({fmt}): {type(exc).__name__}: {exc}"
                )
        return pa.Table.from_pydict(rows, schema=WINDOW_SCHEMA)


def decode_windows(
    images_ds: "ray.data.Dataset",
    grid: OutputGrid,
    layout: Layout,
    *,
    concurrency=None,
    batch_size: int = 16,
    lru_images: int = 8,
    hot_tiles: dict | None = None,
    shuffle_codec: str | None = None,
    warp=None,
    on_decode_error: str = "raise",
) -> "ray.data.Dataset":
    """images (with bytes) -> window rows.

    ``batch_size`` counts images; keep it small — payloads are wide binary
    (a 1024² uint16 window is 2 MiB).

    Default is stateless tasks with the grid broadcast via ray.put: in the
    fused plan+decode design each image row is visited exactly once, so the
    per-actor LRU never hits and actor-pool startup (~2 s for a 16-actor
    pool) is pure overhead. Pass ``concurrency=(min, max)`` to switch to an
    actor pool for workloads where decoder state IS reused (e.g. a decoder
    with expensive codec init, or re-decode-heavy custom sources).
    """
    grid_ref = ray.put(grid)
    hot_ref = ray.put(hot_tiles or {})
    if concurrency is not None:
        return images_ds.map_batches(
            DecodeSlice,
            fn_constructor_args=(
                grid_ref, layout, lru_images, hot_tiles, shuffle_codec,
                warp, on_decode_error,
            ),
            batch_format="pyarrow",
            batch_size=batch_size,
            concurrency=concurrency,
            num_cpus=1,
        )

    def decode_batch(batch: pa.Table) -> pa.Table:
        return DecodeSlice(
            ray.get(grid_ref), layout, lru_images, ray.get(hot_ref),
            shuffle_codec, warp, on_decode_error,
        )(batch)

    return images_ds.map_batches(
        decode_batch, batch_format="pyarrow", batch_size=batch_size
    )
