"""Tile assembly: the groupby(tile_id) shuffle + merge kernel + pyramids.

Replaces the reference's single-threaded ordered writer + BlockCache + queue
(writeFunc, ref /root/reference/moamosaic/mosaic.py:286-394;
BlockCache structures.py:173-205) with one ``groupby("tile_id").map_groups``
shuffle: a group materializes exactly when all its inputs exist (the
reference's readiness barrier, mosaic.py:568-601, for free), merge order is
re-imposed by sorting on the explicit ``seq`` column, and tiles are written
independently — no global write order needed in a tile-sharded layout.

Merge kernels:
- ``last``    — last-non-null-wins, bit-identical to mergeInputs
  (ref mosaic.py:663-689): later seq overwrites wherever its pixel != null.
- ``feather`` — extended mode (north rule): weighted blend on overlap, weight
  = 1 + distance (in pixels) from the pixel to the nearest edge of its source
  image, so seams fade linearly. No reference counterpart; gated by config.

Pyramids reproduce writeBlockPyramids exactly (ref mosaic.py:720-743):
per tile, per level `lvl`: subsample ``arr[lvl//2::lvl, lvl//2::lvl]``, write
at ``(left//lvl, top//lvl)`` clipped to the overview raster size.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray

from ..geo import OutputGrid

TILE_SCHEMA = pa.schema(
    [
        ("tile_id", pa.int64()),
        ("band", pa.int32()),
        ("out_top", pa.int32()),
        ("out_left", pa.int32()),
        ("out_xsize", pa.int32()),
        ("out_ysize", pa.int32()),
        ("n_inputs", pa.int32()),
        ("input_ids", pa.list_(pa.string())),  # lineage
        ("nonnull_count", pa.int64()),
        # per-tile partial stats (StatsAccumulator partials, mosaic.py:758-771)
        # carried as columns so the global stats aggregate never re-decodes
        # pixel payloads.
        ("px_sum", pa.float64()),
        ("px_ssq", pa.float64()),
        ("px_min", pa.float64()),
        ("px_max", pa.float64()),
        # payload codec: "raw" (C-order buffer of grid.dtype) or a codec name
        # from moaray.codecs ("z16"). Self-describing per row so readers
        # (pyramids, mosaic_array, external consumers) need no side-channel.
        ("pixels_codec", pa.string()),
        ("pixels", pa.binary()),
    ]
)

# TILE_SCHEMA + persisted feather num/den partials (zlib(float64 C-order)):
# written when MosaicConfig.feather_partials is on so a later
# update_mosaic(merge="feather") can fold new images into the weighted sums
# without re-reading any original source (SURVEY §10 restriction closed).
TILE_SCHEMA_PARTIALS = TILE_SCHEMA.append(
    pa.field("num", pa.binary())
).append(pa.field("den", pa.binary()))

PYRAMID_SCHEMA = pa.schema(
    [
        ("level", pa.int32()),
        ("tile_id", pa.int64()),
        ("band", pa.int32()),
        ("yoff", pa.int32()),
        ("xoff", pa.int32()),
        ("h", pa.int32()),
        ("w", pa.int32()),
        ("pixels_codec", pa.string()),
        ("pixels", pa.binary()),
    ]
)


def decode_payload(buf: bytes, codec: str, dtype) -> np.ndarray:
    """Decode one pixels cell per its pixels_codec value -> flat ndarray."""
    from .. import codecs

    if codec == "raw":
        return np.frombuffer(buf, dtype=dtype)
    return codecs.decode(bytes(buf)).ravel()


def encode_payload(arr: np.ndarray, codec: str | None) -> tuple[bytes, str]:
    """(payload bytes, codec tag) for a 2-D canvas."""
    from .. import codecs

    if codec:
        return codecs.encode(arr, codec), codec
    return arr.tobytes(), "raw"


def _is_nan_null(nv) -> bool:
    try:
        return bool(np.isnan(nv))
    except TypeError:
        return False


def _nonnull_mask(arr: np.ndarray, nv) -> np.ndarray:
    """Boolean mask of non-null pixels; NaN-null rasters (the reference's
    float special case, ref mosaic.py:762-767) compare via isnan because
    NaN != NaN."""
    if _is_nan_null(nv):
        return ~np.isnan(arr)
    return arr != nv


def _canvas_stats(canvas: np.ndarray, nv) -> tuple[int, float, float, object, object]:
    """(nonnull, sum, ssq, min, max) of non-null pixels — float64 math
    identical to StatsAccumulator (ref mosaic.py:758-771). For uint16 a
    bincount histogram gives the same sums in one pass over the canvas
    instead of materializing float64 copies of every pixel."""
    if canvas.dtype == np.uint16:
        counts = np.bincount(canvas.ravel(), minlength=65536).astype(np.int64)
        if not _is_nan_null(nv) and 0 <= int(nv) < 65536:
            counts[int(nv)] = 0
        nz = np.nonzero(counts)[0]
        if nz.size == 0:
            return 0, 0.0, 0.0, None, None
        vals = nz.astype(np.float64)
        c = counts[nz].astype(np.float64)
        nonnull = int(c.sum())
        return (
            nonnull,
            float((vals * c).sum()),
            float((vals * vals * c).sum()),
            float(nz[0]),
            float(nz[-1]),
        )
    valid = canvas[_nonnull_mask(canvas, nv)]
    nonnull = int(valid.size)
    if nonnull == 0:
        return 0, 0.0, 0.0, None, None
    v64 = valid.astype(np.float64)
    return (
        nonnull,
        float(v64.sum()),
        float((v64 ** 2).sum()),
        float(valid.min()),
        float(valid.max()),
    )


def _binary_views(
    col: pa.ChunkedArray | pa.Array, dtype, encoded: bool = False
) -> list[np.ndarray]:
    """Numpy arrays over a binary column's cells: zero-copy buffer views for
    raw payloads; codec decode when ``encoded`` (the shuffle-compressed
    path — see DecodeSlice.shuffle_codec). Explicit flag, not sniffing —
    at 10^12 windows, raw pixels that happen to start with the codec magic
    would otherwise mis-decode."""
    from .. import codecs

    chunks = col.chunks if isinstance(col, pa.ChunkedArray) else [col]
    views: list[np.ndarray] = []
    for chunk in chunks:
        # buffers(): [validity, offsets, data] for binary arrays
        bufs = chunk.buffers()
        offsets = np.frombuffer(bufs[1], dtype=np.int32, count=len(chunk) + 1,
                                offset=chunk.offset * 4)
        data = np.frombuffer(bufs[2], dtype=np.uint8)
        for i in range(len(chunk)):
            cell = data[offsets[i] : offsets[i + 1]]
            if encoded:
                views.append(codecs.decode(cell.tobytes()).ravel())
            else:
                views.append(cell.view(dtype))
    return views


def _merge_last(group: pa.Table, order: np.ndarray, canvas: np.ndarray, nullval,
                encoded: bool = False):
    views = _binary_views(group["pixels"], canvas.dtype, encoded)
    dst_top = group["dst_top"].to_numpy()
    dst_left = group["dst_left"].to_numpy()
    win_h = group["win_h"].to_numpy()
    win_w = group["win_w"].to_numpy()
    for i in order:
        h, w = int(win_h[i]), int(win_w[i])
        win = views[i].reshape(h, w)
        sub = canvas[dst_top[i] : dst_top[i] + h, dst_left[i] : dst_left[i] + w]
        np.copyto(sub, win, where=_nonnull_mask(win, nullval))


def _accum_feather(group: pa.Table, order: np.ndarray, num: np.ndarray,
                   den: np.ndarray, dtype, nullval, encoded: bool = False,
                   uniform: bool = False):
    """Accumulate feather-blend weighted sums into num/den (order-free).
    ``uniform`` drops the edge-distance taper to weight 1.0 everywhere —
    num/den then hold plain sum/count and the blend is the per-pixel MEAN
    across the contributing stack (temporal compositing)."""
    views = _binary_views(group["pixels"], dtype, encoded)
    cols = {
        n: group[n].to_numpy()
        for n in ("dst_top", "dst_left", "win_h", "win_w",
                  "src_top", "src_left", "src_h", "src_w")
    }
    for i in order:
        h, w = int(cols["win_h"][i]), int(cols["win_w"][i])
        win = views[i].reshape(h, w)
        if uniform:
            wgt = 1.0
        else:
            # distance-to-source-edge weights (vectorized outer min)
            rr = np.arange(cols["src_top"][i], cols["src_top"][i] + h,
                           dtype=np.float64)
            cc = np.arange(cols["src_left"][i], cols["src_left"][i] + w,
                           dtype=np.float64)
            wr = 1.0 + np.minimum(rr, cols["src_h"][i] - 1 - rr)
            wc = 1.0 + np.minimum(cc, cols["src_w"][i] - 1 - cc)
            wgt = np.minimum.outer(wr, wc)
        mask = _nonnull_mask(win, nullval)
        sl = (slice(cols["dst_top"][i], cols["dst_top"][i] + h),
              slice(cols["dst_left"][i], cols["dst_left"][i] + w))
        num[sl] += np.where(mask, wgt * win.astype(np.float64), 0.0)
        den[sl] += np.where(mask, wgt, 0.0)


def _blend_feather(num: np.ndarray, den: np.ndarray, canvas: np.ndarray, nullval):
    if np.issubdtype(canvas.dtype, np.floating):
        blended = np.where(den > 0, num / np.maximum(den, 1e-12), nullval)
    else:
        blended = np.where(den > 0, np.rint(num / np.maximum(den, 1e-12)), nullval)
    if not _is_nan_null(nullval):
        # A legitimately blended pixel whose weighted mean lands exactly on
        # the null value would read back as a hole (round-1 ADVICE): nudge it
        # one code value away from null.
        info = (
            np.iinfo(canvas.dtype)
            if np.issubdtype(canvas.dtype, np.integer)
            else None
        )
        bump = 1 if (info is None or nullval < info.max) else -1
        blended = np.where((den > 0) & (blended == nullval),
                           blended + bump, blended)
    canvas[:, :] = blended.astype(canvas.dtype)


def _merge_nearest(group: pa.Table, order: np.ndarray, canvas: np.ndarray,
                   nullval, encoded: bool = False,
                   best: np.ndarray | None = None):
    """Per-pixel nearest-image-center overlap resolution (the north star's
    "kNN for nearest-neighbor overlap resolution"): each output pixel takes
    its value from the contributing image whose center is closest, measured
    as squared distance in grid-resolution pixels (src_* coords are already
    in output resolution for warped inputs — warped_meta — and inputs share
    the grid resolution otherwise). Iterating in seq order with ``<=`` makes
    the LAST input win exact ties, so identical footprints degrade to the
    reference's last-non-null rule. ``best`` lets the salted two-level path
    reuse/return the per-pixel best-distance canvas (order-free partial)."""
    views = _binary_views(group["pixels"], canvas.dtype, encoded)
    cols = {
        n: group[n].to_numpy()
        for n in ("dst_top", "dst_left", "win_h", "win_w",
                  "src_top", "src_left", "src_h", "src_w")
    }
    if best is None:
        best = np.full(canvas.shape, np.inf, dtype=np.float64)
    for i in order:
        h, w = int(cols["win_h"][i]), int(cols["win_w"][i])
        win = views[i].reshape(h, w)
        # squared distance from each window pixel to the source-image center
        rr = (np.arange(cols["src_top"][i], cols["src_top"][i] + h,
                        dtype=np.float64)
              - (cols["src_h"][i] - 1) / 2.0)
        cc = (np.arange(cols["src_left"][i], cols["src_left"][i] + w,
                        dtype=np.float64)
              - (cols["src_w"][i] - 1) / 2.0)
        dist = np.add.outer(rr * rr, cc * cc)
        sl = (slice(cols["dst_top"][i], cols["dst_top"][i] + h),
              slice(cols["dst_left"][i], cols["dst_left"][i] + w))
        take = _nonnull_mask(win, nullval) & (dist <= best[sl])
        np.copyto(canvas[sl], win, where=take)
        np.copyto(best[sl], dist, where=take)
    return best


def _merge_feather(group: pa.Table, order: np.ndarray, canvas: np.ndarray, nullval,
                   encoded: bool = False):
    num = np.zeros(canvas.shape, dtype=np.float64)
    den = np.zeros(canvas.shape, dtype=np.float64)
    _accum_feather(group, order, num, den, canvas.dtype, nullval, encoded)
    _blend_feather(num, den, canvas, nullval)
    return num, den


def _merge_mean(group: pa.Table, order: np.ndarray, canvas: np.ndarray, nullval,
                encoded: bool = False):
    """Per-pixel MEAN across the contributing stack (temporal compositing —
    the simple cloud-free composite). Order-free sum/count partials, so the
    salted two-level path reuses the feather machinery with uniform=True."""
    num = np.zeros(canvas.shape, dtype=np.float64)
    den = np.zeros(canvas.shape, dtype=np.float64)
    _accum_feather(group, order, num, den, canvas.dtype, nullval, encoded,
                   uniform=True)
    _blend_feather(num, den, canvas, nullval)


def _merge_median(group: pa.Table, order: np.ndarray, canvas: np.ndarray,
                  nullval, encoded: bool = False):
    """Per-pixel MEDIAN across the contributing stack — the classic
    Earth-observation cloud-free composite (median of a temporal stack of
    scenes per pixel). An exact median needs every contributing value, so
    this kernel builds an (n_inputs, ysize, xsize) float64 NaN-stack and
    nanmedians down axis 0. Memory contract: inputs-per-tile × tile bytes
    must fit one worker — temporal stacks are typically 10-100 scenes
    deep, far below salt_threshold; median has NO salted two-level path
    (per-pixel medians are not mergeable from disjoint partials), so
    do_mosaic keeps median tiles single-level regardless of hot-tile
    counts. Even-depth pixels take the midpoint mean; integer outputs
    round via the same rint + null-bump rule as the feather blend."""
    _merge_stack_reduce(group, order, canvas, nullval, encoded,
                        np.nanmedian)


def _merge_extreme(group: pa.Table, order: np.ndarray, canvas: np.ndarray,
                   nullval, encoded: bool = False, kind: str = "max"):
    """Per-pixel MAX/MIN across the stack — maximum-value compositing
    (the classic max-NDVI EO composite) and its min dual. Order-free and
    exact; same stack memory contract as _merge_median."""
    _merge_stack_reduce(group, order, canvas, nullval, encoded,
                        np.nanmax if kind == "max" else np.nanmin)


def _merge_stack_reduce(group, order, canvas, nullval, encoded, reducer):
    views = _binary_views(group["pixels"], canvas.dtype, encoded)
    dst_top = group["dst_top"].to_numpy()
    dst_left = group["dst_left"].to_numpy()
    win_h = group["win_h"].to_numpy()
    win_w = group["win_w"].to_numpy()
    stack = np.full((len(order),) + canvas.shape, np.nan, dtype=np.float64)
    for j, i in enumerate(order):
        h, w = int(win_h[i]), int(win_w[i])
        win = views[i].reshape(h, w)
        sub = stack[j, dst_top[i] : dst_top[i] + h,
                    dst_left[i] : dst_left[i] + w]
        mask = _nonnull_mask(win, nullval)
        sub[mask] = win.astype(np.float64)[mask]
    import warnings as _warnings

    with _warnings.catch_warnings():
        # all-NaN pixel columns (no contribution) are expected
        _warnings.simplefilter("ignore", RuntimeWarning)
        med = reducer(stack, axis=0)
    has = ~np.isnan(med)
    # reuse the blend finalizer (rint + null-collision bump): den=1 where a
    # value exists makes num/den the reduced value itself
    _blend_feather(np.where(has, med, 0.0), has.astype(np.float64),
                   canvas, nullval)


def _pack_partial(arr: np.ndarray) -> bytes:
    import zlib as _zlib

    return _zlib.compress(np.ascontiguousarray(arr, np.float64).tobytes(), 1)


def _unpack_partial(buf, ysize: int, xsize: int) -> np.ndarray:
    import zlib as _zlib

    return np.frombuffer(
        _zlib.decompress(buf), dtype=np.float64
    ).reshape(ysize, xsize)


# Per-tile lineage carried on the SHUFFLED row is bounded: a 1024-input
# hotspot tile must not drag 1024 strings through the shuffle, the sink and
# every update read-back (round-2 verdict #5). n_inputs stays exact; the
# row keeps the first/last LINEAGE_CAP//2 ids (seq order, so the endpoints
# of the merge sequence survive); the manifest record flags truncation.
LINEAGE_CAP = 16


def _cap_lineage(ids: list, cap: int | None = None) -> list:
    cap = LINEAGE_CAP if cap is None else cap
    if len(ids) <= cap:
        return ids
    half = cap // 2
    return ids[:half] + ids[-half:]


def make_assemble_fn(nullval: float, dtype: str, merge: str = "last",
                     windows_encoded: bool = False,
                     tile_codec: str | None = None,
                     emit_partials: bool = False):
    np_dtype = np.dtype(dtype)
    lineage_cap = LINEAGE_CAP  # captured at build time, ships with the closure
    nv = nullval if _is_nan_null(nullval) else np_dtype.type(nullval)
    if emit_partials and merge != "feather":
        raise ValueError("emit_partials requires merge='feather'")

    def assemble(group: pa.Table) -> pa.Table:
        # one group == one tile_id; re-impose input-list merge order
        seq = group["seq"].to_numpy()
        order = np.argsort(seq, kind="stable")
        ysize = int(group["out_ysize"][0].as_py())
        xsize = int(group["out_xsize"][0].as_py())
        canvas = np.full((ysize, xsize), nv, dtype=np_dtype)
        partials = None
        if merge == "last":
            _merge_last(group, order, canvas, nv, windows_encoded)
        elif merge == "feather":
            partials = _merge_feather(group, order, canvas, nv, windows_encoded)
        elif merge == "nearest":
            _merge_nearest(group, order, canvas, nv, windows_encoded)
        elif merge == "mean":
            _merge_mean(group, order, canvas, nv, windows_encoded)
        elif merge == "median":
            _merge_median(group, order, canvas, nv, windows_encoded)
        elif merge in ("max", "min"):
            _merge_extreme(group, order, canvas, nv, windows_encoded,
                           kind=merge)
        else:
            raise ValueError(f"unknown merge kernel {merge!r}")
        input_ids = [group["image_id"][int(i)].as_py() for i in order]
        nonnull, px_sum, px_ssq, px_min, px_max = _canvas_stats(canvas, nv)
        payload, codec_tag = encode_payload(canvas, tile_codec)
        cols = {
            "tile_id": [group["tile_id"][0].as_py()],
            "band": [group["band"][0].as_py()],
            "out_top": [group["out_top"][0].as_py()],
            "out_left": [group["out_left"][0].as_py()],
            "out_xsize": [xsize],
            "out_ysize": [ysize],
            "n_inputs": [len(input_ids)],
            "input_ids": [_cap_lineage(input_ids, lineage_cap)],
            "nonnull_count": [nonnull],
            "px_sum": [px_sum],
            "px_ssq": [px_ssq],
            "px_min": [px_min],
            "px_max": [px_max],
            "pixels_codec": [codec_tag],
            "pixels": [payload],
        }
        if emit_partials:
            num, den = partials
            cols["num"] = [_pack_partial(num)]
            cols["den"] = [_pack_partial(den)]
            return pa.Table.from_pydict(cols, schema=TILE_SCHEMA_PARTIALS)
        return pa.Table.from_pydict(cols, schema=TILE_SCHEMA)

    return assemble


def assemble_tiles(
    windows_ds: "ray.data.Dataset",
    grid: OutputGrid,
    merge: str = "last",
    windows_encoded: bool = False,
    tile_codec: str | None = None,
    multiband: bool = True,
    emit_partials: bool = False,
) -> "ray.data.Dataset":
    """The one shuffle of the pipeline: hash-partition windows by
    (tile_id, band), then merge each group. Backpressure/spill handled by
    the streaming executor (fixes the reference's unbounded-cache deadlock
    caveat, exploratory/Notes_mosaicScheme.txt:45-47, for free).

    Single-band inputs (band == 0 everywhere) group by tile_id alone — a
    one-key sort is measurably cheaper and the grouping is identical."""
    fn = make_assemble_fn(
        grid.nullval, grid.dtype, merge, windows_encoded, tile_codec,
        emit_partials,
    )
    keys = ["tile_id", "band"] if multiband else "tile_id"
    return windows_ds.groupby(keys).map_groups(fn, batch_format="pyarrow")


# stage-1 output of the salted merge: a full TILE row + the salt rank, so
# singleton groups (cold tiles) pass through stage 2 without any decode,
# stats, or re-encode work.
PARTIAL_SCHEMA = pa.schema(
    [pa.field("salt", pa.int32())] + list(TILE_SCHEMA)
)


def assemble_tiles_salted(
    windows_ds: "ray.data.Dataset",
    grid: OutputGrid,
    merge: str = "last",
    window_codec: str | None = None,
    tile_codec: str | None = None,
    multiband: bool = True,
) -> "ray.data.Dataset":
    """Two-level merge for skewed tiles (SURVEY.md §4.2 salting plan).

    Stage 1 groups by (tile_id, salt) and merges each contiguous seq range
    into a partial full-tile canvas — hot tiles merge their inputs in
    parallel across salts. Stage 2 groups by tile_id and overlays partial
    canvases in salt order; because salts are contiguous seq ranges,
    last-non-null over partials == last-non-null over the original sequence
    (associativity over ordered partitions). Unsalted tiles (salt 0 only)
    pass through stage 2 as singleton groups.

    Only valid for ``merge == "last"`` — feather is a weighted sum and would
    need num/den partials instead.
    """
    if merge != "last":
        raise ValueError("salted assembly only supports the 'last' merge kernel")
    lineage_cap = LINEAGE_CAP
    np_dtype = np.dtype(grid.dtype)
    nv = grid.nullval if _is_nan_null(grid.nullval) else np_dtype.type(grid.nullval)
    encoded = window_codec is not None

    def partial_merge(group: pa.Table) -> pa.Table:
        seq = group["seq"].to_numpy()
        order = np.argsort(seq, kind="stable")
        ysize = int(group["out_ysize"][0].as_py())
        xsize = int(group["out_xsize"][0].as_py())
        canvas = np.full((ysize, xsize), nv, dtype=np_dtype)
        _merge_last(group, order, canvas, nv, encoded)
        input_ids = [group["image_id"][int(i)].as_py() for i in order]
        # full tile row incl. stats + tile-codec payload: cold tiles (one
        # salt) need NO further work in stage 2
        nonnull, px_sum, px_ssq, px_min, px_max = _canvas_stats(canvas, nv)
        payload, codec_tag = encode_payload(canvas, tile_codec)
        return pa.Table.from_pydict(
            {
                "salt": [group["salt"][0].as_py()],
                "tile_id": [group["tile_id"][0].as_py()],
                "band": [group["band"][0].as_py()],
                "out_top": [group["out_top"][0].as_py()],
                "out_left": [group["out_left"][0].as_py()],
                "out_xsize": [xsize],
                "out_ysize": [ysize],
                "n_inputs": [len(input_ids)],
                "input_ids": [_cap_lineage(input_ids, lineage_cap)],
                "nonnull_count": [nonnull],
                "px_sum": [px_sum],
                "px_ssq": [px_ssq],
                "px_min": [px_min],
                "px_max": [px_max],
                "pixels_codec": [codec_tag],
                "pixels": [payload],
            },
            schema=PARTIAL_SCHEMA,
        )

    def final_merge(group: pa.Table) -> pa.Table:
        if group.num_rows == 1:
            # cold tile: stage-1 already produced the finished TILE row
            return group.drop_columns(["salt"])
        salts = group["salt"].to_numpy()
        order = np.argsort(salts, kind="stable")
        ysize = int(group["out_ysize"][0].as_py())
        xsize = int(group["out_xsize"][0].as_py())
        canvas = np.full((ysize, xsize), nv, dtype=np_dtype)
        codecs_col = group["pixels_codec"].to_pylist()
        input_ids: list[str] = []
        for i in order:
            i = int(i)
            part = decode_payload(
                group["pixels"][i].as_buffer(), codecs_col[i], np_dtype
            ).reshape(ysize, xsize)
            np.copyto(canvas, part, where=_nonnull_mask(part, nv))
            input_ids.extend(group["input_ids"][i].as_py())
        nonnull, px_sum, px_ssq, px_min, px_max = _canvas_stats(canvas, nv)
        payload, codec_tag = encode_payload(canvas, tile_codec)
        # exact input count from the partial rows (their lists may be capped)
        n_in = int(pa.compute.sum(group["n_inputs"]).as_py() or 0)
        return pa.Table.from_pydict(
            {
                "tile_id": [group["tile_id"][0].as_py()],
                "band": [group["band"][0].as_py()],
                "out_top": [group["out_top"][0].as_py()],
                "out_left": [group["out_left"][0].as_py()],
                "out_xsize": [xsize],
                "out_ysize": [ysize],
                "n_inputs": [n_in],
                "input_ids": [_cap_lineage(input_ids, lineage_cap)],
                "nonnull_count": [nonnull],
                "px_sum": [px_sum],
                "px_ssq": [px_ssq],
                "px_min": [px_min],
                "px_max": [px_max],
                "pixels_codec": [codec_tag],
                "pixels": [payload],
            },
            schema=TILE_SCHEMA,
        )

    k1 = ["tile_id", "band", "salt"] if multiband else ["tile_id", "salt"]
    k2 = ["tile_id", "band"] if multiband else "tile_id"
    partials = windows_ds.groupby(k1).map_groups(
        partial_merge, batch_format="pyarrow"
    )
    return partials.groupby(k2).map_groups(final_merge, batch_format="pyarrow")


# salted-nearest stage-1 rows: a full TILE row + salt + the zlib-packed
# per-pixel best-distance canvas (order-free partial — min over salts
# reconstructs the global per-pixel argmin exactly).
NEAREST_PARTIAL_SCHEMA = pa.schema(
    [pa.field("salt", pa.int32())]
    + list(TILE_SCHEMA)
    + [pa.field("best", pa.binary())]
)


def assemble_tiles_salted_nearest(
    windows_ds: "ray.data.Dataset",
    grid: OutputGrid,
    window_codec: str | None = None,
    tile_codec: str | None = None,
    multiband: bool = True,
) -> "ray.data.Dataset":
    """Two-level nearest-center merge for skewed tiles. Unlike 'last',
    nearest partials are ORDER-FREE (per-pixel min over squared center
    distance is associative+commutative), so any salt assignment works;
    we keep the contiguous-seq salts the planner already computed. Stage 1
    merges each salt into (canvas, best-dist) and ships best as a packed
    float64 plane; stage 2 overlays partials in salt order with ``<=`` so
    the later seq range wins exact ties — identical tie behavior to the
    single-level kernel. Cold tiles (one salt) skip stage-2 work entirely."""
    lineage_cap = LINEAGE_CAP
    np_dtype = np.dtype(grid.dtype)
    nv = grid.nullval if _is_nan_null(grid.nullval) else np_dtype.type(grid.nullval)
    encoded = window_codec is not None

    def partial_merge(group: pa.Table) -> pa.Table:
        seq = group["seq"].to_numpy()
        order = np.argsort(seq, kind="stable")
        ysize = int(group["out_ysize"][0].as_py())
        xsize = int(group["out_xsize"][0].as_py())
        canvas = np.full((ysize, xsize), nv, dtype=np_dtype)
        best = _merge_nearest(group, order, canvas, nv, encoded)
        input_ids = [group["image_id"][int(i)].as_py() for i in order]
        nonnull, px_sum, px_ssq, px_min, px_max = _canvas_stats(canvas, nv)
        payload, codec_tag = encode_payload(canvas, tile_codec)
        return pa.Table.from_pydict(
            {
                "salt": [group["salt"][0].as_py()],
                "tile_id": [group["tile_id"][0].as_py()],
                "band": [group["band"][0].as_py()],
                "out_top": [group["out_top"][0].as_py()],
                "out_left": [group["out_left"][0].as_py()],
                "out_xsize": [xsize],
                "out_ysize": [ysize],
                "n_inputs": [len(input_ids)],
                "input_ids": [_cap_lineage(input_ids, lineage_cap)],
                "nonnull_count": [nonnull],
                "px_sum": [px_sum],
                "px_ssq": [px_ssq],
                "px_min": [px_min],
                "px_max": [px_max],
                "pixels_codec": [codec_tag],
                "pixels": [payload],
                # inf packs fine through zlib/float64
                "best": [_pack_partial(best)],
            },
            schema=NEAREST_PARTIAL_SCHEMA,
        )

    def final_merge(group: pa.Table) -> pa.Table:
        if group.num_rows == 1:
            return group.drop_columns(["salt", "best"])
        salts = group["salt"].to_numpy()
        order = np.argsort(salts, kind="stable")
        ysize = int(group["out_ysize"][0].as_py())
        xsize = int(group["out_xsize"][0].as_py())
        canvas = np.full((ysize, xsize), nv, dtype=np_dtype)
        best = np.full((ysize, xsize), np.inf, dtype=np.float64)
        codecs_col = group["pixels_codec"].to_pylist()
        input_ids: list[str] = []
        for i in order:
            i = int(i)
            part = decode_payload(
                group["pixels"][i].as_buffer(), codecs_col[i], np_dtype
            ).reshape(ysize, xsize)
            pbest = _unpack_partial(group["best"][i].as_buffer(), ysize, xsize)
            take = _nonnull_mask(part, nv) & (pbest <= best)
            np.copyto(canvas, part, where=take)
            np.copyto(best, pbest, where=take)
            input_ids.extend(group["input_ids"][i].as_py())
        nonnull, px_sum, px_ssq, px_min, px_max = _canvas_stats(canvas, nv)
        payload, codec_tag = encode_payload(canvas, tile_codec)
        n_in = int(pa.compute.sum(group["n_inputs"]).as_py() or 0)
        return pa.Table.from_pydict(
            {
                "tile_id": [group["tile_id"][0].as_py()],
                "band": [group["band"][0].as_py()],
                "out_top": [group["out_top"][0].as_py()],
                "out_left": [group["out_left"][0].as_py()],
                "out_xsize": [xsize],
                "out_ysize": [ysize],
                "n_inputs": [n_in],
                "input_ids": [_cap_lineage(input_ids, lineage_cap)],
                "nonnull_count": [nonnull],
                "px_sum": [px_sum],
                "px_ssq": [px_ssq],
                "px_min": [px_min],
                "px_max": [px_max],
                "pixels_codec": [codec_tag],
                "pixels": [payload],
            },
            schema=TILE_SCHEMA,
        )

    k1 = ["tile_id", "band", "salt"] if multiband else ["tile_id", "salt"]
    k2 = ["tile_id", "band"] if multiband else "tile_id"
    partials = windows_ds.groupby(k1).map_groups(
        partial_merge, batch_format="pyarrow"
    )
    return partials.groupby(k2).map_groups(final_merge, batch_format="pyarrow")


FEATHER_PARTIAL_SCHEMA = pa.schema(
    [
        ("tile_id", pa.int64()),
        ("band", pa.int32()),
        ("salt", pa.int32()),
        ("out_top", pa.int32()),
        ("out_left", pa.int32()),
        ("out_xsize", pa.int32()),
        ("out_ysize", pa.int32()),
        ("n_inputs", pa.int64()),  # exact count (input_ids may be capped)
        ("input_ids", pa.list_(pa.string())),
        ("num", pa.binary()),  # zlib(float64 C-order)
        ("den", pa.binary()),
    ]
)


def make_feather_partial_fn(grid: OutputGrid, window_codec: str | None,
                            uniform: bool = False):
    """map_groups fn: one (tile[, band, salt]) window group -> one
    FEATHER_PARTIAL_SCHEMA row of zlib(float64) num/den sums. ``uniform``
    = unit weights (sum/count), the salted path of merge='mean'."""
    lineage_cap = LINEAGE_CAP
    np_dtype = np.dtype(grid.dtype)
    nv = grid.nullval if _is_nan_null(grid.nullval) else np_dtype.type(grid.nullval)
    encoded = window_codec is not None

    def partial(group: pa.Table) -> pa.Table:
        seq = group["seq"].to_numpy()
        order = np.argsort(seq, kind="stable")
        ysize = int(group["out_ysize"][0].as_py())
        xsize = int(group["out_xsize"][0].as_py())
        num = np.zeros((ysize, xsize), dtype=np.float64)
        den = np.zeros((ysize, xsize), dtype=np.float64)
        _accum_feather(group, order, num, den, np_dtype, nv, encoded,
                       uniform=uniform)
        input_ids = [group["image_id"][int(i)].as_py() for i in order]
        return pa.Table.from_pydict(
            {
                "tile_id": [group["tile_id"][0].as_py()],
                "band": [group["band"][0].as_py()],
                "salt": [group["salt"][0].as_py()],
                "out_top": [group["out_top"][0].as_py()],
                "out_left": [group["out_left"][0].as_py()],
                "out_xsize": [xsize],
                "out_ysize": [ysize],
                "n_inputs": [len(input_ids)],
                "input_ids": [_cap_lineage(input_ids, lineage_cap)],
                "num": [_pack_partial(num)],
                "den": [_pack_partial(den)],
            },
            schema=FEATHER_PARTIAL_SCHEMA,
        )

    return partial


def make_feather_final_fn(grid: OutputGrid, tile_codec: str | None,
                          emit_partials: bool = False):
    """map_groups fn: FEATHER_PARTIAL rows of one (tile[, band]) -> the
    blended TILE row (salt-ordered partial sum, so regrouping is
    deterministic). With ``emit_partials`` the summed num/den ride the tile
    row (TILE_SCHEMA_PARTIALS) for later incremental feather updates."""
    lineage_cap = LINEAGE_CAP
    np_dtype = np.dtype(grid.dtype)
    nv = grid.nullval if _is_nan_null(grid.nullval) else np_dtype.type(grid.nullval)

    def final(group: pa.Table) -> pa.Table:
        ysize = int(group["out_ysize"][0].as_py())
        xsize = int(group["out_xsize"][0].as_py())
        num = np.zeros((ysize, xsize), dtype=np.float64)
        den = np.zeros((ysize, xsize), dtype=np.float64)
        input_ids: list[str] = []
        salts = group["salt"].to_numpy()
        for i in np.argsort(salts, kind="stable"):
            i = int(i)
            num += _unpack_partial(group["num"][i].as_py(), ysize, xsize)
            den += _unpack_partial(group["den"][i].as_py(), ysize, xsize)
            input_ids.extend(group["input_ids"][i].as_py())
        canvas = np.empty((ysize, xsize), dtype=np_dtype)
        _blend_feather(num, den, canvas, nv)
        nonnull, px_sum, px_ssq, px_min, px_max = _canvas_stats(canvas, nv)
        payload, codec_tag = encode_payload(canvas, tile_codec)
        n_in = int(pa.compute.sum(group["n_inputs"]).as_py() or 0)
        cols = {
            "tile_id": [group["tile_id"][0].as_py()],
            "band": [group["band"][0].as_py()],
            "out_top": [group["out_top"][0].as_py()],
            "out_left": [group["out_left"][0].as_py()],
            "out_xsize": [xsize],
            "out_ysize": [ysize],
            "n_inputs": [n_in],
            "input_ids": [_cap_lineage(input_ids, lineage_cap)],
            "nonnull_count": [nonnull],
            "px_sum": [px_sum],
            "px_ssq": [px_ssq],
            "px_min": [px_min],
            "px_max": [px_max],
            "pixels_codec": [codec_tag],
            "pixels": [payload],
        }
        if emit_partials:
            cols["num"] = [_pack_partial(num)]
            cols["den"] = [_pack_partial(den)]
            return pa.Table.from_pydict(cols, schema=TILE_SCHEMA_PARTIALS)
        return pa.Table.from_pydict(cols, schema=TILE_SCHEMA)

    return final


def assemble_tiles_salted_feather(
    windows_ds: "ray.data.Dataset",
    grid: OutputGrid,
    window_codec: str | None = None,
    tile_codec: str | None = None,
    multiband: bool = True,
    emit_partials: bool = False,
    uniform: bool = False,
) -> "ray.data.Dataset":
    """Salted two-level FEATHER merge. The blend is a weighted sum, so
    partials are (num, den) float64 canvases summed in any order — salting
    needs no seq-contiguity here (unlike last-non-null). Partials are
    zlib-compressed for the second shuffle. ``uniform=True`` is the salted
    path of merge='mean' (unit weights: num/den = sum/count)."""
    partial = make_feather_partial_fn(grid, window_codec, uniform=uniform)
    final = make_feather_final_fn(grid, tile_codec, emit_partials)
    k1 = ["tile_id", "band", "salt"] if multiband else ["tile_id", "salt"]
    k2 = ["tile_id", "band"] if multiband else "tile_id"
    partials = windows_ds.groupby(k1).map_groups(
        partial, batch_format="pyarrow"
    )
    return partials.groupby(k2).map_groups(final, batch_format="pyarrow")


def make_extreme_partial_fn(grid: OutputGrid, window_codec: str | None,
                            kind: str):
    """map_groups fn: one (tile[, band, salt]) window group -> one
    FEATHER_PARTIAL_SCHEMA row where ``num`` is the per-pixel running
    max/min over the group's windows and ``den`` the has-contribution
    mask — per-pixel extremes are order-free AND mergeable, so salting
    needs no seq-contiguity (unlike last-non-null)."""
    lineage_cap = LINEAGE_CAP
    np_dtype = np.dtype(grid.dtype)
    nv = (grid.nullval if _is_nan_null(grid.nullval)
          else np_dtype.type(grid.nullval))
    encoded = window_codec is not None
    reduce2 = np.fmax if kind == "max" else np.fmin

    def partial(group: pa.Table) -> pa.Table:
        ysize = int(group["out_ysize"][0].as_py())
        xsize = int(group["out_xsize"][0].as_py())
        run = np.full((ysize, xsize), np.nan, dtype=np.float64)
        views = _binary_views(group["pixels"], np_dtype, encoded)
        dst_top = group["dst_top"].to_numpy()
        dst_left = group["dst_left"].to_numpy()
        win_h = group["win_h"].to_numpy()
        win_w = group["win_w"].to_numpy()
        for i in range(group.num_rows):
            h, w = int(win_h[i]), int(win_w[i])
            win = views[i].reshape(h, w)
            sub = run[dst_top[i]: dst_top[i] + h,
                      dst_left[i]: dst_left[i] + w]
            mask = _nonnull_mask(win, nv)
            # fmax/fmin ignore NaN: first contribution just lands
            sub[mask] = reduce2(sub[mask], win.astype(np.float64)[mask])
        has = ~np.isnan(run)
        input_ids = group["image_id"].to_pylist()
        return pa.Table.from_pydict(
            {
                "tile_id": [group["tile_id"][0].as_py()],
                "band": [group["band"][0].as_py()],
                "salt": [group["salt"][0].as_py()],
                "out_top": [group["out_top"][0].as_py()],
                "out_left": [group["out_left"][0].as_py()],
                "out_xsize": [xsize],
                "out_ysize": [ysize],
                "n_inputs": [len(input_ids)],
                "input_ids": [_cap_lineage(sorted(input_ids), lineage_cap)],
                "num": [_pack_partial(np.where(has, run, 0.0))],
                "den": [_pack_partial(has.astype(np.float64))],
            },
            schema=FEATHER_PARTIAL_SCHEMA,
        )

    return partial


def make_extreme_final_fn(grid: OutputGrid, tile_codec: str | None,
                          kind: str):
    """map_groups fn: merge the per-salt extreme partials (order-free
    fmax/fmin) and finalize through the shared blend (den=1 where any
    contribution makes num/den the extreme itself)."""
    lineage_cap = LINEAGE_CAP
    np_dtype = np.dtype(grid.dtype)
    nv = (grid.nullval if _is_nan_null(grid.nullval)
          else np_dtype.type(grid.nullval))
    reduce2 = np.fmax if kind == "max" else np.fmin

    def final(group: pa.Table) -> pa.Table:
        ysize = int(group["out_ysize"][0].as_py())
        xsize = int(group["out_xsize"][0].as_py())
        run = np.full((ysize, xsize), np.nan, dtype=np.float64)
        input_ids: list[str] = []
        salts = group["salt"].to_numpy()
        for i in np.argsort(salts, kind="stable"):
            i = int(i)
            val = _unpack_partial(group["num"][i].as_py(), ysize, xsize)
            has = _unpack_partial(group["den"][i].as_py(), ysize, xsize) > 0
            run = reduce2(run, np.where(has, val, np.nan))
            input_ids.extend(group["input_ids"][i].as_py())
        has_any = ~np.isnan(run)
        canvas = np.empty((ysize, xsize), dtype=np_dtype)
        _blend_feather(np.where(has_any, run, 0.0),
                       has_any.astype(np.float64), canvas, nv)
        nonnull, px_sum, px_ssq, px_min, px_max = _canvas_stats(canvas, nv)
        payload, codec_tag = encode_payload(canvas, tile_codec)
        n_in = int(pa.compute.sum(group["n_inputs"]).as_py() or 0)
        return pa.Table.from_pydict(
            {
                "tile_id": [group["tile_id"][0].as_py()],
                "band": [group["band"][0].as_py()],
                "out_top": [group["out_top"][0].as_py()],
                "out_left": [group["out_left"][0].as_py()],
                "out_xsize": [xsize],
                "out_ysize": [ysize],
                "n_inputs": [n_in],
                "input_ids": [_cap_lineage(input_ids, lineage_cap)],
                "nonnull_count": [nonnull],
                "px_sum": [px_sum],
                "px_ssq": [px_ssq],
                "px_min": [px_min],
                "px_max": [px_max],
                "pixels_codec": [codec_tag],
                "pixels": [payload],
            },
            schema=TILE_SCHEMA,
        )

    return final


def assemble_tiles_salted_extreme(
    windows_ds: "ray.data.Dataset",
    grid: OutputGrid,
    kind: str,
    window_codec: str | None = None,
    tile_codec: str | None = None,
    multiband: bool = True,
) -> "ray.data.Dataset":
    """Salted two-level MAX/MIN merge: per-pixel extremes are mergeable
    from disjoint partials (unlike median), so hot tiles split across
    salts exactly like feather/mean."""
    partial = make_extreme_partial_fn(grid, window_codec, kind)
    final = make_extreme_final_fn(grid, tile_codec, kind)
    k1 = ["tile_id", "band", "salt"] if multiband else ["tile_id", "salt"]
    k2 = ["tile_id", "band"] if multiband else "tile_id"
    partials = windows_ds.groupby(k1).map_groups(
        partial, batch_format="pyarrow"
    )
    return partials.groupby(k2).map_groups(final, batch_format="pyarrow")


def empty_tiles_table(
    grid: OutputGrid,
    tile_ids: list[int],
    tile_codec: str | None = None,
    bands: list[int] | None = None,
    pairs: list[tuple[int, int]] | None = None,
    emit_partials: bool = False,
) -> pa.Table:
    """All-null tiles for blocks intersecting no input (ref mosaic.py:351-359).

    Pixels for empty tiles are synthesized, not stored per-pixel at the call
    site — the canvas is materialized here per tile. ``pairs`` (explicit
    (tile_id, band) list) overrides the tile_ids × bands product — the
    resume path re-emits only uncommitted (tile, band) keys (round-1 ADVICE:
    a kill between two partitions of one empty tile's bands must not drop
    the uncommitted band). ``emit_partials`` adds all-zero feather num/den
    (an empty tile has no weighted contributions) so a feather-partials
    output keeps one uniform tile schema."""
    np_dtype = np.dtype(grid.dtype)
    schema = TILE_SCHEMA_PARTIALS if emit_partials else TILE_SCHEMA
    rows = {n: [] for n in schema.names}
    if pairs is None:
        pairs = [(t, b) for t in tile_ids for b in (bands or [0])]
    for tid, band in pairs:
        block = grid.block_for_tile(tid)
        canvas = np.full((block.ysize, block.xsize), grid.nullval, dtype=np_dtype)
        rows["tile_id"].append(tid)
        rows["band"].append(band)
        rows["out_top"].append(block.top)
        rows["out_left"].append(block.left)
        rows["out_xsize"].append(block.xsize)
        rows["out_ysize"].append(block.ysize)
        rows["n_inputs"].append(0)
        rows["input_ids"].append([])
        rows["nonnull_count"].append(0)
        rows["px_sum"].append(0.0)
        rows["px_ssq"].append(0.0)
        rows["px_min"].append(None)
        rows["px_max"].append(None)
        payload, codec_tag = encode_payload(canvas, tile_codec)
        rows["pixels_codec"].append(codec_tag)
        rows["pixels"].append(payload)
        if emit_partials:
            zeros = _pack_partial(
                np.zeros((block.ysize, block.xsize), dtype=np.float64)
            )
            rows["num"].append(zeros)
            rows["den"].append(zeros)
    return pa.Table.from_pydict(rows, schema=schema)


def empty_tiles_ds(
    grid: OutputGrid,
    assigned_ids,
    committed: set | None,
    bands: list[int] | None,
    tile_codec: str | None = None,
    emit_partials: bool = False,
) -> "ray.data.Dataset":
    """Distributed all-null-tile synthesis: the anti-join replacement for the
    former O(num_tiles) driver loop (round-1 verdict fix).

    ``ray.data.range(num_tiles)`` streams tile ids in blocks; each task
    filters against the broadcast assigned-id array (np.isin on a sorted
    int64 array — O(assigned) bytes shipped once via ray.put, never per
    batch) and the committed (tile_id, band) resume keys, then materializes
    canvases for its own slice only. No canvas ever exists on the driver."""
    assigned_arr = np.sort(np.fromiter(assigned_ids, dtype=np.int64))
    a_ref = ray.put(assigned_arr)
    c_ref = ray.put(_pack_committed(committed))
    grid_ref = ray.put(grid)
    band_list = bands or [0]

    def gen(batch: pa.Table) -> pa.Table:
        g: OutputGrid = ray.get(grid_ref)
        assigned = ray.get(a_ref)
        done = ray.get(c_ref)
        tids = batch["id"].to_numpy()
        missing = tids[~np.isin(tids, assigned)]
        pairs = _uncommitted_pairs(missing, band_list, done)
        return empty_tiles_table(
            g, [], tile_codec, pairs=pairs, emit_partials=emit_partials
        )

    return ray.data.range(grid.num_tiles).map_batches(
        gen, batch_format="pyarrow"
    )


def _pack_committed(committed: set | None) -> np.ndarray:
    """(tile_id, band) keys packed into one sorted int64 array — the same
    vectorized resume-filter representation the main pipeline uses
    (pipelines/mosaic.py drop_committed), so membership is one np.isin."""
    if not committed:
        return np.empty(0, dtype=np.int64)
    return np.sort(
        np.array([(t << 20) | b for t, b in committed], dtype=np.int64)
    )


def _uncommitted_pairs(
    tids: np.ndarray, band_list: list[int], done_packed: np.ndarray
) -> list[tuple[int, int]]:
    """(tile, band) cross product minus committed keys, fully vectorized."""
    if len(tids) == 0:
        return []
    t = np.repeat(tids.astype(np.int64), len(band_list))
    b = np.tile(np.asarray(band_list, dtype=np.int64), len(tids))
    keep = ~np.isin((t << 20) | b, done_packed)
    return list(zip(t[keep].tolist(), b[keep].tolist()))


def empty_tiles_ds_from_assigned(
    grid: OutputGrid,
    assigned_ds: "ray.data.Dataset",
    committed: set | None,
    bands: list[int] | None,
    tile_codec: str | None = None,
    bucket_size: int = 4096,
    emit_partials: bool = False,
) -> "ray.data.Dataset":
    """Fully-distributed all-null-tile synthesis: the anti-join runs as a
    bucket groupby against a DATASET of assigned tile ids — no driver-side
    assigned set, no broadcast id array (round-2 verdict: the broadcast
    array is O(assigned tiles) driver memory, several GB at the ~10^8-tile
    grids a 100 TB mosaic implies).

    Shuffle volume is num_assigned + num_buckets int rows: every tile id
    maps to bucket = tile_id // bucket_size; a seed row per bucket (from
    ``ray.data.range``) guarantees all-empty buckets still form a group;
    each group knows its bucket's full id range statically and emits the
    set difference as null canvases. Canvases only ever exist inside the
    group task."""
    c_ref = ray.put(_pack_committed(committed))
    grid_ref = ray.put(grid)
    band_list = bands or [0]
    num_tiles = grid.num_tiles
    n_buckets = -(-num_tiles // bucket_size)

    def mark_assigned(batch: pa.Table) -> pa.Table:
        tids = batch["tile_id"].to_numpy().astype(np.int64)
        return pa.table(
            {
                "bucket": pa.array(tids // bucket_size, pa.int64()),
                "tile_id": pa.array(tids, pa.int64()),
            }
        )

    def seed(batch: pa.Table) -> pa.Table:
        ids = batch["id"].to_numpy().astype(np.int64)
        return pa.table(
            {
                "bucket": pa.array(ids, pa.int64()),
                "tile_id": pa.array(np.full(len(ids), -1), pa.int64()),
            }
        )

    marked = assigned_ds.map_batches(mark_assigned, batch_format="pyarrow")
    seeds = ray.data.range(n_buckets).map_batches(seed, batch_format="pyarrow")

    def gen(group: pa.Table) -> pa.Table:
        g: OutputGrid = ray.get(grid_ref)
        done = ray.get(c_ref)
        bucket = int(group["bucket"][0].as_py())
        lo = bucket * bucket_size
        hi = min(lo + bucket_size, num_tiles)
        tids = group["tile_id"].to_numpy()
        assigned = tids[tids >= 0]
        missing = np.setdiff1d(
            np.arange(lo, hi, dtype=np.int64), assigned, assume_unique=False
        )
        pairs = _uncommitted_pairs(missing, band_list, done)
        return empty_tiles_table(
            g, [], tile_codec, pairs=pairs, emit_partials=emit_partials
        )

    return (
        marked.union(seeds)
        .groupby("bucket")
        .map_groups(gen, batch_format="pyarrow")
    )


def overview_dims(grid: OutputGrid, lvl: int) -> tuple[int, int]:
    """Overview raster size: ceil(size/lvl) (GDAL convention)."""
    return ((grid.nrows + lvl - 1) // lvl, (grid.ncols + lvl - 1) // lvl)


def make_pyramid_fn(grid: OutputGrid, levels: list[int], dtype: str):
    np_dtype = np.dtype(dtype)
    dims = {lvl: overview_dims(grid, lvl) for lvl in levels}

    def pyramids(batch: pa.Table) -> pa.Table:
        rows = {n: [] for n in PYRAMID_SCHEMA.names}
        codec_col = batch["pixels_codec"].to_pylist()
        for i in range(batch.num_rows):
            top = batch["out_top"][i].as_py()
            left = batch["out_left"][i].as_py()
            ys = batch["out_ysize"][i].as_py()
            xs = batch["out_xsize"][i].as_py()
            codec = codec_col[i]
            arr = decode_payload(
                batch["pixels"][i].as_buffer(), codec, np_dtype
            ).reshape(ys, xs)
            out_codec = codec if codec != "raw" else None
            for lvl in levels:
                o = lvl // 2  # ref mosaic.py:731-734
                sub = arr[o::lvl, o::lvl]
                yoff, xoff = top // lvl, left // lvl
                ov_r, ov_c = dims[lvl]
                sub = sub[: max(ov_r - yoff, 0), : max(ov_c - xoff, 0)]
                if sub.size == 0:
                    continue
                payload, codec_tag = encode_payload(
                    np.ascontiguousarray(sub), out_codec
                )
                rows["level"].append(lvl)
                rows["tile_id"].append(batch["tile_id"][i].as_py())
                rows["band"].append(batch["band"][i].as_py())
                rows["yoff"].append(yoff)
                rows["xoff"].append(xoff)
                rows["h"].append(sub.shape[0])
                rows["w"].append(sub.shape[1])
                rows["pixels_codec"].append(codec_tag)
                rows["pixels"].append(payload)
        return pa.Table.from_pydict(rows, schema=PYRAMID_SCHEMA)

    return pyramids


def build_pyramids(
    tiles_ds: "ray.data.Dataset", grid: OutputGrid, min_overview_size: int = 1024
) -> "ray.data.Dataset":
    levels = grid.overview_levels(min_overview_size)
    if not levels:
        return None
    return tiles_ds.map_batches(
        make_pyramid_fn(grid, levels, grid.dtype),
        batch_format="pyarrow",
        batch_size=4,
    )
