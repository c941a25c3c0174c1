"""Band statistics as a native Ray Data partial+final aggregation.

Bit-identical float64 math to the reference's StatsAccumulator
(ref /root/reference/moamosaic/mosaic.py:746-794): mask nullval (int or NaN),
accumulate sum/ssq/count/min/max per block, merge partials, finalize
mean = sum/count, stddev = sqrt(ssq/count - mean², clamped >= 0).

Shaped as a Ray ``AggregateFn`` so the accumulate runs where the tiles are
(no pixel bytes move to the driver) and only tiny partial tuples shuffle.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
from ray.data.aggregate import AggregateFn


def _accumulate_array(acc, values: np.ndarray):
    s, ssq, count, minval, maxval = acc
    if values.size == 0:
        return acc
    v64 = values.astype(np.float64)
    s += v64.sum()
    ssq += (v64 ** 2).sum()
    count += values.size
    mn = values.min()
    mx = values.max()
    minval = mn if minval is None else min(minval, mn)
    maxval = mx if maxval is None else max(maxval, mx)
    return (s, ssq, count, minval, maxval)


def tile_stats_agg(nullval: float, dtype: str, pixels_col: str = "pixels") -> AggregateFn:
    np_dtype = np.dtype(dtype)

    def accumulate_block(acc, block: pa.Table):
        from .assemble import decode_payload

        codecs_col = (
            block["pixels_codec"].to_pylist()
            if "pixels_codec" in block.schema.names
            else ["raw"] * block.num_rows
        )
        for i in range(block.num_rows):
            arr = decode_payload(
                block[pixels_col][i].as_buffer(), codecs_col[i], np_dtype
            )
            if nullval is None:
                values = arr
            elif np.isnan(nullval):
                values = arr[~np.isnan(arr)]
            else:
                values = arr[arr != np_dtype.type(nullval)]
            acc = _accumulate_array(acc, values)
        return acc

    def merge(a, b):
        s = a[0] + b[0]
        ssq = a[1] + b[1]
        count = a[2] + b[2]
        mins = [m for m in (a[3], b[3]) if m is not None]
        maxs = [m for m in (a[4], b[4]) if m is not None]
        return (s, ssq, count, min(mins) if mins else None,
                max(maxs) if maxs else None)

    def finalize(acc):
        s, ssq, count, minval, maxval = acc
        if count == 0:
            return {"min": None, "max": None, "mean": None,
                    "stddev": None, "count": 0}
        mean = s / count
        var = ssq / count - mean ** 2
        stddev = float(np.sqrt(var)) if var >= 0 else 0.0
        return {
            "min": float(minval),
            "max": float(maxval),
            "mean": float(mean),
            "stddev": stddev,
            "count": int(count),
        }

    return AggregateFn(
        init=lambda k: (0.0, 0.0, 0, None, None),
        merge=merge,
        accumulate_block=accumulate_block,
        finalize=finalize,
        name="band_stats",
    )


def compute_stats(tiles_ds, nullval: float, dtype: str) -> dict:
    """Run the stats aggregation over assembled tiles; returns the final
    {min,max,mean,stddev,count} dict (the STATISTICS_* band metadata of the
    reference, mosaic.py:388-393)."""
    res = tiles_ds.aggregate(tile_stats_agg(nullval, dtype))
    return res["band_stats"] if isinstance(res, dict) and "band_stats" in res else res


def stats_from_tile_columns(tiles_ds) -> dict[int, dict]:
    """Final per-band stats from the per-tile partial columns written by
    the assemble stage — a pure columnar aggregate, no pixel decode.
    Identical float64 math to StatsAccumulator.finalStats (mosaic.py:779-794,
    one accumulator per band mosaic.py:204-208)."""
    from ray.data.aggregate import Max, Min, Sum

    rows = (
        tiles_ds.groupby("band")
        .aggregate(
            Sum("px_sum"),
            Sum("px_ssq"),
            Sum("nonnull_count"),
            Min("px_min"),
            Max("px_max"),
        )
        .take_all()  # one aggregate row per band — bounded by band count
    )
    out: dict[int, dict] = {}
    for agg in rows:
        band = int(agg["band"])
        count = int(agg["sum(nonnull_count)"] or 0)
        if count == 0:
            out[band] = {"min": None, "max": None, "mean": None,
                         "stddev": None, "count": 0}
            continue
        s = float(agg["sum(px_sum)"])
        ssq = float(agg["sum(px_ssq)"])
        mean = s / count
        var = ssq / count - mean ** 2
        out[band] = {
            "min": float(agg["min(px_min)"]),
            "max": float(agg["max(px_max)"]),
            "mean": mean,
            "stddev": float(np.sqrt(var)) if var >= 0 else 0.0,
            "count": count,
        }
    if not out:
        out[0] = {"min": None, "max": None, "mean": None, "stddev": None,
                  "count": 0}
    return out
