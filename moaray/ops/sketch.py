"""Sketch aggregates: HyperLogLog distinct counting and count-min heavy
hitters, shaped as partial-aggregate pipelines (register arrays combine
inside ``map_batches``; only fixed-size sketches cross the shuffle — the
shape that makes a 100 TB DISTINCT tractable).

Both are implemented from the published algorithms (Flajolet et al. 2007
HyperLogLog with the standard bias corrections; Cormode & Muthukrishnan
2005 count-min) in vectorized numpy.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

_HLL_P = 12  # 4096 registers, ~1.6% standard error
_HLL_M = 1 << _HLL_P
_MASK64 = np.uint64(0xFFFFFFFFFFFFFFFF)


def _hash64(values: np.ndarray) -> np.ndarray:
    """Deterministic 64-bit mix (splitmix64) over int64/uint64 inputs."""
    x = values.astype(np.uint64)
    with np.errstate(over="ignore"):
        x = (x + np.uint64(0x9E3779B97F4A7C15)) & _MASK64
        x = ((x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)) & _MASK64
        x = ((x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)) & _MASK64
        return x ^ (x >> np.uint64(31))


def _hll_registers(values: np.ndarray) -> np.ndarray:
    """Build an HLL register array from raw int values."""
    h = _hash64(values)
    idx = (h >> np.uint64(64 - _HLL_P)).astype(np.int64)
    rest = (h << np.uint64(_HLL_P)) & _MASK64
    # rank = leading zeros of the remaining bits + 1 (capped)
    nz = rest != 0
    lz = np.full(len(h), 64 - _HLL_P, dtype=np.int64)
    # bit_length via log2 on the nonzero values
    lz[nz] = 63 - np.floor(np.log2(rest[nz].astype(np.float64))).astype(np.int64)
    rank = np.minimum(lz + 1, 64 - _HLL_P + 1)
    regs = np.zeros(_HLL_M, dtype=np.int8)
    np.maximum.at(regs, idx, rank.astype(np.int8))
    return regs


def _hll_estimate(regs: np.ndarray) -> float:
    """Standard HLL estimator with small-range correction."""
    m = float(_HLL_M)
    alpha = 0.7213 / (1 + 1.079 / m)
    est = alpha * m * m / np.sum(np.power(2.0, -regs.astype(np.float64)))
    zeros = int(np.count_nonzero(regs == 0))
    if est <= 2.5 * m and zeros:
        est = m * np.log(m / zeros)  # linear counting
    return float(est)


def hll_distinct(ds, value_col: str, group_col: str | None = None):
    """Approximate COUNT(DISTINCT value) [per group] via HyperLogLog.

    map_batches builds one register array per (batch, group); a groupby
    merges registers with elementwise max and finalizes. Only 4 KiB
    sketches shuffle, never values."""

    def partial(batch: pa.Table) -> pa.Table:
        vals = batch[value_col].to_numpy()
        if group_col is None:
            groups = {None: np.arange(len(vals))}
        else:
            keys = batch[group_col].to_numpy(zero_copy_only=False)
            groups = {
                k: np.where(keys == k)[0] for k in np.unique(keys)
            }
        out_k, out_r = [], []
        for k, sel in groups.items():
            out_k.append("__all__" if k is None else str(k))
            out_r.append(_hll_registers(vals[sel]).tobytes())
        return pa.table(
            {
                "group": pa.array(out_k, pa.string()),
                "regs": pa.array(out_r, pa.binary()),
            }
        )

    def merge(group: pa.Table) -> pa.Table:
        regs = np.zeros(_HLL_M, dtype=np.int8)
        for i in range(group.num_rows):
            r = np.frombuffer(group["regs"][i].as_py(), dtype=np.int8)
            np.maximum(regs, r, out=regs)
        return pa.table(
            {
                "group": [group["group"][0].as_py()],
                "approx_distinct": pa.array(
                    [int(round(_hll_estimate(regs)))], pa.int64()
                ),
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("group")
        .map_groups(merge, batch_format="pyarrow")
    )


_CM_W = 2048
_CM_D = 4


def cm_heavy_hitters(ds, value_col: str, k: int = 10):
    """Approximate top-k most frequent values via count-min + per-batch
    candidate tracking: each batch emits its sketch AND its local value
    counts (bounded to 4k candidates); the merge sums sketches, unions
    candidates, and scores each candidate by its count-min estimate."""

    def partial(batch: pa.Table) -> pa.Table:
        vals = batch[value_col].to_numpy(zero_copy_only=False)
        uniq, counts = np.unique(vals, return_counts=True)
        if len(uniq) > 4096:
            top = np.argsort(-counts)[:4096]
            uniq, counts = uniq[top], counts[top]
        sketch = np.zeros((_CM_D, _CM_W), dtype=np.int64)
        iv = uniq.astype(np.int64)
        for d in range(_CM_D):
            idx = (
                _hash64(iv + np.int64(d * 0x51_7C_C1)) % np.uint64(_CM_W)
            ).astype(np.int64)
            np.add.at(sketch[d], idx, counts)
        return pa.table(
            {
                "one": pa.array([1], pa.int32()),
                "sketch": pa.array([sketch.tobytes()], pa.binary()),
                "candidates": pa.array([iv.tolist()], pa.list_(pa.int64())),
            }
        )

    def merge(group: pa.Table) -> pa.Table:
        sketch = np.zeros((_CM_D, _CM_W), dtype=np.int64)
        cands: set[int] = set()
        for i in range(group.num_rows):
            sketch += np.frombuffer(
                group["sketch"][i].as_py(), dtype=np.int64
            ).reshape(_CM_D, _CM_W)
            cands.update(group["candidates"][i].as_py())
        cand = np.array(sorted(cands), dtype=np.int64)
        est = np.full(len(cand), np.iinfo(np.int64).max, dtype=np.int64)
        for d in range(_CM_D):
            idx = (
                _hash64(cand + np.int64(d * 0x51_7C_C1)) % np.uint64(_CM_W)
            ).astype(np.int64)
            est = np.minimum(est, sketch[d, idx])
        order = np.lexsort((cand, -est))[:k]
        return pa.table(
            {
                "value": pa.array(cand[order], pa.int64()),
                "approx_count": pa.array(est[order], pa.int64()),
                "rank": pa.array(np.arange(1, len(order) + 1), pa.int64()),
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("one")
        .map_groups(merge, batch_format="pyarrow")
    )


# ---------------------------------------------------------------------------
# Mergeable weighted-sample quantile sketch (GK/KLL-style compaction)
# ---------------------------------------------------------------------------

def _compact(vals: np.ndarray, wgts: np.ndarray, k: int):
    """Compact a weighted sample to <= k points, preserving ranks: sort,
    then pick the value at each of k evenly-spaced weighted ranks, giving
    each survivor the weight of its rank slice. Deterministic (no RNG)."""
    order = np.argsort(vals, kind="stable")
    v, w = vals[order], wgts[order].astype(np.float64)
    if len(v) <= k:
        return v, w
    cw = np.cumsum(w)
    total = cw[-1]
    # slice boundaries at ranks total*i/k; survivor = value covering the
    # slice midpoint
    mids = (np.arange(k) + 0.5) * total / k
    idx = np.searchsorted(cw, mids, side="left")
    idx = np.clip(idx, 0, len(v) - 1)
    out_w = np.full(k, total / k)
    return v[idx], out_w


def quantile_sketch(ds, value_col: str, qs=(0.5, 0.9, 0.99), k: int = 2048):
    """Approximate quantiles via a mergeable weighted-sample sketch.

    Per batch: sort + rank-compact to <= k weighted points (the
    GK/KLL-style compaction); only (k values + k weights) cross the
    shuffle per batch. A single-group merge concatenates, re-compacts and
    answers the quantile queries by weighted rank. Deterministic (no
    sampling RNG); error ~ O(1/k) in rank. ``events_median_value`` is the
    exact in-driver anchor for q=0.5."""

    def partial(batch: pa.Table) -> pa.Table:
        v = batch[value_col].to_numpy().astype(np.float64)
        v = v[~np.isnan(v)]
        if len(v) == 0:
            return pa.table(
                {"vals": pa.array([], pa.binary()),
                 "wgts": pa.array([], pa.binary()),
                 "one": pa.array([], pa.int32())}
            )
        cv, cw = _compact(v, np.ones(len(v)), k)
        return pa.table(
            {
                "vals": pa.array([cv.tobytes()], pa.binary()),
                "wgts": pa.array([cw.tobytes()], pa.binary()),
                "one": pa.array([1], pa.int32()),
            }
        )

    def merge(group: pa.Table) -> pa.Table:
        vs, ws = [], []
        for i in range(group.num_rows):
            vs.append(np.frombuffer(group["vals"][i].as_py(), np.float64))
            ws.append(np.frombuffer(group["wgts"][i].as_py(), np.float64))
        v = np.concatenate(vs)
        w = np.concatenate(ws)
        cv, cw = _compact(v, w, k)
        order = np.argsort(cv, kind="stable")
        cv, cw = cv[order], cw[order]
        cum = np.cumsum(cw)
        total = cum[-1]
        out_q, out_v = [], []
        for q in qs:
            pos = int(np.searchsorted(cum, q * total, side="left"))
            out_q.append(float(q))
            out_v.append(float(cv[min(pos, len(cv) - 1)]))
        return pa.table(
            {
                "q": pa.array(out_q, pa.float64()),
                "value": pa.array(out_v, pa.float64()),
            }
        )

    return (
        ds.select_columns([value_col])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("one")
        .map_groups(merge, batch_format="pyarrow")
    )


def grouped_quantile_sketch(
    ds, value_col: str, group_col: str, qs=(0.5, 0.9), k: int = 1024
):
    """Per-group approximate quantiles: one compacted weighted sample per
    (batch, group) — k points max — shuffles to a groupby(group) merge.
    ``events_median_value`` is the exact anchor for q=0.5 per group."""

    def partial(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        keys = batch[group_col].to_numpy(zero_copy_only=False)
        vals = batch[value_col].to_numpy().astype(np.float64)
        out = {"group": [], "vals": [], "wgts": []}
        for key in np.unique(keys):
            v = vals[keys == key]
            v = v[~np.isnan(v)]
            if len(v) == 0:
                continue
            cv, cw = _compact(v, np.ones(len(v)), k)
            out["group"].append(str(key))
            out["vals"].append(cv.tobytes())
            out["wgts"].append(cw.tobytes())
        return pa.table(
            {
                "group": pa.array(out["group"], pa.string()),
                "vals": pa.array(out["vals"], pa.binary()),
                "wgts": pa.array(out["wgts"], pa.binary()),
            }
        )

    def merge(group: pa.Table) -> pa.Table:
        vs = [np.frombuffer(b.as_py(), np.float64) for b in group["vals"]]
        ws = [np.frombuffer(b.as_py(), np.float64) for b in group["wgts"]]
        cv, cw = _compact(np.concatenate(vs), np.concatenate(ws), k)
        order = np.argsort(cv, kind="stable")
        cv, cw = cv[order], cw[order]
        cum = np.cumsum(cw)
        total = cum[-1]
        name = group["group"][0].as_py()
        out_g, out_q, out_v = [], [], []
        for q in qs:
            pos = int(np.searchsorted(cum, q * total, side="left"))
            out_g.append(name)
            out_q.append(float(q))
            out_v.append(float(cv[min(pos, len(cv) - 1)]))
        return pa.table(
            {
                "group": pa.array(out_g, pa.string()),
                "q": pa.array(out_q, pa.float64()),
                "value": pa.array(out_v, pa.float64()),
            }
        )

    return (
        ds.select_columns([group_col, value_col])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("group")
        .map_groups(merge, batch_format="pyarrow")
    )


# ---------------------------------------------------------------------------
# Bloom filter: distributed build + broadcast probe


def _bloom_hashes(values, m_bits: int, k: int) -> np.ndarray:
    """(n, k) bit indices via double hashing h1 + i*h2 (Kirsch-
    Mitzenmacher); values may be a pyarrow string array or an int64
    numpy array."""
    if isinstance(values, (pa.Array, pa.ChunkedArray)) and pa.types.is_string(
            values.type):
        from .text import _fnv1a64_strings

        base = _fnv1a64_strings(values).astype(np.uint64)
    else:
        if isinstance(values, (pa.Array, pa.ChunkedArray)):
            values = values.to_numpy(zero_copy_only=False)
        base = np.asarray(values).astype(np.uint64)
    h1 = _hash64(base)
    h2 = _hash64(base ^ np.uint64(0xA5A5A5A5A5A5A5A5)) | np.uint64(1)
    i = np.arange(k, dtype=np.uint64)[None, :]
    with np.errstate(over="ignore"):
        idx = (h1[:, None] + i * h2[:, None]) % np.uint64(m_bits)
    return idx.astype(np.int64)


def _bloom_set(bits: np.ndarray, idx: np.ndarray) -> None:
    flat = idx.ravel()
    np.bitwise_or.at(bits, flat >> 3,
                     (1 << (flat & 7)).astype(np.uint8))


def _bloom_test(bits: np.ndarray, idx: np.ndarray) -> np.ndarray:
    flat = idx.ravel()
    hit = (bits[flat >> 3] >> (flat & 7).astype(np.uint8)) & 1
    return hit.reshape(idx.shape).all(axis=1)


def bloom_build(ds, value_col: str, m_bits: int = 1 << 20, k: int = 5):
    """Distributed Bloom-filter build: each batch emits ONE packed
    m_bits/8-byte partial, the driver ORs the partials — the bounded
    "ship sketches, never values" shape (a 1M-bit filter is 128 KB per
    block partial regardless of how many values the block held).

    Returns (bits uint8[m_bits/8], k). The canonical use is membership
    pre-filtering when the reference set is too big to broadcast as raw
    values (e.g. benchmark n-grams for decontamination)."""
    if m_bits % 8:
        raise ValueError("m_bits must be a multiple of 8")

    def partial(batch: pa.Table) -> pa.Table:
        bits = np.zeros(m_bits // 8, dtype=np.uint8)
        col = batch[value_col]
        if len(col):
            _bloom_set(bits, _bloom_hashes(col.combine_chunks()
                                           if isinstance(col, pa.ChunkedArray)
                                           else col, m_bits, k))
        return pa.table({"bits": pa.array([bits.tobytes()], pa.binary())})

    out = np.zeros(m_bits // 8, dtype=np.uint8)
    for r in ds.map_batches(partial, batch_format="pyarrow").take_all():
        out |= np.frombuffer(r["bits"], dtype=np.uint8)
    return out, k


def bloom_probe(ds, value_col: str, bits: np.ndarray, k: int,
                keep: str = "hits"):
    """Broadcast-probe stage: keep rows whose value is ('hits') or is NOT
    ('misses') possibly-in-the-filter. No false negatives: 'misses' rows
    are GUARANTEED absent from the build set (the safe side for
    decontamination: drop every possible hit)."""
    import ray

    if keep not in ("hits", "misses"):
        raise ValueError("keep must be 'hits' or 'misses'")
    m_bits = len(bits) * 8
    bits_ref = ray.put(np.asarray(bits, dtype=np.uint8))

    def probe(batch: pa.Table) -> pa.Table:
        b = ray.get(bits_ref)
        col = batch[value_col]
        if not len(col):
            return batch
        hit = _bloom_test(b, _bloom_hashes(
            col.combine_chunks() if isinstance(col, pa.ChunkedArray)
            else col, m_bits, k))
        mask = hit if keep == "hits" else ~hit
        return batch.filter(pa.array(mask))

    return ds.map_batches(probe, batch_format="pyarrow")


def dataset_profile(ds, columns=None):
    """Per-column profiling census — the data-quality pass a pipeline
    runs before training on a new table: (column, dtype, n_rows, n_null,
    distinct_est, min, max, mean) with numeric min/max/mean exact and
    distinct counting via the HLL registers (fixed-size partials only
    cross the shuffle).

    Strings profile length stats for min/max/mean and hash into the HLL;
    other non-numeric types profile null/distinct only.
    """
    import pyarrow.compute as pc

    from .text import _fnv1a64_strings

    def partial(batch: pa.Table) -> pa.Table:
        cols = columns or batch.column_names
        out = {"column": [], "dtype": [], "n_rows": [], "n_null": [],
               "regs": [], "vmin": [], "vmax": [], "vsum": [],
               "vcount": []}
        for name in cols:
            col = batch[name]
            arr = col.combine_chunks() if isinstance(
                col, pa.ChunkedArray) else col
            n = len(arr)
            n_null = arr.null_count
            t = arr.type
            vmin = vmax = float("nan")
            vsum = 0.0
            vcount = 0
            regs = np.zeros(_HLL_M, dtype=np.uint8)
            valid = arr.drop_null()
            if len(valid):
                if pa.types.is_string(t):
                    lens = pc.utf8_length(valid).to_numpy().astype(
                        np.float64)
                    vmin, vmax = float(lens.min()), float(lens.max())
                    vsum, vcount = float(lens.sum()), len(lens)
                    hashed = _fnv1a64_strings(valid)
                    regs = _hll_registers(hashed)
                elif (pa.types.is_integer(t) or pa.types.is_floating(t)
                        or pa.types.is_timestamp(t)):
                    if pa.types.is_timestamp(t):
                        hv = valid.cast(pa.int64()).to_numpy()
                        v = hv.astype(np.float64)
                    elif pa.types.is_integer(t):
                        hv = valid.to_numpy(zero_copy_only=False).astype(
                            np.int64)
                        v = hv.astype(np.float64)
                    else:
                        v = valid.to_numpy(zero_copy_only=False).astype(
                            np.float64)
                        # hash the float64 BIT PATTERN, not the truncated
                        # integer part — truncation collides every value
                        # sharing an integer part (and NaN -> INT64_MIN).
                        v = v[~np.isnan(v)]
                        hv = v.view(np.int64)
                    if len(v):
                        vmin, vmax = float(v.min()), float(v.max())
                        vsum, vcount = float(v.sum()), len(v)
                        regs = _hll_registers(hv)
                # other types: null/row counts only
            out["column"].append(name)
            out["dtype"].append(str(t))
            out["n_rows"].append(n)
            out["n_null"].append(n_null)
            out["regs"].append(regs.tobytes())
            out["vmin"].append(vmin)
            out["vmax"].append(vmax)
            out["vsum"].append(vsum)
            out["vcount"].append(vcount)
        return pa.table({
            "column": pa.array(out["column"], pa.string()),
            "dtype": pa.array(out["dtype"], pa.string()),
            "n_rows": pa.array(out["n_rows"], pa.int64()),
            "n_null": pa.array(out["n_null"], pa.int64()),
            "regs": pa.array(out["regs"], pa.binary()),
            "vmin": pa.array(out["vmin"], pa.float64()),
            "vmax": pa.array(out["vmax"], pa.float64()),
            "vsum": pa.array(out["vsum"], pa.float64()),
            "vcount": pa.array(out["vcount"], pa.int64()),
        })

    def merge(group: pa.Table) -> pa.Table:
        regs = np.zeros(_HLL_M, dtype=np.uint8)
        for r in group["regs"].to_pylist():
            regs = np.maximum(regs, np.frombuffer(r, dtype=np.uint8))
        import pyarrow.compute as pc2

        vmin = group["vmin"].to_numpy()
        vmax = group["vmax"].to_numpy()
        vmin = vmin[~np.isnan(vmin)]
        vmax = vmax[~np.isnan(vmax)]
        vcount = int(pc2.sum(group["vcount"]).as_py() or 0)
        vsum = float(pc2.sum(group["vsum"]).as_py() or 0.0)
        any_dist = int(round(_hll_estimate(regs))) if regs.any() else 0
        return pa.table({
            "column": [group["column"][0].as_py()],
            "dtype": [group["dtype"][0].as_py()],
            "n_rows": [int(pc2.sum(group["n_rows"]).as_py())],
            "n_null": [int(pc2.sum(group["n_null"]).as_py())],
            "distinct_est": pa.array([any_dist], pa.int64()),
            "min": [float(vmin.min()) if len(vmin) else None],
            "max": [float(vmax.max()) if len(vmax) else None],
            "mean": [round(vsum / vcount, 6) if vcount else None],
        })

    return ds.map_batches(partial, batch_format="pyarrow").groupby(
        "column").map_groups(merge, batch_format="pyarrow")
