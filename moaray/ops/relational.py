"""Relational-shaped pipelines over the TPC-H-ish tables.

These exist to exercise (and oracle-check) the engine's aggregation shapes:
partial aggregation inside ``map_batches`` (combiner) followed by a SMALL
groupby of partials — the pattern that keeps a 100 TB groupby from shipping
raw rows through the shuffle. Column names match the oracle SQL exactly.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _partial_q1(batch: pa.Table) -> pa.Table:
    """Per-batch combiner for the pricing summary: group locally, emit
    partial sums (tiny) instead of raw rows."""
    batch = batch.filter(
        pc.less_equal(batch["l_shipdate"], pa.scalar(np.datetime64("1998-09-02", "us")))
    )
    if batch.num_rows == 0:
        return pa.table(
            {
                "l_returnflag": pa.array([], pa.string()),
                "l_linestatus": pa.array([], pa.string()),
                "sum_qty": pa.array([], pa.float64()),
                "sum_base_price": pa.array([], pa.float64()),
                "sum_disc_price": pa.array([], pa.float64()),
                "count_order": pa.array([], pa.int64()),
            }
        )
    # Money columns carry fixed decimals (price 2, discount 2 -> product 4):
    # sum them as exact INTEGER ten-thousandths so the total is independent
    # of float summation order — a float sum can land on a round-half
    # boundary and differ from the oracle's own order by 0.01.
    disc_price = pc.cast(
        pc.round(
            pc.multiply(
                pc.multiply(
                    batch["l_extendedprice"],
                    pc.subtract(pa.scalar(1.0), batch["l_discount"]),
                ),
                pa.scalar(10000.0),
            ),
            round_mode="half_towards_infinity",  # SQL round() semantics
        ),
        pa.int64(),
    )
    base_price = pc.cast(
        pc.round(
            pc.multiply(batch["l_extendedprice"], pa.scalar(100.0)),
            round_mode="half_towards_infinity",
        ),
        pa.int64(),
    )
    batch = batch.append_column("disc_price", disc_price)
    batch = batch.append_column("base_price", base_price)
    grouped = batch.group_by(["l_returnflag", "l_linestatus"]).aggregate(
        [
            ("l_quantity", "sum"),
            ("base_price", "sum"),
            ("disc_price", "sum"),
            ("l_quantity", "count"),
        ]
    )
    return grouped.rename_columns(
        [
            "l_returnflag",
            "l_linestatus",
            "sum_qty",
            "sum_base_price",
            "sum_disc_price",
            "count_order",
        ]
    )


def _final_q1(group: pa.Table) -> pa.Table:
    return pa.table(
        {
            "l_returnflag": [group["l_returnflag"][0].as_py()],
            "l_linestatus": [group["l_linestatus"][0].as_py()],
            "sum_qty": [round(float(pc.sum(group["sum_qty"]).as_py()), 2)],
            # exact integer half-away rounding: (s + half) // step — the
            # final float round was the last order-dependent step (python
            # round() is banker's, SQL round() is half-away; a total landing
            # exactly on .xx5 flips between them)
            "sum_base_price": [
                int(pc.sum(group["sum_base_price"]).as_py()) / 100.0
            ],
            "sum_disc_price": [
                ((int(pc.sum(group["sum_disc_price"]).as_py()) + 50) // 100)
                / 100.0
            ],
            # avg = s/c rounded half-away at 4 digits via exact integer
            # arithmetic (quantities are integer-valued): floor(s*1e4/c + .5)
            "avg_qty": [
                (
                    int(pc.sum(group["sum_qty"]).as_py()) * 20000
                    + int(pc.sum(group["count_order"]).as_py())
                )
                // (2 * int(pc.sum(group["count_order"]).as_py()))
                / 10000.0
            ],
            "count_order": [int(pc.sum(group["count_order"]).as_py())],
        }
    )


def pricing_summary(lineitem_ds):
    """TPC-H Q1-shaped summary; partial-agg combiner then tiny groupby."""
    partial = lineitem_ds.map_batches(_partial_q1, batch_format="pyarrow")
    return partial.groupby(["l_returnflag", "l_linestatus"]).map_groups(
        _final_q1, batch_format="pyarrow"
    )


def _partial_events(batch: pa.Table) -> pa.Table:
    day = pc.strftime(batch["ts"], format="%Y-%m-%d")
    cents = pc.cast(
        pc.round(
            pc.multiply(batch["value"], pa.scalar(100.0)),
            round_mode="half_towards_infinity",
        ),
        pa.int64(),
    )
    batch = batch.append_column("day", day).append_column("cents", cents)
    grouped = batch.group_by(["event_type", "day"]).aggregate(
        [("cents", "sum"), ("cents", "count")]
    )
    return grouped.rename_columns(["event_type", "day", "sum_value", "n_events"])


def _final_events(group: pa.Table) -> pa.Table:
    return pa.table(
        {
            "event_type": [group["event_type"][0].as_py()],
            "day": [group["day"][0].as_py()],
            "n_events": [int(pc.sum(group["n_events"]).as_py())],
            "sum_value": [int(pc.sum(group["sum_value"]).as_py()) / 100.0],
        }
    )


def events_daily(events_ds):
    """Windowed-by-day aggregate per event type (combiner + tiny groupby)."""
    partial = events_ds.map_batches(_partial_events, batch_format="pyarrow")
    return partial.groupby(["event_type", "day"]).map_groups(
        _final_events, batch_format="pyarrow"
    )


def events_moving_avg(events_ds, window: int = 7):
    """Per-event-type moving average of daily revenue over a trailing
    ``window`` days (ROWS window-1 PRECEDING semantics over the ordered
    day sequence). Composition: the existing events_daily partial-agg
    pipeline collapses the input to one row per (event_type, day) — tiny —
    then one groupby(event_type) computes the windowed mean group-locally
    with a vectorized cumulative sum. Money stays integer cents until the
    final divide; the result is rounded half-away like SQL round()."""
    daily = events_daily(events_ds)

    def moving(group: pa.Table) -> pa.Table:
        days = np.array(group["day"].to_pylist())
        order = np.argsort(days, kind="stable")
        days = days[order]
        # exact cents (events_daily emits cents/100.0 — reconstruct ints)
        cents = np.rint(
            group["sum_value"].to_numpy()[order] * 100.0
        ).astype(np.int64)
        csum = np.concatenate(([0], np.cumsum(cents)))
        n = len(cents)
        lo = np.maximum(np.arange(n) - (window - 1), 0)
        wsum = csum[1:] - csum[lo]
        wlen = np.arange(n) - lo + 1
        # SQL avg of cents/100: round(sum/(100*len), 4) half-away
        avg = wsum / (100.0 * wlen)
        f = 1e4
        avg = np.where(
            avg >= 0, np.floor(avg * f + 0.5), np.ceil(avg * f - 0.5)
        ) / f
        return pa.table(
            {
                "event_type": pa.array(
                    [group["event_type"][0].as_py()] * n, pa.string()
                ),
                "day": pa.array(days, pa.string()),
                "moving_avg": pa.array(avg, pa.float64()),
            }
        )

    return daily.groupby("event_type").map_groups(
        moving, batch_format="pyarrow"
    )


def events_median_value(events_ds):
    """Exact per-event-type median of the value column (DuckDB median():
    lower-middle/mean-of-middles interpolation). One shuffle on event_type;
    the median is group-local numpy over exact cents.

    Scale note: group size is bounded by per-type event counts; for a
    100-TB stream swap the exact kernel for a t-digest/KLL partial (the
    sketch module's pattern) — this op is the exact oracle anchor."""

    def med(group: pa.Table) -> pa.Table:
        cents = np.sort(
            np.rint(group["value"].to_numpy() * 100.0).astype(np.int64)
        )
        n = len(cents)
        if n % 2:
            m = cents[n // 2] / 100.0
        else:
            # mirror DuckDB's op order exactly: mean of middles as a double
            # FIRST, then the /100.0 of the SQL expression (one-ulp parity)
            m = ((cents[n // 2 - 1] + cents[n // 2]) / 2.0) / 100.0
        return pa.table(
            {
                "event_type": [group["event_type"][0].as_py()],
                "median_value": pa.array([m], pa.float64()),
                "n_events": pa.array([n], pa.int64()),
            }
        )

    return (
        events_ds.select_columns(["event_type", "value"])
        .groupby("event_type")
        .map_groups(med, batch_format="pyarrow")
    )


def exact_group_quantiles(ds, value_col: str, group_col: str,
                          qs=(0.5, 0.9, 0.99)):
    """Exact per-group discrete quantiles (DuckDB quantile_disc: the
    data element at sorted index ceil(q*n)-1 — no interpolation, so the
    result is bitwise a member of the input and hash-compares exactly).

    One shuffle on ``group_col``; the quantile kernel is group-local
    numpy sort. Same scale contract as :func:`events_median_value`:
    group cardinality is the per-key row count, fine for type-keyed
    telemetry; an unbounded-cardinality column should use the mergeable
    sketch (ops/sketch.py quantile_sketch) instead — this op is the
    exact anchor the sketch is graded against."""

    def quant(group: pa.Table) -> pa.Table:
        v = np.sort(group[value_col].to_numpy().astype(np.float64))
        n = len(v)
        idx = [min(max(int(np.ceil(q * n)) - 1, 0), n - 1) for q in qs]
        return pa.table(
            {
                group_col: [group[group_col][0].as_py()] * len(qs),
                "q": pa.array(list(qs), pa.float64()),
                "value": pa.array(v[idx], pa.float64()),
                "n_rows": pa.array([n] * len(qs), pa.int64()),
            }
        )

    return (
        ds.select_columns([group_col, value_col])
        .groupby(group_col)
        .map_groups(quant, batch_format="pyarrow")
    )


def extent_union(meta_ds):
    """The mosaic's P1 union-extent aggregate exposed as a standalone op:
    global min/max over per-image bounds (ref mosaic.py:434-440)."""
    from ray.data.aggregate import Max, Min

    agg = meta_ds.aggregate(Min("xmin"), Max("xmax"), Min("ymin"), Max("ymax"))
    return pa.table(
        {
            "xmin": [agg["min(xmin)"]],
            "xmax": [agg["max(xmax)"]],
            "ymin": [agg["min(ymin)"]],
            "ymax": [agg["max(ymax)"]],
        }
    )


def _order_cents(batch: pa.Table) -> pa.Array:
    """o_totalprice -> exact integer cents: immune to float summation
    order + rounding mode (see pricing_summary)."""
    return pc.cast(
        pc.round(
            pc.multiply(batch["o_totalprice"], pa.scalar(100.0)),
            round_mode="half_towards_infinity",
        ),
        pa.int64(),
    )


def _nation_final(group: pa.Table) -> pa.Table:
    return pa.table(
        {
            "n_name": [group["n_name"][0].as_py()],
            "revenue": [int(pc.sum(group["revenue"]).as_py()) / 100.0],
            "n_orders": [int(pc.sum(group["n_orders"]).as_py())],
        }
    )


def revenue_by_nation(orders_ds, customer_path: str, nation_path: str,
                      num_partitions: int = 32,
                      broadcast_limit: int = 5_000_000):
    """Revenue per nation with size-aware join dispatch (same pattern as
    revenue_by_priority — customer is NOT a dimension table, it scales
    with SF: 15M rows at sf100).

    - customer <= ``broadcast_limit`` rows (parquet footer count): the
      (c_custkey, c_nationkey) pair ships ONCE via ray.put as a sorted
      int64 key array + int32 nation codes (~12 bytes/row vs ~100 for a
      Python dict entry), probed per orders batch with np.searchsorted —
      vectorized, no per-row Python loop; unmatched keys drop
      (inner-join semantics).
    - above the limit: Ray's distributed hash join orders x customer on
      the custkey (partitions capped to CPU slots), with a per-batch
      per-custkey combiner shrinking the probe side before the shuffle.

    nation (25 rows, fixed) always broadcasts. Both paths are
    pytest-asserted equal."""
    import pyarrow.parquet as pq
    import ray

    nat = pq.read_table(nation_path, columns=["n_nationkey", "n_name"])
    nk = nat["n_nationkey"].to_numpy()
    max_nk = int(nk.max()) if len(nk) else 0
    name_by_nk: list = [None] * (max_nk + 1)
    for k, nm in zip(nk, nat["n_name"].to_pylist()):
        name_by_nk[int(k)] = nm

    try:
        n_cust = pq.ParquetFile(customer_path).metadata.num_rows
    except Exception:
        n_cust = 1 << 62

    if n_cust <= broadcast_limit:
        cust = pq.read_table(
            customer_path, columns=["c_custkey", "c_nationkey"]
        )
        ckeys = cust["c_custkey"].to_numpy()
        codes = cust["c_nationkey"].to_numpy().astype(np.int32)
        order_idx = np.argsort(ckeys, kind="stable")
        ref = ray.put((ckeys[order_idx], codes[order_idx], name_by_nk))

        def bcast_partial(batch: pa.Table) -> pa.Table:
            skeys, snk, names = ray.get(ref)
            bkeys = batch["o_custkey"].to_numpy()
            pos = np.searchsorted(skeys, bkeys)
            pos_c = np.clip(pos, 0, max(len(skeys) - 1, 0))
            hit = (skeys[pos_c] == bkeys) if len(skeys) else np.zeros(
                len(bkeys), bool
            )
            cents = _order_cents(batch).to_numpy()[hit]
            code = snk[pos_c[hit]]
            sums = np.zeros(len(names), dtype=np.int64)
            cnts = np.zeros(len(names), dtype=np.int64)
            np.add.at(sums, code, cents)
            np.add.at(cnts, code, 1)
            nz = [i for i in np.nonzero(cnts)[0] if names[i] is not None]
            return pa.table(
                {
                    "n_name": pa.array([names[i] for i in nz], pa.string()),
                    "revenue": pa.array(sums[nz], pa.int64()),
                    "n_orders": pa.array(cnts[nz], pa.int64()),
                }
            )

        return (
            orders_ds.select_columns(["o_custkey", "o_totalprice"])
            .map_batches(bcast_partial, batch_format="pyarrow")
            .groupby("n_name")
            .map_groups(_nation_final, batch_format="pyarrow")
        )

    # --- large build side: distributed hash join ------------------------
    from ..io import read_parquet_clean

    cust_ds = read_parquet_clean(
        customer_path, columns=["c_custkey", "c_nationkey"]
    )
    try:
        cpus = int(ray.cluster_resources().get("CPU", 8))
    except Exception:
        cpus = 8
    num_partitions = max(2, min(num_partitions, cpus))

    def orders_partial(batch: pa.Table) -> pa.Table:
        t = pa.table(
            {"o_custkey": batch["o_custkey"], "cents": _order_cents(batch)}
        )
        g = t.group_by("o_custkey").aggregate(
            [("cents", "sum"), ("cents", "count")]
        )
        return g.rename_columns(["o_custkey", "cents", "n_orders"])

    opart = orders_ds.select_columns(
        ["o_custkey", "o_totalprice"]
    ).map_batches(orders_partial, batch_format="pyarrow")

    joined = opart.join(
        cust_ds,
        join_type="inner",
        num_partitions=num_partitions,
        on=("o_custkey",),
        right_on=("c_custkey",),
    )

    def nation_partial(batch: pa.Table) -> pa.Table:
        code = batch["c_nationkey"].to_numpy().astype(np.int64)
        names = pa.array(
            [name_by_nk[c] if 0 <= c < len(name_by_nk) else None
             for c in code],
            pa.string(),
        )
        t = pa.table(
            {
                "n_name": names,
                "cents": batch["cents"],
                "n_orders": batch["n_orders"],
            }
        ).filter(pc.is_valid(names))
        g = t.group_by("n_name").aggregate(
            [("cents", "sum"), ("n_orders", "sum")]
        )
        return g.rename_columns(["n_name", "revenue", "n_orders"])

    return (
        joined.map_batches(nation_partial, batch_format="pyarrow")
        .groupby("n_name")
        .map_groups(_nation_final, batch_format="pyarrow")
    )


def top_orders(orders_ds, k: int = 10):
    """Global top-k orders by price WITHOUT a global sort: each batch emits
    its local top-k (combiner), a single tiny merge takes the global top-k.
    Deterministic tiebreak on o_orderkey asc."""

    def local_topk(batch: pa.Table) -> pa.Table:
        t = batch.select(["o_orderkey", "o_totalprice"])
        keys = t["o_orderkey"].to_numpy()
        prices = t["o_totalprice"].to_numpy()
        order = np.lexsort((keys, -prices))[:k]
        return t.take(pa.array(order, pa.int64()))

    partial = orders_ds.map_batches(local_topk, batch_format="pyarrow")

    def merge(batch: pa.Table) -> pa.Table:
        keys = batch["o_orderkey"].to_numpy()
        prices = batch["o_totalprice"].to_numpy()
        order = np.lexsort((keys, -prices))[:k]
        out = batch.take(pa.array(order, pa.int64()))
        return out.append_column(
            "rank", pa.array(np.arange(1, out.num_rows + 1), pa.int64())
        )

    # repartition(1): the partials are k rows per input block — tiny
    return partial.repartition(1).map_batches(
        merge, batch_format="pyarrow", batch_size=None
    )


def segment_nation_stats(customer_ds):
    """Per market segment: customer count + COUNT(DISTINCT nation).
    Distinct via per-batch sets (bounded: <=25 nations) merged in the final
    combine — the 'partial distinct' shape that avoids a distinct shuffle."""

    def partial(batch: pa.Table) -> pa.Table:
        t = batch.select(["c_mktsegment", "c_nationkey"])
        g = t.group_by("c_mktsegment").aggregate(
            [("c_nationkey", "distinct"), ("c_nationkey", "count")]
        )
        return g.rename_columns(["c_mktsegment", "nations", "n_customers"])

    def final(group: pa.Table) -> pa.Table:
        nations = set()
        for cell in group["nations"].to_pylist():
            nations.update(cell)
        return pa.table(
            {
                "c_mktsegment": [group["c_mktsegment"][0].as_py()],
                "n_customers": [int(pc.sum(group["n_customers"]).as_py())],
                "n_nations": [len(nations)],
            }
        )

    return (
        customer_ds.select_columns(["c_mktsegment", "c_nationkey"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("c_mktsegment")
        .map_groups(final, batch_format="pyarrow")
    )


def sessionize(events_ds, gap_minutes: int = 30, n_partitions: int = 256):
    """Gap-based session windows per user (the streaming-window custom
    operator class): events shuffle ONCE on the bounded
    ``user_id % n_partitions`` key; inside each partition group one
    lexsort puts every user's events in (ts, event_id) order and session
    boundaries / stats fall out of vectorized diff + reduceat — no
    per-user Python call (grouping on raw user_id pays one call per user,
    the per-key overhead that made winnow_pairs 4x slower), no per-session
    loop. Emits one row per session.

    Scales because sessions are user-local: group size is bounded by
    n_partitions sizing (salt a pathological power user by day before
    this op if needed)."""
    gap_us = np.int64(gap_minutes * 60 * 1_000_000)

    def add_part(batch: pa.Table) -> pa.Table:
        part = batch["user_id"].to_numpy() % np.int64(n_partitions)
        return batch.append_column("part", pa.array(part, pa.int64()))

    def sessions(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "user_id": pa.array([], pa.int64()),
                "session_id": pa.array([], pa.int64()),
                "session_start": pa.array([], pa.string()),
                "session_end": pa.array([], pa.string()),
                "n_events": pa.array([], pa.int64()),
                "sum_value": pa.array([], pa.float64()),
            }
        )
        if group.num_rows == 0:
            return empty
        uid = group["user_id"].to_numpy()
        ts = group["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        eid = group["event_id"].to_numpy()
        # exact integer cents, half-away rounding like SQL round()
        # (np.round is half-even)
        v100 = group["value"].to_numpy() * 100.0
        val = np.where(
            v100 >= 0, np.floor(v100 + 0.5), np.ceil(v100 - 0.5)
        ).astype(np.int64)
        order = np.lexsort((eid, ts, uid))
        uid, ts, val = uid[order], ts[order], val[order]
        # a session break at every user change or over-gap step
        brk = np.ones(len(ts), dtype=bool)
        brk[1:] = (uid[1:] != uid[:-1]) | ((ts[1:] - ts[:-1]) > gap_us)
        starts = np.nonzero(brk)[0]
        ends = np.concatenate((starts[1:], [len(ts)])) - 1
        su = uid[starts]
        # 1-based per-user session index: segment ordinal minus the
        # ordinal of the user's first segment
        ustarts = np.concatenate(([0], np.nonzero(np.diff(su))[0] + 1))
        ucounts = np.diff(np.concatenate((ustarts, [su.size])))
        sess_id = (
            np.arange(su.size, dtype=np.int64)
            - np.repeat(ustarts, ucounts)
            + 1
        )
        # ts sorted within user -> session start/end are the edge rows
        fmt = np.char.replace(
            np.datetime_as_string(
                ts.astype("datetime64[us]").astype("datetime64[s]"),
                unit="s",
            ),
            "T",
            " ",
        )
        return pa.table(
            {
                "user_id": pa.array(su, pa.int64()),
                "session_id": pa.array(sess_id, pa.int64()),
                "session_start": pa.array(fmt[starts], pa.string()),
                "session_end": pa.array(fmt[ends], pa.string()),
                "n_events": pa.array(
                    (ends - starts + 1).astype(np.int64), pa.int64()
                ),
                "sum_value": pa.array(
                    np.add.reduceat(val, starts) / 100.0, pa.float64()
                ),
            }
        )

    return (
        events_ds.select_columns(["user_id", "event_id", "ts", "value"])
        .map_batches(add_part, batch_format="pyarrow")
        .groupby("part")
        .map_groups(sessions, batch_format="pyarrow")
    )


def _rights_before(r_uid, r_ts, l_uid, l_bound, inclusive: bool):
    """For each left row, the number of right rows of the SAME user with
    ts < bound (or <= when ``inclusive``), fully vectorized: one merged
    lexsort sweep with the tie tag ordering rights before lefts (<=) or
    after (<). Right arrays must be sorted by (uid, ts)."""
    n_r, n_l = r_uid.size, l_uid.size
    uid_m = np.concatenate([r_uid, l_uid])
    ts_m = np.concatenate([r_ts, l_bound])
    right_tag = np.int8(0) if inclusive else np.int8(1)
    tag = np.concatenate([
        np.full(n_r, right_tag, np.int8),
        np.full(n_l, np.int8(1) - right_tag, np.int8),
    ])
    is_right_src = np.concatenate([
        np.ones(n_r, bool), np.zeros(n_l, bool)
    ])
    order = np.lexsort((tag, ts_m, uid_m))
    is_r = is_right_src[order]
    cnt = np.cumsum(is_r)
    uid_s = uid_m[order]
    ustart = np.concatenate(([0], np.nonzero(np.diff(uid_s))[0] + 1))
    ucnt = np.diff(np.concatenate((ustart, [uid_s.size])))
    base = np.repeat(cnt[ustart] - is_r[ustart], ucnt)
    within = cnt - base  # rights at-or-before this merged position, per user
    out = np.empty(n_l, np.int64)
    out[order[~is_r] - n_r] = within[~is_r]
    return out


def asof_join_events(events_ds, left_type: str = "purchase",
                     right_type: str = "view"):
    """AS-OF JOIN (the temporal custom operator Ray Data lacks natively):
    for every ``left_type`` event, attach the newest ``right_type`` event
    of the same user with ``right.ts <= left.ts`` (inner — unmatched left
    rows drop, matching SQL ASOF JOIN).

    Shape: ONE shuffle on the natural key (user_id), then a group-local
    sort + np.searchsorted probe — O(n log n) per group, no pairwise
    blowup; the same partitioning key every other events op uses. Right
    rows are first deduped to one per (user, ts) (max value) so ties are
    deterministic on both the Ray and SQL sides."""

    n_partitions = 256

    def add_part(batch: pa.Table) -> pa.Table:
        # prune to the two participating types at the scan side
        et = np.asarray(batch["event_type"].to_pylist())
        keep = (et == left_type) | (et == right_type)
        batch = batch.filter(pa.array(keep))
        part = batch["user_id"].to_numpy() % np.int64(n_partitions)
        return batch.append_column("part", pa.array(part, pa.int64()))

    def _fmt_ts(us: np.ndarray) -> np.ndarray:
        return np.char.replace(
            np.datetime_as_string(
                us.astype("datetime64[us]").astype("datetime64[s]"),
                unit="s",
            ),
            "T", " ",
        )

    def asof(group: pa.Table) -> pa.Table:
        # vectorized over EVERY user in a bounded partition group: one
        # merged (uid, ts) sweep finds each left row's newest right row
        # (per-user grouping pays one Python call per user)
        empty = pa.table({
            "event_id": pa.array([], pa.int64()),
            "user_id": pa.array([], pa.int64()),
            "event_ts": pa.array([], pa.string()),
            "view_ts": pa.array([], pa.string()),
            "view_value": pa.array([], pa.float64()),
        })
        if group.num_rows == 0:
            return empty
        uid = group["user_id"].to_numpy()
        ts = group["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        eid = group["event_id"].to_numpy()
        val = group["value"].to_numpy()
        et = np.asarray(group["event_type"].to_pylist())
        is_l = et == left_type
        is_r = et == right_type
        if not is_l.any() or not is_r.any():
            return empty
        # dedupe right side to one row per (user, ts): max value wins
        # (ties deterministic both sides); lexsort leaves (uid, ts) order
        r_uid, r_ts, r_val = uid[is_r], ts[is_r], val[is_r]
        order = np.lexsort((r_val, r_ts, r_uid))
        r_uid, r_ts, r_val = r_uid[order], r_ts[order], r_val[order]
        keep = np.ones(r_ts.size, bool)
        keep[:-1] = (r_ts[1:] != r_ts[:-1]) | (r_uid[1:] != r_uid[:-1])
        r_uid, r_ts, r_val = r_uid[keep], r_ts[keep], r_val[keep]
        l_uid, l_ts, l_id = uid[is_l], ts[is_l], eid[is_l]
        cnt = _rights_before(r_uid, r_ts, l_uid, l_ts, inclusive=True)
        hit = cnt > 0
        if not hit.any():
            return empty
        l_uid, l_ts, l_id, cnt = l_uid[hit], l_ts[hit], l_id[hit], cnt[hit]
        pos = np.searchsorted(r_uid, l_uid, side="left") + cnt - 1
        cents = np.where(
            r_val[pos] * 100.0 >= 0,
            np.floor(r_val[pos] * 100.0 + 0.5),
            np.ceil(r_val[pos] * 100.0 - 0.5),
        ).astype(np.int64)
        return pa.table({
            "event_id": pa.array(l_id, pa.int64()),
            "user_id": pa.array(l_uid, pa.int64()),
            "event_ts": pa.array(_fmt_ts(l_ts), pa.string()),
            "view_ts": pa.array(_fmt_ts(r_ts[pos]), pa.string()),
            "view_value": pa.array(cents / 100.0, pa.float64()),
        })

    return (
        events_ds.select_columns(
            ["user_id", "event_id", "ts", "event_type", "value"]
        )
        .map_batches(add_part, batch_format="pyarrow")
        .groupby("part")
        .map_groups(asof, batch_format="pyarrow")
    )


def range_join_events(events_ds, window_minutes: int = 60,
                      left_type: str = "error",
                      right_type: str = "click"):
    """RANGE JOIN: all (left, right) pairs of the same user with
    ``left.ts - window <= right.ts < left.ts`` — "which clicks preceded
    each error within the hour". One shuffle on user_id; within a group
    both sides sort once and each left row takes a contiguous
    searchsorted slice of the right side, so work is O(n log n + pairs)
    — never the unwindowed cross product."""
    win_us = np.int64(window_minutes * 60 * 1_000_000)
    n_partitions = 256

    def add_part(batch: pa.Table) -> pa.Table:
        et = np.asarray(batch["event_type"].to_pylist())
        keep = (et == left_type) | (et == right_type)
        batch = batch.filter(pa.array(keep))
        part = batch["user_id"].to_numpy() % np.int64(n_partitions)
        return batch.append_column("part", pa.array(part, pa.int64()))

    def pairs(group: pa.Table) -> pa.Table:
        # vectorized over every user in a bounded partition group: two
        # merged sweeps bound each left row's right-slice, a repeat/cumsum
        # expansion emits the pairs — no per-user call, no per-left loop
        empty = pa.table({
            "user_id": pa.array([], pa.int64()),
            "left_event_id": pa.array([], pa.int64()),
            "right_event_id": pa.array([], pa.int64()),
        })
        if group.num_rows == 0:
            return empty
        uid = group["user_id"].to_numpy()
        ts = group["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        eid = group["event_id"].to_numpy()
        et = np.asarray(group["event_type"].to_pylist())
        is_l = et == left_type
        is_r = et == right_type
        if not is_l.any() or not is_r.any():
            return empty
        r_uid, r_ts, r_id = uid[is_r], ts[is_r], eid[is_r]
        order = np.lexsort((r_id, r_ts, r_uid))
        r_uid, r_ts, r_id = r_uid[order], r_ts[order], r_id[order]
        l_uid, l_ts, l_id = uid[is_l], ts[is_l], eid[is_l]
        hi = _rights_before(r_uid, r_ts, l_uid, l_ts, inclusive=False)
        lo = _rights_before(r_uid, r_ts, l_uid, l_ts - win_us,
                            inclusive=False)
        counts = hi - lo
        total = int(counts.sum())
        if total == 0:
            return empty
        rstart = np.searchsorted(r_uid, l_uid, side="left")
        off = np.concatenate(([0], np.cumsum(counts)))[:-1]
        ridx = (
            np.arange(total, dtype=np.int64)
            - np.repeat(off, counts)
            + np.repeat(rstart + lo, counts)
        )
        return pa.table({
            "user_id": pa.array(np.repeat(l_uid, counts), pa.int64()),
            "left_event_id": pa.array(np.repeat(l_id, counts), pa.int64()),
            "right_event_id": pa.array(r_id[ridx], pa.int64()),
        })

    return (
        events_ds.select_columns(["user_id", "event_id", "ts", "event_type"])
        .map_batches(add_part, batch_format="pyarrow")
        .groupby("part")
        .map_groups(pairs, batch_format="pyarrow")
    )


def top_orders_per_customer(orders_ds, n: int = 2, n_partitions: int = 256):
    """Ranked-window operator: the top-n orders per customer by price
    (ROW_NUMBER() OVER (PARTITION BY custkey ORDER BY price DESC, key)).
    One shuffle on the bounded ``custkey % n_partitions`` key (per-custkey
    grouping pays one Python call per customer — the winnow_pairs per-key
    overhead); one lexsort per partition group ranks every customer's
    orders at once."""

    def add_part(batch: pa.Table) -> pa.Table:
        part = batch["o_custkey"].to_numpy() % np.int64(n_partitions)
        return batch.append_column("part", pa.array(part, pa.int64()))

    def ranked(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "o_custkey": pa.array([], pa.int64()),
                "o_orderkey": pa.array([], pa.int64()),
                "o_totalprice": pa.array([], pa.float64()),
                "rn": pa.array([], pa.int64()),
            }
        )
        if group.num_rows == 0:
            return empty
        cust = group["o_custkey"].to_numpy()
        keys = group["o_orderkey"].to_numpy()
        prices = group["o_totalprice"].to_numpy()
        order = np.lexsort((keys, -prices, cust))
        scust = cust[order]
        starts = np.concatenate(([0], np.nonzero(np.diff(scust))[0] + 1))
        counts = np.diff(np.concatenate((starts, [scust.size])))
        rn = (
            np.arange(scust.size, dtype=np.int64)
            - np.repeat(starts, counts)
            + 1
        )
        keep = rn <= n
        out = group.select(
            ["o_custkey", "o_orderkey", "o_totalprice"]
        ).take(pa.array(order[keep], pa.int64()))
        return out.append_column("rn", pa.array(rn[keep], pa.int64()))

    return (
        orders_ds.select_columns(["o_custkey", "o_orderkey", "o_totalprice"])
        .map_batches(add_part, batch_format="pyarrow")
        .groupby("part")
        .map_groups(ranked, batch_format="pyarrow")
    )


def exact_distinct(ds, value_col: str, group_col: str):
    """Exact distributed COUNT(DISTINCT value) per group — the in-driver
    accuracy anchor for the HLL sketch (same 'group' key column).

    Shape: per-batch local distinct (Arrow group_by — shrinks the shuffle to
    the batch's distinct pairs), one shuffle on (group, value) to global
    distinct, then a partial count + tiny groupby sum. The raw values never
    shuffle more than once and never reach the driver."""

    def local_distinct(batch: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "group": pc.cast(batch[group_col], pa.string()),
                "value": pc.cast(batch[value_col], pa.string()),
            }
        )
        return t.group_by(["group", "value"]).aggregate([])

    # both shuffles group on bounded FNV partitions (a raw
    # (group, value) groupby pays one Python call per DISTINCT PAIR);
    # global distinct + per-group partial counts fold with Arrow's C++
    # hash-aggregate inside each partition group
    from ..ops.text import _fnv1a64_strings

    n_partitions = 256

    def add_part(batch: pa.Table) -> pa.Table:
        key = pc.binary_join_element_wise(
            batch["group"], batch["value"], pa.scalar("\x1f")
        )
        part = _fnv1a64_strings(key.combine_chunks()) % np.int64(
            n_partitions
        )
        return batch.append_column("part", pa.array(part, pa.int64()))

    def distinct_count_partial(group: pa.Table) -> pa.Table:
        # every copy of a (group, value) pair lands in this partition, so
        # the local distinct IS the global distinct for these pairs
        g = (
            group.select(["group", "value"])
            .group_by(["group", "value"])
            .aggregate([])
            .group_by("group")
            .aggregate([("value", "count")])
        )
        out = g.rename_columns(["group", "n_distinct"])
        part2 = _fnv1a64_strings(
            out["group"].combine_chunks()
        ) % np.int64(n_partitions)
        return out.append_column("part2", pa.array(part2, pa.int64()))

    def final_fold(group: pa.Table) -> pa.Table:
        g = (
            group.select(["group", "n_distinct"])
            .group_by("group")
            .aggregate([("n_distinct", "sum")])
        )
        return pa.table(
            {
                "group": g["group"],
                "n_distinct": g["n_distinct_sum"].cast(pa.int64()),
            }
        )

    return (
        ds.select_columns([group_col, value_col])
        .map_batches(local_distinct, batch_format="pyarrow")
        .map_batches(add_part, batch_format="pyarrow")
        .groupby("part")
        .map_groups(distinct_count_partial, batch_format="pyarrow")
        .groupby("part2")
        .map_groups(final_fold, batch_format="pyarrow")
    )


def _li_units(batch: pa.Table) -> pa.Array:
    """Exact integer ten-thousandths of extendedprice*(1-discount) — see
    pricing_summary for why money never sums as floats."""
    return pc.cast(
        pc.round(
            pc.multiply(
                pc.multiply(
                    batch["l_extendedprice"],
                    pc.subtract(pa.scalar(1.0), batch["l_discount"]),
                ),
                pa.scalar(10000.0),
            ),
            round_mode="half_towards_infinity",
        ),
        pa.int64(),
    )


def _prio_final(group: pa.Table) -> pa.Table:
    s = int(pc.sum(group["revenue"]).as_py())
    return pa.table(
        {
            "o_orderpriority": [group["o_orderpriority"][0].as_py()],
            "revenue": [((s + 50) // 100) / 100.0],
            "n_items": [int(pc.sum(group["n_items"]).as_py())],
        }
    )


def exact_top_counts(ds, value_col: str, k: int = 10):
    """Exact top-k values by occurrence count — the accuracy anchor for the
    count-min heavy-hitters sketch. Per-batch partial counts combine through
    one groupby(value); each count batch then emits only its local top-k
    (sort desc, value asc ties) and a final single-group merge picks the
    global top-k — k rows per batch is all that reaches the last stage."""

    def local_count(batch: pa.Table) -> pa.Table:
        t = pa.table({"value": pc.cast(batch[value_col], pa.string())})
        g = t.group_by("value").aggregate([("value", "count")])
        return g.rename_columns(["value", "n"])

    # per-value grouping pays one Python call per DISTINCT value (user
    # cardinality); bounded FNV partitions + Arrow C++ hash-aggregate
    n_partitions = 256

    def add_part(batch: pa.Table) -> pa.Table:
        from .text import _fnv1a64_strings

        part = _fnv1a64_strings(
            batch["value"].combine_chunks()
        ) % np.int64(n_partitions)
        return batch.append_column("part", pa.array(part, pa.int64()))

    def merge_counts(group: pa.Table) -> pa.Table:
        g = (
            group.select(["value", "n"])
            .group_by("value")
            .aggregate([("n", "sum")])
        )
        return pa.table(
            {"value": g["value"], "n": g["n_sum"].cast(pa.int64())}
        )

    def local_topk(batch: pa.Table) -> pa.Table:
        n = batch["n"].to_numpy()
        vals = np.array(batch["value"].to_pylist())
        order = np.lexsort((vals, -n))[:k]
        return pa.table(
            {
                "value": pa.array(vals[order], pa.string()),
                "n": pa.array(n[order], pa.int64()),
            }
        )

    def final_topk(group: pa.Table) -> pa.Table:
        n = group["n"].to_numpy()
        vals = np.array(group["value"].to_pylist())
        order = np.lexsort((vals, -n))[:k]
        return pa.table(
            {
                "value": pa.array(vals[order], pa.string()),
                "n": pa.array(n[order], pa.int64()),
                "rank": pa.array(np.arange(1, len(order) + 1), pa.int64()),
            }
        )

    counts = (
        ds.select_columns([value_col])
        .map_batches(local_count, batch_format="pyarrow")
        .map_batches(add_part, batch_format="pyarrow")
        .groupby("part")
        .map_groups(merge_counts, batch_format="pyarrow")
    )
    partial = counts.map_batches(local_topk, batch_format="pyarrow")
    return (
        partial.map_batches(
            lambda t: t.append_column("one", pa.array([1] * t.num_rows, pa.int32())),
            batch_format="pyarrow",
        )
        .groupby("one")
        .map_groups(
            lambda g: final_topk(g), batch_format="pyarrow"
        )
    )


def revenue_by_priority(
    lineitem_ds,
    orders_path: str,
    num_partitions: int = 32,
    broadcast_limit: int = 5_000_000,
):
    """Fact-to-fact join with size-aware strategy dispatch.

    Orders is a FACT table (~1/4 of lineitem's rows — round-1 verdict: a
    driver Python dict of o_orderkey -> priority is not broadcastable at
    sf1000). Two join paths, identical results (pytest-asserted):

    - build side <= ``broadcast_limit`` rows (parquet footer count): map-side
      broadcast join — the key column ships ONCE via ray.put as a sorted
      int64 numpy array + int8 priority codes (~9 bytes/row vs ~100 for a
      dict entry), probed per batch with np.searchsorted (vectorized, no
      Python loop); unmatched keys drop (inner-join semantics).
    - above the limit: Ray's distributed hash join on the order key, with a
      per-batch per-orderkey combiner shrinking the probe side ~4x before
      the shuffle.
    """
    import pyarrow.parquet as pq
    import ray

    from ..io import read_parquet_clean

    try:
        n_orders = pq.ParquetFile(orders_path).metadata.num_rows
    except Exception:
        n_orders = 1 << 62

    if n_orders <= broadcast_limit:
        orders = pq.read_table(
            orders_path, columns=["o_orderkey", "o_orderpriority"]
        )
        keys = orders["o_orderkey"].to_numpy()
        prio_dict = orders["o_orderpriority"].dictionary_encode().combine_chunks()
        names = prio_dict.dictionary.to_pylist()
        codes = prio_dict.indices.to_numpy(zero_copy_only=False).astype(np.int8)
        order_idx = np.argsort(keys, kind="stable")
        ref = ray.put((keys[order_idx], codes[order_idx], names))

        def bcast_partial(batch: pa.Table) -> pa.Table:
            skeys, scodes, snames = ray.get(ref)
            bkeys = batch["l_orderkey"].to_numpy()
            pos = np.searchsorted(skeys, bkeys)
            pos_c = np.clip(pos, 0, len(skeys) - 1)
            hit = skeys[pos_c] == bkeys
            units = _li_units(batch).to_numpy()[hit]
            code = scodes[pos_c[hit]]
            sums = np.zeros(len(snames), dtype=np.int64)
            cnts = np.zeros(len(snames), dtype=np.int64)
            np.add.at(sums, code, units)
            np.add.at(cnts, code, 1)
            nz = np.nonzero(cnts)[0]
            return pa.table(
                {
                    "o_orderpriority": pa.array(
                        [snames[i] for i in nz], pa.string()
                    ),
                    "revenue": pa.array(sums[nz], pa.int64()),
                    "n_items": pa.array(cnts[nz], pa.int64()),
                }
            )

        return (
            lineitem_ds.select_columns(
                ["l_orderkey", "l_extendedprice", "l_discount"]
            )
            .map_batches(bcast_partial, batch_format="pyarrow")
            .groupby("o_orderpriority")
            .map_groups(_prio_final, batch_format="pyarrow")
        )

    orders_ds = read_parquet_clean(
        orders_path, columns=["o_orderkey", "o_orderpriority"]
    )

    # Cap partitions to the session's CPU budget: Ray 2.49's hash-join
    # operator stalls when partition count far exceeds available slots
    # (observed at 32 partitions on a 4-CPU session).
    try:
        cpus = int(ray.cluster_resources().get("CPU", 8))
    except Exception:
        cpus = 8
    num_partitions = max(2, min(num_partitions, cpus))

    def lineitem_partial(batch: pa.Table) -> pa.Table:
        t = pa.table(
            {"l_orderkey": batch["l_orderkey"], "units": _li_units(batch)}
        )
        g = t.group_by("l_orderkey").aggregate(
            [("units", "sum"), ("units", "count")]
        )
        return g.rename_columns(["l_orderkey", "units", "n_items"])

    lpart = lineitem_ds.select_columns(
        ["l_orderkey", "l_extendedprice", "l_discount"]
    ).map_batches(lineitem_partial, batch_format="pyarrow")

    joined = lpart.join(
        orders_ds,
        join_type="inner",
        num_partitions=num_partitions,
        on=("l_orderkey",),
        right_on=("o_orderkey",),
    )

    def prio_partial(batch: pa.Table) -> pa.Table:
        g = batch.select(["o_orderpriority", "units", "n_items"]).group_by(
            "o_orderpriority"
        ).aggregate([("units", "sum"), ("n_items", "sum")])
        return g.rename_columns(["o_orderpriority", "revenue", "n_items"])

    return (
        joined.map_batches(prio_partial, batch_format="pyarrow")
        .groupby("o_orderpriority")
        .map_groups(_prio_final, batch_format="pyarrow")
    )


def parts_by_brand(part_ds):
    """Per-brand part stats: the partial-agg combiner over the part table.

    Exact integer cents for the retailprice sum (float-order-proof, same
    discipline as pricing_summary); min/max p_size ride the partials."""
    import ray

    def partial(batch: pa.Table) -> pa.Table:
        cents = pc.cast(
            pc.round(
                pc.multiply(batch["p_retailprice"], pa.scalar(100.0)),
                round_mode="half_towards_infinity",
            ),
            pa.int64(),
        )
        t = pa.table(
            {
                "p_brand": batch["p_brand"],
                "cents": cents,
                "p_size": batch["p_size"],
            }
        )
        g = t.group_by("p_brand").aggregate(
            [("cents", "sum"), ("cents", "count"),
             ("p_size", "min"), ("p_size", "max")]
        )
        return g.rename_columns(
            ["p_brand", "cents", "n_parts", "min_size", "max_size"]
        )

    def final(group: pa.Table) -> pa.Table:
        return pa.table(
            {
                "p_brand": [group["p_brand"][0].as_py()],
                "n_parts": [int(pc.sum(group["n_parts"]).as_py())],
                "sum_retail": [int(pc.sum(group["cents"]).as_py()) / 100.0],
                "min_size": [int(pc.min(group["min_size"]).as_py())],
                "max_size": [int(pc.max(group["max_size"]).as_py())],
            }
        )

    return (
        part_ds.select_columns(["p_brand", "p_retailprice", "p_size"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("p_brand")
        .map_groups(final, batch_format="pyarrow")
    )


def supplier_region_stats(supplier_ds, nation_path: str, region_path: str):
    """Suppliers per region: two chained BROADCAST dimension joins
    (supplier -> nation -> region, both dims tiny) + exact-cents acctbal
    sums through the partial/combiner groupby."""
    import pyarrow.parquet as pq
    import ray

    nat = pq.read_table(nation_path, columns=["n_nationkey", "n_regionkey"])
    reg = pq.read_table(region_path, columns=["r_regionkey", "r_name"])
    # dense nationkey -> region CODE array + region-code -> name list:
    # the supplier side is fact-scaled, so the probe must be a vectorized
    # np.take + np.add.at, never a per-row Python dict chain
    nk = nat["n_nationkey"].to_numpy()
    rk = nat["n_regionkey"].to_numpy().astype(np.int64)
    rkeys = reg["r_regionkey"].to_numpy()
    rnames = reg["r_name"].to_pylist()
    max_rk = int(rkeys.max()) if len(rkeys) else 0
    name_by_rk: list = [None] * (max_rk + 1)
    for k, nm in zip(rkeys, rnames):
        name_by_rk[int(k)] = nm
    max_nk = int(nk.max()) if len(nk) else 0
    code_by_nk = np.full(max_nk + 1, -1, dtype=np.int64)
    code_by_nk[nk] = np.where(rk <= max_rk, rk, -1)
    ref = ray.put((code_by_nk, name_by_rk))

    def partial(batch: pa.Table) -> pa.Table:
        codes, names = ray.get(ref)
        n = batch["s_nationkey"].to_numpy()
        inb = (n >= 0) & (n < len(codes))
        code = np.where(inb, codes[np.clip(n, 0, len(codes) - 1)], -1)
        cents = pc.cast(
            pc.round(
                pc.multiply(batch["s_acctbal"], pa.scalar(100.0)),
                round_mode="half_towards_infinity",
            ),
            pa.int64(),
        ).to_numpy()
        hit = code >= 0
        sums = np.zeros(len(names), dtype=np.int64)
        cnts = np.zeros(len(names), dtype=np.int64)
        np.add.at(sums, code[hit], cents[hit])
        np.add.at(cnts, code[hit], 1)
        nz = [i for i in np.nonzero(cnts)[0] if names[i] is not None]
        return pa.table(
            {
                "r_name": pa.array([names[i] for i in nz], pa.string()),
                "cents": pa.array(sums[nz], pa.int64()),
                "n_suppliers": pa.array(cnts[nz], pa.int64()),
            }
        )

    def final(group: pa.Table) -> pa.Table:
        return pa.table(
            {
                "r_name": [group["r_name"][0].as_py()],
                "n_suppliers": [int(pc.sum(group["n_suppliers"]).as_py())],
                "sum_acctbal": [int(pc.sum(group["cents"]).as_py()) / 100.0],
            }
        )

    return (
        supplier_ds.select_columns(["s_nationkey", "s_acctbal"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("r_name")
        .map_groups(final, batch_format="pyarrow")
    )


def catalog_census(images_ds):
    """Per-format census of an image catalog — the cheap first pass over a
    100 TB corpus (what's in here, how big, what dims) before any decode:
    count, total payload bytes, mean dims per ``fmt``. Column-pruned scan
    + one tiny groupby; payload bytes measured via Arrow binary lengths
    (zero-copy, no decode)."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Count, Mean, Sum

    def measure(batch: pa.Table) -> pa.Table:
        return pa.table({
            "fmt": batch["fmt"],
            "nbytes": pc.cast(pc.binary_length(batch["bytes"]), pa.int64()),
            "w": batch["w"],
            "h": batch["h"],
        })

    out = (
        images_ds.map_batches(measure, batch_format="pyarrow")
        .groupby("fmt")
        .aggregate(Count(), Sum("nbytes"), Mean("w"), Mean("h"))
    )

    def finalize(batch: pa.Table) -> pa.Table:
        return pa.table({
            "fmt": batch["fmt"],
            "n_images": pc.cast(batch["count()"], pa.int64()),
            "total_bytes": pc.cast(batch["sum(nbytes)"], pa.int64()),
            "avg_w": pc.round(batch["mean(w)"], 2),
            "avg_h": pc.round(batch["mean(h)"], 2),
        })

    return out.map_batches(finalize, batch_format="pyarrow").sort("fmt")



def event_funnel(events_ds, steps=("view", "click", "purchase")):
    """Ordered multi-step funnel: users whose first step-1 event is
    followed (strictly later) by a step-2 event, then step-3, etc.
    Returns (step, n_users) with steps labeled ``step<i>_<type>``.

    One user-keyed shuffle (the same key sessionize uses); the per-user
    scan is a vectorized min-over-mask per step; only (step, 1) partial
    rows leave the group, so the final count is a tiny 1-key-per-step
    groupby.
    """
    step_list = list(steps)
    n_partitions = 256

    def add_part(batch: pa.Table) -> pa.Table:
        part = batch["user_id"].to_numpy() % np.int64(n_partitions)
        return batch.append_column("part", pa.array(part, pa.int64()))

    def per_users(group: pa.Table) -> pa.Table:
        # vectorized over EVERY user in a bounded partition group (per-user
        # grouping pays one Python call per user): the per-step "first
        # qualifying event after the previous step" is a masked
        # minimum.reduceat per user; a user that misses a step carries +inf
        # forward, so later steps auto-fail — the short loop is over the
        # handful of funnel steps, never over users or events
        if group.num_rows == 0:
            return pa.table({
                "step": pa.array([], pa.string()),
                "one": pa.array([], pa.int64()),
            })
        uid = group["user_id"].to_numpy()
        ts = group["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        et = np.asarray(group["event_type"].to_pylist())
        order = np.argsort(uid, kind="stable")
        uid, ts, et = uid[order], ts[order], et[order]
        starts = np.concatenate(([0], np.nonzero(np.diff(uid))[0] + 1))
        counts = np.diff(np.concatenate((starts, [uid.size])))
        inf = np.iinfo(np.int64).max
        # int64 carry: a user that misses a step gets t_prev = +inf, so
        # ts > t_prev can never hold again (exact — no float µs epochs)
        t_prev = np.full(starts.size, np.iinfo(np.int64).min)
        out_steps, out_n = [], []
        for i, step in enumerate(step_list):
            mask = (et == step) & (ts > np.repeat(t_prev, counts))
            tt = np.where(mask, ts, inf)
            m = np.minimum.reduceat(tt, starts)
            n = int((m < inf).sum())
            if n == 0:
                break
            out_steps.append(f"step{i + 1}_{step}")
            out_n.append(n)
            t_prev = m
        return pa.table({
            "step": pa.array(out_steps, pa.string()),
            "one": pa.array(out_n, pa.int64()),
        })

    def count_step(group: pa.Table) -> pa.Table:
        return pa.table({
            "step": pa.array([group["step"][0].as_py()], pa.string()),
            "n_users": pa.array(
                [int(group["one"].to_numpy().sum())], pa.int64()),
        })

    return (
        events_ds.select_columns(["user_id", "ts", "event_type"])
        .map_batches(add_part, batch_format="pyarrow")
        .groupby("part")
        .map_groups(per_users, batch_format="pyarrow")
        .groupby("step")  # bounded: one key per funnel step
        .map_groups(count_step, batch_format="pyarrow")
    )


def events_hopping_window(events_ds, size_s: int = 3600,
                          slide_s: int = 900):
    """Hopping (sliding) windowed aggregate per event type: fixed-size
    windows of ``size_s`` seconds starting every ``slide_s`` seconds —
    the streaming-window custom operator Ray Data lacks natively.

    Shape: each event fans out to exactly ``size_s // slide_s`` window
    starts (bounded replication, vectorized), a per-batch pre-aggregate
    collapses the fan-out before the shuffle, and one tiny groupby
    (event_type, window_start) finalizes. Money stays integer cents until
    the final divide (same exactness discipline as events_daily).

    ``slide_s`` must divide ``size_s`` so every event covers the same
    number of windows (the standard hopping-window restriction).
    """
    if size_s % slide_s != 0:
        raise ValueError("slide_s must divide size_s")
    nrep = size_s // slide_s

    def _floor_div(arr, b: int):
        # Arrow integer divide truncates toward zero; the oracle's // is
        # floor — pre-epoch (negative) timestamps would land one window
        # late. b > 0, so floor = trunc - (remainder < 0).
        q = pc.divide(arr, pa.scalar(b, pa.int64()))
        r = pc.subtract(arr, pc.multiply(q, pa.scalar(b, pa.int64())))
        return pc.subtract(
            q, pc.cast(pc.less(r, pa.scalar(0, pa.int64())), pa.int64())
        )

    def partial(batch: pa.Table) -> pa.Table:
        tsec = _floor_div(batch["ts"].cast(pa.int64()), 1_000_000)
        base = pc.multiply(
            _floor_div(tsec, slide_s),
            pa.scalar(slide_s, pa.int64()),
        )
        cents = pc.cast(
            pc.round(pc.multiply(batch["value"], pa.scalar(100.0)),
                     round_mode="half_towards_infinity"),
            pa.int64(),
        )
        small = pa.table({
            "event_type": batch["event_type"],
            "base": base,
            "cents": cents,
        })
        pieces = []
        for i in range(nrep):
            w = pc.subtract(small["base"],
                            pa.scalar(i * slide_s, pa.int64()))
            pieces.append(pa.table({
                "event_type": small["event_type"],
                "wstart": w,
                "cents": small["cents"],
            }))
        fan = pa.concat_tables(pieces)
        g = fan.group_by(["event_type", "wstart"]).aggregate(
            [("cents", "sum"), ("cents", "count")]
        )
        return g.rename_columns(
            ["event_type", "wstart", "sum_cents", "n_events"]
        )

    def final(group: pa.Table) -> pa.Table:
        w = int(group["wstart"][0].as_py())
        # timestamp[s]: pyarrow's %S appends fractional digits for [us]
        ts = pa.array([w], pa.timestamp("s"))
        return pa.table({
            "event_type": [group["event_type"][0].as_py()],
            "window_start": pc.strftime(ts, format="%Y-%m-%d %H:%M:%S"),
            "n_events": [int(pc.sum(group["n_events"]).as_py())],
            "sum_value": [int(pc.sum(group["sum_cents"]).as_py()) / 100.0],
        })

    return (
        events_ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["event_type", "wstart"])
        .map_groups(final, batch_format="pyarrow")
    )


def events_rollup(events_ds):
    """GROUP BY ROLLUP(event_type, day): the three-grain subtotal lattice
    ((type, day) -> (type) -> grand total), computed by fanning the TINY
    finest-grain daily table out 3x and re-grouping — never re-reading the
    raw events. 'ALL' stands in for SQL ROLLUP's NULL keys so the schema
    stays string-typed. Exact integer cents end-to-end."""

    daily = events_daily(events_ds)

    def expand(batch: pa.Table) -> pa.Table:
        cents = pc.cast(
            pc.round(pc.multiply(batch["sum_value"], pa.scalar(100.0)),
                     round_mode="half_towards_infinity"),
            pa.int64(),
        )
        n = pc.cast(batch["n_events"], pa.int64())
        allc = pa.array(["ALL"] * batch.num_rows, pa.string())
        pieces = [
            pa.table({"event_type": batch["event_type"], "day": batch["day"],
                      "n": n, "cents": cents}),
            pa.table({"event_type": batch["event_type"], "day": allc,
                      "n": n, "cents": cents}),
            pa.table({"event_type": allc, "day": allc,
                      "n": n, "cents": cents}),
        ]
        return pa.concat_tables(pieces)

    def final(group: pa.Table) -> pa.Table:
        return pa.table({
            "event_type": [group["event_type"][0].as_py()],
            "day": [group["day"][0].as_py()],
            "n_events": [int(pc.sum(group["n"]).as_py())],
            "sum_value": [int(pc.sum(group["cents"]).as_py()) / 100.0],
        })

    return (
        daily.map_batches(expand, batch_format="pyarrow")
        .groupby(["event_type", "day"])
        .map_groups(final, batch_format="pyarrow")
    )


def events_cumulative(events_ds):
    """Per-user running sum of value (window-function custom operator:
    SUM() OVER (PARTITION BY user ORDER BY ts, event_id)). One groupby on
    user_id; inside each group a vectorized sort + integer-cents cumsum —
    money stays exact integers until the final divide (the events_daily
    discipline). Returns (event_id, user_id, cum_value)."""

    n_partitions = 256

    def add_part(batch: pa.Table) -> pa.Table:
        part = batch["user_id"].to_numpy() % np.int64(n_partitions)
        return batch.append_column("part", pa.array(part, pa.int64()))

    def per_users(group: pa.Table) -> pa.Table:
        # segmented cumsum over a bounded user-partition group (per-user
        # grouping pays one Python call per user): one lexsort, one global
        # cumsum, per-user rebase via the segment's first element
        empty = pa.table({
            "event_id": pa.array([], pa.int64()),
            "user_id": pa.array([], pa.int64()),
            "cum_value": pa.array([], pa.float64()),
        })
        if group.num_rows == 0:
            return empty
        uid = group["user_id"].to_numpy()
        ts = group["ts"].cast(pa.int64()).to_numpy()
        eid = group["event_id"].to_numpy()
        order = np.lexsort((eid, ts, uid))
        uid, eid = uid[order], eid[order]
        cents = np.rint(
            group["value"].to_numpy(zero_copy_only=False)[order] * 100.0
        ).astype(np.int64)
        cum = np.cumsum(cents)
        starts = np.concatenate(([0], np.nonzero(np.diff(uid))[0] + 1))
        counts = np.diff(np.concatenate((starts, [uid.size])))
        base = np.repeat(cum[starts] - cents[starts], counts)
        return pa.table({
            "event_id": pa.array(eid, pa.int64()),
            "user_id": pa.array(uid, pa.int64()),
            "cum_value": pa.array((cum - base) / 100.0, pa.float64()),
        })

    return (
        events_ds.select_columns(["event_id", "ts", "user_id", "value"])
        .map_batches(add_part, batch_format="pyarrow")
        .groupby("part")
        .map_groups(per_users, batch_format="pyarrow")
    )


def events_gap_stats(events_ds):
    """Per-user inter-event-gap statistics (LAG window function):
    consecutive-event gaps in integer MICROSECONDS ordered by (ts,
    event_id) — pure-integer outputs so the oracle comparison is exact.
    Returns (user_id, n_events, sum_gap_us, max_gap_us); users with one
    event report zero gaps."""

    n_partitions = 256

    def add_part(batch: pa.Table) -> pa.Table:
        part = batch["user_id"].to_numpy() % np.int64(n_partitions)
        return batch.append_column("part", pa.array(part, pa.int64()))

    def per_users(group: pa.Table) -> pa.Table:
        # vectorized over a bounded user-partition group: sum of
        # consecutive gaps telescopes to last-first per user; max gap is a
        # maximum.reduceat over the diff array with the cross-user
        # boundary diffs masked out (single-event users overwrite to 0)
        empty = pa.table({
            "user_id": pa.array([], pa.int64()),
            "n_events": pa.array([], pa.int64()),
            "sum_gap_us": pa.array([], pa.int64()),
            "max_gap_us": pa.array([], pa.int64()),
        })
        if group.num_rows == 0:
            return empty
        uid = group["user_id"].to_numpy()
        ts = group["ts"].cast(pa.int64()).to_numpy()
        eid = group["event_id"].to_numpy()
        order = np.lexsort((eid, ts, uid))
        uid, t = uid[order], ts[order]
        starts = np.concatenate(([0], np.nonzero(np.diff(uid))[0] + 1))
        counts = np.diff(np.concatenate((starts, [uid.size])))
        ends = starts + counts - 1
        sum_gap = t[ends] - t[starts]
        max_gap = np.zeros(starts.size, dtype=np.int64)
        d = np.diff(t)
        if d.size:
            d = d.copy()
            d[starts[1:] - 1] = np.iinfo(np.int64).min  # mask boundaries
            m = np.maximum.reduceat(
                d, np.minimum(starts, d.size - 1)
            )
            multi = counts > 1
            max_gap[multi] = m[multi]
        return pa.table({
            "user_id": pa.array(uid[starts], pa.int64()),
            "n_events": pa.array(counts.astype(np.int64), pa.int64()),
            "sum_gap_us": pa.array(sum_gap.astype(np.int64), pa.int64()),
            "max_gap_us": pa.array(max_gap, pa.int64()),
        })

    return (
        events_ds.select_columns(["event_id", "ts", "user_id"])
        .map_batches(add_part, batch_format="pyarrow")
        .groupby("part")
        .map_groups(per_users, batch_format="pyarrow")
    )


def ntile_by(ds, order_col: str, id_col: str, n_buckets: int = 4):
    """Global NTILE(n) OVER (ORDER BY order_col, id_col) WITHOUT a global
    sort: pass 1 counts rows per distinct order value (tiny groupby —
    bounded by the value cardinality, the documented assumption; use a
    quantile sketch first for continuous columns), the driver folds
    cumulative offsets, and pass 2 ranks each value's rows locally (sorted
    by id) against the broadcast offsets. SQL NTILE semantics exactly:
    bucket sizes differ by at most one, larger buckets first.

    Returns (id_col, order_col, bucket)."""
    counts = (
        ds.select_columns([order_col])
        .groupby(order_col)
        .count()
        .take_all()
    )
    counts.sort(key=lambda r: r[order_col])
    total = sum(r["count()"] for r in counts)
    offsets = {}
    acc = 0
    for r in counts:
        offsets[r[order_col]] = acc
        acc += r["count()"]
    size_big = -(-total // n_buckets)  # ceil
    n_big = total % n_buckets
    if n_big == 0:
        n_big = n_buckets  # all buckets equal (and "big")
    big_span = n_big * size_big
    size_small = total // n_buckets

    def per_value(group: pa.Table) -> pa.Table:
        ids = group[id_col].to_numpy()
        order = np.argsort(ids, kind="stable")
        v = group[order_col][0].as_py()
        rank0 = offsets[v] + np.arange(len(ids))  # 0-based global rank
        bucket = np.where(
            rank0 < big_span,
            rank0 // size_big,
            n_big + (rank0 - big_span) // max(size_small, 1),
        ) + 1
        return pa.table({
            id_col: pa.array(ids[order]),
            order_col: group[order_col].take(
                pa.array(order, pa.int64())),
            "bucket": pa.array(bucket.astype(np.int64), pa.int64()),
        })

    return (
        ds.select_columns([id_col, order_col])
        .groupby(order_col)
        .map_groups(per_value, batch_format="pyarrow")
    )


def events_above_quantile(events_ds, p: float = 0.99):
    """Per-type tail-outlier filter: events whose value strictly exceeds
    the type's exact discrete p-quantile (quantile_disc — a member of the
    data, so the threshold comparison is bitwise-stable and the oracle
    hash-matches without float tolerance).

    Two-pass, both scale-safe: pass 1 is exact_group_quantiles (one
    shuffle on the bounded-cardinality type key, tiny driver collect of
    one row per type); pass 2 broadcasts the thresholds in the stage
    closure and filters each batch vectorized. Returns (event_id,
    event_type, value)."""
    thr_rows = exact_group_quantiles(
        events_ds, "value", "event_type", qs=(p,)
    ).take_all()
    thr = {r["event_type"]: r["value"] for r in thr_rows}

    def keep(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        types = batch["event_type"].to_pylist()
        t = np.array([thr[x] for x in types], dtype=np.float64)
        mask = batch["value"].to_numpy(zero_copy_only=False) > t
        return batch.filter(pa.array(mask))

    return (
        events_ds.select_columns(["event_id", "event_type", "value"])
        .map_batches(keep, batch_format="pyarrow")
    )


def events_pivot(
    events_ds,
    types=("click", "error", "purchase", "signup", "view"),
    n_partitions: int = 256,
):
    """Per-user event-type pivot: one row per user with an ``n_<type>``
    count column per listed type plus ``n_total`` (the classic
    wide-activity-matrix feature table; SUM(CASE ...) in SQL).

    Scale shape: a per-batch combiner collapses raw events to
    (user, type, cnt) partials BEFORE the shuffle, and the final combine
    groups on ``user_id % n_partitions`` — a bounded partition key — with
    the per-user pivot built vectorized (sort + reduceat + scatter) inside
    each group. Grouping on raw user_id would pay one Python call per
    user (the per-key overhead that made winnow_pairs 4x slower; see
    ops/dedup.py winnow_pairs).
    """
    types = tuple(types)
    tcount = len(types)
    type_arr = pa.array(types, pa.string())

    def partial(batch: pa.Table) -> pa.Table:
        tix = pc.index_in(batch["event_type"], value_set=type_arr)
        mask = pc.is_valid(tix)
        uid = pc.filter(batch["user_id"], mask).to_numpy()
        ti = pc.filter(tix, mask).to_numpy(zero_copy_only=False).astype(np.int64)
        key = uid * np.int64(tcount) + ti
        ukey, cnt = np.unique(key, return_counts=True)
        uu = ukey // np.int64(tcount)
        return pa.table(
            {
                "user_id": pa.array(uu, pa.int64()),
                "tix": pa.array(ukey - uu * np.int64(tcount), pa.int64()),
                "cnt": pa.array(cnt.astype(np.int64), pa.int64()),
                "part": pa.array(uu % np.int64(n_partitions), pa.int64()),
            }
        )

    partials = events_ds.select_columns(["user_id", "event_type"]).map_batches(
        partial, batch_format="pyarrow"
    )

    def pivot(group: pa.Table) -> pa.Table:
        cols = {
            "user_id": pa.array([], pa.int64()),
            **{f"n_{t}": pa.array([], pa.int64()) for t in types},
            "n_total": pa.array([], pa.int64()),
        }
        if group.num_rows == 0:
            return pa.table(cols)
        uid = group["user_id"].to_numpy()
        tix = group["tix"].to_numpy()
        cnt = group["cnt"].to_numpy()
        key = uid * np.int64(tcount) + tix
        order = np.argsort(key, kind="stable")
        key, cnt = key[order], cnt[order]
        change = np.nonzero(np.diff(key))[0] + 1
        starts = np.concatenate(([0], change))
        tot = np.add.reduceat(cnt, starts)
        ukey = key[starts]
        users = np.unique(ukey // np.int64(tcount))
        mat = np.zeros((users.size, tcount), dtype=np.int64)
        rix = np.searchsorted(users, ukey // np.int64(tcount))
        mat[rix, ukey % np.int64(tcount)] = tot
        out = {"user_id": pa.array(users, pa.int64())}
        for j, t in enumerate(types):
            out[f"n_{t}"] = pa.array(mat[:, j], pa.int64())
        out["n_total"] = pa.array(mat.sum(axis=1), pa.int64())
        return pa.table(out)

    return partials.groupby("part").map_groups(pivot, batch_format="pyarrow")


_WEEK_US = 7 * 86400 * 1_000_000


def cohort_retention(
    events_ds,
    unit: str = "week",
    event_type: str | None = None,
    n_partitions: int = 256,
):
    """Cohort retention: users are cohorted by the epoch-period (``unit``
    = "week" or "day") of their FIRST qualifying event; a cohort member
    is retained iff they have any qualifying event in the immediately
    following period. ``event_type`` restricts which events qualify
    (None = all). Returns one row per cohort_wk:
    (cohort_wk, n_users, n_retained).

    Scale shape: per-batch distinct (user, period) rows (numpy floor
    division — trunc would misplace pre-epoch periods), one shuffle on
    the bounded ``user_id % n_partitions`` key with the per-user
    min-period + next-period-membership test fully vectorized inside
    each group (packed (user, period) keys, searchsorted membership),
    then a tiny groupby over the handful of distinct cohort periods.
    """
    if n_partitions < 1:
        raise ValueError("cohort_retention: n_partitions must be >= 1")
    unit_us = {"week": _WEEK_US, "day": 86400 * 1_000_000}[unit]

    def user_weeks(batch: pa.Table) -> pa.Table:
        if event_type is not None:
            batch = batch.filter(
                pc.equal(batch["event_type"], pa.scalar(event_type))
            )
        us = batch["ts"].cast(pa.int64()).to_numpy()
        wk = us // np.int64(unit_us)  # numpy int // floors (oracle parity)
        uid = batch["user_id"].to_numpy()
        if wk.size and (wk.min() < 0 or wk.max() >= (1 << 20)):
            raise ValueError("cohort_retention: week index out of packed range")
        key = np.unique((uid.astype(np.int64) << np.int64(20)) | wk)
        uu = key >> np.int64(20)
        return pa.table(
            {
                "uw": pa.array(key, pa.int64()),
                "part": pa.array(uu % np.int64(n_partitions), pa.int64()),
            }
        )

    cols = ["user_id", "ts"] + ([] if event_type is None else ["event_type"])
    uw = events_ds.select_columns(cols).map_batches(
        user_weeks, batch_format="pyarrow"
    )

    def per_user(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "cohort_wk": pa.array([], pa.int64()),
                "n_users": pa.array([], pa.int64()),
                "n_retained": pa.array([], pa.int64()),
            }
        )
        if group.num_rows == 0:
            return empty
        key = np.unique(group["uw"].to_numpy())  # sorted (user, week)
        uid = key >> np.int64(20)
        starts = np.concatenate(([0], np.nonzero(np.diff(uid))[0] + 1))
        first = key[starts]  # per-user smallest week (sorted order)
        cohort = first & np.int64((1 << 20) - 1)
        retained = np.zeros(first.size, dtype=np.int64)
        probe = first + 1  # same user, cohort week + 1
        pos = np.searchsorted(key, probe)
        hit = pos < key.size
        retained[hit] = (key[pos[hit]] == probe[hit]).astype(np.int64)
        order = np.argsort(cohort, kind="stable")
        cohort, retained = cohort[order], retained[order]
        cstarts = np.concatenate(([0], np.nonzero(np.diff(cohort))[0] + 1))
        return pa.table(
            {
                "cohort_wk": pa.array(cohort[cstarts], pa.int64()),
                "n_users": pa.array(
                    np.diff(np.concatenate((cstarts, [cohort.size]))).astype(
                        np.int64
                    ),
                    pa.int64(),
                ),
                "n_retained": pa.array(
                    np.add.reduceat(retained, cstarts), pa.int64()
                ),
            }
        )

    per_part = uw.groupby("part").map_groups(per_user, batch_format="pyarrow")

    def rename(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "cohort_wk": batch["cohort_wk"],
                "n_users": batch["sum(n_users)"].cast(pa.int64()),
                "n_retained": batch["sum(n_retained)"].cast(pa.int64()),
            }
        )

    return (
        per_part.groupby("cohort_wk")
        .sum(["n_users", "n_retained"])
        .map_batches(rename, batch_format="pyarrow")
    )


def anti_join_keys(left_ds, keys_ds, left_key: str, key_col: str,
                   broadcast_limit: int = 5_000_000,
                   num_partitions: int | None = None):
    """Generic ANTI JOIN: rows of ``left_ds`` whose ``left_key`` appears
    NOWHERE in ``keys_ds[key_col]`` (SQL NOT EXISTS). Size-aware dispatch,
    the neardup_filter discipline:

    - probe side <= ``broadcast_limit`` distinct keys: ship the distinct
      sorted int64 keys ONCE via ray.put; each left batch drops matches
      with one vectorized np.searchsorted — the left side never shuffles.
    - above the limit: Ray's distributed left_outer hash join against the
      distinct-key table (partitions capped to CPU slots — Ray's hash
      join stalls when partitions far exceed them, CLAUDE.md), keeping
      rows whose join marker is null.
    """
    import ray

    def key_partial(batch: pa.Table) -> pa.Table:
        u = np.unique(batch[key_col].to_numpy())
        return pa.table({
            key_col: pa.array(u, pa.int64()),
            "part": pa.array(u % np.int64(256), pa.int64()),
        })

    def key_fold(group: pa.Table) -> pa.Table:
        u = np.unique(group[key_col].to_numpy())
        return pa.table({key_col: pa.array(u, pa.int64())})

    distinct = (
        keys_ds.select_columns([key_col])
        .map_batches(key_partial, batch_format="pyarrow")
        .groupby("part")
        .map_groups(key_fold, batch_format="pyarrow")
        .materialize()
    )
    n_keys = distinct.count()

    if n_keys <= broadcast_limit:
        blocks = [t for t in ray.get(distinct.to_arrow_refs())
                  if t.num_rows > 0]
        keys = (
            np.sort(
                np.concatenate([t[key_col].to_numpy() for t in blocks])
            )
            if blocks else np.empty(0, np.int64)
        )
        ref = ray.put(keys)

        def drop_matches(batch: pa.Table) -> pa.Table:
            k = ray.get(ref)
            ids = batch[left_key].to_numpy()
            if k.size == 0:
                return batch
            pos = np.clip(np.searchsorted(k, ids), 0, k.size - 1)
            return batch.filter(pa.array(k[pos] != ids))

        return left_ds.map_batches(drop_matches, batch_format="pyarrow")

    try:
        cpus = int(ray.cluster_resources().get("CPU", 8))
    except Exception:
        cpus = 8
    nparts = num_partitions or max(2, min(16, cpus))
    marked = distinct.map_batches(
        lambda t: t.append_column(
            "__hit", pa.array(np.ones(t.num_rows, np.int8), pa.int8())
        ),
        batch_format="pyarrow",
    )
    joined = left_ds.join(
        marked, join_type="left_outer", num_partitions=nparts,
        on=(left_key,), right_on=(key_col,),
    )

    def keep_misses(batch: pa.Table) -> pa.Table:
        out = batch.filter(pc.is_null(batch["__hit"]))
        drop = [c for c in ("__hit", key_col) if c in out.column_names]
        return out.drop_columns(drop)

    return joined.map_batches(keep_misses, batch_format="pyarrow")


def cohort_retention_matrix(
    events_ds,
    unit: str = "day",
    event_type: str | None = None,
    max_offset: int = 7,
    n_partitions: int = 256,
):
    """The full retention triangle: for each cohort (period of a user's
    FIRST qualifying event) and offset 0..max_offset, how many cohort
    members were active in cohort+offset. Offset 0 is the cohort size by
    construction. Returns (cohort_wk, offset, n_active).

    Same machinery as cohort_retention: distinct (user, period) packed
    keys, bounded user partitions, per-user offsets fully vectorized
    (first-period broadcast via repeat), partial (cohort, offset) counts
    per group, one tiny final groupby over the bounded cohort x offset
    lattice."""
    if max_offset < 0:
        raise ValueError("cohort_retention_matrix: max_offset must be >= 0")
    unit_us = {"week": _WEEK_US, "day": 86400 * 1_000_000}[unit]

    def user_weeks(batch: pa.Table) -> pa.Table:
        if event_type is not None:
            batch = batch.filter(
                pc.equal(batch["event_type"], pa.scalar(event_type))
            )
        us = batch["ts"].cast(pa.int64()).to_numpy()
        wk = us // np.int64(unit_us)
        uid = batch["user_id"].to_numpy()
        if wk.size and (wk.min() < 0 or wk.max() >= (1 << 20)):
            raise ValueError(
                "cohort_retention_matrix: period index out of packed range"
            )
        key = np.unique((uid.astype(np.int64) << np.int64(20)) | wk)
        uu = key >> np.int64(20)
        return pa.table(
            {
                "uw": pa.array(key, pa.int64()),
                "part": pa.array(uu % np.int64(n_partitions), pa.int64()),
            }
        )

    cols = ["user_id", "ts"] + ([] if event_type is None else ["event_type"])
    uw = events_ds.select_columns(cols).map_batches(
        user_weeks, batch_format="pyarrow"
    )

    def per_users(group: pa.Table) -> pa.Table:
        empty = pa.table({
            "cohort_wk": pa.array([], pa.int64()),
            "offset": pa.array([], pa.int64()),
            "n": pa.array([], pa.int64()),
        })
        if group.num_rows == 0:
            return empty
        key = np.unique(group["uw"].to_numpy())
        uid = key >> np.int64(20)
        wk = key & np.int64((1 << 20) - 1)
        starts = np.concatenate(([0], np.nonzero(np.diff(uid))[0] + 1))
        counts = np.diff(np.concatenate((starts, [uid.size])))
        cohort = np.repeat(wk[starts], counts)  # per-row first period
        off = wk - cohort
        keep = off <= max_offset  # off >= 0 by sortedness
        pairs = (cohort[keep] << np.int64(20)) | off[keep]
        up, cnt = np.unique(pairs, return_counts=True)
        return pa.table({
            "cohort_wk": pa.array(up >> np.int64(20), pa.int64()),
            "offset": pa.array(up & np.int64((1 << 20) - 1), pa.int64()),
            "n": pa.array(cnt.astype(np.int64), pa.int64()),
        })

    per_part = uw.groupby("part").map_groups(
        per_users, batch_format="pyarrow"
    )

    def rename(batch: pa.Table) -> pa.Table:
        return pa.table({
            "cohort_wk": batch["cohort_wk"],
            "offset": batch["offset"],
            "n_active": batch["sum(n)"].cast(pa.int64()),
        })

    return (
        per_part.groupby(["cohort_wk", "offset"])  # bounded lattice
        .sum("n")
        .map_batches(rename, batch_format="pyarrow")
    )


def _frontier_mask_2d(x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """Boolean mask of the 2-D Pareto frontier (maximize both axes).

    Row p is dominated iff some q has (x_q >= x_p, y_q >= y_p) with at
    least one strict. Vectorized O(n log n): sort by (x desc, y desc);
    within an x-tie group only the group's max-y rows survive, and a row
    survives earlier groups only if its y strictly exceeds every y seen
    at strictly larger x (prefix max over group heads).
    """
    n = x.size
    if n == 0:
        return np.zeros(0, dtype=bool)
    order = np.lexsort((-y, -x))
    xs, ys = x[order], y[order]
    head = np.empty(n, dtype=bool)
    head[0] = True
    head[1:] = xs[1:] != xs[:-1]
    gid = np.cumsum(head) - 1
    gmax = ys[head]  # y sorted desc within group -> head is the group max
    prev = np.concatenate(([np.int64(np.iinfo(np.int64).min)]
                           if ys.dtype.kind in "iu" else [-np.inf],
                           np.maximum.accumulate(gmax)[:-1]))
    keep_sorted = (ys == gmax[gid]) & (ys > prev[gid])
    mask = np.zeros(n, dtype=bool)
    mask[order] = keep_sorted
    return mask


def pareto_frontier(ds, x_col: str, y_col: str, keep_cols=None):
    """Skyline: rows not dominated on (x_col, y_col), both maximized.
    Ties that are equal on BOTH axes all survive (neither dominates).

    Distributed shape — local-prune + merge: every batch emits only its
    own frontier (O(distinct x) rows, tiny), and one final pass takes the
    frontier of the union. Correct because dominance is transitive: a row
    dominated globally is dominated by some row that is itself on its
    batch's local frontier, so pruning non-frontier rows early never
    removes a witness. At 100 TB the shuffle carries only the per-block
    frontiers — the raw table never moves.

    Nulls on either axis are excluded up front (SQL comparison semantics:
    a NULL row neither dominates nor lands on the frontier).
    """
    cols = list(dict.fromkeys([*(keep_cols or []), x_col, y_col]))

    def local(batch: pa.Table) -> pa.Table:
        batch = batch.select(cols).filter(
            pc.and_(pc.is_valid(batch[x_col]), pc.is_valid(batch[y_col]))
        )
        if batch.num_rows == 0:
            return batch.append_column("_k", pa.array([], pa.int32()))
        mask = _frontier_mask_2d(
            batch[x_col].to_numpy(), batch[y_col].to_numpy()
        )
        out = batch.filter(pa.array(mask))
        return out.append_column(
            "_k", pa.array(np.zeros(out.num_rows, dtype=np.int32))
        )

    def final(group: pa.Table) -> pa.Table:
        mask = _frontier_mask_2d(
            group[x_col].to_numpy(), group[y_col].to_numpy()
        )
        return group.filter(pa.array(mask)).drop_columns("_k")

    return (
        ds.map_batches(local, batch_format="pyarrow")
        .groupby("_k")
        .map_groups(final, batch_format="pyarrow")
    )
