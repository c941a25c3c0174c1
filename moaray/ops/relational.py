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
    disc_price = pc.multiply(
        batch["l_extendedprice"], pc.subtract(pa.scalar(1.0), batch["l_discount"])
    )
    batch = batch.append_column("disc_price", disc_price)
    grouped = batch.group_by(["l_returnflag", "l_linestatus"]).aggregate(
        [
            ("l_quantity", "sum"),
            ("l_extendedprice", "sum"),
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
            "sum_base_price": [
                round(float(pc.sum(group["sum_base_price"]).as_py()), 2)
            ],
            "sum_disc_price": [
                round(float(pc.sum(group["sum_disc_price"]).as_py()), 2)
            ],
            "avg_qty": [
                round(
                    float(pc.sum(group["sum_qty"]).as_py())
                    / float(pc.sum(group["count_order"]).as_py()),
                    4,
                )
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
    batch = batch.append_column("day", day)
    grouped = batch.group_by(["event_type", "day"]).aggregate(
        [("value", "sum"), ("value", "count")]
    )
    return grouped.rename_columns(["event_type", "day", "sum_value", "n_events"])


def _final_events(group: pa.Table) -> pa.Table:
    return pa.table(
        {
            "event_type": [group["event_type"][0].as_py()],
            "day": [group["day"][0].as_py()],
            "n_events": [int(pc.sum(group["n_events"]).as_py())],
            "sum_value": [round(float(pc.sum(group["sum_value"]).as_py()), 2)],
        }
    )


def events_daily(events_ds):
    """Windowed-by-day aggregate per event type (combiner + tiny groupby)."""
    partial = events_ds.map_batches(_partial_events, batch_format="pyarrow")
    return partial.groupby(["event_type", "day"]).map_groups(
        _final_events, batch_format="pyarrow"
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
