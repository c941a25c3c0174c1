"""Graph centrality over edge datasets: integer-exact PageRank.

The missing operator class after connected components (ops/dedup.py
large/small-star): ITERATIVE message passing.  Each round every node
splits its rank over its out-edges and destinations sum what arrives —
one bounded-partition shuffle per iteration, edges materialized once as
the loop's working set (the object store spills them at scale).

All arithmetic is INTEGER (ranks scaled by 1e6, floor divisions), so
the distributed result is bitwise equal to the DuckDB unrolled-CTE
oracle REGARDLESS of summation order — the same trick as the
exact-cents money aggregates (ops/relational.py pricing_summary):

    r_0(v)     = SCALE                                   (i.e. 1.0)
    S_v        = sum over in-edges (u -> v) of  r_k(u) // outdeg(u)
    r_{k+1}(v) = (SCALE - DAMPING) + (DAMPING * S_v) // SCALE

Dangling mass is dropped (the classic simplification — a node with no
out-edges contributes nothing; the oracle does the same).  The damped
product is computed as ``d*(S//sc) + (d*(S%sc))//sc`` — exactly equal to
``(d*S)//sc`` for non-negative values but overflow-free in int64 (the
SQL side computes ``(d*S)//sc`` directly in DuckDB's HUGEINT).

Scale shape: the rank/degree vectors are the broadcast small side (8
bytes a node, the IVF-centroid pattern) — fine to ~100M nodes on 100 TB
of EDGES, which is where the mass sits; a beyond-that deployment swaps
the broadcast for a rank-dataset hash join per iteration without
touching the integer semantics.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

SCALE = 1_000_000
DAMPING = 850_000  # 0.85


def supplier_customer_edges(lineitem_ds, orders_path: str):
    """Directed edges supplier -> customer from (lineitem x orders).
    Node ids are namespaced: customer c -> 2c, supplier s -> 2s+1.
    Orders' (orderkey -> custkey) ships once via ray.put and is probed
    with searchsorted (the revenue_by_priority small-side pattern)."""
    import pyarrow.parquet as pq
    import ray

    orders = pq.read_table(orders_path, columns=["o_orderkey", "o_custkey"])
    okeys = orders["o_orderkey"].to_numpy()
    ocust = orders["o_custkey"].to_numpy()
    idx = np.argsort(okeys, kind="stable")
    ref = ray.put((okeys[idx], ocust[idx]))

    def to_edges(batch: pa.Table) -> pa.Table:
        skeys, scust = ray.get(ref)
        bkeys = batch["l_orderkey"].to_numpy()
        pos = np.clip(np.searchsorted(skeys, bkeys), 0, len(skeys) - 1)
        hit = skeys[pos] == bkeys
        supp = batch["l_suppkey"].to_numpy()[hit]
        cust = scust[pos[hit]]
        return pa.table({
            "src": pa.array(supp * 2 + 1, pa.int64()),
            "dst": pa.array(cust * 2, pa.int64()),
        })

    return lineitem_ds.select_columns(["l_orderkey", "l_suppkey"]) \
        .map_batches(to_edges, batch_format="pyarrow")


def _dedup_edges(edges_ds, n_partitions: int):
    """DISTINCT (src, dst) via bounded src-partitions + in-group lexsort
    (all copies of a pair share src, so they meet in one group)."""

    def add_part(batch: pa.Table) -> pa.Table:
        src = batch["src"].to_numpy()
        return batch.append_column(
            "part", pa.array((src % n_partitions).astype(np.int32)))

    def uniq(group: pa.Table) -> pa.Table:
        src = group["src"].to_numpy()
        dst = group["dst"].to_numpy()
        order = np.lexsort((dst, src))
        s, d = src[order], dst[order]
        keep = np.empty(len(s), dtype=bool)
        keep[0] = True
        keep[1:] = (s[1:] != s[:-1]) | (d[1:] != d[:-1])
        return pa.table({"src": pa.array(s[keep], pa.int64()),
                         "dst": pa.array(d[keep], pa.int64())})

    return (edges_ds.map_batches(add_part, batch_format="pyarrow")
            .groupby("part").map_groups(uniq, batch_format="pyarrow"))


def _collect_keyed_int_sums(ds, key_col, val_col, n_partitions):
    """(key, val) rows -> driver (keys, sums) arrays: per-batch compact
    np.add.at partials, bounded-partition fold, tiny take_all."""

    def partial(batch: pa.Table) -> pa.Table:
        k = batch[key_col].to_numpy()
        v = batch[val_col].to_numpy() if val_col else np.ones(
            len(k), dtype=np.int64)
        uk, inv = np.unique(k, return_inverse=True)
        s = np.zeros(len(uk), dtype=np.int64)
        np.add.at(s, inv, v)
        return pa.table({
            "part": pa.array((uk % n_partitions).astype(np.int32)),
            "k": pa.array(uk, pa.int64()),
            "v": pa.array(s, pa.int64()),
        })

    def fold(group: pa.Table) -> pa.Table:
        k = group["k"].to_numpy()
        v = group["v"].to_numpy()
        order = np.argsort(k, kind="stable")
        k, v = k[order], v[order]
        heads = np.empty(len(k), dtype=bool)
        heads[0] = True
        heads[1:] = k[1:] != k[:-1]
        starts = np.nonzero(heads)[0]
        return pa.table({
            "k": pa.array(k[starts], pa.int64()),
            "v": pa.array(np.add.reduceat(v, starts), pa.int64()),
        })

    rows = (ds.map_batches(partial, batch_format="pyarrow")
            .groupby("part").map_groups(fold, batch_format="pyarrow")
            .take_all())
    keys = np.array([r["k"] for r in rows], dtype=np.int64)
    vals = np.array([r["v"] for r in rows], dtype=np.int64)
    order = np.argsort(keys, kind="stable")
    return keys[order], vals[order]


def pagerank(edges_ds, n_iters: int = 3, n_partitions: int = 256):
    """Integer-exact PageRank over a (src, dst) int64 edge dataset.
    Returns a Dataset of (node, rank_scaled) with rank in SCALE units;
    see the module docstring for the exact recurrence the oracle mirrors.
    """
    import ray.data as rd

    edges = _dedup_edges(edges_ds, n_partitions).materialize()

    src_nodes, deg_of_src = _collect_keyed_int_sums(
        edges, "src", None, n_partitions)
    dst_nodes, _ = _collect_keyed_int_sums(edges, "dst", None, n_partitions)
    nodes = np.union1d(src_nodes, dst_nodes)
    deg = np.zeros(len(nodes), dtype=np.int64)
    deg[np.searchsorted(nodes, src_nodes)] = deg_of_src

    import ray
    static_ref = ray.put((nodes, deg))
    ranks = np.full(len(nodes), SCALE, dtype=np.int64)

    for _ in range(n_iters):
        ranks_ref = ray.put(ranks)

        def contrib(batch: pa.Table, _ranks_ref=ranks_ref) -> pa.Table:
            snodes, sdeg = ray.get(static_ref)
            r = ray.get(_ranks_ref)
            src = batch["src"].to_numpy()
            dst = batch["dst"].to_numpy()
            pos = np.searchsorted(snodes, src)
            c = r[pos] // sdeg[pos]  # sdeg > 0 for every src by def
            uk, inv = np.unique(dst, return_inverse=True)
            s = np.zeros(len(uk), dtype=np.int64)
            np.add.at(s, inv, c)
            return pa.table({
                "part": pa.array((uk % n_partitions).astype(np.int32)),
                "k": pa.array(uk, pa.int64()),
                "v": pa.array(s, pa.int64()),
            })

        def fold(group: pa.Table) -> pa.Table:
            k = group["k"].to_numpy()
            v = group["v"].to_numpy()
            order = np.argsort(k, kind="stable")
            k, v = k[order], v[order]
            heads = np.empty(len(k), dtype=bool)
            heads[0] = True
            heads[1:] = k[1:] != k[:-1]
            starts = np.nonzero(heads)[0]
            return pa.table({
                "k": pa.array(k[starts], pa.int64()),
                "v": pa.array(np.add.reduceat(v, starts), pa.int64()),
            })

        rows = (edges.map_batches(contrib, batch_format="pyarrow")
                .groupby("part").map_groups(fold, batch_format="pyarrow")
                .take_all())
        s_vec = np.zeros(len(nodes), dtype=np.int64)
        if rows:
            rk = np.array([r["k"] for r in rows], dtype=np.int64)
            rv = np.array([r["v"] for r in rows], dtype=np.int64)
            s_vec[np.searchsorted(nodes, rk)] = rv
        # (DAMPING * S) // SCALE, overflow-free (module docstring)
        damped = (DAMPING * (s_vec // SCALE)
                  + (DAMPING * (s_vec % SCALE)) // SCALE)
        ranks = (SCALE - DAMPING) + damped

    return rd.from_arrow(pa.table({
        "node": pa.array(nodes, pa.int64()),
        "rank_scaled": pa.array(ranks, pa.int64()),
    }))
