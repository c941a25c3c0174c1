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


def copurchase_edges(lineitem_ds, n_partitions: int = 256):
    """Undirected supplier-supplier edges (src < dst): two suppliers are
    connected iff they appear in the same order.  Per-order pair counts
    are bounded by lines-per-order, so the expansion is linear-ish; the
    groupby key is a bounded orderkey partition with the per-order work
    vectorized (the CLAUDE.md bounded-partition discipline)."""
    from .dedup import _pair_index_expansion

    def add_part(batch: pa.Table) -> pa.Table:
        ok = batch["l_orderkey"].to_numpy()
        return pa.table({
            "ok": pa.array(ok, pa.int64()),
            "sk": pa.array(batch["l_suppkey"].to_numpy(), pa.int64()),
            "part": pa.array((ok % n_partitions).astype(np.int32)),
        })

    def pairs(group: pa.Table) -> pa.Table:
        ok = group["ok"].to_numpy()
        sk = group["sk"].to_numpy()
        order = np.lexsort((sk, ok))
        ok, sk = ok[order], sk[order]
        keep = np.empty(len(ok), dtype=bool)   # distinct (order, supplier)
        keep[0] = True
        keep[1:] = (ok[1:] != ok[:-1]) | (sk[1:] != sk[:-1])
        ok, sk = ok[keep], sk[keep]
        heads = np.empty(len(ok), dtype=bool)
        heads[0] = True
        heads[1:] = ok[1:] != ok[:-1]
        counts = np.diff(np.concatenate(
            (np.nonzero(heads)[0], [len(ok)])))
        a_idx, b_idx = _pair_index_expansion(counts)
        # within-order suppliers ascend, so sk[a_idx] < sk[b_idx] strictly
        return pa.table({"src": pa.array(sk[a_idx], pa.int64()),
                         "dst": pa.array(sk[b_idx], pa.int64())})

    return (lineitem_ds.select_columns(["l_orderkey", "l_suppkey"])
            .map_batches(add_part, batch_format="pyarrow")
            .groupby("part").map_groups(pairs, batch_format="pyarrow"))


def triangle_count(edges_ds, n_partitions: int = 256,
                   broadcast_limit: int = 5_000_000):
    """Exact triangle + wedge counts over an undirected simple graph
    given as (src, dst) rows (self-loops dropped, duplicates deduped).

    The classic degree-oriented algorithm: orient every edge from the
    (degree, id)-smaller endpoint, emit each source's out-neighbor pairs
    as wedges (out-degree is bounded ~sqrt(m) under this orientation),
    and count the wedges whose closing oriented edge exists.  Nodes are
    re-encoded as orientation RANKS so the packed (lo<<32)|hi keys are
    safe for any int64 node ids.  Two closing strategies, identical
    results (pytest-asserted):

    - edge count <= ``broadcast_limit``: the sorted packed edge-key array
      ships ONCE via ray.put (8 bytes/edge) and each wedge group closes
      locally with searchsorted — wedges (the big side: sum C(outdeg,2))
      never shuffle (bench sf0.1: 4.6 s -> shuffle-free).
    - above the limit: wedge and edge keys meet in one key-partitioned
      shuffle (each candidate pair lands in exactly one group).

    Returns a 1-row Dataset {n_triangles, n_wedges} — bitwise-matchable
    by the oracle's oriented 3-way self-join.
    """
    import ray
    import ray.data as rd

    def norm(batch: pa.Table) -> pa.Table:
        s = batch["src"].to_numpy()
        d = batch["dst"].to_numpy()
        keep = s != d
        s, d = s[keep], d[keep]
        return pa.table({"src": pa.array(np.minimum(s, d), pa.int64()),
                         "dst": pa.array(np.maximum(s, d), pa.int64())})

    und = _dedup_edges(edges_ds.map_batches(norm, batch_format="pyarrow"),
                       n_partitions).materialize()

    # degree over both endpoints -> (deg, id)-orientation ranks
    def both_ends(batch: pa.Table) -> pa.Table:
        k = np.concatenate([batch["src"].to_numpy(),
                            batch["dst"].to_numpy()])
        return pa.table({"k": pa.array(k, pa.int64()),
                         "one": pa.array(np.ones(len(k), np.int64))})

    nodes, deg = _collect_keyed_int_sums(
        und.map_batches(both_ends, batch_format="pyarrow"),
        "k", "one", n_partitions)
    rank_order = np.lexsort((nodes, deg))   # (deg, id) ascending
    rank = np.empty(len(nodes), dtype=np.int64)
    rank[rank_order] = np.arange(len(nodes), dtype=np.int64)
    ref = ray.put((nodes, rank))

    def oriented_keys(batch: pa.Table) -> pa.Table:
        snodes, srank = ray.get(ref)
        ra = srank[np.searchsorted(snodes, batch["src"].to_numpy())]
        rb = srank[np.searchsorted(snodes, batch["dst"].to_numpy())]
        lo = np.minimum(ra, rb)
        hi = np.maximum(ra, rb)
        key = (lo << np.int64(32)) | hi
        return pa.table({
            "key": pa.array(key, pa.int64()),
            "kind": pa.array(np.zeros(len(key), np.int8)),
            "part": pa.array((key % n_partitions).astype(np.int32)),
        })

    edge_keys = und.map_batches(oriented_keys, batch_format="pyarrow")

    def wedge_key_array(group: pa.Table) -> np.ndarray:
        from .dedup import _pair_index_expansion

        snodes, srank = ray.get(ref)
        ra = srank[np.searchsorted(snodes, group["src"].to_numpy())]
        rb = srank[np.searchsorted(snodes, group["dst"].to_numpy())]
        lo = np.minimum(ra, rb)
        hi = np.maximum(ra, rb)
        order = np.lexsort((hi, lo))
        lo, hi = lo[order], hi[order]
        if len(lo) == 0:
            return np.empty(0, np.int64)
        heads = np.empty(len(lo), dtype=bool)
        heads[0] = True
        heads[1:] = lo[1:] != lo[:-1]
        counts = np.diff(np.concatenate((np.nonzero(heads)[0], [len(lo)])))
        a_idx, b_idx = _pair_index_expansion(counts)
        # out-neighbors ascend within each source, so hi[a] < hi[b]
        return (hi[a_idx] << np.int64(32)) | hi[b_idx]

    def add_src_part(batch: pa.Table) -> pa.Table:
        snodes, srank = ray.get(ref)
        ra = srank[np.searchsorted(snodes, batch["src"].to_numpy())]
        rb = srank[np.searchsorted(snodes, batch["dst"].to_numpy())]
        lo = np.minimum(ra, rb)
        return batch.append_column(
            "part", pa.array((lo % n_partitions).astype(np.int32)))

    def count_table(n_tri: int, n_wed: int) -> pa.Table:
        return pa.table({
            "n_triangles": pa.array([n_tri], pa.int64()),
            "n_wedges": pa.array([n_wed], pa.int64()),
        })

    if und.count() <= broadcast_limit:
        # broadcast close: ship the sorted edge-key array once; wedges
        # (the sum-C(d,2) big side) never leave their source group
        blocks = [b for b in ray.get(edge_keys.to_arrow_refs())
                  if b.num_rows]
        ek = (np.sort(np.concatenate(
            [b.column("key").to_numpy() for b in blocks]))
            if blocks else np.empty(0, np.int64))
        ek_ref = ray.put(ek)

        def close_local(group: pa.Table) -> pa.Table:
            wk = wedge_key_array(group)
            sek = ray.get(ek_ref)
            if len(sek) == 0 or len(wk) == 0:
                return count_table(0, len(wk))
            pos = np.clip(np.searchsorted(sek, wk), 0, len(sek) - 1)
            return count_table(int((sek[pos] == wk).sum()), len(wk))

        parts = (und.map_batches(add_src_part, batch_format="pyarrow")
                 .groupby("part")
                 .map_groups(close_local, batch_format="pyarrow")
                 .take_all())
    else:
        def wedges(group: pa.Table) -> pa.Table:
            key = wedge_key_array(group)
            return pa.table({
                "key": pa.array(key, pa.int64()),
                "kind": pa.array(np.ones(len(key), np.int8)),
                "part": pa.array((key % n_partitions).astype(np.int32)),
            })

        wedge_keys = (und.map_batches(add_src_part,
                                      batch_format="pyarrow")
                      .groupby("part")
                      .map_groups(wedges, batch_format="pyarrow"))

        def close_count(group: pa.Table) -> pa.Table:
            key = group["key"].to_numpy()
            kind = group["kind"].to_numpy()
            ek = np.sort(key[kind == 0])
            wk = key[kind == 1]
            if len(ek) == 0 or len(wk) == 0:
                return count_table(0, len(wk))
            pos = np.clip(np.searchsorted(ek, wk), 0, len(ek) - 1)
            return count_table(int((ek[pos] == wk).sum()), len(wk))

        parts = (edge_keys.union(wedge_keys)
                 .groupby("part").map_groups(close_count,
                                             batch_format="pyarrow")
                 .take_all())

    return rd.from_arrow(count_table(
        sum(r["n_triangles"] for r in parts),
        sum(r["n_wedges"] for r in parts)))
