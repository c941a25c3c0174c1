"""Round-5 closing ops: events_pivot / cohort_retention /
token_cooccurrence / seeded semantic_dedup.

Parity references here are independent (pandas / scalar python / numpy),
never the engine itself; the DuckDB oracle gate covers the graded shapes
(tools/check_oracles.py entries events_pivot, cohort_retention,
token_cooc, semantic_dedup_seeded).
"""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from moaray.ops.dedup import semantic_dedup
from moaray.ops.relational import cohort_retention, events_pivot
from moaray.ops.text import token_cooccurrence


def _events_table(rows):
    return rd.from_arrow(
        pa.table(
            {
                "user_id": pa.array([r[0] for r in rows], pa.int64()),
                "ts": pa.array(
                    [np.datetime64(r[1], "us") for r in rows],
                    pa.timestamp("us"),
                ),
                "event_type": pa.array([r[2] for r in rows], pa.string()),
            }
        )
    )


def test_events_pivot_matches_pandas():
    rng = np.random.default_rng(7)
    n = 5000
    users = rng.integers(0, 37, n)
    types = np.array(["click", "error", "purchase", "signup", "view"])
    et = types[rng.integers(0, 5, n)]
    ds = rd.from_arrow(
        pa.table(
            {
                "user_id": pa.array(users, pa.int64()),
                "event_type": pa.array(et, pa.string()),
            }
        )
    )
    got = (
        events_pivot(ds, n_partitions=8)
        .to_pandas()
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    ref = (
        pd.crosstab(pd.Series(users, name="user_id"), pd.Series(et))
        .reindex(columns=types, fill_value=0)
        .astype(np.int64)
    )
    ref.columns = [f"n_{t}" for t in types]
    ref["n_total"] = ref.sum(axis=1)
    ref = ref.reset_index()
    pd.testing.assert_frame_equal(got, ref, check_dtype=False)


def test_events_pivot_unlisted_type_excluded():
    ds = rd.from_arrow(
        pa.table(
            {
                "user_id": pa.array([1, 1, 2], pa.int64()),
                "event_type": pa.array(
                    ["click", "mystery", "mystery"], pa.string()
                ),
            }
        )
    )
    got = events_pivot(ds).to_pandas().sort_values("user_id")
    # user 2 has ONLY unlisted events -> contributes no partial rows at all
    assert got["user_id"].tolist() == [1]
    assert got["n_click"].tolist() == [1]
    assert got["n_total"].tolist() == [1]


def test_cohort_retention_edges():
    day = 86400
    rows = [
        # user 1: first day 0, returns day 1 -> retained
        (1, 0, "purchase"),
        (1, day, "purchase"),
        # user 2: first day 0, returns day 2 only -> NOT retained
        (2, 10, "purchase"),
        (2, 2 * day, "purchase"),
        # user 3: cohort day 1 (clicks on day 0 don't qualify), returns d2
        (3, 5, "click"),
        (3, day + 5, "purchase"),
        (3, 2 * day + 5, "purchase"),
        # user 4: single event -> cohort of day 0, not retained
        (4, 100, "purchase"),
    ]
    ds = _events_table(
        [(u, np.datetime64(sec, "s").astype("datetime64[us]"), t)
         for u, sec, t in rows]
    )
    got = (
        cohort_retention(ds, unit="day", event_type="purchase",
                         n_partitions=4)
        .to_pandas()
        .sort_values("cohort_wk")
        .reset_index(drop=True)
    )
    assert got.to_dict("list") == {
        "cohort_wk": [0, 1],
        "n_users": [3, 1],
        "n_retained": [1, 1],
    }


def test_cohort_retention_week_unit_and_all_types():
    wk = 7 * 86400
    rows = [
        (1, 0, "view"),
        (1, wk + 50, "click"),      # any type qualifies when None
        (2, 3, "view"),             # never returns
    ]
    ds = _events_table(
        [(u, np.datetime64(sec, "s").astype("datetime64[us]"), t)
         for u, sec, t in rows]
    )
    got = cohort_retention(ds, unit="week").to_pandas()
    assert got["n_users"].tolist() == [2]
    assert got["n_retained"].tolist() == [1]


def _cooc_ref(texts, min_count, max_doc_tokens=512):
    from collections import Counter
    from itertools import combinations

    c = Counter()
    for t in texts:
        toks = sorted({w for w in t.split(" ") if w})
        if len(toks) > max_doc_tokens:
            continue
        for a, b in combinations(toks, 2):
            c[(a, b)] += 1
    return {k: v for k, v in c.items() if v >= min_count}


def test_token_cooccurrence_matches_reference():
    rng = np.random.default_rng(11)
    vocab = np.array([f"w{i}" for i in range(40)])
    texts = [
        " ".join(vocab[rng.integers(0, 40, rng.integers(2, 12))])
        for _ in range(400)
    ]
    ds = rd.from_arrow(pa.table({"text": pa.array(texts, pa.string())}))
    got = token_cooccurrence(ds, min_count=3, n_partitions=8).to_pandas()
    ref = _cooc_ref(texts, 3)
    assert len(got) == len(ref)
    for r in got.itertuples():
        assert ref[(r.tok_a, r.tok_b)] == r.cnt
        assert r.tok_a < r.tok_b


def test_token_cooccurrence_guard_and_empty_tokens():
    texts = [
        "a  b a",            # double space -> empty token dropped; distinct {a,b}
        "a b",
        " ".join(f"x{i}" for i in range(20)) + " a b",  # over guard, skipped
    ]
    ds = rd.from_arrow(pa.table({"text": pa.array(texts, pa.string())}))
    got = token_cooccurrence(ds, min_count=2, max_doc_tokens=10,
                             n_partitions=4).to_pandas()
    assert got.to_dict("list") == {"tok_a": ["a"], "tok_b": ["b"],
                                   "cnt": [2]}


def _emb_ds(mat, ids=None):
    ids = np.arange(len(mat)) if ids is None else np.asarray(ids)
    return rd.from_arrow(
        pa.table(
            {
                "vec_id": pa.array(ids, pa.int64()),
                "embedding": pa.array(
                    [row.astype(np.float32) for row in mat],
                    pa.list_(pa.float32()),
                ),
            }
        )
    )


def test_semantic_dedup_injected_centroids_and_orderfree():
    rng = np.random.default_rng(3)
    base = rng.normal(size=(4, 16))
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    # 3 near-copies of each base vector + noise rows
    rows, owners = [], []
    for i, b in enumerate(base):
        for _ in range(3):
            v = b + rng.normal(scale=0.01, size=16)
            rows.append(v)
            owners.append(i)
    for _ in range(8):
        rows.append(rng.normal(size=16))
        owners.append(-1)
    mat = np.array(rows)
    ds = _emb_ds(mat)
    out = (
        semantic_dedup(ds, threshold=0.95, centroids=base, greedy=False)
        .to_pandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    # each clone triple keeps exactly its smallest id
    for i in range(4):
        kept = out[(out.vec_id >= 3 * i) & (out.vec_id < 3 * i + 3)]
        assert kept["kept"].tolist() == [1, 0, 0]
        assert (kept["cluster_id"] == i).all()
    # noise rows survive
    assert (out[out.vec_id >= 12]["kept"] == 1).all()


def test_semantic_dedup_orderfree_vs_greedy_rule():
    # chain a-b-c where sim(a,b), sim(b,c) >= thr but sim(a,c) < thr:
    # greedy keeps a and c (b was dropped, c only checked against KEPT),
    # order-free keeps only a (c has SOME smaller-id neighbor over thr)
    a = np.array([1.0, 0.0])
    b = np.array([np.cos(0.3), np.sin(0.3)])
    c = np.array([np.cos(0.6), np.sin(0.6)])
    thr = np.cos(0.4)  # sim(a,b)=cos(.3)>thr, sim(b,c)=cos(.3)>thr, a-c below
    mat = np.stack([a, b, c])
    cent = np.array([[1.0, 0.0]])
    greedy = (
        semantic_dedup(_emb_ds(mat), threshold=thr, centroids=cent)
        .to_pandas().sort_values("vec_id")["kept"].tolist()
    )
    orderfree = (
        semantic_dedup(_emb_ds(mat), threshold=thr, centroids=cent,
                       greedy=False)
        .to_pandas().sort_values("vec_id")["kept"].tolist()
    )
    assert greedy == [1, 0, 1]
    assert orderfree == [1, 0, 0]


def test_token_pmi_matches_reference():
    import math

    from moaray.ops.text import token_pmi

    rng = np.random.default_rng(5)
    vocab = np.array([f"w{i}" for i in range(25)])
    texts = [
        " ".join(vocab[rng.integers(0, 25, rng.integers(2, 10))])
        for _ in range(300)
    ]
    texts.append("")  # zero-token doc: counts toward N, no pairs
    texts.append(" ".join(f"x{i}" for i in range(30)))  # over guard: skipped
    ds = rd.from_arrow(pa.table({"text": pa.array(texts, pa.string())}))
    got = token_pmi(ds, min_count=3, max_doc_tokens=12).to_pandas()

    from collections import Counter

    df, cooc = Counter(), Counter()
    n_docs = 0
    for t in texts:
        toks = sorted({w for w in t.split(" ") if w})
        if len(toks) > 12:
            continue
        n_docs += 1
        df.update(toks)
        from itertools import combinations
        cooc.update(combinations(toks, 2))
    assert n_docs == 301  # the empty doc counts, the over-guard one doesn't
    ref = {
        k: round(math.log(v * n_docs / (df[k[0]] * df[k[1]])), 6)
        for k, v in cooc.items() if v >= 3
    }
    assert len(got) == len(ref)
    for r in got.itertuples():
        assert abs(ref[(r.tok_a, r.tok_b)] - r.pmi) < 1e-12


def test_anti_join_keys_paths_agree():
    from moaray.ops.relational import anti_join_keys

    left = rd.from_arrow(pa.table({
        "k": pa.array([1, 2, 3, 4, 5, 6], pa.int64()),
        "v": pa.array(list("abcdef"), pa.string()),
    }))
    keys = rd.from_arrow(pa.table({
        "kk": pa.array([2, 2, 4, 9], pa.int64()),
    }))
    bc = (anti_join_keys(left, keys, "k", "kk")
          .to_pandas().sort_values("k").reset_index(drop=True))
    jn = (anti_join_keys(left, keys, "k", "kk", broadcast_limit=0)
          .to_pandas().sort_values("k").reset_index(drop=True))
    assert bc["k"].tolist() == [1, 3, 5, 6]
    assert jn[["k", "v"]].equals(bc[["k", "v"]])
    # empty probe side keeps everything
    none = anti_join_keys(
        left, keys.filter(expr="kk > 100"), "k", "kk"
    ).to_pandas()
    assert sorted(none["k"].tolist()) == [1, 2, 3, 4, 5, 6]


def test_bigram_phrases_matches_reference():
    import math
    from collections import Counter

    from moaray.ops.text import bigram_phrases

    texts = [
        "new york is big",
        "new york new york",
        "big apple new  york",   # double space: empties filtered first
        "",
        "york new",
    ]
    ds = rd.from_arrow(pa.table({"text": pa.array(texts, pa.string())}))
    got = (bigram_phrases(ds, min_count=2, n_partitions=4)
           .to_pandas().sort_values(["tok_a", "tok_b"])
           .reset_index(drop=True))
    uni, bg = Counter(), Counter()
    for t in texts:
        toks = [w for w in t.split(" ") if w]
        uni.update(toks)
        bg.update(zip(toks, toks[1:]))
    total = sum(uni.values())
    ref = {
        k: (v, round(math.log(v * total / (uni[k[0]] * uni[k[1]])), 6))
        for k, v in bg.items() if v >= 2
    }
    assert ("new", "york") in ref and len(got) == len(ref)
    for r in got.itertuples():
        cnt, score = ref[(r.tok_a, r.tok_b)]
        assert r.cnt == cnt and abs(r.score - score) < 1e-12


def test_cohort_retention_matrix_edges():
    from moaray.ops.relational import cohort_retention_matrix

    day = 86400
    rows = [
        (1, 0, "purchase"), (1, day, "purchase"), (1, 3 * day, "purchase"),
        (2, 10, "purchase"),                       # only offset 0
        (3, day, "purchase"), (3, 20 * day, "purchase"),  # 19 > max_offset
    ]
    ds = _events_table(
        [(u, np.datetime64(s, "s").astype("datetime64[us]"), t)
         for u, s, t in rows]
    )
    got = (
        cohort_retention_matrix(ds, unit="day", event_type="purchase",
                                max_offset=7, n_partitions=4)
        .to_pandas().sort_values(["cohort_wk", "offset"])
        .reset_index(drop=True)
    )
    assert got.to_dict("list") == {
        "cohort_wk": [0, 0, 0, 1],
        "offset": [0, 1, 3, 0],
        "n_active": [2, 1, 1, 1],
    }


def test_pareto_frontier_matches_bruteforce():
    """Distributed local-prune + merge skyline == O(n^2) brute force,
    across many blocks so the merge pass actually merges."""
    from moaray.ops.relational import pareto_frontier

    rng = np.random.default_rng(11)
    n = 4000
    ids = np.arange(n, dtype=np.int64)
    x = rng.integers(0, 40, n).astype(np.int32)
    y = np.round(rng.uniform(0.0, 100.0, n), 2)
    # plant an exact 2-axis tie pair: both must survive
    x[100] = x[200] = 39
    y[100] = y[200] = float(np.max(y)) + 1.0
    ds = rd.from_arrow(
        pa.table({
            "id": pa.array(ids),
            "sx": pa.array(x, pa.int32()),
            "sy": pa.array(y, pa.float64()),
        })
    ).repartition(17)

    got = (
        pareto_frontier(ds, "sx", "sy", keep_cols=["id"])
        .to_pandas().sort_values("id").reset_index(drop=True)
    )

    dominated = np.zeros(n, dtype=bool)
    for i in range(n):
        dom = (x >= x[i]) & (y >= y[i]) & ((x > x[i]) | (y > y[i]))
        dom[i] = False
        dominated[i] = dom.any()
    want = ids[~dominated]
    assert got["id"].to_numpy().tolist() == want.tolist()
    assert {100, 200} <= set(got["id"])
    # null rows on either axis never reach the frontier
    ds2 = rd.from_arrow(
        pa.table({
            "id": pa.array([0, 1, 2], pa.int64()),
            "sx": pa.array([None, 5, 4], pa.int32()),
            "sy": pa.array([9.0, None, 1.0], pa.float64()),
        })
    )
    got2 = pareto_frontier(ds2, "sx", "sy", keep_cols=["id"]).to_pandas()
    assert got2["id"].tolist() == [2]


def test_pagerank_matches_scalar_reference():
    """Distributed integer-exact PageRank == exact Python-int recurrence
    (independent scalar reference, never the engine), incl. duplicate
    edges (deduped), dangling nodes, and sink-only nodes."""
    from moaray.ops.graph import DAMPING, SCALE, pagerank

    rng = np.random.default_rng(17)
    src = rng.integers(0, 80, 600).astype(np.int64)
    dst = rng.integers(0, 80, 600).astype(np.int64)
    keep = src != dst
    src, dst = src[keep], dst[keep]
    # duplicate every edge once: dedup must make this a no-op
    src = np.concatenate([src, src])
    dst = np.concatenate([dst, dst])
    ds = rd.from_arrow(pa.table({"src": src, "dst": dst})).repartition(9)
    got = {r["node"]: r["rank_scaled"]
           for r in pagerank(ds, n_iters=3).take_all()}

    edges = sorted(set(zip(src.tolist(), dst.tolist())))
    nodes = sorted({u for u, _ in edges} | {v for _, v in edges})
    deg: dict[int, int] = {}
    for u, _ in edges:
        deg[u] = deg.get(u, 0) + 1
    r = {n: SCALE for n in nodes}
    for _ in range(3):
        s = {n: 0 for n in nodes}
        for u, v in edges:
            s[v] += r[u] // deg[u]
        r = {n: (SCALE - DAMPING) + (DAMPING * s[n]) // SCALE
             for n in nodes}
    assert got == r
    # a pure sink (in-edges only) keeps collecting; a pure source decays
    # to the teleport floor by iteration 2
    sinks = [n for n in nodes if n not in deg]
    assert all(got[n] >= SCALE - DAMPING for n in sinks)


def test_triangle_count_matches_bruteforce():
    """Degree-oriented wedge-join triangle count == O(n^3) brute force,
    incl. duplicate and self-loop edges and rank-vs-id divergence (node
    ids far above the rank range)."""
    import itertools

    from moaray.ops.graph import triangle_count

    rng = np.random.default_rng(23)
    ids = rng.choice(10_000_000, size=50, replace=False).astype(np.int64)
    src = ids[rng.integers(0, 50, 400)]
    dst = ids[rng.integers(0, 50, 400)]
    ds = rd.from_arrow(pa.table({"src": src, "dst": dst})).repartition(7)
    row = triangle_count(ds).take_all()[0]

    E = {(min(a, b), max(a, b))
         for a, b in zip(src.tolist(), dst.tolist()) if a != b}
    adj: dict[int, set] = {}
    for a, b in E:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    tri = sum(1 for a, b, c in itertools.combinations(sorted(adj), 3)
              if b in adj[a] and c in adj[a] and c in adj[b])
    deg = {v: len(adj[v]) for v in adj}
    out: dict[int, int] = {}
    for a, b in E:
        u = a if (deg[a], a) < (deg[b], b) else b
        out[u] = out.get(u, 0) + 1
    assert row["n_triangles"] == tri
    assert row["n_wedges"] == sum(c * (c - 1) // 2 for c in out.values())


def test_triangle_count_paths_agree():
    """Broadcast-close and shuffle-close strategies are bit-identical
    (broadcast_limit=0 forces the shuffle path)."""
    from moaray.ops.graph import triangle_count

    rng = np.random.default_rng(29)
    src = rng.integers(0, 30, 250).astype(np.int64)
    dst = rng.integers(0, 30, 250).astype(np.int64)
    ds = rd.from_arrow(pa.table({"src": src, "dst": dst})).repartition(4)
    a = triangle_count(ds).take_all()[0]
    b = triangle_count(ds, broadcast_limit=0).take_all()[0]
    assert dict(a) == dict(b)
    assert a["n_triangles"] > 0
