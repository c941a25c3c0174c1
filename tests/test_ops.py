"""Training-data ops: Ray pipelines vs DuckDB truths + property checks."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in ["documents", "embeddings", "lineitem", "events", "part",
              "supplier", "nation", "region"]:
        c.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")
    return c


def docs():
    return ray.data.read_parquet(f"{SF}/documents.parquet")


def emb():
    return ray.data.read_parquet(f"{SF}/embeddings.parquet")


def canon(df):
    df = df.reindex(sorted(df.columns), axis=1)
    return df.sort_values(by=list(df.columns), ignore_index=True)


def assert_matches_sql(ds, con, sql):
    got = canon(ds.to_pandas())
    want = canon(con.sql(sql).df())
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_token_count_vs_sql(con):
    from moaray.ops.text import token_count_batch

    ds = docs().map_batches(token_count_batch, batch_format="pyarrow")
    assert_matches_sql(
        ds,
        con,
        """SELECT doc_id,
              CAST(array_length(str_split(text,' ')) AS BIGINT) AS n_tokens,
              CAST(array_length(regexp_split_to_array(text,'\\s+')) AS BIGINT) AS n_ws_tokens
           FROM documents""",
    )


def test_exact_dedup_vs_sql(con):
    from moaray.ops.dedup import exact_dedup

    ds = exact_dedup(docs())
    assert_matches_sql(
        ds,
        con,
        "SELECT min(doc_id) AS doc_id, md5(text) AS text_hash "
        "FROM documents GROUP BY md5(text)",
    )


def test_exact_dedup_finds_duplicates():
    """Synthesized dup rows: survivor must be the min doc_id per text."""
    from moaray.ops.dedup import exact_dedup

    tbl = pa.table(
        {
            "doc_id": pa.array([5, 2, 9, 7], pa.int64()),
            "text": ["aa", "aa", "bb", "aa"],
        }
    )
    out = exact_dedup(ray.data.from_arrow(tbl)).to_pandas()
    survivors = set(out["doc_id"])
    assert survivors == {2, 9}


def test_charset_jaccard_vs_sql(con):
    from moaray.ops.dedup import charset_jaccard_pairs

    ds = charset_jaccard_pairs(docs(), threshold=0.9)
    assert_matches_sql(
        ds,
        con,
        """SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                  round(jaccard(a.text, b.text), 4) AS jaccard
           FROM documents a JOIN documents b
             ON a.lang = b.lang AND a.doc_id < b.doc_id
           WHERE jaccard(a.text, b.text) >= 0.9""",
    )


def test_minhash_detects_near_duplicates():
    from moaray.ops.dedup import minhash_lsh_pairs

    base = "the quick brown fox jumps over the lazy dog again and again ok"
    texts = [base, base + " extra", "completely different words here entirely",
             base]
    tbl = pa.table(
        {"doc_id": pa.array([0, 1, 2, 3], pa.int64()), "text": texts}
    )
    pairs = minhash_lsh_pairs(
        ray.data.from_arrow(tbl), threshold=0.5
    ).to_pandas()
    got = {(a, b) for a, b in zip(pairs["doc_a"], pairs["doc_b"])}
    assert (0, 3) in got  # identical docs must be found
    assert (0, 1) in got  # near-identical must be found
    assert (0, 2) not in got and (1, 2) not in got


def test_minhash_short_docs_large_shingle():
    """k_shingle > 3 with docs of 4..k_shingle-1 tokens used to broadcast-
    error against the 3-constant mixer (round-2 ADVICE); identical short
    docs must still pair."""
    from moaray.ops.dedup import minhash_lsh_pairs

    texts = ["four tokens right here", "four tokens right here",
             "one", "totally different things spoken aloud"]
    tbl = pa.table(
        {"doc_id": pa.array([0, 1, 2, 3], pa.int64()), "text": texts}
    )
    pairs = minhash_lsh_pairs(
        ray.data.from_arrow(tbl), threshold=0.5, k_shingle=5
    ).to_pandas()
    got = {(a, b) for a, b in zip(pairs["doc_a"], pairs["doc_b"])}
    assert (0, 1) in got
    assert (0, 2) not in got and (0, 3) not in got


def test_simhash_identical_docs_pair():
    from moaray.ops.dedup import simhash_pairs

    tbl = pa.table(
        {
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            "text": ["alpha beta gamma delta", "alpha beta gamma delta",
                     "unrelated totally different content words"],
        }
    )
    pairs = simhash_pairs(ray.data.from_arrow(tbl)).to_pandas()
    got = {(a, b) for a, b in zip(pairs["doc_a"], pairs["doc_b"])}
    assert (1, 2) in got
    assert (1, 3) not in got


def test_knn_bruteforce_vs_numpy():
    from moaray.ops.ann import knn_bruteforce, load_queries

    e = emb()
    qids, qmat = load_queries(e, n_queries=5)
    got = knn_bruteforce(e, qids, qmat, k=4).to_pandas()

    rows = e.take_all()
    ids = np.array([r["vec_id"] for r in rows])
    mat = np.array([r["embedding"] for r in rows], dtype=np.float64)
    mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    qn = qmat / np.linalg.norm(qmat, axis=1, keepdims=True)
    sims = qn @ mat.T
    for qi, qid in enumerate(qids):
        s = sims[qi].copy()
        mask = ids != qid
        order = np.lexsort((ids[mask], -s[mask]))[:4]
        want = ids[mask][order].tolist()
        have = got[got["query_id"] == qid].sort_values("rank")[
            "neighbor_id"
        ].tolist()
        assert have == want, f"query {qid}"


def test_knn_lsh_recall_vs_bruteforce():
    from moaray.ops.ann import knn_bruteforce, knn_lsh, load_queries

    e = emb()
    qids, qmat = load_queries(e, n_queries=5)
    bf = knn_bruteforce(e, qids, qmat, k=5).to_pandas()
    lsh = knn_lsh(e, qids, qmat, k=5).to_pandas()
    bf_set = set(zip(bf["query_id"], bf["neighbor_id"]))
    lsh_set = set(zip(lsh["query_id"], lsh["neighbor_id"]))
    recall = len(bf_set & lsh_set) / len(bf_set)
    assert recall >= 0.5, f"LSH recall too low: {recall}"


def test_knn_ivf_recall_vs_bruteforce():
    from moaray.ops.ann import knn_bruteforce, knn_ivf, load_queries

    e = emb()
    qids, qmat = load_queries(e, n_queries=5)
    bf = knn_bruteforce(e, qids, qmat, k=5).to_pandas()
    ivf = knn_ivf(e, qids, qmat, k=5, n_centroids=8, nprobe=4).to_pandas()
    bf_set = set(zip(bf["query_id"], bf["neighbor_id"]))
    ivf_set = set(zip(ivf["query_id"], ivf["neighbor_id"]))
    recall = len(bf_set & ivf_set) / len(bf_set)
    assert recall >= 0.5, f"IVF recall too low: {recall}"


def test_embedding_neardup_lsh_subset_of_exact():
    from moaray.ops.dedup import (
        embedding_neardup_lsh_pairs,
        embedding_neardup_pairs,
    )

    e = emb()
    exact = embedding_neardup_pairs(e, threshold=0.35).to_pandas()
    lsh = embedding_neardup_lsh_pairs(e, threshold=0.35).to_pandas()
    exact_set = set(zip(exact["vec_a"], exact["vec_b"]))
    lsh_set = set(zip(lsh["vec_a"], lsh["vec_b"]))
    # every LSH pair must be a true pair (same cosine predicate)...
    assert lsh_set <= exact_set
    # ...and recall should be meaningful
    if exact_set:
        assert len(lsh_set) / len(exact_set) >= 0.3


def test_pricing_summary_vs_sql(con):
    from moaray.ops.relational import pricing_summary

    ds = pricing_summary(ray.data.read_parquet(f"{SF}/lineitem.parquet"))
    assert_matches_sql(
        ds,
        con,
        """SELECT l_returnflag, l_linestatus,
                  round(sum(l_quantity),2) AS sum_qty,
                  sum(CAST(round(l_extendedprice*100) AS BIGINT))/100.0 AS sum_base_price,
                  ((sum(CAST(round(l_extendedprice*(1-l_discount)*10000) AS BIGINT))+50)//100)/100.0 AS sum_disc_price,
                  round(sum(l_quantity)/count(*),4) AS avg_qty,
                  count(*) AS count_order
           FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
           GROUP BY l_returnflag, l_linestatus""",
    )


def test_events_daily_vs_sql(con):
    from moaray.ops.relational import events_daily

    ds = events_daily(ray.data.read_parquet(f"{SF}/events.parquet"))
    assert_matches_sql(
        ds,
        con,
        """SELECT event_type, strftime(ts,'%Y-%m-%d') AS day,
                  count(*) AS n_events, sum(CAST(round(value*100) AS BIGINT))/100.0 AS sum_value
           FROM events GROUP BY 1, 2""",
    )


def test_image_features_and_resize():
    from moaray.ops.multimodal import image_features, image_resize
    from moaray.testgen import Layout, images_path

    path = images_path(Layout("grid3x3", 9, 64))
    ds = ray.data.read_parquet(path)
    feats = image_features(ds).to_pandas()
    assert len(feats) == 9
    # ramp 0..63, nonnull = cols 1..63 -> mean of 1..63 = 32
    assert feats["mean"].iloc[0] == pytest.approx(32.0)
    assert feats["nonnull_frac"].iloc[0] == pytest.approx(63 / 64, abs=1e-3)

    small = image_resize(ds, 16, 16).to_pandas()
    assert len(small) == 9
    from moaray import codecs

    arr = codecs.decode(small["bytes"].iloc[0], "raw16")
    assert arr.shape == (16, 16)


def test_image_resize_interpolating_methods():
    # the resize stage reuses the mosaic warp kernels — no image library:
    # 'average' 4x downsample == blockwise mean; 'bilinear' upsample of a
    # ramp stays within the ramp and preserves the mean
    import numpy as np

    from moaray import codecs
    from moaray.ops.multimodal import ImageResize

    rng = np.random.RandomState(3)
    img = (rng.rand(32, 32) * 1000 + 1).astype(np.uint16)
    batch = pa.table({
        "image_id": ["a"],
        "bytes": [codecs.encode(img, "raw16")],
        "w": pa.array([32], pa.int32()),
        "h": pa.array([32], pa.int32()),
        "fmt": ["raw16"],
    })
    out = ImageResize(8, 8, "average")(batch)
    got = codecs.decode(out["bytes"][0].as_py(), "raw16")
    expect = np.rint(img.reshape(8, 4, 8, 4).mean(axis=(1, 3)))
    assert np.array_equal(got.astype(np.float64), expect)

    out = ImageResize(64, 64, "bilinear")(batch)
    up = codecs.decode(out["bytes"][0].as_py(), "raw16")
    assert up.shape == (64, 64)
    assert up.min() >= img.min() and up.max() <= img.max()
    assert abs(float(up.mean()) - float(img.mean())) < 5.0

    with pytest.raises(ValueError, match="unknown resize method"):
        ImageResize(8, 8, "magic")


def test_image_resize_color():
    # (h, w, 3) payloads resize per plane; color output is lossless PNG
    import numpy as np

    from moaray import codecs
    from moaray.ops.multimodal import ImageResize

    rng = np.random.RandomState(8)
    rgb = (rng.rand(32, 32, 3) * 255).astype(np.uint8)
    batch = pa.table({
        "image_id": ["c"],
        "bytes": [codecs.png_encode(rgb)],
        "w": pa.array([32], pa.int32()),
        "h": pa.array([32], pa.int32()),
        "fmt": ["png"],
    })
    for method in ("nearest", "average", "bilinear"):
        out = ImageResize(8, 8, method)(batch)
        assert out["fmt"][0].as_py() == "png"
        got = codecs.decode(out["bytes"][0].as_py(), "png")
        assert got.shape == (8, 8, 3)
        if method == "average":
            exp = np.rint(
                rgb.reshape(8, 4, 8, 4, 3).mean(axis=(1, 3))
            ).astype(np.uint8)
            assert np.array_equal(got, exp)


def test_frame_sample_container_dispatch():
    # mvid decodes for real (test_frame_sample_mvid) and mp4 PARSES for
    # real (tests/test_mp4.py) — malformed mp4 is a clear container error,
    # and genuinely-unknown containers stay declared gates
    from moaray.ops.multimodal import FrameSample

    with pytest.raises(ValueError, match="no moov"):
        FrameSample()(
            pa.table(
                {"video_id": ["v0"], "bytes": [b"\x00" * 16], "fmt": ["mp4"]}
            )
        )
    with pytest.raises(NotImplementedError, match="pyav/ffmpeg"):
        FrameSample()(
            pa.table(
                {"video_id": ["v0"], "bytes": [b"\x00"], "fmt": ["webm"]}
            )
        )


def test_langid_markers():
    from moaray.ops.text import langid_batch

    tbl = pa.table(
        {
            "doc_id": pa.array([0, 1, 2, 3, 4], pa.int64()),
            "text": [
                "hello there general words",
                "x der und y",
                "x el que y",
                "x le et y",
                "中文 text",
            ],
        }
    )
    out = langid_batch(tbl)["pred_lang"].to_pylist()
    assert out == ["en", "de", "es", "fr", "zh"]


def test_sessionize_vs_sql(con):
    from moaray.ops.relational import sessionize

    ds = sessionize(ray.data.read_parquet(f"{SF}/events.parquet"), 30)
    assert_matches_sql(
        ds,
        con,
        """WITH ordered AS (
              SELECT user_id, event_id, ts, value,
                     CASE WHEN lag(ts) OVER w IS NULL
                            OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
                          THEN 1 ELSE 0 END AS new_sess
              FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
            ), sess AS (
              SELECT user_id, ts, value,
                     SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                         ROWS UNBOUNDED PRECEDING) AS session_id
              FROM ordered
            )
            SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
                   strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
                   strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS session_end,
                   count(*) AS n_events, sum(CAST(round(value * 100) AS BIGINT)) / 100.0 AS sum_value
            FROM sess GROUP BY user_id, session_id""",
    )


def test_audio_features_pcm16():
    import numpy as np

    from moaray.ops.multimodal import audio_features, gen_audio_table

    tbl = gen_audio_table(n_clips=8, sample_rate=8000, seconds=0.25)
    got = audio_features(ray.data.from_arrow(tbl)).to_pandas()
    assert len(got) == 8
    assert (got["duration_s"] == 0.25).all()
    # sine at amplitude 0.5 -> rms ~ 0.3536, peak ~ 0.5
    assert np.allclose(got["rms"], 0.3536, atol=0.01)
    assert np.allclose(got["peak"], 0.5, atol=0.01)
    # zcr scales with frequency -> all distinct clip frequencies distinct zcr
    assert got["zcr"].nunique() == 8


def test_hll_distinct_accuracy(con):
    from moaray.ops.sketch import hll_distinct

    ev = ray.data.read_parquet(f"{SF}/events.parquet")
    df = hll_distinct(ev, "user_id", "event_type").to_pandas()
    exact = con.execute(
        "SELECT event_type, count(DISTINCT user_id) AS c "
        "FROM events GROUP BY event_type"
    ).df()
    exact_map = dict(zip(exact["event_type"].astype(str), exact["c"]))
    assert len(df) == len(exact_map)
    for _, r in df.iterrows():
        e = exact_map[r["group"]]
        assert abs(r["approx_distinct"] - e) / e < 0.05


def test_cm_heavy_hitters_contains_true_top(con):
    from moaray.ops.sketch import cm_heavy_hitters

    ev = ray.data.read_parquet(f"{SF}/events.parquet")
    hh = cm_heavy_hitters(ev, "user_id", k=10).to_pandas()
    true_top = con.execute(
        "SELECT user_id FROM events GROUP BY user_id "
        "ORDER BY count(*) DESC, user_id LIMIT 3"
    ).df()["user_id"].tolist()
    # count-min overestimates but never underestimates: the true heaviest
    # users must appear among the approximate top-10
    got = set(hh["value"].tolist())
    assert sum(1 for u in true_top if u in got) >= 2


def test_ngram_jaccard_exact_vs_bruteforce():
    from moaray.ops.dedup import ngram_jaccard_pairs

    docs = ray.data.read_parquet(f"{SF}/documents.parquet")
    got = ngram_jaccard_pairs(docs, threshold=0.3, k=3).to_pandas()

    # brute-force oracle over the same blocks
    import itertools

    rows = docs.select_columns(["doc_id", "text", "lang"]).take_all()
    want = set()
    by_lang = {}
    for r in rows:
        by_lang.setdefault(r["lang"], []).append(r)
    def grams(t):
        toks = t.split(" ")
        if len(toks) < 3:
            return {" ".join(toks)}
        return {" ".join(toks[i:i+3]) for i in range(len(toks)-2)}
    for lang, rs in by_lang.items():
        for a, b in itertools.combinations(rs, 2):
            ga, gb = grams(a["text"]), grams(b["text"])
            j = len(ga & gb) / len(ga | gb)
            if j >= 0.3:
                want.add((min(a["doc_id"], b["doc_id"]),
                          max(a["doc_id"], b["doc_id"])))
    assert set(zip(got["doc_a"], got["doc_b"])) == want


def test_minhash_estimates_ngram_jaccard():
    """MinHash est_jaccard approximates the exact n-gram jaccard for found
    pairs (same shingle definition)."""
    from moaray.ops.dedup import minhash_lsh_pairs, ngram_jaccard_pairs

    docs = ray.data.read_parquet(f"{SF}/documents.parquet")
    exact = ngram_jaccard_pairs(docs, threshold=0.5, k=3).to_pandas()
    mh = minhash_lsh_pairs(docs, threshold=0.5, k_shingle=3).to_pandas()
    exact_map = {
        (a, b): j for a, b, j in zip(exact["doc_a"], exact["doc_b"], exact["jaccard"])
    }
    checked = 0
    for a, b, est in zip(mh["doc_a"], mh["doc_b"], mh["est_jaccard"]):
        if (a, b) in exact_map:
            assert abs(est - exact_map[(a, b)]) < 0.35
            checked += 1
    assert checked > 0


def test_revenue_by_priority_join_paths_agree(ray_session):
    """Size-aware dispatch: the broadcast (searchsorted) path and the
    distributed hash-join path must produce identical rows."""
    import ray

    from moaray.io import read_parquet_clean
    from moaray.ops.relational import revenue_by_priority

    sf = "/root/testdata/sf0.001"
    li = f"{sf}/lineitem.parquet"
    orders = f"{sf}/orders.parquet"
    bcast = revenue_by_priority(
        read_parquet_clean(li), orders
    ).to_pandas().sort_values("o_orderpriority").reset_index(drop=True)
    joined = revenue_by_priority(
        read_parquet_clean(li), orders, broadcast_limit=0
    ).to_pandas().sort_values("o_orderpriority").reset_index(drop=True)
    assert bcast.equals(joined)


def test_revenue_by_nation_join_paths_agree(ray_session):
    """Size-aware dispatch (customer scales with SF — 15M rows at sf100):
    the broadcast (searchsorted) path and the distributed hash-join path
    must produce identical rows."""
    from moaray.io import read_parquet_clean
    from moaray.ops.relational import revenue_by_nation

    sf = "/root/testdata/sf0.001"
    orders = f"{sf}/orders.parquet"
    cust = f"{sf}/customer.parquet"
    nat = f"{sf}/nation.parquet"
    bcast = revenue_by_nation(
        read_parquet_clean(orders), cust, nat
    ).to_pandas().sort_values("n_name").reset_index(drop=True)
    joined = revenue_by_nation(
        read_parquet_clean(orders), cust, nat, broadcast_limit=0
    ).to_pandas().sort_values("n_name").reset_index(drop=True)
    assert bcast.equals(joined)
    assert len(bcast) > 1 and (bcast["revenue"] > 0).all()


def test_kmeans_fit_reduces_inertia(ray_session):
    """Lloyd iterations must not increase spherical inertia (sum of 1 -
    max-cosine to the assigned centroid)."""
    import numpy as np

    from moaray.ops.ann import _normalize, kmeans_fit

    e = ray.data.read_parquet(f"{SF}/embeddings.parquet")
    rows = e.select_columns(["embedding"]).take_all()
    mat = _normalize(np.array([r["embedding"] for r in rows], np.float64))

    def inertia(cent):
        return float((1.0 - (mat @ cent.T).max(axis=1)).sum())

    c0 = kmeans_fit(e, k=8, n_iters=0)  # init only
    c3 = kmeans_fit(e, k=8, n_iters=3)
    assert inertia(c3) <= inertia(c0) + 1e-9


def test_neardup_clusters_vs_bfs_oracle(ray_session):
    """Union-find clustering equals an independent BFS connected-components
    oracle on the same pair list."""
    from collections import defaultdict, deque

    from moaray.ops.dedup import charset_jaccard_pairs, neardup_clusters

    docs = ray.data.read_parquet(f"{SF}/documents.parquet")
    pairs_ds = charset_jaccard_pairs(docs, threshold=0.9)
    pairs = pairs_ds.select_columns(["doc_a", "doc_b"]).take_all()
    got = neardup_clusters(charset_jaccard_pairs(docs, threshold=0.9))
    got_map = dict(zip(got["doc_id"].to_pylist(), got["cluster_id"].to_pylist()))

    adj = defaultdict(set)
    for r in pairs:
        adj[r["doc_a"]].add(r["doc_b"])
        adj[r["doc_b"]].add(r["doc_a"])
    seen = set()
    for start in sorted(adj):
        if start in seen:
            continue
        comp, q = [], deque([start])
        seen.add(start)
        while q:
            u = q.popleft()
            comp.append(u)
            for v in adj[u]:
                if v not in seen:
                    seen.add(v)
                    q.append(v)
        label = min(comp)
        for u in comp:
            assert got_map[u] == label
    assert len(got_map) == len(adj)


def test_bpe_token_count_simple(ray_session):
    from moaray.ops.text import bpe_token_count_batch

    tbl = pa.table(
        {
            "doc_id": pa.array([0, 1], pa.int64()),
            "text": ["Hello, world! 42x", ""],
        }
    )
    out = bpe_token_count_batch(tbl)
    # Hello | , | world | ! | 42 | x  -> 6
    assert out["n_bpe_tokens"].to_pylist() == [6, 0]


def test_wav_roundtrip_and_features(ray_session):
    import numpy as np

    from moaray.ops.multimodal import (
        AudioFeatures,
        gen_audio_table,
        wav_decode,
        wav_encode,
    )

    rng = np.random.RandomState(2)
    pcm = (rng.randn(8000) * 3000).astype(np.int16)
    buf = wav_encode(pcm, 8000)
    back, sr = wav_decode(buf)
    assert sr == 8000 and np.array_equal(back, pcm)

    # stereo downmix: L/R average
    import struct

    stereo = np.empty(16, np.int16)
    stereo[0::2] = 100
    stereo[1::2] = 200
    raw = stereo.astype("<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, 2, 8000, 32000, 4, 16)
    body = (b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(raw)) + raw)
    mono, _ = wav_decode(b"RIFF" + struct.pack("<I", len(body)) + body)
    assert (mono == 150).all()

    # identical samples through fmt="wav" and fmt="pcm16" give identical
    # features
    clips = gen_audio_table(n_clips=4)
    wav_rows = {
        "clip_id": clips["clip_id"],
        "bytes": pa.array(
            [wav_encode(np.frombuffer(b.as_py(), dtype="<i2"), 8000)
             for b in clips["bytes"]],
            pa.binary(),
        ),
        "sample_rate": clips["sample_rate"],
        "fmt": pa.array(["wav"] * 4, pa.string()),
    }
    feats_pcm = AudioFeatures()(clips)
    feats_wav = AudioFeatures()(pa.table(wav_rows))
    assert feats_pcm.equals(feats_wav)


def test_quantile_sketch_accuracy(ray_session):
    import numpy as np
    import pyarrow.parquet as pq

    from moaray.ops.sketch import quantile_sketch

    e = ray.data.read_parquet(f"{SF}/events.parquet")
    rows = quantile_sketch(e, "value", qs=(0.1, 0.5, 0.9, 0.99)).take_all()
    vals = pq.read_table(f"{SF}/events.parquet", columns=["value"])[
        "value"
    ].to_numpy()
    spread = float(np.quantile(vals, 0.99) - np.quantile(vals, 0.01))
    for r in rows:
        exact = float(np.quantile(vals, r["q"]))
        assert abs(r["value"] - exact) < 0.02 * spread, (r["q"], r["value"], exact)


def test_hash_sample_deterministic(ray_session):
    from moaray.ops.text import hash_sample

    e = ray.data.read_parquet(f"{SF}/events.parquet")
    a = sorted(hash_sample(e, "event_id", "40", ["event_id"]).take_all(),
               key=lambda r: r["event_id"])
    b = sorted(hash_sample(e, "event_id", "40", ["event_id"]).take_all(),
               key=lambda r: r["event_id"])
    assert a == b and 0 < len(a) < e.count()
    # ~25% of rows survive the '40' prefix gate
    assert abs(len(a) / e.count() - 0.25) < 0.03


def test_frame_sample_mvid(ray_session):
    import numpy as np

    from moaray import codecs
    from moaray.ops.multimodal import frame_sample, gen_video_table

    vids = ray.data.from_arrow(gen_video_table(n_videos=3, n_frames=25))
    rows = frame_sample(vids, stride=10).take_all()
    # frames 0, 10, 20 per video
    assert len(rows) == 9
    by_vid = {}
    for r in rows:
        by_vid.setdefault(r["video_id"], []).append(r)
    for v, rs in by_vid.items():
        assert sorted(r["frame_idx"] for r in rs) == [0, 10, 20]
        for r in rs:
            arr = codecs.decode(r["bytes"], "raw16")
            vidx = int(v[3:])
            assert (arr == (vidx * 1000 + r["frame_idx"]) % 60000).all()
            assert arr.shape == (r["h"], r["w"])


def test_grouped_quantile_sketch_accuracy(ray_session):
    import numpy as np
    import pyarrow.parquet as pq

    from moaray.ops.sketch import grouped_quantile_sketch

    e = ray.data.read_parquet(f"{SF}/events.parquet")
    rows = grouped_quantile_sketch(
        e, "value", "event_type", qs=(0.5, 0.9)
    ).take_all()
    tbl = pq.read_table(f"{SF}/events.parquet", columns=["event_type", "value"])
    keys = np.array(tbl["event_type"].to_pylist())
    vals = tbl["value"].to_numpy()
    assert len({r["group"] for r in rows}) == len(set(keys))
    for r in rows:
        sel = vals[keys == r["group"]]
        exact = float(np.quantile(sel, r["q"]))
        spread = float(np.quantile(sel, 0.99) - np.quantile(sel, 0.01))
        assert abs(r["value"] - exact) < 0.03 * max(spread, 1e-9)


def test_distributed_cc_equals_union_find(ray_session):
    """Alternating large/small-star distributed connected components must
    label every node identically to the driver union-find baseline."""
    from moaray.ops.dedup import (
        charset_jaccard_pairs,
        neardup_clusters,
        neardup_clusters_distributed,
    )

    uf = neardup_clusters(charset_jaccard_pairs(docs(), threshold=0.9))
    dist = neardup_clusters_distributed(
        charset_jaccard_pairs(docs(), threshold=0.9)
    ).take_all()
    uf_map = dict(zip(uf["doc_id"].to_pylist(), uf["cluster_id"].to_pylist()))
    dist_map = {r["doc_id"]: r["cluster_id"] for r in dist}
    assert uf_map == dist_map and len(uf_map) > 0


def test_frame_sample_non_uint16_frames():
    """mvid frames are dtype-generic raw16 payloads — frame slicing must
    size frames by the actual itemsize (round-2 ADVICE, multimodal.py)."""
    import struct

    from moaray import codecs
    from moaray.ops.multimodal import frame_sample

    frames = [np.full((8, 8), float(k) + 0.5, np.float32) for k in range(4)]
    blob = b"".join(
        [struct.pack("<I", len(frames))]
        + [codecs.encode(f, "raw16") for f in frames]
    )
    tbl = pa.table(
        {
            "video_id": pa.array(["v0"], pa.string()),
            "bytes": pa.array([blob], pa.binary()),
            "fmt": pa.array(["mvid"], pa.string()),
        }
    )
    out = frame_sample(ray.data.from_arrow(tbl), stride=1).take_all()
    assert [r["frame_idx"] for r in out] == [0, 1, 2, 3]
    for r in out:
        arr = codecs.decode(r["bytes"])
        assert arr.dtype == np.float32
        assert float(arr[0, 0]) == r["frame_idx"] + 0.5


def test_kmeans_fit_sample_deterministic(ray_session):
    from moaray.ops.ann import kmeans_fit_sample

    e = emb()
    c1 = kmeans_fit_sample(e, k=8)
    c2 = kmeans_fit_sample(e, k=8)
    assert c1.shape == (8, c1.shape[1])
    assert np.allclose(c1, c2)
    assert np.allclose(np.linalg.norm(c1, axis=1), 1.0)


def test_knn_pq_recall_vs_bruteforce():
    from moaray.ops.ann import knn_bruteforce, knn_pq, load_queries

    e = emb()
    qids, qmat = load_queries(e, n_queries=5)
    bf = knn_bruteforce(e, qids, qmat, k=5).to_pandas()
    pq = knn_pq(e, qids, qmat, k=5, n_subspaces=16, hex_lt="ff").to_pandas()
    bf_set = set(zip(bf["query_id"], bf["neighbor_id"]))
    pq_set = set(zip(pq["query_id"], pq["neighbor_id"]))
    recall = len(bf_set & pq_set) / len(bf_set)
    assert recall >= 0.5, f"PQ recall too low: {recall}"


def test_pq_codes_shape_and_determinism():
    from moaray.ops.ann import pq_encode, pq_fit_codebooks

    e = emb()
    b1 = pq_fit_codebooks(e, n_subspaces=8, hex_lt="ff")
    b2 = pq_fit_codebooks(e, n_subspaces=8, hex_lt="ff")
    assert np.allclose(b1, b2)
    codes = pq_encode(e, b1).take_all()
    assert all(len(r["codes"]) == 8 for r in codes)
    assert all(0 <= c < b1.shape[1] for r in codes for c in r["codes"])


def test_parts_by_brand_vs_sql(con):
    from moaray.ops.relational import parts_by_brand

    ds = parts_by_brand(ray.data.read_parquet(f"{SF}/part.parquet"))
    assert_matches_sql(
        ds,
        con,
        """SELECT p_brand, count(*) AS n_parts,
                  sum(CAST(round(p_retailprice*100) AS BIGINT))/100.0 AS sum_retail,
                  CAST(min(p_size) AS BIGINT) AS min_size,
                  CAST(max(p_size) AS BIGINT) AS max_size
           FROM part GROUP BY p_brand""",
    )


def test_supplier_region_stats_vs_sql(con):
    from moaray.ops.relational import supplier_region_stats

    ds = supplier_region_stats(
        ray.data.read_parquet(f"{SF}/supplier.parquet"),
        f"{SF}/nation.parquet",
        f"{SF}/region.parquet",
    )
    assert_matches_sql(
        ds,
        con,
        """SELECT r_name, count(*) AS n_suppliers,
                  sum(CAST(round(s_acctbal*100) AS BIGINT))/100.0 AS sum_acctbal
           FROM supplier JOIN nation ON s_nationkey = n_nationkey
           JOIN region ON n_regionkey = r_regionkey
           GROUP BY r_name""",
    )


def test_knn_ivf_pq_recall_vs_bruteforce():
    from moaray.ops.ann import knn_bruteforce, knn_ivf_pq, load_queries

    e = emb()
    qids, qmat = load_queries(e, n_queries=5)
    bf = knn_bruteforce(e, qids, qmat, k=5).to_pandas()
    ip = knn_ivf_pq(
        e, qids, qmat, k=5, n_centroids=8, nprobe=4, n_subspaces=32,
        hex_lt="ff",
    ).to_pandas()
    bf_set = set(zip(bf["query_id"], bf["neighbor_id"]))
    ip_set = set(zip(ip["query_id"], ip["neighbor_id"]))
    recall = len(bf_set & ip_set) / len(bf_set)
    assert recall >= 0.5, f"IVF-PQ recall too low: {recall}"


def test_phash_neardup_pairs():
    """Perceptual-hash image dedup over the catalog's phash column: exact
    duplicates and <=3-bit variants pair; distant hashes don't."""
    from moaray.ops.dedup import phash_neardup_pairs

    base = 0x0123456789ABCDEF
    tbl = pa.table(
        {
            "image_id": pa.array(["a", "b", "c", "d"], pa.string()),
            "phash": pa.array(
                [base, base ^ 0b101, base, base ^ ((1 << 40) - 1)],
                pa.int64(),
            ),
        }
    )
    pairs = phash_neardup_pairs(ray.data.from_arrow(tbl)).to_pandas()
    got = {(a, b) for a, b in zip(pairs["image_a"], pairs["image_b"])}
    assert ("a", "c") in got  # identical
    assert ("a", "b") in got and ("b", "c") in got  # hamming 2
    assert not any("d" in p for p in got)


def test_multimodal_errors_skip():
    # corrupt rows drop (logged) instead of failing the stage — the
    # at-scale corpus posture, mirrored by MosaicConfig.on_decode_error
    import numpy as np

    from moaray import codecs
    from moaray.ops.multimodal import (
        AudioMetadata,
        FrameSample,
        ImageFeatures,
        ImageResize,
        mvid_encode,
        wav_encode,
    )

    good = codecs.encode(np.arange(64, dtype=np.uint16).reshape(8, 8), "z16")
    bad = b"\x89PNG\r\n\x1a\x0aGARBAGE"
    imgs = pa.table({
        "image_id": ["ok", "corrupt"],
        "bytes": [good, bad],
        "fmt": ["z16", "png"],
        "w": pa.array([8, 8], pa.int32()),
        "h": pa.array([8, 8], pa.int32()),
    })
    with pytest.raises(Exception):
        ImageFeatures()(imgs)  # strict default still raises
    out = ImageFeatures(errors="skip")(imgs)
    assert out["image_id"].to_pylist() == ["ok"]
    out = ImageResize(4, 4, "nearest", errors="skip")(imgs)
    assert out["image_id"].to_pylist() == ["ok"]

    x = (np.sin(np.arange(4000) / 9) * 5000).astype(np.int16)
    clips = pa.table({
        "clip_id": ["ok", "corrupt"],
        "bytes": [wav_encode(x, 8000), b"fLaCjunk"],
        "fmt": ["wav", "flac"],
        "sample_rate": pa.array([8000, 0], pa.int32()),
    })
    out = AudioMetadata(errors="skip")(clips)
    assert out["clip_id"].to_pylist() == ["ok"]

    frames = [np.full((4, 4), v, np.uint16) for v in (1, 2, 3)]
    vids = pa.table({
        "video_id": ["ok", "corrupt"],
        "bytes": [mvid_encode(frames), b"\x03\x00\x00\x00NOTMRAY"],
        "fmt": ["mvid", "mvid"],
    })
    out = FrameSample(stride=1, errors="skip")(vids)
    assert set(out["video_id"].to_pylist()) == {"ok"}
    assert out.num_rows == 3
    # declared gates are NOT swallowed by skip
    with pytest.raises(NotImplementedError):
        FrameSample(errors="skip")(
            pa.table({"video_id": ["v"], "bytes": [b"x"], "fmt": ["webm"]})
        )


def test_catalog_census():
    from moaray.ops.relational import catalog_census
    from moaray.testgen import Layout, images_path

    ds = ray.data.read_parquet(
        images_path(Layout("grid3x3", 9, 64), fmts=("raw16", "z16", "q12"))
    )
    out = catalog_census(ds).to_pandas()
    assert set(out["fmt"]) == {"raw16", "z16", "q12"}
    assert out["n_images"].sum() == 9
    raw = out[out["fmt"] == "raw16"].iloc[0]
    assert raw["total_bytes"] == 3 * (14 + 64 * 64 * 2)  # header + pixels
    assert raw["avg_w"] == 64.0 and raw["avg_h"] == 64.0


def test_asof_and_range_join_match_duckdb(ray_session):
    """The two temporal custom operators (prompt's 'as-of join, range
    join') against DuckDB's native ASOF JOIN / interval join, exact."""
    import duckdb
    import pandas as pd

    from moaray.io import read_parquet_clean
    from moaray.ops.relational import asof_join_events, range_join_events

    sf = "/root/testdata/sf0.001"
    ev = read_parquet_clean(f"{sf}/events.parquet")
    con = duckdb.connect()
    con.execute(
        f"create view events as select * from "
        f"read_parquet('{sf}/events.parquet')"
    )

    got = asof_join_events(ev).to_pandas().sort_values(
        "event_id").reset_index(drop=True)
    want = con.execute("""
        WITH v AS (
          SELECT user_id, ts, max(value) AS vmax FROM events
          WHERE event_type = 'view' GROUP BY user_id, ts
        )
        SELECT p.event_id, p.user_id,
               strftime(p.ts, '%Y-%m-%d %H:%M:%S') AS event_ts,
               strftime(v.ts, '%Y-%m-%d %H:%M:%S') AS view_ts,
               CAST(round(v.vmax * 100) AS BIGINT) / 100.0 AS view_value
        FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        ASOF JOIN v ON p.user_id = v.user_id AND p.ts >= v.ts
        ORDER BY p.event_id
    """).df().reset_index(drop=True)
    assert len(got) > 50
    pd.testing.assert_frame_equal(
        got[want.columns.tolist()].astype({"user_id": "int64"}),
        want.astype({"user_id": "int64"}),
    )

    got2 = range_join_events(ev).to_pandas().sort_values(
        ["left_event_id", "right_event_id"]).reset_index(drop=True)
    want2 = con.execute("""
        SELECT e.user_id, e.event_id AS left_event_id,
               c.event_id AS right_event_id
        FROM (SELECT * FROM events WHERE event_type = 'error') e
        JOIN (SELECT * FROM events WHERE event_type = 'click') c
          ON e.user_id = c.user_id
         AND c.ts >= e.ts - INTERVAL 60 MINUTE AND c.ts < e.ts
        ORDER BY left_event_id, right_event_id
    """).df().reset_index(drop=True)
    assert len(got2) > 0
    pd.testing.assert_frame_equal(
        got2[want2.columns.tolist()].astype("int64"),
        want2.astype("int64"),
    )


def test_word_freq_and_length_histogram_vs_sql(con):
    from moaray.ops.text import length_histogram, word_freq

    assert_matches_sql(
        word_freq(docs(), k=50),
        con,
        """SELECT word, count(*) AS n FROM (
             SELECT unnest(str_split(text, ' ')) AS word FROM documents
           ) GROUP BY word ORDER BY n DESC, word ASC LIMIT 50""",
    )
    assert_matches_sql(
        length_histogram(docs()),
        con,
        """SELECT CAST(least(n_chars // 16, 31) AS BIGINT) AS bin,
                  CAST(least(n_chars // 16, 31) * 16 AS BIGINT) AS lo_chars,
                  count(*) AS n_docs
           FROM documents GROUP BY 1, 2""",
    )


def test_compute_phash_produces_and_composes(ray_session):
    """The fingerprint PRODUCER: identical images hash identically, mild
    noise stays within a small hamming radius, different content is far;
    output schema feeds dedup.phash_neardup_pairs directly."""
    from moaray import codecs
    from moaray.ops.dedup import phash_neardup_pairs
    from moaray.ops.multimodal import compute_phash

    rng = np.random.RandomState(0)
    sm = (rng.rand(96, 128) * 60000).astype(np.float64)
    from numpy.lib.stride_tricks import sliding_window_view

    for _ in range(3):  # smooth: perceptual structure, not white noise
        sm[2:-2, 2:-2] = sliding_window_view(sm, (5, 5)).reshape(
            92, 124, 25).mean(-1)
    base = sm.astype(np.uint16)
    noisy = np.clip(
        base.astype(np.int64) + rng.randint(-300, 300, base.shape),
        0, 65535,
    ).astype(np.uint16)
    other = (np.outer(np.arange(96), np.arange(128)) % 60000).astype(
        np.uint16)
    tbl = pa.table({
        "image_id": pa.array(["a", "a2", "n", "o"], pa.string()),
        "bytes": pa.array(
            [codecs.encode(x, "z16") for x in (base, base, noisy, other)],
            pa.binary(),
        ),
        "fmt": pa.array(["z16"] * 4, pa.string()),
    })
    ph = {r["image_id"]: r["phash"]
          for r in compute_phash(ray.data.from_arrow(tbl)).take_all()}

    def ham(a, b):
        return bin((a ^ b) & ((1 << 64) - 1)).count("1")

    assert ham(ph["a"], ph["a2"]) == 0
    assert ham(ph["a"], ph["n"]) <= 6
    assert ham(ph["a"], ph["o"]) > 12
    pairs = phash_neardup_pairs(
        compute_phash(ray.data.from_arrow(tbl)), max_hamming=6
    ).take_all()
    got = {tuple(sorted((r[list(r)[0]], r[list(r)[1]]))) for r in pairs}
    assert ("a", "a2") in got and ("a", "n") in got
    assert not any("o" in p for p in got)


def test_repetition_signals_hand_and_sql(con):
    """Gopher-style repetition trio: hand-computed fractions on crafted
    docs, then the full-corpus DuckDB parity (bitwise, via round())."""
    import pyarrow as pa

    from moaray.ops.text import repetition_batch, repetition_signals

    b = pa.table({
        "doc_id": pa.array([0, 1, 2], pa.int64()),
        "text": pa.array(["a b a b a", "x y z", "q q q q"]),
    })
    out = repetition_batch(b).to_pandas()
    assert out["n_tokens"].tolist() == [5, 3, 4]
    assert out["n_distinct_tokens"].tolist() == [2, 3, 1]
    assert out["dup_token_frac"].tolist() == [0.6, 0.0, 0.75]
    assert out["top_token_frac"].tolist() == [0.6, 0.3333, 1.0]
    # "a b" occurs twice of 4 bigrams; "q q" 3 of 3
    assert out["top_bigram_frac"].tolist() == [0.5, 0.5, 1.0]

    assert_matches_sql(
        repetition_signals(docs()),
        con,
        """WITH t AS (
             SELECT doc_id, str_split(lower(text), ' ') AS toks
             FROM documents
           ),
           tok AS (
             SELECT doc_id, u.i AS i, toks[u.i] AS w, len(toks) AS n
             FROM t, unnest(range(1, len(toks)+1)) AS u(i)
           ),
           tc AS (SELECT doc_id, w, count(*) c FROM tok GROUP BY doc_id, w),
           t1 AS (
             SELECT doc_id, count(*) nd, max(c) top1, sum(c) n
             FROM tc GROUP BY doc_id
           ),
           bg AS (
             SELECT a.doc_id AS doc_id, a.w || ' ' || b.w AS pair, count(*) c
             FROM tok a JOIN tok b ON a.doc_id = b.doc_id AND b.i = a.i + 1
             GROUP BY a.doc_id, pair
           ),
           t2 AS (SELECT doc_id, max(c) top2 FROM bg GROUP BY doc_id)
           SELECT t1.doc_id, CAST(t1.n AS BIGINT) AS n_tokens,
                  CAST(t1.nd AS BIGINT) AS n_distinct_tokens,
                  round((t1.n - t1.nd) / greatest(t1.n, 1), 4)
                    AS dup_token_frac,
                  round(t1.top1 / greatest(t1.n, 1), 4) AS top_token_frac,
                  round(t2.top2 / greatest(t1.n - 1, 1), 4)
                    AS top_bigram_frac
           FROM t1 JOIN t2 USING (doc_id)""",
    )


def test_contamination_flags_hand_case(ray_session):
    """Decontamination: a training doc repeating a benchmark 3-gram is
    flagged with the exact distinct-shared-gram count; disjoint docs are
    clean; docs shorter than n emit zero grams but still appear."""
    import pyarrow as pa
    import ray.data as rd

    from moaray.ops.text import benchmark_ngrams, contamination_flags

    bench = rd.from_arrow(pa.table({
        "doc_id": pa.array([100], pa.int64()),
        "text": pa.array(["the quick brown fox jumps"]),
    }))
    train = rd.from_arrow(pa.table({
        "doc_id": pa.array([0, 1, 2], pa.int64()),
        # doc 0 shares "the quick brown" and "quick brown fox" (the
        # second occurrence must not double-count); doc 1 disjoint;
        # doc 2 shorter than n
        "text": pa.array([
            "x the quick brown fox y the quick brown fox",
            "totally different words here now",
            "too short",
        ]),
    }))
    grams = benchmark_ngrams(bench, n=3)
    assert len(grams) == 3
    out = (contamination_flags(train, grams, n=3, concurrency=2)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert out["n_shared_ngrams"].tolist() == [2, 0, 0]
    assert out["contaminated"].tolist() == [1, 0, 0]


def test_semantic_dedup_oracle_and_invariants(ray_session):
    """SemDeDup: with one cluster the result equals the global greedy
    lowest-id-representative oracle; with many clusters the survivor set
    satisfies the defining invariants (survivors pairwise < threshold
    within a cluster; every pruned row has a kept >=threshold neighbor
    in its cluster)."""
    import pyarrow as pa
    import ray.data as rd

    from moaray.ops.dedup import semantic_dedup

    rng = np.random.RandomState(7)
    base = rng.randn(40, 16)
    # plant near-dup families: rows 3i+1, 3i+2 are jittered copies of 3i
    vecs = []
    for i in range(40):
        fam = base[i // 3 * 3 % 40] if False else base[(i // 3) * 3 % 40]
        vecs.append(fam + rng.randn(16) * 0.05)
    vecs = np.array(vecs)
    tbl = pa.table({
        "vec_id": pa.array(np.arange(40), pa.int64()),
        "embedding": pa.array([list(map(float, v)) for v in vecs],
                              pa.list_(pa.float32())),
    })
    ds = rd.from_arrow(tbl)
    th = 0.95

    matn = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    sims = matn @ matn.T

    # single cluster == global greedy oracle
    out1 = (semantic_dedup(ds, n_clusters=1, threshold=th)
            .to_pandas().sort_values("vec_id").reset_index(drop=True))
    kept_oracle, kept_ids = [], []
    for i in range(40):
        if not kept_ids or sims[i, kept_ids].max() < th:
            kept_oracle.append(1)
            kept_ids.append(i)
        else:
            kept_oracle.append(0)
    assert out1["kept"].tolist() == kept_oracle
    assert 1 <= out1["kept"].sum() < 40  # families actually pruned

    # multi-cluster invariants
    out = (semantic_dedup(ds, n_clusters=4, threshold=th)
           .to_pandas().sort_values("vec_id").reset_index(drop=True))
    assert len(out) == 40
    for cid, grp in out.groupby("cluster_id"):
        kept = grp[grp["kept"] == 1]["vec_id"].to_numpy()
        pruned = grp[grp["kept"] == 0]["vec_id"].to_numpy()
        if len(kept) > 1:
            sub = sims[np.ix_(kept, kept)]
            np.fill_diagonal(sub, 0.0)
            assert sub.max() < th
        for p in pruned:
            smaller = kept[kept < p]
            assert len(smaller) and sims[p, smaller].max() >= th


def test_dup_ngram_stats_vs_sql(con):
    """Duplicated-substring census == the DuckDB distinct-gram truth, plus
    a constructed fixture where the shared span is known exactly."""
    from moaray.ops.text import dup_ngram_stats

    assert_matches_sql(
        dup_ngram_stats(docs(), n=8),
        con,
        """WITH t AS (
             SELECT doc_id, str_split(lower(text), ' ') AS toks
             FROM documents),
           g AS (
             SELECT DISTINCT doc_id,
                    toks[u.i] || ' ' || toks[u.i+1] || ' ' || toks[u.i+2]
                      || ' ' || toks[u.i+3] || ' ' || toks[u.i+4]
                      || ' ' || toks[u.i+5] || ' ' || toks[u.i+6]
                      || ' ' || toks[u.i+7] AS gram
             FROM t, unnest(range(1, len(toks) - 6)) AS u(i)
             WHERE len(toks) >= 8),
           df AS (SELECT gram, count(*) AS nd FROM g GROUP BY gram)
           SELECT d.doc_id,
                  CAST(count(g.gram) AS BIGINT) AS n_grams,
                  CAST(count(g.gram) FILTER (WHERE df.nd >= 2) AS BIGINT)
                    AS n_shared_grams
           FROM documents d
           LEFT JOIN g USING (doc_id) LEFT JOIN df USING (gram)
           GROUP BY d.doc_id""",
    )

    # constructed: docs 0/1 share one 8-token span, doc 2 is disjoint,
    # doc 3 is too short for any 8-gram
    span = "a b c d e f g h"
    fix = ray.data.from_items([
        {"doc_id": 0, "text": f"x1 x2 {span} y1 y2"},
        {"doc_id": 1, "text": f"z1 {span} z2 z3 z4"},
        {"doc_id": 2, "text": "p q r s t u v w x y z"},
        {"doc_id": 3, "text": "too short"},
    ])
    out = (dup_ngram_stats(fix, n=8).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    # doc0: 12 toks -> 5 grams; grams containing only span tokens: just the
    # span itself (positions straddling x/y tokens are unique)
    assert out["n_grams"].tolist() == [5, 5, 4, 0]
    assert out["n_shared_grams"].tolist() == [1, 1, 0, 0]


def test_exact_group_quantiles_vs_sql(con):
    from moaray.ops.relational import exact_group_quantiles

    ds = exact_group_quantiles(
        ray.data.read_parquet(f"{SF}/events.parquet"), "value",
        "event_type", qs=(0.5, 0.9, 0.99),
    )
    assert_matches_sql(
        ds,
        con,
        """SELECT event_type, 0.5 AS q, quantile_disc(value, 0.5) AS value,
                  count(*) AS n_rows FROM events GROUP BY event_type
           UNION ALL
           SELECT event_type, 0.9, quantile_disc(value, 0.9), count(*)
           FROM events GROUP BY event_type
           UNION ALL
           SELECT event_type, 0.99, quantile_disc(value, 0.99), count(*)
           FROM events GROUP BY event_type""",
    )


def test_pii_redact_fixture_and_sql(ray_session):
    """pii_redact: every rule class fires on a synthetic fixture, order
    effects (card-before-phone, email-before-ip) hold, and the Ray output
    matches the exact DuckDB regexp chain used as the driver oracle."""
    from moaray.ops import text as t

    fixture = pa.table({
        "doc_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
        "text": pa.array([
            "mail bob.smith+x@ex-ample.co.uk or root@10.0.0.1 now",
            "ssn 123-45-6789 card 1234 5678 9012 3456 tel 555-123-4567",
            "hosts 192.168.0.1 and 8.8.8.8; dates 2026-08-18 stay",
            "no pii at all 12",
            "card 1234-5678-9012-3456 then phone 555.123.4567",
        ]),
    })
    ds = ray.data.from_arrow(fixture).map_batches(
        t.pii_redact_batch, batch_format="pyarrow")
    got = {r["doc_id"]: r for r in ds.take_all()}
    # email consumed whole; bare user@ip keeps the IP for the ipv4 rule
    assert got[1]["clean_text"] == "mail <EMAIL> or root@<IP> now"
    assert got[1]["n_redactions"] == 2
    assert got[2]["clean_text"] == "ssn <SSN> card <CARD> tel <PHONE>"
    # a date (2026-08-18) must NOT be eaten by the SSN/phone rules
    assert got[3]["clean_text"] == "hosts <IP> and <IP>; dates 2026-08-18 stay"
    assert got[4]["n_redactions"] == 0
    # 4-4-4-4 digit runs are CARD, never re-parsed as 3-3-4 PHONE
    assert got[5]["clean_text"] == "card <CARD> then phone <PHONE>"

    import __ray_entry__ as entry
    con2 = duckdb.connect()
    con2.register("documents", fixture)
    want = {r[0]: r for r in con2.execute(
        entry.oracle_sql()["pii_redact"]).fetchall()}
    for did, row in got.items():
        assert want[did][1] == row["clean_text"]
        assert want[did][2] == row["n_redactions"]


def test_neardup_filter_paths_match_sql(con, ray_session):
    """neardup_filter: broadcast and distributed-join dispatch paths both
    equal the SQL anti-join truth (keep-first over charset-Jaccard pairs)."""
    from moaray.ops import dedup

    want = [r[0] for r in con.sql("""
        SELECT d.doc_id FROM documents d
        WHERE d.doc_id NOT IN (
          SELECT b.doc_id FROM documents a JOIN documents b
            ON a.lang = b.lang AND a.doc_id < b.doc_id
          WHERE jaccard(a.text, b.text) >= 0.9)
        ORDER BY d.doc_id""").fetchall()]
    assert 0 < len(want) < docs().count()  # the fixture actually dedups

    for limit in (5_000_000, 0):  # broadcast path, then forced join path
        pairs = dedup.charset_jaccard_pairs(docs(), threshold=0.9)
        out = dedup.neardup_filter(docs(), pairs, broadcast_limit=limit)
        ids = sorted(r["doc_id"]
                     for r in out.select_columns(["doc_id"]).take_all())
        assert ids == want, f"broadcast_limit={limit}"

    # empty pair list -> identity (both paths)
    empty = ray.data.from_arrow(pa.table(
        {"doc_a": pa.array([], pa.int64()), "doc_b": pa.array([], pa.int64()),
         "jaccard": pa.array([], pa.float64())}))
    assert dedup.neardup_filter(docs(), empty).count() == docs().count()


@pytest.mark.parametrize("seed,limit", [(0, 5_000_000), (1, 5_000_000),
                                        (2, 0), (3, 0)])
def test_neardup_filter_random_pairs_invariant(ray_session, seed, limit):
    """Random pair lists: survivors == all ids minus the distinct doc_b
    set, on both dispatch paths (limit=0 forces the hash-join path)."""
    from moaray.ops.dedup import neardup_filter

    rng = np.random.RandomState(seed)
    ids = np.arange(200, dtype=np.int64)
    corpus = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(ids), "payload": pa.array(ids * 7)}))
    a = rng.randint(0, 199, size=40).astype(np.int64)
    b = (a + rng.randint(1, 200 - a)).astype(np.int64)  # a < b always
    pairs = ray.data.from_arrow(pa.table({
        "doc_a": pa.array(a), "doc_b": pa.array(b),
        "jaccard": pa.array(np.ones(40))}))
    out = neardup_filter(corpus, pairs, broadcast_limit=limit)
    got = sorted(r["doc_id"] for r in out.take_all())
    want = sorted(set(ids.tolist()) - set(b.tolist()))
    assert got == want
    # payload columns survive untouched
    row = out.take(1)[0]
    assert row["payload"] == row["doc_id"] * 7


def test_sequence_pack_invariants(ray_session):
    """Concat-packing invariants on a synthetic corpus: per-shard streams
    are contiguous doc_id-ordered cumsums, seq ids are exact integer
    division, and boundary-crossing docs span exactly the sequences their
    token range covers."""
    from moaray.ops.text import sequence_pack

    rng = np.random.RandomState(5)
    n = 60
    texts = [" ".join("w" for _ in range(int(rng.randint(1, 30))))
             for _ in range(n)]
    docs = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(np.arange(n, dtype=np.int64)),
        "text": pa.array(texts),
    }))
    L, S = 16, 4
    rows = sorted(sequence_pack(docs, seq_len=L, n_shards=S).take_all(),
                  key=lambda r: r["doc_id"])
    assert len(rows) == n
    by_shard = {}
    for r in rows:
        assert r["shard"] == r["doc_id"] % S
        assert r["n_tokens"] == len(texts[r["doc_id"]].split(" "))
        assert r["seq_first"] == r["start_tok"] // L
        assert r["seq_last"] == (r["start_tok"] + r["n_tokens"] - 1) // L
        by_shard.setdefault(r["shard"], []).append(r)
    for shard, rs in by_shard.items():
        rs.sort(key=lambda r: r["doc_id"])  # stream order
        cum = 0
        for r in rs:
            assert r["start_tok"] == cum, (shard, r)
            cum += r["n_tokens"]
    # at least one doc must cross a sequence boundary at L=16
    assert any(r["seq_last"] > r["seq_first"] for r in rows)


def test_events_hopping_window(ray_session):
    import numpy as np
    import pyarrow.parquet as pq

    from moaray.ops.relational import events_hopping_window

    ds = ray.data.read_parquet(f"{SF}/events.parquet",
                               columns=["ts", "event_type", "value"])
    rows = events_hopping_window(ds, size_s=3600, slide_s=900).take_all()

    t = pq.read_table(f"{SF}/events.parquet",
                      columns=["ts", "event_type", "value"])
    micros = t["ts"].cast(pa.int64()).to_numpy()
    base = (micros // 1_000_000) // 900 * 900
    et = np.asarray(t["event_type"].to_pylist())
    cents = np.rint(t["value"].to_numpy() * 100.0).astype(np.int64)

    # brute force: every event lands in exactly 4 windows
    from collections import defaultdict
    exp = defaultdict(lambda: [0, 0])
    for e, b, c in zip(et, base, cents):
        for i in range(4):
            k = (e, int(b - i * 900))
            exp[k][0] += 1
            exp[k][1] += int(c)
    assert len(rows) == len(exp)
    import datetime as _dt

    for r in rows:
        w = int(_dt.datetime.strptime(
            r["window_start"], "%Y-%m-%d %H:%M:%S"
        ).replace(tzinfo=_dt.timezone.utc).timestamp())
        n, s = exp[(r["event_type"], w)]
        assert r["n_events"] == n
        assert r["sum_value"] == s / 100.0
    # conservation: every event appears in exactly 4 windows
    assert sum(r["n_events"] for r in rows) == 4 * t.num_rows

    with pytest.raises(ValueError, match="divide"):
        events_hopping_window(ds, size_s=3600, slide_s=1000)


def test_events_hopping_window_pre_epoch(ray_session):
    """Negative (pre-1970) timestamps must bucket with FLOOR division like
    the SQL oracle's // — Arrow's trunc-toward-zero would shift them one
    window late (round-4 advice)."""
    import datetime as _dt

    from moaray.ops.relational import events_hopping_window

    # timestamps straddling the epoch, including ones not on a boundary
    micros = np.array([
        -7_200_000_000,        # 1969-12-31 22:00:00 (on a window edge)
        -5_399_000_001,        # 1969-12-31 22:30:00.999999 -ish, negative
        -1,                    # 1969-12-31 23:59:59.999999
        1,                     # 1970-01-01 00:00:00.000001
        3_600_000_000,         # 1970-01-01 01:00:00
    ], dtype=np.int64)
    tbl = pa.table({
        "ts": pa.array(micros, pa.int64()).cast(pa.timestamp("us")),
        "event_type": pa.array(["a"] * len(micros), pa.string()),
        "value": pa.array([1.0] * len(micros), pa.float64()),
    })
    rows = events_hopping_window(
        ray.data.from_arrow(tbl), size_s=3600, slide_s=900).take_all()

    from collections import defaultdict
    exp = defaultdict(int)
    for m in micros.tolist():
        base = ((m // 1_000_000) // 900) * 900  # python // = floor
        for i in range(4):
            exp[base - i * 900] += 1
    got = {}
    for r in rows:
        w = int(_dt.datetime.strptime(
            r["window_start"], "%Y-%m-%d %H:%M:%S"
        ).replace(tzinfo=_dt.timezone.utc).timestamp())
        got[w] = r["n_events"]
    assert got == dict(exp)


def test_tfidf_topk_both_dispatch_paths(ray_session):
    from moaray.ops.text import tfidf_topk

    ds = ray.data.read_parquet(f"{SF}/documents.parquet",
                               columns=["doc_id", "text"])
    bc = tfidf_topk(ds).sort(["doc_id", "rn"]).take_all()
    ds2 = ray.data.read_parquet(f"{SF}/documents.parquet",
                                columns=["doc_id", "text"])
    jn = tfidf_topk(ds2, broadcast_limit=0).sort(
        ["doc_id", "rn"]).take_all()
    assert bc == jn
    assert len(bc) == 3 * 500
    # every doc's ranks are 1..3 with non-increasing scores
    per = {}
    for r in bc:
        per.setdefault(r["doc_id"], []).append((r["rn"], r["score"]))
    for rows in per.values():
        assert [rn for rn, _ in rows] == [1, 2, 3]
        s = [sc for _, sc in rows]
        assert s == sorted(s, reverse=True)


def test_cap_per_key(ray_session):
    import hashlib

    import pyarrow.parquet as pq

    from moaray.ops.text import cap_per_key

    ds = ray.data.read_parquet(f"{SF}/documents.parquet",
                               columns=["source", "doc_id"]).repartition(7)
    rows = cap_per_key(ds, n=10).take_all()
    t = pq.read_table(f"{SF}/documents.parquet",
                      columns=["source", "doc_id"])
    exp = {}
    for s, d in zip(t["source"].to_pylist(), t["doc_id"].to_pylist()):
        exp.setdefault(s, []).append(
            (hashlib.md5(str(d).encode()).hexdigest(), d)
        )
    want = []
    for s in sorted(exp):
        for rk, (_, d) in enumerate(sorted(exp[s])[:10], 1):
            want.append((s, d, rk))
    got = sorted((r["source"], r["doc_id"], r["rk"]) for r in rows)
    assert got == sorted(want)
    # determinism under different sharding
    rows2 = cap_per_key(
        ray.data.read_parquet(f"{SF}/documents.parquet",
                              columns=["source", "doc_id"]).repartition(2),
        n=10,
    ).take_all()
    assert sorted((r["source"], r["doc_id"], r["rk"]) for r in rows2) == got


def test_audio_spectral_features(ray_session):
    import pyarrow as _pa

    from moaray.ops.multimodal import AudioSpectral, wav_encode

    sr = 8000
    t = np.arange(sr) / sr
    tone = (np.sin(2 * np.pi * 500.0 * t) * 20000).astype(np.int16)
    rng = np.random.default_rng(1)
    noise = (rng.normal(0, 6000, sr)).astype(np.int16)
    tbl = _pa.table({
        "clip_id": _pa.array(["tone", "noise"], _pa.string()),
        "bytes": _pa.array([wav_encode(tone, sr), wav_encode(noise, sr)],
                           _pa.binary()),
        "sample_rate": _pa.array([sr, sr], _pa.int32()),
        "fmt": _pa.array(["wav", "wav"], _pa.string()),
    })
    out = AudioSpectral()(tbl)
    rows = {r["clip_id"]: r for r in out.to_pylist()}
    # a pure 500 Hz tone: dominant bin and centroid at ~500 Hz, low flatness
    assert abs(rows["tone"]["dominant_hz"] - 500.0) < sr / 1024 + 1
    assert abs(rows["tone"]["centroid_hz"] - 500.0) < 25
    assert rows["tone"]["flatness"] < 0.01
    # white noise: high flatness, centroid near mid-band
    assert rows["noise"]["flatness"] > 0.3
    assert 1500 < rows["noise"]["centroid_hz"] < 2500
    assert rows["noise"]["rolloff_hz"] > rows["tone"]["rolloff_hz"]


def test_bpe_train_and_tokenize(ray_session):
    from moaray.ops.text import _bpe_apply, bpe_tokenize, train_bpe

    ds = ray.data.read_parquet(f"{SF}/documents.parquet",
                               columns=["doc_id", "text"])
    merges = train_bpe(ds, vocab_size=300, hex_lt="80")
    assert 0 < len(merges) <= 44
    # determinism under re-sharding
    ds2 = ray.data.read_parquet(f"{SF}/documents.parquet",
                                columns=["doc_id", "text"]).repartition(5)
    assert train_bpe(ds2, vocab_size=300, hex_lt="80") == merges
    # reconstruction: applying merges never loses bytes
    ranks = {tuple(m): i for i, m in enumerate(merges)}
    for w in ("merge", "window", "spark", "zzzqqq"):
        toks = _bpe_apply(w.encode(), ranks)
        assert b"".join(toks) == w.encode()
    # trained vocabulary compresses the corpus it was trained on
    out = bpe_tokenize(ds, merges, concurrency=(1, 2)).take_all()
    assert len(out) == 500
    import pyarrow.parquet as pq

    t = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    byte_len = {d: sum(len(w.encode()) for w in s.split())
                for d, s in zip(t["doc_id"].to_pylist(),
                                t["text"].to_pylist())}
    word_len = {d: len(s.split())
                for d, s in zip(t["doc_id"].to_pylist(),
                                t["text"].to_pylist())}
    for r in out:
        assert word_len[r["doc_id"]] <= r["n_bpe_tokens"] <= byte_len[
            r["doc_id"]]
    # merged tokens really fire: strictly below raw byte count overall
    assert (sum(r["n_bpe_tokens"] for r in out)
            < sum(byte_len.values()))


def test_pca_sample_fit_and_project(ray_session):
    import pyarrow.parquet as pq

    from moaray.ops.ann import pca_embed, pca_fit_sample, pca_project

    def mk():
        return ray.data.read_parquet(f"{SF}/embeddings.parquet",
                                     columns=["vec_id", "embedding"])

    # full-corpus "sample" (hex_lt ff keeps everything) == direct numpy PCA
    mean, comps = pca_fit_sample(mk(), k=4, hex_lt="zz")
    t = pq.read_table(f"{SF}/embeddings.parquet",
                      columns=["vec_id", "embedding"])
    order = np.argsort(t["vec_id"].to_numpy())
    mat = np.stack(t["embedding"].to_pylist()).astype(np.float64)[order]
    assert np.allclose(mean, mat.mean(axis=0))
    # orthonormal components
    assert np.allclose(comps @ comps.T, np.eye(4), atol=1e-10)
    xc = mat - mat.mean(axis=0)
    cov = (xc.T @ xc) / (len(mat) - 1)
    ev, evec = np.linalg.eigh(cov)
    top = evec[:, np.argsort(ev)[::-1][:4]].T
    for i in range(4):
        j = int(np.argmax(np.abs(top[i])))
        if top[i, j] < 0:
            top[i] = -top[i]
    assert np.allclose(comps, top, atol=1e-9)
    # projected variance is in decreasing order and matches eigenvalues
    out = pca_embed(mk, k=4, hex_lt="zz").take_all()
    P = np.array([r["proj"] for r in sorted(out, key=lambda r: r["vec_id"])])
    var = P.var(axis=0, ddof=1)
    assert (np.diff(var) <= 1e-9).all()
    assert np.allclose(var, np.sort(ev)[::-1][:4], rtol=1e-3)


def test_image_exif_census(ray_session):
    import pyarrow as _pa

    from moaray import codecs, exif
    from moaray.jpeg import jpeg_decode, jpeg_encode
    from moaray.ops.multimodal import image_exif_census

    arr = np.tile(np.arange(32, dtype=np.uint8), (32, 1))
    jb = jpeg_encode(arr, quality=90)
    fields = {"make": "MoaCam", "model": "MX-1", "orientation": 6,
              "datetime": "2024:01:02 03:04:05",
              "datetime_original": "2024:01:02 03:04:00",
              "exposure_s": (1, 125), "f_number": (28, 10), "iso": 200,
              "focal_mm": (35, 1), "pixel_x": 32, "pixel_y": 32}
    rows = []
    for endian, iid in (("<", "le"), (">", "be")):
        jb2 = exif.splice_app1(jb, exif.build_exif_app1(fields, endian))
        # APP1 must be transparent to the pixel decoder
        assert np.array_equal(jpeg_decode(jb2), jpeg_decode(jb))
        rows.append({"image_id": iid, "bytes": jb2, "fmt": "jpeg"})
    rows.append({"image_id": "noexif", "bytes": jb, "fmt": "jpeg"})
    rows.append({"image_id": "png",
                 "bytes": codecs.png_encode(arr), "fmt": "png"})
    ds = ray.data.from_items(rows)
    out = {r["image_id"]: r
           for r in image_exif_census(ds, concurrency=(1, 2)).take_all()}
    for iid in ("le", "be"):
        r = out[iid]
        assert r["has_exif"] and r["make"] == "MoaCam"
        assert r["model"] == "MX-1" and r["orientation"] == 6
        assert r["datetime_original"] == "2024:01:02 03:04:00"
        assert abs(r["exposure_s"] - 0.008) < 1e-12
        assert abs(r["f_number"] - 2.8) < 1e-12
        assert r["iso"] == 200 and r["focal_mm"] == 35.0
    assert out["noexif"]["has_exif"] is False
    assert out["png"]["has_exif"] is False
    assert out["noexif"]["make"] is None


def test_image_augment_geometry_and_intensity(ray_session):
    from moaray import codecs
    from moaray.ops.multimodal import image_augment

    rng = np.random.default_rng(8)
    arr = rng.integers(10, 240, (24, 32), dtype=np.uint16)
    rows = [{"image_id": "a", "bytes": codecs.encode(arr, "png"),
             "fmt": "png", "w": 32, "h": 24}]
    ds = ray.data.from_items(rows)

    def run(ops):
        out = image_augment(ds, ops, concurrency=(1, 1)).take_all()[0]
        return codecs.decode(out["bytes"], out["fmt"]), out

    got, meta = run([("hflip",)])
    assert np.array_equal(got, arr[:, ::-1])
    got, _ = run([("vflip",), ("rot90", 1)])
    assert np.array_equal(got, np.rot90(arr[::-1], 1))
    got, meta = run([("crop", 2, 3, 10, 20)])
    assert np.array_equal(got, arr[2:12, 3:23])
    assert meta["h"] == 10 and meta["w"] == 20
    # involution: double hflip is identity (lossless codec)
    got, _ = run([("hflip",), ("hflip",)])
    assert np.array_equal(got, arr)
    # brightness shifts the mean by ~delta (no clipping in range)
    got, _ = run([("brightness", 500.0)])
    assert np.array_equal(got, arr + 500)
    # contrast 1.0 and gamma 1.0 are identities
    got, _ = run([("contrast", 1.0), ("gamma", 1.0)])
    assert np.array_equal(got, arr)
    # clipping respects dtype bounds
    got, _ = run([("brightness", 1e6)])
    assert (got == np.iinfo(np.uint16).max).all()


def test_bloom_build_probe(ray_session):
    from moaray.ops.sketch import bloom_build, bloom_probe

    ds = ray.data.read_parquet(f"{SF}/documents.parquet",
                               columns=["doc_id", "text"]).repartition(6)
    bits, k = bloom_build(ds, "text", m_bits=1 << 17, k=5)
    # no false negatives: every inserted text hits
    hits = bloom_probe(
        ray.data.read_parquet(f"{SF}/documents.parquet",
                              columns=["doc_id", "text"]),
        "text", bits, k, keep="hits",
    ).count()
    assert hits == 500
    # false positives on a disjoint probe set stay near theory
    import pyarrow as _pa

    probe_rows = [{"doc_id": i, "text": f"definitely-not-present-{i}"}
                  for i in range(20000)]
    fp = bloom_probe(ray.data.from_items(probe_rows), "text", bits, k,
                     keep="hits").count()
    n_distinct = 500  # <= inserted values
    m, kk = float(1 << 17), 5
    theory = (1 - np.exp(-kk * n_distinct / m)) ** kk
    assert fp / 20000 <= max(theory * 50, 1e-3)
    # 'misses' is the exact complement
    miss = bloom_probe(ray.data.from_items(probe_rows), "text", bits, k,
                       keep="misses").count()
    assert fp + miss == 20000
    # int64 columns work too
    bits2, k2 = bloom_build(ds, "doc_id", m_bits=1 << 16, k=4)
    assert bloom_probe(
        ray.data.read_parquet(f"{SF}/documents.parquet",
                              columns=["doc_id"]),
        "doc_id", bits2, k2, keep="hits",
    ).count() == 500


def test_dataset_profile(ray_session):
    import pyarrow.parquet as pq

    from moaray.ops.sketch import dataset_profile

    ds = ray.data.read_parquet(f"{SF}/events.parquet").repartition(5)
    rows = {r["column"]: r for r in dataset_profile(ds).take_all()}
    t = pq.read_table(f"{SF}/events.parquet")
    assert set(rows) == set(t.schema.names)
    ev = rows["value"]
    v = t["value"].to_numpy()
    assert ev["n_rows"] == len(t) and ev["n_null"] == 0
    assert ev["min"] == float(v.min()) and ev["max"] == float(v.max())
    assert abs(ev["mean"] - v.mean()) < 1e-4
    # HLL distinct within 5% on user_id
    uid = rows["user_id"]
    true_d = len(np.unique(t["user_id"].to_numpy()))
    assert abs(uid["distinct_est"] - true_d) <= max(3, 0.05 * true_d)
    # string column: length stats + distinct
    et = rows["event_type"]
    lens = np.array([len(s) for s in t["event_type"].to_pylist()])
    assert et["min"] == lens.min() and et["max"] == lens.max()
    true_types = len(set(t["event_type"].to_pylist()))
    assert abs(et["distinct_est"] - true_types) <= 1


def test_dataset_profile_float_distinct_and_nan(ray_session):
    """Floats must hash by bit pattern: a column uniform in [0,100) has
    thousands of distinct values that all share ~100 integer parts
    (round-4 advice: int-truncation hashing capped distinct_est ~200).
    NaN rows count as data (not null) but are dropped from stats/HLL."""
    import pyarrow as pa

    from moaray.ops.sketch import dataset_profile

    rng = np.random.default_rng(11)
    vals = rng.uniform(0, 100, size=5000)
    vals[::10] = np.nan  # 500 NaNs
    ds = ray.data.from_arrow(pa.table({"x": pa.array(vals, pa.float64())}))
    row = {r["column"]: r for r in
           dataset_profile(ds.repartition(4)).take_all()}["x"]
    finite = vals[~np.isnan(vals)]
    true_d = len(np.unique(finite))
    assert abs(row["distinct_est"] - true_d) <= 0.06 * true_d
    assert row["min"] == float(finite.min())
    assert row["max"] == float(finite.max())
    assert abs(row["mean"] - finite.mean()) < 1e-4


def test_compute_phash_dihedral_invariance(ray_session):
    from moaray import codecs
    from moaray.ops.multimodal import ComputePhash
    import pyarrow as _pa

    rng = np.random.default_rng(9)
    base = rng.integers(0, 255, (64, 64), dtype=np.uint16)
    # an asymmetric image (so plain phash differs across orientations)
    base[:16, :40] = 10
    variants = {
        "orig": base,
        "hflip": base[:, ::-1],
        "vflip": base[::-1],
        "rot90": np.rot90(base, 1),
        "rot270_flip": np.rot90(base, 3)[:, ::-1],
    }
    tbl = _pa.table({
        "image_id": _pa.array(list(variants), _pa.string()),
        "bytes": _pa.array([codecs.encode(np.ascontiguousarray(v), "z16")
                            for v in variants.values()], _pa.binary()),
        "fmt": _pa.array(["z16"] * len(variants), _pa.string()),
    })
    plain = ComputePhash()(tbl)
    dih = ComputePhash(dihedral=True)(tbl)
    plain_h = plain["phash"].to_pylist()
    dih_h = dih["phash"].to_pylist()
    # dihedral: all orientations collide on one fingerprint
    assert len(set(dih_h)) == 1
    # plain phash misses at least one orientation pair
    assert len(set(plain_h)) > 1
    # a genuinely different image still separates under dihedral
    other = rng.integers(0, 255, (64, 64), dtype=np.uint16)
    t2 = _pa.table({
        "image_id": _pa.array(["other"], _pa.string()),
        "bytes": _pa.array([codecs.encode(other, "z16")], _pa.binary()),
        "fmt": _pa.array(["z16"], _pa.string()),
    })
    oh = ComputePhash(dihedral=True)(t2)["phash"].to_pylist()[0]
    assert oh != dih_h[0]


def test_image_augment_color_and_crop_bounds(ray_session):
    from moaray import codecs
    from moaray.ops.multimodal import image_augment

    rng = np.random.default_rng(10)
    rgb = rng.integers(0, 255, (20, 28, 3), dtype=np.uint8)
    rows = [{"image_id": "c", "bytes": codecs.png_encode(rgb),
             "fmt": "png", "w": 28, "h": 20}]
    ds = ray.data.from_items(rows)
    out = image_augment(ds, [("hflip",), ("crop", 2, 2, 10, 12)],
                        concurrency=(1, 1)).take_all()[0]
    got = codecs.decode(out["bytes"], out["fmt"])
    assert np.array_equal(got, rgb[:, ::-1][2:12, 2:14])
    assert out["h"] == 10 and out["w"] == 12
    # out-of-bounds crop is a clear contract error, not a silent empty
    import pytest as _pytest

    with _pytest.raises(Exception, match="outside image"):
        image_augment(ds, [("crop", 0, 0, 64, 64)],
                      concurrency=(1, 1)).take_all()


def test_events_cumulative_and_gaps_vs_numpy(ray_session):
    import pyarrow.parquet as pq

    from moaray.ops.relational import events_cumulative, events_gap_stats

    ds = ray.data.read_parquet(f"{SF}/events.parquet",
                               columns=["event_id", "ts", "user_id",
                                        "value"])
    got = {r["event_id"]: (r["user_id"], r["cum_value"])
           for r in events_cumulative(ds).take_all()}

    t = pq.read_table(f"{SF}/events.parquet",
                      columns=["event_id", "ts", "user_id", "value"])
    eid = t["event_id"].to_numpy()
    ts = t["ts"].cast(pa.int64()).to_numpy()
    uid = t["user_id"].to_numpy()
    cents = np.rint(t["value"].to_numpy() * 100.0).astype(np.int64)
    want = {}
    for u in np.unique(uid):
        m = uid == u
        order = np.lexsort((eid[m], ts[m]))
        cum = np.cumsum(cents[m][order])
        for e, c in zip(eid[m][order], cum):
            want[int(e)] = (int(u), c / 100.0)
    assert got == want

    gaps = {r["user_id"]: (r["n_events"], r["sum_gap_us"], r["max_gap_us"])
            for r in events_gap_stats(ds).take_all()}
    for u in np.unique(uid):
        m = uid == u
        tt = np.sort(ts[m])
        d = np.diff(tt)
        assert gaps[int(u)] == (
            int(m.sum()),
            int(d.sum()) if len(d) else 0,
            int(d.max()) if len(d) else 0,
        )


def test_stratified_sample_stable_under_resharding(ray_session):
    from moaray.ops.text import stratified_sample

    ds = ray.data.read_parquet(f"{SF}/documents.parquet",
                               columns=["doc_id", "source"])
    a = sorted(r["doc_id"] for r in stratified_sample(ds).take_all())
    b = sorted(r["doc_id"] for r in
               stratified_sample(ds.repartition(13)).take_all())
    assert a == b and 0 < len(a) < 500
    # ~25% of ids survive the '4' cutoff (hash-uniform)
    assert 60 < len(a) < 190


def test_lm_perplexity_matches_reference_and_ranks(ray_session):
    """Bits-per-token under the sample-fit bigram LM: (a) equals a direct
    pure-Python reference implementation, (b) corpus-like text scores
    better than shuffled-token gibberish (the CCNet filtering property)."""
    import math

    import pyarrow.parquet as pq

    from moaray.ops.text import lm_perplexity, lm_train_bigram

    ds = ray.data.read_parquet(f"{SF}/documents.parquet",
                               columns=["doc_id", "text"])
    model = lm_train_bigram(ds, hex_lt="ff")
    got = {r["doc_id"]: (r["n_tokens"], r["bits_per_token"])
           for r in lm_perplexity(ds, model).take_all()}

    t = pq.read_table(f"{SF}/documents.parquet",
                      columns=["doc_id", "text"])
    vocab, uni, bi = model["vocab"], model["uni"], model["bi"]
    v = len(vocab) + 1
    k = 0.5
    for did, text in zip(t["doc_id"].to_pylist(),
                         t["text"].to_pylist()):
        toks = text.split()
        n, bpt = got[did]
        assert n == len(toks)
        if len(toks) < 2:
            assert bpt == 0.0
            continue
        s = 0.0
        for a, b in zip(toks, toks[1:]):
            ca = uni[vocab[a]] if a in vocab else 0
            cab = bi.get((vocab.get(a, -1), vocab.get(b, -1)), 0)
            s += math.log((cab + k) / (ca + k * v))
        want = -s / (len(toks) - 1) / math.log(2.0)
        assert abs(bpt - round(want, 6)) < 1e-6, did

    # ranking property: in-distribution word ORDER beats token-shuffled
    # gibberish. The sf tables' synthetic text has weak order, so build a
    # corpus with real bigram structure to demonstrate the CCNet filter.
    rng = np.random.default_rng(5)
    sents = [
        "the cat sat on the mat and the dog sat on the rug",
        "the dog ran to the park and the cat ran to the house",
        "a bird flew over the house and a cat slept on the mat",
        "the cat slept on the rug while the dog ran to the park",
    ]
    texts = [" ".join(rng.choice(sents, 8)) for _ in range(16)]
    corpus = pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
    })
    m2 = lm_train_bigram(ray.data.from_arrow(corpus), hex_lt="ff")
    shuf = []
    for x in texts:
        w = x.split()
        rng.shuffle(w)
        shuf.append(" ".join(w))
    gib = pa.table({
        "doc_id": pa.array(range(len(shuf)), pa.int64()),
        "text": pa.array(shuf, pa.string()),
    })
    nat_bpt = np.mean([r["bits_per_token"] for r in lm_perplexity(
        ray.data.from_arrow(corpus), m2).take_all()])
    gib_bpt = np.mean([r["bits_per_token"] for r in lm_perplexity(
        ray.data.from_arrow(gib), m2).take_all()])
    assert gib_bpt > nat_bpt + 0.5, (nat_bpt, gib_bpt)


def test_ngram_census_and_substring_trim(ray_session):
    """ExactSubstr primitives vs a pure-Python reference: census counts
    every duplicated n-gram exactly; trim drops exactly the covered
    tokens and passes non-text columns through."""
    from collections import Counter

    import pyarrow.parquet as pq

    from moaray.ops.dedup import ngram_census, trim_duplicate_ngrams

    N = 4
    ds = ray.data.read_parquet(f"{SF}/documents.parquet",
                               columns=["doc_id", "source", "text"])
    got = {r["ngram"]: (r["n_occurrences"], r["n_docs"])
           for r in ngram_census(ds, n=N).take_all()}

    t = pq.read_table(f"{SF}/documents.parquet",
                      columns=["doc_id", "text"])
    occ: Counter = Counter()
    ndocs: Counter = Counter()
    for text in t["text"].to_pylist():
        toks = text.split()
        seen = set()
        for i in range(len(toks) - N + 1):
            g = " ".join(toks[i:i + N])
            occ[g] += 1
            seen.add(g)
        ndocs.update(seen)
    want = {g: (c, ndocs[g]) for g, c in occ.items() if c >= 2}
    assert got == want and len(want) > 100

    dup = set(want)
    trimmed = {r["doc_id"]: (r["text"], r["n_removed"], r["source"])
               for r in trim_duplicate_ngrams(ds, dup, n=N).take_all()}
    srcs = dict(zip(
        pq.read_table(f"{SF}/documents.parquet",
                      columns=["doc_id", "source"])["doc_id"].to_pylist(),
        pq.read_table(f"{SF}/documents.parquet",
                      columns=["doc_id", "source"])["source"].to_pylist(),
    ))
    n_trimmed = 0
    for did, text in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
        toks = text.split()
        cov = np.zeros(len(toks), dtype=bool)
        for i in range(len(toks) - N + 1):
            if " ".join(toks[i:i + N]) in dup:
                cov[i:i + N] = True
        keep = " ".join(tt for tt, c in zip(toks, cov) if not c)
        assert trimmed[did] == (keep, int(cov.sum()), srcs[did]), did
        n_trimmed += bool(cov.any())
    assert n_trimmed > 10  # the fixture really exercises the trim


def test_mix_sample_rates_and_determinism(ray_session):
    import hashlib

    import pyarrow.parquet as pq

    from moaray.ops.text import mix_sample

    ds = ray.data.read_parquet(f"{SF}/documents.parquet",
                               columns=["doc_id", "source"])
    rates = {"src0": 1.0, "src1": 0.5, "src2": 0.25}
    got = sorted(r["doc_id"] for r in
                 mix_sample(ds, rates, default_rate=1 / 16).take_all())
    got2 = sorted(r["doc_id"] for r in mix_sample(
        ds.repartition(7), rates, default_rate=1 / 16).take_all())
    assert got == got2  # stable under re-sharding

    t = pq.read_table(f"{SF}/documents.parquet",
                      columns=["doc_id", "source"])
    cuts = {"src0": "f", "src1": "7", "src2": "3"}
    want = sorted(
        did for did, s in zip(t["doc_id"].to_pylist(),
                              t["source"].to_pylist())
        if hashlib.md5(str(did).encode()).hexdigest()[0]
        <= cuts.get(s, "0")
    )
    assert got == want
    # src0 kept whole, everything kept at all
    srcs = dict(zip(t["doc_id"].to_pylist(), t["source"].to_pylist()))
    n_src0 = sum(1 for d in got if srcs[d] == "src0")
    assert n_src0 == sum(1 for s in srcs.values() if s == "src0")


def test_lr_fit_matches_local_gd_and_separates(ray_session):
    """Distributed full-batch GD == a local numpy implementation run with
    the same schedule (partial sums are the same math), and the fitted
    model separates a known linear rule."""
    from moaray.ops.train import lr_fit, lr_predict

    rng = np.random.default_rng(11)
    n = 4000
    x1 = rng.normal(size=n)
    x2 = rng.normal(size=n)
    y = (0.8 * x1 - 1.3 * x2 + 0.2 > 0).astype(np.float64)
    t = pa.table({
        "doc_id": pa.array(range(n), pa.int64()),
        "f1": pa.array(x1, pa.float64()),
        "f2": pa.array(x2, pa.float64()),
        "label": pa.array(y, pa.float64()),
    })
    ds = ray.data.from_arrow(t).repartition(8)
    model = lr_fit(ds, ["f1", "f2"], "label", lr=1.0, n_iters=40)

    # local reference with the identical schedule
    X = np.column_stack([np.ones(n), x1, x2])
    w = np.zeros(3)
    for _ in range(40):
        p = 1.0 / (1.0 + np.exp(-(X @ w)))
        w = w - 1.0 * (X.T @ (p - y)) / n
    assert np.allclose(model["w"], w, rtol=1e-6, atol=1e-9), (
        model["w"], w)

    scores = {r["doc_id"]: r["score"]
              for r in lr_predict(ds, model, ["f1", "f2"]).take_all()}
    pred = np.array([scores[i] > 0.5 for i in range(n)])
    assert (pred == y.astype(bool)).mean() > 0.95
    # direction matches the generating rule (up to scale)
    g = np.array([0.8, -1.3])
    west = np.array(model["w"][1:])
    cos = g @ west / (np.linalg.norm(g) * np.linalg.norm(west))
    assert cos > 0.99


def test_image_patches_grid_clamp_and_pixels(ray_session):
    """Patch grid semantics (drop vs clamp), row-major ids, and exact
    pixel equality vs numpy slicing, through a real PNG encode/decode."""
    from moaray import codecs
    from moaray.ops.multimodal import image_patches

    rng = np.random.default_rng(3)
    imgs = []
    arrs = {}
    for n, (h, w) in enumerate([(70, 90), (64, 64), (31, 40)]):
        arr = rng.integers(0, 60000, size=(h, w), dtype=np.uint16)
        arrs[f"img{n}"] = arr
        imgs.append({"image_id": f"img{n}",
                     "bytes": codecs.encode(arr, "png"), "fmt": "png",
                     "h": h, "w": w})
    ds = ray.data.from_items(imgs)

    for pad in ("drop", "clamp"):
        got = image_patches(ds, 32, 32, stride=32, pad=pad,
                            concurrency=(1, 2)).take_all()
        by_img = {}
        for r in got:
            by_img.setdefault(r["image_id"], []).append(r)
        for img_id, arr in arrs.items():
            hh, ww = arr.shape
            ys = list(range(0, hh - 31, 32))
            xs = list(range(0, ww - 31, 32))
            if pad == "clamp":
                if ys and ys[-1] != hh - 32:
                    ys.append(hh - 32)
                if xs and xs[-1] != ww - 32:
                    xs.append(ww - 32)
            if hh < 32 or ww < 32:
                assert img_id not in by_img  # too small -> no patches
                continue
            ps = sorted(by_img[img_id], key=lambda r: r["patch_id"])
            assert [(r["py"], r["px"]) for r in ps] == [
                (y, x) for y in ys for x in xs]
            assert [r["patch_id"] for r in ps] == list(range(len(ps)))
            for r in ps:
                dec = codecs.decode(r["bytes"], r["fmt"])
                np.testing.assert_array_equal(
                    dec, arrs[img_id][r["py"]:r["py"] + 32,
                                      r["px"]:r["px"] + 32])

    # composes with the WDS shard sink: unique key, full round-trip count
    from moaray.sinks.wds import read_wds_shards, write_wds_shards
    import pyarrow.compute as pc_
    import shutil
    patches = image_patches(ds, 32, 32, stride=32, pad="clamp",
                            concurrency=(1, 2)).map_batches(
        lambda b: b.append_column(
            "sample_id",
            pc_.binary_join_element_wise(
                b["image_id"], pc_.cast(b["patch_id"], pa.string()), "/")
        ),
        batch_format="pyarrow",
    )
    shutil.rmtree("/tmp/wds_patches", ignore_errors=True)
    m = write_wds_shards(patches, "/tmp/wds_patches", key="sample_id",
                         n_shards=4)
    assert m["rows"] == read_wds_shards(
        "/tmp/wds_patches", key="sample_id").count() > 0


def test_knn_classify_majority_and_tiebreak(ray_session):
    """Constructed geometry: queries sit exactly on cluster axes; ties in
    the vote break to the smallest label."""
    from moaray.ops.ann import knn_classify

    # 3 corpus points near +x (label 1), 3 near +y (label 2), in 2-D
    pts = [
        (100, [1.0, 0.00], 1), (101, [1.0, 0.01], 1), (102, [1.0, -0.01], 1),
        (103, [0.00, 1.0], 2), (104, [0.01, 1.0], 2), (105, [-0.01, 1.0], 2),
    ]
    t = pa.table({
        "vec_id": pa.array([p[0] for p in pts], pa.int64()),
        "embedding": pa.array([p[1] for p in pts],
                              pa.list_(pa.float32())),
        "label": pa.array([p[2] for p in pts], pa.int32()),
    })
    ds = ray.data.from_arrow(t)
    qids = np.array([0, 1], dtype=np.int64)
    qmat = np.array([[1.0, 0.0], [0.0, 1.0]])
    got = {r["query_id"]: (r["pred_label"], r["votes"])
           for r in knn_classify(ds, qids, qmat, k=3).take_all()}
    assert got == {0: (1, 3), 1: (2, 3)}

    # k=6 -> 3 votes each; tie breaks to the smaller label (1)
    got6 = {r["query_id"]: (r["pred_label"], r["votes"])
            for r in knn_classify(ds, qids, qmat, k=6).take_all()}
    assert got6 == {0: (1, 3), 1: (1, 3)}


def test_ntile_by_uneven_buckets_and_ties(ray_session):
    """NTILE semantics on non-divisible totals (larger buckets first) and
    duplicate order values (tie-break by id), vs DuckDB directly."""
    import duckdb

    from moaray.ops.relational import ntile_by

    rng = np.random.default_rng(7)
    n = 103  # 103 % 4 = 3 -> bucket sizes 26,26,26,25
    vals = rng.integers(0, 9, size=n)  # heavy ties
    t = pa.table({
        "doc_id": pa.array(range(n), pa.int64()),
        "n_chars": pa.array(vals, pa.int64()),
    })
    for nb in (4, 5, 7):
        got = {r["doc_id"]: r["bucket"] for r in ntile_by(
            ray.data.from_arrow(t), "n_chars", "doc_id", nb).take_all()}
        con = duckdb.connect()
        con.register("t", t)
        want = dict(con.execute(
            f"SELECT doc_id, ntile({nb}) OVER (ORDER BY n_chars, doc_id)"
            " FROM t"
        ).fetchall())
        assert got == want, nb


def test_ann_index_persistence(ray_session, tmp_path):
    """Fit once, save, load, search with the persisted quantizer: results
    identical to the inline fit (the sample-fit is deterministic)."""
    from moaray.ops.ann import (kmeans_fit_sample, knn_ivf, load_ann_index,
                                load_queries, save_ann_index)

    emb = ray.data.read_parquet(f"{SF}/embeddings.parquet")
    qids, qmat = load_queries(emb, n_queries=8)
    cent = kmeans_fit_sample(emb, 16)
    path = str(tmp_path / "idx" / "ivf.npz")
    save_ann_index(path, {"centroids": cent})
    idx = load_ann_index(path)
    np.testing.assert_array_equal(idx["centroids"], cent)

    a = sorted(
        (r["query_id"], r["neighbor_id"], r["rank"])
        for r in knn_ivf(emb, qids, qmat, k=5,
                         centroids=idx["centroids"]).take_all()
    )
    b = sorted(
        (r["query_id"], r["neighbor_id"], r["rank"])
        for r in knn_ivf(emb, qids, qmat, k=5).take_all()
    )
    assert a == b and len(a) > 0


def test_lm_perplexity_adversarial_shapes(ray_session):
    """Vectorized scoring survives empty docs, 1-token docs, unk-only
    docs, and batch boundaries (reduceat segment bookkeeping)."""
    import math

    from moaray.ops.text import lm_perplexity, lm_train_bigram

    texts = ["", "solo", "a b", "zz qq", "the cat sat on the mat " * 5,
             " ", "x", "a a a a a", "b", ""]
    t = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                  "text": pa.array(texts, pa.string())})
    ds = ray.data.from_arrow(t).repartition(4)
    model = lm_train_bigram(ds, hex_lt="ff")
    got = {r["doc_id"]: (r["n_tokens"], r["bits_per_token"])
           for r in lm_perplexity(ds, model,
                                  concurrency=(1, 2)).take_all()}
    vocab, uni, bi = model["vocab"], model["uni"], model["bi"]
    v = len(vocab) + 1
    k = 0.5
    for did, text in enumerate(texts):
        toks = text.split()
        n, bpt = got[did]
        assert n == len(toks)
        if len(toks) < 2:
            assert bpt == 0.0
            continue
        s = sum(
            math.log((bi.get((vocab.get(a, -1), vocab.get(b, -1)), 0)
                      + k)
                     / ((uni[vocab[a]] if a in vocab else 0) + k * v))
            for a, b in zip(toks, toks[1:])
        )
        want = -s / (len(toks) - 1) / math.log(2.0)
        assert abs(bpt - round(want, 6)) < 1e-6, did


def test_knn_hard_negatives_label_mask(ray_session):
    """Constructed geometry: the nearest SAME-label points must be
    skipped — each query's negatives are the closest points of the
    OTHER label, even when same-label points are strictly closer."""
    from moaray.ops.ann import knn_hard_negatives

    pts = [
        # label-1 cluster hugging +x, label-2 cluster rotated toward +x
        (100, [1.0, 0.00], 1), (101, [1.0, 0.01], 1),
        (102, [0.9, 0.30], 2), (103, [0.8, 0.50], 2),
        (104, [0.0, 1.00], 2),
    ]
    t = pa.table({
        "vec_id": pa.array([p[0] for p in pts], pa.int64()),
        "embedding": pa.array([p[1] for p in pts], pa.list_(pa.float32())),
        "label": pa.array([p[2] for p in pts], pa.int32()),
    })
    ds = ray.data.from_arrow(t)
    qids = np.array([0], dtype=np.int64)
    qmat = np.array([[1.0, 0.0]])
    got = [(r["neighbor_id"], r["rank"]) for r in
           knn_hard_negatives(ds, qids, qmat, np.array([1]), k=2)
           .sort("rank").take_all()]
    # 100/101 (label 1) are nearest but masked; 102 then 103 win
    assert got == [(102, 1), (103, 2)]
    # flipping the query label masks the other cluster instead
    got2 = [r["neighbor_id"] for r in
            knn_hard_negatives(ds, qids, qmat, np.array([2]), k=2)
            .sort("rank").take_all()]
    assert got2 == [100, 101]


def test_epoch_shuffle_deterministic_and_complete(ray_session):
    """Every row lands in exactly one (shard, pos) slot; positions are
    1..len(shard) dense; the mapping is a pure function of (id, epoch) —
    re-running reproduces it, changing the epoch changes it."""
    import hashlib

    from moaray.ops.text import epoch_shuffle

    ids = list(range(200))
    ds = ray.data.from_arrow(pa.table({"doc_id": pa.array(ids, pa.int64())}))
    rows = epoch_shuffle(ds, epoch=7, n_shards=4).take_all()
    assert sorted(r["doc_id"] for r in rows) == ids
    by_shard = {}
    for r in rows:
        by_shard.setdefault(r["shard"], []).append((r["pos"], r["doc_id"]))
    assert set(by_shard) <= set(range(4))
    for shard, members in by_shard.items():
        poss = sorted(p for p, _ in members)
        assert poss == list(range(1, len(members) + 1)), shard
        # within-shard order IS md5-key order (the SQL row_number contract)
        want = sorted(members,
                      key=lambda m: (hashlib.md5(f"{m[1]}:7".encode())
                                     .hexdigest(), m[1]))
        assert [d for _, d in sorted(members)] == [d for _, d in want]
    # pure function of (id, epoch)
    again = {(r["doc_id"]): (r["shard"], r["pos"])
             for r in epoch_shuffle(ds, epoch=7, n_shards=4).take_all()}
    assert again == {r["doc_id"]: (r["shard"], r["pos"]) for r in rows}
    other = {r["doc_id"]: (r["shard"], r["pos"])
             for r in epoch_shuffle(ds, epoch=8, n_shards=4).take_all()}
    assert other != again
