"""Benchmark harness: headline pipelines over $GRAFT_SF_DIR.

Default mode prints ONE JSON line:
  {"metric": ..., "value": total_sec, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ..., "num_cpus": N,
   "mosaic": {tiles_per_s, images_joined_per_s, mpx_per_s}}

--scaling runs the headline mosaic job twice in FRESH subprocesses
(num_cpus=8 then num_cpus=32) on the same input and reports throughput at
both plus scaling efficiency ((thr_4N / thr_N) / 4) — the in-sandbox
evidence for the N->4N cluster-scaling criterion (see BASELINE.md).
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))

BENCH_N_IMAGES = int(os.environ.get("MOARAY_BENCH_IMAGES", "1024"))
BENCH_IMG_SIZE = int(os.environ.get("MOARAY_BENCH_SIZE", "1024"))
BENCH_FMT = os.environ.get("MOARAY_BENCH_FMT", "z16")


def host_probe() -> dict:
    """~2 s standalone probe of the HOST's current health, recorded with
    every bench line. This sandbox shares a hypervisor: effective
    parallelism has been observed to drop from ~32 to ~13 cores for hours
    at a time (external steal/fault contention — old commits re-benched
    equally slow). The probe lets any recorded number be read against the
    host state it was measured under.

    ``parallel_efficiency``: 32 single-core burns run concurrently,
    perfect 32-core host => 1.0. ``single_thread_s``: fixed burn, lower
    is faster (≈0.4 s on this box when healthy)."""
    from concurrent.futures import ProcessPoolExecutor

    import numpy as _np

    n = 6_000_000
    t0 = time.perf_counter()
    _burn(n)
    single = time.perf_counter() - t0
    # memory bandwidth: a 200 MB copy — the mosaic is bandwidth-bound, and
    # neighbor bandwidth contention is invisible to pure-CPU burns (seen
    # live: parallel_efficiency 0.84 while single_thread_s was 1.75x slow
    # and the mosaic ran 10x slow)
    src = _np.ones(25_000_000, _np.float64)
    dst = _np.empty_like(src)
    _np.copyto(dst, src)  # warm both buffers (first-touch faults are the
    # sandbox's other failure mode; measure steady-state bandwidth)
    t0 = time.perf_counter()
    for _ in range(3):
        _np.copyto(dst, src)
    memcpy_gbps = 3 * src.nbytes * 2 / (time.perf_counter() - t0) / 1e9
    with ProcessPoolExecutor(32) as ex:
        # pre-spawn workers so spawn cost stays out of the measurement
        list(ex.map(_burn, [1000] * 32))
        t0 = time.perf_counter()
        list(ex.map(_burn, [n] * 32))
        par = time.perf_counter() - t0
    # first-touch fault service rate: every fresh Ray worker pays this on
    # its heap (Firecracker lazy paging, see CLAUDE.md) — the third
    # degradation mode, invisible to both burns above
    fresh = _np.empty(12_500_000, _np.float64)  # 100 MB, untouched
    t0 = time.perf_counter()
    fresh[::512] = 1.0  # one write per 4 KiB page
    fault_us = (time.perf_counter() - t0) / (fresh.nbytes // 4096) * 1e6
    return {
        "single_thread_s": round(single, 3),
        "parallel_efficiency": round(single / par, 3),
        "memcpy_gbps": round(memcpy_gbps, 2),
        "fault_us_per_page": round(fault_us, 1),
    }


def _burn(n: int) -> int:
    s = 0
    for i in range(n):
        s += i * i
    return s


def sf_value(sf_dir: str) -> float:
    base = os.path.basename(sf_dir.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return -1.0


def run_mosaic_bench(num_cpus: int) -> dict:
    """Full mosaic pipeline (join + decode + assemble + committed sink +
    stats) over the deterministic bench layout; returns timings/throughput."""
    import ray

    from moaray import MosaicConfig, do_mosaic
    from moaray.pipelines.mosaic import plan_assignments
    from moaray.testgen import Layout, images_path

    layout = Layout("bench", BENCH_N_IMAGES, BENCH_IMG_SIZE)
    path = images_path(layout, fmts=(BENCH_FMT,))
    cfg = MosaicConfig(
        layout=layout,
        blocksize=1024,
        do_pyramids=True,
        do_stats=True,
    )
    # count assignments first (cheap, metadata only) for images-joined/sec
    n_assign = plan_assignments(path, cfg).count()

    out_dir = "/tmp/moaray_bench_out"
    # Warmup pass: spin up the worker pool and fault in each worker's heap
    # (this sandbox's kernel serves first-touch page faults very slowly —
    # ~40us/page — so a fresh process pays ~0.5 s on its first memory-heavy
    # task). Steady-state throughput is what the scaling criterion compares.
    shutil.rmtree(out_dir, ignore_errors=True)
    do_mosaic(path, cfg, out_dir=out_dir)

    shutil.rmtree(out_dir, ignore_errors=True)
    t0 = time.monotonic()
    res = do_mosaic(path, cfg, out_dir=out_dir)
    elapsed = time.monotonic() - t0
    n_tiles = res.grid.num_tiles
    total_px = res.grid.ncols * res.grid.nrows
    shutil.rmtree(out_dir, ignore_errors=True)
    return {
        "elapsed_s": elapsed,
        "n_tiles": n_tiles,
        "n_assignments": n_assign,
        "tiles_per_s": n_tiles / elapsed,
        "images_joined_per_s": n_assign / elapsed,
        "mpx_per_s": total_px / elapsed / 1e6,
    }


SOAK_N_IMAGES = int(os.environ.get("MOARAY_SOAK_IMAGES", "4096"))
SOAK_IMG_SIZE = int(os.environ.get("MOARAY_SOAK_SIZE", "512"))


def run_soak_bench(num_cpus: int) -> dict:
    """Combined stress: multiband (2 bands) + warp-on-read (scale-2 affine
    CRS, bilinear) + salted skew merge (the 'bench' layout stacks 1/4 of the
    images on one extent, far past salt_threshold) at SOAK_N_IMAGES images.
    Exercises every hot path of the engine simultaneously."""
    import ray

    from moaray import MosaicConfig, do_mosaic
    from moaray.testgen import Layout, images_path

    layout = Layout("bench", SOAK_N_IMAGES, SOAK_IMG_SIZE)
    path = images_path(layout, fmts=("z16",), nbands=2)
    cfg = MosaicConfig(
        layout=layout,
        blocksize=1024,
        out_crs="AFFINE:0,2,0,0,0,2",
        resample="bilinear",
        salt_threshold=256,
        do_pyramids=False,
        do_stats=True,
    )
    out_dir = "/tmp/moaray_soak_out"
    shutil.rmtree(out_dir, ignore_errors=True)
    do_mosaic(path, cfg, out_dir=out_dir)  # warmup (page-fault amortization)
    shutil.rmtree(out_dir, ignore_errors=True)
    t0 = time.monotonic()
    res = do_mosaic(path, cfg, out_dir=out_dir)
    elapsed = time.monotonic() - t0
    n_tiles = res.grid.num_tiles
    total_px = res.grid.ncols * res.grid.nrows * 2  # 2 bands
    shutil.rmtree(out_dir, ignore_errors=True)
    return {
        "elapsed_s": elapsed,
        "n_tiles": n_tiles,
        "tiles_per_s": n_tiles / elapsed,
        "mpx_per_s": total_px / elapsed / 1e6,
        "n_images": SOAK_N_IMAGES,
        "bands": 2,
    }


def run_ops_bench(sf_dir: str) -> dict:
    import ray

    from moaray.io import read_parquet_clean as _rpc
    from moaray.ops import ann, dedup, relational

    timings = {}

    def timed(name, fn):
        t0 = time.monotonic()
        fn()
        timings[name] = round(time.monotonic() - t0, 3)

    docs = lambda: _rpc(f"{sf_dir}/documents.parquet")  # noqa: E731
    emb = lambda: _rpc(f"{sf_dir}/embeddings.parquet")  # noqa: E731

    timed("dedup_exact", lambda: dedup.exact_dedup(docs()).count())
    from moaray.ops import text as _text

    timed(
        "pii_redact",
        lambda: _rpc(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
        .map_batches(_text.pii_redact_batch, batch_format="pyarrow")
        .count(),
    )
    timed(
        "charset_jaccard",
        lambda: dedup.charset_jaccard_pairs(docs(), threshold=0.9).count(),
    )
    timed(
        "minhash_pairs",
        lambda: dedup.minhash_lsh_pairs(docs(), threshold=0.5).count(),
    )
    timed("simhash_pairs", lambda: dedup.simhash_pairs(docs()).count())
    timed(
        "embedding_neardup",
        lambda: dedup.embedding_neardup_pairs(emb(), threshold=0.35).count(),
    )

    def knn():
        e = emb()
        qids, qmat = ann.load_queries(e, n_queries=10)
        ann.knn_bruteforce(e, qids, qmat, k=5).count()

    timed("knn_topk", knn)
    def ivf():
        e = emb()
        qids, qmat = ann.load_queries(e, n_queries=10)
        ann.knn_ivf(e, qids, qmat, k=5).count()

    timed("knn_ivf", ivf)

    def pq():
        e = emb()
        qids, qmat = ann.load_queries(e, n_queries=10)
        ann.knn_pq(e, qids, qmat, k=5).count()

    timed("knn_pq", pq)
    timed(
        "neardup_lsh",
        lambda: dedup.embedding_neardup_lsh_pairs(emb(), threshold=0.35).count(),
    )
    timed(
        "pricing_summary",
        lambda: relational.pricing_summary(
            _rpc(f"{sf_dir}/lineitem.parquet")
        ).count(),
    )
    timed(
        "revenue_by_nation",
        lambda: relational.revenue_by_nation(
            _rpc(f"{sf_dir}/orders.parquet"),
            f"{sf_dir}/customer.parquet",
            f"{sf_dir}/nation.parquet",
        ).count(),
    )
    timed(
        "revenue_by_priority",
        lambda: relational.revenue_by_priority(
            _rpc(f"{sf_dir}/lineitem.parquet"),
            f"{sf_dir}/orders.parquet",
        ).count(),
    )
    timed(
        "sessionize",
        lambda: relational.sessionize(
            _rpc(f"{sf_dir}/events.parquet")
        ).count(),
    )
    timed(
        "events_daily",
        lambda: relational.events_daily(
            _rpc(f"{sf_dir}/events.parquet")
        ).count(),
    )
    timed(
        "hopping_window",
        lambda: relational.events_hopping_window(
            _rpc(f"{sf_dir}/events.parquet",
                 columns=["ts", "event_type", "value"])
        ).count(),
    )
    timed(
        "doc_tfidf",
        lambda: _text.tfidf_topk(
            _rpc(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
        ).count(),
    )

    def s2join():
        from moaray.ops.s2join import latlng_points, s2_rect_join

        s2_rect_join(
            latlng_points(f"{sf_dir}/embeddings.parquet"),
            half_lat=1.0, half_lng=1.5, level=5,
        ).count()

    timed("s2_join", s2join)
    timed(
        "winnow_pairs",
        lambda: dedup.winnow_pairs(
            _rpc(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
        ).count(),
    )

    from moaray.ops import graph

    timed(
        "graph_pagerank",
        lambda: graph.pagerank(graph.supplier_customer_edges(
            _rpc(f"{sf_dir}/lineitem.parquet",
                 columns=["l_orderkey", "l_suppkey"]),
            f"{sf_dir}/orders.parquet",
        ), n_iters=3).count(),
    )
    timed(
        "triangle_count",
        lambda: graph.triangle_count(graph.copurchase_edges(
            _rpc(f"{sf_dir}/lineitem.parquet",
                 columns=["l_orderkey", "l_suppkey"])
        )).count(),
    )
    return timings


def run_ann_scale(num_cpus: int, n_corpus: int = 200_000,
                  n_queries: int = 2048) -> dict:
    """IVF vs bruteforce at a corpus size where the index pays: the sf
    embeddings tiled to ``n_corpus`` vectors with a deterministic
    integer-hash perturbation (distinct ids, varied directions). Reports
    both walls + recall of IVF against the bruteforce truth."""
    import time

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray

    from moaray.ops import ann

    t = pq.read_table(f"{SF_DIR}/embeddings.parquet",
                      columns=["vec_id", "embedding"])
    base = np.stack(t["embedding"].to_pylist()).astype(np.float64)
    reps = -(-n_corpus // base.shape[0])
    big = np.tile(base, (reps, 1))[:n_corpus]
    ids = np.arange(n_corpus, dtype=np.int64)
    # deterministic per-row perturbation so tiled copies aren't identical
    h = (ids * np.int64(2654435761) % np.int64(97)).astype(np.float64)
    big = big + 0.01 * np.sin(h)[:, None] * np.cos(
        np.arange(big.shape[1], dtype=np.float64))[None, :]
    dim = big.shape[1]
    tbl = pa.table({
        "vec_id": pa.array(ids, pa.int64()),
        "embedding": pa.FixedSizeListArray.from_arrays(
            pa.array(big.astype(np.float32).ravel(), pa.float32()), dim),
    })
    corpus = ray.data.from_arrow(tbl).repartition(num_cpus * 2)
    corpus = corpus.materialize()  # bench the SEARCH, not the synthesis
    qids = ids[:n_queries]
    qmat = big[:n_queries]

    t0 = time.perf_counter()
    bf = ann.knn_bruteforce(corpus, qids, qmat, k=5).take_all()
    bf_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    ivf = ann.knn_ivf(corpus, qids, qmat, k=5,
                      n_centroids=64, nprobe=8).take_all()
    ivf_s = time.perf_counter() - t0
    truth = {}
    for r in bf:
        truth.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    hits = tot = 0
    for r in ivf:
        tot += 1
        hits += r["neighbor_id"] in truth.get(r["query_id"], set())
    return {
        "n_corpus": n_corpus,
        "n_queries": n_queries,
        "dim": dim,
        "bruteforce_s": round(bf_s, 3),
        "ivf_s": round(ivf_s, 3),
        "speedup": round(bf_s / ivf_s, 3),
        "ivf_recall": round(hits / max(tot, 1), 4),
    }


def main_ann_scale():
    import ray

    ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False,
             ignore_reinit_error=True)
    r = run_ann_scale(NUM_CPUS)
    ray.shutdown()
    out = {
        "metric": "moaray_ann_scale_speedup",
        "value": r["speedup"],
        "unit": "ratio",
        "queries": {"knn_bruteforce_200k": r["bruteforce_s"],
                    "knn_ivf_200k": r["ivf_s"]},
        "sf": sf_value(SF_DIR),
        "num_cpus": NUM_CPUS,
        "ann_scale": r,
        "host": host_probe(),
    }
    print(json.dumps(out))


def main_bench():
    import ray

    ray.init(
        address="local",
        num_cpus=NUM_CPUS,
        include_dashboard=False,
        ignore_reinit_error=True,
    )
    mosaic = run_mosaic_bench(NUM_CPUS)
    queries = {"mosaic_full": round(mosaic["elapsed_s"], 3)}
    queries.update(run_ops_bench(SF_DIR))
    total = sum(queries.values())
    out = {
        "metric": "moaray_bench_total",
        "value": round(total, 3),
        "unit": "sec",
        "queries": queries,
        "sf": sf_value(SF_DIR),
        "num_cpus": NUM_CPUS,
        "mosaic": {k: round(v, 3) for k, v in mosaic.items()},
    }
    ray.shutdown()
    out["host"] = host_probe()
    print(json.dumps(out))


def _subprocess_mosaic(num_cpus: int, fn: str = "run_mosaic_bench") -> dict:
    """Run a bench fn in a fresh process with its own Ray session."""
    code = (
        "import json, ray, bench;"
        f"ray.init(address='local', num_cpus={num_cpus}, include_dashboard=False);"
        f"r = bench.{fn}({num_cpus});"
        "ray.shutdown();"
        "print('RESULT ' + json.dumps(r))"
    )
    env = dict(os.environ)
    env["PYTHONPATH"] = os.path.dirname(os.path.abspath(__file__))
    proc = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True,
        text=True,
        timeout=1800,
        env=env,
        cwd=os.path.dirname(os.path.abspath(__file__)),
    )
    for line in proc.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError(
        f"subprocess (num_cpus={num_cpus}) failed:\n{proc.stderr[-2000:]}"
    )


def main_scaling():
    lo, hi = 8, 32
    probe_lo = host_probe()
    r_lo = _subprocess_mosaic(lo)
    probe_hi = host_probe()
    r_hi = _subprocess_mosaic(hi)
    eff = (r_hi["tiles_per_s"] / r_lo["tiles_per_s"]) / (hi / lo)
    out = {
        "metric": "moaray_scaling_efficiency",
        "value": round(eff, 3),
        "unit": "ratio",
        "queries": {
            f"mosaic_cpus{lo}": round(r_lo["elapsed_s"], 3),
            f"mosaic_cpus{hi}": round(r_hi["elapsed_s"], 3),
        },
        "sf": sf_value(SF_DIR),
        "num_cpus": hi,
        "scaling": {
            "cpus_low": lo,
            "cpus_high": hi,
            "tiles_per_s_low": round(r_lo["tiles_per_s"], 3),
            "tiles_per_s_high": round(r_hi["tiles_per_s"], 3),
            "images_joined_per_s_low": round(r_lo["images_joined_per_s"], 3),
            "images_joined_per_s_high": round(r_hi["images_joined_per_s"], 3),
            "mpx_per_s_low": round(r_lo["mpx_per_s"], 3),
            "mpx_per_s_high": round(r_hi["mpx_per_s"], 3),
            "efficiency": round(eff, 3),
        },
    }
    # per-leg host context: a 32-cpu leg on a host serving ~14 effective
    # cores measures the neighbor's load, not this engine's scaling
    # (see BASELINE.md host-degradation caveat)
    out["host_before_low"] = probe_lo
    out["host_before_high"] = probe_hi
    out["host_degraded"] = (
        probe_lo["parallel_efficiency"] < 0.8
        or probe_hi["parallel_efficiency"] < 0.8
    )
    print(json.dumps(out))


def run_cluster_mosaic(n_nodes: int, cpus_per_node: int = 4) -> dict:
    """Run the mosaic bench on a SIMULATED multi-node Ray cluster
    (ray.cluster_utils.Cluster: one raylet + object store per node, real
    inter-node object transfer through the distributed object store). The
    closest in-sandbox analog to the two-cluster-size criterion: the
    groupby shuffle genuinely moves window payloads BETWEEN nodes."""
    import ray
    from ray.cluster_utils import Cluster

    store = 8 * 1024**3  # 8 GiB per node: far above the known small-store
    # sort-crash zone (CLAUDE.md), small enough for n_nodes of them
    cluster = Cluster(
        initialize_head=True,
        head_node_args={
            "num_cpus": cpus_per_node,
            "object_store_memory": store,
            "include_dashboard": False,
        },
    )
    for _ in range(n_nodes - 1):
        cluster.add_node(num_cpus=cpus_per_node, object_store_memory=store)
    ray.init(address=cluster.address)
    try:
        alive = len([n for n in ray.nodes() if n["Alive"]])
        r = run_mosaic_bench(n_nodes * cpus_per_node)
        r["n_nodes"] = alive
        r["cpus_per_node"] = cpus_per_node
        return r
    finally:
        ray.shutdown()
        cluster.shutdown()


def _probe_is_healthy(probe: dict) -> bool:
    """The co-located 8-raylet sim is the most host-sensitive measurement
    (BASELINE.md spread 0.18-1.01 on one commit); gate each repeat on the
    probe so degraded-host samples are reported but never averaged in."""
    return (probe.get("parallel_efficiency", 0.0) >= 0.70
            and probe.get("fault_us_per_page", 1e9) <= 150.0
            and probe.get("memcpy_gbps", 0.0) >= 5.0)


def main_cluster_scaling(repeats: int = 3):
    """2-node vs 8-node simulated clusters (4 cpus each): N repeats, each
    probe-stamped; the headline value is the MEDIAN efficiency over
    healthy-probe repeats (all repeats + probes are reported)."""
    lo_nodes, hi_nodes = 2, 8
    runs = []
    for k in range(repeats):
        probe = host_probe()
        r_lo = _subprocess_fn(f"run_cluster_mosaic({lo_nodes})")
        r_hi = _subprocess_fn(f"run_cluster_mosaic({hi_nodes})")
        eff = (r_hi["tiles_per_s"] / r_lo["tiles_per_s"]) / (
            hi_nodes / lo_nodes)
        runs.append({
            "efficiency": round(eff, 3),
            "elapsed_low_s": round(r_lo["elapsed_s"], 3),
            "elapsed_high_s": round(r_hi["elapsed_s"], 3),
            "tiles_per_s_low": round(r_lo["tiles_per_s"], 3),
            "tiles_per_s_high": round(r_hi["tiles_per_s"], 3),
            "mpx_per_s_low": round(r_lo["mpx_per_s"], 3),
            "mpx_per_s_high": round(r_hi["mpx_per_s"], 3),
            "probe": probe,
            "probe_healthy": _probe_is_healthy(probe),
        })
    healthy = [r for r in runs if r["probe_healthy"]] or runs
    effs = sorted(r["efficiency"] for r in healthy)
    median_eff = effs[len(effs) // 2] if len(effs) % 2 else round(
        (effs[len(effs) // 2 - 1] + effs[len(effs) // 2]) / 2.0, 3)
    best = healthy[len(healthy) // 2]
    out = {
        "metric": "moaray_cluster_scaling_efficiency",
        "value": median_eff,
        "unit": "ratio",
        "queries": {
            f"mosaic_nodes{lo_nodes}": best["elapsed_low_s"],
            f"mosaic_nodes{hi_nodes}": best["elapsed_high_s"],
        },
        "num_cpus": hi_nodes * 4,
        "cluster_scaling": {
            "nodes_low": lo_nodes,
            "nodes_high": hi_nodes,
            "cpus_per_node": 4,
            "repeats": repeats,
            "healthy_repeats": len([r for r in runs if r["probe_healthy"]]),
            "median_efficiency": median_eff,
            "runs": runs,
        },
    }
    print(json.dumps(out))


def _subprocess_fn(call: str) -> dict:
    """Run an arbitrary bench function call in a fresh process (it owns its
    Ray session / simulated cluster)."""
    code = (
        "import json, bench;"
        f"r = bench.{call};"
        "print('RESULT ' + json.dumps(r))"
    )
    env = dict(os.environ)
    env["PYTHONPATH"] = os.path.dirname(os.path.abspath(__file__))
    proc = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True, text=True, timeout=1800, env=env,
        cwd=os.path.dirname(os.path.abspath(__file__)),
    )
    for line in proc.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError(f"subprocess failed:\n{proc.stderr[-2000:]}")


def main_soak():
    """Combined multiband+warp+salted soak at 8 vs 32 cpus (fresh
    processes); reports both throughputs + scaling efficiency."""
    lo, hi = 8, 32
    r_lo = _subprocess_mosaic(lo, "run_soak_bench")
    r_hi = _subprocess_mosaic(hi, "run_soak_bench")
    eff = (r_hi["tiles_per_s"] / r_lo["tiles_per_s"]) / (hi / lo)
    out = {
        "metric": "moaray_soak_scaling_efficiency",
        "value": round(eff, 3),
        "unit": "ratio",
        "queries": {
            f"soak_cpus{lo}": round(r_lo["elapsed_s"], 3),
            f"soak_cpus{hi}": round(r_hi["elapsed_s"], 3),
        },
        "num_cpus": hi,
        "soak": {
            "n_images": r_lo["n_images"],
            "bands": 2,
            "warp": "AFFINE scale-2, bilinear",
            "tiles_per_s_low": round(r_lo["tiles_per_s"], 3),
            "tiles_per_s_high": round(r_hi["tiles_per_s"], 3),
            "mpx_per_s_low": round(r_lo["mpx_per_s"], 3),
            "mpx_per_s_high": round(r_hi["mpx_per_s"], 3),
            "efficiency": round(eff, 3),
        },
    }
    print(json.dumps(out))




OPS_SCALE_EVENTS = int(os.environ.get("MOARAY_OPS_SCALE_EVENTS", "2000000"))
OPS_SCALE_USERS = int(os.environ.get("MOARAY_OPS_SCALE_USERS", "200000"))


def run_ops_scale(num_cpus: int) -> dict:
    """Key-cardinality stress for the bounded-partition groupby ops:
    2M synthetic events over 200k users (~130x the sf0.1 user count, the
    cardinality regime where a per-key map_groups would make 200k Python
    calls per stage). Deterministic synthesis — no external data."""
    import time

    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from moaray.ops.relational import (
        cohort_retention_matrix,
        events_cumulative,
        sessionize,
        top_orders_per_customer,
    )

    rng = np.random.default_rng(42)
    n, users = OPS_SCALE_EVENTS, OPS_SCALE_USERS
    uid = rng.integers(0, users, n)
    base = np.int64(1_700_000_000_000_000)
    ts = base + rng.integers(0, 30 * 86400 * 1_000_000, n)
    events = rd.from_arrow(pa.table({
        "event_id": pa.array(np.arange(n), pa.int64()),
        "user_id": pa.array(uid, pa.int64()),
        "ts": pa.array(ts, pa.timestamp("us")),
        "event_type": pa.array(
            np.array(["view", "click", "purchase"])[
                rng.integers(0, 3, n)
            ], pa.string()),
        "value": pa.array(
            np.round(rng.uniform(0, 500, n), 2), pa.float64()),
    })).materialize()
    orders = rd.from_arrow(pa.table({
        "o_custkey": pa.array(uid, pa.int64()),
        "o_orderkey": pa.array(np.arange(n), pa.int64()),
        "o_totalprice": pa.array(
            np.round(rng.uniform(0, 500000, n), 2), pa.float64()),
    })).materialize()

    timings = {}

    def timed(name, fn, expect_rows=None):
        t0 = time.monotonic()
        rows = fn().count()
        timings[name] = round(time.monotonic() - t0, 3)
        timings[name + "_rows"] = rows
        if expect_rows is not None:
            assert rows == expect_rows, (name, rows, expect_rows)

    timed("sessionize_200k_users", lambda: sessionize(events))
    timed("events_cumulative_200k_users",
          lambda: events_cumulative(events), expect_rows=n)
    timed("cohort_matrix_200k_users",
          lambda: cohort_retention_matrix(
              events, unit="day", event_type="purchase", max_offset=7))
    timed("top_orders_200k_custkeys",
          lambda: top_orders_per_customer(orders))
    return timings


def main_ops_scale():
    import ray

    ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False,
             ignore_reinit_error=True)
    r = run_ops_scale(NUM_CPUS)
    ray.shutdown()
    total = round(sum(v for k, v in r.items() if not k.endswith("_rows")), 3)
    out = {
        "metric": "moaray_ops_scale_total",
        "value": total,
        "unit": "sec",
        "queries": {k: v for k, v in r.items() if not k.endswith("_rows")},
        "n_events": OPS_SCALE_EVENTS,
        "n_users": OPS_SCALE_USERS,
        "num_cpus": NUM_CPUS,
        "ops_scale": r,
        "host": host_probe(),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        main_scaling()
    elif "--ann-scale" in sys.argv:
        main_ann_scale()
    elif "--ops-scale" in sys.argv:
        main_ops_scale()
    elif "--soak" in sys.argv:
        main_soak()
    elif "--cluster-scaling" in sys.argv:
        reps = 3
        if "--repeats" in sys.argv:
            reps = int(sys.argv[sys.argv.index("--repeats") + 1])
        main_cluster_scaling(reps)
    else:
        main_bench()
