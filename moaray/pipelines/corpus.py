"""Incremental corpus store: the text-side mirror of pipelines/update.py.

A curated corpus lives as a committed partitioned store (the
sinks/partitioned.py protocol: data file first, manifest second, so a
killed run never exposes a torn partition). ``corpus_init`` writes
generation 0; ``corpus_append`` folds a NEW batch of documents in:

1. the new batch dedups internally (exact min-id per text hash);
2. survivors probe a Bloom filter built FROM THE COMMITTED STORE's
   ``text_hash`` column (one column-pruned scan; 128 KB partials per
   block, never the text) — Bloom misses are GUARANTEED new;
3. possible hits verify exactly against the store's hash column
   (bounded: only the hit rows' hashes broadcast);
4. genuinely-new docs land as generation-stamped partitions
   (``part-g{gen:04d}-{bucket:05d}.parquet``), and the generation id is
   recorded in ``generations.json`` — re-running a completed append is a
   no-op (the update_mosaic applied_updates discipline,
   ref update.py:338-348).

Readers see only generations recorded as applied (and not superseded —
see corpus_compact), making every mutation atomic at one JSON swap;
within the visible store a text hash appears exactly once.
"""

from __future__ import annotations

import hashlib
import time

import numpy as np
import pyarrow as pa

from ..state.fsio import OutputFS

_MANIFEST_DIR = "manifest"
_GEN_FILE = "generations.json"


def _with_hash(batch: pa.Table, text_col: str) -> pa.Table:
    hashes = [
        hashlib.md5(t.encode("utf-8")).hexdigest()
        for t in batch[text_col].to_pylist()
    ]
    return batch.append_column("text_hash", pa.array(hashes, pa.string()))


def _dedup_new_batch(docs_ds, text_col: str, id_col: str,
                     n_partitions: int = 256):
    """Exact min-id-per-hash dedup of the incoming batch, keeping full
    rows. Groups on a bounded FNV partition of the hash (a raw per-hash
    groupby pays one Python call per DISTINCT TEXT — see ops/dedup.py
    exact_dedup) and takes each hash's min-id row with one lexsort per
    partition group."""
    from ..ops.text import _fnv1a64_strings

    def add_part(batch: pa.Table) -> pa.Table:
        part = _fnv1a64_strings(
            batch["text_hash"].combine_chunks()
        ) % np.int64(n_partitions)
        return batch.append_column("part", pa.array(part, pa.int64()))

    def min_rows(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return group.drop_columns(["part"])
        h = np.asarray(group["text_hash"].to_pylist())
        ids = group[id_col].to_numpy()
        order = np.lexsort((ids, h))
        hs = h[order]
        starts = np.concatenate(
            ([0], np.nonzero(hs[1:] != hs[:-1])[0] + 1)
        )
        return group.drop_columns(["part"]).take(
            pa.array(order[starts], pa.int64())
        )

    return (
        docs_ds.map_batches(
            lambda b: _with_hash(b, text_col), batch_format="pyarrow"
        )
        .map_batches(add_part, batch_format="pyarrow")
        .groupby("part")
        .map_groups(min_rows, batch_format="pyarrow")
    )


def _committed_generations(ofs: OutputFS) -> dict:
    try:
        return ofs.read_json(ofs.join(ofs.root, _GEN_FILE))
    except Exception:
        return {"applied": []}


def _write_generation(ds, out_dir: str, gen: int, key: str,
                      n_partitions: int) -> dict:
    """Write one generation's rows through the committed-sink protocol
    with generation-scoped file names (so generations never collide)."""
    from ..sinks.partitioned import _bucket_of

    ofs = OutputFS(out_dir)
    ofs.makedirs(ofs.join(ofs.root, _MANIFEST_DIR))
    done = set()
    for name in ofs.list_names(ofs.join(ofs.root, _MANIFEST_DIR)):
        if name.startswith(f"g{gen:04d}-") and name.endswith(".json"):
            done.add(int(name[len(f"g{gen:04d}-bucket-"):-len(".json")]))

    def commit_bucket(group: pa.Table) -> pa.Table:
        b = int(group["__bucket"][0].as_py())
        tbl = group.drop_columns(["__bucket"])
        if b in done:
            return pa.table({
                "rows": pa.array([tbl.num_rows], pa.int64()),
                "written": pa.array([False], pa.bool_()),
            })
        t0 = time.time()
        data_path = ofs.join(
            ofs.root, f"part-g{gen:04d}-{b:05d}.parquet"
        )
        n_bytes = ofs.put_table(data_path, tbl)
        ofs.put_json(
            ofs.join(ofs.root, _MANIFEST_DIR,
                     f"g{gen:04d}-bucket-{b:05d}.json"),
            {"generation": gen, "bucket": b, "rows": tbl.num_rows,
             "bytes": n_bytes, "wall_s": round(time.time() - t0, 4),
             "path": data_path, "committed_at": time.time()},
        )
        return pa.table({
            "rows": pa.array([tbl.num_rows], pa.int64()),
            "written": pa.array([True], pa.bool_()),
        })

    stats = (
        ds.map_batches(
            lambda batch: _bucket_of(batch, key, n_partitions),
            batch_format="pyarrow",
        )
        .groupby("__bucket")
        .map_groups(commit_bucket, batch_format="pyarrow")
        .take_all()
    )
    return {
        "rows": int(sum(r["rows"] for r in stats)),
        "written": sum(1 for r in stats if r["written"]),
    }


def read_corpus(out_dir: str):
    """Union of the committed partitions of APPLIED, non-superseded
    generations. Filtering on generations.json makes every mutation
    atomic at the single JSON swap: a half-written append or compaction
    is invisible until its generation id lands in ``applied``."""
    import ray

    ofs = OutputFS(out_dir)
    gens = _committed_generations(ofs)
    visible = set(gens["applied"]) - set(gens.get("superseded", []))
    paths = []
    for name in sorted(ofs.list_names(ofs.join(ofs.root, _MANIFEST_DIR))):
        if name.endswith(".json"):
            rec = ofs.read_json(ofs.join(ofs.root, _MANIFEST_DIR, name))
            if "path" in rec and rec.get("generation") in visible:
                paths.append(rec["path"])
    if not paths:
        return ray.data.from_items([])
    return ray.data.read_parquet(paths)


def corpus_init(docs_ds, out_dir: str, *, text_col: str = "text",
                id_col: str = "doc_id", n_partitions: int = 16) -> dict:
    """Generation 0: internal exact dedup, committed partitions, applied
    marker. Idempotent: re-running skips committed buckets and the
    generation guard makes the whole call a recorded no-op."""
    ofs = OutputFS(out_dir)
    gens = _committed_generations(ofs)
    if 0 in gens["applied"]:
        return {"generation": 0, "rows": 0, "written": 0,
                "skipped_applied": True}
    unique = _dedup_new_batch(docs_ds, text_col, id_col)
    res = _write_generation(unique, out_dir, 0, id_col, n_partitions)
    gens["applied"] = sorted(set(gens["applied"]) | {0})
    ofs.put_json(ofs.join(ofs.root, _GEN_FILE), gens)
    return {"generation": 0, **res, "skipped_applied": False}


def corpus_append(new_docs_ds, out_dir: str, generation: int, *,
                  text_col: str = "text", id_col: str = "doc_id",
                  n_partitions: int = 16,
                  bloom_bits: int = 1 << 20) -> dict:
    """Fold a new document batch into a committed store (see module
    docstring). ``generation`` must be a fresh positive id chosen by the
    caller (a rerun with an already-applied id is a no-op)."""
    from ..ops.sketch import bloom_build, bloom_probe

    if generation <= 0:
        raise ValueError("generation must be a positive caller-chosen id")
    ofs = OutputFS(out_dir)
    gens = _committed_generations(ofs)
    if generation in gens["applied"]:
        return {"generation": generation, "rows": 0, "written": 0,
                "skipped_applied": True}

    store_hashes = read_corpus(out_dir).select_columns(["text_hash"])
    bits, k = bloom_build(store_hashes, "text_hash", m_bits=bloom_bits)

    fresh = _dedup_new_batch(new_docs_ds, text_col, id_col)
    # Bloom misses: GUARANTEED not in the store. Possible hits verify
    # exactly — only the hit rows' hashes ship to the anti-join.
    misses = bloom_probe(fresh, "text_hash", bits, k, keep="misses")
    maybe = bloom_probe(fresh, "text_hash", bits, k, keep="hits")
    # verify candidates exactly: collect only the candidate HASHES
    # (bounded by overlap + Bloom false positives), scan the store's hash
    # column for which exist, broadcast that set, keep the rest.
    need = sorted({
        r["text_hash"]
        for r in maybe.select_columns(["text_hash"]).take_all()
    })
    if need:
        import ray

        # broadcast the candidate set once and probe it with an Arrow
        # is_in kernel per store block — a full-overlap append (every
        # incoming doc already stored) keeps this linear in the store's
        # hash column, where an `expr="text_hash in [...]"` string would
        # grow with the candidate count
        need_arr = pa.array(need, pa.string())
        need_ref = ray.put(need_arr)

        def hits_only(batch: pa.Table) -> pa.Table:
            import pyarrow.compute as _pc

            mask = _pc.is_in(batch["text_hash"], value_set=ray.get(need_ref))
            return batch.filter(mask)

        seen = frozenset(
            r["text_hash"]
            for r in store_hashes.map_batches(
                hits_only, batch_format="pyarrow"
            ).take_all()
        )
        seen_ref = ray.put(seen)

        def drop_seen(batch: pa.Table) -> pa.Table:
            s = ray.get(seen_ref)
            keep = [h not in s for h in batch["text_hash"].to_pylist()]
            return batch.filter(pa.array(keep, pa.bool_()))

        extra = maybe.map_batches(drop_seen, batch_format="pyarrow")
        new_ds = misses.union(extra)
    else:
        new_ds = misses

    res = _write_generation(new_ds, out_dir, generation, id_col,
                            n_partitions)
    gens["applied"] = sorted(set(gens["applied"]) | {generation})
    ofs.put_json(ofs.join(ofs.root, _GEN_FILE), gens)
    return {"generation": generation, **res, "skipped_applied": False}


def corpus_compact(out_dir: str, generation: int, *,
                   id_col: str = "doc_id", n_partitions: int = 16,
                   gc: bool = False) -> dict:
    """Fold every visible generation into ONE fresh generation — the
    small-files compaction an append-heavy store accumulates toward.

    Crash-safe by the read_corpus visibility rule: the compacted
    generation's buckets commit first (invisible — not yet applied), then
    a SINGLE generations.json swap marks it applied and supersedes the
    old generations. A crash before the swap leaves the old view intact;
    after it, readers see only the compacted set. ``gc=True`` deletes
    superseded data+manifest files afterwards (safe post-swap)."""
    if generation <= 0:
        raise ValueError("generation must be a positive caller-chosen id")
    ofs = OutputFS(out_dir)
    gens = _committed_generations(ofs)
    if generation in gens["applied"]:
        return {"generation": generation, "rows": 0, "written": 0,
                "skipped_applied": True}
    old = sorted(set(gens["applied"]) - set(gens.get("superseded", [])))
    res = _write_generation(read_corpus(out_dir), out_dir, generation,
                            id_col, n_partitions)
    gens["applied"] = sorted(set(gens["applied"]) | {generation})
    gens["superseded"] = sorted(set(gens.get("superseded", [])) | set(old))
    ofs.put_json(ofs.join(ofs.root, _GEN_FILE), gens)  # the atomic swap
    if gc:
        for name in list(ofs.list_names(ofs.join(ofs.root,
                                                 _MANIFEST_DIR))):
            if not name.endswith(".json"):
                continue
            p = ofs.join(ofs.root, _MANIFEST_DIR, name)
            rec = ofs.read_json(p)
            if rec.get("generation") in gens["superseded"]:
                try:
                    ofs.remove(rec["path"])
                except OSError:
                    pass
                ofs.remove(p)
    return {"generation": generation, **res, "skipped_applied": False,
            "superseded": old}


def corpus_stats(out_dir: str) -> dict:
    """Store introspection from manifests alone (no data reads): per-
    generation rows/bytes/buckets plus the visible totals."""
    ofs = OutputFS(out_dir)
    gens = _committed_generations(ofs)
    visible = set(gens["applied"]) - set(gens.get("superseded", []))
    per_gen: dict = {}
    for name in sorted(ofs.list_names(ofs.join(ofs.root, _MANIFEST_DIR))):
        if not name.endswith(".json"):
            continue
        rec = ofs.read_json(ofs.join(ofs.root, _MANIFEST_DIR, name))
        g = rec.get("generation")
        if g is None:
            continue
        d = per_gen.setdefault(g, {"rows": 0, "bytes": 0, "buckets": 0,
                                   "visible": g in visible})
        d["rows"] += rec.get("rows", 0)
        d["bytes"] += rec.get("bytes", 0)
        d["buckets"] += 1
    return {
        "generations": per_gen,
        "applied": sorted(gens["applied"]),
        "superseded": sorted(gens.get("superseded", [])),
        "visible_rows": sum(d["rows"] for g, d in per_gen.items()
                            if d["visible"]),
        "visible_bytes": sum(d["bytes"] for g, d in per_gen.items()
                             if d["visible"]),
    }
