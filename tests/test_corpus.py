"""Incremental corpus store (pipelines/corpus.py): init + append with
cross-generation exact dedup, generation-guard idempotence, kill-resume."""

import glob
import os

import numpy as np
import pyarrow as pa
import ray


def _docs(ids, texts):
    return ray.data.from_arrow(pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "text": pa.array(texts, pa.string()),
    }))


def test_corpus_init_append_dedup_and_guards(ray_session, tmp_path):
    from moaray.pipelines.corpus import (corpus_append, corpus_init,
                                         read_corpus)

    out = str(tmp_path / "corpus")
    # gen 0: 10 docs, two internal exact dups (texts 1 and 2 repeat)
    texts0 = [f"text number {i}" for i in range(8)] + [
        "text number 1", "text number 2"]
    r0 = corpus_init(_docs(range(10), texts0), out, n_partitions=4)
    assert r0["rows"] == 8 and not r0["skipped_applied"]
    g0 = read_corpus(out).take_all()
    assert len(g0) == 8
    # the min-id survivor wins for each duplicated text
    by_text = {r["text"]: r["doc_id"] for r in g0}
    assert by_text["text number 1"] == 1 and by_text["text number 2"] == 2

    # re-init is a recorded no-op
    r0b = corpus_init(_docs(range(10), texts0), out, n_partitions=4)
    assert r0b["skipped_applied"] and read_corpus(out).count() == 8

    # gen 1: 6 docs — 3 overlap the store (same text), one internal dup
    texts1 = ["text number 3", "text number 5", "text number 7",
              "brand new alpha", "brand new beta", "brand new alpha"]
    r1 = corpus_append(_docs(range(100, 106), texts1), out, generation=1,
                       n_partitions=4)
    assert r1["rows"] == 2 and not r1["skipped_applied"]
    allrows = read_corpus(out).take_all()
    assert len(allrows) == 10
    texts = sorted(r["text"] for r in allrows)
    assert "brand new alpha" in texts and "brand new beta" in texts
    # a text hash appears exactly once across generations
    hashes = [r["text_hash"] for r in allrows]
    assert len(hashes) == len(set(hashes))
    # internal dup kept the min id
    amap = {r["text"]: r["doc_id"] for r in allrows}
    assert amap["brand new alpha"] == 103

    # replaying the SAME generation is a no-op
    r1b = corpus_append(_docs(range(100, 106), texts1), out, generation=1,
                        n_partitions=4)
    assert r1b["skipped_applied"] and read_corpus(out).count() == 10

    # an all-duplicate append commits an empty generation (still recorded)
    r2 = corpus_append(_docs([200], ["text number 0"]), out, generation=2,
                       n_partitions=4)
    assert r2["rows"] == 0 and not r2["skipped_applied"]
    assert read_corpus(out).count() == 10

    # gen ids must be caller-chosen positive ints
    import pytest as _pytest
    with _pytest.raises(ValueError):
        corpus_append(_docs([1], ["x"]), out, generation=0)


def test_corpus_append_kill_resume(ray_session, tmp_path):
    """Severing one generation partition (data + manifest) and re-running
    the SAME append (guard cleared) rewrites exactly the severed bucket
    and converges to the same row set."""
    import json

    from moaray.pipelines.corpus import (corpus_append, corpus_init,
                                         read_corpus)

    out = str(tmp_path / "corpus")
    corpus_init(_docs(range(20), [f"base {i}" for i in range(20)]), out,
                n_partitions=4)
    corpus_append(
        _docs(range(100, 140), [f"new {i}" for i in range(40)]),
        out, generation=1, n_partitions=4,
    )
    before = sorted(r["text"] for r in read_corpus(out).take_all())
    assert len(before) == 60

    # sever one gen-1 bucket and clear the generation guard
    parts = sorted(glob.glob(f"{out}/part-g0001-*.parquet"))
    victim = parts[0]
    b = int(victim.rsplit("-", 1)[1].split(".")[0])
    os.remove(victim)
    os.remove(f"{out}/manifest/g0001-bucket-{b:05d}.json")
    gens = json.load(open(f"{out}/generations.json"))
    gens["applied"].remove(1)
    json.dump(gens, open(f"{out}/generations.json", "w"))
    assert read_corpus(out).count() < 60

    r = corpus_append(
        _docs(range(100, 140), [f"new {i}" for i in range(40)]),
        out, generation=1, n_partitions=4,
    )
    assert r["written"] == 1  # only the severed bucket rewrites
    after = sorted(r["text"] for r in read_corpus(out).take_all())
    assert after == before


def test_corpus_compact_atomic_swap_and_gc(ray_session, tmp_path):
    import glob as _glob
    import json

    from moaray.pipelines.corpus import (corpus_append, corpus_compact,
                                         corpus_init, read_corpus)

    out = str(tmp_path / "corpus")
    corpus_init(_docs(range(10), [f"base {i}" for i in range(10)]), out,
                n_partitions=4)
    for g in (1, 2, 3):
        corpus_append(
            _docs(range(g * 100, g * 100 + 5),
                  [f"gen{g} doc {i}" for i in range(5)]),
            out, generation=g, n_partitions=4,
        )
    before = sorted(r["text"] for r in read_corpus(out).take_all())
    assert len(before) == 25
    n_files_before = len(_glob.glob(f"{out}/part-*.parquet"))

    r = corpus_compact(out, generation=9, n_partitions=4, gc=True)
    assert r["superseded"] == [0, 1, 2, 3] and r["rows"] == 25
    after = sorted(r["text"] for r in read_corpus(out).take_all())
    assert after == before
    # gc removed every superseded file; only gen-9 parts remain
    remaining = _glob.glob(f"{out}/part-*.parquet")
    assert all("part-g0009-" in p for p in remaining)
    assert len(remaining) <= n_files_before

    # compaction replay is a no-op; appends continue on the compacted view
    assert corpus_compact(out, generation=9)["skipped_applied"]
    corpus_append(_docs([999], ["post compact"]), out, generation=10,
                  n_partitions=4)
    assert read_corpus(out).count() == 26
    # a duplicate of a pre-compaction text still dedups post-compaction
    corpus_append(_docs([1000], ["base 3"]), out, generation=11,
                  n_partitions=4)
    assert read_corpus(out).count() == 26

    # manifest-only introspection agrees with the data
    from moaray.pipelines.corpus import corpus_stats
    st = corpus_stats(out)
    assert st["visible_rows"] == 26
    assert st["superseded"] == [0, 1, 2, 3]
    assert st["generations"][9]["visible"] is True

    # crash-safety shape: a generation with committed buckets but NO
    # applied marker is invisible to readers
    gens = json.load(open(f"{out}/generations.json"))
    gens["applied"].remove(10)
    json.dump(gens, open(f"{out}/generations.json", "w"))
    texts = [r["text"] for r in read_corpus(out).take_all()]
    assert "post compact" not in texts
