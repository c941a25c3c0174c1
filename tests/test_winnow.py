"""Winnowing fingerprints (Schleimer/Wilkerson/Aiken, SIGMOD 2003).

Parity oracle here is an INDEPENDENT scalar transcription of the paper's
algorithm (pure-Python ints, explicit window scan) — never the engine's
vectorized path.
"""
import random

import numpy as np
import pyarrow as pa
import pytest
import ray

from moaray.ops.dedup import (
    _winnow_doc,
    winnow_fingerprints,
    winnow_pairs,
)

K, W, M, BASE = 16, 12, 2147483647, 257


def winnow_scalar(text: str, k: int = K, w: int = W):
    """Paper transcription: per-position k-gram hash (Horner, char by
    char), then for each window of w hashes select the minimum, rightmost
    on ties; record each selected position once. 1-based positions."""
    cps = [ord(c) for c in text]
    n = len(cps)
    if n < k:
        return set()
    hashes = []
    for i in range(n - k + 1):
        h = 0
        for j in range(k):
            h = (h * BASE + cps[i + j]) % M
        hashes.append(h)
    m = len(hashes)
    picked = set()
    if m <= w:
        best, best_i = None, None
        for i, h in enumerate(hashes):
            if best is None or h <= best:  # <= keeps the RIGHTMOST min
                best, best_i = h, i
        picked.add((best_i + 1, best))
        return picked
    for start in range(m - w + 1):
        best, best_i = None, None
        for i in range(start, start + w):
            if best is None or hashes[i] <= best:
                best, best_i = hashes[i], i
        picked.add((best_i + 1, hashes[best_i]))
    return picked


def _engine_doc(text):
    pos, h = _winnow_doc(text, K, W)
    return set(zip(pos.tolist(), h.tolist()))


def test_scalar_parity_random_texts():
    rng = random.Random(7)
    alpha = "abcdefg hij\nkl"
    for trial in range(40):
        n = rng.randint(0, 120)
        text = "".join(rng.choice(alpha) for _ in range(n))
        assert _engine_doc(text) == winnow_scalar(text), (trial, text)


def test_scalar_parity_real_docs():
    import pyarrow.parquet as pq

    tbl = pq.read_table(
        "/root/testdata/sf0.001/documents.parquet", columns=["text"]
    )
    for text in tbl["text"].to_pylist()[:40]:
        assert _engine_doc(text) == winnow_scalar(text)


def test_edges():
    assert _engine_doc("") == set()
    assert _engine_doc("x" * (K - 1)) == set()  # shorter than one k-gram
    one = _engine_doc("y" * K)  # exactly one k-gram
    assert len(one) == 1 and next(iter(one))[0] == 1
    # unicode codepoints (multi-byte utf-8) hash as codepoints
    uni = "héllo wörld é世界\U0001f600 " * 4
    assert _engine_doc(uni) == winnow_scalar(uni)


def test_tie_rightmost():
    # constant text -> every k-gram hash equal -> each window's rightmost
    # position is selected -> positions are exactly {w, w+1, ..., m}
    text = "a" * 60
    m = len(text) - K + 1
    got = sorted(p for p, _ in _engine_doc(text))
    assert got == list(range(W, m + 1))


def test_substring_guarantee():
    # shared substring of length >= w + k - 1 must yield a shared hash
    rng = random.Random(3)
    alpha = "abcdefghijklmnopqrstuvwxyz"
    shared = "".join(rng.choice(alpha) for _ in range(W + K - 1))
    for _ in range(20):
        pre_a = "".join(rng.choice(alpha) for _ in range(rng.randint(0, 80)))
        suf_a = "".join(rng.choice(alpha) for _ in range(rng.randint(0, 80)))
        pre_b = "".join(rng.choice(alpha) for _ in range(rng.randint(0, 80)))
        suf_b = "".join(rng.choice(alpha) for _ in range(rng.randint(0, 80)))
        ha = {h for _, h in _engine_doc(pre_a + shared + suf_a)}
        hb = {h for _, h in _engine_doc(pre_b + shared + suf_b)}
        assert ha & hb


def test_density():
    rng = random.Random(11)
    text = "".join(rng.choice("abcdefghijklmnop") for _ in range(4000))
    m = len(text) - K + 1
    n_fp = len(_engine_doc(text))
    # paper: expected density 2/(w+1); allow a wide band
    assert m / (2 * W) <= n_fp <= 4 * m / W


def _docs_ds(texts):
    return ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        )
    )


def test_fingerprints_dataset_matches_scalar():
    rng = random.Random(5)
    texts = [
        "".join(rng.choice("abcde fgh") for _ in range(rng.randint(0, 200)))
        for _ in range(25)
    ]
    got = winnow_fingerprints(_docs_ds(texts), K, W).to_pandas()
    eng = {
        (int(r.doc_id), int(r.pos), int(r.fp_hash))
        for r in got.itertuples()
    }
    ref = {
        (i, p, h)
        for i, t in enumerate(texts)
        for p, h in winnow_scalar(t)
    }
    assert eng == ref


def test_pairs_vs_bruteforce():
    rng = random.Random(9)
    alpha = "abcdefghijklmnopqrstuvwxyz "
    boiler = "".join(rng.choice(alpha) for _ in range(120))
    texts = []
    for i in range(30):
        body = "".join(rng.choice(alpha) for _ in range(rng.randint(60, 200)))
        texts.append(body + (boiler if i % 3 == 0 else ""))
    pairs = winnow_pairs(_docs_ds(texts), K, W, min_shared=2, max_bucket=0)
    got = {
        (int(r.doc_a), int(r.doc_b), int(r.shared))
        for r in pairs.to_pandas().itertuples()
    }
    fp = [{h for _, h in winnow_scalar(t)} for t in texts]
    ref = set()
    for a in range(len(texts)):
        for b in range(a + 1, len(texts)):
            s = len(fp[a] & fp[b])
            if s >= 2:
                ref.add((a, b, s))
    assert got == ref
    # every boilerplate pair is found
    boiler_ids = [i for i in range(30) if i % 3 == 0]
    found_ab = {(a, b) for a, b, _ in got}
    for ai in range(len(boiler_ids)):
        for bi in range(ai + 1, len(boiler_ids)):
            assert (boiler_ids[ai], boiler_ids[bi]) in found_ab


def test_max_bucket_guard():
    # a hash shared by ALL docs is skipped when the bucket guard is on
    texts = ["common prefix shared by every doc %02d" % i for i in range(12)]
    exact = winnow_pairs(_docs_ds(texts), K, W, min_shared=1, max_bucket=0)
    guarded = winnow_pairs(_docs_ds(texts), K, W, min_shared=1, max_bucket=4)
    assert exact.count() > 0
    assert guarded.count() == 0


def test_bad_params():
    with pytest.raises(ValueError):
        winnow_fingerprints(_docs_ds(["x"]), k=0)
    with pytest.raises(ValueError):
        winnow_fingerprints(_docs_ds(["x"]), k=8, w=0)
