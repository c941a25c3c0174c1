"""Deduplication operators: exact, char-set Jaccard, MinHash+LSH, SimHash,
embedding-cosine near-dup.

Scale shapes:
- exact dedup: hash the text locally (md5 inside map_batches) so only the
  32-byte hash + id shuffle through the groupby — never the text.
- pairwise ops are *blocked* (by lang, LSH band-bucket, or SimHash band) so
  comparisons happen inside bounded groups, then vectorized with numpy
  bitset/matmul kernels — never an unblocked O(n²) driver loop.
- embedding near-dup broadcasts the (normalized) matrix once via ray.put and
  streams batches against it (matmul per batch).
"""

from __future__ import annotations

import hashlib
import zlib

import numpy as np
import pyarrow as pa
import ray


def _round_half_away(x: np.ndarray, ndigits: int) -> np.ndarray:
    """SQL round() semantics (np.round is half-even and can differ by one
    ulp-of-the-last-digit on exact rational boundaries like 1/32)."""
    f = 10.0 ** ndigits
    return np.where(
        x >= 0, np.floor(x * f + 0.5), np.ceil(x * f - 0.5)
    ) / f

# ---------------------------------------------------------------------------
# Exact dedup
# ---------------------------------------------------------------------------

def exact_dedup(docs_ds, text_col: str = "text", id_col: str = "doc_id"):
    """Survivor = min(id) per distinct text. Returns (doc_id, text_hash)."""

    def hash_batch(batch: pa.Table) -> pa.Table:
        hashes = [
            hashlib.md5(t.encode("utf-8")).hexdigest()
            for t in batch[text_col].to_pylist()
        ]
        return pa.table(
            {"text_hash": pa.array(hashes, pa.string()), id_col: batch[id_col]}
        )

    hashed = docs_ds.map_batches(hash_batch, batch_format="pyarrow")

    def first_per_group(group: pa.Table) -> pa.Table:
        ids = group[id_col].to_numpy()
        return pa.table(
            {
                id_col: pa.array([int(ids.min())], pa.int64()),
                "text_hash": pa.array([group["text_hash"][0].as_py()], pa.string()),
            }
        )

    return hashed.groupby("text_hash").map_groups(
        first_per_group, batch_format="pyarrow"
    )


# ---------------------------------------------------------------------------
# Char-set Jaccard near-dup (SQL-checkable: DuckDB jaccard())
# ---------------------------------------------------------------------------

def charset_jaccard_pairs(docs_ds, threshold: float = 0.5, block_col: str = "lang"):
    """Pairs (doc_a < doc_b) within a block whose distinct-character-set
    Jaccard >= threshold — exactly DuckDB's jaccard(s1, s2) semantics.

    Vectorized: per block, build a docs × vocab boolean matrix; intersections
    are one integer matmul, unions follow from row sums.
    """

    def pairs_in_group(group: pa.Table) -> pa.Table:
        ids = group["doc_id"].to_numpy()
        texts = group["text"].to_pylist()
        charsets = [frozenset(t) for t in texts]
        vocab = {c: i for i, c in enumerate(sorted(set().union(*charsets)))}
        m = np.zeros((len(texts), len(vocab)), dtype=np.int32)
        for i, cs in enumerate(charsets):
            for c in cs:
                m[i, vocab[c]] = 1
        inter = m @ m.T
        sizes = m.sum(axis=1)
        union = sizes[:, None] + sizes[None, :] - inter
        with np.errstate(divide="ignore", invalid="ignore"):
            jac = np.where(union > 0, inter / np.maximum(union, 1), 0.0)
        ia, ib = np.where(np.triu(jac >= threshold, k=1))
        # canonical id order (ids within a group are unordered after shuffle)
        a = np.minimum(ids[ia], ids[ib])
        b = np.maximum(ids[ia], ids[ib])
        order = np.lexsort((b, a))
        return pa.table(
            {
                "doc_a": pa.array(a[order], pa.int64()),
                "doc_b": pa.array(b[order], pa.int64()),
                "jaccard": pa.array(
                    _round_half_away(jac[ia, ib][order], 4), pa.float64()
                ),
            }
        )

    return docs_ds.select_columns(["doc_id", "text", block_col]).groupby(
        block_col
    ).map_groups(pairs_in_group, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# MinHash + LSH near-dup
# ---------------------------------------------------------------------------

_MERSENNE = np.uint64((1 << 61) - 1)


def _minhash_params(num_perm: int, seed: int = 42):
    rng = np.random.RandomState(seed)
    a = rng.randint(1, 1 << 31, size=num_perm).astype(np.uint64)
    b = rng.randint(0, 1 << 31, size=num_perm).astype(np.uint64)
    return a, b


def _shingle_hashes(text: str, k: int) -> np.ndarray:
    toks = text.split(" ")
    if len(toks) < k:
        shingles = [" ".join(toks)]
    else:
        shingles = [" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)]
    return np.array(
        [zlib.crc32(s.encode("utf-8")) for s in set(shingles)], dtype=np.uint64
    )


def minhash_signatures(
    docs_ds, num_perm: int = 64, k_shingle: int = 3, seed: int = 42
):
    """(doc_id, sig: list<int64>[num_perm]) via k-word shingles + CRC32 base
    hash + universal-hash permutations (vectorized outer product per doc)."""
    a, b = _minhash_params(num_perm, seed)

    def sig_batch(batch: pa.Table) -> pa.Table:
        sigs = []
        for text in batch["text"].to_pylist():
            h = _shingle_hashes(text, k_shingle)
            with np.errstate(over="ignore"):
                vals = (h[None, :] * a[:, None] + b[:, None]) % _MERSENNE
            sigs.append(vals.min(axis=1).astype(np.int64))
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "sig": pa.array([s.tolist() for s in sigs],
                                pa.list_(pa.int64(), num_perm)),
            }
        )

    return docs_ds.select_columns(["doc_id", "text"]).map_batches(
        sig_batch, batch_format="pyarrow"
    )


def minhash_lsh_pairs(
    docs_ds,
    num_perm: int = 64,
    bands: int = 16,
    k_shingle: int = 3,
    threshold: float = 0.5,
    seed: int = 42,
):
    """MinHash near-dup pairs via band-bucket LSH.

    sig -> `bands` buckets (rows_per_band = num_perm // bands); candidate
    pairs meet inside a (band, bucket_hash) group; estimated Jaccard =
    fraction of equal minhashes; pairs below threshold dropped; final
    groupby(doc_a, doc_b) dedups pairs found in multiple bands.
    """
    rows_per_band = num_perm // bands
    sigs = minhash_signatures(docs_ds, num_perm, k_shingle, seed)

    def to_buckets(batch: pa.Table) -> pa.Table:
        out = {"band": [], "bucket": [], "doc_id": [], "sig": []}
        for i in range(batch.num_rows):
            sig = batch["sig"][i].as_py()
            for band in range(bands):
                chunk = tuple(sig[band * rows_per_band : (band + 1) * rows_per_band])
                out["band"].append(band)
                out["bucket"].append(hash(chunk) & 0x7FFFFFFFFFFFFFFF)
                out["doc_id"].append(batch["doc_id"][i].as_py())
                out["sig"].append(sig)
        return pa.Table.from_pydict(
            {
                "band": pa.array(out["band"], pa.int32()),
                "bucket": pa.array(out["bucket"], pa.int64()),
                "doc_id": pa.array(out["doc_id"], pa.int64()),
                "sig": pa.array(out["sig"], pa.list_(pa.int64(), num_perm)),
            }
        )

    buckets = sigs.map_batches(to_buckets, batch_format="pyarrow")

    def candidates(group: pa.Table) -> pa.Table:
        n = group.num_rows
        if n < 2:
            return pa.table(
                {"doc_a": pa.array([], pa.int64()),
                 "doc_b": pa.array([], pa.int64()),
                 "est_jaccard": pa.array([], pa.float64())}
            )
        ids = group["doc_id"].to_numpy()
        sig_mat = np.array(group["sig"].to_pylist(), dtype=np.int64)
        eq = (sig_mat[:, None, :] == sig_mat[None, :, :]).mean(axis=2)
        ia, ib = np.where(np.triu(eq >= threshold, k=1))
        a = np.minimum(ids[ia], ids[ib])
        b = np.maximum(ids[ia], ids[ib])
        return pa.table(
            {
                "doc_a": pa.array(a, pa.int64()),
                "doc_b": pa.array(b, pa.int64()),
                "est_jaccard": pa.array(np.round(eq[ia, ib], 4), pa.float64()),
            }
        )

    cand = buckets.groupby(["band", "bucket"]).map_groups(
        candidates, batch_format="pyarrow"
    )

    def dedup_pair(group: pa.Table) -> pa.Table:
        return group.slice(0, 1)

    return cand.groupby(["doc_a", "doc_b"]).map_groups(
        dedup_pair, batch_format="pyarrow"
    )


# ---------------------------------------------------------------------------
# SimHash near-dup
# ---------------------------------------------------------------------------

def simhash_batch(batch: pa.Table) -> pa.Table:
    """64-bit SimHash over single-space tokens (crc32-seeded bit votes)."""
    out = np.zeros(batch.num_rows, dtype=np.uint64)
    shifts = np.arange(64, dtype=np.uint64)
    one = np.uint64(1)
    for i, text in enumerate(batch["text"].to_pylist()):
        toks = text.split(" ")
        with np.errstate(over="ignore"):
            hs = np.array(
                [zlib.crc32(t.encode("utf-8")) for t in toks], dtype=np.uint64
            ) * np.uint64(0x9E3779B97F4A7C15)
            # tokens × 64 bit matrix, vectorized vote
            bits = (hs[:, None] >> shifts[None, :]) & one
            votes = np.where(bits == one, 1, -1).sum(axis=0)
            sig_bits = (votes > 0).astype(np.uint64)
            out[i] = np.sum(sig_bits << shifts)
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "simhash": pa.array(out.astype(np.int64), pa.int64()),
        }
    )


def simhash_pairs(docs_ds, max_hamming: int = 3):
    """Near-dup pairs with hamming(simhash) <= max_hamming.

    Blocking: 4 × 16-bit bands — any pair within hamming 3 shares at least
    one exact band (pigeonhole), so candidates meet in a (band, value) group.
    """
    sims = docs_ds.select_columns(["doc_id", "text"]).map_batches(
        simhash_batch, batch_format="pyarrow"
    )

    def to_bands(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy()
        h = batch["simhash"].to_numpy().astype(np.uint64)
        out = {"band": [], "value": [], "doc_id": [], "simhash": []}
        for band in range(4):
            vals = (h >> np.uint64(band * 16)) & np.uint64(0xFFFF)
            out["band"].extend([band] * len(ids))
            out["value"].extend(vals.astype(np.int64).tolist())
            out["doc_id"].extend(ids.tolist())
            out["simhash"].extend(h.astype(np.int64).tolist())
        return pa.Table.from_pydict(
            {
                "band": pa.array(out["band"], pa.int32()),
                "value": pa.array(out["value"], pa.int64()),
                "doc_id": pa.array(out["doc_id"], pa.int64()),
                "simhash": pa.array(out["simhash"], pa.int64()),
            }
        )

    bands_ds = sims.map_batches(to_bands, batch_format="pyarrow")

    def candidates(group: pa.Table) -> pa.Table:
        n = group.num_rows
        empty = pa.table(
            {"doc_a": pa.array([], pa.int64()), "doc_b": pa.array([], pa.int64()),
             "hamming": pa.array([], pa.int32())}
        )
        if n < 2:
            return empty
        ids = group["doc_id"].to_numpy()
        h = group["simhash"].to_numpy().astype(np.uint64)
        x = h[:, None] ^ h[None, :]
        ham = np.zeros_like(x, dtype=np.int32)
        for shift in range(64):
            ham += ((x >> np.uint64(shift)) & np.uint64(1)).astype(np.int32)
        ia, ib = np.where(np.triu(ham <= 3, k=1) & (ids[:, None] != ids[None, :]))
        if len(ia) == 0:
            return empty
        a = np.minimum(ids[ia], ids[ib])
        b = np.maximum(ids[ia], ids[ib])
        return pa.table(
            {
                "doc_a": pa.array(a, pa.int64()),
                "doc_b": pa.array(b, pa.int64()),
                "hamming": pa.array(ham[ia, ib], pa.int32()),
            }
        )

    cand = bands_ds.groupby(["band", "value"]).map_groups(
        candidates, batch_format="pyarrow"
    )
    return cand.groupby(["doc_a", "doc_b"]).map_groups(
        lambda g: g.slice(0, 1), batch_format="pyarrow"
    )


# ---------------------------------------------------------------------------
# Embedding-cosine near-dup
# ---------------------------------------------------------------------------

def embedding_neardup_pairs(emb_ds, threshold: float = 0.95):
    """Pairs (vec_a < vec_b) with cosine >= threshold.

    The normalized corpus matrix is broadcast ONCE via ray.put; each batch
    does one matmul against it (never re-shipped per batch).
    """
    rows = emb_ds.select_columns(["vec_id", "embedding"]).take_all()
    ids = np.array([r["vec_id"] for r in rows], dtype=np.int64)
    mat = np.array([r["embedding"] for r in rows], dtype=np.float64)
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    mat = mat / np.maximum(norms, 1e-12)
    ref = ray.put((ids, mat))

    def pairs_batch(batch: pa.Table) -> pa.Table:
        all_ids, all_mat = ray.get(ref)
        bids = batch["vec_id"].to_numpy()
        bmat = np.array(batch["embedding"].to_pylist(), dtype=np.float64)
        bmat = bmat / np.maximum(np.linalg.norm(bmat, axis=1, keepdims=True), 1e-12)
        sims = bmat @ all_mat.T
        ia, ib = np.where(sims >= threshold)
        keep = bids[ia] < all_ids[ib]
        ia, ib = ia[keep], ib[keep]
        return pa.table(
            {
                "vec_a": pa.array(bids[ia], pa.int64()),
                "vec_b": pa.array(all_ids[ib], pa.int64()),
                "cosine": pa.array(np.round(sims[ia, ib], 4), pa.float64()),
            }
        )

    return emb_ds.map_batches(pairs_batch, batch_format="pyarrow")


def embedding_neardup_lsh_pairs(
    emb_ds,
    threshold: float = 0.95,
    n_bits: int = 6,
    n_tables: int = 8,
    seed: int = 42,
):
    """Scale path for embedding near-dup: NO driver-side corpus
    materialization. Vectors are bucketed by random-hyperplane sign patterns
    (``n_tables`` independent hashes); pairwise cosine runs only inside a
    (table, bucket) group, then pairs found in multiple tables dedup through
    a tiny groupby. Recall < 1 by design (raise n_tables to trade compute
    for recall); ``embedding_neardup_pairs`` is the exact baseline."""
    from .ann import _hyperplanes, _normalize, _sign_bucket

    def to_buckets(batch: pa.Table) -> pa.Table:
        ids = batch["vec_id"].to_numpy()
        mat = _normalize(np.array(batch["embedding"].to_pylist(), dtype=np.float64))
        dim = mat.shape[1]
        out = {"table": [], "bucket": [], "vec_id": [], "embedding": []}
        for t in range(n_tables):
            planes = _hyperplanes(dim, n_bits, seed + t)
            b = _sign_bucket(mat, planes)
            out["table"].extend([t] * len(ids))
            out["bucket"].extend(b.tolist())
            out["vec_id"].extend(ids.tolist())
            out["embedding"].extend(mat.tolist())
        return pa.Table.from_pydict(
            {
                "table": pa.array(out["table"], pa.int32()),
                "bucket": pa.array(out["bucket"], pa.int64()),
                "vec_id": pa.array(out["vec_id"], pa.int64()),
                "embedding": pa.array(out["embedding"]),
            }
        )

    buckets = emb_ds.select_columns(["vec_id", "embedding"]).map_batches(
        to_buckets, batch_format="pyarrow"
    )

    def pairs_in_bucket(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {"vec_a": pa.array([], pa.int64()), "vec_b": pa.array([], pa.int64()),
             "cosine": pa.array([], pa.float64())}
        )
        if group.num_rows < 2:
            return empty
        ids = group["vec_id"].to_numpy()
        mat = np.array(group["embedding"].to_pylist(), dtype=np.float64)
        sims = mat @ mat.T
        ia, ib = np.where(np.triu(sims >= threshold, k=1))
        if len(ia) == 0:
            return empty
        a = np.minimum(ids[ia], ids[ib])
        b = np.maximum(ids[ia], ids[ib])
        return pa.table(
            {
                "vec_a": pa.array(a, pa.int64()),
                "vec_b": pa.array(b, pa.int64()),
                "cosine": pa.array(np.round(sims[ia, ib], 4), pa.float64()),
            }
        )

    cand = buckets.groupby(["table", "bucket"]).map_groups(
        pairs_in_bucket, batch_format="pyarrow"
    )
    return cand.groupby(["vec_a", "vec_b"]).map_groups(
        lambda g: g.slice(0, 1), batch_format="pyarrow"
    )


def ngram_jaccard_pairs(
    docs_ds, threshold: float = 0.5, k: int = 3, block_col: str = "lang"
):
    """Exact word-k-gram Jaccard near-dup pairs within blocks.

    The exact counterpart of the MinHash estimate (same shingle
    definition, _shingle_hashes): per block, each doc's k-gram set becomes
    a row of a docs x shingle-vocab boolean matrix; intersections are one
    integer matmul. Blocked by ``block_col`` so group sizes stay bounded —
    at scale, block by (lang, LSH bucket) instead."""

    def pairs_in_group(group: pa.Table) -> pa.Table:
        ids = group["doc_id"].to_numpy()
        texts = group["text"].to_pylist()
        gram_sets = []
        for t in texts:
            toks = t.split(" ")
            if len(toks) < k:
                gram_sets.append({" ".join(toks)})
            else:
                gram_sets.append(
                    {" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)}
                )
        vocab = {}
        for gs in gram_sets:
            for g in gs:
                vocab.setdefault(g, len(vocab))
        m = np.zeros((len(texts), len(vocab)), dtype=np.int32)
        for i, gs in enumerate(gram_sets):
            for g in gs:
                m[i, vocab[g]] = 1
        inter = m @ m.T
        sizes = m.sum(axis=1)
        union = sizes[:, None] + sizes[None, :] - inter
        with np.errstate(divide="ignore", invalid="ignore"):
            jac = np.where(union > 0, inter / np.maximum(union, 1), 0.0)
        ia, ib = np.where(np.triu(jac >= threshold, k=1))
        a = np.minimum(ids[ia], ids[ib])
        b = np.maximum(ids[ia], ids[ib])
        order = np.lexsort((b, a))
        return pa.table(
            {
                "doc_a": pa.array(a[order], pa.int64()),
                "doc_b": pa.array(b[order], pa.int64()),
                "jaccard": pa.array(
                    np.round(jac[ia, ib][order], 4), pa.float64()
                ),
            }
        )

    return docs_ds.select_columns(["doc_id", "text", block_col]).groupby(
        block_col
    ).map_groups(pairs_in_group, batch_format="pyarrow")
