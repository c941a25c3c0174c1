"""Text-analysis operators for large-scale training-data pipelines.

All hot paths are vectorized pyarrow.compute kernels inside ``map_batches``
(no per-row Python in the scan); each op has a DuckDB-SQL-equivalent
definition where expressible so the correctness driver can value-hash it.

Ops: token counting, character-class quality scoring, marker-based language
ID, md5 document fingerprinting, and a rolling-hash fingerprint (the
non-SQL-expressible variant).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# Marker-word language-ID rule. Deliberately expressible as an SQL CASE
# chain (see __ray_entry__.oracle_sql) so the heuristic itself is oracle-
# checked; order of the WHEN branches is part of the definition.
_LANG_RULES = [
    ("de", [" der ", " und ", " die "]),
    ("es", [" el ", " que ", " los "]),
    ("fr", [" le ", " et ", " les "]),
]


def token_count_batch(batch: pa.Table) -> pa.Table:
    """n_tokens = number of single-space-split pieces (== DuckDB
    array_length(str_split(text, ' '))); n_ws_tokens = whitespace-regex
    tokens (the BPE-ish variant)."""
    text = batch["text"]
    n_tokens = pc.list_value_length(pc.split_pattern(text, " "))
    n_ws = pc.list_value_length(pc.split_pattern_regex(text, r"\s+"))
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "n_tokens": pc.cast(n_tokens, pa.int64()),
            "n_ws_tokens": pc.cast(n_ws, pa.int64()),
        }
    )


# BPE-ish pre-tokenization pattern (GPT-2-style word/number/punct runs;
# whitespace separates, never tokenizes). RE2 syntax — the same engine
# family pyarrow and DuckDB both embed, so the SQL oracle counts
# identically.
BPE_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]+"


def bpe_token_count_batch(batch: pa.Table) -> pa.Table:
    """(doc_id, n_bpe_tokens): regex pre-tokenizer counts, fully vectorized
    (one pc.count_substring_regex kernel per batch — no Python per-row
    loop)."""
    n = pc.cast(
        pc.count_substring_regex(batch["text"], BPE_PATTERN), pa.int64()
    )
    return pa.table({"doc_id": batch["doc_id"], "n_bpe_tokens": n})


def hash_sample_batch(batch: pa.Table, id_col: str, hex_lt: str) -> pa.Table:
    """Deterministic content-hash sampling: keep a row iff the first
    ``len(hex_lt)`` hex chars of md5(str(id)) sort below ``hex_lt`` — e.g.
    '40' keeps 64/256 = 25%. The reproducible-pipeline sampling primitive:
    the same id always lands in the same split, on any engine (the DuckDB
    oracle computes the identical predicate)."""
    keep = [
        hashlib.md5(str(v).encode()).hexdigest()[: len(hex_lt)] < hex_lt
        for v in batch[id_col].to_pylist()
    ]
    return batch.filter(pa.array(keep, pa.bool_()))


def hash_sample(ds, id_col: str, hex_lt: str = "40", columns=None):
    """Dataset-level deterministic sample (see hash_sample_batch)."""
    if columns:
        ds = ds.select_columns(columns)
    return ds.map_batches(
        lambda b: hash_sample_batch(b, id_col, hex_lt),
        batch_format="pyarrow",
    )


def quality_filter(
    docs_ds,
    min_alpha_ratio: float = 0.5,
    min_tokens: int = 5,
    max_tokens: int = 100_000,
):
    """Survivor doc ids under the standard quality gates (alpha ratio +
    token-count band) — the composition of the quality/token kernels into
    the filter a training-data pipeline actually runs. Pure pyarrow.compute
    per batch; emits (doc_id) only."""

    def gate(batch: pa.Table) -> pa.Table:
        text = batch["text"]
        n_chars = pc.utf8_length(text)
        n_alpha = pc.subtract(
            n_chars,
            pc.utf8_length(pc.replace_substring_regex(text, "[a-zA-Z]", "")),
        )
        alpha_ratio = pc.divide(
            pc.cast(n_alpha, pa.float64()),
            pc.cast(pc.max_element_wise(n_chars, 1), pa.float64()),
        )
        n_tokens = pc.add(
            pc.count_substring(text, " "), 1
        )  # split-on-single-space count, matching token_count_batch
        keep = pc.and_(
            pc.greater_equal(alpha_ratio, min_alpha_ratio),
            pc.and_(
                pc.greater_equal(n_tokens, min_tokens),
                pc.less_equal(n_tokens, max_tokens),
            ),
        )
        return pa.table({"doc_id": batch["doc_id"].filter(keep)})

    return docs_ds.select_columns(["doc_id", "text"]).map_batches(
        gate, batch_format="pyarrow"
    )


def chunk_documents(docs_ds, window: int = 20, stride: int = 15):
    """Split documents into overlapping token-window chunks — the flat_map
    primitive of a training-data pipeline (one input row -> many chunk
    rows). Chunk i covers tokens [i*stride, i*stride + window); emitted
    while the start index is inside the doc. Pure per-batch expansion, no
    shuffle; at 100 TB the output is written partition-per-input-shard so
    chunking re-runs per shard on failure."""

    def chunks(batch: pa.Table) -> pa.Table:
        out_id, out_idx, out_text = [], [], []
        for i in range(batch.num_rows):
            doc_id = batch["doc_id"][i].as_py()
            toks = batch["text"][i].as_py().split(" ")
            n = len(toks)
            idx = 0
            start = 0
            while start < n:
                out_id.append(doc_id)
                out_idx.append(idx)
                out_text.append(" ".join(toks[start : start + window]))
                idx += 1
                start += stride
        return pa.table(
            {
                "doc_id": pa.array(out_id, pa.int64()),
                "chunk_idx": pa.array(out_idx, pa.int64()),
                "chunk_text": pa.array(out_text, pa.string()),
            }
        )

    return docs_ds.select_columns(["doc_id", "text"]).map_batches(
        chunks, batch_format="pyarrow"
    )


def _count_removed(text: pa.ChunkedArray | pa.Array, pattern: str):
    """How many chars a regex class removes = count of matching chars."""
    stripped = pc.replace_substring_regex(text, pattern, "")
    return pc.subtract(pc.utf8_length(text), pc.utf8_length(stripped))


def quality_batch(batch: pa.Table) -> pa.Table:
    """Character-class quality counts + ratio (rounded for stable hashing)."""
    text = batch["text"]
    n_chars = pc.utf8_length(text)
    n_alpha = _count_removed(text, "[a-zA-Z]")
    n_digit = _count_removed(text, "[0-9]")
    n_space = _count_removed(text, " ")
    alpha_ratio = pc.round(
        pc.divide(
            pc.cast(n_alpha, pa.float64()),
            pc.cast(pc.max_element_wise(n_chars, 1), pa.float64()),
        ),
        ndigits=4,
        round_mode="half_towards_infinity",
    )
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "n_chars": pc.cast(n_chars, pa.int64()),
            "n_alpha": pc.cast(n_alpha, pa.int64()),
            "n_digit": pc.cast(n_digit, pa.int64()),
            "n_space": pc.cast(n_space, pa.int64()),
            "alpha_ratio": alpha_ratio,
        }
    )


def langid_batch(batch: pa.Table) -> pa.Table:
    """Marker-word language ID; CJK check first, then marker chains, else en.

    Identical semantics to the SQL CASE chain in oracle_sql()["doc_langid"].
    """
    text = batch["text"]
    pred = pa.array(["en"] * len(text), pa.string())
    pred = pc.if_else(
        pc.match_substring_regex(text, r"[一-鿿]"),
        pa.scalar("zh"),
        pred,
    )
    # apply rules in reverse so earlier rules win (first-match semantics)
    for lang, markers in reversed(_LANG_RULES):
        hit = pc.match_substring(text, markers[0])
        for m in markers[1:]:
            hit = pc.or_(hit, pc.match_substring(text, m))
        # don't override a zh hit
        hit = pc.and_(hit, pc.invert(pc.match_substring_regex(text, r"[一-鿿]")))
        pred = pc.if_else(hit, pa.scalar(lang), pred)
    return pa.table({"doc_id": batch["doc_id"], "pred_lang": pred})


def md5_fingerprint_batch(batch: pa.Table, col: str = "text") -> pa.Table:
    """md5 hex fingerprint (== DuckDB md5(text)); per-row hashlib is the
    cost of SQL-checkability — the rolling-hash variant below is the
    vectorized scale path."""
    vals = batch[col].to_pylist()
    digests = [hashlib.md5(v.encode("utf-8")).hexdigest() for v in vals]
    return pa.table(
        {"doc_id": batch["doc_id"], "fingerprint": pa.array(digests, pa.string())}
    )


_POLY_BASE = np.uint64(1000003)


def rolling_hash_batch(batch: pa.Table, col: str = "text") -> pa.Table:
    """Vectorized polynomial rolling hash over utf-8 bytes (mod 2^64).

    Non-SQL-expressible fingerprint; deterministic across runs/workers.
    """
    out = np.zeros(batch.num_rows, dtype=np.uint64)
    vals = batch[col].to_pylist()
    for i, v in enumerate(vals):
        b = np.frombuffer(v.encode("utf-8"), dtype=np.uint8).astype(np.uint64)
        # Horner's rule, vectorized via cumulative powers
        n = len(b)
        if n == 0:
            continue
        with np.errstate(over="ignore"):
            powers = np.empty(n, dtype=np.uint64)
            powers[0] = np.uint64(1)
            np.multiply.accumulate(
                np.full(n - 1, _POLY_BASE, dtype=np.uint64), out=powers[1:]
            )
            out[i] = np.sum(b[::-1] * powers, dtype=np.uint64)
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "rolling_hash": pa.array(out.astype(np.int64), pa.int64()),
        }
    )


def extract_props_k(events_ds):
    """JSON field extraction over the events props column: vectorized arrow
    string kernel (no per-row json.loads in the hot path — the '{"k": N}'
    shape is extracted with one regexp per batch). Emits (event_id, k)."""
    import pyarrow.compute as pc

    def extract(batch: pa.Table) -> pa.Table:
        ks = pc.extract_regex(batch["props"], r'"k":\s*(?P<k>-?\d+)')
        kvals = pc.cast(pc.struct_field(ks, "k"), pa.int64())
        return pa.table({"event_id": batch["event_id"], "k": kvals})

    return events_ds.select_columns(["event_id", "props"]).map_batches(
        extract, batch_format="pyarrow"
    )


def word_freq(docs_ds, k: int = 50):
    """Global word-frequency top-k (the vocabulary pass a tokenizer-
    training pipeline runs over the corpus).

    Combiner shape: each batch splits on single spaces and collapses to
    (word, n) partials with np.unique — only distinct words leave the
    batch, never token streams; a groupby sums partials; per-block local
    top-k then one tiny global merge picks the top ``k`` with the
    deterministic (n DESC, word ASC) tiebreak the oracle uses."""
    import pyarrow.compute as pc

    def partial(batch: pa.Table) -> pa.Table:
        toks = pc.list_flatten(
            pc.split_pattern(batch["text"], pattern=" ")
        )
        words, counts = np.unique(
            np.asarray(toks.to_numpy(zero_copy_only=False)),
            return_counts=True,
        )
        return pa.table({
            "word": pa.array(words, pa.string()),
            "n": pa.array(counts, pa.int64()),
        })

    # per-word grouping pays one Python call per VOCABULARY entry; group
    # on a bounded FNV partition of the word and fold with Arrow's C++
    # hash-aggregate inside each group
    n_partitions = 256

    def add_part(batch: pa.Table) -> pa.Table:
        part = _fnv1a64_strings(
            batch["word"].combine_chunks()
        ) % np.int64(n_partitions)
        return batch.append_column("part", pa.array(part, pa.int64()))

    def merge_words(group: pa.Table) -> pa.Table:
        g = (
            group.select(["word", "n"])
            .group_by("word")
            .aggregate([("n", "sum")])
        )
        return pa.table({
            "word": g["word"],
            "n": g["n_sum"].cast(pa.int64()),
        })

    def local_topk(batch: pa.Table) -> pa.Table:
        words = np.asarray(batch["word"].to_pylist())
        n = batch["n"].to_numpy()
        order = np.lexsort((words, -n))[:k]
        return batch.take(pa.array(order, pa.int64()))

    counts = (
        docs_ds.select_columns(["text"])
        .map_batches(partial, batch_format="pyarrow")
        .map_batches(add_part, batch_format="pyarrow")
        .groupby("part")
        .map_groups(merge_words, batch_format="pyarrow")
    )
    return (
        counts.map_batches(local_topk, batch_format="pyarrow")
        .map_batches(
            lambda t: t.append_column(
                "one", pa.array([1] * t.num_rows, pa.int32())
            ),
            batch_format="pyarrow",
        )
        .groupby("one")
        .map_groups(
            lambda g: local_topk(g).drop_columns(["one"]),
            batch_format="pyarrow",
        )
    )


def length_histogram(docs_ds, bin_width: int = 16, n_bins: int = 32):
    """Document-length histogram (corpus census before choosing chunk /
    context sizes): fixed bins of ``bin_width`` chars, last bin open.
    Per-batch np.bincount partials (n_bins ints per batch — nothing else
    shuffles), one tiny groupby to sum."""
    import pyarrow.compute as pc

    def partial(batch: pa.Table) -> pa.Table:
        lens = batch["n_chars"].to_numpy()
        b = np.minimum(lens // bin_width, n_bins - 1).astype(np.int64)
        counts = np.bincount(b, minlength=n_bins).astype(np.int64)
        nz = np.nonzero(counts)[0]
        return pa.table({
            "bin": pa.array(nz, pa.int64()),
            "n_docs": pa.array(counts[nz], pa.int64()),
        })

    def merge_bin(group: pa.Table) -> pa.Table:
        return pa.table({
            "bin": [group["bin"][0].as_py()],
            "lo_chars": [group["bin"][0].as_py() * bin_width],
            "n_docs": [int(pc.sum(group["n_docs"]).as_py())],
        })

    return (
        docs_ds.select_columns(["n_chars"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("bin")
        .map_groups(merge_bin, batch_format="pyarrow")
    )


_STOPWORDS = ("the", "a", "an", "and", "or", "of", "to", "in", "is", "it")


def quality_extended_batch(batch: pa.Table) -> pa.Table:
    """Punctuation + stopword ratios (the length/punct/stopword trio of a
    training-data quality filter). Vectorized: punct via one regex removal,
    stopword hits via list membership over single-space tokens."""
    text = batch["text"]
    n_chars = pc.utf8_length(text)
    n_punct = _count_removed(text, r"""[!-/:-@\[-`{-~]""")
    toks_col = pc.split_pattern(pc.utf8_lower(text), " ")
    n_tokens = pc.list_value_length(toks_col)
    # flatten the token lists once; per-row stopword hits via cumsum over
    # the list offsets (vectorized, handles consecutive stopwords correctly)
    stop_set = pa.array(list(_STOPWORDS), pa.string())
    hit_counts = []
    chunks = (
        toks_col.chunks
        if isinstance(toks_col, pa.ChunkedArray)
        else [toks_col]
    )
    for chunk in chunks:
        flat = chunk.flatten()
        offsets = chunk.offsets.to_numpy()
        isin = (
            pc.is_in(flat, value_set=stop_set)
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        c = np.concatenate(([0], np.cumsum(isin)))
        base = offsets[0]
        hit_counts.append(c[offsets[1:] - base] - c[offsets[:-1] - base])
    stop_hits = pa.array(np.concatenate(hit_counts), pa.int64())
    punct_ratio = pc.round(
        pc.divide(
            pc.cast(n_punct, pa.float64()),
            pc.cast(pc.max_element_wise(n_chars, 1), pa.float64()),
        ),
        ndigits=4,
        round_mode="half_towards_infinity",
    )
    stop_ratio = pc.round(
        pc.divide(
            pc.cast(stop_hits, pa.float64()),
            pc.cast(pc.max_element_wise(n_tokens, 1), pa.float64()),
        ),
        ndigits=4,
        round_mode="half_towards_infinity",
    )
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "n_punct": pc.cast(n_punct, pa.int64()),
            "n_stopwords": pc.cast(stop_hits, pa.int64()),
            "punct_ratio": punct_ratio,
            "stopword_ratio": stop_ratio,
        }
    )


def quality_extended(docs_ds):
    return docs_ds.select_columns(["doc_id", "text"]).map_batches(
        quality_extended_batch, batch_format="pyarrow"
    )


def repetition_batch(batch: pa.Table) -> pa.Table:
    """Gopher-style repetition signals (Rae et al. 2021 §A1.1: documents
    dominated by repeated fragments are low-quality training data). The
    published rules measure duplicate line/paragraph and top-n-gram
    fractions; over single-line corpora the token-level trio carries the
    same signal:

    - ``dup_token_frac``  = (n_tokens - n_distinct) / n_tokens
    - ``top_token_frac``  = count of the most frequent token / n_tokens
      (Gopher's top-1-gram fraction)
    - ``top_bigram_frac`` = count of the most frequent adjacent pair /
      (n_tokens - 1) (Gopher's top-2-gram fraction)

    Vectorized: one dictionary-encode of the flattened token stream per
    chunk, then row-bucketed np.unique/bincount/maximum.at over packed
    (row, code) int64 keys — no per-row Python. Fractions are rounded
    half-away like SQL round() (the driver's bitwise float compare)."""
    text = pc.utf8_lower(batch["text"])
    toks_col = pc.split_pattern(text, " ")
    n_tokens = pc.list_value_length(toks_col).to_numpy(zero_copy_only=False)

    chunks = (
        toks_col.chunks
        if isinstance(toks_col, pa.ChunkedArray)
        else [toks_col]
    )
    nd_parts, top1_parts, top2_parts = [], [], []
    for chunk in chunks:
        flat = chunk.flatten()
        offsets = chunk.offsets.to_numpy()
        counts = offsets[1:] - offsets[:-1]
        nrows = len(counts)
        enc = pc.dictionary_encode(flat)
        if isinstance(enc, pa.ChunkedArray):
            enc = enc.combine_chunks()
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        row_id = np.repeat(np.arange(nrows, dtype=np.int64), counts)
        k = int(codes.max()) + 1 if len(codes) else 1
        uniq, cnt = np.unique(row_id * k + codes, return_counts=True)
        urow = uniq // k
        nd_parts.append(np.bincount(urow, minlength=nrows))
        top1 = np.zeros(nrows, dtype=np.int64)
        np.maximum.at(top1, urow, cnt)
        top1_parts.append(top1)
        # adjacent pairs within a row: (code_i, code_{i+1}) packed on top
        # of the row key; k is bounded by the batch vocabulary so
        # row*k^2 + a*k + b stays far inside int64
        same = row_id[1:] == row_id[:-1]
        brow = row_id[:-1][same]
        bkey = (brow * k + codes[:-1][same]) * k + codes[1:][same]
        ub, cb = np.unique(bkey, return_counts=True)
        top2 = np.zeros(nrows, dtype=np.int64)
        np.maximum.at(top2, (ub // k) // k, cb)
        top2_parts.append(top2)

    n_distinct = np.concatenate(nd_parts) if nd_parts else np.array([], np.int64)
    top1 = np.concatenate(top1_parts) if top1_parts else np.array([], np.int64)
    top2 = np.concatenate(top2_parts) if top2_parts else np.array([], np.int64)

    def _frac(num, den):
        return pc.round(
            pc.divide(
                pc.cast(pa.array(num, pa.int64()), pa.float64()),
                pc.cast(pa.array(den, pa.int64()), pa.float64()),
            ),
            ndigits=4,
            round_mode="half_towards_infinity",
        )

    n_safe = np.maximum(n_tokens, 1)
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "n_tokens": pa.array(n_tokens.astype(np.int64), pa.int64()),
            "n_distinct_tokens": pa.array(n_distinct, pa.int64()),
            "dup_token_frac": _frac(n_tokens - n_distinct, n_safe),
            "top_token_frac": _frac(top1, n_safe),
            "top_bigram_frac": _frac(top2, np.maximum(n_tokens - 1, 1)),
        }
    )


def repetition_signals(docs_ds):
    return docs_ds.select_columns(["doc_id", "text"]).map_batches(
        repetition_batch, batch_format="pyarrow"
    )


def _distinct_row_ngrams(toks_col, n: int):
    """Yield (row_ids, grams) per chunk: the DISTINCT space-joined n-grams
    of each row's token list, vectorized (flatten + shifted-slice join +
    packed-key np.unique; no per-row Python)."""
    chunks = (
        toks_col.chunks
        if isinstance(toks_col, pa.ChunkedArray)
        else [toks_col]
    )
    row_base = 0
    for chunk in chunks:
        flat = chunk.flatten()
        offsets = chunk.offsets.to_numpy()
        counts = offsets[1:] - offsets[:-1]
        nrows = len(counts)
        enc = pc.dictionary_encode(flat)
        if isinstance(enc, pa.ChunkedArray):
            enc = enc.combine_chunks()
        vocab = enc.dictionary
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        row_id = np.repeat(np.arange(nrows, dtype=np.int64), counts)
        k = int(codes.max()) + 1 if len(codes) else 1
        # windows of n consecutive tokens that stay inside one row
        if len(codes) >= n and k ** n < (1 << 62):
            ok = np.ones(len(codes) - n + 1, dtype=bool)
            for j in range(1, n):
                ok &= row_id[j:len(row_id) - n + 1 + j] == row_id[:len(row_id) - n + 1]
            key = row_id[: len(ok)].copy()
            for j in range(n):
                key = key * k + codes[j: len(ok) + j]
            key = key[ok]
            uniq = np.unique(key)
            # unpack codes back out of the key (base-k digits)
            parts = []
            rest = uniq.copy()
            for _ in range(n):
                parts.append(rest % k)
                rest //= k
            urow = rest
            toks = [vocab.take(pa.array(p, pa.int64())) for p in parts[::-1]]
            gram = toks[0]
            for t in toks[1:]:
                gram = pc.binary_join_element_wise(gram, t, " ")
            yield urow + row_base, gram
        else:
            yield (np.array([], np.int64),
                   pa.array([], pa.string()))
        row_base += nrows


def benchmark_ngrams(docs_ds, n: int = 3):
    """The DISTINCT n-gram set of a (small) benchmark corpus, as one
    pyarrow StringArray on the driver. Benchmark/eval sets are tiny
    relative to the training corpus — this is the broadcast side."""
    grams = set()
    for batch in docs_ds.select_columns(["text"]).iter_batches(
        batch_format="pyarrow"
    ):
        toks = pc.split_pattern(pc.utf8_lower(batch["text"]), " ")
        for _rows, g in _distinct_row_ngrams(toks, n):
            grams.update(g.to_pylist())
    return pa.array(sorted(grams), pa.string())


class ContaminationFlags:
    """Actor-pool stage: flag training docs sharing >= 1 n-gram with a
    benchmark set (eval-set decontamination — the standard pre-training
    hygiene pass; e.g. GPT-3 App. C / PaLM-style 13-gram filtering,
    here parameterized). The benchmark n-gram set rides the object store
    once (``ray.put`` in :func:`contamination_flags`) and each actor
    resolves it ONCE in ``__init__`` — never per batch."""

    def __init__(self, grams_ref, n: int):
        import ray

        self._value_set = (
            ray.get(grams_ref) if not isinstance(grams_ref, pa.Array)
            else grams_ref
        )
        self._n = n

    def __call__(self, batch: pa.Table) -> pa.Table:
        toks = pc.split_pattern(pc.utf8_lower(batch["text"]), " ")
        shared = np.zeros(len(batch), dtype=np.int64)
        for rows, grams in _distinct_row_ngrams(toks, self._n):
            if len(grams) == 0:
                continue
            hit = pc.is_in(grams, value_set=self._value_set).to_numpy(
                zero_copy_only=False
            ).astype(np.int64)
            np.add.at(shared, rows, hit)
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "n_shared_ngrams": pa.array(shared, pa.int64()),
                "contaminated": pa.array(
                    (shared > 0).astype(np.int64), pa.int64()
                ),
            }
        )


def contamination_flags(docs_ds, bench_grams: pa.Array, n: int = 3,
                        concurrency: int = 4):
    """Per-doc shared-n-gram count + contaminated flag against a broadcast
    benchmark n-gram set."""
    import ray

    ref = ray.put(bench_grams)
    return docs_ds.select_columns(["doc_id", "text"]).map_batches(
        ContaminationFlags,
        fn_constructor_kwargs={"grams_ref": ref, "n": n},
        concurrency=concurrency,
        batch_format="pyarrow",
    )


def _fnv1a64_strings(arr: pa.Array) -> np.ndarray:
    """Vectorized 64-bit FNV-1a over a pyarrow StringArray: one numpy
    pass per byte POSITION (max string length iterations, each over the
    still-alive subset) instead of one Python hash call per string.
    Returns non-negative int64 (top bit cleared)."""
    if len(arr) == 0:
        return np.array([], dtype=np.int64)
    arr = arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr
    buf_off = arr.buffers()[1]
    buf_dat = arr.buffers()[2]
    offs = np.frombuffer(buf_off, dtype=np.int32,
                         count=len(arr) + 1 + arr.offset)[arr.offset:]
    data = (np.frombuffer(buf_dat, dtype=np.uint8)
            if buf_dat is not None else np.array([], np.uint8))
    starts = offs[:-1].astype(np.int64)
    lens = (offs[1:] - offs[:-1]).astype(np.int64)
    h = np.full(len(arr), np.uint64(0xCBF29CE484222325))
    prime = np.uint64(0x100000001B3)
    alive = np.arange(len(arr))
    j = 0
    maxlen = int(lens.max()) if len(lens) else 0
    while j < maxlen:
        alive = alive[lens[alive] > j]
        if not len(alive):
            break
        b = data[starts[alive] + j].astype(np.uint64)
        h[alive] = (h[alive] ^ b) * prime
        j += 1
    return (h >> np.uint64(1)).astype(np.int64)


def dup_ngram_stats(docs_ds, n: int = 8, n_shards: int = 256):
    """Corpus-wide duplicated-substring census (the signal behind exact
    substring dedup, Lee et al. 2022 'Deduplicating Training Data Makes
    Language Models Better': long token spans shared verbatim across
    documents mark boilerplate/mirrored text). Per doc: how many of its
    DISTINCT ``n``-token grams also occur in at least one OTHER doc.

    Shape: grams never leave the workers as strings — each batch emits
    (gram_hash int64, doc_id) rows for its per-row DISTINCT grams (the
    vectorized FNV-1a hash stands in for Lee et al.'s suffix-array
    match; a 63-bit collision over G corpus grams perturbs counts with
    probability ~G²/2⁶³ — negligible, and only ±1 on one doc's count).
    The gram-level reduce is SHARD-keyed, not gram-keyed: Ray's
    groupby costs a Python call per group, so millions of mostly-unique
    gram groups would serialize — instead grams hash into ``n_shards``
    buckets (every copy of a gram meets in exactly one shard), one
    groupby(shard).map_groups processes each shard with vectorized
    np.unique, and emits per-(shard, doc) partial sums. A second
    doc-sharded vectorized reduce folds the partials (zero-gram docs
    union in as zero rows so every doc appears). Size ``n_shards`` so
    one shard's (gram_h, doc_id) rows fit a worker's heap: ~corpus
    grams / n_shards * 16 bytes.

    Returns (doc_id, n_grams, n_shared_grams); n_grams counts DISTINCT
    grams per doc."""

    def gram_rows(batch: pa.Table) -> pa.Table:
        toks = pc.split_pattern(pc.utf8_lower(batch["text"]), " ")
        doc_ids = batch["doc_id"].to_numpy()
        out_doc, out_h = [], []
        for rows, grams in _distinct_row_ngrams(toks, n):
            if not len(rows):
                continue
            out_doc.append(doc_ids[rows])
            out_h.append(_fnv1a64_strings(grams))
        if not out_doc:
            return pa.table(
                {"shard": pa.array([], pa.int64()),
                 "gram_h": pa.array([], pa.int64()),
                 "doc_id": pa.array([], pa.int64())}
            )
        h = np.concatenate(out_h)
        return pa.table(
            {
                "shard": pa.array(h % n_shards, pa.int64()),
                "gram_h": pa.array(h, pa.int64()),
                "doc_id": pa.array(np.concatenate(out_doc), pa.int64()),
            }
        )

    def shard_partials(group: pa.Table) -> pa.Table:
        # rows are globally distinct per (doc, gram): gram_rows dedups
        # within a doc and each doc lives in exactly one input row
        g = group["gram_h"].to_numpy()
        d = group["doc_id"].to_numpy()
        _, inv, cnt = np.unique(g, return_inverse=True, return_counts=True)
        shared = (cnt[inv] >= 2).astype(np.int64)
        ud, dinv = np.unique(d, return_inverse=True)
        return pa.table(
            {
                "doc_id": pa.array(ud, pa.int64()),
                "dshard": pa.array(ud % n_shards, pa.int64()),
                "n_grams": pa.array(
                    np.bincount(dinv).astype(np.int64), pa.int64()),
                "n_shared_grams": pa.array(
                    np.bincount(dinv, weights=shared).astype(np.int64),
                    pa.int64()),
            }
        )

    def zero_rows(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy()
        z = pa.array(np.zeros(len(ids), np.int64), pa.int64())
        return pa.table(
            {"doc_id": batch["doc_id"],
             "dshard": pa.array(ids % n_shards, pa.int64()),
             "n_grams": z, "n_shared_grams": z}
        )

    def doc_totals(group: pa.Table) -> pa.Table:
        d = group["doc_id"].to_numpy()
        ud, dinv = np.unique(d, return_inverse=True)
        return pa.table(
            {
                "doc_id": pa.array(ud, pa.int64()),
                "n_grams": pa.array(
                    np.bincount(
                        dinv, weights=group["n_grams"].to_numpy()
                    ).astype(np.int64), pa.int64()),
                "n_shared_grams": pa.array(
                    np.bincount(
                        dinv, weights=group["n_shared_grams"].to_numpy()
                    ).astype(np.int64), pa.int64()),
            }
        )

    partials = (
        docs_ds.select_columns(["doc_id", "text"])
        .map_batches(gram_rows, batch_format="pyarrow")
        .groupby("shard")
        .map_groups(shard_partials, batch_format="pyarrow")
    )
    zeros = docs_ds.select_columns(["doc_id"]).map_batches(
        zero_rows, batch_format="pyarrow"
    )
    return (
        partials.union(zeros)
        .groupby("dshard")
        .map_groups(doc_totals, batch_format="pyarrow")
    )


# train/val/test boundaries on the first two hex chars of md5(text):
# < "cc" (204/256 = 79.7%) train, < "e6" (230/256 = 89.8%) val, else test.
SPLIT_BOUNDS = (("cc", "train"), ("e6", "val"), (None, "test"))


def split_census(docs_ds):
    """Deterministic train/val/test stratified-split census: split
    assignment hashes the CONTENT (md5 of text — stable under re-sharding
    and id reassignment, the property a reproducible corpus split needs),
    census = docs + total characters per split.

    Scale shape: hashing + bucketing happen in map_batches; only 3
    partial rows per batch reach the (3-key) groupby."""
    import hashlib

    def partials(batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        nchars = pc.utf8_length(batch["text"]).to_numpy()
        counts = {name: 0 for _, name in SPLIT_BOUNDS}
        chars = {name: 0 for _, name in SPLIT_BOUNDS}
        for t, nc in zip(texts, nchars):
            h2 = hashlib.md5(t.encode("utf-8")).hexdigest()[:2]
            for bound, name in SPLIT_BOUNDS:
                if bound is None or h2 < bound:
                    counts[name] += 1
                    chars[name] += int(nc)
                    break
        names = [n for _, n in SPLIT_BOUNDS]
        return pa.table({
            "split": pa.array(names, pa.string()),
            "n_docs": pa.array([counts[n] for n in names], pa.int64()),
            "n_chars": pa.array([chars[n] for n in names], pa.int64()),
        })

    def merge(group: pa.Table) -> pa.Table:
        n = int(group["n_docs"].to_numpy().sum())
        # a globally-empty split emits nothing (SQL GROUP BY semantics)
        names = [group["split"][0].as_py()] if n else []
        return pa.table({
            "split": pa.array(names, pa.string()),
            "n_docs": pa.array([n] if n else [], pa.int64()),
            "n_chars": pa.array(
                [int(group["n_chars"].to_numpy().sum())] if n else [],
                pa.int64()),
        })

    return (
        docs_ds.map_batches(partials, batch_format="pyarrow")
        .groupby("split")
        .map_groups(merge, batch_format="pyarrow")
    )


# ---------------------------------------------------------------------------
# PII redaction
# ---------------------------------------------------------------------------

# Redaction rule set, applied IN ORDER (the order is part of the operator's
# definition: email first so an address is consumed whole before the IP rule
# can claim a numeric host, card before phone so a 4-4-4-4 digit run is never
# re-parsed as 3-3-4). RE2 syntax — pyarrow and DuckDB embed the same engine,
# so the SQL oracle redacts identically (leftmost non-overlapping matches).
PII_PATTERNS = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ssn", r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b", "<SSN>"),
    ("card", r"\b[0-9]{4}[- ][0-9]{4}[- ][0-9]{4}[- ][0-9]{4}\b", "<CARD>"),
    ("phone", r"\b[0-9]{3}[-. ][0-9]{3}[-. ][0-9]{4}\b", "<PHONE>"),
    ("ipv4", r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b", "<IP>"),
)


def pii_redact_batch(batch: pa.Table, col: str = "text") -> pa.Table:
    """(doc_id, clean_text, n_redactions): scrub emails / SSNs / card
    numbers / phone numbers / IPv4 addresses to typed placeholder tokens.

    Fully vectorized — one pc.count_substring_regex + one
    pc.replace_substring_regex kernel per rule per batch, no Python per
    row. Counts are taken on the intermediate string each rule actually
    sees, so n_redactions equals the number of placeholders inserted.

    Scale shape: a pure map stage (no shuffle); compiled-regex state lives
    in Arrow's kernel, so the plain-function form is enough (no actor pool
    needed)."""
    cleaned = batch[col]
    counts = None
    for _, pat, repl in PII_PATTERNS:
        c = pc.count_substring_regex(cleaned, pat)
        counts = c if counts is None else pc.add(counts, c)
        cleaned = pc.replace_substring_regex(cleaned, pat, repl)
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "clean_text": cleaned,
            "n_redactions": pc.cast(counts, pa.int64()),
        }
    )


# ---------------------------------------------------------------------------
# sequence packing — documents -> fixed-length training sequences
# ---------------------------------------------------------------------------

def sequence_pack(docs_ds, seq_len: int = 512, n_shards: int = 8):
    """Distributed sequence packing: assign every document to the
    fixed-length training sequences its tokens fill under deterministic
    concat-packing — the step that turns a curated corpus into model
    input. Docs shard by ``doc_id % n_shards``; within a shard they
    concatenate in doc_id order and the token stream is chunked every
    ``seq_len`` tokens (tokens = single-space split, the same count
    doc_token_count oracles).

    Output per doc: (doc_id, shard, n_tokens, start_tok, seq_first,
    seq_last) — start_tok is the doc's offset in its shard's token
    stream, seq_first/seq_last the 0-based ids of the sequences it spans
    (a doc crossing a boundary is split across both, standard
    concat-and-chunk packing).

    Scale shape: the scan carries only (doc_id, n_tokens) — 16 bytes/doc
    — into ONE shard-keyed groupby; the cumulative sum is per shard.
    Packing is inherently sequential within a pack stream; sharding is
    the parallelism (pick n_shards ~ cluster slots at 100 TB; each
    stream's docs just need to fit one worker as two int64 columns).
    SQL parity: a window cumsum — oracle_sql()["seq_pack"].
    """
    nsh = int(n_shards)
    L = int(seq_len)

    def counts(batch: pa.Table) -> pa.Table:
        n = pc.cast(
            pc.list_value_length(pc.split_pattern(batch["text"], " ")),
            pa.int64())
        did = batch["doc_id"].to_numpy()
        return pa.table({
            "doc_id": batch["doc_id"],
            "shard": pa.array(did % nsh, pa.int64()),
            "n_tokens": n,
        })

    def pack(group: pa.Table) -> pa.Table:
        did = group["doc_id"].to_numpy()
        n = group["n_tokens"].to_numpy()
        order = np.argsort(did)  # doc_id order defines the stream
        did, n = did[order], n[order]
        cum = np.cumsum(n)
        start = cum - n
        return pa.table({
            "doc_id": pa.array(did, pa.int64()),
            "shard": group["shard"].slice(0, 1).to_numpy().repeat(len(did)),
            "n_tokens": pa.array(n, pa.int64()),
            "start_tok": pa.array(start, pa.int64()),
            "seq_first": pa.array(start // L, pa.int64()),
            "seq_last": pa.array((cum - 1) // L, pa.int64()),
        })

    return (
        docs_ds.map_batches(counts, batch_format="pyarrow")
        .groupby("shard")
        .map_groups(pack, batch_format="pyarrow")
    )


def tfidf_topk(docs_ds, k: int = 3, broadcast_limit: int = 2_000_000):
    """Per-document top-k TF-IDF terms (the classic relevance/keyword
    extraction pass): tf from a per-batch Arrow group_by (only distinct
    (doc, term) pairs leave the batch), document frequency from ONE
    groupby over those pairs, idf broadcast back when the vocabulary is
    small (ray.put, searchsorted lookup — no per-row Python) or joined on
    the term key when it is not (size-aware dispatch, same pattern as
    revenue_by_priority), then a per-doc top-k groupby.

    score = tf * ln(N / df), rounded like SQL round(x, 6); idf values are
    computed per DISTINCT df with math.log so the engine and a DuckDB
    oracle run the same libm call.
    """
    import math

    import ray
    import ray.data

    def tf_partial(batch: pa.Table) -> pa.Table:
        toks = pc.split_pattern(batch["text"], pattern=" ")
        flat = pc.list_flatten(toks)
        parent = pc.list_parent_indices(toks)
        pairs = pa.table({"i": parent, "term": flat})
        g = pairs.group_by(["i", "term"]).aggregate([("term", "count")])
        return pa.table({
            "doc_id": batch["doc_id"].take(g["i"]),
            "term": g["term"],
            "tf": pc.cast(g["term_count"], pa.int64()),
        })

    tf_ds = docs_ds.select_columns(["doc_id", "text"]).map_batches(
        tf_partial, batch_format="pyarrow"
    ).materialize()
    n_docs = docs_ds.count()

    # document frequency per term — Ray's groupby().count() pays one
    # Python call per VOCABULARY entry; bounded FNV term partitions +
    # Arrow C++ hash-aggregate instead (same ("term", "count()") schema)
    df_parts = 256

    def df_part(batch: pa.Table) -> pa.Table:
        part = _fnv1a64_strings(
            batch["term"].combine_chunks()
        ) % np.int64(df_parts)
        return batch.append_column("part", pa.array(part, pa.int64()))

    def df_fold(group: pa.Table) -> pa.Table:
        g = (
            group.select(["term"])
            .group_by("term")
            .aggregate([("term", "count")])
        )
        return pa.table({
            "term": g["term"],
            "count()": g["term_count"].cast(pa.int64()),
        })

    df_ds = (
        tf_ds.map_batches(df_part, batch_format="pyarrow")
        .groupby("part")
        .map_groups(df_fold, batch_format="pyarrow")
        .materialize()
    )
    vocab = df_ds.count()

    def idf_of(df_arr: np.ndarray) -> np.ndarray:
        # one math.log per DISTINCT df (libm-identical to DuckDB's ln)
        uniq, inv = np.unique(df_arr, return_inverse=True)
        vals = np.array([math.log(n_docs / int(d)) for d in uniq])
        return vals[inv]

    if vocab <= broadcast_limit:
        blocks = [t for t in ray.get(df_ds.to_arrow_refs())
                  if t.num_rows > 0]  # groupby can emit empty-schema blocks
        df_tbl = pa.concat_tables(blocks).combine_chunks()
        terms = np.asarray(df_tbl["term"].to_pylist())
        order = np.argsort(terms)
        terms_ref = ray.put(terms[order])
        idf_ref = ray.put(
            idf_of(df_tbl["count()"].to_numpy().astype(np.int64)[order])
        )

        def score(batch: pa.Table) -> pa.Table:
            t_sorted = ray.get(terms_ref)
            idf = ray.get(idf_ref)
            bt = np.asarray(batch["term"].to_pylist())
            pos = np.searchsorted(t_sorted, bt)
            raw = batch["tf"].to_numpy().astype(np.float64) * idf[pos]
            return batch.append_column(
                "score_raw", pa.array(raw, pa.float64())
            )

        scored = tf_ds.map_batches(score, batch_format="pyarrow")
    else:
        # partitions capped to the cluster's CPU slots — Ray's hash join
        # stalls when num_partitions far exceeds them (CLAUDE.md)
        nparts = max(2, min(16, int(ray.cluster_resources().get("CPU", 8))))
        joined = tf_ds.join(
            df_ds, join_type="inner", num_partitions=nparts, on=("term",)
        )

        def score_joined(batch: pa.Table) -> pa.Table:
            idf = idf_of(batch["count()"].to_numpy().astype(np.int64))
            raw = batch["tf"].to_numpy().astype(np.float64) * idf
            return batch.drop_columns(["count()"]).append_column(
                "score_raw", pa.array(raw, pa.float64())
            )

        scored = joined.map_batches(score_joined, batch_format="pyarrow")

    # per-doc top-k on a BOUNDED doc-partition key: grouping on raw doc_id
    # pays one Python call per document (the per-key overhead that made
    # winnow_pairs 4x slower); one lexsort per partition group ranks every
    # doc's terms at once
    n_partitions = 256

    def add_part(batch: pa.Table) -> pa.Table:
        part = batch["doc_id"].to_numpy() % np.int64(n_partitions)
        return batch.append_column("part", pa.array(part, pa.int64()))

    def topk(group: pa.Table) -> pa.Table:
        empty = pa.table({
            "doc_id": pa.array([], pa.int64()),
            "term": pa.array([], pa.string()),
            "tf": pa.array([], pa.int64()),
            "score": pa.array([], pa.float64()),
            "rn": pa.array([], pa.int64()),
        })
        if group.num_rows == 0:
            return empty
        terms = np.asarray(group["term"].to_pylist())
        raw = group["score_raw"].to_numpy()
        doc = group["doc_id"].to_numpy()
        order = np.lexsort((terms, -raw, doc))
        sdoc = doc[order]
        starts = np.concatenate(([0], np.nonzero(np.diff(sdoc))[0] + 1))
        counts = np.diff(np.concatenate((starts, [sdoc.size])))
        rn = (
            np.arange(sdoc.size, dtype=np.int64)
            - np.repeat(starts, counts)
            + 1
        )
        keep = rn <= k
        g = group.take(pa.array(order[keep], pa.int64()))
        score6 = np.floor(g["score_raw"].to_numpy() * 1e6 + 0.5) / 1e6
        return pa.table({
            "doc_id": g["doc_id"],
            "term": g["term"],
            "tf": g["tf"],
            "score": pa.array(score6, pa.float64()),
            "rn": pa.array(rn[keep], pa.int64()),
        })

    return (
        scored.map_batches(add_part, batch_format="pyarrow")
        .groupby("part")
        .map_groups(topk, batch_format="pyarrow")
    )


def cap_per_key(docs_ds, key_col: str = "source", id_col: str = "doc_id",
                n: int = 10):
    """Deterministic per-key cap: keep the ``n`` rows ranked smallest by
    (md5(str(id)), id) within each key — the per-source capping pass a
    corpus-curation pipeline runs so no single crawl/domain dominates the
    training mix. Hash ranking makes the sample stable under re-sharding
    (the split_census property) and uniformly random per key.

    Combiner shape: each batch keeps at most ``n`` rows per key locally
    (sorted run-length walk, no per-key Python), so the groupby only
    shuffles capped partials; the final per-key top-n repeats the same
    selection."""
    import hashlib

    def local_cap(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        keys = np.asarray(batch[key_col].to_pylist())
        hs = np.asarray(
            [hashlib.md5(str(v).encode()).hexdigest() for v in ids]
        )
        order = np.lexsort((ids, hs, keys))
        ksort = keys[order]
        # first-n positions of each key run
        starts = np.concatenate(([0], np.nonzero(ksort[1:] != ksort[:-1])[0]
                                 + 1))
        runs = np.concatenate((starts[1:], [len(ksort)])) - starts
        offs = np.arange(len(ksort)) - np.repeat(starts, runs)
        sel = order[offs < n]
        return pa.table({
            key_col: pa.array(keys[sel], pa.string()),
            id_col: batch[id_col].take(pa.array(sel, pa.int64())),
            "h": pa.array(hs[sel], pa.string()),
        })

    # the final cap groups on a bounded FNV partition of the key (per-key
    # grouping pays one Python call per source/domain — unbounded for web
    # crawls) and ranks EVERY key's rows with one lexsort per group
    n_partitions = 256

    def add_part(batch: pa.Table) -> pa.Table:
        part = _fnv1a64_strings(
            batch[key_col].combine_chunks()
        ) % np.int64(n_partitions)
        return batch.append_column("part", pa.array(part, pa.int64()))

    def final_cap(group: pa.Table) -> pa.Table:
        empty = pa.table({
            key_col: pa.array([], pa.string()),
            id_col: pa.array([], pa.int64()),
            "rk": pa.array([], pa.int64()),
        })
        if group.num_rows == 0:
            return empty
        ids = group[id_col].to_numpy(zero_copy_only=False)
        hs = np.asarray(group["h"].to_pylist())
        keys = np.asarray(group[key_col].to_pylist())
        order = np.lexsort((ids, hs, keys))
        ksort = keys[order]
        starts = np.concatenate(
            ([0], np.nonzero(ksort[1:] != ksort[:-1])[0] + 1)
        )
        runs = np.concatenate((starts[1:], [len(ksort)])) - starts
        rk = np.arange(len(ksort), dtype=np.int64) - np.repeat(starts, runs)
        keep = rk < n
        g = group.take(pa.array(order[keep], pa.int64()))
        return pa.table({
            key_col: g[key_col],
            id_col: g[id_col],
            "rk": pa.array(rk[keep] + 1, pa.int64()),
        })

    return (
        docs_ds.select_columns([key_col, id_col])
        .map_batches(local_cap, batch_format="pyarrow")
        .map_batches(add_part, batch_format="pyarrow")
        .groupby("part")
        .map_groups(final_cap, batch_format="pyarrow")
    )


def train_bpe(docs_ds, vocab_size: int = 512, hex_lt: str = "ff",
              max_docs: int = 100_000):
    """Train a byte-level BPE merge table on a BOUNDED deterministic
    sample — the sample-fit pattern the IVF/PQ quantizers use: tokenizer
    training is a driver-local O(sample) problem; applying the trained
    table is the distributed pass (see bpe_tokenize).

    Sample = hash_sample(doc_id < hex_lt) capped at ``max_docs``, sorted
    by doc_id (order-deterministic under any sharding). Words are
    whitespace-split; merges start from the 256 byte tokens and greedily
    take the most frequent adjacent pair (ties: lexicographically
    smallest pair), stopping at vocab_size or when no pair repeats.
    Returns the ordered merge list [(bytes, bytes), ...].
    """
    from collections import Counter

    sample = hash_sample(
        docs_ds, "doc_id", hex_lt, columns=["doc_id", "text"]
    ).take(max_docs)
    sample.sort(key=lambda r: r["doc_id"])
    words: Counter = Counter()
    for r in sample:
        for w in r["text"].split():
            words[tuple(bytes([b]) for b in w.encode("utf-8"))] += 1
    merges = []
    words = dict(words)
    while len(merges) < max(vocab_size - 256, 0):
        pairs: Counter = Counter()
        for toks, f in words.items():
            for a, b in zip(toks, toks[1:]):
                pairs[(a, b)] += f
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if pairs[best] < 2:
            break
        merges.append(best)
        ab = best[0] + best[1]
        new_words = {}
        for toks, f in words.items():
            out = []
            k = 0
            while k < len(toks):
                if (k + 1 < len(toks) and toks[k] == best[0]
                        and toks[k + 1] == best[1]):
                    out.append(ab)
                    k += 2
                else:
                    out.append(toks[k])
                    k += 1
            t = tuple(out)
            new_words[t] = new_words.get(t, 0) + f
        words = new_words
    return merges


def _bpe_apply(word_bytes: bytes, ranks: dict) -> list:
    toks = [bytes([b]) for b in word_bytes]
    while len(toks) > 1:
        best_rank = None
        best_i = -1
        for i in range(len(toks) - 1):
            r = ranks.get((toks[i], toks[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank = r
                best_i = i
        if best_rank is None:
            break
        toks[best_i: best_i + 2] = [toks[best_i] + toks[best_i + 1]]
    return toks


class BpeTokenize:
    """Actor-pool stage: tokenize with a TRAINED merge table. The rank
    dict is built once per actor from the broadcast merges (ray.put ref)
    and a per-actor word cache amortizes the sequential BPE apply across
    repeated words — the standard tokenizer-serving shape."""

    def __init__(self, merges_ref):
        import ray

        merges = ray.get(merges_ref)
        self.ranks = {tuple(m): i for i, m in enumerate(merges)}
        self.cache: dict = {}

    def __call__(self, batch: pa.Table) -> pa.Table:
        n_out = []
        for text in batch["text"].to_pylist():
            total = 0
            for w in text.split():
                wb = w.encode("utf-8")
                n = self.cache.get(wb)
                if n is None:
                    n = len(_bpe_apply(wb, self.ranks))
                    self.cache[wb] = n
                total += n
            n_out.append(total)
        return pa.table({
            "doc_id": batch["doc_id"],
            "n_bpe_tokens": pa.array(n_out, pa.int64()),
        })


def bpe_tokenize(docs_ds, merges, *, concurrency=(1, 8),
                 batch_size: int = 64):
    """Distributed tokenization pass with a trained BPE table:
    (doc_id, n_bpe_tokens) per document."""
    import ray

    merges_ref = ray.put([tuple(m) for m in merges])
    return docs_ds.select_columns(["doc_id", "text"]).map_batches(
        BpeTokenize,
        fn_constructor_args=(merges_ref,),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )


def stratified_sample(docs_ds, hex_lt: str = "4", id_col: str = "doc_id"):
    """Deterministic hash sample: keep rows whose md5(str(id)) first hex
    digits sort below ``hex_lt`` (e.g. "4" ~ 25%). Hash-based sampling is
    stable under re-sharding and re-runs — the reproducible subsetting a
    training-mix pipeline needs (random_sample() would not replay). Pure
    per-batch filter, no shuffle."""
    import hashlib

    k = len(hex_lt)

    def keep(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        hs = np.asarray(
            [hashlib.md5(str(v).encode()).hexdigest()[:k] for v in ids]
        )
        return batch.filter(pa.array(hs < hex_lt))

    return docs_ds.map_batches(keep, batch_format="pyarrow")


def lm_train_bigram(docs_ds, hex_lt: str = "ff", max_docs: int = 100_000):
    """Train an add-k bigram language model on a BOUNDED deterministic
    hash sample (the train_bpe / quantizer sample-fit pattern): model
    fitting is a driver-local O(sample) problem; scoring is the
    distributed pass (LmPerplexity). Returns a plain-dict model
    {vocab: {tok: id}, uni: int64[V], bi: {(id1, id2): count},
    total: int} — small enough to ray.put once.

    This is the CCNet-style quality gate: score each document's
    cross-entropy under a reference-corpus n-gram LM and filter/bucket on
    it (the public Wikipedia-LM perplexity filter of CCNet/RedPajama —
    here the reference corpus is a hash sample of the input itself or any
    other documents table passed in)."""
    from collections import Counter

    sample = hash_sample(
        docs_ds, "doc_id", hex_lt, columns=["doc_id", "text"]
    ).take(max_docs)
    sample.sort(key=lambda r: r["doc_id"])
    uni: Counter = Counter()
    bi: Counter = Counter()
    for r in sample:
        toks = r["text"].split()
        uni.update(toks)
        bi.update(zip(toks, toks[1:]))
    vocab = {t: i for i, t in enumerate(sorted(uni))}
    uni_arr = np.zeros(len(vocab), dtype=np.int64)
    for t, c in uni.items():
        uni_arr[vocab[t]] = c
    bi_ids = {(vocab[a], vocab[b]): c for (a, b), c in bi.items()}
    return {"vocab": vocab, "uni": uni_arr, "bi": bi_ids,
            "total": int(uni_arr.sum())}


class LmPerplexity:
    """Actor-pool scoring stage: bits-per-token of each document under a
    broadcast bigram LM (model deserialized ONCE per actor in __init__).
    add-k smoothed: p(w2|w1) = (C(w1,w2)+k) / (C(w1)+k*(V+1)); unknown
    tokens map to a single UNK id with count 0. Emits (doc_id,
    n_tokens, bits_per_token)."""

    def __init__(self, model_ref, add_k: float = 0.5):
        import ray as _ray

        m = _ray.get(model_ref) if not isinstance(model_ref, dict) \
            else model_ref
        # vocab ids ARE the sorted-token order (lm_train_bigram sorts), so
        # a searchsorted over the sorted token array recovers the id — no
        # per-token dict.get in the hot loop.
        self.vtoks = np.array(sorted(m["vocab"]), dtype=object)
        self.uni = m["uni"]
        self.v = len(m["vocab"]) + 1  # + UNK
        self.k = add_k
        self.unk = len(m["vocab"])
        # bigram counts as a sorted packed-int64 key array (prev*v + nxt)
        # + parallel counts — lookups become one vectorized searchsorted.
        if m["bi"]:
            keys = np.fromiter(
                (a * self.v + b for a, b in m["bi"]), dtype=np.int64,
                count=len(m["bi"]),
            )
            cnts = np.fromiter(m["bi"].values(), dtype=np.int64,
                               count=len(m["bi"]))
            order = np.argsort(keys)
            self.bi_keys = keys[order]
            self.bi_cnts = cnts[order]
        else:
            self.bi_keys = np.empty(0, np.int64)
            self.bi_cnts = np.empty(0, np.int64)

    def __call__(self, batch: pa.Table) -> pa.Table:
        toks_per_doc = [t.split() for t in batch["text"].to_pylist()]
        lens = np.array([len(t) for t in toks_per_doc], dtype=np.int64)
        n_docs = len(lens)
        bpt = np.zeros(n_docs, dtype=np.float64)
        scorable = lens >= 2
        if scorable.any() and lens.sum() > 0:
            flat = np.concatenate(
                [np.asarray(t, dtype=object) for t in toks_per_doc
                 if t] or [np.empty(0, object)]
            )
            if len(self.vtoks):
                pos = np.searchsorted(self.vtoks, flat)
                pos_c = np.minimum(pos, len(self.vtoks) - 1)
                tid = np.where(self.vtoks[pos_c] == flat, pos_c,
                               self.unk).astype(np.int64)
            else:
                tid = np.full(len(flat), self.unk, dtype=np.int64)
            # bigram pairs live WITHIN documents: drop the pair positions
            # that straddle a doc boundary.
            ends = np.cumsum(lens)
            keep = np.ones(max(len(flat) - 1, 0), dtype=bool)
            bidx = ends[:-1] - 1  # pair position straddling each boundary
            keep[bidx[(bidx >= 0) & (bidx < len(keep))]] = False
            prev = tid[:-1][keep]
            nxt = tid[1:][keep]
            c1 = np.zeros(len(prev), dtype=np.int64)
            known = prev < len(self.uni)
            c1[known] = self.uni[prev[known]]
            packed = prev * self.v + nxt
            if len(self.bi_keys):
                loc = np.searchsorted(self.bi_keys, packed)
                loc_c = np.minimum(loc, len(self.bi_keys) - 1)
                cb = np.where(self.bi_keys[loc_c] == packed,
                              self.bi_cnts[loc_c], 0)
            else:
                cb = np.zeros(len(packed), dtype=np.int64)
            logp = np.log((cb + self.k) / (c1 + self.k * self.v))
            # per-doc segment sums over the kept-pair array
            n_pairs = np.maximum(lens - 1, 0)
            seg_ends = np.cumsum(n_pairs)
            seg_starts = seg_ends - n_pairs
            sums = np.add.reduceat(
                np.concatenate([logp, [0.0]]),
                np.minimum(seg_starts, len(logp)),
            )[:n_docs]
            sums[n_pairs == 0] = 0.0
            with np.errstate(invalid="ignore", divide="ignore"):
                bpt = np.where(
                    scorable,
                    -sums / np.maximum(n_pairs, 1) / np.log(2.0),
                    0.0,
                )
        return pa.table({
            "doc_id": batch["doc_id"],
            "n_tokens": pa.array(lens, pa.int64()),
            "bits_per_token": pa.array(np.round(bpt, 6), pa.float64()),
        })


def lm_perplexity(docs_ds, model=None, add_k: float = 0.5,
                  concurrency=(1, 8)):
    """Distributed bits-per-token scoring under a (sample-fit) bigram LM.
    The model broadcasts once via ray.put; actors hold it for their
    lifetime (stateful actor-pool stage). ``concurrency`` is an
    autoscaling (min, max) pool — a FIXED pool equal to the CPU count
    starves the upstream read and deadlocks on small clusters."""
    import ray as _ray

    if model is None:
        model = lm_train_bigram(docs_ds)
    ref = _ray.put(model)
    return docs_ds.select_columns(["doc_id", "text"]).map_batches(
        LmPerplexity, fn_constructor_args=(ref, add_k),
        batch_format="pyarrow", concurrency=concurrency,
    )


def mix_sample(docs_ds, rates: dict, default_rate: float = 0.0,
               id_col: str = "doc_id", source_col: str = "source"):
    """Training-mix construction: keep each source at its own target rate
    via the deterministic md5 predicate (source -> fraction in [0, 1]).
    The sampling decision is a pure function of (id, rate), so the mix is
    reproducible under re-sharding, resumable re-runs, and engine changes
    — the property a 100-TB training-mix rebuild needs. Rates quantize to
    1/16 steps (one hex digit) so the SQL oracle is the identical
    substr(md5(id), 1, 1) comparison."""
    import hashlib

    hex_digits = "0123456789abcdef"
    cut = {
        s: hex_digits[min(int(round(r * 16)), 16) - 1]
        if int(round(r * 16)) > 0 else ""
        for s, r in rates.items()
    }
    default_cut = hex_digits[min(int(round(default_rate * 16)), 16) - 1] \
        if int(round(default_rate * 16)) > 0 else ""

    def keep(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        srcs = batch[source_col].to_pylist()
        mask = np.empty(len(ids), dtype=bool)
        for i, (v, s) in enumerate(zip(ids, srcs)):
            c = cut.get(s, default_cut)
            mask[i] = bool(c) and \
                hashlib.md5(str(v).encode()).hexdigest()[0] <= c
        return batch.filter(pa.array(mask))

    return docs_ds.map_batches(keep, batch_format="pyarrow")


def tokens_by_source(docs_ds):
    """Per-source corpus token budget (token sum + doc count) — the cost
    accounting a training-mix decision starts from. Per-batch arrow
    group_by pre-aggregates, so one row per (source, batch) crosses the
    shuffle; a bounded FNV source partition folds partials with Arrow's
    C++ hash-aggregate (a raw per-source groupby pays one Python call per
    source — unbounded for web-domain sources)."""
    n_partitions = 256

    def partial(batch: pa.Table) -> pa.Table:
        n = pc.list_value_length(pc.split_pattern(batch["text"], " "))
        t = pa.table({
            "source": batch["source"],
            "n": pc.cast(n, pa.int64()),
        })
        g = t.group_by("source").aggregate([("n", "sum"), ("n", "count")])
        g = g.rename_columns(["source", "n_sum", "n_docs"])
        part = _fnv1a64_strings(
            g["source"].combine_chunks()
        ) % np.int64(n_partitions)
        return g.append_column("part", pa.array(part, pa.int64()))

    def final(group: pa.Table) -> pa.Table:
        g = (
            group.select(["source", "n_sum", "n_docs"])
            .group_by("source")
            .aggregate([("n_sum", "sum"), ("n_docs", "sum")])
        )
        return pa.table({
            "source": g["source"],
            "n_tokens": g["n_sum_sum"].cast(pa.int64()),
            "n_docs": g["n_docs_sum"].cast(pa.int64()),
        })

    return (
        docs_ds.select_columns(["source", "text"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("part")
        .map_groups(final, batch_format="pyarrow")
    )


def token_cooccurrence(
    docs_ds,
    min_count: int = 2,
    max_doc_tokens: int = 512,
    n_partitions: int = 256,
):
    """Corpus-wide token co-occurrence counts: pairs of DISTINCT tokens
    appearing together in a document (tok_a < tok_b lexicographically),
    counted over documents, kept at ``cnt >= min_count`` — the raw input
    to PMI / embedding-style association measures.

    Fully vectorized, no per-row Python: tokens dictionary-encode per
    batch, ranks sort by string so within-doc pair expansion (the same
    repeat/cumsum trick as ops/dedup.py) emits pairs already ordered;
    pyarrow value_counts pre-aggregates per batch, and the global count
    groups on a bounded FNV partition of the pair string with a bincount
    combine inside each group. ``max_doc_tokens`` drops documents with
    more distinct tokens than the bound — the quadratic fan-out guard
    (mirrored exactly by the SQL oracle, so the graded query is exact).
    """
    from .dedup import _pairs_from_sorted_groups

    sep = "\x1f"

    def pair_partials(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "pair": pa.array([], pa.string()),
                "cnt": pa.array([], pa.int64()),
                "part": pa.array([], pa.int64()),
            }
        )
        toks = pc.split_pattern(batch["text"], " ")
        flat = pc.list_flatten(toks)
        parent = pc.list_parent_indices(toks).to_numpy().astype(np.int64)
        keep = pc.not_equal(flat, pa.scalar("")).to_numpy(
            zero_copy_only=False
        )
        flat, parent = flat.filter(pa.array(keep)), parent[keep]
        if len(flat) == 0:
            return empty
        enc = flat.combine_chunks().dictionary_encode()
        codes = enc.indices.to_numpy().astype(np.int64)
        dic = np.asarray(enc.dictionary.to_pylist(), dtype=np.str_)
        order = np.argsort(dic, kind="stable")
        rank_of = np.empty(dic.size, np.int64)
        rank_of[order] = np.arange(dic.size, dtype=np.int64)
        ranks = rank_of[codes]
        sorted_dic = dic[order]
        # distinct (doc, token), doc-grouped with ranks ascending in-doc
        key = np.unique(parent * np.int64(dic.size) + ranks)
        kdoc = key // np.int64(dic.size)
        krank = key % np.int64(dic.size)
        starts = np.concatenate(([0], np.nonzero(np.diff(kdoc))[0] + 1))
        counts = np.diff(np.concatenate((starts, [kdoc.size])))
        ok = counts <= max_doc_tokens
        if not ok.any():
            return empty
        starts, counts = starts[ok], counts[ok]
        total = int(counts.sum())
        off = np.concatenate(([0], np.cumsum(counts)))[:-1]
        sel = (
            np.arange(total, dtype=np.int64)
            - np.repeat(off, counts)
            + np.repeat(starts, counts)
        )
        pk = _pairs_from_sorted_groups(krank[sel], counts)
        if pk.size == 0:
            return empty
        a = sorted_dic[pk >> np.int64(32)]
        b = sorted_dic[pk & np.int64(0xFFFFFFFF)]
        pair = pc.binary_join_element_wise(
            pa.array(a, pa.string()), pa.array(b, pa.string()), pa.scalar(sep)
        )
        vc = pc.value_counts(pair)
        pairs = vc.field("values")
        part = _fnv1a64_strings(pairs) % np.int64(n_partitions)
        return pa.table(
            {
                "pair": pairs,
                "cnt": vc.field("counts").cast(pa.int64()),
                "part": pa.array(part, pa.int64()),
            }
        )

    partials = docs_ds.select_columns(["text"]).map_batches(
        pair_partials, batch_format="pyarrow"
    )

    def final_count(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "tok_a": pa.array([], pa.string()),
                "tok_b": pa.array([], pa.string()),
                "cnt": pa.array([], pa.int64()),
            }
        )
        if group.num_rows == 0:
            return empty
        enc = group["pair"].combine_chunks().dictionary_encode()
        codes = enc.indices.to_numpy().astype(np.int64)
        cnt = group["cnt"].to_numpy()
        tot = np.zeros(len(enc.dictionary), np.int64)
        np.add.at(tot, codes, cnt)
        keep = tot >= min_count
        if not keep.any():
            return empty
        kept = pa.array(np.nonzero(keep)[0], pa.int64())
        split = pc.split_pattern(enc.dictionary.take(kept), sep)
        return pa.table(
            {
                "tok_a": pc.list_element(split, 0),
                "tok_b": pc.list_element(split, 1),
                "cnt": pa.array(tot[keep.nonzero()[0]], pa.int64()),
            }
        )

    return partials.groupby("part").map_groups(
        final_count, batch_format="pyarrow"
    )


def token_pmi(
    docs_ds,
    min_count: int = 2,
    max_doc_tokens: int = 512,
    n_partitions: int = 256,
    broadcast_limit: int = 2_000_000,
):
    """Pointwise mutual information over document co-occurrence:
    pmi(a, b) = ln( cnt_ab * N / (df_a * df_b) ) for every pair
    :func:`token_cooccurrence` keeps — the association-mining pass behind
    collocation extraction and phrase detection.

    The ln argument is an exact integer ratio evaluated with the same
    float64 division on both sides, one math.log per DISTINCT quotient
    (libm-identical to DuckDB's ln — the doc_tfidf discipline), rounded
    like SQL round(x, 6). Document frequencies come from one extra
    vectorized pass (FNV token partitions + Arrow C++ hash-aggregate) and
    broadcast sorted via ray.put; ``broadcast_limit`` guards the vocab
    size (swap in the tfidf join dispatch beyond it).
    """
    import math

    import ray

    pairs = token_cooccurrence(
        docs_ds, min_count=min_count, max_doc_tokens=max_doc_tokens,
        n_partitions=n_partitions,
    )

    def df_partials(batch: pa.Table) -> pa.Table:
        # the "" sentinel row carries this batch's guard-passing doc count
        # (zero-token docs pass the guard but appear in no token row — the
        # SQL N counts them); "" can never be a real token (filtered)
        def with_sentinel(tok_np, cc, n_guard):
            tok = pa.array(
                np.concatenate((np.array([""], dtype=tok_np.dtype)
                                if tok_np.size else np.array([""]),
                                tok_np)),
                pa.string(),
            )
            df = pa.array(
                np.concatenate(([0], cc)).astype(np.int64), pa.int64()
            )
            nd = np.zeros(len(tok), np.int64)
            nd[0] = n_guard
            part = _fnv1a64_strings(tok) % np.int64(n_partitions)
            return pa.table({
                "tok": tok,
                "df": df,
                "n_docs": pa.array(nd, pa.int64()),
                "part": pa.array(part, pa.int64()),
            })

        toks = pc.split_pattern(batch["text"], " ")
        flat = pc.list_flatten(toks)
        parent = pc.list_parent_indices(toks).to_numpy().astype(np.int64)
        keep = pc.not_equal(flat, pa.scalar("")).to_numpy(
            zero_copy_only=False
        )
        flat, parent = flat.filter(pa.array(keep)), parent[keep]
        if len(flat) == 0:
            return with_sentinel(
                np.array([], dtype=np.str_), np.array([], np.int64),
                batch.num_rows,
            )
        enc = flat.combine_chunks().dictionary_encode()
        codes = enc.indices.to_numpy().astype(np.int64)
        dic = np.asarray(enc.dictionary.to_pylist(), dtype=np.str_)
        key = np.unique(parent * np.int64(dic.size) + codes)
        kdoc = key // np.int64(dic.size)
        starts = np.concatenate(([0], np.nonzero(np.diff(kdoc))[0] + 1))
        counts = np.diff(np.concatenate((starts, [kdoc.size])))
        ok = counts <= max_doc_tokens  # same guard as the pair pass
        n_guard = int(ok.sum()) + (batch.num_rows - starts.size)
        total = int(counts[ok].sum())
        if total == 0:
            return with_sentinel(
                np.array([], dtype=np.str_), np.array([], np.int64),
                n_guard,
            )
        off = np.concatenate(([0], np.cumsum(counts[ok])))[:-1]
        sel = (
            np.arange(total, dtype=np.int64)
            - np.repeat(off, counts[ok])
            + np.repeat(starts[ok], counts[ok])
        )
        kept_codes = key[sel] % np.int64(dic.size)
        uc, cc = np.unique(kept_codes, return_counts=True)
        return with_sentinel(dic[uc], cc, n_guard)

    def df_fold(group: pa.Table) -> pa.Table:
        g = (
            group.select(["tok", "df", "n_docs"])
            .group_by("tok")
            .aggregate([("df", "sum"), ("n_docs", "sum")])
        )
        return pa.table({
            "tok": g["tok"],
            "df": g["df_sum"].cast(pa.int64()),
            "n_docs": g["n_docs_sum"].cast(pa.int64()),
        })

    df_ds = (
        docs_ds.select_columns(["text"])
        .map_batches(df_partials, batch_format="pyarrow")
        .groupby("part")
        .map_groups(df_fold, batch_format="pyarrow")
        .materialize()
    )
    vocab = df_ds.count()
    if vocab > broadcast_limit:
        raise NotImplementedError(
            "token_pmi: vocabulary exceeds broadcast_limit — wire the "
            "tfidf join dispatch for this corpus"
        )
    blocks = [t for t in ray.get(df_ds.to_arrow_refs()) if t.num_rows > 0]
    df_tbl = pa.concat_tables(blocks).combine_chunks()
    n_docs = int(df_tbl["n_docs"].to_numpy().sum())
    real = pc.greater(df_tbl["df"], 0)  # drop the "" n_docs sentinel
    df_tbl = df_tbl.filter(real)
    toks = np.asarray(df_tbl["tok"].to_pylist())
    order = np.argsort(toks)
    toks_ref = ray.put(toks[order])
    df_ref = ray.put(df_tbl["df"].to_numpy().astype(np.int64)[order])

    def score(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({
                "tok_a": pa.array([], pa.string()),
                "tok_b": pa.array([], pa.string()),
                "cnt": pa.array([], pa.int64()),
                "pmi": pa.array([], pa.float64()),
            })
        t_sorted = ray.get(toks_ref)
        df = ray.get(df_ref)
        ta = np.asarray(batch["tok_a"].to_pylist())
        tb = np.asarray(batch["tok_b"].to_pylist())
        cnt = batch["cnt"].to_numpy()
        da = df[np.searchsorted(t_sorted, ta)]
        db = df[np.searchsorted(t_sorted, tb)]
        q = (cnt * np.int64(n_docs)).astype(np.float64) / (
            da * db
        ).astype(np.float64)
        uq, inv = np.unique(q, return_inverse=True)
        lnv = np.array([math.log(x) for x in uq])  # one libm call per
        # DISTINCT quotient (exact integer ratio — matches DuckDB ln)
        pmi = pc.round(
            pa.array(lnv[inv], pa.float64()), 6,
            round_mode="half_towards_infinity",
        )
        return pa.table({
            "tok_a": batch["tok_a"],
            "tok_b": batch["tok_b"],
            "cnt": batch["cnt"],
            "pmi": pmi,
        })

    return pairs.map_batches(score, batch_format="pyarrow")


def bigram_phrases(
    docs_ds,
    min_count: int = 2,
    n_partitions: int = 256,
    broadcast_limit: int = 2_000_000,
):
    """Adjacent-bigram collocation scores (the word2vec phrase-detection
    pass, Mikolov et al. 2013): for every ordered bigram (a, b) adjacent in
    a document at least ``min_count`` times,
    score = ln( cnt_ab * T / (cnt_a * cnt_b) ) with T the corpus token
    count — high scores mark "new_york"-style phrases worth merging before
    tokenizer training.

    Same exactness discipline as :func:`token_pmi`: integer ratios, one
    libm ln per distinct quotient, SQL-style round to 6. Bigrams and
    unigrams both count through per-batch Arrow value_counts partials +
    bounded FNV partition folds; unigram totals broadcast via ray.put
    (``broadcast_limit`` guards the vocab).
    """
    import math

    import ray

    sep = "\x1f"

    def uni_partials(batch: pa.Table) -> pa.Table:
        empty = pa.table({
            "tok": pa.array([], pa.string()),
            "n": pa.array([], pa.int64()),
            "part": pa.array([], pa.int64()),
        })
        flat = pc.list_flatten(pc.split_pattern(batch["text"], " "))
        flat = flat.filter(pc.not_equal(flat, pa.scalar("")))
        if len(flat) == 0:
            return empty
        vc = pc.value_counts(flat.combine_chunks())
        tok = vc.field("values")
        part = _fnv1a64_strings(tok) % np.int64(n_partitions)
        return pa.table({
            "tok": tok,
            "n": vc.field("counts").cast(pa.int64()),
            "part": pa.array(part, pa.int64()),
        })

    def uni_fold(group: pa.Table) -> pa.Table:
        g = (
            group.select(["tok", "n"])
            .group_by("tok")
            .aggregate([("n", "sum")])
        )
        return pa.table({"tok": g["tok"], "n": g["n_sum"].cast(pa.int64())})

    uni_ds = (
        docs_ds.select_columns(["text"])
        .map_batches(uni_partials, batch_format="pyarrow")
        .groupby("part")
        .map_groups(uni_fold, batch_format="pyarrow")
        .materialize()
    )
    if uni_ds.count() > broadcast_limit:
        raise NotImplementedError(
            "bigram_phrases: vocabulary exceeds broadcast_limit — wire the "
            "tfidf join dispatch for this corpus"
        )
    blocks = [t for t in ray.get(uni_ds.to_arrow_refs()) if t.num_rows > 0]
    uni_tbl = pa.concat_tables(blocks).combine_chunks()
    toks = np.asarray(uni_tbl["tok"].to_pylist())
    order = np.argsort(toks)
    counts_sorted = uni_tbl["n"].to_numpy().astype(np.int64)[order]
    total_tokens = int(counts_sorted.sum())
    toks_ref = ray.put(toks[order])
    cnt_ref = ray.put(counts_sorted)

    def bigram_partials(batch: pa.Table) -> pa.Table:
        empty = pa.table({
            "bg": pa.array([], pa.string()),
            "cnt": pa.array([], pa.int64()),
            "part": pa.array([], pa.int64()),
        })
        toks_l = pc.split_pattern(batch["text"], " ")
        flat = pc.list_flatten(toks_l)
        parent = pc.list_parent_indices(toks_l).to_numpy().astype(np.int64)
        keep = pc.not_equal(flat, pa.scalar("")).to_numpy(
            zero_copy_only=False
        )
        flat, parent = flat.filter(pa.array(keep)), parent[keep]
        if len(flat) < 2:
            return empty
        flat = flat.combine_chunks()
        adj = parent[1:] == parent[:-1]
        if not adj.any():
            return empty
        ia = np.nonzero(adj)[0]
        a = flat.take(pa.array(ia, pa.int64()))
        b = flat.take(pa.array(ia + 1, pa.int64()))
        bg = pc.binary_join_element_wise(a, b, pa.scalar(sep))
        vc = pc.value_counts(bg)
        vals = vc.field("values")
        part = _fnv1a64_strings(vals) % np.int64(n_partitions)
        return pa.table({
            "bg": vals,
            "cnt": vc.field("counts").cast(pa.int64()),
            "part": pa.array(part, pa.int64()),
        })

    def bigram_fold(group: pa.Table) -> pa.Table:
        empty = pa.table({
            "tok_a": pa.array([], pa.string()),
            "tok_b": pa.array([], pa.string()),
            "cnt": pa.array([], pa.int64()),
            "score": pa.array([], pa.float64()),
        })
        if group.num_rows == 0:
            return empty
        enc = group["bg"].combine_chunks().dictionary_encode()
        codes = enc.indices.to_numpy().astype(np.int64)
        tot = np.zeros(len(enc.dictionary), np.int64)
        np.add.at(tot, codes, group["cnt"].to_numpy())
        keep = tot >= min_count
        if not keep.any():
            return empty
        kept = pa.array(np.nonzero(keep)[0], pa.int64())
        split = pc.split_pattern(enc.dictionary.take(kept), sep)
        ta = pc.list_element(split, 0)
        tb = pc.list_element(split, 1)
        t_sorted = ray.get(toks_ref)
        cnt_map = ray.get(cnt_ref)
        ca = cnt_map[np.searchsorted(t_sorted, np.asarray(ta.to_pylist()))]
        cb = cnt_map[np.searchsorted(t_sorted, np.asarray(tb.to_pylist()))]
        c_ab = tot[keep.nonzero()[0]]
        q = (c_ab * np.int64(total_tokens)).astype(np.float64) / (
            ca * cb
        ).astype(np.float64)
        uq, inv = np.unique(q, return_inverse=True)
        lnv = np.array([math.log(x) for x in uq])
        score = pc.round(
            pa.array(lnv[inv], pa.float64()), 6,
            round_mode="half_towards_infinity",
        )
        return pa.table({
            "tok_a": ta,
            "tok_b": tb,
            "cnt": pa.array(c_ab, pa.int64()),
            "score": score,
        })

    return (
        docs_ds.select_columns(["text"])
        .map_batches(bigram_partials, batch_format="pyarrow")
        .groupby("part")
        .map_groups(bigram_fold, batch_format="pyarrow")
    )


def epoch_shuffle(docs_ds, epoch: int, n_shards: int = 8,
                  id_col: str = "doc_id"):
    """Deterministic global training-epoch shuffle WITHOUT random state:
    every row's shuffle key is ``md5(f"{id}:{epoch}")``; its shard is the
    key's first 8 hex chars mod ``n_shards``; its position is the key's
    rank within the shard. Changing ``epoch`` reshuffles the whole
    corpus; re-running any subset reproduces the identical order (the
    resumability property a multi-epoch training loader needs — no RNG
    to checkpoint, no seed to thread through retries).

    Scale shape: no global sort. The shard id is a BOUNDED partition key
    (n_shards is the trainer's reader parallelism, not data-dependent),
    so the one shuffle is a bounded groupby and the within-shard ranking
    is one vectorized lexsort per group — each shard is 1/n_shards of
    the corpus, the natural unit a loader streams anyway. Returns
    (id_col, shard, pos); pos is 1-based to match SQL row_number().
    """
    import hashlib

    def keyed(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        hs = [hashlib.md5(f"{v}:{epoch}".encode()).hexdigest()
              for v in ids]
        shard = np.array([int(h[:8], 16) for h in hs],
                         dtype=np.int64) % np.int64(n_shards)
        return pa.table({
            id_col: batch[id_col],
            "shard": pa.array(shard, pa.int64()),
            "skey": pa.array(hs, pa.string()),
        })

    def rank_shard(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return pa.table({
                id_col: pa.array([], pa.int64()),
                "shard": pa.array([], pa.int64()),
                "pos": pa.array([], pa.int64()),
            })
        ids = group[id_col].to_numpy(zero_copy_only=False)
        keys = np.asarray(group["skey"].to_pylist())
        order = np.lexsort((ids, keys))     # md5 asc, id tie-break
        pos = np.empty(len(order), dtype=np.int64)
        pos[order] = np.arange(1, len(order) + 1)
        return pa.table({
            id_col: group[id_col],
            "shard": group["shard"],
            "pos": pa.array(pos, pa.int64()),
        })

    return (
        docs_ds.select_columns([id_col])
        .map_batches(keyed, batch_format="pyarrow")
        .groupby("shard")
        .map_groups(rank_shard, batch_format="pyarrow")
    )
