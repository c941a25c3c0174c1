"""Text-corpus curation walkthrough: the standard training-data cleanup
chain as ONE streaming Ray Data pipeline over the documents table.

The 100 TB shape: per-batch map stages are fused (no shuffle until the
dedup candidates), the only broadcast is the candidate-pair drop set
(size-aware: distributed hash join above 5M pairs), and the output lands
in the resumable hash-partitioned sink so a killed run skips finished
buckets.

1. GATE + REDACT (one fused map pass, zero shuffles): the quality gates
   (alpha ratio + token band, `quality_filter`'s kernels) and PII
   redaction (`pii_redact_batch`: email/SSN/card/phone/IPv4 → typed
   placeholders) run in the SAME map_batches over the pruned
   (doc_id, text, lang, n_chars) scan.
2. NEAR-DUP CANDIDATES (`minhash_lsh_pairs`): k-shingle MinHash
   signatures, banded LSH buckets packed into single int64 keys — the
   subquadratic path; exact duplicates hash identically, so this subsumes
   a separate exact-dedup pass at threshold <= 1.0.
3. APPLY (`neardup_filter`): keep-first survivors; broadcast searchsorted
   below 5M pairs, distributed left_outer hash join above.
4. CENSUS + SINK: `split_census` stamps content-hash train/val/test
   totals; `write_partitioned` commits data-then-manifest per bucket
   (rerun → 0 rewrites).

Run: PYTHONPATH=/root/repo python examples/corpus_curation_pipeline.py
"""

import shutil

import pyarrow as pa
import pyarrow.compute as pc
import ray

if not ray.is_initialized():
    ray.init(address="local", num_cpus=8, include_dashboard=False)

from moaray.io import read_parquet_clean
from moaray.ops.dedup import minhash_lsh_pairs, neardup_filter
from moaray.ops.text import pii_redact_batch, split_census
from moaray.sinks.partitioned import write_partitioned

SF_DIR = "/root/testdata/sf0.001"
OUT = "/tmp/corpus_curated"

MIN_ALPHA, MIN_TOKENS, MAX_TOKENS = 0.5, 5, 100_000


def gate_and_redact(batch: pa.Table) -> pa.Table:
    """Quality gates + PII scrub in one pass — the fused per-batch stage a
    corpus scan actually wants (no intermediate id shuffle/broadcast)."""
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
    n_tokens = pc.add(pc.count_substring(text, " "), 1)
    keep = pc.and_(
        pc.greater_equal(alpha_ratio, pa.scalar(MIN_ALPHA)),
        pc.and_(
            pc.greater_equal(n_tokens, pa.scalar(MIN_TOKENS)),
            pc.less_equal(n_tokens, pa.scalar(MAX_TOKENS)),
        ),
    )
    kept = batch.filter(keep)
    red = pii_redact_batch(kept)
    return pa.table(
        {
            "doc_id": kept["doc_id"],
            "text": red["clean_text"],  # downstream ops read `text`
            "lang": kept["lang"],
            "n_chars": kept["n_chars"],
            "n_redactions": red["n_redactions"],
        }
    )


def curated():
    docs = read_parquet_clean(
        f"{SF_DIR}/documents.parquet",
        columns=["doc_id", "text", "lang", "n_chars"],
    )
    clean = docs.map_batches(gate_and_redact, batch_format="pyarrow")
    pairs = minhash_lsh_pairs(clean, threshold=0.5)
    # fresh lineage for the probe side (a Dataset is consumed per use)
    clean2 = read_parquet_clean(
        f"{SF_DIR}/documents.parquet",
        columns=["doc_id", "text", "lang", "n_chars"],
    ).map_batches(gate_and_redact, batch_format="pyarrow")
    return neardup_filter(clean2, pairs)


n_in = read_parquet_clean(f"{SF_DIR}/documents.parquet").count()
survivors = curated().materialize()  # small at this SF; sink streams below
n_out = survivors.count()
n_red = int(survivors.sum("n_redactions") or 0)
print(f"corpus: {n_in} docs in -> {n_out} curated ({n_in - n_out} dropped; "
      f"{n_red} PII redactions)")
assert 0 < n_out <= n_in

census = {r["split"]: r["n_docs"] for r in split_census(survivors).take_all()}
print("split census:", census)
assert sum(census.values()) == n_out

# 5. SUBSTRING TRIM (ExactSubstr): drop tokens covered by corpus-wide
# duplicated 5-grams — census is a combiner+groupby, the duplicated-gram
# set is the small side and broadcasts to the trim actor pool.
from moaray.ops.dedup import ngram_census, trim_duplicate_ngrams

dup = ngram_census(survivors, n=5)
trimmed = trim_duplicate_ngrams(survivors, dup, n=5).materialize()
n_tok_removed = int(trimmed.sum("n_removed") or 0)
print(f"substring trim: {n_tok_removed} duplicated-span tokens removed")

# 6. LM QUALITY SCORE (CCNet-style): bits-per-token under a bigram LM fit
# on a bounded hash sample, scored by a broadcast-model actor pool.
from moaray.ops.text import lm_perplexity, mix_sample

scored = lm_perplexity(trimmed)
bpt = [r["bits_per_token"] for r in scored.take_all() if r["n_tokens"] > 1]
print(f"lm perplexity: median bits/token "
      f"{sorted(bpt)[len(bpt) // 2]:.2f} over {len(bpt)} docs")
assert len(bpt) > 0

# 7. TRAINING MIX: reproducible per-source keep rates (md5 predicate) —
# the same doc survives the same way on any engine, shard count, or rerun.
mixed = mix_sample(
    trimmed.map_batches(
        lambda b: b.append_column(
            "source", pa.array(["src0"] * b.num_rows, pa.string())
        ),
        batch_format="pyarrow",
    ),
    {"src0": 0.5},
)
n_mix = mixed.count()
print(f"training mix: {n_mix} docs at 50% source rate")
assert 0 < n_mix < n_out

shutil.rmtree(OUT, ignore_errors=True)
m1 = write_partitioned(survivors, OUT, key="doc_id", n_partitions=16)
m2 = write_partitioned(survivors, OUT, key="doc_id", n_partitions=16)
print(f"sink: {m1['written']} buckets written, rerun rewrote {m2['written']}")
assert m1["rows"] == n_out and m2["written"] == 0

# 8. EPOCH SHUFFLE: seedless deterministic global order for the first
# training epoch — md5(id:epoch) keys, bounded shard partitions, no RNG
# state to checkpoint, no global sort (each shard ranks independently).
from moaray.ops.text import epoch_shuffle

order = epoch_shuffle(mixed, epoch=1, n_shards=8)
n_ord = order.count()
print(f"epoch shuffle: {n_ord} docs across 8 shards, epoch 1")
assert n_ord == n_mix

# 9. SHIP: WebDataset-style tar shards — the training-sample delivery
# format (one sample = {key}.{col}.{ext} entries; committed manifests,
# kill-resume rewrites only severed shards).
from moaray.sinks.wds import read_wds_shards, write_wds_shards

shutil.rmtree(OUT + "_wds", ignore_errors=True)
w = write_wds_shards(mixed, OUT + "_wds", key="doc_id", n_shards=8)
n_back = read_wds_shards(OUT + "_wds").count()
print(f"wds: {w['written']} shards, {w['rows']} samples, "
      f"{n_back} read back")
assert n_back == w["rows"] == n_mix

ray.shutdown()
print("CORPUS CURATION PIPELINE OK")
