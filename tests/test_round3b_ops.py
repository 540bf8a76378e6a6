"""Targeted invariants for the second round-3 operator batch:
SemDeDup, bigram-LM perplexity, length histogram, sliding top-k.
(Oracle parity for each runs in test_oracle_parity.py; these pin the
semantics the hash alone doesn't explain.)
"""

from __future__ import annotations

import math

import pyspark.sql.functions as F

from overturelink_data_pipeline_spark import registry
from overturelink_data_pipeline_spark.operators.similarity import (
    SEMDEDUP_MODULUS,
    SEMDEDUP_TAU,
)
from overturelink_data_pipeline_spark.operators.text import tokens
from overturelink_data_pipeline_spark.session import read_table

registry.load_all()


def test_semdedup_prunes_planted_copies(spark, sf_dir):
    rows = registry.QUERIES["dedup_semantic"](spark, sf_dir).collect()
    assert rows, "planted copies must produce a non-empty prune list"
    planted = 0
    for r in rows:
        # the keeper always precedes the pruned vector
        assert r["keeper_id"] < r["vec_id"]
        assert r["cos_sim"] >= SEMDEDUP_TAU
        if r["vec_id"] >= 1_000_000:
            planted += 1
            # a planted copy's keeper should be its own original
            assert r["keeper_id"] == r["vec_id"] - 1_000_000
    n_expected = (
        read_table(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") % SEMDEDUP_MODULUS == 0)
        .count()
    )
    # near-every planted copy is pruned back to its original (cos
    # ~0.99); a copy that crosses a k-means cell boundary escapes the
    # within-cluster enumeration — that recall loss is inherent to
    # cluster blocking (the trade SemDeDup makes for the O(n²) bound)
    assert planted >= 0.9 * n_expected


def test_lm_perplexity_bigram_count_and_ppl(spark, sf_dir):
    res = registry.QUERIES["text_lm_perplexity"](spark, sf_dir)
    docs = read_table(spark, sf_dir, "documents").select(
        "doc_id", F.size(tokens(F.col("text"))).alias("n_tok")
    )
    joined = res.join(docs, "doc_id").collect()
    assert joined
    for r in joined:
        assert r["n_bigrams"] == max(r["n_tok"] - 1, 0)
        if r["avg_nll"] is not None:
            assert r["avg_nll"] > 0  # smoothed probs are < 1
            assert math.isclose(
                r["ppl"], round(math.exp(r["avg_nll"]), 1), abs_tol=0.2
            )


def test_length_histogram_partitions_the_corpus(spark, sf_dir):
    res = registry.QUERIES["text_length_histogram"](spark, sf_dir).collect()
    n_docs = read_table(spark, sf_dir, "documents").count()
    assert sum(r["n_docs"] for r in res) == n_docs
    assert abs(sum(r["token_share"] for r in res) - 1.0) < 0.01
    for r in res:
        lo, hi = 2 ** r["bucket"], 2 ** (r["bucket"] + 1)
        assert r["n_docs"] <= r["total_tokens"] <= r["n_docs"] * (hi - 1)
        assert r["total_tokens"] >= r["n_docs"] * lo


def test_topk_trending_rank_contract(spark, sf_dir):
    rows = registry.QUERIES["stream_topk_trending"](spark, sf_dir).collect()
    assert rows
    by_bucket: dict[int, list] = {}
    for r in rows:
        by_bucket.setdefault(r["bucket_start_s"], []).append(r)
    for bucket, rs in by_bucket.items():
        ranks = sorted(x["rank"] for x in rs)
        assert ranks == list(range(1, len(rs) + 1)) and len(rs) <= 3
        ordered = sorted(rs, key=lambda x: x["rank"])
        for a, b in zip(ordered, ordered[1:]):
            assert (a["n_events"], b["event_type"]) >= (b["n_events"], a["event_type"])


def test_quality_classifier_integer_score_contract(spark, sf_dir):
    rows = registry.QUERIES["text_quality_classifier"](spark, sf_dir).collect()
    assert rows
    kept = sum(r["keep"] for r in rows)
    assert 0 < kept < len(rows)  # a useful classifier splits the corpus
    for r in rows:
        assert r["keep"] == int(r["score_milli"] > 0)
        # |score| is bounded by n_tokens * max|weight| (milli-units)
        assert abs(r["score_milli"]) <= r["n_tokens"] * 10_000


def test_sample_weighted_rate_audit(spark, sf_dir):
    """The importance-weighted leg of sample_hash_audit (merged r7)."""
    rows = registry.QUERIES["sample_hash_audit"](spark, sf_dir).collect()
    assert rows
    per_source: dict[str, list[float]] = {}
    for r in rows:
        assert 0 <= r["n_weight"] <= r["n_docs"]
        assert 0 <= r["n_strat"] <= r["n_docs"]
        assert 0.0 <= r["expected_weight_rate"] <= 1.0
        agg = per_source.setdefault(r["source"], [0.0, 0.0, 0.0])
        agg[0] += r["n_docs"]
        agg[1] += r["n_weight"]
        agg[2] += r["expected_weight_rate"] * r["n_docs"]
    # hash-Bernoulli keep-rate tracks the expected inclusion
    # probability; bound at SOURCE granularity — the audit's
    # (source, lang) strata are too small for a rate envelope
    for source, (n, kept, expected) in per_source.items():
        assert abs(kept / n - expected / n) < 0.35, source


def test_char_fold_hash_lockstep_with_python(spark):
    """The classifier's feature hash must be engine-independent: fuzz
    the Spark expression against the pure-Python replica over ASCII
    tokens (the corpus alphabet; DuckDB parity runs in the oracle)."""
    import string

    from hypothesis import given, settings
    from hypothesis import strategies as st

    from overturelink_data_pipeline_spark.operators.curation import (
        char_fold_hash,
        char_fold_hash_py,
    )

    alphabet = string.ascii_letters + string.digits + string.punctuation

    @settings(max_examples=12, deadline=None)
    @given(st.lists(st.text(alphabet=alphabet, max_size=24), min_size=1, max_size=16))
    def check(tokens):
        df = spark.createDataFrame([(t,) for t in tokens], "tok string")
        got = {
            r["tok"]: r["h"]
            for r in df.select("tok", char_fold_hash(F.col("tok")).alias("h")).collect()
        }
        for t in set(tokens):
            assert got[t] == char_fold_hash_py(t), t

    check()


def test_pretrain_corpus_stage_monotonicity(spark, sf_dir):
    from overturelink_data_pipeline_spark.operators.curation import PACK_SEQ_LEN

    rows = registry.QUERIES["pipeline_pretrain_corpus"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        # each stage can only shrink the corpus
        assert r["n_raw"] >= r["n_kept"] >= r["n_canonical"] > 0
        # planted verbatim copies must be collapsed by the dedup stage
        assert r["n_canonical"] < r["n_kept"] or r["n_kept"] == 0
        # packing audit consistency
        assert 0 < r["utilization"] <= 1.0
        assert r["total_tokens"] <= r["n_sequences"] * PACK_SEQ_LEN


def test_phash_dedup_finds_reencodings(spark, sf_dir):
    from overturelink_data_pipeline_spark.operators.multimodal import (
        MM_DUP_MODULUS,
        MM_HAMMING_T,
    )

    rows = registry.QUERIES["mm_dedup_phash"](spark, sf_dir).collect()
    assert rows
    n_expected = (
        read_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % MM_DUP_MODULUS == 0)
        .count()
    )
    planted = {(r["id_a"], r["id_b"]) for r in rows if r["id_b"] >= 1_000_000}
    # every re-encoded copy (<= 4 noise bits from its original) is found
    assert len(planted) == n_expected
    for r in rows:
        assert 0 <= r["hamming"] <= MM_HAMMING_T


def test_shard_writer_splits_files_and_sorts(spark, sf_dir):
    """Beyond the oracle: shards must actually be SORTED by doc_id and
    SPLIT at SHARD_MAX_ROWS on disk."""
    import glob
    import os

    import pyarrow.parquet as pq

    from overturelink_data_pipeline_spark.operators.curation import SHARD_MAX_ROWS

    from overturelink_data_pipeline_spark.operators.curation import shard_out_dir

    from overturelink_data_pipeline_spark.operators.curation import SHARD_SALT_ROWS

    rows = registry.QUERIES["sink_training_shards"](spark, sf_dir).collect()
    assert rows and all(r["n_files"] >= 2 for r in rows), "split path unexercised"
    salt_dirs = glob.glob(os.path.join(shard_out_dir(), "source=*", "salt=*"))
    expected_groups = (
        read_table(spark, sf_dir, "documents")
        .select("source", (F.col("doc_id") / SHARD_SALT_ROWS).cast("long").alias("salt"))
        .distinct()
        .count()
    )
    assert len(salt_dirs) == expected_groups, "salted layout != (source, salt) groups"
    parts = glob.glob(os.path.join(shard_out_dir(), "source=*", "salt=*", "*.parquet"))
    assert parts
    for f in parts[:8]:
        t = pq.read_table(f, columns=["doc_id"])
        ids = t["doc_id"].to_pylist()
        assert len(ids) <= SHARD_MAX_ROWS
        assert ids == sorted(ids)
