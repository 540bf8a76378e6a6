"""Round-5 operator properties: Bloom decontamination semantics and
the corpus-overlap matrix."""

from __future__ import annotations

import pyspark.sql.functions as F

from overturelink_data_pipeline_spark import registry

registry.load_all()


def test_bloom_flags_superset_of_true_contamination(spark, sf_dir):
    """Bloom membership can only err toward false POSITIVES: every doc
    text_decontaminate marks contaminated must be flagged, and each
    doc's bloom hit count must dominate its true overlap count."""
    from overturelink_data_pipeline_spark.operators.curation import (
        text_bloom_decontaminate,
        text_decontaminate,
    )

    true_df = text_decontaminate(spark, sf_dir).select(
        "doc_id", "n_overlap", "contaminated"
    )
    bloom_df = text_bloom_decontaminate(spark, sf_dir).select(
        "doc_id", "n_bloom_hits", "flagged"
    )
    j = true_df.join(bloom_df, "doc_id")
    assert j.filter((F.col("contaminated") == 1) & (F.col("flagged") == 0)).count() == 0
    assert j.filter(F.col("n_bloom_hits") < F.col("n_overlap")).count() == 0
    # the eval donors exist, so contamination is non-vacuous
    assert bloom_df.filter(F.col("flagged") == 1).count() > 0


def test_bloom_false_positive_rate_is_bounded(spark, sf_dir):
    """With BLOOM_M = 8192 and the small eval set, the false-positive
    rate over non-contaminated docs should stay well under 50% — a
    regression guard on the geometry (a broken position derivation
    tends to flag everything)."""
    from overturelink_data_pipeline_spark.operators.curation import (
        text_bloom_decontaminate,
        text_decontaminate,
    )

    true_df = text_decontaminate(spark, sf_dir).select("doc_id", "contaminated")
    bloom_df = text_bloom_decontaminate(spark, sf_dir).select("doc_id", "flagged")
    j = true_df.join(bloom_df, "doc_id").filter(F.col("contaminated") == 0)
    clean = j.count()
    fp = j.filter(F.col("flagged") == 1).count()
    assert clean > 0
    assert fp / clean < 0.5, f"false-positive rate {fp}/{clean}"


def test_corpus_overlap_matches_bruteforce(spark, sf_dir):
    """The inverted-index overlap equals a brute-force per-source
    distinct-shingle set intersection computed independently."""
    from overturelink_data_pipeline_spark.session import read_table

    rows = (
        read_table(spark, sf_dir, "documents")
        .select("source", "text")
        .collect()
    )
    by_src: dict[str, set[str]] = {}
    for r in rows:
        t = r["text"].strip().split()
        by_src.setdefault(r["source"], set()).update(
            " ".join(t[i : i + 3]) for i in range(len(t) - 2)
        )
    got = {
        (r["src_a"], r["src_b"]): r["n_shared"]
        for r in registry.QUERIES["corpus_overlap_matrix"](spark, sf_dir).collect()
    }
    srcs = sorted(by_src)
    want = {
        (a, b): len(by_src[a] & by_src[b])
        for i, a in enumerate(srcs)
        for b in srcs[i + 1 :]
        if by_src[a] & by_src[b]
    }
    assert got == want
