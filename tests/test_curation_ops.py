"""Property tests for the curation operators (text_decontaminate,
text_pack_sequences, text_pii_redact, sample_stratified). Oracle
parity for all four is covered by test_oracle_parity.py; these pin
the semantic properties a value hash can't express."""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from overturelink_data_pipeline_spark import registry
from overturelink_data_pipeline_spark.operators.curation import (
    EVAL_MODULUS,
    PACK_SEQ_LEN,
    PACK_SUBSTREAM_DOCS,
    PII_EMAIL,
    PII_IP,
    PII_MODULUS,
    PII_PHONE,
    SAMPLE_THRESHOLDS,
)
from overturelink_data_pipeline_spark.session import read_table

registry.load_all()


def test_decontaminate_flags_every_donor(spark, sf_dir):
    """Every doc that donated an eval excerpt must be contaminated
    (its own excerpt's shingles are a subset of its shingles), and the
    output covers the whole corpus exactly once."""
    from overturelink_data_pipeline_spark.operators.curation import (
        text_decontaminate,
    )

    rows = text_decontaminate(spark, sf_dir).collect()
    total = read_table(spark, sf_dir, "documents").count()
    assert len(rows) == total
    by_id = {r["doc_id"]: r for r in rows}
    donors = [i for i in by_id if i % EVAL_MODULUS == 0]
    assert donors, "fixture must contain at least one eval donor"
    for i in donors:
        # docs shorter than the shingle width can't overlap — the
        # synthetic corpus has none at any SF, so donors always flag
        assert by_id[i]["contaminated"] == 1, f"donor {i} not flagged"
        assert by_id[i]["n_overlap"] >= 1


def test_pack_sequences_offsets_are_contiguous_per_substream(spark, sf_dir):
    """Within each (source, substream) stream, each doc starts exactly
    where the previous one ended, windows are consistent with the
    offsets, spans_boundary is exact, and the substream key is the
    doc_id bucket that bounds sort-partition size."""
    rows = registry.QUERIES["text_pack_sequences"](spark, sf_dir).collect()
    streams: dict[tuple, list] = {}
    for r in rows:
        assert r["substream"] == r["doc_id"] // PACK_SUBSTREAM_DOCS
        streams.setdefault((r["source"], r["substream"]), []).append(r)
    for key, rs in streams.items():
        assert len(rs) <= PACK_SUBSTREAM_DOCS
        rs.sort(key=lambda r: r["doc_id"])
        expect = 0
        for r in rs:
            assert r["start_offset"] == expect, (key, r["doc_id"])
            assert r["first_seq"] == r["start_offset"] // PACK_SEQ_LEN
            assert r["last_seq"] == (r["start_offset"] + r["n_tokens"] - 1) // PACK_SEQ_LEN
            assert r["spans_boundary"] == int(r["first_seq"] != r["last_seq"])
            expect += r["n_tokens"]


def test_pii_redact_scrubs_planted_rows_and_only_them(spark, sf_dir):
    rows = registry.QUERIES["text_pii_redact"](spark, sf_dir).collect()
    for r in rows:
        planted = r["doc_id"] % PII_MODULUS == 0
        assert (r["n_emails"], r["n_ips"], r["n_phones"]) == (
            (1, 1, 1) if planted else (0, 0, 0)
        ), r["doc_id"]
        # redacted output must carry no residual match for any pattern
        for pat in (PII_EMAIL, PII_IP, PII_PHONE):
            assert not re.search(pat, r["redacted"]), (r["doc_id"], pat)
        if planted:
            assert "<EMAIL>" in r["redacted"]
            assert "<IP>" in r["redacted"]
            assert "<PHONE>" in r["redacted"]


def test_stratified_sample_is_deterministic_and_rate_shaped(spark, sf_dir):
    """The stratified leg of sample_hash_audit: auditing twice yields
    identical rows (hash sampling is partitioning-independent); per-
    stratum rates land within a loose binomial envelope; zh keeps
    everything. The per-doc kept-rows variant (stratified_keep as a
    filter) must agree row-for-row with the audited counts."""
    from overturelink_data_pipeline_spark.operators.curation import stratified_keep

    rows_a = registry.QUERIES["sample_hash_audit"](spark, sf_dir).collect()
    rows_b = registry.QUERIES["sample_hash_audit"](spark, sf_dir).collect()
    assert [r.asDict() for r in rows_a] == [r.asDict() for r in rows_b]
    docs = read_table(spark, sf_dir, "documents")
    totals = {r["lang"]: r["n"] for r in docs.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    kept: dict[str, int] = {}
    for r in rows_a:
        kept[r["lang"]] = kept.get(r["lang"], 0) + r["n_strat"]
    assert kept.get("zh", 0) == totals.get("zh", 0)
    # audit counts == the filter predicate applied per-doc
    filtered = {
        r["lang"]: r["n"]
        for r in docs.filter(stratified_keep())
        .groupBy("lang")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert {k: v for k, v in kept.items() if v} == filtered
    rates = {"en": 0.5, "es": 0.25, "de": 0.25, "fr": 0.125}
    for lang, rate in rates.items():
        n = totals.get(lang, 0)
        if n < 30:
            continue  # envelope meaningless on tiny strata
        k = kept.get(lang, 0)
        sigma = (n * rate * (1 - rate)) ** 0.5
        assert abs(k - n * rate) <= 5 * sigma, (lang, k, n)


def test_pq_recall_vs_exact_euclidean(spark, sf_dir):
    """PQ-ADC top-20 must overlap the exact euclidean top-20 well
    above chance (coarse 4x8 codebook: measured 0.40-0.50 recall at
    sf0.001/sf0.01 vs ~0.04 expected for a random 20-subset)."""
    import duckdb
    import numpy as np

    rows = registry.QUERIES["ann_pq_topk"](spark, sf_dir).collect()
    assert len(rows) == 20
    adcs = [r["adc_dist"] for r in rows]
    assert adcs == sorted(adcs)
    pq = {r["vec_id"] for r in rows}
    emb = duckdb.sql(
        f"SELECT vec_id, embedding FROM read_parquet('{sf_dir}/embeddings.parquet') ORDER BY vec_id"
    ).fetchall()
    ids = np.array([r[0] for r in emb])
    V = np.array([r[1] for r in emb], dtype=np.float64)
    q = V[ids == 0][0]
    d = ((V - q) ** 2).sum(1)
    mask = ids != 0
    exact = set(ids[mask][np.argsort(d[mask], kind="stable")[:20]])
    assert len(pq & exact) / 20 >= 0.25
