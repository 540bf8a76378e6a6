"""Registration-order contract.

The driver's correctness snapshot covers exactly the first 50 registered
queries, so ordering is part of verification: every query that had never
received a driver row through round 2 (registry slots 51-65 in both
CORRECTNESS_r01 and _r02) must sit inside the first-50 window, and the
canonical order must stay total (no query outside _PRIORITY_ORDER, no
stale name inside it).
"""

from __future__ import annotations

from overturelink_data_pipeline_spark import registry

registry.load_all()

NEVER_DRIVER_CHECKED_THROUGH_R2 = {
    "anti_join_parts_never_ordered",
    "ann_cosine_topk",
    "embedding_norms",
    "ann_ivf_topk",
    "ann_lsh_buckets",
    "ann_range_search",
    "stream_hourly_rollup",
    "sessions_30min_gap",
    "stream_user_sessions",
    "text_token_count",
    "text_quality_score",
    "text_lang_id",
    "text_fingerprint",
    "text_winnowing_fingerprint",
    "text_repetition_filter",
}


#: Queries added in round 3 — no driver row exists yet, so they must
#: also occupy the checked window.
NEW_IN_ROUND_3 = {
    "knn_join",
    "embedding_kmeans",
    "dedup_clusters",
    "text_gopher_quality",
    "stream_dedup_hourly",
    "text_decontaminate",
    "text_pack_sequences",
    "text_pii_redact",
    "sample_stratified",
    "ann_pq_topk",
    "domain_mix_report",
    "dedup_semantic",
    "text_lm_perplexity",
    "text_length_histogram",
    "stream_topk_trending",
    "text_quality_classifier",
    "sample_weighted",
    "pipeline_pretrain_corpus",
    "mm_dedup_phash",
    "sink_training_shards",
    "stream_latest_state",
    "graph_pagerank_dupes",
    "stream_join_enrichment",
    "funnel_view_click_purchase",
    "retention_week_offsets",
}


def test_never_checked_queries_inside_driver_window():
    top50 = set(list(registry.QUERIES)[:50])
    missing = (NEVER_DRIVER_CHECKED_THROUGH_R2 | NEW_IN_ROUND_3) - top50
    assert not missing, f"outside driver's first-50 window: {sorted(missing)}"


def test_priority_order_is_total_and_exact():
    names = set(registry.QUERIES)
    listed = set(registry._PRIORITY_ORDER)
    assert names == listed, (
        f"unlisted queries (would float by import order): {sorted(names - listed)}; "
        f"stale priority entries: {sorted(listed - names)}"
    )
    assert len(registry._PRIORITY_ORDER) == len(listed), "duplicate priority entries"


def test_registration_order_matches_priority_list():
    assert list(registry.QUERIES) == [
        n for n in registry._PRIORITY_ORDER if n in registry.QUERIES
    ]
