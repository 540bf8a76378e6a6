"""Property tests for the round-3 operators (knn_join,
embedding_kmeans, dedup_clusters, text_gopher_quality,
stream_dedup_hourly) and the near-dup hot-key guards. Oracle parity
for all five is covered by test_oracle_parity.py; these pin the
properties an oracle hash can't express."""

from __future__ import annotations

import pytest

from overturelink_data_pipeline_spark import registry
from overturelink_data_pipeline_spark.operators import dedup
from overturelink_data_pipeline_spark.operators.similarity import (
    K_NN,
    KMEANS_K,
    N_QUERIES,
)

registry.load_all()


def test_knn_join_shape_and_monotonicity(spark, sf_dir):
    rows = registry.QUERIES["knn_join"](spark, sf_dir).collect()
    by_qid: dict[int, list] = {}
    for r in rows:
        by_qid.setdefault(r["qid"], []).append(r)
    assert set(by_qid) == set(range(N_QUERIES))
    for qid, rs in by_qid.items():
        assert [r["rank"] for r in rs] == list(range(1, K_NN + 1))
        sims = [r["cos_sim"] for r in rs]
        assert sims == sorted(sims, reverse=True), f"qid {qid} not sorted"
        # neighbors come from the base set only
        assert all(r["vec_id"] >= N_QUERIES for r in rs)


def test_kmeans_partitions_the_corpus(spark, sf_dir):
    from overturelink_data_pipeline_spark.session import read_table

    total = read_table(spark, sf_dir, "embeddings").count()
    rows = registry.QUERIES["embedding_kmeans"](spark, sf_dir).collect()
    assert 1 <= len(rows) <= KMEANS_K
    assert sum(r["n"] for r in rows) == total
    assert all(r["centroid_l2"] > 0 for r in rows)


def test_dedup_clusters_cover_the_pair_set(spark, sf_dir):
    """Every minhash pair's endpoints land in one cluster; cluster
    sizes sum to the node count; every cluster has >= 2 members and is
    labeled by its minimum id."""
    pairs = dedup.dedup_minhash_lsh(spark, sf_dir).collect()
    clusters = registry.QUERIES["dedup_clusters"](spark, sf_dir).collect()
    nodes = {r["id_a"] for r in pairs} | {r["id_b"] for r in pairs}
    assert sum(c["n_members"] for c in clusters) == len(nodes)
    assert all(c["n_members"] >= 2 for c in clusters)
    # rebuild membership by union-find to check canonical labels
    parent = {n: n for n in nodes}

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for r in pairs:
        ra, rb = find(r["id_a"]), find(r["id_b"])
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    expected: dict[int, int] = {}
    for n in nodes:
        expected[find(n)] = expected.get(find(n), 0) + 1
    got = {c["cluster_id"]: c["n_members"] for c in clusters}
    assert got == expected


def test_gopher_keep_is_rule_conjunction(spark, sf_dir):
    rows = registry.QUERIES["text_gopher_quality"](spark, sf_dir).collect()
    assert rows, "empty result"
    n_keep = 0
    for r in rows:
        rules = (
            30 <= r["n_words"] <= 100000
            and 3 <= r["mean_word_len"] <= 10
            and r["alpha_frac"] >= 0.8
            and r["n_stop"] >= 2
            and r["uniq_frac"] >= 0.2
        )
        # rounded metrics re-checked against the emitted keep flag; a
        # doc sitting exactly on a threshold after rounding could
        # legitimately diverge, but thresholds were chosen off the
        # corpus quantiles so none does
        assert bool(r["keep"]) == rules, r
        n_keep += r["keep"]
    assert 0 < n_keep, "rule set rejects everything — thresholds rotted"


@pytest.mark.parametrize("attr,query", [
    ("NGRAM_DF_CAP", "dedup_ngram_jaccard"),
    ("BAND_BUCKET_CAP", "dedup_minhash_lsh"),
    ("BAND_BUCKET_CAP", "dedup_simhash"),
])
def test_hot_key_guards_engage(spark, sf_dir, monkeypatch, attr, query):
    """With the cap forced to 1 every key is 'hot' and candidate
    generation must collapse to zero pairs — proving the guard sits on
    the candidate path (default-cap behavior is pinned by oracle
    parity, where the caps never fire)."""
    baseline = registry.QUERIES[query](spark, sf_dir).count()
    assert baseline > 0
    monkeypatch.setattr(dedup, attr, 1)
    assert registry.QUERIES[query](spark, sf_dir).count() == 0
