"""Round-8 pins: append-equals-rebuild lifecycle for the two remaining
incremental modes (VERDICT r7 ask #2).

Round 7 pinned the property for the exact-shingle posting index
(test_round7_ops.test_incremental_index_merge_equals_rebuild); these
two tests complete the monthly-release maintenance story:

- LSH band table: appending an admitted crawl's band rows into the
  bucketed band table (insert-into, same bucket spec) then probing the
  next crawl gives exactly the verified pair set of a from-scratch
  LSH banding over (release ∪ crawl).
- Semantic bucketed release: appending an admitted crawl's
  frozen-centroid cell assignments into the bucketed release table
  then probing the next crawl equals (a) a rebuild over the union
  under the SAME frozen centroids and (b) the next-crawl-only subset
  of a frozen-centroid FULL prune over all three corpora.

Together they let a 100 TB index be maintained by appends instead of
monthly rebuilds in all three modalities.
"""

from __future__ import annotations

import uuid

import pytest
from pyspark.sql import functions as F


def _mk_docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _body(tag: str, n: int = 30) -> str:
    return " ".join(f"{tag}{i}" for i in range(n))


def test_lsh_band_table_merge_equals_rebuild(spark):
    """Appending an admitted crawl's band rows into the bucketed band
    table, then band-probing the NEXT crawl, yields exactly the
    verified (new_id, match_id, jaccard) set of a from-scratch LSH
    banding over (release ∪ crawl) — the signature-level analog of the
    exact-shingle pin. Band rows are append-stable because banding is
    per-doc (signature slices hash independently of corpus content);
    the census and probe consume whatever row set the table holds."""
    from overturelink_data_pipeline_spark.operators.dedup import (
        _band_census,
        _band_table,
        _gram_hashes,
        _jaccard_verify,
        minhash_signatures_agg,
    )

    def shingles(df):
        toked = df.withColumn("toks", F.split(F.trim(F.col("text")), "\\s+")).filter(
            F.size("toks") >= 3
        )
        return toked.select(
            "doc_id", F.array_distinct(_gram_hashes()).alias("sh")
        )

    def bands(df):
        post = shingles(df).select("doc_id", F.explode("sh").alias("h"))
        return _band_table(minhash_signatures_agg(post))

    release = _mk_docs(
        spark,
        [(i, _body(f"a{i}")) for i in range(1, 11)] + [(11, _body("dup"))],
    )
    # crawl B: one near-dup of release doc 11, one novel doc
    crawl_b = _mk_docs(
        spark, [(1_000_011, _body("dup")), (1_000_050, _body("nov"))]
    )
    # crawl C: dups of release doc 3, of B's novel doc, and a fresh doc
    crawl_c = _mk_docs(
        spark,
        [
            (2_000_003, _body("a3")),
            (2_000_050, _body("nov")),
            (2_000_099, _body("zz")),
        ],
    )

    tbl = "merge_band_" + uuid.uuid4().hex[:8]
    try:
        # release-time write + APPEND of crawl B (same bucket spec:
        # the production band table is (band, bucket)-bucketed so the
        # census/delta-filter/probe never re-exchange the corpus)
        bands(release).write.bucketBy(4, "band", "bucket").sortBy(
            "band", "bucket"
        ).saveAsTable(tbl)
        bands(crawl_b).write.bucketBy(4, "band", "bucket").sortBy(
            "band", "bucket"
        ).mode("append").saveAsTable(tbl)
        merged = spark.table(tbl)

        def probe(index_bands, crawl):
            # mirror dedup_incremental_minhash's probe: census over the
            # full band set, anti-join hot buckets, delta side = the
            # probing crawl, then exact-jaccard verification
            all_bands = index_bands.unionByName(bands(crawl))
            big = _band_census(all_bands)
            kept = (
                all_bands.join(F.broadcast(big), ["band", "bucket"], "left_anti")
                if big.head(1)
                else all_bands
            )
            d = kept.filter(F.col("doc_id") >= 2_000_000).alias("d")
            o = kept.alias("o")
            cand = (
                d.join(
                    o,
                    (F.col("d.band") == F.col("o.band"))
                    & (F.col("d.bucket") == F.col("o.bucket"))
                    & (F.col("d.doc_id") != F.col("o.doc_id")),
                )
                .select(
                    F.col("d.doc_id").alias("new_id"),
                    F.col("o.doc_id").alias("match_id"),
                )
                .dropDuplicates(["new_id", "match_id"])
            )
            sh = shingles(
                release.unionByName(crawl_b).unionByName(crawl)
            )
            return {
                (r["new_id"], r["match_id"], r["jaccard"])
                for r in _jaccard_verify(cand, sh, "new_id", "match_id").collect()
            }

        via_append = probe(merged, crawl_c)
        via_rebuild = probe(bands(release.unionByName(crawl_b)), crawl_c)
        assert via_append == via_rebuild
        # and the probe actually found the planted cross-release dups
        matched = {(n, m) for (n, m, _) in via_append}
        assert (2_000_003, 3) in matched
        assert (2_000_050, 1_000_050) in matched
        assert all(n != 2_000_099 for (n, _) in matched)
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {tbl}")


def _mk_vecs(spark, rows):
    return spark.createDataFrame(rows, "vec_id long, v array<double>")


def test_semantic_release_table_merge_equals_rebuild(spark):
    """Appending an admitted crawl's frozen-centroid cell assignments
    into the bucketed release table, then probing the NEXT crawl with
    the SAME frozen centroids, equals (a) a rebuild: assigning
    (release ∪ crawl) from scratch under those centroids, and (b) the
    next-crawl-only subset of a frozen-centroid FULL prune over all
    three corpora — so monthly semantic admission never re-clusters or
    re-shuffles the corpus."""
    from overturelink_data_pipeline_spark.operators.similarity import (
        _lloyd_assign,
        _lloyd_fit,
        incremental_cell_prune,
    )

    def base(i, eps=0.0):
        # three well-separated anchors + a jitter so cells are stable
        anchor = [(10.0, 0.0, 0.0), (0.0, 10.0, 0.0), (0.0, 0.0, 10.0)][i % 3]
        return [anchor[0] + eps, anchor[1] + 0.01 * i, anchor[2]]

    release = _mk_vecs(spark, [(i, base(i)) for i in range(12)])
    # crawl B: near-copy of release vec 4 (same cell, cosine ~1) + novel
    crawl_b = _mk_vecs(
        spark,
        [(1_000_004, base(4, eps=0.001)), (1_000_007, [5.0, 5.0, 0.0])],
    )
    # crawl C: near-copies of release vec 2, of B's novel vec, + fresh
    crawl_c = _mk_vecs(
        spark,
        [
            (2_000_002, base(2, eps=0.001)),
            (2_000_007, [5.0, 5.001, 0.0]),
            (2_000_099, [-7.0, 1.0, 1.0]),
        ],
    )

    cents = _lloyd_fit(release, k=3)  # the frozen release-time artifact

    tbl = "merge_sem_" + uuid.uuid4().hex[:8]
    try:
        _lloyd_assign(release, cents).write.bucketBy(4, "cl").sortBy(
            "cl"
        ).saveAsTable(tbl)
        _lloyd_assign(crawl_b, cents).write.bucketBy(4, "cl").sortBy(
            "cl"
        ).mode("append").saveAsTable(tbl)
        merged = spark.table(tbl)

        def rows(df):
            return {
                (r["cluster"], r["vec_id"], r["keeper_id"], r["cos_sim"])
                for r in df.collect()
            }

        delta_c = _lloyd_assign(crawl_c, cents)
        via_append = rows(incremental_cell_prune(merged, delta_c))
        via_rebuild = rows(
            incremental_cell_prune(
                _lloyd_assign(release.unionByName(crawl_b), cents), delta_c
            )
        )
        assert via_append == via_rebuild

        # (b) the probe equals the crawl-C subset of a frozen-centroid
        # FULL prune: feed an empty frozen side and the whole corpus as
        # "delta" (incremental_cell_prune's kernel then scores every
        # pair i<j, i.e. the full SemDeDup policy), keep only C rows
        all_assigned = _lloyd_assign(
            release.unionByName(crawl_b).unionByName(crawl_c), cents
        )
        empty_frozen = all_assigned.filter(F.lit(False))
        full = incremental_cell_prune(empty_frozen, all_assigned)
        full_c = rows(full.filter(F.col("vec_id") >= 2_000_000))
        assert via_append == full_c

        # the planted near-copies are pruned with the right keepers
        pruned = {v: k for (_, v, k, _) in via_append}
        assert pruned.get(2_000_002) == 2
        assert pruned.get(2_000_007) == 1_000_007
        assert 2_000_099 not in pruned
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {tbl}")
