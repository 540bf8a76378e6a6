"""Incremental-index lifecycle API — the production surface for the
monthly-release maintenance story the tests pin.

The three incremental dedup modalities (exact shingles → MinHash/LSH
signatures → embedding cells; dedup.py / similarity.py) share one
lifecycle:

    release time   build(corpus)   — one-off heavy pass, persisted as
                                     BUCKETED tables (the exchange paid
                                     once, at write)
    monthly        probe(crawl)    — cost ∝ crawl, index side moves
                                     zero bytes (bucket layout satisfies
                                     the join/cogroup clustering)
                   append(crawl)   — admit the crawl into the index by
                                     APPENDING rows under the same
                                     bucket spec; append-equals-rebuild
                                     is pinned for all three modes
                                     (tests/test_round7_ops.py,
                                     tests/test_round8_ops.py,
                                     tests/test_lifecycle_api.py)

This module lifts the recipes that previously lived inline in
scripts/bench_incremental.py and the lifecycle tests into a product
API. Design rules at the 100 TB point:

- **Sidecar count tables, not recomputed censuses.** Skew guards
  (shingle df caps, LSH bucket caps) need per-key counts over the
  CURRENT index. Storing only the over-cap key list would make appends
  require a full recount; storing per-key counts bucketed BY THE KEY
  makes maintenance a row append and the current count a
  partition-local SUM — no corpus-wide exchange ever again.
- **Same bucket spec on every append** (``insertInto`` semantics via
  ``mode("append").saveAsTable``): new files land in the same bucket
  layout, so probes stay exchange-free on the index side.
- **The probe never trusts the stored census alone**: the crawl's own
  keys are merged in (a crawl can push a key over the cap), so probe
  results equal a from-scratch rebuild over (index ∪ crawl) — the
  pinned property.

Reference analog: SURVEY.md §2 S4–S6's cache-then-refilter lifecycle,
lifted from per-country GeoParquet caches to dedup indexes.
"""

from __future__ import annotations

import uuid
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from overturelink_data_pipeline_spark.operators.dedup import (
    BAND_BUCKET_CAP,
    NGRAM_DF_CAP,
    _band_table,
    _fresh_persist,
    _gram_hashes,
    _hot_doc_arrays,
    _incremental_probe,
    _jaccard_verify,
    minhash_signatures_agg,
)

__all__ = [
    "PostingIndex",
    "BandIndex",
    "SemanticRelease",
    "shingle_table",
]

#: Bucket count for the index tables. Sized for the test/bench corpora;
#: a real deployment picks buckets so each holds O(100 MB) — the knob
#: is per-index via the ``buckets`` build argument.
DEFAULT_BUCKETS = 16


def shingle_table(docs: DataFrame) -> DataFrame:
    """(doc_id, sh array<long>) — distinct 3-gram shingle hashes per
    doc with ≥3 tokens, via THE one shingle-hash definition
    (dedup._gram_hashes); docs: (doc_id, text)."""
    toked = docs.withColumn("toks", F.split(F.trim(F.col("text")), "\\s+")).filter(
        F.size("toks") >= 3
    )
    return toked.select(
        "doc_id", F.array_distinct(_gram_hashes()).alias("sh")
    )


def _postings(docs: DataFrame) -> DataFrame:
    """(doc_id, h) exploded distinct shingle postings.

    INLINE explode(expr), never explode of the aliased ``sh`` column:
    InferFiltersFromGenerate substitutes an alias into the inferred
    size/isnotnull filter and pushes it below the materializing
    Project, where interpreted predicates have no CSE — O(tokens²)
    string work per doc on the scan side (the pinned r7 lesson;
    re-measured here: 7.0 s → sub-second for a 5 k-doc crawl at sf1)."""
    toked = docs.withColumn("toks", F.split(F.trim(F.col("text")), "\\s+")).filter(
        F.size("toks") >= 3
    )
    return toked.select(
        "doc_id", F.explode(F.array_distinct(_gram_hashes())).alias("h")
    )


def _drop(spark: SparkSession, *tables: str) -> None:
    for t in tables:
        spark.sql(f"DROP TABLE IF EXISTS {t}")


@dataclass
class PostingIndex:
    """Exact-shingle posting index: ``{name}_post`` (doc_id, h;
    bucketBy(h)) + ``{name}_ns`` (per-doc distinct shingle counts;
    bucketBy(doc_id)) + ``{name}_hcount`` (per-key posting counts;
    bucketBy(h) — the skew-guard sidecar).

    probe() = dedup_incremental's semantics against the stored index:
    per crawl doc, every index-or-crawl doc sharing ≥1 non-hot shingle
    and verifying at Jaccard ≥ tau, one row per ordered (new, match)
    pair."""

    spark: SparkSession
    name: str
    buckets: int = DEFAULT_BUCKETS
    cap: int = field(default_factory=lambda: NGRAM_DF_CAP)

    @property
    def _post(self) -> str:
        return f"{self.name}_post"

    @property
    def _ns(self) -> str:
        return f"{self.name}_ns"

    @property
    def _hcount(self) -> str:
        return f"{self.name}_hcount"

    def build(self, docs: DataFrame) -> "PostingIndex":
        """Release-time build: write all three sidecars from scratch."""
        post = _postings(docs)
        post.write.bucketBy(self.buckets, "h").sortBy("h").mode(
            "overwrite"
        ).saveAsTable(self._post)
        self._write_sidecars(post, mode="overwrite")
        return self

    def append(self, crawl: DataFrame) -> None:
        """Admit a crawl: append its postings and sidecar rows under
        the SAME bucket spec — no rebuild, no corpus-wide exchange.
        Current per-key/per-doc counts are SUMs over appended rows,
        partition-local on the bucket layout."""
        post = _postings(crawl)
        post.write.bucketBy(self.buckets, "h").sortBy("h").mode(
            "append"
        ).saveAsTable(self._post)
        self._write_sidecars(post, mode="append")

    def _write_sidecars(self, post: DataFrame, mode: str) -> None:
        post.groupBy("doc_id").agg(
            F.count(F.lit(1)).alias("n_sh")
        ).write.bucketBy(self.buckets, "doc_id").mode(mode).saveAsTable(self._ns)
        post.groupBy("h").agg(F.count(F.lit(1)).alias("n")).write.bucketBy(
            self.buckets, "h"
        ).mode(mode).saveAsTable(self._hcount)

    def probe(self, crawl: DataFrame, tau: float = 0.5) -> DataFrame:
        """(new_id, match_id, jaccard) for the crawl vs (index ∪ crawl).
        The crawl's keys merge into the stored count sidecar before the
        cap filter, so a crawl pushing a key over the cap suppresses it
        exactly as a rebuild would."""
        spark = self.spark
        # the crawl's postings feed SIX consumers (count merge, both
        # cold sides, ns, hot arrays, the self-probe leg) — persist the
        # delta-bounded frame once per probe
        delta_post = _fresh_persist(f"{self.name}_probe_dpost", _postings(crawl))
        index_post = spark.table(self._post)
        # current per-key counts = stored sidecar rows + delta rows.
        # NOT a union-then-groupBy: the union would discard the
        # sidecar's bucket layout and re-exchange the whole count
        # table per probe. Instead the stored side aggregates
        # partition-local on its buckets and the (crawl-bounded) delta
        # counts broadcast-join in; keys the crawl alone pushes over
        # the cap come from the second (tiny) leg.
        delta_counts = delta_post.groupBy("h").agg(
            F.count(F.lit(1)).alias("n_delta")
        )
        stored = spark.table(self._hcount).groupBy("h").agg(
            F.sum("n").alias("n_stored")
        )
        hot_keys = (
            stored.join(F.broadcast(delta_counts), "h", "left_outer")
            .filter(
                F.col("n_stored") + F.coalesce("n_delta", F.lit(0)) > self.cap
            )
            .select("h")
            .unionByName(
                delta_counts.filter(F.col("n_delta") > self.cap).select("h")
            )
            .dropDuplicates(["h"])
        )
        has_hot = bool(hot_keys.head(1))
        cold_index = (
            index_post.join(F.broadcast(hot_keys), "h", "left_anti")
            if has_hot
            else index_post
        )
        cold_delta = (
            delta_post.join(F.broadcast(hot_keys), "h", "left_anti")
            if has_hot
            else delta_post
        )
        # per-doc totals over the FULL corpus: the stored sidecar's doc
        # set and the crawl's are disjoint, so union IS the total
        ns = spark.table(self._ns).unionByName(
            delta_post.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
        )
        # hot add-back: per-doc over-cap arrays so surviving pairs
        # report the TRUE shared count (dedup_incremental's recipe)
        hot = (
            _hot_doc_arrays(index_post.unionByName(delta_post), hot_keys)
            if has_hot
            else None
        )
        # Delta-delta completeness WITHOUT moving the corpus: the
        # registered query unions delta into the `o` side, which is
        # fine for an in-plan index but would re-exchange the stored
        # corpus here whenever the crawl is too big to broadcast (the
        # union discards the bucket-derived partitioning). Instead the
        # probe splits by where the match lives — index matches join
        # the bucketed table (only the crawl side may shuffle),
        # delta-delta matches come from a crawl-bounded self-probe —
        # and the union of the two IS the full pair set (a match's
        # postings live wholly on one side, so every pair's
        # intersection count is complete within its leg).
        vs_index = _incremental_probe(cold_index, cold_delta, ns, hot, tau=tau)
        vs_delta = _incremental_probe(cold_delta, cold_delta, ns, hot, tau=tau)
        return vs_index.unionByName(vs_delta).orderBy("new_id", "match_id")

    def drop(self) -> None:
        _drop(self.spark, self._post, self._ns, self._hcount)


@dataclass
class BandIndex:
    """MinHash/LSH band index: ``{name}_bands`` (doc_id, band, bucket;
    bucketBy(band, bucket)) + ``{name}_sh`` (shingle arrays for the
    exact-Jaccard verify; bucketBy(doc_id)) + ``{name}_bcount``
    (per-(band, bucket) counts — the hot-bucket sidecar).

    probe() = dedup_incremental_minhash's semantics against the stored
    index: the crawl band-probes the table, candidates verify at
    3-gram Jaccard ≥ tau, ordered (new_id, match_id) pairs."""

    spark: SparkSession
    name: str
    buckets: int = DEFAULT_BUCKETS
    cap: int = field(default_factory=lambda: BAND_BUCKET_CAP)

    @property
    def _bands(self) -> str:
        return f"{self.name}_bands"

    @property
    def _sh(self) -> str:
        return f"{self.name}_sh"

    @property
    def _bcount(self) -> str:
        return f"{self.name}_bcount"

    def _band_rows(self, docs: DataFrame) -> tuple[DataFrame, DataFrame]:
        # postings via the inline-explode shape (_postings docstring);
        # the shingle-ARRAY frame is built separately for the verify
        # sidecar — never explode the aliased array
        post = _postings(docs)
        return _band_table(minhash_signatures_agg(post)), shingle_table(docs)

    def build(self, docs: DataFrame) -> "BandIndex":
        bands, sh = self._band_rows(docs)
        bands.write.bucketBy(self.buckets, "band", "bucket").sortBy(
            "band", "bucket"
        ).mode("overwrite").saveAsTable(self._bands)
        sh.write.bucketBy(self.buckets, "doc_id").mode("overwrite").saveAsTable(
            self._sh
        )
        self._write_counts(bands, mode="overwrite")
        return self

    def append(self, crawl: DataFrame) -> None:
        bands, sh = self._band_rows(crawl)
        bands.write.bucketBy(self.buckets, "band", "bucket").sortBy(
            "band", "bucket"
        ).mode("append").saveAsTable(self._bands)
        sh.write.bucketBy(self.buckets, "doc_id").mode("append").saveAsTable(
            self._sh
        )
        self._write_counts(bands, mode="append")

    def _write_counts(self, bands: DataFrame, mode: str) -> None:
        bands.groupBy("band", "bucket").agg(
            F.count(F.lit(1)).alias("n")
        ).write.bucketBy(self.buckets, "band", "bucket").mode(mode).saveAsTable(
            self._bcount
        )

    def probe(self, crawl: DataFrame, tau: float = 0.5) -> DataFrame:
        spark = self.spark
        delta_bands, delta_sh = self._band_rows(crawl)
        # band rows feed the count merge, both cands legs' delta side;
        # persist the delta-bounded frame once per probe
        delta_bands = _fresh_persist(f"{self.name}_probe_dbands", delta_bands)
        index_bands = spark.table(self._bands)
        # same bucket-local + broadcast count merge as PostingIndex.probe
        delta_counts = delta_bands.groupBy("band", "bucket").agg(
            F.count(F.lit(1)).alias("n_delta")
        )
        stored = spark.table(self._bcount).groupBy("band", "bucket").agg(
            F.sum("n").alias("n_stored")
        )
        big = (
            stored.join(F.broadcast(delta_counts), ["band", "bucket"], "left_outer")
            .filter(
                F.col("n_stored") + F.coalesce("n_delta", F.lit(0)) > self.cap
            )
            .select("band", "bucket")
            .unionByName(
                delta_counts.filter(F.col("n_delta") > self.cap).select(
                    "band", "bucket"
                )
            )
            .dropDuplicates(["band", "bucket"])
        )
        kept_index = index_bands.join(F.broadcast(big), ["band", "bucket"], "left_anti")
        kept_delta = delta_bands.join(F.broadcast(big), ["band", "bucket"], "left_anti")

        # same two-leg split as PostingIndex.probe: crawl-vs-table (the
        # bucketed side never shuffles) + crawl-vs-crawl (bounded by the
        # crawl) — the union is the full candidate set
        def cand(o_side: DataFrame) -> DataFrame:
            d, o = kept_delta.alias("d"), o_side.alias("o")
            return d.join(
                o,
                (F.col("d.band") == F.col("o.band"))
                & (F.col("d.bucket") == F.col("o.bucket"))
                & (F.col("d.doc_id") != F.col("o.doc_id")),
            ).select(
                F.col("d.doc_id").alias("new_id"),
                F.col("o.doc_id").alias("match_id"),
            )

        cands = (
            cand(kept_index)
            .unionByName(cand(kept_delta))
            .dropDuplicates(["new_id", "match_id"])
        )
        sh = spark.table(self._sh).unionByName(delta_sh).dropDuplicates(["doc_id"])
        return _jaccard_verify(cands, sh, "new_id", "match_id", tau=tau)

    def drop(self) -> None:
        _drop(self.spark, self._bands, self._sh, self._bcount)


@dataclass
class SemanticRelease:
    """SemDeDup release: ``{name}_assigned`` (vec_id, v, cl;
    bucketBy(cl)) + ``{name}_cents`` (the frozen k×dim centroids as a
    tiny table — the release sidecar a real deployment ships next to
    the data).

    probe() = semantic_prune_incremental's semantics against the
    stored release: assign ONLY the crawl with the frozen centroids,
    cogroup per cell, one row per pruned crawl vector with the
    lowest-id qualifying keeper. Because the frozen side comes from a
    TABLE, the cogroup's two lineages are disjoint (the self-lineage
    hazard the registered query guards against cannot arise)."""

    spark: SparkSession
    name: str
    buckets: int = DEFAULT_BUCKETS
    k: int = 8

    @property
    def _assigned(self) -> str:
        return f"{self.name}_assigned"

    @property
    def _cents(self) -> str:
        return f"{self.name}_cents"

    def build(self, emb: DataFrame) -> "SemanticRelease":
        """Fit k-means on the release corpus (frozen thereafter), write
        the assigned corpus bucketed by cell + the centroid sidecar."""
        from overturelink_data_pipeline_spark.operators.similarity import (
            _lloyd_assign,
            _lloyd_fit,
        )

        cents = _lloyd_fit(emb, k=self.k, kernel="arrow")
        _lloyd_assign(emb, cents, kernel="arrow").write.bucketBy(
            self.buckets, "cl"
        ).sortBy("cl").mode("overwrite").saveAsTable(self._assigned)
        self.spark.createDataFrame(
            [(cl, list(map(float, c))) for cl, c in sorted(cents.items())],
            "cl long, c array<double>",
        ).write.mode("overwrite").saveAsTable(self._cents)
        return self

    def centroids(self) -> dict[int, list[float]]:
        return {
            int(r["cl"]): list(r["c"])
            for r in self.spark.table(self._cents).collect()
        }

    def _assign(self, emb: DataFrame) -> DataFrame:
        from overturelink_data_pipeline_spark.operators.similarity import (
            _lloyd_assign,
        )

        return _lloyd_assign(emb, self.centroids(), kernel="arrow")

    def append(self, crawl: DataFrame) -> None:
        """Admit a crawl: assign under the FROZEN centroids, append into
        the bucketed release — never re-cluster, never re-shuffle."""
        self._assign(crawl).write.bucketBy(self.buckets, "cl").sortBy("cl").mode(
            "append"
        ).saveAsTable(self._assigned)

    def probe(self, crawl: DataFrame, tau: float | None = None) -> DataFrame:
        from overturelink_data_pipeline_spark.operators.similarity import (
            SEMDEDUP_TAU,
            incremental_cell_prune,
        )

        return incremental_cell_prune(
            self.spark.table(self._assigned),
            self._assign(crawl),
            tau=SEMDEDUP_TAU if tau is None else tau,
        )

    def drop(self) -> None:
        _drop(self.spark, self._assigned, self._cents)


def temp_name(prefix: str) -> str:
    """Collision-free table-name prefix for tests/notebooks."""
    return f"{prefix}_{uuid.uuid4().hex[:8]}"
