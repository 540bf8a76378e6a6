"""Similarity search over the embeddings table (BASELINE.json north
star: brute-force cosine top-k baseline + bucketed variants as the
scale path).

Scale design:

- brute-force top-k: the query vector rides along as a 1-row broadcast
  cross join; scoring is a codegen'd left-fold dot product per row and
  the top-k is TakeOrderedAndProject (per-partition heap + merge) — at
  100 TB this is one scan, no shuffle of the data itself;
- IVF: coarse quantization by k-means-style cell assignment (here:
  per-label centroids computed via posexplode/avg — one aggregation),
  probe the nearest cells only. The probed-cell filter is a partition-
  prunable predicate when the table is written bucketed by cell id;
- random-hyperplane LSH: 16-bit signature via sign-of-dot-product with
  seeded pseudo-random planes (deterministic, JVM-side), candidates
  from signature-band equality.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from overturelink_data_pipeline_spark.operators.dedup import cosine
from overturelink_data_pipeline_spark.registry import spark_query
from overturelink_data_pipeline_spark.session import (
    ensure_parallelism,
    read_table,
)

TOP_K = 20
QUERY_VEC_ID = 0  # fixed, deterministic query point


def _query_vec(df: DataFrame) -> DataFrame:
    return df.filter(F.col("vec_id") == QUERY_VEC_ID).select(
        F.transform("embedding", lambda x: x.cast("double")).alias("qv")
    )


@spark_query(
    "ann_cosine_topk",
    oracle=f"""
    WITH q AS (
      SELECT list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qv
      FROM embeddings WHERE vec_id = {QUERY_VEC_ID}
    )
    SELECT e.vec_id, e.label,
           ROUND(list_cosine_similarity(list_transform(e.embedding, x -> CAST(x AS DOUBLE)), q.qv), 5) AS cos_sim
    FROM embeddings e CROSS JOIN q
    WHERE e.vec_id <> {QUERY_VEC_ID}
    ORDER BY cos_sim DESC, e.vec_id
    LIMIT {TOP_K}
    """,
)
def ann_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-k vs one query vector — the exact
    baseline every ANN variant is recall-checked against."""
    emb = ensure_parallelism(read_table(spark, sf_dir, "embeddings"))
    q = _query_vec(emb)
    scored = (
        emb.filter(F.col("vec_id") != QUERY_VEC_ID)
        .crossJoin(F.broadcast(q))
        .select(
            "vec_id",
            "label",
            F.round(cosine(F.col("embedding"), F.col("qv")), 5).alias("cos_sim"),
        )
    )
    return scored.orderBy(F.col("cos_sim").desc(), F.col("vec_id")).limit(TOP_K)


@spark_query(
    "embedding_norms",
    oracle="""
    SELECT label,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(AVG(sqrt(list_reduce(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), (a, b) -> a + b))), 5) AS avg_l2
    FROM embeddings
    GROUP BY label
    ORDER BY label
    """,
)
def embedding_norms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vector hygiene rollup: per-label count + mean L2 norm."""
    emb = ensure_parallelism(read_table(spark, sf_dir, "embeddings"))
    l2 = F.sqrt(
        F.aggregate(
            F.transform("embedding", lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda s, x: s + x,
        )
    )
    return (
        emb.groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.avg(l2), 5).alias("avg_l2"),
        )
        .orderBy("label")
    )


@spark_query("ann_ivf_topk")
def ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-style ANN: coarse cells = per-label centroids (posexplode →
    avg per (label, dim) → collect to array), probe the 3 nearest
    cells, exact-score only vectors in probed cells. Rows-only;
    recall vs the brute-force baseline is pinned in tests."""
    emb = ensure_parallelism(read_table(spark, sf_dir, "embeddings")).select(
        "vec_id",
        "label",
        F.transform("embedding", lambda x: x.cast("double")).alias("v"),
    )
    # centroid per label: one shuffle on (label, dim), then rebuild arrays
    cent = (
        emb.select("label", F.posexplode("v").alias("dim", "x"))
        .groupBy("label", "dim")
        .agg(F.avg("x").alias("cx"))
        .groupBy("label")
        .agg(F.array_sort(F.collect_list(F.struct("dim", "cx"))).alias("pairs"))
        .select("label", F.transform("pairs", lambda p: p["cx"]).alias("centroid"))
    )
    q = emb.filter(F.col("vec_id") == QUERY_VEC_ID).select(F.col("v").alias("qv"))
    probed = (
        cent.crossJoin(F.broadcast(q))
        .select("label", cosine(F.col("centroid"), F.col("qv")).alias("cell_sim"))
        .orderBy(F.col("cell_sim").desc(), F.col("label"))
        .limit(3)
        .select("label")
    )
    candidates = emb.join(F.broadcast(probed), "label").filter(
        F.col("vec_id") != QUERY_VEC_ID
    )
    scored = candidates.crossJoin(F.broadcast(q)).select(
        "vec_id",
        "label",
        F.round(cosine(F.col("v"), F.col("qv")), 5).alias("cos_sim"),
    )
    return scored.orderBy(F.col("cos_sim").desc(), F.col("vec_id")).limit(TOP_K)


N_PLANES = 16


def _plane(dim: int, seed: int) -> Column:
    """Deterministic pseudo-random hyperplane: component j of plane
    `seed` = sin(seed*10007 + j*97) — cheap, seedable, JVM-side."""
    return F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda j: F.sin(F.lit(seed * 10007) + j * 97),
    )


def lsh_signature(v: Column, dim: int, n_planes: int = N_PLANES) -> Column:
    """Random-hyperplane (SimHash-for-vectors) signature: bit i =
    sign(v · plane_i)."""
    sig = F.lit(0)
    for i in range(n_planes):
        dot = F.aggregate(
            F.zip_with(v, _plane(dim, i), lambda x, p: x * p),
            F.lit(0.0),
            lambda s, x: s + x,
        )
        sig = sig + F.when(dot > 0, F.shiftleft(F.lit(1), i)).otherwise(0)
    return sig


@spark_query("ann_lsh_buckets")
def ann_lsh_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Random-hyperplane LSH bucketing: 16-bit signatures, bucket-size
    histogram (the data layout a bucketed ANN join would shuffle on).
    Rows-only; signature determinism + bucket-join recall in tests."""
    raw = ensure_parallelism(read_table(spark, sf_dir, "embeddings"))
    emb = raw.select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("v")
    )
    # plane constants are built per dimension at plan time — DERIVE the
    # dim from the data (one footer-cheap row) instead of hardcoding:
    # with a wrong dim, zip_with pads with nulls, every dot product
    # goes NULL, and all vectors silently collapse into bucket 0
    dim = len(raw.select("embedding").first()["embedding"])
    sigs = emb.select("vec_id", lsh_signature(F.col("v"), dim).alias("sig"))
    return (
        sigs.groupBy("sig")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > 1)
        .orderBy("sig")
    )


RANGE_TAU = 0.25  # cosine threshold; non-vacuous at every test SF (12 rows @sf0.001, 14 @sf0.01)


@spark_query(
    "ann_range_search",
    oracle=f"""
    WITH q AS (
      SELECT list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qv
      FROM embeddings WHERE vec_id = {QUERY_VEC_ID}
    )
    SELECT e.vec_id, e.label,
           ROUND(list_cosine_similarity(list_transform(e.embedding, x -> CAST(x AS DOUBLE)), q.qv), 5) AS cos_sim
    FROM embeddings e CROSS JOIN q
    WHERE e.vec_id <> {QUERY_VEC_ID}
      AND ROUND(list_cosine_similarity(list_transform(e.embedding, x -> CAST(x AS DOUBLE)), q.qv), 5) >= {RANGE_TAU}
    ORDER BY cos_sim DESC, e.vec_id
    """,
)
def ann_range_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range (radius) search: every vector with cosine ≥ τ of the query
    point — the retrieval primitive for near-duplicate pulls and
    contamination sweeps, where top-k is the wrong contract because the
    match count is unknown a priori.

    Same one-scan shape as ann_cosine_topk (broadcast 1-row query
    vector, no data shuffle) but with a scan-level filter instead of
    TakeOrderedAndProject: at 100 TB the selective τ predicate means
    the only full pass is the embarrassingly parallel score+filter;
    the final sort sees only the matches."""
    emb = ensure_parallelism(read_table(spark, sf_dir, "embeddings"))
    q = _query_vec(emb)
    return (
        emb.filter(F.col("vec_id") != QUERY_VEC_ID)
        .crossJoin(F.broadcast(q))
        .select(
            "vec_id",
            "label",
            F.round(cosine(F.col("embedding"), F.col("qv")), 5).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= RANGE_TAU)
        .orderBy(F.col("cos_sim").desc(), F.col("vec_id"))
    )
