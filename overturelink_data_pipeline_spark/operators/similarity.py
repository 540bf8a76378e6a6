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
- random-hyperplane LSH: 16-bit signature via sign-of-dot-product
  against an INTEGER-lattice plane matrix over 1e-3-quantized vectors
  (exact arithmetic in both engines — oracle-able), computed by an
  Arrow int64-matmul kernel with a Catalyst reference formulation the
  kernel is equality-pinned against;
- PCA power iteration: XᵀXv without materializing XᵀX — driver state
  is d doubles, one scan + one d-row shuffle per iteration.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from overturelink_data_pipeline_spark.operators.dedup import (
    _fresh_persist,
    with_planted_copies,
    cosine,
)
from overturelink_data_pipeline_spark.functions.grouped import grouped_topk
from overturelink_data_pipeline_spark.registry import spark_query
from overturelink_data_pipeline_spark.session import (
    ensure_parallelism,
    read_table,
    sort_bounded,
)

TOP_K = 20
QUERY_VEC_ID = 0  # fixed, deterministic query point



def _round_half_away(x: float, n: int) -> float:
    """DuckDB-ROUND-compatible rounding (half away from zero) for
    DRIVER-side floats: Python's round() is half-to-even and would
    disagree with the oracle exactly on a .5 boundary — the same
    cross-engine hazard the registry conventions pin with F.round/
    ROUND pairs on the executor side. Decimal(x) is the binary-exact
    value, matching what DuckDB rounds."""
    from decimal import ROUND_HALF_UP, Decimal

    q = Decimal(1).scaleb(-n)
    return float(Decimal(x).quantize(q, rounding=ROUND_HALF_UP))


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
        .transform(sort_bounded, "label")
    )


IVF_PROBES = 3


def _ivf_oracle() -> str:
    """DuckDB replica of the IVF plan: per-label centroids (1e-6
    rounded, pinning cell ranking against summation-order drift — the
    embedding_kmeans recipe), probe the IVF_PROBES nearest cells,
    exact-score the probed cells only."""
    return f"""
    WITH emb AS (
      SELECT vec_id, label,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM embeddings
    ),
    cent AS (
      SELECT label, list(cx ORDER BY dim) AS centroid
      FROM (SELECT label, dim, ROUND(AVG(x), 6) AS cx
            FROM (SELECT label, generate_subscripts(v, 1) AS dim,
                         unnest(v) AS x FROM emb)
            GROUP BY label, dim) t
      GROUP BY label
    ),
    q AS (SELECT v AS qv FROM emb WHERE vec_id = {QUERY_VEC_ID}),
    probed AS (
      SELECT label
      FROM cent CROSS JOIN q
      ORDER BY ROUND(list_cosine_similarity(centroid, qv), 6) DESC, label
      LIMIT {IVF_PROBES}
    )
    SELECT e.vec_id, e.label,
           ROUND(list_cosine_similarity(e.v, q.qv), 5) AS cos_sim
    FROM emb e JOIN probed USING (label) CROSS JOIN q
    WHERE e.vec_id <> {QUERY_VEC_ID}
    ORDER BY cos_sim DESC, e.vec_id
    LIMIT {TOP_K}
    """


@spark_query("ann_ivf_topk", oracle=_ivf_oracle())
def ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-style ANN: coarse cells = per-label centroids (posexplode →
    avg per (label, dim) → collect to array), probe the IVF_PROBES
    nearest cells, exact-score only vectors in probed cells.

    Oracle'd since round 4 (was rows-only): centroids round to 1e-6 in
    both engines (the embedding_kmeans recipe) and the probe ranking
    orders by 1e-6-rounded cell similarity with a label tie-break, so
    cell selection — the only place cross-engine float drift could
    change the RESULT SET rather than a display digit — is pinned.
    Recall vs the brute-force baseline additionally pinned in tests."""
    emb = ensure_parallelism(read_table(spark, sf_dir, "embeddings")).select(
        "vec_id",
        "label",
        F.transform("embedding", lambda x: x.cast("double")).alias("v"),
    )
    # centroid per label: one shuffle on (label, dim), then rebuild arrays
    cent = (
        emb.select("label", F.posexplode("v").alias("dim", "x"))
        .groupBy("label", "dim")
        .agg(F.round(F.avg("x"), 6).alias("cx"))
        .groupBy("label")
        .agg(F.array_sort(F.collect_list(F.struct("dim", "cx"))).alias("pairs"))
        .select("label", F.transform("pairs", lambda p: p["cx"]).alias("centroid"))
    )
    q = emb.filter(F.col("vec_id") == QUERY_VEC_ID).select(F.col("v").alias("qv"))
    probed = (
        cent.crossJoin(F.broadcast(q))
        .select(
            "label",
            F.round(cosine(F.col("centroid"), F.col("qv")), 6).alias("cell_sim"),
        )
        .orderBy(F.col("cell_sim").desc(), F.col("label"))
        .limit(IVF_PROBES)
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

#: Fixed-point scale for the integer-lattice LSH: vector components
#: quantize to round(x * 1000) as BIGINT before the plane dot product,
#: so every signature bit is decided by EXACT integer arithmetic —
#: no summation-order float drift can flip a near-zero dot product
#: between engines, which is what makes the DuckDB oracle possible.
LSH_SCALE = 1000

_LSH_DIM = 64  # embedding dim across all test SFs (PQ_M x PQ_SUBDIM)


def _lattice_sign(i: int, j: int) -> int:
    """±1 component (i=plane, j=dim) from a pure-integer LCG — the
    same closed form the DuckDB oracle evaluates in SQL."""
    c = (1103515245 * (i * 4096 + j) + 12345) % 2147483648
    return 1 - 2 * ((c >> 15) & 1)


def lsh_signature(v: Column, dim: int, n_planes: int = N_PLANES) -> Column:
    """Random-hyperplane (SimHash-for-vectors) signature over the
    1e-3-quantized integer lattice: bit i = sign(q(v) · plane_i) with
    plane components ±1 from _lattice_sign. Planes are plan-time
    literal arrays (driver-computed constants, not per-row trig)."""
    qv = F.transform(
        v, lambda x: F.round(x * LSH_SCALE, 0).cast("long")
    )
    sig = F.lit(0).cast("long")
    for i in range(n_planes):
        plane = F.array(
            *[F.lit(_lattice_sign(i, j)).cast("long") for j in range(dim)]
        )
        dot = F.aggregate(
            F.zip_with(qv, plane, lambda x, p: x * p),
            F.lit(0).cast("long"),
            lambda s, x: s + x,
        )
        sig = sig + F.when(dot > 0, F.shiftleft(F.lit(1), i)).otherwise(0)
    return sig


def _lsh_oracle() -> str:
    """SQL replica: same quantization, same LCG planes, exact BIGINT
    dot products — bit-identical signatures by construction."""
    return f"""
    WITH emb AS (
      SELECT vec_id,
             list_transform(embedding,
                            x -> CAST(ROUND(CAST(x AS DOUBLE) * {LSH_SCALE}) AS BIGINT)) AS qv
      FROM embeddings
    ),
    ex AS (
      SELECT vec_id, generate_subscripts(qv, 1) - 1 AS j, unnest(qv) AS x
      FROM emb
    ),
    planes AS (
      SELECT i, j,
             1 - 2 * ((((1103515245 * (i * 4096 + j) + 12345) % 2147483648)
                       // 32768) % 2) AS s
      FROM (SELECT unnest(range(0, {N_PLANES})) AS i)
      CROSS JOIN (SELECT unnest(range(0, {_LSH_DIM})) AS j)
    ),
    dots AS (
      SELECT vec_id, i, SUM(x * s) AS dot
      FROM ex JOIN planes USING (j)
      GROUP BY vec_id, i
    ),
    sigs AS (
      SELECT vec_id,
             CAST(SUM(CASE WHEN dot > 0 THEN (1::BIGINT << i) ELSE 0 END)
                  AS BIGINT) AS sig
      FROM dots GROUP BY vec_id
    )
    SELECT sig, CAST(COUNT(*) AS BIGINT) AS n
    FROM sigs GROUP BY sig HAVING COUNT(*) > 1 ORDER BY sig
    """


def _lsh_signature_udf(dim: int, n_planes: int = N_PLANES):
    """Arrow-batched numpy replica of ``lsh_signature``: int64 matmul
    against the ±1 plane matrix — EXACT integer arithmetic, so it is
    bit-identical to the Catalyst version (pinned by
    test_llm_ops.test_ann_lsh_udf_matches_catalyst) and to the DuckDB
    oracle. Exists for the same measured reason as ann_pq_topk's
    codes_udf: 16 planes × dim interpreted zip_with/aggregate lambdas
    cost ~0.5 ms/row (3.7 s at sf0.1) vs microseconds for the numpy
    batch (~0.6 s)."""
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    P = np.array(
        [[_lattice_sign(i, j) for j in range(dim)] for i in range(n_planes)],
        dtype=np.int64,
    )
    weights = np.int64(1) << np.arange(n_planes, dtype=np.int64)

    @pandas_udf("long")
    def sig(v: pd.Series) -> pd.Series:
        X = np.stack(v.to_numpy()).astype(np.float64) * LSH_SCALE
        # ROUND-half-away-from-zero matching Spark/DuckDB round().
        # NOT floor(abs+0.5): adding 0.5 re-rounds in IEEE (abs(x) =
        # 0.49999999999999994 + 0.5 == 1.0 exactly), flipping a
        # boundary quantization the engines' decimal-exact round()
        # would not. floor + exact-fraction compare has no addition:
        # a - floor(a) is exact for |a| < 2^52.
        a = np.abs(X)
        f = np.floor(a)
        q = f + (a - f >= 0.5)
        Q = np.copysign(q, X).astype(np.int64)
        dots = Q @ P.T  # exact int64
        return pd.Series(((dots > 0) * weights).sum(axis=1))

    return sig


@spark_query("ann_lsh_buckets", oracle=_lsh_oracle())
def ann_lsh_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Random-hyperplane LSH bucketing: 16-bit signatures, bucket-size
    histogram (the data layout a bucketed ANN join would shuffle on).

    Oracle'd since round 4 (was rows-only): the planes are an INTEGER
    lattice (±1 components from a shared LCG closed form) over
    1e-3-quantized vectors, so the sign of every dot product is exact
    integer arithmetic in both engines — the float-drift escape the
    old sin-based planes couldn't offer. The hot path runs the Arrow
    numpy kernel (_lsh_signature_udf); ``lsh_signature`` is the
    Catalyst reference the kernel is equality-pinned against.
    Signature determinism + bucket-join recall additionally pinned in
    tests."""
    raw = ensure_parallelism(read_table(spark, sf_dir, "embeddings"))
    emb = raw.select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("v")
    )
    # plane constants are built per dimension at plan time — DERIVE the
    # dim from the data (one footer-cheap row) instead of hardcoding:
    # with a wrong dim, the matmul would raise (the Catalyst zip_with
    # version silently NULL-padded instead)
    dim = len(raw.select("embedding").first()["embedding"])
    # the oracle SQL bakes _LSH_DIM into its plane CTE at import time,
    # so a fixture-dimension change must fail HERE, not as a silent
    # driver-check hash mismatch (ADVICE r4)
    if dim != _LSH_DIM:  # ValueError, not assert — must survive python -O
        raise ValueError(
            f"embedding dim {dim} != _LSH_DIM {_LSH_DIM}; the ann_lsh_buckets "
            "oracle bakes the plane lattice for _LSH_DIM — update it together "
            "with the fixture"
        )
    sig = _lsh_signature_udf(dim)
    sigs = emb.select("vec_id", sig(F.col("v")).alias("sig"))
    return (
        sigs.groupBy("sig")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
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


# ---------------------------------------------------------------------------
# k-NN join (many query points × full base set)
# ---------------------------------------------------------------------------

N_QUERIES = 10  # vec_id < 10 are the query points
K_NN = 5


@spark_query(
    "knn_join",
    oracle=f"""
    WITH q AS (
      SELECT vec_id AS qid, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qv
      FROM embeddings WHERE vec_id < {N_QUERIES}
    ),
    scored AS (
      SELECT q.qid, e.vec_id,
             ROUND(list_cosine_similarity(list_transform(e.embedding, x -> CAST(x AS DOUBLE)), q.qv), 5) AS cos_sim
      FROM embeddings e CROSS JOIN q
      WHERE e.vec_id >= {N_QUERIES}
    )
    SELECT qid, vec_id, cos_sim,
           CAST(ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cos_sim DESC, vec_id) AS INTEGER) AS rank
    FROM scored
    QUALIFY rank <= {K_NN}
    ORDER BY qid, rank
    """,
)
def knn_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-NN join: top-k cosine neighbors in the base set for EACH of a
    small query set (the retrieval shape of dataset decontamination /
    eval-leak sweeps: "for every eval prompt, its nearest training
    docs").

    Scale shape: the query side broadcasts (it is small by contract)
    and scoring is one embarrassingly parallel pass over the base set.
    Top-k-per-query then runs in TWO window phases. Phase 1 partitions
    by (qid, spark_partition_id) — an exchange Spark still inserts,
    but what crosses it is the NARROW score triple (qid, vec_id,
    cos_sim), never the embedding vectors, and its key space has
    |queries|·P partitions so no reducer is hot; it cuts candidates to
    ≤ k·P per query. Phase 2's per-qid exchange then moves only those
    k·P survivors. The single-phase alternative (one window over qid)
    would funnel ALL n·|queries| triples through |queries| reducer
    partitions — the classic top-k skew trap this shape exists to
    avoid. (A truly exchange-free local prune is not expressible in
    DataFrame ops without an imperative mapPartitions, which would
    leave codegen for marginal gain at this row width.)"""
    from pyspark.sql.window import Window

    emb = ensure_parallelism(read_table(spark, sf_dir, "embeddings"))
    q = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("qid"),
        F.transform("embedding", lambda x: x.cast("double")).alias("qv"),
    )
    scored = (
        emb.filter(F.col("vec_id") >= N_QUERIES)
        .crossJoin(F.broadcast(q))
        .select(
            "qid",
            "vec_id",
            F.round(cosine(F.col("embedding"), F.col("qv")), 5).alias("cos_sim"),
        )
    )
    topk = grouped_topk(
        scored,
        ["qid"],
        [F.col("cos_sim").desc(), F.col("vec_id")],
        K_NN,
        rank_col="rank",
    )
    return sort_bounded(
        topk.select("qid", "vec_id", "cos_sim", "rank"), "qid", "rank"
    )


# ---------------------------------------------------------------------------
# Lloyd's k-means over the embedding column (iterative algorithm)
# ---------------------------------------------------------------------------

KMEANS_K = 8
KMEANS_UPDATES = 2  # centroid updates; assignments run UPDATES + 1 times

_KM_EMB = "SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings"
_KM_ASSIGN = """
  SELECT e.vec_id, e.v,
         (SELECT c.cl FROM {cents} c ORDER BY list_distance(e.v, c.c), c.cl LIMIT 1) AS cl
  FROM emb e
"""
_KM_UPDATE = """
  SELECT cl, list(cx ORDER BY dim) AS c
  FROM (SELECT cl, dim, ROUND(AVG(x), 6) AS cx
        FROM (SELECT cl, generate_subscripts(v, 1) AS dim, unnest(v) AS x FROM {assigned})
        GROUP BY cl, dim) t
  GROUP BY cl
"""


#: k × dim above which ``_lloyd_assign`` switches from the Catalyst
#: literal-array fold to the Arrow argmin kernel. The fold's zip_with/
#: aggregate lambdas are INTERPRETED (~O(k·d) per row — the sf3 k∝n
#: probe measured 23.1 s of pure assignment at k=100); at the k=8
#: registered-query scale the fold is fine and keeps the plan
#: UDF-free. 2048 leaves every oracle'd query (k·d = 512) on the
#: Catalyst path while the k∝n scale mode gets the kernel.
_ASSIGN_KERNEL_MIN_KD = 2048


def _assign_argmin_udf(cents: dict[int, list[float]]):
    """Arrow-batched numpy replica of ``_lloyd_assign``'s Catalyst
    fold (VERDICT r4 ask #3 — the ann_pq_topk codes_udf shape, one
    codebook instead of PQ_M).

    Bit-identity with the fold is by CONSTRUCTION, not accident: the
    accumulation loops over dimensions j in index order, so each
    (row, centroid) distance performs exactly the IEEE sequence
    ``acc += (v_j - c_j)²`` that F.aggregate's left fold (and the
    DuckDB oracle's list_reduce) performs — a whole-matrix
    ``((V-C)**2).sum(axis=2)`` would use numpy's pairwise summation,
    whose last-bit drift can flip an argmin on a near-tie boundary.
    Ties break to the FIRST (lowest-id) centroid in both paths
    (np.argmin / array_position). Pinned against the Catalyst fold in
    tests/test_llm_ops.py."""
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    cls = sorted(cents)
    C = np.array([cents[c] for c in cls], dtype=np.float64)  # (k, d)
    ids = np.array(cls, dtype=np.int64)

    @pandas_udf("long")
    def cl(vcol: pd.Series) -> pd.Series:
        V = np.stack(vcol.to_numpy()).astype(np.float64)  # (n, d)
        acc = np.zeros((V.shape[0], C.shape[0]), dtype=np.float64)
        for j in range(C.shape[1]):
            t = V[:, j, None] - C[None, :, j]
            acc += t * t
        return pd.Series(ids[np.argmin(acc, axis=1)])

    return cl


def _lloyd_assign(
    emb: DataFrame, cents: dict[int, list[float]], kernel: str = "auto"
) -> DataFrame:
    """Attach the nearest-centroid cluster id as ``cl``: centroids are
    bounded driver state (k x dim) broadcast as literal arrays; the
    squared-distance argmin is one codegen'd pass over the scan for
    small k·d, or the Arrow argmin kernel (bit-identical — see
    ``_assign_argmin_udf``) once the interpreted fold's per-row cost
    dominates. ``kernel``: "auto" (size-based), "catalyst", "arrow".
    Ties break to the lowest cluster id (``array_position`` takes the
    first minimum; the oracle orders by distance, cl)."""
    cls = sorted(cents)
    kd = len(cls) * (len(next(iter(cents.values()))) if cents else 0)
    if kernel == "arrow" or (kernel == "auto" and kd >= _ASSIGN_KERNEL_MIN_KD):
        return emb.withColumn("cl", _assign_argmin_udf(cents)(F.col("v")))
    dists = F.array(
        *[
            F.aggregate(
                F.zip_with(
                    F.col("v"),
                    F.array(*[F.lit(x) for x in cents[c]]),
                    lambda a, b: (a - b) * (a - b),
                ),
                F.lit(0.0),
                lambda s, x: s + x,
            )
            for c in cls
        ]
    )
    pos = F.array_position(dists, F.array_min(dists)).cast("int")
    cl = F.element_at(F.array(*[F.lit(c).cast("bigint") for c in cls]), pos)
    return emb.withColumn("cl", cl)


def _lloyd_fit(
    emb: DataFrame,
    k: int = KMEANS_K,
    updates: int = KMEANS_UPDATES,
    kernel: str = "auto",
) -> dict[int, list[float]]:
    """Lloyd's k-means fit with deterministic init (first ``k`` vectors
    by vec_id) and 1e-6-rounded centroid updates; returns the fitted
    centroids. Each iteration is one scan + one bounded k x dim shuffle
    (posexplode -> groupBy(cluster, dim) avg, map-side combinable).
    ``kernel`` passes through to ``_lloyd_assign`` — callers whose fit
    runs over a persisted frame several times (the in-query incremental
    lifecycle) force "arrow"; the Arrow kernel is pinned bit-identical
    to the Catalyst fold, so the centroids (and every oracle boundary
    downstream) are unchanged."""
    init = emb.filter(F.col("vec_id") < k).orderBy("vec_id").collect()
    cents: dict[int, list[float]] = {int(r["vec_id"]): list(r["v"]) for r in init}
    for _ in range(updates):
        rows = (
            _lloyd_assign(emb, cents, kernel=kernel)
            .select("cl", F.posexplode("v").alias("dim", "x"))
            .groupBy("cl", "dim")
            .agg(F.round(F.avg("x"), 6).alias("cx"))
            .collect()
        )
        by_cl: dict[int, dict[int, float]] = {}
        for r in rows:
            by_cl.setdefault(int(r["cl"]), {})[int(r["dim"])] = float(r["cx"])
        cents = {cl: [d[i] for i in range(len(d))] for cl, d in by_cl.items()}
    return cents


@spark_query(
    "embedding_kmeans",
    oracle=f"""
    WITH emb AS ({_KM_EMB}),
    c0 AS (SELECT vec_id AS cl, v AS c FROM emb WHERE vec_id < {KMEANS_K}),
    a1 AS ({_KM_ASSIGN.format(cents='c0')}),
    c1 AS ({_KM_UPDATE.format(assigned='a1')}),
    a2 AS ({_KM_ASSIGN.format(cents='c1')}),
    c2 AS ({_KM_UPDATE.format(assigned='a2')}),
    a3 AS ({_KM_ASSIGN.format(cents='c2')})
    SELECT a3.cl AS cluster,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(sqrt(list_reduce(list_transform(c2.c, x -> x * x), (a, b) -> a + b)), 4) AS centroid_l2
    FROM a3 JOIN c2 ON c2.cl = a3.cl
    GROUP BY a3.cl, c2.c
    ORDER BY cluster
    """,
)
def embedding_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lloyd's k-means, k=8, 2 centroid updates + final assignment,
    deterministic init (the first k vectors by vec_id) — the iterative-
    algorithm pattern (same structure as Spark MLlib KMeans): centroids
    are DRIVER state bounded by k x dim (512 doubles here — never
    corpus-sized), broadcast into each assignment pass as literal
    arrays; assignment is an embarrassingly parallel scan; the update
    is a posexplode -> groupBy(cluster, dim) avg — map-side combinable
    with exactly k x dim groups, so each iteration is one scan + one
    bounded shuffle. Centroids round to 1e-6 at every update in BOTH
    engines, pinning the assignment boundaries against summation-order
    drift; ties break to the lowest cluster id in both (array_position
    takes the first minimum; the oracle orders by distance, cl).
    Squared distance vs the oracle's euclidean is argmin-equivalent."""
    import math

    emb = ensure_parallelism(read_table(spark, sf_dir, "embeddings")).select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("v")
    )
    cents = _lloyd_fit(emb)

    def assign(cents: dict[int, list[float]]) -> DataFrame:
        return _lloyd_assign(emb, cents)

    cls = sorted(cents)
    l2 = {
        c: _round_half_away(math.sqrt(sum(x * x for x in cents[c])), 4)
        for c in cls
    }
    l2_lookup = F.map_from_arrays(
        F.array(*[F.lit(c).cast("bigint") for c in cls]),
        F.array(*[F.lit(l2[c]) for c in cls]),
    )
    return (
        assign(cents)
        .groupBy("cl")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
        .select(
            F.col("cl").alias("cluster"),
            "n",
            F.element_at(l2_lookup, F.col("cl")).alias("centroid_l2"),
        )
        .transform(sort_bounded, "cluster")
    )


# ---------------------------------------------------------------------------
# Principal component by power iteration — the embedding-hygiene
# primitive (dominant-direction removal / ABTT "all-but-the-top",
# whitening diagnostics) and the simplest member of the distributed
# iterative linear-algebra family.
# ---------------------------------------------------------------------------

PCA_ITERS = 3


def _pca_oracle() -> str:
    """Baked power-iteration CTEs (the embedding_kmeans recipe): v0 is
    the exact literal 1/sqrt(64), every iterate renormalizes and rounds
    to 1e-6 in both engines, so cross-engine summation drift cannot
    compound across iterations."""
    v0 = "[" + ", ".join(["0.125"] * _LSH_DIM) + "]"
    parts = [
        "WITH emb AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),",
        f"    v0 AS (SELECT {v0} AS vv)",
    ]
    prev = "v0"
    for t in range(1, PCA_ITERS + 1):
        parts.append(
            f""",
    s{t} AS (SELECT e.vec_id,
                    list_dot_product(e.v, (SELECT vv FROM {prev})) AS s
             FROM emb e),
    w{t} AS (SELECT dim, SUM(s * x) AS w
             FROM (SELECT s{t}.s, generate_subscripts(e.v, 1) AS dim,
                          unnest(e.v) AS x
                   FROM emb e JOIN s{t} USING (vec_id)) u
             GROUP BY dim),
    n{t} AS (SELECT sqrt(SUM(w * w)) AS nrm FROM w{t}),
    v{t} AS (SELECT list(ROUND(w / nrm, 6) ORDER BY dim) AS vv
             FROM w{t} CROSS JOIN n{t})"""
        )
        prev = f"v{t}"
    last = PCA_ITERS
    parts.append(
        f"""
    SELECT CAST(dim AS BIGINT) AS dim,
           ROUND(w / nrm, 6) AS component,
           ROUND(nrm, 2) AS eigenvalue
    FROM w{last} CROSS JOIN n{last}
    ORDER BY dim"""
    )
    return "".join(parts)


@spark_query("embedding_pca_power", oracle=_pca_oracle())
def embedding_pca_power(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top principal direction of the (uncentered) embedding Gram
    matrix by PCA_ITERS power iterations: v ← normalize(XᵀX v),
    reported per dimension with the Rayleigh eigenvalue estimate
    (‖XᵀX v‖ for unit v).

    Iterative-algorithm discipline (the embedding_kmeans pattern): the
    iterate v is DRIVER state bounded by d doubles, broadcast into each
    pass as a literal array; one pass computes sᵢ = xᵢ·v in codegen and
    reduces w = Σ sᵢ xᵢ with a posexplode → groupBy(dim) sum — map-side
    combinable with exactly d groups, so each iteration is ONE scan +
    one bounded d-row shuffle, never a d×d matrix materialization
    (XᵀX itself is d² and never built — the iteration only ever needs
    XᵀX·v, which is two passes fused into one). Renormalized iterates
    round to 1e-6 in both engines, pinning the per-iteration state
    against summation-order drift exactly like the k-means centroids.
    The LAST iteration stays in-plan (w as a DataFrame, 1-row norm
    broadcast) so the result is distributed, not driver-built."""
    emb = ensure_parallelism(read_table(spark, sf_dir, "embeddings")).select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("v")
    )
    import math

    dim = len(emb.select("v").first()["v"])
    # the oracle bakes v0 = 0.125 = 1/sqrt(_LSH_DIM) as a literal
    # array of _LSH_DIM entries — fail loudly on a fixture-dim change
    # rather than hash-mismatching at driver time (ADVICE r4)
    if dim != _LSH_DIM:  # ValueError, not assert — must survive python -O
        raise ValueError(
            f"embedding dim {dim} != _LSH_DIM {_LSH_DIM}; the "
            f"embedding_pca_power oracle bakes a {_LSH_DIM}-entry v0 literal"
        )
    v = [0.125] * dim  # exact literal 1/sqrt(64), matching the oracle

    def pass_frames(vec: list[float]):
        vlit = F.array(*[F.lit(x) for x in vec])
        s = F.aggregate(
            F.zip_with("v", vlit, lambda a, b: a * b),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        return (
            emb.withColumn("s", s)
            .select("s", F.posexplode("v").alias("dim0", "x"))
            .groupBy("dim0")
            .agg(F.sum(F.col("s") * F.col("x")).alias("w"))
        )

    for _ in range(PCA_ITERS - 1):
        rows = pass_frames(v).collect()
        w = {int(r["dim0"]): float(r["w"]) for r in rows}
        nrm = math.sqrt(sum(x * x for x in w.values()))
        v = [_round_half_away(w[j] / nrm, 6) for j in range(dim)]

    # eager localCheckpoint pins the d-row aggregate BEFORE it branches
    # into the norm job and the component projection — without it the
    # broadcast(nrm_df) evaluation and the main plan each re-ran the
    # full corpus pass (2 scans for the final iteration, breaking the
    # one-scan-per-iteration discipline)
    wdf = pass_frames(v).localCheckpoint(True)
    nrm_df = wdf.agg(
        F.sqrt(F.sum(F.col("w") * F.col("w"))).alias("nrm")
    )
    return (
        wdf.crossJoin(F.broadcast(nrm_df))
        .select(
            (F.col("dim0") + 1).cast("bigint").alias("dim"),
            F.round(F.col("w") / F.col("nrm"), 6).alias("component"),
            F.round("nrm", 2).alias("eigenvalue"),
        )
        .transform(sort_bounded, "dim")
    )


# ---------------------------------------------------------------------------
# Product quantization + asymmetric distance computation (ADC) — the
# billion-scale ANN memory plan (Jégou et al., "Product Quantization
# for Nearest Neighbor Search", TPAMI 2011).
# ---------------------------------------------------------------------------

PQ_M = 4  # subspaces (64-dim embeddings -> 4 x 16)
PQ_SUBDIM = 16
PQ_K = 8  # centroids per subspace codebook
PQ_TOPK = 20


def _pq_oracle() -> str:
    parts = [
        "WITH emb AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings)"
    ]
    for s in range(PQ_M):
        lo, hi = s * PQ_SUBDIM + 1, (s + 1) * PQ_SUBDIM
        parts.append(
            f""",
    s{s} AS (SELECT vec_id, list_slice(v, {lo}, {hi}) AS v FROM emb),
    c0_{s} AS (SELECT vec_id AS cl, v AS c FROM s{s} WHERE vec_id < {PQ_K}),
    a1_{s} AS (SELECT e.vec_id, e.v,
               (SELECT c.cl FROM c0_{s} c ORDER BY list_distance(e.v, c.c), c.cl LIMIT 1) AS cl
               FROM s{s} e),
    c1_{s} AS (SELECT cl, list(cx ORDER BY dim) AS c
               FROM (SELECT cl, dim, ROUND(AVG(x), 6) AS cx
                     FROM (SELECT cl, generate_subscripts(v, 1) AS dim, unnest(v) AS x FROM a1_{s})
                     GROUP BY cl, dim) t
               GROUP BY cl),
    a2_{s} AS (SELECT e.vec_id,
               (SELECT c.cl FROM c1_{s} c ORDER BY list_distance(e.v, c.c), c.cl LIMIT 1) AS cl
               FROM s{s} e),
    q_{s} AS (SELECT v FROM s{s} WHERE vec_id = {QUERY_VEC_ID}),
    p_{s} AS (SELECT a.vec_id, a.cl,
              ROUND(power(list_distance(q_{s}.v, c.c), 2), 6) AS p
              FROM a2_{s} a JOIN c1_{s} c USING (cl) CROSS JOIN q_{s})"""
        )
    code = " || '-' || ".join(f"CAST(p_{s}.cl AS VARCHAR)" for s in range(PQ_M))
    adc = " + ".join(f"p_{s}.p" for s in range(PQ_M))
    joins = " ".join(f"JOIN p_{s} USING (vec_id)" for s in range(PQ_M))
    parts.append(
        f"""
    SELECT emb.vec_id, {code} AS pq_code, ROUND({adc}, 4) AS adc_dist
    FROM emb {joins}
    WHERE emb.vec_id <> {QUERY_VEC_ID}
    ORDER BY adc_dist, emb.vec_id
    LIMIT {PQ_TOPK}"""
    )
    return "".join(parts)


def _pq_codebook_arrays(cbooks: list[dict[int, list[float]]]):
    """Codebook dicts → (C, ids) numpy arrays in sorted-cluster-id
    order. THE one PQ codebook layout — the encode UDF and the Lloyd
    update kernel must assign against identical arrays or centroids
    and codes drift apart (the oracle's a1/a2 CTEs assume one
    assignment function)."""
    import numpy as np

    cls = [sorted(cbooks[s]) for s in range(PQ_M)]
    C = [
        np.array([cbooks[s][c] for c in cls[s]], dtype=np.float64)
        for s in range(PQ_M)
    ]
    ids = [np.array(cls[s], dtype=np.int64) for s in range(PQ_M)]
    return C, ids


def _pq_assign_sub(V, C, s: int):
    """Per-subspace squared-distance argmin: returns (Vs, assignment
    POSITIONS into C[s]). Ties break to the first (lowest-id) centroid
    (np.argmin), matching the oracle's ORDER BY distance, cl LIMIT 1.
    The matrix form's pairwise summation is shared by every PQ caller,
    so a near-tie flip cannot split encode from update.

    Cross-ENGINE drift (vs the DuckDB oracle) is accepted as bounded,
    not eliminated (review r10 raised both channels): (a) numpy's
    summation order differs from list_distance's fold, so an argmin
    could flip only on a ~1-ulp tie between two centroid distances —
    centroids are ROUND(avg, 6) lattice points against real-valued
    data, so exact ties don't arise and 1-ulp ones are measure-zero;
    (b) the oracle's partial distances square a sqrt
    (power(list_distance, 2)) where this side sums squares directly —
    a ~1e-16-relative wobble that only matters within 1e-16·value of
    a 0.5e-6 rounding boundary. Forcing identical fold order would
    mean abandoning the GEMM for per-element UDF loops on both sides;
    the adc values are rounded to 1e-6/1e-4 precisely so ulp noise
    cannot reach the compared digits except at those boundaries."""
    Vs = V[:, s * PQ_SUBDIM : (s + 1) * PQ_SUBDIM]
    d2 = ((Vs[:, None, :] - C[s][None, :, :]) ** 2).sum(axis=2)
    return Vs, d2.argmin(axis=1)


def _pq_lloyd_update(
    emb: DataFrame, cents: list[dict[int, list[float]]]
) -> list[dict[int, list[float]]]:
    """One PQ Lloyd update, fused across subspaces INSIDE the encode
    kernel (r7): one mapInPandas pass assigns with the IDENTICAL
    squared-distance matrix codes_udf evaluates (argmin parity with
    the oracle's a1 CTE is inherited, not re-derived) and emits
    per-batch partial sums — a frame bounded by partitions x PQ_M x
    PQ_K rows — so the r6 shape's posexplode x64 of every vector and
    its groupBy(s, cl, dim) shuffle are gone; the rounded avg
    finishes on the driver from exact partial sums + counts.
    Summation ORDER differs from both F.avg and DuckDB's AVG either
    way — the 1e-6 rounding both engines apply is what pins the
    downstream boundaries (the kmeans/IVF/PCA recipe).

    Extracted as a function in r8 so the centroid VALUES themselves
    are pinned in a committed fixture (fixtures/pq_centroids/,
    tests/test_round8_ops.py — ADVICE r7): if a near-boundary mean
    ever flips the 1e-6 round, the fixture diff attributes it to this
    kernel instead of surfacing as an opaque driver hash mismatch."""
    import numpy as np

    def update_partials():
        # the SAME codebook arrays + per-subspace argmin as codes_udf
        # (_pq_codebook_arrays / _pq_assign_sub): centroids computed
        # under one assignment and codes under another would drift the
        # oracle's a1 CTE — sharing the kernel makes parity structural.
        C, ids = _pq_codebook_arrays(cents)
        n_cls = [len(i) for i in ids]

        def gen(batches):
            sums = np.zeros((PQ_M, PQ_K, PQ_SUBDIM), dtype=np.float64)
            cnts = np.zeros((PQ_M, PQ_K), dtype=np.int64)
            for pdf in batches:
                if not len(pdf):
                    continue
                V = np.stack(pdf["v"].to_numpy())
                for s in range(PQ_M):
                    Vs, a = _pq_assign_sub(V, C, s)
                    for k in range(n_cls[s]):
                        m = a == k
                        if m.any():
                            sums[s, k] += Vs[m].sum(axis=0)
                            cnts[s, k] += int(m.sum())
            rows = [
                (s, int(ids[s][k]), int(cnts[s, k]), sums[s, k].tolist())
                for s in range(PQ_M)
                for k in range(n_cls[s])
                if cnts[s, k]
            ]
            yield pd.DataFrame(rows, columns=["s", "cl", "n", "sums"])

        return gen

    partials = emb.select("v").mapInPandas(
        update_partials(), schema="s int, cl long, n long, sums array<double>"
    )
    agg: dict[tuple[int, int], list] = {}
    for r in partials.collect():
        acc = agg.setdefault(
            (int(r["s"]), int(r["cl"])), [np.zeros(PQ_SUBDIM), 0]
        )
        acc[0] += np.asarray(r["sums"], dtype=np.float64)
        acc[1] += int(r["n"])
    return [
        {
            cl: [
                _round_half_away(float(sv) / n, 6)
                for sv in acc_sum
            ]
            for (s_, cl), (acc_sum, n) in agg.items()
            if s_ == s
        }
        for s in range(PQ_M)
    ]


@spark_query("ann_pq_topk", oracle=_pq_oracle())
def ann_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ-ADC approximate nearest neighbours: per-subspace k-means
    codebooks (deterministic init = first PQ_K vectors, one rounded
    Lloyd update — the embedding_kmeans pattern), each vector encoded
    as PQ_M codebook ids, and query distance computed asymmetrically
    from a PQ_M x PQ_K table of precomputed query->centroid partial
    distances.

    100 TB plan shape — why PQ is *the* memory plan at scale: the
    corpus is stored as PQ_M bytes per vector (here 4 codes vs 64
    floats, a 64x compression), codebooks are driver state bounded by
    PQ_M x PQ_K x PQ_SUBDIM doubles shipped inside the UDF closure /
    as map literals, and the query-time scan over an already-encoded
    corpus does ZERO vector arithmetic per row — the ADC distance is
    PQ_M map lookups + a 4-term sum in whole-stage codegen; top-k is
    TakeOrderedAndProject (per-partition heaps, no shuffle of data).
    Codebook training touches each vector's slices once per pass (one
    scan + one bounded k x dim shuffle per update, fused across all
    subspaces here).

    Quantization (argmin over PQ_K centroids per subspace) runs as an
    Arrow-vectorized pandas UDF: the pure-Catalyst formulation (PQ_K
    zip_with/aggregate folds per subspace) measured ~7.5 ms/row at sf1
    — higher-order lambdas are interpreted, not codegen'd, and the
    argmin tree is evaluated per centroid — vs microseconds/row for
    the numpy batch argmin. This is the documented Pandas-UDF escape
    hatch: built-ins genuinely can't express a vectorized argmin over
    a codebook efficiently.
    """
    emb = ensure_parallelism(read_table(spark, sf_dir, "embeddings")).select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("v")
    )

    def codes_udf(cbooks: list[dict[int, list[float]]]):
        C, ids = _pq_codebook_arrays(cbooks)

        @F.pandas_udf("array<bigint>")
        def codes(vcol: pd.Series) -> pd.Series:
            import numpy as np

            V = np.stack(vcol.to_numpy())
            out = np.empty((len(vcol), PQ_M), dtype=np.int64)
            for s in range(PQ_M):
                _, a = _pq_assign_sub(V, C, s)
                out[:, s] = ids[s][a]
            return pd.Series(out.tolist())

        return codes

    # --- codebook init: subvectors of the first PQ_K vectors; the same
    # collect also yields the query vector (QUERY_VEC_ID < PQ_K). Read
    # WITHOUT the parallelism rescue: the vec_id filter pushes to the
    # scan and returns PQ_K rows — a repartition ahead of an 8-row
    # collect was one of the three job-fixed costs behind the r6 weak
    # entry (2.9x on a 0.90 s DuckDB baseline).
    raw = read_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("v")
    )
    init = sorted(
        raw.filter(F.col("vec_id") < max(PQ_K, QUERY_VEC_ID + 1)).collect(),
        key=lambda r: int(r["vec_id"]),
    )
    q = next(list(r["v"]) for r in init if int(r["vec_id"]) == QUERY_VEC_ID)
    cents: list[dict[int, list[float]]] = [
        {
            int(r["vec_id"]): list(r["v"])[s * PQ_SUBDIM : (s + 1) * PQ_SUBDIM]
            for r in init
            if int(r["vec_id"]) < PQ_K
        }
        for s in range(PQ_M)
    ]

    cents = _pq_lloyd_update(emb, cents)

    # --- ADC partial-distance table (driver-side: PQ_M x PQ_K doubles)
    partial: list[dict[int, float]] = []
    for s in range(PQ_M):
        qs = q[s * PQ_SUBDIM : (s + 1) * PQ_SUBDIM]
        partial.append(
            {
                cl: _round_half_away(sum((a - b) * (a - b) for a, b in zip(qs, c)), 6)
                for cl, c in cents[s].items()
            }
        )

    def p_lookup(s: int) -> Column:
        cls = sorted(partial[s])
        m = F.map_from_arrays(
            F.array(*[F.lit(c).cast("bigint") for c in cls]),
            F.array(*[F.lit(partial[s][c]) for c in cls]),
        )
        return F.element_at(m, F.element_at("codes", s + 1))

    coded = emb.filter(F.col("vec_id") != QUERY_VEC_ID).select(
        "vec_id", codes_udf(cents)(F.col("v")).alias("codes")
    )
    adc = F.round(sum(p_lookup(s) for s in range(PQ_M)), 4)
    return (
        coded.select(
            "vec_id",
            F.concat_ws(
                "-",
                *[
                    F.element_at("codes", s + 1).cast("string")
                    for s in range(PQ_M)
                ],
            ).alias("pq_code"),
            adc.alias("adc_dist"),
        )
        .orderBy("adc_dist", "vec_id")
        .limit(PQ_TOPK)
    )


# ---------------------------------------------------------------------------
# SemDeDup — semantic deduplication (Abbas et al., "SemDeDup: Data-
# efficient learning at web-scale through semantic deduplication",
# arXiv 2303.09540): cluster the embedding space with k-means, then
# prune near-identical points WITHIN each cluster only.
# ---------------------------------------------------------------------------

#: Within-cluster cosine threshold above which the later point is pruned.
SEMDEDUP_TAU = 0.9
#: Every SEMDEDUP_MODULUS-th vector donates a perturbed copy (first dim
#: +0.05, id +1e6) — the planted near-dup population (the corpus itself
#: has no natural near-dups: max raw pairwise cosine ~0.51).
SEMDEDUP_MODULUS = 13

_SD_EMB = f"""SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
  UNION ALL
  SELECT vec_id + 1000000,
         [list_transform(embedding, x -> CAST(x AS DOUBLE))[1] + 0.05] ||
         list_transform(embedding, x -> CAST(x AS DOUBLE))[2:]
  FROM embeddings WHERE vec_id % {SEMDEDUP_MODULUS} = 0"""


@spark_query(
    "dedup_semantic",
    oracle=f"""
    WITH emb AS ({_SD_EMB}),
    c0 AS (SELECT vec_id AS cl, v AS c FROM emb WHERE vec_id < {KMEANS_K}),
    a1 AS ({_KM_ASSIGN.format(cents="c0")}),
    c1 AS ({_KM_UPDATE.format(assigned="a1")}),
    a2 AS ({_KM_ASSIGN.format(cents="c1")}),
    c2 AS ({_KM_UPDATE.format(assigned="a2")}),
    a3 AS ({_KM_ASSIGN.format(cents="c2")}),
    pairs AS (
      SELECT a.cl, a.vec_id AS keeper_id, b.vec_id AS vec_id,
             ROUND(list_cosine_similarity(a.v, b.v), 5) AS cos_sim
      FROM a3 a JOIN a3 b ON a.cl = b.cl AND a.vec_id < b.vec_id
      WHERE ROUND(list_cosine_similarity(a.v, b.v), 5) >= {SEMDEDUP_TAU}
    )
    SELECT cl AS cluster, vec_id, keeper_id, cos_sim
    FROM pairs
    QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY keeper_id) = 1
    ORDER BY vec_id
    """,
)
def dedup_semantic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup: k-means the corpus (the embedding_kmeans machinery —
    deterministic init, 2 rounded Lloyd updates), then within each
    cluster prune every vector that has an earlier (lower-id) neighbor
    at rounded cosine >= SEMDEDUP_TAU; keeper = the lowest-id such
    neighbor. One row per PRUNED vector — the drop-list a curation
    pipeline feeds back as an anti-join.

    k is pinned at KMEANS_K=8 HERE because the oracle bakes the
    centroid CTEs; the scale path is ``semantic_prune(k=...)`` with
    k ∝ n — scripts/bench_semantic_scale.py demonstrates per-cell pair
    counts staying flat as the corpus grows (BENCH_SF1.md round-4
    section)."""
    return semantic_prune(spark, sf_dir)


def semantic_prune(
    spark: SparkSession, sf_dir: str, k: int = KMEANS_K
) -> DataFrame:
    """Parameterized SemDeDup core (see dedup_semantic).

    Why this survives 100 TB where all-pairs cosine cannot: the k-means
    cells bound the O(n²) — pair enumeration runs per cluster inside
    ``applyInPandas`` as a blocked unit-normalized GEMM (the
    dedup_embedding_cosine strategy, dedup.py:687), centroids are
    driver state (k x dim), and the only corpus-wide movement is the
    one groupBy(cl) exchange. With k ∝ n (bounded mean cell size) the
    per-cell GEMM is O(cell²·d) at CONSTANT cell, i.e. total work
    linear in n — the honest closure of the r3 fixed-k caveat. The
    threshold compares the ROUNDED cosine in both engines so
    numpy-vs-DuckDB last-bit drift cannot flip a boundary pair."""
    emb = ensure_parallelism(read_table(spark, sf_dir, "embeddings")).select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("v")
    )
    perturbed = F.concat(
        F.array(F.element_at("v", 1) + 0.05),
        F.slice("v", 2, F.size("v") - 1),
    )
    # persisted: the scan + cast + planted-copy explode otherwise
    # re-runs for every Lloyd job (init collect, per-iteration updates,
    # final assign) — the same shape semantic_prune_incremental
    # persists for the same reason (measured there: 3.86→3.43 s at sf1)
    corpus = _fresh_persist(
        "sem_prune_corpus",
        with_planted_copies(
            emb, SEMDEDUP_MODULUS, mangle={"v": perturbed}, id_col="vec_id"
        ),
    )
    assigned = _lloyd_assign(corpus, _lloyd_fit(corpus, k=k))

    out_schema = "cluster long, vec_id long, keeper_id long, cos_sim double"

    def block_prune(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        pdf = pdf.sort_values("vec_id")
        ids = pdf["vec_id"].to_numpy()
        m = np.stack(pdf["v"].to_numpy())
        norms = np.linalg.norm(m, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        sims = np.round((m / norms) @ (m / norms).T, 5)
        mask = np.triu(sims >= SEMDEDUP_TAU, k=1)
        pruned = mask.any(axis=0)
        j = np.nonzero(pruned)[0]
        keeper = mask[:, j].argmax(axis=0)  # first (lowest-id) qualifying row
        return pd.DataFrame(
            {
                "cluster": np.full(len(j), int(pdf["cl"].iloc[0]), dtype="int64"),
                "vec_id": ids[j],
                "keeper_id": ids[keeper],
                "cos_sim": sims[keeper, j],
            }
        )

    return (
        assigned.groupBy("cl")
        .applyInPandas(block_prune, schema=out_schema)
        .orderBy("vec_id")
    )


# ---------------------------------------------------------------------------
# Incremental SemDeDup — the semantic leg of the frozen-index lifecycle
# (dedup_incremental = exact shingles, dedup_incremental_minhash = LSH
# signatures, THIS = embedding cells). Built+tested r7, registered r8
# once the agg_sketch_audit merge funded a slot under the registry's
# 100-slot ceiling; also covered by tests/test_round7_ops.py and
# scripts/bench_semantic_scale.py --incremental.
# ---------------------------------------------------------------------------

#: Snapshot boundary shared with the other incremental operators
#: (dedup.INCR_DELTA_MIN) — ids below are the FROZEN release, at or
#: above are the DELTA crawl.
SEM_INCR_DELTA_MIN = 1_000_000


def semantic_prune_incremental(
    spark: SparkSession, sf_dir: str, k: int = KMEANS_K
) -> DataFrame:
    """Incremental SemDeDup: admit a DELTA crawl's embeddings against a
    FROZEN release without re-clustering (or re-shuffling) the corpus.

    Release time (amortized): k-means fit + per-vector cell assignment
    of the frozen corpus (in production: centroids are a k x dim
    sidecar file and the assigned corpus a ``bucketBy(cl)`` table —
    scripts/bench_semantic_scale.py --incremental measures exactly
    that plan). Probe time (per crawl): assign ONLY the delta with the
    frozen centroids (Arrow argmin kernel, embarrassingly parallel
    scan), then per cell compute the delta-vs-(frozen + delta) cosine
    block — a (|delta ∩ cell| x |cell|) GEMM, linear in the delta at
    bounded cell size, never |cell|². A delta vector is pruned iff
    some LOWER-id vector in its cell (frozen always wins; earlier
    delta beats later delta) has rounded cosine >= SEMDEDUP_TAU; one
    row per PRUNED delta vector, keeper = the lowest-id such
    neighbor — the same keep-earliest rule as semantic_prune, so on a
    frozen corpus already SemDeDup'd at release time the union of
    (release prune-list + this probe's prune-list) IS the corpus-wide
    policy, up to cell drift from the frozen-only fit (the honest
    approximation every incremental-clustering shape makes).

    Scale posture mirrors dedup_incremental: centroids are bounded
    driver state, the frozen side moves ZERO bytes at probe time when
    read from the bucketed release table, and the only shuffles are
    the delta's assignment output and the (delta-bounded) cogroup
    exchange."""
    emb = ensure_parallelism(read_table(spark, sf_dir, "embeddings")).select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("v")
    )
    perturbed = F.concat(
        F.array(F.element_at("v", 1) + 0.05),
        F.slice("v", 2, F.size("v") - 1),
    )
    # persist: the planted corpus feeds FIVE jobs in this in-query
    # lifecycle (fit init collect, two Lloyd update rounds, and both
    # final assigns under the cogroup) — without the cache each one
    # re-runs scan + cast + planted-copy explode (measured 3.86 →
    # 3.43 s fresh-session at sf1; the production probe never pays the
    # fit at all, the release table is the cache). _fresh_persist
    # releases the previous invocation's partitions in long-lived
    # bench/correctness sessions.
    corpus = _fresh_persist(
        "sem_incr_corpus",
        with_planted_copies(
            emb, SEMDEDUP_MODULUS, mangle={"v": perturbed}, id_col="vec_id"
        ),
    )
    frozen = corpus.filter(F.col("vec_id") < SEM_INCR_DELTA_MIN)
    delta = corpus.filter(F.col("vec_id") >= SEM_INCR_DELTA_MIN)
    # kernel="arrow": this in-query lifecycle runs FIVE assigns over
    # the corpus (fit init + 2 update rounds + both final sides); the
    # interpreted Catalyst fold costs ~0.8 s/round at sf1 where the
    # Arrow argmin kernel — pinned bit-identical to the fold in
    # tests/test_llm_ops.py, so all oracle boundaries are unchanged —
    # runs the same jobs in 2.7 s total vs 3.5 s (fresh-session A/B;
    # the auto threshold keeps single-assign queries Catalyst/UDF-free)
    cents = _lloyd_fit(frozen, k=k, kernel="arrow")  # release-time artifact
    return incremental_cell_prune(
        _lloyd_assign(frozen, cents, kernel="arrow"),
        _lloyd_assign(delta, cents, kernel="arrow"),
    )


def incremental_cell_prune(
    frozen_assigned: DataFrame,
    delta_assigned: DataFrame,
    tau: float = SEMDEDUP_TAU,
) -> DataFrame:
    """Core of semantic_prune_incremental, parameterized on the two
    assigned frames so the bench can feed the frozen side from a
    bucketed release table. Cogroup per cell: the kernel computes
    ONLY the delta-vs-all block (rows = delta, cols = frozen + delta
    sorted by id), so per-cell work is delta-proportional.

    Self-lineage guard (r8): when BOTH sides derive from the same
    in-plan corpus (the registered query; the production bench feeds
    the frozen side from a bucketed table, a disjoint lineage), the
    two cogroup children share attribute exprIds, and under a
    consumer that requires no output columns (``.count()``)
    Spark 4.1's dedup + column pruning delivers the RIGHT side with
    only the grouping key — the kernel then crashes on the missing
    ``v`` (observed: collect() fine, count() broken, same plan). The
    re-select below is semantics- and cost-free (a pure projection
    that collapses in the optimizer) but every ``Alias`` mints a
    fresh exprId, making the sides' attribute sets disjoint so
    pruning resolves correctly under every consumer. Pinned by the
    count()-path smoke in tests/test_round8_ops.py."""
    frozen_assigned = frozen_assigned.select(
        [F.col(c).alias(c) for c in frozen_assigned.columns]
    )
    delta_assigned = delta_assigned.select(
        [F.col(c).alias(c) for c in delta_assigned.columns]
    )
    out_schema = "cluster long, vec_id long, keeper_id long, cos_sim double"

    def prune(key, frozen_pdf: pd.DataFrame, delta_pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        empty = pd.DataFrame(
            {
                "cluster": pd.Series(dtype="int64"),
                "vec_id": pd.Series(dtype="int64"),
                "keeper_id": pd.Series(dtype="int64"),
                "cos_sim": pd.Series(dtype="float64"),
            }
        )
        if not len(delta_pdf):
            return empty

        def norm_rows(pdf):
            m = np.stack(pdf["v"].to_numpy())
            norms = np.linalg.norm(m, axis=1, keepdims=True)
            norms[norms == 0] = 1.0
            return m / norms

        all_pdf = pd.concat([frozen_pdf, delta_pdf]).sort_values("vec_id")
        all_ids = all_pdf["vec_id"].to_numpy()
        an = norm_rows(all_pdf)
        delta_pdf = delta_pdf.sort_values("vec_id")
        delta_ids = delta_pdf["vec_id"].to_numpy()
        dn = norm_rows(delta_pdf)
        # same rounding boundary as semantic_prune/block_prune: the
        # ROUNDED cosine decides, so engine drift cannot flip a pair
        sims = np.round(dn @ an.T, 5)
        qual = (sims >= tau) & (all_ids[None, :] < delta_ids[:, None])
        has = qual.any(axis=1)
        if not has.any():
            return empty
        first = qual.argmax(axis=1)  # first True = lowest id (cols id-sorted)
        i = np.nonzero(has)[0]
        return pd.DataFrame(
            {
                "cluster": np.full(len(i), int(key[0]), dtype="int64"),
                "vec_id": delta_ids[i],
                "keeper_id": all_ids[first[i]],
                "cos_sim": sims[i, first[i]],
            }
        )

    return (
        frozen_assigned.groupBy("cl")
        .cogroup(delta_assigned.groupBy("cl"))
        .applyInPandas(prune, schema=out_schema)
        .orderBy("vec_id")
    )


_KM_ASSIGN_FROM = """
  SELECT e.vec_id, e.v,
         (SELECT c.cl FROM {cents} c ORDER BY list_distance(e.v, c.c), c.cl LIMIT 1) AS cl
  FROM {src} e
"""

#: DuckDB oracle for semantic_prune_incremental — baked r7, wired to
#: the registration below in r8; tests/test_round7_ops.py additionally
#: runs the full driver-style parity gate (rows + schema + value hash)
#: against it at the driver SFs.
#: Recipe: frozen-ONLY k-means CTEs (init = first k frozen vectors,
#: two 1e-6-rounded updates — dedup_semantic's structure restricted to
#: the frozen side), both sides assigned under the final centroids,
#: delta-only prune rows with the lowest-id keeper via QUALIFY.
SEM_INCR_ORACLE = f"""
    WITH emb AS ({_SD_EMB}),
    frozen AS (SELECT * FROM emb WHERE vec_id < {SEM_INCR_DELTA_MIN}),
    delta  AS (SELECT * FROM emb WHERE vec_id >= {SEM_INCR_DELTA_MIN}),
    c0 AS (SELECT vec_id AS cl, v AS c FROM frozen WHERE vec_id < {KMEANS_K}),
    a1 AS ({_KM_ASSIGN_FROM.format(cents="c0", src="frozen")}),
    c1 AS ({_KM_UPDATE.format(assigned="a1")}),
    a2 AS ({_KM_ASSIGN_FROM.format(cents="c1", src="frozen")}),
    c2 AS ({_KM_UPDATE.format(assigned="a2")}),
    af AS ({_KM_ASSIGN_FROM.format(cents="c2", src="frozen")}),
    ad AS ({_KM_ASSIGN_FROM.format(cents="c2", src="delta")}),
    allv AS (SELECT * FROM af UNION ALL SELECT * FROM ad),
    pairs AS (
      SELECT d.cl AS cluster, d.vec_id AS vec_id, a.vec_id AS keeper_id,
             ROUND(list_cosine_similarity(a.v, d.v), 5) AS cos_sim
      FROM ad d JOIN allv a ON a.cl = d.cl AND a.vec_id < d.vec_id
      WHERE ROUND(list_cosine_similarity(a.v, d.v), 5) >= {SEMDEDUP_TAU}
    )
    SELECT cluster, vec_id, keeper_id, cos_sim FROM pairs
    QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY keeper_id) = 1
    ORDER BY vec_id
"""

# Registered r8 (VERDICT r7 ask #1): the oracle above was baked in r7
# while the registry sat at its 100-slot ceiling; the r8 merge of
# agg_hll_distinct_users + agg_quantile_sampled into agg_sketch_audit
# funded this slot. Registration happens post-definition because the
# oracle's CTE constants are assembled below the function.
spark_query("semantic_prune_incremental", oracle=SEM_INCR_ORACLE)(
    semantic_prune_incremental
)
