"""Advanced analytics operators (SURVEY.md §2.4/§2.5/§2.6 'absent'
rows — grouping sets, set operations, percentiles, as-of/range joins,
ranking windows).

The reference has none of these (its only aggregations are counts and
bounds); they are native Spark once a SQL surface exists, and a user
migrating real analytical workloads onto this engine needs them. Each
is oracle-paired against DuckDB — including ASOF JOIN, which DuckDB
implements natively while we express it as the classic window-over-
union composition.

Scale notes per operator are on the functions; the common theme: every
one of these is a single shuffle on its natural key, stays entirely in
whole-stage codegen, and broadcasts dimension tables where one side is
bounded (nation/region/part metadata).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from overturelink_data_pipeline_spark.functions.timeparts import (
    _idiv,
    epoch_seconds,
)
from overturelink_data_pipeline_spark.functions.grouped import grouped_topk
from overturelink_data_pipeline_spark.registry import spark_query
from overturelink_data_pipeline_spark.session import read_table, sort_bounded


# ---------------------------------------------------------------------------
# Grouping sets / rollup / cube
# ---------------------------------------------------------------------------

@spark_query(
    "agg_rollup_nation_region",
    oracle="""
    SELECT COALESCE(r.r_name, '__ALL__')  AS region,
           COALESCE(n.n_name, '__ALL__')  AS nation,
           CAST(COUNT(*) AS BIGINT)       AS n_cust,
           ROUND(SUM(c.c_acctbal), 2)     AS total_bal
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY ROLLUP (r.r_name, n.n_name)
    ORDER BY region, nation
    """,
)
def agg_rollup_nation_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP region→nation: hierarchical subtotals in one pass (Spark
    computes all grouping sets in a single Expand+Aggregate — one
    shuffle, not one job per level). Dimension joins broadcast."""
    c = read_table(spark, sf_dir, "customer")
    n = read_table(spark, sf_dir, "nation")
    r = read_table(spark, sf_dir, "region")
    joined = c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey).join(
        F.broadcast(r), n.n_regionkey == r.r_regionkey
    )
    return (
        joined.rollup("r_name", "n_name")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_cust"),
            F.round(F.sum("c_acctbal"), 2).alias("total_bal"),
        )
        .select(
            F.coalesce("r_name", F.lit("__ALL__")).alias("region"),
            F.coalesce("n_name", F.lit("__ALL__")).alias("nation"),
            "n_cust",
            "total_bal",
        )
        .transform(sort_bounded, "region", "nation")
    )


@spark_query(
    "agg_cube_status_flag",
    oracle="""
    SELECT COALESCE(l_returnflag, '_')  AS flag,
           COALESCE(l_linestatus, '_')  AS status,
           CAST(COUNT(*) AS BIGINT)     AS n,
           ROUND(SUM(l_quantity), 2)    AS qty
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    ORDER BY flag, status
    """,
)
def agg_cube_status_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over two low-cardinality dims — all 4 grouping sets from one
    Expand, partial aggregation map-side (the Expand multiplies rows
    4×, but the partial agg collapses them before the shuffle)."""
    li = read_table(spark, sf_dir, "lineitem")
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.round(F.sum("l_quantity"), 2).alias("qty"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("_")).alias("flag"),
            F.coalesce("l_linestatus", F.lit("_")).alias("status"),
            "n",
            "qty",
        )
        .transform(sort_bounded, "flag", "status")
    )


@spark_query(
    "agg_grouping_sets",
    oracle="""
    SELECT COALESCE(o_orderpriority, '__ALL__') AS priority,
           COALESCE(o_orderstatus, '__ALL__')   AS status,
           CAST(COUNT(*) AS BIGINT)             AS n_orders,
           ROUND(SUM(o_totalprice), 2)          AS revenue
    FROM orders
    GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus))
    ORDER BY priority, status
    """,
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (two independent single-dim rollups in
    one pass) via the SQL surface — `F.expr` is not enough here, so
    this runs through spark.sql on a temp view, exactly the SQL-exposed
    engine path."""
    read_table(spark, sf_dir, "orders").createOrReplaceTempView("orders_gs")
    # final sort via sort_bounded, not SQL ORDER BY: the grouping-set
    # result is bounded (priorities + statuses), and the range sort's
    # sampling pass would run the Expand+Aggregate segment twice
    return sort_bounded(
        spark.sql(
            """
            SELECT COALESCE(o_orderpriority, '__ALL__') AS priority,
                   COALESCE(o_orderstatus, '__ALL__')   AS status,
                   CAST(COUNT(*) AS BIGINT)             AS n_orders,
                   ROUND(SUM(o_totalprice), 2)          AS revenue
            FROM orders_gs
            GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus))
            """
        ),
        "priority",
        "status",
    )


# ---------------------------------------------------------------------------
# Percentiles / distinct counting
# ---------------------------------------------------------------------------

def _cumulative_value_frame(df, group_col: str, value_col: str):
    """Per-(group, value) histogram with cumulative + total counts —
    the frame _interpolated_quantile consumes. THE one construction
    (review r10: agg_sketch_audit carried a verbatim copy of
    agg_percentiles_exact's block; the cross-engine percentile recipe
    is supposed to be encoded once)."""
    hist = df.groupBy(group_col, value_col).agg(F.count(F.lit(1)).alias("cnt"))
    w_cum = Window.partitionBy(group_col).orderBy(value_col)
    w_all = Window.partitionBy(group_col)
    return hist.select(
        group_col,
        value_col,
        F.sum("cnt").over(w_cum).alias("cum"),
        F.sum("cnt").over(w_all).alias("n"),
    )


def _interpolated_quantile(rank_col: str, value_col: str, q: float):
    """``percentile_cont(q)``'s order statistic as an AGGREGATE over a
    frame carrying a 1-based cumulative position (``rank_col`` — a
    row_number over values, or a cumulative count over a value
    histogram), the group total ``n``, and ``value_col``: r = q·(n−1),
    lo/hi from two conditional mins, linear interpolation, then the
    round-through-DECIMAL(18,4) recipe — interpolation midpoints land
    exactly on .xx5 boundaries where double noise flips a direct
    2-decimal round between engines. Shared by agg_percentiles_exact
    (histogram ranks) and agg_quantile_sampled (sample row numbers) so
    the cross-engine pitfall is encoded once."""
    r = F.lit(q) * (F.col("n") - 1)
    k = F.floor(r)
    lo = F.min(F.when(F.col(rank_col) >= k + 1, F.col(value_col)))
    hi = F.coalesce(F.min(F.when(F.col(rank_col) >= k + 2, F.col(value_col))), lo)
    v = lo + F.max(r - k) * (hi - lo)
    return F.round(v.cast("decimal(18,4)"), 2).cast("double")



@spark_query(
    "agg_percentiles_exact",
    oracle="""
    SELECT l_returnflag,
           CAST(ROUND(CAST(percentile_cont(0.5) WITHIN GROUP (ORDER BY l_extendedprice)
                           AS DECIMAL(18,4)), 2) AS DOUBLE) AS p50,
           CAST(ROUND(CAST(percentile_cont(0.95) WITHIN GROUP (ORDER BY l_extendedprice)
                           AS DECIMAL(18,4)), 2) AS DOUBLE) AS p95,
           CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS distinct_parts
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def agg_percentiles_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles + distinct count per group. The
    approx variants (approx_count_distinct / percentile_approx) are the
    100 TB path — registered separately rows-only since sketches don't
    hash-match an exact oracle.

    Rounding note: interpolation midpoints land exactly on .xx5
    boundaries where double noise flips a direct 2-decimal round
    between engines — both sides normalize through a 4-decimal DECIMAL
    first (the cents data has ≤4 meaningful decimals after midpoint
    interpolation)."""
    li = read_table(spark, sf_dir, "lineitem")

    # Exact interpolated percentile WITHOUT Spark's `percentile` agg:
    # that aggregate accumulates a per-group value→count hashmap and
    # merges every partial map on ONE reducer per group — at 100 TB a
    # group's distinct-value domain doesn't fit one executor's heap.
    # The histogram plan computes the same order statistic from
    # mergeable pieces (measured 1.8× faster at sf1, identical values):
    #   1. groupBy(flag, value) count — partial agg collapses the fact
    #      rows to the value domain map-side;
    #   2. one window pass over the sorted domain gives cumulative and
    #      total counts;
    #   3. percentile_cont's order statistic r = q·(n−1) is then two
    #      conditional mins over the cumulative frame + linear
    #      interpolation (v_hi falls back to v_lo at the domain edge).
    cum = _cumulative_value_frame(li, "l_returnflag", "l_extendedprice")
    aggs = [
        _interpolated_quantile("cum", "l_extendedprice", q).alias(name)
        for q, name in [(0.5, "p50"), (0.95, "p95")]
    ]
    pctl = cum.groupBy("l_returnflag").agg(*aggs)
    dst = li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").cast("bigint").alias("distinct_parts")
    )
    return sort_bounded(
        pctl.join(F.broadcast(dst), "l_returnflag"), "l_returnflag"
    )


#: Hash-reservoir size per group for the sampled-quantile sketch.
QSAMPLE_K = 199


#: Sampled-quantile oracle CTEs (keyed → samp → qest), shared between
#: the historical standalone oracle and the merged agg_sketch_audit
#: oracle so the two can never drift.
_QSAMPLE_CTES = f"""
    keyed AS (
      SELECT l_returnflag AS f, l_extendedprice AS v,
             md5(CAST(l_orderkey AS VARCHAR) || '-'
                 || CAST(l_linenumber AS VARCHAR)) AS h
      FROM lineitem
    ),
    samp AS (
      SELECT f, v FROM (
        SELECT f, v, ROW_NUMBER() OVER (PARTITION BY f ORDER BY h) AS rk
        FROM keyed) t
      WHERE rk <= {QSAMPLE_K}
    ),
    qest AS (
      SELECT f,
             CAST(COUNT(*) AS BIGINT) AS n_sample,
             CAST(ROUND(CAST(percentile_cont(0.5) WITHIN GROUP (ORDER BY v)
                             AS DECIMAL(18,4)), 2) AS DOUBLE) AS est_p50
      FROM samp GROUP BY f
    )
"""


def agg_quantile_sampled(
    spark: SparkSession, sf_dir: str, ordered: bool = True
) -> DataFrame:
    """Quantile SKETCH by deterministic hash reservoir: per group, the
    QSAMPLE_K rows with the smallest md5(unique key) are a uniform
    random sample (a hash's k smallest values are a uniform k-subset),
    and the sample's exact interpolated median estimates the
    population's with O(1/√K) error. Completes the hash-verifiable
    sketch trio — cardinality (agg_hll_distinct_users), frequency
    (agg_count_min_tokens), quantile (here): every estimate, sampling
    error included, is bit-reproducible and hash-checked against
    DuckDB, where the engine-native sketches (agg_approx_sketches) can
    only ever be rows-only.

    Registry note: standalone registration retired in the r8 merge —
    this frame now rides inside ``agg_sketch_audit`` (one audit row
    per stratum, paired with its exact-p50 accuracy audit), which
    carries the driver hash gate; the sampling-accuracy property stays
    pinned in tests/test_round4_ops.py via a direct call.

    100 TB plan shape: the reservoir is the sample_reservoir two-phase
    grouped top-k (partition-local rank then final rank — no
    single-reducer funnel on a dominant group, and per-partition top-K
    IS the mergeable-sample property that makes hash reservoirs the
    standard distributed sampler); the quantile then runs over K rows
    per group, a frame bounded by K × groups regardless of data size.
    Interpolation and rounding reuse the agg_percentiles_exact recipe
    (order statistic r = q·(n−1); round through DECIMAL(18,4))."""
    # NOTE r13: ensure_parallelism was tried on this scan (the
    # single-row-group file runs the md5 + phase-1 sort in one task,
    # 2.2-2.6 s at sf0.1) and REVERTED — the warm-protocol win
    # (2.61->1.91 s median) did not transfer to the bench's
    # first-invocation protocol (sketch-audit A/B 5.5-6.8 -> 6.2-8.5 s:
    # the rescue shuffle plus its extra codegen unit cost more than the
    # single-task scan on a ~10 MB table)
    li = read_table(spark, sf_dir, "lineitem")
    h = F.md5(
        F.concat_ws(
            "-",
            F.col("l_orderkey").cast("string"),
            F.col("l_linenumber").cast("string"),
        )
    )
    keyed = li.select(
        F.col("l_returnflag").alias("f"),
        F.col("l_extendedprice").alias("v"),
        h.alias("h"),
    )
    samp = grouped_topk(keyed, ["f"], ["h"], QSAMPLE_K)
    # The sample is ≤ QSAMPLE_K rows per group, so the median needs no
    # further window stages (the round-4 cut ran TWO more — a
    # row_number over v and a count over the group — over the sample;
    # VERDICT r4 ask #2): n_sample is just max(rk) from the top-k
    # rank, and percentile_cont interpolates over one
    # sort_array(collect_list) whose buffer is bounded by K — all in
    # a single aggregation.
    agg = samp.groupBy("f").agg(
        F.max("rk").cast("bigint").alias("n_sample"),
        F.sort_array(F.collect_list("v")).alias("vs"),
    )
    r = F.lit(0.5) * (F.col("n_sample") - 1)
    k = F.floor(r)
    # try_element_at: k+2 overflows the array when the interpolation
    # fraction is 0 at the tail (e.g. a 1-row group) — NULL→lo there,
    # and a plain element_at would raise under the driver's default
    # ANSI session
    lo = F.try_element_at("vs", (k + 1).cast("int"))
    hi = F.coalesce(F.try_element_at("vs", (k + 2).cast("int")), lo)
    est = lo + (r - k) * (hi - lo)
    return (
        agg.select(
            F.col("f").alias("l_returnflag"),
            "n_sample",
            # round-through-DECIMAL(18,4): same recipe as
            # _interpolated_quantile (interpolation midpoints land on
            # .xx5 boundaries where a direct 2-decimal double round
            # diverges between engines)
            F.round(est.cast("decimal(18,4)"), 2).cast("double").alias("est_p50"),
        )
        # ordered=False for the agg_sketch_audit composite, which
        # re-sorts the union anyway — the inner sort_bounded otherwise
        # adds a whole extra Exchange stage (r13 plan sweep)
        .transform(
            (lambda d: sort_bounded(d, "l_returnflag"))
            if ordered
            else (lambda d: d)
        )
    )


def agg_approx_sketches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch aggregates (HyperLogLog++ distinct, GK-quantile): the
    scale path for cardinality/quantile at 100 TB — mergeable partial
    sketches, no exact shuffle of distinct values.

    DEREGISTERED round 6 (VERDICT r5 ask #1): this was the registry's
    one rows-only slot — engine-native sketches can never hash-match a
    DuckDB oracle, and their hash-verifiable cousins
    (agg_hll_distinct_users / agg_count_min_tokens /
    agg_quantile_sampled — both riding inside agg_sketch_audit since
    the r8 merge) already cover cardinality/frequency/quantile
    under the driver's full gate. Accuracy vs the exact aggregates
    stays pinned in tests/test_analytics.py, which calls this function
    directly; the freed registry slot funds dedup_incremental."""
    li = read_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.approx_count_distinct("l_partkey", rsd=0.02).alias("approx_parts"),
            F.percentile_approx("l_extendedprice", 0.5, 10000).alias("approx_p50"),
        )
        .orderBy("l_returnflag")
    )


# ---------------------------------------------------------------------------
# Deterministic HyperLogLog replica — the hash-VERIFIABLE cousin of
# agg_approx_sketches: same register/estimate structure as HLL, but
# built from md5-derived hashes shared with DuckDB, so the driver's
# value-hash gate applies to an approximate cardinality sketch
# (engine-native approx_count_distinct can only ever be rows-only).
# ---------------------------------------------------------------------------

#: 2^HLL_B registers.
HLL_B = 8
HLL_M = 1 << HLL_B
#: alpha_m * m^2 * 2^61 for m=256 (the estimate numerator, scaled so
#: the register sum stays exact BIGINT: sum of 2^(61-rank) terms).
#: Same literal in both engines → same double → same rounded estimate.
_HLL_NUMER = 0.7182725932495458 * HLL_M * HLL_M * float(1 << 61)


#: Deterministic-HLL oracle CTEs (h → ranked → regs → est → exact →
#: raw), shared with the merged agg_sketch_audit oracle.
_HLL_CTES = f"""
    h AS (
      SELECT event_type,
             substr(md5(CAST(user_id AS VARCHAR)), 1, 17) AS hx
      FROM events
    ),
    ranked AS (
      SELECT event_type,
             CAST('0x' || substr(hx, 1, 2) AS INTEGER) AS bucket,
             CASE WHEN length(regexp_extract(substr(hx, 3, 15), '^(0*)', 1)) = 15
                  THEN 61
                  ELSE 4 * length(regexp_extract(substr(hx, 3, 15), '^(0*)', 1)) + 5
                       - CASE WHEN CAST('0x' || substr(substr(hx, 3, 15),
                              length(regexp_extract(substr(hx, 3, 15), '^(0*)', 1)) + 1, 1)
                              AS INTEGER) >= 8 THEN 4
                              WHEN CAST('0x' || substr(substr(hx, 3, 15),
                              length(regexp_extract(substr(hx, 3, 15), '^(0*)', 1)) + 1, 1)
                              AS INTEGER) >= 4 THEN 3
                              WHEN CAST('0x' || substr(substr(hx, 3, 15),
                              length(regexp_extract(substr(hx, 3, 15), '^(0*)', 1)) + 1, 1)
                              AS INTEGER) >= 2 THEN 2
                              ELSE 1 END
             END AS rank
      FROM h
    ),
    regs AS (
      SELECT event_type, bucket, MAX(rank) AS r
      FROM ranked GROUP BY 1, 2
    ),
    est AS (
      SELECT event_type,
             SUM(CAST(CAST(1 AS BIGINT) << (61 - r) AS HUGEINT)) AS s,
             COUNT(*) AS n_regs
      FROM regs GROUP BY 1
    ),
    exact AS (
      SELECT event_type, COUNT(DISTINCT user_id) AS x FROM events GROUP BY 1
    ),
    raw AS (
      SELECT event_type, n_regs,
             {_HLL_NUMER!r} / CAST(est.s
                 + CAST({HLL_M} - est.n_regs AS HUGEINT)
                   * CAST(CAST(1 AS BIGINT) << 61 AS HUGEINT) AS DOUBLE) AS r
      FROM est
    ),
    hll AS (
      SELECT e.event_type,
             ROUND(CASE WHEN raw.r <= 2.5 * {HLL_M} AND raw.n_regs < {HLL_M}
                        THEN {HLL_M} * ln({HLL_M} * 1.0 / ({HLL_M} - raw.n_regs))
                        ELSE raw.r END, 2) AS est_distinct,
             CAST({HLL_M} - raw.n_regs AS BIGINT) AS zero_registers,
             CAST(e.x AS BIGINT) AS exact_distinct
      FROM exact e JOIN raw USING (event_type)
    )
"""


def agg_hll_distinct_users(
    spark: SparkSession, sf_dir: str, ordered: bool = True
) -> DataFrame:
    """Distinct users per event type by a DETERMINISTIC HyperLogLog:
    bucket = md5 byte 0 (256 registers), rank = leading-zero count of
    the next 60 md5 bits (computed with string/integer ops only — no
    log2, whose libm rounding differs across engines), estimate =
    alpha·m²/Σ2^-Mj with the register sum kept EXACT in BIGINT
    (Σ2^(61-Mj), empty registers contributing 2^61) and one final
    double division — so even the approximation error is
    bit-reproducible and hash-checked against DuckDB. The exact
    distinct count rides along as the accuracy audit.

    100 TB plan shape (the point of HLL): register state is m=256
    cells per group regardless of cardinality, the aggregation is
    map-side combinable (MAX per register), and the exchange moves
    O(groups × m), never O(distinct users). The exact audit side is
    the O(distinct) shuffle the sketch exists to avoid at scale.
    Includes the small-range linear-counting branch (m·ln(m/V) when
    the raw estimate is <= 2.5m), so low-cardinality groups stay
    accurate too; see the in-code note on why the ln() is safe under
    the 2-decimal hash contract.

    Registry note: standalone registration retired in the r8 merge —
    this frame now rides inside ``agg_sketch_audit`` (est/exact/aux
    rows under the 'hll_distinct' sketch tag), which carries the
    driver hash gate; the 3-sigma accuracy property stays pinned in
    tests/test_round4_ops.py via a direct call."""
    from overturelink_data_pipeline_spark.session import read_events

    ev = read_events(spark, sf_dir)
    hx = F.substring(F.md5(F.col("user_id").cast("string")), 1, 17)
    base = ev.select("event_type", hx.alias("hx"))
    w = F.expr("substr(hx, 3, 15)")
    # rank = 61 − bit_length(w as a 60-bit integer). Equivalent to the
    # r8 formulation (leading-zero-nibble count z via regexp + first
    # nonzero nibble's bit width: 4z + 5 − bitlen ≡ 61 − bit_length,
    # zero case 61 in both) but ONE conv+length instead of a
    # regexp_extract + conv + substr + 4-branch CASE per row — the
    # per-row rank chain was the hottest stage of this query's profile
    # (1.9 s of 32-wide compute at sf0.1, r13; conv renders the hex as
    # binary with leading zeros stripped, so its length IS bit_length).
    # Identity verified over 500 k md5-derived values + edge cases
    # before the swap; the oracle's CTE keeps the 4z+5−bitlen spelling,
    # so the two engines compute the same registers through different
    # but provably-equal arithmetic.
    rank = F.when(w == F.lit("0" * 15), 61).otherwise(
        F.lit(61) - F.length(F.conv(w, 16, 2))
    )
    ranked = base.select(
        "event_type",
        F.conv(F.substring("hx", 1, 2), 16, 10).cast("int").alias("bucket"),
        rank.alias("rank"),
    )
    regs = ranked.groupBy("event_type", "bucket").agg(F.max("rank").alias("r"))
    # register sum in DECIMAL(38,0): Sigma 2^(61-Mj) + empties*2^61 can
    # reach m*2^61 = 2^69, past BIGINT; the exact decimal converts to
    # double ONCE (correctly rounded from the exact integer in both
    # engines) before the single estimate division
    est = regs.groupBy("event_type").agg(
        F.sum(
            F.expr("CAST(shiftleft(CAST(1 AS BIGINT), 61 - r) AS DECIMAL(38,0))")
        ).alias("s"),
        F.count(F.lit(1)).alias("n_regs"),
    )
    exact = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").cast("bigint").alias("exact_distinct")
    )
    zero_term = (
        (F.lit(HLL_M) - F.col("n_regs")).cast("decimal(38,0)")
        * F.lit(1 << 61).cast("decimal(38,0)")
    )
    raw = F.lit(_HLL_NUMER) / (F.col("s") + zero_term).cast("double")
    # small-range linear counting (raw <= 2.5m with empty registers):
    # m*ln(m/V) — the one transcendental in the plan; both engines'
    # libm log() is correctly rounded to <=1 ulp, far inside the
    # 2-decimal ROUND grid, and the BRANCH decision compares doubles
    # built from identical exact integers, so it can never diverge
    corrected = F.when(
        (raw <= 2.5 * HLL_M) & (F.col("n_regs") < HLL_M),
        F.lit(float(HLL_M))
        * F.log(F.lit(float(HLL_M)) / (F.lit(HLL_M) - F.col("n_regs"))),
    ).otherwise(raw)
    return (
        exact.join(est, "event_type")
        .select(
            "event_type",
            F.round(corrected, 2).alias("est_distinct"),
            (F.lit(HLL_M) - F.col("n_regs")).cast("bigint").alias("zero_registers"),
            "exact_distinct",
        )
        # same ordered knob as agg_quantile_sampled (see there)
        .transform(
            (lambda d: sort_bounded(d, "event_type"))
            if ordered
            else (lambda d: d)
        )
    )


@spark_query(
    "agg_sketch_audit",
    oracle=f"""
    WITH {_HLL_CTES},
    {_QSAMPLE_CTES},
    qexact AS (
      SELECT l_returnflag AS f,
             CAST(ROUND(CAST(percentile_cont(0.5) WITHIN GROUP (ORDER BY l_extendedprice)
                             AS DECIMAL(18,4)), 2) AS DOUBLE) AS exact_p50
      FROM lineitem GROUP BY l_returnflag
    )
    SELECT 'hll_distinct' AS sketch, event_type AS grp,
           est_distinct AS est,
           CAST(exact_distinct AS DOUBLE) AS exact,
           zero_registers AS aux
    FROM hll
    UNION ALL
    SELECT 'quantile_sample' AS sketch, qest.f AS grp,
           qest.est_p50 AS est, qexact.exact_p50 AS exact,
           qest.n_sample AS aux
    FROM qest JOIN qexact ON qest.f = qexact.f
    ORDER BY sketch, grp
    """,
)
def agg_sketch_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash-verifiable sketch audit, both sketches in one tall rollup
    (r8 registry merge of agg_hll_distinct_users + agg_quantile_sampled
    — the two queries shared the shape "deterministic md5-derived
    sketch + its exact accuracy audit, bit-reproducible across
    engines" and differed only in which statistic they sketched):
    one row per (sketch, stratum) with the sketch estimate ``est``,
    the exact value of the sketched statistic ``exact`` (distinct
    users / population p50), and the sketch-size audit ``aux``
    (zero registers / sample rows).

    100 TB plan shape: the HLL leg's exchange is O(groups × 256
    registers) and the reservoir leg's is O(groups × K) — both
    map-side combinable and independent of cardinality; the exact
    audit columns are the O(distinct) / O(domain) shuffles the
    sketches exist to avoid, ridden along here precisely so the
    driver gate hashes the *approximation error*, not just the
    estimate. The exact p50 reuses agg_percentiles_exact's mergeable
    histogram plan (groupBy value domain → one cumulative window →
    two conditional mins), not Spark's single-reducer ``percentile``
    aggregate."""
    hll = agg_hll_distinct_users(spark, sf_dir, ordered=False).select(
        F.lit("hll_distinct").alias("sketch"),
        F.col("event_type").alias("grp"),
        F.col("est_distinct").alias("est"),
        F.col("exact_distinct").cast("double").alias("exact"),
        F.col("zero_registers").alias("aux"),
    )
    qs = agg_quantile_sampled(spark, sf_dir, ordered=False)
    li = read_table(spark, sf_dir, "lineitem")
    cum = _cumulative_value_frame(li, "l_returnflag", "l_extendedprice")
    qexact = cum.groupBy("l_returnflag").agg(
        _interpolated_quantile("cum", "l_extendedprice", 0.5).alias("exact_p50")
    )
    quant = qs.join(F.broadcast(qexact), "l_returnflag").select(
        F.lit("quantile_sample").alias("sketch"),
        F.col("l_returnflag").alias("grp"),
        F.col("est_p50").alias("est"),
        F.col("exact_p50").alias("exact"),
        F.col("n_sample").alias("aux"),
    )
    return sort_bounded(hll.unionByName(quant), "sketch", "grp")


# ---------------------------------------------------------------------------
# Set operations
# ---------------------------------------------------------------------------

@spark_query(
    "set_intersect_except",
    oracle="""
    WITH urgent AS (SELECT DISTINCT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'),
         high   AS (SELECT DISTINCT o_custkey FROM orders WHERE o_orderpriority = '2-HIGH')
    SELECT 'both' AS bucket, CAST(COUNT(*) AS BIGINT) AS n
    FROM (SELECT o_custkey FROM urgent INTERSECT SELECT o_custkey FROM high)
    UNION ALL
    SELECT 'urgent_only', CAST(COUNT(*) AS BIGINT)
    FROM (SELECT o_custkey FROM urgent EXCEPT SELECT o_custkey FROM high)
    ORDER BY bucket
    """,
)
def set_intersect_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT / EXCEPT (absent from the reference, SURVEY.md §2.6):
    customers with both urgent and high orders vs urgent-only. Spark
    plans these as left-semi / left-anti aggregate joins."""
    o = read_table(spark, sf_dir, "orders")
    urgent = o.filter(F.col("o_orderpriority") == "1-URGENT").select("o_custkey").distinct()
    high = o.filter(F.col("o_orderpriority") == "2-HIGH").select("o_custkey").distinct()
    both = urgent.intersect(high).agg(
        F.lit("both").alias("bucket"), F.count(F.lit(1)).cast("bigint").alias("n")
    )
    only = urgent.exceptAll(high).agg(
        F.lit("urgent_only").alias("bucket"),
        F.count(F.lit(1)).cast("bigint").alias("n"),
    )
    return both.unionByName(only).orderBy("bucket")


# ---------------------------------------------------------------------------
# As-of join / range join
# ---------------------------------------------------------------------------

@spark_query(
    "join_asof_last_signup",
    oracle="""
    WITH signups AS (
      SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS sec, event_id
      FROM events WHERE event_type = 'signup'
    ),
    purchases AS (
      SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS sec, event_id, value
      FROM events WHERE event_type = 'purchase'
    ),
    matched AS (
      -- NOT DuckDB's native ASOF JOIN: with two signups for one user
      -- in the same second, ASOF's pick among ties is unspecified,
      -- while the engine's union+window deterministically carries the
      -- max signup_id — the oracle must pin the SAME tie-break or the
      -- gate is flaky whenever the generator lands two signups in one
      -- (user, second)
      SELECT p.event_id AS purchase_id, p.user_id, p.value,
             p.sec AS psec, s.event_id AS signup_id, s.sec AS ssec,
             row_number() OVER (
               PARTITION BY p.event_id
               ORDER BY s.sec DESC, s.event_id DESC
             ) AS rn
      FROM purchases p
      LEFT JOIN signups s
        ON p.user_id = s.user_id AND s.sec <= p.sec
    )
    SELECT purchase_id, user_id,
           ROUND(value, 2)                  AS value,
           signup_id,
           CAST(psec - ssec AS BIGINT)      AS lag_s
    FROM matched WHERE rn = 1
    ORDER BY purchase_id
    """,
)
def join_asof_last_signup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AS-OF join: each purchase matched to the latest signup at or
    before it, per user. DuckDB has native ASOF JOIN; Spark has none,
    so the engine expresses it as the union-sort-window composition:
    tag both streams, union, and carry the last signup forward with a
    ``last(ignorenulls)`` over a per-user event-time window. ONE
    shuffle on user_id — the same cost as a plain equi-join, and the
    pattern scales to any (entity, time) key without a range-join
    blow-up."""
    ev = read_table(spark, sf_dir, "events")
    sec = epoch_seconds(F.col("ts"))
    signups = ev.filter(F.col("event_type") == "signup").select(
        "user_id",
        sec.alias("sec"),
        F.col("event_id").alias("signup_id"),
        F.lit(None).cast("long").alias("purchase_id"),
        F.lit(None).cast("double").alias("value"),
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        sec.alias("sec"),
        F.lit(None).cast("long").alias("signup_id"),
        F.col("event_id").alias("purchase_id"),
        "value",
    )
    merged = signups.unionByName(purchases)
    # signup sorts before purchase at the same second (ASOF >= includes
    # equality): order by (sec, is_purchase)
    w = (
        Window.partitionBy("user_id")
        .orderBy("sec", F.col("purchase_id").isNotNull().cast("int"), "signup_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = merged.withColumn(
        "asof_signup", F.last("signup_id", ignorenulls=True).over(w)
    ).withColumn("asof_sec", F.last(F.when(F.col("signup_id").isNotNull(), F.col("sec")), ignorenulls=True).over(w))
    return (
        carried.filter(F.col("purchase_id").isNotNull())
        .select(
            "purchase_id",
            "user_id",
            F.round("value", 2).alias("value"),
            F.col("asof_signup").alias("signup_id"),
            (F.col("sec") - F.col("asof_sec")).cast("bigint").alias("lag_s"),
        )
        .orderBy("purchase_id")
    )


@spark_query(
    "join_range_price_band",
    oracle="""
    WITH bands(band, lo, hi) AS (VALUES
      ('budget', 0.0, 950.0), ('mid', 950.0, 1400.0), ('premium', 1400.0, 100000.0))
    SELECT b.band,
           CAST(COUNT(*) AS BIGINT)     AS n_parts,
           ROUND(AVG(p.p_retailprice), 2) AS avg_price
    FROM part p JOIN bands b
      ON p.p_retailprice >= b.lo AND p.p_retailprice < b.hi
    GROUP BY b.band
    ORDER BY b.band
    """,
)
def join_range_price_band(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range (theta) join against a tiny band table — broadcast nested
    loop by construction: the band side is driver-literal, so the scan
    side streams once with no shuffle. At 100 TB the alternative
    (interval bucketing to convert range→equi keys) only matters when
    BOTH sides are large."""
    p = read_table(spark, sf_dir, "part")
    bands = spark.createDataFrame(
        [("budget", 0.0, 950.0), ("mid", 950.0, 1400.0), ("premium", 1400.0, 100000.0)],
        "band string, lo double, hi double",
    )
    return (
        p.join(
            F.broadcast(bands),
            (p.p_retailprice >= bands.lo) & (p.p_retailprice < bands.hi),
        )
        .groupBy("band")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_parts"),
            F.round(F.avg("p_retailprice"), 2).alias("avg_price"),
        )
        .transform(sort_bounded, "band")
    )


# ---------------------------------------------------------------------------
# Ranking windows / correlated subquery
# ---------------------------------------------------------------------------

@spark_query(
    "window_rank_suppliers_per_nation",
    oracle="""
    WITH ranked AS (
      SELECT n.n_name AS nation, s.s_name AS supplier,
             ROUND(s.s_acctbal, 2) AS bal,
             DENSE_RANK() OVER (PARTITION BY n.n_name ORDER BY s.s_acctbal DESC, s.s_suppkey) AS rnk,
             NTILE(4) OVER (PARTITION BY n.n_name ORDER BY s.s_acctbal DESC, s.s_suppkey) AS quartile
      FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey
    )
    SELECT nation, supplier, bal, CAST(rnk AS BIGINT) AS rnk, CAST(quartile AS BIGINT) AS quartile
    FROM ranked WHERE rnk <= 3
    ORDER BY nation, rnk, supplier
    """,
)
def window_rank_suppliers_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 suppliers per nation by balance: dense_rank + ntile over
    one per-nation window; the rank filter prunes before the final
    sort (classic top-k-per-group — no global sort of the fact side)."""
    s = read_table(spark, sf_dir, "supplier")
    n = read_table(spark, sf_dir, "nation")
    w = Window.partitionBy("n_name").orderBy(F.desc("s_acctbal"), F.col("s_suppkey"))
    return (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .select(
            F.col("n_name").alias("nation"),
            F.col("s_name").alias("supplier"),
            F.round("s_acctbal", 2).alias("bal"),
            F.dense_rank().over(w).cast("bigint").alias("rnk"),
            F.ntile(4).over(w).cast("bigint").alias("quartile"),
        )
        .filter(F.col("rnk") <= 3)
        .transform(sort_bounded, "nation", "rnk", "supplier")
    )


@spark_query(
    "subquery_cheapest_order",
    oracle="""
    SELECT o.o_custkey                       AS custkey,
           CAST(MIN(o.o_orderkey) AS BIGINT) AS first_min_order,
           ROUND(MIN(o.o_totalprice), 2)     AS min_price
    FROM orders o
    WHERE o.o_totalprice = (
      SELECT MIN(o2.o_totalprice) FROM orders o2
      WHERE o2.o_custkey = o.o_custkey
    )
    GROUP BY o.o_custkey
    ORDER BY custkey
    LIMIT 100
    """,
)
def subquery_cheapest_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2's correlated-min pattern (cheapest order per customer).
    Spark decorrelates it as a window min — one shuffle on custkey, no
    self-join (the naive correlated form rescans orders per row)."""
    o = read_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey")
    return (
        o.withColumn("min_price_w", F.min("o_totalprice").over(w))
        .filter(F.col("o_totalprice") == F.col("min_price_w"))
        .groupBy(F.col("o_custkey").alias("custkey"))
        .agg(
            F.min("o_orderkey").cast("bigint").alias("first_min_order"),
            F.round(F.min("o_totalprice"), 2).alias("min_price"),
        )
        .orderBy("custkey")
        .limit(100)
    )


# ---------------------------------------------------------------------------
# Funnel analysis (ordered-sequence match over event streams)
# ---------------------------------------------------------------------------

@spark_query(
    "funnel_view_click_purchase",
    oracle="""
    WITH e AS (
      SELECT user_id, event_type, CAST(floor(epoch(ts)) AS BIGINT) AS sec
      FROM events
    ),
    u1 AS (
      SELECT user_id, MIN(sec) AS v FROM e WHERE event_type = 'view' GROUP BY 1
    ),
    u2 AS (
      SELECT e.user_id, MIN(e.sec) AS c
      FROM e JOIN u1 USING (user_id)
      WHERE e.event_type = 'click' AND e.sec > u1.v
      GROUP BY 1
    ),
    u3 AS (
      SELECT e.user_id, MIN(e.sec) AS p
      FROM e JOIN u2 USING (user_id)
      WHERE e.event_type = 'purchase' AND e.sec > u2.c
      GROUP BY 1
    )
    SELECT CAST((SELECT COUNT(*) FROM u1) AS BIGINT) AS n_view,
           CAST((SELECT COUNT(*) FROM u2) AS BIGINT) AS n_click_after,
           CAST((SELECT COUNT(*) FROM u3) AS BIGINT) AS n_purchase_after,
           ROUND((SELECT COUNT(*) FROM u2) * 1.0 / (SELECT COUNT(*) FROM u1), 4) AS click_rate,
           ROUND((SELECT COUNT(*) FROM u3) * 1.0 / (SELECT COUNT(*) FROM u1), 4) AS purchase_rate
    """,
)
def funnel_view_click_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel view → click → purchase (strictly later stages,
    second resolution): how many users progress through each stage.

    Spark side is ONE PASS: per user, events collect into a
    time-sorted array and a codegen'd fold walks it once carrying
    (v, c, p) — first view, first strictly-later click, first
    strictly-later purchase. One shuffle on user_id, no self-joins.
    The oracle verifies the same semantics with the obvious (but
    3-scan) staged MIN CTEs; strict '>' makes both independent of
    within-second event order, so the algorithms agree exactly.
    Per-user event arrays are bounded by the funnel horizon in a real
    deployment (this corpus: ≤ a few thousand events/user)."""
    from overturelink_data_pipeline_spark.session import read_events

    ev = read_events(spark, sf_dir).select(
        "user_id", "event_type", epoch_seconds(F.col("ts")).alias("sec")
    )
    arr = F.array_sort(
        F.collect_list(F.struct(F.col("sec"), F.col("event_type").alias("t")))
    )
    folded = F.aggregate(
        arr,
        F.struct(
            F.lit(None).cast("bigint").alias("v"),
            F.lit(None).cast("bigint").alias("c"),
            F.lit(None).cast("bigint").alias("p"),
        ),
        lambda s, e: F.struct(
            F.when(s["v"].isNull() & (e["t"] == "view"), e["sec"])
            .otherwise(s["v"])
            .alias("v"),
            F.when(
                s["c"].isNull()
                & s["v"].isNotNull()
                & (e["t"] == "click")
                & (e["sec"] > s["v"]),
                e["sec"],
            )
            .otherwise(s["c"])
            .alias("c"),
            F.when(
                s["p"].isNull()
                & s["c"].isNotNull()
                & (e["t"] == "purchase")
                & (e["sec"] > s["c"]),
                e["sec"],
            )
            .otherwise(s["p"])
            .alias("p"),
        ),
    )
    per_user = ev.groupBy("user_id").agg(folded.alias("f"))
    return per_user.agg(
        F.count("f.v").cast("bigint").alias("n_view"),
        F.count("f.c").cast("bigint").alias("n_click_after"),
        F.count("f.p").cast("bigint").alias("n_purchase_after"),
        F.round(F.count("f.c") * 1.0 / F.count("f.v"), 4).alias("click_rate"),
        F.round(F.count("f.p") * 1.0 / F.count("f.v"), 4).alias("purchase_rate"),
    )


@spark_query(
    "retention_week_offsets",
    oracle="""
    WITH w AS (
      SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) // 604800 AS week
      FROM events GROUP BY 1, 2
    ),
    c AS (SELECT user_id, MIN(week) AS cohort FROM w GROUP BY 1),
    o AS (
      SELECT w.user_id, w.week - c.cohort AS offset_weeks
      FROM w JOIN c USING (user_id)
    )
    SELECT offset_weeks,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
           ROUND(COUNT(DISTINCT user_id) * 1.0
                 / (SELECT COUNT(*) FROM c), 4) AS retention
    FROM o
    GROUP BY offset_weeks
    ORDER BY offset_weeks
    """,
)
def retention_week_offsets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention: for every user, weeks-since-first-activity
    offsets of their active weeks; per offset, how many users were
    active and what fraction of the user base that is (the classic
    product-retention curve, cohort-aligned).

    One-pass shape: per-user (first week, active-week set) falls out
    of a single groupBy(user) with min + collect_set (map-side
    combinable); offsets explode from the bounded per-user week set
    (≤ the observation horizon in weeks) and the rollup touches
    (user, offset) rows, never raw events twice. The denominator is
    the offset-0 bucket (every user is active in their own cohort
    week by definition), read back out of the bounded aggregate with
    a window — no second scan, no driver action on the lineage."""
    from pyspark.sql.window import Window

    from overturelink_data_pipeline_spark.session import read_events

    ev = read_events(spark, sf_dir).select(
        "user_id", _idiv(epoch_seconds(F.col("ts")), 604_800).alias("week")
    )
    per_user = ev.groupBy("user_id").agg(
        F.min("week").alias("cohort"),
        F.collect_set("week").alias("weeks"),
    )
    offsets = per_user.select(
        "user_id", F.explode("weeks").alias("week"), F.col("cohort")
    ).select("user_id", (F.col("week") - F.col("cohort")).alias("offset_weeks"))
    agg = offsets.groupBy("offset_weeks").agg(
        F.countDistinct("user_id").cast("bigint").alias("n_users")
    )
    # cohort-0 size via an empty-partition window over the
    # post-aggregation frame — bounded by group cardinality (one row per
    # offset week, ~tens), never raw data, so the single-partition
    # WindowExec warning is benign
    total = F.max(
        F.when(F.col("offset_weeks") == 0, F.col("n_users"))
    ).over(Window.partitionBy())
    return (
        agg.select(
            "offset_weeks",
            "n_users",
            F.round(F.col("n_users") * 1.0 / total, 4).alias("retention"),
        )
        .orderBy("offset_weeks")
    )
