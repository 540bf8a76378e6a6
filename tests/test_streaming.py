"""Streaming layer tests: incremental-equals-batch, watermark
configuration, stateful sessionization vs the batch oracle shape."""

from __future__ import annotations

import pandas as pd

from overturelink_data_pipeline_spark import registry
from overturelink_data_pipeline_spark.session import read_table
from overturelink_data_pipeline_spark.streaming.events import (
    read_event_stream,
    run_to_completion,
    sessionize_stream,
)

registry.load_all()


def test_streaming_rollup_equals_batch(spark, sf_dir):
    """The AvailableNow-drained streaming aggregate must equal the
    batch GROUP BY over the same file."""
    from pyspark.sql import functions as F
    from overturelink_data_pipeline_spark.functions import timeparts as TP

    stream_out = (
        registry.QUERIES["stream_hourly_rollup"](spark, sf_dir).toPandas()
    )
    events = read_table(spark, sf_dir, "events")
    sec = TP.epoch_seconds(F.col("ts"))
    batch = (
        events.groupBy(
            (F.floor(sec / 3600) * 3600).cast("bigint").alias("bucket_start_s"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .orderBy("bucket_start_s", "event_type")
        .toPandas()
    )
    pd.testing.assert_frame_equal(
        stream_out.reset_index(drop=True), batch.reset_index(drop=True)
    )


def test_stream_sessions_subset_of_batch(spark, sf_dir):
    """Streaming closed sessions ⊂ batch sessions. With the event-time
    timeout, idle sessions flush once the watermark passes end+gap, so
    the ONLY batch sessions missing from the stream are final sessions
    still inside the end-of-stream watermark window
    (end_s ≥ max_sec − 2·gap) — everything else must be emitted."""
    from overturelink_data_pipeline_spark.streaming.events import SESSION_GAP_MIN

    batch = registry.QUERIES["sessions_30min_gap"](spark, sf_dir).toPandas()
    stream = registry.QUERIES["stream_user_sessions"](spark, sf_dir).toPandas()
    bkeys = {tuple(r) for r in batch[["user_id", "session_start_s"]].itertuples(index=False)}
    skeys = {tuple(r) for r in stream[["user_id", "session_start_s"]].itertuples(index=False)}
    assert skeys <= bkeys
    missing = bkeys - skeys
    assert missing  # at least the globally-last session can't flush
    gap_s = SESSION_GAP_MIN * 60
    max_sec = int(batch["session_end_s"].max())
    last = batch.sort_values("session_start_s").groupby("user_id").tail(1)
    last_keys = {
        tuple(r) for r in last[["user_id", "session_start_s"]].itertuples(index=False)
    }
    by_key = {
        (int(r.user_id), int(r.session_start_s)): int(r.session_end_s)
        for r in batch.itertuples(index=False)
    }
    for key in missing:
        assert key in last_keys  # only a user's final session can stay open
        assert by_key[key] >= max_sec - 2 * gap_s  # and only within the window
    # values of shared sessions agree exactly
    merged = batch.merge(
        stream, on=["user_id", "session_start_s"], suffixes=("_b", "_s")
    )
    assert (merged.session_end_s_b == merged.session_end_s_s).all()
    assert (merged.n_events_b == merged.n_events_s).all()
    assert (abs(merged.total_value_b - merged.total_value_s) < 1e-6).all()


def test_watermark_present_in_plan(spark, sf_dir):
    """The windowed agg must carry an event-time watermark (state
    boundedness at scale is non-negotiable)."""
    from overturelink_data_pipeline_spark.streaming.events import (
        windowed_event_counts,
    )

    read_table(spark, sf_dir, "events")
    stream = read_event_stream(spark, sf_dir)
    plan = windowed_event_counts(stream)._jdf.queryExecution().logical().toString()
    assert "EventTimeWatermark" in plan


def test_stateful_sessionize_deterministic(spark, sf_dir):
    read_table(spark, sf_dir, "events")
    a = run_to_completion(
        sessionize_stream(read_event_stream(spark, sf_dir)), spark, "append"
    ).toPandas().sort_values(["user_id", "session_start_s"]).reset_index(drop=True)
    b = run_to_completion(
        sessionize_stream(read_event_stream(spark, sf_dir)), spark, "append"
    ).toPandas().sort_values(["user_id", "session_start_s"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_timeparts_boundary_exactness(spark):
    """Pin _idiv against the decimal-division regression: decimal(38,6)
    HALF_UP-rounds the quotient to 6 decimals BEFORE floor, so any ns
    within 500_000 ns below a boundary used to land in the NEXT bucket
    (epoch_seconds(1_999_999_999) returned 2). Boundary values and the
    2^53+ double-error zone must both bucket exactly."""
    from pyspark.sql import functions as F, types as T

    from overturelink_data_pipeline_spark.functions import timeparts as TP

    HOUR_NS = 3_600 * TP.NS_PER_SEC
    cases = [
        # (ns, expected_seconds, expected_60min_bucket_start_ns)
        (1_999_999_999, 1, 0),
        (2_000_000_000, 2, 0),
        (2 * HOUR_NS - 1_000_000, 7199, HOUR_NS),       # 1 ms before boundary
        (2 * HOUR_NS, 7200, 2 * HOUR_NS),
        (2**53 + 7, 9007199, 0 if (2**53 + 7) % HOUR_NS < HOUR_NS else None),
    ]
    df = spark.createDataFrame(
        [(ns,) for ns, _, _ in cases],
        T.StructType([T.StructField("ns", T.LongType())]),
    )
    got = df.select(
        TP.epoch_seconds(F.col("ns")).alias("s"),
        TP.minute_bucket_ns(F.col("ns"), 60).alias("b"),
    ).collect()
    for (ns, want_s, want_b), row in zip(cases, got):
        assert row.s == ns // TP.NS_PER_SEC == want_s, (ns, row.s)
        assert row.b == (ns // HOUR_NS) * HOUR_NS, (ns, row.b)


def _write_event_file(path, rows):
    """(event_id, ts_seconds, user_id) rows → one events parquet file
    (ns timestamps, the r1 arrival type)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    ns = 1_000_000_000
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array([r[0] for r in rows], pa.int64()),
                "ts": pa.array([r[1] * ns for r in rows], pa.int64()),
                "user_id": pa.array([r[2] for r in rows], pa.int64()),
                "event_type": pa.array(["click"] * len(rows)),
                "value": pa.array([1.0] * len(rows)),
                "props": pa.array(["{}"] * len(rows)),
            }
        ),
        path,
    )


def _replay_two_batches(spark, tmp_path, file1, file2, plan_fn):
    """Drain plan_fn(stream) over two files as two REAL micro-batches
    (maxFilesPerTrigger=1; a_/b_ names pin the file order) into a
    memory sink; returns the drained table. Encodes the non-obvious
    bits once: ns timestamps via _normalize_ts, unique sink names,
    event_time as timestamp_micros(ts div 1000)."""
    import os
    import uuid

    from pyspark.sql import functions as F

    from overturelink_data_pipeline_spark.session import _normalize_ts

    d = str(tmp_path / "events")
    os.makedirs(d)
    _write_event_file(os.path.join(d, "a_first.parquet"), file1)
    _write_event_file(os.path.join(d, "b_second.parquet"), file2)
    schema = spark.read.parquet(d).schema
    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(d)
    )
    stream = _normalize_ts(stream).withColumn(
        "event_time", F.timestamp_micros(F.expr("ts div 1000"))
    )
    name = "tb" + uuid.uuid4().hex[:8]
    q = (
        plan_fn(stream)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name)


def test_late_event_extends_session_backward(spark, tmp_path):
    """Round-3 review: a watermark-accepted late event OLDER than the
    open session's start must extend session_start_s backward (the old
    fold only moved end_s forward). File 1 opens user 1's session at
    10000-10600; file 2 delivers a late in-gap event at 9500 plus
    user-2 traffic that advances the watermark until the session times
    out."""
    from overturelink_data_pipeline_spark.streaming.events import sessionize_stream

    table = _replay_two_batches(
        spark,
        tmp_path,
        [(1, 10000, 1), (2, 10600, 1)],
        [(3, 9500, 1), (4, 20000, 2), (5, 30000, 2), (6, 40000, 2)],
        sessionize_stream,
    )
    u1 = [
        (r["session_start_s"], r["session_end_s"], r["n_events"])
        for r in table.collect()
        if r["user_id"] == 1
    ]
    assert u1 == [(9500, 10600, 3)]


def test_session_window_merges_across_micro_batches(spark, tmp_path):
    """Built-in session_window state must MERGE a session that spans
    two micro-batches: file 1 opens user 1's session, file 2 delivers
    an in-gap continuation (forward extension) plus enough user-2
    traffic to push the watermark past the merged session's end."""
    from pyspark.sql import functions as F

    def plan(stream):
        return (
            stream.withWatermark("event_time", "30 minutes")
            .groupBy(
                F.session_window("event_time", "30 minutes").alias("w"), "user_id"
            )
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_events"))
        )

    table = _replay_two_batches(
        spark,
        tmp_path,
        [(1, 10000, 1), (2, 10600, 1)],
        # 11500 is within 30 min of 10600 -> same session, crossing batches
        [(3, 11500, 1), (4, 50000, 2), (5, 60000, 2)],
        plan,
    )
    u1 = [
        (r["w"]["start"].timestamp(), r["w"]["end"].timestamp(), r["n_events"])
        for r in table.collect()
        if r["user_id"] == 1
    ]
    # ONE merged session 10000 -> 11500+gap, all 3 events — not two
    # fragments split at the batch boundary
    assert u1 == [(10000.0, 11500.0 + 1800.0, 3)]


def test_run_to_completion_restores_conf_unset_state(spark, sf_dir):
    """The replay's conf overrides (shuffle partitions, progress-ring
    size) must restore the PRIOR state exactly: a conf that was not
    explicitly set before the call must be UNSET after it — never left
    pinned at a resolved default (ADVICE r6 + the same hazard on
    shuffle.partitions found in the r7 review)."""
    from overturelink_data_pipeline_spark.operators.streaming_ops import (
        read_event_stream,
    )
    from overturelink_data_pipeline_spark.streaming.events import (
        run_to_completion,
        sessionize_stream,
    )

    prog_key = "spark.sql.streaming.numRecentProgressUpdates"
    parts_key = "spark.sql.shuffle.partitions"
    # the shared test session sets shuffle.partitions; emulate both
    # prior states across the two keys: parts explicitly set (by
    # conftest), prog unset
    spark.conf.unset(prog_key)
    before_parts = spark.conf.get(parts_key, None)
    assert spark.conf.get(prog_key, None) is None
    run_to_completion(
        sessionize_stream(read_event_stream(spark, sf_dir)),
        spark,
        output_mode="append",
        shuffle_partitions=4,
    ).count()
    assert spark.conf.get(prog_key, None) is None, (
        "replay pinned the progress-ring conf into the session"
    )
    assert spark.conf.get(parts_key, None) == before_parts


def test_run_to_completion_unloads_state_providers(spark, sf_dir):
    """VERDICT r10 ask #1: terminated replays must not leave loaded
    state-store providers behind — the stream-stream join leaks 32 per
    run otherwise (its join stores bypass even unloadOnCommit), which
    hold RocksDB native handles and in-heap state maps until the 60 s
    maintenance tick and measurably slow every later query in a
    batched session (scripts/ab_stream_unload.py: first batched pass
    65.3 -> 36.4 s). Also pins that the unload is SAFE: a second
    replay after the unload returns identical rows."""
    import pytest as _pytest

    from overturelink_data_pipeline_spark.registry import QUERIES, load_all
    from overturelink_data_pipeline_spark.streaming.events import (
        loaded_provider_count,
    )

    load_all()
    q = QUERIES["stream_stream_attribution"]
    r1 = q(spark, sf_dir).collect()
    n_loaded = loaded_provider_count(spark)
    if n_loaded is None:  # Scala member layout drift
        _pytest.skip("loadedProviders not reflectable")
    assert n_loaded == 0, (
        f"{n_loaded} state-store providers still loaded after replay"
    )
    r2 = q(spark, sf_dir).collect()
    assert [tuple(x) for x in r1] == [tuple(x) for x in r2]
    assert loaded_provider_count(spark) == 0


def test_unload_skips_when_other_streams_active(spark, tmp_path):
    """Review r11: StateStore.stop() is JVM-global — firing it while
    ANOTHER streaming query is active would close that query's
    providers mid-flight. The helper must skip (and report False)
    while any stream is active, and fire once the session is quiet."""
    from overturelink_data_pipeline_spark.streaming.events import (
        unload_all_state_providers,
    )

    other = (
        spark.readStream.format("rate").option("rowsPerSecond", "1")
        .load().groupBy("value").count()
        .writeStream.format("memory").queryName("live_guard_probe")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .start()
    )
    try:
        assert unload_all_state_providers(spark) is False
    finally:
        other.stop()
        other.awaitTermination()
    assert unload_all_state_providers(spark) is True
