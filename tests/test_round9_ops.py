"""Round-9 surfaces: the per-shard manifest that replaced
sink_training_shards' driver-side glob (VERDICT r8 ask #2)."""

from __future__ import annotations

import glob
import os

from overturelink_data_pipeline_spark import registry

registry.load_all()


def test_shard_manifest_matches_disk(spark, sf_dir):
    """The manifest committed next to the shard dataset must account
    for exactly the on-disk files (one row per shard) and exactly the
    input rows — the audit trusts it instead of globbing, so this is
    the test that keeps it honest."""
    from overturelink_data_pipeline_spark.operators.curation import shard_out_dir

    audit = registry.QUERIES["sink_training_shards"](spark, sf_dir).collect()
    n_docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet")).count()
    man = spark.read.parquet(shard_out_dir() + "_manifest")
    disk_files = glob.glob(
        os.path.join(shard_out_dir(), "source=*", "salt=*", "*.parquet")
    )
    assert man.count() == len(disk_files)
    man_paths = {
        r["path"].removeprefix("file://") for r in man.select("path").collect()
    }
    assert man_paths == {os.path.abspath(p) for p in disk_files}
    assert sum(r["n_rows"] for r in audit) == n_docs
    assert sum(r["n_files"] for r in audit) == len(disk_files)
    # per-shard row bound holds in the manifest itself
    from overturelink_data_pipeline_spark.operators.curation import SHARD_MAX_ROWS

    assert man.filter(f"rows > {SHARD_MAX_ROWS}").count() == 0


def test_stream_stream_attribution_equals_batch_join(spark, sf_dir):
    """The drained stream-stream interval join must equal the
    identical-predicate batch join (single-batch drain: no row can
    arrive behind its partner's watermark)."""
    from pyspark.sql import functions as F

    from overturelink_data_pipeline_spark.operators.streaming_ops import (
        stream_stream_attribution,
    )
    from overturelink_data_pipeline_spark.session import read_events

    got = {
        (r["purchase_id"], r["view_id"], r["gap_us"])
        for r in stream_stream_attribution(spark, sf_dir).collect()
    }

    ev = read_events(spark, sf_dir).select(
        "event_id", "user_id", "event_type", F.col("ts").alias("ns")
    )
    v = ev.filter("event_type = 'view'").select(
        F.col("user_id").alias("v_user"),
        F.col("event_id").alias("view_id"),
        F.col("ns").alias("v_ns"),
    )
    p = ev.filter("event_type = 'purchase'").select(
        F.col("user_id").alias("p_user"),
        F.col("event_id").alias("purchase_id"),
        F.col("ns").alias("p_ns"),
    )
    win_ns = 30 * 60 * 1_000_000_000
    batch = p.join(
        v,
        (F.col("p_user") == F.col("v_user"))
        & (F.col("v_ns") >= F.col("p_ns") - win_ns)
        & (F.col("v_ns") <= F.col("p_ns")),
    ).select(
        "purchase_id",
        "view_id",
        ((F.col("p_ns") - F.col("v_ns")) / 1000).cast("long").alias("gap_us"),
    )
    want = {
        (r["purchase_id"], r["view_id"], r["gap_us"]) for r in batch.collect()
    }
    assert got == want
    assert want  # non-degenerate at every test SF


def test_sink_gpkg_audit_matches_oracle(spark, sf_dir):
    """Local replica of the driver gate for the r10-staged GPKG audit
    query (unregistered in r9 — no free slot): rows + sorted schema +
    value hash vs DuckDB, exactly what registration will run."""
    from overturelink_data_pipeline_spark.operators.geospatial import (
        SINK_GPKG_AUDIT_ORACLE,
        sink_gpkg_audit,
    )
    from overturelink_data_pipeline_spark.testing import compare, duckdb_connect

    duck = duckdb_connect(sf_dir)
    got = sink_gpkg_audit(spark, sf_dir)
    r = compare("sink_gpkg_audit", got, duck.sql(SINK_GPKG_AUDIT_ORACLE).df())
    assert r.rows_match and r.schema_match and r.hash_match, r
    # and the file really is a GeoPackage with both layers
    from overturelink_data_pipeline_spark.sinks.gpkg import list_gpkg_layers
    from overturelink_data_pipeline_spark import scratch

    path = scratch.process_dir("gpkg_audit", "export.gpkg")
    assert list_gpkg_layers(path) == ["ovt_places", "ovt_roads"]
