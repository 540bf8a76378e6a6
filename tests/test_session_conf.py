"""Cluster-deployment conf unit tests (VERDICT r1 item 8): the
``fs.s3a.*`` block and region derivation are checked as pure dicts —
no network, no bucket access (the container is offline)."""

from __future__ import annotations

from overturelink_data_pipeline_spark.session import (
    DEFAULT_OVERTURE_BASE_URL,
    region_from_url,
    s3a_conf,
)


def test_region_from_url():
    assert region_from_url("s3://overturemaps-us-west-2/release") == "us-west-2"
    assert region_from_url("s3a://overturemaps-us-west-2/release") == "us-west-2"
    assert region_from_url("s3://mybucket-eu-central-1/x") == "eu-central-1"
    assert region_from_url("s3://data-ap-southeast-2") == "ap-southeast-2"
    # no derivable region → reference's default (source.py:319)
    assert region_from_url("s3://plainbucket/release") == "us-west-2"
    # a trailing digit alone is NOT a region — "mirror-2" must not be
    # baked into the s3a conf as an endpoint region
    assert region_from_url("s3://my-mirror-2/release") == "us-west-2"
    assert region_from_url("s3://data-2023") == "us-west-2"


def test_s3a_conf_block():
    conf = s3a_conf(DEFAULT_OVERTURE_BASE_URL)
    # all keys namespaced for SparkConf passthrough to Hadoop
    assert all(k.startswith("spark.hadoop.fs.s3a.") for k in conf)
    assert conf["spark.hadoop.fs.s3a.aws.credentials.provider"].endswith(
        "AnonymousAWSCredentialsProvider"
    )
    assert conf["spark.hadoop.fs.s3a.endpoint.region"] == "us-west-2"
    assert conf["spark.hadoop.fs.s3a.experimental.input.fadvise"] == "random"
    assert int(conf["spark.hadoop.fs.s3a.attempts.maximum"]) == 3


def test_ensure_parallelism_conditional(spark, tmp_path):
    """Three regimes: non-file frames pass through untouched; a
    single-row-group parquet scan (genuinely unsplittable) gets the
    rescue repartition; a multi-row-group scan is served by finer
    byte-range splits (openCostInBytes lowered) with NO shuffle."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from overturelink_data_pipeline_spark import session as S

    # non-file frame: layout unprobeable -> same object, no shuffle
    wide = spark.range(0, 1000, 1, numPartitions=max(2, 4))
    assert S.ensure_parallelism(wide) is wide

    # single row group: must repartition to defaultParallelism
    target = spark.sparkContext.defaultParallelism
    one = str(tmp_path / "one.parquet")
    pq.write_table(
        pa.table({"x": list(range(10000))}), one, row_group_size=10000
    )
    out = S.ensure_parallelism(spark.read.parquet(one))
    assert out.rdd.getNumPartitions() == target
    assert out.count() == 10000

    # many row groups: no Exchange in the plan (scan splits finer
    # instead), and the split-floor conf was lowered to make that real
    many = str(tmp_path / "many.parquet")
    pq.write_table(
        pa.table({"x": list(range(100000))}), many, row_group_size=100000 // target
    )
    df = S.ensure_parallelism(spark.read.parquet(many))
    assert "Exchange" not in df._jdf.queryExecution().executedPlan().toString()
    assert (
        S._conf_bytes(spark, "spark.sql.files.openCostInBytes", 0)
        == S._OPEN_COST_SMALL
    )
    assert df.count() == 100000


def test_parse_bytes_conf_renderings():
    from overturelink_data_pipeline_spark.session import _parse_bytes

    assert _parse_bytes("134217728b", 0) == 134217728
    assert _parse_bytes("128m", 0) == 128 * 1024**2
    assert _parse_bytes("1g", 0) == 1024**3
    assert _parse_bytes("4194304", 0) == 4194304
    assert _parse_bytes("garbage", 7) == 7


def test_geojson_layer_tag_all_null_props(spark, tmp_path):
    """to_json drops null fields; an all-null-props row + layer tag
    must still emit valid JSON (no trailing comma)."""
    import json as _json

    from pyspark.sql import Row, functions as F

    from overturelink_data_pipeline_spark.geo import wkb as W
    from overturelink_data_pipeline_spark.sinks.geojson import feature_line

    df = spark.createDataFrame([
        Row(name=None, geometry=W.dumps(("Point", (1.0, 2.0)))),
        Row(name="x", geometry=W.dumps(("Point", (3.0, 4.0)))),
    ])
    lines = [r.v for r in df.select(feature_line(df, "roads").alias("v")).collect()]
    feats = sorted((_json.loads(s) for s in lines),
                   key=lambda f: f["properties"].get("name") or "")
    assert feats[0]["properties"] == {"layer": "roads"}
    assert feats[1]["properties"] == {"layer": "roads", "name": "x"}


def test_region_from_url_multitoken_partitions():
    """review r10: us-gov-west-1 / us-iso-east-1 buckets used to yield
    the nonexistent 'gov-west-1' / 'iso-east-1'."""
    assert region_from_url("s3://mirror-us-gov-west-1/x") == "us-gov-west-1"
    assert region_from_url("s3://mirror-us-iso-east-1/x") == "us-iso-east-1"
    assert region_from_url("s3://data-us-west-2/x") == "us-west-2"
