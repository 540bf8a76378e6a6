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
