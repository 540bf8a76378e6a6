"""Tests for the small parity completions: F7 dict filter, S13
staging-file creation, S14 latest-release resolution."""

from __future__ import annotations

import json
import os

import pytest

from overturelink_data_pipeline_spark.functions.dialect import apply_dict_filter
from overturelink_data_pipeline_spark.plans.overture import resolve_latest_release
from overturelink_data_pipeline_spark.sinks.staging import (
    cleanup_staging,
    stage_file,
)


def test_dict_filter_equality_chain(spark):
    df = spark.createDataFrame(
        [("a", 1, "x"), ("b", 2, "x"), ("a", 2, "y")], "k string, n int, t string"
    )
    out = apply_dict_filter(df, {"k": "a", "t": "x"}).collect()
    assert [(r.k, r.n) for r in out] == [("a", 1)]
    # empty dict / None → passthrough
    assert apply_dict_filter(df, {}).count() == 3
    assert apply_dict_filter(df, None).count() == 3


def test_dict_filter_unknown_column_empty(spark):
    df = spark.createDataFrame([("a", 1)], "k string, n int")
    out = apply_dict_filter(df, {"nope": "x"})
    assert out.count() == 0
    assert out.columns == df.columns  # same schema, like F5's contract


def test_dict_filter_nested_struct_field(spark):
    df = spark.sql(
        "select * from values (named_struct('primary', 'cafe'), 1),"
        " (named_struct('primary', 'bar'), 2) as t(categories, n)"
    )
    out = apply_dict_filter(df, {"categories.primary": "cafe"}).collect()
    assert [r.n for r in out] == [1]


def test_stage_geojson_roundtrip(spark, tmp_path):
    from overturelink_data_pipeline_spark.geo import fixtures as FX
    from overturelink_data_pipeline_spark.transform import normalize_places

    places = normalize_places(FX.fixture_df(spark, "places_place")).limit(5)
    path = stage_file(places, "geojson", staging_dir=str(tmp_path), name="pl")
    assert path.endswith("pl.geojson")
    doc = json.load(open(path))
    assert doc["type"] == "FeatureCollection"
    assert len(doc["features"]) == 5
    cleanup_staging(path)
    assert not os.path.exists(path)


def test_stage_gpkg_roundtrip(spark, tmp_path):
    from overturelink_data_pipeline_spark.geo import fixtures as FX
    from overturelink_data_pipeline_spark.sinks.gpkg import (
        list_gpkg_layers,
        read_gpkg_layer,
    )
    from overturelink_data_pipeline_spark.transform import normalize_places

    places = normalize_places(FX.fixture_df(spark, "places_place")).limit(5)
    path = stage_file(places, "gpkg", staging_dir=str(tmp_path), name="pl")
    assert path.endswith("pl.gpkg")
    assert list_gpkg_layers(path) == ["layer"]
    assert len(read_gpkg_layer(path, "layer")) == 5

    df = spark.createDataFrame([("a",)], "id string")
    with pytest.raises(ValueError):
        stage_file(df, "csv")


def test_resolve_latest_release_local(tmp_path):
    for rel in ["2025-12-15.0", "2026-01-15.0", "2025-06-15.0"]:
        (tmp_path / rel).mkdir()
    (tmp_path / "not-a-release").mkdir()
    assert resolve_latest_release(base_dir=str(tmp_path)) == "2026-01-15.0"


def test_resolve_latest_release_failure():
    with pytest.raises(LookupError):
        resolve_latest_release(base_dir="/nonexistent")
