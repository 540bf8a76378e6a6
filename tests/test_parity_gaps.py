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


def test_cleanup_staging_removes_fgdb_companion(tmp_path):
    """review r10: in a caller-provided staging dir, cleanup removed
    only the zip and leaked the unzipped .gdb directory every cycle."""
    import os

    from overturelink_data_pipeline_spark.sinks.staging import cleanup_staging

    gdb = tmp_path / "staged.gdb"
    gdb.mkdir()
    (gdb / "a00000001.gdbtable").write_bytes(b"x")
    z = tmp_path / "staged.gdb.zip"
    z.write_bytes(b"zip")
    cleanup_staging(str(z))
    assert not z.exists() and not gdb.exists()
    assert tmp_path.exists()  # the caller's dir itself is kept


def test_projection_as_parsing_case_insensitive():
    """review r10: the root checks split on lowercase ' as ' while the
    output-name parser was case-insensitive — an uppercase-AS spec
    silently dropped the column from compiled frames and reported a
    phantom missing source root."""
    from overturelink_data_pipeline_spark.plans.overture import (
        _source_expr,
        projection_output_name,
    )

    for spec in ("confidence as conf", "confidence AS conf", "confidence As conf"):
        assert projection_output_name(spec) == "conf"
        assert _source_expr(spec) == "confidence"
    assert _source_expr("names.primary") == "names.primary"


def test_discover_types_missing_theme_is_empty(spark, tmp_path):
    """review r10: an unknown theme with no theme=<x> directory used to
    surface a raw Py4J FileNotFoundException."""
    from overturelink_data_pipeline_spark.plans import overture as O

    saved = O.THEME_TYPES
    O.THEME_TYPES = {}
    try:
        assert O.discover_types(spark, str(tmp_path), "weather") == []
    finally:
        O.THEME_TYPES = saved


def test_media_kernels_skip_null_payloads(spark):
    """review r10: bytes(None) inside the media kernels killed the
    whole job on a single failed-fetch row; null payloads now skip."""
    from pyspark.sql import functions as F

    from overturelink_data_pipeline_spark.operators.multimodal import (
        decode_media,
        sample_frames,
    )

    df = spark.createDataFrame(
        [(1, "image", bytearray(b"abcdef")), (2, "video", None),
         (3, "video", bytearray(b"ghijkl"))],
        "media_id long, kind string, payload binary",
    )
    decoded = decode_media(df)
    assert {r["media_id"] for r in decoded.collect()} == {1, 3}
    frames = sample_frames(df)
    assert {r["media_id"] for r in frames.collect()} == {3}
