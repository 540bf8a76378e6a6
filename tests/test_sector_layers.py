"""Tests for U1 sector layers (places_combined), T7 service-name
sanitize, and T9 export-name generation."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from overturelink_data_pipeline_spark.geo import fixtures as FX
from overturelink_data_pipeline_spark.geo.functions import st_geometry_type
from overturelink_data_pipeline_spark.transform import (
    add_sector_layers,
    export_filename,
    normalize_buildings,
    normalize_places,
    sanitize_service_name,
)


def test_places_combined_union_and_centroids(spark):
    places = normalize_places(FX.fixture_df(spark, "places_place"))
    buildings = normalize_buildings(FX.fixture_df(spark, "buildings_building"))
    out = add_sector_layers({"places": places, "buildings": buildings})
    assert set(out) == {"places", "buildings", "places_combined"}
    combined = out["places_combined"]
    n_places, n_buildings = places.count(), buildings.count()
    assert combined.count() == n_places + n_buildings
    # building rows became centroid Points tagged building_centroid
    bc = combined.filter(F.col("feature_type") == "building_centroid")
    assert bc.count() == n_buildings
    types = {
        r[0]
        for r in bc.select(st_geometry_type(F.col("geometry"))).distinct().collect()
    }
    assert types == {"Point"}
    # union kept places' columns; buildings-only columns are null-padded
    assert "building_class" in combined.columns
    assert "category_primary" in combined.columns


def test_sector_layers_passthrough_without_both_layers(spark):
    places = normalize_places(FX.fixture_df(spark, "places_place"))
    out = add_sector_layers({"places": places})
    assert set(out) == {"places"}


@pytest.mark.parametrize(
    "raw, expect",
    [
        ("main.Education Facilities", "education_facilities"),
        ("Roads-AL 2026!", "roads_al_2026"),
        ("x" * 40, "x" * 30),
    ],
)
def test_sanitize_service_name(raw, expect):
    assert sanitize_service_name(raw) == expect


def test_export_filename():
    assert export_filename("ALB", "roads", "geojson") == "alb_roads.geojson"
    assert export_filename("ALB", "roads", "gpkg", raw=True) == "alb_roads_raw.gpkg"
    assert export_filename("bgd", "Main.Power Grid", "geojsonseq") == "bgd_power_grid.geojsonl"
    with pytest.raises(KeyError):
        export_filename("ALB", "roads", "csv")


def test_pipeline_places_combined_registered(spark, sf_dir):
    from overturelink_data_pipeline_spark import registry

    registry.load_all()
    out = registry.QUERIES["pipeline_places_combined"](spark, sf_dir).toPandas()
    fts = set(out.feature_type)
    assert "building_centroid" in fts and "place" in fts
    assert set(out.geom_type) == {"Point"}
    assert out.n.sum() > 0
