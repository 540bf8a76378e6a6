"""Geometry operators as registered queries (SURVEY.md §2.2-§2.7 geo rows).

DuckDB has no spatial extension offline, so these register WITHOUT
oracle SQL — the driver records rows-only checks (SURVEY.md §5 item
2); the real semantics are pinned by tests/test_wkb_geom.py +
tests/test_geo_spark.py property tests. Inputs are the seeded
Overture-shaped fixtures (geo/fixtures.py), so results are
deterministic across runs; `sf_dir` is ignored by design.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from overturelink_data_pipeline_spark.geo import fixtures as FX
from overturelink_data_pipeline_spark.geo.clip import (
    clip_bbox,
    clip_divisions,
    country_polygon,
)
from overturelink_data_pipeline_spark.geo.functions import (
    st_area,
    st_bbox,
    st_centroid_utm,
    st_geometry_type,
    st_is_valid,
    st_length,
)
from overturelink_data_pipeline_spark.geo.split import with_geometry_family
from overturelink_data_pipeline_spark.registry import spark_query
from overturelink_data_pipeline_spark.transform import (
    add_metadata,
    normalize_buildings,
    normalize_places,
    normalize_roads,
)

_PROCESSED = "2026-01-01T00:00:00"  # fixed M1 date → deterministic hashes


@spark_query("geo_roads_normalize")
def geo_roads_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Roads pipeline slice (SURVEY.md §7.2): fixture → normalize →
    metadata; geometry reduced to its rounded length for hashability."""
    roads = normalize_roads(FX.fixture_df(spark, "transportation_segment"))
    roads = add_metadata(roads, "AAA", "Aland", "transport", processed_date=_PROCESSED)
    return roads.select(
        "id",
        "name",
        "road_class",
        "road_type",
        "country_iso3",
        F.round(st_length(F.col("geometry")), 6).alias("length_deg"),
    ).orderBy("id")


@spark_query("geo_buildings_normalize")
def geo_buildings_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Buildings pipeline: make-valid → unwrap → polygons only; area and
    validity exposed as checkable columns."""
    b = normalize_buildings(FX.fixture_df(spark, "buildings_building"))
    return b.select(
        "id",
        "building_class",
        "building_type",
        F.round("height_m", 1).alias("height_m"),
        "floors",
        F.round(st_area(F.col("geometry")), 9).alias("area_deg2"),
        st_is_valid(F.col("geometry")).alias("valid"),
    ).orderBy("id")


@spark_query("geo_places_flatten")
def geo_places_flatten(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X1-X4 flattening on the struct-typed places fixture."""
    p = normalize_places(FX.fixture_df(spark, "places_place"))
    return p.select(
        "id",
        "name",
        "name_common",
        "category_primary",
        "category_alternate",
        "address_full",
        "address_locality",
        "website",
        "email",
        "phone",
        F.round("confidence", 3).alias("confidence"),
    ).orderBy("id")


@spark_query("geo_places_json_drift")
def geo_places_json_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X5 — same normalize over the JSON-string schema-drift variant
    (FIXTURES.md A6); values must equal geo_places_flatten's minus the
    dropped confidence column (pinned by test_geo_spark)."""
    p = normalize_places(FX.fixture_df(spark, "places_place", as_json_strings=True))
    return p.select(
        "id", "name", "name_common", "category_primary", "address_full", "website"
    ).orderBy("id")


@spark_query("geo_clip_divisions")
def geo_clip_divisions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1 — broadcast spatial semi-join clip to the concave fixture
    country (bbox prefilter + precise intersect)."""
    segs = FX.fixture_df(spark, "transportation_segment")
    divs = FX.fixture_df(spark, "divisions_division_area")
    cc = FX.COUNTRIES[0]
    poly = country_polygon(divs, cc["iso2"])
    out = clip_divisions(segs, poly, tuple(cc["bbox"]))
    return out.select("id", "class", "subtype").orderBy("id")


@spark_query("geo_clip_bbox")
def geo_clip_bbox(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1 — fast bbox-strategy clip (strict range predicate on the bbox
    struct; the plan should show pushed parquet filters when scanned
    from disk)."""
    segs = FX.fixture_df(spark, "transportation_segment")
    x0, y0, x1, y1 = FX.COUNTRIES[0]["bbox"]
    return clip_bbox(segs, x0, y0, x1, y1).select("id", "class").orderBy("id")


@spark_query("geo_split_families")
def geo_split_families(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F12 — geometry-family fan-out summarized as per-family counts."""
    infra = FX.fixture_df(spark, "base_infrastructure")
    return (
        with_geometry_family(infra, source_type="infrastructure")
        .groupBy("geometry_family")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("geometry_family")
    )


@spark_query("geo_centroid_utm")
def geo_centroid_utm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G7 — building centroids computed in estimated UTM, reprojected to
    4326 (reference cli.py:2242-2285), exposed as rounded lon/lat."""
    b = normalize_buildings(FX.fixture_df(spark, "buildings_building"))
    cent = b.withColumn("centroid", st_centroid_utm(F.col("geometry")))
    boxed = cent.withColumn("cbox", st_bbox(F.col("centroid")))
    return boxed.select(
        "id",
        F.round(F.col("cbox.xmin"), 6).alias("lon"),
        F.round(F.col("cbox.ymin"), 6).alias("lat"),
    ).orderBy("id")


@spark_query("geo_grid_partition_stats")
def geo_grid_partition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spatial-partitioning keys (geo/grid.py): per-cell feature counts
    on a 1° grid with both row-major and Z-order ids. Pure arithmetic
    over the stored bbox struct — no geometry decode; this is exactly
    the expression a bucketed 100 TB feature table would partition
    by."""
    from overturelink_data_pipeline_spark.geo.grid import grid_cell, morton_cell

    segs = FX.fixture_df(spark, "transportation_segment").filter(
        F.col("geometry").isNotNull()
    )
    lon = (F.col("bbox.xmin") + F.col("bbox.xmax")) / 2
    lat = (F.col("bbox.ymin") + F.col("bbox.ymax")) / 2
    return (
        segs.select(
            grid_cell(lon, lat, 1.0).alias("cell"),
            morton_cell(lon, lat, 1.0).alias("zcell"),
        )
        .groupBy("cell", "zcell")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("cell")
    )


@spark_query("geo_bbox_struct")
def geo_bbox_struct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G10/A3 — recomputed envelope struct vs the stored fixture bbox
    (both rounded; equality column proves consistency)."""
    segs = FX.fixture_df(spark, "transportation_segment").filter(
        F.col("geometry").isNotNull()
    )
    g = segs.withColumn("env", st_bbox(F.col("geometry")))
    return g.select(
        "id",
        F.round(F.col("env.xmin"), 5).alias("xmin"),
        F.round(F.col("env.ymax"), 5).alias("ymax"),
        (
            (F.abs(F.col("env.xmin") - F.col("bbox.xmin")) < 1e-4)
            & (F.abs(F.col("env.ymax") - F.col("bbox.ymax")) < 1e-4)
        ).alias("bbox_consistent"),
    ).orderBy("id")
