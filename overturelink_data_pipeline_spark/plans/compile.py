"""Query config → lazy DataFrame plan(s).

Reference lifecycle (SURVEY.md §3.1): YAML Query + Country → SQL text
→ DuckDB → temp parquet → pandas. Here the same inputs produce ONE
declarative plan — scan → project → clip → filter → limit — that
Catalyst executes with pushdown/pruning intact; nothing materializes
until the sink.

Plan-construction invariant (SURVEY.md §4): the buffered bbox range
conjunct is its own filter stage BEFORE the spatial-intersect UDF, so
parquet row-group pruning runs before any Python.

Dispatch mirrors reference source.py:791-802: geometry_split → single
read + family split; multilayer → two independent scans (J2); else
single layer.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from overturelink_data_pipeline_spark.geo.clip import (
    clip_bbox,
    clip_divisions,
    country_polygon,
)
from overturelink_data_pipeline_spark.geo.split import split_by_geometry
from overturelink_data_pipeline_spark.plans.models import (
    ClipStrategy,
    Country,
    Query,
    RunOptions,
)
from overturelink_data_pipeline_spark.plans.overture import project, theme_path


def read_theme(
    spark: SparkSession, base_dir: str, theme: str, type_: str
) -> DataFrame:
    """S1 — hive-path scan; partition pruning by URL construction
    (reference source.py:383-395,485)."""
    return spark.read.parquet(theme_path(base_dir, theme, type_))


#: (iso2, base_dir, snapshot) → country polygon WKB. The polygon is
#: immutable per (country, source snapshot) and collecting it runs a
#: Spark job over division_area — without the memo a multilayer query
#: re-ran that identical job per layer, and every retry attempt
#: repeated it. ``snapshot`` is the divisions dump sidecar's
#: (release, mtime) when one exists, so ensure_dump() rewriting the
#: same base_dir in-process (a new release) invalidates the memo
#: instead of silently serving the stale polygon.
_POLYGON_MEMO: dict[tuple[str, str, tuple | None], bytes] = {}


def _divisions_snapshot(base_dir: str) -> tuple | None:
    """(release, mtime_ns) of the divisions dump sidecar, or None when
    base_dir is not a dump mirror (raw source paths are immutable per
    release by construction)."""
    side = os.path.join(base_dir, "theme=divisions", "_dump_metadata.json")
    try:
        st = os.stat(side)
    except OSError:
        return None
    try:
        with open(side) as f:
            release = json.load(f).get("release")
    except (OSError, ValueError):
        release = None
    return (release, st.st_mtime_ns)


def _country_polygon_cached(
    spark: SparkSession, base_dir: str, iso2: str
) -> bytes:
    key = (iso2, base_dir, _divisions_snapshot(base_dir))
    if key not in _POLYGON_MEMO:
        # evict superseded snapshots of the same (iso2, base_dir): a
        # long-lived process re-running ensure_dump per release would
        # otherwise accumulate one dead polygon WKB per rewrite
        for k in [k for k in _POLYGON_MEMO if k[:2] == key[:2]]:
            del _POLYGON_MEMO[k]
        divisions = read_theme(spark, base_dir, "divisions", "division_area")
        _POLYGON_MEMO[key] = country_polygon(divisions, iso2)
    return _POLYGON_MEMO[key]


def _clip(
    df: DataFrame,
    spark: SparkSession,
    base_dir: str,
    country: Country,
    strategy: ClipStrategy,
) -> DataFrame:
    if strategy == ClipStrategy.BBOX:
        xmin, ymin, xmax, ymax = country.bbox
        return clip_bbox(df, xmin, ymin, xmax, ymax)
    wkb = _country_polygon_cached(spark, base_dir, country.iso2)
    return clip_divisions(df, wkb, country.bbox)


def _single_layer(
    spark: SparkSession,
    base_dir: str,
    theme: str,
    type_: str,
    filter_expr: str | None,
    country: Country,
    options: RunOptions,
) -> DataFrame:
    """scan → clip(bbox-first) → attribute filter → project → limit.

    The attribute filter (F4) runs on the RAW schema (it may reference
    struct fields like ``categories.primary`` that the projection
    flattens away, reference source.py:456-457 applies it to the scan
    alias ``d``); the clip runs before it so the cheap bbox conjunct is
    innermost. Catalyst then collapses all three filter stages into the
    scan anyway — the ordering matters only for the non-relational
    intersect UDF.
    """
    df = read_theme(spark, base_dir, theme, type_)
    df = _clip(df, spark, base_dir, country, options.clip)
    if filter_expr:
        df = df.filter(F.expr(filter_expr))
    df = project(df, type_)
    if options.limit is not None:
        df = df.limit(options.limit)  # F8 (reference source.py:459-460)
    return df


def compile_query(
    spark: SparkSession,
    base_dir: str,
    query: Query,
    country: Country,
    options: RunOptions | None = None,
) -> dict[str, DataFrame]:
    """Compile one queries.yml entry to its layer dict (reference
    OvertureSource.read dispatch, source.py:791-802)."""
    options = options or RunOptions()

    if query.geometry_split:
        base = _single_layer(
            spark, base_dir, query.theme, query.type, query.filter, country, options
        )
        return split_by_geometry(base, query.name, source_type=query.type)

    if query.is_multilayer:
        # J2 — dual-theme conjunction: two INDEPENDENT plans, tagged
        # with their source type (reference source.py:509-586 runs
        # places with `filter` and buildings with `building_filter`).
        places = _single_layer(
            spark, base_dir, "places", "place", query.filter, country, options
        ).withColumn("source_type", F.lit("place"))
        buildings = _single_layer(
            spark,
            base_dir,
            "buildings",
            "building",
            query.building_filter,
            country,
            options,
        ).withColumn("source_type", F.lit("building"))
        return {"places": places, "buildings": buildings}

    return {
        query.name: _single_layer(
            spark, base_dir, query.theme, query.type, query.filter, country, options
        )
    }
