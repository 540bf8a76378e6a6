"""Country clipping — the reference's core query semantics.

Two strategies, exactly as the reference (source.py:418-507):

- ``bbox``: pure range predicate on the per-row ``bbox`` struct —
  pushes to Parquet row-group statistics, no geometry decode at all.
- ``divisions``: precise polygon intersection — a broadcast spatial
  semi-join (J1) against ONE country polygon from the divisions
  theme, with the buffered bbox range predicate (F2, +0.1°) applied
  FIRST so the expensive UDF only sees candidate rows.

Scale stance: the build side is a single row collected on the driver
and shipped in the UDF closure (a broadcast of bytes) — the classic
broadcast nested-loop spatial join. The bbox prefilter is the range
pruning stage; at 100 TB it is what keeps the UDF off 99% of rows,
because Parquet row-group stats on ``bbox.xmin``... prune entire
row groups before any Python runs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from overturelink_data_pipeline_spark.geo.functions import st_intersects_with

#: F2 buffer — reference uses 0.1° around the country bbox before the
#: precise spatial test (source.py:468-481).
BBOX_BUFFER_DEG = 0.1


def bbox_predicate(
    xmin: float, ymin: float, xmax: float, ymax: float, buffer: float = 0.0
) -> Column:
    """F1/F2 — range predicate over the per-row ``bbox`` struct
    (reference source.py:496-507: strict inequalities)."""
    return (
        (F.col("bbox.xmin") > xmin - buffer)
        & (F.col("bbox.xmax") < xmax + buffer)
        & (F.col("bbox.ymin") > ymin - buffer)
        & (F.col("bbox.ymax") < ymax + buffer)
    )


def country_polygon(divisions: DataFrame, iso2: str) -> bytes:
    """S2 — scalar-subquery country polygon lookup: one row collected on
    the driver (reference ``SET variable country_geom = (SELECT geometry
    ... WHERE subtype='country' AND country='{ISO2}' LIMIT 1)``,
    source.py:482-488)."""
    rows = (
        divisions.filter(
            (F.col("subtype") == "country") & (F.col("country") == iso2)
        )
        .select("geometry")
        .limit(1)
        .collect()
    )
    if not rows:
        raise ValueError(f"no divisions row for country {iso2!r}")
    if rows[0][0] is None:
        # a matching row with NULL geometry used to surface as
        # `TypeError: cannot convert NoneType to bytes` with no country
        # context (review r10)
        raise ValueError(
            f"divisions row for country {iso2!r} has NULL geometry"
        )
    return bytes(rows[0][0])


def clip_bbox(
    df: DataFrame, xmin: float, ymin: float, xmax: float, ymax: float
) -> DataFrame:
    """``bbox`` strategy: fast, pure pushdown-able range filter."""
    return df.filter(bbox_predicate(xmin, ymin, xmax, ymax))


def clip_divisions(
    df: DataFrame,
    country_wkb: bytes,
    country_bbox: tuple[float, float, float, float],
    buffer: float = BBOX_BUFFER_DEG,
) -> DataFrame:
    """``divisions`` strategy: buffered bbox prefilter (F2), THEN the
    broadcast spatial semi-join predicate (F3/J1).

    The filter order is a plan-construction invariant (SURVEY.md §4):
    Catalyst cannot cost the black-box UDF, so the cheap conjunct is
    applied as its own `.filter` stage first.
    """
    xmin, ymin, xmax, ymax = country_bbox
    prefiltered = df.filter(bbox_predicate(xmin, ymin, xmax, ymax, buffer=buffer))
    intersects = st_intersects_with(country_wkb)
    return prefiltered.filter(intersects(F.col("geometry")))
