"""F12 — geometry split: fan one layer out into per-family layers.

Reference semantics (source.py:966-1003): partition a frame into
``{name}_points`` / ``{name}_lines`` / ``{name}_polygons`` /
``{name}_other`` layers, adding ``geometry_family`` and
``source_type`` columns.

Spark shape: ONE ``withColumn`` with the family CASE, then per-family
filters over the same cached plan — or, at scale, a single
``partitionBy("geometry_family")`` write (no per-family job at all).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from overturelink_data_pipeline_spark.geo.functions import (
    geometry_family,
    st_geometry_type,
)

FAMILIES = ("points", "lines", "polygons", "other")


class SplitLayers(dict):
    """Layer dict (``{name}_{family}`` → DataFrame) carrying the shared
    persisted parent so callers can release executor storage once the
    family layers are consumed. Iterates exactly like a plain dict, so
    sinks that flatten multi-layer results see only the four layers."""

    def __init__(self, layers: dict[str, DataFrame], tagged: DataFrame) -> None:
        super().__init__(layers)
        self.tagged = tagged

    def unpersist(self, blocking: bool = False) -> None:
        self.tagged.unpersist(blocking)


def with_geometry_family(df: DataFrame, source_type: str | None = None) -> DataFrame:
    """Tag each row with its geometry family (+ optional source_type,
    reference source.py:542,565)."""
    out = df.withColumn(
        "geometry_family", geometry_family(st_geometry_type(F.col("geometry")))
    )
    if source_type is not None:
        out = out.withColumn("source_type", F.lit(source_type))
    return out


def split_by_geometry(
    df: DataFrame, name: str, source_type: str | None = None
) -> dict[str, DataFrame]:
    """Multi-layer result dict keyed ``{name}_{family}`` — empty families
    included, as the reference returns all four buckets.

    The tagged frame is persisted so the upstream plan (scan + clip +
    family UDF) executes once; the four family filters are cheap scans
    of the cached partitions. The returned :class:`SplitLayers` exposes
    ``.unpersist()`` so long-lived sessions can release the cached
    partitions once the family layers are consumed. Consumers that want
    a single pass with no cache should use :func:`split_write` instead."""
    tagged = with_geometry_family(df, source_type=source_type).persist()
    return SplitLayers(
        {
            f"{name}_{fam}": tagged.filter(F.col("geometry_family") == fam)
            for fam in FAMILIES
        },
        tagged,
    )


def split_write(
    df: DataFrame, path: str, source_type: str | None = None, mode: str = "overwrite"
) -> None:
    """Scale path: one pass, hive-partitioned by family — the 100 TB
    version of the split (no four separate jobs)."""
    tagged = with_geometry_family(df, source_type=source_type)
    tagged.write.partitionBy("geometry_family").mode(mode).parquet(path)
