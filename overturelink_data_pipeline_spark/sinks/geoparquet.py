"""GeoParquet-style sink — the scalable default (SURVEY.md §7.1 step 5).

Distributed zstd parquet write of the WKB-geometry frame, plus a JSON
sidecar carrying the geo column metadata (geometry column name,
encoding, CRS, bbox) computed in ONE aggregate job. The sidecar
mirrors what the GeoParquet spec stores in the parquet footer "geo"
key — Spark's writer can't inject custom footer metadata without a
JVM extension, and the sidecar keeps the engine dependency-free while
remaining machine-readable.

Also hosts the GDAL-driver sinks' stand-ins (S9/S10): GPKG/FileGDB
need pyogrio/GDAL, absent in this container — they are import-gated
stubs with the driver-side strategy documented (bounded, country-
sized outputs, reference export.py:327-407).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from overturelink_data_pipeline_spark.geo.functions import st_bbox


def write_geoparquet(
    df: DataFrame,
    path: str,
    *,
    geometry_col: str = "geometry",
    partition_by: list[str] | None = None,
    mode: str = "overwrite",
) -> dict:
    """Distributed write + geo sidecar; returns the sidecar dict."""
    writer = df.write.mode(mode).option("compression", "zstd")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)

    written = df.sparkSession.read.parquet(path)
    if geometry_col in written.columns:
        b = written.select(st_bbox(F.col(geometry_col)).alias("b")).select(
            F.min("b.xmin").alias("xmin"),
            F.min("b.ymin").alias("ymin"),
            F.max("b.xmax").alias("xmax"),
            F.max("b.ymax").alias("ymax"),
            F.count(F.lit(1)).alias("n"),
        )
        row = b.collect()[0]
        bbox = (
            [row["xmin"], row["ymin"], row["xmax"], row["ymax"]]
            if row["n"]
            else None
        )
        count = int(row["n"])
    else:
        bbox, count = None, written.count()

    meta = {
        "version": "1.0.0",
        "primary_column": geometry_col,
        "columns": {
            geometry_col: {
                "encoding": "WKB",
                "crs": "EPSG:4326",
                "bbox": bbox,
            }
        },
        "feature_count": count,
    }
    with open(os.path.join(path, "_geo_metadata.json"), "w") as f:
        json.dump(meta, f)
    return meta


def write_gpkg(df: DataFrame, path: str, layer: str = "layer") -> None:
    """S9 — GeoPackage sink. Driver-side strategy: collect the bounded
    (country-sized) output and hand to pyogrio/GDAL. Gated on the GDAL
    stack being installed."""
    try:
        import pyogrio  # noqa: F401
    except ImportError as exc:
        raise NotImplementedError(
            "GPKG export needs pyogrio/GDAL (not in this container); "
            "use write_geoparquet or write_geojsonseq instead"
        ) from exc
    raise NotImplementedError("pyogrio present but writer not wired yet")


def write_filegdb(df: DataFrame, path: str, layer: str = "layer") -> None:
    """S10 — FileGDB sink (OpenFileGDB driver, 64-char field-name
    truncation). Same GDAL gating as write_gpkg."""
    try:
        import pyogrio  # noqa: F401
    except ImportError as exc:
        raise NotImplementedError(
            "FileGDB export needs pyogrio/GDAL (not in this container)"
        ) from exc
    raise NotImplementedError("pyogrio present but writer not wired yet")
