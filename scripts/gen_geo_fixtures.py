"""Regenerate the committed golden-fixture parquet under fixtures/.

Run from the repo root:  python scripts/gen_geo_fixtures.py

The ``_g_*`` golden columns are frozen row-level truth computed by the
same Python geometry core the Spark UDFs run (geo/functions.py
clean_geometry_bytes / centroid_utm_lonlat, geo/geom.py) — committing
them makes the DuckDB oracle a regression gate over the distributed
UDF path. Regenerate ONLY when fixture content or golden semantics
intentionally change; the diff is then a reviewable behavior change.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from overturelink_data_pipeline_spark.geo.fixtures import (
    GOLDEN_DIR,
    write_golden_fixtures,
)


def main() -> None:
    spark = (
        SparkSession.builder.master("local[4]")
        .appName("gen-geo-fixtures")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    write_golden_fixtures(spark)
    print(f"wrote golden fixtures to {GOLDEN_DIR}")
    spark.stop()


if __name__ == "__main__":
    main()
