"""Driver contract for the spark-graft builder (PySpark target).

Thin shim over ``overturelink_data_pipeline_spark``'s query registry:
every operator module registers its Spark implementation and (when
SQL-expressible) its DuckDB oracle with the ``@spark_query``
decorator; this file just surfaces the registry to the driver.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from overturelink_data_pipeline_spark import registry  # noqa: E402

registry.load_all()


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1-style pricing summary) on sf0.001."""
    return registry.QUERIES["q1_pricing_summary"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 (+ extensions)."""
    return dict(registry.QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-dialect oracle SQL per query (rows-only ops omitted)."""
    return dict(registry.ORACLE)
