"""Query + oracle registry.

Every operator the engine claims (SURVEY.md §2 plus the LLM-pipeline
extensions) registers itself here with:

- a callable ``(spark, sf_dir) -> DataFrame`` — the Spark-first
  implementation, and
- optionally an ANSI-SQL string DuckDB can run on the same parquet
  tables — the correctness oracle.

``__spark_entry__.py`` is a thin shim over these dicts.

Hash-match conventions (the driver compares row-count + schema +
order-insensitive value hash, columns sorted by name):

- alias every computed column identically in Spark and SQL;
- round double aggregates (``ROUND(x, 2)`` money, ``ROUND(x, 4)``
  ratios) so summation-order float drift cannot flip the hash;
- cast integer sums to BIGINT in DuckDB (its SUM(int) yields HUGEINT);
- render dates/timestamps as strings in both engines;
- any LIMIT is preceded by a deterministic ORDER BY with a unique
  tie-break key.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import TYPE_CHECKING

if TYPE_CHECKING:
    from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[["SparkSession", str], "DataFrame"]

QUERIES: dict[str, QueryFn] = {}
ORACLE: dict[str, str] = {}


def spark_query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register ``fn`` as an engine query; ``oracle`` is DuckDB SQL.

    Queries without an oracle get the driver's weaker rows-only check
    (geometry ops, iterative/stateful ops — SURVEY.md §5 item 2).
    """

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name: {name}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLE[name] = oracle
        return fn

    return deco


def load_all() -> None:
    """Import every operator module so registration side-effects run."""
    # Imports are inside the function to avoid circular imports at
    # package-import time and to keep `import overturelink_data_pipeline_spark`
    # cheap for non-query uses.
    from overturelink_data_pipeline_spark.operators import (  # noqa: F401
        analytics,
        dedup,
        geospatial,
        multimodal,
        pipeline,
        relational,
        similarity,
        streaming_ops,
        text,
    )
