"""overturelink_data_pipeline_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first engine with the query and data-processing
capabilities of the reference ETL pipeline ``worldbank/OvertureLink-Data-Pipeline``
(surveyed in /root/repo/SURVEY.md), extended with large-scale
training-data-pipeline operators (dedup, similarity search, text
analysis, multimodal columns).

Design stance (SURVEY.md §7.0):

- DataFrame-first, SQL-exposed: every operator is a declarative
  DataFrame plan; Catalyst does pushdown/pruning/join selection.
- Geometry is WKB ``BinaryType`` + a pure-numpy codec behind Arrow
  pandas UDFs (no native GEOS dependency required).
- No custom Catalyst rules; one plan-construction invariant — cheap
  bbox conjuncts precede any geometry UDF predicate.
"""

from overturelink_data_pipeline_spark.registry import ORACLE, QUERIES, spark_query
from overturelink_data_pipeline_spark.session import get_spark

__all__ = ["ORACLE", "QUERIES", "spark_query", "get_spark"]

__version__ = "0.1.0"
