"""Declarative query surface → DataFrame plan compiler (SURVEY.md §3).

The reference's query language is YAML configs (reference
data/queries.yml + domain/models.py:29-67) compiled to DuckDB SQL
text; here the same configs compile to lazy DataFrame plans that
Catalyst optimizes end-to-end.
"""

from overturelink_data_pipeline_spark.plans.compile import compile_query
from overturelink_data_pipeline_spark.plans.models import (
    ClipStrategy,
    Country,
    Query,
    RunOptions,
    load_countries,
)
from overturelink_data_pipeline_spark.plans.config import load_queries

__all__ = [
    "ClipStrategy",
    "Country",
    "Query",
    "RunOptions",
    "compile_query",
    "load_countries",
    "load_queries",
]
