"""Oracle-parity comparison utilities (SURVEY.md §5).

Replicates the driver's correctness gate locally: run a registered
Spark query and its DuckDB oracle SQL on the same parquet tables,
compare row count + sorted-column schema + an order-insensitive value
hash. Used by tests/test_oracle_parity.py so parity breaks locally
before the driver sees them.
"""

from __future__ import annotations

import hashlib
import math
import os
from dataclasses import dataclass
from typing import Any

import pandas as pd

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def duckdb_connect(sf_dir: str):
    """DuckDB connection with the driver's table views pre-registered."""
    import duckdb

    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.sql(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')"
            )
    return con


def _canon_cell(v: Any) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NULL"
        # queries pre-round to <=6 decimals; 9-digit repr absorbs binary noise
        return format(v, ".9g")
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_canon_cell(x) for x in v) + "]"
    return str(v)


def canonical_rows(df: pd.DataFrame) -> list[str]:
    cols = sorted(df.columns)
    out = []
    for row in df[cols].itertuples(index=False, name=None):
        out.append("\x1f".join(_canon_cell(v) for v in row))
    return sorted(out)


def value_hash(df: pd.DataFrame) -> str:
    h = hashlib.sha256()
    for line in canonical_rows(df):
        h.update(line.encode())
        h.update(b"\n")
    return h.hexdigest()


@dataclass
class ParityResult:
    name: str
    spark_rows: int
    oracle_rows: int
    spark_cols: list[str]
    oracle_cols: list[str]
    rows_match: bool
    schema_match: bool
    hash_match: bool

    @property
    def ok(self) -> bool:
        return self.rows_match and self.schema_match and self.hash_match


def compare(name: str, spark_df, oracle_pdf: pd.DataFrame) -> ParityResult:
    spark_pdf = spark_df.toPandas()
    spark_cols = sorted(spark_pdf.columns)
    oracle_cols = sorted(oracle_pdf.columns)
    return ParityResult(
        name=name,
        spark_rows=len(spark_pdf),
        oracle_rows=len(oracle_pdf),
        spark_cols=spark_cols,
        oracle_cols=oracle_cols,
        rows_match=len(spark_pdf) == len(oracle_pdf),
        schema_match=spark_cols == oracle_cols,
        hash_match=value_hash(spark_pdf) == value_hash(oracle_pdf),
    )


def diff_sample(spark_df, oracle_pdf: pd.DataFrame, n: int = 5) -> str:
    """Human-readable first-divergence sample for test failure messages."""
    s = canonical_rows(spark_df.toPandas())
    o = canonical_rows(oracle_pdf)
    only_s = [r for r in s if r not in set(o)][:n]
    only_o = [r for r in o if r not in set(s)][:n]
    return f"spark-only rows: {only_s}\noracle-only rows: {only_o}"
