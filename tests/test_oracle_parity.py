"""Local replica of the driver's DuckDB-oracle correctness gate.

Runs every registered query that has an oracle at sf0.001 and asserts
row-count, schema, and order-insensitive value-hash parity.
"""

from __future__ import annotations

import pytest

from overturelink_data_pipeline_spark import registry
from overturelink_data_pipeline_spark.testing import compare, diff_sample, duckdb_connect

registry.load_all()

ORACLE_QUERIES = sorted(registry.ORACLE)


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb_connect(sf_dir)
    yield con
    con.close()


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_oracle_parity(spark, sf_dir, duck, name):
    spark_df = registry.QUERIES[name](spark, sf_dir)
    oracle_pdf = duck.sql(registry.ORACLE[name]).df()
    res = compare(name, spark_df, oracle_pdf)
    assert res.rows_match, f"{name}: rows {res.spark_rows} != {res.oracle_rows}"
    assert res.schema_match, f"{name}: cols {res.spark_cols} != {res.oracle_cols}"
    assert res.hash_match, f"{name}: value hash mismatch\n" + diff_sample(
        spark_df, oracle_pdf
    )


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0 and len(df.columns) > 0


def test_all_queries_return_rows(spark, sf_dir):
    """Rows-only smoke for every registered query (incl. non-oracle ones)."""
    for name, fn in sorted(registry.QUERIES.items()):
        df = fn(spark, sf_dir)
        assert df.count() >= 0, name
