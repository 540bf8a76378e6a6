"""Hypothesis fuzz of the F5 filter dialect (functions/dialect.py)
against a DuckDB oracle — the property suite the reference planned but
never shipped (reference pyproject.toml:55, SURVEY.md §5 item 4).

Property: for every filter string in the supported dialect
(``col = 'v'``, ``col IN ('a', …)``, incl. nested struct paths), the
Spark-side apply_sql_filter and DuckDB running the same WHERE clause
over the same rows agree on the surviving id set. The reference's two
edge-case contracts are pinned separately: unknown column → empty,
unparseable → passthrough.
"""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from overturelink_data_pipeline_spark.functions.dialect import apply_sql_filter

SUBTYPES = ["road", "rail", "water", "path", ""]
CATEGORIES = ["school", "hospital", "cafe", "museum", None]


@pytest.fixture(scope="module")
def frames(spark):
    rows = [
        (f"id{i}", SUBTYPES[i % len(SUBTYPES)], CATEGORIES[i % len(CATEGORIES)])
        for i in range(40)
    ]
    sdf = spark.createDataFrame(
        [(i, s, {"primary": c, "alternate": []}) for i, s, c in rows],
        "id string, subtype string, "
        "categories struct<primary: string, alternate: array<string>>",
    ).cache()
    sdf.count()
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t (id VARCHAR, subtype VARCHAR, "
        "categories STRUCT(\"primary\" VARCHAR, alternate VARCHAR[]))"
    )
    con.executemany(
        "INSERT INTO t VALUES (?, ?, {'primary': ?, 'alternate': []})",
        [(i, s, c) for i, s, c in rows],
    )
    return sdf, con


col_strategy = st.sampled_from(["subtype", "categories.primary"])
val_strategy = st.sampled_from(SUBTYPES[:4] + [c for c in CATEGORIES if c] + ["zzz"])


def oracle_ids(con, where: str) -> set[str]:
    # DuckDB needs "primary" quoted (reserved word); values are simple
    # identifiers so a plain replace is unambiguous.
    where_d = where.replace("categories.primary", 'categories."primary"')
    return {r[0] for r in con.execute(f"SELECT id FROM t WHERE {where_d}").fetchall()}


@settings(max_examples=25, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(col=col_strategy, val=val_strategy)
def test_equality_shape_matches_duckdb(frames, col, val):
    sdf, con = frames
    flt = f"{col} = '{val}'"
    got = {r["id"] for r in apply_sql_filter(sdf, flt).select("id").collect()}
    assert got == oracle_ids(con, flt)


@settings(max_examples=25, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(
    col=col_strategy,
    vals=st.lists(val_strategy, min_size=1, max_size=4, unique=True),
)
def test_in_shape_matches_duckdb(frames, col, vals):
    sdf, con = frames
    flt = f"{col} IN ({', '.join(repr(v) for v in vals)})"
    got = {r["id"] for r in apply_sql_filter(sdf, flt).select("id").collect()}
    assert got == oracle_ids(con, flt)


def test_unknown_column_yields_empty(frames):
    sdf, _ = frames
    out = apply_sql_filter(sdf, "no_such_col = 'x'")
    assert out.count() == 0
    assert out.schema == sdf.schema  # same schema, just empty


def test_unparseable_filter_passes_through(frames):
    sdf, _ = frames
    out = apply_sql_filter(sdf, "]] not sql at all [[")
    assert out.count() == sdf.count()


def test_none_filter_is_identity(frames):
    sdf, _ = frames
    assert apply_sql_filter(sdf, None) is sdf
