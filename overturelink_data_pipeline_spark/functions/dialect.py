"""The reference's filter dialect (F5 — apply_sql_filter,
source.py:74-152) over Spark.

The dialect is a strict subset of Spark SQL, so ``F.expr`` IS the
parser — what this module adds is the reference's edge-case contract:

- filter referencing an UNKNOWN column → EMPTY result (the reference
  returns an empty frame rather than erroring, source.py:109-115);
- UNPARSEABLE filter → passthrough with a warning (source.py:147-148);
- known shapes (``col = 'v'``, ``col IN ('a', 'b')``, both also on
  nested ``a.b`` struct fields) behave identically to SQL.

tests/test_dialect_fuzz.py pins dialect-vs-DuckDB agreement with
hypothesis-generated filters — the fuzz suite the reference planned
but never shipped (pyproject.toml:55, SURVEY.md §5 item 4).
"""

from __future__ import annotations

import logging
import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

log = logging.getLogger(__name__)

#: The four filter shapes the reference emits (queries.yml + F6
#: regexes, source.py:1766-1841).
_SHAPES = [
    re.compile(r"^\s*([A-Za-z_][\w.]*)\s*=\s*'([^']*)'\s*$"),
    re.compile(r"^\s*([A-Za-z_][\w.]*)\s+IN\s*\(([^)]*)\)\s*$", re.IGNORECASE),
]


def parse_filter(filter_str: str) -> tuple[str, str] | None:
    """→ (column_path, rest) if the string matches a known shape."""
    for pat in _SHAPES:
        m = pat.match(filter_str)
        if m:
            return m.group(1), m.group(2)
    return None


def apply_sql_filter(df: DataFrame, filter_str: str | None) -> DataFrame:
    """Reference-parity filter application.

    Column existence is checked at plan time against the frame's root
    columns; a miss yields ``df.limit(0)`` (empty, same schema) exactly
    like the reference's empty-frame return. Anything the dialect
    doesn't recognize is still handed to ``F.expr`` — only if Spark
    can't parse it either does it pass through unfiltered (with the
    reference's warning behavior).
    """
    if not filter_str:
        return df
    parsed = parse_filter(filter_str)
    if parsed is not None:
        root = parsed[0].split(".")[0]
        if root not in df.columns:
            log.warning("filter references unknown column %r → empty result", root)
            return df.limit(0)
        return df.filter(F.expr(filter_str))
    try:
        return df.filter(F.expr(filter_str))
    except Exception:
        log.warning("unparseable filter %r → passthrough", filter_str)
        return df


def apply_dict_filter(df: DataFrame, filters: dict | None) -> DataFrame:
    """F7 — dict equality-chain filter (reference source.py:1372-1376,
    1466-1471): ``{col: value}`` becomes chained ``.filter(col == v)``.
    Unknown root column → empty result with the same schema, matching
    F5's empty-frame contract. Dotted keys reach struct fields."""
    if not filters:
        return df
    for key, value in filters.items():
        root = key.split(".")[0]
        if root not in df.columns:
            log.warning("dict filter references unknown column %r → empty", key)
            return df.limit(0)
        df = df.filter(F.col(key) == F.lit(value))
    return df
