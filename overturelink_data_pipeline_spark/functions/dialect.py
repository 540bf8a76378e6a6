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


def filter_roots(filter_str: str | None) -> set[str]:
    """Root columns a KNOWN-shape filter references (empty set for
    generic expressions — callers must not assume coverage there)."""
    if not filter_str:
        return set()
    parsed = parse_filter(filter_str)
    if parsed is None:
        return set()
    return {parsed[0].split(".")[0]}


def filter_would_empty(df: DataFrame, filter_str: str | None) -> bool:
    """True exactly when apply_sql_filter(df, filter_str) would take
    its empty-on-unknown branch — the filter references something this
    frame cannot resolve. Parse failures (the passthrough branch, the
    same on every tier) and resolvable filters return False.

    Tier-selection probe (review r10): the cache tier stores a
    PROJECTED schema, so a filter that empties there may match rows on
    the raw schema — callers treat would-empty as a cache miss rather
    than serve the divergent empty frame. Driver-side analysis only,
    no job."""
    if not filter_str:
        return False
    parsed = parse_filter(filter_str)
    if parsed is not None:
        root = parsed[0].split(".")[0]
        if root.lower() not in {c.lower() for c in df.columns}:
            return True
    from pyspark.errors import AnalysisException, ParseException

    try:
        df.filter(F.expr(filter_str)).schema
        return False
    except ParseException:
        return False
    except AnalysisException:
        return True


def apply_sql_filter(df: DataFrame, filter_str: str | None) -> DataFrame:
    """Reference-parity filter application.

    The contract separates two failure classes (reference
    source.py:109-115 vs 147-148):

    - the filter references something the frame doesn't have
      (unknown root column, or a missing NESTED struct field that only
      resolution can detect) → ``df.limit(0)`` — empty, same schema;
    - the string isn't parseable as an expression at all →
      passthrough with a warning.

    Resolution is forced eagerly (``.schema``) so an unresolvable
    reference lands in the empty branch here, not as an
    AnalysisException at action time — and never as a silent
    passthrough, which would return UNFILTERED rows for a typo'd
    column.
    """
    if not filter_str:
        return df
    parsed = parse_filter(filter_str)
    if parsed is not None:
        root = parsed[0].split(".")[0]
        # case-INsensitive, matching how F.expr/F.col resolve under the
        # default spark.sql.caseSensitive=false — a case-sensitive check
        # here would empty a filter the generic-expression path accepts
        if root.lower() not in {c.lower() for c in df.columns}:
            log.warning("filter references unknown column %r → empty result", root)
            return df.limit(0)
    from pyspark.errors import AnalysisException, ParseException

    try:
        cond = F.expr(filter_str)
        out = df.filter(cond)
        # force analysis NOW: Spark parses F.expr lazily, so both error
        # classes surface here — ParseException must be caught before
        # AnalysisException (its superclass) to keep the two contracts
        # distinct. Only ANALYSIS failures map to the empty contract; a
        # transient infrastructure error (Py4J drop, OOM) must
        # propagate, not masquerade as a filtered-to-zero result.
        out.schema
        return out
    except ParseException:
        log.warning("unparseable filter %r → passthrough", filter_str)
        return df
    except AnalysisException:
        log.warning("filter %r does not resolve on this frame → empty", filter_str)
        return df.limit(0)


def apply_dict_filter(df: DataFrame, filters: dict | None) -> DataFrame:
    """F7 — dict equality-chain filter (reference source.py:1372-1376,
    1466-1471): ``{col: value}`` becomes chained ``.filter(col == v)``.
    Unknown root column → empty result with the same schema, matching
    F5's empty-frame contract. Dotted keys reach struct fields."""
    if not filters:
        return df
    from pyspark.errors import AnalysisException

    cols_lower = {c.lower() for c in df.columns}
    for key, value in filters.items():
        root = key.split(".")[0]
        if root.lower() not in cols_lower:
            log.warning("dict filter references unknown column %r → empty", key)
            return df.limit(0)
        try:
            out = df.filter(F.col(key) == F.lit(value))
            # force analysis so a missing NESTED struct field lands in
            # the empty contract here, exactly like apply_sql_filter —
            # the two filter surfaces must agree on the same input
            out.schema
            df = out
        except AnalysisException:
            log.warning("dict filter field %r does not resolve → empty", key)
            return df.limit(0)
    return df
