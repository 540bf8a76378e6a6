"""URL canonicalization — the crawl-curation primitive (VERDICT r11
ask #5a): collapse cosmetic URL variants (scheme/host case, www.
prefix, default ports, tracking params, fragments, trailing slashes)
to one canonical form so host-level dedup rollups count real pages,
not encodings.

Everything here is a composition of built-in string expressions
(regexp_replace / regexp_extract / lower / concat) — JVM-side,
whole-stage-codegen'd, scan-local: no UDF, no shuffle, safe to apply
to 100 TB of crawl rows as a projection. Patterns avoid lookarounds so
the SEMANTICS are re-expressible in RE2-based engines (the DuckDB
oracles mirror each rule 1:1).

Rule set (industry-standard crawl canonicalization, cf. the common
crawl / C4 pipelines):

1. drop the fragment (``#...``);
2. lowercase scheme + authority (path/query case is significant);
3. strip a leading ``www.`` host label;
4. strip scheme-default ports (``:80`` http, ``:443`` https);
5. drop ``utm_*`` tracking parameters (other params kept, in order);
6. normalize slash-before-query and trailing ``?``/``&``/``/``.

The utm rule matches the whole ADJACENT RUN (`(utm_[^&#]*&)+`) rather
than one param, so any count of consecutive trackers collapses in one
application — deliberately, because a per-param pattern makes
replace-all (Spark) and replace-first (DuckDB default) diverge at four
adjacent params; the run pattern plus the end-anchored terminal rule
give both dialects identical results for runs anywhere in the query
(oracles pass the 'g' flag for multiple separated runs). Pinned in
tests/test_round12_fixes.py.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["canonical_url", "url_host", "registered_domain"]


def _lower_authority(u: Column) -> Column:
    """Lowercase everything through the authority (scheme://host:port),
    leaving path/query untouched."""
    prefix = F.regexp_extract(u, r"^[^:/?#]+://[^/?#]*", 0)
    rest = u.substr(F.length(prefix) + F.lit(1), F.length(u))
    return F.concat(F.lower(prefix), rest)


def canonical_url(u: Column) -> Column:
    """Canonical form of a URL column (see module docstring rules)."""
    # 1. fragment
    c = F.regexp_replace(u, r"#.*$", "")
    # 2. case: scheme + authority only
    c = _lower_authority(c)
    # 3. www. (after lowering, so the prefix is literal)
    c = F.regexp_replace(c, r"^([a-z][a-z0-9+.-]*://)www\.", "$1")
    # 4. default ports — char-class guard instead of lookahead so the
    # rule can't truncate a longer port like :4430; the optional
    # trailing group always participates (it may match empty), so $2
    # is well-defined in both Java and RE2 regex engines
    c = F.regexp_replace(c, r"^(https://[^/:?#]*):443(([/?#].*)?)$", "$1$2")
    c = F.regexp_replace(c, r"^(http://[^/:?#]*):80(([/?#].*)?)$", "$1$2")
    # 5. utm_* params: whole adjacent runs mid-query, then terminal
    c = F.regexp_replace(c, r"([?&])(utm_[^&#]*&)+", "$1")
    c = F.regexp_replace(c, r"[?&]utm_[^&#]*$", "")
    # 6. hygiene: path-end slash before the query, then trailing
    # '?'/'&', then trailing '/'. The slash rule is ANCHORED to the
    # start ([^?#]* keeps the match before the first '?'), so only the
    # path→query boundary collapses — an unanchored '/\?' would also
    # rewrite literal '/?' sequences INSIDE the query value (corrupting
    # distinct URLs into one) and would diverge between replace-all
    # and replace-first dialects on such URLs; anchored, both dialects
    # have exactly one possible match (review r12)
    c = F.regexp_replace(c, r"^([a-z][a-z0-9+.-]*://[^?#]*)/\?", "$1?")
    c = F.regexp_replace(c, r"[?&]$", "")
    c = F.regexp_replace(c, r"/$", "")
    return c


def url_host(u: Column) -> Column:
    """Host of a (canonical) URL — authority minus any port."""
    return F.regexp_extract(u, r"^[a-z][a-z0-9+.-]*://([^/:?#]*)", 1)


def registered_domain(host: Column) -> Column:
    """Last two host labels — the registered domain under a single-label
    public suffix (a full PSL lookup is a broadcast-join against the
    suffix list; the two-label fallback is the standard approximation
    and exactly right for the fixture's .com/.org hosts)."""
    return F.regexp_extract(host, r"([^.]+\.[^.]+)$", 1)
