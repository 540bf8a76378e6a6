"""Overture source conventions: hive path layout, per-type projection
lists, expected-column resolution, theme→type discovery.

Reference: URL builder source.py:383-395; OVERTURE_COLUMNS
source.py:30-71; expected columns source.py:397-410; theme map +
dynamic type discovery source.py:1309-1342.
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

#: P1 — projected columns per Overture type, with nested-field aliases
#: (reference OVERTURE_COLUMNS, source.py:30-71). Unknown type falls
#: back to ``[id, geometry]`` (source.py:439).
PROJECTIONS: dict[str, list[str]] = {
    "segment": [
        "id",
        "names.primary as name",
        "class",
        "subtype",
        "version",
        "geometry",
    ],
    "building": [
        "id",
        "names.primary as name",
        "height",
        "num_floors",
        "class",
        "subtype",
        "version",
        "geometry",
    ],
    "place": [
        "id",
        "names.primary as name",
        # full names struct too: normalize_places' X1 common-name
        # flatten reads names.common — projecting only the alias would
        # silently kill name_common in every compiled pipeline
        "names",
        "categories",
        "categories.primary as category",
        "confidence",
        # X3/X4 roots — without these the address/contact flatteners
        # are dead code on every compiled pipeline (they only fired on
        # raw un-projected frames) and address_full/locality/country,
        # website, email, phone silently vanish from place exports
        "addresses",
        "websites",
        "emails",
        "phones",
        "version",
        "geometry",
    ],
    "infrastructure": [
        "id",
        "names.primary as name",
        "subtype",
        "class",
        "height",
        "version",
        "geometry",
    ],
}

#: S15 — known theme → types map (reference source.py:1311-1319).
THEME_TYPES: dict[str, list[str]] = {
    "transportation": ["segment"],
    "buildings": ["building"],
    "places": ["place"],
    "base": ["infrastructure"],
    "divisions": ["division", "division_area", "division_boundary"],
}

#: Sector naming for the cache layout (S6, reference source.py:1546-1567).
SECTOR_NAMES: dict[tuple[str, str], str] = {
    ("transportation", "segment"): "roads",
    ("buildings", "building"): "buildings",
    ("places", "place"): "places",
    ("base", "infrastructure"): "infrastructure",
}


def theme_path(base_dir: str, theme: str, type_: str) -> str:
    """Hive-partitioned source path — partition pruning by construction
    (reference source.py:383-395 embeds theme/type in the URL)."""
    return f"{base_dir}/theme={theme}/type={type_}"


def _source_expr(spec: str) -> str:
    """The source half of a PROJECTIONS entry — the text before a
    case-INsensitive ``as`` (review r10: the root checks split on
    lowercase ``' as '`` while projection_output_name matched
    case-insensitively, so an uppercase-AS spec silently dropped the
    column from every compiled frame AND reported a phantom missing
    root to the dump validator)."""
    low = spec.lower()
    return spec[: low.index(" as ")].strip() if " as " in low else spec.strip()


def projection_output_name(spec: str) -> str:
    """Output name of one PROJECTIONS entry — pure string parsing (the
    two shapes the reference emits: ``a.b as y`` and plain ``a`` /
    ``a.b``; expected-column parser, source.py:397-410). JVM-free so
    plan-time metadata needs no SparkSession."""
    low = spec.lower()
    if " as " in low:
        return spec[low.index(" as ") + 4 :].strip()
    name = spec.strip()
    return name.split(".")[-1] if "." in name else name


def parse_projection(spec: str) -> tuple[Column, str]:
    """One PROJECTIONS entry → (column, output name)."""
    alias = projection_output_name(spec)
    expr = _source_expr(spec)
    return F.col(expr).alias(alias), alias


def expected_columns(type_: str) -> set[str]:
    """P2 — output-name set for a type; always includes geometry."""
    specs = PROJECTIONS.get(type_, ["id", "geometry"])
    names = {projection_output_name(s) for s in specs}
    names.add("geometry")
    return names


def expected_source_columns(type_: str) -> set[str]:
    """Source-side root columns a type's projection reads (``names.primary
    as name`` reads root ``names``). This — not the output-name set — is
    what a pre-projection mirror like the theme dump must validate
    against, since the dump copies raw source schema."""
    specs = PROJECTIONS.get(type_, ["id", "geometry"])
    roots = {_source_expr(s).split(".")[0] for s in specs}
    roots.add("geometry")
    return roots


def project(df: DataFrame, type_: str) -> DataFrame:
    """Apply the per-type projection, tolerating absent columns the way
    the reference's transform layer does (schema-on-read with graceful
    degradation, reference transform.py:449-458): a spec whose source
    column is missing is skipped."""
    cols = []
    for spec in PROJECTIONS.get(type_, ["id", "geometry"]):
        root = _source_expr(spec).split(".")[0]
        if root in df.columns:
            cols.append(parse_projection(spec)[0])
    return df.select(*cols)


def resolve_latest_release(
    base_dir: str | None = None,
    stac_url: str | None = None,
    timeout: float = 10.0,
) -> str:
    """S14 — latest-release resolution (reference settings.py:41-57
    reads the ``latest`` field of the Overture STAC catalog over HTTP).

    Network path is optional and gated: when ``stac_url`` is given the
    catalog JSON is fetched and its ``latest`` field returned; any
    failure (or no URL) falls back to listing release-like directory
    names under ``base_dir`` and taking the max under a NUMERIC-aware
    key: the date part of ``2026-01-15.10`` sorts fine as a string but
    the patch suffix does not (``.9`` > ``.10`` lexicographically —
    the reference's plain ``releases.sort(reverse=True)``,
    source.py:1694, has this same latent misordering).
    """
    if stac_url:
        try:
            import json as _json
            import urllib.request

            with urllib.request.urlopen(stac_url, timeout=timeout) as resp:
                doc = _json.loads(resp.read())
            latest = doc.get("latest")
            if latest:
                return str(latest)
        except Exception:
            pass
    if base_dir and os.path.isdir(base_dir):
        releases = [
            n
            for n in os.listdir(base_dir)
            if os.path.isdir(os.path.join(base_dir, n)) and n[:1].isdigit()
        ]
        if releases:

            def _key(name: str):
                date, _, patch = name.partition(".")
                return (date, int(patch) if patch.isdigit() else -1, patch)

            return max(releases, key=_key)
    raise LookupError("no release resolvable (no STAC response, no local releases)")


def discover_types(spark: SparkSession, base_dir: str, theme: str) -> list[str]:
    """S15 dynamic fallback — distinct ``type=`` partition values under
    a theme, sorted (reference source.py:1329-1334 regex-extracts from a
    file glob). A pure prefix LISTING via the Hadoop FileSystem API — no
    parquet footer is opened, which is what makes this O(partitions)
    instead of O(data) on an S3 bucket."""
    if theme in THEME_TYPES:
        return THEME_TYPES[theme]
    jvm = spark._jvm
    path = jvm.org.apache.hadoop.fs.Path(theme_path(base_dir, theme, "*").rsplit("/", 1)[0])
    fs = path.getFileSystem(spark._jsc.hadoopConfiguration())
    if not fs.exists(path):
        # unknown theme with no theme=<x> dir: empty discovery, like
        # the reference's glob returning no matches — not an opaque
        # Py4J FileNotFoundException (review r10)
        return []
    names = [
        st.getPath().getName()
        for st in fs.listStatus(path)
        if st.isDirectory()
    ]
    return sorted(n.split("=", 1)[1] for n in names if n.startswith("type="))
