"""Three-tier source resolution with retry + strategy downgrade
(reference source.py:761-936, 1005-1032).

Order: country cache (schema-validated, filter/limit reapplied) →
local theme dump → direct source. A failed precise-clip READ SETUP
retries with exponential backoff and downgrades divisions→bbox on the
later attempts (reference source.py:1024-1029: 300 s × attempt; here
the backoff is injectable so tests don't sleep). Scope of the retry
envelope: plan construction — parquet footer/schema reads, partition
listing, and the country-polygon collect (the one eager action, and
the step the divisions→bbox downgrade exists for). The returned plans
are lazy, so a transient storage failure DURING the distributed scan
surfaces at the caller's action; cluster-level task retries
(spark.task.maxFailures) own that layer — re-running plan compilation
here could not help it.

All three tiers yield the SAME lazy plan shape — only the scan path
differs — so downstream transform/sink stages are tier-agnostic.
"""

from __future__ import annotations

import dataclasses
import logging
import time
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from overturelink_data_pipeline_spark.plans.compile import compile_query
from overturelink_data_pipeline_spark.plans.models import (
    ClipStrategy,
    Country,
    Query,
    RunOptions,
)
from overturelink_data_pipeline_spark.sources import cache as cache_mod

log = logging.getLogger(__name__)

#: Reference retry envelope (source.py:1005-1032).
MAX_ATTEMPTS = 3
BACKOFF_BASE_S = 300.0


@dataclass
class OvertureReader:
    """Resolves a query's layers through cache → dump → direct.

    ``base_dir`` is the direct source root (hive theme=/type= layout);
    ``dump_dir`` an optional local mirror in the same layout
    (reference ensure_dump, source.py:1092-1233); ``cache_root`` the
    country-cache root (S6 layout).
    """

    spark: SparkSession
    base_dir: str
    release: str
    dump_dir: str | None = None
    cache_root: str | None = None
    sleeper: Callable[[float], None] = field(default=time.sleep)
    backoff_base_s: float = BACKOFF_BASE_S

    # -- single-layer resolution ----------------------------------------

    def _dump_valid(self, theme: str) -> bool:
        """Sidecar says complete AND matches this reader's release —
        the one shared contract (dump.dump_is_valid; review r10 merged
        this with ensure_dump's hand-rolled copy)."""
        from overturelink_data_pipeline_spark.sources.dump import dump_is_valid

        return dump_is_valid(self.dump_dir, theme, self.release)

    def _from_cache(
        self, query: Query, country: Country, options: RunOptions
    ) -> DataFrame | None:
        if self.cache_root is None:
            return None
        path = cache_mod.cache_path(
            self.cache_root, self.release, country.iso2, query.theme, query.type
        )
        # filters are written against the projected (cached) schema; if
        # this filter's root columns aren't in the cache, the dialect's
        # empty-on-unknown contract would silently return 0 rows HERE
        # while the direct tier (raw schema) would return matches —
        # treat that divergence as a cache MISS so resolution falls
        # through to a tier that can actually evaluate the filter
        if query.filter is not None:
            schema = cache_mod.cached_schema(self.spark, path)
            cols = None if schema is None else schema.names
            if cols is not None:
                from overturelink_data_pipeline_spark.functions.dialect import (
                    filter_would_empty,
                    parse_filter,
                )

                # Resolvability gate (review r10): any filter the cache
                # cannot resolve is a MISS, so resolution falls through
                # to a tier (raw schema) that can evaluate it — the
                # dialect's empty-on-unknown branch would otherwise
                # serve 0 rows here as a "hit". Two cost tiers
                # (ADVICE r10): a KNOWN-shape filter over a SIMPLE
                # top-level column is fully decided by the footer
                # schema cached_schema already fetched — no second
                # reader, no expression analysis. Only dotted paths
                # (nested-field presence needs resolution) and generic
                # expressions pay the analysis probe, which mirrors the
                # exact branch apply_sql_filter would take. The fast
                # path additionally requires the cached column's type
                # to be ATOMIC (ADVICE r11): a cache written from a
                # transformed frame can carry a same-named column with
                # a complex type (struct/array/map) on which a scalar
                # comparison would NOT resolve — those fall to the
                # analysis probe, which decides it exactly.
                parsed = parse_filter(query.filter)
                resolvable: bool | None = None
                if parsed is not None:
                    root = parsed[0].split(".")[0]
                    by_lower = {f.name.lower(): f for f in schema.fields}
                    field = by_lower.get(root.lower())
                    if field is None:
                        resolvable = False
                    elif "." not in parsed[0] and isinstance(
                        field.dataType, T.AtomicType
                    ):
                        resolvable = True
                if resolvable is None:
                    resolvable = not filter_would_empty(
                        self.spark.read.parquet(path), query.filter
                    )
                if not resolvable:
                    log.info(
                        "filter %r cannot resolve on the cached schema; "
                        "falling through",
                        query.filter,
                    )
                    return None
        return cache_mod.read_cache(
            self.spark,
            path,
            type_=query.type,
            filter_expr=query.filter,
            limit=options.limit,
        )

    def _compile_from(
        self, root: str, query: Query, country: Country, options: RunOptions
    ) -> dict[str, DataFrame]:
        return compile_query(self.spark, root, query, country, options)

    def read(
        self, query: Query, country: Country, options: RunOptions | None = None
    ) -> dict[str, DataFrame]:
        """Layer dict via the first tier that works (reference
        source.py:804-936)."""
        options = options or RunOptions()

        # Tier 1: cache — only for plain single-layer queries (the cache
        # stores one theme×type table; split/multilayer recompose below).
        if not query.geometry_split and not query.is_multilayer:
            cached = self._from_cache(query, country, options)
            if cached is not None:
                log.info("cache hit for %s/%s", country.iso2, query.name)
                # cache rows are already clipped+projected; just re-key
                return {query.name: cached}

        # Tier 2: local dump mirror, same layout as the direct source.
        # Only trusted when its sidecar says COMPLETE for THIS release —
        # the dump layout has no release path component, so without the
        # check a stale mirror (or a hard-killed partial write that
        # never ran cleanup) would silently serve wrong-release or
        # incomplete rows labeled as current (reference revalidates the
        # same way, source.py:1102-1115). EVERY theme the compile will
        # scan must pass, not just the query's own (review r10): a
        # multilayer query also reads buildings, and a divisions clip
        # reads the divisions theme — an invalid mirror of those was
        # previously served silently.
        themes = {query.theme}
        if query.is_multilayer:
            themes.add("buildings")
        if options.clip == ClipStrategy.DIVISIONS:
            themes.add("divisions")
        if self.dump_dir is not None and all(
            self._dump_valid(t) for t in themes
        ):
            try:
                return self._compile_from(self.dump_dir, query, country, options)
            except Exception as exc:  # dump missing/partial → fall through
                log.warning("dump tier failed (%s); falling back to direct", exc)

        # Tier 3: direct, with retry + divisions→bbox downgrade.
        return self._read_direct_with_retry(query, country, options)

    def _read_direct_with_retry(
        self, query: Query, country: Country, options: RunOptions
    ) -> dict[str, DataFrame]:
        last: Exception | None = None
        for attempt in range(1, MAX_ATTEMPTS + 1):
            opts = options
            if attempt > 1 and options.clip == ClipStrategy.DIVISIONS:
                # strategy downgrade (reference source.py:1024-1027);
                # dataclasses.replace so a future RunOptions field is
                # carried through instead of silently reset (review r10)
                opts = dataclasses.replace(options, clip=ClipStrategy.BBOX)
                log.warning("attempt %d: downgrading divisions→bbox clip", attempt)
            try:
                return self._compile_from(self.base_dir, query, country, opts)
            except Exception as exc:
                last = exc
                if attempt < MAX_ATTEMPTS:
                    self.sleeper(self.backoff_base_s * attempt)
        raise RuntimeError(
            f"source resolution failed after {MAX_ATTEMPTS} attempts: {last}"
        ) from last

    # -- cache population ------------------------------------------------

    def cache_country(self, query: Query, country: Country) -> cache_mod.CacheMetadata:
        """--download-only path (reference source.py:1394-1483): run the
        clip WITHOUT filter/limit and persist complete country data."""
        if self.cache_root is None:
            raise ValueError("reader has no cache_root")
        complete = Query(
            name=query.name,
            theme=query.theme,
            type=query.type,
            filter=None,  # complete-data semantics
            geometry_split=False,
        )
        layers = self._compile_from(
            self.base_dir, complete, country, RunOptions(limit=None)
        )
        df = layers[complete.name]
        path = cache_mod.cache_path(
            self.cache_root, self.release, country.iso2, query.theme, query.type
        )
        return cache_mod.write_cache(
            df,
            path,
            country=country.iso2,
            theme=query.theme,
            type_=query.type,
            release=self.release,
        )


def resolve_release(
    fetcher: Callable[[], str] | None = None, default: str = "2026-05-15.0"
) -> str:
    """S14 — latest-release resolution (reference settings.py:41-57 GETs
    the Overture STAC catalog's ``latest`` field). Network access is
    injected; offline callers get the pinned default."""
    if fetcher is None:
        return default
    try:
        return fetcher()
    except Exception:
        return default
