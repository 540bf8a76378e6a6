"""Command-line surface for the three reference lifecycles
(reference cli.py: Typer app with arcgis-upload / export /
overture-dump commands, cli.py:967-2084).

Spark-first re-expression with stdlib argparse (Typer is not in the
container and a CLI needs no runtime dependency anyway):

- ``export``   — §3.2: read → normalize → add_metadata → format sink
  (``--raw`` short-circuits the transform stage like the reference's
  ``COPY … FORMAT GDAL`` path, cli.py:1271-1278);
- ``cache``    — §3.3 ``--download-only``: complete-country clip
  persisted with sidecar metadata (source.py:1394-1483);
- ``dump``     — §3.3 whole-theme mirror (``ensure_dump``,
  source.py:1092-1233);
- ``countries``— registry listing (reference list-countries helpers,
  config/countries.py:69-80).

Every command accepts ``--base-dir`` pointing at a hive
``theme=/type=`` layout; without it the seeded Overture-shaped
fixtures are written to a temp dir, so each lifecycle is runnable
end-to-end offline (that is also how tests/test_cli.py drives it).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

from overturelink_data_pipeline_spark import countries as registry
from overturelink_data_pipeline_spark.plans.config import builtin_queries
from overturelink_data_pipeline_spark.plans.models import (
    ClipStrategy,
    Country,
    RunOptions,
)
from overturelink_data_pipeline_spark.sources.dump import ensure_dump
from overturelink_data_pipeline_spark.sources.fallback import OvertureReader

DEFAULT_RELEASE = "2026-05-15.0"


def _resolve_country(identifier: str) -> Country:
    """Registry lookup, with the three synthetic fixture countries
    (AA/BB/CC) resolvable too so offline fixture runs work."""
    from overturelink_data_pipeline_spark.geo import fixtures as FX

    for c in FX.COUNTRIES:
        if identifier.upper() in (c["iso2"], c["iso3"]) or (
            identifier.lower() == c["name"].lower()
        ):
            return Country(
                name=c["name"], iso2=c["iso2"], iso3=c["iso3"],
                region=c["region"], bbox=tuple(c["bbox"]),
            )
    return registry.require_country(identifier)


def _spark(args: argparse.Namespace):
    from overturelink_data_pipeline_spark.session import get_spark

    return get_spark(app_name=f"ol-cli-{args.command}")


def _base_dir(spark, args: argparse.Namespace) -> str:
    if args.base_dir:
        return args.base_dir
    from overturelink_data_pipeline_spark.operators.pipeline import fixture_base_dir

    return fixture_base_dir(spark)


def _normalize_layers(layers, query, country, processed_date=None):
    """The reference's transform stage (cli.py:1084-1115): per-theme
    schema normalization, metadata enrichment, sector-combined layer
    for multilayer queries."""
    from overturelink_data_pipeline_spark.transform import (
        add_metadata,
        add_sector_layers,
        normalize_buildings,
        normalize_places,
        normalize_roads,
    )

    norm_by_theme = {
        "transportation": normalize_roads,
        "buildings": normalize_buildings,
        "places": normalize_places,
    }
    # ONE run timestamp for every layer (review r10): per-call defaults
    # inside add_metadata could stamp places and buildings differently
    # across a second boundary, and add_sector_layers then unions two
    # distinct processed_date values into one combined layer — the
    # reference computes the run timestamp once (transform.py:151-177)
    if processed_date is None:
        from datetime import datetime, timezone

        processed_date = datetime.now(timezone.utc).strftime("%Y-%m-%dT%H:%M:%S")
    out = {}
    for name, df in layers.items():
        theme = "places" if name == "places" else (
            "buildings" if name == "buildings" else query.theme
        )
        norm = norm_by_theme.get(theme)
        if norm is not None and not query.geometry_split:
            df = norm(df)
        out[name] = add_metadata(
            df, country.iso3, country.name, query.name,
            processed_date=processed_date,
        )
    if query.sector_title:
        out = add_sector_layers(out)
    return out


def cmd_export(args: argparse.Namespace) -> int:
    from overturelink_data_pipeline_spark.sinks.geojson import (
        write_geojson,
        write_geojsonseq,
    )
    from overturelink_data_pipeline_spark.sinks.geoparquet import (
        write_filegdb,
        write_geoparquet,
        write_gpkg,
    )
    from overturelink_data_pipeline_spark.transform import export_filename

    spark = _spark(args)
    query = builtin_queries()[args.query]
    country = _resolve_country(args.country)
    reader = OvertureReader(
        spark,
        base_dir=_base_dir(spark, args),
        release=args.release,
        dump_dir=args.dump_root,
        cache_root=args.cache_root,
        backoff_base_s=0.0,
    )
    options = RunOptions(clip=ClipStrategy(args.clip), limit=args.limit)
    layers = reader.read(query, country, options)
    if not args.raw:
        layers = _normalize_layers(layers, query, country)

    out = args.output or export_filename(
        country.iso3, query.name, args.format, raw=args.raw
    )
    single = next(iter(layers.values())) if len(layers) == 1 else None
    if args.format == "geojson":
        n = write_geojson(layers if single is None else single, out)
    elif args.format == "geojsonseq":
        # distributed sink — multilayer flattens with a layer tag
        if single is not None:
            write_geojsonseq(single, out)
        else:
            import functools

            from pyspark.sql import functions as F

            tagged = functools.reduce(
                lambda a, b: a.unionByName(b, allowMissingColumns=True),
                (
                    df.withColumn("layer", F.lit(name))
                    for name, df in layers.items()
                ),
            )
            write_geojsonseq(tagged, out)
        n = None
    elif args.format == "gpkg":
        n = 0
        for i, (name, df) in enumerate(layers.items()):
            n += write_gpkg(df, out, layer=name, mode="w" if i == 0 else "a")
    elif args.format == "fgdb":
        n = 0
        for i, (name, df) in enumerate(layers.items()):
            n += write_filegdb(df, out, layer=name, mode="w" if i == 0 else "a")
    elif args.format == "fgb":
        from overturelink_data_pipeline_spark.sinks.fgb import write_fgb

        n = 0
        if single is not None:
            n = write_fgb(single, out, name=query.name)
        else:
            # one FlatGeobuf per layer (the format is single-layer),
            # sharing the stem like the shapefile dataset convention
            stem = out[:-4] if out.lower().endswith(".fgb") else out
            for name, df in layers.items():
                n += write_fgb(df, f"{stem}_{name}.fgb", name=name)
    elif args.format == "shapefile":
        from overturelink_data_pipeline_spark.sinks.shapefile import write_shapefile

        n = 0
        if single is not None:
            n = write_shapefile(single, out)
        else:
            # no multi-layer concept in the format: one file per layer,
            # sharing the stem (GDAL's directory-of-shapefiles dataset)
            stem = out[:-4] if out.lower().endswith(".shp") else out
            for name, df in layers.items():
                n += write_shapefile(df, f"{stem}_{name}.shp")
    elif args.format == "geoparquet":
        n = 0
        if single is not None:
            n = write_geoparquet(single, out)["feature_count"]
        else:
            # parquet has no layer concept either: one dataset per
            # layer under the output dir (hive-style, scan-globbable)
            for name, df in layers.items():
                n += write_geoparquet(df, os.path.join(out, f"layer={name}"))[
                    "feature_count"
                ]
    else:  # pragma: no cover — argparse choices guard this
        raise ValueError(args.format)
    print(json.dumps({"written": out, "features": n, "layers": sorted(layers)}))
    return 0


def cmd_publish(args: argparse.Namespace) -> int:
    """§3.1 arcgis-upload analog: read → normalize → publish each layer
    through the Sink protocol (seed-then-batch / truncate-append /
    adaptive halving — reference publish.py:646-711). Without a live
    AGOL endpoint the service factory is the in-memory mock; a real
    deployment injects its own factory via the library API
    (sinks.publish.publish_multi_layer)."""
    from overturelink_data_pipeline_spark.sinks.publish import (
        MockFeatureService,
        publish_multi_layer,
    )
    from overturelink_data_pipeline_spark.transform import sanitize_service_name

    spark = _spark(args)
    query = builtin_queries()[args.query]
    country = _resolve_country(args.country)
    reader = OvertureReader(
        spark,
        base_dir=_base_dir(spark, args),
        release=args.release,
        dump_dir=args.dump_root,
        cache_root=args.cache_root,
        backoff_base_s=0.0,
    )
    options = RunOptions(clip=ClipStrategy(args.clip), limit=args.limit)
    layers = _normalize_layers(
        reader.read(query, country, options), query, country
    )
    services: dict[str, MockFeatureService] = {}

    def factory(name: str) -> MockFeatureService:
        services[name] = MockFeatureService()
        return services[name]

    counts = publish_multi_layer(
        layers, factory, mode=args.mode, seed_count=args.seed_count,
        batch_size=args.batch_size,
    )
    print(json.dumps({
        "service": sanitize_service_name(f"{country.iso3}_{query.name}"),
        "mode": args.mode,
        "layers": {
            name: {"uploaded": counts[name], "rows": services[name].count()}
            for name in sorted(counts)
        },
    }))
    return 0


def cmd_cache(args: argparse.Namespace) -> int:
    spark = _spark(args)
    query = builtin_queries()[args.query]
    country = _resolve_country(args.country)
    reader = OvertureReader(
        spark,
        base_dir=_base_dir(spark, args),
        release=args.release,
        cache_root=args.cache_root,
        backoff_base_s=0.0,
    )
    meta = reader.cache_country(query, country)
    from overturelink_data_pipeline_spark.sources.cache import cache_path

    print(json.dumps({
        "cached": cache_path(
            args.cache_root, args.release, country.iso2, query.theme, query.type
        ),
        "rows": meta.feature_count, "country": meta.country,
        "theme": meta.theme, "type": meta.type, "release": meta.release,
    }))
    return 0


def cmd_dump(args: argparse.Namespace) -> int:
    spark = _spark(args)
    side = ensure_dump(
        spark,
        src_base=_base_dir(spark, args),
        dump_base=args.dump_root,
        theme=args.theme,
        release=args.release,
    )
    print(json.dumps(side))
    return 0


def cmd_list_queries(args: argparse.Namespace) -> int:
    """Reference `list-queries` (cli.py:1354): the built-in query
    configs with their theme/type/filter shape."""
    for name, q in sorted(builtin_queries().items()):
        kind = (
            "multilayer" if q.is_multilayer
            else "geometry-split" if q.geometry_split
            else "single"
        )
        filt = q.filter or "-"
        print(f"{name}\t{q.theme}/{q.type}\t{kind}\t{filt}")
    return 0


def cmd_list_cache(args: argparse.Namespace) -> int:
    """Reference `list-cache` (cli.py:2092): per-entry metadata plus
    the stats rollup."""
    from overturelink_data_pipeline_spark.sources.cache import (
        cache_stats,
        list_cache,
    )

    for m in list_cache(args.cache_root):
        print(
            f"{m.release}\t{m.country}\t{m.theme}/{m.type}\t"
            f"{m.feature_count} rows\t{m.cached_at}"
        )
    print(json.dumps(cache_stats(args.cache_root)))
    return 0


def cmd_clear_cache(args: argparse.Namespace) -> int:
    """Reference `clear-cache` (cli.py:2167): whole root or one
    release."""
    from overturelink_data_pipeline_spark.sources.cache import clear_cache

    n = clear_cache(args.cache_root, release=args.release_filter)
    print(json.dumps({"removed": n}))
    return 0


def cmd_version(args: argparse.Namespace) -> int:
    import pyspark

    print(json.dumps({
        "engine": "overturelink_data_pipeline_spark",
        "pyspark": pyspark.__version__,
        "queries": len(builtin_queries()),
    }))
    return 0


def cmd_countries(args: argparse.Namespace) -> int:
    if args.regions:
        for r in registry.list_regions():
            print(r)
        return 0
    for c in registry.list_countries(region=args.region):
        print(f"{c.iso2}\t{c.iso3}\t{c.region}\t{c.name}")
    return 0


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="overturelink_data_pipeline_spark",
        description=__doc__.splitlines()[0],
    )
    sub = p.add_subparsers(dest="command", required=True)

    def common(sp):
        sp.add_argument("--base-dir", default=None,
                        help="hive theme=/type= source root (default: seeded fixtures)")
        sp.add_argument("--release", default=DEFAULT_RELEASE)

    q_names = sorted(builtin_queries())

    exp = sub.add_parser("export", help="§3.2 export lifecycle")
    exp.add_argument("query", choices=q_names)
    exp.add_argument("output", nargs="?", default=None)
    exp.add_argument("--country", required=True)
    exp.add_argument("--format", default="geojson",
                     choices=["geojson", "geojsonseq", "gpkg", "fgdb",
                              "geoparquet", "shapefile", "fgb"])
    exp.add_argument("--clip", default="divisions", choices=["divisions", "bbox"])
    exp.add_argument("--limit", type=int, default=None)
    exp.add_argument("--raw", action="store_true",
                     help="skip normalize/metadata (reference --raw short-circuit)")
    exp.add_argument("--dump-root", default=None)
    exp.add_argument("--cache-root", default=None)
    common(exp)
    exp.set_defaults(fn=cmd_export)

    pub = sub.add_parser("publish", help="§3.1 arcgis-upload lifecycle (mock service)")
    pub.add_argument("query", choices=q_names)
    pub.add_argument("--country", required=True)
    pub.add_argument("--mode", default="initial",
                     choices=["initial", "overwrite", "append"])
    pub.add_argument("--seed-count", type=int, default=100)
    pub.add_argument("--batch-size", type=int, default=2000)
    pub.add_argument("--clip", default="divisions", choices=["divisions", "bbox"])
    pub.add_argument("--limit", type=int, default=None)
    pub.add_argument("--dump-root", default=None)
    pub.add_argument("--cache-root", default=None)
    common(pub)
    pub.set_defaults(fn=cmd_publish)

    cac = sub.add_parser("cache", help="§3.3 --download-only lifecycle")
    cac.add_argument("query", choices=q_names)
    cac.add_argument("--country", required=True)
    cac.add_argument("--cache-root", required=True)
    common(cac)
    cac.set_defaults(fn=cmd_cache)

    dmp = sub.add_parser("dump", help="§3.3 whole-theme mirror")
    dmp.add_argument("theme")
    dmp.add_argument("--dump-root", required=True)
    common(dmp)
    dmp.set_defaults(fn=cmd_dump)

    lsq = sub.add_parser("list-queries", help="built-in query configs")
    lsq.set_defaults(fn=cmd_list_queries)

    lsc = sub.add_parser("list-cache", help="cache entries + stats rollup")
    lsc.add_argument("--cache-root", required=True)
    lsc.set_defaults(fn=cmd_list_cache)

    clc = sub.add_parser("clear-cache", help="remove cache entries")
    clc.add_argument("--cache-root", required=True)
    clc.add_argument("--release-filter", default=None,
                     help="only remove entries of this release")
    clc.set_defaults(fn=cmd_clear_cache)

    ver = sub.add_parser("version", help="engine + runtime versions")
    ver.set_defaults(fn=cmd_version)

    cnt = sub.add_parser("countries", help="registry listing")
    cnt.add_argument("--region", default=None)
    cnt.add_argument("--regions", action="store_true",
                     help="list distinct regions instead of countries")
    cnt.set_defaults(fn=cmd_countries)
    return p


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":  # pragma: no cover
    sys.exit(main())
