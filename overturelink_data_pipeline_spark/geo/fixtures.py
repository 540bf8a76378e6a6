"""Deterministic Overture-shaped synthetic fixtures (FIXTURES.md A1-A7).

The driver's test tables (TESTDATA.md) are relational-only; geometry
operators are exercised against these seeded in-memory fixtures —
same defect classes as FIXTURES.md: degenerate lines, Z coordinates,
wrong-family rows, bowtie polygons, single-part multipolygons,
concave country shapes (so bbox-pass/intersect-fail rows exist and
the precise clip provably differs from the bbox clip — the precision
difference the reference exists to provide, README.md:217).

Everything is seeded (`random.Random(FIXTURE_SEED)`) so rows-only
registry checks hash identically across runs.
"""

from __future__ import annotations

import json
import math
import random
import struct
from decimal import ROUND_HALF_UP, Decimal
from pathlib import Path

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from overturelink_data_pipeline_spark.geo import geom as G
from overturelink_data_pipeline_spark.geo import wkb as W

FIXTURE_SEED = 42

#: Committed golden-fixture parquet (scripts/gen_geo_fixtures.py).
#: Raw Overture-shaped columns + ``_g_*`` golden columns frozen at
#: generation time by the SAME row-level Python the UDFs run
#: (clean_geometry_bytes / centroid_utm_lonlat / geom.*), so the
#: DuckDB oracle can SELECT goldens while Spark recomputes through
#: the distributed UDF path — any behavioral drift in the geometry
#: engine breaks the hash match.
GOLDEN_DIR = Path(__file__).resolve().parents[2] / "fixtures"

#: Three overlapping synthetic countries (FIXTURES.md A7 convention).
COUNTRIES = [
    {"name": "Aland", "iso2": "AA", "iso3": "AAA", "region": "West", "bbox": [0.0, 0.0, 10.0, 10.0]},
    {"name": "Borland", "iso2": "BB", "iso3": "BBB", "region": "West", "bbox": [8.0, 0.0, 18.0, 10.0]},
    {"name": "Cytheria", "iso2": "CC", "iso3": "CCC", "region": "North", "bbox": [0.0, 8.0, 10.0, 18.0]},
]


def _wkb_point_z(x: float, y: float, z: float) -> bytes:
    """ISO WKB Point Z — exercises the codec's 3D parse path."""
    return b"\x01" + struct.pack("<I", 1001) + struct.pack("<3d", x, y, z)


def _wkb_linestring_z(coords: list[tuple[float, float, float]]) -> bytes:
    out = bytearray(b"\x01" + struct.pack("<I", 1002) + struct.pack("<I", len(coords)))
    for x, y, z in coords:
        out += struct.pack("<3d", x, y, z)
    return bytes(out)


def _bbox_struct(wkb_bytes: bytes) -> dict:
    xmin, xmax, ymin, ymax = G.bbox(W.loads(wkb_bytes))
    return {
        "xmin": float(xmin),
        "xmax": float(xmax),
        "ymin": float(ymin),
        "ymax": float(ymax),
    }


_BBOX_T = T.StructType(
    [
        T.StructField("xmin", T.FloatType()),
        T.StructField("xmax", T.FloatType()),
        T.StructField("ymin", T.FloatType()),
        T.StructField("ymax", T.FloatType()),
    ]
)
_NAMES_T = T.StructType(
    [
        T.StructField("primary", T.StringType()),
        T.StructField("common", T.MapType(T.StringType(), T.StringType())),
    ]
)


def _rand_point_in(rng: random.Random, bbox: list[float]) -> tuple[float, float]:
    return (
        rng.uniform(bbox[0], bbox[2]),
        rng.uniform(bbox[1], bbox[3]),
    )


def make_segments(n: int = 400) -> tuple[list, T.StructType]:
    """A1 — transportation_segment: LineStrings with seeded defects."""
    rng = random.Random(FIXTURE_SEED)
    classes = ["motorway", "trunk", "primary", "secondary", "tertiary", "residential", "service", "footway"]
    subtypes = ["road", "rail", "water"]
    rows = []
    for i in range(n):
        country = COUNTRIES[i % len(COUNTRIES)]
        x0, y0 = _rand_point_in(rng, country["bbox"])
        roll = rng.random()
        if roll < 0.01:  # degenerate: length < 1e-10
            geom = W.linestring([(x0, y0), (x0 + 1e-12, y0)])
        elif roll < 0.02:  # Z coords → Force2D path
            geom = _wkb_linestring_z(
                [(x0 + k * 0.01, y0 + rng.uniform(-0.01, 0.01), rng.uniform(0, 100)) for k in range(3)]
            )
        elif roll < 0.04:  # wrong family: Point
            geom = W.point(x0, y0)
        else:
            pts = [(x0, y0)]
            for _ in range(rng.randint(1, 19)):
                px, py = pts[-1]
                pts.append((px + rng.uniform(-0.05, 0.05), py + rng.uniform(-0.05, 0.05)))
            geom = W.linestring(pts)
        name = None if rng.random() < 0.02 else f"Street {i}"
        if name is not None and rng.random() < 0.02:
            name = name + " x" * 150  # >255 chars → clip path
        rows.append(
            (
                f"seg{i:05d}",
                {"primary": name, "common": {"en": f"Street {i} EN"}} if rng.random() > 0.02 else None,
                rng.choice(classes),
                rng.choice(subtypes),
                rng.randint(0, 5),
                _bbox_struct(geom),
                geom,
            )
        )
    schema = T.StructType(
        [
            T.StructField("id", T.StringType()),
            T.StructField("names", _NAMES_T),
            T.StructField("class", T.StringType()),
            T.StructField("subtype", T.StringType()),
            T.StructField("version", T.IntegerType()),
            T.StructField("bbox", _BBOX_T),
            T.StructField("geometry", T.BinaryType()),
        ]
    )
    return rows, schema


def make_buildings(n: int = 400) -> tuple[list, T.StructType]:
    """A2 — buildings_building: polygons with bowties, single-part
    multipolygons, degenerate slivers; height as messy strings."""
    rng = random.Random(FIXTURE_SEED + 1)
    classes = ["residential", "commercial", "industrial", "service", "medical", "education"]
    subtypes = ["residential", "commercial", "education", "medical", "service"]
    rows = []
    for i in range(n):
        country = COUNTRIES[i % len(COUNTRIES)]
        cx, cy = _rand_point_in(rng, country["bbox"])
        w, h = rng.uniform(0.001, 0.01), rng.uniform(0.001, 0.01)
        roll = rng.random()
        square = [
            (cx, cy), (cx + w, cy), (cx + w, cy + h), (cx, cy + h), (cx, cy),
        ]
        if roll < 0.05:  # bowtie (self-intersecting)
            geom = W.polygon([[(cx, cy), (cx + w, cy + h), (cx + w, cy), (cx, cy + h), (cx, cy)]])
        elif roll < 0.10:  # single-part MultiPolygon → unwrap path
            geom = W.dumps(("MultiPolygon", [("Polygon", [square])]))
        elif roll < 0.11:  # degenerate sliver, area < 1e-12
            geom = W.polygon([[(cx, cy), (cx + 1e-13, cy), (cx + 1e-13, cy + 1e-13), (cx, cy)]])
        else:
            geom = W.polygon([square])
        hroll = rng.random()
        if hroll < 0.3:
            height = None
        elif hroll < 0.35:
            height = "unknown"  # junk → try_cast null
        else:
            height = f"{rng.uniform(2, 300):.1f}"
        rows.append(
            (
                f"bld{i:05d}",
                {"primary": f"Building {i}", "common": None} if rng.random() < 0.1 else None,
                height,
                rng.randint(1, 100) if rng.random() > 0.4 else None,
                rng.choice(classes),
                rng.choice(subtypes),
                rng.randint(0, 5),
                _bbox_struct(geom),
                geom,
            )
        )
    schema = T.StructType(
        [
            T.StructField("id", T.StringType()),
            T.StructField("names", _NAMES_T),
            T.StructField("height", T.StringType()),
            T.StructField("num_floors", T.IntegerType()),
            T.StructField("class", T.StringType()),
            T.StructField("subtype", T.StringType()),
            T.StructField("version", T.IntegerType()),
            T.StructField("bbox", _BBOX_T),
            T.StructField("geometry", T.BinaryType()),
        ]
    )
    return rows, schema


def make_places(n: int = 400, as_json_strings: bool = False) -> tuple[list, T.StructType]:
    """A3 — places_place (A6 variant: nested cols serialized as JSON
    strings and `confidence` dropped, exercising X5 + schema drift)."""
    rng = random.Random(FIXTURE_SEED + 2)
    cats = ["education", "health_and_medical", "retail", "shopping", "food_and_drink", "restaurant", "other"]
    rows = []
    for i in range(n):
        country = COUNTRIES[i % len(COUNTRIES)]
        x, y = _rand_point_in(rng, country["bbox"])
        geom = _wkb_point_z(x, y, 0.0) if rng.random() < 0.01 else W.point(x, y)
        names = None if rng.random() < 0.02 else {
            "primary": None if rng.random() < 0.02 else f"Place {i}",
            "common": {"en": f"Place {i} EN"},
        }
        categories = {
            "primary": rng.choice(cats),
            "alternate": [rng.choice(cats) for _ in range(rng.randint(0, 2))],
        }
        addresses = [
            {
                "freeform": f"{i} Main St",
                "locality": f"Town {i % 17}",
                "region": None,
                "postcode": f"{10000 + i}",
                "country": country["iso2"],
            }
        ][: rng.randint(0, 2)] or None
        websites = [f"https://example{i}.test"][: rng.randint(0, 1)] or None
        emails = [f"info{i}@example.test"][: rng.randint(0, 1)] or None
        phones = [f"+1-555-{i:04d}"][: rng.randint(0, 1)] or None
        row = [
            f"plc{i:05d}",
            names,
            categories,
            round(rng.random(), 3),
            addresses,
            websites,
            emails,
            phones,
            rng.randint(0, 5),
            _bbox_struct(geom),
            geom,
        ]
        if as_json_strings:
            row[1] = json.dumps(names) if names is not None else None
            row[2] = json.dumps(categories)
            row[4] = json.dumps(addresses) if addresses is not None else None
            row.pop(3)  # drop confidence → expected-columns drift (A6)
        rows.append(tuple(row))

    if as_json_strings:
        schema = T.StructType(
            [
                T.StructField("id", T.StringType()),
                T.StructField("names", T.StringType()),
                T.StructField("categories", T.StringType()),
                T.StructField("addresses", T.StringType()),
                T.StructField("websites", T.ArrayType(T.StringType())),
                T.StructField("emails", T.ArrayType(T.StringType())),
                T.StructField("phones", T.ArrayType(T.StringType())),
                T.StructField("version", T.IntegerType()),
                T.StructField("bbox", _BBOX_T),
                T.StructField("geometry", T.BinaryType()),
            ]
        )
    else:
        schema = T.StructType(
            [
                T.StructField("id", T.StringType()),
                T.StructField("names", _NAMES_T),
                T.StructField(
                    "categories",
                    T.StructType(
                        [
                            T.StructField("primary", T.StringType()),
                            T.StructField("alternate", T.ArrayType(T.StringType())),
                        ]
                    ),
                ),
                T.StructField("confidence", T.DoubleType()),
                T.StructField(
                    "addresses",
                    T.ArrayType(
                        T.StructType(
                            [
                                T.StructField("freeform", T.StringType()),
                                T.StructField("locality", T.StringType()),
                                T.StructField("region", T.StringType()),
                                T.StructField("postcode", T.StringType()),
                                T.StructField("country", T.StringType()),
                            ]
                        )
                    ),
                ),
                T.StructField("websites", T.ArrayType(T.StringType())),
                T.StructField("emails", T.ArrayType(T.StringType())),
                T.StructField("phones", T.ArrayType(T.StringType())),
                T.StructField("version", T.IntegerType()),
                T.StructField("bbox", _BBOX_T),
                T.StructField("geometry", T.BinaryType()),
            ]
        )
    return rows, schema


def make_infrastructure(n: int = 400) -> tuple[list, T.StructType]:
    """A4 — base_infrastructure: mixed geometry families for the split op."""
    rng = random.Random(FIXTURE_SEED + 3)
    subtypes = ["power", "communication", "water", "waste"]
    classes = ["tower", "line", "plant", "substation", "cable"]
    rows = []
    for i in range(n):
        country = COUNTRIES[i % len(COUNTRIES)]
        x, y = _rand_point_in(rng, country["bbox"])
        roll = rng.random()
        if roll < 0.40:
            geom = W.point(x, y)
        elif roll < 0.80:
            geom = W.linestring(
                [(x + k * 0.01, y + rng.uniform(-0.01, 0.01)) for k in range(rng.randint(2, 6))]
            )
        elif roll < 0.95:
            geom = W.polygon([[(x, y), (x + 0.01, y), (x + 0.01, y + 0.01), (x, y + 0.01), (x, y)]])
        else:  # GeometryCollection → `_other` bucket (reference source.py:996-1001)
            geom = W.dumps(
                ("GeometryCollection", [("Point", (x, y)), ("LineString", [(x, y), (x + 0.01, y)])])
            )
        rows.append(
            (
                f"inf{i:05d}",
                {"primary": f"Infra {i}", "common": None},
                rng.choice(subtypes),
                rng.choice(classes),
                round(rng.uniform(5, 120), 1) if rng.random() > 0.3 else None,
                rng.randint(0, 5),
                _bbox_struct(geom),
                geom,
            )
        )
    schema = T.StructType(
        [
            T.StructField("id", T.StringType()),
            T.StructField("names", _NAMES_T),
            T.StructField("subtype", T.StringType()),
            T.StructField("class", T.StringType()),
            T.StructField("height", T.DoubleType()),
            T.StructField("version", T.IntegerType()),
            T.StructField("bbox", _BBOX_T),
            T.StructField("geometry", T.BinaryType()),
        ]
    )
    return rows, schema


def _country_polygon(bbox: list[float], concave: bool) -> bytes:
    """Country shape: a concave C-shape (so some rows pass the bbox test
    but fail the precise intersect — FIXTURES.md A5 requirement) or a
    slightly-inset convex box."""
    x0, y0, x1, y1 = bbox
    w, h = x1 - x0, y1 - y0
    if not concave:
        m = 0.02
        return W.polygon(
            [[(x0 + m, y0 + m), (x1 - m, y0 + m), (x1 - m, y1 - m), (x0 + m, y1 - m), (x0 + m, y0 + m)]]
        )
    # C-shape: full box minus a deep right-side notch
    return W.polygon(
        [
            [
                (x0, y0),
                (x1, y0),
                (x1, y0 + 0.25 * h),
                (x0 + 0.3 * w, y0 + 0.25 * h),
                (x0 + 0.3 * w, y0 + 0.75 * h),
                (x1, y0 + 0.75 * h),
                (x1, y1),
                (x0, y1),
                (x0, y0),
            ]
        ]
    )


def make_divisions() -> tuple[list, T.StructType]:
    """A5 — divisions_division_area: one country polygon per fixture
    country (first one concave) + non-country rows to be filtered out."""
    rows = []
    for i, c in enumerate(COUNTRIES):
        geom = _country_polygon(c["bbox"], concave=(i == 0))
        rows.append(
            (
                f"div{i:03d}",
                "country",
                c["iso2"],
                {"primary": c["name"]},
                _bbox_struct(geom),
                geom,
            )
        )
        # distractor: a 'region' row with the same country code
        sub = _country_polygon(
            [c["bbox"][0], c["bbox"][1], c["bbox"][0] + 2, c["bbox"][1] + 2], concave=False
        )
        rows.append(
            (f"div{i:03d}r", "region", c["iso2"], {"primary": f"{c['name']} Region"}, _bbox_struct(sub), sub)
        )
    schema = T.StructType(
        [
            T.StructField("id", T.StringType()),
            T.StructField("subtype", T.StringType()),
            T.StructField("country", T.StringType()),
            T.StructField("names", T.StructType([T.StructField("primary", T.StringType())])),
            T.StructField("bbox", _BBOX_T),
            T.StructField("geometry", T.BinaryType()),
        ]
    )
    return rows, schema


_MAKERS = {
    "transportation_segment": make_segments,
    "buildings_building": make_buildings,
    "places_place": make_places,
    "base_infrastructure": make_infrastructure,
    "divisions_division_area": make_divisions,
}


def fixture_df(spark: SparkSession, name: str, **kwargs) -> DataFrame:
    rows, schema = _MAKERS[name](**kwargs)
    return spark.createDataFrame(rows, schema)


# -- golden columns ----------------------------------------------------------

def _round_hu(x: float | None, nd: int) -> float | None:
    """Spark ``F.round`` semantics: HALF_UP over the double's shortest
    decimal repr (BigDecimal.valueOf) — NOT Python's banker's round."""
    if x is None:
        return None
    q = Decimal(repr(float(x))).quantize(
        Decimal(1).scaleb(-nd), rounding=ROUND_HALF_UP
    )
    return float(q)


def _f32(x: float) -> float:
    """The double Spark sees after reading a FloatType parquet value."""
    return float(np.float32(x))


def _morton(cx: int, cy: int, bits: int = 16) -> int:
    code = 0
    for i in range(bits):
        code += ((cx >> i) & 1) << (2 * i)
        code += ((cy >> i) & 1) << (2 * i + 1)
    return code


def _grid_ids(lon: float, lat: float, res: float = 1.0) -> tuple[int, int]:
    """Replicates geo/grid.py cell_coords/grid_cell/morton_cell on
    driver-side doubles."""
    nx, ny = int(360 / res), int(180 / res)
    cx = min(math.floor((lon + 180.0) / res), nx - 1)
    cy = min(math.floor((lat + 90.0) / res), ny - 1)
    return cy * nx + cx, _morton(cx, cy)


_GOLDEN_FIELDS = {
    "transportation_segment": [
        ("_g_keep", T.IntegerType()),
        ("_g_len6", T.DoubleType()),
        ("_g_env_xmin5", T.DoubleType()),
        ("_g_env_ymax5", T.DoubleType()),
        ("_g_bbox_ok", T.IntegerType()),
        ("_g_cell", T.LongType()),
        ("_g_zcell", T.LongType()),
        ("_g_in_aa", T.IntegerType()),
    ],
    "buildings_building": [
        ("_g_keep", T.IntegerType()),
        ("_g_area9", T.DoubleType()),
        ("_g_valid", T.IntegerType()),
        ("_g_clon6", T.DoubleType()),
        ("_g_clat6", T.DoubleType()),
        ("_g_in_aa", T.IntegerType()),
    ],
    "places_place": [
        ("_g_keep", T.IntegerType()),
        ("_g_in_aa", T.IntegerType()),
    ],
    "places_place_json": [("_g_keep", T.IntegerType())],
    "base_infrastructure": [("_g_family", T.StringType())],
    "divisions_division_area": [],
}


_AA_POLYGONS: list | None = None


def _aa_polygons() -> list:
    """Decoded rings of the concave Aland country polygon — the build
    side of the J1 clip golden."""
    global _AA_POLYGONS
    if _AA_POLYGONS is None:
        _AA_POLYGONS = G._polygons(
            W.loads(_country_polygon(COUNTRIES[0]["bbox"], concave=True))
        )
    return _AA_POLYGONS


def _in_aa(bbox: dict, b: bytes) -> int:
    """J1 divisions-clip decision vs the concave Aland polygon: the
    buffered f32 bbox prefilter (F2) AND the precise intersect (F3) —
    exactly clip_divisions' row predicate."""
    x0, y0, x1, y1 = COUNTRIES[0]["bbox"]
    buf = 0.1
    pre = (
        _f32(bbox["xmin"]) > x0 - buf
        and _f32(bbox["xmax"]) < x1 + buf
        and _f32(bbox["ymin"]) > y0 - buf
        and _f32(bbox["ymax"]) < y1 + buf
    )
    return int(
        pre and any(G.intersects_polygon(W.loads(b), r) for r in _aa_polygons())
    )


def _segment_goldens(row: tuple) -> tuple:
    from overturelink_data_pipeline_spark.geo.functions import clean_geometry_bytes

    bbox, b = row[5], row[6]
    cleaned = clean_geometry_bytes(b, "lines")
    keep = int(cleaned is not None)
    len6 = _round_hu(G.length(W.loads(cleaned)), 6) if cleaned else None
    env = G.bbox(W.loads(b))
    # same promotion as the Spark expression: env doubles minus the
    # float32 value the parquet scan yields
    bbox_ok = int(
        abs(env[0] - _f32(bbox["xmin"])) < 1e-4
        and abs(env[3] - _f32(bbox["ymax"])) < 1e-4
    )
    lon = (_f32(bbox["xmin"]) + _f32(bbox["xmax"])) / 2.0
    lat = (_f32(bbox["ymin"]) + _f32(bbox["ymax"])) / 2.0
    cell, zcell = _grid_ids(lon, lat)
    return (
        keep,
        len6,
        _round_hu(env[0], 5),
        _round_hu(env[3], 5),
        bbox_ok,
        cell,
        zcell,
        _in_aa(bbox, b),
    )


def _building_goldens(row: tuple) -> tuple:
    from overturelink_data_pipeline_spark.geo.functions import (
        centroid_utm_lonlat,
        clean_geometry_bytes,
    )

    bbox, b = row[7], row[8]
    in_aa = _in_aa(bbox, b)
    cleaned = clean_geometry_bytes(b, "polygons", make_valid=True, unwrap=True)
    if cleaned is None:
        return (0, None, None, None, None, in_aa)
    g = W.loads(cleaned)
    c = centroid_utm_lonlat(cleaned)
    return (
        1,
        _round_hu(G.area(g), 9),
        int(G.is_valid(g)),
        _round_hu(c[0], 6) if c else None,
        _round_hu(c[1], 6) if c else None,
        in_aa,
    )


def _place_goldens(row: tuple) -> tuple:
    from overturelink_data_pipeline_spark.geo.functions import clean_geometry_bytes

    keep = int(clean_geometry_bytes(row[-1], "points") is not None)
    return (keep, _in_aa(row[-2], row[-1]))


def _place_json_goldens(row: tuple) -> tuple:
    from overturelink_data_pipeline_spark.geo.functions import clean_geometry_bytes

    return (int(clean_geometry_bytes(row[-1], "points") is not None),)


def _infra_goldens(row: tuple) -> tuple:
    t = W.geometry_type(row[-1])
    if t in ("Point", "MultiPoint"):
        fam = "points"
    elif t in ("LineString", "MultiLineString"):
        fam = "lines"
    elif t in ("Polygon", "MultiPolygon"):
        fam = "polygons"
    else:
        fam = "other"
    return (fam,)


_GOLDEN_FNS = {
    "transportation_segment": _segment_goldens,
    "buildings_building": _building_goldens,
    "places_place": _place_goldens,
    "places_place_json": _place_json_goldens,
    "base_infrastructure": _infra_goldens,
    "divisions_division_area": lambda row: (),
}


def golden_rows(name: str) -> tuple[list, T.StructType]:
    """Fixture rows + frozen ``_g_*`` golden columns (gen-time truth)."""
    maker = name if name != "places_place_json" else "places_place"
    kwargs = {"as_json_strings": True} if name == "places_place_json" else {}
    rows, schema = _MAKERS[maker](**kwargs)
    fn = _GOLDEN_FNS[name]
    out_rows = [r + fn(r) for r in rows]
    out_schema = T.StructType(
        list(schema.fields)
        + [T.StructField(n, t) for n, t in _GOLDEN_FIELDS[name]]
    )
    return out_rows, out_schema


def fixture_path(name: str) -> str:
    return str(GOLDEN_DIR / name)


def fixture_glob(name: str) -> str:
    """DuckDB ``read_parquet`` pattern for a committed fixture table."""
    return f"{fixture_path(name)}/*.parquet"


def fixture_scan(spark: SparkSession, name: str) -> DataFrame:
    """Scan the committed golden parquet — the geometry queries' input,
    so the Spark side exercises the real parquet scan path (pushdown,
    f32 bbox promotion) instead of an in-memory localRelation."""
    return spark.read.parquet(fixture_path(name))


def write_golden_fixtures(spark: SparkSession, base_dir: str | None = None) -> None:
    """Materialize all fixtures + goldens (scripts/gen_geo_fixtures.py;
    single file per table — 400-row tables, committed to git)."""
    base = Path(base_dir) if base_dir else GOLDEN_DIR
    for name in _GOLDEN_FNS:
        rows, schema = golden_rows(name)
        dest = base / name
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "overwrite"
        ).parquet(str(dest))
        for extra in dest.iterdir():
            if extra.name.startswith(("_SUCCESS", ".")):
                extra.unlink()


def write_fixtures(spark: SparkSession, base_dir: str) -> None:
    """Materialize all fixtures as parquet in the Overture hive layout
    (theme=/type= path convention, reference source.py:383-395)."""
    layout = {
        "transportation_segment": "theme=transportation/type=segment",
        "buildings_building": "theme=buildings/type=building",
        "places_place": "theme=places/type=place",
        "base_infrastructure": "theme=base/type=infrastructure",
        "divisions_division_area": "theme=divisions/type=division_area",
    }
    for name, rel in layout.items():
        # a few files per fixture table: repartition collapses the
        # 32-way parallelized python rows into 4 real tasks (measured
        # 4× faster than either the 32-task default or coalesce(1),
        # and keeps downstream fixture scans parallel)
        fixture_df(spark, name).repartition(4).write.mode("overwrite").parquet(
            f"{base_dir}/{rel}"
        )
