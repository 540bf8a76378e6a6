"""GeoJSON sinks (reference export.py:255-325, 439-465).

Two writers with different scale envelopes:

- **GeoJSONSeq** (RFC 8142-style, one Feature per line): fully
  distributed — each row becomes one JSON line built inside the plan
  (properties via ``to_json`` JVM-side, geometry via one Arrow UDF),
  written with ``df.write.text``. This is the 100 TB path; the
  reference itself exposes GeoJSONSeq for "streaming-friendly" export
  (reference source.py:652-657).
- **Single-file FeatureCollection**: the reference's default export —
  inherently single-writer, so it streams ``toLocalIterator`` on the
  driver with bounded memory (one partition in flight), injecting the
  ``layer`` property when flattening multi-layer dicts (U2, reference
  export.py:266-297) and an optional metadata block. Documented bound:
  country-sized outputs (SURVEY.md §7.3).

Post-write validation (reference export.py:439-465): parse the file
back and check feature count.
"""

from __future__ import annotations

import json
import os

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from overturelink_data_pipeline_spark.geo import wkb as W

_GEOM_COL = "geometry"


def _geom_to_geojson(geom: W.Geom) -> dict:
    name, body = geom
    if name == "Point":
        return {"type": "Point", "coordinates": list(body) if body else []}
    if name == "LineString":
        return {"type": "LineString", "coordinates": [list(c) for c in body]}
    if name == "Polygon":
        return {"type": "Polygon", "coordinates": [[list(c) for c in ring] for ring in body]}
    if name == "GeometryCollection":
        return {
            "type": "GeometryCollection",
            "geometries": [_geom_to_geojson(ch) for ch in body],
        }
    # Multi*: children are full geom tuples; GeoJSON wants bare coord arrays
    return {
        "type": name,
        "coordinates": [_geom_to_geojson(ch)["coordinates"] for ch in body],
    }


@pandas_udf(T.StringType())
def st_as_geojson(s: pd.Series) -> pd.Series:
    """WKB → GeoJSON geometry string (Arrow-batched; the one Python hop
    in the feature-line builder)."""
    return s.map(
        lambda b: None if b is None else json.dumps(_geom_to_geojson(W.loads(bytes(b))))
    )


def feature_line(df: DataFrame, layer: str | None = None) -> Column:
    """One GeoJSON Feature per row as a string column: properties via
    JVM-side ``to_json`` over all non-geometry columns, geometry JSON
    spliced in raw."""
    prop_cols = [c for c in df.columns if c != _GEOM_COL]
    props = F.to_json(F.struct(*[F.col(c) for c in prop_cols]))
    if layer is not None:
        # inject the layer tag into properties (reference export.py:277-280);
        # to_json omits null fields, so an all-null row yields '{}' and the
        # naive splice would emit a trailing comma — branch on that case
        props = F.when(
            props == F.lit("{}"), F.lit('{"layer":"' + layer + '"}')
        ).otherwise(
            F.concat(
                F.lit('{"layer":"' + layer + '",'),
                F.substring(props, 2, 2_000_000_000),
            )
        )
    geom_json = F.coalesce(st_as_geojson(F.col(_GEOM_COL)), F.lit("null"))
    return F.concat(
        F.lit('{"type":"Feature","geometry":'),
        geom_json,
        F.lit(',"properties":'),
        props,
        F.lit("}"),
    )


def write_geojsonseq(df: DataFrame, path: str, layer: str | None = None) -> None:
    """Distributed newline-delimited features (S11 GeoJSONSeq driver)."""
    df.select(feature_line(df, layer).alias("value")).write.mode("overwrite").text(path)


def write_geojson(
    layers: dict[str, DataFrame] | DataFrame,
    path: str,
    metadata: dict | None = None,
    stream: bool = False,
) -> int:
    """Single-file FeatureCollection (S8). Multi-layer dicts flatten
    with an injected ``layer`` property. Returns the feature count.

    Driver-bound by design (single file). Country-sized outputs (the
    reference's envelope) default to ``collect()``; ``stream=True``
    switches to ``toLocalIterator`` (one partition in flight) when the
    frame exceeds driver memory.
    """
    if isinstance(layers, DataFrame):
        layers = {"": layers}
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    n = 0
    with open(path, "w") as f:
        f.write('{"type":"FeatureCollection",')
        if metadata is not None:
            f.write('"metadata":' + json.dumps(metadata) + ",")
        f.write('"features":[')
        first = True
        for name, df in layers.items():
            lines = df.select(
                feature_line(df, name if len(layers) > 1 else None).alias("v")
            )
            rows = lines.toLocalIterator() if stream else lines.collect()
            for row in rows:
                if not first:
                    f.write(",")
                f.write(row["v"])
                first = False
                n += 1
        f.write("]}")
    validate_geojson(path, n, stream=stream)
    return n


def validate_geojson(
    path: str, expected_features: int, stream: bool = False
) -> None:
    """Post-write check (reference export.py:439-465): parseable and
    feature count matches. ``stream=True`` validates with a chunked
    scan instead of ``json.load`` — materializing the whole document
    as Python objects would OOM the driver on exactly the inputs
    ``write_geojson(stream=True)`` exists for."""
    if stream:
        # chunked structural check: header token + feature count by
        # counting top-level '{"type":"Feature"' openings (every
        # feature_line starts with this exact prefix; chunk overlap
        # keeps boundary-straddling matches)
        needle = '{"type":"Feature"'
        got = 0
        tail = ""
        with open(path) as f:
            head = f.read(64)
            if not head.startswith('{"type":"FeatureCollection"'):
                raise ValueError(f"{path}: not a FeatureCollection")
            buf = head
            while buf:
                got += buf.count(needle)
                tail = buf[-(len(needle) - 1):]
                buf = tail + f.read(1 << 20)
                if buf == tail:
                    break
        if got != expected_features:
            raise ValueError(
                f"{path}: wrote {expected_features} features, file has {got}"
            )
        return
    with open(path) as f:
        doc = json.load(f)
    if doc.get("type") != "FeatureCollection":
        raise ValueError(f"{path}: not a FeatureCollection")
    got = len(doc.get("features", []))
    if got != expected_features:
        raise ValueError(f"{path}: wrote {expected_features} features, file has {got}")
