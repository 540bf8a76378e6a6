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

from overturelink_data_pipeline_spark.geo import geom as G
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
        # drop EMPTY children (review r10): POINT EMPTY has no valid
        # GeoJSON form inside a collection — RFC 7946 requires a Point
        # position of >= 2 numbers
        return {
            "type": "GeometryCollection",
            "geometries": [
                _geom_to_geojson(ch) for ch in body if not G.is_empty(ch)
            ],
        }
    # Multi*: children are full geom tuples; GeoJSON wants bare coord
    # arrays — empty members dropped for the same RFC reason
    return {
        "type": name,
        "coordinates": [
            _geom_to_geojson(ch)["coordinates"]
            for ch in body
            if not G.is_empty(ch)
        ],
    }


def _wkb_to_geojson_str(b) -> str | None:
    if b is None:
        return None
    geom = W.loads(bytes(b))
    if G.is_empty(geom):
        # EMPTY geometries have no valid GeoJSON encoding (a Point
        # needs a position; review r10: the old [] coordinates were
        # RFC-invalid) — emit a null geometry like the sibling sinks'
        # Null Shape / geometry-less feature treatment
        return None
    return json.dumps(_geom_to_geojson(geom))


@pandas_udf(T.StringType())
def st_as_geojson(s: pd.Series) -> pd.Series:
    """WKB → GeoJSON geometry string, None for NULL/EMPTY (Arrow-batched;
    the one Python hop in the feature-line builder)."""
    return s.map(_wkb_to_geojson_str)


def feature_line(df: DataFrame, layer: str | None = None) -> Column:
    """One GeoJSON Feature per row as a string column: properties via
    JVM-side ``to_json`` over all non-geometry columns, geometry JSON
    spliced in raw."""
    prop_cols = [c for c in df.columns if c != _GEOM_COL]
    props = F.to_json(F.struct(*[F.col(c) for c in prop_cols]))
    if layer is not None:
        if "layer" in prop_cols:
            # injecting would emit the key twice and JSON parsers keep
            # the LAST one — the tag would silently shadow user data
            # (review r10); explicit beats silent
            raise ValueError(
                "frame already has a 'layer' column — rename it before "
                "a multi-layer flatten injects the layer tag"
            )
        # inject the layer tag into properties (reference export.py:277-280)
        # via json.dumps so quotes/backslashes in the layer NAME cannot
        # corrupt the document (review r10); to_json omits null fields,
        # so an all-null row yields '{}' and the naive splice would emit
        # a trailing comma — branch on that case
        tag = json.dumps({"layer": layer}, separators=(",", ":"))
        props = F.when(props == F.lit("{}"), F.lit(tag)).otherwise(
            F.concat(
                F.lit(tag[:-1] + ","),
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
    with open(path, "w", encoding="utf-8") as f:
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
        got = _count_features_streaming(path)
        if got != expected_features:
            raise ValueError(
                f"{path}: wrote {expected_features} features, file has {got}"
            )
        return
    with open(path, encoding="utf-8") as f:
        doc = json.load(f)
    if doc.get("type") != "FeatureCollection":
        raise ValueError(f"{path}: not a FeatureCollection")
    got = len(doc.get("features", []))
    if got != expected_features:
        raise ValueError(f"{path}: wrote {expected_features} features, file has {got}")


class _ChunkReader:
    """Buffered forward scanner over a text file for the streaming
    validator: O(largest single feature) memory, never the whole file."""

    CHUNK = 1 << 20

    def __init__(self, f) -> None:
        self._f = f
        self._buf = ""
        self._pos = 0

    def _fill(self) -> bool:
        chunk = self._f.read(self.CHUNK)
        self._buf = self._buf[self._pos :] + chunk
        self._pos = 0
        return bool(chunk)

    def _ensure(self, n: int) -> None:
        while len(self._buf) - self._pos < n:
            if not self._fill():
                return

    def expect(self, literal: str, what: str) -> None:
        self._ensure(len(literal))
        if not self._buf.startswith(literal, self._pos):
            got = self._buf[self._pos : self._pos + len(literal) + 16]
            raise ValueError(f"malformed GeoJSON: expected {what}, got {got!r}")
        self._pos += len(literal)

    def peek(self, n: int = 1) -> str:
        self._ensure(n)
        return self._buf[self._pos : self._pos + n]

    def skip(self, n: int = 1) -> None:
        self._pos += n

    def decode_value(self, decoder: json.JSONDecoder):
        """raw_decode one JSON value, growing the buffer until it
        parses whole (features are bounded — one geometry each)."""
        while True:
            try:
                val, end = decoder.raw_decode(self._buf, self._pos)
            except ValueError:
                if not self._fill():
                    raise ValueError(
                        "malformed GeoJSON: truncated value at offset "
                        f"{self._pos}"
                    ) from None
                continue
            # a bare number at the buffer edge could continue into the
            # next chunk; our values are objects, but guard anyway
            if end == len(self._buf) and self._fill():
                continue
            self._pos = end
            return val

    def at_eof(self) -> bool:
        self._ensure(1)
        return self._pos >= len(self._buf)


def _count_features_streaming(path: str) -> int:
    """Streaming well-formedness check + exact top-level feature count.

    Parses the document incrementally against the exact layout
    ``write_geojson`` produces (root keys in order: type, optional
    metadata, features), fully JSON-decoding the metadata value and
    every element of the top-level ``features`` array — so a property
    struct that *serializes* to ``{"type":"Feature"...`` nested inside
    a feature can never be over-counted, and truncation/corruption
    anywhere in the file raises instead of passing a substring tally.
    """
    decoder = json.JSONDecoder()
    with open(path, encoding="utf-8") as f:
        r = _ChunkReader(f)
        r.expect('{"type":"FeatureCollection",', "FeatureCollection header")
        if r.peek(len('"metadata":')) == '"metadata":':
            r.skip(len('"metadata":'))
            r.decode_value(decoder)
            r.expect(",", "comma after metadata")
        r.expect('"features":[', "features array")
        count = 0
        if r.peek() == "]":
            r.skip()
        else:
            while True:
                feature = r.decode_value(decoder)
                if not isinstance(feature, dict) or feature.get("type") != "Feature":
                    raise ValueError(
                        f"malformed GeoJSON: element {count} is not a Feature"
                    )
                count += 1
                sep = r.peek()
                r.skip()
                if sep == "]":
                    break
                if sep != ",":
                    raise ValueError(
                        f"malformed GeoJSON: expected ',' or ']' after "
                        f"feature {count - 1}, got {sep!r}"
                    )
        r.expect("}", "closing brace")
        # drain to EOF: anything non-whitespace after the document —
        # even past a newline — is corruption/concatenation
        while not r.at_eof():
            rest = r.peek(_ChunkReader.CHUNK)
            if rest.strip():
                raise ValueError(
                    "malformed GeoJSON: trailing content after document"
                )
            r.skip(len(rest))
        return count
