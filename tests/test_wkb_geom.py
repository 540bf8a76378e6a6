"""Property + unit tests for the dependency-free WKB codec and geometry
core (SURVEY.md §5 item 2: geometry ops get self-contained property
tests — validity idempotence, 2D-ness, family semantics)."""

from __future__ import annotations

import math
import struct

from hypothesis import given, settings
from hypothesis import strategies as st

from overturelink_data_pipeline_spark.geo import geom as G
from overturelink_data_pipeline_spark.geo import wkb as W

coord = st.floats(
    min_value=-180, max_value=180, allow_nan=False, allow_infinity=False, width=64
)


@given(coord, coord)
def test_point_roundtrip(x, y):
    assert W.loads(W.point(x, y)) == ("Point", (x, y))


@given(st.lists(st.tuples(coord, coord), min_size=2, max_size=20))
def test_linestring_roundtrip(coords):
    assert W.loads(W.linestring(coords)) == ("LineString", coords)


@given(coord, coord, st.floats(min_value=-1000, max_value=1000, allow_nan=False))
def test_z_point_dropped_to_2d(x, y, z):
    iso_z = b"\x01" + struct.pack("<I", 1001) + struct.pack("<3d", x, y, z)
    assert W.loads(iso_z) == ("Point", (x, y))
    ewkb_z = b"\x01" + struct.pack("<I", 0x80000001) + struct.pack("<3d", x, y, z)
    assert W.loads(ewkb_z) == ("Point", (x, y))


def test_big_endian_parse():
    be = b"\x00" + struct.pack(">I", 1) + struct.pack(">2d", 3.5, -7.25)
    assert W.loads(be) == ("Point", (3.5, -7.25))


def test_force_2d_idempotent_via_roundtrip():
    ls_z = b"\x01" + struct.pack("<I", 1002) + struct.pack("<I", 2) + struct.pack(
        "<6d", 0, 0, 5, 1, 1, 6
    )
    once = W.dumps(W.loads(ls_z))
    assert W.dumps(W.loads(once)) == once
    assert W.loads(once) == ("LineString", [(0.0, 0.0), (1.0, 1.0)])


UNIT_SQUARE = [[(0.0, 0.0), (1.0, 0.0), (1.0, 1.0), (0.0, 1.0), (0.0, 0.0)]]


def test_polygon_area_and_centroid():
    g = ("Polygon", UNIT_SQUARE)
    assert math.isclose(G.area(g), 1.0)
    assert G.centroid(g) == (0.5, 0.5)


def test_polygon_with_hole_area():
    hole = [(0.25, 0.25), (0.75, 0.25), (0.75, 0.75), (0.25, 0.75), (0.25, 0.25)]
    g = ("Polygon", UNIT_SQUARE + [hole])
    assert math.isclose(G.area(g), 1.0 - 0.25)


def test_length():
    g = ("LineString", [(0.0, 0.0), (3.0, 4.0)])
    assert math.isclose(G.length(g), 5.0)


def test_point_in_polygon_with_hole():
    hole = [(0.25, 0.25), (0.75, 0.25), (0.75, 0.75), (0.25, 0.75), (0.25, 0.25)]
    rings = UNIT_SQUARE + [hole]
    assert G.point_in_polygon(0.1, 0.1, rings)
    assert not G.point_in_polygon(0.5, 0.5, rings)  # inside the hole
    assert G.point_in_polygon(0.25, 0.25, rings)  # on hole boundary
    assert G.point_in_polygon(0.0, 0.5, rings)  # on shell boundary
    assert not G.point_in_polygon(2.0, 2.0, rings)


def test_intersects_concave_bbox_vs_precise():
    """A line inside the bbox notch of a C-shaped polygon must NOT
    intersect — this is the divisions-vs-bbox precision case."""
    c_shape = [
        [(0, 0), (10, 0), (10, 2.5), (3, 2.5), (3, 7.5), (10, 7.5), (10, 10), (0, 10), (0, 0)]
    ]
    inside_notch = ("LineString", [(6.0, 4.0), (8.0, 5.0)])
    crossing = ("LineString", [(1.0, 5.0), (9.0, 5.0)])
    assert not G.intersects_polygon(inside_notch, c_shape)
    assert G.intersects_polygon(crossing, c_shape)
    # polygon fully containing the clip polygon still intersects
    big = ("Polygon", [[(-5, -5), (15, -5), (15, 15), (-5, 15), (-5, -5)]])
    assert G.intersects_polygon(big, c_shape)


def test_bowtie_invalid_and_untwist():
    bowtie = ("Polygon", [[(0.0, 0.0), (1.0, 1.0), (1.0, 0.0), (0.0, 1.0), (0.0, 0.0)]])
    assert not G.is_valid(bowtie)
    fixed = G.make_valid(bowtie)
    assert G.is_valid(fixed)
    # the two triangles of a unit bowtie have area 0.25 each
    assert math.isclose(G.area(fixed), 0.5, rel_tol=1e-9)
    # idempotence
    assert G.make_valid(fixed) == fixed


def test_valid_polygon_untouched_by_make_valid():
    g = ("Polygon", UNIT_SQUARE)
    assert G.is_valid(g)
    assert G.make_valid(g) == g


def test_unwrap_single_multipolygon():
    single = ("MultiPolygon", [("Polygon", UNIT_SQUARE)])
    assert G.unwrap_single_multipolygon(single) == ("Polygon", UNIT_SQUARE)
    double = ("MultiPolygon", [("Polygon", UNIT_SQUARE), ("Polygon", UNIT_SQUARE)])
    assert G.unwrap_single_multipolygon(double) == double


@given(
    st.floats(min_value=-179, max_value=179, allow_nan=False),
    st.floats(min_value=-80, max_value=80, allow_nan=False),
)
@settings(max_examples=200)
def test_utm_roundtrip(lon, lat):
    zone, north = G.utm_zone(lon, lat)
    x, y = G.lonlat_to_utm(lon, lat, zone, north)
    lon2, lat2 = G.utm_to_lonlat(x, y, zone, north)
    assert abs(lon2 - lon) < 1e-6 and abs(lat2 - lat) < 1e-6


def test_utm_sanity_equator():
    # zone 31N central meridian 3°E: (3,0) maps to (500000, 0)
    x, y = G.lonlat_to_utm(3.0, 0.0, 31, True)
    assert abs(x - 500000) < 1e-3 and abs(y) < 1e-3


def test_geometry_type_peek():
    assert W.geometry_type(W.point(1, 2)) == "Point"
    assert W.geometry_type(W.linestring([(0, 0), (1, 1)])) == "LineString"
    mp = W.dumps(("MultiPolygon", [("Polygon", UNIT_SQUARE)]))
    assert W.geometry_type(mp) == "MultiPolygon"
    gc = W.dumps(("GeometryCollection", [("Point", (0.0, 0.0))]))
    assert W.geometry_type(gc) == "GeometryCollection"


def test_empty_point():
    empty = W.dumps(("Point", None))
    assert W.loads(empty) == ("Point", None)
    assert G.is_empty(("Point", None))
    assert not G.is_empty(("Point", (0.0, 0.0)))


def test_duplicate_consecutive_vertex_ring_is_valid():
    """review r10: a repeated consecutive vertex (valid per OGC, common
    in real data) made ring_is_simple read the zero-length edge's
    neighbors as crossing non-adjacent edges — make_valid then silently
    dropped perfectly valid holes."""
    from overturelink_data_pipeline_spark.geo.geom import (
        is_valid,
        make_valid,
        ring_is_simple,
    )

    shell = [(0.0, 0.0), (8.0, 0.0), (8.0, 8.0), (0.0, 8.0), (0.0, 0.0)]
    hole = [(2.0, 2.0), (6.0, 2.0), (6.0, 6.0), (6.0, 6.0), (2.0, 6.0), (2.0, 2.0)]
    assert ring_is_simple(hole)
    poly = ("Polygon", [shell, hole])
    assert is_valid(poly)
    assert make_valid(poly) == poly  # the hole survives
    # a genuine bowtie is still caught
    bow = [(0.0, 0.0), (4.0, 4.0), (4.0, 0.0), (0.0, 4.0), (0.0, 0.0)]
    assert not ring_is_simple(bow)


def test_intersects_polygon_precomputed_boxes_equivalent():
    """The ring-box fast path must be exact: precomputed-box calls give
    identical answers to the self-computing form for inside, boundary,
    hole, and outside cases."""
    from overturelink_data_pipeline_spark.geo.geom import (
        intersects_polygon,
        polygon_ring_boxes,
    )

    shell = [(0.0, 0.0), (10.0, 0.0), (10.0, 10.0), (0.0, 10.0), (0.0, 0.0)]
    hole = [(4.0, 4.0), (6.0, 4.0), (6.0, 6.0), (4.0, 6.0), (4.0, 4.0)]
    rings = [shell, hole]
    boxes = polygon_ring_boxes(rings)
    cases = [
        ("Point", (2.0, 2.0)),                      # inside
        ("Point", (5.0, 5.0)),                      # in the hole
        ("Point", (20.0, 20.0)),                    # outside
        ("LineString", [(-1.0, 5.0), (11.0, 5.0)]),  # crosses through
        ("LineString", [(20.0, 0.0), (21.0, 1.0)]),  # clear of the box
        ("Polygon", [[(-1.0, -1.0), (12.0, -1.0), (12.0, 12.0),
                      (-1.0, 12.0), (-1.0, -1.0)]]),  # contains the clip
    ]
    for g in cases:
        assert intersects_polygon(g, rings) == intersects_polygon(
            g, rings, boxes
        ), g
    assert intersects_polygon(("Point", (2.0, 2.0)), rings, boxes)
    assert not intersects_polygon(("Point", (5.0, 5.0)), rings, boxes)
    assert not intersects_polygon(("Point", (20.0, 20.0)), rings, boxes)
    assert intersects_polygon(cases[5], rings, boxes)  # full containment
