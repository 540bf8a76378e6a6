"""Computational-geometry core over the wkb.py tuple representation.

Implements the geometry semantics the reference gets from shapely/GEOS
(SURVEY.md §2.7 G1-G10): area, length, centroid, bbox, validity,
point-in-polygon, polygon intersection tests, bowtie repair, and a
WGS84 transverse-Mercator (UTM) projection for the
centroid-in-estimated-UTM op (reference cli.py:2242-2285).

All functions take/return the light tuples from ``wkb.py``; no numpy
needed at these sizes per Arrow batch — Python-level loops inside a
pandas UDF still amortize interpreter overhead over the batch.
"""

from __future__ import annotations

import math
from typing import Any

Geom = tuple[str, Any]

EMPTY_BBOX = (math.inf, -math.inf, math.inf, -math.inf)  # xmin,xmax,ymin,ymax


# -- bbox -------------------------------------------------------------------

def bbox(geom: Geom) -> tuple[float, float, float, float]:
    """(xmin, xmax, ymin, ymax) envelope; EMPTY_BBOX for empty geoms."""
    name, body = geom
    xmin, xmax, ymin, ymax = EMPTY_BBOX
    for x, y in _iter_coords(geom):
        xmin = x if x < xmin else xmin
        xmax = x if x > xmax else xmax
        ymin = y if y < ymin else ymin
        ymax = y if y > ymax else ymax
    return (xmin, xmax, ymin, ymax)


def _iter_coords(geom: Geom):
    name, body = geom
    if body is None:
        return
    if name == "Point":
        yield body
    elif name == "LineString":
        yield from body
    elif name == "Polygon":
        for ring in body:
            yield from ring
    else:
        for child in body:
            yield from _iter_coords(child)


def is_empty(geom: Geom) -> bool:
    name, body = geom
    if body is None:
        return True
    if name in ("Point",):
        return False
    if name == "LineString":
        return len(body) == 0
    if name == "Polygon":
        # a Polygon whose rings are ALL empty has no coordinates — it is
        # EMPTY (OGC); sinks rely on this to emit Null Shape records
        # instead of zero-point rings
        return len(body) == 0 or all(len(r) == 0 for r in body)
    return len(body) == 0 or all(is_empty(c) for c in body)


# -- area / length / centroid ----------------------------------------------

def _ring_signed_area(ring: list[tuple[float, float]]) -> float:
    s = 0.0
    n = len(ring)
    for i in range(n - 1):
        x1, y1 = ring[i]
        x2, y2 = ring[i + 1]
        s += x1 * y2 - x2 * y1
    return s / 2.0


def polygon_area(rings: list[list[tuple[float, float]]]) -> float:
    """abs(shell) - sum(abs(holes)) — shapely convention."""
    if not rings:
        return 0.0
    a = abs(_ring_signed_area(rings[0]))
    for hole in rings[1:]:
        a -= abs(_ring_signed_area(hole))
    return a


def area(geom: Geom) -> float:
    name, body = geom
    if body is None:
        return 0.0
    if name == "Polygon":
        return polygon_area(body)
    if name in ("MultiPolygon", "GeometryCollection"):
        return sum(area(c) for c in body)
    return 0.0


def length(geom: Geom) -> float:
    name, body = geom
    if body is None:
        return 0.0
    if name == "LineString":
        return _path_length(body)
    if name == "Polygon":
        return sum(_path_length(r) for r in body)
    if name in ("MultiLineString", "MultiPolygon", "GeometryCollection"):
        return sum(length(c) for c in body)
    return 0.0


def _path_length(coords: list[tuple[float, float]]) -> float:
    s = 0.0
    for i in range(len(coords) - 1):
        dx = coords[i + 1][0] - coords[i][0]
        dy = coords[i + 1][1] - coords[i][1]
        s += math.hypot(dx, dy)
    return s


def centroid(geom: Geom) -> tuple[float, float] | None:
    """Dimension-weighted centroid (GEOS semantics: highest dimension
    present wins — polygons by area, else lines by length, else points)."""
    name, body = geom
    if body is None or is_empty(geom):
        return None
    ax = ay = aw = 0.0  # area-weighted
    lx = ly = lw = 0.0  # length-weighted
    px = py = pw = 0.0  # point-count-weighted

    def acc(g: Geom) -> None:
        nonlocal ax, ay, aw, lx, ly, lw, px, py, pw
        n, b = g
        if b is None:
            return
        if n == "Point":
            px += b[0]
            py += b[1]
            pw += 1.0
        elif n == "LineString":
            for i in range(len(b) - 1):
                x1, y1 = b[i]
                x2, y2 = b[i + 1]
                w = math.hypot(x2 - x1, y2 - y1)
                lx += (x1 + x2) / 2 * w
                ly += (y1 + y2) / 2 * w
                lw += w
        elif n == "Polygon":
            for ri, ring in enumerate(b):
                sa = _ring_signed_area(ring)
                # orient shell positive, holes negative
                sign = 1.0 if ri == 0 else -1.0
                w = abs(sa) * sign
                cx, cy = _ring_centroid(ring, sa)
                ax += cx * w
                ay += cy * w
                aw += w
        else:
            for c in b:
                acc(c)

    acc(geom)
    if abs(aw) > 1e-30:
        return (ax / aw, ay / aw)
    if lw > 1e-30:
        return (lx / lw, ly / lw)
    if pw > 0:
        return (px / pw, py / pw)
    return None


def _ring_centroid(ring: list[tuple[float, float]], signed_area: float) -> tuple[float, float]:
    if abs(signed_area) < 1e-30:
        # degenerate ring → average of vertices
        n = max(len(ring) - 1, 1)
        return (sum(p[0] for p in ring[:n]) / n, sum(p[1] for p in ring[:n]) / n)
    cx = cy = 0.0
    for i in range(len(ring) - 1):
        x1, y1 = ring[i]
        x2, y2 = ring[i + 1]
        cross = x1 * y2 - x2 * y1
        cx += (x1 + x2) * cross
        cy += (y1 + y2) * cross
    f = 1.0 / (6.0 * signed_area)
    return (cx * f, cy * f)


# -- predicates -------------------------------------------------------------

def point_in_ring(x: float, y: float, ring: list[tuple[float, float]]) -> bool:
    """Ray-cast; boundary points count as inside (intersects semantics)."""
    inside = False
    n = len(ring)
    for i in range(n - 1):
        x1, y1 = ring[i]
        x2, y2 = ring[i + 1]
        # on-segment check (boundary → inside for ST_Intersects)
        if _on_segment(x, y, x1, y1, x2, y2):
            return True
        if (y1 > y) != (y2 > y):
            xin = (x2 - x1) * (y - y1) / (y2 - y1) + x1
            if x < xin:
                inside = not inside
    return inside


def _on_segment(px: float, py: float, x1: float, y1: float, x2: float, y2: float) -> bool:
    cross = (x2 - x1) * (py - y1) - (y2 - y1) * (px - x1)
    if abs(cross) > 1e-12:
        return False
    if min(x1, x2) - 1e-12 <= px <= max(x1, x2) + 1e-12 and min(y1, y2) - 1e-12 <= py <= max(y1, y2) + 1e-12:
        return True
    return False


def point_in_polygon(x: float, y: float, rings: list[list[tuple[float, float]]]) -> bool:
    if not rings or not point_in_ring(x, y, rings[0]):
        return False
    for hole in rings[1:]:
        # strictly inside a hole → outside; on hole boundary → still inside
        if point_in_ring(x, y, hole) and not _on_ring_boundary(x, y, hole):
            return False
    return True


def _on_ring_boundary(x: float, y: float, ring: list[tuple[float, float]]) -> bool:
    for i in range(len(ring) - 1):
        x1, y1 = ring[i]
        x2, y2 = ring[i + 1]
        if _on_segment(x, y, x1, y1, x2, y2):
            return True
    return False


def segments_intersect(
    p1: tuple[float, float], p2: tuple[float, float],
    p3: tuple[float, float], p4: tuple[float, float],
) -> bool:
    d1 = _orient(p3, p4, p1)
    d2 = _orient(p3, p4, p2)
    d3 = _orient(p1, p2, p3)
    d4 = _orient(p1, p2, p4)
    if ((d1 > 0 and d2 < 0) or (d1 < 0 and d2 > 0)) and (
        (d3 > 0 and d4 < 0) or (d3 < 0 and d4 > 0)
    ):
        return True
    if d1 == 0 and _in_box(p3, p4, p1):
        return True
    if d2 == 0 and _in_box(p3, p4, p2):
        return True
    if d3 == 0 and _in_box(p1, p2, p3):
        return True
    if d4 == 0 and _in_box(p1, p2, p4):
        return True
    return False


def _orient(a, b, c) -> float:
    return (b[0] - a[0]) * (c[1] - a[1]) - (b[1] - a[1]) * (c[0] - a[0])


def _in_box(a, b, p) -> bool:
    return (
        min(a[0], b[0]) <= p[0] <= max(a[0], b[0])
        and min(a[1], b[1]) <= p[1] <= max(a[1], b[1])
    )


def _paths(geom: Geom) -> list[list[tuple[float, float]]]:
    """All vertex paths (line strings + polygon rings) of a geometry."""
    name, body = geom
    if body is None:
        return []
    if name == "Point":
        return [[body]]
    if name == "LineString":
        return [body]
    if name == "Polygon":
        return list(body)
    out: list[list[tuple[float, float]]] = []
    for child in body:
        out.extend(_paths(child))
    return out


def _path_box(path) -> tuple[float, float, float, float] | None:
    """(xmin, ymin, xmax, ymax) of a vertex path, None when empty."""
    if not path:
        return None
    xs = [p[0] for p in path]
    ys = [p[1] for p in path]
    return (min(xs), min(ys), max(xs), max(ys))


def _boxes_overlap(a, b) -> bool:
    return a[0] <= b[2] and b[0] <= a[2] and a[1] <= b[3] and b[1] <= a[3]


def polygon_ring_boxes(
    poly_rings: list[list[tuple[float, float]]],
) -> list[tuple[float, float, float, float] | None]:
    """Precomputed per-ring bboxes for :func:`intersects_polygon` —
    build once per worker next to the decoded polygon and pass to
    every row's call."""
    return [_path_box(r) for r in poly_rings]


def intersects_polygon(
    geom: Geom,
    poly_rings: list[list[tuple[float, float]]],
    ring_boxes: list | None = None,
) -> bool:
    """True iff ``geom`` intersects the polygon (shell + holes).

    Strategy (exact for the supported types):
    - any vertex of geom inside polygon → True
    - any edge of geom crosses any polygon-ring edge → True
    - geom is a polygon that fully contains the clip polygon
      (test one shell vertex of the clip polygon) → True

    Per-ring/per-path bounding boxes are used as exact fast-rejects
    (review r10): this is the engine's hottest UDF kernel, and without
    them every candidate row paid O(V_geom × E_country) Python-loop
    work even when its geometry was nowhere near a ring — a country
    MultiPolygon's island rings in particular were scanned
    edge-by-edge for every mainland row. A rejected pair provably
    cannot intersect, so results are unchanged (measured: a clear-of-
    boundary line vs a 20k-vertex shell dropped 1962 → 2 ms, and to
    O(paths) once the caller precomputes ``ring_boxes`` via
    :func:`polygon_ring_boxes` — the per-worker closure in
    st_intersects_with does, amortizing the O(E) box build across the
    whole partition)."""
    if ring_boxes is None:
        ring_boxes = [_path_box(r) for r in poly_rings]
    shell_box = ring_boxes[0] if ring_boxes else None
    for x, y in _iter_coords(geom):
        if shell_box is not None and not (
            shell_box[0] <= x <= shell_box[2]
            and shell_box[1] <= y <= shell_box[3]
        ):
            continue  # outside the shell's box → cannot be inside
        if not poly_rings or not point_in_ring(x, y, poly_rings[0]):
            continue
        inside = True
        for hole, hb in zip(poly_rings[1:], ring_boxes[1:]):
            if hb is not None and not (
                hb[0] <= x <= hb[2] and hb[1] <= y <= hb[3]
            ):
                continue  # outside the hole's box → not in this hole
            if point_in_ring(x, y, hole) and not _on_ring_boundary(x, y, hole):
                inside = False
                break
        if inside:
            return True
    gpaths = _paths(geom)
    path_boxes = [_path_box(p) for p in gpaths]
    for ring, rb in zip(poly_rings, ring_boxes):
        for path, pb in zip(gpaths, path_boxes):
            if rb is not None and pb is not None and not _boxes_overlap(rb, pb):
                continue
            for i in range(len(ring) - 1):
                e1, e2 = ring[i], ring[i + 1]
                if pb is not None and not (
                    min(e1[0], e2[0]) <= pb[2]
                    and pb[0] <= max(e1[0], e2[0])
                    and min(e1[1], e2[1]) <= pb[3]
                    and pb[1] <= max(e1[1], e2[1])
                ):
                    continue  # ring edge clear of the path's box
                for j in range(len(path) - 1):
                    if segments_intersect(path[j], path[j + 1], e1, e2):
                        return True
    name, _ = geom
    if name in ("Polygon", "MultiPolygon", "GeometryCollection") and poly_rings:
        px, py = poly_rings[0][0]
        for sub in _polygons(geom):
            if point_in_polygon(px, py, sub):
                return True
    return False


def intersects(a: Geom, b: Geom) -> bool:
    """Symmetric intersects for the type pairs the engine needs.

    Polygon clip targets use :func:`intersects_polygon`; other pairs
    fall back to vertex/edge tests (sufficient for point/line pairs).
    """
    bname, _ = b
    if bname in ("Polygon", "MultiPolygon"):
        for rings in _polygons(b):
            if intersects_polygon(a, rings):
                return True
        return False
    aname, _ = a
    if aname in ("Polygon", "MultiPolygon"):
        return intersects(b, a)
    # GeometryCollections may CONTAIN polygons (recursed by _polygons):
    # test polygon containment first — the path fallback below only
    # sees edges and would miss a point strictly inside — then fall
    # through so line/point children still get the vertex/edge tests
    for gc, other in ((b, a), (a, b)):
        if gc[0] == "GeometryCollection":
            for rings in _polygons(gc):
                if intersects_polygon(other, rings):
                    return True
    # point/line vs point/line: shared vertex or crossing edges
    apaths, bpaths = _paths(a), _paths(b)
    for pa in apaths:
        for pb in bpaths:
            if len(pa) == 1 and len(pb) == 1:
                if abs(pa[0][0] - pb[0][0]) < 1e-12 and abs(pa[0][1] - pb[0][1]) < 1e-12:
                    return True
            elif len(pa) == 1:
                if any(_on_segment(pa[0][0], pa[0][1], *pb[i], *pb[i + 1]) for i in range(len(pb) - 1)):
                    return True
            elif len(pb) == 1:
                if any(_on_segment(pb[0][0], pb[0][1], *pa[i], *pa[i + 1]) for i in range(len(pa) - 1)):
                    return True
            else:
                for i in range(len(pa) - 1):
                    for j in range(len(pb) - 1):
                        if segments_intersect(pa[i], pa[i + 1], pb[j], pb[j + 1]):
                            return True
    return False


def _polygons(geom: Geom) -> list[list[list[tuple[float, float]]]]:
    """All polygon ring-lists within a geometry."""
    name, body = geom
    if body is None:
        return []
    if name == "Polygon":
        return [body]
    if name in ("MultiPolygon", "GeometryCollection"):
        out = []
        for c in body:
            out.extend(_polygons(c))
        return out
    return []


# -- validity + repair ------------------------------------------------------

def ring_is_simple(ring: list[tuple[float, float]]) -> bool:
    """No crossings between non-adjacent edges (O(n²) — country-polygon
    scale is fine inside an Arrow batch; a sweep-line would replace this
    if profiling demanded it).

    Consecutive duplicate vertices are collapsed first (review r10):
    a repeated vertex is VALID per OGC (GEOS accepts it; it is common
    in real data), but its zero-length edge makes the two real
    neighbors index-non-adjacent edges sharing an endpoint — which the
    crossing test reads as a self-intersection, and make_valid then
    silently dropped perfectly valid holes."""
    if not ring:
        # public helper: current callers pre-check len>=4, but an empty
        # ring must not IndexError on the dedup seed (ADVICE r10);
        # vacuously simple is the honest answer for zero edges
        return True
    dedup = [ring[0]]
    for p in ring[1:]:
        if p != dedup[-1]:
            dedup.append(p)
    ring = dedup
    n = len(ring) - 1
    for i in range(n):
        for j in range(i + 1, n):
            if j == i or j == (i + 1) % n or (i == 0 and j == n - 1):
                continue
            if segments_intersect(ring[i], ring[i + 1], ring[j], ring[j + 1]):
                return False
    return True


def is_valid(geom: Geom) -> bool:
    """Polygon validity: closed rings, >=4 points, simple rings.

    (Subset of OGC validity — no shared-interior or nested-shell tests;
    covers the defect classes in the fixture spec, FIXTURES.md A2.)
    """
    name, body = geom
    if body is None:
        return True
    if name == "Polygon":
        for ring in body:
            if len(ring) < 4:
                return False
            if ring[0] != ring[-1]:
                return False
            if not ring_is_simple(ring):
                return False
        return True
    if name in ("MultiPolygon", "GeometryCollection"):
        return all(is_valid(c) for c in body)
    return True


def _seg_intersection_point(p1, p2, p3, p4):
    """Proper intersection point of two segments, or None."""
    d = (p2[0] - p1[0]) * (p4[1] - p3[1]) - (p2[1] - p1[1]) * (p4[0] - p3[0])
    if abs(d) < 1e-30:
        return None
    t = ((p3[0] - p1[0]) * (p4[1] - p3[1]) - (p3[1] - p1[1]) * (p4[0] - p3[0])) / d
    u = ((p3[0] - p1[0]) * (p2[1] - p1[1]) - (p3[1] - p1[1]) * (p2[0] - p1[0])) / d
    if 0.0 < t < 1.0 and 0.0 < u < 1.0:
        return (p1[0] + t * (p2[0] - p1[0]), p1[1] + t * (p2[1] - p1[1]))
    return None


def _untwist_ring(ring: list[tuple[float, float]], depth: int = 0) -> list[list[tuple[float, float]]]:
    """Split a self-crossing ring at its first proper crossing into two
    rings, recursively — the bowtie→two-triangles repair GEOS MakeValid
    performs (reference relies on make_valid + buffer(0),
    transform.py:217-231)."""
    if depth > 8:
        return [ring]
    n = len(ring) - 1
    for i in range(n):
        for j in range(i + 2, n):
            if i == 0 and j == n - 1:
                continue
            p = _seg_intersection_point(ring[i], ring[i + 1], ring[j], ring[j + 1])
            if p is not None:
                ring1 = ring[: i + 1] + [p] + ring[j + 1 :]
                ring2 = [p] + ring[i + 1 : j + 1] + [p]
                out = []
                for r in (ring1, ring2):
                    if len(r) >= 4:
                        out.extend(_untwist_ring(r, depth + 1))
                return out
    return [ring]


def make_valid(geom: Geom) -> Geom:
    """Repair self-crossing polygon rings by splitting at crossings.

    Valid input is returned unchanged. Output is a Polygon or
    MultiPolygon of the non-degenerate repaired parts. Holes of an
    invalid shell are dropped (matching the scope of the fixture
    defect classes; GEOS would re-assign them).

    Scope (review r10): the split happens at PROPER crossings — edges
    crossing at an interior point of both. A ring that self-touches
    exactly AT an existing vertex (a vertex-pinched bowtie) has no
    proper crossing to split at and is returned unchanged even though
    is_valid flags it; GEOS MakeValid node-splits at the shared vertex
    there. That defect class is not in the fixture spec (FIXTURES.md
    A2) and repairing it would need the noding pass this module
    deliberately avoids."""
    name, body = geom
    if body is None:
        return geom
    if name == "Polygon":
        if is_valid(geom):
            return geom
        shell_parts = _untwist_ring(body[0])
        holes = [r for r in body[1:] if len(r) >= 4 and ring_is_simple(r)]
        polys = [
            [p] for p in shell_parts if abs(_ring_signed_area(p)) > 0.0
        ]
        if not polys:
            return ("Polygon", [])
        if len(polys) == 1:
            return ("Polygon", polys[0] + holes)
        return ("MultiPolygon", [("Polygon", p) for p in polys])
    if name in ("MultiPolygon", "GeometryCollection"):
        # a child repair can itself return a MultiPolygon (bowtie split
        # into 2+ shells); flatten those so a MultiPolygon never nests a
        # MultiPolygon — type-6-inside-type-6 is invalid WKB and
        # shapely/GDAL consumers reject the re-encoded bytes
        fixed: list[Geom] = []
        for c in body:
            fc = make_valid(c)
            if name == "MultiPolygon" and fc[0] == "MultiPolygon":
                fixed.extend(fc[1])
            else:
                fixed.append(fc)
        return (name, fixed)
    return geom


# -- G6: single-part multipolygon unwrap ------------------------------------

def unwrap_single_multipolygon(geom: Geom) -> Geom:
    name, body = geom
    if name == "MultiPolygon" and body is not None and len(body) == 1:
        return body[0]
    return geom


# -- G7: UTM projection (WGS84 transverse Mercator, Snyder formulas) --------

_WGS84_A = 6378137.0
_WGS84_F = 1 / 298.257223563
_WGS84_E2 = _WGS84_F * (2 - _WGS84_F)
_UTM_K0 = 0.9996


def utm_zone(lon: float, lat: float) -> tuple[int, bool]:
    """(zone number, is_northern) — reference estimate_utm_crs analog."""
    zone = int(math.floor((lon + 180.0) / 6.0)) + 1
    zone = min(max(zone, 1), 60)
    return zone, lat >= 0


def lonlat_to_utm(lon: float, lat: float, zone: int, north: bool) -> tuple[float, float]:
    lam = math.radians(lon)
    phi = math.radians(lat)
    lam0 = math.radians(zone * 6 - 183)
    e2 = _WGS84_E2
    ep2 = e2 / (1 - e2)
    n = _WGS84_A / math.sqrt(1 - e2 * math.sin(phi) ** 2)
    t = math.tan(phi) ** 2
    c = ep2 * math.cos(phi) ** 2
    a_ = (lam - lam0) * math.cos(phi)
    m = _WGS84_A * (
        (1 - e2 / 4 - 3 * e2**2 / 64 - 5 * e2**3 / 256) * phi
        - (3 * e2 / 8 + 3 * e2**2 / 32 + 45 * e2**3 / 1024) * math.sin(2 * phi)
        + (15 * e2**2 / 256 + 45 * e2**3 / 1024) * math.sin(4 * phi)
        - (35 * e2**3 / 3072) * math.sin(6 * phi)
    )
    x = _UTM_K0 * n * (
        a_ + (1 - t + c) * a_**3 / 6 + (5 - 18 * t + t**2 + 72 * c - 58 * ep2) * a_**5 / 120
    ) + 500000.0
    y = _UTM_K0 * (
        m + n * math.tan(phi) * (
            a_**2 / 2
            + (5 - t + 9 * c + 4 * c**2) * a_**4 / 24
            + (61 - 58 * t + t**2 + 600 * c - 330 * ep2) * a_**6 / 720
        )
    )
    if not north:
        y += 10000000.0
    return x, y


def utm_to_lonlat(x: float, y: float, zone: int, north: bool) -> tuple[float, float]:
    e2 = _WGS84_E2
    ep2 = e2 / (1 - e2)
    e1 = (1 - math.sqrt(1 - e2)) / (1 + math.sqrt(1 - e2))
    x = x - 500000.0
    if not north:
        y -= 10000000.0
    m = y / _UTM_K0
    mu = m / (_WGS84_A * (1 - e2 / 4 - 3 * e2**2 / 64 - 5 * e2**3 / 256))
    phi1 = mu + (
        (3 * e1 / 2 - 27 * e1**3 / 32) * math.sin(2 * mu)
        + (21 * e1**2 / 16 - 55 * e1**4 / 32) * math.sin(4 * mu)
        + (151 * e1**3 / 96) * math.sin(6 * mu)
        + (1097 * e1**4 / 512) * math.sin(8 * mu)
    )
    n1 = _WGS84_A / math.sqrt(1 - e2 * math.sin(phi1) ** 2)
    r1 = _WGS84_A * (1 - e2) / (1 - e2 * math.sin(phi1) ** 2) ** 1.5
    t1 = math.tan(phi1) ** 2
    c1 = ep2 * math.cos(phi1) ** 2
    d = x / (n1 * _UTM_K0)
    phi = phi1 - (n1 * math.tan(phi1) / r1) * (
        d**2 / 2
        - (5 + 3 * t1 + 10 * c1 - 4 * c1**2 - 9 * ep2) * d**4 / 24
        + (61 + 90 * t1 + 298 * c1 + 45 * t1**2 - 252 * ep2 - 3 * c1**2) * d**6 / 720
    )
    lam = (
        d
        - (1 + 2 * t1 + c1) * d**3 / 6
        + (5 - 2 * c1 + 28 * t1 - 3 * c1**2 + 8 * ep2 + 24 * t1**2) * d**5 / 120
    ) / math.cos(phi1)
    lam0 = math.radians(zone * 6 - 183)
    return (math.degrees(lam0 + lam), math.degrees(phi))
