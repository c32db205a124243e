"""Dependency-free exact geometry refine for the spatial prune.

SURVEY §7(c): the bbox prefilter (sargable min/max columns) is exact
for the reference's axis-aligned tiles, but a general query geometry
needs an exact intersects refine — the reference uses GeoPandas
(`tile_gdf.intersects(geo)`, glad.py:236-239). shapely is not in this
environment, so the refine is implemented directly: a minimal WKB
decoder (Polygon / MultiPolygon, both endiannesses) plus a
rectangle×polygon intersection predicate (edge crossing + mutual
containment), applied as an Arrow-batched ``mapInPandas`` refine AFTER
the bbox prune — so at 100 TB the exact test only ever sees the bbox
survivors, exactly like the reference's two-phase prune.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

_WKB_POLYGON = 3
_WKB_MULTIPOLYGON = 6


def parse_wkb_polygons(wkb: bytes) -> list[list[tuple[float, float]]]:
    """Exterior rings only of a WKB Polygon or MultiPolygon (the
    bbox/reprojection helpers need just the outer boundary)."""
    return [rings[0] for rings in parse_wkb_polygon_rings(wkb)]


def parse_wkb_polygon_rings(
    wkb: bytes,
) -> list[list[list[tuple[float, float]]]]:
    """All rings of a WKB Polygon or MultiPolygon: one entry per
    polygon, ``entry[0]`` the exterior ring, ``entry[1:]`` interior
    rings (holes) — the reference's shapely ``intersects``
    (glad.py:236-239) honors holes, so the exact refine must too."""

    def read(fmt: str, off: int, little: bool):
        pre = "<" if little else ">"
        size = struct.calcsize(pre + fmt)
        return struct.unpack_from(pre + fmt, wkb, off), off + size

    def read_polygon(off: int) -> tuple[list[list[tuple[float, float]]], int]:
        (little,), off = read("B", off, True)
        (gtype,), off = read("I", off, bool(little))
        if gtype != _WKB_POLYGON:
            raise ValueError(f"expected WKB Polygon, got type {gtype}")
        (n_rings,), off = read("I", off, bool(little))
        rings = []
        for r in range(n_rings):
            (n_pts,), off = read("I", off, bool(little))
            pts, off2 = read(f"{2 * n_pts}d", off, bool(little))
            off = off2
            rings.append(list(zip(pts[0::2], pts[1::2])))
        return rings, off

    (little,) = struct.unpack_from("<B", wkb, 0)
    (gtype,) = struct.unpack_from(("<" if little else ">") + "I", wkb, 1)
    if gtype == _WKB_POLYGON:
        rings, _ = read_polygon(0)
        return [rings] if rings else []
    if gtype == _WKB_MULTIPOLYGON:
        off = 5
        (n_polys,) = struct.unpack_from(("<" if little else ">") + "I", wkb, off)
        off += 4
        out = []
        for _ in range(n_polys):
            rings, off = read_polygon(off)
            if rings:
                out.append(rings)
        return out
    raise ValueError(f"unsupported WKB geometry type {gtype}")


def _point_in_ring(x: float, y: float, ring: list[tuple[float, float]]) -> bool:
    inside = False
    n = len(ring)
    for i in range(n - 1):
        x1, y1 = ring[i]
        x2, y2 = ring[i + 1]
        if (y1 > y) != (y2 > y) and x < (x2 - x1) * (y - y1) / (y2 - y1) + x1:
            inside = not inside
    return inside


def _segments_cross(a1, a2, b1, b2) -> bool:
    def orient(p, q, r):
        v = (q[0] - p[0]) * (r[1] - p[1]) - (q[1] - p[1]) * (r[0] - p[0])
        return 0 if v == 0 else (1 if v > 0 else -1)

    def on_seg(p, q, r):
        return (
            min(p[0], q[0]) <= r[0] <= max(p[0], q[0])
            and min(p[1], q[1]) <= r[1] <= max(p[1], q[1])
        )

    o1, o2 = orient(a1, a2, b1), orient(a1, a2, b2)
    o3, o4 = orient(b1, b2, a1), orient(b1, b2, a2)
    if o1 != o2 and o3 != o4:
        return True
    return (
        (o1 == 0 and on_seg(a1, a2, b1))
        or (o2 == 0 and on_seg(a1, a2, b2))
        or (o3 == 0 and on_seg(b1, b2, a1))
        or (o4 == 0 and on_seg(b1, b2, a2))
    )


def _rect_touches_ring(
    minx: float, miny: float, maxx: float, maxy: float,
    ring: list[tuple[float, float]],
) -> bool:
    """Rect × single-ring region intersection: any ring vertex in the
    rect, any rect corner in the ring, or any edge crossing."""
    for x, y in ring:
        if minx <= x <= maxx and miny <= y <= maxy:
            return True
    corners = [(minx, miny), (maxx, miny), (maxx, maxy), (minx, maxy)]
    for cx, cy in corners:
        if _point_in_ring(cx, cy, ring):
            return True
    edges = [
        (corners[0], corners[1]), (corners[1], corners[2]),
        (corners[2], corners[3]), (corners[3], corners[0]),
    ]
    for i in range(len(ring) - 1):
        for e1, e2 in edges:
            if _segments_cross(ring[i], ring[i + 1], e1, e2):
                return True
    return False


def rect_intersects_polygon(
    minx: float, miny: float, maxx: float, maxy: float,
    ring: list[tuple[float, float]],
    holes: list[list[tuple[float, float]]] = (),
) -> bool:
    """Exact rect×polygon intersection, closed-set (shapely
    ``intersects``) semantics including interior rings: the rect meets
    the exterior-ring region AND is not strictly inside a hole. A rect
    that crosses or merely touches a hole's boundary still intersects
    (hole boundaries are polygon boundary); a hole fully inside the
    rect leaves polygon material in the rect on every side."""
    if not _rect_touches_ring(minx, miny, maxx, maxy, ring):
        return False
    corners = [(minx, miny), (maxx, miny), (maxx, maxy), (minx, maxy)]
    edges = [
        (corners[0], corners[1]), (corners[1], corners[2]),
        (corners[2], corners[3]), (corners[3], corners[0]),
    ]
    for hole in holes:
        if not all(_point_in_ring(cx, cy, hole) for cx, cy in corners):
            continue  # some corner in polygon material (or on boundary)
        # all corners inside the hole: strictly inside unless a rect
        # edge crosses/touches the hole boundary
        crossed = any(
            _segments_cross(hole[i], hole[i + 1], e1, e2)
            for i in range(len(hole) - 1)
            for e1, e2 in edges
        )
        if not crossed:
            return False
    return True


def refine_intersects(tiles: DataFrame, query_wkb: bytes) -> DataFrame:
    """Exact intersects refine over bbox-prefiltered tiles (the second
    phase of J1). Input needs minx/miny/maxx/maxy columns; the query
    geometry is closed over (broadcast with the serialized UDF — it is
    a single geometry, like the reference's single query geo)."""
    polys = parse_wkb_polygon_rings(query_wkb)
    schema = tiles.schema

    def refine(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            keep = [
                any(
                    rect_intersects_polygon(
                        mnx, mny, mxx, mxy, rings[0], rings[1:]
                    )
                    for rings in polys
                )
                for mnx, mny, mxx, mxy in zip(
                    pdf["minx"], pdf["miny"], pdf["maxx"], pdf["maxy"]
                )
            ]
            yield pdf[keep]

    return tiles.mapInPandas(refine, schema)


def wkb_polygon(
    coords: list[tuple[float, float]],
    holes: list[list[tuple[float, float]]] = (),
) -> bytes:
    """Little-endian WKB Polygon from an (auto-closed) exterior ring
    plus optional (auto-closed) interior rings — fixture helper and
    the inverse of :func:`parse_wkb_polygon_rings`."""

    def closed(r):
        r = list(r)
        if r[0] != r[-1]:
            r.append(r[0])
        return r

    rings = [closed(coords)] + [closed(h) for h in holes]
    out = struct.pack("<BII", 1, _WKB_POLYGON, len(rings))
    for ring in rings:
        out += struct.pack("<I", len(ring))
        for x, y in ring:
            out += struct.pack("<dd", x, y)
    return out
