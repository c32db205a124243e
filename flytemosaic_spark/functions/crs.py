"""CRS reprojection as pure column math (no GDAL/pyproj).

The reference reprojects the query geometry and tile index to a
caller-chosen CRS (`/root/reference/flytemosaic/mosaics.py:73`,
``gdf = gdf.to_crs(crs)``) and the main workflow takes a target ``crs``
parameter (`/root/reference/flyte/build.py:183`). The engine closes
that parity gap for the two CRSs that cover the reference's real use
(geographic WGS84 and the web tiling grid): EPSG:4326 ↔ EPSG:3857
(spherical Web Mercator) is a closed-form per-axis monotonic map, so

- it is exact column math (JVM-side, codegen-friendly — no UDF),
- axis-aligned bboxes stay axis-aligned: corner transform IS the bbox
  transform, and
- the sargable bbox prune in :func:`operators.catalog.tiles_for_bbox`
  keeps its parquet min/max row-group skipping in either CRS.

Spherical formulas (EPSG:3857 is defined on the sphere R = 6378137):

    x = R · lon·π/180
    y = R · ln(tan(π/4 + lat·π/360))
    lon = x/R · 180/π
    lat = (2·atan(exp(y/R)) − π/2) · 180/π

Python twins mirror the Column versions for plan-time parameters (the
query bbox is a driver-side tuple, the query geometry a WKB blob).
"""

from __future__ import annotations

import math
import struct

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

EPSG_4326 = "EPSG:4326"
EPSG_3857 = "EPSG:3857"

R = 6378137.0  # WGS84 semi-major axis; EPSG:3857 is spherical
# Web-Mercator latitude of validity: y(±MAX_LAT) = ±π·R (the square grid)
MAX_LAT = math.degrees(2 * math.atan(math.exp(math.pi)) - math.pi / 2)


# -- Column-side (JVM math, whole-stage codegen) ---------------------------


def lon_to_merc_x(lon: Column) -> Column:
    return lon * F.lit(R * math.pi / 180.0)


def lat_to_merc_y(lat: Column) -> Column:
    return F.lit(R) * F.log(F.tan(F.lit(math.pi / 4.0) + lat * F.lit(math.pi / 360.0)))


def merc_x_to_lon(x: Column) -> Column:
    return x * F.lit(180.0 / (R * math.pi))


def merc_y_to_lat(y: Column) -> Column:
    return (F.atan(F.exp(y / F.lit(R))) * F.lit(2.0) - F.lit(math.pi / 2.0)) * F.lit(
        180.0 / math.pi
    )


_AXIS_FNS = {
    (EPSG_4326, EPSG_3857): (lon_to_merc_x, lat_to_merc_y),
    (EPSG_3857, EPSG_4326): (merc_x_to_lon, merc_y_to_lat),
}


def reproject_bbox_cols(
    df: DataFrame,
    src_crs: str,
    dst_crs: str,
    cols: tuple[str, str, str, str] = ("minx", "miny", "maxx", "maxy"),
) -> DataFrame:
    """Reproject a bbox-column quartet in place. Both supported maps
    are strictly monotonic per axis, so min/max corners transform to
    min/max corners — no densification needed (unlike a general
    rotational CRS)."""
    if src_crs == dst_crs:
        return df
    fx, fy = _axis_fns(src_crs, dst_crs)
    minx, miny, maxx, maxy = cols
    return df.withColumns(
        {
            minx: fx(F.col(minx)),
            miny: fy(F.col(miny)),
            maxx: fx(F.col(maxx)),
            maxy: fy(F.col(maxy)),
        }
    )


def reproject_manifest(manifest: DataFrame, dst_crs: str) -> DataFrame:
    """The reference's ``gdf.to_crs(crs)`` over the mosaic manifest
    (mosaics.py:73): transform the tile bounds columns and restamp the
    ``srs`` metadata column. Rows already in ``dst_crs`` pass through;
    rows in a supported source CRS transform; any other srs raises at
    execution (mirroring pyproj's unknown-CRS failure)."""
    fwd = {}
    for (s, d), (fx, fy) in _AXIS_FNS.items():
        if d == dst_crs:
            fwd[s] = (fx, fy)
    if not fwd and dst_crs not in (EPSG_4326, EPSG_3857):
        raise ValueError(f"unsupported target CRS {dst_crs}")

    def _axis(c: str, which: int) -> Column:
        expr = F.col(c)
        w = F.when(F.col("srs") == dst_crs, expr)
        for s, fns in fwd.items():
            w = w.when(F.col("srs") == s, fns[which](expr))
        return w.otherwise(
            F.raise_error(F.concat(F.lit("unsupported srs: "), F.col("srs")))
        )

    return manifest.withColumns(
        {
            "minx": _axis("minx", 0),
            "miny": _axis("miny", 1),
            "maxx": _axis("maxx", 0),
            "maxy": _axis("maxy", 1),
            "srs": F.lit(dst_crs),
        }
    )


def _axis_fns(src_crs: str, dst_crs: str):
    try:
        return _AXIS_FNS[(src_crs, dst_crs)]
    except KeyError:
        raise ValueError(
            f"unsupported CRS pair {src_crs} -> {dst_crs}; "
            f"supported: EPSG:4326 <-> EPSG:3857"
        ) from None


def lonlat_to_xyz(lon: Column, lat: Column, zoom: int) -> tuple[Column, Column]:
    """Slippy-map (XYZ / Web-Mercator tiling grid) tile indices at a
    zoom level — the standard OSM/XYZ scheme every web tile sink
    addresses by: x = ⌊(lon+180)/360·2^z⌋,
    y = ⌊(1 − asinh(tan(lat·π/180))/π)/2·2^z⌋. Pure column math;
    the x axis is exact IEEE (one add, one divide, one scale), the y
    axis goes through tan/ln/sqrt — asinh is spelled out as
    ln(t + √(t²+1)) so engines without an asinh builtin (DuckDB)
    replay the identical expression. Valid for |lat| ≤ MAX_LAT."""
    n = float(1 << zoom)
    top = int(n) - 1
    # clamp to the grid: the domain edges (lon = 180, lat = -MAX_LAT)
    # land exactly on n and would otherwise address a nonexistent tile
    # row — standard slippy-map behavior puts them in tile n-1
    xt = F.least(
        F.floor((lon + F.lit(180.0)) / F.lit(360.0) * F.lit(n)).cast("bigint"),
        F.lit(top).cast("bigint"),
    )
    t = F.tan(lat * F.lit(math.pi / 180.0))
    asinh_t = F.log(t + F.sqrt(t * t + F.lit(1.0)))
    yt = F.least(
        F.floor(
            (F.lit(1.0) - asinh_t / F.lit(math.pi)) / F.lit(2.0) * F.lit(n)
        ).cast("bigint"),
        F.lit(top).cast("bigint"),
    )
    return xt, yt


# -- Python twins (plan-time parameters: bbox tuples, WKB blobs) -----------


def lonlat_to_mercator(lon: float, lat: float) -> tuple[float, float]:
    return (
        lon * (R * math.pi / 180.0),
        R * math.log(math.tan(math.pi / 4.0 + lat * (math.pi / 360.0))),
    )


def mercator_to_lonlat(x: float, y: float) -> tuple[float, float]:
    return (
        x * (180.0 / (R * math.pi)),
        (2.0 * math.atan(math.exp(y / R)) - math.pi / 2.0) * (180.0 / math.pi),
    )


_PY_AXIS_FNS = {
    (EPSG_4326, EPSG_3857): lonlat_to_mercator,
    (EPSG_3857, EPSG_4326): mercator_to_lonlat,
}


def reproject_bbox(
    bbox: tuple[float, float, float, float], src_crs: str, dst_crs: str
) -> tuple[float, float, float, float]:
    """Plan-time twin of :func:`reproject_bbox_cols` for the query
    bbox parameter."""
    if src_crs == dst_crs:
        return bbox
    fn = _py_fn(src_crs, dst_crs)
    x0, y0 = fn(bbox[0], bbox[1])
    x1, y1 = fn(bbox[2], bbox[3])
    return (x0, y0, x1, y1)


def _py_fn(src_crs: str, dst_crs: str):
    try:
        return _PY_AXIS_FNS[(src_crs, dst_crs)]
    except KeyError:
        raise ValueError(
            f"unsupported CRS pair {src_crs} -> {dst_crs}; "
            f"supported: EPSG:4326 <-> EPSG:3857"
        ) from None


def reproject_wkb(wkb: bytes, src_crs: str, dst_crs: str) -> bytes:
    """Reproject every coordinate in a WKB Polygon / MultiPolygon
    (both endiannesses), preserving ring structure and byte order —
    the query-geometry half of the reference's ``to_crs`` call, so the
    exact-intersects refine can run in the tile index's CRS."""
    if src_crs == dst_crs:
        return wkb
    fn = _py_fn(src_crs, dst_crs)
    out = bytearray(wkb)

    def xform_polygon(off: int) -> int:
        little = out[off]
        pre = "<" if little else ">"
        (gtype,) = struct.unpack_from(pre + "I", out, off + 1)
        if gtype != 3:
            raise ValueError(f"expected WKB Polygon, got type {gtype}")
        (n_rings,) = struct.unpack_from(pre + "I", out, off + 5)
        p = off + 9
        for _ in range(n_rings):
            (n_pts,) = struct.unpack_from(pre + "I", out, p)
            p += 4
            for _ in range(n_pts):
                x, y = struct.unpack_from(pre + "dd", out, p)
                struct.pack_into(pre + "dd", out, p, *fn(x, y))
                p += 16
        return p

    little = out[0]
    pre = "<" if little else ">"
    (gtype,) = struct.unpack_from(pre + "I", out, 1)
    if gtype == 3:
        xform_polygon(0)
    elif gtype == 6:
        (n_polys,) = struct.unpack_from(pre + "I", out, 5)
        p = 9
        for _ in range(n_polys):
            p = xform_polygon(p)
    else:
        raise ValueError(f"unsupported WKB geometry type {gtype}")
    return bytes(out)
