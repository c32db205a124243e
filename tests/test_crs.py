"""functions/crs.py — Web-Mercator <-> EPSG:4326 column math.

Mirrors the reference's caller-chosen CRS path (mosaics.py:73
``to_crs``, build.py:183 ``crs``): round-trip properties, known
anchor values, WKB coordinate transform, and the plan-time query-bbox
reprojection through tiles_for_bbox.
"""

from __future__ import annotations

import math

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from flytemosaic_spark.functions.crs import (
    MAX_LAT,
    lat_to_merc_y,
    lon_to_merc_x,
    lonlat_to_mercator,
    merc_x_to_lon,
    merc_y_to_lat,
    mercator_to_lonlat,
    reproject_bbox,
    reproject_bbox_cols,
    reproject_manifest,
    reproject_wkb,
)
from flytemosaic_spark.functions.geometry import parse_wkb_polygons, wkb_polygon


@given(
    lon=st.floats(-180.0, 180.0),
    lat=st.floats(-85.0, 85.0),
)
@settings(max_examples=300, deadline=None)
def test_python_roundtrip_property(lon, lat):
    x, y = lonlat_to_mercator(lon, lat)
    lon2, lat2 = mercator_to_lonlat(x, y)
    assert abs(lon2 - lon) < 1e-9
    assert abs(lat2 - lat) < 1e-9


def test_known_anchor_values():
    # equator/prime meridian is the origin (y = R*ln(tan(pi/4)) is a
    # sub-nanometer ulp off exact zero)
    x0, y0 = lonlat_to_mercator(0.0, 0.0)
    assert x0 == 0.0 and abs(y0) < 1e-6
    # the grid is square: x(180°) == y(MAX_LAT) == pi*R
    x180, _ = lonlat_to_mercator(180.0, 0.0)
    _, ytop = lonlat_to_mercator(0.0, MAX_LAT)
    assert x180 == math.pi * 6378137.0
    assert abs(ytop - x180) < 1e-6
    # published EPSG:3857 value for (zoom-level tile math anchor)
    x, y = lonlat_to_mercator(-73.985656, 40.748433)  # ~ESB, NYC
    assert abs(x - -8236045.57) < 0.5
    assert abs(y - 4975306.29) < 0.5


def test_column_math_matches_python(spark):
    pts = [(float(lon), float(lat)) for lon in range(-170, 171, 20)
           for lat in range(-80, 81, 10)]
    df = spark.createDataFrame(pts, "lon double, lat double")
    rows = df.select(
        "lon", "lat",
        lon_to_merc_x(F.col("lon")).alias("x"),
        lat_to_merc_y(F.col("lat")).alias("y"),
    ).collect()
    for r in rows:
        px, py = lonlat_to_mercator(r.lon, r.lat)
        # x is pure multiplication -> bit equal; y goes through tan/ln,
        # where JVM Math and C libm may differ in the last ulp
        assert r.x == px
        assert math.isclose(r.y, py, rel_tol=1e-12, abs_tol=1e-6)
    back = df.select(
        "lon", "lat",
        merc_x_to_lon(lon_to_merc_x(F.col("lon"))).alias("lon2"),
        merc_y_to_lat(lat_to_merc_y(F.col("lat"))).alias("lat2"),
    ).collect()
    for r in back:
        assert abs(r.lon2 - r.lon) < 1e-9
        assert abs(r.lat2 - r.lat) < 1e-9


def test_bbox_cols_roundtrip(spark):
    df = spark.createDataFrame(
        [(1, -10.0, -20.0, 30.0, 40.0), (2, 100.0, 50.0, 120.0, 80.0)],
        "tile_id int, minx double, miny double, maxx double, maxy double",
    )
    merc = reproject_bbox_cols(df, "EPSG:4326", "EPSG:3857")
    back = reproject_bbox_cols(merc, "EPSG:3857", "EPSG:4326")
    for orig, r in zip(df.orderBy("tile_id").collect(),
                       back.orderBy("tile_id").collect()):
        for c in ("minx", "miny", "maxx", "maxy"):
            assert abs(r[c] - orig[c]) < 1e-9
    # monotonicity preserved: still a valid bbox after transform
    for r in merc.collect():
        assert r.minx < r.maxx and r.miny < r.maxy


def test_wkb_reproject_roundtrip():
    ring = [(-10.0, -10.0), (20.0, -5.0), (15.0, 25.0), (-10.0, -10.0)]
    wkb = wkb_polygon(ring)
    merc = reproject_wkb(wkb, "EPSG:4326", "EPSG:3857")
    back = reproject_wkb(merc, "EPSG:3857", "EPSG:4326")
    got = parse_wkb_polygons(back)[0]
    for (x0, y0), (x1, y1) in zip(ring, got):
        assert abs(x1 - x0) < 1e-9 and abs(y1 - y0) < 1e-9
    # and the mercator version really moved
    mring = parse_wkb_polygons(merc)[0]
    assert abs(mring[0][0] - -1113194.9079327357) < 1e-3


def test_tiles_for_bbox_mercator_query_equals_4326(spark):
    from flytemosaic_spark.operators.catalog import tiles_for_bbox

    tiles = spark.createDataFrame(
        [(i, float(lon), float(lat), float(lon + 10), float(lat + 10))
         for i, (lon, lat) in enumerate(
             (lo, la) for lo in range(-180, 180, 10) for la in range(-80, 80, 10)
         )],
        "tile_id int, minx double, miny double, maxx double, maxy double",
    )
    bbox4326 = (-25.0, -15.0, 42.0, 33.0)
    bbox3857 = reproject_bbox(bbox4326, "EPSG:4326", "EPSG:3857")
    a = sorted(r.tile_id for r in tiles_for_bbox(tiles, bbox4326).collect())
    b = sorted(
        r.tile_id
        for r in tiles_for_bbox(tiles, bbox3857, bbox_crs="EPSG:3857").collect()
    )
    assert a == b and len(a) > 0


def test_reproject_manifest_restamps_srs(spark):
    df = spark.createDataFrame(
        [("a", "EPSG:4326", -10.0, -10.0, 10.0, 10.0),
         ("b", "EPSG:3857", -1000.0, -1000.0, 1000.0, 1000.0)],
        "feature string, srs string, minx double, miny double, "
        "maxx double, maxy double",
    )
    out = {r.feature: r for r in reproject_manifest(df, "EPSG:3857").collect()}
    assert out["a"].srs == "EPSG:3857"
    px, py = lonlat_to_mercator(-10.0, -10.0)
    assert out["a"].minx == px and out["a"].miny == py
    # rows already in the target CRS pass through untouched
    assert out["b"].minx == -1000.0 and out["b"].maxy == 1000.0


def test_reproject_manifest_unsupported_srs_raises(spark):
    import pytest as _pytest

    df = spark.createDataFrame(
        [("a", "EPSG:32633", 0.0, 0.0, 1.0, 1.0)],
        "feature string, srs string, minx double, miny double, "
        "maxx double, maxy double",
    )
    with _pytest.raises(Exception, match="unsupported srs"):
        reproject_manifest(df, "EPSG:3857").collect()
