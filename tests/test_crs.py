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


# -- UTM / transverse Mercator (Krüger series) ------------------------------


def test_utm_anchors_and_roundtrip():
    import math

    from flytemosaic_spark.functions.crs import lonlat_to_utm, utm_to_lonlat

    # central meridian / equator: exactly the false easting, zero north
    assert lonlat_to_utm(15.0, 0.0, 33) == (500000.0, 0.0)
    # k0 x WGS84 meridian arc to 45N (published: 4984944.378 m)
    _, n45 = lonlat_to_utm(15.0, 45.0, 33)
    assert abs(n45 - 0.9996 * 4984944.378) < 0.005
    # southern hemisphere false northing
    e, n = lonlat_to_utm(15.0, -0.0001, 33, south=True)
    assert 9999980 < n < 10000000
    # round-trip at sub-mm over the zone and beyond (+-9 deg off-CM)
    worst = 0.0
    for lat in (-79.5, -30.0, 0.0, 5.0, 52.5, 84.0):
        for dlon in (-9.0, -3.0, 0.0, 1.0, 9.0):
            lon = 15.0 + dlon
            e, n = lonlat_to_utm(lon, lat, 33, south=lat < 0)
            lo, la = utm_to_lonlat(e, n, 33, south=lat < 0)
            worst = max(
                worst,
                abs(lo - lon) * 111320 * math.cos(math.radians(lat)),
                abs(la - lat) * 110574,
            )
    assert worst < 1e-3  # metres


def test_utm_matches_independent_redfearn_series():
    # cross-validate the Kruger series against the classic
    # Redfearn/Snyder expansion (an INDEPENDENT public derivation;
    # Redfearn itself is only good to ~mm inside a zone)
    import math

    from flytemosaic_spark.functions.crs import lonlat_to_utm

    a, f, k0 = 6378137.0, 1 / 298.257223563, 0.9996
    e2 = f * (2 - f)
    ep2 = e2 / (1 - e2)
    e4, e6 = e2 * e2, e2**3

    def redfearn(lon, lat, zone):
        lon0 = math.radians(zone * 6 - 183)
        phi, lam = math.radians(lat), math.radians(lon)
        nr = a / math.sqrt(1 - e2 * math.sin(phi) ** 2)
        t = math.tan(phi) ** 2
        c = ep2 * math.cos(phi) ** 2
        aa = (lam - lon0) * math.cos(phi)
        m = a * (
            (1 - e2 / 4 - 3 * e4 / 64 - 5 * e6 / 256) * phi
            - (3 * e2 / 8 + 3 * e4 / 32 + 45 * e6 / 1024) * math.sin(2 * phi)
            + (15 * e4 / 256 + 45 * e6 / 1024) * math.sin(4 * phi)
            - (35 * e6 / 3072) * math.sin(6 * phi)
        )
        x = k0 * nr * (
            aa
            + (1 - t + c) * aa**3 / 6
            + (5 - 18 * t + t * t + 72 * c - 58 * ep2) * aa**5 / 120
        ) + 500000
        y = k0 * (
            m
            + nr
            * math.tan(phi)
            * (
                aa * aa / 2
                + (5 - t + 9 * c + 4 * c * c) * aa**4 / 24
                + (61 - 58 * t + t * t + 600 * c - 330 * ep2) * aa**6 / 720
            )
        )
        return x, y

    for lat in (0.0, 10.0, 40.0, 52.5, 80.0):
        for dlon in (-2.9, 0.0, 1.5, 2.9):
            ke, kn = lonlat_to_utm(15.0 + dlon, lat, 33)
            re_, rn = redfearn(15.0 + dlon, lat, 33)
            assert abs(ke - re_) < 2e-3 and abs(kn - rn) < 2e-3


def test_utm_column_matches_python_twin(spark):
    from flytemosaic_spark.functions.crs import (
        lonlat_to_utm,
        lonlat_to_utm_cols,
        utm_to_lonlat_cols,
    )

    pts = [(i, 12.0 + i * 0.61, -70.0 + i * 15.5) for i in range(10)]
    df = spark.createDataFrame(pts, "id long, lon double, lat double")
    e, n = lonlat_to_utm_cols(F.col("lon"), F.col("lat"), 33)
    # compose through a projection, NOT nested column expressions: the
    # inverse references each input ~20x, so substituting the forward
    # tree in place explodes codegen (observed: JVM heap OOM)
    fwd = df.select("id", "lon", "lat", e.alias("e"), n.alias("n"))
    lo, la = utm_to_lonlat_cols(F.col("e"), F.col("n"), 33)
    rows = fwd.select(
        "id", "lon", "lat", "e", "n", lo.alias("lo"), la.alias("la")
    ).collect()
    for r in rows:
        pe, pn = lonlat_to_utm(r.lon, r.lat, 33)
        assert abs(r.e - pe) < 1e-6 and abs(r.n - pn) < 1e-6  # libm ulps
        assert abs(r.lo - r.lon) < 1e-9 and abs(r.la - r.lat) < 1e-9


def test_utm_bbox_envelope(spark):
    # UTM is not axis-separable: the reprojected bbox must CONTAIN the
    # projected corners and edges (conservative superset for the prune)
    from flytemosaic_spark.functions.crs import (
        lonlat_to_utm,
        reproject_bbox,
        reproject_bbox_cols,
    )

    bbox = (13.0, 40.0, 17.0, 50.0)
    env = reproject_bbox(bbox, "EPSG:4326", "EPSG:32633")
    # densified boundary points all fall inside the envelope
    for i in range(41):
        t = i / 40.0
        for lon, lat in (
            (13.0 + 4 * t, 40.0), (13.0 + 4 * t, 50.0),
            (13.0, 40.0 + 10 * t), (17.0, 40.0 + 10 * t),
        ):
            e, n = lonlat_to_utm(lon, lat, 33)
            assert env[0] <= e <= env[2] and env[1] <= n <= env[3]
    # equator-straddling box: easting extremes sit ON the equator
    # (edge interior), not at corners
    ebox = (11.0, -5.0, 13.0, 8.0)
    env2 = reproject_bbox(ebox, "EPSG:4326", "EPSG:32633")
    for i in range(41):
        t = i / 40.0
        for lon, lat in (
            (11.0, -5.0 + 13 * t), (13.0, -5.0 + 13 * t),
            (11.0 + 2 * t, -5.0), (11.0 + 2 * t, 8.0),
        ):
            e, n = lonlat_to_utm(lon, lat, 33)
            assert env2[0] <= e <= env2[2] and env2[1] <= n <= env2[3]
    # Column version agrees with the plan-time twin
    df = spark.createDataFrame([bbox], "minx double, miny double, "
                               "maxx double, maxy double")
    row = reproject_bbox_cols(df, "EPSG:4326", "EPSG:32633").collect()[0]
    assert abs(row.minx - env[0]) < 1e-6 and abs(row.maxy - env[3]) < 1e-6


def test_utm_wkb_reprojection():
    from flytemosaic_spark.functions.crs import reproject_wkb
    from flytemosaic_spark.functions.crs import lonlat_to_utm, utm_to_lonlat
    from flytemosaic_spark.functions.geometry import (
        parse_wkb_polygon_rings,
        wkb_polygon,
    )

    poly = wkb_polygon(
        [(13.0, 45.0), (16.0, 45.0), (16.0, 48.0), (13.0, 48.0)],
        holes=[[(14.0, 46.0), (15.0, 46.0), (15.0, 47.0), (14.0, 47.0)]],
    )
    utm = reproject_wkb(poly, "EPSG:4326", "EPSG:32633")
    rings = parse_wkb_polygon_rings(utm)[0]
    assert len(rings) == 2  # hole structure preserved
    for ring, src in zip(
        rings,
        [
            [(13.0, 45.0), (16.0, 45.0), (16.0, 48.0), (13.0, 48.0)],
            [(14.0, 46.0), (15.0, 46.0), (15.0, 47.0), (14.0, 47.0)],
        ],
    ):
        for (e, n), (lon, lat) in zip(ring, src):
            pe, pn = lonlat_to_utm(lon, lat, 33)
            assert abs(e - pe) < 1e-9 and abs(n - pn) < 1e-9
    # and back
    back = reproject_wkb(utm, "EPSG:32633", "EPSG:4326")
    rr = parse_wkb_polygon_rings(back)[0]
    assert abs(rr[0][0][0] - 13.0) < 1e-9 and abs(rr[0][0][1] - 45.0) < 1e-9


def test_utm_epsg_parsing_and_errors():
    import pytest as _pytest

    from flytemosaic_spark.functions.crs import (
        parse_utm_epsg,
        reproject_bbox,
    )

    assert parse_utm_epsg("EPSG:32633") == (33, False)
    assert parse_utm_epsg("EPSG:32733") == (33, True)
    with _pytest.raises(ValueError):
        parse_utm_epsg("EPSG:32661")  # polar stereographic, not UTM
    with _pytest.raises(ValueError, match="only from/to"):
        reproject_bbox((0, 0, 1, 1), "EPSG:3857", "EPSG:32633")


# -- Conic projections (Albers equal-area, Lambert conformal) ---------------


def _ellipsoid_MN(lat, f=1 / 298.257222101, a=6378137.0):
    import math

    e2 = f * (2 - f)
    s = math.sin(math.radians(lat))
    w = math.sqrt(1 - e2 * s * s)
    return a * (1 - e2) / w**3, a / w


def test_albers_equal_area_property():
    # the DEFINING property, checked numerically everywhere: projected
    # Jacobian determinant == ellipsoid area element
    import math

    from flytemosaic_spark.functions.crs import conic_forward

    assert conic_forward(-96.0, 23.0, "EPSG:5070") == (0.0, 0.0)
    d = 1e-4
    for lat in (25.0, 30.0, 37.0, 45.0, 48.0):
        for lon in (-120.0, -96.0, -75.0):
            p00 = conic_forward(lon, lat, "EPSG:5070")
            p10 = conic_forward(lon + d, lat, "EPSG:5070")
            p01 = conic_forward(lon, lat + d, "EPSG:5070")
            ax = (p10[0] - p00[0], p10[1] - p00[1])
            ay = (p01[0] - p00[0], p01[1] - p00[1])
            proj = abs(ax[0] * ay[1] - ax[1] * ay[0])
            m_r, n_r = _ellipsoid_MN(lat)
            true = (
                m_r * n_r * math.cos(math.radians(lat))
                * math.radians(d) ** 2
            )
            assert abs(proj / true - 1) < 1e-5


def test_lcc_conformality_and_standard_parallels():
    # conformal: meridian scale == parallel scale everywhere;
    # scale == 1 exactly on the two standard parallels
    import math

    from flytemosaic_spark.functions.crs import conic_forward

    x0, y0 = conic_forward(3.0, 46.5, "EPSG:2154")
    assert (x0, y0) == (700000.0, 6600000.0)
    d = 1e-4
    for lat in (42.0, 44.0, 46.5, 49.0, 51.0):
        for lon in (-1.0, 3.0, 7.5):
            p00 = conic_forward(lon, lat, "EPSG:2154")
            p10 = conic_forward(lon + d, lat, "EPSG:2154")
            p01 = conic_forward(lon, lat + d, "EPSG:2154")
            m_r, n_r = _ellipsoid_MN(lat)
            kp = math.hypot(p10[0] - p00[0], p10[1] - p00[1]) / (
                n_r * math.cos(math.radians(lat)) * math.radians(d)
            )
            km = math.hypot(p01[0] - p00[0], p01[1] - p00[1]) / (
                m_r * math.radians(d)
            )
            assert abs(kp / km - 1) < 1e-5
            if lat in (44.0, 49.0):
                assert abs(kp - 1) < 1e-5


def test_conic_roundtrip_and_column_twin(spark):
    import math

    from flytemosaic_spark.functions.crs import (
        conic_forward,
        conic_forward_cols,
        conic_inverse,
        conic_inverse_cols,
    )

    for crs, pts in [
        ("EPSG:5070", [(-120.0, 25.0), (-96.0, 40.0), (-70.0, 48.0)]),
        ("EPSG:2154", [(-4.0, 42.0), (3.0, 46.5), (8.0, 51.0)]),
    ]:
        for lon, lat in pts:
            x, y = conic_forward(lon, lat, crs)
            lo, la = conic_inverse(x, y, crs)
            dm = math.hypot(
                (lo - lon) * 111320 * math.cos(math.radians(lat)),
                (la - lat) * 110574,
            )
            # chi-series truncation leaves ~3 um at the LCC zone edge
            assert dm < 1e-4
    df = spark.createDataFrame(
        [(i, -110.0 + i * 7.1, 27.0 + i * 3.3) for i in range(6)],
        "id long, lon double, lat double",
    )
    x, y = conic_forward_cols(F.col("lon"), F.col("lat"), "EPSG:5070")
    fwd = df.select("id", "lon", "lat", x.alias("x"), y.alias("y"))
    lo, la = conic_inverse_cols(F.col("x"), F.col("y"), "EPSG:5070")
    rows = fwd.select("lon", "lat", lo.alias("lo"), la.alias("la")).collect()
    for r in rows:
        assert abs(r.lo - r.lon) < 1e-9 and abs(r.la - r.lat) < 1e-9


def test_conic_bbox_envelope_and_wkb():
    # conic bboxes use the projected envelope: densified boundary
    # points must all fall inside, including a CM-straddling box
    from flytemosaic_spark.functions.crs import (
        conic_forward,
        reproject_bbox,
        reproject_wkb,
    )
    from flytemosaic_spark.functions.geometry import (
        parse_wkb_polygon_rings,
        wkb_polygon,
    )

    bbox = (-101.0, 30.0, -90.0, 45.0)  # straddles lon0 = -96
    env = reproject_bbox(bbox, "EPSG:4326", "EPSG:5070")
    for i in range(41):
        t = i / 40.0
        for lon, lat in (
            (-101.0 + 11 * t, 30.0), (-101.0 + 11 * t, 45.0),
            (-101.0, 30.0 + 15 * t), (-90.0, 30.0 + 15 * t),
        ):
            x, y = conic_forward(lon, lat, "EPSG:5070")
            assert env[0] <= x <= env[2] and env[1] <= y <= env[3]
    # WKB point-wise conic reprojection round-trips
    poly = wkb_polygon([(-100.0, 32.0), (-92.0, 32.0), (-92.0, 42.0)])
    back = reproject_wkb(
        reproject_wkb(poly, "EPSG:4326", "EPSG:5070"),
        "EPSG:5070", "EPSG:4326",
    )
    ring = parse_wkb_polygon_rings(back)[0][0]
    assert abs(ring[0][0] - -100.0) < 1e-8 and abs(ring[0][1] - 32.0) < 1e-8


def test_reproject_manifest_utm_and_conic_targets(spark):
    import pytest as _pytest

    from flytemosaic_spark.functions.crs import (
        conic_forward,
        lonlat_to_utm,
        reproject_manifest,
    )

    df = spark.createDataFrame(
        [("a", "EPSG:4326", 14.0, 46.0, 15.0, 47.0),
         ("b", "EPSG:32633", 400000.0, 5000000.0, 500000.0, 5100000.0)],
        "feature string, srs string, minx double, miny double, "
        "maxx double, maxy double",
    )
    out = {r.feature: r for r in reproject_manifest(df, "EPSG:32633").collect()}
    assert out["a"].srs == "EPSG:32633"
    # the envelope contains all four projected corners
    for lon, lat in ((14, 46), (14, 47), (15, 46), (15, 47)):
        e, n = lonlat_to_utm(float(lon), float(lat), 33)
        assert out["a"].minx <= e <= out["a"].maxx
        assert out["a"].miny <= n <= out["a"].maxy
    # rows already in the target pass through untouched
    assert out["b"].minx == 400000.0 and out["b"].maxy == 5100000.0
    # conic target works the same way
    df2 = spark.createDataFrame(
        [("c", "EPSG:4326", -98.0, 35.0, -95.0, 38.0)],
        "feature string, srs string, minx double, miny double, "
        "maxx double, maxy double",
    )
    row = reproject_manifest(df2, "EPSG:5070").collect()[0]
    x, y = conic_forward(-96.0, 35.0, "EPSG:5070")  # CM-clamped bottom
    assert row.miny <= y
    # a 3857-srs row under a UTM target raises (unsupported srs)
    df3 = spark.createDataFrame(
        [("d", "EPSG:3857", 0.0, 0.0, 1.0, 1.0)],
        "feature string, srs string, minx double, miny double, "
        "maxx double, maxy double",
    )
    with _pytest.raises(Exception, match="unsupported srs"):
        reproject_manifest(df3, "EPSG:32633").collect()


def test_polar_stereographic_epsg_worked_example():
    """EPSG guidance note 7-2, Polar Stereographic variant B worked
    example (Australian Antarctic: phi_F=-71, lon0=70E, FE=FN=6000km):
    forward must match to sub-mm, inverse to sub-micro-degree."""
    from flytemosaic_spark.functions import crs

    crs.CONIC_PRESETS["_TEST:3032"] = ("stere", dict(
        lat_ts=-71.0, lon0=70.0, fe=6000000.0, fn=6000000.0,
        asp=-1.0, f=1.0 / 298.257223563))
    try:
        x, y = crs.conic_forward(120.0, -75.0, "_TEST:3032")
        assert abs(x - 7255380.79) < 1e-2
        assert abs(y - 7053389.56) < 1e-2
        lon, lat = crs.conic_inverse(7255380.79, 7053389.56, "_TEST:3032")
        assert abs(lon - 120.0) < 1e-6 and abs(lat + 75.0) < 1e-6
    finally:
        del crs.CONIC_PRESETS["_TEST:3032"]


def test_polar_stereographic_roundtrip_both_aspects():
    import math

    from flytemosaic_spark.functions.crs import conic_forward, conic_inverse

    for crs_id, lats in [
        ("EPSG:3031", range(-89, -55, 4)),
        ("EPSG:3413", range(55, 90, 4)),
    ]:
        for lon in range(-180, 181, 30):
            for lat in lats:
                x, y = conic_forward(float(lon), float(lat), crs_id)
                lo, la = conic_inverse(x, y, crs_id)
                dlon = abs((lo - lon + 180.0) % 360.0 - 180.0)
                assert abs(la - lat) < 1e-9
                assert dlon * math.cos(math.radians(lat)) < 1e-9


def test_polar_stereographic_geometry_properties():
    """True scale at the standard parallel; meridians are straight
    rays from the pole (angle == lon - lon0)."""
    import math

    from flytemosaic_spark.functions.crs import conic_forward

    # scale at lat_ts: ds_projected / ds_true == 1 along the parallel
    e2 = (2 - 1 / 298.257223563) / 298.257223563
    for crs_id, lat_ts in [("EPSG:3031", -71.0), ("EPSG:3413", 70.0)]:
        d = 1e-4
        x0, y0 = conic_forward(10.0, lat_ts, crs_id)
        x1, y1 = conic_forward(10.0 + d, lat_ts, crs_id)
        phi = math.radians(lat_ts)
        # true arc length along the parallel
        nu = 6378137.0 / math.sqrt(1 - e2 * math.sin(phi) ** 2)
        ds_true = nu * math.cos(phi) * math.radians(d)
        ds_proj = math.hypot(x1 - x0, y1 - y0)
        assert abs(ds_proj / ds_true - 1.0) < 1e-9
    # meridian azimuth (south aspect): theta == lon - lon0
    x, y = conic_forward(37.0, -80.0, "EPSG:3031")
    assert abs(math.degrees(math.atan2(x, y)) - 37.0) < 1e-9


def test_sinusoidal_modis_grid():
    """Equal-area property + the MODIS h/v tile derivation."""
    import math

    from flytemosaic_spark.functions.crs import conic_forward, conic_inverse

    R_S = 6371007.181
    # world width at the equator is 2*pi*R
    x, _ = conic_forward(180.0, 0.0, "SR-ORG:6974")
    assert abs(x - math.pi * R_S) < 1e-6
    # equal-area: the Jacobian of (lon,lat)->(x,y) is R^2 cos(phi)
    for lon, lat in [(-93.0, 45.0), (10.0, -60.0), (140.0, 5.0)]:
        d = 1e-5
        p00 = conic_forward(lon, lat, "SR-ORG:6974")
        p10 = conic_forward(lon + d, lat, "SR-ORG:6974")
        p01 = conic_forward(lon, lat + d, "SR-ORG:6974")
        jac = abs(
            (p10[0] - p00[0]) * (p01[1] - p00[1])
            - (p01[0] - p00[0]) * (p10[1] - p00[1])
        ) / math.radians(d) ** 2
        expect = R_S * R_S * math.cos(math.radians(lat))
        assert abs(jac / expect - 1.0) < 1e-4
        lo, la = conic_inverse(*p00, "SR-ORG:6974")
        assert abs(lo - lon) < 1e-9 and abs(la - lat) < 1e-9
    # Minneapolis lands in MODIS tile h11v04
    x, y = conic_forward(-93.3430, 44.9778, "SR-ORG:6974")
    h = int((x + math.pi * R_S) // (2 * math.pi * R_S / 36))
    v = int((math.pi / 2 * R_S - y) // (math.pi * R_S / 18))
    assert (h, v) == (11, 4)


def test_polar_and_sinu_bbox_envelope():
    """Projected envelopes must contain every densified boundary
    point — including boxes spanning ALL longitudes around the pole
    (the theta=+/-90 and 180 extremes live on edge interiors) and
    equator-straddling sinusoidal boxes."""
    from flytemosaic_spark.functions.crs import conic_forward, reproject_bbox

    cases = [
        ("EPSG:3031", (-180.0, -85.0, 180.0, -65.0)),
        ("EPSG:3031", (100.0, -80.0, 170.0, -70.0)),
        ("EPSG:3413", (-120.0, 60.0, 30.0, 85.0)),
        ("SR-ORG:6974", (-30.0, -20.0, 40.0, 35.0)),  # straddles equator
        ("SR-ORG:6974", (120.0, 10.0, 179.0, 70.0)),
    ]
    for crs_id, bbox in cases:
        env = reproject_bbox(bbox, "EPSG:4326", crs_id)
        for i in range(81):
            t = i / 80.0
            edges = [
                (bbox[0] + (bbox[2] - bbox[0]) * t, bbox[1]),
                (bbox[0] + (bbox[2] - bbox[0]) * t, bbox[3]),
                (bbox[0], bbox[1] + (bbox[3] - bbox[1]) * t),
                (bbox[2], bbox[1] + (bbox[3] - bbox[1]) * t),
            ]
            for lon, lat in edges:
                x, y = conic_forward(lon, lat, crs_id)
                assert env[0] - 1e-6 <= x <= env[2] + 1e-6, (crs_id, lon, lat)
                assert env[1] - 1e-6 <= y <= env[3] + 1e-6, (crs_id, lon, lat)


def test_polar_inverse_bbox_envelope():
    """Inverse direction: a projected box around the pole maps to a
    lon/lat envelope containing all densified boundary points (the
    fe/fn axis crossings are edge-interior extremes)."""
    from flytemosaic_spark.functions.crs import conic_inverse, reproject_bbox

    for crs_id in ("EPSG:3031", "EPSG:3413"):
        bbox = (-2500000.0, -1500000.0, 1200000.0, 2200000.0)
        env = reproject_bbox(bbox, crs_id, "EPSG:4326")
        for i in range(81):
            t = i / 80.0
            for x, y in [
                (bbox[0] + (bbox[2] - bbox[0]) * t, bbox[1]),
                (bbox[0] + (bbox[2] - bbox[0]) * t, bbox[3]),
                (bbox[0], bbox[1] + (bbox[3] - bbox[1]) * t),
                (bbox[2], bbox[1] + (bbox[3] - bbox[1]) * t),
            ]:
                lon, lat = conic_inverse(x, y, crs_id)
                # inverse lon lives on the lon0±180 branch; the
                # envelope is folded to normalized space — compare
                # modulo 360
                ln = (lon + 180.0) % 360.0 - 180.0
                ok = any(
                    env[0] - 1e-9 <= ln + s <= env[2] + 1e-9
                    for s in (-360.0, 0.0, 360.0)
                )
                assert ok, (crs_id, x, y, lon, env)
                assert env[1] - 1e-9 <= lat <= env[3] + 1e-9, (crs_id, x, y)


# -- r7: datum-shifted national grids (tmerc/lcc1 + Helmert) ---------------


def test_osgb_os_worked_example():
    """The Ordnance Survey worked example ('A guide to coordinate
    systems in Great Britain'): OSGB36 geographic 52°39'27.2531"N,
    1°43'4.5177"E -> National Grid E 651409.903, N 313177.270 —
    anchors the generic-tmerc Krüger reuse (Airy 1830, lat0 49N,
    k0 0.9996012717) to 0.1 mm."""
    from flytemosaic_spark.functions.crs import conic_forward

    lat = 52 + 39 / 60 + 27.2531 / 3600
    lon = 1 + 43 / 60 + 4.5177 / 3600
    e, n = conic_forward(lon, lat, "EPSG:27700")
    assert abs(e - 651409.903) < 5e-4
    assert abs(n - 313177.270) < 5e-4


def test_tmerc_lcc1_origins_and_roundtrips():
    from flytemosaic_spark.functions.crs import conic_forward, conic_inverse

    # true origins land exactly on the false easting/northing
    e, n = conic_forward(-2.0, 49.0, "EPSG:27700")
    assert abs(e - 400000.0) < 1e-6 and abs(n + 100000.0) < 1e-5
    lon0 = 2 + 20 / 60 + 14.025 / 3600  # Paris meridian
    e, n = conic_forward(lon0, 46.8, "EPSG:27572")
    assert abs(e - 600000.0) < 1e-6 and abs(n - 2200000.0) < 1e-5
    for crs_name, pt in (
        ("EPSG:27700", (-4.2, 57.5)),
        ("EPSG:27700", (0.5, 50.8)),
        ("EPSG:27572", (-1.0, 44.0)),
        ("EPSG:27572", (7.5, 49.2)),
    ):
        x, y = conic_forward(*pt, crs_name)
        lo, la = conic_inverse(x, y, crs_name)
        assert abs(lo - pt[0]) < 1e-9 and abs(la - pt[1]) < 1e-9


def test_lcc1_scale_factor_at_origin():
    """1SP Lambert: the scale factor AT lat0 is k0 (0.99987742 for
    Lambert zone II) — measured as projected/ellipsoidal distance
    along the parallel."""
    import math

    from flytemosaic_spark.functions.crs import CONIC_PRESETS, conic_forward

    p = CONIC_PRESETS["EPSG:27572"][1]
    a, f = p["a"], p["f"]
    e2 = f * (2 - f)
    lat = p["lat0"]
    dlon = 0.01
    x1, y1 = conic_forward(3.0, lat, "EPSG:27572")
    x2, y2 = conic_forward(3.0 + dlon, lat, "EPSG:27572")
    ground = (
        a
        * math.cos(math.radians(lat))
        / math.sqrt(1 - e2 * math.sin(math.radians(lat)) ** 2)
        * math.radians(dlon)
    )
    k = math.hypot(x2 - x1, y2 - y1) / ground
    assert abs(k - p["k0"]) < 1e-6


def test_helmert_roundtrip_and_magnitude():
    from flytemosaic_spark.functions.crs import datum_shift

    for datum, pt, max_m in (
        ("OSGB36", (-1.0, 52.0), 150.0),
        ("NTF", (2.5, 48.8), 150.0),
    ):
        lo, la = datum_shift(*pt, datum)
        # the national shifts are tens-to-~120 m, never zero
        dm = ((lo - pt[0]) * 70000) ** 2 + ((la - pt[1]) * 111000) ** 2
        assert 10.0**2 < dm < max_m**2
        back = datum_shift(lo, la, datum, inverse=True)
        # EPSG 9606 sign-negation inverse: sub-cm closure
        assert abs(back[0] - pt[0]) < 1e-6
        assert abs(back[1] - pt[1]) < 1e-6


def test_datum_project_df_matches_python_twin(spark):
    """The four materializing select stages compute the same numbers
    as the float composition (and stay four narrow projections — the
    CollapseProject guard)."""
    from flytemosaic_spark.functions.crs import (
        conic_forward,
        datum_project_df,
        datum_shift,
        datum_unproject_df,
    )

    pts = [(-3.1, 51.4), (-0.2, 53.0), (1.1, 52.5)]
    df = spark.createDataFrame(pts, "lon double, lat double")
    rows = {
        (r.lon, r.lat): (r.x, r.y)
        for r in datum_project_df(df, "lon", "lat", "EPSG:27700").collect()
    }
    for lon, lat in pts:
        ll = datum_shift(lon, lat, "OSGB36")
        want = conic_forward(*ll, "EPSG:27700")
        got = rows[(lon, lat)]
        assert abs(got[0] - want[0]) < 1e-6
        assert abs(got[1] - want[1]) < 1e-6
    # inverse df stage chain closes the loop back to WGS84
    prj = spark.createDataFrame(
        [rows[p] for p in pts], "x double, y double"
    )
    back = {
        i: (r.lon, r.lat)
        for i, r in enumerate(
            datum_unproject_df(prj, "x", "y", "EPSG:27700").collect()
        )
    }
    got_back = sorted(back.values())
    for (blon, blat), (lon, lat) in zip(got_back, sorted(pts)):
        assert abs(blon - lon) < 1e-6 and abs(blat - lat) < 1e-6


def test_datum_preset_bbox_plan_time_and_column_guard(spark):
    import pytest

    from flytemosaic_spark.functions.crs import (
        conic_forward,
        datum_shift,
        reproject_bbox,
        reproject_bbox_cols,
    )

    box = (-2.5, 51.0, -0.5, 53.0)
    env = reproject_bbox(box, "EPSG:4326", "EPSG:27700")
    # every dense-sampled interior point must fall inside the padded
    # envelope (prefilter superset property, datum shift included)
    for i in range(9):
        for j in range(9):
            lon = box[0] + (box[2] - box[0]) * i / 8
            lat = box[1] + (box[3] - box[1]) * j / 8
            x, y = conic_forward(*datum_shift(lon, lat, "OSGB36"),
                                 "EPSG:27700")
            assert env[0] <= x <= env[2] and env[1] <= y <= env[3]
    df = spark.createDataFrame([box], "minx double, miny double, "
                               "maxx double, maxy double")
    with pytest.raises(Exception, match="datum_project_df"):
        reproject_bbox_cols(df, "EPSG:4326", "EPSG:27700").collect()


def test_nad27_utm_preset_is_pure_data():
    """EPSG:26714 (NAD27 / UTM 14N) landed with ZERO new code — the
    tmerc core on the Clarke 1866 ellipsoid + the classic CONUS
    3-parameter shift. UTM structure sanity: the zone-14 central
    meridian (99W) maps to easting 500000 exactly, the equator to
    northing 0; a Texas point round-trips; and the NAD27 datum shift
    is tens of meters with the documented sign (NAD27->WGS84 moves
    points by towgs84 = (-8, 160, 176))."""
    from flytemosaic_spark.functions.crs import (
        conic_forward,
        conic_inverse,
        datum_shift,
    )

    e, n = conic_forward(-99.0, 0.0, "EPSG:26714")
    assert abs(e - 500000.0) < 1e-6 and abs(n) < 1e-6
    pt = (-97.74, 30.27)  # Austin, in NAD27 geographic terms
    x, y = conic_forward(*pt, "EPSG:26714")
    assert 550000 < x < 650000 and 3300000 < y < 3400000
    lo, la = conic_inverse(x, y, "EPSG:26714")
    assert abs(lo - pt[0]) < 1e-9 and abs(la - pt[1]) < 1e-9
    wlon, wlat = pt
    nlon, nlat = datum_shift(wlon, wlat, "NAD27")
    dm2 = ((nlon - wlon) * 96000) ** 2 + ((nlat - wlat) * 111000) ** 2
    assert 10**2 < dm2 < 300**2
    back = datum_shift(nlon, nlat, "NAD27", inverse=True)
    assert abs(back[0] - wlon) < 1e-6 and abs(back[1] - wlat) < 1e-6


class TestNtv2:
    """NTv2 grid-shift stage: .gsb container round-trip, node
    exactness, bilinear linearity, out-of-grid passthrough, and the
    Spark/py twin agreement."""

    @staticmethod
    def _fixture():
        import numpy as np

        nlat, nlon = 5, 7
        la = np.array(
            [[(3 * i + 5 * j) % 7 * 0.0625 for j in range(nlon)]
             for i in range(nlat)]
        )
        lo = np.array(
            [[(2 * i + 3 * j) % 5 * 0.125 for j in range(nlon)]
             for i in range(nlat)]
        )
        meta = dict(
            s_lat=50 * 3600.0, n_lat=51 * 3600.0,
            e_long=6.5 * 3600.0, w_long=8.0 * 3600.0,
            lat_inc=900.0, long_inc=900.0,
        )
        return meta, la, lo

    def test_gsb_round_trip(self):
        import numpy as np

        from flytemosaic_spark.functions.crs import (
            parse_ntv2_gsb,
            write_ntv2_gsb,
        )

        meta, la, lo = self._fixture()
        m2, la2, lo2 = parse_ntv2_gsb(write_ntv2_gsb(meta, la, lo))
        assert np.array_equal(la2, la.astype("f4"))
        assert np.array_equal(lo2, lo.astype("f4"))
        assert m2["nlat"] == 5 and m2["nlon"] == 7

    def test_gsb_rejects_garbage(self):
        import pytest as _pytest

        from flytemosaic_spark.functions.crs import parse_ntv2_gsb

        with _pytest.raises(ValueError, match="NUM_OREC"):
            parse_ntv2_gsb(b"\x00" * 64)

    @staticmethod
    def _grid():
        from flytemosaic_spark.functions.crs import (
            gsb_to_grid,
            parse_ntv2_gsb,
            write_ntv2_gsb,
        )

        meta, la, lo = TestNtv2._fixture()
        gm, rows = gsb_to_grid(*parse_ntv2_gsb(write_ntv2_gsb(meta, la, lo)))
        nodes = {(i, j): (sla, slo) for i, j, sla, slo in rows}
        return gm, rows, nodes

    def test_exact_at_nodes(self):
        from flytemosaic_spark.functions.crs import ntv2_shift_py

        gm, rows, nodes = self._grid()
        # interior nodes: interpolation must return the node value
        for i, j, sla, slo in rows:
            if i >= gm["nlat"] - 1 or j >= gm["nlon"] - 1:
                continue
            lon = gm["lon0"] + j * gm["dlon"]
            lat = gm["lat0"] + i * gm["dlat"]
            lon2, lat2 = ntv2_shift_py(lon, lat, gm, nodes)
            assert lat2 == lat + sla / 3600.0
            assert lon2 == lon + slo / 3600.0

    def test_linear_between_nodes(self):
        from flytemosaic_spark.functions.crs import ntv2_shift_py

        gm, rows, nodes = self._grid()
        # midpoint along one axis = mean of the two node shifts
        lon = gm["lon0"] + 2 * gm["dlon"]
        lat = gm["lat0"] + 1.5 * gm["dlat"]
        _, lat2 = ntv2_shift_py(lon, lat, gm, nodes)
        want = (nodes[(1, 2)][0] + nodes[(2, 2)][0]) / 2.0
        assert lat2 == lat + want / 3600.0

    def test_out_of_grid_passthrough(self):
        from flytemosaic_spark.functions.crs import ntv2_shift_py

        gm, rows, nodes = self._grid()
        assert ntv2_shift_py(-20.0, 10.0, gm, nodes) == (-20.0, 10.0)

    def test_spark_matches_py_twin(self, spark):
        from flytemosaic_spark.functions.crs import (
            ntv2_cells,
            ntv2_shift_df,
            ntv2_shift_py,
        )

        gm, rows, nodes = self._grid()
        nodes_df = spark.createDataFrame(
            rows, "i long, j long, s_lat_sec double, s_lon_sec double"
        )
        cells = ntv2_cells(nodes_df)
        pts = [
            (k, gm["lon0"] + 0.011 + k * 0.173, gm["lat0"] + 0.017 + k * 0.111)
            for k in range(8)
        ] + [(100, -20.0, 10.0)]
        df = spark.createDataFrame(
            pts, "point_id long, lon double, lat double"
        )
        out = {
            r["point_id"]: r
            for r in ntv2_shift_df(df, "lon", "lat", cells, gm).collect()
        }
        for pid, lon, lat in pts:
            lon2, lat2 = ntv2_shift_py(lon, lat, gm, nodes)
            assert out[pid]["lon_out"] == lon2, pid
            assert out[pid]["lat_out"] == lat2, pid
        assert out[100]["in_grid"] == 0
        assert out[0]["in_grid"] == 1
