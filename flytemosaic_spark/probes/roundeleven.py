"""Round-11 probes: UTM, Albers, and Lambert-conformal reprojection.

The reference honors any caller-chosen CRS (reference flyte/build.py:183
``crs`` parameter, flytemosaic/mosaics.py:73 ``to_crs``); GLAD-style
deployments run in UTM zones. ``functions/crs.py`` implements the
6th-order Krüger series as pure column math, and these probes prove it
oracle-EXACT: the SAME expression tree is rendered to Spark Columns
and to DuckDB SQL by one shared builder (``_kruger_forward`` /
``_kruger_inverse`` over an abstract op set), so both engines evaluate
structurally identical IEEE arithmetic and the mm/nano-degree
quantization only has to absorb last-ulp libm differences.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flytemosaic_spark.functions.crs import (
    lonlat_to_utm_cols,
    utm_forward_sql,
    utm_inverse_sql,
    utm_to_lonlat_cols,
)
from flytemosaic_spark.operators.text import portable_round
from flytemosaic_spark.probes.registry import T, probe

# synthetic in-zone points from supplier keys: zone 33 spans 12..18 E
_PTS_SQL = """
    SELECT s_suppkey AS pt_id,
           12.0 + CAST((s_suppkey * 37) % 600 AS DOUBLE) / 100.0 AS lon,
           CAST((s_suppkey * 53) % 1500 AS DOUBLE) / 10.0 - 75.0 AS lat
    FROM supplier
"""
_F24_E, _F24_N = utm_forward_sql("lon", "lat", 33)

# synthetic easting/northing inside southern zone 33 (EPSG:32733)
_EN_SQL = """
    SELECT s_suppkey AS pt_id,
           200000.0 + CAST((s_suppkey * 41) % 600000 AS DOUBLE) AS easting,
           1500000.0 + CAST((s_suppkey * 59) % 8000000 AS DOUBLE)
               AS northing
    FROM supplier
"""
_F25_LON, _F25_LAT = utm_inverse_sql("easting", "northing", 33, south=True)


@probe(
    "f24_utm_forward",
    sql=f"""
        WITH pts AS ({_PTS_SQL})
        SELECT pt_id,
               floor(({_F24_E}) * 1000.0 + 0.5) / 1000.0 AS easting,
               floor(({_F24_N}) * 1000.0 + 0.5) / 1000.0 AS northing
        FROM pts
    """,
    note="WGS84 lon/lat -> UTM zone 33N (EPSG:32633) via the 6th-order "
    "Krüger series (functions/crs.py, the reference's to_crs for UTM "
    "deployments) as pure JVM column math — sub-mm vs an independent "
    "Redfearn-series implementation, validated in test_crs.py; the "
    "oracle SQL is RENDERED FROM THE SAME expression builder, so the "
    "two engines run identical IEEE trees and mm quantization absorbs "
    "last-ulp libm differences",
)
def f24_utm_forward(spark: SparkSession, sf: str) -> DataFrame:
    k = F.col("s_suppkey")
    pts = T(spark, sf, "supplier").select(
        k.alias("pt_id"),
        (
            F.lit(12.0) + ((k * 37) % 600).cast("double") / F.lit(100.0)
        ).alias("lon"),
        (
            ((k * 53) % 1500).cast("double") / F.lit(10.0) - F.lit(75.0)
        ).alias("lat"),
    )
    e, n = lonlat_to_utm_cols(F.col("lon"), F.col("lat"), 33)
    return pts.select(
        "pt_id",
        portable_round(e, 3).alias("easting"),
        portable_round(n, 3).alias("northing"),
    )


@probe(
    "f25_utm_inverse",
    sql=f"""
        WITH pts AS ({_EN_SQL})
        SELECT pt_id,
               floor(({_F25_LON}) * 1000000000.0 + 0.5) / 1000000000.0
                   AS lon,
               floor(({_F25_LAT}) * 1000000000.0 + 0.5) / 1000000000.0
                   AS lat
        FROM pts
    """,
    note="UTM zone 33S (EPSG:32733) easting/northing -> WGS84 lon/lat "
    "via the inverse Krüger series — the false-northing southern case; "
    "nano-degree (~0.1 mm) quantization, same shared-expression oracle "
    "contract as f24",
)
def f25_utm_inverse(spark: SparkSession, sf: str) -> DataFrame:
    k = F.col("s_suppkey")
    pts = T(spark, sf, "supplier").select(
        k.alias("pt_id"),
        (F.lit(200000.0) + ((k * 41) % 600000).cast("double")).alias(
            "easting"
        ),
        (F.lit(1500000.0) + ((k * 59) % 8000000).cast("double")).alias(
            "northing"
        ),
    )
    lon, lat = utm_to_lonlat_cols(
        F.col("easting"), F.col("northing"), 33, south=True
    )
    return pts.select(
        "pt_id",
        portable_round(lon, 9).alias("lon"),
        portable_round(lat, 9).alias("lat"),
    )


from flytemosaic_spark.functions.crs import (  # noqa: E402
    conic_forward_cols,
    conic_forward_sql,
    conic_inverse_cols,
    conic_inverse_sql,
)

# CONUS-ish synthetic points for Albers EPSG:5070
_ALBERS_PTS_SQL = """
    SELECT s_suppkey AS pt_id,
           -120.0 + CAST((s_suppkey * 37) % 5000 AS DOUBLE) / 100.0 AS lon,
           25.0 + CAST((s_suppkey * 53) % 2300 AS DOUBLE) / 100.0 AS lat
    FROM supplier
"""
_F26_X, _F26_Y = conic_forward_sql("lon", "lat", "EPSG:5070")

# Lambert-93 grid coords inside France's validity for the inverse
_LCC_PTS_SQL = """
    SELECT s_suppkey AS pt_id,
           200000.0 + CAST((s_suppkey * 41) % 1000000 AS DOUBLE) AS x,
           6200000.0 + CAST((s_suppkey * 59) % 900000 AS DOUBLE) AS y
    FROM supplier
"""
_F27_LON, _F27_LAT = conic_inverse_sql("x", "y", "EPSG:2154")


@probe(
    "f26_albers_forward",
    sql=f"""
        WITH pts AS ({_ALBERS_PTS_SQL})
        SELECT pt_id,
               floor(({_F26_X}) * 1000.0 + 0.5) / 1000.0 AS x,
               floor(({_F26_Y}) * 1000.0 + 0.5) / 1000.0 AS y
        FROM pts
    """,
    note="WGS84 lon/lat -> Albers equal-area EPSG:5070 (the NLCD/CONUS "
    "grid) via Snyder's ellipsoidal closed form as pure column math — "
    "the equal-area property is verified numerically in test_crs.py "
    "(projected Jacobian == ellipsoid area element to 2e-7); same "
    "shared-expression oracle contract as f24 (one builder renders "
    "the Spark Columns AND the DuckDB SQL), mm quantization",
)
def f26_albers_forward(spark: SparkSession, sf: str) -> DataFrame:
    k = F.col("s_suppkey")
    pts = T(spark, sf, "supplier").select(
        k.alias("pt_id"),
        (
            F.lit(-120.0) + ((k * 37) % 5000).cast("double") / F.lit(100.0)
        ).alias("lon"),
        (
            F.lit(25.0) + ((k * 53) % 2300).cast("double") / F.lit(100.0)
        ).alias("lat"),
    )
    x, y = conic_forward_cols(F.col("lon"), F.col("lat"), "EPSG:5070")
    return pts.select(
        "pt_id",
        portable_round(x, 3).alias("x"),
        portable_round(y, 3).alias("y"),
    )


@probe(
    "f27_lcc_inverse",
    sql=f"""
        WITH pts AS ({_LCC_PTS_SQL})
        SELECT pt_id,
               floor(({_F27_LON}) * 1000000000.0 + 0.5) / 1000000000.0
                   AS lon,
               floor(({_F27_LAT}) * 1000000000.0 + 0.5) / 1000000000.0
                   AS lat
        FROM pts
    """,
    note="Lambert-93 (EPSG:2154, LCC 2SP) grid coords -> lon/lat via "
    "the inverse conformal series with a FIXED-count unrolled "
    "iteration (5 rounds, no convergence branch — deterministic on "
    "both engines); conformality verified numerically in test_crs.py; "
    "nano-degree quantization",
)
def f27_lcc_inverse(spark: SparkSession, sf: str) -> DataFrame:
    k = F.col("s_suppkey")
    pts = T(spark, sf, "supplier").select(
        k.alias("pt_id"),
        (F.lit(200000.0) + ((k * 41) % 1000000).cast("double")).alias("x"),
        (F.lit(6200000.0) + ((k * 59) % 900000).cast("double")).alias("y"),
    )
    lon, lat = conic_inverse_cols(F.col("x"), F.col("y"), "EPSG:2154")
    return pts.select(
        "pt_id",
        portable_round(lon, 9).alias("lon"),
        portable_round(lat, 9).alias("lat"),
    )


@probe(
    "x221_video_metadata",
    sql="""
        SELECT s_suppkey AS media_id,
               320 + (s_suppkey * 37) % 1600 AS width,
               180 + (s_suppkey * 53) % 900 AS height,
               1000 + (s_suppkey * 97) % 600000 AS duration_ms,
               CASE s_suppkey % 3 WHEN 0 THEN 'avc1' WHEN 1 THEN 'hev1'
                    ELSE 'av01' END AS codec,
               1 + s_suppkey % 2 AS n_tracks
        FROM supplier
    """,
    note="video-container metadata scan (operators/multimodal.py:"
    "video_metadata over sources/mp4.py — the ffprobe-style pass a "
    "curation pipeline filters on BEFORE any decode): executors build "
    "REAL ISO-BMFF payloads whose metadata derives arithmetically from "
    "the key, then the box parser recovers width/height/duration/"
    "codec/track-count from the BYTES — the oracle recomputes the "
    "expected values, so the hash-compare proves the container "
    "round-trip, not just the arithmetic; payloads never shuffle "
    "(mapInPandas, one task end-to-end)",
)
def x221_video_metadata(spark: SparkSession, sf: str) -> DataFrame:
    from flytemosaic_spark.operators.multimodal import (
        synthesize_videos,
        video_metadata,
    )

    keys = T(spark, sf, "supplier").select("s_suppkey")
    return video_metadata(synthesize_videos(keys))
