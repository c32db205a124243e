"""Mosaic manifest builder — the Spark replacement for the reference's
GTI FlatGeobuf sink (S7).

The reference writes one `.gti.fgb` file per (datetime, feature) group
carrying raster metadata as layer metadata (DATA_TYPE, NODATA, bounds,
BAND_COUNT, RESX/RESY, SRS — reference flytemosaic/mosaics.py:20-113)
so that opening the mosaic later needs zero remote probing
(mosaics.py:33-39). Here the same information is a plain DataFrame in
MOSAIC_MANIFEST schema: planning stays a metadata-only query, and the
"file format" is any table format Spark writes (parquet here).

Validation mirrors the reference's single-dataset group check
(flyte/build.py:60-62): each (feature, datetime) group must be
homogeneous in dtype/band_count/resolution/srs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from flytemosaic_spark.schemas import MOSAIC_MANIFEST

_META_COLS = ["dtype", "nodata", "band_count", "resx", "resy", "srs"]


def build_manifest(
    features: DataFrame,
    dtype: str = "float32",
    nodata: str = "nan",
    band_count: int = 7,
    resx: float = 0.00025,
    resy: float = 0.00025,
    srs: str = "EPSG:4326",
) -> DataFrame:
    """Feature catalog ``(url, tile bbox, time, feature)`` → manifest
    rows with dataset-level raster metadata stamped on (the metadata
    the reference reads from the dataset protocol, protocols.py:139-170)."""
    out = features.select(
        "feature",
        F.col("time").alias("datetime"),
        "url",
        F.lit(dtype).alias("dtype"),
        F.lit(nodata).alias("nodata"),
        F.lit(band_count).alias("band_count"),
        F.lit(resx).alias("resx"),
        F.lit(resy).alias("resy"),
        F.lit(str(srs)).alias("srs"),
        "minx",
        "miny",
        "maxx",
        "maxy",
    )
    return out.select(*[f.name for f in MOSAIC_MANIFEST.fields])


def validate_groups(manifest: DataFrame) -> DataFrame:
    """One row per (feature, datetime) group with homogeneity checks
    and mosaic bounds — raises downstream if any group mixes metadata
    (the reference's W4 'should always be length 1' assertion,
    flyte/build.py:59-62, made a first-class plan step)."""
    agg = manifest.groupBy("feature", "datetime").agg(
        F.count("*").alias("n_sources"),
        *[F.countDistinct(c).alias(f"n_{c}") for c in _META_COLS],
        *[F.first(c).alias(c) for c in _META_COLS],
        F.min("minx").alias("minx"),
        F.min("miny").alias("miny"),
        F.max("maxx").alias("maxx"),
        F.max("maxy").alias("maxy"),
    )
    ok = F.lit(True)
    for c in _META_COLS:
        ok = ok & (F.col(f"n_{c}") == 1)
    return agg.withColumn("homogeneous", ok).drop(*[f"n_{c}" for c in _META_COLS])


def assert_homogeneous(manifest: DataFrame) -> DataFrame:
    groups = validate_groups(manifest)
    bad = groups.where(~F.col("homogeneous")).limit(5).collect()
    if bad:
        raise ValueError(
            "mixed raster metadata within group(s): "
            + ", ".join(f"({r.feature}, {r.datetime})" for r in bad)
        )
    return groups
