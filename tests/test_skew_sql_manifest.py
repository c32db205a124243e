"""Salted aggregation/join equivalence, the SQL frontend, and the
mosaic-manifest builder (S7) with group-homogeneity validation."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from flytemosaic_spark.fixtures import tile_grid
from flytemosaic_spark.operators.catalog import feature_targets
from flytemosaic_spark.operators.manifest import (
    assert_homogeneous,
    build_manifest,
    validate_groups,
)
from flytemosaic_spark.operators.skew import salted_agg, salted_join
from flytemosaic_spark.sql import sql


def test_salted_agg_equals_plain_agg(spark):
    # one pathologically hot key + a uniform tail
    df = spark.range(100_000).select(
        F.when(F.col("id") < 90_000, F.lit("HOT")).otherwise(
            F.concat(F.lit("k"), (F.col("id") % 97).cast("string"))
        ).alias("k"),
        (F.col("id") % 1000).alias("value"),
    )
    want = {
        (r.k): (r.n, r.tot, r.mx)
        for r in df.groupBy("k")
        .agg(F.count("*").alias("n"), F.sum("value").alias("tot"), F.max("value").alias("mx"))
        .collect()
    }
    got = {
        (r.k): (r.n, r.tot, r.mx)
        for r in salted_agg(
            df,
            ["k"],
            {
                "n": (F.count("*"), F.sum("n")),
                "tot": (F.sum("value"), F.sum("tot")),
                "mx": (F.max("value"), F.max("mx")),
            },
        ).collect()
    }
    assert got == want


def test_salted_join_equals_plain_join(spark):
    big = spark.range(50_000).select(
        (F.col("id") % 10).alias("k"), F.col("id").alias("v")
    )
    small = spark.range(10).select(
        F.col("id").alias("k"), (F.col("id") * 100).alias("w")
    )
    want = big.join(small, ["k"]).agg(
        F.count("*").alias("n"), F.sum(F.col("v") + F.col("w")).alias("s")
    ).collect()[0]
    got = salted_join(big, small, ["k"]).agg(
        F.count("*").alias("n"), F.sum(F.col("v") + F.col("w")).alias("s")
    ).collect()[0]
    assert (got.n, got.s) == (want.n, want.s)


def test_sql_frontend(spark, sf_dir):
    df = sql(
        spark,
        sf_dir,
        "SELECT o_orderpriority, count(*) AS n FROM orders GROUP BY 1 ORDER BY 1",
    )
    rows = df.collect()
    assert len(rows) == 5 and all(r.n > 0 for r in rows)


@pytest.fixture()
def manifest(spark):
    tiles = tile_grid(spark, n=4)
    feats = feature_targets(
        spark, tiles, (0, 0, 3, 2), [dt.datetime(2020, 3, 1), dt.datetime(2021, 3, 1)]
    ).join(tiles.select("tile_id", "minx", "miny", "maxx", "maxy"), "tile_id")
    return build_manifest(feats)


def test_manifest_schema_and_groups(spark, manifest):
    from flytemosaic_spark.schemas import MOSAIC_MANIFEST

    assert [f.name for f in manifest.schema.fields] == [
        f.name for f in MOSAIC_MANIFEST.fields
    ]
    groups = assert_homogeneous(manifest)
    rows = groups.collect()
    assert len(rows) == 2  # 2 snapped years x 1 feature
    for r in rows:
        assert r.n_sources == 6  # 3x2 tiles
        assert (r.minx, r.miny, r.maxx, r.maxy) == (0.0, 0.0, 3.0, 2.0)


def test_manifest_mixed_metadata_raises(spark, manifest):
    mixed = manifest.withColumn(
        "dtype",
        F.when(F.col("url").endswith("0301.tif"), F.lit("uint16")).otherwise(
            F.col("dtype")
        ),
    )
    bad = validate_groups(mixed).where(~F.col("homogeneous"))
    if bad.count():  # url pattern matched -> must raise
        with pytest.raises(ValueError, match="mixed raster metadata"):
            assert_homogeneous(mixed)
