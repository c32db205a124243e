"""Byte-budgeted, chunk-aligned write-partition planner.

Re-expresses the reference's ``build_mosaic_chunk_partitions``
(reference: flytemosaic/mosaics.py:232-303) as DataFrame math:

- bytes/chunk from dtype × chunk geometry (mosaics.py:277-279 → F12)
- square multiplier ``floor(sqrt(budget / bytes))`` (mosaics.py:281)
- cumulative-sum chunk boundaries (mosaics.py:287-289 → W2 window)
- cartesian product of per-dim ranges (mosaics.py:298-303 → J6)
- non-contiguous band selection raises (mosaics.py:291-296)
- optional seeded shuffle for load balancing (flyte/build.py:146 → W3)

The plan is metadata-scale (one row per write partition), but the
expressions are the same ones that size real 100 TB mosaics: the
planner's output feeds ``repartition(n)`` + region-parallel sinks, and
partitions are **disjoint by construction** — the exactly-once
coverage invariant is property-tested (ported from the reference's
strongest test, tests/unit/flytemosaic/test_mosaics.py:45-68).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from flytemosaic_spark.plans.prefix import bounded_window


def square_multiplier(budget_bytes: int, bytes_per_chunk: int) -> int:
    """m such that one partition covers an m×m block of chunks —
    partition byte sizes therefore step n² (4×, 9×, 16×...) like the
    reference's (mosaics.py:240-243, 281)."""
    return max(1, math.floor(math.sqrt(budget_bytes / bytes_per_chunk)))


def _axis_ranges(spark: SparkSession, n: int, chunk: int, m: int, dim: str) -> DataFrame:
    """Pixel ranges per partition along one axis: chunk sizes (with a
    ragged tail) → cumsum boundaries (W2) → group every m chunks."""
    n_chunks = -(-n // chunk)
    sizes = spark.range(n_chunks).select(
        F.col("id").alias("chunk_idx"),
        F.least(F.lit(chunk), F.lit(n) - F.col("id") * chunk).alias("size"),
    )
    # chunk-index axis: metadata scale (one row per chunk, not per pixel)
    w = bounded_window("chunk_idx").rowsBetween(Window.unboundedPreceding, 0)
    bounds = sizes.select(
        "chunk_idx",
        (F.sum("size").over(w) - F.col("size")).alias("start"),
        F.sum("size").over(w).alias("stop"),
    )
    return (
        bounds.groupBy(F.floor(F.col("chunk_idx") / m).alias(f"{dim}_grp"))
        .agg(
            F.min("start").cast("int").alias(f"{dim}0"),
            F.max("stop").cast("int").alias(f"{dim}1"),
        )
        .drop(f"{dim}_grp")
    )


def plan_partitions(
    spark: SparkSession,
    n_time: int,
    bands: list[int],
    ny: int,
    nx: int,
    chunk_y: int,
    chunk_x: int,
    itemsize: int = 4,
    budget_bytes: int = 128 * 1024**2,
    shuffle_seed: int | None = None,
) -> DataFrame:
    """Write-partition plan: one row per disjoint
    ``(time, bands, [y0,y1), [x0,x1))`` region.

    Band selection must be contiguous — a region write addresses a
    contiguous band slab (reference raise: mosaics.py:291-296).
    """
    if sorted(bands) != list(range(min(bands), max(bands) + 1)):
        raise ValueError(f"non-contiguous band selection: {sorted(bands)}")

    bytes_per_chunk = len(bands) * chunk_y * chunk_x * itemsize
    m = square_multiplier(budget_bytes, bytes_per_chunk)

    times = spark.range(n_time).select(F.col("id").cast("int").alias("t"))
    y_ranges = _axis_ranges(spark, ny, chunk_y, m, "y")
    x_ranges = _axis_ranges(spark, nx, chunk_x, m, "x")

    plan = (
        times.crossJoin(y_ranges)
        .crossJoin(x_ranges)
        .select(
            "t",
            F.lit(min(bands)).alias("band0"),
            F.lit(max(bands) + 1).alias("band1"),
            "y0",
            "y1",
            "x0",
            "x1",
            (
                (F.col("y1") - F.col("y0"))
                * (F.col("x1") - F.col("x0"))
                * len(bands)
                * itemsize
            ).cast("bigint").alias("n_bytes"),
        )
    )
    if shuffle_seed is not None:
        plan = plan.orderBy(F.rand(shuffle_seed))
    return plan
