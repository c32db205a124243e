"""Time-series similarity search over the event stream.

The shape of EDBT'19-style distributed time-series similarity (see
/root/repo/PAPERS.md): align every key's series to a fixed dense
grid, z-normalize, and rank by distance to a query series. Keeping
the series in LONG form (key, grid_pos, value) makes every step a
DataFrame aggregation:

- densification is key-table x fixed-grid explode (never data-scale:
  |keys| x |grid| rows),
- z-normalization is a per-key moment aggregate joined back,
- the distance to the broadcast query series is one join on grid_pos
  plus a per-key sum of |grid| squared differences,
- top-k is TakeOrderedAndProject (per-partition partials, no global
  sort).

Per-key state never exceeds the grid length, so the plan is flat in
key cardinality — the property the reference papers engineer tries
for, free here from partial aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def daily_series(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    n_days: int = 30,
) -> DataFrame:
    """Dense per-key daily series: (key, day 1..n_days, v) with
    missing days as 0.0. Day index is relative to the per-corpus
    min date — deterministic, no wall clock."""
    base = events.select(
        F.col(key_col).alias("key"),
        F.col(ts_col).cast("date").alias("d"),
        F.col(value_col).alias("v"),
    )
    start = base.agg(F.min("d").alias("d0"))
    daily = (
        base.crossJoin(F.broadcast(start))
        .select("key", (F.datediff(F.col("d"), F.col("d0")) + 1).alias("day"), "v")
        .where(F.col("day") <= n_days)
        .groupBy("key", "day")
        .agg(F.sum("v").alias("v"))
    )
    grid = (
        daily.select("key")
        .distinct()
        .select("key", F.explode(F.sequence(F.lit(1), F.lit(n_days))).alias("day"))
    )
    return grid.join(daily, ["key", "day"], "left").select(
        "key", "day", F.coalesce("v", F.lit(0.0)).alias("v")
    )


def znorm(series: DataFrame) -> DataFrame:
    """Z-normalize each key's series (population moments over the
    dense grid). Keys with zero variance are dropped — their shape
    carries no signal and the normalization is undefined."""
    moments = series.groupBy("key").agg(
        F.avg("v").alias("mu"), F.stddev_pop("v").alias("sd")
    )
    return (
        series.join(moments, "key")
        .where(F.col("sd") > 0)
        .select("key", "day", ((F.col("v") - F.col("mu")) / F.col("sd")).alias("z"))
    )


def topk_similar_to_mean(
    events: DataFrame,
    k: int = 10,
    n_days: int = 30,
    round_digits: int = 6,
) -> DataFrame:
    """Top-k keys whose z-normalized daily series is closest (squared
    Euclidean) to the z-normalized corpus-mean daily series."""
    from flytemosaic_spark.operators.text import portable_round

    series = daily_series(events, n_days=n_days)
    z = znorm(series)
    mean_series = series.groupBy("day").agg(F.avg("v").alias("v"))
    qm = mean_series.agg(
        F.avg("v").alias("mu"), F.stddev_pop("v").alias("sd")
    )
    qz = (
        mean_series.crossJoin(F.broadcast(qm))
        .select("day", ((F.col("v") - F.col("mu")) / F.col("sd")).alias("qz"))
    )
    dist = (
        z.join(F.broadcast(qz), "day")
        .groupBy("key")
        .agg(
            portable_round(
                F.sum((F.col("z") - F.col("qz")) * (F.col("z") - F.col("qz"))),
                round_digits,
            ).alias("dist")
        )
    )
    return (
        dist.orderBy(F.asc("dist"), F.asc("key"))
        .limit(k)
        .select(F.col("key").alias("user_id"), "dist")
    )
