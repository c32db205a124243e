"""Distribution-drift testing: the two-sample Kolmogorov–Smirnov
statistic, distributed.

PSI (x92) answers "how much did the binned distribution move?" but
needs a binning choice; the KS statistic is the binning-free
complement: D = sup_v |F_a(v) - F_b(v)| over the empirical CDFs of the
two samples. Training-data pipelines use it as the drop-in drift gate
between two snapshots / sources of a numeric feature.

Distributed shape: group both samples by exact value (one shuffle,
partial-aggregating counts), then the ECDFs are *prefix sums over the
value axis* — a global ordered cumsum, which is the engine's
:func:`flytemosaic_spark.plans.prefix.distributed_cumsum` (range-
bucketed two-pass prefix sum: no single-partition window at any
scale). The sup is a plain max aggregate. Integer counts make every
cumulative value exact; the only float step is the final count/N
division — identical IEEE doubles in every engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from flytemosaic_spark.operators.text import portable_round
from flytemosaic_spark.plans.prefix import distributed_cumsum


def ks_two_sample(
    df: DataFrame,
    value_col: str,
    side_col: str,
    side_a,
    side_b,
    round_digits: int = 6,
) -> DataFrame:
    """Two-sample KS test between the ``value_col`` distributions of
    rows where ``side_col`` == ``side_a`` vs ``side_b``.

    Output: one row (n_a, n_b, d_stat, d_crit_05, drifted) where
    d_crit_05 = 1.358 * sqrt((n_a+n_b)/(n_a*n_b)) is the asymptotic
    5% critical value and drifted = d_stat > d_crit_05.

    The sup over |F_a - F_b| is attained at sample points, and at ties
    the ECDF steps AFTER counting every row of that value on both
    sides — grouping by distinct value before the prefix sum gives
    exactly that semantics.
    """
    sided = df.select(
        F.col(value_col).alias("v"), F.col(side_col).alias("_s")
    ).where(F.col("_s").isin([side_a, side_b]))
    per_value = sided.groupBy("v").agg(
        F.sum((F.col("_s") == side_a).cast("bigint")).alias("_na"),
        F.sum((F.col("_s") == side_b).cast("bigint")).alias("_nb"),
    )
    cum = distributed_cumsum(
        distributed_cumsum(per_value, "v", "_na", "_ca"),
        "v",
        "_nb",
        "_cb",
    )
    totals = per_value.agg(
        F.sum("_na").alias("n_a"), F.sum("_nb").alias("n_b")
    )
    diff = F.abs(
        F.col("_ca") / F.col("n_a") - F.col("_cb") / F.col("n_b")
    )
    d = (
        cum.crossJoin(F.broadcast(totals))
        .agg(
            F.max("n_a").alias("n_a"),
            F.max("n_b").alias("n_b"),
            F.max(diff).alias("_d"),
        )
    )
    crit = F.lit(1.358) * F.sqrt(
        (F.col("n_a") + F.col("n_b"))
        / (F.col("n_a").cast("double") * F.col("n_b"))
    )
    return d.select(
        "n_a",
        "n_b",
        portable_round(F.col("_d"), round_digits).alias("d_stat"),
        portable_round(crit, round_digits).alias("d_crit_05"),
        (F.col("_d") > crit).cast("int").alias("drifted"),
    )
