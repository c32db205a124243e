"""Privacy auditing for training-data release: k-anonymity reporting
and a reproducible Laplace mechanism for noisy counts.

Before a corpus (or its per-group statistics) leaves the pipeline, two
standard questions: "which quasi-identifier combinations isolate fewer
than k people?" (k-anonymity — Sweeney 2002) and "what do the group
counts look like under differential-privacy noise?" (the Laplace
mechanism — Dwork et al. 2006). Both are single-aggregation-pass
operators at any scale: one shuffle on the quasi-identifier tuple,
then metadata-scale arithmetic.

The Laplace mechanism here is *deterministic*: the uniform draw is
derived from an md5 hash of (group key, seed), mapped through the
Laplace inverse CDF. That keeps the noise distribution correct across
groups while making runs reproducible and engine-portable (the DuckDB
oracle replays the identical draw) — the same determinism-by-hashing
move the sampling and masking operators use. For a production release
you would swap the hash for a CSPRNG keyed per release; the plan shape
is unchanged.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from flytemosaic_spark.operators.text import portable_round

# 13 hex chars = 52 bits: fits a double's mantissa exactly, so the
# uniform u in [0,1) is the same double in every engine.
_U_HEX = 13
_U_SPACE = float(16**_U_HEX)


def k_anonymity_report(
    df: DataFrame,
    qi_cols: list[Column | str],
    ks: list[int],
) -> DataFrame:
    """k-anonymity audit over quasi-identifier columns.

    A row is "at risk" at level k when its quasi-identifier
    equivalence class holds fewer than k rows. Output, one row per
    requested k: (k, n_groups, n_violating_groups, rows_at_risk,
    suppression_rate) where suppression_rate = rows_at_risk / N (the
    fraction you would have to suppress or generalize to reach
    k-anonymity by deletion alone).

    Plan: one shuffle (groupBy the QI tuple, partial-aggregating
    count), then a broadcast cross join against the literal k table
    and a conditional aggregation over group-scale rows.
    """
    cols = [F.col(c) if isinstance(c, str) else c for c in qi_cols]
    sizes = df.groupBy(
        *[c.alias(f"_qi{i}") for i, c in enumerate(cols)]
    ).agg(F.count("*").alias("_gn"))
    k_tab = df.sparkSession.createDataFrame(
        [(int(k),) for k in sorted(ks)], "k bigint"
    )
    risky = F.col("_gn") < F.col("k")
    return (
        sizes.crossJoin(F.broadcast(k_tab))
        .groupBy("k")
        .agg(
            F.count("*").alias("n_groups"),
            F.sum(risky.cast("bigint")).alias("n_violating_groups"),
            F.sum(F.when(risky, F.col("_gn")).otherwise(F.lit(0))).alias(
                "rows_at_risk"
            ),
            portable_round(
                F.sum(F.when(risky, F.col("_gn")).otherwise(F.lit(0)))
                / F.sum("_gn"),
                6,
            ).alias("suppression_rate"),
        )
    )


def _uniform01(key: Column, seed: int) -> Column:
    """Deterministic uniform in [0, 1): top 52 bits of md5(seed||key)."""
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(f"dp{seed}:"), key.cast("string"))),
            1,
            _U_HEX,
        ),
        16,
        10,
    ).cast("double")
    return h / F.lit(_U_SPACE)


def dp_noisy_counts(
    df: DataFrame,
    group_cols: list[str],
    epsilon: float,
    seed: int = 7,
    round_digits: int = 4,
) -> DataFrame:
    """Per-group counts under the Laplace mechanism at sensitivity 1.

    noise = -(1/epsilon) * sign(u - 0.5) * ln(1 - 2|u - 0.5|) with u
    the deterministic per-group uniform — the Laplace inverse CDF, so
    noise ~ Laplace(0, 1/epsilon) across groups. Output: group cols +
    exact n (for the audit twin; drop it before release) + noisy_n.
    """
    counts = df.groupBy(*group_cols).agg(F.count("*").alias("n"))
    key = F.concat_ws("\x1f", *[F.col(c).cast("string") for c in group_cols])
    u = _uniform01(key, seed) - F.lit(0.5)
    mag = F.lit(1.0) - F.lit(2.0) * F.abs(u)
    noise = (
        F.lit(-1.0 / epsilon)
        * F.signum(u)
        * F.log(mag)
    )
    return counts.select(
        *group_cols,
        "n",
        portable_round(F.col("n") + noise, round_digits).alias("noisy_n"),
    )
