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


def l_diversity_report(
    df: DataFrame,
    qi_cols: list,
    sensitive,
    ls: list[int] = (2, 3),
) -> DataFrame:
    """l-diversity audit, the companion to :func:`k_anonymity_report`:
    a QI class can satisfy k-anonymity and still leak — if all 20 rows
    of a class share ONE sensitive value, membership reveals it.
    l-diversity requires >= l distinct sensitive values per class.

    One (QI..., sensitive) partial-aggregating shuffle, one QI-class
    rollup (count rows, count distinct sensitive via the already-
    grouped inner level — no expensive distinct over the fact table),
    then the literal l table broadcast-crosses the class-scale rows.

    Returns one row per l: (l, n_classes, n_violating_classes,
    rows_at_risk, at_risk_rate).
    """
    inner = df.groupBy(
        *[c.alias(f"_q{i}") for i, c in enumerate(qi_cols)],
        sensitive.alias("_s"),
    ).agg(F.count("*").alias("_n"))
    classes = inner.groupBy(
        *[F.col(f"_q{i}") for i in range(len(qi_cols))]
    ).agg(
        F.sum("_n").alias("_rows"),
        F.count("*").alias("_ndist"),
    )
    lt = None
    spark = df.sparkSession
    lt = spark.createDataFrame([(int(v),) for v in ls], "l long")
    return (
        classes.crossJoin(F.broadcast(lt))
        .groupBy("l")
        .agg(
            F.count("*").alias("n_classes"),
            F.sum((F.col("_ndist") < F.col("l")).cast("bigint")).alias(
                "n_violating_classes"
            ),
            F.sum(
                F.when(F.col("_ndist") < F.col("l"), F.col("_rows")).otherwise(
                    F.lit(0)
                )
            ).alias("rows_at_risk"),
            (
                F.floor(
                    F.sum(
                        F.when(
                            F.col("_ndist") < F.col("l"), F.col("_rows")
                        ).otherwise(F.lit(0))
                    )
                    / F.sum("_rows").cast("double")
                    * 1e6
                    + F.lit(0.5)
                )
                / 1e6
            ).alias("at_risk_rate"),
        )
        .orderBy("l")
    )


def t_closeness_report(
    df: DataFrame,
    qi_cols: list,
    sensitive,
    ts: list[float] = (0.2, 0.35),
) -> DataFrame:
    """t-closeness audit (Li et al., ICDE 2007) — the third rung after
    k-anonymity and l-diversity: a class can hold many distinct
    sensitive values and STILL leak if its distribution skews far from
    the corpus (20 salaries, all in the top percentile). For
    categorical sensitives the distance is total variation
    d(P, Q) = ½ Σ_s |p_s − q_s| against the global distribution Q.

    Only observed (class, s) cells are materialized; the unobserved
    tail enters through the identity
    Σ_{s∉class} q_s = 1 − Σ_{s∈class} q_s, so
    d = ½ (Σ_{s∈class} |p_s − q_s| + 1 − Σ_{s∈class} q_s).

    One (QI, s) partial-aggregating shuffle; class totals via a
    QI-partitioned window over that class×s-scale table (partitioned,
    bounded); the global distribution is a sensitive-cardinality-scale
    broadcast; per-cell terms quantized at 1e-9 (sensitive-cardinality-
    bounded sums), the literal t table broadcast-crosses class-scale
    rows. Returns one row per t: (t, n_classes, n_violating_classes,
    rows_at_risk, at_risk_rate).
    """
    from pyspark.sql import Window

    inner = df.groupBy(
        *[c.alias(f"_q{i}") for i, c in enumerate(qi_cols)],
        sensitive.alias("_s"),
    ).agg(F.count("*").alias("_n"))
    glob = inner.groupBy("_s").agg(F.sum("_n").alias("_ns"))
    tot = inner.groupBy().agg(F.sum("_n").alias("_nn"))
    qs = [f"_q{i}" for i in range(len(qi_cols))]
    w = Window.partitionBy(*qs)
    cell = (
        inner.join(F.broadcast(glob), "_s")
        .crossJoin(F.broadcast(tot))
        .select(
            *qs,
            F.sum("_n").over(w).alias("_rows"),
            F.col("_n"),
            F.col("_ns"),
            F.col("_nn"),
        )
        .select(
            *qs,
            "_rows",
            portable_round(
                F.abs(
                    F.col("_n") / F.col("_rows").cast("double")
                    - F.col("_ns") / F.col("_nn").cast("double")
                ),
                9,
            ).alias("_ad"),
            portable_round(
                F.col("_ns") / F.col("_nn").cast("double"), 9
            ).alias("_qs"),
        )
    )
    classes = cell.groupBy(*qs).agg(
        F.max("_rows").alias("_rows"),
        portable_round(
            (F.sum("_ad") + F.lit(1.0) - F.sum("_qs")) / F.lit(2.0), 9
        ).alias("_dist"),
    )
    spark = df.sparkSession
    tt = spark.createDataFrame([(float(v),) for v in ts], "t double")
    return (
        classes.crossJoin(F.broadcast(tt))
        .groupBy("t")
        .agg(
            F.count("*").alias("n_classes"),
            F.sum((F.col("_dist") > F.col("t")).cast("bigint")).alias(
                "n_violating_classes"
            ),
            F.sum(
                F.when(F.col("_dist") > F.col("t"), F.col("_rows")).otherwise(
                    F.lit(0)
                )
            ).alias("rows_at_risk"),
            portable_round(
                F.sum(
                    F.when(
                        F.col("_dist") > F.col("t"), F.col("_rows")
                    ).otherwise(F.lit(0))
                )
                / F.sum("_rows").cast("double"),
                6,
            ).alias("at_risk_rate"),
        )
        .orderBy("t")
    )
