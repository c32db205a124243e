"""Split conformal prediction: distribution-free interval calibration
as three relational passes.

A training-data engine that ships model-eval probes (AUC, calibration
bins, MRR/MAP) also needs the *uncertainty* readout: given any point
predictor, split conformal turns a held-out calibration fold into a
finite-sample coverage guarantee — P(y in [pred - qhat, pred + qhat])
>= 1 - alpha — with no distributional assumption (Vovk et al.;
Angelopoulos & Bates 2021 survey). At corpus scale it is the standard
"how wrong can the quality-score model be" gate before a filtering
threshold is applied to 100 TB of documents.

Distributed shape: the predictor here is a per-group mean (any
broadcast-joinable model table works the same); nonconformity scores
are a pure column map; the calibration quantile is an EXACT order
statistic selected by global rank via
:func:`flytemosaic_spark.plans.prefix.distributed_row_number` — no
single-partition sort at any calibration-fold size — and coverage on
the test fold is one aggregate against the broadcast 1-row qhat.

Determinism: folds hash the row key (md5); predictions and residuals
are half-up quantized at 1e-6 before ranking, and rank ties break on
the row key, so the selected order statistic is engine-identical.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from flytemosaic_spark.operators.sampling import split_label
from flytemosaic_spark.operators.text import portable_round
from flytemosaic_spark.plans.prefix import distributed_row_number


def split_conformal(
    df: DataFrame,
    key: Column,
    group: Column,
    y: Column,
    alpha: float = 0.1,
) -> DataFrame:
    """Calibrate a symmetric conformal interval around the per-group
    train-fold mean and audit its test-fold coverage.

    Folds: md5(key) -> 25% calibration, 25% test, 50% train. qhat is
    the ceil((n_cal + 1) * (1 - alpha))-th smallest absolute residual
    on the calibration fold (the finite-sample-corrected quantile;
    clamped to n_cal when the correction exceeds the fold).

    Returns one row: (n_train, n_cal, n_test, qhat, coverage,
    target_coverage, avg_width).
    """
    base = df.select(
        key.cast("string").alias("_key"),
        group.alias("_g"),
        y.cast("double").alias("_y"),
    ).withColumn(
        "_fold",
        split_label(F.col("_key"), splits=(("cal", 0.25), ("test", 0.25))),
    )
    pred = (
        base.where(F.col("_fold") == "train")
        .groupBy("_g")
        .agg(
            portable_round(F.avg("_y"), 6).alias("_pred"),
            F.count("*").alias("_n_g"),
        )
    )
    n_train = pred.groupBy().agg(F.sum("_n_g").alias("n_train"))

    cal = (
        base.where(F.col("_fold") == "cal")
        .join(F.broadcast(pred.select("_g", "_pred")), "_g")
        .select(
            "_key", portable_round(F.abs(F.col("_y") - F.col("_pred")), 6).alias("_r")
        )
    )
    n_cal = cal.groupBy().agg(F.count("*").alias("n_cal"))
    ranked = distributed_row_number(cal, ("_r", "_key"), out_col="_rn")
    qhat = (
        ranked.crossJoin(F.broadcast(n_cal))
        .where(
            F.col("_rn")
            == F.least(
                F.ceil((F.col("n_cal") + 1) * F.lit(1.0 - alpha)).cast("bigint"),
                F.col("n_cal"),
            )
        )
        .select(F.col("_r").alias("qhat"))
    )
    test = (
        base.where(F.col("_fold") == "test")
        .join(F.broadcast(pred.select("_g", "_pred")), "_g")
        .crossJoin(F.broadcast(qhat))
        .select(
            (
                portable_round(F.abs(F.col("_y") - F.col("_pred")), 6)
                <= F.col("qhat")
            )
            .cast("bigint")
            .alias("_cov"),
            "qhat",
        )
    )
    return (
        test.groupBy("qhat")
        .agg(
            F.count("*").alias("n_test"),
            portable_round(F.avg("_cov"), 6).alias("coverage"),
        )
        .crossJoin(F.broadcast(n_train))
        .crossJoin(F.broadcast(n_cal))
        .select(
            "n_train",
            "n_cal",
            "n_test",
            "qhat",
            "coverage",
            F.lit(1.0 - alpha).alias("target_coverage"),
            portable_round(F.lit(2.0) * F.col("qhat"), 6).alias("avg_width"),
        )
    )
