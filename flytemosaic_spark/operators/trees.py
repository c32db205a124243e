"""Histogram-based decision-tree split finding (the XGBoost/LightGBM
"approx" algorithm's inner loop) as one aggregation pass.

Gradient-boosted trees over tabular training data spend almost all
their time answering one question per feature per node: "which bin
boundary maximizes the variance reduction of the label?". The
distributed form is exactly a histogram aggregation — per (feature,
bin): row count and label sum — followed by a prefix scan over the
(bounded, <=64) bins and a closed-form gain at each boundary. That
makes it a natural one-shuffle Spark operator: the data-scale work is
a single partial-aggregating groupBy on (feature, bin); everything
after runs on feature_count x bin_count rows (metadata scale).

Gain for splitting at "bin <= b" with label sums S_L/S_R over n_L/n_R
rows: gain(b) = S_L^2/n_L + S_R^2/n_R - S^2/N  (variance-reduction up
to the constant sum(y^2), the classic CART regression criterion; equal
to the squared-loss gain in XGBoost with hessian = 1).

Determinism: with an integer-valued label every sum is exact in a
double regardless of summation order (< 2^53), so the gains — ratios
of exactly-representable integers — are bit-identical across engines
and partitionings; the argmax needs no rounding guard, only a bin-id
tiebreak for genuinely equal gains.

Scale shape: one shuffle of (feature, bin) partial aggregates
(map-side combine collapses each task to <= n_features x n_bins
rows), then windows over bin axes bounded by construction
(partitioned per feature). No driver-side loops, no collect.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from flytemosaic_spark.operators.text import portable_round


def best_splits(
    df: DataFrame,
    features: dict[str, Column],
    label: Column,
    round_digits: int = 4,
) -> DataFrame:
    """Best split per feature by exact variance-reduction gain.

    ``features`` maps feature name -> integer bin expression (caller
    chooses the binning: fixed-width, month-of-year, hashed category,
    ...; bins must be bounded). ``label`` should be integer-valued for
    cross-engine exactness (see module docstring).

    Output: (feature, split_bin, gain, n_left, n_right) — one row per
    feature, split = "bin <= split_bin"; ties on gain break toward the
    smaller bin. Features with no valid split (single bin) drop out.
    """
    # one pass: each row emits one (feature, bin, y) triple per feature
    # via an inline array explode — still a narrow stage, and the
    # groupBy below partial-aggregates before the (tiny) shuffle
    pairs = F.array(
        *[
            F.struct(F.lit(name).alias("feature"), expr.cast("bigint").alias("bin"))
            for name, expr in features.items()
        ]
    )
    exploded = df.select(
        F.explode(pairs).alias("fb"), label.cast("double").alias("_y")
    ).select("fb.feature", "fb.bin", "_y")

    hist = exploded.groupBy("feature", "bin").agg(
        F.count("*").alias("n"), F.sum("_y").alias("s")
    )

    # per-feature totals + prefix sums over the bounded bin axis
    w_tot = Window.partitionBy("feature")
    w_cum = (
        Window.partitionBy("feature")
        .orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    scanned = hist.select(
        "feature",
        "bin",
        F.sum("n").over(w_cum).alias("n_l"),
        F.sum("s").over(w_cum).alias("s_l"),
        F.sum("n").over(w_tot).alias("n_tot"),
        F.sum("s").over(w_tot).alias("s_tot"),
    )
    n_r = F.col("n_tot") - F.col("n_l")
    s_r = F.col("s_tot") - F.col("s_l")
    gain = (
        F.col("s_l") * F.col("s_l") / F.col("n_l")
        + s_r * s_r / n_r
        - F.col("s_tot") * F.col("s_tot") / F.col("n_tot")
    )
    candidates = scanned.where(n_r > 0).select(
        "feature",
        "bin",
        gain.alias("_gain"),
        F.col("n_l").alias("n_left"),
        n_r.alias("n_right"),
    )
    w_best = Window.partitionBy("feature").orderBy(
        F.desc("_gain"), F.asc("bin")
    )
    return (
        candidates.withColumn("_rk", F.row_number().over(w_best))
        .where(F.col("_rk") == 1)
        .select(
            "feature",
            F.col("bin").alias("split_bin"),
            portable_round(F.col("_gain"), round_digits).alias("gain"),
            "n_left",
            "n_right",
        )
    )
