"""Categorical Naive Bayes, trained and evaluated as pure relational
aggregation.

The reference pipeline has no model training, but a training-data
engine needs a cheap *supervised probe*: "how predictable is column Y
from columns X?" is the standard leakage / label-noise / feature-value
screen over a candidate training table, and categorical NB answers it
with two hash aggregations and a broadcast-sized model — no gradient
loop, no driver-side data.

Distributed shape: the model is (feature, value, class) counts — one
partial-aggregating shuffle over the unpivoted training fold; the
model table is vocabulary-scale (sum of per-feature cardinalities x
classes), broadcast back for scoring. Scoring is a left join from the
unpivoted test fold plus one (row, class) aggregation; the confusion
matrix is all-integer, so the final output is engine-exact.

Determinism: the train/test split hashes the row key (md5, the
engine-wide reproducible-sampling primitive in
:mod:`flytemosaic_spark.operators.sampling`); log-likelihoods are
half-up quantized at 1e-9 before the per-row sum and the class argmax
compares scores quantized at 1e-6 with a class-name tiebreak, so the
predicted labels reproduce across engines (sum order perturbs the
quantized addends ~1e-15, far below the comparison grain).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from flytemosaic_spark.operators.sampling import hash_bucket, rate_threshold
from flytemosaic_spark.operators.text import portable_round


def naive_bayes_confusion(
    df: DataFrame,
    key: Column,
    label: Column,
    features: dict[str, Column],
    alpha: float = 1.0,
    test_frac: float = 0.25,
    seed_tag: str = "nb",
) -> DataFrame:
    """Train categorical NB with Laplace smoothing ``alpha`` on the
    (1 - test_frac) md5-fold, score the held-out fold, and return the
    integer confusion matrix (actual, predicted, n).

    Unseen feature values at scoring time get the smoothed-zero
    likelihood alpha / (n_class + alpha * |V_feature|) — the same term
    a zero-count cell would get, so the model needs no value
    enumeration beyond what training saw.
    """
    thr = rate_threshold(test_frac)
    base = df.select(
        key.cast("string").alias("_key"),
        label.cast("string").alias("_label"),
        *[c.cast("string").alias(f"_f_{n}") for n, c in features.items()],
    ).withColumn(
        "_is_test",
        hash_bucket(F.concat(F.lit(seed_tag + ":"), F.col("_key"))) < F.lit(thr),
    )
    # NOT checkpointed deliberately: four subplans re-derive the folds,
    # but each is a cheap columnar scan + md5 — materializing a
    # fact-scale copy would trade cheap re-scans for data-scale
    # storage (measured neutral at sf0.1, r5)
    train = base.where(~F.col("_is_test"))
    test = base.where(F.col("_is_test"))

    # unpivot the feature columns in ONE scan via inline explode (the
    # x157 pattern) — a unionAll unpivot would read the fact table
    # once per feature
    _fv = F.array(
        *[
            F.struct(
                F.lit(name).alias("_feature"),
                F.col(f"_f_{name}").alias("_value"),
            )
            for name in sorted(features)
        ]
    )

    def _long(d: DataFrame, keep: list[str]) -> DataFrame:
        return d.select(*keep, F.explode(_fv).alias("_x")).select(
            *keep,
            F.col("_x._feature").alias("_feature"),
            F.col("_x._value").alias("_value"),
        )

    # class- and vocabulary-scale model state: checkpoint so the
    # model / defaults / priors / vocab all read these tiny tables
    # instead of re-scanning the training fold per broadcast
    cls = (
        train.groupBy("_label")
        .agg(F.count("*").alias("_n_c"))
        .localCheckpoint()
    )
    n_train = cls.groupBy().agg(F.sum("_n_c").alias("_n_train"))

    counts = (
        _long(train, ["_label"])
        .groupBy("_label", "_feature", "_value")
        .agg(F.count("*").alias("_cnt"))
        .localCheckpoint()
    )
    vocab = (
        counts.select("_feature", "_value")
        .distinct()
        .groupBy("_feature")
        .agg(F.count("*").alias("_v"))
    )
    a = F.lit(float(alpha))
    model = (
        counts.join(F.broadcast(cls), "_label")
        .join(F.broadcast(vocab), "_feature")
        .select(
            "_label",
            "_feature",
            "_value",
            portable_round(
                F.log((F.col("_cnt") + a) / (F.col("_n_c") + a * F.col("_v"))), 9
            ).alias("_ll"),
        )
    )
    # smoothed-zero likelihood for values unseen in training
    default = cls.crossJoin(F.broadcast(vocab)).select(
        "_label",
        "_feature",
        portable_round(F.log(a / (F.col("_n_c") + a * F.col("_v"))), 9).alias(
            "_ll0"
        ),
    )
    prior = cls.crossJoin(F.broadcast(n_train)).select(
        F.col("_label").alias("_class"),
        portable_round(F.log(F.col("_n_c") / F.col("_n_train")), 9).alias(
            "_prior"
        ),
    )

    scored = (
        _long(test, ["_key"])
        .crossJoin(F.broadcast(cls.select(F.col("_label").alias("_class"))))
        .join(
            F.broadcast(model.withColumnRenamed("_label", "_class")),
            ["_class", "_feature", "_value"],
            "left",
        )
        .join(
            F.broadcast(default.withColumnRenamed("_label", "_class")),
            ["_class", "_feature"],
        )
        .groupBy("_key", "_class")
        .agg(F.sum(F.coalesce(F.col("_ll"), F.col("_ll0"))).alias("_sum_ll"))
        .join(F.broadcast(prior), "_class")
        .select(
            "_key",
            "_class",
            portable_round(F.col("_prior") + F.col("_sum_ll"), 6).alias("_score"),
        )
    )
    w = Window.partitionBy("_key").orderBy(F.desc("_score"), F.asc("_class"))
    pred = (
        scored.withColumn("_rk", F.row_number().over(w))
        .where(F.col("_rk") == 1)
        .select("_key", F.col("_class").alias("predicted"))
    )
    return (
        test.select("_key", F.col("_label").alias("actual"))
        .join(pred, "_key")
        .groupBy("actual", "predicted")
        .agg(F.count("*").alias("n"))
    )
