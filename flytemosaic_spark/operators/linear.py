"""Declarative in-engine model training: logistic-style regression by
unrolled gradient-descent rounds.

The reference has no trainer; its model surface is apply-only (the
engine's x32 scores a literal-weight linear model). This closes the
loop: fit those weights INSIDE the engine with a fixed number of
full-batch gradient steps, each step one scan + one 1-row aggregate —
the same driver-side-loop-over-declarative-plans idiom as
``graph.pagerank`` and ``similarity.pca_power_component``.

Portability: the standard sigmoid needs exp(), whose last-ulp
behavior differs across libms, so the link is the *fast sigmoid*
s(z) = 0.5 + z / (2·(1+|z|)) — pure +,*,/,abs IEEE ops, bit-identical
on any engine. Per-row gradient contributions quantize to integer
nano-units BEFORE the sum (order-independent exact bigint), weights
round half-up at 1e-9 per step, so a DuckDB oracle can replay the
whole trajectory exactly.

Scale shape: each step is one scan of the cached feature table, one
map-side-combined 1-row aggregate, one broadcast of the 1-row weight
table back. Step count is fixed and small; nothing corpus-scale ever
sits on the driver.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_GRAIN = 1.0e9

# a marginal with at most this many distinct values broadcasts its rank
# table (the graph-operator node-table recipe), enabling the one-pass
# spearman shape; bigger marginals fall back to the joint-aggregate form
_SPEARMAN_BROADCAST_LIMIT = 2_000_000


def _round9(c: Column) -> Column:
    return F.floor(c * F.lit(_GRAIN) + F.lit(0.5)) / F.lit(_GRAIN)


def fast_sigmoid(z: Column) -> Column:
    """s(z) = 0.5 + z / (2·(1+|z|)) — a (0,1) squashing link built only
    from IEEE-exact ops (no exp), so training replays bit-identically
    across engines."""
    return F.lit(0.5) + z / (F.lit(2.0) * (F.lit(1.0) + F.abs(z)))


def logreg_train_gd(
    df: DataFrame,
    feature_cols: list[str],
    label_col: str = "y",
    lr: float = 0.05,
    iterations: int = 3,
) -> DataFrame:
    """Full-batch gradient descent for a logistic-style linear model
    (fast-sigmoid link, squared-error-free logistic residual
    r = s(w·x) − y). Weights start at zero; an implicit bias term is
    always appended. Returns ONE row: n plus one rounded weight per
    feature (``w_<col>``) and ``w_bias``.
    """
    names = list(feature_cols) + ["_bias"]
    feats = df.select(
        *[F.col(c).cast("double").alias(c) for c in feature_cols],
        F.lit(1.0).alias("_bias"),
        F.col(label_col).cast("double").alias("_y"),
    ).cache()
    weights = {c: 0.0 for c in names}
    n = None
    for _ in range(iterations):
        z = None
        for c in names:
            term = F.lit(weights[c]) * F.col(c)
            z = term if z is None else z + term
        r = fast_sigmoid(z) - F.col("_y")
        aggs = [F.count("*").alias("_n")] + [
            F.sum(
                F.floor(r * F.col(c) * F.lit(_GRAIN) + F.lit(0.5)).cast("bigint")
            ).alias(f"_g_{c}")
            for c in names
        ]
        row = feats.agg(*aggs).first()
        n = row["_n"]
        for c in names:
            # float(g) first: replays SQL's CAST(g AS DOUBLE)/1e9 —
            # python's int/float true division rounds the exact
            # rational instead and can differ past 2^53
            step = lr * ((float(row[f"_g_{c}"]) / _GRAIN) / n)
            w = weights[c] - step
            weights[c] = math.floor(w * _GRAIN + 0.5) / _GRAIN
    # the returned row is pure literals — the feature cache has no
    # further readers, release the executor memory now
    feats.unpersist()
    spark = df.sparkSession
    out_cols = [F.lit(n).cast("bigint").alias("n")] + [
        F.lit(weights[c]).alias(f"w_{c}" if c != "_bias" else "w_bias")
        for c in names
    ]
    return spark.range(1).select(*out_cols)


def grouped_ols(
    df: DataFrame,
    group_col: str,
    x_col,
    y_col,
) -> DataFrame:
    """Per-group simple OLS (slope, intercept, R²) with EXACT moment
    accumulation — the grouped-regression readout (per-brand log-log
    price elasticity, per-segment trend): x and y are quantized to
    1e-9 integer units per row, the five moments (Σx, Σy in BIGINT;
    Σxy, Σx², Σy² in DECIMAL(38,0) — the x168 recipe) are exact
    integer sums, and slope/intercept/R² are fixed arithmetic over
    them: engine- and partitioning-exact with zero float-summation
    order sensitivity. One partial-aggregating shuffle on the group
    key; per-group state is five numbers.

    R² crosses to double before squaring (num² would overflow even
    128-bit for large groups) — still deterministic fixed arithmetic.
    Groups with zero x-variance report NULL slope via try_divide.

    Returns (grp, n, slope, intercept, r2).
    """
    from pyspark.sql import functions as F

    from flytemosaic_spark.operators.text import portable_round

    x = F.col(x_col) if isinstance(x_col, str) else x_col
    y = F.col(y_col) if isinstance(y_col, str) else y_col
    dec = "decimal(38,0)"
    pts = df.select(
        F.col(group_col).alias("_g"),
        F.floor(x * F.lit(1e9) + F.lit(0.5)).cast("bigint").alias("_x"),
        F.floor(y * F.lit(1e9) + F.lit(0.5)).cast("bigint").alias("_y"),
    )
    m = pts.groupBy("_g").agg(
        F.count("*").alias("_n"),
        F.sum("_x").alias("_sx"),
        F.sum("_y").alias("_sy"),
        F.sum(F.col("_x").cast(dec) * F.col("_y").cast(dec)).alias("_sxy"),
        F.sum(F.col("_x").cast(dec) * F.col("_x").cast(dec)).alias("_sxx"),
        F.sum(F.col("_y").cast(dec) * F.col("_y").cast(dec)).alias("_syy"),
    )
    n = F.col("_n").cast(dec)
    num = n * F.col("_sxy") - F.col("_sx").cast(dec) * F.col("_sy").cast(dec)
    vx = n * F.col("_sxx") - F.col("_sx").cast(dec) * F.col("_sx").cast(dec)
    vy = n * F.col("_syy") - F.col("_sy").cast(dec) * F.col("_sy").cast(dec)
    slope = F.try_divide(num.cast("double"), vx.cast("double"))
    intercept = (
        F.col("_sy").cast("double") / 1e9
        - slope * F.col("_sx").cast("double") / 1e9
    ) / F.col("_n").cast("double")
    r2 = F.try_divide(
        num.cast("double") * num.cast("double"),
        vx.cast("double") * vy.cast("double"),
    )
    return m.select(
        F.col("_g").alias("grp"),
        F.col("_n").cast("bigint").alias("n"),
        portable_round(slope, 6).alias("slope"),
        portable_round(intercept, 6).alias("intercept"),
        portable_round(r2, 6).alias("r2"),
    )


def spearman_corr(
    df: DataFrame,
    x_col,
    y_col,
    n_buckets: int | None = None,
) -> DataFrame:
    """Exact distributed Spearman rank correlation WITH tie midranks —
    the monotone-association number Pearson misses (outlier-immune,
    invariant to monotone transforms): Pearson over the two columns'
    midranks.

    Midranks are carried in integer DOUBLE-RANK units (2·rank, so the
    ½s of tied midranks stay integers): from each column's
    (value, count) aggregate, rank2 = 2·cum_before + cnt + 1 via
    :func:`flytemosaic_spark.plans.prefix.distributed_cumsum` —
    value-cardinality state, never a single-partition window, the
    roc_auc recipe.

    Physical shape (r11): the fact table is scanned EXACTLY ONCE —
    the raw rows reduce to the checkpointed joint (x, y) → count
    aggregate and everything else derives from it at joint-distinct
    scale or below. The x-marginal comes from one aggregate over the
    joint; when it is node-scale (gated by a distinct-value count,
    the graph-operator broadcast recipe) its rank table broadcasts:
    attach r2x to the joint rows, aggregate per y value the count
    plus the exact decimal sums Σ cnt·r2x and Σ cnt·r2x² (partial
    map-side aggregation), rank that y-marginal with one bucketed
    cumsum, and read all five Pearson moments off the ranked marginal
    (sab = Σ_y r2y·Σ_x cnt·r2x — no join back to the fact; the r10
    broadcast path scanned the fact twice). Past the gate it falls
    back to the joint-aggregate form: rank both marginals at value
    scale, join the rank tables back at joint-distinct scale.

    Values are ranked AS-IS — any numeric type, no integer
    quantization (fractional inputs rank by their true order; the
    caller only needs integer units if IT wants engine-portable
    grouping of floats). Moments are exact BIGINT/DECIMAL(38,0) sums,
    ρ is fixed arithmetic: engine- and partitioning-exact at 1e-6
    with zero float-summation order sensitivity.

    Returns one row: (n, rho).
    """
    from pyspark.sql import functions as F

    from flytemosaic_spark.operators.text import portable_round
    from flytemosaic_spark.plans.prefix import distributed_cumsum

    x = F.col(x_col) if isinstance(x_col, str) else x_col
    y = F.col(y_col) if isinstance(y_col, str) else y_col
    dec = "decimal(38,0)"
    nb = n_buckets or df.sparkSession.sparkContext.defaultParallelism
    probs = [i / nb for i in range(1, nb)]
    raw = df.select(x.alias("_x"), y.alias("_y"))

    def rank2_of(v: DataFrame, col: str, bounds: list[float]) -> DataFrame:
        # v: checkpointed (col, _c) marginal; 2-rank = 2·cum_before+c+1
        r = distributed_cumsum(v, col, "_c", out_col="_cum", bounds=bounds)
        return r.withColumn(
            f"_r2{col}",
            2 * (F.col("_cum") - F.col("_c")) + F.col("_c") + 1,
        )

    # ONE fact pass (r11, VERDICT item 5): the raw rows reduce to the
    # checkpointed JOINT (x, y) -> count aggregate; BOTH the x-marginal
    # and the per-y moments derive from it at joint-distinct scale, so
    # the fact table is scanned exactly once (the r10 broadcast path
    # scanned it twice: once for the x-marginal, once for the per-y
    # decimal sums). All sums stay exact integers/decimals:
    # Σ_rows r2x ≡ Σ_joint cnt·r2x.
    j = (
        raw.groupBy("_x", "_y")
        .agg(F.count("*").alias("_cnt"))
        .localCheckpoint()
    )
    # x-marginal: joint-distinct input, value-scale output;
    # checkpointed (cumsum + the gate count both read it)
    vx = j.groupBy("_x").agg(F.sum("_cnt").alias("_c")).localCheckpoint()
    qx = vx.approxQuantile("_x", probs, 0.01)
    rx = rank2_of(vx, "_x", qx).select("_x", "_r2_x")
    if vx.count() <= _SPEARMAN_BROADCAST_LIMIT:
        a = F.col("_r2_x").cast(dec)
        c0 = F.col("_cnt").cast(dec)
        ym = (
            j.join(F.broadcast(rx), "_x")
            .groupBy("_y")
            .agg(
                F.sum("_cnt").alias("_c"),
                F.sum(c0 * a).alias("_s"),
                F.sum(c0 * a * a).alias("_s2"),
            )
            .localCheckpoint()
        )
        qy = ym.approxQuantile("_y", probs, 0.01)
        ry = rank2_of(ym, "_y", qy)
        b = F.col("_r2_y").cast(dec)
        c = F.col("_c").cast(dec)
        m = ry.groupBy().agg(
            F.coalesce(F.sum("_c"), F.lit(0)).alias("_n"),
            F.sum("_s").alias("_sa"),
            F.sum(c * b).alias("_sb"),
            F.sum(F.col("_s") * b).alias("_sab"),
            F.sum("_s2").alias("_saa"),
            F.sum(c * b * b).alias("_sbb"),
        )
        return _spearman_rho(m, dec, portable_round)
    # past the gate: rank BOTH marginals at value scale and join the
    # rank tables back at joint-distinct scale (the checkpointed j is
    # the only thing any branch re-reads — never the fact table)
    qy = j.approxQuantile("_y", probs, 0.01)

    def rank2(col: str, bounds: list[float]) -> DataFrame:
        # value-scale table, read twice downstream (the bucketed
        # window and the offsets branch) — checkpoint it so neither
        # re-runs the aggregate over j
        v = j.groupBy(col).agg(F.sum("_cnt").alias("_c")).localCheckpoint()
        return rank2_of(v, col, bounds).select(col, f"_r2{col}")

    joined = j.join(rx, "_x").join(rank2("_y", qy), "_y")
    a, b = F.col("_r2_x"), F.col("_r2_y")
    c = F.col("_cnt").cast(dec)
    m = joined.groupBy().agg(
        F.coalesce(F.sum("_cnt"), F.lit(0)).alias("_n"),
        F.sum(c * a.cast(dec)).alias("_sa"),
        F.sum(c * b.cast(dec)).alias("_sb"),
        F.sum(c * a.cast(dec) * b.cast(dec)).alias("_sab"),
        F.sum(c * a.cast(dec) * a.cast(dec)).alias("_saa"),
        F.sum(c * b.cast(dec) * b.cast(dec)).alias("_sbb"),
    )
    return _spearman_rho(m, dec, portable_round)


def _spearman_rho(m: DataFrame, dec: str, portable_round) -> DataFrame:
    n = F.col("_n").cast(dec)
    num = n * F.col("_sab") - F.col("_sa").cast(dec) * F.col("_sb").cast(dec)
    va = n * F.col("_saa") - F.col("_sa").cast(dec) * F.col("_sa").cast(dec)
    vb = n * F.col("_sbb") - F.col("_sb").cast(dec) * F.col("_sb").cast(dec)
    rho = F.try_divide(
        num.cast("double"),
        F.sqrt(va.cast("double")) * F.sqrt(vb.cast("double")),
    )
    return m.select(
        F.col("_n").cast("bigint").alias("n"),
        portable_round(rho, 6).alias("rho"),
    )


def quantile_reg_gd(
    df: DataFrame,
    feature_cols: list[str],
    label_col: str = "y",
    tau: float = 0.5,
    lr: float = 0.05,
    iterations: int = 3,
) -> DataFrame:
    """Full-batch subgradient descent for LINEAR QUANTILE regression
    (pinball / check loss, Koenker & Bassett 1978) — the robust
    regression twin of :func:`logreg_train_gd`: predicts the
    conditional ``tau``-quantile instead of the mean, immune to label
    outliers, the p50/p90-SLO model a pipeline-health dashboard fits.

    Subgradient per row: d rho_tau(y - z) / dz = (1 - tau) when
    z >= y else -tau (the z == y tie resolved to the right branch as
    a FIXED convention — a comparison of identical IEEE doubles, so
    every engine picks the same branch). Per-row gradient
    contributions quantize to integer nano-units before the sum
    (order-independent), weights round at 1e-9 per step — the whole
    trajectory replays bit-identically (same recipe as x136, which
    the DuckDB oracle unrolls step by step).

    Each step = one scan of the cached feature table + one 1-row
    aggregate; the corpus never moves, weights are the only
    cross-step state. Returns ONE row: n, one ``w_<col>`` per
    feature, ``w_bias``.
    """
    import math

    from pyspark.sql import functions as F

    names = list(feature_cols) + ["_bias"]
    feats = df.select(
        *[F.col(c).cast("double").alias(c) for c in feature_cols],
        F.lit(1.0).alias("_bias"),
        F.col(label_col).cast("double").alias("_y"),
    ).cache()
    weights = {c: 0.0 for c in names}
    n = None
    for _ in range(iterations):
        z = None
        for c in names:
            term = F.lit(weights[c]) * F.col(c)
            z = term if z is None else z + term
        g = F.when(z >= F.col("_y"), F.lit(1.0 - tau)).otherwise(
            F.lit(-tau)
        )
        aggs = [F.count("*").alias("_n")] + [
            F.sum(
                F.floor(g * F.col(c) * F.lit(1e9) + F.lit(0.5)).cast("bigint")
            ).alias(f"_g_{c}")
            for c in names
        ]
        row = feats.agg(*aggs).first()
        n = row["_n"]
        for c in names:
            # float(g) first — replays SQL's CAST(g AS DOUBLE)/1e9
            step = lr * ((float(row[f"_g_{c}"]) / 1e9) / n)
            w = weights[c] - step
            weights[c] = math.floor(w * 1e9 + 0.5) / 1e9
    feats.unpersist()
    spark = df.sparkSession
    out_cols = [F.lit(n).cast("bigint").alias("n")] + [
        F.lit(weights[c]).alias(f"w_{c}" if c != "_bias" else "w_bias")
        for c in names
    ]
    return spark.range(1).select(*out_cols)
