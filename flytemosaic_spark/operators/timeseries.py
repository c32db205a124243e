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

    # The dense series is |keys| x n_days rows (metadata scale) but its
    # upstream is the corpus scan+aggregate, and it feeds four subplans
    # (per-key moments, the z side, the mean series twice) — the x191
    # small-derived-frame rule: localCheckpoint it so the corpus scan
    # runs once (static plan read the events scan 16x; measured at
    # sf0.1 the checkpointed form is ~2x faster and results identical).
    series = daily_series(events, n_days=n_days).localCheckpoint()
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


def autocorrelation(
    series: DataFrame,
    t_col: str,
    v_col: str,
    max_lag: int = 7,
) -> DataFrame:
    """Autocorrelation function of an integer-valued series at lags
    1..``max_lag`` — the seasonality/persistence diagnostic (a daily
    ingest-volume series with acf[7] >> acf[1] says "weekly pattern";
    a near-1 acf[1] says "trend — difference before modeling").

    ``series`` must already be aggregated to one row per ``t_col``
    (e.g. a daily-counts table — time-scale, not data-scale; the
    heavy fact-to-series rollup happens upstream in one shuffle).
    ``t_col`` is an integer time index with unit steps; gaps are the
    caller's responsibility (densify upstream if the series can skip
    periods).

    r_L = sum_{t} (c_t - mean)(c_{t+L} - mean) / sum_t (c_t - mean)²
    with the full-series mean (the standard biased ACF estimator).
    Every aggregate is an exact integer sum (S_xy, head/tail sums,
    S, SS); the mean enters once as a fixed arithmetic expression, so
    the output is engine-exact at the 1e-6 grain. The lag pairing is
    a time-scale self-join on t+L (category-scale exchange); global
    moments are a 1-row broadcast.

    Returns (lag, n_pairs, acf).
    """
    s = series.select(
        F.col(t_col).cast("bigint").alias("_t"),
        F.col(v_col).cast("bigint").alias("_c"),
    )
    g = s.groupBy().agg(
        F.count("*").alias("_n"),
        F.sum("_c").alias("_s"),
        F.sum(F.col("_c") * F.col("_c")).alias("_ss"),
    )
    lags = s.sparkSession.range(1, max_lag + 1).select(
        F.col("id").alias("lag")
    )
    a = s.select(F.col("_t"), F.col("_c").alias("_ca"))
    b = s.select(F.col("_t").alias("_tb"), F.col("_c").alias("_cb"))
    pairs = (
        a.crossJoin(F.broadcast(lags))
        .join(b, F.col("_tb") == F.col("_t") + F.col("lag"))
        .groupBy("lag")
        .agg(
            F.count("*").alias("n_pairs"),
            F.sum(F.col("_ca") * F.col("_cb")).alias("_sxy"),
            F.sum("_ca").alias("_sh"),
            F.sum("_cb").alias("_st"),
        )
    )
    from flytemosaic_spark.operators.text import portable_round

    cbar = F.col("_s") / F.col("_n").cast("double")
    num = (
        F.col("_sxy")
        - cbar * (F.col("_sh") + F.col("_st"))
        + F.col("n_pairs") * cbar * cbar
    )
    den = F.col("_ss") - F.col("_n") * cbar * cbar
    return (
        pairs.crossJoin(F.broadcast(g))
        .select(
            F.col("lag").cast("bigint").alias("lag"),
            "n_pairs",
            portable_round(num / den, 6).alias("acf"),
        )
        .orderBy("lag")
    )


def theil_sen_slope(
    df: DataFrame,
    t_col,
    v_col,
    sample_budget: int = 300,
    seed_tag: str = "ts",
    key_col: str = "event_id",
) -> DataFrame:
    """Theil–Sen robust trend estimate: the median of pairwise slopes
    (v_j - v_i)/(t_j - t_i) over a deterministic md5 sample — the
    drift-monitoring slope that one outlier batch cannot bend (50%
    breakdown point vs 0% for OLS).

    All-pairs over the FULL data is quadratic by definition, so the
    estimator runs on a FIXED-BUDGET md5 sample: the 16-bit bucket
    threshold is derived in-plan from the exact row count
    (ceil(budget·65536/n), double floor exact while n < ~1e10 because
    |a/n − k| ≥ 1/n > ulp), so the expected sample — and therefore the
    pair join — stays ~budget² at ANY corpus size (a rate-based sample
    grows the pair stage quadratically with data; the 10× sweep showed
    12×). The classical result needs only a few hundred points for a
    stable median; budget ≥ n takes everything. Deterministic,
    retry/engine-stable. The median is the exact middle order
    statistic(s) selected by global rank over a
    :func:`flytemosaic_spark.plans.prefix.bounded_window` — the slope
    table is ≤ budget² rows BY CONSTRUCTION at any corpus size, the
    provably-bounded case that helper exists for (r10: the previous
    distributed_row_number decomposition paid an approxQuantile job
    plus bucket/offset machinery to parallelize a ~45k-row sort;
    slopes quantized at 1e-9 pre-rank, ties broken by the pair key).

    Returns one row: (n_sample, n_pairs, slope) — slope = lower
    middle for odd pair counts, mean of the two middles for even.
    """
    from flytemosaic_spark.operators.sampling import fixed_budget_sample
    from flytemosaic_spark.operators.text import portable_round
    from flytemosaic_spark.plans.prefix import bounded_window

    base = df.select(
        F.col(key_col).cast("bigint").alias("_k"),
        F.col(t_col).cast("double").alias("_t"),
        F.col(v_col).cast("double").alias("_v"),
    )
    s = fixed_budget_sample(base, "_k", sample_budget, seed_tag)
    n_sample = s.groupBy().agg(F.count("*").alias("n_sample"))
    a, b = s.alias("a"), s.alias("b")
    slopes = (
        a.join(b, F.col("a._k") < F.col("b._k"))
        .where(F.col("b._t") != F.col("a._t"))
        .select(
            F.col("a._k").alias("_ka"),
            F.col("b._k").alias("_kb"),
            # try_divide, not /: ANSI evaluates the projection inside
            # the same codegen stage as the filter, so a plain divide
            # still sees the dt == 0 rows the WHERE discards
            portable_round(
                F.try_divide(
                    F.col("b._v") - F.col("a._v"),
                    F.col("b._t") - F.col("a._t"),
                ),
                9,
            ).alias("_m"),
        )
    )
    n_pairs = slopes.groupBy().agg(F.count("*").alias("n_pairs"))
    ranked = slopes.withColumn(
        "_rn",
        F.row_number()
        .over(bounded_window("_m", F.col("_m"), F.col("_ka"), F.col("_kb")))
        .cast("bigint"),
    )
    mid = (
        ranked.crossJoin(F.broadcast(n_pairs))
        .where(
            (F.col("_rn") == F.floor((F.col("n_pairs") + 1) / 2))
            | (F.col("_rn") == F.floor(F.col("n_pairs") / 2) + 1)
        )
        .groupBy()
        .agg(portable_round(F.avg("_m"), 6).alias("slope"))
    )
    return (
        n_sample.crossJoin(F.broadcast(n_pairs))
        .crossJoin(F.broadcast(mid))
        .select("n_sample", "n_pairs", "slope")
    )


def cross_correlation(
    series: DataFrame,
    t_col: str,
    x_col: str,
    y_col: str,
    max_lag: int = 3,
) -> DataFrame:
    """Lagged cross-correlation between two integer-valued series on
    the same time index — the lead/lag detector (does volume move
    before value, or after?): r at lag L is the Pearson correlation of
    (x_t, y_{t+L}) over the overlapping window, for L in
    [-max_lag, +max_lag]. The argmax lag says which series leads.

    ``series`` must be pre-aggregated to one row per ``t_col`` with
    INTEGER x/y (counts, cents — the caller quantizes): every moment
    (Σx, Σy, Σxy, Σxx, Σyy) is then an exact integer, the cross/square
    sums carried in DECIMAL(38,0) (the x168 recipe), and r is fixed
    arithmetic over exact integers — engine- and partitioning-exact.
    Time-scale self-join on t+L against a constant (2·max_lag+1)-row
    broadcast lag grid; degenerate windows (zero variance) return NULL
    via try_divide.

    Returns (lag, n_pairs, r) ordered by lag.
    """
    from flytemosaic_spark.operators.text import portable_round

    s = series.select(
        F.col(t_col).cast("bigint").alias("_t"),
        F.col(x_col).cast("bigint").alias("_x"),
        F.col(y_col).cast("bigint").alias("_y"),
    )
    lags = s.sparkSession.range(-max_lag, max_lag + 1).select(
        F.col("id").alias("lag")
    )
    a = s.select("_t", "_x")
    b = s.select(F.col("_t").alias("_tb"), "_y")
    dec = "decimal(38,0)"
    mo = (
        a.crossJoin(F.broadcast(lags))
        .join(b, F.col("_tb") == F.col("_t") + F.col("lag"))
        .groupBy("lag")
        .agg(
            F.count("*").alias("n_pairs"),
            F.sum("_x").alias("_sx"),
            F.sum("_y").alias("_sy"),
            F.sum(F.col("_x").cast(dec) * F.col("_y").cast(dec)).alias("_sxy"),
            F.sum(F.col("_x").cast(dec) * F.col("_x").cast(dec)).alias("_sxx"),
            F.sum(F.col("_y").cast(dec) * F.col("_y").cast(dec)).alias("_syy"),
        )
    )
    n = F.col("n_pairs").cast(dec)
    num = n * F.col("_sxy") - F.col("_sx").cast(dec) * F.col("_sy").cast(dec)
    vx = n * F.col("_sxx") - F.col("_sx").cast(dec) * F.col("_sx").cast(dec)
    vy = n * F.col("_syy") - F.col("_sy").cast(dec) * F.col("_sy").cast(dec)
    r = F.try_divide(
        num.cast("double"),
        F.sqrt(vx.cast("double")) * F.sqrt(vy.cast("double")),
    )
    return (
        mo.select(
            F.col("lag").cast("bigint").alias("lag"),
            "n_pairs",
            portable_round(r, 6).alias("r"),
        )
        .orderBy("lag")
    )


def mann_kendall(
    df: DataFrame,
    t_col,
    v_col,
    sample_budget: int = 300,
    seed_tag: str = "mk",
    key_col: str = "event_id",
) -> DataFrame:
    """Mann–Kendall trend TEST — the hypothesis-test companion to the
    Theil–Sen slope (same fixed-budget sample machinery): S = Σ
    sign(v_j − v_i) over time-ordered pairs; under H0 (no trend) S is
    ~N(0, var) with var = [n(n−1)(2n+5) − Σ_g t_g(t_g−1)(2t_g+5)]/18
    (the tie-group correction over duplicated values). Pairs with tied
    timestamps are excluded from S (one-observation-per-time is the
    test's premise; the md5 sample makes exact ts collisions rare).

    Everything is exact integer arithmetic (sign sums, tie counts,
    the var numerator) except the final z = (S ∓ 1)/sqrt(var) — fixed
    arithmetic, 1e-6 grain. The pair join is budget², constant at any
    corpus size.

    Returns one row: (n_sample, s_stat, z).
    """
    from flytemosaic_spark.operators.sampling import fixed_budget_sample
    from flytemosaic_spark.operators.text import portable_round

    base = df.select(
        F.col(key_col).cast("bigint").alias("_k"),
        F.col(t_col).cast("double").alias("_t"),
        F.col(v_col).cast("double").alias("_v"),
    )
    s = fixed_budget_sample(base, "_k", sample_budget, seed_tag)
    n_sample = s.groupBy().agg(F.count("*").alias("n_sample"))
    a = s.select(
        F.col("_t").alias("_ta"), F.col("_v").alias("_va"),
        F.col("_k").alias("_kab"),
    )
    b = s.select(F.col("_t").alias("_tb"), F.col("_v").alias("_vb"))
    ss = (
        a.join(b, F.col("_ta") < F.col("_tb"))
        .groupBy()
        .agg(
            F.sum(
                F.signum(F.col("_vb") - F.col("_va")).cast("bigint")
            ).alias("s_stat")
        )
    )
    ties = (
        s.groupBy("_v")
        .agg(F.count("*").alias("_tg"))
        .groupBy()
        .agg(
            F.sum(
                F.col("_tg") * (F.col("_tg") - 1) * (2 * F.col("_tg") + 5)
            ).alias("_tie_term")
        )
    )
    n = F.col("n_sample")
    var_num = n * (n - 1) * (2 * n + 5) - F.col("_tie_term")
    z = F.when(
        F.col("s_stat") > 0,
        (F.col("s_stat") - 1)
        / F.sqrt(var_num.cast("double") / F.lit(18.0)),
    ).when(
        F.col("s_stat") < 0,
        (F.col("s_stat") + 1)
        / F.sqrt(var_num.cast("double") / F.lit(18.0)),
    ).otherwise(F.lit(0.0))
    return (
        n_sample.crossJoin(F.broadcast(ss))
        .crossJoin(F.broadcast(ties))
        .select("n_sample", "s_stat", portable_round(z, 6).alias("z"))
    )


def mean_shift_split(
    series: DataFrame,
    t_col: str,
    v_col: str,
) -> DataFrame:
    """Single change-point detection by binary segmentation (first
    split): the time index k maximizing the between-segment sum of
    squares n1·n2·(m1 − m2)²/n — the series-level "when did the mean
    move" detector (CUSUM x110 flags per-key anomalies; this names the
    corpus-level break day).

    ``series`` is one row per ``t_col`` with INTEGER ``v_col`` (cents,
    counts — caller quantizes). Prefix sums over the bounded time axis
    via :func:`flytemosaic_spark.plans.prefix.bounded_window` (exact
    BIGINT cumsums), candidate scores as fixed arithmetic per row,
    argmax via ORDER BY (score desc, t) LIMIT 1 — engine-identical.

    Returns one row: (split_t, n_before, n_after, mean_before,
    mean_after, score) — the split is the LAST time index of the
    "before" segment.
    """
    from pyspark.sql import Window

    from flytemosaic_spark.operators.text import portable_round
    from flytemosaic_spark.plans.prefix import bounded_window

    s = series.select(
        F.col(t_col).cast("bigint").alias("_t"),
        F.col(v_col).cast("bigint").alias("_v"),
    )
    g = s.groupBy().agg(F.count("*").alias("_n"), F.sum("_v").alias("_sv"))
    w = bounded_window("_t", F.col("_t").asc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    pre = s.select(
        "_t",
        F.count("*").over(w).alias("_n1"),
        F.sum("_v").over(w).alias("_c1"),
    )
    n1 = F.col("_n1").cast("double")
    n2 = (F.col("_n") - F.col("_n1")).cast("double")
    m1 = F.col("_c1") / n1
    m2 = (F.col("_sv") - F.col("_c1")) / n2
    score = portable_round(
        n1 * n2 * (m1 - m2) * (m1 - m2) / F.col("_n").cast("double"), 6
    )
    return (
        pre.crossJoin(F.broadcast(g))
        .where(F.col("_n1") < F.col("_n"))
        .select(
            F.col("_t").alias("split_t"),
            F.col("_n1").cast("bigint").alias("n_before"),
            (F.col("_n") - F.col("_n1")).cast("bigint").alias("n_after"),
            portable_round(m1, 6).alias("mean_before"),
            portable_round(m2, 6).alias("mean_after"),
            score.alias("score"),
        )
        .orderBy(F.desc("score"), F.asc("split_t"))
        .limit(1)
    )


def seasonal_strength(
    series: DataFrame,
    t_col: str,
    v_col: str,
    period: int = 7,
) -> DataFrame:
    """Seasonal strength of an integer series: the share of variance
    explained by the time-index phase (t mod period) — R² of the
    one-way phase ANOVA, between-SS / total-SS. Near 1 = hard weekly
    pattern (model per-DOW), near 0 = no calendar structure. The
    quantitative companion to the ACF peak (x190).

    between = Σ_d s_d²/n_d − S²/N and total = SS − S²/N from EXACT
    integer sums only (phase sums/counts, global S/SS — DECIMAL(38,0)
    squares per the x168 recipe), combined in one fixed-arithmetic
    expression: engine-exact at 1e-6. ``series`` is time-scale (one
    row per t); phase rollup is a period-cardinality aggregate.

    Returns one row: (n_periods, period, strength).
    """
    from flytemosaic_spark.operators.text import portable_round

    dec = "decimal(38,0)"
    s = series.select(
        (F.col(t_col).cast("bigint") % period).alias("_d"),
        F.col(v_col).cast("bigint").alias("_v"),
    )
    ph = s.groupBy("_d").agg(
        F.count("*").alias("_nd"), F.sum("_v").alias("_sd")
    )
    # per-phase s_d²/n_d quantized to 1e-6 integer units BEFORE the
    # (period-cardinality) sum — a bare float sum would be engine-
    # order-sensitive even over 7 terms; DECIMAL keeps it exact at
    # any magnitude
    between_num = ph.select(
        F.floor(
            (F.col("_sd").cast(dec) * F.col("_sd").cast(dec)).cast("double")
            / F.col("_nd").cast("double")
            * F.lit(1e6)
            + F.lit(0.5)
        )
        .cast(dec)
        .alias("_t")
    )
    g = s.groupBy().agg(
        F.count("*").alias("_n"),
        F.sum("_v").alias("_s"),
        F.sum(F.col("_v").cast(dec) * F.col("_v").cast(dec)).alias("_ss"),
    )
    bt = between_num.groupBy().agg(F.sum("_t").alias("_b"))
    corr = (
        F.col("_s").cast(dec) * F.col("_s").cast(dec)
    ).cast("double") / F.col("_n").cast("double")
    strength = F.try_divide(
        F.col("_b").cast("double") / F.lit(1e6) - corr,
        F.col("_ss").cast("double") - corr,
    )
    return (
        g.crossJoin(F.broadcast(bt))
        .select(
            F.col("_n").cast("bigint").alias("n_periods"),
            F.lit(period).cast("bigint").alias("period"),
            portable_round(strength, 6).alias("strength"),
        )
    )


def ljung_box(
    series: DataFrame,
    t_col: str,
    v_col: str,
    max_lag: int = 7,
    critical: float = 14.067,
) -> DataFrame:
    """Ljung–Box portmanteau whiteness test on the series' ACF:
    Q = n(n+2) Σ_{k≤h} r_k²/(n−k), ~χ²(h) under "no autocorrelation"
    — the formal yes/no on top of :func:`autocorrelation`'s per-lag
    readout (a residual/ingest series failing it has structure a
    model should absorb). ``critical`` defaults to the χ²(7) 5% value.

    Built literally on :func:`autocorrelation`'s output (r_k already
    engine-identical at 1e-6; n recovered as n_pairs + lag), the h
    per-lag r²/(n−k) terms quantized to 1e-12 integer units before
    their h-term sum (the x212 rule), Q one fixed-arithmetic
    expression.

    Returns one row: (n_obs, h, q_stat, reject_white).
    """
    from flytemosaic_spark.operators.text import portable_round

    acf = autocorrelation(series, t_col, v_col, max_lag=max_lag)
    # n - k is exactly n_pairs (the lag-k overlap length)
    units = F.floor(
        F.col("acf")
        * F.col("acf")
        / F.col("n_pairs").cast("double")
        * F.lit(1e12)
        + F.lit(0.5)
    ).cast("bigint")
    g = acf.select(
        (F.col("n_pairs") + F.col("lag")).alias("_n"),
        units.alias("_u"),
    ).groupBy().agg(
        F.max("_n").alias("_n"),
        F.count("*").alias("h"),
        F.sum("_u").alias("_su"),
    )
    q = (
        F.col("_n").cast("double")
        * (F.col("_n") + 2).cast("double")
        * (F.col("_su") / F.lit(1e12))
    )
    return g.select(
        F.col("_n").cast("bigint").alias("n_obs"),
        F.col("h").cast("bigint").alias("h"),
        portable_round(q, 6).alias("q_stat"),
        (portable_round(q, 6) > F.lit(critical)).alias("reject_white"),
    )
