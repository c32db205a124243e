"""Model-evaluation metrics as reusable operators (probe twins live in
probes/evaluation.py). All metrics keep integer state until one final
division — see the probes module docstring for the portability
contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from flytemosaic_spark.operators.text import portable_round


def roc_auc(
    scored: DataFrame, score_col: str, label_col: str, n_buckets: int | None = None
) -> DataFrame:
    """Exact tie-corrected ROC AUC via the Mann-Whitney rank sum.

    ``score_col`` must be numeric (it is the rank order); ``label_col``
    is 0/1. Average ranks are accumulated in integer HALF-RANK units
    (2*cum_before + n + 1) in DECIMAL(38,0) — the rank sum passes
    int64 around ~1e9 rows per slice (sum ≈ n_pos·2N), which is not
    exotic at the 100 TB design point, and DuckDB's sum(BIGINT) is
    already hugeint; 128-bit decimal keeps Spark exact at any scale.
    The exclusive rank cumsum runs through
    :func:`plans.prefix.distributed_cumsum` — bounded per-task state
    at any score cardinality, never a single-partition window.
    Returns one row: (n_pos, n_neg, auc).
    """
    v = (
        scored.select(
            F.col(score_col).alias("sc"),
            F.col(label_col).cast("bigint").alias("y"),
        )
        .groupBy("sc")
        .agg(F.count("*").alias("n"), F.sum("y").alias("np"))
    )
    return roc_auc_from_counts(v, n_buckets=n_buckets)


def roc_auc_from_counts(
    v: DataFrame, n_buckets: int | None = None
) -> DataFrame:
    """:func:`roc_auc` over a pre-aggregated (sc, n, np) table — one
    row per distinct score value with its row count and positive
    count. This is the accumulation path itself, exposed so overflow
    tests can feed synthetic counts past the int64 boundary without
    materializing 1e9 raw rows."""
    from flytemosaic_spark.plans.prefix import distributed_cumsum

    r = distributed_cumsum(v, "sc", "n", out_col="cum", n_buckets=n_buckets)
    # DECIMAL(38,0): half-rank units overflow int64 near 1e9 rows
    rp2 = F.col("np").cast("decimal(38,0)") * (
        2 * (F.col("cum") - F.col("n")) + F.col("n") + F.lit(1)
    )
    t = r.agg(
        F.sum(rp2).alias("rp2"),
        F.sum("np").alias("npos"),
        F.sum(F.col("n") - F.col("np")).alias("nneg"),
    )
    # subtract in decimal BEFORE the double cast: the numerator is
    # 2*n_pos*n_neg*AUC, potentially tiny next to rp2 ~ n_pos*2N —
    # a double-side subtraction would cancel catastrophically
    num = F.col("rp2") - F.col("npos").cast("decimal(38,0)") * (
        F.col("npos") + F.lit(1)
    )
    return t.select(
        F.col("npos").alias("n_pos"),
        F.col("nneg").alias("n_neg"),
        portable_round(
            num.cast("double")
            / (F.lit(2.0) * F.col("npos") * F.col("nneg")),
            6,
        ).alias("auc"),
    )


def roc_auc_by(
    scored: DataFrame, group_col: str, score_col: str, label_col: str
) -> DataFrame:
    """Per-group exact tie-corrected ROC AUC (Mann-Whitney), the
    segment-wise readout next to :func:`roc_auc`'s global one.

    Same DECIMAL(38,0) half-rank units as :func:`roc_auc` (a single
    segment can pass 1e9 rows at the design point); the rank cumsum
    here is a window partitioned by group — but over the (group,
    score) AGGREGATE, so a partition holds at most |distinct scores in
    group| rows no matter how many raw rows the group had. Degenerate
    one-class groups report NULL instead of dividing by zero
    (ANSI-safe, and the oracle CASEs identically).
    """
    v = (
        scored.select(
            F.col(group_col).alias("grp"),
            F.col(score_col).alias("sc"),
            F.col(label_col).cast("bigint").alias("y"),
        )
        .groupBy("grp", "sc")
        .agg(F.count("*").alias("n"), F.sum("y").alias("np"))
    )
    return roc_auc_by_from_counts(v)


def roc_auc_by_from_counts(v: DataFrame) -> DataFrame:
    """:func:`roc_auc_by` over a pre-aggregated (grp, sc, n, np)
    table — the accumulation path, exposed for past-int64 overflow
    tests (same rationale as :func:`roc_auc_from_counts`)."""
    from pyspark.sql import Window

    w = (
        Window.partitionBy("grp")
        .orderBy("sc")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    r = v.withColumn("cb", F.coalesce(F.sum("n").over(w), F.lit(0)))
    rp2 = F.col("np").cast("decimal(38,0)") * (
        2 * F.col("cb") + F.col("n") + F.lit(1)
    )
    t = r.groupBy("grp").agg(
        F.sum(rp2).alias("rp2"),
        F.sum("np").alias("npos"),
        F.sum(F.col("n") - F.col("np")).alias("nneg"),
    )
    num = F.col("rp2") - F.col("npos").cast("decimal(38,0)") * (
        F.col("npos") + F.lit(1)
    )
    return t.select(
        "grp",
        F.col("npos").alias("n_pos"),
        F.col("nneg").alias("n_neg"),
        F.when(
            (F.col("npos") > 0) & (F.col("nneg") > 0),
            portable_round(
                num.cast("double")
                / (F.lit(2.0) * F.col("npos") * F.col("nneg")),
                6,
            ),
        ).alias("auc"),
    )


def mrr_map_at_k(
    ranked: DataFrame,
    rel_col: str = "rel",
    n_relevant_col: str = "n_relevant",
    k: int = 10,
) -> DataFrame:
    """Mean Reciprocal Rank and Mean Average Precision @ k from a
    ranked candidate table.

    ``ranked`` holds (q_id, rank, rel, n_relevant): one row per
    retrieved candidate, ``rank`` 1-based and gap-free per query,
    ``rel`` 0/1 relevance, ``n_relevant`` the query's total relevant
    count in the corpus (the AP normalizer is min(n_relevant, k) — the
    standard "best achievable @k" denominator).

    All state is integer until the final divisions (RR = rel/rank
    maxed per query; P@i = cum_rel/i), so the means are bit-identical
    across engines and partitionings before the output rounding.

    Plan: one bounded window per query (<= k rows each), two
    partial-aggregating groupBys. Output: one row (n_queries, mrr,
    map_at_k).
    """
    from pyspark.sql import Window

    w = (
        Window.partitionBy("q_id")
        .orderBy("rank")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    rel = F.col(rel_col).cast("double")
    per_hit = ranked.select(
        "q_id",
        "rank",
        rel.alias("_rel"),
        F.col(n_relevant_col).alias("_nrel"),
    ).withColumn("_cumrel", F.sum("_rel").over(w))
    per_q = per_hit.groupBy("q_id").agg(
        F.max(F.col("_rel") / F.col("rank")).alias("_rr"),
        (
            F.sum(F.col("_rel") * F.col("_cumrel") / F.col("rank"))
            / F.greatest(F.least(F.max("_nrel"), F.lit(float(k))), F.lit(1.0))
        ).alias("_ap"),
    )
    return per_q.agg(
        F.count("*").alias("n_queries"),
        portable_round(F.avg("_rr"), 6).alias("mrr"),
        portable_round(F.avg("_ap"), 6).alias("map_at_k"),
    )


def cuped_ab(
    df: DataFrame,
    key,
    x,
    y,
    arm_frac: float = 0.5,
    seed_tag: str = "cuped",
) -> DataFrame:
    """CUPED variance-reduced A/B readout (Deng et al., WSDM 2013):
    adjust the post-period metric y by the pre-period covariate x —
    y' = y - theta * (x - mean(x)), theta = cov(x, y) / var(x) — and
    report per-arm means and variances before/after adjustment. The
    standard way an experimentation pipeline halves its confidence
    intervals without more traffic.

    Exactness at scale: x is integer-valued and y enters as integer
    cents, so EVERY moment (sum x, sum y, sum xy, sum x², sum y²) is
    an exact integer aggregate — sum y² is accumulated in
    DECIMAL(38,0) (the x168 recipe; ~5e19 at 15k rows already exceeds
    int64) — and theta, the arm means, and the variances are fixed
    arithmetic expressions over those integers, quantized once at the
    end. No float summation anywhere, so the result is engine- and
    partitioning-exact with no per-row rounding.

    Arms split by md5(key) at ``arm_frac``. Variances use the moment
    identity var(y') = var(y) - 2 theta cov(x,y) + theta² var(x) per
    arm, so the adjusted rows are never materialized. Returns one row
    per arm: (arm, n, mean_y, mean_y_cuped, var_y, var_y_cuped,
    var_reduction_pct).
    """
    from flytemosaic_spark.operators.sampling import hash_bucket, rate_threshold

    thr = rate_threshold(arm_frac)
    base = df.select(
        F.when(
            hash_bucket(
                F.concat(F.lit(seed_tag + ":"), key.cast("string"))
            )
            < F.lit(thr),
            F.lit("A"),
        )
        .otherwise(F.lit("B"))
        .alias("arm"),
        x.cast("bigint").alias("_x"),
        F.floor(y * 100 + F.lit(0.5)).cast("bigint").alias("_yc"),
    )
    m = base.groupBy("arm").agg(
        F.count("*").alias("n"),
        F.sum("_x").alias("sx"),
        F.sum("_yc").alias("sy"),
        F.sum(F.col("_x") * F.col("_yc")).alias("sxy"),
        F.sum(F.col("_x") * F.col("_x")).alias("sxx"),
        F.sum((F.col("_yc") * F.col("_yc")).cast("decimal(38,0)")).alias("syy"),
    )
    g = m.groupBy().agg(
        F.sum("n").alias("tn"),
        F.sum("sx").alias("tsx"),
        F.sum("sy").alias("tsy"),
        F.sum("sxy").alias("tsxy"),
        F.sum("sxx").alias("tsxx"),
    )
    # global theta and x-mean from exact integer moments
    gq = g.select(
        portable_round(
            (F.col("tn") * F.col("tsxy") - F.col("tsx") * F.col("tsy"))
            / (F.col("tn") * F.col("tsxx") - F.col("tsx") * F.col("tsx")).cast(
                "double"
            ),
            6,
        ).alias("theta"),
        portable_round(F.col("tsx") / F.col("tn"), 6).alias("xbar"),
    )
    nd = F.col("n").cast("double")
    mean_y = F.col("sy") / nd
    mean_x = F.col("sx") / nd
    var_y = F.col("syy").cast("double") / nd - mean_y * mean_y
    var_x = F.col("sxx") / nd - mean_x * mean_x
    cov_xy = F.col("sxy") / nd - mean_x * mean_y
    var_adj = (
        var_y
        - F.lit(2.0) * F.col("theta") * cov_xy
        + F.col("theta") * F.col("theta") * var_x
    )
    return (
        m.crossJoin(F.broadcast(gq))
        .select(
            "arm",
            "n",
            portable_round(mean_y / 100.0, 6).alias("mean_y"),
            portable_round(
                (mean_y - F.col("theta") * (mean_x - F.col("xbar"))) / 100.0, 6
            ).alias("mean_y_cuped"),
            portable_round(var_y / 10000.0, 4).alias("var_y"),
            portable_round(var_adj / 10000.0, 4).alias("var_y_cuped"),
            portable_round(
                (F.lit(1.0) - var_adj / var_y) * 100.0, 4
            ).alias("var_reduction_pct"),
        )
        .orderBy("arm")
    )


def diff_in_diff(
    df: DataFrame,
    arm_col,
    post_col,
    cents_col,
) -> DataFrame:
    """Difference-in-differences estimator — the panel-data companion
    to CUPED (:func:`cuped_ab`): DID = (ȳ_treat,post − ȳ_treat,pre) −
    (ȳ_ctrl,post − ȳ_ctrl,pre) removes both the arm-level baseline gap
    and the common time trend; SE from the four cells' pooled
    variances (Welch-style Σ s²_g/n_g).

    ``arm_col``/``post_col`` are boolean columns (deterministic md5
    arms upstream), ``cents_col`` exact integer units — every cell
    moment is an exact BIGINT / DECIMAL(38,0) sum (Σy² follows the
    x168 recipe), so means, variances, DID, SE, and z are all fixed
    arithmetic: engine- and partitioning-exact at the 1e-6 grain. One
    (arm, post) partial-aggregating shuffle to FOUR rows, then a 1-row
    conditional rollup.

    Returns one row: (n, mean_treat_pre, mean_treat_post,
    mean_ctrl_pre, mean_ctrl_post, did, se, z).
    """
    dec = "decimal(38,0)"
    cents = F.col(cents_col) if isinstance(cents_col, str) else cents_col
    cells = (
        df.select(
            arm_col.cast("boolean").alias("_a"),
            post_col.cast("boolean").alias("_p"),
            cents.cast("bigint").alias("_c"),
        )
        .groupBy("_a", "_p")
        .agg(
            F.count("*").alias("_n"),
            F.sum("_c").alias("_s"),
            F.sum(F.col("_c").cast(dec) * F.col("_c").cast(dec)).alias("_ss"),
        )
    )

    def _cell(a: bool, p: bool, col: str):
        return F.max(
            F.when((F.col("_a") == a) & (F.col("_p") == p), F.col(col))
        )

    one = cells.groupBy().agg(
        *[
            _cell(a, p, c).alias(f"_{c[1:]}_{int(a)}{int(p)}")
            for a in (True, False)
            for p in (True, False)
            for c in ("_n", "_s", "_ss")
        ]
    )

    def _mean(a: int, p: int):
        return (
            F.col(f"_s_{a}{p}")
            / F.col(f"_n_{a}{p}").cast("double")
            / F.lit(100.0)
        )

    def _var(a: int, p: int):
        # sample variance in cents² via the moment identity
        n = F.col(f"_n_{a}{p}").cast("double")
        return (
            F.col(f"_ss_{a}{p}").cast("double")
            - F.col(f"_s_{a}{p}").cast("double")
            * F.col(f"_s_{a}{p}").cast("double")
            / n
        ) / (n - 1)

    did = (_mean(1, 1) - _mean(1, 0)) - (_mean(0, 1) - _mean(0, 0))
    se = (
        F.sqrt(
            _var(1, 1) / F.col("_n_11").cast("double")
            + _var(1, 0) / F.col("_n_10").cast("double")
            + _var(0, 1) / F.col("_n_01").cast("double")
            + _var(0, 0) / F.col("_n_00").cast("double")
        )
        / F.lit(100.0)
    )
    total = (
        F.col("_n_11") + F.col("_n_10") + F.col("_n_01") + F.col("_n_00")
    )
    return one.select(
        total.cast("bigint").alias("n"),
        portable_round(_mean(1, 0), 6).alias("mean_treat_pre"),
        portable_round(_mean(1, 1), 6).alias("mean_treat_post"),
        portable_round(_mean(0, 0), 6).alias("mean_ctrl_pre"),
        portable_round(_mean(0, 1), 6).alias("mean_ctrl_post"),
        portable_round(did, 6).alias("did"),
        portable_round(se, 6).alias("se"),
        portable_round(did / se, 6).alias("z"),
    )


def weighted_median_by(
    df: DataFrame,
    group_col: str,
    value_col,
    weight_col,
) -> DataFrame:
    """Exact weighted median per group: the smallest value v such that
    the cumulative weight of rows ≤ v reaches half the group's total
    (the lower weighted median — deterministic, no interpolation).
    The robust center when rows carry importance (revenue-weighted
    latency, token-weighted quality).

    One (group, value) partial-aggregating shuffle, then the
    cumulative weight runs over the AGGREGATE — value-cardinality
    rows per group, NOT data-scale (a low-cardinality group key would
    otherwise sort the whole fact table in a handful of window
    partitions; the roc_auc_by move). Weights and the 2·cum ≥ tot
    boundary test are exact integers, so the selected value is
    engine-identical (no rate/ratio floats anywhere).

    Returns (group, n, total_w, wmedian).
    """
    from pyspark.sql import Window

    value = F.col(value_col) if isinstance(value_col, str) else value_col
    weight = F.col(weight_col) if isinstance(weight_col, str) else weight_col
    agg = (
        df.select(
            F.col(group_col).alias("_g"),
            value.cast("bigint").alias("_v"),
            weight.cast("bigint").alias("_w"),
        )
        .groupBy("_g", "_v")
        .agg(F.sum("_w").alias("_wv"), F.count("*").alias("_cnt"))
    )
    w_cum = (
        Window.partitionBy("_g")
        .orderBy("_v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy("_g")
    ranked = agg.select(
        "_g",
        "_v",
        F.sum("_wv").over(w_cum).alias("_cw"),
        F.sum("_wv").over(w_all).alias("_tw"),
        F.sum("_cnt").over(w_all).alias("_n"),
    )
    return (
        ranked.where(2 * F.col("_cw") >= F.col("_tw"))
        .groupBy("_g")
        .agg(
            F.max("_n").alias("n"),
            F.max("_tw").alias("total_w"),
            F.min("_v").alias("wmedian"),
        )
        .select(
            F.col("_g").alias("grp"), "n", "total_w", "wmedian"
        )
    )


def winsorized_mean_by(
    df: DataFrame,
    group_col: str,
    cents_col,
    pct: int = 5,
) -> DataFrame:
    """Winsorized mean per group: values below the group's p-th /
    above the (100−p)-th percentile are CLAMPED to those bounds (not
    dropped — the estimator keeps n constant, unlike trimming) before
    averaging. The outlier-robust mean for heavy-tailed metrics.

    Percentile bounds are exact nearest-rank order statistics
    computed over the (group, value) AGGREGATE — value-cardinality
    rows per group, never data-scale (a low-cardinality group key
    would otherwise sort the fact table in a handful of window
    partitions; the roc_auc_by move): bound index =
    max(1, ceil(p/100·n)) / n+1−that in integer arithmetic, the bound
    value is the smallest value whose cumulative count reaches the
    index. The winsorized sum is Σ clamp(value)·count over the same
    aggregate — an exact BIGINT with NO join back to raw rows — so
    the mean is one fixed division: engine-identical.

    Returns (group, n, lo_bound, hi_bound, wins_mean).
    """
    from pyspark.sql import Window

    from flytemosaic_spark.operators.text import portable_round

    cents = F.col(cents_col) if isinstance(cents_col, str) else cents_col
    agg = (
        df.select(
            F.col(group_col).alias("_g"), cents.cast("bigint").alias("_c")
        )
        .groupBy("_g", "_c")
        .agg(F.count("*").alias("_cnt"))
    )
    w_cum = (
        Window.partitionBy("_g")
        .orderBy("_c")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    ranked = agg.select(
        "_g",
        "_c",
        "_cnt",
        F.sum("_cnt").over(w_cum).alias("_cum"),
        F.sum("_cnt").over(Window.partitionBy("_g")).alias("_n"),
    ).localCheckpoint()
    lo_idx = F.greatest(
        F.lit(1), F.ceil(F.col("_n") * pct / F.lit(100)).cast("bigint")
    )
    hi_idx = F.col("_n") + 1 - lo_idx
    bounds = (
        ranked.select(
            "_g",
            "_c",
            "_cum",
            lo_idx.alias("_li"),
            hi_idx.alias("_hi_i"),
        )
        .groupBy("_g")
        .agg(
            F.min(F.when(F.col("_cum") >= F.col("_li"), F.col("_c"))).alias(
                "_lo"
            ),
            F.min(
                F.when(F.col("_cum") >= F.col("_hi_i"), F.col("_c"))
            ).alias("_hi"),
        )
    )
    clamped = ranked.join(F.broadcast(bounds), "_g").select(
        "_g",
        "_n",
        "_lo",
        "_hi",
        (
            F.least(F.greatest(F.col("_c"), F.col("_lo")), F.col("_hi"))
            * F.col("_cnt")
        ).alias("_cc"),
    )
    return (
        clamped.groupBy("_g")
        .agg(
            F.max("_n").alias("n"),
            F.max("_lo").alias("lo_bound"),
            F.max("_hi").alias("hi_bound"),
            portable_round(
                F.sum("_cc") / F.max("_n").cast("double") / F.lit(100.0), 6
            ).alias("wins_mean"),
        )
        .select(F.col("_g").alias("grp"), "n", "lo_bound", "hi_bound", "wins_mean")
    )


def hhi_by(
    df: DataFrame,
    market_col: str,
    member_col: str,
    cents_col,
) -> DataFrame:
    """Herfindahl–Hirschman concentration index per market:
    HHI = Σ_i (s_i/S)² over member revenue shares — the
    dominance/concentration readout next to Gini (x168, inequality)
    and Pareto (x169, how-many-carry-80%).

    Per-(market, member) revenue sums are exact integer cents; the
    index is Σ s_i² / S² computed as EXACT DECIMAL(38,0) integer
    cross-multiplication (no per-member share floats) with ONE double
    division at the end — engine- and partitioning-exact. Two
    partial-aggregating shuffles: (market, member), then market.

    Returns (market, n_members, hhi) — HHI in [1/n, 1], ·10000 for
    the antitrust convention.
    """
    from flytemosaic_spark.operators.text import portable_round

    cents = F.col(cents_col) if isinstance(cents_col, str) else cents_col
    dec = "decimal(38,0)"
    per = (
        df.select(
            F.col(market_col).alias("_m"),
            F.col(member_col).alias("_i"),
            cents.cast("bigint").alias("_c"),
        )
        .groupBy("_m", "_i")
        .agg(F.sum("_c").alias("_s"))
    )
    agg = per.groupBy("_m").agg(
        F.count("*").alias("n_members"),
        F.sum(F.col("_s").cast(dec) * F.col("_s").cast(dec)).alias("_sq"),
        F.sum("_s").alias("_tot"),
    )
    return agg.select(
        F.col("_m").alias("market"),
        "n_members",
        portable_round(
            F.col("_sq").cast("double")
            / (
                F.col("_tot").cast(dec) * F.col("_tot").cast(dec)
            ).cast("double"),
            6,
        ).alias("hhi"),
    )


def cliffs_delta(
    df: DataFrame,
    arm_col,
    score_col: str,
    n_buckets: int | None = None,
) -> DataFrame:
    """Cliff's delta — the nonparametric A/B effect size:
    δ = P(x_A > x_B) − P(x_A < x_B) ∈ [−1, 1], the magnitude number a
    significance test (x185 SPRT, x203 DID) does not give you. δ is
    the Mann–Whitney statistic re-scaled (δ = 2·AUC − 1 with arm A as
    the positive label), so it reuses :func:`roc_auc`'s EXACT
    tie-corrected rank-sum machinery: DECIMAL(38,0) half-rank units,
    distributed cumsum, one double division at the end — computed
    directly from the exact numerator (not from the rounded AUC).

    Returns one row: (n_a, n_b, delta, magnitude) — magnitude per the
    standard |δ| cuts (0.147 / 0.33 / 0.474: Romano et al. 2006).
    """
    from flytemosaic_spark.plans.prefix import distributed_cumsum

    arm = F.col(arm_col) if isinstance(arm_col, str) else arm_col
    v = (
        df.select(
            F.col(score_col).alias("sc"), arm.cast("bigint").alias("y")
        )
        .groupBy("sc")
        .agg(F.count("*").alias("n"), F.sum("y").alias("np"))
    )
    r = distributed_cumsum(v, "sc", "n", out_col="cum", n_buckets=n_buckets)
    rp2 = F.col("np").cast("decimal(38,0)") * (
        2 * (F.col("cum") - F.col("n")) + F.col("n") + F.lit(1)
    )
    t = r.agg(
        F.sum(rp2).alias("rp2"),
        F.sum("np").alias("npos"),
        F.sum(F.col("n") - F.col("np")).alias("nneg"),
    )
    num = F.col("rp2") - F.col("npos").cast("decimal(38,0)") * (
        F.col("npos") + F.lit(1)
    )
    # delta = 2*AUC - 1 = num/(npos*nneg) - 1, from the EXACT numerator
    delta = portable_round(
        num.cast("double")
        / (F.col("npos").cast("double") * F.col("nneg").cast("double"))
        - F.lit(1.0),
        6,
    )
    mag = (
        F.when(F.abs(F.col("delta")) < 0.147, F.lit("negligible"))
        .when(F.abs(F.col("delta")) < 0.33, F.lit("small"))
        .when(F.abs(F.col("delta")) < 0.474, F.lit("medium"))
        .otherwise(F.lit("large"))
    )
    return (
        t.select(
            F.col("npos").cast("bigint").alias("n_a"),
            F.col("nneg").cast("bigint").alias("n_b"),
            delta.alias("delta"),
        )
        .select("n_a", "n_b", "delta", mag.alias("magnitude"))
    )


def brown_forsythe(
    df: DataFrame,
    group_col: str,
    cents_col,
) -> DataFrame:
    """Brown–Forsythe variance-homogeneity test (Levene with group
    MEDIANS — the robust form): F = ((N−k)/(k−1)) · between/within
    over z = |x − median_g|. The "are these segments' variances even
    comparable" gate in front of any pooled-variance readout (x66,
    x203).

    Exactness chain: group medians are exact lower medians from the
    (group, value) aggregate cumulative (the x206 machinery, never a
    data-scale window); z values are exact integer cents; Σz / Σz²
    are BIGINT / DECIMAL(38,0); the k per-group (Σz_g)²/n_g terms are
    quantized to 1e-6 integer units BEFORE their k-term sum (x212
    rule); F is one fixed-arithmetic expression.

    Returns one row: (k, n, f_stat).
    """
    from pyspark.sql import Window

    cents = F.col(cents_col) if isinstance(cents_col, str) else cents_col
    dec = "decimal(38,0)"
    s = df.select(
        F.col(group_col).alias("_g"), cents.cast("bigint").alias("_c")
    )
    agg = s.groupBy("_g", "_c").agg(F.count("*").alias("_cnt"))
    w_cum = (
        Window.partitionBy("_g")
        .orderBy("_c")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    ranked = agg.select(
        "_g",
        "_c",
        F.sum("_cnt").over(w_cum).alias("_cum"),
        F.sum("_cnt").over(Window.partitionBy("_g")).alias("_ng"),
    )
    med = (
        ranked.where(2 * F.col("_cum") >= F.col("_ng"))
        .groupBy("_g")
        .agg(F.min("_c").alias("_med"))
    )
    z = s.join(F.broadcast(med), "_g").select(
        "_g", F.abs(F.col("_c") - F.col("_med")).alias("_z")
    )
    per = z.groupBy("_g").agg(
        F.count("*").alias("_n"),
        F.sum("_z").alias("_sz"),
        F.sum(F.col("_z").cast(dec) * F.col("_z").cast(dec)).alias("_szz"),
    )
    term = F.floor(
        (F.col("_sz").cast(dec) * F.col("_sz").cast(dec)).cast("double")
        / F.col("_n").cast("double")
        * F.lit(1e6)
        + F.lit(0.5)
    ).cast(dec)
    g = per.groupBy().agg(
        F.count("*").alias("_k"),
        F.sum("_n").alias("_nn"),
        F.sum("_sz").alias("_s"),
        F.sum("_szz").alias("_ss"),
        F.sum(term).alias("_bt"),
    )
    from flytemosaic_spark.operators.text import portable_round

    bt = F.col("_bt").cast("double") / F.lit(1e6)
    corr = (
        F.col("_s").cast(dec) * F.col("_s").cast(dec)
    ).cast("double") / F.col("_nn").cast("double")
    between = bt - corr
    within = F.col("_ss").cast("double") - bt
    f_stat = (
        (F.col("_nn") - F.col("_k")).cast("double")
        / (F.col("_k") - 1).cast("double")
        * F.try_divide(between, within)
    )
    return g.select(
        F.col("_k").cast("bigint").alias("k"),
        F.col("_nn").cast("bigint").alias("n"),
        portable_round(f_stat, 6).alias("f_stat"),
    )


def isotonic_fit(
    scored: DataFrame,
    score_col,
    label_col,
    n_buckets: int = 1000,
) -> DataFrame:
    """Weighted isotonic regression of an integer-valued label against
    a score on a QUANTIZED score axis — the monotone calibration curve
    (Zadrozny & Elkan 2002's isotonic calibration; the
    sklearn-IsotonicRegression readout a model-eval pipeline runs
    before trusting probabilities).

    Exact via the minimax characterization: with buckets i ordered by
    quantized score, fitted[i] = max_{j<=i} min_{k>=i} wavg(y, j..k).
    The score axis is quantized to round(score * n_buckets) — a
    PROVABLY bounded axis (<= n_buckets+1 observed buckets for scores
    in [0, 1]), so the O(B²) (j, k) grid is constant-size regardless
    of data scale: ONE data-scale aggregation reduces the input to
    (bucket, w, s), prefix sums run on :func:`plans.prefix.
    bounded_window` (the sanctioned bounded-axis window), the grid is
    a bounded crossJoin (<= B² ~ 1e6 cells), the inner min is a
    per-j suffix-min window (partitions <= B), and the outer max is a
    plain groupBy — no iteration, no driver-side PAVA stack.

    Determinism: w and s are exact integer sums, every grid average is
    one division of exact integers, and min/max over identical IEEE
    doubles is engine-identical — the only rounding is the final 1e-6
    output grain. Equivalent to sequential PAVA (equivalence-tested
    against a numpy pool-adjacent-violators reference).

    Returns (bucket, score_mid, n, rate, iso_rate) ordered by bucket:
    ``iso_rate`` is non-decreasing in ``bucket``.
    """
    from flytemosaic_spark.plans.prefix import bounded_window

    s_col = F.col(score_col) if isinstance(score_col, str) else score_col
    y_col = F.col(label_col) if isinstance(label_col, str) else label_col
    b = F.floor(s_col * F.lit(float(n_buckets)) + F.lit(0.5)).cast("bigint")
    agg = scored.groupBy(b.alias("b")).agg(
        F.count("*").alias("w"), F.sum(y_col.cast("bigint")).alias("s")
    )
    from pyspark.sql.window import Window as _W

    # (cumulative minus own) = exclusive prefix, so a(j, k) needs only
    # each endpoint row's cumulatives
    wcum = bounded_window("b").rowsBetween(_W.unboundedPreceding, 0)
    c = agg.select(
        "b",
        "w",
        "s",
        F.sum("w").over(wcum).alias("cw"),
        F.sum("s").over(wcum).alias("cs"),
    )
    j = c.select(
        F.col("b").alias("bj"),
        (F.col("cw") - F.col("w")).alias("cwx"),
        (F.col("cs") - F.col("s")).alias("csx"),
    )
    k = c.select(
        F.col("b").alias("bk"), F.col("cw").alias("cwk"), F.col("cs").alias("csk")
    )
    grid = j.join(k, F.col("bj") <= F.col("bk")).select(
        "bj",
        "bk",
        (
            (F.col("csk") - F.col("csx"))
            / (F.col("cwk") - F.col("cwx")).cast("double")
        ).alias("a"),
    )
    w_suf = (
        _W.partitionBy("bj")
        .orderBy(F.desc("bk"))
        .rowsBetween(_W.unboundedPreceding, 0)
    )
    fit = (
        grid.select("bj", "bk", F.min("a").over(w_suf).alias("m"))
        .groupBy(F.col("bk").alias("b"))
        .agg(F.max("m").alias("_iso"))
    )
    return (
        agg.join(fit, "b")
        .select(
            F.col("b").alias("bucket"),
            portable_round(F.col("b") / F.lit(float(n_buckets)), 6).alias(
                "score_mid"
            ),
            F.col("w").alias("n"),
            portable_round(
                F.col("s") / F.col("w").cast("double"), 6
            ).alias("rate"),
            portable_round(F.col("_iso"), 6).alias("iso_rate"),
        )
        .orderBy("bucket")
    )


def ece_bins(
    df: DataFrame,
    score_col: str,
    label_col: str,
    bins: int = 10,
    scale: int = 1000,
) -> DataFrame:
    """Expected-calibration-error bins — the reliability-diagram
    aggregate behind every model-calibration report (next to x217's
    isotonic recalibration and x106's ROC): scores in [0, 1) bucket
    into ``bins`` equal-width bins; each bin emits INTEGER stats
    (count, positives, score sum at ``scale``) plus its ECE numerator
    ``|scale * n_pos - score_sum|`` — so
    ``ECE = sum(ece_num) / (scale * N)`` is exact rational
    arithmetic and the oracle needs no float rounding contract at
    all. One scan + one ``bins``-row aggregation; flat at any
    scale."""
    s = F.col(score_col)
    return (
        df.select(
            # s == 1.0 (clipped probabilities) joins the top bin instead
            # of landing in an out-of-range bin == bins.
            F.least(F.floor(s * bins), F.lit(bins - 1)).cast("int").alias("bin"),
            F.col(label_col).cast("long").alias("y"),
            F.floor(s * scale + F.lit(0.5)).cast("long").alias("sk"),
        )
        .groupBy("bin")
        .agg(
            F.count("*").alias("n"),
            F.sum("y").alias("n_pos"),
            F.sum("sk").alias("conf_sum_k"),
        )
        .select(
            "bin",
            "n",
            "n_pos",
            "conf_sum_k",
            F.abs(
                F.lit(scale) * F.col("n_pos") - F.col("conf_sum_k")
            ).alias("ece_num"),
        )
    )
