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
from flytemosaic_spark.plans.prefix import (
    distributed_cumsum,
)


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
    # both ECDFs in ONE bucketed pass (r5 — was two nested
    # decompositions, each with its own quantile probe and window)
    cum = distributed_cumsum(
        per_value, "v", ["_na", "_nb"], out_col=["_ca", "_cb"]
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


def chi2_independence(
    df: DataFrame,
    col_a: str,
    col_b: str,
    crit_05: float,
) -> DataFrame:
    """Pearson chi-square test of independence between two categorical
    columns — the drift/bias screen for "did the label mix shift per
    cohort?" over a training table.

    One (a, b) partial-aggregating shuffle builds the contingency
    table; marginals are two more category-scale aggregates; the full
    grid (including observed-zero cells, which still contribute
    (0 - e)^2 / e) is the category-scale marginal crossJoin
    left-joined against the observed cells. Expected counts are exact
    integer products divided once; per-cell terms are quantized at
    1e-9 before the final sum (cell count is category², so the float
    sum's order wobble sits ~1e-15 under the 1e-6 output grain).

    ``crit_05`` is the caller-supplied 5% critical value for the
    table's degrees of freedom (the engine does not ship a chi-square
    inverse-CDF; dof is emitted so the caller can audit the pairing).

    Returns one row: (n, dof, chi2, crit_05, independent).
    """
    # category²-scale; checkpoint so the marginals, total, and grid
    # all read this tiny table instead of re-scanning the fact input
    obs = (
        df.groupBy(F.col(col_a).alias("_a"), F.col(col_b).alias("_b"))
        .agg(F.count("*").alias("_o"))
        .localCheckpoint()
    )
    ra = obs.groupBy("_a").agg(F.sum("_o").alias("_na"))
    cb = obs.groupBy("_b").agg(F.sum("_o").alias("_nb"))
    tot = obs.groupBy().agg(F.sum("_o").alias("_n"))
    grid = (
        ra.crossJoin(cb)
        .join(obs, ["_a", "_b"], "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "_n",
            "_na",
            "_nb",
            F.coalesce(F.col("_o"), F.lit(0)).alias("_o"),
            ((F.col("_na") * F.col("_nb")) / F.col("_n").cast("double")).alias("_e"),
        )
        .select(
            "_n",
            portable_round(
                (F.col("_o") - F.col("_e")) * (F.col("_o") - F.col("_e"))
                / F.col("_e"),
                9,
            ).alias("_term"),
        )
    )
    nra = ra.groupBy().agg(F.count("*").alias("_ka"))
    ncb = cb.groupBy().agg(F.count("*").alias("_kb"))
    return (
        grid.groupBy("_n")
        .agg(portable_round(F.sum("_term"), 6).alias("chi2"))
        .crossJoin(F.broadcast(nra))
        .crossJoin(F.broadcast(ncb))
        .select(
            F.col("_n").cast("bigint").alias("n"),
            ((F.col("_ka") - 1) * (F.col("_kb") - 1)).cast("bigint").alias("dof"),
            "chi2",
            F.lit(float(crit_05)).alias("crit_05"),
            (F.col("chi2") <= F.lit(float(crit_05))).cast("int").alias("independent"),
        )
    )


def sprt_bernoulli(
    df: DataFrame,
    order_col: str,
    success: "F.Column",
    p0: float,
    p1: float,
    alpha: float = 0.05,
    beta: float = 0.2,
) -> DataFrame:
    """Wald's sequential probability ratio test over a Bernoulli
    stream: H0 p = p0 vs H1 p = p1, stopping at the first observation
    whose cumulative log-likelihood ratio exits
    (ln(beta/(1-alpha)), ln((1-beta)/alpha)) — the always-valid
    early-stopping A/B gate (decide with ~half the fixed-horizon n).

    Batch-replay shape: cumulative successes and trial counts in
    ``order_col`` (arrival) order come from
    ONE multi-value pass of
    :func:`flytemosaic_spark.plans.prefix.distributed_cumsum`
    (cumulative successes and cumulative ones — ``order_col`` is
    unique by contract, so the ones-cumsum IS the row number) —
    bounded per-task state at any stream length; the crossing is a 1-row min aggregate joined back to read
    off the stopping state.

    Determinism: the LLR is s_t * L1 + (n_t - s_t) * L0 with L1/L0
    computed ONCE in Python and injected as literals — both engines
    multiply identical doubles by exact integer cumulatives, so the
    crossing row is engine-identical with no quantization at the
    decision boundary (the bounds are irrational; ties cannot occur).

    Returns one row: (decision, n_obs, successes, llr, lower, upper)
    — decision in ('accept_h0', 'accept_h1', 'continue'), stats taken
    at the stopping row (or the final row when no bound is crossed).
    """
    import math

    l1 = math.log(p1 / p0)
    l0 = math.log((1.0 - p1) / (1.0 - p0))
    upper = math.log((1.0 - beta) / alpha)
    lower = math.log(beta / (1.0 - alpha))

    base = df.select(
        F.col(order_col).cast("bigint").alias("_t"),
        success.cast("bigint").alias("_x"),
        F.lit(1).cast("bigint").alias("_1"),
    )
    # ONE bucketed pass for both running sums (successes + trial
    # count; _t is unique-by-contract so cumsum of ones == row
    # number), then checkpoint: three subplans read `cum` (the
    # crossing min, the last-row max, the readout filter) and would
    # otherwise re-execute the full decomposition each — the x191
    # share-don't-recompute rule (r5: 5.1 s -> 2.2 s hot at sf0.1)
    cum = distributed_cumsum(
        base, "_t", ["_x", "_1"], out_col=["_s", "_n"]
    ).select(
        "_t",
        "_n",
        "_s",
        (
            F.col("_s") * F.lit(l1) + (F.col("_n") - F.col("_s")) * F.lit(l0)
        ).alias("_llr"),
    ).localCheckpoint()
    stop = cum.where(
        (F.col("_llr") >= F.lit(upper)) | (F.col("_llr") <= F.lit(lower))
    ).groupBy().agg(F.min("_n").alias("_n_stop"))
    last = cum.groupBy().agg(F.max("_n").alias("_n_last"))
    return (
        cum.crossJoin(F.broadcast(stop))
        .crossJoin(F.broadcast(last))
        .where(F.col("_n") == F.coalesce(F.col("_n_stop"), F.col("_n_last")))
        .select(
            F.when(F.col("_llr") >= F.lit(upper), F.lit("accept_h1"))
            .when(F.col("_llr") <= F.lit(lower), F.lit("accept_h0"))
            .otherwise(F.lit("continue"))
            .alias("decision"),
            F.col("_n").alias("n_obs"),
            F.col("_s").alias("successes"),
            portable_round(F.col("_llr"), 6).alias("llr"),
            portable_round(F.lit(lower), 6).alias("lower"),
            portable_round(F.lit(upper), 6).alias("upper"),
        )
    )


def mutual_info(df: DataFrame, col_a: str, col_b: str) -> DataFrame:
    """Mutual information (nats) between two categorical columns, plus
    marginal entropies and the sqrt-normalized NMI — the
    information-theoretic twin of :func:`chi2_independence` (MI ranks
    feature relevance on a comparable scale; chi-square tests a
    yes/no hypothesis).

    Same execution shape as the chi-square test: one (a, b)
    partial-aggregating shuffle, category-scale marginals broadcast
    back. Only observed cells contribute (0·ln 0 = 0 by convention,
    so no zero-cell grid is needed). All count products are exact
    integers; per-cell terms are quantized at 1e-9 before the
    category²-bounded sums and the outputs at 1e-6.

    Returns one row: (n, mi, h_a, h_b, nmi).
    """
    # category²-scale; checkpoint so the marginals, total, and MI sum
    # all read this tiny table instead of re-scanning the fact input
    obs = (
        df.groupBy(F.col(col_a).alias("_a"), F.col(col_b).alias("_b"))
        .agg(F.count("*").alias("_o"))
        .localCheckpoint()
    )
    ra = obs.groupBy("_a").agg(F.sum("_o").alias("_na"))
    cb = obs.groupBy("_b").agg(F.sum("_o").alias("_nb"))
    tot = obs.groupBy().agg(F.sum("_o").alias("_n"))
    mi = (
        obs.join(F.broadcast(ra), "_a")
        .join(F.broadcast(cb), "_b")
        .crossJoin(F.broadcast(tot))
        .select(
            "_n",
            portable_round(
                (F.col("_o") / F.col("_n").cast("double"))
                * F.log(
                    (F.col("_o") * F.col("_n"))
                    / (F.col("_na") * F.col("_nb")).cast("double")
                ),
                9,
            ).alias("_t"),
        )
        .groupBy("_n")
        .agg(portable_round(F.sum("_t"), 6).alias("mi"))
    )
    ha = (
        ra.crossJoin(F.broadcast(tot))
        .select(
            portable_round(
                -(F.col("_na") / F.col("_n").cast("double"))
                * F.log(F.col("_na") / F.col("_n").cast("double")),
                9,
            ).alias("_t")
        )
        .groupBy()
        .agg(portable_round(F.sum("_t"), 6).alias("h_a"))
    )
    hb = (
        cb.crossJoin(F.broadcast(tot))
        .select(
            portable_round(
                -(F.col("_nb") / F.col("_n").cast("double"))
                * F.log(F.col("_nb") / F.col("_n").cast("double")),
                9,
            ).alias("_t")
        )
        .groupBy()
        .agg(portable_round(F.sum("_t"), 6).alias("h_b"))
    )
    return (
        mi.crossJoin(F.broadcast(ha))
        .crossJoin(F.broadcast(hb))
        .select(
            F.col("_n").cast("bigint").alias("n"),
            "mi",
            "h_a",
            "h_b",
            portable_round(
                F.col("mi") / F.sqrt(F.col("h_a") * F.col("h_b")), 6
            ).alias("nmi"),
        )
    )


def js_divergence(
    df: DataFrame,
    group_col: str,
    token_col: str,
    group_a: str,
    group_b: str,
) -> DataFrame:
    """Jensen–Shannon divergence between two groups' categorical
    (token) distributions — the symmetric, bounded ([0, ln 2])
    companion to PSI (x92) and MI (x189): the standard "how far apart
    are these two corpora" number for domain-mixture monitoring and
    contamination triage, finite even on disjoint supports where KL
    blows up.

    One token-count shuffle with conditional partial aggregates (both
    groups counted in the same pass — no second scan), 1-row totals
    broadcast; JS = ½ KL(P‖M) + ½ KL(Q‖M) with M = (P+Q)/2 over
    observed cells only (0·ln 0 = 0). Per-token terms are quantized to
    1e-9 integer units and summed in BIGINT — vocabulary-scale sums
    with zero float-order sensitivity (terms are ≤ ln 2, so even 2^52
    tokens stay inside the bigint range).

    Returns one row: (vocab, n_a, n_b, js).
    """
    two = df.where(F.col(group_col).isin([group_a, group_b]))
    cnt = two.groupBy(F.col(token_col).alias("_w")).agg(
        F.sum((F.col(group_col) == group_a).cast("bigint")).alias("_ca"),
        F.sum((F.col(group_col) == group_b).cast("bigint")).alias("_cb"),
    )
    tot = cnt.groupBy().agg(
        F.sum("_ca").alias("_na"), F.sum("_cb").alias("_nb")
    )
    p = F.col("_ca") / F.col("_na").cast("double")
    q = F.col("_cb") / F.col("_nb").cast("double")
    m = (p + q) / F.lit(2.0)
    term = F.when(F.col("_ca") > 0, p * F.log(p / m) / F.lit(2.0)).otherwise(
        F.lit(0.0)
    ) + F.when(F.col("_cb") > 0, q * F.log(q / m) / F.lit(2.0)).otherwise(
        F.lit(0.0)
    )
    units = F.floor(term * 1e9 + F.lit(0.5)).cast("bigint")
    return (
        cnt.crossJoin(F.broadcast(tot))
        .select(F.col("_na"), F.col("_nb"), units.alias("_u"))
        .groupBy("_na", "_nb")
        .agg(F.count("*").alias("vocab"), F.sum("_u").alias("_su"))
        .select(
            "vocab",
            F.col("_na").cast("bigint").alias("n_a"),
            F.col("_nb").cast("bigint").alias("n_b"),
            portable_round(F.col("_su") / F.lit(1e9), 6).alias("js"),
        )
    )


def conditional_entropy_rate(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    state_col: str,
    tiebreak_col: str,
) -> DataFrame:
    """Entropy rate of the empirical event-flow Markov chain:
    H(next | current) = −Σ_{ij} p(i,j)·ln p(j|i) over per-key adjacent
    transitions — the predictability number for session flows (low =
    rigid funnels, high ≈ H(next) = no sequential structure). Also
    reports H(next) and their difference (the information the current
    state carries about the next — the sequential-signal readout).

    Transitions come from a key-PARTITIONED lead window (key is
    data-scale — a real partitioning); everything after is
    category²-scale: exact integer cell/marginal counts, per-cell
    terms quantized to 1e-9 integer units and summed in BIGINT (the
    x189 recipe).

    Returns one row: (n_transitions, h_cond, h_next, seq_info).
    """
    from pyspark.sql import Window

    w = Window.partitionBy(key_col).orderBy(ts_col, tiebreak_col)
    tr = (
        df.select(
            F.col(state_col).alias("_cur"),
            F.lead(F.col(state_col)).over(w).alias("_nxt"),
        )
        .where(F.col("_nxt").isNotNull())
        .groupBy("_cur", "_nxt")
        .agg(F.count("*").alias("_o"))
        .localCheckpoint()
    )
    ri = tr.groupBy("_cur").agg(F.sum("_o").alias("_ni"))
    cj = tr.groupBy("_nxt").agg(F.sum("_o").alias("_nj"))
    tot = tr.groupBy().agg(F.sum("_o").alias("_n"))
    hcond_units = F.floor(
        (F.col("_o") / F.col("_n").cast("double"))
        * F.log(F.col("_ni") / F.col("_o").cast("double"))
        * F.lit(1e9)
        + F.lit(0.5)
    ).cast("bigint")
    hc = (
        tr.join(F.broadcast(ri), "_cur")
        .crossJoin(F.broadcast(tot))
        .select(F.col("_n"), hcond_units.alias("_u"))
        .groupBy("_n")
        .agg(F.sum("_u").alias("_su"))
        .select(
            "_n", portable_round(F.col("_su") / F.lit(1e9), 6).alias("h_cond")
        )
    )
    hnext_units = F.floor(
        (F.col("_nj") / F.col("_n").cast("double"))
        * F.log(F.col("_n") / F.col("_nj").cast("double"))
        * F.lit(1e9)
        + F.lit(0.5)
    ).cast("bigint")
    hn = (
        cj.crossJoin(F.broadcast(tot))
        .select(hnext_units.alias("_u"))
        .groupBy()
        .agg(
            portable_round(F.sum("_u") / F.lit(1e9), 6).alias("h_next")
        )
    )
    return (
        hc.crossJoin(F.broadcast(hn))
        .select(
            F.col("_n").cast("bigint").alias("n_transitions"),
            "h_cond",
            "h_next",
            portable_round(F.col("h_next") - F.col("h_cond"), 6).alias(
                "seq_info"
            ),
        )
    )
