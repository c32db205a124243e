"""Deterministic sampling operators for training-data pipelines.

Sampling at 100 TB must be reproducible (retries and re-runs must
select the same rows), stratified (per-language / per-source rates),
and shuffle-free (a pure filter that Catalyst can push toward the
scan). All three follow from hashing a stable key into a uniform
bucket and comparing against a per-stratum threshold — no ``rand()``
(non-deterministic under task retry), no sort, no state.

The bucket is the first 4 hex chars of md5(key): md5 is chosen over
``hash()``/``xxhash64`` deliberately — Spark's ``hash`` family is
process-salted for strings and has no cross-engine twin, while every
engine agrees on md5 of a decimal string, so splits are auditable
bit-for-bit from any system (see the DuckDB oracles in probes/).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from flytemosaic_spark.operators.text import portable_round

HEX_BUCKETS = 1 << 16  # 4 hex chars -> 65536 uniform buckets


def hash_bucket(key: Column) -> Column:
    """Uniform 16-bit bucket as a 4-char lowercase hex string.

    String comparison against a zero-padded hex threshold is exactly
    numeric comparison, so thresholds stay sargable string literals.
    """
    return F.substring(F.md5(key.cast("string")), 1, 4)


def rate_threshold(rate: float) -> str:
    """Hex threshold t with  P(bucket < t) = floor(rate·65536)/65536."""
    return format(int(rate * HEX_BUCKETS), "04x")


def stratified_sample(
    df: DataFrame,
    rates: dict[str, float],
    strata_col: str,
    key_col: str,
    default_rate: float = 0.0,
) -> DataFrame:
    """Keep each stratum at its own rate (e.g. downsample the majority
    language) with one deterministic filter — no shuffle, no rand()."""
    thr = F.lit(rate_threshold(default_rate))
    for stratum, rate in sorted(rates.items()):
        thr = F.when(
            F.col(strata_col) == stratum, F.lit(rate_threshold(rate))
        ).otherwise(thr)
    return df.where(hash_bucket(F.col(key_col)) < thr)


def split_label(
    key: Column,
    splits: tuple[tuple[str, float], ...] = (("test", 0.1), ("valid", 0.1)),
    default: str = "train",
) -> Column:
    """The split label as a pure column expression of the key — usable
    on any column (e.g. both sides of a near-dup pair in a leakage
    audit), not just a designated key column."""
    bucket = hash_bucket(key)
    expr = None
    cum = 0.0
    for name, frac in splits:
        cum += frac
        cond = bucket < F.lit(rate_threshold(cum))
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    return expr.otherwise(default) if expr is not None else F.lit(default)


def split_assign(
    df: DataFrame,
    key_col: str,
    splits: tuple[tuple[str, float], ...] = (("test", 0.1), ("valid", 0.1)),
    default: str = "train",
) -> DataFrame:
    """Tag every row with a stable train/valid/test split label via
    cumulative bucket ranges. Membership depends only on the key, so
    the split survives re-partitioning, re-ingestion, and engine swaps
    — the property a contamination audit needs."""
    return df.withColumn("split", split_label(F.col(key_col), splits, default))


def domain_mix(
    df: DataFrame,
    weights: dict[str, float],
    strata_col: str,
    key_col: str,
    total: int,
) -> DataFrame:
    """Compose a fixed-size training mix with exact per-domain counts
    (e.g. 50% en / 30% code / 20% rest of a 10M-doc budget).

    Where :func:`stratified_sample` filters at a *rate* (shuffle-free
    but approximate counts), curriculum mixing needs exact counts per
    domain: rank each stratum by the deterministic md5 order (an
    unbiased uniform permutation, reproducible under retry) and keep
    the first floor(weight·total) rows. One exchange on the stratum
    key; the rank is a per-stratum window, so no global sort. Strata
    missing from ``weights`` are dropped (weight 0).
    """
    from pyspark.sql.window import Window

    w = Window.partitionBy(strata_col).orderBy(
        hash_bucket(F.col(key_col)), F.col(key_col)
    )
    quota = F.lit(0)
    for stratum, weight in sorted(weights.items()):
        quota = F.when(
            F.col(strata_col) == stratum, F.lit(int(weight * total))
        ).otherwise(quota)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= quota)
        .drop("_rn")
    )


def weighted_sample(
    df: DataFrame,
    key_col: str,
    weight: Column,
) -> DataFrame:
    """Deterministic weighted Bernoulli sample: keep a row with
    probability ``weight`` (clamped to [0,1]), decided purely by the
    key's hash — so the sample is reproducible under retries,
    re-partitioning, and engine swaps, unlike ``rand() < w``.

    This is importance sampling for corpus curation (e.g. keep long /
    high-quality documents proportionally more often): a pure filter,
    no shuffle, pushed toward the scan by Catalyst.
    """
    u = F.conv(hash_bucket(F.col(key_col)), 16, 10).cast("int") / F.lit(
        float(HEX_BUCKETS)
    )
    return df.where(u < F.least(F.greatest(weight, F.lit(0.0)), F.lit(1.0)))


# Poisson(1) CDF thresholds for the bootstrap weight draw: a uniform u
# maps to weight w = #{k : u >= P(X <= k)}, k = 0..7 (P(X > 8) ~ 1e-6).
# Computed once in Python and injected as literals into BOTH engines'
# expressions, so the per-(row, replicate) weights are bit-identical.
_POISSON1_CDF = []
_acc, _term = 0.0, 2.718281828459045**-1
for _k in range(8):
    _acc += _term
    _POISSON1_CDF.append(_acc)
    _term /= _k + 1


def poisson_bootstrap_ci(
    df: DataFrame,
    key: Column,
    group: Column,
    y: Column,
    n_replicates: int = 64,
    ci: float = 0.95,
    seed_tag: str = "pb",
) -> DataFrame:
    """Per-group mean with a bootstrap confidence interval via
    deterministic Poisson resampling — the resampling scheme that
    works at any scale (Chamandy et al., Google 2012): instead of
    drawing n rows with replacement (which needs global coordination),
    each row enters replicate b with weight ~ Poisson(1), an
    independent per-row draw.

    The draw is the md5-uniform of (seed_tag, key, b) pushed through
    the Poisson(1) inverse CDF (literal thresholds, identical in every
    engine), so the full bootstrap reproduces under retry,
    re-partitioning, and engine swap. Execution: one map-side explode
    by replicate id (no shuffle), one (group, replicate)
    partial-aggregating shuffle carrying group x B weighted partials,
    then a bounded B-row window per group ranks the replicate means
    for the percentile CI.

    Returns (group, n, mean, ci_lo, ci_hi) — replicate means quantized
    at 1e-6 before ranking (ties broken by replicate id), the CI
    endpoints are the ceil(B*(1-ci)/2)-th and (B+1-that)-th order
    statistics of the B means.
    """
    from pyspark.sql import Window

    b_ids = F.explode(F.sequence(F.lit(0), F.lit(n_replicates - 1))).alias("_b")
    base = df.select(
        key.cast("string").alias("_key"),
        group.alias("_g"),
        y.cast("double").alias("_y"),
    )
    u = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat_ws(
                        ":", F.lit(seed_tag), F.col("_key"), F.col("_b")
                    )
                ),
                1,
                13,
            ),
            16,
            10,
        ).cast("double")
        / F.lit(float(16**13))
    )
    w = None
    for c in _POISSON1_CDF:
        ind = (u >= F.lit(c)).cast("int")
        w = ind if w is None else w + ind
    reps = (
        base.select("_key", "_g", "_y", b_ids)
        .withColumn("_w", w)
        .groupBy("_g", "_b")
        .agg(
            F.sum(F.col("_w") * F.col("_y")).alias("_wy"),
            F.sum("_w").alias("_sw"),
        )
        .select(
            "_g",
            "_b",
            (
                F.floor(F.col("_wy") / F.col("_sw") * 1e6 + F.lit(0.5)) / 1e6
            ).alias("_m"),
        )
    )
    import math as _math

    wnd = Window.partitionBy("_g").orderBy("_m", "_b")
    lo_rank = max(1, _math.ceil(n_replicates * (1.0 - ci) / 2))
    hi_rank = n_replicates + 1 - lo_rank
    ranked = reps.withColumn("_rk", F.row_number().over(wnd))
    bounds = (
        ranked.where(F.col("_rk").isin(lo_rank, hi_rank))
        .groupBy("_g")
        .agg(F.min("_m").alias("ci_lo"), F.max("_m").alias("ci_hi"))
    )
    point = base.groupBy("_g").agg(
        F.count("*").alias("n"),
        (F.floor(F.avg("_y") * 1e6 + F.lit(0.5)) / 1e6).alias("mean"),
    )
    return (
        point.join(bounds, "_g")
        .select(
            F.col("_g").alias("grp"), "n", "mean", "ci_lo", "ci_hi"
        )
    )


def fixed_budget_sample(
    df: DataFrame, key_col: str, budget: int, seed_tag: str
) -> DataFrame:
    """Deterministic md5 sample whose EXPECTED size is ``budget`` rows
    at ANY input size: the 16-bit bucket threshold
    ceil(budget·65536/n) is derived in-plan from the exact row count
    (1-row broadcast; the double floor is exact while n < ~1e10
    because |a/n − k| ≥ 1/n > ulp), so downstream quadratic stages
    (pairwise joins) stay ~budget² as data grows — a RATE-based sample
    grows them quadratically. budget ≥ n saturates the threshold and
    takes everything. Retry/engine-stable; the DuckDB oracle replays
    the identical threshold and filter.

    The returned sample is localCheckpoint-materialized (~budget rows):
    callers fan it into several subplans (self-join sides, count
    aggregates), and without the checkpoint EACH reference re-executes
    the full-corpus md5 filter — the 30x sweep showed the Theil-Sen
    estimator re-scanning 18M rows eight times (43.9s) for a 300-row
    sample.
    """
    th = df.groupBy().agg(
        F.floor(
            (F.lit(budget).cast("bigint") * 65536 + F.count("*") - 1)
            / F.count("*")
        )
        .cast("bigint")
        .alias("_fbs_tt")
    )
    return (
        df.crossJoin(F.broadcast(th))
        .where(
            (F.col("_fbs_tt") >= 65536)
            | (
                hash_bucket(
                    F.concat(
                        F.lit(seed_tag + ":"), F.col(key_col).cast("string")
                    )
                )
                < F.format_string("%04x", F.col("_fbs_tt").cast("int"))
            )
        )
        .drop("_fbs_tt")
        .localCheckpoint()
    )


def importance_weights(
    df: DataFrame,
    category_col,
    slice_col,
    source_val,
    target_val,
    alpha: float = 1.0,
    clip: float = 10.0,
) -> DataFrame:
    """Per-category density-ratio importance weights for covariate-shift
    reweighting (Shimodaira 2000; the dataset-curation knob that makes
    a source corpus LOOK like a target distribution without resampling
    it): weight(c) = p_target(c) / p_source(c) with Laplace smoothing
    alpha on both sides and symmetric clipping to [1/clip, clip] (the
    standard variance guard — an unseen-in-source category would
    otherwise get an unbounded weight).

    Exact shape: one (category, slice) partial-aggregating shuffle
    builds both histograms; totals and the category count K are 1-row
    aggregates broadcast back; the smoothed ratio
    ((n_t + a) / (N_t + aK)) / ((n_s + a) / (N_s + aK)) is fixed
    arithmetic over exact integers, so the output is engine-identical
    at the 1e-6 grain. Category-scale output.

    Returns (category, n_source, n_target, weight) — weight already
    clipped; downstream either multiplies per-example losses or feeds
    :func:`weighted_sample`.
    """
    c_col = F.col(category_col) if isinstance(category_col, str) else category_col
    s_col = F.col(slice_col) if isinstance(slice_col, str) else slice_col
    base = df.select(
        c_col.alias("_c"), s_col.alias("_s")
    ).where(F.col("_s").isin([source_val, target_val]))
    hist = base.groupBy("_c").agg(
        F.sum((F.col("_s") == source_val).cast("bigint")).alias("n_source"),
        F.sum((F.col("_s") == target_val).cast("bigint")).alias("n_target"),
    )
    tot = hist.groupBy().agg(
        F.sum("n_source").alias("_ns"),
        F.sum("n_target").alias("_nt"),
        F.count("*").alias("_k"),
    )
    a = F.lit(float(alpha))
    p_t = (F.col("n_target") + a) / (F.col("_nt") + a * F.col("_k"))
    p_s = (F.col("n_source") + a) / (F.col("_ns") + a * F.col("_k"))
    w = F.least(
        F.greatest(p_t / p_s, F.lit(1.0 / float(clip))), F.lit(float(clip))
    )
    return hist.crossJoin(F.broadcast(tot)).select(
        F.col("_c").alias("category"),
        "n_source",
        "n_target",
        portable_round(w, 6).alias("weight"),
    )
