"""Distinct-count sketching with an engine-portable KMV (k-minimum
values) sketch.

``approx_count_distinct`` (HLL++) is the right call inside one Spark
job, but its register layout is implementation-specific: no other
engine reproduces the estimate, so it can't be audited, merged across
systems, or regression-tested bit-for-bit. The KMV sketch here is the
portable alternative: hash every value with md5, keep the k smallest
distinct hashes, estimate N ≈ (k−1)/h₍ₖ₎ where h₍ₖ₎ is the k-th
minimum mapped into (0,1]. Every engine agrees on md5 of a string, so
the estimate — not just the error bound — is reproducible anywhere
(the DuckDB oracle in probes/ recomputes it exactly).

Scale shape: the sketch is a bounded top-k per group — partial
aggregation applies (each map task keeps its local k minima via the
sort-agg below), the shuffle carries ≤k hashes per group, and sketches
merge associatively (union the hash sets, re-take k minima), which is
what makes it a *sketch* rather than a distinct-count.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from flytemosaic_spark.operators.text import portable_round

# 15 hex chars = 60 bits: exact in a BIGINT and in a double's 53-bit
# mantissa... not quite — 60 > 53, but both engines round the SAME
# integer to the SAME nearest double, so the quotient stays identical.
_HEX_CHARS = 15
_HASH_SPACE = float(16**_HEX_CHARS)


def _h60(value: Column) -> Column:
    """60-bit integer hash of a value via md5 — portable across engines
    (DuckDB twin: ``('0x' || substr(md5(v), 1, 15))::BIGINT``)."""
    return F.conv(
        F.substring(F.md5(value.cast("string")), 1, _HEX_CHARS), 16, 10
    ).cast("bigint")


def kmv_distinct(
    df: DataFrame,
    value_col: str,
    group_cols: list[str] | None = None,
    k: int = 64,
) -> DataFrame:
    """Per-group distinct-count estimate from a k-minimum-values sketch.

    Output: group cols + ``n_exact_capped`` (the sketch size actually
    kept, = min(k, true distinct)) + ``kmv_estimate`` (the KMV
    estimator, exact distinct count when the group holds fewer than k
    distinct values — the sketch degenerates to the truth, which is
    the behavior you want at the small-group end).
    """
    group_cols = group_cols or []
    hashed = df.select(*group_cols, _h60(F.col(value_col)).alias("_h"))
    # distinct hashes per group, then k smallest: array_sort+slice keeps
    # the agg algebraic-ish (collect_set is the partial; the top-k trim
    # happens once per group post-shuffle; for huge groups swap in a
    # bounded min-k UDAF — the estimator is unchanged)
    mins = (
        hashed.groupBy(*group_cols)
        .agg(F.collect_set("_h").alias("_hs"))
        .select(
            *group_cols,
            F.slice(F.array_sort("_hs"), 1, k).alias("_mins"),
            F.size("_hs").alias("_nd"),
        )
    )
    # try_element_at: a group whose values are all NULL yields an empty
    # set; ANSI element_at would throw on index 0
    kth = F.try_element_at("_mins", F.size("_mins"))
    # h mapped into (0,1]: (kth+1)/2^60 — +1 so a zero hash can't divide
    est = F.when(
        F.col("_nd") < k, F.col("_nd").cast("double")
    ).otherwise((F.lit(float(k - 1)) * _HASH_SPACE) / (kth + 1))
    return mins.select(
        *group_cols,
        F.least(F.col("_nd"), F.lit(k)).cast("bigint").alias("n_exact_capped"),
        portable_round(est).alias("kmv_estimate"),
    )


def kmv_distinct_large(
    df: DataFrame,
    value_col: str,
    group_cols: list[str] | None = None,
    k: int = 64,
) -> DataFrame:
    """Same estimator as :func:`kmv_distinct`, different physical plan
    for groups whose distinct cardinality can't sit in one executor's
    memory as a set.

    The estimator only needs two scalars per group — the distinct
    count and the k-th smallest hash — so this form never builds an
    array: distinct (group, hash) pairs → a count aggregate + a
    row_number window that keeps exactly the rank-k row. Everything
    spills; nothing is per-group-unbounded. Measured ~1.5× slower than
    the collect_set form at sf0.1 (the extra shuffle dominates at
    small cardinality) — use this one when groups are huge, the
    default when they're bounded. Results are bit-identical
    (equivalence-tested in tests/test_sketch.py).
    """
    group_cols = group_cols or []
    d = df.select(
        *group_cols, _h60(F.col(value_col)).alias("_h")
    ).dropDuplicates([*group_cols, "_h"])
    nd = d.groupBy(*group_cols).agg(F.count("*").alias("_nd"))
    w = Window.partitionBy(*group_cols).orderBy("_h")
    kth = (
        d.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == k)
        .select(*group_cols, F.col("_h").alias("_kth"))
    )
    est = F.when(F.col("_nd") < k, F.col("_nd").cast("double")).otherwise(
        (F.lit(float(k - 1)) * _HASH_SPACE) / (F.col("_kth") + 1)
    )
    return nd.join(kth, group_cols, "left").select(
        *group_cols,
        F.least(F.col("_nd"), F.lit(k)).cast("bigint").alias("n_exact_capped"),
        portable_round(est).alias("kmv_estimate"),
    )


def kmv_state(
    df: DataFrame,
    value_col: str,
    group_cols: list[str] | None = None,
    k: int = 64,
) -> DataFrame:
    """The mergeable sketch state: per group, the (≤k) smallest
    distinct 60-bit hashes, sorted. This is the column you persist in
    an incremental rollup (see operators/incremental.py:merge_rollup):
    per-partition states merge associatively and the estimate
    finalizes from the state alone — no rescan of history."""
    group_cols = group_cols or []
    hashed = df.select(*group_cols, _h60(F.col(value_col)).alias("_h"))
    return (
        hashed.groupBy(*group_cols)
        .agg(F.collect_set("_h").alias("_hs"))
        .select(
            *group_cols, F.slice(F.array_sort("_hs"), 1, k).alias("_mins")
        )
    )


def kmv_merge_states(
    a: DataFrame,
    b: DataFrame,
    group_cols: list[str],
    k: int = 64,
) -> DataFrame:
    """Associative merge: union both sides' minima per group, dedupe,
    keep the k smallest. A group truncated at k on either side still
    merges correctly — its k minima dominate the union's low end."""
    return (
        a.unionByName(b)
        .groupBy(*group_cols)
        .agg(F.flatten(F.collect_list("_mins")).alias("_all"))
        .select(
            *group_cols,
            F.slice(F.array_sort(F.array_distinct("_all")), 1, k).alias(
                "_mins"
            ),
        )
    )


def kmv_finalize(states: DataFrame, group_cols: list[str], k: int = 64) -> DataFrame:
    """Estimate from the state alone. A state with fewer than k minima
    holds EVERY distinct hash seen (truncation only happens at k), so
    its size is the exact distinct count; otherwise (k-1)/h_(k)."""
    kth = F.try_element_at("_mins", F.size("_mins"))
    nd = F.size("_mins")
    est = F.when(nd < k, nd.cast("double")).otherwise(
        (F.lit(float(k - 1)) * _HASH_SPACE) / (kth + 1)
    )
    return states.select(
        *group_cols,
        nd.cast("bigint").alias("n_exact_capped"),
        portable_round(est).alias("kmv_estimate"),
    )


# --------------------------------------------------------------------------
# HyperLogLog (portable md5 flavor)
# --------------------------------------------------------------------------
#
# m=256 registers from the low 8 bits of the 60-bit md5 hash; the
# remaining 52 bits are the rank field. Register state is kept in
# LONG FORM — (group, reg, minbits) rows, where minbits is the
# minimum bit-length of the rank field (equivalently 53 - max rho):
# mergeable with a plain min() aggregate, spills like any table, and
# every stage replays in ANSI SQL (DuckDB twin uses the same md5
# slots), unlike HLL++'s engine-private hash. The estimator sums
# 2^minbits per register AS INTEGERS (units of 2^-53), so Z is exact
# bigint on both engines and the only float op is the final divide.

HLL_M = 256
_P53 = 9007199254740992  # 2**53


def hll_state(
    df: DataFrame,
    value_col: str,
    group_cols: list[str] | None = None,
    m: int = HLL_M,
) -> DataFrame:
    """Mergeable HLL register state: (group cols, reg, minbits)."""
    group_cols = group_cols or []
    hashed = df.select(*group_cols, _h60(F.col(value_col)).alias("_h"))
    w = F.expr(f"_h div {m}")
    bits = F.when(w == 0, F.lit(0)).otherwise(F.length(F.bin(w)))
    return (
        hashed.select(
            *group_cols, (F.col("_h") % m).alias("reg"), bits.alias("_b")
        )
        .groupBy(*group_cols, "reg")
        .agg(F.min("_b").alias("minbits"))
    )


def hll_merge_states(
    a: DataFrame, b: DataFrame, group_cols: list[str]
) -> DataFrame:
    """Associative merge: per (group, reg) the smaller minbits wins
    (smaller bit-length = larger rho = the HLL max-rho rule)."""
    return (
        a.unionByName(b)
        .groupBy(*group_cols, "reg")
        .agg(F.min("minbits").alias("minbits"))
    )


def hll_finalize(
    states: DataFrame, group_cols: list[str], m: int = HLL_M
) -> DataFrame:
    """Cardinality estimate from register state alone.

    raw = alpha_m * m^2 / Z with Z summed in integer units of 2^-53;
    linear-counting correction below 2.5m when empty registers exist
    (both branches are closed-form, so the branch choice is identical
    across engines)."""
    z = states.groupBy(*group_cols).agg(
        F.count("*").alias("_nreg"),
        F.sum(F.pow(F.lit(2.0), F.col("minbits")).cast("long")).alias("_terms"),
    )
    z_int = (F.lit(m) - F.col("_nreg")) * F.lit(_P53) + F.col("_terms")
    alpha = F.lit(0.7213) / (F.lit(1.0) + F.lit(1.079) / F.lit(float(m)))
    raw = alpha * F.lit(float(m)) * F.lit(float(m)) * F.lit(float(_P53)) / z_int
    corrected = F.when(
        (raw <= F.lit(2.5 * m)) & (F.col("_nreg") < m),
        F.lit(float(m)) * F.log(F.lit(float(m)) / (F.lit(m) - F.col("_nreg"))),
    ).otherwise(raw)
    return z.select(
        *group_cols, portable_round(corrected).alias("hll_estimate")
    )


def hll_distinct(
    df: DataFrame,
    value_col: str,
    group_cols: list[str] | None = None,
    m: int = HLL_M,
) -> DataFrame:
    """Per-group HLL distinct-count estimate (state -> finalize)."""
    group_cols = group_cols or []
    return hll_finalize(hll_state(df, value_col, group_cols, m), group_cols, m)


def kmv_set_similarity(
    df: DataFrame,
    value_col: str,
    side_col: str,
    side_a,
    side_b,
    k: int = 128,
    with_exact: bool = True,
) -> DataFrame:
    """Jaccard / union / intersection estimates between two sets from
    their KMV sketches, plus (optionally) the exact counterparts for
    audit.

    The two sets are the distinct ``value_col`` values where
    ``side_col`` equals ``side_a`` / ``side_b``. Estimator (Beyer et
    al. 2007): merge the two k-min sketches, re-take the k smallest
    (= the KMV sketch of the union); rho = fraction of those union
    minima present in BOTH input sketches estimates Jaccard;
    intersection = rho * union_estimate. Deterministic md5 hashing
    makes every estimate engine-portable (the DuckDB oracle recomputes
    it bit-for-bit).

    Scale shape: truly bounded per-task state. The naive
    ``collect_set`` over a whole side holds O(distinct values) in one
    task's array — an OOM hazard at high cardinality — so the sketch
    is built in two levels: (1) distinct (side, hash) pairs via a
    partially-aggregated hash shuffle (spill-safe), (2) a
    per-partition top-k over the distinct pairs (state bounded by one
    partition, output <= k hashes per (side, partition)), (3) a merge
    level that flattens <= k·n_partitions pre-sliced arrays and
    re-slices to k. Because level (1) makes pairs globally unique, the
    per-partition counts sum to the EXACT distinct count — no second
    scan. The exact-intersection twin is two distinct aggregations —
    drop it (``with_exact=False``) when the point is to NOT pay the
    exact cost. Output: one row.
    """
    sides = df.select(
        F.col(side_col).alias("_s"), _h60(F.col(value_col)).alias("_h")
    ).where(F.col("_s").isin([side_a, side_b]))
    dist = sides.distinct()
    part = dist.groupBy("_s", F.spark_partition_id().alias("_p")).agg(
        F.slice(F.array_sort(F.collect_set("_h")), 1, k).alias("_pm"),
        F.count("*").alias("_pn"),
    )
    per_side = part.groupBy("_s").agg(
        F.slice(
            F.array_sort(F.array_distinct(F.flatten(F.collect_list("_pm")))),
            1,
            k,
        ).alias("_mins"),
        F.sum("_pn").alias("_nd"),
    )
    a = per_side.where(F.col("_s") == side_a).select(
        F.col("_mins").alias("_ma"), F.col("_nd").alias("_na")
    )
    b = per_side.where(F.col("_s") == side_b).select(
        F.col("_mins").alias("_mb"), F.col("_nd").alias("_nb")
    )
    merged = F.slice(F.array_sort(F.array_union("_ma", "_mb")), 1, k)
    both = F.size(
        F.filter(
            "_merged",
            lambda x: F.array_contains("_ma", x) & F.array_contains("_mb", x),
        )
    )
    kth = F.try_element_at("_merged", F.size("_merged"))
    union_est = F.when(
        F.size("_merged") < k,
        F.size("_merged").cast("double"),
    ).otherwise((F.lit(float(k - 1)) * _HASH_SPACE) / (kth + 1))
    out = (
        a.crossJoin(b)
        .withColumn("_merged", merged)
        .select(
            F.col("_na").cast("bigint").alias("n_distinct_a"),
            F.col("_nb").cast("bigint").alias("n_distinct_b"),
            portable_round(
                both.cast("double") / F.size("_merged"), 6
            ).alias("jaccard_est"),
            portable_round(union_est).alias("union_est"),
            portable_round(
                (both.cast("double") / F.size("_merged")) * union_est
            ).alias("inter_est"),
        )
    )
    if not with_exact:
        return out
    flags = df.select(
        F.col(value_col).alias("_v"), F.col(side_col).alias("_s")
    ).where(F.col("_s").isin([side_a, side_b]))
    exact = (
        flags.groupBy("_v")
        .agg(
            F.max((F.col("_s") == side_a).cast("int")).alias("_ia"),
            F.max((F.col("_s") == side_b).cast("int")).alias("_ib"),
        )
        .agg(
            F.sum((F.col("_ia") * F.col("_ib")).cast("bigint")).alias("inter_exact"),
            F.count("*").alias("union_exact"),
        )
        .select(
            "inter_exact",
            "union_exact",
            portable_round(
                F.col("inter_exact").cast("double") / F.col("union_exact"), 6
            ).alias("jaccard_exact"),
        )
    )
    return out.crossJoin(F.broadcast(exact))
