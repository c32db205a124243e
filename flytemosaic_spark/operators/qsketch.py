"""Portable mergeable quantile sketch (fixed-bin histogram).

Exact per-group quantiles (A7/A16) sort or gather each group;
`percentile_approx`'s KLL-ish sketch is Spark-internal — its answer
can't be reproduced or merged outside Spark. This sketch trades a
bounded error for full portability, the same contract as the KMV
distinct sketch (`operators/sketch.py`):

- **state** = (mn, mx, counts[bins]) per group — integers plus two
  doubles, so states merge EXACTLY (vector-add the counts) when built
  on the same (mn, mx) frame, and any engine can finalize them;
- **estimate**: walk the cumulative histogram to the bin holding the
  q·n-th value, linearly interpolate inside it — error is bounded by
  one bin width of the value range;
- everything is JVM-side: binning is arithmetic, the histogram is a
  ``count`` groupBy on (group, bin), finalization pivots the tiny
  (groups × bins) table driver-free via ``map_from_entries``.

Merge == direct is bit-exact (integer counts); error-vs-exact bounds
are property-tested in tests/test_qsketch.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _bin_expr(v: Column, mn: Column, mx: Column, bins: int) -> Column:
    span = F.when(mx > mn, mx - mn).otherwise(F.lit(1.0))
    raw = F.floor((v - mn) / span * bins).cast("int")
    return F.least(F.greatest(raw, F.lit(0)), F.lit(bins - 1))


def quantile_sketch_state(
    df: DataFrame,
    value_col: str,
    group_cols: list[str],
    bins: int = 128,
    bounds: DataFrame | None = None,
) -> DataFrame:
    """Per-group state: (group..., mn, mx, counts array<long>[bins]).

    ``bounds`` (group..., mn, mx) fixes the bin frame; pass the SAME
    bounds when sketching partitions that will be merged (the merge
    contract). Defaults to this input's own min/max per group."""
    v = F.col(value_col).cast("double")
    if bounds is None:
        bounds = df.groupBy(*group_cols).agg(
            F.min(v).alias("mn"), F.max(v).alias("mx")
        )
    binned = df.join(F.broadcast(bounds), group_cols).select(
        *group_cols,
        "mn",
        "mx",
        _bin_expr(v, F.col("mn"), F.col("mx"), bins).alias("_bin"),
    )
    per_bin = binned.groupBy(*group_cols, "mn", "mx", "_bin").agg(
        F.count("*").alias("_c")
    )
    # dense counts vector: map the sparse (bin -> c) entries onto 0..bins-1
    return per_bin.groupBy(*group_cols, "mn", "mx").agg(
        F.map_from_entries(
            F.collect_list(F.struct(F.col("_bin"), F.col("_c")))
        ).alias("_m")
    ).select(
        *group_cols,
        "mn",
        "mx",
        F.transform(
            F.sequence(F.lit(0), F.lit(bins - 1)),
            lambda i: F.coalesce(F.element_at("_m", i), F.lit(0)),  # map key = bin id, NOT 1-based position
        ).alias("counts"),
    )


def quantile_sketch_merge(
    a: DataFrame, b: DataFrame, group_cols: list[str]
) -> DataFrame:
    """Vector-add the histograms (bin frames must match — built with a
    shared ``bounds``)."""
    return (
        a.unionByName(b)
        .groupBy(*group_cols, "mn", "mx")
        .agg(
            F.aggregate(
                F.collect_list("counts"),
                F.transform(
                    F.sequence(
                        F.lit(1), F.size(F.first("counts", True))
                    ),
                    lambda _: F.lit(0).cast("bigint"),
                ),
                lambda acc, cs: F.zip_with(acc, cs, lambda x, y: x + y),
            ).alias("counts")
        )
    )


def quantile_sketch_estimate(
    states: DataFrame, group_cols: list[str], q: float
) -> DataFrame:
    """Finalize: the q-quantile estimate per group, interpolated inside
    the bin where the cumulative count crosses q·(n-1)+1."""
    n = F.aggregate("counts", F.lit(0).cast("bigint"), lambda a, c: a + c)
    target = F.lit(q) * (n - 1).cast("double")  # 0-based rank, (n-1)q rule
    bins = F.size("counts")
    width = F.when(F.col("mx") > F.col("mn"), F.col("mx") - F.col("mn")).otherwise(
        F.lit(1.0)
    ) / bins.cast("double")
    # cumulative counts; find first bin with cum > target
    cum = F.expr(
        "transform(counts, (c, i) -> "
        "aggregate(slice(counts, 1, i + 1), 0L, (a, x) -> a + x))"
    )
    idx = F.array_position(
        F.transform(cum, lambda c: c.cast("double") > target), True
    )  # 1-based bin index
    est = F.col("mn") + (idx.cast("double") - 0.5) * width
    return states.select(
        *group_cols,
        n.alias("n"),
        F.least(F.greatest(est, F.col("mn")), F.col("mx")).alias("q_est"),
    )
