"""As-of (point-in-time) join — the temporal operator Spark lacks
natively.

For each left row, find the latest right row with ``right.ts <=
left.ts`` in the same key group (timeseries attribution, slowly-
changing-dimension lookup, sensor alignment).

Formulated as union + running ``last(ignorenulls)`` over one window
rather than a range join: the union shuffles ONCE on the key, the
window does a per-partition sort, and matching is a linear scan — no
join, no range-bucket explosion, no broadcast of either side. At
100 TB both sides stream through a single Exchange; a range-join
formulation would either bin timestamps (duplicating rows per bin) or
degenerate to a per-key cross product. Skewed keys are ordinary
window skew — AQE's skew handling and key salting both apply.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    ts_col: str = "ts",
    how: str = "inner",
) -> DataFrame:
    """Backward as-of join: left rows + an ``asof`` struct holding the
    entire latest right row with ``right.ts <= left.ts`` (inclusive)
    for the same key values.

    ``how='inner'`` drops left rows with no prior right row;
    ``'left'`` keeps them with a NULL struct. Right rows order before
    left rows at equal timestamps, giving the inclusive (>=) bound.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"how must be 'inner' or 'left', got {how!r}")
    r = right.select(
        *keys,
        F.col(ts_col).alias("_ts"),
        F.struct(*[F.col(c) for c in right.columns]).alias("_r"),
        F.lit(0).alias("_is_left"),
    )
    l = left.select(
        *left.columns, F.col(ts_col).alias("_ts"), F.lit(1).alias("_is_left")
    )
    u = l.unionByName(r, allowMissingColumns=True)
    w = (
        Window.partitionBy(*keys)
        .orderBy("_ts", "_is_left")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    matched = u.withColumn("_match", F.last("_r", ignorenulls=True).over(w))
    out = matched.where(F.col("_is_left") == 1)
    if how == "inner":
        out = out.where(F.col("_match").isNotNull())
    return out.select(*left.columns, F.col("_match").alias("asof"))
