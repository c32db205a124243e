"""Interval merging (gaps-and-islands) as a single-sort window plan.

The reference's temporal grid snaps observations to period boundaries
(flytemosaic/datasets/protocols.py:136-158 in /root/reference); the
complementary operation a training-data event pipeline needs is the
inverse — collapsing bursts of raw timestamps into coverage intervals
(session coverage, crawl-visit spans, sensor uptime windows).

Physical shape: one shuffle on the partition keys, one per-partition
sort, two window passes over the same sorted run (running max-end,
then running island counter — Spark reuses the sort), one partial
hash aggregation. Nothing is ever globally sorted and per-key state
is O(1), so the plan is flat in both data size and key cardinality.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def merge_intervals(
    df: DataFrame,
    key_cols: Sequence[str],
    start_col: str,
    end_col: str,
    tiebreak_col: str,
) -> DataFrame:
    """Merge overlapping-or-touching ``[start, end]`` intervals per key.

    An interval joins the current island when its start is <= the
    running maximum end of all earlier intervals (ordered by start,
    then ``tiebreak_col`` for determinism). Returns one row per
    island: key columns, ``island_start``, ``island_end``,
    ``n_merged``.
    """
    order = [F.col(start_col), F.col(tiebreak_col)]
    w = Window.partitionBy(*key_cols).orderBy(*order)
    prev_max_end: Column = F.max(end_col).over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    new_island = F.when(
        prev_max_end.isNull() | (F.col(start_col) > prev_max_end), 1
    ).otherwise(0)
    island = F.sum(new_island).over(w.rowsBetween(Window.unboundedPreceding, 0))
    return (
        df.withColumn("_island", island)
        .groupBy(*key_cols, "_island")
        .agg(
            F.min(start_col).alias("island_start"),
            F.max(end_col).alias("island_end"),
            F.count("*").alias("n_merged"),
        )
        .drop("_island")
    )
