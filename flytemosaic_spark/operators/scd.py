"""Slowly-changing-dimension (SCD type 2) construction from a change log.

The reference materializes only current-state catalogs (its
incremental story is "re-run and skip what exists",
/root/reference/flyte/scenes.py:93-99); a warehouse feeding training
pipelines also needs *history*: for each entity, the intervals during
which each attribute value held. That is SCD2, and it is two window
functions — no shuffle beyond the one ``partitionBy(key)`` exchange,
which both windows share (Catalyst reuses the sort):

1. collapse consecutive repeats: keep a row iff ``lag(attr)`` over
   (key, ts) differs (run-length encoding of the attribute stream);
2. close intervals: ``valid_to = lead(ts)`` over the surviving rows,
   NULL marking the open (current) interval.

Per-key state never materializes anywhere — at 100 TB this is one
sort-based exchange on the entity key, then streaming window
evaluation; skewed entities are bounded by their own event count.
A tie-breaker column makes the ordering total, so re-runs are
byte-identical (same determinism requirement the reference pins for
its shuffles, SURVEY §7(d)).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def scd2_from_changes(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    attr_col: str,
    tie_col: str,
) -> DataFrame:
    """Build SCD2 validity intervals from an append-only change log.

    Output: (key, attr, valid_from, valid_to, is_current) — one row
    per maximal run of an unchanged attribute value per key.
    """
    w = Window.partitionBy(key_col).orderBy(ts_col, tie_col)
    changes = (
        df.withColumn("_prev", F.lag(attr_col).over(w))
        .where(F.col("_prev").isNull() | (F.col("_prev") != F.col(attr_col)))
        .drop("_prev")
    )
    w2 = Window.partitionBy(key_col).orderBy(ts_col, tie_col)
    valid_to = F.lead(ts_col).over(w2)
    return changes.select(
        F.col(key_col),
        F.col(attr_col),
        F.col(ts_col).alias("valid_from"),
        valid_to.alias("valid_to"),
        valid_to.isNull().alias("is_current"),
    )
