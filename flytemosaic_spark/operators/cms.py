"""Portable count-min sketch: mergeable frequency state in fixed space.

The third mergeable sketch family in this engine (KMV for distinct
counts in ``operators/sketch.py``, quantiles in
``operators/qsketch.py``): CMS answers "how often does key k appear"
with state bounded by depth x width counters regardless of key
cardinality — the standard building block for heavy-hitter detection
over a 100 TB event stream, where an exact per-key count would be
key-cardinality-scale state.

Portability: slots are derived from md5 (``substr(md5(d || ':' ||
key), 1, 2)`` — two hex chars = 256 slots per row), available
bit-identically in Spark and DuckDB, so the DuckDB oracle replays the
whole estimator and the probe hash-matches, like the KMV and
quantile-sketch probes.

Scale shape: building the state is one map-side explode (depth rows
per input row) into a partial-aggregated groupBy with at most
depth x width groups — the shuffle moves O(partitions x depth x
width) rows, never data-scale. Estimation broadcasts the state table
(depth x width rows) and takes a min over depth per key. States
merge by slot-wise addition (``merge_cms_states``), which is what
makes incremental maintenance free: sketch today's partition, add it
to yesterday's state.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEPTH = 4
WIDTH = 256  # two hex chars of md5


def _slot(d: int, key: Column) -> Column:
    """Slot id (two hex chars) of ``key`` in hash row ``d``."""
    return F.substring(
        F.md5(F.concat_ws(":", F.lit(str(d)), key.cast("string"))), 1, 2
    )


def cms_build(df: DataFrame, key_col: str, depth: int = DEPTH) -> DataFrame:
    """Build CMS state (d, slot, cnt) from the rows of ``df``.

    r10: rows pre-aggregate to (key, count) BEFORE the depth-way
    md5 explode (guide §2.3 'aggregate before you shuffle'): the slot
    depends only on the key, so per-slot counts are the key-count
    sums — identical state, but the depth × md5 + explode work runs
    once per DISTINCT key instead of once per row. The pre-aggregate
    shuffles narrow (key, cnt) pairs with full map-side combining;
    on a heavy-hitter-shaped stream that is a tiny fraction of the
    rows, and the md5 CPU drops by the key-repetition factor."""
    key = F.col(key_col)
    per_key = df.groupBy(key.alias("_k")).agg(F.count("*").alias("_c"))
    rows = per_key.select(
        F.col("_c"),
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(d).alias("d"),
                    _slot(d, F.col("_k")).alias("slot"),
                )
                for d in range(depth)
            ])
        ).alias("_e"),
    ).select("_e.d", "_e.slot", "_c")
    return rows.groupBy("d", "slot").agg(F.sum("_c").alias("cnt"))


def merge_cms_states(*states: DataFrame) -> DataFrame:
    """Merge CMS states built over disjoint row sets: slot-wise sum."""
    unioned = reduce(lambda a, b: a.unionAll(b), states)
    return unioned.groupBy("d", "slot").agg(F.sum("cnt").alias("cnt"))


def cms_estimate(
    keys: DataFrame, state: DataFrame, key_col: str, depth: int = DEPTH
) -> DataFrame:
    """Estimated count per distinct key in ``keys``: min over the
    depth rows of that key's slot counters (>= true count, always).
    The state table is broadcast — it is at most depth x width rows.
    """
    key = F.col(key_col)
    probes = keys.select(key_col).distinct().select(
        key_col,
        F.explode(
            F.array(*[
                F.struct(F.lit(d).alias("d"), _slot(d, key).alias("slot"))
                for d in range(depth)
            ])
        ).alias("_e"),
    ).select(key_col, "_e.d", "_e.slot")
    return (
        probes.join(F.broadcast(state), ["d", "slot"])
        .groupBy(key_col)
        .agg(F.min("cnt").alias("est"))
    )


def cms_slot_sql(d: str, key_expr: str) -> str:
    """The DuckDB replay of ``_slot`` for oracle SQL construction."""
    return f"substr(md5(concat({d}, ':', CAST({key_expr} AS VARCHAR))), 1, 2)"
