"""Incremental-compute core: skip work that already exists.

The reference's central efficiency idea (SURVEY §2.3 J4, §4): before
every expensive fan-out, anti-join the needed work against a listing
of what the store already holds; idempotent sinks make retries safe
(reference: flyte/scenes.py:93-138, 219-232, protocols.py:300).

At 100 TB the listing side can be huge — it comes from a listing
*scan* (or inventory table), and the anti-join shuffles on the url
key like any equi-join; when the needed side is small it broadcasts.
"""

from __future__ import annotations

import math
import os
from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def missing(needed: DataFrame, existing: DataFrame, key: str = "url") -> DataFrame:
    """J4 — rows of ``needed`` whose key is absent from ``existing``.
    Re-running after a partial failure yields only the remainder —
    the idempotent-retry contract (reference scenes.py:93-99)."""
    return needed.join(existing, key, "left_anti")


def successful(attempted: DataFrame, ok: DataFrame, key: str = "url") -> DataFrame:
    """J5 — rows of ``attempted`` confirmed present (reference
    glad.py:153-161)."""
    return attempted.join(ok, key, "left_semi")


def existence_bitmap(
    urls: DataFrame,
    exists_fn: Callable[[str], bool] | None = None,
    url_col: str = "url",
    batch_size: int = 4096,
) -> DataFrame:
    """A11 — distributed existence check: urls → (url, exists).

    The reference fans out fs.exists over 4096-url chunks on 16
    processes (flytemosaic/datasets/utils.py:154-178); here the fan-out
    is ``mapInPandas`` over a repartitioned url table — each Arrow
    batch is one existence batch, and the result feeds :func:`missing`.
    ``exists_fn`` defaults to local-filesystem existence (object-store
    clients drop in per-partition the same way).
    """
    spark = urls.sparkSession
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", str(batch_size))
    parallelism = spark.sparkContext.defaultParallelism
    fn = exists_fn or os.path.exists
    schema = urls.schema.add("exists", "boolean")

    def check(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf.copy()
            pdf["exists"] = [bool(fn(u)) for u in pdf[url_col]]
            yield pdf

    return urls.repartition(parallelism).mapInPandas(check, schema)


def with_batches(
    df: DataFrame,
    group_col: str,
    order_col: str,
    scratch_bytes: int = 32 * 1024**3,
    bytes_per_row: int = 257_000_000,
    safety_factor: int = 4,
) -> DataFrame:
    """A12 + P6 — assign a batch id per group sized by a byte budget.

    rows-per-batch = scratch_bytes // (safety_factor × bytes_per_row)
    (reference: flyte/scenes.py:60-70 — 32 GiB ephemeral ÷ 4× the
    256.4 MB max scene size ⇒ ~32 files per batch, glad.py:83-86).
    Batch assignment is a row_number window per group — one shuffle on
    the group key.
    """
    per_batch = max(1, scratch_bytes // (safety_factor * bytes_per_row))
    w = Window.partitionBy(group_col).orderBy(order_col)
    return df.withColumn(
        "batch",
        F.floor((F.row_number().over(w) - F.lit(1)) / F.lit(per_batch)).cast("bigint"),
    )


def download_batch(
    missing_df: DataFrame,
    fetch_fn: Callable[[str, str], None],
    dst_col: str = "dst_url",
    src_col: str = "url",
) -> DataFrame:
    """S6 + S8 ingest executor: per partition, re-check existence
    (idempotency under task retry — reference scenes.py:93-99), fetch,
    and report per-url success. Returns (url, dst_url, ok)."""
    schema = "url string, dst_url string, ok boolean"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for src, dst in zip(pdf[src_col], pdf[dst_col]):
                if os.path.exists(dst):  # recheck: skip work already done
                    out.append((src, dst, True))
                    continue
                try:
                    fetch_fn(src, dst)
                    out.append((src, dst, True))
                except Exception:
                    out.append((src, dst, False))
            yield pd.DataFrame(out, columns=["url", "dst_url", "ok"])

    return missing_df.mapInPandas(run, schema)


def merge_rollup(
    prev: DataFrame,
    delta: DataFrame,
    keys: list[str],
) -> DataFrame:
    """Incremental maintenance of an algebraic rollup: combine an
    existing aggregate table with the aggregate of NEW raw data only —
    the 100 TB refresh pattern where rescanning history for every
    arriving partition is the thing you must never do.

    Both inputs carry the partial-aggregate columns (n, total, mn,
    mx); algebraic aggregates merge by (sum, sum, min, max). avg is
    derived at read time as total/n, which is exactly Spark's own
    partial/final split (the merge step IS ObjectHashAggregate's
    combine) — so merged results are identical to a full recompute,
    which is how the probe's oracle checks it.

    Cost: one groupBy over (|prev| + |delta-groups|) aggregate rows —
    metadata-scale — versus a full rescan of raw history.
    """
    return (
        prev.unionByName(delta)
        .groupBy(*keys)
        .agg(
            F.sum("n").alias("n"),
            F.sum("total").alias("total"),
            F.min("mn").alias("mn"),
            F.max("mx").alias("mx"),
        )
    )


def rollup_state(raw: DataFrame, keys: list[str], value_col: str) -> DataFrame:
    """The partial-aggregate state for :func:`merge_rollup`."""
    return raw.groupBy(*keys).agg(
        F.count("*").alias("n"),
        F.sum(value_col).alias("total"),
        F.min(value_col).alias("mn"),
        F.max(value_col).alias("mx"),
    )
