"""Content-addressed result caching — the reference's task memoization
(D2: ``@task(cache=True, cache_version=...)`` on 14 of 16 tasks, with
a custom DataFrame hash for the cache key — reference flyte/build.py:
30-37, flyte/scenes.py:252-259) re-expressed as checkpoint parquet
tables keyed by an input digest.

``frame_digest`` is the F13 row-hash idiom: an order-insensitive
64-bit digest of the full frame content (xxhash64 per row, summed) —
one narrow aggregation, no collect of data. ``cached`` then either
reads the checkpoint (digest hit) or computes, writes, and reads back.
Writes go to a temp dir + atomic rename so concurrent/retried
producers are safe (last write wins with identical content)."""

from __future__ import annotations

import os
import shutil
import uuid
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def frame_digest(df: DataFrame, version: str = "") -> str:
    """Order-insensitive content digest of a DataFrame + a manual
    version salt (the reference's ``cache_version`` knob)."""
    row = df.select(
        # decimal(38,0) sum: order-insensitive, overflow-safe under ANSI
        # to ~1e19 rows (a bigint sum overflows and ANSI mode raises)
        F.sum(
            F.xxhash64(*[F.col(c) for c in df.columns]).cast("decimal(38,0)")
        ).alias("s"),
        F.count("*").alias("n"),
    ).first()
    return f"{version}-{row.n}-{int(row.s or 0) & 0xFFFFFFFFFFFFFFFF:016x}"


def cached(
    spark: SparkSession,
    cache_dir: str,
    key: str,
    compute: Callable[[], DataFrame],
) -> DataFrame:
    """Return the checkpointed result for ``key`` if present, else run
    ``compute()``, persist it, and return the persisted copy (so
    downstream stages read columnar parquet, not the original plan)."""
    path = os.path.join(cache_dir, key)
    if os.path.exists(os.path.join(path, "_SUCCESS")):
        return spark.read.parquet(path)
    tmp = f"{path}.tmp-{uuid.uuid4().hex[:8]}"
    compute().write.mode("overwrite").parquet(tmp)
    if os.path.exists(os.path.join(path, "_SUCCESS")):  # lost the race: reuse
        shutil.rmtree(tmp)
    else:
        if os.path.exists(path):
            shutil.rmtree(path)
        os.replace(tmp, path)
    return spark.read.parquet(path)
