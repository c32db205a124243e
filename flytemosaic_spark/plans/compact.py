"""Small-file compaction: the ``OPTIMIZE`` / bin-packing layout
primitive.

At 100 TB the small-files problem is a first-order cost: a table
written by many incremental jobs accumulates thousands of KB-scale
parquet files, and every downstream scan pays per-file open/footer
overhead plus scheduler pressure (the reference's incremental COG
ingest, scenes.py:93-138, produces exactly this shape — one object
per (tile, date)). Compaction rewrites the table into
target-byte-sized files without changing its rows.

Physical shape: one pass — measure on-disk bytes from the file
listing (metadata only, no data read), derive the output file count,
and rewrite through ``repartition(n)`` (round-robin: balanced output
sizes with no shuffle key needed; pass ``order_by`` to instead
range-partition + sort for a clustered layout, composing with
plans/zorder.py). The write is atomic-by-rename into a fresh
directory so a failed compaction never corrupts the table.
"""

from __future__ import annotations

import math
import os
import shutil

from pyspark.sql import DataFrame, SparkSession


def table_file_stats(path: str) -> tuple[int, int]:
    """(n_files, total_bytes) of a parquet table directory —
    metadata-only (file listing, no data read)."""
    n, total = 0, 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            if f.endswith(".parquet"):
                n += 1
                total += os.path.getsize(os.path.join(root, f))
    return n, total


def compact_table(
    spark: SparkSession,
    path: str,
    target_bytes: int = 128 * 1024 * 1024,
    order_by: list[str] | None = None,
) -> tuple[int, int]:
    """Rewrite the parquet table at ``path`` into
    ``ceil(total_bytes / target_bytes)`` files. Returns
    (files_before, files_after). Rows are preserved exactly; with
    ``order_by`` the rewrite is range-partitioned + sorted on those
    columns so min/max footer pruning works afterwards."""
    n_before, total = table_file_stats(path)
    n_out = max(1, math.ceil(total / target_bytes))
    df: DataFrame = spark.read.parquet(path)
    if order_by:
        out = df.repartitionByRange(n_out, *order_by).sortWithinPartitions(
            *order_by
        )
    else:
        out = df.repartition(n_out)
    tmp = path.rstrip("/") + ".__compact_tmp__"
    out.write.mode("overwrite").parquet(tmp)
    old = path.rstrip("/") + ".__compact_old__"
    os.rename(path, old)
    os.rename(tmp, path)
    shutil.rmtree(old)
    n_after, _ = table_file_stats(path)
    return n_before, n_after
