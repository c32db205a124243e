"""Streaming change-data-feed over the Delta-lite transaction log —
the engine's analogue of Delta's streaming source.

The commit log IS a file stream: every committed version is exactly
one immutable NDJSON file under ``<table>/_txlog/``, so Structured
Streaming's file source (which checkpoints the set of seen files)
discovers each commit exactly once per drain. Each micro-batch maps
its newly-seen versions through the batch ``table_changes`` bag-diff
(files added minus removed = inserts, the reverse = deletes;
copy-on-write rewrites cancel) and lands the rows in a per-version
output directory — re-delivery after a restart rewrites the same
directory with identical content, so at-least-once file-source
semantics converge to exactly-once change rows (the
streaming/crawl.py discipline applied to the table format itself).

Feeds the D2 incremental-consumer idiom continuously: a downstream
rollup applies each commit's diff instead of re-reading snapshots.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def stream_commits(spark: SparkSession, table_path: str) -> DataFrame:
    """File-source stream of commit-log files -> (version) rows; only
    commits unseen by the checkpoint surface per drain."""
    log_dir = os.path.join(table_path, "_txlog")
    return (
        spark.readStream.format("text")
        .option("pathGlobFilter", "*.json")
        .load(log_dir)
        .select(
            F.regexp_extract(
                F.input_file_name(), r"/(\d{20})\.json$", 1
            )
            .cast("long")
            .alias("version")
        )
        .where(F.col("version").isNotNull())
        .distinct()
    )


def stream_table_changes(
    spark: SparkSession,
    table_path: str,
    checkpoint_dir: str,
    out_dir: str,
) -> list[int]:
    """Drain all currently-unseen commits into per-version change-row
    directories under ``out_dir`` (``v=<version>/`` each holding the
    commit's insert/delete rows with ``_change_type`` and
    ``_commit_version``). Returns the versions processed this drain.

    Version 0 (CREATE) is emitted as pure inserts — the stream's
    "initial snapshot". Idempotent per version: a replayed commit
    overwrites its own directory with identical content."""
    from flytemosaic_spark.sources import txlog

    done: list[int] = []

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        versions = sorted(
            r["version"] for r in batch_df.select("version").collect()
        )
        for v in versions:
            if v == 0:
                changes = (
                    txlog.read_snapshot(spark, table_path, 0)
                    .withColumn("_change_type", F.lit("insert"))
                    .withColumn(
                        "_commit_version", F.lit(0).cast("int")
                    )
                )
            else:
                changes = txlog.table_changes(
                    spark, table_path, v - 1, v
                )
            (
                changes.write.mode("overwrite").parquet(
                    os.path.join(out_dir, f"v={v}")
                )
            )
            done.append(v)

    q = (
        stream_commits(spark, table_path)
        .writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return done


def read_change_rows(spark: SparkSession, out_dir: str) -> DataFrame:
    """All change rows landed so far (the consumer side)."""
    dirs = sorted(
        os.path.join(out_dir, d)
        for d in os.listdir(out_dir)
        if d.startswith("v=")
    )
    if not dirs:
        raise FileNotFoundError(f"no change rows under {out_dir}")
    return spark.read.parquet(*dirs)
