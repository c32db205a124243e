"""Small-file compaction: row preservation, file-count math, and
clustered-rewrite footer pruning."""

from __future__ import annotations

from pyspark.sql import functions as F

from flytemosaic_spark.plans.compact import compact_table, table_file_stats


def _fragmented(spark, tmp_path, n_files=40):
    path = str(tmp_path / "tbl")
    spark.range(0, 20000).select(
        F.col("id"), (F.col("id") % 97).alias("k"),
        F.md5(F.col("id").cast("string")).alias("payload"),
    ).repartition(n_files).write.mode("overwrite").parquet(path)
    return path


def test_compact_preserves_rows_and_reduces_files(spark, tmp_path):
    path = _fragmented(spark, tmp_path)
    before_rows = spark.read.parquet(path).count()
    before_sum = spark.read.parquet(path).agg(F.sum("id")).collect()[0][0]
    n_before, total = table_file_stats(path)
    assert n_before == 40
    got_before, got_after = compact_table(spark, path, target_bytes=total)
    assert (got_before, got_after) == (40, 1)
    assert spark.read.parquet(path).count() == before_rows
    assert spark.read.parquet(path).agg(F.sum("id")).collect()[0][0] == before_sum


def test_compact_file_count_tracks_target(spark, tmp_path):
    path = _fragmented(spark, tmp_path)
    _, total = table_file_stats(path)
    _, n_after = compact_table(spark, path, target_bytes=max(1, total // 4))
    assert 3 <= n_after <= 6  # ceil(total/target)=4-5 modulo re-encode drift


def test_compact_ordered_rewrite_enables_pruning(spark, tmp_path):
    import pyarrow.parquet as pq
    import os

    path = _fragmented(spark, tmp_path)
    _, total = table_file_stats(path)
    compact_table(spark, path, target_bytes=max(1, total // 4), order_by=["id"])
    # disjoint id ranges per file -> a point predicate prunes to 1 file
    ranges = []
    for root, _d, files in os.walk(path):
        for f in files:
            if f.endswith(".parquet"):
                md = pq.read_metadata(os.path.join(root, f))
                lo = min(md.row_group(i).column(0).statistics.min
                         for i in range(md.num_row_groups))
                hi = max(md.row_group(i).column(0).statistics.max
                         for i in range(md.num_row_groups))
                ranges.append((lo, hi))
    ranges.sort()
    for (_, e1), (s2, _) in zip(ranges, ranges[1:]):
        assert e1 <= s2  # non-overlapping id ranges across files
    assert spark.read.parquet(path).where("id = 12345").count() == 1
