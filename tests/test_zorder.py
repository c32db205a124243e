"""Z-order layout: prove the pruning claim from the parquet footers.

We write orders twice — sorted by o_custkey only, and Z-ordered on
(o_custkey, o_totalprice) — then read every row group's [min, max]
from the footers with pyarrow and count how many row groups a point
predicate on EACH dimension would have to scan. Z-order must prune on
both; single-column sort prunes only its own column."""

from __future__ import annotations

import glob

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from flytemosaic_spark.plans.zorder import write_zordered
from flytemosaic_spark.sources.tables import load_table

SF001 = "/root/testdata/sf0.01"


def _rowgroup_spans(path_glob: str, col: str) -> list[tuple]:
    spans = []
    for f in glob.glob(path_glob):
        meta = pq.ParquetFile(f).metadata
        for rg in range(meta.num_row_groups):
            for ci in range(meta.num_columns):
                c = meta.row_group(rg).column(ci)
                if c.path_in_schema == col and c.statistics is not None:
                    spans.append((c.statistics.min, c.statistics.max))
    return spans


def _hit_fraction(spans: list[tuple], value) -> float:
    hits = sum(1 for lo, hi in spans if lo <= value <= hi)
    return hits / max(len(spans), 1)


def test_zorder_prunes_on_both_dimensions(spark, tmp_path):
    orders = load_table(spark, SF001, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    single = str(tmp_path / "single")
    zord = str(tmp_path / "zorder")
    (
        orders.repartitionByRange(16, "o_custkey")
        .sortWithinPartitions("o_custkey")
        .write.mode("overwrite")
        .parquet(single)
    )
    write_zordered(orders, zord, "o_custkey", "o_totalprice", n_files=16)

    # same rows either way
    assert (
        spark.read.parquet(zord).count()
        == spark.read.parquet(single).count()
        == orders.count()
    )

    probe_cust = 1000
    probe_price = 150000.0

    # custkey predicate: both layouts prune well
    s_cust = _hit_fraction(_rowgroup_spans(f"{single}/*.parquet", "o_custkey"), probe_cust)
    z_cust = _hit_fraction(_rowgroup_spans(f"{zord}/*.parquet", "o_custkey"), probe_cust)
    assert s_cust <= 0.25
    assert z_cust <= 0.5  # z-order trades a little on the primary dim

    # totalprice predicate: single-column layout scans ~everything,
    # z-order prunes
    s_price = _hit_fraction(
        _rowgroup_spans(f"{single}/*.parquet", "o_totalprice"), probe_price
    )
    z_price = _hit_fraction(
        _rowgroup_spans(f"{zord}/*.parquet", "o_totalprice"), probe_price
    )
    assert s_price >= 0.9, "single-column sort should not prune the other dim"
    assert z_price <= 0.6, f"z-order should prune the second dim, got {z_price}"
    # and the filtered read returns identical results from both layouts
    a = (
        spark.read.parquet(zord)
        .where(F.col("o_totalprice") > 300000)
        .count()
    )
    b = (
        spark.read.parquet(single)
        .where(F.col("o_totalprice") > 300000)
        .count()
    )
    assert a == b
