"""Physical-plan quality gate: the headline probes must stay free of
scale anti-patterns (unintended cartesian products, row-at-a-time
Python UDFs, and runaway shuffle counts) — the same checks
tools/explain_audit.py applies to the whole registry, enforced in CI
for the queries the bench times."""

from __future__ import annotations

import contextlib
import io
import sys

import pytest

sys.path.insert(0, "/root/repo")

from tools.explain_audit import CROSS_OK, audit  # noqa: E402

from flytemosaic_spark.probes import all_probes  # noqa: E402

HEADLINE = [
    "j1_interval_join",
    "a6_masked_mean_by_key",
    "a7_median",
    "j4_anti_join",
    "w7_topk_per_group",
    "x1_exact_dedup",
    "x2_ngram_jaccard",
    "x3_cosine_topk",
    "x5_tumbling_window",
    "x6_sessionize",
    "x9_quality_score",
    "j2_lookup_broadcast",
    "a13_rollup",
]


@pytest.mark.parametrize("name", HEADLINE)
def test_headline_plan_is_clean(spark, sf_dir, name):
    p = all_probes()[name]
    df = p.fn(spark, sf_dir)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    flags = [
        f
        for f in audit(name, buf.getvalue())
        if not f.startswith(("FULL_WIDTH", "MANY_"))
    ]
    assert not flags, f"{name}: {flags}"


def test_broadcast_join_is_broadcast(spark, sf_dir):
    df = all_probes()["j2_lookup_broadcast"].fn(spark, sf_dir)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    assert "BroadcastHashJoin" in buf.getvalue()


def test_range_filter_is_pushed_down(spark, sf_dir):
    df = all_probes()["p4_range_filter"].fn(spark, sf_dir)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    assert "PushedFilters: [" in plan
    # the probe's range predicate must actually reach the scan
    assert "GreaterThan" in plan or "IsNotNull" in plan


def test_partitioned_write_scan_prunes_partitions(spark):
    """s14: the status filter must land in PartitionFilters (directory
    pruning), not PushedFilters — other partitions' files are never
    opened."""
    import contextlib
    import io

    from flytemosaic_spark.probes import all_probes

    df = all_probes()["s14_partitioned_write"].fn(spark, "/root/testdata/sf0.001")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode="formatted")
    plan = buf.getvalue()
    assert "PartitionFilters" in plan
    import re

    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "o_orderstatus" in m.group(1), plan


def test_runtime_bloom_filter_injects_on_selective_shuffle_join(spark):
    """Catalyst's InjectRuntimeFilter: a selective dimension filter on
    one side of a shuffle join grows a bloom filter that prunes the
    fact side BEFORE the shuffle. The production thresholds
    (application side > 10 GB) are exactly right for the 100 TB
    design point; this test lowers them only to prove the machinery
    engages and preserves results."""
    import contextlib
    import io

    from pyspark.sql import functions as F

    from flytemosaic_spark.sources.tables import load_table

    saved = {
        k: spark.conf.get(k)
        for k in (
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
            "spark.sql.autoBroadcastJoinThreshold",
        )
    }
    try:
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
            "0",
        )
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        li = load_table(spark, "/root/testdata/sf0.01", "lineitem")
        o = load_table(spark, "/root/testdata/sf0.01", "orders").where(
            F.col("o_totalprice") > 400000
        )
        j = li.join(o, li.l_orderkey == o.o_orderkey)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            j.explain(True)
        assert "might_contain" in buf.getvalue().lower()
        with_bloom = j.count()
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)
    without_bloom = (
        load_table(spark, "/root/testdata/sf0.01", "lineitem")
        .join(
            load_table(spark, "/root/testdata/sf0.01", "orders").where(
                F.col("o_totalprice") > 400000
            ),
            F.expr("l_orderkey = o_orderkey"),
        )
        .count()
    )
    assert with_bloom == without_bloom


def test_audit_flags_unordered_global_window(spark):
    # VERDICT r5: Window.partitionBy() with no orderBy was invisible to
    # the UNPART_WINDOW check; bounded_total is the sanctioned form
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from flytemosaic_spark.plans.prefix import bounded_total

    def plan_of(df):
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        return buf.getvalue()

    bare = spark.range(10).withColumn(
        "s", F.sum("id").over(Window.partitionBy())
    )
    assert "UNPART_WINDOW" in audit("repro", plan_of(bare))
    ok = spark.range(10).withColumn(
        "s", F.sum("id").over(bounded_total("id"))
    )
    assert "UNPART_WINDOW" not in audit("repro", plan_of(ok))
    assert sorted(r.s for r in ok.collect()) == [45] * 10
