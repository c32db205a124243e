"""Scale sweep: measure headline operators at 1x / 10x / 100x sf0.01.

The driver testdata tops out at sf0.1 (~600k lineitem rows); to see
whether each plan's cost actually tracks data size (and not fixed
overheads, and not superlinearly), this tool replicates the sf0.1
tables with key-shifted copies up to ~6M lineitem rows and times a
representative probe per plan family at each scale. Replicas shift
every join/group key by i*stride so key cardinality grows with data
(no artificial skew, joins stay 1:N exactly as in the original).

This is a measurement harness, NOT probe input — correctness probes
always run on the driver's own parquet.

Usage: python tools/scale_sweep.py [max_factor] [probe ...]
(probe names restrict the sweep to a subset — the full list takes
longer than a review window; run it in family-sized chunks)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from flytemosaic_spark.probes import all_probes  # noqa: E402
from flytemosaic_spark.session import get_spark  # noqa: E402
from flytemosaic_spark.sources.tables import load_table  # noqa: E402

BASE = "/root/testdata/sf0.1"
WORK = "/tmp/flytemosaic_scale_sweep"

# (table, key columns to shift per replica)
SHIFT_KEYS = {
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "customer": ["c_custkey"],
    "part": ["p_partkey"],
    "supplier": ["s_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
    "nation": [],
    "region": [],
}

PROBES = [
    "a6_masked_mean_by_key",  # hash-agg
    "j3_equi_join",  # shuffle join
    "w2_cumsum",  # window
    "x1_exact_dedup",  # hash dedup
    "w7_topk_per_group",  # window top-k
    "x22_asof_attribution",  # as-of union+window
    "x20_tfidf_topk",  # explode + two-level agg + join + window
    "f17_fuzzy_pairs",  # blocked fuzzy refine
    "x30_scd2",  # two shared-sort windows
    "j10_grid_spatial_join",  # cell-binned equi join
    "q05_local_supplier_volume",  # TPC-H multi-join through the SQL frontend
    "q21_waiting_suppliers_lite",  # correlated EXISTS/NOT EXISTS semi+anti joins
    "x74_pagerank",  # iterative join+agg propagation
    "x81_bloom_antijoin",  # bloom-prefiltered anti join
    "x77_bm25",  # explode + broadcast-scalar retrieval scoring
    "x82_interval_merge",  # gaps-and-islands shared-sort windows
    "x85_cms_heavy_hitters",  # bounded-state sketch build + broadcast probe
    "x87_throttle_dedup",  # lag-window rate-limit dedup
    "x106_roc_auc",  # rank-sum metric via distributed prefix cumsum
    "x110_cusum_anomaly",  # shared-sort prefix-sum/prefix-min windows
    "x113_cooccur_topk",  # cost-based: self-join <-> basket-list switch
    "x121_curriculum_order",  # global rank via bucket prefix decomposition
    "x129_semdedup",  # anchor-clustered intra-block pair join
    "x132_label_propagation",  # iterative majority-label rounds
    "x136_logreg_train",  # per-step scan + 1-row gradient aggregate
    "x137_skipgram_pairs",  # map-side pair explode + heavy hitters
    "x138_grid_density_clusters",  # cell-binned density + components
    "x139_tfidf_docsim",  # inverted-index sparse similarity join
    "x145_group_auc",  # per-group rank-sum AUC (bucketed ranks)
    "x148_quantile_normalize",  # exact global rank via bucket offsets
    "x149_weighted_median",  # per-group weighted median (cumsum threshold)
    "x11_embedding_neardup",  # sign-LSH gemm sigs -> exact refine (t=0.95)
    "p6_batch_assign",  # distributed global row_number
    "x68_value_deciles",  # distributed exact ntile
    "x113b_cooccur_topk_basket",  # basket-list co-occurrence (x113 scale twin)
    "x153_span_dedup",  # inverted-index span hash dedup
    "x154_doc_lm_score",  # unigram-LM scoring (vocab join)
    "x155_chunk_for_embedding",  # map-side chunking, zero shuffles
    "x163_event_transitions",  # per-user lead windows
    "x169_pareto_report",  # distributed cumsum concentration
    "x172_kcore",  # iterative peeling (shrinking edge state)
    "x180_naive_bayes",  # broadcast-model scoring + explode unpivot
    "x181_assoc_rules",  # cost-based selfjoin <-> basket rule mining
    "x182_hits",  # iterative normalize (localCheckpoint rounds)
    "x183_conformal",  # order-statistic qhat via distributed rank
    "x185_sprt",  # one multi-value prefix-cumsum pass + checkpointed readout
    "x190_acf",  # constant lag grid over day-scale series
    "x191_theil_sen",  # fixed-budget sampled pair slopes
    "x192_freq_triples",  # stats-sized triple aggregation exchange
    "x216_spearman",  # joint-aggregate midrank correlation
    "q20_part_promotion_suppliers",  # nested semi + correlated scalar agg
    # r6: the previously-unswept high-exchange plans + the composed
    # pipeline, so no production-shaped plan lacks a sweep row again
    "x104_clustering_coeff",  # degree-oriented triangle enumeration
    "x98_series_similarity",  # dense-grid z-norm top-k
    "x112_khop_reach",  # iterative frontier joins
    "x119_ndcg",  # per-query rank windows
    "x92_psi_drift",  # decile-bin drift
    "x111_acf",  # full-events-axis ACF
    "x117_seasonal_backtest",  # weekday-profile CV
    "x24_curation_pipeline",  # composed gate->dedup->components->splits
    "q12_shipping_priority_split",  # conditional two-way split agg
    "f24_utm_forward",  # Kruger-series column math
    # r8 operators
    "x237_html_extract",  # per-row html.parser extraction (mapInPandas)
    "x239_warc_extract",  # fused WARC parse -> extract -> curate
    "x238_langid",  # corpus-pass NB train + broadcast-grid scoring
    "x241_winnow_dedup",  # winnowing fingerprints -> first-occurrence agg
    "x242_webp_decode",  # VP8L encode+decode per key (pure python codec)
    "f33_ntv2_shift",  # broadcast grid cells + bilinear column math
    "x243_web_dedup",  # WARC -> extract -> global content dedup
    "x244_robots_scan",  # robots.txt politeness gate
    "x245_charset_decode",  # charset sniff + transcode
    "x246_incremental_crawl",  # txlog-backed incremental crawl dedup
    "x247_quality_classifier",  # hashed-feature GD training (3 scans)
]


def materialize(spark, factor: int) -> str:
    out = f"{WORK}/x{factor}"
    marker = f"{out}/_DONE"
    if os.path.exists(marker):
        return out
    for name, keys in SHIFT_KEYS.items():
        df = load_table(spark, BASE, name)
        stride = 10_000_000
        parts = []
        for i in range(factor):
            p = df
            for k in keys:
                p = p.withColumn(k, F.col(k) + F.lit(i * stride))
            parts.append(p)
        big = parts[0]
        for p in parts[1:]:
            big = big.unionByName(p)
        big.write.mode("overwrite").parquet(os.path.join(out, f"{name}.parquet"))
    open(marker, "w").close()
    return out


def main() -> None:
    max_factor = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    only = [n for n in sys.argv[2:]]
    probes_to_run = only or PROBES
    factors = [f for f in (1, 3, 10, 30) if f <= max_factor]
    spark = get_spark(
        "scale-sweep",
        cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32")),
        shuffle_partitions=int(os.environ.get("SPARK_GRAFT_CPUS", "32")),
    )
    spark.sparkContext.setLogLevel("ERROR")
    probes = all_probes()
    dirs = {f: materialize(spark, f) for f in factors}
    print(f"{'probe':28s} " + " ".join(f"x{f:>2d}(s)" for f in factors))
    for name in probes_to_run:
        times = []
        for f in factors:
            fn = probes[name].fn
            best = float("inf")
            for _ in range(2):
                t0 = time.perf_counter()
                fn(spark, dirs[f]).write.mode("overwrite").format("noop").save()
                best = min(best, time.perf_counter() - t0)
            times.append(best)
        ratio = times[-1] / times[0] if times[0] else float("nan")
        print(
            f"{name:28s} "
            + " ".join(f"{t:6.2f}" for t in times)
            + f"   x{factors[-1]}/x1 = {ratio:.1f}"
        )


if __name__ == "__main__":
    main()
