"""Physical-plan audit: flags anti-patterns in every probe's plan.

Checks, per probe at the given sf dir:
- CartesianProduct / BroadcastNestedLoopJoin where the probe didn't
  declare it intentional (cross-join probes excepted)
- BatchEvalPython (row-at-a-time Python UDF) anywhere — always wrong
- Window with an EMPTY partition spec (single-partition global sort —
  the W2/p6/x68 scale cliff). Bounded-input windows must go through
  plans/prefix.py:bounded_window, whose hash(key)%1 partition key
  makes the intent explicit in the plan; anything else is flagged
  UNPART_WINDOW.
- parquet scans with no PushedFilters when the probe filters (info)
- whether WholeStageCodegen covers the aggregation/join spine (info)
- scans that read all columns (ReadSchema width vs table width)

Usage: python tools/explain_audit.py [sf_dir] [probe ...]
"""

from __future__ import annotations

import contextlib
import io
import re
import sys

sys.path.insert(0, "/root/repo")

from flytemosaic_spark.probes import all_probes  # noqa: E402
from flytemosaic_spark.session import get_spark  # noqa: E402

# probes where a nested-loop/cartesian is the declared semantics:
# explicit cross joins, and ANN stages whose broadcast side is a
# constant-size centroid/query set (linear, not quadratic, in corpus)
CROSS_OK = {
    "j6_cross_join",
    "j1_interval_join",
    "x2_ngram_jaccard",
    "x11_embedding_neardup",
    "x3_cosine_topk",
    "x3c_ivf_topk",
    "x3d_pq_topk",
    "x3e_ivf_pq_topk",
    "x39_boilerplate_scrub",
    "x40_funnel",
    "x45_unigram_logprob",
    "x49_pmi_bigrams",
    "x54_class_weights",
    "x64_column_entropy",
    # 1-row scalar-statistics broadcast (N/avgdl, tercile thresholds):
    # same shape as x45 — linear in corpus, constant broadcast side
    "x77_bm25",
    "x80_perplexity_buckets",
    "x85_cms_heavy_hitters",
    # broadcast brute-force ANN scan with cross-label predicate (x3 shape)
    "x88_hard_negatives",
    # 1-row / 4-scalar broadcast statistics (x45/x80 shape)
    "x91_bigram_logprob",
    "x92_psi_drift",
    "x93_mi_features",
    # dense-grid anchor date / query series / scalar prior: 1-row (or
    # constant-width) broadcast crossJoins inside timeseries.daily_series,
    # topk_similar_to_mean, the target-encoding prior, and the
    # negative-sampling candidate range — constant broadcast side
    "x98_series_similarity",
    "x101_exp_smoothing",
    "x102_target_encoding",
    "x103_negative_sampling",
    # power-iteration norm: 1-row broadcast crossJoin per iteration
    "x116_pca_power",
    # dense-grid anchor date (x98 shape) / 1-row corpus totals
    "x117_seasonal_backtest",
    "x118_chi2_features",
    # constant-size anchor set broadcast (x3 shape) / 1-row weight total
    "x129_semdedup",
    "x130_temperature_mix",
    # 1-row corpus-total / count crossJoins (x45/x80 shape)
    "x143_topic_keywords",
    "x144_minhash_quality",
    "x146_dataset_card",
    # 1-row global-count crossJoin feeding the position math
    "x148_quantile_normalize",
    # 1-row token total / constant 9-row threshold grid (x45/x80 shape)
    "x150_word_subsample",
    "x151_threshold_sweep",
    # lag-grid (constant 24-row) / random-projection plane set
    # (constant n_planes rows) — linear in corpus, constant broadcast
    "x111_acf",
    "x115_random_projection",
    # query-sample broadcast: FIXED-budget md5 sample (~250 rows via
    # fixed_budget_sample, r5) — the broadcast side is bounded at any
    # corpus size
    "x124_knn_accuracy",
    # 1-row global-count crossJoin feeding the ntile closed form
    "x68_value_deciles",
    # literal 4-row k table broadcast against group-scale sizes
    "x174_k_anonymity",
    # 3-row class table + 1-row n_train broadcast into NB scoring
    "x180_naive_bayes",
    # 1-row basket-count broadcast into the rule metrics
    "x181_assoc_rules",
    # 1-row L1-norm broadcasts per HITS iteration
    "x182_hits",
    # 1-row qhat / n_cal / n_train broadcasts
    "x183_conformal",
    # category-scale marginal grid + 1-row total broadcasts
    "x184_chi2_independence",
    # 1-row stopping-index / last-index broadcasts
    "x185_sprt",
    # 1-row theta/xbar moment broadcast into the per-arm readout
    "x188_cuped",
    # 1-row total + 1-row entropy broadcasts
    "x189_mutual_info",
    # constant query-token broadcast (|Q| x n_tokens = 64 rows, x3 shape)
    "x175_colbert_maxsim",
    # two 1-row sketch rows + 1-row exact-twin crossJoins
    "x176_kmv_jaccard",
    # broadcast brute-force ranker (x3 shape) + 1-row label-count side
    "x177_mrr_map",
    # 1-row sample-totals broadcast against the cumulative table
    "x178_ks_drift",
    # 1-row corpus-token total broadcast into the unigram prob table
    "x154_doc_lm_score",
    # 1-row est x 1-row exact crossJoin (two scalar aggregates)
    "x161_join_cardinality_sketch",
    # 1-row horizon (max day) broadcast into the lifetime table
    "x164_kaplan_meier",
    # node-scale facility table broadcast (x3's brute-scan shape);
    # planetary scale routes through f23 XYZ tile blocking per the note
    "x165_haversine_nn",
    # constant 7-row lag grid (x111 shape) + 1-row moment broadcast
    "x190_acf",
    # 1-row n_sample/n_pairs/median broadcasts over the sampled slopes
    "x191_theil_sen",
    # literal 2-row l table broadcast against class-scale rows (x174 shape)
    "x193_l_diversity",
    # 1-row global-total + literal 2-row t grid broadcasts (x174 shape)
    "x194_t_closeness",
    # 1-row regression-moment crossJoin inside distributed_row_number
    # offsets / final readout
    "x195_zipf_fit",
    # 1-row (n_a, n_b) totals broadcast into the per-token terms
    "x196_js_divergence",
    # constant 7-row lag grid (x111/x190 shape)
    "x197_xcorr",
    # 1-row global-moment (mu) broadcast into item/user bias tables
    "x198_bias_baseline",
    # 1-row horizon (max day) broadcast (x164 shape)
    "x199_nelson_aalen",
    # constant fixed-budget sample pair join (x191 shape) + 1-row stats
    "x202_mann_kendall",
    # 1-row transition-total broadcast into the entropy terms (x189)
    "x208_entropy_rate",
    # two 1-row (rows, items) summary crossJoins
    "x210_coldstart_coverage",
    # 1-row global-moment x 1-row between-SS crossJoin
    "x212_seasonal_strength",
    # constant 7-row lag grid + 1-row moments (x190 shape)
    "x215_ljung_box",
    # 1-row global (n, sum) broadcast into the prefix candidates
    "x204_mean_shift_split",
    # 1-row global-count crossJoin feeding the ntile closed form (x68)
    "x166_rfm_segments",
    # 1-row digit-total crossJoin into the constant 9-row digit table
    "x167_benford_test",
    # 1-row (total, n_cust) crossJoin into the ranked customer table
    "x169_pareto_report",
    # bounded isotonic minimax grid: both crossJoin sides are the
    # quantized score-bucket table (<= n_buckets+1 rows by
    # construction), so the O(B^2) grid is constant-size at any data
    # scale; 1-row totals crossJoin in the importance-weight twin
    "x217_isotonic_calibration",
    "x218_importance_weights",
    # model-scale crossJoins only: langs x vocab grid (bounded by
    # charset^2 x |langs| at any corpus scale) + 1-row vsize/total
    "x238_langid",
}

# probes where a Window with an empty partition spec is acceptable —
# NONE: bounded-input windows must use plans/prefix.py:bounded_window
# (hash(key)%1 partition) so the single partition is declared in-plan.
UNPART_WINDOW_OK: set[str] = set()
# probes that legitimately use vectorized pandas UDFs (mapInPandas etc.)
PANDAS_OK_PREFIX = ("x2b", "x2c", "x3b", "x3c", "x3d", "x3e", "x13", "s5")

TABLE_WIDTHS = {
    "lineitem": 16, "orders": 9, "customer": 8, "supplier": 7, "part": 9,
    "nation": 4, "region": 3, "events": 6, "documents": 7, "embeddings": 3,
}


def audit(name: str, plan: str) -> list[str]:
    flags = []
    if "CartesianProduct" in plan and name not in CROSS_OK:
        flags.append("CARTESIAN")
    if "BroadcastNestedLoopJoin" in plan and name not in CROSS_OK:
        flags.append("NESTED_LOOP")
    if "BatchEvalPython" in plan:
        flags.append("ROW_PYTHON_UDF")
    # windowspecdefinition(partCols..., orderCols ASC|DESC ..., frame):
    # if the FIRST TOP-LEVEL argument already carries a sort direction,
    # the partition spec is empty → global single-partition window.
    # A depth-aware scan (not a [^,)]* regex) so order expressions with
    # internal commas — coalesce(x, 0) ASC — can't hide the marker.
    if name not in UNPART_WINDOW_OK:
        for m in re.finditer(r"windowspecdefinition\(", plan):
            first_arg, depth = [], 0
            for ch in plan[m.end() : m.end() + 500]:
                if ch == "(":
                    depth += 1
                elif ch == ")":
                    if depth == 0:
                        break
                    depth -= 1
                elif ch == "," and depth == 0:
                    break
                first_arg.append(ch)
            arg = "".join(first_arg)
            # ordered global window: first arg is an order expression;
            # UNordered global window (Window.partitionBy() with no
            # orderBy): first arg is already the frame spec
            if re.search(r" (ASC|DESC)\b", arg) or arg.startswith(
                "specifiedwindowframe"
            ):
                flags.append("UNPART_WINDOW")
                break
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", plan):
        ncols = len([c for c in m.group(1).split(",") if c])
        # full-width reads of wide tables are suspicious (no pruning)
        loc = plan[: m.start()].rfind("Location")
        tbl = None
        if loc != -1:
            mm = re.search(r"/(\w+)\.parquet", plan[loc : loc + 300])
            tbl = mm.group(1) if mm else None
        if tbl in TABLE_WIDTHS and ncols >= TABLE_WIDTHS[tbl] and TABLE_WIDTHS[tbl] > 6:
            flags.append(f"FULL_WIDTH_SCAN:{tbl}({ncols})")
    n_exch = plan.count("Exchange")
    if n_exch > 6:
        flags.append(f"MANY_SHUFFLES({n_exch})")
    return flags


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark("audit", cpus=8, shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    bad = 0
    for name, p in sorted(all_probes().items()):
        if only and name not in only:
            continue
        df = p.fn(spark, sf_dir)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        plan = buf.getvalue()
        flags = audit(name, plan)
        hot = [f for f in flags if not f.startswith(("FULL_WIDTH", "MANY_"))]
        wsc = len(set(re.findall(r"codegen id : (\d+)", plan)))
        status = "FLAG " + ",".join(flags) if flags else "ok"
        if any(name.startswith(pre) for pre in PANDAS_OK_PREFIX):
            status = status.replace("ROW_PYTHON_UDF", "pandas-udf(ok)")
            hot = [f for f in hot if f != "ROW_PYTHON_UDF"]
        print(f"{name:28s} wsc={wsc:2d}  {status}")
        bad += bool(hot)
    print(f"\n{'AUDIT CLEAN' if bad == 0 else f'{bad} probes flagged'}")


if __name__ == "__main__":
    main()
