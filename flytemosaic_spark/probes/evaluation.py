"""Model-evaluation aggregates over the engine: exact ROC AUC,
calibration (reliability) bins, and cumulative gains/lift — the
readouts a training-data pipeline runs after scoring a corpus with a
classifier (the scoring itself is x32_model_score).

Portability contract: every intermediate is INTEGER arithmetic
(half-rank units for AUC, price-cents "ppm" scores for the bins), so
the only floating-point op on either engine is the final division —
bit-identical across Spark and DuckDB, then portable-rounded.

Scale notes: the AUC rank cumsum runs over the per-score aggregate
(|distinct scores| rows) through ``plans/prefix.py`` distributed
cumsum — no single-partition sort at any cardinality. The calibration
and gains tables aggregate to a fixed 10 bins before any window, so
their windows are constant-size regardless of input rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from flytemosaic_spark.operators.text import portable_round
from flytemosaic_spark.plans.prefix import bounded_window
from flytemosaic_spark.probes.registry import T, probe

# Deterministic "model score" for evaluation probes: the fractional
# price in parts-per-million (integer 0..999999). Derived from cents =
# floor(price*100 + 0.5) so both engines quantize the stored double
# identically before any arithmetic.
_PPM_SQL = (
    "CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) % 1000000"
)


def _scored_orders(spark: SparkSession, sf: str) -> DataFrame:
    return T(spark, sf, "orders").select(
        (F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("bigint") % 1000000)
        .alias("ppm"),
        (F.col("o_orderstatus") == "F").cast("bigint").alias("y"),
    )


@probe(
    "x106_roc_auc",
    sql="""
        WITH s AS (
            SELECT CAST(floor(o_totalprice / 1000) AS BIGINT) AS sc,
                   CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS y
            FROM orders
        ),
        v AS (SELECT sc, count(*) AS n, sum(y) AS np FROM s GROUP BY sc),
        r AS (
            SELECT sc, n, np,
                   coalesce(sum(n) OVER (ORDER BY sc
                                         ROWS BETWEEN UNBOUNDED PRECEDING
                                         AND 1 PRECEDING), 0) AS cb
            FROM v
        ),
        t AS (
            SELECT sum(np * (2 * cb + n + 1)) AS rp2,
                   sum(np) AS npos, sum(n - np) AS nneg
            FROM r
        )
        SELECT CAST(npos AS BIGINT) AS n_pos, CAST(nneg AS BIGINT) AS n_neg,
               floor(((rp2 - npos * (npos + 1)) / (2.0 * npos * nneg))
                     * 1000000 + 0.5) / 1000000 AS auc
        FROM t
    """,
    note="exact tie-corrected ROC AUC via the Mann-Whitney rank sum: "
    "per-score-value aggregate, then average ranks in integer "
    "HALF-RANK units (2*cum_before + n + 1) accumulated in "
    "DECIMAL(38,0) (the sum passes int64 near 1e9 rows per slice; "
    "DuckDB's sum(BIGINT) is already hugeint) — exact on both "
    "engines at any scale; the exclusive rank cumsum runs through "
    "plans/prefix.py distributed_cumsum — bounded per-task state at "
    "any score cardinality, no single-partition window",
)
def x106_roc_auc(spark: SparkSession, sf: str) -> DataFrame:
    from flytemosaic_spark.operators.metrics import roc_auc

    s = T(spark, sf, "orders").select(
        F.floor(F.col("o_totalprice") / 1000).cast("bigint").alias("sc"),
        (F.col("o_orderstatus") == "F").cast("bigint").alias("y"),
    )
    return roc_auc(s, "sc", "y")


@probe(
    "x107_calibration_bins",
    sql=f"""
        WITH s AS (
            SELECT {_PPM_SQL} AS ppm,
                   CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS y
            FROM orders
        ),
        g AS (
            SELECT ppm // 100000 AS bin, count(*) AS n,
                   sum(y) AS pos, sum(ppm) AS sum_ppm
            FROM s GROUP BY 1
        )
        SELECT CAST(bin AS BIGINT) AS bin, CAST(n AS BIGINT) AS n,
               floor((pos / n) * 1000000 + 0.5) / 1000000 AS pos_rate,
               floor((sum_ppm / n / 1000000.0) * 1000000 + 0.5) / 1000000
                   AS avg_score
        FROM g
    """,
    note="calibration (reliability-diagram) bins: deterministic ppm "
    "score in 10 fixed-width bins, observed positive rate vs mean "
    "predicted score per bin — one hash aggregate, all-integer state, "
    "two final divisions",
)
def x107_calibration_bins(spark: SparkSession, sf: str) -> DataFrame:
    g = (
        _scored_orders(spark, sf)
        .groupBy(F.expr("ppm div 100000").alias("bin"))
        .agg(
            F.count("*").alias("n"),
            F.sum("y").alias("pos"),
            F.sum("ppm").alias("sum_ppm"),
        )
    )
    return g.select(
        "bin",
        "n",
        portable_round(F.col("pos") / F.col("n"), 6).alias("pos_rate"),
        portable_round(
            F.col("sum_ppm") / F.col("n") / F.lit(1000000.0), 6
        ).alias("avg_score"),
    )


@probe(
    "x108_cumulative_gains",
    sql=f"""
        WITH s AS (
            SELECT {_PPM_SQL} AS ppm,
                   CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS y
            FROM orders
        ),
        g AS (
            SELECT ppm // 100000 AS bin, count(*) AS n, sum(y) AS pos
            FROM s GROUP BY 1
        ),
        c AS (
            SELECT bin,
                   sum(n) OVER (ORDER BY bin DESC
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                AND CURRENT ROW) AS cum_n,
                   sum(pos) OVER (ORDER BY bin DESC
                                  ROWS BETWEEN UNBOUNDED PRECEDING
                                  AND CURRENT ROW) AS cum_pos,
                   sum(n) OVER () AS tot_n, sum(pos) OVER () AS tot_pos
            FROM g
        )
        SELECT CAST(bin AS BIGINT) AS bin,
               CAST(cum_n AS BIGINT) AS cum_n,
               CAST(cum_pos AS BIGINT) AS cum_pos,
               floor((cum_pos / tot_pos) * 1000000 + 0.5) / 1000000 AS gain,
               floor(((cum_pos / cum_n) / (tot_pos / tot_n))
                     * 1000000 + 0.5) / 1000000 AS lift
        FROM c
    """,
    note="cumulative gains / lift chart: fraction of all positives "
    "captured when targeting the top-k score bins. The window runs "
    "over the 10-row bin aggregate — constant size regardless of "
    "input rows, so the unpartitioned frame is scale-free",
)
def x108_cumulative_gains(spark: SparkSession, sf: str) -> DataFrame:
    g = (
        _scored_orders(spark, sf)
        .groupBy(F.expr("ppm div 100000").alias("bin"))
        .agg(F.count("*").alias("n"), F.sum("y").alias("pos"))
    )
    # bin axis is bounded (score quantized to <=1e3 bins), not data scale
    w = bounded_window("bin", F.col("bin").desc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    w_all = bounded_window("bin", F.col("bin").desc()).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    c = g.select(
        "bin",
        F.sum("n").over(w).alias("cum_n"),
        F.sum("pos").over(w).alias("cum_pos"),
        F.sum("n").over(w_all).alias("tot_n"),
        F.sum("pos").over(w_all).alias("tot_pos"),
    )
    return c.select(
        "bin",
        "cum_n",
        "cum_pos",
        portable_round(F.col("cum_pos") / F.col("tot_pos"), 6).alias("gain"),
        portable_round(
            (F.col("cum_pos") / F.col("cum_n"))
            / (F.col("tot_pos") / F.col("tot_n")),
            6,
        ).alias("lift"),
    )


@probe(
    "x109_hll_distinct",
    sql="""
        WITH h AS (
            SELECT o_orderpriority AS grp, o_custkey AS v,
                   ('0x' || substr(md5(CAST(o_custkey AS VARCHAR)), 1, 15))::BIGINT
                       AS hh
            FROM orders
        ),
        b AS (
            SELECT grp, hh % 256 AS reg,
                   CASE WHEN hh // 256 = 0 THEN 0
                        ELSE length(bin(hh // 256)) END AS bits
            FROM h
        ),
        r AS (SELECT grp, reg, min(bits) AS minbits FROM b GROUP BY grp, reg),
        z AS (
            SELECT grp, count(*) AS nreg,
                   sum(CAST(power(2.0, minbits) AS BIGINT)) AS terms
            FROM r GROUP BY grp
        ),
        e AS (
            SELECT grp, nreg,
                   (0.7213 / (1.0 + 1.079 / 256.0)) * 256.0 * 256.0
                       * 9007199254740992
                       / ((256 - nreg) * 9007199254740992 + terms) AS raw
            FROM z
        ),
        est AS (
            SELECT grp,
                   CASE WHEN raw <= 640.0 AND nreg < 256
                        THEN 256.0 * ln(256.0 / (256 - nreg))
                        ELSE raw END AS hll
            FROM e
        ),
        x AS (SELECT grp, count(DISTINCT v) AS n_exact
              FROM h GROUP BY grp)
        SELECT est.grp AS o_orderpriority,
               CAST(x.n_exact AS BIGINT) AS n_exact,
               floor(est.hll * 10000.0 + 0.5) / 10000.0 AS hll_estimate
        FROM est JOIN x ON est.grp = x.grp
    """,
    note="portable HyperLogLog (m=256, md5 hash family, "
    "operators/sketch.py): register terms summed in integer units of "
    "2^-53 so Z is exact bigint on both engines and the estimate "
    "itself reproduces bit-identically outside Spark — auditable and "
    "mergeable (long-form register state, min() merge; "
    "merge==direct and error-bound tests in tests/test_sketch.py). "
    "Exact distinct joined alongside for the error readout",
)
def x109_hll_distinct(spark: SparkSession, sf: str) -> DataFrame:
    from flytemosaic_spark.operators.sketch import hll_distinct

    orders = T(spark, sf, "orders")
    est = hll_distinct(orders, "o_custkey", ["o_orderpriority"])
    exact = orders.groupBy("o_orderpriority").agg(
        F.countDistinct("o_custkey").alias("n_exact")
    )
    return exact.join(F.broadcast(est), "o_orderpriority").select(
        "o_orderpriority", "n_exact", "hll_estimate"
    )


@probe(
    "x124_knn_accuracy",
    sql="""
        WITH th AS (
            SELECT CAST(floor((250 * 65536 + count(*) - 1)
                              / CAST(count(*) AS DOUBLE)) AS BIGINT) AS tt
            FROM embeddings
        ),
        q AS (SELECT vec_id AS q_id, CAST(embedding AS DOUBLE[]) AS qv,
                     label AS true_label
              FROM embeddings CROSS JOIN th
              WHERE tt >= 65536
                 OR substr(md5('knn:' || CAST(vec_id AS VARCHAR)), 1, 4)
                    < printf('%04x', tt)),
        c AS (SELECT vec_id AS neighbor_id, CAST(embedding AS DOUBLE[]) AS cv,
                     label FROM embeddings),
        scored AS (
            SELECT q_id, true_label, neighbor_id, c.label,
                   round(list_cosine_similarity(qv, cv), 4) AS sim
            FROM q CROSS JOIN c WHERE q_id <> neighbor_id
        ),
        ranked AS (
            SELECT q_id, true_label, label,
                   row_number() OVER (PARTITION BY q_id
                       ORDER BY sim DESC, neighbor_id) AS rnk
            FROM scored
        ),
        votes AS (
            SELECT q_id, true_label, label, count(*) AS nv
            FROM ranked WHERE rnk <= 5 GROUP BY 1, 2, 3
        ),
        pred AS (
            SELECT q_id, true_label, label AS pred_label,
                   row_number() OVER (PARTITION BY q_id
                       ORDER BY nv DESC, label) AS vr
            FROM votes
        )
        SELECT true_label AS label, count(*) AS n,
               sum(CASE WHEN pred_label = true_label THEN 1 ELSE 0 END)
                   AS n_correct,
               floor((sum(CASE WHEN pred_label = true_label
                               THEN 1 ELSE 0 END) / count(*))
                     * 1000000 + 0.5) / 1000000 AS accuracy
        FROM pred WHERE vr = 1
        GROUP BY true_label
    """,
    note="5-NN leave-one-out classification accuracy per label over "
    "the exact cosine top-k (x3's broadcast-scan plan): majority vote "
    "with (count desc, label) tie-break, integer correct-counts, one "
    "final division — the intrinsic-quality readout for an embedding "
    "column before it is trusted for near-dup or retrieval work. "
    "Queries are a FIXED-BUDGET deterministic md5 sample (~250 — "
    "r5: was a 25% RATE whose broadcast side grew with the corpus; "
    "the 16-bit threshold now derives in-plan from the exact count "
    "via sampling.py:fixed_budget_sample, so eval cost is "
    "O(budget x corpus) and the broadcast query side is bounded at "
    "ANY corpus size, the x191 recipe)",
)
def x124_knn_accuracy(spark: SparkSession, sf: str) -> DataFrame:
    from flytemosaic_spark.operators.sampling import fixed_budget_sample
    from flytemosaic_spark.operators.similarity import brute_force_topk

    emb = T(spark, sf, "embeddings")
    labels = emb.select("vec_id", "label")
    queries = fixed_budget_sample(emb, "vec_id", 250, seed_tag="knn")
    topk = brute_force_topk(corpus=emb, queries=queries, k=5)
    votes = (
        topk.join(
            labels.withColumnRenamed("vec_id", "neighbor_id"), "neighbor_id"
        )
        .groupBy("q_id", "label")
        .agg(F.count("*").alias("nv"))
    )
    w = Window.partitionBy("q_id").orderBy(F.col("nv").desc(), "label")
    pred = (
        votes.withColumn("vr", F.row_number().over(w))
        .where(F.col("vr") == 1)
        .select("q_id", F.col("label").alias("pred_label"))
    )
    joined = pred.join(
        F.broadcast(
            labels.select(
                F.col("vec_id").alias("q_id"),
                F.col("label").alias("true_label"),
            )
        ),
        "q_id",
    )
    correct = F.sum(
        (F.col("pred_label") == F.col("true_label")).cast("bigint")
    )
    return joined.groupBy(F.col("true_label").alias("label")).agg(
        F.count("*").alias("n"),
        correct.alias("n_correct"),
        portable_round(correct / F.count("*"), 6).alias("accuracy"),
    )


@probe(
    "s15_orc_roundtrip",
    sql="SELECT n_nationkey, n_name, n_regionkey FROM nation",
    note="ORC sink+source round-trip (the third columnar format after "
    "parquet and the CSV/JSON text sources, still with predicate "
    "pushdown + column pruning from Spark's native ORC reader) — "
    "proven through the same oracle gate as s12/s13",
)
def s15_orc_roundtrip(spark: SparkSession, sf: str) -> DataFrame:
    from flytemosaic_spark.probes.advanced import _NATION_DDL, _roundtrip_dir

    path = _roundtrip_dir(sf, "orc")
    T(spark, sf, "nation").select(
        "n_nationkey", "n_name", "n_regionkey"
    ).write.mode("overwrite").orc(path)
    return spark.read.schema(_NATION_DDL).orc(path)
