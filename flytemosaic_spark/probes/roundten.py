"""Round-10 probes: exact distributed isotonic calibration (the
minimax/PAVA monotone fit on a bounded quantized score axis) and
covariate-shift importance weighting (smoothed per-category density
ratios) — the two model-eval/curation gaps left after round 9.

Scale notes: isotonic's O(B²) minimax grid lives on a PROVABLY
bounded bucket axis (<= n_buckets+1 rows after one data-scale
aggregation), so the quadratic part is constant-size at any corpus
scale; importance weights are one (category, slice) histogram plus
1-row totals. All state is exact-integer until single final
divisions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flytemosaic_spark.probes.registry import T, probe

# ---------------------------------------------------------------------------
# x217 — isotonic calibration curve (exact minimax PAVA)
# ---------------------------------------------------------------------------


@probe(
    "x217_isotonic_calibration",
    sql="""
        WITH pts AS (
            SELECT CAST(floor((l_quantity + l_discount * 100) / 70.0
                              * 1000 + 0.5) AS BIGINT) AS b,
                   count(*) AS w,
                   sum(CASE WHEN l_quantity > 25 THEN 1 ELSE 0 END) AS s
            FROM lineitem GROUP BY 1
        ),
        c AS (
            SELECT b, w, s,
                   sum(w) OVER (ORDER BY b) AS cw,
                   sum(s) OVER (ORDER BY b) AS cs
            FROM pts
        ),
        grid AS (
            SELECT j.b AS bj, k.b AS bk,
                   (k.cs - (j.cs - j.s))
                       / CAST(k.cw - (j.cw - j.w) AS DOUBLE) AS a
            FROM c j JOIN c k ON j.b <= k.b
        ),
        suf AS (
            SELECT bj, bk,
                   min(a) OVER (PARTITION BY bj ORDER BY bk DESC
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                AND CURRENT ROW) AS m
            FROM grid
        ),
        fit AS (SELECT bk AS b, max(m) AS iso FROM suf GROUP BY 1)
        SELECT pts.b AS bucket,
               floor(pts.b / 1000.0 * 1e6 + 0.5) / 1e6 AS score_mid,
               CAST(pts.w AS BIGINT) AS n,
               floor(pts.s / CAST(pts.w AS DOUBLE) * 1e6 + 0.5) / 1e6
                   AS rate,
               floor(fit.iso * 1e6 + 0.5) / 1e6 AS iso_rate
        FROM pts JOIN fit USING (b)
        ORDER BY bucket
    """,
    note="exact distributed isotonic regression / monotone calibration "
    "curve (operators/metrics.py:isotonic_fit — Zadrozny & Elkan's "
    "isotonic calibration): fitted[i] = max_{j<=i} min_{k>=i} "
    "wavg(j..k), the minimax characterization, equivalence-tested "
    "against sequential PAVA. The score axis quantizes to <= 1001 "
    "buckets — a PROVABLY bounded axis — so after ONE data-scale "
    "aggregation the O(B²) grid (~1e6 cells max), the per-j "
    "suffix-min windows and the final max-groupBy are all "
    "constant-size regardless of corpus scale (the bounded crossJoin "
    "is whitelisted with this justification); integer (w, s) prefix "
    "sums make every grid average one exact-int division, min/max "
    "over identical IEEE doubles is engine-identical, output at 1e-6",
)
def x217_isotonic_calibration(spark: SparkSession, sf: str) -> DataFrame:
    from flytemosaic_spark.operators.metrics import isotonic_fit

    li = T(spark, sf, "lineitem")
    # noisy-monotone fixture: label is a quantity threshold, score is
    # quantity blurred by the (independent) discount column
    return isotonic_fit(
        li,
        (F.col("l_quantity") + F.col("l_discount") * 100) / 70.0,
        (F.col("l_quantity") > 25).cast("int"),
        n_buckets=1000,
    )


# ---------------------------------------------------------------------------
# x218 — covariate-shift importance weights (smoothed density ratio)
# ---------------------------------------------------------------------------


@probe(
    "x218_importance_weights",
    sql="""
        WITH base AS (
            SELECT o_orderpriority AS c, o_orderstatus AS s
            FROM orders WHERE o_orderstatus IN ('F', 'O')
        ),
        hist AS (
            SELECT c,
                   sum(CASE WHEN s = 'F' THEN 1 ELSE 0 END) AS n_source,
                   sum(CASE WHEN s = 'O' THEN 1 ELSE 0 END) AS n_target
            FROM base GROUP BY 1
        ),
        tot AS (SELECT sum(n_source) AS ns, sum(n_target) AS nt,
                       count(*) AS k FROM hist)
        SELECT c AS category,
               CAST(n_source AS BIGINT) AS n_source,
               CAST(n_target AS BIGINT) AS n_target,
               floor(least(greatest(
                   ((n_target + 1.0) / (nt + 1.0 * k))
                       / ((n_source + 1.0) / (ns + 1.0 * k)),
                   1.0 / 10.0), 10.0) * 1e6 + 0.5) / 1e6 AS weight
        FROM hist CROSS JOIN tot
    """,
    note="covariate-shift importance weights "
    "(operators/sampling.py:importance_weights — Shimodaira 2000 "
    "density-ratio reweighting, the curation knob that makes a source "
    "corpus LOOK like a target distribution without resampling): "
    "Laplace-smoothed per-category p_target/p_source, symmetric-"
    "clipped to [0.1, 10]; one (category, slice) histogram + 1-row "
    "totals broadcast back, exact-integer state to a single final "
    "division — category-scale output at any corpus size",
)
def x218_importance_weights(spark: SparkSession, sf: str) -> DataFrame:
    from flytemosaic_spark.operators.sampling import importance_weights

    orders = T(spark, sf, "orders")
    return importance_weights(
        orders,
        "o_orderpriority",
        "o_orderstatus",
        source_val="F",
        target_val="O",
        alpha=1.0,
        clip=10.0,
    )
