"""TPC-H-derived query suite (all 22 queries, plus two
hand-reformulated scale twins q21b/q02b), adapted to the driver's
reduced schema.

The driver's testdata is a reduced TPC-H: no partsupp table, and the
comment/address/phone/shipmode/commitdate columns are absent. The
queries below keep each TPC-H query's *shape* (join graph, aggregate
structure, subquery pattern) on the columns that exist, marked `_lite`
where a predicate had to move to a surviving column (Q21's
receipt-after-commit marker becomes l_returnflag = 'R', keeping its
EXISTS/NOT EXISTS essence). The four partsupp queries (Q2, Q11, Q16,
Q20) are adapted with LINEITEM as the part-supplier bridge — each
keeps the decorrelation shape that is its optimizer point (correlated
scalar-min; HAVING vs a global-total scalar subquery; NOT IN +
count-distinct; nested semi whose inner HAVING holds a correlated
scalar aggregate). Q12 keeps its per-mode lateness split with
l_linestatus as the mode axis and shipped->30-days-late as the
lateness marker (shipmode/commitdate don't exist in this schema).

Every probe here executes the SAME SQL text on both engines: the
Spark side goes through the engine's SQL frontend
(:func:`flytemosaic_spark.sql.sql` over registered views) and the
oracle is the identical string run by DuckDB — so this suite also
proves the SQL surface end-to-end, not just the DataFrame API.

Dialect-portability rules (both engines must do the same IEEE math):
- float literals that touch double columns are CAST(... AS DOUBLE)
  (DuckDB parses bare 0.05 as DECIMAL, Spark as DOUBLE);
- order-sensitive double aggregates are rounded half-up via
  floor(x*10^k + 0.5)/10^k (sum order differs across engines; true
  discrepancy ~1e-9 relative, far below the rounding grain);
- quantity/count aggregates are exact in both engines (integer-valued
  doubles below 2^53 sum exactly in any order), so thresholds like
  HAVING sum(l_quantity) > 150 and q17's 0.2*avg correlated bound
  are deterministic without rounding;
- year() is CAST to BIGINT (DuckDB returns BIGINT, Spark INT);
- every ORDER BY ... LIMIT ranks by the ROUNDED measure with a key
  tiebreaker, so the selected row set is identical across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from flytemosaic_spark.probes.registry import probe
from flytemosaic_spark.sql import sql as run_sql


def _tpch(name: str, query: str, note: str):
    """Register a probe whose Spark plan is spark.sql(query) over the
    engine's registered views and whose oracle is the same string."""

    @probe(name, sql=query, note=note)
    def fn(spark: SparkSession, sf: str, _q=query) -> DataFrame:
        return run_sql(spark, sf, _q)

    return fn


_tpch(
    "q01_pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           floor(sum(l_quantity) * 100 + 0.5) / 100 AS sum_qty,
           floor(sum(l_extendedprice) * 100 + 0.5) / 100 AS sum_base_price,
           floor(sum(l_extendedprice * (1 - l_discount)) * 100 + 0.5) / 100
               AS sum_disc_price,
           floor(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax))
                 * 100 + 0.5) / 100 AS sum_charge,
           floor(avg(l_quantity) * 10000 + 0.5) / 10000 AS avg_qty,
           floor(avg(l_extendedprice) * 10000 + 0.5) / 10000 AS avg_price,
           floor(avg(l_discount) * 10000 + 0.5) / 10000 AS avg_disc,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= DATE '2000-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
    "TPC-H Q1 pricing summary: one scan, map-side partial agg into 4 "
    "groups — the canonical whole-stage-codegen aggregate",
)

_tpch(
    "q03_shipping_priority",
    """
    SELECT l_orderkey,
           floor(sum(l_extendedprice * (1 - l_discount)) * 100 + 0.5) / 100
               AS revenue,
           o_orderdate
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < DATE '1998-03-15'
      AND l_shipdate > DATE '1998-03-15'
    GROUP BY l_orderkey, o_orderdate
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
    "TPC-H Q3 shipping priority (o_shippriority column absent): "
    "selective dim filter -> fact join -> top-10 by rounded revenue "
    "(TakeOrderedAndProject, no global sort)",
)

_tpch(
    "q04_late_orders_lite",
    """
    SELECT o_orderpriority, count(DISTINCT o_orderkey) AS late_orders
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate > o_orderdate + INTERVAL 60 DAY
    GROUP BY o_orderpriority
    """,
    "TPC-H Q4 shape (commitdate/receiptdate absent -> 'shipped more "
    "than 60 days after ordering'): semi-join-style existence count "
    "per priority class",
)

_tpch(
    "q05_local_supplier_volume",
    """
    SELECT n_name,
           floor(sum(l_extendedprice * (1 - l_discount)) * 100 + 0.5) / 100
               AS revenue
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= DATE '1996-01-01'
      AND o_orderdate < DATE '1997-01-01'
    GROUP BY n_name
    """,
    "TPC-H Q5 local supplier volume: 6-table join with the "
    "customer-nation = supplier-nation same-key constraint; dims "
    "broadcast, fact shuffles once",
)

_tpch(
    "q06_forecast_revenue",
    """
    SELECT floor(sum(l_extendedprice * l_discount) * 100 + 0.5) / 100
               AS revenue
    FROM lineitem
    WHERE l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1997-01-01'
      AND l_discount BETWEEN CAST(0.05 AS DOUBLE) AND CAST(0.07 AS DOUBLE)
      AND l_quantity < 24
    """,
    "TPC-H Q6 forecast revenue change: pure scan-filter-agg, every "
    "predicate pushed to the parquet reader",
)

_tpch(
    "q07_volume_shipping",
    """
    SELECT supp_nation, cust_nation, l_year,
           floor(sum(volume) * 100 + 0.5) / 100 AS revenue
    FROM (
        SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
               CAST(year(l_shipdate) AS BIGINT) AS l_year,
               l_extendedprice * (1 - l_discount) AS volume
        FROM supplier
        JOIN lineitem ON s_suppkey = l_suppkey
        JOIN orders ON o_orderkey = l_orderkey
        JOIN customer ON c_custkey = o_custkey
        JOIN nation n1 ON s_nationkey = n1.n_nationkey
        JOIN nation n2 ON c_nationkey = n2.n_nationkey
        WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
            OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
          AND l_shipdate BETWEEN DATE '1996-01-01' AND DATE '1997-12-31'
    ) shipping
    GROUP BY supp_nation, cust_nation, l_year
    """,
    "TPC-H Q7 volume shipping between two nations: the same dimension "
    "joined twice under different roles, disjunctive cross-nation "
    "predicate",
)

_tpch(
    "q08_market_share",
    """
    SELECT o_year,
           floor(sum(CASE WHEN nation = 'NATION_3' THEN volume
                          ELSE CAST(0 AS DOUBLE) END) / sum(volume)
                 * 10000 + 0.5) / 10000 AS mkt_share
    FROM (
        SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
               l_extendedprice * (1 - l_discount) AS volume,
               n2.n_name AS nation
        FROM part
        JOIN lineitem ON p_partkey = l_partkey
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation n1 ON c_nationkey = n1.n_nationkey
        JOIN region ON n1.n_regionkey = r_regionkey
        JOIN nation n2 ON s_nationkey = n2.n_nationkey
        WHERE r_name = 'AMERICA'
          AND o_orderdate BETWEEN DATE '1996-01-01' AND DATE '1997-12-31'
          AND p_type = 'ECONOMY'
    ) all_nations
    GROUP BY o_year
    """,
    "TPC-H Q8 national market share: 8-relation join, conditional "
    "aggregation ratio",
)

_tpch(
    "q09_product_profit_lite",
    """
    SELECT nation, o_year,
           floor(sum(amount) * 100 + 0.5) / 100 AS sum_profit
    FROM (
        SELECT n_name AS nation,
               CAST(year(o_orderdate) AS BIGINT) AS o_year,
               l_extendedprice * (1 - l_discount) AS amount
        FROM part
        JOIN lineitem ON p_partkey = l_partkey
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN orders ON o_orderkey = l_orderkey
        JOIN nation ON s_nationkey = n_nationkey
        WHERE p_name LIKE '%red%'
    ) profit
    GROUP BY nation, o_year
    """,
    "TPC-H Q9 shape (partsupp absent -> profit reduces to revenue): "
    "LIKE-filtered part dim, supplier-nation rollup per year",
)

_tpch(
    "q10_returned_items",
    """
    SELECT c_custkey, c_name,
           floor(sum(l_extendedprice * (1 - l_discount)) * 100 + 0.5) / 100
               AS revenue,
           c_acctbal, n_name
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation ON c_nationkey = n_nationkey
    WHERE o_orderdate >= DATE '1996-10-01' AND o_orderdate < DATE '1997-01-01'
      AND l_returnflag = 'R'
    GROUP BY c_custkey, c_name, c_acctbal, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
    "TPC-H Q10 returned-item reporting (address/phone/comment columns "
    "absent): top-20 lossy customers by rounded revenue",
)

_tpch(
    "q14_promo_effect",
    """
    SELECT floor(sum(CASE WHEN p_type = 'PROMO'
                          THEN l_extendedprice * (1 - l_discount)
                          ELSE CAST(0 AS DOUBLE) END)
                 * CAST(100.0 AS DOUBLE)
                 / sum(l_extendedprice * (1 - l_discount))
                 * 10000 + 0.5) / 10000 AS promo_revenue
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= DATE '1996-09-01' AND l_shipdate < DATE '1996-10-01'
    """,
    "TPC-H Q14 promotion effect: conditional-aggregation percentage "
    "over a month of shipments (p_type here is a flat enum, so "
    "equality replaces LIKE 'PROMO%%')",
)

_tpch(
    "q15_top_supplier",
    """
    WITH revenue0 AS (
        SELECT l_suppkey AS supplier_no,
               floor(sum(l_extendedprice * (1 - l_discount)) * 100 + 0.5)
                   / 100 AS total_revenue
        FROM lineitem
        WHERE l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1996-04-01'
        GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier JOIN revenue0 ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT max(total_revenue) FROM revenue0)
    """,
    "TPC-H Q15 top supplier: CTE reused by the outer query and a "
    "scalar subquery; revenue rounded BEFORE the max so the argmax "
    "row set is engine-identical",
)

_tpch(
    "q17_small_quantity_lite",
    """
    SELECT floor(sum(l_extendedprice) / CAST(7.0 AS DOUBLE) * 100 + 0.5)
               / 100 AS avg_yearly
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE p_brand = 'Brand#13'
      AND l_quantity < (
          SELECT CAST(0.2 AS DOUBLE) * avg(l_quantity)
          FROM lineitem l2 WHERE l2.l_partkey = p_partkey
      )
    """,
    "TPC-H Q17 small-quantity-order revenue (container column absent): "
    "correlated scalar subquery per part, decorrelated by Catalyst "
    "into an aggregate+join; the avg of integer-valued quantities is "
    "exact in any summation order, so the correlated bound needs no "
    "rounding",
)

_tpch(
    "q18_large_volume_customer",
    """
    SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
           floor(sum(l_quantity) * 100 + 0.5) / 100 AS sum_qty
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderkey IN (
        SELECT l_orderkey FROM lineitem
        GROUP BY l_orderkey HAVING sum(l_quantity) > 150
    )
    GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 100
    """,
    "TPC-H Q18 large-volume customers: IN over a grouped HAVING "
    "subquery (left-semi join against an aggregate); the quantity "
    "threshold is exact integer math on both engines",
)

_tpch(
    "q22_global_sales_lite",
    """
    SELECT cntrycode, count(*) AS numcust,
           floor(sum(c_acctbal) * 100 + 0.5) / 100 AS totacctbal
    FROM (
        SELECT CAST(c_nationkey % 5 AS BIGINT) AS cntrycode, c_acctbal,
               c_custkey
        FROM customer
        WHERE c_acctbal > (
            SELECT floor(avg(c_acctbal) * 1000000 + 0.5) / 1000000
            FROM customer c2 WHERE c2.c_acctbal > CAST(0.0 AS DOUBLE)
        )
    ) rich
    WHERE NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey
                        AND o_orderdate >= DATE '2000-01-01')
    GROUP BY cntrycode
    """,
    "TPC-H Q22 shape (phone column absent -> country code from "
    "nationkey): uncorrelated scalar average (rounded at 1e-6 so the "
    "cut is engine-identical) + NOT EXISTS anti-join for lapsed "
    "customers (none since 2000 — every customer HAS ordered at some "
    "point at these scale factors, so the unrestricted form is empty)",
)

_tpch(
    "q13_customer_distribution_lite",
    """
    SELECT c_count, count(*) AS custdist
    FROM (
        SELECT c.c_custkey, count(o.o_orderkey) AS c_count
        FROM customer c LEFT OUTER JOIN orders o
          ON c.c_custkey = o.o_custkey
        GROUP BY c.c_custkey
    ) c_orders
    GROUP BY c_count
    """,
    "TPC-H Q13 shape (the comment-pattern exclusion is out of scope — "
    "o_comment is absent from the reduced schema): order-count "
    "distribution per customer INCLUDING zero-order customers via the "
    "left outer join + count(join-side key); two hash aggregates, "
    "all-integer",
)

_tpch(
    "q19_discounted_revenue_lite",
    """
    SELECT floor(sum(l_extendedprice * (1 - l_discount)) * 100 + 0.5) / 100
               AS revenue
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE
        (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 15
         AND l.l_quantity >= 1 AND l.l_quantity <= 11)
     OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 1 AND 25
         AND l.l_quantity >= 10 AND l.l_quantity <= 20)
     OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 1 AND 40
         AND l.l_quantity >= 20 AND l.l_quantity <= 30)
    """,
    "TPC-H Q19 shape (container/shipmode absent -> brand+size+quantity "
    "OR-groups): the disjunctive join predicate — Catalyst pushes the "
    "common p_partkey equi-key into the hash join and the OR-of-ANDs "
    "residual evaluates post-join, with derivable per-side filters "
    "(brand IN, size <= 40, quantity <= 30) pushed to the scans",
)

_tpch(
    "q21_waiting_suppliers_lite",
    """
    SELECT s_name, count(*) AS numwait
    FROM supplier, lineitem l1, orders, nation
    WHERE s_suppkey = l1.l_suppkey
      AND o_orderkey = l1.l_orderkey
      AND o_orderstatus = 'F'
      AND l1.l_returnflag = 'R'
      AND EXISTS (
          SELECT 1 FROM lineitem l2
          WHERE l2.l_orderkey = l1.l_orderkey
            AND l2.l_suppkey <> l1.l_suppkey
      )
      AND NOT EXISTS (
          SELECT 1 FROM lineitem l3
          WHERE l3.l_orderkey = l1.l_orderkey
            AND l3.l_suppkey <> l1.l_suppkey
            AND l3.l_returnflag = 'R'
      )
      AND s_nationkey = n_nationkey
      AND n_name = 'NATION_9'
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 100
    """,
    "TPC-H Q21 shape (commitdate/receiptdate absent -> the 'late "
    "line' marker becomes l_returnflag = 'R'): the registry's only "
    "correlated EXISTS + NOT EXISTS pair against the SAME fact table "
    "inside a 4-way join — supplier was defective on a multi-supplier "
    "order where NO other supplier was. Spark plans the EXISTS as a "
    "left-semi and the NOT EXISTS as a left-anti hash join on "
    "l_orderkey, with the dimension joins broadcast; all-integer "
    "aggregate, rank ties broken on s_name so the LIMIT cut is "
    "engine-identical",
)


_tpch(
    "q02_min_cost_supplier",
    """
    SELECT DISTINCT p_partkey, p_name, s_name, n_name,
           floor(s_acctbal * 100 + 0.5) / 100 AS s_acctbal,
           floor(l_extendedprice * 100 + 0.5) / 100 AS best_price
    FROM part
    JOIN lineitem ON l_partkey = p_partkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN nation ON n_nationkey = s_nationkey
    JOIN region ON r_regionkey = n_regionkey
    WHERE r_name = 'EUROPE'
      AND p_size = 11
      AND l_extendedprice = (
          SELECT min(l2.l_extendedprice)
          FROM lineitem l2
          JOIN supplier s2 ON s2.s_suppkey = l2.l_suppkey
          JOIN nation n2 ON n2.n_nationkey = s2.s_nationkey
          JOIN region r2 ON r2.r_regionkey = n2.n_regionkey
          WHERE l2.l_partkey = p_partkey AND r2.r_name = 'EUROPE'
      )
    ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
    LIMIT 100
    """,
    "TPC-H Q2 shape (no partsupp -> lineitem is the part-supplier "
    "bridge, min supply cost becomes min extended price in-region): "
    "the CORRELATED SCALAR-MIN subquery — Catalyst decorrelates it "
    "into a per-part min aggregate joined back on (p_partkey, price); "
    "raw-double equality is engine-safe (same parquet doubles, no "
    "arithmetic), display values rounded, full-key tiebreak on the "
    "LIMIT",
)

_tpch(
    "q11_important_parts",
    """
    SELECT l_partkey, CAST(sum(l_quantity) AS BIGINT) AS total_qty
    FROM lineitem
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN nation ON n_nationkey = s_nationkey
    WHERE n_name IN ('NATION_3', 'NATION_7')
    GROUP BY l_partkey
    HAVING sum(l_quantity) > (
        SELECT CAST(2.0 AS DOUBLE) * sum(l_quantity)
               / count(DISTINCT l_partkey)
        FROM lineitem
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN nation ON n_nationkey = s_nationkey
        WHERE n_name IN ('NATION_3', 'NATION_7')
    )
    ORDER BY total_qty DESC, l_partkey
    """,
    "TPC-H Q11 shape (stock value becomes shipped quantity): HAVING "
    "against a GLOBAL-TOTAL scalar subquery — the classic "
    "aggregate-vs-aggregate decorrelation; the cut is 2x the MEAN "
    "per-part quantity, not TPC-H's fixed global fraction, so "
    "selectivity survives scale-up (a fixed fraction returns 0 rows "
    "at 10x the part count); quantity sums are integer-valued "
    "doubles (exact in any order) and the threshold is one IEEE "
    "multiply+divide, engine-deterministic with no rounding grain",
)

_tpch(
    "q16_supplier_count_by_part",
    """
    SELECT p_brand, p_type, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
    FROM part JOIN lineitem ON l_partkey = p_partkey
    WHERE p_brand <> 'Brand#2'
      AND p_type NOT LIKE 'ECONOMY%'
      AND p_size IN (2, 5, 11, 28, 37)
      AND l_suppkey NOT IN (
          SELECT s_suppkey FROM supplier WHERE s_acctbal < CAST(0 AS DOUBLE)
      )
    GROUP BY p_brand, p_type, p_size
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    LIMIT 100
    """,
    "TPC-H Q16 shape (complaint suppliers become negative-balance "
    "suppliers): NOT IN null-aware anti join + count(DISTINCT) per "
    "(brand, type, size) — the distinct-agg-over-anti-join plan "
    "nothing else in the registry exercises; s_suppkey is "
    "non-nullable so the null-aware anti degenerates to a plain anti "
    "hash join on both engines",
)

_tpch(
    "q20_part_promotion_suppliers",
    """
    SELECT s_suppkey, s_name
    FROM supplier JOIN nation ON s_nationkey = n_nationkey
    WHERE s_suppkey IN (
          SELECT l1.l_suppkey
          FROM lineitem l1
          WHERE l1.l_partkey IN (
                SELECT p_partkey FROM part WHERE p_name LIKE 'red%')
            AND l1.l_shipdate >= DATE '1997-01-01'
            AND l1.l_shipdate < DATE '1998-01-01'
          GROUP BY l1.l_suppkey, l1.l_partkey
          HAVING sum(l1.l_quantity) > (
              SELECT CAST(0.5 AS DOUBLE) * sum(l2.l_quantity)
              FROM lineitem l2
              WHERE l2.l_partkey = l1.l_partkey
                AND l2.l_shipdate >= DATE '1997-01-01'
                AND l2.l_shipdate < DATE '1998-01-01')
      )
    ORDER BY s_suppkey
    """,
    "TPC-H Q20 shape (availqty > half-of-shipped becomes 'supplier "
    "ships the majority of a red part's 1997 volume'): NESTED SEMI "
    "over an aggregate whose HAVING holds a CORRELATED scalar "
    "aggregate on the group key — Catalyst must decorrelate the inner "
    "per-part total into a join under a semi under a semi, the "
    "deepest rewrite in the suite; quantity sums exact, threshold one "
    "IEEE multiply",
)

_tpch(
    "q12_shipping_priority_split",
    """
    SELECT l_linestatus,
           sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS high_line_count,
           sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_linestatus IN ('O', 'F')
      AND l_shipdate > o_orderdate + INTERVAL 30 DAY
      AND l_shipdate >= DATE '1996-01-01'
      AND l_shipdate < DATE '1997-01-01'
    GROUP BY l_linestatus
    ORDER BY l_linestatus
    """,
    "TPC-H Q12 shape (shipmode/commitdate absent -> linestatus as the "
    "mode axis, 'shipped >30 days after ordering' as the lateness "
    "marker): the per-mode URGENT/non-URGENT conditional split with "
    "both CASE branches in one aggregate pass; integer counts exact, "
    "completes the 22-query optimizer surface",
)

from pyspark.sql import functions as F  # noqa: E402

from flytemosaic_spark.probes.registry import probe  # noqa: E402
from flytemosaic_spark.sources.tables import load_table as _T  # noqa: E402

_Q21_SQL = """
    SELECT s_name, count(*) AS numwait
    FROM supplier, lineitem l1, orders, nation
    WHERE s_suppkey = l1.l_suppkey
      AND o_orderkey = l1.l_orderkey
      AND o_orderstatus = 'F'
      AND l1.l_returnflag = 'R'
      AND EXISTS (
          SELECT 1 FROM lineitem l2
          WHERE l2.l_orderkey = l1.l_orderkey
            AND l2.l_suppkey <> l1.l_suppkey
      )
      AND NOT EXISTS (
          SELECT 1 FROM lineitem l3
          WHERE l3.l_orderkey = l1.l_orderkey
            AND l3.l_suppkey <> l1.l_suppkey
            AND l3.l_returnflag = 'R'
      )
      AND s_nationkey = n_nationkey
      AND n_name = 'NATION_9'
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 100
"""


@probe(
    "q21b_waiting_suppliers_agg",
    sql=_Q21_SQL,
    note="q21's SCALE-PATH twin (same oracle, hand-reformulated "
    "plan): the EXISTS/NOT EXISTS pair collapses into ONE aggregation "
    "hierarchy over lineitem — per (order, supplier) count defect "
    "lines, per order count suppliers and defective suppliers; a "
    "supplier 'waits' on an order iff it is defective, the order has "
    ">= 2 suppliers, and it is the ONLY defective one, contributing "
    "its defect-line count. One fact shuffle (the (okey,skey) "
    "groupBy; the per-order rollup reuses its exchange) instead of "
    "Catalyst's three (l1 + semi + anti) — the 10x sweep line drops "
    "2.7x -> near-linear while q21 keeps exercising the optimizer's "
    "own decorrelation",
)
def q21b_waiting_suppliers_agg(spark, sf):
    li = _T(spark, sf, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_returnflag"
    )
    per_os = li.groupBy("l_orderkey", "l_suppkey").agg(
        F.sum((F.col("l_returnflag") == "R").cast("bigint")).alias("n_r")
    )
    per_o = per_os.groupBy("l_orderkey").agg(
        F.count("*").alias("n_supp"),
        F.sum((F.col("n_r") > 0).cast("bigint")).alias("n_defect"),
    )
    sole = (
        per_os.where(F.col("n_r") > 0)
        .join(
            per_o.where((F.col("n_supp") >= 2) & (F.col("n_defect") == 1)),
            "l_orderkey",
        )
        .join(
            _T(spark, sf, "orders")
            .where(F.col("o_orderstatus") == "F")
            .select(F.col("o_orderkey").alias("l_orderkey")),
            "l_orderkey",
        )
    )
    sup = (
        _T(spark, sf, "supplier")
        .join(
            _T(spark, sf, "nation").where(F.col("n_name") == "NATION_9"),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select(F.col("s_suppkey").alias("l_suppkey"), "s_name")
    )
    return (
        sole.join(F.broadcast(sup), "l_suppkey")
        .groupBy("s_name")
        .agg(F.sum("n_r").alias("numwait"))
        .orderBy(F.desc("numwait"), F.asc("s_name"))
        .limit(100)
    )


_Q02_SQL = """
    SELECT DISTINCT p_partkey, p_name, s_name, n_name,
           floor(s_acctbal * 100 + 0.5) / 100 AS s_acctbal,
           floor(l_extendedprice * 100 + 0.5) / 100 AS best_price
    FROM part
    JOIN lineitem ON l_partkey = p_partkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN nation ON n_nationkey = s_nationkey
    JOIN region ON r_regionkey = n_regionkey
    WHERE r_name = 'EUROPE'
      AND p_size = 11
      AND l_extendedprice = (
          SELECT min(l2.l_extendedprice)
          FROM lineitem l2
          JOIN supplier s2 ON s2.s_suppkey = l2.l_suppkey
          JOIN nation n2 ON n2.n_nationkey = s2.s_nationkey
          JOIN region r2 ON r2.r_regionkey = n2.n_regionkey
          WHERE l2.l_partkey = p_partkey AND r2.r_name = 'EUROPE'
      )
    ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
    LIMIT 100
"""


@probe(
    "q02b_min_cost_supplier_agg",
    sql=_Q02_SQL,
    note="q02's SCALE-PATH twin (same oracle, hand-reformulated plan "
    "— the q21b pattern): prune the fact by BOTH selective dimensions "
    "FIRST (broadcast semi of size-11 parts AND in-region suppliers — "
    "the first draft that aggregated mins over ALL parts measured 10x "
    "WORSE than Catalyst at x10, because Catalyst pushes the part "
    "filter below its decorrelated scalar-min; lesson recorded), then "
    "ONE partial-aggregating min per surviving part over the pruned "
    "slice, join back on (partkey, price). The pruned slice is built "
    "once and read twice — both reads are broadcast-join chains off "
    "the same scan, no fact shuffle until the tiny (partkey, price) "
    "refine; full-key tiebreak on the LIMIT",
)
def q02b_min_cost_supplier_agg(spark, sf):
    sup_region = (
        _T(spark, sf, "supplier")
        .join(
            _T(spark, sf, "nation").join(
                _T(spark, sf, "region").where(F.col("r_name") == "EUROPE"),
                F.col("n_regionkey") == F.col("r_regionkey"),
            ),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    part = (
        _T(spark, sf, "part")
        .where(F.col("p_size") == 11)
        .select("p_partkey", "p_name")
    )
    li = _T(spark, sf, "lineitem").select(
        "l_partkey", "l_suppkey", "l_extendedprice"
    )
    # prune the fact by BOTH selective dims before any aggregation:
    # ~(1/50 parts) x (1/5 regions) of lineitem survives
    sliced = li.join(
        F.broadcast(part), F.col("l_partkey") == F.col("p_partkey")
    ).join(F.broadcast(sup_region), F.col("l_suppkey") == F.col("s_suppkey"))
    min_price = sliced.groupBy(
        F.col("l_partkey").alias("_mk")
    ).agg(F.min("l_extendedprice").alias("_minp"))
    r100 = F.floor(F.col("s_acctbal") * 100 + F.lit(0.5)) / 100
    p100 = F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5)) / 100
    return (
        sliced.join(
            min_price,
            (F.col("l_partkey") == F.col("_mk"))
            & (F.col("l_extendedprice") == F.col("_minp")),
        )
        .select(
            "p_partkey",
            "p_name",
            "s_name",
            "n_name",
            r100.alias("s_acctbal"),
            p100.alias("best_price"),
        )
        .distinct()
        .orderBy(
            F.desc("s_acctbal"),
            F.asc("n_name"),
            F.asc("s_name"),
            F.asc("p_partkey"),
        )
        .limit(100)
    )
