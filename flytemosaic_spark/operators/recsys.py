"""Item-item collaborative filtering over basket co-occurrence, with
COST-BASED physical plan selection.

Two physical plans compute the identical (u, v, w) pair-count table:

- ``selfjoin`` — per-basket self-join (two shuffles of the raw rows,
  join output = Σ k·(k−1) rows, then a pair groupBy). Wins at small
  pair volume: whole-stage-codegen join, no array materialization.
- ``basket`` — ``collect_list`` per basket (ONE shuffle of the raw
  rows), then a map-side sorted-array pair expansion. Wins once pair
  volume dominates, because the Σ k·(k−1) replication happens after
  the shuffle instead of through it; the 10× key-shifted sweep
  measures it flat (1.1×) where the self-join grows 2.8×.

``plan="auto"`` reads Σ k·(k−1) from the catalog-style stats cache
(``plans/stats.basket_pair_stats`` — computed once per dataset, like
CBO reading ANALYZE output) and picks: self-join at or below
``ORDERED_PAIR_CROSSOVER``, basket-list above. The crossover is the
measured intersection of the two cost curves on this harness
(self-join 2.9 s → 8.1 s at 10×, basket 4.2 s → 4.5 s ⇒ curves cross
near 5× sf0.1 = 5 × 2.4M ordered pairs on 32 cores); at 100 TB any
realistic basket table sits far above it, so the flat plan is what a
cluster run gets.

Both plans keep counts and frequencies integer until one final
division, and the per-item ranking ties break on the rounded score
plus item id so the cutoff is engine-portable (same contract the
x113 DuckDB oracle replays).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from flytemosaic_spark.operators.text import portable_round
from flytemosaic_spark.plans.stats import basket_pair_stats

# Σ k·(k−1) at the measured plan crossover (~5× sf0.1 on local[32]).
ORDERED_PAIR_CROSSOVER = 12_000_000


def _pairs_selfjoin(li: DataFrame, order_col: str, item_col: str) -> DataFrame:
    a, b = li.alias("a"), li.alias("b")
    return (
        a.join(b, order_col)
        .where(F.col(f"a.{item_col}") < F.col(f"b.{item_col}"))
        .groupBy(
            F.col(f"a.{item_col}").alias("u"),
            F.col(f"b.{item_col}").alias("v"),
        )
        .agg(F.count("*").alias("w"))
    )


def _baskets(li: DataFrame, order_col: str, item_col: str) -> DataFrame:
    return li.groupBy(order_col).agg(
        F.array_sort(F.collect_list(item_col)).alias("ps")
    )


def _pairs_basket(baskets: DataFrame) -> DataFrame:
    # sorted basket: the partner slice after position i is always
    # >= ps[i], so the (u, v) pair is (ps[i], p) directly — no
    # least/greatest, and the a.item < b.item semantics of the join
    # replay exactly (equal items filtered by the v > u predicate;
    # multiplicity preserved: every position pair with distinct items
    # contributes one count, = n_x * n_y per basket). Two Generates +
    # one codegen'd Filter — the previous flatten(transform(transform(
    # filter))) HOF tree evaluated interpreted per element (r10,
    # guide §4.1: built-ins only when they actually codegen).
    pos = baskets.select(F.posexplode("ps").alias("_i", "u"), "ps")
    return (
        pos.select(
            "u",
            F.explode(
                F.slice(F.col("ps"), F.col("_i") + 2, F.size("ps"))
            ).alias("v"),
        )
        .where(F.col("v") > F.col("u"))
        .groupBy("u", "v")
        .agg(F.count("*").alias("w"))
    )


def cooccur_topk(
    li: DataFrame,
    order_col: str,
    item_col: str,
    k: int = 3,
    plan: str = "auto",
    stats_key: str | None = None,
) -> DataFrame:
    """Top-``k`` co-occurrence cosine neighbors per item:
    w_uv / sqrt(f_u·f_v) over baskets keyed by ``order_col``.

    ``plan``: ``"auto"`` (cost-based, see module docstring),
    ``"selfjoin"``, or ``"basket"``. Returns
    (item, rnk, co_item, cos_sim) with ``item_col``-derived names
    preserved by the caller's select.
    """
    if plan == "auto":
        st = basket_pair_stats(li, order_col, cache_key=stats_key)
        plan = (
            "selfjoin"
            if st["ordered_pairs"] <= ORDERED_PAIR_CROSSOVER
            else "basket"
        )
    if plan == "selfjoin":
        pw = _pairs_selfjoin(li, order_col, item_col)
        f = li.groupBy(F.col(item_col).alias("item")).agg(
            F.countDistinct(order_col).alias("nf")
        )
    elif plan == "basket":
        baskets = _baskets(li, order_col, item_col)
        pw = _pairs_basket(baskets)
        # item frequency = #baskets containing the item, derived from
        # the SAME basket aggregate: both consumers hang off one
        # shuffle of the raw rows (ReusedExchange), where the
        # countDistinct form would re-scan and re-shuffle all of li
        f = (
            baskets.select(
                F.explode(F.array_distinct("ps")).alias("item")
            )
            .groupBy("item")
            .agg(F.count("*").alias("nf"))
        )
    else:
        raise ValueError(f"unknown plan {plan!r}")
    # both directions from ONE evaluation of the pair aggregate via
    # explode(array(...)), not unionAll of the same expensive subplan
    # twice (the x104 corner-counts rule: union branches re-run the
    # final aggregate even when the exchange below it is reused).
    sym = pw.select(
        F.explode(
            F.array(
                F.struct(F.col("u"), F.col("v"), F.col("w")),
                F.struct(
                    F.col("v").alias("u"),
                    F.col("u").alias("v"),
                    F.col("w"),
                ),
            )
        ).alias("_e")
    ).select("_e.u", "_e.v", "_e.w")
    fu = f.select(F.col("item").alias("u"), F.col("nf").alias("nfu"))
    fv = f.select(F.col("item").alias("v"), F.col("nf").alias("nfv"))
    sc = sym.join(fu, "u").join(fv, "v").select(
        "u",
        "v",
        portable_round(
            F.col("w") / F.sqrt((F.col("nfu") * F.col("nfv")).cast("double")),
            6,
        ).alias("cos_sim"),
    )
    w_rank = Window.partitionBy("u").orderBy(
        F.col("cos_sim").desc(), F.col("v")
    )
    return (
        sc.withColumn("rnk", F.row_number().over(w_rank))
        .where(F.col("rnk") <= k)
        .select(
            F.col("u").alias("item"),
            F.col("rnk").cast("bigint").alias("rnk"),
            F.col("v").alias("co_item"),
            "cos_sim",
        )
    )


def association_rules(
    li: DataFrame,
    order_col: str,
    item_col: str,
    min_pair_support: int = 3,
    top_n: int = 20,
    plan: str = "auto",
    stats_key: str | None = None,
) -> DataFrame:
    """Directed association rules A -> B over item baskets with
    support / confidence / lift, the market-basket (and prompt-template
    co-occurrence) mining readout.

    Basket-distinct semantics: support counts baskets, not line items
    (the same item twice in one order contributes once). Pair counting
    reuses :func:`cooccur_topk`'s two plans and cost-based switch: the
    distinct (basket, item) self-join below the measured ordered-pair
    crossover, the basket-list expansion (collect sorted distinct
    items, map-side pair emit — linear in Σk², never joins the fact
    table to itself) above it. Item and basket totals are
    partial-aggregating shuffles; the rule table is pair-scale and the
    final top-N is an ORDER BY + LIMIT (TakeOrderedAndProject — no
    global sort materialized).

    lift = P(B|A) / P(B) = n_ab * N / (n_a * n_b), exact integer
    cross-multiplication until the final rounded divisions; ranking
    uses the rounded (lift, confidence) with an (antecedent,
    consequent) tiebreak so the cut is engine-identical.

    r10: ``auto`` now always takes the basket plan. Under RULE
    (basket-DISTINCT) semantics the baskets are collect_set'd — one
    shuffle, multiplicity-1 arrays — and with the Generate-based pair
    expansion the basket plan measured faster at BOTH sf0.01
    (0.99s vs 1.25s) and sf0.1 (1.65s vs 1.85s) as well as flat at
    10x, so there is no crossover left to switch on (the distinct
    pass the selfjoin plan needs is exactly the shuffle the basket
    plan already pays). ``plan="selfjoin"`` remains for A/B.
    """
    if plan == "auto":
        plan = "basket"
    if plan == "selfjoin":
        b = li.select(
            F.col(order_col).alias("bk"), F.col(item_col).alias("it")
        ).distinct()
        x, y = b.alias("x"), b.alias("y")
        pairs = (
            x.join(y, F.col("x.bk") == F.col("y.bk"))
            .where(F.col("x.it") < F.col("y.it"))
            .groupBy(F.col("x.it").alias("u"), F.col("y.it").alias("v"))
            .agg(F.count("*").alias("n_ab"))
        )
        n_baskets = b.groupBy().agg(F.countDistinct("bk").alias("n_baskets"))
        item_n = b.groupBy(F.col("it").alias("item")).agg(
            F.count("*").alias("n_item")
        )
    elif plan == "basket":
        # collect_set dedups inside the ONE basket shuffle (no separate
        # distinct pass); the sorted distinct list has multiplicity 1,
        # so _pairs_basket emits each u<v pair exactly once per
        # containing basket, and every total below hangs off the same
        # exchange (ReusedExchange), never re-scanning the fact table
        baskets = li.groupBy(F.col(order_col).alias("bk")).agg(
            F.array_sort(F.collect_set(F.col(item_col))).alias("ps")
        )
        pairs = _pairs_basket(baskets).withColumnRenamed("w", "n_ab")
        n_baskets = baskets.groupBy().agg(F.count("*").alias("n_baskets"))
        item_n = (
            baskets.select(F.explode("ps").alias("item"))
            .groupBy("item")
            .agg(F.count("*").alias("n_item"))
        )
    else:
        raise ValueError(f"unknown plan {plan!r}")
    und = pairs.where(F.col("n_ab") >= min_pair_support)
    directed = und.select(
        F.col("u").alias("antecedent"), F.col("v").alias("consequent"), "n_ab"
    ).unionAll(
        und.select(
            F.col("v").alias("antecedent"), F.col("u").alias("consequent"), "n_ab"
        )
    )
    na = item_n.select(F.col("item").alias("antecedent"), F.col("n_item").alias("n_a"))
    nc = item_n.select(F.col("item").alias("consequent"), F.col("n_item").alias("n_b"))
    rules = (
        directed.join(na, "antecedent")
        .join(nc, "consequent")
        .crossJoin(F.broadcast(n_baskets))
        .select(
            "antecedent",
            "consequent",
            F.col("n_ab").cast("bigint").alias("n_ab"),
            portable_round(F.col("n_ab") / F.col("n_baskets"), 6).alias("support"),
            portable_round(F.col("n_ab") / F.col("n_a"), 6).alias("confidence"),
            portable_round(
                (F.col("n_ab") * F.col("n_baskets"))
                / (F.col("n_a") * F.col("n_b")).cast("double"),
                6,
            ).alias("lift"),
        )
    )
    return rules.orderBy(
        F.desc("lift"), F.desc("confidence"), F.asc("antecedent"), F.asc("consequent")
    ).limit(top_n)


def _apriori_reduce(
    baskets: DataFrame, min_support: int, max_basket: int
) -> DataFrame:
    """A-priori candidate prune before triple emission: every triple
    with support >= s has all three of its pairs with support >= s, so
    a basket item that appears in NO frequent pair cannot be part of
    any frequent triple — drop it BEFORE the k³ expansion. Pair
    supports cost only a C(k, 2) expansion (the x113 basket-plan
    shape). Lossless: a qualifying triple's items each sit in >= 2
    frequent pairs inside EVERY basket containing it, so all of its
    occurrences survive and the caller's final HAVING on exact triple
    support culls any over-retained candidates."""
    # C(k, 2) emission as two Generates (the codegen'd x192/x113
    # shape — the previous flatten(transform(transform)) HOF tree
    # evaluated interpreted per element, r10 guide §4.1)
    pos = baskets.select(
        "bk", F.posexplode("ps").alias("_i", "a"), "ps"
    )
    expanded = pos.select(
        "bk",
        "a",
        F.explode(
            F.slice(F.col("ps"), F.col("_i") + 2, F.size("ps"))
        ).alias("b"),
    )
    # bp has two consumers (the pair-support aggregate and the
    # semi-join back) — cache so the C(k, 2) expansion runs once
    bp = expanded.cache()
    freq = (
        bp.groupBy("a", "b")
        .agg(F.count("*").alias("w"))
        .where(F.col("w") >= min_support)
        .select("a", "b")
    )
    return (
        bp.join(freq, ["a", "b"], "left_semi")
        .select("bk", F.explode(F.array("a", "b")).alias("it"))
        .distinct()
        .groupBy("bk")
        .agg(F.array_sort(F.collect_list("it")).alias("ps"))
        .where(F.size("ps").between(3, max_basket))
    )


TRIPLES_PER_TASK = 400_000


def frequent_triples(
    li: DataFrame,
    order_col: str,
    item_col: str,
    min_support: int = 2,
    top_n: int = 20,
    max_basket: int = 64,
    stats_key: str | None = None,
) -> DataFrame:
    """Frequent 3-itemsets over item baskets — one level past the
    pairwise co-occurrence/rule surface (x113/x181): the bundle-
    detection readout.

    Plan: the basket-list expansion only (a 3-way fact self-join is
    never the right shape) — collect each basket's sorted distinct
    items in ONE shuffle, emit its C(k, 3) ordered triples map-side,
    count with a partial-aggregating shuffle. Baskets longer than
    ``max_basket`` are dropped BEFORE expansion (k³ growth; a single
    degenerate mega-basket would otherwise dominate the stage — the
    cap is the standard itemset-mining guard and is reported by the
    caller via basket stats, not silently absorbed). With
    ``min_support >= 2`` the classic a-priori pair prune
    (:func:`_apriori_reduce`) drops items in no frequent pair before
    emission — on skewed real corpora that cuts the k³ term by orders
    of magnitude; at ``min_support = 1`` every item survives by
    definition, so the prune is skipped and emission is data-linear
    by problem statement (r5 measured the alternatives: an
    Arrow/numpy emission kernel loses to JVM-side emission once the
    C(k, 3) rows must cross Python->JVM for the count — 18-21 s vs
    10.3 s warm at 30x — and a two-phase smallest-N fill plan pays
    more in extra basket passes than the saved aggregation).

    The aggregation's parallelism is COST-BASED when ``stats_key`` is
    given: Σ C(k, 3) from :func:`plans.stats.basket_pair_stats` sizes
    an explicit keyed repartition so each agg task holds
    ~``TRIPLES_PER_TASK`` (400k) hash entries — with the session's fixed 32
    shuffle partitions, 48M mostly-distinct triples at 30x put 1.5M
    entries in every partial map and SPILL (14.9 s warm); the sized
    exchange removes the spill (8.2 s) at the cost of map-side
    combine that unique-heavy triple streams never benefit from
    anyway.

    Returns the top-``top_n`` triples by (support desc, items) as
    (item_a, item_b, item_c, n_baskets) — ORDER BY + LIMIT, exact
    integer counts, engine-identical cut.
    """
    baskets = (
        li.groupBy(F.col(order_col).alias("bk"))
        .agg(F.array_sort(F.collect_set(F.col(item_col))).alias("ps"))
        .where(F.size("ps").between(3, max_basket))
    )
    if min_support >= 2:
        baskets = _apriori_reduce(baskets, min_support, max_basket)
    # C(k,3) emission as a chain of three Generates over the sorted
    # distinct basket (strictly increasing, so position order IS item
    # order): posexplode picks a, the post-a slice is materialized
    # ONCE as its own projected column (the r9 HOF rule — a bound
    # attribute read per element, not a re-evaluated subtree), then
    # posexplode picks b and a final explode of the post-b slice
    # yields c. All codegen'd; the previous nested
    # flatten(transform(transform(transform))) tree evaluated
    # interpreted per innermost element (r10, guide §4.1).
    p1 = baskets.select(
        F.posexplode("ps").alias("_i", "item_a"), "ps"
    ).select(
        "item_a",
        F.slice(F.col("ps"), F.col("_i") + 2, F.size("ps")).alias("_rest"),
    )
    p2 = p1.where(F.size("_rest") >= 2).select(
        "item_a", F.posexplode("_rest").alias("_j", "item_b"), "_rest"
    )
    emitted = p2.select(
        "item_a",
        "item_b",
        F.explode(
            F.slice(F.col("_rest"), F.col("_j") + 2, F.size("_rest"))
        ).alias("item_c"),
    )
    if stats_key is not None:
        st = basket_pair_stats(li, order_col, cache_key=stats_key)
        want = st["triples"] // TRIPLES_PER_TASK + 1
        cur = li.sparkSession.sparkContext.defaultParallelism
        if want > cur:
            emitted = emitted.repartition(
                min(1024, want), "item_a", "item_b", "item_c"
            )
    return (
        emitted.groupBy("item_a", "item_b", "item_c")
        .agg(F.count("*").alias("n_baskets"))
        .where(F.col("n_baskets") >= min_support)
        .orderBy(
            F.desc("n_baskets"),
            F.asc("item_a"),
            F.asc("item_b"),
            F.asc("item_c"),
        )
        .limit(top_n)
    )


def bias_baseline(
    r: DataFrame,
    u_col: str,
    i_col: str,
    cents_col: str,
    lam: int = 10,
) -> DataFrame:
    """Bias-baseline recommender (Koren 2009, the Netflix-Prize
    baseline predictors): b̂_ui = μ + b_u + b_i with regularized
    residual-mean biases

        b_i = Σ_{r∈R(i)} (r − μ) / (λ + |R(i)|)
        b_u = Σ_{r∈R(u)} (r − μ − b_i) / (λ + |R(u)|)

    — the mandatory strawman any factorization model must beat, and
    itself a strong cold-start predictor. Reports RMSE of the
    baseline vs the global-mean-only model.

    Determinism contract: ratings arrive as EXACT integer units
    (``cents_col``), so μ is fixed arithmetic over two exact sums;
    b_i is fixed arithmetic per item (a single expression over exact
    aggregates, quantized at 1e-9); the user residual sum — the one
    genuinely order-sensitive float aggregate — is quantized to 1e-9
    integer units per row and summed in BIGINT, and the squared
    errors likewise. No float-summation order sensitivity anywhere.

    Shapes: one item-scale rollup (broadcast back), one user-scale
    rollup, 1-row global moments broadcast; the fact table shuffles
    twice (by item, by user) — both partial-aggregating.

    Returns one row: (n_ratings, rmse_baseline, rmse_global).
    """
    from flytemosaic_spark.operators.text import portable_round

    rr = r.select(
        F.col(u_col).alias("_u"),
        F.col(i_col).alias("_i"),
        F.col(cents_col).cast("bigint").alias("_c"),
    )
    g = rr.groupBy().agg(F.sum("_c").alias("_sc"), F.count("*").alias("_n"))
    mu = F.col("_sc") / F.col("_n").cast("double")
    bi = (
        rr.crossJoin(F.broadcast(g))
        .groupBy("_i", "_sc", "_n")
        .agg(F.sum("_c").alias("_si"), F.count("*").alias("_ci"))
        .select(
            "_i",
            portable_round(
                (F.col("_si") - F.col("_ci") * mu)
                / (F.lit(lam) + F.col("_ci"))
                / F.lit(100.0),
                9,
            ).alias("_bi"),
        )
    )
    resid_u = F.floor(
        (
            F.col("_c") / F.lit(100.0)
            - mu / F.lit(100.0)
            - F.col("_bi")
        )
        * F.lit(1e9)
        + F.lit(0.5)
    ).cast("bigint")
    ru = (
        rr.join(F.broadcast(bi), "_i")
        .crossJoin(F.broadcast(g))
        .select("_u", "_i", "_c", "_sc", "_n", resid_u.alias("_ru"))
    )
    bu = (
        ru.groupBy("_u")
        .agg(
            (
                F.floor(
                    F.sum("_ru") / (F.lit(float(lam)) + F.count("*"))
                    + F.lit(0.5)
                ).cast("bigint")
                / F.lit(1e9)
            ).alias("_bu")
        )
    )
    err = (
        F.col("_c") / F.lit(100.0)
        - mu / F.lit(100.0)
        - F.col("_bu")
        - F.col("_bi")
    )
    gerr = F.col("_c") / F.lit(100.0) - mu / F.lit(100.0)
    sq = (
        rr.join(F.broadcast(bi), "_i")
        .join(bu, "_u")
        .crossJoin(F.broadcast(g))
        .select(
            "_n",
            F.floor(err * err * F.lit(1e9) + F.lit(0.5))
            .cast("bigint")
            .alias("_e2"),
            F.floor(gerr * gerr * F.lit(1e9) + F.lit(0.5))
            .cast("bigint")
            .alias("_g2"),
        )
    )
    return sq.groupBy("_n").agg(
        F.col("_n").cast("bigint").alias("n_ratings"),
        portable_round(
            F.sqrt(F.sum("_e2") / F.lit(1e9) / F.col("_n").cast("double")), 6
        ).alias("rmse_baseline"),
        portable_round(
            F.sqrt(F.sum("_g2") / F.lit(1e9) / F.col("_n").cast("double")), 6
        ).alias("rmse_global"),
    ).select("n_ratings", "rmse_baseline", "rmse_global")


def coldstart_coverage(
    df: DataFrame,
    user_col,
    item_col,
    train_hex: str = "cccd",
    seed_tag: str = "cs",
) -> DataFrame:
    """Cold-start coverage audit for a recommender split: with users
    md5-split into train/test (deterministic, the x19 recipe), what
    share of TEST interactions — and of distinct test items — involve
    an item never seen in train? High cold rates mean offline metrics
    will overstate production quality and the serving path needs a
    content-based fallback.

    One (user-hash) filter pass each side, distinct item tables
    (item-cardinality scale), a left-anti-style existence join on the
    item key. All counts exact integers; two fixed divisions.

    Returns one row: (n_test_rows, n_cold_rows, cold_row_rate,
    n_test_items, n_cold_items, cold_item_rate).
    """
    from flytemosaic_spark.operators.sampling import hash_bucket
    from flytemosaic_spark.operators.text import portable_round

    user = F.col(user_col) if isinstance(user_col, str) else user_col
    item = F.col(item_col) if isinstance(item_col, str) else item_col
    base = df.select(
        hash_bucket(
            F.concat(F.lit(seed_tag + ":"), user.cast("string"))
        ).alias("_b"),
        item.alias("_i"),
    )
    train_items = (
        base.where(F.col("_b") < train_hex).select("_i").distinct()
        .withColumn("_seen", F.lit(1))
    )
    test = base.where(F.col("_b") >= train_hex)
    joined = test.join(F.broadcast(train_items), "_i", "left")
    rows = joined.groupBy().agg(
        F.count("*").alias("n_test_rows"),
        F.sum(F.col("_seen").isNull().cast("bigint")).alias("n_cold_rows"),
    )
    items = (
        joined.select("_i", "_seen")
        .distinct()
        .groupBy()
        .agg(
            F.count("*").alias("n_test_items"),
            F.sum(F.col("_seen").isNull().cast("bigint")).alias(
                "n_cold_items"
            ),
        )
    )
    return (
        rows.crossJoin(F.broadcast(items))
        .select(
            "n_test_rows",
            "n_cold_rows",
            portable_round(
                F.col("n_cold_rows") / F.col("n_test_rows").cast("double"), 6
            ).alias("cold_row_rate"),
            "n_test_items",
            "n_cold_items",
            portable_round(
                F.col("n_cold_items") / F.col("n_test_items").cast("double"),
                6,
            ).alias("cold_item_rate"),
        )
    )
