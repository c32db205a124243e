"""Iterative graph propagation (PageRank) as repeated join+agg passes.

The reference has no graph operator; connected components (the other
iterative graph op this engine ships) lives in ``operators/dedup.py``.
PageRank is the weighted-propagation complement: instead of a min-label
fixpoint it redistributes mass along edges each round, which is the
shape of influence scoring, spam-rank, and citation weighting over a
web-crawl corpus — a standard curation signal for training data
(e.g. CommonCrawl page quality).

Scale shape: each iteration is one shuffle join (edges ⨝ ranks on src,
both sides hash-partitioned on the same key, so AQE converts later
iterations to local joins when edges are pre-partitioned) plus one
hash aggregation on dst. Rank state is one row per node — node-scale,
not edge-scale — and the edge list is cached once and reused across
iterations. Iteration count is fixed and small (driver-side loop over
a declarative plan; no per-row driver work).

Determinism: every iteration's rank is rounded half-up at 1e-10 so the
result is reproducible bit-for-bit across engines and across summation
orders (float sums are order-dependent; the true cross-engine
discrepancy is ~1e-15, far below the rounding grain). The DuckDB
oracle in probes/curation.py replays the same unrolled iterations.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# rounding grain applied to each iteration's rank vector
_ITER_DIGITS = 10


def _round_at(c, digits: int):
    scale = F.lit(float(10**digits))
    return F.floor(c * scale + F.lit(0.5)) / scale


# node tables (degrees, ranks) up to this many rows are broadcast so
# iteration joins never shuffle the edge list; bigger graphs fall back
# to shuffle joins against an edge list pre-partitioned on src once.
_BROADCAST_NODE_LIMIT = 2_000_000
# the oriented adjacency's total payload is one id per EDGE; up to this
# many edges (~8 bytes each + per-node overhead -> low hundreds of MB
# built, the guide-§3.1 comfortable broadcast band) it is broadcast so
# the forward-star intersection join never shuffles the edge list.
# r11: raised 8M -> 32M after the 10x sweep showed the sort-merge
# fallback spilling on array-carrying sorts (212s) while the broadcast
# path stayed near-linear (3.5s -> 29.7s for 10x the edges); past the
# gate the fallback is now a shuffled-hash join, not sort-merge.
_BROADCAST_EDGE_LIMIT = 32_000_000


def grouped_pairs(
    df: DataFrame,
    group_col: str,
    item_col: str,
    *,
    distinct: bool = True,
    symmetric: bool = False,
) -> DataFrame:
    """Co-occurrence pairs (u, v) of ``item_col`` values sharing a
    ``group_col`` value, emitted from ONE groupBy + positional explode
    instead of the classic two-alias self-join (which shuffles the
    table twice — both aliases — to build the same pairs; r10,
    guide §2.4; x104 at sf0.1: 1.82s -> 1.28s for the edge build).

    ``distinct=True`` collects the sorted SET per group and emits each
    unordered pair u < v once per group (the self-join-on-``<``-plus-
    DISTINCT contract). ``distinct=False`` collects the sorted LIST so
    duplicated items contribute n_x·n_y pairs per group — exactly the
    row-pair multiset a ``<`` self-join emits (the x112/_pairs_basket
    contract; equal items are dropped by the v > u filter).
    ``symmetric=True`` additionally emits each pair in both directions
    from the SAME evaluation via explode(array(...)) — never a
    unionAll of two readings of the aggregate (the x104 corner-counts
    rule).

    Group sizes must be task-bounded (order baskets, document
    shingles): the in-task fan-out is C(k, 2) per group.
    """
    agg = F.collect_set(item_col) if distinct else F.collect_list(item_col)
    grp = (
        df.groupBy(group_col)
        .agg(F.sort_array(agg).alias("ps"))
        .where(F.size("ps") >= 2)
    )
    pairs = grp.select(F.posexplode("ps").alias("_i", "u"), "ps").select(
        "u",
        F.explode(
            F.slice(F.col("ps"), F.col("_i") + 2, F.size("ps"))
        ).alias("v"),
    )
    if not distinct:
        pairs = pairs.where(F.col("v") > F.col("u"))
    if symmetric:
        pairs = pairs.select(
            F.explode(
                F.array(
                    F.struct(F.col("u").alias("u"), F.col("v").alias("v")),
                    F.struct(F.col("v").alias("u"), F.col("u").alias("v")),
                )
            ).alias("_e")
        ).select("_e.u", "_e.v")
    return pairs


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iterations: int = 3,
    damping: float = 0.85,
) -> DataFrame:
    """PageRank over a directed edge list, ``iterations`` rounds from a
    uniform start. Nodes are the distinct sources (a symmetric edge
    list — the co-occurrence construction in probes — makes every node
    both a source and a sink, so no dangling-mass correction is
    needed). Returns (node, pagerank) with pagerank rounded at 1e-10.

    Physical shape: the distinct edge list is materialized to cache
    exactly once (degree counts and the node count both read the
    cache, not the raw edge construction). Rank/degree state is one
    row per node; while the node table fits the broadcast limit each
    iteration is a broadcast hash join on the cached edges plus one
    partial-aggregated shuffle of node-scale partials — the edge list
    itself is never shuffled. Past the limit the edge list is
    hash-partitioned on src at cache time so only the node-scale rank
    table moves per iteration.
    """
    e0 = edges.select(src, dst).distinct()
    deg = e0.groupBy(src).agg(F.count("*").alias("out_deg"))
    # Cache the edge list with out_deg attached — the one edge-scale
    # table every iteration scans. Node count is then a cheap cached
    # read, not a second edge construction.
    e = e0.join(deg, src).cache()
    n_nodes = e.select(src).distinct().count()  # materializes the cache
    small = n_nodes <= _BROADCAST_NODE_LIMIT
    if not small:
        # re-cache hash-partitioned on src so iteration joins shuffle
        # only the node-scale rank table, never the edges
        e.unpersist()
        e = e0.join(deg, src).repartition(F.col(src)).cache()
    base = F.lit((1.0 - damping) / n_nodes)
    # initial ranks read the cached edge table, not the raw edge plan
    ranks = (
        e.select(F.col(src).alias("node"))
        .distinct()
        .withColumn("pr", F.lit(1.0 / n_nodes))
    )
    for _ in range(iterations):
        rank_side = F.broadcast(ranks) if small else ranks
        contribs = (
            e.join(rank_side, F.col(src) == F.col("node"))
            .groupBy(dst)
            .agg(F.sum(F.col("pr") / F.col("out_deg")).alias("_in"))
        )
        ranks = contribs.select(
            F.col(dst).alias("node"),
            _round_at(base + F.lit(damping) * F.col("_in"), _ITER_DIGITS).alias(
                "pr"
            ),
        )
    return ranks.select("node", F.col("pr").alias("pagerank"))


def enumerate_triangles(
    edges: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """Enumerate each triangle of the undirected graph of ``edges``
    exactly once as (a, b1, b2) (self-loops and duplicate/reverse
    edges ignored).

    Scale shape: the classic degree-ordered orientation — every
    undirected edge is directed from its lower-(degree, id) endpoint
    to its higher one, so each node's out-degree is bounded by
    O(sqrt(edges)) regardless of raw degree skew (a celebrity node's
    millions of followers generate no wedges at the celebrity) — then
    compact-forward-star intersection: per oriented edge (u, v) the
    triangles are N+(u) ∩ N+(v), so each triangle surfaces exactly
    once and the wedge set is never materialized or shuffled.
    """
    und, deg = _und_deg(edges, src, dst)
    return _enumerate_oriented(und, deg)


def _und_deg(
    edges: DataFrame, src: str, dst: str
) -> tuple[DataFrame, DataFrame]:
    """Canonical undirected edge list + symmetric degree table,
    BOTH localCheckpointed: every triangle consumer references them
    from several subplans (orientation joins both sides, corner
    counts, the final degree join), and without the checkpoint each
    reference re-executes the full upstream — for the co-occurrence
    probes that upstream is a lineitem self-join + distinct, by far
    the dominant cost (x104 at sf0.1: 27.9 s -> materialize-once)."""
    und = (
        edges.where(F.col(src) != F.col(dst))
        .select(
            F.least(src, dst).alias("u"),
            F.greatest(src, dst).alias("v"),
        )
        .distinct()
        .localCheckpoint()
    )
    deg = (
        und.select(F.col("u").alias("node"))
        .unionAll(und.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count("*").alias("deg"))
        .localCheckpoint()
    )
    return und, deg


def _enumerate_oriented(und: DataFrame, deg: DataFrame) -> DataFrame:
    # the degree table is node-scale: broadcast it under the same gate
    # pagerank uses so the edge list never shuffles for orientation
    if deg.count() <= _BROADCAST_NODE_LIMIT:
        deg = F.broadcast(deg)
    # orientation key: (degree, node id) — a total order over nodes
    with_keys = (
        und.join(deg.withColumnRenamed("node", "u"), "u")
        .withColumnRenamed("deg", "deg_u")
        .join(
            deg.withColumnRenamed("node", "v").withColumnRenamed("deg", "deg_v"),
            "v",
        )
    )
    ku = F.struct(F.col("deg_u").alias("d"), F.col("u").alias("n"))
    kv = F.struct(F.col("deg_v").alias("d"), F.col("v").alias("n"))
    oriented = with_keys.select(
        F.when(ku < kv, F.col("u")).otherwise(F.col("v")).alias("a"),
        F.when(ku < kv, F.col("v")).otherwise(F.col("u")).alias("b"),
    )
    # compact forward star: each triangle {u < v < w} is found exactly
    # once, at its lowest edge (u, v), as w ∈ N+(u) ∩ N+(v) — the
    # intersection never MATERIALIZES the wedge set (the wedge-join
    # formulation shuffled ~|wedges| rows; on the dense co-occurrence
    # graph that was 5x the cost: r6 A/B at sf0.1 6.5s -> 2.2s, at 10x
    # 30.5s -> 5.7s, corner counts identical). Per-node adjacency
    # arrays are bounded by the orientation's O(sqrt E) out-degree.
    # r11 (both paths): the edge (a, b) rows come straight out of an
    # EXPLODE of the checkpointed adjacency with N+(a) already
    # attached — the first of r10's two adjacency joins disappears
    # outright, so only ONE join attaches N+(b). The checkpoint
    # materializes the ~|E|-id adjacency once for its two consumers
    # (explode source + second-join build) instead of caching the
    # edge list. Under the gate the second join is a broadcast hash
    # join (zero edge shuffles; r11 A/B at sf0.1: 1.59s -> 1.39s for
    # the intersection stage); past it, a SHUFFLE_HASH join — the
    # r10 sort-merge fallback SORTED 12M array-carrying rows and
    # spilled catastrophically (10x sweep: the two SMJs alone were
    # 212s; explode + one SMJ 118s; explode + one shuffled-hash 59s
    # for the WHOLE tail, and the build side is the node-keyed
    # adjacency whose per-partition slice shrinks with the
    # production shuffle-partition count).
    adjc = (
        oriented.groupBy("a")
        .agg(F.collect_list("b").alias("nbrs"))
        .localCheckpoint()
    )
    other = adjc.withColumnRenamed("a", "_v")
    if und.count() <= _BROADCAST_EDGE_LIMIT:
        other = F.broadcast(other)
    else:
        other = other.hint("shuffle_hash")
    j = (
        adjc.select(
            "a",
            F.col("nbrs").alias("_na"),
            F.explode("nbrs").alias("b"),
        )
        .join(other, F.col("b") == F.col("_v"))
        .drop("_v")
        .withColumnRenamed("nbrs", "_nb")
    )
    return j.select(
        "a",
        F.col("b").alias("b1"),
        F.explode(F.array_intersect("_na", "_nb")).alias("b2"),
    )


def triangle_count(
    edges: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """Total triangle count — see :func:`enumerate_triangles`."""
    return enumerate_triangles(edges, src, dst).agg(
        F.count("*").alias("n_triangles")
    )


def clustering_coefficient(
    edges: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """Per-node local clustering coefficient:
    ``triangles_at(v) / C(deg(v), 2)`` for nodes with degree >= 2.
    Triangle participation comes from exploding each enumerated
    triangle's three corners (edge-scale aggregate, each triangle
    counted once per corner); degrees from the symmetric adjacency.
    Returns (node, deg, n_tri, cc) with cc left unrounded — callers
    round per their portability contract.
    """
    und, deg = _und_deg(edges, src, dst)
    tris = _enumerate_oriented(und, deg)
    # ONE evaluation of the wedge-closure join, exploded to its three
    # corners — a unionAll of three tris references would re-run the
    # whole enumeration per branch (x104 at sf0.1: 3x the probe's cost)
    corners = (
        tris.select(F.explode(F.array("a", "b1", "b2")).alias("node"))
        .groupBy("node")
        .agg(F.count("*").alias("n_tri"))
    )
    return (
        deg.where(F.col("deg") >= 2)
        .join(corners, "node", "left")
        .select(
            "node",
            "deg",
            F.coalesce("n_tri", F.lit(0)).alias("n_tri"),
            (
                F.coalesce("n_tri", F.lit(0))
                / (F.col("deg") * (F.col("deg") - 1) / 2)
            ).alias("cc"),
        )
    )


def label_propagation(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iterations: int = 2,
    init_mod: int = 10,
) -> DataFrame:
    """Synchronous majority-label propagation (LPA community detection)
    over a directed edge list: each round every node adopts the label
    most frequent among its in-neighbors, ties broken by the smallest
    label; a node with NO labeled in-neighbor keeps its current label
    (so src-only nodes and isolated corners never vanish — the node
    set is src ∪ dst and is preserved every round). Initial label is
    ``node % init_mod`` (a deterministic shard label, so majorities
    exist from round one — the classic own-id start degenerates to
    min-label components, which ``operators/dedup.py`` already
    covers).

    All-integer state, so rounds are bit-reproducible on any engine —
    the DuckDB oracle unrolls the same iterations.

    Scale shape: label state is one (node, lbl) row per node. Each
    round is one join of the cached edge list against the node-scale
    label table (broadcast under ``_BROADCAST_NODE_LIMIT``, else the
    edges are pre-partitioned on src once and only labels shuffle),
    one hash aggregation on (dst, lbl) — partial map-side combine
    bounds it — one struct-MAX argmax aggregation per node (never a
    window, never the degree), and a union with the static
    zero-in-degree label table.

    The edge and sink caches intentionally outlive this call: the
    returned DataFrame is lazy and references them once per iteration
    — the first action materializes each cache and every subsequent
    subtree reuses it (the same plan-canonicalization contract as
    ``pagerank``). Unpersisting here, at plan-build time, would make
    the final action recompute them per round.
    """
    e = edges.select(src, dst).distinct().cache()
    # ONE aggregation derives everything node-scale: the full node set
    # (src ∪ dst — the label table broadcast each round covers both, so
    # counting src alone would undercount on fan-out graphs and ship an
    # over-limit broadcast), each node's has-in-degree flag, and the
    # gate count.
    init_lbl = F.col("node") % F.lit(init_mod)
    nodes = (
        e.select(F.col(src).alias("node"), F.lit(0).alias("_in"))
        .union(e.select(F.col(dst).alias("node"), F.lit(1).alias("_in")))
        .groupBy("node")
        .agg(F.max("_in").alias("_has_in"))
        .cache()
    )
    n_nodes = nodes.count()
    small = n_nodes <= _BROADCAST_NODE_LIMIT
    if not small:
        e.unpersist()
        e = edges.select(src, dst).distinct().repartition(F.col(src)).cache()
    # Retention reduces to a STATIC set: every node is labeled every
    # round (invariant below), so any node with in-degree >= 1 always
    # receives votes — only the zero-in-degree nodes ever keep a label,
    # and theirs never leaves the initial one. Computing that set once
    # keeps the per-round work at vote scale (no node-scale
    # retention join or window competition). The ``nodes`` cache
    # intentionally outlives the call, like ``e``: sinks and the
    # initial labels are both views over it, referenced every round.
    sinks = nodes.where(F.col("_has_in") == 0).select(
        "node", init_lbl.alias("lbl")
    )
    labels = nodes.select("node", init_lbl.alias("lbl"))
    for _ in range(iterations):
        lab_side = F.broadcast(labels) if small else labels
        counts = (
            e.join(lab_side, F.col(src) == F.col("node"))
            .groupBy(F.col(dst).alias("_n"), "lbl")
            .agg(F.count("*").alias("_c"))
        )
        # majority pick = argmax over (count desc, lbl asc): a struct
        # MAX aggregate, not a window — partial map-side combine, no
        # per-partition sort, one fewer sort stage per round (measured
        # neutral at sf0.1 where |labels| <= init_mod bounds the window
        # partitions; the win is the deleted sort at scale). Negating
        # lbl turns the smallest-label tiebreak into a plain max.
        adopted = (
            counts.groupBy("_n")
            .agg(
                F.max(
                    F.struct(F.col("_c"), (-F.col("lbl")).alias("_neg"))
                ).alias("_m")
            )
            .select(
                F.col("_n").alias("node"), (-F.col("_m._neg")).alias("lbl")
            )
        )
        # invariant: adopted covers exactly the in-degree>=1 nodes, so
        # adopted ∪ sinks is the full node set, all labeled
        labels = adopted.union(sinks)
    return labels.select("node", F.col("lbl").alias("community"))


def kcore(
    edges: DataFrame,
    k: int,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 12,
) -> DataFrame:
    """Nodes of the k-core (maximal subgraph where every node has
    degree >= k) with their in-core degree, via distributed peeling.

    Each round drops every node whose current degree is below ``k``
    and the edges touching it; the fixpoint is exactly the k-core
    (peeling order never changes the result — the k-core is the
    unique maximal fixpoint). Per round: one symmetric-degree
    aggregation plus two semi-joins, all key-partitioned shuffles on
    node id; edge state shrinks monotonically, so later rounds are
    cheaper than earlier ones. ``localCheckpoint()`` truncates lineage
    each round.

    Fixpoint detection is an aggregate fingerprint (edge count — the
    edge set only ever shrinks, so a stable count IS the fixpoint;
    no xor needed). Raises after ``max_iter`` non-converged rounds
    rather than silently returning a partial peel — same loud-failure
    contract as ``connected_components``. Real-world graphs peel in a
    handful of rounds (each round removes the whole current shell);
    the adversarial worst case (a path peels one layer per round at
    k=2) is bounded by graph diameter, and the raise routes it to a
    larger ``max_iter``.

    Input edges may be directed/duplicated; they are canonicalized to
    distinct undirected u<v pairs (self-loops dropped — a self-loop
    contributes no peer degree in the k-core definition used here).

    Output: (node, core_deg) for every k-core member, core_deg =
    degree within the core subgraph (>= k by construction).
    """
    e = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .where(F.col("u") != F.col("v"))
        .select(F.least("u", "v").alias("u"), F.greatest("u", "v").alias("v"))
        .distinct()
        .localCheckpoint()
    )

    def _degrees(ed: DataFrame) -> DataFrame:
        return (
            ed.select(F.col("u").alias("node"))
            .unionAll(ed.select(F.col("v").alias("node")))
            .groupBy("node")
            .agg(F.count("*").alias("deg"))
        )

    prev_n = e.count()
    for _ in range(max_iter):
        keep = _degrees(e).where(F.col("deg") >= k).select("node")
        e = (
            e.join(keep.withColumnRenamed("node", "u"), "u", "left_semi")
            .join(keep.withColumnRenamed("node", "v"), "v", "left_semi")
            .select("u", "v")
            .localCheckpoint()
        )
        n = e.count()
        if n == prev_n:
            break
        prev_n = n
    else:
        raise RuntimeError(
            f"kcore: no fixpoint after {max_iter} rounds (graph peels "
            f"deeper than expected); rerun with a larger max_iter"
        )
    return _degrees(e).where(F.col("deg") >= k)


def hits(
    edges: DataFrame,
    iterations: int = 4,
    src: str = "src",
    dst: str = "dst",
    top_n: int = 20,
) -> DataFrame:
    """HITS hubs-and-authorities (Kleinberg 1999) over a directed edge
    list: a(v) = sum of h(u) over in-edges, h(u) = sum of a(v) over
    out-edges, each vector L1-normalized per round.

    Same execution shape as :func:`pagerank`: per round one shuffle
    join of the (deduplicated, cached) edge list against a node-scale
    score table plus one hash aggregation, with the score table
    broadcast ONLY while the distinct node count fits
    ``_BROADCAST_NODE_LIMIT`` (same gate as pagerank — past it the
    joins fall back to shuffle hash joins against the checkpointed
    edges); the L1 norm is a 1-row aggregate
    crossJoined back (constant-size). Per-round scores are rounded
    half-up at 1e-10 (the pagerank recipe), so the mutual-recursion
    fixpoint reproduces across engines — raw per-node sums are rounded
    BEFORE the norm sum, and the norm itself stays unrounded (its
    cross-engine wobble is ~1e-16 relative, far below the post-divide
    grain).

    Returns the top-``top_n`` rows per role:
    (kind in ('hub', 'authority'), node, rank, score) with score
    rounded at 1e-6 — each side an ORDER BY + LIMIT, no windows.
    """
    if iterations < 1:
        raise ValueError("hits() needs iterations >= 1")
    e = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .where(F.col("u").isNotNull() & F.col("v").isNotNull())
        .distinct()
        .localCheckpoint()
    )
    n_nodes = (
        e.select(F.col("u").alias("node"))
        .unionAll(e.select(F.col("v").alias("node")))
        .distinct()
        .count()
    )
    small = n_nodes <= _BROADCAST_NODE_LIMIT
    maybe_b = F.broadcast if small else (lambda d: d)
    auth = e.select(F.col("v").alias("node")).distinct().select(
        "node", F.lit(1.0).alias("score")
    )
    for _ in range(iterations):
        h_raw = (
            e.join(
                maybe_b(auth.withColumnRenamed("node", "v")), "v"
            )
            .groupBy(F.col("u").alias("node"))
            .agg(_round_at(F.sum("score"), _ITER_DIGITS).alias("raw"))
        )
        # localCheckpoint the node-scale raw table: the norm (a 1-row
        # aggregate over it) and the divide both re-read it, and
        # without truncation each round would re-evaluate the prior
        # round's plan twice — 2^rounds recomputation
        h_raw = h_raw.localCheckpoint()
        h_norm = h_raw.groupBy().agg(F.sum("raw").alias("nrm"))
        hub = h_raw.crossJoin(F.broadcast(h_norm)).select(
            "node", _round_at(F.col("raw") / F.col("nrm"), _ITER_DIGITS).alias("score")
        )
        a_raw = (
            e.join(maybe_b(hub.withColumnRenamed("node", "u")), "u")
            .groupBy(F.col("v").alias("node"))
            .agg(_round_at(F.sum("score"), _ITER_DIGITS).alias("raw"))
        )
        a_raw = a_raw.localCheckpoint()
        a_norm = a_raw.groupBy().agg(F.sum("raw").alias("nrm"))
        auth = a_raw.crossJoin(F.broadcast(a_norm)).select(
            "node", _round_at(F.col("raw") / F.col("nrm"), _ITER_DIGITS).alias("score")
        )
    out_h = (
        hub.select(
            F.lit("hub").alias("kind"),
            "node",
            _round_at(F.col("score"), 6).alias("score"),
        )
        .orderBy(F.desc("score"), F.asc("node"))
        .limit(top_n)
    )
    out_a = (
        auth.select(
            F.lit("authority").alias("kind"),
            "node",
            _round_at(F.col("score"), 6).alias("score"),
        )
        .orderBy(F.desc("score"), F.asc("node"))
        .limit(top_n)
    )
    return out_h.unionAll(out_a)


def adamic_adar(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    top_n: int = 20,
    max_center_degree: int | None = None,
) -> DataFrame:
    """Adamic–Adar link prediction over an undirected graph: for every
    non-adjacent pair (u, v), score = sum over common neighbors w of
    1 / ln(deg(w)) — the standard "which links are missing" readout
    for dedup-graph densification and recommendation candidates.

    Distributed shape: canonicalize to distinct undirected edges, build
    the symmetric adjacency once, wedge-join it with itself on the
    center w (the triangle-enumeration shape — Σ deg(w)² wedges), join
    the node-scale degree table, anti-join the existing edge set,
    aggregate per pair. One hub center contributes deg(w)² wedges, so
    a single celebrity node can blow the wedge stage:
    ``max_center_degree`` (when set) drops wedge CENTERS above that
    degree BEFORE the self-join — a lossy but standard cap (the
    dropped centers' 1/ln(deg) terms are the smallest ones; e.g. cap
    10_000 loses terms <= 1/ln(10^4) ≈ 0.109 each). Default ``None``
    keeps the exact score (the oracle-gated form).
    Per-wedge terms are quantized at 1e-9 before the sum and the final
    score at 1e-6, so the top-N cut (score desc, u, v — ORDER BY +
    LIMIT, no window) is engine-identical.

    deg(w) >= 2 for every wedge center by construction (w is adjacent
    to both endpoints), so ln(deg) is never zero.
    """
    e = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .where(F.col("u") != F.col("v"))
        .select(F.least("u", "v").alias("u"), F.greatest("u", "v").alias("v"))
        .distinct()
        .localCheckpoint()
    )
    sym = e.unionAll(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
    deg = sym.groupBy(F.col("u").alias("node")).agg(F.count("*").alias("deg"))
    # wedges u - w - v with u < v, weighted by the center's degree
    adj = sym
    if max_center_degree is not None:
        ok = deg.where(F.col("deg") <= max_center_degree).select(
            F.col("node").alias("v")
        )
        # drop over-cap CENTERS before the quadratic self-join (w is
        # the adjacency row's v side); node-scale semi join, AQE picks
        # broadcast when the survivor set is small
        adj = sym.join(ok, "v", "left_semi")
    left = adj.select(F.col("v").alias("w"), F.col("u").alias("a"))
    right = adj.select(F.col("v").alias("w"), F.col("u").alias("b"))
    wedges = (
        left.join(right, "w")
        .where(F.col("a") < F.col("b"))
        .join(F.broadcast(deg.withColumnRenamed("node", "w")), "w")
        .select(
            F.col("a").alias("u"),
            F.col("b").alias("v"),
            _round_at(F.lit(1.0) / F.log(F.col("deg").cast("double")), 9).alias(
                "_term"
            ),
        )
    )
    scores = (
        wedges.join(e, ["u", "v"], "left_anti")
        .groupBy("u", "v")
        .agg(_round_at(F.sum("_term"), 6).alias("aa_score"))
    )
    return scores.orderBy(
        F.desc("aa_score"), F.asc("u"), F.asc("v")
    ).limit(top_n)
