"""Deduplication operators for training-data pipelines.

Four families, each chosen for a different scale/recall trade-off:

- **exact**: content-hash groupBy — one shuffle on a 16-byte key,
  the cheapest possible dedup at 100 TB.
- **n-gram Jaccard**: exact pairwise similarity via shingle
  inverted-index self-join — quadratic only within shingle buckets,
  oracle-checkable in SQL.
- **MinHash + LSH**: sub-quadratic near-dup at scale; signatures via
  ``xxhash64(shingle, seed)`` permutations, banded into buckets so
  candidate pairs only form inside a bucket (the standard
  shingle→minhash→band→bucket-join pipeline).
- **SimHash**: 64-bit weighted-bit sketch, hamming-ball candidate
  pairs via band equality.

All are pure DataFrame/Catalyst pipelines (hash functions are
JVM-side); no Python UDFs anywhere.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from flytemosaic_spark.operators.text import word_shingles

# near-dup pair graphs at or under this many (directed) edges solve
# with one driver-side union-find instead of 2 Spark jobs per
# propagation round; ~32 bytes/edge collected -> tens of MB at the cap
_DRIVER_CC_EDGE_LIMIT = 1_000_000


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact dedup groups: one row per distinct content hash with the
    surviving (min) id and the duplicate count."""
    return (
        df.select(F.md5(F.col(text_col)).alias("content_hash"), F.col(id_col))
        .groupBy("content_hash")
        .agg(F.min(id_col).alias("keeper"), F.count("*").alias("n_copies"))
    )


def _shingled(df: DataFrame, text_col: str, id_col: str, n: int) -> DataFrame:
    """(id, shingle) exploded pairs with per-doc distinct shingle count.

    Repartitions first: document tables are narrow, so a single parquet
    file would otherwise pin the whole shingle fan-out (and the
    self-join probe work downstream) onto one task.
    """
    from flytemosaic_spark.operators.text import shingles_from_tokens, tokens

    # InferFiltersFromGenerate inlines the full generator expression into
    # a size()>0 filter below the explode, re-running the shingle
    # computation per row — exclude it (runtime-settable, safe: it is a
    # skip-empty-arrays heuristic, not a correctness rule).
    df.sparkSession.conf.set(
        "spark.sql.optimizer.excludedRules",
        "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate",
    )
    parallelism = df.sparkSession.sparkContext.defaultParallelism
    base = (
        df.repartition(parallelism, F.col(id_col))
        .select(F.col(id_col).alias("id"), tokens(F.col(text_col)).alias("toks"))
        .select("id", shingles_from_tokens(F.col("toks"), n).alias("shingles"))
        .select(
            "id", F.size("shingles").alias("n_sh"), F.explode("shingles").alias("shingle")
        )
    )
    return base


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 5,
    threshold: float = 0.5,
) -> DataFrame:
    """Exact n-gram Jaccard similar pairs (a < b, jaccard ≥ threshold).

    Inverted-index formulation: explode distinct shingles, self-join
    on the shingle (so only docs sharing ≥1 shingle ever pair),
    count shared shingles, then |A∪B| = |A|+|B|−|A∩B|. The shuffle
    key is the shingle — high-frequency shingles are the skew risk,
    which AQE skew-join splitting handles; for extreme corpora a
    document-frequency cap on shingles bounds it.
    """
    a = _shingled(df, text_col, id_col, n)
    b = (
        a.withColumnRenamed("id", "id_b")
        .withColumnRenamed("n_sh", "n_sh_b")
    )
    inter = (
        a.join(b, "shingle")
        .where(F.col("id") < F.col("id_b"))
        .groupBy(
            F.col("id").alias("id_a"),
            F.col("id_b"),
            F.col("n_sh").alias("n_a"),
            F.col("n_sh_b").alias("n_b"),
        )
        .agg(F.count("*").alias("n_inter"))
    )
    jacc = F.col("n_inter") / (F.col("n_a") + F.col("n_b") - F.col("n_inter"))
    return (
        inter.select("id_a", "id_b", F.round(jacc, 4).alias("jaccard"))
        .where(F.col("jaccard") >= threshold)
    )


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 5,
    num_hashes: int = 64,
) -> DataFrame:
    """Per-doc MinHash signature: for permutation ``i``, the min over
    shingles of ``xxhash64(shingle, seed=i)``. One explode + one
    groupBy; the signature is an array column of length num_hashes."""
    sh = _shingled(df, text_col, id_col, n)
    mins = [
        F.min(F.xxhash64(F.col("shingle"), F.lit(i))).alias(f"h{i}")
        for i in range(num_hashes)
    ]
    sig = sh.groupBy("id").agg(*mins)
    return sig.select("id", F.array(*[f"h{i}" for i in range(num_hashes)]).alias("signature"))


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 5,
    num_hashes: int = 64,
    bands: int = 16,
) -> DataFrame:
    """Candidate near-dup pairs via banded MinHash LSH, verified with
    the estimated Jaccard (fraction of agreeing minhashes).

    rows-per-band = num_hashes/bands; two docs collide if any band of
    their signatures is identical. Bucket key = hash(band_id, band
    slice) so the join is a plain equi-join on a 64-bit key.
    """
    rows_per_band = num_hashes // bands
    sig = minhash_signatures(df, text_col, id_col, n, num_hashes)
    banded = sig.select(
        "id",
        "signature",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.struct(
                    b.alias("band"),
                    F.xxhash64(
                        b, F.slice("signature", b * rows_per_band + 1, rows_per_band)
                    ).alias("bucket"),
                ),
            )
        ).alias("bb"),
    ).select("id", "signature", "bb.band", "bb.bucket")
    other = banded.select(
        F.col("id").alias("id_b"),
        F.col("signature").alias("signature_b"),
        "band",
        "bucket",
    )
    cand = (
        banded.join(other, ["band", "bucket"])
        .where(F.col("id") < F.col("id_b"))
        .select("id", "id_b", "signature", "signature_b")
        .dropDuplicates(["id", "id_b"])
    )
    agree = F.size(
        F.filter(
            F.zip_with("signature", "signature_b", lambda x, y: x == y),
            lambda eq: eq,
        )
    )
    return cand.select(
        F.col("id").alias("id_a"),
        "id_b",
        F.round(agree / F.lit(float(num_hashes)), 4).alias("est_jaccard"),
    )


def minhash_signatures_md5(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 5,
    num_hashes: int = 16,
) -> DataFrame:
    """Engine-portable MinHash: permutation ``i`` hashes a shingle as
    ``md5(i || ':' || shingle)`` and the signature element is the
    lexicographic min of those hex strings (= numeric min of the
    128-bit value, since both engines emit fixed-width lowercase hex).

    The xxhash64 family (:func:`minhash_signatures`) is the fast path
    — one 64-bit hash vs an md5 per permutation — but xxhash64 exists
    only inside Spark. This family trades ~3× hash cost for
    cross-engine reproducibility: signatures (and the LSH pairs built
    from them) can be recomputed bit-for-bit by DuckDB/Trino/anything,
    which is what lets the driver's oracle check the whole pipeline
    rather than a rows-only count.
    """
    sh = _shingled(df, text_col, id_col, n)
    mins = [
        F.min(F.md5(F.concat(F.lit(f"{i}:"), F.col("shingle")))).alias(f"h{i}")
        for i in range(num_hashes)
    ]
    sig = sh.groupBy("id").agg(*mins)
    return sig.select(
        "id", F.array(*[f"h{i}" for i in range(num_hashes)]).alias("signature")
    )


def minhash_lsh_pairs_md5(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 5,
    num_hashes: int = 16,
    bands: int = 4,
) -> DataFrame:
    """Banded LSH over the portable md5 MinHash family: bucket key =
    ``md5(band slice joined with '|')``, candidates pair inside a
    bucket, est_jaccard = fraction of agreeing signature positions.
    Same plan shape as :func:`minhash_lsh_pairs` (explode → equi-join
    on (band, bucket) → distinct pairs); only the hash family differs,
    so this variant is the one the DuckDB oracle replays end-to-end.
    """
    rows_per_band = num_hashes // bands
    sig = minhash_signatures_md5(df, text_col, id_col, n, num_hashes)
    banded = sig.select(
        "id",
        "signature",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.struct(
                    b.alias("band"),
                    F.md5(
                        F.concat_ws(
                            "|", F.slice("signature", b * rows_per_band + 1, rows_per_band)
                        )
                    ).alias("bucket"),
                ),
            )
        ).alias("bb"),
    ).select("id", "signature", "bb.band", "bb.bucket")
    other = banded.select(
        F.col("id").alias("id_b"),
        F.col("signature").alias("signature_b"),
        "band",
        "bucket",
    )
    cand = (
        banded.join(other, ["band", "bucket"])
        .where(F.col("id") < F.col("id_b"))
        .select("id", "id_b", "signature", "signature_b")
        .dropDuplicates(["id", "id_b"])
    )
    agree = F.size(
        F.filter(
            F.zip_with("signature", "signature_b", lambda x, y: x == y),
            lambda eq: eq,
        )
    )
    return cand.select(
        F.col("id").alias("id_a"),
        "id_b",
        F.round(agree / F.lit(float(num_hashes)), 4).alias("est_jaccard"),
    )


def simhash(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """64-bit SimHash per document from whitespace tokens.

    Per token: xxhash64 → 64 bits contribute ±1 to each bit-position
    counter; the sketch sets bit i where the counter is positive.
    Implemented as an explode + one groupBy with an array-summing
    aggregate — all JVM-side."""
    toks = df.select(
        F.col(id_col).alias("id"),
        F.explode(F.split(F.trim(F.col(text_col)), r"\s+")).alias("tok"),
    ).withColumn("h", F.xxhash64("tok"))
    # 64 algebraic sums (one per bit) — partial-aggregatable, so the
    # shuffle carries 64 longs per doc and map-side combine works; a
    # collect_list formulation would ship every token's bit array
    bit_sums = [
        F.sum(
            F.when(F.shiftright("h", i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"c{i}")
        for i in range(64)
    ]
    summed = toks.groupBy("id").agg(*bit_sums)
    sketch = F.lit(0).cast("bigint")
    for i in range(64):
        sketch = sketch.bitwiseOR(
            F.when(
                F.col(f"c{i}") > 0, F.shiftleft(F.lit(1).cast("bigint"), i)
            ).otherwise(F.lit(0).cast("bigint"))
        )
    return summed.select("id", sketch.alias("simhash"))


def simhash_md5(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Engine-portable 64-bit SimHash, emitted as a 16-char hex string.

    Token bits come from md5(token) hex digits (bit ``i`` is nibble
    ``i//4``'s bit ``i%4``), per-bit ±1 counters aggregate exactly as
    in :func:`simhash`, and the sketch re-assembles nibble-by-nibble
    into hex — strings sidestep the signed-bigint overflow at bit 63
    that a cross-engine integer formulation would hit. Same plan
    shape as :func:`simhash` (explode → 64 algebraic sums, map-side
    combine, one shuffled row of 64 longs per doc); only the hash
    family differs, so the DuckDB oracle replays it bit-for-bit.
    """
    hexd = "0123456789abcdef"
    toks = df.select(
        F.col(id_col).alias("id"),
        F.explode(F.split(F.trim(F.col(text_col)), r"\s+")).alias("tok"),
    ).withColumn("h", F.md5("tok"))
    # one int column per hex digit of md5(tok), then 64 ±1 bit sums
    digits = toks.select(
        "id",
        *[
            (F.instr(F.lit(hexd), F.substring("h", j + 1, 1)) - 1).alias(f"d{j}")
            for j in range(16)
        ],
    )
    bit_sums = [
        F.sum(
            F.when(F.shiftright(F.col(f"d{i // 4}"), i % 4).bitwiseAND(F.lit(1)) == 1, 1)
            .otherwise(-1)
        ).alias(f"c{i}")
        for i in range(64)
    ]
    summed = digits.groupBy("id").agg(*bit_sums)
    nibbles = [
        sum(
            F.when(F.col(f"c{4 * j + b}") > 0, F.lit(1 << b)).otherwise(F.lit(0))
            for b in range(4)
        ).alias(f"n{j}")
        for j in range(16)
    ]
    withn = summed.select("id", *nibbles)
    # Column.substr (not F.substring): the start position is a Column
    sketch = F.concat(
        *[F.lit(hexd).substr(F.col(f"n{j}") + 1, F.lit(1)) for j in range(16)]
    )
    return withn.select("id", sketch.alias("simhash_hex"))


def connected_components(
    edges: DataFrame, src: str = "src", dst: str = "dst", max_iter: int = 50
) -> DataFrame:
    """(node, lbl) labeling of an undirected graph: ``lbl`` = min node
    id in the node's connected component — the canonical-keeper
    selection stage that turns near-dup *pairs* into dedup *clusters*.

    Iterative min-label propagation: each round is one equi-join
    (neighbor labels) + one min-aggregate, converging in O(component
    diameter) rounds — the right regime for dedup graphs, whose
    clusters are small and dense. ``localCheckpoint()`` truncates
    lineage every round so the plan does not grow with iterations, and
    convergence is detected with an aggregate (a count), never by
    collecting labels to the driver. For adversarial long-chain graphs
    swap the propagation step for large-star/small-star (same join +
    min-agg primitives, O(log n) rounds).

    r10 fast path: a near-dup pair graph is usually TINY relative to
    the corpus (edges exist only between near-duplicates). When the
    materialized edge count is at or under ``_DRIVER_CC_EDGE_LIMIT``
    the components are solved with one driver-side union-find over the
    collected pairs (the bounded-metadata recipe — same gate-then-
    collect contract as the broadcast node tables in graph.py; Delta
    replays its whole log driver-side on the same argument) instead of
    2 jobs per propagation round. Identical (node, lbl = min id in
    component) output — min over strings is lexicographic in both
    paths. Past the gate, the iterative loop below is unchanged.
    """
    sym = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    sym = sym.union(sym.select(F.col("b").alias("a"), F.col("a").alias("b")))
    sym = sym.localCheckpoint()
    if sym.count() <= _DRIVER_CC_EDGE_LIMIT:
        parent: dict = {}

        def find(x):
            r = x
            while parent[r] != r:
                r = parent[r]
            while parent[x] != r:
                parent[x], x = r, parent[x]
            return r

        for row in sym.collect():
            a, b = row[0], row[1]
            parent.setdefault(a, a)
            parent.setdefault(b, b)
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[ra] = rb
        roots: dict = {}
        for n in parent:
            r = find(n)
            m = roots.get(r)
            roots[r] = n if m is None or n < m else m
        from pyspark.sql.types import StructField, StructType

        dt = sym.schema[0].dataType
        schema = StructType(
            [StructField("node", dt), StructField("lbl", dt)]
        )
        return edges.sparkSession.createDataFrame(
            [(n, roots[find(n)]) for n in parent], schema
        )
    # seed with one propagation folded in: lbl = min(self, neighbors)
    labels = (
        sym.groupBy("a")
        .agg(F.min("b").alias("_mn"))
        .select(F.col("a").alias("node"), F.least("a", "_mn").alias("lbl"))
        .localCheckpoint()
    )
    for _ in range(max_iter):
        prop = sym.join(labels.withColumnRenamed("node", "a"), "a").select(
            F.col("b").alias("node"), "lbl", F.lit(0).alias("_old")
        )
        # convergence detection FUSED into the propagation aggregate
        # (r10): the old label rides along as min(lbl where _old), so
        # "did any node's label drop" is a filter over the checkpointed
        # rows — the r9 form paid an extra join-the-previous-labels
        # job per iteration. Every node has an _old row (labels covers
        # all nodes), so _oldlbl is never null.
        new = (
            labels.withColumn("_old", F.lit(1))
            .union(prop)
            .groupBy("node")
            .agg(
                F.min("lbl").alias("lbl"),
                F.min(
                    F.when(F.col("_old") == 1, F.col("lbl"))
                ).alias("_oldlbl"),
            )
            .localCheckpoint()
        )
        n_changed = new.where(F.col("lbl") < F.col("_oldlbl")).count()
        labels = new.select("node", "lbl")
        if n_changed == 0:
            break
    else:
        # exhausting the budget means labels are WRONG (a component
        # wider than max_iter hops still carries multiple labels) —
        # fail loudly; the O(log n)-round connected_components_star
        # handles arbitrary diameters
        raise RuntimeError(
            f"min-label propagation did not converge in {max_iter} "
            "rounds (component diameter exceeds the budget); use "
            "connected_components_star for long-chain graphs"
        )
    return labels


def connected_components_star(
    edges: DataFrame, src: str = "src", dst: str = "dst", max_iter: int = 30
) -> DataFrame:
    """(node, lbl) labeling of an undirected graph via alternating
    large-star / small-star rewriting (Kiveris et al., "Connected
    Components in MapReduce and Beyond") — the O(log n)-round twin of
    :func:`connected_components`'s min-label propagation.

    Each round REWRITES the edge set instead of propagating labels:

    - large-star: every node u links its LARGER neighbors to
      m(u) = min(Γ(u) ∪ {u}) — long chains shortcut toward minima;
    - small-star: every node links its smaller-or-equal neighbors
      (and itself) to m(u) — the graph collapses into stars.

    Both steps preserve connectivity and never raise any node's
    reachable minimum, so the fixpoint is a forest of stars whose
    centers are the component minima. Convergence is O(log n) rounds
    on ANY graph shape — the regime min-label loses: a path of n
    nodes costs it O(n) rounds. Per round: two equi-joins + two
    min-aggregates + distinct, all key-partitioned shuffles;
    ``localCheckpoint()`` truncates lineage. Fixpoint detection is an
    aggregate fingerprint (count + xor of pair hashes), never a
    driver-side collect.

    Same output contract as ``connected_components``: one (node, lbl)
    row per node that appears in ``edges``, lbl = component minimum.
    """
    raw = edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    # node universe from the RAW edges, before dropping self-loops:
    # a node appearing only as (n, n) must still come out as (n, n),
    # matching connected_components' symmetric-adjacency contract.
    all_nodes = (
        raw.select(F.col("u").alias("node"))
        .union(raw.select(F.col("v").alias("node")))
        .distinct()
        .localCheckpoint()
    )
    e = (
        raw.where(F.col("u") != F.col("v"))
        .select(
            F.least("u", "v").alias("u"), F.greatest("u", "v").alias("v")
        )
        .distinct()
        .localCheckpoint()
    )

    def _mins(adj: DataFrame) -> DataFrame:
        # m(u) = min over the represented neighborhood and u itself
        return (
            adj.groupBy("u")
            .agg(F.min("v").alias("_mv"))
            .select("u", F.least(F.col("u"), F.col("_mv")).alias("m"))
        )

    def _fingerprint(df: DataFrame) -> tuple:
        row = df.agg(
            F.count("*").alias("n"),
            # xor, not sum: overflow-free under ANSI mode
            F.coalesce(
                F.expr("bit_xor(xxhash64(u, v))"), F.lit(0)
            ).alias("h"),
        ).first()
        return (row["n"], row["h"])

    fp = _fingerprint(e)
    for _ in range(max_iter):
        # large-star over the symmetric adjacency
        sym = e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        new_e = (
            sym.join(_mins(sym), "u")
            .where(F.col("v") > F.col("u"))
            .select(F.col("v").alias("a"), F.col("m").alias("b"))
            .where(F.col("a") != F.col("b"))
            .select(
                F.least("a", "b").alias("u"), F.greatest("a", "b").alias("v")
            )
            .distinct()
            .localCheckpoint()
        )
        # small-star over larger→smaller directed edges
        d = new_e.select(
            F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
        )
        dm = d.join(_mins(d), "u")
        new_e = (
            dm.select(F.col("v").alias("a"), F.col("m").alias("b"))
            .union(dm.select(F.col("u").alias("a"), F.col("m").alias("b")))
            .where(F.col("a") != F.col("b"))
            .select(
                F.least("a", "b").alias("u"), F.greatest("a", "b").alias("v")
            )
            .distinct()
            .localCheckpoint()
        )
        new_fp = _fingerprint(new_e)
        e = new_e
        if new_fp == fp:
            break
        fp = new_fp
    else:
        # mirror connected_components: never return labels from a
        # possibly non-star edge set. O(log n) convergence makes 30
        # rounds unreachable in practice, so the raise costs nothing.
        raise RuntimeError(
            f"connected_components_star did not reach the star fixpoint "
            f"in max_iter={max_iter} rounds; raise max_iter"
        )
    # fixpoint edges are stars (larger node, component min): label =
    # min over incident star edges; star centers label themselves
    labels = (
        e.select(F.greatest("u", "v").alias("node"), F.least("u", "v").alias("lbl"))
        .groupBy("node")
        .agg(F.min("lbl").alias("lbl"))
    )
    return (
        all_nodes.join(labels, "node", "left")
        .select("node", F.coalesce("lbl", F.col("node")).alias("lbl"))
    )


def contamination_check(
    corpus: DataFrame,
    holdout: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
) -> DataFrame:
    """Benchmark-contamination scan: for every corpus document, how
    many of its distinct n-gram shingles appear anywhere in the
    holdout (benchmark/eval) set.

    The holdout's distinct shingle set is broadcast — a benchmark is
    small by construction — so the whole scan is one broadcast hash
    join over the exploded corpus plus one per-doc aggregate: a single
    pass over the corpus, no self-join, no shuffle of corpus text.
    """
    from flytemosaic_spark.operators.text import portable_round

    h = (
        _shingled(holdout, text_col, id_col, n)
        .select("shingle")
        .distinct()
        .withColumn("hit", F.lit(1))
    )
    ex = _shingled(corpus, text_col, id_col, n)
    per_doc = (
        ex.join(F.broadcast(h), "shingle", "left")
        .groupBy("id", "n_sh")
        .agg(F.sum(F.coalesce(F.col("hit"), F.lit(0))).cast("bigint").alias("n_contaminated"))
    )
    return per_doc.select(
        F.col("id").alias("doc_id"),
        F.col("n_sh").cast("bigint").alias("n_shingles"),
        "n_contaminated",
        portable_round(F.col("n_contaminated") / F.col("n_sh")).alias("contaminated_frac"),
    )


def embedding_neardup_pairs(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.95,
    n_blocks: int | None = None,
) -> DataFrame:
    """Embedding-cosine near-dup pairs (a < b, cosine ≥ threshold),
    EXACT, via block-pair decomposition: ids hash into ``n_blocks``
    blocks, the B·(B+1)/2 unordered block pairs form a tiny broadcast
    grid, and each grid cell equi-joins its two blocks. Every
    unordered vector pair lands in exactly one cell (its block pair;
    same-block ties break on id order), so the result is identical to
    the all-pairs join — but the plan is a shuffle equi-join on
    (gi, gj) with per-task state of 2·N/B vectors and NO full-corpus
    broadcast, and the N²/2 similarity work spreads across B·(B+1)/2
    independent tasks.

    Exact cosine-threshold joins are inherently Ω(N²) compute at LOW
    thresholds (t = 0.4 → θ ≈ 66°: per-hyperplane sign-agreement is
    ~0.63 for matching pairs vs 0.5 for random ones, so any LSH band
    config with recall→1 admits nearly every pair as a candidate).
    This formulation makes that compute distributable and spill-safe.
    For HIGH thresholds (≥ ~0.8) use
    :func:`embedding_neardup_pairs_lsh` — candidate pruning is sound
    there and cost drops below quadratic."""
    from flytemosaic_spark.operators.similarity import dot, norm

    spark = df.sparkSession
    b_cnt = n_blocks or max(
        8, math.isqrt(2 * spark.sparkContext.defaultParallelism)
    )
    v = df.select(
        F.col(id_col).alias("_id"),
        F.col(vec_col).alias("_v"),
        norm(F.col(vec_col)).alias("_n"),
        F.pmod(F.hash(F.col(id_col)), F.lit(b_cnt)).alias("_b"),
    )
    # B² grid from ONE range (div/mod), no cross join in the plan
    grid = (
        spark.range(b_cnt * b_cnt)
        .select(
            (F.col("id") / b_cnt).cast("int").alias("gi"),
            F.pmod(F.col("id"), F.lit(b_cnt)).cast("int").alias("gj"),
        )
        .where(F.col("gi") <= F.col("gj"))
    )
    left = v.join(F.broadcast(grid), v["_b"] == F.col("gi")).select(
        "gi", "gj", F.col("_id").alias("ia"), F.col("_v").alias("va"),
        F.col("_n").alias("na"), F.col("_b").alias("ba"),
    )
    right = v.join(F.broadcast(grid), v["_b"] == F.col("gj")).select(
        "gi", "gj", F.col("_id").alias("ib"), F.col("_v").alias("vb"),
        F.col("_n").alias("nb"), F.col("_b").alias("bb"),
    )
    pairs = left.join(right, ["gi", "gj"]).where(
        (F.col("ba") < F.col("bb"))
        | ((F.col("ba") == F.col("bb")) & (F.col("ia") < F.col("ib")))
    )
    sim = dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb"))
    return (
        pairs.select(
            F.least("ia", "ib").alias("id_a"),
            F.greatest("ia", "ib").alias("id_b"),
            F.round(sim, 4).alias("cosine"),
        )
        .where(F.col("cosine") >= threshold)
    )


def embedding_neardup_pairs_lsh(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.9,
    dim: int = 64,
    n_planes: int = 8,
    n_tables: int = 24,
    seed: int = 42,
) -> DataFrame:
    """High-threshold near-dup pairs via LSH candidates → exact
    refine: every vector gets ``n_tables`` random-hyperplane sign
    signatures (one corpus pass — signatures explode from an array),
    candidate pairs are bucket collisions in ANY table (equi-join on
    (table, signature), deduped), and exact cosine filters the
    candidates. Sub-quadratic when the threshold is high enough for
    sign-LSH to separate (t = 0.9 → θ ≈ 26°, per-plane agreement
    ~0.86 vs 0.5 random: an 8-plane band collides matching pairs at
    ~0.30 vs random at 0.004, so 24 tables give miss ≈ (0.70)^24 ≈
    2e-4 while admitting ~9% of random pairs). Approximate-complete:
    recall is probabilistic; the equivalence test pins the config on
    testdata. For low thresholds use the exact
    :func:`embedding_neardup_pairs` block decomposition instead."""
    from flytemosaic_spark.operators.similarity import (
        cosine,
        lsh_signatures_gemm,
    )

    # id-only signatures (r10, guide §2.3): the candidate self-join
    # shuffles (id, table, bucket) instead of carrying the full vector
    # through BOTH sides of the bucket shuffle (n_tables copies each);
    # vectors re-attach from the source frame only for the surviving
    # deduped candidates at refine time.
    sigs = lsh_signatures_gemm(
        df, "_id", "_v",
        vec_col=vec_col, id_col=id_col, n_planes=n_planes,
        n_tables=n_tables, dim=dim, seed=seed, include_vec=False,
    )
    a = sigs.select("table", "bucket", F.col("_id").alias("id_a"))
    b = sigs.select("table", "bucket", F.col("_id").alias("id_b"))
    cand = (
        a.join(b, ["table", "bucket"])
        .where(F.col("id_a") < F.col("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    va = df.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
    vb = df.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
    return (
        cand.join(va, "id_a")
        .join(vb, "id_b")
        .select(
            "id_a",
            "id_b",
            F.round(cosine(F.col("va"), F.col("vb")), 4).alias("cosine"),
        )
        .where(F.col("cosine") >= threshold)
    )


# Below this, sign-agreement for matching pairs sits too close to the
# random 0.5 for ANY band config to prune soundly (t = 0.7 → θ ≈ 46°,
# per-plane agreement 0.75: an 8-plane band still misses ~9% of
# boundary pairs over 24 tables), so exact block-grid is the only
# sound route. At or above, candidates→refine is both sound and
# sub-quadratic.
SIGN_LSH_MIN_THRESHOLD = 0.7


def embedding_neardup(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.95,
    **lsh_kwargs,
) -> DataFrame:
    """Embedding-cosine near-dup pairs with threshold-based routing:
    sign-LSH candidates → exact refine at thresholds ≥
    ``SIGN_LSH_MIN_THRESHOLD`` (the DEFAULT regime for near-dup
    removal — flat in the 10× sweep where the exact grid is Ω(N²) by
    problem statement), exact block-grid decomposition below (where
    no LSH band config can prune without losing recall).
    ``lsh_kwargs`` (n_planes, n_tables, dim, seed) tune the high
    route; both routes emit (id_a, id_b, cosine) with id_a < id_b."""
    if threshold >= SIGN_LSH_MIN_THRESHOLD:
        return embedding_neardup_pairs_lsh(
            df, vec_col=vec_col, id_col=id_col, threshold=threshold,
            **lsh_kwargs,
        )
    return embedding_neardup_pairs(
        df, vec_col=vec_col, id_col=id_col, threshold=threshold
    )


def shared_substring_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    window: int = 40,
    stride: int = 20,
) -> DataFrame:
    """Substring-level duplicate detection: pairs of documents sharing
    at least one ``window``-char span, found by hashing character
    windows every ``stride`` chars (stride ≤ window/2 guarantees any
    shared span of ≥ window+stride chars produces an aligned common
    window on both sides).

    This catches the case word-shingle Jaccard misses: a long copied
    PASSAGE inside otherwise-different documents (boilerplate,
    licenses, quoted text) barely moves document-level similarity but
    is exactly what substring dedup of training corpora targets.

    Scale shape: the window hashes are an inverted index — explode →
    distinct → self-equi-join on the hash — so cost is (docs ×
    windows/doc) rows and the join only meets actual collisions, the
    same candidate-generation shape as MinHash-LSH (X2) with the
    hash being content-exact instead of similarity-preserving.
    Output: (id_a, id_b, n_shared) with id_a < id_b.
    """
    pos = F.sequence(
        F.lit(1),
        F.greatest(F.length(text_col) - (window - 1), F.lit(1)),
        F.lit(stride),
    )
    hashes = df.select(
        F.col(id_col).alias("_id"),
        F.explode(
            F.transform(
                pos,
                lambda p: F.md5(F.col(text_col).substr(p, F.lit(window))),
            )
        ).alias("h"),
    )
    # inverted-index buckets, pairs generated inside each bucket: two
    # shuffles total (by hash, then by pair) — a self-join formulation
    # costs 4x the exchanges. collect_set also dedupes repeated
    # windows within a doc. Hot buckets (a window shared by MANY docs)
    # are inherent to the semantics — that window IS corpus
    # boilerplate; cap or pre-scrub upstream if a bucket outgrows a
    # task.
    buckets = (
        hashes.groupBy("h")
        .agg(F.array_sort(F.collect_set("_id")).alias("ids"))
        .where(F.size("ids") > 1)
    )
    pairs = F.flatten(
        F.transform(
            F.col("ids"),
            lambda x, i: F.transform(
                F.slice(F.col("ids"), i + 2, F.size("ids")),
                lambda y: F.struct(x.alias("id_a"), y.alias("id_b")),
            ),
        )
    )
    return (
        buckets.select(F.explode(pairs).alias("p"))
        .groupBy(F.col("p.id_a").alias("id_a"), F.col("p.id_b").alias("id_b"))
        .agg(F.count("*").alias("n_shared"))
    )


def containment_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 5,
    threshold: float = 0.8,
) -> DataFrame:
    """Asymmetric near-dup: containment(a in b) = |A∩B| / |A| — the
    subset-duplicate detector Jaccard misses (a short doc fully
    embedded in a long one barely moves |A∩B|/|A∪B| but has
    containment ≈ 1). Emits DIRECTED pairs (id_a contained-in id_b,
    a ≠ b, containment ≥ threshold); same inverted-index plan as
    :func:`ngram_jaccard_pairs`."""
    a = _shingled(df, text_col, id_col, n)
    b = a.withColumnRenamed("id", "id_b").withColumnRenamed("n_sh", "n_sh_b")
    inter = (
        a.join(b, "shingle")
        .where(F.col("id") != F.col("id_b"))
        .groupBy(F.col("id").alias("id_a"), F.col("id_b"), F.col("n_sh").alias("n_a"))
        .agg(F.count("*").alias("n_inter"))
    )
    cont = F.col("n_inter") / F.col("n_a")
    return inter.select(
        "id_a", "id_b", F.round(cont, 4).alias("containment")
    ).where(F.col("containment") >= threshold)


def ngram_novelty(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
) -> DataFrame:
    """Per-document novelty: the fraction of its distinct n-grams whose
    FIRST corpus occurrence (by ascending id) is this document — the
    contribution score dedup-aware sampling ranks by (a doc whose
    grams all appeared earlier adds nothing; keep the novel ones).

    Plan: distinct (gram, id) → min(id) per gram (partial-agg
    compresses the shuffle to gram cardinality) → join back on the
    gram → per-doc novel fraction. Two exchanges; the gram table is
    the corpus vocabulary, shared with x26's heavy hitters.
    """
    g = _shingled(df, text_col, id_col, n).select(
        F.col("id"), F.col("n_sh"), F.col("shingle")
    )
    first = g.groupBy("shingle").agg(F.min("id").alias("first_id"))
    return (
        g.join(first, "shingle")
        .groupBy("id", "n_sh")
        .agg(F.count_if(F.col("first_id") == F.col("id")).alias("n_novel"))
        .select(
            F.col("id").alias(id_col),
            F.round(F.col("n_novel") / F.col("n_sh"), 4).alias("novelty"),
        )
    )


def prefix_jaccard_pairs(
    df: DataFrame,
    set_col: str,
    id_col: str = "doc_id",
    threshold: float = 0.5,
) -> DataFrame:
    """Exact set-Jaccard self-join with prefix filtering
    (PPJoin-style) over an array column of set elements (tokens,
    shingles, …): each document only probes the index with its first
    ``L - ceil(t*L) + 1`` elements under a global rarest-first order
    — any pair at Jaccard >= t MUST share a prefix element
    (lossless), so the candidate space shrinks by orders of magnitude
    versus the full inverted-index join while the result stays
    bit-identical to brute force.

    Scale shape: element frequencies are vocabulary-scale (a groupBy,
    no global sort — the order key IS (frequency, element), no dense
    rank needed); candidate generation explodes only prefix elements
    (rare by construction, so buckets stay small where a full
    inverted index has its hottest buckets); verification re-joins
    the two sorted element arrays per surviving candidate pair.
    Length filter ``t*La <= Lb <= La/t`` prunes before verification.
    Returns (id_a, id_b, jaccard) for pairs with Jaccard >= t.
    """
    from flytemosaic_spark.operators.text import portable_round

    parallelism = df.sparkSession.sparkContext.defaultParallelism
    tok = (
        df.repartition(parallelism, F.col(id_col))
        .select(F.col(id_col).alias("id"), F.explode(
            F.array_distinct(F.col(set_col))).alias("token"))
        # the exploded element stream feeds both the frequency table
        # and the ordered join; caching computes the (expensive) set
        # construction once instead of twice (MEMORY_AND_DISK, spills
        # at scale rather than recomputing)
        .cache()
    )
    freq = tok.groupBy("token").agg(F.count("*").alias("tok_df"))
    ordered = tok.join(freq, "token")
    sets = (
        ordered.groupBy("id")
        .agg(F.array_sort(F.collect_list(F.struct("tok_df", "token"))).alias("_o"))
        .select(
            "id",
            F.col("_o.token").alias("toks"),
            F.size("_o").alias("set_len"),
        )
        # scanned three times: prefix explode + both verification sides
        .cache()
    )
    t = F.lit(float(threshold))
    prefix_len = F.col("set_len") - F.ceil(t * F.col("set_len")) + F.lit(1)
    pref = sets.select(
        "id",
        "set_len",
        F.explode(F.slice("toks", F.lit(1), prefix_len.cast("int"))).alias("token"),
    )
    a = pref.select(
        F.col("id").alias("id_a"), F.col("set_len").alias("la"), "token"
    )
    b = pref.select(
        F.col("id").alias("id_b"), F.col("set_len").alias("lb"), "token"
    )
    cand = (
        a.join(b, "token")
        .where(
            (F.col("id_a") < F.col("id_b"))
            & (F.col("lb") >= F.ceil(t * F.col("la")))
            & (F.col("lb") <= F.floor(F.col("la") / t))
        )
        .select("id_a", "id_b")
        .distinct()
    )
    sa = sets.select(F.col("id").alias("id_a"), F.col("toks").alias("toks_a"))
    sb = sets.select(F.col("id").alias("id_b"), F.col("toks").alias("toks_b"))
    inter = F.size(F.array_intersect("toks_a", "toks_b"))
    jacc = inter / (F.size("toks_a") + F.size("toks_b") - inter)
    return (
        cand.join(sa, "id_a")
        .join(sb, "id_b")
        .where(jacc >= t)
        .select("id_a", "id_b", portable_round(jacc).alias("jaccard"))
    )


def survivorship(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    quality_col: str = "n_chars",
    prefix_len: int | None = None,
) -> DataFrame:
    """Survivorship / canonicalization — the step AFTER dedup
    detection: every duplicate cluster (exact content hash, or a
    leading-``prefix_len``-chars fingerprint for near-dup families
    that share a head) elects one canonical record (highest
    ``quality_col``, then lowest id — the deterministic golden-record
    rule) and the output maps each redundant member to its canonical
    id, ready to drive a MERGE rewrite or a training-data drop list.

    One content-hash shuffle; the canonical pick is a row_number
    window PARTITIONED by the hash (bounded per-cluster state, never
    a global sort); singleton clusters are filtered out map-side
    after the window. Emits (doc_id, canonical_id, cluster_size) for
    members of multi-record clusters only — data-scale output, never
    wider than the duplicate subset.
    """
    from pyspark.sql import Window

    content = (
        F.substring(F.col(text_col), 1, prefix_len)
        if prefix_len
        else F.col(text_col)
    )
    h = docs.select(
        F.col(id_col).alias("_id"),
        F.md5(content).alias("_h"),
        F.col(quality_col).alias("_q"),
    )
    w = Window.partitionBy("_h").orderBy(F.desc("_q"), F.asc("_id"))
    ranked = h.select(
        "_id",
        "_h",
        F.row_number().over(w).alias("_rn"),
        F.count("*").over(Window.partitionBy("_h")).alias("_sz"),
        F.first("_id").over(
            Window.partitionBy("_h").orderBy(F.desc("_q"), F.asc("_id"))
        ).alias("_canon"),
    )
    return (
        ranked.where((F.col("_sz") > 1) & (F.col("_rn") > 1))
        .select(
            F.col("_id").alias("doc_id"),
            F.col("_canon").alias("canonical_id"),
            F.col("_sz").cast("bigint").alias("cluster_size"),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# Exact-substring dedup via winnowing (Schleimer/Wilkerson/Aiken,
# SIGMOD 2003 — the MOSS fingerprinting scheme)
# ---------------------------------------------------------------------------
#
# Lee et al. 2022 ("Deduplicating Training Data Makes Language Models
# Better") build a SUFFIX ARRAY to find every exact duplicate
# substring over a length threshold — O(n) index entries over the
# whole corpus, a global sort that does not distribute cheaply.
# Winnowing is the distributed-friendly trade with a PROVABLE
# guarantee: hash every w-char window, then in each run of p
# consecutive window positions select the minimum hash. Any exact
# copied passage of length >= w + p - 1 contains p consecutive full
# windows, whose minimum hash VALUE is content-determined — so both
# copies select the same fingerprint and the equi-join finds them.
# Index size drops to ~2n/p selected fingerprints while x38's fixed
# stride-20 windows can MISS copies at unlucky alignments.


def winnow_fingerprints(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    w: int = 24,
    p: int = 8,
    segment: int = 512,
) -> DataFrame:
    """(doc_id, pos, h) selected fingerprints — the inverted-index
    rows. Selection key order is (md5hex, pos) — exactly the
    lexicographic order of the oracle's ``md5hex:lpad7(pos)`` string
    keys for positions < 10^7 (the documented per-doc length
    contract). Documents shorter than w + p - 1 chars have no
    guarantee and are skipped.

    r10 plan (measured; r9 numbers in parentheses, sf0.1 hot):

    - documents still explode into overlapping SEGMENTS of
      ``segment`` run-starts in the JVM (length segment + w + p - 2,
      so every p-run of windows lies wholly inside one segment and
      each global run is owned by exactly one segment) — long
      documents parallelize WITHIN a doc and no single task owns a
      100 KB straggler;
    - per segment, hashing + sliding-min selection run in ONE
      Arrow-batched mapInPandas kernel (hashlib md5 + an O(n)
      monotonic-deque window minimum), emitting ONLY the selected
      fingerprints — a REDUCING kernel, the regime where Python
      kernels beat Catalyst (the x192 rule). The r9 JVM form built
      the per-position key array and ran array_min(slice(...)) via
      higher-order ``transform`` lambdas, which Catalyst cannot
      codegen: every element evaluated interpreted (measured 3.5 s
      for the md5 array alone + 1.6 s for the sliding min at sf0.1;
      a struct-key variant was 3x worse again — interpreted struct
      ordering). The kernel does the same work in ~0.2 s of
      vectorized-ish Python across tasks. Per-segment selections are
      emitted deduplicated;
    - the kernel input is explicitly repartitioned
      (``repartition(defaultParallelism, doc, off)`` — explicit count
      because AQE would coalesce the tiny segment shuffle onto one
      task, the x222 rule);
    - the returned frame is hash-partitioned by ``h`` (explicit count
      again) and the cross-segment duplicate collapse runs ON that
      partitioning, so the h-partitioned first-occurrence window
      every consumer applies next needs NO further exchange: one
      fingerprint-set shuffle where the r9 form paid two (a global
      distinct exchange on (doc_id, key) then the window's exchange
      on h).
    """
    from pyspark.sql.types import (
        IntegerType,
        StringType,
        StructField,
        StructType,
    )

    wl = w + p - 1
    seg_expr = (
        f"transform(sequence(0, cast((length({text_col}) - {wl}) "
        f"/ {segment} as int)), s -> struct(s * {segment} as off, "
        f"substring({text_col}, s * {segment} + 1, "
        f"{segment + w + p - 2}) as seg))"
    )
    segs = (
        docs.where(F.length(text_col) >= wl)
        .select(
            F.col(id_col).alias("doc_id"),
            F.explode(F.expr(seg_expr)).alias("sg"),
        )
        .select(
            "doc_id",
            F.col("sg.off").alias("_off"),
            F.col("sg.seg").alias("_seg"),
        )
    )
    n_part = docs.sparkSession.sparkContext.defaultParallelism
    id_type = segs.schema["doc_id"].dataType
    out_schema = StructType(
        [
            StructField("doc_id", id_type, True),
            StructField("h", StringType(), False),
            StructField("pos", IntegerType(), False),
        ]
    )

    def _extract(batches):
        import hashlib
        from collections import deque

        import pandas as pd

        for pdf in batches:
            out_doc: list = []
            out_h: list = []
            out_pos: list = []
            for doc, off, seg in zip(
                pdf["doc_id"], pdf["_off"], pdf["_seg"]
            ):
                n = len(seg) - w + 1
                if n < p:  # unreachable by construction; keep the guard
                    continue
                hs = [
                    hashlib.md5(seg[i : i + w].encode()).hexdigest()
                    for i in range(n)
                ]
                m = min(segment, n - p + 1)  # run-starts owned here
                sel: set = set()
                dq: deque = deque()  # indices; (hs[i], i) increasing
                for i in range(m + p - 1):
                    # pop strictly-greater hashes only: an EQUAL hash
                    # at an earlier index stays ahead (it is the
                    # (h, pos) minimum while in-window) and the later
                    # equal one queues behind it (it becomes the
                    # minimum once the earlier expires) — exactly
                    # array_min's (h, pos) lexicographic order.
                    while dq and hs[dq[-1]] > hs[i]:
                        dq.pop()
                    dq.append(i)
                    r = i - p + 1
                    if r >= 0:
                        while dq[0] < r:
                            dq.popleft()
                        if r < m:
                            j = dq[0]
                            sel.add((hs[j], off + j + 1))
                for hh, pp in sel:
                    out_doc.append(doc)
                    out_h.append(hh)
                    out_pos.append(pp)
            yield pd.DataFrame(
                {"doc_id": out_doc, "h": out_h, "pos": out_pos}
            ).astype({"pos": "int32"})

    fp = segs.repartition(n_part, "doc_id", "_off").mapInPandas(
        _extract, out_schema
    )
    return (
        fp.repartition(n_part, "h")
        .dropDuplicates(["doc_id", "h", "pos"])
    )


def winnow_dedup_stats(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    w: int = 24,
    p: int = 8,
) -> DataFrame:
    """Per-document exact-substring dedup rollup: each selected
    fingerprint's globally FIRST occurrence (lowest (doc_id, pos),
    x153's arg-min-by-encoded-key) survives; later copies count as
    duplicated passage evidence. Plan: linear fingerprint explode ->
    one hash aggregation on h -> equi-join back -> per-doc rollup
    (the x38/x153 inverted-index shape; no pair blowup).

    First-occurrence ordering contract: documents must be shorter
    than 10^7 chars and doc ids below 2^39 (the packed-bigint key
    width); longer inputs silently corrupt the tie-break order."""
    from pyspark.sql import Window

    fp = winnow_fingerprints(docs, text_col, id_col, w, p)
    # global first occurrence per h via min-over-window, NOT an
    # agg + join-back: the join-back re-executes the corpus-scale
    # md5-window extraction once per consumer (the x191 rule) — the
    # h-partitioned window computes it in ONE pass, and since
    # winnow_fingerprints already returns h-partitioned rows it adds
    # NO exchange. The (doc_id, pos) pair packs into ONE bigint
    # (doc_id·2^24 + pos): numeric order == the oracle's
    # lpad12(doc):lpad7(pos) string order under the documented
    # pos < 10^7 / doc_id < 2^39 width contract, and a codegen'd
    # bigint min beats both per-row string building (r8) and
    # interpreted struct ordering (measured 3x slower in r10).
    gk = F.col("doc_id").cast("bigint") * F.lit(1 << 24).cast(
        "bigint"
    ) + F.col("pos")
    marked = fp.select(
        "doc_id",
        (gk == F.min(gk).over(Window.partitionBy("h")))
        .cast("bigint")
        .alias("is_first"),
    )
    from flytemosaic_spark.operators.text import portable_round

    kept = F.sum("is_first")
    return marked.groupBy("doc_id").agg(
        F.count("*").alias("n_fp"),
        kept.alias("n_kept"),
        portable_round(F.lit(1.0) - kept / F.count("*"), 6).alias(
            "dup_frac"
        ),
    )


def winnow_py(text: str, w: int = 24, p: int = 8) -> set:
    """Float-free python twin of :func:`winnow_keys` (the property-
    test oracle): returns the set of selected (md5hex, pos) pairs."""
    import hashlib

    n = len(text) - w + 1
    if n < p:
        return set()
    hs = [
        (hashlib.md5(text[i : i + w].encode()).hexdigest(), i + 1)
        for i in range(n)
    ]
    out = set()
    for i in range(n - p + 1):
        out.add(min(hs[i : i + p]))
    return out


def winnow_dedup_apply(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    w: int = 24,
    p: int = 8,
) -> DataFrame:
    """Duplicate-span REMOVAL (the apply half of winnowing — Lee et
    al. 2022 semantics): emit CLEANED text where every LATER copy of
    a duplicated passage is cut out at fingerprint-window boundaries
    and the globally first occurrence is kept verbatim.

    Guarantee shape: any exact copied passage of length >= w + p - 1
    selects fingerprints at gaps <= p inside both copies; in the
    later copy every such fingerprint is non-first, and since w > p
    their w-char windows overlap into ONE contiguous merged span —
    so the copy is removed except for at most p - 1 chars at each
    boundary (window-granular, the documented trade vs suffix
    arrays' exact cut).

    Plan: linear fingerprint explode -> first-occurrence marks via
    the h-partitioned min window (ONE pass, the x241 rule) -> per-doc
    interval merge (doc-partitioned running-max window; doc_id is
    high-cardinality) -> per-doc span list -> ONE aggregate() HOF
    rebuilds the kept gaps (runtime fold, not expression-tree
    nesting, so the k^iters rule is respected) -> left join back so
    span-free and short documents pass through verbatim.

    Returns (doc_id, clean_text, n_spans, n_removed).

    First-occurrence ordering contract: documents must be shorter
    than 10^7 chars and doc ids below 2^39 (the packed-bigint key
    width); longer inputs silently corrupt the tie-break order.
    """
    from pyspark.sql import Window

    fp = winnow_fingerprints(docs, text_col, id_col, w, p)
    # first-occurrence marks ride winnow_fingerprints' existing h
    # partitioning (no exchange); the packed-bigint (doc_id, pos) key
    # replays the oracle's lpad12:lpad7 string order (see
    # winnow_dedup_stats).
    gk = F.col("doc_id").cast("bigint") * F.lit(1 << 24).cast(
        "bigint"
    ) + F.col("pos")
    dup = fp.select(
        "doc_id",
        "pos",
        (gk == F.min(gk).over(Window.partitionBy("h"))).alias(
            "is_first"
        ),
    ).where(~F.col("is_first"))
    spans = dup.select(
        "doc_id",
        F.col("pos").alias("s"),
        (F.col("pos") + F.lit(w - 1)).alias("e"),
    )
    byd = Window.partitionBy("doc_id").orderBy("s")
    run = spans.select(
        "doc_id",
        "s",
        "e",
        F.max("e")
        .over(byd.rowsBetween(Window.unboundedPreceding, -1))
        .alias("prev_e"),
    ).select(
        "doc_id",
        "s",
        "e",
        F.when(
            F.col("prev_e").isNull() | (F.col("s") > F.col("prev_e") + 1),
            F.lit(1),
        )
        .otherwise(F.lit(0))
        .alias("brk"),
    )
    grouped = run.select(
        "doc_id", "s", "e", F.sum("brk").over(byd).alias("gid")
    )
    merged = grouped.groupBy("doc_id", "gid").agg(
        F.min("s").alias("ms"), F.max("e").alias("me")
    )
    per_doc = merged.groupBy("doc_id").agg(
        F.sort_array(
            F.collect_list(F.struct(F.col("ms"), F.col("me")))
        ).alias("spans"),
        F.count("*").alias("n_spans"),
        F.sum(F.col("me") - F.col("ms") + 1).alias("n_removed"),
    )
    cleaned = (
        "aggregate(spans, struct(cast('' as string) as t, 0 as e), "
        "(acc, sp) -> struct(concat(acc.t, substring({t}, acc.e + 1, "
        "sp.ms - acc.e - 1)), cast(sp.me as int)), "
        "acc -> concat(acc.t, substring({t}, acc.e + 1, "
        "length({t}) - acc.e)))"
    ).format(t=text_col)
    return (
        docs.select(F.col(id_col).alias("doc_id"), F.col(text_col))
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.when(F.col("spans").isNull(), F.col(text_col))
            .otherwise(F.expr(cleaned))
            .alias("clean_text"),
            F.coalesce(F.col("n_spans"), F.lit(0)).alias("n_spans"),
            F.coalesce(F.col("n_removed"), F.lit(0)).alias("n_removed"),
        )
    )


def winnow_apply_py(
    texts: dict, w: int = 24, p: int = 8
) -> dict:
    """Python twin of :func:`winnow_dedup_apply` for property tests:
    ``{doc_id: text}`` -> ``{doc_id: clean_text}`` with identical
    first-occurrence, span-merge, and boundary semantics."""
    import hashlib

    first: dict[str, tuple] = {}
    sel: dict[int, set] = {}
    for d in sorted(texts):
        t = texts[d]
        n = len(t) - w + 1
        sel[d] = set()
        if n < p:
            continue
        hs = [
            (hashlib.md5(t[i : i + w].encode()).hexdigest(), i + 1)
            for i in range(n)
        ]
        for i in range(n - p + 1):
            h, pos = min(hs[i : i + p])
            sel[d].add((h, pos))
            k = (d, pos)
            if h not in first or k < first[h]:
                first[h] = k
    out = {}
    for d, t in texts.items():
        spans = sorted(
            (pos, pos + w - 1)
            for h, pos in sel[d]
            if first[h] != (d, pos)
        )
        merged: list[list[int]] = []
        for s, e in spans:
            if merged and s <= merged[-1][1] + 1:
                merged[-1][1] = max(merged[-1][1], e)
            else:
                merged.append([s, e])
        keep = []
        prev = 0
        for s, e in merged:
            keep.append(t[prev : s - 1])
            prev = e
        keep.append(t[prev:])
        out[d] = "".join(keep)
    return out
