"""Similarity search over embedding columns (array<float>).

- :func:`brute_force_topk` — exact cosine top-k via broadcast of the
  query set + window ranking. The correctness baseline.
- :func:`lsh_topk` — random-hyperplane LSH bucketing: sub-linear
  candidate generation for the 100 TB path (buckets are an equi-join
  key, so the probe side never scans the full corpus).
- :func:`ivf_topk` — inverted-file variant: corpus is clustered to
  deterministic centroids, queries probe the nearest ``nprobe``
  centroids only.
- :func:`pq_topk` — product quantization: the corpus is compressed to
  codebook indices (~32x smaller scan), candidates ranked by
  asymmetric distance (LUT lookups), exact re-rank on the shortlist.

The dot product / norms are Catalyst higher-order functions
(``zip_with`` + ``aggregate``) — JVM-side, no Python in the hot path.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    round_digits: int | None = 4,
) -> DataFrame:
    """Exact top-k neighbors for each query vector.

    Broadcast the (small) query side so the corpus scan is a single
    narrow stage; ranking shuffles only (q_id, candidate) pairs.
    Similarity is rounded *before* ranking (with id tie-break) so the
    ranking is reproducible across engines and float summation orders.
    """
    parallelism = corpus.sparkSession.sparkContext.defaultParallelism
    q = queries.select(
        F.col(id_col).alias("q_id"),
        F.col(vec_col).alias("q_vec"),
        norm(F.col(vec_col)).alias("q_norm"),
    )
    # repartition: a narrow single-file corpus would otherwise run the
    # whole pairwise stage in one task; norms are precomputed per side
    # so the join evaluates one dot product per pair, not three folds
    c = corpus.repartition(parallelism).select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("c_vec"),
        norm(F.col(vec_col)).alias("c_norm"),
    )
    sim = dot(F.col("q_vec"), F.col("c_vec")) / (F.col("q_norm") * F.col("c_norm"))
    if round_digits is not None:
        sim = F.round(sim, round_digits)
    scored = (
        F.broadcast(q)
        .crossJoin(c)
        .where(F.col("q_id") != F.col("neighbor_id"))
        .select("q_id", "neighbor_id", sim.alias("sim"))
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .where(F.col("rank") <= k)
        .select("q_id", "rank", "neighbor_id", "sim")
    )


def _hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim)).tolist()


def _bucket_signature(vec: Column, planes: list[list[float]]) -> Column:
    """Bit signature: sign of the projection onto each hyperplane."""
    bits = [
        F.when(dot(vec, F.array(*[F.lit(p) for p in plane])) > 0, F.lit(1)).otherwise(
            F.lit(0)
        )
        for plane in planes
    ]
    sig = F.lit(0).cast("bigint")
    for bit in bits:
        sig = F.shiftleft(sig, 1) + bit.cast("bigint")
    return sig


def lsh_signatures(
    df: DataFrame,
    out_id: str,
    out_vec: str,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_planes: int = 4,
    n_tables: int = 8,
    dim: int = 64,
    seed: int = 42,
) -> DataFrame:
    """One row per (vector, table) with the table's sign-bit bucket
    signature — the shared candidate-generation front end of
    :func:`lsh_topk` and ``dedup.embedding_neardup_pairs_lsh``. All
    tables' signatures are computed in ONE pass (an array of
    (table, bucket) structs, exploded), so the scan cost is
    independent of n_tables; only the equi-join key space grows."""
    entries = [
        F.struct(
            F.lit(t).alias("table"),
            _bucket_signature(
                F.col(vec_col), _hyperplanes(dim, n_planes, seed + t)
            ).alias("bucket"),
        )
        for t in range(n_tables)
    ]
    return df.select(
        F.col(id_col).alias(out_id),
        F.col(vec_col).alias(out_vec),
        F.explode(F.array(*entries)).alias("tb"),
    ).select(out_id, out_vec, "tb.table", "tb.bucket")


def lsh_signatures_gemm(
    df: DataFrame,
    out_id: str,
    out_vec: str,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_planes: int = 4,
    n_tables: int = 8,
    dim: int = 64,
    seed: int = 42,
    include_vec: bool = True,
) -> DataFrame:
    """Same contract as :func:`lsh_signatures`, computed as ONE numpy
    gemm per Arrow batch via ``mapInPandas``: (batch × dim) @
    (dim × n_tables·n_planes), then a bit-pack per table.

    ``include_vec=False`` drops the vector column from the output —
    the signature table is then (id, table, bucket) only, n_tables×
    smaller across the Python→JVM boundary and through any downstream
    shuffle; callers re-attach vectors from the source frame for the
    exact refine (r10, guide §2.3: shuffle ids, not payloads).

    The expression form embeds n_tables·n_planes·dim plane literals in
    the plan; past ~8×8 that blows whole-stage codegen past JIT limits
    and costs ~15 s of FIXED plan/compile time at 16×12. The gemm is
    plan-size O(1), per-row work identical, and vectorized. Bucket
    values match the expression form except on projections within one
    float ulp of zero — candidates are exact-refined downstream, so
    only recall could shift, and the x11/x11b shared oracle gates it.
    """
    planes = np.concatenate(
        [
            np.asarray(_hyperplanes(dim, n_planes, seed + t))
            for t in range(n_tables)
        ]
    )  # (n_tables*n_planes, dim)
    weights = (1 << np.arange(n_planes - 1, -1, -1)).astype(np.int64)

    id_type = df.schema[id_col].dataType.simpleString()
    vec_type = df.schema[vec_col].dataType.simpleString()
    vec_part = f"{out_vec} {vec_type}, " if include_vec else ""
    schema = f"{out_id} {id_type}, {vec_part}table int, bucket bigint"

    def run(it):
        for pdf in it:
            if not len(pdf):
                continue
            v = np.asarray(pdf[vec_col].tolist(), dtype=np.float64)
            bits = (v @ planes.T) > 0  # (B, T*P)
            buckets = bits.reshape(len(pdf), n_tables, n_planes) @ weights
            cols = {out_id: np.repeat(pdf[id_col].values, n_tables)}
            if include_vec:
                cols[out_vec] = np.repeat(pdf[vec_col].values, n_tables)
            cols["table"] = np.tile(
                np.arange(n_tables, dtype=np.int32), len(pdf)
            )
            cols["bucket"] = buckets.ravel()
            yield pd.DataFrame(cols)

    return df.select(id_col, vec_col).mapInPandas(run, schema)


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_planes: int = 4,
    n_tables: int = 8,
    dim: int = 64,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k via ``n_tables`` independent random-hyperplane
    LSH tables. Candidates = union of bucket collisions across tables;
    exact cosine refines and ranks within candidates only."""
    kw = dict(
        vec_col=vec_col, id_col=id_col, n_planes=n_planes,
        n_tables=n_tables, dim=dim, seed=seed,
    )
    q_all = lsh_signatures(queries, "q_id", "q_vec", **kw)
    c_all = lsh_signatures(corpus, "neighbor_id", "c_vec", **kw)
    cand = (
        q_all.join(c_all, ["table", "bucket"])
        .where(F.col("q_id") != F.col("neighbor_id"))
        .select("q_id", "q_vec", "neighbor_id", "c_vec")
        .dropDuplicates(["q_id", "neighbor_id"])
    )
    sim = F.round(cosine(F.col("q_vec"), F.col("c_vec")), 4)
    w = Window.partitionBy("q_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        cand.select("q_id", "neighbor_id", sim.alias("sim"))
        .withColumn("rank", F.row_number().over(w).cast("bigint"))
        .where(F.col("rank") <= k)
    )


def kmeans(
    corpus: DataFrame,
    k: int = 8,
    max_iter: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    tol: float = 1e-6,
) -> tuple[DataFrame, list[list[float]]]:
    """Lloyd's k-means over an embedding column; returns (assignments,
    centroids). Assignments: (id, cluster, dist) with dist = squared L2
    to the final centroid.

    Scale shape: centroids are metadata-sized (k × dim doubles), so
    they live driver-side and are inlined as literal expressions each
    round — assignment is a pure map stage (argmin over k literal
    distances, JVM codegen, no join/window/shuffle of vectors). The
    mean update posexplodes to (cluster, dim) cells: partial
    aggregation compresses the shuffle to k·dim rows PER PARTITION
    regardless of corpus size — the vectors themselves never shuffle.
    Initial centroids are a deterministic hash-sampled subset (the same
    seeding IVF uses), so runs are reproducible given a fixed corpus.
    """
    import math

    # deterministic pseudo-random seed pick: k rows by hash order —
    # TakeOrderedAndProject, no full sort, exactly k rows at any scale
    centroids = [
        [float(v) for v in r.c]
        for r in (
            corpus.orderBy(F.xxhash64(F.col(id_col)), F.col(id_col))
            .limit(k)
            .select(F.col(vec_col).alias("c"))
            .collect()
        )
    ]

    def _dist_array(vec: Column, cents: list[list[float]]) -> Column:
        """array<struct<dist,cluster>> of squared L2 to each centroid."""
        entries = []
        for ci, cent in enumerate(cents):
            diff = F.zip_with(
                vec,
                F.array(*[F.lit(x) for x in cent]),
                lambda a, b: (a.cast("double") - b) * (a.cast("double") - b),
            )
            d2 = F.aggregate(diff, F.lit(0.0), lambda acc, v: acc + v)
            entries.append(F.struct(d2.alias("dist"), F.lit(ci).alias("cluster")))
        return F.array(*entries)

    assigned = None
    for _ in range(max_iter):
        assigned = corpus.select(
            F.col(id_col).alias("id"),
            F.col(vec_col).alias("vec"),
            F.array_min(_dist_array(F.col(vec_col), centroids)).alias("best"),
        ).select("id", "vec", F.col("best.cluster").alias("cluster"))
        cells = (
            assigned.select(
                "cluster", F.posexplode(F.col("vec").cast("array<double>"))
            )
            .groupBy("cluster", "pos")
            .agg(F.sum("col").alias("s"), F.count("*").alias("n"))
            .collect()
        )
        new_centroids = [list(c) for c in centroids]
        for r in cells:
            new_centroids[r["cluster"]][r["pos"]] = r["s"] / r["n"]
        shift = max(
            (
                math.sqrt(sum((a - b) ** 2 for a, b in zip(old, new)))
                for old, new in zip(centroids, new_centroids)
            ),
            default=0.0,
        )
        centroids = new_centroids
        if shift < tol:
            break

    final = corpus.select(
        F.col(id_col).alias("id"),
        F.array_min(_dist_array(F.col(vec_col), centroids)).alias("best"),
    ).select(
        "id",
        F.col("best.cluster").alias("cluster"),
        F.col("best.dist").alias("dist"),
    )
    return final, centroids


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_centroids: int = 16,
    nprobe: int = 4,
) -> DataFrame:
    """IVF-style ANN: deterministic centroids (a hash-sampled subset of
    the corpus — k-means would slot in unchanged), corpus assigned to
    its nearest centroid, queries probe the ``nprobe`` nearest centroid
    lists only.

    Scale shape: the centroid set is metadata-sized, so it is collected
    and inlined as literal expressions — assignment is then a pure
    map stage (no join, no window, no shuffle); the only shuffles are
    the candidate equi-join on centroid_id and the final ranking."""
    stride = max(1, corpus.count() // n_centroids)
    centroid_rows = (
        corpus.where(F.pmod(F.xxhash64(F.col(id_col)), F.lit(stride)) == 0)
        .orderBy(id_col)
        .limit(n_centroids)
        .select(F.col(id_col).alias("centroid_id"), F.col(vec_col).alias("centroid"))
        .collect()
    )

    def _scored_array(vec: Column) -> Column:
        """array<struct<csim,centroid_id>> — one entry per centroid,
        all computed JVM-side from literals."""
        entries = [
            F.struct(
                cosine(vec, F.array(*[F.lit(float(v)) for v in r.centroid])).alias(
                    "csim"
                ),
                F.lit(r.centroid_id).alias("centroid_id"),
            )
            for r in centroid_rows
        ]
        return F.array(*entries)

    # nearest centroid = array_max over the struct array (csim leads)
    assigned = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("c_vec"),
        F.array_max(_scored_array(F.col(vec_col)))["centroid_id"].alias("centroid_id"),
    )
    # queries probe their nprobe nearest centroids: sort desc + slice
    probed = queries.select(
        F.col(id_col).alias("q_id"),
        F.col(vec_col).alias("q_vec"),
        F.explode(
            F.slice(
                F.reverse(F.array_sort(_scored_array(F.col(vec_col)))),
                1,
                nprobe,
            )["centroid_id"]
        ).alias("centroid_id"),
    )
    cand = (
        probed.join(assigned, "centroid_id")
        .where(F.col("q_id") != F.col("neighbor_id"))
        .dropDuplicates(["q_id", "neighbor_id"])
    )
    sim = F.round(cosine(F.col("q_vec"), F.col("c_vec")), 4)
    w = Window.partitionBy("q_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        cand.select("q_id", "neighbor_id", sim.alias("sim"))
        .withColumn("rank", F.row_number().over(w).cast("bigint"))
        .where(F.col("rank") <= k)
    )


# --------------------------------------------------------------------------
# Product quantization (PQ) — the compressed-scan ANN path
# --------------------------------------------------------------------------


def _train_pq_codebooks(
    corpus: DataFrame,
    vec_col: str,
    id_col: str,
    m: int,
    ks: int,
    train_n: int = 256,
    iters: int = 8,
) -> list[list[list[float]]]:
    """Train one ``ks``-entry codebook per subspace on a deterministic
    hash-ordered sample, driver-side (the FAISS practice: codebooks are
    metadata learned from a bounded sample, never from the full
    corpus). Vectors are L2-normalized before training so PQ's L2
    distances order identically to cosine."""
    rows = (
        corpus.orderBy(F.xxhash64(F.col(id_col)), F.col(id_col))
        .limit(train_n)
        .select(F.col(vec_col).alias("v"))
        .collect()
    )
    x = np.asarray([r.v for r in rows], dtype=np.float64)
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    dim = x.shape[1]
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    d = dim // m
    books: list[list[list[float]]] = []
    for j in range(m):
        sub = x[:, j * d : (j + 1) * d]
        cents = sub[: min(ks, len(sub))].copy()
        for _ in range(iters):
            d2 = ((sub[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
            assign = d2.argmin(axis=1)
            for c in range(len(cents)):
                members = sub[assign == c]
                if len(members):
                    cents[c] = members.mean(axis=0)
        books.append(cents.tolist())
    return books


def _sq_l2(a: Column, lit_vec: list[float]) -> Column:
    diff = F.zip_with(
        a,
        F.array(*[F.lit(float(v)) for v in lit_vec]),
        lambda p, q: (p - q) * (p - q),
    )
    return F.aggregate(diff, F.lit(0.0), lambda acc, v: acc + v)


def _pq_normed_matrix(s: pd.Series) -> np.ndarray:
    x = np.asarray([np.asarray(v, dtype=np.float64) for v in s])
    return x / np.linalg.norm(x, axis=1, keepdims=True)


def _pq_udfs(books_np: list[np.ndarray], d: int):
    """Arrow-batched encoder (nearest code per subspace) and per-query
    LUT builder (distance to every codebook entry), closed over the
    trained codebooks."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("array<int>")
    def encode_codes(s: pd.Series) -> pd.Series:
        x = _pq_normed_matrix(s)
        cols = []
        for j, cents in enumerate(books_np):
            sub = x[:, j * d : (j + 1) * d]
            d2 = ((sub[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
            cols.append(d2.argmin(axis=1))
        return pd.Series(list(np.stack(cols, axis=1)))

    @pandas_udf("array<double>")
    def build_lut(s: pd.Series) -> pd.Series:
        x = _pq_normed_matrix(s)
        blocks = []
        for j, cents in enumerate(books_np):
            sub = x[:, j * d : (j + 1) * d]
            blocks.append(((sub[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2))
        return pd.Series(list(np.concatenate(blocks, axis=1)))

    return encode_codes, build_lut


def _adc(m: int, ks: int) -> Column:
    """Asymmetric distance: sum of m LUT lookups (JVM-side) over the
    `lut` (query) and `codes` (corpus) columns."""
    expr = F.lit(0.0)
    for j in range(m):
        expr = expr + F.element_at(
            F.col("lut"), (F.lit(j * ks) + F.element_at(F.col("codes"), j + 1) + 1)
        )
    return expr


def pq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    m: int = 16,
    ks: int = 32,
    rerank_factor: int = 8,
) -> DataFrame:
    """Product-quantization ANN with asymmetric distance + exact
    re-rank.

    The 100 TB story: the corpus is *compressed once* — each vector
    becomes ``m`` codebook indices (64 f32 → 8 bytes here), so the
    scan side shrinks ~32× and the per-pair distance is ``m`` table
    lookups instead of a ``dim``-wide dot product. Codebooks (m × ks ×
    dim/m doubles) are metadata: trained driver-side on a hash-ordered
    sample, inlined as literals — encoding is a pure JVM map stage, no
    shuffle of vectors. Queries carry a per-query lookup table (LUT) of
    distances to every codebook entry; the ADC scan ranks candidates
    by summed LUT entries, and the top ``rerank_factor·k`` are re-ranked
    with the exact cosine against the raw vectors (a semi-join-sized
    fetch), so reported sims are exact. Composes with :func:`ivf_topk`'s
    coarse quantizer for IVF-PQ (probe lists first, ADC within lists).

    Normalization makes L2 order ≡ cosine order (‖a−b‖² = 2−2·cos for
    unit vectors), so recall is measured against the cosine baseline.

    Encoding and LUT construction are Arrow-batched pandas UDFs over
    numpy (one argmin over a (batch, ks) distance matrix per
    subspace) — per-ROW work, vectorized, linear in corpus size. A
    pure-expression encoding was measured and rejected: m·ks literal
    centroid folds blow up whole-stage codegen compile time
    quadratically in the codebook size. The per-PAIR hot path (the
    ADC scan, the only O(|q|·|corpus|) stage) stays JVM-side: m
    ``element_at`` lookups per pair.
    """
    books = _train_pq_codebooks(corpus, vec_col, id_col, m=m, ks=ks)
    books_np = [np.asarray(b, dtype=np.float64) for b in books]
    d = len(books[0][0])
    encode_codes, build_lut = _pq_udfs(books_np, d)

    enc = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        encode_codes(F.col(vec_col)).alias("codes"),
    )
    q = queries.select(
        F.col(id_col).alias("q_id"),
        F.col(vec_col).alias("q_vec"),
        build_lut(F.col(vec_col)).alias("lut"),
    )

    adc = _adc(m, ks)
    w_adc = Window.partitionBy("q_id").orderBy(F.asc("adc"), F.asc("neighbor_id"))
    shortlist = (
        F.broadcast(q)
        .crossJoin(enc)
        .where(F.col("q_id") != F.col("neighbor_id"))
        .select("q_id", "q_vec", "neighbor_id", adc.alias("adc"))
        .withColumn("_r", F.row_number().over(w_adc))
        .where(F.col("_r") <= rerank_factor * k)
    )
    raw = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec")
    )
    sim = F.round(cosine(F.col("q_vec"), F.col("c_vec")), 4)
    w = Window.partitionBy("q_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        shortlist.join(raw, "neighbor_id")
        .select("q_id", "neighbor_id", sim.alias("sim"))
        .withColumn("rank", F.row_number().over(w).cast("bigint"))
        .where(F.col("rank") <= k)
        .select("q_id", "rank", "neighbor_id", "sim")
    )


def ivf_pq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_centroids: int = 16,
    nprobe: int = 4,
    m: int = 16,
    ks: int = 32,
    rerank_factor: int = 8,
) -> DataFrame:
    """IVF-PQ: the composition that serves web-scale ANN — a coarse
    quantizer prunes which inverted lists each query visits
    (:func:`ivf_topk`'s shape), and within the visited lists the scan
    is PQ-compressed asymmetric distance (:func:`pq_topk`'s shape).

    Scale accounting vs either alone: candidate generation is an
    EQUI-join on centroid_id (≈ nprobe/n_centroids of the corpus per
    query, shuffled by list id), and each visited row costs m LUT
    lookups on an ~32x-smaller encoded table; the raw vectors are
    touched only for the final rerank_factor·k exact re-rank per
    query. This variant encodes raw (normalized) vectors rather than
    residuals — residual encoding slots into the same plan by
    subtracting the assigned centroid inside the encode/LUT UDFs.
    """
    books = _train_pq_codebooks(corpus, vec_col, id_col, m=m, ks=ks)
    books_np = [np.asarray(b, dtype=np.float64) for b in books]
    d = len(books[0][0])
    encode_codes, build_lut = _pq_udfs(books_np, d)

    # coarse quantizer: deterministic hash-sampled centroids (ivf_topk)
    stride = max(1, corpus.count() // n_centroids)
    centroid_rows = (
        corpus.where(F.pmod(F.xxhash64(F.col(id_col)), F.lit(stride)) == 0)
        .orderBy(id_col)
        .limit(n_centroids)
        .select(F.col(id_col).alias("centroid_id"), F.col(vec_col).alias("centroid"))
        .collect()
    )

    def _scored_array(vec: Column) -> Column:
        entries = [
            F.struct(
                cosine(vec, F.array(*[F.lit(float(v)) for v in r.centroid])).alias(
                    "csim"
                ),
                F.lit(r.centroid_id).alias("centroid_id"),
            )
            for r in centroid_rows
        ]
        return F.array(*entries)

    enc = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.array_max(_scored_array(F.col(vec_col)))["centroid_id"].alias(
            "centroid_id"
        ),
        encode_codes(F.col(vec_col)).alias("codes"),
    )
    probed = queries.select(
        F.col(id_col).alias("q_id"),
        F.col(vec_col).alias("q_vec"),
        build_lut(F.col(vec_col)).alias("lut"),
        F.explode(
            F.slice(
                F.reverse(F.array_sort(_scored_array(F.col(vec_col)))),
                1,
                nprobe,
            )["centroid_id"]
        ).alias("centroid_id"),
    )
    w_adc = Window.partitionBy("q_id").orderBy(F.asc("adc"), F.asc("neighbor_id"))
    shortlist = (
        probed.join(enc, "centroid_id")
        .where(F.col("q_id") != F.col("neighbor_id"))
        .select("q_id", "q_vec", "neighbor_id", _adc(m, ks).alias("adc"))
        .withColumn("_r", F.row_number().over(w_adc))
        .where(F.col("_r") <= rerank_factor * k)
    )
    raw = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec")
    )
    sim = F.round(cosine(F.col("q_vec"), F.col("c_vec")), 4)
    w = Window.partitionBy("q_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        shortlist.join(raw, "neighbor_id")
        .select("q_id", "neighbor_id", sim.alias("sim"))
        .withColumn("rank", F.row_number().over(w).cast("bigint"))
        .where(F.col("rank") <= k)
        .select("q_id", "rank", "neighbor_id", "sim")
    )


# --------------------------------------------------------------------------
# Persisted ANN index: build once, query many
# --------------------------------------------------------------------------


def build_pq_index(
    corpus: DataFrame,
    path: str,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    m: int = 16,
    ks: int = 32,
    train_on: DataFrame | None = None,
) -> None:
    """Materialize the PQ index: codebooks (metadata JSON) + the
    encoded corpus (parquet of id, codes). The expensive parts —
    codebook training and corpus encoding — happen ONCE; queries then
    touch only the ~32x-smaller encoded table plus a raw-vector
    lookup for the re-rank shortlist. This is the production shape:
    the index is data, not session state, so any later job (or
    engine) can load it.

    ``train_on`` optionally trains the codebooks on a different table
    than the one encoded (the FAISS practice — codebooks are stable
    sample statistics of the distribution; the corpus that gets
    encoded keeps growing). This is also what makes
    :func:`upsert_pq_index` equivalence testable: build on the full
    corpus with ``train_on`` pinned to the original sample, and the
    incremental path must produce the identical codes table."""
    import json
    import os

    books = _train_pq_codebooks(
        train_on if train_on is not None else corpus,
        vec_col, id_col, m=m, ks=ks,
    )
    books_np = [np.asarray(b, dtype=np.float64) for b in books]
    d = len(books[0][0])
    encode_codes, _ = _pq_udfs(books_np, d)
    os.makedirs(path, exist_ok=True)
    corpus.select(
        F.col(id_col).alias("neighbor_id"),
        encode_codes(F.col(vec_col)).alias("codes"),
    ).write.mode("overwrite").parquet(os.path.join(path, "codes.parquet"))
    with open(os.path.join(path, "codebooks.json"), "w") as f:
        json.dump({"m": m, "ks": ks, "d": d, "books": books}, f)


def upsert_pq_index(
    spark,
    delta: DataFrame,
    path: str,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> dict:
    """Incremental maintenance of a persisted PQ index
    (:func:`build_pq_index`) WITHOUT retraining codebooks: encode the
    delta vectors with the index's existing codebooks, then MERGE
    them into codes.parquet through the engine's own upsert operator
    (U4, ``operators/merge.merge_upsert``) — new ids insert, changed
    ids replace, identical re-encodes are detected and skipped.

    Contracts (both unit-tested):

    - **equivalence**: after upserting delta D into an index built on
      corpus C, codes.parquet is IDENTICAL to a full rebuild over
      C ∪ D with ``train_on=C`` — encoding is a pure function of
      (codebooks, vector), so incremental == batch;
    - **rerun-is-empty** (the J4 idempotency pattern): re-running the
      same upsert reports {inserted: 0, updated: 0} and leaves the
      files untouched (no rewrite at all when nothing changed).

    Scale shape: the delta is encoded map-side (Arrow-batched pandas
    UDF over only the delta), the change classification is one
    left join of delta against the codes table on the index key, and
    the rewrite is the merged table — a compaction-style full rewrite,
    which at 100 TB becomes a partition-scoped rewrite once
    codes.parquet is partitioned by id bucket (same recipe as the S10
    disjoint-region sink). Returns {"inserted", "updated",
    "unchanged"} counts.
    """
    import json
    import os
    import shutil

    with open(os.path.join(path, "codebooks.json")) as f:
        meta = json.load(f)
    books_np = [np.asarray(b, dtype=np.float64) for b in meta["books"]]
    encode_codes, _ = _pq_udfs(books_np, meta["d"])

    codes_path = os.path.join(path, "codes.parquet")
    base = spark.read.parquet(codes_path)
    enc_delta = delta.select(
        F.col(id_col).alias("neighbor_id"),
        encode_codes(F.col(vec_col)).alias("codes"),
    )
    cls = (
        enc_delta.alias("d")
        .join(
            base.select(
                "neighbor_id", F.col("codes").alias("_old")
            ).alias("b"),
            "neighbor_id",
            "left",
        )
        .select(
            F.when(F.col("_old").isNull(), F.lit("inserted"))
            .when(F.col("_old") != F.col("codes"), F.lit("updated"))
            .otherwise(F.lit("unchanged"))
            .alias("_cls")
        )
        .groupBy("_cls")
        .count()
        .collect()
    )
    stats = {"inserted": 0, "updated": 0, "unchanged": 0}
    stats.update({r["_cls"]: r["count"] for r in cls})
    if stats["inserted"] == 0 and stats["updated"] == 0:
        return stats  # rerun-is-empty: nothing to write, files untouched

    from flytemosaic_spark.operators.merge import merge_upsert

    merged = merge_upsert(base, enc_delta, ["neighbor_id"]).drop("_action")
    tmp = codes_path + ".upsert-tmp"
    # deterministic layout so incremental == batch byte-for-byte at
    # the row level regardless of upsert order
    merged.repartition(1).sortWithinPartitions("neighbor_id").write.mode(
        "overwrite"
    ).parquet(tmp)
    shutil.rmtree(codes_path)
    os.replace(tmp, codes_path)
    return stats


def pq_index_topk(
    spark,
    path: str,
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    rerank_factor: int = 8,
) -> DataFrame:
    """Query a persisted PQ index (see :func:`build_pq_index`).
    ``corpus`` supplies only the raw vectors for the exact re-rank of
    the ADC shortlist — a key-lookup-sized read, prunable to the
    shortlist ids."""
    import json
    import os

    with open(os.path.join(path, "codebooks.json")) as f:
        meta = json.load(f)
    m, ks, d = meta["m"], meta["ks"], meta["d"]
    books_np = [np.asarray(b, dtype=np.float64) for b in meta["books"]]
    _, build_lut = _pq_udfs(books_np, d)

    enc = spark.read.parquet(os.path.join(path, "codes.parquet"))
    q = queries.select(
        F.col(id_col).alias("q_id"),
        F.col(vec_col).alias("q_vec"),
        build_lut(F.col(vec_col)).alias("lut"),
    )
    w_adc = Window.partitionBy("q_id").orderBy(F.asc("adc"), F.asc("neighbor_id"))
    shortlist = (
        F.broadcast(q)
        .crossJoin(enc)
        .where(F.col("q_id") != F.col("neighbor_id"))
        .select("q_id", "q_vec", "neighbor_id", _adc(m, ks).alias("adc"))
        .withColumn("_r", F.row_number().over(w_adc))
        .where(F.col("_r") <= rerank_factor * k)
    )
    raw = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec")
    )
    sim = F.round(cosine(F.col("q_vec"), F.col("c_vec")), 4)
    w = Window.partitionBy("q_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        shortlist.join(raw, "neighbor_id")
        .select("q_id", "neighbor_id", sim.alias("sim"))
        .withColumn("rank", F.row_number().over(w).cast("bigint"))
        .where(F.col("rank") <= k)
        .select("q_id", "rank", "neighbor_id", "sim")
    )


def standard_scale_long(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Per-dimension standardization (z = (x − μ_d)/σ_d) of an
    embedding column, in long form (id, dim, zval) — the feature-
    scaling pass before distance-based retrieval or clustering treats
    all dimensions equally.

    Physical shape: posexplode once; the per-dimension moment table is
    dimension-cardinality (64 rows for a 64-d embedding) regardless of
    corpus size, so it broadcasts back onto the exploded rows — never
    a window partitioned by dim, which would funnel the whole corpus
    through |dims| partitions. Moments are rounded at 1e-6 before the
    division so the z-values reproduce bit-for-bit across engines
    (mean/stddev summation order differs; true discrepancy ~1e-15).
    """
    from flytemosaic_spark.operators.text import portable_round

    ex = df.select(
        F.col(id_col),
        F.posexplode(F.col(vec_col).cast("array<double>")).alias("dim0", "val"),
    ).select(id_col, (F.col("dim0") + 1).alias("dim"), "val")
    moments = ex.groupBy("dim").agg(
        portable_round(F.avg("val"), 6).alias("_mu"),
        portable_round(F.stddev_pop("val"), 6).alias("_sigma"),
    )
    z = (F.col("val") - F.col("_mu")) / F.col("_sigma")
    return ex.join(F.broadcast(moments), "dim").select(
        id_col, "dim", portable_round(z).alias("zval")
    )


def hard_negatives(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 3,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    label_col: str = "label",
    round_digits: int | None = 4,
) -> DataFrame:
    """Hard-negative mining: per query, the top-k most similar corpus
    vectors carrying a DIFFERENT label (contrastive-training negatives
    that the model is most likely to confuse).

    Same physical shape as :func:`brute_force_topk` — broadcast query
    side, one narrow corpus scan — but the cross-label predicate is
    applied below the ranking window, so same-label rows never enter
    the per-query sort. At scale the same predicate composes with the
    IVF/PQ candidate generators (filter the candidate list, then
    re-rank).
    """
    parallelism = corpus.sparkSession.sparkContext.defaultParallelism
    q = queries.select(
        F.col(id_col).alias("q_id"),
        F.col(label_col).alias("q_label"),
        F.col(vec_col).alias("q_vec"),
        norm(F.col(vec_col)).alias("q_norm"),
    )
    c = corpus.repartition(parallelism).select(
        F.col(id_col).alias("neighbor_id"),
        F.col(label_col).alias("n_label"),
        F.col(vec_col).alias("c_vec"),
        norm(F.col(vec_col)).alias("c_norm"),
    )
    sim = dot(F.col("q_vec"), F.col("c_vec")) / (F.col("q_norm") * F.col("c_norm"))
    if round_digits is not None:
        sim = F.round(sim, round_digits)
    scored = (
        F.broadcast(q)
        .crossJoin(c)
        .where(F.col("q_label") != F.col("n_label"))
        .select("q_id", "neighbor_id", sim.alias("sim"))
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .where(F.col("rank") <= k)
        .select("q_id", "rank", "neighbor_id", "sim")
    )


def pca_power_component(
    emb: DataFrame,
    vec_col: str = "embedding",
    n_dim: int = 64,
    iterations: int = 3,
) -> DataFrame:
    """Top principal component by power iteration over the covariance
    matrix, fully declarative and engine-portable.

    Determinism: components quantize once to integer micro-units
    (floor(v*1e6+0.5)), so every covariance moment is an EXACT integer
    sum on any engine/partitioning; the covariance cell is then a
    fixed sequence of IEEE ops on exact integers — bit-identical
    everywhere, no rounding grain needed. Each iteration's mat-vec and
    normalized vector round half-up at 1e-10 (the pagerank idiom) so
    the 64-term float sums can't drift across engines.

    Scale shape: the dims x dims moment aggregate is ONE pass over the
    vectors (map-side dim-pair flatten, hash-agg state = dims^2 cells
    regardless of corpus size — the x96_cov_matrix plan); iterations
    then run on the cached dims^2 table with a broadcast dims-row
    vector, so per-iteration cost is independent of the corpus.
    Returns (dim, loading, eigenvalue).
    """
    idx = F.sequence(F.lit(1), F.lit(n_dim))
    qv = F.transform(
        F.col(vec_col),
        lambda v: F.floor(v.cast("double") * 1000000 + F.lit(0.5)).cast(
            "bigint"
        ),
    )
    pairs = F.flatten(
        F.transform(
            idx,
            lambda i: F.transform(
                idx,
                lambda j: F.struct(
                    i.alias("i"),
                    j.alias("j"),
                    (
                        F.element_at("_qv", i) * F.element_at("_qv", j)
                    ).alias("pp"),
                ),
            ),
        )
    )
    cells = (
        emb.select(qv.alias("_qv"))
        .select(F.explode(pairs).alias("c"))
        .select("c.i", "c.j", "c.pp")
    )
    second = cells.groupBy("i", "j").agg(
        F.sum("pp").alias("s"), F.count("*").alias("n")
    )
    first = (
        emb.select(F.posexplode(qv).alias("p0", "q"))
        .select((F.col("p0") + 1).alias("d"), "q")
        .groupBy("d")
        .agg(F.sum("q").alias("m"))
    )
    mi = first.select(F.col("d").alias("i"), F.col("m").alias("m_i"))
    mj = first.select(F.col("d").alias("j"), F.col("m").alias("m_j"))
    cov = (
        second.join(F.broadcast(mi), "i")
        .join(F.broadcast(mj), "j")
        .select(
            "i",
            "j",
            (
                (
                    F.col("s") / F.col("n")
                    - (F.col("m_i") / F.col("n")) * (F.col("m_j") / F.col("n"))
                )
                / F.lit(1.0e12)
            ).alias("c"),
        )
        .cache()
    )

    def _round10(c: Column) -> Column:
        return F.floor(c * F.lit(1.0e10) + F.lit(0.5)) / F.lit(1.0e10)

    spark = emb.sparkSession
    v = spark.range(1, n_dim + 1).select(
        F.col("id").cast("int").alias("j"), F.lit(0.125).alias("v")
    )
    eig = None
    for _ in range(iterations):
        u = (
            cov.join(F.broadcast(v), "j")
            .groupBy("i")
            .agg(_round10(F.sum(F.col("c") * F.col("v"))).alias("u"))
            # dims-row state; eager truncation keeps each broadcast
            # below from re-executing the previous iterations' chains
            .localCheckpoint()
        )
        nrm = u.agg(F.sqrt(F.sum(F.col("u") * F.col("u"))).alias("nrm"))
        # zero-variance input => norm 0: keep the zero vector instead
        # of dividing (ANSI mode throws on x/0). Branch is on a value
        # identical across engines, so the oracle's CASE matches.
        v = u.crossJoin(F.broadcast(nrm)).select(
            F.col("i").alias("j"),
            F.when(
                F.col("nrm") > 0, _round10(F.col("u") / F.col("nrm"))
            )
            .otherwise(F.lit(0.0))
            .alias("v"),
        )
        eig = nrm
    from flytemosaic_spark.operators.text import portable_round

    return v.crossJoin(F.broadcast(eig)).select(
        F.col("j").cast("bigint").alias("dim"),
        F.col("v").alias("loading"),
        portable_round(F.col("nrm"), 6).alias("eigenvalue"),
    )


def semdedup_report(
    corpus: DataFrame,
    anchors: DataFrame,
    threshold: float = 0.30,
    pair_buckets: int = 8,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """SemDeDup-shaped semantic dedup report: assign every vector to
    its nearest anchor (broadcast — the anchor set must be node-scale),
    then run the exact pairwise cosine ONLY within clusters; a member
    is "dropped" when any lower-id cluster-mate is >= ``threshold``
    cosine. Returns (cluster_id, n_members, n_dup_pairs, n_dropped).

    THE SCALE KNOB IS THE ANCHOR COUNT: intra-cluster pair work is
    sum(block²), so anchors must grow with the corpus to keep blocks
    bounded (k ≈ N / target_block; k = sqrt(N) balances assignment
    N·k against pair work N²/k at ~2·N^1.5 total).

    Both dense stages run as numpy GEMMs over Arrow batches — this is
    exactly the workload Catalyst expression folds are worst at (the
    fold form spent ~4 s per stage at 30× sf0.1; the gemm runs it in
    milliseconds and took the 30× sweep line from 4.4× to ~flat):

    - assignment: ``mapInPandas`` computes (batch × dim)·(dim × k)
      against the anchor matrix (a spark broadcast of k·dim floats —
      node-scale by the same contract the IVF/PQ operators use), then
      argmax with (sim DESC, aid ASC) tie order;
    - pair stage: ``applyInPandas`` per cluster computes the block's
      pair cosines in row CHUNKS (bounded memory even if a cluster
      outgrows sqrt(N)) and emits the per-cluster report row — one
      N-row shuffle, parallelism = |clusters|, no bucket replication.

    ``pair_buckets`` is retained for API compatibility; the chunked
    gemm supersedes it.

    Determinism: sims round at 1e-4 before ranking/thresholding (the
    x3 recipe), so the report replays exactly in a SQL oracle.
    """
    import pandas as pd

    spark = corpus.sparkSession
    emb = corpus.select(id_col, vec_col)
    a_rows = anchors.select(id_col, vec_col).collect()  # k·dim, node-scale
    if not a_rows:
        return spark.createDataFrame(
            [],
            "cluster_id bigint, n_members bigint, "
            "n_dup_pairs bigint, n_dropped bigint",
        )
    a_ids = np.array([r[0] for r in a_rows], dtype=np.int64)
    a_mat = np.array([list(r[1]) for r in a_rows], dtype=np.float64)
    order = np.argsort(a_ids)  # argmax picks FIRST max → lowest aid
    a_ids, a_mat = a_ids[order], a_mat[order]
    b_anchors = spark.sparkContext.broadcast((a_ids, a_mat))

    vec_type = emb.schema[vec_col].dataType.simpleString()

    def assign(it):
        ids, amat = b_anchors.value
        an = np.linalg.norm(amat, axis=1)
        for pdf in it:
            if not len(pdf):
                continue
            v = np.asarray(pdf[vec_col].tolist(), dtype=np.float64)
            vn = np.linalg.norm(v, axis=1)
            sims = np.round((v @ amat.T) / (vn[:, None] * an[None, :]), 4)
            best = sims.argmax(axis=1)
            yield pd.DataFrame(
                {
                    "mid": pdf[id_col].values,
                    "cluster_id": ids[best],
                    "m_vec": pdf[vec_col].values,
                }
            )

    members = emb.mapInPandas(
        assign, f"mid bigint, cluster_id bigint, m_vec {vec_type}"
    )

    def pair_report(key, pdf):
        ids = pdf["mid"].to_numpy(dtype=np.int64)
        o = np.argsort(ids)
        ids = ids[o]
        v = np.asarray(pdf["m_vec"].to_numpy()[o].tolist(), dtype=np.float64)
        vn = np.linalg.norm(v, axis=1)
        n = len(ids)
        n_pairs = 0
        dropped = np.zeros(n, dtype=bool)
        chunk = 1024  # bounds the sims slab at chunk × n doubles
        for lo in range(0, n, chunk):
            hi = min(lo + chunk, n)
            sims = np.round(
                (v[lo:hi] @ v.T) / (vn[lo:hi, None] * vn[None, :]), 4
            )
            # upper triangle only: columns j > global row index i
            cols = np.arange(n)[None, :] > np.arange(lo, hi)[:, None]
            hit = (sims >= threshold) & cols
            n_pairs += int(hit.sum())
            dropped |= hit.any(axis=0)
        return pd.DataFrame(
            [
                {
                    "cluster_id": int(key[0]),
                    "n_members": n,
                    "n_dup_pairs": n_pairs,
                    "n_dropped": int(dropped.sum()),
                }
            ]
        )

    return members.groupBy("cluster_id").applyInPandas(
        pair_report,
        "cluster_id bigint, n_members bigint, "
        "n_dup_pairs bigint, n_dropped bigint",
    )


def maxsim_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 3,
    n_tokens: int = 8,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    round_digits: int = 4,
) -> DataFrame:
    """ColBERT-style late-interaction retrieval: treat each stored
    vector as ``n_tokens`` contiguous sub-vectors ("token embeddings")
    and score a (query, doc) pair as

        score = sum over query tokens of max over doc tokens of
                <q_token, d_token>

    — the MaxSim operator (Khattab & Zaharia, SIGIR 2020). Multi-vector
    scoring is what single-vector cosine can't express: a query token
    matches its best counterpart in the document independently.

    Plan shape: query tokens are a constant-size broadcast (|Q| x
    n_tokens rows); the corpus explodes to n_tokens rows per doc (a
    narrow stage), the broadcast-nested-loop scoring stage computes one
    JVM-side dot per (q_token, d_token), and two partial-aggregating
    groupBys realize the max-then-sum. Ranking shuffles only (q, doc,
    score) triples. At retrieval scale the corpus side is first pruned
    by an ANN pass (ivf_topk / pq_topk) and MaxSim re-ranks the
    candidates — this operator IS that re-ranker; here it runs over
    the full corpus to stay oracle-checkable.

    Token dots are rounded half-up before the max (id-tiebreak-free:
    max over values only) and the summed score re-rounded before the
    rank, the engine's standard move for reproducible float ranking.
    """
    q = queries.select(
        F.col(id_col).alias("q_id"), F.col(vec_col).cast("array<double>").alias("qv")
    )
    c = corpus.select(
        F.col(id_col).alias("doc_id"), F.col(vec_col).cast("array<double>").alias("dv")
    )

    # token arrays: transform over the 0..n_tokens-1 index sequence,
    # sub-vector width derived from the stored dimension
    def token_array(col_name: str) -> Column:
        w = (F.size(col_name) / n_tokens).cast("int")
        return F.transform(
            F.sequence(F.lit(0), F.lit(n_tokens - 1)),
            lambda i: F.slice(F.col(col_name), i * w + 1, w),
        )

    q_tok = q.select(
        "q_id", F.posexplode(token_array("qv")).alias("qt", "q_tok")
    )
    d_tok = c.select(
        "doc_id", F.posexplode(token_array("dv")).alias("dt", "d_tok")
    )
    scored = (
        F.broadcast(q_tok)
        .crossJoin(d_tok)
        .select(
            "q_id",
            "doc_id",
            "qt",
            F.round(dot(F.col("q_tok"), F.col("d_tok")), round_digits).alias(
                "_tdot"
            ),
        )
    )
    per_qtok = scored.groupBy("q_id", "doc_id", "qt").agg(
        F.max("_tdot").alias("_best")
    )
    pair = per_qtok.groupBy("q_id", "doc_id").agg(
        F.round(F.sum("_best"), round_digits).alias("score")
    )
    w_rank = Window.partitionBy("q_id").orderBy(
        F.desc("score"), F.asc("doc_id")
    )
    return (
        pair.where(F.col("q_id") != F.col("doc_id"))
        .withColumn("rank", F.row_number().over(w_rank).cast("bigint"))
        .where(F.col("rank") <= k)
        .select("q_id", "rank", "doc_id", "score")
    )
