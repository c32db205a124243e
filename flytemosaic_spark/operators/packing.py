"""Sequence packing: lay documents end-to-end into fixed-size token
windows — the step between a curated corpus and a training dataloader.

Two models, matching how real pipelines pack:

- **concat-then-chunk** (:func:`pack_sequences`): documents are
  concatenated in a deterministic order inside a bucket and the stream
  is cut every ``budget`` tokens; a document may straddle a boundary
  (the dataloader resets attention masks). Pure window math — one
  shuffle on the bucket key, integer-exact, SQL-oracle-checkable.
- **first-fit greedy** (:func:`first_fit_pack`): documents never
  straddle; each goes into the first open pack with room, else opens a
  new pack. Sequential by nature, so it runs per-bucket inside
  ``applyInPandas`` — the bucket is the unit of parallelism.

Scale shape: the bucket key is a hash of the doc id, so 100 TB packs
into ``n_buckets`` independent streams with no global sort and no
driver state; within a bucket the window sort is bounded by bucket
size (choose ``n_buckets`` ≈ corpus_tokens / (executor-memory-sized
stream)). Reference analogue: none — the reference stops at mosaic
assembly; this is the training-pipeline extension surface
(SURVEY.md §2.11).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from flytemosaic_spark.operators.text import token_count


def _bucket(id_col: str, n_buckets: int) -> F.Column:
    # md5-derived bucket: deterministic, engine-portable (no salted hash()).
    return F.conv(
        F.substring(F.md5(F.col(id_col).cast("string")), 1, 4), 16, 10
    ).cast("int") % n_buckets


def pack_sequences(
    docs: DataFrame,
    budget: int = 512,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 8,
) -> DataFrame:
    """Concat-then-chunk packing: per bucket, documents ordered by id
    form one token stream cut every ``budget`` tokens.

    Returns one row per document: its bucket, token count, the pack
    index where it starts and ends (``start_pack == end_pack`` when it
    does not straddle a cut), and its token offset inside the start
    pack. All integer arithmetic — bit-identical across engines.
    """
    w = Window.partitionBy("bucket").orderBy(id_col)
    toks = docs.select(
        F.col(id_col),
        _bucket(id_col, n_buckets).alias("bucket"),
        token_count(F.col(text_col)).cast("bigint").alias("n_tokens"),
    )
    cum = toks.withColumn(
        "_cum_incl", F.sum("n_tokens").over(w)
    ).withColumn("_cum_excl", F.col("_cum_incl") - F.col("n_tokens"))
    return cum.select(
        id_col,
        "bucket",
        "n_tokens",
        F.floor(F.col("_cum_excl") / budget).alias("start_pack"),
        F.floor((F.col("_cum_incl") - 1) / budget).alias("end_pack"),
        (F.col("_cum_excl") % budget).alias("pack_offset"),
    )


_FF_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("bucket", T.IntegerType()),
        T.StructField("n_tokens", T.LongType()),
        T.StructField("pack_id", T.LongType()),
        T.StructField("pack_offset", T.LongType()),
    ]
)


def first_fit_pack(
    docs: DataFrame,
    budget: int = 512,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 8,
) -> DataFrame:
    """First-fit greedy packing: scanning each bucket in id order, a
    document joins the first open pack with room for it, else opens a
    new pack. Documents longer than ``budget`` get a pack of their own.

    Sequential within a bucket (the classic online bin-packing loop),
    parallel across buckets via ``applyInPandas`` — state never leaves
    the executor and only (id, bucket, n_tokens) rows shuffle, never
    text.
    """
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        _bucket(id_col, n_buckets).alias("bucket"),
        token_count(F.col(text_col)).cast("bigint").alias("n_tokens"),
    )

    def pack_one_bucket(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("doc_id", ignore_index=True)
        fills: list[int] = []  # fills[p] = tokens already in pack p
        pack_ids, offsets = [], []
        for n in pdf["n_tokens"]:
            for p, fill in enumerate(fills):
                if fill + n <= budget:
                    pack_ids.append(p)
                    offsets.append(fill)
                    fills[p] = fill + n
                    break
            else:
                pack_ids.append(len(fills))
                offsets.append(0)
                fills.append(min(n, budget) if n >= budget else n)
        pdf["pack_id"] = pd.Series(pack_ids, dtype="int64")
        pdf["pack_offset"] = pd.Series(offsets, dtype="int64")
        return pdf

    return toks.groupBy("bucket").applyInPandas(pack_one_bucket, _FF_SCHEMA)
