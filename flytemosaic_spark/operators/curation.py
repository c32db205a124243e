"""End-to-end corpus curation: the composition a training-data team
actually runs, as one operator.

    quality gate (repetition filters)
      → exact dedup (content-hash keeper)
        → near-dup dedup (Jaccard pairs → connected components → keeper)
          → deterministic split assignment

Every stage is one of this engine's operators; the composition stays
declarative except the component iterations, so Catalyst fuses the
quality filter + hash keeper + shingling into the same scan pipeline.
Scale notes live with each stage's operator; nothing here adds a
shuffle beyond what the stages themselves need.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from flytemosaic_spark.operators.dedup import (
    connected_components,
    ngram_jaccard_pairs,
)
from flytemosaic_spark.operators.sampling import split_assign
from flytemosaic_spark.operators.text import repetition_stats


def curate(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    jaccard_threshold: float = 0.5,
) -> DataFrame:
    """Documents that survive curation, tagged with their split.

    Keeper rules are deterministic: min id per content hash, then min
    id per near-dup component — so re-runs (and the SQL oracle)
    reproduce the exact survivor set.
    """
    # 1. quality gate — Gopher-style repetition filters
    rep = repetition_stats(docs, text_col=text_col, id_col=id_col)
    qual = docs.join(
        rep.where(F.col("keep")).select(F.col("doc_id").alias(id_col)),
        id_col,
        "left_semi",
    )
    # 2. exact dedup — min id per content hash survives. The keeper
    # ids already passed the quality gate, so this ONE aggregate IS
    # the stage-2 survivor set; it is localCheckpointed because three
    # downstream subplans reference it (shingle pairs, the final
    # survivor join, and the component seed) — without the barrier
    # each reference re-executes the whole tokenize+stats chain (the
    # x191 rule; measured 7.8s -> ~3.5s at sf0.1). The materialized
    # state is ONE bigint column — ~0.01% of corpus bytes at any
    # scale, distributed across executors.
    q2_ids = (
        qual.groupBy(F.md5(F.col(text_col)).alias("_h"))
        .agg(F.min(id_col).alias(id_col))
        .drop("_h")
        .localCheckpoint()
    )
    q2 = docs.join(q2_ids, id_col, "left_semi")
    # 3. near-dup dedup — component representative (min id) survives
    pairs = ngram_jaccard_pairs(
        q2, text_col=text_col, id_col=id_col, threshold=jaccard_threshold
    )
    comp = connected_components(pairs, src="id_a", dst="id_b")
    q3 = (
        q2.join(comp.withColumnRenamed("node", id_col), id_col, "left")
        .where(F.coalesce(F.col("lbl"), F.col(id_col)) == F.col(id_col))
        .drop("lbl")
    )
    # 4. stable split tags on the survivor set
    return split_assign(q3, key_col=id_col)
