"""Catalog-style statistics for cost-based plan selection.

Spark's own CBO reads table statistics that ANALYZE computed once; it
never re-scans at plan time. This module is the same contract in
miniature: a stat is one cheap narrow aggregate, computed on first
use per cache key (the dataset path) and memoized — in process memory
AND as a content-addressed JSON file under the D2-style stats cache
directory (``$SPARK_GRAFT_STATS_DIR``, default
``<tmpdir>/flytemosaic_stats_cache``), so a NEW process on the same
host reuses the stat without re-scanning (the reference's
``@task(cache=True)`` persistence contract, reference
flyte/build.py:30-37). Operators with more than one physical plan
(see ``operators/recsys.cooccur_topk``) read the stat and pick;
queries on the same immutable dataset never pay the scan twice.

The memo key is caller-supplied (probes pass the sf directory) plus
the basket column — datasets under a path are immutable in this
engine's testbed, exactly like a lake table version; bump
``_STATS_VERSION`` when the stat definition changes (the
``cache_version`` knob). Writes are temp-file + atomic rename, so
concurrent producers are safe (last write wins, identical content).
"""

from __future__ import annotations

import hashlib
import json
import os
import tempfile

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_BASKET_STATS: dict[str, dict[str, int]] = {}
_STATS_VERSION = "2"  # v2: added the `triples` moment


def _stats_dir() -> str:
    return os.environ.get(
        "SPARK_GRAFT_STATS_DIR",
        os.path.join(tempfile.gettempdir(), "flytemosaic_stats_cache"),
    )


def _stats_path(key: str) -> str:
    h = hashlib.md5(key.encode()).hexdigest()
    return os.path.join(_stats_dir(), f"basket-{h}.json")


def basket_pair_stats(
    df: DataFrame, order_col: str, cache_key: str | None = None
) -> dict[str, int]:
    """Basket-size distribution moments for co-occurrence planning:

    - ``ordered_pairs`` = Σ k·(k−1) over baskets — the exact row count
      a per-basket self-join ships through its shuffle, and the exact
      struct count a basket-list expansion explodes. This is THE cost
      driver for either plan, so the crossover is a function of it.
    - ``triples`` = Σ C(k, 3) — the emission volume of a 3-itemset
      expansion (``recsys.frequent_triples`` sizes its aggregation
      parallelism from it).
    - ``n_baskets``, ``n_rows`` — for context / sanity checks.

    One single-column scan + one key-partitioned count + a 1-row
    aggregate; ~0.6 s hot at sf0.1, memoized per ``cache_key`` in
    memory and on disk (see module docstring — a second process reads
    the JSON instead of re-scanning).
    """
    key = None
    if cache_key is not None:
        key = f"v{_STATS_VERSION}:{cache_key}::{order_col}"
        if key in _BASKET_STATS:
            return _BASKET_STATS[key]
        path = _stats_path(key)
        if os.path.exists(path):
            try:
                with open(path) as f:
                    stats = {k: int(v) for k, v in json.load(f).items()}
            except (ValueError, OSError):
                pass  # torn/corrupt cache file: recompute and rewrite
            else:
                _BASKET_STATS[key] = stats
                return stats
    k = F.col("k")
    row = (
        df.select(order_col)
        .groupBy(order_col)
        .agg(F.count("*").alias("k"))
        .agg(
            F.sum(k * (k - 1)).alias("ordered_pairs"),
            F.sum(
                F.when(k >= 3, k * (k - 1) * (k - 2) / 6).otherwise(F.lit(0))
            )
            .cast("bigint")
            .alias("triples"),
            F.count("*").alias("n_baskets"),
            F.sum("k").alias("n_rows"),
        )
        .first()
    )
    stats = {
        "ordered_pairs": int(row["ordered_pairs"] or 0),
        "triples": int(row["triples"] or 0),
        "n_baskets": int(row["n_baskets"] or 0),
        "n_rows": int(row["n_rows"] or 0),
    }
    if key is not None:
        _BASKET_STATS[key] = stats
        d = _stats_dir()
        os.makedirs(d, exist_ok=True)
        path = _stats_path(key)
        tmp = f"{path}.tmp-{os.getpid()}"
        with open(tmp, "w") as f:
            json.dump(stats, f)
        os.replace(tmp, path)
    return stats
