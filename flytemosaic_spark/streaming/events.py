"""Structured Streaming surface.

The reference is strictly batch (SURVEY §2.8): its incremental
semantics are idempotent re-runs + existence anti-joins. Here those
map onto Structured Streaming's native machinery:

- :func:`stream_new_files` — a file-source stream with checkpointed
  offsets replaces the listing-scan + anti-join (J4): each run with
  ``Trigger.AvailableNow`` processes exactly the files not seen by the
  checkpoint, then stops. That *is* the reference's "re-run and skip
  what exists", with the source offset log playing the role of the
  object-store listing.
- :func:`windowed_event_counts` — tumbling windows + watermark for the
  events table (the X5 probe's streaming twin; identical plan shape,
  so the batch oracle validates the streaming result).
- :func:`sessionize_stream` — session windows with a gap timeout
  (`session_window`), watermarked for late data.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType, TimestampNTZType


def _as_event_time(df: DataFrame, ts_col: str) -> DataFrame:
    """Watermarks require TIMESTAMP; parquet event times arrive as
    TIMESTAMP_NTZ. Session tz is pinned to UTC (session.py), so the
    cast is value-preserving."""
    if isinstance(df.schema[ts_col].dataType, TimestampNTZType):
        return df.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    return df


def stream_new_files(
    spark: SparkSession,
    src_dir: str,
    schema: StructType | str,
    fmt: str = "parquet",
) -> DataFrame:
    """Incremental file ingestion: only files unseen by the checkpoint
    are processed on each AvailableNow run."""
    return spark.readStream.format(fmt).schema(schema).load(src_dir)


def windowed_event_counts(
    events: DataFrame,
    window: str = "10 minutes",
    watermark: str = "30 minutes",
    ts_col: str = "ts",
    slide: str | None = None,
) -> DataFrame:
    """Tumbling (or, with ``slide``, hopping) window counts+sums;
    works on both batch and streaming DataFrames (same Catalyst plan →
    the batch result is the oracle)."""
    events = _as_event_time(events, ts_col)
    src = events.withWatermark(ts_col, watermark) if events.isStreaming else events
    win = (
        F.window(ts_col, window, slide) if slide else F.window(ts_col, window)
    )
    return (
        src.groupBy(win.alias("w"))
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("total"))
        .select(F.col("w.start").alias("bucket"), "n", "total")
    )


def sessionize_stream(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "1 hour",
    ts_col: str = "ts",
    user_col: str = "user_id",
) -> DataFrame:
    """Session windows per user with a gap timeout — the streaming
    form of the x6 probe (batch gaps-and-islands oracle)."""
    events = _as_event_time(events, ts_col)
    src = events.withWatermark(ts_col, watermark) if events.isStreaming else events
    return (
        src.groupBy(user_col, F.session_window(ts_col, gap).alias("sw"))
        .agg(F.count("*").alias("n_events"))
        .select(user_col, F.col("sw.start").alias("session_start"), "n_events")
    )


def session_paths_stream(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "1 hour",
    max_len: int = 5,
) -> DataFrame:
    """Streaming twin of the x133 session-path miner: per closed
    session window, the first-``max_len`` event-type journey string.

    Append-mode session aggregation: ``collect_list`` state per open
    session is bounded by the session's own event count, and the
    watermark closes (and evicts) sessions ``watermark`` past their
    last event — continuous path mining with bounded state. The
    downstream heavy-hitter count is an ordinary batch/streaming
    aggregate over the emitted paths.
    """
    events = _as_event_time(events, "ts")
    src = events.withWatermark("ts", watermark) if events.isStreaming else events
    return (
        src.groupBy("user_id", F.session_window("ts", gap).alias("sw"))
        .agg(
            F.array_sort(
                F.collect_list(F.struct("ts", "event_id", "event_type"))
            ).alias("evs")
        )
        .select(
            "user_id",
            F.col("sw.start").alias("session_start"),
            F.array_join(
                F.transform(
                    F.slice("evs", 1, max_len), lambda s: s["event_type"]
                ),
                ">",
            ).alias("path"),
        )
    )


def stream_exact_dedup(
    docs: DataFrame,
    text_col: str = "text",
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming twin of the X1 exact dedup: emit each distinct content
    hash once, dropping re-arrivals across micro-batches.

    ``dropDuplicatesWithinWatermark`` keys state by the 16-byte content
    hash and evicts entries older than the watermark horizon, so state
    is bounded by (dedup window × ingest rate), not corpus size — the
    property that makes continuous-ingest dedup viable where a batch
    groupBy over the full corpus would not be. Batch DataFrames fall
    back to plain dropDuplicates (same semantics, full-corpus window),
    which is how the batch oracle validates the operator."""
    hashed = _as_event_time(docs, ts_col).withColumn(
        "content_hash", F.md5(F.col(text_col))
    )
    if not docs.isStreaming:
        return hashed.dropDuplicates(["content_hash"])
    return hashed.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        ["content_hash"]
    )


def enrich_stream(
    events: DataFrame,
    dim: DataFrame,
    on: str | list[str],
    how: str = "left",
) -> DataFrame:
    """Stream-static enrichment join: each micro-batch joins against
    the CURRENT contents of the static side — Structured Streaming
    re-evaluates the static relation per batch, so a refreshed
    dimension is picked up without restarting the query. (A path-based
    parquet relation caches its file listing; announce a rewrite with
    ``spark.catalog.refreshByPath``. Catalog-managed / Delta tables
    refresh transparently.)

    The static side is broadcast — stream-static joins cannot shuffle
    the unbounded side by the join key without unbounded state, and a
    dimension small enough to refresh per batch is small enough to
    broadcast. Stateless: no watermark needed, any output mode. Works
    identically on a batch DataFrame (same plan → batch twin is the
    oracle, see test_streaming.py)."""
    return events.join(F.broadcast(dim), on, how)


def attribute_purchases(
    events: DataFrame,
    window: str = "12 hours",
    watermark: str = "1 hour",
    ts_col: str = "ts",
    user_col: str = "user_id",
) -> DataFrame:
    """Stream-stream interval join: every purchase pairs with the same
    user's clicks from the trailing attribution ``window``.

    Streaming semantics: both sides carry a watermark and the join
    condition bounds event time on both sides, so Spark can size the
    join state to (watermark + window) and evict — the unbounded-state
    trap of stream-stream joins is the missing time bound, not the
    join itself. On a batch frame the identical plan is a plain
    interval self-join, which is how the test validates the streaming
    result row-for-row.

    Scale shape: the state store is keyed by ``user_col``; per-key
    state holds only that key's events inside the horizon. Skewed keys
    (bot users) bound the worst case, same mitigation as batch skew —
    salt or cap per-key fan-in upstream.
    """
    events = _as_event_time(events, ts_col)
    c = events.where(F.col("event_type") == "click").select(
        F.col(user_col).alias("c_user"),
        F.col(ts_col).alias("click_ts"),
        F.col("event_id").alias("click_id"),
    )
    p = events.where(F.col("event_type") == "purchase").select(
        F.col(user_col).alias("p_user"),
        F.col(ts_col).alias("purchase_ts"),
        F.col("event_id").alias("purchase_id"),
        F.col("value").alias("purchase_value"),
    )
    if events.isStreaming:
        c = c.withWatermark("click_ts", watermark)
        p = p.withWatermark("purchase_ts", watermark)
    cond = (
        (F.col("c_user") == F.col("p_user"))
        & (F.col("click_ts") <= F.col("purchase_ts"))
        & (F.col("click_ts") >= F.col("purchase_ts") - F.expr(f"interval {window}"))
    )
    return p.join(c, cond).select(
        F.col("p_user").alias(user_col),
        "purchase_id",
        "purchase_ts",
        "click_id",
        "click_ts",
        "purchase_value",
    )


def run_available_now(
    stream_df: DataFrame, checkpoint_dir: str, query_name: str
) -> None:
    """Drain everything currently available into a memory sink, then
    stop — the batch-incremental execution mode (Trigger.AvailableNow).
    Results: ``spark.sql(f"select * from {query_name}")``."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("append" if not _has_aggregation(stream_df) else "complete")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def _has_aggregation(df: DataFrame) -> bool:
    return "Aggregate" in df._jdf.queryExecution().analyzed().toString()


def stateful_user_totals(
    events: DataFrame,
    ts_col: str = "ts",
    user_col: str = "user_id",
    value_col: str = "value",
    timeout_minutes: int | None = None,
) -> DataFrame:
    """Custom stateful operator via ``applyInPandasWithState`` — the
    shape Structured Streaming's built-in aggs can't express (e.g.
    evolving per-key state with custom merge/emit rules). Maintains a
    running (n_events, total, last_ts) per user across micro-batches
    and emits the updated row for every user seen in the batch.

    The reference has no streaming at all (SURVEY §2.8); this is the
    engine's native-Spark path for incremental per-entity rollups that
    would otherwise be idempotent batch re-runs."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = (
        f"{user_col} long, n_events long, total double, last_ts timestamp"
    )
    state_schema = "n long, total double, last_us long"

    def update(key, pdfs, state: GroupState):
        n, total, last_us = state.get if state.exists else (0, 0.0, 0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf[value_col].sum())
            mx = pdf[ts_col].max()
            last_us = max(last_us, int(pd.Timestamp(mx).value // 1000))
        state.update((n, total, last_us))
        yield pd.DataFrame(
            {
                user_col: [key[0]],
                "n_events": [n],
                "total": [round(total, 6)],
                "last_ts": [pd.Timestamp(last_us * 1000)],
            }
        )

    return (
        events.groupBy(user_col)
        .applyInPandasWithState(
            update,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def event_type_totals_tws(
    events: DataFrame,
    ts_col: str = "ts",
    user_col: str = "user_id",
) -> DataFrame:
    """Per-(user, event_type) running counts via Spark 4's
    ``transformWithStateInPandas`` — the successor API to
    ``applyInPandasWithState`` (SPARK-49564): typed state variables
    (here a MapState keyed by event_type) live in the RocksDB state
    store with optional TTL, instead of one opaque state tuple per
    key. Each micro-batch emits the updated totals for every
    (user, event_type) seen in that batch.

    Scale shape identical to :func:`stateful_user_totals`: state is
    partitioned by the grouping key, per-key state is bounded by the
    user's distinct event types, and the RocksDB provider keeps the
    working set off-heap — this is the operator shape for
    billion-key continuous rollups.

    Runtime requirement: the typed-state server protocol is
    protobuf-based; environments without ``google.protobuf`` can plan
    but not execute this operator (the test suite importorskips).
    """
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class Totals(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._counts = handle.getMapState(
                "counts", "event_type string", "n long"
            )

        def handleInputRows(self, key, rows, timerValues):
            batch_counts: dict[str, int] = {}
            for pdf in rows:
                for et, n in pdf.groupby("event_type").size().items():
                    batch_counts[et] = batch_counts.get(et, 0) + int(n)
            out = []
            for et, n in batch_counts.items():
                prev = (
                    self._counts.getValue((et,))[0]
                    if self._counts.containsKey((et,))
                    else 0
                )
                total = prev + n
                self._counts.updateValue((et,), (total,))
                out.append((key[0], et, total))
            yield pd.DataFrame(
                out, columns=[user_col, "event_type", "n_events"]
            )

        def close(self) -> None:
            pass

    return events.groupBy(user_col).transformWithStateInPandas(
        statefulProcessor=Totals(),
        outputStructType=f"{user_col} long, event_type string, n_events long",
        outputMode="Update",
        timeMode="None",
    )


def throttle_dedup_stream_gs(
    events: DataFrame,
    gap_seconds: int = 600,
    ts_col: str = "ts",
) -> DataFrame:
    """:func:`throttle_dedup_stream` on the ``applyInPandasWithState``
    API (GroupState tuple instead of typed state variables) — same
    O(1)-per-key last-seen-timestamp state and the same batch-twin
    semantics; shipped on both stateful APIs because the typed-state
    protocol needs protobuf at runtime while GroupState runs
    everywhere Spark 4 runs.
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    gap_us = gap_seconds * 1_000_000

    def update(key, pdfs, state: GroupState):
        last = state.get[0] if state.exists else None
        pdf = pd.concat(list(pdfs), ignore_index=True).sort_values(
            [ts_col, "event_id"]
        )
        ts_us = pdf[ts_col].astype("int64") // 1_000
        prev = ts_us.shift(1)
        if last is not None:
            prev.iloc[0] = last
        keep = prev.isna() | (ts_us - prev > gap_us)
        state.update((int(ts_us.iloc[-1]),))
        out = pdf.loc[keep, ["event_id", ts_col]].copy()
        out.insert(1, "user_id", key[0])
        out.insert(2, "event_type", key[1])
        yield out

    return events.groupBy("user_id", "event_type").applyInPandasWithState(
        update,
        outputStructType=(
            "event_id long, user_id long, event_type string, "
            f"{ts_col} timestamp"
        ),
        stateStructType="last_us long",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def throttle_dedup_stream(
    events: DataFrame,
    gap_seconds: int = 600,
    ts_col: str = "ts",
) -> DataFrame:
    """Streaming twin of probe x87 (time-throttled dedup): emit an
    event only if it is more than ``gap_seconds`` after the previous
    event of the same (user_id, event_type). State per key is ONE
    timestamp (the last seen event time) in the typed state store —
    O(1) regardless of stream length, the cheapest possible stateful
    dedup (contrast ``stream_exact_dedup``, whose content-hash state
    grows with the watermark horizon).

    Matches the batch lag-window semantics exactly when events arrive
    in event-time order per key (rows are sorted within each
    micro-batch; cross-batch order is the ingest contract, as for any
    lag-based stream operator).
    """
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class Throttle(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            # epoch microseconds of the last SEEN event for this key
            self._last = handle.getValueState("last_us", "last_us long")

        def handleInputRows(self, key, rows, timerValues):
            gap_us = gap_seconds * 1_000_000
            last = self._last.get()[0] if self._last.exists() else None
            pdf = pd.concat(list(rows), ignore_index=True).sort_values(
                [ts_col, "event_id"]
            )
            ts_us = pdf[ts_col].astype("int64") // 1_000
            prev = ts_us.shift(1)
            if last is not None:
                prev.iloc[0] = last
            keep = prev.isna() | (ts_us - prev > gap_us)
            self._last.update((int(ts_us.iloc[-1]),))
            out = pdf.loc[keep, ["event_id", ts_col]].copy()
            out.insert(1, "user_id", key[0])
            out.insert(2, "event_type", key[1])
            yield out

        def close(self) -> None:
            pass

    return events.groupBy("user_id", "event_type").transformWithStateInPandas(
        statefulProcessor=Throttle(),
        outputStructType=(
            "event_id long, user_id long, event_type string, "
            f"{ts_col} timestamp"
        ),
        outputMode="Append",
        timeMode="None",
    )


def cusum_stream_gs(
    events: DataFrame,
    allowance_cents: int = 6000,
    threshold_cents: int = 30000,
    ts_col: str = "ts",
) -> DataFrame:
    """Streaming twin of probe x110 (CUSUM change detection): per
    user, S_t = max(0, S_(t-1) + d_t) with d_t = cents(value) -
    allowance, flagged when S_t exceeds the threshold.

    State per key is TWO integers — the last prefix sum and the
    running minimum of prefixes (incl. the empty prefix) — because
    S_t = P_t - min(0, min_(j<=t) P_j); both carry across micro-batch
    boundaries, so draining N batches equals the batch closed-form
    plan over the union (equality-tested in test_streaming.py).
    All state integer cents: no float drift can accumulate across an
    unbounded stream.
    """
    import numpy as np
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def update(key, pdfs, state: GroupState):
        last_p, min_p = state.get if state.exists else (0, 0)
        pdf = pd.concat(list(pdfs), ignore_index=True).sort_values(
            [ts_col, "event_id"]
        )
        d = (
            np.floor(pdf["value"].to_numpy() * 100 + 0.5).astype("int64")
            - allowance_cents
        )
        p = d.cumsum() + last_p
        m = np.minimum(np.minimum.accumulate(p), min_p)
        s = p - np.minimum(m, 0)
        state.update((int(p[-1]), int(m[-1])))
        out = pd.DataFrame(
            {
                "event_id": pdf["event_id"].to_numpy(),
                "user_id": key[0],
                "cusum": np.floor((s / 100.0) * 10000 + 0.5) / 10000,
                "is_anomaly": (s > threshold_cents).astype("int64"),
            }
        )
        yield out

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=(
            "event_id long, user_id long, cusum double, is_anomaly long"
        ),
        stateStructType="last_p long, min_p long",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def upsert_sink(
    table_path: str,
    key_cols: list[str],
):
    """A ``foreachBatch`` body applying each micro-batch as a MERGE
    upsert into a parquet table — the production sink pattern when the
    target must hold CURRENT state, not an append log.

    foreachBatch gives exactly-once-per-batch-id semantics: on retry
    the same batch_id re-applies, and because MERGE is idempotent for
    a fixed (base, updates) pair, the table converges. The write goes
    through a temp directory + rename-style overwrite (read fully
    before overwrite, since the source of the merge is the table
    itself).

    Usage::

        q = (stream.writeStream
             .foreachBatch(upsert_sink("/path/tbl", ["user_id"]))
             .option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
    """
    import os

    from flytemosaic_spark.operators.merge import merge_upsert

    def apply(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        # latest row per key within the batch (ts + a tie-break when
        # present) so one batch with two updates converges too
        dedup_cols = [c for c in ("ts", "event_id") if c in batch_df.columns]
        if dedup_cols:
            from pyspark.sql.window import Window

            w = Window.partitionBy(*key_cols).orderBy(
                *[F.desc(c) for c in dedup_cols]
            )
            batch_df = (
                batch_df.withColumn("_rn", F.row_number().over(w))
                .where(F.col("_rn") == 1)
                .drop("_rn")
            )
        if os.path.exists(table_path):
            base = spark.read.parquet(table_path)
            merged = merge_upsert(base, batch_df, key_cols).drop("_action")
            # materialize before overwriting the input of the merge
            rows = merged.collect() if merged.isStreaming is False else None
            spark.createDataFrame(rows, merged.schema).write.mode(
                "overwrite"
            ).parquet(table_path)
        else:
            batch_df.write.mode("overwrite").parquet(table_path)

    return apply


def windowed_js_drift(
    events: DataFrame,
    ref: dict,
    window: str = "1 day",
    watermark: str = "2 days",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Per-window Jensen–Shannon drift of the event-type distribution
    against a static reference — the live twin of the batch JS
    operator (operators/drift.py:js_divergence): each window's
    empirical distribution is compared to ``ref`` (category →
    probability), and a window whose JS spikes is drifting.

    Streaming-legal by construction: the reference categories are
    known at plan time, so the per-category counts are conditional
    aggregates inside ONE windowed groupBy (chained aggregations are
    unsupported on streams), and the JS itself is fixed column
    arithmetic over those counts — a projection, not a second
    aggregation. Works identically on batch and streaming inputs
    (same Catalyst plan → the batch run is the oracle); deterministic
    fixed-order sum over len(ref) terms, rounded at 1e-6.

    Returns (bucket, n, js).
    """
    from flytemosaic_spark.operators.text import portable_round

    events = _as_event_time(events, ts_col)
    src = (
        events.withWatermark(ts_col, watermark)
        if events.isStreaming
        else events
    )
    cats = sorted(ref)
    aggs = [
        F.sum((F.col(type_col) == c).cast("bigint")).alias(f"_c{i}")
        for i, c in enumerate(cats)
    ]
    agg = src.groupBy(F.window(ts_col, window).alias("w")).agg(
        F.count("*").alias("n"), *aggs
    )
    n = F.col("n").cast("double")
    js = None
    for i, c in enumerate(cats):
        q = float(ref[c])
        p = F.col(f"_c{i}") / n
        m = (p + F.lit(q)) / F.lit(2.0)
        term = F.when(
            F.col(f"_c{i}") > 0, p * F.log(p / m) / F.lit(2.0)
        ).otherwise(F.lit(0.0)) + F.lit(q) * F.log(F.lit(q) / m) / F.lit(2.0)
        js = term if js is None else js + term
    return agg.select(
        F.col("w.start").alias("bucket"),
        F.col("n"),
        portable_round(js, 6).alias("js"),
    )
