"""Transaction-log table format ("Delta-lite") — ACID snapshots over
plain parquet, pure stdlib + Spark.

The warehouse staple the engine lacked: an append-only commit log of
newline-delimited JSON actions (the Delta protocol shape) under
``<table>/_txlog/<version 20 digits>.json``, each version listing
``add``/``remove`` file actions plus a ``commitInfo`` record. A
snapshot at version V is the replay of all logs ``<= V``; readers pin
the file list at open, so a concurrent commit never tears a read.

Commit publication is ATOMIC AND EXCLUSIVE: the writer prepares the
log as a temp file and ``os.link``s it to the next version's final
name — link fails with EEXIST when another writer got there first
(``ConcurrentCommitError``; the loser re-reads the new snapshot and
retries). POSIX rename would silently overwrite; link is the
loser-fails primitive. On object stores the same contract is
put-if-absent.

Scale shape: the log is metadata-scale (one small JSON per commit —
Delta checkpoints compact replay cost; replay here is a linear
driver-side read, fine for O(10^4) commits). Data files are written
by Spark as ordinary parquet into per-commit subdirectories and never
rewritten in place — MERGE (the u4 operator) reads the snapshot,
computes the merged result, writes NEW files and commits
remove(all old) + add(new), which is exactly Delta's copy-on-write.

Reference parity: the reference relies on idempotent rebuild +
existence checks (flyte/scenes.py:93-99) rather than a log; this is
the general multi-writer form of its S10/D2/D3 sink discipline.
"""

from __future__ import annotations

import json
import math
import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession

_LOG_DIR = "_txlog"

# predicate ops for stats-based file skipping: (col, op, value)
_PRED_OPS = ("=", "<", "<=", ">", ">=")


class ConcurrentCommitError(RuntimeError):
    """Another writer committed this version first — re-read the
    snapshot and retry."""


def _log_dir(path: str) -> str:
    return os.path.join(path, _LOG_DIR)


def _log_file(path: str, version: int) -> str:
    return os.path.join(_log_dir(path), f"{version:020d}.json")


def latest_version(path: str) -> int:
    """Highest committed version, or -1 for a nonexistent table."""
    d = _log_dir(path)
    if not os.path.isdir(d):
        return -1
    vs = [
        int(f[:-5])
        for f in os.listdir(d)
        if f.endswith(".json") and f[:-5].isdigit()
    ]
    return max(vs, default=-1)


def _commit(path: str, version: int, actions: list[dict]) -> None:
    """Write actions as NDJSON and publish atomically (link-if-absent:
    the concurrent loser raises, nothing partial is ever visible)."""
    d = _log_dir(path)
    os.makedirs(d, exist_ok=True)
    tmp = os.path.join(d, f".tmp-{uuid.uuid4().hex}.json")
    with open(tmp, "w") as f:
        for a in actions:
            f.write(json.dumps(a, separators=(",", ":")) + "\n")
        f.flush()
        os.fsync(f.fileno())
    try:
        os.link(tmp, _log_file(path, version))
    except FileExistsError:
        raise ConcurrentCommitError(
            f"version {version} was committed by another writer"
        ) from None
    finally:
        os.unlink(tmp)


def _stats_value(v):
    """Parquet-footer min/max -> a JSON-safe, ORDER-PRESERVING value,
    or None when the type is unsafe to prune on. Python str comparison
    is code-point order == UTF-8 byte order, matching Spark's binary
    string ordering; NaN/inf floats are unsound bounds and drop the
    column."""
    if isinstance(v, bytes):
        try:
            v = v.decode("utf-8")
        except UnicodeDecodeError:
            return None
    if isinstance(v, bool) or isinstance(v, int):
        return v
    if isinstance(v, float):
        return None if (math.isnan(v) or math.isinf(v)) else v
    if isinstance(v, str):
        return v
    return None  # timestamps/decimals/nested: skip, stay conservative


def _file_stats(fpath: str) -> dict:
    """numRecords + per-column min/max from the parquet footer (the
    Delta add-action stats). A column keeps bounds only if EVERY row
    group carries sound stats for it — partial bounds would prune
    rows that exist."""
    import pyarrow.parquet as pq

    md = pq.ParquetFile(fpath).metadata
    mins: dict = {}
    maxs: dict = {}
    complete: dict = {}
    for rg in range(md.num_row_groups):
        g = md.row_group(rg)
        for ci in range(g.num_columns):
            col = g.column(ci)
            name = col.path_in_schema
            if "." in name:
                continue
            st = col.statistics
            mn = mx = None
            if st is not None and st.has_min_max:
                mn = _stats_value(st.min)
                mx = _stats_value(st.max)
            if mn is None or mx is None:
                complete[name] = False
                continue
            if name not in complete:
                complete[name] = True
                mins[name], maxs[name] = mn, mx
            elif complete[name]:
                mins[name] = min(mins[name], mn)
                maxs[name] = max(maxs[name], mx)
    for name, ok in complete.items():
        if not ok:
            mins.pop(name, None)
            maxs.pop(name, None)
    return {
        "numRecords": md.num_rows,
        "min": mins,
        "max": maxs,
    }


# Files per commit above which per-file metadata work (footer stats,
# bloom builds) distributes over the cluster instead of looping on the
# driver (guide §5: no driver loops that grow with data). Below the
# gate the job-dispatch overhead exceeds the serial loop (a footer
# read is ~ms), so small commits — every local/test commit — keep the
# zero-job path and the bench shape is unchanged.
# SHARED-FILESYSTEM ASSUMPTION (r11, ADVICE): the distributed branch
# ships table paths to executors and reads them with local pyarrow —
# correct wherever the table root is a shared mount, which is already
# txlog's commit design (os.link atomic commits). An object-store port
# must route these reads through that store's client, not this gate.
_PARALLEL_FILE_META = 32


def _write_data(
    spark: SparkSession, path: str, df: DataFrame
) -> list[dict]:
    """Write df as parquet into a fresh per-commit subdirectory and
    return its add-actions (paths relative to the table root) with
    per-file stats (numRecords, per-column min/max) for data
    skipping — footer reads only, metadata-scale. Past
    ``_PARALLEL_FILE_META`` files the footer reads run as one Spark
    map over the file list (a 100 TB commit writes thousands of
    files; reading every footer serially on the driver would gate
    commit latency on one core)."""
    sub = f"files-{uuid.uuid4().hex}"
    out = os.path.join(path, sub)
    df.write.parquet(out)
    names = [f for f in sorted(os.listdir(out)) if f.endswith(".parquet")]
    paths = [os.path.join(out, f) for f in names]
    if len(names) > _PARALLEL_FILE_META:
        from flytemosaic_spark.shipping import ship_package

        ship_package(spark)  # map fns pickle by reference to this pkg
        sc = spark.sparkContext
        stats_by_path = dict(
            sc.parallelize(
                paths, min(len(paths), sc.defaultParallelism)
            )
            .map(lambda p: (p, _file_stats(p)))
            .collect()
        )
    else:
        stats_by_path = {p: _file_stats(p) for p in paths}
    adds = []
    for f, p in zip(names, paths):
        stats = stats_by_path[p]
        if stats["numRecords"] == 0:
            os.unlink(p)  # empty part file
            continue
        adds.append({"add": {"path": f"{sub}/{f}", "stats": stats}})
    return adds


def _commit_info(op: str) -> dict:
    return {
        "commitInfo": {"operation": op, "timestamp": int(time.time() * 1000)}
    }


def _checkpoint_file(path: str, version: int) -> str:
    return os.path.join(_log_dir(path), f"{version:020d}.checkpoint.json")


def write_checkpoint(path: str, version: int | None = None) -> int:
    """Compact the replay (the Delta checkpoint): write the full
    active ADD set (path + stats) at ``version`` so later reads start
    there instead of replaying from version 0. Written temp+rename
    (idempotent — re-checkpointing a version overwrites with identical
    content); readers never require one."""
    head = latest_version(path)
    v = head if version is None else version
    adds = _active_adds(path, v)
    tmp = _checkpoint_file(path, v) + f".tmp-{uuid.uuid4().hex}"
    with open(tmp, "w") as f:
        json.dump(
            {"version": v, "adds": [adds[p] for p in sorted(adds)]},
            f,
        )
    os.replace(tmp, _checkpoint_file(path, v))
    return v


def _latest_checkpoint(
    path: str, at_or_below: int
) -> tuple[int, dict[str, dict]]:
    """(version, {relpath: add-action}) of the newest usable
    checkpoint, or (-1, empty). Pre-stats checkpoints (an ``active``
    path list) load with empty stats — never-prune is conservative."""
    d = _log_dir(path)
    best = -1
    for f in os.listdir(d):
        if f.endswith(".checkpoint.json"):
            v = int(f.split(".")[0])
            if v <= at_or_below:
                best = max(best, v)
    if best < 0:
        return -1, {}
    with open(_checkpoint_file(path, best)) as f:
        cp = json.load(f)
    if "adds" in cp:
        return best, {a["path"]: a for a in cp["adds"]}
    return best, {p: {"path": p} for p in cp.get("active", [])}


def _active_adds(
    path: str, version: int | None = None
) -> dict[str, dict]:
    """{relpath: add-action (with stats)} active at ``version`` —
    add/remove replay from the newest checkpoint at or below it."""
    head = latest_version(path)
    if head < 0:
        raise FileNotFoundError(f"no transaction log at {path}")
    v = head if version is None else version
    if not 0 <= v <= head:
        raise ValueError(f"version {v} out of range [0, {head}]")
    floor = _vacuum_floor(path)
    if v < floor:
        raise ValueError(
            f"version {v} was vacuumed (retention floor is {floor})"
        )
    start, active = _latest_checkpoint(path, v)
    for i in range(start + 1, v + 1):
        with open(_log_file(path, i)) as f:
            for line in f:
                a = json.loads(line)
                if "add" in a:
                    active[a["add"]["path"]] = a["add"]
                elif "remove" in a:
                    active.pop(a["remove"]["path"], None)
    return active


def _file_may_match(add: dict, predicate: list[tuple]) -> bool:
    """Conservative stats check: False ONLY when the file's min/max
    bounds PROVE no row can satisfy every conjunct. Missing stats or
    unknown columns keep the file."""
    stats = add.get("stats") or {}
    mins = stats.get("min") or {}
    maxs = stats.get("max") or {}
    for col, op, val in predicate:
        if op not in _PRED_OPS:
            raise ValueError(f"unsupported predicate op {op!r}")
        mn, mx = mins.get(col), maxs.get(col)
        if mn is None or mx is None:
            continue
        if type(val) is bool or isinstance(val, (int, float)):
            if not isinstance(mn, (int, float)):
                continue
        elif isinstance(val, str):
            if not isinstance(mn, str):
                continue
        else:
            continue
        if op == "=":
            if val < mn or val > mx:
                return False
            bl = (stats.get("bloom") or {}).get(col)
            if bl is not None and not _bloom_maybe_contains(bl, val):
                return False  # range covers the key, content lacks it
        if op == "<" and mn >= val:
            return False
        if op == "<=" and mn > val:
            return False
        if op == ">" and mx <= val:
            return False
        if op == ">=" and mx < val:
            return False
    return True


def snapshot_files(
    path: str,
    version: int | None = None,
    predicate: list[tuple] | None = None,
) -> list[str]:
    """Active data files (absolute paths) at ``version`` (default:
    latest). With ``predicate`` — a conjunction of ``(col, op, value)``
    with op in ``= < <= > >=`` — files whose footer min/max PROVE no
    match are pruned before any data read (the Delta data-skipping
    core: a point lookup on a range-clustered 100 TB table opens a
    handful of files, not all of them)."""
    adds = _active_adds(path, version)
    keep = sorted(
        p
        for p, a in adds.items()
        if predicate is None or _file_may_match(a, predicate)
    )
    return [os.path.join(path, p) for p in keep]


def table_schema(path: str, version: int | None = None):
    """Newest ``metaData`` schema at or below ``version`` as a
    StructType, or None for pre-schema tables."""
    from pyspark.sql.types import StructType

    head = latest_version(path)
    if head < 0:
        raise FileNotFoundError(f"no transaction log at {path}")
    v = head if version is None else version
    for i in range(v, -1, -1):
        lf = _log_file(path, i)
        if not os.path.exists(lf):
            continue  # below a vacuumed/compacted floor
        with open(lf) as f:
            for line in f:
                a = json.loads(line)
                if "metaData" in a:
                    return StructType.fromJson(
                        json.loads(a["metaData"]["schemaJson"])
                    )
    return None


def read_snapshot(
    spark: SparkSession,
    path: str,
    version: int | None = None,
    predicate: list[tuple] | None = None,
) -> DataFrame:
    """Snapshot read (``VERSION AS OF``): the file list is pinned
    HERE, so commits that land later never change this DataFrame.
    With ``predicate``, stats-pruned files are never opened (the
    caller still applies the row-level filter — pruning is
    file-granular). Reads bind the LOG schema at the version, so
    schema-evolved tables null-backfill added columns in old files,
    and an empty snapshot returns an empty TYPED DataFrame."""
    files = snapshot_files(path, version, predicate)
    schema = table_schema(path, version)
    if not files:
        if schema is not None:
            return spark.createDataFrame([], schema)
        raise ValueError(
            f"snapshot at {path} has no data files and the log "
            "records no schema"
        )
    if schema is not None:
        return spark.read.schema(schema).parquet(*files)
    return spark.read.parquet(*files)


def _schema_action(df: DataFrame) -> dict:
    return {"metaData": {"schemaJson": df.schema.json()}}


def create_table(spark: SparkSession, path: str, df: DataFrame) -> int:
    """Create version 0 from df (the log records the schema). Fails
    if the table exists."""
    if latest_version(path) >= 0:
        raise FileExistsError(f"table already exists at {path}")
    os.makedirs(path, exist_ok=True)
    actions = _write_data(spark, path, df)
    _commit(path, 0, [_commit_info("CREATE"), _schema_action(df), *actions])
    return 0


def append(
    spark: SparkSession,
    path: str,
    df: DataFrame,
    merge_schema: bool = False,
) -> int:
    """Blind append — never conflicts logically, but still goes
    through the exclusive commit (retry on ConcurrentCommitError).

    Schema evolution: columns in ``df`` that the table lacks require
    ``merge_schema=True`` and commit a widened ``metaData`` schema
    (Delta's mergeSchema); older files null-backfill the new columns
    at read time via the log-schema-bound parquet read. Columns the
    table has but ``df`` lacks are always fine (nulls on read)."""
    v = latest_version(path)
    if v < 0:
        raise FileNotFoundError(f"no transaction log at {path}")
    extra: list[dict] = []
    cur = table_schema(path, v)
    if cur is not None:
        from pyspark.sql.types import StructType

        cur_names = {f.name for f in cur.fields}
        new_fields = [
            f for f in df.schema.fields if f.name not in cur_names
        ]
        if new_fields:
            if not merge_schema:
                raise ValueError(
                    "append adds columns "
                    f"{[f.name for f in new_fields]}; pass "
                    "merge_schema=True to evolve the table schema"
                )
            extra.append(
                {
                    "metaData": {
                        "schemaJson": StructType(
                            list(cur.fields) + new_fields
                        ).json()
                    }
                }
            )
    actions = _write_data(spark, path, df)
    _commit(path, v + 1, [_commit_info("APPEND"), *extra, *actions])
    return v + 1


def overwrite(spark: SparkSession, path: str, df: DataFrame) -> int:
    """Replace the table contents in one commit (remove all + add);
    the schema may change freely and is re-recorded."""
    v = latest_version(path)
    if v < 0:
        raise FileNotFoundError(f"no transaction log at {path}")
    old = snapshot_files(path, v)
    actions = _write_data(spark, path, df)
    removes = [
        {"remove": {"path": os.path.relpath(p, path)}} for p in old
    ]
    _commit(
        path,
        v + 1,
        [_commit_info("OVERWRITE"), _schema_action(df), *removes, *actions],
    )
    return v + 1


def _updates_key_bounds(
    updates: DataFrame, key_cols: list[str]
) -> dict | None:
    """Driver-side (metadata-scale: one 1-row agg) min/max of the
    update keys, or None when any bound is unusable (empty updates,
    null keys, non-orderable types) — callers fall back to the
    unpruned path."""
    from pyspark.sql import functions as F

    aggs = []
    for k in key_cols:
        aggs.append(F.min(k).alias(f"_mn_{k}"))
        aggs.append(F.max(k).alias(f"_mx_{k}"))
    row = updates.agg(*aggs).collect()[0]
    bounds = {}
    for k in key_cols:
        mn, mx = row[f"_mn_{k}"], row[f"_mx_{k}"]
        if mn is None or mx is None:
            return None
        if not isinstance(mn, (int, float, str)) or isinstance(mn, bool):
            return None
        bounds[k] = (mn, mx)
    return bounds


def merge_into(
    spark: SparkSession,
    path: str,
    updates: DataFrame,
    key_cols: list[str],
    delete_col: str | None = None,
    broadcast_updates: bool = False,
    prune_files: bool = True,
) -> int:
    """Delta-style MERGE: snapshot read at the current version, the
    u4 merge_upsert plan, copy-on-write commit (remove old files, add
    new). If another writer commits first, the exclusive publish
    fails BEFORE any log change — the merge result is simply
    discarded and the caller retries on the fresh snapshot.

    File pruning (``prune_files``): files whose per-key min/max
    ranges cannot overlap the updates' key bounds are PROVABLY
    untouched — they stay active, unread and unrewritten, so a
    point-lookup MERGE on a range-clustered 100 TB table rewrites a
    handful of files instead of all of them. Untouched files contain
    no update key, so every row they hold passes through a full
    merge unchanged — skipping them is value-identical."""
    from flytemosaic_spark.operators.merge import merge_upsert

    v = latest_version(path)
    if v < 0:
        raise FileNotFoundError(f"no transaction log at {path}")
    adds = _active_adds(path, v)
    touched = sorted(adds)
    if prune_files and adds:
        bounds = _updates_key_bounds(updates, key_cols)
        if bounds is not None:
            pred_per_file = [
                (k, ">=", mn) for k, (mn, _) in bounds.items()
            ] + [(k, "<=", mx) for k, (_, mx) in bounds.items()]
            touched = sorted(
                p
                for p, a in adds.items()
                if _file_may_match(a, pred_per_file)
            )
        # bloom stage for POINT-LOOKUP merges (single key column,
        # few distinct keys): a file whose range covers a key almost
        # always still lacks it — the bloom proves that
        if len(key_cols) == 1 and touched:
            col = key_cols[0]
            if any(
                ((adds[p].get("stats") or {}).get("bloom") or {}).get(col)
                for p in touched
            ):
                sample = (
                    updates.select(col).distinct().limit(65).collect()
                )
                if len(sample) <= 64:  # metadata-scale key set
                    vals = [r[col] for r in sample]
                    kept = []
                    for p in touched:
                        bl = (
                            (adds[p].get("stats") or {}).get("bloom")
                            or {}
                        ).get(col)
                        if bl is None or any(
                            _bloom_maybe_contains(bl, x) for x in vals
                        ):
                            kept.append(p)
                    touched = kept
    schema = table_schema(path, v)
    files = [os.path.join(path, p) for p in touched]
    if files:
        base = (
            spark.read.schema(schema).parquet(*files)
            if schema is not None
            else spark.read.parquet(*files)
        )
    elif schema is not None:
        base = spark.createDataFrame([], schema)
    else:
        base = read_snapshot(spark, path, v).limit(0)
    merged = merge_upsert(
        base, updates, key_cols, delete_col=delete_col,
        broadcast_updates=broadcast_updates,
    ).drop("_action")
    actions = _write_data(spark, path, merged)
    removes = [{"remove": {"path": p}} for p in touched]
    _commit(path, v + 1, [_commit_info("MERGE"), *removes, *actions])
    return v + 1


def table_changes(
    spark: SparkSession, path: str, v0: int, v1: int
) -> DataFrame:
    """Change-data-feed: row-level changes AFTER ``v0`` up TO ``v1``
    (Delta's ``table_changes(v0+1, v1)`` readout). Per commit, rows
    of files added minus rows of files removed are inserts, the
    reverse are deletes — copy-on-write rewrites of unchanged rows
    cancel in the bag diff, so only files the commit actually touched
    are read. Emits the row columns (at the v1 schema) plus
    ``_change_type`` ('insert' | 'delete') and ``_commit_version``.
    Feeds the D2 incremental-consumer idiom: a downstream rollup
    applies the diff instead of re-reading the snapshot."""
    from pyspark.sql import functions as F

    head = latest_version(path)
    if head < 0:
        raise FileNotFoundError(f"no transaction log at {path}")
    if not 0 <= v0 <= v1 <= head:
        raise ValueError(f"bad change range [{v0}, {v1}] (head {head})")
    schema = table_schema(path, v1)

    def read_files(paths: list[str]) -> DataFrame:
        if not paths:
            if schema is None:
                raise ValueError(
                    "change feed on a pre-schema table needs files in "
                    "every commit"
                )
            return spark.createDataFrame([], schema)
        abs_paths = [os.path.join(path, p) for p in paths]
        if schema is not None:
            return spark.read.schema(schema).parquet(*abs_paths)
        return spark.read.parquet(*abs_paths)

    out = None
    for v in range(v0 + 1, v1 + 1):
        added: list[str] = []
        removed: list[str] = []
        with open(_log_file(path, v)) as f:
            for line in f:
                a = json.loads(line)
                if "add" in a:
                    added.append(a["add"]["path"])
                elif "remove" in a:
                    removed.append(a["remove"]["path"])
        if added and not removed:
            # metadata-only re-adds (BLOOM stat enrichment) carry no
            # data change — an already-active path must not replay as
            # inserts
            prev = _active_adds(path, v - 1)
            added = [p for p in added if p not in prev]
        a_df, r_df = read_files(added), read_files(removed)
        # bag diff against an EMPTY side is the identity — skip the
        # diff aggregate for pure-append / pure-delete commits, the
        # common log shape
        if not removed:
            part = a_df.withColumn("_change_type", F.lit("insert"))
        elif not added:
            part = r_df.withColumn("_change_type", F.lit("delete"))
        else:
            # ONE-PASS bag diff (r10): the exceptAll pair scanned each
            # side twice through two all-column hash aggregates; the
            # signed-count form reads each side ONCE and shuffles once
            # — n = count_added - count_removed per distinct row, n>0
            # replays n inserts, n<0 replays |n| deletes (identical
            # multiset to added.exceptAll(removed) ∪
            # removed.exceptAll(added); copy-on-write rewrites cancel
            # at n = 0). Grouping equality (null == null, NaN == NaN,
            # -0.0 == 0.0) matches exceptAll's, which Spark itself
            # rewrites through the same aggregate semantics.
            cols = a_df.columns
            # collision-proof internal names (r11, ADVICE): a user
            # table with a column literally named _s/_n/_rep must not
            # have it silently overwritten — extend with underscores
            # until fresh (only _change_type/_commit_version are
            # reserved by the CDF contract itself, as in the old
            # exceptAll path)
            def _fresh(base: str) -> str:
                name = base
                while name in cols:
                    name += "_"
                return name

            c_s, c_n, c_rep = _fresh("_s"), _fresh("_n"), _fresh("_rep")
            tagged = a_df.withColumn(c_s, F.lit(1)).unionByName(
                r_df.withColumn(c_s, F.lit(-1))
            )
            net = (
                tagged.groupBy(*cols)
                .agg(F.sum(c_s).alias(c_n))
                .where(F.col(c_n) != 0)
            )
            part = net.select(
                *cols,
                F.when(F.col(c_n) > 0, F.lit("insert"))
                .otherwise(F.lit("delete"))
                .alias("_change_type"),
                F.explode(
                    F.sequence(F.lit(1), F.abs(F.col(c_n)))
                ).alias(c_rep),
            ).drop(c_rep)
        part = part.withColumn(
            "_commit_version", F.lit(v).cast("int")
        )
        out = part if out is None else out.unionByName(part)
    if out is None:
        raise ValueError("empty change range")
    return out


def vacuum(path: str, retain_last: int = 2) -> dict:
    """Delete data files unreferenced by the last ``retain_last``
    versions (the Delta VACUUM trade: time travel below the floor is
    forfeited — reads there raise cleanly). Writes a checkpoint at
    the floor so replay never touches pre-floor adds, then records
    the floor in ``_txlog/_vacuum.json``. Returns counts."""
    head = latest_version(path)
    if head < 0:
        raise FileNotFoundError(f"no transaction log at {path}")
    floor = max(0, head - retain_last + 1)
    keep: set[str] = set()
    for v in range(floor, head + 1):
        keep.update(snapshot_files(path, v))
    write_checkpoint(path, floor)
    removed = 0
    for sub in os.listdir(path):
        d = os.path.join(path, sub)
        if not (sub.startswith("files-") and os.path.isdir(d)):
            continue
        for f in os.listdir(d):
            p = os.path.join(d, f)
            if f.endswith(".parquet") and p not in keep:
                os.unlink(p)
                removed += 1
        if not os.listdir(d):
            os.rmdir(d)
    tmp = os.path.join(_log_dir(path), f".vac-{uuid.uuid4().hex}")
    with open(tmp, "w") as f:
        json.dump({"floor": floor}, f)
    os.replace(tmp, os.path.join(_log_dir(path), "_vacuum.json"))
    return {"floor": floor, "removed": removed, "kept": len(keep)}


def _vacuum_floor(path: str) -> int:
    p = os.path.join(_log_dir(path), "_vacuum.json")
    if not os.path.exists(p):
        return 0
    with open(p) as f:
        return json.load(f)["floor"]


def history(path: str) -> list[dict]:
    """Commit history (version, operation, timestamp, files
    added/removed) — driver-side metadata."""
    head = latest_version(path)
    out = []
    for v in range(head + 1):
        added = removed = 0
        op = ts = None
        with open(_log_file(path, v)) as f:
            for line in f:
                a = json.loads(line)
                if "add" in a:
                    added += 1
                elif "remove" in a:
                    removed += 1
                elif "commitInfo" in a:
                    op = a["commitInfo"].get("operation")
                    ts = a["commitInfo"].get("timestamp")
        out.append(
            {"version": v, "operation": op, "timestamp": ts,
             "n_added": added, "n_removed": removed}
        )
    return out


def _zorder_column(df: DataFrame, cols: list[str]):
    """32-bit Z-value (Morton interleave) over up to 2 columns, each
    min-max scaled to 16 bits from a 1-row driver agg (metadata
    scale). The FIRST column takes the higher bit of each pair, so
    range-partitioning on z splits its space first. Bounded 16-term
    expression per column — no tree blowup."""
    from pyspark.sql import functions as F

    if not 1 <= len(cols) <= 2:
        raise ValueError("zorder_by supports 1 or 2 columns")
    aggs = []
    for c in cols:
        aggs += [F.min(c).alias(f"_mn_{c}"), F.max(c).alias(f"_mx_{c}")]
    row = df.agg(*aggs).collect()[0]
    scaled = []
    for c in cols:
        mn, mx = row[f"_mn_{c}"], row[f"_mx_{c}"]
        if mn is None or mx is None:
            raise ValueError(f"zorder column {c} has no values")
        if isinstance(mn, bool) or not isinstance(mn, (int, float)):
            raise ValueError("zorder_by requires numeric columns")
        span = (mx - mn) or 1
        scaled.append(
            F.floor(
                (F.col(c).cast("double") - F.lit(float(mn)))
                / F.lit(float(span))
                * 65535.0
            ).cast("bigint")
        )
    if len(scaled) == 1:
        return scaled[0]
    z = F.lit(0).cast("bigint")
    for bit in range(16):
        z = (
            z
            + F.shiftleft(
                F.shiftright(scaled[0], bit).bitwiseAND(F.lit(1)),
                2 * bit + 1,
            ).cast("bigint")
            + F.shiftleft(
                F.shiftright(scaled[1], bit).bitwiseAND(F.lit(1)),
                2 * bit,
            ).cast("bigint")
        )
    return z


def optimize(
    spark: SparkSession,
    path: str,
    small_file_rows: int | None = None,
    target_files: int = 8,
    zorder_by: list[str] | None = None,
) -> int:
    """Delta's OPTIMIZE: rewrite data files without changing data.

    - bin-packing (default): files with fewer than ``small_file_rows``
      rows (default: any file below the mean) are read back and
      rewritten as ``target_files`` larger files — the many-small-
      appends pathology that makes every snapshot read open thousands
      of files at 100 TB;
    - ``zorder_by``: ALL active files rewritten range-partitioned +
      sorted on a Morton-interleaved key, so per-file min/max bounds
      become tight on EVERY listed column and stats pruning works on
      all of them (the multi-dimension data-skipping layout).

    Rows are rewritten unchanged, so ``table_changes`` emits NOTHING
    for an OPTIMIZE commit (the add/remove bag diff cancels) and
    every pre-optimize version still time-travels."""
    v = latest_version(path)
    if v < 0:
        raise FileNotFoundError(f"no transaction log at {path}")
    adds = _active_adds(path, v)
    schema = table_schema(path, v)
    if zorder_by:
        chosen = sorted(adds)
    else:
        sizes = {
            p: (a.get("stats") or {}).get("numRecords")
            for p, a in adds.items()
        }
        known = [n for n in sizes.values() if n is not None]
        if not known:
            return v
        # default cutoff: the ideal post-compaction file size — any
        # file below what an even target_files split would hold
        cutoff = (
            small_file_rows
            if small_file_rows is not None
            else (sum(known) / max(1, target_files))
        )
        chosen = sorted(
            p for p, n in sizes.items() if n is not None and n < cutoff
        )
        if len(chosen) < 2:
            return v  # nothing worth compacting
    files = [os.path.join(path, p) for p in chosen]
    df = (
        spark.read.schema(schema).parquet(*files)
        if schema is not None
        else spark.read.parquet(*files)
    )
    if zorder_by:
        z = _zorder_column(df, zorder_by)
        df = df.withColumn("_z", z).repartitionByRange(
            target_files, "_z"
        ).sortWithinPartitions("_z").drop("_z")
    else:
        df = df.repartition(target_files)
    actions = _write_data(spark, path, df)
    removes = [{"remove": {"path": p}} for p in chosen]
    _commit(path, v + 1, [_commit_info("OPTIMIZE"), *removes, *actions])
    return v + 1


# ---------------------------------------------------------------------------
# optional per-file Bloom key indexes (point-lookup pruning beyond
# min/max: a file whose RANGE covers a key usually still lacks it)
# ---------------------------------------------------------------------------

_BLOOM_M = 4096  # bits
_BLOOM_K = 5


def _bloom_key(v) -> str | None:
    """Canonical string for bloom hashing — int and str columns only
    (floats/bools are poor point-lookup keys and canonicalize
    ambiguously)."""
    if isinstance(v, bool) or v is None:
        return None
    if isinstance(v, int):
        return str(v)
    if isinstance(v, str):
        return v
    return None


def _bloom_bits(key: str) -> list[int]:
    import hashlib

    h = hashlib.md5(key.encode("utf-8")).digest()
    return [
        int.from_bytes(h[4 * j : 4 * j + 2], "big") % _BLOOM_M
        for j in range(_BLOOM_K)
    ] + [int.from_bytes(h[10:12], "big") % _BLOOM_M]


def _bloom_build(values) -> str | None:
    import base64

    bits = bytearray(_BLOOM_M // 8)
    for v in values:
        key = _bloom_key(v)
        if key is None:
            return None  # a non-indexable value poisons the filter
        for b in _bloom_bits(key):
            bits[b >> 3] |= 1 << (b & 7)
    return base64.b64encode(bytes(bits)).decode("ascii")


def _bloom_maybe_contains(b64: str, v) -> bool:
    import base64

    key = _bloom_key(v)
    if key is None:
        return True  # non-indexable probe value: stay conservative
    try:
        bits = base64.b64decode(b64)
    except ValueError:
        return True
    if len(bits) != _BLOOM_M // 8:
        return True
    return all(
        bits[b >> 3] & (1 << (b & 7)) for b in _bloom_bits(key)
    )


def _build_file_blooms(
    table_path: str, rel: str, cols: list[str]
) -> dict:
    """Bloom filters for ``cols`` of one data file — the per-file unit
    of attach_blooms, driver- or executor-side."""
    import pyarrow.parquet as pq

    tbl = pq.read_table(os.path.join(table_path, rel), columns=cols)
    out = {}
    for c in cols:
        b64 = _bloom_build(tbl.column(c).to_pylist())
        if b64 is not None:
            out[c] = b64
    return out


def attach_blooms(
    spark: SparkSession, path: str, cols: list[str]
) -> int:
    """Build per-file Bloom filters for ``cols`` over every active
    file that lacks them and commit the enriched add actions (a
    metadata-only commit: same files, stats widened — the Databricks
    bloom-index shape). ``=`` predicates and point-lookup MERGEs then
    prune files whose RANGE covers a key but whose CONTENT lacks it —
    at 100 TB the range check alone keeps ~every file for a key
    drawn inside the global span; the bloom keeps ~none (1-2%% false
    positives at 4096 bits). One columnar read per file at build
    time, footer-light thereafter. Past ``_PARALLEL_FILE_META``
    pending files the per-file column reads run as one Spark map over
    the file list (the build touches every active file's key columns
    — serially on the driver that is the whole table through one
    core; guide §5)."""
    v = latest_version(path)
    if v < 0:
        raise FileNotFoundError(f"no transaction log at {path}")
    adds = _active_adds(path, v)
    work = []
    for rel, add in sorted(adds.items()):
        blooms = add.setdefault("stats", {}).setdefault("bloom", {})
        missing = [c for c in cols if c not in blooms]
        if missing:
            work.append((rel, missing))
    if len(work) > _PARALLEL_FILE_META:
        from flytemosaic_spark.shipping import ship_package

        ship_package(spark)  # map fns pickle by reference to this pkg
        sc = spark.sparkContext
        built = dict(
            sc.parallelize(work, min(len(work), sc.defaultParallelism))
            .map(lambda t: (t[0], _build_file_blooms(path, t[0], t[1])))
            .collect()
        )
    else:
        built = {
            rel: _build_file_blooms(path, rel, missing)
            for rel, missing in work
        }
    changed = []
    for rel, _missing in work:
        adds[rel]["stats"]["bloom"].update(built[rel])
        changed.append({"add": adds[rel]})
    if not changed:
        return v
    _commit(path, v + 1, [_commit_info("BLOOM"), *changed])
    return v + 1
