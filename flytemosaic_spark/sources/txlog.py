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
import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession

_LOG_DIR = "_txlog"


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


def _write_data(
    spark: SparkSession, path: str, df: DataFrame
) -> list[dict]:
    """Write df as parquet into a fresh per-commit subdirectory and
    return its add-actions (paths relative to the table root)."""
    sub = f"files-{uuid.uuid4().hex}"
    out = os.path.join(path, sub)
    df.write.parquet(out)
    adds = []
    for f in sorted(os.listdir(out)):
        if f.endswith(".parquet"):
            adds.append({"add": {"path": f"{sub}/{f}"}})
    return adds


def _commit_info(op: str) -> dict:
    return {
        "commitInfo": {"operation": op, "timestamp": int(time.time() * 1000)}
    }


def _checkpoint_file(path: str, version: int) -> str:
    return os.path.join(_log_dir(path), f"{version:020d}.checkpoint.json")


def write_checkpoint(path: str, version: int | None = None) -> int:
    """Compact the replay (the Delta checkpoint): write the full
    active file set at ``version`` so later reads start there instead
    of replaying from version 0. Written temp+rename (idempotent —
    re-checkpointing a version overwrites with identical content);
    readers never require one."""
    head = latest_version(path)
    v = head if version is None else version
    files = snapshot_files(path, v)
    tmp = _checkpoint_file(path, v) + f".tmp-{uuid.uuid4().hex}"
    with open(tmp, "w") as f:
        json.dump(
            {"version": v,
             "active": [os.path.relpath(p, path) for p in files]},
            f,
        )
    os.replace(tmp, _checkpoint_file(path, v))
    return v


def _latest_checkpoint(path: str, at_or_below: int) -> tuple[int, set[str]]:
    """(version, active set) of the newest usable checkpoint, or
    (-1, empty)."""
    d = _log_dir(path)
    best = -1
    for f in os.listdir(d):
        if f.endswith(".checkpoint.json"):
            v = int(f.split(".")[0])
            if v <= at_or_below:
                best = max(best, v)
    if best < 0:
        return -1, set()
    with open(_checkpoint_file(path, best)) as f:
        cp = json.load(f)
    return best, set(cp["active"])


def snapshot_files(path: str, version: int | None = None) -> list[str]:
    """Active data files (absolute paths) at ``version`` (default:
    latest) — add/remove replay from the newest checkpoint at or
    below the requested version (version 0 when none exists)."""
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
                    active.add(a["add"]["path"])
                elif "remove" in a:
                    active.discard(a["remove"]["path"])
    return [os.path.join(path, p) for p in sorted(active)]


def read_snapshot(
    spark: SparkSession, path: str, version: int | None = None
) -> DataFrame:
    """Snapshot read (``VERSION AS OF``): the file list is pinned
    HERE, so commits that land later never change this DataFrame."""
    files = snapshot_files(path, version)
    if not files:
        # empty snapshot: derive the schema from the newest log that
        # has files, else fail — simplest honest behavior
        raise ValueError(f"snapshot at {path} has no data files")
    return spark.read.parquet(*files)


def create_table(spark: SparkSession, path: str, df: DataFrame) -> int:
    """Create version 0 from df. Fails if the table exists."""
    if latest_version(path) >= 0:
        raise FileExistsError(f"table already exists at {path}")
    os.makedirs(path, exist_ok=True)
    actions = _write_data(spark, path, df)
    _commit(path, 0, [_commit_info("CREATE"), *actions])
    return 0


def append(spark: SparkSession, path: str, df: DataFrame) -> int:
    """Blind append — never conflicts logically, but still goes
    through the exclusive commit (retry on ConcurrentCommitError)."""
    v = latest_version(path)
    if v < 0:
        raise FileNotFoundError(f"no transaction log at {path}")
    actions = _write_data(spark, path, df)
    _commit(path, v + 1, [_commit_info("APPEND"), *actions])
    return v + 1


def overwrite(spark: SparkSession, path: str, df: DataFrame) -> int:
    """Replace the table contents in one commit (remove all + add)."""
    v = latest_version(path)
    if v < 0:
        raise FileNotFoundError(f"no transaction log at {path}")
    old = snapshot_files(path, v)
    actions = _write_data(spark, path, df)
    removes = [
        {"remove": {"path": os.path.relpath(p, path)}} for p in old
    ]
    _commit(path, v + 1, [_commit_info("OVERWRITE"), *removes, *actions])
    return v + 1


def merge_into(
    spark: SparkSession,
    path: str,
    updates: DataFrame,
    key_cols: list[str],
    delete_col: str | None = None,
    broadcast_updates: bool = False,
) -> int:
    """Delta-style MERGE: snapshot read at the current version, the
    u4 merge_upsert plan, copy-on-write commit (remove old files, add
    new). If another writer commits first, the exclusive publish
    fails BEFORE any log change — the merge result is simply
    discarded and the caller retries on the fresh snapshot."""
    from flytemosaic_spark.operators.merge import merge_upsert

    v = latest_version(path)
    if v < 0:
        raise FileNotFoundError(f"no transaction log at {path}")
    base = read_snapshot(spark, path, v)
    merged = merge_upsert(
        base, updates, key_cols, delete_col=delete_col,
        broadcast_updates=broadcast_updates,
    ).drop("_action")
    old = snapshot_files(path, v)
    actions = _write_data(spark, path, merged)
    removes = [
        {"remove": {"path": os.path.relpath(p, path)}} for p in old
    ]
    _commit(path, v + 1, [_commit_info("MERGE"), *removes, *actions])
    return v + 1


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
