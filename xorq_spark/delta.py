"""Minimal Delta Lake reader: transaction-log replay without delta-spark.

The Delta protocol (public spec: https://github.com/delta-io/delta/blob/
master/PROTOCOL.md) stores a table as parquet data files plus an ordered
`_delta_log/` of JSON commits (and periodic parquet checkpoints), where
each commit carries `add`/`remove` file actions and `metaData`/`protocol`
state. Reading a version = replaying actions up to that commit and
scanning the surviving files.

This module implements exactly that read path so `read_delta` works in
environments without the delta-spark jar (the reference exercises Delta
through its DataFusion/deltalake integration; we gate WRITES the same
way it gates optional deps). Scope is the v1 reader protocol: JSON
commits + parquet checkpoints, partition columns from partitionValues.
Tables requiring reader version > 1 features (deletion vectors, column
mapping) raise cleanly — those need the real runtime.

Scale note: log replay is driver-side metadata work (the log is small);
the data scan is a normal distributed parquet read. Partitioned tables
read per-partition-value file groups so partition columns come from the
log, not from path parsing — matching the spec, which says
partitionValues is authoritative.
"""

from __future__ import annotations

import json
import os
from typing import Dict, List, Optional, Sequence, Tuple


class DeltaProtocolError(NotImplementedError):
    pass


def _read_checkpoint(path: str) -> Tuple[list, Optional[dict], int, Dict[str, int]]:
    """Actions from a parquet checkpoint:
    (adds, metaData, protocol_reader, {appId: max txn version})."""
    import pyarrow.parquet as pq

    tbl = pq.read_table(path)
    cols = set(tbl.column_names)
    adds, meta, reader = [], None, 1
    txns: Dict[str, int] = {}
    rows = tbl.to_pylist()
    for r in rows:
        if "add" in cols and r.get("add") and r["add"].get("path"):
            a = r["add"]
            # partitionValues is map<string,string> on disk — to_pylist
            # renders maps as [(k, v), ...]; normalize to the dict shape
            # JSON-commit adds carry (older struct-typed checkpoints and
            # null → {} included)
            pv = a.get("partitionValues")
            a["partitionValues"] = (
                dict(pv) if isinstance(pv, list) else (pv or {})
            )
            adds.append(a)
        if "metaData" in cols and r.get("metaData") and r["metaData"].get("schemaString"):
            meta = r["metaData"]
            # configuration is map<string,string> on disk — to_pylist
            # renders maps as [(k, v), ...]; normalize to the dict shape
            # JSON-commit metaData carries (older struct-typed
            # checkpoints already come back as dicts)
            cfg = meta.get("configuration")
            if isinstance(cfg, list):
                meta["configuration"] = dict(cfg)
        if "protocol" in cols and r.get("protocol") and r["protocol"].get("minReaderVersion"):
            reader = r["protocol"]["minReaderVersion"]
        if "txn" in cols and r.get("txn") and r["txn"].get("appId"):
            t = r["txn"]
            txns[t["appId"]] = max(txns.get(t["appId"], -1), int(t.get("version", -1)))
    return adds, meta, reader, txns


def replay_log(
    table_path: str, version: Optional[int] = None
) -> Tuple[List[dict], dict]:
    """Replay `_delta_log` up to `version` (inclusive; None = latest).

    Returns (active add-actions, metaData action). Starts from the
    newest eligible parquet checkpoint when one exists so replay cost is
    bounded by the checkpoint interval, not table age.
    """
    adds, meta, _applied = _replay_log_full(table_path, version)
    return adds, meta


def _replay_log_full(
    table_path: str, version: Optional[int] = None
) -> Tuple[List[dict], dict, int]:
    """replay_log plus the highest commit version actually APPLIED.

    Rewrite commits (OPTIMIZE/MERGE) and checkpoints must reason about
    the exact snapshot they replayed — re-listing the log directory
    afterwards is a TOCTOU race: a commit landing between the two
    listings would get a checkpoint named for it but not containing its
    actions (silent data loss for checkpoint-based readers)."""
    log_dir = os.path.join(table_path, "_delta_log")
    if not os.path.isdir(log_dir):
        raise FileNotFoundError(f"not a Delta table (no _delta_log): {table_path!r}")

    entries = os.listdir(log_dir)
    commits = sorted(
        int(f.split(".")[0])
        for f in entries
        if f.endswith(".json") and f.split(".")[0].isdigit()
    )
    if version is not None:
        commits = [c for c in commits if c <= version]
    if not commits and version is not None:
        raise ValueError(f"no commits <= version {version} in {log_dir!r}")

    checkpoints = sorted(
        int(f.split(".")[0])
        for f in entries
        if f.endswith(".checkpoint.parquet") and f.split(".")[0].isdigit()
    )
    start_from = None
    if checkpoints:
        eligible = [c for c in checkpoints if version is None or c <= version]
        if eligible:
            start_from = eligible[-1]

    active: Dict[str, dict] = {}
    meta: Optional[dict] = None
    reader_version = 1

    if start_from is not None:
        cp = os.path.join(log_dir, f"{start_from:020d}.checkpoint.parquet")
        adds, cp_meta, reader_version, _cp_txns = _read_checkpoint(cp)
        for a in adds:
            active[a["path"]] = a
        meta = cp_meta or meta
        commits = [c for c in commits if c > start_from]

    for c in commits:
        fp = os.path.join(log_dir, f"{c:020d}.json")
        with open(fp) as fh:
            for line in fh:
                line = line.strip()
                if not line:
                    continue
                action = json.loads(line)
                if "add" in action:
                    active[action["add"]["path"]] = action["add"]
                elif "remove" in action:
                    active.pop(action["remove"]["path"], None)
                elif "metaData" in action:
                    meta = action["metaData"]
                elif "protocol" in action:
                    reader_version = action["protocol"].get("minReaderVersion", 1)

    if reader_version > 1:
        raise DeltaProtocolError(
            f"Delta table {table_path!r} requires reader protocol "
            f"v{reader_version} (deletion vectors / column mapping); "
            "install delta-spark to read it"
        )
    if meta is None:
        raise DeltaProtocolError(
            f"Delta log for {table_path!r} has no metaData action"
        )
    applied = commits[-1] if commits else (start_from if start_from is not None else -1)
    return list(active.values()), meta, applied


def _spark_type_for(delta_type) -> str:
    """Delta schemaString type -> Spark SQL type string (primitives; the
    nested cases pass through parquet schema untouched)."""
    if isinstance(delta_type, dict):
        return "string"  # nested partition columns are not legal in Delta
    return {
        "long": "bigint",
        "integer": "int",
        "short": "smallint",
        "byte": "tinyint",
        "string": "string",
        "boolean": "boolean",
        "double": "double",
        "float": "float",
        "date": "date",
        "timestamp": "timestamp",
        "binary": "binary",
    }.get(delta_type, delta_type)


def read_delta_fallback(spark, table_path: str, version: Optional[int] = None):
    """Load a Delta table as a DataFrame by replaying the log directly.

    Data files group by identical partitionValues; each group is one
    distributed parquet read with the partition columns attached as
    typed literals from the log (per spec, the values in the log are
    authoritative — files do not carry partition columns)."""
    import pyspark.sql.functions as F

    adds, meta = replay_log(table_path, version)
    return _frame_for_adds(spark, table_path, adds, meta)


def _frame_for_adds(spark, table_path: str, adds: List[dict], meta: dict):
    """DataFrame over an explicit add-action list — the one scan
    implementation shared by reads, OPTIMIZE, and MERGE, so a caller
    that snapshots the log once operates on exactly that snapshot.
    Reads with the schema the LOG declares (authoritative per spec),
    never parquet-footer inference: inference samples an arbitrary
    file, so a mixed-width table would read or fail
    nondeterministically run to run."""
    import pyspark.sql.functions as F

    schema = json.loads(meta["schemaString"])
    part_cols = list(meta.get("partitionColumns") or [])
    types = {f["name"]: _spark_type_for(f["type"]) for f in schema["fields"]}
    data_cols = [f["name"] for f in schema["fields"] if f["name"] not in part_cols]

    if not adds:
        struct = ", ".join(f"`{f['name']}` {types[f['name']]}" for f in schema["fields"])
        return spark.createDataFrame([], struct)

    groups: Dict[tuple, List[str]] = {}
    for a in adds:
        pv = a.get("partitionValues") or {}
        key = tuple(pv.get(c) for c in part_cols)
        groups.setdefault(key, []).append(os.path.join(table_path, a["path"]))

    out = None
    # deterministic group order; repr-key because partition values can
    # be None (null partitions), which plain tuple sorting rejects
    data_ddl = ", ".join(f"`{c}` {types[c]}" for c in data_cols)
    for key, files in sorted(groups.items(), key=lambda kv: repr(kv[0])):
        df = spark.read.schema(data_ddl).parquet(*files).select(*data_cols)
        for c, v in zip(part_cols, key):
            lit = F.lit(v).cast(types[c]) if v is not None else F.lit(None).cast(types[c])
            df = df.withColumn(c, lit)
        df = df.select(*[f["name"] for f in schema["fields"]])
        out = df if out is None else out.unionByName(df)
    return out


# ---------------------------------------------------------------------------
# minimal writer (protocol v1) + write-audit-publish on the log
# ---------------------------------------------------------------------------

_DELTA_TYPE = {
    "bigint": "long",
    "int": "integer",
    "smallint": "short",
    "tinyint": "byte",
    "string": "string",
    "boolean": "boolean",
    "double": "double",
    "float": "float",
    "date": "date",
    "timestamp": "timestamp",
    "timestamp_ntz": "timestamp_ntz",
    "binary": "binary",
}


def _delta_schema_string(spark_schema) -> str:
    fields = []
    for f in spark_schema.fields:
        simple = f.dataType.simpleString()
        fields.append(
            {
                "name": f.name,
                "type": _DELTA_TYPE.get(simple, simple),
                "nullable": bool(f.nullable),
                "metadata": {},
            }
        )
    return json.dumps({"type": "struct", "fields": fields})


def _commit_version(log_dir: str) -> int:
    # A checkpoint at version v proves commit v existed even when its
    # JSON (and everything older) has been cleaned up — without
    # counting checkpoints, a post-cleanup writer would restart
    # numbering at 0 and overwrite history.
    versions = [
        int(f.split(".")[0])
        for f in os.listdir(log_dir)
        if (f.endswith(".json") or f.endswith(".checkpoint.parquet"))
        and f.split(".")[0].isdigit()
    ]
    return (max(versions) + 1) if versions else 0


class DeltaConcurrentWriteError(RuntimeError):
    """A rewrite commit (OPTIMIZE / MERGE) lost an optimistic-
    concurrency check: a commit that landed after its snapshot removed
    a file this commit also names in its remove list. Re-run the
    operation against the new table state."""


def _commit_rewrite(
    log_dir: str,
    table_path: str,
    actions: List[dict],
    snapshot_version: int,
    txn_scan_from: Optional[int] = None,
) -> Optional[int]:
    """Atomic commit for rewrite commits (remove + add) with the Delta
    protocol's optimistic-concurrency re-check: every commit that
    landed AFTER the snapshot this rewrite was computed from is
    validated before publishing — if any of them removed a file this
    commit also removes (a concurrent MERGE/OPTIMIZE rewrote it), this
    commit would resurrect deleted rows or double compacted ones, so it
    aborts with DeltaConcurrentWriteError and unstages its data files.
    Plain appends (adds only) are always safe to serialize after.

    When `actions` carry a `txn` marker (idempotent MERGE replay), the
    same pre-link re-scan that write_delta_txn runs guards the
    check-then-act dedup: before every link attempt, commits landed
    since `txn_scan_from` (a cursor the CALLER captured before its own
    last_txn_version lookup) are re-checked for the same (appId,
    version) — if a concurrent writer of this very micro-batch already
    won, the commit aborts as a no-op (returns None, staged files
    cleaned) instead of double-applying the batch. Without this, two
    re-deliveries of an insert-only batch (no removes, so the
    remove-conflict check can't catch them) would both commit."""
    import uuid as _uuid

    remove_paths = {
        a["remove"]["path"] for a in actions if "remove" in a
    }
    txn = next((a["txn"] for a in actions if "txn" in a), None)
    tmp = os.path.join(log_dir, f".tmp-{_uuid.uuid4().hex}.json")
    with open(tmp, "w") as fh:
        for a in actions:
            fh.write(json.dumps(a) + "\n")
    checked_upto = snapshot_version + 1  # commits < this are our snapshot
    txn_checked = (
        min(txn_scan_from, checked_upto)
        if txn_scan_from is not None
        else checked_upto
    )
    while True:
        version = _commit_version(log_dir)
        if txn is not None:
            for c in range(txn_checked, version):
                if _txn_in_commit(log_dir, c, txn["appId"]) >= int(
                    txn["version"]
                ):
                    os.unlink(tmp)
                    _cleanup_orphan_adds(table_path, actions)
                    return None
            txn_checked = version
        for c in range(checked_upto, version):
            fp = os.path.join(log_dir, f"{c:020d}.json")
            try:
                fh = open(fp)
            except FileNotFoundError:
                continue
            with fh:
                for line in fh:
                    if not line.strip():
                        continue
                    rm = json.loads(line).get("remove")
                    if rm and rm.get("path") in remove_paths:
                        os.unlink(tmp)
                        _cleanup_orphan_adds(table_path, actions)
                        raise DeltaConcurrentWriteError(
                            f"commit {c} removed {rm['path']!r}, which this "
                            "rewrite's snapshot still considered live; "
                            "retry against the current table state"
                        )
        checked_upto = version
        target = os.path.join(log_dir, f"{version:020d}.json")
        try:
            os.link(tmp, target)
            os.unlink(tmp)
            return version
        except FileExistsError:
            continue


def _atomic_commit(log_dir: str, actions: List[dict]) -> int:
    """Append the next commit atomically: write a temp file, link it to
    `{version}.json` (link fails if the version exists — the loser of a
    concurrent race retries at the next version). This is the Delta
    protocol's mutual-exclusion contract on a POSIX filesystem; object
    stores use put-if-absent the same way."""
    import uuid as _uuid

    tmp = os.path.join(log_dir, f".tmp-{_uuid.uuid4().hex}.json")
    with open(tmp, "w") as fh:
        for a in actions:
            fh.write(json.dumps(a) + "\n")
    while True:
        version = _commit_version(log_dir)
        target = os.path.join(log_dir, f"{version:020d}.json")
        try:
            os.link(tmp, target)
            os.unlink(tmp)
            return version
        except FileExistsError:
            continue


def stage_delta_files(
    df, table_path: str, partition_by: Sequence[str] = ()
) -> List[dict]:
    """Write `df`'s data files into the table directory WITHOUT
    committing them: the distributed parquet write lands in a hidden
    staging dir, files move (same-filesystem rename, no copy) to their
    final names, and the returned add-actions are NOT yet in the log —
    invisible to every reader until `_atomic_commit` publishes them."""
    import shutil
    import uuid as _uuid

    import pyspark.sql.functions as F

    os.makedirs(table_path, exist_ok=True)
    # Schema ENFORCEMENT on append (Delta semantics): cast the incoming
    # frame to the table's committed schema. Without this, a frame with
    # wider types (e.g. an int64 memtable appended to an int32 table)
    # lands physical INT64 files under int metadata — and a later read
    # fails (or not) depending on which file wins schema inference.
    try:
        _, existing_meta = replay_log(table_path)
    except (FileNotFoundError, ValueError, DeltaProtocolError):
        existing_meta = None
    if existing_meta is not None:
        schema = json.loads(existing_meta["schemaString"])
        types = {f["name"]: _spark_type_for(f["type"]) for f in schema["fields"]}
        missing = [f["name"] for f in schema["fields"] if f["name"] not in df.columns]
        if missing:
            raise ValueError(
                f"frame is missing table columns {missing} for {table_path!r}"
            )
        df = df.select(
            *[
                F.col(f["name"]).cast(types[f["name"]]).alias(f["name"])
                for f in schema["fields"]
            ]
        )
    staging = os.path.join(table_path, f".staging-{_uuid.uuid4().hex[:12]}")
    w = df.write.mode("overwrite")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(staging)

    adds = []
    for dirpath, _, files in os.walk(staging):
        rel_dir = os.path.relpath(dirpath, staging)
        pv = {}
        if rel_dir != ".":
            for piece in rel_dir.split(os.sep):
                k, _, v = piece.partition("=")
                pv[k] = None if v == "__HIVE_DEFAULT_PARTITION__" else v
        for fn in files:
            if not fn.endswith(".parquet"):
                continue
            new_name = f"part-{_uuid.uuid4().hex}.parquet"
            rel = os.path.join(rel_dir, new_name) if rel_dir != "." else new_name
            dest = os.path.join(table_path, rel)
            os.makedirs(os.path.dirname(dest), exist_ok=True)
            shutil.move(os.path.join(dirpath, fn), dest)
            add = {
                "path": rel.replace(os.sep, "/"),
                "partitionValues": pv,
                "size": os.path.getsize(dest),
                "modificationTime": int(os.path.getmtime(dest) * 1000),
                "dataChange": True,
            }
            stats = _file_stats(dest)
            if stats:
                add["stats"] = stats
            adds.append({"add": add})
    shutil.rmtree(staging)
    return adds


def write_delta(
    df,
    table_path: str,
    mode: str = "append",
    partition_by: Sequence[str] = (),
) -> int:
    """Minimal Delta protocol v1 writer: stage data files, then commit
    add-actions (plus protocol/metaData on first commit, remove-actions
    of every live file for mode='overwrite') in one atomic log entry.
    Returns the committed version.

    Scale note: the data write is a normal distributed parquet write;
    only the commit (a small JSON append) is driver-side — the same
    split delta-spark itself has."""
    if mode not in ("append", "overwrite"):
        raise ValueError(f"mode must be append|overwrite, got {mode!r}")
    log_dir = os.path.join(table_path, "_delta_log")
    new_table = not os.path.isdir(log_dir)

    actions: List[dict] = []
    if new_table:
        os.makedirs(log_dir, exist_ok=True)
        actions.append({"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}})
        actions.append(
            {
                "metaData": {
                    "id": str(__import__("uuid").uuid4()),
                    "format": {"provider": "parquet", "options": {}},
                    "schemaString": _delta_schema_string(df.schema),
                    "partitionColumns": list(partition_by),
                    "configuration": {},
                    "createdTime": 0,
                }
            }
        )
    elif mode == "overwrite":
        live, _ = replay_log(table_path)
        actions.extend(
            {"remove": {"path": a["path"], "dataChange": True}} for a in live
        )

    actions.extend(stage_delta_files(df, table_path, partition_by))
    return _atomic_commit(log_dir, actions)


def _txn_in_commit(log_dir: str, commit: int, app_id: str) -> int:
    """Max `txn` version for app_id in ONE commit file (-1 if absent)."""
    best = -1
    fp = os.path.join(log_dir, f"{commit:020d}.json")
    try:
        fh = open(fp)
    except FileNotFoundError:
        return best
    with fh:
        for line in fh:
            if not line.strip():
                continue
            txn = json.loads(line).get("txn")
            if txn and txn.get("appId") == app_id:
                best = max(best, int(txn.get("version", -1)))
    return best


def last_txn_version(table_path: str, app_id: str) -> int:
    """Highest committed `txn` version for `app_id` in the table's log
    (-1 when none): the Delta protocol's idempotent-writer handshake —
    a streaming sink records (appId, batchVersion) in the SAME atomic
    commit as its add-actions, so a re-delivered micro-batch (crash
    between sink commit and source checkpoint) is detected and skipped
    instead of double-appended.

    Checkpoint-aware: starts from the newest parquet checkpoint's txn
    column and scans only the JSON commits after it, so the lookup cost
    is bounded by the checkpoint interval, not table age (and txn state
    survives log cleanup past a checkpoint, per spec)."""
    log_dir = os.path.join(table_path, "_delta_log")
    best = -1
    if not os.path.isdir(log_dir):
        return best
    entries = os.listdir(log_dir)
    checkpoints = sorted(
        int(f.split(".")[0])
        for f in entries
        if f.endswith(".checkpoint.parquet") and f.split(".")[0].isdigit()
    )
    start_after = -1
    if checkpoints:
        cp = os.path.join(log_dir, f"{checkpoints[-1]:020d}.checkpoint.parquet")
        _, _, _, txns = _read_checkpoint(cp)
        best = txns.get(app_id, -1)
        start_after = checkpoints[-1]
    for fn in entries:
        if not fn.endswith(".json") or not fn.split(".")[0].isdigit():
            continue
        c = int(fn.split(".")[0])
        if c <= start_after:
            continue
        best = max(best, _txn_in_commit(log_dir, c, app_id))
    return best


def write_delta_txn(
    df,
    table_path: str,
    app_id: str,
    txn_version: int,
    partition_by: Sequence[str] = (),
) -> Optional[int]:
    """Idempotent append: commit `df`'s files together with a `txn`
    action (app_id, txn_version) in one atomic log entry. Returns the
    committed log version, or None when this (app_id, txn_version) —
    or a later one — is already in the log (the re-delivery no-op).

    This is the building block of the exactly-once streaming sink:
    data files and the dedup marker land in the same commit, so there
    is no window where one exists without the other."""
    log_dir = os.path.join(table_path, "_delta_log")
    # Capture the re-scan cursor BEFORE the dedup lookup: every commit
    # at or after this point is re-checked in the publish loop below,
    # so a competing writer of the same (app_id, txn_version) landing
    # between this listing and the lookup's cannot slip past both —
    # versions are sequential, so anything the lookup's later listing
    # missed is numbered >= scanned_upto and gets re-scanned.
    scanned_upto = _commit_version(log_dir) if os.path.isdir(log_dir) else 0
    if last_txn_version(table_path, app_id) >= txn_version:
        return None
    new_table = not os.path.isdir(log_dir)
    actions: List[dict] = []
    if new_table:
        os.makedirs(log_dir, exist_ok=True)
        actions.append({"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}})
        actions.append(
            {
                "metaData": {
                    "id": str(__import__("uuid").uuid4()),
                    "format": {"provider": "parquet", "options": {}},
                    "schemaString": _delta_schema_string(df.schema),
                    "partitionColumns": list(partition_by),
                    "configuration": {},
                    "createdTime": 0,
                }
            }
        )
    actions.append({"txn": {"appId": app_id, "version": txn_version}})
    actions.extend(stage_delta_files(df, table_path, partition_by))

    # Race-free publish: the dedup check above is check-then-act, so a
    # concurrent writer re-delivering the SAME (app_id, txn_version)
    # could pass it too. Before every link attempt, re-scan exactly the
    # commits that appeared since our last look; the hard-link mutual
    # exclusion then guarantees whoever wins is the only committer of
    # this txn version — the loser sees the winner's txn and aborts.
    import uuid as _uuid

    tmp = os.path.join(log_dir, f".tmp-{_uuid.uuid4().hex}.json")
    with open(tmp, "w") as fh:
        for a in actions:
            fh.write(json.dumps(a) + "\n")
    while True:
        version = _commit_version(log_dir)
        for c in range(scanned_upto, version):
            if _txn_in_commit(log_dir, c, app_id) >= txn_version:
                os.unlink(tmp)
                _cleanup_orphan_adds(table_path, actions)
                return None
        scanned_upto = version
        target = os.path.join(log_dir, f"{version:020d}.json")
        try:
            os.link(tmp, target)
            os.unlink(tmp)
            return version
        except FileExistsError:
            continue


def _cleanup_orphan_adds(table_path: str, actions: List[dict]) -> None:
    """Remove the data files of an aborted commit (they were staged but
    never entered the log, so no reader can see them). Covers both
    `add` data files and `cdc` change files — a CDF-enabled MERGE or
    DELETE stages `_change_data/cdc-*.parquet` before committing, and
    an abort must not leave them orphaned on disk."""
    for a in actions:
        staged = a.get("add") or a.get("cdc")
        if staged:
            try:
                os.unlink(os.path.join(table_path, staged["path"]))
            except OSError:
                pass


def optimize_compact(
    spark,
    table_path: str,
    zorder: Sequence[str] = (),
    target_files: Optional[int] = None,
) -> int:
    """OPTIMIZE: rewrite the table's live data files into fewer, larger
    ones — the small-file compaction every streaming-append table needs
    (thousands of micro-batch files make every scan pay per-file open
    cost and starve row-group pruning). With `zorder`, rows are
    re-clustered along the Morton curve of those columns
    (operators/layout.py) so per-file min/max stats tighten on every
    listed dimension — OPTIMIZE ZORDER on the protocol writer.

    The rewrite is one atomic commit: remove(every old file) +
    add(every new file) with dataChange=false (per spec: readers see
    identical rows before and after; streaming readers skip
    no-data-change commits). Old files stay on disk for time travel
    until `vacuum`.

    Returns the committed version."""
    live, meta, snapshot_version = _replay_log_full(table_path)
    part_cols = list(meta.get("partitionColumns") or [])
    # Build the frame from the SAME `live` snapshot the remove list
    # uses — a second log replay could see a commit that landed in
    # between, duplicating its rows while leaving its file live.
    df = _frame_for_adds(spark, table_path, live, meta)
    n_files = target_files or max(
        1, spark.sparkContext.defaultParallelism // 2
    )
    if zorder:
        from xorq_spark.operators.layout import zorder_by

        df = zorder_by(df, list(zorder), num_partitions=n_files)
    else:
        df = df.repartition(n_files)

    log_dir = os.path.join(table_path, "_delta_log")
    actions: List[dict] = [
        {"remove": {"path": a["path"], "dataChange": False}} for a in live
    ]
    adds = stage_delta_files(df, table_path, part_cols)
    for a in adds:
        a["add"]["dataChange"] = False
    actions.extend(adds)
    return _commit_rewrite(log_dir, table_path, actions, snapshot_version)


def vacuum(
    table_path: str,
    retention_hours: float = 168.0,
    dry_run: bool = False,
) -> List[str]:
    """Delete data files no longer referenced by the CURRENT table
    version and older than `retention_hours` (default 7 days, the
    protocol's safety default: shorter retention can break in-flight
    readers and time travel). Returns the deleted (or would-delete)
    paths.

    Driver-side metadata work plus unlinks — the log itself is never
    touched, so history replay still works for versions whose files
    survive."""
    import time as _time

    live, _ = replay_log(table_path)
    live_paths = {a["path"] for a in live}
    cutoff = _time.time() - retention_hours * 3600.0
    doomed: List[str] = []
    for dirpath, dirnames, files in os.walk(table_path):
        dirnames[:] = [
            d for d in dirnames if d != "_delta_log" and not d.startswith(".")
        ]
        for fn in files:
            if not fn.endswith(".parquet"):
                continue
            full = os.path.join(dirpath, fn)
            rel = os.path.relpath(full, table_path).replace(os.sep, "/")
            if rel in live_paths:
                continue
            if os.path.getmtime(full) > cutoff:
                continue
            doomed.append(rel)
            if not dry_run:
                os.unlink(full)
    return doomed


def _file_stats(path: str) -> Optional[str]:
    """Delta `add.stats` JSON for one parquet file from its footer:
    numRecords + min/max/nullCount per primitive leaf column. Footer
    reads are metadata-only (no data pages); a real cluster collects
    these during the write itself — the log contract is identical."""
    import pyarrow.parquet as pq

    try:
        md = pq.ParquetFile(path).metadata
    except OSError:
        return None
    mins: Dict[str, object] = {}
    maxs: Dict[str, object] = {}
    nulls: Dict[str, int] = {}
    for rg in range(md.num_row_groups):
        for ci in range(md.num_columns):
            c = md.row_group(rg).column(ci)
            name = c.path_in_schema
            if "." in name or c.statistics is None:
                continue
            st = c.statistics
            if not st.has_min_max:
                nulls[name] = nulls.get(name, 0) + (st.null_count or 0)
                continue
            lo, hi = st.min, st.max
            if isinstance(lo, bytes):
                continue  # binary: not a useful pruning key
            if hasattr(lo, "isoformat"):
                lo, hi = lo.isoformat(), hi.isoformat()
            mins[name] = lo if name not in mins else min(mins[name], lo)
            maxs[name] = hi if name not in maxs else max(maxs[name], hi)
            nulls[name] = nulls.get(name, 0) + (st.null_count or 0)
    return json.dumps(
        {
            "numRecords": md.num_rows,
            "minValues": mins,
            "maxValues": maxs,
            "nullCount": nulls,
        }
    )


def merge_upsert(
    spark,
    table_path: str,
    source,
    key_cols: Sequence[str],
    app_id: Optional[str] = None,
    txn_version: Optional[int] = None,
) -> Optional[int]:
    """MERGE (upsert): update rows whose `key_cols` match a source row
    with the source's values, insert source rows with no match — the
    incremental-maintenance primitive of every CDC / feature-store
    pipeline.

    File skipping on log stats: only data files whose per-file
    min/max range over the key columns OVERLAPS the source's key range
    are rewritten; everything else is untouched — the same pruning
    delta-spark does, driven by the `stats` JSON our writer records in
    each add action (files without stats are conservatively
    rewritten). One atomic commit: remove(candidate files) +
    add(rewritten files + merged rows).

    Scale notes: the source key range is one tiny aggregate; candidate
    selection is driver-side log metadata; the rewrite itself is a
    distributed anti-join (kept rows) union the source — shuffle keyed
    on the merge keys only.

    Raises ValueError when the source carries more than one row per
    key (the reference Delta MERGE contract: multiple source matches
    per target row is an error, not a silent multi-insert — a CDC feed
    must be collapsed to last-write-wins BEFORE the merge).

    Idempotent replay (the streaming-sink contract): pass `app_id` +
    `txn_version` to commit a `txn` action atomically with the merge —
    a re-delivered (app_id, txn_version) at or below the last committed
    one returns None without touching the table, so a restarted
    foreachBatch query cannot double-merge a batch whose semantics are
    not naturally idempotent.

    Returns the committed version (None on a txn-replay no-op)."""
    import pyspark.sql.functions as F

    if (app_id is None) != (txn_version is None):
        raise ValueError("app_id and txn_version must be passed together")
    # Capture the txn re-scan cursor BEFORE the dedup lookup (same
    # discipline as write_delta_txn): _commit_rewrite re-checks every
    # commit numbered >= this for our (app_id, txn_version) before each
    # link attempt, so a concurrent re-delivery of the same batch that
    # lands after this listing cannot slip past both checks.
    _probe_log = os.path.join(table_path, "_delta_log")
    txn_scan_from = (
        _commit_version(_probe_log) if os.path.isdir(_probe_log) else 0
    )
    if app_id is not None and last_txn_version(table_path, app_id) >= int(
        txn_version
    ):
        return None
    keys = list(key_cols)
    # Delta MERGE contract: a key may appear at most once in the source
    # (checked before any staging; limit(1) keeps the probe cheap)
    dup = (
        source.groupBy(*keys).count().where(F.col("count") > 1).limit(1).collect()
    )
    if dup:
        raise ValueError(
            f"merge_upsert: source has multiple rows for key "
            f"{tuple(dup[0][k] for k in keys)!r}; Delta MERGE requires at "
            "most one source match per target row — pre-aggregate the "
            "source (e.g. last-write-wins on a version column) first"
        )
    try:
        live, meta, snapshot_version = _replay_log_full(table_path)
    except FileNotFoundError:
        # MERGE into a nonexistent table: every source row is unmatched
        # -> create the table and insert them all (with the txn marker
        # when idempotent replay was requested)
        if app_id is not None:
            return write_delta_txn(source, table_path, app_id, int(txn_version))
        return write_delta(source, table_path)
    part_cols = list(meta.get("partitionColumns") or [])

    # source key envelope (one scalar row)
    env_row = source.agg(
        *[F.min(k).alias(f"__lo_{k}") for k in keys],
        *[F.max(k).alias(f"__hi_{k}") for k in keys],
    ).first()

    def _norm_env(v):
        # stats JSON stores date/timestamp min/max as isoformat strings
        # (_file_stats); normalize the source envelope the same way so
        # comparisons stay same-type
        return v.isoformat() if hasattr(v, "isoformat") else v

    env = {k: _norm_env(v) for k, v in env_row.asDict().items()}

    def overlaps(a: dict) -> bool:
        raw = a.get("stats")
        if not raw:
            return True  # no stats: must assume a match
        st = json.loads(raw)
        mins, maxs = st.get("minValues", {}), st.get("maxValues", {})
        for k in keys:
            if k not in mins or k not in maxs:
                return True
            if env[f"__lo_{k}"] is None:
                return False  # empty source: nothing overlaps
            if maxs[k] < env[f"__lo_{k}"] or mins[k] > env[f"__hi_{k}"]:
                return False
        return True

    candidates = [a for a in live if overlaps(a)]
    log_dir = os.path.join(table_path, "_delta_log")

    schema = json.loads(meta["schemaString"])
    cols = [f["name"] for f in schema["fields"]]
    src = source.select(*cols)

    cdc_df = None
    if candidates:
        # rewrite exactly the candidate snapshot (same add list the
        # remove actions below name)
        cand_df = _frame_for_adds(spark, table_path, candidates, meta).select(*cols)
        src_keys = src.select(*keys).distinct()
        kept = cand_df.join(src_keys, keys, "left_anti")
        merged = kept.unionByName(src)
        if _cdf_enabled(meta):
            # exact MERGE change rows: a matched key yields its pre- and
            # post-image, an unmatched source row an insert. Matching is
            # complete within the candidate files by construction (a
            # matching key is inside some stats-overlapping file).
            matched_keys = cand_df.select(*keys).distinct()
            pre = cand_df.join(src_keys, keys, "semi").withColumn(
                "_change_type", F.lit("update_preimage")
            )
            post = src.join(matched_keys, keys, "semi").withColumn(
                "_change_type", F.lit("update_postimage")
            )
            ins = src.join(matched_keys, keys, "anti").withColumn(
                "_change_type", F.lit("insert")
            )
            cdc_df = pre.unionByName(post).unionByName(ins)
    else:
        merged = src
        if _cdf_enabled(meta):
            cdc_df = src.withColumn("_change_type", F.lit("insert"))

    actions: List[dict] = []
    if cdc_df is not None:
        actions.extend(_stage_cdc_files(cdc_df, table_path))
    if app_id is not None:
        # dedup marker + remove + add in ONE atomic log entry: no crash
        # point leaves a merged table without its replay marker
        actions.append({"txn": {"appId": app_id, "version": int(txn_version)}})
    actions.extend(
        {"remove": {"path": a["path"], "dataChange": True}} for a in candidates
    )
    actions.extend(stage_delta_files(merged, table_path, part_cols))
    return _commit_rewrite(
        log_dir,
        table_path,
        actions,
        snapshot_version,
        txn_scan_from=txn_scan_from if app_id is not None else None,
    )


def delete_where(
    spark,
    table_path: str,
    predicate: str,
) -> int:
    """DELETE FROM ... WHERE `predicate` — the GDPR right-to-be-
    forgotten / bad-batch-rollback primitive (reference exercises it
    through engine-delegated Delta ops; delta-spark's
    DeltaTable.delete).

    Two phases, ONE atomic commit:
      find    — scan the live snapshot with file provenance
                (input_file_name) and the predicate pushed down to the
                parquet footers; only files containing >= 1 matching
                row are named. Untouched files never move.
      rewrite — exactly the named files, minus rows where the
                predicate is TRUE (SQL DELETE semantics: FALSE and
                NULL rows are kept), staged then published as
                remove+add with the optimistic-concurrency re-check.

    Time travel still serves the pre-delete snapshot until VACUUM
    drops the removed files past the retention window. A predicate
    matching nothing commits nothing (returns the current version).

    Scale notes: the find phase is a pruned distributed scan whose
    result is file NAMES (metadata-bounded driver state, like the
    merge candidate list); the rewrite shuffles nothing — it is a
    per-file filter of only the affected files.

    Returns the committed (or unchanged) version."""
    import urllib.parse

    import pyspark.sql.functions as F

    live, meta, snapshot_version = _replay_log_full(table_path)
    part_cols = list(meta.get("partitionColumns") or [])
    if not live:
        return snapshot_version
    pred = F.expr(predicate)
    df = _frame_for_adds(spark, table_path, live, meta)
    hit_files = {
        urllib.parse.unquote(urllib.parse.urlparse(r[0]).path)
        for r in df.where(pred).select(F.input_file_name()).distinct().collect()
    }
    hit_base = {os.path.basename(p) for p in hit_files}
    candidates = [a for a in live if os.path.basename(a["path"]) in hit_base]
    if not candidates:
        return snapshot_version

    cand_df = _frame_for_adds(spark, table_path, candidates, meta)
    kept = cand_df.where(~pred | pred.isNull())

    log_dir = os.path.join(table_path, "_delta_log")
    actions: List[dict] = [
        {"remove": {"path": a["path"], "dataChange": True}} for a in candidates
    ]
    if _cdf_enabled(meta):
        # exact row-level change capture in the SAME commit: the
        # deleted rows (we are already scanning the candidate files)
        actions.extend(
            _stage_cdc_files(
                cand_df.where(pred).withColumn(
                    "_change_type", F.lit("delete")
                ),
                table_path,
            )
        )
    actions.extend(stage_delta_files(kept, table_path, part_cols))
    return _commit_rewrite(log_dir, table_path, actions, snapshot_version)


def _all_txns(log_dir: str, upto: Optional[int] = None) -> Dict[str, int]:
    """{appId: max txn version} across the newest checkpoint and every
    later commit. With `upto`, only commits/checkpoints <= that version
    count — a checkpoint must carry exactly the txn state of the
    snapshot it is named for, not whatever landed while it was built."""
    txns: Dict[str, int] = {}
    if not os.path.isdir(log_dir):
        return txns
    entries = os.listdir(log_dir)
    checkpoints = sorted(
        int(f.split(".")[0])
        for f in entries
        if f.endswith(".checkpoint.parquet") and f.split(".")[0].isdigit()
        and (upto is None or int(f.split(".")[0]) <= upto)
    )
    start_after = -1
    if checkpoints:
        cp = os.path.join(log_dir, f"{checkpoints[-1]:020d}.checkpoint.parquet")
        _, _, _, txns = _read_checkpoint(cp)
        txns = dict(txns)
        start_after = checkpoints[-1]
    for fn in entries:
        if not fn.endswith(".json") or not fn.split(".")[0].isdigit():
            continue
        if int(fn.split(".")[0]) <= start_after:
            continue
        if upto is not None and int(fn.split(".")[0]) > upto:
            continue
        with open(os.path.join(log_dir, fn)) as fh:
            for line in fh:
                if not line.strip():
                    continue
                txn = json.loads(line).get("txn")
                if txn and txn.get("appId"):
                    a = txn["appId"]
                    txns[a] = max(txns.get(a, -1), int(txn.get("version", -1)))
    return txns


def checkpoint_log(table_path: str) -> int:
    """Write a parquet checkpoint of the CURRENT log state (active
    add-actions + metaData + protocol + per-app txn maxima) named
    `{version}.checkpoint.parquet` — after which replay and txn lookup
    start from the checkpoint and touch only later JSON commits. This
    is the Delta log-compaction contract: replay cost stays bounded by
    the checkpoint interval however long the table lives (the streaming
    sink writes one every `checkpoint_interval` batches).

    Returns the checkpointed version."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    log_dir = os.path.join(table_path, "_delta_log")
    # The checkpoint is named for the highest commit replay ACTUALLY
    # applied — re-listing the directory here would be a TOCTOU race: a
    # commit landing between replay and listing would get a checkpoint
    # named for it but not containing its adds (readers starting from
    # the checkpoint silently drop that commit's rows) and its txn
    # markers would vanish from dedup lookups.
    live, meta, version = _replay_log_full(table_path)
    # table properties MUST survive the checkpoint (the spec's
    # metaData is carried whole): dropping configuration silently
    # turned delta.enableChangeDataFeed off for any reader whose
    # replay started at the checkpoint. Stored as the spec's
    # map<string,string> (NOT a property-name-keyed struct, which is
    # what pylist inference produces and what external Delta
    # checkpoint readers would reject).
    cfg = dict(meta.get("configuration") or {})
    meta_slim = {
        "id": meta.get("id", ""),
        "schemaString": meta["schemaString"],
        "partitionColumns": list(meta.get("partitionColumns") or []),
        "configuration": sorted(cfg.items()) if cfg else None,
    }
    rows: List[dict] = [
        {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}},
        {"metaData": meta_slim},
    ]
    # partitionValues gets the same explicit-type treatment as
    # metaData.configuration below: the spec says map<string,string>,
    # and pyarrow inference from dicts would instead produce a struct
    # keyed by the partition-column names (or an empty struct, which
    # parquet cannot store) — both rejected by external checkpoint
    # readers. Emit sorted items; empty → null (readers treat None
    # and {} identically).
    def _cp_add(a: dict) -> dict:
        pv = a.get("partitionValues")
        if isinstance(pv, dict):
            pv = sorted(pv.items())
        elif pv:
            pv = sorted((k, v) for k, v in pv)
        return {
            "path": a["path"],
            "partitionValues": pv or None,
            "size": a.get("size"),
            "modificationTime": a.get("modificationTime"),
            "dataChange": bool(a.get("dataChange")),
            "stats": a.get("stats"),
        }

    rows.extend({"add": _cp_add(a)} for a in live)
    rows.extend(
        {"txn": {"appId": a, "version": v}}
        for a, v in sorted(_all_txns(log_dir, upto=version).items())
    )
    # unify row keys so pyarrow infers one nullable struct column each;
    # metaData gets an EXPLICIT type so configuration is the spec's
    # map<string,string> (list-of-tuples values), not an inferred struct
    keys = ("protocol", "metaData", "add", "txn")
    tbl = pa.Table.from_pylist([{k: r.get(k) for k in keys} for r in rows])
    md_type = pa.struct(
        [
            pa.field("id", pa.string()),
            pa.field("schemaString", pa.string()),
            pa.field("partitionColumns", pa.list_(pa.string())),
            pa.field("configuration", pa.map_(pa.string(), pa.string())),
        ]
    )
    md_arr = pa.array(
        [r.get("metaData") for r in rows], type=md_type
    )
    tbl = tbl.set_column(
        tbl.schema.get_field_index("metaData"),
        pa.field("metaData", md_type),
        md_arr,
    )
    add_type = pa.struct(
        [
            pa.field("path", pa.string()),
            pa.field("partitionValues", pa.map_(pa.string(), pa.string())),
            pa.field("size", pa.int64()),
            pa.field("modificationTime", pa.int64()),
            pa.field("dataChange", pa.bool_()),
            pa.field("stats", pa.string()),
        ]
    )
    add_arr = pa.array([r.get("add") for r in rows], type=add_type)
    tbl = tbl.set_column(
        tbl.schema.get_field_index("add"),
        pa.field("add", add_type),
        add_arr,
    )
    tmp = os.path.join(log_dir, f".cp-tmp-{version}.parquet")
    pq.write_table(tbl, tmp)
    os.replace(tmp, os.path.join(log_dir, f"{version:020d}.checkpoint.parquet"))
    return version


def restore_table(spark, table_path: str, version: int) -> int:
    """RESTORE TABLE ... TO VERSION AS OF `version` — roll the live
    snapshot back to an earlier one as a NEW commit (delta-spark's
    RESTORE semantics): history is preserved, time travel still serves
    every intermediate version, and the rollback itself is auditable
    and revertible.

    Mechanics: diff the current live file set against the target
    snapshot's; commit remove-actions for files that joined since and
    re-add the target's missing add-actions (stats and partition values
    carried over verbatim) in ONE atomic entry with the optimistic
    concurrency re-check. Data files never move or rewrite — RESTORE is
    pure metadata, exactly why it is instant at any table size.

    Raises ValueError when a needed historical file was already
    VACUUMed away (the protocol's documented RESTORE failure mode) —
    a partial restore would silently drop rows.

    Returns the committed version (current version if already there).
    """
    live_now, meta, cur = _replay_log_full(table_path)
    target_adds, _tmeta = replay_log(table_path, version)
    now_paths = {a["path"] for a in live_now}
    tgt_paths = {a["path"] for a in target_adds}
    if now_paths == tgt_paths:
        return cur
    missing = [
        a["path"]
        for a in target_adds
        if a["path"] not in now_paths
        and not os.path.exists(os.path.join(table_path, a["path"]))
    ]
    if missing:
        raise ValueError(
            f"cannot RESTORE {table_path!r} to version {version}: "
            f"{len(missing)} historical data file(s) were vacuumed "
            f"(first: {missing[0]!r}); restore past the VACUUM horizon "
            "is impossible by design"
        )
    actions: List[dict] = [
        {
            "commitInfo": {
                "operation": "RESTORE",
                "operationParameters": {"version": int(version)},
                "timestamp": int(__import__("time").time() * 1000),
            }
        }
    ]
    if _cdf_enabled(meta):
        # delta-spark emits CDF rows for RESTORE: rows leaving the
        # snapshot (files removed below) as deletes, rows returning
        # (files re-added) as inserts. Without these, a feed consumer
        # reading across the RESTORE commit would hit the
        # rewrite-without-cdc refusal even though CDF was on throughout.
        import pyspark.sql.functions as F

        schema_cols = [
            f["name"] for f in json.loads(meta["schemaString"])["fields"]
        ]
        removed_adds = [a for a in live_now if a["path"] not in tgt_paths]
        readd_adds = [a for a in target_adds if a["path"] not in now_paths]
        cdc_frames = []
        if removed_adds:
            cdc_frames.append(
                _frame_for_adds(spark, table_path, removed_adds, meta)
                .select(*schema_cols)
                .withColumn("_change_type", F.lit("delete"))
            )
        if readd_adds:
            cdc_frames.append(
                _frame_for_adds(spark, table_path, readd_adds, meta)
                .select(*schema_cols)
                .withColumn("_change_type", F.lit("insert"))
            )
        if cdc_frames:
            cdc_df = cdc_frames[0]
            for f in cdc_frames[1:]:
                cdc_df = cdc_df.unionByName(f)
            actions.extend(_stage_cdc_files(cdc_df, table_path))
    actions.extend(
        {"remove": {"path": p, "dataChange": True}}
        for p in sorted(now_paths - tgt_paths)
    )
    actions.extend(
        {"add": dict(a)} for a in target_adds if a["path"] not in now_paths
    )
    log_dir = os.path.join(table_path, "_delta_log")
    return _commit_rewrite(log_dir, table_path, actions, cur)


def table_history(table_path: str) -> List[dict]:
    """Commit-by-commit audit trail, newest first: one dict per log
    entry with (version, operation, n_adds, n_removes, has_txn,
    timestamp_ms). Operation comes from the commit's commitInfo when
    present (RESTORE writes one) and is otherwise inferred from the
    action mix — the inference covers logs written before commitInfo
    stamping existed. Pure driver-side metadata: reads the JSON log,
    never the data."""
    log_dir = os.path.join(table_path, "_delta_log")
    if not os.path.isdir(log_dir):
        raise FileNotFoundError(f"not a Delta table (no _delta_log): {table_path!r}")
    out = []
    commits = sorted(
        int(f.split(".")[0])
        for f in os.listdir(log_dir)
        if f.endswith(".json") and f.split(".")[0].isdigit()
    )
    for c in commits:
        fp = os.path.join(log_dir, f"{c:020d}.json")
        n_add = n_rm = 0
        has_txn = False
        op = None
        ts = None
        created = False
        with open(fp) as fh:
            for line in fh:
                line = line.strip()
                if not line:
                    continue
                a = json.loads(line)
                if "add" in a:
                    n_add += 1
                elif "remove" in a:
                    n_rm += 1
                elif "txn" in a:
                    has_txn = True
                elif "metaData" in a:
                    created = True
                elif "commitInfo" in a:
                    op = a["commitInfo"].get("operation")
                    ts = a["commitInfo"].get("timestamp")
        if op is None:
            if created:
                op = "CREATE TABLE AS SELECT" if n_add else "CREATE TABLE"
            elif has_txn:
                op = "STREAMING UPDATE"
            elif n_add and n_rm:
                op = "REWRITE"
            elif n_rm:
                op = "DELETE"
            else:
                op = "WRITE"
        if ts is None:
            ts = int(os.path.getmtime(fp) * 1000)
        out.append(
            {
                "version": c,
                "operation": op,
                "n_adds": n_add,
                "n_removes": n_rm,
                "has_txn": has_txn,
                "timestamp_ms": ts,
            }
        )
    return list(reversed(out))


# ---------------------------------------------------------------------------
# Change Data Feed (protocol `cdc` actions): row-level change capture on
# DELETE/MERGE, derived inserts on plain appends, and a version-range reader.
# ---------------------------------------------------------------------------


def set_table_property(table_path: str, key: str, value: str) -> int:
    """Commit an updated metaData action with `configuration[key] =
    value` — the mechanism behind `ALTER TABLE ... SET TBLPROPERTIES`
    (and how `delta.enableChangeDataFeed` turns CDF on)."""
    _live, meta, cur = _replay_log_full(table_path)
    meta = dict(meta)
    conf = dict(meta.get("configuration") or {})
    conf[str(key)] = str(value)
    meta["configuration"] = conf
    log_dir = os.path.join(table_path, "_delta_log")
    actions = [
        {
            "commitInfo": {
                "operation": "SET TBLPROPERTIES",
                "operationParameters": {str(key): str(value)},
                "timestamp": int(__import__("time").time() * 1000),
            }
        },
        {"metaData": meta},
    ]
    return _commit_rewrite(log_dir, table_path, actions, cur)


def _cdf_enabled(meta: dict) -> bool:
    return (meta.get("configuration") or {}).get(
        "delta.enableChangeDataFeed", ""
    ).lower() == "true"


def _stage_cdc_files(df, table_path: str) -> List[dict]:
    """Write change rows (with their `_change_type` column) under
    `_change_data/` and return uncommitted `cdc` actions."""
    import shutil
    import uuid as _uuid

    staging = os.path.join(table_path, f".staging-cdc-{_uuid.uuid4().hex[:12]}")
    df.write.mode("overwrite").parquet(staging)
    out_dir = os.path.join(table_path, "_change_data")
    os.makedirs(out_dir, exist_ok=True)
    actions = []
    for fn in os.listdir(staging):
        if not fn.endswith(".parquet"):
            continue
        rel = f"_change_data/cdc-{_uuid.uuid4().hex}.parquet"
        dest = os.path.join(table_path, rel)
        shutil.move(os.path.join(staging, fn), dest)
        actions.append(
            {
                "cdc": {
                    "path": rel,
                    "partitionValues": {},
                    "size": os.path.getsize(dest),
                    "dataChange": False,
                }
            }
        )
    shutil.rmtree(staging)
    return actions


def read_table_changes(
    spark,
    table_path: str,
    from_version: int,
    to_version: Optional[int] = None,
):
    """CDF reader: row-level changes in commits [from_version,
    to_version] as a DataFrame of the table schema plus
    (_change_type, _commit_version) — delta-spark's `table_changes`.

    Per the protocol: a commit carrying `cdc` actions is read from
    those files ALONE (they carry exact update_preimage /
    update_postimage / delete rows written by MERGE/DELETE when
    `delta.enableChangeDataFeed` is true); an append-only commit
    derives `insert` rows from its dataChange add-actions; a REWRITE
    commit without cdc actions raises — deriving changes from a
    rewrite's remove+add would report every untouched row in the
    rewritten files as a delete+insert (the same refusal delta-spark
    makes for ranges where CDF was off).

    Scale: the log walk is driver-side metadata; each change read is a
    distributed parquet scan of exactly the changed files.

    Retention: cdc files under `_change_data/` (like removed data
    files) are subject to VACUUM's retention window — read a change
    range within retention, or archive the feed downstream (the same
    contract delta-spark's CDF has).
    """
    import pyspark.sql.functions as F

    log_dir = os.path.join(table_path, "_delta_log")
    if not os.path.isdir(log_dir):
        raise FileNotFoundError(f"not a Delta table (no _delta_log): {table_path!r}")
    _live, meta, cur = _replay_log_full(table_path)
    hi = cur if to_version is None else int(to_version)
    lo = int(from_version)
    frames = []
    schema_cols = [
        f["name"] for f in json.loads(meta["schemaString"])["fields"]
    ]
    # Running path -> add map so a remove in-range can be attributed.
    # Seeded from the newest parquet checkpoint before the range (same
    # as _replay_log_full): JSON commits older than a checkpoint may be
    # cleaned up, and a remove whose add predates the surviving log
    # window must still attribute — never silently drop feed rows.
    active: Dict[str, dict] = {}
    walk_from = 0
    checkpoints = sorted(
        int(f.split(".")[0])
        for f in os.listdir(log_dir)
        if f.endswith(".checkpoint.parquet") and f.split(".")[0].isdigit()
    )
    seed_cps = [v for v in checkpoints if v < lo]
    if seed_cps:
        cp_adds, _cp_meta, _rv, _txns = _read_checkpoint(
            os.path.join(
                log_dir, f"{seed_cps[-1]:020d}.checkpoint.parquet"
            )
        )
        active = {a["path"]: a for a in cp_adds}
        walk_from = seed_cps[-1] + 1
    for c in range(walk_from, hi + 1):
        fp = os.path.join(log_dir, f"{c:020d}.json")
        if not os.path.exists(fp):
            # Pre-range commits folded into the seeding checkpoint may
            # be cleaned; an IN-RANGE commit with no surviving JSON
            # means its change rows are unrecoverable — raise (delta-
            # spark errors likewise), never silently drop feed rows.
            if lo <= c <= hi:
                raise ValueError(
                    f"cannot read changes for commit {c} of "
                    f"{table_path!r}: its log file was cleaned past a "
                    "checkpoint; request a range within the surviving "
                    "log window"
                )
            continue
        adds, removes, cdcs = [], [], []
        with open(fp) as fh:
            for line in fh:
                line = line.strip()
                if not line:
                    continue
                a = json.loads(line)
                if "add" in a:
                    adds.append(a["add"])
                elif "remove" in a:
                    removes.append(a["remove"])
                elif "cdc" in a:
                    cdcs.append(a["cdc"])
        in_range = lo <= c <= hi
        if in_range:
            if cdcs:
                for cd in cdcs:
                    frames.append(
                        spark.read.parquet(
                            os.path.join(table_path, cd["path"])
                        ).withColumn("_commit_version", F.lit(c).cast("long"))
                    )
            else:
                d_adds = [a for a in adds if a.get("dataChange", True)]
                d_rms = [r for r in removes if r.get("dataChange", True)]
                if d_adds and d_rms:
                    raise ValueError(
                        f"commit {c} of {table_path!r} rewrites files "
                        "without cdc actions; enable "
                        "delta.enableChangeDataFeed before the rewrite "
                        "to read row-level changes over this range"
                    )
                if d_adds:
                    frames.append(
                        _frame_for_adds(spark, table_path, d_adds, meta)
                        .select(*schema_cols)
                        .withColumn("_change_type", F.lit("insert"))
                        .withColumn("_commit_version", F.lit(c).cast("long"))
                    )
                if d_rms:
                    orphans = [
                        r["path"] for r in d_rms if r["path"] not in active
                    ]
                    if orphans:
                        raise ValueError(
                            f"commit {c} of {table_path!r} removes "
                            f"{orphans[0]!r}, whose add action is outside "
                            "the surviving log window (cleaned past a "
                            "checkpoint?); its rows cannot be attributed "
                            "to the change feed"
                        )
                    rm_adds = [active[r["path"]] for r in d_rms]
                    if rm_adds:
                        frames.append(
                            _frame_for_adds(spark, table_path, rm_adds, meta)
                            .select(*schema_cols)
                            .withColumn("_change_type", F.lit("delete"))
                            .withColumn(
                                "_commit_version", F.lit(c).cast("long")
                            )
                        )
        for a in adds:
            active[a["path"]] = a
        for r in removes:
            active.pop(r["path"], None)
    if not frames:
        base = _frame_for_adds(spark, table_path, [], meta).select(*schema_cols)
        return (
            base.withColumn("_change_type", F.lit("insert"))
            .withColumn("_commit_version", F.lit(0).cast("long"))
            .limit(0)
        )
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f)
    return out
