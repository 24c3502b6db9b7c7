"""Minimal Delta Lake reader (xorq_spark/delta.py): transaction-log
replay without delta-spark — commits, removes, time travel, partitions,
checkpoints, protocol gating."""

from __future__ import annotations

import json
import os

import pandas as pd
import pytest

import xorq_spark as xo
from xorq_spark.delta import DeltaProtocolError, replay_log


def _schema_string(fields):
    return json.dumps(
        {
            "type": "struct",
            "fields": [
                {"name": n, "type": t, "nullable": True, "metadata": {}}
                for n, t in fields
            ],
        }
    )


def _commit(log_dir, version, actions):
    with open(os.path.join(log_dir, f"{version:020d}.json"), "w") as fh:
        for a in actions:
            fh.write(json.dumps(a) + "\n")


def _meta(fields, part_cols=()):
    return {
        "metaData": {
            "id": "test",
            "format": {"provider": "parquet", "options": {}},
            "schemaString": _schema_string(fields),
            "partitionColumns": list(part_cols),
            "configuration": {},
        }
    }


def _make_table(root, part=False):
    """Two commits: v0 adds f1+f2, v1 removes f2 and adds f3."""
    os.makedirs(os.path.join(root, "_delta_log"))
    log = os.path.join(root, "_delta_log")

    def write(fname, rows, sub=""):
        d = os.path.join(root, sub) if sub else root
        os.makedirs(d, exist_ok=True)
        pd.DataFrame(rows).to_parquet(os.path.join(d, fname))

    if part:
        write("f1.parquet", {"k": [1, 2], "v": [10.0, 20.0]}, "lang=en")
        write("f2.parquet", {"k": [3], "v": [30.0]}, "lang=de")
        write("f3.parquet", {"k": [4], "v": [40.0]}, "lang=de")
        pv = lambda l: {"lang": l}
        fields = [("k", "long"), ("v", "double"), ("lang", "string")]
        _commit(log, 0, [
            {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}},
            _meta(fields, ["lang"]),
            {"add": {"path": "lang=en/f1.parquet", "partitionValues": pv("en"),
                     "size": 1, "modificationTime": 0, "dataChange": True}},
            {"add": {"path": "lang=de/f2.parquet", "partitionValues": pv("de"),
                     "size": 1, "modificationTime": 0, "dataChange": True}},
        ])
        _commit(log, 1, [
            {"remove": {"path": "lang=de/f2.parquet", "dataChange": True}},
            {"add": {"path": "lang=de/f3.parquet", "partitionValues": pv("de"),
                     "size": 1, "modificationTime": 0, "dataChange": True}},
        ])
    else:
        write("f1.parquet", {"k": [1, 2], "v": [10.0, 20.0]})
        write("f2.parquet", {"k": [3], "v": [30.0]})
        write("f3.parquet", {"k": [4], "v": [40.0]})
        fields = [("k", "long"), ("v", "double")]
        _commit(log, 0, [
            {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}},
            _meta(fields),
            {"add": {"path": "f1.parquet", "partitionValues": {},
                     "size": 1, "modificationTime": 0, "dataChange": True}},
            {"add": {"path": "f2.parquet", "partitionValues": {},
                     "size": 1, "modificationTime": 0, "dataChange": True}},
        ])
        _commit(log, 1, [
            {"remove": {"path": "f2.parquet", "dataChange": True}},
            {"add": {"path": "f3.parquet", "partitionValues": {},
                     "size": 1, "modificationTime": 0, "dataChange": True}},
        ])
    return root


def test_replay_latest_and_time_travel(tmp_path):
    root = _make_table(str(tmp_path / "t"))
    adds, meta = replay_log(root)
    assert sorted(a["path"] for a in adds) == ["f1.parquet", "f3.parquet"]
    adds0, _ = replay_log(root, version=0)
    assert sorted(a["path"] for a in adds0) == ["f1.parquet", "f2.parquet"]
    assert meta["partitionColumns"] == []


def test_read_delta_fallback_end_to_end(spark, tmp_path):
    root = _make_table(str(tmp_path / "t"))
    e = xo.read_delta(root)
    got = e.order_by("k").execute(spark)
    assert got.k.tolist() == [1, 2, 4]       # f2's row removed at v1
    assert got.v.tolist() == [10.0, 20.0, 40.0]
    # time travel to v0 sees the removed file, not the later add
    got0 = xo.read_delta(root, version=0).order_by("k").execute(spark)
    assert got0.k.tolist() == [1, 2, 3]


def test_read_delta_partitioned(spark, tmp_path):
    root = _make_table(str(tmp_path / "t"), part=True)
    got = xo.read_delta(root).order_by("k").execute(spark)
    assert got.k.tolist() == [1, 2, 4]
    # partition column values come from the log, typed by the schema
    assert got.lang.tolist() == ["en", "en", "de"]


def test_reader_protocol_gate(tmp_path):
    root = str(tmp_path / "t")
    os.makedirs(os.path.join(root, "_delta_log"))
    _commit(os.path.join(root, "_delta_log"), 0, [
        {"protocol": {"minReaderVersion": 3, "minWriterVersion": 7}},
        _meta([("k", "long")]),
    ])
    with pytest.raises(DeltaProtocolError, match="reader protocol v3"):
        replay_log(root)


def test_not_a_delta_table(tmp_path):
    with pytest.raises(FileNotFoundError, match="_delta_log"):
        replay_log(str(tmp_path / "nope"))


def test_checkpoint_replay(tmp_path):
    """Checkpoint at v1 is the replay base; later JSON commits layer on."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    root = _make_table(str(tmp_path / "t"))
    log = os.path.join(root, "_delta_log")
    # checkpoint capturing post-v1 state: f1 + f3 active. (Real
    # checkpoints carry partitionValues as map<string,string>; pyarrow
    # can't write an EMPTY struct from pylist, and the reader treats a
    # missing key as no partition values, so the fixture omits it.)
    cp_rows = [
        {"add": {"path": "f1.parquet", "size": 1,
                 "modificationTime": 0, "dataChange": True},
         "metaData": None, "protocol": None},
        {"add": {"path": "f3.parquet", "size": 1,
                 "modificationTime": 0, "dataChange": True},
         "metaData": None, "protocol": None},
        {"add": None,
         "metaData": {
             k: v
             for k, v in json.loads(
                 open(os.path.join(log, f"{0:020d}.json")).readlines()[1]
             )["metaData"].items()
             # empty structs (configuration, format.options) are
             # unwritable from pylist; the reader only needs
             # schemaString + partitionColumns
             if k in ("id", "schemaString", "partitionColumns")
         },
         "protocol": {"minReaderVersion": 1}},
    ]
    pq.write_table(pa.Table.from_pylist(cp_rows), os.path.join(log, f"{1:020d}.checkpoint.parquet"))
    # remove the JSON commits at or before the checkpoint to prove the
    # checkpoint alone carries the state
    os.remove(os.path.join(log, f"{0:020d}.json"))
    adds, m = replay_log(root)
    assert sorted(a["path"] for a in adds) == ["f1.parquet", "f3.parquet"]
    assert m is not None


# --- writer + WAP on the log ------------------------------------------------


def test_write_delta_roundtrip(spark, tmp_path):
    from xorq_spark.delta import write_delta

    root = str(tmp_path / "t")
    df1 = spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string")
    v0 = write_delta(df1, root)
    assert v0 == 0
    df2 = spark.createDataFrame([(3, "c")], "k long, v string")
    v1 = write_delta(df2, root, mode="append")
    assert v1 == 1
    got = xo.read_delta(root).order_by("k").execute(spark)
    assert got.k.tolist() == [1, 2, 3]
    # overwrite retires every live file in one commit
    v2 = write_delta(df2, root, mode="overwrite")
    assert v2 == 2
    assert xo.read_delta(root).execute(spark).k.tolist() == [3]
    # time travel still sees the pre-overwrite snapshot
    old = xo.read_delta(root, version=1).order_by("k").execute(spark)
    assert old.k.tolist() == [1, 2, 3]


def test_write_delta_partitioned(spark, tmp_path):
    from xorq_spark.delta import write_delta

    root = str(tmp_path / "t")
    df = spark.createDataFrame(
        [(1, "en"), (2, "en"), (3, "de")], "k long, lang string"
    )
    write_delta(df, root, partition_by=["lang"])
    got = xo.read_delta(root).order_by("k").execute(spark)
    assert got.lang.tolist() == ["en", "en", "de"]
    # partition values live in the log, data files sit under lang=* dirs
    adds, meta = replay_log(root)
    assert meta["partitionColumns"] == ["lang"]
    assert all(a["partitionValues"]["lang"] in ("en", "de") for a in adds)


def test_wap_delta_publish_and_isolation(spark, tmp_path):
    from xorq_spark import writes
    from xorq_spark.delta import write_delta

    root = str(tmp_path / "t")
    base = spark.createDataFrame([(1, 10.0)], "k long, v double")
    write_delta(base, root)

    seen_during_audit = {}

    def audit_counts(staged):
        # concurrent-reader isolation: while the audit runs, the live
        # table still shows only the base snapshot
        seen_during_audit["live_rows"] = len(xo.read_delta(root).execute())
        return len(staged.execute()) == 2

    e = xo.memtable({"k": [2, 3], "v": [20.0, 30.0]})
    version = writes.write_audit_publish_delta(e, root, [audit_counts], spark)
    assert version == 1
    assert seen_during_audit["live_rows"] == 1
    got = xo.read_delta(root).order_by("k").execute(spark)
    assert got.k.tolist() == [1, 2, 3]


def test_wap_delta_audit_failure_rolls_back(spark, tmp_path):
    from xorq_spark import writes
    from xorq_spark.delta import write_delta

    root = str(tmp_path / "t")
    write_delta(spark.createDataFrame([(1, 10.0)], "k long, v double"), root)

    def reject(staged):
        return False

    e = xo.memtable({"k": [9], "v": [90.0]})
    with pytest.raises(writes.AuditError, match="reject"):
        writes.write_audit_publish_delta(e, root, [reject], spark)
    # table unchanged AND the staged files are gone
    assert xo.read_delta(root).execute(spark).k.tolist() == [1]
    files = [f for f in os.listdir(root) if f.endswith(".parquet")]
    adds, _ = replay_log(root)
    assert sorted(files) == sorted(a["path"] for a in adds)


def test_expr_to_delta_sink(spark, tmp_path):
    root = str(tmp_path / "t")
    e = xo.memtable({"k": [1, 2], "v": ["a", "b"]})
    v = e.to_delta(root, spark)
    assert v == 0
    v2 = xo.to_delta(xo.memtable({"k": [3], "v": ["c"]}), root, spark=spark)
    assert v2 == 1
    got = xo.read_delta(root).order_by("k").execute(spark)
    assert got.k.tolist() == [1, 2, 3]


def test_append_enforces_table_schema(spark, tmp_path):
    """Appending a wider-typed frame (int64 memtable onto an int32
    table) must cast to the committed schema — mixed physical widths
    previously made reads fail nondeterministically depending on which
    file won parquet schema inference (review regression)."""
    import pyarrow.parquet as pq

    from xorq_spark.delta import read_delta_fallback, write_delta

    table = str(tmp_path / "t")
    base = spark.createDataFrame([(1, "a"), (2, "b")], "k int, v string")
    write_delta(base, table)
    wide = spark.createDataFrame([(900, "z")], "k long, v string")
    write_delta(wide, table, mode="append")

    # every data file carries the committed physical type
    for fn in os.listdir(table):
        if fn.endswith(".parquet"):
            typ = str(pq.read_schema(os.path.join(table, fn)).field("k").type)
            assert typ == "int32", (fn, typ)
    out = read_delta_fallback(spark, table)
    assert dict(out.dtypes)["k"] == "int"
    assert sorted(r["k"] for r in out.collect()) == [1, 2, 900]


def test_append_missing_column_rejected(spark, tmp_path):
    from xorq_spark.delta import write_delta

    table = str(tmp_path / "t2")
    write_delta(spark.createDataFrame([(1, "a")], "k int, v string"), table)
    with pytest.raises(ValueError, match="missing table columns"):
        write_delta(spark.createDataFrame([(2,)], "k int"), table, mode="append")


def test_optimize_compact_preserves_rows_and_reduces_files(spark, tmp_path):
    import glob

    from xorq_spark.delta import (
        optimize_compact,
        read_delta_fallback,
        write_delta,
    )

    table = str(tmp_path / "t3")
    # many small appends -> many files
    for i in range(6):
        write_delta(
            spark.createDataFrame([(i, i * 10)], "k int, v int"),
            table,
            mode="append" if i else "append",
        )
    before = len(glob.glob(os.path.join(table, "*.parquet")))
    assert before >= 6
    v = optimize_compact(spark, table, target_files=1)
    out = read_delta_fallback(spark, table)
    assert sorted(r["k"] for r in out.collect()) == list(range(6))
    # live snapshot now reads from the compacted file set
    live_files = len(
        read_delta_fallback(spark, table).inputFiles()
    )
    assert live_files < before
    # time travel to the pre-compaction version still works (old files
    # remain on disk until vacuum)
    prev = read_delta_fallback(spark, table, version=v - 1)
    assert prev.count() == 6


def test_optimize_zorder_tightens_stats(spark, tmp_path):
    import pyarrow.parquet as pq
    import pyspark.sql.functions as F

    from xorq_spark.delta import optimize_compact, read_delta_fallback, write_delta

    table = str(tmp_path / "t4")
    df = spark.range(20_000).select(
        (F.col("id") * 48271 % 1021).cast("int").alias("a"),
        (F.col("id") * 16807 % 1019).cast("int").alias("b"),
    )
    write_delta(df.repartition(8), table)
    optimize_compact(spark, table, zorder=("a", "b"), target_files=16)
    out = read_delta_fallback(spark, table)
    assert out.count() == 20_000
    spans = []
    for f in out.inputFiles():
        path = f.replace("file://", "").replace("file:", "")
        md = pq.ParquetFile(path).metadata
        c = md.row_group(0).column(0)
        spans.append((c.path_in_schema, c.statistics.max - c.statistics.min))
    # z-ordered files cover narrow ranges of the first column: 16
    # z-range files = a 4x4 quadrant grid, ~1/4 the domain per file
    assert sum(s for _, s in spans) < 16 * 1020 / 2


def test_vacuum_removes_only_old_unreferenced_files(spark, tmp_path):
    import glob

    from xorq_spark.delta import (
        optimize_compact,
        read_delta_fallback,
        vacuum,
        write_delta,
    )

    table = str(tmp_path / "t5")
    for i in range(3):
        write_delta(spark.createDataFrame([(i,)], "k int"), table, mode="append")
    optimize_compact(spark, table, target_files=1)
    all_before = set(glob.glob(os.path.join(table, "*.parquet")))
    # retention window: nothing old enough yet
    assert vacuum(table, retention_hours=1.0) == []
    # zero retention (test only): unreferenced pre-compaction files go
    doomed = vacuum(table, retention_hours=0.0)
    assert len(doomed) >= 3
    out = read_delta_fallback(spark, table)
    assert sorted(r["k"] for r in out.collect()) == [0, 1, 2]
    assert set(glob.glob(os.path.join(table, "*.parquet"))) < all_before
    # dry_run reports nothing left to delete
    assert vacuum(table, retention_hours=0.0, dry_run=True) == []


def test_merge_upsert_updates_inserts_and_skips_files(spark, tmp_path):
    from xorq_spark.delta import merge_upsert, read_delta_fallback, replay_log, write_delta

    table = str(tmp_path / "t6")
    # two appends with DISJOINT key ranges -> two files with disjoint stats
    write_delta(
        spark.createDataFrame([(k, k * 10) for k in range(0, 5)], "k int, v int"),
        table,
    )
    write_delta(
        spark.createDataFrame([(k, k * 10) for k in range(100, 105)], "k int, v int"),
        table,
        mode="append",
    )
    live_before, _ = replay_log(table)
    assert len(live_before) >= 2
    assert all("stats" in a for a in live_before)  # stats recorded

    # source touches only the low range: update k=2, insert k=7
    src = spark.createDataFrame([(2, 999), (7, 777)], "k int, v int")
    merge_upsert(spark, table, src, ["k"])

    out = {r["k"]: r["v"] for r in read_delta_fallback(spark, table).collect()}
    assert out[2] == 999 and out[7] == 777          # updated + inserted
    assert out[0] == 0 and out[104] == 1040          # untouched rows intact
    assert len(out) == 11

    # file skipping: the high-range file must have survived unrewritten
    live_after, _ = replay_log(table)
    before_paths = {a["path"] for a in live_before}
    after_paths = {a["path"] for a in live_after}
    assert before_paths & after_paths, "stats-disjoint file was rewritten"


def test_merge_upsert_empty_source_is_noop_rows(spark, tmp_path):
    from xorq_spark.delta import merge_upsert, read_delta_fallback, write_delta

    table = str(tmp_path / "t7")
    write_delta(spark.createDataFrame([(1, 1)], "k int, v int"), table)
    src = spark.createDataFrame([], "k int, v int")
    merge_upsert(spark, table, src, ["k"])
    assert read_delta_fallback(spark, table).count() == 1


def test_checkpoint_log_bounds_replay_and_keeps_txns(spark, tmp_path):
    import glob

    from xorq_spark.delta import (
        checkpoint_log,
        last_txn_version,
        read_delta_fallback,
        write_delta,
        write_delta_txn,
    )

    table = str(tmp_path / "t8")
    for i in range(4):
        write_delta_txn(
            spark.createDataFrame([(i,)], "k int"), table, "appA", i
        )
    v = checkpoint_log(table)
    assert glob.glob(os.path.join(table, "_delta_log", "*.checkpoint.parquet"))
    # replay from the checkpoint sees the same rows
    assert sorted(r["k"] for r in read_delta_fallback(spark, table).collect()) == [0, 1, 2, 3]
    # txn state survives in the checkpoint: dedup still works even if
    # later lookups start from it
    assert last_txn_version(table, "appA") == 3
    assert write_delta_txn(spark.createDataFrame([(9,)], "k int"), table, "appA", 3) is None
    # post-checkpoint commits replay on top
    write_delta(spark.createDataFrame([(10,)], "k int"), table, mode="append")
    assert read_delta_fallback(spark, table).count() == 5
    # time travel to the checkpointed version itself still works
    assert read_delta_fallback(spark, table, version=v).count() == 4


def test_merge_upsert_on_date_key(spark, tmp_path):
    """Date/timestamp merge keys: stats store isoformat strings while
    the source envelope holds date objects — both sides must normalize
    before comparison (review regression)."""
    import datetime

    from xorq_spark.delta import merge_upsert, read_delta_fallback, write_delta

    table = str(tmp_path / "t9")
    write_delta(
        spark.createDataFrame(
            [(datetime.date(2024, 1, 1), 1), (datetime.date(2024, 6, 1), 2)],
            "d date, v int",
        ),
        table,
    )
    src = spark.createDataFrame(
        [(datetime.date(2024, 6, 1), 99), (datetime.date(2024, 7, 1), 7)],
        "d date, v int",
    )
    merge_upsert(spark, table, src, ["d"])
    out = {r["d"].isoformat(): r["v"] for r in read_delta_fallback(spark, table).collect()}
    assert out == {"2024-01-01": 1, "2024-06-01": 99, "2024-07-01": 7}


def test_merge_upsert_rejects_duplicate_source_keys(spark, tmp_path):
    """Delta MERGE contract: >1 source row per key is an error, not a
    silent multi-insert (a CDC feed with two updates for one key must
    be collapsed to last-write-wins BEFORE the merge)."""
    import pytest

    from xorq_spark.delta import merge_upsert, write_delta

    table = str(tmp_path / "t10")
    write_delta(spark.createDataFrame([(1, 10)], "k int, v int"), table)
    src = spark.createDataFrame([(1, 11), (1, 12), (2, 20)], "k int, v int")
    with pytest.raises(ValueError, match="multiple rows"):
        merge_upsert(spark, table, src, ["k"])


def test_commit_rewrite_detects_concurrent_remove(spark, tmp_path):
    """Optimistic concurrency: a rewrite commit whose snapshot is stale
    (a commit after it removed a file this rewrite also removes) must
    abort instead of resurrecting/doubling rows."""
    import os

    import pytest

    from xorq_spark.delta import (
        DeltaConcurrentWriteError,
        _atomic_commit,
        _commit_rewrite,
        _replay_log_full,
        write_delta,
    )

    table = str(tmp_path / "t11")
    write_delta(spark.createDataFrame([(k,) for k in range(4)], "k int"), table)
    log_dir = os.path.join(table, "_delta_log")
    live, _, snap = _replay_log_full(table)
    victim = live[0]["path"]

    # a competing writer removes the same file after our snapshot
    _atomic_commit(log_dir, [{"remove": {"path": victim, "dataChange": True}}])

    with pytest.raises(DeltaConcurrentWriteError, match="removed"):
        _commit_rewrite(
            log_dir,
            table,
            [{"remove": {"path": victim, "dataChange": False}}],
            snap,
        )
    # a non-conflicting rewrite (different file) still commits fine
    other = live[1]["path"]
    v = _commit_rewrite(
        log_dir, table, [{"remove": {"path": other, "dataChange": False}}], snap
    )
    assert v == snap + 2


def test_checkpoint_version_names_replayed_snapshot(spark, tmp_path):
    """checkpoint_log names the checkpoint for the snapshot it actually
    replayed (returned by _replay_log_full), and its txn map is capped
    at that version."""
    from xorq_spark.delta import (
        checkpoint_log,
        read_delta_fallback,
        write_delta,
        write_delta_txn,
    )

    table = str(tmp_path / "t12")
    write_delta(spark.createDataFrame([(1,)], "k int"), table)
    write_delta_txn(spark.createDataFrame([(2,)], "k int"), table, "app", 7)
    v = checkpoint_log(table)
    assert v == 1  # two commits: 0, 1
    # replay from the checkpoint sees both rows and the txn marker
    assert read_delta_fallback(spark, table).count() == 2
    from xorq_spark.delta import last_txn_version

    assert last_txn_version(table, "app") == 7


def test_delete_where_removes_rows_and_skips_files(spark, tmp_path):
    from xorq_spark.delta import (
        delete_where,
        read_delta_fallback,
        replay_log,
        write_delta,
    )

    table = str(tmp_path / "tdel")
    write_delta(
        spark.createDataFrame([(k, k * 10) for k in range(0, 5)], "k int, v int"),
        table,
    )
    write_delta(
        spark.createDataFrame(
            [(k, k * 10) for k in range(100, 105)], "k int, v int"
        ),
        table,
        mode="append",
    )
    live_before, _ = replay_log(table)

    v = delete_where(spark, table, "k IN (2, 3)")
    out = {r["k"] for r in read_delta_fallback(spark, table).collect()}
    assert out == {0, 1, 4} | set(range(100, 105))

    # the high-range file had no matches -> untouched (predicate-pruned)
    live_after, _ = replay_log(table)
    assert {a["path"] for a in live_before} & {a["path"] for a in live_after}

    # time travel still serves the pre-delete rows
    pre = read_delta_fallback(spark, table, version=v - 1)
    assert pre.where("k = 2").count() == 1


def test_delete_where_null_predicate_rows_kept(spark, tmp_path):
    from xorq_spark.delta import delete_where, read_delta_fallback, write_delta

    table = str(tmp_path / "tdel2")
    write_delta(
        spark.createDataFrame(
            [(1, 10), (2, None), (3, 30)], "k int, v int"
        ),
        table,
    )
    delete_where(spark, table, "v > 15")  # NULL v: predicate NULL -> keep
    out = {r["k"] for r in read_delta_fallback(spark, table).collect()}
    assert out == {1, 2}


def test_delete_where_no_match_is_noop_version(spark, tmp_path):
    from xorq_spark.delta import delete_where, replay_log, write_delta

    table = str(tmp_path / "tdel3")
    v0 = write_delta(
        spark.createDataFrame([(1, 10)], "k int, v int"), table
    )
    live_before, _ = replay_log(table)
    v = delete_where(spark, table, "k = 999")
    assert v == v0  # nothing matched: no new commit
    live, _ = replay_log(table)
    assert {a["path"] for a in live} == {a["path"] for a in live_before}


def test_commit_version_survives_log_cleanup(spark, tmp_path):
    """Round-7 fix: version numbering must count checkpoint files too —
    after JSON commits are cleaned up past a checkpoint, the next
    writer used to restart at version 0 and overwrite history."""
    import os

    from xorq_spark.delta import (
        checkpoint_log,
        read_delta_fallback,
        write_delta,
    )

    table = str(tmp_path / "t")
    write_delta(spark.createDataFrame([(1, "a")], "k long, v string"), table)  # v0
    write_delta(
        spark.createDataFrame([(2, "b")], "k long, v string"), table, mode="append"
    )  # v1
    assert checkpoint_log(table) == 1
    log_dir = os.path.join(table, "_delta_log")
    for fn in ("00000000000000000000.json", "00000000000000000001.json"):
        os.unlink(os.path.join(log_dir, fn))
    write_delta(
        spark.createDataFrame([(3, "c")], "k long, v string"), table, mode="append"
    )
    assert os.path.exists(os.path.join(log_dir, "00000000000000000002.json"))
    rows = sorted(
        (r["k"], r["v"]) for r in read_delta_fallback(spark, table).collect()
    )
    assert rows == [(1, "a"), (2, "b"), (3, "c")]


def test_checkpoint_preserves_table_properties(spark, tmp_path):
    """Round-7 fix: the checkpoint's metaData carries configuration —
    dropping it silently disabled delta.enableChangeDataFeed for any
    replay starting at the checkpoint."""
    from xorq_spark.delta import checkpoint_log, replay_log, set_table_property, write_delta

    table = str(tmp_path / "t")
    write_delta(spark.createDataFrame([(1, "a")], "k long, v string"), table)
    set_table_property(table, "delta.enableChangeDataFeed", "true")
    checkpoint_log(table)
    import os

    log_dir = os.path.join(table, "_delta_log")
    for fn in list(os.listdir(log_dir)):
        if fn.endswith(".json"):
            os.unlink(os.path.join(log_dir, fn))
    _, meta = replay_log(table)
    assert (meta.get("configuration") or {}).get(
        "delta.enableChangeDataFeed"
    ) == "true"


def test_checkpoint_configuration_is_map_type(spark, tmp_path):
    """Round-8 ADVICE fix: checkpointed metaData.configuration is the
    Delta spec's map<string,string> on disk (interoperable), not a
    pyarrow-inferred struct keyed by property names — and round-trips
    back to a dict through _read_checkpoint."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from xorq_spark.delta import (
        _read_checkpoint,
        checkpoint_log,
        set_table_property,
        write_delta,
    )

    table = str(tmp_path / "t")
    write_delta(
        spark.createDataFrame([(1, "a")], "k long, v string"), table
    )
    set_table_property(table, "delta.enableChangeDataFeed", "true")
    v = checkpoint_log(table)
    cp = os.path.join(table, "_delta_log", f"{v:020d}.checkpoint.parquet")
    md_type = pq.read_schema(cp).field("metaData").type
    cfg_type = md_type.field("configuration").type
    assert pa.types.is_map(cfg_type), cfg_type
    _adds, meta, _rv, _txns = _read_checkpoint(cp)
    assert meta["configuration"] == {"delta.enableChangeDataFeed": "true"}
