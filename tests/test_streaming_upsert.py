"""stream_upsert_to_delta: exactly-once streaming CDC MERGE — batch
collapse (last-write-wins), txn-marker idempotence, restart behavior —
and the merge_upsert app_id/txn_version surface it builds on."""

import pyspark.sql.functions as F
import pytest


def _read(spark, table):
    from xorq_spark.delta import read_delta_fallback

    return {r["k"]: (r["v"], r["seq"]) for r in read_delta_fallback(spark, table).collect()}


def test_merge_upsert_txn_replay_is_noop(spark, tmp_path):
    from xorq_spark.delta import merge_upsert, read_delta_fallback, write_delta

    table = str(tmp_path / "t")
    write_delta(
        spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string"), table
    )
    src = spark.createDataFrame([(2, "B"), (3, "C")], "k long, v string")
    v1 = merge_upsert(spark, table, src, ["k"], app_id="cdc", txn_version=0)
    assert v1 is not None
    # re-delivery of the SAME txn version: no-op, table unchanged
    src2 = spark.createDataFrame([(2, "XXX")], "k long, v string")
    assert merge_upsert(spark, table, src2, ["k"], app_id="cdc", txn_version=0) is None
    out = {r["k"]: r["v"] for r in read_delta_fallback(spark, table).collect()}
    assert out == {1: "a", 2: "B", 3: "C"}
    # a LATER version commits
    assert (
        merge_upsert(spark, table, src2, ["k"], app_id="cdc", txn_version=1)
        is not None
    )
    out = {r["k"]: r["v"] for r in read_delta_fallback(spark, table).collect()}
    assert out[2] == "XXX"


def test_merge_upsert_txn_creates_table_with_marker(spark, tmp_path):
    from xorq_spark.delta import last_txn_version, merge_upsert

    table = str(tmp_path / "fresh")
    src = spark.createDataFrame([(1, "a")], "k long, v string")
    assert merge_upsert(spark, table, src, ["k"], app_id="cdc", txn_version=0) is not None
    assert last_txn_version(table, "cdc") == 0
    # replay against the freshly created table is still deduped
    assert merge_upsert(spark, table, src, ["k"], app_id="cdc", txn_version=0) is None


def test_merge_upsert_txn_param_validation(spark, tmp_path):
    from xorq_spark.delta import merge_upsert

    src = spark.createDataFrame([(1, "a")], "k long, v string")
    with pytest.raises(ValueError, match="together"):
        merge_upsert(spark, str(tmp_path / "x"), src, ["k"], app_id="cdc")


def test_stream_upsert_collapses_last_write_wins(spark, tmp_path):
    """A micro-batch carrying several updates to one key must collapse
    to the greatest order_col value (raw merge_upsert would reject it)."""
    from xorq_spark import streaming as S
    from xorq_spark.delta import write_delta

    table = str(tmp_path / "t")
    write_delta(
        spark.createDataFrame(
            [(1, "old", 0)], "k long, v string, seq long"
        ),
        table,
    )
    src = str(tmp_path / "changes")
    spark.createDataFrame(
        [(1, "mid", 5), (1, "new", 9), (2, "ins", 1)],
        "k long, v string, seq long",
    ).coalesce(1).write.parquet(src)

    stream = spark.readStream.schema("k long, v string, seq long").parquet(
        f"{src}/*.parquet"
    )
    S.stream_upsert_to_delta(
        stream, table, str(tmp_path / "ckpt"), ["k"], order_col="seq"
    )
    assert _read(spark, table) == {1: ("new", 9), 2: ("ins", 1)}


def test_stream_upsert_exactly_once_across_restarts(spark, tmp_path):
    """Drain, restart with the same checkpoint (no new data -> no new
    commit), append new files, drain again; then a crash-window replay
    with a FRESH checkpoint but the same app_id is a txn no-op."""
    from xorq_spark import streaming as S
    from xorq_spark.delta import _commit_version
    import os

    table = str(tmp_path / "t")
    src = str(tmp_path / "changes")
    ckpt = str(tmp_path / "ckpt")
    schema = "k long, v string, seq long"
    spark.createDataFrame([(1, "a", 1), (2, "b", 1)], schema).coalesce(
        1
    ).write.parquet(src)

    def run(checkpoint):
        stream = spark.readStream.schema(schema).parquet(f"{src}/*.parquet")
        S.stream_upsert_to_delta(
            stream, table, checkpoint, ["k"], order_col="seq", app_id="cdc"
        )

    run(ckpt)
    assert _read(spark, table) == {1: ("a", 1), 2: ("b", 1)}
    log_dir = os.path.join(table, "_delta_log")
    v_after_first = _commit_version(log_dir)

    # same checkpoint, nothing new: no commit at all
    run(ckpt)
    assert _commit_version(log_dir) == v_after_first

    # new CDC file lands: only the delta merges
    spark.createDataFrame([(2, "B", 2), (3, "c", 1)], schema).coalesce(
        1
    ).write.parquet(src, mode="append")
    run(ckpt)
    assert _read(spark, table) == {1: ("a", 1), 2: ("B", 2), 3: ("c", 1)}

    # crash-window: a fresh checkpoint re-delivers batch 0 under the
    # same app_id — the txn marker dedups it, the table is untouched
    v_before = _commit_version(log_dir)
    run(str(tmp_path / "ckpt2"))
    assert _commit_version(log_dir) == v_before
    assert _read(spark, table) == {1: ("a", 1), 2: ("B", 2), 3: ("c", 1)}


def test_stream_upsert_without_order_col_requires_unique_batch(spark, tmp_path):
    """No order_col means no collapse: a multi-row key in a batch must
    surface merge_upsert's contract error, not silently multi-insert."""
    from pyspark.errors.exceptions.captured import StreamingQueryException

    from xorq_spark import streaming as S

    src = str(tmp_path / "changes")
    spark.createDataFrame(
        [(1, "x"), (1, "y")], "k long, v string"
    ).coalesce(1).write.parquet(src)
    stream = spark.readStream.schema("k long, v string").parquet(
        f"{src}/*.parquet"
    )
    with pytest.raises(StreamingQueryException, match="multiple rows"):
        S.stream_upsert_to_delta(
            stream, str(tmp_path / "t"), str(tmp_path / "ckpt"), ["k"]
        )


def test_merge_upsert_zombie_writer_same_txn_aborts(spark, tmp_path):
    """Round-7 ADVICE fix: the (app_id, txn_version) dedup in
    merge_upsert is check-then-act, so a competing writer of the SAME
    micro-batch that commits between our entry check and our publish
    must be caught by _commit_rewrite's pre-link txn re-scan — an
    insert-only batch has no remove actions, so the remove-conflict
    check alone cannot stop the double-apply."""
    import os

    from xorq_spark.delta import (
        _commit_rewrite,
        merge_upsert,
        read_delta_fallback,
        stage_delta_files,
        write_delta,
    )

    table = str(tmp_path / "t")
    write_delta(
        spark.createDataFrame([(1, "a")], "k long, v string"), table
    )  # v0
    log_dir = os.path.join(table, "_delta_log")
    # zombie writer Z captured its cursor at v0 (before v1 exists) ...
    txn_scan_from = 1
    # ... then the WINNER commits batch 7 (insert-only: key 9 matches
    # no live file's stats range, so no removes) as v1
    src = spark.createDataFrame([(9, "win")], "k long, v string")
    assert merge_upsert(spark, table, src, ["k"], app_id="s", txn_version=7) == 1
    # Z now publishes its own staging of the same (app_id=s, txn=7):
    # the pre-link re-scan from Z's cursor must see the winner and
    # abort as a no-op, unstaging Z's files.
    dup = spark.createDataFrame([(9, "zombie")], "k long, v string")
    actions = [{"txn": {"appId": "s", "version": 7}}]
    actions.extend(stage_delta_files(dup, table))
    staged = [a["add"]["path"] for a in actions if "add" in a]
    assert all(os.path.exists(os.path.join(table, p)) for p in staged)
    got = _commit_rewrite(log_dir, table, actions, 1, txn_scan_from=txn_scan_from)
    assert got is None
    assert not any(os.path.exists(os.path.join(table, p)) for p in staged)
    out = sorted((r["k"], r["v"]) for r in read_delta_fallback(spark, table).collect())
    assert out == [(1, "a"), (9, "win")]
