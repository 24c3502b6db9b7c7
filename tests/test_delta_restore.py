"""restore_table / table_history: metadata-only rollback as a new
commit, vacuum-horizon failure, history inference."""

import pytest


def _rows(spark, table, version=None):
    from xorq_spark.delta import read_delta_fallback

    return sorted(
        (r["k"], r["v"]) for r in read_delta_fallback(spark, table, version).collect()
    )


def _mk(spark, tmp_path):
    from xorq_spark.delta import write_delta

    table = str(tmp_path / "t")
    write_delta(
        spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string"), table
    )  # v0
    write_delta(
        spark.createDataFrame([(3, "c")], "k long, v string"), table
    )  # v1 append
    return table


def test_restore_rolls_back_as_new_commit(spark, tmp_path):
    from xorq_spark.delta import _commit_version, delete_where, restore_table
    import os

    table = _mk(spark, tmp_path)
    delete_where(spark, table, "k = 1")  # v2
    assert _rows(spark, table) == [(2, "b"), (3, "c")]

    v = restore_table(spark, table, 0)
    assert v == 3  # a NEW commit, not history rewriting
    assert _rows(spark, table) == [(1, "a"), (2, "b")]
    # every intermediate version still time-travels
    assert _rows(spark, table, 0) == [(1, "a"), (2, "b")]
    assert _rows(spark, table, 1) == [(1, "a"), (2, "b"), (3, "c")]
    assert _rows(spark, table, 2) == [(2, "b"), (3, "c")]
    assert _commit_version(os.path.join(table, "_delta_log")) == 4


def test_restore_to_current_snapshot_is_noop(spark, tmp_path):
    from xorq_spark.delta import restore_table

    table = _mk(spark, tmp_path)
    v = restore_table(spark, table, 1)  # already the live snapshot
    assert v == 1
    assert _rows(spark, table) == [(1, "a"), (2, "b"), (3, "c")]


def test_restore_forward_after_restore_back(spark, tmp_path):
    from xorq_spark.delta import restore_table

    table = _mk(spark, tmp_path)
    restore_table(spark, table, 0)  # v2: back to v0
    restore_table(spark, table, 1)  # v3: forward again (revert the revert)
    assert _rows(spark, table) == [(1, "a"), (2, "b"), (3, "c")]


def test_restore_past_vacuum_horizon_fails_loudly(spark, tmp_path):
    from xorq_spark.delta import restore_table, vacuum, write_delta

    table = str(tmp_path / "t")
    write_delta(
        spark.createDataFrame([(1, "a")], "k long, v string"), table
    )  # v0
    write_delta(
        spark.createDataFrame([(9, "z")], "k long, v string"),
        table,
        mode="overwrite",
    )  # v1: v0's file becomes historical
    vacuum(table, retention_hours=0.0)
    with pytest.raises(ValueError, match="vacuum"):
        restore_table(spark, table, 0)
    # table itself is untouched by the failed restore
    assert _rows(spark, table) == [(9, "z")]


def test_table_history_operations(spark, tmp_path):
    from xorq_spark.delta import delete_where, restore_table, table_history

    table = _mk(spark, tmp_path)
    delete_where(spark, table, "k = 3")
    restore_table(spark, table, 1)
    hist = table_history(table)
    assert [h["version"] for h in hist] == [3, 2, 1, 0]
    assert hist[0]["operation"] == "RESTORE"  # explicit commitInfo
    assert hist[0]["n_adds"] >= 1
    assert hist[3]["operation"].startswith("CREATE TABLE")
    ops = {h["version"]: h["operation"] for h in hist}
    assert ops[1] == "WRITE"  # adds only, inferred
    assert all(h["timestamp_ms"] > 0 for h in hist)


def test_table_history_streaming_txn_inferred(spark, tmp_path):
    from xorq_spark.delta import table_history, write_delta_txn

    table = str(tmp_path / "t")
    write_delta_txn(
        spark.createDataFrame([(1, "a")], "k long, v string"), table, "app", 0
    )
    hist = table_history(table)
    assert hist[0]["has_txn"]
