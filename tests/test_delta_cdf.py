"""Change Data Feed: cdc actions on DELETE/MERGE when
delta.enableChangeDataFeed is set, derived inserts on appends, the
version-range reader, and the rewrite-without-cdc refusal."""

import pytest


def _changes(spark, table, lo, hi=None):
    from xorq_spark.delta import read_table_changes

    rows = read_table_changes(spark, table, lo, hi).collect()
    return sorted(
        (r["_commit_version"], r["_change_type"], r["k"], r["v"]) for r in rows
    )


def _mk_cdf_table(spark, tmp_path):
    from xorq_spark.delta import set_table_property, write_delta

    table = str(tmp_path / "t")
    write_delta(
        spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string"), table
    )  # v0
    set_table_property(table, "delta.enableChangeDataFeed", "true")  # v1
    return table


def test_append_derives_inserts(spark, tmp_path):
    from xorq_spark.delta import write_delta

    table = _mk_cdf_table(spark, tmp_path)
    write_delta(spark.createDataFrame([(3, "c")], "k long, v string"), table)
    assert _changes(spark, table, 0) == [
        (0, "insert", 1, "a"),
        (0, "insert", 2, "b"),
        (2, "insert", 3, "c"),
    ]
    # range narrowing
    assert _changes(spark, table, 2) == [(2, "insert", 3, "c")]


def test_delete_writes_exact_cdc_rows(spark, tmp_path):
    from xorq_spark.delta import delete_where

    table = _mk_cdf_table(spark, tmp_path)
    delete_where(spark, table, "k = 1")  # v2
    assert _changes(spark, table, 2) == [(2, "delete", 1, "a")]


def test_merge_writes_pre_post_and_insert(spark, tmp_path):
    from xorq_spark.delta import merge_upsert

    table = _mk_cdf_table(spark, tmp_path)
    src = spark.createDataFrame([(2, "B"), (3, "c")], "k long, v string")
    merge_upsert(spark, table, src, ["k"])  # v2
    assert _changes(spark, table, 2) == [
        (2, "insert", 3, "c"),
        (2, "update_postimage", 2, "B"),
        (2, "update_preimage", 2, "b"),
    ]


def test_property_commit_is_changeless(spark, tmp_path):
    table = _mk_cdf_table(spark, tmp_path)
    assert _changes(spark, table, 1, 1) == []


def test_rewrite_without_cdf_refused(spark, tmp_path):
    from xorq_spark.delta import delete_where, write_delta

    table = str(tmp_path / "t")
    write_delta(
        spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string"), table
    )
    delete_where(spark, table, "k = 1")  # rewrite, CDF off: no cdc rows
    with pytest.raises(ValueError, match="enableChangeDataFeed"):
        _changes(spark, table, 0)
    # append-only prefix still readable
    assert _changes(spark, table, 0, 0) == [
        (0, "insert", 1, "a"),
        (0, "insert", 2, "b"),
    ]


def test_cdf_table_reads_normally(spark, tmp_path):
    from xorq_spark.delta import delete_where, read_delta_fallback

    table = _mk_cdf_table(spark, tmp_path)
    delete_where(spark, table, "k = 1")
    # cdc files under _change_data/ must be invisible to snapshot reads
    rows = sorted(
        (r["k"], r["v"]) for r in read_delta_fallback(spark, table).collect()
    )
    assert rows == [(2, "b")]


def test_streaming_cdc_roundtrip_in_to_out(spark, tmp_path):
    """CDC in (stream_upsert_to_delta) -> CDC out (read_table_changes):
    the full mirror pipeline."""
    from xorq_spark import streaming as S
    from xorq_spark.delta import set_table_property, write_delta

    table = str(tmp_path / "t")
    write_delta(
        spark.createDataFrame(
            [(1, "a", 0)], "k long, v string, seq long"
        ),
        table,
    )
    set_table_property(table, "delta.enableChangeDataFeed", "true")
    src = str(tmp_path / "changes")
    spark.createDataFrame(
        [(1, "A", 5), (2, "b", 1)], "k long, v string, seq long"
    ).coalesce(1).write.parquet(src)
    stream = spark.readStream.schema("k long, v string, seq long").parquet(
        f"{src}/*.parquet"
    )
    S.stream_upsert_to_delta(
        stream, table, str(tmp_path / "ckpt"), ["k"], order_col="seq"
    )
    from xorq_spark.delta import read_table_changes, _commit_version
    import os

    v = _commit_version(os.path.join(table, "_delta_log")) - 1
    got = sorted(
        (r["_change_type"], r["k"], r["v"])
        for r in read_table_changes(spark, table, v, v).collect()
    )
    assert got == [
        ("insert", 2, "b"),
        ("update_postimage", 1, "A"),
        ("update_preimage", 1, "a"),
    ]


def test_vacuum_reaps_aged_cdc_files(spark, tmp_path):
    """cdc files follow the same retention contract as removed data
    files: a zero-retention vacuum deletes them (delta-spark parity)."""
    import os

    from xorq_spark.delta import delete_where, vacuum

    table = _mk_cdf_table(spark, tmp_path)
    delete_where(spark, table, "k = 1")
    cdc_dir = os.path.join(table, "_change_data")
    assert os.listdir(cdc_dir)
    doomed = vacuum(table, retention_hours=0.0, dry_run=True)
    assert any(p.startswith("_change_data/") for p in doomed)
    vacuum(table, retention_hours=0.0)
    assert not [f for f in os.listdir(cdc_dir) if f.endswith(".parquet")]


def test_restore_emits_cdf_rows(spark, tmp_path):
    """Round-7 ADVICE fix: RESTORE on a CDF-enabled table stages cdc
    delete rows for files leaving the snapshot and insert rows for
    files returning — delta-spark emits CDF for RESTORE, and without
    it read_table_changes over a range containing the RESTORE commit
    raised the rewrite-without-cdc refusal."""
    from xorq_spark.delta import restore_table, write_delta

    table = _mk_cdf_table(spark, tmp_path)  # v0 data, v1 property
    write_delta(
        spark.createDataFrame([(3, "c")], "k long, v string"),
        table,
        mode="append",
    )  # v2
    v = restore_table(spark, table, 1)  # roll v2's file back out
    assert _changes(spark, table, v) == [(v, "delete", 3, "c")]
    # restoring forward re-adds the file -> insert rows
    v2 = restore_table(spark, table, 2)
    assert _changes(spark, table, v2) == [(v2, "insert", 3, "c")]
    # and the whole feed reads end to end (no refusal anywhere)
    all_rows = _changes(spark, table, 0)
    assert (v, "delete", 3, "c") in all_rows and (v2, "insert", 3, "c") in all_rows


def test_cdf_abort_unstages_cdc_files(spark, tmp_path):
    """Round-7 ADVICE fix: an aborted CDF-enabled rewrite must unlink
    its staged _change_data files, not just its add files."""
    import os

    from xorq_spark.delta import _cleanup_orphan_adds, _stage_cdc_files
    import pyspark.sql.functions as F

    table = _mk_cdf_table(spark, tmp_path)
    cdc = spark.createDataFrame([(1, "a")], "k long, v string").withColumn(
        "_change_type", F.lit("delete")
    )
    actions = _stage_cdc_files(cdc, table)
    paths = [a["cdc"]["path"] for a in actions]
    assert paths and all(os.path.exists(os.path.join(table, p)) for p in paths)
    _cleanup_orphan_adds(table, actions)
    assert not any(os.path.exists(os.path.join(table, p)) for p in paths)


def test_remove_attribution_survives_log_cleanup_via_checkpoint(spark, tmp_path):
    """Round-7 ADVICE fix: the CDF reader seeds its remove-attribution
    map from the newest checkpoint before the range, so deletes whose
    add landed in a JSON commit cleaned up past a checkpoint still
    attribute; an unattributable remove raises instead of silently
    dropping feed rows."""
    import os

    from xorq_spark.delta import checkpoint_log, delete_where, write_delta

    table = _mk_cdf_table(spark, tmp_path)  # v0 adds k=1,2; v1 property
    checkpoint_log(table)  # checkpoint at v1
    # simulate log cleanup: remove the JSON commits the checkpoint covers
    log_dir = os.path.join(table, "_delta_log")
    for fn in ("00000000000000000000.json", "00000000000000000001.json"):
        os.unlink(os.path.join(log_dir, fn))
    delete_where(spark, table, "k = 1")  # v2: delete from the v0 file
    assert _changes(spark, table, 2) == [(2, "delete", 1, "a")]


def test_changes_for_cleaned_in_range_commit_raise(spark, tmp_path):
    """Round-8 ADVICE fix: a commit INSIDE the requested [lo, hi] whose
    JSON file was cleaned past a checkpoint raises (its change rows are
    unrecoverable) instead of silently dropping feed rows — the same
    refusal delta-spark makes."""
    import os

    import pytest

    from xorq_spark.delta import checkpoint_log, read_table_changes, write_delta

    table = _mk_cdf_table(spark, tmp_path)  # v0 adds k=1,2; v1 property
    write_delta(
        spark.createDataFrame([(3, "c")], "k long, v string"),
        table,
        mode="append",
    )  # v2
    checkpoint_log(table)  # checkpoint at v2
    log_dir = os.path.join(table, "_delta_log")
    os.unlink(os.path.join(log_dir, "00000000000000000002.json"))
    with pytest.raises(ValueError, match="cleaned past a checkpoint"):
        read_table_changes(spark, table, 2, 2)
