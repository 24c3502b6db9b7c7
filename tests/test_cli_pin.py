"""`pin` / `unpin` CLI verbs (reference test model: tests/test_cli_pin.py,
catalog/tests/test_cli_pin.py): freeze a build's CachedNodes into
CacheTags in place, cold-cache error contract, -e materialization,
round-trip back to live caches."""

from __future__ import annotations

import os
import subprocess
import sys

import pandas as pd
import pytest

import xorq_spark as xo
from xorq_spark import _
from xorq_spark import cache as C
from xorq_spark.builds import build, load
from xorq_spark.cli import main
from xorq_spark.expr import nodes as N


@pytest.fixture(autouse=True)
def cache_dir(tmp_path, monkeypatch):
    monkeypatch.setenv("XORQ_SPARK_CACHE_DIR", str(tmp_path / "cache"))
    yield str(tmp_path / "cache")


@pytest.fixture
def src(tmp_path):
    p = str(tmp_path / "data.parquet")
    pd.DataFrame({"a": [1, 2, 3], "b": [4, 5, 6]}).to_parquet(p)
    return p


def _cached_build(src, tmp_path) -> str:
    expr = xo.deferred_read_parquet(src).filter(_.a > 1).cache()
    return build(expr, str(tmp_path / "builds"))


@pytest.mark.parametrize("verb", ["pin", "unpin"])
def test_pin_cli_help_smoke_subprocess(verb):
    """`python -m xorq_spark {pin,unpin} --help` via a real subprocess
    (reference: test_pin_cli_help_smoke_subprocess — in-process runners
    hide import-time cold-start regressions)."""
    out = subprocess.run(
        [sys.executable, "-m", "xorq_spark", verb, "--help"],
        capture_output=True,
        text=True,
        cwd="/root/repo",
    )
    assert out.returncode == 0, out.stderr
    assert verb in out.stdout


def test_pin_cold_cache_is_clean_error(spark, src, tmp_path, capsys):
    """Pinning an unpopulated cache without -e fails with the
    populate-first hint instead of silently running the expression
    (reference: apply_pin_transform's IntegrityError translation)."""
    bd = _cached_build(src, tmp_path)
    rc = main(["pin", bd, "--builds-dir", str(tmp_path / "builds")])
    assert rc == 1
    err = capsys.readouterr().err
    assert "not materialized" in err and "run-cached" in err


def test_pin_ensure_materialized_and_roundtrip(spark, src, tmp_path, capsys):
    """pin -e materializes, the pinned build reads the artifact even
    after the source vanishes, and unpin restores a live CachedNode."""
    bd = _cached_build(src, tmp_path)
    assert main(["pin", bd, "-e", "--builds-dir",
                 str(tmp_path / "builds")]) == 0
    pinned_dir = capsys.readouterr().out.strip().splitlines()[-1]
    pinned = load(pinned_dir, spark)
    assert isinstance(pinned.node, N.CacheTag)

    assert main(["unpin", pinned_dir, "--builds-dir",
                 str(tmp_path / "builds")]) == 0
    unpinned_dir = capsys.readouterr().out.strip().splitlines()[-1]
    unpinned = load(unpinned_dir, spark)
    assert isinstance(unpinned.node, N.CachedNode)
    # thawed cache replays from the already-warm (mtime-keyed) artifact
    # while the source is still present
    assert unpinned.execute(spark).a.tolist() == [2, 3]

    os.remove(src)  # a PINNED read must not touch the source at all
    assert pinned.execute(spark).a.tolist() == [2, 3]


def test_pin_after_materializing_run_needs_no_flag(spark, src, tmp_path, capsys):
    """Populate through the cache layer first (run-cached's job), then
    a plain pin freezes without -e (reference contract)."""
    bd = _cached_build(src, tmp_path)
    expr = load(bd, spark)
    expr.execute(spark)  # materializes the cache artifact
    assert main(["pin", bd, "--builds-dir", str(tmp_path / "builds")]) == 0
    pinned_dir = capsys.readouterr().out.strip().splitlines()[-1]
    assert isinstance(load(pinned_dir, spark).node, N.CacheTag)


def test_pinned_key_is_stable_across_builds(spark, src, tmp_path, capsys):
    """The CacheTag key survives the build round-trip byte-identically
    (the frozen artifact address IS the contract)."""
    bd = _cached_build(src, tmp_path)
    expr = load(bd, spark)
    expr.execute(spark)
    key = C.calc_key(expr.node.parent, expr.node.strategy)
    assert main(["pin", bd, "--builds-dir", str(tmp_path / "builds")]) == 0
    pinned_dir = capsys.readouterr().out.strip().splitlines()[-1]
    assert load(pinned_dir, spark).node.key == key
