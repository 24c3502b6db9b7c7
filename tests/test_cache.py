"""Cache + tokenizer semantics (reference test model: tests/test_cache.py,
common/utils/tests/test_hash_contract.py — SURVEY §5.3-5.4): hit/miss,
mtime invalidation, snapshot stability, TTL expiry, pin/unpin,
cross-process token stability."""

from __future__ import annotations

import os
import shutil
import subprocess
import sys
import time

import pandas as pd
import pytest

import xorq_spark as xo
from xorq_spark import _
from xorq_spark import cache as C
from xorq_spark.tokenize import tokenize


@pytest.fixture(autouse=True)
def cache_dir(tmp_path, monkeypatch):
    monkeypatch.setenv("XORQ_SPARK_CACHE_DIR", str(tmp_path / "cache"))
    yield str(tmp_path / "cache")


@pytest.fixture
def src(tmp_path, spark):
    p = str(tmp_path / "src.parquet")
    pd.DataFrame({"k": [1, 1, 2, 2, 3], "v": [1.0, 2.0, 3.0, 4.0, 5.0]}).to_parquet(p)
    return p


def _expr(path):
    return (
        xo.deferred_read_parquet(path)
        .group_by("k")
        .agg(s=_.v.sum())
    )


def test_token_stability_and_sensitivity(src):
    e = _expr(src)
    t1 = tokenize(e.node)
    t2 = tokenize(_expr(src).node)
    assert t1 == t2  # same pipeline -> same token
    other = _expr(src).filter(_.s > 0)
    assert tokenize(other.node) != t1  # structure change -> new token
    assert tokenize(e.node, "snapshot") != t1  # strategies keyed apart


def test_token_stable_across_processes(src):
    e = _expr(src)
    local = tokenize(e.node)
    code = (
        "import xorq_spark as xo\n"
        "from xorq_spark import _\n"
        "from xorq_spark.tokenize import tokenize\n"
        f"e = xo.deferred_read_parquet({src!r}).group_by('k').agg(s=_.v.sum())\n"
        "print(tokenize(e.node))\n"
    )
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    assert out.returncode == 0, out.stderr
    assert out.stdout.strip() == local


def test_cache_hit_and_mtime_invalidation(spark, src):
    e = _expr(src).cache()
    key = C.calc_key(e.node.parent, "mtime")
    assert not C.exists(key)
    r1 = e.execute(spark).sort_values("k")
    assert C.exists(key)  # materialized on miss
    assert r1.s.tolist() == [3.0, 7.0, 5.0]

    # Re-execution hits the artifact: result identical, no rewrite.
    marker = os.path.join(C.artifact_path(key), "_SUCCESS")
    m1 = os.path.getmtime(marker)
    r2 = e.execute(spark).sort_values("k")
    assert r2.s.tolist() == r1.s.tolist()
    assert os.path.getmtime(marker) == m1

    # mtime strategy: new data at the same path -> new key -> recompute.
    pd.DataFrame({"k": [9], "v": [9.0]}).to_parquet(src)
    key2 = C.calc_key(e.node.parent, "mtime")
    assert key2 != key
    r3 = e.execute(spark)
    assert r3.s.tolist() == [9.0]


def test_snapshot_survives_data_change(spark, src):
    e = _expr(src).cache(strategy="snapshot")
    key = C.calc_key(e.node.parent, "snapshot")
    r1 = e.execute(spark).sort_values("k")
    # rewrite the source with different data; snapshot key is unchanged
    pd.DataFrame({"k": [9], "v": [9.0]}).to_parquet(src)
    assert C.calc_key(e.node.parent, "snapshot") == key
    r2 = e.execute(spark).sort_values("k")
    assert r2.s.tolist() == r1.s.tolist()  # stale by design


def test_ttl_expiry(spark, src):
    e = _expr(src).cache(strategy="ttl:0.5")
    e.execute(spark)
    key = C.calc_key(e.node.parent, "ttl:0.5")
    marker = os.path.join(C.artifact_path(key), "_SUCCESS")
    old = os.path.getmtime(marker)
    time.sleep(0.6)
    # expired: re-execution rewrites the artifact
    e.execute(spark)
    assert os.path.getmtime(marker) > old


def test_pin_unpin_roundtrip(spark, src):
    e = _expr(src).cache()
    pinned = C.pin(e)
    from xorq_spark.expr import nodes as N

    assert isinstance(pinned.node, N.CacheTag)
    # pinned expr reads the artifact even after source deleted
    os.remove(src)
    assert pinned.execute(spark).s.sum() == 15.0
    unpinned = C.unpin(pinned)
    assert isinstance(unpinned.node, N.CachedNode)
    assert unpinned.node == e.node


def test_ls_accessor(spark, src):
    e = _expr(src).cache()
    assert len(e.ls.cached_nodes) == 1
    assert isinstance(e.ls.tokenized, str)
    assert len(e.ls.uncached.ls.cached_nodes) == 0
    assert len(e.ls.source_nodes) == 1


def test_reference_named_storage_flavors(spark, src):
    """caching/__init__ parity: the named storage classes select the
    strategy; SourceCache materializes a managed catalog table."""
    assert _expr(src).cache(storage=C.ParquetCache()).node.strategy == "mtime"
    assert (
        _expr(src).cache(storage=C.ParquetSnapshotCache()).node.strategy
        == "snapshot"
    )
    assert _expr(src).cache(
        storage=C.ParquetTTLSnapshotCache(5)
    ).node.strategy == "ttl:5"

    e = _expr(src).cache(storage=C.SourceCache())
    got = e.execute(spark)
    assert got.s.sum() == 15.0
    tables = [t.name for t in spark.catalog.listTables()]
    cache_tables = [t for t in tables if t.startswith("xorq_cache_")]
    assert cache_tables
    # hit path: the managed table itself holds the data (the key is
    # mtime-based, so unlike pin() a deleted source would re-key)
    assert spark.table(cache_tables[0]).count() > 0
    assert e.execute(spark).s.sum() == 15.0

    import pytest as _pytest

    with _pytest.raises(ValueError, match="gs://"):
        C.GCSCache("/not/a/uri")
    assert C.GCSCache("gs://bucket/prefix").strategy == "mtime@gs://bucket/prefix"


def test_object_store_cache_file_uri_roundtrip(spark, tmp_path):
    """The URI cache path end to end over file:// (Hadoop
    LocalFileSystem — the same FS layer a gs://\s3a:// root uses):
    miss materializes the artifact under the URI root with an atomic
    publish, hit replays from it without recomputing the subtree."""
    import xorq_spark as xo

    root = f"file://{tmp_path}/store"
    store = C.ObjectStoreCache(root, strategy="snapshot")
    df = spark.createDataFrame([(1, 2.0), (2, 3.0)], "k long, v double")
    e = xo.register(spark, df, "obj_cache_src").cache(storage=store)
    out1 = e.execute(spark)
    # artifact landed under the URI root
    key = C.calc_key(e.node.parent, store.strategy)
    assert C.exists(key, root, spark)
    local = str(tmp_path / "store" / f"{key}.parquet")
    import os as _os
    assert _os.path.exists(_os.path.join(local, "_SUCCESS"))
    # hit path: same values come back from the artifact
    out2 = e.execute(spark)
    assert sorted(out1.v) == sorted(out2.v)
    # no stray temp dirs from the publish
    stray = [p for p in _os.listdir(tmp_path / "store") if ".tmp-" in p]
    assert stray == []


def test_publish_replaces_markerless_debris_local(spark, tmp_path):
    """A crashed publish leaves the artifact dir WITHOUT _SUCCESS; the
    next publish must replace the debris with the fresh bytes, not
    discard them and serve the stale partial dir (review regression)."""
    import os as _os

    from xorq_spark.cache import _publish_artifact

    path = str(tmp_path / "k.parquet")
    # fabricate debris: stale rows, no _SUCCESS marker
    spark.range(3).selectExpr("id * 100 as v").write.parquet(path)
    _os.remove(_os.path.join(path, "_SUCCESS"))
    fresh = spark.range(5).selectExpr("id * 2 as v")
    _publish_artifact(fresh, path)
    got = sorted(r["v"] for r in spark.read.parquet(path).collect())
    assert got == [0, 2, 4, 6, 8]
    assert _os.path.exists(_os.path.join(path, "_SUCCESS"))


def test_publish_replaces_markerless_debris_uri(spark, tmp_path):
    """Same debris scenario through the Hadoop-FS URI branch: rename
    into an existing dir must not nest the temp dir inside the
    artifact (review regression)."""
    import os as _os

    from xorq_spark.cache import _publish_artifact

    local = str(tmp_path / "k.parquet")
    spark.range(3).selectExpr("id * 100 as v").write.parquet(local)
    _os.remove(_os.path.join(local, "_SUCCESS"))
    uri = f"file://{local}"
    fresh = spark.range(5).selectExpr("id * 2 as v")
    _publish_artifact(fresh, uri)
    got = sorted(r["v"] for r in spark.read.parquet(uri).collect())
    assert got == [0, 2, 4, 6, 8]
    # nothing nested inside the artifact dir
    nested = [p for p in _os.listdir(local) if ".tmp-" in p]
    assert nested == []


def test_pinned_object_store_cache_reads_uri_root(spark, tmp_path):
    """pin() on an ObjectStoreCache expression must replay from the
    URI root, not the local cache_root (review regression)."""
    import xorq_spark as xo
    from xorq_spark.cache import ObjectStoreCache, pin

    root = f"file://{tmp_path}/store"
    df = spark.createDataFrame([(1, 5.0), (2, 7.0)], "k long, v double")
    e = xo.register(spark, df, "pin_uri_src").cache(
        storage=ObjectStoreCache(root, strategy="snapshot")
    )
    pinned = pin(e)
    out = pinned.execute(spark)
    assert sorted(out.v) == [5.0, 7.0]
