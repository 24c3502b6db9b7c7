"""Column-lineage walker tests (reference model:
common/utils/lineage_utils.py semantics)."""

from __future__ import annotations

import pandas as pd
import pytest

import xorq_spark as xo
from xorq_spark import _
from xorq_spark.lineage import column_lineage, lineage_text


@pytest.fixture
def src(tmp_path):
    p = str(tmp_path / "src.parquet")
    pd.DataFrame({"a": [1], "b": [2.0], "c": ["x"]}).to_parquet(p)
    return p


def test_project_lineage(spark, src):
    e = xo.deferred_read_parquet(src, table_name="src").select(
        "a", total=_.a + _.b
    )
    lin = column_lineage(e, spark)
    assert lin["a"] == {("src", "a")}
    assert lin["total"] == {("src", "a"), ("src", "b")}
    assert "c" not in lin


def test_agg_and_filter_passthrough(spark, src):
    e = (
        xo.deferred_read_parquet(src, table_name="src")
        .filter(_.c == "x")
        .group_by("c")
        .agg(s=_.b.sum(), n=_.a.count())
    )
    lin = column_lineage(e, spark)
    assert lin["s"] == {("src", "b")}
    assert lin["n"] == {("src", "a")}
    assert lin["c"] == {("src", "c")}


def test_join_lineage_merges_sources(spark, src, tmp_path):
    p2 = str(tmp_path / "dim.parquet")
    pd.DataFrame({"a": [1], "label": ["L"]}).to_parquet(p2)
    left = xo.deferred_read_parquet(src, table_name="facts")
    right = xo.deferred_read_parquet(p2, table_name="dim")
    e = left.join(right, ["a"]).select("a", "b", "label")
    lin = column_lineage(e, spark)
    assert lin["a"] == {("facts", "a"), ("dim", "a")}
    assert lin["b"] == {("facts", "b")}
    assert lin["label"] == {("dim", "label")}


def test_literal_column_has_no_sources(spark, src):
    e = xo.deferred_read_parquet(src, table_name="src").select(k=xo.literal(1))
    lin = column_lineage(e, spark)
    assert lin["k"] == set()
    assert "<literal>" in lineage_text(e, spark)


def test_to_dot_visualize(spark, sf_dir):
    """DOT rendering of the IR graph (reference:
    vendor/ibis/expr/visualize.py; graphviz absent here so to_dot's
    standalone DOT text is the surface)."""
    import xorq_spark as xo
    from xorq_spark import _
    from xorq_spark.visualize import format_tree, to_dot, visualize

    e = (
        xo.deferred_read_parquet(f"{sf_dir}/nation.parquet")
        .filter(_.n_regionkey >= 0)
        .group_by("n_regionkey")
        .agg(n=_.n_nationkey.count())
    )
    dot = to_dot(e)
    assert dot.startswith("digraph") and dot.rstrip().endswith("}")
    assert "Aggregate" in dot and "Filter" in dot and "->" in dot
    # shared-subtree dedup: node count equals distinct IR nodes
    assert dot.count("[label=") == len(
        {ln.split()[0] for ln in dot.splitlines() if "[label=" in ln}
    )
    out = visualize(e)  # no graphviz in container -> DOT text back
    assert isinstance(out, str) and out == dot
    assert "Aggregate" in format_tree(e)


def test_ls_backends_and_multiengine(spark):
    import xorq_spark as xo
    from xorq_spark import _

    t = xo.memtable({"x": [1, 2]})
    e = t.filter(_.x > 0)
    assert e.ls.is_multiengine is False
    assert len(e.ls.backends) == 1
    bound = xo.Expr(e.node, spark)
    assert bound.ls.backends == (spark,)
