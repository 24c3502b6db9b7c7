"""Selectors API parity (reference: expr/selectors.py →
vendor/ibis/selectors.py; test model: vendor ibis tests for s.numeric,
s.of_type, name selectors, across, if_any/if_all, index slicing)."""

from __future__ import annotations

import pytest

import xorq_spark as xo
from xorq_spark import _
from xorq_spark import selectors as s


@pytest.fixture(scope="module")
def lineitem(spark, sf_dir):
    return xo.deferred_read_parquet(f"{sf_dir}/lineitem.parquet")


@pytest.fixture(scope="module")
def orders(spark, sf_dir):
    return xo.deferred_read_parquet(f"{sf_dir}/orders.parquet")


def test_numeric(lineitem, spark):
    cols = lineitem.select(s.numeric()).to_spark(spark).columns
    assert "l_quantity" in cols and "l_orderkey" in cols
    assert "l_shipdate" not in cols and "l_returnflag" not in cols


def test_of_type(lineitem, spark):
    strings = lineitem.select(s.of_type("string")).to_spark(spark).columns
    assert set(strings) <= {
        c for c, t in lineitem.to_spark(spark).dtypes if t == "string"
    }
    # ibis-style dtype name
    int64s = lineitem.select(s.of_type("int64")).to_spark(spark).columns
    assert "l_orderkey" in int64s
    temporal = lineitem.select(s.of_type("temporal")).to_spark(spark).columns
    assert "l_shipdate" in temporal


def test_name_selectors(lineitem, spark):
    pre = lineitem.select(s.startswith("l_ship")).to_spark(spark).columns
    assert all(c.startswith("l_ship") for c in pre) and pre
    suf = lineitem.select(s.endswith("key")).to_spark(spark).columns
    assert set(suf) == {"l_orderkey", "l_partkey", "l_suppkey"}
    has = lineitem.select(s.contains("flag")).to_spark(spark).columns
    assert has == ["l_returnflag"]
    rx = lineitem.select(s.matches(r"^l_.*date$")).to_spark(spark).columns
    assert "l_shipdate" in rx


def test_combinators(lineitem, spark):
    both = lineitem.select(s.numeric() & s.contains("qty" ) | s.cols("l_quantity")).to_spark(spark).columns
    assert both == ["l_quantity"]
    inverted = lineitem.select(~s.numeric()).to_spark(spark).columns
    assert "l_quantity" not in inverted and "l_returnflag" in inverted
    anyof = lineitem.select(s.any_of(s.cols("l_orderkey"), s.contains("flag")))
    assert set(anyof.to_spark(spark).columns) == {"l_orderkey", "l_returnflag"}


def test_first_last_all_none_index(lineitem, spark):
    names = lineitem.to_spark(spark).columns
    assert lineitem.select(s.first()).to_spark(spark).columns == [names[0]]
    assert lineitem.select(s.last()).to_spark(spark).columns == [names[-1]]
    assert lineitem.select(s.all()).to_spark(spark).columns == names
    assert lineitem.select(s.index[1:3]).to_spark(spark).columns == names[1:3]
    # name-bounded slice is inclusive on the stop name (ibis semantics)
    sub = lineitem.select(s.index[names[1]: names[3]]).to_spark(spark).columns
    assert sub == names[1:4]


def test_where_probe(orders, spark):
    cols = orders.select(
        s.where(lambda c: c.type == "double" and "price" in c.name)
    ).to_spark(spark).columns
    assert cols == ["o_totalprice"]


def test_across_mutate(orders, spark):
    e = orders.mutate(
        s.across(s.cols("o_totalprice"), {"x2": _ * 2, "half": _ / 2})
    )
    df = e.to_spark(spark)
    assert "o_totalprice_x2" in df.columns and "o_totalprice_half" in df.columns
    row = df.select("o_totalprice", "o_totalprice_x2").first()
    assert row[1] == pytest.approx(row[0] * 2)


def test_across_select_with_template_names(orders, spark):
    e = orders.select(
        s.across(s.numeric(), _.cast("double"), names="{col}_dbl")
    )
    df = e.to_spark(spark)
    assert all(c.endswith("_dbl") for c in df.columns)
    assert all(t == "double" for _c, t in df.dtypes)


def test_across_callable(orders, spark):
    e = orders.select(
        s.across(s.of_type("string"), lambda c: c.upper(), names="{col}_up")
    )
    df = e.to_spark(spark)
    vals = df.select(df.columns[0]).first()
    assert vals[0] == vals[0].upper()


def test_if_any_if_all(orders, spark):
    hi = orders.filter(s.if_any(s.numeric(), _ > 10_000_000)).to_spark(spark)
    assert hi.count() == 0  # nothing that large in any numeric column
    lo = orders.filter(s.if_all(s.numeric(), _ >= 0)).to_spark(spark)
    assert lo.count() > 0


def test_selector_in_registry_query(spark, sf_dir):
    from xorq_spark.queries import QUERIES

    df = QUERIES["engine_selectors_across"](spark, sf_dir)
    assert df.columns == ["l_returnflag", "qty_max", "qty_min", "tot_max", "tot_min"]


def test_selectors_in_group_by_and_order_by(spark):
    import xorq_spark as xo
    from xorq_spark import s, _

    t = xo.memtable(
        {"cat_a": ["x", "x", "y"], "cat_b": ["p", "q", "p"], "v": [1.0, 2.0, 3.0]}
    )
    got = (
        t.group_by(s.startswith("cat_"))
        .agg(total=_.v.sum())
        .order_by(s.startswith("cat_"))
        .execute(spark)
    )
    assert list(got.columns) == ["cat_a", "cat_b", "total"]
    assert got.total.tolist() == [1.0, 2.0, 3.0]
    assert got.cat_a.tolist() == ["x", "x", "y"]
