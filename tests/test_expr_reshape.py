"""Reshape / convenience verbs: pivot_longer/wider, describe, unpack,
relocate, topk, window_by (SURVEY §2.2 tail)."""

from __future__ import annotations

import datetime as dt

import pandas as pd
import pytest

import xorq_spark as xo
from xorq_spark import _


@pytest.fixture(scope="module")
def wide(spark):
    return xo.memtable(
        {"id": [1, 2], "a": [10.0, 20.0], "b": [1.0, 2.0]}
    )


def test_pivot_longer(spark, wide):
    got = wide.pivot_longer(["a", "b"]).order_by("id", "name").execute(spark)
    assert got.name.tolist() == ["a", "b", "a", "b"]
    assert got.value.tolist() == [10.0, 1.0, 20.0, 2.0]


def test_pivot_roundtrip(spark, wide):
    long = wide.pivot_longer(["a", "b"])
    back = long.pivot_wider("name", "value").order_by("id").execute(spark)
    assert back.a.tolist() == [10.0, 20.0]
    assert back.b.tolist() == [1.0, 2.0]


def test_pivot_wider_agg(spark):
    mt = xo.memtable(
        {"g": ["x", "x", "y"], "k": ["a", "a", "b"], "v": [1.0, 2.0, 3.0]}
    )
    got = mt.pivot_wider("k", "v", keys=["g"], agg="sum").order_by("g").execute(spark)
    assert got.a.tolist()[0] == 3.0
    assert got.b.tolist()[1] == 3.0


def test_describe(spark, wide):
    got = wide.describe().execute(spark)
    assert "mean" in got.summary.tolist()


def test_unpack(spark):
    mt = xo.memtable(pd.DataFrame({"id": [1], "s": [{"x": 5, "y": "hi"}]}))
    got = mt.unpack("s").execute(spark)
    assert set(got.columns) == {"id", "x", "y"}
    assert got.x.tolist() == [5]


def test_relocate(spark, wide):
    assert wide.relocate("b").columns == ["b", "id", "a"]
    assert wide.relocate("a", after="b").columns == ["id", "b", "a"]
    assert wide.relocate("b", before="id").columns == ["b", "id", "a"]


def test_topk(spark):
    mt = xo.memtable({"c": ["p", "p", "p", "q", "q", "r"]})
    got = mt.topk("c", 2).execute(spark)
    assert got.c.tolist() == ["p", "q"]
    assert got["count"].tolist() == [3, 2]


def test_window_by_tumble(spark):
    t0 = dt.datetime(2026, 1, 1)
    mt = xo.memtable(
        pd.DataFrame(
            {
                "ts": [t0, t0 + dt.timedelta(minutes=20), t0 + dt.timedelta(hours=1)],
                "v": [1.0, 2.0, 4.0],
            }
        )
    )
    got = (
        mt.window_by("ts", "1 hour")
        .agg(s=_.v.sum())
        .execute(spark)
        .sort_values("s")
    )
    assert got.s.tolist() == [3.0, 4.0]
