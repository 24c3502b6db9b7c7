"""Examples catalog + cube/rollup Expr verbs."""

from __future__ import annotations

import subprocess
import sys

import pytest

import xorq_spark as xo
from xorq_spark import _, examples


def test_names_cover_reference_fixtures():
    assert {"penguins", "batting", "awards_players", "diamonds",
            "functional_alltypes", "win", "array_types"} <= set(examples.names())


def test_deterministic_across_processes():
    local = examples.get_frame("penguins")
    code = (
        "from xorq_spark import examples\n"
        "print(examples.get_frame('penguins').bill_length_mm.sum())\n"
    )
    out = subprocess.run([sys.executable, "-c", code], capture_output=True, text=True, cwd="/root/repo")
    assert out.returncode == 0, out.stderr
    assert float(out.stdout.strip()) == pytest.approx(local.bill_length_mm.sum())


def test_examples_as_exprs(spark):
    pen = examples.get("penguins")
    got = pen.group_by("species").agg(n=_.species.count()).execute(spark)
    assert got.n.sum() == 344


def test_batting_awards_join(spark):
    """The reference's canonical join pair."""
    b = examples.get("batting")
    a = examples.get("awards_players")
    got = (
        b.join(a, ["playerID", "yearID", "lgID"], how="semi")
        .count(spark)
    )
    assert got > 0


def test_win_fixture_window(spark):
    win = examples.get("win")
    from xorq_spark.expr.deferred import Deferred, Func

    s = Deferred(Func("sum", (_.y.node,))).over(
        group_by=_.g, order_by=_.x.asc(), rows=(None, 0)
    )
    got = win.mutate(c=s).order_by("x").execute(spark)
    assert got.c.tolist() == [3, 5, 5, 6, 7]


def test_cube_rollup(spark):
    d = examples.get("diamonds")
    cube = d.cube("cut", "color").agg(n=_.price.count()).execute(spark)
    roll = d.rollup("cut").agg(n=_.price.count()).execute(spark)
    # cube contains the grand total row (both keys null)
    assert cube[cube.cut.isna() & cube.color.isna()].n.iloc[0] == 1000
    assert roll[roll.cut.isna()].n.iloc[0] == 1000
    assert roll.shape[0] == 6  # 5 cuts + total
