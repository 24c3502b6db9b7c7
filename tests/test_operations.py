"""Per-operator battery over functional_alltypes: every scalar-operator
family from SURVEY §2.3-2.4 executed through the deferred layer and
checked against a pandas oracle (the reference's per-backend test model,
backends/pandas/tests/test_operations.py)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

import xorq_spark as xo
from xorq_spark import _, examples


@pytest.fixture(scope="module")
def at():
    return examples.get("functional_alltypes")


@pytest.fixture(scope="module")
def at_pd():
    return examples.get_frame("functional_alltypes")


# (name, deferred expr builder, pandas oracle fn) — each runs as one
# projected column compared elementwise after sorting by id.
CASES = [
    # numeric
    ("add", lambda: _.int_col + 2, lambda d: d.int_col + 2),
    ("sub", lambda: _.double_col - 0.5, lambda d: d.double_col - 0.5),
    ("mul", lambda: _.int_col * _.bigint_col, lambda d: d.int_col * d.bigint_col),
    ("div", lambda: _.double_col / 4, lambda d: d.double_col / 4),
    ("floordiv", lambda: _.bigint_col // 7, lambda d: (d.bigint_col // 7).astype("float64")),
    ("mod", lambda: _.int_col % 3, lambda d: d.int_col % 3),
    ("pow", lambda: _.int_col ** 2, lambda d: (d.int_col.astype("float64")) ** 2),
    ("neg", lambda: -_.int_col, lambda d: -d.int_col),
    ("abs", lambda: (_.int_col - 5).abs(), lambda d: (d.int_col - 5).abs()),
    ("ceil", lambda: _.double_col.ceil(), lambda d: np.ceil(d.double_col)),
    ("floor", lambda: _.double_col.floor(), lambda d: np.floor(d.double_col)),
    ("round", lambda: (_.double_col / 3).round(2), lambda d: (d.double_col / 3).round(2)),
    ("sqrt", lambda: _.double_col.sqrt(), lambda d: np.sqrt(d.double_col)),
    ("exp", lambda: (_.int_col / 10).exp(), lambda d: np.exp(d.int_col / 10)),
    ("ln", lambda: (_.double_col + 1).log(), lambda d: np.log(d.double_col + 1)),
    ("log10", lambda: (_.double_col + 1).log10(), lambda d: np.log10(d.double_col + 1)),
    ("sign", lambda: (_.int_col - 5).sign(), lambda d: np.sign(d.int_col - 5).astype("float64")),
    ("clip", lambda: _.int_col.clip(2, 7), lambda d: d.int_col.clip(2, 7)),
    ("sin", lambda: _.double_col.sin(), lambda d: np.sin(d.double_col)),
    ("atan2", lambda: _.double_col.atan2(1.0), lambda d: np.arctan2(d.double_col, 1.0)),
    ("greatest", lambda: xo._.int_col.greatest(5), lambda d: d.int_col.clip(lower=5)),
    # comparison / logic
    ("gt", lambda: _.int_col > 5, lambda d: d.int_col > 5),
    ("between", lambda: _.int_col.between(2, 6), lambda d: d.int_col.between(2, 6)),
    ("isin", lambda: _.string_col.isin(["1", "3"]), lambda d: d.string_col.isin(["1", "3"])),
    ("and", lambda: (_.int_col > 2) & _.bool_col, lambda d: (d.int_col > 2) & d.bool_col),
    ("or", lambda: (_.int_col > 8) | _.bool_col, lambda d: (d.int_col > 8) | d.bool_col),
    ("not", lambda: ~_.bool_col, lambda d: ~d.bool_col),
    ("ifelse", lambda: _.bool_col.ifelse("y", "n"), lambda d: np.where(d.bool_col, "y", "n")),
    # strings
    ("upper", lambda: _.date_string_col.upper(), lambda d: d.date_string_col.str.upper()),
    ("length", lambda: _.date_string_col.length(), lambda d: d.date_string_col.str.len().astype("int32")),
    ("reverse", lambda: _.string_col.reverse(), lambda d: d.string_col.str[::-1]),
    ("substr", lambda: _.date_string_col.substr(3, 2), lambda d: d.date_string_col.str[3:5]),
    ("lpad", lambda: _.string_col.lpad(3, "0"), lambda d: d.string_col.str.pad(3, fillchar="0")),
    ("concat", lambda: _.string_col.concat(xo.literal("-"), _.date_string_col),
     lambda d: d.string_col + "-" + d.date_string_col),
    ("contains", lambda: _.date_string_col.contains("/09"), lambda d: d.date_string_col.str.contains("/09")),
    ("startswith", lambda: _.date_string_col.startswith("01"), lambda d: d.date_string_col.str.startswith("01")),
    ("find", lambda: _.date_string_col.find("/"), lambda d: d.date_string_col.str.find("/").astype("int32")),
    ("replace", lambda: _.date_string_col.replace("/", "-"),
     lambda d: d.date_string_col.str.replace("/", "-", regex=False)),
    ("re_extract", lambda: _.date_string_col.regexp_extract(r"^(\d+)/", 1),
     lambda d: d.date_string_col.str.extract(r"^(\d+)/", expand=False).fillna("")),
    ("ascii", lambda: _.string_col.ascii(), lambda d: d.string_col.str[0].map(ord).astype("int32")),
    # temporal
    ("year", lambda: _.timestamp_col.year(), lambda d: d.timestamp_col.dt.year.astype("int32")),
    ("month", lambda: _.timestamp_col.month(), lambda d: d.timestamp_col.dt.month.astype("int32")),
    ("day", lambda: _.timestamp_col.day(), lambda d: d.timestamp_col.dt.day.astype("int32")),
    ("hour", lambda: _.timestamp_col.hour(), lambda d: d.timestamp_col.dt.hour.astype("int32")),
    ("minute", lambda: _.timestamp_col.minute(), lambda d: d.timestamp_col.dt.minute.astype("int32")),
    ("dayofyear", lambda: _.timestamp_col.day_of_year(),
     lambda d: d.timestamp_col.dt.dayofyear.astype("int32")),
    ("quarter", lambda: _.timestamp_col.quarter(), lambda d: d.timestamp_col.dt.quarter.astype("int32")),
    ("trunc_day", lambda: _.timestamp_col.truncate("D"), lambda d: d.timestamp_col.dt.floor("D")),
    ("trunc_month", lambda: _.timestamp_col.truncate("M"),
     lambda d: d.timestamp_col.dt.to_period("M").dt.to_timestamp()),
    ("strftime", lambda: _.timestamp_col.date_format("yyyy-MM"),
     lambda d: d.timestamp_col.dt.strftime("%Y-%m")),
    # null handling
    ("isnull", lambda: _.string_col.isnull(), lambda d: d.string_col.isna()),
    ("coalesce", lambda: _.string_col.fill_null("?"), lambda d: d.string_col.fillna("?")),
    ("nullif", lambda: _.string_col.nullif("3"),
     lambda d: d.string_col.where(d.string_col != "3")),
    # cast
    ("cast_str", lambda: _.int_col.cast("string"), lambda d: d.int_col.astype(str)),
    ("cast_double", lambda: _.string_col.cast("float64"), lambda d: d.string_col.astype("float64")),
    ("try_cast", lambda: _.date_string_col.try_cast("int32"),
     lambda d: pd.Series([None] * len(d), dtype="object")),
    # hash / misc (engine-specific values: assert only determinism+type)
]


@pytest.mark.parametrize("name,expr_fn,oracle_fn", CASES, ids=[c[0] for c in CASES])
def test_scalar_op(spark, at, at_pd, name, expr_fn, oracle_fn):
    got = (
        at.select("id", out=expr_fn())
        .order_by("id")
        .execute(spark)["out"]
    )
    exp = oracle_fn(at_pd.sort_values("id").reset_index(drop=True))
    exp = pd.Series(list(exp), name="out")
    if exp.dtype.kind == "f" or got.dtype.kind == "f":
        assert np.allclose(
            got.astype("float64").fillna(np.nan),
            exp.astype("float64").fillna(np.nan),
            equal_nan=True, rtol=1e-9, atol=1e-12,
        ), f"{name} mismatch"
    else:
        assert got.fillna("<null>").tolist() == exp.fillna("<null>").tolist(), f"{name} mismatch"


AGG_CASES = [
    ("sum", lambda: _.double_col.sum(), lambda d: d.double_col.sum()),
    ("mean", lambda: _.double_col.mean(), lambda d: d.double_col.mean()),
    ("min", lambda: _.int_col.min(), lambda d: d.int_col.min()),
    ("max", lambda: _.int_col.max(), lambda d: d.int_col.max()),
    ("count", lambda: _.int_col.count(), lambda d: d.int_col.count()),
    ("nunique", lambda: _.string_col.count_distinct(), lambda d: d.string_col.nunique()),
    ("std", lambda: _.double_col.std(), lambda d: d.double_col.std()),
    ("var", lambda: _.double_col.var(), lambda d: d.double_col.var()),
    ("median", lambda: _.double_col.median(), lambda d: d.double_col.median()),
    ("any", lambda: _.bool_col.bool_or(), lambda d: d.bool_col.any()),
    ("all", lambda: _.bool_col.bool_and(), lambda d: d.bool_col.all()),
    ("max_by", lambda: _.string_col.max_by(_.int_col),
     lambda d: d.loc[d.int_col.idxmax(), "string_col"]),
]


@pytest.mark.parametrize("name,expr_fn,oracle_fn", AGG_CASES, ids=[c[0] for c in AGG_CASES])
def test_reduction(spark, at, at_pd, name, expr_fn, oracle_fn):
    got = at.aggregate(out=expr_fn()).execute(spark)["out"].iloc[0]
    exp = oracle_fn(at_pd)
    if isinstance(exp, float):
        assert got == pytest.approx(exp, rel=1e-9), name
    elif name == "max_by":
        # ties on int_col make any argmax row valid
        valid = set(at_pd[at_pd.int_col == at_pd.int_col.max()].string_col)
        assert got in valid
    else:
        assert got == exp, name


def test_ibis_vocabulary_round2(spark):
    """nunique/approx_nunique/substitute/strftime/fillna — ibis
    spellings that previously fell through to raw function dispatch."""
    import xorq_spark as xo
    from xorq_spark import _

    t = xo.memtable(
        {"x": [1.0, 2.0, None], "s": ["ab", "cd", "ab"],
         "d": ["2024-03-05", "2024-06-09", "2024-01-01"]}
    )
    assert t.aggregate(n=_.s.nunique()).execute(spark).n.tolist() == [2]
    assert t.aggregate(n=_.s.approx_nunique()).execute(spark).n.tolist() == [2]
    assert t.select(v=_.s.substitute({"ab": "AB"})).execute(spark).v.tolist() == [
        "AB", "cd", "AB"]
    assert t.select(
        v=_.s.substitute({"ab": "AB"}, else_="other")
    ).execute(spark).v.tolist() == ["AB", "other", "AB"]
    got = t.select(
        v=_.d.cast("date").strftime("%Y/%m met %d%%")
    ).execute(spark).v.tolist()
    assert got == ["2024/03 met 05%", "2024/06 met 09%", "2024/01 met 01%"]
    assert t.select(v=_.x.fillna(0.0)).execute(spark).v.tolist() == [1.0, 2.0, 0.0]
    import pytest as _pytest
    with _pytest.raises(Exception, match="strftime code"):
        t.select(v=_.d.cast("date").strftime("%Q")).execute(spark)


def test_value_cases(spark):
    import xorq_spark as xo
    from xorq_spark import _

    t = xo.memtable({"s": ["1", "x", "3"]})
    got = t.select(
        v=_.s.cases(("1", "one"), ("3", "three"), else_="other")
    ).execute(spark)
    assert got.v.tolist() == ["one", "other", "three"]
    got2 = t.select(v=_.s.cases(("1", "one"))).execute(spark)
    assert got2.v.tolist() == ["one", None, None]
    with pytest.raises(Exception, match="at least one"):
        t.select(v=_.s.cases()).execute(spark)
