"""UDF-surface tests (reference model: backends/xorq_datafusion/tests/
test_udf.py, test_udwf.py; expr/udf.py two-phase tests)."""

from __future__ import annotations

import pickle

import numpy as np
import pandas as pd
import pytest

import xorq_spark as xo
from xorq_spark import _, udf


@pytest.fixture(scope="module")
def mt(spark):
    return xo.memtable(
        {"g": ["a", "a", "b", "b", "b"], "x": [1.0, 2.0, 3.0, 4.0, 5.0]}
    )


def test_scalar_pandas_udf(spark, mt):
    @udf.scalar.pandas(dtype="double")
    def plus_one(s: pd.Series) -> pd.Series:
        return s + 1.0

    got = mt.mutate(y=plus_one(_.x)).order_by("x").execute(spark)
    assert got.y.tolist() == [2.0, 3.0, 4.0, 5.0, 6.0]


def test_scalar_python_udf(spark, mt):
    @udf.scalar.python(dtype="string")
    def shout(g: str) -> str:
        return (g or "") + "!"

    got = mt.mutate(s=shout(_.g)).order_by("x").execute(spark)
    assert got.s.tolist() == ["a!", "a!", "b!", "b!", "b!"]


def test_scalar_builtin(spark, mt):
    sqrt = udf.scalar.builtin("sqrt")
    got = mt.mutate(r=sqrt(_.x * 4)).order_by("x").execute(spark)
    assert got.r.tolist() == [2.0, pytest.approx(2.828, abs=1e-3), pytest.approx(3.464, abs=1e-3), 4.0, pytest.approx(4.472, abs=1e-3)]


def test_agg_pandas_df(spark, mt):
    def fit_mean(pdf: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"g": [pdf.g.iloc[0]], "mu": [pdf.x.mean()]})

    got = (
        udf.agg_pandas_df(mt, by="g", fn=fit_mean, schema_out="g string, mu double")
        .order_by("g")
        .execute(spark)
    )
    assert got.mu.tolist() == [1.5, 4.0]


def test_two_phase_expr_udf(spark, mt):
    """Train-then-predict in one graph (make_pandas_expr_udf,
    expr/udf.py:111): phase 1 computes a pickled 'model' (the global
    mean); phase 2 scores rows against it."""

    def train(pdf: pd.DataFrame) -> pd.DataFrame:
        model = {"mu": float(pdf.x.mean())}
        return pd.DataFrame({"model": [pickle.dumps(model)]})

    # Phase-1 expr: whole-table "training" via agg_pandas_df with a
    # constant key, producing a single binary model cell.
    keyed = mt.mutate(k=xo.literal(1))
    fitted = udf.agg_pandas_df(
        xo.Expr(keyed.node, spark),
        by="k",
        fn=lambda pdf: pd.DataFrame({"model": [pickle.dumps({"mu": float(pdf.x.mean())})]}),
        schema_out="model binary",
    )

    def predict(model: dict, s: pd.Series) -> pd.Series:
        return s - model["mu"]

    scorer = udf.make_pandas_expr_udf(fitted, predict, dtype="double")
    got = mt.mutate(centered=scorer(_.x)).order_by("x").execute(spark)
    assert got.centered.tolist() == [-2.0, -1.0, 0.0, 1.0, 2.0]


def test_udxf(spark, mt):
    def summarize(pdf: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"g": pdf.g, "x2": pdf.x * 2})

    got = (
        udf.udxf(mt, summarize, schema_out="g string, x2 double",
                 schema_in_required=["g", "x"])
        .order_by("x2")
        .execute(spark)
    )
    assert got.x2.tolist() == [2.0, 4.0, 6.0, 8.0, 10.0]


def test_udxf_schema_in_violation(spark, mt):
    with pytest.raises(ValueError, match="missing required"):
        udf.udxf(mt, lambda p: p, schema_out="g string", schema_in_required=["nope"])


def test_window_udf(spark, mt):
    """Cumulative-sum evaluator over ordered partitions — the reference's
    UDWF smoke shape (test_udwf.py)."""

    def cumsum(pdf: pd.DataFrame) -> pd.Series:
        return pdf.x.cumsum()

    got = (
        udf.window_udf(mt, cumsum, partition_by="g", order_by="x", result_name="cs")
        .order_by("g", "x")
        .execute(spark)
    )
    assert got.cs.tolist() == [1.0, 3.0, 3.0, 7.0, 12.0]


def test_udf_tokens_stable_in_plan_hash(mt):
    """PyUDF participates in equality by name+dtype, not object identity."""

    @udf.scalar.pandas(dtype="double", name="stable_name")
    def f1(s):
        return s + 1

    @udf.scalar.pandas(dtype="double", name="stable_name")
    def f2(s):
        return s + 1

    e1 = mt.mutate(y=f1(_.x))
    e2 = mt.mutate(y=f2(_.x))
    from xorq_spark.tokenize import tokenize

    assert tokenize(e1.node) == tokenize(e2.node)


def test_make_pandas_udf_on_expr(spark, sf_dir):
    """Reference make_pandas_udf: fn sees a DataFrame of the schema's
    columns; .on_expr wires the columns itself."""
    import xorq_spark as xo
    from xorq_spark import udf

    e = xo.deferred_read_parquet(f"{sf_dir}/supplier.parquet")
    ratio = udf.make_pandas_udf(
        lambda pdf: pdf["s_acctbal"] * 2,
        schema=["s_acctbal"],
        return_type="double",
        name="double_bal",
    )
    out = e.mutate(d=ratio.on_expr(e)).select("s_acctbal", "d").limit(5).execute(spark)
    assert (out["d"] == out["s_acctbal"] * 2).all()


def test_agg_namespace_and_udwf_alias(spark, sf_dir):
    import xorq_spark as xo
    from xorq_spark import _, udf

    assert udf.agg.pandas_df is udf.agg_pandas_df
    assert udf.pyarrow_udwf is udf.window_udf
    e = xo.deferred_read_parquet(f"{sf_dir}/nation.parquet")
    n = e.aggregate(c=udf.agg.builtin("count")(_.n_nationkey)).execute(spark)
    assert n["c"][0] == 25


def test_cache_flavor_dummy_and_source_snapshot(spark, sf_dir):
    """ParquetDummySnapshotCache never persists (recompute every time);
    SourceSnapshotCache materializes a catalog table keyed on structure
    only."""
    import xorq_spark as xo
    from xorq_spark import _
    from xorq_spark.cache import ParquetDummySnapshotCache, SourceSnapshotCache

    e = (
        xo.deferred_read_parquet(f"{sf_dir}/region.parquet")
        .group_by("r_regionkey")
        .agg(n=_.r_name.count())
    )
    dummy = e.cache(storage=ParquetDummySnapshotCache())
    assert dummy.to_spark(spark).count() == e.to_spark(spark).count()

    snap = e.cache(storage=SourceSnapshotCache())
    assert snap.to_spark(spark).count() == e.to_spark(spark).count()
    tables = [t.name for t in spark.catalog.listTables() if t.name.startswith("xorq_cache_")]
    assert tables  # materialized into the session catalog


# --------------------------------------------------------------------------
# Spark 4 native Python UDTF surface (udf.table.python)
# --------------------------------------------------------------------------
def test_udtf_direct_call_constant_args(spark):
    import pyspark.sql.functions as F

    from xorq_spark import udf

    @udf.table.python(returns="x bigint, sq bigint")
    def squares(n):
        for i in range(n):
            yield i, i * i

    out = sorted(tuple(r) for r in squares(F.lit(4)).collect())
    assert out == [(0, 0), (1, 1), (2, 4), (3, 9)]


def test_udtf_apply_lateral_keeps_input_columns(spark):
    from xorq_spark import udf

    @udf.table.python(returns="word string, pos int")
    def words(s):
        for i, w in enumerate(s.split()):
            yield w, i + 1

    df = spark.createDataFrame(
        [(1, "alpha beta"), (2, "gamma")], "k long, s string"
    )
    got = sorted(tuple(r) for r in words.apply(df, "s").collect())
    assert got == [
        (1, "alpha beta", "alpha", 1),
        (1, "alpha beta", "beta", 2),
        (2, "gamma", "gamma", 1),
    ]


def test_udtf_zero_row_yield_drops_input_row(spark):
    from xorq_spark import udf

    @udf.table.python(returns="v bigint")
    def only_even(n):
        if n % 2 == 0:
            yield (n,)

    df = spark.createDataFrame([(1,), (2,), (3,), (4,)], "n long")
    got = sorted(r["v"] for r in only_even.apply(df, "n").collect())
    assert got == [2, 4]
