"""to_sql round-trip: for every supported construct,
spark.sql(to_sql(expr)) must produce the same result as the DataFrame
lowering (expr.execute()). This pins the SQL emitter to the lowering —
neither can drift without a failure here."""

from __future__ import annotations

import pandas as pd
import pytest

import xorq_spark as xo
from xorq_spark import _
from xorq_spark.sql_compile import SqlCompileError, to_sql


def same(spark, expr, order_insensitive=False):
    sql = to_sql(expr)
    via_sql = spark.sql(sql).toPandas()
    via_df = expr.execute(spark)
    # column order may differ for star-except emissions; names must match
    assert sorted(via_sql.columns) == sorted(via_df.columns), sql
    a = via_sql[sorted(via_sql.columns)]
    b = via_df[sorted(via_df.columns)]
    if order_insensitive:
        a = a.sort_values(sorted(a.columns)).reset_index(drop=True)
        b = b.sort_values(sorted(b.columns)).reset_index(drop=True)
    pd.testing.assert_frame_equal(a.reset_index(drop=True), b.reset_index(drop=True))
    return sql


@pytest.fixture
def nation(sf_dir):
    return xo.deferred_read_parquet(f"{sf_dir}/nation.parquet")


@pytest.fixture
def orders(sf_dir):
    return xo.deferred_read_parquet(f"{sf_dir}/orders.parquet")


def test_scan_project_filter_sort(spark, nation):
    e = (
        nation.filter(_.n_regionkey != 2, _.n_nationkey > 3)
        .select("n_name", key2=_.n_nationkey * 2 + 1)
        .order_by(xo.desc("key2"))
    )
    sql = same(spark, e)
    assert "parquet." in sql and "WHERE" in sql and "ORDER BY" in sql


def test_mutate_case_cast(spark, nation):
    e = nation.mutate(
        flag=xo.case().when(_.n_regionkey == 0, "africa").else_("other").end(),
        kf=_.n_nationkey.cast("double"),
    ).select("n_name", "flag", "kf").order_by("n_name")
    same(spark, e)


def test_aggregate_group_by(spark, orders):
    e = (
        orders.group_by("o_orderstatus")
        .aggregate(
            n=_.o_orderkey.count(),
            total=_.o_totalprice.sum().cast("decimal(38,10)"),
            hi=_.o_totalprice.max(),
        )
        .order_by("o_orderstatus")
    )
    same(spark, e)


def test_aggregate_no_keys(spark, orders):
    e = orders.aggregate(n=_.o_orderkey.count(), avg_price=_.o_totalprice.mean())
    same(spark, e)


def test_rollup(spark, orders):
    e = (
        orders.rollup("o_orderstatus", "o_orderpriority")
        .aggregate(n=_.o_orderkey.count())
        .order_by("o_orderstatus", "o_orderpriority", "n")
    )
    same(spark, e)


def test_limit_offset(spark, nation):
    e = nation.order_by("n_nationkey").limit(5, offset=10).select("n_name")
    same(spark, e)


def test_distinct_full_and_subset(spark, orders):
    e = orders.select("o_orderstatus").distinct()
    same(spark, e, order_insensitive=True)
    e2 = orders.distinct(on=["o_orderstatus"]).aggregate(n=_.o_orderkey.count())
    # arbitrary row per key on both paths: only the count is comparable
    same(spark, e2)


def test_join_using(spark, nation, sf_dir):
    region = xo.deferred_read_parquet(f"{sf_dir}/region.parquet").rename(
        n_regionkey="r_regionkey"
    )
    e = (
        nation.join(region, "n_regionkey", how="inner")
        .select("n_name", "r_name")
        .order_by("n_name")
    )
    same(spark, e)


def test_join_pair_predicates(spark, nation, sf_dir):
    region = xo.deferred_read_parquet(f"{sf_dir}/region.parquet")
    e = (
        nation.join(region, [("n_regionkey", "r_regionkey")], how="left")
        .select("n_name", "r_name")
        .order_by("n_name")
    )
    same(spark, e)


def test_join_semi_anti(spark, nation, sf_dir):
    region = xo.deferred_read_parquet(f"{sf_dir}/region.parquet").filter(
        _.r_regionkey < 2
    ).rename(n_regionkey="r_regionkey")
    for how in ("semi", "anti"):
        e = nation.join(region, "n_regionkey", how=how).select("n_name").order_by(
            "n_name"
        )
        same(spark, e)


def test_join_theta(spark, nation):
    small = nation.select(k2=_.n_nationkey, name2=_.n_name)
    e = (
        nation.join(small, [_.n_nationkey == _.k2 + 1], how="inner")
        .select("n_name", "name2")
        .order_by("n_name")
    )
    same(spark, e)


def test_set_ops(spark, nation):
    a = nation.filter(_.n_regionkey == 0).select("n_name")
    b = nation.filter(_.n_nationkey < 10).select("n_name")
    for verb in ("union", "intersect", "difference"):
        e = getattr(a, verb)(b).order_by("n_name")
        same(spark, e, order_insensitive=True)


def test_window_functions(spark, orders):
    e = (
        orders.mutate(
            rk=xo.row_number().over(
                group_by=[_.o_orderstatus], order_by=[_.o_totalprice.desc()]
            ),
            run=_.o_totalprice.sum().over(
                group_by=[_.o_orderstatus],
                order_by=[_.o_orderkey.asc()],
                rows=(None, 0),
            ),
        )
        .filter(_.rk <= 3)
        .select("o_orderstatus", "rk", "run")
        .order_by("o_orderstatus", "rk")
    )
    same(spark, e)


def test_string_and_temporal_funcs(spark, orders):
    e = (
        orders.select(
            up=_.o_orderpriority.upper(),
            sub=_.o_orderpriority.substr(0, 3),
            yr=_.o_orderdate.year(),
            trunc=_.o_orderdate.truncate("M").cast("date"),
            padded=_.o_orderstatus.lpad(3, "#"),
        )
        .limit(50)
    )
    # limit without order is nondeterministic across plans; wrap with agg
    e = e.aggregate(n=_.up.count())
    same(spark, e)


def test_scalar_func_vocabulary(spark, nation):
    e = nation.select(
        a=_.n_name.strip().capitalize(),
        b=_.n_name.find("A"),
        c=_.n_nationkey.clip(2, 20),
        d=(_.n_nationkey // 3),
        e=(_.n_nationkey**2),
        f=_.n_name.fill_null("x"),
        g=_.n_name.identical_to("CANADA"),
        h=_.n_name.like("%IA%"),
        i=_.n_nationkey.between(3, 9),
        j=_.n_name.isin(["CANADA", "BRAZIL"]),
    ).order_by("a")
    same(spark, e)


def test_drop_rename_fill_drop_null(spark, nation):
    e = (
        nation.mutate(maybe=xo.case().when(_.n_nationkey % 2 == 0, _.n_name).end())
        .drop("n_regionkey")
        .rename(key="n_nationkey")
        .fill_null({"maybe": "<missing>"})
        .drop_null(["n_name"])
        .select("key", "maybe")
        .order_by("key")
    )
    same(spark, e)


def test_unnest(spark):
    docs = xo.memtable({"id": [1, 2], "xs": [[1, 2, 3], [4]]})
    from xorq_spark.expr.core import register_memtable  # noqa: F401

    e = docs.unnest("xs", offset=True).order_by("id", "xs_offset")
    sql = to_sql(e)
    # memtable SQL references a view: register it, then compare
    name = sql.split("FROM `")[1].split("`")[0]
    docs.to_spark(spark).createOrReplaceTempView(name)
    got = spark.sql(sql).toPandas()
    want = e.execute(spark)
    a = got[sorted(got.columns)].reset_index(drop=True)
    b = want[sorted(want.columns)].reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_sqlview_roundtrip(spark, nation):
    e = nation.sql("SELECT n_name, n_regionkey FROM v WHERE n_regionkey = 1", alias="v")
    e = e.order_by("n_name")
    same(spark, e)


def test_params_bound(spark, nation):
    cutoff = xo.param("cutoff", "bigint", default=10)
    e = nation.filter(_.n_nationkey < cutoff).select("n_name").order_by("n_name")
    same(spark, e)
    sql = to_sql(e, params={"cutoff": 3})
    assert spark.sql(sql).count() == 3


def test_tag_cache_transparent(spark, nation, tmp_path):
    e = nation.tag("lineage-probe").select("n_name").order_by("n_name")
    same(spark, e)


def test_unsupported_raise(spark, nation):
    with pytest.raises(SqlCompileError):
        to_sql(nation.sample(0.5).pivot_wider(names_from="n_name", values_from="n_nationkey"))
    from xorq_spark import udf

    @udf.scalar.python(dtype="string")
    def ident(s):
        return s

    udf_expr = nation.select(x=ident(_.n_name))
    with pytest.raises(SqlCompileError):
        to_sql(udf_expr)


_COLS = ["a", "b", "c"]


def _hyp_strategies():
    from hypothesis import strategies as st

    # executable trees only: booleans excluded (ANSI rejects
    # double-vs-boolean arithmetic on both the SQL and DataFrame path,
    # but the property needs every generated tree to run)
    # ints bounded so any depth-2 product chain stays inside int32
    # (ANSI overflow would abort both paths)
    literals = st.one_of(
        st.integers(min_value=-100, max_value=100),
        st.floats(allow_nan=False, allow_infinity=False, width=16),
    )

    @st.composite
    def value_exprs(draw, depth=2):
        # numeric-only trees: comparisons live in predicates() so no
        # boolean ever feeds arithmetic (ANSI rejects that)
        col = st.sampled_from(_COLS).map(lambda c: getattr(_, c))
        if depth == 0:
            return draw(st.one_of(col, literals.map(xo.literal)))
        left = draw(value_exprs(depth=depth - 1))
        right = draw(value_exprs(depth=depth - 1))
        import operator

        ops = {"+": operator.add, "-": operator.sub, "*": operator.mul}
        return ops[draw(st.sampled_from(list(ops)))](left, right)

    @st.composite
    def predicates(draw):
        import operator

        cmp = {"<": operator.lt, ">": operator.gt, "==": operator.eq}
        op = cmp[draw(st.sampled_from(list(cmp)))]
        return op(draw(value_exprs()), draw(value_exprs()))

    @st.composite
    def rel_exprs(draw):
        e = xo.table({c: "float64" for c in _COLS}, "hyp_t")
        for _i in range(draw(st.integers(0, 3))):
            kind = draw(st.sampled_from(["filter", "mutate", "limit", "order"]))
            if kind == "filter":
                e = e.filter(draw(predicates()))
            elif kind == "mutate":
                e = e.mutate(
                    **{draw(st.sampled_from(["m1", "m2"])): draw(value_exprs())}
                )
            elif kind == "limit":
                # data has 16 rows; limit >= 16 keeps the unordered
                # limit semantically a no-op (deterministic compare)
                e = e.limit(draw(st.integers(16, 1000)))
            else:
                e = e.order_by(draw(st.sampled_from(_COLS)))
        return e

    return rel_exprs


def test_property_random_exprs_roundtrip(spark):
    """Random filter/mutate/limit/order trees: spark.sql(to_sql(e))
    agrees with the DataFrame lowering on every generated plan — both
    sides run the same engine, so any mismatch is an emitter bug."""
    from hypothesis import given, settings

    import pandas as pd

    pdf = pd.DataFrame(
        {
            "a": [float(i % 7) - 3.0 for i in range(16)],
            "b": [float(i % 5) * 1.5 for i in range(16)],
            "c": [float(i) for i in range(16)],
        }
    )
    df = spark.createDataFrame(pdf)
    df.createOrReplaceTempView("hyp_t")
    rel_exprs = _hyp_strategies()

    @settings(max_examples=40, deadline=None)
    @given(rel_exprs())
    def run(e):
        sql = to_sql(e)
        got = spark.sql(sql).toPandas()
        want = e.to_spark(spark, bindings={"hyp_t": df}).toPandas()
        assert sorted(got.columns) == sorted(want.columns), sql
        ga = got[sorted(got.columns)].sort_values(sorted(got.columns)).reset_index(drop=True)
        wa = want[sorted(want.columns)].sort_values(sorted(want.columns)).reset_index(drop=True)
        pd.testing.assert_frame_equal(ga, wa), sql

    run()


def test_sql_runs_on_duckdb_for_ansi_subset(nation):
    """The emitted SQL for plain relational plans is close enough to
    ANSI that DuckDB runs it too (paths compile to parquet scans —
    rewrite the table form)."""
    import duckdb

    e = (
        nation.filter(_.n_regionkey == 1)
        .select("n_name", k=_.n_nationkey + 1)
        .order_by("n_name")
    )
    sql = to_sql(e).replace("parquet.", "").replace(
        "`" + nation.node.paths[0] + "`", f"read_parquet('{nation.node.paths[0]}')"
    ).replace("`", '"')
    got = duckdb.sql(sql).df()
    assert got.n_name.str.len().gt(0).all() and got.k.notna().all()


def test_expr_to_sql_method(spark, nation):
    e = nation.filter(_.n_regionkey == 0).select("n_name").order_by("n_name")
    assert spark.sql(e.to_sql()).toPandas().equals(e.execute(spark))
