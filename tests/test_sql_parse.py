"""SQL -> Expr lift (sql_parse.py): semantics vs spark.sql ground
truth, round-trip with sql_compile's Expr -> SQL, and the determinism
contract (same SQL text -> identical tokenize() hash, so SQL-defined
relations cache like API-built ones).
"""

from __future__ import annotations

import pandas as pd
import pytest

import xorq_spark as xo
from xorq_spark.sql_parse import SqlParseError, parse_sql
from xorq_spark.tokenize import tokenize


@pytest.fixture(scope="module")
def catalog(spark, sf_dir):
    region = xo.deferred_read_parquet(f"{sf_dir}/region.parquet", table_name="region")
    nation = xo.deferred_read_parquet(f"{sf_dir}/nation.parquet", table_name="nation")
    orders = xo.deferred_read_parquet(f"{sf_dir}/orders.parquet", table_name="orders")
    return {"region": region, "nation": nation, "orders": orders}


def _run(spark, catalog, sql, **kwargs):
    return (
        parse_sql(sql, catalog, spark=spark)
        .execute(spark)
        .reset_index(drop=True)
    )


def _ground_truth(spark, sf_dir, sql):
    for name in ("region", "nation", "orders"):
        spark.read.parquet(f"{sf_dir}/{name}.parquet").createOrReplaceTempView(name)
    return spark.sql(sql).toPandas().reset_index(drop=True)


class TestSemantics:
    @pytest.mark.parametrize(
        "sql",
        [
            "SELECT r_regionkey, r_name FROM region ORDER BY r_regionkey",
            "SELECT * FROM region WHERE r_regionkey > 1 ORDER BY r_regionkey LIMIT 2",
            "SELECT r_name, r_regionkey + 10 AS shifted FROM region ORDER BY r_name",
            "SELECT n_regionkey, count(*) AS n, sum(n_nationkey) AS s "
            "FROM nation GROUP BY n_regionkey ORDER BY n_regionkey",
            "SELECT n_regionkey, count(*) AS n FROM nation "
            "GROUP BY n_regionkey HAVING count(*) > 4 ORDER BY n_regionkey",
            "SELECT DISTINCT n_regionkey FROM nation ORDER BY n_regionkey",
            "SELECT n_name, r_name FROM nation JOIN region USING (r_regionkey) "
            "ORDER BY n_name"
            if False
            else "SELECT n_name FROM nation WHERE n_nationkey BETWEEN 3 AND 6 ORDER BY n_name",
            "SELECT n_name FROM nation WHERE n_regionkey IN (0, 2) ORDER BY n_name",
            "SELECT n_name FROM nation WHERE n_name LIKE 'A%' ORDER BY n_name",
            "SELECT CASE WHEN n_regionkey = 0 THEN 'africa' ELSE 'other' END AS bucket, "
            "n_name FROM nation ORDER BY n_name",
            "SELECT CAST(n_nationkey AS STRING) AS k FROM nation ORDER BY k",
            "SELECT n_name FROM nation WHERE NOT n_regionkey = 1 AND n_nationkey < 10 "
            "ORDER BY n_name",
            "SELECT o_orderpriority, count(*) AS n FROM orders "
            "WHERE o_totalprice > 100000.0 GROUP BY o_orderpriority "
            "ORDER BY o_orderpriority",
            "SELECT upper(n_name) AS u, length(n_name) AS l FROM nation ORDER BY u",
            "SELECT count(DISTINCT n_regionkey) AS n FROM nation",
            "SELECT o_custkey, sum(o_totalprice) AS spend FROM orders "
            "GROUP BY o_custkey ORDER BY spend DESC LIMIT 5",
        ],
    )
    def test_matches_spark_sql(self, spark, sf_dir, catalog, sql):
        got = _run(spark, catalog, sql)
        want = _ground_truth(spark, sf_dir, sql)
        pd.testing.assert_frame_equal(got, want, check_dtype=False)

    def test_join_on_predicate(self, spark, sf_dir, catalog):
        sql = (
            "SELECT n_name, r_name FROM nation "
            "JOIN region ON n_regionkey = r_regionkey ORDER BY n_name"
        )
        got = _run(spark, catalog, sql)
        want = _ground_truth(spark, sf_dir, sql)
        pd.testing.assert_frame_equal(got, want, check_dtype=False)

    def test_derived_table(self, spark, sf_dir, catalog):
        sql = (
            "SELECT big FROM (SELECT n_regionkey AS big FROM nation "
            "WHERE n_nationkey > 10) t WHERE big > 1 ORDER BY big"
        )
        got = _run(spark, catalog, sql)
        want = _ground_truth(spark, sf_dir, sql)
        pd.testing.assert_frame_equal(got, want, check_dtype=False)

    def test_unknown_table_becomes_unbound_ref(self, spark, sf_dir):
        spark.read.parquet(f"{sf_dir}/region.parquet").createOrReplaceTempView(
            "region"
        )
        out = parse_sql("SELECT r_name FROM region ORDER BY r_name", spark=spark)
        assert len(out.execute(spark)) == 5


class TestDeterminismAndRoundTrip:
    def test_same_sql_same_tokenize_hash(self, spark, catalog):
        sql = (
            "SELECT n_regionkey, count(*) AS n FROM nation "
            "WHERE n_nationkey > 2 GROUP BY n_regionkey"
        )
        e1 = parse_sql(sql, catalog, spark=spark)
        e2 = parse_sql(sql, catalog, spark=spark)
        assert tokenize(e1.node) == tokenize(e2.node)

    def test_different_sql_different_hash(self, spark, catalog):
        a = parse_sql("SELECT n_name FROM nation WHERE n_nationkey > 2", catalog, spark=spark)
        b = parse_sql("SELECT n_name FROM nation WHERE n_nationkey > 3", catalog, spark=spark)
        assert tokenize(a.node) != tokenize(b.node)

    def test_expr_to_sql_to_expr_same_result(self, spark, catalog):
        """Round trip: API expr -> to_sql -> parse_sql -> same rows."""
        from xorq_spark import _

        e = (
            catalog["nation"]
            .filter(_.n_nationkey > 2)
            .group_by("n_regionkey")
            .aggregate(n=_.n_nationkey.count())
            .order_by("n_regionkey")
        )
        sql = xo.to_sql(e)
        lifted = parse_sql(sql, catalog, spark=spark)
        pd.testing.assert_frame_equal(
            e.execute(spark).reset_index(drop=True),
            lifted.execute(spark).reset_index(drop=True),
            check_dtype=False,
        )

    def test_parsed_expr_participates_in_caching(self, spark, catalog):
        e = parse_sql(
            "SELECT n_regionkey, count(*) AS n FROM nation GROUP BY n_regionkey",
            catalog,
            spark=spark,
        )
        cached = e.cache()
        out = cached.execute(spark)
        assert len(out) == 5


class TestErrors:
    def test_unsupported_constructs_raise(self, spark, catalog):
        with pytest.raises(SqlParseError):
            parse_sql("UPDATE nation SET n_name = 'x'", catalog, spark=spark)
        with pytest.raises(SqlParseError):
            parse_sql(
                "SELECT (SELECT max(n_nationkey) FROM nation) FROM region",
                catalog,
                spark=spark,
            )
        with pytest.raises(SqlParseError):
            parse_sql("SELECT n_name FROM nation WHERE n_regionkey IN (r_regionkey)", catalog, spark=spark)

    def test_trailing_garbage_raises(self, spark, catalog):
        with pytest.raises(SqlParseError, match="unconsumed"):
            parse_sql("SELECT n_name FROM nation extra garbage, here", catalog, spark=spark)


class TestParserProperties:
    """Hypothesis: generated SELECTs must execute identically through
    parse_sql -> Expr -> DataFrame and through spark.sql (Spark's own
    parser as ground truth)."""

    def test_random_selects_match_spark_sql(self, spark, sf_dir, catalog):
        from hypothesis import given, settings, strategies as st

        for name in ("region", "nation", "orders"):
            spark.read.parquet(f"{sf_dir}/{name}.parquet").createOrReplaceTempView(name)

        cols = ["n_nationkey", "n_regionkey"]
        compare = st.sampled_from(["<", "<=", ">", ">=", "=", "<>"])
        arith = st.sampled_from(["+", "-", "*"])

        @st.composite
        def queries(draw):
            c1, c2 = draw(st.sampled_from(cols)), draw(st.sampled_from(cols))
            lit = draw(st.integers(-3, 25))
            lit2 = draw(st.integers(0, 4))
            parts = [
                f"SELECT n_name, {c1} {draw(arith)} {lit2} AS x FROM nation"
            ]
            if draw(st.booleans()):
                pred = f"{c1} {draw(compare)} {lit}"
                if draw(st.booleans()):
                    pred += f" AND {c2} {draw(compare)} {draw(st.integers(-3, 25))}"
                parts.append(f"WHERE {pred}")
            parts.append("ORDER BY n_name")
            if draw(st.booleans()):
                parts.append(f"LIMIT {draw(st.integers(1, 30))}")
            return " ".join(parts)

        @settings(max_examples=25, deadline=None)
        @given(sql=queries())
        def inner(sql):
            got = (
                parse_sql(sql, catalog, spark=spark)
                .execute(spark)
                .reset_index(drop=True)
            )
            want = spark.sql(sql).toPandas().reset_index(drop=True)
            pd.testing.assert_frame_equal(got, want, check_dtype=False)

        inner()

    def test_random_aggregates_match_spark_sql(self, spark, sf_dir, catalog):
        from hypothesis import given, settings, strategies as st

        for name in ("nation", "orders"):
            spark.read.parquet(f"{sf_dir}/{name}.parquet").createOrReplaceTempView(name)

        agg = st.sampled_from(
            ["count(*)", "sum(o_totalprice)", "min(o_totalprice)", "max(o_custkey)", "avg(o_totalprice)"]
        )

        @st.composite
        def queries(draw):
            a = draw(agg)
            q = f"SELECT o_orderpriority, {a} AS m FROM orders"
            if draw(st.booleans()):
                q += f" WHERE o_custkey > {draw(st.integers(0, 500))}"
            q += " GROUP BY o_orderpriority"
            if draw(st.booleans()):
                q += " HAVING count(*) > 2"
            q += " ORDER BY o_orderpriority"
            return q

        @settings(max_examples=15, deadline=None)
        @given(sql=queries())
        def inner(sql):
            got = (
                parse_sql(sql, catalog, spark=spark)
                .execute(spark)
                .reset_index(drop=True)
            )
            want = spark.sql(sql).toPandas().reset_index(drop=True)
            pd.testing.assert_frame_equal(got, want, check_dtype=False)

        inner()
