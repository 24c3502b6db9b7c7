"""Generic DBAPI warehouse core (backends.py) — tested against stdlib
sqlite3, the code path every gated warehouse connector (trino,
snowflake, databricks, bigquery, mysql) reuses with only a dialect
profile swapped."""

from __future__ import annotations

import datetime

import pytest

import xorq_spark as xo
from xorq_spark import _
from xorq_spark.backends import (
    BIGQUERY,
    DATABRICKS,
    MYSQL,
    SNOWFLAKE,
    TRINO,
    DbapiBackend,
    sqlite_backend,
)


@pytest.fixture
def wh():
    return sqlite_backend()


class TestDbapiCore:
    def test_roundtrip_types(self, spark, wh):
        e = xo.memtable(
            {
                "i": [1, 2, None],
                "f": [1.5, None, 3.25],
                "s": ["a", "b", None],
                "b": [True, False, None],
            }
        )
        name = e.into_backend(wh, "t_types")
        assert name == "t_types"
        back = wh.table("t_types", spark=spark).execute(spark)
        assert len(back) == 3
        assert back["i"].dropna().tolist() == [1, 2]
        assert back["s"].dropna().tolist() == ["a", "b"]

    def test_dates_and_timestamps_roundtrip_as_iso(self, spark, wh):
        e = xo.memtable(
            {
                "d": [datetime.date(2024, 3, 1)],
                "ts": [datetime.datetime(2024, 3, 1, 12, 30, 0)],
            }
        )
        e.into_backend(wh, "t_dt")
        back = wh.sql("SELECT d, ts FROM t_dt", spark=spark).execute(spark)
        assert back["d"][0] == "2024-03-01"
        assert back["ts"][0] == "2024-03-01 12:30:00"

    def test_warehouse_side_sql(self, spark, wh):
        xo.memtable({"k": [1, 2, 3, 4], "v": [10.0, 20.0, 30.0, 40.0]}).into_backend(
            wh, "t_sql"
        )
        out = wh.sql('SELECT sum("v") AS s FROM t_sql WHERE "k" > 2', spark=spark)
        assert out.execute(spark)["s"][0] == 70.0

    def test_cross_engine_join(self, spark, wh):
        xo.memtable({"k": [0, 1, 2], "label": ["x", "y", "z"]}).into_backend(wh, "dims")
        dims = wh.table("dims", spark=spark)
        facts = xo.memtable({"k": [0, 1, 1, 9], "x": [1.0, 2.0, 3.0, 4.0]})
        got = (
            facts.join(dims, ["k"])
            .group_by("label")
            .aggregate(s=_.x.sum())
            .order_by("label")
            .execute(spark)
        )
        assert got["s"].tolist() == [1.0, 5.0]

    def test_overwrite_and_list_tables(self, spark, wh):
        xo.memtable({"a": [1]}).into_backend(wh, "t_over")
        xo.memtable({"a": [2, 3]}).into_backend(wh, "t_over")
        assert len(wh.table("t_over", spark=spark).execute(spark)) == 2
        assert "t_over" in wh.list_tables()

    def test_nested_values_land_as_json(self, spark, wh):
        e = xo.memtable({"k": [1], "arr": [[1, 2, 3]]})
        e.into_backend(wh, "t_json")
        got = wh.sql("SELECT arr FROM t_json", spark=spark).execute(spark)
        assert got["arr"][0] == "[1, 2, 3]"


class TestDialectProfiles:
    def test_ddl_type_maps_are_dialect_correct(self):
        """Each profile maps every arrow class; spot-check the names
        that actually differ across warehouses."""
        for d in (TRINO, SNOWFLAKE, DATABRICKS, BIGQUERY, MYSQL):
            assert set(d.types) == {
                "bool", "int", "float", "decimal", "binary",
                "timestamp", "date", "string",
            }
        assert TRINO.types["string"] == "VARCHAR"
        assert SNOWFLAKE.types["int"] == "NUMBER"
        assert DATABRICKS.types["string"] == "STRING" and DATABRICKS.quote == "`"
        assert BIGQUERY.types["int"] == "INT64" and BIGQUERY.placeholder == "%s"
        assert MYSQL.types["timestamp"] == "DATETIME"

    def test_gated_connectors_raise_named_importerror(self):
        from xorq_spark import backends as B

        for fn, wheel in (
            (B.trino_connect, "trino"),
            (B.snowflake_connect, "snowflake"),
            (B.databricks_connect, "databricks"),
            (B.bigquery_connect, "bigquery"),
            (B.mysql_connect, "mysql"),
        ):
            with pytest.raises(ImportError, match=wheel):
                fn()

    def test_generic_core_accepts_any_dbapi(self, spark):
        """The documented escape hatch: hand DbapiBackend any DBAPI
        connection + dialect directly."""
        import sqlite3

        from xorq_spark.backends import SQLITE

        be = DbapiBackend(sqlite3.connect(":memory:"), SQLITE)
        xo.memtable({"x": [1, 2]}).into_backend(be, "t")
        assert be.table("t", spark=spark).count(spark) == 2
