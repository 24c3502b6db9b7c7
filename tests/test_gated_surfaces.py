"""The environment-blocked perimeter, made observable in the test
report: every surface that is implemented but gated on a jar/wheel this
container doesn't ship XFAILs here with the missing dependency named —
and runs for real the day the dependency appears. ``pytest -m gated``
lists exactly the env-blocked surfaces (VERDICT r6 ask #7)."""

from __future__ import annotations

import importlib.util

import pytest

pytestmark = pytest.mark.gated


def _wheel(name: str) -> bool:
    try:
        return importlib.util.find_spec(name) is not None
    except ModuleNotFoundError:
        # find_spec on a dotted path raises when the parent package
        # itself is absent — same meaning here: wheel not installed
        return False


def test_iceberg_wap(spark, tmp_path):
    """WAP against an Iceberg catalog (writes.write_audit_publish_iceberg)."""
    from xorq_spark import writes as W

    if not W.iceberg_available(spark):
        pytest.xfail("iceberg-spark-runtime jar absent in this container")
    import xorq_spark as xo

    e = xo.memtable({"a": [1, 2, 3]})
    W.write_audit_publish_iceberg(
        e, "spark_catalog.default.gated_wap", [lambda s: True], spark=spark
    )
    assert spark.table("spark_catalog.default.gated_wap").count() == 3


def test_spark_connect_remote():
    """Remote execution over Spark Connect (remote.remote_session)."""
    from xorq_spark import remote as C

    if not C.connect_available():
        pytest.xfail("grpcio wheel absent in this container")
    # no Connect server runs in this container either; reaching the
    # dial is the runnable boundary when the wheel exists
    with pytest.raises(Exception):
        C.remote_session("sc://localhost:1").range(1).collect()


@pytest.mark.parametrize(
    ("connector", "wheel"),
    [
        ("trino_connect", "trino"),
        ("snowflake_connect", "snowflake.connector"),
        ("databricks_connect", "databricks.sql"),
        ("bigquery_connect", "google.cloud.bigquery"),
        ("mysql_connect", "pymysql"),
    ],
)
def test_warehouse_connector(connector, wheel):
    """Warehouse federation profiles (backends.*_connect): the generic
    DBAPI core they sit on is fully tested via sqlite/duckdb/Derby;
    only the client wheel is missing here."""
    from xorq_spark import backends

    fn = getattr(backends, connector)
    if not _wheel(wheel):
        with pytest.raises(ImportError):
            fn()
        pytest.xfail(f"{wheel} wheel absent in this container")
    # wheel present: the connector must build a DbapiBackend or fail
    # with a CONNECTION error, never an ImportError
    try:
        fn()
    except ImportError:
        raise
    except Exception:
        pass
