"""Warehouse federation through Spark's executor-parallel JDBC path,
runnable with zero extra dependencies (embedded Derby ships in
pyspark's own jars):

1. compute a dimension summary on Spark, land it in the warehouse
   (`into_backend` -> executor-parallel JDBC writer),
2. run SQL ON the warehouse and pull the result back as a live Expr,
3. join the warehouse table against a Spark parquet scan.

Point `jdbc_connect(url=..., driver=...)` at postgres/mysql/trino by
dropping the matching JDBC jar on the classpath — same code path.

    python examples/federate_jdbc.py [sf_dir]
"""

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import xorq_spark as xo
from xorq_spark import _
from xorq_spark.interop import jdbc_connect
from xorq_spark.session import connect


def main(sf_dir: str) -> None:
    spark = connect(app_name="federate_jdbc")
    spark.sparkContext.setLogLevel("ERROR")

    con = jdbc_connect(path=tempfile.mkdtemp(prefix="derby_example_"), spark=spark)

    # 1. Spark -> warehouse
    nation = xo.deferred_read_parquet(f"{sf_dir}/nation.parquet", table_name="nation")
    summary = nation.group_by("n_regionkey").aggregate(n_nations=_.n_nationkey.count())
    name = summary.into_backend(con, "region_summary")
    print(f"landed Spark aggregate in warehouse table {name!r}")

    # 2. SQL on the warehouse, result back as a live Expr
    hot = con.sql(
        'SELECT "n_regionkey", "n_nations" FROM region_summary '
        'WHERE "n_nations" >= 5',
        spark=spark,
    )
    print(f"warehouse-side filter kept {hot.count(spark)} regions")

    # 3. warehouse table joined against a Spark parquet scan
    region = xo.deferred_read_parquet(f"{sf_dir}/region.parquet", table_name="region")
    dim = con.table("region_summary", spark=spark)
    joined = (
        region.join(
            dim.select(_.n_regionkey.name("r_regionkey"), _.n_nations),
            ["r_regionkey"],
        )
        .select("r_name", "n_nations")
        .order_by("r_name")
    )
    print(joined.execute(spark).to_string(index=False))


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001")
