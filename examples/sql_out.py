"""SQL-out: compile a deferred expression to Spark SQL text, run the
text on a bare session, and run the ANSI-shaped core on DuckDB — the
same plan in three execution paths.

    python examples/sql_out.py [sf_dir]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import xorq_spark as xo
from xorq_spark import _
from xorq_spark.session import connect


def main(sf_dir: str):
    orders = xo.deferred_read_parquet(f"{sf_dir}/orders.parquet")
    expr = (
        orders.filter(_.o_orderstatus == "F")
        .group_by("o_orderpriority")
        .aggregate(n=_.o_orderkey.count())
        .order_by("o_orderpriority")
    )

    sql = xo.to_sql(expr)
    print("-- compiled Spark SQL --")
    print(sql)

    spark = connect()
    via_df = expr.execute(spark)
    via_sql = spark.sql(sql).toPandas()
    assert via_df.equals(via_sql)
    print("\nDataFrame lowering == spark.sql(text):")
    print(via_sql.to_string(index=False))

    # the emitted core is close enough to ANSI for DuckDB: rewrite the
    # direct-path scan syntax and identifier quoting
    import duckdb

    path = f"{sf_dir}/orders.parquet"
    ddl_sql = sql.replace(f"parquet.`{path}`", f"read_parquet('{path}')").replace(
        "`", '"'
    )
    via_duck = duckdb.sql(ddl_sql).df()
    print("\nsame text on DuckDB:")
    print(via_duck.to_string(index=False))


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001")
