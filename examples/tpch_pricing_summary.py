"""TPC-H q1 through the deferred Expr API, with a content-addressed
cache boundary — the xorq-style "declare once, execute anywhere" slice.

    python examples/tpch_pricing_summary.py [sf_dir]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import xorq_spark as xo
from xorq_spark.expr.deferred import _


def pipeline(sf_dir: str) -> xo.Expr:
    li = xo.deferred_read_parquet(f"{sf_dir}/lineitem.parquet")
    disc = _.l_extendedprice.cast("decimal(18,2)") * (
        1 - _.l_discount.cast("decimal(8,4)")
    )
    return (
        li.filter(_.l_shipdate < "1998-09-01")
        .group_by("l_returnflag", "l_linestatus")
        .aggregate(
            sum_qty=_.l_quantity.cast("decimal(18,2)").sum(),
            sum_disc_price=disc.sum().cast("decimal(38,10)"),
            count_order=_.l_orderkey.count(),
        )
        .order_by("l_returnflag", "l_linestatus")
        .cache()  # second run reads the Parquet artifact, not lineitem
    )


if __name__ == "__main__":
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    expr = pipeline(sf_dir)
    print("token:", expr.ls.tokenized)
    print(expr.execute().to_string(index=False))
