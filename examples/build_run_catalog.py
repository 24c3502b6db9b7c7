"""Build artifact lifecycle: declare a parameterized expression, build
it to a hash-named artifact dir, run it through the CLI with a bound
parameter, and version it in the pipeline catalog.

    python examples/build_run_catalog.py [sf_dir]
"""

import os
import subprocess
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import xorq_spark as xo
from xorq_spark import catalog
from xorq_spark.builds import build
from xorq_spark.expr.deferred import _


def pipeline(sf_dir: str) -> xo.Expr:
    """Orders above a runtime-bound price threshold, by priority."""
    orders = xo.deferred_read_parquet(f"{sf_dir}/orders.parquet")
    return (
        orders.filter(_.o_totalprice > xo.param("min_price", "double", default=100000.0))
        .group_by("o_orderpriority")
        .aggregate(n=_.o_orderkey.count())
        .order_by("o_orderpriority")
    )


def main(sf_dir: str):
    expr = pipeline(sf_dir)

    builds_dir = tempfile.mkdtemp(prefix="builds-")
    build_dir = build(expr, builds_dir)
    print("built:", os.path.basename(build_dir))
    print("contents:", sorted(os.listdir(build_dir)))

    # Same artifact, two parameter bindings, via the CLI (as a user would).
    for threshold in ("100000.0", "300000.0"):
        r = subprocess.run(
            [sys.executable, "-m", "xorq_spark", "run", build_dir,
             "--param", f"min_price={threshold}", "--limit", "10"],
            capture_output=True, text=True,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        )
        print(f"min_price={threshold}:")
        print("\n".join("  " + ln for ln in r.stdout.strip().splitlines()))

    # Version it in the catalog (git-native registry when git is present).
    root = tempfile.mkdtemp(prefix="catalog-")
    v = catalog.add("orders_by_priority", expr, root=root)
    print("catalog version:", v, "->", list(catalog.ls(root=root)))


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001")
