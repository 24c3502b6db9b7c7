"""Lakehouse round trip on the built-in Delta log (xorq_spark/delta.py):

1. land a cleaned dimension as a Delta table (atomic commit v0),
2. append a second batch through WRITE-AUDIT-PUBLISH — the staged
   files are invisible to readers until the audit passes and the
   commit JSON lands atomically,
3. show a failed audit leaving the live snapshot untouched,
4. time-travel back to v0.

    python examples/lakehouse_wap.py [sf_dir]
"""

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F

import xorq_spark as xo
from xorq_spark import _
from xorq_spark.session import connect
from xorq_spark.writes import AuditError, write_audit_publish_delta


def main(sf_dir: str):
    spark = connect()
    table = os.path.join(tempfile.mkdtemp(prefix="lakehouse_"), "nations")

    # v0: land the dimension
    nations = xo.deferred_read_parquet(f"{sf_dir}/nation.parquet").select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    v0 = nations.to_delta(table, spark)
    print(f"v{v0}: landed {xo.read_delta(table).count(spark)} nations")

    # v1 via WAP: append a derived row set, audited before publish
    extra = xo.memtable(
        {"n_nationkey": [900, 901], "n_name": ["ATLANTIS", "LEMURIA"],
         "n_regionkey": [0, 1]}
    )

    def audit_no_null_keys(staged):
        return staged.filter(_.n_nationkey.isnull()).count(spark) == 0

    def audit_positive_keys(staged):
        return staged.filter(_.n_nationkey < 0).count(spark) == 0

    v1 = write_audit_publish_delta(
        extra, table, [audit_no_null_keys, audit_positive_keys], spark
    )
    print(f"v{v1}: published after audits; now {xo.read_delta(table).count(spark)} rows")

    # a rejected batch never becomes visible
    bad = xo.memtable(
        {"n_nationkey": [-1], "n_name": ["VOID"], "n_regionkey": [9]}
    )
    try:
        write_audit_publish_delta(bad, table, [audit_positive_keys], spark)
    except AuditError as e:
        print(f"audit rejected: {str(e)[:60]}...")
    print(f"live rows unchanged: {xo.read_delta(table).count(spark)}")

    # time travel
    print(f"v0 snapshot still has {xo.read_delta(table, version=0).count(spark)} rows")
    # maintenance: MERGE upsert (stats-pruned), OPTIMIZE ZORDER, VACUUM
    from xorq_spark.delta import merge_upsert, optimize_compact, vacuum, read_delta_fallback

    updates = spark.createDataFrame(
        [(900, "ATLANTIS-2", 0), (950, "MU", 2)],
        "n_nationkey int, n_name string, n_regionkey int",
    )
    merge_upsert(spark, table, updates, ["n_nationkey"])
    print(f"after merge: {read_delta_fallback(spark, table).count()} rows "
          f"(900 updated, 950 inserted)")
    optimize_compact(spark, table, zorder=("n_nationkey", "n_regionkey"), target_files=2)
    removed = vacuum(table, retention_hours=0.0)
    print(f"optimized to 2 z-ordered files; vacuum removed {len(removed)} old files")

    top = (
        xo.read_delta(table)
        .group_by("n_regionkey")
        .agg(n=_.n_nationkey.count())
        .order_by("n_regionkey")
        .execute(spark)
    )
    print(top.to_string(index=False))


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001")
