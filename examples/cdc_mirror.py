"""End-to-end CDC mirror on the built-in Delta log (round-6 features):

1. land a customer dimension as a Delta table, turn on the Change
   Data Feed table property,
2. stream two micro-batches of CDC updates through the exactly-once
   streaming MERGE sink (`stream_upsert_to_delta`: per-batch
   last-write-wins collapse + the txn replay marker committed
   atomically with the rewrite),
3. read the row-level change feed back out (`read_table_changes`:
   insert / update_preimage / update_postimage rows per commit) — the
   downstream-consumer half of the mirror,
4. roll the table back with RESTORE and show history auditing it.

    python examples/cdc_mirror.py [sf_dir]
"""

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F

from xorq_spark import streaming as S
from xorq_spark.delta import (
    read_delta_fallback,
    read_table_changes,
    restore_table,
    set_table_property,
    table_history,
    write_delta,
)
from xorq_spark.session import connect


def main(sf_dir: str):
    spark = connect(app_name="cdc_mirror")
    spark.sparkContext.setLogLevel("ERROR")
    work = tempfile.mkdtemp(prefix="cdc_mirror_")
    table = os.path.join(work, "customers")

    # 1. base dimension + CDF on
    base = (
        spark.read.parquet(f"{sf_dir}/customer.parquet")
        .select(
            F.col("c_custkey").alias("k"),
            F.col("c_acctbal").cast("double").alias("balance"),
            F.lit(0).cast("long").alias("seq"),
        )
        .limit(100)
    )
    write_delta(base, table)
    set_table_property(table, "delta.enableChangeDataFeed", "true")
    v0_rows = read_delta_fallback(spark, table).count()
    print(f"base table: {v0_rows} rows, CDF enabled")

    # 2. CDC feed: two updates to one key inside a batch (collapse!)
    #    plus one brand-new key
    src = os.path.join(work, "changes")
    spark.createDataFrame(
        [(1, 111.0, 5), (1, 999.0, 9), (100001, 42.0, 1)],
        "k long, balance double, seq long",
    ).coalesce(1).write.parquet(src)
    stream = spark.readStream.schema("k long, balance double, seq long").parquet(
        f"{src}/*.parquet"
    )
    S.stream_upsert_to_delta(
        stream, table, os.path.join(work, "ckpt"), ["k"], order_col="seq"
    )
    merged = {
        r["k"]: r["balance"]
        for r in read_delta_fallback(spark, table)
        .where(F.col("k").isin(1, 100001))
        .collect()
    }
    print(f"after CDC merge: k=1 -> {merged[1]} (seq 9 won), "
          f"k=100001 -> {merged[100001]} (inserted)")

    # 3. the change feed a downstream consumer tails
    hist = table_history(table)
    merge_v = hist[0]["version"]
    changes = (
        read_table_changes(spark, table, merge_v, merge_v)
        .orderBy("_change_type", "k")
        .collect()
    )
    for r in changes:
        print(f"  v{r['_commit_version']} {r['_change_type']:17s} "
              f"k={r['k']} balance={r['balance']}")

    # 4. rollback + audit trail
    restore_table(spark, table, 1)  # back to pre-merge (post-property)
    assert read_delta_fallback(spark, table).count() == v0_rows
    print("restored to v1; history:")
    for h in table_history(table)[:4]:
        print(f"  v{h['version']}: {h['operation']} "
              f"(+{h['n_adds']}/-{h['n_removes']})")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001")
