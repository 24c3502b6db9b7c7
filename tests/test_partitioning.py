"""operators.partitioning (round 10): the scan-split estimator must
reproduce Spark's actual FilePartition packing for the test tables —
widen() decisions depend on it — and must degrade to the scale-safe
"already wide" answer on non-file inputs."""

from __future__ import annotations

import pyspark.sql.functions as F

from xorq_spark.operators.partitioning import scan_bytes, scan_splits, widen
from xorq_spark.queries.base import TABLES, t

SF_DIR = "/root/testdata/sf0.01"


def test_scan_splits_matches_actual_partitions(spark):
    for name in TABLES:
        df = t(spark, SF_DIR, name)
        assert scan_splits(df) == df.rdd.getNumPartitions(), name


def test_scan_splits_on_derived_projection(spark):
    d = (
        t(spark, SF_DIR, "lineitem")
        .select("l_orderkey", "l_quantity")
        .where(F.col("l_quantity") > 0)
    )
    assert scan_splits(d) == d.rdd.getNumPartitions()


def test_non_file_inputs_treated_as_wide(spark):
    ck = t(spark, SF_DIR, "lineitem").localCheckpoint(eager=False)
    assert scan_splits(ck) is None
    # widen must be a plan no-op (no new exchange) on such inputs
    assert widen(ck) is ck
    local = spark.range(10)
    assert widen(local) is local


def test_scan_bytes_is_file_size(spark):
    import os

    df = t(spark, SF_DIR, "lineitem")
    assert scan_bytes(df) == os.path.getsize(f"{SF_DIR}/lineitem.parquet")
    assert scan_bytes(df.localCheckpoint(eager=False)) is None


def test_widen_engages_only_below_parallelism(spark):
    df = t(spark, SF_DIR, "documents")
    par = spark.sparkContext.defaultParallelism
    out = widen(df)
    if (scan_splits(df) or par) < par:
        assert out.rdd.getNumPartitions() == par
    else:
        assert out is df
