"""Bucketed tables and co-located joins.

At 100 TB the dominant cost of a fact-fact join is the shuffle. Spark's
bucketing writes each table pre-hash-partitioned AND sorted on the join
key (`DataFrameWriter.bucketBy`); a join of two tables bucketed the
same way needs NO exchange — the sort-merge join reads co-located
buckets directly. This module wraps that pattern and verifies the
no-shuffle property (used by tests and ops tooling).

The reference has no bucketing concept (DataFusion repartitions at
runtime); this is a Spark-native scale extra, the §7 "pre-partitioning"
strategy made durable.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    by: Sequence[str],
    buckets: int = 64,
    sort: bool = True,
    mode: str = "overwrite",
) -> None:
    """Persist `df` as a bucketed (and bucket-sorted) managed table.
    `buckets` should be sized so one bucket of the largest table fits an
    executor's memory at target scale (e.g. 100 TB / 64 GiB ≈ 2048)."""
    w = df.write.mode(mode).bucketBy(buckets, *by)
    if sort:
        w = w.sortBy(*by)
    w.saveAsTable(table)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on: Sequence[str],
    how: str = "inner",
) -> DataFrame:
    """Join two same-bucketed tables on their bucket keys. With matching
    bucket counts Spark plans a zero-exchange sort-merge join."""
    return spark.table(left_table).join(spark.table(right_table), list(on), how)


def exchange_count(df: DataFrame) -> int:
    """Number of shuffle Exchange operators in the executed plan —
    the thing bucketing is supposed to eliminate."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    return sum(
        line.count("Exchange") - line.count("BroadcastExchange")
        for line in plan.splitlines()
    )
