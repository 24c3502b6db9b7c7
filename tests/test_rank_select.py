"""rank_select_from_counts (operators/prefix.py) must return exactly
the running_sum construction's answer — the smallest key whose
cumulative count reaches each requested rank — for any distinct-key
count table. Equivalence is the whole correctness claim: the hdr
exact-quantile arm swapped onto it in round 9."""

from __future__ import annotations

import pyspark.sql.functions as F

from xorq_spark.operators.prefix import rank_select_from_counts, running_sum


def _via_running_sum(cnts, needs):
    exc = running_sum(cnts, "v", "c", "cum").select(
        "v", F.col("cum").cast("long").alias("cum")
    )
    return {
        r["q"]: r["exact"]
        for r in exc.crossJoin(F.broadcast(needs))
        .where(F.col("cum") >= F.col("need"))
        .groupBy("q")
        .agg(F.min("v").cast("long").alias("exact"))
        .collect()
    }


def _via_rank_select(cnts, needs, **kw):
    return {
        r["q"]: r["exact"]
        for r in rank_select_from_counts(cnts, needs, **kw).collect()
    }


def _needs(spark, pairs):
    return spark.createDataFrame(pairs, "q string, need long")


def test_matches_running_sum_on_random_counts(spark):
    import random

    rnd = random.Random(9)
    rows = [(v, rnd.randint(1, 5)) for v in sorted(rnd.sample(range(100_000), 3000))]
    cnts = spark.createDataFrame(rows, "v long, c long")
    total = sum(c for _, c in rows)
    needs = _needs(
        spark,
        [("p1", max(1, total // 100)), ("p50", (total + 1) // 2),
         ("p99", total * 99 // 100), ("max", total)],
    )
    assert _via_rank_select(cnts, needs) == _via_running_sum(cnts, needs)


def test_bucket_boundaries_exact(spark):
    # ranks landing exactly on bucket edges (key = bucket multiple) and
    # a need satisfied by the first key of a later bucket
    rows = [(0, 2), (4095, 1), (4096, 3), (8191, 1), (8192, 5)]
    cnts = spark.createDataFrame(rows, "v long, c long")
    needs = _needs(
        spark, [("a", 1), ("b", 2), ("c", 3), ("d", 6), ("e", 7), ("f", 12)]
    )
    got = _via_rank_select(cnts, needs)
    assert got == _via_running_sum(cnts, needs)
    assert got == {"a": 0, "b": 0, "c": 4095, "d": 4096, "e": 8191, "f": 8192}


def test_single_bucket_and_single_key(spark):
    cnts = spark.createDataFrame([(7, 10)], "v long, c long")
    needs = _needs(spark, [("lo", 1), ("hi", 10)])
    assert _via_rank_select(cnts, needs) == {"lo": 7, "hi": 7}


def test_custom_bucket_size(spark):
    rows = [(v, 1) for v in range(50)]
    cnts = spark.createDataFrame(rows, "v long, c long")
    needs = _needs(spark, [("q1", 13), ("q2", 37)])
    for bucket in (1, 7, 64):
        assert _via_rank_select(cnts, needs, bucket=bucket) == {
            "q1": 12,
            "q2": 36,
        }
