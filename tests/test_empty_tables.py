"""Every catalog query must execute (not necessarily return rows) on
schema-identical EMPTY tables — the degenerate input that flushes out
head()/first()/assume-nonempty bugs before they hit a filtered partition
at scale."""

from __future__ import annotations

import os

import pytest

from xorq_spark.queries import QUERIES

SRC = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def empty_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("empty_sf"))
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split():
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{SRC}/{t}.parquet")
        df.limit(0).write.mode("overwrite").parquet(os.path.join(d, f"{t}.parquet"))
    return d


def test_all_queries_survive_empty_tables(spark, empty_dir):
    failures = {}
    for name in sorted(QUERIES):
        try:
            QUERIES[name](spark, empty_dir).collect()
        except Exception as exc:  # noqa: BLE001 - collecting all failures
            failures[name] = f"{type(exc).__name__}: {str(exc)[:200]}"
    assert not failures, f"{len(failures)} queries break on empty input: {failures}"
