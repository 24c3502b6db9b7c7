"""Small driver-known literal frames WITHOUT the Python-RDD scan.

``spark.createDataFrame(py_rows, ddl)`` parallelizes the rows into a
pickled Python RDD with ``defaultParallelism`` slices — so every scan
of the frame runs a stage of (mostly EMPTY) tasks that each pay a
Python-worker round-trip (~100-150 ms of parked executor time per
task, zero CPU). A 4-row quantile-spec frame consumed by three
broadcast subqueries costs three 32-task Python stages per action
(measured on agg_hdr_quantiles: 3 stages x 32 tasks x ~140 ms parked
— the jstack signature is every task thread in
``BasePythonRunner$ReaderInputStream.read`` epoll-wait).

``lit_table`` builds the same rows as a JVM literal instead:
``range(1) -> explode(array(struct(...)))`` — one task, no Python
worker, and a broadcast build of it is instant. Use it for SMALL
(metadata-sized) tables of simple scalar types; payload-sized frames
should arrive via Arrow (pandas) instead.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def _split_top(ddl: str):
    """Split a DDL column list on top-level commas (honours nesting
    brackets in types like ``array<struct<a:int,b:int>>``)."""
    parts, depth, cur = [], 0, []
    for ch in ddl:
        if ch in "<(":
            depth += 1
        elif ch in ">)":
            depth -= 1
        if ch == "," and depth == 0:
            parts.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    if cur:
        parts.append("".join(cur))
    return [p.strip() for p in parts if p.strip()]


def lit_table(spark, rows, ddl: str) -> DataFrame:
    """Drop-in for ``spark.createDataFrame(rows, ddl)`` over SMALL
    literal row lists: identical schema and values, but the plan is a
    pure-JVM literal (no pickled-RDD scan, no Python workers).

    ``rows`` is a list of tuples of plain Python scalars; ``ddl`` a
    simple ``"name type, name type"`` schema string. Every value is
    cast to its declared type, so the result's schema matches the
    createDataFrame contract exactly.
    """
    cols = []
    for field in _split_top(ddl):
        name, dtype = field.split(None, 1)
        cols.append((name, dtype))
    if not rows:
        return spark.range(0, 0, 1, 1).select(
            *[F.lit(None).cast(dt).alias(n) for n, dt in cols]
        )
    arr = F.array(
        *[
            F.struct(
                *[
                    F.lit(v).cast(dt).alias(n)
                    for v, (n, dt) in zip(r, cols)
                ]
            )
            for r in rows
        ]
    )
    # range(..., numPartitions=1): a bare range(1) still plans
    # defaultParallelism (mostly empty) tasks
    return (
        spark.range(0, 1, 1, 1)
        .select(F.explode(arr).alias("__r"))
        .select("__r.*")
    )
