"""Source surface in one place (SURVEY §2.1): deferred file readers,
memtables, polymorphic register, Arrow ingestion, examples.

Thin facade over expr.api / interop / examples so the source taxonomy
is discoverable as `xorq_spark.sources.*`.
"""

from xorq_spark.expr.api import (
    deferred_read_csv,
    deferred_read_delta,
    deferred_read_json,
    deferred_read_parquet,
    memtable,
    read_csv,
    read_delta,
    read_json,
    read_parquet,
    register,
    table,
)
from xorq_spark.interop import duckdb_into_spark, read_record_batches
from xorq_spark.delta import read_delta_fallback, replay_log, write_delta

__all__ = [
    "deferred_read_parquet",
    "deferred_read_csv",
    "deferred_read_json",
    "deferred_read_delta",
    "read_parquet",
    "read_csv",
    "read_json",
    "read_delta",
    "memtable",
    "table",
    "register",
    "read_record_batches",
    "duckdb_into_spark",
    "write_delta",
    "replay_log",
    "read_delta_fallback",
]
