"""Cross-engine interchange over Arrow.

Reference: `into_backend` (expr/relations.py:430) moves a table between
engines as an Arrow RecordBatch stream; `read_record_batches`
(backends/xorq_datafusion/backend.py:729) ingests Arrow into a session.
Within one Spark cluster into_backend is a no-op barrier (Spark reuses
exchanges; `persist()` when a hard barrier is wanted) — the real cases
are external engines, with DuckDB first-class (it is the test oracle).
"""

from __future__ import annotations

from typing import Optional

from xorq_spark.expr.core import Expr


def arrow_into_duckdb(expr: Expr, con, name: Optional[str] = None):
    """Execute on Spark, register the Arrow result as a DuckDB view.
    Returns a DuckDB relation (queryable with con.sql)."""
    name = name or "xorq_spark_result"
    tbl = expr.to_pyarrow()
    con.register(name, tbl)
    return con.view(name)


def duckdb_into_spark(con, query: str, spark=None) -> Expr:
    """Run SQL on DuckDB, ingest the Arrow result as a memtable Expr —
    the reverse RemoteTable direction."""
    from xorq_spark.expr.api import memtable

    return memtable(con.sql(query).arrow())


def read_record_batches(source, spark=None) -> Expr:
    """Arrow Table / RecordBatchReader / iterable of batches -> Expr
    (reference: read_record_batches, backend.py:729)."""
    import pyarrow as pa

    if isinstance(source, pa.Table):
        tbl = source
    elif isinstance(source, pa.RecordBatchReader):
        tbl = source.read_all()
    else:
        tbl = pa.Table.from_batches(list(source))
    from xorq_spark.expr.api import memtable

    return memtable(tbl)


def into_backend(expr: Expr, con=None, name: Optional[str] = None):
    """Dispatch on target engine. `con=None` = Spark-internal barrier:
    materialize through the content-addressed cache so N downstream
    scans replay one computation (the StreamCache max_readers problem,
    ADR-0013, solved by artifact reuse instead of stream buffering)."""
    if con is None:
        return expr.cache()
    mod = type(con).__module__
    if mod.startswith("duckdb"):
        return arrow_into_duckdb(expr, con, name)
    raise TypeError(f"unsupported backend connection: {type(con)!r}")
