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


def _sqlite_type(arrow_type) -> str:
    import pyarrow.types as pt

    if pt.is_integer(arrow_type) or pt.is_boolean(arrow_type):
        return "INTEGER"
    if pt.is_floating(arrow_type) or pt.is_decimal(arrow_type):
        return "REAL"
    if pt.is_binary(arrow_type) or pt.is_large_binary(arrow_type):
        return "BLOB"
    return "TEXT"  # strings, dates/timestamps (ISO), nested (JSON-ish str)


def arrow_into_sqlite(expr: Expr, con, name: Optional[str] = None):
    """Execute on Spark, load the result into a sqlite table (reference:
    backends/sqlite — the zero-dependency federation target; sqlite3 is
    stdlib). Returns the table name.

    Scale role: sqlite is a single-node sink — the right target for
    small dimension tables, lookup exchanges, and test fixtures, never
    for fact data (use to_parquet for that). Values transfer via Arrow
    then executemany; timestamps/dates store as ISO-8601 TEXT,
    booleans as 0/1 INTEGER (sqlite's own affinity rules)."""
    import datetime as dt
    import decimal

    name = name or "xorq_spark_result"
    tbl = expr.to_pyarrow()
    cols = ", ".join(
        f'"{f.name}" {_sqlite_type(f.type)}' for f in tbl.schema
    )
    con.execute(f'DROP TABLE IF EXISTS "{name}"')
    con.execute(f'CREATE TABLE "{name}" ({cols})')

    def conv(v):
        if isinstance(v, bool):
            return int(v)
        if isinstance(v, (dt.datetime, dt.date)):
            return v.isoformat(sep=" ") if isinstance(v, dt.datetime) else v.isoformat()
        if isinstance(v, decimal.Decimal):
            return float(v)
        if isinstance(v, (list, dict, tuple)):
            import json

            return json.dumps(v, default=str)
        return v

    rows = [
        tuple(conv(v) for v in row)
        for row in zip(*(c.to_pylist() for c in tbl.columns))
    ]
    placeholders = ", ".join("?" * tbl.num_columns)
    con.executemany(f'INSERT INTO "{name}" VALUES ({placeholders})', rows)
    con.commit()
    return name


def sqlite_into_spark(con, query: str, spark=None) -> Expr:
    """Run SQL on sqlite, ingest the result as a memtable Expr (the
    reverse RemoteTable direction, like duckdb_into_spark)."""
    import pandas as pd

    from xorq_spark.expr.api import memtable

    cur = con.execute(query)
    cols = [d[0] for d in cur.description]
    return memtable(pd.DataFrame(cur.fetchall(), columns=cols))


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


def read_pyarrow_stream(source, spark=None, table_name: Optional[str] = None) -> Expr:
    """Arrow IPC stream (file path, file-like, or buffer) -> Expr
    (reference: expr/api.py:162 read_pyarrow_stream). The stream is
    drained into a memtable; `table_name` optionally registers it as a
    temp view for SQL access."""
    import pyarrow as pa

    if isinstance(source, str):
        with open(source, "rb") as fh:
            tbl = pa.ipc.open_stream(fh).read_all()
    else:
        tbl = pa.ipc.open_stream(source).read_all()
    expr = read_record_batches(tbl, spark=spark)
    if table_name is not None:
        expr.to_spark().createOrReplaceTempView(table_name)
    return expr


def to_pyarrow_stream(expr: Expr, sink) -> None:
    """Write an expression's result as an Arrow IPC stream to `sink`
    (path or file-like), batch by batch (reference: expr/api.py:661
    to_pyarrow_stream). The result is collected to the driver first
    (Spark's collect is all-at-once); for results that don't fit a
    driver, write a parquet dataset (`to_parquet`) instead — IPC
    streams are the small-result interchange format (Flight, sockets,
    files handed to another engine)."""
    import pyarrow as pa

    rbr = expr.to_pyarrow_batches()
    own = isinstance(sink, str)
    fh = open(sink, "wb") if own else sink
    try:
        with pa.ipc.new_stream(fh, rbr.schema) as writer:
            for batch in rbr:
                writer.write_batch(batch)
    finally:
        if own:
            fh.close()


def get_object_metadata(path: str, **kwargs) -> dict:
    """File-level metadata without reading data (reference:
    expr/api.py:788 get_object_metadata): parquet gets footer stats
    (rows, row groups, columns, compressed size), anything else gets
    filesystem stats. At scale this is the planning primitive —
    split/row-group layout decides scan parallelism."""
    import os

    import pyarrow.parquet as pq

    suffix = os.path.splitext(path)[1].lstrip(".")
    meta = {"path": path, "suffix": suffix, "size_bytes": os.path.getsize(path)}
    if suffix == "parquet":
        f = pq.ParquetFile(path, **kwargs)
        m = f.metadata
        meta.update(
            num_rows=m.num_rows,
            num_row_groups=m.num_row_groups,
            num_columns=m.num_columns,
            created_by=m.created_by,
            schema={
                fld.name: str(fld.type) for fld in f.schema_arrow
            },
            row_group_bytes=[
                m.row_group(i).total_byte_size for i in range(m.num_row_groups)
            ],
        )
    return meta


class PandasBackend:
    """In-memory pandas engine (reference: backends/pandas — a
    dict-of-DataFrames backend used for fixtures, tests, and
    driver-sized lookup data).

    Scale role: strictly a driver-side sink/source for SMALL tables —
    broadcast dimensions, fitted-model features, query sets. Fact data
    never lands here; the transfer is a full collect.
    """

    def __init__(self):
        self._tables = {}

    def create_table(self, name: str, obj) -> "Expr":
        """Register a pandas DataFrame / Arrow table / dict of columns
        under `name`; returns the table as an Expr (reference:
        Backend.create_table)."""
        import pandas as pd
        import pyarrow as pa

        if isinstance(obj, pa.Table):
            df = obj.to_pandas()
        elif isinstance(obj, pd.DataFrame):
            df = obj.copy()
        else:
            df = pd.DataFrame(obj)
        self._tables[name] = df
        return self.table(name)

    def table(self, name: str) -> "Expr":
        """The named table as a Spark-bound memtable Expr."""
        from xorq_spark.expr.api import memtable

        return memtable(self._tables[name], name=name)

    def list_tables(self):
        return sorted(self._tables)

    def drop_table(self, name: str) -> None:
        self._tables.pop(name, None)

    def to_pandas(self, name: str):
        return self._tables[name]

    def to_pyarrow(self, name: str):
        import pyarrow as pa

        return pa.Table.from_pandas(self._tables[name], preserve_index=False)


def pandas_connect() -> PandasBackend:
    """A fresh pandas backend (reference: ``xo.pandas.connect()``)."""
    return PandasBackend()


def arrow_into_pandas(expr: Expr, con: PandasBackend, name: Optional[str] = None):
    """Execute on Spark, land the Arrow result as a pandas DataFrame in
    the target backend; returns the registered table as an Expr so the
    pipeline can keep composing (reference: into_backend to the pandas
    backend, expr/relations.py:430)."""
    name = name or "xorq_spark_result"
    tbl = expr.to_pyarrow()
    return con.create_table(name, tbl)


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
    if mod.startswith("sqlite3"):
        return arrow_into_sqlite(expr, con, name)
    if isinstance(con, PandasBackend):
        return arrow_into_pandas(expr, con, name)
    if isinstance(con, JdbcBackend):
        return arrow_into_jdbc(expr, con, name)
    from xorq_spark.backends import DbapiBackend, arrow_into_dbapi

    if isinstance(con, DbapiBackend):
        return arrow_into_dbapi(expr, con, name)
    raise TypeError(f"unsupported backend connection: {type(con)!r}")


class JdbcBackend:
    """A warehouse reachable through Spark's OWN JDBC source/sink — the
    executor-parallel federation path (reference: the warehouse backend
    adapters under backends/; entry points pyproject.toml:207-220).
    Unlike the DBAPI helpers below, reads and writes here run on the
    EXECUTORS: `predicates`/`partitionColumn` shard the read, and the
    writer opens one JDBC connection per partition — the shape that
    scales to a real warehouse.

    Embedded Derby (`jdbc_connect()` with no args) ships inside
    pyspark's own jars, so the full round-trip is exercisable with zero
    extra dependencies; point `url`/`driver` at postgres/mysql/trino by
    dropping the matching JDBC jar on the classpath.

    Identifier caveat (Derby, also postgres): Spark's JDBC writer
    quotes column names, so they keep their exact case; unquoted
    identifiers in a raw `query=` are case-folded by the engine. Quote
    column names in raw queries ('SELECT "id" FROM t').
    """

    def __init__(self, url: str, driver: Optional[str] = None, spark=None, **properties):
        self.url = url
        self.properties = dict(properties)
        if driver:
            self.properties["driver"] = driver
        self._spark = spark

    def _session(self, spark=None):
        if spark is not None:
            return spark
        if self._spark is not None:
            return self._spark
        from xorq_spark.session import connect as _connect

        return _connect()

    def write(self, df, name: str, mode: str = "overwrite") -> str:
        df.write.jdbc(self.url, name, mode=mode, properties=self.properties)
        return name

    def table(self, name: str, spark=None) -> Expr:
        """Live JDBC-backed Expr over a warehouse table — scans stream
        from the warehouse at execution time (filters Spark can express
        in the dialect are pushed into the remote WHERE clause)."""
        from xorq_spark.expr.api import register

        spark = self._session(spark)
        df = spark.read.jdbc(self.url, name, properties=self.properties)
        return register(spark, df, f"jdbc_{name}")

    def sql(self, query: str, spark=None) -> Expr:
        """Run a raw SQL query ON the warehouse; result becomes a
        JDBC-backed Expr (remote engine executes the query, Spark
        streams the result set)."""
        from xorq_spark.expr.api import register

        spark = self._session(spark)
        reader = spark.read.format("jdbc").option("url", self.url).option("query", query)
        for k, v in self.properties.items():
            reader = reader.option(k, v)
        import hashlib

        tag = hashlib.md5(query.encode()).hexdigest()[:8]
        return register(spark, reader.load(), f"jdbc_q_{tag}")


def jdbc_connect(
    url: Optional[str] = None,
    driver: Optional[str] = None,
    path: Optional[str] = None,
    spark=None,
    **properties,
) -> JdbcBackend:
    """Open a JDBC federation target. With no `url`, an embedded Derby
    database is created under `path` (default: a per-process temp dir)
    using the Derby jars pyspark already ships — the zero-dependency
    warehouse stand-in for the reference's postgres/trino adapters."""
    if url is None:
        import tempfile

        base = path or tempfile.mkdtemp(prefix="xorq_spark_derby_")
        url = f"jdbc:derby:{base}/db;create=true"
        driver = driver or "org.apache.derby.jdbc.EmbeddedDriver"
    return JdbcBackend(url, driver=driver, spark=spark, **properties)


def arrow_into_jdbc(expr: Expr, con: JdbcBackend, name: Optional[str] = None) -> str:
    """Execute on Spark, land the result in the JDBC warehouse via the
    executor-parallel writer (one connection per partition — no
    driver-side row loop). Returns the remote table name."""
    name = name or "xorq_spark_result"
    return con.write(expr.to_spark(), name)


def jdbc_into_spark(con: JdbcBackend, query: str, spark=None) -> Expr:
    """Run SQL on the warehouse, ingest as a live Expr (the reverse
    RemoteTable direction; mirrors duckdb_into_spark)."""
    return con.sql(query, spark=spark)


def postgres_connect(dsn: str = "", **kwargs):
    """Connect to postgres for federation (reference:
    backends/postgres). Gated: needs a postgres client driver
    (psycopg2, pg8000, or adbc_driver_postgresql), none of which ship
    in this container — the import error says which to install. The
    returned DBAPI connection works with `postgres_into_spark` /
    `arrow_into_postgres` below."""
    try:
        import psycopg2  # noqa: PLC0415

        return psycopg2.connect(dsn, **kwargs)
    except ImportError:
        pass
    try:
        import pg8000.dbapi  # noqa: PLC0415

        return pg8000.dbapi.connect(**kwargs)
    except ImportError:
        pass
    raise ImportError(
        "postgres federation needs a client driver: pip install psycopg2-binary "
        "or pg8000 (none found). For cluster-side parallel reads use Spark's "
        "JDBC source with the postgres JDBC jar on the classpath instead."
    )


def arrow_into_postgres(expr: Expr, con, name: Optional[str] = None):
    """Execute on Spark, load the result into a postgres table over a
    DBAPI connection — the reference's most-exercised remote backend
    (backends/postgres). Column types map through the same conservative
    rules as sqlite (ints/floats/text/bytea; timestamps as timestamptz).

    Scale note: this is a driver-side executemany — correct for dims and
    small results. Fact-sized transfers belong on the executors: Spark's
    JDBC writer (`df.write.jdbc(...)`) with the postgres JDBC jar
    parallelizes per-partition; this helper intentionally stays
    dependency-light for the common small-table federation case."""
    import decimal

    import pyarrow.types as pt

    def pg_type(arrow_type) -> str:
        if pt.is_boolean(arrow_type):
            return "BOOLEAN"
        if pt.is_integer(arrow_type):
            return "BIGINT"
        if pt.is_floating(arrow_type) or pt.is_decimal(arrow_type):
            return "DOUBLE PRECISION"
        if pt.is_binary(arrow_type) or pt.is_large_binary(arrow_type):
            return "BYTEA"
        if pt.is_timestamp(arrow_type):
            return "TIMESTAMPTZ"
        if pt.is_date(arrow_type):
            return "DATE"
        return "TEXT"

    name = name or "xorq_spark_result"
    tbl = expr.to_pyarrow()
    cols = ", ".join(f'"{f.name}" {pg_type(f.type)}' for f in tbl.schema)
    cur = con.cursor()
    cur.execute(f'DROP TABLE IF EXISTS "{name}"')
    cur.execute(f'CREATE TABLE "{name}" ({cols})')

    def conv(v):
        if isinstance(v, decimal.Decimal):
            return float(v)
        if isinstance(v, (list, dict, tuple)):
            import json

            return json.dumps(v, default=str)
        return v

    rows = [
        tuple(conv(v) for v in row)
        for row in zip(*(c.to_pylist() for c in tbl.columns))
    ]
    placeholders = ", ".join(["%s"] * tbl.num_columns)
    if rows:
        cur.executemany(f'INSERT INTO "{name}" VALUES ({placeholders})', rows)
    con.commit()
    return name


def postgres_into_spark(con, query: str, spark=None) -> Expr:
    """Run SQL on postgres, ingest the result as a memtable Expr (the
    reverse RemoteTable direction, like duckdb_into_spark)."""
    import pandas as pd

    from xorq_spark.expr.api import memtable

    cur = con.cursor()
    cur.execute(query)
    cols = [d[0] for d in cur.description]
    return memtable(pd.DataFrame(cur.fetchall(), columns=cols))
