"""Flat functional API module (reference parity: ``xorq.expr.api`` /
``xorq.api`` re-exports).

Reference users write ``from xorq.api import deferred_read_parquet`` or
``import xorq.expr.api as api``; this module gives those imports a
home under the same spellings (reference __all__:
/root/reference/python/xorq/expr/api.py).
"""

from xorq_spark import (
    bind_params,
    calc_split_column,
    deferred_read_csv,
    deferred_read_json,
    deferred_read_parquet,
    execute,
    get_backend,
    get_object_metadata,
    get_plans,
    read_pyarrow_stream,
    register,
    set_backend,
    to_csv,
    to_json,
    to_parquet,
    to_pyarrow,
    to_pyarrow_batches,
    to_pyarrow_stream,
    to_sql,
    train_test_splits,
)

__all__ = [
    "bind_params",
    "calc_split_column",
    "deferred_read_csv",
    "deferred_read_json",
    "deferred_read_parquet",
    "execute",
    "get_backend",
    "get_object_metadata",
    "get_plans",
    "read_pyarrow_stream",
    "register",
    "set_backend",
    "to_csv",
    "to_json",
    "to_parquet",
    "to_pyarrow",
    "to_pyarrow_batches",
    "to_pyarrow_stream",
    "to_sql",
    "train_test_splits",
]
