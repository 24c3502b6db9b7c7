"""xorq_spark — a PySpark-native deferred analytics engine.

A from-scratch rebuild of the capabilities of xorq-labs/xorq (deferred
multi-engine dataframe system) re-expressed Spark-first: the lazy
expression graph is a thin, hashable, serializable IR that lowers to the
PySpark DataFrame API and lets Catalyst/Tungsten/AQE do all physical
optimization. On top of that sit the xorq-differentiating layers:
content-addressed caching, deferred reads, named params, a UDF/UDXF
surface, deterministic ML splits/pipelines, and build artifacts —
plus large-scale training-data operators (dedup, similarity search,
text analysis, multimodal plumbing) the reference does not ship.

Reference (studied, not copied): xorq-labs/xorq @ /root/reference.
"""

from xorq_spark.session import connect, get_spark, options
from xorq_spark.expr.api import (
    _,
    asc,
    case,
    deferred_read_csv,
    deferred_read_json,
    deferred_read_parquet,
    desc,
    literal,
    memtable,
    param,
    read_csv,
    read_json,
    read_parquet,
    register,
    table,
)
from xorq_spark.expr.core import Expr

__version__ = "0.1.0"

__all__ = [
    "connect",
    "get_spark",
    "options",
    "_",
    "asc",
    "case",
    "desc",
    "deferred_read_csv",
    "deferred_read_json",
    "deferred_read_parquet",
    "read_csv",
    "read_json",
    "read_parquet",
    "register",
    "literal",
    "memtable",
    "param",
    "table",
    "Expr",
    "__version__",
]
