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

from xorq_spark.session import (
    SessionConfig,
    connect,
    get_backend,
    get_spark,
    set_backend,
)
from xorq_spark.config import options
from xorq_spark.expr.api import (
    _,
    asc,
    case,
    deferred_read_csv,
    deferred_read_delta,
    deferred_read_json,
    deferred_read_parquet,
    desc,
    literal,
    memtable,
    param,
    read_csv,
    read_delta,
    read_json,
    read_parquet,
    register,
    row_number,
    table,
)
from xorq_spark.expr.core import Expr
from xorq_spark.expr import selectors
from xorq_spark.expr import selectors as s  # reference spelling: xo.s.numeric()


# Module-level verbs mirroring the reference's `xorq.api` surface
# (reference: expr/api.py __all__) — each a thin wrapper over the Expr
# method or the dedicated module so `import xorq_spark as xo; xo.verb(...)`
# reads like the original.
def execute(expr: Expr, **kwargs):
    return expr.execute(**kwargs)


def to_parquet(expr: Expr, path: str, **kwargs):
    return expr.to_parquet(path, **kwargs)


def to_csv(expr: Expr, path: str, **kwargs):
    return expr.to_csv(path, **kwargs)


def to_json(expr: Expr, path: str, **kwargs):
    return expr.to_json(path, **kwargs)


def to_delta(expr: Expr, path: str, **kwargs) -> int:
    return expr.to_delta(path, **kwargs)


def to_pyarrow(expr: Expr, **kwargs):
    return expr.to_pyarrow(**kwargs)


def to_pyarrow_batches(expr: Expr, **kwargs):
    return expr.to_pyarrow_batches(**kwargs)


def build_expr(expr: Expr, builds_dir: str = "builds") -> str:
    """Serialize to a build artifact dir (reference: build_expr)."""
    from xorq_spark.builds import build

    return build(expr, builds_dir)


def load_expr(build_dir: str, spark=None) -> Expr:
    """Load a build artifact back into an Expr (reference: load_expr)."""
    from xorq_spark.builds import load

    return load(build_dir, spark)


def _lazy(name):
    # imported lazily to keep `import xorq_spark` light
    def wrapper(*args, **kwargs):
        import importlib

        mod, fn = name
        return getattr(importlib.import_module(mod), fn)(*args, **kwargs)

    wrapper.__name__ = name[1]
    return wrapper


to_sql = _lazy(("xorq_spark.sql_compile", "to_sql"))
parse_sql = _lazy(("xorq_spark.sql_parse", "parse_sql"))
read_pyarrow_stream = _lazy(("xorq_spark.interop", "read_pyarrow_stream"))
to_pyarrow_stream = _lazy(("xorq_spark.interop", "to_pyarrow_stream"))
get_object_metadata = _lazy(("xorq_spark.interop", "get_object_metadata"))
jdbc_connect = _lazy(("xorq_spark.interop", "jdbc_connect"))
sqlite_backend = _lazy(("xorq_spark.backends", "sqlite_backend"))
get_plans = _lazy(("xorq_spark.plans", "get_plans"))
replace_sources = _lazy(("xorq_spark.plans", "replace_sources"))
def bind_params(expr, params: dict):
    """Substitute named scalar parameters with literals (reference:
    expr/api.py bind_params). Accepts a relational Expr (rebinds the
    whole tree) or a deferred value expression."""
    from xorq_spark.expr.core import Expr as _Expr, _bind_tree_params
    from xorq_spark.expr import deferred as _d

    if isinstance(expr, _Expr):
        return expr._wrap(_bind_tree_params(expr.node, dict(params)))
    return _d.Deferred(_d.bind_params(expr, dict(params)))


def __getattr__(name):
    # Profile machinery resolves lazily so `import xorq_spark` stays
    # light. `xo.profiles` is the submodule (python shadows module
    # __getattr__ with the real submodule after first import anyway);
    # the directory-backed collection lives at
    # `xo.profiles.collection` (reference: xo.options.profiles).
    if name == "profiles":
        import xorq_spark.profiles as _p

        return _p
    if name in ("Profile", "Profiles"):
        from xorq_spark import profiles as _p

        return getattr(_p, name)
    raise AttributeError(name)


train_test_splits = _lazy(("xorq_spark.ml.split", "train_test_splits"))
calc_split_column = _lazy(("xorq_spark.ml.split", "calc_split_column"))

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
    "deferred_read_delta",
    "deferred_read_json",
    "deferred_read_parquet",
    "read_csv",
    "read_delta",
    "read_json",
    "read_parquet",
    "register",
    "row_number",
    "literal",
    "memtable",
    "param",
    "table",
    "Expr",
    "SessionConfig",
    "selectors",
    "s",
    "Profile",
    "Profiles",
    "profiles",
    "execute",
    "set_backend",
    "get_backend",
    "to_parquet",
    "to_csv",
    "to_json",
    "to_delta",
    "to_pyarrow",
    "to_pyarrow_batches",
    "to_pyarrow_stream",
    "to_sql",
    "read_pyarrow_stream",
    "get_object_metadata",
    "jdbc_connect",
    "parse_sql",
    "sqlite_backend",
    "get_plans",
    "replace_sources",
    "build_expr",
    "load_expr",
    "train_test_splits",
    "calc_split_column",
    "__version__",
]
