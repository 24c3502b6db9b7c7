"""The UDF surface (SURVEY §2.6).

Reference mapping:
- `udf.scalar.python` (operations/udf.py:293) -> row-at-a-time `F.udf`
- `udf.scalar.pandas` (udf.py:413) / `make_pandas_udf` (expr/udf.py:340)
  -> Arrow-vectorized `F.pandas_udf` (the fast path; ~10-100x python)
- `udf.scalar.builtin` (udf.py:218) -> engine-native function by name
- `agg.pandas_df` (expr/udf.py:627) -> `groupBy().applyInPandas` (how
  deferred model *training* runs)
- `make_pandas_expr_udf` (expr/udf.py:111) -> two-phase UDF: phase-1
  expression executed first, its (pickled) result broadcast into the
  scalar UDF closure — train-then-predict in one graph
- `flight_udxf` (expr/relations.py:661) -> `mapInPandas` with a
  schema-in contract check and declared schema-out
- `pyarrow_udwf` (backend.py:88) -> per-partition `applyInPandas` over
  sorted groups (documented emulation; Spark has no UDWF primitive)

Callables are held in a process-local registry keyed by a stable token
(qualified name + dtype) so IR nodes stay plain data; bytecode never
participates in plan hashes (it is not stable across interpreters).
"""

from __future__ import annotations

import itertools
import pickle
from typing import Callable, Dict, Iterator, Optional

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from xorq_spark.expr import nodes as N
from xorq_spark.expr.core import Expr
from xorq_spark.expr.deferred import Deferred, Func, PyUDF, unwrap

_REGISTRY: Dict[str, Callable] = {}
_count = itertools.count()


def register_fn(fn: Callable, name: Optional[str] = None) -> str:
    token = f"{name or getattr(fn, '__qualname__', 'fn')}#{next(_count)}"
    _REGISTRY[token] = fn
    return token


def get_fn(token: str) -> Callable:
    return _REGISTRY[token]


# --------------------------------------------------------------------------
# scalar UDFs
# --------------------------------------------------------------------------
class scalar:
    """`@udf.scalar.pandas(dtype=...)` / `@udf.scalar.python(dtype=...)`
    decorators returning a deferred-callable, plus `builtin(name)`."""

    @staticmethod
    def pandas(fn=None, *, dtype: str = "double", name: Optional[str] = None):
        def deco(f):
            fname = name or f.__name__

            def call(*args) -> Deferred:
                return Deferred(
                    PyUDF(
                        fn=f, fn_name=fname,
                        args=tuple(unwrap(a) for a in args),
                        dtype=dtype, kind="pandas",
                    )
                )

            call.fn = f
            return call

        return deco(fn) if fn is not None else deco

    @staticmethod
    def python(fn=None, *, dtype: str = "double", name: Optional[str] = None):
        def deco(f):
            fname = name or f.__name__

            def call(*args) -> Deferred:
                return Deferred(
                    PyUDF(
                        fn=f, fn_name=fname,
                        args=tuple(unwrap(a) for a in args),
                        dtype=dtype, kind="python",
                    )
                )

            call.fn = f
            return call

        return deco(fn) if fn is not None else deco

    @staticmethod
    def builtin(name: str):
        def call(*args) -> Deferred:
            return Deferred(Func(name, tuple(unwrap(a) for a in args)))

        return call


# --------------------------------------------------------------------------
# grouped pandas UDAF (training path)
# --------------------------------------------------------------------------
def agg_pandas_df(
    expr: Expr, by, fn: Callable, schema_out: str, name: Optional[str] = None
) -> Expr:
    """Group -> pandas DataFrame -> fn -> one-row pandas DataFrame.
    `schema_out` is Spark DDL for fn's output."""
    keys = tuple(by) if isinstance(by, (list, tuple)) else (by,)
    token = register_fn(fn, name)
    return expr._wrap(N.AggPandas(expr.node, keys, token, schema_out))


def lower_agg_pandas(node: N.AggPandas, df: DataFrame) -> DataFrame:
    fn = get_fn(node.fn_token)
    return df.groupBy(*node.keys).applyInPandas(fn, schema=node.schema_out)


# --------------------------------------------------------------------------
# two-phase expr UDF (train-then-predict in one graph)
# --------------------------------------------------------------------------
def make_pandas_expr_udf(
    computed_kwargs_expr: Expr,
    fn: Callable,
    dtype: str = "double",
    name: Optional[str] = None,
):
    """Phase 1: `computed_kwargs_expr` (typically a 1-row model-training
    aggregate) executes eagerly at lowering time; its value is captured
    in the returned scalar UDF's closure (Spark serializes the closure to
    executors — the broadcast step of backend.py:322-341).

    `fn(computed, *series) -> series`."""

    def call(*args) -> Deferred:
        return Deferred(
            PyUDF(
                fn=_TwoPhase(computed_kwargs_expr, fn),
                fn_name=name or fn.__name__,
                args=tuple(unwrap(a) for a in args), dtype=dtype, kind="pandas",
            )
        )

    return call


_UNSET = object()


class _TwoPhase:
    """Callable wrapper that runs phase 1 when the plan is serialized.
    lower_value() wraps self in F.pandas_udf; Spark pickles the UDF
    (cloudpickle) before shipping, so `__reduce__` is the exact moment
    phase 1 must have executed — it replaces this object with a
    `_TwoPhaseBound(fn, computed_value)` on the wire, which is the
    "collect -> broadcast into closure" step of backend.py:322-341."""

    def __init__(self, expr, fn):
        self._expr, self._fn = expr, fn
        self._computed = _UNSET

    def _ensure(self):
        if self._computed is _UNSET:
            import pandas as pd

            result = self._expr.execute()
            value = result
            if isinstance(result, pd.DataFrame):
                # single-cell convention: a 1x1 model frame (ignoring key
                # columns) yields its value; pick the last column's first row
                value = result.iloc[0, -1]
            if isinstance(value, (bytes, bytearray)):
                value = pickle.loads(bytes(value))
            self._computed = value
        return self._computed

    def __call__(self, *series):
        return self._fn(self._ensure(), *series)

    def __reduce__(self):
        return (_TwoPhaseBound, (self._fn, self._ensure()))


class _TwoPhaseBound:
    def __init__(self, fn, computed):
        self._fn, self._computed = fn, computed

    def __call__(self, *series):
        return self._fn(self._computed, *series)


# --------------------------------------------------------------------------
# UDXF: table-in -> table-out
# --------------------------------------------------------------------------
def udxf(
    expr: Expr,
    fn: Callable,
    schema_out: str,
    schema_in_required: Optional[list] = None,
    mode: str = "pandas",
    name: Optional[str] = None,
) -> Expr:
    """Exchange UDF: pandas DataFrame -> DataFrame over Arrow batches
    (reference contract: make_udxf, flight/exchanger.py; schema-in
    condition + declared schema-out, expr/relations.py:588-598)."""
    if schema_in_required:
        missing = set(schema_in_required) - set(expr.columns)
        if missing:
            raise ValueError(f"udxf input missing required columns: {sorted(missing)}")

    if mode == "pandas":
        def runner(batches: Iterator):
            for pdf in batches:
                out = fn(pdf)
                if len(out):
                    yield out
    else:
        runner = fn  # arrow: fn already iterator-of-RecordBatch -> same

    token = register_fn(runner, name or getattr(fn, "__name__", "udxf"))
    return expr._wrap(N.MapBatches(expr.node, token, schema_out, mode))


def lower_map_batches(node: N.MapBatches, df: DataFrame) -> DataFrame:
    fn = get_fn(node.fn_token)
    if node.mode == "arrow":
        return df.mapInArrow(fn, schema=node.schema_out)
    return df.mapInPandas(fn, schema=node.schema_out)


# --------------------------------------------------------------------------
# UDWF emulation
# --------------------------------------------------------------------------
def window_udf(
    expr: Expr,
    fn: Callable,
    partition_by,
    order_by,
    result_name: str = "result",
    dtype: str = "double",
    name: Optional[str] = None,
) -> Expr:
    """Custom window function over whole ordered partitions:
    `fn(pdf) -> pd.Series` aligned with the (sorted) group. Emulated
    with applyInPandas; exact for whole-partition frames (rank-style,
    cumulative, fold evaluators), the cases the reference's UDWF tests
    exercise (test_udwf.py)."""
    pb = tuple(partition_by) if isinstance(partition_by, (list, tuple)) else (partition_by,)
    ob = tuple(order_by) if isinstance(order_by, (list, tuple)) else (order_by,)
    token = register_fn(fn, name)
    return expr._wrap(N.WindowUDF(expr.node, pb, ob, token, result_name, dtype))


def lower_window_udf(node: N.WindowUDF, df: DataFrame) -> DataFrame:
    fn = get_fn(node.fn_token)
    order = list(node.order_by)
    in_ddl = ",".join(f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields)
    out_schema = f"{in_ddl},{node.result_name} {node.dtype}"

    def per_group(pdf):
        pdf = pdf.sort_values(order).reset_index(drop=True)
        pdf[node.result_name] = fn(pdf)
        return pdf

    return df.groupBy(*node.partition_by).applyInPandas(per_group, schema=out_schema)


def make_pandas_udf(fn, schema, return_type: str = "double", name: Optional[str] = None):
    """Multi-column pandas-DataFrame scalar UDF (reference:
    expr/udf.py:340 make_pandas_udf): `fn(pdf)` receives an Arrow batch
    of the schema's columns as a pandas DataFrame and returns a Series.
    The returned constructor is called with column expressions, or via
    `.on_expr(expr)` which selects the schema's columns itself."""
    import pandas as pd

    cols = list(schema)
    fname = name or getattr(fn, "__name__", "pandas_udf")

    def wrapper(*series):
        pdf = pd.concat(series, axis=1)
        pdf.columns = cols
        return fn(pdf)

    def construct(*args) -> Deferred:
        return Deferred(
            PyUDF(
                fn=wrapper, fn_name=fname,
                args=tuple(unwrap(a) for a in args),
                dtype=return_type, kind="pandas",
            )
        )

    def on_expr(e):
        from xorq_spark.expr.deferred import Col

        return construct(*(Deferred(Col(c)) for c in cols))

    construct.on_expr = on_expr
    construct.fn = fn
    construct.return_type = return_type
    return construct


class agg:
    """Aggregate-UDF namespace matching the reference spelling
    (`udf.agg.pandas_df`, `udf.agg.builtin`, `udf.agg.pyarrow`)."""

    pandas_df = staticmethod(agg_pandas_df)
    # The pyarrow aggregator rides the same applyInPandas lowering —
    # batches arrive via Arrow either way.
    pyarrow = staticmethod(agg_pandas_df)

    @staticmethod
    def builtin(name: str):
        """Engine-native aggregate by name (sum, approx_count_distinct,
        ...): stays JVM-side."""

        def call(*args) -> Deferred:
            return Deferred(Func(name, tuple(unwrap(a) for a in args)))

        return call


# Reference spelling for the window-UDF emulation (pyarrow_udwf,
# backend.py:88): same applyInPandas-over-ordered-partitions lowering,
# Arrow-batched either way.
pyarrow_udwf = window_udf


# --------------------------------------------------------------------------
# Python UDTF surface (Spark 4 native table functions)
# --------------------------------------------------------------------------
_udtf_counter = itertools.count()


class table:
    """`@udf.table.python(returns=...)`: wrap a per-row generator into a
    Spark 4 native Python UDTF (arrow-optimized table function — each
    input row may yield 0..n output rows).

    The decorated function receives the positional column values and
    yields output tuples matching ``returns`` (Spark DDL). The wrapper
    exposes:

    - direct call with Columns/literals -> DataFrame (constant-arg
      table factory), the native Spark UDTF call form;
    - ``.apply(df, *cols)`` -> DataFrame: runs the UDTF laterally
      against every row of ``df``, keeping the input columns beside the
      UDTF output (the flat-map-with-context shape).

    Slow-path caveat (same as udf.scalar.python): rows cross into the
    Python worker. Prefer built-in explode/inline/posexplode where the
    expansion is expressible; this surface exists for genuinely
    imperative row expansions (parsers, tokenizers, samplers).
    """

    @staticmethod
    def python(fn=None, *, returns: str, name: Optional[str] = None):
        def deco(f):
            from pyspark.sql.functions import udtf as _native_udtf

            body = {"eval": staticmethod(lambda *a: iter(f(*a)))}
            cls = type(name or f.__name__, (), body)
            wrapped = _native_udtf(cls, returnType=returns)

            def apply(df: DataFrame, *cols: str) -> DataFrame:
                spark = df.sparkSession
                uid = next(_udtf_counter)
                fname = f"xorq_udtf_{name or f.__name__}_{uid}"
                view = f"xorq_udtf_in_{uid}"
                spark.udtf.register(fname, wrapped)
                df.createOrReplaceTempView(view)
                args = ", ".join(f"t.{c}" for c in cols)
                return spark.sql(
                    f"SELECT t.*, u.* FROM {view} t, LATERAL {fname}({args}) u"
                )

            wrapped.apply = apply
            wrapped.fn = f
            return wrapped

        return deco(fn) if fn is not None else deco
