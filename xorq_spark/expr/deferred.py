"""The value-expression AST and the `_` deferred column builder.

This is the rebuild's equivalent of the reference's `ops.Value` operator
family + the Deferred `_` placeholder (vendor/ibis/expr/operations/*.py,
vendor/ibis/expr/api.py). Nodes are small frozen dataclasses — hashable,
comparable, and serializable to plain data — and *lower to*
`pyspark.sql.Column` expressions (SURVEY §2.3-2.5 mapping table), so
Catalyst/Tungsten do all optimization and execution.
"""

from __future__ import annotations

import datetime as _dt
import decimal as _decimal
import operator as _op
from dataclasses import dataclass, field
from typing import Any, Callable, Optional, Tuple

import pyspark.sql.functions as F
from pyspark.sql import Column

from xorq_spark.expr.datatypes import to_spark_ddl


# --------------------------------------------------------------------------
# AST nodes
# --------------------------------------------------------------------------
@dataclass(frozen=True)
class VNode:
    """Base value node."""


@dataclass(frozen=True)
class Col(VNode):
    name: str


@dataclass(frozen=True, eq=False)
class Lit(VNode):
    """Literal value. Equality is deliberately STRICTER than Python's
    numeric equality: `0.0 == -0.0` and `True == 1` are True for
    Python but produce different literals (different repr, different
    Spark type), and the token/caching contract requires that
    equal-by-== nodes tokenize identically — so equality compares
    (type, repr, dtype), matching exactly what tokenize hashes.
    Surfaced by hypothesis: two ==-equal graphs differing only in a
    -0.0/0.0 literal hashed to different cache keys."""

    value: Any
    dtype: Optional[str] = None

    def _key(self):
        return (type(self.value).__name__, repr(self.value), self.dtype)

    def __eq__(self, other):
        return isinstance(other, Lit) and self._key() == other._key()

    def __hash__(self):
        return hash((Lit, self._key()))


@dataclass(frozen=True)
class BinOp(VNode):
    op: str
    left: VNode
    right: VNode


@dataclass(frozen=True)
class UnOp(VNode):
    op: str
    operand: VNode


@dataclass(frozen=True)
class Func(VNode):
    """Named function call; `name` resolves through the lowering catalog
    and falls back to pyspark.sql.functions — the rebuild's version of
    `udf.scalar.builtin` name-mapping (operations/udf.py:218)."""

    name: str
    args: Tuple[Any, ...] = ()
    options: Tuple[Tuple[str, Any], ...] = ()


@dataclass(frozen=True)
class Cast(VNode):
    operand: VNode
    dtype: str
    try_: bool = False


@dataclass(frozen=True)
class Case(VNode):
    branches: Tuple[Tuple[VNode, VNode], ...]
    default: Optional[VNode] = None


@dataclass(frozen=True)
class SortKey(VNode):
    expr: VNode
    ascending: bool = True
    nulls_first: Optional[bool] = None


@dataclass(frozen=True)
class WindowExpr(VNode):
    func: VNode
    partition_by: Tuple[VNode, ...] = ()
    order_by: Tuple[SortKey, ...] = ()
    frame_kind: Optional[str] = None  # "rows" | "range"
    start: Optional[int] = None  # None = unbounded
    end: Optional[int] = None


@dataclass(frozen=True)
class Param(VNode):
    """Named scalar parameter (reference: NamedScalarParameter,
    expr/api.py:801-890) — substituted with a literal by the bind pass
    before lowering."""

    name: str
    dtype: Optional[str] = None
    default: Any = None


@dataclass(frozen=True)
class PyUDF(VNode):
    """Scalar Python/pandas UDF reference (reference: udf.scalar.python/
    pandas, operations/udf.py:293,413). `fn` participates in equality by
    qualified name + dtype, not object identity."""

    fn: Callable = field(compare=False)
    fn_name: str = ""
    args: Tuple[VNode, ...] = ()
    dtype: str = "string"
    kind: str = "pandas"  # "pandas" (vectorized) | "python" (row-at-a-time)


# --------------------------------------------------------------------------
# Lowering: VNode -> pyspark Column
# --------------------------------------------------------------------------
_BINOPS = {
    "+": _op.add, "-": _op.sub, "*": _op.mul, "/": _op.truediv,
    "%": _op.mod, "==": _op.eq, "!=": _op.ne, "<": _op.lt, "<=": _op.le,
    ">": _op.gt, ">=": _op.ge, "&": _op.and_, "|": _op.or_, "^": _op.xor,
    "//": lambda l, r: F.floor(l / r),
    "**": lambda l, r: F.pow(l, r),
    "eq_null_safe": lambda l, r: l.eqNullSafe(r),
}

# Column-method calls (receiver-style) the generic Func catalog resolves
# before falling back to pyspark.sql.functions.
_COL_METHODS = {
    "isin", "like", "ilike", "rlike", "contains", "startswith", "endswith",
    "between", "getItem", "getField", "substr", "bitwiseAND", "bitwiseOR",
    "bitwiseXOR",
}

_TRUNC_UNITS = {
    "Y": "year", "Q": "quarter", "M": "month", "W": "week", "D": "day",
    "h": "hour", "m": "minute", "s": "second",
}


def _ibis_substr(c, start, length=None):
    # reference Substring is 0-indexed; Spark substring is 1-indexed
    if length is None:
        return F.substring(c, start + 1, 2**31 - 1)
    return F.substring(c, start + 1, length)


def _ibis_find(c, sub, start=None):
    # reference StringFind mimics str.find: 0-based, -1 when absent;
    # F.locate is 1-based with 0 for absent
    if start is not None:
        return F.locate(sub, c, start + 1) - 1
    return F.locate(sub, c) - 1


_STRFTIME_TO_JAVA = {
    "%Y": "yyyy", "%y": "yy", "%m": "MM", "%d": "dd", "%H": "HH",
    "%I": "hh", "%M": "mm", "%S": "ss", "%f": "SSSSSS", "%j": "DDD",
    "%a": "EEE", "%A": "EEEE", "%b": "MMM", "%B": "MMMM", "%p": "a",
    "%%": "'%'",
}


def _strftime(c, fmt: str):
    """C-strftime format (the reference's strftime contract,
    operations/temporal.py) -> Java DateTimeFormatter pattern for
    date_format. Literal letters are quoted so they don't parse as
    pattern fields."""
    out, lit, i = [], [], 0

    def flush():
        if lit:
            run = "".join(lit)
            # one quoted run per stretch (per-char quoting would read as
            # Java's '' = literal apostrophe); quotes only needed when
            # letters are present
            out.append("'" + run.replace("'", "''") + "'" if any(
                ch.isalpha() for ch in run
            ) else run)
            lit.clear()

    while i < len(fmt):
        if fmt[i] == "%" and i + 1 < len(fmt):
            code = fmt[i : i + 2]
            if code == "%%":  # literal percent joins the current run, so
                lit.append("%")  # it can't abut a quoted run as Java's ''
                i += 2
                continue
            if code not in _STRFTIME_TO_JAVA:
                raise ValueError(f"unsupported strftime code {code!r}")
            flush()
            out.append(_STRFTIME_TO_JAVA[code])
            i += 2
        else:
            lit.append(fmt[i])
            i += 1
    flush()
    return F.date_format(c, "".join(out))


def _substitute(c, mapping, else_=None):
    """Value substitution CASE (reference: Value.substitute,
    operations/generic.py): mapped values replace, unmapped keep the
    original unless `else_` overrides."""
    if not isinstance(mapping, dict):
        mapping = {mapping: else_}
        else_ = None
    out = None
    for k, v in mapping.items():
        vcol = v if isinstance(v, Column) else F.lit(v)
        cond = c == F.lit(k)
        out = F.when(cond, vcol) if out is None else out.when(cond, vcol)
    default = (
        c if else_ is None else (else_ if isinstance(else_, Column) else F.lit(else_))
    )
    return default if out is None else out.otherwise(default)


def _cases(c, *branches, else_=None):
    """Value.cases (reference: vendor ibis generic.py Value.cases):
    ordered (match_value, result) branches compared by equality against
    the subject column, with an optional else_ (NULL when absent)."""
    out = None
    for pair in branches:
        k, v = pair
        kcol = k if isinstance(k, Column) else F.lit(k)
        vcol = v if isinstance(v, Column) else F.lit(v)
        cond = c == kcol
        out = F.when(cond, vcol) if out is None else out.when(cond, vcol)
    if out is None:
        raise ValueError("cases() needs at least one (value, result) branch")
    default = else_ if isinstance(else_, Column) else (
        F.lit(else_) if else_ is not None else F.lit(None)
    )
    return out.otherwise(default)


def _clip(c, lower=None, upper=None):
    out = c
    if lower is not None:
        out = F.greatest(out, F.lit(lower))
    if upper is not None:
        out = F.least(out, F.lit(upper))
    return out


# Name aliases: reference op vocabulary -> pyspark.sql.functions
_FUNC_ALIASES = {
    # strings (reference operations/strings.py vocabulary)
    "strip": "trim", "lstrip": "ltrim", "rstrip": "rtrim",
    "capitalize": "initcap",
    "re_split": lambda c, p: F.split(c, p),
    "find": _ibis_find,
    "substr": _ibis_substr,
    "left": lambda c, n: F.substring(c, 1, n),
    "join_": "concat_ws",
    # temporal (operations/temporal.py)
    "truncate": lambda c, unit: F.date_trunc(_TRUNC_UNITS.get(unit, unit), c),
    "day_of_week_name": lambda c: F.date_format(c, "EEEE"),
    "day_of_year": "dayofyear",
    "week_of_year": "weekofyear",
    "day_of_month": "dayofmonth",
    # numeric (operations/numeric.py)
    "log_base": lambda c, base: F.log(float(base), c),
    "sign": "signum",
    "clip": _clip,
    "floordiv": lambda l, r: F.floor(l / r),
    "mean": "avg", "std": "stddev_samp", "var": "var_samp",
    "approx_median": lambda c: F.percentile_approx(c, 0.5),
    "strftime": _strftime,
    "substitute": _substitute,
    "cases": _cases,
    "nunique": "count_distinct",
    "approx_nunique": "approx_count_distinct",
    "fillna": lambda c, v: F.coalesce(c, v if isinstance(v, Column) else F.lit(v)),
    "re_extract": "regexp_extract", "re_replace": "regexp_replace",
    "re_search": lambda c, p: c.rlike(p),
    "replace": lambda c, search, repl: F.replace(
        c,
        search if isinstance(search, Column) else F.lit(search),
        repl if isinstance(repl, Column) else F.lit(repl),
    ),
    "group_concat": lambda c, sep=",": F.array_join(F.collect_list(c), sep),
    "collect": "collect_list", "arbitrary": "any_value",
    "argmax": "max_by", "argmin": "min_by",
    "quantile": "percentile", "approx_quantile": "percentile_approx",
    "day_of_week_index": "dayofweek", "epoch_seconds": "unix_timestamp",
    "log2": "log2", "ln": lambda c: F.log(c),
    "negate": lambda c: -c, "invert": lambda c: ~c,
    "fill_null": lambda c, v: F.coalesce(c, v if isinstance(v, Column) else F.lit(v)),
    "nullif": lambda c, v: F.nullif(c, v if isinstance(v, Column) else F.lit(v)),
    "identical_to": lambda l, r: l.eqNullSafe(r),
    # variadic value args (reference Greatest/Least take scalars or columns)
    "greatest": lambda *cs: F.greatest(
        *(c if isinstance(c, Column) else F.lit(c) for c in cs)
    ),
    "least": lambda *cs: F.least(
        *(c if isinstance(c, Column) else F.lit(c) for c in cs)
    ),
}


def _is_vnode(x) -> bool:
    return isinstance(x, VNode)


def lower_value(node: Any, resolve: Callable[[str], Column]) -> Column:
    """Lower a VNode (or plain literal) to a pyspark Column. `resolve`
    maps a column name to a Column (usually F.col; join lowering passes
    a qualifier-aware resolver)."""
    if isinstance(node, Deferred):
        node = node.node
    if not _is_vnode(node):
        return F.lit(node)
    if isinstance(node, Col):
        return resolve(node.name)
    if isinstance(node, Lit):
        c = F.lit(node.value)
        return c.cast(to_spark_ddl(node.dtype)) if node.dtype else c
    if isinstance(node, Param):
        raise ValueError(
            f"unbound parameter {node.name!r}: pass params={{...}} to execute()"
        )
    if isinstance(node, BinOp):
        return _BINOPS[node.op](
            lower_value(node.left, resolve), lower_value(node.right, resolve)
        )
    if isinstance(node, UnOp):
        x = lower_value(node.operand, resolve)
        return {"-": lambda: -x, "~": lambda: ~x, "abs": lambda: F.abs(x)}[node.op]()
    if isinstance(node, Cast):
        x = lower_value(node.operand, resolve)
        spark_t = to_spark_ddl(node.dtype)
        return x.try_cast(spark_t) if node.try_ else x.cast(spark_t)
    if isinstance(node, Case):
        out = None
        for cond, val in node.branches:
            c = lower_value(cond, resolve)
            v = lower_value(val, resolve)
            out = F.when(c, v) if out is None else out.when(c, v)
        if node.default is not None:
            out = out.otherwise(lower_value(node.default, resolve))
        return out
    if isinstance(node, SortKey):
        c = lower_value(node.expr, resolve)
        if node.ascending:
            if node.nulls_first is None:
                return c.asc()
            return c.asc_nulls_first() if node.nulls_first else c.asc_nulls_last()
        if node.nulls_first is None:
            return c.desc()
        return c.desc_nulls_first() if node.nulls_first else c.desc_nulls_last()
    if isinstance(node, WindowExpr):
        from pyspark.sql import Window

        w = Window.partitionBy(*[lower_value(p, resolve) for p in node.partition_by])
        if node.order_by:
            w = w.orderBy(*[lower_value(k, resolve) for k in node.order_by])
        if node.frame_kind:
            lo = Window.unboundedPreceding if node.start is None else node.start
            hi = Window.unboundedFollowing if node.end is None else node.end
            w = w.rowsBetween(lo, hi) if node.frame_kind == "rows" else w.rangeBetween(lo, hi)
        return lower_value(node.func, resolve).over(w)
    if isinstance(node, PyUDF):
        cols = [lower_value(a, resolve) for a in node.args]
        spark_t = to_spark_ddl(node.dtype)
        if node.kind == "pandas":
            fn = F.pandas_udf(node.fn, spark_t)
        else:
            fn = F.udf(node.fn, spark_t)
        return fn(*cols)
    if isinstance(node, Func):
        args = [lower_value(a, resolve) if _is_vnode(a) or isinstance(a, Deferred) else a
                for a in node.args]
        kwargs = dict(node.options)
        entry = _FUNC_ALIASES.get(node.name, node.name)
        if callable(entry):
            return entry(*args, **kwargs)
        if entry in _COL_METHODS:
            recv, *rest = args
            return getattr(recv, entry)(*rest, **kwargs)
        fn = getattr(F, entry, None)
        if fn is None:
            # engine-native fallback, mirrors udf.scalar.builtin
            return F.call_function(entry, *[a if isinstance(a, Column) else F.lit(a) for a in args])
        return fn(*args, **kwargs)
    raise TypeError(f"cannot lower {type(node).__name__}")


def subst_anon(node: Any, col: str) -> Any:
    """Rebuild a VNode tree substituting the anonymous `_` placeholder
    with Col(col). A bare `_` (Deferred with node=None) unwraps to None,
    so the placeholder shows up as None in operand positions; we replace
    it ONLY there — legitimately-optional fields (Case.default,
    SortKey.nulls_first, frame bounds) keep their None. Used by
    selectors.across / if_any / if_all templates like ``_ * 2``."""
    _c = Col(col)

    def go(v):
        if v is None:
            return _c
        return subst_anon(v, col)

    if node is None:
        return _c
    if isinstance(node, Deferred):
        return go(node.node)
    if isinstance(node, BinOp):
        return BinOp(node.op, go(node.left), go(node.right))
    if isinstance(node, UnOp):
        return UnOp(node.op, go(node.operand))
    if isinstance(node, Cast):
        return Cast(go(node.operand), node.dtype, node.try_)
    if isinstance(node, Func):
        args = tuple(
            go(a) if a is None or _is_vnode(a) or isinstance(a, Deferred) else a
            for a in node.args
        )
        return Func(node.name, args, node.options)
    if isinstance(node, Case):
        branches = tuple((go(w), go(t)) for w, t in node.branches)
        default = None if node.default is None else go(node.default)
        return Case(branches, default)
    if isinstance(node, SortKey):
        return SortKey(go(node.expr), node.ascending, node.nulls_first)
    if isinstance(node, WindowExpr):
        return WindowExpr(
            go(node.func),
            tuple(go(p) for p in node.partition_by),
            tuple(go(o) for o in node.order_by),
            node.frame_kind,
            node.start,
            node.end,
        )
    return node


def bind_params(node: Any, params: dict) -> Any:
    """Substitute Param nodes with literals (the reference's bind_params
    pass, expr/api.py:893). Unknown params fall back to their default."""
    if isinstance(node, Deferred):
        node = node.node
    if not _is_vnode(node):
        return node
    if isinstance(node, Param):
        if node.name in params:
            return Lit(params[node.name], node.dtype)
        if node.default is not None:
            return Lit(node.default, node.dtype)
        return node
    # generic dataclass rebuild
    from dataclasses import fields, replace

    changes = {}
    for f_ in fields(node):
        v = getattr(node, f_.name)
        if _is_vnode(v):
            nv = bind_params(v, params)
            if nv is not v:
                changes[f_.name] = nv
        elif isinstance(v, tuple):
            nv = tuple(
                bind_params(x, params) if _is_vnode(x)
                else tuple(bind_params(y, params) if _is_vnode(y) else y for y in x)
                if isinstance(x, tuple) else x
                for x in v
            )
            if nv != v:
                changes[f_.name] = nv
    return replace(node, **changes) if changes else node


# --------------------------------------------------------------------------
# Deferred builder (`_`)
# --------------------------------------------------------------------------
_LITERAL_TYPES = (
    int, float, str, bool, bytes, _dt.date, _dt.datetime, _dt.timedelta,
    _decimal.Decimal, type(None),
)


def unwrap(x):
    """Deferred -> VNode; python literal -> Lit; VNode passes through."""
    if isinstance(x, Deferred):
        return x.node
    if _is_vnode(x):
        return x
    if isinstance(x, _LITERAL_TYPES):
        return Lit(x)
    if isinstance(x, (list, tuple)):
        return Func("array", tuple(unwrap(v) for v in x))
    raise TypeError(f"cannot use {type(x).__name__} in a deferred expression")


class Deferred:
    """Fluent wrapper over a VNode; `_` is `Deferred(root)` whose
    attribute access produces column references: `_.a + 1`, `_.a.sum()`,
    `_.ts.cast("date")` — mirroring the reference's `_` API."""

    __slots__ = ("node", "_name")

    def __init__(self, node: Optional[VNode] = None, name: Optional[str] = None):
        object.__setattr__(self, "node", node)
        object.__setattr__(self, "_name", name)

    # --- naming -----------------------------------------------------------
    def alias(self, name: str) -> "Deferred":
        return Deferred(self.node, name)

    name = alias

    def get_name(self) -> Optional[str]:
        if self._name:
            return self._name
        if isinstance(self.node, Col):
            return self.node.name
        return None

    # --- attribute access builds Col refs or method-call functions --------
    def __getattr__(self, item: str):
        if item.startswith("__") and item.endswith("__"):
            raise AttributeError(item)
        if self.node is None:
            return Deferred(Col(item))
        # method call: _.a.sum() -> Func("sum", (Col(a),)). Only Deferred/
        # VNode args are unwrapped; plain python values (strings, ints,
        # floats) pass through untouched so pyspark's own call semantics
        # apply — a string is a column name or a str-typed argument
        # (pattern, format, group index) exactly as in pyspark.sql.functions;
        # wrap with xo.literal() to force a literal column.
        def call(*args, **kwargs):
            return Deferred(
                Func(
                    item,
                    (unwrap(self),)
                    + tuple(
                        unwrap(a) if isinstance(a, (Deferred, VNode)) else a
                        for a in args
                    ),
                    tuple(sorted(kwargs.items())),
                )
            )

        return call

    def __getitem__(self, item):
        if isinstance(item, slice):
            start = 0 if item.start is None else item.start
            length = None if item.stop is None else item.stop - start
            return Deferred(Func("substring", (unwrap(self), start + 1, length)))
        return Deferred(Func("element_at", (unwrap(self), unwrap(item))))

    # --- operators ---------------------------------------------------------
    def _bin(self, op, other, flip=False):
        l, r = unwrap(self), unwrap(other)
        if flip:
            l, r = r, l
        return Deferred(BinOp(op, l, r))

    def __add__(self, o): return self._bin("+", o)
    def __radd__(self, o): return self._bin("+", o, True)
    def __sub__(self, o): return self._bin("-", o)
    def __rsub__(self, o): return self._bin("-", o, True)
    def __mul__(self, o): return self._bin("*", o)
    def __rmul__(self, o): return self._bin("*", o, True)
    def __truediv__(self, o): return self._bin("/", o)
    def __rtruediv__(self, o): return self._bin("/", o, True)
    def __floordiv__(self, o): return self._bin("//", o)
    def __mod__(self, o): return self._bin("%", o)
    def __pow__(self, o): return self._bin("**", o)
    def __eq__(self, o): return self._bin("==", o)  # type: ignore[override]
    def __ne__(self, o): return self._bin("!=", o)  # type: ignore[override]
    def __lt__(self, o): return self._bin("<", o)
    def __le__(self, o): return self._bin("<=", o)
    def __gt__(self, o): return self._bin(">", o)
    def __ge__(self, o): return self._bin(">=", o)
    def __and__(self, o): return self._bin("&", o)
    def __rand__(self, o): return self._bin("&", o, True)
    def __or__(self, o): return self._bin("|", o)
    def __ror__(self, o): return self._bin("|", o, True)
    def __xor__(self, o): return self._bin("^", o)
    def __neg__(self): return Deferred(UnOp("-", unwrap(self)))
    def __invert__(self): return Deferred(UnOp("~", unwrap(self)))
    def __hash__(self):  # needed because __eq__ is overloaded
        return hash(self.node)

    # --- common verbs (explicit, where the generic method call is wrong) ---
    def cast(self, dtype: str) -> "Deferred":
        return Deferred(Cast(unwrap(self), dtype))

    def try_cast(self, dtype: str) -> "Deferred":
        return Deferred(Cast(unwrap(self), dtype, try_=True))

    def isnull(self) -> "Deferred":
        return Deferred(Func("isnull", (unwrap(self),)))

    def notnull(self) -> "Deferred":
        return Deferred(UnOp("~", Func("isnull", (unwrap(self),))))

    def isin(self, values) -> "Deferred":
        vals = list(values)
        return Deferred(Func("isin", (unwrap(self), *vals)))

    def between(self, lo, hi) -> "Deferred":
        return Deferred(Func("between", (unwrap(self), unwrap(lo), unwrap(hi))))

    def ifelse(self, true_val, false_val) -> "Deferred":
        return Deferred(
            Case(((unwrap(self), unwrap(true_val)),), unwrap(false_val))
        )

    def case(self) -> "CaseBuilder":
        return CaseBuilder(base=unwrap(self))

    def asc(self, nulls_first: Optional[bool] = None) -> "Deferred":
        return Deferred(SortKey(unwrap(self), True, nulls_first))

    def desc(self, nulls_first: Optional[bool] = None) -> "Deferred":
        return Deferred(SortKey(unwrap(self), False, nulls_first))

    def over(
        self,
        group_by=(),
        order_by=(),
        rows: Optional[tuple] = None,
        range: Optional[tuple] = None,
    ) -> "Deferred":
        gb = tuple(unwrap(g) for g in _tupled(group_by))
        ob = tuple(_as_sortkey(k) for k in _tupled(order_by))
        kind = start = end = None
        if rows is not None:
            kind, (start, end) = "rows", rows
        elif range is not None:
            kind, (start, end) = "range", range
        return Deferred(WindowExpr(unwrap(self), gb, ob, kind, start, end))

    def __repr__(self):
        return f"<deferred {self.node!r}>" if self.node is not None else "_"


# functions whose string args are data, not column refs
_STRING_ARG_FNS = {
    "like", "ilike", "rlike", "contains", "startswith", "endswith",
    "regexp_extract", "regexp_replace", "split", "date_format", "date_trunc",
    "to_timestamp", "to_date", "lpad", "rpad", "format_string", "concat_ws",
    "substring_index", "translate", "conv", "sha2", "from_unixtime",
    "parse_url", "get_json_object",
}


def _tupled(x):
    if x is None:
        return ()
    if isinstance(x, (list, tuple)):
        return tuple(x)
    return (x,)


def _as_sortkey(k) -> SortKey:
    if isinstance(k, Deferred):
        k = k.node
    if isinstance(k, SortKey):
        return k
    if isinstance(k, str):
        return SortKey(Col(k))
    if _is_vnode(k):
        return SortKey(k)
    raise TypeError(f"bad sort key: {k!r}")


class CaseBuilder:
    """`_.x.case().when(a, b).else_(c).end()` and the free-standing
    `case().when(cond, val)` form."""

    def __init__(self, base: Optional[VNode] = None, branches=(), default=None):
        self.base, self.branches, self.default = base, tuple(branches), default

    def when(self, cond, val) -> "CaseBuilder":
        c = unwrap(cond)
        if self.base is not None:
            c = BinOp("==", self.base, c)
        return CaseBuilder(self.base, self.branches + ((c, unwrap(val)),), self.default)

    def else_(self, val) -> "CaseBuilder":
        return CaseBuilder(self.base, self.branches, unwrap(val))

    def end(self) -> Deferred:
        return Deferred(Case(self.branches, self.default))


_ = Deferred()
