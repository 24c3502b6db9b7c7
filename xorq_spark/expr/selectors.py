"""Column selectors: bulk column selection and across-style mutation.

Mirrors the reference's selectors API (xorq expr/selectors.py →
vendor/ibis/selectors.py): ``s.numeric()``, ``s.of_type``,
``s.startswith / endswith / contains / matches``, ``s.cols``,
``s.any_of / all_of``, ``s.where``, ``s.first / last / all / none``,
``s.index`` slicing, plus ``s.across`` for applying one function (or a
dict of functions) to every selected column and ``s.if_any / if_all``
for OR/AND-folded predicates.

Selectors expand against the expression's schema at call time, so they
compose with every Expr verb that accepts columns: ``t.select(
s.numeric())``, ``t.mutate(s.across(s.of_type("string"), _.upper()))``,
``t.filter(s.if_any(s.numeric(), _ > 100))``. Expansion is purely a
driver-side schema walk (one Catalyst analysis pass, no job), so the
resulting plan is identical to hand-listing the columns — nothing
changes at scale.
"""

from __future__ import annotations

import re
from typing import Callable, Union

from xorq_spark.expr.datatypes import to_spark_ddl
from xorq_spark.expr.deferred import Deferred, Col, unwrap


class ColumnProbe:
    """What a `where` predicate sees: the column's name and Spark DDL
    type string (reference predicates receive an ibis column; name/type
    are the attributes real-world predicates use)."""

    __slots__ = ("name", "type")

    def __init__(self, name: str, type_: str):
        self.name = name
        self.type = type_

    def get_name(self) -> str:
        return self.name


class Selector:
    """Base: a predicate over (position, name, type) rows of a schema."""

    def _match(self, i: int, n: int, name: str, typ: str) -> bool:
        raise NotImplementedError

    def expand_names(self, expr) -> list[str]:
        fields = [(f.name, f.dataType.simpleString()) for f in expr.schema().fields]
        n = len(fields)
        return [
            name
            for i, (name, typ) in enumerate(fields)
            if self._match(i, n, name, typ)
        ]

    def expand(self, expr) -> list[Deferred]:
        return [Deferred(Col(name)) for name in self.expand_names(expr)]

    def __and__(self, other: "Selector") -> "Selector":
        return _Combine(lambda *a: self._match(*a) and other._match(*a))

    def __or__(self, other: "Selector") -> "Selector":
        return _Combine(lambda *a: self._match(*a) or other._match(*a))

    def __invert__(self) -> "Selector":
        return _Combine(lambda *a: not self._match(*a))

    def __sub__(self, other: "Selector") -> "Selector":
        return _Combine(lambda *a: self._match(*a) and not other._match(*a))


class _Combine(Selector):
    def __init__(self, fn):
        self._fn = fn

    def _match(self, i, n, name, typ):
        return self._fn(i, n, name, typ)


def where(predicate: Callable[[ColumnProbe], bool]) -> Selector:
    """Columns for which ``predicate(probe)`` is truthy."""
    return _Combine(lambda i, n, name, typ: bool(predicate(ColumnProbe(name, typ))))


_NUMERIC = {
    "tinyint", "smallint", "int", "bigint", "float", "double",
}


def numeric() -> Selector:
    """All numeric columns (ints, floats, decimals)."""
    return _Combine(
        lambda i, n, name, typ: typ in _NUMERIC or typ.startswith("decimal")
    )


def of_type(dtype: str) -> Selector:
    """Columns of a dtype; accepts ibis-style ('int64', 'string') or
    Spark DDL ('bigint') names, plus the shorthands 'numeric',
    'temporal', 'array', 'map', 'struct', 'floating', 'integer'."""
    d = dtype.lower()
    if d == "numeric":
        return numeric()
    if d == "floating":
        return _Combine(lambda i, n, name, typ: typ in ("float", "double"))
    if d in ("integer", "int_"):
        return _Combine(
            lambda i, n, name, typ: typ in ("tinyint", "smallint", "int", "bigint")
        )
    if d == "temporal":
        return _Combine(
            lambda i, n, name, typ: typ == "date" or typ.startswith("timestamp")
        )
    if d in ("array", "map", "struct"):
        return _Combine(lambda i, n, name, typ: typ.startswith(d))
    ddl = to_spark_ddl(dtype)
    # 'timestamp' should match both tz-ful and ntz flavors
    if ddl.startswith("timestamp"):
        return _Combine(lambda i, n, name, typ: typ.startswith("timestamp"))
    return _Combine(lambda i, n, name, typ: typ == ddl)


def startswith(prefixes: Union[str, tuple]) -> Selector:
    p = tuple(prefixes) if isinstance(prefixes, (tuple, list)) else (prefixes,)
    return _Combine(lambda i, n, name, typ: name.startswith(p))


def endswith(suffixes: Union[str, tuple]) -> Selector:
    s = tuple(suffixes) if isinstance(suffixes, (tuple, list)) else (suffixes,)
    return _Combine(lambda i, n, name, typ: name.endswith(s))


def contains(needles: Union[str, tuple], how: str = "any") -> Selector:
    ns = tuple(needles) if isinstance(needles, (tuple, list)) else (needles,)
    agg = any if how == "any" else all
    return _Combine(lambda i, n, name, typ: agg(x in name for x in ns))


def matches(regex: Union[str, re.Pattern]) -> Selector:
    pat = re.compile(regex)
    return _Combine(lambda i, n, name, typ: pat.search(name) is not None)


def cols(*names: str) -> Selector:
    want = set(names)
    return _Combine(lambda i, n, name, typ: name in want)


def any_of(*selectors) -> Selector:
    sels = [_to_selector(s) for s in selectors]
    return _Combine(lambda *a: any(s._match(*a) for s in sels))


def all_of(*selectors) -> Selector:
    sels = [_to_selector(s) for s in selectors]
    return _Combine(lambda *a: all(s._match(*a) for s in sels))


def first() -> Selector:
    return _Combine(lambda i, n, name, typ: i == 0)


def last() -> Selector:
    return _Combine(lambda i, n, name, typ: i == n - 1)


def all() -> Selector:
    return _Combine(lambda i, n, name, typ: True)


def none() -> Selector:
    return _Combine(lambda i, n, name, typ: False)


class _Index:
    """``s.index["a":"f"]`` / ``s.index[2:5]`` — positional or
    name-bounded slices, and single positions/names."""

    def __getitem__(self, item) -> Selector:
        if isinstance(item, slice):
            return _SliceSelector(item)
        if isinstance(item, int):
            return _Combine(
                lambda i, n, name, typ: i == (item if item >= 0 else n + item)
            )
        return cols(item)


class _SliceSelector(Selector):
    def __init__(self, sl: slice):
        self._sl = sl

    def expand_names(self, expr) -> list[str]:
        names = [f.name for f in expr.schema().fields]
        sl = self._sl
        start, stop = sl.start, sl.stop
        if isinstance(start, str):
            start = names.index(start)
        if isinstance(stop, str):
            stop = names.index(stop) + 1  # inclusive name bound, like ibis
        return names[slice(start, stop, sl.step)]

    def _match(self, i, n, name, typ):  # pragma: no cover - not used
        raise NotImplementedError


index = _Index()


class Across:
    """``s.across(selector, func)``: apply `func` to every selected
    column; `func` is a Deferred template (built from ``_``), a
    callable column->Deferred, or a dict of name->either for multiple
    outputs per column. `names` is a format template ('{col}_{fn}')."""

    def __init__(self, selector: Selector, func, names: str | None = None):
        self.selector = _to_selector(selector)
        self.func = func
        self.names = names

    def expand(self, expr) -> dict[str, Deferred]:
        out: dict[str, Deferred] = {}
        funcs = (
            self.func if isinstance(self.func, dict) else {None: self.func}
        )
        for col in self.selector.expand_names(expr):
            for fn_name, fn in funcs.items():
                val = _apply_template(fn, col)
                if self.names is not None:
                    name = self.names.format(col=col, fn=fn_name or "")
                elif fn_name:
                    name = f"{col}_{fn_name}"
                else:
                    name = col
                out[name] = val
        return out


def across(selector, func, names: str | None = None) -> Across:
    return Across(selector, func, names)


class IfAnyAll:
    """OR/AND fold of a predicate template over selected columns."""

    def __init__(self, selector, predicate, any_: bool):
        self.selector = _to_selector(selector)
        self.predicate = predicate
        self.any_ = any_

    def expand(self, expr) -> Deferred:
        parts = [
            _apply_template(self.predicate, col)
            for col in self.selector.expand_names(expr)
        ]
        if not parts:
            from xorq_spark.expr.deferred import Lit

            return Deferred(Lit(not self.any_))
        out = parts[0]
        for p in parts[1:]:
            out = (out | p) if self.any_ else (out & p)
        return out


def if_any(selector, predicate) -> IfAnyAll:
    return IfAnyAll(selector, predicate, any_=True)


def if_all(selector, predicate) -> IfAnyAll:
    return IfAnyAll(selector, predicate, any_=False)


def _apply_template(fn, col: str) -> Deferred:
    """Substitute the anonymous `_` placeholder in a Deferred template
    (``_ * 2``, ``_.cast("double")``) with a concrete column reference,
    or call a plain callable (``lambda c: c.upper()``) with it."""
    from xorq_spark.expr.deferred import subst_anon

    if isinstance(fn, Deferred):
        return Deferred(subst_anon(fn.node, col))
    if callable(fn):
        out = fn(Deferred(Col(col)))
        return out if isinstance(out, Deferred) else Deferred(unwrap(out))
    raise TypeError(f"across/if_* func must be Deferred or callable, got {fn!r}")


def _to_selector(s) -> Selector:
    if isinstance(s, Selector):
        return s
    if isinstance(s, str):
        return cols(s)
    if isinstance(s, (list, tuple)):
        return cols(*s)
    raise TypeError(f"not a selector: {s!r}")
