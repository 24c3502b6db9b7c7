"""Expr -> Spark SQL string compilation (SQL-out).

Reference parity: `xorq.to_sql` (expr/api.py:201) compiles an ibis expr
to the backend dialect via sqlglot, stripping tag/tee nodes first. Here
the IR compiles to the Spark SQL dialect by direct emission — the node
vocabulary is small and owned by this repo, and every construct is
round-trip tested (`spark.sql(to_sql(e))` must equal `e.execute()`,
tests/test_sql_compile.py), so the text emitter cannot drift from the
DataFrame lowering without a test failing.

Coverage: the SQL-expressible relational core (reads, project/mutate,
filter, aggregate incl. cube/rollup, sort, limit/offset, distinct
[subset], all join kinds with USING/ON/theta predicates, set ops,
sample, unnest, unpivot, SQL views, fill/drop-null with explicit
columns) and the full scalar/aggregate/window value vocabulary.
Non-SQL nodes raise NotImplementedError: Python UDFs (PyUDF, AggPandas,
MapBatches, WindowUDF), dynamic Pivot (SQL PIVOT needs a static IN
list), positional/asof joins (compositions, not single SQL operators),
and schema-dependent "*" fill/drop-null (emission is schema-free).
Cache and tag nodes are transparent, like the reference's
_remove_tag_nodes/_remove_tee_nodes pass.

Executing the output: reads compile to direct-path scans
(``parquet.`/path/file` ``), so the text runs on a bare session;
memtables and unbound tables compile to view names the runner must
register first.
"""

from __future__ import annotations

import datetime as _dt
from decimal import Decimal
from typing import Any, Callable, Optional

from xorq_spark.expr import nodes as N
from xorq_spark.expr.datatypes import to_spark_ddl
from xorq_spark.expr.deferred import (
    BinOp,
    Case,
    Cast,
    Col,
    Deferred,
    Func,
    Lit,
    Param,
    PyUDF,
    SortKey,
    UnOp,
    VNode,
    WindowExpr,
)


class SqlCompileError(NotImplementedError):
    """Raised for IR nodes with no faithful SQL rendering."""


# --------------------------------------------------------------------------
# value emission
# --------------------------------------------------------------------------
def _q(name: str) -> str:
    """Backtick-quote an identifier."""
    return "`" + name.replace("`", "``") + "`"


def _str_lit(s: str) -> str:
    return "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"


def lit_sql(v: Any) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "TRUE" if v else "FALSE"
    if isinstance(v, float):
        # the D suffix keeps the literal DOUBLE — a bare 2.5 parses as
        # DECIMAL(2,1) in Spark SQL, which would diverge from F.lit(2.5)
        # (found by the hypothesis round-trip property)
        return f"{v!r}D"
    if isinstance(v, int):
        return repr(v)
    if isinstance(v, Decimal):
        return str(v)
    if isinstance(v, str):
        return _str_lit(v)
    if isinstance(v, _dt.datetime):
        return f"TIMESTAMP '{v.isoformat(sep=' ')}'"
    if isinstance(v, _dt.date):
        return f"DATE '{v.isoformat()}'"
    if isinstance(v, bytes):
        return "X'" + v.hex() + "'"
    if isinstance(v, (list, tuple)):
        return "array(" + ", ".join(lit_sql(x) for x in v) + ")"
    if isinstance(v, dict):
        items = []
        for k, val in v.items():
            items += [lit_sql(k), lit_sql(val)]
        return "map(" + ", ".join(items) + ")"
    raise SqlCompileError(f"cannot render literal {type(v).__name__}")


_BINOP_SQL = {
    "+": "+", "-": "-", "*": "*", "/": "/", "%": "%",
    "==": "=", "!=": "!=", "<": "<", "<=": "<=", ">": ">", ">=": ">=",
    "&": "AND", "|": "OR", "^": "^",
}

# SQL templates for the lowering catalog's callable aliases
# (expr/deferred.py _FUNC_ALIASES) — the one place emission re-states
# semantics instead of pass-through; each is round-trip tested.
_MAXLEN = 2**31 - 1


def _tpl(fmt: str) -> Callable[..., str]:
    return lambda *a: fmt.format(*a)


_FUNC_SQL: dict[str, Any] = {
    # pass-through renames (string targets in _FUNC_ALIASES)
    "strip": "trim", "lstrip": "ltrim", "rstrip": "rtrim",
    "capitalize": "initcap", "join_": "concat_ws",
    "day_of_year": "dayofyear", "week_of_year": "weekofyear",
    "day_of_month": "dayofmonth", "sign": "signum",
    "mean": "avg", "std": "stddev_samp", "var": "var_samp",
    "strftime": "date_format", "re_extract": "regexp_extract",
    "re_replace": "regexp_replace", "collect": "collect_list",
    "arbitrary": "any_value", "argmax": "max_by", "argmin": "min_by",
    "quantile": "percentile", "approx_quantile": "percentile_approx",
    "day_of_week_index": "dayofweek", "epoch_seconds": "unix_timestamp",
    # callable aliases -> explicit SQL
    "re_split": _tpl("split({0}, {1})"),
    "find": lambda c, sub, start=None: (
        f"(locate({sub}, {c}, {start} + 1) - 1)"
        if start is not None
        else f"(locate({sub}, {c}) - 1)"
    ),
    "substr": lambda c, start, length=None: (
        f"substring({c}, {start} + 1, {_MAXLEN if length is None else length})"
    ),
    "left": _tpl("substring({0}, 1, {1})"),
    "truncate": lambda c, unit: (
        f"date_trunc({_str_lit(_TRUNC_UNITS.get(_unquote(unit), _unquote(unit)))}, {c})"
    ),
    "day_of_week_name": _tpl("date_format({0}, 'EEEE')"),
    "log_base": lambda c, base: f"log({base}, {c})",
    "clip": lambda c, lower=None, upper=None: _clip_sql(c, lower, upper),
    "floordiv": _tpl("floor({0} / {1})"),
    "approx_median": _tpl("percentile_approx({0}, 0.5)"),
    "nullif": _tpl("nullif({0}, {1})"),
    "re_search": _tpl("({0} RLIKE {1})"),
    "replace": _tpl("replace({0}, {1}, {2})"),
    "group_concat": lambda c, sep="','": f"array_join(collect_list({c}), {sep})",
    "log2": _tpl("log2({0})"),
    "ln": _tpl("ln({0})"),
    "negate": _tpl("(- {0})"),
    "invert": _tpl("(NOT {0})"),
    "fill_null": _tpl("coalesce({0}, {1})"),
    "identical_to": _tpl("({0} <=> {1})"),
    "greatest": lambda *cs: "greatest(" + ", ".join(cs) + ")",
    "least": lambda *cs: "least(" + ", ".join(cs) + ")",
}

_TRUNC_UNITS = {
    "Y": "year", "Q": "quarter", "M": "month", "W": "week", "D": "day",
    "h": "hour", "m": "minute", "s": "second",
}

# Column-method Funcs (receiver-first) -> SQL forms
_COL_METHOD_SQL = {
    "isin": lambda recv, *vals: f"({recv} IN (" + ", ".join(vals) + "))",
    "like": _tpl("({0} LIKE {1})"),
    "ilike": _tpl("({0} ILIKE {1})"),
    "rlike": _tpl("({0} RLIKE {1})"),
    "contains": _tpl("contains({0}, {1})"),
    "startswith": _tpl("startswith({0}, {1})"),
    "endswith": _tpl("endswith({0}, {1})"),
    "between": _tpl("({0} BETWEEN {1} AND {2})"),
    "getItem": _tpl("{0}[{1}]"),
    "getField": lambda recv, f: f"{recv}.{_q(_unquote(f))}",
    "substr": _tpl("substring({0}, {1}, {2})"),
    "bitwiseAND": _tpl("({0} & {1})"),
    "bitwiseOR": _tpl("({0} | {1})"),
    "bitwiseXOR": _tpl("({0} ^ {1})"),
}


def _unquote(rendered: str) -> str:
    """Recover a plain python string from a rendered literal (alias
    templates receive already-rendered args)."""
    if rendered.startswith("'") and rendered.endswith("'"):
        return rendered[1:-1].replace("\\'", "'").replace("\\\\", "\\")
    return rendered


def _clip_sql(c: str, lower, upper) -> str:
    out = c
    if lower is not None:
        out = f"greatest({out}, {lower})"
    if upper is not None:
        out = f"least({out}, {upper})"
    return out


def value_sql(node: Any) -> str:
    """VNode (or plain literal) -> Spark SQL expression text."""
    if isinstance(node, Deferred):
        node = node.node
    if not isinstance(node, VNode):
        return lit_sql(node)
    if isinstance(node, Col):
        return _q(node.name)
    if isinstance(node, Lit):
        base = lit_sql(node.value)
        if node.dtype:
            return f"CAST({base} AS {to_spark_ddl(node.dtype)})"
        return base
    if isinstance(node, Param):
        raise SqlCompileError(
            f"unbound parameter {node.name!r}: to_sql binds defaults; pass params for the rest"
        )
    if isinstance(node, BinOp):
        op = _BINOP_SQL.get(node.op)
        l, r = value_sql(node.left), value_sql(node.right)
        if op is not None:
            return f"({l} {op} {r})"
        if node.op == "//":
            return f"floor({l} / {r})"
        if node.op == "**":
            return f"power({l}, {r})"
        if node.op == "eq_null_safe":
            return f"({l} <=> {r})"
        raise SqlCompileError(f"binary op {node.op!r}")
    if isinstance(node, UnOp):
        x = value_sql(node.operand)
        return {"-": f"(- {x})", "~": f"(NOT {x})", "abs": f"abs({x})"}[node.op]
    if isinstance(node, Cast):
        t = to_spark_ddl(node.dtype)
        fn = "TRY_CAST" if node.try_ else "CAST"
        return f"{fn}({value_sql(node.operand)} AS {t})"
    if isinstance(node, Case):
        parts = ["CASE"]
        for cond, val in node.branches:
            parts.append(f"WHEN {value_sql(cond)} THEN {value_sql(val)}")
        if node.default is not None:
            parts.append(f"ELSE {value_sql(node.default)}")
        parts.append("END")
        return " ".join(parts)
    if isinstance(node, SortKey):
        s = value_sql(node.expr) + (" ASC" if node.ascending else " DESC")
        if node.nulls_first is True:
            s += " NULLS FIRST"
        elif node.nulls_first is False:
            s += " NULLS LAST"
        return s
    if isinstance(node, WindowExpr):
        over = []
        if node.partition_by:
            over.append(
                "PARTITION BY " + ", ".join(value_sql(p) for p in node.partition_by)
            )
        if node.order_by:
            over.append("ORDER BY " + ", ".join(value_sql(k) for k in node.order_by))
        if node.frame_kind:
            kind = "ROWS" if node.frame_kind == "rows" else "RANGE"

            def bound(v, default):
                if v is None:
                    return default
                if v == 0:
                    return "CURRENT ROW"
                return f"{-v} PRECEDING" if v < 0 else f"{v} FOLLOWING"

            over.append(
                f"{kind} BETWEEN {bound(node.start, 'UNBOUNDED PRECEDING')} "
                f"AND {bound(node.end, 'UNBOUNDED FOLLOWING')}"
            )
        return f"{value_sql(node.func)} OVER ({' '.join(over)})"
    if isinstance(node, PyUDF):
        raise SqlCompileError(f"python UDF {node.fn_name!r} has no SQL form")
    if isinstance(node, Func):
        if node.options:
            raise SqlCompileError(f"function options on {node.name!r}")
        args = [value_sql(a) for a in node.args]
        # resolution order mirrors lower_value: alias catalog first
        # (callable or rename), then column-method forms, then a plain
        # name(args) call (Spark SQL function names match F.* names)
        entry = _FUNC_SQL.get(node.name, node.name)
        if callable(entry):
            return entry(*args)
        method = _COL_METHOD_SQL.get(entry)
        if method is not None:
            return method(*args)
        return f"{entry}(" + ", ".join(args) + ")"
    raise SqlCompileError(f"cannot compile {type(node).__name__}")


# --------------------------------------------------------------------------
# static schema propagation (names only)
# --------------------------------------------------------------------------
def _ddl_names(ddl: Optional[str]) -> Optional[list]:
    """Column names from a DDL string, honoring nested <...> commas."""
    if not ddl:
        return None
    names, depth, start = [], 0, 0
    for i, ch in enumerate(ddl + ","):
        if ch == "<":
            depth += 1
        elif ch == ">":
            depth -= 1
        elif ch == "," and depth == 0:
            part = ddl[start:i].strip()
            if part:
                names.append(part.split()[0].split(":")[0].strip("`"))
            start = i + 1
    return names or None


def static_columns(node: N.RNode) -> Optional[list]:
    """Output column names when statically derivable from the IR alone
    (no session); None when a scan without a declared schema or an
    opaque construct blocks it. Mirrors the lowering's column order."""
    if isinstance(node, (N.CachedNode, N.CacheTag, N.Tag)):
        return static_columns(node.parent)
    if isinstance(node, (N.ReadParquet, N.ReadCSV, N.ReadJSON, N.ReadORC)):
        return _ddl_names(node.schema)
    if isinstance(node, (N.Memtable, N.UnboundTable)):
        return _ddl_names(node.schema)
    if isinstance(node, N.Project):
        new = [name for name, _v in node.exprs]
        if not node.extend:
            return new
        parent = static_columns(node.parent)
        if parent is None:
            return None
        # withColumns: replaced names stay in place, new ones append
        return parent + [n for n in new if n not in parent]
    if isinstance(node, (N.Filter, N.Sort, N.Limit, N.Distinct, N.Sample,
                         N.FillNull, N.DropNull)):
        return static_columns(node.parent)
    if isinstance(node, N.Aggregate):
        return [n for n, _v in node.keys] + [n for n, _v in node.metrics]
    if isinstance(node, N.GroupingSetsAgg):
        return list(node.keys) + [n for n, _v in node.metrics]
    if isinstance(node, N.Drop):
        parent = static_columns(node.parent)
        return None if parent is None else [c for c in parent if c not in node.columns]
    if isinstance(node, N.Rename):
        parent = static_columns(node.parent)
        m = dict(node.mapping)
        return None if parent is None else [m.get(c, c) for c in parent]
    if isinstance(node, N.SetOp):
        return static_columns(node.left)
    if isinstance(node, N.Unnest):
        parent = static_columns(node.parent)
        if parent is None:
            return None
        others = [c for c in parent if c != node.column]
        extra = [f"{node.column}_offset"] if node.offset else []
        return others + extra + [node.column]
    return None


# --------------------------------------------------------------------------
# relation emission
# --------------------------------------------------------------------------
def _named(exprs, star_first: bool = False) -> str:
    cols = [f"{value_sql(v)} AS {_q(name)}" for name, v in exprs]
    if star_first:
        cols = ["*"] + cols
    return ", ".join(cols) if cols else "*"


def rel_sql(node: N.RNode, depth: int = 0) -> str:
    """RNode -> a SQL query string (always a complete SELECT)."""
    a = f"t{depth}"  # alias for the nested parent

    def sub(n, d=None):
        return "(" + rel_sql(n, depth + 1 if d is None else d) + f") AS {_q(a)}"

    if isinstance(node, (N.CachedNode, N.CacheTag, N.Tag)):
        # transparent, like the reference's tag/tee strip in to_sql
        return rel_sql(node.parent, depth)
    if isinstance(node, N.ReadParquet):
        scans = [f"SELECT * FROM parquet.{_q(p)}" for p in node.paths]
        return " UNION ALL ".join(scans)
    if isinstance(node, N.ReadORC):
        scans = [f"SELECT * FROM orc.{_q(p)}" for p in node.paths]
        return " UNION ALL ".join(scans)
    if isinstance(node, (N.ReadCSV, N.ReadJSON)):
        if node.table_name:
            return f"SELECT * FROM {_q(node.table_name)}"
        raise SqlCompileError(
            "CSV/JSON direct-path SQL scans cannot carry reader options; "
            "give the read a table_name and register it"
        )
    if isinstance(node, N.ReadDelta):
        return f"SELECT * FROM delta.{_q(node.path)}"
    if isinstance(node, N.Memtable):
        name = node.name or f"memtable_{node.token[:12]}"
        return f"SELECT * FROM {_q(name)}"
    if isinstance(node, (N.TableRef, N.UnboundTable)):
        return f"SELECT * FROM {_q(node.name)}"
    if isinstance(node, N.Project):
        if node.extend:
            parent_cols = static_columns(node.parent)
            new = dict(node.exprs)
            if parent_cols is not None:
                # withColumns semantics: replaced columns keep their
                # position, genuinely-new ones append (a star emission
                # would duplicate a re-mutated name — hypothesis-found)
                items = [
                    f"{value_sql(new.pop(c))} AS {_q(c)}" if c in new else _q(c)
                    for c in parent_cols
                ]
                items += [f"{value_sql(v)} AS {_q(n)}" for n, v in node.exprs if n in new]
                return f"SELECT {', '.join(items)} FROM {sub(node.parent)}"
        return f"SELECT {_named(node.exprs, star_first=node.extend)} FROM {sub(node.parent)}"
    if isinstance(node, N.Filter):
        preds = " AND ".join(f"({value_sql(p)})" for p in node.predicates)
        return f"SELECT * FROM {sub(node.parent)} WHERE {preds}"
    if isinstance(node, N.Aggregate):
        keys = [f"{value_sql(v)} AS {_q(name)}" for name, v in node.keys]
        metrics = [f"{value_sql(v)} AS {_q(name)}" for name, v in node.metrics]
        sel = ", ".join(keys + metrics)
        gb = (
            " GROUP BY " + ", ".join(str(i + 1) for i in range(len(keys)))
            if keys
            else ""
        )
        return f"SELECT {sel} FROM {sub(node.parent)}{gb}"
    if isinstance(node, N.GroupingSetsAgg):
        keys = ", ".join(_q(k) for k in node.keys)
        metrics = ", ".join(
            f"{value_sql(v)} AS {_q(name)}" for name, v in node.metrics
        )
        fn = "CUBE" if node.mode == "cube" else "ROLLUP"
        return (
            f"SELECT {keys}, {metrics} FROM {sub(node.parent)} "
            f"GROUP BY {fn} ({keys})"
        )
    if isinstance(node, N.Sort):
        keys = ", ".join(value_sql(k) for k in node.keys)
        return f"SELECT * FROM {sub(node.parent)} ORDER BY {keys}"
    if isinstance(node, N.Limit):
        q = f"SELECT * FROM {sub(node.parent)}"
        if node.n is not None:
            q += f" LIMIT {node.n}"
        if node.offset:
            q += f" OFFSET {node.offset}"
        return q
    if isinstance(node, N.Distinct):
        if node.subset is None:
            return f"SELECT DISTINCT * FROM {sub(node.parent)}"
        part = ", ".join(_q(c) for c in node.subset)
        # dropDuplicates keeps an arbitrary row per key; ROW_NUMBER over
        # an arbitrary order is the SQL spelling of the same contract
        return (
            f"SELECT * EXCEPT (`__rn`) FROM (SELECT *, ROW_NUMBER() OVER "
            f"(PARTITION BY {part} ORDER BY 1) AS `__rn` FROM {sub(node.parent)}) "
            f"WHERE `__rn` = 1"
        )
    if isinstance(node, N.Join):
        return _join_sql(node, depth)
    if isinstance(node, N.SetOp):
        l = rel_sql(node.left, depth + 1)
        r = rel_sql(node.right, depth + 1)
        kw = {"union": "UNION", "intersect": "INTERSECT", "difference": "EXCEPT"}[
            node.kind
        ]
        mode = " DISTINCT" if node.distinct else " ALL"
        return f"({l}) {kw}{mode} ({r})"
    if isinstance(node, N.Sample):
        seed = f" REPEATABLE ({node.seed})" if node.seed is not None else ""
        return (
            f"SELECT * FROM {sub(node.parent)} "
            f"TABLESAMPLE ({node.fraction * 100!r} PERCENT){seed}"
        )
    if isinstance(node, N.FillNull):
        if any(c == "*" for c, _ in node.replacements):
            raise SqlCompileError("fill_null('*') needs the schema; name the columns")
        repl = ", ".join(
            f"coalesce({_q(c)}, {lit_sql(v)}) AS {_q(c)}" for c, v in node.replacements
        )
        cols = ", ".join(_q(c) for c, _ in node.replacements)
        return (
            f"SELECT * EXCEPT ({cols}), {repl} FROM {sub(node.parent)}"
        )
    if isinstance(node, N.DropNull):
        if node.subset is None:
            raise SqlCompileError("drop_null() without subset needs the schema")
        op = " AND " if node.how == "any" else " OR "
        cond = op.join(f"{_q(c)} IS NOT NULL" for c in node.subset)
        return f"SELECT * FROM {sub(node.parent)} WHERE {cond}"
    if isinstance(node, N.Unnest):
        c = _q(node.column)
        view = "LATERAL VIEW OUTER" if node.keep_empty else "LATERAL VIEW"
        if node.offset:
            return (
                f"SELECT * EXCEPT ({c}, `__pos`, `__val`), `__pos` AS "
                f"{_q(node.column + '_offset')}, `__val` AS {c} "
                f"FROM {sub(node.parent)} {view} POSEXPLODE({_q(a)}.{c}) `__lv` AS `__pos`, `__val`"
            )
        return (
            f"SELECT * EXCEPT ({c}, `__val`), `__val` AS {c} "
            f"FROM {sub(node.parent)} {view} EXPLODE({_q(a)}.{c}) `__lv` AS `__val`"
        )
    if isinstance(node, N.Drop):
        cols = ", ".join(_q(c) for c in node.columns)
        return f"SELECT * EXCEPT ({cols}) FROM {sub(node.parent)}"
    if isinstance(node, N.Rename):
        # SELECT * EXCEPT (olds), old AS new keeps order stable enough;
        # emit explicit aliases for renamed, star-except for the rest
        olds = ", ".join(_q(o) for o, _ in node.mapping)
        ren = ", ".join(f"{_q(o)} AS {_q(n)}" for o, n in node.mapping)
        return f"SELECT * EXCEPT ({olds}), {ren} FROM {sub(node.parent)}"
    if isinstance(node, N.SQLView):
        return f"WITH {_q(node.alias)} AS ({rel_sql(node.parent, depth + 1)}) {node.sql}"
    if isinstance(node, N.Unpivot):
        vals = ", ".join(_q(v) for v in node.values)
        return (
            f"SELECT * FROM {sub(node.parent)} UNPIVOT "
            f"({_q(node.val_name)} FOR {_q(node.var_name)} IN ({vals}))"
        )
    raise SqlCompileError(f"no SQL form for {type(node).__name__}")


def _join_sql(node: N.Join, depth: int) -> str:
    if node.how in ("positional", "asof"):
        raise SqlCompileError(
            f"{node.how} join compiles to a multi-operator plan, not one SQL join"
        )
    l = rel_sql(node.left, depth + 1)
    r = rel_sql(node.right, depth + 1)
    la, ra = f"jl{depth}", f"jr{depth}"
    kw = {
        "inner": "JOIN",
        "left": "LEFT JOIN",
        "right": "RIGHT JOIN",
        "outer": "FULL JOIN",
        "semi": "LEFT SEMI JOIN",
        "anti": "LEFT ANTI JOIN",
        "cross": "CROSS JOIN",
        "any_inner": "LEFT SEMI JOIN",
        "any_left": "LEFT JOIN",
    }.get(node.how)
    if kw is None:
        raise SqlCompileError(f"join kind {node.how!r}")
    base = f"SELECT * FROM ({l}) AS {_q(la)} {kw} ({r}) AS {_q(ra)}"
    if node.how == "cross":
        return base
    if node.predicates and all(isinstance(p, str) for p in node.predicates):
        using = ", ".join(_q(p) for p in node.predicates)
        return f"{base} USING ({using})"
    conds = []
    for p in node.predicates:
        if isinstance(p, str):
            conds.append(f"{_q(la)}.{_q(p)} = {_q(ra)}.{_q(p)}")
        elif isinstance(p, tuple) and len(p) == 2 and all(isinstance(x, str) for x in p):
            conds.append(f"{_q(la)}.{_q(p[0])} = {_q(ra)}.{_q(p[1])}")
        else:
            v = p.node if isinstance(p, Deferred) else p
            conds.append(f"({value_sql(v)})")
    on = " AND ".join(conds) if conds else "TRUE"
    return f"{base} ON {on}"


def to_sql(expr, params: Optional[dict] = None) -> str:
    """Compile an Expr to Spark SQL text (reference: to_sql,
    expr/api.py:201). Param defaults are bound exactly as execute()
    binds them; remaining unbound params raise."""
    from xorq_spark.expr.core import Expr, _bind_tree_params

    node = expr.node if isinstance(expr, Expr) else expr
    node = _bind_tree_params(node, params or {})
    return rel_sql(node)
