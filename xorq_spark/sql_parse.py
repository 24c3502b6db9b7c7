"""SQL string -> Expr graph (SQL-in), completing the round trip with
sql_compile.py's Expr -> SQL (SQL-out).

Reference parity: `parse_sql` (reference vendor/ibis/expr/sql.py:385)
lifts a SQL SELECT into the expression IR via sqlglot so SQL-defined
relations participate in caching, builds, and lineage. No sqlglot ships
in this container, so this is a self-contained recursive-descent parser
for the practical SELECT subset (the same surface sql_compile emits):

    SELECT [DISTINCT] items
    FROM rel [alias] (JOIN rel [alias] (ON eq | USING (cols)))*
    [WHERE pred] [GROUP BY exprs] [HAVING pred]
    [ORDER BY keys [ASC|DESC] [NULLS FIRST|LAST]]
    [LIMIT n [OFFSET m]]

with expressions over literals, (qualified) identifiers, arithmetic,
comparisons, AND/OR/NOT, IN (...), BETWEEN, [NOT] LIKE, IS [NOT] NULL,
CASE WHEN, CAST(x AS type), and function calls (COUNT(*) / DISTINCT
aggregates included). Derived tables `(SELECT ...) alias` nest.

Unsupported constructs raise SqlParseError naming the token — never a
silent misparse. Table names resolve through the `catalog` mapping
(name -> Expr) and fall back to unbound TableRefs, like the reference's
catalog argument.

Determinism contract: the same SQL text always builds a structurally
identical Expr graph, so tokenize() hashes are stable — SQL-defined
relations cache exactly like API-built ones (round-trip pinned in
tests/test_sql_parse.py).
"""

from __future__ import annotations

import re
from typing import Any, Dict, List, Optional, Tuple

from xorq_spark.expr import nodes as N
from xorq_spark.expr.core import Expr
from xorq_spark.expr.deferred import (
    BinOp,
    Case,
    Cast,
    Col,
    Deferred,
    Func,
    Lit,
    SortKey,
    UnOp,
    VNode,
)


class SqlParseError(ValueError):
    """Raised for SQL this parser does not cover (named construct)."""


# ---------------------------------------------------------------------------
# lexer
# ---------------------------------------------------------------------------

_TOKEN_RE = re.compile(
    r"""
    (?P<ws>\s+)
  | (?P<string>'(?:[^']|'')*')
  | (?P<qident>"[^"]*"|`[^`]*`)
  | (?P<number>\d+\.\d*(?:[eE][+-]?\d+)?|\.\d+(?:[eE][+-]?\d+)?|\d+(?:[eE][+-]?\d+)?)
  | (?P<ident>[A-Za-z_][A-Za-z_0-9]*)
  | (?P<op><=|>=|<>|!=|\|\||[-+*/%(),.<>=])
    """,
    re.VERBOSE,
)

_AGG_FUNCS = {
    "sum", "count", "avg", "mean", "min", "max", "first", "last",
    "stddev", "stddev_samp", "stddev_pop", "variance", "var_samp",
    "var_pop", "corr", "covar_samp", "covar_pop", "collect_list",
    "collect_set", "any_value", "approx_count_distinct", "median",
    "mode", "bool_and", "bool_or", "bit_and", "bit_or", "bit_xor",
}


def _lex(sql: str) -> List[Tuple[str, str]]:
    toks: List[Tuple[str, str]] = []
    pos = 0
    while pos < len(sql):
        m = _TOKEN_RE.match(sql, pos)
        if not m:
            raise SqlParseError(f"cannot lex SQL at {sql[pos:pos+20]!r}")
        pos = m.end()
        kind = m.lastgroup
        if kind == "ws":
            continue
        toks.append((kind, m.group()))
    toks.append(("eof", ""))
    return toks


# ---------------------------------------------------------------------------
# parser
# ---------------------------------------------------------------------------


class _Parser:
    def __init__(self, toks: List[Tuple[str, str]], catalog: Dict[str, Expr], spark):
        self.toks = toks
        self.i = 0
        self.catalog = {k.lower(): v for k, v in catalog.items()}
        self.spark = spark

    # -- token helpers -------------------------------------------------------

    def peek(self, offset: int = 0) -> Tuple[str, str]:
        return self.toks[min(self.i + offset, len(self.toks) - 1)]

    def next(self) -> Tuple[str, str]:
        t = self.toks[self.i]
        self.i += 1
        return t

    def kw(self, *words: str) -> bool:
        """Consume the keyword sequence if present (case-insensitive)."""
        j = self.i
        for w in words:
            kind, val = self.toks[j] if j < len(self.toks) else ("eof", "")
            if kind != "ident" or val.upper() != w:
                return False
            j += 1
        self.i = j
        return True

    def peek_kw(self, *words: str) -> bool:
        j = self.i
        for w in words:
            kind, val = self.toks[j] if j < len(self.toks) else ("eof", "")
            if kind != "ident" or val.upper() != w:
                return False
            j += 1
        return True

    def expect(self, val: str) -> None:
        kind, got = self.next()
        if got.upper() != val.upper():
            raise SqlParseError(f"expected {val!r}, got {got!r}")

    # -- entry ---------------------------------------------------------------

    def parse_query(self) -> Expr:
        if not self.kw("SELECT"):
            raise SqlParseError("only SELECT queries are supported")
        distinct = self.kw("DISTINCT")
        items = self.parse_select_items()

        if not self.kw("FROM"):
            raise SqlParseError("SELECT without FROM is not supported")
        rel = self.parse_table()
        rel = self.parse_joins(rel)

        if self.kw("WHERE"):
            rel = rel.filter(Deferred(self.parse_expr()))

        group_keys: List[VNode] = []
        if self.kw("GROUP", "BY"):
            group_keys.append(self.parse_expr())
            while self.peek()[1] == ",":
                self.next()
                group_keys.append(self.parse_expr())

        having: Optional[VNode] = None
        if self.kw("HAVING"):
            having = self.parse_expr()

        rel = self._apply_projection(rel, items, group_keys, having)
        if distinct:
            rel = rel.distinct()

        if self.kw("ORDER", "BY"):
            keys = [self.parse_sort_key()]
            while self.peek()[1] == ",":
                self.next()
                keys.append(self.parse_sort_key())
            rel = rel.order_by(*[Deferred(k) for k in keys])

        if self.kw("LIMIT"):
            kind, val = self.next()
            if kind != "number":
                raise SqlParseError(f"LIMIT expects a number, got {val!r}")
            n = int(val)
            offset = 0
            if self.kw("OFFSET"):
                kind, val = self.next()
                if kind != "number":
                    raise SqlParseError(f"OFFSET expects a number, got {val!r}")
                offset = int(val)
            rel = rel.limit(n, offset=offset)
        return rel

    # -- select list / projection --------------------------------------------

    def parse_select_items(self):
        items: List[Tuple[Optional[VNode], Optional[str]]] = []
        while True:
            if self.peek()[1] == "*":
                self.next()
                items.append((None, None))  # star
            else:
                node = self.parse_expr()
                alias = None
                if self.kw("AS"):
                    alias = self._ident()
                elif self.peek()[0] in ("ident", "qident") and not self.peek_kw(
                    "FROM"
                ) and self.peek()[1].upper() not in (
                    "WHERE", "GROUP", "HAVING", "ORDER", "LIMIT",
                    "UNION", "JOIN", "LEFT", "RIGHT", "FULL", "INNER",
                    "CROSS", "ON", "USING",
                ):
                    alias = self._ident()
                items.append((node, alias))
            if self.peek()[1] == ",":
                self.next()
                continue
            return items

    @staticmethod
    def _contains_agg(node: Any) -> bool:
        if isinstance(node, Func):
            if node.name.lower() in _AGG_FUNCS or node.name.lower() in (
                "count_star", "count_distinct",
            ):
                return True
            return any(_Parser._contains_agg(a) for a in node.args)
        if isinstance(node, BinOp):
            return _Parser._contains_agg(node.left) or _Parser._contains_agg(node.right)
        if isinstance(node, UnOp):
            return _Parser._contains_agg(node.operand)
        if isinstance(node, Cast):
            return _Parser._contains_agg(node.operand)
        if isinstance(node, Case):
            parts = [v for br in node.branches for v in br] + (
                [node.default] if node.default is not None else []
            )
            return any(_Parser._contains_agg(p) for p in parts)
        return False

    @staticmethod
    def _default_name(node: VNode, idx: int) -> str:
        if isinstance(node, Col):
            return node.name
        return f"col{idx}"

    def _apply_projection(self, rel, items, group_keys, having):
        is_agg = bool(group_keys) or any(
            node is not None and self._contains_agg(node) for node, _ in items
        )
        if not is_agg:
            if having is not None:
                raise SqlParseError("HAVING without aggregation")
            if len(items) == 1 and items[0][0] is None:
                return rel  # SELECT *
            sels = []
            for idx, (node, alias) in enumerate(items):
                if node is None:
                    raise SqlParseError("SELECT * mixed with expressions")
                sels.append(Deferred(node, alias or self._default_name(node, idx)))
            return rel.select(*sels)

        # positional GROUP BY (GROUP BY 1): resolve to the Nth item
        resolved_keys: List[VNode] = []
        for k in group_keys:
            if isinstance(k, Lit) and isinstance(k.value, int):
                idx = k.value - 1
                if not (0 <= idx < len(items)) or items[idx][0] is None:
                    raise SqlParseError(f"GROUP BY position {k.value} out of range")
                resolved_keys.append(items[idx][0])
            else:
                resolved_keys.append(k)
        group_keys = resolved_keys

        # aggregate path: split items into group keys vs metrics
        keyset = list(group_keys)
        metrics: Dict[str, Deferred] = {}
        key_names: List[str] = []
        out_order: List[str] = []
        for idx, (node, alias) in enumerate(items):
            if node is None:
                raise SqlParseError("SELECT * with GROUP BY")
            name = alias or self._default_name(node, idx)
            if self._contains_agg(node):
                metrics[name] = Deferred(node)
            else:
                if node not in keyset:
                    keyset.append(node)
                key_names.append(name)
            out_order.append(name)
        grouped = rel.group_by(
            *[Deferred(k, self._default_name(k, i)) for i, k in enumerate(keyset)]
        )
        out = grouped.aggregate(**metrics)
        if having is not None:
            out = out.filter(Deferred(having))
        return out

    # -- FROM / JOIN ----------------------------------------------------------

    def _ident(self) -> str:
        kind, val = self.next()
        if kind == "qident":
            return val[1:-1]
        if kind == "ident":
            return val
        raise SqlParseError(f"expected identifier, got {val!r}")

    def parse_table(self) -> Expr:
        if self.peek()[1] == "(":
            self.next()
            sub = self.parse_query()
            self.expect(")")
            self.kw("AS")
            if self.peek()[0] in ("ident", "qident"):
                self._ident()  # alias: consumed; qualifiers are stripped anyway
            return sub
        name = self._ident()
        # direct-path scan: `parquet.`/path/file`` (what sql_compile
        # emits for reads) -> a deferred read of that file
        if name.lower() in ("parquet", "csv", "json") and self.peek()[1] == ".":
            self.next()
            kind, val = self.next()
            if kind != "qident":
                raise SqlParseError(f"expected quoted path after {name}., got {val!r}")
            path = val[1:-1]
            from xorq_spark.expr.api import (
                deferred_read_csv,
                deferred_read_json,
                deferred_read_parquet,
            )

            reader = {
                "parquet": deferred_read_parquet,
                "csv": deferred_read_csv,
                "json": deferred_read_json,
            }[name.lower()]
            rel = reader(path)
            if self.kw("AS"):
                self._ident()
            elif self.peek()[0] in ("ident", "qident") and self.peek()[1].upper() not in (
                "WHERE", "GROUP", "HAVING", "ORDER", "LIMIT", "JOIN", "LEFT",
                "RIGHT", "FULL", "INNER", "CROSS", "ON", "USING", "SEMI", "ANTI",
            ):
                self._ident()
            return rel
        # optional alias (skip clause keywords)
        if self.peek()[0] in ("ident", "qident") and self.peek()[1].upper() not in (
            "WHERE", "GROUP", "HAVING", "ORDER", "LIMIT", "JOIN", "LEFT",
            "RIGHT", "FULL", "INNER", "CROSS", "ON", "USING", "AS", "SEMI", "ANTI",
        ):
            self._ident()
        elif self.kw("AS"):
            self._ident()
        expr = self.catalog.get(name.lower())
        if expr is not None:
            return expr
        return Expr(N.TableRef(name), self.spark)

    def parse_joins(self, left: Expr) -> Expr:
        while True:
            how = None
            if self.kw("INNER", "JOIN") or (self.peek_kw("JOIN") and self.kw("JOIN")):
                how = "inner"
            elif self.kw("LEFT", "OUTER", "JOIN") or self.kw("LEFT", "JOIN"):
                how = "left"
            elif self.kw("RIGHT", "OUTER", "JOIN") or self.kw("RIGHT", "JOIN"):
                how = "right"
            elif self.kw("FULL", "OUTER", "JOIN") or self.kw("FULL", "JOIN"):
                how = "outer"
            elif self.kw("CROSS", "JOIN"):
                how = "cross"
            elif self.kw("SEMI", "JOIN"):
                how = "semi"
            elif self.kw("ANTI", "JOIN"):
                how = "anti"
            else:
                return left
            right = self.parse_table()
            if how == "cross":
                left = left.cross_join(right)
                continue
            if self.kw("USING"):
                self.expect("(")
                cols = [self._ident()]
                while self.peek()[1] == ",":
                    self.next()
                    cols.append(self._ident())
                self.expect(")")
                left = left.join(right, cols, how=how)
            elif self.kw("ON"):
                pred = self.parse_expr()
                left = left.join(right, Deferred(pred), how=how)
            else:
                raise SqlParseError("JOIN requires ON or USING")
        return left

    # -- expressions -----------------------------------------------------------

    def parse_sort_key(self) -> SortKey:
        node = self.parse_expr()
        ascending = True
        if self.kw("ASC"):
            ascending = True
        elif self.kw("DESC"):
            ascending = False
        nulls_first = None
        if self.kw("NULLS", "FIRST"):
            nulls_first = True
        elif self.kw("NULLS", "LAST"):
            nulls_first = False
        return SortKey(node, ascending, nulls_first)

    def parse_expr(self) -> VNode:
        return self.parse_or()

    def parse_or(self) -> VNode:
        node = self.parse_and()
        while self.kw("OR"):
            node = BinOp("|", node, self.parse_and())
        return node

    def parse_and(self) -> VNode:
        node = self.parse_not()
        while self.kw("AND"):
            node = BinOp("&", node, self.parse_not())
        return node

    def parse_not(self) -> VNode:
        if self.kw("NOT"):
            return UnOp("~", self.parse_not())
        return self.parse_comparison()

    def parse_comparison(self) -> VNode:
        node = self.parse_additive()
        while True:
            kind, val = self.peek()
            if val in ("=", "==", "!=", "<>", "<", "<=", ">", ">="):
                self.next()
                op = {"=": "==", "<>": "!="}.get(val, val)
                node = BinOp(op, node, self.parse_additive())
                continue
            negate = False
            save = self.i
            if self.kw("NOT"):
                negate = True
            if self.kw("IN"):
                self.expect("(")
                vals = [self.parse_expr()]
                while self.peek()[1] == ",":
                    self.next()
                    vals.append(self.parse_expr())
                self.expect(")")
                if not all(isinstance(v, Lit) for v in vals):
                    raise SqlParseError("IN list must be literals")
                # raw python values: Column.isin's own literal handling
                node = Func("isin", (node, *[v.value for v in vals]))
            elif self.kw("BETWEEN"):
                lo = self.parse_additive()
                if not self.kw("AND"):
                    raise SqlParseError("BETWEEN requires AND")
                hi = self.parse_additive()
                node = Func("between", (node, lo, hi))
            elif self.kw("LIKE"):
                pat = self.parse_additive()
                if not isinstance(pat, Lit) or not isinstance(pat.value, str):
                    raise SqlParseError("LIKE requires a string literal pattern")
                node = Func("like", (node, pat.value))
            elif self.kw("IS"):
                isnot = self.kw("NOT")
                if not self.kw("NULL"):
                    raise SqlParseError("IS requires NULL")
                inner = Func("isnull", (node,))
                node = UnOp("~", inner) if isnot else inner
                if negate:
                    raise SqlParseError("NOT IS NULL")
            else:
                if negate:
                    self.i = save
                return node
            if negate:
                node = UnOp("~", node)
        return node

    def parse_additive(self) -> VNode:
        node = self.parse_multiplicative()
        while True:
            kind, val = self.peek()
            if val in ("+", "-"):
                self.next()
                node = BinOp(val, node, self.parse_multiplicative())
            elif val == "||":
                self.next()
                node = Func("concat", (node, self.parse_multiplicative()))
            else:
                return node

    def parse_multiplicative(self) -> VNode:
        node = self.parse_unary()
        while self.peek()[1] in ("*", "/", "%"):
            _, val = self.next()
            node = BinOp(val, node, self.parse_unary())
        return node

    def parse_unary(self) -> VNode:
        if self.peek()[1] == "-":
            self.next()
            operand = self.parse_unary()
            if isinstance(operand, Lit) and isinstance(operand.value, (int, float)):
                return Lit(-operand.value)
            return UnOp("-", operand)
        if self.peek()[1] == "+":
            self.next()
            return self.parse_unary()
        return self.parse_primary()

    def parse_primary(self) -> VNode:
        kind, val = self.peek()
        if val == "(":
            self.next()
            if self.peek_kw("SELECT"):
                raise SqlParseError(
                    "scalar/EXISTS subqueries are not supported by parse_sql "
                    "(use the expression API's subquery helpers)"
                )
            node = self.parse_expr()
            self.expect(")")
            return node
        if kind == "string":
            self.next()
            return Lit(val[1:-1].replace("''", "'"))
        if kind == "number":
            self.next()
            if re.fullmatch(r"\d+", val):
                return Lit(int(val))
            return Lit(float(val))
        if kind == "qident":
            self.next()
            return self._maybe_qualified(val[1:-1])
        if kind != "ident":
            raise SqlParseError(f"unexpected token {val!r}")
        up = val.upper()
        if up == "NULL":
            self.next()
            return Lit(None)
        if up in ("TRUE", "FALSE"):
            self.next()
            return Lit(up == "TRUE")
        if up == "CASE":
            return self.parse_case()
        if up == "CAST" or up == "TRY_CAST":
            self.next()
            self.expect("(")
            operand = self.parse_expr()
            if not self.kw("AS"):
                raise SqlParseError("CAST requires AS")
            dtype = self.parse_type()
            self.expect(")")
            return Cast(operand, dtype, try_=(up == "TRY_CAST"))
        # function call or identifier
        if self.peek(1)[1] == "(":
            self.next()
            self.next()  # consume '('
            fname = val.lower()
            if self.peek()[1] == "*":
                self.next()
                self.expect(")")
                if fname != "count":
                    raise SqlParseError(f"{fname}(*) is not supported")
                return Func("count", (Lit(1),))
            distinct = self.kw("DISTINCT")
            args: List[VNode] = []
            if self.peek()[1] != ")":
                args.append(self.parse_expr())
                while self.peek()[1] == ",":
                    self.next()
                    args.append(self.parse_expr())
            self.expect(")")
            if distinct:
                if fname != "count":
                    raise SqlParseError("DISTINCT only supported inside count()")
                return Func("count_distinct", tuple(args))
            return Func(fname, tuple(args))
        self.next()
        return self._maybe_qualified(val)

    def _maybe_qualified(self, name: str) -> VNode:
        # table-qualified column: strip the qualifier (joins here resolve
        # on merged schemas, matching the DataFrame lowering)
        if self.peek()[1] == ".":
            self.next()
            return Col(self._ident())
        return Col(name)

    def parse_case(self) -> VNode:
        self.expect("CASE")
        branches: List[Tuple[VNode, VNode]] = []
        default: Optional[VNode] = None
        while self.kw("WHEN"):
            cond = self.parse_expr()
            if not self.kw("THEN"):
                raise SqlParseError("CASE WHEN requires THEN")
            branches.append((cond, self.parse_expr()))
        if self.kw("ELSE"):
            default = self.parse_expr()
        if not self.kw("END"):
            raise SqlParseError("CASE requires END")
        if not branches:
            raise SqlParseError("CASE requires at least one WHEN")
        return Case(tuple(branches), default)

    def parse_type(self) -> str:
        base = self._ident()
        if self.peek()[1] == "(":
            self.next()
            params = [self.next()[1]]
            while self.peek()[1] == ",":
                self.next()
                params.append(self.next()[1])
            self.expect(")")
            return f"{base}({','.join(params)})"
        return base


def parse_sql(
    sql: str,
    catalog: Optional[Dict[str, Expr]] = None,
    spark=None,
) -> Expr:
    """Lift a SQL SELECT into the Expr graph (reference: parse_sql,
    vendor/ibis/expr/sql.py:385). Table names resolve through `catalog`
    (name -> Expr); unknown names become unbound TableRefs resolved at
    execution against the session's temp views. Deterministic: equal
    SQL text yields token-identical graphs, so SQL-defined relations
    participate in caching/builds/lineage like API-built ones."""
    p = _Parser(_lex(sql), catalog or {}, spark)
    expr = p.parse_query()
    kind, val = p.peek()
    if kind != "eof":
        raise SqlParseError(f"unconsumed SQL after query end: {val!r}")
    return expr
