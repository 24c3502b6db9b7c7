"""Column-level lineage over the expression IR.

Reference: common/utils/lineage_utils.py (boundary-kind classification
:63-137, schema diff :252). Ours walks OUR relation nodes — each output
column maps to the set of (source, column) leaves it derives from.
Leaves are labeled by path (reads), memtable token, or table name.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Set, Tuple

from xorq_spark.expr import nodes as N
from xorq_spark.expr.deferred import Col, VNode

Lineage = Dict[str, Set[Tuple[str, str]]]


def _col_refs(v) -> Set[str]:
    """All column names referenced by a value expression."""
    out: set = set()
    if isinstance(v, Col):
        out.add(v.name)
    if dataclasses.is_dataclass(v) and not isinstance(v, type):
        for f in dataclasses.fields(v):
            x = getattr(v, f.name)
            if isinstance(x, VNode):
                out |= _col_refs(x)
            elif isinstance(x, tuple):
                out |= _tuple_refs(x)
    return out


def _tuple_refs(t) -> Set[str]:
    out: set = set()
    for x in t:
        if isinstance(x, VNode):
            out |= _col_refs(x)
        elif isinstance(x, tuple):
            out |= _tuple_refs(x)
    return out


def _leaf_label(node: N.RNode) -> str:
    if isinstance(node, (N.ReadParquet, N.ReadCSV, N.ReadJSON, N.ReadORC)):
        return node.table_name or node.paths[0]
    if isinstance(node, N.Memtable):
        return node.name or f"memtable:{node.token}"
    if isinstance(node, (N.TableRef, N.UnboundTable)):
        return node.name
    return type(node).__name__


def column_lineage(expr, spark=None) -> Lineage:
    """{output_column: {(source_label, source_column), ...}}. Leaf
    schemas come from Spark analysis (file footer / catalog only — no
    data is read)."""
    from xorq_spark.expr.core import Expr

    def leaf_cols(node: N.RNode) -> list:
        return Expr(node, getattr(expr, "_spark", None)).to_spark(spark).columns

    def rec(node: N.RNode) -> Lineage:
        if isinstance(node, (N.ReadParquet, N.ReadCSV, N.ReadJSON, N.ReadORC, N.Memtable,
                             N.TableRef, N.UnboundTable)):
            label = _leaf_label(node)
            return {c: {(label, c)} for c in leaf_cols(node)}
        if isinstance(node, N.Project):
            parent = rec(node.parent)
            out: Lineage = dict(parent) if node.extend else {}
            for name, v in node.exprs:
                refs = _col_refs(v)
                out[name] = set().union(*(parent.get(r, set()) for r in refs)) if refs else set()
            return out
        if isinstance(node, N.Aggregate):
            parent = rec(node.parent)
            out = {}
            for name, v in tuple(node.keys) + tuple(node.metrics):
                refs = _col_refs(v)
                out[name] = set().union(*(parent.get(r, set()) for r in refs)) if refs else set()
            return out
        if isinstance(node, N.Join):
            left, right = rec(node.left), rec(node.right)
            out = dict(left)
            for c, srcs in right.items():
                if c in out:
                    if node.how in ("semi", "anti", "any_inner"):
                        continue
                    # equi-key predicate columns merge; payload collides to suffix
                    if any(p == c for p in node.predicates):
                        out[c] = out[c] | srcs
                    else:
                        out[c + node.rsuffix] = srcs
                else:
                    out[c] = srcs
            return out
        if isinstance(node, N.SetOp):
            left, right = rec(node.left), rec(node.right)
            return {c: left.get(c, set()) | right.get(c, set()) for c in left}
        if isinstance(node, N.Drop):
            parent = rec(node.parent)
            return {c: s for c, s in parent.items() if c not in node.columns}
        if isinstance(node, N.Rename):
            parent = rec(node.parent)
            m = dict(node.mapping)
            return {m.get(c, c): s for c, s in parent.items()}
        if isinstance(node, N.Unnest):
            parent = rec(node.parent)
            out = dict(parent)
            if node.offset:
                out[f"{node.column}_offset"] = parent.get(node.column, set())
            return out
        # pass-through relation ops (filter/sort/limit/distinct/sample/
        # fillnull/dropnull/cache/...) preserve column identity
        kids = N.children(node)
        if len(kids) == 1:
            return rec(kids[0])
        raise TypeError(f"lineage: unhandled node {type(node).__name__}")

    return rec(expr.node)


def lineage_text(expr, spark=None) -> str:
    """Human-readable lineage dump."""
    lin = column_lineage(expr, spark)
    lines = []
    for col in sorted(lin):
        srcs = ", ".join(f"{s}.{c}" for s, c in sorted(lin[col])) or "<literal>"
        lines.append(f"{col} <- {srcs}")
    return "\n".join(lines)
