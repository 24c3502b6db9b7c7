"""Deferred expression layer: a thin, hashable, serializable IR that
lowers to the PySpark DataFrame API.

- `deferred.py` — value-expression AST + the `_` builder (≈ ops.Value)
- `nodes.py` — relation-operator nodes (≈ ops.Relation)
- `core.py` — Expr fluent API + lowering + execution
- `api.py` — public constructors (deferred reads, memtable, param, ...)
"""

from xorq_spark.expr.core import Expr, GroupedExpr, lower
from xorq_spark.expr.deferred import Deferred, _

__all__ = ["Expr", "GroupedExpr", "Deferred", "_", "lower"]
