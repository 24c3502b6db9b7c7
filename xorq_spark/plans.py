"""Plan layer in one place: IR nodes, lowering, hashing, serialization,
lineage, and plan introspection.

Thin facade over expr.nodes / expr.core / tokenize / builds / lineage so
the plan machinery is discoverable as `xorq_spark.plans.*`.
"""

from xorq_spark.builds import from_data, to_data
from xorq_spark.expr import nodes
from xorq_spark.expr.core import Expr, lower
from xorq_spark.expr.nodes import RNode, children, walk
from xorq_spark.lineage import column_lineage, lineage_text
from xorq_spark.tokenize import tokenize

__all__ = [
    "nodes",
    "RNode",
    "children",
    "walk",
    "Expr",
    "lower",
    "tokenize",
    "to_data",
    "from_data",
    "column_lineage",
    "lineage_text",
]
