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


def get_plans(expr: Expr) -> dict:
    """All of Catalyst's plan stages for an expression, keyed by stage
    (reference: expr/api.py:778 get_plans — DataFusion EXPLAIN rows
    keyed by plan_type). Non-executing: analysis + optimization only.

    Keys: 'parsed' (unresolved logical), 'analyzed' (resolved logical),
    'optimized' (post-Catalyst logical), 'physical' (SparkPlan), and
    'formatted' (codegen-annotated physical — the one to read for
    Exchange/PushedFilters/WholeStageCodegen review)."""
    df = expr.to_spark()
    qe = df._jdf.queryExecution()
    return {
        "parsed": qe.logical().toString(),
        "analyzed": qe.analyzed().toString(),
        "optimized": qe.optimizedPlan().toString(),
        "physical": qe.executedPlan().toString(),
        "formatted": _formatted(df),
    }


def replace_sources(expr: Expr, mapping: dict) -> Expr:
    """Rewrite where an expression reads from, without touching the rest
    of the plan (reference: common/utils/graph_utils.py:414
    replace_sources — there keyed by backend identity; here, with one
    engine and path-addressed sources, keyed by path or table name).

    `mapping` entries:
    - path -> path: exact file/dir match on Read* nodes; a key that is a
      directory prefix rewrites every path under it (longest key wins),
      so {"/data/sf0.01": "/data/sf1"} retargets a whole catalog.
    - name -> Expr | RNode: TableRef / UnboundTable nodes with that name
      are substituted wholesale (the transfer_tables analog: the
      replacement brings its own data).

    Relations referenced inside SQLView text are opaque and not
    rewritten. Returns a new Expr; cache tokens change with the paths,
    so a retargeted expr never aliases the original's cache entries."""
    import dataclasses

    prefix_keys = sorted(
        (k for k in mapping if isinstance(k, str)), key=len, reverse=True
    )

    def map_path(p: str) -> str:
        if p in mapping and isinstance(mapping[p], str):
            return mapping[p]
        for k in prefix_keys:
            v = mapping[k]
            if isinstance(v, str) and p.startswith(k.rstrip("/") + "/"):
                return v.rstrip("/") + p[len(k.rstrip("/")):]
        return p

    def rewrite(node: RNode) -> RNode:
        updates = {}
        for attr in ("parent", "left", "right"):
            v = getattr(node, attr, None)
            if isinstance(v, RNode):
                nv = rewrite(v)
                if nv is not v:
                    updates[attr] = nv
        if updates:
            node = dataclasses.replace(node, **updates)
        if isinstance(node, (nodes.ReadParquet, nodes.ReadCSV, nodes.ReadJSON, nodes.ReadORC)):
            new_paths = tuple(map_path(p) for p in node.paths)
            if new_paths != node.paths:
                node = dataclasses.replace(node, paths=new_paths)
        elif isinstance(node, nodes.ReadDelta):
            np = map_path(node.path)
            if np != node.path:
                node = dataclasses.replace(node, path=np)
        elif isinstance(node, (nodes.TableRef, nodes.UnboundTable)):
            sub = mapping.get(node.name)
            if sub is not None:
                node = sub.node if isinstance(sub, Expr) else sub
        return node

    return Expr(rewrite(expr.node), getattr(expr, "_spark", None))


def _formatted(df) -> str:
    """FormattedMode explain string (same JVM entry .explain() uses)."""
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


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
    "get_plans",
    "replace_sources",
    "to_sql",
]

from xorq_spark.sql_compile import to_sql  # noqa: E402
