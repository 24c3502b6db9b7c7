"""Expression graph visualization.

Reference: `vendor/ibis/expr/visualize.py` (graphviz rendering of the
op graph). The graphviz python package isn't in this container, so the
primary surface is `to_dot(expr) -> str` — standalone DOT text any
Graphviz install can render — plus `visualize(expr)` which falls back
to the text tree when graphviz isn't importable.
"""

from __future__ import annotations

from xorq_spark.expr import nodes as N
from xorq_spark.expr.core import Expr, _format_tree


def _label(node) -> str:
    name = type(node).__name__
    detail = ""
    for attr in ("path", "name", "how", "kind", "n"):
        v = getattr(node, attr, None)
        if isinstance(v, (str, int)) and v != "":
            detail = f"\\n{attr}={v}"
            break
    return f"{name}{detail}"


def to_dot(expr: Expr, name: str = "expr") -> str:
    """Render the relational IR as a Graphviz DOT digraph (edges point
    from input to consumer, like the reference's visualize)."""
    node = expr.node if isinstance(expr, Expr) else expr
    lines = [
        f"digraph {name} {{",
        "  rankdir=BT;",
        '  node [shape=box, fontname="Helvetica", fontsize=10];',
    ]
    ids: dict = {}

    def visit(n) -> int:
        key = id(n)
        if key in ids:
            return ids[key]
        idx = len(ids)
        ids[key] = idx
        lines.append(f'  n{idx} [label="{_label(n)}"];')
        for child in N.children(n):
            cidx = visit(child)
            lines.append(f"  n{cidx} -> n{idx};")
        return idx

    visit(node)
    lines.append("}")
    return "\n".join(lines)


def visualize(expr: Expr, format: str = "svg", path: str | None = None):
    """Render with the graphviz package when available; otherwise
    return the DOT source (and print the text tree as a courtesy)."""
    dot = to_dot(expr)
    try:
        import graphviz  # type: ignore[import-not-found]
    except ImportError:
        if path:
            with open(path, "w") as f:
                f.write(dot)
        return dot
    src = graphviz.Source(dot)
    if path:
        src.render(path, format=format, cleanup=True)
    return src


def format_tree(expr: Expr) -> str:
    """The plain-text fallback tree (same as repr)."""
    return _format_tree(expr.node if isinstance(expr, Expr) else expr)
