"""Relation-operator IR nodes.

The rebuild's equivalent of the reference's `ops.Relation` family
(vendor/ibis/expr/operations/relations.py; xorq extensions in
expr/relations.py). Frozen dataclasses — hashable, comparable,
plain-data serializable — that lower to PySpark DataFrame calls
(SURVEY §2.2 mapping). Catalyst owns all optimization; these nodes
exist for canonical hashing, caching boundaries, and build artifacts.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Optional, Tuple

from xorq_spark.expr.deferred import SortKey, VNode

NamedExprs = Tuple[Tuple[str, VNode], ...]


@dataclass(frozen=True)
class RNode:
    """Base relation node."""


# --- sources (reference: ops.InMemoryTable / DatabaseTable / UnboundTable /
# --- xorq Read, expr/relations.py:826) ------------------------------------
@dataclass(frozen=True)
class ReadParquet(RNode):
    paths: Tuple[str, ...]
    schema: Optional[str] = None  # DDL; None = infer
    table_name: Optional[str] = None


@dataclass(frozen=True)
class ReadCSV(RNode):
    paths: Tuple[str, ...]
    schema: Optional[str] = None
    options: Tuple[Tuple[str, str], ...] = (("header", "true"),)
    table_name: Optional[str] = None


@dataclass(frozen=True)
class ReadJSON(RNode):
    paths: Tuple[str, ...]
    schema: Optional[str] = None
    options: Tuple[Tuple[str, str], ...] = ()
    table_name: Optional[str] = None


@dataclass(frozen=True)
class ReadORC(RNode):
    """ORC file read — Spark ships the ORC datasource in core, so this
    format costs nothing to support (columnar, predicate-pushdown
    capable like parquet)."""

    paths: Tuple[str, ...]
    schema: Optional[str] = None
    table_name: Optional[str] = None


@dataclass(frozen=True)
class ReadDelta(RNode):
    """Delta Lake table dir (reference: read_delta, backend.py:688).
    Requires the delta-spark package at lowering time (gated — not in
    this container)."""

    path: str
    version: Optional[int] = None
    table_name: Optional[str] = None


@dataclass(frozen=True)
class Memtable(RNode):
    """Literal in-process table. The payload (Arrow table) lives in a
    process-local registry keyed by its content token so the node itself
    stays plain data (reference: ops.InMemoryTable, relations.py:421)."""

    token: str
    schema: str
    name: Optional[str] = None


@dataclass(frozen=True)
class TableRef(RNode):
    """Named table in the session catalog (ops.DatabaseTable)."""

    name: str


@dataclass(frozen=True)
class UnboundTable(RNode):
    """Schema-only template (ops.UnboundTable): bound at execution by
    supplying a DataFrame/expr for `name`."""

    name: str
    schema: str


# --- relational core -------------------------------------------------------
@dataclass(frozen=True)
class Project(RNode):
    parent: RNode
    exprs: NamedExprs
    extend: bool = False  # True = mutate (keep existing columns)


@dataclass(frozen=True)
class Filter(RNode):
    parent: RNode
    predicates: Tuple[VNode, ...]


@dataclass(frozen=True)
class Aggregate(RNode):
    parent: RNode
    keys: NamedExprs
    metrics: NamedExprs


@dataclass(frozen=True)
class GroupingSetsAgg(RNode):
    """cube/rollup aggregation. The reference has NO grouping sets in
    its IR (verified in SURVEY §2.2) — Spark ships them free, exposed
    as extras without breaking parity claims."""

    parent: RNode
    keys: Tuple[str, ...]
    metrics: NamedExprs
    mode: str = "cube"  # cube|rollup


@dataclass(frozen=True)
class Sort(RNode):
    parent: RNode
    keys: Tuple[SortKey, ...]


@dataclass(frozen=True)
class Limit(RNode):
    parent: RNode
    n: Optional[int]
    offset: int = 0


@dataclass(frozen=True)
class Distinct(RNode):
    parent: RNode
    subset: Optional[Tuple[str, ...]] = None
    keep: str = "first"  # first|last (order by all columns within subset)


@dataclass(frozen=True)
class Join(RNode):
    left: RNode
    right: RNode
    how: str  # inner|left|right|outer|semi|anti|cross|asof|positional
    predicates: Tuple[Any, ...] = ()  # str | (lname, rname) | VNode
    # asof-only options:
    on: Optional[str] = None
    by: Tuple[str, ...] = ()
    direction: str = "backward"
    rsuffix: str = "_right"


@dataclass(frozen=True)
class SetOp(RNode):
    left: RNode
    right: RNode
    kind: str  # union|intersect|difference
    distinct: bool = False


@dataclass(frozen=True)
class Sample(RNode):
    parent: RNode
    fraction: float
    seed: Optional[int] = None


@dataclass(frozen=True)
class FillNull(RNode):
    parent: RNode
    replacements: Tuple[Tuple[str, Any], ...]  # (col, value); ("*", v) = all


@dataclass(frozen=True)
class DropNull(RNode):
    parent: RNode
    subset: Optional[Tuple[str, ...]] = None
    how: str = "any"


@dataclass(frozen=True)
class Unnest(RNode):
    parent: RNode
    column: str
    offset: bool = False
    keep_empty: bool = False


@dataclass(frozen=True)
class Drop(RNode):
    parent: RNode
    columns: Tuple[str, ...]


@dataclass(frozen=True)
class Rename(RNode):
    parent: RNode
    mapping: Tuple[Tuple[str, str], ...]  # (old, new)


@dataclass(frozen=True)
class SQLView(RNode):
    """Raw SQL over a named view of the parent (reference: Table.sql,
    vendor/ibis/expr/types/relations.py:3206)."""

    parent: RNode
    sql: str
    alias: str = "t"


@dataclass(frozen=True)
class CachedNode(RNode):
    """Materialization boundary (reference: CachedNode,
    expr/relations.py:144). The pre-execution pass replaces it with a
    Parquet artifact read on hit, or materializes on miss."""

    parent: RNode
    strategy: str = "mtime"  # mtime|snapshot|ttl:<seconds>


@dataclass(frozen=True)
class CacheTag(RNode):
    """Pinned (frozen) cache: a direct read of the cache artifact that
    still carries the original subtree so it can be unpinned (reference:
    CacheTag, expr/relations.py:149)."""

    parent: RNode
    key: str
    strategy: str = "mtime"


@dataclass(frozen=True)
class Tag(RNode):
    """Metadata annotation (reference: tag/hashing_tag,
    vendor/ibis/expr/types/relations.py:3509,3553). Identity for
    execution. A plain tag is transparent to cache tokenization (same
    hash as its parent); a hashing tag contributes to the hash, forcing
    a distinct cache entry for an otherwise-identical subtree."""

    parent: RNode
    name: str
    meta: Tuple[Tuple[str, str], ...] = ()
    hashing: bool = False


@dataclass(frozen=True)
class Unpivot(RNode):
    """pivot_longer (reference: types/relations.py:3597) -> df.unpivot."""

    parent: RNode
    ids: Tuple[str, ...]
    values: Tuple[str, ...]
    var_name: str = "name"
    val_name: str = "value"


@dataclass(frozen=True)
class Pivot(RNode):
    """pivot_wider (reference: types/relations.py:3927) ->
    groupBy(keys).pivot(names_from).agg(fn(values_from))."""

    parent: RNode
    keys: Tuple[str, ...]
    names_from: str
    values_from: str
    agg: str = "first"


@dataclass(frozen=True)
class Describe(RNode):
    """describe/info summary stats (types/relations.py:2717) ->
    df.summary()."""

    parent: RNode
    stats: Tuple[str, ...] = ()


@dataclass(frozen=True)
class Unpack(RNode):
    """struct column -> top-level columns (types/relations.py:2638)."""

    parent: RNode
    column: str


@dataclass(frozen=True)
class AggPandas(RNode):
    """Grouped pandas UDAF (reference: agg.pandas_df, expr/udf.py:627):
    each group's rows -> pandas DataFrame -> fn -> one-row result.
    Lowered to groupBy(keys).applyInPandas. The callable lives in the
    UDF registry under `fn_token` so the node stays plain data."""

    parent: RNode
    keys: Tuple[str, ...]
    fn_token: str
    schema_out: str


@dataclass(frozen=True)
class MapBatches(RNode):
    """Table-in -> table-out exchange UDF (reference: flight_udxf /
    FlightUDXF, expr/relations.py:580 — same iterator-of-batches
    contract as mapInPandas/mapInArrow)."""

    parent: RNode
    fn_token: str
    schema_out: str
    mode: str = "pandas"  # pandas|arrow


@dataclass(frozen=True)
class WindowUDF(RNode):
    """Custom window evaluator (reference: pyarrow_udwf,
    backends/xorq_datafusion/backend.py:88-140). No PySpark UDWF
    primitive exists; emulated per-partition with applyInPandas over
    sorted groups — fn sees the whole ordered partition frame."""

    parent: RNode
    partition_by: Tuple[str, ...]
    order_by: Tuple[str, ...]
    fn_token: str
    result_name: str
    dtype: str


def children(node: RNode) -> Tuple[RNode, ...]:
    out = []
    for attr in ("parent", "left", "right"):
        v = getattr(node, attr, None)
        if isinstance(v, RNode):
            out.append(v)
    return tuple(out)


def walk(node: RNode):
    """Pre-order DFS over relation nodes."""
    yield node
    for c in children(node):
        yield from walk(c)
