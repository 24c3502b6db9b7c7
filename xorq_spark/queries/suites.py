"""Driver-facing composite suites over the granular query catalog.

See suites_spec.py for membership and rationale. This module:

1. wraps each member query (Spark DataFrame + DuckDB oracle SQL) into
   one canonical schema — ``part`` (member name) + k* VARCHAR +
   n* BIGINT + d* DOUBLE slots, type-routed per sorted column name;
2. registers one UNION ALL composite per suite;
3. reorders the registry so suites (plus the few must-stay-granular
   entries) occupy the driver's 50-slot correctness window, with every
   granular query still registered after it.

Slot routing keeps only the three types with proven engine-independent
value hashing: timestamps become epoch-microsecond BIGINTs, dates
ISO-8601 VARCHARs, booleans 0/1, and scalar arrays a unit-separator
joined VARCHAR (null elements -> '<null>' on both engines).

Scale note: a suite is a UNION ALL of its members' plans — Catalyst
optimizes each branch exactly as it does the standalone query (same
pushdowns, same joins), so the composite certifies the same physical
plans the granular entries run.
"""

from __future__ import annotations

from typing import Callable

import pyspark.sql.functions as F

from xorq_spark.queries.base import QUERIES, ORACLES
from xorq_spark.queries.suites_spec import (
    SUITES,
    PRE_SPARK,
    PRE_SQL,
    WINDOW_GRANULAR,
)

try:
    from xorq_spark.queries.suites_types import TYPES
except ImportError:  # pre-generation bootstrap (tools/gen_suite_types.py)
    TYPES = {}

_SEP = "\x1f"
_NULLTOK = "<null>"

# ---------------------------------------------------------------------------
# type routing (must stay in lockstep between the two engines)
# ---------------------------------------------------------------------------

_SPARK_INT = {"tinyint", "smallint", "int", "bigint", "boolean"}
_DUCK_INT = {
    "TINYINT", "SMALLINT", "INTEGER", "BIGINT", "HUGEINT",
    "UTINYINT", "USMALLINT", "UINTEGER", "UBIGINT", "BOOLEAN",
}
_JOINABLE_ELEMS = {"string", "tinyint", "smallint", "int", "bigint"}


def spark_route(simple: str) -> str:
    """Slot category ('k'|'n'|'d') for a Spark simpleString type."""
    if simple == "string" or simple == "date":
        return "k"
    if simple.startswith("array<") and simple[6:-1] in _JOINABLE_ELEMS:
        return "k"
    if simple in _SPARK_INT or simple.startswith("timestamp"):
        return "n"
    if simple in ("double", "float"):
        return "d"
    raise TypeError(f"unroutable spark type for suite slotting: {simple}")


def duck_route(ducktype: str) -> str:
    """Slot category for a DuckDB type string (mirror of spark_route)."""
    t = ducktype.upper()
    if t in ("VARCHAR", "DATE") or t.endswith("[]"):
        return "k"
    if t in _DUCK_INT or t.startswith("TIMESTAMP"):
        return "n"
    if t in ("DOUBLE", "FLOAT", "REAL"):
        return "d"
    raise TypeError(f"unroutable duckdb type for suite slotting: {ducktype}")


def _spark_slot_expr(col: str, simple: str):
    if simple == "string":
        return F.col(col)
    if simple == "date":
        return F.col(col).cast("string")
    if simple.startswith("array<"):
        return F.array_join(
            F.transform(
                F.col(col),
                lambda x: F.coalesce(x.cast("string"), F.lit(_NULLTOK)),
            ),
            _SEP,
        )
    if simple in _SPARK_INT:
        return F.col(col).cast("bigint")
    if simple.startswith("timestamp"):
        return F.unix_micros(F.col(col).cast("timestamp"))
    return F.col(col).cast("double")


def _duck_slot_expr(col: str, ducktype: str) -> str:
    t, q = ducktype.upper(), f'"{col}"'
    if t == "VARCHAR":
        return q
    if t == "DATE":
        return f"CAST({q} AS VARCHAR)"
    if t.endswith("[]"):
        # array_to_string([]) is NULL in DuckDB but '' in Spark's
        # array_join; the CASE/coalesce pins empty-vs-null parity.
        return (
            f"CASE WHEN {q} IS NULL THEN NULL ELSE "
            f"coalesce(array_to_string(list_transform({q}, "
            f"x -> coalesce(CAST(x AS VARCHAR), '{_NULLTOK}')), chr(31)), '') "
            f"END"
        )
    if t in _DUCK_INT:
        return f"CAST({q} AS BIGINT)"
    if t.startswith("TIMESTAMP"):
        return f"epoch_us({q})"
    return f"CAST({q} AS DOUBLE)"


# ---------------------------------------------------------------------------
# suite construction
# ---------------------------------------------------------------------------


def _member_slots(member: str) -> dict[str, int]:
    counts = {"k": 0, "n": 0, "d": 0}
    for _, ducktype in TYPES[member]:
        counts[duck_route(ducktype)] += 1
    return counts


def _suite_widths(members: list[str]) -> dict[str, int]:
    w = {"k": 0, "n": 0, "d": 0}
    for m in members:
        for s, c in _member_slots(m).items():
            w[s] = max(w[s], c)
    return w


def _slot_names(widths: dict[str, int]) -> list[tuple[str, str]]:
    names: list[tuple[str, str]] = []
    for s, typ in (("k", "string"), ("n", "bigint"), ("d", "double")):
        names += [(f"{s}{i + 1}", typ) for i in range(widths[s])]
    return names


def _wrap_sql(member: str, widths: dict[str, int]) -> str:
    filled: dict[str, str] = {}
    counters = {"k": 0, "n": 0, "d": 0}
    for col, ducktype in TYPES[member]:  # sorted by column name
        s = duck_route(ducktype)
        counters[s] += 1
        filled[f"{s}{counters[s]}"] = _duck_slot_expr(col, ducktype)
    sql = ORACLES[member]
    if member in PRE_SQL:
        sql = PRE_SQL[member](sql)
    sel = [f"'{member}' AS part"]
    duck_null = {"string": "VARCHAR", "bigint": "BIGINT", "double": "DOUBLE"}
    for slot, typ in _slot_names(widths):
        expr = filled.get(slot, f"CAST(NULL AS {duck_null[typ]})")
        sel.append(f"{expr} AS {slot}")
    return f"SELECT {', '.join(sel)} FROM ({sql}) _m_{member}"


def _wrap_spark(df, member: str, widths: dict[str, int]):
    types = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    expected = [c for c, _ in TYPES[member]]
    if sorted(types) != expected:
        raise AssertionError(
            f"{member}: schema drift vs suites_types.py — regenerate with "
            f"tools/gen_suite_types.py (have {sorted(types)}, want {expected})"
        )
    filled = {}
    counters = {"k": 0, "n": 0, "d": 0}
    for (col, ducktype) in TYPES[member]:
        s_cat = spark_route(types[col])
        d_cat = duck_route(ducktype)
        if s_cat != d_cat:
            raise AssertionError(
                f"{member}.{col}: spark/duck routing disagree "
                f"({types[col]} -> {s_cat} vs {ducktype} -> {d_cat})"
            )
        counters[s_cat] += 1
        filled[f"{s_cat}{counters[s_cat]}"] = _spark_slot_expr(col, types[col])
    sel = [F.lit(member).alias("part")]
    for slot, typ in _slot_names(widths):
        expr = filled.get(slot)
        if expr is None:
            expr = F.lit(None).cast(typ)
        sel.append(expr.alias(slot))
    return df.select(*sel)


def _make_suite_fn(members: list[str], widths: dict[str, int]) -> Callable:
    granular = {m: QUERIES[m] for m in members}

    def suite_fn(spark, sf_dir):
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        out = None
        for m in members:
            df = granular[m](spark, sf_dir)
            if m in PRE_SPARK:
                df = PRE_SPARK[m](df)
            part = _wrap_spark(df, m, widths)
            out = part if out is None else out.unionByName(part)
        return out

    return suite_fn


def _install() -> None:
    granular_queries = dict(QUERIES)
    granular_oracles = dict(ORACLES)

    suite_queries: dict[str, Callable] = {}
    suite_oracles: dict[str, str] = {}
    for name, members in SUITES.items():
        missing = [m for m in members if m not in granular_queries]
        if missing:
            raise AssertionError(f"{name}: unknown members {missing}")
        widths = _suite_widths(members)
        suite_queries[name] = _make_suite_fn(members, widths)
        suite_oracles[name] = "\nUNION ALL\n".join(
            _wrap_sql(m, widths) for m in members
        )

    window = dict(suite_queries)
    for g in WINDOW_GRANULAR:
        window[g] = granular_queries[g]
    assert len(window) <= 50, f"driver window overflow: {len(window)}"
    rest = {
        k: v for k, v in granular_queries.items() if k not in WINDOW_GRANULAR
    }

    QUERIES.clear()
    QUERIES.update({**window, **rest})
    ORACLES.update(suite_oracles)


import os as _os

if TYPES and not _os.environ.get("XORQ_SUITES_SKIP"):
    _install()
