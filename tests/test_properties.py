"""Property-based tests (hypothesis) for the IR-layer invariants the
whole product depends on: serialization round-trip identity, token
stability/sensitivity, dtype canonicalization idempotence. The
reference has no property-based coverage (SURVEY §5) — these guard the
hash contract harder than golden files."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

import xorq_spark as xo
from xorq_spark import _
from xorq_spark.builds import from_data, to_data
from xorq_spark.expr.datatypes import to_spark_ddl
from xorq_spark.tokenize import tokenize

_COLS = ["a", "b", "c"]

_literals = st.one_of(
    st.integers(min_value=-10**6, max_value=10**6),
    st.floats(allow_nan=False, allow_infinity=False, width=32),
    st.text(alphabet="xyz_ 0", max_size=8),
    st.booleans(),
)


@st.composite
def _value_exprs(draw, depth=2):
    col = st.sampled_from(_COLS).map(lambda c: getattr(_, c))
    if depth == 0:
        return draw(st.one_of(col, _literals.map(xo.literal)))
    left = draw(_value_exprs(depth=depth - 1))
    right = draw(_value_exprs(depth=depth - 1))
    op = draw(st.sampled_from(["+", "-", "*", ">", "<", "=="]))
    import operator

    ops = {
        "+": operator.add, "-": operator.sub, "*": operator.mul,
        ">": operator.gt, "<": operator.lt, "==": operator.eq,
    }
    return ops[op](left, right)


@st.composite
def _exprs(draw):
    e = xo.table({c: "float64" for c in _COLS}, "t")
    for _i in range(draw(st.integers(0, 3))):
        kind = draw(st.sampled_from(["filter", "mutate", "limit", "order"]))
        if kind == "filter":
            e = e.filter(draw(_value_exprs()) > 0)
        elif kind == "mutate":
            e = e.mutate(**{draw(st.sampled_from(["m1", "m2"])): draw(_value_exprs())})
        elif kind == "limit":
            e = e.limit(draw(st.integers(1, 1000)))
        else:
            e = e.order_by(draw(st.sampled_from(_COLS)))
    return e


@settings(max_examples=60, deadline=None)
@given(_exprs())
def test_serialization_roundtrip_identity(e):
    assert from_data(to_data(e.node)) == e.node


@settings(max_examples=60, deadline=None)
@given(_exprs())
def test_token_deterministic(e):
    assert tokenize(e.node) == tokenize(e.node)
    assert tokenize(e.node, "snapshot") == tokenize(e.node, "snapshot")


@settings(max_examples=60, deadline=None)
@given(_exprs(), _exprs())
def test_token_collision_free_on_distinct_graphs(e1, e2):
    if e1.node != e2.node:
        assert tokenize(e1.node) != tokenize(e2.node)
    else:
        assert tokenize(e1.node) == tokenize(e2.node)


@settings(max_examples=60, deadline=None)
@given(_exprs())
def test_roundtrip_preserves_token(e):
    """Serialize -> load -> same hash: the build/run invariant."""
    assert tokenize(from_data(to_data(e.node))) == tokenize(e.node)


_DTYPES = st.sampled_from(
    [
        "int8", "int16", "int32", "int64", "uint8", "uint32", "uint64",
        "float16", "float32", "float64", "string", "binary", "date",
        "timestamp", "json", "uuid", "bool", "decimal(12,3)",
        "array<int64>", "map<string,float64>", "struct<a:int64,b:string>",
        "array<array<string>>",
    ]
)


@settings(max_examples=60, deadline=None)
@given(_DTYPES)
def test_dtype_canonicalization_idempotent(name):
    once = to_spark_ddl(name)
    assert to_spark_ddl(once) == once


@settings(max_examples=30, deadline=None)
@given(st.lists(st.tuples(st.sampled_from("abc"), _DTYPES), min_size=1, max_size=4, unique_by=lambda t: t[0]))
def test_schema_struct_parses(spark, fields):
    """schema_to_struct does real DDL parsing (Spark-side), so this one
    property needs a session."""
    from xorq_spark.expr.datatypes import schema_to_struct, to_spark_ddl

    struct = schema_to_struct({n: to_spark_ddl(t) for n, t in fields})
    assert [f.name for f in struct.fields] == [n for n, _t in fields]


# --- Delta log replay vs a dict-model simulation ---------------------------

_delta_ops = st.lists(
    st.tuples(
        st.sampled_from(["add", "remove"]),
        st.integers(min_value=0, max_value=12),  # file id
    ),
    min_size=1,
    max_size=30,
)


@given(ops=_delta_ops, split=st.integers(min_value=1, max_value=6))
@settings(max_examples=60, deadline=None)
def test_delta_replay_matches_model(tmp_path_factory, ops, split):
    """replay_log == the obvious dict simulation, for any action
    sequence split arbitrarily into commits, at every version."""
    import json as _json
    import os as _os

    from xorq_spark.delta import replay_log

    root = str(tmp_path_factory.mktemp("dl"))
    log = _os.path.join(root, "_delta_log")
    _os.makedirs(log)

    # split ops into `split` commits (first commit carries protocol+meta)
    chunks = [ops[i::split] for i in range(split)]
    chunks = [c for c in chunks if c] or [[("add", 0)]]
    model: dict = {}
    model_versions = []
    for v, chunk in enumerate(chunks):
        actions = []
        if v == 0:
            actions.append({"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}})
            actions.append({"metaData": {
                "id": "prop", "format": {"provider": "parquet", "options": {}},
                "schemaString": _json.dumps({"type": "struct", "fields": [
                    {"name": "k", "type": "long", "nullable": True, "metadata": {}}]}),
                "partitionColumns": [], "configuration": {}}})
        for op, fid in chunk:
            path = f"f{fid}.parquet"
            if op == "add":
                actions.append({"add": {"path": path, "partitionValues": {},
                                        "size": 1, "modificationTime": 0,
                                        "dataChange": True}})
                model[path] = True
            else:
                actions.append({"remove": {"path": path, "dataChange": True}})
                model.pop(path, None)
        with open(_os.path.join(log, f"{v:020d}.json"), "w") as fh:
            for a in actions:
                fh.write(_json.dumps(a) + "\n")
        model_versions.append(set(model))

    for v, expect in enumerate(model_versions):
        adds, _meta = replay_log(root, version=v)
        assert {a["path"] for a in adds} == expect
    # latest == last version
    adds, _meta = replay_log(root)
    assert {a["path"] for a in adds} == model_versions[-1]


# --- connected components vs union-find ------------------------------------

_edges = st.lists(
    st.tuples(st.integers(0, 15), st.integers(0, 15)),
    min_size=1,
    max_size=25,
)


@given(edges=_edges)
@settings(max_examples=15, deadline=None)
def test_connected_components_matches_union_find(spark, edges):
    """Distributed large-star/small-star CC == driver union-find, with
    component = min node id, for arbitrary small graphs (self-loops and
    duplicate edges included)."""
    from xorq_spark.functions.dedup import connected_components

    # model: union-find with path compression
    parent: dict = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    nodes = set()
    for a, b in edges:
        if a != b:
            union(a, b)
            nodes.update((a, b))
    if not nodes:
        return  # all self-loops: CC input is empty, nothing to compare
    # canonical min-id per component
    expect = {}
    for n in nodes:
        root = find(n)
        comp = min(m for m in nodes if find(m) == root)
        expect[n] = comp

    df = spark.createDataFrame(edges, "id_a long, id_b long")
    got = {
        r.node: r.component
        for r in connected_components(
            df, "id_a", "id_b", max_iterations=20, small_graph_threshold=0
        ).collect()
    }
    assert got == expect


# --- Delta write lifecycle vs a dict-model simulation ----------------------

_lifecycle_ops = st.lists(
    st.one_of(
        st.tuples(
            st.just("append"),
            st.lists(st.integers(0, 30), min_size=1, max_size=4, unique=True),
        ),
        st.tuples(
            st.just("merge"),
            st.lists(st.integers(0, 30), min_size=1, max_size=4, unique=True),
        ),
        st.tuples(st.just("optimize"), st.just([])),
    ),
    min_size=1,
    max_size=6,
)


@given(ops=_lifecycle_ops)
@settings(max_examples=8, deadline=None)
def test_delta_lifecycle_matches_model(spark, tmp_path_factory, ops):
    """Random append / merge-upsert / optimize sequences must leave the
    table equal to the obvious dict model (k -> last written v), with
    row multiplicity right after every step (appends may duplicate a
    key; merge collapses it to one row)."""
    from collections import Counter

    from xorq_spark.delta import (
        merge_upsert,
        optimize_compact,
        read_delta_fallback,
        write_delta,
    )

    table = str(tmp_path_factory.mktemp("dlc") / "t")
    model = Counter()  # (k, v) -> multiplicity
    seq = 0
    for op, keys in ops:
        seq += 1
        if op == "append":
            df = spark.createDataFrame(
                [(k, seq * 1000 + k) for k in keys], "k int, v int"
            )
            write_delta(df, table, mode="append")
            for k in keys:
                model[(k, seq * 1000 + k)] += 1
        elif op == "merge":
            df = spark.createDataFrame(
                [(k, seq * 1000 + k) for k in keys], "k int, v int"
            )
            merge_upsert(spark, table, df, ["k"])
            for (mk, mv) in list(model):
                if mk in keys:
                    del model[(mk, mv)]
            for k in keys:
                model[(k, seq * 1000 + k)] += 1
        else:
            import os as _os

            if _os.path.isdir(_os.path.join(table, "_delta_log")):
                optimize_compact(spark, table, target_files=2)
        if model:
            got = Counter(
                (r["k"], r["v"])
                for r in read_delta_fallback(spark, table).collect()
            )
            assert got == model, (op, keys)
