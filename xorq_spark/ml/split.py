"""Deterministic train/test splitting.

Reference semantics: xorq's `train_test_splits` / `calc_split_column`
(/root/reference/python/xorq/expr/ml/split_lib.py:222,154) — hash the
unique-key columns, bucket the hash, assign splits by cumulative
test-size ranges. Pure relational ops, reproducible across engines,
partitionings, and runs (no RNG state).

Our hash is a Knuth multiplicative mix over per-column md5-derived
integers — portable to any SQL engine (the reference's property we keep)
and computable entirely JVM-side.
"""

from __future__ import annotations

from typing import Sequence, Union

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

_KNUTH = 2654435761
_MOD = 1 << 32
# Accumulator domain 2^31 keeps acc * _KNUTH < 2^63 (ANSI mode errors on
# int64 overflow rather than wrapping).
_ACC_MOD = 1 << 31


def _key_hash(unique_key: Sequence[str]) -> Column:
    """Deterministic 32-bit hash of the key columns via md5-hex -> int
    per column + a Knuth multiplicative mix."""
    acc = F.lit(0).cast("long")
    for c in unique_key:
        col = F.col(c)
        num = F.conv(F.substring(F.md5(col.cast("string")), 1, 8), 16, 10).cast("long")
        acc = (acc * 31 + num) % _ACC_MOD
    return (acc * _KNUTH) % _MOD


def calc_split_column(
    unique_key: Union[str, Sequence[str]],
    test_sizes: Sequence[float],
    num_buckets: int = 10000,
    labels: Sequence[str] = None,
) -> Column:
    """Split-label column: hash(key) % num_buckets bucketed into
    cumulative test_sizes ranges (must sum to 1)."""
    if isinstance(unique_key, str):
        unique_key = [unique_key]
    if abs(sum(test_sizes) - 1.0) > 1e-9:
        raise ValueError("test_sizes must sum to 1")
    labels = list(labels or [str(i) for i in range(len(test_sizes))])
    bucket = _key_hash(unique_key) % num_buckets
    expr = None
    hi = 0.0
    for frac, label in zip(test_sizes, labels):
        hi += frac
        bound = int(round(hi * num_buckets))
        cond = bucket < bound
        expr = F.when(cond, label) if expr is None else expr.when(cond, label)
    return expr.otherwise(labels[-1])


def train_test_splits(
    df: DataFrame,
    unique_key: Union[str, Sequence[str]],
    test_size: float = 0.25,
    num_buckets: int = 10000,
) -> tuple[DataFrame, DataFrame]:
    """(train_df, test_df) — deterministic, disjoint, reproducible."""
    col = calc_split_column(
        unique_key, [test_size, 1 - test_size], num_buckets, ["test", "train"]
    )
    tagged = df.withColumn("__split", col)
    return (
        tagged.filter(F.col("__split") == "train").drop("__split"),
        tagged.filter(F.col("__split") == "test").drop("__split"),
    )


def kfold_column(unique_key: Union[str, Sequence[str]], k: int = 5) -> Column:
    """Deterministic fold id 0..k-1 (reference: fold assignment for
    deferred_cross_val_score, expr/ml/cross_validation.py:336)."""
    if isinstance(unique_key, str):
        unique_key = [unique_key]
    return (_key_hash(unique_key) % k).cast("int")


# --------------------------------------------------------------------------
# Deferred-AST variants (for the Expr layer): same hash formula built
# from VNode expressions so split assignment participates in plan
# hashing/serialization like any other column.
# --------------------------------------------------------------------------
def _expr_key_hash(unique_key: Sequence[str]):
    from xorq_spark.expr.deferred import Cast, Col, Deferred, Func, Lit

    acc = Deferred(Lit(0)).cast("bigint")
    for c in unique_key:
        s = Deferred(Cast(Col(c), "string"))
        md5 = Deferred(Func("md5", (s.node,)))
        sub = Deferred(Func("substring", (md5.node, 1, 8)))
        num = Deferred(Func("conv", (sub.node, 16, 10))).cast("bigint")
        acc = (acc * 31 + num) % _ACC_MOD
    return (acc * _KNUTH) % _MOD


def expr_split_column(
    unique_key: Union[str, Sequence[str]],
    test_sizes: Sequence[float],
    num_buckets: int = 10000,
    labels: Sequence[str] = None,
):
    """Deferred split-label expression (same semantics as
    calc_split_column, usable in Expr.mutate)."""
    from xorq_spark.expr.deferred import Case, Deferred, unwrap

    if isinstance(unique_key, str):
        unique_key = [unique_key]
    if abs(sum(test_sizes) - 1.0) > 1e-9:
        raise ValueError("test_sizes must sum to 1")
    labels = list(labels or [str(i) for i in range(len(test_sizes))])
    bucket = _expr_key_hash(unique_key) % num_buckets
    branches = []
    hi = 0.0
    for frac, label in zip(test_sizes, labels):
        hi += frac
        bound = int(round(hi * num_buckets))
        branches.append((unwrap(bucket < bound), unwrap(label)))
    return Deferred(Case(tuple(branches), unwrap(labels[-1])))


def expr_kfold_column(unique_key: Union[str, Sequence[str]], k: int = 5):
    """Deferred fold-id expression 0..k-1."""
    if isinstance(unique_key, str):
        unique_key = [unique_key]
    return (_expr_key_hash(unique_key) % k).cast("int")


def make_deterministic_sort_key(expr, random_seed: int = 0):
    """Stable pseudo-random row order (reference:
    expr/ml/cross_validation.py:20 make_deterministic_sort_key):
    concatenate every column as text, append a seed-derived salt, hash.
    Same data + same seed => same order, independent of file layout or
    partitioning — the precondition for any positional split.

    Returns (sorted_expr, key_name). Scale: the sort is one global
    shuffle; when only a split ASSIGNMENT is needed, prefer the
    shuffle-free hash-bucket splits (calc_split_column)."""
    from xorq_spark.expr.deferred import Col, Deferred, Func, Lit, unwrap

    key_name = "__sort_key"
    cols = expr.columns
    concat = Func(
        "concat_ws",
        (",", *[unwrap(Deferred(Col(c)).cast("string")) for c in cols]),
    )
    salted = Func("concat", (concat, Lit(str(random_seed))))
    key = Deferred(Func("md5", (salted,)))
    return expr.mutate(**{key_name: key}).order_by(key_name), key_name


def leakage_safe_split(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    test_sizes: Sequence[float] = (0.25, 0.75),
    labels: Sequence[str] = ("test", "train"),
    num_buckets: int = 10000,
    num_hashes: int = 16,
    bands: int = 4,
    k: int = 3,
    threshold: float = 0.2,
) -> DataFrame:
    """Near-duplicate-aware train/test split: the classic
    train-eval contamination guard. A plain per-document hash split
    puts near-copies of the same text on BOTH sides of the boundary,
    leaking eval content into training; here the split key is the
    document's near-dup GROUP (MinHash-LSH pairs -> connected
    components -> min-id canonical), so every member of a duplicate
    cluster lands in the same partition by construction.

    Returns (id_col, group_id, split). Deterministic end to end:
    minhash, banding, components, and the Knuth-mix bucket hash are
    all pure functions of the text/ids.

    Scale: exactly the certified near-dedup pipeline (digest-only
    shuffles, bucket-local pair generation, O(log^2 n)
    star-contraction components) plus one hash expression — no new
    shuffle beyond the components it already computes."""
    from xorq_spark.functions.dedup import (
        connected_components,
        minhash_lsh_pairs,
    )

    pairs = minhash_lsh_pairs(
        df, text_col, id_col,
        num_hashes=num_hashes, bands=bands, k=k, threshold=threshold,
    )
    comp = connected_components(pairs, "id_a", "id_b").select(
        F.col("node").alias("__node"), F.col("component").alias("__comp")
    )
    grouped = (
        df.select(F.col(id_col))
        .join(comp, F.col(id_col) == F.col("__node"), "left")
        .select(
            id_col,
            F.coalesce(F.col("__comp"), F.col(id_col)).alias("group_id"),
        )
    )
    return grouped.withColumn(
        "split",
        calc_split_column("group_id", list(test_sizes), num_buckets, labels),
    )
