"""Registry + shared helpers for the correctness-query catalog."""

from __future__ import annotations

import os
from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession
import pyspark.sql.functions as F

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def query(name: str, oracle: Optional[str] = None):
    """Register a correctness query; `oracle` is DuckDB SQL over the same
    parquet tables (pre-registered views named as in TABLES)."""

    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


import weakref

# session -> {(sf_dir, name): DataFrame}; weak keys so a stopped session
# releases its entries (and a recycled object address can't serve stale
# frames, as an id(spark)-keyed dict would).
_TABLE_MEMO: "weakref.WeakKeyDictionary" = weakref.WeakKeyDictionary()


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one test table. Plain parquet scan — Catalyst handles column
    pruning + predicate pushdown from whatever the query composes on top.

    events.parquet carries TIMESTAMP(NANOS) which the Spark parquet reader
    rejects outright; we read nanos as int64 (runtime-settable legacy
    conf) and truncate to microsecond timestamp_ntz with integer `div`
    (matching DuckDB's ns->us truncation — float division would round and
    drift by 1us). Session tz pinned to UTC so the LTZ->NTZ cast is
    value-preserving regardless of driver-session defaults."""
    # Pin UTC on whatever session the driver hands us: every LTZ<->NTZ
    # conversion in the catalog (unix_micros, timestamp_seconds, ...)
    # must be timezone-free to match the DuckDB oracle.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    # Memoize the analyzed relation per (session, path): repeated reads
    # of the same immutable test table skip re-listing the directory and
    # re-reading parquet footers (~50-100 ms per table per query, pure
    # driver-side overhead at any scale).
    try:
        per_session = _TABLE_MEMO.setdefault(spark, {})
    except TypeError:  # session not weakref-able: skip memoization
        per_session = {}
    key = (sf_dir, name)
    hit = per_session.get(key)
    if hit is not None:
        return hit
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        if dict(df.dtypes).get("ts") == "bigint":
            df = df.withColumn(
                "ts",
                F.timestamp_micros(F.expr("ts div 1000")).cast("timestamp_ntz"),
            )
    else:
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    per_session[key] = df
    return df


def widen(df: DataFrame) -> DataFrame:
    """Repartition to cluster parallelism before a compute-bound narrow
    pipeline.

    A small parquet file (or one big row group) scans as ONE input
    split, serializing per-row compute (hashing, tokenization, UDFs) on
    a single core no matter how many are free. A round-robin
    repartition moves the rows once — cheap relative to the compute —
    and restores full parallelism. Row-preserving, so oracle results
    are unaffected.

    Scale-conditional (round 9): a repartition is NOT free at scale —
    it shuffles every projected row — so when the input already scans
    at cluster parallelism (the normal many-split case at real data
    sizes) this is a true no-op and the plan is returned unchanged.
    Only an under-parallel scan (fewer splits than cores) pays the
    rebalance, which is exactly when it wins.

    Round 10: the split count is derived from the scan's file sizes
    (operators.partitioning.scan_splits) instead of probing
    ``df.rdd.getNumPartitions()`` — the RDD probe forced a physical
    planning pass per call and, under AQE, eagerly executed the
    upstream stages of any exchange-bearing input. Non-file inputs are
    treated as already wide (the scale-safe default)."""
    from xorq_spark.operators.partitioning import widen as _widen

    return _widen(df)


def pinned_order(df: DataFrame, *cols) -> DataFrame:
    """Pin a compute pipeline's output before the final global sort
    (guide §1.4/§2.4): ``orderBy`` plans a range exchange whose
    RangePartitioner SAMPLING pass reads EVERY row of the child RDD —
    re-executing all work above the last shuffle. For a pipeline whose
    cost sits between that shuffle (or the scan) and the sort — regex
    chains, Arrow/pandas stages, HOF analysis, broadcast-only joins —
    the whole stage runs TWICE per action. The lazy localCheckpoint
    materializes the result rows once inside the same job chain; the
    sampler and the sort then read the pinned RDD. Row content and
    final order are bit-identical (same orderBy). Applied ONLY where
    the re-executed span is measurably expensive: the pin stores the
    (result-sized) frame, which costs memory/disk — near-dup banding
    joins, e.g., measured slower pinned because their sampler already
    reuses shuffle outputs. XORQ_PIN_ORDER=0 restores plain orderBy
    (A/B hook)."""
    if os.environ.get("XORQ_PIN_ORDER", "1") == "0":
        return df.orderBy(*cols)
    return df.localCheckpoint(eager=False).orderBy(*cols)


def dec(col, scale: int = 2):
    """Cast a double money column to decimal for order-independent exact
    aggregation (see oracle-parity note: double sums are
    accumulation-order dependent; decimal sums are exact and match DuckDB
    bit-for-bit; final outputs get cast back to double)."""
    return F.col(col).cast(f"decimal(18,{scale})") if isinstance(col, str) else col.cast(f"decimal(18,{scale})")


def as_double(c):
    return c.cast("double")


def money_out(c):
    """Final output form for exact decimal aggregates: round the
    DECIMAL to 2 places, THEN cast to double (oracle mirror:
    CAST(ROUND(sum, 2) AS DOUBLE)).

    Accumulation stays decimal (order-independent, exact); only the
    OUTPUT converts. Emitting DECIMAL directly is not portable across
    engines' result representations (a DECIMAL(38,10) output hash-
    mismatched the driver on every money query even though values were
    identical). The ORDER of round-vs-cast matters: scale-6 sums like
    disc_price can land exactly on a .5 tie (q9 at sf0.1 hit
    ...789.615000), where cast-first diverges — Spark's round(double)
    re-derives '.615' from the shortest repr and rounds up while
    DuckDB rounds the binary value just below the tie. Round-on-decimal
    is tie-exact half-away-from-zero in BOTH engines, and the resulting
    2-dp decimal converts to the identical nearest double (verified
    bitwise over 250k random values; DuckDB divides rather than
    multiplying by 1e-2, so conversion is correctly rounded like
    Java's BigDecimal.doubleValue)."""
    return F.round(c, 2).cast("double")


def ratio(num, den, digits: int = 9):
    """Portable ratio output: double division rounded to `digits`.

    Inputs may be decimals that convert to double with <=1 ulp skew, so a
    final round at 1e-9 collapses any residual difference (values here
    are <1e6; boundary collisions are measure-zero)."""
    return F.round(num.cast("double") / den.cast("double"), digits)
