"""Deferred-engine queries: the same oracle gate, but driven through
the product's own Expr layer (xorq_spark.expr) instead of raw PySpark —
proving the IR -> lowering -> Catalyst path end-to-end: deferred reads,
`_` expressions, joins, windows, params, raw-SQL views, pandas UDFs,
cache boundaries, and deferred split columns.
"""

from __future__ import annotations

import pandas as pd

import xorq_spark as xo
from xorq_spark import _
from xorq_spark.queries.base import query


@query(
    "engine_filter_agg",
    oracle="""
    SELECT l_returnflag,
           CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(18,2))), 2) AS DOUBLE) AS sum_qty,
           COUNT(*) AS n
    FROM lineitem
    WHERE l_quantity > 30 AND l_discount < 0.05
    GROUP BY l_returnflag ORDER BY l_returnflag
    """,
)
def engine_filter_agg(spark, sf_dir):
    """deferred_read_parquet -> filter -> group_by.agg via the Expr IR
    (the phase-0 end-to-end slice of SURVEY §7)."""
    li = xo.deferred_read_parquet(f"{sf_dir}/lineitem.parquet")
    e = (
        li.filter((_.l_quantity > 30) & (_.l_discount < 0.05))
        .group_by("l_returnflag")
        .agg(
            sum_qty=_.l_quantity.cast("decimal(18,2)").sum().round(2).cast("double"),
            n=_.l_returnflag.count(),
        )
        .order_by("l_returnflag")
    )
    return e.to_spark(spark)


@query(
    "engine_join_groupby",
    oracle="""
    SELECT o.o_orderpriority, COUNT(*) AS n,
           CAST(ROUND(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))), 2) AS DOUBLE) AS total
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE o.o_totalprice > 150000
    GROUP BY o.o_orderpriority ORDER BY o.o_orderpriority
    """,
)
def engine_join_groupby(spark, sf_dir):
    li = xo.deferred_read_parquet(f"{sf_dir}/lineitem.parquet")
    o = xo.deferred_read_parquet(f"{sf_dir}/orders.parquet").filter(
        _.o_totalprice > 150000
    )
    e = (
        li.join(o, [("l_orderkey", "o_orderkey")])
        .group_by("o_orderpriority")
        .agg(
            n=_.o_orderpriority.count(),
            total=_.l_extendedprice.cast("decimal(18,2)").sum().round(2).cast("double"),
        )
        .order_by("o_orderpriority")
    )
    return e.to_spark(spark)


@query(
    "engine_param_default",
    oracle="""
    SELECT COUNT(*) AS n FROM part WHERE p_size >= 25
    """,
)
def engine_param(spark, sf_dir):
    """Named scalar parameter bound from its default at lowering."""
    min_size = xo.param("min_size", "int64", default=25)
    e = (
        xo.deferred_read_parquet(f"{sf_dir}/part.parquet")
        .filter(_.p_size >= min_size)
        .aggregate(n=_.p_partkey.count())
    )
    return e.to_spark(spark)


@query(
    "engine_window_rank",
    oracle="""
    SELECT c_custkey, c_acctbal, rnk FROM (
      SELECT c_custkey, c_acctbal,
             RANK() OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey) AS rnk
      FROM customer) WHERE rnk <= 3
    ORDER BY c_custkey
    """,
)
def engine_window(spark, sf_dir):
    from xorq_spark.expr.deferred import Deferred, Func

    rnk = Deferred(Func("rank", ())).over(
        group_by=_.c_mktsegment,
        order_by=[_.c_acctbal.desc(), _.c_custkey.asc()],
    )
    e = (
        xo.deferred_read_parquet(f"{sf_dir}/customer.parquet")
        .mutate(rnk=rnk)
        .filter(_.rnk <= 3)
        .select("c_custkey", "c_acctbal", "rnk")
        .order_by("c_custkey")
    )
    return e.to_spark(spark)


@query(
    "engine_sql_view",
    oracle="""
    SELECT n_regionkey, COUNT(*) AS n FROM nation GROUP BY n_regionkey
    ORDER BY n_regionkey
    """,
)
def engine_sql(spark, sf_dir):
    """Raw-SQL escape hatch over a deferred expression (Table.sql)."""
    e = xo.deferred_read_parquet(f"{sf_dir}/nation.parquet").sql(
        "SELECT n_regionkey, COUNT(*) AS n FROM nations GROUP BY n_regionkey "
        "ORDER BY n_regionkey",
        alias="nations",
    )
    return e.to_spark(spark)


@query(
    "engine_pandas_udf",
    oracle="""
    SELECT s_suppkey, ROUND(s_acctbal * 2 + 1, 6) AS adjusted
    FROM supplier ORDER BY s_suppkey
    """,
)
def engine_udf(spark, sf_dir):
    """Arrow-vectorized scalar pandas UDF through the deferred layer."""
    from xorq_spark import udf

    @udf.scalar.pandas(dtype="double", name="adjust")
    def adjust(s: pd.Series) -> pd.Series:
        return s * 2 + 1

    e = (
        xo.deferred_read_parquet(f"{sf_dir}/supplier.parquet")
        .select("s_suppkey", adjusted=adjust(_.s_acctbal).round(6))
        .order_by("s_suppkey")
    )
    return e.to_spark(spark)


@query(
    "engine_split_deferred",
    oracle="""
    WITH s AS (
      SELECT c_custkey,
             CASE WHEN ((((0 * 31 + ('0x' || substr(md5(CAST(c_custkey AS VARCHAR)), 1, 8))::BIGINT)
                  % 2147483648) * 2654435761) % 4294967296) % 10000 < 2000 THEN 'test'
                  ELSE 'train' END AS split
      FROM customer)
    SELECT split, COUNT(*) AS n FROM s GROUP BY split ORDER BY split
    """,
)
def engine_split(spark, sf_dir):
    """expr_split_column: the deferred-AST flavor of the deterministic
    hash-bucket splitter (same formula as ml_train_test_split)."""
    from xorq_spark.ml import expr_split_column

    e = (
        xo.deferred_read_parquet(f"{sf_dir}/customer.parquet")
        .mutate(split=expr_split_column("c_custkey", [0.2, 0.8], 10000, ["test", "train"]))
        .group_by("split")
        .agg(n=_.split.count())
        .order_by("split")
    )
    return e.to_spark(spark)


@query(
    "engine_cached_subtree",
    oracle="""
    SELECT n_name, COUNT(*) AS n_suppliers
    FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey
    GROUP BY n_name ORDER BY n_name
    """,
)
def engine_cached(spark, sf_dir):
    """A CachedNode boundary inside the plan: first run materializes the
    joined subtree to the content-addressed Parquet store, replays read
    the artifact — results identical either way (which is what the
    oracle asserts)."""
    s = xo.deferred_read_parquet(f"{sf_dir}/supplier.parquet")
    n = xo.deferred_read_parquet(f"{sf_dir}/nation.parquet")
    joined = s.join(n, [("s_nationkey", "n_nationkey")]).cache()
    e = joined.group_by("n_name").agg(n_suppliers=_.n_name.count()).order_by("n_name")
    return e.to_spark(spark)


@query(
    "engine_selectors_across",
    oracle="""
    SELECT l_returnflag,
           ROUND(CAST(MAX(l_quantity) AS DOUBLE), 2) AS qty_max,
           ROUND(CAST(MIN(l_quantity) AS DOUBLE), 2) AS qty_min,
           ROUND(CAST(MAX(l_extendedprice) AS DOUBLE), 2) AS tot_max,
           ROUND(CAST(MIN(l_extendedprice) AS DOUBLE), 2) AS tot_min
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
)
def engine_selectors(spark, sf_dir):
    """Selectors API through the Expr layer (reference:
    expr/selectors.py / vendor ibis selectors): column sets chosen by
    selector, bulk-cast with across, then aggregated. Expansion is a
    driver-side schema walk, so the physical plan is identical to
    hand-listing the columns (scan prunes to 3 columns)."""
    from xorq_spark.expr import selectors as s

    li = xo.deferred_read_parquet(f"{sf_dir}/lineitem.parquet")
    e = (
        li.select(
            s.cols("l_returnflag"),
            s.across(
                s.numeric() & s.cols("l_quantity", "l_extendedprice"),
                _.cast("double"),
            ),
        )
        .group_by("l_returnflag")
        .agg(
            qty_max=_.l_quantity.max().round(2),
            qty_min=_.l_quantity.min().round(2),
            tot_max=_.l_extendedprice.max().round(2),
            tot_min=_.l_extendedprice.min().round(2),
        )
        .order_by("l_returnflag")
    )
    return e.to_spark(spark)


import pyspark.sql.functions as F  # noqa: E402

from xorq_spark.operators.layout import z_value, z_value_sql  # noqa: E402
from xorq_spark.queries.base import t  # noqa: E402

_Z_SQL = z_value_sql(["user_id", "event_id"], bits=10)


@query(
    "engine_zorder_keys",
    oracle=f"""
    SELECT event_id, {_Z_SQL} AS zkey
    FROM events ORDER BY event_id
    """,
)
def engine_zorder(spark, sf_dir):
    """Z-order (Morton) clustering keys (operators/layout.py z_value):
    the bit-interleave both engines must compute identically — the key
    zorder_by() range-partitions file writes on so multi-column scan
    predicates prune at rest. Pure static shift/mask expression tree,
    codegen'd, no shuffle."""
    ev = t(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        z_value([F.col("user_id"), F.col("event_id")], bits=10).alias("zkey"),
    ).orderBy("event_id")


@query(
    "engine_python_udtf",
    oracle="""
    WITH s AS (
      SELECT doc_id,
             lang || ' ' || source || ' len' || CAST(n_chars % 10 AS VARCHAR)
               AS tagline
      FROM documents)
    SELECT doc_id,
           unnest(string_split(tagline, ' ')) AS word,
           CAST(unnest(range(1, len(string_split(tagline, ' ')) + 1))
                AS BIGINT) AS pos
    FROM s ORDER BY doc_id, pos
    """,
)
def engine_python_udtf(spark, sf_dir):
    """Spark 4 native Python UDTF (udf.table.python): a per-row
    generator expanding each document's tagline into (word, position)
    rows via a LATERAL table-function join — the imperative flat-map
    surface (parsers/tokenizers) beside the declarative explode path.
    Arrow-batched row transfer; the oracle replays the expansion with
    zip-unnest, so a dropped/reordered yield breaks the hash."""
    from xorq_spark import udf

    @udf.table.python(returns="word string, pos bigint")
    def split_words(s):
        for i, w in enumerate(s.split(" ")):
            yield w, i + 1

    docs = t(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(
            F.col("lang"), F.lit(" "), F.col("source"), F.lit(" len"),
            (F.col("n_chars") % 10).cast("string"),
        ).alias("tagline"),
    )
    return (
        split_words.apply(docs, "tagline")
        .select("doc_id", "word", "pos")
        .orderBy("doc_id", "pos")
    )


@query(
    "engine_zonemap_prune",
    oracle="""
    WITH b AS (SELECT CAST(max(l_orderkey) // 4 AS BIGINT) AS lo,
                      CAST(max(l_orderkey) // 2 AS BIGINT) AS hi
               FROM lineitem),
    z AS (SELECT strftime(l_shipdate, '%Y-%m') AS shard,
                 CAST(count(*) AS BIGINT) AS n_rows,
                 CAST(min(l_orderkey) AS BIGINT) AS min_key,
                 CAST(max(l_orderkey) AS BIGINT) AS max_key,
                 CAST(min(l_quantity) AS BIGINT) AS min_qty,
                 CAST(max(l_quantity) AS BIGINT) AS max_qty
          FROM lineitem GROUP BY 1)
    SELECT z.shard, z.n_rows, z.min_key, z.max_key,
           CASE WHEN z.min_key <= b.hi AND z.max_key >= b.lo
                     AND z.max_qty >= 45
                THEN 1 ELSE 0 END AS scanned
    FROM z CROSS JOIN b ORDER BY z.shard
    """,
)
def engine_zonemap_prune(spark, sf_dir):
    """Zone-map (min/max statistics) file-skipping simulation — the
    data-layout feedback loop for 100 TB scans: per monthly shard,
    collect the min/max zonemap of (orderkey, quantity), then evaluate
    which shards a conjunctive range predicate (orderkey in the
    [max/4, max/2] band AND quantity >= 45) can SKIP without reading.
    The predicate band derives from the data (one scalar agg,
    broadcast), so the query is scale-invariant. One combinable
    stats pass — the same plan that builds real footer stats."""
    li = t(spark, sf_dir, "lineitem")
    b = li.agg(
        F.expr("CAST(max(l_orderkey) div 4 AS BIGINT)").alias("lo"),
        F.expr("CAST(max(l_orderkey) div 2 AS BIGINT)").alias("hi"),
    )
    z = li.groupBy(
        F.date_format("l_shipdate", "yyyy-MM").alias("shard")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.min("l_orderkey").cast("long").alias("min_key"),
        F.max("l_orderkey").cast("long").alias("max_key"),
        F.min("l_quantity").cast("long").alias("min_qty"),
        F.max("l_quantity").cast("long").alias("max_qty"),
    )
    return (
        z.crossJoin(F.broadcast(b))
        .select(
            "shard", "n_rows", "min_key", "max_key",
            F.when(
                (F.col("min_key") <= F.col("hi"))
                & (F.col("max_key") >= F.col("lo"))
                & (F.col("max_qty") >= 45),
                1,
            ).otherwise(0).cast("int").alias("scanned"),
        )
        .orderBy("shard")
    )
