"""Collection-type coverage (SURVEY §2.3 arrays/maps/structs/JSON +
§2.2 TableUnnest): array construction and algebra, higher-order
functions (transform/filter/aggregate), explode/posexplode, sequences,
map ops, struct pack/unpack, JSON extraction.

Parity notes: set-like array ops (distinct/union/intersect/except) have
unspecified element order in one or both engines -> always sorted before
output. Spark posexplode is 0-based; the DuckDB oracle zips
unnest(list) with unnest(range(len)) which is 0-based too.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from xorq_spark.queries.base import query, t


def _words():
    return F.split(F.col("text"), " ")


@query(
    "coll_array_basics",
    oracle="""
    WITH w AS (SELECT doc_id, str_split(text, ' ') AS words FROM documents)
    SELECT doc_id,
           len(words) AS n_words,
           words[1] AS first_word,
           words[-1] AS last_word,
           words[2:4] AS mid_slice,
           list_contains(words, 'data') AS has_data,
           coalesce(list_position(words, 'data'), 0) AS data_pos,
           list_sort(list_distinct(words)) AS vocab,
           len(list_distinct(words)) AS n_vocab,
           array_to_string(words[1:3], '-') AS head_join
    FROM w ORDER BY doc_id
    """,
)
def coll_array_basics(spark, sf_dir):
    w = _words()
    return (
        t(spark, sf_dir, "documents")
        .select(
            "doc_id",
            F.size(w).alias("n_words"),
            F.element_at(w, 1).alias("first_word"),
            F.element_at(w, -1).alias("last_word"),
            F.slice(w, 2, 3).alias("mid_slice"),
            F.array_contains(w, "data").alias("has_data"),
            F.array_position(w, "data").alias("data_pos"),
            F.array_sort(F.array_distinct(w)).alias("vocab"),
            F.size(F.array_distinct(w)).alias("n_vocab"),
            F.array_join(F.slice(w, 1, 3), "-").alias("head_join"),
        )
        .orderBy("doc_id")
    )


@query(
    "coll_array_algebra",
    oracle="""
    WITH w AS (
      SELECT doc_id,
             list_sort(list_distinct(str_split(text, ' '))) AS a,
             ['data','table','row','scan','xyz'] AS b
      FROM documents)
    SELECT doc_id,
           list_sort(list_distinct(list_concat(a, b))) AS unioned,
           list_sort(list_filter(b, x -> list_contains(a, x))) AS intersected,
           list_sort(list_filter(b, x -> NOT list_contains(a, x))) AS excepted,
           list_sort(list_concat(a[1:2], b[1:2])) AS concatenated
    FROM w ORDER BY doc_id
    """,
)
def coll_array_algebra(spark, sf_dir):
    """ArrayUnion/Intersect/Except/Concat (arrays.py:69,186,197) — sorted
    output because element order of the set ops is engine-specific."""
    d = t(spark, sf_dir, "documents").select(
        "doc_id",
        F.array_sort(F.array_distinct(_words())).alias("a"),
        F.array([F.lit(x) for x in ["data", "table", "row", "scan", "xyz"]]).alias("b"),
    )
    return d.select(
        "doc_id",
        F.array_sort(F.array_union("a", "b")).alias("unioned"),
        F.array_sort(F.array_intersect("b", "a")).alias("intersected"),
        F.array_sort(F.array_except("b", "a")).alias("excepted"),
        F.array_sort(F.concat(F.slice("a", 1, 2), F.slice("b", 1, 2))).alias("concatenated"),
    ).orderBy("doc_id")


@query(
    "coll_array_hof",
    oracle="""
    WITH w AS (SELECT doc_id, str_split(text, ' ') AS words FROM documents)
    SELECT doc_id,
           list_transform(words[1:5], x -> upper(x)) AS upper5,
           list_filter(words, x -> len(x) > 4) AS long_words,
           CAST(list_aggregate(list_transform(words, x -> len(x)), 'sum') AS BIGINT) AS total_chars,
           len(list_filter(words, x -> x = 'data')) AS n_data,
           list_aggregate(list_transform(words, x -> len(x)), 'max') AS max_len,
           list_aggregate(list_transform(words, x -> len(x)), 'min') AS min_len
    FROM w ORDER BY doc_id
    """,
)
def coll_array_hof(spark, sf_dir):
    """ArrayMap/ArrayFilter (arrays.py:93,108) and array aggregations
    (ArraySum/Min/Max, arrays.py:281-322) via HOFs — all JVM-side
    whole-stage-codegen lambdas, never Python."""
    w = _words()
    lens = F.transform(w, lambda x: F.length(x))
    return (
        t(spark, sf_dir, "documents")
        .select(
            "doc_id",
            F.transform(F.slice(w, 1, 5), lambda x: F.upper(x)).alias("upper5"),
            F.filter(w, lambda x: F.length(x) > 4).alias("long_words"),
            F.aggregate(lens, F.lit(0), lambda acc, x: acc + x).alias("total_chars"),
            F.size(F.filter(w, lambda x: x == "data")).alias("n_data"),
            F.array_max(lens).alias("max_len"),
            F.array_min(lens).alias("min_len"),
        )
        .orderBy("doc_id")
    )


@query(
    "coll_unnest_posexplode",
    oracle="""
    WITH w AS (SELECT doc_id, str_split(text, ' ')[1:8] AS words FROM documents WHERE doc_id < 50)
    SELECT doc_id,
           unnest(range(0, len(words))) AS pos,
           unnest(words) AS word
    FROM w ORDER BY doc_id, pos
    """,
)
def coll_unnest(spark, sf_dir):
    """TableUnnest with offset (relations.py:509) -> posexplode."""
    d = (
        t(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 50)
        .select("doc_id", F.slice(_words(), 1, 8).alias("words"))
    )
    return (
        d.select("doc_id", F.posexplode("words").alias("pos", "word"))
        .orderBy("doc_id", "pos")
    )


@query(
    "coll_sequence_zip",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           generate_series(1, l_linenumber) AS seq,
           list_transform(generate_series(1, l_linenumber), x -> x * 10) AS seq10,
           flatten([generate_series(1, 2), generate_series(1, l_linenumber)]) AS flat
    FROM lineitem WHERE l_orderkey < 100 ORDER BY l_orderkey, l_linenumber
    """,
)
def coll_sequence(spark, sf_dir):
    """IntegerRange/sequence (arrays.py:254), ArrayFlatten (arrays.py:228)."""
    n = F.col("l_linenumber")
    seq = F.sequence(F.lit(1), n)
    return (
        t(spark, sf_dir, "lineitem")
        .filter(F.col("l_orderkey") < 100)
        .select(
            "l_orderkey",
            "l_linenumber",
            seq.alias("seq"),
            F.transform(seq, lambda x: x * 10).alias("seq10"),
            F.flatten(F.array(F.sequence(F.lit(1), F.lit(2)), seq)).alias("flat"),
        )
        .orderBy("l_orderkey", "l_linenumber")
    )


@query(
    "coll_map_ops",
    oracle="""
    WITH m AS (
      SELECT doc_id, map(['lang', 'source'], [lang, source]) AS meta FROM documents)
    SELECT doc_id,
           cardinality(meta) AS m_size,
           map_extract(meta, 'lang')[1] AS lang_val,
           coalesce(map_extract(meta, 'missing')[1], 'none') AS missing_val,
           list_sort(map_keys(meta)) AS keys_sorted,
           list_sort(map_values(meta)) AS vals_sorted,
           list_contains(map_keys(meta), 'lang') AS has_lang
    FROM m ORDER BY doc_id
    """,
)
def coll_map_ops(spark, sf_dir):
    """Map ops (maps.py:14-87): build, length, get-with-default, keys,
    values, contains. DuckDB map access returns the value directly;
    element_at matches."""
    d = t(spark, sf_dir, "documents").select(
        "doc_id",
        F.map_from_arrays(
            F.array(F.lit("lang"), F.lit("source")),
            F.array(F.col("lang"), F.col("source")),
        ).alias("meta"),
    )
    return d.select(
        "doc_id",
        F.size("meta").alias("m_size"),
        F.element_at("meta", F.lit("lang")).alias("lang_val"),
        F.coalesce(F.element_at("meta", F.lit("missing")), F.lit("none")).alias("missing_val"),
        F.array_sort(F.map_keys("meta")).alias("keys_sorted"),
        F.array_sort(F.map_values("meta")).alias("vals_sorted"),
        F.array_contains(F.map_keys("meta"), "lang").alias("has_lang"),
    ).orderBy("doc_id")


@query(
    "coll_struct_pack_unpack",
    oracle="""
    WITH s AS (
      SELECT o_orderkey,
             {'status': o_orderstatus, 'price': o_totalprice, 'key': o_orderkey} AS rec
      FROM orders)
    SELECT o_orderkey,
           rec.status AS status,
           CAST(rec.price AS DOUBLE) AS price,
           rec.key % 7 AS key_mod
    FROM s ORDER BY o_orderkey
    """,
)
def coll_struct(spark, sf_dir):
    """StructColumn / StructField (structs.py:15,35) + unpack
    (types/relations.py:2638)."""
    d = t(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.struct(
            F.col("o_orderstatus").alias("status"),
            F.col("o_totalprice").alias("price"),
            F.col("o_orderkey").alias("key"),
        ).alias("rec"),
    )
    return d.select(
        "o_orderkey",
        F.col("rec.status").alias("status"),
        F.col("rec.price").cast("double").alias("price"),
        (F.col("rec.key") % 7).alias("key_mod"),
    ).orderBy("o_orderkey")


@query(
    "coll_json_extract",
    oracle="""
    SELECT event_id,
           json_extract_string(props, '$.k') AS k_str,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_int,
           CAST(json_extract_string(props, '$.k') AS BIGINT) IS NOT NULL AS has_k,
           json_extract_string(props, '$.missing') AS missing
    FROM events ORDER BY event_id
    """,
)
def coll_json(spark, sf_dir):
    """JSONGetItem / UnwrapJSON* (json.py:14-81) -> get_json_object +
    casts (the reference models JSON as string the same way)."""
    p = F.col("props")
    return (
        t(spark, sf_dir, "events")
        .select(
            "event_id",
            F.get_json_object(p, "$.k").alias("k_str"),
            F.get_json_object(p, "$.k").cast("bigint").alias("k_int"),
            F.get_json_object(p, "$.k").cast("bigint").isNotNull().alias("has_k"),
            F.get_json_object(p, "$.missing").alias("missing"),
        )
        .orderBy("event_id")
    )


@query(
    "coll_variant_extract",
    oracle="""
    WITH j AS (
      SELECT event_id,
             '{"u":' || CAST(user_id AS VARCHAR) || ',"t":"' || event_type ||
             '","tags":[' || CAST(event_id % 5 AS VARCHAR) || ',' ||
             CAST(user_id % 7 AS VARCHAR) || ']}' AS payload
      FROM events)
    SELECT event_id,
           CAST(json_extract(payload, '$.u') AS BIGINT) AS u,
           json_extract_string(payload, '$.t') AS t,
           CAST(json_extract(payload, '$.tags[1]') AS BIGINT) AS tag1,
           CAST(json_extract(payload, '$.missing') AS BIGINT) AS missing,
           CAST(json_array_length(json_extract(payload, '$.tags')) AS BIGINT)
             AS n_tags
    FROM j ORDER BY event_id
    """,
)
def coll_variant_extract(spark, sf_dir):
    """Spark 4 VARIANT ingestion: parse_json -> variant_get typed path
    extraction (the open-ended semi-structured column type that
    replaces string-JSON get_json_object; binary-encoded, so repeated
    path access skips re-parsing text — the 100 TB telemetry shape).
    The JSON text is constructed with identical concat on both
    engines; extraction must agree on typed paths, array indexing,
    missing-path NULL, and array cardinality."""
    ev = t(spark, sf_dir, "events")
    payload = F.concat(
        F.lit('{"u":'), F.col("user_id").cast("string"),
        F.lit(',"t":"'), F.col("event_type"),
        F.lit('","tags":['), (F.col("event_id") % 5).cast("string"),
        F.lit(","), (F.col("user_id") % 7).cast("string"), F.lit("]}"),
    )
    v = F.parse_json(payload)
    return (
        ev.select("event_id", v.alias("v"))
        .select(
            "event_id",
            F.variant_get(F.col("v"), "$.u", "bigint").alias("u"),
            F.variant_get(F.col("v"), "$.t", "string").alias("t"),
            F.variant_get(F.col("v"), "$.tags[1]", "bigint").alias("tag1"),
            F.try_variant_get(F.col("v"), "$.missing", "bigint").alias("missing"),
            F.expr("CAST(array_size(variant_get(v, '$.tags', 'array<variant>')) AS BIGINT)").alias("n_tags"),
        )
        .orderBy("event_id")
    )
