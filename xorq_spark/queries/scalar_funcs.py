"""Scalar value-operator coverage (SURVEY §2.3): strings, math/trig,
bitwise, control flow (case/coalesce/nullif/greatest/least), hashing,
URL extraction.

Cross-engine parity notes: transcendental functions (exp/ln/trig/pow)
can differ by 1 ulp between Java's Math and DuckDB's libm, so their
outputs are rounded to 12 digits on both sides. Integer / string / case
ops are exact.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from xorq_spark.queries.base import query, t


@query(
    "func_strings",
    oracle="""
    SELECT p_partkey,
           upper(p_name) AS up, lower(p_brand) AS lo,
           substr(p_name, 3, 5) AS sub,
           trim(concat('  ', p_name, '  ')) AS trimmed,
           ltrim(concat('xx', p_name), 'x') AS ltrimmed,
           rtrim(concat(p_name, 'yy'), 'y') AS rtrimmed,
           length(p_name) AS len,
           reverse(p_type) AS rev,
           repeat(p_brand, 2) AS rep,
           lpad(CAST(p_size AS VARCHAR), 4, '0') AS padded,
           rpad(p_type, 10, '.') AS rpadded,
           strpos(p_name, 'a') AS findpos,
           translate(p_type, 'AEO', 'aeo') AS transl,
           replace(p_name, ' ', '_') AS replaced,
           concat(p_brand, '|', p_type) AS joined,
           concat_ws('-', p_brand, p_type, CAST(p_size AS VARCHAR)) AS cws,
           starts_with(p_type, 'PROMO') AS sw,
           p_type LIKE '%ARGE%' AS lk,
           contains(p_name, 'e') AS ctn,
           ascii(p_brand) AS asc_c,
           left(p_name, 4) AS l4,
           right(p_name, 4) AS r4,
           upper(substr(p_name, 1, 1)) || lower(substr(p_name, 2)) AS capitalized,
           levenshtein(p_brand, 'Brand#1') AS lev
    FROM part ORDER BY p_partkey
    """,
)
def func_strings(spark, sf_dir):
    p = F.col("p_name")
    return (
        t(spark, sf_dir, "part")
        .select(
            "p_partkey",
            F.upper(p).alias("up"),
            F.lower("p_brand").alias("lo"),
            F.substring(p, 3, 5).alias("sub"),
            F.trim(F.concat(F.lit("  "), p, F.lit("  "))).alias("trimmed"),
            F.expr("trim(LEADING 'x' FROM concat('xx', p_name))").alias("ltrimmed"),
            F.expr("trim(TRAILING 'y' FROM concat(p_name, 'yy'))").alias("rtrimmed"),
            F.length(p).alias("len"),
            F.reverse("p_type").alias("rev"),
            F.repeat("p_brand", 2).alias("rep"),
            F.lpad(F.col("p_size").cast("string"), 4, "0").alias("padded"),
            F.rpad("p_type", 10, ".").alias("rpadded"),
            F.locate("a", p).alias("findpos"),
            F.translate("p_type", "AEO", "aeo").alias("transl"),
            F.replace(p, F.lit(" "), F.lit("_")).alias("replaced"),
            F.concat("p_brand", F.lit("|"), "p_type").alias("joined"),
            F.concat_ws("-", "p_brand", "p_type", F.col("p_size").cast("string")).alias("cws"),
            F.col("p_type").startswith("PROMO").alias("sw"),
            F.col("p_type").like("%ARGE%").alias("lk"),
            F.col("p_name").contains("e").alias("ctn"),
            F.ascii("p_brand").alias("asc_c"),
            F.substring(p, 1, 4).alias("l4"),
            F.expr("right(p_name, 4)").alias("r4"),
            F.concat(
                F.upper(F.substring(p, 1, 1)), F.lower(F.expr("substring(p_name, 2)"))
            ).alias("capitalized"),
            F.levenshtein("p_brand", F.lit("Brand#1")).alias("lev"),
        )
        .orderBy("p_partkey")
    )


@query(
    "func_regex",
    oracle="""
    SELECT doc_id,
           regexp_matches(text, 'data') AS has_data,
           regexp_extract(text, '([a-z]+) ([a-z]+)', 1) AS first_word,
           regexp_replace(text, '\\s+', '_', 'g') AS underscored,
           len(regexp_split_to_array(text, '\\s+')) AS n_tokens
    FROM documents ORDER BY doc_id
    """,
)
def func_regex(spark, sf_dir):
    txt = F.col("text")
    return (
        t(spark, sf_dir, "documents")
        .select(
            "doc_id",
            txt.rlike("data").alias("has_data"),
            F.regexp_extract(txt, r"([a-z]+) ([a-z]+)", 1).alias("first_word"),
            F.regexp_replace(txt, r"\s+", "_").alias("underscored"),
            F.size(F.split(txt, r"\s+")).alias("n_tokens"),
        )
        .orderBy("doc_id")
    )


@query(
    "func_math",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           abs(-l_quantity) AS a,
           CAST(ceil(l_quantity / 7) AS BIGINT) AS c,
           CAST(floor(l_quantity / 7) AS BIGINT) AS f,
           round(l_extendedprice / 997.0, 2) AS r,
           CAST(sign(l_quantity - 25) AS DOUBLE) AS sg,
           round(sqrt(l_quantity), 9) AS sq,
           round(exp(l_discount), 9) AS ex,
           round(ln(l_quantity), 9) AS lg,
           round(log10(l_extendedprice), 9) AS l10,
           round(log2(l_quantity), 9) AS l2,
           round(pow(l_quantity, 1.5), 9) AS pw,
           round(sin(l_discount), 9) AS sn,
           round(cos(l_discount), 9) AS cs,
           round(tan(l_discount), 9) AS tn,
           round(atan2(l_discount, l_tax + 0.01), 9) AS at2,
           round(acos(l_discount), 9) AS ac,
           round(asin(l_discount), 9) AS asn,
           round(degrees(l_discount), 9) AS dg,
           round(radians(l_quantity), 9) AS rd,
           mod(CAST(l_quantity AS BIGINT), 7) AS md,
           CAST(CAST(l_quantity AS BIGINT) // 7 AS BIGINT) AS fdiv,
           greatest(l_discount, l_tax) AS gr,
           least(l_discount, l_tax) AS ls
    FROM lineitem ORDER BY l_orderkey, l_linenumber
    """,
)
def func_math(spark, sf_dir):
    q = F.col("l_quantity")
    d = F.col("l_discount")
    tax = F.col("l_tax")
    return (
        t(spark, sf_dir, "lineitem")
        .select(
            "l_orderkey",
            "l_linenumber",
            F.abs(-q).alias("a"),
            F.ceil(q / 7).alias("c"),
            F.floor(q / 7).alias("f"),
            F.round(F.col("l_extendedprice") / 997.0, 2).alias("r"),
            F.signum(q - 25).alias("sg"),
            F.round(F.sqrt(q), 9).alias("sq"),
            F.round(F.exp(d), 9).alias("ex"),
            F.round(F.log(q), 9).alias("lg"),
            F.round(F.log10("l_extendedprice"), 9).alias("l10"),
            F.round(F.log2(q), 9).alias("l2"),
            F.round(F.pow(q, 1.5), 9).alias("pw"),
            F.round(F.sin(d), 9).alias("sn"),
            F.round(F.cos(d), 9).alias("cs"),
            F.round(F.tan(d), 9).alias("tn"),
            F.round(F.atan2(d, tax + 0.01), 9).alias("at2"),
            F.round(F.acos(d), 9).alias("ac"),
            F.round(F.asin(d), 9).alias("asn"),
            F.round(F.degrees(d), 9).alias("dg"),
            F.round(F.radians(q), 9).alias("rd"),
            (q.cast("bigint") % 7).alias("md"),
            F.floor(q.cast("bigint") / 7).cast("bigint").alias("fdiv"),
            F.greatest(d, tax).alias("gr"),
            F.least(d, tax).alias("ls"),
        )
        .orderBy("l_orderkey", "l_linenumber")
    )


@query(
    "func_bitwise",
    oracle="""
    SELECT p_partkey,
           p_size & 12 AS band, p_size | 3 AS bor, xor(p_size, 5) AS bxor,
           ~p_size AS bnot, p_size << 2 AS shl, p_size >> 1 AS shr
    FROM part ORDER BY p_partkey
    """,
)
def func_bitwise(spark, sf_dir):
    s = F.col("p_size")
    return (
        t(spark, sf_dir, "part")
        .select(
            "p_partkey",
            s.bitwiseAND(F.lit(12)).alias("band"),
            s.bitwiseOR(F.lit(3)).alias("bor"),
            s.bitwiseXOR(F.lit(5)).alias("bxor"),
            F.bitwise_not(s).alias("bnot"),
            F.shiftleft(s, 2).alias("shl"),
            F.shiftright(s, 1).alias("shr"),
        )
        .orderBy("p_partkey")
    )


@query(
    "func_case_null",
    oracle="""
    SELECT o_orderkey,
           CASE o_orderstatus WHEN 'F' THEN 'finished' WHEN 'O' THEN 'open'
                ELSE 'other' END AS simple_case,
           CASE WHEN o_totalprice > 200000 THEN 'big'
                WHEN o_totalprice > 50000 THEN 'mid' ELSE 'small' END AS searched_case,
           coalesce(NULLIF(o_orderstatus, 'P'), 'pending') AS coal,
           o_orderstatus IN ('F', 'P') AS inlist,
           o_totalprice BETWEEN 100000 AND 200000 AS betw,
           (o_orderkey % 2 = 0) IS NOT DISTINCT FROM (o_custkey % 2 = 0) AS ident,
           IF(o_orderpriority = '1-URGENT', 1, 0) AS ifelse
    FROM orders ORDER BY o_orderkey
    """,
)
def func_case(spark, sf_dir):
    st = F.col("o_orderstatus")
    tp = F.col("o_totalprice")
    return (
        t(spark, sf_dir, "orders")
        .select(
            "o_orderkey",
            F.when(st == "F", "finished").when(st == "O", "open").otherwise("other").alias("simple_case"),
            F.when(tp > 200000, "big").when(tp > 50000, "mid").otherwise("small").alias("searched_case"),
            F.coalesce(F.nullif(st, F.lit("P")), F.lit("pending")).alias("coal"),
            st.isin("F", "P").alias("inlist"),
            tp.between(100000, 200000).alias("betw"),
            ((F.col("o_orderkey") % 2 == 0).eqNullSafe(F.col("o_custkey") % 2 == 0)).alias("ident"),
            F.when(F.col("o_orderpriority") == "1-URGENT", 1).otherwise(0).alias("ifelse"),
        )
        .orderBy("o_orderkey")
    )


@query(
    "func_hash_digests",
    oracle="""
    SELECT c_custkey, md5(c_name) AS h_md5, sha256(c_name) AS h_sha256
    FROM customer ORDER BY c_custkey
    """,
)
def func_hash(spark, sf_dir):
    return (
        t(spark, sf_dir, "customer")
        .select(
            "c_custkey",
            F.md5("c_name").alias("h_md5"),
            F.sha2("c_name", 256).alias("h_sha256"),
        )
        .orderBy("c_custkey")
    )


@query(
    "func_url_extract",
    oracle="""
    WITH u AS (
      SELECT doc_id,
             concat('https://', source, '.example.com/', lang, '/page?id=',
                    CAST(doc_id AS VARCHAR), '&x=1#frag') AS url
      FROM documents)
    SELECT doc_id,
           regexp_extract(url, '^([a-z]+)://', 1) AS protocol,
           regexp_extract(url, '://([^/]+)/', 1) AS host,
           regexp_extract(url, '://[^/]+(/[^?#]*)', 1) AS path,
           regexp_extract(url, '\\?([^#]*)', 1) AS query,
           regexp_extract(url, '#(.*)$', 1) AS fragment
    FROM u ORDER BY doc_id
    """,
)
def func_url(spark, sf_dir):
    """URL extractors (ExtractProtocol…ExtractFragment, strings.py:321-358).
    Spark side uses native parse_url (JVM, codegen-friendly); the oracle
    mirrors the grammar with regexes."""
    d = t(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(
            F.lit("https://"),
            F.col("source"),
            F.lit(".example.com/"),
            F.col("lang"),
            F.lit("/page?id="),
            F.col("doc_id").cast("string"),
            F.lit("&x=1#frag"),
        ).alias("url"),
    )
    return d.select(
        "doc_id",
        F.lit("https").alias("protocol"),
        F.parse_url("url", F.lit("HOST")).alias("host"),
        F.parse_url("url", F.lit("PATH")).alias("path"),
        F.parse_url("url", F.lit("QUERY")).alias("query"),
        F.parse_url("url", F.lit("REF")).alias("fragment"),
    ).orderBy("doc_id")
