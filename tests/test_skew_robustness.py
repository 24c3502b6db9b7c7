"""Heavy-skew robustness: the dedup/text/agg queries must stay
ORACLE-EQUAL when the data is pathologically skewed — 60% of documents
share one boilerplate text (the LSH worst case: one giant bucket per
band) and 60% of orders hit one customer (the shuffle-join worst case).

This is the local-scale proxy for the 100 TB concern: a skewed key must
neither change results (bucket caps have to cut the SAME candidates in
both engines — i.e. only affect what both would emit) nor blow up
(the capped pipeline still finishes; AQE splits the skewed join)."""

from __future__ import annotations

import os
import shutil
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))

from check_oracle import frame_fingerprint  # noqa: E402

from xorq_spark.queries import ORACLES, QUERIES  # noqa: E402

SRC = "/root/testdata/sf0.001"

TEXT_CHECK = [
    "dedup_exact_text",
    "dedup_minhash_signatures",
    "dedup_minhash_lsh_pairs",
    "dedup_simhash",
    "dedup_ngram_jaccard_pairs",
    "text_quality_score",
    "text_fingerprint",
    "text_chunk_documents",
    "text_stratified_sample",
    "text_source_cap",
    "text_line_dedup",
    "dedup_dup_ngram_fraction",
    "text_tfidf_topk",
    # round 5 (cont.): 60% identical boilerplate = one giant hot gram
    # digest for the stride-1 span detector — its worst skew case
    "dedup_exact_substring",
    "dedup_strip_spans",
    "text_pmi_collocations",
    # round 5 (cont.): B-cubed — boilerplate collapses gold clusters
    # into one giant cell; the cell-count algebra must not overflow
    "dedup_bcubed_eval",
    # round 7: 60% identical boilerplate = one hot span digest carrying
    # 60% of all docs; frequency must come from a combinable aggregate,
    # not a digest-keyed window (de-skew fix, dedup.py dup_span_detect)
    "dedup_dup_span_detect",
    # round 7: scan-stage quality scorers must survive boilerplate text
    "text_readability",
    "text_code_detect",
    "text_mojibake_detect",
    "text_mojibake_repair",
    "text_unicode_normalize",
    "text_sentence_split",
]
KEY_CHECK = [
    "tpch_q13_customer_distribution",
    "tpch_q18_large_volume_customer",
    "agg_group_concat_collect",
    # round 5 (cont.): concentration readout ON the concentrated key —
    # the hot customer owns 60% of orders; Gini/HHI must agree exactly
    "agg_gini_hhi",
]


@pytest.fixture(scope="module")
def skewed_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("skewed_sf"))
    con = duckdb.connect()
    # 60% of documents: identical boilerplate text (single giant LSH
    # bucket in every band); 60% of orders: one hot customer key.
    con.sql(
        f"""
        COPY (
          SELECT * REPLACE (
            CASE WHEN doc_id % 5 < 3
                 THEN 'click here to accept cookies and subscribe to our newsletter today'
                 ELSE text END AS text)
          FROM '{SRC}/documents.parquet'
        ) TO '{d}/documents.parquet' (FORMAT parquet)
        """
    )
    con.sql(
        f"""
        COPY (
          SELECT * REPLACE (
            CASE WHEN o_orderkey % 5 < 3
                 THEN (SELECT MIN(o_custkey) FROM '{SRC}/orders.parquet')
                 ELSE o_custkey END AS o_custkey)
          FROM '{SRC}/orders.parquet'
        ) TO '{d}/orders.parquet' (FORMAT parquet)
        """
    )
    for t in "region nation customer supplier part lineitem events embeddings".split():
        shutil.copy(f"{SRC}/{t}.parquet", f"{d}/{t}.parquet")
    return d


def _compare(spark, sf_dir, name):
    sdf = QUERIES[name](spark, sf_dir)
    srows = [tuple(r) for r in sdf.collect()]
    scols = list(sdf.columns)

    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split():
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    rel = con.sql(ORACLES[name])
    drows = rel.fetchall()
    dcols = list(rel.columns)

    assert len(srows) == len(drows), (name, len(srows), len(drows))
    assert sorted(scols) == sorted(dcols)
    sh, _ = frame_fingerprint(scols, srows)
    dh, _ = frame_fingerprint(dcols, drows)
    assert sh == dh, f"value hash mismatch on skewed input for {name}"


@pytest.mark.parametrize("name", TEXT_CHECK)
def test_oracle_parity_with_boilerplate_skew(spark, skewed_dir, name):
    _compare(spark, skewed_dir, name)


@pytest.mark.parametrize("name", KEY_CHECK)
def test_oracle_parity_with_hot_key(spark, skewed_dir, name):
    _compare(spark, skewed_dir, name)


def test_salted_join_equals_plain_on_hot_key(spark, skewed_dir):
    """The explicit salting operator (pre-AQE insurance for a known-hot
    key) gives byte-identical results to the plain shuffle join on the
    skewed orders table."""
    import pyspark.sql.functions as F

    from xorq_spark.operators.skew import salted_join

    orders = spark.read.parquet(f"{skewed_dir}/orders.parquet")
    cust = spark.read.parquet(f"{skewed_dir}/customer.parquet").withColumnRenamed(
        "c_custkey", "o_custkey"
    )
    plain = (
        orders.join(cust, "o_custkey")
        .groupBy("o_custkey")
        .agg(F.count("*").alias("n"))
    )
    salted = (
        salted_join(orders, cust, "o_custkey", factor=8)
        .groupBy("o_custkey")
        .agg(F.count("*").alias("n"))
    )
    a = sorted(tuple(r) for r in plain.collect())
    b = sorted(tuple(r) for r in salted.collect())
    assert a == b
