"""Null-text robustness: the text/dedup queries must stay ORACLE-EQUAL
(not just not-crash) when documents carry NULL text/lang — both engines
must drop/propagate nulls identically."""

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
CHECK = [
    "text_readability",
    "text_code_detect",
    "text_mojibake_detect",
    "text_mojibake_repair",
    "text_unicode_normalize",
    "text_sentence_split",
    "dedup_exact_text",
    "dedup_minhash_signatures",
    "dedup_minhash_lsh_pairs",
    "dedup_simhash",
    "text_quality_score",
    "text_token_counts",
    "text_fingerprint",
    "text_rolling_hash",
    "text_language_id",
    "text_chunk_documents",
    "text_stratified_sample",
    "text_source_cap",
    "text_line_dedup",
    "dedup_dup_ngram_fraction",
    "text_gopher_flags",
    "text_tfidf_topk",
    # round 5 (cont.): ExactSubstr spans + rewrite, PMI collocations,
    # length batching (null text must count as 0 tokens identically)
    "dedup_exact_substring",
    "dedup_strip_spans",
    "text_pmi_collocations",
    "text_length_batching",
    # round 5 (cont.): B-cubed eval (null text excluded, null lang
    # coalesced — identically on both engines) + weight-mass quantiles
    "dedup_bcubed_eval",
    "agg_weighted_quantiles",
]


@pytest.fixture(scope="module")
def nulled_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("nulled_sf"))
    con = duckdb.connect()
    con.sql(
        f"""
        COPY (
          SELECT * REPLACE (
            CASE WHEN doc_id % 11 = 3 THEN NULL ELSE text END AS text,
            CASE WHEN doc_id % 13 = 5 THEN NULL ELSE lang END AS lang)
          FROM '{SRC}/documents.parquet'
        ) TO '{d}/documents.parquet' (FORMAT parquet)
        """
    )
    for t in "region nation customer supplier part orders lineitem events embeddings".split():
        shutil.copy(f"{SRC}/{t}.parquet", f"{d}/{t}.parquet")
    return d


@pytest.mark.parametrize("name", CHECK)
def test_oracle_parity_with_null_text(spark, nulled_dir, name):
    sdf = QUERIES[name](spark, nulled_dir)
    srows = [tuple(r) for r in sdf.collect()]
    scols = list(sdf.columns)

    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split():
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{nulled_dir}/{t}.parquet'")
    rel = con.sql(ORACLES[name])
    drows = rel.fetchall()
    dcols = list(rel.columns)

    assert len(srows) == len(drows), (len(srows), len(drows))
    assert sorted(scols) == sorted(dcols)
    sh, _ = frame_fingerprint(scols, srows)
    dh, _ = frame_fingerprint(dcols, drows)
    assert sh == dh, f"value hash mismatch on nulled input for {name}"
