"""Unicode-text robustness: accented latin, CJK, emoji, RTL and mixed
scripts must produce ORACLE-EQUAL results — Java regex (Spark) and RE2
(DuckDB) disagree on some character classes, and any divergence in
normalize/tokenize silently breaks cross-engine dedup keys."""

from __future__ import annotations

import os
import sys

import duckdb
import pandas as pd
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))

from check_oracle import frame_fingerprint  # noqa: E402

from xorq_spark.queries import ORACLES, QUERIES  # noqa: E402

SRC = "/root/testdata/sf0.001"
TEXTS = [
    "café naïve déjà-vu straße",
    "北京欢迎你 machine learning 研究",
    "مرحبا بالعالم hello world",
    "emoji soup 🚀🔥 and commas, plus.dots!",
    "ＦＵＬＬＷＩＤＴＨ ｔｅｘｔ ascii mix",
    "tab\tand\nnewline   runs",
    "café naïve déjà-vu straße",  # exact dup of row 0 (dedup must hit)
]
CHECK = [
    "text_readability",
    "text_code_detect",
    "text_mojibake_detect",
    "text_mojibake_repair",
    "text_unicode_normalize",
    "text_sentence_split",
    "dedup_exact_text",
    "dedup_minhash_lsh_pairs",
    "text_token_counts",
    "text_fingerprint",
    "text_quality_score",
    "text_chunk_documents",
    "text_source_cap",
    "text_line_dedup",
    "dedup_dup_ngram_fraction",
    "text_gopher_flags",
    "text_tfidf_topk",
    # round 5 (cont.): char-position ops must count code points
    # identically across engines on mixed-script text
    "dedup_exact_substring",
    "dedup_strip_spans",
    "text_pmi_collocations",
    "text_length_batching",
]


@pytest.fixture(scope="module")
def unicode_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("unicode_sf"))
    base = pd.read_parquet(f"{SRC}/documents.parquet")
    inject = base.head(len(TEXTS)).copy()
    inject["text"] = TEXTS
    inject["doc_id"] = range(100000, 100000 + len(TEXTS))
    pd.concat([base, inject]).to_parquet(f"{d}/documents.parquet", index=False)
    for t in "region nation customer supplier part orders lineitem events embeddings".split():
        os.symlink(f"{SRC}/{t}.parquet", f"{d}/{t}.parquet")
    return d


@pytest.mark.parametrize("name", CHECK)
def test_oracle_parity_with_unicode(spark, unicode_dir, name):
    sdf = QUERIES[name](spark, unicode_dir)
    srows = [tuple(r) for r in sdf.collect()]
    scols = list(sdf.columns)

    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split():
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{unicode_dir}/{t}.parquet'")
    rel = con.sql(ORACLES[name])
    drows = rel.fetchall()
    dcols = list(rel.columns)

    assert len(srows) == len(drows), (len(srows), len(drows))
    assert sorted(scols) == sorted(dcols)
    sh, slines = frame_fingerprint(scols, srows)
    dh, dlines = frame_fingerprint(dcols, drows)
    if sh != dh:
        diffs = [(a, b) for a, b in zip(slines, dlines) if a != b][:3]
        pytest.fail(f"unicode divergence in {name}: {diffs}")
