"""Porter stemmer: published-pair spec tests, differential fuzz of the
two independent implementations (Python vs generated DuckDB SQL), and
the Spark-side stemmed-docs view."""

from __future__ import annotations

import itertools

import duckdb
import pytest

from xorq_spark.functions.stem import (
    ALPHA_TOKENS_SQL,
    porter_sql_ctes,
    porter_stem,
    stemmed_docs,
)

# (word, stem) pairs from Porter 1980 (the paper's worked examples for
# every step) plus classic edge cases.
KNOWN = {
    # step 1a
    "caresses": "caress", "ponies": "poni", "ties": "ti", "caress": "caress",
    "cats": "cat",
    # step 1b + cleanup
    "feed": "feed", "agreed": "agre", "plastered": "plaster", "bled": "bled",
    "motoring": "motor", "sing": "sing", "conflated": "conflat",
    "troubled": "troubl", "sized": "size", "hopping": "hop", "tanned": "tan",
    "falling": "fall", "hissing": "hiss", "fizzed": "fizz",
    "failing": "fail", "filing": "file",
    # step 1c
    "happy": "happi", "sky": "sky",
    # step 2
    "relational": "relat", "conditional": "condit", "rational": "ration",
    "valenci": "valenc", "hesitanci": "hesit", "digitizer": "digit",
    "conformabli": "conform", "radicalli": "radic", "differentli": "differ",
    "vileli": "vile", "analogousli": "analog",
    "vietnamization": "vietnam", "predication": "predic", "operator": "oper",
    "feudalism": "feudal", "decisiveness": "decis", "hopefulness": "hope",
    "callousness": "callous", "formaliti": "formal", "sensitiviti": "sensit",
    "sensibiliti": "sensibl",
    # step 3
    "triplicate": "triplic", "formative": "form", "formalize": "formal",
    "electriciti": "electr", "electrical": "electr", "hopeful": "hope",
    "goodness": "good",
    # step 4
    "revival": "reviv", "allowance": "allow", "inference": "infer",
    "airliner": "airlin", "gyroscopic": "gyroscop", "adjustable": "adjust",
    "defensible": "defens", "irritant": "irrit", "replacement": "replac",
    "adjustment": "adjust", "dependent": "depend", "adoption": "adopt",
    "homologou": "homolog", "communism": "commun", "activate": "activ",
    "angulariti": "angular", "homologous": "homolog", "effective": "effect",
    "bowdlerize": "bowdler",
    # step 5
    "probate": "probat", "rate": "rate", "cease": "ceas",
    "controll": "control", "roll": "roll",
    # short-word guard and y rules
    "a": "a", "at": "at", "is": "is", "by": "by", "yes": "ye",
    "syzygy": "syzygi",
}


def test_known_pairs():
    bad = {w: (porter_stem(w), e) for w, e in KNOWN.items()
           if porter_stem(w) != e}
    assert not bad, bad


def test_idempotent_on_short():
    for w in ("", "a", "ab"):
        assert porter_stem(w) == w


@pytest.fixture(scope="module")
def con():
    return duckdb.connect()


def _sql_stems(con, words):
    con.execute("create or replace table v(word varchar)")
    con.executemany("insert into v values (?)", [(w,) for w in words])
    sql = ("WITH base AS (SELECT word FROM v),"
           + porter_sql_ctes("base", "word")
           + " SELECT word, stem FROM pstem")
    return dict(con.execute(sql).fetchall())


def test_sql_matches_python_on_known(con):
    res = _sql_stems(con, list(KNOWN))
    bad = {w: (porter_stem(w), res[w]) for w in KNOWN
           if porter_stem(w) != res[w]}
    assert not bad, bad


def test_sql_matches_python_fuzz(con):
    # bounded slice of the 112k-word exhaustive sweep run during
    # development (alphabet chosen to hit vowel/y/double-consonant and
    # every suffix family); full cross-product kept out of CI time.
    alpha = "belsty"
    words = ["".join(p) for L in (1, 2, 3, 4)
             for p in itertools.product(alpha, repeat=L)]
    roots = ("nation", "hope", "rol", "control", "sens")
    sufs = ("ational", "ization", "fulness", "entli", "ation", "enci",
            "izer", "abli", "eli", "icate", "ative", "ical", "ness",
            "ement", "ance", "ible", "ion", "ate", "al", "er",
            "e", "ll", "eed", "ed", "ing", "ies", "sses", "s", "y")
    words += [r + s for r in roots for s in sufs]
    words = sorted(set(words))
    res = _sql_stems(con, words)
    bad = [(w, porter_stem(w), res[w]) for w in words
           if porter_stem(w) != res[w]]
    assert not bad, bad[:10]


def test_alpha_tokens_sql_ascii_only(con):
    got = con.execute(
        f"SELECT {ALPHA_TOKENS_SQL} FROM (SELECT 'Dogs RAN, fast42x ümlaut' AS text)"
    ).fetchone()[0]
    # ü is non-ASCII: split around it; digits split tokens too
    assert got == ["dogs", "ran", "fast", "x", "mlaut"]


def test_stemmed_docs_view(spark):
    df = spark.createDataFrame(
        [(1, "Running dogs ran quickly"), (2, ""), (3, None), (4, "42 7")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r["text"]
           for r in stemmed_docs(df).collect()}
    assert sorted(out[1].split()) == sorted(["run", "dog", "ran", "quickli"])
    # empty / null / no-alpha docs survive with empty text (N preserved)
    assert out[2] == "" and out[3] == "" and out[4] == ""
    assert set(out) == {1, 2, 3, 4}
