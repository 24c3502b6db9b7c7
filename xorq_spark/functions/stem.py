"""Porter stemmer (Porter 1980, "An algorithm for suffix stripping",
Program 14(3)) — TWICE: a pure-Python implementation for the Spark
side (Arrow-batched pandas UDF over the *vocabulary*, never the
corpus), and a DuckDB-SQL generator for the oracle side, so the
certification is a genuine dual implementation of the same published
spec rather than one engine replaying the other.

This is the original 1980 algorithm (no later Snowball/Porter2
revisions: no ``logi``→``log``, ``bli``→``ble``, or region-based R1/R2
rules). The rule TABLES (steps 2-4) are shared between the two
implementations — they are published data — but the control flow,
measure (m), vowel marking, and all conditions are implemented
independently per engine.

Scale design: stemming is a per-token pure function, so every query
stems the DISTINCT token vocabulary (Heaps' law: ~O(sqrt(corpus)))
and joins stems back to postings — the pandas UDF never sees the
corpus stream. At 100 TB the vocab frame is still tiny relative to
the postings it decorates.

Reference parity: the reference exposes generic scalar UDFs
(`/root/reference/python/xorq/expr/udf.py`) but no stemmer; this is
LLM-pipeline territory (stemmed dedup keys / stemmed BM25 / stemmed
vocabulary overlap).
"""

from __future__ import annotations

import re
from typing import List, Tuple

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

__all__ = [
    "porter_stem",
    "stem_udf",
    "alpha_tokens",
    "ALPHA_TOKENS_SQL",
    "porter_sql_ctes",
]

_VOWELS = frozenset("aeiou")

# Step 2/3/4 rule tables exactly as published (Porter 1980 §"The
# algorithm"); order within each list is longest-suffix-first, which
# reproduces the paper's first-match-wins semantics (suffixes sharing
# a word's ending always share their penultimate letter, so the
# paper's penultimate-letter bucketing never lets two buckets compete).
STEP2: Tuple[Tuple[str, str], ...] = (
    ("ational", "ate"),
    ("ization", "ize"),
    ("iveness", "ive"),
    ("fulness", "ful"),
    ("ousness", "ous"),
    ("tional", "tion"),
    ("biliti", "ble"),
    ("entli", "ent"),
    ("ousli", "ous"),
    ("ation", "ate"),
    ("alism", "al"),
    ("aliti", "al"),
    ("iviti", "ive"),
    ("enci", "ence"),
    ("anci", "ance"),
    ("izer", "ize"),
    ("abli", "able"),
    ("alli", "al"),
    ("ator", "ate"),
    ("eli", "e"),
)

STEP3: Tuple[Tuple[str, str], ...] = (
    ("icate", "ic"),
    ("ative", ""),
    ("alize", "al"),
    ("iciti", "ic"),
    ("ical", "ic"),
    ("ness", ""),
    ("ful", ""),
)

STEP4: Tuple[str, ...] = (
    "ement",
    "ance",
    "ence",
    "able",
    "ible",
    "ment",
    "ant",
    "ent",
    "ion",  # only when the remaining stem ends in s or t
    "ism",
    "ate",
    "iti",
    "ous",
    "ive",
    "ize",
    "al",
    "er",
    "ic",
    "ou",
)


def _cv(word: str) -> str:
    """Porter's consonant/vowel form: a,e,i,o,u are vowels; y is a
    vowel iff preceded by a consonant (word-initial y is a consonant).
    Returns a string over {'c','V'} aligned with `word`."""
    out: List[str] = []
    for i, ch in enumerate(word):
        if ch in _VOWELS:
            out.append("V")
        elif ch == "y" and i > 0 and out[i - 1] == "c":
            out.append("V")
        else:
            out.append("c")
    return "".join(out)


def _m(stem: str) -> int:
    """The measure m of [C](VC)^m[V]: count of VC sequences."""
    return len(re.findall("V+c+", _cv(stem)))


def _has_vowel(stem: str) -> bool:
    return "V" in _cv(stem)


def _ends_double_c(w: str) -> bool:
    return len(w) >= 2 and w[-1] == w[-2] and _cv(w)[-1] == "c"


def _ends_cvc(w: str) -> bool:
    """*o: stem ends consonant-vowel-consonant where the final
    consonant is not w, x or y (triggers the restore-e rules)."""
    return len(w) >= 3 and _cv(w)[-3:] == "cVc" and w[-1] not in "wxy"


def porter_stem(w: str) -> str:
    """Stem one lowercase ASCII word. Words of length <= 2 are
    returned unchanged (the paper's k<=1 guard)."""
    if len(w) <= 2:
        return w
    # step 1a
    if w.endswith("sses"):
        w = w[:-2]
    elif w.endswith("ies"):
        w = w[:-2]
    elif w.endswith("ss"):
        pass
    elif w.endswith("s"):
        w = w[:-1]
    # step 1b (+ cleanup when ed/ing actually came off)
    fired = False
    if w.endswith("eed"):
        if _m(w[:-3]) > 0:
            w = w[:-1]
    elif w.endswith("ed"):
        if _has_vowel(w[:-2]):
            w = w[:-2]
            fired = True
    elif w.endswith("ing"):
        if _has_vowel(w[:-3]):
            w = w[:-3]
            fired = True
    if fired:
        if w.endswith(("at", "bl", "iz")):
            w += "e"
        elif _ends_double_c(w) and w[-1] not in "lsz":
            w = w[:-1]
        elif _m(w) == 1 and _ends_cvc(w):
            w += "e"
    # step 1c
    if w.endswith("y") and _has_vowel(w[:-1]):
        w = w[:-1] + "i"
    # step 2
    for suf, rep in STEP2:
        if w.endswith(suf):
            stem = w[: -len(suf)]
            if _m(stem) > 0:
                w = stem + rep
            break
    # step 3
    for suf, rep in STEP3:
        if w.endswith(suf):
            stem = w[: -len(suf)]
            if _m(stem) > 0:
                w = stem + rep
            break
    # step 4
    for suf in STEP4:
        if w.endswith(suf):
            stem = w[: -len(suf)]
            if suf == "ion":
                if stem[-1:] in ("s", "t") and _m(stem) > 1:
                    w = stem
            elif _m(stem) > 1:
                w = stem
            break
    # step 5a
    if w.endswith("e"):
        stem = w[:-1]
        a = _m(stem)
        if a > 1 or (a == 1 and not _ends_cvc(stem)):
            w = stem
    # step 5b
    if w.endswith("l") and _ends_double_c(w) and _m(w) > 1:
        w = w[:-1]
    return w


def stem_udf() -> "F.pandas_udf":
    """Arrow-batched pandas UDF string->string. Apply to a DISTINCT
    vocabulary frame, never a corpus stream."""

    @pandas_udf("string")
    def _stem(s):  # type: ignore[no-untyped-def]
        return s.map(lambda w: porter_stem(w) if isinstance(w, str) else w)

    return _stem


def alpha_tokens(text: Column) -> Column:
    """Lowercased ASCII-alpha tokens: extract [A-Za-z]+ FIRST, then
    lower() — tokens are pure ASCII by construction, so lowercasing is
    engine-independent (unicode lower() semantics never enter). Zero
    shuffle; a scan-stage projection."""
    return F.transform(
        F.expr("regexp_extract_all(text, '[A-Za-z]+', 0)"),
        lambda x: F.lower(x),
    )


# DuckDB twin of alpha_tokens for oracle CTEs (column literally named
# `text`, matching the documents view).
ALPHA_TOKENS_SQL = (
    "list_transform(regexp_extract_all(text, '[A-Za-z]+'), x -> lower(x))"
)


def stemmed_docs(docs, text_col: str = "text", id_col: str = "doc_id"):
    """Rewrite each document's text as its space-joined Porter stems
    (alpha tokens only) — the input shape for stemmed BM25 / stemmed
    dedup keys. Stems the DISTINCT vocabulary with the pandas UDF and
    joins it back to the token stream (AQE broadcasts the vocab side
    when it is small; at 100 TB the vocab frame is Heaps-law sublinear
    in the corpus, so the join never moves the corpus twice). Docs with
    zero alpha tokens keep an empty text (corpus cardinality N is
    preserved — BM25's idf depends on it)."""
    toks = docs.select(
        F.col(id_col).alias("__id"), alpha_tokens(F.col(text_col)).alias("__tt")
    )
    occ = toks.select("__id", F.explode("__tt").alias("word"))
    smap = occ.select("word").distinct().withColumn(
        "__stem", stem_udf()(F.col("word"))
    )
    joined = occ.join(smap, "word").groupBy("__id").agg(
        F.array_join(F.collect_list("__stem"), " ").alias("__stemtext")
    )
    return (
        docs.select(F.col(id_col).alias("__id"))
        .join(joined, "__id", "left")
        .select(
            F.col("__id").alias(id_col),
            F.coalesce("__stemtext", F.lit("")).alias(text_col),
        )
    )


# ---------------------------------------------------------------- SQL side


def _sql_cv(x: str) -> str:
    # vowel marking: aeiou -> V; then y-after-consonant -> V (the regex
    # scan is left-to-right non-overlapping, which exactly implements
    # the paper's recursive y rule: each match fixes the next y's
    # predecessor before it is examined); everything else -> c.
    return (
        "regexp_replace(regexp_replace(regexp_replace("
        f"{x}, '[aeiou]', 'V', 'g'), '([^V])y', '\\1V', 'g'), "
        "'[^V]', 'c', 'g')"
    )


def _sql_m(x: str) -> str:
    return f"len(regexp_extract_all({_sql_cv(x)}, 'V+c+'))"


def _sql_has_vowel(x: str) -> str:
    return f"contains({_sql_cv(x)}, 'V')"


def _sql_drop(x: str, n: int) -> str:
    return f"substr({x}, 1, length({x}) - {n})"


def _sql_double_c(x: str) -> str:
    return (
        f"(length({x}) >= 2 AND right({x}, 1) = substr({x}, length({x}) - 1, 1)"
        f" AND right({_sql_cv(x)}, 1) = 'c')"
    )


def _sql_cvc(x: str) -> str:
    return (
        f"(length({x}) >= 3 AND right({_sql_cv(x)}, 3) = 'cVc'"
        f" AND right({x}, 1) NOT IN ('w', 'x', 'y'))"
    )


def porter_sql_ctes(in_rel: str, word_col: str, out_col: str = "stem") -> str:
    """DuckDB CTE chain applying the Porter pipeline to `word_col` of
    relation `in_rel`; append to a WITH list and read `out_col` from
    the final CTE ``pstem``. One CTE per step keeps every intermediate
    a real column, so no expression is ever substituted into itself
    (the naive nested form blows up exponentially)."""
    w = word_col

    s1a = (
        f"CASE WHEN ends_with({w}, 'sses') THEN {_sql_drop(w, 2)} "
        f"WHEN ends_with({w}, 'ies') THEN {_sql_drop(w, 2)} "
        f"WHEN ends_with({w}, 'ss') THEN {w} "
        f"WHEN ends_with({w}, 's') THEN {_sql_drop(w, 1)} "
        f"ELSE {w} END"
    )

    f1b = (
        "CASE WHEN ends_with(w1a, 'eed') THEN FALSE "
        f"WHEN ends_with(w1a, 'ed') AND {_sql_has_vowel(_sql_drop('w1a', 2))} THEN TRUE "
        f"WHEN ends_with(w1a, 'ing') AND {_sql_has_vowel(_sql_drop('w1a', 3))} THEN TRUE "
        "ELSE FALSE END"
    )
    w1b = (
        "CASE WHEN ends_with(w1a, 'eed') THEN "
        f"(CASE WHEN {_sql_m(_sql_drop('w1a', 3))} > 0 THEN {_sql_drop('w1a', 1)} ELSE w1a END) "
        f"WHEN f1b AND ends_with(w1a, 'ed') THEN {_sql_drop('w1a', 2)} "
        f"WHEN f1b AND ends_with(w1a, 'ing') THEN {_sql_drop('w1a', 3)} "
        "ELSE w1a END"
    )
    w1bc = (
        "CASE WHEN NOT f1b THEN w1b "
        "WHEN ends_with(w1b, 'at') OR ends_with(w1b, 'bl') OR ends_with(w1b, 'iz') "
        "THEN w1b || 'e' "
        f"WHEN {_sql_double_c('w1b')} AND right(w1b, 1) NOT IN ('l', 's', 'z') "
        f"THEN {_sql_drop('w1b', 1)} "
        f"WHEN {_sql_m('w1b')} = 1 AND {_sql_cvc('w1b')} THEN w1b || 'e' "
        "ELSE w1b END"
    )
    w1c = (
        f"CASE WHEN ends_with(w1bc, 'y') AND {_sql_has_vowel(_sql_drop('w1bc', 1))} "
        f"THEN {_sql_drop('w1bc', 1)} || 'i' ELSE w1bc END"
    )

    def rules_case(col: str, rules) -> str:
        branches = []
        for suf, rep in rules:
            stem = _sql_drop(col, len(suf))
            repl = f"{stem} || '{rep}'" if rep else stem
            branches.append(
                f"WHEN ends_with({col}, '{suf}') THEN "
                f"(CASE WHEN {_sql_m(stem)} > 0 THEN {repl} ELSE {col} END)"
            )
        return "CASE " + " ".join(branches) + f" ELSE {col} END"

    w2 = rules_case("w1c", STEP2)
    w3 = rules_case("w2", STEP3)

    s4_branches = []
    for suf in STEP4:
        stem = _sql_drop("w3", len(suf))
        cond = f"{_sql_m(stem)} > 1"
        if suf == "ion":
            cond = f"right({stem}, 1) IN ('s', 't') AND {cond}"
        s4_branches.append(
            f"WHEN ends_with(w3, '{suf}') THEN "
            f"(CASE WHEN {cond} THEN {stem} ELSE w3 END)"
        )
    w4 = "CASE " + " ".join(s4_branches) + " ELSE w3 END"

    e_stem = _sql_drop("w4", 1)
    w5a = (
        f"CASE WHEN ends_with(w4, 'e') AND ({_sql_m(e_stem)} > 1 OR "
        f"({_sql_m(e_stem)} = 1 AND NOT {_sql_cvc(e_stem)})) "
        f"THEN {e_stem} ELSE w4 END"
    )
    w5b = (
        f"CASE WHEN right(w5a, 1) = 'l' AND {_sql_double_c('w5a')} "
        f"AND {_sql_m('w5a')} > 1 THEN {_sql_drop('w5a', 1)} ELSE w5a END"
    )

    return f"""
    p1a AS (SELECT *, {s1a} AS w1a FROM {in_rel}),
    p1f AS (SELECT *, {f1b} AS f1b FROM p1a),
    p1b AS (SELECT *, {w1b} AS w1b FROM p1f),
    p1bc AS (SELECT *, {w1bc} AS w1bc FROM p1b),
    p1c AS (SELECT *, {w1c} AS w1c FROM p1bc),
    p2 AS (SELECT *, {w2} AS w2 FROM p1c),
    p3 AS (SELECT *, {w3} AS w3 FROM p2),
    p4 AS (SELECT *, {w4} AS w4 FROM p3),
    p5a AS (SELECT *, {w5a} AS w5a FROM p4),
    pstem AS (SELECT *, CASE WHEN length({w}) <= 2 THEN {w} ELSE {w5b} END
              AS {out_col} FROM p5a)"""
