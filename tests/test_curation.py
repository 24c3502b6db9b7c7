"""Unit semantics for the corpus-curation operators: line_dedup,
dup_ngram_fraction, gopher_flags, tfidf_topk, and the atomic cache
publish."""

from __future__ import annotations

import math
import os

import pyspark.sql.functions as F
import pytest

from xorq_spark.functions import (
    dup_ngram_fraction,
    gopher_flags,
    line_dedup,
    tfidf_topk,
)


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [
            (1, "alpha beta\ncommon footer\nunique one"),
            (2, "gamma delta\ncommon footer\nunique two"),
            (3, "common footer"),
            (4, ""),
        ],
        "doc_id long, text string",
    )


def test_line_dedup_drops_cross_doc_lines(docs):
    out = {
        r["doc_id"]: r
        for r in line_dedup(docs, max_docs=1).collect()
    }
    assert out[1]["text_deduped"] == "alpha beta\nunique one"
    assert out[2]["text_deduped"] == "gamma delta\nunique two"
    assert out[3]["text_deduped"] == ""  # only line is boilerplate
    assert out[4]["text_deduped"] == ""  # empty doc
    assert out[1]["n_lines"] == 3 and out[1]["n_kept_lines"] == 2
    assert out[3]["n_lines"] == 1 and out[3]["n_kept_lines"] == 0
    assert out[4]["n_lines"] == 0 and out[4]["n_kept_lines"] == 0


def test_line_dedup_preserves_order_and_threshold(spark):
    df = spark.createDataFrame(
        [(1, "z\ny\nx"), (2, "y\nq")], "doc_id long, text string"
    )
    # max_docs=2: nothing is dropped (y occurs in exactly 2 docs)
    out = {r["doc_id"]: r["text_deduped"] for r in line_dedup(df, max_docs=2).collect()}
    assert out[1] == "z\ny\nx"  # original order, not sorted
    assert out[2] == "y\nq"


def test_dup_ngram_fraction(spark):
    df = spark.createDataFrame(
        [
            (1, "a b c d"),        # grams: "a b c", "b c d"
            (2, "a b c x"),        # shares "a b c" with doc 1
            (3, "p q r s"),        # no overlap
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in dup_ngram_fraction(df, n=3).collect()}
    assert out[1]["n_grams"] == 2 and out[1]["n_dup_grams"] == 1
    assert out[1]["dup_fraction"] == 0.5
    assert out[2]["n_dup_grams"] == 1
    assert out[3]["n_dup_grams"] == 0 and out[3]["dup_fraction"] == 0.0


def test_gopher_flags_pass_and_fail(spark):
    good = " ".join(["sentence"] * 60)
    symbol_heavy = " ".join(["####"] * 60)
    bullets = "\n".join(["- item %d word word" % i for i in range(10)] + ["x"] * 0)
    df = spark.createDataFrame(
        [(1, good), (2, symbol_heavy), (3, bullets), (4, None)],
        "doc_id long, text string",
    )
    rows = {
        r["doc_id"]: r["g"]
        for r in df.select("doc_id", gopher_flags(F.col("text")).alias("g")).collect()
    }
    assert rows[1]["passes"] is True
    assert rows[1]["n_words"] == 60
    assert rows[2]["passes"] is False  # symbol ratio + alpha fraction
    assert rows[2]["symbol_word_ratio"] > 0.1
    assert rows[2]["alpha_word_frac"] == 0.0
    assert rows[3]["bullet_line_frac"] == 1.0
    assert rows[3]["passes"] is False  # too few words anyway
    assert rows[4]["n_words"] == 0 and rows[4]["passes"] is False


def test_tfidf_topk_ranks_rare_terms_highest(spark):
    df = spark.createDataFrame(
        [
            (1, "shared shared rare1"),
            (2, "shared shared rare2"),
            (3, "shared shared rare3"),
        ],
        "doc_id long, text string",
    )
    out = tfidf_topk(df, k=2).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for d, terms in by_doc.items():
        # the doc-unique term beats the corpus-wide one despite tf=2 vs 1
        assert terms[0]["rank"] == 1 and terms[0]["term"] == f"rare{d}"
        assert terms[0]["doc_freq"] == 1
        assert terms[0]["tfidf"] == round(1 * math.log(3.0), 9)
        # 'shared' is in every doc -> idf = ln(1) = 0
        assert terms[1]["term"] == "shared" and terms[1]["tfidf"] == 0.0


def test_cache_publish_is_atomic_and_idempotent(spark, tmp_path):
    from xorq_spark.cache import _publish_artifact

    df = spark.range(5).withColumn("v", F.col("id") * 2)
    path = str(tmp_path / "k.parquet")
    _publish_artifact(df, path)
    first = sorted(r["v"] for r in spark.read.parquet(path).collect())
    # second publish of the same key (concurrent-writer loser path):
    # no error, artifact still readable, no stray temp dirs left behind
    _publish_artifact(df, path)
    assert sorted(r["v"] for r in spark.read.parquet(path).collect()) == first
    leftovers = [p for p in os.listdir(tmp_path) if ".tmp-" in p or ".old-" in p]
    assert leftovers == []


def test_pack_sequences_crosses_doc_boundaries(spark):
    from xorq_spark.functions import pack_sequences

    df = spark.createDataFrame(
        [
            (1, "en", "a b c"),
            (2, "en", "d e f g"),
            (3, "fr", "x y"),
        ],
        "doc_id long, lang string, text string",
    )
    out = {
        (r["lang"], r["seq_id"]): r
        for r in pack_sequences(df, seq_tokens=4, partition_cols=("lang",)).collect()
    }
    # en stream: a b c | d e f g  -> [a b c d] [e f g]
    assert out[("en", 0)]["seq_text"] == "a b c d"
    assert out[("en", 0)]["n_tokens"] == 4
    assert out[("en", 1)]["seq_text"] == "e f g"  # final partial sequence
    assert out[("en", 1)]["n_tokens"] == 3
    # fr stream independent
    assert out[("fr", 0)]["seq_text"] == "x y"
    assert len(out) == 3


def test_pack_sequences_deterministic_and_lossless(spark):
    from xorq_spark.functions import pack_sequences

    df = spark.createDataFrame(
        [(i, "en", " ".join(f"t{i}_{j}" for j in range(7))) for i in range(20)],
        "doc_id long, lang string, text string",
    )
    a = pack_sequences(df, seq_tokens=16).collect()
    b = pack_sequences(df, seq_tokens=16).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    # every token lands in exactly one sequence, in stream order
    stream = " ".join(
        r["seq_text"]
        for r in sorted(a, key=lambda r: r["seq_id"])
    ).split()
    expect = [f"t{i}_{j}" for i in range(20) for j in range(7)]
    assert stream == expect


def test_dedup_incremental_flags_known_dups(spark):
    from xorq_spark.functions import build_dedup_index, dedup_incremental

    base = (
        "the quick brown fox jumps over the lazy dog while seventeen "
        "sleepy cats watch from the old wooden fence near the river "
        "bank every single morning"
    )
    old = spark.createDataFrame(
        [
            (1, base),
            (2, "completely different historical content about spark engines"),
        ],
        "doc_id long, text string",
    )
    new = spark.createDataFrame(
        [
            # near-copy of old doc 1 (one word changed; shares 2 of 4
            # LSH bands with it — minhash is deterministic, so this
            # collision is stable across runs/engines)
            (10, base.replace("river", "lake")),
            # genuinely new
            (11, "fresh unrelated text with novel vocabulary entirely"),
        ],
        "doc_id long, text string",
    )
    bands, digests = build_dedup_index(old)
    out = {
        r["doc_id"]: r
        for r in dedup_incremental(new, bands, digests, threshold=0.3).collect()
    }
    assert out[10]["is_dup"] is True and out[10]["n_candidates"] >= 1
    assert out[10]["max_sim"] > 0.3
    assert out[11]["is_dup"] is False and out[11]["n_candidates"] == 0
    assert out[11]["max_sim"] == 0.0


def test_dedup_incremental_index_grows_per_batch(spark):
    from xorq_spark.functions import build_dedup_index, dedup_incremental
    import pyspark.sql.functions as F

    batch1 = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta")], "doc_id long, text string"
    )
    batch2 = spark.createDataFrame(
        [(2, "alpha beta gamma delta epsilon zeta")], "doc_id long, text string"
    )
    b1, d1 = build_dedup_index(batch1)
    res = dedup_incremental(batch2, b1, d1, threshold=0.9)
    [r] = res.collect()
    assert r["is_dup"] is True and r["max_sim"] == 1.0
    # survivors (none here) would be appended; a fresh doc passes
    batch3 = spark.createDataFrame(
        [(3, "totally different words entirely here now")], "doc_id long, text string"
    )
    [r3] = dedup_incremental(batch3, b1, d1, threshold=0.9).collect()
    assert r3["is_dup"] is False
    b3, d3 = build_dedup_index(batch3)
    grown_b, grown_d = b1.unionByName(b3), d1.unionByName(d3)
    [r3b] = dedup_incremental(batch3, grown_b, grown_d, threshold=0.9).collect()
    assert r3b["is_dup"] is True  # now indexed, an exact re-crawl is caught


def test_line_dedup_literal_separator(spark):
    """sep is a LITERAL, not a regex: '|' must split on pipes, not on
    the empty-alternation regex (review regression)."""
    df = spark.createDataFrame(
        [(1, "a b|common x"), (2, "c d|common x")], "doc_id long, text string"
    )
    out = {
        r["doc_id"]: r["text_deduped"]
        for r in line_dedup(df, max_docs=1, sep="|").collect()
    }
    assert out[1] == "a b"
    assert out[2] == "c d"


class TestLmScore:
    def test_bigram_lm_hand_computed(self, spark):
        """Two-doc corpus small enough to verify the smoothed bigram
        model by hand."""
        import math

        from xorq_spark.functions import lm_score

        docs = spark.createDataFrame(
            [(1, "a b a b"), (2, "a b c"), (3, "x"), (4, None)],
            "doc_id long, text string",
        )
        out = {r["doc_id"]: r for r in lm_score(docs).collect()}
        # corpus bigrams: (a,b)x3, (b,a)x1, (b,c)x1 ; vocab {a,b,c,x} V=4
        # c(a,*)=3, c(b,*)=2
        p_ab = (3 + 1) / (3 + 4)
        p_ba = (1 + 1) / (2 + 4)
        p_bc = (1 + 1) / (2 + 4)
        r = lambda x: round(math.log(x), 9)
        exp1 = round(-(r(p_ab) + r(p_ba) + r(p_ab)) / 3, 6)
        exp2 = round(-(r(p_ab) + r(p_bc)) / 2, 6)
        assert out[1]["n_bigrams"] == 3 and abs(out[1]["neg_avg_logprob"] - exp1) < 1e-9
        assert out[2]["n_bigrams"] == 2 and abs(out[2]["neg_avg_logprob"] - exp2) < 1e-9
        # <2 tokens / null text: no bigrams, NULL score
        assert out[3]["n_bigrams"] == 0 and out[3]["neg_avg_logprob"] is None
        assert out[4]["n_bigrams"] == 0 and out[4]["neg_avg_logprob"] is None

    def test_gibberish_scores_worse_than_repetitive_text(self, spark):
        from xorq_spark.functions import lm_score

        natural = "the cat sat on the mat and the cat sat on the mat"
        docs = spark.createDataFrame(
            [(1, natural), (2, natural), (3, "zq wv kj pl mn bx cd ef gh ij")],
            "doc_id long, text string",
        )
        out = {r["doc_id"]: r["neg_avg_logprob"] for r in lm_score(docs).collect()}
        assert out[3] > out[1]  # one-off bigrams are less probable

    def test_train_df_scores_out_of_domain_worse(self, spark):
        """DSIR shape: a model trained on a target slice must score
        target-like docs better (lower NLL) than alien docs, and unseen
        bigrams must fall back to the smoothed mass, not drop."""
        from xorq_spark.functions import lm_score

        target = spark.createDataFrame(
            [(100 + i, "the cat sat on the mat") for i in range(5)],
            "doc_id long, text string",
        )
        docs = spark.createDataFrame(
            [(1, "the cat sat on the mat"), (2, "zq wv kj pl mn")],
            "doc_id long, text string",
        )
        out = {r["doc_id"]: r for r in lm_score(docs, train_df=target).collect()}
        # alien doc: every bigram unseen -> still scored (smoothed), worse
        assert out[2]["n_bigrams"] == 4
        assert out[2]["neg_avg_logprob"] > out[1]["neg_avg_logprob"]

    def test_train_df_self_equivalence(self, spark):
        """train_df=df must equal the self-scoring default exactly."""
        from xorq_spark.functions import lm_score

        docs = spark.createDataFrame(
            [(1, "a b a b"), (2, "a b c")], "doc_id long, text string"
        )
        a = sorted(tuple(r) for r in lm_score(docs).collect())
        b = sorted(tuple(r) for r in lm_score(docs, train_df=docs).collect())
        assert a == b


class TestDupSpanDetect:
    def test_long_verbatim_passage_detected(self, spark):
        """A 120-char passage copied between two docs must flag spans in
        BOTH, while a doc sharing only words (different order) stays
        clean — the character-level signal word n-grams miss."""
        from xorq_spark.functions.dedup import dup_span_detect

        passage = "the quick brown fox jumps over the lazy dog " * 3  # 135 chars
        docs = spark.createDataFrame(
            [
                (1, "intro text. " + passage + " closing remarks here."),
                (2, "totally different opening. " + passage),
                (3, "dog lazy the over jumps fox brown quick the " * 3),
                (4, None),
            ],
            "doc_id long, text string",
        )
        out = {r["doc_id"]: r for r in dup_span_detect(docs, span=48, stride=16).collect()}
        assert out[1]["n_dup_spans"] > 0 and out[2]["n_dup_spans"] > 0
        assert out[3]["n_dup_spans"] == 0  # same words, no verbatim span
        assert out[4]["n_spans"] == 0 and out[4]["dup_span_fraction"] == 0.0

    def test_self_repetition_does_not_self_flag(self, spark):
        """A document repeating ITS OWN text is not cross-document
        duplication: per-doc distinct spans keep doc-frequency at 1."""
        from xorq_spark.functions.dedup import dup_span_detect

        docs = spark.createDataFrame(
            [(1, "unique self repeating block of text here okay! " * 10)],
            "doc_id long, text string",
        )
        [r] = dup_span_detect(docs, span=48, stride=16).collect()
        assert r["n_dup_spans"] == 0


class TestGopherRepetition:
    """Gopher repetition rules (functions/text.py gopher_repetition):
    hand-verified duplicate-segment fractions, top-n-gram chars with
    deterministic tie-break, and overlap-once n-gram coverage."""

    def _run(self, spark, rows, **kw):
        from xorq_spark.functions import gopher_repetition

        df = spark.createDataFrame(rows, "doc_id int, text string")
        return {
            r["doc_id"]: r
            for r in gopher_repetition(df, **kw).collect()
        }

    def test_duplicate_lines_and_paragraphs(self, spark):
        out = self._run(
            spark,
            [(1, "a b c\na b c\nd e f"), (5, "p q\n\nr s\n\np q")],
            para_sep="\n\n",
        )
        # doc 1: 3 lines, one repeat -> 1/3 of lines and of chars
        assert out[1]["dup_line_frac"] == pytest.approx(1 / 3, abs=1e-9)
        assert out[1]["dup_line_char_frac"] == pytest.approx(1 / 3, abs=1e-9)
        assert out[1]["dup_para_frac"] == 0.0
        # doc 5: paragraph "p q" repeats; its lines repeat too
        assert out[5]["dup_para_frac"] == pytest.approx(1 / 3, abs=1e-9)
        assert out[5]["dup_line_frac"] == pytest.approx(1 / 3, abs=1e-9)

    def test_top_ngram_tiebreak_and_fraction(self, spark):
        # "a b c a b c d e f": top 2-gram "a b" (count 2, len 3) over
        # 17 chars; all 4-grams unique -> smallest gram asc wins
        out = self._run(spark, [(1, "a b c\na b c\nd e f")])
        assert out[1]["top_2gram_char_frac"] == pytest.approx(
            round(6 / 17, 9), abs=1e-9
        )
        assert out[1]["top_3gram_char_frac"] == pytest.approx(
            round(10 / 17, 9), abs=1e-9
        )
        # count x length can exceed the text length when occurrences
        # overlap - published-formula behavior, not clamped
        out2 = self._run(spark, [(2, "x y x y x y x y z")])
        assert out2[2]["top_4gram_char_frac"] > 1.0

    def test_dup_ngram_coverage_counts_overlap_once(self, spark):
        # "x y x y x y x y z": dup 5-grams cover token positions 0..7
        # (8 of 9 single-char tokens); 7-grams are all unique
        out = self._run(spark, [(2, "x y x y x y x y z")])
        assert out[2]["dup_5gram_char_frac"] == pytest.approx(
            round(8 / 9, 9), abs=1e-9
        )
        assert out[2]["dup_6gram_char_frac"] == pytest.approx(
            round(8 / 9, 9), abs=1e-9
        )
        assert out[2]["dup_7gram_char_frac"] == 0.0

    def test_null_and_short_documents(self, spark):
        out = self._run(spark, [(3, None), (4, "tiny")])
        for d in (3, 4):
            assert out[d]["dup_line_frac"] == 0.0
            assert out[d]["dup_10gram_char_frac"] == 0.0
        assert out[3]["passes"] and out[4]["passes"]

    def test_passes_thresholds(self, spark):
        # heavy repetition fails; long varied text passes (the
        # published thresholds assume real-document lengths — a
        # 10-word doc exceeds top-n-gram fractions trivially)
        varied = " ".join(f"word{i:03d}" for i in range(200))
        out = self._run(spark, [(1, "spam ham " * 50), (2, varied)])
        assert not out[1]["passes"]
        assert out[2]["passes"]


class TestNBClassify:
    """Multinomial NB classifier (functions/text.py nb_classify):
    textbook counts verified by hand, tie-break, and train/score
    separation with unseen-token fallback."""

    def test_textbook_example(self, spark):
        # classic 2-class toy: P(spam) favors doc with spam-y tokens
        import math

        train = spark.createDataFrame(
            [
                (1, "buy cheap pills", "spam"),
                (2, "cheap pills now", "spam"),
                (3, "meeting at noon", "ham"),
                (4, "lunch meeting today", "ham"),
            ],
            "doc_id long, text string, lang string",
        )
        score = spark.createDataFrame(
            [(10, "cheap pills"), (11, "meeting today")],
            "doc_id long, text string",
        )
        from xorq_spark.functions.text import nb_classify

        out = {
            r["doc_id"]: r
            for r in nb_classify(score, train_df=train).collect()
        }
        assert out[10]["pred"] == "spam"
        assert out[11]["pred"] == "ham"
        # hand-check doc 10 spam score: V=9 (buy cheap pills now
        # meeting at noon lunch today), spam tokens=6, den=6+9=15;
        # P(cheap|spam)=(2+1)/15, P(pills|spam)=(2+1)/15, prior=2/4
        exp = (
            round(math.log(2 / 4) * 1e9)
            + round(math.log(3 / 15) * 1e9)
            + round(math.log(3 / 15) * 1e9)
        )
        assert out[10]["score_nano"] == exp

    def test_unseen_tokens_use_fallback(self, spark):
        from xorq_spark.functions.text import nb_classify

        train = spark.createDataFrame(
            [(1, "alpha beta", "x"), (2, "gamma delta", "y")],
            "doc_id long, text string, lang string",
        )
        score = spark.createDataFrame(
            [(10, "zzz qqq")], "doc_id long, text string"
        )
        [r] = nb_classify(score, train_df=train).collect()
        # all tokens unseen -> equal likelihoods, equal priors ->
        # tie breaks to smallest class label
        assert r["pred"] == "x"
        assert r["n_tokens"] == 2

    def test_empty_doc_gets_prior_argmax(self, spark):
        from xorq_spark.functions.text import nb_classify

        train = spark.createDataFrame(
            [(1, "a", "x"), (2, "b", "y"), (3, "c", "y")],
            "doc_id long, text string, lang string",
        )
        score = spark.createDataFrame(
            [(10, "")], "doc_id long, text string"
        )
        [r] = nb_classify(score, train_df=train).collect()
        assert r["pred"] == "y" and r["n_tokens"] == 0


def test_near_dedup_keep_longest(spark):
    from xorq_spark.functions.dedup import near_dedup

    base = (
        "the quick brown fox jumps over the lazy dog while many sleepy "
        "cats watch from the old wooden fence near the river bank"
    )
    rows = [
        (1, base),                              # near-dup, shorter
        (2, base + " every single morning"),    # near-dup, LONGEST
        (3, "unrelated text about database engines and storage"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    kept_min = sorted(
        r["doc_id"] for r in near_dedup(df, threshold=0.3).collect()
    )
    kept_long = sorted(
        r["doc_id"]
        for r in near_dedup(df, threshold=0.3, keep="longest").collect()
    )
    assert kept_min == [1, 3]    # min-id keeps doc 1
    assert kept_long == [2, 3]   # longest keeps doc 2
    import pytest as _pytest

    with _pytest.raises(ValueError):
        near_dedup(df, keep="nope")


def test_fuzzy_match_pairs(spark):
    from xorq_spark.functions.dedup import fuzzy_match_pairs

    rows = [
        (1, "john smith"),
        (2, "jon smith"),      # dist 1, same block "smith"
        (3, "john smyth"),     # different block (smyth) -> not matched
        (4, "jane smith"),     # dist 2 from "jon smith"? j-a-n-e vs j-o-n: check
        (5, "bob jones"),
    ]
    df = spark.createDataFrame(rows, "id long, name string")
    pairs = {
        (r["id_a"], r["id_b"]): r["distance"]
        for r in fuzzy_match_pairs(df, "name", "id", max_distance=2).collect()
    }
    assert pairs[(1, 2)] == 1
    assert (1, 3) not in pairs          # blocking excludes cross-block
    assert (2, 5) not in pairs and (1, 5) not in pairs
    # symmetric mode doubles every pair
    sym = fuzzy_match_pairs(df, "name", "id", max_distance=2, symmetric=True)
    spairs = {(r["id_a"], r["id_b"]) for r in sym.collect()}
    assert (2, 1) in spairs and (1, 2) in spairs


def test_fuzzy_match_soundex_blocking(spark):
    """block_col takes any expression: phonetic (soundex) blocking
    catches same-sounding spellings that last-word blocking splits."""
    from xorq_spark.functions.dedup import fuzzy_match_pairs

    rows = [(1, "smith"), (2, "smyth"), (3, "jones")]
    df = spark.createDataFrame(rows, "id long, name string")
    # last-word blocking separates smith/smyth (different words)
    plain = fuzzy_match_pairs(df, "name", "id", max_distance=2).collect()
    assert plain == []
    # soundex blocking puts them in one block; distance 1 links them
    snd = fuzzy_match_pairs(
        df, "name", "id", block_col=F.soundex(F.col("name")), max_distance=2
    ).collect()
    assert [(r["id_a"], r["id_b"], r["distance"]) for r in snd] == [(1, 2, 1)]


def test_c4_flags_rules(spark):
    from xorq_spark.functions.text import c4_flags

    rows = [
        (1, "This is a proper sentence.\nAnd another good one!\nA third one here?"),
        (2, "no punctuation at all\njust words"),
        (3, "Has code { int x = 1; } in it. Two more. Sentences here."),
        (4, "Lorem ipsum dolor sit amet. More text. And more."),
        (5, "ok\nshort"),
        (6, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["doc_id"]: r["g"]
        for r in df.select("doc_id", c4_flags(F.col("text")).alias("g")).collect()
    }
    assert out[1]["passes"] is True
    assert out[1]["terminal_punct_line_frac"] == 1.0
    assert out[1]["n_sentences"] == 3
    assert out[2]["passes"] is False and out[2]["n_sentences"] == 0
    assert out[3]["has_curly_brace"] and not out[3]["passes"]
    assert out[4]["has_lorem_ipsum"] and not out[4]["passes"]
    # both lines under 3 words
    assert out[5]["short_line_frac"] == 1.0
    assert out[6]["n_sentences"] == 0 and out[6]["passes"] is False


class TestGopherRepetitionArrowParity:
    """The arrow (mapInPandas) and hof (pure-JVM) paths must be
    row-identical — same contract, different execution engine (the
    semdedup GEMM precedent)."""

    def _cmp(self, spark, df, **kw):
        from xorq_spark.functions.text import gopher_repetition

        a = gopher_repetition(df, impl="arrow", **kw).orderBy("doc_id")
        h = gopher_repetition(df, impl="hof", **kw).orderBy("doc_id")
        ra, rh = a.collect(), h.collect()
        assert a.columns == h.columns
        assert [tuple(r) for r in ra] == [tuple(r) for r in rh]

    def test_corpus_parity(self, spark, sf_dir):
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        self._cmp(
            spark, docs, sep="\n", para_sep="\n\n",
            top_ns=(2, 3), dup_ns=(5, 10),
        )

    def test_adversarial_unicode_and_edges(self, spark):
        rows = [
            (0, None),
            (1, ""),
            (2, "   "),
            (3, "a"),
            (4, "a a a a a a a a a a"),
            (5, "x y z\tz\nz z"),          # NBSP is NOT Java \\s
            (6, "line\nline\nother\n\npara\n\npara"),
            (7, "你好 你好 世界"),
            (8, " lead and trail \n lead and trail \n"),
            (9, "one two three four five six seven eight nine ten "
                "one two three four five six seven eight nine ten"),
            (10, "\x0b\x0c\r mixed \x0b ws \f tokens \r here"),
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        self._cmp(
            spark, df, sep="\n", para_sep="\n\n",
            top_ns=(2, 3), dup_ns=(5, 10),
        )
        self._cmp(spark, df, sep="\n", para_sep=None,
                  top_ns=(2,), dup_ns=(3,))


def test_fim_transform_reassembles_exactly(spark):
    from xorq_spark.functions.text import fim_transform

    df = spark.createDataFrame(
        [(i, "abcdefghij") for i in range(40)], "doc_id long, text string"
    )
    out = {r["doc_id"]: r for r in fim_transform(df, fim_rate_pct=100).collect()}
    for i, r in out.items():
        assert r["fim_applied"] == 1
        t = r["text_fim"]
        # PSM reassembly: prefix+middle+suffix == original
        assert t.startswith("<PRE>")
        pre, rest = t[5:].split("<SUF>", 1)
        suf, mid = rest.split("<MID>", 1)
        assert pre + mid + suf == "abcdefghij"
        assert len(pre) == r["s1"] and len(pre) + len(mid) == r["s2"]


def test_fim_rate_zero_passthrough_and_short_docs(spark):
    from xorq_spark.functions.text import fim_transform

    df = spark.createDataFrame(
        [(1, "hello world"), (2, "x"), (3, None)], "doc_id long, text string"
    )
    out = {r["doc_id"]: r for r in fim_transform(df, fim_rate_pct=0).collect()}
    assert all(r["fim_applied"] == 0 for r in out.values())
    assert out[1]["text_fim"] == "hello world"
    # 100% rate still never touches 1-char or null docs
    out = {r["doc_id"]: r for r in fim_transform(df, fim_rate_pct=100).collect()}
    assert out[2]["fim_applied"] == 0 and out[2]["text_fim"] == "x"
    assert out[3]["fim_applied"] == 0 and out[3]["text_fim"] is None


def test_fim_deterministic_across_runs(spark):
    from xorq_spark.functions.text import fim_transform

    df = spark.createDataFrame(
        [(i, f"document number {i} with some text") for i in range(30)],
        "doc_id long, text string",
    )
    a = {r["doc_id"]: r["text_fim"] for r in fim_transform(df).collect()}
    b = {r["doc_id"]: r["text_fim"] for r in fim_transform(df).collect()}
    assert a == b
    applied = sum(
        r["fim_applied"] for r in fim_transform(df).collect()
    )
    assert 0 < applied < 30  # ~50% rate actually splits the corpus
