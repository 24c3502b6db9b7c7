"""Real BPE tokenizer (functions/bpe.py): golden-vocab correctness,
merges.txt round-trip, Spark column parity, and trainer-token packing.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from xorq_spark.functions.bpe import (
    BPETokenizer,
    PRETOKEN_RE,
    bpe_token_count_vocab,
    bpe_tokens,
    train_bpe_on_sample,
)


class TestGoldenVocab:
    """Hand-derived merges on a tiny corpus — the classic Sennrich
    walkthrough shape, so every merge step is verifiable by hand."""

    def test_training_produces_expected_merges(self):
        # 'low' x5, 'lower' x2, 'newest' x6, 'widest' x3 (the textbook
        # example corpus, single words so pre-tokenization is trivial)
        corpus = ["low"] * 5 + ["lower"] * 2 + ["newest"] * 6 + ["widest"] * 3
        tok = BPETokenizer.train(corpus, num_merges=4, min_freq=2)
        # step 1: 'es' (9 = 6 newest + 3 widest); step 2: 'es'+'t' (9);
        # step 3: 'lo' (7 = 5 low + 2 lower); step 4: 'lo'+'w' (7)
        assert tok.merges == [("e", "s"), ("es", "t"), ("l", "o"), ("lo", "w")]

    def test_encode_applies_merges_in_rank_order(self):
        tok = BPETokenizer([("e", "s"), ("es", "t"), ("l", "o"), ("lo", "w")])
        assert tok.encode("newest") == ["n", "e", "w", "est"]
        assert tok.encode("lowest") == ["low", "est"]
        assert tok.encode("low") == ["low"]
        assert tok.encode("wider") == ["w", "i", "d", "e", "r"]  # no merges hit
        # " newest" keeps its leading-space symbol (GPT-2 convention):
        # [' ', 'n', 'e', 'w', 'est'] = 5 tokens, plus ['low','est'] = 2
        assert tok.count("lowest newest") == 2 + 5

    def test_empty_and_null(self):
        tok = BPETokenizer([("a", "b")])
        assert tok.encode("") == []
        assert tok.encode(None) == []
        assert tok.count(None) == 0

    def test_pretokenizer_keeps_leading_space(self):
        # GPT-2 convention: " world" is a distinct piece from "world"
        assert PRETOKEN_RE.findall("hello world") == ["hello", " world"]
        assert PRETOKEN_RE.findall("it's 42!") == ["it", "'s", " 42", "!"]

    def test_merges_txt_roundtrip(self, tmp_path):
        tok = BPETokenizer.train(["banana bandana"] * 4, num_merges=6, min_freq=2)
        path = str(tmp_path / "merges.txt")
        tok.save(path)
        tok2 = BPETokenizer.from_file(path)
        assert tok2.merges == tok.merges
        assert tok2.encode("banana") == tok.encode("banana")

    def test_deterministic_tiebreak(self):
        # ('a','a') and ('b','b') tie at 2 each; lexicographically
        # smallest pair wins (single-word corpus keeps space symbols out)
        tok = BPETokenizer.train(["aa", "bb", "aa", "bb"], num_merges=1, min_freq=2)
        assert tok.merges[0] == ("a", "a")


class TestSparkSurface:
    def test_column_count_matches_driver_side(self, spark):
        corpus = ["low"] * 5 + ["lower"] * 2 + ["newest"] * 6 + ["widest"] * 3
        tok = BPETokenizer.train(corpus, num_merges=4, min_freq=2)
        texts = ["lowest newest", "low low widest", None, ""]
        df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "i int, t string")
        got = {
            r["i"]: r["n"]
            for r in df.select("i", bpe_token_count_vocab(F.col("t"), tok).alias("n")).collect()
        }
        assert got == {i: tok.count(t or "") for i, t in enumerate(texts)}

    def test_tokens_column_matches_encode(self, spark):
        tok = BPETokenizer([("e", "s"), ("es", "t"), ("l", "o"), ("lo", "w")])
        df = spark.createDataFrame([("lowest newest",)], "t string")
        [row] = df.select(bpe_tokens(F.col("t"), tok).alias("toks")).collect()
        assert row["toks"] == tok.encode("lowest newest")

    def test_train_on_sample_is_deterministic(self, spark, sf_dir):
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        t1 = train_bpe_on_sample(docs, num_merges=50, sample_rows=200)
        t2 = train_bpe_on_sample(docs, num_merges=50, sample_rows=200)
        assert t1.merges == t2.merges
        assert len(t1.merges) > 0

    def test_pack_sequences_in_trainer_tokens(self, spark):
        """pack_sequences(tokenizer=...) cuts sequences in BPE tokens:
        group totals must equal the sum of per-doc BPE counts, and every
        sequence but the last must be exactly full."""
        from xorq_spark.functions import pack_sequences

        tok = BPETokenizer.train(
            ["the quick brown fox jumps"] * 8, num_merges=10, min_freq=2
        )
        rows = [
            (i, "en", "the quick brown fox jumps over the lazy dog " * (i + 1))
            for i in range(4)
        ]
        df = spark.createDataFrame(rows, "doc_id long, lang string, text string")
        out = pack_sequences(
            df, seq_tokens=16, partition_cols=("lang",), tokenizer=tok
        ).orderBy("seq_id")
        got = out.collect()
        total_expected = sum(tok.count(r[2]) for r in rows)
        assert sum(r["n_tokens"] for r in got) == total_expected
        full = [r["n_tokens"] for r in got[:-1]]
        assert all(n == 16 for n in full)
        assert 0 < got[-1]["n_tokens"] <= 16

    def test_shard_assignment_with_vocab_counter(self, spark):
        from xorq_spark.functions import assign_token_shards

        tok = BPETokenizer.train(["alpha beta gamma"] * 4, num_merges=6, min_freq=2)
        rows = [(i, "en", "alpha beta gamma " * 10) for i in range(6)]
        df = spark.createDataFrame(rows, "doc_id long, lang string, text string")
        out = assign_token_shards(
            df,
            tokens_per_shard=100,
            counter=lambda c: bpe_token_count_vocab(c, tok),
        ).collect()
        per_doc = tok.count("alpha beta gamma " * 10)
        for r in sorted(out, key=lambda r: r["doc_id"]):
            assert r["n_tokens"] == per_doc
            assert r["shard_id"] == (r["doc_id"] * per_doc) // 100


class TestBpeProperties:
    """Hypothesis invariants: determinism, count == len(encode),
    trained-tokenizer counts never exceed character-level counts, and
    serialization round-trip identity for any trained table."""

    def test_invariants_random_corpora(self):
        from hypothesis import given, settings, strategies as st

        words = st.text(alphabet="abcde '!.7", min_size=0, max_size=12)
        corpora = st.lists(words, min_size=1, max_size=12)

        @settings(max_examples=40, deadline=None)
        @given(corpus=corpora, text=words, n=st.integers(0, 20))
        def inner(corpus, text, n):
            tok = BPETokenizer.train(corpus, num_merges=n, min_freq=2)
            enc = tok.encode(text)
            assert tok.count(text) == len(enc)
            assert "".join(enc) == "".join(PRETOKEN_RE.findall(text))
            assert tok.encode(text) == enc  # deterministic / cache-safe
            # merges never increase the token count over raw pre-token chars
            raw = sum(len(p) for p in PRETOKEN_RE.findall(text))
            assert len(enc) <= raw
            # serialization round-trip preserves behavior
            tok2 = BPETokenizer.from_lines(tok.to_lines())
            assert tok2.encode(text) == enc

        inner()
