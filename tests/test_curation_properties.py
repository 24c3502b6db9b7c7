"""Model-based property tests: the distributed curation operators must
agree with trivially-correct single-process Python models on arbitrary
small corpora (hypothesis-generated), the same way the resample/funnel
operators are guarded."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from xorq_spark.functions import line_dedup, pack_sequences

_WORDS = ["aa", "bb", "cc", "dd", "ee"]

_docs = st.lists(
    st.lists(st.sampled_from(_WORDS), min_size=0, max_size=9),
    min_size=1,
    max_size=8,
).map(
    lambda ds: [(i, " ".join(toks)) for i, toks in enumerate(ds)]
)

_lined_docs = st.lists(
    st.lists(
        st.lists(st.sampled_from(_WORDS), min_size=1, max_size=3).map(" ".join),
        min_size=0,
        max_size=5,
    ).map("\n".join),
    min_size=1,
    max_size=6,
).map(lambda ds: [(i, t) for i, t in enumerate(ds)])


def _line_dedup_model(rows, max_docs):
    from collections import Counter

    doc_lines = {
        i: [l for l in t.split("\n") if l.strip() != ""] for i, t in rows
    }
    freq = Counter()
    for lines in doc_lines.values():
        for key in {l.strip() for l in lines}:
            freq[key] += 1
    out = {}
    for i, lines in doc_lines.items():
        kept = [l for l in lines if freq[l.strip()] <= max_docs]
        out[i] = ("\n".join(kept), len(lines), len(kept))
    return out


@given(rows=_lined_docs, max_docs=st.sampled_from([1, 2]))
@settings(max_examples=12, deadline=None)
def test_line_dedup_matches_counter_model(spark, rows, max_docs):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["text_deduped"], r["n_lines"], r["n_kept_lines"])
        for r in line_dedup(df, max_docs=max_docs).collect()
    }
    assert got == _line_dedup_model(rows, max_docs)


def _pack_model(rows, seq_tokens):
    stream = []
    for _i, text in sorted(rows):
        stream.extend(text.split())
    seqs = {}
    for pos, tok in enumerate(stream):
        seqs.setdefault(pos // seq_tokens, []).append(tok)
    return {
        sid: (" ".join(toks), len(toks)) for sid, toks in seqs.items()
    }


@given(rows=_docs, seq_tokens=st.sampled_from([3, 5, 16]))
@settings(max_examples=12, deadline=None)
def test_pack_sequences_matches_stream_model(spark, rows, seq_tokens):
    df = spark.createDataFrame(
        [(i, "en", t) for i, t in rows], "doc_id long, lang string, text string"
    )
    got = {
        r["seq_id"]: (r["seq_text"], r["n_tokens"])
        for r in pack_sequences(
            df, seq_tokens=seq_tokens, partition_cols=("lang",)
        ).collect()
    }
    assert got == _pack_model(rows, seq_tokens)
