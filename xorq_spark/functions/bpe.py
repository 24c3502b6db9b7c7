"""Real byte-pair-encoding tokenizer: vocab/merges-driven, pure Python,
zero external wheels.

The regex counter in functions/text.py is an honest APPROXIMATION (a
GPT-2-style pre-tokenizer with no merge table). Shard and packing
decisions at corpus scale ultimately budget in TRAINER tokens, so this
module supplies the missing piece: the classic BPE algorithm (Sennrich
et al. 2016, the same greedy lowest-rank merge loop GPT-2's tokenizer
uses) driven by a merges table that can be trained on a corpus sample,
loaded from a standard merges.txt, or handed in directly.

Spark integration: the merge table is a plain dict captured in a
pandas_udf closure — it ships once per task, the per-piece encoding is
LRU-cached per worker process (Zipf's law makes the cache hit rate
extreme on natural text), and batches arrive via Arrow. No shuffle;
scan-speed modulo the per-novel-piece merge loop.

Reference parity: the reference has no tokenizer of its own (it
delegates to engine UDFs); this is a first-class LLM-pipeline operator
per the build brief.
"""

from __future__ import annotations

import re
from functools import lru_cache
from typing import Iterable, List, Optional, Sequence, Tuple

# Mirrors text.BPE_ISH_PATTERN (kept in lockstep — tests assert the two
# engines' pre-token counts agree on ASCII text).
PRETOKEN_RE = re.compile(
    r"'(?:s|t|re|ve|m|ll|d)| ?[a-zA-Z]+| ?[0-9]+| ?[^a-zA-Z0-9\s]+"
)

_INF = float("inf")


class BPETokenizer:
    """Greedy lowest-rank-merge BPE over regex pre-tokens.

    `merges` is an ordered list of symbol pairs; earlier = higher
    priority (lower rank), exactly the merges.txt convention. Initial
    symbols are the piece's unicode characters (pieces keep their
    leading space, GPT-2-style, so no end-of-word marker is needed)."""

    def __init__(self, merges: Sequence[Tuple[str, str]]):
        self.merges: List[Tuple[str, str]] = [tuple(m) for m in merges]
        self.ranks = {pair: i for i, pair in enumerate(self.merges)}
        # per-instance cache: distinct pieces are Zipf-distributed, so
        # nearly every lookup after warmup is a dict hit
        self._encode_piece = lru_cache(maxsize=65536)(self._encode_piece_uncached)

    # -- encoding ----------------------------------------------------------

    def _encode_piece_uncached(self, piece: str) -> Tuple[str, ...]:
        word: Tuple[str, ...] = tuple(piece)
        ranks = self.ranks
        while len(word) > 1:
            best_rank, best_pair = _INF, None
            for pair in zip(word, word[1:]):
                r = ranks.get(pair, _INF)
                if r < best_rank:
                    best_rank, best_pair = r, pair
            if best_pair is None or best_rank is _INF:
                break
            a, b = best_pair
            out: List[str] = []
            i = 0
            while i < len(word):
                if i < len(word) - 1 and word[i] == a and word[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(word[i])
                    i += 1
            word = tuple(out)
        return word

    def encode(self, text: Optional[str]) -> List[str]:
        """Text -> list of BPE token strings."""
        if not text:
            return []
        toks: List[str] = []
        for piece in PRETOKEN_RE.findall(text):
            toks.extend(self._encode_piece(piece))
        return toks

    def count(self, text: Optional[str]) -> int:
        if not text:
            return 0
        return sum(len(self._encode_piece(p)) for p in PRETOKEN_RE.findall(text))

    # -- training ----------------------------------------------------------

    @classmethod
    def train(
        cls,
        texts: Iterable[str],
        num_merges: int = 1000,
        min_freq: int = 2,
    ) -> "BPETokenizer":
        """Classic BPE induction: count pre-token frequencies once, then
        repeatedly merge the most frequent adjacent symbol pair
        (deterministic tie-break: lexicographically smallest pair).
        Pure Python — intended for a driver-side corpus SAMPLE (the
        standard practice: induce on a sample, apply to the corpus)."""
        from collections import Counter

        wordfreq: Counter = Counter()
        for t in texts:
            if not t:
                continue
            for piece in PRETOKEN_RE.findall(t):
                wordfreq[tuple(piece)] += 1

        merges: List[Tuple[str, str]] = []
        words = dict(wordfreq)
        for _ in range(num_merges):
            pair_counts: Counter = Counter()
            for w, f in words.items():
                for p in zip(w, w[1:]):
                    pair_counts[p] += f
            if not pair_counts:
                break
            best_n = max(pair_counts.values())
            if best_n < min_freq:
                break
            best = min(p for p, n in pair_counts.items() if n == best_n)
            merges.append(best)
            a, b = best
            merged = a + b
            new_words = {}
            for w, f in words.items():
                if len(w) > 1:
                    out: List[str] = []
                    i = 0
                    while i < len(w):
                        if i < len(w) - 1 and w[i] == a and w[i + 1] == b:
                            out.append(merged)
                            i += 2
                        else:
                            out.append(w[i])
                            i += 1
                    w = tuple(out)
                new_words[w] = new_words.get(w, 0) + f
            words = new_words
        return cls(merges)

    # -- serialization (merges.txt convention) ------------------------------
    # GPT-2's visible-space marker: symbols may carry a leading space
    # (the pre-tokenizer's " word" pieces), which the space-separated
    # merges.txt format cannot express raw — encode it as 'Ġ' exactly
    # as GPT-2's published merges files do.

    def to_lines(self) -> List[str]:
        enc = lambda s: s.replace(" ", "Ġ")
        return [f"{enc(a)} {enc(b)}" for a, b in self.merges]

    @classmethod
    def from_lines(cls, lines: Iterable[str]) -> "BPETokenizer":
        dec = lambda s: s.replace("Ġ", " ")
        merges = []
        for ln in lines:
            ln = ln.rstrip("\n")
            if not ln or ln.startswith("#"):
                continue
            a, _, b = ln.partition(" ")
            merges.append((dec(a), dec(b)))
        return cls(merges)

    @classmethod
    def from_file(cls, path: str) -> "BPETokenizer":
        with open(path, encoding="utf-8") as fh:
            return cls.from_lines(fh)

    def save(self, path: str) -> None:
        with open(path, "w", encoding="utf-8") as fh:
            fh.write("\n".join(self.to_lines()) + "\n")


# ---------------------------------------------------------------------------
# Spark column surface
# ---------------------------------------------------------------------------


def bpe_token_count_vocab(text, tokenizer: BPETokenizer):
    """Column of exact BPE token counts under `tokenizer`. The merge
    list rides in the UDF closure (ships once per task); encoding is
    per-worker LRU-cached."""
    from pyspark.sql.functions import pandas_udf

    merges = tokenizer.merges
    holder: dict = {}  # one tokenizer (and LRU cache) per worker, not per batch

    @pandas_udf("long")
    def _count(s):  # type: ignore[no-untyped-def]
        import pandas as pd

        tok = holder.get("tok") or holder.setdefault("tok", BPETokenizer(merges))
        return pd.Series([tok.count(t) for t in s.fillna("")], index=s.index)

    return _count(text)


def bpe_tokens(text, tokenizer: BPETokenizer):
    """Column of BPE token arrays (array<string>) — the unit
    pack_sequences splits on when packing in trainer tokens."""
    from pyspark.sql.functions import pandas_udf

    merges = tokenizer.merges
    holder: dict = {}

    @pandas_udf("array<string>")
    def _tokens(s):  # type: ignore[no-untyped-def]
        import pandas as pd

        tok = holder.get("tok") or holder.setdefault("tok", BPETokenizer(merges))
        return pd.Series([tok.encode(t) for t in s.fillna("")], index=s.index)

    return _tokens(text)


def train_bpe_on_sample(
    df,
    text_col: str = "text",
    num_merges: int = 1000,
    sample_rows: int = 10_000,
    seed: int = 7,
) -> BPETokenizer:
    """Induce a BPE merge table from a bounded corpus sample: a seeded
    limit-style sample collects at most `sample_rows` texts to the
    driver (the standard induce-on-sample/apply-to-corpus split), then
    trains driver-side. The returned tokenizer plugs into
    `assign_token_shards(counter=...)` / `pack_sequences(tokenizer=...)`."""
    import pyspark.sql.functions as F

    texts = [
        r[0]
        for r in df.select(text_col)
        .where(F.col(text_col).isNotNull())
        .orderBy(F.xxhash64(text_col, F.lit(seed)))
        .limit(sample_rows)
        .collect()
    ]
    return BPETokenizer.train(texts, num_merges=num_merges)
