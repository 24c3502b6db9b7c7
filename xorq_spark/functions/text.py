"""Text-analysis column operators for training-data pipelines.

All pure Column -> Column expressions over pyspark.sql.functions —
whole-stage-codegen'd, no Python workers, embarrassingly parallel (no
shuffle), so they run at scan speed on any input size.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

# Tiny per-language stopword marker sets for the n-gram/stopword
# language-ID heuristic. Deliberately small: language ID at corpus scale
# is a ranking of marker-hit ratios, not a full model.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "to", "and", "in", "is", "that", "it", "for"),
    "es": ("el", "la", "de", "que", "y", "en", "un", "los", "se", "por"),
    "fr": ("le", "la", "de", "et", "les", "des", "un", "une", "que", "est"),
    "de": ("der", "die", "das", "und", "ist", "von", "ein", "mit", "den", "zu"),
    "zh": ("的", "是", "在", "了", "和", "有", "我", "不", "这", "人"),
}

# GPT-2-ish pre-tokenizer approximation: word pieces, numbers, punctuation
# runs. Used for BPE-like token counting without a vocab.
BPE_ISH_PATTERN = r"'(?:s|t|re|ve|m|ll|d)| ?[a-zA-Z]+| ?[0-9]+| ?[^a-zA-Z0-9\s]+"


def tokenize(text: Column) -> Column:
    """Whitespace tokens (empty-string-safe)."""
    return F.filter(F.split(F.trim(text), r"\s+"), lambda x: x != "")


def token_count(text: Column) -> Column:
    return F.size(tokenize(text))


def bpe_token_count(text: Column) -> Column:
    """APPROXIMATE token count: number of matches of a GPT-2-style
    pre-tokenizer regex — NOT a real BPE tokenizer (no vocab, no merge
    table). ~proportional to real BPE counts and fully JVM-side, so at
    corpus scale it runs at scan speed. When shard budgets must match
    the training tokenizer exactly, use `bpe_token_count_exact` (real
    tiktoken BPE, gated on the wheel being installed) and pass it to
    `assign_token_shards(counter=...)`."""
    return F.regexp_count(text, F.lit(BPE_ISH_PATTERN))


def bpe_token_count_exact(text: Column, encoding: str = "cl100k_base") -> Column:
    """EXACT BPE token count via tiktoken, as an Arrow-batched pandas
    UDF (raises ImportError where the wheel isn't installed — this
    container doesn't ship it, so tests gate on importability).

    Scale notes: the encoder loads once per Python worker (module-level
    cache inside the closure), batches arrive via Arrow, and
    `encode_ordinary_batch` releases the GIL across a thread pool —
    ~1-5 MB/s/core, the standard cost of exact counts. Keep the regex
    approximation for monitoring paths; spend this only where shard
    budgets feed the actual trainer."""
    import tiktoken  # noqa: F401  (gate: raise at definition site)

    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def _count(s):  # type: ignore[no-untyped-def]
        import pandas as pd
        import tiktoken

        enc = tiktoken.get_encoding(encoding)
        toks = enc.encode_ordinary_batch(s.fillna("").tolist())
        return pd.Series([len(t) for t in toks], index=s.index)

    return _count(text)


def language_id(text: Column, default: str = "und") -> Column:
    """Stopword-marker language ID: ratio of tokens hitting each
    language's marker set; argmax wins, `default` when nothing hits.

    One pass over the token array per language (JVM lambda); returns the
    best language code as a string."""
    toks = F.transform(tokenize(F.lower(text)), lambda x: F.regexp_replace(x, r"[^\w一-鿿]", ""))
    n = F.greatest(F.size(toks), F.lit(1))
    best = F.lit(default)
    best_score = F.lit(0.0)
    for lang, markers in LANG_MARKERS.items():
        marker_arr = F.array(*[F.lit(m) for m in markers])
        score = F.size(F.filter(toks, lambda x: F.array_contains(marker_arr, x))) / n
        is_better = score > best_score
        best = F.when(is_better, F.lit(lang)).otherwise(best)
        best_score = F.when(is_better, score).otherwise(best_score)
    return best


def quality_score(text: Column) -> Column:
    """Heuristic document quality in [0,1]: blend of length band, mean
    word length band, stopword presence, alpha ratio, and repetition
    (distinct-token ratio). The shape mirrors Gopher/C4-style filters."""
    toks = tokenize(text)
    n = F.size(toks)
    n_f = n.cast("double")
    mean_len = F.when(
        n > 0,
        F.aggregate(toks, F.lit(0), lambda a, x: a + F.length(x)).cast("double") / n_f,
    ).otherwise(F.lit(0.0))
    en = F.array(*[F.lit(m) for m in LANG_MARKERS["en"]])
    stop_ratio = F.when(n > 0, F.size(F.filter(toks, lambda x: F.array_contains(en, F.lower(x)))) / n_f).otherwise(F.lit(0.0))
    alpha_ratio = F.when(
        F.length(text) > 0,
        F.length(F.regexp_replace(text, r"[^a-zA-Z一-鿿]", "")).cast("double")
        / F.length(text),
    ).otherwise(F.lit(0.0))
    distinct_ratio = F.when(n > 0, F.size(F.array_distinct(toks)) / n_f).otherwise(F.lit(0.0))

    len_band = F.when((n >= 20) & (n <= 10000), 1.0).when(n >= 5, 0.5).otherwise(0.0)
    wordlen_band = F.when((mean_len >= 3) & (mean_len <= 12), 1.0).otherwise(0.3)
    return (
        0.25 * len_band
        + 0.15 * wordlen_band
        + 0.20 * F.least(stop_ratio * 5, F.lit(1.0))
        + 0.20 * alpha_ratio
        + 0.20 * distinct_ratio
    )


def fingerprint(text: Column) -> Column:
    """Canonical bag-of-words fingerprint: md5 over the sorted distinct
    token set of the normalized text. Near-identical docs that differ
    only in token order/duplication collide — the cheap tier of dedup."""
    canon = F.array_join(F.array_sort(F.array_distinct(tokenize(F.lower(text)))), " ")
    return F.md5(canon)


def assign_token_shards(
    df,
    text_col: str = "text",
    id_col: str = "doc_id",
    tokens_per_shard: int = 100_000,
    partition_cols=("lang",),
    counter=None,
):
    """Contiguous training-shard assignment by token budget: order
    documents deterministically within each partition (e.g. language),
    accumulate token counts (`counter` defaults to the JVM-side
    BPE-ish regex; pass `bpe_token_count_exact` when budgets must match
    the training tokenizer), and cut a new shard every
    `tokens_per_shard` tokens. Returns the input plus (n_tokens,
    shard_id) — shard_id = floor(tokens-before-this-doc / budget), so a
    document always lands in the shard where it STARTS (shards overflow
    by at most one document, the standard contiguous-packing rule).

    Scale design: one window shuffle keyed on `partition_cols` — the
    same single-pass prefix-sum a sort-based writer needs anyway. At
    100 TB the partition key must be fine-grained enough that one
    partition's documents fit a single task's sort spill; language (or
    language × date bucket) is the usual choice. Deterministic: ordering
    is (id) within partition, so reruns produce identical shards."""
    from pyspark.sql import Window

    parts = list(partition_cols)
    w = (
        Window.partitionBy(*parts)
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    count = counter or bpe_token_count
    out = df.withColumn("n_tokens", count(F.col(text_col)).cast("long"))
    cum = F.sum("n_tokens").over(w)
    return out.withColumn(
        "shard_id",
        F.floor((cum - F.col("n_tokens")) / F.lit(tokens_per_shard)).cast("long"),
    )


def rolling_hash(text: Column, base: int = 257) -> Column:
    """Polynomial rolling hash over characters (Rabin-Karp style),
    computed with a JVM-side aggregate lambda: h = (h*base + code) % m.

    m = 2^31-1 keeps (h*base + code) within int64 at every step."""
    m = (1 << 31) - 1
    chars = F.split(text, "")
    return F.aggregate(
        F.filter(chars, lambda c: c != ""),
        F.lit(0).cast("long"),
        lambda acc, c: (acc * base + F.ascii(c)) % m,
    )


# --- PII redaction ---------------------------------------------------------

# Patterns chosen to mean the same thing in Java regex (Spark) and RE2
# (DuckDB): no lookaround, no backrefs.
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "phone": r"\+?\d[\d\-\s()]{7,}\d",
    "ipv4": r"\b(?:\d{1,3}\.){3}\d{1,3}\b",
}


def redact_pii(text: Column, kinds=("email", "phone", "ipv4"),
               token: str = "[PII]") -> Column:
    """Replace PII-looking spans with `token` — chained JVM-side
    regexp_replace, codegen'd, no Python workers: a scrub pass a
    training pipeline runs over every document at scan speed. Order
    matters (emails before phones so a number inside an address isn't
    half-eaten); the chain applies kinds in the declared order."""
    out = text
    for kind in kinds:
        out = F.regexp_replace(out, PII_PATTERNS[kind], token)
    return out


def pii_count(text: Column, kind: str) -> Column:
    """How many spans of one PII kind occur (audit metric)."""
    return F.regexp_count(text, F.lit(PII_PATTERNS[kind]))


def repetition_ratio(text: Column, sep: str = "\n") -> Column:
    """Fraction of repeated lines: 1 - distinct_lines/lines. The
    classic boilerplate signal (nav bars, cookie banners) — high ratio
    means the document is mostly repeated structure. Pure array ops,
    JVM-side, no shuffle."""
    lines = F.filter(F.split(text, sep), lambda x: F.trim(x) != "")
    n = F.size(lines)
    return F.when(n <= 0, F.lit(0.0)).otherwise(
        1.0 - F.size(F.array_distinct(lines)) / n
    )


def contamination_flags(
    corpus,
    benchmark,
    text_col: str = "text",
    id_col: str = "doc_id",
    bench_text_col: str = "text",
    n: int = 8,
    min_hits: int = 1,
):
    """Benchmark decontamination: flag corpus documents sharing word
    n-grams with an evaluation set (the standard train/test-overlap
    scrub before training). Returns the corpus ids plus
    (contam_hits, contaminated).

    Scale design: benchmarks are tiny relative to a 100 TB corpus, so
    the benchmark's distinct n-gram set broadcasts; the corpus side is
    one scan with an explode and a broadcast hash join — no shuffle of
    corpus data. `n=8` is the common contamination window (large
    enough that collisions are overwhelmingly true overlap); raise
    `min_hits` to require multiple independent overlapping windows."""
    from xorq_spark.functions.dedup import shingles

    bench_grams = (
        benchmark.select(
            F.explode(shingles(F.col(bench_text_col), n)).alias("__gram")
        )
        .distinct()
    )
    corpus_grams = corpus.select(
        F.col(id_col), F.explode(shingles(F.col(text_col), n)).alias("__gram")
    )
    hits = (
        corpus_grams.join(F.broadcast(bench_grams), "__gram")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("contam_hits"))
    )
    return (
        corpus.select(id_col)
        .join(hits, id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col("contam_hits"), F.lit(0)).alias("contam_hits"),
            (F.coalesce(F.col("contam_hits"), F.lit(0)) >= min_hits).alias(
                "contaminated"
            ),
        )
    )


def chunk_documents(
    df,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_tokens: int = 64,
    overlap_tokens: int = 8,
):
    """Split documents into overlapping fixed-token-budget chunks — the
    context-window packing step of a training/embedding pipeline.

    Chunk i covers whitespace tokens [i*stride, i*stride + chunk_tokens)
    with stride = chunk_tokens - overlap_tokens, so consecutive chunks
    share `overlap_tokens` tokens and every token belongs to at least
    one chunk. Empty/whitespace-only documents yield zero chunks.

    Returns one row per chunk: (id_col, chunk_id, n_chunk_tokens,
    chunk_text). Entirely JVM-side (split + sequence + slice +
    posexplode): chunking runs at scan speed with no shuffle — the
    explode multiplies rows ~n_tokens/stride-fold, so follow with a
    repartition only if the next stage needs a different key anyway.
    """
    if overlap_tokens >= chunk_tokens:
        raise ValueError("overlap_tokens must be < chunk_tokens")
    stride = chunk_tokens - overlap_tokens
    toks = tokenize(F.col(text_col))
    # null-safe count: under ANSI size(NULL) is NULL, and NULL would
    # slip past the <= 0 guard via greatest(NULL, 0) = 0 below
    n = F.coalesce(F.size(toks), F.lit(0))
    n_chunks = F.when(n <= 0, F.lit(0)).otherwise(
        F.floor(
            F.greatest(n - F.lit(overlap_tokens) - F.lit(1), F.lit(0))
            / F.lit(stride)
        )
        + F.lit(1)
    )
    # guard: sequence(0, -1) would generate a DESCENDING [0, -1] (Spark
    # sequences run backwards when start > stop), and size(NULL) is -1 —
    # so only build the chunk list when there is at least one chunk;
    # the NULL otherwise-branch makes posexplode emit zero rows.
    chunks = F.when(
        n_chunks > 0,
        F.transform(
            F.sequence(F.lit(0), n_chunks.cast("int") - 1),
            lambda i: F.slice(toks, i * stride + 1, chunk_tokens),
        ),
    )
    exploded = (
        df.withColumn("__chunks", chunks)
        .select(
            id_col,
            F.posexplode("__chunks").alias("chunk_id", "__chunk"),
        )
    )
    return exploded.select(
        id_col,
        "chunk_id",
        F.size("__chunk").alias("n_chunk_tokens"),
        F.array_join("__chunk", " ").alias("chunk_text"),
    )


def char_entropy(text: Column) -> Column:
    """Character-unigram Shannon entropy (nats) — the cheap perplexity
    proxy: repetitive/boilerplate garbage scores low, natural text
    high, making it a useful curation filter when no language model is
    available. NULL/empty text scores 0.

    Entirely JVM HOFs: O(distinct_chars x length) per row, no shuffle.
    The distinct-char list is SORTED before the fold so the
    floating-point summation order is identical on every engine
    (docs/ORACLE_PARITY.md)."""
    chars = F.filter(F.split(text, ""), lambda x: x != "")
    n = F.size(chars).cast("double")
    d = F.array_sort(F.array_distinct(chars))
    term = lambda c: let_p(chars, c, n)
    ent = F.aggregate(d, F.lit(0.0), lambda acc, c: acc - term(c))
    return F.coalesce(F.when(n > 0, ent), F.lit(0.0))


def let_p(chars: Column, c: Column, n: Column) -> Column:
    """p*ln(p) for one character's frequency (helper for char_entropy)."""
    p = F.size(F.filter(chars, lambda x: x == c)).cast("double") / n
    return p * F.log(p)


# --- Gopher-style quality rules -------------------------------------------

# Thresholds from the published Gopher data-curation rules (Rae et al.
# 2021, table A1): documents outside these bands are filtered before
# training.
GOPHER_MIN_WORDS = 50
GOPHER_MAX_WORDS = 100_000
GOPHER_MIN_MEAN_WORD_LEN = 3.0
GOPHER_MAX_MEAN_WORD_LEN = 10.0
GOPHER_MAX_SYMBOL_RATIO = 0.1
GOPHER_MAX_BULLET_FRAC = 0.9
GOPHER_MAX_ELLIPSIS_FRAC = 0.3
GOPHER_MIN_ALPHA_FRAC = 0.8


def gopher_flags(text: Column, sep: str = "\n") -> Column:
    """The Gopher repetition/format quality rules as one struct column:

    - n_words, mean_word_len
    - symbol_word_ratio: (# + ellipsis occurrences) / words
    - bullet_line_frac / ellipsis_line_frac: lines starting with a
      bullet glyph / ending with an ellipsis
    - alpha_word_frac: words containing at least one A-Za-z character
    - passes: conjunction of the published thresholds

    Pure JVM higher-order functions over the token and line arrays —
    codegen'd, zero shuffle, so the full rule set runs at scan speed
    over any corpus size. NULL/empty text yields zeroed metrics and
    passes=false."""
    toks = tokenize(text)
    n = F.coalesce(F.size(toks), F.lit(0))
    n_f = F.greatest(n, F.lit(1)).cast("double")
    mean_len = F.when(
        n > 0,
        F.aggregate(toks, F.lit(0), lambda a, x: a + F.length(x)).cast("double")
        / n_f,
    ).otherwise(F.lit(0.0))
    sym = (
        F.coalesce(F.regexp_count(text, F.lit("#")), F.lit(0))
        + F.coalesce(F.regexp_count(text, F.lit(r"\.\.\.")), F.lit(0))
        + F.coalesce(F.regexp_count(text, F.lit("…")), F.lit(0))
    )
    symbol_ratio = sym.cast("double") / n_f
    import re as _re

    lines = F.filter(
        F.split(F.coalesce(text, F.lit("")), _re.escape(sep)),
        lambda x: F.trim(x) != "",
    )
    n_lines_f = F.greatest(F.size(lines), F.lit(1)).cast("double")
    bullet_frac = (
        F.size(
            F.filter(lines, lambda x: F.trim(x).rlike(r"^[-*•▪●]"))
        )
        / n_lines_f
    )
    ellipsis_frac = (
        F.size(F.filter(lines, lambda x: F.trim(x).rlike(r"(\.\.\.|…)$")))
        / n_lines_f
    )
    alpha_frac = (
        F.size(F.filter(toks, lambda x: x.rlike("[A-Za-z]"))) / n_f
    )
    passes = (
        (n >= GOPHER_MIN_WORDS)
        & (n <= GOPHER_MAX_WORDS)
        & (mean_len >= GOPHER_MIN_MEAN_WORD_LEN)
        & (mean_len <= GOPHER_MAX_MEAN_WORD_LEN)
        & (symbol_ratio <= GOPHER_MAX_SYMBOL_RATIO)
        & (bullet_frac <= GOPHER_MAX_BULLET_FRAC)
        & (ellipsis_frac <= GOPHER_MAX_ELLIPSIS_FRAC)
        & (alpha_frac >= GOPHER_MIN_ALPHA_FRAC)
    )
    return F.struct(
        n.alias("n_words"),
        mean_len.alias("mean_word_len"),
        symbol_ratio.alias("symbol_word_ratio"),
        bullet_frac.alias("bullet_line_frac"),
        ellipsis_frac.alias("ellipsis_line_frac"),
        alpha_frac.alias("alpha_word_frac"),
        passes.alias("passes"),
    )


# Gopher repetition thresholds (Rae et al. 2021, table A1): maximum
# allowed duplicate-segment and repeated-n-gram character fractions.
GOPHER_MAX_DUP_LINE_FRAC = 0.30
GOPHER_MAX_DUP_PARA_FRAC = 0.30
GOPHER_MAX_DUP_LINE_CHAR_FRAC = 0.20
GOPHER_MAX_DUP_PARA_CHAR_FRAC = 0.20
GOPHER_MAX_TOP_NGRAM_CHAR_FRAC = {2: 0.20, 3: 0.18, 4: 0.16}
GOPHER_MAX_DUP_NGRAM_CHAR_FRAC = {
    5: 0.15, 6: 0.14, 7: 0.13, 8: 0.12, 9: 0.11, 10: 0.10,
}


def _dup_segment_fracs(txt: Column, sep: str):
    """(dup_frac, dup_char_frac) for sep-delimited segments: the
    fraction of segments (and of segment characters) that are repeats
    beyond each segment's first occurrence. Trimmed, blank-dropped.
    Pure HOFs — order-independent sums, zero shuffle."""
    import re as _re

    segs = F.transform(
        F.filter(F.split(txt, _re.escape(sep)), lambda x: F.trim(x) != ""),
        F.trim,
    )
    uniq = F.array_distinct(segs)
    n = F.size(segs)
    chars = F.aggregate(segs, F.lit(0), lambda a, x: a + F.length(x))
    uchars = F.aggregate(uniq, F.lit(0), lambda a, x: a + F.length(x))
    dup_frac = (n - F.size(uniq)).cast("double") / F.greatest(n, F.lit(1))
    dup_char_frac = (chars - uchars).cast("double") / F.greatest(
        chars, F.lit(1)
    )
    return dup_frac, dup_char_frac


def _ngram_array(toks: Column, n: int) -> Column:
    """Word n-grams (space-joined) of a token array; empty when the
    document is shorter than n."""
    n_toks = F.coalesce(F.size(toks), F.lit(0))
    return F.when(
        n_toks >= n,
        F.transform(
            F.sequence(F.lit(0), n_toks - n),
            lambda i: F.array_join(F.slice(toks, i + 1, n), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))


def _sorted_run_top_chars(s: Column) -> Column:
    """count(top) * length(top) for the most frequent n-gram (ties
    break to the lexicographically smallest — deterministic across
    engines), given the SORTED gram array as a materialized column
    attribute. Sorting makes duplicates adjacent, so one aggregate()
    fold finds the longest run: O(G) per document, zero shuffle."""
    acc = F.aggregate(
        s,
        F.struct(
            F.lit(None).cast("string").alias("prev"),
            F.lit(0).alias("run"),
            F.lit(0).alias("best"),
            F.lit("").alias("bestg"),
        ),
        lambda a, x: F.struct(
            x.alias("prev"),
            F.when(x == a["prev"], a["run"] + 1).otherwise(F.lit(1)).alias("run"),
            F.when(
                F.when(x == a["prev"], a["run"] + 1).otherwise(F.lit(1))
                > a["best"],
                F.when(x == a["prev"], a["run"] + 1).otherwise(F.lit(1)),
            ).otherwise(a["best"]).alias("best"),
            F.when(
                F.when(x == a["prev"], a["run"] + 1).otherwise(F.lit(1))
                > a["best"],
                x,
            ).otherwise(a["bestg"]).alias("bestg"),
        ),
    )
    return acc["best"] * F.length(acc["bestg"])


def _dupset(s: Column) -> Column:
    """Distinct grams occurring 2+ times, given the SORTED gram array
    as a materialized column attribute: duplicates are adjacent after
    sorting, so equality-with-previous finds them in one pass."""
    return F.array_distinct(
        F.filter(
            F.transform(
                s,
                lambda x, j: F.when(
                    (j >= 1) & (x == F.element_at(s, j)), x
                ),
            ),
            lambda v: v.isNotNull(),
        )
    )


def _pushdown_barrier(c: Column) -> Column:
    """Optimizer-only barrier: wrapping a metric in an always-true
    nondeterministic guard stops predicate pushdown / projection
    collapse from substituting the metric's DEFINITION into a filter
    below the staged array projections — which would re-inline the
    gram arrays inside lambda elements and bring back the O(G²)
    rebuild pathology (measured: a filter on dup_5gram_char_frac hung
    a 500-doc count). Values are unchanged; only the plan shape is
    pinned."""
    return F.when(F.monotonically_increasing_id() >= 0, c)


def _gopher_repetition_arrow(
    df, text_col, id_col, sep, para_sep, top_ns, dup_ns
):
    """Arrow-batched replay of the gopher_repetition contract: the same
    integers per document, computed with Counter/set in Python instead
    of ~20 interpreted JVM HOF array builds. Contract details mirrored
    EXACTLY (pytest-asserted equal to the 'hof' path):

    - tokenization = Spark `trim` (space chars only) + Java-regex
      `\\s+` (ASCII [ \\t\\n\\x0b\\f\\r] — NOT Python's unicode \\s),
      empty tokens dropped;
    - segment split = literal separator, segments space-trimmed,
      blanks dropped; char counts are codepoint counts of the
      TRIMMED segments;
    - rounding = Spark ROUND on double: BigDecimal(repr).setScale(9,
      HALF_UP) — Decimal(repr(x)).quantize(1e-9, HALF_UP) in Python,
      NOT round() (banker's).

    Zero shuffle, embarrassingly parallel — same scale story as the
    HOF path, minus the interpreted-lambda constant factor."""
    import re as _re
    from decimal import Decimal, ROUND_HALF_UP

    _ws = _re.compile(r"[ \t\n\x0b\f\r]+")
    _q = Decimal("0.000000001")

    def _round9(x: float) -> float:
        return float(Decimal(repr(float(x))).quantize(_q, ROUND_HALF_UP))

    top_thr = {n: GOPHER_MAX_TOP_NGRAM_CHAR_FRAC.get(n, 1.0) for n in top_ns}
    dup_thr = {n: GOPHER_MAX_DUP_NGRAM_CHAR_FRAC.get(n, 1.0) for n in dup_ns}

    def _seg_fracs(txt: str, s: str):
        segs = [p.strip(" ") for p in txt.split(s)]
        segs = [p for p in segs if p != ""]
        n = len(segs)
        uniq = set(segs)
        chars = sum(len(p) for p in segs)
        uchars = sum(len(p) for p in uniq)
        df_ = (n - len(uniq)) / max(n, 1)
        dcf = (chars - uchars) / max(chars, 1)
        return _round9(df_), _round9(dcf)

    id_type = dict(df.dtypes)[id_col]
    fields = [f"{id_col} {id_type}", "dup_line_frac double",
              "dup_line_char_frac double"]
    if para_sep is not None:
        fields += ["dup_para_frac double", "dup_para_char_frac double"]
    fields += [f"top_{n}gram_char_frac double" for n in top_ns]
    fields += [f"dup_{n}gram_char_frac double" for n in dup_ns]
    fields += ["passes boolean"]
    schema = ", ".join(fields)

    def compute(batches):
        import pandas as pd
        from collections import Counter

        for pdf in batches:
            out = {f.split()[0]: [] for f in fields}
            for did, raw in zip(pdf[id_col], pdf[text_col]):
                txt = raw if isinstance(raw, str) else ""
                toks = [t for t in _ws.split(txt.strip(" ")) if t != ""]
                lens = [len(t) for t in toks]
                tok_chars = max(sum(lens), 1)
                text_chars = max(len(txt), 1)
                passes = True

                dl, dlc = _seg_fracs(txt, sep)
                out["dup_line_frac"].append(dl)
                out["dup_line_char_frac"].append(dlc)
                passes = (
                    passes
                    and dl <= GOPHER_MAX_DUP_LINE_FRAC
                    and dlc <= GOPHER_MAX_DUP_LINE_CHAR_FRAC
                )
                if para_sep is not None:
                    dp, dpc = _seg_fracs(txt, para_sep)
                    out["dup_para_frac"].append(dp)
                    out["dup_para_char_frac"].append(dpc)
                    passes = (
                        passes
                        and dp <= GOPHER_MAX_DUP_PARA_FRAC
                        and dpc <= GOPHER_MAX_DUP_PARA_CHAR_FRAC
                    )

                grams_by_n = {}
                for n in sorted(set(top_ns) | set(dup_ns)):
                    grams_by_n[n] = (
                        [" ".join(toks[i:i + n])
                         for i in range(len(toks) - n + 1)]
                        if len(toks) >= n else []
                    )
                for n in top_ns:
                    grams = grams_by_n[n]
                    if grams:
                        c = Counter(grams)
                        m = max(c.values())
                        g = min(x for x, k in c.items() if k == m)
                        frac = _round9(m * len(g) / text_chars)
                    else:
                        frac = 0.0
                    out[f"top_{n}gram_char_frac"].append(frac)
                    passes = passes and frac <= top_thr[n]
                for n in dup_ns:
                    grams = grams_by_n[n]
                    c = Counter(grams)
                    dupg = {x for x, k in c.items() if k >= 2}
                    covered = set()
                    for i, g in enumerate(grams):
                        if g in dupg:
                            covered.update(range(i, i + n))
                    chars = sum(lens[p] for p in covered)
                    frac = _round9(chars / tok_chars)
                    out[f"dup_{n}gram_char_frac"].append(frac)
                    passes = passes and frac <= dup_thr[n]
                out[id_col].append(did)
                out["passes"].append(passes)
            yield pd.DataFrame(out)

    return df.select(id_col, text_col).mapInPandas(compute, schema)


def gopher_repetition(
    df,
    text_col: str = "text",
    id_col: str = "doc_id",
    sep: str = "\n",
    para_sep: str | None = None,
    top_ns: tuple[int, ...] = (2, 3, 4),
    dup_ns: tuple[int, ...] = (5, 6, 7, 8, 9, 10),
    impl: str = "arrow",
):
    """The Gopher REPETITION rules (Rae et al. 2021, table A1) — the
    companion of `gopher_flags`' format rules. Returns (id_col,
    metrics..., passes):

    - dup_line_frac / dup_line_char_frac: fraction of sep-delimited
      segments (and their characters) that are repeats beyond the
      first occurrence
    - dup_para_frac / dup_para_char_frac: same over para_sep (emitted
      only when para_sep is given)
    - top_{n}gram_char_frac for n in top_ns: chars of the most
      frequent word n-gram (count × length, ties to the smallest
      gram) over the document's character count
    - dup_{n}gram_char_frac for n in dup_ns: chars of tokens covered
      by any n-gram occurring 2+ times, over total token chars
      (overlaps counted once)
    - passes: conjunction of the published thresholds

    Scale design: ENTIRELY per-document JVM higher-order functions —
    duplicate detection via array_distinct / sorted-run folding, no
    explode, no groupBy, ZERO shuffle: scan-speed and embarrassingly
    parallel at any corpus size. Intermediate arrays (tokens, each
    n-gram array, its sorted copy, its duplicate set) are materialized
    as staged projection columns so every array is built ONCE per row —
    a single nested column expression would re-evaluate the gram array
    inside each lambda element, turning O(G log G) per document into
    O(G²) array rebuilds (measured: pathological). Fractions round to
    9 digits (exact-integer ratios — engine-independent).

    `impl` picks the execution path — the semdedup GEMM precedent:
    'arrow' (default) computes the identical integers per document in
    an Arrow-batched mapInPandas pass (Counter/set per doc beats ~20
    interpreted HOF array builds per row by ~6x, measured at sf0.1);
    'hof' keeps the pure-JVM staged-projection path. Both replicate
    the same contract — Java-ASCII whitespace tokenization, space-only
    trim, repr-based HALF_UP rounding — and a pytest asserts they are
    row-identical on the corpus and on unicode adversaries; the DuckDB
    oracle certifies whichever path ran."""
    if impl == "arrow":
        return _gopher_repetition_arrow(
            df, text_col, id_col, sep, para_sep, top_ns, dup_ns
        )
    txt = F.coalesce(F.col(text_col), F.lit(""))

    # stage 1: base arrays, built once per row
    stage = df.select(
        F.col(id_col),
        txt.alias("_txt"),
        tokenize(txt).alias("_toks"),
    ).select(
        id_col,
        "_txt",
        "_toks",
        F.transform("_toks", F.length).alias("_lens"),
    )
    # stage 2: per-n gram arrays (one build each)
    gram_cols = {}
    for n in sorted(set(top_ns) | set(dup_ns)):
        gram_cols[n] = f"_g{n}"
    stage = stage.select(
        "*",
        *[
            _ngram_array(F.col("_toks"), n).alias(c)
            for n, c in gram_cols.items()
        ],
    )
    # stage 3: sorted copies (adjacent duplicates); stage 4: duplicate
    # sets for dup_ns — from the sorted ATTRIBUTE so the one-pass
    # adjacency scan never rebuilds the array per element
    sorted_cols = {n: f"_s{n}" for n in sorted(set(top_ns) | set(dup_ns))}
    dup_cols = {n: f"_d{n}" for n in dup_ns}
    stage = stage.select(
        "*",
        *[F.array_sort(gram_cols[n]).alias(c) for n, c in sorted_cols.items()],
    )
    stage = stage.select(
        "*",
        *[
            _dupset(F.col(sorted_cols[n])).alias(c)
            for n, c in dup_cols.items()
        ],
    )

    named = []  # (name, raw column) pairs; barrier applied at the end
    passes = F.lit(True)

    dl, dlc = _dup_segment_fracs(F.col("_txt"), sep)
    dl, dlc = F.round(dl, 9), F.round(dlc, 9)
    named += [("dup_line_frac", dl), ("dup_line_char_frac", dlc)]
    passes = (
        passes
        & (dl <= GOPHER_MAX_DUP_LINE_FRAC)
        & (dlc <= GOPHER_MAX_DUP_LINE_CHAR_FRAC)
    )

    if para_sep is not None:
        dp, dpc = _dup_segment_fracs(F.col("_txt"), para_sep)
        dp, dpc = F.round(dp, 9), F.round(dpc, 9)
        named += [
            ("dup_para_frac", dp),
            ("dup_para_char_frac", dpc),
        ]
        passes = (
            passes
            & (dp <= GOPHER_MAX_DUP_PARA_FRAC)
            & (dpc <= GOPHER_MAX_DUP_PARA_CHAR_FRAC)
        )

    text_chars = F.greatest(F.length("_txt"), F.lit(1))
    for n in top_ns:
        frac = F.round(
            _sorted_run_top_chars(F.col(sorted_cols[n])).cast("double")
            / text_chars,
            9,
        )
        named.append((f"top_{n}gram_char_frac", frac))
        passes = passes & (
            frac <= GOPHER_MAX_TOP_NGRAM_CHAR_FRAC.get(n, 1.0)
        )

    tok_chars = F.greatest(
        F.aggregate("_lens", F.lit(0), lambda a, x: a + x), F.lit(1)
    )
    for n in dup_ns:
        # duplicated-gram start indices via the index-lambda (the gram
        # and dupset columns are plain attributes here — cheap per
        # element, no array rebuilds)
        starts = F.filter(
            F.transform(
                gram_cols[n],
                lambda x, i: F.when(
                    F.array_contains(F.col(dup_cols[n]), x), i
                ),
            ),
            lambda v: v.isNotNull(),
        )
        covered = F.array_distinct(
            F.flatten(
                F.transform(starts, lambda i: F.sequence(i, i + n - 1))
            )
        )
        chars = F.aggregate(
            covered,
            F.lit(0),
            lambda a, p: a + F.element_at(F.col("_lens"), p + 1),
        )
        frac = F.round(chars.cast("double") / tok_chars, 9)
        named.append((f"dup_{n}gram_char_frac", frac))
        passes = passes & (
            frac <= GOPHER_MAX_DUP_NGRAM_CHAR_FRAC.get(n, 1.0)
        )

    named.append(("passes", passes))
    # id passes through untouched (join keys may push); every metric
    # gets the barrier so downstream filters evaluate the PROJECTED
    # column, never an inlined redefinition
    return stage.select(
        F.col(id_col),
        *[_pushdown_barrier(c).alias(name) for name, c in named],
    )


def tfidf_topk(df, text_col: str = "text", id_col: str = "doc_id", k: int = 3):
    """Top-k terms per document by tf-idf (tf = in-document count,
    idf = ln(N_docs / doc_frequency)) — the classic corpus keyword /
    topic-signal extractor a curation pipeline uses for mixture
    labeling. Ties break on the rounded score then term text, so
    results are deterministic and engine-independent.

    Returns (id_col, rank, term, tf, doc_freq, tfidf).

    Scale design: one explode + (doc, term) map-side-combinable count;
    doc-frequency via a window over the already-aggregated (doc, term)
    frame (one shuffle on term); the corpus size N attaches as a
    broadcast single-row aggregate (no driver collect); final top-k is
    a row_number window over each document. No Python, no all-pairs.
    """
    from pyspark.sql import Window

    terms = df.select(
        F.col(id_col), F.explode(tokenize(F.lower(F.col(text_col)))).alias("term")
    )
    tf = terms.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    with_df = tf.withColumn(
        "doc_freq", F.count(F.lit(1)).over(Window.partitionBy("term"))
    )
    total = df.agg(F.count_distinct(F.col(id_col)).alias("__n_docs"))
    scored = with_df.join(F.broadcast(total)).withColumn(
        "tfidf",
        F.round(
            F.col("tf") * F.log(F.col("__n_docs") / F.col("doc_freq")), 9
        ),
    )
    w = Window.partitionBy(id_col).orderBy(
        F.col("tfidf").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(id_col, "rank", "term", "tf", "doc_freq", "tfidf")
    )


def pack_sequences(
    df,
    text_col: str = "text",
    id_col: str = "doc_id",
    seq_tokens: int = 512,
    partition_cols=("lang",),
    tokenizer=None,
):
    """Training-sequence packing: concatenate documents (in
    deterministic id order within each partition group) into one token
    stream and cut it into fixed-length sequences of `seq_tokens`,
    crossing document boundaries — the standard last step before a
    trainer consumes the corpus (every sequence but each group's final
    one is exactly full; nothing is padded or dropped).

    Returns one row per packed sequence: (*partition_cols, seq_id,
    n_tokens, seq_text), with seq_id dense from 0 within each group.

    Scale design: per-document token counts first (whitespace tokens —
    the same unit the packer splits on, so offsets and token positions
    agree exactly; for BPE-budget whole-document packing use
    assign_token_shards), then ONE window
    prefix-sum per partition group gives each document its global token
    offset — the same single sort a shard writer needs. The token-level
    explode is the honest cost of packing (every token must move to its
    sequence); rows shuffle once, keyed by the (group, seq_id) pair,
    and sequence reassembly is an ordered in-group collect bounded by
    seq_tokens elements. Partition groups must be fine enough that one
    group's documents fit a task's sort spill at the target scale —
    language (x date bucket) is the usual choice.

    `tokenizer`: None packs in whitespace tokens (JVM-side, the
    oracle-stable default); a functions.bpe.BPETokenizer packs in REAL
    trainer tokens (Arrow-batched pandas UDF computes each document's
    token array once; everything downstream — offsets, explode,
    reassembly — is identical)."""
    from pyspark.sql import Window

    parts = list(partition_cols)
    if tokenizer is not None:
        from xorq_spark.functions.bpe import bpe_tokens

        toks = bpe_tokens(F.col(text_col), tokenizer)
    else:
        toks = tokenize(F.col(text_col))
    w = (
        Window.partitionBy(*parts)
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # one __toks projection: the (possibly Python-UDF) tokenization runs
    # once per document; count and explode both read the materialized
    # array
    with_toks = df.withColumn("__toks", toks)
    with_off = with_toks.withColumn(
        "__n", F.coalesce(F.size("__toks"), F.lit(0)).cast("long")
    ).withColumn("__off", F.sum("__n").over(w) - F.col("__n"))
    token_rows = with_off.select(
        *parts,
        F.col("__off"),
        F.posexplode(F.col("__toks")).alias("__pos", "__tok"),
    ).select(
        *parts,
        ((F.col("__off") + F.col("__pos")) / F.lit(seq_tokens))
        .cast("long")
        .alias("seq_id"),
        ((F.col("__off") + F.col("__pos")) % F.lit(seq_tokens)).alias("__seq_pos"),
        F.col("__tok"),
    )
    return (
        token_rows.groupBy(*parts, "seq_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("__seq_pos", "__tok"))),
                    lambda s: s["__tok"],
                ),
                " ",
            ).alias("seq_text"),
        )
    )


def lm_score(
    df,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 1,
    train_df=None,
):
    """CCNet-style language-model quality signal: per-document average
    negative log-probability under an add-k-smoothed bigram model
    trained on `train_df` (default: the scored corpus itself — the
    self-scoring CCNet shape; pass a target-domain slice to get
    DSIR-style domain-affinity scores instead). High scores flag
    unnatural text (boilerplate, machine gibberish, wrong-language
    fragments) — the perplexity-filtering half of CCNet, next to
    `line_dedup`'s boilerplate-scrub half.

    Model (pure counting, engine-mirrorable):
        P(w2|w1) = (c(w1,w2) + k) / (c(w1,*) + k*V)
        score(d) = -(1/T_d) * sum over d's bigrams of ln P(w2|w1)
    with V = corpus vocabulary size. Tokens are lowercased whitespace
    words; documents with < 2 tokens get a NULL score.

    Determinism contract: each bigram's log-prob rounds to 9 decimals
    (the same contract the green tf-idf oracle relies on — ln of a
    rational of small ints agrees across engines), and the per-doc mean
    rounds to 6, far above the double-summation order noise (~1e-10).

    Scale: two groupBy shuffles build the model (bigram + left-context
    counts, map-side combinable), one bigram-keyed join scores the
    corpus. Vocabulary size is a single-row aggregate joined via
    broadcast — nothing collects to the driver.
    """
    toks = F.filter(
        F.split(F.trim(F.lower(F.col(text_col))), r"\s+"), lambda x: x != ""
    )

    def _bigrams(frame, id_expr):
        # tokenize ONCE and pin the token-array frame (lazy checkpoint:
        # the first consumer folds the materialization into its own
        # job): the bigram stream AND the vocabulary aggregate both
        # read it — previously the single-row vocab count re-scanned
        # the source and re-ran the regex split over the whole corpus.
        base = frame.select(
            id_expr.alias("__id"), toks.alias("__toks")
        ).localCheckpoint(eager=False)
        n_tok = F.size("__toks")
        bg = base.select(
            "__id",
            F.explode(
                F.zip_with(
                    F.slice("__toks", 1, F.greatest(n_tok - 1, F.lit(0))),
                    F.slice("__toks", 2, F.greatest(n_tok - 1, F.lit(0))),
                    lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
                )
            ).alias("bg"),
        ).select("__id", F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2"))
        return base, bg

    base, bigrams = _bigrams(df, F.col(id_col))
    # Pin the bigram stream: the model counts (c_bi, c_uni) and the
    # scoring join all consume it — without materialization each branch
    # re-reads the token frame and re-runs zip+explode (the nb_classify
    # lesson; at cluster scale persist it MEMORY_AND_DISK instead).
    bigrams = bigrams.localCheckpoint(eager=True)
    if train_df is None:
        model_base, model_bigrams = base, bigrams
    else:
        model_base, model_bigrams = _bigrams(train_df, F.lit(0))
        model_bigrams = model_bigrams.localCheckpoint(eager=True)

    c_bi = model_bigrams.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("cb"))
    c_uni = model_bigrams.groupBy("w1").agg(F.count(F.lit(1)).alias("cu"))
    vocab = model_base.select(F.explode("__toks").alias("w")).agg(
        F.count_distinct("w").alias("V")
    )

    # LEFT joins: bigrams/contexts unseen by the model fall back to the
    # smoothed k/(0 + kV) mass (a no-op for self-scoring, where every
    # scored bigram is in the model by construction).
    # Accumulation is INTEGER nano-nats: ln(p) quantized to 1e-9 as a
    # BIGINT per bigram, summed exactly — a double sum's order noise
    # (~1e-8 over thousands of terms) can flip the 6-digit mean at a
    # rounding boundary between engines (observed at sf0.1); integer
    # sums are order-independent, so the final divide+round sees
    # bit-identical input on both sides.
    scored = (
        bigrams.join(c_bi, ["w1", "w2"], "left")
        .join(c_uni, ["w1"], "left")
        .crossJoin(F.broadcast(vocab))
        .select(
            "__id",
            F.round(
                F.log(
                    (F.coalesce(F.col("cb"), F.lit(0)) + F.lit(k)).cast("double")
                    / (
                        F.coalesce(F.col("cu"), F.lit(0)) + F.lit(k) * F.col("V")
                    ).cast("double")
                )
                * F.lit(1e9),
                0,
            ).cast("long").alias("lp_nano"),
        )
    )
    per_doc = scored.groupBy("__id").agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.round(
            -F.sum("lp_nano").cast("double")
            / (F.count(F.lit(1)).cast("double") * F.lit(1e9)),
            6,
        ).alias("neg_avg_logprob"),
    )
    return (
        df.select(F.col(id_col))
        .join(per_doc, F.col(id_col) == F.col("__id"), "left")
        .select(
            id_col,
            F.coalesce("n_bigrams", F.lit(0)).alias("n_bigrams"),
            "neg_avg_logprob",
        )
    )


def nb_classify(
    df,
    text_col: str = "text",
    id_col: str = "doc_id",
    label_col: str = "lang",
    k: int = 1,
    train_df=None,
):
    """Multinomial Naive Bayes text classifier — the fasttext-style
    linear classifier shape CCNet/quality pipelines use for language
    and quality filtering, as pure counting over tokens. Trains on
    `train_df` (default: the scored corpus itself, self-supervised on
    its own labels) and returns (id_col, pred, score_nano, n_tokens):
    the argmax class and its UNNORMALIZED log-posterior in integer
    nano-nats.

    Model (add-k smoothing, engine-mirrorable):
        P(c)   = n_docs_c / n_docs
        P(w|c) = (count(w,c) + k) / (n_tok_c + k*V)
        score(d,c) = ln P(c) + sum over occurrences of ln P(w|c)
    Ties break to the lexicographically smallest class.

    Determinism contract (the lm_score pattern): every ln term — the
    prior, each seen (w,c) log-prob, and the per-class unseen-token
    fallback ln(k/(n_tok_c+kV)) — is a ln of a rational of small ints,
    rounded to 9 digits and quantized to BIGINT nano-nats; all sums
    are integer, so accumulation order cannot perturb the argmax.

    Scale: model = two map-side-combinable count shuffles over the
    training tokens; scoring = ONE token-keyed join of the corpus
    occurrences against the (w, class) table, then a (doc, class)
    combinable aggregation; the per-class prior/fallback table is a
    broadcast of |classes| rows. Unseen tokens never join — they are
    accounted as (doc_len - matched) * fallback_c, so the grid stays
    (docs × classes), never (docs × vocab)."""
    toks = F.filter(
        F.split(F.trim(F.lower(F.col(text_col))), r"\s+"), lambda x: x != ""
    )
    # Tokenize ONCE and pin it: the model needs ~6 aggregates over the
    # token stream and the scorer two more — without materialization
    # every branch re-scans the source and re-runs the regex split
    # (measured: 35 exchanges, each from raw text, on a 5k-doc corpus).
    # At cluster scale this is the standard persist-before-multi-pass
    # pattern (use MEMORY_AND_DISK persistence of the tokenized frame).
    if train_df is None:
        both = df.select(
            F.col(id_col).alias("__id"),
            F.col(label_col).alias("__c"),
            toks.alias("__toks"),
        ).localCheckpoint(eager=True)
        train_base = both.select("__c", "__toks")
        base = both.select("__id", "__toks")
    else:
        train_base = train_df.select(
            F.col(label_col).alias("__c"), toks.alias("__toks")
        ).localCheckpoint(eager=True)
        base = df.select(
            F.col(id_col).alias("__id"), toks.alias("__toks")
        ).localCheckpoint(eager=True)
    occ_t = train_base.select("__c", F.explode("__toks").alias("w"))
    n_docs = train_base.agg(F.count(F.lit(1)).alias("nd"))
    cls_docs = train_base.groupBy("__c").agg(F.count(F.lit(1)).alias("ndc"))
    cls_toks = occ_t.groupBy("__c").agg(F.count(F.lit(1)).alias("ntc"))
    vocab = occ_t.agg(F.count_distinct("w").alias("V"))

    def _nano(x):
        return F.round(F.log(x) * F.lit(1e9), 0).cast("long")

    # per-class broadcast table: prior + unseen-token fallback
    classes = (
        cls_docs.join(cls_toks, "__c", "left")
        .crossJoin(F.broadcast(n_docs))
        .crossJoin(F.broadcast(vocab))
        .select(
            "__c",
            _nano(
                F.col("ndc").cast("double") / F.col("nd").cast("double")
            ).alias("prior_nano"),
            (F.coalesce(F.col("ntc"), F.lit(0)) + F.lit(k) * F.col("V"))
            .alias("den"),
        )
        .select(
            "__c",
            "prior_nano",
            _nano(F.lit(k).cast("double") / F.col("den").cast("double"))
            .alias("lp0_nano"),
            "den",
        )
    )
    tok_cls = (
        occ_t.groupBy("__c", "w")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .join(classes.select("__c", "den"), "__c")
        .select(
            "__c",
            "w",
            _nano(
                (F.col("cnt") + F.lit(k)).cast("double")
                / F.col("den").cast("double")
            ).alias("lp_nano"),
        )
    )

    occ = base.select("__id", F.explode("__toks").alias("w"))
    doc_len = base.select(
        "__id", F.size("__toks").alias("n_tokens")
    )
    # The (w, class) model table is vocabulary-bounded (never corpus-
    # bounded) — broadcast it so the corpus token stream is scored
    # map-side with NO shuffle on occurrences, exactly how fasttext-
    # style filters deploy: the model ships to workers, the corpus
    # stays put. (For a vocabulary too large to broadcast, drop the
    # hint and this degrades to a token-keyed shuffle join.)
    matched = (
        occ.join(F.broadcast(tok_cls), "w")
        .groupBy("__id", "__c")
        .agg(
            F.sum("lp_nano").alias("msum"),
            F.count(F.lit(1)).alias("mcnt"),
        )
    )
    grid = (
        doc_len.crossJoin(
            F.broadcast(classes.select("__c", "prior_nano", "lp0_nano"))
        )
        .join(matched, ["__id", "__c"], "left")
        .select(
            "__id",
            "__c",
            "n_tokens",
            (
                F.col("prior_nano")
                + F.coalesce(F.col("msum"), F.lit(0))
                + (
                    F.col("n_tokens")
                    - F.coalesce(F.col("mcnt"), F.lit(0))
                ).cast("long")
                * F.col("lp0_nano")
            ).alias("score_nano"),
        )
    )
    best = grid.groupBy("__id").agg(
        F.min(
            F.struct(
                (-F.col("score_nano")).alias("ns"), F.col("__c").alias("c")
            )
        ).alias("m"),
        F.first("n_tokens").alias("n_tokens"),
    )
    return best.select(
        F.col("__id").alias(id_col),
        F.col("m.c").alias("pred"),
        (-F.col("m.ns")).alias("score_nano"),
        "n_tokens",
    )


def corpus_report(
    df,
    text_col: str = "text",
    source_col: str = "source",
    lang_col: str = "lang",
):
    """Per-source corpus health report — the daily dashboard a curation
    pipeline runs before training: volume (docs, tokens), length shape
    (char quartiles), language mix (count, top language, Shannon
    entropy), and the exact-duplicate rate within each source.

    Returns one row per source:
      (source, n_docs, total_tokens, mean_tokens,
       p25_chars, p50_chars, p75_chars,
       n_langs, top_lang, lang_entropy, dup_rate)

    Determinism: quartiles via exact interpolated percentile (the
    proven quantile_cont contract); entropy accumulates per-language
    -p·ln(p) terms as nano-int BIGINTs (the lm_score contract — sums
    of rounded doubles are order-sensitive, integer sums are not);
    top_lang ties break to the lexicographically largest (struct-max).

    Scale: three source-keyed combinable aggregations over one scan
    shape + two small joins; the (source, lang) and (source, digest)
    intermediates are map-side combinable, output is |sources| rows."""
    toks_n = token_count(F.col(text_col))
    base = df.select(
        F.col(source_col).alias("source"),
        F.col(lang_col).alias("lang"),
        toks_n.alias("__nt"),
        F.length(F.coalesce(F.col(text_col), F.lit(""))).alias("__nc"),
        F.md5(F.coalesce(F.col(text_col), F.lit(""))).alias("__dg"),
    )
    vol = base.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("__nt").cast("long").alias("total_tokens"),
        F.round(F.avg(F.col("__nt").cast("double")), 9).alias("mean_tokens"),
        F.round(F.percentile(F.col("__nc").cast("double"), 0.25), 9).alias(
            "p25_chars"
        ),
        F.round(F.percentile(F.col("__nc").cast("double"), 0.5), 9).alias(
            "p50_chars"
        ),
        F.round(F.percentile(F.col("__nc").cast("double"), 0.75), 9).alias(
            "p75_chars"
        ),
    )
    lc = base.groupBy("source", "lang").agg(F.count(F.lit(1)).alias("c"))
    lang_stats = (
        lc.join(vol.select("source", "n_docs"), "source")
        .select(
            "source",
            "lang",
            "c",
            F.round(
                -(F.col("c").cast("double") / F.col("n_docs"))
                * F.log(F.col("c").cast("double") / F.col("n_docs"))
                * F.lit(1e9),
                0,
            ).cast("long").alias("__e_nano"),
        )
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_langs"),
            F.max(F.struct(F.col("c"), F.col("lang"))).alias("__top"),
            F.round(
                F.sum("__e_nano").cast("double") / F.lit(1e9), 9
            ).alias("lang_entropy"),
        )
        .select(
            "source", "n_langs", F.col("__top.lang").alias("top_lang"),
            "lang_entropy",
        )
    )
    dg = base.groupBy("source", "__dg").agg(F.count(F.lit(1)).alias("c"))
    dup = dg.groupBy("source").agg(
        F.sum(F.when(F.col("c") > 1, F.col("c")).otherwise(F.lit(0)))
        .cast("long")
        .alias("__dup_docs")
    )
    return (
        vol.join(lang_stats, "source")
        .join(dup, "source")
        .select(
            "source",
            "n_docs",
            "total_tokens",
            "mean_tokens",
            "p25_chars",
            "p50_chars",
            "p75_chars",
            "n_langs",
            "top_lang",
            "lang_entropy",
            F.round(
                F.col("__dup_docs").cast("double") / F.col("n_docs"), 9
            ).alias("dup_rate"),
        )
    )


# Tracking parameters stripped by url_normalize (the C4/CCNet-style
# canonicalization list: analytics noise that splits duplicate URLs).
URL_TRACKING_PARAM_RE = r"^(utm_[a-z]+|gclid|fbclid|msclkid|ref|mc_cid|mc_eid)="


def url_normalize(url: Column) -> Column:
    """Canonical URL for crawl-level dedup — the FIRST pass of a web
    corpus pipeline (C4/CCNet dedup by URL before any text compare):

    - scheme and host lowercased, leading ``www.`` dropped
    - default ports stripped (``:80`` for http, ``:443`` for https)
    - fragment dropped
    - tracking query params dropped (URL_TRACKING_PARAM_RE), the rest
      SORTED so param order doesn't split duplicates
    - trailing ``/`` normalized off the path (bare host keeps none)

    Pure JVM expression (regex extracts + one small array sort per
    URL) — scan-speed, zero shuffle, and the same regex steps run in
    external engines (no lookaheads), so the canonical key is
    engine-reproducible."""
    u = F.trim(F.coalesce(url, F.lit("")))
    scheme = F.lower(F.regexp_extract(u, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    hostport = F.lower(F.regexp_extract(u, r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)", 1))
    host = F.regexp_replace(hostport, r"^www\.", "")
    host = F.when(
        (scheme == "http") & host.endswith(":80"),
        F.regexp_replace(host, r":80$", ""),
    ).when(
        (scheme == "https") & host.endswith(":443"),
        F.regexp_replace(host, r":443$", ""),
    ).otherwise(host)
    path = F.regexp_extract(u, r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)", 1)
    path = F.regexp_replace(path, r"/+$", "")
    query = F.regexp_extract(u, r"\?([^#]*)", 1)
    kept = F.array_sort(
        F.filter(
            F.split(query, "&"),
            lambda p: (p != "") & ~p.rlike(URL_TRACKING_PARAM_RE),
        )
    )
    qs = F.when(F.size(kept) > 0, F.concat(F.lit("?"), F.array_join(kept, "&"))).otherwise(F.lit(""))
    return F.when(scheme == "", u).otherwise(
        F.concat(scheme, F.lit("://"), host, path, qs)
    )


def html_to_text(html: Column) -> Column:
    """Web-page text extraction — the HTML→text pass that precedes
    every other curation step on a crawl corpus: drop <script>/<style>
    payloads and comments, break block-level tags to newlines, strip
    the remaining tags, decode the common entities, collapse
    whitespace. A deterministic regex pipeline (no lookaheads —
    RE2-compatible, so external engines replay it verbatim), not a
    DOM parser: the honest 90% of boilerplate stripping at pure scan
    speed, zero shuffle."""
    t = F.coalesce(html, F.lit(""))
    # script/style/comment payloads go first (their CONTENT must not
    # leak into the text) — (?is): case-insensitive, dot-matches-newline
    t = F.regexp_replace(t, r"(?is)<script[^>]*>.*?</script>", " ")
    t = F.regexp_replace(t, r"(?is)<style[^>]*>.*?</style>", " ")
    t = F.regexp_replace(t, r"(?s)<!--.*?-->", " ")
    # block-level boundaries become newlines so paragraphs survive
    t = F.regexp_replace(
        t, r"(?i)</?(p|div|br|li|ul|ol|h[1-6]|tr|table|section|article)[^>]*>",
        "\n",
    )
    t = F.regexp_replace(t, r"(?s)<[^>]+>", " ")
    for ent, rep in (
        ("&nbsp;", " "), ("&amp;", "&"), ("&lt;", "<"), ("&gt;", ">"),
        ("&quot;", "\""), ("&#39;", "'"),
    ):
        t = F.replace(t, F.lit(ent), F.lit(rep))
    t = F.regexp_replace(t, r"[ \t]+", " ")
    t = F.regexp_replace(t, r" ?\n ?", "\n")
    t = F.regexp_replace(t, r"\n{2,}", "\n")
    return F.regexp_replace(F.trim(t), r"^\n+|\n+$", "")


# C4 cleanup thresholds (Raffel et al. 2020, §2.2): the rule set that
# built the original C4 corpus from Common Crawl.
C4_MIN_WORDS_PER_LINE = 3
C4_MIN_SENTENCES = 3


def c4_flags(text: Column, sep: str = "\n") -> Column:
    """The C4 cleanup rules (Raffel et al. 2020) as one struct column —
    the third named filter set next to gopher_flags (format) and
    gopher_repetition:

    - terminal_punct_line_frac: lines ending in . ! ? or a closing
      quote (C4 keeps only such lines)
    - short_line_frac: lines under 3 words (C4 drops them)
    - n_sentences: terminal-punctuation sentence count (C4 requires
      >= 3 per page)
    - has_lorem_ipsum / has_curly_brace / has_javascript: the
      published page-level drop triggers (curly braces flag code,
      'javascript' flags script warnings)
    - passes: >= 3 sentences and none of the drop triggers

    Pure JVM regex/HOF expressions — zero shuffle, scan-speed, and the
    same regexes run in external engines (no lookaheads)."""
    import re as _re

    t = F.coalesce(text, F.lit(""))
    lines = F.filter(
        F.split(t, _re.escape(sep)), lambda x: F.trim(x) != ""
    )
    n_lines_f = F.greatest(F.size(lines), F.lit(1)).cast("double")
    term = F.size(
        F.filter(lines, lambda x: F.trim(x).rlike("[.!?][\"']?$"))
    )
    short = F.size(
        F.filter(
            lines,
            lambda x: F.size(
                F.filter(F.split(F.trim(x), r"\s+"), lambda w: w != "")
            )
            < C4_MIN_WORDS_PER_LINE,
        )
    )
    low = F.lower(t)
    n_sent = F.coalesce(F.regexp_count(t, F.lit(r"[.!?]")), F.lit(0))
    has_lorem = low.contains("lorem ipsum")
    has_curly = t.contains("{")
    has_js = low.contains("javascript")
    passes = (
        (n_sent >= C4_MIN_SENTENCES)
        & ~has_lorem
        & ~has_curly
        & ~has_js
    )
    return F.struct(
        F.round(term.cast("double") / n_lines_f, 9).alias(
            "terminal_punct_line_frac"
        ),
        F.round(short.cast("double") / n_lines_f, 9).alias("short_line_frac"),
        n_sent.cast("long").alias("n_sentences"),
        has_lorem.alias("has_lorem_ipsum"),
        has_curly.alias("has_curly_brace"),
        has_js.alias("has_javascript"),
        passes.alias("passes"),
    )


def pmi_collocations(
    docs: DataFrame,
    text_col: str = "text",
    min_count: int = 5,
    scale: int = 10**6,
) -> DataFrame:
    """Bigram collocation mining by pointwise-mutual-information LIFT —
    the phrase detector behind tokenizer vocab curation and boilerplate
    mining: which adjacent word pairs co-occur far more often than
    their unigram frequencies predict ("los angeles", "et al").

    Instead of float PMI = log(p(xy)/(p(x)p(y))) — whose log makes
    cross-engine certification fragile — this emits the LIFT ratio the
    log wraps, as a scaled integer computed in DECIMAL(38,0):

        lift_scaled = (c12 * N1 * N1 * scale) div (N2 * c1 * c2)

    (c12 = bigram count, c1/c2 = unigram counts, N1/N2 = total
    unigram/bigram counts). Monotone in PMI, so ranking and
    thresholding are unchanged, and exact — an external SQL engine
    replays it bit-for-bit. Headroom: the numerator stays inside
    DECIMAL(38,0) up to ~2e10 total tokens at scale=1e6; beyond that
    drop `scale` a decade per decade of corpus (ranking is unaffected).

    Scale design: one tokenize pass feeds both counters; unigram and
    bigram counts are map-side-combinable groupBys; the unigram table
    is vocabulary-bounded, so BOTH count lookups are broadcast joins —
    the only full shuffle is the bigram groupBy itself. `min_count`
    prunes the hapax tail before the joins.

    Returns (w1, w2, c12, c1, c2, lift_scaled), c12 >= min_count.
    """
    ws = F.filter(
        F.split(F.trim(F.lower(F.col(text_col))), r"\s+"), lambda x: x != ""
    )
    toks = docs.where(F.col(text_col).isNotNull()).select(ws.alias("__ws"))
    uni = (
        toks.select(F.explode("__ws").alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    bigrams = F.expr(
        "CASE WHEN size(__ws) >= 2 THEN "
        "transform(sequence(1, size(__ws) - 1), "
        "          i -> concat(element_at(__ws, i), ' ', element_at(__ws, i + 1))) "
        "ELSE array() END"
    )
    big = (
        toks.select(F.explode(bigrams).alias("k"))
        .groupBy("k")
        .agg(F.count(F.lit(1)).cast("long").alias("c12"))
        .where(F.col("c12") >= int(min_count))
        .select(
            F.substring_index("k", " ", 1).alias("w1"),
            F.substring_index("k", " ", -1).alias("w2"),
            "c12",
        )
    )
    n1 = uni.agg(F.sum("c").cast("long").alias("N1"))
    n2_base = toks.select(
        F.greatest(F.size("__ws") - 1, F.lit(0)).alias("nb")
    )
    n2 = n2_base.agg(F.sum("nb").cast("long").alias("N2"))
    c1 = uni.select(F.col("w").alias("w1"), F.col("c").alias("c1"))
    c2 = uni.select(F.col("w").alias("w2"), F.col("c").alias("c2"))
    out = (
        big.join(F.broadcast(c1), "w1")
        .join(F.broadcast(c2), "w2")
        .crossJoin(F.broadcast(n1))
        .crossJoin(F.broadcast(n2))
    )
    lift = F.expr(
        f"CAST(CAST(c12 AS DECIMAL(38,0)) * N1 * N1 * {int(scale)}"
        f" div (CAST(N2 AS DECIMAL(38,0)) * c1 * c2) AS BIGINT)"
    )
    return out.select(
        "w1", "w2", "c12", "c1", "c2", lift.alias("lift_scaled")
    )


def plan_length_batches(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    batch_size: int = 32,
) -> DataFrame:
    """Length-bucketed inference batch planning: assign documents to
    fixed-size batches in descending token-length order, so each batch
    pads to its own max instead of the corpus max — the standard
    dynamic-batching prep for embedding/scoring a corpus on
    accelerators, where padding waste is wall-clock waste.

    The global length-descending rank is built WITHOUT a global sort
    (the quantile_calibrate pattern): distinct token counts (bounded by
    the length domain) get cumulative offsets from one small window;
    each row's rank = its length's offset + a row_number within the
    length partition (ties to ascending id). Batch stats come from one
    batch-keyed groupBy joined back on batch_id — keyed, balanced,
    corpus/batch_size rows.

    Returns (id_col, n_tokens, global_rank, batch_id, batch_max_tokens,
    batch_waste_ppm) — waste_ppm = padded-slot fraction wasted, exact
    integer rationals.
    """
    from pyspark.sql import Window

    d = docs.select(
        F.col(id_col),
        F.coalesce(bpe_token_count(F.col(text_col)), F.lit(0))
        .cast("long")
        .alias("n_tokens"),
    )
    dv = (
        d.groupBy("n_tokens")
        .agg(F.count(F.lit(1)).alias("__c"))
        .withColumn(
            "__cum",
            F.sum("__c").over(
                Window.orderBy(F.desc("n_tokens")).rowsBetween(
                    Window.unboundedPreceding, Window.currentRow
                )
            ),
        )
        .select(
            "n_tokens", (F.col("__cum") - F.col("__c")).alias("__prev")
        )
    )
    wn = Window.partitionBy("n_tokens").orderBy(id_col)
    ranked = (
        d.join(F.broadcast(dv), "n_tokens")
        .withColumn(
            "global_rank", F.col("__prev") + F.row_number().over(wn)
        )
        .withColumn(
            "batch_id",
            F.expr(f"(global_rank - 1) div {int(batch_size)} + 1").cast(
                "long"
            ),
        )
    )
    stats = ranked.groupBy("batch_id").agg(
        F.count(F.lit(1)).alias("__nd"),
        F.max("n_tokens").alias("batch_max_tokens"),
        F.sum("n_tokens").alias("__sum"),
    )
    waste = F.expr(
        "CASE WHEN __nd * batch_max_tokens = 0 THEN 0 "
        "ELSE ((__nd * batch_max_tokens - __sum) * 1000000) "
        "     div (__nd * batch_max_tokens) END"
    )
    return (
        ranked.join(stats, "batch_id")
        .select(
            id_col,
            "n_tokens",
            F.col("global_rank").cast("long").alias("global_rank"),
            "batch_id",
            F.col("batch_max_tokens").cast("long").alias(
                "batch_max_tokens"
            ),
            waste.cast("long").alias("batch_waste_ppm"),
        )
    )


RAKE_STOPWORDS: tuple[str, ...] = LANG_MARKERS["en"] + (
    "on", "with", "as", "by", "at", "an", "be", "are", "was", "from",
)


def rake_keywords(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_phrase_len: int = 4,
    top_k: int = 15,
) -> DataFrame:
    """RAKE corpus keyword extraction (Rose et al. 2010): candidate
    phrases are maximal stopword-free token runs (gaps-and-islands
    over token positions); each word scores degree/freq where freq =
    corpus occurrence count and degree = sum of the lengths of the
    phrases it appears in; a phrase scores the sum of its words'
    scores. Scores are integer ppm with per-word floor division —
    deterministic on any engine.

    Returns the global top_k phrases: (phrase, n_words, n_occurrences,
    score_ppm), ranked (score desc, phrase asc).

    Scale: tokenization + island assignment is one window shuffle on
    the doc key; word stats and phrase scores are combinable
    aggregates on token-sized frames; only the bounded top_k sorts.
    """
    from pyspark.sql import Window

    toks = (
        df.select(
            F.col(id_col).alias("__doc"),
            F.posexplode(
                F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
            ).alias("__pos", "__raw"),
        )
        .select(
            "__doc", "__pos",
            F.regexp_replace("__raw", r"[^\w一-鿿]", "").alias("__tok"),
        )
        .where(F.col("__tok") != "")
    )
    nonstop = toks.where(~F.col("__tok").isin(*RAKE_STOPWORDS))
    w = Window.partitionBy("__doc").orderBy("__pos")
    isl = nonstop.withColumn(
        "__isl", F.col("__pos") - F.row_number().over(w)
    )
    ph = isl.groupBy("__doc", "__isl").agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("__pos", "__tok"))
                ),
                lambda x: x["__tok"],
            ),
            " ",
        ).alias("phrase"),
        F.count(F.lit(1)).cast("long").alias("__plen"),
    ).where(F.col("__plen") <= int(max_phrase_len))
    occ = isl.join(ph, ["__doc", "__isl"]).select(
        "__doc", "__isl", "__tok", "__plen", "phrase"
    )
    wstats = occ.groupBy("__tok").agg(
        F.count(F.lit(1)).cast("long").alias("__freq"),
        F.sum("__plen").cast("long").alias("__deg"),
    ).select(
        "__tok",
        F.expr("CAST(__deg * 1000000 div __freq AS BIGINT)").alias("__ws"),
    )
    inst = (
        occ.join(wstats, "__tok")
        .groupBy("__doc", "__isl", "phrase")
        .agg(F.sum("__ws").cast("long").alias("__score"))
    )
    return (
        inst.groupBy("phrase")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_occurrences"),
            F.max("__score").alias("score_ppm"),
        )
        .select(
            "phrase",
            F.size(F.split("phrase", " ")).cast("long").alias("n_words"),
            "n_occurrences", "score_ppm",
        )
        .orderBy(F.col("score_ppm").desc(), "phrase")
        .limit(int(top_k))
    )


def fim_transform(
    df,
    text_col: str = "text",
    id_col: str = "doc_id",
    fim_rate_pct: int = 50,
    pre_tok: str = "<PRE>",
    mid_tok: str = "<MID>",
    suf_tok: str = "<SUF>",
    salt: str = "fim",
):
    """Fill-in-the-middle transformation (Bavarian et al. 2022) — the
    pretraining-data op behind infilling-capable code models: for a
    deterministic `fim_rate_pct`% of documents, pick two split points,
    and reorder the document as PSM
    (`<PRE> prefix <SUF> suffix <MID> middle`) so the model learns to
    generate the middle given both sides. The rest pass through
    unchanged (fim_applied = 0).

    Determinism (the stratified_sample hash family): the apply coin and
    BOTH split points derive from md5(salt|id) — coin = bits0 % 100,
    s1/s2 = two independent 52-bit chunks mod (len+1), swapped into
    order — so reruns and the SQL oracle transform the SAME documents
    at the SAME characters. Documents shorter than 2 chars (or null)
    are never transformed.

    Scale: a pure per-row projection — zero shuffle, scan-stage only.

    Returns (id_col, fim_applied, s1, s2, text_fim).
    """
    if not (0 <= int(fim_rate_pct) <= 100):
        raise ValueError("fim_rate_pct must be in [0, 100]")
    key = F.col(id_col).cast("string")
    h1 = F.md5(F.concat(F.lit(salt + "|"), key))
    h2 = F.md5(F.concat(F.lit(salt + "2|"), key))
    coin = F.conv(F.substring(h1, 1, 13), 16, 10).cast("long") % 100
    txt = F.col(text_col)
    n = F.length(txt)
    b1 = F.conv(F.substring(h1, 14, 13), 16, 10).cast("long") % (n + 1)
    b2 = F.conv(F.substring(h2, 1, 13), 16, 10).cast("long") % (n + 1)
    s1 = F.least(b1, b2)
    s2 = F.greatest(b1, b2)
    apply_ = (
        txt.isNotNull() & (n >= 2) & (coin < F.lit(int(fim_rate_pct)))
    )
    # 1-based substring arithmetic, identical in both engines:
    # prefix = [1, s1], middle = (s1, s2], suffix = (s2, n]
    fim_text = F.concat(
        F.lit(pre_tok),
        F.expr(f"substring({text_col}, 1, __s1)"),
        F.lit(suf_tok),
        F.expr(f"substring({text_col}, __s2 + 1, length({text_col}) - __s2)"),
        F.lit(mid_tok),
        F.expr(f"substring({text_col}, __s1 + 1, __s2 - __s1)"),
    )
    return (
        df.withColumn("__s1", s1)
        .withColumn("__s2", s2)
        .select(
            F.col(id_col),
            apply_.cast("long").alias("fim_applied"),
            F.when(apply_, F.col("__s1")).alias("s1"),
            F.when(apply_, F.col("__s2")).alias("s2"),
            F.when(apply_, fim_text).otherwise(txt).alias("text_fim"),
        )
    )


# ---------------------------------------------------------------------------
# readability + code detection (round 7): two scan-stage quality
# signals a pretraining filter stack wants next to gopher/C4 —
# grade-level readability for prose and a code-vs-prose classifier for
# routing documents to the right pipeline (The-Stack-style corpora)
# ---------------------------------------------------------------------------


def readability(text: Column) -> Column:
    """Flesch reading-ease + Flesch-Kincaid grade as one struct column.

    Syllables use the deterministic vowel-GROUP proxy (maximal runs of
    [aeiouy] in the lowercased text — runs cannot span whitespace, so
    no per-word loop is needed): the standard engine-replayable
    approximation. Words are whitespace tokens, sentences terminal
    [.!?] runs (min 1 of each so the ratios are total). Both scores
    are ONE double tree over exact integer counts rounded to 9 (the
    agg_cuped_readout IEEE contract). Zero shuffle, scan-speed, and
    every regex runs unchanged in RE2 engines.

    Returns struct(n_words, n_sentences, n_syllables,
    flesch_reading_ease, fk_grade)."""
    t = F.coalesce(text, F.lit(""))
    words = F.greatest(
        F.size(F.filter(F.split(F.trim(t), r"\s+"), lambda w: w != "")),
        F.lit(1),
    ).cast("long")
    sents = F.greatest(
        F.coalesce(F.regexp_count(t, F.lit(r"[.!?]+")), F.lit(0)), F.lit(1)
    ).cast("long")
    syll = F.greatest(
        F.coalesce(F.regexp_count(F.lower(t), F.lit("[aeiouy]+")), F.lit(0)),
        F.lit(1),
    ).cast("long")
    wps = words.cast("double") / sents.cast("double")
    spw = syll.cast("double") / words.cast("double")
    fre = F.round(
        F.lit(206.835) - F.lit(1.015) * wps - F.lit(84.6) * spw, 9
    )
    fkg = F.round(
        F.lit(0.39) * wps + F.lit(11.8) * spw - F.lit(15.59), 9
    )
    return F.struct(
        words.alias("n_words"),
        sents.alias("n_sentences"),
        syll.alias("n_syllables"),
        fre.alias("flesch_reading_ease"),
        fkg.alias("fk_grade"),
    )


CODE_KEYWORDS = (
    "def|return|import|function|var|const|class|void|int|for|while|if|else"
)


def code_detect(text: Column) -> Column:
    """Code-vs-prose signals as one struct column — the router a mixed
    crawl corpus needs before applying prose-only filters (C4's curly-
    brace drop rule deletes exactly the documents a code pipeline
    wants; this measures instead of dropping):

    - n_braces / n_semicolons: count of {} and ; occurrences
    - symbol_frac: non-alphanumeric non-whitespace chars over chars
    - keyword_word_frac: reserved-word tokens over words (word-boundary
      regex, the cheap cross-language keyword set)
    - indent_line_frac: lines starting with 4+ spaces or a tab (layout
      signal — prose wraps, code indents)
    - is_code_like: >= 2 braces AND >= 2 semicolons AND
      symbol_frac >= 0.03 (conjunctive so prose with one stray brace
      never routes to the code pipeline)

    Pure JVM regex/HOF expressions, zero shuffle; every regex is
    RE2-safe (no lookarounds). Returns struct(n_braces, n_semicolons,
    symbol_frac, keyword_word_frac, indent_line_frac, is_code_like)."""
    t = F.coalesce(text, F.lit(""))
    n_chars = F.greatest(F.length(t), F.lit(1))
    n_braces = F.coalesce(F.regexp_count(t, F.lit("[{}]")), F.lit(0)).cast(
        "long"
    )
    n_semis = F.coalesce(F.regexp_count(t, F.lit(";")), F.lit(0)).cast("long")
    symbols = F.coalesce(
        F.regexp_count(t, F.lit(r"[^A-Za-z0-9\s]")), F.lit(0)
    )
    words = F.greatest(
        F.size(F.filter(F.split(F.trim(t), r"\s+"), lambda w: w != "")),
        F.lit(1),
    )
    kw = F.coalesce(
        F.regexp_count(t, F.lit(r"\b(" + CODE_KEYWORDS + r")\b")), F.lit(0)
    )
    lines = F.filter(F.split(t, "\n"), lambda x: F.trim(x) != "")
    n_lines = F.greatest(F.size(lines), F.lit(1))
    indented = F.size(
        F.filter(lines, lambda x: x.rlike("^(    |\t)"))
    )
    symbol_frac = F.round(
        symbols.cast("double") / n_chars.cast("double"), 9
    )
    is_code = (
        (n_braces >= 2) & (n_semis >= 2) & (symbol_frac >= F.lit(0.03))
    )
    return F.struct(
        n_braces.alias("n_braces"),
        n_semis.alias("n_semicolons"),
        symbol_frac.alias("symbol_frac"),
        F.round(kw.cast("double") / words.cast("double"), 9).alias(
            "keyword_word_frac"
        ),
        F.round(indented.cast("double") / n_lines.cast("double"), 9).alias(
            "indent_line_frac"
        ),
        is_code.alias("is_code_like"),
    )


def mojibake_flags(text: Column) -> Column:
    """Encoding-damage (mojibake) signals as one struct column — the
    ftfy-class cleanup gate a crawl corpus runs before tokenization:
    UTF-8 bytes decoded as CP1252/Latin-1 leave unmistakable marker
    sequences (\u00e2\u20ac. for the RIGHT-SINGLE-QUOTE family,
    \u00c3 + Latin-1 continuation for accented letters, \u00c2 before
    NBSP-family punctuation), and lossy decodes leave U+FFFD
    replacement characters.

    - n_replacement: count of U+FFFD
    - n_mojibake: count of the classic double-decode markers
    - mojibake_per_kchar: marker rate per 1000 chars (round 8)
    - is_damaged: any replacement char or >= 2 marker hits

    RE2-safe regexes (no lookarounds), zero shuffle, scan-speed."""
    t = F.coalesce(text, F.lit(""))
    n_chars = F.greatest(F.length(t), F.lit(1))
    n_repl = F.coalesce(
        F.regexp_count(t, F.lit("\ufffd")), F.lit(0)
    ).cast("long")
    n_moji = F.coalesce(
        F.regexp_count(
            t,
            F.lit(
                "(\u00e2\u20ac.|\u00c3[\u0080-\u00bf]"
                "|\u00c2[\u00a0-\u00bf])"
            ),
        ),
        F.lit(0),
    ).cast("long")
    return F.struct(
        n_repl.alias("n_replacement"),
        n_moji.alias("n_mojibake"),
        F.round(
            n_moji.cast("double") * 1000.0 / n_chars.cast("double"), 9
        ).alias("mojibake_per_kchar"),
        ((n_repl > 0) | (n_moji >= 2)).alias("is_damaged"),
    )


# ---------------------------------------------------------------------------
# Unicode normalization + mojibake repair (round 8)
# ---------------------------------------------------------------------------

# "Sloppy CP1252" (cf. ftfy's sloppy-windows-1252): CP1252 with its five
# undefined bytes (0x81 0x8D 0x8F 0x90 0x9D) mapped to the Latin-1
# control characters a lenient decoder would have produced — so any
# string that came FROM a cp1252/latin-1 misdecode re-encodes exactly.
def _build_sloppy_cp1252_rev() -> dict:
    rev = {}
    for b in range(256):
        ch = bytes([b]).decode("cp1252", errors="replace")
        if ch == "\ufffd":
            ch = chr(b)
        rev[ch] = b
    return rev


_SLOPPY_CP1252_REV = _build_sloppy_cp1252_rev()

# Python twin of mojibake_flags' marker regex (the repair loop's
# progress measure must agree with the detector).
import re as _re

_MOJI_MARKER_RE = _re.compile(
    "(\u00e2\u20ac.|\u00c3[\u0080-\u00bf]|\u00c2[\u00a0-\u00bf])"
)


def _mojibake_badness(s: str) -> int:
    """Damage score the repair loop must strictly decrease: marker
    hits (weighted — one marker is stronger evidence than one stray
    Latin-1 char) plus the count of U+0080..U+00FF characters. A
    twice-damaged string keeps its MARKER count flat across the first
    repair round (the intermediate single-damage form still carries
    one marker) but sheds Latin-1-supplement noise every round, so
    badness is monotone where raw marker count is not."""
    return 10 * len(_MOJI_MARKER_RE.findall(s)) + sum(
        1 for c in s if "\u0080" <= c <= "\u00ff"
    )


def _decode_mixed_utf8(raw: bytes) -> str:
    """Decode a byte run that may INTERLEAVE valid UTF-8 sequences
    (the mojibake's original bytes) with genuine Latin-1/CP1252 text:
    each position first tries a complete UTF-8 multi-byte sequence;
    anything else falls back to the single sloppy-cp1252 char. This is
    what lets repair fix damage embedded in text that also carries
    LEGITIMATE accents ('café ... donÃ¢â‚¬â„¢t') — a strict whole-run
    utf-8 decode would abort on the lone é."""
    out = []
    i, n = 0, len(raw)
    while i < n:
        b = raw[i]
        if b < 0x80:
            out.append(chr(b))
            i += 1
            continue
        if 0xC2 <= b <= 0xDF:
            seqlen = 2
        elif 0xE0 <= b <= 0xEF:
            seqlen = 3
        elif 0xF0 <= b <= 0xF4:
            seqlen = 4
        else:
            seqlen = 0
        if seqlen and i + seqlen <= n:
            try:
                out.append(raw[i : i + seqlen].decode("utf-8"))
                i += seqlen
                continue
            except UnicodeDecodeError:
                pass
        ch = bytes([b]).decode("cp1252", errors="replace")
        out.append(chr(b) if ch == "\ufffd" else ch)
        i += 1
    return "".join(out)


def _repair_round(s: str) -> str:
    """One segment-wise repair pass: runs of sloppy-cp1252-mappable
    characters re-encode to bytes and go through the mixed UTF-8
    decoder; unmappable characters (CJK, Arabic, emoji — text that
    never came from a cp1252 misdecode) pass through verbatim, so
    mixed-script documents repair their damaged spans without
    touching the rest."""
    out = []
    buf = bytearray()

    def flush():
        if buf:
            out.append(_decode_mixed_utf8(bytes(buf)))
            buf.clear()

    for c in s:
        b = _SLOPPY_CP1252_REV.get(c)
        if b is None:
            flush()
            out.append(c)
        else:
            buf.append(b)
    flush()
    return "".join(out)


def mojibake_repair_str(s, max_rounds: int = 3):
    """ftfy-style inverse of the CP1252 double-decode: segment-wise
    re-encode through sloppy-cp1252 + mixed UTF-8 re-decode, iterating
    while the damage score strictly drops (a twice-damaged string
    needs two rounds; see _mojibake_badness). Conservative by
    construction: repair is only ATTEMPTED when the detector's marker
    regex fires, and a round is only ACCEPTED if the score improves —
    so clean text, legitimate accents (invalid as UTF-8 sequences,
    kept as-is by the mixed decoder), non-Latin scripts (unmappable,
    passed through verbatim) and U+FFFD damage (original bytes gone)
    come back UNCHANGED."""
    if s is None:
        return None
    cur = s
    for _ in range(max_rounds):
        if not _MOJI_MARKER_RE.search(cur):
            break
        cand = _repair_round(cur)
        if _mojibake_badness(cand) >= _mojibake_badness(cur):
            break
        cur = cand
    return cur


def mojibake_repair(text: Column, max_rounds: int = 3) -> Column:
    """Column form of `mojibake_repair_str` — an Arrow-batched pandas
    UDF (codec tables are not expressible in Spark SQL builtins), so
    the repair is a zero-shuffle scan-stage projection; per-string cost
    is linear in length and only paid on marker-bearing strings."""
    from pyspark.sql.functions import pandas_udf

    rounds = int(max_rounds)

    @pandas_udf("string")
    def _rep(s):  # type: ignore[no-untyped-def]
        return s.map(
            lambda x: mojibake_repair_str(x, rounds)
            if x is not None
            else None
        )

    return _rep(text)


_UNICODE_FORMS = ("NFC", "NFD", "NFKC", "NFKD")


def unicode_normalize(text: Column, form: str = "NFC") -> Column:
    """Unicode normalization (NFC/NFD/NFKC/NFKD) as an Arrow-batched
    pandas UDF — the FIRST transform of every dedup recipe
    (CCNet/Gopher normalize before hashing: composed é and
    decomposed e+COMBINING ACUTE are different strings to every digest
    in dedup.py until normalized; NFKC additionally folds width and
    compatibility forms — fullwidth A -> A, fi-ligature -> fi).
    Zero-shuffle scan-stage projection; Spark SQL has no normalization
    builtin, so this is the sanctioned vectorized-Python path."""
    if form not in _UNICODE_FORMS:
        raise ValueError(
            f"unicode_normalize: form must be one of {_UNICODE_FORMS}, "
            f"got {form!r}"
        )
    from pyspark.sql.functions import pandas_udf

    f = str(form)

    @pandas_udf("string")
    def _norm(s):  # type: ignore[no-untyped-def]
        import unicodedata

        return s.map(
            lambda x: unicodedata.normalize(f, x) if x is not None else None
        )

    return _norm(text)


def sentence_split(text: Column) -> Column:
    """Sentence segmentation: split on terminal-punctuation runs
    followed by whitespace (``[.!?]+\\s+`` — RE2-portable, no
    lookbehind, so the SQL oracle splits identically), empty segments
    dropped. The unit every sentence-level pipeline stage (sentence
    dedup, per-sentence language ID, quality scoring) iterates over.
    Zero shuffle — a scan-stage projection."""
    return F.filter(
        F.split(F.coalesce(text, F.lit("")), r"[.!?]+\s+"),
        lambda x: F.trim(x) != "",
    )


def sentence_stats(text: Column) -> Column:
    """Per-document sentence statistics as one struct: sentence count,
    mean tokens per sentence (round 8) and the longest sentence in
    characters — the length-shape signals sentence-aware curation
    filters cut on."""
    sents = sentence_split(text)
    n = F.size(sents)
    toks = F.transform(
        sents,
        lambda s: F.size(F.filter(F.split(F.trim(s), r"\s+"), lambda w: w != "")),
    )
    total_toks = F.coalesce(
        F.aggregate(toks, F.lit(0), lambda a, x: a + x), F.lit(0)
    )
    max_chars = F.coalesce(
        F.array_max(F.transform(sents, lambda s: F.length(s))), F.lit(0)
    )
    return F.struct(
        n.cast("long").alias("n_sentences"),
        F.when(
            n > 0,
            F.round(total_toks.cast("double") / n.cast("double"), 9),
        ).alias("mean_sentence_tokens"),
        max_chars.cast("long").alias("max_sentence_chars"),
    )
