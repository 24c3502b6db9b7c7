"""Text-analysis queries over the documents table, exercising
xorq_spark.functions.text (LLM-pipeline operators: token counting,
BPE-ish counting, language ID, quality scoring, fingerprinting,
rolling hash)."""

from __future__ import annotations

import pyspark.sql.functions as F

from xorq_spark.functions import (
    bpe_token_count,
    fingerprint,
    language_id,
    quality_score,
    rolling_hash,
    token_count,
)
from xorq_spark.functions.text import LANG_MARKERS, BPE_ISH_PATTERN
from xorq_spark.queries.base import pinned_order, query, t, widen

# DuckDB fragments mirroring functions/text.py definitions.
_TOKS = "list_filter(regexp_split_to_array(trim(text), '\\s+'), x -> x <> '')"
_CLEAN_TOKS = (
    "list_transform(list_filter(regexp_split_to_array(trim(lower(text)), '\\s+'),"
    " x -> x <> ''), x -> regexp_replace(x, '[^\\w一-鿿]', '', 'g'))"
)


@query(
    "text_token_counts",
    oracle=f"""
    SELECT doc_id,
           len({_TOKS}) AS n_tokens,
           len(regexp_extract_all(text, '{BPE_ISH_PATTERN.replace(chr(39), chr(39)*2)}')) AS n_bpe,
           length(text) AS n_chars_actual,
           n_chars
    FROM documents ORDER BY doc_id
    """,
)
def text_token_counts(spark, sf_dir):
    txt = F.col("text")
    return (
        widen(t(spark, sf_dir, "documents"))
        .select(
            "doc_id",
            token_count(txt).alias("n_tokens"),
            bpe_token_count(txt).alias("n_bpe"),
            F.length(txt).alias("n_chars_actual"),
            "n_chars",
        )
        .orderBy("doc_id")
    )


def _lang_score_sql(lang: str) -> str:
    markers = ", ".join(f"'{m}'" for m in LANG_MARKERS[lang])
    return (
        f"len(list_filter(toks, x -> list_contains([{markers}], x)))::DOUBLE"
        f" / greatest(len(toks), 1)"
    )


_LANG_CASE = (
    # m IS NULL <=> null text: undetermined, same as zero marker hits
    # (mirrors language_id's fold which leaves best='und' on null input)
    "CASE WHEN m IS NULL OR m <= 0 THEN 'und' "
    + " ".join(
        f"WHEN s_{lang} = m THEN '{lang}'" for lang in LANG_MARKERS
    )
    + " END"
)


@query(
    "text_language_id",
    oracle=f"""
    WITH tk AS (SELECT doc_id, lang, {_CLEAN_TOKS} AS toks FROM documents),
    sc AS (
      SELECT doc_id, lang,
             {", ".join(f"{_lang_score_sql(lang)} AS s_{lang}" for lang in LANG_MARKERS)}
      FROM tk),
    mx AS (SELECT *, greatest({", ".join('s_' + lang for lang in LANG_MARKERS)}) AS m FROM sc)
    SELECT doc_id, lang, {_LANG_CASE} AS predicted,
           ({_LANG_CASE}) = lang AS is_match
    FROM mx ORDER BY doc_id
    """,
)
def text_language_id(spark, sf_dir):
    """Stopword-marker language ID; the oracle replicates the
    first-language-attaining-the-max tie-break of functions/text.py."""
    pred = language_id(F.col("text"))
    return (
        widen(t(spark, sf_dir, "documents"))
        .select(
            "doc_id",
            "lang",
            pred.alias("predicted"),
            (pred == F.col("lang")).alias("is_match"),
        )
        .orderBy("doc_id")
    )


_EN = ", ".join(f"'{m}'" for m in LANG_MARKERS["en"])

@query(
    "text_quality_score",
    oracle=f"""
    WITH tk AS (SELECT doc_id, text, {_TOKS} AS toks FROM documents),
    c AS (
      SELECT doc_id,
             len(toks) AS n,
             CASE WHEN len(toks) > 0
                  THEN list_aggregate(list_transform(toks, x -> len(x)), 'sum')::DOUBLE / len(toks)
                  ELSE 0.0 END AS mean_len,
             CASE WHEN len(toks) > 0
                  THEN len(list_filter(toks, x -> list_contains([{_EN}], lower(x))))::DOUBLE / len(toks)
                  ELSE 0.0 END AS stop_ratio,
             CASE WHEN length(text) > 0
                  THEN length(regexp_replace(text, '[^a-zA-Z一-鿿]', '', 'g'))::DOUBLE / length(text)
                  ELSE 0.0 END AS alpha_ratio,
             CASE WHEN len(toks) > 0
                  THEN len(list_distinct(toks))::DOUBLE / len(toks)
                  ELSE 0.0 END AS distinct_ratio
      FROM tk)
    SELECT doc_id,
           ROUND(0.25 * (CASE WHEN n >= 20 AND n <= 10000 THEN 1.0 WHEN n >= 5 THEN 0.5 ELSE 0.0 END)
               + 0.15 * (CASE WHEN mean_len >= 3 AND mean_len <= 12 THEN 1.0 ELSE 0.3 END)
               + 0.20 * least(stop_ratio * 5, 1.0)
               + 0.20 * alpha_ratio
               + 0.20 * distinct_ratio, 9) AS quality
    FROM c ORDER BY doc_id
    """,
)
def text_quality(spark, sf_dir):
    return (
        widen(t(spark, sf_dir, "documents"))
        .select("doc_id", F.round(quality_score(F.col("text")), 9).alias("quality"))
        .transform(pinned_order, "doc_id")
    )


@query(
    "text_fingerprint",
    oracle="""
    SELECT doc_id,
           md5(array_to_string(list_sort(list_distinct(
             list_filter(regexp_split_to_array(trim(lower(text)), '\\s+'), x -> x <> '')
           )), ' ')) AS fp
    FROM documents ORDER BY doc_id
    """,
)
def text_fingerprint(spark, sf_dir):
    return (
        widen(t(spark, sf_dir, "documents"))
        .select("doc_id", fingerprint(F.col("text")).alias("fp"))
        .orderBy("doc_id")
    )


@query(
    "text_rolling_hash",
    oracle="""
    WITH ch AS (
      SELECT doc_id,
             list_transform(list_filter(str_split(text, ''), c -> c <> ''),
                            c -> ascii(c)::BIGINT) AS codes
      FROM documents)
    SELECT doc_id,
           CASE WHEN len(codes) = 0 THEN 0
                ELSE list_reduce(codes, (a, b) -> (a * 257 + b) % 2147483647)
           END AS rhash
    FROM ch ORDER BY doc_id
    """,
)
def text_rolling_hash(spark, sf_dir):
    """Rabin-Karp rolling document hash. list_reduce has no init value
    but (0*base + c1) = c1, so seeding with the first element matches the
    Spark fold-from-zero exactly."""
    return (
        widen(t(spark, sf_dir, "documents"))
        .select("doc_id", rolling_hash(F.col("text")).alias("rhash"))
        .orderBy("doc_id")
    )


_BPE_SQL = f"len(regexp_extract_all(text, '{BPE_ISH_PATTERN.replace(chr(39), chr(39) * 2)}'))::BIGINT"


@query(
    "text_token_shards",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, lang, {_BPE_SQL} AS n_tokens FROM documents)
    SELECT doc_id, lang, n_tokens,
           CAST(floor(
             (SUM(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
                                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              - n_tokens) / 10000.0) AS BIGINT) AS shard_id
    FROM tok ORDER BY doc_id
    """,
)
def text_token_shards(spark, sf_dir):
    """Contiguous training-shard assignment: per-language prefix sum of
    BPE-ish token counts, cut every 10k tokens. One window shuffle keyed
    on language; deterministic across reruns (ordered by doc_id), which
    is what makes the shards reproducible build artifacts."""
    from xorq_spark.functions import assign_token_shards

    docs = widen(t(spark, sf_dir, "documents"))
    return (
        assign_token_shards(
            docs, "text", "doc_id", tokens_per_shard=10_000, partition_cols=("lang",)
        )
        .select("doc_id", "lang", "n_tokens", "shard_id")
        .orderBy("doc_id")
    )


# Deterministic synthetic PII appended per doc so the redaction check
# is non-trivial on any corpus (the raw documents table may contain no
# PII at all). Both engines build the identical input string.
@query(
    "text_pii_redaction",
    oracle="""
    WITH aug AS (
      SELECT doc_id,
             text || ' contact: user' || doc_id ||
             '@example.com or +1 555-000-' || lpad(CAST(doc_id AS VARCHAR), 4, '0') ||
             ' at 10.0.0.' || CAST(doc_id % 256 AS VARCHAR) AS text
      FROM documents)
    SELECT doc_id,
           regexp_replace(
             regexp_replace(
               regexp_replace(text,
                 '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '[PII]', 'g'),
               '\\+?\\d[\\d\\-\\s()]{7,}\\d', '[PII]', 'g'),
             '\\b(?:\\d{1,3}\\.){3}\\d{1,3}\\b', '[PII]', 'g') AS redacted,
           len(regexp_extract_all(text,
             '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}')) AS n_email
    FROM aug ORDER BY doc_id
    """,
)
def text_pii_redaction(spark, sf_dir):
    """PII scrub pass (functions/text.py redact_pii): chained JVM-side
    regexp_replace over email/phone/ipv4 patterns chosen to mean the
    same thing in Java regex and RE2. Synthetic deterministic PII is
    appended per-document so the oracle check exercises every pattern
    on every row. Codegen'd, zero shuffle — scan-speed at any SF."""
    from xorq_spark.functions import pii_count, redact_pii

    d = widen(t(spark, sf_dir, "documents"))
    aug = d.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" contact: user"), F.col("doc_id").cast("string"),
            F.lit("@example.com or +1 555-000-"),
            F.lpad(F.col("doc_id").cast("string"), 4, "0"),
            F.lit(" at 10.0.0."), (F.col("doc_id") % 256).cast("string"),
        ).alias("text"),
    )
    return aug.select(
        "doc_id",
        redact_pii(F.col("text")).alias("redacted"),
        pii_count(F.col("text"), "email").alias("n_email"),
    ).orderBy("doc_id")


@query(
    "text_repetition_ratio",
    oracle="""
    WITH lines AS (
      SELECT doc_id,
             list_filter(regexp_split_to_array(
               text || chr(10) || 'dup line' || chr(10) || 'dup line'
               || chr(10) || 'uniq ' || doc_id, chr(10)),
               x -> trim(x) <> '') AS ls
      FROM documents)
    SELECT doc_id,
           ROUND(CASE WHEN len(ls) <= 0 THEN 0.0
                 ELSE 1.0 - len(list_distinct(ls))::DOUBLE / len(ls) END,
                 9) AS rep_ratio
    FROM lines ORDER BY doc_id
    """,
)
def text_repetition_ratio(spark, sf_dir):
    """Boilerplate signal (functions/text.py repetition_ratio):
    fraction of repeated non-blank lines. Two duplicate lines plus one
    unique line are appended per doc so the ratio is exercised on every
    row regardless of corpus shape. Pure array ops, no shuffle."""
    from xorq_spark.functions import repetition_ratio

    d = widen(t(spark, sf_dir, "documents"))
    aug = d.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit("\ndup line\ndup line\nuniq "),
            F.col("doc_id").cast("string"),
        ).alias("text"),
    )
    return aug.select(
        "doc_id",
        F.round(repetition_ratio(F.col("text")), 9).alias("rep_ratio"),
    ).orderBy("doc_id")


_NORM8 = (
    "trim(regexp_replace(regexp_replace(lower(text), '[^\\w\\s一-鿿]', ' ', 'g'),"
    " '\\s+', ' ', 'g'))"
)
_WORDS8 = f"str_split({_NORM8}, ' ')"
_SHINGLES8 = (
    f"CASE WHEN len({_WORDS8}) >= 8 THEN "
    f"list_transform(range(1, len({_WORDS8}) - 6), i -> array_to_string(({_WORDS8})[i:i+7], ' ')) "
    f"ELSE [array_to_string({_WORDS8}, ' ')] END"
)


@query(
    "text_contamination_check",
    oracle=f"""
    WITH bench AS (
      SELECT DISTINCT unnest({_SHINGLES8}) AS gram
      FROM documents WHERE doc_id % 97 = 0),
    corpus AS (
      SELECT doc_id, unnest({_SHINGLES8}) AS gram FROM documents),
    hits AS (
      SELECT c.doc_id, COUNT(*) AS contam_hits
      FROM corpus c JOIN bench b ON c.gram = b.gram
      GROUP BY c.doc_id)
    SELECT d.doc_id,
           COALESCE(h.contam_hits, 0) AS contam_hits,
           COALESCE(h.contam_hits, 0) >= 1 AS contaminated
    FROM documents d LEFT JOIN hits h ON d.doc_id = h.doc_id
    ORDER BY d.doc_id
    """,
)
def text_contamination_check(spark, sf_dir):
    """Benchmark decontamination (functions/text.py
    contamination_flags): every doc sharing an 8-word shingle with the
    'benchmark' slice (doc_id % 97 == 0 stands in for an eval set) is
    flagged. The benchmark n-gram set broadcasts; the corpus side is
    one scan + explode + broadcast hash join — corpus rows never
    shuffle."""
    from xorq_spark.functions import contamination_flags

    docs = widen(t(spark, sf_dir, "documents"))
    bench = docs.filter(F.col("doc_id") % 97 == 0)
    return contamination_flags(docs, bench, n=8).orderBy("doc_id")


@query(
    "text_chunk_documents",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, {_TOKS} AS toks FROM documents),
    meta AS (
      -- COALESCE mirrors the Spark side's null-safe count: without it a
      -- NULL text row slips past the <=0 guard (greatest ignores NULLs)
      -- and fabricates one empty chunk
      SELECT doc_id, toks, COALESCE(len(toks), 0) AS n,
             CASE WHEN COALESCE(len(toks), 0) <= 0 THEN 0
                  ELSE (greatest(COALESCE(len(toks), 0) - 8 - 1, 0) // 56) + 1 END AS n_chunks
      FROM tok),
    chunks AS (
      SELECT doc_id,
             unnest(generate_series(0, n_chunks::BIGINT - 1)) AS chunk_id,
             toks
      FROM meta WHERE n_chunks > 0)
    SELECT doc_id, chunk_id::INT AS chunk_id,
           len(list_slice(toks, chunk_id*56 + 1, chunk_id*56 + 64)) AS n_chunk_tokens,
           md5(array_to_string(list_slice(toks, chunk_id*56 + 1, chunk_id*56 + 64), ' ')) AS chunk_hash
    FROM chunks ORDER BY doc_id, chunk_id
    """,
)
def text_chunks(spark, sf_dir):
    """Overlapping 64-token chunks (8-token overlap, stride 56) of each
    document — the context-window packing operator
    (functions/text.py chunk_documents). Chunk text hashes to md5 so
    the certified value is the exact chunk content without shipping
    full text through the compare."""
    from xorq_spark.functions import chunk_documents

    # widen BEFORE chunking: tokenize/slice is the compute-bound pass,
    # and a small parquet scans as one split otherwise
    out = chunk_documents(
        widen(t(spark, sf_dir, "documents")),
        chunk_tokens=64,
        overlap_tokens=8,
    )
    return (
        out
        .select(
            "doc_id",
            "chunk_id",
            "n_chunk_tokens",
            F.md5("chunk_text").alias("chunk_hash"),
        )
        # pinned_order measured flat-to-negative here (8-pass A/B
        # 0.90 vs 0.96 min): chunking MULTIPLIES rows, so the pin
        # stores more than the sampler re-computes — left unpinned
        .orderBy("doc_id", "chunk_id")
    )


@query(
    "text_stratified_sample",
    oracle="""
    WITH h AS (
      SELECT doc_id, lang, n_chars,
             ((((0 * 31 + ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT)
                % 2147483648) * 2654435761) % 4294967296) % 10000 AS bucket
      FROM documents),
    kept AS (
      SELECT * FROM h
      WHERE bucket < CASE lang WHEN 'en' THEN 2500 WHEN 'zh' THEN 5000 ELSE 1000 END)
    SELECT lang, COUNT(*) AS n, CAST(SUM(doc_id) AS BIGINT) AS id_sum, CAST(SUM(n_chars) AS BIGINT) AS char_sum
    FROM kept GROUP BY lang ORDER BY lang
    """,
)
def text_stratified(spark, sf_dir):
    """Deterministic per-language sampling for training-mix construction
    (functions/sampling.py stratified_sample): en kept at 25%, zh
    up-sampled at 50%, everything else at 10%, keyed on doc_id so the
    sample is identical across engines/reruns and nested across rates.
    id_sum certifies the exact kept-row set, not just its size."""
    from xorq_spark.functions import stratified_sample

    kept = stratified_sample(
        t(spark, sf_dir, "documents"),
        strata_col="lang",
        fractions={"en": 0.25, "zh": 0.50},
        unique_key=["doc_id"],
        default_fraction=0.10,
    )
    # no widen: the hash filter evaluates in the scan stage and the
    # aggregate repartitions on lang anyway — a rebalance would be a
    # third, pure-overhead shuffle
    return (
        kept
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("doc_id").alias("id_sum"),
            F.sum("n_chars").alias("char_sum"),
        )
        .orderBy("lang")
    )


@query(
    "text_source_cap",
    oracle="""
    WITH ranked AS (
      SELECT source, doc_id, n_chars,
             ROW_NUMBER() OVER (
               PARTITION BY source
               ORDER BY ((((0 * 31 + ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT)
                          % 2147483648) * 2654435761) % 4294967296) ASC,
                        doc_id ASC) AS rn
      FROM documents)
    SELECT source, COUNT(*) AS n, CAST(SUM(doc_id) AS BIGINT) AS id_sum, CAST(SUM(n_chars) AS BIGINT) AS char_sum
    FROM ranked WHERE rn <= 25
    GROUP BY source ORDER BY source
    """,
)
def text_source_cap(spark, sf_dir):
    """Per-source frequency cap (functions/sampling.py cap_per_group):
    at most 25 docs per source, chosen by the deterministic key hash so
    the cut is unbiased and identical across engines/reruns. id_sum
    certifies the exact kept set."""
    from xorq_spark.functions.sampling import cap_per_group

    capped = cap_per_group(
        t(spark, sf_dir, "documents"),
        group_col="source",
        max_rows=25,
        unique_key=["doc_id"],
    )
    return (
        capped.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("doc_id").alias("id_sum"),
            F.sum("n_chars").alias("char_sum"),
        )
        .orderBy("source")
    )


@query(
    "text_temperature_sample",
    oracle="""
    WITH counts AS (
      SELECT lang, COUNT(*) AS n FROM documents GROUP BY lang),
    cuts AS (
      SELECT lang,
             CAST(FLOOR(10000.0 * (POW(n, -0.5) / MAX(POW(n, -0.5)) OVER ()) + 0.5) AS BIGINT) AS cutoff
      FROM counts),
    h AS (
      SELECT d.doc_id, d.lang, d.n_chars, c.cutoff,
             ((((0 * 31 + ('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 8))::BIGINT)
                % 2147483648) * 2654435761) % 4294967296) % 10000 AS bucket
      FROM documents d JOIN cuts c ON d.lang = c.lang),
    kept AS (SELECT * FROM h WHERE bucket < cutoff)
    SELECT lang, COUNT(*) AS n, CAST(SUM(doc_id) AS BIGINT) AS id_sum, CAST(SUM(n_chars) AS BIGINT) AS char_sum
    FROM kept GROUP BY lang ORDER BY lang
    """,
)
def text_temperature(spark, sf_dir):
    """Temperature-based mix rebalancing at alpha=0.5
    (functions/sampling.py temperature_sample): per-language keep
    fractions proportional to count^-0.5, scaled so the rarest language
    keeps everything — identical floor(x+0.5) cutoff math on both
    engines, hash-deterministic row selection, id_sum certifying the
    exact kept set."""
    from xorq_spark.functions.sampling import temperature_sample

    kept = temperature_sample(
        t(spark, sf_dir, "documents"),
        strata_col="lang",
        alpha=0.5,
        unique_key=["doc_id"],
    )
    return (
        kept.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("doc_id").alias("id_sum"),
            F.sum("n_chars").alias("char_sum"),
        )
        .orderBy("lang")
    )


@query(
    "text_char_entropy",
    oracle="""
    WITH cs AS (
      SELECT doc_id,
             list_filter(string_split(text, ''), x -> x <> '') AS chars
      FROM documents),
    d AS (
      SELECT doc_id, chars, len(chars) AS n,
             list_sort(list_distinct(chars)) AS dchars
      FROM cs)
    SELECT doc_id,
           ROUND(CASE WHEN n > 0 THEN
             -list_aggregate(list_transform(dchars, c ->
                (len(list_filter(chars, x -> x = c))::DOUBLE / n)
                * ln(len(list_filter(chars, x -> x = c))::DOUBLE / n)), 'sum')
           ELSE 0.0 END, 6) AS entropy
    FROM d ORDER BY doc_id
    """,
)
def text_entropy(spark, sf_dir):
    """Character-unigram entropy per document (functions/text.py
    char_entropy) — the perplexity-proxy curation signal; sorted-fold
    summation keeps the double math engine-identical."""
    from xorq_spark.functions.text import char_entropy

    return (
        widen(t(spark, sf_dir, "documents"))
        .select("doc_id", F.round(char_entropy(F.col("text")), 6).alias("entropy"))
        .orderBy("doc_id")
    )


@query(
    "text_weighted_sample",
    oracle="""
    WITH w AS (
      SELECT doc_id, lang, CAST(n_chars AS DOUBLE) AS w,
             ('0x' || substr(md5('wrs|' || CAST(doc_id AS VARCHAR)), 1, 13))::BIGINT AS bits
      FROM documents WHERE n_chars IS NOT NULL AND n_chars > 0),
    s AS (
      SELECT doc_id, lang,
             round(ln((CAST(bits AS DOUBLE) + 0.5) / 4503599627370496.0) / w, 9)
               AS sample_score
      FROM w),
    r AS (
      SELECT doc_id, lang, sample_score,
             row_number() OVER (
               PARTITION BY lang ORDER BY sample_score DESC, doc_id ASC
             ) AS sample_rank
      FROM s)
    SELECT lang, doc_id, sample_score, CAST(sample_rank AS INT) AS sample_rank
    FROM r WHERE sample_rank <= 5 ORDER BY lang, sample_rank
    """,
)
def text_weighted_sample_q(spark, sf_dir):
    """Weighted sampling without replacement (functions/sampling.py
    weighted_sample, Efraimidis-Spirakis A-ES): 5 docs per language
    with inclusion probability proportional to n_chars. The uniform
    draw is a 52-bit md5-derived dyadic rational, so the oracle draws
    the SAME randomness and certifies the exact selection, scores and
    ranks — a deterministic weighted training-mix selection."""
    from xorq_spark.functions.sampling import weighted_sample

    docs = widen(t(spark, sf_dir, "documents"))
    out = weighted_sample(docs, k=5, weight_col="n_chars", strata=("lang",))
    return out.select("lang", "doc_id", "sample_score", "sample_rank").orderBy(
        "lang", "sample_rank"
    )


@query(
    "text_corpus_report",
    oracle=f"""
    WITH base AS (
      SELECT source, lang,
             COALESCE(len({_TOKS}), 0) AS nt,
             length(COALESCE(text, '')) AS nc,
             md5(COALESCE(text, '')) AS dg
      FROM documents),
    vol AS (
      SELECT source, count(*) AS n_docs,
             CAST(sum(nt) AS BIGINT) AS total_tokens,
             round(avg(CAST(nt AS DOUBLE)), 9) AS mean_tokens,
             round(quantile_cont(CAST(nc AS DOUBLE), 0.25), 9) AS p25_chars,
             round(quantile_cont(CAST(nc AS DOUBLE), 0.5), 9) AS p50_chars,
             round(quantile_cont(CAST(nc AS DOUBLE), 0.75), 9) AS p75_chars
      FROM base GROUP BY source),
    lc AS (SELECT source, lang, count(*) AS c FROM base GROUP BY source, lang),
    ls AS (
      SELECT lc.source,
             count(*) AS n_langs,
             round(CAST(sum(CAST(round(
               -(lc.c::DOUBLE / v.n_docs) * ln(lc.c::DOUBLE / v.n_docs) * 1e9,
               0) AS BIGINT)) AS DOUBLE) / 1e9, 9) AS lang_entropy
      FROM lc JOIN vol v USING (source) GROUP BY lc.source),
    top AS (
      SELECT source, lang AS top_lang FROM (
        SELECT source, lang,
               row_number() OVER (PARTITION BY source
                 ORDER BY c DESC, lang DESC) AS rn
        FROM lc) WHERE rn = 1),
    dg AS (SELECT source, dg, count(*) AS c FROM base GROUP BY source, dg),
    dup AS (
      SELECT source,
             CAST(sum(CASE WHEN c > 1 THEN c ELSE 0 END) AS BIGINT) AS dup_docs
      FROM dg GROUP BY source)
    SELECT v.source, v.n_docs, v.total_tokens, v.mean_tokens,
           v.p25_chars, v.p50_chars, v.p75_chars,
           ls.n_langs, top.top_lang, ls.lang_entropy,
           round(dup.dup_docs::DOUBLE / v.n_docs, 9) AS dup_rate
    FROM vol v
    JOIN ls ON v.source = ls.source
    JOIN top ON v.source = top.source
    JOIN dup ON v.source = dup.source
    ORDER BY v.source
    """,
)
def text_corpus_report_q(spark, sf_dir):
    """Per-source corpus health report (functions/text.py
    corpus_report): volume, length quartiles, language mix + Shannon
    entropy (nano-int accumulation), exact-duplicate rate. Three
    source-keyed combinable aggregations; output is |sources| rows."""
    from xorq_spark.functions.text import corpus_report

    docs = widen(t(spark, sf_dir, "documents"))
    return corpus_report(docs).orderBy("source")


_RAW_URL = """
      CASE doc_id % 6
        WHEN 0 THEN 'HTTPS://WWW.' || source || '.Example.com:443/a/'
                    || CAST(doc_id % 7 AS VARCHAR)
                    || '?utm_source=x&b=2&a=1#frag'
        WHEN 1 THEN 'https://' || source || '.example.com/a/'
                    || CAST(doc_id % 7 AS VARCHAR) || '?a=1&b=2'
        WHEN 2 THEN 'HTTP://' || source || '.EXAMPLE.com:80/b'
        WHEN 3 THEN 'http://www.' || source || '.example.com/b/'
        WHEN 4 THEN 'https://cdn.' || source || '.example.com/x?gclid=123'
        ELSE 'not a url at all ' || CAST(doc_id % 3 AS VARCHAR)
      END
"""


@query(
    "text_url_normalize",
    oracle=f"""
    WITH raw AS (SELECT doc_id, trim({_RAW_URL}) AS u FROM documents),
    parts AS (
      SELECT doc_id, u,
             lower(regexp_extract(u, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) AS scheme,
             lower(regexp_extract(u, '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)', 1)) AS hostport,
             regexp_replace(
               regexp_extract(u, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)', 1),
               '/+$', '') AS path,
             regexp_extract(u, '\\?([^#]*)', 1) AS query
      FROM raw),
    hosts AS (
      SELECT doc_id, u, scheme, path, query,
             CASE WHEN scheme = 'http'
                    AND regexp_replace(hostport, '^www\\.', '') LIKE '%:80'
                  THEN regexp_replace(regexp_replace(hostport, '^www\\.', ''), ':80$', '')
                  WHEN scheme = 'https'
                    AND regexp_replace(hostport, '^www\\.', '') LIKE '%:443'
                  THEN regexp_replace(regexp_replace(hostport, '^www\\.', ''), ':443$', '')
                  ELSE regexp_replace(hostport, '^www\\.', '') END AS host
      FROM parts),
    normed AS (
      SELECT doc_id,
             CASE WHEN scheme = '' THEN u ELSE
               scheme || '://' || host || path ||
               CASE WHEN len(kept) > 0
                    THEN '?' || array_to_string(kept, '&') ELSE '' END
             END AS url_norm
      FROM (SELECT *,
                   list_sort(list_filter(str_split(query, '&'),
                     p -> p <> '' AND NOT regexp_matches(p,
                       '^(utm_[a-z]+|gclid|fbclid|msclkid|ref|mc_cid|mc_eid)=')))
                     AS kept
            FROM hosts))
    SELECT doc_id, url_norm,
           count(*) OVER (PARTITION BY url_norm) AS n_same_url
    FROM normed ORDER BY doc_id
    """,
)
def text_url_normalize_q(spark, sf_dir):
    """Canonical-URL dedup key (functions/text.py url_normalize) — the
    crawl pipeline's first dedup pass (C4/CCNet dedup by URL before
    any text compare): case folding, www/default-port stripping,
    fragment drop, tracking-param removal, query-param sorting. The
    synthesized raw URLs cover every rule (cases 0/1 and 2/3 collapse
    to the same canonical URL); n_same_url certifies the actual dedup
    value, not just string cosmetics."""
    from pyspark.sql import Window

    from xorq_spark.functions.text import url_normalize

    raw = F.expr(f"trim({_RAW_URL.replace('AS VARCHAR', 'AS STRING')})")
    docs = widen(t(spark, sf_dir, "documents"))
    return (
        docs.select("doc_id", url_normalize(raw).alias("url_norm"))
        .withColumn(
            "n_same_url",
            F.count(F.lit(1)).over(Window.partitionBy("url_norm")),
        )
        .orderBy("doc_id")
    )


_HTML_SYNTH_SQL = """
      '<html><head><title>T</title>'
      || '<script type="text/javascript">var x = 1 && 2 < 3; // junk</script>'
      || '<style>p { color: red }</style></head>'
      || '<body><!-- hidden comment --><h1 class="big">Doc '
      || CAST(doc_id AS VARCHAR) || '</h1><p>'
      || replace(COALESCE(text, ''), ' ', ' </p><p>')
      || '</p><ul><li>a &amp; b</li><li>&lt;tag&gt; &nbsp;x&#39;s &quot;q&quot;</li></ul></body></html>'
"""


@query(
    "text_html_extract",
    oracle=f"""
    WITH raw AS (SELECT doc_id, {_HTML_SYNTH_SQL} AS h FROM documents),
    s1 AS (SELECT doc_id,
             regexp_replace(h, '<script[^>]*>.*?</script>', ' ', 'gis') AS t
           FROM raw),
    s2 AS (SELECT doc_id,
             regexp_replace(t, '<style[^>]*>.*?</style>', ' ', 'gis') AS t
           FROM s1),
    s3 AS (SELECT doc_id, regexp_replace(t, '<!--.*?-->', ' ', 'gs') AS t FROM s2),
    s4 AS (SELECT doc_id,
             regexp_replace(t,
               '</?(p|div|br|li|ul|ol|h[1-6]|tr|table|section|article)[^>]*>',
               chr(10), 'gi') AS t
           FROM s3),
    s5 AS (SELECT doc_id, regexp_replace(t, '<[^>]+>', ' ', 'gs') AS t FROM s4),
    s6 AS (SELECT doc_id,
             replace(replace(replace(replace(replace(replace(t,
               '&nbsp;', ' '), '&amp;', '&'), '&lt;', '<'), '&gt;', '>'),
               '&quot;', '"'), '&#39;', chr(39)) AS t
           FROM s5),
    s7 AS (SELECT doc_id,
             regexp_replace(regexp_replace(regexp_replace(t,
               '[ \t]+', ' ', 'g'), ' ?\n ?', chr(10), 'g'),
               '\n{{2,}}', chr(10), 'g') AS t
           FROM s6),
    s8 AS (SELECT doc_id,
             regexp_replace(trim(t), '^\n+|\n+$', '', 'g') AS t
           FROM s7)
    SELECT doc_id,
           md5(t) AS text_md5,
           CAST(length(t) AS BIGINT) AS n_chars,
           CAST(len(str_split(t, chr(10))) AS BIGINT) AS n_lines
    FROM s8 ORDER BY doc_id
    """,
)
def text_html_extract_q(spark, sf_dir):
    """HTML→text extraction (functions/text.py html_to_text): the
    boilerplate-strip pass that precedes everything else on a crawl —
    script/style/comment payload removal, block tags to newlines, tag
    strip, entity decode, whitespace collapse. Each document is
    wrapped in a deterministic HTML shell (headers, junk script with
    &&/< operators, entities, list items), and the oracle replays the
    identical RE2-compatible regex pipeline — a leaked script body or
    a broken entity decode breaks the hash."""
    from xorq_spark.functions.text import html_to_text

    docs = widen(t(spark, sf_dir, "documents"))
    html = F.expr(_HTML_SYNTH_SQL.replace("AS VARCHAR", "AS STRING"))
    out = docs.select("doc_id", html_to_text(html).alias("txt"))
    return pinned_order(
        out.select(
            "doc_id",
            F.md5("txt").alias("text_md5"),
            F.length("txt").cast("long").alias("n_chars"),
            F.size(F.split("txt", "\n")).cast("long").alias("n_lines"),
        ),
        "doc_id",
    )


_MIX_WEIGHTS = [("src0", 400), ("src1", 300), ("src2", 200)] + [
    (f"src{i}", 25) for i in range(3, 20)
]
_MIX_W_SQL = ", ".join(f"('{s}', {w})" for s, w in _MIX_WEIGHTS)
_MIX_HASH_SQL = (
    "((((0 * 31 + ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT)"
    " % 2147483648) * 2654435761) % 4294967296) % 1000000"
)


@query(
    "text_mixture_plan",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, source, {_BPE_SQL} AS n_tokens FROM documents),
    tot AS (SELECT source, SUM(n_tokens) AS tokens_avail
            FROM tok GROUP BY source),
    w(source, wgt) AS (VALUES {_MIX_W_SQL}),
    bud AS (SELECT (2 * SUM(n_tokens)) // 5 AS budget FROM tok),
    j AS (SELECT t.source, tokens_avail, wgt FROM tot t JOIN w USING (source)),
    ws AS (SELECT SUM(wgt) AS W FROM j),
    p1 AS (SELECT j.*, (budget * wgt) // W AS alloc1, budget
           FROM j, ws, bud),
    d AS (SELECT *, tokens_avail <= alloc1 AS is_def FROM p1),
    l AS (SELECT max(budget)
                 - COALESCE(SUM(CASE WHEN is_def THEN tokens_avail END), 0)
                   AS leftover,
                 COALESCE(SUM(CASE WHEN NOT is_def THEN wgt END), 0) AS W2
          FROM d),
    plan AS (SELECT source, wgt, tokens_avail,
             CASE WHEN is_def THEN tokens_avail
                  ELSE least(tokens_avail,
                             CASE WHEN W2 > 0 THEN (leftover * wgt) // W2
                                  ELSE 0 END) END AS tokens_target
             FROM d, l),
    plan2 AS (SELECT *,
              CASE WHEN tokens_target >= tokens_avail THEN 1000000
                   ELSE (tokens_target * 1000000) // tokens_avail
                   END AS keep_buckets
              FROM plan),
    kept AS (SELECT tok.source, tok.doc_id, tok.n_tokens
             FROM tok JOIN plan2 USING (source)
             WHERE {_MIX_HASH_SQL} < keep_buckets),
    realized AS (SELECT source, COUNT(*) AS n_kept,
                        SUM(n_tokens) AS tokens_kept,
                        SUM(doc_id) AS id_sum
                 FROM kept GROUP BY source)
    SELECT p.source,
           CAST(p.wgt AS BIGINT) AS wgt,
           CAST(tokens_avail AS BIGINT) AS tokens_avail,
           CAST(tokens_target AS BIGINT) AS tokens_target,
           CAST(keep_buckets AS BIGINT) AS keep_buckets,
           CAST(COALESCE(n_kept, 0) AS BIGINT) AS n_kept,
           CAST(COALESCE(tokens_kept, 0) AS BIGINT) AS tokens_kept,
           CAST(COALESCE(id_sum, 0) AS BIGINT) AS id_sum
    FROM plan2 p LEFT JOIN realized USING (source)
    ORDER BY p.source
    """,
)
def text_mixture_plan(spark, sf_dir):
    """Token-budget mixture planning (functions/sampling.py
    plan_mixture): target weights over the 20 corpus sources, budget =
    40% of the total BPE-ish token count, two-phase integer
    water-filling (heavy sources saturate and contribute everything;
    the leftover redistributes over the light ones by renormalized
    weights), then the deterministic hash filter realizes the plan.
    Output certifies BOTH the plan arithmetic (tokens_target,
    keep_buckets) and the exact realized sample (n_kept, tokens_kept,
    id_sum) per source — one mis-planned token or one wrongly kept doc
    breaks the hash."""
    from xorq_spark.functions.sampling import plan_mixture
    from xorq_spark.functions.text import bpe_token_count

    from xorq_spark.session import static_compile

    docs = t(spark, sf_dir, "documents")
    # the tokenize pass has THREE consumers (budget aggregate, the
    # planner's per-source sums, the hash-filter realization): pin it
    # once — the budget collect materializes it anyway
    toks = widen(
        docs.select(
            "doc_id",
            "source",
            bpe_token_count(F.col("text")).alias("n_tokens"),
        )
    ).localCheckpoint(eager=True)
    # budget derived from the corpus (bounded single-row aggregate) so
    # the same query exercises saturation at every scale factor
    total = toks.agg(F.sum("n_tokens")).collect()[0][0]
    budget = 2 * int(total or 0) // 5  # empty corpus sums to NULL
    # everything downstream runs on the pinned frame or the bounded
    # 20-source planning frames: compile statically (the HDR-readout
    # pattern; under AQE this tail was ~14 driver-round-trip micro-jobs)
    with static_compile(spark):
        plan, sampled = plan_mixture(
            toks,
            source_col="source",
            token_col="n_tokens",
            weights=dict(_MIX_WEIGHTS),
            token_budget=budget,
        )
        realized = sampled.groupBy("source").agg(
            F.count(F.lit(1)).alias("n_kept"),
            F.sum("n_tokens").alias("tokens_kept"),
            F.sum("doc_id").alias("id_sum"),
        )
        out = (
            plan.join(realized, "source", "left")
            .select(
                "source",
                F.col("wgt").cast("long").alias("wgt"),
                F.col("tokens_avail").cast("long").alias("tokens_avail"),
                F.col("tokens_target").cast("long").alias("tokens_target"),
                F.col("keep_buckets").cast("long").alias("keep_buckets"),
                F.coalesce(F.col("n_kept"), F.lit(0))
                .cast("long")
                .alias("n_kept"),
                F.coalesce(F.col("tokens_kept"), F.lit(0))
                .cast("long")
                .alias("tokens_kept"),
                F.coalesce(F.col("id_sum"), F.lit(0))
                .cast("long")
                .alias("id_sum"),
            )
            .transform(pinned_order, "source")
        )
    return out


@query(
    "text_heavy_hitters",
    oracle="""
    WITH t AS (SELECT list_filter(regexp_split_to_array(trim(lower(text)),
                                  '\\s+'), x -> x <> '') AS ws
               FROM documents WHERE text IS NOT NULL),
    occ AS (SELECT unnest(list_transform(range(1, len(ws)),
                          i -> ws[i] || ' ' || ws[i + 1])) AS k FROM t),
    ex AS (SELECT k, unnest(range(0, 4)) AS row FROM occ),
    sk AS (SELECT row,
                  ('0x' || substr(md5('cms' || CAST(row AS VARCHAR) || '|' || k), 1, 8))::BIGINT % 512 AS bucket,
                  count(*) AS c
           FROM ex GROUP BY 1, 2),
    qx AS (SELECT k, unnest(range(0, 4)) AS row FROM (SELECT DISTINCT k FROM occ)),
    qb AS (SELECT k, row,
                  ('0x' || substr(md5('cms' || CAST(row AS VARCHAR) || '|' || k), 1, 8))::BIGINT % 512 AS bucket
           FROM qx),
    est AS (SELECT k, CAST(min(COALESCE(sk.c, 0)) AS BIGINT) AS cms_est
            FROM qb LEFT JOIN sk USING (row, bucket) GROUP BY k),
    exact AS (SELECT k, count(*) AS exact_count FROM occ GROUP BY k)
    SELECT exact.k AS bigram,
           CAST(exact_count AS BIGINT) AS exact_count,
           est.cms_est
    FROM exact JOIN est USING (k)
    WHERE exact_count >= 40
    ORDER BY bigram
    """,
)
def text_heavy_hitters(spark, sf_dir):
    """Exact heavy hitters with a CMS prefilter (functions/sketches.py
    heavy_hitters) over the word-bigram stream of the corpus — the
    boilerplate-phrase detector that feeds dedup/cleanup rules, and the
    two-pass shape that keeps exact top-key queries shuffle-bounded at
    100 TB: counters out (bounded), candidates back (literal lookup
    array, map-side), exact groupBy over candidates only.

    width=512 over ~900 distinct bigrams forces real collisions, so
    cms_est > exact_count for some rows and genuinely sub-threshold
    keys enter the candidate set — the exact pass provably prunes
    them (the oracle recomputes both counts independently and applies
    only the exact-count filter; a lost true hitter or an unpruned
    false positive breaks the hash)."""
    from xorq_spark.functions.sketches import heavy_hitters

    # widen(): tokenize+bigram generation is compute-bound and the
    # single-row-group file scans as ONE split — both CMS passes would
    # otherwise run serially on one core (guide §2.5 input skew).
    docs = widen(
        t(spark, sf_dir, "documents").where(F.col("text").isNotNull())
    )
    ws = F.filter(
        F.split(F.trim(F.lower(F.col("text"))), r"\s+"), lambda x: x != ""
    )
    bigrams = F.expr(
        "CASE WHEN size(__ws) >= 2 THEN "
        "transform(sequence(1, size(__ws) - 1), "
        "          i -> concat(element_at(__ws, i), ' ', element_at(__ws, i + 1))) "
        "ELSE array() END"
    )
    occ = docs.select(ws.alias("__ws")).select(
        F.explode(bigrams).alias("bigram")
    )
    return heavy_hitters(
        occ, "bigram", threshold=40, depth=4, width=512
    ).orderBy("bigram")


@query(
    "text_pmi_collocations",
    oracle="""
    WITH t AS (SELECT list_filter(regexp_split_to_array(trim(lower(text)),
                                  '\\s+'), x -> x <> '') AS ws
               FROM documents WHERE text IS NOT NULL),
    uc AS (SELECT w, CAST(count(*) AS BIGINT) AS c
           FROM (SELECT unnest(ws) AS w FROM t) GROUP BY w),
    n1 AS (SELECT CAST(sum(c) AS BIGINT) AS N1 FROM uc),
    occ AS (SELECT unnest(list_transform(range(1, len(ws)),
                          i -> ws[i] || ' ' || ws[i + 1])) AS k FROM t),
    n2 AS (SELECT CAST(count(*) AS BIGINT) AS N2 FROM occ),
    bc AS (SELECT k, CAST(count(*) AS BIGINT) AS c12 FROM occ
           GROUP BY k HAVING count(*) >= 5),
    b2 AS (SELECT split_part(k, ' ', 1) AS w1,
                  split_part(k, ' ', 2) AS w2, c12 FROM bc)
    SELECT b2.w1, b2.w2, b2.c12,
           u1.c AS c1, u2.c AS c2,
           CAST(CAST(c12 AS HUGEINT) * N1 * N1 * 1000000
                // (CAST(N2 AS HUGEINT) * u1.c * u2.c) AS BIGINT)
             AS lift_scaled
    FROM b2
    JOIN uc u1 ON b2.w1 = u1.w
    JOIN uc u2 ON b2.w2 = u2.w, n1, n2
    ORDER BY w1, w2
    """,
)
def text_pmi_collocations(spark, sf_dir):
    """Bigram collocation mining (functions/text.py pmi_collocations):
    PMI expressed as its integer LIFT ratio
    c12*N1*N1*1e6 div (N2*c1*c2) — monotone in PMI, exact in
    DECIMAL(38,0) (Spark) / HUGEINT (oracle), no log anywhere. One
    tokenize pass feeds the unigram and bigram counters; the
    vocabulary-bounded unigram table broadcasts into both count
    lookups, so the only corpus-sized shuffle is the bigram groupBy.
    The oracle recomputes every count and the exact division, so a
    lost bigram, a wrong unigram count, or a truncation difference
    breaks the hash."""
    from xorq_spark.functions.text import pmi_collocations

    docs = t(spark, sf_dir, "documents")
    return pmi_collocations(docs, min_count=5).orderBy("w1", "w2").select(
        "w1", "w2", "c12", "c1", "c2", "lift_scaled"
    )


@query(
    "text_score_calibrate",
    oracle="""
    WITH d AS (SELECT doc_id, source, n_chars FROM documents),
    n AS (SELECT CAST(count(*) AS BIGINT) AS N FROM d),
    dv AS (SELECT n_chars AS v, CAST(count(*) AS BIGINT) AS c
           FROM d GROUP BY 1),
    cumt AS (SELECT v, c,
                    sum(c) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED
                        PRECEDING AND CURRENT ROW) AS cum
             FROM dv),
    cand AS (SELECT v, cum, cum - c AS prev,
                    unnest(range(
                      CAST(greatest((cum - c) * 100 // N, 1) AS BIGINT),
                      CAST(least((cum * 100 + N - 1) // N + 2, 101)
                           AS BIGINT))) AS g
             FROM cumt, n),
    grid AS (SELECT g, v AS gval FROM cand, n
             WHERE (g * N + 99) // 100 > prev
               AND (g * N + 99) // 100 <= cum),
    r AS (SELECT doc_id, source, n_chars,
                 row_number() OVER (PARTITION BY source
                     ORDER BY n_chars, doc_id) AS rr,
                 count(*) OVER (PARTITION BY source) AS ng
          FROM d),
    x AS (SELECT doc_id, source, n_chars,
                 CAST((rr * 100 + ng - 1) // ng AS BIGINT) AS g
          FROM r)
    SELECT x.doc_id, x.source, x.n_chars,
           x.g AS pct_gridpoint, grid.gval AS calibrated
    FROM x JOIN grid USING (g)
    ORDER BY x.doc_id
    """,
)
def text_score_calibrate(spark, sf_dir):
    """Cross-source score calibration (functions/stats.py
    quantile_calibrate): every document's n_chars score replaced by
    the GLOBAL score at the same within-source percentile (k=100 grid,
    exact type-1 ranks — integer arithmetic end to end). The global
    distribution reduces to its bounded distinct-value cumsum; each
    value emits exactly the grid points whose target rank falls in its
    cumulative range (bounded sequence-explode, no corpus sort, no
    k x distinct join); the 100-row grid broadcasts back as an
    equi-join. The oracle replays ranks, grid construction, and the
    mapping, so a wrong percentile or a misplaced grid boundary breaks
    the hash."""
    from xorq_spark.functions.stats import quantile_calibrate

    docs = t(spark, sf_dir, "documents").select(
        "doc_id", "source", "n_chars"
    )
    return quantile_calibrate(
        docs, score_col="n_chars", group_col="source",
        order_cols=("doc_id",), k=100,
    ).orderBy("doc_id")


@query(
    "text_length_batching",
    oracle=f"""
    WITH d AS (SELECT doc_id, COALESCE({{bpe}}, 0) AS n_tokens
               FROM documents),
    r AS (SELECT doc_id, n_tokens,
                 row_number() OVER (ORDER BY n_tokens DESC, doc_id)
                   AS global_rank
          FROM d),
    b AS (SELECT *, CAST((global_rank - 1) // 32 + 1 AS BIGINT)
                      AS batch_id FROM r),
    s AS (SELECT batch_id, count(*) AS nd,
                 max(n_tokens) AS mx, sum(n_tokens) AS sm
          FROM b GROUP BY 1)
    SELECT b.doc_id, CAST(b.n_tokens AS BIGINT) AS n_tokens,
           CAST(global_rank AS BIGINT) AS global_rank, batch_id,
           CAST(mx AS BIGINT) AS batch_max_tokens,
           CAST(CASE WHEN nd * mx = 0 THEN 0
                ELSE ((nd * mx - sm) * 1000000) // (nd * mx)
                END AS BIGINT) AS batch_waste_ppm
    FROM b JOIN s USING (batch_id) ORDER BY b.doc_id
    """.replace("{bpe}", _BPE_SQL),
)
def text_length_batching(spark, sf_dir):
    """Length-bucketed inference batch planning (functions/text.py
    plan_length_batches): documents assigned to 32-slot batches in
    descending token-length order so each batch pads to ITS max — the
    dynamic-batching prep before embedding/scoring a corpus on
    accelerators. The global rank is built without a global sort
    (distinct-length cumulative offsets + within-length row_number,
    the quantile_calibrate pattern); per-batch padding waste is exact
    integer ppm. The oracle replays the ranking and every batch stat,
    so one misplaced document breaks the hash."""
    from xorq_spark.functions.text import plan_length_batches

    docs = t(spark, sf_dir, "documents")
    return plan_length_batches(docs, batch_size=32).orderBy("doc_id")


@query(
    "text_spearman_len_tokens",
    oracle=f"""
    WITH d AS (SELECT n_chars AS x, {_BPE_SQL} AS y FROM documents
               WHERE n_chars IS NOT NULL AND text IS NOT NULL),
    rx AS (SELECT x, CAST(2 * (sum(c) OVER (ORDER BY x ROWS BETWEEN
                 UNBOUNDED PRECEDING AND CURRENT ROW) - c) + c + 1
                 AS BIGINT) AS r2x
           FROM (SELECT x, count(*) AS c FROM d GROUP BY x)),
    ry AS (SELECT y, CAST(2 * (sum(c) OVER (ORDER BY y ROWS BETWEEN
                 UNBOUNDED PRECEDING AND CURRENT ROW) - c) + c + 1
                 AS BIGINT) AS r2y
           FROM (SELECT y, count(*) AS c FROM d GROUP BY y)),
    j AS (SELECT r2x, r2y FROM d JOIN rx USING (x) JOIN ry USING (y)),
    g AS (SELECT CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(CAST(r2x AS HUGEINT)) AS HUGEINT) AS sx,
                 CAST(sum(CAST(r2y AS HUGEINT)) AS HUGEINT) AS sy,
                 CAST(sum(CAST(r2x AS HUGEINT) * r2y) AS HUGEINT) AS sxy,
                 CAST(sum(CAST(r2x AS HUGEINT) * r2x) AS HUGEINT) AS sxx,
                 CAST(sum(CAST(r2y AS HUGEINT) * r2y) AS HUGEINT) AS syy
          FROM j)
    SELECT n,
           ROUND((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                  - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                 / (sqrt(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                         - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                    * sqrt(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                           - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))),
                 9) AS rho
    FROM g
    """,
)
def text_spearman_len_tokens(spark, sf_dir):
    """Exact Spearman rank correlation between document length and
    BPE-ish token count (functions/stats.py spearman_corr): tied
    average ranks as doubled integers off each column's bounded
    distinct-value cumulative table, exact DECIMAL(38,0)/HUGEINT
    sufficient statistics, rho as an identical IEEE tree rounded 9.
    The monotone-association readout outliers can't break. The oracle
    replays both rank tables and the full formula."""
    from xorq_spark.functions.stats import spearman_corr
    from xorq_spark.functions.text import bpe_token_count

    docs = t(spark, sf_dir, "documents").where(
        F.col("n_chars").isNotNull() & F.col("text").isNotNull()
    ).select(
        F.col("n_chars").alias("x"),
        bpe_token_count(F.col("text")).cast("long").alias("y"),
    )
    return spearman_corr(docs, "x", "y")


def _rake_oracle() -> str:
    from xorq_spark.functions.text import RAKE_STOPWORDS

    stops = ", ".join(f"'{s}'" for s in RAKE_STOPWORDS)
    return f"""
    WITH toks0 AS (
      SELECT doc_id, unnest({_CLEAN_TOKS}) AS tok,
             unnest(range(1, len({_TOKS}) + 1)) AS pos
      FROM documents),
    toks AS (SELECT doc_id, tok, pos FROM toks0 WHERE tok <> ''),
    ns AS (SELECT doc_id, tok, pos,
                  pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos)
                    AS isl
           FROM toks WHERE tok NOT IN ({stops})),
    ph AS (SELECT doc_id, isl,
                  string_agg(tok, ' ' ORDER BY pos) AS phrase,
                  CAST(count(*) AS BIGINT) AS plen
           FROM ns GROUP BY 1, 2 HAVING count(*) <= 4),
    occ AS (SELECT ns.doc_id, ns.isl, ns.tok, ph.plen, ph.phrase
            FROM ns JOIN ph ON ns.doc_id = ph.doc_id AND ns.isl = ph.isl),
    ws AS (SELECT tok,
                  CAST(sum(plen) * 1000000 // count(*) AS BIGINT) AS ws
           FROM occ GROUP BY tok),
    inst AS (SELECT o.doc_id, o.isl, o.phrase,
                    CAST(sum(ws.ws) AS BIGINT) AS score
             FROM occ o JOIN ws USING (tok) GROUP BY 1, 2, 3)
    SELECT phrase,
           CAST(len(string_split(phrase, ' ')) AS BIGINT) AS n_words,
           CAST(count(*) AS BIGINT) AS n_occurrences,
           CAST(max(score) AS BIGINT) AS score_ppm
    FROM inst GROUP BY phrase
    ORDER BY score_ppm DESC, phrase LIMIT 15
    """


@query("text_rake_keywords", oracle=_rake_oracle())
def text_rake_keywords(spark, sf_dir):
    """RAKE corpus keyword extraction (functions/text.py
    rake_keywords): stopword-free token runs become candidate phrases
    (gaps-and-islands over positions, one doc-keyed window shuffle);
    words score corpus degree/freq in integer ppm; phrases sum their
    words. Global top-15 by (score desc, phrase) — the unsupervised
    tagging/topic primitive beside TF-IDF and PMI collocations. The
    oracle replays every island boundary and every score."""
    from xorq_spark.functions.text import rake_keywords

    docs = t(spark, sf_dir, "documents")
    return rake_keywords(docs, "text", "doc_id", max_phrase_len=4, top_k=15)


@query(
    "text_source_overlap",
    oracle=f"""
    WITH tk AS (
      SELECT DISTINCT source, unnest({_CLEAN_TOKS}) AS tok
      FROM documents WHERE text IS NOT NULL AND source IS NOT NULL),
    tk2 AS (SELECT source, tok FROM tk WHERE tok <> ''),
    sz AS (SELECT source, CAST(count(*) AS BIGINT) AS n FROM tk2
           GROUP BY 1),
    inter AS (SELECT a.source AS src_a, b.source AS src_b,
                     CAST(count(*) AS BIGINT) AS n_common
              FROM tk2 a JOIN tk2 b
                ON a.tok = b.tok AND a.source < b.source
              GROUP BY 1, 2)
    SELECT i.src_a, i.src_b, i.n_common,
           sa.n AS vocab_a, sb.n AS vocab_b,
           CAST(i.n_common * 1000000 // (sa.n + sb.n - i.n_common)
                AS BIGINT) AS jaccard_ppm,
           CAST(i.n_common * 1000000 // least(sa.n, sb.n) AS BIGINT)
             AS overlap_coef_ppm
    FROM inter i JOIN sz sa ON i.src_a = sa.source
                 JOIN sz sb ON i.src_b = sb.source
    ORDER BY src_a, src_b
    """,
)
def text_source_overlap(spark, sf_dir):
    """Vocabulary overlap between corpus sources — Jaccard and
    Szymkiewicz-Simpson overlap coefficients over distinct-token sets
    in exact ppm: the corpus-comparison readout behind "is source X
    redundant given Y" mixture decisions. The (source, token) dedup is
    one combinable pass; the pair join is token-keyed with the BOUNDED
    source domain riding as payload (never a doc-level join); source
    sizes broadcast back."""
    docs = t(spark, sf_dir, "documents").where(
        F.col("text").isNotNull() & F.col("source").isNotNull()
    )
    tk = (
        docs.select(
            "source",
            F.explode(
                F.split(F.trim(F.lower("text")), r"\s+")
            ).alias("__raw"),
        )
        .select(
            "source",
            F.regexp_replace("__raw", r"[^\w一-鿿]", "").alias("tok"),
        )
        .where(F.col("tok") != "")
        .distinct()
    )
    sz = tk.groupBy("source").agg(F.count(F.lit(1)).cast("long").alias("n"))
    a = tk.select(F.col("source").alias("src_a"), "tok")
    b = tk.select(F.col("source").alias("src_b"), "tok")
    inter = (
        a.join(b, "tok")
        .where(F.col("src_a") < F.col("src_b"))
        .groupBy("src_a", "src_b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_common"))
    )
    return (
        inter.join(
            F.broadcast(sz.withColumnRenamed("source", "src_a")
                        .withColumnRenamed("n", "vocab_a")), "src_a")
        .join(
            F.broadcast(sz.withColumnRenamed("source", "src_b")
                        .withColumnRenamed("n", "vocab_b")), "src_b")
        .select(
            "src_a", "src_b", "n_common", "vocab_a", "vocab_b",
            F.expr(
                "CAST(n_common * 1000000"
                " div (vocab_a + vocab_b - n_common) AS BIGINT)"
            ).alias("jaccard_ppm"),
            F.expr(
                "CAST(n_common * 1000000 div least(vocab_a, vocab_b)"
                " AS BIGINT)"
            ).alias("overlap_coef_ppm"),
        )
        .orderBy("src_a", "src_b")
    )


@query(
    "text_zipf_slope",
    oracle=f"""
    WITH tk AS (SELECT unnest({_CLEAN_TOKS}) AS tok FROM documents
                WHERE text IS NOT NULL),
    c AS (SELECT tok, CAST(count(*) AS BIGINT) AS c FROM tk
          WHERE tok <> '' GROUP BY tok),
    r AS (SELECT c, row_number() OVER (ORDER BY c DESC, tok) AS rk
          FROM c QUALIFY rk <= 100),
    arr AS (SELECT list(c ORDER BY rk) AS cs FROM r HAVING count(*) >= 2),
    s AS (SELECT CAST(len(cs) AS BIGINT) AS k,
            list_aggregate(list_transform(range(1, len(cs) + 1),
              i -> ln(CAST(i AS DOUBLE))), 'sum') AS sx,
            list_aggregate(list_transform(range(1, len(cs) + 1),
              i -> ln(CAST(cs[i] AS DOUBLE))), 'sum') AS sy,
            list_aggregate(list_transform(range(1, len(cs) + 1),
              i -> ln(CAST(i AS DOUBLE)) * ln(CAST(cs[i] AS DOUBLE))),
              'sum') AS sxy,
            list_aggregate(list_transform(range(1, len(cs) + 1),
              i -> ln(CAST(i AS DOUBLE)) * ln(CAST(i AS DOUBLE))),
              'sum') AS sxx
          FROM arr)
    SELECT k,
           round((CAST(k AS DOUBLE) * sxy - sx * sy)
                 / (CAST(k AS DOUBLE) * sxx - sx * sx), 9) AS zipf_slope
    FROM s
    """,
)
def text_zipf_slope(spark, sf_dir):
    """Zipf's-law slope of the corpus: OLS of ln(frequency) on
    ln(rank) over the top-100 tokens — natural text sits near -1;
    boilerplate-heavy or synthetic corpora drift off it (a corpus-
    health fingerprint beside char entropy and the Gopher rules). The
    top-100 table is bounded (global rank via one window over the
    token-count frame); all four ln sums fold over the SAME rank-
    ordered bounded array on both engines (order-deterministic float
    accumulation, the Hill/entropy convention), slope rounded 9."""
    from pyspark.sql import Window

    docs = t(spark, sf_dir, "documents").where(F.col("text").isNotNull())
    tk = (
        docs.select(
            F.explode(F.split(F.trim(F.lower("text")), r"\s+")).alias("__raw")
        )
        .select(F.regexp_replace("__raw", r"[^\w一-鿿]", "").alias("tok"))
        .where(F.col("tok") != "")
    )
    c = tk.groupBy("tok").agg(F.count(F.lit(1)).cast("long").alias("c"))
    w = Window.partitionBy(F.lit(1)).orderBy(F.col("c").desc(), F.col("tok"))
    r = c.withColumn("rk", F.row_number().over(w)).where(F.col("rk") <= 100)
    # slope needs k >= 2; empty/degenerate corpora yield no row
    # (sequence(1, 0) is DESCENDING in Spark — an unguarded fold would
    # index into the empty array)
    arr = r.groupBy().agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("rk", "c"))),
            lambda x: x["c"],
        ).alias("cs")
    ).where(F.size("cs") >= 2)
    def fold(term):
        return F.expr(
            f"aggregate(sequence(1, size(cs)), CAST(0.0 AS DOUBLE),"
            f" (s, i) -> s + ({term}))"
        )
    s = arr.select(
        F.size("cs").cast("long").alias("k"),
        fold("ln(CAST(i AS DOUBLE))").alias("sx"),
        fold("ln(CAST(element_at(cs, i) AS DOUBLE))").alias("sy"),
        fold(
            "ln(CAST(i AS DOUBLE))"
            " * ln(CAST(element_at(cs, i) AS DOUBLE))"
        ).alias("sxy"),
        fold("ln(CAST(i AS DOUBLE)) * ln(CAST(i AS DOUBLE))").alias("sxx"),
    )
    return s.select(
        "k",
        F.round(
            (F.col("k").cast("double") * F.col("sxy")
             - F.col("sx") * F.col("sy"))
            / (F.col("k").cast("double") * F.col("sxx")
               - F.col("sx") * F.col("sx")),
            9,
        ).alias("zipf_slope"),
    )


@query(
    "text_heaps_law",
    oracle=f"""
    WITH tk AS (SELECT doc_id, unnest({_CLEAN_TOKS}) AS tok
                FROM documents WHERE text IS NOT NULL),
    tk2 AS (SELECT doc_id, tok FROM tk WHERE tok <> ''),
    first_doc AS (SELECT tok, CAST(min(doc_id) AS BIGINT) AS fd
                  FROM tk2 GROUP BY tok),
    docs AS (SELECT DISTINCT doc_id FROM tk2),
    nd AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM docs),
    rk AS (SELECT doc_id,
                  CAST(row_number() OVER (ORDER BY doc_id) AS BIGINT) AS r
           FROM docs),
    tokcum AS (SELECT rk.r,
                      CAST(sum(count(*)) OVER (ORDER BY rk.r) AS BIGINT)
                        AS cum_tokens
               FROM tk2 JOIN rk USING (doc_id) GROUP BY rk.r),
    voccum AS (SELECT rk.r,
                      CAST(sum(count(*)) OVER (ORDER BY rk.r) AS BIGINT)
                        AS cum_vocab
               FROM first_doc f JOIN rk ON f.fd = rk.doc_id
               GROUP BY rk.r),
    chk AS (SELECT g.pct, CAST((g.pct * nd.n_docs + 9) // 10 AS BIGINT)
                     AS r_target
            FROM (SELECT unnest(range(1, 11)) AS pct) g CROSS JOIN nd)
    SELECT CAST(chk.pct * 10 AS BIGINT) AS pct_docs,
           chk.r_target AS n_docs,
           (SELECT max(cum_tokens) FROM tokcum
            WHERE tokcum.r <= chk.r_target) AS n_tokens,
           (SELECT max(cum_vocab) FROM voccum
            WHERE voccum.r <= chk.r_target) AS vocab_size
    FROM chk ORDER BY pct_docs
    """,
)
def text_heaps_law(spark, sf_dir):
    """Vocabulary growth curve (Heaps' law): distinct-token count and
    total-token count after the first 10%..100% of documents (ordered
    by doc_id) — sub-linear growth is natural text, near-linear growth
    flags synthetic/ID-heavy corpora. Each token's FIRST document is
    one combinable min, so the vocab at a checkpoint is a cumulative
    count over the bounded doc-rank frame — the corpus is read once,
    nothing re-scans per checkpoint."""
    from pyspark.sql import Window

    docs_t = t(spark, sf_dir, "documents").where(F.col("text").isNotNull())
    tk2 = (
        docs_t.select(
            "doc_id",
            F.explode(
                F.split(F.trim(F.lower("text")), r"\s+")
            ).alias("__raw"),
        )
        .select(
            "doc_id",
            F.regexp_replace("__raw", r"[^\w一-鿿]", "").alias("tok"),
        )
        .where(F.col("tok") != "")
    )
    first_doc = tk2.groupBy("tok").agg(F.min("doc_id").alias("fd"))
    docs = tk2.select("doc_id").distinct()
    nd = docs.agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
    w = Window.partitionBy(F.lit(1)).orderBy("doc_id")
    rk = docs.select(
        "doc_id", F.row_number().over(w).cast("long").alias("r")
    )
    wc = Window.partitionBy(F.lit(1)).orderBy("r").rowsBetween(
        Window.unboundedPreceding, 0
    )
    tokcum = (
        tk2.join(rk, "doc_id")
        .groupBy("r")
        .agg(F.count(F.lit(1)).alias("__c"))
        .select("r", F.sum("__c").over(wc).cast("long").alias("cum_tokens"))
    )
    voccum = (
        first_doc.join(rk, first_doc.fd == rk.doc_id)
        .groupBy("r")
        .agg(F.count(F.lit(1)).alias("__v"))
        .select("r", F.sum("__v").over(wc).cast("long").alias("cum_vocab"))
    )
    g = docs_t.sparkSession.range(1, 11).select(F.col("id").alias("pct"))
    chk = g.crossJoin(F.broadcast(nd)).select(
        "pct",
        F.expr("CAST((pct * n_docs + 9) div 10 AS BIGINT)").alias("r_target"),
    )
    tok_at = (
        chk.join(tokcum, tokcum.r <= chk.r_target, "left")
        .groupBy("pct", "r_target")
        .agg(F.max("cum_tokens").alias("n_tokens"))
    )
    voc_at = (
        chk.join(voccum, voccum.r <= chk.r_target, "left")
        .groupBy("pct")
        .agg(F.max("cum_vocab").alias("vocab_size"))
    )
    return (
        tok_at.join(voc_at, "pct")
        .select(
            (F.col("pct") * 10).cast("long").alias("pct_docs"),
            F.col("r_target").alias("n_docs"),
            "n_tokens", "vocab_size",
        )
        .orderBy("pct_docs")
    )


@query(
    "text_interleave_sources",
    oracle="""
    WITH r AS (
      SELECT source, doc_id,
             ROW_NUMBER() OVER (
               PARTITION BY source
               ORDER BY md5('ilv|' || CAST(doc_id AS VARCHAR)), doc_id
             ) AS rank_in_source
      FROM documents WHERE source IS NOT NULL)
    SELECT CAST(ROW_NUMBER() OVER (
             ORDER BY rank_in_source, source, doc_id) AS BIGINT) AS position,
           CAST(rank_in_source AS BIGINT) AS rank_in_source,
           source, doc_id
    FROM r ORDER BY position
    """,
)
def text_interleave_sources_q(spark, sf_dir):
    """Source-interleaved training order (functions/sampling.py
    interleave_sources): round-robin across the 20 sources with an
    md5-shuffled within-source order. Spark computes the global
    position by CLOSED FORM over the bounded per-source counts (no
    global sort/window — the banned single-task shape); the oracle
    computes it as the naive global ROW_NUMBER definition, so the hash
    certifies that the closed form IS the spec."""
    from xorq_spark.functions.sampling import interleave_sources

    docs = widen(t(spark, sf_dir, "documents"))
    return interleave_sources(docs).select(
        F.col("position"),
        F.col("rank_in_source").cast("long").alias("rank_in_source"),
        "source",
        "doc_id",
    ).orderBy("position")


# ----------------------------------------------------------- stemming
# Porter (1980) stemming, dual-implemented: Spark stems the DISTINCT
# vocabulary with an Arrow-batched pandas UDF (functions/stem.py
# porter_stem); the oracle runs an independent pure-SQL implementation
# of the same published algorithm (functions/stem.py porter_sql_ctes).
# The hash match is therefore a genuine cross-implementation
# certification (DuckDB's stem() lives in the fts extension, which is
# not installable offline). Cross-validated exhaustively: 112k
# generated words, zero divergence (tests/test_stem.py).

from xorq_spark.functions.stem import (  # noqa: E402
    ALPHA_TOKENS_SQL,
    alpha_tokens,
    porter_sql_ctes,
    stem_udf,
    stemmed_docs,
)

_STEM_MAP_CTES = (
    f"tokd AS (SELECT doc_id, {ALPHA_TOKENS_SQL} AS tt FROM documents),\n"
    "    voc AS (SELECT DISTINCT unnest(tt) AS word FROM tokd),"
    + porter_sql_ctes("voc", "word")
    + ",\n    smap AS (SELECT word, stem FROM pstem)"
)


@query(
    "text_stem_vocab",
    oracle=f"""
    WITH {_STEM_MAP_CTES},
    occ AS (SELECT doc_id, unnest(tt) AS word FROM tokd),
    socc AS (SELECT doc_id, word, stem FROM occ JOIN smap USING (word)),
    tfq AS (SELECT stem, CAST(count(*) AS BIGINT) AS tf,
                   CAST(count(DISTINCT word) AS BIGINT) AS n_forms,
                   min(word) AS example_form
            FROM socc GROUP BY stem),
    dfq AS (SELECT stem, CAST(count(*) AS BIGINT) AS df
            FROM (SELECT DISTINCT doc_id, stem FROM socc) GROUP BY stem)
    SELECT stem, tf, df, n_forms, example_form
    FROM tfq JOIN dfq USING (stem)
    ORDER BY tf DESC, stem LIMIT 50
    """,
)
def text_stem_vocab_q(spark, sf_dir):
    """Stemmed-vocabulary rollup: top-50 Porter stems by total term
    frequency with document frequency, surface-form counts and the
    lexicographically-first form — the vocabulary-overlap /
    index-vocabulary audit of a stemmed retrieval pipeline. The UDF
    touches only the DISTINCT vocabulary (Heaps-law sublinear); the
    corpus stream sees one explode + combinable aggregates; top-50 is
    TakeOrderedAndProject, never a global sort."""
    docs = widen(t(spark, sf_dir, "documents"))
    toks = docs.select("doc_id", alpha_tokens(F.col("text")).alias("tt"))
    occ = toks.select("doc_id", F.explode("tt").alias("word"))
    # ONE corpus-sized pass: pre-aggregate to (doc, word) postings
    # (map-side combinable), then decorate with stems and fold every
    # per-stem statistic in a single aggregation — tf is a plain sum
    # and df/n_forms are distincts over the postings frame (vocabulary
    # x doc-frequency sized, corpus-sublinear), so the token stream is
    # scanned exactly once
    post = occ.groupBy("doc_id", "word").agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )
    smap = post.select("word").distinct().withColumn(
        "stem", stem_udf()(F.col("word"))
    )
    return (
        post.join(smap, "word")
        .groupBy("stem")
        .agg(
            F.sum("cnt").cast("long").alias("tf"),
            F.countDistinct("doc_id").cast("long").alias("df"),
            F.countDistinct("word").cast("long").alias("n_forms"),
            F.min("word").alias("example_form"),
        )
        .select("stem", "tf", "df", "n_forms", "example_form")
        .orderBy(F.desc("tf"), "stem")
        .limit(50)
    )


@query(
    "text_stem_dedup_key",
    oracle=f"""
    WITH {_STEM_MAP_CTES},
    occ AS (SELECT doc_id, unnest(tt) AS word FROM tokd),
    socc AS (SELECT doc_id, stem FROM occ JOIN smap USING (word)),
    sigs0 AS (SELECT doc_id,
                     md5(array_to_string(list_sort(list(DISTINCT stem)), ' '))
                       AS stem_sig
              FROM socc GROUP BY doc_id),
    sigs AS (SELECT d.doc_id, COALESCE(s.stem_sig, md5('')) AS stem_sig
             FROM documents d LEFT JOIN sigs0 s USING (doc_id)),
    grp AS (SELECT stem_sig, CAST(count(*) AS BIGINT) AS n_same
            FROM sigs GROUP BY stem_sig)
    SELECT doc_id, stem_sig, n_same, n_same > 1 AS is_dup
    FROM sigs JOIN grp USING (stem_sig) ORDER BY doc_id
    """,
)
def text_stem_dedup_key_q(spark, sf_dir):
    """Stemmed dedup key: md5 of the sorted DISTINCT stem set per
    document — collapses inflection-only rewrites ("running dogs" vs
    "run dog") that exact hashing misses. 32-byte keys shuffle, never
    documents; group sizes come from one combinable count. Docs with
    no alpha tokens key on md5('') so corpus cardinality is preserved."""
    docs = widen(t(spark, sf_dir, "documents"))
    toks = docs.select("doc_id", alpha_tokens(F.col("text")).alias("tt"))
    occ = toks.select("doc_id", F.explode("tt").alias("word"))
    smap = occ.select("word").distinct().withColumn(
        "stem", stem_udf()(F.col("word"))
    )
    sigs0 = (
        occ.join(smap, "word")
        .groupBy("doc_id")
        .agg(
            F.md5(
                F.array_join(F.sort_array(F.collect_set("stem")), " ")
            ).alias("stem_sig")
        )
    )
    sigs = (
        docs.select("doc_id")
        .join(sigs0, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("stem_sig", F.md5(F.lit(""))).alias("stem_sig"),
        )
    )
    grp = sigs.groupBy("stem_sig").agg(
        F.count(F.lit(1)).cast("long").alias("n_same")
    )
    return (
        sigs.join(grp, "stem_sig")
        .select(
            "doc_id", "stem_sig", "n_same",
            (F.col("n_same") > 1).alias("is_dup"),
        )
        .orderBy("doc_id")
    )


@query(
    "text_bm25_stemmed",
    oracle=f"""
    WITH {_STEM_MAP_CTES},
    occ0 AS (SELECT doc_id, unnest(tt) AS word FROM tokd),
    occ AS (SELECT doc_id, stem AS term FROM occ0 JOIN smap USING (word)),
    lens AS (SELECT d.doc_id, CAST(COALESCE(c.n, 0) AS BIGINT) AS dl
             FROM documents d LEFT JOIN
               (SELECT doc_id, count(*) AS n FROM occ GROUP BY 1) c
               USING (doc_id)),
    post AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
             FROM occ GROUP BY 1, 2),
    dfq AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM post GROUP BY term),
    tot AS (SELECT CAST(count(*) AS BIGINT) AS N,
                   (SELECT CAST(sum(dl) AS BIGINT) FROM lens) AS T
            FROM documents),
    topt AS (SELECT term, df,
                    row_number() OVER (ORDER BY df DESC, term ASC) AS rk
             FROM dfq QUALIFY rk <= 9),
    qt AS (SELECT CAST((rk - 1) // 3 + 1 AS INT) AS query_id, term,
                  CAST(round(ln((2 * N + 2) / (2 * df + 1)) * 1e9, 0) AS BIGINT)
                    AS idf_nano
           FROM topt, tot),
    sc AS (SELECT query_id, post.doc_id,
                  CAST(CAST(idf_nano AS HUGEINT) * 44 * T * tf
                       // (CAST(20 AS HUGEINT) * T * tf
                           + CAST(6 AS HUGEINT) * T
                           + CAST(18 AS HUGEINT) * dl * N) AS BIGINT) AS s
           FROM post JOIN qt USING (term) JOIN lens USING (doc_id), tot),
    pd AS (SELECT query_id, doc_id, CAST(sum(s) AS BIGINT) AS score_nano
           FROM sc GROUP BY 1, 2),
    rk AS (SELECT *, row_number() OVER (PARTITION BY query_id
                                        ORDER BY score_nano DESC, doc_id ASC)
                       AS rank
           FROM pd)
    SELECT query_id, doc_id, score_nano, CAST(rank AS INT) AS rank
    FROM rk WHERE rank <= 5 ORDER BY query_id, rank
    """,
)
def text_bm25_stemmed_q(spark, sf_dir):
    """Stemmed BM25 top-5: the text_bm25_topk contract run over
    Porter-stemmed postings — query "run" now retrieves documents
    saying "running" (the recall win stemming exists for). Reuses the
    certified integer-exact bm25_topk verbatim on a stemmed-docs view
    (functions/stem.py stemmed_docs: vocab-sized UDF + one token-stream
    join); corpus cardinality N and the per-doc length dl move to the
    alpha-token domain on both sides."""
    from xorq_spark.functions.retrieval import (
        bm25_topk,
        build_postings,
        derive_query_terms,
    )

    docs2 = stemmed_docs(widen(t(spark, sf_dir, "documents")))
    # ONE stem+tokenize+postings pass shared by query derivation and
    # scoring (guide §2.4) — the stemmed view is the expensive part.
    postings = build_postings(docs2)
    qterms = derive_query_terms(
        docs2, n_queries=3, terms_per_query=3, postings=postings
    )
    return bm25_topk(docs2, qterms, topk=5, postings=postings).orderBy(
        "query_id", "rank"
    )
