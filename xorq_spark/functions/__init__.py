"""Large-scale training-data operators (beyond the reference's surface):
text analysis, deduplication (exact / MinHash-LSH / SimHash / n-gram
Jaccard / embedding cosine), similarity search, multimodal plumbing.

Every operator is built from JVM-side pyspark.sql.functions (no Python
UDFs in any hot path) and designed around one-shuffle patterns that
survive 100 TB inputs.
"""

from xorq_spark.functions.text import (
    tokenize,
    token_count,
    bpe_token_count,
    contamination_flags,
    pii_count,
    redact_pii,
    repetition_ratio,
    bpe_token_count_exact,
    language_id,
    quality_score,
    fingerprint,
    rolling_hash,
    assign_token_shards,
    char_entropy,
    chunk_documents,
    gopher_flags,
    pack_sequences,
    tfidf_topk,
)
from xorq_spark.functions.sampling import cap_per_group, stratified_sample, temperature_sample
from xorq_spark.functions.timeseries import funnel, resample, retention
from xorq_spark.functions.dedup import (
    normalize_text,
    shingles,
    exact_dedup,
    minhash_signature,
    near_dedup,
    minhash_lsh_pairs,
    simhash,
    simhash_neardup_pairs,
    ngram_jaccard_pairs,
    embedding_neardup_pairs,
    connected_components,
    line_dedup,
    dup_ngram_fraction,
)
from xorq_spark.functions.similarity import (
    cosine_similarity,
    dequantize_embedding,
    l2_norm,
    quantization_error,
    quantize_embedding,
    ann_bruteforce_topk,
    ann_ivf_topk,
    ann_ivf_fixed_topk,
    ann_lsh_topk,
    ann_topk,
)

__all__ = [
    "tokenize",
    "token_count",
    "bpe_token_count",
    "contamination_flags",
    "pii_count",
    "redact_pii",
    "repetition_ratio",
    "bpe_token_count_exact",
    "language_id",
    "quality_score",
    "fingerprint",
    "rolling_hash",
    "chunk_documents",
    "char_entropy",
    "stratified_sample",
    "cap_per_group",
    "temperature_sample",
    "resample",
    "funnel",
    "retention",
    "quantize_embedding",
    "dequantize_embedding",
    "quantization_error",
    "normalize_text",
    "shingles",
    "exact_dedup",
    "minhash_signature",
    "minhash_lsh_pairs",
    "simhash",
    "simhash_neardup_pairs",
    "ngram_jaccard_pairs",
    "embedding_neardup_pairs",
    "connected_components",
    "near_dedup",
    "assign_token_shards",
    "cosine_similarity",
    "l2_norm",
    "ann_bruteforce_topk",
    "ann_ivf_topk",
    "ann_ivf_fixed_topk",
    "ann_lsh_topk",
    "ann_topk",
]
