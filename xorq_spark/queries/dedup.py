"""Deduplication queries over documents/embeddings, exercising
xorq_spark.functions.dedup (exact, MinHash+LSH, SimHash, n-gram
Jaccard, embedding cosine)."""

from __future__ import annotations

import pyspark.sql.functions as F

from xorq_spark.functions import (
    connected_components,
    embedding_neardup_pairs,
    exact_dedup,
    minhash_lsh_pairs,
    minhash_signature,
    ngram_jaccard_pairs,
    simhash,
    simhash_neardup_pairs,
)
from xorq_spark.functions.dedup import lsh_band_keys, hamming64
from xorq_spark.queries.base import query, t, widen

# DuckDB fragments mirroring functions/dedup.py.
_NORM = (
    "trim(regexp_replace(regexp_replace(lower(text), '[^\\w\\s一-鿿]', ' ', 'g'),"
    " '\\s+', ' ', 'g'))"
)
_WORDS = f"str_split({_NORM}, ' ')"
_SHINGLES = (
    f"CASE WHEN len({_WORDS}) >= 3 THEN "
    f"list_transform(range(1, len({_WORDS}) - 1), i -> array_to_string(({_WORDS})[i:i+2], ' ')) "
    f"ELSE [array_to_string({_WORDS}, ' ')] END"
)
# Mirrors functions/dedup.py minhash_from_shingles: one 32-bit md5-prefix
# hash per shingle, then 16 universal-hash permutations mod 2^31-1.
_HS = "list_transform(sh, s -> ('0x' || substring(md5(s), 1, 8))::BIGINT % 2147483647)"
_SIG = (
    "list_transform(range(0, 16), i -> "
    "list_aggregate(list_transform(hs, h -> "
    "(((2654435761 * (i + 1)) % 2147483647) * h"
    " + (40503 * (i + 1)) % 2147483647) % 2147483647), 'min'))"
)
_BANDS = (
    "list_transform(range(0, 4), b -> "
    "md5(array_to_string(list_transform(sig[b*4+1 : b*4+4], x -> x::VARCHAR), '|')))"
)


@query(
    "dedup_exact_text",
    oracle=f"""
    WITH keyed AS (SELECT *, md5({_NORM}) AS dk FROM documents),
    w AS (SELECT dk, min(doc_id) AS doc_id FROM keyed GROUP BY dk)
    SELECT k.doc_id, k.lang, k.source FROM keyed k
    JOIN w ON k.dk = w.dk AND k.doc_id = w.doc_id
    ORDER BY k.doc_id
    """,
)
def dedup_exact(spark, sf_dir):
    """Exact dedup keyed on md5 of normalized text (32-byte shuffle keys,
    never full documents). No widen(): one md5 per row is cheaper than
    the extra text shuffle (the keyed frame is consumed twice)."""
    docs = t(spark, sf_dir, "documents")
    return (
        exact_dedup(docs, "text", "doc_id")
        .select("doc_id", "lang", "source")
        .orderBy("doc_id")
    )


@query(
    "dedup_minhash_signatures",
    oracle=f"""
    WITH s AS (SELECT doc_id, {_SHINGLES} AS sh FROM documents),
    h AS (SELECT doc_id, {_HS} AS hs FROM s),
    sig AS (SELECT doc_id, {_SIG} AS sig FROM h)
    SELECT doc_id, sig, {_BANDS} AS band_keys
    FROM sig ORDER BY doc_id
    """,
)
def dedup_minhash_sigs(spark, sf_dir):
    """MinHash signature + LSH band keys per document (16 hashes, 4
    bands). One md5-prefix hash per shingle, universal-hash
    permutations for the 16 slots (portable integer minhash domain)."""
    docs = widen(t(spark, sf_dir, "documents"))
    sig = minhash_signature(F.col("text"), 16, 3)
    return (
        docs.select("doc_id", sig.alias("sig"))
        .select("doc_id", "sig", lsh_band_keys(F.col("sig"), 4, 4).alias("band_keys"))
        .orderBy("doc_id")
    )


@query(
    "dedup_minhash_lsh_pairs",
    oracle=f"""
    WITH s AS (SELECT doc_id, list_distinct({_SHINGLES}) AS shd, {_SHINGLES} AS sh FROM documents),
    h AS (SELECT doc_id, shd, {_HS} AS hs FROM s),
    sig AS (SELECT doc_id, shd, {_SIG} AS sig FROM h),
    banded AS (
      SELECT doc_id, shd,
             unnest(range(0, 4)) AS band,
             unnest({_BANDS}) AS bkey
      FROM sig),
    cand AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM banded a JOIN banded b ON a.band = b.band AND a.bkey = b.bkey
      WHERE a.doc_id < b.doc_id)
    SELECT c.id_a, c.id_b,
           ROUND(len(list_intersect(sa.shd, sb.shd))::DOUBLE
                 / len(list_distinct(list_concat(sa.shd, sb.shd))), 9) AS jaccard_sim
    FROM cand c
    JOIN s sa ON sa.doc_id = c.id_a
    JOIN s sb ON sb.doc_id = c.id_b
    WHERE len(list_intersect(sa.shd, sb.shd))::DOUBLE
          / len(list_distinct(list_concat(sa.shd, sb.shd))) >= 0.2
    ORDER BY id_a, id_b
    """,
)
def dedup_minhash_pairs(spark, sf_dir):
    """Near-dup candidate pairs via MinHash banding + exact Jaccard
    verification (threshold 0.2). minhash_lsh_pairs widens the scan
    itself, so no widen() here."""
    docs = t(spark, sf_dir, "documents")
    return minhash_lsh_pairs(
        docs, "text", "doc_id", num_hashes=16, bands=4, k=3, threshold=0.2
    ).orderBy("id_a", "id_b")


@query(
    "dedup_minhash_components",
    oracle=f"""
    WITH RECURSIVE
    s AS (SELECT doc_id, list_distinct({_SHINGLES}) AS shd FROM documents),
    h AS (SELECT doc_id, shd, list_transform(shd, s -> ('0x' || substring(md5(s), 1, 8))::BIGINT % 2147483647) AS hs FROM s),
    sig AS (SELECT doc_id, shd, {_SIG} AS sig FROM h),
    banded AS (
      SELECT doc_id, shd,
             unnest(range(0, 4)) AS band,
             unnest({_BANDS}) AS bkey
      FROM sig),
    cand AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM banded a JOIN banded b ON a.band = b.band AND a.bkey = b.bkey
      WHERE a.doc_id < b.doc_id),
    pairs AS (
      SELECT c.id_a, c.id_b
      FROM cand c
      JOIN s sa ON sa.doc_id = c.id_a
      JOIN s sb ON sb.doc_id = c.id_b
      WHERE len(list_intersect(sa.shd, sb.shd))::DOUBLE
            / len(list_distinct(list_concat(sa.shd, sb.shd))) >= 0.2),
    edges AS (
      SELECT id_a AS u, id_b AS v FROM pairs
      UNION
      SELECT id_b AS u, id_a AS v FROM pairs),
    reach AS (
      SELECT u, v FROM edges
      UNION
      SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u WHERE e.v <> r.u)
    SELECT u AS doc_id, least(u, min(v)) AS component_id
    FROM reach GROUP BY u ORDER BY doc_id
    """,
)
def dedup_minhash_comps(spark, sf_dir):
    """Near-dup CLUSTERS: MinHash-LSH pairs -> connected components
    (alternating large-star/small-star) -> (doc_id, component_id) with
    component_id = min doc id in the cluster. This is the step that
    turns pairwise similarity into an actual dedup decision (keep the
    canonical min-id doc per component). The oracle computes the same
    components with a recursive-CTE transitive closure — feasible at
    sf0.01, which is exactly why the Spark side uses the O(log^2 n)
    star algorithm instead."""
    docs = t(spark, sf_dir, "documents")
    pairs = minhash_lsh_pairs(
        docs, "text", "doc_id", num_hashes=16, bands=4, k=3, threshold=0.2
    )
    return (
        connected_components(pairs, "id_a", "id_b")
        .select(F.col("node").alias("doc_id"), F.col("component").alias("component_id"))
        .orderBy("doc_id")
    )


def _simhash_oracle() -> str:
    votes = ",\n             ".join(
        f"SUM(CASE WHEN (h >> {b}) & 1 = 1 THEN 1 ELSE -1 END) AS v{b}"
        for b in range(32)
    )
    bits = " + ".join(f"(CASE WHEN v{b} > 0 THEN {1 << b} ELSE 0 END)" for b in range(32))
    return f"""
    WITH toks AS (
      SELECT doc_id, unnest(list_filter({_WORDS}, x -> x <> '')) AS tok
      FROM documents),
    h AS (SELECT doc_id, ('0x' || substr(md5(tok), 1, 8))::BIGINT AS h FROM toks),
    v AS (SELECT doc_id,
             {votes}
          FROM h GROUP BY doc_id),
    sh AS (SELECT doc_id, ({bits})::BIGINT AS simhash64 FROM v),
    ref AS (SELECT simhash64 AS ref_hash FROM sh WHERE doc_id = 0)
    SELECT d.doc_id, coalesce(sh.simhash64, 0) AS simhash64,
           bit_count(xor(coalesce(sh.simhash64, 0), ref.ref_hash)) AS hamming_to_doc0
    FROM documents d LEFT JOIN sh ON d.doc_id = sh.doc_id CROSS JOIN ref
    ORDER BY d.doc_id
    """


@query("dedup_simhash", oracle=_simhash_oracle())
def dedup_simhash(spark, sf_dir):
    """32-bit SimHash per document + Hamming distance to doc 0 (the
    near-dup metric: small Hamming distance <=> near-duplicate)."""
    docs = widen(t(spark, sf_dir, "documents")).select(
        "doc_id", simhash(F.col("text"), 32).alias("simhash64")
    )
    ref = docs.filter(F.col("doc_id") == 0).select(
        F.col("simhash64").alias("ref_hash")
    )
    return (
        docs.crossJoin(F.broadcast(ref))
        .select(
            "doc_id",
            "simhash64",
            hamming64(F.col("simhash64"), F.col("ref_hash")).alias("hamming_to_doc0"),
        )
        .orderBy("doc_id")
    )


def _simhash_pairs_oracle() -> str:
    votes = ",\n             ".join(
        f"SUM(CASE WHEN (h >> {b}) & 1 = 1 THEN 1 ELSE -1 END) AS v{b}"
        for b in range(32)
    )
    bits = " + ".join(f"(CASE WHEN v{b} > 0 THEN {1 << b} ELSE 0 END)" for b in range(32))
    return f"""
    WITH toks AS (
      SELECT doc_id, unnest(list_filter({_WORDS}, x -> x <> '')) AS tok
      FROM documents),
    h AS (SELECT doc_id, ('0x' || substr(md5(tok), 1, 8))::BIGINT AS h FROM toks),
    v AS (SELECT doc_id,
             {votes}
          FROM h GROUP BY doc_id),
    sh AS (SELECT doc_id, ({bits})::BIGINT AS sh FROM v WHERE ({bits})::BIGINT <> 0),
    banded AS (
      SELECT doc_id, sh, unnest(range(0, 4)) AS band FROM sh),
    b2 AS (
      SELECT doc_id, sh, band, (sh >> (band * 8)::INT) & 255 AS bval FROM banded)
    SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
           bit_count(xor(a.sh, b.sh)) AS hamming
    FROM b2 a JOIN b2 b ON a.band = b.band AND a.bval = b.bval
    WHERE a.doc_id < b.doc_id AND bit_count(xor(a.sh, b.sh)) <= 3
    ORDER BY id_a, id_b
    """


@query("dedup_simhash_pairs", oracle=_simhash_pairs_oracle())
def dedup_simhash_pairs_q(spark, sf_dir):
    """SimHash near-dup pairs with the pigeonhole banding join: hashes
    within Hamming distance 3 must agree exactly on one of 4 8-bit
    bands, so candidate generation is an equi-join on (band, byte) — one
    shuffle of tiny keys — never an all-pairs distance scan."""
    docs = widen(t(spark, sf_dir, "documents"))
    return simhash_neardup_pairs(
        docs, "text", "doc_id", max_hamming=3, bands=4, bits=32
    ).orderBy("id_a", "id_b")


@query(
    "dedup_ngram_jaccard_pairs",
    oracle=f"""
    WITH s AS (SELECT doc_id, lang, list_distinct({_SHINGLES}) AS shd FROM documents),
    inv AS (SELECT doc_id, lang, len(shd) AS n, unnest(shd) AS sg FROM s),
    shared AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.n AS na, b.n AS nb, COUNT(*) AS shared
      FROM inv a JOIN inv b ON a.lang = b.lang AND md5(a.sg) = md5(b.sg)
      WHERE a.doc_id < b.doc_id
      GROUP BY 1, 2, 3, 4)
    SELECT id_a, id_b, ROUND(shared::DOUBLE / (na + nb - shared), 9) AS jaccard_sim
    FROM shared
    WHERE shared::DOUBLE / (na + nb - shared) >= 0.05
    ORDER BY id_a, id_b
    """,
)
def dedup_ngram(spark, sf_dir):
    """Exact n-gram Jaccard via inverted shingle index, partitioned by
    language (the scale guard for the quadratic join)."""
    docs = widen(t(spark, sf_dir, "documents"))
    return ngram_jaccard_pairs(
        docs, "text", "doc_id", k=3, threshold=0.05, partition_cols=["lang"]
    ).orderBy("id_a", "id_b")


@query(
    "dedup_embedding_cosine",
    oracle="""
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           ROUND(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6) AS cos_sim
    FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
    WHERE ROUND(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6) >= 0.5
    ORDER BY id_a, id_b
    """,
)
def dedup_embedding(spark, sf_dir):
    """Embedding-cosine near-dup pairs, exact all-pairs variant (the
    oracle-checkable baseline; the LSH-bucketed scale path is exercised
    by sim_ann_lsh_topk and tests)."""
    emb = widen(t(spark, sf_dir, "embeddings"))
    return embedding_neardup_pairs(
        emb, "embedding", "vec_id", threshold=0.5, bucket_join=False
    ).orderBy("id_a", "id_b")


@query(
    "dedup_minhash_canonical",
    oracle=f"""
    WITH RECURSIVE
    s AS (SELECT doc_id, list_distinct({_SHINGLES}) AS shd FROM documents),
    h AS (SELECT doc_id, shd, list_transform(shd, s -> ('0x' || substring(md5(s), 1, 8))::BIGINT % 2147483647) AS hs FROM s),
    sig AS (SELECT doc_id, shd, {_SIG} AS sig FROM h),
    banded AS (
      SELECT doc_id, shd,
             unnest(range(0, 4)) AS band,
             unnest({_BANDS}) AS bkey
      FROM sig),
    cand AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM banded a JOIN banded b ON a.band = b.band AND a.bkey = b.bkey
      WHERE a.doc_id < b.doc_id),
    pairs AS (
      SELECT c.id_a, c.id_b
      FROM cand c
      JOIN s sa ON sa.doc_id = c.id_a
      JOIN s sb ON sb.doc_id = c.id_b
      WHERE len(list_intersect(sa.shd, sb.shd))::DOUBLE
            / len(list_distinct(list_concat(sa.shd, sb.shd))) >= 0.2),
    edges AS (
      SELECT id_a AS u, id_b AS v FROM pairs
      UNION
      SELECT id_b AS u, id_a AS v FROM pairs),
    reach AS (
      SELECT u, v FROM edges
      UNION
      SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u WHERE e.v <> r.u),
    comp AS (
      SELECT u AS doc_id, least(u, min(v)) AS component_id
      FROM reach GROUP BY u),
    losers AS (SELECT doc_id FROM comp WHERE doc_id <> component_id)
    SELECT d.doc_id, d.lang, d.source FROM documents d
    LEFT JOIN losers l ON d.doc_id = l.doc_id
    WHERE l.doc_id IS NULL
    ORDER BY d.doc_id
    """,
)
def dedup_canonical(spark, sf_dir):
    """End-to-end near-dedup (functions/dedup.py near_dedup): the
    one-call pairs -> components -> keep-canonical composition; output
    is the surviving document rows."""
    from xorq_spark.functions.dedup import near_dedup

    kept = near_dedup(
        t(spark, sf_dir, "documents"),
        num_hashes=16, bands=4, k=3, threshold=0.2,
    )
    return kept.select("doc_id", "lang", "source").orderBy("doc_id")


_OLD_FILTER = "doc_id % 3 <> 0"
_NEW_FILTER = "doc_id % 3 = 0"
# digest sets: same md5-prefix ints the minhash base hash uses
_DIGESTS = "list_distinct(list_transform(shd, s -> ('0x' || substring(md5(s), 1, 8))::BIGINT % 2147483647))"


@query(
    "dedup_incremental_vs_index",
    oracle=f"""
    WITH old_s AS (SELECT doc_id, list_distinct({_SHINGLES}) AS shd, {_SHINGLES} AS sh
                   FROM documents WHERE {_OLD_FILTER}),
    new_s AS (SELECT doc_id, list_distinct({_SHINGLES}) AS shd, {_SHINGLES} AS sh
              FROM documents WHERE {_NEW_FILTER}),
    old_h AS (SELECT doc_id, shd, {_HS} AS hs FROM old_s),
    new_h AS (SELECT doc_id, shd, {_HS} AS hs FROM new_s),
    old_sig AS (SELECT doc_id, shd, {_SIG} AS sig FROM old_h),
    new_sig AS (SELECT doc_id, shd, {_SIG} AS sig FROM new_h),
    old_b AS (SELECT doc_id, unnest(range(0, 4)) AS band, unnest({_BANDS}) AS bkey FROM old_sig),
    new_b AS (SELECT doc_id, unnest(range(0, 4)) AS band, unnest({_BANDS}) AS bkey FROM new_sig),
    cand AS (
      SELECT DISTINCT n.doc_id, o.doc_id AS old_id
      FROM new_b n JOIN old_b o ON n.band = o.band AND n.bkey = o.bkey),
    old_d AS (SELECT doc_id, {_DIGESTS} AS digests FROM old_s),
    new_d AS (SELECT doc_id, {_DIGESTS} AS digests FROM new_s),
    sims AS (
      SELECT c.doc_id,
             count(*) AS n_candidates,
             max(len(list_intersect(nd.digests, od.digests))::DOUBLE
                 / greatest(len(list_distinct(list_concat(nd.digests, od.digests))), 1)) AS max_sim
      FROM cand c
      JOIN new_d nd ON nd.doc_id = c.doc_id
      JOIN old_d od ON od.doc_id = c.old_id
      GROUP BY c.doc_id)
    SELECT d.doc_id,
           COALESCE(s.n_candidates, 0) AS n_candidates,
           round(COALESCE(s.max_sim, 0.0), 9) AS max_sim,
           round(COALESCE(s.max_sim, 0.0), 9) >= 0.2 AS is_dup
    FROM (SELECT doc_id FROM documents WHERE {_NEW_FILTER}) d
    LEFT JOIN sims s USING (doc_id)
    ORDER BY d.doc_id
    """,
)
def dedup_incremental_q(spark, sf_dir):
    """Incremental near-dedup of a new batch against a persisted corpus
    index (functions/dedup.py build_dedup_index + dedup_incremental):
    docs with doc_id % 3 != 0 stand in for the historical corpus whose
    index survives between crawls; the % 3 == 0 batch is matched
    against it — band-key join for candidates, digest-set Jaccard for
    verification, old text never touched."""
    from xorq_spark.functions.dedup import build_dedup_index, dedup_incremental

    docs = widen(t(spark, sf_dir, "documents"))
    old = docs.where(F.expr(_OLD_FILTER))
    new = docs.where(F.expr(_NEW_FILTER))
    idx_bands, idx_digests = build_dedup_index(old)
    return dedup_incremental(
        new, idx_bands, idx_digests, threshold=0.2
    ).orderBy("doc_id")


@query(
    "dedup_canonical_longest",
    oracle=f"""
    WITH RECURSIVE
    s AS (SELECT doc_id, list_distinct({_SHINGLES}) AS shd FROM documents),
    h AS (SELECT doc_id, shd, list_transform(shd, s -> ('0x' || substring(md5(s), 1, 8))::BIGINT % 2147483647) AS hs FROM s),
    sig AS (SELECT doc_id, shd, {_SIG} AS sig FROM h),
    banded AS (
      SELECT doc_id, shd,
             unnest(range(0, 4)) AS band,
             unnest({_BANDS}) AS bkey
      FROM sig),
    cand AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM banded a JOIN banded b ON a.band = b.band AND a.bkey = b.bkey
      WHERE a.doc_id < b.doc_id),
    pairs AS (
      SELECT c.id_a, c.id_b
      FROM cand c
      JOIN s sa ON sa.doc_id = c.id_a
      JOIN s sb ON sb.doc_id = c.id_b
      WHERE len(list_intersect(sa.shd, sb.shd))::DOUBLE
            / len(list_distinct(list_concat(sa.shd, sb.shd))) >= 0.2),
    edges AS (
      SELECT id_a AS u, id_b AS v FROM pairs
      UNION
      SELECT id_b AS u, id_a AS v FROM pairs),
    reach AS (
      SELECT u, v FROM edges
      UNION
      SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u WHERE e.v <> r.u),
    comp AS (
      SELECT u AS doc_id, least(u, min(v)) AS component_id
      FROM reach GROUP BY u),
    lens AS (SELECT c.doc_id, c.component_id,
                    length(COALESCE(d.text, '')) AS l
             FROM comp c JOIN documents d USING (doc_id)),
    winners AS (
      SELECT component_id, doc_id AS winner FROM (
        SELECT component_id, doc_id,
               row_number() OVER (PARTITION BY component_id
                 ORDER BY l DESC, doc_id ASC) AS rn
        FROM lens) WHERE rn = 1),
    losers AS (
      SELECT lens.doc_id FROM lens
      LEFT JOIN winners ON lens.doc_id = winners.winner
      WHERE winners.winner IS NULL)
    SELECT d.doc_id, d.lang, d.source,
           CAST(length(COALESCE(d.text, '')) AS BIGINT) AS n_chars_kept
    FROM documents d
    LEFT JOIN losers l ON d.doc_id = l.doc_id
    WHERE l.doc_id IS NULL
    ORDER BY d.doc_id
    """,
)
def dedup_canonical_longest_q(spark, sf_dir):
    """End-to-end near-dedup with C4's keep-longest rule
    (functions/dedup.py near_dedup(keep='longest')): per duplicate
    cluster the longest text survives, ties to the lowest id —
    all-integer keys, deterministic everywhere. Exercises the
    component-keyed struct-max winner selection on top of the
    certified pairs->components pipeline."""
    from xorq_spark.functions.dedup import near_dedup

    kept = near_dedup(
        t(spark, sf_dir, "documents"),
        num_hashes=16, bands=4, k=3, threshold=0.2, keep="longest",
    )
    return kept.select(
        "doc_id", "lang", "source",
        F.length(F.coalesce(F.col("text"), F.lit(""))).cast("long").alias(
            "n_chars_kept"
        ),
    ).orderBy("doc_id")


@query(
    "dedup_fuzzy_linkage",
    oracle="""
    WITH b AS (
      SELECT p_partkey AS id, p_name AS t,
             regexp_split_to_array(p_name, '\\s+')[-1] AS blk
      FROM part),
    pr AS (
      SELECT a.id AS id_a, b2.id AS id_b, levenshtein(a.t, b2.t) AS d
      FROM b a JOIN b b2 ON a.blk = b2.blk AND a.id <> b2.id
      WHERE levenshtein(a.t, b2.t) <= 2),
    enc AS (
      SELECT id_a, count(*) AS n_links,
             min(d * 10000000 + id_b) AS code
      FROM pr GROUP BY id_a)
    SELECT id_a AS p_partkey,
           CAST(n_links AS BIGINT) AS n_links,
           CAST(code // 10000000 AS INT) AS best_dist,
           CAST(code % 10000000 AS BIGINT) AS best_id
    FROM enc ORDER BY p_partkey
    """,
)
def dedup_fuzzy_linkage_q(spark, sf_dir):
    """Record linkage / entity resolution (functions/dedup.py
    fuzzy_match_pairs): per part, how many same-block (last word)
    names sit within Levenshtein distance 2, and the closest match
    (ties to the lowest id, encoded as d*1e7+id so both engines pick
    identically). Blocking confines the quadratic verify to each
    block — the classic linkage shape; edit distance is an integer DP,
    bit-identical everywhere."""
    from xorq_spark.functions.dedup import fuzzy_match_pairs

    part = t(spark, sf_dir, "part")
    pairs = fuzzy_match_pairs(
        part, "p_name", "p_partkey", max_distance=2, symmetric=True
    )
    enc = pairs.groupBy("id_a").agg(
        F.count(F.lit(1)).alias("n_links"),
        F.min(
            F.col("distance").cast("long") * 10000000 + F.col("id_b")
        ).alias("code"),
    )
    return enc.select(
        F.col("id_a").alias("p_partkey"),
        F.col("n_links").cast("long").alias("n_links"),
        (F.col("code") / 10000000).cast("int").alias("best_dist"),
        (F.col("code") % 10000000).cast("long").alias("best_id"),
    ).orderBy("p_partkey")


@query(
    "dedup_ngram_containment",
    oracle=f"""
    WITH s AS (SELECT doc_id, lang, list_distinct({_SHINGLES}) AS shd FROM documents),
    inv AS (SELECT doc_id, lang, len(shd) AS n, unnest(shd) AS sg FROM s),
    shared AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.n AS na, b.n AS nb, COUNT(*) AS shared
      FROM inv a JOIN inv b ON a.lang = b.lang AND md5(a.sg) = md5(b.sg)
      WHERE a.doc_id < b.doc_id
      GROUP BY 1, 2, 3, 4)
    SELECT id_a, id_b,
           CAST(shared AS BIGINT) AS n_shared,
           CAST(na AS BIGINT) AS n_a,
           CAST(nb AS BIGINT) AS n_b,
           CAST((shared * 1000000000) // na AS BIGINT) AS contain_a_e9,
           CAST((shared * 1000000000) // nb AS BIGINT) AS contain_b_e9
    FROM shared
    WHERE shared * 100 >= na * 80 OR shared * 100 >= nb * 80
    ORDER BY id_a, id_b
    """,
)
def dedup_ngram_containment(spark, sf_dir):
    """Asymmetric n-gram containment (functions/dedup.py
    ngram_containment_pairs): quote/excerpt detection — the signal
    symmetric Jaccard misses (a short doc pasted inside a long one has
    low Jaccard but containment near 1). Same single digest-keyed
    inverted-index shuffle as the Jaccard path, language-partitioned;
    the >=80% test and both containment directions are exact integer
    arithmetic, replayed bit-for-bit by the oracle."""
    from xorq_spark.functions.dedup import ngram_containment_pairs

    docs = widen(t(spark, sf_dir, "documents"))
    return ngram_containment_pairs(
        docs, "text", "doc_id", k=3, threshold=(80, 100),
        partition_cols=["lang"],
    ).orderBy("id_a", "id_b")


@query(
    "dedup_lsh_eval",
    oracle=f"""
    WITH s AS (SELECT doc_id, list_distinct({_SHINGLES}) AS shd FROM documents),
    base AS (SELECT doc_id, shd, len(shd) AS n FROM s),
    inv AS (SELECT doc_id, n, md5(unnest(shd)) AS sg FROM base),
    tpairs AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.n AS na, b.n AS nb,
             COUNT(*) AS shared
      FROM inv a JOIN inv b ON a.sg = b.sg
      WHERE a.doc_id < b.doc_id
      GROUP BY 1, 2, 3, 4),
    tstats AS (
      SELECT COUNT(*) AS n_true FROM tpairs
      WHERE shared * 5 >= (na + nb - shared) * 1),
    h AS (SELECT doc_id, list_transform(shd, s -> ('0x' || substring(md5(s), 1, 8))::BIGINT % 2147483647) AS hs FROM s),
    sig AS (SELECT doc_id, {_SIG} AS sig FROM h),
    banded AS (
      SELECT doc_id, unnest(range(0, 4)) AS band, unnest({_BANDS}) AS bkey
      FROM sig),
    cand AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM banded a JOIN banded b
        ON a.band = b.band AND a.bkey = b.bkey AND a.bkey IS NOT NULL
      WHERE a.doc_id < b.doc_id),
    cstats AS (
      SELECT COUNT(*) AS n_cand,
             COALESCE(SUM(CASE WHEN len(list_intersect(sa.shd, sb.shd)) * 5
                   >= (sa.n + sb.n - len(list_intersect(sa.shd, sb.shd))) * 1
                 THEN 1 ELSE 0 END), 0) AS n_hit
      FROM cand c
      JOIN base sa ON sa.doc_id = c.id_a
      JOIN base sb ON sb.doc_id = c.id_b)
    SELECT CAST(t.n_true AS BIGINT) AS n_true,
           CAST(c.n_cand AS BIGINT) AS n_cand,
           CAST(c.n_hit AS BIGINT) AS n_hit,
           CAST(CASE WHEN c.n_cand = 0 THEN 0
                ELSE (c.n_hit * 1000000000) // c.n_cand END AS BIGINT) AS precision_e9,
           CAST(CASE WHEN t.n_true = 0 THEN 0
                ELSE (c.n_hit * 1000000000) // t.n_true END AS BIGINT) AS recall_e9
    FROM tstats t, cstats c
    """,
)
def dedup_lsh_eval(spark, sf_dir):
    """Recall/precision of MinHash-LSH banding vs exact Jaccard ground
    truth (functions/dedup.py minhash_lsh_eval) — the go/no-go metric
    for (num_hashes, bands) before trusting the approximate index on
    the full corpus; run on a deterministic sample at scale. Both arms
    distributed; the oracle independently recomputes the exact inverted
    index AND the banding pipeline, so a banding drift OR a ground-truth
    drift breaks the hash. Ratios are exact integer 1e9 divisions."""
    from xorq_spark.functions.dedup import minhash_lsh_eval

    docs = widen(t(spark, sf_dir, "documents"))
    return minhash_lsh_eval(
        docs, "text", "doc_id", num_hashes=16, bands=4, k=3, threshold=(1, 5)
    )


@query(
    "dedup_jaccard_prefix",
    oracle=f"""
    WITH s AS (SELECT doc_id, lang, list_distinct({_SHINGLES}) AS shd FROM documents),
    inv AS (SELECT doc_id, lang, len(shd) AS n, unnest(shd) AS sg FROM s),
    shared AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.n AS na, b.n AS nb, COUNT(*) AS shared
      FROM inv a JOIN inv b ON a.lang = b.lang AND md5(a.sg) = md5(b.sg)
      WHERE a.doc_id < b.doc_id
      GROUP BY 1, 2, 3, 4)
    SELECT id_a, id_b, ROUND(shared::DOUBLE / (na + nb - shared), 9) AS jaccard_sim
    FROM shared
    WHERE shared * 5 >= (na + nb - shared) * 1
    ORDER BY id_a, id_b
    """,
)
def dedup_jaccard_prefix(spark, sf_dir):
    """Prefix-filtered exact set-similarity join (functions/dedup.py
    ngram_jaccard_prefix_pairs; Vernica et al. SIGMOD 2010 / PPJoin):
    only each doc's rarest n - ceil(t*n) + 1 shingles are indexed, so
    boilerplate shingles fall out of the candidate join entirely — the
    100 TB path for exact Jaccard. The oracle is the BRUTE-FORCE
    inverted index: a hash match certifies the filter lost no pair;
    threshold test is the exact integer rational shared*den >=
    (na+nb-shared)*num on both engines."""
    from xorq_spark.functions.dedup import ngram_jaccard_prefix_pairs

    docs = widen(t(spark, sf_dir, "documents"))
    return ngram_jaccard_prefix_pairs(
        docs, "text", "doc_id", k=3, threshold=(1, 5),
        partition_cols=["lang"],
    ).orderBy("id_a", "id_b")


@query(
    "dedup_bcubed_eval",
    oracle="""
    WITH a AS (
      SELECT doc_id,
             coalesce(lang, '?') || '|' || CAST(n_chars // 100 AS VARCHAR)
               AS pred,
             md5(lower(text)) AS gold
      FROM documents WHERE text IS NOT NULL),
    cell AS (SELECT pred, gold, CAST(count(*) AS BIGINT) AS a
             FROM a GROUP BY 1, 2),
    bp AS (SELECT pred, CAST(sum(a) AS BIGINT) AS bp FROM cell GROUP BY 1),
    bg AS (SELECT gold, CAST(sum(a) AS BIGINT) AS bg FROM cell GROUP BY 1),
    s AS (SELECT CAST(sum(a) AS BIGINT) AS n,
                 CAST(sum(cell.a * cell.a * 1000000 // bp.bp) AS BIGINT) AS ps,
                 CAST(sum(cell.a * cell.a * 1000000 // bg.bg) AS BIGINT) AS rs,
                 CAST(count(DISTINCT cell.pred) AS BIGINT) AS n_pred,
                 CAST(count(DISTINCT cell.gold) AS BIGINT) AS n_gold
          FROM cell JOIN bp USING (pred) JOIN bg USING (gold))
    SELECT n, n_pred, n_gold,
           CAST(ps // n AS BIGINT) AS precision_ppm,
           CAST(rs // n AS BIGINT) AS recall_ppm,
           CAST(CASE WHEN ps // n + rs // n = 0 THEN 0
                ELSE 2 * (ps // n) * (rs // n) // (ps // n + rs // n)
                END AS BIGINT) AS f1_ppm
    FROM s
    """,
)
def dedup_bcubed_eval(spark, sf_dir):
    """B-cubed extrinsic clustering evaluation — the standard metric
    for judging a dedup/blocking clustering against gold labels
    (Bagga & Baldwin 1998; used for entity-resolution QA). Here the
    PREDICTED clustering is the cheap blocking key (lang,
    n_chars div 100) and GOLD is exact lowercase-text identity; B^3
    precision/recall need only the (pred, gold) CELL sizes — for every
    doc in a cell of size a, P = a/|pred|, R = a/|gold| — so three
    combinable counts replace any pairwise comparison (pair-counting
    metrics explode quadratically; B^3 is linear). Per-cell integer
    ppm with floor division, deterministic on both engines."""
    docs = t(spark, sf_dir, "documents").where(F.col("text").isNotNull())
    a = docs.select(
        F.concat_ws(
            "|",
            F.coalesce("lang", F.lit("?")),
            F.expr("CAST(n_chars div 100 AS STRING)"),
        ).alias("pred"),
        F.md5(F.lower("text")).alias("gold"),
    )
    cell = a.groupBy("pred", "gold").agg(
        F.count(F.lit(1)).cast("long").alias("a")
    )
    bp = cell.groupBy("pred").agg(F.sum("a").cast("long").alias("bp"))
    bg = cell.groupBy("gold").agg(F.sum("a").cast("long").alias("bg"))
    s = (
        cell.join(bp, "pred")
        .join(bg, "gold")
        .agg(
            F.sum("a").cast("long").alias("n"),
            F.expr(
                "CAST(sum(a * a * 1000000 div bp) AS BIGINT)"
            ).alias("ps"),
            F.expr(
                "CAST(sum(a * a * 1000000 div bg) AS BIGINT)"
            ).alias("rs"),
            F.countDistinct("pred").cast("long").alias("n_pred"),
            F.countDistinct("gold").cast("long").alias("n_gold"),
        )
    )
    return s.select(
        "n", "n_pred", "n_gold",
        F.expr("CAST(ps div n AS BIGINT)").alias("precision_ppm"),
        F.expr("CAST(rs div n AS BIGINT)").alias("recall_ppm"),
        F.expr(
            "CAST(CASE WHEN ps div n + rs div n = 0 THEN 0"
            " ELSE 2 * (ps div n) * (rs div n) div (ps div n + rs div n)"
            " END AS BIGINT)"
        ).alias("f1_ppm"),
    )


@query(
    "dedup_threshold_sweep",
    oracle=f"""
    WITH s AS (SELECT doc_id, lang, list_distinct({_SHINGLES}) AS shd
               FROM documents),
    inv AS (SELECT doc_id, lang, len(shd) AS n, unnest(shd) AS sg FROM s),
    shared AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.n AS na, b.n AS nb,
             CAST(count(*) AS BIGINT) AS shared
      FROM inv a JOIN inv b ON a.lang = b.lang AND md5(a.sg) = md5(b.sg)
      WHERE a.doc_id < b.doc_id
      GROUP BY 1, 2, 3, 4),
    pj AS (SELECT id_a, id_b,
                  CAST(shared * 1000000 // (na + nb - shared) AS BIGINT)
                    AS j_ppm
           FROM shared),
    dmax AS (SELECT doc_id, CAST(max(j_ppm) AS BIGINT) AS mj FROM (
               SELECT id_a AS doc_id, j_ppm FROM pj
               UNION ALL SELECT id_b, j_ppm FROM pj) GROUP BY 1),
    thr AS (SELECT unnest([500000, 600000, 700000, 800000, 900000])
              AS threshold_ppm)
    SELECT t.threshold_ppm,
           CAST((SELECT count(*) FROM pj WHERE pj.j_ppm >= t.threshold_ppm)
                AS BIGINT) AS n_pairs,
           CAST((SELECT count(*) FROM dmax WHERE dmax.mj >= t.threshold_ppm)
                AS BIGINT) AS n_docs_affected
    FROM thr t ORDER BY threshold_ppm
    """,
)
def dedup_threshold_sweep(spark, sf_dir):
    """Dedup yield curve — how many pairs and how many documents a
    Jaccard threshold would touch, swept over 0.5..0.9 in ONE pass of
    the exact pair table (the tuning readout run BEFORE committing a
    threshold to a 100 TB dedup job): per-doc max-similarity reduces
    the pair table once, then each (bounded) threshold is a combinable
    conditional count. Jaccard as integer ppm with floor division —
    the certified sweep is engine-exact."""
    from xorq_spark.functions.dedup import ngram_jaccard_pairs

    docs = widen(t(spark, sf_dir, "documents"))
    pairs = ngram_jaccard_pairs(
        docs, "text", "doc_id", k=3, threshold=0.0, partition_cols=["lang"],
        _ppm=True,
    )
    pj = pairs.select("id_a", "id_b", "j_ppm")
    dmax = (
        pj.select(F.col("id_a").alias("doc_id"), "j_ppm")
        .unionAll(pj.select(F.col("id_b").alias("doc_id"), "j_ppm"))
        .groupBy("doc_id")
        .agg(F.max("j_ppm").cast("long").alias("mj"))
    )
    thr = [500000, 600000, 700000, 800000, 900000]
    pair_counts = pj.agg(
        *[
            F.sum(F.when(F.col("j_ppm") >= v, 1).otherwise(0))
            .cast("long").alias(f"p{v}")
            for v in thr
        ]
    )
    doc_counts = dmax.agg(
        *[
            F.sum(F.when(F.col("mj") >= v, 1).otherwise(0))
            .cast("long").alias(f"d{v}")
            for v in thr
        ]
    )
    rows = ",".join(
        f"struct(CAST({v} AS BIGINT) AS threshold_ppm,"
        f" p{v} AS n_pairs, d{v} AS n_docs_affected)"
        for v in thr
    )
    return (
        pair_counts.crossJoin(doc_counts)
        .select(F.explode(F.expr(f"array({rows})")).alias("__r"))
        .select("__r.threshold_ppm", "__r.n_pairs", "__r.n_docs_affected")
        .orderBy("threshold_ppm")
    )


@query(
    "dedup_lsh_plan",
    oracle="""
    WITH divs AS (
      SELECT CAST(b AS INT) AS bands, CAST(128 // b AS INT) AS rows_per_band
      FROM (SELECT unnest(range(1, 129)) AS b) WHERE 128 % b = 0),
    terms AS (
      SELECT bands, rows_per_band, unnest(range(0, 200)) AS i FROM divs),
    pt AS (
      SELECT bands, rows_per_band,
             CAST(2*i + 1 AS DOUBLE) / 400.0 AS s
      FROM terms),
    q AS (
      SELECT bands, rows_per_band, s,
             CAST(round((1.0 - exp(CAST(bands AS DOUBLE) * ln(1.0 -
                  exp(CAST(rows_per_band AS DOUBLE) * ln(s))))) * 1e9, 0)
               AS BIGINT) AS p
      FROM pt),
    agg AS (
      SELECT bands, rows_per_band,
             COALESCE(sum(CASE WHEN s < 0.8 THEN p END), 0) AS fp,
             COALESCE(sum(CASE WHEN s >= 0.8 THEN 1000000000 - p END), 0) AS fn
      FROM q GROUP BY bands, rows_per_band),
    sc AS (
      SELECT bands, rows_per_band,
             CAST(round(exp(ln(1.0 / CAST(bands AS DOUBLE))
                  / CAST(rows_per_band AS DOUBLE)) * 1e9, 0) AS BIGINT)
               AS threshold_star_e9,
             CAST(fp // 200 AS BIGINT) AS fp_e9,
             CAST(fn // 200 AS BIGINT) AS fn_e9
      FROM agg),
    c AS (SELECT *, CAST(fp_e9 + fn_e9 AS BIGINT) AS cost_e9 FROM sc),
    m AS (SELECT min(cost_e9) AS mc FROM c),
    m2 AS (SELECT min(bands) AS mb FROM c, m WHERE cost_e9 = mc)
    SELECT bands, rows_per_band, threshold_star_e9, fp_e9, fn_e9, cost_e9,
           (cost_e9 = m.mc AND bands = m2.mb) AS is_best
    FROM c, m, m2 ORDER BY bands
    """,
)
def dedup_lsh_plan(spark, sf_dir):
    """MinHash-LSH banding planner (functions/dedup.py
    lsh_banding_plan): for every (bands, rows) factorization of 128
    hashes, the integrated false-positive + false-negative mass of the
    collision curve against a 0.8 Jaccard target, with the argmin
    flagged — the parameter sweep behind dedup_minhash_lsh_pairs done
    exactly instead of by the (1/b)^(1/r) rule of thumb. Bounded
    planning frame (divisors x 200 quadrature points); the corpus
    never participates. The oracle replays the midpoint quadrature
    term-exactly (explicit exp/ln, per-term e9 quantization, integer
    sums and div — the bm25/bootstrap determinism disciplines)."""
    from xorq_spark.functions.dedup import lsh_banding_plan

    return lsh_banding_plan(
        spark, n_hashes=128, threshold_ppm=800_000, steps=200
    ).orderBy("bands")
