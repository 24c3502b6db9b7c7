"""Scale-mechanics operators: bucketed co-located joins (zero-exchange
proof), skew salting (result equivalence), IVF ANN (recall vs exact)."""

from __future__ import annotations

import pandas as pd
import pytest

import pyspark.sql.functions as F

from xorq_spark.operators.bucketing import bucketed_join, exchange_count, write_bucketed
from xorq_spark.operators.skew import salted_join


@pytest.fixture(scope="module")
def warehouse(spark, tmp_path_factory):
    yield spark
    for t in ("b_left", "b_right"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_bucketed_join_has_no_shuffle(warehouse, spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_quantity"
    )
    o = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_totalprice"
    ).withColumnRenamed("o_orderkey", "l_orderkey")
    write_bucketed(li, "b_left", ["l_orderkey"], buckets=8)
    write_bucketed(o, "b_right", ["l_orderkey"], buckets=8)

    joined = bucketed_join(spark, "b_left", "b_right", ["l_orderkey"])
    # co-located: no shuffle exchange in the plan
    assert exchange_count(joined) == 0
    # and correct: same row count as the plain join
    plain = li.join(o, "l_orderkey")
    assert joined.count() == plain.count()


def test_plain_join_does_shuffle(spark, sf_dir):
    """Sanity for exchange_count: the un-bucketed sort-merge join of two
    fact tables has exchanges (broadcast disabled to force SMJ)."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").hint("merge")
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    j = li.join(o, li.l_orderkey == o.o_orderkey)
    assert exchange_count(j) > 0


def test_salted_join_matches_plain(spark):
    left = spark.createDataFrame(
        pd.DataFrame({"k": [1] * 50 + [2] * 3 + [3] * 2, "v": range(55)})
    )
    right = spark.createDataFrame(
        pd.DataFrame({"k": [1, 2, 3, 4], "w": [10.0, 20.0, 30.0, 40.0]})
    )
    plain = left.join(right, "k").agg(
        F.count("*").alias("n"), F.sum("w").alias("s")
    ).collect()[0]
    for hot in (None, [1]):
        salted = salted_join(left, right, "k", factor=4, hot_keys=hot).agg(
            F.count("*").alias("n"), F.sum("w").alias("s")
        ).collect()[0]
        assert (salted.n, salted.s) == (plain.n, plain.s)


def test_salted_left_join_keeps_unmatched(spark):
    left = spark.createDataFrame(pd.DataFrame({"k": [1, 9], "v": [1, 2]}))
    right = spark.createDataFrame(pd.DataFrame({"k": [1], "w": [5.0]}))
    got = salted_join(left, right, "k", factor=3, how="left").toPandas()
    assert len(got) == 2
    assert got[got.k == 9].w.isna().all()


def test_ivf_recall_vs_bruteforce(spark, sf_dir):
    from xorq_spark.functions.similarity import ann_bruteforce_topk, ann_ivf_topk

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    exact = ann_bruteforce_topk(queries, emb, k=5).toPandas()
    approx = ann_ivf_topk(queries, emb, k=5, n_centroids=8, n_probe=4).toPandas()
    # probing half the cells must recover a solid share of true neighbors
    exact_pairs = set(zip(exact.query_id, exact.vec_id))
    approx_pairs = set(zip(approx.query_id, approx.vec_id))
    recall = len(exact_pairs & approx_pairs) / len(exact_pairs)
    assert recall >= 0.5
    # each query's own vector (cos=1) is always found
    assert {(q, q) for q in range(5)} <= approx_pairs


def test_minhash_long_documents(spark):
    """MB-scale documents (100k tokens -> ~100k-element shingle arrays)
    must shingle+sign without either blowing executor memory or falling
    off the JVM path. The HOF pipeline is O(tokens) per row; this guards
    against accidental O(tokens^2) regressions too."""
    import time

    import pyspark.sql.functions as F

    from xorq_spark.functions.dedup import minhash_signature

    words = " ".join(f"w{i % 5000}" for i in range(100_000))
    docs = spark.createDataFrame(
        [(i, words + f" tail{i}") for i in range(8)], "doc_id int, text string"
    )
    t0 = time.time()
    out = docs.select("doc_id", minhash_signature(F.col("text"), 16, 3).alias("sig")).collect()
    elapsed = time.time() - t0
    assert len(out) == 8 and all(len(r.sig) == 16 for r in out)
    assert all(v is not None for r in out for v in r.sig)
    # 8 x 100k-shingle docs; generous bound that still catches quadratic blowup
    assert elapsed < 120, f"minhash on long docs took {elapsed:.0f}s"


def test_connected_components_chain_and_clique(spark):
    """A 6-node chain (diameter 5 — forces multiple star rounds), a
    triangle, and an isolated edge; components = min id of each."""
    from xorq_spark.functions import connected_components

    edges = [(1, 2), (2, 3), (3, 4), (4, 5), (5, 6),  # chain
             (10, 11), (11, 12), (10, 12),            # triangle
             (20, 21)]                                # pair
    df = spark.createDataFrame(pd.DataFrame(edges, columns=["id_a", "id_b"]))
    got = {
        (r.node, r.component)
        for r in connected_components(df, "id_a", "id_b").collect()
        # (this exercises the measured-size union-find fast path;
        # test_properties forces the distributed star path)
    }
    want = {(n, 1) for n in range(1, 7)} | {(n, 10) for n in (10, 11, 12)} | {
        (20, 20), (21, 20)
    }
    assert got == want


def test_connected_components_empty(spark):
    from xorq_spark.functions import connected_components

    df = spark.createDataFrame(pd.DataFrame({"id_a": [], "id_b": []}), "id_a long, id_b long")
    assert connected_components(df).count() == 0


def test_simhash_pairs_match_bruteforce(spark):
    """Banding must find EVERY pair within the hamming budget (pigeonhole
    guarantees recall=1.0 when max_hamming < bands)."""
    from xorq_spark.functions import simhash_neardup_pairs
    from xorq_spark.functions.dedup import simhash, hamming64

    texts = [
        "the quick brown fox jumps over the lazy dog",
        "the quick brown fox jumps over the lazy cat",
        "the quick brown fox leaps over the lazy dog",
        "completely different content about spark clusters",
        "completely different content about spark cluster",
        "",
    ]
    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    )
    got = {
        (r.id_a, r.id_b, r.hamming)
        for r in simhash_neardup_pairs(df, max_hamming=3).collect()
    }
    sh = df.select("doc_id", simhash(F.col("text")).alias("h")).filter(F.col("h") != 0)
    a = sh.select(F.col("doc_id").alias("id_a"), F.col("h").alias("ha"))
    b = sh.select(F.col("doc_id").alias("id_b"), F.col("h").alias("hb"))
    brute = {
        (r.id_a, r.id_b, r.hamming)
        for r in a.join(b, a.id_a < b.id_b)
        .select("id_a", "id_b", hamming64(F.col("ha"), F.col("hb")).alias("hamming"))
        .filter(F.col("hamming") <= 3)
        .collect()
    }
    assert got == brute


def test_token_shards_budget_and_determinism(spark):
    from xorq_spark.functions import assign_token_shards

    docs = pd.DataFrame(
        {
            "doc_id": range(20),
            "lang": ["en", "es"] * 10,
            "text": ["word " * (30 * (i % 5 + 1)) for i in range(20)],
        }
    )
    df = spark.createDataFrame(docs)
    out = assign_token_shards(df, tokens_per_shard=200).orderBy("doc_id")
    rows = out.collect()
    # shard ids are per-language contiguous, starting at 0
    for lang in ("en", "es"):
        shards = [r.shard_id for r in rows if r.lang == lang]
        assert shards[0] == 0
        assert all(b - a in (0, 1) for a, b in zip(shards, shards[1:]))
    # a doc is assigned to the shard where it STARTS: tokens before it
    # within its shard are < budget
    seen: dict = {}
    for r in rows:
        key = (r.lang, r.shard_id)
        assert seen.get(key, 0) < 200
        seen[key] = seen.get(key, 0) + r.n_tokens
    # deterministic across reruns
    assert rows == out.collect()


def test_exact_bpe_counter_gated(spark):
    """bpe_token_count_exact requires tiktoken; where the wheel is
    absent it must fail loudly at definition (never silently
    approximate), and assign_token_shards must accept a custom counter."""
    import pyspark.sql.functions as F
    import pytest

    from xorq_spark import functions as fn

    try:
        import tiktoken  # noqa: F401

        have = True
    except ImportError:
        have = False

    df = spark.createDataFrame(
        [(1, "hello world", "en"), (2, "the quick brown fox", "en")],
        "doc_id long, text string, lang string",
    )
    if have:
        out = df.select(fn.bpe_token_count_exact(F.col("text")).alias("n"))
        assert out.first()["n"] > 0
    else:
        with pytest.raises(ImportError):
            fn.bpe_token_count_exact(F.col("text"))

    # custom counter path (JVM-side stand-in) through shard packing
    sharded = fn.assign_token_shards(
        df, tokens_per_shard=3, counter=lambda c: F.length(c)
    )
    rows = {r["doc_id"]: r["n_tokens"] for r in sharded.collect()}
    assert rows[1] == len("hello world")


def test_redact_pii_and_repetition_edges(spark):
    import pyspark.sql.functions as F

    from xorq_spark.functions import pii_count, redact_pii, repetition_ratio

    df = spark.createDataFrame(
        [
            (1, "mail a.b+c@x-y.co now, call +1 (555) 123-4567, ip 192.168.0.1"),
            (2, "no pii here"),
            (3, None),
            (4, "a\na\na"),
            (5, ""),
        ],
        "id long, text string",
    )
    out = {
        r["id"]: (r["red"], r["ne"], r["rr"])
        for r in df.select(
            "id",
            redact_pii(F.col("text")).alias("red"),
            pii_count(F.col("text"), "email").alias("ne"),
            repetition_ratio(F.col("text")).alias("rr"),
        ).collect()
    }
    assert out[1][0] == "mail [PII] now, call [PII], ip [PII]"
    assert out[1][1] == 1
    assert out[2][0] == "no pii here" and out[2][1] == 0
    assert out[3][0] is None  # null in, null out
    assert out[4][2] == pytest.approx(2 / 3)  # 3 lines, 1 distinct
    assert out[5][2] == 0.0


def test_ann_topk_strategy_dispatch(spark, sf_dir):
    """ann_topk auto-dispatches: small query sets broadcast brute-force
    (exact), large ones take the LSH bucket path; the size probe is
    LIMIT-bounded, never a full count."""
    from xorq_spark.functions import ann_bruteforce_topk, ann_topk

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.limit(3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    auto = ann_topk(queries, emb, k=5, max_broadcast_queries=10)
    exact = ann_bruteforce_topk(queries, emb, k=5)
    assert sorted(map(tuple, auto.collect())) == sorted(map(tuple, exact.collect()))

    # force the big-queries path: must still return k rows per query
    lsh = ann_topk(queries, emb, k=5, max_broadcast_queries=1)
    got = lsh.groupBy("query_id").count().collect()
    assert all(r["count"] <= 5 for r in got) and got

    import pytest

    with pytest.raises(ValueError):
        ann_topk(queries, emb, strategy="annoy")


def test_quantize_embedding_roundtrip(spark):
    from xorq_spark.functions.similarity import (
        dequantize_embedding,
        quantization_error,
        quantize_embedding,
    )

    df = spark.createDataFrame(
        [(1, [1.0, -0.5, 0.25]), (2, [0.0, 0.0, 0.0]), (3, [127.0, -127.0, 63.5])],
        "id int, emb array<double>",
    )
    got = (
        df.select("id", "emb", quantize_embedding(F.col("emb")).alias("qs"))
        .select(
            "id",
            F.col("qs.scale").alias("scale"),
            F.col("qs.q").alias("q"),
            quantization_error(F.col("emb"), F.col("qs.q"), F.col("qs.scale")).alias("err"),
            dequantize_embedding(F.col("qs.q"), F.col("qs.scale")).alias("deq"),
        )
        .collect()
    )
    rows = {r.id: r for r in got}
    # max|x|=1.0 -> scale=1/127; codes are floor(x*127 + 0.5)
    assert rows[1].q == [127, -63, 32]
    # all-zero vector: scale 0, all-zero codes (guarded division)
    assert rows[2].scale == 0.0 and rows[2].q == [0, 0, 0] and rows[2].err == 0.0
    assert rows[3].q == [127, -127, 64]
    for r in got:
        # symmetric quantization error is bounded by scale/2 per coordinate
        assert r.err <= r.scale / 2 + 1e-12
        assert len(r.deq) == 3


def test_chunk_documents_semantics(spark):
    from xorq_spark.functions import chunk_documents

    df = spark.createDataFrame(
        [
            (1, " ".join(f"t{i}" for i in range(10))),  # 10 tokens
            (2, "one two"),                              # < chunk size
            (3, "   "),                                  # whitespace only
            (4, None),                                   # null text
        ],
        "doc_id int, text string",
    )
    out = chunk_documents(df, chunk_tokens=4, overlap_tokens=1).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    # stride 3: chunks at tokens [0:4),[3:7),[6:10) -> 3 chunks
    assert [r.chunk_id for r in by_doc[1]] == [0, 1, 2]
    assert by_doc[1][0].chunk_text == "t0 t1 t2 t3"
    assert by_doc[1][1].chunk_text == "t3 t4 t5 t6"
    assert by_doc[1][2].chunk_text == "t6 t7 t8 t9"
    # overlap: last token of chunk k = first of chunk k+1
    assert by_doc[2][0].chunk_text == "one two" and len(by_doc[2]) == 1
    assert 3 not in by_doc and 4 not in by_doc  # empty docs yield no chunks

    with pytest.raises(ValueError, match="overlap_tokens"):
        chunk_documents(df, chunk_tokens=4, overlap_tokens=4)


def test_stratified_sample_determinism_and_nesting(spark):
    from xorq_spark.functions import stratified_sample

    df = spark.createDataFrame(
        [(i, "en" if i % 2 == 0 else "de") for i in range(2000)],
        "id long, lang string",
    )
    small = stratified_sample(df, "lang", {"en": 0.1}, ["id"], default_fraction=0.5)
    big = stratified_sample(df, "lang", {"en": 0.4}, ["id"], default_fraction=0.5)
    s_ids = {r.id for r in small.collect()}
    b_ids = {r.id for r in big.collect()}
    # nested: every row of the 10% en sample is in the 40% en sample
    assert s_ids <= b_ids
    # determinism: rerun gives the identical set
    again = {r.id for r in stratified_sample(df, "lang", {"en": 0.1}, ["id"], default_fraction=0.5).collect()}
    assert again == s_ids
    # rates are approximately honored per stratum
    en_n = sum(1 for r in small.collect() if r.lang == "en")
    de_n = sum(1 for r in small.collect() if r.lang == "de")
    assert 50 <= en_n <= 150      # ~10% of 1000
    assert 400 <= de_n <= 600     # ~50% of 1000

    with pytest.raises(ValueError, match="fraction"):
        stratified_sample(df, "lang", {"en": 1.5}, ["id"])


def test_cap_per_group(spark):
    from xorq_spark.functions import cap_per_group

    df = spark.createDataFrame(
        [(i, "big" if i < 90 else "small") for i in range(100)],
        "id long, src string",
    )
    capped = cap_per_group(df, "src", 10, ["id"])
    got = capped.groupBy("src").count().collect()
    counts = {r.src: r["count"] for r in got}
    assert counts == {"big": 10, "small": 10}
    # deterministic: same keep-set on rerun
    ids1 = sorted(r.id for r in capped.collect())
    ids2 = sorted(r.id for r in cap_per_group(df, "src", 10, ["id"]).collect())
    assert ids1 == ids2
    # keep='first' takes the lowest ids
    first = cap_per_group(df, "src", 2, ["id"], keep="first")
    assert sorted(r.id for r in first.filter("src = 'big'").collect()) == [0, 1]
    with pytest.raises(ValueError, match="keep"):
        cap_per_group(df, "src", 1, ["id"], keep="random")


def test_resample_fill_policies(spark):
    from xorq_spark.functions.timeseries import resample

    df = spark.createDataFrame(
        [("a", "2024-01-01 00:00:10", 1.0),
         ("a", "2024-01-01 00:00:50", 2.0),
         ("a", "2024-01-01 00:03:30", 7.0),   # 2-minute gap before this
         ("b", "2024-01-01 00:01:05", 5.0)],
        "k string, ts string, v double",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    out = resample(
        df, "ts", step_seconds=60, key_cols=["k"],
        aggs={"n": F.count(F.lit(1)), "s": F.sum("v")},
        fill={"n": "zero", "s": "ffill"},
    ).orderBy("k", "bucket").collect()
    a = [r for r in out if r.k == "a"]
    # dense grid: minutes 0..3 for key a, single bucket for key b
    assert len(a) == 4 and len(out) == 5
    assert [r.n for r in a] == [2, 0, 0, 1]          # counts zero-filled
    assert [r.s for r in a] == [3.0, 3.0, 3.0, 7.0]  # sums carried forward

    with pytest.raises(ValueError, match="not agg columns"):
        resample(df, "ts", 60, ["k"], {"n": F.count(F.lit(1))}, fill={"x": "zero"})
    with pytest.raises(ValueError, match="none|ffill|zero"):
        resample(df, "ts", 60, ["k"], {"n": F.count(F.lit(1))}, fill="bfill")


def test_resample_bucket_guard(spark):
    from xorq_spark.functions.timeseries import resample

    df = spark.createDataFrame(
        [("a", "2024-01-01 00:00:00"), ("a", "2024-03-01 00:00:00")],
        "k string, ts string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    with pytest.raises(ValueError, match="buckets"):
        resample(df, "ts", 1, ["k"], max_buckets_per_key=1000)


def test_funnel_semantics(spark):
    from xorq_spark.functions.timeseries import funnel

    rows = [
        # u1 completes A->B->C in order
        (1, "A", "2024-01-01 00:00:00"), (1, "B", "2024-01-01 01:00:00"),
        (1, "C", "2024-01-01 02:00:00"),
        # u2 has B BEFORE A: that B must not count; no B after A -> stops at A
        (2, "B", "2024-01-01 00:00:00"), (2, "A", "2024-01-01 01:00:00"),
        # u3 completes but outside the conversion window
        (3, "A", "2024-01-01 00:00:00"), (3, "B", "2024-01-03 00:00:00"),
        # u4 never does A -> absent from the funnel
        (4, "C", "2024-01-01 00:00:00"),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, event_type string, ts string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    out = {r.user_id: r for r in funnel(
        df, ["A", "B", "C"], within_seconds=86400
    ).collect()}
    assert set(out) == {1, 2, 3}
    assert out[1].t1 is not None and out[1].t2 is not None
    assert out[2].t1 is None and out[2].t2 is None
    assert out[3].t1 is None  # B landed after the 1-day window
    with pytest.raises(ValueError, match="at least 2"):
        funnel(df, ["A"])


def test_retention_matrix(spark):
    from xorq_spark.functions.timeseries import retention

    rows = [
        (1, "2024-01-01"), (1, "2024-01-08"), (1, "2024-01-22"),  # w0, w1, w3
        (2, "2024-01-01"),                                          # w0 only
        (3, "2024-01-08"), (3, "2024-01-15"),                      # later cohort
    ]
    df = spark.createDataFrame(rows, "user_id long, ts string").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    out = {
        (r.cohort, r.period_index): r.n_users
        for r in retention(df, period_seconds=7 * 86400).collect()
    }
    cohorts = sorted({c for c, _ in out})
    c0, c1 = cohorts[0], cohorts[1]
    assert out[(c0, 0)] == 2          # users 1 and 2 in the first cohort
    assert out[(c0, 1)] == 1          # only user 1 returned in week 1
    assert out[(c0, 3)] == 1          # and again in week 3
    assert (c0, 2) not in out         # nobody active in week 2
    assert out[(c1, 0)] == 1 and out[(c1, 1)] == 1  # user 3's cohort


def test_temperature_sample_rebalances(spark):
    from xorq_spark.functions.sampling import temperature_sample

    df = spark.createDataFrame(
        [(i, "big" if i < 900 else "small") for i in range(1000)],
        "doc_id long, src string",
    )
    # alpha=0: expected counts equalize (small keeps all 100, big keeps ~100)
    eq = temperature_sample(df, "src", alpha=0.0).groupBy("src").count().collect()
    c = {r.src: r["count"] for r in eq}
    assert c["small"] == 100            # the largest fraction (1.0) hits the tail stratum
    assert 60 <= c["big"] <= 140        # ~100 of 900 via hash filter
    # alpha=1: natural proportions (everything kept at max_fraction=1)
    nat = temperature_sample(df, "src", alpha=1.0).count()
    assert nat == 1000
    # deterministic across reruns
    a = {r.doc_id for r in temperature_sample(df, "src", alpha=0.3).collect()}
    b = {r.doc_id for r in temperature_sample(df, "src", alpha=0.3).collect()}
    assert a == b
    with pytest.raises(ValueError, match="alpha"):
        temperature_sample(df, "src", alpha=2.0)


def test_char_entropy(spark):
    import math

    from xorq_spark.functions import char_entropy

    df = spark.createDataFrame(
        [(1, "aaaa"), (2, "abab"), (3, ""), (4, None), (5, "abcd")],
        "id int, t string",
    )
    got = {r.id: r.e for r in df.select("id", char_entropy(F.col("t")).alias("e")).collect()}
    assert got[1] == 0.0                        # single symbol: zero entropy
    assert got[2] == pytest.approx(math.log(2)) # two equiprobable symbols
    assert got[3] == 0.0 and got[4] == 0.0      # empty/null
    assert got[5] == pytest.approx(math.log(4)) # four equiprobable symbols


class TestCountMinSketch:
    def test_estimates_overestimate_and_bound(self, spark):
        """CMS invariants on a skewed stream: every estimate >= truth;
        with width >> distinct keys estimates are exact."""
        import pyspark.sql.functions as F

        from xorq_spark.functions.sketches import (
            count_min_build,
            count_min_estimate,
        )

        df = spark.range(3000).select((F.col("id") % 30).alias("k"))
        # wide sketch: effectively collision-free -> exact counts
        sk = count_min_build(df, "k", depth=4, width=4096)
        est = {
            r["k"]: r["cms_est"]
            for r in count_min_estimate(
                sk, df.select("k").distinct(), "k", depth=4, width=4096
            ).collect()
        }
        assert all(v == 100 for v in est.values())
        # narrow sketch: collisions -> still never underestimates
        sk2 = count_min_build(df, "k", depth=4, width=8)
        est2 = count_min_estimate(
            sk2, df.select("k").distinct(), "k", depth=4, width=8
        )
        assert all(r["cms_est"] >= 100 for r in est2.collect())

    def test_merge_is_exact(self, spark):
        import pyspark.sql.functions as F

        from xorq_spark.functions.sketches import (
            count_min_build,
            count_min_estimate,
            count_min_merge,
        )

        df = spark.range(1000).select((F.col("id") % 17).alias("k"))
        whole = count_min_build(df, "k", depth=3, width=32)
        parts = [
            count_min_build(df.where(F.col("k") % 2 == i), "k", depth=3, width=32)
            for i in (0, 1)
        ]
        merged = count_min_merge(*parts)
        a = sorted(tuple(r) for r in whole.collect())
        b = sorted(tuple(r) for r in merged.collect())
        assert a == b
        keys = df.select("k").distinct()
        ea = {r["k"]: r["cms_est"] for r in count_min_estimate(whole, keys, "k", 3, 32).collect()}
        eb = {r["k"]: r["cms_est"] for r in count_min_estimate(merged, keys, "k", 3, 32).collect()}
        assert ea == eb

    def test_sketch_size_bounded_by_depth_width(self, spark):
        import pyspark.sql.functions as F

        from xorq_spark.functions.sketches import count_min_build

        df = spark.range(20000).select((F.col("id") % 999).alias("k"))
        sk = count_min_build(df, "k", depth=4, width=64)
        assert sk.count() <= 4 * 64


class TestWeightedSample:
    def test_weight_bias_and_determinism(self, spark):
        """A-ES property: across many strata, heavy items are selected
        far more often than light ones; reruns select identically."""
        import pyspark.sql.functions as F

        from xorq_spark.functions.sampling import weighted_sample

        # 50 strata x 20 items; the FIRST item of each stratum carries
        # 100x weight (id // 20 = stratum, id % 20 = position)
        df = spark.range(1000).select(
            (F.col("id") / 20).cast("long").alias("g"),
            F.col("id").alias("doc_id"),
            F.when(F.col("id") % 20 == 0, 1000.0).otherwise(10.0).alias("w"),
        )
        out = weighted_sample(df, k=3, weight_col="w", unique_key="doc_id", strata=("g",))
        rows = out.collect()
        assert len(rows) == 150  # 3 per stratum
        heavy_selected = sum(1 for r in rows if r["doc_id"] % 20 == 0)
        # each stratum has exactly one heavy item; with 100x weight it
        # should be picked in the vast majority of strata
        assert heavy_selected >= 40
        rows2 = weighted_sample(
            df, k=3, weight_col="w", unique_key="doc_id", strata=("g",)
        ).collect()
        assert sorted(r["doc_id"] for r in rows) == sorted(r["doc_id"] for r in rows2)

    def test_nonpositive_weights_excluded(self, spark):
        import pyspark.sql.functions as F

        from xorq_spark.functions.sampling import weighted_sample

        df = spark.createDataFrame(
            [(1, 5.0), (2, 0.0), (3, -1.0), (4, None)],
            "doc_id long, w double",
        )
        out = weighted_sample(df, k=10, weight_col="w", unique_key="doc_id")
        assert [r["doc_id"] for r in out.collect()] == [1]


class TestBloomFilter:
    def test_no_false_negatives_some_false_positives(self, spark):
        import pyspark.sql.functions as F

        from xorq_spark.functions.sketches import bloom_build, bloom_probe

        members = spark.range(50).select(F.col("id").alias("k"))
        bf = bloom_build(members, "k", k=3, m=128)
        probes = spark.range(1000).select(F.col("id").alias("k"))
        # probe returns the key re-cast to string (the sketch key
        # domain), same contract as count_min_estimate
        out = {int(r["k"]): r["maybe_present"] for r in bloom_probe(bf, probes, "k", k=3, m=128).collect()}
        # every member answers yes
        assert all(out[i] for i in range(50))
        # tiny m over 950 non-members must produce some false positives
        fps = sum(1 for i in range(50, 1000) if out[i])
        assert 0 < fps < 950

    def test_merge_equals_direct(self, spark):
        import pyspark.sql.functions as F

        from xorq_spark.functions.sketches import (
            bloom_build,
            bloom_merge,
            bloom_probe,
        )

        df = spark.range(200).select(F.col("id").alias("k"))
        whole = bloom_build(df, "k", k=4, m=512)
        merged = bloom_merge(
            bloom_build(df.where(F.col("k") % 2 == 0), "k", k=4, m=512),
            bloom_build(df.where(F.col("k") % 2 == 1), "k", k=4, m=512),
        )
        assert sorted(r["bit"] for r in whole.collect()) == sorted(
            r["bit"] for r in merged.collect()
        )

    def test_size_bounded_and_nulls_excluded(self, spark):
        import pyspark.sql.functions as F

        from xorq_spark.functions.sketches import bloom_build, bloom_probe

        df = spark.createDataFrame(
            [(1,), (2,), (None,)], "k int"
        )
        bf = bloom_build(df, "k", k=8, m=16)
        assert bf.count() <= 16
        out = bloom_probe(bf, df, "k", k=8, m=16)
        assert out.where(F.col("k").isNull()).count() == 0


class TestCorpusReport:
    def test_hand_built_corpus(self, spark):
        import math

        from xorq_spark.functions import corpus_report

        rows = [
            (1, "a b c", "en", "web"),
            (2, "a b c", "en", "web"),      # exact dup of 1
            (3, "d e f g", "fr", "web"),
            (4, "h i", "en", "book"),
        ]
        df = spark.createDataFrame(
            rows, "doc_id long, text string, lang string, source string"
        )
        out = {r["source"]: r for r in corpus_report(df).collect()}
        web = out["web"]
        assert web["n_docs"] == 3 and web["total_tokens"] == 10
        # two of three docs participate in an exact-dup group
        assert web["dup_rate"] == pytest.approx(round(2 / 3, 9))
        assert web["n_langs"] == 2 and web["top_lang"] == "en"
        p = [2 / 3, 1 / 3]
        exp_ent = round(
            sum(round(-x * math.log(x) * 1e9) for x in p) / 1e9, 9
        )
        assert web["lang_entropy"] == pytest.approx(exp_ent, abs=1e-9)
        book = out["book"]
        assert book["n_docs"] == 1 and book["dup_rate"] == 0.0
        assert book["lang_entropy"] == 0.0
        assert book["p50_chars"] == 3.0


class TestUrlNormalize:
    def test_rules(self, spark):
        import pyspark.sql.functions as F

        from xorq_spark.functions.text import url_normalize

        cases = [
            # case folding + www + default port + tracking + sort + frag
            ("HTTPS://WWW.News.Example.com:443/a/1?utm_source=x&b=2&a=1#f",
             "https://news.example.com/a/1?a=1&b=2"),
            ("https://news.example.com/a/1?a=1&b=2",
             "https://news.example.com/a/1?a=1&b=2"),
            ("HTTP://HOST.COM:80/b", "http://host.com/b"),
            ("http://www.host.com/b/", "http://host.com/b"),
            # non-default port kept; https :80 kept
            ("https://host.com:80/x", "https://host.com:80/x"),
            ("http://host.com:8080/x", "http://host.com:8080/x"),
            # tracking-only query drops the '?' entirely
            ("https://h.com/x?gclid=1", "https://h.com/x"),
            # bare host, trailing slash off
            ("https://h.com/", "https://h.com"),
            # no scheme: passthrough (trimmed)
            ("  not a url  ", "not a url"),
            (None, ""),
        ]
        df = spark.createDataFrame(
            [(i, u) for i, (u, _) in enumerate(cases)], "i int, u string"
        )
        got = {
            r["i"]: r["n"]
            for r in df.select("i", url_normalize(F.col("u")).alias("n")).collect()
        }
        for i, (_, want) in enumerate(cases):
            assert got[i] == want, (i, got[i], want)


class TestHtmlToText:
    def test_extraction_rules(self, spark):
        import pyspark.sql.functions as F

        from xorq_spark.functions.text import html_to_text

        cases = [
            ("<p>hello <b>world</b></p>", "hello world"),
            # script/style payloads must NOT leak
            ("<script>var a = 'SECRET';</script><p>ok</p>", "ok"),
            ("<style>p{color:red}</style>visible", "visible"),
            ("<!-- SECRET -->shown", "shown"),
            # block tags become line breaks, inline tags spaces
            ("<p>one</p><p>two</p>", "one\ntwo"),
            ("a<br>b", "a\nb"),
            ("<ul><li>x</li><li>y</li></ul>", "x\ny"),
            # entities
            ("a &amp; b &lt;c&gt; &quot;d&quot; &#39;e&#39;&nbsp;f",
             "a & b <c> \"d\" 'e' f"),
            # whitespace collapse
            ("  lots    of\t\tspace  ", "lots of space"),
            # multiline script with operators that look like tags
            ("<script>\nif (x < 2 && y > 1) {}\n</script>after", "after"),
            (None, ""),
        ]
        df = spark.createDataFrame(
            [(i, h) for i, (h, _) in enumerate(cases)], "i int, h string"
        )
        got = {
            r["i"]: r["t"]
            for r in df.select("i", html_to_text(F.col("h")).alias("t")).collect()
        }
        for i, (_, want) in enumerate(cases):
            assert got[i] == want, (i, repr(got[i]), repr(want))


class TestHdrQuantileSketch:
    def _vals(self, spark, xs):
        return spark.createDataFrame([(int(x),) for x in xs], "v long")

    def test_counts_and_bounds_contain_values(self, spark):
        from xorq_spark.functions.sketches import hdr_build, hdr_bounds

        import random

        rng = random.Random(11)
        xs = (
            [rng.randint(-10**6, 10**6) for _ in range(500)]
            + [0, 1, -1, 15, 16, 17, 2**40, -(2**40)]
        )
        sk = hdr_build(self._vals(spark, xs), "v")
        rows = hdr_bounds(sk).collect()
        # total mass preserved
        assert sum(r["c"] for r in rows) == len(xs)
        # structural relative-error bound on every positive bucket
        for r in rows:
            if r["lo_int"] > 0:
                assert (r["hi_int"] - r["lo_int"] + 1) <= max(
                    r["lo_int"] >> 4, 1
                )
            assert r["lo_int"] <= r["hi_int"]
        # every value falls in exactly one bucket
        ivs = sorted((r["lo_int"], r["hi_int"]) for r in rows)
        for a, b in zip(ivs, ivs[1:]):
            assert a[1] < b[0]
        for x in xs:
            assert any(lo <= x <= hi for lo, hi in ivs)

    def test_merge_equals_direct(self, spark):
        from xorq_spark.functions.sketches import hdr_build, hdr_merge

        import random

        rng = random.Random(5)
        xs = [rng.randint(0, 10**9) for _ in range(400)]
        df = spark.createDataFrame(
            [(i, x) for i, x in enumerate(xs)], "i long, v long"
        )
        whole = hdr_build(df, "v")
        parts = [
            hdr_build(df.where(F.col("i") % 3 == s), "v") for s in range(3)
        ]
        merged = hdr_merge(*parts)
        a = {(r["sign"], r["e"], r["sub"]): r["c"] for r in whole.collect()}
        b = {(r["sign"], r["e"], r["sub"]): r["c"] for r in merged.collect()}
        assert a == b

    def test_build_from_counts_equals_build(self, spark):
        # pre-aggregated (value, count) bucketization must reproduce
        # the raw-row build counter-for-counter, incl. shard keys
        from xorq_spark.functions.sketches import (
            hdr_build,
            hdr_build_from_counts,
        )

        import random

        rng = random.Random(11)
        xs = [rng.randint(-10**6, 10**6) for _ in range(500)] + [0, 0]
        df = spark.createDataFrame(
            [(i, x) for i, x in enumerate(xs)], "i long, v long"
        )
        direct = hdr_build(df, "v")
        vc = df.groupBy("v", (F.col("i") % 4).alias("sh")).count()
        from_counts = (
            hdr_build_from_counts(vc, "v", "count", by=("sh",))
            .groupBy("sign", "e", "sub")
            .agg(F.sum("c").alias("c"))
        )
        a = {(r["sign"], r["e"], r["sub"]): r["c"] for r in direct.collect()}
        b = {
            (r["sign"], r["e"], r["sub"]): r["c"]
            for r in from_counts.collect()
        }
        assert a == b

    def test_quantiles_bracket_exact(self, spark):
        from xorq_spark.functions.sketches import hdr_build, hdr_quantiles

        import random

        rng = random.Random(3)
        xs = sorted(int(rng.lognormvariate(10, 2)) for _ in range(2000))
        sk = hdr_build(self._vals(spark, xs), "v")
        qs = [("p50", 1, 2), ("p90", 9, 10), ("p99", 99, 100)]
        out = {r["q"]: (r["est_lo"], r["est_hi"]) for r in
               hdr_quantiles(sk, qs).collect()}
        n = len(xs)
        for label, num, den in qs:
            need = -(-num * n // den)  # ceil
            exact = xs[need - 1]  # type-1 quantile
            lo, hi = out[label]
            assert lo <= exact <= hi
            # 1/16 relative error on the bucket
            assert (hi - lo + 1) <= max(lo >> 4, 1)

    def test_sketch_size_bounded(self, spark):
        from xorq_spark.functions.sketches import hdr_build

        df = spark.range(0, 200_000).select(
            (F.col("id") * 7919 % 1_000_003).alias("v")
        )
        assert hdr_build(df, "v").count() <= 16 * 63 + 20

    def test_signs_and_zero(self, spark):
        from xorq_spark.functions.sketches import hdr_build, hdr_quantiles

        xs = list(range(-100, 101))  # symmetric incl. zero
        sk = hdr_build(self._vals(spark, xs), "v")
        out = {r["q"]: (r["est_lo"], r["est_hi"]) for r in
               hdr_quantiles(sk, [("p50", 1, 2)]).collect()}
        lo, hi = out["p50"]
        assert lo <= 0 <= hi


class TestBM25:
    def _docs(self, spark, texts):
        return spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
        )

    @staticmethod
    def _ref_bm25(texts, query_terms, topk=5):
        """Python replay of the integer BM25 contract."""
        import math

        toks = [t.lower().split() for t in texts]
        N = len(toks)
        T = sum(len(t) for t in toks)
        df = {}
        for t in toks:
            for w in set(t):
                df[w] = df.get(w, 0) + 1
        scores = {}
        for qid, terms in query_terms.items():
            for d, t in enumerate(toks):
                s = 0
                for w in terms:
                    tf = t.count(w)
                    if tf == 0:
                        continue
                    idf_nano = round(
                        math.log((2 * N + 2) / (2 * df.get(w, 0) + 1)) * 1e9
                    )
                    s += (idf_nano * 44 * T * tf) // (
                        20 * T * tf + 6 * T + 18 * len(t) * N
                    )
                if s != 0:
                    scores[(qid, d)] = s
        out = {}
        for qid in query_terms:
            ranked = sorted(
                ((d, s) for (q, d), s in scores.items() if q == qid),
                key=lambda kv: (-kv[1], kv[0]),
            )[:topk]
            out[qid] = [(d, s, r + 1) for r, (d, s) in enumerate(ranked)]
        return out

    def test_matches_python_reference(self, spark):
        from xorq_spark.functions.retrieval import bm25_topk

        texts = [
            "the cat sat on the mat",
            "the dog chased the cat",
            "quantum computing is the future of computing",
            "the mat was red",
            "dog dog dog",
        ]
        qts = {1: ["cat", "mat"], 2: ["dog"], 3: ["computing", "future"]}
        qdf = spark.createDataFrame(
            [(q, w) for q, ws in qts.items() for w in ws],
            "query_id int, term string",
        )
        got = {}
        for r in bm25_topk(self._docs(spark, texts), qdf, topk=5).collect():
            got.setdefault(r["query_id"], []).append(
                (r["doc_id"], r["score_nano"], r["rank"])
            )
        ref = self._ref_bm25(texts, qts)
        for q in qts:
            assert sorted(got.get(q, [])) == sorted(ref[q]), q

    def test_rare_term_outranks_common(self, spark):
        from xorq_spark.functions.retrieval import bm25_topk

        texts = ["alpha beta", "alpha beta", "alpha zeta", "alpha beta"]
        qdf = spark.createDataFrame(
            [(1, "zeta"), (1, "alpha")], "query_id int, term string"
        )
        rows = bm25_topk(self._docs(spark, texts), qdf, topk=4).collect()
        top = min(rows, key=lambda r: r["rank"])
        assert top["doc_id"] == 2  # the only zeta doc wins on idf

    def test_derived_queries_deterministic(self, spark):
        from xorq_spark.functions.retrieval import derive_query_terms

        texts = ["a b c d", "a b c", "a b", "a"]
        d = self._docs(spark, texts)
        one = sorted(map(tuple, derive_query_terms(d, n_queries=2, terms_per_query=2).collect()))
        two = sorted(map(tuple, derive_query_terms(d, n_queries=2, terms_per_query=2).collect()))
        assert one == two
        # df order: a(4) b(3) c(2) d(1) -> q1={a,b}, q2={c,d}
        assert one == [(1, "a"), (1, "b"), (2, "c"), (2, "d")]


    def test_shared_postings_match_per_call(self, spark):
        # passing one build_postings() result to derivation + both
        # scorers must reproduce the per-call (re-tokenizing) results
        from xorq_spark.functions.retrieval import (
            bm25_topk,
            build_postings,
            derive_query_terms,
            tfidf_rank_topk,
        )

        texts = [
            "the cat sat on the mat",
            "the dog chased the cat",
            "quantum computing is the future of computing",
            "the mat was red",
            "dog dog dog",
        ]
        d = self._docs(spark, texts)
        postings = build_postings(d)
        qt_a = derive_query_terms(d, n_queries=2, terms_per_query=2)
        qt_b = derive_query_terms(
            d, n_queries=2, terms_per_query=2, postings=postings
        )
        assert sorted(map(tuple, qt_a.collect())) == sorted(
            map(tuple, qt_b.collect())
        )
        for fn in (bm25_topk, tfidf_rank_topk):
            a = fn(d, qt_a, topk=5).collect()
            b = fn(d, qt_a, topk=5, postings=postings).collect()
            assert sorted(map(tuple, a)) == sorted(map(tuple, b))


class TestLabelPropagation:
    @staticmethod
    def _ref_lpa(edges, iterations):
        """Python replay: synchronous, most-frequent neighbor label,
        ties to smallest label."""
        from collections import Counter

        und = set()
        for a, b in edges:
            if a != b:
                und.add((a, b))
                und.add((b, a))
        nodes = sorted({x for e in und for x in e})
        nbrs = {n: [] for n in nodes}
        for a, b in und:
            nbrs[a].append(b)
        lab = {n: n for n in nodes}
        for _ in range(iterations):
            new = {}
            for n in nodes:
                c = Counter(lab[m] for m in nbrs[n])
                new[n] = min(c, key=lambda l: (-c[l], l)) if c else n
            lab = new
        return lab

    def _run(self, spark, edges, iterations):
        from xorq_spark.functions.graph import label_propagation

        df = spark.createDataFrame(edges, "src long, dst long")
        return {
            r["node"]: r["community"]
            for r in label_propagation(df, iterations=iterations).collect()
        }

    def test_two_triangles_with_bridge(self, spark):
        edges = [(1, 2), (2, 3), (1, 3), (4, 5), (5, 6), (4, 6), (3, 4)]
        for it in (1, 2, 3):
            assert self._run(spark, edges, it) == self._ref_lpa(edges, it)

    def test_random_graph_matches_reference(self, spark):
        import random

        rng = random.Random(23)
        edges = [
            (rng.randint(0, 30), rng.randint(0, 30)) for _ in range(120)
        ]
        assert self._run(spark, edges, 2) == self._ref_lpa(edges, 2)

    def test_dense_community_outvotes_bridge(self, spark):
        # K4 on {1..4} + pendant chain 4-10-11: the K4 keeps its own
        # label mass; this is NOT connected components (which would
        # collapse everything to one label).
        edges = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4),
                 (4, 10), (10, 11)]
        out = self._run(spark, edges, 2)
        assert out == self._ref_lpa(edges, 2)
        assert len(set(out.values())) > 1


class TestRRFFusion:
    def test_fusion_matches_reference(self, spark):
        from xorq_spark.functions.retrieval import rrf_fuse

        r1 = spark.createDataFrame(
            [(1, 10, 1), (1, 11, 2), (1, 12, 3)],
            "query_id int, doc_id long, rank int",
        )
        r2 = spark.createDataFrame(
            [(1, 12, 1), (1, 10, 2), (1, 13, 3)],
            "query_id int, doc_id long, rank int",
        )
        out = {
            r["doc_id"]: (r["rrf_nano"], r["rank"])
            for r in rrf_fuse(r1, r2, k=60, topk=10).collect()
        }
        c = lambda rk: 10**9 // (60 + rk)
        expect = {
            10: c(1) + c(2),
            12: c(3) + c(1),
            11: c(2),
            13: c(3),
        }
        assert {d: s for d, (s, _) in out.items()} == expect
        # ranking: doc 10 (32255735) > doc 12 (32259127)? compute order
        ordered = sorted(expect.items(), key=lambda kv: (-kv[1], kv[0]))
        assert [d for d, _ in ordered] == [
            d for d, (_, rk) in sorted(out.items(), key=lambda kv: kv[1][1])
        ]

    def test_tie_breaks_on_doc_id(self, spark):
        from xorq_spark.functions.retrieval import rrf_fuse

        r1 = spark.createDataFrame(
            [(1, 20, 1), (1, 21, 2)], "query_id int, doc_id long, rank int"
        )
        r2 = spark.createDataFrame(
            [(1, 21, 1), (1, 20, 2)], "query_id int, doc_id long, rank int"
        )
        rows = sorted(
            (r["rank"], r["doc_id"])
            for r in rrf_fuse(r1, r2, k=60, topk=10).collect()
        )
        # symmetric scores -> tie -> smaller doc_id first
        assert rows == [(1, 20), (2, 21)]


class TestWinsorize:
    def test_matches_numpy_type1(self, spark):
        import random

        from xorq_spark.functions.timeseries import winsorize

        rng = random.Random(9)
        vals = [round(rng.uniform(-50, 50), 3) for _ in range(500)]
        df = spark.createDataFrame(
            [(i, "g", v) for i, v in enumerate(vals)],
            "event_id long, grp string, value double",
        )
        out = winsorize(
            df, value_col="value", group_cols=("grp",),
            q_lo=(5, 100), q_hi=(95, 100),
        ).collect()
        sv = sorted(vals)
        n = len(sv)
        lo = sv[-(-5 * n // 100) - 1]   # ceil rank, 1-indexed
        hi = sv[-(-95 * n // 100) - 1]
        for r in out:
            assert r["lo"] == lo and r["hi"] == hi
            assert r["value_w"] == max(lo, min(hi, r["value"]))

    def test_null_values_pass_through(self, spark):
        from xorq_spark.functions.timeseries import winsorize

        df = spark.createDataFrame(
            [(1, "a", 1.0), (2, "a", None), (3, "a", 100.0), (4, "a", 2.0)],
            "event_id long, grp string, value double",
        )
        out = {r["event_id"]: r["value_w"] for r in winsorize(
            df, value_col="value", group_cols=("grp",),
            q_lo=(1, 100), q_hi=(99, 100),
        ).collect()}
        assert out[2] is None
        assert out[1] == 1.0 and out[3] == 100.0


class TestKMVSketch:
    """KMV/theta distinct sketch (functions/sketches.py kmv_*)."""

    def _hashes(self, keys):
        # Python replay of _h52 for ground truth
        import hashlib

        return sorted(
            int(hashlib.md5(str(k).encode()).hexdigest()[:13], 16)
            for k in set(keys)
        )

    def test_exact_below_k(self, spark):
        from xorq_spark.functions.sketches import kmv_build, kmv_estimate

        keys = [f"u{i}" for i in range(40)] * 3  # 40 distinct, many dups
        df = spark.createDataFrame([(k,) for k in keys], "k string")
        sk = kmv_build(df, "k", k=64)
        row = kmv_estimate(sk, k=64).collect()[0]
        assert row.n_retained == 40
        assert row.est_distinct == 40  # exact when below k

    def test_estimator_matches_python_replay_and_is_close(self, spark):
        from xorq_spark.functions.sketches import kmv_build, kmv_estimate

        n, k = 5000, 64
        keys = [f"user-{i}" for i in range(n)]
        df = spark.createDataFrame([(x,) for x in keys], "k string")
        row = kmv_estimate(kmv_build(df, "k", k=k), k=k).collect()[0]
        hs = self._hashes(keys)
        expected = ((k - 1) * (1 << 52)) // hs[k - 1]
        assert row.est_distinct == expected  # bit-exact vs model
        # KMV relative error ~ 1/sqrt(k-2) ≈ 13%; allow 3 sigma
        assert abs(row.est_distinct - n) / n < 0.4

    def test_merge_lossless(self, spark):
        from xorq_spark.functions.sketches import kmv_build, kmv_merge

        keys = [(f"id{i}", i % 5) for i in range(1000)]
        df = spark.createDataFrame(keys, "k string, shard int")
        direct = {r.h for r in kmv_build(df, "k", k=32).collect()}
        parts = [
            kmv_build(df.where(f"shard = {s}"), "k", k=32) for s in range(5)
        ]
        merged = {r.h for r in kmv_merge(*parts, k=32).collect()}
        assert merged == direct

    def test_set_ops_exact_when_small(self, spark):
        from xorq_spark.functions.sketches import kmv_build, kmv_set_estimates

        a = spark.createDataFrame([(f"x{i}",) for i in range(30)], "k string")
        b = spark.createDataFrame(
            [(f"x{i}",) for i in range(20, 50)], "k string"
        )
        row = kmv_set_estimates(
            kmv_build(a, "k", k=64), kmv_build(b, "k", k=64), k=64
        ).collect()[0]
        # both below k -> theta = M -> exact set arithmetic
        assert row.theta == 1 << 52
        assert row.n_common == 10
        assert row.est_intersection == 10
        assert row.est_union == 50
        assert row.jaccard_ppb == 10 * 10**9 // 50

    def test_set_ops_estimates_reasonable(self, spark):
        from xorq_spark.functions.sketches import kmv_build, kmv_set_estimates

        a = spark.createDataFrame(
            [(f"k{i}",) for i in range(3000)], "k string"
        )
        b = spark.createDataFrame(
            [(f"k{i}",) for i in range(1500, 4500)], "k string"
        )
        row = kmv_set_estimates(
            kmv_build(a, "k", k=128), kmv_build(b, "k", k=128), k=128
        ).collect()[0]
        assert abs(row.est_intersection - 1500) / 1500 < 0.5
        assert abs(row.est_union - 4500) / 4500 < 0.3

    def test_k_bound_enforced(self, spark):
        import pytest as _pytest

        from xorq_spark.functions.sketches import kmv_build

        df = spark.createDataFrame([("a",)], "k string")
        with _pytest.raises(ValueError):
            kmv_build(df, "k", k=1024)


class TestHeavyHitters:
    def test_exact_above_threshold_only(self, spark):
        from xorq_spark.functions.sketches import heavy_hitters

        rows = [("hot",)] * 50 + [("warm",)] * 10 + [
            (f"cold{i}",) for i in range(200)
        ]
        df = spark.createDataFrame(rows, "k string")
        out = {r.k: (r.exact_count, r.cms_est)
               for r in heavy_hitters(df, "k", threshold=10).collect()}
        assert set(out) == {"hot", "warm"}
        assert out["hot"][0] == 50 and out["warm"][0] == 10
        # CMS never underestimates
        assert all(est >= exact for exact, est in out.values())

    def test_collisions_pruned_by_exact_pass(self, spark):
        from xorq_spark.functions.sketches import heavy_hitters

        # width=2: everything collides; exact pass must still be exact
        rows = [("a",)] * 30 + [("b",)] * 5 + [("c",)] * 4
        df = spark.createDataFrame(rows, "k string")
        out = {r.k: r.exact_count
               for r in heavy_hitters(df, "k", 20, depth=2, width=2).collect()}
        assert out == {"a": 30}

    def test_size_guard(self, spark):
        import pytest as _pytest

        from xorq_spark.functions.sketches import heavy_hitters

        df = spark.createDataFrame([("a",)], "k string")
        with _pytest.raises(ValueError):
            heavy_hitters(df, "k", 1, depth=64, width=65536)


class TestProductQuantization:
    def _corpus(self, spark, n=120, d=16, clusters=4):
        import math

        rows = []
        for i in range(n):
            c = i % clusters
            base = [math.sin(c * 7 + t) for t in range(d)]
            vec = [base[t] + 0.01 * ((i * 31 + t) % 7 - 3) for t in range(d)]
            rows.append((i, vec))
        return spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    def test_codes_shape_and_range(self, spark):
        from xorq_spark.functions.similarity import pq_codebooks, pq_encode

        emb = self._corpus(spark)
        books = pq_codebooks(emb, m=4, ksub=8)
        assert len(books) == 4 and len(books[0]) == 8 and len(books[0][0]) == 4
        codes = pq_encode(emb, books).collect()
        assert len(codes) == 120
        for r in codes:
            assert len(r.codes) == 4
            assert all(0 <= c < 8 for c in r.codes)

    def test_codebook_members_encode_to_themselves(self, spark):
        from xorq_spark.functions.similarity import pq_codebooks, pq_encode

        emb = self._corpus(spark)
        books = pq_codebooks(emb, m=4, ksub=8)
        # the 8 lowest-id vectors ARE the codewords -> distance 0 to
        # their own codeword; argmin must pick it (or an exact tie)
        codes = {r.vec_id: r.codes
                 for r in pq_encode(emb, books).collect()}
        for i in range(8):
            for j, c in enumerate(codes[i]):
                assert books[j][c] == books[j][i] or c == i

    def test_adc_recall_vs_bruteforce(self, spark):
        from xorq_spark.functions.similarity import (
            ann_bruteforce_topk,
            pq_adc_topk,
            pq_codebooks,
            pq_encode,
        )

        emb = self._corpus(spark)
        books = pq_codebooks(emb, m=4, ksub=8)
        codes = pq_encode(emb, books)
        qs = emb.where("vec_id < 4").select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("query_vec"),
        )
        pq = pq_adc_topk(qs, codes, books, k=10)
        bf = ann_bruteforce_topk(qs, emb, k=10)
        pq_sets = {}
        for r in pq.collect():
            pq_sets.setdefault(r.query_id, set()).add(r.vec_id)
        hits = tot = 0
        for r in bf.collect():
            tot += 1
            hits += r.vec_id in pq_sets[r.query_id]
        # clustered corpus: PQ top-10 should recover most exact top-10
        assert hits / tot >= 0.5

    def test_dim_divisibility_guard(self, spark):
        import pytest as _pytest

        from xorq_spark.functions.similarity import pq_codebooks

        emb = self._corpus(spark, d=10)
        with _pytest.raises(ValueError):
            pq_codebooks(emb, m=4, ksub=4)


def test_join_explosion_stats_exact(spark):
    from xorq_spark.operators.skew import join_explosion_stats

    left = spark.createDataFrame(
        [("k1",)] * 3 + [("k2",)] * 2 + [("only_left",)], "k string"
    )
    right = spark.createDataFrame(
        [("k1",)] * 4 + [("k2",)] * 1 + [("only_right",)] * 9, "k string"
    )
    r = join_explosion_stats(left, right, ["k"], top=1).collect()[0]
    assert r.n_left == 6 and r.n_right == 14
    assert r.n_keys_matched == 2
    assert r.out_rows == 3 * 4 + 2 * 1          # 14
    assert r.max_key_rows == 12
    assert r.top_share_ppm == 12 * 1_000_000 // 14
    # cross-check against the actual join
    assert left.join(right, "k").count() == r.out_rows


class TestReadabilityAndCodeDetect:
    def test_readability_known_values(self, spark):
        import pyspark.sql.functions as F

        from xorq_spark.functions.text import readability

        df = spark.createDataFrame(
            [("The cat sat. The dog ran.",), ("",), (None,)], "text string"
        )
        rows = df.select(readability(F.col("text")).alias("r")).collect()
        r = rows[0]["r"]
        assert r["n_words"] == 6 and r["n_sentences"] == 2
        # vowel groups: e/a/a/e/o/a = 6 (y in 'The'? no vowel group spans)
        assert r["n_syllables"] == 6
        wps, spw = 6 / 2, 6 / 6
        assert abs(r["flesch_reading_ease"] - round(206.835 - 1.015 * wps - 84.6 * spw, 9)) < 1e-12
        assert abs(r["fk_grade"] - round(0.39 * wps + 11.8 * spw - 15.59, 9)) < 1e-12
        # empty/null floor to 1s, never divide by zero
        for row in rows[1:]:
            assert row["r"]["n_words"] == 1 and row["r"]["n_sentences"] == 1

    def test_code_detect_separates_code_from_prose(self, spark):
        import pyspark.sql.functions as F

        from xorq_spark.functions.text import code_detect

        code = (
            "def f(x):\n    return x + 1;\n"
            "int main() { int y = f(2); while (y) { y--; } }"
        )
        prose = "The quick brown fox jumps over the lazy dog near the bank."
        df = spark.createDataFrame([(code,), (prose,)], "text string")
        rows = df.select(code_detect(F.col("text")).alias("c")).collect()
        c, p = rows[0]["c"], rows[1]["c"]
        assert c["is_code_like"] and not p["is_code_like"]
        assert c["n_braces"] >= 4 and c["n_semicolons"] >= 3
        assert c["keyword_word_frac"] > p["keyword_word_frac"]
        assert c["indent_line_frac"] > 0 and p["indent_line_frac"] == 0.0

    def test_lsh_plan_matches_theory(self, spark):
        from xorq_spark.functions.dedup import lsh_banding_plan

        rows = {
            (r["bands"], r["rows_per_band"]): r
            for r in lsh_banding_plan(spark, 128, 800_000).collect()
        }
        # every factorization of 128 present exactly once
        assert set(rows) == {(b, 128 // b) for b in [1, 2, 4, 8, 16, 32, 64, 128]}
        # the classic result for t=0.8 @ 128 hashes: b=8, r=16
        best = [k for k, r in rows.items() if r["is_best"]]
        assert best == [(8, 16)]
        # threshold* = (1/b)^(1/r) to 1e-9
        import math

        for (b, r), row in rows.items():
            want = round(math.exp(math.log(1.0 / b) / r) * 1e9)
            assert abs(row["threshold_star_e9"] - want) <= 1
        # extreme plans have one-sided error: b=1 never false-positives,
        # b=128/r=1 never false-negatives at t=0.8
        assert rows[(1, 128)]["fp_e9"] == 0
        assert rows[(128, 1)]["fn_e9"] == 0

    def test_lsh_plan_guards(self, spark):
        import pytest

        from xorq_spark.functions.dedup import lsh_banding_plan

        with pytest.raises(ValueError, match="n_hashes"):
            lsh_banding_plan(spark, 1)


def test_mojibake_flags_signals(spark):
    import pyspark.sql.functions as F

    from xorq_spark.functions.text import mojibake_flags

    df = spark.createDataFrame(
        [
            ("clean ascii text",),
            ("donâ€™t cafÃ© naÃ¯ve",),
            ("one bad � byte",),
            (None,),
        ],
        "text string",
    )
    rows = [r["m"] for r in df.select(mojibake_flags(F.col("text")).alias("m")).collect()]
    assert rows[0]["n_mojibake"] == 0 and not rows[0]["is_damaged"]
    assert rows[1]["n_mojibake"] >= 3 and rows[1]["is_damaged"]
    assert rows[2]["n_replacement"] == 1 and rows[2]["is_damaged"]
    assert rows[3]["n_mojibake"] == 0 and not rows[3]["is_damaged"]
