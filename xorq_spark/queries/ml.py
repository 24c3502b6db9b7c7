"""ML-layer queries (SURVEY §2.7): deterministic train/test splits,
K-fold assignment, deferred metrics — all pure relational, matching the
reference's reproducible hash-bucket design (expr/ml/split_lib.py)."""

from __future__ import annotations

import pyspark.sql.functions as F

from xorq_spark.ml import accuracy, calc_split_column, kfold_column, mae, mse
from xorq_spark.queries.base import query, t, money_out

# DuckDB replica of ml/split._key_hash for a single key column.
def _hash_sql(col: str) -> str:
    return (
        f"((((0 * 31 + ('0x' || substr(md5(CAST({col} AS VARCHAR)), 1, 8))::BIGINT)"
        f" % 2147483648) * 2654435761) % 4294967296)"
    )


@query(
    "ml_train_test_split",
    oracle=f"""
    WITH s AS (
      SELECT o_orderkey, o_totalprice,
             CASE WHEN {_hash_sql('o_orderkey')} % 10000 < 2500 THEN 'test'
                  ELSE 'train' END AS split
      FROM orders)
    SELECT split, COUNT(*) AS n,
           CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,2))), 2) AS DOUBLE) AS total
    FROM s GROUP BY split ORDER BY split
    """,
)
def ml_split(spark, sf_dir):
    """75/25 deterministic split of orders by hashed key; aggregates per
    split prove disjointness + stability."""
    col = calc_split_column("o_orderkey", [0.25, 0.75], 10000, ["test", "train"])
    return (
        t(spark, sf_dir, "orders")
        .withColumn("split", col)
        .groupBy("split")
        .agg(
            F.count("*").alias("n"),
            money_out(F.sum(F.col("o_totalprice").cast("decimal(18,2)"))).alias("total"),
        )
        .orderBy("split")
    )


@query(
    "ml_kfold_assignment",
    oracle=f"""
    WITH s AS (
      SELECT c_custkey, {_hash_sql('c_custkey')} % 5 AS fold FROM customer)
    SELECT CAST(fold AS INT) AS fold, COUNT(*) AS n,
           min(c_custkey) AS min_key, max(c_custkey) AS max_key
    FROM s GROUP BY fold ORDER BY fold
    """,
)
def ml_kfold(spark, sf_dir):
    """Deterministic K-fold ids (reference: CV fold assignment via
    UDWF, cross_validation.py:125 — ours is the pure-relational form)."""
    return (
        t(spark, sf_dir, "customer")
        .withColumn("fold", kfold_column("c_custkey", 5))
        .groupBy("fold")
        .agg(
            F.count("*").alias("n"),
            F.min("c_custkey").alias("min_key"),
            F.max("c_custkey").alias("max_key"),
        )
        .orderBy("fold")
    )


@query(
    "ml_metrics_classification",
    oracle="""
    SELECT ROUND(AVG(CASE WHEN vec_id % 3 = label THEN 1.0 ELSE 0.0 END), 9) AS acc,
           COUNT(*) FILTER (WHERE vec_id % 3 = label) AS n_correct,
           COUNT(*) AS n_total
    FROM embeddings
    """,
)
def ml_metrics_cls(spark, sf_dir):
    """Deferred accuracy metric as an aggregate expression (the trivial
    predictor vec_id % 3 keeps it oracle-checkable)."""
    emb = t(spark, sf_dir, "embeddings")
    pred = F.col("vec_id") % 3
    lbl = F.col("label")
    return emb.agg(
        F.round(accuracy(pred, lbl), 9).alias("acc"),
        F.count(F.when(pred == lbl, 1)).alias("n_correct"),
        F.count("*").alias("n_total"),
    )


@query(
    "ml_metrics_regression",
    oracle="""
    SELECT event_type,
           ROUND(AVG((value - 10.0) * (value - 10.0)), 6) AS mse,
           ROUND(AVG(ABS(value - 10.0)), 6) AS mae
    FROM events GROUP BY event_type ORDER BY event_type
    """,
)
def ml_metrics_reg(spark, sf_dir):
    """Deferred regression metrics vs a constant predictor."""
    ev = t(spark, sf_dir, "events")
    pred = F.lit(10.0)
    return (
        ev.groupBy("event_type")
        .agg(
            F.round(mse(pred, F.col("value")), 6).alias("mse"),
            F.round(mae(pred, F.col("value")), 6).alias("mae"),
        )
        .orderBy("event_type")
    )


@query(
    "ml_metrics_prf",
    oracle="""
    WITH conf AS (
      SELECT label AS l, (vec_id % 10)::INTEGER AS p, count(*) AS n
      FROM embeddings GROUP BY 1, 2),
    pm AS (SELECT p AS class, sum(n) AS pred_n FROM conf GROUP BY p),
    lm AS (SELECT l AS class, sum(n) AS label_n FROM conf GROUP BY l),
    diag AS (SELECT l AS class, n AS tp FROM conf WHERE l = p),
    base AS (
      SELECT class,
             COALESCE(tp, 0) AS tp,
             CAST(COALESCE(pred_n, 0) - COALESCE(tp, 0) AS BIGINT) AS fp,
             CAST(COALESCE(label_n, 0) - COALESCE(tp, 0) AS BIGINT) AS fn
      FROM pm FULL JOIN lm USING (class) LEFT JOIN diag USING (class))
    SELECT class, tp, fp, fn,
           round(tp / greatest(tp + fp, 1), 9) AS precision,
           round(tp / greatest(tp + fn, 1), 9) AS recall,
           round(CASE WHEN (tp / greatest(tp + fp, 1) + tp / greatest(tp + fn, 1)) > 0
                 THEN 2 * (tp / greatest(tp + fp, 1)) * (tp / greatest(tp + fn, 1))
                      / (tp / greatest(tp + fp, 1) + tp / greatest(tp + fn, 1))
                 ELSE 0.0 END, 9) AS f1
    FROM base ORDER BY class
    """,
)
def ml_metrics_prf_q(spark, sf_dir):
    """Per-class precision/recall/F1 (ml/metrics.py
    precision_recall_f1) for the deterministic predictor vec_id % 10
    against the embeddings labels — one confusion-count groupBy, tiny
    output."""
    from xorq_spark.ml.metrics import precision_recall_f1

    emb = t(spark, sf_dir, "embeddings").select(
        (F.col("vec_id") % 10).cast("int").alias("pred"), "label"
    )
    return precision_recall_f1(emb, "pred", "label").orderBy("class")


@query(
    "ml_metrics_auc",
    oracle="""
    WITH s AS (
      SELECT ((vec_id * 37) % 100) / 100.0
               + CASE WHEN label >= 5 THEN 0.4 ELSE 0.0 END AS sc,
             CASE WHEN label >= 5 THEN 1 ELSE 0 END AS y
      FROM embeddings),
    per AS (SELECT sc, count(*) AS n, sum(y) AS npos FROM s GROUP BY sc),
    r AS (SELECT sc, n, npos,
                 sum(n) OVER (ORDER BY sc ROWS UNBOUNDED PRECEDING) - n AS cum
          FROM per)
    SELECT round((sum(npos * (cum + (n + 1) / 2.0))
                  - sum(npos) * (sum(npos) + 1) / 2.0)
                 / greatest(sum(npos) * (sum(n) - sum(npos)), 1), 9) AS auc,
           CAST(sum(npos) AS BIGINT) AS n_pos,
           CAST(sum(n) - sum(npos) AS BIGINT) AS n_neg
    FROM r
    """,
)
def ml_metrics_auc_q(spark, sf_dir):
    """Exact binary ROC-AUC via the tie-aware rank formulation
    (ml/metrics.py roc_auc) over a deterministic synthetic score: the
    per-distinct-score aggregate keeps the ordered window tiny, and
    all arithmetic stays integer until the final division."""
    from xorq_spark.ml.metrics import roc_auc

    emb = t(spark, sf_dir, "embeddings").select(
        (
            ((F.col("vec_id") * 37) % 100) / F.lit(100.0)
            + F.when(F.col("label") >= 5, 0.4).otherwise(0.0)
        ).alias("score"),
        (F.col("label") >= 5).cast("int").alias("y"),
    )
    return roc_auc(emb, "score", "y")


def _leakage_split_oracle() -> str:
    from xorq_spark.queries.dedup import _BANDS, _SHINGLES, _SIG

    return f"""
    WITH RECURSIVE
    s AS (SELECT doc_id, list_distinct({_SHINGLES}) AS shd FROM documents),
    h AS (SELECT doc_id, shd,
                 list_transform(shd, s -> ('0x' || substring(md5(s), 1, 8))::BIGINT
                   % 2147483647) AS hs
          FROM s),
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
    g AS (
      SELECT d.doc_id, COALESCE(c.component_id, d.doc_id) AS group_id
      FROM documents d LEFT JOIN comp c USING (doc_id))
    SELECT doc_id, group_id,
           CASE WHEN {_hash_sql('group_id')} % 10000 < 2500 THEN 'test'
                ELSE 'train' END AS split
    FROM g ORDER BY doc_id
    """


@query("ml_leakage_safe_split", oracle=_leakage_split_oracle())
def ml_leakage_safe_split_q(spark, sf_dir):
    """Near-duplicate-aware train/test split (ml/split.py
    leakage_safe_split): split key = the document's near-dup group
    (certified MinHash-LSH -> connected-components pipeline), so a
    duplicate cluster can never straddle the train/eval boundary. The
    oracle replays pairs, the transitive closure, the group fallback,
    and the Knuth-mix bucket hash."""
    from xorq_spark.ml.split import leakage_safe_split

    docs = t(spark, sf_dir, "documents")
    return leakage_safe_split(docs).orderBy("doc_id")


def _kappa_oracle() -> str:
    from xorq_spark.queries.text import _CLEAN_TOKS, _LANG_CASE, _lang_score_sql
    from xorq_spark.functions.text import LANG_MARKERS

    scores = ", ".join(
        f"{_lang_score_sql(lang)} AS s_{lang}" for lang in LANG_MARKERS
    )
    mx = ", ".join("s_" + lang for lang in LANG_MARKERS)
    return f"""
    WITH tk AS (SELECT doc_id, lang, {_CLEAN_TOKS} AS toks FROM documents),
    sc AS (SELECT doc_id, lang, {scores} FROM tk),
    mx AS (SELECT *, greatest({mx}) AS m FROM sc),
    pred AS (SELECT lang AS a, {_LANG_CASE} AS b FROM mx),
    base AS (SELECT count(*) AS n,
                    sum(CASE WHEN a IS NOT DISTINCT FROM b
                        THEN 1 ELSE 0 END) AS n_agree FROM pred),
    ra AS (SELECT a AS lab, count(*) AS ra FROM pred GROUP BY a),
    rb AS (SELECT b AS lab, count(*) AS rb FROM pred GROUP BY b),
    ch AS (SELECT COALESCE(SUM(COALESCE(ra, 0) * COALESCE(rb, 0)), 0)
                  AS chance_weight
           FROM ra FULL OUTER JOIN rb USING (lab))
    SELECT CAST(n AS BIGINT) AS n,
           CAST(n_agree AS BIGINT) AS n_agree,
           CAST(chance_weight AS BIGINT) AS chance_weight,
           CAST(CASE WHEN n * n - chance_weight <= 0 THEN 0
                WHEN n * n_agree - chance_weight >= 0
                THEN ((n * n_agree - chance_weight) * 1000000000)
                     // (n * n - chance_weight)
                ELSE -(((chance_weight - n * n_agree) * 1000000000)
                       // (n * n - chance_weight)) END AS BIGINT) AS kappa_e9
    FROM base, ch
    """


@query("ml_metrics_kappa", oracle=_kappa_oracle())
def ml_metrics_kappa(spark, sf_dir):
    """Cohen's kappa (ml/metrics.py cohens_kappa) between the gold
    `lang` labels and the stopword-marker language-ID prediction — the
    chance-corrected agreement gate a silver-annotation pipeline runs
    before trusting a cheap classifier. All-int64 rationals with
    sign-split truncation toward zero (floor-vs-truncate on negative
    division differs across engines); one scan, marginals joined on
    the bounded label domain. The oracle replays prediction AND kappa
    arithmetic, so one misclassified document breaks the hash."""
    from xorq_spark.functions.text import language_id
    from xorq_spark.ml.metrics import cohens_kappa
    from xorq_spark.queries.base import widen

    docs = widen(t(spark, sf_dir, "documents"))
    pair = docs.select(
        F.col("lang").alias("gold"),
        language_id(F.col("text")).alias("pred"),
    )
    return cohens_kappa(pair, "gold", "pred")


@query(
    "ml_target_encoding",
    oracle="""
    WITH c AS (SELECT c_custkey, c_mktsegment,
                      CAST(floor(CAST(c_acctbal AS DOUBLE) * 100 + 0.5) AS BIGINT) AS y
               FROM customer
               WHERE c_mktsegment IS NOT NULL AND c_acctbal IS NOT NULL),
    pc AS (SELECT c_mktsegment, SUM(y) AS s, count(*) AS n FROM c GROUP BY 1),
    g AS (SELECT SUM(y) AS gs, count(*) AS gn FROM c)
    SELECT c_custkey, c_mktsegment,
           CAST(CASE WHEN n > 1 THEN
                  CASE WHEN (s - y) >= 0 THEN ((s - y) * 100) // (n - 1)
                       ELSE -((-(s - y) * 100) // (n - 1)) END
                WHEN gn > 1 THEN
                  CASE WHEN (gs - y) >= 0 THEN ((gs - y) * 100) // (gn - 1)
                       ELSE -((-(gs - y) * 100) // (gn - 1)) END
                ELSE NULL END AS BIGINT) AS te_c100
    FROM c JOIN pc USING (c_mktsegment), g
    ORDER BY c_custkey
    """,
)
def ml_target_encoding(spark, sf_dir):
    """Leave-one-out target encoding (ml/features.py target_encode):
    each customer's market segment encodes as the mean account balance
    of the OTHER customers in that segment (centi-units, exact integer
    div) — the leakage-guarded categorical encoder a 100 TB feature
    pipeline computes with one vocabulary-sized groupBy + broadcast
    join-back, never a corpus window or an sklearn round trip. The
    oracle replays quantization, group sums, and the sign-split
    truncating division (DuckDB // floors; Spark div truncates)."""
    from xorq_spark.ml.features import target_encode

    cust = t(spark, sf_dir, "customer").where(
        F.col("c_mktsegment").isNotNull() & F.col("c_acctbal").isNotNull()
    )
    cents = F.expr(
        "CAST(floor(CAST(c_acctbal AS DOUBLE) * 100 + 0.5) AS BIGINT)"
    )
    enc = target_encode(
        cust.withColumn("__cents", cents), "c_mktsegment", "__cents"
    )
    return enc.select("c_custkey", "c_mktsegment", "te_c100").orderBy(
        "c_custkey"
    )


@query(
    "ml_quantile_bins",
    oracle="""
    WITH v AS (SELECT l_returnflag AS f,
                      CAST(floor(CAST(l_extendedprice AS DOUBLE) * 100 + 0.5) AS BIGINT) AS v
               FROM lineitem
               WHERE l_returnflag IS NOT NULL AND l_extendedprice IS NOT NULL),
    n AS (SELECT f, count(*) AS n FROM v GROUP BY 1),
    dv AS (SELECT f, v, count(*) AS c FROM v GROUP BY 1, 2),
    cum AS (SELECT f, v,
                   SUM(c) OVER (PARTITION BY f ORDER BY v
                                ROWS UNBOUNDED PRECEDING) AS cum
            FROM dv),
    needs AS (SELECT f, (i * n + 7) // 8 AS need
              FROM (SELECT f, n, unnest(range(1, 8)) AS i FROM n)
              GROUP BY 1, 2),
    b AS (SELECT f, need, min(v) AS b
          FROM cum JOIN needs USING (f)
          WHERE cum >= need GROUP BY 1, 2),
    asg AS (SELECT dv.f, dv.v, dv.c, 1 + count(b.b) AS bin
            FROM dv LEFT JOIN b ON b.f = dv.f AND b.b < dv.v
            GROUP BY dv.f, dv.v, dv.c)
    SELECT f AS l_returnflag, CAST(bin AS INT) AS bin,
           CAST(SUM(c) AS BIGINT) AS n_rows,
           CAST(min(v) AS BIGINT) AS v_min,
           CAST(max(v) AS BIGINT) AS v_max
    FROM asg GROUP BY 1, 2
    ORDER BY l_returnflag, bin
    """,
)
def ml_quantile_bins(spark, sf_dir):
    """Exact equal-frequency discretization (ml/features.py
    quantile_bins): per-returnflag price octiles with type-1 boundary
    ranks ceil(i*N/8) and ties-to-the-lower-bin assignment —
    deterministic where NTILE's row-rank tie lottery is not, and
    identical on any engine because every step (distinct-value cumsum,
    integer rank, strict-below count against the broadcast boundary
    array) is integer arithmetic. Output is the per-bin audit (count,
    min, max): boundary errors shift bin populations and break the
    hash."""
    from xorq_spark.ml.features import quantile_bins

    li = t(spark, sf_dir, "lineitem").where(
        F.col("l_returnflag").isNotNull()
        & F.col("l_extendedprice").isNotNull()
    )
    cents = F.expr(
        "CAST(floor(CAST(l_extendedprice AS DOUBLE) * 100 + 0.5) AS BIGINT)"
    )
    base = li.select(F.col("l_returnflag"), cents.alias("__v"))
    binned = quantile_bins(base, "__v", 8, by=["l_returnflag"])
    return (
        binned.groupBy("l_returnflag", "bin")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.min("__v").cast("long").alias("v_min"),
            F.max("__v").cast("long").alias("v_max"),
        )
        .orderBy("l_returnflag", "bin")
    )


@query(
    "ml_metrics_lift",
    oracle="""
    WITH d AS (SELECT CAST(l_extendedprice AS DECIMAL(18,2)) AS s,
                      (l_returnflag = 'R') AS y,
                      l_orderkey AS o, l_linenumber AS ln
               FROM lineitem),
    r AS (SELECT y, row_number() OVER (ORDER BY s DESC, o, ln) AS r
          FROM d),
    n AS (SELECT CAST(count(*) AS BIGINT) AS N,
                 CAST(sum(CASE WHEN y THEN 1 ELSE 0 END) AS BIGINT) AS P
          FROM d),
    b AS (SELECT y, CAST((r * 10 + N - 1) // N AS BIGINT) AS bucket
          FROM r, n),
    per AS (SELECT bucket, CAST(count(*) AS BIGINT) AS n2,
                   CAST(sum(CASE WHEN y THEN 1 ELSE 0 END) AS BIGINT)
                     AS n_pos
            FROM b GROUP BY bucket),
    c AS (SELECT bucket, n2, n_pos,
                 sum(n2) OVER (ORDER BY bucket ROWS BETWEEN UNBOUNDED
                   PRECEDING AND CURRENT ROW) AS cum_n,
                 sum(n_pos) OVER (ORDER BY bucket ROWS BETWEEN UNBOUNDED
                   PRECEDING AND CURRENT ROW) AS cum_pos
          FROM per)
    SELECT bucket, n2 AS n, n_pos,
           CAST(CASE WHEN n2 = 0 THEN 0
                ELSE n_pos * 1000000 // n2 END AS BIGINT) AS pos_rate_ppm,
           CAST(cum_n AS BIGINT) AS cum_n,
           CAST(cum_pos AS BIGINT) AS cum_pos,
           CAST(CASE WHEN cum_n * P = 0 THEN 0 ELSE
                CAST(cum_pos AS HUGEINT) * N * 1000000
                // (CAST(cum_n AS HUGEINT) * P) END AS BIGINT)
             AS cum_lift_ppm
    FROM c, n ORDER BY bucket
    """,
)
def ml_metrics_lift(spark, sf_dir):
    """Decile lift / gains table (ml/metrics.py lift_table): rank the
    corpus by a score (extended price), cut exact type-1 deciles (no
    NTILE row-lottery), and read positive concentration + cumulative
    lift in exact ppm integers. The global rank is built WITHOUT a
    global sort (distinct-score cumulative offsets + within-score
    row_number, the quantile_calibrate pattern); the oracle derives
    the same ranks with a literal global window, so the two
    constructions must agree row-for-row."""
    from xorq_spark.ml.metrics import lift_table

    li = t(spark, sf_dir, "lineitem").select(
        F.expr("CAST(l_extendedprice AS DECIMAL(18,2))").alias("s"),
        (F.col("l_returnflag") == "R").alias("y"),
        "l_orderkey",
        "l_linenumber",
    )
    return lift_table(
        li, score_col="s", label_col="y", n_buckets=10,
        order_cols=("l_orderkey", "l_linenumber"),
    ).orderBy("bucket")


@query(
    "ml_calibration_bins",
    oracle="""
    WITH s AS (
      SELECT least(((vec_id * 37) % 100) * 10000
                   + CASE WHEN label >= 5 THEN 400000 ELSE 0 END,
                   999999) AS p_ppm,
             CASE WHEN label >= 5 THEN 1 ELSE 0 END AS y
      FROM embeddings),
    b AS (SELECT CAST(p_ppm // 100000 AS BIGINT) AS bin,
                 CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(p_ppm) AS BIGINT) AS sp,
                 CAST(sum(y) AS BIGINT) AS npos
          FROM s GROUP BY 1)
    SELECT bin, n,
           CAST(sp // n AS BIGINT) AS mean_pred_ppm,
           CAST(npos * 1000000 // n AS BIGINT) AS obs_rate_ppm,
           CAST(npos * 1000000 // n - sp // n AS BIGINT) AS gap_ppm,
           CAST(abs(npos * 1000000 // n - sp // n) * n AS BIGINT)
             AS ece_contrib
    FROM b ORDER BY bin
    """,
)
def ml_calibration_bins(spark, sf_dir):
    """Reliability diagram / calibration bins over the deterministic
    synthetic score (same construction as ml_metrics_auc): 10
    predicted-probability deciles, each reporting mean predicted ppm
    vs observed positive rate ppm, the signed gap, and the
    n-weighted ECE contribution — the go/no-go check before using a
    model's scores as probabilities (AUC measures ranking; it says
    nothing about calibration). All integer ppm with floor division;
    one combinable groupBy."""
    emb = t(spark, sf_dir, "embeddings")
    s = emb.select(
        F.least(
            ((F.col("vec_id") * 37) % 100) * 10000
            + F.when(F.col("label") >= 5, 400000).otherwise(0),
            F.lit(999999),
        ).cast("long").alias("p_ppm"),
        (F.col("label") >= 5).cast("int").alias("y"),
    )
    b = s.groupBy(
        F.expr("CAST(p_ppm div 100000 AS BIGINT)").alias("bin")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("p_ppm").cast("long").alias("sp"),
        F.sum("y").cast("long").alias("npos"),
    )
    return (
        b.select(
            "bin", "n",
            F.expr("CAST(sp div n AS BIGINT)").alias("mean_pred_ppm"),
            F.expr("CAST(npos * 1000000 div n AS BIGINT)").alias("obs_rate_ppm"),
            F.expr(
                "CAST(npos * 1000000 div n - sp div n AS BIGINT)"
            ).alias("gap_ppm"),
            F.expr(
                "CAST(abs(npos * 1000000 div n - sp div n) * n AS BIGINT)"
            ).alias("ece_contrib"),
        )
        .orderBy("bin")
    )


@query(
    "ml_stump_gain",
    oracle="""
    WITH s AS (
      SELECT least(((vec_id * 37) % 100) * 10000
                   + CASE WHEN label >= 5 THEN 400000 ELSE 0 END,
                   999999) AS x,
             CASE WHEN label >= 5 THEN 1 ELSE 0 END AS y
      FROM embeddings),
    dv AS (SELECT x, CAST(count(*) AS BIGINT) AS c,
                  CAST(sum(y) AS BIGINT) AS p
           FROM s GROUP BY x),
    cum AS (SELECT x,
                   CAST(sum(c) OVER (ORDER BY x) AS BIGINT) AS nl,
                   CAST(sum(p) OVER (ORDER BY x) AS BIGINT) AS pl,
                   CAST(sum(c) OVER () AS BIGINT) AS n,
                   CAST(sum(p) OVER () AS BIGINT) AS pp
            FROM dv),
    g AS (SELECT x, nl, n - nl AS nr, pl, pp - pl AS pr, n, pp,
                 1000000000000
                   - CAST((CAST(pp AS HUGEINT) * pp
                          + CAST(n - pp AS HUGEINT) * (n - pp))
                          * 1000000000000 // (CAST(n AS HUGEINT) * n)
                     AS BIGINT) AS gp
          FROM cum WHERE nl < n),
    gain AS (
      SELECT x, nl, nr,
             gp - CAST((nl * (1000000000000
                    - CAST((CAST(pl AS HUGEINT) * pl
                           + CAST(nl - pl AS HUGEINT) * (nl - pl))
                           * 1000000000000 // (CAST(nl AS HUGEINT) * nl)
                      AS BIGINT))
                  + nr * (1000000000000
                    - CAST((CAST(pr AS HUGEINT) * pr
                           + CAST(nr - pr AS HUGEINT) * (nr - pr))
                           * 1000000000000 // (CAST(nr AS HUGEINT) * nr)
                      AS BIGINT))) // n AS BIGINT) AS gain_e12
      FROM g),
    best AS (SELECT max(gain_e12) AS best_gain FROM gain)
    SELECT CAST(min(x) AS BIGINT) AS threshold,
           CAST(max(gain_e12) AS BIGINT) AS gain_e12,
           CAST(arg_min(nl, x) AS BIGINT) AS n_left,
           CAST(arg_min(nr, x) AS BIGINT) AS n_right
    FROM gain JOIN best ON gain.gain_e12 = best.best_gain
    """,
)
def ml_stump_gain(spark, sf_dir):
    """Decision-stump split screening: the single best threshold on
    the synthetic score by EXACT Gini impurity gain (all impurities in
    1e-12 integer rationals with defined floor steps — the certified
    metric) — the feature-importance primitive behind tree-based
    feature screening. Thresholds come from the distinct-value cumsum
    table (two-level prefix, no corpus sort); ties resolve to the
    smallest threshold."""
    from xorq_spark.operators.prefix import running_sum

    emb = t(spark, sf_dir, "embeddings")
    s = emb.select(
        F.least(
            ((F.col("vec_id") * 37) % 100) * 10000
            + F.when(F.col("label") >= 5, 400000).otherwise(0),
            F.lit(999999),
        ).cast("long").alias("x"),
        (F.col("label") >= 5).cast("int").alias("y"),
    )
    dv = s.groupBy("x").agg(
        F.count(F.lit(1)).cast("long").alias("c"),
        F.sum("y").cast("long").alias("p"),
    )
    cum = running_sum(dv, "x", cols={"nl": "c", "pl": "p"})
    tot = dv.agg(
        F.sum("c").cast("long").alias("n"),
        F.sum("p").cast("long").alias("pp"),
    )
    E12 = "1000000000000"
    g = (
        cum.crossJoin(F.broadcast(tot))
        .where(F.col("nl") < F.col("n"))
        .select(
            "x", "nl", "pl", "n", "pp",
            (F.col("n") - F.col("nl")).alias("nr"),
            (F.col("pp") - F.col("pl")).alias("pr"),
        )
        .withColumn(
            "gp",
            F.expr(
                f"{E12} - CAST((CAST(pp AS DECIMAL(38,0)) * pp"
                f" + CAST(n - pp AS DECIMAL(38,0)) * (n - pp))"
                f" * {E12} div (CAST(n AS DECIMAL(38,0)) * n) AS BIGINT)"
            ),
        )
        .withColumn(
            # nr > 0 is guaranteed by the nl < n filter, but the guard
            # must live INSIDE the expression: ANSI mode evaluates the
            # fused project before the filter in whole-stage codegen
            "gain_e12",
            F.expr(
                f"CASE WHEN nr <= 0 THEN NULL ELSE"
                f" gp - CAST((nl * ({E12}"
                f" - CAST((CAST(pl AS DECIMAL(38,0)) * pl"
                f" + CAST(nl - pl AS DECIMAL(38,0)) * (nl - pl))"
                f" * {E12} div (CAST(nl AS DECIMAL(38,0)) * nl) AS BIGINT))"
                f" + nr * ({E12}"
                f" - CAST((CAST(pr AS DECIMAL(38,0)) * pr"
                f" + CAST(nr - pr AS DECIMAL(38,0)) * (nr - pr))"
                f" * {E12} div (CAST(nr AS DECIMAL(38,0)) * nr) AS BIGINT)))"
                f" div n AS BIGINT) END"
            ),
        )
    )
    best = g.agg(F.max("gain_e12").alias("best_gain"))
    return (
        g.join(F.broadcast(best), g.gain_e12 == best.best_gain)
        .agg(
            # the winning row is picked ATOMICALLY: min threshold x
            # among gain ties, then THAT row's (nl, nr) via min_by —
            # independent min(nl)/min(nr) could report a (threshold,
            # n_left, n_right) tuple matching no actual split
            F.min("x").cast("long").alias("threshold"),
            F.max("gain_e12").cast("long").alias("gain_e12"),
            F.min_by("nl", "x").cast("long").alias("n_left"),
            F.min_by("nr", "x").cast("long").alias("n_right"),
        )
    )


@query(
    "ml_brier_score",
    oracle="""
    WITH s AS (
      SELECT least(((vec_id * 37) % 100) * 10000
                   + CASE WHEN label >= 5 THEN 400000 ELSE 0 END,
                   999999) AS p_ppm,
             CASE WHEN label >= 5 THEN 1 ELSE 0 END AS y
      FROM embeddings)
    SELECT CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(p_ppm - y * 1000000 AS HUGEINT)
                    * (p_ppm - y * 1000000)) // count(*) AS BIGINT)
             AS brier_e12
    FROM s
    """,
)
def ml_brier_score(spark, sf_dir):
    """Brier score of the synthetic probability forecast — mean squared
    probability error in EXACT 1e-12 units ((p_ppm - y*1e6)^2 summed
    in DECIMAL, one floor division): the strictly proper scoring rule
    that decomposes into calibration + refinement (pairs with
    ml_calibration_bins' reliability view). One combinable pass."""
    emb = t(spark, sf_dir, "embeddings")
    s = emb.select(
        F.least(
            ((F.col("vec_id") * 37) % 100) * 10000
            + F.when(F.col("label") >= 5, 400000).otherwise(0),
            F.lit(999999),
        ).cast("long").alias("p_ppm"),
        (F.col("label") >= 5).cast("long").alias("y"),
    )
    return s.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.expr(
            "CAST(sum(CAST(p_ppm - y * 1000000 AS DECIMAL(38,0))"
            " * (p_ppm - y * 1000000)) div count(1) AS BIGINT)"
        ).alias("brier_e12"),
    )
