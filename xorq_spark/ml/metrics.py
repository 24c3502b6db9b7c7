"""Deferred metrics as aggregation expressions (reference:
deferred_sklearn_metric / Scorer, expr/ml/metrics.py:513,91) — each
metric is a Column aggregate, so it composes into any groupBy/agg plan
and runs distributed (single partial+final aggregate, no collect)."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column


def accuracy(pred: Column, label: Column) -> Column:
    return F.avg(F.when(pred == label, 1.0).otherwise(0.0))


def mse(pred: Column, label: Column) -> Column:
    d = pred.cast("double") - label.cast("double")
    return F.avg(d * d)


def mae(pred: Column, label: Column) -> Column:
    return F.avg(F.abs(pred.cast("double") - label.cast("double")))


def r2(pred: Column, label: Column) -> Column:
    """1 - SS_res/SS_tot, computed from sums so it stays one aggregate."""
    y = label.cast("double")
    yhat = pred.cast("double")
    n = F.count(y)
    ss_res = F.sum((y - yhat) * (y - yhat))
    ss_tot = F.sum(y * y) - (F.sum(y) * F.sum(y)) / n
    return F.lit(1.0) - ss_res / ss_tot


def precision_recall_f1(df, pred_col: str, label_col: str):
    """Per-class precision / recall / F1 from one confusion-count pass.

    Returns (class, tp, fp, fn, precision, recall, f1) — one row per
    class observed in predictions or labels, ratios rounded to 9 for
    engine-independent comparison.

    Scale: one groupBy over (label, pred) — map-side combinable, the
    confusion matrix is tiny (|classes|^2) however large the input."""
    conf = df.groupBy(
        F.col(label_col).alias("__l"), F.col(pred_col).alias("__p")
    ).agg(F.count(F.lit(1)).alias("__n"))
    pred_marg = conf.groupBy(F.col("__p").alias("class")).agg(
        F.sum("__n").alias("__pred_n")
    )
    label_marg = conf.groupBy(F.col("__l").alias("class")).agg(
        F.sum("__n").alias("__label_n")
    )
    diag = conf.where(F.col("__l") == F.col("__p")).select(
        F.col("__l").alias("class"), F.col("__n").alias("tp")
    )
    base = (
        pred_marg.join(label_marg, "class", "full")
        .join(diag, "class", "left")
        .select(
            "class",
            F.coalesce("tp", F.lit(0)).alias("tp"),
            (F.coalesce("__pred_n", F.lit(0)) - F.coalesce("tp", F.lit(0))).alias("fp"),
            (F.coalesce("__label_n", F.lit(0)) - F.coalesce("tp", F.lit(0))).alias("fn"),
        )
    )
    prec = F.col("tp") / F.greatest(F.col("tp") + F.col("fp"), F.lit(1))
    rec = F.col("tp") / F.greatest(F.col("tp") + F.col("fn"), F.lit(1))
    f1 = F.when(
        (prec + rec) > 0, 2 * prec * rec / (prec + rec)
    ).otherwise(F.lit(0.0))
    return base.select(
        "class",
        "tp",
        "fp",
        "fn",
        F.round(prec, 9).alias("precision"),
        F.round(rec, 9).alias("recall"),
        F.round(f1, 9).alias("f1"),
    )


def roc_auc(df, score_col: str, label_col: str):
    """Binary ROC-AUC via the rank (Mann-Whitney) formulation with
    exact tie handling — returns a single-row DataFrame (auc, n_pos,
    n_neg).

    Scale design: scores aggregate per DISTINCT value first (map-side
    combinable), so the ordered prefix-sum window runs over the
    distinct-score frame — at most |distinct scores| rows, typically
    orders of magnitude below the input. The one global ordering is
    the inherent cost of an exact AUC; for 100 TB score columns bin
    scores first (fixed-width buckets give an AUC within bin
    resolution). Counts accumulate exactly — DECIMAL(38,1) for the
    rank-sum products, so n_pos beyond the int64 product limit (~3e9)
    cannot silently wrap — and the engines agree bit-for-bit up to
    ~2^53 ROWS PER TIE GROUP (the avg-rank double); past that, bin
    first."""
    from pyspark.sql import Window

    y = (F.col(label_col).cast("int") > 0).cast("long")
    per_score = (
        df.select(F.col(score_col).alias("__s"), y.alias("__y"))
        .groupBy("__s")
        .agg(F.count(F.lit(1)).alias("__n"), F.sum("__y").alias("__npos"))
    )
    # two-level global cumsum (operators/prefix.py) — a near-continuous
    # score domain must not funnel through a single-partition window
    from xorq_spark.operators.prefix import running_sum

    ranked = running_sum(per_score, "__s", "__n", "__cumin").withColumn(
        "__cum", F.col("__cumin") - F.col("__n")
    ).withColumn(
        # average rank of the tie group: ranks __cum+1 .. __cum+__n
        "__avg_rank",
        F.col("__cum") + (F.col("__n") + F.lit(1)) / F.lit(2.0),
    )
    dec = "decimal(38,1)"
    npos = F.sum("__npos").cast(dec)
    nneg = (F.sum("__n") - F.sum("__npos")).cast(dec)
    rank_sum = F.sum(
        (F.col("__npos").cast(dec) * F.col("__avg_rank").cast(dec))
    )
    return ranked.agg(
        F.round(
            (
                (rank_sum - npos * (npos + 1) / 2).cast("double")
                / F.greatest(npos * nneg, F.lit(1).cast(dec)).cast("double")
            ),
            9,
        ).alias("auc"),
        F.sum("__npos").alias("n_pos"),
        (F.sum("__n") - F.sum("__npos")).alias("n_neg"),
    )


def log_loss(prob: Column, label: Column, eps: float = 1e-15) -> Column:
    """Binary cross-entropy aggregate: -mean(y ln p + (1-y) ln(1-p)),
    probabilities clipped to [eps, 1-eps]."""
    p = F.least(F.greatest(prob, F.lit(eps)), F.lit(1.0 - eps))
    y = (label.cast("int") > 0).cast("double")
    return -F.avg(y * F.log(p) + (1 - y) * F.log(1 - p))


def cohens_kappa(df, col_a: str, col_b: str, scale: int = 10**9):
    """Cohen's kappa — chance-corrected agreement between two label
    columns (two annotators, or a classifier vs gold labels; the
    standard quality gate on labeling/silver-annotation pipelines).

    kappa = (N*agree - sum_l row_l*col_l) / (N^2 - sum_l row_l*col_l),
    computed entirely in int64 rationals and emitted as kappa_e9 =
    kappa scaled by 1e9 with EXPLICIT truncation toward zero (the
    sign-split makes the integer division identical across engines,
    which floor-vs-truncate negative division would not be).

    Agreement is null-safe (NULL == NULL counts as agreement, like a
    shared 'abstain' label). Scale: one combinable pair aggregate, two
    label-marginal groupBys joined on the BOUNDED label domain, three
    single-row broadcasts — the fact table is scanned once.

    Returns a 1-row DataFrame (n, n_agree, chance_weight, kappa_e9).
    """
    pair = df.select(F.col(col_a).alias("__a"), F.col(col_b).alias("__b"))
    base = pair.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(
            F.col("__a").eqNullSafe(F.col("__b")).cast("long")
        ).alias("n_agree"),
    )
    ra = pair.groupBy(F.col("__a").alias("__lab")).agg(
        F.count(F.lit(1)).alias("__ra")
    )
    rb = pair.groupBy(F.col("__b").alias("__lab")).agg(
        F.count(F.lit(1)).alias("__rb")
    )
    chance = (
        ra.join(rb, "__lab", "full_outer")
        .agg(
            F.coalesce(
                F.sum(
                    F.coalesce(F.col("__ra"), F.lit(0))
                    * F.coalesce(F.col("__rb"), F.lit(0))
                ),
                F.lit(0),
            ).alias("chance_weight")
        )
    )
    out = base.crossJoin(F.broadcast(chance))
    num = F.col("n") * F.col("n_agree") - F.col("chance_weight")
    den = F.col("n") * F.col("n") - F.col("chance_weight")
    # explicit sign-split truncation toward zero, engine-identical
    kappa_e9 = F.when(den <= 0, F.lit(0)).otherwise(
        F.when(
            num >= 0,
            F.expr(
                f"((n * n_agree - chance_weight) * {scale})"
                " div (n * n - chance_weight)"
            ),
        ).otherwise(
            -F.expr(
                f"((chance_weight - n * n_agree) * {scale})"
                " div (n * n - chance_weight)"
            )
        )
    )
    return out.select(
        F.col("n").cast("long").alias("n"),
        F.col("n_agree").cast("long").alias("n_agree"),
        F.col("chance_weight").cast("long").alias("chance_weight"),
        kappa_e9.cast("long").alias("kappa_e9"),
    )


def lift_table(
    df,
    score_col: str,
    label_col: str,
    n_buckets: int = 10,
    order_cols=(),
):
    """Decile lift / gains table — the business-facing classifier
    readout (rank by score, cut into buckets, how concentrated are the
    positives at the top?). Exact integer construction:

      - global score-descending rank WITHOUT a global sort (the
        quantile_calibrate pattern): distinct-score cumulative offsets
        + a within-score row_number tied by `order_cols`,
      - bucket = ceil(rank * n_buckets / N) — exact type-1 cuts, no
        NTILE row-lottery,
      - per-bucket and cumulative positives with ppm rates and the
        cumulative lift (cum_pos * N * 1e6) div (cum_n * P) in
        DECIMAL(38,0).

    Returns one row per bucket: (bucket, n, n_pos, pos_rate_ppm,
    cum_n, cum_pos, cum_lift_ppm).
    """
    import pyspark.sql.functions as F
    from pyspark.sql import DataFrame, Window

    k = int(n_buckets)
    d = df.select(
        F.col(score_col).alias("__s"),
        F.col(label_col).cast("boolean").alias("__y"),
        *[F.col(c) for c in order_cols],
    ).where(F.col("__s").isNotNull() & F.col("__y").isNotNull())
    from xorq_spark.operators.prefix import running_sum

    dv = running_sum(
        d.groupBy("__s").agg(F.count(F.lit(1)).alias("__c")),
        "__s", "__c", "__cum", descending=True,
    ).select("__s", (F.col("__cum") - F.col("__c")).alias("__prev"))
    wn = Window.partitionBy("__s").orderBy(
        *[F.col(c) for c in order_cols] if order_cols else [F.lit(1)]
    )
    tot = d.agg(
        F.count(F.lit(1)).cast("long").alias("__N"),
        F.sum(F.col("__y").cast("long")).cast("long").alias("__P"),
    )
    ranked = (
        d.join(F.broadcast(dv), "__s")
        .withColumn("__r", F.col("__prev") + F.row_number().over(wn))
        .crossJoin(F.broadcast(tot))
        .withColumn(
            "bucket", F.expr(f"CAST((__r * {k} + __N - 1) div __N AS INT)")
        )
    )
    per = ranked.groupBy("bucket", "__N", "__P").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.col("__y").cast("long")).cast("long").alias("n_pos"),
    )
    wc = Window.partitionBy("__N").orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    out = (
        per.withColumn("cum_n", F.sum("n").over(wc))
        .withColumn("cum_pos", F.sum("n_pos").over(wc))
    )
    return out.select(
        F.col("bucket").cast("long").alias("bucket"),
        "n",
        "n_pos",
        F.expr("CASE WHEN n = 0 THEN 0 ELSE n_pos * 1000000 div n END")
        .cast("long")
        .alias("pos_rate_ppm"),
        F.col("cum_n").cast("long").alias("cum_n"),
        F.col("cum_pos").cast("long").alias("cum_pos"),
        F.expr(
            "CAST(CASE WHEN cum_n * __P = 0 THEN 0 ELSE"
            " CAST(cum_pos AS DECIMAL(38,0)) * __N * 1000000"
            " div (CAST(cum_n AS DECIMAL(38,0)) * __P) END AS BIGINT)"
        ).alias("cum_lift_ppm"),
    )
