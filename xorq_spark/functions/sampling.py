"""Deterministic stratified sampling for training-mix construction.

A 100 TB corpus is never trained on wholesale: each source/language
stratum gets its own sampling rate (up-weight rare languages,
down-weight boilerplate-heavy crawls). The selection must be a PURE
FUNCTION of the row key so that reruns, backfills, and a second engine
(the DuckDB oracle) pick exactly the same rows — Spark's df.sample() is
seed-stable only within one partitioning, which a 1000-executor rerun
does not preserve.

Reuses the md5-derived Knuth-mix hash of the ML split layer
(ml/split.py _key_hash; reference semantics:
/root/reference/python/xorq/expr/ml/split_lib.py:154) so sampling and
split assignment come from the same reproducible hash family.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from xorq_spark.ml.split import _key_hash


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    fractions: Dict[str, float],
    unique_key: Sequence[str],
    default_fraction: float = 0.0,
    num_buckets: int = 10_000,
) -> DataFrame:
    """Keep a deterministic, per-stratum fraction of rows.

    A row survives iff hash(unique_key) % num_buckets falls under its
    stratum's cutoff — so the sample is stable across runs, partitions,
    and engines, and a row kept at fraction f is also kept at every
    fraction > f (nested samples: the 1% sample is a subset of the 10%
    sample, which makes scaling-law data ladders consistent).

    `fractions` maps stratum value -> fraction in [0, 1]; strata not
    listed get `default_fraction`. No shuffle: the filter is a pure
    per-row predicate pushed into the scan stage.
    """
    for k, v in fractions.items():
        if not (0.0 <= v <= 1.0):
            raise ValueError(f"fraction for {k!r} must be in [0,1], got {v}")
    if not (0.0 <= default_fraction <= 1.0):
        raise ValueError(f"default_fraction must be in [0,1], got {default_fraction}")
    import math

    # floor(x + 0.5), not round(): Python round is banker's; an engine
    # recomputing the cutoff in SQL (floor(x*N + 0.5)) must agree
    def cut(f: float) -> int:
        return int(math.floor(f * num_buckets + 0.5))

    bucket = _key_hash(unique_key) % num_buckets
    cutoff = F.lit(cut(default_fraction))
    # build CASE stratum WHEN ... chains in sorted order for plan determinism
    for value in sorted(fractions):
        cutoff = (
            F.when(
                F.col(strata_col) == F.lit(value),
                F.lit(cut(fractions[value])),
            ).otherwise(cutoff)
        )
    return df.filter(bucket < cutoff)


def cap_per_group(
    df: DataFrame,
    group_col: str,
    max_rows: int,
    unique_key: Sequence[str],
    keep: str = "hash",
) -> DataFrame:
    """Frequency capping: keep at most `max_rows` rows per group — the
    per-domain/per-source cap that stops a handful of crawl hosts from
    dominating a pretraining mix.

    keep='hash' ranks rows inside each group by the deterministic key
    hash (an unbiased, rerun-stable pseudo-random choice); keep='first'
    ranks by the key columns themselves (lowest ids win, handy for
    reproducing a published cut exactly). One window shuffle on
    `group_col`; skewed groups are exactly the rows AQE's skew handling
    splits, and the rank-filter discards the overflow before anything
    downstream shuffles again.
    """
    from pyspark.sql import Window

    if keep == "hash":
        order = [_key_hash(unique_key).asc(), *[F.col(c).asc() for c in unique_key]]
    elif keep == "first":
        order = [F.col(c).asc() for c in unique_key]
    else:
        raise ValueError(f"keep must be 'hash' or 'first', got {keep!r}")
    w = Window.partitionBy(group_col).orderBy(*order)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= max_rows)
        .drop("__rn")
    )


def temperature_sample(
    df: DataFrame,
    strata_col: str,
    alpha: float = 0.5,
    unique_key: Sequence[str] = ("doc_id",),
    max_fraction: float = 1.0,
    num_buckets: int = 10_000,
) -> DataFrame:
    """Temperature-based mix rebalancing (the count^alpha reweighting of
    multilingual/multi-source training mixes): stratum s is kept with
    probability proportional to count(s)^(alpha-1), scaled so the
    largest per-stratum fraction equals `max_fraction` — alpha=1 keeps
    natural proportions, alpha=0 equalizes expected counts across
    strata, values between damp the head and boost the tail.

    Selection reuses the deterministic hash filter (stratified_sample),
    so the draw is engine/rerun-stable and nested across alphas with
    the same ordering guarantees. Two passes: a stratum-count aggregate
    (tiny result, collected to compute fractions) then the pure per-row
    filter — the same shape any weighted sampler needs, with no
    second shuffle of the fact data.
    """
    if not (0.0 <= alpha <= 1.0):
        raise ValueError(f"alpha must be in [0,1], got {alpha}")
    counts = {
        r[0]: r[1]
        for r in df.groupBy(strata_col).count().collect()
    }
    if not counts:
        return df
    # weight per ROW ∝ count^(alpha-1); normalize so max fraction hits cap
    weights = {s: float(n) ** (alpha - 1.0) for s, n in counts.items()}
    top = max(weights.values())
    fractions = {s: max_fraction * w / top for s, w in weights.items()}
    return stratified_sample(
        df, strata_col, fractions, unique_key,
        default_fraction=0.0, num_buckets=num_buckets,
    )


def weighted_sample(
    df: DataFrame,
    k: int,
    weight_col: str,
    unique_key: str = "doc_id",
    strata: Sequence[str] = (),
    salt: str = "wrs",
) -> DataFrame:
    """Weighted sampling without replacement (Efraimidis-Spirakis
    A-ES): within each stratum, keep the k rows with the largest
    u^(1/w) — equivalently the largest ln(u)/w — where u is a uniform
    draw per row. Inclusion probability is proportional to weight, the
    standard one-pass scheme for weighted training-mix selection.

    Determinism: u is NOT random() — it is a 52-bit dyadic rational
    derived from md5(salt|key) ((bits + 0.5) / 2^52, exactly
    representable), so reruns and external engines draw the SAME u;
    the selection score rounds to 9 digits with a total tie-break on
    the key (the tf-idf ln contract, docs/ORACLE_PARITY.md). Rows with
    NULL or non-positive weight are excluded (they have probability 0).

    Scale: one window shuffle keyed on the strata — identical cost to
    any per-group top-k; no collect, no iteration.
    """
    from pyspark.sql import Window

    key = F.col(unique_key).cast("string")
    bits = F.conv(
        F.substring(F.md5(F.concat(F.lit(salt + "|"), key)), 1, 13), 16, 10
    ).cast("long")
    u = (bits.cast("double") + F.lit(0.5)) / F.lit(float(1 << 52))
    w = F.col(weight_col).cast("double")
    score = F.round(F.log(u) / w, 9)
    win = Window.partitionBy(*[F.col(s) for s in strata]).orderBy(
        F.desc("__wrs_score"), F.asc(unique_key)
    )
    return (
        df.where(w.isNotNull() & (w > 0))
        .withColumn("__wrs_score", score)
        .withColumn("__wrs_rank", F.row_number().over(win))
        .where(F.col("__wrs_rank") <= k)
        .withColumnRenamed("__wrs_score", "sample_score")
        .withColumnRenamed("__wrs_rank", "sample_rank")
    )


def plan_mixture(
    df: DataFrame,
    source_col: str,
    token_col: str,
    weights: Dict[str, int],
    token_budget: int,
    unique_key: Sequence[str] = ("doc_id",),
    num_buckets: int = 1_000_000,
):
    """Token-budget mixture planner — the Pile/Dolma/C4 mixture shape:
    given target mixture weights over sources and a total token budget,
    compute per-source token targets and sampling rates, then apply
    them with the deterministic hash filter.

    Allocation is two-phase integer water-filling (all DIV arithmetic,
    engine-replayable):
      phase 1: alloc_s = budget * w_s DIV W. Sources whose available
               tokens fit inside their allocation are *deficit* — they
               contribute everything they have.
      phase 2: the budget left after taking deficit sources whole is
               redistributed over the surplus sources by renormalized
               weights (one pass; a source that saturates during
               redistribution is capped at its availability without
               further cascading — documented fixed-depth choice so an
               external engine replays it as two CTEs, not a loop).

    Selection is rate = target*num_buckets DIV avail applied as
    hash(key) % num_buckets < rate — the same md5/Knuth-mix family as
    stratified_sample, so the draw is rerun/engine-stable and the
    sampled token count concentrates tightly around the target.

    Scale: one groupBy over the fact table (combinable sum), all
    planning on the BOUNDED per-source frame (two single-row aggregates
    broadcast back — no driver collect), and the plan joins back to the
    corpus as a broadcast hash join feeding a scan-stage filter.

    Returns (plan, sampled): plan = (source, wgt, tokens_avail,
    tokens_target, keep_buckets); sampled = the surviving input rows.
    Sources absent from `weights` are excluded (weight 0).
    """
    from xorq_spark.operators.localframe import lit_table

    spark = df.sparkSession
    w = lit_table(
        spark,
        sorted((s, int(wt)) for s, wt in weights.items()),
        f"{source_col} string, wgt long",
    )
    tot = df.groupBy(source_col).agg(
        F.sum(F.col(token_col).cast("long")).alias("tokens_avail")
    )
    j = tot.join(F.broadcast(w), source_col)
    wsum = j.agg(F.sum("wgt").alias("__W"))
    p1 = j.crossJoin(F.broadcast(wsum)).withColumn(
        "__alloc1", F.expr(f"({token_budget} * wgt) div __W")
    ).withColumn("__deficit", F.col("tokens_avail") <= F.col("__alloc1"))
    lft = p1.agg(
        (
            F.lit(token_budget).cast("long")
            - F.coalesce(
                F.sum(F.when(F.col("__deficit"), F.col("tokens_avail"))),
                F.lit(0),
            )
        ).alias("__leftover"),
        F.coalesce(
            F.sum(F.when(~F.col("__deficit"), F.col("wgt"))), F.lit(0)
        ).alias("__W2"),
    )
    plan = (
        p1.crossJoin(F.broadcast(lft))
        .withColumn(
            "tokens_target",
            F.when(F.col("__deficit"), F.col("tokens_avail")).otherwise(
                F.least(
                    F.col("tokens_avail"),
                    F.when(
                        F.col("__W2") > 0,
                        F.expr("(__leftover * wgt) div __W2"),
                    ).otherwise(F.lit(0)),
                )
            ).cast("long"),
        )
        .withColumn(
            "keep_buckets",
            F.when(
                F.col("tokens_target") >= F.col("tokens_avail"),
                F.lit(num_buckets),
            )
            .otherwise(
                F.expr(f"(tokens_target * {num_buckets}) div tokens_avail")
            )
            .cast("long"),
        )
        .select(source_col, "wgt", "tokens_avail", "tokens_target", "keep_buckets")
    )
    sampled = (
        df.join(
            F.broadcast(plan.select(source_col, "keep_buckets")), source_col
        )
        .where(_key_hash(list(unique_key)) % num_buckets < F.col("keep_buckets"))
        .drop("keep_buckets")
    )
    return plan, sampled


def dsir_score(
    df: DataFrame,
    target_df: DataFrame = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    buckets: int = 4096,
    smoothing: int = 1,
    target_pred=None,
) -> DataFrame:
    """DSIR — Data Selection with Importance Resampling (Xie et al.
    2023): score every raw document by how much more likely its hashed
    n-gram features are under a small in-domain *target* corpus than
    under the raw corpus itself. The classic recipe for carving a
    domain-matched slice (e.g. "wiki-like") out of a 100 TB crawl:
    rank by the importance log-ratio, then keep the top slice or
    resample proportionally (compose with `weighted_sample`).

    Model (hashed bag of unigrams+bigrams, add-`smoothing` Laplace):
        feature f  -> bucket b = md5_52bit(f) % buckets
        lambda[b]  = ln p_target[b] - ln p_raw[b]
        score(doc) = sum over doc feature occurrences of lambda[b]

    Determinism contract (the lm_score/nb_classify pattern,
    docs/ORACLE_PARITY.md): each per-bucket log-probability is ln of a
    rational of exact integer counts, rounded to 9 digits and
    quantized to BIGINT nano-nats; lambda is an integer difference and
    every per-document sum is integer, so accumulation order cannot
    perturb scores or the induced ranking. Feature hashing uses the
    same 52-bit md5 prefix as `weighted_sample`, replayable as
    ('0x' || substr(md5(f),1,13))::BIGINT in ANSI SQL.

    Scale: the raw corpus is tokenized ONCE per pass, map-side only —
    bucket counts are two combinable groupBy-aggregates whose result
    is bounded by `buckets` (never vocabulary- or corpus-sized); the
    lambda table broadcasts (buckets rows); scoring joins the exploded
    feature stream against that broadcast map-side and reduces with
    ONE doc-keyed combinable aggregation. No collect, no window, no
    iteration; selection downstream is a distributed TakeOrdered
    (orderBy+limit), never a global sort.

    Returns (id_col, n_feats, score_nano): one row per raw document
    with at least one feature; score_nano is the total importance
    log-ratio in integer nano-nats (divide by 1e9 for nats).
    """
    if buckets < 2 or smoothing < 1:
        raise ValueError("buckets must be >= 2 and smoothing >= 1")

    def _toks(c):
        return F.filter(
            F.split(F.trim(F.lower(F.coalesce(F.col(c), F.lit("")))), r"\s+"),
            lambda x: x != "",
        )

    # unigrams + bigrams over an array column; guard size<2 because
    # Spark's sequence(1, 0) infers step -1 (DuckDB's range(1,1) is
    # naturally empty — the guard keeps the engines aligned)
    def _feats(tok_col):
        big = F.when(
            F.size(tok_col) >= 2,
            F.transform(
                F.sequence(F.lit(1), F.size(tok_col) - 1),
                lambda i: F.concat(
                    F.element_at(tok_col, i),
                    F.lit(" "),
                    F.element_at(tok_col, i + F.lit(1)),
                ),
            ),
        ).otherwise(F.array().cast("array<string>"))
        return F.concat(tok_col, big)

    def _bucket(c):
        bits = F.conv(F.substring(F.md5(c), 1, 13), 16, 10).cast("long")
        return F.pmod(bits, F.lit(buckets))

    def _nano(x):
        return F.round(F.log(x) * F.lit(1e9), 0).cast("long")

    spark = df.sparkSession
    from xorq_spark.operators.partitioning import widen as _widen

    # STAGE the token array in its own projection before any lambda
    # touches it: feeding the _toks() EXPRESSION into _feats' lambdas
    # re-evaluates the whole regex split per element_at (the
    # gopher_repetition O(n^2) re-inline trap — measured 27s vs ~2s at
    # sf0.1). The explode then references a materialized array column.
    # Rebalance first: feature hashing is compute-bound and a small
    # parquet file scans as one split (minhash precedent).
    if target_pred is not None:
        # target is a predicate over `df` itself (the common DSIR
        # shape: the in-domain slice of the corpus being scored) —
        # derive the target occurrence stream from the ONE
        # materialized raw stream instead of re-tokenizing the slice
        # (guide §2.4: identical tokens, one fewer corpus pass).
        raw_occ = (
            _widen(df)
            .select(
                F.col(id_col).alias("__id"),
                target_pred.alias("__tgt"),
                _toks(text_col).alias("__t"),
            )
            .select(
                "__id", "__tgt", F.explode(_feats(F.col("__t"))).alias("__feat")
            )
            .select("__id", "__tgt", _bucket(F.col("__feat")).alias("__b"))
            .localCheckpoint(eager=True)
        )
        tgt_occ = raw_occ.where(F.col("__tgt"))
    else:
        tgt_occ = (
            _widen(target_df)
            .select(_toks(text_col).alias("__t"))
            .select(F.explode(_feats(F.col("__t"))).alias("__feat"))
            .select(_bucket(F.col("__feat")).alias("__b"))
        )
        # materialize the raw occurrence stream ONCE (nb_classify
        # pattern): the bucket-count aggregate and the scoring join
        # both consume it
        raw_occ = (
            _widen(df)
            .select(F.col(id_col).alias("__id"), _toks(text_col).alias("__t"))
            .select("__id", F.explode(_feats(F.col("__t"))).alias("__feat"))
            .select("__id", _bucket(F.col("__feat")).alias("__b"))
            .localCheckpoint(eager=True)
        )

    ct = tgt_occ.groupBy("__b").agg(F.count(F.lit(1)).alias("__ct"))
    cr = raw_occ.groupBy("__b").agg(F.count(F.lit(1)).alias("__cr"))
    tot_t = ct.agg(F.coalesce(F.sum("__ct"), F.lit(0)).alias("__tt"))
    tot_r = cr.agg(F.coalesce(F.sum("__cr"), F.lit(0)).alias("__tr"))

    dom = spark.range(buckets).select(F.col("id").alias("__b"))
    s = F.lit(int(smoothing))
    sb = F.lit(int(smoothing) * int(buckets))
    lam = (
        dom.join(ct, "__b", "left")
        .join(cr, "__b", "left")
        .crossJoin(F.broadcast(tot_t))
        .crossJoin(F.broadcast(tot_r))
        .select(
            "__b",
            (
                _nano(
                    (F.coalesce(F.col("__ct"), F.lit(0)) + s).cast("double")
                    / (F.col("__tt") + sb).cast("double")
                )
                - _nano(
                    (F.coalesce(F.col("__cr"), F.lit(0)) + s).cast("double")
                    / (F.col("__tr") + sb).cast("double")
                )
            ).alias("__lam"),
        )
    )
    return (
        raw_occ.join(F.broadcast(lam), "__b")
        .groupBy("__id")
        .agg(
            F.count(F.lit(1)).alias("n_feats"),
            F.sum("__lam").alias("score_nano"),
        )
        .select(F.col("__id").alias(id_col), "n_feats", "score_nano")
    )


def interleave_sources(
    df: DataFrame,
    source_col: str = "source",
    unique_key: str = "doc_id",
    salt: str = "ilv",
) -> DataFrame:
    """Deterministic source-interleaved training order — the shard-mix
    step after mixture planning: rather than concatenating sources
    (which makes training see one domain for hours), emit a global
    `position` that round-robins across sources (all sources' 1st
    documents, then all 2nd, ...), with the WITHIN-source order a
    deterministic md5 shuffle and the ACROSS-source order at each rank
    alphabetical. Sources of different sizes drain naturally: an
    exhausted source just stops contributing ranks.

    Scale design — NO global sort/window (a partition-less
    row_number is the single-task straggler this repo bans): because
    (rank, source) is unique, the global position has a CLOSED FORM
    from the bounded per-source counts n_t:

        position(r, s) = 1 + sum_t min(n_t, r-1) + |{t < s : n_t >= r}|

    (rows ahead with a smaller rank, plus same-rank rows from
    alphabetically earlier sources). One bounded-partition window per
    source + a per-row expression over the collected k-source count
    table (the temperature_sample precedent) — scan-stage, zero extra
    shuffle, engine-replayable.

    Returns (position, rank_in_source, source_col, unique_key).
    """
    from pyspark.sql import Window

    counts = sorted(
        (r[0], r[1])
        for r in df.groupBy(source_col).count().collect()
        if r[0] is not None
    )
    key = F.col(unique_key).cast("string")
    h = F.md5(F.concat(F.lit(salt + "|"), key))
    w_src = Window.partitionBy(source_col).orderBy(
        F.col("__h"), F.col(unique_key)
    )
    r = F.col("rank_in_source")
    ahead = F.lit(0).cast("long")
    for src_val, n in counts:
        ahead = ahead + F.least(F.lit(int(n)), r - 1).cast("long")
        ahead = ahead + F.when(
            (F.lit(src_val) < F.col(source_col)) & (F.lit(int(n)) >= r),
            F.lit(1),
        ).otherwise(F.lit(0)).cast("long")
    return (
        df.select(source_col, unique_key)
        .where(F.col(source_col).isNotNull())
        .withColumn("__h", h)
        .withColumn("rank_in_source", F.row_number().over(w_src))
        .drop("__h")
        .withColumn("position", (ahead + 1).cast("long"))
        .select("position", "rank_in_source", source_col, unique_key)
    )
