"""Plan-quality regression tests: the properties PLANS.md documents,
asserted. A correctness-preserving change that drops predicate pushdown,
column pruning, or a broadcast join should fail here, not show up as a
silent slowdown at scale."""

from __future__ import annotations

import pytest

from xorq_spark.queries import QUERIES

SF_DIR = "/root/testdata/sf0.001"


def _plan(spark, name: str) -> str:
    df = QUERIES[name](spark, SF_DIR)
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def _plan_unpinned(spark, name: str) -> str:
    """Build with pinned_order disabled: the round-9 pin before a final
    global sort hides the compute subtree behind a localCheckpoint's
    Scan ExistingRDD, so plan-shape assertions inspect the unpinned
    form (the pin is row- and order-preserving by construction)."""
    import os

    prev = os.environ.get("XORQ_PIN_ORDER")
    os.environ["XORQ_PIN_ORDER"] = "0"
    try:
        return _plan(spark, name)
    finally:
        if prev is None:
            os.environ.pop("XORQ_PIN_ORDER", None)
        else:
            os.environ["XORQ_PIN_ORDER"] = prev


def test_q6_pushdown_and_pruning(spark):
    plan = _plan(spark, "tpch_q6_forecast_revenue")
    # Range predicates reach the parquet reader...
    assert "GreaterThanOrEqual(l_shipdate" in plan
    assert "LessThan(l_quantity" in plan
    # ...and the scan reads only the 4 referenced columns.
    import re

    m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    assert m, plan
    cols = [c.split(":")[0] for c in m.group(1).split(",")]
    assert sorted(cols) == [
        "l_discount", "l_extendedprice", "l_quantity", "l_shipdate",
    ]


def test_q3_broadcasts_customer(spark):
    plan = _plan(spark, "tpch_q3_shipping_priority")
    assert "BroadcastHashJoin" in plan
    # The big fact tables must not cartesian/nested-loop.
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_q5_star_join_all_broadcast(spark):
    """Dims (region/nation/supplier/customer) broadcast; no sort-merge
    join should appear at this scale."""
    plan = _plan(spark, "tpch_q5_local_supplier_volume")
    assert plan.count("BroadcastHashJoin") >= 3
    assert "SortMergeJoin" not in plan


def test_no_python_eval_in_jvm_queries(spark):
    """Hot relational queries stay JVM-side: no row-at-a-time Python."""
    for name in (
        "tpch_q1_pricing_summary",
        "dedup_minhash_lsh_pairs",
        "text_quality_score",
    ):
        plan = _plan(spark, name)
        assert "BatchEvalPython" not in plan, name


def test_q1_whole_stage_codegen(spark):
    """The q1 scan+project+partial-agg pipeline compiles into at least
    one whole-stage-codegen subtree (AQE hides the spans in `formatted`
    mode before execution, so ask for codegen mode explicitly)."""
    df = QUERIES["tpch_q1_pricing_summary"](spark, SF_DIR)
    df.collect()  # AQE finalizes the physical plan only on execution
    final = df._jdf.queryExecution().executedPlan().toString()
    assert "isFinalPlan=true" in final
    # '*(n)' prefixes mark whole-stage-codegen'd operators in toString.
    assert "*(" in final


def test_suite_union_preserves_branch_plans(spark):
    """A composite suite is a UNION ALL of member plans; Catalyst must
    optimize each branch exactly as it does the standalone query —
    pushdown reaches every parquet scan and dimension joins still
    broadcast. Guards the driver-facing suite layer against plan
    regressions."""
    plan = _plan(spark, "suite_tpch_a")
    pushed = [
        ln for ln in plan.splitlines()
        if "PushedFilters: [" in ln and "PushedFilters: []" not in ln
    ]
    assert len(pushed) >= 10  # q1-q5 branches each push scan filters
    assert plan.count("BroadcastHashJoin") >= 10
    assert "BatchEvalPython" not in plan


def test_chunk_documents_scan_speed_shape(spark):
    """Chunking is scan -> explode with no shuffle before the Generate:
    the only exchanges are the final presentation sort."""
    import re

    plan = _plan_unpinned(spark, "text_chunk_documents")
    assert "Generate" in plan
    # column pruning: only doc_id + text reach the scan
    m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    cols = sorted(c.split(":")[0] for c in m.group(1).split(","))
    assert cols == ["doc_id", "text"]
    # no Python evaluation anywhere (pure HOFs)
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    # the Generate (explode) runs in the scan pipeline: the only
    # exchange upstream of it is the deliberate widen() rebalance
    # (lower node numbers execute first in the formatted plan)
    gen = int(re.search(r"\((\d+)\) Generate", plan).group(1))
    upstream_exchanges = [
        int(n) for n in re.findall(r"\((\d+)\) Exchange", plan) if int(n) < gen
    ]
    assert len(upstream_exchanges) <= 1, plan


def test_stratified_sample_filter_at_scan_stage(spark):
    """The per-row hash predicate evaluates in the scan stage (no
    pre-filter shuffle), and pruning keeps the scan at 3 columns."""
    import re

    plan = _plan(spark, "text_stratified_sample")
    m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    cols = sorted(c.split(":")[0] for c in m.group(1).split(","))
    assert cols == ["doc_id", "lang", "n_chars"]
    # Filter sits directly on the scan (node (2) over scan (1)),
    # upstream of every exchange
    m2 = re.search(r"\((\d+)\) Filter", plan)
    m3 = re.search(r"\((\d+)\) Exchange", plan)
    assert m2 and m3 and int(m2.group(1)) < int(m3.group(1))
    assert "(1) Scan parquet" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_quantize_no_shuffle_no_python(spark):
    """Quantization is a pure projection: HOFs only, no Python eval, no
    aggregation shuffle — exchanges exist only for the output sort."""
    plan = _plan_unpinned(spark, "sim_embedding_quantize")
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "HashAggregate" not in plan
    import re

    m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    cols = sorted(c.split(":")[0] for c in m.group(1).split(","))
    assert cols == ["embedding", "vec_id"]


def test_pagerank_no_cartesian_no_python(spark):
    """PageRank materializes its iterations through eager
    localCheckpoints (so the returned plan is checkpoint-backed — an
    ExistingRDD scan, no parquet ReadSchema to assert here; pruning is
    the explicit 2-column select feeding the first checkpoint). The
    final plan must still be free of Python eval and CartesianProduct,
    and the checkpoint boundary must actually be there — without it the
    nested iteration DAG re-derives the edge table once per reference."""
    plan = _plan(spark, "graph_pagerank_parts")
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "CartesianProduct" not in plan
    assert "ExistingRDD" in plan or "LocalTableScan" in plan


def test_lm_perplexity_shape(spark):
    """The LM scorer reads at most (doc_id, text), keeps everything
    JVM-side, and attaches the vocab scalar by broadcast — no
    CartesianProduct, no Python eval. Since round 9 the tokenized
    frame is pinned behind a localCheckpoint (tokenize once for the
    bigram stream AND the vocab count), so the text column's parquet
    scan lives inside the checkpoint materialization: the final plan
    shows the ExistingRDD boundary plus a doc_id-only parquet scan for
    the left-join spine — pruning is the explicit 2-column select
    feeding the checkpoint (the pagerank-test convention)."""
    plan = _plan(spark, "text_lm_perplexity")
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "CartesianProduct" not in plan
    assert "ExistingRDD" in plan
    import re

    cols = sorted(
        {
            c.split(":")[0]
            for m in re.findall(r"ReadSchema: struct<([^>]*)>", plan)
            for c in m.split(",")
            if c
        }
    )
    assert set(cols) <= {"doc_id", "text"} and "doc_id" in cols


def test_scd2_single_shuffle_two_windows(spark):
    """SCD2's two window passes must share ONE sort/exchange on the
    user key — a second Exchange means the change-detection and
    interval-stitching frames diverged."""
    plan = _plan(spark, "time_scd2_history")
    # exactly one HASH exchange (the second Exchange in the plan is the
    # demo query's global orderBy — rangepartitioning, not a shuffle of
    # the windowed computation)
    n_ex = plan.count("hashpartitioning(")
    assert n_ex == 1, f"expected 1 hash exchange, found {n_ex}"
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_url_and_html_scan_speed_shape(spark):
    """The crawl-ingest regex ops are pure scans: no join, no
    aggregate exchange beyond the demo window/sort, no Python."""
    for name in ("text_html_extract",):
        plan = _plan(spark, name)
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
        assert "CartesianProduct" not in plan
        assert "SortMergeJoin" not in plan and "BroadcastHashJoin" not in plan


def test_nb_classifier_broadcasts_class_table(spark):
    """The (doc x class) grid must come from a BROADCAST of the tiny
    class table — a shuffled cross join here would be the 100 TB
    killer."""
    plan = _plan(spark, "text_nb_classifier")
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
    assert "CartesianProduct" not in plan


def test_semdedup_no_cartesian(spark):
    """SemDeDup's pair phase is cluster-keyed (GEMM per group) — no
    all-pairs anywhere in the plan."""
    plan = _plan(spark, "cluster_semdedup")
    assert "CartesianProduct" not in plan


def test_dhash_pairs_band_keyed(spark):
    """Image near-dup candidates come from band-keyed equi-joins —
    CartesianProduct would mean the blocking broke."""
    plan = _plan(spark, "mm_image_dhash_pairs")
    assert "CartesianProduct" not in plan


def test_zscore_anomaly_single_window_exchange(spark):
    plan = _plan(spark, "time_zscore_anomaly")
    assert plan.count("hashpartitioning(") == 1
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_bm25_broadcasts_query_terms(spark):
    """The inverted-index join ships the (query, term) list to the
    postings, never the reverse; the corpus must not nested-loop."""
    plan = _plan(spark, "text_bm25_topk")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "PythonUDF" not in plan and "BatchEvalPython" not in plan


def test_rrf_fusion_bounded_no_corpus_shuffle(spark):
    """Fusion operates on bounded top-k lists; no cartesian, no
    Python, and the final ranking is one window."""
    plan = _plan(spark, "text_rrf_hybrid")
    assert "CartesianProduct" not in plan
    assert "PythonUDF" not in plan and "BatchEvalPython" not in plan


def test_winsorize_broadcast_bounds(spark):
    """The per-group bounds table joins back via broadcast — the
    corpus itself is never shuffled for the clamp."""
    plan = _plan(spark, "time_winsorize_values")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_hdr_sketch_combinable_build(spark):
    """Sketch build is a partial+final hash aggregate over integer
    shift bucketing — JVM-side, map-side combinable."""
    plan = _plan_unpinned(spark, "agg_hdr_quantiles")
    assert "HashAggregate" in plan
    assert "PythonUDF" not in plan and "BatchEvalPython" not in plan
    assert "CartesianProduct" not in plan


def test_label_propagation_no_cartesian_no_python(spark):
    plan = _plan(spark, "graph_label_propagation")
    assert "CartesianProduct" not in plan
    assert "PythonUDF" not in plan and "BatchEvalPython" not in plan


def test_attribution_joins_on_user_equi_key(spark):
    """The touch-conversion join must be a hash/merge EQUI-join on the
    user key with the time band as a residual predicate — never a
    nested-loop range join."""
    plan = _plan(spark, "time_attribution_credit")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_running_sum_window_is_partitioned(spark):
    """The two-level prefix operator (operators/prefix.py) must never
    put the data-sized window on a single partition: its running-sum
    Window is keyed on the range-partition id (hashpartitioning), and
    the only SinglePartition window is the bounded #partitions-rows
    offsets frame. (The unbounded-domain cumsum sites — AUC, lift,
    ABC, KS, Mann-Whitney, stump gain — all route through this
    operator; its own plan is asserted because their localCheckpoint
    truncates the visible plan.) Also: value parity with the naive
    single-partition window."""
    import pyspark.sql.functions as F
    from pyspark.sql import Window

    from xorq_spark.operators.prefix import running_sum

    df = spark.range(1, 1001).select(
        (F.col("id") * 37 % 997).alias("v"),
        (F.col("id") % 7 + 1).alias("c"),
    ).groupBy("v").agg(F.sum("c").alias("c"))
    out = running_sum(df, "v", "c", "cum")
    plan = out._sc._jvm.PythonSQLUtils.explainString(
        out._jdf.queryExecution(), "formatted"
    )
    assert "hashpartitioning(__pid" in plan, plan
    naive = df.withColumn(
        "cum",
        F.sum("c").over(
            Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
        ).cast("long"),
    )
    got = {(r.v, r.cum) for r in out.collect()}
    want = {(r.v, r.cum) for r in naive.collect()}
    assert got == want


def test_link_prediction_no_edge_self_join(spark):
    """Wedges come from the array-side pair HOF; the only joins are
    the anti-join against existing edges and the bounded degree
    joins — no cartesian anywhere."""
    plan = _plan(spark, "graph_link_prediction")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_kaplan_meier_single_user_pass(spark):
    """The lifetime table is built by ONE grouped pass (struct-min +
    max): no window over users, and the only nested-loop is the
    1-row global-max broadcast."""
    plan = _plan(spark, "time_kaplan_meier")
    assert "Window" not in plan
    # formatted explain lists each operator in both the tree and the
    # details section — one crossJoin appears twice
    assert plan.count("BroadcastNestedLoopJoin") <= 2


def test_line_dedup_no_digest_window(spark):
    """Round-6 de-skew: per-line doc-frequency must be an aggregate +
    membership join, NOT count-over-Window.partitionBy(digest) — window
    partitions cannot be skew-split by AQE, so one hot boilerplate line
    used to serialize into a single sort task."""
    plan = _plan(spark, "text_line_dedup")
    assert "Window" not in plan, plan


def test_dup_ngram_fraction_no_digest_window(spark):
    plan = _plan(spark, "dedup_dup_ngram_fraction")
    assert "Window" not in plan, plan


def test_exact_substring_digest_count_is_join_not_window(spark):
    """The gram-duplication count attaches via a digest-keyed semi join
    (skew-splittable); the only Window nodes left are the doc-keyed
    gaps-and-islands pair."""
    import re

    plan = _plan(spark, "dedup_exact_substring")
    # every Window node partitions by doc_id, never by the gram digest
    for m in re.finditer(r"Arguments: .*windowspecdefinition\(([^,]*),", plan):
        assert "dig" not in m.group(1), m.group(0)
    # and the duplication filter is a semi join on the digest
    assert "LeftSemi" in plan, plan


def test_positional_join_no_single_partition_sort(spark):
    """Round-7 fix: positional row numbering routes through
    operators/prefix.py global_row_number — both sides range-repartition
    on their order keys and rank partition-locally; the only
    SinglePartition frame is the bounded #partitions-row offsets table.
    A partition-less Window.orderBy here funnels BOTH full tables
    through one sort task each."""
    import pyspark.sql.functions as F

    from xorq_spark.operators import positional_join

    a = spark.range(0, 500).select(F.col("id").alias("x"))
    b = spark.range(0, 500).select(F.col("id").alias("y"))
    out = positional_join(a, b, ["x"], ["y"])
    plan = out._sc._jvm.PythonSQLUtils.explainString(
        out._jdf.queryExecution(), "formatted"
    )
    # the data-sized windows are keyed on the range-partition id
    assert "hashpartitioning(__pid" in plan, plan
    # value parity with the naive single-partition construction
    got = sorted((r.x, r.y) for r in out.collect())
    assert got == [(i, i) for i in range(500)]


def test_dup_span_detect_no_digest_window(spark):
    """Round-7 de-skew: cross-document span frequency is a combinable
    groupBy(digest) + join-back, not collect_set over a digest-keyed
    Window — one boilerplate span must not serialize its whole id set
    into a single window task."""
    plan = _plan(spark, "dedup_dup_span_detect")
    assert "Window" not in plan, plan


def test_derive_query_terms_distributed_topk(spark):
    """Round-7 fix: the query-term derivation ranks the distinct-term
    table — billions of rows on a web corpus — so the top-k must be
    TakeOrderedAndProject (per-partition heaps, k-row merge), never a
    partition-less row_number over the whole vocabulary. The only
    Window left runs on the k-row result."""
    import pyspark.sql.functions as F

    from xorq_spark.functions.retrieval import derive_query_terms

    docs = spark.read.parquet(SF_DIR + "/documents.parquet")
    out = derive_query_terms(docs, n_queries=3, terms_per_query=3)
    plan = out._sc._jvm.PythonSQLUtils.explainString(
        out._jdf.queryExecution(), "formatted"
    )
    assert "TakeOrderedAndProject" in plan, plan


def test_hdr_quantiles_exact_cumsum_is_partitioned(spark):
    """Round-8 fix: the exact type-1 quantile reference cumsums over
    the DISTINCT-value table — unbounded by data (millions of distinct
    prices at sf100) — so it must route through operators/prefix.py
    running_sum (range-partitioned, window keyed on __pid), never a
    partition-less Window.orderBy('v'). The streaming twin shares the
    construction; its plan is asserted by source inspection because
    executing it drains a streaming sink."""
    import inspect
    import re

    plan = _plan_unpinned(spark, "agg_hdr_quantiles")
    # Round-9 form: the exact arm routes through
    # rank_select_from_counts — NO window runs over the unbounded
    # distinct-value table at all. Any windowspec ordering by v would
    # be the partition-less cumsum regression; the only remaining
    # single-partition cumsums order by bounded frames (the <=2k-row
    # sketch bucket table's lo_int, and the coarse `v div 4096`
    # histogram __b, bounded by key-space granularity).
    for m in re.finditer(r"windowspecdefinition\(([^)]*)\)", plan):
        spec = m.group(1)
        assert not re.search(r"\bv ASC", spec), m.group(0)
    assert "__b" in plan, plan

    from xorq_spark.queries import streaming_queries

    src = inspect.getsource(streaming_queries.stream_hdr)
    assert "running_sum" in src
    assert "Window.orderBy" not in src


def test_triangle_counts_single_attach_join_suffix_sliced(spark):
    """Round-8 refinement: each adjacency row regenerates its own
    oriented edges via posexplode and slices the s-side suffix in-row
    BEFORE the t-keyed exchange — the former o ⋈ A(s) attach join is
    gone (one adjacency attach remains), and the shuffled s-side array
    cells drop from sum(deg²) to sum(deg·(deg−1)/2)."""
    import pyspark.sql.functions as F

    from xorq_spark.functions.graph import triangle_counts

    # force the shuffle path (bound=0) so the join structure is visible
    edges = spark.range(0, 300).select(
        (F.col("id") % 40).alias("src"), (F.col("id") % 37 + 3).alias("dst")
    )
    out = triangle_counts(edges, broadcast_edge_bound=0)
    plan = out._sc._jvm.PythonSQLUtils.explainString(
        out._jdf.queryExecution(), "formatted"
    )
    import re as _re

    joins = _re.findall(
        r"\(\d+\) (?:SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin)", plan
    )
    assert len(joins) <= 2, (joins, plan)
    assert "slice(" in plan and "posexplode" in plan, plan
