"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
SHORT JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"sf": ..., "n_queries": N, "artifact": "BENCH_LAST.json"}. The full
per-query map is written to BENCH_LAST.json beside this file (stdout
stays under ~1 KB so the driver's tail capture can never truncate it).

Each query is materialized with the noop sink (full execution of every
output column, no driver collect) after a warm-up of the Spark session.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "tpch_q1_pricing_summary",
    "tpch_q3_shipping_priority",
    "tpch_q5_local_supplier_volume",
    "tpch_q6_forecast_revenue",
    "tpch_q10_returned_items",
    "tpch_q18_large_volume_customer",
    "tpch_q7_volume_shipping",
    "tpch_q13_customer_distribution",
    "tpch_q19_discounted_revenue",
    "join_asof_backward",
    "join_theta_range",
    "window_rank_dense",
    "sub_scalar_correlated",
    "dedup_minhash_lsh_pairs",
    "dedup_minhash_components",
    "dedup_exact_text",
    "sim_ann_bruteforce_topk",
    "sim_ann_lsh_topk",
    "text_quality_score",
    "mm_extract_features",
    # round 3 additions (new operators; per-query numbers above stay
    # comparable across rounds, the total line gains these three)
    "text_chunk_documents",
    "text_stratified_sample",
    "sim_embedding_quantize",
    # round 3, second batch: corpus-curation tier (multi-shuffle
    # digest-keyed designs — the 100 TB-representative shapes)
    "text_line_dedup",
    "dedup_dup_ngram_fraction",
    # round 3, third batch: non-equi join via bin discretization (the
    # cartesian-trap shape, keyless)
    "join_range_binned",
    # round 4: iterative graph algorithm (integer-exact PageRank, 3
    # shuffle-join rounds) and the CCNet bigram-LM perplexity scorer
    # (model-build shuffles + bigram-keyed scoring join)
    "graph_pagerank_parts",
    "text_lm_perplexity",
    # round 4, second batch: Gopher repetition rules (zero-shuffle HOF
    # scan), integer-exact KMeans + SemDeDup (iterative + bounded
    # cluster-keyed pair join), NB classifier (token-keyed scoring
    # join), SCD2 history (one-shuffle two-window)
    "text_gopher_repetition",
    "cluster_semdedup",
    "text_nb_classifier",
    "time_scd2_history",
    # round 4, third batch: crawl-ingest tier (regex pipelines at scan
    # speed) + real codec decodes
    "text_url_normalize",
    "text_html_extract",
    "mm_decode_avi_frames",
    "mm_image_dhash_pairs",
    "time_zscore_anomaly",
    # round 5: mergeable quantile sketch (bounded-size percentile path),
    # BM25 inverted-index retrieval + hybrid RRF fusion, label-
    # propagation communities (second iterative graph shape), exact
    # per-group winsorization
    "agg_hdr_quantiles",
    "text_bm25_topk",
    "text_rrf_hybrid",
    "graph_label_propagation",
    "time_winsorize_values",
    # round 5, second batch: triangle counting (degree-oriented wedge
    # closure — the m^(3/2)-bounded graph-density shape) and CDC
    # snapshot reconciliation (one full-outer keyed shuffle)
    "graph_triangle_counts",
    "rel_snapshot_diff",
    # round 5, third batch: token-budget mixture planning (water-fill
    # + hash-filter realization) and quantile-thresholded k-core
    "text_mixture_plan",
    "graph_kcore_prune",
    # round 5, fourth batch: KMV/theta sketch set ops (two k-row
    # sketches answer audience overlap), batch gap-sessionization
    # (single-shuffle dual-window), CMS-prefiltered exact heavy
    # hitters (candidates-only shuffle), PQ ANN (code-scan + ADC LUT)
    "agg_kmv_overlap",
    "time_sessionize",
    "text_heavy_hitters",
    "sim_ann_pq_topk",
    # round 5, fifth batch: point-in-time join (one-sort-shuffle asof
    # kernel vs. the interval-filter trap), incremental aggregate
    # maintenance (keys-sized merge, facts never rescanned), stride-1
    # ExactSubstr spans (digest-only shuffle + gaps-and-islands merge)
    "join_point_in_time",
    "agg_incremental_refresh",
    "dedup_exact_substring",
    # + cross-source quantile calibration (bounded distinct-cumsum
    # grid) and trailing-window distinct via daily HLL sketch unions
    "text_score_calibrate",
    "agg_hll_rolling",
    # + MMR diversity re-ranking (retrieval tier complete:
    # BM25 -> RRF -> MMR)
    "text_mmr_rerank",
    # + deterministic Poisson bootstrap (the B-fold combinable
    # explode shape) and ExactSubstr corpus rewrite
    "agg_bootstrap_ci",
    "dedup_strip_spans",
    # round 5, sixth batch: journey/survival analytics tier — user-
    # keyed band-join attribution, interval-ownership exact rolling
    # distinct, per-user lifetime Kaplan-Meier, distinct-cumsum
    # Gini/HHI concentration, 16-lag dyadic EWMA
    "time_attribution_credit",
    "time_rolling_distinct_exact",
    "time_kaplan_meier",
    "agg_gini_hhi",
    "time_ewma_dyadic",
    # round 6: DSIR hashed-n-gram importance selection (two bounded
    # bucket aggregates + broadcast-lambda map-side scoring) and REAL
    # lossless-WebP decode (VP8L prefix codes + transform inversion in
    # Arrow-batched workers)
    "text_dsir_select",
    "mm_decode_webp_stats",
    # round 6 (cont.): randomization test (ONE wide 2B-sum aggregate),
    # FIM pretraining transform (zero-shuffle projection), margin-based
    # bitext mining (broadcast all-pairs + integer kNN sums)
    "agg_permutation_test",
    "text_fim_transform",
    "sim_bitext_mining",
    # round 7: REAL progressive-JPEG (SOF2) decode — successive
    # approximation + EOB-run coding in Arrow-batched workers
    "mm_decode_jpeg_progressive",
    # round 7 (cont.): REAL animated-GIF decode (LZW + interlace +
    # canvas composition) and the streaming mSPRT monitor's batch twin
    "mm_decode_gif_stats",
    "agg_msprt_sequential",
    # round 8: REAL FLAC decode (lossless audio — the dominant
    # training-audio container), mojibake repair (ftfy-style inverse,
    # Arrow-batched), unicode normalization (dedup's first transform)
    "mm_decode_flac_stats",
    "text_mojibake_repair",
    "text_unicode_normalize",
    # round 9: Porter-stemmed vocabulary rollup (vocab-sized pandas
    # UDF + postings join), IVF-PQ composed ANN (cell-pruned m-byte
    # code scan), MJPEG-in-AVI per-frame decode, MP3 stream audit
    "text_stem_vocab",
    "sim_ann_ivfpq_topk",
    "mm_decode_mjpeg_frames",
    "mm_probe_mp3_stats",
    "mm_extract_pdf_text",
]

# Measurement policy (revised round 4 for driver reproducibility —
# round 3's driver run showed a uniform ~1.2-1.9x inflation vs the
# builder's numbers on identical code, i.e. measurement conditions,
# not plans): one FULL untimed pass of the whole headline list (pays
# every query's codegen + first-touch I/O), then THREE timed passes
# with per-query min, clearing cached relations + forcing a JVM GC
# between passes so one pass's garbage doesn't tax the next. Min
# across 3 spaced samples is the steady-state plan cost; a loaded
# host inflates a pass, not all three.


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 8))
    os.environ.setdefault("XORQ_SPARK_SHUFFLE_PARTITIONS", str(max(int(cpus), 32)))

    from xorq_spark.session import connect
    from xorq_spark.queries import QUERIES

    # Size the (local-mode) JVM explicitly: with no setting Spark runs a
    # 1 GiB driver heap, and a 32-thread run over 50 queries at sf0.1
    # lives at the edge of it — broadcast builds fail sporadically and
    # GC pressure inflates timings run-to-run. Applied at connect() so
    # it reaches spark-submit before the JVM launches; harmless if the
    # driver pre-created the session (conf is then a no-op).
    spark = connect(
        master=f"local[{cpus}]",
        app_name="xorq_spark_bench",
        extra_conf={
            "spark.driver.memory": os.environ.get(
                "SPARK_GRAFT_DRIVER_MEM", "24g"),
            # pin worker reuse explicitly (default true, but the mm_*
            # 2.2x driver-session swings in round 5 pointed at Python-
            # worker lifecycle; make the intended mode part of the
            # recorded contract rather than an ambient default)
            "spark.python.worker.reuse": "true",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")

    # Warm up the JVM/codegen paths the queries use (plain long agg,
    # decimal agg, shuffle) so per-query numbers measure the query, not
    # first-touch code generation.
    import pyspark.sql.functions as F

    spark.range(1_000_000).selectExpr(
        "sum(id)",
        "cast(sum(cast(id as decimal(18,2)) * cast(0.05 as decimal(8,4))) as decimal(38,10))",
    ).collect()
    spark.range(100_000).groupBy((F.col("id") % 7).alias("k")).count().collect()
    # Fork the Python worker pool (one worker per core, each importing
    # pandas/pyarrow) so mapInPandas queries measure compute, not
    # first-touch interpreter startup. The warm-up batch carries a
    # binary column and imports numpy inside the worker — the shape the
    # multimodal codec queries use — so their first timed pass doesn't
    # pay worker-side first-touch either.
    def _warm_workers(it):
        import numpy as np  # noqa: F401  (codec queries use numpy)

        for pdf in it:
            yield pdf

    spark.range(int(cpus) * 4).repartition(int(cpus)).selectExpr(
        "id", "cast(repeat('x', 64) as binary) as payload"
    ).mapInPandas(
        _warm_workers, "id long, payload binary"
    ).write.mode("overwrite").format("noop").save()

    names = [n for n in HEADLINE if n in QUERIES]

    def unpersist_rdds():
        # localCheckpoint() blocks (graph tier, kmeans, CC) are RDD-level
        # persists that catalog.clearCache() never touches; left alone
        # they accumulate across queries and passes, squeeze execution
        # memory, and inflate every later iterative query's timings.
        try:
            it = spark.sparkContext._jsc.sc().getPersistentRDDs().iterator()
            while it.hasNext():
                it.next()._2().unpersist(False)
        except Exception:
            pass

    def jvm_gc_ms():
        try:
            beans = (
                spark._jvm.java.lang.management.ManagementFactory
                .getGarbageCollectorMXBeans()
            )
            return sum(
                beans.get(i).getCollectionTime()
                for i in range(beans.size())
            )
        except Exception:
            return -1

    def jit_ms():
        # accumulated JVM JIT (C1/C2) compilation time — the cold-pass
        # hypothesis for >2x pass swings on queries with very large
        # generated expression trees (bitext cosine, permutation's
        # 128-sum update row): per-query DELTAS make it observable.
        try:
            return (
                spark._jvm.java.lang.management.ManagementFactory
                .getCompilationMXBean().getTotalCompilationTime()
            )
        except Exception:
            return -1

    def codegen_compiles():
        # whole-stage-codegen compilation count (Janino), from Spark's
        # CodegenMetrics source; a nonzero delta on pass 2+ means the
        # generated-class cache missed (plan not reused across passes).
        try:
            cm = getattr(
                getattr(
                    spark._jvm.org.apache.spark.metrics.source,
                    "CodegenMetrics$",
                ),
                "MODULE$",
            )
            return cm.METRIC_COMPILATION_TIME().getCount()
        except Exception:
            return -1

    _CLK = os.sysconf("SC_CLK_TCK") if hasattr(os, "sysconf") else 100

    def sys_cpu_sec():
        # system-wide busy CPU seconds (all cores summed) from
        # /proc/stat: user+nice+system+irq+softirq+steal
        try:
            with open("/proc/stat") as f:
                parts = f.readline().split()
            j = [int(x) for x in parts[1:9]]
            busy = j[0] + j[1] + j[2] + j[5] + j[6] + j[7]
            return busy / _CLK
        except Exception:
            return -1.0

    def _jvm_pids():
        # our Spark JVM(s): java processes with spark on the command
        # line. Found via /proc because the MXBean route
        # (getProcessCpuTime) does NOT exist through py4j on this JDK
        # — it failed silently inside the old try/except, so
        # ext_cpu_sec's FLOOR was our own JVM burn (round-9 finding:
        # the round-8 "external contention" readings conflated the
        # two; spikes above the floor were still real deltas).
        pids = set()
        try:
            for p in os.listdir("/proc"):
                if not p.isdigit():
                    continue
                try:
                    with open(f"/proc/{p}/cmdline", "rb") as f:
                        cmd = f.read()
                except OSError:
                    continue
                argv0 = cmd.split(b"\x00", 1)[0]
                if argv0.endswith(b"java") and b"spark" in cmd.lower():
                    pids.add(int(p))
        except Exception:
            pass
        return pids

    def tree_cpu_sec(extra_pids=()):
        # CPU seconds consumed by OUR process tree: this interpreter
        # (getrusage), the Spark JVM(s) and the pyspark daemon/worker
        # processes (utime+stime from /proc/<pid>/stat). sys_cpu_sec
        # minus this is CPU burned by SOMETHING ELSE on the host — the
        # external-contention signal that attributes a pass-time spike
        # to the machine, not the plan.
        total = 0.0
        try:
            ru = __import__("resource")
            me = ru.getrusage(ru.RUSAGE_SELF)
            total += me.ru_utime + me.ru_stime
        except Exception:
            pass
        for pid in set(extra_pids) | _jvm_pids():
            try:
                with open(f"/proc/{pid}/stat") as f:
                    st = f.read().rsplit(")", 1)[1].split()
                total += (int(st[11]) + int(st[12])) / _CLK
            except Exception:
                pass
        return total

    def pyspark_worker_pids():
        # live pyspark.daemon/worker processes — a pid-set CHANGE between
        # two samples means workers were torn down and respawned (the
        # round-5 mm_* regression hypothesis, now observable per query)
        pids = set()
        try:
            for p in os.listdir("/proc"):
                if not p.isdigit():
                    continue
                try:
                    with open(f"/proc/{p}/cmdline", "rb") as f:
                        cmd = f.read()
                except OSError:
                    continue
                if b"pyspark.daemon" in cmd or b"pyspark.worker" in cmd:
                    pids.add(int(p))
        except Exception:
            pass
        return pids

    def run_one(name, diag=None):
        fn = QUERIES[name]
        if diag is not None:
            gc0, pids0 = jvm_gc_ms(), pyspark_worker_pids()
            jit0, cg0 = jit_ms(), codegen_compiles()
            sys0, tree0 = sys_cpu_sec(), tree_cpu_sec(pids0)
            wall0 = time.time()
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        df.write.mode("overwrite").format("noop").save()
        dt = time.perf_counter() - t0
        if diag is not None:
            pids1 = pyspark_worker_pids()
            d = diag.setdefault(
                name,
                {
                    "sec": [],
                    "gc_ms": [],
                    "worker_spawns": [],
                    "jit_ms": [],
                    "codegen_compiles": [],
                    "t0": [],
                    "load1": [],
                    "ext_cpu_sec": [],
                },
            )
            d["sec"].append(round(dt, 3))
            d["gc_ms"].append(jvm_gc_ms() - gc0)
            d["worker_spawns"].append(len(pids1 - pids0))
            d["jit_ms"].append(jit_ms() - jit0)
            d["codegen_compiles"].append(codegen_compiles() - cg0)
            # external-contention attribution: wall-clock start (spikes
            # across queries in one sweep window correlate in time),
            # 1-min loadavg, and CPU seconds the pass burned that our
            # process tree did NOT (system busy minus JVM+workers+self)
            d["t0"].append(round(wall0, 1))
            try:
                d["load1"].append(round(os.getloadavg()[0], 1))
            except Exception:
                d["load1"].append(-1.0)
            ext = (sys_cpu_sec() - sys0) - (tree_cpu_sec(pids0 | pids1) - tree0)
            d["ext_cpu_sec"].append(round(max(ext, 0.0), 1))
        unpersist_rdds()  # outside the timer; next query starts clean
        return dt

    def settle():
        # drop anything a query pinned and let the JVM collect it so
        # pass N's garbage isn't charged to pass N+1's timings
        spark.catalog.clearCache()
        unpersist_rdds()
        try:
            spark._jvm.System.gc()
        except Exception:
            pass

    # Untimed steady-state pass: pays every query's whole-stage codegen
    # compilation, parquet footer reads, and Python-worker imports.
    for name in names:
        run_one(name)
    settle()

    # Three timed passes, per-query min, a full suite apart.
    timings = {}
    diag = {}
    for _ in range(3):
        for name in names:
            dt = run_one(name, diag)
            if name not in timings or dt < timings[name]:
                timings[name] = dt
        settle()
    # ext_cpu-aware retry (round 9): a query whose EVERY timed pass ran
    # under external CPU contention (min ext_cpu_sec elevated) AND
    # whose passes disagree >1.5x never produced a clean steady-state
    # sample — its min is machine noise, not plan cost (round 8's
    # text_dsir_select: all three passes at ext_cpu 35-39 vs ~13
    # quiet). Re-run just those queries, up to twice; a retry only
    # lowers the recorded min, never raises it, and the extra passes
    # land in BENCH_DIAG (>3 entries = retried query, attributable
    # from the artifact).
    for _retry in range(2):
        flagged = [
            n
            for n in names
            if len(diag[n]["sec"]) >= 3
            and max(diag[n]["sec"]) > 1.5 * max(min(diag[n]["sec"]), 1e-9)
            and min(diag[n]["ext_cpu_sec"]) > 5.0
        ]
        if not flagged:
            break
        for name in flagged:
            dt = run_one(name, diag)
            if dt < timings[name]:
                timings[name] = dt
        settle()

    timings = {k: round(v, 3) for k, v in timings.items()}

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    result = {
        "metric": "headline_queries_total_runtime",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }
    here = os.path.dirname(os.path.abspath(__file__))
    # the result goes to a FILE as well as stdout: round 5's driver
    # artifact was truncated mid-key and unparseable — the file is the
    # recovery path. Per-query per-pass raw seconds, JVM GC deltas and
    # Python-worker respawn counts land beside it so a timing swing is
    # diagnosable from artifacts alone.
    with open(os.path.join(here, "BENCH_LAST.json"), "w") as f:
        json.dump(result, f)
        f.write("\n")
    with open(os.path.join(here, "BENCH_DIAG.json"), "w") as f:
        json.dump(
            {
                "conf": {
                    "cpus": int(cpus),
                    "sf_dir": sf_dir,
                    "python_worker_reuse": spark.conf.get(
                        "spark.python.worker.reuse", "unset"
                    ),
                    "driver_memory": spark.conf.get(
                        "spark.driver.memory", "unset"
                    ),
                    "legend": {
                        "t0": "wall-clock pass start (epoch sec); spikes"
                        " across queries that share a time window point"
                        " at the machine, not the plans",
                        "load1": "1-min loadavg at pass start",
                        "ext_cpu_sec": "CPU-seconds burned during the"
                        " pass by processes OUTSIDE our JVM+worker+"
                        "driver tree; >> 0 on a slow pass = external"
                        " contention (named cause), ~0 = look at"
                        " gc/jit/codegen columns",
                        "retries": "a query with more than 3 entries"
                        " per column was re-run because every timed"
                        " pass showed >1.5x spread with elevated"
                        " ext_cpu_sec (no clean sample); retries can"
                        " only lower the recorded min",
                    },
                },
                "per_query": diag,
            },
            f,
            indent=1,
        )
        f.write("\n")
    # stdout gets a SHORT headline object (<1 KB no matter how many
    # queries the headline grows to): the driver's tail-capture window
    # front-truncated the full per-query map in rounds 5 and 6, leaving
    # BENCH_r{N}.json unparseable. The full map lives in BENCH_LAST.json
    # (written above); stdout carries the totals plus a pointer.
    print(json.dumps(stdout_headline(result)))


def stdout_headline(result):
    """The short stdout form of a full bench result (tested <1 KB)."""
    return {
        "metric": result["metric"],
        "value": result["value"],
        "unit": result["unit"],
        "sf": result["sf"],
        "n_queries": len(result["queries"]),
        "artifact": "BENCH_LAST.json",
    }


if __name__ == "__main__":
    main()
