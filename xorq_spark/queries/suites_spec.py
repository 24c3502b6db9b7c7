"""Composite-suite membership: which granular catalog queries fold into
which driver-facing suite entry.

Why suites exist: the external correctness driver hash-checks only the
FIRST 50 entries of ``queries()``. The granular catalog has 130+
entries, so most operator families would never earn a driver-green row.
Each suite re-expresses several granular queries in one canonical
(part, k*, n*, d*) schema — VARCHAR / BIGINT / DOUBLE slots only, the
three types with proven engine-independent hashing — and UNION ALLs
them, so one driver row certifies every member. The granular entries
stay registered after the window for per-operator auditability
(tools/check_oracle.py checks all of them).

Canonicalization is type-routed per column (sorted by name):
strings/dates/flattened arrays -> k-slots, integers/booleans/epoch-us
timestamps -> n-slots, doubles -> d-slots. The SQL side needs the
oracle's column types ahead of time; tools/gen_suite_types.py captures
them into suites_types.py and asserts the Spark-side routing agrees.
"""

from __future__ import annotations

import pyspark.sql.functions as F

# suite name -> granular member query names (insertion order = driver
# window order; every §2 family and LLM-pipeline op appears here).
SUITES: dict[str, list[str]] = {
    "suite_tpch_a": [
        "tpch_q1_pricing_summary",
        "tpch_q2_min_cost_supplier",
        "tpch_q3_shipping_priority",
        "tpch_q4_order_priority",
        "tpch_q5_local_supplier_volume",
    ],
    "suite_tpch_b": [
        "tpch_q6_forecast_revenue",
        "tpch_q7_volume_shipping",
        "tpch_q8_market_share",
        "tpch_q9_product_type_profit",
        "tpch_q10_returned_items",
    ],
    "suite_tpch_c": [
        "tpch_q11_important_stock",
        "tpch_q12_late_priority_lines",
        "tpch_q13_customer_distribution",
        "tpch_q14_promo_revenue",
        "tpch_q15_top_supplier",
    ],
    "suite_tpch_d": [
        "tpch_q16_supplier_part_counts",
        "tpch_q17_small_quantity_revenue",
        "tpch_q18_large_volume_customer",
        "tpch_q19_discounted_revenue",
        "tpch_q20_excess_shippers",
    ],
    "suite_tpch_e": [
        "tpch_q21_waiting_suppliers",
        "tpch_q22_global_sales_opportunity",
    ],
    "suite_subqueries": [
        "sub_exists_correlated",
        "sub_not_exists_anti",
        "sub_in_uncorrelated",
        "sub_scalar_uncorrelated",
        "sub_scalar_correlated",
    ],
    "suite_rel_sets_a": [
        "rel_distinct",
        "rel_distinct_on_keep_first",
        "rel_union_all",
        "rel_union_distinct",
    ],
    "suite_rel_sets_b": [
        "rel_intersect",
        "rel_except",
        "rel_except_all",
        "rel_intersect_all",
    ],
    "suite_rel_shape": [
        "rel_limit_offset",
        "rel_sample_deterministic",
        "rel_fill_drop_null",
        "rel_value_counts",
        "hist_bucket",
        # round 4 (cont.): declarative data-quality gate (dbt-tests /
        # expectations shape, one scan for all row rules)
        "rel_validate_quality",
        # round 5 (cont.): CDC-style snapshot reconciliation (one
        # full-outer keyed shuffle, map-side null-safe column compare)
        "rel_snapshot_diff",
        # + pre-join explosion/skew diagnostic (exact output
        # cardinality without running the join)
        "rel_join_explosion",
        # + column-profile drift gate (one aggregate pass per side:
        # nulls + exact distincts; ppm deltas on the bounded frame)
        "rel_profile_diff",
        # + 2-D Pareto frontier (skyline) without the O(n^2) dominance
        # self-join; oracle is the implementation-independent NOT EXISTS
        "rel_pareto_frontier",
        # round 5 (cont.): ABC/Pareto 80/95 revenue classification off
        # the distinct-revenue cumsum (tie-safe, no entity sort)
        "rel_abc_pareto",
    ],
    "suite_rel_pivot": [
        "rel_pivot_wider",
        "rel_pivot_longer",
        "rel_describe_stats",
        # round 5 (cont.): k-anonymity audit over a quasi-identifier
        # combination (the privacy-assessment gate beside DP release)
        "rel_kanonymity_check",
        # + referential-integrity audit (dbt relationships test:
        # anti-join orphan counts over four FK chains)
        "rel_fk_integrity",
    ],
    "suite_window_rank": [
        "window_rank_dense",
        "window_percent_cume",
        "window_lag_lead",
        "window_first_last_nth",
    ],
    "suite_window_frames": [
        "window_moving_rows_frame",
        "window_range_frame",
        "window_cumulative",
        "window_agg_over_partition",
        "window_topk_per_group",
    ],
    "suite_func_strings": [
        "func_strings",
        "func_regex",
        "func_url_extract",
    ],
    "suite_func_numeric": [
        "func_math",
        "func_bitwise",
        "func_case_null",
        "func_hash_digests",
    ],
    "suite_agg_a": [
        "agg_stats_moments",
        "agg_quantiles",
        "agg_argminmax_firstlast",
        "agg_any_value_deterministic",
        # round 5 (cont.): pairwise association mining — exact ppm
        # support/confidence + HUGEINT lift, array-side pair generation
        "agg_market_basket",
        # + CUPED variance-reduced experiment readout (exact HUGEINT
        # sufficient stats; doubles derived by identical IEEE trees)
        "agg_cuped_readout",
        # round 5 (cont.): SQL-standard regr_* OLS family (one
        # combinable cross-moment pass, agg_stats rounding convention)
        "agg_regression",
        # + RFM segmentation (tie-safe value-level quintiles off
        # two-level cumsums; no NTILE row-lottery)
        "agg_rfm_segmentation",
        # + Wilson 95% score interval (exact n/k; one IEEE tree)
        "agg_wilson_ci",
        # + Hill tail-index over per-group top-50 order stats
        # (sorted-array ln fold; the power-law diagnostic)
        "agg_hill_tail_index",
        # + survey raking / IPF (3 fixed rounds, e6-quantized weights
        # on the bounded cell frame; both margins calibrated)
        "agg_ipf_raking",
        # + quantile treatment effects (distributional A/B readout)
        "agg_quantile_treatment_effect",
        # + index of dispersion (the is-it-Poisson gate) and exact
        # 5%-trimmed mean (rank-interval arithmetic, no per-row sort)
        "agg_overdispersion",
        "agg_trimmed_mean",
        # + Lorenz curve at population deciles (the Gini's plot)
        "agg_lorenz_deciles",
        # + exact WEIGHT-mass quantiles (type-1 rank arithmetic off a
        # distinct-value weight cumsum; the corpus never sorts)
        "agg_weighted_quantiles",
        # + Benford first-digit audit (integer ppm + chi-square
        # contributions; first digit from the BIGINT string form)
        "agg_benford_digits",
        # + Welch's unequal-variance t-test (exact integer sufficient
        # stats; t and df as fixed IEEE trees)
        "agg_welch_ttest",
        # round 6: Gini + HHI concentration (folded in for driver
        # certification — was registry-tail-only through round 5)
        "agg_gini_hhi",
        # round 6: sample-ratio-mismatch gate (chi-square goodness-of-
        # fit in exact integer ppm, designed-but-empty cells included)
        "agg_srm_check",
    ],
    "suite_agg_b": [
        "agg_bit_bool",
        "agg_group_concat_collect",
        "agg_count_distinct",
        "agg_filtered_where",
        "agg_rollup",
        "agg_cube",
        "agg_grouping_sets",
        "agg_hll_sketch",
        # round 4: engine-mirrored count-min sketch (heavy hitters)
        "agg_countmin_sketch",
        # + Bloom membership filter (join pruning; no-false-negative
        # guarantee certified as an always-true column)
        "agg_bloom_filter",
        # round 5: mergeable log-linear quantile sketch (HDR/exponential-
        # histogram family — the 100 TB percentile path; bracket + merge
        # + error-geometry certified in-query)
        "agg_hdr_quantiles",
        # + KMV/theta sketch: mergeable distinct sketch with SET-OP
        # estimates (intersection/union/Jaccard of key sets — the thing
        # HLL cannot do); merge rebuild + exact ground truth in-query
        "agg_kmv_overlap",
        # + 2x2 chi-square A/B readout (integer-rational ppm statistic)
        "agg_chi2_abtest",
        # + incremental aggregate maintenance from a CDC delta (the
        # materialized-view refresh: delta pre-agg + one keys-sized
        # full-outer merge, fact table never rescanned)
        "agg_incremental_refresh",
        # + trailing-7-day rolling distinct via daily HLL sketch
        # unions (dashboards update by merging one new sketch, raw
        # data never rescanned; exact counts oracle-pinned)
        "agg_hll_rolling",
        # + deterministic Poisson bootstrap CI (md5 inverse-CDF
        # weights — a bootstrap an external engine can replay)
        "agg_bootstrap_ci",
        # + exact Mann-Whitney U (doubled-integer tied ranks off the
        # distinct-cumsum table; tie-corrected z as an IEEE tree)
        "agg_mann_whitney",
        # + seeded-Laplace DP-mechanism noisy counts (deterministic
        # md5 inverse-CDF noise off a precomputed midpoint table)
        "agg_dp_noisy_counts",
        # + exact mode with deterministic tie-break (max_by over an
        # encoded (count, -value) key — identical on both engines)
        "agg_mode_exact",
        # + price/volume revenue-bridge decomposition (FP&A shape;
        # per-part rational unit prices, sign-split volume effect)
        "agg_price_volume_mix",
        # round 6: difference-in-differences readout (landed in the
        # final round-5 commit after suite folding; certified now)
        "agg_diff_in_diff",
        # round 6: randomization test (64 Carter-Wegman relabelings in
        # ONE wide aggregate; exact exceedance count + p-value)
        "agg_permutation_test",
        # round 7: always-valid sequential test (mSPRT) — per-day
        # mixture likelihood ratio off prefix-op running arm totals
        "agg_msprt_sequential",
    ],
    "suite_time_a": [
        "time_trunc_extract",
        "time_extract_time_parts",
        "time_format_parse",
        "time_arithmetic",
        # round 5 (cont.): journey analytics tier — Markov transition
        # matrix, multi-touch attribution (first/last/linear ppm),
        # exact 7-day rolling distinct (interval-ownership trick),
        # dyadic alpha=1/2 EWMA (integer FIR), and Kaplan-Meier weekly
        # survival with censoring (integer product limit)
        "time_markov_transitions",
        "time_attribution_credit",
        "time_rolling_distinct_exact",
        "time_ewma_dyadic",
        "time_kaplan_meier",
        # + cohort LTV matrix (bounded cohort x offset cumulative) and
        # seasonal-naive forecast eval (MAE/SMAPE/MASE integer ppm)
        "time_cohort_ltv",
        "time_forecast_eval",
        # + business-day lead time (closed-form serial business index,
        # no calendar table)
        "time_business_days",
        # + calendar-aligned YoY monthly growth (sign-split ppm)
        "time_yoy_growth",
        # + MAU growth accounting (new/retained/resurrected/churned)
        "time_growth_accounting",
        # + PSI drift (Laplace-smoothed, e9-quantized IEEE terms)
        "time_psi_drift",
    ],
    "suite_time_b": [
        "time_tumble_window",
        "time_hop_window",
        "time_between_time",
        "time_unix_roundtrip",
        "time_session_window",
        "time_resample_ffill",
        "time_funnel_steps",
        "time_retention_cohorts",
        # round 4 (cont.): SCD2 history builder (dbt-snapshot / CDC
        # compaction shape, one-shuffle two-window plan)
        "time_scd2_history",
        # round 5 (cont.): exact two-sample KS drift (unbinned sup-norm
        # companion of histogram_drift; bounded distinct-cumsum table)
        "time_ks_drift",
        # + TWAP (interval-weighted mean, HUGEINT rational) and peak
        # concurrency (sweep-line +1/-1 running sum, half-open ends)
        "time_twap",
        "time_max_concurrency",
        # + OHLC bars (one combinable struct-min/max aggregate) and
        # integer-exact CUSUM changepoint (max |N*S_t - t*S_N|)
        "time_ohlc_bars",
        "time_cusum_changepoint",
        # + rolling z-score anomaly detection (pipeline health metric)
        "time_zscore_anomaly",
        # round 5: per-group winsorization (exact type-1 quantile clamp)
        "time_winsorize_values",
        # + snapshot distribution drift (integer-rational per-bin TVD)
        "time_histogram_drift",
        # + batch gap-sessionization (the streaming session window's
        # historical-backfill twin; one shuffle serves both windows
        # and the per-session aggregate)
        "time_sessionize",
        # round 5 (cont.): robust MAD outlier screen (two exact type-1
        # median picks off distinct-value cumsums; 50% breakdown)
        "time_mad_outliers",
        # + journey pattern mining (MATCH_RECOGNIZE-lite: ordered
        # event-initial string per user + regex motif counts)
        "time_journey_pattern",
        # + hour-of-day seasonality profile (exact 1e-6 hour means +
        # multiplicative seasonal index ppm)
        "time_seasonal_profile",
        # + longest consecutive-day streak (gaps-and-islands, earliest
        # tie-break via min_by over (-len, start))
        "time_longest_streak",
        # + interval-union coverage (merge overlapping intervals; one
        # sort shuffle, strict-prefix running max flags islands)
        "time_interval_merge",
        # + EXACT DTW as a nested integer array fold (no UDF); oracle
        # replays the DP as an anti-diagonal recursive CTE
        "time_dtw_distance",
        # + ACF at lags {1,2,3,6,12,24} (seasonality detector; exact
        # per-lag sufficient stats off the bounded dense spine)
        "time_autocorrelation",
        # + load-peak detection with windowed scale-invariant
        # prominence (leftmost-of-plateau deterministic)
        "time_peak_detection",
        # + SLO error-budget burn (SRE alerting arithmetic) and
        # DAU/MAU stickiness (engagement frequency lens)
        "time_slo_burn",
        "time_stickiness_dau_mau",
        # + Apdex satisfaction rollup (exact (2s+t)/2n ppm)
        "time_apdex_score",
    ],
    "suite_coll_a": [
        "coll_array_basics",
        "coll_array_algebra",
        "coll_array_hof",
        "coll_sequence_zip",
    ],
    "suite_coll_b": [
        "coll_map_ops",
        "coll_struct_pack_unpack",
        "coll_json_extract",
        "coll_unnest_posexplode",
        # round 5 (cont.): Spark 4 VARIANT type — parse_json +
        # variant_get typed paths vs the oracle's JSON extraction
        "coll_variant_extract",
    ],
    "suite_join_outer": [
        "join_left_outer",
        "join_right_outer",
        "join_full_outer",
    ],
    "suite_join_filtering": [
        "join_semi",
        "join_anti",
        "join_any_semi_dedup",
        "join_cross",
    ],
    "suite_join_special": [
        "join_theta_range",
        "join_self_window_share",
        "join_asof_backward",
        "join_positional",
        "join_range_binned",
        # round 4 (cont.): nearest-direction as-of (pandas-compatible,
        # one shuffle, two frames over one sort)
        "join_asof_nearest",
        # round 5 (cont.): point-in-time join against SCD2 validity
        # intervals (feature-store lookup; one-sort-shuffle as-of
        # kernel, NOT a key-join + interval filter)
        "join_point_in_time",
    ],
    "suite_text": [
        "text_token_counts",
        "text_language_id",
        "text_quality_score",
        "text_pii_redaction",
        "text_repetition_ratio",
        "text_char_entropy",
        # round 5: exact heavy hitters via CMS prefilter (boilerplate-
        # phrase detection; two-pass candidates-only shuffle)
        "text_heavy_hitters",
        # + PMI collocations as the integer lift ratio (phrase mining;
        # broadcast unigram lookups, one corpus-sized shuffle)
        "text_pmi_collocations",
        # + exact Spearman rank correlation (doubled-integer tied
        # ranks per column; rho as an identical IEEE tree)
        "text_spearman_len_tokens",
        # round 7: grade-level readability (vowel-group syllables, two
        # IEEE score trees) and code-vs-prose routing signals — both
        # zero-shuffle scan projections
        "text_readability",
        "text_code_detect",
        # round 7 (cont.): encoding-damage (mojibake) detection — the
        # ftfy-class cleanup gate, zero-shuffle
        "text_mojibake_detect",
        # round 8: the ftfy-style REPAIR inverse (iterative sloppy-
        # cp1252 re-encode, closed-form round-trip oracle) and NFC
        # unicode normalization (the first transform of every dedup
        # recipe; DuckDB nfc_normalize replays it) — both zero-shuffle
        "text_mojibake_repair",
        "text_unicode_normalize",
        # round 8 (cont.): sentence segmentation — the unit of
        # sentence-level dedup/quality stages; RE2-portable split
        "text_sentence_split",
        # round 9: Porter (1980) stemming, dual-implemented (pandas-UDF
        # Python vs pure-SQL oracle, 112k-word differential fuzz) —
        # stemmed vocabulary rollup + inflection-collapsing dedup key
        "text_stem_vocab",
        "text_stem_dedup_key",
    ],
    "suite_text_fingerprint": [
        "text_fingerprint",
        "text_rolling_hash",
        "text_token_shards",
        "text_contamination_check",
        "text_chunk_documents",
        "text_stratified_sample",
        # round 6: source-interleaved training order (closed-form global
        # position off bounded per-source counts; no global sort/window)
        "text_interleave_sources",
        "text_source_cap",
        "text_temperature_sample",
        # round 4: Efraimidis-Spirakis weighted sampling (deterministic
        # md5-derived uniform draws, exact selection certified)
        "text_weighted_sample",
        # round 4 (cont.): per-source corpus health report (volume,
        # quartiles, lang entropy, dup rate)
        "text_corpus_report",
        # + canonical-URL dedup key (the crawl pipeline's first pass)
        "text_url_normalize",
        # + HTML->text boilerplate strip (the pass before everything)
        "text_html_extract",
        # round 5 (cont.): token-budget mixture planner (two-phase
        # integer water-filling + hash-filter realization)
        "text_mixture_plan",
        # + cross-source score calibration by global quantile mapping
        # (bounded distinct-cumsum grid, broadcast equi-join back)
        "text_score_calibrate",
        # + length-bucketed inference batch planning (global rank via
        # distinct-length offsets, no global sort; exact waste ppm)
        "text_length_batching",
    ],
    "suite_curation": [
        "text_line_dedup",
        "dedup_dup_ngram_fraction",
        "text_gopher_flags",
        "text_tfidf_topk",
        "text_pack_sequences",
        # round 4: CCNet's perplexity-filtering half (bigram LM score)
        # + character-level long-verbatim-span detection
        "text_lm_perplexity",
        "dedup_dup_span_detect",
        # round 4 (cont.): the Gopher REPETITION rule set (dup lines/
        # paragraphs, top-n-gram and dup-n-gram char coverage)
        "text_gopher_repetition",
        # + the NB classifier (fasttext-style quality/language filter)
        "text_nb_classifier",
        # round 5 (cont.): the ExactSubstr REWRITE — duplicated spans
        # cut from the text, every output character certified
        "dedup_strip_spans",
        # + the C4 cleanup rule set (third named filter set)
        "text_c4_flags",
        # round 5: BM25 inverted-index retrieval (integer-exact Lucene
        # scoring; ranking certified with doc_id tie-break) + hybrid
        # reciprocal-rank fusion over two signal rankings
        "text_bm25_topk",
        "text_rrf_hybrid",
        # round 9: BM25 over Porter-stemmed postings (the recall
        # variant every production retrieval stack ships)
        "text_bm25_stemmed",
        # + MMR diversity re-ranking over BM25 top-10 with real
        # embedding cosine penalties (4 unrolled greedy rounds)
        "text_mmr_rerank",
        # round 5 (cont.): RAKE keyword extraction (stopword-run
        # islands, corpus degree/freq ppm scores)
        "text_rake_keywords",
        # + source vocabulary overlap (Jaccard + overlap coefficient
        # over distinct-token sets; token-keyed pair join)
        "text_source_overlap",
        # + Zipf slope (rank-frequency OLS over the bounded top-k,
        # order-deterministic ln folds; corpus-health fingerprint)
        "text_zipf_slope",
        # + Heaps-law vocabulary growth (first-doc-per-token cumsum;
        # corpus read once, no per-checkpoint rescans)
        "text_heaps_law",
        # round 6: DSIR importance-resampling selection (Xie et al.
        # 2023) — hashed-bigram log-ratio scores in integer nano-nats
        "text_dsir_select",
        # + fill-in-the-middle pretraining transform (deterministic
        # PSM reordering; zero-shuffle projection)
        "text_fim_transform",
        # round 7: WARC ingestion (Common Crawl record format — gzip
        # member split, header/payload framing, HTTP body extraction)
        "text_warc_extract",
        # round 7 (cont.): WebDataset tar-shard ingestion (USTAR walk,
        # key/ext split, whole-shard gzip transport)
        "text_wds_extract",
        # round 7 (cont.): ZIP archive ingestion (central-directory
        # walk, DEFLATE + stored members)
        "text_zip_extract",
        # round 9: stream-compression tier under the containers —
        # gzip (multi-member) / bzip2 / xz, magic-sniffed + stdlib
        # decompressed (functions/compressedio.py; zstd/lz4 named
        # gates)
        "text_compressed_ingest",
    ],
    "suite_dedup_minhash": [
        "dedup_exact_text",
        "dedup_minhash_signatures",
        "dedup_minhash_lsh_pairs",
        "dedup_minhash_components",
        "dedup_minhash_canonical",
        "dedup_incremental_vs_index",
        # round 4: graph tier — integer-exact PageRank (same family as
        # connected components: shuffle-iterated graph algorithms)
        "graph_pagerank_parts",
        # round 4 (cont.): C4's keep-longest canonical selection
        "dedup_canonical_longest",
        # + record linkage: blocked Levenshtein entity resolution
        "dedup_fuzzy_linkage",
        # round 5: label-propagation communities (second graph-tier
        # member beside PageRank; deterministic synchronous voting)
        "graph_label_propagation",
        # + triangle counts / clustering coefficient (degree-oriented
        # wedge closure: m^(3/2)-bounded, skew-immune)
        "graph_triangle_counts",
        # + fixed-round k-core peeling (p25-quantile-derived threshold)
        "graph_kcore_prune",
        # round 5 (cont.): multi-source BFS hop distances (frontier-only
        # joins; crawl-depth-from-seed-set shape) and integer-exact HITS
        # hubs/authorities (DECIMAL(38,0)/HUGEINT L1 normalization)
        "graph_bfs_hops",
        "graph_hits",
        # round 5 (cont.): common-neighbor/Jaccard link prediction
        # (wedge HOF generation, support-pruned before any join)
        "graph_link_prediction",
        # + deterministic md5 random walks (DeepWalk corpus sampler
        # an external engine replays step-for-step)
        "graph_random_walks",
        # + Newman modularity of the LPA communities (exact 1e-9
        # rationals, sign-split; the community-quality gate)
        "graph_modularity",
    ],
    "suite_dedup_sim": [
        "dedup_simhash",
        "dedup_simhash_pairs",
        "dedup_ngram_jaccard_pairs",
        "dedup_embedding_cosine",
        # round 5 (cont.): asymmetric containment (quote/excerpt
        # detection — the direction Jaccard misses)
        "dedup_ngram_containment",
        # prefix-filtered exact set-similarity join (PPJoin) — oracle
        # is the brute-force index, certifying zero lost pairs
        "dedup_jaccard_prefix",
        # recall/precision of LSH banding vs exact ground truth — the
        # go/no-go eval before trusting the index on the full corpus
        "dedup_lsh_eval",
        # round 7: exact LSH banding planner (integrated FP+FN mass per
        # (b, r) factorization; bounded quadrature frame)
        "dedup_lsh_plan",
        # round 8: NFC-normalized exact dedup — composed/decomposed
        # twins of one text must collapse onto the min id (the recipe
        # unicode_normalize exists for, certified end to end)
        "dedup_unicode_normalized",
        # stride-1 exact duplicated-substring spans (Lee et al.
        # ExactSubstr removal ranges; gaps-and-islands merge)
        "dedup_exact_substring",
        # round 5 (cont.): B-cubed extrinsic clustering eval of the
        # blocking key vs exact-text gold (linear, no pair explosion)
        "dedup_bcubed_eval",
        # + dedup yield curve: pair/doc counts swept over 5 Jaccard
        # thresholds in ONE pass of the exact ppm pair table
        "dedup_threshold_sweep",
    ],
    "suite_similarity": [
        "sim_ann_bruteforce_topk",
        "sim_ann_lsh_topk",
        "sim_norms_and_dots",
        # round 6: FaceNet semi-hard triplet selection with hardest-
        # negative fallback (contrastive training-pair builder)
        "sim_triplet_mining",
        # + margin-based bitext mining (ratio margin over k-NN
        # neighborhoods, max-margin + mutuality; parallel-corpus
        # builder)
        "sim_bitext_mining",
        "sim_ann_ivf_fixed_topk",
        "sim_embedding_quantize",
        "sim_ann_lsh_recall",
        "sim_hard_negatives",
        "sim_label_centroids",
        # round 4: semantic eval-set decontamination (broadcast eval)
        "sim_embedding_contamination",
        # round 4 (cont.): integer-exact KMeans + SemDeDup semantic
        # dedup (Abbas et al. 2023) — Lloyd rounds in shifted int64
        "cluster_kmeans_int",
        "cluster_semdedup",
        # + IVF on the integer quantizer (previously the one rows-only
        # registry entry; now fully oracle-certified)
        "sim_ann_ivf_topk",
        # round 5: integer-exact Gram/covariance pass (the distributed
        # half of PCA) + deterministic JL sign projection
        "sim_embedding_gram",
        "sim_random_projection",
        # + product quantization ADC top-k (the FAISS IVF-PQ memory
        # tier: m-byte codes at rest, lookup-table scoring)
        "sim_ann_pq_topk",
        # + PQ recall@10 vs exact integer L2 (quantization-loss gate;
        # both arms replayed by the oracle)
        "sim_pq_recall",
        # round 9: IVF x PQ composed (per-cell codebooks, partition-
        # pruned probes over m-byte codes — the production 100 TB ANN
        # shape) + its recall@10 eval pricing both loss sources at once
        "sim_ann_ivfpq_topk",
        "sim_ivfpq_recall",
        # + Matryoshka dimension-truncation recall (prefix-distance
        # top-10 vs full exact; the serve-at-k-dims go/no-go)
        "sim_matryoshka_recall",
    ],
    "suite_ml": [
        "ml_train_test_split",
        "ml_kfold_assignment",
        "ml_metrics_classification",
        "ml_metrics_regression",
        "ml_metrics_prf",
        "ml_metrics_auc",
        # round 4 (cont.): near-duplicate-aware split (contamination
        # guard: dup clusters never straddle train/eval)
        "ml_leakage_safe_split",
        # round 5 (cont.): Cohen's kappa chance-corrected agreement
        # (classifier-vs-gold gate, all-int64 rationals)
        "ml_metrics_kappa",
        # round 5 (cont.): decile lift/gains table (exact type-1 cuts,
        # global rank without a global sort)
        "ml_metrics_lift",
        # + leave-one-out target encoding and exact equal-frequency
        # binning (the distributed-native feature transforms)
        "ml_target_encoding",
        "ml_quantile_bins",
        # round 5 (cont.): reliability-diagram calibration bins (ppm
        # deciles, ECE contributions — ranking vs probability gate)
        "ml_calibration_bins",
        # + decision-stump Gini gain (exact 1e-12 impurities off the
        # two-level distinct-value cumsum; feature-screening primitive)
        "ml_stump_gain",
        # + Brier score (strictly proper scoring rule, exact 1e-12;
        # calibration + refinement beside the reliability bins)
        "ml_brier_score",
    ],
    "suite_multimodal": [
        "mm_extract_features",
        "mm_frame_sample",
        "mm_resize_plan",
        # round 4: REAL pixel math — pure-stdlib PNG decode certified
        # against closed-form oracles
        "mm_decode_png_stats",
        # round 6: REAL baseline-JPEG decode (pure-stdlib Huffman+DCT,
        # functions/jpegcodec.py) on a DC-exact fixture corpus
        "mm_decode_jpeg_stats",
        # round 6 (cont.): REAL lossless-WebP (VP8L) decode — prefix
        # codes, transforms, LZ77, color cache (functions/webpcodec.py)
        "mm_decode_webp_stats",
        # round 7: REAL progressive-JPEG (SOF2) decode — spectral
        # selection + successive approximation with EOB-run coding
        "mm_decode_jpeg_progressive",
        # round 7 (cont.): REAL animated-GIF decode — LZW, interlace,
        # canvas composition (functions/gifcodec.py)
        "mm_decode_gif_stats",
        "mm_resize_decoded",
        # round 4 (cont.): REAL audio — pure-stdlib RIFF/PCM decode
        # certified against closed-form sample oracles
        "mm_decode_wav_stats",
        # round 8: REAL FLAC decode (fixed/LPC prediction, Rice+RICE2,
        # stereo decorrelation, multi-frame) — lossless, so the WAV
        # twin's closed-form oracle replays it verbatim — plus the
        # decode->resample (integer-exact linear kernel) and
        # decode->VAD-segment chains over the same fixtures
        "mm_decode_flac_stats",
        "mm_audio_resample",
        "mm_audio_energy_segments",
        "mm_decode_avi_frames",
        # round 9: REAL compressed-video decode — MJPG AVIs of real
        # baseline-JPEG frames, container-walked and Huffman+DCT
        # decoded per frame (avi_encode_mjpeg/decode_video_mjpeg)
        "mm_decode_mjpeg_frames",
        # round 9 (cont.): REAL MP3 stream audit — frame walk,
        # side-info parse, CRC-16 verify, Xing/ID3 tags, VBR/duration
        # profile (functions/mp3probe.py; PCM synthesis a named gate)
        "mm_probe_mp3_stats",
        # round 9 (cont.): REAL PDF text extraction — xref walk incl.
        # /Prev incremental chains, Flate streams, BT/ET operators
        # (functions/pdfcodec.py; encryption/xref-streams named gates)
        "mm_extract_pdf_text",
        # round 9 (cont.): REAL DOCX extraction — OPC zip +
        # ElementTree document walk, runs/tabs/breaks/tables
        # (functions/docxcodec.py; CFB/OLE named gate)
        "mm_extract_docx_text",
        # round 9 (cont.): REAL EPUB extraction — OCF mimetype,
        # container.xml -> OPF -> SPINE-ordered XHTML chapters
        # (functions/epubcodec.py; DRM named gate)
        "mm_extract_epub_text",
        # round 9 (cont.): REAL RTF extraction — group-stack
        # tokenizer, destination skip, cp1252/\\uN escapes
        # (functions/rtfcodec.py; \\bin named gate)
        "mm_extract_rtf_text",
        # + perceptual image near-dup (dHash over real decoded pixels)
        "mm_image_dhash_pairs",
        "mm_audio_fp_pairs",
    ],
    "suite_engine_a": [
        "engine_filter_agg",
        "engine_join_groupby",
        "engine_param_default",
        "engine_window_rank",
        # round 5 (cont.): zone-map min/max file-skipping simulation
        # (the data-layout feedback loop for 100 TB scans)
        "engine_zonemap_prune",
    ],
    "suite_engine_b": [
        "engine_sql_view",
        "engine_pandas_udf",
        "engine_split_deferred",
        "engine_cached_subtree",
        "engine_selectors_across",
        "engine_zorder_keys",
        # round 5 (cont.): Spark 4 native Python UDTF (lateral
        # table-function flat-map surface)
        "engine_python_udtf",
    ],
    # round 6: batch-readout composite over ALL streaming queries —
    # each member runs its Structured Streaming pipeline to a drained
    # memory sink and returns the sink as a batch frame, so the same
    # UNION ALL canonicalization certifies every streaming operator in
    # one driver row (previously 7 of 9 burned individual window slots
    # and stream_hdr_quantiles / stream_heavy_hitters had none).
    "suite_streaming": [
        "stream_tumble_event_counts",
        "stream_hop_event_counts",
        "stream_session_user_visits",
        "stream_dedup_user_ids",
        "stream_enrich_customer",
        "stream_stream_purchase_click",
        "stream_dedup_incremental",
        "stream_hdr_quantiles",
        "stream_heavy_hitters",
        # round 7: streaming always-valid A/B monitor (mSPRT readout
        # over the incremental daily-arm state store)
        "stream_msprt_daily",
    ],
}

# Members whose raw output can't be slot-routed directly (array<double>
# has engine-dependent string formatting) get a pre-transform applied on
# BOTH sides before routing. Multiset semantics make an index-free
# explode sound: multiplicity is preserved, order never mattered.
PRE_SPARK = {
    "agg_quantiles": lambda df: df.select(
        "l_returnflag", "med", "q25", "med_disc", F.explode("qs").alias("q")
    ),
    "sim_label_centroids": lambda df: df.select(
        "label", "n", F.posexplode("centroid").alias("dim", "c")
    ),
}

PRE_SQL = {
    "agg_quantiles": lambda sql: (
        "SELECT l_returnflag, med, q25, med_disc, UNNEST(qs) AS q "
        f"FROM ({sql}) _pre"
    ),
    "sim_label_centroids": lambda sql: (
        "SELECT label, n, unnest(range(0, len(centroid))) AS dim, "
        f"unnest(centroid) AS c FROM ({sql}) _pre"
    ),
}

# Granular entries that stay individually inside the driver's 50-slot
# window. Since round 6 the streaming queries certify through the
# suite_streaming composite (their pipelines drain to memory sinks and
# read back as batch frames), freeing 6 slots — promoted to flagship
# operators with known-portable oracles so the driver certifies them
# DIRECTLY on top of their suite membership.
WINDOW_GRANULAR = [
    # flagship operators ALSO get individual driver rows (every one is
    # suite-certified too, so promotion/rotation never loses coverage)
    "text_line_dedup",
    "dedup_dup_ngram_fraction",
    "text_pack_sequences",
    "dedup_incremental_vs_index",
    "join_range_binned",
    "engine_zorder_keys",
    # round 6 promotions into the slots freed by suite_streaming
    # (34 suites + 16 granular = exactly 50)
    "dedup_jaccard_prefix",
    "graph_triangle_counts",
    "agg_bootstrap_ci",
    "text_bm25_topk",
    "time_kaplan_meier",
    "sim_ann_pq_topk",
    # round 8 promotions (rotated in for text_warc_extract and
    # dedup_lsh_plan, which stay green through suite_curation/
    # suite_dedup_sim): the FLAC decoder and the mojibake repairer
    "mm_decode_flac_stats",
    "text_mojibake_repair",
    # round 9 promotions (rotated in for mm_decode_jpeg_progressive
    # and agg_msprt_sequential, which stay green through
    # suite_multimodal/suite_agg_b): the MP3 stream prober — this
    # round's headline gate-closer — and the dual-implemented Porter
    # stemmer's vocabulary rollup
    "mm_probe_mp3_stats",
    "text_stem_vocab",
]
