"""Benchmark harness (driver contract): run the headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and print ONE JSON line.

Each query is materialized through the noop sink (full computation,
no driver-side collect) and timed wall-clock. The headline set covers
every operator family: scan/filter/agg, broadcast + fact-fact joins,
windows, pivot, streaming batch-twins, text analysis, dedup
(exact + MinHash-LSH), similarity search, multimodal mapInPandas.
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
    "tpch_q5_regional_revenue",
    "tpch_q6_forecast_revenue",
    "j1_broadcast_join",
    "j2_fact_fact_join",
    "w1_topk_per_group",
    "a4_pivot_agg",
    "a7_hash_split",
    "j5_asof_join",
    "t1_tumbling_window",
    "t3_session_window",
    "text_token_stats",
    "text_fingerprint",
    "dedup_exact",
    "dedup_minhash_pairs",
    "sim_topk_bruteforce",
    "mm_media_metadata",
    "tpch_q17_small_qty_revenue",
    "j_funnel_click_purchase",
    "j6_interval_join",
    "a8_group_normalize",
    # r02 additions (VERDICT item 10): approximate scale paths +
    # quality scoring + the codegen'd SimHash now perf-tracked
    "sim_topk_lsh",
    "sim_topk_ivf",
    "text_quality",
    "dedup_simhash_pairs",
    "mm_wav_decode",
    "o1_global_sort",
    # r02 second batch: corpus statistics / retrieval scoring /
    # scrubbing / CDC merge / tokenizer induction / image decode /
    # embedding compression — the new [N] operators perf-tracked
    "text_tfidf_topk",
    "text_bm25",
    "text_pii_redact",
    "text_bigram_merges",
    "j_cdc_merge",
    "mm_bmp_decode",
    "emb_quantize_int8",
    # r02b batch: PQ-ANN, sketch rollups, stateful EWMA, Unicode NFC,
    # entropy, SCD2 history, salted join — perf-tracked
    "sim_topk_pq",
    "a_sketch_rollup",
    "a_ewma_user",
    "text_unicode_normalize",
    "a_user_entropy",
    "p_scd2_history",
    "j_skew_salted_join",
    # r02c batch: composed IVFPQ, corpus-LM perplexity, bitmap exact
    # distinct, per-group OLS fitting
    "sim_topk_ivfpq",
    "text_unigram_ppl",
    "a_bitmap_distinct",
    "a_grouped_ols",
    # r03: compressed-image decode (stdlib inflate+unfilter)
    "mm_png_decode",
    # r04 (VERDICT r03 item 3): slowest still-untracked families —
    # image resize, audio features, graph fixpoint, embedding dedup,
    # encoders, rolling sketch window
    "mm_image_resize",
    "mm_wav_energy",
    "g_connected_components",
    "dedup_embedding",
    "enc_feature_hash",
    "enc_target_loo",
    "a_rolling_active_users",
    # r05 flip (VERDICT r04 item 1): the four staged queries that are
    # perf paths — JPEG decode, sequence packing, the billion-key
    # EWMA shape, the PageRank fixpoint. The recall/checked/banded
    # twins are verification jobs, not perf paths, and stay out.
    "mm_jpeg_decode",
    "pack_sequences",
    "a_ewma_user_segmented",
    "g_pagerank_banded",
    # r05 new work: iterative BPE merge-table induction (3 lazy
    # window-arithmetic rounds) + the LSH-bucketed semantic-dedup
    # scale path
    "text_bpe_merges_k",
    "dedup_embedding_lsh",
    # 4:2:0 + restart-marker JPEG decode (interleaved-MCU path)
    "mm_jpeg420_decode",
    # maximal cross-doc repeated-span extraction + the applied cut
    "dedup_repeated_spans",
    "dedup_span_cut",
    # r06 additions: sketches/stats/analytics batch
    "p_group_sample",
    "dedup_containment",
    "a_cms_heavy_hitters",
    "a_ols_multivariate",
    "w_funnel_conversion",
    "t9_stream_stream_join",
    "w_last_touch_attribution",
    "a_autocorrelation",
    "j_scd2_intervals",
    "text_classifier_score",
    "w_sequence_pattern",
    "emb_pca_power_banded",
    "a_seasonal_residuals",
    "p_weighted_sample",
    "dedup_simhash_portable",
    "a_holt_forecast",
    "a_holt_forecast_by_type",
    "emb_pca_by_label_banded",
    "emb_pca_project",
    "a_ks_test",
    "a_mannwhitney_u",
    "a_chi2_independence",
    "sim_triplet_mining",
    "p_token_budget_sample",
    "a_crosscorrelation",
    "p_quantile_normalize",
    # r07: the fit-free PCA apply (artifact write + map-only project —
    # the production projection shape). The lifecycle *_checked twins
    # are verification jobs, not perf paths, and stay out.
    "emb_pca_apply_artifact",
    # r07 rotation batch (VERDICT r06 item 2): every registered oracle
    # query gets a 2x bar before its first driver bench — SQL front end
    # passthroughs + the analytics batch
    "sql_regional_rank",
    "sql_silent_customers",
    "sql_priority_share",
    "w_markov_transitions",
    "a_theil_sen",
    "a_cusum_changepoint",
    "text_bigram_ppl",
    "emb_centroid_classify",
    "a_survival_km",
    "a_benford_law",
    # r07 breadth: benchmark decontamination + domain mixture
    # reweighting. The sql_tpch_* passthroughs are NOT separately
    # benched: plan parity with their DataFrame twins is test-pinned,
    # so their bars would duplicate the twins' measurements; the
    # lifecycle *_checked rows remain verification jobs.
    "text_decontaminate",
    "p_domain_reweight",
    # r07: BM25 served from the persisted retrieval index (build +
    # term-pruned query; must equal text_bm25's scores exactly)
    "text_bm25_indexed",
    # r07: fixed-window document chunking (map-only explode)
    "text_chunk_windows",
    # r07: the composed curation chain (quality+lang+dedup+length)
    "p_curation_verdict",
    # r07: in-engine logreg training (5 lazy GD rounds + diagnostic)
    "train_logreg_banded",
    # r07: in-engine k-means (4 lazy Lloyd rounds, k-group shuffle)
    "train_kmeans_banded",
    # r07: train -> 1-row artifact -> fit-free map-only serving (bar
    # includes the eager fit+write by construction, like pca_apply)
    "train_logreg_artifact",
    # r07: per-class confusion/precision/recall eval table
    "a_classifier_eval",
    # r07: k-anonymity privacy audit (bounded-cardinality groupBy)
    "a_k_anonymity",
    # r07: stream-stream AS-OF join batch twin (T10 — interval join
    # chained into the finalizing window aggregation) + left variant
    "t10_stream_asof_join",
    "t10b_stream_asof_left",
    # r07: behavioral/drift analytics batch — batch sessionization,
    # basket co-occurrence recommender, PSI drift monitor, Mann-Kendall
    # trend significance
    "w_sessionize",
    "rec_item_affinity",
    "a_psi_drift",
    "a_mann_kendall",
    # r07: ranking-eval family (exact midrank ROC-AUC, calibration
    # reliability table, gains/lift deciles) + phrase mining (PMI
    # collocations) + hybrid retrieval (BM25 ⊕ cosine RRF fusion)
    "a_roc_auc",
    "a_calibration_bins",
    "a_gains_deciles",
    "text_pmi_collocations",
    "text_hybrid_rrf",
    # r07: lazy label-propagation fixpoint + WOE/IV feature screening
    # (stream_cms_sink_checked is a verification job and stays out)
    "g_label_propagation",
    "a_woe_iv",
    # r07: ALS matrix-factorization trainer (distributed factor-table
    # model; all joins pinned shuffle-side)
    "train_als_banded",
    # r07: ALS serving path (cohort scoring + anti-join + per-user topk)
    "als_recommend_topk",
    # r07: deterministic Poisson bootstrap (one scan, B running sums)
    "a_bootstrap_ci",
    # r07: split-conformal prediction sets (exact order-statistic qhat)
    "a_conformal_sets",
    # r07: blocked entity resolution (canonicalize-first, vocab-sized
    # fuzzy step, bounded min-label clustering)
    "j_entity_resolution",
    # r07: TextRank keywords (pagerank over the word graph; eager
    # fixpoint like g_pagerank_banded)
    "text_textrank_keywords",
    # r07: staged_r12 batch — BFS traversal (lazy bounded-round
    # fixpoint), portable Bloom filter (build+probe, exact replay),
    # closed-form Naive Bayes trainer, RFM quintile segmentation
    "g_bfs_hops",
    "a_bloom_filter_checked",
    "train_nb_banded",
    "a_rfm_segments",
    # r07: staged_r12 second batch — k-core peeling, grid-bucketed
    # spatial radius join, HHI concentration, k-fold CV assignment
    "g_kcore",
    "j_spatial_radius",
    "a_hhi",
    "p_crossval_folds",
    # r07: staged_r12 third batch — DiD causal estimator, retention
    # streaks, deterministic-Laplace DP count release
    "a_diff_in_diff",
    "w_activity_streaks",
    "p_dp_noised_counts",
    # r07: propensity-score matching (logreg propensity + scan-carry
    # nearest-control matching via attach_running_last)
    "a_propensity_match",
    # r07: CUPED readout, link prediction, one-way ANOVA
    "a_cuped",
    "g_link_prediction",
    "a_anova_oneway",
    # r07ag: effect sizes + assortativity (bars recorded round 7;
    # restored to the headline in r9 — they had bars but no entry)
    "a_effect_sizes",
    "g_assortativity",
    # r07: quantile (median) regression trainer (5 lazy subgradient
    # rounds — the robust trainer family)
    "train_qr_banded",
    # r07: corpus-stats monitors — vocabulary churn + Zipf-law fit
    "a_vocab_drift",
    "text_zipf_fit",
    # r07: decision-stump split search (one wide conditional-sum scan)
    "train_stump_banded",
    # r07: depth-2 tree (per-node split search, one scan per level)
    "train_tree2_banded",
    # r07: Holt holdout backtest (forecast evaluation metrics)
    "a_forecast_backtest",
    # r07: personalized PageRank (random walk with restart)
    "g_ppr_banded",
    # r07: interrupted time-series (segmented regression readout)
    "a_interrupted_ts",
    # r07: cohort LTV curves + kNN classification
    "w_cohort_ltv",
    "sim_knn_classify",
    # r07: calibration summary (ECE/MCE) + PR-AUC average precision
    "a_ece",
    "a_auc_pr",
    # r07: Brier score (exact integer numerator)
    "a_brier_score",
    # r07: nDCG@100 + discrete mutual information
    "a_ndcg",
    "a_mutual_info",
    # r07: chance-corrected agreement + community quality
    "a_cohens_kappa",
    "g_modularity",
    # r07: deterministic permutation p-value (explode shape)
    "a_permutation_test",
    # r08: capped semantic-dedup probe (O(k·probe) emission — the
    # production posture of the embedding-dedup index, VERDICT r07
    # item 4)
    "dedup_embedding_probe_topk",
    # r08: kNN classification served from the persisted IVF index
    # (agreement-banded vs the exact classifier, VERDICT r07 item 8)
    "sim_knn_classify_ivf",
    # r08: literal TPC-H over the derived partsupp fact table
    "tpch_q2_partsupp",
    "tpch_q9_partsupp",
    "tpch_q11_partsupp",
    "tpch_q16_partsupp",
    "tpch_q20_partsupp",
    # r08: rank correlation / association / hazard / readability /
    # temperature mixing analytics batch
    "a_spearman_corr",
    "a_cramers_v",
    "a_nelson_aalen",
    "text_readability",
    "p_mixture_temperature",
    # r08: weighted shortest paths + incremental-PCA maintenance
    "g_sssp_bounded",
    "stream_pca_checked",
    # r08: ANOVA pre/post-hoc + batch-over-batch profile drift gate
    "a_levene_test",
    "a_tukey_hsd",
    "p_profile_drift",
    # r08: join-key skew diagnostics (precondition for salted paths)
    "p_skew_profile",
    # r08: right-to-be-forgotten cascade audit
    "p_user_erasure",
    # r08: GX expectation suite over the derived partsupp (A13 role)
    "a13b_partsupp_expectations",
    # r08: nonparametric/sequential statistics over the daily series
    "a_kendall_tau",
    "a_durbin_watson",
    "a_runs_test",
    "a_hodges_lehmann",
    # r08: rank tests / survival comparison / graph transitivity
    "a_kruskal_wallis",
    "a_xicor",
    "a_log_rank",
    "g_clustering_coefficient",
    # r08: multiple testing / calibration / privacy / closed-form trainer
    "a_benjamini_hochberg",
    "p_l_diversity",
    "a_isotonic_calibration",
    "train_ridge_closed",
    # r08: blocked rank test / link analysis / text-source parity
    "a_friedman_test",
    "g_hits_banded",
    "io_formats_roundtrip_checked",
    # r08: audio tone detection + near-dedup cluster canonicalization
    "mm_wav_tone_detect",
    "dedup_cluster_canonical",
    # r08: inner-product retrieval / ORC parity / boosted stumps
    "sim_mips_topk",
    "io_orc_roundtrip_checked",
    "train_gbt_stumps",
    # r08: experiment design / sequential testing / tail risk
    "a_power_analysis",
    "a_sprt",
    "a_cvar_daily",
    # r08: explainability + revenue concentration
    "a_shapley_linear",
    "a_pareto_coverage",
    # r08: URL-level dedup + Matryoshka truncation readout
    "dedup_url_canonical",
    "emb_matryoshka_truncate",
    # r08: SRM health gate + hierarchical changepoints
    "a_ab_srm",
    "a_binary_segmentation",
    # r08: schema-evolution (merged-footer) source check
    "io_schema_evolution_checked",
    # r08: seasonal forecasting (triple exponential smoothing)
    "a_holt_winters",
    # r08: survival uncertainty + directed reciprocity
    "a_greenwood_ci",
    "g_reciprocity",
    # r08: 2x2 odds ratio + McNemar paired model comparison
    "a_odds_ratio",
    "a_mcnemar_test",
    # r09: perceptual image dedup (dHash + Hamming-band bucketing)
    "dedup_image_phash",
    # r09: paired/repeated-measures tests + ranking metric + drift
    "a_wilcoxon_signed_rank",
    "a_mrr_at_k",
    "a_cochran_q",
    "a_page_hinkley",
    # r09: anonymity/centrality/video-dedup trio
    "p_t_closeness",
    "g_closeness_bounded",
    "dedup_video_framehash",
    # r09: trend test, rolling median, rate gate, corpus JSD
    "a_jonckheere_terpstra",
    "a_rolling_median_7d",
    "a_poisson_rate_test",
    "text_jsd_divergence",
    # r09: text-source parity + curation funnel readout
    "io_text_lines_roundtrip_checked",
    "p_curation_funnel",
    # r09: joint autocorrelation diagnostic
    "a_ljung_box",
    # r09: coverage estimators (population + vocabulary saturation)
    "a_capture_recapture",
    "a_chao1_richness",
    # r09: per-user inter-arrival median (exact distributed median)
    "w_interarrival_median",
    # r09: parametric calibration (Platt scaling via the logreg trainer)
    "a_platt_calibration",
    # r09: trigram freshness monitor + EWMA control chart
    "text_ngram_novelty",
    "a_ewma_control",
    # r10: exact-substring dedup + BPE encode/pack + graph ANN +
    # off-policy evaluation (dedup_substring_keepfirst shares
    # dedup_substring's scan shape and sim_hnsw_lifecycle is a
    # verification job — both stay out per the twin/lifecycle rules,
    # bars recorded anyway)
    "dedup_substring",
    "text_bpe_encode",
    "sim_topk_hnsw",
    "a_offpolicy_replay",
    # round-11 additions
    "text_bpe_merges_k16",
    "p_curation_pipeline",
    "sim_topk_hnsw_routed",
    "text_heaps_fit",
    "a_jarque_bera",
    "a_market_basket",
    "g_betweenness_bounded",
    "dedup_substring_rewrite",
]


#: Host-health control (VERDICT r09 item 5): a cheap, stable, pure-JVM
#: scan+agg whose bar has never drifted. If THIS query runs slow, the
#: host is throttled and the RUN is suspect — re-records are refused,
#: so machine episodes can no longer ratchet the bars (the r09
#: "machine episode" re-recorded four rounds-2-6 bars; last-recorded-
#: wins would silently absorb a real regression the same way).
_CONTROL_QUERY = "tpch_q1_pricing_summary"
_CONTROL_MAX_RATIO = 1.2


def _bars_path() -> str:
    return os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BASELINE_bars.json"
    )


def _control_ratio(
    timings: dict[str, float], bars: dict[str, float]
) -> float | None:
    """Ratio of the control query's time to its bar, or None if the
    run didn't include the control (subset runs may not)."""
    sec = timings.get(_CONTROL_QUERY)
    bar = bars.get(_CONTROL_QUERY)
    if sec is None or not bar:
        return None
    return sec / bar


def _rerecord_decision(
    timings: dict[str, float],
    bars: dict[str, float],
    names: list[str],
) -> tuple[bool, str]:
    """Pure decision core for --rerecord (unit-tested with synthetic
    artifacts): accept the new bars only when the control query ran
    within _CONTROL_MAX_RATIO of ITS bar — a throttled host
    invalidates the RUN, never the bars."""
    ratio = _control_ratio(timings, bars)
    if ratio is None:
        return False, (
            f"re-record refused: control query {_CONTROL_QUERY!r} was "
            "not timed in this run (it is added automatically — do not "
            "exclude it)"
        )
    if ratio > _CONTROL_MAX_RATIO:
        return False, (
            f"re-record refused: host suspect — control "
            f"{_CONTROL_QUERY} ran {ratio:.2f}x of its bar "
            f"(> {_CONTROL_MAX_RATIO}x); re-run on a quiet host"
        )
    missing = [n for n in names if n not in timings]
    if missing:
        return False, f"re-record refused: no timing for {missing}"
    return True, f"control {_CONTROL_QUERY} at {ratio:.2f}x — run accepted"


def _gate(timings: dict[str, float]) -> int:
    """Scriptable 2x gate (VERDICT r08 item 5): compare timings
    against the canonical machine-readable bars in BASELINE_bars.json
    (BASELINE.md stays the narrative). Returns a nonzero exit code if
    any query exceeds 2x of its bar. Queries without a bar yet are
    WARNED, not failed — the re-record protocol adds their bar with
    the next BASELINE entry."""
    with open(_bars_path()) as fh:
        bars = json.load(fh)["bars"]
    failures, warned = [], []
    common_t = common_b = 0.0
    for name, sec in sorted(timings.items()):
        bar = bars.get(name)
        if bar is None:
            warned.append(name)
            continue
        common_t += sec
        common_b += bar
        ratio = sec / bar
        if ratio > 2.0:
            failures.append((name, sec, bar, ratio))
    for name in warned:
        print(f"GATE WARN  {name}: no bar recorded yet", file=sys.stderr)
    for name, sec, bar, ratio in failures:
        print(
            f"GATE FAIL  {name}: {sec:.3f}s vs bar {bar:.3f}s"
            f" = {ratio:.2f}x (> 2x)",
            file=sys.stderr,
        )
    agg = common_t / common_b if common_b else 0.0
    ctl = _control_ratio(timings, bars)
    if ctl is not None and ctl > _CONTROL_MAX_RATIO:
        print(
            f"GATE SUSPECT: control {_CONTROL_QUERY} at {ctl:.2f}x of "
            f"its bar (> {_CONTROL_MAX_RATIO}x) — host throttled; this "
            "run is NOT valid evidence for bar re-records",
            file=sys.stderr,
        )
    print(
        f"GATE {'FAIL' if failures else 'PASS'}: "
        f"{len(timings) - len(warned)} gated, {len(failures)} over 2x, "
        f"aggregate {agg:.2f}x",
        file=sys.stderr,
    )
    return 1 if failures else 0


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "8")
    # Optional subset (isolated variance re-records): bench.py q1 q2 …
    subset = [a for a in sys.argv[1:] if not a.startswith("-")]
    gate = "--gate" in sys.argv
    # --rerecord q1 q2 …: time the named queries (median-of-3, cache-
    # isolated, exactly like a normal subset run) PLUS the control
    # query, then update BASELINE_bars.json — but only if the control
    # ran within 1.2x of its bar (VERDICT r09 item 5: a throttled host
    # invalidates the RUN, never the bars).
    rerecord = "--rerecord" in sys.argv
    if rerecord:
        if not subset:
            print("--rerecord needs query names", file=sys.stderr)
            sys.exit(2)
        if _CONTROL_QUERY not in subset:
            subset = [_CONTROL_QUERY, *subset]
    # --gate-only: gate the committed BENCH_local_latest.json without
    # re-running (the judge-auditable path)
    if "--gate-only" in sys.argv:
        here = os.path.dirname(os.path.abspath(__file__))
        with open(os.path.join(here, "BENCH_local_latest.json")) as fh:
            timings = json.load(fh)["queries"]
        sys.exit(_gate(timings))

    from end_to_end_mlops_airflow_cloudformation_great_expectations_spark.queries import (
        QUERIES,
    )
    from end_to_end_mlops_airflow_cloudformation_great_expectations_spark.session import (
        get_spark,
    )

    spark = get_spark("bench", master=f"local[{cpus}]")
    # warmup (VERDICT r02): touch EVERY source table once — file
    # listing, parquet footers, and page cache — so cold-scan cost
    # doesn't land on whichever query first touches a table (r02's
    # text_fingerprint "regression" was exactly this artifact). Also
    # absorbs JVM/codegen startup before the first timed query.
    from end_to_end_mlops_airflow_cloudformation_great_expectations_spark import (
        catalog,
    )

    for table in (
        "region",
        "nation",
        "customer",
        "supplier",
        "part",
        "orders",
        "lineitem",
        "events",
        "documents",
        "embeddings",
    ):
        catalog.load(spark, sf_dir, table).write.format("noop").mode(
            "overwrite"
        ).save()

    # Python/Arrow worker warmup (VERDICT r06 item 3): the media /
    # mapInPandas queries were the only bench family drifting toward
    # their 2x bars, clustered by MECHANISM — each pays pyspark worker
    # fork + numpy/pandas import on its first Arrow task. Workers are
    # reused across tasks (spark.python.worker.reuse), so one trivial
    # mapInPandas over every core absorbs that startup exactly like the
    # table warmup absorbs scan/footer costs.
    def _warm_python_workers(it):
        import numpy  # noqa: F401 — the import the media UDFs pay
        import pandas  # noqa: F401

        yield from it

    spark.range(int(cpus) * 4, numPartitions=int(cpus)).mapInPandas(
        _warm_python_workers, "id long"
    ).write.format("noop").mode("overwrite").save()

    # median-of-3 per query (VERDICT r02): the first execution of a
    # plan pays one-time whole-stage-codegen (janino) compile — ~2s on
    # the wide expression trees — which is amortized noise on a long-
    # running cluster. Median of 3 runs reports steady-state and makes
    # back-to-back bench runs agree within the documented ±15%.
    timings: dict[str, float] = {}
    for name in subset or HEADLINE:
        runs = []
        for _ in range(3):
            t0 = time.time()
            QUERIES[name](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            runs.append(time.time() - t0)
        timings[name] = round(sorted(runs)[1], 3)
        # Isolate queries from each other: persist()/localCheckpoint
        # blocks left by cache-using queries (BPE rounds, ranks
        # offsets) otherwise accumulate across the 90-query run and
        # evict later queries' working set — timings then depend on
        # HEADLINE order, not on the query (observed: bpe_merges_k
        # +60% once the headline passed ~90 entries).
        spark.catalog.clearCache()

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    try:
        sf_val: float | str = float(sf)
    except ValueError:
        sf_val = sf
    payload = {
        "metric": "headline_queries_total_wall",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": sf_val,
    }
    # Compact separators (VERDICT r11 item 2): at 250+ queries the
    # default ", "/": " spacing pushed the one-line payload past the
    # driver's bounded artifact-tail capture; compact form is ~25%
    # smaller so more per-query entries survive in the saved tail.
    # Key order is unchanged (metric first) so any prefix-based line
    # matcher keeps working; json.loads is order/space-insensitive.
    print(json.dumps(payload, separators=(",", ":")))
    # Bench auditability (VERDICT r07 item 2): the driver records only
    # the stdout tail, which truncates past ~76 entries — persist the
    # COMPLETE per-query artifact in-repo on every full run so each
    # round's numbers are auditable from artifacts alone. Subset runs
    # (variance re-records) don't overwrite the full artifact.
    if not subset:
        out = os.path.join(
            os.path.dirname(os.path.abspath(__file__)),
            "BENCH_local_latest.json",
        )
        try:
            with open(out, "w") as fh:
                json.dump(payload, fh, indent=1, sort_keys=True)
        except OSError:
            pass  # read-only checkout must not fail the bench
    spark.stop()
    if rerecord:
        with open(_bars_path()) as fh:
            doc = json.load(fh)
        names = [n for n in subset if n != _CONTROL_QUERY]
        ok, msg = _rerecord_decision(timings, doc["bars"], names)
        print(f"RERECORD {'OK' if ok else 'REFUSED'}: {msg}", file=sys.stderr)
        if not ok:
            sys.exit(2)
        for n in names:
            old = doc["bars"].get(n)
            doc["bars"][n] = timings[n]
            print(
                f"RERECORD  {n}: {old} -> {timings[n]}", file=sys.stderr
            )
        with open(_bars_path(), "w") as fh:
            json.dump(doc, fh, indent=1, sort_keys=True)
            fh.write("\n")
    if gate:
        sys.exit(_gate(timings))


if __name__ == "__main__":
    main()
