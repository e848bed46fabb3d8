"""Headline benchmark: runs the flagship queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Index-backed queries (bucketed join, persisted IVF) are split into a
once-per-corpus BUILD (reported under "index_build") and the steady-state
PROBE (what "queries"/"value" time) — the build amortizes across every
later run at 100 TB, so folding it into the headline would misstate
round-over-round throughput.
"""

from __future__ import annotations

import json
import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from etl_airflow_spotify_spark.caching import release_all  # noqa: E402
from etl_airflow_spotify_spark.queries import scale as scale_q  # noqa: E402
from etl_airflow_spotify_spark.queries import similarity as sim_q  # noqa: E402
from etl_airflow_spotify_spark.registry import all_queries  # noqa: E402
from etl_airflow_spotify_spark.session import get_session  # noqa: E402

HEADLINE = [
    # relational core
    "pricing_summary",
    "top_revenue_orders",
    "revenue_by_region",
    "top_orders_per_customer",
    "customer_order_history",
    "range_join_price_band",
    "events_json_stats",
    "dedup_first_event",
    "asof_purchase_click",
    "sessionize_events",
    "late_ship_priority",
    "events_trailing_window",
    # LLM-data-pipeline extensions
    "doc_stats",
    "near_dup_minhash",
    "inverted_index_postings",
    "cooccurrence_pmi",
    "bm25_relevance",
    "vector_range_search",
    "seqlen_packing_profile",
    "global_topk_orders",
    "vector_topk_exact",
    "vector_topk_ivf",
    "vector_topk_ivf_persisted",
    "vector_topk_ivfpq",
    "vector_topk_ivfpq_persisted",
    "multimodal_metadata",
    "multimodal_frames",
    # training_data_prep v1 stays registered (oracle twin) but v2 — same
    # contract, tokenize-once single-pass, ~8x faster — is the headline
    "training_data_prep_v2",
    "dataset_split",
    "cdc_merge_upsert",
    "cdc_merge_incremental",
    "decontaminate_ngram",
    "pii_redaction",
    "sequence_packing",
    "countmin_heavy_hitters",
    "heavy_hitters_twopass",
    "dedup_cluster_assign_star",
    "dup_ngram_coverage",
    "repetition_filter",
    "fuzzy_name_pairs",
    "nearest_centroid_confusion",
    "robust_value_outliers",
    # scale levers + sketches + time series
    "skew_salted_join",
    "bucketed_zero_shuffle_join",
    "bloom_join_pruning",
    "zorder_rectangle_scan",
    "dpp_partitioned_join",
    "hll_distinct_rollup",
    "hierarchy_rollup",
    "ivm_join_delta",
    "twap_user_value",
    "equidepth_price_histogram",
    "hll_sliding_distinct",
    "resample_gap_fill",
    "concurrent_orders",
    # streaming
    "stream_tumbling_counts",
    "stream_stateful_user_stats",
    "stream_decontaminate",
    # round-3 additions: graph, curation v3, quality audit
    "part_pagerank",
    "boilerplate_removal",
    "unigram_lm_quality",
    "bpe_merge_table",
    "order_interval_coverage",
    "data_quality_audit",
    "part_skyline",
    "event_anomaly_days",
    "sft_example_assembly",
    "copurchase_degree_profile",
    "association_rules",
    "winsorized_brand_price",
    "quantile_normalized_values",
    "cluster_quality_metrics",
    "orders_pointintime_dim",
    "ab_test_cuped",
    "markov_prediction_accuracy",
    "random_projection_jl",
    "feature_hash_scores",
    "grouped_ols_price_qty",
    "stream_topk_users",
    "ivf_recall_at_k",
    "hybrid_rank_fusion",
    "target_encoding_loo",
    # fourth-session additions: leakage audit, semantic dedup, LM scoring
    "split_leakage_audit",
    "semantic_dedup_clusters",
    "bigram_lm_perplexity",
    "source_overlap_matrix",
    "sq4_recall_at_k",
    "join_size_profile",
    "copurchase_hop_distance",
    "psi_value_drift",
    "lineitem_corr_matrix",
    "ols_crossval_r2",
    "stl_decompose_daily",
    "km_survival_purchase",
    "dedup_keep_best",
    "cusum_changepoint",
    "mutual_knn_pairs",
    "phrase_search",
    "pareto_revenue_cut",
    "multimodal_ahash_dedup",
    "isotonic_calibration",
    "multimodal_silence_segments",
    "classifier_auc",
    "trending_parts_decay",
    "user_burstiness",
    "stream_cdc_scd2",
    # round-4 additions: weighted graph, CRM segmentation, ranking eval
    "copurchase_weighted_sssp",
    "copurchase_communities",
    "rfm_segments",
    "ivf_ranking_metrics",
    "logodds_keywords",
    "incremental_corpus_dedup",
    "mutual_information_features",
    "bootstrap_ci_mean",
    "event_epsilon_pairs",
    "pooled_doc_topk",
    "weighted_bottomk_sample",
    "survivorship_golden_record",
    "personalized_pagerank",
    "compaction_plan",
    "woe_price_bins",
    "ivf_probe_sweep",
    "compression_quality",
    "process_conformance",
    "corpus_datasheet",
    "als_user_factors",
    "dedup_threshold_sweep",
    "conformal_interval_coverage",
    "linkage_eval_planted",
    "rules_wilson_ranked",
    "fellegi_sunter_bands",
    "watermark_lateness_sweep",
    "source_length_emd",
    "kcore_peeling_profile",
    "shapley_channel_attribution",
    "decision_stump_gini",
    "greedy_source_cover",
    "hits_supplier_part",
    "pattern_funnel_negation",
    "ks_drift_matrix",
    "forecast_backtest_naive",
    "allen_interval_profile",
    "consistent_hash_rebalance",
    "frequent_brand_triples",
    "snm_blocking_eval",
    "rake_keyphrases",
    "event_acf_profile",
    "optimal_threshold_selection",
    "rater_agreement_kappa",
    "nation_revenue_gini",
    "token_budget_selection",
    "source_venn_regions",
    "bagged_stump_forest",
    "boosted_stumps_l2",
    "simpson_paradox_audit",
    "curve_layout_fragmentation",
    "gformula_ate_standardization",
    "capture_recapture_daily",
    "stratum_seat_apportionment",
    "join_order_cost_explorer",
    "bradley_terry_suppliers",
    "source_weighted_jaccard",
    "event_ccf_leadlag",
    "haar_energy_profile",
    "sequential_ab_obf_monitor",
    "ppjoin_prefix_similarity",
    "copurchase_assortativity",
    "percolation_robustness",
    "did_brand_quantity",
    "mannkendall_sen_trend",
    "fdr_brand_returns",
    "boruvka_msf_rounds",
    "dbscan_rfm_segments",
    "ams_f2_partkey",
    "dp_noisy_daily_counts",
    "itemitem_cf_recommend",
    "zipf_rank_frequency",
    "clustering_coefficient_profile",
    "stump_learning_curve",
    "uplift_qini_segments",
    "sequence_triple_support",
    "containment_subset_join",
    "multimodal_scene_changes",
    "bcubed_linkage_eval",
    "bigram_greedy_decode",
    "quantile_treatment_effects",
    "cohort_ltv_curves",
    "naive_bayes_lang",
    "heaps_vocab_growth",
    "jackknife_ratio_se",
    "knn_label_spread",
    "twonn_intrinsic_dim",
    "neyman_stratified_sample",
    "ransac_daily_trend",
    "soundex_blocking_pairs",
    "absorbing_markov_steps",
    "kmv_distinct_sketch",
    "mutual_best_matching",
    "ind_discovery",
    "single_link_dendrogram",
    "distributional_word_sim",
    "temperature_mix_plan",
    "ot_transport_plan",
    "deepwalk_corpus",
    "winnowing_fingerprints",
    "label_noise_audit",
    "markov_removal_attribution",
    "offpolicy_ips_eval",
    "stream_kmv_distinct",
    "ucb_bandit_replay",
    "recsys_quality_metrics",
    "gale_shapley_matching",
    "dp_exponential_selection",
    "stylometry_burrows_delta",
    "kneser_ney_perplexity",
    # round 5
    "louvain_phase1_communities",
    "weisfeiler_lehman_profile",
    "power_iteration_hubs",
    "viterbi_state_decode",
    "holt_linear_daily",
    "sax_daily_words",
    "matrix_profile_daily",
    "encoding_efficiency_audit",
    "cox_score_click_hazard",
    "lof_rfm_outliers",
    "textrank_keywords",
    "dtw_event_type_distance",
    "hierarchical_heavy_hitters",
    "theil_nation_decomposition",
    "lsh_parameter_planner",
    "iforest_rfm_outliers",
    "voptimal_daily_histogram",
    "offpolicy_dr_eval",
    "multimodal_phash_dedup",
    "fd_discovery",
    "ktruss_peeling_profile",
    "cka_quantization_fidelity",
    "funnel_alignment_scores",
    "link_prediction_eval",
    "page_hinkley_drift",
    "group_split_assignment",
    "ldiversity_tcloseness",
    "beam_search_decode",
    "luby_mis",
    "goodturing_vocab",
    "kcenter_coreset",
    "spc_control_chart",
    "huber_irls_trend",
    "gmm_em_values",
    "langid_rank_profile",
    "pca_closed_form",
    "densest_subgraph_peel",
    "betweenness_kseeds",
    "temporal_triangle_census",
    "propensity_stratified_att",
    "kruskal_wallis_values",
    "zonemap_skip_audit",
    "funnel_local_alignment",
    "platt_scaling_calibration",
    "rank_correlation_brands",
    "daily_periodogram",
    "borda_condorcet_brands",
    "randomization_test_discount",
    "disparity_backbone",
    # round-6 additions (X254-X263)
    "rbo_rank_overlap",
    "randomized_response_freq",
    "brier_decomposition",
    "window_funnel_depths",
    "horvitz_thompson_regions",
    "daily_peak_prominence",
    "esd_outlier_rounds",
    "stream_page_hinkley",
    "mondrian_kanon_partition",
    "loo_group_influence",
    "scc_pivot_fwbw",
    "roaring_container_plan",
    "fagin_ta_depth",
    "knn_shapley_valuation",
    "mmr_diverse_topk",
    # round 7
    "holt_winters_daily",
    "auction_assignment",
    "lossy_count_users",
    "fairness_group_audit",
    "cmh_stratified_assoc",
    "readability_fk_profile",
    "binseg_changepoints",
    "ipf_raking_weights",
    "greedy_graph_coloring",
    # round 8
    "holt_damped_daily",
    "prefixspan_top_patterns",
    "friedman_priority_weeks",
    "token_bucket_rate_audit",
    "butterfly_copurchase_census",
    "ks_two_sample_prices",
    "brown_forsythe_nations",
    "sprt_conversion_monitor",
    "mcnemar_paired_rules",
    # round 9 (X287-X295)
    "runs_test_daily_revenue",
    "iv_wald_estimate",
    "cochran_q_rules",
    "littles_law_flow_audit",
    "gumbel_weekly_maxima",
    "logrank_purchase_groups",
    "jonckheere_priority_trend",
    "dgim_purchase_hours",
    "hdbscan_mutual_reachability",
]

# r9 verdict item 1b: the driver's round-over-round compare only sees
# queries present in BOTH rounds' stdout lines, so a query that IMPROVES
# falls out of the top-slowest window and its win disappears from the
# per-query comparison (r9: four 2-7x wins read as "dropped_from_bench").
# Make the shown set comparison-stable: last round's shown queries are
# listed first (they are the driver's compare base), then the remaining
# char budget is filled with the slowest of the rest. This only changes
# WHICH entries appear in stdout's capped "queries" dict; "value" still
# totals every headline query and the detail file carries all of them.
SHOWN_CARRYOVER = [
    "link_prediction_eval", "percolation_robustness", "deepwalk_corpus",
    "hdbscan_mutual_reachability", "dbscan_rfm_segments",
    "copurchase_communities", "ktruss_peeling_profile",
    "louvain_phase1_communities", "boruvka_msf_rounds", "luby_mis",
    "scc_pivot_fwbw", "clustering_coefficient_profile",
    "weisfeiler_lehman_profile", "copurchase_weighted_sssp",
    "power_iteration_hubs", "part_pagerank", "betweenness_kseeds",
    "hits_supplier_part", "temporal_triangle_census",
    "bradley_terry_suppliers", "copurchase_hop_distance",
    "personalized_pagerank", "disparity_backbone", "kcore_peeling_profile",
    "densest_subgraph_peel", "recsys_quality_metrics", "lof_rfm_outliers",
    "semantic_dedup_clusters", "single_link_dendrogram",
    "dedup_cluster_assign_star", "bpe_merge_table",
    "markov_removal_attribution", "frequent_brand_triples",
    "bootstrap_ci_mean", "dedup_keep_best", "greedy_graph_coloring",
    "greedy_source_cover", "copurchase_assortativity",
    "bagged_stump_forest", "bcubed_linkage_eval", "itemitem_cf_recommend",
    "incremental_corpus_dedup", "stream_cdc_scd2", "gale_shapley_matching",
    "mondrian_kanon_partition", "ind_discovery",
    "butterfly_copurchase_census", "mutual_best_matching",
    "ppjoin_prefix_similarity", "stump_learning_curve", "knn_label_spread",
    "randomization_test_discount", "brown_forsythe_nations",
]


class _LoadTrace:
    """r9 verdict item 1a: sample host load DURING the bench so external
    contention is measured, not asserted. Pure /proc reads from a daemon
    thread every few seconds — zero interaction with the timed work.
    ``idle_pct`` is the whole-box idle fraction between samples (includes
    our own Spark load); ``load1`` spikes with zero of our jobs running
    is the external-contention signature."""

    def __init__(self, interval: float = 5.0) -> None:
        self.interval = interval
        self.samples: list[dict] = []
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._prev: tuple[int, int] | None = None

    @staticmethod
    def _read_stat() -> tuple[int, int]:
        with open("/proc/stat") as f:
            vals = [int(x) for x in f.readline().split()[1:]]
        idle = vals[3] + (vals[4] if len(vals) > 4 else 0)  # idle + iowait
        return idle, sum(vals)

    def _sample(self) -> None:
        try:
            with open("/proc/loadavg") as f:
                load1 = float(f.read().split()[0])
            idle, total = self._read_stat()
        except (OSError, ValueError, IndexError):
            return
        rec: dict = {"t": round(time.time(), 1), "load1": load1}
        if self._prev is not None:
            didle, dtotal = idle - self._prev[0], total - self._prev[1]
            if dtotal > 0:
                rec["idle_pct"] = round(100.0 * didle / dtotal, 1)
        self._prev = (idle, total)
        self.samples.append(rec)

    def _loop(self) -> None:
        while not self._stop.wait(self.interval):
            self._sample()

    def start(self) -> None:
        self._sample()
        self._thread.start()

    def stop(self) -> dict:
        self._stop.set()
        self._thread.join(timeout=2 * self.interval)
        self._sample()
        loads = [s["load1"] for s in self.samples]
        idles = [s["idle_pct"] for s in self.samples if "idle_pct" in s]
        out: dict = {"n_samples": len(self.samples),
                     "interval_sec": self.interval}
        if loads:
            out["load1_mean"] = round(sum(loads) / len(loads), 2)
            out["load1_max"] = max(loads)
        if idles:
            out["idle_pct_mean"] = round(sum(idles) / len(idles), 1)
            out["idle_pct_min"] = min(idles)
        return out


# name -> (build_fn(spark, sf_dir), probe_fn(spark, sf_dir) -> DataFrame).
# Build runs (and is timed) once; cold/steady timings below time the probe.
BUILD_PROBE = {
    "bucketed_zero_shuffle_join": (scale_q.build_bucketed_tables,
                                   scale_q.bucketed_join_probe),
    "vector_topk_ivf_persisted": (sim_q.build_persisted_ivf,
                                  sim_q.probe_persisted_ivf),
    "vector_topk_ivfpq_persisted": (sim_q.build_persisted_ivfpq,
                                    sim_q.probe_persisted_ivfpq),
    "zorder_rectangle_scan": (scale_q.build_zorder_layout,
                              scale_q.zorder_probe),
    "dpp_partitioned_join": (scale_q.build_partitioned_orders,
                             scale_q.dpp_probe),
}


def _run(specs, name, spark, sf_dir) -> float:
    fn = BUILD_PROBE[name][1] if name in BUILD_PROBE else specs[name].spark_fn
    # Plan construction happens INSIDE the timer: for streaming queries
    # spark_fn drives the stream to completion (availableNow), so moving
    # it outside would silently exclude the real work.
    t0 = time.time()
    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    dt = time.time() - t0
    # Drop operator-persisted intermediates between queries so one
    # query's cache doesn't occupy memory (or survive into the timing)
    # of the next — each timing is a from-scratch run.
    release_all()
    return dt


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    spark = get_session("bench")
    specs = all_queries()
    trace = _LoadTrace()
    trace.start()

    # warm the JVM + parquet footers with the cheapest query once
    specs["pricing_summary"].spark_fn(spark, sf_dir).count()

    # one-time index builds, timed separately from the probes
    builds: dict[str, float] = {}
    for name, (build, _) in BUILD_PROBE.items():
        if name not in HEADLINE:
            continue
        t0 = time.time()
        build(spark, sf_dir)
        builds[name] = round(time.time() - t0, 3)

    # Steady-state methodology: run each query once to pay the one-time
    # janino/whole-stage-codegen compile (seconds, amortized to nothing
    # over a long-running 100 TB job), then time two more runs and take
    # the per-query MIN — the standard noise-robust estimator (GC pauses
    # and transient machine contention only ever ADD time, so the min is
    # the best estimate of per-byte throughput, the quantity that
    # actually scales). Tracked persists are released between runs, so
    # every timed run is a true from-scratch execution (round 1's warm
    # numbers reused intra-query caches across runs; these don't).
    # Cold (compile-inclusive) totals are reported alongside.
    cold: dict[str, float] = {}
    timings: dict[str, float] = {}
    for name in HEADLINE:
        if name not in specs:
            continue
        cold[name] = round(_run(specs, name, spark, sf_dir), 3)
    for _ in range(2):
        for name in HEADLINE:
            if name not in specs:
                continue
            dt = round(_run(specs, name, spark, sf_dir), 3)
            timings[name] = min(timings.get(name, dt), dt)

    total = round(sum(timings.values()), 3)
    sf_val = float(sf) if sf.replace(".", "").isdigit() else sf
    env_load = trace.stop()
    detail = {
        "env_load": env_load,
        "env_load_samples": trace.samples,
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "cold_total": round(sum(cold.values()), 3),
        "cold_queries": cold,
        "index_build": builds,
        "runs_per_query": 3,
        "timing": "min_of_2_steady_state_runs",
        "sf": sf_val,
    }
    # Full per-query payload goes to a SCRATCH file; stdout carries a
    # line capped well under the driver's 2000-char output-tail window
    # (rounds 2-3 proved a 100+-query dict overflows it -> "parsed":
    # null). stdout's "queries" holds the slowest queries that fit the
    # budget; "value" is still the total over ALL headline queries.
    # r8 verdict item 3: bench.py never writes the repo's canonical
    # BENCH_DETAIL.json — single sessions land in a scratch path
    # (override: SPARK_GRAFT_BENCH_DETAIL) and ONLY
    # tools/bench_merge.py writes the committed detail file, so a
    # post-commit bench run can no longer dirty the canonical numbers.
    detail_path = os.environ.get(
        "SPARK_GRAFT_BENCH_DETAIL",
        os.path.join("/tmp", f"BENCH_DETAIL_session_{os.getpid()}.json"))
    with open(detail_path, "w") as f:
        json.dump(detail, f, indent=1, sort_keys=True)
    shown: dict[str, float] = {}
    base = {
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "queries": shown,
        "n_queries": len(timings),
        "detail": detail_path,
        "runs_per_query": 3,
        "timing": "min_of_2_steady_state_runs",
        "sf": sf_val,
    }
    budget = 1800
    order = sorted(timings, key=timings.get, reverse=True)
    carry_set = set(SHOWN_CARRYOVER)
    for name in ([n for n in order if n in carry_set]
                 + [n for n in order if n not in carry_set]):
        shown[name] = timings[name]
        if len(json.dumps(base, separators=(",", ":"))) > budget:
            del shown[name]
            break
    base["queries_shown"] = len(shown)
    print(json.dumps(base, separators=(",", ":")))
    spark.stop()


if __name__ == "__main__":
    main()


