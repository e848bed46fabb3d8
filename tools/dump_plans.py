"""Dump formatted physical plans for the headline queries to PLANS.md.

The plan properties that matter at 100 TB (PushedFilters reaching the
scan, pruned ReadSchema, BroadcastHashJoin for dims, partial+final
HashAggregate, WholeStageCodegen spans) are pinned by tests/test_plans.py;
this file makes them reviewable without running Spark.

Usage: python tools/dump_plans.py
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from etl_airflow_spotify_spark.plans import plan_string  # noqa: E402
from etl_airflow_spotify_spark.registry import all_queries  # noqa: E402
from etl_airflow_spotify_spark.session import get_session  # noqa: E402

SHOW = [
    "pricing_summary",       # pushdown + partial/final agg
    "revenue_by_region",     # broadcast star join
    "top_orders_per_customer",  # single-shuffle ranking window
    "late_ship_priority",    # EXISTS -> left semi join
    "rich_idle_customers",   # scalar subquery + anti join
    "near_dup_minhash",      # LSH: no cartesian anywhere
    "vector_topk_ivf",       # cell equi-join replaces the product join
    "events_trailing_window",  # RANGE frame, one exchange
    "decontaminate_ngram",   # explode-to-ngram + broadcast eval side
    "countmin_heavy_hitters",  # sketch partial-agg + broadcast probe
    "sequence_packing",      # one exchange serves window + final agg
    "cdc_merge_incremental",  # 4 versioned merges, one lazy plan
    "fuzzy_name_pairs",      # multi-pass blocked linkage, no cartesian
    "nearest_centroid_confusion",  # broadcast centroids, map-only scoring
    "equidepth_price_histogram",   # quantile boundaries, no global sort
    "weighted_median_price",  # bucketed two-pass median, no fact-table window
    "dup_ngram_coverage",    # co-partitioned count+join on shingle hash
    "hierarchy_rollup",      # recursive CTE as a chain of hash joins
    "ivm_join_delta",        # bilinear delta join, delta-sized inputs
    "bm25_relevance",        # pre-filtered explode + TakeOrderedAndProject
    "global_topk_orders",    # heap-merge top-k, zero Sort nodes
    "part_pagerank",         # cached co-partitioned edges, 2-shuffle iters
    "part_skyline",          # bucketed Pareto: no global sort window
    "boilerplate_removal",   # chunk-keyed freq + unhinted anti join
    "association_rules",     # basket-bounded pair fan-out + support prune
    "quantile_normalized_values",  # bounded bucket-table theta join
    "ab_test_cuped",         # one scan, all stats from exact BIGINT sums
    "target_encoding_loo",   # broadcast group agg, map-only encode
    "orders_pointintime_dim",  # SCD2 interval residual on equi-join
    "bigram_lm_perplexity",  # model folds from one bigram aggregate
    "sq4_recall_at_k",       # broadcast stats row, map-only quantize
    "join_size_profile",     # sum-of-products, no materialized join
    "k_anonymity_generalization",  # window sums over finest groups, no Expand
    "lineitem_corr_matrix",  # ONE wide decimal moment aggregate
    "km_survival_purchase",  # duration fold + ordered ln-sum windows
    # round 4
    "copurchase_weighted_sssp",  # per-round relax join + min agg
    "copurchase_communities",    # two-aggregate argmax per LP round
    "rfm_segments",              # one scan, fixed-cutoff scores
    "logodds_keywords",          # word/source tables only, scalar broadcast
    "incremental_corpus_dedup",  # increment-sided candidate probe
    "mutual_information_features",  # unpivot -> cell-table folds
    "bootstrap_ci_mean",         # Feistel uniforms, 64-group partial agg
    "event_epsilon_pairs",       # grid-cell hash join, offset explodes
    "pooled_doc_topk",           # position-keyed integer matmul
    "weighted_bottomk_sample",   # ticket explode + bottom-k race
    "survivorship_golden_record",  # CC clusters + per-field mode argmax
    "personalized_pagerank",     # sparse seed-local rank frame
    "compaction_plan",           # one window per partition, metadata out
    "decision_stump_gini",       # one histogram pass + prefix-sum splits
    "pattern_funnel_negation",   # running-state windows, zero self-joins
    "ks_drift_matrix",           # histogram-first, pair joins on tiny frames
    "forecast_backtest_naive",   # date-arithmetic keys extracted to equi-join
    "allen_interval_profile",    # customer-keyed SMJ, case-ladder classify
    "optimal_threshold_selection",  # suffix-sum sweep, integer argmax
    "token_budget_selection",    # histogram cutoff, no global sort
    "curve_layout_fragmentation",  # generated Hilbert stages, cell-table only
    "event_ccf_leadlag",         # date-arithmetic lag equi-join
    "source_weighted_jaccard",   # histogram-first pair merge
    "simpson_paradox_audit",     # decimal moment aggregate + pooled broadcast
    "sequential_ab_obf_monitor",  # day-table prefix windows, const boundaries
    # round 5: the five most expensive bench queries (r4 verdict item 6)
    "deepwalk_corpus",           # per-hop hash join vs sorted neighbor index
    "dbscan_rfm_segments",       # grid + 3x3 probe candidates, never all-pairs
    "bagged_stump_forest",       # one histogram trains all bags; broadcast OOB
    # round-5 additions with non-trivial plans
    "lof_rfm_outliers",          # grid-probe kNN, no all-pairs product
    "lsh_parameter_planner",     # banded candidates + S-curve constant folds
    "textrank_keywords",         # bounded word graph + fixed-point PR joins
    "multimodal_phash_dedup",    # Arrow decode UDF + banded hamming verify
    "funnel_alignment_scores",   # one fold per user, no per-step joins
    # round-5 continuation (X229-X250)
    "betweenness_kseeds",        # (seed,v)-keyed two-sweep Brandes, hash joins only
    "beam_search_decode",        # <=B-row beam joins vs persisted scored bigrams
    "temporal_triangle_census",  # dated-edge wedge joins, no all-pairs
    "langid_rank_profile",       # broadcast lang profiles, bounded doc windows
    "kruskal_wallis_values",     # histogram midranks, no row-level sort
    "zonemap_skip_audit",        # broadcast 8-row predicate battery
    "gmm_em_values",             # EM over the value histogram checkpoint
    "funnel_local_alignment",    # one collect_list exchange, zero joins
    # round 6
    "knn_shapley_valuation",     # broadcast test fan-out + keyed suffix windows
    # round 9
    "hdbscan_mutual_reachability",  # grid-probe core dists + contracted CC cuts
    "jonckheere_priority_trend",    # value-grid prefix windows + 5x5 pair join
]


def _percolation_scenario_edges(spark, sf_dir):
    """Representative intermediate for percolation_robustness (its
    returned DF is a locally-assembled stats table): one scenario's
    edge set after hub removal — two LEFT ANTI joins against the
    DISTRIBUTED removal frame, no literal isin list in the plan."""
    import pyspark.sql.functions as F

    from etl_airflow_spotify_spark.catalog import load_table
    from etl_airflow_spotify_spark.operators import graph as G
    from etl_airflow_spotify_spark.queries.graph import (
        percolation_scenario_edges)

    li = load_table(spark, sf_dir, "lineitem")
    e0 = G.cooccurrence_edges(li, "l_orderkey", "l_partkey")
    deg = e0.groupBy(F.col("src").alias("node")) \
        .agg(F.count("*").alias("d"))
    rm = deg.orderBy(F.desc("d"), F.asc("node")).limit(10).select("node")
    return percolation_scenario_edges(e0, rm)


def _boruvka_round_pick(spark, sf_dir):
    """Representative intermediate for boruvka_msf_rounds (its returned
    DF is a locally-assembled per-round trajectory): one round's
    per-component minimum outgoing edge — two label joins + ONE
    ranking window over one exchange on the component key."""
    import pyspark.sql.functions as F

    from etl_airflow_spotify_spark.catalog import load_table
    from etl_airflow_spotify_spark.operators import graph as G
    from etl_airflow_spotify_spark.queries.graph import boruvka_min_edges

    li = load_table(spark, sf_dir, "lineitem")
    e0 = G.cooccurrence_edges(li, "l_orderkey", "l_partkey")
    eu = (e0.filter(F.col("src") < F.col("dst"))
          .select(F.col("src").alias("lo"), F.col("dst").alias("hi"),
                  (F.lit(1) + (F.col("src") + F.col("dst")) % 7)
                  .cast("long").alias("w")))
    ed = (eu.select(F.col("lo").alias("u"), F.col("hi").alias("v"),
                    "w", "lo", "hi")
          .unionByName(eu.select(F.col("hi").alias("u"),
                                 F.col("lo").alias("v"),
                                 "w", "lo", "hi")))
    lab = (ed.select(F.col("u").alias("node")).distinct()
           .withColumn("lab", F.col("node")))
    return boruvka_min_edges(ed, lab)


def _ktruss_triangle_enumeration(spark, sf_dir):
    """Representative intermediate for ktruss_peeling_profile (its
    returned DF is a driver-assembled trajectory): the round-1
    triangle list — (degree, id)-oriented edges joined to BROADCAST
    sorted neighbor arrays, triangles closed by array_intersect inside
    whole-stage codegen. No wedge-sized exchange anywhere (the r6-era
    wedge join shuffled ~41M rows at sf0.1 for 1.9M triangles)."""
    import pyspark.sql.functions as F

    from etl_airflow_spotify_spark.catalog import load_table
    from etl_airflow_spotify_spark.operators import graph as G

    li = load_table(spark, sf_dir, "lineitem")
    e = G.cooccurrence_edges(li, "l_orderkey", "l_partkey")
    eu = (e.filter(F.col("src") < F.col("dst"))
          .select(F.col("src").alias("lo"), F.col("dst").alias("hi")))
    deg = (eu.select(F.col("lo").alias("n"))
           .unionByName(eu.select(F.col("hi").alias("n")))
           .groupBy("n").agg(F.count("*").cast("long").alias("d")))
    eo = (eu.join(F.broadcast(deg.select(F.col("n").alias("lo"),
                                         F.col("d").alias("da"))), "lo")
          .join(F.broadcast(deg.select(F.col("n").alias("hi"),
                                       F.col("d").alias("db"))), "hi")
          .select(F.expr("CASE WHEN (da, lo) < (db, hi)"
                         " THEN lo ELSE hi END").alias("u"),
                  F.expr("CASE WHEN (da, lo) < (db, hi)"
                         " THEN hi ELSE lo END").alias("v")))
    adj = (eo.groupBy(F.col("u").alias("n"))
           .agg(F.array_sort(F.collect_list("v")).alias("nbrs")))
    return (eo.join(F.broadcast(adj.select(F.col("n").alias("u"),
                                           F.col("nbrs").alias("nu"))),
                    "u")
            .join(F.broadcast(adj.select(F.col("n").alias("v"),
                                         F.col("nbrs").alias("nv"))),
                  "v")
            .select("u", "v",
                    F.explode(F.array_intersect("nu", "nv"))
                    .alias("w")))


# Intermediate plans for iterative queries whose registered DF is a
# driver-assembled summary: title -> (builder, doc).
EXTRA = {
    "ktruss_peeling_profile (round-1 triangle enumeration)": (
        _ktruss_triangle_enumeration,
        "X225 inner plan (r6 verdict item 6 re-plan): oriented edges "
        "close triangles via array_intersect against broadcast sorted "
        "neighbor arrays — candidate filtering happens in whole-stage "
        "codegen, replacing the former 41M-row wedge exchange; "
        "rounds 2+ are support maintenance over this one list. "
        "r8 (r7 verdict item 3): the broadcast-intersect shape is "
        "gated on the exact oriented-edge count vs "
        "KTRUSS_BCAST_EDGE_MAX = 30M (~240 MB packed arrays); above "
        "it the X167 degree-oriented wedge JOIN produces the "
        "identical set (a broadcast hint is HARD — Spark OOMs rather "
        "than falls back). r9 (r8 verdict item 5): the deg-orientation "
        "joins sit behind the SAME gate; the fallback carries ZERO "
        "broadcast hints, pinned via analyzed-plan ResolvedHint count "
        "(physical BroadcastHashJoin at tiny SFs is legitimate "
        "size-estimate behavior, so hints are what the test counts)."),
    "percolation_robustness (scenario edge set)": (
        _percolation_scenario_edges,
        "X157 inner plan: removal set applied via two LEFT ANTI joins "
        "(src, dst) against the distributed top-h frame — no collected "
        "isin literal list (r4 verdict item 3)."),
    "boruvka_msf_rounds (per-round min edge pick)": (
        _boruvka_round_pick,
        "X161 inner plan: per-component min outgoing edge = two hash "
        "joins + one ROW_NUMBER window over one exchange on the "
        "component key (cut property => every pick is a true MSF "
        "edge)."),
}


def main() -> None:
    spark = get_session("plans")
    sf_dir = "/root/testdata/sf0.001"  # plan shape, not data scale
    specs = all_queries()
    parts = [
        "# PLANS — formatted physical plans for headline queries",
        "",
        "Generated by `python tools/dump_plans.py` at sf0.001 (plan shape",
        "is scale-independent; AQE may re-plan exchanges at runtime).",
        "Property assertions live in `tests/test_plans.py`.",
        "",
    ]
    for name in SHOW:
        df = specs[name].spark_fn(spark, sf_dir)
        parts += [f"## {name}", "", f"_{specs[name].doc.strip()}_", "",
                  "```", plan_string(df).rstrip(), "```", ""]
    for title, (builder, doc) in EXTRA.items():
        df = builder(spark, sf_dir)
        parts += [f"## {title}", "", f"_{doc}_", "",
                  "```", plan_string(df).rstrip(), "```", ""]
    with open(os.path.join(REPO, "PLANS.md"), "w") as f:
        f.write("\n".join(parts) + "\n")
    print(f"wrote PLANS.md with {len(SHOW) + len(EXTRA)} plans")
    spark.stop()


if __name__ == "__main__":
    main()
