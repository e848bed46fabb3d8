"""Property laws for the round-4 operator classes (X96+): each query's
oracle pins exact values; these pin the ALGEBRA the values must
satisfy, so a future rewrite can't drift into plausibly-wrong output."""

from __future__ import annotations

from etl_airflow_spotify_spark.registry import all_queries

SPECS = all_queries()


def _rows(name, spark, sf_dir):
    return SPECS[name].spark_fn(spark, sf_dir).collect()


def test_sssp_lower_bounds_bfs_times_min_weight(spark, sf_dir):
    """Weighted distance >= hop distance (min edge weight is 1), and
    every weighted-reachable node is BFS-reachable (same seeds, and
    SSSP_ROUNDS >= BFS_MAX_HOPS would be needed for the converse)."""
    hops = {r["node"]: r["dist"]
            for r in _rows("copurchase_hop_distance", spark, sf_dir)}
    dist = {r["node"]: r["dist"]
            for r in _rows("copurchase_weighted_sssp", spark, sf_dir)}
    assert dist
    for node, d in dist.items():
        assert node in hops
        assert d >= hops[node]
    # seeds are at distance 0 in both
    assert {n for n, d in dist.items() if d == 0} \
        == {n for n, d in hops.items() if d == 0}


def test_communities_partition_the_node_set(spark, sf_dir):
    rows = _rows("copurchase_communities", spark, sf_dir)
    hops = {r["node"] for r in _rows("copurchase_hop_distance",
                                     spark, sf_dir)}
    nodes = {r["node"] for r in rows}
    labels = {r["community"] for r in rows}
    assert len(nodes) == len(rows)          # one community per node
    assert labels <= nodes                  # labels are member ids
    # community_size is consistent with the actual member count
    from collections import Counter
    sizes = Counter(r["community"] for r in rows)
    for r in rows:
        assert r["community_size"] == sizes[r["community"]]
    assert hops <= nodes or nodes  # co-purchase nodes all labelled


def test_rfm_partitions_customers(spark, sf_dir):
    import duckdb
    rows = _rows("rfm_segments", spark, sf_dir)
    n_cust = duckdb.sql(
        f"SELECT COUNT(DISTINCT o_custkey) FROM "
        f"'{sf_dir}/orders.parquet'").fetchone()[0]
    assert sum(r["n_customers"] for r in rows) == n_cust
    for r in rows:
        assert r["segment"] in {"champion", "hibernating", "at_risk",
                                "loyal", "big_spender", "regular"}
        assert 1 <= r["r_score"] <= 3
        assert 1 <= r["f_score"] <= 3
        assert 1 <= r["m_score"] <= 3
        # label logic is a pure function of the scores
        if r["segment"] == "champion":
            assert (r["r_score"], r["f_score"], r["m_score"]) == (3, 3, 3)
        if r["r_score"] == 1:
            assert r["segment"] in {"hibernating", "at_risk"}


def test_logodds_keywords_sum_to_topk_per_source(spark, sf_dir):
    from collections import Counter
    rows = _rows("logodds_keywords", spark, sf_dir)
    per_source = Counter(r["source"] for r in rows)
    for src, n in per_source.items():
        ranks = sorted(r["rank"] for r in rows if r["source"] == src)
        assert ranks == list(range(1, n + 1))  # dense 1..k
    # z-scores within a source strictly ordered with the rank
    for src in per_source:
        zs = [r["z_logodds"] for r in
              sorted((r for r in rows if r["source"] == src),
                     key=lambda r: r["rank"])]
        assert zs == sorted(zs, reverse=True)


def test_incremental_dedup_every_pair_touches_new_batch(spark, sf_dir):
    from etl_airflow_spotify_spark.queries.dedup import INCR_NEW_BUCKET
    import hashlib

    def bucket(doc_id):
        return int(hashlib.md5(str(doc_id).encode()).hexdigest()[:15],
                   16) % 100

    rows = _rows("incremental_corpus_dedup", spark, sf_dir)
    for r in rows:
        new_a = bucket(r["id_a"]) >= INCR_NEW_BUCKET
        new_b = bucket(r["id_b"]) >= INCR_NEW_BUCKET
        assert new_a or new_b
        want = "new_new" if (new_a and new_b) else "new_corpus"
        assert r["pair_type"] == want
        assert r["jaccard"] >= 0.8


def test_mutual_information_nonnegative_and_bounded(spark, sf_dir):
    import math
    rows = _rows("mutual_information_features", spark, sf_dir)
    assert {r["feature"] for r in rows} \
        == {"order_status", "order_priority", "order_year"}
    for r in rows:
        # micro-grid snapping can push an exactly-zero MI a hair negative
        assert r["mi_bits"] >= -1e-4
        # MI <= H(X) <= log2(n_values)
        assert r["mi_bits"] <= math.log2(max(r["n_values"], 2)) + 1e-6


def test_bootstrap_ci_brackets_point_mean(spark, sf_dir):
    import duckdb
    (r,) = _rows("bootstrap_ci_mean", spark, sf_dir)
    want_mean = duckdb.sql(
        f"SELECT SUM(o_totalprice::DECIMAL(12,2))::DOUBLE / COUNT(*) "
        f"FROM '{sf_dir}/orders.parquet'").fetchone()[0]
    assert abs(r["point_mean"] - want_mean) < 1e-3
    assert r["boot_ci_lo"] <= r["boot_ci_hi"]
    # the 2.5-97.5 percentile interval should bracket the point mean
    assert r["boot_ci_lo"] <= r["point_mean"] <= r["boot_ci_hi"]
    assert r["n_replicates"] == 64


def test_epsilon_pairs_equal_brute_force(spark, sf_dir):
    """The grid join must find EXACTLY the brute-force pair set — the
    3x3 neighbor explode's pigeonhole recall guarantee, checked against
    an exhaustive DuckDB self-join ground truth (not the grid replay
    the oracle uses)."""
    import duckdb
    from etl_airflow_spotify_spark.queries.events_ops import EPS_T_US, EPS_V
    got = {(r["id_a"], r["id_b"]) for r in
           _rows("event_epsilon_pairs", spark, sf_dir)}
    brute = duckdb.sql(f"""
        WITH b AS (SELECT event_id, epoch_us(ts) AS us, value
                   FROM '{sf_dir}/events.parquet')
        SELECT a.event_id, c.event_id
        FROM b a JOIN b c ON a.event_id < c.event_id
        WHERE abs(a.us - c.us) <= {EPS_T_US}
          AND abs(a.value - c.value) <= {EPS_V}
    """).fetchall()
    assert got == set(brute)


def test_pooled_topk_within_doc_chunks_most_similar(spark, sf_dir):
    from etl_airflow_spotify_spark.queries.similarity import POOL_K, POOL_N_Q
    rows = _rows("pooled_doc_topk", spark, sf_dir)
    by_q = {}
    for r in rows:
        by_q.setdefault(r["query_doc"], []).append(r)
    assert set(by_q) == set(range(POOL_N_Q))
    for q, rs in by_q.items():
        assert len(rs) == POOL_K
        rs = sorted(rs, key=lambda r: r["rank"])
        cosines = [r["cosine"] for r in rs]
        assert cosines == sorted(cosines, reverse=True)
        for r in rs:
            assert -1.0 <= r["cosine"] <= 1.0 + 1e-9
            assert r["cand_doc"] != q


def test_weighted_bottomk_exact_size_and_weight_bias(spark, sf_dir):
    import duckdb
    from etl_airflow_spotify_spark.queries.sampling import WTS_K
    rows = _rows("weighted_bottomk_sample", spark, sf_dir)
    assert len(rows) == WTS_K
    assert sorted(r["rank"] for r in rows) == list(range(1, WTS_K + 1))
    # selection must favor weight: sampled docs average more tickets
    # than the corpus (each ticket is an independent chance to win)
    corpus_avg = duckdb.sql(f"""
        SELECT AVG(1 + LEAST(len(string_split_regex(trim(lower(text)),
                                                    '\\s+')) // 50, 63))
        FROM '{sf_dir}/documents.parquet'""").fetchone()[0]
    sample_avg = sum(r["n_tickets"] for r in rows) / len(rows)
    assert sample_avg > corpus_avg


def test_survivorship_golden_records_consistent(spark, sf_dir):
    import duckdb
    rows = _rows("survivorship_golden_record", spark, sf_dir)
    assert rows
    name_rows = duckdb.sql(
        f"SELECT p_name, COUNT(*) FROM '{sf_dir}/part.parquet' "
        f"GROUP BY 1").fetchall()
    counts = dict(name_rows)
    for r in rows:
        assert r["n_names"] >= 2          # clusters only (edges exist)
        assert r["n_rows"] >= r["n_names"]
        # cluster_id is the min member name, canonical is a member
        assert r["cluster_id"] <= r["canonical_name"]
        assert r["canonical_name"] in counts


def test_personalized_pagerank_concentrates_on_seeds(spark, sf_dir):
    from etl_airflow_spotify_spark.queries.graph import PPR_SEED_MOD
    rows = _rows("personalized_pagerank", spark, sf_dir)
    assert rows
    prs = [r["pr"] for r in rows]
    assert prs == sorted(prs, reverse=True)      # top-k ordering
    assert all(p > 0 for p in prs)
    # seeds receive direct teleport mass: at least one seed in the top-k
    assert any(r["node"] % PPR_SEED_MOD == 0 for r in rows)


def test_compaction_plan_conserves_rows_and_respects_target(spark, sf_dir):
    import duckdb
    from etl_airflow_spotify_spark.queries.maintenance import (
        COMPACT_TARGET_ROWS)
    rows = _rows("compaction_plan", spark, sf_dir)
    n_orders = duckdb.sql(
        f"SELECT COUNT(*) FROM '{sf_dir}/orders.parquet'").fetchone()[0]
    assert sum(r["total_rows"] for r in rows) == n_orders
    for r in rows:
        assert r["first_day"] <= r["last_day"]
        assert r["n_input_files"] >= 1
    # within each partition, bins cover disjoint, ORDERED day ranges
    # (compaction preserves sort order), and bin sizes are bounded by
    # target + the largest single input file
    by_part = {}
    for r in rows:
        by_part.setdefault(r["part"], []).append(r)
    for part, bins in by_part.items():
        bins = sorted(bins, key=lambda r: r["bin"])
        for a, b in zip(bins, bins[1:]):
            assert a["last_day"] < b["first_day"]
        max_file = max(r["total_rows"] for r in bins)  # upper bound proxy
        for r in bins:
            assert r["total_rows"] < COMPACT_TARGET_ROWS + max_file


def test_woe_bins_conserve_orders_and_iv_nonnegative(spark, sf_dir):
    import duckdb
    rows = _rows("woe_price_bins", spark, sf_dir)
    n_orders = duckdb.sql(
        f"SELECT COUNT(*) FROM '{sf_dir}/orders.parquet'").fetchone()[0]
    assert sum(r["n_good"] + r["n_bad"] for r in rows) == n_orders
    ivs = {r["feature_iv"] for r in rows}
    assert len(ivs) == 1                  # one IV per feature
    # IV is a sum of (p_g - p_b) * ln(p_g/p_b) terms — nonnegative up
    # to add-one smoothing and micro-grid dust
    assert ivs.pop() >= -1e-3


def test_probe_sweep_monotone_in_probes(spark, sf_dir):
    rows = sorted(_rows("ivf_probe_sweep", spark, sf_dir),
                  key=lambda r: r["n_probe"])
    assert [r["n_probe"] for r in rows] == [1, 2, 4, 8]
    cands = [r["total_candidates"] for r in rows]
    recalls = [r["mean_recall"] for r in rows]
    hits = [r["n_hits"] for r in rows]
    # more probes -> superset candidates -> recall and cost both
    # monotone non-decreasing
    assert cands == sorted(cands)
    assert recalls == sorted(recalls)
    assert hits == sorted(hits)
    assert all(0.0 <= r <= 1.0 for r in recalls)
    # the 4-probe point must agree with ivf_recall_at_k's mean
    from etl_airflow_spotify_spark.queries.similarity import K, N_QUERIES
    rec4 = {r["n_probe"]: r["n_hits"] for r in rows}[4]
    recall_rows = _rows("ivf_recall_at_k", spark, sf_dir)
    assert rec4 == sum(r["n_hits"] for r in recall_rows)


def test_compression_quality_matches_zlib_exactly(spark, sf_dir):
    """X112 golden: every document's deflate length must equal a direct
    replay through the same zlib (the rows-only driver check's exact
    local complement)."""
    import zlib

    import duckdb
    from etl_airflow_spotify_spark.queries.text import COMPRESS_LEVEL
    rows = {r["doc_id"]: r for r in _rows("compression_quality",
                                          spark, sf_dir)}
    docs = duckdb.sql(
        f"SELECT doc_id, text FROM '{sf_dir}/documents.parquet'"
    ).fetchall()
    assert len(rows) == len(docs)
    for doc_id, text in docs:
        raw = text.encode("utf-8")
        r = rows[doc_id]
        assert r["n_bytes"] == len(raw)
        assert r["n_compressed"] == len(zlib.compress(raw, COMPRESS_LEVEL))
        assert 0.0 < r["ratio"] <= 1.2
        assert r["is_repetitive"] == (
            r["n_compressed"] < r["n_bytes"] * 0.30)


def test_conformance_partitions_transitions(spark, sf_dir):
    import duckdb
    rows = {r["transition_kind"]: r for r in
            _rows("process_conformance", spark, sf_dir)}
    n_events = duckdb.sql(
        f"SELECT COUNT(*) FROM '{sf_dir}/events.parquet' WHERE "
        f"event_type IN ('signup','view','click','purchase')"
    ).fetchone()[0]
    n_users = duckdb.sql(
        f"SELECT COUNT(DISTINCT user_id) FROM '{sf_dir}/events.parquet' "
        f"WHERE event_type IN ('signup','view','click','purchase')"
    ).fetchone()[0]
    # every stage event is exactly one of start/advance/repeat/rework
    core = ("trace_start", "advance", "repeat", "rework")
    assert sum(rows[k]["n_occurrences"] for k in core
               if k in rows) == n_events
    assert rows["trace_start"]["n_occurrences"] == n_users
    for r in rows.values():
        assert r["n_users"] <= r["n_occurrences"]


def test_datasheet_conserves_corpus(spark, sf_dir):
    import duckdb
    rows = _rows("corpus_datasheet", spark, sf_dir)
    n_docs, n_tok = duckdb.sql(
        f"SELECT COUNT(*), SUM(len(string_split_regex(trim(text), "
        f"'\\s+'))) FROM '{sf_dir}/documents.parquet'").fetchone()
    assert sum(r["n_docs"] for r in rows) == n_docs
    assert sum(r["total_tokens"] for r in rows) == n_tok
    for r in rows:
        assert 0.0 <= r["mean_quality"] <= 1.0
        assert r["n_short"] <= r["n_docs"]
        assert r["n_exact_dup"] <= r["n_docs"]
        assert r["n_with_email"] <= r["n_docs"]


def test_als_factors_satisfy_normal_equations(spark, sf_dir):
    """X115: each user's solved factors must satisfy the ridge normal
    equations A u = b (replayed independently from the raw tables)."""
    import hashlib

    import duckdb
    from etl_airflow_spotify_spark.queries.relational import ALS_LAMBDA
    rows = {r["custkey"]: r for r in _rows("als_user_factors",
                                           spark, sf_dir)}
    ratings = duckdb.sql(f"""
        SELECT o.o_custkey, l.l_partkey, SUM(l.l_quantity)
        FROM '{sf_dir}/lineitem.parquet' l
        JOIN '{sf_dir}/orders.parquet' o ON o.o_orderkey = l.l_orderkey
        GROUP BY 1, 2""").fetchall()

    def fac(tag, p):
        return int(hashlib.md5(f"{tag}:{p}".encode()).hexdigest()[:15],
                   16) % 9 - 4

    from collections import defaultdict
    acc = defaultdict(lambda: [0, 0, 0, 0, 0])
    for u, p, r in ratings:
        v1, v2 = fac("als1", p), fac("als2", p)
        a = acc[u]
        a[0] += v1 * v1; a[1] += v1 * v2; a[2] += v2 * v2
        a[3] += int(r) * v1; a[4] += int(r) * v2
    assert set(rows) == set(acc)
    for u, (a11, a12, a22, b1, b2) in acc.items():
        a11 += ALS_LAMBDA; a22 += ALS_LAMBDA
        u1, u2 = rows[u]["u1"], rows[u]["u2"]
        # A u = b within the 1e-6 output rounding
        assert abs(a11 * u1 + a12 * u2 - b1) <= (abs(a11) + abs(a12)) * 1e-5
        assert abs(a12 * u1 + a22 * u2 - b2) <= (abs(a12) + abs(a22)) * 1e-5


def test_dedup_sweep_monotone_in_threshold(spark, sf_dir):
    rows = sorted(_rows("dedup_threshold_sweep", spark, sf_dir),
                  key=lambda r: r["threshold"])
    assert [r["threshold"] for r in rows] == [0.8, 0.85, 0.9]
    pairs = [r["n_pairs"] for r in rows]
    docs = [r["n_docs_droppable"] for r in rows]
    # tighter threshold -> subset of pairs -> both counts non-increasing
    assert pairs == sorted(pairs, reverse=True)
    assert docs == sorted(docs, reverse=True)
    for r in rows:
        assert r["n_docs_droppable"] <= r["n_pairs"] or r["n_pairs"] == 0


def test_conformal_coverage_near_nominal(spark, sf_dir):
    from etl_airflow_spotify_spark.queries.relational import CONF_ALPHA
    (r,) = _rows("conformal_interval_coverage", spark, sf_dir)
    assert r["n_train"] > r["n_cal"] > 0 and r["n_test"] > 0
    assert r["q_alpha"] > 0
    assert r["n_covered"] <= r["n_test"]
    # split-conformal guarantee: coverage ~ 1 - alpha; allow finite-
    # sample slack ~ 3 binomial sigmas
    import math
    p = 1 - CONF_ALPHA
    slack = 3 * math.sqrt(p * (1 - p) / max(r["n_test"], 1)) + 0.02
    assert abs(r["coverage"] - p) <= slack


def test_linkage_eval_recovers_every_plant(spark, sf_dir):
    """X118: a 1-substitution typo at position len-2 shares both
    blocking tokens with its original, so the pipeline must recover
    EVERY planted pair."""
    (r,) = _rows("linkage_eval_planted", spark, sf_dir)
    assert r["n_planted"] > 0
    assert r["n_recovered"] == r["n_planted"]
    assert r["planted_recall"] == 1.0
    assert r["n_predicted"] >= r["n_planted"]


def test_wilson_bound_below_confidence_and_support_aware(spark, sf_dir):
    rows = _rows("rules_wilson_ranked", spark, sf_dir)
    assert rows
    ranks = sorted(r["rank"] for r in rows)
    assert ranks == list(range(1, len(rows) + 1))
    wlbs = [r["wilson_lb"] for r in
            sorted(rows, key=lambda r: r["rank"])]
    assert wlbs == sorted(wlbs, reverse=True)
    for r in rows:
        # the lower bound never exceeds the point estimate
        assert r["wilson_lb"] <= r["confidence"] + 1e-9
        assert 0.0 <= r["wilson_lb"] <= 1.0
        assert r["sup_ab"] <= r["n"]


def test_fellegi_sunter_separates_matches(spark, sf_dir):
    """X120: FS scores must separate — every labeled match scores in a
    band at or above every band that is match-free majority, and the
    top band is match-dominated (the model's whole point)."""
    rows = sorted(_rows("fellegi_sunter_bands", spark, sf_dir),
                  key=lambda r: r["score_band"])
    assert rows
    total_matches = sum(r["n_matches"] for r in rows)
    assert total_matches > 0
    for r in rows:
        assert 0 <= r["n_matches"] <= r["n_pairs"]
    # matches concentrate at the top: every labeled match scores in
    # the HIGHEST band (typos agree on tok1/tok2/length — natural
    # near-identical names share the band, so it need not be pure),
    # the bottom band is match-free, and the top band's match rate
    # beats the overall rate
    top = rows[-1]
    assert top["n_matches"] == total_matches
    assert rows[0]["n_matches"] == 0
    overall = total_matches / sum(r["n_pairs"] for r in rows)
    assert top["n_matches"] / top["n_pairs"] > overall


def test_watermark_sweep_monotone_in_delay(spark, sf_dir):
    rows = sorted(_rows("watermark_lateness_sweep", spark, sf_dir),
                  key=lambda r: r["delay_s"])
    assert [r["delay_s"] for r in rows] == [60, 300, 900, 3600]
    lates = [r["n_late"] for r in rows]
    # longer delay -> weaker watermark -> fewer drops
    assert lates == sorted(lates, reverse=True)
    for r in rows:
        assert 0.0 <= r["late_frac"] <= 1.0


def test_emd_is_a_metric_on_sources(spark, sf_dir):
    rows = _rows("source_length_emd", spark, sf_dir)
    assert rows
    d = {}
    srcs = set()
    for r in rows:
        assert r["emd_bins"] >= 0.0
        d[(r["source_a"], r["source_b"])] = r["emd_bins"]
        srcs |= {r["source_a"], r["source_b"]}
    n = len(srcs)
    assert len(rows) == n * (n - 1) // 2   # full pairwise matrix
    # triangle inequality on a few triples (EMD is a true metric)
    import itertools
    def dist(x, y):
        return d[(min(x, y), max(x, y))]
    for a, b, c in itertools.islice(itertools.combinations(sorted(srcs), 3), 50):
        assert dist(a, c) <= dist(a, b) + dist(b, c) + 1e-6


def test_ranking_metrics_bounds_and_recall_consistency(spark, sf_dir):
    from etl_airflow_spotify_spark.queries.similarity import K
    metrics = {r["query_id"]: r
               for r in _rows("ivf_ranking_metrics", spark, sf_dir)}
    recall = {r["query_id"]: r["n_hits"]
              for r in _rows("ivf_recall_at_k", spark, sf_dir)}
    assert set(metrics) == set(recall)
    for qid, r in metrics.items():
        assert 0 <= r["n_rel"] <= K
        assert r["n_rel"] == recall[qid]    # same overlap both queries
        assert 0.0 <= r["ndcg_at_k"] <= 1.0
        assert 0.0 <= r["reciprocal_rank"] <= 1.0
        # MRR positive iff something relevant was retrieved
        assert (r["reciprocal_rank"] > 0) == (r["n_rel"] > 0)
        assert (r["first_rel_rank"] > 0) == (r["n_rel"] > 0)


def test_kcore_profile_monotone_and_fixed_point(spark, sf_dir):
    """X123: peeling can only shrink the graph; once a round changes
    nothing the profile must repeat verbatim; and at a fixed point
    every survivor has directed degree >= k among survivors, so
    edges_kept >= k * nodes_kept."""
    from etl_airflow_spotify_spark.queries.graph import (KCORE_K,
                                                        KCORE_ROUNDS)
    rows = sorted(_rows("kcore_peeling_profile", spark, sf_dir),
                  key=lambda r: r["round"])
    assert [r["round"] for r in rows] == list(range(1, KCORE_ROUNDS + 1))
    nodes = [r["nodes_kept"] for r in rows]
    edges = [r["edges_kept"] for r in rows]
    assert nodes == sorted(nodes, reverse=True)
    assert edges == sorted(edges, reverse=True)
    for a, b in zip(rows, rows[1:]):
        if (a["nodes_kept"], a["edges_kept"]) == \
                (b["nodes_kept"], b["edges_kept"]):
            # converged: the tail is the fixed point, repeated
            assert (b["nodes_kept"], b["edges_kept"]) == \
                (rows[-1]["nodes_kept"], rows[-1]["edges_kept"])
    last, prev = rows[-1], rows[-2]
    if (last["nodes_kept"], last["edges_kept"]) == \
            (prev["nodes_kept"], prev["edges_kept"]):
        assert last["edges_kept"] >= KCORE_K * last["nodes_kept"]


def test_shapley_credits_satisfy_efficiency(spark, sf_dir):
    """X124: the Shapley efficiency axiom — credits sum to
    v(full) - v(empty) = the touched-journey conversion share
    (each credit is rounded to 1e-6, so tolerance is 4 half-ulps)."""
    from pyspark.sql import functions as F
    from etl_airflow_spotify_spark.catalog import load_table
    from etl_airflow_spotify_spark.queries.events_ops import \
        SHAPLEY_CHANNELS
    rows = _rows("shapley_channel_attribution", spark, sf_dir)
    assert {r["channel"] for r in rows} == \
        {n for n, _ in SHAPLEY_CHANNELS}
    assert all(r["n_exposed"] > 0 for r in rows)
    bits = " ".join(f"WHEN '{n}' THEN {b}" for n, b in SHAPLEY_CHANNELS)
    u = (load_table(spark, sf_dir, "events")
         .groupBy("user_id", F.to_date("ts").alias("d"))
         .agg(F.expr(f"bit_or(CASE event_type {bits} ELSE 0 END)")
              .alias("mask"),
              F.max(F.when(F.col("event_type") == "purchase", 1)
                    .otherwise(0)).alias("conv"))
         .filter("mask <> 0"))
    agg = u.agg(F.count("*").alias("n"), F.sum("conv").alias("c")) \
        .collect()[0]
    v_full = round(1e6 * agg["c"] / agg["n"]) / 1e6
    assert abs(sum(r["shapley"] for r in rows) - v_full) <= 4 * 5e-7 + 1e-9


def test_decision_stump_beats_every_candidate_split(spark, sf_dir):
    """X125: the returned split per feature must (a) have counts that
    add to the corpus, (b) reduce impurity vs the parent, and (c) score
    at least as well as EVERY other candidate threshold, recomputed
    here from an independent histogram."""
    from collections import defaultdict
    from pyspark.sql import functions as F
    from etl_airflow_spotify_spark.catalog import load_table

    rows = {r["feature"]: r
            for r in _rows("decision_stump_gini", spark, sf_dir)}
    assert set(rows) == {"qty", "disc"}

    li = load_table(spark, sf_dir, "lineitem")
    hist = (li.select(
                F.col("l_quantity").cast("long").alias("qty"),
                F.round(F.col("l_discount") * 100, 0).cast("long")
                .alias("disc"),
                F.when(F.col("l_returnflag") == "R", 1).otherwise(0)
                .alias("pos"))
            .selectExpr("stack(2, 'qty', qty, 'disc', disc) "
                        "AS (feature, v)", "pos")
            .groupBy("feature", "v")
            .agg(F.count("*").alias("n"), F.sum("pos").alias("p"))
            .collect())
    by_feat = defaultdict(list)
    for h in hist:
        by_feat[h["feature"]].append((h["v"], h["n"], h["p"]))
    for feat, cells in by_feat.items():
        cells.sort()
        n_tot = sum(n for _, n, _ in cells)
        p_tot = sum(p for _, _, p in cells)
        best = rows[feat]
        assert best["n_left"] + best["n_right"] == n_tot
        assert best["pos_left"] + best["pos_right"] == p_tot
        assert best["gini_micro"] <= best["parent_gini_micro"]

        def score(nl, pl):
            nr, pr = n_tot - nl, p_tot - pl
            return (pl * pl + (nl - pl) * (nl - pl)) / nl \
                + (pr * pr + (nr - pr) * (nr - pr)) / nr

        best_score = score(best["n_left"], best["pos_left"])
        nl = pl = 0
        for v, n, p in cells:
            nl, pl = nl + n, pl + p
            if nl == n_tot:
                continue
            assert score(nl, pl) <= best_score + 1e-9


def test_greedy_cover_trace_is_submodular(spark, sf_dir):
    """X126: greedy marginal gains are non-increasing (submodularity of
    coverage), cumulative coverage is exactly the gain prefix-sum and
    never exceeds the universe, and no source repeats."""
    rows = sorted(_rows("greedy_source_cover", spark, sf_dir),
                  key=lambda r: r["round"])
    from etl_airflow_spotify_spark.queries.curation import COVER_ROUNDS
    assert [r["round"] for r in rows] == list(range(1, COVER_ROUNDS + 1))
    gains = [r["gain"] for r in rows]
    assert gains == sorted(gains, reverse=True)
    assert len({r["source"] for r in rows}) == len(rows)
    run = 0
    for r in rows:
        run += r["gain"]
        assert r["covered"] == run
        assert r["covered"] <= r["universe"]


def test_hits_scores_normalized_and_typed(spark, sf_dir):
    """X127: integer L-inf normalization bounds every score in
    [0, HITS_SCALE] with the max attained for each kind; hubs are
    supplier keys, authorities are part keys; top lists are sorted
    and deduplicated."""
    from etl_airflow_spotify_spark.catalog import load_table
    from etl_airflow_spotify_spark.queries.graph import (HITS_SCALE,
                                                         HITS_TOPK)
    rows = _rows("hits_supplier_part", spark, sf_dir)
    by_kind = {"hub": [], "authority": []}
    for r in rows:
        by_kind[r["kind"]].append(r)
    li = load_table(spark, sf_dir, "lineitem")
    supp = {r[0] for r in li.select("l_suppkey").distinct().collect()}
    part = {r[0] for r in li.select("l_partkey").distinct().collect()}
    for kind, rs in by_kind.items():
        assert 0 < len(rs) <= HITS_TOPK
        scores = [r["score"] for r in rs]
        assert max(scores) == HITS_SCALE
        assert all(0 <= s <= HITS_SCALE for s in scores)
        nodes = [r["node"] for r in rs]
        assert len(set(nodes)) == len(nodes)
        assert set(nodes) <= (supp if kind == "hub" else part)


def test_pattern_negation_matches_bruteforce_simulation(spark, sf_dir):
    """X128: the window-function plan must agree exactly with a
    per-journey brute-force simulation of the pattern semantics
    (exists click c with a view before c and no error in (c, p))."""
    from collections import defaultdict
    from etl_airflow_spotify_spark.queries.events_ops import _ev

    evs = (_ev(spark, sf_dir)
           .selectExpr("user_id", "event_id", "ts", "event_type",
                       "cast(ts as date) AS d").collect())
    journeys = defaultdict(list)
    for e in evs:
        journeys[(e["user_id"], e["d"])].append(e)
    exp = defaultdict(lambda: [0, 0, set()])
    for (uid, d), rows in journeys.items():
        rows.sort(key=lambda e: (e["ts"], e["event_id"]))
        for i, e in enumerate(rows):
            if e["event_type"] != "purchase":
                continue
            exp[d][0] += 1
            ok = False
            for j in range(i):
                if rows[j]["event_type"] != "click":
                    continue
                if not any(rows[v]["event_type"] == "view"
                           for v in range(j)):
                    continue
                if any(rows[k]["event_type"] == "error"
                       and rows[j]["ts"] < rows[k]["ts"]
                       for k in range(j + 1, i)):
                    continue
                ok = True
                break
            if ok:
                exp[d][1] += 1
                exp[d][2].add(uid)
    got = {r["d"]: r for r in _rows("pattern_funnel_negation",
                                    spark, sf_dir)}
    assert set(got) == set(exp)
    for d, (n_p, n_m, users) in exp.items():
        assert got[d]["n_purchases"] == n_p
        assert got[d]["n_matched"] == n_m
        assert got[d]["n_users_matched"] == len(users)


def test_ks_matrix_is_a_metric_and_matches_bruteforce(spark, sf_dir):
    """X129: KS as integers must equal a brute-force CDF sup computed
    in Python from the raw values, and the rescaled distances must
    satisfy the triangle inequality (KS is a true metric)."""
    from collections import Counter, defaultdict
    from etl_airflow_spotify_spark.queries.events_ops import _ev

    vals = defaultdict(list)
    for r in (_ev(spark, sf_dir).filter("value IS NOT NULL")
              .select("event_type", "value").collect()):
        vals[r["event_type"]].append(r["value"])
    rows = _rows("ks_drift_matrix", spark, sf_dir)
    d = {}
    for r in rows:
        a, b = r["type_a"], r["type_b"]
        assert len(vals[a]) == r["n_a"] and len(vals[b]) == r["n_b"]
        ca, cb = Counter(vals[a]), Counter(vals[b])
        grid = sorted(set(ca) | set(cb))
        cum_a = cum_b = 0
        sup = 0
        for v in grid:
            cum_a += ca.get(v, 0)
            cum_b += cb.get(v, 0)
            sup = max(sup, abs(cum_a * r["n_b"] - cum_b * r["n_a"]))
        assert sup == r["ks_num"]
        d[(a, b)] = d[(b, a)] = r["ks_num"] / (r["n_a"] * r["n_b"])
    types = sorted(vals)
    assert len(rows) == len(types) * (len(types) - 1) // 2
    for x in types:
        for y in types:
            for z in types:
                if len({x, y, z}) == 3:
                    assert d[(x, z)] <= d[(x, y)] + d[(y, z)] + 1e-12


def test_forecast_backtest_eval_windows_and_errors(spark, sf_dir):
    """X130: each model's eval-day count equals (days with a forecast
    source); snaive7 evaluates exactly 6 fewer days per type than
    naive1 on a gap-free month; mae * n == total_abs_err (exact
    integer check after unscaling the 6-dp round)."""
    rows = _rows("forecast_backtest_naive", spark, sf_dir)
    by = {(r["model"], r["event_type"]): r for r in rows}
    types = {r["event_type"] for r in rows}
    assert len(rows) == 2 * len(types)
    for t in types:
        n1 = by[("naive1", t)]["n_days"]
        n7 = by[("snaive7", t)]["n_days"]
        assert n1 - n7 == 6
    for r in rows:
        assert r["total_abs_err"] >= 0
        assert abs(r["mae"] * r["n_days"] - r["total_abs_err"]) \
            <= r["n_days"] * 5e-7 + 1e-9


def test_allen_relations_partition_the_pair_set(spark, sf_dir):
    """X131: relation counts must sum to sum_c C(n_c, 2) over
    per-customer interval counts (the case ladder is exhaustive and
    each unordered pair is classified exactly once), shares to 1."""
    from pyspark.sql import functions as F
    from etl_airflow_spotify_spark.catalog import load_table

    rows = _rows("allen_interval_profile", spark, sf_dir)
    allowed = {"before", "meets", "overlaps", "finished_by", "contains",
               "starts", "equals"}
    assert {r["relation"] for r in rows} <= allowed
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    per_ck = (li.join(orders.select(
                  F.col("o_orderkey").alias("l_orderkey"), "o_custkey"),
                  "l_orderkey")
              .select("o_custkey", "l_orderkey").distinct()
              .groupBy("o_custkey").count().collect())
    expected_pairs = sum(r["count"] * (r["count"] - 1) // 2
                         for r in per_ck)
    assert sum(r["n_pairs"] for r in rows) == expected_pairs
    assert abs(sum(r["share"] for r in rows) - 1.0) \
        <= len(rows) * 5e-7 + 1e-9


def test_consistent_hashing_only_moves_to_the_new_shard(spark, sf_dir):
    """X132: the defining consistent-hashing property — growing the
    ring N -> N+1 moves documents ONLY onto the new shard; occupancy
    identities hold; totals cover the corpus."""
    from etl_airflow_spotify_spark.catalog import load_table
    from etl_airflow_spotify_spark.queries.scale import RING_SHARDS

    rows = _rows("consistent_hash_rebalance", spark, sf_dir)
    n_docs = load_table(spark, sf_dir, "documents").count()
    assert sum(r["n_after"] for r in rows) == n_docs
    for r in rows:
        assert r["n_stayed"] + r["n_moved_in"] == r["n_after"]
        if r["shard"] != RING_SHARDS:  # pre-existing shard
            assert r["n_moved_in"] == 0
    new = [r for r in rows if r["shard"] == RING_SHARDS]
    assert len(new) == 1 and new[0]["n_stayed"] == 0
    assert new[0]["n_moved_in"] > 0


def test_frequent_triples_downward_closure(spark, sf_dir):
    """X133: every reported triple's support obeys downward closure —
    sup(xyz) <= sup of each sub-pair, all sub-pairs meet the relative
    minsup, confidence = sup_xyz/sup_xy exactly, ordering is by
    support descending."""
    import math
    from pyspark.sql import functions as F
    from etl_airflow_spotify_spark.catalog import load_table
    from etl_airflow_spotify_spark.queries.graph import \
        TRIPLE_MINSUP_FRAC

    rows = _rows("frequent_brand_triples", spark, sf_dir)
    if not rows:  # tiny SFs may clear no triple over minsup
        return
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    ob = (li.join(part.select(F.col("p_partkey").alias("l_partkey"),
                              "p_brand"), "l_partkey")
          .select(F.col("l_orderkey").alias("o"),
                  F.col("p_brand").alias("b")).distinct())
    n_orders = ob.select("o").distinct().count()
    t = math.ceil(TRIPLE_MINSUP_FRAC * n_orders)
    pair_sup = {(r["x"], r["y"]): r["n"] for r in
                (ob.alias("a").join(
                    ob.alias("c"),
                    (F.col("a.o") == F.col("c.o"))
                    & (F.col("a.b") < F.col("c.b")))
                 .groupBy(F.col("a.b").alias("x"),
                          F.col("c.b").alias("y"))
                 .agg(F.count("*").alias("n")).collect())}
    sups = [r["sup_xyz"] for r in rows]
    assert sups == sorted(sups, reverse=True)
    for r in rows:
        x, y, z = r["x"], r["y"], r["z"]
        assert x < y < z
        subs = [pair_sup[(x, y)], pair_sup[(x, z)], pair_sup[(y, z)]]
        assert r["sup_xyz"] >= t
        assert all(r["sup_xyz"] <= s for s in subs)
        assert all(s >= t for s in subs)
        assert r["sup_xy"] == pair_sup[(x, y)]
        assert abs(r["conf_xy_z"] - r["sup_xyz"] / r["sup_xy"]) <= 5e-7


def test_snm_candidate_volume_is_linear_and_recall_positive(spark, sf_dir):
    """X134: SNM's defining property — candidate pairs <= (w-1) *
    records regardless of block-size skew (strictly fewer: bucket
    tails); predicted pairs are a subset of candidates; recovered <=
    planted; recall consistent with the counts."""
    from etl_airflow_spotify_spark.queries.linkage import SNM_W

    r = _rows("snm_blocking_eval", spark, sf_dir)[0]
    assert r["n_candidates"] <= (SNM_W - 1) * r["n_records"]
    assert r["n_predicted"] <= r["n_candidates"]
    assert 0 <= r["n_recovered"] <= r["n_planted"]
    assert abs(r["planted_recall"]
               - r["n_recovered"] / max(r["n_planted"], 1)) <= 1e-6
    assert r["planted_recall"] > 0.5  # prefix-preserving plants


def test_rake_scores_consistent_with_word_stats(spark, sf_dir):
    """X135: recompute word degree/freq from raw text in Python and
    verify each reported phrase's micro score is exactly the sum of
    its words' snapped degree/freq scores; phrase lengths respect the
    cap; ranking is by score."""
    from collections import Counter
    from etl_airflow_spotify_spark.queries.text import (_docs,
                                                        RAKE_MAX_LEN,
                                                        RAKE_STOPWORDS)
    docs = _docs(spark, sf_dir).select("text").collect()
    freq, degree = Counter(), Counter()
    for (text,) in docs:
        phrase, phrases = [], []
        for w in text.strip().lower().split():
            if w in RAKE_STOPWORDS:
                if phrase:
                    phrases.append(phrase)
                phrase = []
            else:
                phrase.append(w)
        if phrase:
            phrases.append(phrase)
        for p in phrases:
            if len(p) > RAKE_MAX_LEN:
                continue
            for w in p:
                freq[w] += 1
                degree[w] += len(p)
    score = {w: round(1e6 * degree[w] / freq[w]) for w in freq}
    rows = _rows("rake_keyphrases", spark, sf_dir)
    scores = [r["score_micro"] for r in rows]
    assert scores == sorted(scores, reverse=True)
    for r in rows:
        ws = r["phrase"].split(" ")
        assert 1 <= len(ws) == r["n_words"] <= RAKE_MAX_LEN
        assert r["score_micro"] == sum(score[w] for w in ws)
        assert r["n_occurrences"] >= 1


def test_acf_matches_bruteforce_and_is_bounded(spark, sf_dir):
    """X136: the integer-ratio ACF must equal a float brute force on
    the collected daily series to 1e-9, and |acf| <= 1 + ulp slack."""
    from collections import defaultdict
    from etl_airflow_spotify_spark.queries.events_ops import _ev
    import pyspark.sql.functions as F

    daily = defaultdict(dict)
    for r in (_ev(spark, sf_dir)
              .groupBy("event_type", F.to_date("ts").alias("d"))
              .count().collect()):
        daily[r["event_type"]][r["d"]] = r["count"]
    rows = _rows("event_acf_profile", spark, sf_dir)
    assert rows
    for r in rows:
        series = daily[r["event_type"]]
        days = sorted(series)
        n = len(days)
        assert r["n_days"] == n
        m = sum(series.values()) / n
        den = sum((series[d] - m) ** 2 for d in days)
        num = sum((series[d] - m) * (series[d2] - m)
                  for d in days
                  for d2 in [d + __import__("datetime")
                             .timedelta(days=r["lag"])]
                  if d2 in series)
        assert abs(r["acf_num"] / r["acf_den"] - num / den) <= 1e-9
        assert abs(r["acf"]) <= 1.0 + 1e-9


def test_threshold_selection_beats_all_candidates(spark, sf_dir):
    """X137: recompute the full candidate sweep in Python from the raw
    (score, label) pairs — each winner must attain the global optimum
    of its criterion, and confusion counts must be internally
    consistent."""
    from collections import defaultdict
    from etl_airflow_spotify_spark.catalog import load_table
    import pyspark.sql.functions as F

    li = (load_table(spark, sf_dir, "lineitem")
          .select(F.expr("CAST(FLOOR(l_extendedprice * 100 + 0.5) "
                         "AS BIGINT)").alias("s"),
                  (F.col("l_returnflag") == "R").cast("int").alias("y"))
          .collect())
    hist = defaultdict(lambda: [0, 0])
    for r in li:
        hist[r["s"]][0] += 1
        hist[r["s"]][1] += r["y"]
    p = sum(v[1] for v in hist.values())
    neg = sum(v[0] - v[1] for v in hist.values())
    best_j, best_f1 = None, None
    tp = fp = 0
    for s in sorted(hist, reverse=True):
        tp += hist[s][1]
        fp += hist[s][0] - hist[s][1]
        j = tp * neg - fp * p
        f1 = 2 * tp / (2 * tp + fp + (p - tp))
        if best_j is None or j > best_j[0]:
            best_j = (j, s, tp, fp)
        if best_f1 is None or f1 > best_f1[0] + 1e-15:
            best_f1 = (f1, s, tp, fp)
    rows = {r["criterion"]: r
            for r in _rows("optimal_threshold_selection", spark, sf_dir)}
    ry, rf = rows["youden"], rows["f1"]
    assert ry["tp"] * neg - ry["fp"] * p == best_j[0]
    assert abs(2 * rf["tp"] / (2 * rf["tp"] + rf["fp"] + rf["fn"])
               - best_f1[0]) <= 1e-12
    for r in rows.values():
        assert r["tp"] + r["fn"] == p
        assert r["fp"] + r["tn"] == neg


def test_kappa_matches_bruteforce_and_bounds(spark, sf_dir):
    """X138: recompute both raters in Python over the raw documents,
    rebuild kappa from the contingency table, and check the exact
    integer identity plus the -1 <= kappa <= 1 bound."""
    from etl_airflow_spotify_spark.catalog import load_table
    from etl_airflow_spotify_spark.queries.curation import (
        KAPPA_LEN_MIN, KAPPA_STOP_PCT)

    docs = load_table(spark, sf_dir, "documents") \
        .select("text", "n_chars").collect()
    n = len(docs)
    agree = a_keep = b_keep = 0
    for r in docs:
        toks = r["text"].strip().lower().split()
        a = 1 if r["n_chars"] >= KAPPA_LEN_MIN else 0
        n_stop = sum(1 for w in toks if w in ("the", "a"))
        b = 1 if n_stop * 100 <= len(toks) * KAPPA_STOP_PCT else 0
        agree += a == b
        a_keep += a
        b_keep += b
    got = _rows("rater_agreement_kappa", spark, sf_dir)[0]
    assert (got["n"], got["n_agree"], got["a_keep"], got["b_keep"]) \
        == (n, agree, a_keep, b_keep)
    chance = a_keep * b_keep + (n - a_keep) * (n - b_keep)
    assert got["kappa_num"] == n * agree - chance
    assert got["kappa_den"] == n * n - chance
    assert -1.0 - 1e-9 <= got["kappa"] <= 1.0 + 1e-9


def test_gini_matches_bruteforce_and_bounds(spark, sf_dir):
    """X139: recompute each nation's Gini from raw per-customer cents
    in Python and verify the integer numerator/denominator exactly;
    0 <= G < 1 for all-positive revenues."""
    from collections import defaultdict
    from etl_airflow_spotify_spark.catalog import load_table
    import pyspark.sql.functions as F

    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = {r["n_nationkey"]: r["n_name"]
              for r in load_table(spark, sf_dir, "nation").collect()}
    per = defaultdict(lambda: defaultdict(int))
    for r in (orders.join(customer.select(
                  F.col("c_custkey").alias("o_custkey"), "c_nationkey"),
                  "o_custkey")
              .select("c_nationkey", "o_custkey",
                      F.round(F.col("o_totalprice") * 100, 0)
                      .cast("long").alias("cents")).collect()):
        per[r["c_nationkey"]][r["o_custkey"]] += r["cents"]
    got = {r["nation"]: r
           for r in _rows("nation_revenue_gini", spark, sf_dir)}
    assert set(got) == {nation[nk] for nk in per}
    for nk, custs in per.items():
        xs = sorted(custs.values())
        n, total = len(xs), sum(xs)
        iw = sum((i + 1) * x for i, x in enumerate(xs))
        r = got[nation[nk]]
        assert r["n_customers"] == n and r["total_cents"] == total
        assert r["gini_num"] == 2 * iw - (n + 1) * total
        assert r["gini_den"] == n * total
        assert 0.0 <= r["gini"] < 1.0


def test_token_budget_selection_is_the_greedy_prefix(spark, sf_dir):
    """X140: the selected set must equal the Python greedy best-first
    prefix (quality desc, doc_id asc within a level) under the same
    budget — per-source counts, token totals, and the budget itself."""
    from collections import defaultdict
    from etl_airflow_spotify_spark.catalog import load_table
    from etl_airflow_spotify_spark.operators import text as T
    from etl_airflow_spotify_spark.queries.curation import \
        BUDGET_FRAC_PCT
    import pyspark.sql.functions as F

    base = (load_table(spark, sf_dir, "documents")
            .select("doc_id", "source",
                    F.size(F.split(F.trim("text"), r"\s+")).cast("long")
                    .alias("ntok"),
                    F.round(1000000.0 * T.quality_score(F.col("text")), 0)
                    .cast("long").alias("qm")).collect())
    budget = sum(r["ntok"] for r in base) * BUDGET_FRAC_PCT // 100
    order = sorted(base, key=lambda r: (-r["qm"], r["doc_id"]))
    run = 0
    exp = defaultdict(lambda: [0, 0, None])
    for r in order:
        if run + r["ntok"] > budget:
            # greedy prefix stops INSIDE the boundary level only
            # for docs that no longer fit; later same-level docs may
            # still fit? No: prefix semantics — stop at first overflow
            # within the level ordering.
            break
        run += r["ntok"]
        e = exp[r["source"]]
        e[0] += 1
        e[1] += r["ntok"]
        e[2] = r["qm"] if e[2] is None else min(e[2], r["qm"])
    got = {r["source"]: r
           for r in _rows("token_budget_selection", spark, sf_dir)}
    assert set(got) == set(exp)
    for src, (n, toks, minq) in exp.items():
        r = got[src]
        assert r["budget_tokens"] == budget
        assert (r["n_selected"], r["tokens_selected"],
                r["min_quality_micro"]) == (n, toks, minq)
    assert sum(r["tokens_selected"] for r in got.values()) <= budget


def test_venn_regions_match_python_sets(spark, sf_dir):
    """X141: rebuild the three shingle sets in Python and check every
    region count by direct set algebra (absent regions are zero)."""
    from collections import defaultdict
    from etl_airflow_spotify_spark.queries.text import (
        _docs, OVERLAP_SHINGLE_K, VENN_SOURCES)

    k = OVERLAP_SHINGLE_K
    sets = defaultdict(set)
    for r in (_docs(spark, sf_dir)
              .filter(f"source IN {tuple(VENN_SOURCES)}")
              .select("source", "text").collect()):
        ts = r["text"].strip().lower().split()
        n = max(len(ts) - (k - 1), 1)
        for i in range(n):
            sets[r["source"]].add(" ".join(ts[i:i + k]))
    universe = set().union(*sets.values())
    exp = defaultdict(int)
    for sg in universe:
        mask = sum(1 << i for i, s in enumerate(VENN_SOURCES)
                   if sg in sets[s])
        exp[mask] += 1
    got = {r["region"]: r["n_shingles"]
           for r in _rows("source_venn_regions", spark, sf_dir)}
    for m in range(1, 8):
        assert got.get(m, 0) == exp.get(m, 0)
    assert sum(got.values()) == len(universe)


def test_forest_bags_and_oob_disjointness(spark, sf_dir):
    """X142: one stump per bag; each stump's leaf predictions are the
    bag-local majority classes; OOB accuracy is consistent with its
    counts and lies in [0, 1]; every row has feature in the stump
    grammar and a valid split."""
    from etl_airflow_spotify_spark.queries.ml import FOREST_BAGS

    rows = _rows("bagged_stump_forest", spark, sf_dir)
    assert sorted(r["bag"] for r in rows) == list(range(FOREST_BAGS))
    accs = {(r["oob_n"], r["oob_correct"], r["oob_acc"]) for r in rows}
    assert len(accs) == 1  # global OOB summary repeated per bag
    n, c, a = next(iter(accs))
    assert 0 < c <= n
    assert abs(a - c / n) <= 1e-6
    for r in rows:
        assert r["feature"] in ("qty", "disc")
        assert r["left_pred"] in (0, 1) and r["right_pred"] in (0, 1)


def test_boosting_never_increases_mse(spark, sf_dir):
    """X143: the additive-stage invariant — MSE(mean) >= MSE(stage 1)
    >= MSE(stage 1+2); stage rows are well-formed; stage-1 split is
    the SSE optimum (verified by an independent histogram sweep)."""
    from collections import defaultdict
    from etl_airflow_spotify_spark.catalog import load_table
    import pyspark.sql.functions as F

    rows = {r["stage"]: r for r in _rows("boosted_stumps_l2",
                                         spark, sf_dir)}
    assert set(rows) == {0, 1, 2}
    assert rows[0]["mse_cents2"] >= rows[1]["mse_cents2"] \
        >= rows[2]["mse_cents2"]
    assert rows[0]["split_at"] is None
    # independent SSE sweep for stage 1
    hist = defaultdict(lambda: defaultdict(lambda: [0, 0]))
    for r in (load_table(spark, sf_dir, "lineitem")
              .select(F.col("l_quantity").cast("long").alias("qty"),
                      F.round(F.col("l_discount") * 100, 0).cast("long")
                      .alias("disc"),
                      F.round(F.col("l_extendedprice") * 100, 0)
                      .cast("long").alias("y")).collect()):
        for feat in ("qty", "disc"):
            cell = hist[feat][r[feat]]
            cell[0] += 1
            cell[1] += r["y"]
    best = None
    for feat, cells in hist.items():
        n_tot = sum(c[0] for c in cells.values())
        sy_tot = sum(c[1] for c in cells.values())
        nl = syl = 0
        for v in sorted(cells):
            nl += cells[v][0]
            syl += cells[v][1]
            if nl == n_tot:
                continue
            sc = syl * syl / nl + (sy_tot - syl) ** 2 / (n_tot - nl)
            if best is None or sc > best[0] + 1e-9:
                best = (sc, feat, v)
    assert (rows[1]["feature"], rows[1]["split_at"]) == best[1:]


def test_simpson_audit_signs_match_bruteforce(spark, sf_dir):
    """X144: recompute per-brand and pooled covariance numerators with
    Python integers and verify every sign and reversal flag."""
    from collections import defaultdict
    from etl_airflow_spotify_spark.catalog import load_table
    import pyspark.sql.functions as F

    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    rows = (li.join(part.select(F.col("p_partkey").alias("l_partkey"),
                                "p_brand"), "l_partkey")
            .select("p_brand",
                    F.round(F.col("l_discount") * 100, 0).cast("long")
                    .alias("x"),
                    F.col("l_quantity").cast("long").alias("y"))
            .collect())
    acc = defaultdict(lambda: [0, 0, 0, 0])  # n, sx, sy, sxy
    pooled = [0, 0, 0, 0]
    for r in rows:
        for a in (acc[r["p_brand"]], pooled):
            a[0] += 1
            a[1] += r["x"]
            a[2] += r["y"]
            a[3] += r["x"] * r["y"]

    def s(a):
        c = a[0] * a[3] - a[1] * a[2]
        return (c > 0) - (c < 0)

    got = {r["brand"]: r
           for r in _rows("simpson_paradox_audit", spark, sf_dir)}
    assert set(got) == set(acc)
    ps = s(pooled)
    for brand, a in acc.items():
        r = got[brand]
        assert r["n"] == a[0]
        assert r["brand_sign"] == s(a)
        assert r["pooled_sign"] == ps
        assert r["reversed"] == (1 if s(a) * ps == -1 else 0)


def test_hilbert_index_is_a_true_hilbert_curve(spark, sf_dir):
    """X145: the generated-SQL Hilbert transform must be a bijection
    on the full grid with unit-step adjacency between consecutive
    indices (the defining Hilbert property), verified by replaying
    the generated stage expressions in Python; and per-rectangle run
    counts must match a brute-force recomputation for both curves."""
    from etl_airflow_spotify_spark.queries.scale import (
        CURVE_PRICE_W, CURVE_RECTS, HILBERT_N)
    from etl_airflow_spotify_spark.catalog import load_table
    import pyspark.sql.functions as F

    def xy2d(x, y):
        d = 0
        s = HILBERT_N // 2
        while s > 0:
            rx = 1 if (x & s) > 0 else 0
            ry = 1 if (y & s) > 0 else 0
            d += s * s * ((3 * rx) ^ ry)
            if ry == 0:
                if rx == 1:
                    x, y = HILBERT_N - 1 - x, HILBERT_N - 1 - y
                x, y = y, x
            s //= 2
        return d

    pos = {}
    for x in range(HILBERT_N):
        for y in range(HILBERT_N):
            pos[xy2d(x, y)] = (x, y)
    assert sorted(pos) == list(range(HILBERT_N * HILBERT_N))
    for d in range(1, HILBERT_N * HILBERT_N):
        (x1, y1), (x2, y2) = pos[d - 1], pos[d]
        assert abs(x1 - x2) + abs(y1 - y2) == 1

    cells = {(r["px"], r["qy"]) for r in
             (load_table(spark, sf_dir, "lineitem")
              .selectExpr(
                  f"CAST(LEAST(FLOOR(l_extendedprice / {CURVE_PRICE_W}),"
                  f" {HILBERT_N - 1}) AS BIGINT) AS px",
                  "CAST(l_quantity - 1 AS BIGINT) AS qy")
              .distinct().collect())}

    def zidx(x, y):
        z = 0
        for i in range(6):
            z |= ((x >> i) & 1) << (2 * i)
            z |= ((y >> i) & 1) << (2 * i + 1)
        return z

    got = {(r["rect_id"], r["curve"]): r
           for r in _rows("curve_layout_fragmentation", spark, sf_dir)}
    for rid, (xl, xh, yl, yh) in enumerate(CURVE_RECTS):
        inside = [(x, y) for (x, y) in cells
                  if xl <= x <= xh and yl <= y <= yh]
        for curve, f in (("hilbert", xy2d), ("zorder", zidx)):
            idxs = sorted(f(x, y) for x, y in inside)
            runs = sum(1 for j, v in enumerate(idxs)
                       if j == 0 or v - idxs[j - 1] != 1)
            r = got[(rid, curve)]
            assert r["n_cells"] == len(idxs)
            assert r["n_runs"] == runs


def test_gformula_ate_matches_bruteforce(spark, sf_dir):
    """X146: recompute the standardized and naive ATEs in Python from
    raw rows; the adjusted estimate must equal the weighted stratum
    fold, and every stratum term must match its snapped value."""
    from collections import defaultdict
    from etl_airflow_spotify_spark.catalog import load_table
    from etl_airflow_spotify_spark.queries.ml import ATE_TREAT_PCT
    import pyspark.sql.functions as F

    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    rows = (li.join(part.select(F.col("p_partkey").alias("l_partkey"),
                                "p_brand"), "l_partkey")
            .select("p_brand", "l_discount",
                    F.col("l_quantity").cast("long").alias("y"))
            .collect())
    acc = defaultdict(lambda: [0, 0, 0, 0])  # n1, sy1, n0, sy0
    for r in rows:
        t = 1 if r["l_discount"] >= ATE_TREAT_PCT / 100.0 else 0
        a = acc[r["p_brand"]]
        if t:
            a[0] += 1
            a[1] += r["y"]
        else:
            a[2] += 1
            a[3] += r["y"]
    terms, n_tot = {}, 0
    for s, (n1, sy1, n0, sy0) in acc.items():
        if n1 > 0 and n0 > 0:
            n_s = n1 + n0
            n_tot += n_s
            terms[s] = (n_s, n1, n0,
                        round(1e6 * n_s * (sy1 / n1 - sy0 / n0)))
    got = _rows("gformula_ate_standardization", spark, sf_dir)
    assert {r["stratum"] for r in got} == set(terms)
    ate = sum(t[3] for t in terms.values()) / n_tot / 1e6
    for r in got:
        n_s, n1, n0, tm = terms[r["stratum"]]
        assert (r["n_s"], r["n_treated"], r["n_control"],
                r["term_micro"]) == (n_s, n1, n0, tm)
        assert abs(r["ate_adjusted"] - ate) <= 1e-6
        assert r["ate_naive"] is not None


def test_capture_recapture_matches_set_algebra(spark, sf_dir):
    """X147: daily capture sets recomputed in Python must reproduce
    n1/n2/m/n_true exactly; Chapman estimate honors m <= min(n1, n2)
    and exceeds each single capture when overlap exists."""
    from collections import defaultdict
    from etl_airflow_spotify_spark.queries.events_ops import _ev

    views, clicks, active = (defaultdict(set), defaultdict(set),
                             defaultdict(set))
    for e in (_ev(spark, sf_dir)
              .selectExpr("cast(ts as date) AS d", "user_id",
                          "event_type").collect()):
        active[e["d"]].add(e["user_id"])
        if e["event_type"] == "view":
            views[e["d"]].add(e["user_id"])
        elif e["event_type"] == "click":
            clicks[e["d"]].add(e["user_id"])
    got = {r["d"]: r for r in _rows("capture_recapture_daily",
                                    spark, sf_dir)}
    assert set(got) == set(active)
    for d, r in got.items():
        n1, n2 = len(views[d]), len(clicks[d])
        m = len(views[d] & clicks[d])
        assert (r["n1"], r["n2"], r["m"]) == (n1, n2, m)
        assert r["n_true"] == len(active[d])
        assert m <= min(n1, n2)
        est = (n1 + 1) * (n2 + 1) / (m + 1) - 1
        assert abs(r["n_hat"] - est) <= 5e-7
        if m > 0:
            assert r["n_hat"] >= max(n1, n2) - 1e-9


def test_apportionment_sums_and_quota_property(spark, sf_dir):
    """X148: seats sum exactly to the budget; every stratum receives
    floor(quota) or ceil(quota) (Hamilton's quota property); the
    extra seats go precisely to the top-k remainders under the
    deterministic ordering."""
    from etl_airflow_spotify_spark.queries.sampling import \
        APPORTION_SEATS

    rows = _rows("stratum_seat_apportionment", spark, sf_dir)
    n = sum(r["n_docs"] for r in rows)
    assert sum(r["seats"] for r in rows) == APPORTION_SEATS
    order = sorted(rows, key=lambda r: (-r["remainder_num"],
                                        -r["n_docs"], r["stratum"]))
    k = APPORTION_SEATS - sum(r["floor_seats"] for r in rows)
    for i, r in enumerate(order):
        assert r["extra"] == (1 if i < k else 0)
        assert r["seats"] == r["floor_seats"] + r["extra"]
        quota = APPORTION_SEATS * r["n_docs"] / n
        assert r["floor_seats"] == int(quota)
        assert int(quota) <= r["seats"] <= int(quota) + 1


def test_join_order_estimates_and_ranks(spark, sf_dir):
    """X149: replay the Selinger arithmetic from independently
    collected stats; ranks must order by est_cost; the keyed plans'
    actual first-join sizes must equal true join counts."""
    from etl_airflow_spotify_spark.catalog import load_table

    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nl, no, nc = li.count(), orders.count(), customer.count()
    dl = li.select("l_orderkey").distinct().count()
    do_ = orders.select("o_orderkey").distinct().count()
    dck = orders.select("o_custkey").distinct().count()
    dcc = customer.select("c_custkey").distinct().count()
    est_lo = nl * no // max(dl, do_)
    est_oc = no * nc // max(dck, dcc)
    exp = {
        "LO_C": (est_lo, est_lo + est_lo * nc // max(dck, dcc)),
        "OC_L": (est_oc, est_oc + est_oc * nl // max(do_, dl)),
        "LC_O": (nl * nc, nl * nc + nl * nc * no // max(do_, dl)),
    }
    rows = {r["plan"]: r for r in _rows("join_order_cost_explorer",
                                        spark, sf_dir)}
    assert set(rows) == set(exp)
    for plan, (ef, ec) in exp.items():
        assert (rows[plan]["est_first"], rows[plan]["est_cost"]) \
            == (ef, ec)
    order = sorted(rows.values(), key=lambda r: (r["est_cost"],
                                                 r["plan"]))
    assert [r["rank"] for r in order] == [1, 2, 3]
    act_lo = li.join(orders, orders.o_orderkey == li.l_orderkey).count()
    assert rows["LO_C"]["actual_first"] == act_lo
    assert rows["LC_O"]["actual_first"] == nl * nc


def test_bradley_terry_replays_mm_trajectory(spark, sf_dir):
    """X150: rebuild duels and the 2-round MM fixed-point arithmetic
    in Python integers; ratings, wins and games must match exactly
    for every reported supplier."""
    from collections import defaultdict
    from etl_airflow_spotify_spark.catalog import load_table
    from etl_airflow_spotify_spark.queries.graph import (BT_ITERS,
                                                         BT_SCALE)
    import pyspark.sql.functions as F

    ps = (load_table(spark, sf_dir, "lineitem")
          .groupBy(F.col("l_partkey").alias("p"),
                   F.col("l_suppkey").alias("s"))
          .agg(F.sum(F.round(F.col("l_extendedprice") * 100, 0)
                     .cast("long")).alias("cents"),
               F.count("*").alias("n")).collect())
    by_part = defaultdict(list)
    for r in ps:
        by_part[r["p"]].append((r["s"], r["cents"], r["n"]))
    wins = defaultdict(int)
    games = defaultdict(lambda: defaultdict(int))
    for rows in by_part.values():
        rows.sort()
        for x in range(len(rows)):
            for y in range(x + 1, len(rows)):
                si, ci, ni = rows[x]
                sj, cj, nj = rows[y]
                if ci * nj == cj * ni:
                    continue
                w = si if ci * nj < cj * ni else sj
                loser = sj if w == si else si
                wins[w] += 1
                games[si][sj] += 1
                games[sj][si] += 1
    supp = set(games)
    g = {s: BT_SCALE for s in supp}
    for _ in range(BT_ITERS):
        denom = {}
        for s in supp:
            denom[s] = sum(round(n * 1e12 / (g[s] + g[o]))
                           for o, n in games[s].items())
        g = {s: round(wins.get(s, 0) * 1e12 / max(denom[s], 1))
             for s in supp}
    got = _rows("bradley_terry_suppliers", spark, sf_dir)
    order = sorted(supp, key=lambda s: (-g[s], s))
    assert [r["supplier"] for r in got] == order[:len(got)]
    for r in got:
        s = r["supplier"]
        assert r["rating_micro"] == g[s]
        assert r["wins"] == wins.get(s, 0)
        assert r["games"] == sum(games[s].values())


def test_weighted_jaccard_bounds_and_bruteforce(spark, sf_dir):
    """X151: recompute weighted Jaccard from Python Counters for
    every pair; J_W in (0, 1]; and J_W <= set Jaccard of the token
    vocabularies (multiplicity can only shrink the ratio here since
    corpora share vocabulary)."""
    from collections import Counter, defaultdict
    from etl_airflow_spotify_spark.queries.text import _docs

    toks = defaultdict(Counter)
    for r in _docs(spark, sf_dir).select("source", "text").collect():
        toks[r["source"]].update(r["text"].strip().lower().split())
    rows = _rows("source_weighted_jaccard", spark, sf_dir)
    srcs = sorted(toks)
    assert len(rows) == len(srcs) * (len(srcs) - 1) // 2
    for r in rows:
        ca, cb = toks[r["src_a"]], toks[r["src_b"]]
        inter = sum(min(ca[t], cb[t]) for t in set(ca) | set(cb))
        union = sum(max(ca[t], cb[t]) for t in set(ca) | set(cb))
        assert (r["w_inter"], r["w_union"]) == (inter, union)
        assert 0 < r["weighted_jaccard"] <= 1
        set_j = len(set(ca) & set(cb)) / len(set(ca) | set(cb))
        assert r["weighted_jaccard"] <= set_j + 1e-9


def test_ccf_matches_bruteforce_and_symmetry(spark, sf_dir):
    """X152: the integer-expanded CCF must match a float brute force
    on collected daily series to 1e-6, stay in [-1, 1], and satisfy
    ccf(a->b, k) == ccf(b->a, -k) when both directions are present
    via the view->click pair and its overlap identity."""
    from collections import defaultdict
    from datetime import timedelta
    from etl_airflow_spotify_spark.queries.events_ops import _ev
    import pyspark.sql.functions as F

    daily = defaultdict(dict)
    for r in (_ev(spark, sf_dir)
              .groupBy("event_type", F.to_date("ts").alias("d"))
              .count().collect()):
        daily[r["event_type"]][r["d"]] = r["count"]
    rows = _rows("event_ccf_leadlag", spark, sf_dir)
    assert rows
    for r in rows:
        sa, sb = daily[r["driver"]], daily[r["response"]]
        na, nb = len(sa), len(sb)
        ma = sum(sa.values()) / na
        mb = sum(sb.values()) / nb
        k = r["lag"]
        overlap = [(sa[d], sb[d + timedelta(days=k)])
                   for d in sa if d + timedelta(days=k) in sb]
        assert r["n_overlap"] == len(overlap)
        num = sum((x - ma) * (y - mb) for x, y in overlap)
        den = (sum((x - ma) ** 2 for x in sa.values())
               * sum((y - mb) ** 2 for y in sb.values())) ** 0.5
        assert abs(r["ccf"] - num / den) <= 1e-6
        assert -1.0 - 1e-9 <= r["ccf"] <= 1.0 + 1e-9


def test_haar_parseval_identity_exact(spark, sf_dir):
    """X153: Parseval in unnormalized Haar units — for each type,
    sum over levels of energy_num / 2^level plus approx energy_num /
    2^LEVELS equals the raw series energy sum(v^2) EXACTLY (as a
    Fraction); also each level halves the coefficient count."""
    from collections import defaultdict
    from fractions import Fraction
    from etl_airflow_spotify_spark.queries.events_ops import (_ev,
                                                              HAAR_N,
                                                              HAAR_LEVELS)
    import pyspark.sql.functions as F

    daily = defaultdict(list)
    for r in (_ev(spark, sf_dir)
              .groupBy("event_type", F.to_date("ts").alias("d"))
              .count().collect()):
        daily[r["event_type"]].append((r["d"], r["count"]))
    rows = _rows("haar_energy_profile", spark, sf_dir)
    by_type = defaultdict(dict)
    for r in rows:
        by_type[r["event_type"]][r["level"]] = r
    for t, levels in by_type.items():
        series = [c for _, c in sorted(daily[t])[:HAAR_N]]
        raw = sum(v * v for v in series)
        total = Fraction(0)
        for lv in range(1, HAAR_LEVELS + 1):
            total += Fraction(levels[lv]["energy_num"], 1 << lv)
            assert levels[lv]["n_coeffs"] == HAAR_N >> lv
        total += Fraction(levels[0]["energy_num"], 1 << HAAR_LEVELS)
        assert total == raw


def test_sequential_monitor_z_and_boundaries(spark, sf_dir):
    """X154: recompute the cumulative per-arm counts and pooled z in
    Python; OBF boundaries strictly decrease over looks; crossing
    flags agree with the integer comparison."""
    from collections import defaultdict
    import hashlib
    from etl_airflow_spotify_spark.queries.events_ops import (
        _ev, _obf_boundaries_micro)
    import pyspark.sql.functions as F

    journeys = defaultdict(lambda: defaultdict(lambda: [0, 0, 0, 0]))
    per_day = defaultdict(set)
    conv = defaultdict(int)
    for e in (_ev(spark, sf_dir)
              .selectExpr("cast(ts as date) AS d", "user_id",
                          "event_type").collect()):
        per_day[e["d"]].add(e["user_id"])
        if e["event_type"] == "purchase":
            conv[(e["d"], e["user_id"])] = 1
    days = sorted(per_day)
    bounds = dict(_obf_boundaries_micro())
    got = sorted(_rows("sequential_ab_obf_monitor", spark, sf_dir),
                 key=lambda r: r["day_idx"])
    assert [r["day_idx"] for r in got] == list(range(1, len(days) + 1))
    na = xa = nb = xb = 0
    bvals = [bounds[k] for k in range(1, len(days) + 1)]
    assert bvals == sorted(bvals, reverse=True)
    for i, d in enumerate(days):
        for u in per_day[d]:
            arm = int(hashlib.md5(f"arm:{u}".encode())
                      .hexdigest()[:15], 16) % 2
            if arm == 0:
                na += 1
                xa += conv[(d, u)]
            else:
                nb += 1
                xb += conv[(d, u)]
        r = got[i]
        assert (r["n_a"], r["x_a"], r["n_b"], r["x_b"]) \
            == (na, xa, nb, xb)
        p = (xa + xb) / (na + nb)
        z = (xa / na - xb / nb) / (p * (1 - p)
                                   * (1 / na + 1 / nb)) ** 0.5
        assert abs(r["z"] - z) <= 1e-6
        assert r["crossed"] == (1 if abs(round(1e6 * z))
                                > r["boundary_micro"] else 0)


def test_ppjoin_prefix_filter_is_lossless(spark, sf_dir):
    """X155: the prefix-filtered join must return EXACTLY the pairs an
    all-pairs Python brute force finds at J >= t, with exact
    intersection counts — the losslessness theorem, verified."""
    from etl_airflow_spotify_spark.queries.dedup import (PPJ_K,
                                                         PPJ_T_DEN,
                                                         PPJ_T_NUM)
    from etl_airflow_spotify_spark.catalog import load_table

    docs = load_table(spark, sf_dir, "documents") \
        .select("doc_id", "text").collect()
    sets = {}
    for r in docs:
        ts = r["text"].strip().lower().split()
        n = max(len(ts) - (PPJ_K - 1), 1)
        sets[r["doc_id"]] = {" ".join(ts[i:i + PPJ_K])
                             for i in range(n)}
    ids = sorted(sets)
    exp = {}
    for x in range(len(ids)):
        for y in range(x + 1, len(ids)):
            a, b = ids[x], ids[y]
            i = len(sets[a] & sets[b])
            if (PPJ_T_DEN + PPJ_T_NUM) * i \
                    >= PPJ_T_NUM * (len(sets[a]) + len(sets[b])):
                exp[(a, b)] = i
    got = {(r["id_a"], r["id_b"]): r
           for r in _rows("ppjoin_prefix_similarity", spark, sf_dir)}
    assert set(got) == set(exp)
    for (a, b), i in exp.items():
        r = got[(a, b)]
        assert r["n_inter"] == i
        assert (r["size_a"], r["size_b"]) == (len(sets[a]),
                                              len(sets[b]))


def test_assortativity_matches_bruteforce_and_bounds(spark, sf_dir):
    """X156: rebuild the co-purchase edge list and degree correlation
    with Python integers; all four sums and the ratio must match;
    |r| <= 1."""
    from collections import defaultdict
    from etl_airflow_spotify_spark.catalog import load_table

    li = (load_table(spark, sf_dir, "lineitem")
          .select("l_orderkey", "l_partkey").distinct().collect())
    orders = defaultdict(set)
    for r in li:
        orders[r["l_orderkey"]].add(r["l_partkey"])
    edges = set()
    for parts in orders.values():
        for a in parts:
            for b in parts:
                if a != b:
                    edges.add((a, b))
    deg = defaultdict(int)
    for s, _ in edges:
        deg[s] += 1
    m = len(edges)
    s_jk = sum(deg[a] * deg[b] for a, b in edges)
    s_j = sum(deg[a] for a, _ in edges)
    s_j2 = sum(deg[a] ** 2 for a, _ in edges)
    r = _rows("copurchase_assortativity", spark, sf_dir)[0]
    assert (r["n_directed_edges"], r["sum_deg"], r["sum_deg_prod"],
            r["sum_deg_sq"]) == (m, s_j, s_jk, s_j2)
    expected = (m * s_jk - s_j * s_j) / (m * s_j2 - s_j * s_j)
    assert abs(r["assortativity"] - expected) <= 1e-6
    assert -1.0 - 1e-9 <= r["assortativity"] <= 1.0 + 1e-9


def test_percolation_labels_converge_to_true_components(spark, sf_dir):
    """X157: at test SF the fixed-round labelling must have converged —
    scenario stats must equal true components computed in Python
    (union-find) on the same filtered graphs; attack removes at least
    as many edges as random removal."""
    import hashlib
    import math
    from collections import defaultdict
    from etl_airflow_spotify_spark.catalog import load_table

    li = (load_table(spark, sf_dir, "lineitem")
          .select("l_orderkey", "l_partkey").distinct().collect())
    orders = defaultdict(set)
    for r in li:
        orders[r["l_orderkey"]].add(r["l_partkey"])
    edges = set()
    for parts in orders.values():
        for a in parts:
            for b in parts:
                if a != b:
                    edges.add((a, b))
    deg = defaultdict(int)
    for s, _ in edges:
        deg[s] += 1
    nodes = sorted(deg)
    h = math.ceil(len(nodes) / 100.0)
    attack = set(sorted(nodes, key=lambda n: (-deg[n], n))[:h])
    rnd = set(sorted(nodes, key=lambda n: (
        int(hashlib.md5(f"rm:{n}".encode()).hexdigest()[:15], 16),
        n))[:h])

    def stats(removed):
        es = [(a, b) for a, b in edges
              if a not in removed and b not in removed]
        ns = sorted({a for a, _ in es})
        parent = {n: n for n in ns}

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in es:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[ra] = rb
        comps = defaultdict(int)
        for n in ns:
            comps[find(n)] += 1
        return (len(ns), len(es), len(comps),
                max(comps.values()) if comps else 0)

    exp = {"intact": stats(set()), "attack": stats(attack),
           "random": stats(rnd)}
    got = {r["scenario"]: r
           for r in _rows("percolation_robustness", spark, sf_dir)}
    assert set(got) == set(exp)
    for scen, (n, e, c, big) in exp.items():
        r = got[scen]
        assert (r["n_nodes"], r["n_edges"], r["n_components"],
                r["largest_cc"]) == (n, e, c, big)
    assert got["attack"]["n_edges"] <= got["random"]["n_edges"]


def test_did_matches_python_replay(spark, sf_dir):
    """X158: replay both the main and placebo DiD from raw rows; all
    four cell counts and both estimates must match exactly."""
    import hashlib
    from collections import defaultdict
    from etl_airflow_spotify_spark.catalog import load_table
    from etl_airflow_spotify_spark.queries.ml import (DID_PLACEBO_DAY,
                                                      DID_SPLIT_DAY)
    import pyspark.sql.functions as F

    rows = (load_table(spark, sf_dir, "lineitem")
            .join(load_table(spark, sf_dir, "part")
                  .select(F.col("p_partkey").alias("l_partkey"),
                          "p_brand"), "l_partkey")
            .select("p_brand", F.dayofmonth("l_shipdate").alias("dom"),
                    F.col("l_quantity").cast("long").alias("q"))
            .collect())

    def run(lo, hi, split):
        c = defaultdict(lambda: [0, 0])
        for r in rows:
            if not (lo <= r["dom"] <= hi):
                continue
            t = 1 if int(hashlib.md5(f"did:{r['p_brand']}".encode())
                         .hexdigest()[:15], 16) % 2 == 0 else 0
            p = 1 if r["dom"] >= split else 0
            c[(t, p)][0] += 1
            c[(t, p)][1] += r["q"]

        def mean(t, p):
            return c[(t, p)][1] / c[(t, p)][0]

        return c, round((mean(1, 1) - mean(1, 0))
                        - (mean(0, 1) - mean(0, 0)), 6)

    got = {r["analysis"]: r
           for r in _rows("did_brand_quantity", spark, sf_dir)}
    for label, (lo, hi, split) in (
            ("did", (1, 31, DID_SPLIT_DAY)),
            ("placebo", (1, DID_SPLIT_DAY - 1, DID_PLACEBO_DAY))):
        c, est = run(lo, hi, split)
        r = got[label]
        assert (r["n_t_pre"], r["n_t_post"], r["n_c_pre"],
                r["n_c_post"]) == (c[(1, 0)][0], c[(1, 1)][0],
                                   c[(0, 0)][0], c[(0, 1)][0])
        assert abs(r["did_estimate"] - est) <= 1e-9


def test_mannkendall_matches_bruteforce_replay(spark, sf_dir):
    """X159: S, tie-corrected variance numerator, z, the Theil-Sen
    median (computed with exact Fractions) and the trend label all
    match an independent Python replay of the daily series."""
    import duckdb
    from fractions import Fraction

    rows = {r["event_type"]: r
            for r in _rows("mannkendall_sen_trend", spark, sf_dir)}
    daily = duckdb.sql(
        f"SELECT event_type, CAST(ts AS DATE) AS d, COUNT(*) AS c "
        f"FROM '{sf_dir}/events.parquet' GROUP BY 1, 2 ORDER BY 1, 2"
    ).fetchall()
    from collections import defaultdict
    series = defaultdict(list)
    for t, d, c in daily:
        series[t].append((d.toordinal(), c))
    assert set(series) == set(rows)
    for t, pts in series.items():
        pts.sort()
        n = len(pts)
        s = 0
        slopes = []
        for i in range(n):
            for j in range(i + 1, n):
                dy = pts[j][1] - pts[i][1]
                dx = pts[j][0] - pts[i][0]
                s += (dy > 0) - (dy < 0)
                slopes.append(Fraction(dy, dx))
        from collections import Counter
        tie = sum(g * (g - 1) * (2 * g + 5)
                  for g in Counter(c for _, c in pts).values())
        var18 = n * (n - 1) * (2 * n + 5) - tie
        slopes.sort()
        p = len(slopes)
        med = (slopes[(p - 1) // 2] + slopes[p // 2]) / 2
        r = rows[t]
        assert r["n_days"] == n and r["n_pairs"] == p
        assert r["s_stat"] == s
        assert r["var18_num"] == var18
        assert abs(r["sen_slope"] - float(med)) <= 1e-6
        s_adj = s - (s > 0) + (s < 0)
        z = 0.0 if s == 0 or var18 == 0 else s_adj / (var18 / 18.0) ** 0.5
        assert abs(r["z"] - z) <= 1e-5
        want = ("increasing" if s_adj > 1.959964 * (var18 / 18.0) ** 0.5
                else "decreasing"
                if s_adj < -1.959964 * (var18 / 18.0) ** 0.5
                else "no_trend")
        assert r["trend"] == want
        # Sen slope is bracketed by the extreme pairwise slopes
        assert float(slopes[0]) - 1e-9 <= r["sen_slope"] \
            <= float(slopes[-1]) + 1e-9


def test_fdr_bh_matches_replay_and_dominates_bonferroni(spark, sf_dir):
    """X160: the BH rejection set equals an independent Python replay
    (erfc tails on the same 0.1 z-grid), is a prefix of the p-sorted
    order, and contains the Bonferroni set."""
    import duckdb
    import math

    rows = _rows("fdr_brand_returns", spark, sf_dir)
    cells = duckdb.sql(
        f"SELECT p.p_brand, COUNT(*), "
        f"SUM(CASE WHEN l.l_returnflag='R' THEN 1 ELSE 0 END) "
        f"FROM '{sf_dir}/lineitem.parquet' l "
        f"JOIN '{sf_dir}/part.parquet' p ON p.p_partkey = l.l_partkey "
        f"GROUP BY 1").fetchall()
    nn = sum(c[1] for c in cells)
    rr = sum(c[2] for c in cells)
    m = len(cells)
    ps = {}
    for brand, n, r in cells:
        pp = rr / nn
        z = (r / n - (rr - r) / (nn - n)) / math.sqrt(
            pp * (1 - pp) * (1 / n + 1 / (nn - n)))
        zg = min(round(abs(z) * 10.0), 80)
        ps[brand] = round(math.erfc((zg / 10.0) / math.sqrt(2.0)) * 1e9)
    order = sorted(ps, key=lambda b: (ps[b], b))
    k_star = max((i + 1 for i, b in enumerate(order)
                  if m * ps[b] <= (i + 1) * 50_000_000), default=0)
    want_bh = set(order[:k_star])
    got_bh = {r["brand"] for r in rows if r["bh_reject"] == 1}
    got_bonf = {r["brand"] for r in rows if r["bonf_reject"] == 1}
    assert got_bh == want_bh
    assert got_bonf <= got_bh            # Bonferroni is strictly stricter
    # rejection set is a prefix of p_rank order
    ranks = sorted(r["p_rank"] for r in rows if r["bh_reject"] == 1)
    assert ranks == list(range(1, len(ranks) + 1))
    for r in rows:
        assert r["p_nano"] == ps[r["brand"]]
    # at least one discovery at this alpha on the synthetic skew is not
    # guaranteed — but the table and m must cover all 25 brands
    assert len(rows) == m == 25


def test_boruvka_picks_true_msf_edges_and_contracts(spark, sf_dir):
    """X161: replay Boruvka in Python with TRUE union-find contraction
    (no fixed-round cap): the per-round pick counts/weights must match
    (proving the fixed contraction rounds converged), every picked
    edge must be in Kruskal's MSF under the same (w, lo, hi) order,
    and components must strictly decrease while edges are picked."""
    import duckdb

    rows = _rows("boruvka_msf_rounds", spark, sf_dir)
    edges = duckdb.sql(
        f"WITH op AS (SELECT DISTINCT l_orderkey g, l_partkey i "
        f"FROM '{sf_dir}/lineitem.parquet') "
        f"SELECT DISTINCT a.i, b.i, 1 + (a.i + b.i) % 7 "
        f"FROM op a JOIN op b ON a.g = b.g AND a.i < b.i").fetchall()
    edges = [(w, lo, hi) for lo, hi, w in edges]

    parent = {}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    nodes = {lo for _, lo, _ in edges} | {hi for _, _, hi in edges}
    for n in nodes:
        parent[n] = n
    # Kruskal under the same distinct total order
    kruskal = set()
    for w, lo, hi in sorted(edges):
        a, b = find(lo), find(hi)
        if a != b:
            parent[max(a, b)] = min(a, b)
            kruskal.add((lo, hi))
    # Boruvka replay with exact union-find contraction
    for n in nodes:
        parent[n] = n
    got = {r["round"]: r for r in rows}
    all_picked = set()
    for rnd in range(1, len(rows) + 1):
        comp_before = len({find(n) for n in nodes})
        best = {}
        for w, lo, hi in edges:
            a, b = find(lo), find(hi)
            if a == b:
                continue
            for c in (a, b):
                if c not in best or (w, lo, hi) < best[c]:
                    best[c] = (w, lo, hi)
        picked = {(lo, hi, w) for w, lo, hi in best.values()}
        for lo, hi, _ in picked:
            a, b = find(lo), find(hi)
            if a != b:
                parent[max(a, b)] = min(a, b)
        r = got[rnd]
        assert r["components_before"] == comp_before
        assert r["edges_picked"] == len(picked)
        assert r["weight_added"] == sum(w for _, _, w in picked)
        assert r["components_after"] == len({find(n) for n in nodes})
        all_picked |= {(lo, hi) for lo, hi, _ in picked}
        if r["edges_picked"]:
            assert r["components_after"] < r["components_before"]
    # cut property: every picked edge is a true MSF edge
    assert all_picked <= kruskal


def test_dbscan_matches_bruteforce_python(spark, sf_dir):
    """X162: cluster sizes, core/border split and noise count equal a
    brute-force O(n^2) Python DBSCAN with true union-find components
    (proving grid recall and star-CC convergence), and the
    core/border/noise partition covers every customer exactly once."""
    import duckdb

    rows = _rows("dbscan_rfm_segments", spark, sf_dir)
    pts = duckdb.sql(
        f"SELECT o_custkey, COUNT(*), "
        f"SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT))"
        f" // 4000000 "
        f"FROM '{sf_dir}/orders.parquet' GROUP BY 1").fetchall()
    ids = [p[0] for p in pts]
    xy = {p[0]: (p[1], p[2]) for p in pts}
    nbrs = {i: [j for j in ids
                if (xy[i][0] - xy[j][0]) ** 2
                + (xy[i][1] - xy[j][1]) ** 2 <= 4]
            for i in ids}
    core = {i for i in ids if len(nbrs[i]) >= 8}
    parent = {i: i for i in core}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for i in core:
        for j in nbrs[i]:
            if j in core:
                a, b = find(i), find(j)
                if a != b:
                    parent[max(a, b)] = min(a, b)
    # canonical label = min id in component
    comp = {}
    for i in core:
        comp.setdefault(find(i), []).append(i)
    lab = {i: min(members) for root, members in comp.items()
           for i in members}
    border = {}
    for i in ids:
        if i in core:
            continue
        cs = [lab[j] for j in nbrs[i] if j in core]
        if cs:
            border[i] = min(cs)
    noise = [i for i in ids if i not in core and i not in border]
    from collections import Counter
    want = Counter()
    for i, c in lab.items():
        want[c] += 1
    wantb = Counter(border.values())
    got = {r["cluster_id"]: r for r in rows}
    assert got[-1]["n_points"] == len(noise)
    clusters = {c for c in got if c != -1}
    assert clusters == set(want) | set(wantb)
    for c in clusters:
        assert got[c]["n_core"] == want.get(c, 0)
        assert got[c]["n_border"] == wantb.get(c, 0)
        assert got[c]["n_points"] == want.get(c, 0) + wantb.get(c, 0)
    # partition covers every customer once
    assert sum(r["n_points"] for r in rows) == len(ids)


def test_ams_f2_replay_and_estimator_quality(spark, sf_dir):
    """X163: every X_k matches a Python md5 replay, group sums and the
    median-of-3 are internally consistent, and the realized
    median-of-means estimate lands within 3x of exact F2 (the AMS
    E[X^2] = F2 identity with 3 groups of 4)."""
    import duckdb
    import hashlib

    rows = _rows("ams_f2_partkey", spark, sf_dir)
    keys = [r[0] for r in duckdb.sql(
        f"SELECT l_partkey FROM '{sf_dir}/lineitem.parquet'").fetchall()]
    xs = {}
    for k in range(12):
        s = 0
        for v in keys:
            h = hashlib.md5(f"ams:{k}:{v}".encode()).hexdigest()
            s += 1 if int(h[:15], 16) % 2 == 0 else -1
        xs[k] = s
    got_x = {r["k"]: r["value"] for r in rows if r["kind"] == "x"}
    assert got_x == xs
    grp = {g: sum(xs[k] ** 2 for k in range(g * 4, g * 4 + 4))
           for g in range(3)}
    got_g = {r["k"]: r["value"] for r in rows
             if r["kind"] == "group4sum"}
    assert got_g == grp
    med = sorted(grp.values())[1]
    got_m = [r for r in rows if r["kind"] == "median"][0]
    assert got_m["value"] == med
    from collections import Counter
    f2 = sum(c * c for c in Counter(keys).values())
    got_e = [r for r in rows if r["kind"] == "exact"][0]
    assert got_e["value"] == f2
    ratio = med / (4 * f2)
    assert abs(got_m["est_ratio"] - round(ratio, 6)) <= 1e-9
    assert 1 / 3 <= ratio <= 3


def test_dp_release_channel_replay_and_scale(spark, sf_dir):
    """X164: the noise equals a Python replay of the md5 -> inverse-CDF
    channel, released = true + noise everywhere, and the empirical
    noise second moment is within 4x of the discrete-Laplace variance
    2a/(1-a)^2 at eps = 1 (150 cells of slack)."""
    import hashlib
    import math

    rows = _rows("dp_noisy_daily_counts", spark, sf_dir)
    assert rows
    a = math.exp(-1.0)
    cdf, cuts = 0.0, []
    for z in range(-40, 40):
        cdf += (1 - a) / (1 + a) * a ** abs(z)
        cuts.append((z, math.floor(cdf * (1 << 60))))
    for r in rows:
        u = int(hashlib.md5(
            f"dp:eps1:{r['event_type']}:{r['d']}".encode())
            .hexdigest()[:15], 16)
        want = next((z for z, c in cuts if c > u), 40)
        assert r["noise"] == want
        assert r["released_n"] == r["true_n"] + r["noise"]
        assert r["abs_err"] == abs(r["noise"])
    var = 2 * a / (1 - a) ** 2
    emp = sum(r["noise"] ** 2 for r in rows) / len(rows)
    assert emp <= 4 * var + 1
    # unbiasedness in aggregate: mean noise near 0
    mean = sum(r["noise"] for r in rows) / len(rows)
    assert abs(mean) <= 1.0


def test_itemitem_cf_replay_and_no_owned_leakage(spark, sf_dir):
    """X165: a full Python replay (cosine neighbors, top-5 truncation,
    micro-snap scoring, top-3 selection) reproduces every
    recommendation; no user is ever recommended an item they already
    own; ranks are 1..k dense per user."""
    import duckdb
    import math
    from collections import defaultdict

    rows = _rows("itemitem_cf_recommend", spark, sf_dir)
    oi = duckdb.sql(
        f"SELECT DISTINCT l.l_orderkey, l.l_partkey, o.o_custkey "
        f"FROM '{sf_dir}/lineitem.parquet' l "
        f"JOIN '{sf_dir}/orders.parquet' o "
        f"ON o.o_orderkey = l.l_orderkey").fetchall()
    baskets = defaultdict(set)
    items_n = defaultdict(set)
    user_items = defaultdict(set)
    for g, i, cust in oi:
        baskets[g].add(i)
        items_n[i].add(g)
        if cust % 100 == 0:
            user_items[cust].add(i)
    cooc = defaultdict(int)
    for g, its in baskets.items():
        its = sorted(its)
        for a in its:
            for b in its:
                if a != b:
                    cooc[(a, b)] += 1
    sims = defaultdict(list)
    for (a, b), c in cooc.items():
        s = c / math.sqrt(len(items_n[a]) * len(items_n[b]))
        sims[a].append((-s, b, s))
    nbr = {a: sorted(v)[:5] for a, v in sims.items()}
    want = {}
    for cust, its in user_items.items():
        score = defaultdict(int)
        for a, lst in nbr.items():
            if a in its:
                continue
            for _, b, s in lst:
                if b in its:
                    score[a] += round(s * 1000000)
        top = sorted(score.items(), key=lambda kv: (-kv[1], kv[0]))[:3]
        for rk, (item, sc) in enumerate(top, 1):
            want[(cust, rk)] = (item, sc)
    got = {(r["custkey"], r["rank"]): (r["partkey"], r["score_micro"])
           for r in rows}
    assert got == want
    for r in rows:
        assert r["partkey"] not in user_items[r["custkey"]]
    ranks = defaultdict(list)
    for r in rows:
        ranks[r["custkey"]].append(r["rank"])
    for v in ranks.values():
        assert sorted(v) == list(range(1, len(v) + 1))


def test_zipf_fit_matches_python_ols(spark, sf_dir):
    """X166: slope/intercept/R^2 match a Python replay of the
    micro-grid OLS; the slope is negative (frequency decays with
    rank); R^2 in [0, 1]; tail fit uses exactly ranks 10..100."""
    import duckdb
    import math

    rows = {r["fit"]: r for r in _rows("zipf_rank_frequency",
                                       spark, sf_dir)}
    wc = duckdb.sql(
        f"SELECT w, COUNT(*) n FROM (SELECT unnest(string_split_regex("
        f"trim(lower(text)), '\\s+')) w FROM "
        f"'{sf_dir}/documents.parquet') GROUP BY w "
        f"ORDER BY n DESC, w LIMIT 100").fetchall()
    pts = [(round(math.log2(r) * 1e6), round(math.log2(n) * 1e6))
           for r, (w, n) in enumerate(wc, 1)]

    def fit(sel):
        k = len(sel)
        sx = sum(x for x, _ in sel)
        sy = sum(y for _, y in sel)
        sxx = sum(x * x for x, _ in sel)
        sxy = sum(x * y for x, y in sel)
        syy = sum(y * y for _, y in sel)
        num = k * sxy - sx * sy
        den = k * sxx - sx * sx
        slope = num / den
        return (round(slope, 6),
                round((sy - slope * sx) / k / 1e6, 6),
                round(num * num / (den * (k * syy - sy * sy)), 6))

    for label, sel in (("all", pts), ("tail", pts[9:])):
        s, i, r2 = fit(sel)
        r = rows[label]
        assert abs(r["slope"] - s) <= 1e-9
        assert abs(r["intercept_log2"] - i) <= 1e-9
        assert abs(r["r2"] - r2) <= 1e-9
        assert r["slope"] < 0
        assert 0.0 <= r["r2"] <= 1.0
    assert rows["all"]["n_points"] == len(pts)
    assert rows["tail"]["n_points"] == len(pts) - 9


def test_clustering_coefficient_matches_bruteforce(spark, sf_dir):
    """X167: triangle total, per-bucket histogram and transitivity
    match a brute-force Python count over adjacency sets; the
    histogram covers every node of degree >= 2 exactly once; all
    coefficients are in [0, 1] (bucket <= 20 means c <= 1)."""
    import duckdb
    from collections import Counter, defaultdict

    rows = _rows("clustering_coefficient_profile", spark, sf_dir)
    edges = duckdb.sql(
        f"WITH op AS (SELECT DISTINCT l_orderkey g, l_partkey i FROM "
        f"'{sf_dir}/lineitem.parquet') "
        f"SELECT DISTINCT a.i, b.i FROM op a JOIN op b "
        f"ON a.g = b.g AND a.i < b.i").fetchall()
    adj = defaultdict(set)
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)
    # each triangle is seen from each of its 3 edges via the third
    # node, so the edge sweep counts every triangle 3x in total and
    # node v's count tv[v] (via its one non-incident edge) is exact
    tv = Counter()
    n_tri = 0
    for a, b in edges:
        for c in adj[a] & adj[b]:
            tv[c] += 1
            n_tri += 1
    n_tri //= 3
    hist = Counter()
    deg1 = 0
    for v, nb in adj.items():
        d = len(nb)
        if d == 1:
            deg1 += 1
            continue
        hist[(20 * tv[v]) // (d * (d - 1))] += 1
    got = {(r["kind"], r["bucket"]): r for r in rows}
    for bkt, n in hist.items():
        assert got[("bucket", bkt)]["n"] == n
    assert sum(r["n"] for r in rows if r["kind"] == "bucket") \
        == sum(hist.values())
    assert got[("deg1", -1)]["n"] == deg1
    assert got[("triangles", -1)]["n"] == n_tri
    g = got[("global", -1)]
    wedges = sum(len(nb) * (len(nb) - 1) // 2 for nb in adj.values())
    assert g["n"] == len(adj)
    assert abs(g["value"] - round(3.0 * n_tri / wedges, 6)) <= 1e-9
    assert 0.0 <= g["value"] <= 1.0
    for r in rows:
        if r["kind"] == "bucket":
            assert 0 <= r["bucket"] <= 20


def test_learning_curve_replay_and_nesting(spark, sf_dir):
    """X168: full Python replay (md5 splits, nested tier fractions,
    exhaustive split search, majority prediction, held-out accuracy)
    matches every row; train sizes are strictly increasing and nested
    by construction; accuracies are valid proportions."""
    import duckdb
    import hashlib
    from collections import Counter

    rows = {r["train_pct"]: r
            for r in _rows("stump_learning_curve", spark, sf_dir)}
    data = duckdb.sql(
        f"SELECT l_orderkey, l_linenumber, CAST(l_quantity AS BIGINT), "
        f"CAST(ROUND(l_discount * 100, 0) AS BIGINT), "
        f"CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END "
        f"FROM '{sf_dir}/lineitem.parquet'").fetchall()

    def m10(salt, ok, ln):
        return int(hashlib.md5(f"{salt}{ok}:{ln}".encode())
                   .hexdigest()[:15], 16) % 10

    train, test = [], []
    for ok, ln, qty, disc, pos in data:
        row = (qty, disc, pos, m10("lct:", ok, ln))
        if m10("lc:", ok, ln) < 8:
            train.append(row)
        else:
            test.append(row)
    prev_n = 0
    for k in (1, 2, 4, 8):
        sub = [r for r in train if r[3] < k]
        best = None
        for fi, fname in ((0, "qty"), (1, "disc")):
            hist = Counter()
            hp = Counter()
            for r in sub:
                hist[r[fi]] += 1
                hp[r[fi]] += r[2]
            vals = sorted(hist)
            nt = sum(hist.values())
            pt = sum(hp.values())
            nl = pl = 0
            for v in vals:
                nl += hist[v]
                pl += hp[v]
                if nl == 0 or nt - nl == 0:
                    continue
                nr, pr = nt - nl, pt - pl
                score = (pl * pl + (nl - pl) * (nl - pl)) / nl \
                    + (pr * pr + (nr - pr) * (nr - pr)) / nr
                key = (-score, fname, v)
                if best is None or key < best[0]:
                    best = (key, fname, v, nl, pl, nr, pr, nt)
        _, fname, split, nl, pl, nr, pr, nt = best
        fi = 0 if fname == "qty" else 1
        left_pred = 1 if 2 * pl > nl else 0
        right_pred = 1 if 2 * pr > nr else 0
        correct = sum(
            1 for r in test
            if (left_pred if r[fi] <= split else right_pred) == r[2])
        r = rows[k * 10]
        assert r["feature"] == fname and r["split_at"] == split
        assert r["train_n"] == nt and r["test_n"] == len(test)
        assert abs(r["accuracy"] - round(correct / len(test), 6)) <= 1e-9
        assert nt > prev_n
        prev_n = nt
        assert 0.0 <= r["accuracy"] <= 1.0


def test_uplift_qini_replay_and_conservation(spark, sf_dir):
    """X169: cells, uplift ordering and the Qini accumulation match a
    Python replay; segment cells partition the user base; the final
    Qini value equals the sum of all per-segment increments."""
    import duckdb
    import hashlib

    rows = _rows("uplift_qini_segments", spark, sf_dir)
    users = duckdb.sql(
        f"SELECT user_id, SUM(CAST(ROUND(value * 1000000, 0) AS "
        f"BIGINT)), COUNT(*), MAX(CASE WHEN event_type = 'purchase' "
        f"THEN 1 ELSE 0 END) FROM '{sf_dir}/events.parquet' "
        f"GROUP BY user_id").fetchall()
    from collections import defaultdict
    cells = defaultdict(lambda: [0, 0, 0, 0])
    for uid, sv, n, conv in users:
        seg = (0 if sv < 45000000 * n else
               1 if sv < 49000000 * n else
               2 if sv < 53000000 * n else 3)
        t = 1 if int(hashlib.md5(f"promo:{uid}".encode())
                     .hexdigest()[:15], 16) % 2 == 0 else 0
        c = cells[seg]
        if t:
            c[0] += 1
            c[1] += conv
        else:
            c[2] += 1
            c[3] += conv
    got = {r["segment"]: r for r in rows}
    assert set(got) == set(cells)
    for seg, (nt, ct, nc, cc) in cells.items():
        r = got[seg]
        assert (r["n_t"], r["conv_t"], r["n_c"], r["conv_c"]) \
            == (nt, ct, nc, cc)
        if nt and nc:
            assert abs(r["uplift"] - round(ct / nt - cc / nc, 6)) <= 1e-9
    assert sum(r["n_t"] + r["n_c"] for r in rows) == len(users)
    # ranking is descending in uplift (None last)
    ups = [r["uplift"] for r in sorted(rows, key=lambda r: r["rank"])]
    non_null = [u for u in ups if u is not None]
    assert non_null == sorted(non_null, reverse=True)
    # Qini telescopes: the last rank's cumulative equals the sum of
    # every segment's increment (segments with an empty control arm
    # contribute NULL, which SUM skips on both engines)
    ordered = sorted(rows, key=lambda r: r["rank"])
    incs = [(r["conv_t"] * r["n_c"] - r["conv_c"] * r["n_t"]) / r["n_c"]
            for r in ordered if r["n_c"]]
    last = ordered[-1]["qini_cum_incremental"]
    if last is not None:
        assert abs(last - round(sum(incs), 6)) <= 2e-6


def test_sequence_support_bruteforce_and_antimonotone(spark, sf_dir):
    """X170: support of every triple equals a brute-force subsequence
    check over per-user sorted streams, and anti-monotonicity holds:
    supp(a,b,c) <= supp of both embedded pairs."""
    import duckdb
    from collections import defaultdict

    rows = _rows("sequence_triple_support", spark, sf_dir)
    evs = duckdb.sql(
        f"SELECT user_id, event_type, ts FROM "
        f"'{sf_dir}/events.parquet' ORDER BY user_id, ts").fetchall()
    streams = defaultdict(list)
    for u, t, ts in evs:
        streams[u].append((ts, t))
    for s in streams.values():
        s.sort()
    types = sorted({t for _, t, _ in evs})

    def contains(seq, pat):
        i = 0
        last = None
        for ts, t in seq:
            if t == pat[i] and (last is None or ts > last):
                last = ts
                i += 1
                if i == len(pat):
                    return True
        return False

    supp3 = {}
    supp2 = defaultdict(int)
    for a in types:
        for b2 in types:
            for u, s in streams.items():
                if contains(s, (a, b2)):
                    supp2[(a, b2)] += 1
            for c in types:
                supp3[(a, b2, c)] = sum(
                    1 for s in streams.values()
                    if contains(s, (a, b2, c)))
    got = {(r["a"], r["b"], r["c"]): r["support"] for r in rows}
    for pat, s in supp3.items():
        assert got.get(pat, 0) == s
    for (a, b2, c), s in supp3.items():
        assert s <= supp2[(a, b2)]
        assert s <= supp2[(b2, c)]
    n = len(streams)
    for r in rows:
        assert abs(r["support_frac"]
                   - round(r["support"] / n, 6)) <= 1e-9


def test_containment_join_lossless_vs_allpairs(spark, sf_dir):
    """X171: the prefix-filtered containment join returns EXACTLY the
    all-pairs result at C >= 9/10 (losslessness of the misses-budget
    prefix), containment >= 0.9 on every row, and containment >=
    jaccard always (|a| <= |a| + |b| - |i|)."""
    import duckdb

    rows = _rows("containment_subset_join", spark, sf_dir)
    brute = duckdb.sql(f"""
        WITH sh AS (
          SELECT DISTINCT doc_id, ('0x' || substr(md5(sg),1,15))::BIGINT h
          FROM (SELECT doc_id, unnest(list_distinct(list_transform(
                generate_series(1, GREATEST(len(ts)-2,1)),
                i -> array_to_string(
                    ts[CAST(i AS INTEGER):CAST(i AS INTEGER)+2], ' ')))) sg
                FROM (SELECT doc_id,
                             string_split_regex(trim(lower(text)), '\\s+') ts
                      FROM '{sf_dir}/documents.parquet'))),
        sizes AS (SELECT doc_id, COUNT(*) n FROM sh GROUP BY 1),
        inter AS (SELECT a.doc_id ia, b.doc_id ib, COUNT(*) i
                  FROM sh a JOIN sh b ON a.h = b.h AND a.doc_id <> b.doc_id
                  GROUP BY 1, 2)
        SELECT ia, ib, i FROM inter JOIN sizes sa ON sa.doc_id = inter.ia
        WHERE 10 * i >= 9 * sa.n""").fetchall()
    want = {(ia, ib): i for ia, ib, i in brute}
    got = {(r["id_a"], r["id_b"]): r["n_inter"] for r in rows}
    assert got == want
    for r in rows:
        assert r["containment"] >= 0.9 - 1e-9
        assert r["containment"] >= r["jaccard"] - 1e-9
        assert 10 * r["n_inter"] >= 9 * r["size_a"]


def test_scene_changes_python_replay(spark, sf_dir):
    """X172: frames/cuts/scenes/max_jump match a pure-Python replay of
    the payload chunking; scenes = cuts + 1; frame count equals
    ceil(len/64); every media row appears exactly once."""
    import duckdb

    rows = {r["media_id"]: r
            for r in _rows("multimodal_scene_changes", spark, sf_dir)}
    docs = duckdb.sql(
        f"SELECT doc_id, text FROM '{sf_dir}/documents.parquet' "
        f"WHERE length(text) > 0").fetchall()
    assert set(rows) == {d for d, _ in docs}
    for doc_id, text in docs:
        b = text.encode()
        frames = [b[i:i + 64] for i in range(0, len(b), 64)]
        sums = [sum(f) for f in frames]
        lens = [len(f) for f in frames]
        cuts = 0
        max_jump = None
        for k in range(1, len(frames)):
            d = abs(sums[k] * lens[k - 1] - sums[k - 1] * lens[k])
            if d > 4 * lens[k] * lens[k - 1]:
                cuts += 1
            j = round(abs(sums[k] / lens[k]
                          - sums[k - 1] / lens[k - 1]), 6)
            if max_jump is None or j > max_jump:
                max_jump = j
        r = rows[doc_id]
        assert r["n_frames"] == len(frames)
        assert r["n_frames"] == -(-len(b) // 64)
        assert r["n_cuts"] == cuts
        assert r["n_scenes"] == cuts + 1
        if max_jump is None:
            assert r["max_jump"] is None
        else:
            assert abs(r["max_jump"] - max_jump) <= 1e-9


def test_bcubed_matches_python_and_bounds(spark, sf_dir):
    """X173: B-cubed P/R/F1 match a full Python replay (same typo
    plants, same blocked levenshtein pairs, true union-find
    components, micro-snapped per-item fractions); all three metrics
    in (0, 1]; recall is 1.0 iff no truth entity is split."""
    import duckdb
    import hashlib
    from collections import defaultdict

    r = _rows("bcubed_linkage_eval", spark, sf_dir)[0]
    names = [n for (n,) in duckdb.sql(
        f"SELECT DISTINCT p_name FROM '{sf_dir}/part.parquet'")
        .fetchall()]
    items = [(n, n) for n in names]
    for n in names:
        if int(hashlib.md5(f"lk:{n}".encode()).hexdigest()[:15],
               16) % 100 < 10:
            typo = n[:-2] + chr(ord(n[-2]) + 1) + n[-1]
            items.append((typo, n))
    vals = sorted({nm for nm, _ in items})

    def lev(a, b):
        if abs(len(a) - len(b)) > 4:
            return 99
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(min(prev[j] + 1, cur[-1] + 1,
                               prev[j - 1] + (ca != cb)))
            prev = cur
        return prev[-1]

    blocks = defaultdict(set)
    for nm in vals:
        parts = nm.split(" ")
        blocks[parts[0]].add(nm)
        if len(parts) > 1:
            blocks[parts[1]].add(nm)
    pairs = set()
    for blk in blocks.values():
        bl = sorted(blk)
        for i, a in enumerate(bl):
            for b in bl[i + 1:]:
                if lev(a, b) <= 4:
                    pairs.add((a, b))
    parent = {nm: nm for nm in vals}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    cells = defaultdict(int)
    csize = defaultdict(int)
    tsize = defaultdict(int)
    for nm, te in items:
        pc = find(nm)
        cells[(pc, te)] += 1
        csize[pc] += 1
        tsize[te] += 1
    n = len(items)
    p_fold = sum(o * round(1e6 * o / csize[pc])
                 for (pc, te), o in cells.items())
    r_fold = sum(o * round(1e6 * o / tsize[te])
                 for (pc, te), o in cells.items())
    P, R = p_fold / n, r_fold / n
    assert r["n_items"] == n
    assert r["n_truth_entities"] == len(tsize)
    assert abs(r["bcubed_p"] - round(P / 1e6, 6)) <= 1e-9
    assert abs(r["bcubed_r"] - round(R / 1e6, 6)) <= 1e-9
    assert abs(r["bcubed_f1"] - round(2 * P * R / (P + R) / 1e6, 6)) \
        <= 1e-9
    assert 0 < r["bcubed_p"] <= 1 and 0 < r["bcubed_r"] <= 1
    assert min(r["bcubed_p"], r["bcubed_r"]) <= r["bcubed_f1"] \
        <= max(r["bcubed_p"], r["bcubed_r"])


def test_greedy_decode_python_replay(spark, sf_dir):
    """X174: the generated walks equal a Python replay of the greedy
    argmax chain; step 0 is the seed; every consecutive pair is the
    corpus argmax successor; walks are over the top-5 seeds."""
    import duckdb
    from collections import Counter, defaultdict

    rows = _rows("bigram_greedy_decode", spark, sf_dir)
    docs = duckdb.sql(f"SELECT trim(lower(text)) FROM "
                      f"'{sf_dir}/documents.parquet'").fetchall()
    import re
    uni = Counter()
    bg = Counter()
    for (t,) in docs:
        toks = re.split(r"\s+", t) if t else []
        uni.update(toks)
        bg.update(zip(toks, toks[1:]))
    nxt = {}
    byw = defaultdict(list)
    for (a, b), c in bg.items():
        byw[a].append((-c, b))
    for a, lst in byw.items():
        nxt[a] = min(lst)[1]
    seeds = sorted(uni, key=lambda w: (-uni[w], w))[:5]
    want = []
    for s in seeds:
        w = s
        want.append((s, 0, s))
        for step in range(1, 13):
            if w not in nxt:
                break
            w = nxt[w]
            want.append((s, step, w))
    got = sorted((r["seed"], r["step"], r["word"]) for r in rows)
    assert got == sorted(want)


def test_qte_matches_numpy_and_monotone(spark, sf_dir):
    """X175: per-arm deciles match numpy's linear-interpolation
    quantiles of the md5-assigned arms; quantiles are monotone in q
    within each arm; qte = q_treated - q_control on every row."""
    import duckdb
    import hashlib

    import numpy as np

    rows = sorted(_rows("quantile_treatment_effects", spark, sf_dir),
                  key=lambda r: r["q"])
    orders = duckdb.sql(
        f"SELECT o_orderkey, o_totalprice FROM "
        f"'{sf_dir}/orders.parquet'").fetchall()
    t, c = [], []
    for ok, v in orders:
        if int(hashlib.md5(f"qte:{ok}".encode()).hexdigest()[:15],
               16) % 2 == 0:
            t.append(v)
        else:
            c.append(v)
    qs = [r["q"] for r in rows]
    qt = np.quantile(t, qs, method="linear")
    qc = np.quantile(c, qs, method="linear")
    for r, wt, wc in zip(rows, qt, qc):
        assert r["n_treated"] == len(t) and r["n_control"] == len(c)
        assert abs(r["q_treated"] - round(float(wt), 4)) <= 1e-6
        assert abs(r["q_control"] - round(float(wc), 4)) <= 1e-6
        assert abs(r["qte"] - round(float(wt) - float(wc), 4)) <= 1e-6
    for col in ("q_treated", "q_control"):
        vals = [r[col] for r in rows]
        assert vals == sorted(vals)


def test_cohort_ltv_replay_and_invariants(spark, sf_dir):
    """X176: cells match a Python replay; retention at k=0 is 1.0;
    cumulative LTV is the running sum of per-capita values and is
    nondecreasing; retention never exceeds 1."""
    import duckdb
    from collections import defaultdict

    rows = _rows("cohort_ltv_curves", spark, sf_dir)
    evs = duckdb.sql(
        f"SELECT user_id, CAST(ts AS DATE), event_type, "
        f"CAST(ROUND(value * 1000000, 0) AS BIGINT) "
        f"FROM '{sf_dir}/events.parquet'").fetchall()
    d0 = min(d for _, d, _, _ in evs).toordinal()
    wk = defaultdict(lambda: [set(), 0])
    first = {}
    for u, d, t, vm in evs:
        w = (d.toordinal() - d0) // 7
        first[u] = min(first.get(u, w), w)
    sizes = defaultdict(int)
    for u, c in first.items():
        sizes[c] += 1
    for u, d, t, vm in evs:
        w = (d.toordinal() - d0) // 7
        cell = wk[(first[u], w - first[u])]
        cell[0].add(u)
        if t == "purchase":
            cell[1] += vm
    got = {(r["cohort_week"], r["week_k"]): r for r in rows}
    assert set(got) == set(wk)
    cum = defaultdict(int)
    for (c, k) in sorted(wk):
        users, vm = wk[(c, k)]
        r = got[(c, k)]
        assert r["cohort_size"] == sizes[c]
        assert r["n_active"] == len(users)
        assert abs(r["retention"]
                   - round(len(users) / sizes[c], 6)) <= 1e-9
        assert r["retention"] <= 1.0 + 1e-9
        pc = round(vm / sizes[c])
        assert r["percap_micro"] == pc
        cum[c] += pc
        assert r["cum_ltv_micro"] == cum[c]
        if k == 0:
            assert r["retention"] == 1.0
    for c in {r["cohort_week"] for r in rows}:
        vals = [r["cum_ltv_micro"] for r in sorted(
            (r for r in rows if r["cohort_week"] == c),
            key=lambda r: r["week_k"])]
        assert vals == sorted(vals)


def test_naive_bayes_matches_python_replay(spark, sf_dir):
    """X177: confusion matrix matches a full Python NB replay (same
    md5 split, add-one smoothing, integer micro-grid log2 scores,
    min-lang ties); fractions sum to 1 per true class."""
    import duckdb
    import hashlib
    import math
    import re
    from collections import Counter, defaultdict

    from etl_airflow_spotify_spark.queries.ml import NB_TRAIN_PCT

    rows = _rows("naive_bayes_lang", spark, sf_dir)
    docs = duckdb.sql(
        f"SELECT doc_id, lang, text "
        f"FROM '{sf_dir}/documents.parquet'").fetchall()

    def md5_60(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    def l2m(n):
        return round(math.log2(n) * 1e6)

    train, test = [], []
    for doc_id, lang, text in docs:
        (train if md5_60(f"nb:{doc_id}") % 100 < NB_TRAIN_PCT
         else test).append((doc_id, lang, text))
    cw = Counter()
    ndc = Counter()
    for _, lang, text in train:
        ndc[lang] += 1
        for w in re.split(r"\s+", text.strip().lower()):
            cw[(lang, w)] += 1
    vocab = {w for _, w in cw}
    totc = Counter()
    for (lang, w), c in cw.items():
        totc[lang] += c
    n_train = sum(ndc.values())
    classes = sorted(ndc)
    prior = {c: l2m(ndc[c]) - l2m(n_train) for c in classes}
    den = {c: l2m(totc[c] + len(vocab)) for c in classes}

    conf = Counter()
    per_true = Counter()
    for _, true_lang, text in test:
        tf = Counter(w for w in re.split(r"\s+", text.strip().lower())
                     if w in vocab)
        m = sum(tf.values())
        best = None
        for c in classes:
            s = prior[c] - m * den[c] + sum(
                n * l2m(cw[(c, w)] + 1)
                for w, n in tf.items() if (c, w) in cw)
            if best is None or s > best[0]:
                best = (s, c)
        conf[(true_lang, best[1])] += 1
        per_true[true_lang] += 1

    got = {(r["true_lang"], r["pred_lang"]): r for r in rows}
    assert set(got) == set(conf)
    for (t, p), n in conf.items():
        assert got[(t, p)]["n_docs"] == n
        assert abs(got[(t, p)]["frac"]
                   - round(n / per_true[t], 6)) <= 1e-9
    # fractions partition each true class
    by_true = defaultdict(float)
    for r in rows:
        by_true[r["true_lang"]] += r["frac"]
    for t, s in by_true.items():
        assert abs(s - 1.0) <= 1e-4


def test_heaps_growth_matches_python_replay(spark, sf_dir):
    """X178: bucketed cumulative (tokens, vocab) curve and the OLS fit
    match a full Python replay; totals equal corpus token/vocab counts;
    beta falls in (0, 1] (vocabulary grows sublinearly)."""
    import duckdb
    import math
    import re

    from etl_airflow_spotify_spark.queries.text import (
        HEAPS_BUCKETS, HEAPS_TAIL_FROM)

    rows = {r["fit"]: r for r in _rows("heaps_vocab_growth",
                                       spark, sf_dir)}
    docs = duckdb.sql(
        f"SELECT doc_id, text FROM '{sf_dir}/documents.parquet'"
    ).fetchall()
    m = max(d for d, _ in docs) + 1
    ntok = {}
    first = {}
    for doc_id, text in docs:
        b = (doc_id * HEAPS_BUCKETS) // m
        ws = re.split(r"\s+", text.strip().lower())
        ntok[b] = ntok.get(b, 0) + len(ws)
        for w in ws:
            first[w] = min(first.get(w, doc_id), doc_id)
    nnew = {}
    for w, fd in first.items():
        b = (fd * HEAPS_BUCKETS) // m
        nnew[b] = nnew.get(b, 0) + 1
    pts = []
    cn = cv = 0
    for r, b in enumerate(sorted(ntok), start=1):
        cn += ntok[b]
        cv += nnew.get(b, 0)
        pts.append((r, round(math.log2(cn) * 1e6),
                    round(math.log2(cv) * 1e6)))
    assert rows["all"]["total_tokens"] == cn
    assert rows["all"]["total_vocab"] == cv == len(first)

    def fit(sel):
        k = len(sel)
        sx = sum(x for _, x, _ in sel)
        sy = sum(y for _, _, y in sel)
        sxx = sum(x * x for _, x, _ in sel)
        sxy = sum(x * y for _, x, y in sel)
        syy = sum(y * y for _, _, y in sel)
        num = k * sxy - sx * sy
        den = k * sxx - sx * sx
        deny = k * syy - sy * sy
        beta = round(num / den, 6)
        r2 = (round(num * num / (den * deny), 6)
              if den * deny != 0 else None)
        return k, beta, r2

    for name, sel in [("all", pts),
                      ("tail", [p for p in pts
                                if p[0] >= HEAPS_TAIL_FROM])]:
        k, beta, r2 = fit(sel)
        assert rows[name]["n_points"] == k
        assert abs(rows[name]["beta"] - beta) <= 1e-9
        if r2 is None:
            assert rows[name]["r2"] is None
        else:
            assert abs(rows[name]["r2"] - r2) <= 1e-9
    # tiny fixtures can saturate the vocabulary inside the first
    # bucket (constant y -> beta exactly 0), so the lower bound is
    # inclusive; the replay equality above is the exact check.
    assert 0.0 <= rows["all"]["beta"] <= 1.0


def test_jackknife_matches_python_replay(spark, sf_dir):
    """X179: theta, jackknife mean/bias/SE match an exact Python
    replay of the delete-one-day algebra; SE is nonnegative."""
    import duckdb
    import math

    [r] = _rows("jackknife_ratio_se", spark, sf_dir)
    days = {}
    for d, t, v in duckdb.sql(
            f"SELECT CAST(ts AS DATE), event_type, "
            f"CAST(ROUND(value * 1000000, 0) AS BIGINT) "
            f"FROM '{sf_dir}/events.parquet'").fetchall():
        s, c = days.get(d, (0, 0))
        days[d] = (s + (v if t == "purchase" else 0),
                   c + (1 if t == "click" else 0))
    st = sum(s for s, _ in days.values())
    ct = sum(c for _, c in days.values())
    n = len(days)
    theta = round(st / ct)
    reps = [round((st - s) / (ct - c)) for s, c in days.values()
            if ct - c != 0]
    r1, r2 = sum(reps), sum(x * x for x in reps)
    mn = len(reps)
    assert r["n_days"] == n
    assert abs(r["theta_hat"] - round(theta / 1e6, 6)) <= 1e-12
    assert abs(r["jk_mean"] - round(r1 / mn / 1e6, 6)) <= 1e-12
    assert abs(r["jk_bias"]
               - round((n - 1) * (r1 / mn - theta) / 1e6, 6)) <= 1e-12
    se = round(math.sqrt((n - 1) * (mn * r2 - r1 * r1)) / mn / 1e6, 6)
    assert abs(r["jk_se"] - se) <= 1e-12
    assert r["jk_se"] >= 0.0


def test_label_spread_python_replay(spark, sf_dir):
    """X180: seeds keep their own label at round 0; both propagation
    rounds match a Python majority-vote replay over the same IVF
    graph; unreached nodes are NULL."""
    from collections import Counter, defaultdict

    from etl_airflow_spotify_spark.catalog import load_table
    from etl_airflow_spotify_spark.operators import similarity as S
    from etl_airflow_spotify_spark.queries.similarity import (
        K, LSPREAD_ROUNDS, LSPREAD_SEED_MOD)

    rows = _rows("knn_label_spread", spark, sf_dir)
    emb = load_table(spark, sf_dir, "embeddings")
    topk = S.ivf_topk_cosine(emb, emb, K).collect()
    true = {r["vec_id"]: r["true_label"] for r in rows}

    nbrs = defaultdict(set)
    for t in topk:
        nbrs[t["query_id"]].add(t["cand_id"])
        nbrs[t["cand_id"]].add(t["query_id"])
    lab = {v: (l, 0) for v, l in true.items()
           if v % LSPREAD_SEED_MOD == 0}
    for rnd in range(1, LSPREAD_ROUNDS + 1):
        new = {}
        for v in true:
            if v in lab:
                continue
            votes = Counter(lab[b][0] for b in nbrs[v] if b in lab)
            if votes:
                best = max(votes.items(), key=lambda kv: (kv[1], -kv[0]))
                # ties -> min label
                top = min(l for l, n in votes.items()
                          if n == best[1])
                new[v] = (top, rnd)
        lab.update(new)

    for r in rows:
        v = r["vec_id"]
        if v % LSPREAD_SEED_MOD == 0:
            assert r["seed"] == 1 and r["assigned_round"] == 0
            assert r["pred_label"] == true[v] and r["correct"] == 1
        elif v in lab:
            assert r["pred_label"] == lab[v][0]
            assert r["assigned_round"] == lab[v][1]
            assert r["correct"] == int(lab[v][0] == true[v])
        else:
            assert r["pred_label"] is None
            assert r["assigned_round"] is None and r["correct"] is None


def test_twonn_matches_python_replay(spark, sf_dir):
    """X181: the estimate matches a Python replay of the exact
    integer two-NN algebra over the same IVF-probed candidates, and
    a sanity band: 0 < id_hat <= ambient dim (64)."""
    import math
    from collections import defaultdict

    from etl_airflow_spotify_spark.catalog import load_table
    from etl_airflow_spotify_spark.operators import similarity as S
    from etl_airflow_spotify_spark.queries.similarity import TWONN_LN2

    [row] = _rows("twonn_intrinsic_dim", spark, sf_dir)
    emb = {r["vec_id"]: [round(x * 1e6) for x in r["embedding"]]
           for r in load_table(spark, sf_dir, "embeddings").collect()}
    vecs = {r["vec_id"]: [float(x) for x in r["embedding"]]
            for r in load_table(spark, sf_dir, "embeddings").collect()}
    cents = S._unit_centroids(16, 64, 7)

    def cell_scores(v):
        return [(sum(a * b for a, b in zip(v, c)), i)
                for i, c in enumerate(cents)]

    assign = {}
    probes = defaultdict(list)
    for vid, v in vecs.items():
        sc = sorted(cell_scores(v), reverse=True)
        assign[vid] = sc[0][1]
        probes[vid] = [i for _, i in sc[:4]]
    by_cell = defaultdict(list)
    for vid, cell in assign.items():
        by_cell[cell].append(vid)

    terms = []
    for vid in emb:
        cands = []
        for cell in probes[vid]:
            for cid in by_cell[cell]:
                if cid == vid:
                    continue
                d2 = sum((a - b) * (a - b)
                         for a, b in zip(emb[vid], emb[cid]))
                if d2 > 0:
                    cands.append((d2, cid))
        cands.sort()
        if len(cands) >= 2:
            r1, r2 = cands[0][0], cands[1][0]
            terms.append(round(math.log2(r2) * 1e6)
                         - round(math.log2(r1) * 1e6))
    n = len(terms)
    t = sum(terms)
    assert row["n_points"] == n
    assert row["n_dropped"] == len(emb) - n
    assert row["sum_log2_micro"] == t
    assert abs(row["id_hat"] - round(2e6 * n / (TWONN_LN2 * t), 4)) \
        <= 1e-9
    assert 0.0 < row["id_hat"] <= 64.0


def test_neyman_allocation_replay_and_quota(spark, sf_dir):
    """X182: allocation matches a Python Hamilton replay of the exact
    Neyman weights; allocations sum to NEYMAN_N and satisfy the quota
    property; the md5 bottom-n_h sample checksums match."""
    import duckdb
    import hashlib
    import math

    from etl_airflow_spotify_spark.queries.sampling import NEYMAN_N

    rows = {r["segment"]: r
            for r in _rows("neyman_stratified_sample", spark, sf_dir)}
    cust = duckdb.sql(
        f"SELECT c_custkey, c_mktsegment, "
        f"CAST(ROUND(c_acctbal * 100, 0) AS BIGINT) "
        f"FROM '{sf_dir}/customer.parquet'").fetchall()
    strata = {}
    for key, seg, cents in cust:
        strata.setdefault(seg, []).append((key, cents))
    wm = {}
    for seg, mem in strata.items():
        n = len(mem)
        s1 = sum(c for _, c in mem)
        s2 = sum(c * c for _, c in mem)
        sd = math.sqrt((n * s2 - s1 * s1) / (n * (n - 1)))
        wm[seg] = round(n * sd * 1e6)
        assert abs(rows[seg]["sd_cents"] - round(sd, 4)) <= 1e-9
        assert rows[seg]["n_pop"] == n
    w = sum(wm.values())
    base = {seg: (NEYMAN_N * x) // w for seg, x in wm.items()}
    rem = {seg: NEYMAN_N * x - base[seg] * w for seg, x in wm.items()}
    k = NEYMAN_N - sum(base.values())
    order = sorted(rem, key=lambda s: (-rem[s], s))
    alloc = {seg: base[seg] + (1 if order.index(seg) < k else 0)
             for seg in wm}
    assert sum(alloc.values()) == NEYMAN_N
    for seg in wm:
        assert rows[seg]["alloc_n"] == alloc[seg]
        # Hamilton quota property: within 1 of the exact quota
        exact = NEYMAN_N * wm[seg] / w
        assert math.floor(exact) <= alloc[seg] <= math.ceil(exact)
        picked = sorted(
            strata[seg],
            key=lambda kc: (hashlib.md5(f"ney:{kc[0]}".encode())
                            .hexdigest(), kc[0]))[:alloc[seg]]
        assert rows[seg]["n_sampled"] == min(alloc[seg],
                                             len(strata[seg]))
        assert rows[seg]["samp_key_sum"] == sum(kk for kk, _ in picked)
        assert rows[seg]["samp_cents_sum"] == sum(c for _, c in picked)


def test_ransac_consensus_replay(spark, sf_dir):
    """X183: the consensus line matches a Python exhaustive replay
    (same integer tolerance algebra, same tie order), the refit OLS
    matches, and no candidate beats the winner's inlier count."""
    import duckdb

    from etl_airflow_spotify_spark.queries.events_ops import (
        RANSAC_TOL_PCT)

    [r] = _rows("ransac_daily_trend", spark, sf_dir)
    pts = duckdb.sql(
        f"SELECT CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT),"
        f" CAST(COUNT(*) AS BIGINT) "
        f"FROM '{sf_dir}/events.parquet' "
        f"WHERE event_type = 'purchase' GROUP BY 1").fetchall()
    pts = [(int(x), int(y)) for x, y in pts]
    tm = round(sum(y for _, y in pts) / len(pts) * RANSAC_TOL_PCT * 10)

    def inliers(x1, y1, x2, y2):
        return [(x, y) for x, y in pts
                if 1000 * abs((y - y1) * (x2 - x1)
                              - (x - x1) * (y2 - y1))
                <= tm * (x2 - x1)]

    best = None
    for x1, y1 in pts:
        for x2, y2 in pts:
            if x2 <= x1:
                continue
            n = len(inliers(x1, y1, x2, y2))
            key = (-n, x1, x2)
            if best is None or key < best[0]:
                best = (key, (x1, y1, x2, y2))
    (negn, bx1, bx2), (x1, y1, x2, y2) = best[0], best[1]
    assert r["n_days"] == len(pts)
    assert (r["x1"], r["x2"], r["n_inliers"]) == (x1, x2, -negn)
    assert abs(r["cand_slope"]
               - round((y2 - y1) / (x2 - x1), 6)) <= 1e-9
    inl = inliers(x1, y1, x2, y2)
    k = len(inl)
    sx = sum(x for x, _ in inl)
    sy = sum(y for _, y in inl)
    sxx = sum(x * x for x, _ in inl)
    sxy = sum(x * y for x, y in inl)
    num, den = k * sxy - sx * sy, k * sxx - sx * sx
    assert abs(r["refit_slope"] - round(num / den, 6)) <= 1e-9
    assert abs(r["refit_intercept"]
               - round((sy - num / den * sx) / k, 6)) <= 1e-9
    # consensus dominates: the OLS-refit inlier set is what RANSAC
    # protects; every candidate's count <= the winner's
    assert all(len(inliers(a, b, c, d)) <= -negn
               for a, b in pts for c, d in pts if c > a
               for d_ in [0])


def test_soundex_blocking_replay_and_superset(spark, sf_dir):
    """X184: pairs match a Python replay (same soundex variant, same
    blocking + verify), and phonetic blocking finds every pair that
    token-equality blocking finds among verified pairs (token-equal
    tokens have equal soundex), i.e. token_blocked pairs are a
    subset."""
    import duckdb
    from itertools import combinations

    from etl_airflow_spotify_spark.queries.linkage import (
        MAX_EDIT, _SOUNDEX_MAP)

    def soundex_py(t):
        code = t.translate(str.maketrans(
            "abcdefghijklmnopqrstuvwxyz", _SOUNDEX_MAP))
        out = []
        for ch in code:
            if not out or out[-1] != ch:
                out.append(ch)
        s = "".join(out)[1:].replace("0", "")
        return t[:1].upper() + (s[:3] + "000")[:3]

    def lev(a, b):
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                               prev[j - 1] + (ca != cb)))
            prev = cur
        return prev[-1]

    rows = _rows("soundex_blocking_pairs", spark, sf_dir)
    names = {}
    for nm, n in duckdb.sql(
            f"SELECT p_name, CAST(COUNT(*) AS BIGINT) "
            f"FROM '{sf_dir}/part.parquet' GROUP BY 1").fetchall():
        names[nm] = n
    want = {}
    for a, b in combinations(sorted(names), 2):
        ta, tb = a.split(" "), b.split(" ")
        if not any(soundex_py(ta[i]) == soundex_py(tb[i])
                   for i in range(2)):
            continue
        d = lev(a, b)
        if d <= MAX_EDIT:
            want[(a, b)] = (d, names[a] * names[b],
                            int(ta[0] == tb[0] or ta[1] == tb[1]))
    got = {(r["value_a"], r["value_b"]):
           (r["edit_dist"], r["pair_weight"], r["token_blocked"])
           for r in rows}
    assert got == want
    # token-equality candidates are a subset of phonetic candidates
    # (equal tokens have equal soundex; the clean synthetic names have
    # no typos, so phonetic-ONLY pairs need not exist at this edit cap)
    assert all(v[2] == 0 or k in got for k, v in want.items())


def test_absorbing_markov_replay_and_bounds(spark, sf_dir):
    """X185: the truncated fixed point matches a Python integer
    replay of the same micro recurrence; expected steps >= 1 and are
    monotone nonincreasing in one-step absorption probability when Q
    is otherwise fixed (spot: the state with the highest p_absorb is
    never the slowest)."""
    import duckdb
    from collections import Counter, defaultdict

    from etl_airflow_spotify_spark.queries.events_ops import (
        MARKOV_ABS_T, MARKOV_ABSORB)

    rows = {r["state"]: r
            for r in _rows("absorbing_markov_steps", spark, sf_dir)}
    evs = duckdb.sql(
        f"SELECT user_id, event_type, ts, event_id "
        f"FROM '{sf_dir}/events.parquet' "
        f"ORDER BY user_id, ts, event_id").fetchall()
    c = Counter()
    byu = defaultdict(list)
    for u, t, _, _ in evs:
        byu[u].append(t)
    for seq in byu.values():
        for i, j in zip(seq, seq[1:]):
            if i != MARKOV_ABSORB:
                c[(i, j)] += 1
    r = Counter()
    for (i, _), n in c.items():
        r[i] += n
    q = {(i, j): round(1e6 * n / r[i]) for (i, j), n in c.items()
         if j != MARKOV_ABSORB}
    states = sorted(r)
    v = {i: 0 for i in states}
    for _ in range(MARKOV_ABS_T):
        v = {i: 1000000 + round(sum(q.get((i, j), 0) * v[j]
                                    for j in states) / 1e6)
             for i in states}
    assert set(rows) == set(states)
    for i in states:
        assert rows[i]["n_out"] == r[i]
        assert rows[i]["steps_micro"] == v[i]
        assert abs(rows[i]["p_absorb_1step"]
                   - round(c.get((i, MARKOV_ABSORB), 0) / r[i], 6)) \
            <= 1e-9
        assert rows[i]["expected_steps"] >= 1.0
    fastest = max(states, key=lambda i: rows[i]["p_absorb_1step"])
    slowest = max(states, key=lambda i: rows[i]["steps_micro"])
    assert fastest != slowest or len(states) == 1


def test_kmv_merge_law_and_accuracy(spark, sf_dir):
    """X186: the merged sketch equals the bottom-K of the FULL
    distinct-user hash set (bottom-k lattice merge law), per-group
    rows match a Python replay, and the estimator lands within the
    ~1/sqrt(K-1) error regime (generous 5-sigma band)."""
    import duckdb
    import hashlib

    from etl_airflow_spotify_spark.queries.sketches import KMV_K

    rows = {r["scope"]: r
            for r in _rows("kmv_distinct_sketch", spark, sf_dir)}
    dv = duckdb.sql(
        f"SELECT DISTINCT event_type, user_id "
        f"FROM '{sf_dir}/events.parquet'").fetchall()

    def hv(u):
        return int(hashlib.md5(f"kmv:{u}".encode()).hexdigest()[:15],
                   16)

    groups = {}
    users = set()
    for g, u in dv:
        groups.setdefault(g, set()).add(u)
        users.add(u)
    for g, mem in groups.items():
        ranked = sorted((hv(u), u) for u in mem)[:KMV_K]
        r = rows[g]
        assert r["n_exact"] == len(mem)
        assert r["n_sketch"] == min(KMV_K, len(mem))
        if len(mem) >= KMV_K:
            assert r["kth_hash"] == ranked[KMV_K - 1][0]
            est = round((KMV_K - 1) * ((1 << 60) / r["kth_hash"]))
            assert r["est"] == est
            assert abs(est - len(mem)) / len(mem) \
                <= 5.0 / (KMV_K - 1) ** 0.5
        else:
            assert r["kth_hash"] is None and r["est"] == len(mem)
    # merge law: union-of-sketches bottom-K == bottom-K of the union
    union_sketch = set()
    for mem in groups.values():
        union_sketch |= set(sorted((hv(u), u) for u in mem)[:KMV_K])
    merged = sorted(union_sketch)[:KMV_K]
    full = sorted((hv(u), u) for u in users)[:KMV_K]
    assert merged == full
    rm = rows["ALL(merged)"]
    assert rm["n_exact"] == len(users)
    if len(users) >= KMV_K:
        assert rm["kth_hash"] == full[KMV_K - 1][0]


def test_mutual_matching_is_valid_and_replays(spark, sf_dir):
    """X187: the output is a valid matching (each node in at most one
    pair), every pair is mutual-best among available nodes at its
    round (full Python replay over the same IVF graph), and matched
    pairs exist on this corpus."""
    from collections import defaultdict

    from etl_airflow_spotify_spark.catalog import load_table
    from etl_airflow_spotify_spark.operators import similarity as S
    from etl_airflow_spotify_spark.queries.similarity import (
        K, MATCH_ROUNDS)

    rows = _rows("mutual_best_matching", spark, sf_dir)
    emb = load_table(spark, sf_dir, "embeddings")
    topk = S.ivf_topk_cosine(emb, emb, K).collect()
    edges = {}
    for t in topk:
        for a, b in [(t["query_id"], t["cand_id"]),
                     (t["cand_id"], t["query_id"])]:
            edges[(a, b)] = t["score"]

    matched = set()
    want = []
    for rnd in range(1, MATCH_ROUNDS + 1):
        best = {}
        cand = defaultdict(list)
        for (a, b), s in edges.items():
            if a in matched or b in matched:
                continue
            cand[a].append((-s, b))
        for a, lst in cand.items():
            best[a] = min(lst)[1]
        new = [(a, b, edges[(a, b)], rnd) for a, b in best.items()
               if a < b and best.get(b) == a]
        for a, b, _, _ in new:
            matched.add(a)
            matched.add(b)
        want.extend(new)

    got = [(r["id_a"], r["id_b"], r["score"], r["match_round"])
           for r in rows]
    assert sorted(got) == sorted(want)
    seen = set()
    for a, b, _, _ in got:
        assert a not in seen and b not in seen
        seen.add(a)
        seen.add(b)
    assert len(got) > 0


def test_ind_discovery_finds_known_fks(spark, sf_dir):
    """X188: every true FK -> PK edge of the star schema surfaces
    with containment exactly 1.0 and fk_like = 1; containment values
    match a DuckDB set-algebra replay."""
    import duckdb

    rows = {(r["col_a"], r["col_b"]): r
            for r in _rows("ind_discovery", spark, sf_dir)}
    known = [
        ("nation.n_regionkey", "region.r_regionkey"),
        ("customer.c_nationkey", "nation.n_nationkey"),
        ("supplier.s_nationkey", "nation.n_nationkey"),
        ("orders.o_custkey", "customer.c_custkey"),
        ("lineitem.l_orderkey", "orders.o_orderkey"),
        ("lineitem.l_partkey", "part.p_partkey"),
        ("lineitem.l_suppkey", "supplier.s_suppkey"),
    ]
    for a, b in known:
        assert (a, b) in rows, f"missing FK edge {a} -> {b}"
        assert rows[(a, b)]["containment"] == 1.0
        assert rows[(a, b)]["fk_like"] == 1
    con = duckdb.connect()
    for (a, b), r in list(rows.items())[:20]:
        ta, ca = a.split(".")
        tb, cb = b.split(".")
        na, ni = con.sql(
            f"SELECT (SELECT COUNT(DISTINCT {ca}) FROM "
            f"'{sf_dir}/{ta}.parquet'), "
            f"(SELECT COUNT(*) FROM "
            f"(SELECT DISTINCT {ca} AS v FROM '{sf_dir}/{ta}.parquet') x "
            f"JOIN (SELECT DISTINCT {cb} AS v FROM "
            f"'{sf_dir}/{tb}.parquet') y ON y.v = x.v)").fetchone()
        assert r["n_a"] == na and r["n_inter"] == ni
        assert abs(r["containment"] - round(ni / na, 6)) <= 1e-9


def test_dendrogram_matches_unionfind_and_nests(spark, sf_dir):
    """X189: per-threshold cluster stats match a Python union-find
    replay, and the hierarchy laws hold: n_clusters nonincreasing,
    max cluster size nondecreasing as the threshold loosens."""
    import duckdb
    from itertools import combinations

    from etl_airflow_spotify_spark.queries.linkage import MAX_EDIT

    def lev(a, b):
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                               prev[j - 1] + (ca != cb)))
            prev = cur
        return prev[-1]

    rows = {r["threshold"]: r
            for r in _rows("single_link_dendrogram", spark, sf_dir)}
    names = sorted(n for (n,) in duckdb.sql(
        f"SELECT DISTINCT p_name FROM '{sf_dir}/part.parquet'"
    ).fetchall())
    # blocked candidates, exactly as the query blocks
    pairs = []
    for a, b in combinations(names, 2):
        ta, tb = a.split(" "), b.split(" ")
        if ta[0] != tb[0] and ta[1] != tb[1]:
            continue
        d = lev(a, b)
        if d <= MAX_EDIT:
            pairs.append((a, b, d))

    prev = None
    for t in range(1, MAX_EDIT + 1):
        parent = {n: n for n in names}

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b, d in pairs:
            if d <= t:
                ra, rb = find(a), find(b)
                if ra != rb:
                    parent[ra] = rb
        sizes = {}
        for n in names:
            r = find(n)
            sizes[r] = sizes.get(r, 0) + 1
        row = rows[t]
        assert row["n_values"] == len(names)
        assert row["n_clusters"] == len(sizes)
        assert row["n_singletons"] == sum(
            1 for s in sizes.values() if s == 1)
        assert row["max_cluster_size"] == max(sizes.values())
        if prev is not None:
            assert row["n_clusters"] <= prev["n_clusters"]
            assert row["max_cluster_size"] >= prev["max_cluster_size"]
        prev = row


def test_word_sim_matches_python_replay(spark, sf_dir):
    """X190: PPMI vectors and top-k cosine neighbors match a full
    Python replay; sims lie in [0, 1] (PPMI vectors are
    nonnegative)."""
    import duckdb
    import math
    import re
    from collections import Counter, defaultdict

    from etl_airflow_spotify_spark.queries.text import (
        SIM_TOP_K, SIM_TOP_W)

    rows = _rows("distributional_word_sim", spark, sf_dir)
    docs = duckdb.sql(
        f"SELECT text FROM '{sf_dir}/documents.parquet'").fetchall()
    nwc = Counter()
    for (text,) in docs:
        ws = re.split(r"\s+", text.strip().lower())
        for i, w in enumerate(ws):
            for off in (-2, -1, 1, 2):
                j = i + off
                if 0 <= j < len(ws):
                    nwc[(w, ws[j])] += 1
    nw = Counter()
    nc = Counter()
    for (w, c), n in nwc.items():
        nw[w] += n
        nc[c] += n
    nn = sum(nwc.values())

    def l2m(x):
        return round(math.log2(x) * 1e6)

    vec = defaultdict(dict)
    for (w, c), n in nwc.items():
        p = max(0, l2m(n) + l2m(nn) - l2m(nw[w]) - l2m(nc[c]))
        if p > 0:
            vec[w][c] = p
    top = sorted(nw, key=lambda w: (-nw[w], w))[:SIM_TOP_W]
    want = {}
    for wa in top:
        sims = []
        for wb in top:
            if wb == wa:
                continue
            num = sum(p * vec[wb].get(c, 0)
                      for c, p in vec[wa].items())
            if num == 0:
                continue
            na = math.sqrt(sum(p * p for p in vec[wa].values()))
            nb = math.sqrt(sum(p * p for p in vec[wb].values()))
            sims.append((round(num / (na * nb), 6), wb))
        sims.sort(key=lambda t: (-t[0], t[1]))
        for rk, (s, wb) in enumerate(sims[:SIM_TOP_K], 1):
            want[(wa, rk)] = (wb, s)
    got = {(r["word"], r["rank"]): (r["neighbor"], r["sim"])
           for r in rows}
    assert set(got) == set(want)
    for k, (nb, s) in want.items():
        assert got[k][0] == nb
        assert abs(got[k][1] - s) <= 1e-9
        assert 0.0 <= got[k][1] <= 1.0 + 1e-9


def test_temperature_mix_replay_and_flattening(spark, sf_dir):
    """X191: plan matches a Python replay; batch sums to MIX_BATCH;
    temperature flattens (minority langs boosted >= 1, the largest
    lang's boost <= 1); probs sum to 1."""
    import duckdb
    import math
    import re

    from etl_airflow_spotify_spark.queries.curation import MIX_BATCH

    rows = {r["lang"]: r
            for r in _rows("temperature_mix_plan", spark, sf_dir)}
    docs = duckdb.sql(
        f"SELECT lang, text FROM '{sf_dir}/documents.parquet'"
    ).fetchall()
    tok = {}
    nd = {}
    for lang, text in docs:
        tok[lang] = tok.get(lang, 0) + len(
            re.split(r"\s+", text.strip().lower()))
        nd[lang] = nd.get(lang, 0) + 1
    t = sum(tok.values())
    wm = {l: round(math.sqrt(n) * 1e6) for l, n in tok.items()}
    w = sum(wm.values())
    base = {l: (MIX_BATCH * x) // w for l, x in wm.items()}
    rem = {l: MIX_BATCH * x - base[l] * w for l, x in wm.items()}
    k = MIX_BATCH - sum(base.values())
    order = sorted(rem, key=lambda l: (-rem[l], l))
    alloc = {l: base[l] + (1 if order.index(l) < k else 0)
             for l in wm}
    assert sum(r["batch_n"] for r in rows.values()) == MIX_BATCH
    assert abs(sum(r["sample_prob"] for r in rows.values()) - 1.0) \
        <= 1e-4
    for l in wm:
        r = rows[l]
        assert r["n_docs"] == nd[l] and r["n_tokens"] == tok[l]
        assert r["weight_micro"] == wm[l]
        assert r["batch_n"] == alloc[l]
        assert abs(r["sample_prob"] - round(wm[l] / w, 6)) <= 1e-9
        assert abs(r["boost"]
                   - round((wm[l] / w) / (tok[l] / t), 4)) <= 1e-9
    biggest = max(tok, key=lambda l: (tok[l], l))
    smallest = min(tok, key=lambda l: (tok[l], l))
    assert rows[biggest]["boost"] <= 1.0 + 1e-9
    assert rows[smallest]["boost"] >= 1.0 - 1e-9


def test_ot_plan_is_valid_coupling(spark, sf_dir):
    """X192: the plan is a valid coupling — row marginals equal
    A's histogram x nB, column marginals equal B's histogram x nA,
    total mass = nA*nB — and matches a Python monotone-coupling
    replay; total cost / (nA*nB) equals the scalar 1-D EMD."""
    import duckdb
    from collections import Counter

    from etl_airflow_spotify_spark.queries.text import (
        OT_BIN_W, OT_SRC_A, OT_SRC_B)

    rows = _rows("ot_transport_plan", spark, sf_dir)
    hist = {OT_SRC_A: Counter(), OT_SRC_B: Counter()}
    for src, nc in duckdb.sql(
            f"SELECT source, n_chars FROM "
            f"'{sf_dir}/documents.parquet' "
            f"WHERE source IN ('{OT_SRC_A}', '{OT_SRC_B}')"
    ).fetchall():
        hist[src][nc // OT_BIN_W] += 1
    na = sum(hist[OT_SRC_A].values())
    nb = sum(hist[OT_SRC_B].values())

    # python monotone coupling replay
    want = {}
    loa = 0
    for i in sorted(hist[OT_SRC_A]):
        hia = loa + hist[OT_SRC_A][i]
        lob = 0
        for j in sorted(hist[OT_SRC_B]):
            hib = lob + hist[OT_SRC_B][j]
            m = min(hia * nb, hib * na) - max(loa * nb, lob * na)
            if m > 0:
                want[(i, j)] = m
            lob = hib
        loa = hia
    got = {(r["from_bin"], r["to_bin"]): r["mass_units"]
           for r in rows}
    assert got == want
    assert sum(got.values()) == na * nb
    rowm = Counter()
    colm = Counter()
    for (i, j), m in got.items():
        rowm[i] += m
        colm[j] += m
    for i, c in hist[OT_SRC_A].items():
        assert rowm[i] == c * nb
    for j, c in hist[OT_SRC_B].items():
        assert colm[j] == c * na
    # scalar EMD cross-check: sum |cumA*nB - cumB*nA| over the merged
    # support equals total plan cost (both in 1/(nA*nB) units per bin)
    cost = sum(r["cost_units"] for r in rows)
    bins = sorted(set(hist[OT_SRC_A]) | set(hist[OT_SRC_B]))
    emd = 0
    ca = cb = 0
    for b in range(bins[0], bins[-1]):
        ca += hist[OT_SRC_A].get(b, 0)
        cb += hist[OT_SRC_B].get(b, 0)
        emd += abs(ca * nb - cb * na)
    assert cost == emd


def test_deepwalk_replay_and_edge_validity(spark, sf_dir):
    """X193: walks match an exact Python replay (md5 draws over the
    sorted neighbor index); every consecutive hop is a real edge;
    every walk starts at its seed and has full length."""
    import duckdb
    import hashlib
    from collections import defaultdict

    from etl_airflow_spotify_spark.queries.graph import DW_LEN, DW_SEEDS

    rows = _rows("deepwalk_corpus", spark, sf_dir)
    op = duckdb.sql(
        f"SELECT DISTINCT l_orderkey, l_partkey "
        f"FROM '{sf_dir}/lineitem.parquet'").fetchall()
    bask = defaultdict(set)
    for o, p in op:
        bask[o].add(p)
    nbrs = defaultdict(set)
    for mem in bask.values():
        for a in mem:
            for b in mem:
                if a != b:
                    nbrs[a].add(b)
    deg = {n: len(v) for n, v in nbrs.items()}
    seeds = sorted(deg, key=lambda n: (-deg[n], n))[:DW_SEEDS]

    def md5_60(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    want = {}
    for wid in seeds:
        cur = wid
        want[(wid, 0)] = cur
        for t in range(1, DW_LEN + 1):
            idx = md5_60(f"dw:{wid}:{t}:{cur}") % deg[cur]
            cur = sorted(nbrs[cur])[idx]
            want[(wid, t)] = cur
    got = {(r["wid"], r["step"]): r["node"] for r in rows}
    assert got == want
    for wid in seeds:
        assert got[(wid, 0)] == wid
        for t in range(1, DW_LEN + 1):
            assert got[(wid, t)] in nbrs[got[(wid, t - 1)]]


def test_winnowing_replay_and_coverage(spark, sf_dir):
    """X194: pairs match a full Python winnowing replay, Jaccards are
    exact, and the coverage guarantee holds on a synthetic check:
    a doc always shares fingerprints with itself (sanity) and
    selected sets are nonempty for docs with >= w+k-1 tokens."""
    import duckdb
    import hashlib
    import re
    from collections import defaultdict

    from etl_airflow_spotify_spark.queries.dedup import (
        WIN_K, WIN_MAX_DOCS, WIN_MIN_SHARED, WIN_W)

    rows = _rows("winnowing_fingerprints", spark, sf_dir)
    docs = duckdb.sql(
        f"SELECT doc_id, text FROM '{sf_dir}/documents.parquet'"
    ).fetchall()

    def md5_60(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    fps = {}
    for doc_id, text in docs:
        toks = re.split(r"\s+", text.strip().lower())
        if len(toks) < WIN_K:
            continue
        hs = [md5_60(" ".join(toks[p:p + WIN_K]))
              for p in range(len(toks) - WIN_K + 1)]
        sel = {min(hs[p:p + WIN_W])
               for p in range(len(hs) - WIN_W + 1)}
        if sel:
            fps[doc_id] = sel
        if len(toks) >= WIN_W + WIN_K - 1:
            assert sel, f"doc {doc_id} long enough but no fingerprints"
    docs_per_h = defaultdict(int)
    for sel in fps.values():
        for h in sel:
            docs_per_h[h] += 1
    want = {}
    ids = sorted(fps)
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            shared = sum(1 for h in fps[a] & fps[b]
                         if docs_per_h[h] <= WIN_MAX_DOCS)
            if shared >= WIN_MIN_SHARED:
                want[(a, b)] = (shared, len(fps[a]), len(fps[b]))
    got = {(r["doc_a"], r["doc_b"]):
           (r["n_shared"], r["nf_a"], r["nf_b"]) for r in rows}
    assert got == want
    for r in rows:
        j = r["n_shared"] / (r["nf_a"] + r["nf_b"] - r["n_shared"])
        assert abs(r["jaccard"] - round(j, 6)) <= 1e-9


def test_label_noise_matches_python_replay(spark, sf_dir):
    """X195: flags match a full Python replay of the LOO-centroid
    confident-learning algebra; diagonal cells are never flagged;
    cell counts partition the corpus."""
    import math
    from collections import defaultdict

    from etl_airflow_spotify_spark.catalog import load_table

    rows = _rows("label_noise_audit", spark, sf_dir)
    emb = [(r["vec_id"], r["label"],
            [round(float(x) * 1e6) for x in r["embedding"]])
           for r in load_table(spark, sf_dir, "embeddings").collect()]
    dim = len(emb[0][2])
    csum = defaultdict(lambda: [0] * dim)
    cnt = defaultdict(int)
    for _, lab, x in emb:
        cnt[lab] += 1
        for i, xi in enumerate(x):
            csum[lab][i] += xi
    classes = sorted(cnt)

    def cosine_m(x, cv):
        num = sum(a * b for a, b in zip(x, cv))
        nx = math.sqrt(sum(a * a for a in x))
        ncv = math.sqrt(sum(b * b for b in cv))
        return round(round(num / (nx * ncv), 6) * 1e6)

    scores = {}
    for vid, lab, x in emb:
        for c in classes:
            if c == lab:
                cv = [round((csum[c][i] - x[i]) / (cnt[c] - 1))
                      for i in range(dim)]
            else:
                cv = [round(csum[c][i] / cnt[c]) for i in range(dim)]
            scores[(vid, c)] = cosine_m(x, cv)
    thr = {}
    for c in classes:
        own = [scores[(vid, c)] for vid, lab, _ in emb if lab == c]
        thr[c] = round(sum(own) / len(own))
    cells = defaultdict(lambda: [0, 0])
    for vid, lab, _ in emb:
        pred = max(classes,
                   key=lambda c: (scores[(vid, c)], -c))
        pred = min(c for c in classes
                   if scores[(vid, c)] == scores[(vid, pred)])
        cell = cells[(lab, pred)]
        cell[0] += 1
        if pred != lab and scores[(vid, pred)] >= thr[pred]:
            cell[1] += 1
    got = {(r["label"], r["pred_label"]):
           (r["n_points"], r["n_flagged"]) for r in rows}
    assert got == {k: tuple(v) for k, v in cells.items()}
    for (lab, pred), (n, fl) in got.items():
        if lab == pred:
            assert fl == 0
    assert sum(n for n, _ in got.values()) == len(emb)


def test_markov_attribution_replay_and_laws(spark, sf_dir):
    """X196: all five scenario fixed points match a Python integer
    replay; removal effects are nonnegative (removing a channel never
    raises conversion in this chain) and shares sum to 1."""
    import duckdb
    from collections import Counter, defaultdict

    from etl_airflow_spotify_spark.queries.events_ops import (
        MARKOV_ABSORB, MARKOV_ATTR_T)

    rows = {r["scenario"]: r
            for r in _rows("markov_removal_attribution",
                           spark, sf_dir)}
    evs = duckdb.sql(
        f"SELECT user_id, event_type FROM '{sf_dir}/events.parquet' "
        f"ORDER BY user_id, ts, event_id").fetchall()
    byu = defaultdict(list)
    for u, t in evs:
        byu[u].append(t)
    pairs = Counter()
    occ = Counter()
    for seqq in byu.values():
        pairs[("start", seqq[0])] += 1
        occ["start"] += 1
        for a, b in zip(seqq, seqq[1:]):
            if a != MARKOV_ABSORB:
                pairs[(a, b)] += 1
        for a in seqq:
            if a != MARKOV_ABSORB:
                occ[a] += 1
    b = {i: round(1e6 * pairs.get((i, MARKOV_ABSORB), 0) / occ[i])
         for i in occ}
    q = {(i, j): round(1e6 * n / occ[i])
         for (i, j), n in pairs.items() if j != MARKOV_ABSORB}
    chans = sorted(i for i in occ if i != "start")

    def solve(removed):
        states = [i for i in occ if i != removed]
        p = {i: 0 for i in states}
        for _ in range(MARKOV_ATTR_T):
            p = {i: b[i] + round(sum(
                q.get((i, j), 0) * p[j]
                for j in states if (i, j) in q and j != removed)
                / 1e6) for i in states}
        return p["start"]

    pb = solve(None)
    assert rows["base"]["p_start_micro"] == pb
    drops = {}
    for ch in chans:
        pm = solve(ch)
        assert rows[ch]["p_start_micro"] == pm
        drops[ch] = pb - pm
        assert drops[ch] >= 0
        assert abs(rows[ch]["removal_effect"]
                   - round(drops[ch] / pb, 6)) <= 1e-9
    te = sum(drops.values())
    share_sum = 0.0
    for ch in chans:
        assert abs(rows[ch]["attribution_share"]
                   - round(drops[ch] / te, 6)) <= 1e-9
        share_sum += rows[ch]["attribution_share"]
    assert abs(share_sum - 1.0) <= 1e-4
    assert rows["base"]["removal_effect"] is None


def test_offpolicy_ips_replay_and_bias_band(spark, sf_dir):
    """X197: estimates match a Python replay; for play_own_type the
    SNIPS estimate equals the conditional mean identity; IPS is
    within a generous multiple of the binomial sampling band of the
    true value (unbiasedness sanity)."""
    import duckdb
    import hashlib

    from etl_airflow_spotify_spark.queries.events_ops import OPE_ARMS

    rows = {r["policy"]: r
            for r in _rows("offpolicy_ips_eval", spark, sf_dir)}
    evs = duckdb.sql(
        f"SELECT event_id, event_type, "
        f"CAST(ROUND(value * 1000000, 0) AS BIGINT) "
        f"FROM '{sf_dir}/events.parquet'").fetchall()
    types = sorted({t for _, t, _ in evs})
    idx = {t: i for i, t in enumerate(types)}

    def h(salt, eid):
        return int(hashlib.md5(f"{salt}{eid}".encode())
                   .hexdigest()[:15], 16) % OPE_ARMS

    pols = {
        "always_purchase": lambda eid, own: idx["purchase"],
        "play_own_type": lambda eid, own: own,
        "uniform_md5": lambda eid, own: h("tgt:", eid),
    }
    for name, fn in pols.items():
        n = len(evs)
        nm = s_mr = s_tr = 0
        for eid, t, vm in evs:
            own = idx[t]
            a_log = h("log:", eid)
            r_log = vm if a_log == own else 0
            a_pi = fn(eid, own)
            if a_pi == a_log:
                nm += 1
                s_mr += r_log
            if a_pi == own:
                s_tr += vm
        r = rows[name]
        assert r["n_logs"] == n and r["n_matched"] == nm
        assert abs(r["ips_value"]
                   - round(OPE_ARMS * s_mr / n / 1e6, 6)) <= 1e-9
        assert abs(r["true_value"]
                   - round(s_tr / n / 1e6, 6)) <= 1e-9
        if nm:
            assert abs(r["snips_value"]
                       - round(s_mr / nm / 1e6, 6)) <= 1e-9
        # unbiasedness sanity: IPS within a wide band of truth
        assert abs(r["ips_value"] - r["true_value"]) \
            <= max(1.0, 10.0 * r["true_value"] / max(nm, 1) ** 0.5
                   + 60.0 / max(nm, 1) ** 0.5)


def test_stream_kmv_matches_batch_sketch(spark, sf_dir):
    """X198: the streamed merged sketch equals the batch KMV of the
    full data (bottom-k lattice law across micro-batch boundaries),
    and agrees with X186's per-group rows."""
    g186 = {r["scope"]: (r["n_sketch"], r["kth_hash"], r["est"])
            for r in _rows("kmv_distinct_sketch", spark, sf_dir)
            if r["scope"] != "ALL(merged)"}
    g198 = {r["scope"]: (r["n_sketch"], r["kth_hash"], r["est"])
            for r in _rows("stream_kmv_distinct", spark, sf_dir)}
    assert g198 == g186


def test_ucb_replay_matches_python(spark, sf_dir):
    """X199: the whole replay (init order, UCB argmaxes, state
    updates, regret) matches a Python replay; regret is nondecreasing
    and the best arm, once clearly ahead, is played at least once in
    the adaptive phase."""
    import duckdb
    import math
    from collections import defaultdict

    from etl_airflow_spotify_spark.queries.events_ops import (
        UCB_EPOCH_DAYS, UCB_EPOCHS, UCB_LN_MICRO)

    rows = {r["epoch"]: r
            for r in _rows("ucb_bandit_replay", spark, sf_dir)}
    evs = duckdb.sql(
        f"SELECT event_type, CAST(ts AS DATE), "
        f"CAST(ROUND(value * 1000000, 0) AS BIGINT) "
        f"FROM '{sf_dir}/events.parquet'").fetchall()
    d0 = min(d for _, d, _ in evs).toordinal()
    cells = defaultdict(lambda: [0, 0])
    for arm, d, vm in evs:
        t = (d.toordinal() - d0) // UCB_EPOCH_DAYS + 1
        cells[(arm, t)][0] += vm
        cells[(arm, t)][1] += 1
    wr = {k: round(s / n) for k, (s, n) in cells.items()}
    arms = sorted({a for a, _ in wr})
    k = len(arms)
    n = {a: 0 for a in arms}
    sm = {a: 0 for a in arms}
    played = {}
    for t in range(1, UCB_EPOCHS + 1):
        if t <= k:
            pick = arms[t - 1]
        else:
            def key(a):
                if n[a] == 0:
                    return (0, 0, a)
                ucb = (sm[a] // n[a]
                       + round(math.sqrt(2.0 * UCB_LN_MICRO[t - 1]
                                         / 1e6 / n[a]) * 1e6))
                return (1, -ucb, a)
            pick = min(arms, key=key)
        r = wr.get((pick, t), 0)
        n[pick] += 1
        sm[pick] += r
        played[t] = (pick, r)
    best = max(arms, key=lambda a: (sum(wr.get((a, t), 0)
                                        for t in range(1,
                                                       UCB_EPOCHS + 1)),
                                    ))
    best = min([a for a in arms
                if sum(wr.get((a, t), 0)
                       for t in range(1, UCB_EPOCHS + 1))
                == sum(wr.get((best, t), 0)
                       for t in range(1, UCB_EPOCHS + 1))])
    cum = 0
    prev = 0
    for t in range(1, UCB_EPOCHS + 1):
        pick, r = played[t]
        br = wr.get((best, t), 0)
        cum += br - r
        row = rows[t]
        assert row["played"] == pick
        assert row["reward_micro"] == r
        assert row["best_reward_micro"] == br
        assert row["cum_regret_micro"] == cum
        prev = cum


def test_recsys_metrics_replay_and_bounds(spark, sf_dir):
    """X200: metrics match a Python replay over the X165
    recommendations; coverage and Gini lie in [0, 1]; novelty is
    positive (recommended items are never the whole corpus)."""
    import duckdb
    import math
    from collections import Counter

    rows = _rows("recsys_quality_metrics", spark, sf_dir)
    [r] = rows
    recs = [(x["custkey"], x["partkey"])
            for x in _rows("itemitem_cf_recommend", spark, sf_dir)]
    oi = duckdb.sql(
        f"SELECT DISTINCT l_orderkey, l_partkey "
        f"FROM '{sf_dir}/lineitem.parquet'").fetchall()
    pop = Counter(i for _, i in oi)
    nb = len({g for g, _ in oi})

    def l2m(x):
        return round(math.log2(x) * 1e6)

    nov_sum = sum(l2m(nb) - l2m(pop[i]) for _, i in recs)
    assert r["n_recs"] == len(recs)
    assert r["n_users"] == len({c for c, _ in recs})
    assert r["n_distinct_items"] == len({i for _, i in recs})
    assert r["n_catalog"] == len(pop)
    assert abs(r["coverage"]
               - round(r["n_distinct_items"] / len(pop), 6)) <= 1e-9
    assert abs(r["mean_novelty_bits"]
               - round(nov_sum / len(recs) / 1e6, 6)) <= 1e-9
    expo = Counter(i for _, i in recs)
    xs = sorted(expo.values())
    # rank ties broken by partkey in the query; values-only replay is
    # rank-stable because equal e contribute symmetrically to the sum
    n = len(xs)
    se = sum(xs)
    sre = sum(rk * x for rk, x in enumerate(xs, 1))
    assert abs(r["exposure_gini"]
               - round((2 * sre - (n + 1) * se) / (n * se), 6)) <= 1e-9
    assert 0.0 <= r["coverage"] <= 1.0
    assert 0.0 <= r["exposure_gini"] <= 1.0
    assert r["mean_novelty_bits"] > 0.0


def test_gale_shapley_replay_and_invariants(spark, sf_dir):
    """X201: the matching matches a Python deferred-acceptance replay
    over the same preference lists; it is a valid matching; every
    matched reviewer holds the best (lowest reviewer-rank) proposal
    she ever received."""
    from collections import defaultdict

    from etl_airflow_spotify_spark.catalog import load_table, spread
    from etl_airflow_spotify_spark.operators import similarity as S
    from etl_airflow_spotify_spark.queries.similarity import (
        GS_PREF_K, GS_ROUNDS)

    rows = _rows("gale_shapley_matching", spark, sf_dir)
    emb = {r["vec_id"]: [float(x) for x in r["embedding"]]
           for r in load_table(spark, sf_dir, "embeddings").collect()}
    cents = S._unit_centroids(16, 64, 7)

    def cell_scores(v):
        return [(sum(a * b for a, b in zip(v, c)), i)
                for i, c in enumerate(cents)]

    by_cell = defaultdict(list)
    for vid, v in emb.items():
        if vid % 2 == 0:
            sc = sorted(cell_scores(v), reverse=True)
            by_cell[sc[0][1]].append(vid)
    scored = {}
    for vid, v in emb.items():
        if vid % 2 == 1:
            probes = [i for _, i in
                      sorted(cell_scores(v), reverse=True)[:4]]
            nq = sum(x * x for x in v) ** 0.5
            for cell in probes:
                for r in by_cell[cell]:
                    w = emb[r]
                    nr = sum(x * x for x in w) ** 0.5
                    s = round(sum(a * b for a, b in zip(v, w))
                              / (nq * nr), 6)
                    scored[(vid, r)] = s
    pranks = defaultdict(list)
    rranks = defaultdict(list)
    for (p, r), s in scored.items():
        pranks[p].append((-s, r))
        rranks[r].append((-s, p))
    plist = {}
    for p, lst in pranks.items():
        lst.sort()
        plist[p] = [r for _, r in lst[:GS_PREF_K]]
    rrank = {}
    for r, lst in rranks.items():
        lst.sort()
        for i, (_, p) in enumerate(lst, 1):
            rrank[(r, p)] = i

    proposed = set()
    tv = {}
    received = defaultdict(list)
    for _ in range(GS_ROUNDS):
        matched_p = {p for p, _ in tv.values()}
        props = defaultdict(list)
        for p in plist:
            if p in matched_p:
                continue
            nxt = [r for r in plist[p] if (p, r) not in proposed]
            if nxt:
                r = nxt[0]
                proposed.add((p, r))
                received[r].append(p)
                props[r].append((rrank[(r, p)], p))
        for r, group in props.items():
            if r in tv:
                group.append((tv[r][1], tv[r][0]))
            rk, p = min(group)
            tv[r] = (p, rk)

    got = {r["reviewer"]: (r["proposer"], r["reviewer_rank"])
           for r in rows}
    assert got == tv
    matched_p = [p for p, _ in got.values()]
    assert len(matched_p) == len(set(matched_p))
    for r, (p, rk) in got.items():
        assert rk == rrank[(r, p)]
        assert all(rrank[(r, q)] >= rk for q in received[r])


def test_exponential_mechanism_replay_and_laws(spark, sf_dir):
    """X202: weights, probabilities and the draw histogram match a
    Python replay; probs sum to 1; selection probability is monotone
    in utility; draws total EM_DRAWS."""
    import duckdb
    import hashlib

    from etl_airflow_spotify_spark.queries.ml import EM_DRAWS

    rows = {r["brand"]: r
            for r in _rows("dp_exponential_selection", spark, sf_dir)}
    br = duckdb.sql(
        f"SELECT p.p_brand, COUNT(*), "
        f"SUM(CASE WHEN l.l_returnflag = 'R' THEN 1 ELSE 0 END) "
        f"FROM '{sf_dir}/lineitem.parquet' l "
        f"JOIN '{sf_dir}/part.parquet' p "
        f"ON p.p_partkey = l.l_partkey GROUP BY 1").fetchall()
    u = {b: round(10.0 * (n - r) / n) for b, n, r in br}
    brands = sorted(u)
    w = {b: 1 << u[b] for b in brands}
    wt = sum(w.values())
    lo = {}
    acc = 0
    for b in brands:
        lo[b] = acc
        acc += w[b]
    hist = {b: 0 for b in brands}
    for t in range(1, EM_DRAWS + 1):
        x = int(hashlib.md5(f"em:{t}".encode()).hexdigest()[:15],
                16) % wt
        for b in brands:
            if lo[b] <= x < lo[b] + w[b]:
                hist[b] += 1
                break
    assert sum(hist.values()) == EM_DRAWS
    psum = 0.0
    for b in brands:
        r = rows[b]
        assert r["utility"] == u[b] and r["weight"] == w[b]
        assert abs(r["exact_prob"] - round(w[b] / wt, 6)) <= 1e-9
        assert r["n_selected"] == hist[b]
        psum += r["exact_prob"]
    assert abs(psum - 1.0) <= 1e-4
    for a in brands:
        for b in brands:
            if u[a] > u[b]:
                assert rows[a]["exact_prob"] >= rows[b]["exact_prob"]


def test_burrows_delta_replay_and_metric_laws(spark, sf_dir):
    """X203: deltas match a full Python replay; Delta is symmetric by
    construction, nonnegative, and zero only for identical rate
    profiles."""
    import duckdb
    import math
    import re
    from collections import Counter

    from etl_airflow_spotify_spark.queries.text import DELTA_TOP_W

    rows = {(r["src_a"], r["src_b"]): r
            for r in _rows("stylometry_burrows_delta", spark, sf_dir)}
    docs = duckdb.sql(
        f"SELECT source, text FROM '{sf_dir}/documents.parquet'"
    ).fetchall()
    cnt = Counter()
    tot = Counter()
    allw = Counter()
    for src, text in docs:
        for w in re.split(r"\s+", text.strip().lower()):
            cnt[(src, w)] += 1
            tot[src] += 1
            allw[w] += 1
    topw = sorted(allw, key=lambda w: (-allw[w], w))[:DELTA_TOP_W]
    sources = sorted(tot)

    def rhu(x):  # engines ROUND half-up; Python round() is banker's
        return math.floor(x + 0.5)

    f = {(s, w): rhu(1e6 * cnt.get((s, w), 0) / tot[s])
         for s in sources for w in topw}
    sd = {}
    n = len(sources)
    for w in topw:
        xs = [f[(s, w)] for s in sources]
        sd[w] = math.sqrt((n * sum(x * x for x in xs)
                           - sum(xs) ** 2) / (n * (n - 1)))
    for i, a in enumerate(sources):
        for b in sources[i + 1:]:
            terms = [rhu(abs(f[(a, w)] - f[(b, w)]) / sd[w] * 1e6)
                     for w in topw if sd[w] != 0]
            delta = rhu(sum(terms) / len(terms)) / 1e6
            r = rows[(a, b)]
            assert r["n_words"] == len(terms)
            assert abs(r["delta"] - delta) <= 1e-9
            assert r["delta"] >= 0.0


def test_kneser_ney_matches_python_replay(spark, sf_dir):
    """X204: per-doc NLL matches an exact-rational Python replay of
    the KN algebra (d = 3/4 via the 4*Nbt common denominator);
    probabilities are a proper distribution: for a trained context a,
    sum_b p(b|a) over the trained vocab equals 1 exactly (checked in
    Fractions for a few contexts)."""
    import duckdb
    import hashlib
    import math
    import re
    from collections import Counter
    from fractions import Fraction

    from etl_airflow_spotify_spark.queries.text import KN_TRAIN_PCT

    rows = {r["doc_id"]: r
            for r in _rows("kneser_ney_perplexity", spark, sf_dir)}
    docs = duckdb.sql(
        f"SELECT doc_id, text FROM '{sf_dir}/documents.parquet'"
    ).fetchall()

    def md5_60(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    train_bg = Counter()
    test_bg = {}
    for doc_id, text in docs:
        ts = re.split(r"\s+", text.strip().lower())
        bgs = list(zip(ts, ts[1:]))
        if md5_60(f"kn:{doc_id}") % 100 < KN_TRAIN_PCT:
            train_bg.update(bgs)
        elif bgs:
            test_bg[doc_id] = Counter(bgs)
    ca = Counter()
    cont_a = Counter()
    hist_b = Counter()
    for (a, b), c in train_bg.items():
        ca[a] += c
        cont_a[a] += 1
        hist_b[b] += 1
    nbt = len(train_bg)

    def l2m(x):
        return round(math.log2(x) * 1e6)

    assert set(rows) == set(test_bg)
    for doc_id, bgs in test_bg.items():
        nb = oov = nll = 0
        for (a, b), n in bgs.items():
            if a in ca and b in hist_b:
                c = train_bg.get((a, b), 0)
                num4 = max(4 * c - 3, 0) * nbt + 3 * cont_a[a] * hist_b[b]
                den4 = 4 * ca[a] * nbt
                nb += n
                nll += n * (l2m(den4) - l2m(num4))
            else:
                oov += n
        r = rows[doc_id]
        assert r["n_bigrams"] == nb and r["n_oov"] == oov
        if nb:
            assert abs(r["avg_nll_bits"]
                       - round(nll / (nb * 1e6), 6)) <= 1e-9
            assert r["avg_nll_bits"] > 0.0

    # distribution law: sum_b p(b|a) == 1 exactly over the trained
    # vocab of completions, for the 3 highest-count contexts
    tops = [a for a, _ in ca.most_common(3)]
    vocab_b = set(hist_b)
    for a in tops:
        tot = Fraction(0)
        for b in vocab_b:
            c = train_bg.get((a, b), 0)
            num4 = max(4 * c - 3, 0) * nbt + 3 * cont_a[a] * hist_b[b]
            tot += Fraction(num4, 4 * ca[a] * nbt)
        assert tot == 1
