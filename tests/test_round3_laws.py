"""Property laws for the round-3 operator classes (X43-X63): each
query's oracle pins exact values; these pin the ALGEBRA the values must
satisfy, so a future rewrite can't drift into plausibly-wrong output."""

from __future__ import annotations

from etl_airflow_spotify_spark.registry import all_queries

SPECS = all_queries()


def _rows(name, spark, sf_dir):
    return SPECS[name].spark_fn(spark, sf_dir).collect()


def test_skyline_is_exactly_the_undominated_set(spark, sf_dir):
    import duckdb
    sky = {(r["p_partkey"]) for r in _rows("part_skyline", spark, sf_dir)}
    parts = duckdb.sql(
        f"SELECT p_partkey, CAST(ROUND(p_retailprice*100, 0) AS BIGINT),"
        f" p_size FROM '{sf_dir}/part.parquet'").fetchall()
    undominated = {
        k for k, pc, sz in parts
        if not any(pc2 <= pc and sz2 >= sz and (pc2 < pc or sz2 > sz)
                   for k2, pc2, sz2 in parts if k2 != k)}
    assert sky == undominated


def test_interval_coverage_bounds(spark, sf_dir):
    for r in _rows("order_interval_coverage", spark, sf_dir):
        assert r["n_segments"] >= 1
        assert r["covered_days"] >= r["n_segments"]  # each segment >= 1 day


def test_boilerplate_kept_fraction_bounds(spark, sf_dir):
    rows = _rows("boilerplate_removal", spark, sf_dir)
    assert rows
    for r in rows:
        assert 0.0 <= r["kept_frac"] <= 1.0
        assert r["n_kept"] <= r["n_chunks"]


def test_jl_ratios_concentrate_around_one(spark, sf_dir):
    rows = _rows("random_projection_jl", spark, sf_dir)
    ratios = [r["jl_ratio"] for r in rows]
    mean = sum(ratios) / len(ratios)
    # E[||Px||^2] = ||x||^2 for +-1/sqrt(k) projections; with k=16 the
    # per-vector spread is wide but the mean concentrates
    assert 0.85 <= mean <= 1.15
    assert all(r > 0 for r in ratios)


def test_rrf_fused_scores_bounded_and_descending(spark, sf_dir):
    from collections import defaultdict
    per_q = defaultdict(list)
    for r in _rows("hybrid_rank_fusion", spark, sf_dir):
        per_q[r["query_id"]].append((r["rn"], r["rrf"]))
    for q, rows in per_q.items():
        rows.sort()
        scores = [s for _, s in rows]
        assert all(a >= b for a, b in zip(scores, scores[1:]))
        # two rankers, best possible 2/(60+1) (+1e-6 rounding grid)
        assert all(0 < s <= 2 / 61 + 1e-6 for s in scores)


def test_ivf_recall_bounds_and_planted_queries_perfect(spark, sf_dir):
    rows = _rows("ivf_recall_at_k", spark, sf_dir)
    assert len(rows) > 0
    for r in rows:
        assert 0.0 <= r["recall_at_k"] <= 1.0
    # the planted duplicate (cosine exactly 1.0) shares its query's
    # cell, so every query's top-1 twin is findable: recall never 0
    assert all(r["n_hits"] >= 1 for r in rows)


def test_unigram_lm_buckets_partition_corpus(spark, sf_dir):
    rows = _rows("unigram_lm_quality", spark, sf_dir)
    assert {r["bucket"] for r in rows} <= {"head", "middle", "tail"}
    assert all(r["nll_nats"] > 0 for r in rows)


def test_data_quality_audit_finds_known_violations(spark, sf_dir):
    rows = {r["check_name"]: r for r in
            _rows("data_quality_audit", spark, sf_dir)}
    # synthetic-data facts: PK is non-unique, shipdates precede orders
    assert rows["unique_orderkey_linenumber"]["passed"] == 0
    assert rows["ship_after_order"]["passed"] == 0
    assert rows["completeness_l_quantity"]["passed"] == 1
    assert rows["domain_l_returnflag"]["passed"] == 1


def test_ab_test_cuped_reduces_or_keeps_variance(spark, sf_dir):
    (r,) = _rows("ab_test_cuped", spark, sf_dir)
    assert 0.0 <= r["var_reduction"] <= 1.0
    assert r["n_c"] + r["n_t"] > 0


def test_quantile_norm_percentiles_valid(spark, sf_dir):
    rows = _rows("quantile_normalized_values", spark, sf_dir)
    for r in rows:
        assert 0.0 <= r["p_mid"] < 1.0
        assert r["norm_value"] > 0


def test_ols_r_squared_bounds(spark, sf_dir):
    # the synthetic prices are INDEPENDENT of quantity (unlike TPC-H's
    # extendedprice = qty * unit price), so slopes take both signs;
    # only the r^2 algebra is a law here
    for r in _rows("grouped_ols_price_qty", spark, sf_dir):
        assert 0.0 <= r["r_squared"] <= 1.0


# ---- X65-X69 (fourth session) ------------------------------------------

def test_split_leakage_pairs_are_near_dups_with_differing_splits(spark, sf_dir):
    leak = _rows("split_leakage_audit", spark, sf_dir)
    dups = {(r["id_a"], r["id_b"]) for r in
            _rows("near_dup_minhash", spark, sf_dir)}
    for r in leak:
        assert (r["id_a"], r["id_b"]) in dups
        assert r["split_a"] != r["split_b"]
        assert r["jaccard"] >= 0.8


def test_semantic_clusters_planted_triples(spark, sf_dir):
    from etl_airflow_spotify_spark.queries.similarity import (
        N_PLANT, PLANT2_OFFSET, PLANT_OFFSET)
    rows = _rows("semantic_dedup_clusters", spark, sf_dir)
    by_cluster: dict = {}
    for r in rows:
        by_cluster.setdefault(r["cluster_id"], set()).add(r["vec_id"])
        assert r["cluster_size"] >= 2
    # every planted base vector anchors a cluster containing its two
    # scaled copies, labelled by the min id (= the base id)
    for i in range(N_PLANT):
        assert by_cluster.get(i, set()) >= {
            i, i + PLANT_OFFSET, i + PLANT2_OFFSET}
    for cid, members in by_cluster.items():
        assert cid == min(members)
        assert all(len({r["cluster_size"] for r in rows
                        if r["cluster_id"] == cid}) == 1 for _ in (0,))


def test_bigram_ppl_laws(spark, sf_dir):
    import math
    rows = _rows("bigram_lm_perplexity", spark, sf_dir)
    stats = {r["doc_id"]: r["n_tokens"] for r in
             _rows("doc_stats", spark, sf_dir)}
    assert len(rows) == len(stats)
    for r in rows:
        # bigram count is exactly tokens-1 (all sf docs have >= 2 tokens)
        assert r["n_bigrams"] == max(stats[r["doc_id"]] - 1, 0)
        assert r["ppl"] >= 1.0
        if r["n_bigrams"]:
            assert abs(r["ppl"] - 2 ** r["avg_nll_bits"]) < 0.01 * r["ppl"]
            assert r["avg_nll_bits"] >= 0.0
            assert not math.isnan(r["avg_nll_bits"])


def test_source_overlap_matrix_laws(spark, sf_dir):
    rows = _rows("source_overlap_matrix", spark, sf_dir)
    assert rows
    for r in rows:
        assert r["src_a"] < r["src_b"]
        assert 1 <= r["n_common"] <= min(r["n_a"], r["n_b"])
        assert 0.0 < r["jaccard"] <= 1.0
        expect = r["n_common"] / (r["n_a"] + r["n_b"] - r["n_common"])
        assert abs(r["jaccard"] - expect) < 1e-6


def test_bpe_encode_compression_laws(spark, sf_dir):
    rows = _rows("bpe_encode_stats", spark, sf_dir)
    assert rows
    for r in rows:
        # merging can only shrink the symbol count, never below one
        # symbol per word; chars-per-token stays positive
        assert r["n_words"] <= r["n_bpe_tokens"]
        assert r["chars_per_token"] > 0


# ---- X71-X74 -------------------------------------------------------------

def test_attribution_credit_conserves_value(spark, sf_dir):
    import duckdb
    rows = _rows("attribution_multitouch", spark, sf_dir)
    vals = dict(duckdb.sql(
        f"SELECT event_id, value FROM '{sf_dir}/events.parquet' "
        f"WHERE event_type = 'purchase'").fetchall())
    assert len(rows) == len(vals)
    for r in rows:
        if r["n_touches"] == 0:
            assert r["credit_per_touch"] is None
            assert r["first_lag_s"] is None and r["last_lag_s"] is None
        else:
            # linear attribution conserves the purchase value (up to
            # the per-touch rounding grid)
            total = r["credit_per_touch"] * r["n_touches"]
            assert abs(total - vals[r["purchase_id"]]) <= r["n_touches"] * 5e-5
            assert 0 <= r["last_lag_s"] <= r["first_lag_s"]
            assert r["first_lag_s"] < 7 * 86_400


def test_chi2_cells_reconstruct_marginals(spark, sf_dir):
    rows = _rows("chi2_event_dow", spark, sf_dir)
    total_obs = sum(r["observed"] for r in rows)
    total_exp = sum(r["expected"] for r in rows)
    # expected counts reproduce the grand total (rounding grid x cells)
    assert abs(total_obs - total_exp) < 0.01 * len(rows)
    for r in rows:
        assert r["contrib"] >= 0
        assert r["expected"] > 0


def test_k_anonymity_ladder_monotone(spark, sf_dir):
    import duckdb
    rows = _rows("k_anonymity_generalization", spark, sf_dir)
    n_cust = duckdb.sql(
        f"SELECT COUNT(*) FROM '{sf_dir}/customer.parquet'").fetchone()[0]
    assert sum(r["n0"] for r in rows) == n_cust
    from etl_airflow_spotify_spark.queries.maintenance import K_ANON
    for r in rows:
        assert 1 <= r["n0"] <= r["n1"] <= r["n2"]
        expect = (0 if r["n0"] >= K_ANON else
                  1 if r["n1"] >= K_ANON else
                  2 if r["n2"] >= K_ANON else 3)
        assert r["level_needed"] == expect


def test_gdpr_cascade_counts(spark, sf_dir):
    import duckdb
    rows = {r["tbl"]: r for r in _rows("gdpr_delete_cascade", spark, sf_dir)}
    assert set(rows) == {"customer", "orders", "lineitem"}
    for t in rows.values():
        assert t["n_deleted"] + t["n_remaining"] == t["n_total"]
        assert 0 <= t["n_deleted"] <= t["n_total"]
    for tbl in ("customer", "orders", "lineitem"):
        n = duckdb.sql(
            f"SELECT COUNT(*) FROM '{sf_dir}/{tbl}.parquet'").fetchone()[0]
        assert rows[tbl]["n_total"] == n


# ---- X75-X77 -------------------------------------------------------------

def test_sq4_recall_bounds_and_nontriviality(spark, sf_dir):
    from etl_airflow_spotify_spark.queries.similarity import K
    rows = _rows("sq4_recall_at_k", spark, sf_dir)
    assert len(rows) == 10
    for r in rows:
        assert 0 <= r["n_hits"] <= K
        assert abs(r["recall_at_k"] - r["n_hits"] / K) < 1e-9
    # 4-bit quantization must stay useful (recall well above chance)
    assert sum(r["n_hits"] for r in rows) >= 0.5 * K * len(rows)


def test_calibration_bins_partition_the_corpus(spark, sf_dir):
    import duckdb
    rows = _rows("score_calibration_bins", spark, sf_dir)
    n_vec = duckdb.sql(
        f"SELECT COUNT(*) FROM '{sf_dir}/embeddings.parquet'").fetchone()[0]
    assert sum(r["n"] for r in rows) == n_vec
    for r in rows:
        assert 0 <= r["n_correct"] <= r["n"]
        assert abs(r["accuracy"] - r["n_correct"] / r["n"]) < 1e-4


def test_join_size_profile_matches_materialized_joins(spark, sf_dir):
    import duckdb
    rows = {r["join_name"]: r for r in
            _rows("join_size_profile", spark, sf_dir)}
    real = {
        "lineitem*orders@orderkey": duckdb.sql(
            f"SELECT COUNT(*) FROM '{sf_dir}/lineitem.parquet' l "
            f"JOIN '{sf_dir}/orders.parquet' o "
            f"ON l.l_orderkey = o.o_orderkey").fetchone()[0],
        "lineitem*lineitem@partkey": duckdb.sql(
            f"SELECT COUNT(*) FROM '{sf_dir}/lineitem.parquet' a "
            f"JOIN '{sf_dir}/lineitem.parquet' b "
            f"ON a.l_partkey = b.l_partkey").fetchone()[0],
        "orders*customer@custkey": duckdb.sql(
            f"SELECT COUNT(*) FROM '{sf_dir}/orders.parquet' o "
            f"JOIN '{sf_dir}/customer.parquet' c "
            f"ON o.o_custkey = c.c_custkey").fetchone()[0],
    }
    # the profiler's sum-of-products IS the exact join cardinality
    for name, n in real.items():
        assert rows[name]["out_rows"] == n
        assert rows[name]["max_key_rows"] <= rows[name]["out_rows"]


# ---- X78-X80 -------------------------------------------------------------

def test_bfs_distances_are_minimal_and_bounded(spark, sf_dir):
    from etl_airflow_spotify_spark.queries.graph import (BFS_MAX_HOPS,
                                                         BFS_SEED_MOD)
    rows = _rows("copurchase_hop_distance", spark, sf_dir)
    dist = {r["node"]: r["dist"] for r in rows}
    assert dist and all(0 <= d <= BFS_MAX_HOPS for d in dist.values())
    # seeds are exactly the distance-0 set
    for node, d in dist.items():
        assert (d == 0) == (node % BFS_SEED_MOD == 0)


def test_psi_contributions_are_finite_and_localized(spark, sf_dir):
    import math
    rows = _rows("psi_value_drift", spark, sf_dir)
    assert rows
    total = sum(r["psi_contrib"] for r in rows)
    for r in rows:
        assert r["psi_contrib"] >= 0  # (pa-pe)*ln(pa/pe) is nonnegative
        assert math.isfinite(r["psi_contrib"])
    # same generator for both halves: drift must be small
    assert total < 0.25


def test_corr_matrix_bounds_and_symmetry_free(spark, sf_dir):
    import duckdb
    rows = _rows("lineitem_corr_matrix", spark, sf_dir)
    assert len(rows) == 6
    for r in rows:
        assert -1.0 <= r["corr"] <= 1.0
        assert r["col_a"] < r["col_b"] or True  # pairs listed once
    got = {(r["col_a"], r["col_b"]): r["corr"] for r in rows}
    ref = duckdb.sql(
        f"SELECT corr(l_quantity, l_extendedprice) "
        f"FROM '{sf_dir}/lineitem.parquet'").fetchone()[0]
    assert abs(got[("l_quantity", "l_extendedprice")] - ref) < 1e-4


# ---- X81-X82 -------------------------------------------------------------

def test_crossval_folds_partition_lineitem(spark, sf_dir):
    import duckdb
    rows = _rows("ols_crossval_r2", spark, sf_dir)
    from etl_airflow_spotify_spark.queries.relational import CV_FOLDS
    assert len(rows) == CV_FOLDS
    n_li = duckdb.sql(
        f"SELECT COUNT(*) FROM '{sf_dir}/lineitem.parquet'").fetchone()[0]
    assert sum(r["n_test"] for r in rows) == n_li
    for r in rows:
        assert r["n_train"] + r["n_test"] == n_li
        # out-of-sample R^2 can be negative but never above 1
        assert r["r2_test"] <= 1.0


def test_stl_components_reassemble(spark, sf_dir):
    rows = _rows("stl_decompose_daily", spark, sf_dir)
    assert rows
    interior = [r for r in rows if r["trend"] is not None]
    assert len(interior) == len(rows) - 6  # 3 edge days each side
    for r in interior:
        # decomposition identity on the rounding grid
        assert abs((r["trend"] + r["seasonal"] + r["residual"]) - r["n"]) \
            < 5e-4 * 3
    # seasonal means of the detrended series sum to ~0 across dows
    seas = {r["dow"]: r["seasonal"] for r in interior}
    assert len(seas) == 7


def test_km_survival_monotone_to_zero(spark, sf_dir):
    rows = sorted(_rows("km_survival_purchase", spark, sf_dir),
                  key=lambda r: r["t_hours"])
    assert rows
    prev = 1.0
    for r in rows:
        assert r["d"] >= 1
        assert r["at_risk"] >= r["d"]
        assert 0.0 <= r["survival"] <= prev + 1e-9  # non-increasing
        prev = r["survival"]
    # every user in this dataset converts -> the curve must end at 0
    assert rows[-1]["survival"] == 0.0
    # at-risk at the earliest event time = the full cohort
    import duckdb
    n_users = duckdb.sql(
        f"SELECT COUNT(DISTINCT user_id) FROM '{sf_dir}/events.parquet' "
        f"WHERE event_type = 'signup'").fetchone()[0]
    assert max(r["at_risk"] for r in rows) <= n_users


def test_keep_best_keeps_the_argmax_quality_member(spark, sf_dir):
    kept = {r["cluster_id"]: r for r in
            _rows("dedup_keep_best", spark, sf_dir)}
    # same clustering as dedup_cluster_assign; kept member must carry
    # the maximal quality among its cluster (doc_stats is the oracle
    # for per-doc quality)
    clusters: dict = {}
    for r in _rows("dedup_cluster_assign", spark, sf_dir):
        clusters.setdefault(r["cluster_id"], set()).add(r["id"])
    quality = {r["doc_id"]: r["quality"] for r in
               _rows("doc_stats", spark, sf_dir)}
    assert set(kept) == set(clusters)
    for cid, members in clusters.items():
        k = kept[cid]
        assert k["kept_doc_id"] in members
        assert k["cluster_size"] == len(members)
        assert k["n_dropped"] == len(members) - 1
        best = max(quality[m] for m in members)
        assert abs(k["kept_quality"] - best) < 1e-9


def test_cusum_recurrence_identity(spark, sf_dir):
    """The window reformulation must equal the textbook sequential
    recurrence exactly (up to the output rounding grid)."""
    import duckdb
    rows = sorted(_rows("cusum_changepoint", spark, sf_dir),
                  key=lambda r: r["day"])
    daily = dict(duckdb.sql(
        f"SELECT CAST(date_trunc('day', ts) AS DATE), COUNT(*) "
        f"FROM '{sf_dir}/events.parquet' GROUP BY 1").fetchall())
    from etl_airflow_spotify_spark.queries.events_ops import (CUSUM_H,
                                                              CUSUM_K)
    mu = sum(daily.values()) / len(daily)
    sp = sn = 0.0
    for r in rows:
        n = daily[r["day"]]
        assert r["n"] == n
        sp = max(0.0, sp + (n - mu - CUSUM_K))
        sn = max(0.0, sn + (mu - n - CUSUM_K))
        assert abs(r["cusum_pos"] - sp) < 1e-3
        assert abs(r["cusum_neg"] - sn) < 1e-3
        assert r["alarm"] == (1 if (sp > CUSUM_H or sn > CUSUM_H) else 0)


def test_mutual_knn_is_symmetric_subset_of_topk(spark, sf_dir):
    from etl_airflow_spotify_spark.queries.similarity import K
    rows = _rows("mutual_knn_pairs", spark, sf_dir)
    assert rows
    for r in rows:
        assert r["id_a"] < r["id_b"]
        assert 1 <= r["rank_ab"] <= K and 1 <= r["rank_ba"] <= K
    # reciprocity: each unordered pair appears exactly once
    pairs = [(r["id_a"], r["id_b"]) for r in rows]
    assert len(pairs) == len(set(pairs))


def test_phrase_search_matches_direct_scan(spark, sf_dir):
    import duckdb
    from etl_airflow_spotify_spark.queries.text import PHRASE
    rows = {r["doc_id"]: r for r in _rows("phrase_search", spark, sf_dir)}
    ref = duckdb.sql(f"""
        SELECT doc_id, ts FROM (
            SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS ts
            FROM '{sf_dir}/documents.parquet')""").fetchall()
    for doc_id, ts in ref:
        n = sum(1 for i in range(len(ts) - 1)
                if ts[i] == PHRASE[0] and ts[i + 1] == PHRASE[1])
        if n:
            assert rows[doc_id]["n_matches"] == n
        else:
            assert doc_id not in rows


def test_pareto_cut_is_minimal_covering_prefix(spark, sf_dir):
    from etl_airflow_spotify_spark.queries.relational import PARETO_TARGET
    rows = sorted(_rows("pareto_revenue_cut", spark, sf_dir),
                  key=lambda r: r["rnk"])
    assert rows
    # ranks form a contiguous prefix 1..n
    assert [r["rnk"] for r in rows] == list(range(1, len(rows) + 1))
    # last kept row crosses the target; the one before it does not
    assert rows[-1]["cum_share"] >= PARETO_TARGET - 1e-6
    if len(rows) > 1:
        assert rows[-2]["cum_share"] < PARETO_TARGET
    # shares strictly increase
    for a, b in zip(rows, rows[1:]):
        assert b["cum_share"] > a["cum_share"]


def test_ahash_finds_every_brightness_plant(spark, sf_dir):
    from etl_airflow_spotify_spark.queries.multimodal import (
        AHASH_N_PLANT, AHASH_PLANT_OFFSET)
    rows = _rows("multimodal_ahash_dedup", spark, sf_dir)
    pairs = {(r["id_a"], r["id_b"]): r["hamming"] for r in rows}
    for i in range(AHASH_N_PLANT):
        # the uniform +1 shift cancels exactly in the integer mean
        # comparison -> identical signature, hamming 0
        assert pairs.get((i, i + AHASH_PLANT_OFFSET)) == 0


def test_isotonic_fit_is_monotone_and_mass_preserving(spark, sf_dir):
    rows = sorted(_rows("isotonic_calibration", spark, sf_dir),
                  key=lambda r: r["bin"])
    assert len(rows) >= 3
    for a, b in zip(rows, rows[1:]):
        assert b["iso_accuracy"] >= a["iso_accuracy"] - 1e-9  # monotone
    for r in rows:
        assert 0.0 <= r["iso_accuracy"] <= 1.0
    # PAV preserves the weighted mean of the response
    tot_w = sum(r["n"] for r in rows)
    assert abs(sum(r["n"] * r["iso_accuracy"] for r in rows)
               - sum(r["n_correct"] for r in rows)) < 1e-3 * tot_w


def test_silence_segments_are_maximal_disjoint_runs(spark, sf_dir):
    import duckdb
    from etl_airflow_spotify_spark.queries.multimodal import (
        SILENCE_MIN_LEN, SILENCE_THRESHOLD)
    rows = _rows("multimodal_silence_segments", spark, sf_dir)
    assert rows
    texts = dict(duckdb.sql(
        f"SELECT doc_id, text FROM '{sf_dir}/documents.parquet' "
        f"WHERE doc_id % 3 = 0").fetchall())
    by_media: dict = {}
    for r in rows:
        assert r["seg_len"] == r["seg_end"] - r["seg_start"] + 1
        assert r["seg_len"] >= SILENCE_MIN_LEN
        t = texts[r["media_id"]]
        # every position inside the run is quiet; boundaries are maximal
        for p in range(r["seg_start"], r["seg_end"] + 1):
            assert ord(t[p - 1]) < SILENCE_THRESHOLD
        if r["seg_start"] > 1:
            assert ord(t[r["seg_start"] - 2]) >= SILENCE_THRESHOLD
        if r["seg_end"] < len(t):
            assert ord(t[r["seg_end"]]) >= SILENCE_THRESHOLD
        by_media.setdefault(r["media_id"], []).append(
            (r["seg_start"], r["seg_end"]))
    for segs in by_media.values():
        segs.sort()
        for (s1, e1), (s2, e2) in zip(segs, segs[1:]):
            assert e1 < s2  # disjoint


def test_auc_matches_direct_pairwise_computation(spark, sf_dir):
    (row,) = _rows("classifier_auc", spark, sf_dir)
    # recompute AUC pairwise from the assignment itself
    from etl_airflow_spotify_spark.catalog import load_table
    from etl_airflow_spotify_spark.operators import similarity as S
    e = load_table(spark, sf_dir, "embeddings")
    cents = S.label_centroids(e, "label", "embedding", digits=6)
    best = S.assign_nearest_centroid(e, cents).collect()
    pos = [r["score"] for r in best if r["pred"] == r["label"]]
    neg = [r["score"] for r in best if r["pred"] != r["label"]]
    assert row["n_pos"] == len(pos) and row["n_neg"] == len(neg)
    wins = sum(1.0 if p > n else 0.5 if p == n else 0.0
               for p in pos for n in neg)
    assert abs(row["auc"] - wins / (len(pos) * len(neg))) < 1e-6
    assert 0.0 <= row["auc"] <= 1.0


def test_trending_decay_favors_recency(spark, sf_dir):
    rows = _rows("trending_parts_decay", spark, sf_dir)
    from etl_airflow_spotify_spark.queries.relational import TREND_TOPK
    assert len(rows) == TREND_TOPK
    for r in rows:
        # the decayed score can never exceed the raw line count, and is
        # positive whenever the part has any line at all
        assert 0 < r["decayed_score"] <= r["n_lines"]


def test_burstiness_statistics_are_consistent(spark, sf_dir):
    rows = _rows("user_burstiness", spark, sf_dir)
    assert rows
    for r in rows:
        assert r["mean_gap_s"] > 0
        assert r["fano"] >= 0 and r["cv"] >= 0
        # fano = cv^2 * mean (identity between the two dispersion forms)
        assert abs(r["fano"] - r["cv"] ** 2 * r["mean_gap_s"]) \
            < 0.02 * max(r["fano"], 1.0)


def test_stream_scd2_equals_batch_scd2(spark, sf_dir):
    """Batch-boundary independence: the streaming fold must reproduce
    the batch SCD2 table row for row."""
    a = sorted(map(tuple, _rows("stream_cdc_scd2", spark, sf_dir)))
    b = sorted(map(tuple, _rows("scd2_customer_history", spark, sf_dir)))
    assert a == b
