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
