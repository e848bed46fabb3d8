"""Sketch queries have no SQL oracle (DataSketches-specific estimates),
so exactness is pinned here instead: estimates vs exact answers, and the
merge laws that make sketches safe to roll up in any order at scale."""

from __future__ import annotations

import pyspark.sql.functions as F

from etl_airflow_spotify_spark.catalog import load_table
from etl_airflow_spotify_spark.registry import all_queries

SPECS = all_queries()


def _rows(name, spark, sf_dir):
    return SPECS[name].spark_fn(spark, sf_dir).collect()


def test_hll_rollup_matches_exact_within_error(spark, sf_dir):
    got = {r["o_orderpriority"]: r["est_customers"]
           for r in _rows("hll_distinct_rollup", spark, sf_dir)}
    exact = {r["o_orderpriority"]: r["exact"]
             for r in load_table(spark, sf_dir, "orders")
             .groupBy("o_orderpriority")
             .agg(F.countDistinct("o_custkey").alias("exact")).collect()}
    assert set(got) == set(exact)
    for k, est in got.items():
        # lg_k=14 -> ~0.8% standard error; 3 sigma plus integer slack
        assert abs(est - exact[k]) <= max(3, 0.03 * exact[k]), (k, est, exact[k])


def test_hll_monthly_rollup_equals_one_shot(spark, sf_dir):
    # union of monthly partials must equal the single-pass sketch
    # EXACTLY: register-wise max is associative/commutative, so partial
    # granularity and merge order are invisible in the estimate
    o = load_table(spark, sf_dir, "orders")
    rolled = {r["o_orderpriority"]: r["est_customers"]
              for r in _rows("hll_distinct_rollup", spark, sf_dir)}
    oneshot = {r["o_orderpriority"]: r["est"]
               for r in o.groupBy("o_orderpriority")
               .agg(F.hll_sketch_estimate(
                   F.hll_sketch_agg("o_custkey", F.lit(14))).alias("est"))
               .collect()}
    assert rolled == oneshot


def _events_by_sliding_window(spark, sf_dir):
    """Each event expanded into its 2 covering (1 h / 30 min slide)
    windows — the exact-twin input for the HLL sliding rollup."""
    ev = load_table(spark, sf_dir, "events")
    return (ev.select("user_id", F.window("ts", "30 minutes").alias("w"))
            .select("user_id",
                    F.explode(F.array(
                        F.col("w.start"),
                        F.col("w.start") - F.expr("INTERVAL 30 MINUTES")))
                    .alias("ws")))


def _rolled_estimates(spark, sf_dir):
    """The query's sketch path, estimate exposed: 30-min HLL partials
    unioned into each covering sliding window (the r4 query reports the
    estimate only as an accuracy boolean, so tests rebuild the raw
    estimate from the same partials to keep the laws pinned)."""
    ev = load_table(spark, sf_dir, "events")
    partials = (ev.groupBy(F.window("ts", "30 minutes").alias("w"))
                .agg(F.hll_sketch_agg("user_id", F.lit(14)).alias("sk")))
    exploded = partials.select(
        F.explode(F.array(
            F.col("w.start"),
            F.col("w.start") - F.expr("INTERVAL 30 MINUTES")))
        .alias("ws"), "sk")
    return {r["ws"]: r["est"] for r in
            exploded.groupBy("ws")
            .agg(F.hll_sketch_estimate(
                F.hll_union_agg("sk", F.lit(False))).alias("est"))
            .collect()}


def test_hll_sliding_matches_exact_within_error(spark, sf_dir):
    """The query output is exact-twin attested (n_users exact,
    est_within_tol derived from the HLL estimate); the raw estimate's
    accuracy law is pinned on the rebuilt rollup."""
    got = {r["window_start"]: r for r in
           _rows("hll_sliding_distinct", spark, sf_dir)}
    exact = {r["ws"]: r["exact"] for r in
             _events_by_sliding_window(spark, sf_dir)
             .groupBy("ws").agg(F.countDistinct("user_id").alias("exact"))
             .collect()}
    assert set(got) == set(exact)
    for ws, row in got.items():
        assert row["n_users"] == exact[ws]
        assert row["est_within_tol"], ws
    est = _rolled_estimates(spark, sf_dir)
    for ws, e in est.items():
        assert abs(e - exact[ws]) <= max(3, 0.03 * exact[ws]), (ws, e)


def test_hll_sliding_union_equals_direct_window_sketch(spark, sf_dir):
    """Merge law: the union of 30-min partials must equal a DIRECT
    sketch over each sliding window's raw rows, bit-for-bit — partial
    granularity is invisible, which is what makes incremental rollups
    safe."""
    rolled = _rolled_estimates(spark, sf_dir)
    direct = {r["ws"]: r["est"] for r in
              _events_by_sliding_window(spark, sf_dir)
              .groupBy("ws")
              .agg(F.hll_sketch_estimate(
                  F.hll_sketch_agg("user_id", F.lit(14))).alias("est"))
              .collect()}
    assert rolled == direct


def test_theta_overlap_matches_exact_set_ops(spark, sf_dir):
    got = {r["o_orderpriority"]: r for r in
           _rows("theta_customer_overlap", spark, sf_dir)}
    o = load_table(spark, sf_dir, "orders")

    def keys(lo, hi):
        return (o.filter((F.col("o_orderdate") >= F.lit(lo).cast("timestamp"))
                         & (F.col("o_orderdate") < F.lit(hi).cast("timestamp")))
                 .select("o_orderpriority", "o_custkey").distinct().collect())

    h1, h2 = {}, {}
    for r in keys("1996-01-01", "1996-07-01"):
        h1.setdefault(r["o_orderpriority"], set()).add(r["o_custkey"])
    for r in keys("1996-07-01", "1997-01-01"):
        h2.setdefault(r["o_orderpriority"], set()).add(r["o_custkey"])
    for k, row in got.items():
        a, b = h1.get(k, set()), h2.get(k, set())
        for est, exact in ((row["either_est"], len(a | b)),
                           (row["both_est"], len(a & b)),
                           (row["churned_est"], len(a - b))):
            assert abs(est - exact) <= max(3, 0.05 * exact), (k, est, exact)


def test_kll_quantiles_close_to_exact(spark, sf_dir):
    got = {r["l_returnflag"]: r for r in
           _rows("kll_price_quantiles", spark, sf_dir)}
    li = load_table(spark, sf_dir, "lineitem")
    exact = {r["l_returnflag"]: r for r in
             li.groupBy("l_returnflag")
             .agg(F.expr("percentile(l_extendedprice, 0.5)").alias("p50"),
                  F.expr("percentile(l_extendedprice, 0.9)").alias("p90"),
                  F.count("*").alias("n")).collect()}
    for k, row in got.items():
        assert row["n_values"] == exact[k]["n"]  # KLL tracks n exactly
        # KLL rank error (default k=200) ~1.65% at 99% confidence; a
        # 2%-rank slip moves the value by at most a few percent on this
        # smooth price distribution
        assert abs(row["median_est"] - exact[k]["p50"]) <= 0.05 * exact[k]["p50"]
        assert abs(row["p90_est"] - exact[k]["p90"]) <= 0.05 * exact[k]["p90"]
