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
