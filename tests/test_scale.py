"""Scale-lever proofs: salted joins match plain joins exactly, and
bucketed co-located joins plan with zero exchanges."""

from __future__ import annotations

import pyspark.sql.functions as F

from etl_airflow_spotify_spark.catalog import load_table
from etl_airflow_spotify_spark.operators.scale import salted_join, write_bucketed
from etl_airflow_spotify_spark.plans import num_exchanges, plan_string


def _sorted_rows(df):
    cols = sorted(df.columns)
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


def test_salted_join_equals_plain_join(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_quantity", "l_extendedprice")
    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_orderstatus")
    plain = li.join(o, "l_orderkey", "inner")
    salted = salted_join(li, o, "l_orderkey", n_salts=8)
    assert _sorted_rows(salted) == _sorted_rows(plain)


def test_salted_join_spreads_hot_key(spark):
    # one key carries 10k rows; the salted plan must key the shuffle by
    # (key, _salt) so the hot key spans n_salts partitions
    hot = spark.range(10_000).select(F.lit(1).alias("k"), F.col("id").alias("v"))
    dim = spark.createDataFrame([(1, "x")], ["k", "name"])
    out = salted_join(hot, dim, "k", n_salts=8)
    assert out.count() == 10_000
    assert "_salt" in plan_string(out)  # join key includes the salt
    assert "_salt" not in out.columns   # but the salt never leaks out


def test_bucketed_join_no_shuffle(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    write_bucketed(li, "li_b", "l_orderkey", n_buckets=8)
    write_bucketed(o, "o_b", "o_orderkey", n_buckets=8)
    j = (spark.table("li_b")
         .join(spark.table("o_b"),
               F.col("l_orderkey") == F.col("o_orderkey")))
    # co-located bucketed tables: the join plans with zero Exchange nodes
    assert num_exchanges(j) == 0
    assert j.count() > 0
    spark.sql("DROP TABLE IF EXISTS li_b")
    spark.sql("DROP TABLE IF EXISTS o_b")


def test_equidepth_approx_path_matches_exact_shape(spark, sf_dir):
    """The bounded-memory approx_percentile boundary path (the 100 TB
    default above EQUIDEPTH_EXACT_MAX_ROWS) must partition every row
    into the same number of buckets as the exact path; at sf0.001 the
    sketch is exact, so buckets coincide entirely."""
    from etl_airflow_spotify_spark.catalog import load_table
    from etl_airflow_spotify_spark.queries.relational import (
        equidepth_price_histogram)

    exact = {r["bucket"]: r for r in
             equidepth_price_histogram(spark, sf_dir, exact=True).collect()}
    approx = {r["bucket"]: r for r in
              equidepth_price_histogram(spark, sf_dir, exact=False).collect()}
    n = load_table(spark, sf_dir, "lineitem").count()
    assert sum(r["n_rows"] for r in approx.values()) == n
    assert set(approx) == set(exact)
