"""Graph-analytics queries (SURVEY.md §2.B X42): PageRank over the
part co-purchase graph. Exact DuckDB oracles — the integer fixed-point
recurrence (operators/graph.py) is summation-order-independent, so the
hash check pins every rank value, not just the ordering."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..catalog import load_table
from ..operators import graph as G
from ..registry import register

PAGERANK_ITERS = 5
PAGERANK_TOPK = 20

_EDGE_CTE = """op AS (SELECT DISTINCT l_orderkey AS g, l_partkey AS i
               FROM lineitem),
    e AS (SELECT DISTINCT a.i AS src, b.i AS dst
          FROM op a JOIN op b ON a.g = b.g AND a.i <> b.i)"""


@register(
    "part_pagerank",
    G.pagerank_oracle_sql(_EDGE_CTE, PAGERANK_ITERS)
    + f"\nORDER BY pr DESC, node LIMIT {PAGERANK_TOPK}",
    doc=f"X42 PageRank ({PAGERANK_ITERS} fixed iterations, damping 0.85, "
        "BIGINT fixed-point in 1e-12 units) over the part co-purchase "
        "graph (parts sharing an order). Edges persist once partitioned "
        "on src; each iteration is the two-shuffle join+agg PageRank "
        "step; integer arithmetic makes the result bit-identical across "
        "engines and partial-sum orders. Top-20 by rank.",
    tags=("X42", "X3", "X7", "X12"),
)
def part_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    edges = G.cooccurrence_edges(li, "l_orderkey", "l_partkey")
    pr = G.pagerank_fixed(edges, iters=PAGERANK_ITERS)
    return (pr.select(F.col("node"), F.col("pr"), F.col("degree"))
            .orderBy(F.desc("pr"), F.asc("node"))
            .limit(PAGERANK_TOPK))


@register(
    "copurchase_degree_profile",
    """
    WITH op AS (SELECT DISTINCT l_orderkey AS g, l_partkey AS i
                FROM lineitem),
    e AS (SELECT DISTINCT a.i AS src, b.i AS dst
          FROM op a JOIN op b ON a.g = b.g AND a.i <> b.i),
    deg AS (SELECT src, CAST(COUNT(*) AS BIGINT) AS d FROM e GROUP BY src)
    SELECT CAST(FLOOR(log2(d)) AS BIGINT) AS degree_bucket,
           CAST(COUNT(*) AS BIGINT) AS n_nodes,
           CAST(MIN(d) AS BIGINT) AS min_degree,
           CAST(MAX(d) AS BIGINT) AS max_degree,
           CAST(SUM(d) AS BIGINT) AS total_edges
    FROM deg GROUP BY 1
    """,
    doc="X42 co-purchase graph degree distribution in log2 buckets — "
        "the power-law profile that decides whether PageRank/triangle "
        "workloads need hub-splitting at scale. Two keyed aggregates "
        "(edge build + degree, then bounded bucket rollup); "
        "floor(log2(int)) is exact for any BIGINT degree on both "
        "engines.",
    tags=("X42", "X7"),
)
def copurchase_degree_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    edges = G.cooccurrence_edges(li, "l_orderkey", "l_partkey")
    deg = edges.groupBy("src").agg(F.count("*").alias("d"))
    return (deg.groupBy(F.floor(F.log2("d")).cast("long")
                        .alias("degree_bucket"))
            .agg(F.count("*").cast("long").alias("n_nodes"),
                 F.min("d").cast("long").alias("min_degree"),
                 F.max("d").cast("long").alias("max_degree"),
                 F.sum("d").cast("long").alias("total_edges")))
