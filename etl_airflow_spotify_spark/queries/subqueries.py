"""SQL-subquery query shapes: EXISTS / NOT EXISTS / correlated scalar.

These go through ``spark.sql`` on purpose: they exercise Catalyst's
subquery rewrites (RewritePredicateSubquery -> left-semi/anti join,
correlated scalar -> aggregate + left outer join) — plan shapes the
DataFrame-API queries in ``relational.py`` never produce. The reference
has no subqueries (its only relational op is one pandas left merge,
/root/reference/scripts/transform.py:156-162); these are [EXT] coverage
in the TPC-H Q4/Q17/Q22 mold over the driver's simplified schemas.

Scale notes: all three decorrelate to shuffled joins on high-cardinality
keys (o_orderkey / l_partkey / c_custkey), so they parallelize cleanly;
the Q22-style global-average scalar subquery is a one-row broadcast.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..catalog import load_table
from ..registry import register


def _views(spark: SparkSession, sf_dir: str, *names: str) -> None:
    for n in names:
        load_table(spark, sf_dir, n).createOrReplaceTempView(n)


@register(
    "late_ship_priority",
    """
    SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate <  TIMESTAMP '1996-07-01'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey
                    AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
    GROUP BY o_orderpriority
    """,
    doc="TPC-H Q4 shape: EXISTS subquery (decorrelates to a left-semi "
        "join on l_orderkey) counting orders with a late-shipping line.",
    tags=("X2", "X3", "X7"),
)
def late_ship_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    _views(spark, sf_dir, "orders", "lineitem")
    return spark.sql("""
        SELECT o_orderpriority, COUNT(*) AS order_count
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate <  TIMESTAMP '1996-07-01'
          AND EXISTS (SELECT 1 FROM lineitem
                      WHERE l_orderkey = o_orderkey
                        AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
        GROUP BY o_orderpriority
    """)


@register(
    "small_qty_revenue",
    """
    SELECT CAST(ROUND(SUM(l_extendedprice) / 7.0, 2) AS DOUBLE) AS avg_yearly
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE p_brand = 'Brand#1'
      AND l_quantity < (SELECT 0.2 * AVG(l_quantity) FROM lineitem l2
                        WHERE l2.l_partkey = p_partkey)
    """,
    doc="TPC-H Q17 shape: correlated scalar subquery (per-part average "
        "quantity) decorrelated by Catalyst into an aggregate + join.",
    tags=("X3", "X7"),
)
def small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    _views(spark, sf_dir, "lineitem", "part")
    return spark.sql("""
        SELECT CAST(ROUND(SUM(l_extendedprice) / 7.0, 2) AS DOUBLE) AS avg_yearly
        FROM lineitem JOIN part ON p_partkey = l_partkey
        WHERE p_brand = 'Brand#1'
          AND l_quantity < (SELECT 0.2 * AVG(l_quantity) FROM lineitem l2
                            WHERE l2.l_partkey = p_partkey)
    """)


@register(
    "rich_idle_customers",
    """
    SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS numcust,
           ROUND(SUM(c_acctbal), 2) AS totacctbal
    FROM customer
    WHERE c_acctbal > (SELECT ROUND(AVG(c_acctbal), 6) FROM customer
                       WHERE c_acctbal > 0.0)
      AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                          AND o_totalprice > 400000.0)
    GROUP BY c_mktsegment
    """,
    doc="TPC-H Q22 shape: uncorrelated scalar subquery (broadcast "
        "one-row threshold) + NOT EXISTS anti join on o_custkey "
        "(above-average-balance customers with no 400k+ order). The "
        "threshold is rounded on both sides so cross-engine summation "
        "order cannot flip a boundary membership.",
    tags=("X2", "X3", "X7"),
)
def rich_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    _views(spark, sf_dir, "customer", "orders")
    return spark.sql("""
        SELECT c_mktsegment, COUNT(*) AS numcust,
               ROUND(SUM(c_acctbal), 2) AS totacctbal
        FROM customer
        WHERE c_acctbal > (SELECT ROUND(AVG(c_acctbal), 6) FROM customer
                           WHERE c_acctbal > 0.0)
          AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                          AND o_totalprice > 400000.0)
        GROUP BY c_mktsegment
    """)


@register(
    "customer_order_distribution",
    """
    SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
    FROM (
        SELECT c_custkey, CAST(COUNT(o_orderkey) AS BIGINT) AS c_count
        FROM customer LEFT OUTER JOIN orders
          ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
        GROUP BY c_custkey
    ) c_orders
    GROUP BY c_count
    """,
    doc="TPC-H Q13 shape: left outer join with an extra ON-clause "
        "predicate (non-urgent orders only) feeding a two-level "
        "aggregation — per-customer order count, then a histogram of "
        "those counts. The ON-predicate placement matters: filtering "
        "in WHERE would silently drop the zero-order customers the "
        "histogram exists to show.",
    tags=("X3", "X7"),
)
def customer_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    _views(spark, sf_dir, "customer", "orders")
    return spark.sql("""
        SELECT c_count, COUNT(*) AS custdist
        FROM (
            SELECT c_custkey, COUNT(o_orderkey) AS c_count
            FROM customer LEFT OUTER JOIN orders
              ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
            GROUP BY c_custkey
        ) c_orders
        GROUP BY c_count
    """)


@register(
    "top_supplier_revenue",
    """
    WITH revenue AS (
        SELECT l_suppkey AS supplier_no,
               ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS total_revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate <  TIMESTAMP '1996-04-01'
        GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    """,
    doc="TPC-H Q15 shape: an aggregate CTE referenced twice — once as "
        "the join input, once inside an uncorrelated scalar MAX "
        "subquery (one-row broadcast). Revenue is rounded at the "
        "aggregate so the max-equality predicate cannot be flipped by "
        "cross-engine summation order.",
    tags=("X3", "X7"),
)
def top_supplier_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    _views(spark, sf_dir, "supplier", "lineitem")
    return spark.sql("""
        WITH revenue AS (
            SELECT l_suppkey AS supplier_no,
                   ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS total_revenue
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1996-01-01'
              AND l_shipdate <  TIMESTAMP '1996-04-01'
            GROUP BY l_suppkey
        )
        SELECT s_suppkey, s_name, total_revenue
        FROM supplier JOIN revenue ON s_suppkey = supplier_no
        WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    """)


@register(
    "big_volume_orders",
    """
    SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
           CAST(SUM(l_quantity) AS DOUBLE) AS total_qty
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem
                         GROUP BY l_orderkey HAVING SUM(l_quantity) > 300.0)
    GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
    """,
    doc="TPC-H Q18 shape: IN over a grouped-HAVING subquery "
        "(decorrelates to a left-semi join against the aggregated "
        "lineitem), then a three-table join re-aggregated per order. "
        "The semi-join input is the agg output (one row per orderkey), "
        "so the probe side shrinks before the expensive join. "
        "l_quantity values are integral, so the double SUM is exact "
        "and the >300 boundary cannot be flipped by summation order.",
    tags=("X2", "X3", "X7"),
)
def big_volume_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    _views(spark, sf_dir, "customer", "orders", "lineitem")
    return spark.sql("""
        SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
               CAST(SUM(l_quantity) AS DOUBLE) AS total_qty
        FROM customer
        JOIN orders   ON c_custkey = o_custkey
        JOIN lineitem ON o_orderkey = l_orderkey
        WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem
                             GROUP BY l_orderkey HAVING SUM(l_quantity) > 300.0)
        GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
    """)


@register(
    "part_supplier_variety",
    """
    SELECT p_brand, p_type, p_size,
           CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
    FROM part JOIN lineitem ON l_partkey = p_partkey
    WHERE p_brand <> 'Brand#1'
      AND p_size IN (1, 5, 9, 13)
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier
                            WHERE s_acctbal < 0.0
                              AND s_suppkey IS NOT NULL)
    GROUP BY p_brand, p_type, p_size
    """,
    doc="TPC-H Q16 shape: NOT IN subquery (null-aware anti join — the "
        "explicit IS NOT NULL lets Catalyst use the broadcast "
        "single-column NAAJ fast path instead of a nested-loop plan) "
        "plus COUNT(DISTINCT) per group. The excluded-supplier list is "
        "dimension-sized at any SF, so the anti join broadcasts.",
    tags=("X2", "X3", "X7", "X8"),
)
def part_supplier_variety(spark: SparkSession, sf_dir: str) -> DataFrame:
    _views(spark, sf_dir, "part", "lineitem", "supplier")
    return spark.sql("""
        SELECT p_brand, p_type, p_size,
               CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
        FROM part JOIN lineitem ON l_partkey = p_partkey
        WHERE p_brand <> 'Brand#1'
          AND p_size IN (1, 5, 9, 13)
          AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier
                                WHERE s_acctbal < 0.0
                                  AND s_suppkey IS NOT NULL)
        GROUP BY p_brand, p_type, p_size
    """)


@register(
    "important_part_value",
    """
    WITH pv AS (
        SELECT l_partkey,
               CAST(ROUND(SUM(l_extendedprice * (1 - l_discount)), 2)
                    AS DECIMAL(18,2)) AS part_value
        FROM lineitem GROUP BY l_partkey
    )
    SELECT l_partkey, CAST(part_value AS DOUBLE) AS part_value
    FROM pv
    WHERE part_value > (SELECT SUM(part_value) * 0.0005 FROM pv)
    """,
    doc="TPC-H Q11 shape: groups whose value exceeds a fraction of the "
        "global total, via an uncorrelated scalar subquery over the "
        "same CTE (one-row broadcast). Per-part values are rounded then "
        "cast to DECIMAL so the global SUM — and therefore the "
        "threshold — is bit-identical across engines regardless of "
        "summation order; a double global sum could flip boundary "
        "membership.",
    tags=("X7",),
)
def important_part_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    _views(spark, sf_dir, "lineitem")
    return spark.sql("""
        WITH pv AS (
            SELECT l_partkey,
                   CAST(ROUND(SUM(l_extendedprice * (1 - l_discount)), 2)
                        AS DECIMAL(18,2)) AS part_value
            FROM lineitem GROUP BY l_partkey
        )
        SELECT l_partkey, CAST(part_value AS DOUBLE) AS part_value
        FROM pv
        WHERE part_value > (SELECT SUM(part_value) * 0.0005 FROM pv)
    """)


@register(
    "sole_fault_suppliers",
    """
    SELECT s_name, CAST(COUNT(*) AS BIGINT) AS numwait
    FROM supplier JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
    WHERE l1.l_returnflag = 'R'
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_returnflag = 'R')
    GROUP BY s_name
    """,
    doc="TPC-H Q21 shape (adapted to this schema's columns: returnflag "
        "stands in for receipt>commit): two correlated subqueries on "
        "the SAME fact table — an EXISTS (other suppliers touched the "
        "order) and a NOT EXISTS (none of them also returned) — i.e. "
        "suppliers solely at fault on multi-supplier orders. Catalyst "
        "decorrelates both into semi/anti self-joins shuffled on "
        "l_orderkey, so all three lineitem sides co-partition.",
    tags=("X2", "X3", "X7"),
)
def sole_fault_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    _views(spark, sf_dir, "supplier", "lineitem")
    return spark.sql("""
        SELECT s_name, COUNT(*) AS numwait
        FROM supplier JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
        WHERE l1.l_returnflag = 'R'
          AND EXISTS (SELECT 1 FROM lineitem l2
                      WHERE l2.l_orderkey = l1.l_orderkey
                        AND l2.l_suppkey <> l1.l_suppkey)
          AND NOT EXISTS (SELECT 1 FROM lineitem l3
                          WHERE l3.l_orderkey = l1.l_orderkey
                            AND l3.l_suppkey <> l1.l_suppkey
                            AND l3.l_returnflag = 'R')
        GROUP BY s_name
    """)


@register(
    "lateral_recent_orders",
    """
    SELECT c_custkey, c_mktsegment, o_orderkey, o_totalprice, o_orderdate
    FROM customer,
         LATERAL (SELECT o_orderkey, o_totalprice, o_orderdate
                  FROM orders
                  WHERE o_custkey = c_custkey
                  ORDER BY o_orderdate DESC, o_orderkey
                  LIMIT 2) recent
    WHERE c_acctbal > 9000.0
    """,
    doc="Correlated LATERAL subquery: each qualifying customer joined "
        "to its two most recent orders. Catalyst rewrites the lateral "
        "limit into a ranked window over a single shuffled join — no "
        "per-row re-execution, unlike the reference's per-album loop "
        "fetch (/root/reference/scripts/extract.py:212-231).",
    tags=("X3", "X12"),
)
def lateral_recent_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    _views(spark, sf_dir, "customer", "orders")
    return spark.sql("""
        SELECT c_custkey, c_mktsegment, o_orderkey, o_totalprice, o_orderdate
        FROM customer,
             LATERAL (SELECT o_orderkey, o_totalprice, o_orderdate
                      FROM orders
                      WHERE o_custkey = c_custkey
                      ORDER BY o_orderdate DESC, o_orderkey
                      LIMIT 2) recent
        WHERE c_acctbal > 9000.0
    """)


@register(
    "hierarchy_rollup",
    """
    WITH RECURSIVE walk AS (
        SELECT c_custkey AS node, c_custkey AS root, 0 AS depth,
               c_acctbal AS bal
        FROM customer WHERE c_custkey < 10
        UNION ALL
        SELECT c.c_custkey, w.root, w.depth + 1, c.c_acctbal
        FROM customer c JOIN walk w
          ON c.c_custkey // 10 = w.node AND c.c_custkey >= 10
    )
    SELECT root, CAST(COUNT(*) AS BIGINT) AS n_nodes,
           CAST(MAX(depth) AS BIGINT) AS max_depth,
           ROUND(SUM(bal), 2) AS total_bal
    FROM walk GROUP BY root
    """,
    doc="Recursive-CTE hierarchy rollup (Spark 4 WITH RECURSIVE): walk "
        "a synthetic management tree (parent = custkey DIV 10) from the "
        "roots and fold each subtree's size, depth and balance. Each "
        "recursion step is one hash join of the frontier against the "
        "base table — depth is log10(max key), so the plan is a short "
        "chain of joins, never a driver loop. Exact DuckDB recursive "
        "twin.",
    tags=("X37", "X3", "X7"),
)
def hierarchy_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..catalog import register_views

    register_views(spark, sf_dir, ("customer",))
    return spark.sql("""
        WITH RECURSIVE walk AS (
            SELECT c_custkey AS node, c_custkey AS root, 0 AS depth,
                   c_acctbal AS bal
            FROM customer WHERE c_custkey < 10
            UNION ALL
            SELECT c.c_custkey, w.root, w.depth + 1, c.c_acctbal
            FROM customer c JOIN walk w
              ON c.c_custkey DIV 10 = w.node AND c.c_custkey >= 10
        )
        SELECT root, CAST(COUNT(*) AS BIGINT) AS n_nodes,
               CAST(MAX(depth) AS BIGINT) AS max_depth,
               ROUND(SUM(bal), 2) AS total_bal
        FROM walk GROUP BY root
    """)
