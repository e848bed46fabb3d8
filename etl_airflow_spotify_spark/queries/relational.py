"""Relational operator battery (SURVEY.md §2.B X1-X15 + X14 JSON).

Every query here is a lazy DataFrame plan — Catalyst handles predicate
pushdown, column pruning, join strategy, and partial aggregation. Dims
(region/nation/supplier at test SFs) are broadcast explicitly where a real
100 TB run would want it; fact-fact joins shuffle on their keys and rely
on AQE for skew/coalesce.

Float policy: double aggregates are ROUND()ed identically on both sides
(Spark + DuckDB oracle) so summation-order nondeterminism cannot flip the
driver's value hash. Ints derived by date/string functions are cast to
BIGINT on both sides (DuckDB's year() et al. return BIGINT).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from ..catalog import load_table
from ..registry import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# --------------------------------------------------------------------------
# X1/X2/X7: scan → filter → groupBy aggregate (TPC-H Q1 shape).
# Reference parity: the only agg in the reference is COUNT
# (etl_pipeline.py:212-217); this is its scale-ready generalization.
# --------------------------------------------------------------------------
@register(
    "pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           ROUND(SUM(l_quantity), 2)                                    AS sum_qty,
           ROUND(SUM(l_extendedprice), 2)                               AS sum_base_price,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2)            AS sum_disc_price,
           ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
           ROUND(AVG(l_quantity), 4)                                    AS avg_qty,
           ROUND(AVG(l_extendedprice), 4)                               AS avg_price,
           ROUND(AVG(l_discount), 4)                                    AS avg_disc,
           COUNT(*)                                                     AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2000-12-01'
    GROUP BY l_returnflag, l_linestatus
    """,
    doc="TPC-H Q1 pricing summary: filter -> hash agg (partial+final).",
    tags=("X1", "X2", "X7"),
)
def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2000-12-01").cast("timestamp_ntz"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(disc_price * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


# --------------------------------------------------------------------------
# X2: predicate battery — IN / BETWEEN / LIKE / null-safe, all pushed to
# the parquet scan (verify with .explain: PushedFilters).
# --------------------------------------------------------------------------
@register(
    "filter_battery",
    """
    SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice, l_returnflag
    FROM lineitem
    WHERE l_quantity BETWEEN 10 AND 20
      AND l_returnflag IN ('R', 'A')
      AND l_linestatus LIKE 'F%'
      AND l_discount IS NOT NULL
      AND l_extendedprice > 1000.0
    """,
    doc="Compound predicate pushdown: BETWEEN + IN + LIKE + IS NOT NULL.",
    tags=("X2",),
)
def filter_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return li.filter(
        F.col("l_quantity").between(10, 20)
        & F.col("l_returnflag").isin("R", "A")
        & F.col("l_linestatus").like("F%")
        & F.col("l_discount").isNotNull()
        & (F.col("l_extendedprice") > 1000.0)
    ).select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice",
             "l_returnflag")


# --------------------------------------------------------------------------
# X3+X7+X12: 3-way join -> agg -> deterministic top-k (TPC-H Q3 shape).
# customer is the small side per-segment; orders⋈lineitem shuffles on
# orderkey. Revenue ties broken by orderkey so LIMIT is deterministic.
# --------------------------------------------------------------------------
@register(
    "top_revenue_orders",
    """
    SELECT o.o_orderkey,
           ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
           o.o_orderdate, o.o_orderpriority
    FROM customer c
    JOIN orders o    ON c.c_custkey = o.o_custkey
    JOIN lineitem l  ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '2000-03-15'
      AND l.l_shipdate  > TIMESTAMP '1998-03-15'
    GROUP BY o.o_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue DESC, o_orderkey
    LIMIT 10
    """,
    doc="TPC-H Q3: selective 3-way join, agg, top-k with stable tiebreak.",
    tags=("X3", "X7", "X12"),
)
def top_revenue_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("2000-03-15").cast("timestamp_ntz"))
    li = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-03-15").cast("timestamp_ntz"))
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2)
             .alias("revenue"))
        .select("o_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue"), F.asc("o_orderkey"))
        .limit(10)
    )


# --------------------------------------------------------------------------
# X3: join how-type battery (left / semi / anti demonstrated separately so
# each row-set is oracle-checkable).
# --------------------------------------------------------------------------
@register(
    "join_left",
    """
    SELECT c.c_custkey, c.c_name, o.o_orderkey, o.o_totalprice
    FROM customer c
    LEFT JOIN orders o
      ON c.c_custkey = o.o_custkey AND o.o_orderstatus = 'F'
    """,
    doc="Left outer equi-join with a join-side predicate (null-extended rows kept).",
    tags=("X3",),
)
def join_left(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return c.join(
        o, (c.c_custkey == o.o_custkey) & (o.o_orderstatus == "F"), "left"
    ).select("c_custkey", "c_name", "o_orderkey", "o_totalprice")


@register(
    "join_semi_anti",
    """
    SELECT c_custkey, c_name, 'has_urgent' AS bucket FROM customer
    WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT')
    UNION ALL
    SELECT c_custkey, c_name, 'no_urgent' AS bucket FROM customer
    WHERE c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT')
    """,
    doc="Left-semi + left-anti join, union-tagged so one result covers both.",
    tags=("X3", "X13"),
)
def join_semi_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    urgent = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT").select("o_custkey")
    semi = c.join(urgent, c.c_custkey == urgent.o_custkey, "left_semi") \
            .select("c_custkey", "c_name", F.lit("has_urgent").alias("bucket"))
    anti = c.join(urgent, c.c_custkey == urgent.o_custkey, "left_anti") \
            .select("c_custkey", "c_name", F.lit("no_urgent").alias("bucket"))
    return semi.unionByName(anti)


# --------------------------------------------------------------------------
# X4: broadcast-join star query — region->nation->customer->orders rollup.
# nation/region are tiny at any SF: broadcast them explicitly (the plan
# must show BroadcastHashJoin, no shuffle of the fact side for dims).
# --------------------------------------------------------------------------
@register(
    "revenue_by_region",
    """
    SELECT r.r_name AS region, n.n_name AS nation,
           COUNT(*) AS n_orders,
           ROUND(SUM(o.o_totalprice), 2) AS total_revenue,
           ROUND(AVG(o.o_totalprice), 4) AS avg_revenue
    FROM region r
    JOIN nation n   ON n.n_regionkey = r.r_regionkey
    JOIN customer c ON c.c_nationkey = n.n_nationkey
    JOIN orders o   ON o.o_custkey = c.c_custkey
    GROUP BY r.r_name, n.n_name
    """,
    doc="Star-schema rollup with explicitly broadcast dimensions.",
    tags=("X4", "X7"),
)
def revenue_by_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    r = F.broadcast(_t(spark, sf_dir, "region"))
    n = F.broadcast(_t(spark, sf_dir, "nation"))
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(n, c.c_nationkey == n.n_nationkey)
        .join(r, n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("r_name").alias("region"), F.col("n_name").alias("nation"))
        .agg(
            F.count("*").alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total_revenue"),
            F.round(F.avg("o_totalprice"), 4).alias("avg_revenue"),
        )
    )


# --------------------------------------------------------------------------
# X5: non-equi (range/theta) join — parts priced within a band of each
# lineitem's unit price. Banded to stay selective; at scale this is the
# bucketize-then-equi-join pattern (bucket key keeps it from exploding).
# --------------------------------------------------------------------------
@register(
    "range_join_price_band",
    """
    SELECT l.l_orderkey, l.l_linenumber, p.p_partkey,
           ROUND(p.p_retailprice, 2) AS p_price
    FROM lineitem l
    JOIN part p
      ON p.p_partkey = l.l_partkey
     AND l.l_extendedprice / l.l_quantity
         BETWEEN p.p_retailprice * 0.5 AND p.p_retailprice * 2.0
    WHERE l.l_linenumber = 1 AND l.l_quantity > 0
    """,
    doc="Theta join: equi key + range residual predicate.",
    tags=("X5",),
)
def range_join_price_band(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_linenumber") == 1) & (F.col("l_quantity") > 0))
    p = _t(spark, sf_dir, "part")
    unit = F.col("l_extendedprice") / F.col("l_quantity")
    return (
        li.join(
            p,
            (p.p_partkey == li.l_partkey)
            & unit.between(p.p_retailprice * 0.5, p.p_retailprice * 2.0),
        )
        .select("l_orderkey", "l_linenumber", "p_partkey",
                F.round("p_retailprice", 2).alias("p_price"))
    )


# --------------------------------------------------------------------------
# X7/X8: distinct + count-distinct per group.
# --------------------------------------------------------------------------
@register(
    "segment_stats",
    """
    SELECT c_mktsegment,
           COUNT(*) AS n_customers,
           COUNT(DISTINCT c_nationkey) AS n_nations,
           ROUND(SUM(c_acctbal), 2) AS total_balance,
           ROUND(MIN(c_acctbal), 2) AS min_balance,
           ROUND(MAX(c_acctbal), 2) AS max_balance
    FROM customer
    GROUP BY c_mktsegment
    """,
    doc="Group agg with exact count-distinct (expand+two-phase in Spark).",
    tags=("X7", "X8"),
)
def segment_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    return c.groupBy("c_mktsegment").agg(
        F.count("*").alias("n_customers"),
        F.countDistinct("c_nationkey").alias("n_nations"),
        F.round(F.sum("c_acctbal"), 2).alias("total_balance"),
        F.round(F.min("c_acctbal"), 2).alias("min_balance"),
        F.round(F.max("c_acctbal"), 2).alias("max_balance"),
    )


@register(
    "distinct_rows",
    """
    SELECT DISTINCT l_returnflag, l_linestatus, l_shipmode
    FROM (SELECT l_returnflag, l_linestatus,
                 CASE WHEN l_linenumber % 2 = 0 THEN 'EVEN' ELSE 'ODD' END AS l_shipmode
          FROM lineitem)
    """,
    doc="DISTINCT over a derived projection.",
    tags=("X8",),
)
def distinct_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.select(
            "l_returnflag", "l_linestatus",
            F.when(F.col("l_linenumber") % 2 == 0, "EVEN").otherwise("ODD")
            .alias("l_shipmode"),
        ).distinct()
    )


# --------------------------------------------------------------------------
# X9: rollup + cube + grouping sets.
# --------------------------------------------------------------------------
@register(
    "rollup_returns",
    """
    SELECT l_returnflag, l_linestatus,
           COUNT(*) AS n,
           ROUND(SUM(l_quantity), 2) AS sum_qty
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
    doc="ROLLUP hierarchy totals (NULL-marked subtotal rows).",
    tags=("X9",),
)
def rollup_returns(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.count("*").alias("n"),
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
    )


@register(
    "cube_order_status",
    """
    SELECT o_orderstatus, o_orderpriority,
           COUNT(*) AS n,
           ROUND(SUM(o_totalprice), 2) AS total
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
    doc="CUBE over two dimensions.",
    tags=("X9",),
)
def cube_order_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    return o.cube("o_orderstatus", "o_orderpriority").agg(
        F.count("*").alias("n"),
        F.round(F.sum("o_totalprice"), 2).alias("total"),
    )


# --------------------------------------------------------------------------
# X10: ranking windows — top-3 orders per customer, fully deterministic.
# --------------------------------------------------------------------------
@register(
    "top_orders_per_customer",
    """
    SELECT o_custkey, o_orderkey, o_totalprice, rn
    FROM (
        SELECT o_custkey, o_orderkey, o_totalprice,
               ROW_NUMBER() OVER (PARTITION BY o_custkey
                                  ORDER BY o_totalprice DESC, o_orderkey) AS rn
        FROM orders
    ) WHERE rn <= 3
    """,
    doc="Top-k per group via ranking window (single shuffle on the group key).",
    tags=("X10", "X12"),
)
def top_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
    )


# --------------------------------------------------------------------------
# X11: analytic windows — lag/lead + running aggregate. Frame order is made
# total (orderdate, orderkey) so prefix sums are computed in the same order
# by Spark and the oracle -> bit-identical doubles.
# --------------------------------------------------------------------------
@register(
    "customer_order_history",
    """
    SELECT o_custkey, o_orderkey,
           ROUND(o_totalprice, 2) AS price,
           ROUND(SUM(o_totalprice) OVER w_run, 2) AS running_total,
           ROUND(COALESCE(LAG(o_totalprice) OVER w_ord, 0.0), 2) AS prev_price,
           ROUND(COALESCE(LEAD(o_totalprice) OVER w_ord, 0.0), 2) AS next_price,
           CAST(ROW_NUMBER() OVER w_ord AS BIGINT) AS order_seq
    FROM orders
    WINDOW w_ord AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
           w_run AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    """,
    doc="Running total + lag/lead over a totally-ordered per-customer frame.",
    tags=("X11",),
)
def customer_order_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    w_ord = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    w_run = w_ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return o.select(
        "o_custkey", "o_orderkey",
        F.round("o_totalprice", 2).alias("price"),
        F.round(F.sum("o_totalprice").over(w_run), 2).alias("running_total"),
        F.round(F.coalesce(F.lag("o_totalprice").over(w_ord), F.lit(0.0)), 2)
        .alias("prev_price"),
        F.round(F.coalesce(F.lead("o_totalprice").over(w_ord), F.lit(0.0)), 2)
        .alias("next_price"),
        F.row_number().over(w_ord).cast("long").alias("order_seq"),
    )


# --------------------------------------------------------------------------
# X13: set operations.
# --------------------------------------------------------------------------
@register(
    "setops_customers",
    """
    WITH buyers AS (SELECT DISTINCT o_custkey AS k FROM orders
                    WHERE o_orderstatus = 'O'),
         f_buyers AS (SELECT DISTINCT o_custkey AS k FROM orders
                      WHERE o_orderstatus = 'F')
    SELECT 'both' AS tag, k FROM (SELECT k FROM buyers INTERSECT SELECT k FROM f_buyers)
    UNION ALL
    SELECT 'open_only' AS tag, k FROM (SELECT k FROM buyers EXCEPT SELECT k FROM f_buyers)
    """,
    doc="INTERSECT + EXCEPT + UNION ALL over derived key sets.",
    tags=("X13",),
)
def setops_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    buyers = o.filter(F.col("o_orderstatus") == "O") \
              .select(F.col("o_custkey").alias("k")).distinct()
    f_buyers = o.filter(F.col("o_orderstatus") == "F") \
                .select(F.col("o_custkey").alias("k")).distinct()
    both = buyers.intersect(f_buyers).select(F.lit("both").alias("tag"), "k")
    open_only = buyers.exceptAll(f_buyers).select(
        F.lit("open_only").alias("tag"), "k")
    return both.unionByName(open_only)


# --------------------------------------------------------------------------
# X14: scalar-function battery — string / date / math, types aligned with
# DuckDB (BIGINT for date parts, DATE for truncation).
# --------------------------------------------------------------------------
@register(
    "scalar_battery",
    """
    SELECT o_orderkey,
           UPPER(o_orderpriority)                               AS pri_upper,
           SUBSTRING(o_orderpriority, 1, 1)                     AS pri_code,
           CAST(LENGTH(o_orderpriority) AS BIGINT)              AS pri_len,
           CONCAT(o_orderstatus, '-', o_orderpriority)          AS status_pri,
           REPLACE(o_orderpriority, ' ', '_')                   AS pri_snake,
           CAST(YEAR(o_orderdate) AS BIGINT)                    AS order_year,
           CAST(MONTH(o_orderdate) AS BIGINT)                   AS order_month,
           CAST(DATE_TRUNC('month', o_orderdate) AS DATE)       AS order_month_start,
           ROUND(o_totalprice * 0.07, 2)                        AS est_tax,
           CAST(o_orderkey % 7 AS BIGINT)                       AS key_mod,
           ROUND(SQRT(ABS(o_totalprice)), 4)                    AS price_sqrt,
           ROUND(LN(o_totalprice + 1), 6)                       AS price_ln
    FROM orders
    WHERE o_orderkey % 10 = 0
    """,
    doc="String/date/math scalar functions, all JVM-side (no UDFs).",
    tags=("X14",),
)
def scalar_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 10 == 0)
    return o.select(
        "o_orderkey",
        F.upper("o_orderpriority").alias("pri_upper"),
        F.substring("o_orderpriority", 1, 1).alias("pri_code"),
        F.length("o_orderpriority").cast("long").alias("pri_len"),
        F.concat_ws("-", "o_orderstatus", "o_orderpriority").alias("status_pri"),
        F.replace(F.col("o_orderpriority"), F.lit(" "), F.lit("_")).alias("pri_snake"),
        F.year("o_orderdate").cast("long").alias("order_year"),
        F.month("o_orderdate").cast("long").alias("order_month"),
        F.date_trunc("month", F.col("o_orderdate")).cast("date")
        .alias("order_month_start"),
        F.round(F.col("o_totalprice") * 0.07, 2).alias("est_tax"),
        (F.col("o_orderkey") % 7).cast("long").alias("key_mod"),
        F.round(F.sqrt(F.abs(F.col("o_totalprice"))), 4).alias("price_sqrt"),
        F.round(F.log(F.col("o_totalprice") + 1), 6).alias("price_ln"),
    )


# --------------------------------------------------------------------------
# X14: JSON extraction over events.props (a JSON string column).
# --------------------------------------------------------------------------
@register(
    "events_json_stats",
    """
    SELECT event_type,
           COUNT(*) AS n_events,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
           ROUND(SUM(value), 2) AS total_value,
           ROUND(AVG(CAST(json_extract_string(props, '$.k') AS BIGINT)), 4) AS avg_k,
           CAST(MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS max_k
    FROM events
    GROUP BY event_type
    """,
    doc="JSON field extraction (get_json_object) + per-type aggregates.",
    tags=("X14",),
)
def events_json_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return ev.groupBy("event_type").agg(
        F.count("*").alias("n_events"),
        F.countDistinct("user_id").cast("long").alias("n_users"),
        F.round(F.sum("value"), 2).alias("total_value"),
        F.round(F.avg(k), 4).alias("avg_k"),
        F.max(k).cast("long").alias("max_k"),
    )


# --------------------------------------------------------------------------
# X15: exact dedup — keep the first event per (user_id, event_type) by
# time; dropDuplicates is nondeterministic about WHICH row survives, so at
# engine level we use the window formulation (deterministic + oracle-safe).
# --------------------------------------------------------------------------
@register(
    "dedup_first_event",
    """
    SELECT event_id, user_id, event_type, ts
    FROM (
        SELECT event_id, user_id, event_type, ts,
               ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                                  ORDER BY ts, event_id) AS rn
        FROM events
    ) WHERE rn = 1
    """,
    doc="Exact dedup with deterministic survivor (min ts, then min id).",
    tags=("X15",),
)
def dedup_first_event(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("event_id", "user_id", "event_type", "ts")
    )


# --------------------------------------------------------------------------
# Classic TPC-H-shaped analytics over the simplified schemas: conditional
# aggregation (Q14), multi-way join + share-of-total (Q8), disjunctive
# compound pushdown (Q19), exact interpolated percentiles.
# --------------------------------------------------------------------------
@register(
    "promo_revenue",
    """
    SELECT CAST(ROUND(
               100.0 * SUM(CASE WHEN p_type = 'PROMO'
                                THEN l_extendedprice * (1 - l_discount)
                                ELSE 0 END)
               / SUM(l_extendedprice * (1 - l_discount)), 4) AS DOUBLE)
           AS promo_pct
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate <  TIMESTAMP '1997-02-01'
    """,
    doc="TPC-H Q14 shape: conditional aggregate ratio (promo revenue "
        "share) over a month of shipments.",
    tags=("X3", "X7", "X14"),
)
def promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-01-01") &
        (F.col("l_shipdate") < "1997-02-01"))
    p = _t(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .agg(F.round(
            100.0 * F.sum(F.when(F.col("p_type") == "PROMO", rev)
                          .otherwise(F.lit(0.0))) / F.sum(rev), 4)
            .cast("double").alias("promo_pct"))
    )


@register(
    "market_share",
    """
    WITH sales AS (
        SELECT EXTRACT(year FROM o_orderdate) AS o_year,
               l_extendedprice * (1 - l_discount) AS rev,
               r.r_name AS supp_region
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation n ON s_nationkey = n.n_nationkey
        JOIN region r ON n.n_regionkey = r.r_regionkey
    )
    SELECT CAST(o_year AS BIGINT) AS o_year,
           ROUND(SUM(CASE WHEN supp_region = 'ASIA' THEN rev ELSE 0 END)
                 / SUM(rev), 6) AS asia_share
    FROM sales GROUP BY o_year
    """,
    doc="TPC-H Q8 shape: 5-table join (fact + orders + supplier dim "
        "chain), year extraction, share-of-total per year. The dim "
        "chain broadcasts; only the fact-orders join shuffles.",
    tags=("X3", "X4", "X7", "X14"),
)
def market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    sales = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select(F.year("o_orderdate").cast("long").alias("o_year"),
                rev.alias("rev"), F.col("r_name").alias("supp_region"))
    )
    return (
        sales.groupBy("o_year")
        .agg(F.round(
            F.sum(F.when(F.col("supp_region") == "ASIA", F.col("rev"))
                  .otherwise(F.lit(0.0))) / F.sum("rev"), 6)
            .alias("asia_share"))
    )


@register(
    "brand_filter_revenue",
    """
    SELECT CAST(ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS DOUBLE)
           AS revenue
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 1 AND 11)
       OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 25
           AND l_quantity BETWEEN 10 AND 20)
       OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 35
           AND l_quantity BETWEEN 20 AND 30)
    """,
    doc="TPC-H Q19 shape: disjunctive compound predicate across both "
        "join sides; per-side conjuncts still push to each scan.",
    tags=("X2", "X3", "X7"),
)
def brand_filter_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    q = F.col("l_quantity")
    cond = (
        ((F.col("p_brand") == "Brand#1") & F.col("p_size").between(1, 15)
         & q.between(1, 11)) |
        ((F.col("p_brand") == "Brand#2") & F.col("p_size").between(1, 25)
         & q.between(10, 20)) |
        ((F.col("p_brand") == "Brand#3") & F.col("p_size").between(1, 35)
         & q.between(20, 30))
    )
    return (
        li.join(p, li.l_partkey == p.p_partkey).filter(cond)
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2)
             .cast("double").alias("revenue"))
    )


@register(
    "quantile_stats",
    """
    SELECT l_returnflag,
           CAST(COUNT(*) AS BIGINT) AS n,
           array_to_string(
               list_transform(quantile_cont(l_extendedprice, [0.25, 0.5, 0.9]),
                              x -> CAST(ROUND(x * 10000) AS BIGINT)),
               ',') AS price_pctiles
    FROM lineitem GROUP BY l_returnflag
    """,
    doc="Exact interpolated percentiles per group (Spark percentile == "
        "DuckDB quantile_cont, both linear-interpolation). The approx "
        "sketch path is approx_aggregates.",
    tags=("X7", "X8"),
)
def quantile_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(F.count("*").alias("n"),
             # Integer-scaled CSV: hashable for the driver canonicalizer
             # (array cells crash it) and immune to float-to-string
             # formatting skew between engines.
             F.array_join(
                 F.transform(
                     F.expr("percentile(l_extendedprice, "
                            "array(0.25, 0.5, 0.9))"),
                     lambda x: F.round(x * 10000).cast("long")
                     .cast("string")),
                 ",").alias("price_pctiles"))
    )


@register(
    "nullsafe_join_counts",
    """
    WITH o AS (SELECT NULLIF(o_orderstatus, 'P') AS status_n FROM orders),
    d AS (SELECT DISTINCT status_n FROM o)
    SELECT d.status_n, CAST(COUNT(*) AS BIGINT) AS n
    FROM o JOIN d ON o.status_n IS NOT DISTINCT FROM d.status_n
    GROUP BY d.status_n
    """,
    doc="Null-safe equi-join (eqNullSafe <=> IS NOT DISTINCT FROM): the "
        "NULL key group joins and counts instead of dropping.",
    tags=("X2", "X3"),
)
def nullsafe_join_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders").select(
        F.nullif(F.col("o_orderstatus"), F.lit("P")).alias("status_n"))
    d = o.distinct().select(F.col("status_n").alias("d_status"))
    return (
        o.join(F.broadcast(d), o.status_n.eqNullSafe(d.d_status))
        .groupBy("d_status")
        .agg(F.count("*").alias("n"))
        .select(F.col("d_status").alias("status_n"), "n")
    )


@register(
    "rank_battery",
    """
    WITH ranked AS (
        SELECT o_orderkey, o_orderpriority,
               CAST(RANK() OVER w AS BIGINT) AS rnk,
               CAST(DENSE_RANK() OVER w AS BIGINT) AS drnk,
               CAST(NTILE(4) OVER w AS BIGINT) AS quartile,
               ROUND(PERCENT_RANK() OVER w, 6) AS pct_rank,
               ROUND(CUME_DIST() OVER w, 6) AS cume
        FROM orders
        WINDOW w AS (PARTITION BY o_orderpriority
                     ORDER BY o_totalprice DESC, o_orderkey)
    )
    SELECT * FROM ranked WHERE o_orderkey % 20 = 0
    """,
    doc="Ranking-function battery (rank, dense_rank, ntile, "
        "percent_rank, cume_dist) over a tie-free deterministic "
        "ordering; one shuffle on the partition key.",
    tags=("X10",),
)
def rank_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority") \
              .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        o.select(
            "o_orderkey", "o_orderpriority",
            F.rank().over(w).cast("long").alias("rnk"),
            F.dense_rank().over(w).cast("long").alias("drnk"),
            F.ntile(4).over(w).cast("long").alias("quartile"),
            F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
            F.round(F.cume_dist().over(w), 6).alias("cume"),
        )
        .filter(F.col("o_orderkey") % 20 == 0)
    )


@register(
    "agg_lists",
    """
    SELECT o_orderpriority,
           array_to_string(list_sort(list(DISTINCT o_orderstatus)), ',')
               AS statuses,
           CAST(COUNT(DISTINCT o_orderstatus) AS BIGINT) AS n_statuses,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM orders GROUP BY o_orderpriority
    """,
    doc="Collection aggregates: collect_set sorted for determinism "
        "(collect order is partition-dependent; the sort makes the "
        "result value-stable) + distinct count.",
    tags=("X7", "X8", "X14"),
)
def agg_lists(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderpriority")
        .agg(F.array_join(F.array_sort(F.collect_set("o_orderstatus")), ",")
             .alias("statuses"),
             F.countDistinct("o_orderstatus").cast("long").alias("n_statuses"),
             F.count("*").alias("n"))
    )


@register(
    "unpivot_metrics",
    """
    SELECT l_returnflag, metric, ROUND(SUM(val), 2) AS total
    FROM (
        SELECT l_returnflag, 'l_quantity' AS metric, l_quantity AS val
        FROM lineitem
        UNION ALL
        SELECT l_returnflag, 'l_extendedprice', l_extendedprice FROM lineitem
        UNION ALL
        SELECT l_returnflag, 'l_discount', l_discount FROM lineitem
        UNION ALL
        SELECT l_returnflag, 'l_tax', l_tax FROM lineitem
    )
    GROUP BY l_returnflag, metric
    """,
    doc="Unpivot (wide->long melt) of four lineitem measures into "
        "(metric, val) rows, aggregated per flag+metric. Spark's "
        "unpivot is a zero-shuffle expression-level expansion "
        "(internally Expand: each input row emits 4) feeding one "
        "partial+final aggregate; the oracle spells it as the "
        "equivalent UNION ALL, which scans 4x instead.",
    tags=("X7", "X14", "X13"),
)
def unpivot_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    long = li.unpivot(
        ["l_returnflag"],
        ["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
        "metric", "val")
    return (long.groupBy("l_returnflag", "metric")
                .agg(F.round(F.sum("val"), 2).alias("total")))


_PROFILE_NUM = ("l_quantity", "l_extendedprice", "l_discount", "l_tax")
_PROFILE_STR = ("l_returnflag", "l_linestatus")


def _profile_oracle() -> str:
    parts = []
    for c in _PROFILE_NUM:
        parts.append(f"""
        SELECT '{c}' AS col_name,
               CAST(COUNT(*) - COUNT({c}) AS BIGINT) AS n_nulls,
               CAST(COUNT(DISTINCT {c}) AS BIGINT) AS n_distinct,
               CAST(MIN({c}) AS VARCHAR) AS min_s,
               CAST(MAX({c}) AS VARCHAR) AS max_s,
               ROUND(AVG({c}), 4) AS mean,
               ROUND(STDDEV_SAMP({c}), 4) AS stddev
        FROM lineitem""")
    for c in _PROFILE_STR:
        parts.append(f"""
        SELECT '{c}', CAST(COUNT(*) - COUNT({c}) AS BIGINT),
               CAST(COUNT(DISTINCT {c}) AS BIGINT),
               MIN({c}), MAX({c}),
               CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE)
        FROM lineitem""")
    return " UNION ALL ".join(parts)


@register(
    "profile_lineitem",
    _profile_oracle(),
    doc="Column-profiling sweep over lineitem (the data-quality pass "
        "every ingestion pipeline runs first): per column, null count, "
        "exact distinct count, min/max, mean and sample stddev — ONE "
        "row per profiled column. Everything computes in a handful of "
        "scans with map-side partial aggregation; at 100 TB swap the "
        "exact count_distinct for approx_count_distinct/HLL (the "
        "sketch queries demonstrate that path) and the shape is "
        "unchanged. Doubles rounded to 4 on both engines: stddev "
        "accumulation order differs across engines, so low-order dust "
        "is rounded away exactly like every other money aggregate.",
    tags=("X7", "X8", "X14"),
)
def profile_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")

    def num_profile(c: str) -> DataFrame:
        return li.agg(
            F.lit(c).alias("col_name"),
            F.sum(F.col(c).isNull().cast("int")).cast("long")
            .alias("n_nulls"),
            F.count_distinct(F.col(c)).cast("long").alias("n_distinct"),
            F.min(c).cast("string").alias("min_s"),
            F.max(c).cast("string").alias("max_s"),
            F.round(F.avg(c), 4).alias("mean"),
            F.round(F.stddev_samp(c), 4).alias("stddev"))

    def str_profile(c: str) -> DataFrame:
        return li.agg(
            F.lit(c).alias("col_name"),
            F.sum(F.col(c).isNull().cast("int")).cast("long")
            .alias("n_nulls"),
            F.count_distinct(F.col(c)).cast("long").alias("n_distinct"),
            F.min(c).alias("min_s"),
            F.max(c).alias("max_s"),
            F.lit(None).cast("double").alias("mean"),
            F.lit(None).cast("double").alias("stddev"))

    out = num_profile(_PROFILE_NUM[0])
    for c in _PROFILE_NUM[1:]:
        out = out.unionByName(num_profile(c))
    for c in _PROFILE_STR:
        out = out.unionByName(str_profile(c))
    return out


N_HIST_BUCKETS = 10
# Above this row count the exact-percentile aggregation buffer (which
# grows with distinct values, all on ONE reducer) gives way to the
# bounded-memory approx_percentile sketch. Measured at sf0.1 (600k
# rows): exact 3.76s vs approx 0.98s warm — the buffer is already the
# query's dominant cost one decade above the threshold, and at 100 TB
# the exact form simply dies; the sketch is the real default, the exact
# form the sub-threshold oracle twin.
EQUIDEPTH_EXACT_MAX_ROWS = 100_000
EQUIDEPTH_APPROX_ACCURACY = 10_000


@register(
    "equidepth_price_histogram",
    f"""
    WITH bounds AS (
        SELECT quantile_cont(l_extendedprice,
                             [x * 1.0 / {N_HIST_BUCKETS}
                              FOR x IN range(1, {N_HIST_BUCKETS})]) AS qs
        FROM lineitem
    ),
    bucketed AS (
        SELECT CAST(len(list_filter(b.qs, q -> l.l_extendedprice > q))
                    AS BIGINT) AS bucket,
               l.l_extendedprice AS p
        FROM lineitem l, bounds b
    )
    SELECT bucket,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           ROUND(MIN(p), 4) AS lo,
           ROUND(MAX(p), 4) AS hi,
           ROUND(SUM(p), 2) AS total
    FROM bucketed GROUP BY bucket
    """,
    doc="Equi-depth price histogram WITHOUT a global sort: decile "
        "boundaries from one percentile aggregate, then a map-only "
        "bucket assignment (count of boundaries below the value) + "
        "per-bucket fold. A window-ntile formulation would ORDER BY "
        "the whole table through one reducer — this shape scans twice "
        "but never serializes. Boundary computation switches on input "
        "size: exact percentile (matches DuckDB quantile_cont "
        "bit-for-bit — the oracle twin) buffers a value->count map "
        "that grows with distinct prices, so above "
        "EQUIDEPTH_EXACT_MAX_ROWS the query uses approx_percentile "
        "(KLL-style sketch, bounded memory at any scale; boundaries "
        "within the accuracy budget, bucket assignment unchanged).",
    tags=("X7", "X14", "X12"),
)
def equidepth_price_histogram(spark: SparkSession, sf_dir: str,
                              exact: bool | None = None) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    if exact is None:
        # one column-less count scan — trivial next to the query's own
        # two full passes — picks the boundary algorithm
        exact = li.count() <= EQUIDEPTH_EXACT_MAX_ROWS
    fr = [i / N_HIST_BUCKETS for i in range(1, N_HIST_BUCKETS)]
    fr_sql = ", ".join(map(str, fr))
    pct = (f"percentile(l_extendedprice, array({fr_sql}))" if exact
           else f"approx_percentile(l_extendedprice, array({fr_sql}), "
                f"{EQUIDEPTH_APPROX_ACCURACY})")
    bounds = li.agg(F.expr(pct).cast("array<double>").alias("qs"))
    bucketed = (li.select("l_extendedprice")
                .crossJoin(F.broadcast(bounds))
                .select(
                    F.size(F.filter(
                        "qs",
                        lambda q: F.col("l_extendedprice") > q))
                    .cast("long").alias("bucket"),
                    F.col("l_extendedprice").alias("p")))
    return (bucketed.groupBy("bucket")
            .agg(F.count("*").cast("long").alias("n_rows"),
                 F.round(F.min("p"), 4).alias("lo"),
                 F.round(F.max("p"), 4).alias("hi"),
                 F.round(F.sum("p"), 2).alias("total")))


@register(
    "benford_price_profile",
    """
    WITH digits AS (
        SELECT CAST(substr(CAST(CAST(FLOOR(l_extendedprice) AS BIGINT)
                                AS VARCHAR),
                           1, 1) AS BIGINT) AS d
        FROM lineitem WHERE l_extendedprice >= 1
    ),
    counts AS (
        SELECT d, CAST(COUNT(*) AS BIGINT) AS n FROM digits GROUP BY d
    ),
    tot AS (SELECT SUM(n) AS t FROM counts)
    SELECT d, n,
           ROUND(n::DOUBLE / t, 4) AS observed,
           ROUND(log10(1.0 + 1.0 / d), 4) AS benford_expected,
           ROUND(n::DOUBLE / t - log10(1.0 + 1.0 / d), 4) AS deviation
    FROM counts, tot
    """,
    doc="Benford first-digit profile of prices: observed leading-digit "
        "frequencies vs the log10(1+1/d) Benford expectation — the "
        "classic distributional screen for fabricated or truncated "
        "numeric columns. Digit extraction is a per-row string op, the "
        "profile is one 9-group aggregate, and the total joins back as "
        "a broadcast scalar: a pure map + tiny-agg plan at any scale.",
    tags=("X14", "X7", "X2"),
)
def benford_price_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    d = (li.filter(F.col("l_extendedprice") >= 1)
         .select(F.substring(F.floor("l_extendedprice")
                             .cast("string"), 1, 1).cast("long").alias("d")))
    counts = d.groupBy("d").agg(F.count("*").cast("long").alias("n"))
    tot = counts.agg(F.sum("n").alias("t"))
    expected = F.log10(1.0 + 1.0 / F.col("d"))
    return (counts.crossJoin(F.broadcast(tot))
            .select("d", "n",
                    F.round(F.col("n") / F.col("t"), 4).alias("observed"),
                    F.round(expected, 4).alias("benford_expected"),
                    F.round(F.col("n") / F.col("t") - expected, 4)
                    .alias("deviation")))


@register(
    "weighted_median_price",
    """
    WITH ordered AS (
        SELECT l_returnflag AS flag, l_extendedprice AS p,
               l_quantity AS w,
               SUM(l_quantity) OVER (
                   PARTITION BY l_returnflag
                   ORDER BY l_extendedprice, l_orderkey, l_linenumber
                   ROWS UNBOUNDED PRECEDING) AS cumw,
               SUM(l_quantity) OVER (PARTITION BY l_returnflag) AS totw
        FROM lineitem
    )
    SELECT flag,
           ROUND(MIN(p), 4) AS weighted_median,
           ROUND(MIN(totw), 2) AS total_weight
    FROM ordered WHERE cumw >= totw / 2
    GROUP BY flag
    """,
    doc="Quantity-weighted median price per return flag, computed as a "
        "bucketed two-pass crossing search. Pass 1: per-(flag, "
        "floor(price)) weight mass — a map-side-combinable aggregate; "
        "the running-sum window then runs over that tiny bucket table "
        "(|flags| x |price integers| rows, never the fact table) to "
        "locate the bucket where cumulative weight crosses half the "
        "total. Pass 2: only the crossing bucket's rows (1/|buckets| "
        "of the data) are sorted by (price, row id) with the bucket's "
        "base weight as offset; the first row crossing totw/2 is the "
        "median. l_quantity is integer-valued so every fp64 sum is "
        "exact and the crossing row matches the oracle's row-level "
        "cumsum bit-for-bit. Replaces a PARTITION BY l_returnflag "
        "running-sum window over the full table — 3 partitions means "
        "3 tasks sort everything at scale; here no full-table sort "
        "exists at any scale.",
    tags=("X11", "X7", "X12"),
)
def weighted_median_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    rows = li.select(F.col("l_returnflag").alias("flag"),
                     F.col("l_extendedprice").alias("p"),
                     F.col("l_quantity").alias("w"),
                     "l_orderkey", "l_linenumber",
                     F.floor("l_extendedprice").cast("long").alias("bucket"))
    # pass 1: bucket weight histogram (partial+final hash aggregate),
    # then locate the crossing bucket on the aggregated table
    bkt = rows.groupBy("flag", "bucket").agg(F.sum("w").alias("bw"))
    located = (bkt
               .withColumn("cum", F.sum("bw").over(
                   Window.partitionBy("flag").orderBy("bucket")
                   .rowsBetween(Window.unboundedPreceding,
                                Window.currentRow)))
               .withColumn("totw",
                           F.sum("bw").over(Window.partitionBy("flag"))))
    crossing = (located
                .filter((F.col("cum") >= F.col("totw") / 2)
                        & (F.col("cum") - F.col("bw") < F.col("totw") / 2))
                .select("flag", "bucket",
                        (F.col("cum") - F.col("bw")).alias("base"), "totw"))
    # pass 2: broadcast the (|flags|-row) crossing table; only rows in
    # the crossing bucket survive to the sort
    in_bucket = rows.join(F.broadcast(crossing), ["flag", "bucket"])
    cumw = F.col("base") + F.sum("w").over(
        Window.partitionBy("flag")
        .orderBy("p", "l_orderkey", "l_linenumber")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return (in_bucket.withColumn("cumw", cumw)
            .filter(F.col("cumw") >= F.col("totw") / 2)
            .groupBy("flag")
            .agg(F.round(F.min("p"), 4).alias("weighted_median"),
                 F.round(F.min("totw"), 2).alias("total_weight")))


GLOBAL_TOPK_N = 100


@register(
    "global_topk_orders",
    f"""
    SELECT o_orderkey, o_custkey, o_orderstatus,
           ROUND(o_totalprice, 2) AS total_price
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT {GLOBAL_TOPK_N}
    """,
    doc=f"Global top-{GLOBAL_TOPK_N} orders by value: the orderBy+limit "
        "shape Spark executes as TakeOrderedAndProject — every "
        "partition keeps an N-row heap and the driver merges P heaps, "
        "so a '100 TB table, top 100 rows' question moves P x N rows, "
        "never a global sort (plan-asserted in tests/test_plans.py). "
        "Full tiebreak (orderkey) makes the row SET deterministic "
        "cross-engine.",
    tags=("X12",),
)
def global_topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return (o.select("o_orderkey", "o_custkey", "o_orderstatus",
                     F.round("o_totalprice", 2).alias("total_price"))
            .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
            .limit(GLOBAL_TOPK_N))


SKYLINE_BUCKET_CENTS = 10_000  # $100 price buckets for the prefix pass


@register(
    "part_skyline",
    """
    WITH p AS (
        SELECT p_partkey, p_size,
               CAST(ROUND(p_retailprice * 100, 0) AS BIGINT) AS price_c,
               ROUND(p_retailprice, 2) AS price
        FROM part
    ),
    w AS (
        SELECT p_partkey, price, p_size, price_c,
               MAX(p_size) OVER (ORDER BY price_c
                                 RANGE BETWEEN UNBOUNDED PRECEDING
                                           AND 1 PRECEDING) AS m1,
               MAX(p_size) OVER (PARTITION BY price_c) AS m2
        FROM p
    )
    SELECT p_partkey, price, CAST(p_size AS BIGINT) AS p_size
    FROM w
    WHERE (m1 IS NULL OR p_size > m1) AND p_size = m2
    """,
    doc="X48 skyline / Pareto frontier: parts not dominated on "
        "(min price, max size). The ORACLE uses the textbook global "
        "range-frame window; the SPARK plan replaces the global sort "
        "with the two-pass bucket scheme — per-$100-bucket max sizes "
        "(tiny table, bounded by the price domain), an exclusive "
        "prefix-max over buckets, broadcast the carry back, then "
        "per-BUCKET windows for the strictly-cheaper and equal-price "
        "maxima. No window in the Spark plan partitions wider than one "
        "price bucket, so the shape survives any row count; the oracle "
        "equality proves the decomposition exact.",
    tags=("X48", "X11", "X12", "X7"),
)
def part_skyline(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = (load_table(spark, sf_dir, "part")
         .select("p_partkey", "p_size",
                 F.round(F.col("p_retailprice") * 100, 0).cast("long")
                 .alias("price_c"),
                 F.round("p_retailprice", 2).alias("price")))
    p = p.withColumn("bucket", F.expr(f"price_c DIV {SKYLINE_BUCKET_CENTS}"))
    bmax = (p.groupBy("bucket").agg(F.max("p_size").alias("bmax")))
    carry = bmax.select(
        "bucket",
        F.max("bmax").over(
            Window.orderBy("bucket")
            .rowsBetween(Window.unboundedPreceding, -1)).alias("carry"))
    wb = Window.partitionBy("bucket").orderBy("price_c")
    m1b = F.max("p_size").over(
        wb.rangeBetween(Window.unboundedPreceding, -1))
    m2 = F.max("p_size").over(Window.partitionBy("price_c"))
    w = (p.join(F.broadcast(carry), "bucket", "left")
         .withColumn("m1", F.greatest(m1b, F.col("carry")))
         .withColumn("m2", m2))
    return (w.filter((F.col("m1").isNull() | (F.col("p_size") > F.col("m1")))
                     & (F.col("p_size") == F.col("m2")))
            .select("p_partkey", "price",
                    F.col("p_size").cast("long").alias("p_size")))


@register(
    "grouped_ols_price_qty",
    """
    WITH s AS (
        SELECT p.p_brand AS brand,
               CAST(COUNT(*) AS BIGINT) AS n,
               SUM(l.l_quantity) AS sx,
               SUM(l.l_extendedprice) AS sy,
               SUM(l.l_quantity * l.l_extendedprice) AS sxy,
               SUM(l.l_quantity * l.l_quantity) AS sxx,
               SUM(l.l_extendedprice * l.l_extendedprice) AS syy
        FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        GROUP BY p.p_brand
    )
    SELECT brand, n,
           ROUND((n * sxy - sx * sy) / (n * sxx - sx * sx), 4) AS slope,
           ROUND(sy / n - ((n * sxy - sx * sy) / (n * sxx - sx * sx))
                 * sx / n, 4) AS intercept,
           ROUND((n * sxy - sx * sy) * (n * sxy - sx * sy)
                 / ((n * sxx - sx * sx) * (n * syy - sy * sy)), 4)
               AS r_squared
    FROM s
    """,
    doc="X60 in-engine ML training: per-brand ordinary-least-squares "
        "fit of extended price on quantity from ONE map-side-"
        "combinable moment aggregate (n, sums, cross-sums) — the "
        "closed-form normal equation needs no second pass and no "
        "gradient loop, the canonical 'train a model per group inside "
        "the warehouse' pattern. Slope/intercept/r^2 are single "
        "divisions of the folded moments, rounded post-division "
        "(moment dust ~1e-10 vs the 1e-4 grid).",
    tags=("X60", "X7", "X3"),
)
def grouped_ols_price_qty(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    j = (li.join(p, li["l_partkey"] == p["p_partkey"])
         .select(F.col("p_brand").alias("brand"),
                 F.col("l_quantity").alias("x"),
                 F.col("l_extendedprice").alias("y")))
    s = (j.groupBy("brand")
         .agg(F.count("*").cast("long").alias("n"),
              F.sum("x").alias("sx"), F.sum("y").alias("sy"),
              F.sum(F.col("x") * F.col("y")).alias("sxy"),
              F.sum(F.col("x") * F.col("x")).alias("sxx"),
              F.sum(F.col("y") * F.col("y")).alias("syy")))
    cov = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    varx = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    vary = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    slope = cov / varx
    return s.select(
        "brand", "n",
        F.round(slope, 4).alias("slope"),
        F.round(F.col("sy") / F.col("n")
                - slope * F.col("sx") / F.col("n"), 4).alias("intercept"),
        F.round(cov * cov / (varx * vary), 4).alias("r_squared"))


@register(
    "target_encoding_loo",
    """
    WITH g AS (
        SELECT l_returnflag AS category,
               CAST(COUNT(*) AS BIGINT) AS n,
               SUM(l_extendedprice) AS sy
        FROM lineitem GROUP BY l_returnflag
    ),
    enc AS (
        SELECT l.l_returnflag AS category,
               (g.sy - l.l_extendedprice) / (g.n - 1) AS loo
        FROM lineitem l JOIN g ON l.l_returnflag = g.category
        WHERE g.n > 1
    )
    SELECT category,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(AVG(loo), 4) AS loo_mean,
           ROUND(MIN(loo), 4) AS loo_min,
           ROUND(MAX(loo), 4) AS loo_max,
           ROUND(stddev_samp(loo), 4) AS loo_std
    FROM enc GROUP BY category
    """,
    doc="X64 leave-one-out target encoding (the leakage-safe "
        "categorical featurizer): each row's category encodes as the "
        "mean target of all OTHER rows in its category, "
        "(sum - y_i)/(n - 1). One group aggregate broadcasts back onto "
        "the fact scan (category cardinality bounded), so the encode "
        "pass is map-only — no window, no self-join. The summary "
        "verifies the identity avg(LOO) == group mean and pins the "
        "encoding spread.",
    tags=("X64", "X7", "X3"),
)
def target_encoding_loo(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    g = (li.groupBy(F.col("l_returnflag").alias("category"))
         .agg(F.count("*").cast("long").alias("n"),
              F.sum("l_extendedprice").alias("sy")))
    enc = (li.select(F.col("l_returnflag").alias("category"),
                     F.col("l_extendedprice").alias("y"))
           .join(F.broadcast(g), "category")
           .filter(F.col("n") > 1)
           .select("category",
                   ((F.col("sy") - F.col("y")) / (F.col("n") - 1))
                   .alias("loo")))
    return (enc.groupBy("category")
            .agg(F.count("*").cast("long").alias("n"),
                 F.round(F.avg("loo"), 4).alias("loo_mean"),
                 F.round(F.min("loo"), 4).alias("loo_min"),
                 F.round(F.max("loo"), 4).alias("loo_max"),
                 F.round(F.stddev_samp("loo"), 4).alias("loo_std")))


# --------------------------------------------------------------------------
# X80: Pearson correlation MATRIX of lineitem's numeric measures from
# ONE corpus aggregate. Moments accumulate as exact DECIMAL sums (the
# inputs are 2-decimal money/rate values, so every product is exactly
# representable and the sums are order-independent — no float-summation
# dust for the hash check to trip on); the 6 pairwise correlations fold
# from the single moment row, map-side combinable end to end.
# --------------------------------------------------------------------------
_CORR_COLS = ("l_quantity", "l_extendedprice", "l_discount", "l_tax")


def _corr_oracle_sql() -> str:
    cols = _CORR_COLS
    moments = ["CAST(COUNT(*) AS BIGINT) AS n"]
    for c in cols:
        moments.append(f"SUM(CAST({c} AS DECIMAL(18,2))) AS s_{c}")
        moments.append(f"SUM(CAST({c} AS DECIMAL(18,2))"
                       f" * CAST({c} AS DECIMAL(18,2))) AS q_{c}")
    pairs = []
    for i, a in enumerate(cols):
        for b in cols[i + 1:]:
            moments.append(f"SUM(CAST({a} AS DECIMAL(18,2))"
                           f" * CAST({b} AS DECIMAL(18,2))) AS x_{a}_{b}")
            pairs.append(
                f"SELECT '{a}' AS col_a, '{b}' AS col_b, n,\n"
                f"       ROUND((n * CAST(x_{a}_{b} AS DOUBLE)"
                f" - CAST(s_{a} AS DOUBLE) * CAST(s_{b} AS DOUBLE))\n"
                f"             / (SQRT(n * CAST(q_{a} AS DOUBLE)"
                f" - CAST(s_{a} AS DOUBLE) * CAST(s_{a} AS DOUBLE))\n"
                f"                * SQRT(n * CAST(q_{b} AS DOUBLE)"
                f" - CAST(s_{b} AS DOUBLE) * CAST(s_{b} AS DOUBLE))), 6)"
                f" AS corr\n"
                f"FROM m")
    return ("WITH m AS (SELECT " + ", ".join(moments) + " FROM lineitem)\n"
            + "\nUNION ALL\n".join(pairs))


@register(
    "lineitem_corr_matrix",
    _corr_oracle_sql(),
    doc="X80 Pearson correlation matrix (6 pairs over quantity, price, "
        "discount, tax) from ONE wide moment aggregate — count, 4 sums, "
        "4 sums of squares, 6 cross-products — accumulated as exact "
        "DECIMAL (2-decimal inputs make every product exactly "
        "representable, so the moments are order-independent and the "
        "correlations hash bit-for-bit cross-engine). The feature-"
        "redundancy screen a feature-store pipeline runs before "
        "training; never materializes a pairwise row fan-out.",
    tags=("X80", "X7", "X14"),
)
def lineitem_corr_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    cols = _CORR_COLS
    dec = {c: F.col(c).cast("decimal(18,2)") for c in cols}
    aggs = [F.count("*").cast("long").alias("n")]
    for c in cols:
        aggs.append(F.sum(dec[c]).alias(f"s_{c}"))
        aggs.append(F.sum(dec[c] * dec[c]).alias(f"q_{c}"))
    pairs = [(a, b) for i, a in enumerate(cols) for b in cols[i + 1:]]
    for a, b in pairs:
        aggs.append(F.sum(dec[a] * dec[b]).alias(f"x_{a}_{b}"))
    m = li.agg(*aggs)

    def corr(a: str, b: str) -> F.Column:
        n = F.col("n").cast("double")
        sa, sb = F.col(f"s_{a}").cast("double"), F.col(f"s_{b}").cast("double")
        qa, qb = F.col(f"q_{a}").cast("double"), F.col(f"q_{b}").cast("double")
        x = F.col(f"x_{a}_{b}").cast("double")
        return F.round((n * x - sa * sb)
                       / (F.sqrt(n * qa - sa * sa)
                          * F.sqrt(n * qb - sb * sb)), 6)

    rows = F.array(*[
        F.struct(F.lit(a).alias("col_a"), F.lit(b).alias("col_b"),
                 F.col("n").alias("n"), corr(a, b).alias("corr"))
        for a, b in pairs])
    return (m.select(F.explode(rows).alias("r"))
            .select(F.col("r.col_a").alias("col_a"),
                    F.col("r.col_b").alias("col_b"),
                    F.col("r.n").alias("n"),
                    F.col("r.corr").alias("corr")))


# --------------------------------------------------------------------------
# X81: k-fold cross-validation of the OLS price~quantity model WITHOUT
# k training passes: one (fold, moments) aggregate; each fold's
# training moments are total-minus-fold (moment subtraction), so train
# AND test statistics for all folds fold from a k-row table. Fold
# assignment is md5 of the row key — reproducible under any partitioning.
# --------------------------------------------------------------------------
CV_FOLDS = 5


@register(
    "ols_crossval_r2",
    f"""
    WITH rows_k AS (
        SELECT ('0x' || substr(md5(CAST(l_orderkey AS VARCHAR) || '-' ||
                                   CAST(l_linenumber AS VARCHAR)), 1, 15))
                   ::BIGINT % {CV_FOLDS} AS fold,
               l_quantity AS x, l_extendedprice AS y
        FROM lineitem
    ),
    fm AS (
        SELECT fold, CAST(COUNT(*) AS BIGINT) AS n,
               SUM(x) AS sx, SUM(y) AS sy, SUM(x * y) AS sxy,
               SUM(x * x) AS sxx, SUM(y * y) AS syy
        FROM rows_k GROUP BY fold
    ),
    tot AS (SELECT CAST(SUM(n) AS BIGINT) AS tn, SUM(sx) AS tsx,
                   SUM(sy) AS tsy, SUM(sxy) AS tsxy, SUM(sxx) AS tsxx,
                   SUM(syy) AS tsyy
            FROM fm),
    tr AS (
        SELECT fold, n AS n_test, tn - n AS n_train,
               tsx - sx AS rx, tsy - sy AS ry, tsxy - sxy AS rxy,
               tsxx - sxx AS rxx,
               n, sx, sy, sxy, sxx, syy
        FROM fm CROSS JOIN tot
    ),
    fit AS (
        SELECT fold, n_train, n_test, n, sx, sy, sxy, sxx, syy,
               (n_train * rxy - rx * ry) / (n_train * rxx - rx * rx) AS b,
               ry / n_train - ((n_train * rxy - rx * ry)
                               / (n_train * rxx - rx * rx)) * rx / n_train
                   AS a
        FROM tr
    )
    SELECT fold, n_train, n_test,
           ROUND(b, 4) AS slope, ROUND(a, 4) AS intercept,
           ROUND(1 - (syy - 2 * b * sxy - 2 * a * sy + b * b * sxx
                      + 2 * a * b * sx + n * a * a)
                     / (syy - sy * sy / n), 4) AS r2_test
    FROM fit
    """,
    doc=f"X81 {CV_FOLDS}-fold cross-validated OLS (price ~ quantity) "
        "with ONE corpus pass: per-fold moment aggregates; each fold "
        "trains on total-minus-fold moments (moment subtraction — no "
        "second scan, no per-fold job) and evaluates held-out R^2 from "
        "its own moments. md5 fold assignment is stable under "
        "repartitioning and engines. The generalization-gap check that "
        "catches 'the model only fits its own fold' before anything "
        "ships; out-of-sample R^2 here hovers near 0 because the "
        "synthetic prices are independent of quantity (the honest "
        "answer).",
    tags=("X81", "X60", "X7", "X28"),
)
def ols_crossval_r2(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    fold = (F.conv(F.substring(F.md5(F.concat_ws(
        "-", F.col("l_orderkey").cast("string"),
        F.col("l_linenumber").cast("string"))), 1, 15), 16, 10)
        .cast("long") % CV_FOLDS)
    r = li.select(fold.alias("fold"),
                  F.col("l_quantity").alias("x"),
                  F.col("l_extendedprice").alias("y"))
    fm = (r.groupBy("fold")
          .agg(F.count("*").cast("long").alias("n"),
               F.sum("x").alias("sx"), F.sum("y").alias("sy"),
               F.sum(F.col("x") * F.col("y")).alias("sxy"),
               F.sum(F.col("x") * F.col("x")).alias("sxx"),
               F.sum(F.col("y") * F.col("y")).alias("syy")))
    from ..caching import persist_tracked
    fm = persist_tracked(fm)
    tot = fm.agg(F.sum("n").cast("long").alias("tn"),
                 F.sum("sx").alias("tsx"), F.sum("sy").alias("tsy"),
                 F.sum("sxy").alias("tsxy"), F.sum("sxx").alias("tsxx"),
                 F.sum("syy").alias("tsyy"))
    t = fm.crossJoin(F.broadcast(tot))
    n_tr = (F.col("tn") - F.col("n")).alias("n_train")
    rx = F.col("tsx") - F.col("sx")
    ry = F.col("tsy") - F.col("sy")
    rxy = F.col("tsxy") - F.col("sxy")
    rxx = F.col("tsxx") - F.col("sxx")
    ntr = F.col("tn") - F.col("n")
    b = (ntr * rxy - rx * ry) / (ntr * rxx - rx * rx)
    a = ry / ntr - b * rx / ntr
    sse = (F.col("syy") - 2 * b * F.col("sxy") - 2 * a * F.col("sy")
           + b * b * F.col("sxx") + 2 * a * b * F.col("sx")
           + F.col("n") * a * a)
    sst = F.col("syy") - F.col("sy") * F.col("sy") / F.col("n")
    return t.select(
        "fold", n_tr.cast("long"), F.col("n").alias("n_test"),
        F.round(b, 4).alias("slope"), F.round(a, 4).alias("intercept"),
        F.round(1 - sse / sst, 4).alias("r2_test"))


# --------------------------------------------------------------------------
# X88: Pareto contribution cut — the smallest set of parts covering 80%
# of revenue. The corpus pass is one part-keyed aggregate; the global
# cumulative-share window runs on the PART-cardinality revenue table
# (bounded by the part domain, not the fact volume), the same
# bounded-window argument as the daily-table detectors.
# --------------------------------------------------------------------------
PARETO_TARGET = 0.80


@register(
    "pareto_revenue_cut",
    f"""
    WITH rev AS (
        -- cast the EXACT 2-decimal inputs to DECIMAL before the
        -- multiply: casting the double product instead hits engine
        -- rounding-mode differences on half-way cents
        SELECT l_partkey,
               SUM(l_extendedprice::DECIMAL(12,2)
                   * (1 - l_discount::DECIMAL(4,2))) AS r
        FROM lineitem GROUP BY l_partkey
    ),
    ranked AS (
        SELECT l_partkey, CAST(r AS DOUBLE) AS revenue,
               -- round in the exact DECIMAL domain: ROUND(double, 2)
               -- breaks half-cent ties differently across engines
               CAST(ROUND(r, 2) AS DOUBLE) AS revenue_out,
               SUM(CAST(r AS DOUBLE)) OVER (ORDER BY r DESC, l_partkey)
                   AS cum,
               SUM(CAST(r AS DOUBLE)) OVER () AS tot,
               CAST(ROW_NUMBER() OVER (ORDER BY r DESC, l_partkey)
                    AS BIGINT) AS rnk
        FROM rev
    )
    SELECT l_partkey, rnk, revenue_out AS revenue,
           ROUND(cum / tot, 6) AS cum_share
    FROM ranked
    WHERE cum - revenue < tot * {PARETO_TARGET}
    """,
    doc=f"X88 Pareto 80/20 cut: the minimal prefix of parts (by "
        "discounted revenue) whose cumulative share reaches "
        f"{PARETO_TARGET:.0%}. Per-part revenue folds as exact DECIMAL "
        "(money sums over thousands of groups flip ROUND otherwise); "
        "the cumulative window runs on the part-cardinality table. A "
        "row is kept while the share BEFORE it is under the target, "
        "which is exactly the minimal covering prefix. The "
        "concentration query behind assortment and storage-tiering "
        "decisions.",
    tags=("X88", "X11", "X12", "X7"),
)
def pareto_revenue_cut(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    price = F.col("l_extendedprice").cast("decimal(12,2)")
    disc = F.col("l_discount").cast("decimal(4,2)")
    rev = (li.groupBy("l_partkey")
           .agg(F.sum(price * (F.lit(1) - disc)).alias("r")))
    wd = Window.orderBy(F.desc("r"), F.asc("l_partkey"))
    cum = Window.orderBy(F.desc("r"), F.asc("l_partkey")) \
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ranked = rev.select(
        "l_partkey", F.col("r").cast("double").alias("revenue"),
        # round in the exact DECIMAL domain, then cast (half-cent ties)
        F.round(F.col("r"), 2).cast("double").alias("revenue_out"),
        F.sum(F.col("r").cast("double")).over(cum).alias("cum"),
        F.sum(F.col("r").cast("double")).over(
            Window.partitionBy()).alias("tot"),
        F.row_number().over(wd).cast("long").alias("rnk"))
    return (ranked
            .filter(F.col("cum") - F.col("revenue")
                    < F.col("tot") * PARETO_TARGET)
            .select("l_partkey", "rnk",
                    F.col("revenue_out").alias("revenue"),
                    F.round(F.col("cum") / F.col("tot"), 6)
                    .alias("cum_share")))


# --------------------------------------------------------------------------
# X93: trending ranking under exponential time decay — "what is hot
# NOW", the leaderboard variant where yesterday counts 0.9x as much.
# The corpus pass is one (part, order-day) aggregate; decay weights
# apply per (part, day) row (day-cardinality, not order-cardinality)
# and snap to an integer micro grid, so the per-part fold is exact
# BIGINT math regardless of partial-sum order.
# --------------------------------------------------------------------------
TREND_DECAY = 0.9
TREND_TOPK = 20


@register(
    "trending_parts_decay",
    f"""
    WITH pd AS (
        SELECT l.l_partkey,
               (CAST(MAX(o.o_orderdate) OVER () AS DATE)
                - CAST(o.o_orderdate AS DATE)) AS age_days,
               l.l_orderkey
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    ),
    counts AS (
        SELECT l_partkey, age_days, CAST(COUNT(*) AS BIGINT) AS cnt
        FROM pd GROUP BY l_partkey, age_days
    ),
    scored AS (
        SELECT l_partkey,
               CAST(SUM(cnt) AS BIGINT) AS n_lines,
               CAST(SUM(cnt * CAST(ROUND(POWER({TREND_DECAY}, age_days)
                                         * 1000000) AS BIGINT))
                    AS BIGINT) AS score_micro
        FROM counts GROUP BY l_partkey
    )
    SELECT l_partkey, n_lines,
           ROUND(score_micro / 1000000.0, 4) AS decayed_score
    FROM scored
    ORDER BY score_micro DESC, l_partkey
    LIMIT {TREND_TOPK}
    """,
    doc=f"X93 trending parts under exponential decay ({TREND_DECAY}/day "
        "relative to the newest order date): one (part, age) aggregate, "
        "decay weights snapped to an integer micro grid on the "
        "day-cardinality rows, per-part folds in exact BIGINT — "
        "partial-sum order cannot move the ranking. Deterministic "
        f"top-{TREND_TOPK}. The freshness-weighted leaderboard every "
        "recommendation home page runs.",
    tags=("X93", "X7", "X12", "X3"),
)
def trending_parts_decay(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", F.col("o_orderdate").cast("date").alias("od"))
    j = li.join(orders, li.l_orderkey == orders.o_orderkey)
    mx = j.agg(F.max("od").alias("mx"))
    counts = (j.crossJoin(F.broadcast(mx))
              .select("l_partkey", F.datediff("mx", "od").alias("age_days"))
              .groupBy("l_partkey", "age_days")
              .agg(F.count("*").alias("cnt")))
    w_micro = F.round(F.pow(F.lit(TREND_DECAY), F.col("age_days")) * 1e6,
                      0).cast("long")
    scored = (counts.groupBy("l_partkey")
              .agg(F.sum("cnt").cast("long").alias("n_lines"),
                   F.sum(F.col("cnt") * w_micro).cast("long")
                   .alias("score_micro")))
    return (scored
            .orderBy(F.desc("score_micro"), F.asc("l_partkey"))
            .limit(TREND_TOPK)
            .select("l_partkey", "n_lines",
                    F.round(F.col("score_micro") / 1e6, 4)
                    .alias("decayed_score")))


# --------------------------------------------------------------------------
# X98: RFM customer segmentation — the standard CRM scoring: Recency /
# Frequency / Monetary per customer, FIXED-threshold scores (a global
# ntile would serialize the corpus through one partition; fixed cutoffs
# are map-side and stable as data grows), then a segment rollup. One
# orders scan -> customer-keyed aggregate; the reference date is the
# corpus max order date (one scalar aggregate, broadcast).
# --------------------------------------------------------------------------
RFM_R_DAYS = (180, 540)      # recency <= 180d -> 3, <= 540d -> 2, else 1
RFM_F_ORDERS = (12, 6)       # frequency >= 12 -> 3, >= 6 -> 2, else 1
RFM_M_TOTAL = (600000, 200000)  # monetary >= cutoffs, same ladder


@register(
    "rfm_segments",
    f"""
    WITH ref AS (SELECT MAX(o_orderdate) AS ref_d FROM orders),
    cust AS (
        SELECT o_custkey,
               date_diff('day', MAX(o_orderdate), ref.ref_d) AS rec_days,
               CAST(COUNT(*) AS BIGINT) AS freq,
               SUM(o_totalprice::DECIMAL(12,2)) AS mon
        FROM orders CROSS JOIN ref
        GROUP BY o_custkey, ref.ref_d
    ),
    scored AS (
        SELECT o_custkey, rec_days, freq, mon,
               CASE WHEN rec_days <= {RFM_R_DAYS[0]} THEN 3
                    WHEN rec_days <= {RFM_R_DAYS[1]} THEN 2
                    ELSE 1 END AS r_score,
               CASE WHEN freq >= {RFM_F_ORDERS[0]} THEN 3
                    WHEN freq >= {RFM_F_ORDERS[1]} THEN 2
                    ELSE 1 END AS f_score,
               CASE WHEN mon >= {RFM_M_TOTAL[0]} THEN 3
                    WHEN mon >= {RFM_M_TOTAL[1]} THEN 2
                    ELSE 1 END AS m_score
        FROM cust
    )
    SELECT CAST(r_score AS BIGINT) AS r_score,
           CAST(f_score AS BIGINT) AS f_score,
           CAST(m_score AS BIGINT) AS m_score,
           CASE WHEN r_score = 3 AND f_score = 3 AND m_score = 3
                    THEN 'champion'
                WHEN r_score = 1 AND f_score <= 2 AND m_score <= 2
                    THEN 'hibernating'
                WHEN r_score = 1 THEN 'at_risk'
                WHEN f_score = 3 THEN 'loyal'
                WHEN m_score = 3 THEN 'big_spender'
                ELSE 'regular' END AS segment,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           ROUND(AVG(rec_days), 4) AS avg_recency_days,
           ROUND(AVG(freq), 4) AS avg_frequency,
           CAST(ROUND(SUM(mon), 2) AS DOUBLE) AS total_monetary
    FROM scored
    GROUP BY 1, 2, 3, 4
    """,
    doc="X98 RFM customer segmentation: per-customer recency/frequency/"
        "monetary from one orders scan, fixed-cutoff 1-3 scores (never "
        "a global ntile — cutoffs are map-side and rank-stable at any "
        "scale), business segment labels, then a bounded 27-cell "
        "rollup. Money folds as exact DECIMAL and rounds in the "
        "DECIMAL domain; recency is exact integer day arithmetic "
        "against the corpus max order date (one broadcast scalar).",
    tags=("X98", "X7", "X14", "X2"),
)
def rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    ref = o.agg(F.max("o_orderdate").alias("ref_d"))
    cust = (o.crossJoin(F.broadcast(ref))
            .groupBy("o_custkey", "ref_d")
            .agg(F.datediff(F.first("ref_d"), F.max("o_orderdate"))
                 .alias("rec_days"),
                 F.count("*").cast("long").alias("freq"),
                 F.sum(F.col("o_totalprice").cast("decimal(12,2)"))
                 .alias("mon")))
    scored = cust.select(
        "rec_days", "freq", "mon",
        F.when(F.col("rec_days") <= RFM_R_DAYS[0], 3)
        .when(F.col("rec_days") <= RFM_R_DAYS[1], 2)
        .otherwise(1).alias("r_score"),
        F.when(F.col("freq") >= RFM_F_ORDERS[0], 3)
        .when(F.col("freq") >= RFM_F_ORDERS[1], 2)
        .otherwise(1).alias("f_score"),
        F.when(F.col("mon") >= RFM_M_TOTAL[0], 3)
        .when(F.col("mon") >= RFM_M_TOTAL[1], 2)
        .otherwise(1).alias("m_score"))
    seg = (F.when((F.col("r_score") == 3) & (F.col("f_score") == 3)
                  & (F.col("m_score") == 3), "champion")
           .when((F.col("r_score") == 1) & (F.col("f_score") <= 2)
                 & (F.col("m_score") <= 2), "hibernating")
           .when(F.col("r_score") == 1, "at_risk")
           .when(F.col("f_score") == 3, "loyal")
           .when(F.col("m_score") == 3, "big_spender")
           .otherwise("regular"))
    return (scored
            .groupBy(F.col("r_score").cast("long").alias("r_score"),
                     F.col("f_score").cast("long").alias("f_score"),
                     F.col("m_score").cast("long").alias("m_score"),
                     seg.alias("segment"))
            .agg(F.count("*").cast("long").alias("n_customers"),
                 F.round(F.avg("rec_days"), 4).alias("avg_recency_days"),
                 F.round(F.avg("freq"), 4).alias("avg_frequency"),
                 F.round(F.sum("mon"), 2).cast("double")
                 .alias("total_monetary")))


# --------------------------------------------------------------------------
# X102: mutual-information feature scoring — "which categorical
# features predict the label", the feature-selection/information-gain
# primitive. MI(X;Y) = sum_xy c_xy * [log2(c_xy) + log2(N) - log2(c_x)
# - log2(c_y)] / N. Every log takes an INTEGER count and snaps to the
# 1e-6-bit grid; each cell's contribution is then a BIGINT product
# (count x micro-bits), so the per-feature fold is EXACT integer
# summation in any order — the one float op is the final division.
# One orders scan builds all (feature, value, label) cells via an
# inline unpivot; marginals derive from the cell table, never a
# second scan.
# --------------------------------------------------------------------------
MI_LABEL_PRICE = 150000  # label: high-value order


@register(
    "mutual_information_features",
    f"""
    WITH base AS (
        SELECT CASE WHEN o_totalprice >= {MI_LABEL_PRICE} THEN 1 ELSE 0 END
                   AS y,
               o_orderstatus, o_orderpriority,
               CAST(EXTRACT(year FROM o_orderdate) AS VARCHAR) AS oyear
        FROM orders
    ),
    unpv AS (
        SELECT 'order_status' AS feature, o_orderstatus AS val, y FROM base
        UNION ALL
        SELECT 'order_priority', o_orderpriority, y FROM base
        UNION ALL
        SELECT 'order_year', oyear, y FROM base
    ),
    cells AS (
        SELECT feature, val, y, CAST(COUNT(*) AS BIGINT) AS c
        FROM unpv GROUP BY feature, val, y
    ),
    mx AS (SELECT feature, val, CAST(SUM(c) AS BIGINT) AS cx
           FROM cells GROUP BY feature, val),
    my AS (SELECT feature, y, CAST(SUM(c) AS BIGINT) AS cy
           FROM cells GROUP BY feature, y),
    n AS (SELECT feature, CAST(SUM(c) AS BIGINT) AS nn
          FROM cells GROUP BY feature),
    terms AS (
        SELECT cells.feature,
               cells.c * (ROUND(log2(cells.c) * 1e6, 0)::BIGINT
                          + ROUND(log2(n.nn) * 1e6, 0)::BIGINT
                          - ROUND(log2(mx.cx) * 1e6, 0)::BIGINT
                          - ROUND(log2(my.cy) * 1e6, 0)::BIGINT) AS t,
               n.nn
        FROM cells
        JOIN mx ON mx.feature = cells.feature AND mx.val = cells.val
        JOIN my ON my.feature = cells.feature AND my.y = cells.y
        JOIN n ON n.feature = cells.feature
    )
    SELECT feature,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM mx
            WHERE mx.feature = terms.feature) AS n_values,
           ROUND(CAST(SUM(t) AS BIGINT)::DOUBLE / (1000000.0 * nn), 6)
               AS mi_bits
    FROM terms GROUP BY feature, nn
    """,
    doc="X102 mutual information between categorical order features "
        "(status, priority, order year) and the high-value label "
        f"(totalprice >= {MI_LABEL_PRICE}): the feature-selection "
        "score sheet. One scan unpivots to (feature, value, label) "
        "cells; marginals and totals fold FROM the cell table; each "
        "cell contributes count x micro-grid-log2 bits as an exact "
        "BIGINT, so partial-sum order cannot perturb the result. "
        "Cell cardinality is feature-bounded — every post-scan frame "
        "is tiny at any corpus scale.",
    tags=("X102", "X7", "X14", "X18"),
)
def mutual_information_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    base = o.select(
        (F.col("o_totalprice") >= MI_LABEL_PRICE).cast("int").alias("y"),
        "o_orderstatus", "o_orderpriority",
        F.year("o_orderdate").cast("string").alias("oyear"))
    unpv = base.select(F.expr(
        "stack(3, 'order_status', o_orderstatus, y, "
        "'order_priority', o_orderpriority, y, "
        "'order_year', oyear, y) AS (feature, val, y)"))
    cells = (unpv.groupBy("feature", "val", "y")
             .agg(F.count("*").cast("long").alias("c")))
    mx = cells.groupBy("feature", "val").agg(
        F.sum("c").cast("long").alias("cx"))
    my = cells.groupBy("feature", "y").agg(
        F.sum("c").cast("long").alias("cy"))
    n = cells.groupBy("feature").agg(F.sum("c").cast("long").alias("nn"))
    nv = mx.groupBy("feature").agg(F.count("*").cast("long")
                                   .alias("n_values"))

    def micro(c):
        return F.round(F.log2(c) * 1e6, 0).cast("long")

    terms = (cells
             .join(mx, ["feature", "val"])
             .join(my, ["feature", "y"])
             .join(n, "feature")
             .select("feature", "nn",
                     (F.col("c") * (micro(F.col("c")) + micro(F.col("nn"))
                                    - micro(F.col("cx"))
                                    - micro(F.col("cy")))).alias("t")))
    return (terms.groupBy("feature", "nn")
            .agg(F.sum("t").cast("long").alias("st"))
            .join(nv, "feature")
            .select("feature", "n_values",
                    F.round(F.col("st").cast("double")
                            / (F.lit(1000000.0) * F.col("nn")), 6)
                    .alias("mi_bits")))


# --------------------------------------------------------------------------
# X103: Poisson bootstrap CI for the mean — the distributed bootstrap:
# instead of resampling rows (impossible without a global index), each
# row draws a Poisson(1) weight per replicate, so every replicate is
# one weighted map-side-combinable aggregate. ONE md5 per row yields a
# 60-bit integer; each replicate then applies its own 4-round Feistel
# permutation (30-bit halves, xor + odd-multiplier round function,
# Python-seeded round keys) — a BIJECTION on [0, 2^60), so every
# replicate uniform is EXACTLY uniform, with only portable integer
# ops (DIV, %, *, xor) both engines execute identically. Weights are
# integer-threshold lookups against the precomputed Poisson CDF in
# 2^60 units. (The first cut md5-hashed every (row, replicate) pair:
# 21 s at sf0.1 — hashing, not aggregation, was the entire cost.)
# --------------------------------------------------------------------------
BOOT_B = 64
_FEISTEL_M = 1 << 30
# P(Poisson(1) <= k), k = 0..8, scaled by 2^60.
_POIS_TH = (424136118829305344, 848272237658610688, 1060340297073263360,
            1131029650211480960, 1148701988496035328, 1152236456152946176,
            1152825534095764608, 1152909688087595776, 1152920207336574720)


def _boot_keys() -> list[tuple[int, ...]]:
    """Per-replicate Feistel round keys: 4 x (30-bit key, odd 30-bit
    multiplier), deterministic seed."""
    import random
    rng = random.Random(0xFE157E1)
    out = []
    for _ in range(BOOT_B):
        ks = []
        for _ in range(4):
            ks.append(rng.randrange(0, _FEISTEL_M))
            ks.append(rng.randrange(0, _FEISTEL_M) | 1)
        out.append(tuple(ks))
    return out


def _boot_oracle_sql() -> str:
    coef_vals = ",\n        ".join(
        "({}, {})".format(b, ", ".join(str(k) for k in ks))
        for b, ks in enumerate(_boot_keys()))
    # unrolled 4-round Feistel on (l, r), DuckDB side
    rounds = ""
    keys = ", ".join(f"k{j}, m{j}" for j in range(1, 5))
    for i in range(1, 5):
        li, ri = f"l{i - 1}", f"r{i - 1}"
        rounds += (f", f{i} AS (SELECT b, price, {keys}, {ri} AS l{i}, "
                   f"xor({li}, (xor({ri}, k{i}) * m{i}) % {_FEISTEL_M}) "
                   f"AS r{i} FROM f{i - 1})")
    w_expr = "(" + " + ".join(
        f"CASE WHEN u >= {t} THEN 1 ELSE 0 END" for t in _POIS_TH) + ")"
    return f"""
    WITH base AS (
        SELECT o_totalprice::DECIMAL(12,2) AS price,
               ('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 15))
                   ::BIGINT AS h
        FROM orders
    ),
    coef(b, k1, m1, k2, m2, k3, m3, k4, m4) AS (VALUES
        {coef_vals}
    ),
    f0 AS (
        SELECT coef.*, base.price,
               base.h // {_FEISTEL_M} AS l0, base.h % {_FEISTEL_M} AS r0
        FROM base CROSS JOIN coef
    ){rounds},
    uu AS (SELECT b, price, l4 * {_FEISTEL_M} + r4 AS u FROM f4),
    means AS (
        SELECT b,
               CAST(SUM({w_expr}) AS BIGINT) AS n_eff,
               SUM({w_expr} * price) AS wp
        FROM uu GROUP BY b
    ),
    ranked AS (
        SELECT b, n_eff, wp::DOUBLE / n_eff AS m,
               ROW_NUMBER() OVER (ORDER BY wp::DOUBLE / n_eff, b) AS rn
        FROM means
    ),
    point AS (
        SELECT SUM(o_totalprice::DECIMAL(12,2)) AS s,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM orders
    )
    SELECT CAST({BOOT_B} AS BIGINT) AS n_replicates,
           point.n AS n_rows,
           ROUND(point.s::DOUBLE / point.n, 4) AS point_mean,
           ROUND((SELECT m FROM ranked WHERE rn = 2), 4) AS boot_ci_lo,
           ROUND((SELECT m FROM ranked WHERE rn = {BOOT_B - 1}), 4)
               AS boot_ci_hi
    FROM point
    """


@register(
    "bootstrap_ci_mean",
    _boot_oracle_sql(),
    doc=f"X103 Poisson-bootstrap ({BOOT_B} replicates) percentile CI "
        "for the mean order price: one md5 per row; each replicate "
        "derives its uniform via a 4-round Feistel permutation of the "
        "60-bit hash (a bijection -> exactly uniform marginals, pure "
        "portable integer ops), weights are Poisson-CDF threshold "
        "lookups, and replicates fold in one 64-group aggregate over "
        "a map-only explode of light integer rows. The ~2.5%/97.5% CI "
        "is the 2nd/63rd order statistic of replicate means. The "
        "resampling-without-an-index pattern that makes bootstrap "
        "feasible on sharded corpora.",
    tags=("X103", "X7", "X24", "X28"),
)
def bootstrap_ci_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    o = _t(spark, sf_dir, "orders")
    h = (F.conv(F.substring(F.md5(F.col("o_orderkey").cast("string")),
                            1, 15), 16, 10).cast("long"))
    coef = spark.createDataFrame(
        [(b,) + ks for b, ks in enumerate(_boot_keys())],
        "b long, k1 long, m1 long, k2 long, m2 long, "
        "k3 long, m3 long, k4 long, m4 long")
    rep = (o.select(F.col("o_totalprice").cast("decimal(12,2)")
                    .alias("price"), h.alias("h"))
           .select("price",
                   F.expr(f"h DIV {_FEISTEL_M}").alias("l"),
                   (F.col("h") % _FEISTEL_M).alias("r"),
                   F.explode(F.sequence(F.lit(0), F.lit(BOOT_B - 1)))
                   .alias("b"))
           .join(F.broadcast(coef), "b"))
    for i in range(1, 5):
        rep = rep.select(
            "b", "price", "k1", "m1", "k2", "m2", "k3", "m3", "k4", "m4",
            F.col("r").alias("l"),
            F.expr(f"l ^ ((r ^ k{i}) * m{i}) % {_FEISTEL_M}").alias("r"))
    u = F.col("l") * _FEISTEL_M + F.col("r")
    w = None
    for t in _POIS_TH:
        term = (u >= F.lit(t)).cast("int")
        w = term if w is None else w + term
    means = (rep.select("b", "price", w.alias("w"))
             .groupBy("b")
             .agg(F.sum("w").cast("long").alias("n_eff"),
                  F.sum(F.col("w") * F.col("price")).alias("wp")))
    ranked = means.select(
        "b", "n_eff",
        (F.col("wp").cast("double") / F.col("n_eff")).alias("m"))
    ranked = ranked.withColumn(
        "rn", F.row_number().over(Window.orderBy(F.asc("m"), F.asc("b"))))
    lo = ranked.filter(F.col("rn") == 2).select(
        F.round("m", 4).alias("boot_ci_lo"))
    hi = ranked.filter(F.col("rn") == BOOT_B - 1).select(
        F.round("m", 4).alias("boot_ci_hi"))
    point = o.agg(
        F.sum(F.col("o_totalprice").cast("decimal(12,2)")).alias("s"),
        F.count("*").cast("long").alias("n"))
    return (point.crossJoin(lo).crossJoin(hi)
            .select(F.lit(BOOT_B).cast("long").alias("n_replicates"),
                    F.col("n").alias("n_rows"),
                    F.round(F.col("s").cast("double") / F.col("n"), 4)
                    .alias("point_mean"),
                    "boot_ci_lo", "boot_ci_hi"))


# --------------------------------------------------------------------------
# X110: weight-of-evidence (WOE) binning + information value — the
# credit-risk featurization standard: bin a numeric driver, score each
# bin by ln(P(bin|good)/P(bin|bad)), and grade the whole feature by
# IV = sum (P(g)-P(b)) * WOE. Bins are FIXED-width (map-side, rank-
# stable at any scale); every log argument is an integer count on the
# 1e-6-bit grid; the IV numerator folds as exact BIGINT products
# (g_b*B - b_b*G) * woe_micro, so partial-sum order cannot move it.
# --------------------------------------------------------------------------
WOE_BIN_WIDTH = 25000  # o_totalprice bin width


@register(
    "woe_price_bins",
    f"""
    WITH base AS (
        SELECT CAST(FLOOR(o_totalprice / {WOE_BIN_WIDTH}) AS BIGINT)
                   AS bin,
               CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS bad
        FROM orders
    ),
    cells AS (
        SELECT bin,
               CAST(SUM(1 - bad) AS BIGINT) AS n_good,
               CAST(SUM(bad) AS BIGINT) AS n_bad
        FROM base GROUP BY bin
    ),
    tot AS (SELECT CAST(SUM(n_good) AS BIGINT) AS g,
                   CAST(SUM(n_bad) AS BIGINT) AS b FROM cells),
    woe AS (
        SELECT c.bin, c.n_good, c.n_bad,
               -- ln(g_b/G / (b_b/B)) in micro-nats from integer args;
               -- add-one smoothing keeps empty cells finite
               (ROUND(ln(c.n_good + 1) * 1e6, 0)::BIGINT
                - ROUND(ln(t.g + 1) * 1e6, 0)::BIGINT
                - ROUND(ln(c.n_bad + 1) * 1e6, 0)::BIGINT
                + ROUND(ln(t.b + 1) * 1e6, 0)::BIGINT) AS woe_micro,
               t.g, t.b
        FROM cells c CROSS JOIN tot t
    )
    SELECT bin, n_good, n_bad,
           ROUND(woe_micro / 1000000.0, 6) AS woe,
           ROUND(SUM((n_good * b - n_bad * g) * woe_micro) OVER ()
                 ::DOUBLE / (g::DOUBLE * b * 1000000.0), 6)
               AS feature_iv
    FROM woe
    """,
    doc=f"X110 weight-of-evidence binning of order price (fixed "
        f"{WOE_BIN_WIDTH}-wide bins) against the finished-status "
        "label, plus the feature-level information value. WOE log "
        "terms take integer counts on the 1e-6-nat grid (add-one "
        "smoothed); the IV sum folds exact BIGINT products and "
        "normalizes once. All post-scan frames are bin-cardinality; "
        "the scoring table a risk/segmentation pipeline joins back "
        "map-only.",
    tags=("X110", "X7", "X14", "X102"),
)
def woe_price_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    o = _t(spark, sf_dir, "orders")
    base = o.select(
        F.floor(F.col("o_totalprice") / WOE_BIN_WIDTH).cast("long")
        .alias("bin"),
        (F.col("o_orderstatus") == "F").cast("int").alias("bad"))
    cells = (base.groupBy("bin")
             .agg(F.sum(F.lit(1) - F.col("bad")).cast("long")
                  .alias("n_good"),
                  F.sum("bad").cast("long").alias("n_bad")))
    tot = cells.agg(F.sum("n_good").cast("long").alias("g"),
                    F.sum("n_bad").cast("long").alias("b"))

    def micro_ln(c):
        return F.round(F.log(c) * 1e6, 0).cast("long")

    woe = (cells.crossJoin(F.broadcast(tot))
           .select("bin", "n_good", "n_bad", "g", "b",
                   (micro_ln(F.col("n_good") + 1) - micro_ln(F.col("g") + 1)
                    - micro_ln(F.col("n_bad") + 1)
                    + micro_ln(F.col("b") + 1)).alias("woe_micro")))
    w_all = Window.partitionBy()
    return woe.select(
        "bin", "n_good", "n_bad",
        F.round(F.col("woe_micro") / F.lit(1000000.0), 6).alias("woe"),
        F.round(F.sum((F.col("n_good") * F.col("b")
                       - F.col("n_bad") * F.col("g"))
                      * F.col("woe_micro")).over(w_all).cast("double")
                / (F.col("g").cast("double") * F.col("b")
                   * F.lit(1000000.0)), 6).alias("feature_iv"))


# --------------------------------------------------------------------------
# X115: ALS collaborative filtering, one exact half-step — the
# recommender-system training shape: with item factors fixed, every
# user's factor vector is an independent closed-form ridge solve from
# that user's ratings. Item factors are md5-derived small INTEGERS, so
# the per-user normal equations (A = sum v v^T + lambda I, b = sum
# r v) fold as exact BIGINT sums in ONE user-keyed aggregate; the 2x2
# Cramer solve is two divisions of exact integers. The full ALS loop
# is this query alternated user/item — each half-step identical in
# shape, each embarrassingly parallel over the solved side.
# --------------------------------------------------------------------------
ALS_LAMBDA = 1


def _als_factor_sql(tag: str, col: str) -> str:
    return (f"((('0x' || substr(md5('{tag}:' || CAST({col} AS VARCHAR)), "
            f"1, 15))::BIGINT % 9) - 4)")


@register(
    "als_user_factors",
    f"""
    WITH ratings AS (
        SELECT o.o_custkey AS u, l.l_partkey AS p,
               CAST(SUM(l.l_quantity) AS BIGINT) AS r
        FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
        GROUP BY o.o_custkey, l.l_partkey
    ),
    rv AS (
        SELECT u, r,
               {_als_factor_sql('als1', 'p')} AS v1,
               {_als_factor_sql('als2', 'p')} AS v2
        FROM ratings
    ),
    norm AS (
        SELECT u,
               CAST(COUNT(*) AS BIGINT) AS n_items,
               CAST(SUM(v1 * v1) AS BIGINT) + {ALS_LAMBDA} AS a11,
               CAST(SUM(v1 * v2) AS BIGINT) AS a12,
               CAST(SUM(v2 * v2) AS BIGINT) + {ALS_LAMBDA} AS a22,
               CAST(SUM(r * v1) AS BIGINT) AS b1,
               CAST(SUM(r * v2) AS BIGINT) AS b2
        FROM rv GROUP BY u
    )
    SELECT u AS custkey, n_items,
           ROUND((b1 * a22 - b2 * a12)::DOUBLE
                 / (a11 * a22 - a12 * a12), 6) AS u1,
           ROUND((b2 * a11 - b1 * a12)::DOUBLE
                 / (a11 * a22 - a12 * a12), 6) AS u2
    FROM norm
    """,
    doc=f"X115 ALS half-step (k=2, lambda={ALS_LAMBDA}): per-user "
        "factor vectors solved in closed form against md5-seeded "
        "INTEGER item factors — the normal-equation moments fold as "
        "exact BIGINT in one user-keyed aggregate and the 2x2 Cramer "
        "solve is two IEEE divisions of exact integers, so the whole "
        "training step hash-checks. Alternating this shape user/item "
        "IS distributed ALS; each half-step is one shuffle on the "
        "solved side's key.",
    tags=("X115", "X60", "X7", "X3"),
)
def als_user_factors(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    ratings = (li.join(o, li["l_orderkey"] == o["o_orderkey"])
               .groupBy(F.col("o_custkey").alias("u"),
                        F.col("l_partkey").alias("p"))
               .agg(F.sum("l_quantity").cast("long").alias("r")))

    def factor(tag: str) -> F.Column:
        return (F.conv(F.substring(F.md5(F.concat_ws(
            "", F.lit(f"{tag}:"), F.col("p").cast("string"))), 1, 15),
            16, 10).cast("long") % 9 - 4)

    rv = ratings.select("u", "r", factor("als1").alias("v1"),
                        factor("als2").alias("v2"))
    lam = F.lit(ALS_LAMBDA)
    norm = (rv.groupBy("u")
            .agg(F.count("*").cast("long").alias("n_items"),
                 (F.sum(F.col("v1") * F.col("v1")).cast("long") + lam)
                 .alias("a11"),
                 F.sum(F.col("v1") * F.col("v2")).cast("long").alias("a12"),
                 (F.sum(F.col("v2") * F.col("v2")).cast("long") + lam)
                 .alias("a22"),
                 F.sum(F.col("r") * F.col("v1")).cast("long").alias("b1"),
                 F.sum(F.col("r") * F.col("v2")).cast("long").alias("b2")))
    det = F.col("a11") * F.col("a22") - F.col("a12") * F.col("a12")
    return norm.select(
        F.col("u").alias("custkey"), "n_items",
        F.round((F.col("b1") * F.col("a22") - F.col("b2") * F.col("a12"))
                .cast("double") / det, 6).alias("u1"),
        F.round((F.col("b2") * F.col("a11") - F.col("b1") * F.col("a12"))
                .cast("double") / det, 6).alias("u2"))


# --------------------------------------------------------------------------
# X117: split-conformal prediction intervals — the distribution-free
# uncertainty wrapper modern ML serving uses: fit on a train split,
# take the ceil((n+1)(1-alpha))-th absolute residual on a CALIBRATION
# split as the interval half-width q, and verify ~(1-alpha) coverage
# on a held-out test split. Splits are pure md5 id functions; the OLS
# fit comes from exact DECIMAL/BIGINT moments (one aggregate); q is
# one order statistic of the calibration residuals (a selection — at
# corpus scale a top-k, not a full sort); coverage is one test-split
# aggregate against the broadcast scalar q.
# --------------------------------------------------------------------------
CONF_ALPHA = 0.1
CONF_TRAIN_PCT, CONF_CAL_PCT = 60, 20  # remainder -> test


def _conf_bucket_sql(col: str) -> str:
    return (f"(('0x' || substr(md5('conf:' || CAST({col} AS VARCHAR)), "
            f"1, 15))::BIGINT % 100)")


@register(
    "conformal_interval_coverage",
    f"""
    WITH base AS (
        SELECT o.o_orderkey AS k,
               o.o_totalprice::DECIMAL(12,2) AS y,
               CAST(COUNT(*) AS BIGINT) AS x,
               {_conf_bucket_sql('o.o_orderkey')} AS b
        FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        GROUP BY o.o_orderkey, o.o_totalprice
    ),
    fit AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(x) AS BIGINT) AS sx,
               SUM(y) AS sy,
               CAST(SUM(x * x) AS BIGINT) AS sxx,
               SUM(x * y) AS sxy
        FROM base WHERE b < {CONF_TRAIN_PCT}
    ),
    coefs AS (
        SELECT (n * sxy::DOUBLE - sx * sy::DOUBLE)
                   / (n * sxx - sx * sx) AS b1,
               (sy::DOUBLE - (n * sxy::DOUBLE - sx * sy::DOUBLE)
                   / (n * sxx - sx * sx) * sx) / n AS b0,
               n AS n_train
        FROM fit
    ),
    cal AS (
        SELECT base.k, abs(base.y::DOUBLE - (c.b0 + c.b1 * base.x)) AS r
        FROM base CROSS JOIN coefs c
        WHERE b >= {CONF_TRAIN_PCT} AND b < {CONF_TRAIN_PCT + CONF_CAL_PCT}
    ),
    ncal AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_cal FROM cal),
    q AS (
        SELECT r AS q_alpha FROM (
            SELECT r, ROW_NUMBER() OVER (ORDER BY r, k) AS rn FROM cal
        ), ncal
        WHERE rn = CAST(CEIL((ncal.n_cal + 1) * {1 - CONF_ALPHA}) AS BIGINT)
    ),
    test AS (
        SELECT base.k,
               CASE WHEN abs(base.y::DOUBLE - (c.b0 + c.b1 * base.x))
                         <= q.q_alpha THEN 1 ELSE 0 END AS covered
        FROM base CROSS JOIN coefs c CROSS JOIN q
        WHERE b >= {CONF_TRAIN_PCT + CONF_CAL_PCT}
    )
    SELECT c.n_train, ncal.n_cal,
           CAST(COUNT(*) AS BIGINT) AS n_test,
           ROUND(c.b0, 6) AS b0, ROUND(c.b1, 6) AS b1,
           ROUND(q.q_alpha, 4) AS q_alpha,
           CAST(SUM(covered) AS BIGINT) AS n_covered,
           ROUND(SUM(covered)::DOUBLE / COUNT(*), 6) AS coverage
    FROM test CROSS JOIN coefs c CROSS JOIN ncal CROSS JOIN q
    GROUP BY c.n_train, ncal.n_cal, c.b0, c.b1, q.q_alpha
    """,
    doc=f"X117 split-conformal intervals (alpha={CONF_ALPHA}): OLS of "
        "order price on line count fit on a 60% md5 train split from "
        "exact moments, interval half-width = the ceil((n+1)(1-a))-th "
        "calibration residual (one order statistic), coverage verified "
        "on the 20% test split — the distribution-free guarantee that "
        "the interval contains ~90% of unseen orders. One base "
        "aggregate + three split-filtered passes over it; every "
        "scalar broadcasts.",
    tags=("X117", "X60", "X7", "X28"),
)
def conformal_interval_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from ..caching import persist_tracked

    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    bucket = (F.conv(F.substring(F.md5(F.concat_ws(
        "", F.lit("conf:"), F.col("k").cast("string"))), 1, 15), 16, 10)
        .cast("long") % 100)
    base = persist_tracked(
        o.join(li, o["o_orderkey"] == li["l_orderkey"])
        .groupBy(F.col("o_orderkey").alias("k"),
                 F.col("o_totalprice").cast("decimal(12,2)").alias("y"))
        .agg(F.count("*").cast("long").alias("x"))
        .withColumn("b", bucket))
    fit = (base.filter(F.col("b") < CONF_TRAIN_PCT)
           .agg(F.count("*").cast("long").alias("n"),
                F.sum("x").cast("long").alias("sx"),
                F.sum("y").alias("sy"),
                F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
                F.sum(F.col("x") * F.col("y")).alias("sxy")))
    b1 = ((F.col("n") * F.col("sxy").cast("double")
           - F.col("sx") * F.col("sy").cast("double"))
          / (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")))
    coefs = fit.select(b1.alias("b1"),
                       ((F.col("sy").cast("double") - b1 * F.col("sx"))
                        / F.col("n")).alias("b0"),
                       F.col("n").alias("n_train"))
    cal = persist_tracked(
        base.filter((F.col("b") >= CONF_TRAIN_PCT)
                    & (F.col("b") < CONF_TRAIN_PCT + CONF_CAL_PCT))
        .crossJoin(F.broadcast(coefs))
        .select(F.col("k").alias("okey"),
                F.abs(F.col("y").cast("double")
                      - (F.col("b0") + F.col("b1") * F.col("x")))
                .alias("r")))
    ncal = cal.agg(F.count("*").cast("long").alias("n_cal"))
    # Two-pass SELECTION of the k-th residual, never a global-order
    # window (a global row_number serializes the calibration split
    # through one partition at scale): 1024 fixed buckets locate the
    # target rank, then only the selected bucket sorts.
    mx = cal.agg(F.greatest(F.max("r"), F.lit(1e-12)).alias("mx"))
    binned = (cal.crossJoin(F.broadcast(mx))
              .withColumn("bkt", F.least(
                  F.floor(F.col("r") / F.col("mx") * 1024),
                  F.lit(1023)).cast("long")))
    hist = binned.groupBy("bkt").agg(F.count("*").alias("c"))
    wb = Window.orderBy("bkt").rowsBetween(Window.unboundedPreceding, -1)
    cum = (hist.withColumn("cb", F.coalesce(F.sum("c").over(wb), F.lit(0)))
           .crossJoin(F.broadcast(ncal))
           .withColumn("tgt", F.ceil((F.col("n_cal") + 1)
                                     * (1 - CONF_ALPHA)).cast("long")))
    bsel = (cum.filter((F.col("cb") < F.col("tgt"))
                       & (F.col("tgt") <= F.col("cb") + F.col("c")))
            .select("bkt", (F.col("tgt") - F.col("cb")).alias("off")))
    wq = Window.orderBy(F.asc("r"), F.asc("okey"))  # selected bucket only
    q = (binned.join(F.broadcast(bsel), "bkt")
         .withColumn("rn", F.row_number().over(wq))
         .filter(F.col("rn") == F.col("off"))
         .select(F.col("r").alias("q_alpha")))
    test = (base.filter(F.col("b") >= CONF_TRAIN_PCT + CONF_CAL_PCT)
            .crossJoin(F.broadcast(coefs)).crossJoin(F.broadcast(q))
            .select((F.abs(F.col("y").cast("double")
                           - (F.col("b0") + F.col("b1") * F.col("x")))
                     <= F.col("q_alpha")).cast("int").alias("covered"),
                    "n_train", "b0", "b1", "q_alpha"))
    return (test.crossJoin(F.broadcast(ncal))
            .groupBy("n_train", "n_cal", "b0", "b1", "q_alpha")
            .agg(F.count("*").cast("long").alias("n_test"),
                 F.sum("covered").cast("long").alias("n_covered"),
                 F.round(F.sum("covered").cast("double") / F.count("*"), 6)
                 .alias("coverage"))
            .select("n_train", "n_cal", "n_test",
                    F.round("b0", 6).alias("b0"),
                    F.round("b1", 6).alias("b1"),
                    F.round("q_alpha", 4).alias("q_alpha"),
                    "n_covered", "coverage"))


# --------------------------------------------------------------------------
# X139: inequality metrics — the Gini coefficient of customer revenue
# within each nation (the Lorenz-curve summary behind "how
# concentrated is our revenue", the continuous generalization of
# X88's 80/20 cut). Revenue folds to exact BIGINT cents; with
# ascending per-nation ranks i (ROW_NUMBER, ties broken by custkey —
# the rank-weighted sum is tie-permutation-invariant), the population
# Gini is the pure-integer ratio
#   G = (2 * sum_i i*x_i - (n+1) * sum x) / (n * sum x)
# — one corpus aggregate to customer grain, one partitioned window,
# one division. Partition-parallel over nations at any scale.
# --------------------------------------------------------------------------
@register(
    "nation_revenue_gini",
    """
    WITH cust AS (
        SELECT c.c_nationkey AS nk, c.c_custkey,
               CAST(SUM(CAST(ROUND(o.o_totalprice * 100, 0) AS BIGINT))
                    AS BIGINT) AS cents
        FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
        GROUP BY 1, 2
    ),
    ranked AS (
        SELECT nk, cents,
               ROW_NUMBER() OVER (PARTITION BY nk
                                  ORDER BY cents, c_custkey) AS i
        FROM cust
    ),
    agg AS (
        SELECT nk, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(cents) AS BIGINT) AS total,
               CAST(SUM(i * cents) AS BIGINT) AS iw
        FROM ranked GROUP BY nk
    )
    SELECT n2.n_name AS nation, n AS n_customers, total AS total_cents,
           CAST(2 * iw - (n + 1) * total AS BIGINT) AS gini_num,
           CAST(n * total AS BIGINT) AS gini_den,
           ROUND(CAST(2 * iw - (n + 1) * total AS DOUBLE) / (n * total),
                 6) AS gini
    FROM agg JOIN nation n2 ON n2.n_nationkey = agg.nk
    """,
    doc="X139 per-nation Gini coefficient of customer revenue: exact "
        "BIGINT cents, per-nation ascending ranks (partitioned "
        "window, never global), and the rank-weighted integer Gini "
        "ratio divided once. The revenue-concentration audit behind "
        "Lorenz dashboards; nations are independent partitions, so "
        "the operator scales with the customer aggregate, not the "
        "order count.",
    tags=("X139", "X88", "X10", "X7", "X3"),
)
def nation_revenue_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    cust = (orders.join(customer.select(
                F.col("c_custkey").alias("o_custkey"), "c_nationkey"),
                "o_custkey")
            .groupBy(F.col("c_nationkey").alias("nk"),
                     F.col("o_custkey").alias("c_custkey"))
            .agg(F.sum(F.round(F.col("o_totalprice") * 100, 0)
                       .cast("long")).cast("long").alias("cents")))
    w = Window.partitionBy("nk").orderBy("cents", "c_custkey")
    ranked = cust.withColumn("i", F.row_number().over(w))
    agg = (ranked.groupBy("nk")
           .agg(F.count("*").cast("long").alias("n"),
                F.sum("cents").cast("long").alias("total"),
                F.sum(F.col("i") * F.col("cents")).cast("long")
                .alias("iw")))
    num = 2 * F.col("iw") - (F.col("n") + 1) * F.col("total")
    den = F.col("n") * F.col("total")
    return (agg.join(F.broadcast(nation.select(
                F.col("n_nationkey").alias("nk"), "n_name")), "nk")
            .select(F.col("n_name").alias("nation"),
                    F.col("n").alias("n_customers"),
                    F.col("total").alias("total_cents"),
                    num.cast("long").alias("gini_num"),
                    den.cast("long").alias("gini_den"),
                    F.round(num.cast("double") / den, 6).alias("gini")))


# --------------------------------------------------------------------------
# X144: Simpson's-paradox audit — the aggregation-reversal detector
# every analytics platform needs before anyone trusts a pooled trend:
# does the discount/quantity association FLIP when conditioned on
# brand? Association sign = sign of the covariance numerator
# n*sum(xy) - sum(x)*sum(y), folded per brand AND pooled, entirely in
# DECIMAL(38,0) (exact at any scale, no float summation); signs come
# from integer comparison, never a float epsilon. One lineitem+part
# scan, one keyed aggregate, a broadcast 1-row pooled frame.
# --------------------------------------------------------------------------
@register(
    "simpson_paradox_audit",
    """
    WITH base AS (
        SELECT p.p_brand AS brand,
               CAST(ROUND(l.l_discount * 100, 0) AS HUGEINT) AS x,
               CAST(l.l_quantity AS HUGEINT) AS y
        FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    ),
    grp AS (
        SELECT brand, CAST(COUNT(*) AS BIGINT) AS n,
               COUNT(*) * SUM(x * y) - SUM(x) * SUM(y) AS cov_num
        FROM base GROUP BY brand
    ),
    pooled AS (
        SELECT COUNT(*) * SUM(x * y) - SUM(x) * SUM(y) AS cov_num
        FROM base
    )
    SELECT g.brand, g.n,
           CAST(CASE WHEN g.cov_num > 0 THEN 1
                     WHEN g.cov_num < 0 THEN -1 ELSE 0 END AS BIGINT)
               AS brand_sign,
           CAST(CASE WHEN p.cov_num > 0 THEN 1
                     WHEN p.cov_num < 0 THEN -1 ELSE 0 END AS BIGINT)
               AS pooled_sign,
           CAST(CASE WHEN (CASE WHEN g.cov_num > 0 THEN 1
                                WHEN g.cov_num < 0 THEN -1 ELSE 0 END)
                          * (CASE WHEN p.cov_num > 0 THEN 1
                                  WHEN p.cov_num < 0 THEN -1 ELSE 0 END)
                          = -1
                     THEN 1 ELSE 0 END AS BIGINT) AS reversed
    FROM grp g CROSS JOIN pooled p
    """,
    doc="X144 Simpson's-paradox audit of the discount->quantity "
        "association: per-brand vs pooled covariance-numerator signs "
        "(n*Sxy - Sx*Sy in DECIMAL(38,0)/HUGEINT — exact, "
        "overflow-free, order-independent), reversal flag where the "
        "conditioned sign opposes the pooled sign. The canonical "
        "warning light for trend conclusions drawn across a "
        "confounded grouping.",
    tags=("X144", "X80", "X7", "X3"),
)
def simpson_paradox_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    base = (li.join(F.broadcast(part.select(
                F.col("p_partkey").alias("l_partkey"), "p_brand")),
                "l_partkey")
            .select(F.col("p_brand").alias("brand"),
                    F.round(F.col("l_discount") * 100, 0)
                    .cast("decimal(38,0)").alias("x"),
                    F.col("l_quantity").cast("decimal(38,0)").alias("y")))
    grp = (base.groupBy("brand")
           .agg(F.count("*").cast("long").alias("n"),
                (F.count("*") * F.sum(F.col("x") * F.col("y"))
                 - F.sum("x") * F.sum("y")).alias("cov_num")))
    pooled = base.agg(
        (F.count("*") * F.sum(F.col("x") * F.col("y"))
         - F.sum("x") * F.sum("y")).alias("p_cov"))
    sign = (lambda c: F.when(F.col(c) > 0, 1)
            .when(F.col(c) < 0, -1).otherwise(0).cast("long"))
    return (grp.crossJoin(F.broadcast(pooled))
            .select("brand", "n",
                    sign("cov_num").alias("brand_sign"),
                    sign("p_cov").alias("pooled_sign"),
                    F.when(sign("cov_num") * sign("p_cov") == -1, 1)
                    .otherwise(0).cast("long").alias("reversed")))


# --------------------------------------------------------------------------
# X217: hierarchical heavy hitters — the multi-resolution frequency
# miner (Cormode et al.): a day can be quiet while its month is hot;
# plain heavy hitters (X29's count-min, the two-pass exact top-k)
# see only one granularity. Bottom-up conditioned counts over the
# day -> month -> year order-date hierarchy: a node is an HHH iff its
# count MINUS the counts already claimed by its HHH descendants still
# clears the threshold (total DIV 50). Three aggregates + two keyed
# joins — no iteration, hierarchy depth is the only fan-out.
# --------------------------------------------------------------------------
HHH_DIV = 50


@register(
    "hierarchical_heavy_hitters",
    f"""
    WITH tot AS (SELECT CAST(COUNT(*) AS BIGINT) // {HHH_DIV} AS theta
                 FROM orders),
    d AS (
        SELECT CAST(date_trunc('day', o_orderdate) AS DATE) AS day,
               CAST(date_trunc('month', o_orderdate) AS DATE) AS mon,
               CAST(date_trunc('year', o_orderdate) AS DATE) AS yr,
               CAST(COUNT(*) AS BIGINT) AS c
        FROM orders GROUP BY 1, 2, 3
    ),
    hd AS (SELECT day, mon, yr, c FROM d, tot WHERE c >= tot.theta),
    m AS (
        SELECT d.mon, d.yr, CAST(SUM(d.c) AS BIGINT) AS c,
               CAST(COALESCE(SUM(CASE WHEN h.day IS NOT NULL
                                      THEN d.c END), 0) AS BIGINT)
                   AS claimed
        FROM d LEFT JOIN hd h ON h.day = d.day
        GROUP BY d.mon, d.yr
    ),
    hm AS (
        SELECT mon, yr, c, c - claimed AS residual
        FROM m, tot WHERE c - claimed >= tot.theta
    ),
    y AS (
        SELECT m.yr, CAST(SUM(m.c) AS BIGINT) AS c,
               CAST(COALESCE(SUM(h.c), 0) AS BIGINT) AS claimed_m,
               CAST(COALESCE(SUM(CASE WHEN h.mon IS NULL
                                      THEN m.claimed END), 0)
                    AS BIGINT) AS claimed_d
        FROM m LEFT JOIN hm h ON h.mon = m.mon
        GROUP BY m.yr
    ),
    hy AS (
        SELECT yr, c, c - claimed_m - claimed_d AS residual
        FROM y, tot WHERE c - claimed_m - claimed_d >= tot.theta
    )
    SELECT 'day' AS level, CAST(day AS VARCHAR) AS key, c,
           c AS residual
    FROM hd
    UNION ALL
    SELECT 'month', CAST(mon AS VARCHAR), c, residual FROM hm
    UNION ALL
    SELECT 'year', CAST(yr AS VARCHAR), c, residual FROM hy
    """,
    doc=f"X217 hierarchical heavy hitters over the order-date "
        f"day->month->year hierarchy (theta = total DIV {HHH_DIV}): "
        "a node is an HHH iff its count minus the mass claimed by "
        "HHH descendants clears theta (conditioned counts, Cormode-"
        "style). Three aggregates + keyed joins, depth-bounded "
        "fan-out; multi-resolution hot-spot detection for partition "
        "and cache planning. Python-replay law-tested.",
    tags=("X217", "X29", "X7", "X13", "X14"),
)
def hierarchical_heavy_hitters(spark: SparkSession,
                               sf_dir: str) -> DataFrame:
    from ..caching import persist_tracked

    orders = load_table(spark, sf_dir, "orders")
    d = persist_tracked(
        orders.groupBy(
            F.date_trunc("day", "o_orderdate").cast("date").alias("day"),
            F.date_trunc("month", "o_orderdate").cast("date")
            .alias("mon"),
            F.date_trunc("year", "o_orderdate").cast("date").alias("yr"))
        .agg(F.count("*").cast("long").alias("c")))
    tot = d.agg(F.expr(f"SUM(c) DIV {HHH_DIV}").cast("long")
                .alias("theta"))
    dt = d.crossJoin(F.broadcast(tot))
    hd = persist_tracked(dt.filter(F.col("c") >= F.col("theta"))
                         .select("day", "mon", "yr", "c"))
    m = (d.join(hd.select(F.col("day"), F.lit(1).alias("is_h")),
                "day", "left")
         .groupBy("mon", "yr")
         .agg(F.sum("c").cast("long").alias("c"),
              F.coalesce(F.sum(F.when(F.col("is_h") == 1, F.col("c"))),
                         F.lit(0)).cast("long").alias("claimed")))
    hm = persist_tracked(
        m.crossJoin(F.broadcast(tot))
        .filter(F.col("c") - F.col("claimed") >= F.col("theta"))
        .select("mon", "yr", "c",
                (F.col("c") - F.col("claimed")).alias("residual")))
    yy = (m.join(hm.select(F.col("mon"), F.col("c").alias("hm_c")),
                 "mon", "left")
          .groupBy("yr")
          .agg(F.sum("c").cast("long").alias("c"),
               F.coalesce(F.sum("hm_c"), F.lit(0)).cast("long")
               .alias("claimed_m"),
               F.coalesce(F.sum(F.when(F.col("hm_c").isNull(),
                                       F.col("claimed"))), F.lit(0))
               .cast("long").alias("claimed_d")))
    hy = (yy.crossJoin(F.broadcast(tot))
          .filter(F.col("c") - F.col("claimed_m") - F.col("claimed_d")
                  >= F.col("theta"))
          .select("yr", "c",
                  (F.col("c") - F.col("claimed_m")
                   - F.col("claimed_d")).alias("residual")))
    return (hd.select(F.lit("day").alias("level"),
                      F.col("day").cast("string").alias("key"),
                      "c", F.col("c").alias("residual"))
            .unionByName(hm.select(F.lit("month").alias("level"),
                                   F.col("mon").cast("string")
                                   .alias("key"), "c", "residual"))
            .unionByName(hy.select(F.lit("year").alias("level"),
                                   F.col("yr").cast("string")
                                   .alias("key"), "c", "residual")))


# --------------------------------------------------------------------------
# X218: Theil index decomposition — the inequality lens X139's Gini
# can't give: Theil is ADDITIVELY decomposable, T = T_between +
# sum_g share_g * T_g, so it answers "how much revenue concentration
# lives BETWEEN nations vs WITHIN them". With customer revenue in
# integer cents, every log argument is an integer: l2m(x) =
# ROUND(log2(x)*1e6) (the established micro-bit grid), group means
# enter as l2m(X_g) - l2m(n_g), and both the within numerator
# N_g = sum x*l2m(x) - X_g*(l2m(X_g)-l2m(n_g)) and the between term
# X_g*(l2m(X_g)-l2m(n_g)-l2m(X)+l2m(N)) are exact integer folds
# (DECIMAL(38,0) headroom) divided once by X_g / X via the
# subtract-pmod floor division (terms can be slightly negative on
# the micro grid). Output: one row per nation.
# --------------------------------------------------------------------------
def _theil_fdiv(a: str, d: str) -> str:
    return f"(({a}) - ((({a}) % ({d})) + ({d})) % ({d})) // ({d})"


@register(
    "theil_nation_decomposition",
    f"""
    WITH cust AS (
        SELECT o.o_custkey AS ck, MIN(c.c_nationkey) AS nk,
               CAST(SUM(CAST(CAST(o.o_totalprice AS DECIMAL(18,2)) * 100
                             AS BIGINT)) AS BIGINT) AS x
        FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
        GROUP BY o.o_custkey
        HAVING SUM(o.o_totalprice) > 0
    ),
    lx AS (
        SELECT nk, x,
               CAST(ROUND(log2(x) * 1000000) AS BIGINT) AS l2x
        FROM cust
    ),
    g AS (
        SELECT n.n_name AS nation,
               CAST(COUNT(*) AS BIGINT) AS n_customers,
               CAST(SUM(x) AS BIGINT) AS xg,
               CAST(SUM(CAST(x AS HUGEINT) * l2x) AS DECIMAL(38,0))
                   AS sxl
        FROM lx JOIN nation n ON n.n_nationkey = lx.nk
        GROUP BY n.n_name
    ),
    tot AS (
        SELECT CAST(SUM(n_customers) AS BIGINT) AS n,
               CAST(SUM(xg) AS BIGINT) AS x
        FROM g
    ),
    terms AS (
        SELECT nation, n_customers, xg,
               CAST(g.sxl - CAST(xg AS DECIMAL(38,0))
                    * (CAST(ROUND(log2(xg) * 1000000) AS BIGINT)
                       - CAST(ROUND(log2(n_customers) * 1000000)
                              AS BIGINT)) AS BIGINT) AS ng,
               CAST(CAST(xg AS DECIMAL(38,0))
                    * (CAST(ROUND(log2(xg) * 1000000) AS BIGINT)
                       - CAST(ROUND(log2(n_customers) * 1000000)
                              AS BIGINT)
                       - CAST(ROUND(log2(tot.x) * 1000000) AS BIGINT)
                       + CAST(ROUND(log2(tot.n) * 1000000) AS BIGINT))
                    AS BIGINT) AS bt,
               tot.x AS xtot
        FROM g, tot
    )
    SELECT nation, n_customers, xg AS revenue_cents,
           CAST({_theil_fdiv('ng', 'xg')} AS BIGINT)
               AS theil_within_micro,
           CAST({_theil_fdiv('bt', 'xtot')} AS BIGINT)
               AS between_term_micro
    FROM terms
    """,
    doc="X218 Theil inequality decomposition of customer lifetime "
        "revenue by nation: within-nation Theil and per-nation "
        "between-group term, all on the integer micro-bit grid "
        "(l2m of integer cents only), exact DECIMAL(38,0) folds, one "
        "negative-safe floor division per output value. The additive "
        "complement to X139's Gini. Python-replay law-tested, "
        "including the decomposition identity on the micro grid.",
    tags=("X218", "X139", "X7", "X3", "X14"),
)
def theil_nation_decomposition(spark: SparkSession,
                               sf_dir: str) -> DataFrame:
    from ..caching import persist_tracked

    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    cust = (orders.join(customer,
                        orders["o_custkey"] == customer["c_custkey"])
            .groupBy(F.col("o_custkey").alias("ck"))
            .agg(F.min("c_nationkey").alias("nk"),
                 F.sum((F.col("o_totalprice").cast("decimal(18,2)")
                        * 100).cast("long")).cast("long").alias("x"))
            .filter(F.col("x") > 0))
    lx = cust.select(
        "nk", "x",
        F.round(F.log2("x") * 1000000).cast("long").alias("l2x"))
    g = persist_tracked(
        lx.join(F.broadcast(nation),
                lx["nk"] == nation["n_nationkey"])
        .groupBy(F.col("n_name").alias("nation"))
        .agg(F.count("*").cast("long").alias("n_customers"),
             F.sum("x").cast("long").alias("xg"),
             F.sum(F.col("x").cast("decimal(38,0)") * F.col("l2x"))
             .cast("decimal(38,0)").alias("sxl")))
    tot = g.agg(F.sum("n_customers").cast("long").alias("n"),
                F.sum("xg").cast("long").alias("x"))
    l2m = lambda c: F.round(F.log2(c) * 1000000).cast("long")
    terms = (g.crossJoin(F.broadcast(tot))
             .select(
                 "nation", "n_customers", "xg",
                 (F.col("sxl")
                  - F.col("xg").cast("decimal(38,0)")
                  * (l2m("xg") - l2m("n_customers")))
                 .cast("long").alias("ng"),
                 (F.col("xg").cast("decimal(38,0)")
                  * (l2m("xg") - l2m("n_customers")
                     - l2m("x") + l2m("n")))
                 .cast("long").alias("bt"),
                 F.col("x").alias("xtot")))
    fd = _theil_fdiv
    return terms.selectExpr(
        "nation", "n_customers", "xg AS revenue_cents",
        f"CAST({fd('ng', 'xg').replace('//', 'DIV')} AS BIGINT)"
        " AS theil_within_micro",
        f"CAST({fd('bt', 'xtot').replace('//', 'DIV')} AS BIGINT)"
        " AS between_term_micro")


# --------------------------------------------------------------------------
# X240: closed-form PCA — the 2x2 eigendecomposition of the
# (quantity, price) covariance per return flag, the dimensionality-
# reduction family X58's data-oblivious random projection deliberately
# avoids (this one LOOKS at the data). Single-pass exact moments
# (second-order folds in DECIMAL(38,0) — price_centi^2 overflows
# BIGINT at warehouse scale), covariance assembled in double from the
# exact folds, eigenvalues by the quadratic formula, principal-axis
# slope and explained-variance ratio snapped to the micro grid. One
# aggregate per group, no iteration, no library solver — at 100 TB
# this is one shuffle. Pearson (1901); [EXT].
# --------------------------------------------------------------------------
_PCA_EIG = """
    CAST(n AS DOUBLE) AS nd,
    (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
     - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
    / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)) AS cxx,
    (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
     - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))
    / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)) AS cyy,
    (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
     - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
    / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)) AS cxy"""


@register(
    "pca_closed_form",
    f"""
    WITH pts AS (
        SELECT l_returnflag AS flag,
               CAST(l_quantity AS BIGINT) AS x,
               CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT) AS y
        FROM lineitem
    ),
    mom AS (
        SELECT flag, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(x) AS BIGINT) AS sx,
               CAST(SUM(y) AS BIGINT) AS sy,
               CAST(SUM(CAST(x AS DECIMAL(38,0)) * x) AS DECIMAL(38,0))
                   AS sxx,
               CAST(SUM(CAST(y AS DECIMAL(38,0)) * y) AS DECIMAL(38,0))
                   AS syy,
               CAST(SUM(CAST(x AS DECIMAL(38,0)) * y) AS DECIMAL(38,0))
                   AS sxy
        FROM pts GROUP BY flag
    ),
    cov AS (
        SELECT flag, n,{_PCA_EIG}
        FROM mom
    ),
    eig AS (
        SELECT flag, n, cxx, cyy, cxy,
               (cxx + cyy + SQRT((cxx - cyy) * (cxx - cyy)
                                 + 4 * cxy * cxy)) / 2 AS lam1,
               (cxx + cyy - SQRT((cxx - cyy) * (cxx - cyy)
                                 + 4 * cxy * cxy)) / 2 AS lam2
        FROM cov
    )
    SELECT flag, n,
           ROUND(lam1, 4) AS lam1,
           ROUND(lam2, 4) AS lam2,
           CASE WHEN lam1 + lam2 > 0 THEN
               CAST(ROUND(lam1 / (lam1 + lam2) * 1000000, 0) AS BIGINT)
           ELSE 0 END AS evr_micro,
           CASE WHEN cxy <> 0 THEN
               CAST(ROUND((lam1 - cxx) / cxy * 1000000, 0) AS BIGINT)
           ELSE 0 END AS slope_micro
    FROM eig
    """,
    doc="X240 grouped closed-form 2-D PCA over (quantity, price_centi) "
        "per return flag: exact single-pass moments (DECIMAL(38,0) "
        "second-order folds), covariance + quadratic-formula "
        "eigenvalues in double from the exact folds, principal-axis "
        "slope (lam1 - cxx)/cxy and explained-variance ratio on the "
        "micro grid. One shuffle total. Python replay + trace/det "
        "identity laws.",
    tags=("X240", "X80", "X60", "X7"),
)
def pca_closed_form(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    pts = li.select(
        F.col("l_returnflag").alias("flag"),
        F.col("l_quantity").cast("long").alias("x"),
        F.round(F.col("l_extendedprice") * 100, 0).cast("long")
        .alias("y"))
    mom = pts.groupBy("flag").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.expr("CAST(SUM(CAST(x AS DECIMAL(38,0)) * x)"
               " AS DECIMAL(38,0))").alias("sxx"),
        F.expr("CAST(SUM(CAST(y AS DECIMAL(38,0)) * y)"
               " AS DECIMAL(38,0))").alias("syy"),
        F.expr("CAST(SUM(CAST(x AS DECIMAL(38,0)) * y)"
               " AS DECIMAL(38,0))").alias("sxy"))
    cov = mom.selectExpr("flag", "n", *[
        e.strip() for e in _PCA_EIG.split(",\n")])
    eig = cov.selectExpr(
        "flag", "n", "cxx", "cyy", "cxy",
        "(cxx + cyy + SQRT((cxx - cyy) * (cxx - cyy)"
        " + 4 * cxy * cxy)) / 2 AS lam1",
        "(cxx + cyy - SQRT((cxx - cyy) * (cxx - cyy)"
        " + 4 * cxy * cxy)) / 2 AS lam2")
    return eig.selectExpr(
        "flag", "n",
        "ROUND(lam1, 4) AS lam1",
        "ROUND(lam2, 4) AS lam2",
        # constant-column / zero-covariance guards (match the oracle):
        # Inf/NaN -> BIGINT casts diverge across engines, so degrade to 0
        "CASE WHEN lam1 + lam2 > 0 THEN"
        " CAST(ROUND(lam1 / (lam1 + lam2) * 1000000, 0) AS BIGINT)"
        " ELSE 0L END AS evr_micro",
        "CASE WHEN cxy <> 0 THEN"
        " CAST(ROUND((lam1 - cxx) / cxy * 1000000, 0) AS BIGINT)"
        " ELSE 0L END AS slope_micro")


# --------------------------------------------------------------------------
# X249: rank correlation — Kendall tau-b and tie-aware Spearman
# between two period rankings of the SAME dimension (brand revenue,
# RC_YEAR_A=1996 vs RC_YEAR_B=2000): the rank-stability lens X80's Pearson matrix (values,
# not ranks) doesn't give. Revenue is per-row centi-rounded BEFORE the
# fold so each period's ranking is exact-integer; the pair join runs
# over the BOUNDED dimension frame (|brands|^2 rows — dimension-sized,
# scale-free), concordant/discordant/tie counts are exact, and tau-b /
# Spearman are single correctly-rounded double divisions from exact
# folds (Spearman = Pearson on integer 2x-midranks). Kendall (1945);
# [EXT].
# --------------------------------------------------------------------------
RC_YEAR_A = 1996
RC_YEAR_B = 2000


@register(
    "rank_correlation_brands",
    f"""
    WITH rev AS (
        SELECT p.p_brand AS brand,
               EXTRACT(year FROM l.l_shipdate) AS yr,
               CAST(SUM(CAST(ROUND(l.l_extendedprice
                    * (1 - l.l_discount) * 100, 0) AS BIGINT))
                    AS BIGINT) AS r
        FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
        WHERE EXTRACT(year FROM l.l_shipdate)
              IN ({RC_YEAR_A}, {RC_YEAR_B})
        GROUP BY 1, 2
    ),
    wide AS (
        SELECT brand,
               COALESCE(MAX(CASE WHEN yr = {RC_YEAR_A} THEN r END), 0)
                   AS x,
               COALESCE(MAX(CASE WHEN yr = {RC_YEAR_B} THEN r END), 0)
                   AS y
        FROM rev GROUP BY brand
    ),
    pairs AS (
        SELECT CAST(SUM(CASE WHEN (a.x - b.x) * (a.y - b.y) > 0
                        THEN 1 ELSE 0 END) AS BIGINT) AS c,
               CAST(SUM(CASE WHEN (a.x - b.x) * (a.y - b.y) < 0
                        THEN 1 ELSE 0 END) AS BIGINT) AS d,
               CAST(SUM(CASE WHEN a.x = b.x AND a.y <> b.y
                        THEN 1 ELSE 0 END) AS BIGINT) AS tx,
               CAST(SUM(CASE WHEN a.y = b.y AND a.x <> b.x
                        THEN 1 ELSE 0 END) AS BIGINT) AS ty,
               CAST(COUNT(*) AS BIGINT) AS np
        FROM wide a JOIN wide b ON a.brand < b.brand
    ),
    rx AS (
        SELECT brand, y,
               CAST(2 * (RANK() OVER (ORDER BY x) - 1)
                    + COUNT(*) OVER (PARTITION BY x) + 1 AS BIGINT)
                   AS mrx
        FROM wide
    ),
    rxy AS (
        SELECT mrx,
               CAST(2 * (RANK() OVER (ORDER BY y) - 1)
                    + COUNT(*) OVER (PARTITION BY y) + 1 AS BIGINT)
                   AS mry
        FROM rx
    ),
    sp AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(mrx) AS BIGINT) AS sx,
               CAST(SUM(mry) AS BIGINT) AS sy,
               CAST(SUM(mrx * mrx) AS BIGINT) AS sxx,
               CAST(SUM(mry * mry) AS BIGINT) AS syy,
               CAST(SUM(mrx * mry) AS BIGINT) AS sxy
        FROM rxy
    )
    SELECT p.np AS n_pairs, p.c AS concordant, p.d AS discordant,
           p.tx AS ties_x, p.ty AS ties_y,
           CASE WHEN (p.c + p.d + p.tx) * (p.c + p.d + p.ty) > 0 THEN
               CAST(ROUND(CAST(p.c - p.d AS DOUBLE)
                    / SQRT(CAST(p.c + p.d + p.tx AS DOUBLE)
                           * CAST(p.c + p.d + p.ty AS DOUBLE))
                    * 1000000, 0) AS BIGINT)
           ELSE 0 END AS tau_b_micro,
           CASE WHEN (s.n * s.sxx - s.sx * s.sx) > 0
                 AND (s.n * s.syy - s.sy * s.sy) > 0 THEN
               CAST(ROUND((CAST(s.n AS DOUBLE) * s.sxy
                           - CAST(s.sx AS DOUBLE) * s.sy)
                    / SQRT((CAST(s.n AS DOUBLE) * s.sxx
                            - CAST(s.sx AS DOUBLE) * s.sx)
                           * (CAST(s.n AS DOUBLE) * s.syy
                              - CAST(s.sy AS DOUBLE) * s.sy))
                    * 1000000, 0) AS BIGINT)
           ELSE 0 END AS spearman_micro
    FROM pairs p CROSS JOIN sp s
    """,
    doc=f"X249 rank correlation of brand revenue rankings "
        f"{RC_YEAR_A} vs {RC_YEAR_B}: per-row centi-rounded revenue "
        "folds give exact integer rankings; Kendall tau-b from exact "
        "concordant/discordant/tie counts over the bounded dimension "
        "pair join; tie-aware Spearman as Pearson on integer "
        "2x-midranks; both snapped micro from single double "
        "divisions. Python replay + tau/Spearman range laws.",
    tags=("X249", "X80", "X12", "X7"),
)
def rank_correlation_brands(spark: SparkSession,
                            sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    rev = (li.join(p, p.p_partkey == li.l_partkey)
           .filter(F.year("l_shipdate").isin(RC_YEAR_A, RC_YEAR_B))
           .groupBy(F.col("p_brand").alias("brand"),
                    F.year("l_shipdate").alias("yr"))
           .agg(F.sum(F.round(F.col("l_extendedprice")
                              * (1 - F.col("l_discount")) * 100, 0)
                      .cast("long")).cast("long").alias("r")))
    wide = (rev.groupBy("brand")
            .agg(F.coalesce(F.max(F.when(F.col("yr") == RC_YEAR_A,
                                         F.col("r"))), F.lit(0))
                 .alias("x"),
                 F.coalesce(F.max(F.when(F.col("yr") == RC_YEAR_B,
                                         F.col("r"))), F.lit(0))
                 .alias("y")).localCheckpoint())
    a, b = wide.alias("a"), wide.alias("b")
    pairs = (a.join(b, F.col("a.brand") < F.col("b.brand"))
             .agg(F.sum(F.when((F.col("a.x") - F.col("b.x"))
                               * (F.col("a.y") - F.col("b.y")) > 0, 1)
                        .otherwise(0)).cast("long").alias("c"),
                  F.sum(F.when((F.col("a.x") - F.col("b.x"))
                               * (F.col("a.y") - F.col("b.y")) < 0, 1)
                        .otherwise(0)).cast("long").alias("d"),
                  F.sum(F.when((F.col("a.x") == F.col("b.x"))
                               & (F.col("a.y") != F.col("b.y")), 1)
                        .otherwise(0)).cast("long").alias("tx"),
                  F.sum(F.when((F.col("a.y") == F.col("b.y"))
                               & (F.col("a.x") != F.col("b.x")), 1)
                        .otherwise(0)).cast("long").alias("ty"),
                  F.count("*").cast("long").alias("np")))
    wx = Window.orderBy("x")
    rx = wide.select(
        "y",
        (2 * (F.rank().over(wx) - 1)
         + F.count("*").over(Window.partitionBy("x")) + 1)
        .cast("long").alias("mrx"))
    wy = Window.orderBy("y")
    rxy = rx.select(
        "mrx",
        (2 * (F.rank().over(wy) - 1)
         + F.count("*").over(Window.partitionBy("y")) + 1)
        .cast("long").alias("mry"))
    sp = rxy.agg(
        F.count("*").cast("long").alias("n"),
        F.sum("mrx").cast("long").alias("sx"),
        F.sum("mry").cast("long").alias("sy"),
        F.sum(F.col("mrx") * F.col("mrx")).cast("long").alias("sxx"),
        F.sum(F.col("mry") * F.col("mry")).cast("long").alias("syy"),
        F.sum(F.col("mrx") * F.col("mry")).cast("long").alias("sxy"))
    return (pairs.crossJoin(F.broadcast(sp))
            .selectExpr(
                "np AS n_pairs", "c AS concordant", "d AS discordant",
                "tx AS ties_x", "ty AS ties_y",
                # degenerate-ranking guard (fully-tied year -> 0, not
                # NaN): mirrors the oracle's CASE exactly
                "CASE WHEN (c + d + tx) * (c + d + ty) > 0 THEN"
                " CAST(ROUND(CAST(c - d AS DOUBLE)"
                " / SQRT(CAST(c + d + tx AS DOUBLE)"
                " * CAST(c + d + ty AS DOUBLE)) * 1000000, 0)"
                " AS BIGINT) ELSE 0L END AS tau_b_micro",
                "CASE WHEN (n * sxx - sx * sx) > 0"
                " AND (n * syy - sy * sy) > 0 THEN"
                " CAST(ROUND((CAST(n AS DOUBLE) * sxy"
                " - CAST(sx AS DOUBLE) * sy)"
                " / SQRT((CAST(n AS DOUBLE) * sxx"
                " - CAST(sx AS DOUBLE) * sx)"
                " * (CAST(n AS DOUBLE) * syy"
                " - CAST(sy AS DOUBLE) * sy)) * 1000000, 0)"
                " AS BIGINT) ELSE 0L END AS spearman_micro"))


# --------------------------------------------------------------------------
# X251: rank aggregation (Borda + Condorcet) — the social-choice
# family: brands ranked by three incommensurable criteria (revenue,
# quantity, part variety) fused into one consensus ranking without
# inventing weights. Borda score sums (n - position) across criteria;
# the Condorcet matrix counts pairwise majority wins over the BOUNDED
# dimension join (|brands|^2); the Condorcet winner (beats every
# rival in >= 2 of 3 criteria) is flagged when one exists. Rankings
# are exact: per-row centi-rounded revenue folds + deterministic
# (value DESC, brand) tiebreak. Borda (1781), Condorcet (1785); [EXT]
# — distinct from X63 RRF (retrieval-score fusion, reciprocal-rank
# weighting) in both weighting and the pairwise-majority semantics.
# --------------------------------------------------------------------------
@register(
    "borda_condorcet_brands",
    """
    WITH stats AS (
        SELECT p.p_brand AS brand,
               CAST(SUM(CAST(ROUND(l.l_extendedprice
                    * (1 - l.l_discount) * 100, 0) AS BIGINT))
                    AS BIGINT) AS rev,
               CAST(SUM(CAST(l.l_quantity AS BIGINT)) AS BIGINT)
                   AS qty,
               CAST(COUNT(DISTINCT l.l_partkey) AS BIGINT) AS variety
        FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
        GROUP BY 1
    ),
    ranked AS (
        SELECT brand, rev, qty, variety,
               CAST(ROW_NUMBER() OVER (ORDER BY rev DESC, brand)
                    AS BIGINT) AS r_rev,
               CAST(ROW_NUMBER() OVER (ORDER BY qty DESC, brand)
                    AS BIGINT) AS r_qty,
               CAST(ROW_NUMBER() OVER (ORDER BY variety DESC, brand)
                    AS BIGINT) AS r_var,
               CAST(COUNT(*) OVER () AS BIGINT) AS n
        FROM stats
    ),
    duels AS (
        SELECT a.brand,
               CAST(SUM(CASE WHEN
                   (CASE WHEN a.r_rev < b.r_rev THEN 1 ELSE 0 END
                    + CASE WHEN a.r_qty < b.r_qty THEN 1 ELSE 0 END
                    + CASE WHEN a.r_var < b.r_var THEN 1 ELSE 0 END)
                   >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS wins
        FROM ranked a JOIN ranked b ON a.brand <> b.brand
        GROUP BY a.brand
    )
    SELECT r.brand, r.r_rev, r.r_qty, r.r_var,
           CAST(3 * r.n - r.r_rev - r.r_qty - r.r_var AS BIGINT)
               AS borda,
           d.wins,
           CASE WHEN d.wins = r.n - 1 THEN 1 ELSE 0 END
               AS is_condorcet_winner
    FROM ranked r JOIN duels d ON d.brand = r.brand
    """,
    doc="X251 Borda + Condorcet rank aggregation of brand rankings by "
        "revenue (per-row centi-rounded exact folds), quantity and "
        "part variety: deterministic row_number ranks, Borda = "
        "sum(n - position), pairwise majority duel matrix over the "
        "bounded brand join, Condorcet winner flag. Python replay + "
        "Borda-sum conservation + at-most-one-winner laws.",
    tags=("X251", "X63", "X12", "X7"),
)
def borda_condorcet_brands(spark: SparkSession,
                           sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    stats = (li.join(p, p.p_partkey == li.l_partkey)
             .groupBy(F.col("p_brand").alias("brand"))
             .agg(F.sum(F.round(F.col("l_extendedprice")
                                * (1 - F.col("l_discount")) * 100, 0)
                        .cast("long")).cast("long").alias("rev"),
                  F.sum(F.col("l_quantity").cast("long")).cast("long")
                  .alias("qty"),
                  F.countDistinct("l_partkey").cast("long")
                  .alias("variety")))
    ranked = stats.select(
        "brand", "rev", "qty", "variety",
        F.row_number().over(Window.orderBy(F.desc("rev"), "brand"))
        .cast("long").alias("r_rev"),
        F.row_number().over(Window.orderBy(F.desc("qty"), "brand"))
        .cast("long").alias("r_qty"),
        F.row_number().over(Window.orderBy(F.desc("variety"), "brand"))
        .cast("long").alias("r_var"),
        F.count("*").over(Window.partitionBy()).cast("long")
        .alias("n")).localCheckpoint()
    a, b = ranked.alias("a"), ranked.alias("b")
    beats = ((F.when(F.col("a.r_rev") < F.col("b.r_rev"), 1)
              .otherwise(0))
             + (F.when(F.col("a.r_qty") < F.col("b.r_qty"), 1)
                .otherwise(0))
             + (F.when(F.col("a.r_var") < F.col("b.r_var"), 1)
                .otherwise(0)))
    duels = (a.join(b, F.col("a.brand") != F.col("b.brand"))
             .groupBy(F.col("a.brand").alias("brand"))
             .agg(F.sum(F.when(beats >= 2, 1).otherwise(0))
                  .cast("long").alias("wins")))
    return (ranked.join(duels, "brand")
            .select("brand", "r_rev", "r_qty", "r_var",
                    (3 * F.col("n") - F.col("r_rev") - F.col("r_qty")
                     - F.col("r_var")).cast("long").alias("borda"),
                    "wins",
                    F.when(F.col("wins") == F.col("n") - 1, 1)
                    .otherwise(0).alias("is_condorcet_winner")))


# --------------------------------------------------------------------------
# X254: rank-biased overlap (Webber, Moffat & Zobel, TOIS 2010) — the
# TOP-WEIGHTED ranking-agreement measure X249's Kendall/Spearman are
# not: those weight every pair equally, RBO geometrically discounts
# depth (p^(d-1)), which is what retrieval/recsys ranking comparisons
# actually use (agreement at rank 1 matters more than at rank 25).
# Rankings: brands by revenue vs by quantity, both exact-integer with
# deterministic (value DESC, brand) tiebreaks. The prefix-overlap
# curve comes from ONE histogram of max(rank_x, rank_y) + a running
# sum (no per-depth set intersection); the only float is the
# geometric weight POW(0.9, d-1), snapped to the micro grid at points
# verified far from .5 boundaries, after which every fold is BIGINT
# (a_micro and the partial RBO are integer floor-divisions).
# --------------------------------------------------------------------------
RBO_P_MICRO = 900_000  # p = 0.9 on the micro grid
RBO_DEPTH = 10


@register(
    "rbo_rank_overlap",
    f"""
    WITH stats AS (
        SELECT p.p_brand AS brand,
               CAST(SUM(CAST(ROUND(l.l_extendedprice
                    * (1 - l.l_discount) * 100, 0) AS BIGINT))
                    AS BIGINT) AS rev,
               CAST(SUM(CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS qty
        FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
        GROUP BY 1
    ),
    ranked AS (
        SELECT brand,
               ROW_NUMBER() OVER (ORDER BY rev DESC, brand) AS rx,
               ROW_NUMBER() OVER (ORDER BY qty DESC, brand) AS ry
        FROM stats
    ),
    depths AS (SELECT UNNEST(RANGE(1, {RBO_DEPTH} + 1)) AS d),
    inter AS (
        SELECT t.d,
               CAST((SELECT COUNT(*) FROM ranked r
                     WHERE GREATEST(r.rx, r.ry) <= t.d) AS BIGINT)
                   AS inter_d
        FROM depths t
    ),
    terms AS (
        SELECT d, inter_d,
               CAST(ROUND(POW(0.9, d - 1) * 1000000, 0) AS BIGINT)
                   AS w_micro
        FROM inter
    )
    SELECT CAST(d AS BIGINT) AS d, inter_d,
           (inter_d * 1000000) // d AS a_micro,
           CAST(SUM((w_micro * inter_d) // d)
                OVER (ORDER BY d) // 10 AS BIGINT)
               AS rbo_partial_micro
    FROM terms
    """,
    doc="X254 rank-biased overlap (Webber et al. 2010, p=0.9, depth "
        f"{RBO_DEPTH}) between brand-by-revenue and brand-by-quantity "
        "rankings: exact-integer rankings with deterministic "
        "tiebreaks; prefix overlap via one max(rank,rank) histogram + "
        "running sum; geometric weights micro-snapped off .5 "
        "boundaries; agreement curve and partial RBO all BIGINT floor "
        "division (X88 discipline). The top-weighted complement to "
        "X249's pair-symmetric rank correlations. Python replay + "
        "[0,1]-bound + final-depth-overlap laws.",
    tags=("X254", "X249", "X12", "X7", "X11"),
)
def rbo_rank_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    stats = (li.join(p, p.p_partkey == li.l_partkey)
             .groupBy(F.col("p_brand").alias("brand"))
             .agg(F.sum(F.round(F.col("l_extendedprice")
                                * (1 - F.col("l_discount")) * 100, 0)
                        .cast("long")).cast("long").alias("rev"),
                  F.sum(F.col("l_quantity").cast("long")).cast("long")
                  .alias("qty")))
    ranked = stats.select(
        "brand",
        F.row_number().over(Window.orderBy(F.desc("rev"), F.asc("brand")))
        .alias("rx"),
        F.row_number().over(Window.orderBy(F.desc("qty"), F.asc("brand")))
        .alias("ry"))
    md = ranked.select(F.greatest("rx", "ry").alias("md"))
    depths = spark.createDataFrame([(d,) for d in range(1, RBO_DEPTH + 1)],
                                   "d long")
    inter = (depths.join(F.broadcast(md), F.col("md") <= F.col("d"),
                         "left")
             .groupBy("d")
             .agg(F.count("md").cast("long").alias("inter_d")))
    terms = inter.select(
        "d", "inter_d",
        F.expr("CAST(ROUND(POW(0.9, d - 1) * 1000000, 0) AS BIGINT)")
        .alias("w_micro"))
    wsum = (Window.orderBy("d")
            .rowsBetween(Window.unboundedPreceding, 0))
    return terms.select(
        F.col("d").cast("long").alias("d"), "inter_d",
        F.expr("(inter_d * 1000000) DIV d").alias("a_micro"),
        (F.sum(F.expr("(w_micro * inter_d) DIV d")).over(wsum) / 10)
        .cast("long").alias("rbo_partial_micro"))


# --------------------------------------------------------------------------
# X263: leave-one-group-out influence (grouped DFBETA) — the model-
# diagnostics lens the OLS family lacks: X60 fits, X81 cross-
# validates, X179 jackknifes a RATIO; this measures how much each
# GROUP (brand) moves the global price~quantity slope when deleted —
# Belsley/Kuh/Welsch DFBETA lifted to group granularity, the "which
# data source is steering my model" audit a 100 TB training pipeline
# runs before trusting a fit. One pass folds exact BIGINT moments per
# brand; the global fold is their sum (broadcast back), so every
# leave-one-out slope is a closed-form double from exact integer
# differences — no refit, no second scan. Slopes micro-snapped with
# degenerate-denominator guards (round-6 ADVICE discipline).
# --------------------------------------------------------------------------
@register(
    "loo_group_influence",
    """
    WITH pts AS (
        SELECT p.p_brand AS brand,
               CAST(l.l_quantity AS BIGINT) AS x,
               CAST(ROUND(l.l_extendedprice * 100, 0) AS BIGINT) AS y
        FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    ),
    g AS (
        SELECT brand,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(x) AS BIGINT) AS sx,
               CAST(SUM(y) AS BIGINT) AS sy,
               CAST(SUM(x * x) AS BIGINT) AS sxx,
               CAST(SUM(x * y) AS BIGINT) AS sxy
        FROM pts GROUP BY brand
    ),
    tot AS (
        SELECT CAST(SUM(n) AS BIGINT) AS n,
               CAST(SUM(sx) AS BIGINT) AS sx,
               CAST(SUM(sy) AS BIGINT) AS sy,
               CAST(SUM(sxx) AS BIGINT) AS sxx,
               CAST(SUM(sxy) AS BIGINT) AS sxy
        FROM g
    ),
    bt AS (
        SELECT g.brand, g.n AS n_g,
               CAST(t.n AS DOUBLE) * t.sxy
                   - CAST(t.sx AS DOUBLE) * t.sy AS num_f,
               CAST(t.n AS DOUBLE) * t.sxx
                   - CAST(t.sx AS DOUBLE) * t.sx AS den_f,
               CAST(t.n - g.n AS DOUBLE) * (t.sxy - g.sxy)
                   - CAST(t.sx - g.sx AS DOUBLE) * (t.sy - g.sy)
                   AS num_l,
               CAST(t.n - g.n AS DOUBLE) * (t.sxx - g.sxx)
                   - CAST(t.sx - g.sx AS DOUBLE) * (t.sx - g.sx)
                   AS den_l
        FROM g CROSS JOIN tot t
    )
    SELECT brand, n_g,
           CASE WHEN den_f > 0 THEN
               CAST(ROUND(num_f / den_f * 1000000, 0) AS BIGINT)
           ELSE 0 END AS b_full_micro,
           CASE WHEN den_l > 0 THEN
               CAST(ROUND(num_l / den_l * 1000000, 0) AS BIGINT)
           ELSE 0 END AS b_loo_micro,
           CASE WHEN den_f > 0 AND den_l > 0 THEN
               CAST(ROUND(num_l / den_l * 1000000, 0) AS BIGINT)
               - CAST(ROUND(num_f / den_f * 1000000, 0) AS BIGINT)
           ELSE 0 END AS dfbeta_micro
    FROM bt
    """,
    doc="X263 leave-one-group-out slope influence (grouped DFBETA, "
        "Belsley et al. 1980) for the global price~quantity OLS: one "
        "pass folds exact BIGINT moments per brand, the global fold "
        "is their sum, and every brand's deleted-slope is closed-form "
        "from integer differences in double (X240 exact-fold "
        "discipline) — no refit, no second scan. Micro-snapped with "
        "zero-variance guards. The which-source-steers-the-model "
        "audit next to X81/X179. Python replay + sum-of-moments + "
        "small-group-small-influence laws.",
    tags=("X263", "X60", "X80", "X7"),
)
def loo_group_influence(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    pts = (li.join(p, p.p_partkey == li.l_partkey)
           .select(F.col("p_brand").alias("brand"),
                   F.col("l_quantity").cast("long").alias("x"),
                   F.round(F.col("l_extendedprice") * 100, 0)
                   .cast("long").alias("y")))
    g = pts.groupBy("brand").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"))
    tot = g.agg(F.sum("n").cast("long").alias("tn"),
                F.sum("sx").cast("long").alias("tsx"),
                F.sum("sy").cast("long").alias("tsy"),
                F.sum("sxx").cast("long").alias("tsxx"),
                F.sum("sxy").cast("long").alias("tsxy"))
    both = (g.crossJoin(F.broadcast(tot))
            .selectExpr(
                "brand", "n AS n_g",
                "CAST(tn AS DOUBLE) * tsxy"
                " - CAST(tsx AS DOUBLE) * tsy AS num_f",
                "CAST(tn AS DOUBLE) * tsxx"
                " - CAST(tsx AS DOUBLE) * tsx AS den_f",
                "CAST(tn - n AS DOUBLE) * (tsxy - sxy)"
                " - CAST(tsx - sx AS DOUBLE) * (tsy - sy) AS num_l",
                "CAST(tn - n AS DOUBLE) * (tsxx - sxx)"
                " - CAST(tsx - sx AS DOUBLE) * (tsx - sx) AS den_l"))
    return both.selectExpr(
        "brand", "n_g",
        "CASE WHEN den_f > 0 THEN"
        " CAST(ROUND(num_f / den_f * 1000000, 0) AS BIGINT)"
        " ELSE 0L END AS b_full_micro",
        "CASE WHEN den_l > 0 THEN"
        " CAST(ROUND(num_l / den_l * 1000000, 0) AS BIGINT)"
        " ELSE 0L END AS b_loo_micro",
        "CASE WHEN den_f > 0 AND den_l > 0 THEN"
        " CAST(ROUND(num_l / den_l * 1000000, 0) AS BIGINT)"
        " - CAST(ROUND(num_f / den_f * 1000000, 0) AS BIGINT)"
        " ELSE 0L END AS dfbeta_micro")


# --------------------------------------------------------------------------
# X273: Cochran-Mantel-Haenszel stratified 2x2 association — the
# meta-analytic test X73's chi-square cannot do: X73 tests MARGINAL
# independence (one pooled table, Simpson-vulnerable — exactly the
# reversal X144 audits), CMH tests the COMMON association of
# (discount exposure) x (return outcome) across order-priority strata,
# pooling per-stratum evidence with inverse-variance weights plus the
# Mantel-Haenszel common odds ratio. Exactness: per-stratum counts
# are exact BIGINT; each stratum's expectation / variance / MH terms
# are ONE textually-identical arithmetic expression over those counts
# (DOUBLE products so a 100 TB stratum cannot overflow BIGINT
# multiplication; IEEE ops are deterministic cross-engine) snapped to
# the nano grid; the statistic folds the SNAPPED integers, so float
# summation order never matters. Mantel-Haenszel (1959); [EXT].
# Scale: one fact pass -> 5 stratum rows; everything after is
# arithmetic on those rows.
# --------------------------------------------------------------------------
CMH_DISC_CENTI = 6  # exposure: discount >= 6 centi-units
CMH_LABEL = "R"


@register(
    "cmh_stratified_assoc",
    f"""
    WITH base AS (
        SELECT o.o_orderpriority AS stratum,
               CASE WHEN CAST(FLOOR(l.l_discount * 100 + 0.5) AS BIGINT)
                         >= {CMH_DISC_CENTI} THEN 1 ELSE 0 END AS x,
               CASE WHEN l.l_returnflag = '{CMH_LABEL}' THEN 1 ELSE 0
                    END AS y
        FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
    ),
    st AS (
        SELECT stratum,
               CAST(SUM(x * y) AS BIGINT) AS a,
               CAST(SUM(x * (1 - y)) AS BIGINT) AS b,
               CAST(SUM((1 - x) * y) AS BIGINT) AS c,
               CAST(SUM((1 - x) * (1 - y)) AS BIGINT) AS d,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM base GROUP BY stratum
    ),
    terms AS (
        SELECT stratum, a, b, c, d, n,
               CAST(ROUND(CAST(a + b AS DOUBLE) * (a + c)
                    * 1000000000.0 / n, 0) AS BIGINT) AS e_nano,
               CAST(ROUND(CAST(a + b AS DOUBLE) * (c + d) * (a + c)
                    * (b + d) * 1000000000.0
                    / (CAST(n AS DOUBLE) * n * (n - 1)), 0) AS BIGINT)
                   AS v_nano,
               CAST(ROUND(CAST(a AS DOUBLE) * d * 1000000000.0 / n, 0)
                    AS BIGINT) AS ad_nano,
               CAST(ROUND(CAST(b AS DOUBLE) * c * 1000000000.0 / n, 0)
                    AS BIGINT) AS bc_nano
        FROM st
    ),
    summary AS (
        SELECT CAST(SUM(a * 1000000000 - e_nano) AS BIGINT) AS s_nano,
               CAST(SUM(v_nano) AS BIGINT) AS v_sum_nano,
               CAST(SUM(ad_nano) AS BIGINT) AS ad_sum_nano,
               CAST(SUM(bc_nano) AS BIGINT) AS bc_sum_nano,
               CAST(SUM(a) AS BIGINT) AS a, CAST(SUM(b) AS BIGINT) AS b,
               CAST(SUM(c) AS BIGINT) AS c, CAST(SUM(d) AS BIGINT) AS d,
               CAST(SUM(n) AS BIGINT) AS n
        FROM terms
    )
    SELECT stratum, a, b, c, d, n, e_nano, v_nano, ad_nano, bc_nano,
           CAST(0 AS BIGINT) AS chi2_micro, CAST(0 AS BIGINT) AS or_micro
    FROM terms
    UNION ALL
    SELECT 'ALL', a, b, c, d, n,
           s_nano AS e_nano, v_sum_nano AS v_nano,
           ad_sum_nano AS ad_nano, bc_sum_nano AS bc_nano,
           CASE WHEN v_sum_nano > 0 THEN
               CAST(ROUND(CAST(s_nano AS DOUBLE) * s_nano
                    / v_sum_nano / 1000.0, 0) AS BIGINT)
           ELSE 0 END AS chi2_micro,
           CASE WHEN bc_sum_nano > 0 THEN
               CAST(ROUND(CAST(ad_sum_nano AS DOUBLE) * 1000000.0
                    / bc_sum_nano, 0) AS BIGINT)
           ELSE 0 END AS or_micro
    FROM summary
    """,
    doc=f"X273 Cochran-Mantel-Haenszel test of (discount >= "
        f"{CMH_DISC_CENTI} centi) x (l_returnflag='{CMH_LABEL}') "
        "association stratified by order priority: exact BIGINT 2x2 "
        "counts per stratum, expectation/variance/MH-odds terms as "
        "single textually-identical DOUBLE expressions snapped to the "
        "nano grid, statistic and common odds ratio folded from the "
        "snapped integers (no float summation). Per-stratum rows + "
        "'ALL' summary row. Complements X73 (marginal chi2) and X144 "
        "(Simpson audit). Python replay + marginal-consistency laws.",
    tags=("X273", "X73", "X144", "X3", "X7"),
)
def cmh_stratified_assoc(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    base = (li.join(o, o.o_orderkey == li.l_orderkey)
            .select(
                F.col("o_orderpriority").alias("stratum"),
                F.when(F.expr("CAST(FLOOR(l_discount * 100 + 0.5)"
                              " AS BIGINT)") >= CMH_DISC_CENTI, 1)
                .otherwise(0).alias("x"),
                F.when(F.col("l_returnflag") == CMH_LABEL, 1)
                .otherwise(0).alias("y")))
    st = base.groupBy("stratum").agg(
        F.sum(F.col("x") * F.col("y")).cast("long").alias("a"),
        F.sum(F.col("x") * (1 - F.col("y"))).cast("long").alias("b"),
        F.sum((1 - F.col("x")) * F.col("y")).cast("long").alias("c"),
        F.sum((1 - F.col("x")) * (1 - F.col("y"))).cast("long")
        .alias("d"),
        F.count("*").cast("long").alias("n"))
    terms = st.selectExpr(
        "stratum", "a", "b", "c", "d", "n",
        "CAST(ROUND(CAST(a + b AS DOUBLE) * (a + c) * 1000000000.0"
        " / n, 0) AS BIGINT) AS e_nano",
        "CAST(ROUND(CAST(a + b AS DOUBLE) * (c + d) * (a + c)"
        " * (b + d) * 1000000000.0"
        " / (CAST(n AS DOUBLE) * n * (n - 1)), 0) AS BIGINT) AS v_nano",
        "CAST(ROUND(CAST(a AS DOUBLE) * d * 1000000000.0 / n, 0)"
        " AS BIGINT) AS ad_nano",
        "CAST(ROUND(CAST(b AS DOUBLE) * c * 1000000000.0 / n, 0)"
        " AS BIGINT) AS bc_nano")
    per = terms.selectExpr(
        "stratum", "a", "b", "c", "d", "n", "e_nano", "v_nano",
        "ad_nano", "bc_nano", "CAST(0 AS BIGINT) AS chi2_micro",
        "CAST(0 AS BIGINT) AS or_micro")
    summary = (terms.agg(
        F.sum(F.col("a") * F.lit(1000000000) - F.col("e_nano"))
        .cast("long").alias("s_nano"),
        F.sum("v_nano").cast("long").alias("v_sum_nano"),
        F.sum("ad_nano").cast("long").alias("ad_sum_nano"),
        F.sum("bc_nano").cast("long").alias("bc_sum_nano"),
        F.sum("a").cast("long").alias("a"),
        F.sum("b").cast("long").alias("b"),
        F.sum("c").cast("long").alias("c"),
        F.sum("d").cast("long").alias("d"),
        F.sum("n").cast("long").alias("n"))
        .selectExpr(
            "'ALL' AS stratum", "a", "b", "c", "d", "n",
            "s_nano AS e_nano", "v_sum_nano AS v_nano",
            "ad_sum_nano AS ad_nano", "bc_sum_nano AS bc_nano",
            "CASE WHEN v_sum_nano > 0 THEN"
            " CAST(ROUND(CAST(s_nano AS DOUBLE) * s_nano"
            " / v_sum_nano / 1000.0, 0) AS BIGINT)"
            " ELSE 0L END AS chi2_micro",
            "CASE WHEN bc_sum_nano > 0 THEN"
            " CAST(ROUND(CAST(ad_sum_nano AS DOUBLE) * 1000000.0"
            " / bc_sum_nano, 0) AS BIGINT)"
            " ELSE 0L END AS or_micro"))
    return per.unionByName(summary)


# --------------------------------------------------------------------------
# X280: Friedman rank test — the repeated-measures / randomized-block
# complement of X245's one-way Kruskal-Wallis: k = 5 order priorities
# are the treatments, ISO weeks the blocks, weekly revenue cents the
# response; ranks are taken WITHIN each block, so between-week level
# shifts (seasonality, growth) cancel instead of polluting the
# location comparison. Exactness: ranks live on the DOUBLED grid
# (dr = 2*#smaller + #equal + 1, so tie-averaged ranks stay integer);
# the statistic uses the doubled-rank identity
#     chi2 = (3*sum(Rd_j^2) - 3*n^2*k*(k+1)^2) / (n*k*(k+1))
# and the tie-corrected variant multiplies by D2/(D2 - T),
# D2 = n*k*(k^2-1), T = sum(e^3 - e) over tie groups — each final
# value ONE correctly-rounded DOUBLE division of exact integer
# products (DECIMAL(38,0)/HUGEINT where the cross-product can pass
# 2^63). Within-block rank counting is a k x k bounded self-join
# (5 rows per block), never data-sized. [EXT]
# --------------------------------------------------------------------------
FRIEDMAN_K = 5


@register(
    "friedman_priority_weeks",
    f"""
    WITH cell AS (
        SELECT CAST(date_trunc('week', o_orderdate) AS DATE) AS wk,
               o_orderpriority AS pri,
               CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5)
                    AS BIGINT)) AS BIGINT) AS y
        FROM orders GROUP BY 1, 2
    ),
    blocks AS (
        SELECT wk FROM cell GROUP BY wk
        HAVING COUNT(*) = {FRIEDMAN_K}
    ),
    cb AS (SELECT c.* FROM cell c JOIN blocks b ON b.wk = c.wk),
    ranked AS (
        SELECT c1.wk, c1.pri,
               CAST(2 * SUM(CASE WHEN c2.y < c1.y THEN 1 ELSE 0 END)
                    + SUM(CASE WHEN c2.y = c1.y THEN 1 ELSE 0 END)
                    + 1 AS BIGINT) AS dr
        FROM cb c1 JOIN cb c2 ON c2.wk = c1.wk
        GROUP BY c1.wk, c1.pri, c1.y
    ),
    rsum AS (
        SELECT pri, CAST(SUM(dr) AS BIGINT) AS rd_sum
        FROM ranked GROUP BY pri
    ),
    ties AS (
        SELECT COALESCE(CAST(SUM(e * e * e - e) AS BIGINT), 0) AS t
        FROM (SELECT CAST(COUNT(*) AS BIGINT) AS e
              FROM cb GROUP BY wk, y) g
    ),
    nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM blocks),
    stats AS (
        SELECT n, t,
               (SELECT CAST(SUM(rd_sum * rd_sum) AS BIGINT)
                FROM rsum) AS sq,
               n * {FRIEDMAN_K} * ({FRIEDMAN_K} + 1) AS d1,
               n * {FRIEDMAN_K}
                 * ({FRIEDMAN_K} * {FRIEDMAN_K} - 1) AS d2
        FROM nn CROSS JOIN ties
    )
    SELECT r.pri AS priority, s.n AS n_blocks, r.rd_sum,
           -- r8 ADVICE: widen sq/n BEFORE any multiply (one wide
           -- operand makes the whole chain HUGEINT) instead of
           -- casting an already-64-bit product.
           CAST(ROUND(CAST((CAST(s.sq AS HUGEINT) * 3
                    - CAST(s.n AS HUGEINT) * s.n * 3 * {FRIEDMAN_K}
                    * ({FRIEDMAN_K} + 1) * ({FRIEDMAN_K} + 1))
                    * 1000000 AS DOUBLE) / s.d1, 0) AS BIGINT)
               AS chi2_micro,
           s.t AS tie_sum,
           -- r8 ADVICE: fully-tied degenerate case (t = d2, every
           -- retained block all-equal) would divide by zero with
           -- divergent engine semantics — guard like mcnemar/fairness.
           CASE WHEN s.d2 > s.t THEN
               CAST(ROUND(CAST((CAST(s.sq AS HUGEINT) * 3
                    - CAST(s.n AS HUGEINT) * s.n * 3 * {FRIEDMAN_K}
                    * ({FRIEDMAN_K} + 1) * ({FRIEDMAN_K} + 1))
                    * s.d2 * 1000000 AS DOUBLE)
                    / (s.d1 * (s.d2 - s.t)), 0) AS BIGINT)
           ELSE 0 END AS chi2_tie_micro
    FROM rsum r CROSS JOIN stats s
    """,
    doc=f"X280 Friedman rank test of the {FRIEDMAN_K} order priorities "
        "across ISO-week blocks (weekly revenue cents as response): "
        "within-block doubled ranks (2*#smaller + #equal + 1 — "
        "tie-averages stay integer), doubled-rank chi-square plus the "
        "tie-corrected variant, each ONE correctly-rounded DOUBLE "
        "division of exact integer products (DECIMAL(38,0)/HUGEINT "
        "cross-products). Rank counting is a k x k bounded join per "
        "block, never data-sized; the weekly cell aggregate is the "
        "only fact pass. Repeated-measures complement of X245 "
        "(one-way KW) and X273 (stratified 2x2 CMH). Python replay + "
        "rank-sum-identity laws (sum Rd_j = n*k*(k+1)).",
    tags=("X280", "X245", "X273", "X7", "X3"),
)
def friedman_priority_weeks(spark: SparkSession,
                            sf_dir: str) -> DataFrame:
    k = FRIEDMAN_K
    o = load_table(spark, sf_dir, "orders")
    cell = (o.groupBy(
        F.date_trunc("week", "o_orderdate").cast("date").alias("wk"),
        F.col("o_orderpriority").alias("pri"))
        .agg(F.sum(F.expr("CAST(FLOOR(o_totalprice * 100 + 0.5)"
                          " AS BIGINT)")).cast("long").alias("y")))
    blocks = (cell.groupBy("wk").agg(F.count("*").alias("c"))
              .filter(F.col("c") == k).select("wk"))
    cb = cell.join(blocks, "wk")
    other = cb.select(F.col("wk"), F.col("y").alias("y2"))
    ranked = (cb.join(other, "wk")
              .groupBy("wk", "pri", "y")
              .agg((2 * F.sum(F.when(F.col("y2") < F.col("y"), 1)
                              .otherwise(0))
                    + F.sum(F.when(F.col("y2") == F.col("y"), 1)
                            .otherwise(0)) + 1)
                   .cast("long").alias("dr")))
    rsum = ranked.groupBy("pri").agg(
        F.sum("dr").cast("long").alias("rd_sum"))
    ties = (cb.groupBy("wk", "y").agg(F.count("*").cast("long")
                                      .alias("e"))
            .agg(F.coalesce(
                F.sum(F.col("e") * F.col("e") * F.col("e")
                      - F.col("e")), F.lit(0)).cast("long").alias("t")))
    nn = blocks.agg(F.count("*").cast("long").alias("n"))
    sq = rsum.agg(F.sum(F.col("rd_sum") * F.col("rd_sum"))
                  .cast("long").alias("sq"))
    stats = (nn.crossJoin(ties).crossJoin(sq)
             .selectExpr(
                 "n", "t", "sq",
                 f"n * {k} * ({k} + 1) AS d1",
                 f"n * {k} * ({k} * {k} - 1) AS d2"))
    # r8 ADVICE: widen sq/n BEFORE any multiply, and guard the
    # fully-tied t = d2 degenerate case (divide-by-zero otherwise) —
    # textually mirrored in the oracle.
    return (rsum.crossJoin(F.broadcast(stats))
            .selectExpr(
                "pri AS priority", "n AS n_blocks", "rd_sum",
                f"CAST(ROUND(CAST((CAST(sq AS DECIMAL(38,0)) * 3"
                f" - CAST(n AS DECIMAL(38,0)) * n * 3 * {k}"
                f" * ({k} + 1) * ({k} + 1))"
                " * 1000000 AS DOUBLE) / d1, 0) AS BIGINT)"
                " AS chi2_micro",
                "t AS tie_sum",
                "CASE WHEN d2 > t THEN"
                f" CAST(ROUND(CAST((CAST(sq AS DECIMAL(38,0)) * 3"
                f" - CAST(n AS DECIMAL(38,0)) * n * 3 * {k}"
                f" * ({k} + 1) * ({k} + 1))"
                " * d2 * 1000000 AS DOUBLE)"
                " / (d1 * (d2 - t)), 0) AS BIGINT)"
                " ELSE 0L END AS chi2_tie_micro"))


# --------------------------------------------------------------------------
# X283: two-sample Kolmogorov-Smirnov test — the DISTRIBUTIONAL
# two-sample test the location/association family lacks (X245 KW and
# X280 Friedman compare locations, X273 CMH association, X122 EMD is
# a binned distance, not a test): D = sup |F1 - F2| over the pooled
# sample detects ANY distributional difference. Exactness: on the
# pooled distinct-cents table, D's argmax runs entirely on BIGINTs
# via cross-multiplication |c1*n2 - c2*n1| (no division before the
# argmax); d_micro is one correctly-rounded DOUBLE division of a
# DECIMAL(38,0)/HUGEINT-exact dividend; the alpha thresholds
# c(a)*sqrt((n1+n2)/(n1*n2)) use Python-precomputed integer micro
# constants for the irrational c(a) (the X99 discount-table pattern)
# and one textually-identical sqrt expression. The distinct-cents
# table is VALUE-bounded (price domain), not data-bounded, so the
# cumulative windows stay fixed-size at any SF (X137 precedent). [EXT]
# --------------------------------------------------------------------------
KS_C05_MICRO = 1358102  # round(1e6 * sqrt(ln(2/0.05)/2))
KS_C01_MICRO = 1627624  # round(1e6 * sqrt(ln(2/0.01)/2))


@register(
    "ks_two_sample_prices",
    f"""
    WITH h AS (
        SELECT CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT) AS v,
               CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0
                        END) AS BIGINT) AS a,
               CAST(SUM(CASE WHEN l_returnflag = 'N' THEN 1 ELSE 0
                        END) AS BIGINT) AS b
        FROM lineitem WHERE l_returnflag IN ('R', 'N')
        GROUP BY 1
    ),
    tot AS (SELECT CAST(SUM(a) AS BIGINT) AS n1,
                   CAST(SUM(b) AS BIGINT) AS n2 FROM h),
    cum AS (
        SELECT v, SUM(a) OVER (ORDER BY v) AS c1,
               SUM(b) OVER (ORDER BY v) AS c2
        FROM h
    ),
    best AS (
        SELECT c.v, ABS(c.c1 * t.n2 - c.c2 * t.n1) AS d_num,
               t.n1, t.n2
        FROM cum c CROSS JOIN tot t
        ORDER BY ABS(c.c1 * t.n2 - c.c2 * t.n1) DESC, c.v
        LIMIT 1
    )
    SELECT n1, n2,
           -- d_num = |c1*n2 - c2*n1| over window-sum HUGEINTs; CAST
           -- the OUTPUT to BIGINT to match Spark's LongType (d_num <=
           -- n1*n2 ~ 9e10 at sf0.1; int64 headroom holds to sf ~1000,
           -- where n1*n2 ~ 9e18 approaches 2^63 — re-scale the cents
           -- grid before then). Values were always correct; the r8
           -- driver hash-red was the uncast HUGEINT representation.
           CAST(d_num AS BIGINT) AS d_num, v AS arg_cents,
           CAST(ROUND(CAST(CAST(d_num AS HUGEINT) * 1000000 AS DOUBLE)
                / (n1 * n2), 0) AS BIGINT) AS d_micro,
           CAST(ROUND({KS_C05_MICRO} * SQRT(CAST(n1 + n2 AS DOUBLE)
                / (CAST(n1 AS DOUBLE) * n2)), 0) AS BIGINT)
               AS thr05_micro,
           CAST(ROUND({KS_C01_MICRO} * SQRT(CAST(n1 + n2 AS DOUBLE)
                / (CAST(n1 AS DOUBLE) * n2)), 0) AS BIGINT)
               AS thr01_micro,
           CASE WHEN CAST(ROUND(CAST(CAST(d_num AS HUGEINT) * 1000000
                    AS DOUBLE) / (n1 * n2), 0) AS BIGINT)
                > CAST(ROUND({KS_C05_MICRO}
                    * SQRT(CAST(n1 + n2 AS DOUBLE)
                    / (CAST(n1 AS DOUBLE) * n2)), 0) AS BIGINT)
                THEN 1 ELSE 0 END AS reject05,
           CASE WHEN CAST(ROUND(CAST(CAST(d_num AS HUGEINT) * 1000000
                    AS DOUBLE) / (n1 * n2), 0) AS BIGINT)
                > CAST(ROUND({KS_C01_MICRO}
                    * SQRT(CAST(n1 + n2 AS DOUBLE)
                    / (CAST(n1 AS DOUBLE) * n2)), 0) AS BIGINT)
                THEN 1 ELSE 0 END AS reject01
    FROM best
    """,
    doc="X283 two-sample Kolmogorov-Smirnov test of returned (R) vs "
        "delivered (N) price-cent distributions: D argmax on BIGINT "
        "cross-products |c1*n2 - c2*n1| over the value-bounded pooled "
        "distinct-cents table (no float ordered), d_micro one "
        "correctly-rounded DOUBLE division of a HUGEINT/DECIMAL-exact "
        "dividend, and 5%/1% large-sample thresholds from Python-"
        "precomputed c(alpha) micro constants (X99 pattern) times one "
        "textually-identical sqrt expression. The distribution-level "
        "two-sample test next to X245/X280 (location) and X122 "
        "(binned distance). Python replay + D-bound laws "
        "(0 <= D <= n1*n2; argmax attained).",
    tags=("X283", "X245", "X122", "X7", "X11"),
)
def ks_two_sample_prices(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    h = (li.filter(F.col("l_returnflag").isin("R", "N"))
         .groupBy(F.expr("CAST(FLOOR(l_extendedprice * 100 + 0.5)"
                         " AS BIGINT)").alias("v"))
         .agg(F.sum(F.when(F.col("l_returnflag") == "R", 1)
                    .otherwise(0)).cast("long").alias("a"),
              F.sum(F.when(F.col("l_returnflag") == "N", 1)
                    .otherwise(0)).cast("long").alias("b")))
    tot = h.agg(F.sum("a").cast("long").alias("n1"),
                F.sum("b").cast("long").alias("n2"))
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    cum = h.select("v", F.sum("a").over(w).alias("c1"),
                   F.sum("b").over(w).alias("c2"))
    best = (cum.crossJoin(F.broadcast(tot))
            .select("v", F.abs(F.col("c1") * F.col("n2")
                               - F.col("c2") * F.col("n1"))
                    .alias("d_num"), "n1", "n2")
            .orderBy(F.desc("d_num"), F.asc("v")).limit(1))
    d_micro = ("CAST(ROUND(CAST(CAST(d_num AS DECIMAL(38,0)) * 1000000"
               " AS DOUBLE) / (n1 * n2), 0) AS BIGINT)")
    thr = ("CAST(ROUND({c} * SQRT(CAST(n1 + n2 AS DOUBLE)"
           " / (CAST(n1 AS DOUBLE) * n2)), 0) AS BIGINT)")
    t05 = thr.format(c=KS_C05_MICRO)
    t01 = thr.format(c=KS_C01_MICRO)
    return best.selectExpr(
        "n1", "n2", "d_num", "v AS arg_cents",
        f"{d_micro} AS d_micro",
        f"{t05} AS thr05_micro",
        f"{t01} AS thr01_micro",
        f"CASE WHEN {d_micro} > {t05} THEN 1 ELSE 0 END AS reject05",
        f"CASE WHEN {d_micro} > {t01} THEN 1 ELSE 0 END AS reject01")


# --------------------------------------------------------------------------
# X284: Brown-Forsythe variance-homogeneity test — the SPREAD
# counterpart of the location tests (X245 KW, X280 Friedman): are
# price dispersions equal across supplier nations? Levene's ANOVA on
# absolute deviations, with Brown-Forsythe's median centering (robust
# to heavy tails). Exactness: medians of integer cents live on the
# DOUBLED grid (med2 = x_(floor((n+1)/2)) + x_(ceil((n+1)/2)), so
# even-n averages stay integer); deviations z = |2x - med2| are exact
# BIGINTs; group means of z are micro-snapped (ONE correctly-rounded
# division each, the fairness/X272 discipline); the between/within
# sums of squares over snapped micros fold in DECIMAL(38,0)/HUGEINT
# (per-row squares ~1e26 — no BIGINT overflow, no float summation);
# the F statistic is ONE final DOUBLE division of deterministically
# rounded products. Per-group median windows are group-partitioned;
# the fact scan is the only data-sized pass. [EXT]
# --------------------------------------------------------------------------
@register(
    "brown_forsythe_nations",
    """
    WITH base AS (
        SELECT n.n_name AS grp,
               CAST(FLOOR(l.l_extendedprice * 100 + 0.5) AS BIGINT)
                   AS x
        FROM lineitem l
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN nation n ON n.n_nationkey = s.s_nationkey
    ),
    rk AS (
        SELECT grp, x,
               ROW_NUMBER() OVER (PARTITION BY grp ORDER BY x) AS rn,
               COUNT(*) OVER (PARTITION BY grp) AS n
        FROM base
    ),
    med AS (
        SELECT grp, CAST(SUM(CASE WHEN rn = (n + 1) // 2 THEN x
                                  ELSE 0 END)
                       + SUM(CASE WHEN rn = (n + 2) // 2 THEN x
                                  ELSE 0 END) AS BIGINT) AS med2
        FROM rk GROUP BY grp
    ),
    dev AS (
        SELECT b.grp, ABS(2 * b.x - m.med2) AS z
        FROM base b JOIN med m ON m.grp = b.grp
    ),
    g AS (
        SELECT grp, CAST(COUNT(*) AS BIGINT) AS nj,
               CAST(SUM(z) AS BIGINT) AS zj
        FROM dev GROUP BY grp
    ),
    tot AS (
        SELECT CAST(SUM(nj) AS BIGINT) AS n,
               CAST(SUM(zj) AS BIGINT) AS z,
               CAST(COUNT(*) AS BIGINT) AS k
        FROM g
    ),
    gz AS (
        SELECT g.grp, g.nj, g.zj,
               CAST(ROUND(CAST(CAST(g.zj AS HUGEINT) * 1000000
                    AS DOUBLE) / g.nj, 0) AS BIGINT) AS zbar_micro,
               CAST(ROUND(CAST(CAST(t.z AS HUGEINT) * 1000000
                    AS DOUBLE) / t.n, 0) AS BIGINT) AS zbar_all_micro
        FROM g CROSS JOIN tot t
    ),
    ssb AS (
        SELECT CAST(SUM(CAST(nj AS HUGEINT)
                 * (zbar_micro - zbar_all_micro)
                 * (zbar_micro - zbar_all_micro)) AS HUGEINT) AS v
        FROM gz
    ),
    ssw AS (
        SELECT CAST(SUM(CAST(d.z * 1000000 - gz.zbar_micro AS HUGEINT)
                 * (d.z * 1000000 - gz.zbar_micro)) AS HUGEINT) AS v
        FROM dev d JOIN gz ON gz.grp = d.grp
    )
    SELECT gz.grp, gz.nj, gz.zj, gz.zbar_micro,
           t.n AS n_total, t.k,
           CAST(ROUND(CAST(ssb.v AS DOUBLE) * (t.n - t.k) * 1000000
                / (CAST(ssw.v AS DOUBLE) * (t.k - 1)), 0) AS BIGINT)
               AS f_micro
    FROM gz CROSS JOIN tot t CROSS JOIN ssb CROSS JOIN ssw
    """,
    doc="X284 Brown-Forsythe variance-homogeneity test of price cents "
        "across supplier nations: doubled-grid group medians (even-n "
        "averages stay integer), exact BIGINT absolute deviations, "
        "micro-snapped deviation means (one correctly-rounded "
        "division each), DECIMAL(38,0)/HUGEINT between/within sums of "
        "squares, and ONE final DOUBLE division for F. The spread "
        "test next to X245/X280 (location) and X283 (distribution). "
        "Python replay + decomposition laws (SSB + SSW vs total on "
        "the snapped grid).",
    tags=("X284", "X245", "X283", "X7", "X10"),
)
def brown_forsythe_nations(spark: SparkSession,
                           sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    base = (li.join(s, s.s_suppkey == li.l_suppkey)
            .join(F.broadcast(n), n.n_nationkey == s.s_nationkey)
            .select(F.col("n_name").alias("grp"),
                    F.expr("CAST(FLOOR(l_extendedprice * 100 + 0.5)"
                           " AS BIGINT)").alias("x")))
    from ..caching import persist_tracked

    base = persist_tracked(base)
    wr = Window.partitionBy("grp").orderBy("x")
    wn = Window.partitionBy("grp")
    rk = base.select("grp", "x",
                     F.row_number().over(wr).alias("rn"),
                     F.count("*").over(wn).alias("nw"))
    med = (rk.selectExpr(
        "grp",
        "CASE WHEN rn = (nw + 1) DIV 2 THEN x ELSE 0 END AS mlo",
        "CASE WHEN rn = (nw + 2) DIV 2 THEN x ELSE 0 END AS mhi")
        .groupBy("grp")
        .agg((F.sum("mlo") + F.sum("mhi")).cast("long").alias("med2")))
    dev = (base.join(F.broadcast(med), "grp")
           .select("grp", F.abs(2 * F.col("x") - F.col("med2"))
                   .alias("z")))
    g = dev.groupBy("grp").agg(
        F.count("*").cast("long").alias("nj"),
        F.sum("z").cast("long").alias("zj"))
    tot = g.agg(F.sum("nj").cast("long").alias("n"),
                F.sum("zj").cast("long").alias("z"),
                F.count("*").cast("long").alias("k"))
    gz = (g.crossJoin(F.broadcast(tot))
          .selectExpr(
              "grp", "nj", "zj",
              "CAST(ROUND(CAST(CAST(zj AS DECIMAL(38,0)) * 1000000"
              " AS DOUBLE) / nj, 0) AS BIGINT) AS zbar_micro",
              "CAST(ROUND(CAST(CAST(z AS DECIMAL(38,0)) * 1000000"
              " AS DOUBLE) / n, 0) AS BIGINT) AS zbar_all_micro"))
    gz = persist_tracked(gz)
    ssb = gz.selectExpr(
        "CAST(nj AS DECIMAL(38,0))"
        " * (zbar_micro - zbar_all_micro)"
        " * (zbar_micro - zbar_all_micro) AS sq").agg(
        F.sum("sq").alias("v"))
    ssw = (dev.join(F.broadcast(gz.select("grp", "zbar_micro")), "grp")
           .selectExpr(
               "CAST(z * 1000000 - zbar_micro AS DECIMAL(38,0))"
               " * (z * 1000000 - zbar_micro) AS sq")
           .agg(F.sum("sq").alias("v")))
    return (gz.crossJoin(F.broadcast(tot))
            .crossJoin(F.broadcast(ssb.selectExpr("v AS ssb_v")))
            .crossJoin(F.broadcast(ssw.selectExpr("v AS ssw_v")))
            .selectExpr(
                "grp", "nj", "zj", "zbar_micro",
                "n AS n_total", "k",
                "CAST(ROUND(CAST(ssb_v AS DOUBLE) * (n - k) * 1000000"
                " / (CAST(ssw_v AS DOUBLE) * (k - 1)), 0) AS BIGINT)"
                " AS f_micro"))


# --------------------------------------------------------------------------
# X287: Wald-Wolfowitz runs test — the RANDOMNESS family the test
# battery lacks (X245/X280/X283/X284 compare groups, X159 tests
# monotone trend, X236 alarms on control limits): is the sequence of
# above/below-median daily revenues random, or does it cluster into
# runs (momentum) / alternate (mean reversion)? Exactness: the day
# median lives on the DOUBLED cents grid (X284 pattern), signs are
# exact comparisons, the run count is an integer lag fold, and
# E[R] = 1 + 2*n1*n2/N, Var[R] = 2*n1*n2*(2*n1*n2 - N) /
# (N^2 * (N-1)) are each ONE correctly-rounded division of
# HUGEINT-exact products; z is one textually-identical SQRT + one
# division. The daily aggregate is the only data-sized pass; all
# windows run over the CALENDAR-bounded day table. [EXT]
# --------------------------------------------------------------------------
@register(
    "runs_test_daily_revenue",
    """
    WITH daily AS (
        SELECT o_orderdate AS day,
               CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5)
                    AS BIGINT)) AS BIGINT) AS rev
        FROM orders GROUP BY 1
    ),
    rk AS (
        SELECT day, rev,
               ROW_NUMBER() OVER (ORDER BY rev, day) AS rn,
               COUNT(*) OVER () AS nd
        FROM daily
    ),
    med AS (
        SELECT CAST(SUM(CASE WHEN rn = (nd + 1) // 2 THEN rev
                             ELSE 0 END)
                  + SUM(CASE WHEN rn = (nd + 2) // 2 THEN rev
                             ELSE 0 END) AS BIGINT) AS med2
        FROM rk
    ),
    signs AS (
        SELECT d.day, CASE WHEN 2 * d.rev > m.med2 THEN 1 ELSE 0 END
                   AS s
        FROM daily d CROSS JOIN med m
        WHERE 2 * d.rev <> m.med2
    ),
    runs AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(s) AS BIGINT) AS n1,
               CAST(COUNT(*) - SUM(s) AS BIGINT) AS n2,
               CAST(1 + SUM(CASE WHEN s <> prev THEN 1 ELSE 0 END)
                    AS BIGINT) AS r
        FROM (SELECT s, LAG(s) OVER (ORDER BY day) AS prev
              FROM signs)
    ),
    stats AS (
        SELECT n, n1, n2, r,
               1000000 + CAST(ROUND(CAST(CAST(2 * n1 AS HUGEINT) * n2
                   * 1000000 AS DOUBLE) / n, 0) AS BIGINT) AS e_micro,
               CAST(ROUND(CAST(CAST(2 * n1 AS HUGEINT) * n2
                   * (2 * n1 * n2 - n) * 1000000000 AS DOUBLE)
                   / (CAST(n AS HUGEINT) * n * (n - 1)), 0) AS BIGINT)
                   AS var_nano
        FROM runs
    )
    SELECT s.n AS n_days, s.n1 AS n_above, s.n2 AS n_below, s.r
               AS runs,
           m.med2 AS median_cents2, s.e_micro, s.var_nano,
           CASE WHEN s.var_nano > 0 THEN
               CAST(ROUND(CAST(s.r * 1000000 - s.e_micro AS DOUBLE)
                    / SQRT(CAST(s.var_nano AS DOUBLE) / 1000000000.0),
                    0) AS BIGINT)
           ELSE 0 END AS z_micro
    FROM stats s CROSS JOIN med m
    """,
    doc="X287 Wald-Wolfowitz runs test of the daily-revenue sign "
        "sequence (above/below the doubled-grid day median; "
        "exact-median days dropped per the standard convention): "
        "integer run count from a calendar-bounded lag fold, "
        "E[R]/Var[R] as single correctly-rounded divisions of "
        "HUGEINT-exact products, z one textually-identical SQRT + "
        "division. The RANDOMNESS test next to the group-comparison "
        "battery (X245/X280/X283/X284) and the trend/drift detectors "
        "(X159/X229). Python replay + run-count-bounds laws "
        "(1 <= R <= N; R parity ties to n1/n2).",
    tags=("X287", "X284", "X159", "X7", "X11"),
)
def runs_test_daily_revenue(spark: SparkSession,
                            sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    daily = (o.groupBy(F.col("o_orderdate").alias("day"))
             .agg(F.sum(F.expr("CAST(FLOOR(o_totalprice * 100 + 0.5)"
                               " AS BIGINT)")).cast("long")
                  .alias("rev")))
    from ..caching import persist_tracked

    daily = persist_tracked(daily)
    rk = daily.select(
        "day", "rev",
        F.row_number().over(Window.orderBy("rev", "day")).alias("rn"),
        F.count("*").over(
            Window.rowsBetween(Window.unboundedPreceding,
                               Window.unboundedFollowing)).alias("nd"))
    med = (rk.selectExpr(
        "CASE WHEN rn = (nd + 1) DIV 2 THEN rev ELSE 0 END AS mlo",
        "CASE WHEN rn = (nd + 2) DIV 2 THEN rev ELSE 0 END AS mhi")
        .agg((F.sum("mlo") + F.sum("mhi")).cast("long").alias("med2")))
    signs = (daily.crossJoin(F.broadcast(med))
             .filter(F.expr("2 * rev <> med2"))
             .selectExpr("day",
                         "CASE WHEN 2 * rev > med2 THEN 1 ELSE 0 END"
                         " AS s"))
    lagged = signs.select(
        "s", F.lag("s").over(Window.orderBy("day")).alias("prev"))
    runs = lagged.agg(
        F.count("*").cast("long").alias("n"),
        F.sum("s").cast("long").alias("n1"),
        (F.count("*") - F.sum("s")).cast("long").alias("n2"),
        (1 + F.sum(F.when(F.col("s") != F.col("prev"), 1)
                   .otherwise(0))).cast("long").alias("r"))
    stats = runs.selectExpr(
        "n", "n1", "n2", "r",
        "1000000 + CAST(ROUND(CAST(CAST(2 * n1 AS DECIMAL(38,0)) * n2"
        " * 1000000 AS DOUBLE) / n, 0) AS BIGINT) AS e_micro",
        "CAST(ROUND(CAST(CAST(2 * n1 AS DECIMAL(38,0)) * n2"
        " * (2 * n1 * n2 - n) * 1000000000 AS DOUBLE)"
        " / (CAST(n AS DECIMAL(38,0)) * n * (n - 1)), 0) AS BIGINT)"
        " AS var_nano")
    return (stats.crossJoin(F.broadcast(med))
            .selectExpr(
                "n AS n_days", "n1 AS n_above", "n2 AS n_below",
                "r AS runs", "med2 AS median_cents2", "e_micro",
                "var_nano",
                "CASE WHEN var_nano > 0 THEN"
                " CAST(ROUND(CAST(r * 1000000 - e_micro AS DOUBLE)"
                " / SQRT(CAST(var_nano AS DOUBLE) / 1000000000.0),"
                " 0) AS BIGINT)"
                " ELSE 0 END AS z_micro"))


# --------------------------------------------------------------------------
# X293: Jonckheere-Terpstra ordered-alternative trend test — the
# ORDERED-GROUPS member of the k-sample family (X245 KW is omnibus —
# it cannot use the priority ORDERING; X280 Friedman blocks; X159
# Mann-Kendall trends a single series): does order revenue shift
# monotonically across the five ordered priorities? J doubles to
# J2 = sum over ordered pairs (i < j) of [2*#(a < b) + #(a = b)], an
# EXACT BIGINT counted from per-group value histograms on the
# VALUE-bounded distinct-cents grid (exclusive prefix window per
# group, then one grid self-join over the bounded 5x5 group pairs —
# never a data-sized pair join). E[J2] = (N^2 - sum n_i^2)/2 exactly;
# the tie-corrected null variance (SAS PROC FREQ formula, ~N^3/72)
# exceeds 2^63 at large N, so it is folded as ONE textually-
# identical DOUBLE expression over HUGEINT-exact moment sums and
# emitted as a float-exact DOUBLE column; z is one textually-
# identical SQRT + division. [EXT]
# --------------------------------------------------------------------------
@register(
    "jonckheere_priority_trend",
    """
    WITH h AS (
        SELECT CAST(SUBSTR(o_orderpriority, 1, 1) AS BIGINT) AS g,
               CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS v,
               CAST(COUNT(*) AS BIGINT) AS c
        FROM orders GROUP BY 1, 2
    ),
    vals AS (SELECT DISTINCT v FROM h),
    grps AS (SELECT DISTINCT g FROM h),
    grid AS (
        SELECT vl.v, gr.g, COALESCE(h.c, 0) AS c
        FROM vals vl CROSS JOIN grps gr
        LEFT JOIN h ON h.v = vl.v AND h.g = gr.g
    ),
    pre AS (
        SELECT v, g, c,
               COALESCE(CAST(SUM(c) OVER (PARTITION BY g ORDER BY v
                   ROWS BETWEEN UNBOUNDED PRECEDING
                   AND 1 PRECEDING) AS BIGINT), 0) AS lt
        FROM grid
    ),
    j2s AS (
        SELECT CAST(SUM(CAST(b.c AS HUGEINT)
                        * (2 * a.lt + a.c)) AS HUGEINT) AS j2w
        FROM pre a JOIN pre b ON a.v = b.v AND a.g < b.g
    ),
    sizes AS (
        SELECT g, CAST(SUM(c) AS BIGINT) AS n FROM h GROUP BY g
    ),
    gs AS (
        SELECT CAST(SUM(n) AS BIGINT) AS nt,
               CAST(SUM(n * n) AS BIGINT) AS sn2,
               CAST(SUM(CAST(n AS HUGEINT) * (n - 1) * (2 * n + 5))
                    AS HUGEINT) AS gn25,
               CAST(SUM(CAST(n AS HUGEINT) * (n - 1) * (n - 2))
                    AS HUGEINT) AS gn3,
               CAST(SUM(CAST(n AS HUGEINT) * (n - 1)) AS HUGEINT)
                    AS gn2
        FROM sizes
    ),
    ts AS (
        SELECT CAST(SUM(CAST(t AS HUGEINT) * (t - 1) * (2 * t + 5))
                    AS HUGEINT) AS tn25,
               CAST(SUM(CAST(t AS HUGEINT) * (t - 1) * (t - 2))
                    AS HUGEINT) AS tn3,
               CAST(SUM(CAST(t AS HUGEINT) * (t - 1)) AS HUGEINT)
                    AS tn2
        FROM (SELECT v, CAST(SUM(c) AS BIGINT) AS t FROM h GROUP BY v)
    ),
    var_final AS (
        SELECT g.nt, g.sn2,
               CAST(CAST(g.nt AS HUGEINT) * (g.nt - 1)
                    * (2 * g.nt + 5) - g.gn25 - t.tn25 AS DOUBLE) / 72
               + (CAST(g.gn3 AS DOUBLE)
                  / (6.0 * g.nt * (g.nt - 1.0)))
                 * (CAST(t.tn3 AS DOUBLE) / (6.0 * (g.nt - 2.0)))
               + (CAST(g.gn2 AS DOUBLE) / (4.0 * g.nt))
                 * (CAST(t.tn2 AS DOUBLE) / (2.0 * (g.nt - 1.0)))
                   AS var_j
        FROM gs g CROSS JOIN ts t
    )
    SELECT v.nt AS n_total, CAST(j.j2w AS BIGINT) AS j2,
           CAST((CAST(v.nt AS HUGEINT) * v.nt - v.sn2) // 2
                AS BIGINT) AS e_j2,
           v.var_j,
           CASE WHEN v.var_j > 0 THEN
               CAST(ROUND(CAST(j.j2w - (CAST(v.nt AS HUGEINT) * v.nt
                    - v.sn2) // 2 AS DOUBLE) * 1000000
                    / (2 * SQRT(v.var_j)), 0) AS BIGINT)
           ELSE 0 END AS z_micro
    FROM var_final v CROSS JOIN j2s j
    """,
    doc="X293 Jonckheere-Terpstra ordered-alternative test of revenue "
        "across the five ORDERED priorities: doubled pair statistic "
        "J2 = sum 2*#less + #equal counted exactly from per-group "
        "histograms on the value-bounded distinct-cents grid "
        "(exclusive prefix window per group + bounded 5x5 pair join "
        "on value — never a data-sized pair join), exact "
        "E[J2] = (N^2 - sum n^2)/2, SAS-formula tie-corrected "
        "variance folded in a single textually-identical DOUBLE "
        "expression over HUGEINT-exact moment sums (the variance "
        "VALUE itself passes 2^63 at large N, so no fixed integer "
        "grid can hold it), z one textually-identical SQRT + "
        "division. The ordered-groups member next to X245 (omnibus "
        "KW), X280 (blocked), X159 (single-series trend). Python "
        "replay + pair-count conservation laws.",
    tags=("X293", "X245", "X280", "X7", "X11"),
)
def jonckheere_priority_trend(spark: SparkSession,
                              sf_dir: str) -> DataFrame:
    from ..caching import persist_tracked

    o = load_table(spark, sf_dir, "orders")
    h = persist_tracked(
        o.groupBy(
            F.expr("CAST(SUBSTR(o_orderpriority, 1, 1) AS BIGINT)")
            .alias("g"),
            F.expr("CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)")
            .alias("v"))
        .agg(F.count("*").cast("long").alias("c")))
    vals = h.select("v").distinct()
    grps = h.select("g").distinct()
    grid = (vals.crossJoin(F.broadcast(grps))
            .join(h, ["v", "g"], "left")
            .select("v", "g", F.coalesce("c", F.lit(0)).alias("c")))
    wpre = (Window.partitionBy("g").orderBy("v")
            .rowsBetween(Window.unboundedPreceding, -1))
    pre = persist_tracked(grid.select(
        "v", "g", "c",
        F.coalesce(F.sum("c").over(wpre), F.lit(0)).cast("long")
        .alias("lt")))
    a = pre.select(F.col("v"), F.col("g").alias("ga"),
                   F.col("c").alias("ca"), F.col("lt").alias("lta"))
    b = pre.select(F.col("v"), F.col("g").alias("gb"),
                   F.col("c").alias("cb"))
    j2s = (a.join(b, "v").filter(F.col("ga") < F.col("gb"))
           .selectExpr("CAST(cb AS DECIMAL(38,0))"
                       " * (2 * lta + ca) AS w")
           .agg(F.sum("w").alias("j2w")))
    sizes = h.groupBy("g").agg(F.sum("c").cast("long").alias("n"))
    gs = sizes.selectExpr(
        "n",
        "CAST(n AS DECIMAL(38,0)) * (n - 1) * (2 * n + 5) AS w25",
        "CAST(n AS DECIMAL(38,0)) * (n - 1) * (n - 2) AS w3",
        "CAST(n AS DECIMAL(38,0)) * (n - 1) AS w2").agg(
        F.sum("n").cast("long").alias("nt"),
        F.sum(F.col("n") * F.col("n")).cast("long").alias("sn2"),
        F.sum("w25").alias("gn25"),
        F.sum("w3").alias("gn3"),
        F.sum("w2").alias("gn2"))
    ts = (h.groupBy("v").agg(F.sum("c").cast("long").alias("t"))
          .selectExpr(
              "CAST(t AS DECIMAL(38,0)) * (t - 1) * (2 * t + 5)"
              " AS w25",
              "CAST(t AS DECIMAL(38,0)) * (t - 1) * (t - 2) AS w3",
              "CAST(t AS DECIMAL(38,0)) * (t - 1) AS w2")
          .agg(F.sum("w25").alias("tn25"),
               F.sum("w3").alias("tn3"),
               F.sum("w2").alias("tn2")))
    var_final = (gs.crossJoin(F.broadcast(ts))
                 .selectExpr(
                     "nt", "sn2",
                     "CAST(CAST(nt AS DECIMAL(38,0)) * (nt - 1)"
                     " * (2 * nt + 5) - gn25 - tn25 AS DOUBLE) / 72"
                     " + (CAST(gn3 AS DOUBLE)"
                     " / (6.0 * nt * (nt - 1.0)))"
                     " * (CAST(tn3 AS DOUBLE) / (6.0 * (nt - 2.0)))"
                     " + (CAST(gn2 AS DOUBLE) / (4.0 * nt))"
                     " * (CAST(tn2 AS DOUBLE) / (2.0 * (nt - 1.0)))"
                     " AS var_j"))
    return (var_final.crossJoin(F.broadcast(j2s))
            .selectExpr(
                "nt AS n_total", "CAST(j2w AS BIGINT) AS j2",
                "CAST((CAST(nt AS DECIMAL(38,0)) * nt - sn2) DIV 2"
                " AS BIGINT) AS e_j2",
                "var_j",
                "CASE WHEN var_j > 0 THEN"
                " CAST(ROUND(CAST(j2w - (CAST(nt AS DECIMAL(38,0))"
                " * nt"
                " - sn2) DIV 2 AS DOUBLE) * 1000000"
                " / (2 * SQRT(var_j)), 0) AS BIGINT)"
                " ELSE 0L END AS z_micro"))
