"""Scale-lever queries: the operators/scale.py levers surfaced through
the driver contract, each hash-checked against the PLAIN join it must
equal. The reference's only join is a single-threaded pandas merge
(/root/reference/scripts/transform.py:156-162); these are the two
distributed-join strategies that replace it at 100 TB — explicit salting
for hot keys, and bucketed co-location to delete the shuffle entirely.
"""

from __future__ import annotations

import os

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..catalog import load_table
from ..operators.layout import write_zordered
from ..operators.scale import (bloom_prune, build_bloom, salted_join,
                               write_bucketed)
from ..registry import register

_PLAIN_JOIN_AGG_SQL = """
    SELECT o_orderpriority,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           CAST(COUNT(*) AS BIGINT) AS n_lines
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY o_orderpriority
"""


@register(
    "skew_salted_join",
    _PLAIN_JOIN_AGG_SQL,
    doc="lineitem-orders join executed through salted_join: the fact "
        "side gains a deterministic 8-way salt (xxhash64 of the row, so "
        "task retries re-derive it) and the other side is replicated, "
        "splitting any hot orderkey across 8 reducers. The oracle is "
        "the PLAIN join — salting must be invisible in the result. At "
        "100 TB this is the fix for a hot key AQE can't split because "
        "its rows genuinely belong in one group.",
    tags=("X3", "X7"),
)
def skew_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice", "l_discount")
    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_orderpriority")
    joined = salted_join(li, o, "l_orderkey", n_salts=8)
    return joined.groupBy("o_orderpriority").agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))),
                2).alias("revenue"),
        F.count("*").alias("n_lines"))


@register(
    "bucketed_zero_shuffle_join",
    """
    WITH j AS (
        SELECT l_orderkey, o_orderpriority,
               CAST(l_extendedprice AS DECIMAL(18,6))
               * (1 - CAST(l_discount AS DECIMAL(18,6))) AS val
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    )
    SELECT l_orderkey, o_orderpriority,
           CAST(ROUND(SUM(val), 2) AS DOUBLE) AS revenue
    FROM j
    GROUP BY l_orderkey, o_orderpriority
    HAVING ROUND(SUM(val), 2) > 250000.0
    """,
    doc="High-value orders via a join with ZERO Exchange: both inputs "
        "are first persisted hash-bucketed+sorted by their join key "
        "(write_bucketed), so Spark proves co-partitioning from the "
        "catalog and plans sort-merge join AND the per-order aggregate "
        "without any shuffle (asserted in tests/test_plans.py). The "
        "bucketed write is a once-per-corpus build cost like an index; "
        "every later run of any query joining or grouping on the key "
        "skips its most expensive stage. Oracle is the plain join; the "
        "per-order money math runs in DECIMAL on both engines because "
        "with thousands of fine-grained groups some double sums land "
        "exactly on a .005 rounding boundary, where last-bit summation "
        "dust flips ROUND across engines.",
    tags=("X3", "X7", "X1"),
)
def bucketed_zero_shuffle_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    build_bucketed_tables(spark, sf_dir)
    return bucketed_join_probe(spark, sf_dir)


def _bucket_names(sf_dir: str) -> tuple[str, str]:
    suffix = os.path.basename(os.path.normpath(sf_dir)).replace(".", "_")
    return f"li_bkt_{suffix}", f"o_bkt_{suffix}"


def build_bucketed_tables(spark: SparkSession, sf_dir: str) -> None:
    """Index-build half: the once-per-corpus bucketed writes. bench.py
    times this separately from the probe so the headline number reflects
    steady state, not amortized build cost."""
    li_t, o_t = _bucket_names(sf_dir)
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice", "l_discount")
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority")
    write_bucketed(li, li_t, "l_orderkey", n_buckets=16)
    write_bucketed(o, o_t, "o_orderkey", n_buckets=16)


def bucketed_join_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Steady-state half: join + aggregate over the pre-built bucketed
    tables, planning with zero Exchange."""
    li_t, o_t = _bucket_names(sf_dir)
    # hint("merge"): at test SF orders is broadcast-sized, which would
    # hide the property under test; at 100 TB both sides are fact-sized
    # and sort-merge over buckets IS the plan, with zero Exchange
    j = spark.table(li_t).hint("merge").join(
        spark.table(o_t), F.col("l_orderkey") == F.col("o_orderkey"))
    val = (F.col("l_extendedprice").cast("decimal(18,6)")
           * (F.lit(1).cast("decimal(18,6)")
              - F.col("l_discount").cast("decimal(18,6)")))
    return (j.groupBy("l_orderkey", "o_orderpriority")
             .agg(F.round(F.sum(val), 2).alias("rev_d"))
             .filter(F.col("rev_d") > 250000.0)
             .select("l_orderkey", "o_orderpriority",
                     F.col("rev_d").cast("double").alias("revenue")))


@register(
    "bloom_join_pruning",
    """
    SELECT l_returnflag,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           CAST(COUNT(*) AS BIGINT) AS n_lines
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE o_orderpriority = '1-URGENT' AND o_orderstatus = 'F'
    GROUP BY l_returnflag
    """,
    doc="lineitem joined to a selective orders subset THROUGH a Bloom "
        "filter: the dim side's keys build a 64K-bit bitmap "
        "(distributed bit_or, driver gets only word->mask rows), which "
        "pre-filters the fact scan BEFORE the join shuffle. A Bloom "
        "filter has no false negatives, so the oracle is the PLAIN "
        "join — pruning must be invisible in the result. At 100 TB "
        "this shuffles the ~matching fraction of the fact table "
        "instead of all of it; it is the manual form of AQE runtime "
        "bloom pruning (spark.sql.optimizer.runtime.bloomFilter), "
        "usable where the optimizer's version can't reach.",
    tags=("X3", "X7", "X2"),
)
def bloom_join_pruning(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_returnflag", "l_extendedprice", "l_discount")
    dim = (load_table(spark, sf_dir, "orders")
           .filter((F.col("o_orderpriority") == "1-URGENT")
                   & (F.col("o_orderstatus") == "F"))
           .select("o_orderkey"))
    bloom = build_bloom(dim, "o_orderkey")
    pruned = bloom_prune(li, "l_orderkey", bloom)
    j = pruned.join(dim, pruned.l_orderkey == dim.o_orderkey)
    return (j.groupBy("l_returnflag")
             .agg(F.round(F.sum(F.col("l_extendedprice")
                                * (1 - F.col("l_discount"))), 2)
                  .alias("revenue"),
                  F.count("*").alias("n_lines")))


# -- z-order layout ---------------------------------------------------------

# Rectangle bounds as fractions of each key's [min, max] span — the same
# double arithmetic on both engines, so the cutoffs agree bit-for-bit.
_ZRECT = {"l_partkey": (0.10, 0.30), "l_suppkey": (0.40, 0.60)}


@register(
    "zorder_rectangle_scan",
    """
    WITH b AS (
        SELECT MIN(l_partkey) AS plo, MAX(l_partkey) AS phi,
               MIN(l_suppkey) AS slo, MAX(l_suppkey) AS shi
        FROM lineitem
    )
    SELECT l_returnflag,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           CAST(COUNT(*) AS BIGINT) AS n_lines,
           CAST(SUM(l_partkey) AS BIGINT) AS part_sum
    FROM lineitem, b
    WHERE l_partkey >= plo + CAST(FLOOR(0.10 * (phi - plo)) AS BIGINT)
      AND l_partkey <  plo + CAST(FLOOR(0.30 * (phi - plo)) AS BIGINT)
      AND l_suppkey >= slo + CAST(FLOOR(0.40 * (shi - slo)) AS BIGINT)
      AND l_suppkey <  slo + CAST(FLOOR(0.60 * (shi - slo)) AS BIGINT)
    GROUP BY l_returnflag
    """,
    doc="2-D rectangle scan (l_partkey x l_suppkey range conjunction) "
        "over a Z-ORDERED rewrite of lineitem: the copy is range-"
        "partitioned and sorted by the Morton interleave of both keys, "
        "so every file/row group covers a tight hypercube and the "
        "pushed-down rectangle prunes most row groups on footer stats "
        "alone — a single-column sort can prune only its own dimension "
        "(measured, not assumed: tests/test_layout.py compares pruning "
        "fractions from the parquet footers; the filters are "
        "plan-asserted as PushedFilters). Layout never changes results: "
        "the oracle is the same rectangle over the ORIGINAL table. "
        "Build (one full shuffle-sort) amortizes across every later "
        "rectangle query — bench.py times it under index_build.",
    tags=("X32", "X1", "X2", "X7"),
)
def zorder_rectangle_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    build_zorder_layout(spark, sf_dir)
    return zorder_probe(spark, sf_dir)


def _zorder_path(sf_dir: str) -> str:
    suffix = os.path.basename(os.path.normpath(sf_dir)).replace(".", "_")
    return os.path.join("spark-warehouse", f"zorder_lineitem_{suffix}")


def build_zorder_layout(spark: SparkSession, sf_dir: str) -> str:
    """Index-build half: one range-partitioned Morton-sorted rewrite of
    lineitem (the layout analog of the bucketed-table build)."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_returnflag",
        "l_extendedprice", "l_discount")
    path = _zorder_path(sf_dir)
    # small row groups so pruning granularity exists inside files even
    # at test scale; bits=8 per dim is plenty for 16 files
    write_zordered(li, path, ["l_partkey", "l_suppkey"],
                   n_files=16, bits=8, block_bytes=256 * 1024)
    return path


def zorder_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Steady-state half: the rectangle aggregate over the z-ordered
    copy. Bounds are two driver-side scalars from a min/max scan
    (footer-only at scale); the rectangle itself is LITERAL predicates,
    so it reaches the parquet reader as PushedFilters and row groups
    outside the hypercube are skipped before any I/O."""
    import math

    df = spark.read.parquet(_zorder_path(sf_dir))
    b = df.agg(F.min("l_partkey").alias("plo"), F.max("l_partkey").alias("phi"),
               F.min("l_suppkey").alias("slo"), F.max("l_suppkey").alias("shi")
               ).first()
    (pf_lo, pf_hi), (sf_lo, sf_hi) = _ZRECT["l_partkey"], _ZRECT["l_suppkey"]
    p1 = b["plo"] + math.floor(pf_lo * (b["phi"] - b["plo"]))
    p2 = b["plo"] + math.floor(pf_hi * (b["phi"] - b["plo"]))
    s1 = b["slo"] + math.floor(sf_lo * (b["shi"] - b["slo"]))
    s2 = b["slo"] + math.floor(sf_hi * (b["shi"] - b["slo"]))
    return (df.filter((F.col("l_partkey") >= p1) & (F.col("l_partkey") < p2)
                      & (F.col("l_suppkey") >= s1) & (F.col("l_suppkey") < s2))
            .groupBy("l_returnflag")
            .agg(F.round(F.sum(F.col("l_extendedprice")
                               * (1 - F.col("l_discount"))), 2)
                 .alias("revenue"),
                 F.count("*").alias("n_lines"),
                 F.sum("l_partkey").cast("long").alias("part_sum")))


# -- dynamic partition pruning ----------------------------------------------

def _dpp_path(sf_dir: str) -> str:
    suffix = os.path.basename(os.path.normpath(sf_dir)).replace(".", "_")
    return os.path.join("spark-warehouse", f"orders_by_priority_{suffix}")


def build_partitioned_orders(spark: SparkSession, sf_dir: str) -> str:
    """Index-build half: orders rewritten hive-partitioned by
    o_orderpriority (the layout every date-/category-partitioned fact
    table uses at scale)."""
    path = _dpp_path(sf_dir)
    (load_table(spark, sf_dir, "orders")
     .write.mode("overwrite").partitionBy("o_orderpriority")
     .parquet(path))
    return path


def dpp_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Steady-state half: join the partitioned fact against a dim whose
    qualifying keys exist only at RUNTIME (the filter is on a non-key
    dim column), forcing dynamic partition pruning: Spark plans a
    dynamicpruning subquery on the fact's partition column and skips
    non-qualifying partition directories before any fact I/O. A static
    planner would scan all 5 priority partitions; DPP reads 2."""
    dim = (spark.createDataFrame(
        [("1-URGENT", 1), ("2-HIGH", 2), ("3-MEDIUM", 3),
         ("4-NOT SPECIFIED", 4), ("5-LOW", 5)],
        "priority string, urgency_rank int")
        .filter(F.col("urgency_rank") <= 2))
    fact = spark.read.parquet(_dpp_path(sf_dir))
    return (fact.join(dim, fact.o_orderpriority == dim.priority)
            .groupBy("o_orderpriority")
            .agg(F.count("*").cast("long").alias("n_orders"),
                 F.round(F.sum("o_totalprice"), 2).alias("total_price")))


@register(
    "dpp_partitioned_join",
    """
    SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_orders,
           ROUND(SUM(o_totalprice), 2) AS total_price
    FROM orders
    JOIN (VALUES ('1-URGENT', 1), ('2-HIGH', 2), ('3-MEDIUM', 3),
                 ('4-NOT SPECIFIED', 4), ('5-LOW', 5)) AS dim(priority, r)
      ON o_orderpriority = dim.priority
    WHERE dim.r <= 2
    GROUP BY o_orderpriority
    """,
    doc="X38 dynamic partition pruning: hive-partitioned fact joined "
        "against a runtime-filtered dim; Spark injects a dynamicpruning "
        "subquery on the partition column so only qualifying partition "
        "directories are read (2 of 5 here) — the mechanism that makes "
        "date-partitioned 100 TB fact scans affordable. Plan-asserted "
        "in tests/test_plans.py; oracle replays the same join on the "
        "unpartitioned table (layout is invisible to results).",
    tags=("X38", "X1", "X3"),
)
def dpp_partitioned_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    build_partitioned_orders(spark, sf_dir)
    return dpp_probe(spark, sf_dir)


# --------------------------------------------------------------------------
# X132: consistent-hash shard rebalance audit — the data-placement
# primitive behind shard/partition topology changes: how much data
# actually moves when the ring grows from N to N+1 shards? Ring
# tokens are md5-derived CONSTANTS of the shard config (computed once
# in Python, inlined into both engines — nothing data-dependent), so
# per-document assignment is a pure scalar expression over a sorted
# token array: first token >= h, wrapping to the global minimum. No
# join, no fan-out — a map-only pass at any corpus size. The defining
# consistent-hashing guarantee (documents only ever move TO the new
# shard) is law-tested; the audit reports per-shard occupancy before/
# after and the moved-in volume.
# --------------------------------------------------------------------------
RING_SHARDS = 8
RING_VNODES = 24  # virtual nodes per shard


def _ring_tokens(n_shards: int) -> list[tuple[int, int]]:
    """Sorted (token, shard) pairs; token = first 15 md5 hex digits of
    'shard:<s>#<v>' as a 60-bit integer (the house hash idiom)."""
    import hashlib

    toks = []
    for s in range(n_shards):
        for v in range(RING_VNODES):
            h = hashlib.md5(f"shard:{s}#{v}".encode()).hexdigest()
            toks.append((int(h[:15], 16), s))
    toks.sort()
    return toks


def _ring_case(n_shards: int, h_expr: str) -> str:
    """Portable SQL picking the owner shard of hash ``h_expr``: the
    shard of the first ring token >= h, else the first token's shard
    (wrap). Emitted as a nested CASE over the sorted constant ring —
    pure scalar logic, identical text on both engines."""
    toks = _ring_tokens(n_shards)
    branches = " ".join(
        f"WHEN {h_expr} <= {t} THEN {s}" for t, s in toks)
    return f"(CASE {branches} ELSE {toks[0][1]} END)"


def _rebalance_oracle_sql() -> str:
    a = _ring_case(RING_SHARDS, "h")
    b = _ring_case(RING_SHARDS + 1, "h")
    return f"""
    WITH d AS (
        SELECT ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
                   AS h
        FROM documents
    ),
    asg AS (SELECT {a} AS shard_before, {b} AS shard_after FROM d)
    SELECT shard_after AS shard,
           CAST(SUM(CASE WHEN shard_before = shard_after THEN 1 ELSE 0 END)
                AS BIGINT) AS n_stayed,
           CAST(SUM(CASE WHEN shard_before <> shard_after THEN 1 ELSE 0 END)
                AS BIGINT) AS n_moved_in,
           CAST(COUNT(*) AS BIGINT) AS n_after
    FROM asg GROUP BY shard_after
    """


@register(
    "consistent_hash_rebalance",
    _rebalance_oracle_sql(),
    doc=f"X132 consistent-hash rebalance audit: documents placed on an "
        f"md5 token ring ({RING_SHARDS} shards x {RING_VNODES} vnodes), "
        f"then the ring grows to {RING_SHARDS + 1} shards and the audit "
        "reports per-shard stayed/moved-in/after occupancy. Ring "
        "tokens are config constants inlined into both engines; "
        "assignment is a scalar CASE over the sorted ring — map-only, "
        "no join, no shuffle beyond the final per-shard count. "
        "Law-tested: documents only move TO the new shard.",
    tags=("X132", "X28", "X14", "X7"),
)
def consistent_hash_rebalance(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").select(
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 15),
               16, 10).cast("long").alias("h"))
    asg = d.select(
        F.expr(_ring_case(RING_SHARDS, "h")).alias("shard_before"),
        F.expr(_ring_case(RING_SHARDS + 1, "h")).alias("shard_after"))
    return (asg.groupBy(F.col("shard_after").alias("shard"))
            .agg(F.sum(F.when(F.col("shard_before") == F.col("shard_after"),
                              1).otherwise(0)).cast("long")
                 .alias("n_stayed"),
                 F.sum(F.when(F.col("shard_before") != F.col("shard_after"),
                              1).otherwise(0)).cast("long")
                 .alias("n_moved_in"),
                 F.count("*").cast("long").alias("n_after")))


# --------------------------------------------------------------------------
# X145: space-filling-curve layout comparison — Hilbert vs Z-order
# (Morton) range-scan fragmentation. Data files sorted by a curve key
# serve a rectangle predicate with as many contiguous reads as the
# rectangle has index RUNS, so runs-per-rectangle IS the locality
# metric that decides the layout (the reason Hilbert beats Morton for
# square-ish predicates). Both indexes are generated-once SQL over
# the bounded CELL table (distinct price-bucket x quantity, <= 64x64
# — the corpus is touched once for the distinct aggregate): the
# Hilbert transform is the classic xy2d recurrence UNROLLED into
# HILBERT_BITS chained stages (pure &/CASE/arithmetic, the identical
# generated text runs on both engines; bijectivity + unit-step
# adjacency of the implementation are law-tested), Z is bit
# interleaving. Fragmentation = LAG-gap run counting per (rectangle,
# curve).
# --------------------------------------------------------------------------
HILBERT_BITS = 6  # 64 x 64 grid
HILBERT_N = 1 << HILBERT_BITS
CURVE_PRICE_W = 1600.0  # price-bucket width -> 0..63 over ~[900,102k]
CURVE_RECTS = ((0, 15, 0, 15), (20, 50, 10, 30),
               (0, 63, 24, 27), (40, 43, 0, 49))


def hilbert_stage_exprs() -> list[tuple[str, str, str]]:
    """Per-stage (hx, hy, hd) SQL expressions for the unrolled xy2d
    recurrence — identical text executes on Spark and DuckDB."""
    n1 = HILBERT_N - 1
    stages = []
    s = HILBERT_N // 2
    while s > 0:
        quad = (f"CASE WHEN (hx & {s}) = 0 AND (hy & {s}) = 0 THEN 0 "
                f"WHEN (hx & {s}) = 0 THEN 1 "
                f"WHEN (hy & {s}) > 0 THEN 2 ELSE 3 END")
        new_x = (f"CASE WHEN (hy & {s}) > 0 THEN hx "
                 f"WHEN (hx & {s}) > 0 THEN {n1} - hy ELSE hy END")
        new_y = (f"CASE WHEN (hy & {s}) > 0 THEN hy "
                 f"WHEN (hx & {s}) > 0 THEN {n1} - hx ELSE hx END")
        stages.append((new_x, new_y, f"hd + {s * s} * ({quad})"))
        s //= 2
    return stages


def zorder_bit_expr(xcol: str, ycol: str) -> str:
    """Morton interleave as shared &/multiply text."""
    parts = []
    for i in range(HILBERT_BITS):
        parts.append(f"(CASE WHEN ({xcol} & {1 << i}) > 0 "
                     f"THEN {1 << (2 * i)} ELSE 0 END)")
        parts.append(f"(CASE WHEN ({ycol} & {1 << i}) > 0 "
                     f"THEN {1 << (2 * i + 1)} ELSE 0 END)")
    return " + ".join(parts)


def _curve_cells_sql() -> str:
    sql = f"""
    WITH cells AS (
        SELECT DISTINCT
               CAST(LEAST(FLOOR(l_extendedprice / {CURVE_PRICE_W}),
                          {HILBERT_N - 1}) AS BIGINT) AS px,
               CAST(l_quantity - 1 AS BIGINT) AS qy
        FROM lineitem
    ),
    h0 AS (SELECT px, qy, px AS hx, qy AS hy,
                  CAST(0 AS BIGINT) AS hd FROM cells)"""
    for i, (ex, ey, ed) in enumerate(hilbert_stage_exprs(), start=1):
        prev = "h0" if i == 1 else f"hh{i - 1}"
        sql += f""",
    s{i} AS (SELECT px, qy, {ex} AS nhx, {ey} AS nhy, {ed} AS nhd
             FROM {prev})"""
        sql += f""",
    hh{i} AS (SELECT px, qy, nhx AS hx, nhy AS hy, nhd AS hd FROM s{i})"""
    last = len(hilbert_stage_exprs())
    sql += f""",
    idx AS (SELECT px, qy, hd AS h,
                   CAST({zorder_bit_expr('px', 'qy')} AS BIGINT) AS z
            FROM hh{last})"""
    return sql


def _fragment_oracle_sql() -> str:
    rect_rows = " UNION ALL ".join(
        f"SELECT {i} AS rect_id, {xl} AS xl, {xh} AS xh, {yl} AS yl,"
        f" {yh} AS yh"
        for i, (xl, xh, yl, yh) in enumerate(CURVE_RECTS))
    return _curve_cells_sql() + f""",
    rects AS ({rect_rows}),
    hits AS (
        SELECT r.rect_id, c.curve, c.i
        FROM rects r
        JOIN (SELECT px, qy, 'hilbert' AS curve, h AS i FROM idx
              UNION ALL
              SELECT px, qy, 'zorder', z FROM idx) c
          ON c.px BETWEEN r.xl AND r.xh AND c.qy BETWEEN r.yl AND r.yh
    ),
    runs AS (
        SELECT rect_id, curve,
               CASE WHEN i - LAG(i) OVER (PARTITION BY rect_id, curve
                                          ORDER BY i) = 1
                    THEN 0 ELSE 1 END AS run_start
        FROM hits
    )
    SELECT rect_id, curve, CAST(COUNT(*) AS BIGINT) AS n_cells,
           CAST(SUM(run_start) AS BIGINT) AS n_runs,
           ROUND(CAST(COUNT(*) AS DOUBLE) / SUM(run_start), 6)
               AS avg_run_len
    FROM runs GROUP BY rect_id, curve
    """


@register(
    "curve_layout_fragmentation",
    _fragment_oracle_sql(),
    doc=f"X145 Hilbert-vs-Z-order layout audit on the "
        f"{HILBERT_N}x{HILBERT_N} (price-bucket, quantity) cell grid: "
        "per query-rectangle contiguous-run counts under each curve "
        "(fewer runs = fewer seeks for a range scan over curve-sorted "
        "files). Hilbert index = the classic xy2d recurrence unrolled "
        "into generated stages whose text runs verbatim on both "
        "engines (bijectivity + unit-step adjacency law-tested); "
        "corpus is touched once for the distinct cell aggregate.",
    tags=("X145", "X32", "X11", "X7"),
)
def curve_layout_fragmentation(spark: SparkSession,
                               sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    li = load_table(spark, sf_dir, "lineitem")
    cells = (li.selectExpr(
        f"CAST(LEAST(FLOOR(l_extendedprice / {CURVE_PRICE_W}), "
        f"{HILBERT_N - 1}) AS BIGINT) AS px",
        "CAST(l_quantity - 1 AS BIGINT) AS qy").distinct())
    h = cells.selectExpr("px", "qy", "px AS hx", "qy AS hy",
                         "CAST(0 AS BIGINT) AS hd")
    for ex, ey, ed in hilbert_stage_exprs():
        h = h.selectExpr("px", "qy", f"{ex} AS nhx", f"{ey} AS nhy",
                         f"{ed} AS nhd") \
             .selectExpr("px", "qy", "nhx AS hx", "nhy AS hy",
                         "nhd AS hd")
    idx = h.selectExpr(
        "px", "qy", "hd AS h",
        f"CAST({zorder_bit_expr('px', 'qy')} AS BIGINT) AS z")
    rects = spark.createDataFrame(
        [(i,) + r for i, r in enumerate(CURVE_RECTS)],
        "rect_id INT, xl INT, xh INT, yl INT, yh INT")
    both = (idx.selectExpr("px", "qy", "'hilbert' AS curve", "h AS i")
            .unionByName(idx.selectExpr("px", "qy", "'zorder' AS curve",
                                        "z AS i")))
    hits = (F.broadcast(rects).crossJoin(both)
            .filter(F.col("px").between(F.col("xl"), F.col("xh"))
                    & F.col("qy").between(F.col("yl"), F.col("yh")))
            .select("rect_id", "curve", "i"))
    w = Window.partitionBy("rect_id", "curve").orderBy("i")
    runs = hits.select(
        "rect_id", "curve",
        F.when(F.col("i") - F.lag("i").over(w) == 1, 0).otherwise(1)
        .alias("run_start"))
    return (runs.groupBy("rect_id", "curve")
            .agg(F.count("*").cast("long").alias("n_cells"),
                 F.sum("run_start").cast("long").alias("n_runs"))
            .withColumn("avg_run_len",
                        F.round(F.col("n_cells").cast("double")
                                / F.col("n_runs"), 6)))


# --------------------------------------------------------------------------
# X212: encoding-efficiency audit — the storage planner's question at
# 100 TB: which parquet encoding (dictionary, delta, RLE-ish runs,
# plain) pays for each column, before rewriting anything. Bit widths
# are EXACT integers via binary-string length (ceil_log2(n) =
# length(bin(n-1)), no float log2 near power-of-two boundaries), and
# runs/deltas are computed WITHIN row groups (l_orderkey DIV 1000) —
# exactly how parquet encodes, and it keeps every window shuffle-
# partitioned instead of a global single-partition sort.
# --------------------------------------------------------------------------
ENC_RG_DIV = 1000
_ENC_COLS = (
    ("l_orderkey", "l_orderkey"),
    ("l_partkey", "l_partkey"),
    ("l_suppkey", "l_suppkey"),
    ("l_linenumber", "l_linenumber"),
    ("l_quantity", "CAST(l_quantity AS BIGINT)"),
    ("ship_day", "CAST(l_shipdate AS DATE) - DATE '1970-01-01'"),
)


def _enc_melt_sql() -> str:
    sel = []
    for name, expr in _ENC_COLS:
        sel.append(
            f"SELECT l_orderkey // {ENC_RG_DIV} AS rg, l_orderkey AS ok, "
            f"l_linenumber AS ln, '{name}' AS col, "
            f"CAST({expr} AS BIGINT) AS val FROM lineitem")
    return "\nUNION ALL\n".join(sel)


def _ceil_log2_sql(arg: str) -> str:
    return (f"CASE WHEN ({arg}) <= 1 THEN 0 "
            f"ELSE length(bin(CAST(({arg}) - 1 AS BIGINT))) END")


@register(
    "encoding_efficiency_audit",
    f"""
    WITH melt AS ({_enc_melt_sql()}),
    runs AS (
        SELECT col, rg, val,
               lag(val) OVER (PARTITION BY col, rg
                              ORDER BY ok, ln, val) AS prev
        FROM melt
    ),
    per_col AS (
        SELECT col,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(COUNT(DISTINCT val) AS BIGINT) AS ndv,
               CAST(MIN(val) AS BIGINT) AS vmin,
               CAST(MAX(val) AS BIGINT) AS vmax,
               CAST(SUM(CASE WHEN prev IS NULL OR prev <> val
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_runs,
               CAST(COALESCE(MAX(ABS(val - prev)), 0) AS BIGINT)
                   AS max_delta
        FROM runs GROUP BY col
    )
    SELECT col,
           n, ndv, n_runs,
           CAST({_ceil_log2_sql('ndv')} AS BIGINT) AS dict_bits,
           CAST({_ceil_log2_sql('vmax - vmin + 1')} AS BIGINT)
               AS range_bits,
           CAST({_ceil_log2_sql('max_delta + 1')} + 1 AS BIGINT)
               AS delta_bits,
           CAST((n_runs * 1000000) // n AS BIGINT) AS run_frac_micro
    FROM per_col
    """,
    doc="X212 per-column encoding audit of lineitem: exact dictionary/"
        "range/delta bit widths via binary-string lengths (ceil_log2 "
        "with zero float logs), run counts and max deltas computed "
        "row-group-locally (l_orderkey DIV 1000) like parquet itself — "
        "windows stay hash-partitioned, no global sort. The OPTIMIZE-"
        "time planner that decides which rewrite pays at 100 TB.",
    tags=("X212", "X14", "X7", "X11", "X1"),
)
def encoding_efficiency_audit(spark: SparkSession,
                              sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    melt = None
    for name, expr in _ENC_COLS:
        if name == "ship_day":  # Spark spells date-minus-date differently
            expr = "datediff(CAST(l_shipdate AS DATE), DATE '1970-01-01')"
        part = li.selectExpr(
            f"l_orderkey DIV {ENC_RG_DIV} AS rg", "l_orderkey AS ok",
            "l_linenumber AS ln", f"'{name}' AS col",
            f"CAST({expr} AS BIGINT) AS val")
        melt = part if melt is None else melt.unionByName(part)
    from pyspark.sql import Window as W
    w = W.partitionBy("col", "rg").orderBy("ok", "ln", "val")
    runs = melt.withColumn("prev", F.lag("val").over(w))
    per_col = (runs.groupBy("col")
               .agg(F.count("*").cast("long").alias("n"),
                    F.countDistinct("val").cast("long").alias("ndv"),
                    F.min("val").cast("long").alias("vmin"),
                    F.max("val").cast("long").alias("vmax"),
                    F.sum(F.when(F.col("prev").isNull()
                                 | (F.col("prev") != F.col("val")), 1)
                          .otherwise(0)).cast("long").alias("n_runs"),
                    F.coalesce(F.max(F.abs(F.col("val")
                                           - F.col("prev"))), F.lit(0))
                    .cast("long").alias("max_delta")))

    def cl2(arg: str) -> str:
        return (f"CASE WHEN ({arg}) <= 1 THEN 0 "
                f"ELSE length(bin(CAST(({arg}) - 1 AS BIGINT))) END")

    return per_col.selectExpr(
        "col", "n", "ndv", "n_runs",
        f"CAST({cl2('ndv')} AS BIGINT) AS dict_bits",
        f"CAST({cl2('vmax - vmin + 1')} AS BIGINT) AS range_bits",
        f"CAST({cl2('max_delta + 1')} + 1 AS BIGINT) AS delta_bits",
        "CAST((n_runs * 1000000) DIV n AS BIGINT) AS run_frac_micro")


# --------------------------------------------------------------------------
# X246: zone-map skip-rate audit — min/max data skipping is THE first
# line of defense at 100 TB (parquet row-group stats, Delta/Iceberg
# file pruning, ORC stripe indexes); this measures how well it works
# on this layout for a fixed predicate battery. Rows bucket into
# synthetic row groups (l_orderkey DIV ZM_RG_DIV — the natural insert
# order), each group keeps (min, max, count) per column, and every
# predicate reports groups skipped (max < lo OR min > hi), rows
# scanned vs rows actually matched (the scan waste a sorted/z-ordered
# layout would reclaim — X32/X145's metrics from the pruning side).
# Zone-map soundness (no matched row inside a skipped group) is the
# law test. All-integer: dates as epoch days, prices centi.
# --------------------------------------------------------------------------
ZM_RG_DIV = 1000
ZM_PREDS = (
    ("p1", "ship", 730, 1095),     # shipdate year ~1994
    ("p2", "ship", 1460, 1825),    # ~1996
    ("p3", "ship", 2400, 2555),    # tail of the calendar
    ("p4", "price", 100000, 200000),    # 1000.00-2000.00
    ("p5", "price", 9000000, 10500000), # the price ceiling
    ("p6", "qty", 1, 5),
    ("p7", "qty", 45, 50),
    ("p8", "price", 0, 50000),
)


def _zm_pred_values() -> str:
    return ", ".join(f"('{p}', '{c}', {lo}, {hi})"
                     for p, c, lo, hi in ZM_PREDS)


@register(
    "zonemap_skip_audit",
    f"""
    WITH rows_ AS (
        SELECT l_orderkey // {ZM_RG_DIV} AS rg,
               CAST(date_diff('day', DATE '1992-01-01',
                    CAST(l_shipdate AS DATE)) AS BIGINT) AS ship,
               CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT) AS price,
               CAST(l_quantity AS BIGINT) AS qty
        FROM lineitem
    ),
    rg AS (
        SELECT rg, CAST(COUNT(*) AS BIGINT) AS cnt,
               MIN(ship) AS lo_ship, MAX(ship) AS hi_ship,
               MIN(price) AS lo_price, MAX(price) AS hi_price,
               MIN(qty) AS lo_qty, MAX(qty) AS hi_qty
        FROM rows_ GROUP BY rg
    ),
    preds(pid, col, lo, hi) AS (VALUES {_zm_pred_values()}),
    dec AS (
        SELECT p.pid, p.col, g.rg, g.cnt,
               CASE p.col
                    WHEN 'ship' THEN
                        CASE WHEN g.hi_ship < p.lo OR g.lo_ship > p.hi
                             THEN 1 ELSE 0 END
                    WHEN 'price' THEN
                        CASE WHEN g.hi_price < p.lo OR g.lo_price > p.hi
                             THEN 1 ELSE 0 END
                    ELSE CASE WHEN g.hi_qty < p.lo OR g.lo_qty > p.hi
                              THEN 1 ELSE 0 END
               END AS skipped
        FROM preds p CROSS JOIN rg g
    ),
    matches AS (
        SELECT p.pid, r.rg, CAST(COUNT(*) AS BIGINT) AS m
        FROM preds p JOIN rows_ r
          ON (p.col = 'ship' AND r.ship BETWEEN p.lo AND p.hi)
          OR (p.col = 'price' AND r.price BETWEEN p.lo AND p.hi)
          OR (p.col = 'qty' AND r.qty BETWEEN p.lo AND p.hi)
        GROUP BY p.pid, r.rg
    )
    SELECT d.pid, d.col,
           CAST(COUNT(*) AS BIGINT) AS n_groups,
           CAST(SUM(d.skipped) AS BIGINT) AS n_skipped,
           CAST(SUM(d.cnt) AS BIGINT) AS rows_total,
           CAST(SUM(CASE WHEN d.skipped = 0 THEN d.cnt ELSE 0 END)
                AS BIGINT) AS rows_scanned,
           CAST(COALESCE(SUM(m.m), 0) AS BIGINT) AS rows_matched,
           CAST((SUM(d.skipped) * 1000000) // COUNT(*) AS BIGINT)
               AS skip_frac_micro,
           CAST(CASE WHEN SUM(CASE WHEN d.skipped = 0 THEN d.cnt
                                   ELSE 0 END) > 0
                THEN ((SUM(CASE WHEN d.skipped = 0 THEN d.cnt ELSE 0
                           END) - COALESCE(SUM(m.m), 0)) * 1000000)
                     // SUM(CASE WHEN d.skipped = 0 THEN d.cnt
                            ELSE 0 END)
                ELSE 0 END AS BIGINT) AS waste_micro
    FROM dec d
    LEFT JOIN matches m ON m.pid = d.pid AND m.rg = d.rg
    GROUP BY d.pid, d.col
    """,
    doc=f"X246 zone-map skip audit: {ZM_RG_DIV}-key row groups keep "
        "min/max/count for shipdate (epoch days), price (centi), "
        "quantity; an 8-predicate battery reports groups skipped, "
        "rows scanned vs matched, skip fraction and scan waste "
        "(micro). The pruning-side twin of the X32/X145 layout "
        "queries. Soundness law: no matched row in a skipped group.",
    tags=("X246", "X32", "X145", "X38", "X7"),
)
def zonemap_skip_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    rows_ = li.select(
        F.expr(f"l_orderkey DIV {ZM_RG_DIV}").alias("rg"),
        F.datediff(F.col("l_shipdate").cast("date"),
                   F.lit("1992-01-01").cast("date")).cast("long")
        .alias("ship"),
        F.round(F.col("l_extendedprice") * 100, 0).cast("long")
        .alias("price"),
        F.col("l_quantity").cast("long").alias("qty"))
    rg = rows_.groupBy("rg").agg(
        F.count("*").cast("long").alias("cnt"),
        F.min("ship").alias("lo_ship"), F.max("ship").alias("hi_ship"),
        F.min("price").alias("lo_price"),
        F.max("price").alias("hi_price"),
        F.min("qty").alias("lo_qty"), F.max("qty").alias("hi_qty"))
    preds = li.sparkSession.createDataFrame(
        list(ZM_PREDS), "pid string, col string, lo long, hi long")
    skip_case = F.expr(
        "CASE col WHEN 'ship' THEN CASE WHEN hi_ship < lo"
        " OR lo_ship > hi THEN 1 ELSE 0 END"
        " WHEN 'price' THEN CASE WHEN hi_price < lo"
        " OR lo_price > hi THEN 1 ELSE 0 END"
        " ELSE CASE WHEN hi_qty < lo OR lo_qty > hi THEN 1 ELSE 0 END"
        " END")
    dec = (rg.crossJoin(F.broadcast(preds))
           .select("pid", "col", "rg", "cnt", skip_case.alias("skipped")))
    matches = (rows_.crossJoin(F.broadcast(preds))
               .filter("(col = 'ship' AND ship BETWEEN lo AND hi)"
                       " OR (col = 'price' AND price BETWEEN lo AND hi)"
                       " OR (col = 'qty' AND qty BETWEEN lo AND hi)")
               .groupBy("pid", "rg")
               .agg(F.count("*").cast("long").alias("m")))
    return (dec.join(matches, ["pid", "rg"], "left")
            .groupBy("pid", "col")
            .agg(F.count("*").cast("long").alias("n_groups"),
                 F.sum("skipped").cast("long").alias("n_skipped"),
                 F.sum("cnt").cast("long").alias("rows_total"),
                 F.sum(F.when(F.col("skipped") == 0, F.col("cnt"))
                       .otherwise(0)).cast("long").alias("rows_scanned"),
                 F.coalesce(F.sum("m"), F.lit(0)).cast("long")
                 .alias("rows_matched"),
                 F.expr("CAST((SUM(skipped) * 1000000) DIV COUNT(*)"
                        " AS BIGINT)").alias("skip_frac_micro"),
                 F.expr(
                     "CAST(CASE WHEN SUM(CASE WHEN skipped = 0 THEN cnt"
                     " ELSE 0 END) > 0 THEN ((SUM(CASE WHEN skipped = 0"
                     " THEN cnt ELSE 0 END) - COALESCE(SUM(m), 0))"
                     " * 1000000) DIV SUM(CASE WHEN skipped = 0"
                     " THEN cnt ELSE 0 END) ELSE 0 END AS BIGINT)")
                 .alias("waste_micro")))


# --------------------------------------------------------------------------
# X265: Roaring-style bitmap-index container planning — the INDEX-
# SIZING audit next to X246's zone maps and X212's encoding audit:
# given a low-cardinality predicate column over a sorted key space
# (l_returnflag over orderkeys), a roaring bitmap chunks the key
# space into 2^16-key containers and stores each as whichever of
# array (2 bytes/key), bitmap (8 KiB flat), or run-length (4 bytes/
# run) is smallest — the decision rule that makes secondary indexes
# viable at 100 TB. This query computes, per (flag, container), the
# EXACT member count and run count (LAG over the sorted distinct
# keys — one window), prices all three encodings, picks the winner,
# and reports per-flag totals: containers by winning type and total
# bytes vs the flat-bitmap strawman. Chambi et al., Roaring Bitmaps
# (2016); [EXT].
# --------------------------------------------------------------------------
ROARING_CHUNK = 1 << 16


@register(
    "roaring_container_plan",
    f"""
    WITH keys AS (
        SELECT DISTINCT l.l_returnflag AS flag, o.o_orderkey AS k
        FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
    ),
    runs AS (
        SELECT flag, k // {ROARING_CHUNK} AS chunk, k,
               CASE WHEN LAG(k) OVER (PARTITION BY flag,
                        k // {ROARING_CHUNK} ORDER BY k) = k - 1
                    THEN 0 ELSE 1 END AS run_start
        FROM keys
    ),
    cont AS (
        SELECT flag, chunk,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(run_start) AS BIGINT) AS n_runs
        FROM runs GROUP BY 1, 2
    ),
    priced AS (
        SELECT flag, chunk, n, n_runs,
               2 * n AS array_bytes,
               8192 AS bitmap_bytes,
               4 * n_runs AS run_bytes,
               CASE WHEN 4 * n_runs <= 2 * n
                         AND 4 * n_runs <= 8192 THEN 'run'
                    WHEN 2 * n <= 8192 THEN 'array'
                    ELSE 'bitmap' END AS winner
        FROM cont
    )
    SELECT flag, winner,
           CAST(COUNT(*) AS BIGINT) AS n_containers,
           CAST(SUM(n) AS BIGINT) AS n_keys,
           CAST(SUM(CASE winner WHEN 'run' THEN 4 * n_runs
                    WHEN 'array' THEN 2 * n ELSE 8192 END)
                AS BIGINT) AS bytes_chosen,
           CAST(SUM(8192) AS BIGINT) AS bytes_flat_bitmap
    FROM priced GROUP BY flag, winner
    """,
    doc=f"X265 roaring bitmap-index container plan (Chambi 2016) for "
        "l_returnflag over the orderkey space: 2^16-key containers, "
        "exact member and run counts (one LAG window over sorted "
        "distinct keys), array/bitmap/run priced per container "
        "(ties break run > array > bitmap like the format), per-"
        "(flag, winner) container counts and bytes vs the flat-"
        "bitmap strawman. The index-sizing lens next to X246/X212. "
        "Python replay + pricing-optimality laws.",
    tags=("X265", "X246", "X212", "X7", "X11"),
)
def roaring_container_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    keys = (li.join(o, o.o_orderkey == li.l_orderkey)
            .select(F.col("l_returnflag").alias("flag"),
                    F.col("o_orderkey").alias("k")).distinct())
    from pyspark.sql import Window
    wr = Window.partitionBy("flag", F.expr(f"k DIV {ROARING_CHUNK}")) \
        .orderBy("k")
    runs = keys.select(
        "flag", F.expr(f"k DIV {ROARING_CHUNK}").alias("chunk"), "k",
        F.when(F.lag("k").over(wr) == F.col("k") - 1, 0).otherwise(1)
        .alias("run_start"))
    cont = (runs.groupBy("flag", "chunk")
            .agg(F.count("*").cast("long").alias("n"),
                 F.sum("run_start").cast("long").alias("n_runs")))
    priced = cont.selectExpr(
        "flag", "n", "n_runs",
        "CASE WHEN 4 * n_runs <= 2 * n AND 4 * n_runs <= 8192"
        " THEN 'run' WHEN 2 * n <= 8192 THEN 'array'"
        " ELSE 'bitmap' END AS winner")
    return (priced.groupBy("flag", "winner")
            .agg(F.count("*").cast("long").alias("n_containers"),
                 F.sum("n").cast("long").alias("n_keys"),
                 F.sum(F.expr("CASE winner WHEN 'run' THEN 4 * n_runs"
                              " WHEN 'array' THEN 2 * n"
                              " ELSE 8192 END")).cast("long")
                 .alias("bytes_chosen"),
                 F.expr("CAST(SUM(8192) AS BIGINT)")
                 .alias("bytes_flat_bitmap")))


# --------------------------------------------------------------------------
# X266: Fagin's Threshold Algorithm early-termination audit — the
# top-k QUERY-PROCESSING economics none of the ranking family
# measures: X12 computes top-k outright; TA (Fagin-Lotem-Naor 2001)
# reads two rank-sorted lists in parallel and STOPS at the first
# depth where the k-th best fully-scored item seen beats the
# threshold (sum of the current list frontiers) — the reason a
# distributed top-k over per-attribute indexes touches thousands of
# rows, not billions. Items: parts; lists: quantity-sold and
# centi-revenue, deterministically ranked; combined score = q + r
# (monotone, the only TA requirement). For each audit depth d the
# query reports the exact threshold, the k-th best score among items
# ENTERED by depth d (min(rank_q, rank_r) <= d), and whether TA has
# stopped — the operating curve of index-backed top-k. All BIGINT.
# --------------------------------------------------------------------------
TA_DEPTHS = (5, 10, 25, 50, 100, 250)
TA_K = 10


@register(
    "fagin_ta_depth",
    f"""
    WITH s AS (
        SELECT l_partkey AS item,
               CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS q,
               CAST(SUM(CAST(ROUND(l_extendedprice * 100, 0)
                             AS BIGINT)) AS BIGINT) AS r
        FROM lineitem GROUP BY 1
    ),
    ranked AS (
        SELECT item, q, r, q + r AS f,
               ROW_NUMBER() OVER (ORDER BY q DESC, item) AS rq,
               ROW_NUMBER() OVER (ORDER BY r DESC, item) AS rr
        FROM s
    ),
    depths AS (SELECT UNNEST(ARRAY{list(TA_DEPTHS)}) AS d),
    thresh AS (
        SELECT t.d,
               (SELECT q FROM ranked WHERE rq = t.d)
               + (SELECT r FROM ranked WHERE rr = t.d) AS threshold
        FROM depths t
    ),
    kth AS (
        SELECT t.d,
               (SELECT MIN(f) FROM (
                    SELECT f FROM ranked
                    WHERE LEAST(rq, rr) <= t.d
                    ORDER BY f DESC LIMIT {TA_K})) AS kth_best,
               (SELECT CAST(COUNT(*) AS BIGINT) FROM ranked
                WHERE LEAST(rq, rr) <= t.d) AS n_seen
        FROM depths t
    )
    SELECT CAST(t.d AS BIGINT) AS depth, t.threshold, k.kth_best,
           k.n_seen,
           CASE WHEN k.n_seen >= {TA_K}
                     AND k.kth_best >= t.threshold
                THEN 1 ELSE 0 END AS stopped
    FROM thresh t JOIN kth k ON k.d = t.d
    """,
    doc=f"X266 Fagin TA early-termination audit (top-{TA_K} parts by "
        "quantity + centi-revenue, two deterministically-ranked "
        "lists): per audit depth, the exact TA threshold (sum of "
        "list frontiers), the k-th best fully-scored entered item "
        "(min(rank,rank) <= d — one histogram, no per-depth set "
        "build), and the stop flag. Measures WHY index-backed top-k "
        "touches thousands of rows at 100 TB, not billions. All "
        "BIGINT. Python replay + monotone-stop laws.",
    tags=("X266", "X12", "X63", "X7", "X11"),
)
def fagin_ta_depth(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window
    li = load_table(spark, sf_dir, "lineitem")
    s = (li.groupBy(F.col("l_partkey").alias("item"))
         .agg(F.sum(F.col("l_quantity").cast("long")).cast("long")
              .alias("q"),
              F.sum(F.round(F.col("l_extendedprice") * 100, 0)
                    .cast("long")).cast("long").alias("r")))
    ranked = (s.select(
        "item", "q", "r", (F.col("q") + F.col("r")).alias("f"),
        F.row_number().over(Window.orderBy(F.desc("q"), F.asc("item")))
        .alias("rq"),
        F.row_number().over(Window.orderBy(F.desc("r"), F.asc("item")))
        .alias("rr")).localCheckpoint())
    depths = spark.createDataFrame([(d,) for d in TA_DEPTHS], "d long")
    # LEFT joins: an audit depth beyond the item count keeps its row
    # with a NULL threshold (matching the oracle's scalar subqueries)
    qd = (ranked.select(F.col("rq").alias("d"), F.col("q").alias("tq"))
          .join(F.broadcast(depths), "d", "right"))
    rd = (ranked.select(F.col("rr").alias("d"), F.col("r").alias("tr"))
          .join(F.broadcast(depths), "d", "right")
          .withColumnRenamed("d", "d2"))
    thresh = (qd.join(rd, qd.d == rd.d2)
              .select("d", (F.col("tq") + F.col("tr")).alias("threshold")))
    entered = (ranked.select(F.least("rq", "rr").alias("m"), "f")
               .crossJoin(F.broadcast(depths.withColumnRenamed("d", "dd")))
               .filter(F.col("m") <= F.col("dd")))
    wk = Window.partitionBy("dd").orderBy(F.desc("f"))
    kth = (entered.withColumn("rn", F.row_number().over(wk))
           .groupBy("dd")
           .agg(F.min(F.when(F.col("rn") <= TA_K, F.col("f")))
                .alias("kth_best"),
                F.count("*").cast("long").alias("n_seen")))
    return (thresh.join(kth, thresh.d == kth.dd)
            .select(F.col("d").cast("long").alias("depth"),
                    "threshold", "kth_best", "n_seen",
                    F.when((F.col("n_seen") >= TA_K)
                           & (F.col("kth_best") >= F.col("threshold")),
                           1).otherwise(0).alias("stopped")))
