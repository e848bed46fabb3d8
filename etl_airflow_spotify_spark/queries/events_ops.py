"""Event-table operators: as-of join (X6), batch sessionization (X21
twin), pivot, approx aggregates (X8), array battery (X14 arrays).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from ..catalog import load_table
from ..operators.asof import asof_join_backward
from ..registry import register


def _ev(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "events")


# --------------------------------------------------------------------------
# X6: as-of join — each purchase matched to the user's latest click at or
# before the purchase time. Right side deduped to one row per (user, ts)
# so the match is deterministic in both engines.
# --------------------------------------------------------------------------
@register(
    "asof_purchase_click",
    """
    WITH purchases AS (
        SELECT event_id, user_id, ts, value FROM events
        WHERE event_type = 'purchase'
    ),
    clicks AS (
        SELECT user_id, ts,
               MIN(event_id) AS click_id,
               MIN(value)    AS click_value
        FROM events WHERE event_type = 'click'
        GROUP BY user_id, ts
    )
    SELECT p.event_id, p.user_id, p.ts,
           ROUND(p.value, 4) AS purchase_value,
           c.click_id AS asof_click_id,
           ROUND(c.click_value, 4) AS asof_click_value
    FROM purchases p
    ASOF LEFT JOIN clicks c
      ON p.user_id = c.user_id AND c.ts <= p.ts
    """,
    doc="As-of join via union-tag + carry-forward window (no native "
        "Spark ASOF); oracle uses DuckDB's native ASOF JOIN.",
    tags=("X6",),
)
def asof_purchase_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _ev(spark, sf_dir)
    purchases = ev.filter(F.col("event_type") == "purchase") \
                  .select("event_id", "user_id", "ts", "value")
    clicks = (ev.filter(F.col("event_type") == "click")
              .groupBy("user_id", "ts")
              .agg(F.min("event_id").alias("click_id"),
                   F.min("value").alias("click_value")))
    joined = asof_join_backward(purchases, clicks, on=["user_id"], ts="ts",
                                value_cols=["click_id", "click_value"])
    return joined.select(
        "event_id", "user_id", "ts",
        F.round("value", 4).alias("purchase_value"),
        F.col("asof_click_id"),
        F.round("asof_click_value", 4).alias("asof_click_value"),
    )


# --------------------------------------------------------------------------
# X21 (batch twin): sessionization — 30-minute-gap islands via lag+cumsum.
# Same shape the streaming session_window produces; this version is the
# oracle-checkable batch formulation.
# --------------------------------------------------------------------------
@register(
    "sessionize_events",
    """
    WITH marked AS (
        SELECT user_id, event_id, ts,
               CASE WHEN ts - LAG(ts) OVER w > INTERVAL 30 MINUTE
                         OR LAG(ts) OVER w IS NULL
                    THEN 1 ELSE 0 END AS is_start
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    numbered AS (
        SELECT user_id, event_id, ts,
               SUM(is_start) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                   ROWS UNBOUNDED PRECEDING) AS session_seq
        FROM marked
    )
    SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq,
           COUNT(*) AS n_events,
           MIN(ts) AS session_start,
           MAX(ts) AS session_end
    FROM numbered
    GROUP BY user_id, session_seq
    """,
    doc="Gap-based sessionization (30 min): lag + running sum islands.",
    tags=("X21", "X11"),
)
def sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _ev(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w_run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    # NTZ has no direct double cast; go via LTZ (session tz pinned UTC)
    # to keep sub-second precision in the gap comparison.
    epoch = F.col("ts").cast("timestamp").cast("double")
    gap = epoch - F.lag(epoch).over(w)
    marked = ev.select(
        "user_id", "event_id", "ts",
        F.when(gap.isNull() | (gap > 30 * 60), 1).otherwise(0).alias("is_start"),
    )
    return (
        marked.withColumn("session_seq",
                          F.sum("is_start").over(w_run).cast("long"))
        .groupBy("user_id", "session_seq")
        .agg(F.count("*").alias("n_events"),
             F.min("ts").alias("session_start"),
             F.max("ts").alias("session_end"))
    )


# --------------------------------------------------------------------------
# Pivot: event counts per user bucketed by type (fixed value list keeps
# the output schema static — required at scale and for the oracle).
# --------------------------------------------------------------------------
@register(
    "pivot_event_types",
    """
    SELECT user_id % 10 AS user_bucket,
           CAST(COALESCE(SUM(CASE WHEN event_type = 'click'    THEN 1 END), 0) AS BIGINT) AS click,
           CAST(COALESCE(SUM(CASE WHEN event_type = 'view'     THEN 1 END), 0) AS BIGINT) AS view,
           CAST(COALESCE(SUM(CASE WHEN event_type = 'purchase' THEN 1 END), 0) AS BIGINT) AS purchase,
           CAST(COALESCE(SUM(CASE WHEN event_type = 'signup'   THEN 1 END), 0) AS BIGINT) AS signup,
           CAST(COALESCE(SUM(CASE WHEN event_type = 'error'    THEN 1 END), 0) AS BIGINT) AS error
    FROM events
    GROUP BY user_id % 10
    """,
    doc="Pivot with a fixed pivot-value list (static schema, single pass).",
    tags=("X7", "X14"),
)
def pivot_event_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _ev(spark, sf_dir)
    types = ["click", "view", "purchase", "signup", "error"]
    out = (ev.groupBy((F.col("user_id") % 10).alias("user_bucket"))
           .pivot("event_type", types).count())
    for t in types:
        out = out.withColumn(t, F.coalesce(F.col(t), F.lit(0)).cast("long"))
    return out


# --------------------------------------------------------------------------
# X8 approx: HLL distinct + approximate quantiles. Engine-specific
# estimates -> no value oracle; rows-only. Exactness is bounded by a test
# (tests/test_operators.py) against the exact values.
# --------------------------------------------------------------------------
@register(
    "approx_aggregates",
    None,
    doc="approx_count_distinct (HLL) + percentile_approx per event type.",
    tags=("X8",),
)
def approx_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _ev(spark, sf_dir)
    return ev.groupBy("event_type").agg(
        F.approx_count_distinct("user_id").alias("approx_users"),
        F.percentile_approx("value", 0.5).alias("approx_median_value"),
        F.percentile_approx("value", 0.95).alias("approx_p95_value"),
    )


# --------------------------------------------------------------------------
# X14 arrays: battery over the embeddings vector column.
# --------------------------------------------------------------------------
@register(
    "array_battery",
    """
    SELECT vec_id,
           CAST(len(embedding) AS BIGINT) AS dim,
           array_to_string(
               list_transform(embedding[1:3],
                              x -> CAST(ROUND(CAST(x AS DOUBLE) * 10000)
                                        AS BIGINT)), ',') AS head3,
           ROUND(list_max(CAST(embedding AS DOUBLE[])), 4) AS vmax,
           ROUND(list_min(CAST(embedding AS DOUBLE[])), 4) AS vmin,
           ROUND(list_aggregate(CAST(embedding AS DOUBLE[]), 'sum'), 4) AS vsum,
           CAST(len(list_filter(CAST(embedding AS DOUBLE[]), x -> x > 0))
                AS BIGINT) AS n_pos
    FROM embeddings
    WHERE vec_id < 100
    """,
    doc="Array functions: size/slice/min/max/fold/filter over vectors.",
    tags=("X14",),
)
def array_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 100)
    vd = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    return emb.select(
        "vec_id",
        F.size("embedding").cast("long").alias("dim"),
        # Driver canonicalizer hashes cells via pandas sort_values, which
        # chokes on array cells (round-1 red row).  Render the slice as an
        # integer-scaled CSV string: stable across engines, hashable.
        F.array_join(
            F.transform(F.slice("embedding", 1, 3),
                        lambda x: F.round(x.cast("double") * 10000)
                        .cast("long").cast("string")),
            ",").alias("head3"),
        F.round(F.array_max(vd), 4).alias("vmax"),
        F.round(F.array_min(vd), 4).alias("vmin"),
        F.round(F.aggregate(vd, F.lit(0.0), lambda a, x: a + x), 4).alias("vsum"),
        F.size(F.filter(vd, lambda x: x > 0)).cast("long").alias("n_pos"),
    )


# --------------------------------------------------------------------------
# X9 via the SQL API: GROUPING SETS (also exercises temp-view
# registration + spark.sql entry path).
# --------------------------------------------------------------------------
@register(
    "grouping_sets_sql",
    """
    SELECT l_returnflag, l_linestatus,
           COUNT(*) AS n, ROUND(SUM(l_extendedprice), 2) AS total
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus),
                            (l_returnflag, l_linestatus))
    """,
    doc="GROUPING SETS through the spark.sql entry path.",
    tags=("X9",),
)
def grouping_sets_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql("""
        SELECT l_returnflag, l_linestatus,
               COUNT(*) AS n, ROUND(SUM(l_extendedprice), 2) AS total
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus),
                                (l_returnflag, l_linestatus))
    """)


# --------------------------------------------------------------------------
# X11: time-interval RANGE window frame — per-user trailing-10-minute
# stats on every event. Unlike the rowsBetween running totals above,
# the frame is bounded by the ORDER-BY VALUE (a timestamp interval), the
# frame shape real-time feature pipelines use ("activity in the last N
# minutes as of each event").
# --------------------------------------------------------------------------
@register(
    "events_trailing_window",
    """
    SELECT event_id, user_id,
           CAST(COUNT(*) OVER w AS BIGINT) AS n_10m,
           ROUND(SUM(value) OVER w, 4) AS sum_10m
    FROM events
    WHERE user_id % 50 = 0
    WINDOW w AS (PARTITION BY user_id ORDER BY ts
                 RANGE BETWEEN INTERVAL '10 minutes' PRECEDING
                           AND CURRENT ROW)
    """,
    doc="Value-bounded RANGE window frame (trailing 10-minute interval "
        "per user). Scales as one shuffle on user_id; no self-join.",
    tags=("X11",),
)
def events_trailing_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "events").createOrReplaceTempView("events")
    return spark.sql("""
        SELECT event_id, user_id,
               COUNT(*) OVER w AS n_10m,
               ROUND(SUM(value) OVER w, 4) AS sum_10m
        FROM events
        WHERE user_id % 50 = 0
        WINDOW w AS (PARTITION BY user_id ORDER BY ts
                     RANGE BETWEEN INTERVAL 10 MINUTES PRECEDING
                               AND CURRENT ROW)
    """)


# --------------------------------------------------------------------------
# X14 (Spark 4): VARIANT semi-structured type. parse_json once into an
# open-schema VARIANT column, then typed variant_get extraction — the
# shredding-friendly path for JSON at scale (vs per-field string
# re-parsing with get_json_object).
# --------------------------------------------------------------------------
@register(
    "events_variant_stats",
    """
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(props ->> '$.k' AS BIGINT)) AS BIGINT) AS sum_k,
           CAST(MIN(CAST(props ->> '$.k' AS BIGINT)) AS BIGINT) AS min_k
    FROM events
    WHERE CAST(props ->> '$.k' AS BIGINT) % 2 = 0
    GROUP BY event_type
    """,
    doc="Spark 4 VARIANT: parse_json + typed variant_get extraction and "
        "a filter on the extracted field; oracle uses DuckDB JSON "
        "operators over the same column.",
    tags=("X14",),
)
def events_variant_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    v = ev.select("event_type",
                  F.parse_json("props").alias("pv"))
    k = F.variant_get(F.col("pv"), "$.k", "bigint")
    return (
        v.select("event_type", k.alias("k"))
        .filter(F.col("k") % 2 == 0)
        .groupBy("event_type")
        .agg(F.count("*").alias("n"),
             F.sum("k").alias("sum_k"),
             F.min("k").alias("min_k"))
    )


@register(
    "asof_tolerance_click",
    """
    WITH purchases AS (
        SELECT event_id, user_id, ts FROM events
        WHERE event_type = 'purchase'
    ),
    clicks AS (
        SELECT user_id, ts, MIN(event_id) AS click_id
        FROM events WHERE event_type = 'click'
        GROUP BY user_id, ts
    )
    SELECT p.event_id, p.user_id, p.ts,
           CASE WHEN date_diff('second', c.ts, p.ts) <= 1800
                THEN c.click_id END AS asof_click_id
    FROM purchases p
    ASOF LEFT JOIN clicks c
      ON p.user_id = c.user_id AND c.ts <= p.ts
    """,
    doc="Tolerance-bounded as-of join (30-minute lookback, pandas "
        "merge_asof tolerance semantics): matches older than the "
        "tolerance become nulls; same single-window plan.",
    tags=("X6",),
)
def asof_tolerance_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _ev(spark, sf_dir)
    purchases = ev.filter(F.col("event_type") == "purchase") \
                  .select("event_id", "user_id", "ts")
    clicks = (ev.filter(F.col("event_type") == "click")
              .groupBy("user_id", "ts")
              .agg(F.min("event_id").alias("click_id")))
    return asof_join_backward(purchases, clicks, on=["user_id"], ts="ts",
                              value_cols=["click_id"],
                              tolerance_seconds=1800)


@register(
    "resample_gap_fill",
    """
    WITH bounds AS (
        SELECT date_trunc('day', MIN(ts)) AS lo, date_trunc('day', MAX(ts)) AS hi
        FROM events
    ),
    grid AS (
        SELECT u.user_id, g.day
        FROM (SELECT DISTINCT user_id FROM events) u
        CROSS JOIN bounds
        CROSS JOIN UNNEST(generate_series(bounds.lo, bounds.hi,
                                          INTERVAL 1 DAY)) AS g(day)
    ),
    counts AS (
        SELECT user_id, date_trunc('day', ts) AS day,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM events GROUP BY 1, 2
    ),
    last_per_day AS (
        SELECT user_id, day, value FROM (
            SELECT user_id, date_trunc('day', ts) AS day, value,
                   ROW_NUMBER() OVER (PARTITION BY user_id, date_trunc('day', ts)
                                      ORDER BY ts DESC, event_id DESC) AS rn
            FROM events)
        WHERE rn = 1
    )
    SELECT g.user_id, g.day,
           COALESCE(c.n, 0) AS n_events,
           LAST_VALUE(l.value IGNORE NULLS) OVER (
               PARTITION BY g.user_id ORDER BY g.day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS value_ffill
    FROM grid g
    LEFT JOIN counts c USING (user_id, day)
    LEFT JOIN last_per_day l USING (user_id, day)
    """,
    doc="Hypertable-style resample to a daily grid with forward fill: "
        "every (user, day) cell exists even with no events, carrying "
        "the last observed value across gaps. The grid is GENERATED "
        "(distinct users x sequence of days, bounds via a broadcast "
        "1-row aggregate) — never materialized wider than the output; "
        "the fill is one last(ignoreNulls) window per user, so the "
        "whole query shuffles twice (grid join, fill window) no matter "
        "how long the time range grows.",
    tags=("X11", "X14", "X3"),
)
def resample_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _ev(spark, sf_dir)
    bounds = ev.agg(F.date_trunc("day", F.min("ts")).alias("lo"),
                    F.date_trunc("day", F.max("ts")).alias("hi"))
    grid = (ev.select("user_id").distinct()
              .crossJoin(F.broadcast(bounds))
              .select("user_id",
                      F.explode(F.sequence(
                          "lo", "hi", F.expr("interval 1 day"))).alias("day")))
    day = F.date_trunc("day", F.col("ts"))
    counts = (ev.groupBy("user_id", day.alias("day"))
                .agg(F.count("*").alias("n_events")))
    w_last = Window.partitionBy("user_id", "day") \
                   .orderBy(F.desc("ts"), F.desc("event_id"))
    last_per_day = (ev.select("user_id", day.alias("day"), "value", "ts",
                              "event_id")
                      .withColumn("rn", F.row_number().over(w_last))
                      .filter(F.col("rn") == 1)
                      .select("user_id", "day", "value"))
    w_fill = (Window.partitionBy("user_id").orderBy("day")
              .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return (grid.join(counts, ["user_id", "day"], "left")
                .join(last_per_day, ["user_id", "day"], "left")
                .select("user_id", "day",
                        F.coalesce("n_events", F.lit(0)).alias("n_events"),
                        F.last("value", ignorenulls=True).over(w_fill)
                         .alias("value_ffill")))


@register(
    "concurrent_orders",
    """
    WITH iv AS (
        SELECT o_orderkey, o_custkey, o_orderdate AS s,
               GREATEST(o_orderdate, MAX(l_shipdate)) AS e
        FROM orders JOIN lineitem ON l_orderkey = o_orderkey
        WHERE o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate <  TIMESTAMP '1997-01-01'
        GROUP BY 1, 2, 3
    )
    SELECT a.o_custkey AS o_custkey,
           a.o_orderkey AS okey_a, b.o_orderkey AS okey_b,
           date_diff('day', CAST(GREATEST(a.s, b.s) AS DATE),
                            CAST(LEAST(a.e, b.e) AS DATE)) AS overlap_days
    FROM iv a JOIN iv b
      ON a.o_custkey = b.o_custkey AND a.o_orderkey < b.o_orderkey
     AND a.s <= b.e AND b.s <= a.e
    """,
    doc="Interval-overlap self-join (X5): pairs of 1996 orders by the "
        "same customer whose [orderdate, last-shipdate] spans overlap, "
        "with the overlap length (spans clamped to end no earlier than "
        "they start: synthetic rows can ship before ordering). Executed "
        "via month-bucketed candidate "
        "generation (operators/intervals.py) — an equi-join on "
        "(custkey, month-bucket) plus exact verification — because the "
        "raw overlap predicate has no equi-key and would plan a "
        "quadratic nested-loop join. The oracle IS the naive all-pairs "
        "formulation, so a pass proves the binning loses no pair.",
    tags=("X5", "X3"),
)
def concurrent_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.intervals import interval_overlap_self_join

    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp")))
    li = load_table(spark, sf_dir, "lineitem")
    iv = (o.join(li, F.col("o_orderkey") == F.col("l_orderkey"))
           .groupBy("o_orderkey", "o_custkey", "o_orderdate")
           .agg(F.greatest(F.first("o_orderdate"),
                           F.max("l_shipdate")).alias("e"))
           .select("o_orderkey", "o_custkey",
                   F.col("o_orderdate").alias("s"), "e"))
    pairs = interval_overlap_self_join(iv, "o_custkey", "o_orderkey",
                                       "s", "e")
    return pairs.select(
        "o_custkey",
        F.col("a_id").alias("okey_a"), F.col("b_id").alias("okey_b"),
        F.datediff(F.least("a_e", "b_e").cast("date"),
                   F.greatest("a_s", "b_s").cast("date"))
         .alias("overlap_days"))


# --------------------------------------------------------------------------
# Funnel + cohort analytics: the two workhorse event-analytics shapes.
# --------------------------------------------------------------------------
@register(
    "funnel_view_click_purchase",
    """
    WITH u AS (SELECT DISTINCT user_id FROM events),
    u1 AS (SELECT user_id, MIN(ts) AS t1 FROM events
           WHERE event_type = 'view' GROUP BY user_id),
    u2 AS (SELECT e.user_id, MIN(e.ts) AS t2 FROM events e
           JOIN u1 USING (user_id)
           WHERE e.event_type = 'click' AND e.ts > u1.t1
           GROUP BY e.user_id),
    u3 AS (SELECT e.user_id, MIN(e.ts) AS t3 FROM events e
           JOIN u2 USING (user_id)
           WHERE e.event_type = 'purchase' AND e.ts > u2.t2
           GROUP BY e.user_id)
    SELECT u.user_id,
           CAST(CASE WHEN t3 IS NOT NULL THEN 3
                     WHEN t2 IS NOT NULL THEN 2
                     WHEN t1 IS NOT NULL THEN 1
                     ELSE 0 END AS BIGINT) AS funnel_stage,
           t1, t2, t3
    FROM u LEFT JOIN u1 USING (user_id)
           LEFT JOIN u2 USING (user_id)
           LEFT JOIN u3 USING (user_id)
    """,
    doc="Ordered-funnel analysis (view -> click -> purchase, strictly "
        "increasing timestamps): each user's event stream is folded "
        "ONCE — collect_list(struct) -> array_sort -> F.aggregate state "
        "machine, all JVM HOFs — so the whole funnel costs ONE shuffle "
        "on user_id regardless of stage count. The relational "
        "formulation (the oracle) needs a join + re-aggregation PER "
        "STAGE, which at 100 TB is k shuffles of the full event table "
        "vs this plan's one; strict '>' stage transitions make "
        "tie-order irrelevant, so both formulations provably agree "
        "(the hash match is that proof).",
    tags=("X7", "X11", "X14", "X21"),
)
def funnel_view_click_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _ev(spark, sf_dir).select("user_id", "ts", "event_id", "event_type")
    ts_t = "timestamp_ntz"
    init = F.struct(
        F.lit(0).cast("int").alias("stage"),
        F.lit(None).cast(ts_t).alias("t1"),
        F.lit(None).cast(ts_t).alias("t2"),
        F.lit(None).cast(ts_t).alias("t3"))

    def step(st, e):
        adv1 = (st["stage"] == 0) & (e["event_type"] == "view")
        adv2 = ((st["stage"] == 1) & (e["event_type"] == "click")
                & (e["ts"] > st["t1"]))
        adv3 = ((st["stage"] == 2) & (e["event_type"] == "purchase")
                & (e["ts"] > st["t2"]))
        return F.struct(
            F.when(adv1, 1).when(adv2, 2).when(adv3, 3)
            .otherwise(st["stage"]).cast("int").alias("stage"),
            F.when(adv1, e["ts"]).otherwise(st["t1"]).alias("t1"),
            F.when(adv2, e["ts"]).otherwise(st["t2"]).alias("t2"),
            F.when(adv3, e["ts"]).otherwise(st["t3"]).alias("t3"))

    folded = (
        ev.groupBy("user_id")
        # struct field order (ts, event_id, ...) = the sort key: ts
        # first, unique event_id second -> total order, ties resolved
        .agg(F.array_sort(F.collect_list(
            F.struct("ts", "event_id", "event_type"))).alias("evs"))
        .select("user_id",
                F.aggregate("evs", init, step).alias("f")))
    return folded.select(
        "user_id",
        F.col("f.stage").cast("long").alias("funnel_stage"),
        F.col("f.t1").alias("t1"), F.col("f.t2").alias("t2"),
        F.col("f.t3").alias("t3"))


@register(
    "cohort_retention",
    """
    WITH first_seen AS (
        SELECT user_id, time_bucket(INTERVAL 7 DAYS, MIN(ts),
                                    TIMESTAMP '2024-01-01') AS cohort_week
        FROM events GROUP BY user_id
    )
    SELECT cohort_week,
           CAST(date_diff('day',
                          cohort_week,
                          time_bucket(INTERVAL 7 DAYS, e.ts,
                                      TIMESTAMP '2024-01-01')) // 7
                AS BIGINT) AS week_offset,
           CAST(COUNT(DISTINCT e.user_id) AS BIGINT) AS n_active
    FROM events e JOIN first_seen USING (user_id)
    GROUP BY 1, 2
    """,
    doc="Cohort retention matrix: users grouped by first-activity week "
        "(anchored 7-day buckets), distinct active users per (cohort, "
        "week offset) — THE standard retention triangle. Two shuffles "
        "total: min-ts per user (map-side combined), then the "
        "count-distinct agg; the first_seen side is user-cardinality "
        "(small) and broadcasts at real scale.",
    tags=("X7", "X8", "X14"),
)
def cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _ev(spark, sf_dir).select("user_id", "ts")
    anchor = "2024-01-01"
    week = lambda c: F.timestamp_seconds(  # noqa: E731
        F.unix_timestamp(F.lit(anchor).cast("timestamp"))
        + (F.floor((F.unix_timestamp(c)
                    - F.unix_timestamp(F.lit(anchor).cast("timestamp")))
                   / (7 * 86400)) * 7 * 86400)).cast("timestamp_ntz")
    first_seen = (ev.groupBy("user_id")
                  .agg(week(F.min("ts")).alias("cohort_week")))
    j = ev.join(first_seen, "user_id")
    return (j.groupBy(
                "cohort_week",
                F.floor(F.datediff(week(F.col("ts")), F.col("cohort_week"))
                        / 7).cast("long").alias("week_offset"))
            .agg(F.count_distinct("user_id").cast("long").alias("n_active")))


EWMA_ALPHA = 0.3


@register(
    "ewma_user_value",
    f"""
    WITH ordered AS (
        SELECT user_id, list(value ORDER BY ts, event_id) AS vs
        FROM events GROUP BY user_id
    )
    SELECT user_id,
           CAST(len(vs) AS BIGINT) AS n_events,
           ROUND(list_reduce(vs,
                 (acc, x) -> {EWMA_ALPHA} * x + {1 - EWMA_ALPHA} * acc), 4)
               AS ewma
    FROM ordered
    """,
    doc="Per-user exponentially-weighted moving average of event value "
        "— an ORDER-DEPENDENT recurrence (ewma_t = a*x_t + (1-a)*"
        "ewma_{{t-1}}) that window frames cannot express and naive "
        "closed forms ((1-a)^-i weights) overflow on. Spark shape: "
        "collect_list sorted by (ts, event_id) -> F.aggregate fold — "
        "ONE shuffle per key, exact recurrence, all JVM. The oracle "
        "replays the identical fold with DuckDB's list_reduce: both "
        "engines execute the same double ops in the same order, so "
        "even a floating-point recurrence hash-matches.",
    tags=("X11", "X14", "X21"),
)
def ewma_user_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _ev(spark, sf_dir).select("user_id", "ts", "event_id", "value")
    folded = (
        ev.groupBy("user_id")
        .agg(F.array_sort(F.collect_list(
            F.struct("ts", "event_id", "value"))).alias("evs"))
        .select("user_id",
                F.size("evs").cast("long").alias("n_events"),
                F.aggregate(
                    F.slice(F.transform("evs", lambda e: e["value"]), 2,
                            F.greatest(F.size("evs") - 1, F.lit(0))),
                    F.element_at(F.transform("evs", lambda e: e["value"]), 1),
                    lambda acc, x: F.lit(EWMA_ALPHA) * x
                    + F.lit(1 - EWMA_ALPHA) * acc).alias("raw")))
    return folded.select("user_id", "n_events",
                         F.round("raw", 4).alias("ewma"))


@register(
    "robust_value_outliers",
    """
    WITH med AS (
        SELECT event_type, quantile_cont(value, 0.5) AS m
        FROM events GROUP BY event_type
    ),
    wm AS (
        SELECT e.event_type, e.value, m.m
        FROM events e JOIN med m ON e.event_type = m.event_type
    ),
    mad AS (
        SELECT event_type, quantile_cont(abs(value - m), 0.5) AS d
        FROM wm GROUP BY event_type
    )
    SELECT w.event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(MIN(w.m), 4) AS med,
           ROUND(MIN(a.d), 4) AS mad,
           CAST(SUM(CASE WHEN abs(w.value - w.m) > (3.5 / 0.6745) * a.d
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
           ROUND(SUM(CASE WHEN abs(w.value - w.m) > (3.5 / 0.6745) * a.d
                          THEN 1 ELSE 0 END)::DOUBLE / COUNT(*), 4)
               AS outlier_frac
    FROM wm w JOIN mad a ON w.event_type = a.event_type
    GROUP BY w.event_type
    """,
    doc="X36 robust outlier detection: per-type median + MAD (exact "
        "percentile, matched to DuckDB quantile_cont), flag modified "
        "z-score > 3.5 (Iglewicz-Hoaglin). Group-sized med/MAD frames "
        "broadcast back, so the fact scan never shuffles.",
    tags=("X36", "X7", "X11"),
)
def robust_value_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.robust import grouped_robust_stats

    return grouped_robust_stats(_ev(spark, sf_dir), "event_type", "value")


@register(
    "twap_user_value",
    """
    WITH seq AS (
        SELECT user_id, value, ts,
               lead(ts) OVER (PARTITION BY user_id
                              ORDER BY ts, event_id) AS nxt
        FROM events
    ),
    seg AS (
        SELECT user_id, value,
               date_diff('microsecond', ts, nxt) AS dt_us
        FROM seq WHERE nxt IS NOT NULL
    )
    SELECT user_id,
           CAST(COUNT(*) + 1 AS BIGINT) AS n_events,
           CAST(SUM(dt_us) // 1000000 AS BIGINT) AS span_seconds,
           ROUND(SUM(value * dt_us) / SUM(dt_us), 4) AS twap
    FROM seg GROUP BY user_id
    """,
    doc="Time-weighted average price/value per user (TWAP): each "
        "observation is weighted by how long it was 'current' (lead "
        "window over event time, event_id tiebreak for deterministic "
        "duplicate-ts ordering). ONE shuffle total: the lead window "
        "partitions by user_id and the aggregate reuses that "
        "partitioning. Weights are exact microsecond integers, so the "
        "weighted sum is reproducible cross-engine after rounding.",
    tags=("X11", "X7"),
)
def twap_user_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _ev(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seg = (ev.withColumn("nxt", F.lead("ts").over(w))
           .filter(F.col("nxt").isNotNull())
           .withColumn(
               # unix_micros takes TIMESTAMP, not NTZ; session tz is
               # pinned UTC so the cast is value-preserving
               "dt_us",
               (F.unix_micros(F.col("nxt").cast("timestamp"))
                - F.unix_micros(F.col("ts").cast("timestamp")))))
    return (seg.groupBy("user_id")
            .agg((F.count("*") + 1).cast("long").alias("n_events"),
                 F.expr("SUM(dt_us) DIV 1000000").cast("long")
                 .alias("span_seconds"),
                 F.round(F.sum(F.col("value") * F.col("dt_us"))
                         / F.sum("dt_us"), 4).alias("twap")))


@register(
    "event_transition_matrix",
    """
    WITH seq AS (
        SELECT user_id, event_type,
               lead(event_type) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS nxt
        FROM events
    ),
    pairs AS (SELECT event_type, nxt FROM seq WHERE nxt IS NOT NULL),
    tot AS (SELECT event_type, COUNT(*) AS n FROM pairs GROUP BY event_type)
    SELECT p.event_type AS from_type, p.nxt AS to_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(COUNT(*)::DOUBLE / MIN(t.n), 4) AS prob
    FROM pairs p JOIN tot t ON p.event_type = t.event_type
    GROUP BY p.event_type, p.nxt
    """,
    doc="First-order Markov transition matrix over per-user event "
        "sequences (the next-event-prediction training target): lead "
        "window keyed by user, pair counts, row-normalized "
        "probabilities. ONE shuffle for the window; the count and "
        "normalizer aggregates are map-side-combinable on tiny "
        "(type, type) keys. Probabilities are exact count ratios.",
    tags=("X11", "X7", "X10"),
)
def event_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _ev(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (ev.withColumn("nxt", F.lead("event_type").over(w))
             .filter(F.col("nxt").isNotNull())
             .select(F.col("event_type").alias("from_type"),
                     F.col("nxt").alias("to_type")))
    tot = pairs.groupBy("from_type").agg(F.count("*").alias("n_from"))
    return (pairs.groupBy("from_type", "to_type")
            .agg(F.count("*").cast("long").alias("n"))
            .join(F.broadcast(tot), "from_type")
            .select("from_type", "to_type", "n",
                    F.round(F.col("n") / F.col("n_from"), 4).alias("prob")))


@register(
    "rolling_corr_click_purchase",
    """
    WITH daily AS (
        SELECT CAST(ts AS DATE) AS day,
               CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
                    AS BIGINT) AS clicks,
               CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                    AS BIGINT) AS purchases
        FROM events GROUP BY CAST(ts AS DATE)
    ),
    sums AS (
        SELECT day, clicks, purchases,
               COUNT(*) OVER w AS n,
               SUM(clicks) OVER w AS sx, SUM(purchases) OVER w AS sy,
               SUM(clicks * purchases) OVER w AS sxy,
               SUM(clicks * clicks) OVER w AS sx2,
               SUM(purchases * purchases) OVER w AS sy2
        FROM daily
        WINDOW w AS (ORDER BY day ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
    )
    SELECT day, clicks, purchases,
           ROUND((n * sxy - sx * sy)
                 / NULLIF(sqrt((n * sx2 - sx * sx)
                               * (n * sy2 - sy * sy)), 0), 4)
               AS corr7d
    FROM sums WHERE n = 7
    """,
    doc="7-day rolling Pearson correlation between daily click and "
        "purchase volumes, computed from EXACT integer window sums "
        "(n, sx, sy, sxy, sx2, sy2) instead of a float corr aggregate: "
        "integer sums are order-independent and engine-exact, the "
        "single final expression is deterministic, and degenerate "
        "(zero-variance) windows give NULL identically on both "
        "engines — no NaN-vs-NULL ambiguity. One shuffle for the "
        "daily rollup; the ordered day frame is tiny (one row per "
        "day) so the single-partition window is safe at any corpus "
        "size.",
    tags=("X11", "X7", "X14"),
)
def rolling_corr_click_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _ev(spark, sf_dir)
    daily = (ev.groupBy(F.col("ts").cast("date").alias("day"))
             .agg(F.sum((F.col("event_type") == "click").cast("int"))
                  .cast("long").alias("clicks"),
                  F.sum((F.col("event_type") == "purchase").cast("int"))
                  .cast("long").alias("purchases")))
    w = Window.orderBy("day").rowsBetween(-6, 0)
    s = (daily
         .withColumn("n", F.count("*").over(w))
         .withColumn("sx", F.sum("clicks").over(w))
         .withColumn("sy", F.sum("purchases").over(w))
         .withColumn("sxy", F.sum(F.col("clicks") * F.col("purchases")).over(w))
         .withColumn("sx2", F.sum(F.col("clicks") * F.col("clicks")).over(w))
         .withColumn("sy2", F.sum(F.col("purchases") * F.col("purchases")).over(w)))
    denom = F.sqrt((F.col("n") * F.col("sx2") - F.col("sx") * F.col("sx"))
                   * (F.col("n") * F.col("sy2") - F.col("sy") * F.col("sy")))
    corr = ((F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy"))
            / F.when(denom != 0, denom))
    return (s.filter(F.col("n") == 7)
            .select("day", "clicks", "purchases",
                    F.round(corr, 4).alias("corr7d")))


@register(
    "order_interval_coverage",
    """
    WITH iv AS (
        SELECT o.o_custkey AS custkey,
               CAST(o.o_orderdate AS DATE) AS s,
               GREATEST(CAST(MAX(l.l_shipdate) AS DATE),
                        CAST(o.o_orderdate AS DATE)) AS e
        FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        GROUP BY o.o_custkey, o.o_orderkey, o.o_orderdate
    ),
    marked AS (
        SELECT custkey, s, e,
               CASE WHEN s > MAX(e) OVER (
                        PARTITION BY custkey ORDER BY s, e
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                    THEN 1 ELSE 0 END AS new_seg
        FROM iv
    ),
    seg AS (
        SELECT custkey, s, e,
               SUM(new_seg) OVER (PARTITION BY custkey ORDER BY s, e
                                  ROWS UNBOUNDED PRECEDING) AS seg_id
        FROM marked
    ),
    spans AS (
        SELECT custkey, seg_id,
               datediff('day', MIN(s), MAX(e)) + 1 AS seg_days
        FROM seg GROUP BY custkey, seg_id
    )
    SELECT custkey,
           CAST(COUNT(*) AS BIGINT) AS n_segments,
           CAST(SUM(seg_days) AS BIGINT) AS covered_days
    FROM spans GROUP BY custkey
    """,
    doc="X46 sweep-line interval union: each order spans "
        "[o_orderdate, max(l_shipdate)] (clamped — synthetic data has "
        "shipdates before the order date); per customer, merge "
        "overlapping spans into segments and total the covered days. "
        "The classic algorithm, expressed as windows PARTITIONED BY "
        "CUSTOMER — per-partition data is one customer's orders, so no "
        "global sort exists anywhere and the shape survives any corpus "
        "size. New-segment detection = start beyond the running max end "
        "over preceding rows; all-day integer arithmetic, exact "
        "cross-engine.",
    tags=("X46", "X11", "X7", "X5"),
)
def order_interval_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    iv = (o.join(li, li["l_orderkey"] == o["o_orderkey"])
          .groupBy("o_custkey", "o_orderkey", "o_orderdate")
          .agg(F.greatest(F.max(F.col("l_shipdate").cast("date")),
                          F.min(F.col("o_orderdate").cast("date")))
               .alias("e"))
          .select(F.col("o_custkey").alias("custkey"),
                  F.col("o_orderdate").cast("date").alias("s"), "e"))
    order_w = Window.partitionBy("custkey").orderBy("s", "e")
    prev_max_e = (F.max("e").over(
        order_w.rowsBetween(Window.unboundedPreceding, -1)))
    marked = iv.withColumn(
        "new_seg", F.when(F.col("s") > prev_max_e, 1).otherwise(0))
    seg = marked.withColumn(
        "seg_id", F.sum("new_seg").over(
            order_w.rowsBetween(Window.unboundedPreceding, 0)))
    spans = (seg.groupBy("custkey", "seg_id")
             .agg((F.datediff(F.max("e"), F.min("s")) + 1).alias("seg_days")))
    return (spans.groupBy("custkey")
            .agg(F.count("*").cast("long").alias("n_segments"),
                 F.sum("seg_days").cast("long").alias("covered_days")))


ANOM_Z = 2.5
SHIFT_MIN = 50.0


@register(
    "event_anomaly_days",
    f"""
    WITH daily AS (
        SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM events GROUP BY 1
    ),
    dowd AS (
        SELECT day, n, (day - DATE '1970-01-01') % 7 AS dow FROM daily
    ),
    base AS (
        SELECT dow, AVG(n) AS mu, stddev_samp(n) AS sd
        FROM dowd GROUP BY dow
    ),
    shifted AS (
        SELECT day, n, dow,
               AVG(n) OVER (ORDER BY day
                            ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING) AS pre,
               COUNT(*) OVER (ORDER BY day
                              ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING) AS npre,
               AVG(n) OVER (ORDER BY day
                            ROWS BETWEEN 1 FOLLOWING AND 7 FOLLOWING) AS post,
               COUNT(*) OVER (ORDER BY day
                              ROWS BETWEEN 1 FOLLOWING AND 7 FOLLOWING) AS npost
        FROM dowd
    )
    SELECT s.day, s.n, CAST(s.dow AS BIGINT) AS dow,
           ROUND((s.n - b.mu) / b.sd, 4) AS z,
           CASE WHEN ABS((s.n - b.mu) / b.sd) > {ANOM_Z} THEN 1 ELSE 0 END
               AS is_anomaly,
           CASE WHEN npre = 7 AND npost = 7
                THEN ROUND(post - pre, 4) END AS level_shift,
           CASE WHEN npre = 7 AND npost = 7
                     AND ABS(post - pre) > {SHIFT_MIN}
                THEN 1 ELSE 0 END AS is_shift
    FROM shifted s JOIN base b USING (dow)
    """,
    doc="X49 time-series anomaly detection on the event stream: "
        "day-of-week seasonal z-scores (per-dow mean/stddev baseline) "
        "plus a 7-day-before vs 7-day-after level-shift probe. The "
        "corpus-sized pass is ONE day-keyed aggregate; every window "
        "after it runs on the daily table, whose cardinality is "
        "calendar-bounded (|days|), so the global ORDER BY day frame "
        "is safe at any event volume. Day-of-week from epoch-day "
        "modulus — identical integer on both engines (their dayofweek "
        "builtins disagree on numbering).",
    tags=("X49", "X11", "X7"),
)
def event_anomaly_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    daily = (e.groupBy(F.date_trunc("day", "ts").cast("date").alias("day"))
             .agg(F.count("*").cast("long").alias("n")))
    dowd = daily.withColumn(
        "dow", F.datediff("day", F.lit("1970-01-01").cast("date")) % 7)
    base = dowd.groupBy("dow").agg(F.avg("n").alias("mu"),
                                   F.stddev_samp("n").alias("sd"))
    wd = Window.orderBy("day")
    pre_f = wd.rowsBetween(-7, -1)
    post_f = wd.rowsBetween(1, 7)
    s = (dowd
         .withColumn("pre", F.avg("n").over(pre_f))
         .withColumn("npre", F.count("*").over(pre_f))
         .withColumn("post", F.avg("n").over(post_f))
         .withColumn("npost", F.count("*").over(post_f)))
    z = (F.col("n") - F.col("mu")) / F.col("sd")
    full = (F.col("npre") == 7) & (F.col("npost") == 7)
    shift = F.col("post") - F.col("pre")
    return (s.join(base, "dow")
            .select("day", "n", F.col("dow").cast("long").alias("dow"),
                    F.round(z, 4).alias("z"),
                    F.when(F.abs(z) > ANOM_Z, 1).otherwise(0)
                    .alias("is_anomaly"),
                    F.when(full, F.round(shift, 4)).alias("level_shift"),
                    F.when(full & (F.abs(shift) > SHIFT_MIN), 1).otherwise(0)
                    .alias("is_shift")))


@register(
    "winsorized_brand_price",
    """
    WITH j AS (
        SELECT p.p_brand AS brand, l.l_extendedprice AS price
        FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    ),
    band AS (
        SELECT brand,
               quantile_cont(price, 0.05) AS lo,
               quantile_cont(price, 0.95) AS hi
        FROM j GROUP BY brand
    )
    SELECT j.brand,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(MIN(b.lo), 4) AS p_lo,
           ROUND(MIN(b.hi), 4) AS p_hi,
           CAST(SUM(CASE WHEN j.price < b.lo OR j.price > b.hi
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_clipped,
           ROUND(AVG(j.price), 4) AS mean_raw,
           ROUND(AVG(LEAST(GREATEST(j.price, b.lo), b.hi)), 4)
               AS mean_winsorized
    FROM j JOIN band b ON j.brand = b.brand
    GROUP BY j.brand
    """,
    doc="X52 per-brand winsorization of extended price: clip to the "
        "[p5, p95] band and report moments before/after — the standard "
        "heavy-tail feature-preprocessing transform. Brand-keyed "
        "percentile frame (bounded group count) broadcasts back onto "
        "the fact scan; operators/robust.py's exact/approx switch "
        "bounds the boundary-aggregate memory for million-row groups. "
        "Spark's exact percentile interpolates identically to DuckDB "
        "quantile_cont (bit-parity pinned by robust_value_outliers).",
    tags=("X52", "X7", "X3", "X11"),
)
def winsorized_brand_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.robust import winsorized_stats

    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    j = (li.join(p, li["l_partkey"] == p["p_partkey"])
         .select(F.col("p_brand").alias("brand"),
                 F.col("l_extendedprice").alias("price")))
    return winsorized_stats(j, "brand", "price")


QN_BUCKET = 10.0


@register(
    "quantile_normalized_values",
    f"""
    WITH vb AS (
        SELECT event_type, CAST(FLOOR(value / {QN_BUCKET}) AS BIGINT) AS b,
               CAST(COUNT(*) AS BIGINT) AS cnt
        FROM events GROUP BY 1, 2
    ),
    t AS (
        SELECT event_type, b, cnt,
               COALESCE(SUM(cnt) OVER (PARTITION BY event_type ORDER BY b
                            ROWS BETWEEN UNBOUNDED PRECEDING
                                     AND 1 PRECEDING), 0) AS cum_before,
               SUM(cnt) OVER (PARTITION BY event_type) AS n_t
        FROM vb
    ),
    g AS (
        SELECT b, CAST(SUM(cnt) AS BIGINT) AS gcnt FROM vb GROUP BY b
    ),
    gc AS (
        SELECT b AS gb, gcnt,
               COALESCE(SUM(gcnt) OVER (ORDER BY b
                            ROWS BETWEEN UNBOUNDED PRECEDING
                                     AND 1 PRECEDING), 0) AS gcum,
               SUM(gcnt) OVER () AS gn
        FROM g
    )
    SELECT t.event_type, t.b AS bucket, t.cnt AS n,
           ROUND((2 * t.cum_before + t.cnt)::DOUBLE / (2 * t.n_t), 6)
               AS p_mid,
           (gc.gb::DOUBLE + 0.5) * {QN_BUCKET} AS norm_value
    FROM t JOIN gc
      ON (2 * t.cum_before + t.cnt)::DOUBLE / (2 * t.n_t)
         >= gc.gcum::DOUBLE / gc.gn
     AND (2 * t.cum_before + t.cnt)::DOUBLE / (2 * t.n_t)
         < (gc.gcum + gc.gcnt)::DOUBLE / gc.gn
    """,
    doc="X53 quantile normalization at bucket granularity: per-type "
        "value-bucket mid percentiles remapped onto the pooled "
        "distribution — the standard cross-source feature equalizer, "
        "decomposed so every corpus-sized pass is ONE (type, bucket) "
        "aggregate and everything after runs on bucket tables bounded "
        "by the value domain (<= ~50 rows here). The percentile-range "
        "lookup is a theta join between two bounded tables (broadcast "
        "nested loop by construction); comparisons use IEEE divisions "
        "of exact integers — identical doubles on both engines.",
    tags=("X53", "X7", "X11", "X5"),
)
def quantile_normalized_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    vb = (e.groupBy("event_type",
                    F.floor(F.col("value") / QN_BUCKET).cast("long")
                    .alias("b"))
          .agg(F.count("*").cast("long").alias("cnt")))
    wt = Window.partitionBy("event_type").orderBy("b")
    t = (vb.withColumn("cum_before",
                       F.coalesce(F.sum("cnt").over(
                           wt.rowsBetween(Window.unboundedPreceding, -1)),
                           F.lit(0)))
         .withColumn("n_t", F.sum("cnt").over(
             Window.partitionBy("event_type"))))
    g = vb.groupBy("b").agg(F.sum("cnt").cast("long").alias("gcnt"))
    gc = (g.select(F.col("b").alias("gb"), "gcnt")
          .withColumn("gcum", F.coalesce(F.sum("gcnt").over(
              Window.orderBy("gb")
              .rowsBetween(Window.unboundedPreceding, -1)), F.lit(0)))
          .withColumn("gn", F.sum("gcnt").over(
              Window.orderBy("gb").rowsBetween(
                  Window.unboundedPreceding, Window.unboundedFollowing))))
    p = (2 * F.col("cum_before") + F.col("cnt")).cast("double") \
        / (2 * F.col("n_t"))
    glo = F.col("gcum").cast("double") / F.col("gn")
    ghi = (F.col("gcum") + F.col("gcnt")).cast("double") / F.col("gn")
    return (t.join(F.broadcast(gc), (p >= glo) & (p < ghi))
            .select("event_type", F.col("b").alias("bucket"),
                    F.col("cnt").alias("n"),
                    F.round(p, 6).alias("p_mid"),
                    ((F.col("gb") + 0.5) * QN_BUCKET).alias("norm_value")))


AB_SPLIT_TS = "2024-01-16 00:00:00"
AB_CONV_MIN = 7  # interior conversion rates at every SF (median y ~6-7)


@register(
    "ab_test_cuped",
    f"""
    WITH u AS (
        SELECT user_id,
               ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT
               % 2 AS variant,
               CAST(SUM(CASE WHEN ts < TIMESTAMP '{AB_SPLIT_TS}'
                             AND event_type = 'click'
                        THEN 1 ELSE 0 END) AS BIGINT) AS x,
               CAST(SUM(CASE WHEN ts >= TIMESTAMP '{AB_SPLIT_TS}'
                             AND event_type = 'purchase'
                        THEN 1 ELSE 0 END) AS BIGINT) AS y
        FROM events GROUP BY user_id
    ),
    s AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
               CAST(SUM(x * y) AS BIGINT) AS sxy,
               CAST(SUM(x * x) AS BIGINT) AS sxx,
               CAST(SUM(y * y) AS BIGINT) AS syy
        FROM u
    ),
    v AS (
        SELECT variant, CAST(COUNT(*) AS BIGINT) AS nv,
               CAST(SUM(x) AS BIGINT) AS sxv, CAST(SUM(y) AS BIGINT) AS syv,
               CAST(SUM(CASE WHEN y >= {AB_CONV_MIN} THEN 1 ELSE 0 END)
                    AS BIGINT) AS converted
        FROM u GROUP BY variant
    ),
    wide AS (
        SELECT s.*,
               MAX(CASE WHEN variant = 0 THEN nv END) AS n_c,
               MAX(CASE WHEN variant = 0 THEN sxv END) AS sx_c,
               MAX(CASE WHEN variant = 0 THEN syv END) AS sy_c,
               MAX(CASE WHEN variant = 0 THEN converted END) AS conv_c,
               MAX(CASE WHEN variant = 1 THEN nv END) AS n_t,
               MAX(CASE WHEN variant = 1 THEN sxv END) AS sx_t,
               MAX(CASE WHEN variant = 1 THEN syv END) AS sy_t,
               MAX(CASE WHEN variant = 1 THEN converted END) AS conv_t
        FROM v CROSS JOIN s
        GROUP BY s.n, s.sx, s.sy, s.sxy, s.sxx, s.syy
    )
    SELECT n_c, n_t,
           ROUND(sy_t::DOUBLE / n_t - sy_c::DOUBLE / n_c, 6) AS lift,
           ROUND((sy_t::DOUBLE / n_t
                  - ((n * sxy - sx * sy)::DOUBLE / (n * sxx - sx * sx))
                    * (sx_t::DOUBLE / n_t - sx::DOUBLE / n))
                 - (sy_c::DOUBLE / n_c
                    - ((n * sxy - sx * sy)::DOUBLE / (n * sxx - sx * sx))
                      * (sx_c::DOUBLE / n_c - sx::DOUBLE / n)), 6)
               AS lift_cuped,
           ROUND(((n * sxy - sx * sy)::DOUBLE * (n * sxy - sx * sy))
                 / ((n * sxx - sx * sx)::DOUBLE * (n * syy - sy * sy)), 6)
               AS var_reduction,
           ROUND((conv_t::DOUBLE / n_t - conv_c::DOUBLE / n_c)
                 / NULLIF(sqrt(((conv_c + conv_t)::DOUBLE / (n_c + n_t))
                        * (1 - (conv_c + conv_t)::DOUBLE / (n_c + n_t))
                        * (1.0 / n_c + 1.0 / n_t)), 0), 4) AS z_conversion
    FROM wide
    """,
    doc="X56 experimentation analytics: md5-bucketed A/B assignment, "
        "post-period purchase lift, CUPED variance-reduced lift "
        "(theta = cov/var from the pre-period click covariate), the "
        "rho-squared variance-reduction factor, and a two-proportion "
        "z-test on conversion. EVERY statistic derives from exact "
        "BIGINT sums (one user-keyed aggregate, then scalar math), so "
        "no float-summation dust exists anywhere — the hash check pins "
        "the full analysis. Var(Y - theta*X) expands analytically to "
        "var(Y)(1 - rho^2): no second pass over adjusted rows.",
    tags=("X56", "X7", "X14"),
)
def ab_test_cuped(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    split = F.lit(AB_SPLIT_TS).cast("timestamp_ntz")
    u = (e.groupBy("user_id")
         .agg(F.sum(F.when((F.col("ts") < split)
                           & (F.col("event_type") == "click"), 1)
                    .otherwise(0)).cast("long").alias("x"),
              F.sum(F.when((F.col("ts") >= split)
                           & (F.col("event_type") == "purchase"), 1)
                    .otherwise(0)).cast("long").alias("y"))
         .withColumn("variant",
                     F.conv(F.substring(F.md5(F.col("user_id")
                                              .cast("string")), 1, 15),
                            16, 10).cast("long") % 2))
    # one pass: per-variant moment sums; the pooled sums are exact
    # BIGINT additions of the two variant rows, so events scans ONCE
    v = (u.groupBy("variant")
         .agg(F.count("*").cast("long").alias("nv"),
              F.sum("x").cast("long").alias("sxv"),
              F.sum("y").cast("long").alias("syv"),
              F.sum(F.col("x") * F.col("y")).cast("long").alias("sxyv"),
              F.sum(F.col("x") * F.col("x")).cast("long").alias("sxxv"),
              F.sum(F.col("y") * F.col("y")).cast("long").alias("syyv"),
              F.sum(F.when(F.col("y") >= AB_CONV_MIN, 1).otherwise(0))
              .cast("long").alias("converted")))
    pick = lambda var, col: F.max(F.when(F.col("variant") == var,
                                         F.col(col)))
    wide = (v.groupBy()
            .agg(F.sum("nv").cast("long").alias("n"),
                 F.sum("sxv").cast("long").alias("sx"),
                 F.sum("syv").cast("long").alias("sy"),
                 F.sum("sxyv").cast("long").alias("sxy"),
                 F.sum("sxxv").cast("long").alias("sxx"),
                 F.sum("syyv").cast("long").alias("syy"),
                 pick(0, "nv").alias("n_c"), pick(0, "sxv").alias("sx_c"),
                 pick(0, "syv").alias("sy_c"),
                 pick(0, "converted").alias("conv_c"),
                 pick(1, "nv").alias("n_t"), pick(1, "sxv").alias("sx_t"),
                 pick(1, "syv").alias("sy_t"),
                 pick(1, "converted").alias("conv_t")))
    d = lambda c: F.col(c).cast("double")
    theta = ((d("n") * d("sxy") - d("sx") * d("sy"))
             / (d("n") * d("sxx") - d("sx") * d("sx")))
    mean = lambda sc, nc: d(sc) / d(nc)
    p_pool = (d("conv_c") + d("conv_t")) / (d("n_c") + d("n_t"))
    return wide.select(
        "n_c", "n_t",
        F.round(mean("sy_t", "n_t") - mean("sy_c", "n_c"), 6).alias("lift"),
        F.round((mean("sy_t", "n_t")
                 - theta * (mean("sx_t", "n_t") - mean("sx", "n")))
                - (mean("sy_c", "n_c")
                   - theta * (mean("sx_c", "n_c") - mean("sx", "n"))), 6)
        .alias("lift_cuped"),
        F.round((d("n") * d("sxy") - d("sx") * d("sy"))
                * (d("n") * d("sxy") - d("sx") * d("sy"))
                / ((d("n") * d("sxx") - d("sx") * d("sx"))
                   * (d("n") * d("syy") - d("sy") * d("sy"))), 6)
        .alias("var_reduction"),
        F.round((mean("conv_t", "n_t") - mean("conv_c", "n_c"))
                / F.nullif(F.sqrt(p_pool * (1 - p_pool)
                                  * (1.0 / d("n_c") + 1.0 / d("n_t"))),
                           F.lit(0.0)), 4)
        .alias("z_conversion"))


@register(
    "markov_prediction_accuracy",
    """
    WITH seq AS (
        SELECT user_id, event_type,
               lead(event_type) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS nxt
        FROM events
    ),
    pairs AS (SELECT event_type AS a, nxt AS b FROM seq
              WHERE nxt IS NOT NULL),
    counts AS (SELECT a, b, CAST(COUNT(*) AS BIGINT) AS n
               FROM pairs GROUP BY a, b),
    pred AS (
        SELECT a, FIRST(b ORDER BY n DESC, b) AS predicted,
               FIRST(n ORDER BY n DESC, b) AS n_hit,
               CAST(SUM(n) AS BIGINT) AS n_total
        FROM counts GROUP BY a
    )
    SELECT a AS from_type, predicted AS predicted_next,
           n_total AS n_transitions,
           ROUND(n_hit::DOUBLE / n_total, 6) AS hit_rate
    FROM pred
    """,
    doc="X57 next-event-prediction evaluation: the argmax-next-type "
        "Markov predictor per current type (ties lexicographic) and "
        "its in-sample top-1 hit rate. One user-keyed lead window, one "
        "(type,type) aggregate, one type-keyed argmax fold — the model "
        "AND its eval in a single plan, everything past the window on "
        "type-cardinality tables. Exact count-ratio accuracy.",
    tags=("X57", "X11", "X10", "X7"),
)
def markov_prediction_accuracy(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _ev(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (ev.withColumn("nxt", F.lead("event_type").over(w))
             .filter(F.col("nxt").isNotNull())
             .select(F.col("event_type").alias("a"),
                     F.col("nxt").alias("b")))
    counts = pairs.groupBy("a", "b").agg(F.count("*").cast("long").alias("n"))
    wp = Window.partitionBy("a").orderBy(F.desc("n"), F.asc("b"))
    pred = (counts
            .withColumn("rk", F.row_number().over(wp))
            .withColumn("n_total", F.sum("n").over(Window.partitionBy("a")))
            .filter(F.col("rk") == 1))
    return pred.select(
        F.col("a").alias("from_type"),
        F.col("b").alias("predicted_next"),
        F.col("n_total").cast("long").alias("n_transitions"),
        F.round(F.col("n").cast("double") / F.col("n_total"), 6)
        .alias("hit_rate"))


# --------------------------------------------------------------------------
# X71: multi-touch marketing attribution. Each purchase splits its value
# equally across the user's clicks in the preceding 7 days (linear
# attribution). The join is equi on user_id with a time-band residual —
# per-user fan-out is bounded by clicks x purchases per user, never a
# cross product; AQE handles hot users. Timestamps compare as exact
# epoch-microsecond BIGINTs (unix_micros == epoch_us cross-engine).
# --------------------------------------------------------------------------
ATTR_WINDOW_US = 7 * 86_400 * 1_000_000


@register(
    "attribution_multitouch",
    f"""
    WITH p AS (
        SELECT event_id AS purchase_id, user_id, value,
               epoch_us(ts) AS p_us
        FROM events WHERE event_type = 'purchase'
    ),
    c AS (
        SELECT user_id, epoch_us(ts) AS c_us
        FROM events WHERE event_type = 'click'
    )
    SELECT purchase_id, p.user_id AS user_id,
           CAST(COUNT(c_us) AS BIGINT) AS n_touches,
           CASE WHEN COUNT(c_us) > 0
                THEN ROUND(ANY_VALUE(value) / COUNT(c_us), 4) END
               AS credit_per_touch,
           CAST((ANY_VALUE(p_us) - MIN(c_us)) // 1000000 AS BIGINT)
               AS first_lag_s,
           CAST((ANY_VALUE(p_us) - MAX(c_us)) // 1000000 AS BIGINT)
               AS last_lag_s
    FROM p LEFT JOIN c
      ON p.user_id = c.user_id
     AND c.c_us >= p.p_us - {ATTR_WINDOW_US} AND c.c_us < p.p_us
    GROUP BY purchase_id, p.user_id
    """,
    doc="X71 linear multi-touch attribution: every purchase splits its "
        "value across the user's clicks in the prior 7 days; purchases "
        "with no touches surface with n_touches = 0 (the LEFT join). "
        "Equi-join on user_id + residual time band — bounded per-user "
        "fan-out, no window over the full event stream; lags compared "
        "and reported as exact epoch-microsecond integers.",
    tags=("X71", "X5", "X7", "X3"),
)
def attribution_multitouch(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _ev(spark, sf_dir)
    # unix_micros takes TIMESTAMP, not NTZ; only DIFFERENCES of these
    # micros are compared/reported, so a non-UTC driver session's cast
    # offset cancels (events span one month — one constant offset).
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    p = (ev.filter(F.col("event_type") == "purchase")
         .select(F.col("event_id").alias("purchase_id"), "user_id", "value",
                 us.alias("p_us")))
    c = (ev.filter(F.col("event_type") == "click")
         .select(F.col("user_id").alias("c_user"), us.alias("c_us")))
    j = p.join(
        c, (p.user_id == c.c_user)
        & (c.c_us >= p.p_us - ATTR_WINDOW_US) & (c.c_us < p.p_us), "left")
    agg = (j.groupBy("purchase_id", "user_id")
           .agg(F.count("c_us").cast("long").alias("n_touches"),
                F.any_value("value").alias("val"),
                F.any_value("p_us").alias("p_us"),
                F.min("c_us").alias("min_cus"),
                F.max("c_us").alias("max_cus")))
    return agg.select(
        "purchase_id", "user_id", "n_touches",
        F.when(F.col("n_touches") > 0,
               F.round(F.col("val") / F.col("n_touches"), 4))
        .alias("credit_per_touch"),
        F.expr("(p_us - min_cus) div 1000000").cast("long")
        .alias("first_lag_s"),
        F.expr("(p_us - max_cus) div 1000000").cast("long")
        .alias("last_lag_s"))


# --------------------------------------------------------------------------
# X73: chi-square test of independence between event type and day of
# week. The corpus-sized pass is ONE (type, dow) aggregate; marginals
# and the statistic derive FROM the contingency table (|types| x 7
# rows), so every post-aggregate step is broadcast-sized at any event
# volume. Expected counts are double products of exact BIGINTs — the
# same IEEE operations on both engines.
# --------------------------------------------------------------------------
@register(
    "chi2_event_dow",
    """
    WITH cells AS (
        SELECT event_type,
               (CAST(date_trunc('day', ts) AS DATE) - DATE '1970-01-01') % 7
                   AS dow,
               CAST(COUNT(*) AS BIGINT) AS observed
        FROM events GROUP BY 1, 2
    ),
    rt AS (SELECT event_type, CAST(SUM(observed) AS BIGINT) AS row_tot
           FROM cells GROUP BY 1),
    ct AS (SELECT dow, CAST(SUM(observed) AS BIGINT) AS col_tot
           FROM cells GROUP BY 1),
    tot AS (SELECT CAST(SUM(observed) AS BIGINT) AS t FROM cells)
    SELECT c.event_type, CAST(c.dow AS BIGINT) AS dow, c.observed,
           ROUND(CAST(row_tot AS DOUBLE) * col_tot / t, 4) AS expected,
           ROUND((c.observed - CAST(row_tot AS DOUBLE) * col_tot / t)
                 * (c.observed - CAST(row_tot AS DOUBLE) * col_tot / t)
                 / (CAST(row_tot AS DOUBLE) * col_tot / t), 6) AS contrib
    FROM cells c JOIN rt USING (event_type) JOIN ct USING (dow)
    CROSS JOIN tot
    """,
    doc="X73 chi-square independence cells for event_type x day-of-week: "
        "one corpus aggregate builds the contingency table; marginals, "
        "expected counts and per-cell contributions all fold from it "
        "(type-cardinality tables, broadcast joins). Day-of-week via "
        "epoch-day modulus — engine builtins disagree on numbering. "
        "The per-cell contribs sum to the chi-square statistic a "
        "drift/seasonality monitor thresholds.",
    tags=("X73", "X7", "X11"),
)
def chi2_event_dow(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _ev(spark, sf_dir)
    cells = (ev.groupBy(
        "event_type",
        (F.datediff(F.date_trunc("day", "ts").cast("date"),
                    F.lit("1970-01-01").cast("date")) % 7).alias("dow"))
        .agg(F.count("*").cast("long").alias("observed")))
    from ..caching import persist_tracked
    cells = persist_tracked(cells)
    rt = cells.groupBy("event_type").agg(F.sum("observed").cast("long")
                                         .alias("row_tot"))
    ct = cells.groupBy("dow").agg(F.sum("observed").cast("long")
                                  .alias("col_tot"))
    tot = cells.agg(F.sum("observed").cast("long").alias("t"))
    e = F.col("row_tot").cast("double") * F.col("col_tot") / F.col("t")
    return (cells.join(F.broadcast(rt), "event_type")
            .join(F.broadcast(ct), "dow")
            .crossJoin(F.broadcast(tot))
            .select("event_type", F.col("dow").cast("long").alias("dow"),
                    "observed",
                    F.round(e, 4).alias("expected"),
                    F.round((F.col("observed") - e) * (F.col("observed") - e)
                            / e, 6).alias("contrib")))


# --------------------------------------------------------------------------
# X79: population stability index (PSI) — the standard ML-monitoring
# drift score — between the first and second half of the month. One
# (half, bin) aggregate is the only corpus pass; probabilities are
# add-0.5-smoothed so empty bins stay defined; everything downstream
# runs on the bin-cardinality table.
# --------------------------------------------------------------------------
PSI_BIN_W = 25.0


@register(
    "psi_value_drift",
    f"""
    WITH binned AS (
        SELECT CASE WHEN date_part('day', ts) <= 15 THEN 'expected'
                    ELSE 'actual' END AS half,
               CAST(FLOOR(value / {PSI_BIN_W}) AS BIGINT) AS bin
        FROM events
    ),
    cells AS (SELECT bin,
                     CAST(SUM(CASE WHEN half = 'expected' THEN 1 ELSE 0 END)
                          AS BIGINT) AS ce,
                     CAST(SUM(CASE WHEN half = 'actual' THEN 1 ELSE 0 END)
                          AS BIGINT) AS ca
              FROM binned GROUP BY bin),
    tot AS (SELECT CAST(SUM(ce) AS BIGINT) AS ne,
                   CAST(SUM(ca) AS BIGINT) AS na,
                   CAST(COUNT(*) AS BIGINT) AS b
            FROM cells)
    SELECT bin, ce AS n_expected, ca AS n_actual,
           ROUND(((ca + 0.5::DOUBLE) / (na + 0.5::DOUBLE * b)
                  - (ce + 0.5::DOUBLE) / (ne + 0.5::DOUBLE * b))
                 * ln(((ca + 0.5::DOUBLE) / (na + 0.5::DOUBLE * b))
                      / ((ce + 0.5::DOUBLE) / (ne + 0.5::DOUBLE * b))), 6)
               AS psi_contrib
    FROM cells CROSS JOIN tot
    """,
    doc="X79 population stability index between the month's first and "
        "second half of event values: one (half, bin) aggregate, "
        "add-0.5 smoothing so empty bins stay defined, per-bin "
        "(pa-pe)*ln(pa/pe) contributions on the bin-cardinality table. "
        "PSI > 0.2 is the classic retrain trigger; the contributions "
        "localize WHICH value range drifted.",
    tags=("X79", "X7", "X2"),
)
def psi_value_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _ev(spark, sf_dir)
    half = (F.when(F.dayofmonth("ts") <= 15, "expected")
            .otherwise("actual"))
    cells = (ev.select(half.alias("half"),
                       F.floor(F.col("value") / PSI_BIN_W).cast("long")
                       .alias("bin"))
             .groupBy("bin")
             .agg(F.sum(F.when(F.col("half") == "expected", 1).otherwise(0))
                  .cast("long").alias("ce"),
                  F.sum(F.when(F.col("half") == "actual", 1).otherwise(0))
                  .cast("long").alias("ca")))
    from ..caching import persist_tracked
    cells = persist_tracked(cells)
    tot = cells.agg(F.sum("ce").cast("long").alias("ne"),
                    F.sum("ca").cast("long").alias("na"),
                    F.count("*").cast("long").alias("b"))
    pe = (F.col("ce") + 0.5) / (F.col("ne") + 0.5 * F.col("b"))
    pa = (F.col("ca") + 0.5) / (F.col("na") + 0.5 * F.col("b"))
    return (cells.crossJoin(F.broadcast(tot))
            .select("bin", F.col("ce").alias("n_expected"),
                    F.col("ca").alias("n_actual"),
                    F.round((pa - pe) * F.log(pa / pe), 6)
                    .alias("psi_contrib")))


# --------------------------------------------------------------------------
# X82: classical seasonal decomposition (trend / seasonal / residual)
# of the daily event series. The corpus-sized pass is the one day-keyed
# aggregate; every window after it runs on the calendar-bounded daily
# table, so the centered moving average's global ORDER BY day frame is
# safe at any event volume (same argument as event_anomaly_days).
# --------------------------------------------------------------------------
@register(
    "stl_decompose_daily",
    """
    WITH daily AS (
        SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM events GROUP BY 1
    ),
    tr AS (
        SELECT day, n, (day - DATE '1970-01-01') % 7 AS dow,
               CASE WHEN COUNT(*) OVER w = 7
                    THEN AVG(CAST(n AS DOUBLE)) OVER w END AS trend
        FROM daily
        WINDOW w AS (ORDER BY day ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
    ),
    seas AS (
        SELECT dow, AVG(n - trend) AS s
        FROM tr WHERE trend IS NOT NULL GROUP BY dow
    )
    SELECT t.day, t.n, CAST(t.dow AS BIGINT) AS dow,
           ROUND(t.trend, 4) AS trend,
           ROUND(s.s, 4) AS seasonal,
           ROUND(t.n - t.trend - s.s, 4) AS residual
    FROM tr t JOIN seas s USING (dow)
    """,
    doc="X82 seasonal-trend decomposition of the daily event series: "
        "centered 7-day moving-average trend (NULL at the edges where "
        "the window is partial), day-of-week seasonal means of the "
        "detrended series, residual = n - trend - seasonal. One corpus "
        "aggregate; all windows on the calendar-bounded daily table; "
        "dow via epoch-day modulus. The decomposition behind capacity "
        "planning and the anomaly detector's baseline.",
    tags=("X82", "X49", "X11", "X7"),
)
def stl_decompose_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _ev(spark, sf_dir)
    daily = (ev.groupBy(F.date_trunc("day", "ts").cast("date").alias("day"))
             .agg(F.count("*").cast("long").alias("n")))
    w = Window.orderBy("day").rowsBetween(-3, 3)
    tr = daily.select(
        "day", "n",
        (F.datediff("day", F.lit("1970-01-01").cast("date")) % 7)
        .alias("dow"),
        F.when(F.count("*").over(w) == 7,
               F.avg(F.col("n").cast("double")).over(w)).alias("trend"))
    from ..caching import persist_tracked
    tr = persist_tracked(tr)
    seas = (tr.filter(F.col("trend").isNotNull())
            .groupBy("dow").agg(F.avg(F.col("n") - F.col("trend"))
                                .alias("s")))
    return (tr.join(F.broadcast(seas), "dow")
            .select("day", "n", F.col("dow").cast("long").alias("dow"),
                    F.round("trend", 4).alias("trend"),
                    F.round("s", 4).alias("seasonal"),
                    F.round(F.col("n") - F.col("trend") - F.col("s"), 4)
                    .alias("residual")))


# --------------------------------------------------------------------------
# X83: Kaplan-Meier survival of time-to-first-purchase after signup.
# The corpus collapses to one duration row per user (two min-aggregates);
# the KM table then lives on distinct-duration cardinality. At-risk
# counts are a descending cumulative sum (no per-time re-scan); the
# survival product is exp of a running sum of ln-factors snapped to an
# integer NANO grid — order-deterministic (the window is ordered) and
# engine-exact. Users with no qualifying purchase would enter censored
# at the observation horizon (event = 0) through the same fold.
# --------------------------------------------------------------------------
@register(
    "km_survival_purchase",
    """
    WITH s AS (SELECT user_id, MIN(epoch_us(ts)) AS s_us
               FROM events WHERE event_type = 'signup' GROUP BY user_id),
    p AS (SELECT e.user_id, MIN(epoch_us(e.ts)) AS p_us
          FROM events e JOIN s ON e.user_id = s.user_id
                            AND epoch_us(e.ts) > s.s_us
          WHERE e.event_type = 'purchase' GROUP BY e.user_id),
    horizon AS (SELECT MAX(epoch_us(ts)) AS h_us FROM events),
    durs AS (
        SELECT s.user_id,
               CAST(CASE WHEN p.p_us IS NOT NULL
                         THEN (p.p_us - s.s_us) // 3600000000
                         ELSE (h.h_us - s.s_us) // 3600000000 END AS BIGINT)
                   AS t_hours,
               CASE WHEN p.p_us IS NOT NULL THEN 1 ELSE 0 END AS ev
        FROM s LEFT JOIN p ON s.user_id = p.user_id CROSS JOIN horizon h
    ),
    grouped AS (
        SELECT t_hours, CAST(SUM(ev) AS BIGINT) AS d,
               CAST(SUM(1 - ev) AS BIGINT) AS c,
               CAST(COUNT(*) AS BIGINT) AS total
        FROM durs GROUP BY t_hours
    ),
    risk AS (
        SELECT t_hours, d, c,
               CAST(SUM(total) OVER (ORDER BY t_hours DESC) AS BIGINT)
                   AS at_risk
        FROM grouped
    ),
    km AS (
        SELECT t_hours, d, c, at_risk,
               MIN(CASE WHEN d < at_risk THEN 1 ELSE 0 END)
                   OVER (ORDER BY t_hours) AS alive,
               SUM(CASE WHEN d < at_risk
                        THEN CAST(ROUND(ln(1 - d::DOUBLE / at_risk)
                                        * 1000000000) AS BIGINT)
                        ELSE 0 END)
                   OVER (ORDER BY t_hours) AS lnsum_nano
        FROM risk WHERE d > 0
    )
    SELECT t_hours, d, c, at_risk,
           CASE WHEN alive = 1
                THEN ROUND(EXP(lnsum_nano / 1000000000.0), 4)
                ELSE 0.0 END AS survival
    FROM km
    """,
    doc="X83 Kaplan-Meier estimator for time from signup to first "
        "purchase (hours): one duration row per user, at-risk counts "
        "as a descending cumulative sum, survival as exp of an ordered "
        "running sum of ln(1 - d/n) factors snapped to integer "
        "nano-units (deterministic across engines; a factor of zero "
        "pins survival to exactly 0 from then on). The time-to-convert "
        "curve growth/activation teams threshold.",
    tags=("X83", "X11", "X7", "X6"),
)
def km_survival_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _ev(spark, sf_dir)
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    s = (ev.filter(F.col("event_type") == "signup")
         .groupBy("user_id").agg(F.min(us).alias("s_us")))
    from ..caching import persist_tracked
    s = persist_tracked(s)
    p = (ev.filter(F.col("event_type") == "purchase")
         .select("user_id", us.alias("e_us"))
         .join(s, "user_id")
         .filter(F.col("e_us") > F.col("s_us"))
         .groupBy("user_id").agg(F.min("e_us").alias("p_us")))
    horizon = ev.agg(F.max(us).alias("h_us"))
    dur_us = F.when(F.col("p_us").isNotNull(),
                    F.col("p_us") - F.col("s_us")) \
              .otherwise(F.col("h_us") - F.col("s_us"))
    durs = (s.join(p, "user_id", "left").crossJoin(F.broadcast(horizon))
            .select(dur_us.alias("dur_us"),
                    F.when(F.col("p_us").isNotNull(), 1).otherwise(0)
                    .alias("ev"))
            # true integer division (Spark `div`), matching DuckDB `//`
            # — a double divide + cast can round UP across an integer
            # boundary when the remainder is within an ulp of the divisor
            .select(F.expr("dur_us div 3600000000").cast("long")
                    .alias("t_hours"), "ev"))
    grouped = (durs.groupBy("t_hours")
               .agg(F.sum("ev").cast("long").alias("d"),
                    F.sum(1 - F.col("ev")).cast("long").alias("c"),
                    F.count("*").cast("long").alias("total")))
    w_desc = Window.orderBy(F.desc("t_hours")) \
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    risk = grouped.select(
        "t_hours", "d", "c",
        F.sum("total").over(w_desc).cast("long").alias("at_risk"))
    km = risk.filter(F.col("d") > 0)
    w_asc = Window.orderBy("t_hours") \
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ln_nano = F.when(
        F.col("d") < F.col("at_risk"),
        F.round(F.log(1 - F.col("d").cast("double") / F.col("at_risk"))
                * 1e9, 0).cast("long")).otherwise(F.lit(0))
    alive = F.min(F.when(F.col("d") < F.col("at_risk"), 1).otherwise(0)) \
        .over(w_asc)
    km = (km.withColumn("alive", alive)
          .withColumn("lnsum_nano", F.sum(ln_nano).over(w_asc)))
    return km.select(
        "t_hours", "d", "c", "at_risk",
        F.when(F.col("alive") == 1,
               F.round(F.exp(F.col("lnsum_nano") / 1e9), 4))
        .otherwise(F.lit(0.0)).alias("survival"))


# --------------------------------------------------------------------------
# X85: CUSUM change-point detection on the daily event series. The
# textbook recurrence S+_t = max(0, S+_{t-1} + dev_t) looks inherently
# sequential, but it equals C_t - min_{j<=t} C_j for the plain prefix
# sum C of deviations — so the whole detector is two ORDERED windows
# (cumsum + running min) on the calendar-bounded daily table. Same
# trick for the downward side with max.
# --------------------------------------------------------------------------
CUSUM_K = 5.0     # slack per day (absorbs noise)
CUSUM_H = 50.0    # alarm threshold


@register(
    "cusum_changepoint",
    f"""
    WITH daily AS (
        SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM events GROUP BY 1
    ),
    mu AS (SELECT AVG(CAST(n AS DOUBLE)) AS m FROM daily),
    c AS (
        SELECT day, n,
               SUM(n - m - {CUSUM_K}) OVER (ORDER BY day) AS cp,
               SUM(n - m + {CUSUM_K}) OVER (ORDER BY day) AS cm
        FROM daily CROSS JOIN mu
    ),
    s AS (
        -- LEAST/GREATEST with 0: the virtual C_0 = 0 baseline before
        -- any data (S starts at 0 in the textbook recurrence)
        SELECT day, n,
               cp - LEAST(0, MIN(cp) OVER (ORDER BY day)) AS s_pos,
               GREATEST(0, MAX(cm) OVER (ORDER BY day)) - cm AS s_neg
        FROM c
    )
    SELECT day, n, ROUND(s_pos, 4) AS cusum_pos,
           ROUND(s_neg, 4) AS cusum_neg,
           CASE WHEN s_pos > {CUSUM_H} OR s_neg > {CUSUM_H}
                THEN 1 ELSE 0 END AS alarm
    FROM s
    """,
    doc=f"X85 CUSUM change-point detector (k={CUSUM_K}, h={CUSUM_H}) "
        "over daily event counts. The sequential max(0, S+dev) "
        "recurrence is re-expressed as prefix-sum minus running "
        "prefix-min (and the mirrored max for the downward side), so "
        "the detector is two ordered windows on the calendar-bounded "
        "daily table — no per-row loop, no UDF, deterministic "
        "cross-engine because both windows are fully ordered. The "
        "sequential-analysis alarm that catches sustained small shifts "
        "the per-day z-score misses.",
    tags=("X85", "X49", "X11"),
)
def cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _ev(spark, sf_dir)
    daily = (ev.groupBy(F.date_trunc("day", "ts").cast("date").alias("day"))
             .agg(F.count("*").cast("long").alias("n")))
    mu = daily.agg(F.avg(F.col("n").cast("double")).alias("m"))
    w = Window.orderBy("day") \
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    c = (daily.crossJoin(F.broadcast(mu))
         .select("day", "n",
                 F.sum(F.col("n") - F.col("m") - CUSUM_K).over(w)
                 .alias("cp"),
                 F.sum(F.col("n") - F.col("m") + CUSUM_K).over(w)
                 .alias("cm")))
    # least/greatest with 0 = the virtual C_0 = 0 starting state
    s_pos = F.col("cp") - F.least(F.lit(0.0), F.min("cp").over(w))
    s_neg = F.greatest(F.lit(0.0), F.max("cm").over(w)) - F.col("cm")
    s = c.select("day", "n", s_pos.alias("s_pos"), s_neg.alias("s_neg"))
    return s.select(
        "day", "n",
        F.round("s_pos", 4).alias("cusum_pos"),
        F.round("s_neg", 4).alias("cusum_neg"),
        F.when((F.col("s_pos") > CUSUM_H) | (F.col("s_neg") > CUSUM_H), 1)
        .otherwise(0).alias("alarm"))


# --------------------------------------------------------------------------
# X94: burstiness profile — are a user's events Poisson-spread or
# bursty? Inter-arrival gaps (exact integer seconds from ordered
# epoch-micro differences), then Fano factor (var/mean) and CV per
# user, every statistic folding from exact BIGINT gap sums. One lag
# window partitioned BY USER (bounded), one aggregate.
# --------------------------------------------------------------------------
MIN_GAPS = 5


@register(
    "user_burstiness",
    f"""
    WITH ev AS (
        SELECT user_id, epoch_us(ts) AS us FROM events
    ),
    gaps AS (
        SELECT user_id,
               (us - LAG(us) OVER (PARTITION BY user_id ORDER BY us))
               // 1000000 AS g
        FROM ev
    ),
    stats AS (
        SELECT user_id, CAST(COUNT(g) AS BIGINT) AS n,
               CAST(SUM(g) AS BIGINT) AS s,
               CAST(SUM(g * g) AS BIGINT) AS q
        FROM gaps WHERE g IS NOT NULL GROUP BY user_id
    )
    SELECT user_id, n AS n_gaps,
           ROUND(CAST(s AS DOUBLE) / n, 2) AS mean_gap_s,
           ROUND((CAST(q AS DOUBLE) - CAST(s AS DOUBLE) * s / n)
                 / (n - 1) / (CAST(s AS DOUBLE) / n), 4) AS fano,
           ROUND(SQRT((CAST(q AS DOUBLE) - CAST(s AS DOUBLE) * s / n)
                      / (n - 1)) / (CAST(s AS DOUBLE) / n), 4) AS cv
    FROM stats WHERE n >= {MIN_GAPS}
    """,
    doc=f"X94 burstiness per user (>= {MIN_GAPS} gaps): inter-arrival "
        "gaps as exact integer seconds (ordered epoch-micro "
        "differences, so any session-tz offset cancels), then Fano "
        "factor (variance/mean — 1 for a Poisson process, >> 1 for "
        "bursts) and coefficient of variation, all folded from exact "
        "BIGINT gap sums with floats only in the final divisions. The "
        "temporal feature separating scripted/bot traffic from humans.",
    tags=("X94", "X11", "X7"),
)
def user_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _ev(spark, sf_dir)
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    w = Window.partitionBy("user_id").orderBy("us")
    gaps = (ev.select("user_id", us.alias("us"))
            .withColumn("prev", F.lag("us").over(w))
            .filter(F.col("prev").isNotNull())
            .select("user_id",
                    F.expr("(us - prev) div 1000000").alias("g")))
    stats = (gaps.groupBy("user_id")
             .agg(F.count("g").cast("long").alias("n"),
                  F.sum("g").cast("long").alias("s"),
                  F.sum(F.col("g") * F.col("g")).cast("long").alias("q")))
    n, sm, q = (F.col("n").cast("double"), F.col("s").cast("double"),
                F.col("q").cast("double"))
    var = (q - sm * F.col("s") / F.col("n")) / (F.col("n") - 1)
    mean = sm / F.col("n")
    return (stats.filter(F.col("n") >= MIN_GAPS)
            .select("user_id", F.col("n").alias("n_gaps"),
                    F.round(mean, 2).alias("mean_gap_s"),
                    F.round(var / mean, 4).alias("fano"),
                    F.round(F.sqrt(var) / mean, 4).alias("cv")))


# --------------------------------------------------------------------------
# X104: grid-bucketed epsilon join — all event pairs close in BOTH
# time and value (|dt| <= eps_t, |dv| <= eps_v), the 2-D similarity
# join behind correlated-event mining and sensor-coincidence detection.
# Never the quadratic theta self-join: each event lands in one
# (time, value) grid cell sized exactly (eps_t, eps_v); one side
# explodes to its 3x3 neighbor cells, the equi-join on cell keys is
# hash-partitioned, and the exact predicate verifies inside buckets.
# Time buckets are RELATIVE to the corpus min timestamp, so the
# session-timezone offset in raw epoch micros cancels cross-engine.
# --------------------------------------------------------------------------
EPS_T_US = 600 * 1_000_000  # 10 minutes, in microseconds
EPS_V = 2.0


@register(
    "event_epsilon_pairs",
    f"""
    WITH base AS (
        SELECT event_id, epoch_us(ts) AS us, value FROM events
    ),
    m AS (SELECT MIN(us) AS mn FROM base),
    cells AS (
        SELECT event_id, us - m.mn AS rel, value,
               (us - m.mn) // {EPS_T_US} AS ct,
               CAST(FLOOR(value / {EPS_V}) AS BIGINT) AS cv
        FROM base CROSS JOIN m
    ),
    probe AS (
        SELECT event_id, rel, value,
               ct + dt.o AS ct, cv + dv.o AS cv
        FROM cells,
             (SELECT unnest([-1, 0, 1]) AS o) dt,
             (SELECT unnest([-1, 0, 1]) AS o) dv
    )
    SELECT DISTINCT a.event_id AS id_a, b.event_id AS id_b,
           CAST(abs(a.rel - b.rel) AS BIGINT) AS dt_us,
           ROUND(abs(a.value - b.value), 4) AS dv
    FROM probe a JOIN cells b ON a.ct = b.ct AND a.cv = b.cv
    WHERE a.event_id < b.event_id
      AND abs(a.rel - b.rel) <= {EPS_T_US}
      AND abs(a.value - b.value) <= {EPS_V}
    """,
    doc=f"X104 grid epsilon join: event pairs within "
        f"{EPS_T_US // 1_000_000}s AND {EPS_V} value units of each "
        "other. Grid cells are one (eps_t, eps_v) rectangle each; a "
        "3x3 neighbor-cell explode on the probe side guarantees every "
        "qualifying pair shares a join key (pigeonhole: max one cell "
        "boundary per axis within one epsilon), the cell equi-join "
        "shuffles hash-partitioned, and the exact predicate + "
        "DISTINCT dedups multi-cell matches. Work scales with "
        "occupied-cell density, never corpus^2.",
    tags=("X104", "X5", "X3"),
)
def event_epsilon_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..caching import persist_tracked

    # unix_micros takes TIMESTAMP, not NTZ; the session-tz offset the
    # cast injects cancels in rel = us - min(us) below.
    ev = _ev(spark, sf_dir).select(
        "event_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"), "value")
    mn = ev.agg(F.min("us").alias("mn"))
    cells = persist_tracked(
        ev.crossJoin(F.broadcast(mn))
        .select("event_id", (F.col("us") - F.col("mn")).alias("rel"),
                "value",
                F.expr(f"(us - mn) DIV {EPS_T_US}").alias("ct"),
                F.floor(F.col("value") / EPS_V).cast("long").alias("cv")))
    # neighbor offsets via explode of a literal array (a map-side
    # expression, not a join — keeps the plan free of nested-loop nodes)
    off = F.explode(F.array(*[F.lit(o) for o in (-1, 0, 1)]))
    probe = (cells
             .select("event_id", "rel", "value", "ct", "cv",
                     off.alias("dt"))
             .select("event_id", "rel", "value",
                     (F.col("ct") + F.col("dt")).alias("ct"), "cv",
                     off.alias("dv"))
             .select("event_id", "rel", "value", "ct",
                     (F.col("cv") + F.col("dv")).alias("cv")))
    a = probe.select(F.col("event_id").alias("id_a"),
                     F.col("rel").alias("rel_a"),
                     F.col("value").alias("val_a"), "ct", "cv")
    b = cells.select(F.col("event_id").alias("id_b"),
                     F.col("rel").alias("rel_b"),
                     F.col("value").alias("val_b"), "ct", "cv")
    return (a.join(b, ["ct", "cv"])
            .filter((F.col("id_a") < F.col("id_b"))
                    & (F.abs(F.col("rel_a") - F.col("rel_b")) <= EPS_T_US)
                    & (F.abs(F.col("val_a") - F.col("val_b")) <= EPS_V))
            .select("id_a", "id_b",
                    F.abs(F.col("rel_a") - F.col("rel_b")).cast("long")
                    .alias("dt_us"),
                    F.round(F.abs(F.col("val_a") - F.col("val_b")), 4)
                    .alias("dv"))
            .distinct())


# --------------------------------------------------------------------------
# X113: process-conformance checking — event traces audited against
# the expected funnel model signup -> view -> click -> purchase
# (process mining's conformance step, on top of X57's raw transition
# matrix): each adjacent transition in a user's trace is classified
# advance / repeat / REWORK (backward move); purchases with no prior
# click in the trace are SKIP violations. One user-partitioned ordered
# window pass + one running-max window — no self-joins, trace order
# pinned by (ts, event_id).
# --------------------------------------------------------------------------
_STAGE_CASE = ("CASE event_type WHEN 'signup' THEN 1 WHEN 'view' THEN 2 "
               "WHEN 'click' THEN 3 WHEN 'purchase' THEN 4 "
               "ELSE 0 END")


@register(
    "process_conformance",
    f"""
    WITH tr AS (
        SELECT user_id, ts, event_id, {_STAGE_CASE} AS stage
        FROM events WHERE {_STAGE_CASE} > 0
    ),
    seq AS (
        SELECT user_id, stage,
               LAG(stage) OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS prev_stage,
               MAX(CASE WHEN stage = 3 THEN 1 ELSE 0 END)
                   OVER (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING
                         AND 1 PRECEDING) AS saw_click
        FROM tr
    ),
    labelled AS (
        SELECT user_id,
               CASE WHEN prev_stage IS NULL THEN 'trace_start'
                    WHEN stage > prev_stage THEN 'advance'
                    WHEN stage = prev_stage THEN 'repeat'
                    ELSE 'rework' END AS transition_kind
        FROM seq
        UNION ALL
        SELECT user_id, 'skip_purchase_no_click'
        FROM seq
        WHERE stage = 4 AND COALESCE(saw_click, 0) = 0
    )
    SELECT transition_kind,
           CAST(COUNT(*) AS BIGINT) AS n_occurrences,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
    FROM labelled GROUP BY transition_kind
    """,
    doc="X113 conformance checking of user event traces against the "
        "signup->view->click->purchase funnel model: adjacent "
        "transitions classify as advance/repeat/rework (backward "
        "move), and purchases with no earlier click flag as skip "
        "violations. One ordered window pass per user (lag + running "
        "click flag), rollup by violation kind — the process-mining "
        "audit behind funnel-health dashboards.",
    tags=("X113", "X10", "X11", "X57"),
)
def process_conformance(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _ev(spark, sf_dir)
    stage = (F.when(F.col("event_type") == "signup", 1)
             .when(F.col("event_type") == "view", 2)
             .when(F.col("event_type") == "click", 3)
             .when(F.col("event_type") == "purchase", 4)
             .otherwise(0))
    tr = (ev.select("user_id", "ts", "event_id", stage.alias("stage"))
          .filter(F.col("stage") > 0))
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wprev = w.rowsBetween(Window.unboundedPreceding, -1)
    seq = tr.select(
        "user_id", "stage",
        F.lag("stage").over(w).alias("prev_stage"),
        F.max(F.when(F.col("stage") == 3, 1).otherwise(0)).over(wprev)
        .alias("saw_click"))
    kind = (F.when(F.col("prev_stage").isNull(), "trace_start")
            .when(F.col("stage") > F.col("prev_stage"), "advance")
            .when(F.col("stage") == F.col("prev_stage"), "repeat")
            .otherwise("rework"))
    labelled = (seq.select("user_id", kind.alias("transition_kind"))
                .unionByName(
                    seq.filter((F.col("stage") == 4)
                               & (F.coalesce(F.col("saw_click"),
                                             F.lit(0)) == 0))
                    .select("user_id",
                            F.lit("skip_purchase_no_click")
                            .alias("transition_kind"))))
    return (labelled.groupBy("transition_kind")
            .agg(F.count("*").cast("long").alias("n_occurrences"),
                 F.countDistinct("user_id").cast("long").alias("n_users")))


# --------------------------------------------------------------------------
# X121: watermark lateness sweep — "which watermark delay should this
# stream use?" answered from history: replay events in arrival order
# (event_id — the ingest sequence), track the running max event time,
# and for each candidate delay count the events that would arrive
# LATER than (running_max - delay), i.e. the rows a streaming job
# would drop. One ordered window builds the running max; each sweep
# point is a filter (the X111 pattern); all arithmetic is exact
# epoch-microsecond BIGINT differences (tz offset cancels).
# --------------------------------------------------------------------------
WM_DELAYS_S = (60, 300, 900, 3600)


@register(
    "watermark_lateness_sweep",
    f"""
    WITH seq AS (
        SELECT event_id, epoch_us(ts) AS us,
               MAX(epoch_us(ts)) OVER (ORDER BY event_id
                                       ROWS BETWEEN UNBOUNDED PRECEDING
                                       AND 1 PRECEDING) AS wm_base
        FROM events
    ),
    pts(delay_s) AS (VALUES {", ".join(f"({d})" for d in WM_DELAYS_S)})
    SELECT CAST(pts.delay_s AS BIGINT) AS delay_s,
           CAST(COUNT(CASE WHEN seq.us < seq.wm_base
                                 - pts.delay_s * CAST(1000000 AS BIGINT) THEN 1 END)
                AS BIGINT) AS n_late,
           ROUND(COUNT(CASE WHEN seq.us < seq.wm_base
                                 - pts.delay_s * CAST(1000000 AS BIGINT) THEN 1 END)
                 ::DOUBLE / (SELECT COUNT(*) FROM events), 6)
               AS late_frac
    FROM pts CROSS JOIN seq
    GROUP BY pts.delay_s
    """,
    doc=f"X121 watermark tuning sweep: for candidate delays "
        f"{WM_DELAYS_S} seconds, how many historical events arrived "
        "later than (running max event time - delay) in ingest order — "
        "exactly the rows Structured Streaming's watermark would drop. "
        "One ordered running-max window; each sweep point is a filter; "
        "exact integer microsecond arithmetic (offsets cancel in the "
        "difference). The completeness/latency tradeoff sheet behind "
        "every withWatermark() choice (complements X22's live "
        "streaming drop path).",
    tags=("X121", "X22", "X11", "X7"),
)
def watermark_lateness_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..caching import persist_tracked

    ev = _ev(spark, sf_dir).select(
        "event_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"))
    w = Window.orderBy("event_id").rowsBetween(Window.unboundedPreceding,
                                               -1)
    # the ordered running max is one global-order window; at stream
    # scale this replay runs per ingest partition — here the history
    # table is the bounded input by definition
    seq = persist_tracked(ev.withColumn("wm_base", F.max("us").over(w)))
    total = seq.count()
    rows = None
    for d in WM_DELAYS_S:
        late = (seq.filter(F.col("us")
                           < F.col("wm_base") - d * 1_000_000)
                .agg(F.count("*").cast("long").alias("n_late")))
        row = late.select(F.lit(d).cast("long").alias("delay_s"),
                          "n_late",
                          F.round(F.col("n_late").cast("double") / total,
                                  6).alias("late_frac"))
        rows = row if rows is None else rows.unionByName(row)
    return rows


# --------------------------------------------------------------------------
# X124: exact Shapley-value channel attribution. The channel universe
# is 4 marketing touchpoints, so the 2^4 = 16 coalition values are
# computed EXACTLY (no Monte-Carlo sampling): one corpus-sized pass
# folds each (user, day) journey to a (touch-bitmask, converted) row
# (per-user-lifetime masks saturate to all-channels on this corpus,
# which would make every marginal zero), a 16x map-side
# fan-out scores every coalition, and the Shapley formula runs over
# the 16-row table with factorial weights as exact integers
# (denominator 4! = 24). Coalition value v(S) = the share of touched
# journeys (mask != 0) that converted AND are reachable using only
# channels in S — the standard "attributable conversions" value
# function, with v(empty) = 0 by construction (untouched journeys
# carry no attribution signal and are excluded). Values snap to the
# 1e-6 micro-grid (exact integer ratio -> identical double ->
# identical round), so the weighted Shapley sum is a BIGINT fold and
# the hash pins every credit value.
# --------------------------------------------------------------------------
SHAPLEY_CHANNELS = (("view", 1), ("click", 2), ("signup", 4), ("error", 8))


def _shapley_oracle_sql() -> str:
    bits = " ".join(
        f"WHEN '{name}' THEN {bit}" for name, bit in SHAPLEY_CHANNELS)
    chans = ", ".join(f"('{name}', {bit})" for name, bit in SHAPLEY_CHANNELS)
    return f"""
    WITH u0 AS (
        SELECT user_id, CAST(ts AS DATE) AS d,
               CAST(bit_or(CASE event_type {bits} ELSE 0 END) AS BIGINT)
                   AS mask,
               MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                   AS conv
        FROM events GROUP BY user_id, CAST(ts AS DATE)
    ),
    u AS (SELECT * FROM u0 WHERE mask <> 0),
    tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM u),
    coal AS (
        SELECT s.s,
               CAST(ROUND(1000000.0 * COALESCE(SUM(u.conv), 0)
                          / MAX(tot.n), 0) AS BIGINT) AS v_micro
        FROM (SELECT range AS s FROM range(0, 16)) s
        CROSS JOIN tot
        LEFT JOIN u ON (u.mask | s.s) = s.s
        GROUP BY s.s
    ),
    ch(channel, bit) AS (VALUES {chans}),
    exposed AS (
        SELECT ch.channel,
               CAST(SUM(CASE WHEN (u.mask & ch.bit) > 0 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_exposed
        FROM ch CROSS JOIN u GROUP BY ch.channel
    ),
    terms AS (
        SELECT ch.channel,
               (CASE ((c0.s >> 0) & 1) + ((c0.s >> 1) & 1)
                     + ((c0.s >> 2) & 1) + ((c0.s >> 3) & 1)
                WHEN 0 THEN 6 WHEN 1 THEN 2 WHEN 2 THEN 2 ELSE 6 END)
               * (c1.v_micro - c0.v_micro) AS t
        FROM ch
        JOIN coal c0 ON (c0.s & ch.bit) = 0
        JOIN coal c1 ON c1.s = (c0.s | ch.bit)
    )
    SELECT t.channel, e.n_exposed,
           ROUND(SUM(t.t) / 24000000.0, 6) AS shapley
    FROM terms t JOIN exposed e ON e.channel = t.channel
    GROUP BY t.channel, e.n_exposed
    """


@register(
    "shapley_channel_attribution",
    _shapley_oracle_sql(),
    doc="X124 exact Shapley-value attribution over the 4-channel touch "
        "universe: v(S) = share of touched (user, day) journeys that "
        "converted and whose touch set fits inside coalition S (16 "
        "coalitions, enumerated exactly; v(empty)=0), per-channel "
        "credit = the classic "
        "factorial-weighted marginal sum. One corpus pass builds "
        "per-journey bitmasks; everything "
        "after is 16-row arithmetic, so the op is map-reduce-shaped at "
        "any event volume. Credits satisfy the efficiency axiom "
        "(sum = v(full) - v(empty)) — law-tested.",
    tags=("X124", "X71", "X7", "X14"),
)
def shapley_channel_attribution(spark: SparkSession,
                                sf_dir: str) -> DataFrame:
    ev = _ev(spark, sf_dir)
    u = (ev.groupBy("user_id", F.to_date("ts").alias("d"))
         .agg(F.expr("cast(bit_or(CASE event_type "
                     + " ".join(f"WHEN '{n}' THEN {b}"
                                for n, b in SHAPLEY_CHANNELS)
                     + " ELSE 0 END) as bigint)").alias("mask"),
              F.max(F.when(F.col("event_type") == "purchase", 1)
                    .otherwise(0)).alias("conv")))
    u = u.filter(F.col("mask") != 0)
    masks = spark.range(0, 16).select(F.col("id").alias("s"))
    # nc per coalition is a 16-row frame; the denominator is the
    # constant touched-journey count, folded in the same aggregate via
    # an unconditional counter (one corpus pass, no collect).
    coal = (u.crossJoin(F.broadcast(masks))
            .groupBy("s")
            .agg(F.sum(F.when(F.expr("(mask | s) = s"), F.col("conv"))
                       .otherwise(0)).cast("long").alias("nc"),
                 F.count("*").cast("long").alias("n_tot")))
    coal = coal.withColumn(
        "v_micro",
        F.round(1000000.0 * F.col("nc") / F.col("n_tot"), 0).cast("long"))
    ch = spark.createDataFrame(list(SHAPLEY_CHANNELS), "channel STRING, bit INT")
    exposed = (ch.crossJoin(u)
               .groupBy("channel")
               .agg(F.sum(F.when(F.expr("(mask & bit) > 0"), 1)
                          .otherwise(0)).cast("long").alias("n_exposed")))
    c0 = coal.select(F.col("s").alias("s0"),
                     F.col("v_micro").alias("v0"))
    c1 = coal.select(F.col("s").alias("s1"),
                     F.col("v_micro").alias("v1"))
    popcnt = ("((s0 >> 0) & 1) + ((s0 >> 1) & 1) + "
              "((s0 >> 2) & 1) + ((s0 >> 3) & 1)")
    w = F.expr(f"CASE {popcnt} WHEN 0 THEN 6 WHEN 1 THEN 2 "
               "WHEN 2 THEN 2 ELSE 6 END")
    terms = (ch.join(c0, F.expr("(s0 & bit) = 0"))
             .join(c1, F.expr("s1 = (s0 | bit)"))
             .select("channel", (w * (F.col("v1") - F.col("v0"))).alias("t")))
    return (terms.groupBy("channel")
            .agg(F.round(F.sum("t") / F.lit(24000000.0), 6).alias("shapley"))
            .join(exposed, "channel")
            .select("channel", "n_exposed", "shapley"))


# --------------------------------------------------------------------------
# X128: sequence-pattern matching with NEGATION — the MATCH_RECOGNIZE /
# complex-event-processing shape Spark lacks natively: per (user, day)
# journey, does a purchase complete a view -> click -> purchase chain
# with NO error event between the click and the purchase? Expressed
# with running-state window functions (never a self-join): one pass
# carries last-view / last-qualified-click / last-error timestamps
# over ROWS UNBOUNDED PRECEDING .. 1 PRECEDING frames; a purchase
# matches iff a view-backed click exists and the most recent error
# precedes it (choosing the LATEST qualified click implements the
# standard greedy skip-till-next-match semantics: a match survives iff
# ANY qualifying click has no later error). Window state is O(1) per
# row, partitions are (user, day) — embarrassingly parallel at any
# event volume.
# --------------------------------------------------------------------------
@register(
    "pattern_funnel_negation",
    """
    WITH ev AS (
        SELECT user_id, event_id, ts, event_type, CAST(ts AS DATE) AS d
        FROM events
    ),
    s1 AS (
        SELECT *,
               MAX(CASE WHEN event_type = 'view' THEN ts END) OVER w
                   AS last_view,
               MAX(CASE WHEN event_type = 'error' THEN ts END) OVER w
                   AS last_error
        FROM ev
        WINDOW w AS (PARTITION BY user_id, d ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
    ),
    s2 AS (
        SELECT *,
               MAX(CASE WHEN event_type = 'click' AND last_view IS NOT NULL
                        THEN ts END) OVER w AS last_qual_click
        FROM s1
        WINDOW w AS (PARTITION BY user_id, d ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
    ),
    p AS (
        SELECT d, user_id,
               CASE WHEN last_qual_click IS NOT NULL
                         AND (last_error IS NULL
                              OR last_error < last_qual_click)
                    THEN 1 ELSE 0 END AS matched
        FROM s2 WHERE event_type = 'purchase'
    )
    SELECT d, CAST(COUNT(*) AS BIGINT) AS n_purchases,
           CAST(SUM(matched) AS BIGINT) AS n_matched,
           CAST(COUNT(DISTINCT CASE WHEN matched = 1 THEN user_id END)
                AS BIGINT) AS n_users_matched
    FROM p GROUP BY d
    """,
    doc="X128 CEP pattern with negation (MATCH_RECOGNIZE emulation): "
        "per (user, day), purchases completing view -> click -> "
        "purchase with no error between the click and the purchase, "
        "via running-state windows (last-view / last-qualified-click / "
        "last-error over preceding-rows frames) — one sort per "
        "partition, zero self-joins, O(1) state per row. Daily "
        "purchase/match/user counts.",
    tags=("X128", "X11", "X10", "X8"),
)
def pattern_funnel_negation(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = _ev(spark, sf_dir).select(
        "user_id", "event_id", "ts", "event_type",
        F.to_date("ts").alias("d"))
    w = (Window.partitionBy("user_id", "d").orderBy("ts", "event_id")
         .rowsBetween(Window.unboundedPreceding, -1))
    s1 = ev.select(
        "*",
        F.max(F.when(F.col("event_type") == "view", F.col("ts"))).over(w)
        .alias("last_view"),
        F.max(F.when(F.col("event_type") == "error", F.col("ts"))).over(w)
        .alias("last_error"))
    s2 = s1.select(
        "*",
        F.max(F.when((F.col("event_type") == "click")
                     & F.col("last_view").isNotNull(), F.col("ts")))
        .over(w).alias("last_qual_click"))
    p = (s2.filter(F.col("event_type") == "purchase")
         .select("d", "user_id",
                 F.when(F.col("last_qual_click").isNotNull()
                        & (F.col("last_error").isNull()
                           | (F.col("last_error")
                              < F.col("last_qual_click"))), 1)
                 .otherwise(0).alias("matched")))
    return (p.groupBy("d")
            .agg(F.count("*").cast("long").alias("n_purchases"),
                 F.sum("matched").cast("long").alias("n_matched"),
                 F.countDistinct(
                     F.when(F.col("matched") == 1, F.col("user_id")))
                 .cast("long").alias("n_users_matched")))


# --------------------------------------------------------------------------
# X129: exact two-sample Kolmogorov-Smirnov drift matrix between the
# event-type value distributions — the sup-norm companion to the PSI
# (X79, binned divergence) and Wasserstein (X122, integral metric)
# drift scores. D = max_x |F_a(x) - F_b(x)| computed EXACTLY on the
# integer grid: per-(type, value) histogram first (one corpus pass;
# value cardinality, not row count, drives everything downstream),
# then per-pair merged value grids with windowed cumulative counts,
# and the sup as MAX |cum_a*n_b - cum_b*n_a| — a BIGINT, so no float
# CDF ever forms and the hash pins the statistic. 5 types -> 10
# pairs; each histogram fans out to its 4 pairs (constant factor).
# KS is a true metric on distributions (law-tested triangle
# inequality), unlike PSI.
# --------------------------------------------------------------------------
@register(
    "ks_drift_matrix",
    """
    WITH h AS (
        SELECT event_type AS t, value AS v, CAST(COUNT(*) AS BIGINT) AS c
        FROM events WHERE value IS NOT NULL GROUP BY 1, 2
    ),
    n AS (SELECT t, CAST(SUM(c) AS BIGINT) AS n FROM h GROUP BY t),
    pairs AS (
        SELECT a.t AS ta, b.t AS tb FROM n a JOIN n b ON a.t < b.t
    ),
    merged AS (
        SELECT p.ta, p.tb, h.v,
               SUM(CASE WHEN h.t = p.ta THEN h.c ELSE 0 END) AS ca,
               SUM(CASE WHEN h.t = p.tb THEN h.c ELSE 0 END) AS cb
        FROM pairs p JOIN h ON h.t IN (p.ta, p.tb)
        GROUP BY p.ta, p.tb, h.v
    ),
    cum AS (
        SELECT ta, tb,
               SUM(ca) OVER w AS cum_a, SUM(cb) OVER w AS cum_b
        FROM merged
        WINDOW w AS (PARTITION BY ta, tb ORDER BY v)
    )
    SELECT c.ta AS type_a, c.tb AS type_b,
           na.n AS n_a, nb.n AS n_b,
           CAST(MAX(ABS(c.cum_a * nb.n - c.cum_b * na.n)) AS BIGINT)
               AS ks_num,
           ROUND(CAST(MAX(ABS(c.cum_a * nb.n - c.cum_b * na.n)) AS DOUBLE)
                 / (na.n * nb.n), 6) AS ks
    FROM cum c
    JOIN n na ON na.t = c.ta
    JOIN n nb ON nb.t = c.tb
    GROUP BY c.ta, c.tb, na.n, nb.n
    """,
    doc="X129 exact two-sample KS statistic for every event-type pair "
        "over value: per-(type, value) histogram -> per-pair merged "
        "grid -> windowed cumulative counts -> sup of "
        "|cum_a*n_b - cum_b*n_a| as a BIGINT (denominator n_a*n_b "
        "divides once at the end). Histogram-first keeps all work "
        "proportional to distinct values; no row-level self-join "
        "exists at any scale.",
    tags=("X129", "X79", "X11", "X7"),
)
def ks_drift_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = _ev(spark, sf_dir).filter(F.col("value").isNotNull())
    h = (ev.groupBy(F.col("event_type").alias("t"),
                    F.col("value").alias("v"))
         .agg(F.count("*").cast("long").alias("c")))
    n = h.groupBy("t").agg(F.sum("c").cast("long").alias("n"))
    pairs = (n.select(F.col("t").alias("ta"))
             .join(n.select(F.col("t").alias("tb")),
                   F.col("ta") < F.col("tb")))
    merged = (pairs.join(h, F.col("t").isin(F.col("ta"), F.col("tb")))
              .groupBy("ta", "tb", "v")
              .agg(F.sum(F.when(F.col("t") == F.col("ta"), F.col("c"))
                         .otherwise(0)).alias("ca"),
                   F.sum(F.when(F.col("t") == F.col("tb"), F.col("c"))
                         .otherwise(0)).alias("cb")))
    w = (Window.partitionBy("ta", "tb").orderBy("v")
         .rowsBetween(Window.unboundedPreceding, 0))
    cum = merged.select(
        "ta", "tb",
        F.sum("ca").over(w).alias("cum_a"),
        F.sum("cb").over(w).alias("cum_b"))
    na = n.select(F.col("t").alias("ta"), F.col("n").alias("n_a"))
    nb = n.select(F.col("t").alias("tb"), F.col("n").alias("n_b"))
    return (cum.join(F.broadcast(na), "ta").join(F.broadcast(nb), "tb")
            .groupBy(F.col("ta").alias("type_a"),
                     F.col("tb").alias("type_b"), "n_a", "n_b")
            .agg(F.max(F.abs(F.col("cum_a") * F.col("n_b")
                             - F.col("cum_b") * F.col("n_a")))
                 .cast("long").alias("ks_num"))
            .withColumn("ks", F.round(F.col("ks_num").cast("double")
                                      / (F.col("n_a") * F.col("n_b")), 6)))


# --------------------------------------------------------------------------
# X130: forecast backtesting — the model-evaluation loop every
# capacity/demand pipeline runs: roll a forecaster over history and
# score absolute errors on the days it could have predicted. Two
# classical baselines: naive-1 (yesterday's count) and
# seasonal-naive-7 (same weekday last week), the standard yardsticks
# MASE is defined against. Counts are integers, forecasts are joins
# on date arithmetic (never row-lag, so missing days can't silently
# shift the season), errors fold as BIGINTs; the only division is the
# final MAE. Per-(event_type, model) scores.
# --------------------------------------------------------------------------
@register(
    "forecast_backtest_naive",
    """
    WITH daily AS (
        SELECT event_type AS t, CAST(ts AS DATE) AS d,
               CAST(COUNT(*) AS BIGINT) AS c
        FROM events GROUP BY 1, 2
    ),
    scored AS (
        SELECT m.model, a.t,
               CAST(ABS(a.c - f.c) AS BIGINT) AS abs_err
        FROM (SELECT 'naive1' AS model, 1 AS lag_days
              UNION ALL SELECT 'snaive7', 7) m
        JOIN daily a ON TRUE
        JOIN daily f ON f.t = a.t AND f.d = a.d - m.lag_days
    )
    SELECT model, t AS event_type, CAST(COUNT(*) AS BIGINT) AS n_days,
           CAST(SUM(abs_err) AS BIGINT) AS total_abs_err,
           ROUND(CAST(SUM(abs_err) AS DOUBLE) / COUNT(*), 6) AS mae
    FROM scored GROUP BY model, t
    """,
    doc="X130 forecast backtest: naive-1 and seasonal-naive-7 "
        "forecasters rolled over the daily per-type event counts, "
        "scored by MAE on every day with an available forecast. "
        "Forecast = equi-join of the daily-count table to itself on "
        "date arithmetic (gap-safe, unlike LAG over rows); daily "
        "aggregation is the one corpus pass, everything after runs on "
        "the day-cardinality table. The \"is your fancy model beating "
        "last-week-same-day\" number every forecasting system needs.",
    tags=("X130", "X82", "X49", "X7", "X3"),
)
def forecast_backtest_naive(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _ev(spark, sf_dir)
    daily = (ev.groupBy(F.col("event_type").alias("t"),
                        F.to_date("ts").alias("d"))
             .agg(F.count("*").cast("long").alias("c")))
    models = spark.createDataFrame(
        [("naive1", 1), ("snaive7", 7)], "model STRING, lag_days INT")
    actual = daily.select("t", "d", F.col("c").alias("c_act"))
    fcst = daily.select(F.col("t").alias("tf"), F.col("d").alias("df"),
                        F.col("c").alias("c_fc"))
    scored = (F.broadcast(models).crossJoin(actual)
              .join(fcst, (F.col("tf") == F.col("t"))
                    & (F.col("df")
                       == F.date_sub(F.col("d"), F.col("lag_days"))))
              .select("model", "t",
                      F.abs(F.col("c_act") - F.col("c_fc")).cast("long")
                      .alias("abs_err")))
    return (scored.groupBy("model", F.col("t").alias("event_type"))
            .agg(F.count("*").cast("long").alias("n_days"),
                 F.sum("abs_err").cast("long").alias("total_abs_err"))
            .withColumn("mae", F.round(F.col("total_abs_err").cast("double")
                                       / F.col("n_days"), 6)))


# --------------------------------------------------------------------------
# X131: Allen interval-algebra relation profile — classify every pair
# of a customer's order fulfilment intervals [first ship, last ship]
# into the 7 canonical forward relations (before / meets / overlaps /
# finished_by / contains / starts / equals; converses collapse by
# ordering each pair canonically on (start, end, orderkey)). The
# temporal-reasoning primitive behind overlap audits and process
# mining. Pair generation is an equi-join on the customer key, so
# fan-out is bounded by per-customer order count (never global
# O(n^2)); the case ladder is exhaustive, so relation counts
# partition the pair set exactly (law-tested).
# --------------------------------------------------------------------------
_ALLEN_CASE = """CASE
    WHEN a_e < b_s THEN 'before'
    WHEN a_s < b_s AND a_e = b_s THEN 'meets'
    WHEN a_s < b_s AND a_e > b_s AND a_e < b_e THEN 'overlaps'
    WHEN a_s < b_s AND a_e = b_e THEN 'finished_by'
    WHEN a_s < b_s AND a_e > b_e THEN 'contains'
    WHEN a_s = b_s AND a_e < b_e THEN 'starts'
    ELSE 'equals' END"""


@register(
    "allen_interval_profile",
    f"""
    WITH iv AS (
        SELECT o.o_custkey AS ck, l.l_orderkey AS k,
               MIN(l.l_shipdate) AS s, MAX(l.l_shipdate) AS e
        FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
        GROUP BY 1, 2
    ),
    pairs AS (
        SELECT a.s AS a_s, a.e AS a_e, b.s AS b_s, b.e AS b_e
        FROM iv a JOIN iv b
          ON a.ck = b.ck
         AND (a.s < b.s OR (a.s = b.s AND a.e < b.e)
              OR (a.s = b.s AND a.e = b.e AND a.k < b.k))
    ),
    rel AS (SELECT {_ALLEN_CASE} AS relation FROM pairs),
    tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM rel)
    SELECT relation, CAST(COUNT(*) AS BIGINT) AS n_pairs,
           ROUND(CAST(COUNT(*) AS DOUBLE) / MAX(tot.n), 6) AS share
    FROM rel CROSS JOIN tot
    GROUP BY relation
    """,
    doc="X131 Allen interval-algebra profile: every same-customer pair "
        "of order fulfilment intervals [min ship, max ship], "
        "canonically ordered on (start, end, key) and classified into "
        "the 7 forward Allen relations by an exhaustive case ladder. "
        "Counts + shares per relation. Pair fan-out rides the "
        "customer equi-join (per-key bounded); one aggregate after.",
    tags=("X131", "X5", "X46", "X7", "X3"),
)
def allen_interval_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    iv = (li.join(orders.select(F.col("o_orderkey").alias("l_orderkey"),
                                "o_custkey"), "l_orderkey")
          .groupBy(F.col("o_custkey").alias("ck"),
                   F.col("l_orderkey").alias("k"))
          .agg(F.min("l_shipdate").alias("s"),
               F.max("l_shipdate").alias("e")))
    a = iv.select(F.col("ck"), F.col("k").alias("a_k"),
                  F.col("s").alias("a_s"), F.col("e").alias("a_e"))
    b = iv.select(F.col("ck"), F.col("k").alias("b_k"),
                  F.col("s").alias("b_s"), F.col("e").alias("b_e"))
    pairs = a.join(b, "ck").filter(
        (F.col("a_s") < F.col("b_s"))
        | ((F.col("a_s") == F.col("b_s")) & (F.col("a_e") < F.col("b_e")))
        | ((F.col("a_s") == F.col("b_s")) & (F.col("a_e") == F.col("b_e"))
           & (F.col("a_k") < F.col("b_k"))))
    rel = pairs.select(F.expr(_ALLEN_CASE).alias("relation"))
    tot = rel.count()
    return (rel.groupBy("relation")
            .agg(F.count("*").cast("long").alias("n_pairs"))
            .withColumn("share",
                        F.round(F.col("n_pairs").cast("double") / tot, 6)))


# --------------------------------------------------------------------------
# X136: exact autocorrelation function (ACF, lags 1..ACF_MAX_LAG) of
# the daily per-type event-count series — the seasonality detector
# behind lag selection for X130's seasonal-naive and X82's STL
# period. Everything is integer algebra: with S = sum c, Q = sum c^2,
# and per-lag sums P_k = sum c_t*c_{t+k}, A_k/B_k = lag-window sums,
# the mean-centered ACF is
#   [n^2*P_k - n*S*(A_k + B_k) + (n-k)*S^2] / [n^2*Q - n*S^2]
# — numerator and denominator are BIGINTs (counts up to ~1e8/day fit
# comfortably), so both engines agree bit-for-bit and the only double
# is the final division. Lag pairing is a date-arithmetic equi-join
# (gap-safe); the corpus is touched once for the daily histogram.
# --------------------------------------------------------------------------
ACF_MAX_LAG = 7


@register(
    "event_acf_profile",
    f"""
    WITH daily AS (
        SELECT event_type AS t, CAST(ts AS DATE) AS d,
               CAST(COUNT(*) AS BIGINT) AS c
        FROM events GROUP BY 1, 2
    ),
    tot AS (
        SELECT t, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(c) AS BIGINT) AS s,
               CAST(SUM(c * c) AS BIGINT) AS q
        FROM daily GROUP BY t
    ),
    lagged AS (
        SELECT a.t, k.k,
               CAST(SUM(a.c * b.c) AS BIGINT) AS p,
               CAST(SUM(a.c) AS BIGINT) AS a_sum,
               CAST(SUM(b.c) AS BIGINT) AS b_sum
        FROM (SELECT UNNEST(generate_series(1, {ACF_MAX_LAG})) AS k) k
        JOIN daily a ON TRUE
        JOIN daily b ON b.t = a.t AND b.d = a.d + CAST(k.k AS INTEGER)
        GROUP BY a.t, k.k
    )
    SELECT l.t AS event_type, CAST(l.k AS BIGINT) AS lag,
           tot.n AS n_days,
           CAST(tot.n * tot.n * l.p
                - tot.n * tot.s * (l.a_sum + l.b_sum)
                + (tot.n - l.k) * tot.s * tot.s AS BIGINT) AS acf_num,
           CAST(tot.n * tot.n * tot.q - tot.n * tot.s * tot.s AS BIGINT)
               AS acf_den,
           ROUND(CAST(tot.n * tot.n * l.p
                      - tot.n * tot.s * (l.a_sum + l.b_sum)
                      + (tot.n - l.k) * tot.s * tot.s AS DOUBLE)
                 / (tot.n * tot.n * tot.q - tot.n * tot.s * tot.s), 6)
               AS acf
    FROM lagged l JOIN tot ON tot.t = l.t
    """,
    doc=f"X136 exact ACF (lags 1..{ACF_MAX_LAG}) of daily per-type "
        "event counts: mean-centered autocorrelation as a ratio of "
        "two BIGINTs derived from integer sums (S, Q, per-lag "
        "products), divided once. Daily histogram is the only corpus "
        "pass; lag pairs come from a date-arithmetic equi-join, so "
        "gaps in the calendar never misalign the series.",
    tags=("X136", "X82", "X80", "X7", "X3"),
)
def event_acf_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _ev(spark, sf_dir)
    daily = (ev.groupBy(F.col("event_type").alias("t"),
                        F.to_date("ts").alias("d"))
             .agg(F.count("*").cast("long").alias("c")))
    tot = (daily.groupBy("t")
           .agg(F.count("*").cast("long").alias("n"),
                F.sum("c").cast("long").alias("s"),
                F.sum(F.col("c") * F.col("c")).cast("long").alias("q")))
    ks = spark.range(1, ACF_MAX_LAG + 1).select(
        F.col("id").cast("int").alias("k"))
    b = daily.select(F.col("t").alias("tb"), F.col("d").alias("db"),
                     F.col("c").alias("cb"))
    lagged = (F.broadcast(ks).crossJoin(daily)
              .join(b, (F.col("tb") == F.col("t"))
                    & (F.col("db") == F.expr("date_add(d, k)")))
              .groupBy("t", "k")
              .agg(F.sum(F.col("c") * F.col("cb")).cast("long").alias("p"),
                   F.sum("c").cast("long").alias("a_sum"),
                   F.sum("cb").cast("long").alias("b_sum")))
    j = lagged.join(tot, "t")
    num = (F.col("n") * F.col("n") * F.col("p")
           - F.col("n") * F.col("s") * (F.col("a_sum") + F.col("b_sum"))
           + (F.col("n") - F.col("k")) * F.col("s") * F.col("s"))
    den = (F.col("n") * F.col("n") * F.col("q")
           - F.col("n") * F.col("s") * F.col("s"))
    return j.select(F.col("t").alias("event_type"),
                    F.col("k").cast("long").alias("lag"),
                    F.col("n").alias("n_days"),
                    num.cast("long").alias("acf_num"),
                    den.cast("long").alias("acf_den"),
                    F.round(num.cast("double") / den, 6).alias("acf"))


# --------------------------------------------------------------------------
# X147: capture-recapture population estimation (Chapman's
# bias-corrected Lincoln-Petersen) — estimate the true daily active
# population from two overlapping "capture" samples (users seen
# viewing vs users seen clicking): N_hat = (n1+1)(n2+1)/(m+1) - 1.
# The ecology estimator data teams reuse to size populations no
# single log covers (total users when each event stream sees only a
# subset). One distinct-(day, user, kind) aggregate -> per-day
# integer counts -> one division; the true daily population rides
# the same pass for calibration. Law-tested against Python set
# algebra, plus m <= min(n1, n2) and N_hat >= max(n1, n2) whenever
# the overlap is nonempty.
# --------------------------------------------------------------------------
@register(
    "capture_recapture_daily",
    """
    WITH marks AS (
        SELECT DISTINCT CAST(ts AS DATE) AS d, user_id,
               CASE WHEN event_type = 'view' THEN 1 ELSE 2 END AS cap
        FROM events WHERE event_type IN ('view', 'click')
    ),
    per_user AS (
        SELECT d, user_id,
               MAX(CASE WHEN cap = 1 THEN 1 ELSE 0 END) AS c1,
               MAX(CASE WHEN cap = 2 THEN 1 ELSE 0 END) AS c2
        FROM marks GROUP BY d, user_id
    ),
    caps AS (
        SELECT d, CAST(SUM(c1) AS BIGINT) AS n1,
               CAST(SUM(c2) AS BIGINT) AS n2,
               CAST(SUM(c1 * c2) AS BIGINT) AS m
        FROM per_user GROUP BY d
    ),
    act AS (
        SELECT CAST(ts AS DATE) AS d,
               CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_true
        FROM events GROUP BY 1
    )
    SELECT caps.d, n1, n2, m,
           ROUND((CAST(n1 + 1 AS DOUBLE) * (n2 + 1)) / (m + 1) - 1, 6)
               AS n_hat,
           act.n_true
    FROM caps JOIN act ON act.d = caps.d
    """,
    doc="X147 Chapman capture-recapture: daily active-population "
        "estimate from the view-capture and click-capture user sets, "
        "N_hat = (n1+1)(n2+1)/(m+1) - 1 on exact integer counts, "
        "with the true distinct-user count alongside for "
        "calibration. Distinct-first aggregates only; no joins wider "
        "than the day-cardinality tables.",
    tags=("X147", "X8", "X56", "X7"),
)
def capture_recapture_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _ev(spark, sf_dir)
    per_user = (ev.filter(F.col("event_type").isin("view", "click"))
                .select(F.to_date("ts").alias("d"), "user_id",
                        (F.col("event_type") == "view").cast("int")
                        .alias("v"),
                        (F.col("event_type") == "click").cast("int")
                        .alias("c"))
                .groupBy("d", "user_id")
                .agg(F.max("v").alias("c1"), F.max("c").alias("c2")))
    caps = (per_user.groupBy("d")
            .agg(F.sum("c1").cast("long").alias("n1"),
                 F.sum("c2").cast("long").alias("n2"),
                 F.sum(F.col("c1") * F.col("c2")).cast("long")
                 .alias("m")))
    act = (ev.groupBy(F.to_date("ts").alias("d"))
           .agg(F.countDistinct("user_id").cast("long").alias("n_true")))
    return (caps.join(act, "d")
            .select("d", "n1", "n2", "m",
                    F.round((F.col("n1") + 1).cast("double")
                            * (F.col("n2") + 1) / (F.col("m") + 1) - 1,
                            6).alias("n_hat"),
                    "n_true"))


# --------------------------------------------------------------------------
# X152: lead-lag cross-correlation (CCF) between daily event-type
# series — X136's ACF generalized across series: does viewing LEAD
# purchasing, and by how many days? For each (driver, response) pair
# and lag k in [-CCF_MAX_LAG, +CCF_MAX_LAG], the mean-centered
# cross-correlation expands to pure integers (P_k, window sums A_k /
# B_k, overlap size, and full-series S/Q totals):
#   num = na*nb*P_k - na*Sb*A_k - nb*Sa*B_k + |O_k|*Sa*Sb
#   r_k = num / sqrt((na*Qa - Sa^2) * (nb*Qb - Sb^2) * na * nb)
# — the only floats are one IEEE sqrt and one division of identical
# integers. Lag pairing is a date-arithmetic equi-join (gap-safe);
# the corpus is touched once for the daily histogram.
# --------------------------------------------------------------------------
CCF_MAX_LAG = 7
CCF_PAIRS = (("view", "purchase"), ("click", "purchase"),
             ("view", "click"))


def _ccf_oracle_sql() -> str:
    pair_rows = " UNION ALL ".join(
        f"SELECT '{a}' AS ta, '{b}' AS tb" for a, b in CCF_PAIRS)
    return f"""
    WITH daily AS (
        SELECT event_type AS t, CAST(ts AS DATE) AS d,
               CAST(COUNT(*) AS BIGINT) AS c
        FROM events GROUP BY 1, 2
    ),
    tot AS (
        SELECT t, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(c) AS BIGINT) AS s,
               CAST(SUM(c * c) AS BIGINT) AS q
        FROM daily GROUP BY t
    ),
    prs AS ({pair_rows}),
    lagged AS (
        SELECT p.ta, p.tb, k.k,
               CAST(COUNT(*) AS BIGINT) AS o,
               CAST(SUM(a.c * b.c) AS BIGINT) AS pk,
               CAST(SUM(a.c) AS BIGINT) AS ak,
               CAST(SUM(b.c) AS BIGINT) AS bk
        FROM prs p
        JOIN (SELECT UNNEST(generate_series({-CCF_MAX_LAG},
                                            {CCF_MAX_LAG})) AS k) k
          ON TRUE
        JOIN daily a ON a.t = p.ta
        JOIN daily b ON b.t = p.tb
         AND b.d = a.d + CAST(k.k AS INTEGER)
        GROUP BY p.ta, p.tb, k.k
    )
    SELECT l.ta AS driver, l.tb AS response,
           CAST(l.k AS BIGINT) AS lag, l.o AS n_overlap,
           ROUND(CAST(na.n * nb.n * l.pk - na.n * nb.s * l.ak
                      - nb.n * na.s * l.bk + l.o * na.s * nb.s
                      AS DOUBLE)
                 / SQRT(CAST((na.n * na.q - na.s * na.s)
                             * (nb.n * nb.q - nb.s * nb.s)
                             AS DOUBLE) * na.n * nb.n), 6) AS ccf
    FROM lagged l
    JOIN tot na ON na.t = l.ta
    JOIN tot nb ON nb.t = l.tb
    """


@register(
    "event_ccf_leadlag",
    _ccf_oracle_sql(),
    doc=f"X152 lead-lag cross-correlation (lags +-{CCF_MAX_LAG}) "
        "between daily event-type series for "
        f"{len(CCF_PAIRS)} driver->response pairs: integer-expanded "
        "mean-centered CCF (one IEEE sqrt + one division at the "
        "end), lag pairing by date arithmetic. The does-X-lead-Y "
        "diagnostic behind attribution and forecasting feature "
        "choices.",
    tags=("X152", "X136", "X80", "X7", "X3"),
)
def event_ccf_leadlag(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _ev(spark, sf_dir)
    daily = (ev.groupBy(F.col("event_type").alias("t"),
                        F.to_date("ts").alias("d"))
             .agg(F.count("*").cast("long").alias("c")))
    tot = (daily.groupBy("t")
           .agg(F.count("*").cast("long").alias("n"),
                F.sum("c").cast("long").alias("s"),
                F.sum(F.col("c") * F.col("c")).cast("long").alias("q")))
    prs = spark.createDataFrame(list(CCF_PAIRS), "ta STRING, tb STRING")
    ks = spark.range(-CCF_MAX_LAG, CCF_MAX_LAG + 1).select(
        F.col("id").cast("int").alias("k"))
    a = daily.select(F.col("t").alias("ta"), F.col("d").alias("da"),
                     F.col("c").alias("ca"))
    b = daily.select(F.col("t").alias("tb2"), F.col("d").alias("db"),
                     F.col("c").alias("cb"))
    lagged = (F.broadcast(prs).crossJoin(F.broadcast(ks))
              .join(a, "ta")
              .join(b, (F.col("tb") == F.col("tb2"))
                    & (F.col("db") == F.expr("date_add(da, k)")))
              .groupBy("ta", "tb", "k")
              .agg(F.count("*").cast("long").alias("o"),
                   F.sum(F.col("ca") * F.col("cb")).cast("long")
                   .alias("pk"),
                   F.sum("ca").cast("long").alias("ak"),
                   F.sum("cb").cast("long").alias("bk")))
    na = tot.select(F.col("t").alias("ta"), F.col("n").alias("n_a"),
                    F.col("s").alias("s_a"), F.col("q").alias("q_a"))
    nb = tot.select(F.col("t").alias("tb"), F.col("n").alias("n_b"),
                    F.col("s").alias("s_b"), F.col("q").alias("q_b"))
    num = (F.col("n_a") * F.col("n_b") * F.col("pk")
           - F.col("n_a") * F.col("s_b") * F.col("ak")
           - F.col("n_b") * F.col("s_a") * F.col("bk")
           + F.col("o") * F.col("s_a") * F.col("s_b"))
    den = F.sqrt(((F.col("n_a") * F.col("q_a")
                   - F.col("s_a") * F.col("s_a"))
                  * (F.col("n_b") * F.col("q_b")
                     - F.col("s_b") * F.col("s_b"))).cast("double")
                 * F.col("n_a") * F.col("n_b"))
    return (lagged.join(F.broadcast(na), "ta")
            .join(F.broadcast(nb), "tb")
            .select(F.col("ta").alias("driver"),
                    F.col("tb").alias("response"),
                    F.col("k").cast("long").alias("lag"),
                    F.col("o").alias("n_overlap"),
                    F.round(num.cast("double") / den, 6).alias("ccf")))


# --------------------------------------------------------------------------
# X153: Haar wavelet energy decomposition of the daily per-type
# series — the multi-resolution profile (which timescales carry the
# variance?) behind wavelet-based anomaly detection and series
# compression. Unnormalized integer Haar: each level pairs adjacent
# values into approx = a + b and detail = a - b (pure BIGINT; the
# 1/2^level normalization is applied only in the final reported
# energy, as one division), over the first HAAR_N = 2^HAAR_LEVELS
# days. Parseval's identity — sum of level energies + final approx
# energy == raw series energy — holds EXACTLY in these units and is
# law-tested. Each level is one tiny keyed aggregate (index DIV 2);
# the corpus is touched once for the daily histogram.
# --------------------------------------------------------------------------
HAAR_LEVELS = 4
HAAR_N = 1 << HAAR_LEVELS


def _haar_oracle_sql() -> str:
    sql = f"""
    WITH daily AS (
        SELECT event_type AS t, CAST(ts AS DATE) AS d,
               CAST(COUNT(*) AS BIGINT) AS c
        FROM events GROUP BY 1, 2
    ),
    idx AS (
        SELECT t, c AS v,
               ROW_NUMBER() OVER (PARTITION BY t ORDER BY d) - 1 AS i
        FROM daily
    ),
    v0 AS (SELECT t, i, v FROM idx WHERE i < {HAAR_N})"""
    for lv in range(1, HAAR_LEVELS + 1):
        sql += f""",
    v{lv} AS (
        SELECT t, i // 2 AS i,
               CAST(SUM(v) AS BIGINT) AS v,
               CAST(SUM(CASE WHEN i % 2 = 0 THEN v ELSE -v END)
                    AS BIGINT) AS det
        FROM v{lv - 1} GROUP BY t, i // 2
    ),
    e{lv} AS (
        SELECT t, {lv} AS level,
               CAST(COUNT(*) AS BIGINT) AS n_coeffs,
               CAST(SUM(det * det) AS BIGINT) AS energy_num
        FROM v{lv} GROUP BY t
    )"""
    unions = "\nUNION ALL\n".join(
        f"SELECT t, level, n_coeffs, energy_num,"
        f" ROUND(CAST(energy_num AS DOUBLE) / {1 << lv}, 6) AS energy"
        f" FROM e{lv}" for lv in range(1, HAAR_LEVELS + 1))
    sql += f""",
    approx AS (
        SELECT t, 0 AS level, CAST(COUNT(*) AS BIGINT) AS n_coeffs,
               CAST(SUM(v * v) AS BIGINT) AS energy_num
        FROM v{HAAR_LEVELS} GROUP BY t
    )
    SELECT t AS event_type, CAST(level AS BIGINT) AS level, n_coeffs,
           energy_num, energy
    FROM ({unions}
          UNION ALL
          SELECT t, level, n_coeffs, energy_num,
                 ROUND(CAST(energy_num AS DOUBLE) / {1 << HAAR_LEVELS},
                       6) AS energy
          FROM approx)
    """
    return sql


@register(
    "haar_energy_profile",
    _haar_oracle_sql(),
    doc=f"X153 integer Haar wavelet energy profile over the first "
        f"{HAAR_N} days of each event-type series: per-level detail "
        "energies (level 0 row = the final approximation energy) as "
        "exact BIGINT numerators with the 1/2^level normalization "
        "applied once at the end. Parseval's identity is law-tested "
        "exactly. One daily-histogram pass + "
        f"{HAAR_LEVELS} tiny DIV-2 aggregates.",
    tags=("X153", "X82", "X136", "X7", "X11"),
)
def haar_energy_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = _ev(spark, sf_dir)
    daily = (ev.groupBy(F.col("event_type").alias("t"),
                        F.to_date("ts").alias("d"))
             .agg(F.count("*").cast("long").alias("c")))
    w = Window.partitionBy("t").orderBy("d")
    v = (daily.withColumn("i", F.row_number().over(w) - 1)
         .filter(F.col("i") < HAAR_N)
         .select("t", "i", F.col("c").alias("v")))
    levels = []
    for lv in range(1, HAAR_LEVELS + 1):
        nxt = (v.groupBy("t", (F.col("i") / 2).cast("long").alias("i"))
               .agg(F.sum("v").cast("long").alias("v"),
                    F.sum(F.when(F.col("i") % 2 == 0, F.col("v"))
                          .otherwise(-F.col("v"))).cast("long")
                    .alias("det")))
        levels.append(
            nxt.groupBy("t")
            .agg(F.count("*").cast("long").alias("n_coeffs"),
                 F.sum(F.col("det") * F.col("det")).cast("long")
                 .alias("energy_num"))
            .select("t", F.lit(lv).cast("long").alias("level"),
                    "n_coeffs", "energy_num",
                    F.round(F.col("energy_num").cast("double")
                            / (1 << lv), 6).alias("energy")))
        v = nxt.select("t", "i", "v")
    approx = (v.groupBy("t")
              .agg(F.count("*").cast("long").alias("n_coeffs"),
                   F.sum(F.col("v") * F.col("v")).cast("long")
                   .alias("energy_num"))
              .select("t", F.lit(0).cast("long").alias("level"),
                      "n_coeffs", "energy_num",
                      F.round(F.col("energy_num").cast("double")
                              / (1 << HAAR_LEVELS), 6).alias("energy")))
    out = levels[0]
    for frame in levels[1:] + [approx]:
        out = out.unionByName(frame)
    return out.select(F.col("t").alias("event_type"), "level",
                      "n_coeffs", "energy_num", "energy")


# --------------------------------------------------------------------------
# X154: group-sequential A/B monitoring — the peek-safely machinery
# (O'Brien-Fleming spending shape) an experimentation platform runs
# nightly: arms by md5 user coin, per-day CUMULATIVE (user, day)
# journey counts and conversions per arm via prefix-sum windows over
# the daily aggregate, pooled two-proportion z at each look, and the
# OBF boundary b(t) = C / sqrt(t) at information fraction t = k / K.
# Boundary values are PYTHON-precomputed micro-integers inlined into
# both engines (the X99 irrational-constant discipline — neither
# engine computes 1/sqrt(t)); z itself is IEEE sqrt + divisions of
# identical BIGINTs, and the crossing decision compares z_micro
# against the integer boundary. One corpus pass; everything after is
# day-cardinality.
# --------------------------------------------------------------------------
SEQ_OBF_C = 2.24  # K=5-style OBF constant, alpha ~ 0.05
SEQ_LOOKS = 30    # daily looks over the month


def _obf_boundaries_micro() -> list[tuple[int, int]]:
    """(day_idx, boundary_micro): C / sqrt(k / K) on the 1e-6 grid,
    computed once in Python."""
    return [(k, round(1e6 * SEQ_OBF_C / ((k / SEQ_LOOKS) ** 0.5)))
            for k in range(1, SEQ_LOOKS + 1)]


def _seq_oracle_sql() -> str:
    btab = ", ".join(f"({k}, {b})" for k, b in _obf_boundaries_micro())
    return f"""
    WITH j AS (
        SELECT CAST(ts AS DATE) AS d, user_id,
               CAST(('0x' || substr(md5('arm:' || user_id), 1, 15))
                    ::BIGINT % 2 AS BIGINT) AS arm,
               MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                   AS conv
        FROM events GROUP BY 1, 2, 3
    ),
    daily AS (
        SELECT d, arm, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(conv) AS BIGINT) AS x
        FROM j GROUP BY d, arm
    ),
    piv AS (
        SELECT d,
               SUM(CASE WHEN arm = 0 THEN n END) AS na,
               SUM(CASE WHEN arm = 0 THEN x END) AS xa,
               SUM(CASE WHEN arm = 1 THEN n END) AS nb,
               SUM(CASE WHEN arm = 1 THEN x END) AS xb
        FROM daily GROUP BY d
    ),
    looks AS (
        SELECT d,
               ROW_NUMBER() OVER (ORDER BY d) AS day_idx,
               CAST(SUM(na) OVER w AS BIGINT) AS n_a,
               CAST(SUM(xa) OVER w AS BIGINT) AS x_a,
               CAST(SUM(nb) OVER w AS BIGINT) AS n_b,
               CAST(SUM(xb) OVER w AS BIGINT) AS x_b
        FROM piv
        WINDOW w AS (ORDER BY d)
    ),
    bounds(day_idx, boundary_micro) AS (VALUES {btab}),
    scored AS (
        SELECT l.d, l.day_idx, l.n_a, l.x_a, l.n_b, l.x_b,
               (CAST(l.x_a AS DOUBLE) / l.n_a
                - CAST(l.x_b AS DOUBLE) / l.n_b)
               / SQRT((CAST(l.x_a + l.x_b AS DOUBLE) / (l.n_a + l.n_b))
                      * (1 - CAST(l.x_a + l.x_b AS DOUBLE)
                             / (l.n_a + l.n_b))
                      * (1.0 / l.n_a + 1.0 / l.n_b)) AS z
        FROM looks l
    )
    SELECT s.d, CAST(s.day_idx AS BIGINT) AS day_idx,
           s.n_a, s.x_a, s.n_b, s.x_b,
           ROUND(s.z, 6) AS z,
           CAST(b.boundary_micro AS BIGINT) AS boundary_micro,
           CAST(CASE WHEN ABS(CAST(ROUND(1000000.0 * s.z, 0) AS BIGINT))
                          > b.boundary_micro
                     THEN 1 ELSE 0 END AS BIGINT) AS crossed
    FROM scored s JOIN bounds b ON b.day_idx = s.day_idx
    """


@register(
    "sequential_ab_obf_monitor",
    _seq_oracle_sql(),
    doc=f"X154 group-sequential A/B monitor: md5 arm coin, daily "
        "cumulative journeys/conversions per arm (prefix windows over "
        "the day table), pooled two-proportion z at each of "
        f"{SEQ_LOOKS} looks, O'Brien-Fleming boundary C/sqrt(t) with "
        f"C={SEQ_OBF_C} precomputed in Python as micro-integers "
        "inlined into both engines. Crossing compares z_micro to the "
        "integer boundary — the peek-without-inflating-alpha sheet.",
    tags=("X154", "X56", "X11", "X7", "X14"),
)
def sequential_ab_obf_monitor(spark: SparkSession,
                              sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = _ev(spark, sf_dir)
    arm = (F.conv(F.substring(
        F.md5(F.concat(F.lit("arm:"), F.col("user_id"))), 1, 15),
        16, 10).cast("long") % 2)
    j = (ev.groupBy(F.to_date("ts").alias("d"), "user_id",
                    arm.alias("arm"))
         .agg(F.max(F.when(F.col("event_type") == "purchase", 1)
                    .otherwise(0)).alias("conv")))
    daily = (j.groupBy("d", "arm")
             .agg(F.count("*").cast("long").alias("n"),
                  F.sum("conv").cast("long").alias("x")))
    piv = (daily.groupBy("d")
           .agg(F.sum(F.when(F.col("arm") == 0, F.col("n"))).alias("na"),
                F.sum(F.when(F.col("arm") == 0, F.col("x"))).alias("xa"),
                F.sum(F.when(F.col("arm") == 1, F.col("n"))).alias("nb"),
                F.sum(F.when(F.col("arm") == 1, F.col("x")))
                .alias("xb")))
    w = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, 0)
    cum = piv.select(
        "d", F.row_number().over(Window.orderBy("d")).alias("day_idx"),
        F.sum("na").over(w).cast("long").alias("n_a"),
        F.sum("xa").over(w).cast("long").alias("x_a"),
        F.sum("nb").over(w).cast("long").alias("n_b"),
        F.sum("xb").over(w).cast("long").alias("x_b"))
    p = (F.col("x_a") + F.col("x_b")).cast("double") \
        / (F.col("n_a") + F.col("n_b"))
    z = ((F.col("x_a").cast("double") / F.col("n_a")
          - F.col("x_b").cast("double") / F.col("n_b"))
         / F.sqrt(p * (1 - p)
                  * (1.0 / F.col("n_a") + 1.0 / F.col("n_b"))))
    bounds = spark.createDataFrame(
        _obf_boundaries_micro(), "day_idx INT, boundary_micro BIGINT")
    return (cum.withColumn("z_raw", z)
            .join(F.broadcast(bounds), "day_idx")
            .select("d", F.col("day_idx").cast("long"),
                    "n_a", "x_a", "n_b", "x_b",
                    F.round("z_raw", 6).alias("z"),
                    "boundary_micro",
                    F.when(F.abs(F.round(1000000.0 * F.col("z_raw"), 0)
                                 .cast("long"))
                           > F.col("boundary_micro"), 1).otherwise(0)
                    .cast("long").alias("crossed")))


# --------------------------------------------------------------------------
# X159: Mann-Kendall trend test + Theil-Sen slope — the
# distribution-free trend detector (no linearity or normality
# assumption; robust to outliers) over the daily per-type event
# series. All pairwise statistics are EXACT integers because the
# series is calendar-bounded (n days never grows with corpus size, so
# the P = n(n-1)/2 pair fan-out and the P x P Sen-median selection
# are CONSTANT cost at any SF — the corpus is touched once for the
# daily histogram):
#   S        = sum over i<j of sign(c_j - c_i)              (BIGINT)
#   var18    = n(n-1)(2n+5) - sum_g t_g(t_g-1)(2t_g+5)      (BIGINT,
#              tie-corrected; true variance is var18/18)
#   z        = (S - sign(S)) / sqrt(var18/18)   (one IEEE sqrt + div)
#   sen      = median of pairwise slopes (c_j-c_i)/(d_j-d_i); the
#              k-th smallest slope is selected by EXACT BIGINT
#              cross-multiplied rank counts (dy_q*dx_p < dy_p*dx_q,
#              dx > 0), and equal rationals divide to the IDENTICAL
#              double on both engines, so the median is hash-exact.
# --------------------------------------------------------------------------
@register(
    "mannkendall_sen_trend",
    """
    WITH daily AS (
        SELECT event_type AS t,
               CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS d,
               CAST(COUNT(*) AS BIGINT) AS c
        FROM events GROUP BY 1, 2
    ),
    pairs AS (
        SELECT a.t, a.d AS da, b.d AS db,
               b.c - a.c AS dy, b.d - a.d AS dx
        FROM daily a JOIN daily b ON b.t = a.t AND b.d > a.d
    ),
    stat AS (
        SELECT t,
               CAST(SUM(CASE WHEN dy > 0 THEN 1
                             WHEN dy < 0 THEN -1 ELSE 0 END)
                    AS BIGINT) AS s,
               CAST(COUNT(*) AS BIGINT) AS p
        FROM pairs GROUP BY t
    ),
    nn AS (SELECT t, CAST(COUNT(*) AS BIGINT) AS n FROM daily GROUP BY t),
    ties AS (
        SELECT t, CAST(SUM(tg * (tg - 1) * (2 * tg + 5)) AS BIGINT) AS tcorr
        FROM (SELECT t, CAST(COUNT(*) AS BIGINT) AS tg
              FROM daily GROUP BY t, c) GROUP BY t
    ),
    ranks AS (
        SELECT p.t, p.da, p.db, p.dy, p.dx,
               CAST(SUM(CASE WHEN q.dy * p.dx < p.dy * q.dx
                             THEN 1 ELSE 0 END) AS BIGINT) AS r_lt,
               CAST(SUM(CASE WHEN q.dy * p.dx <= p.dy * q.dx
                             THEN 1 ELSE 0 END) AS BIGINT) AS r_le
        FROM pairs p JOIN pairs q ON q.t = p.t
        GROUP BY p.t, p.da, p.db, p.dy, p.dx
    ),
    sen AS (
        SELECT r.t,
               MIN(CASE WHEN r.r_lt < (s.p + 1) // 2
                         AND (s.p + 1) // 2 <= r.r_le
                        THEN CAST(r.dy AS DOUBLE) / r.dx END) AS v1,
               MIN(CASE WHEN r.r_lt < s.p // 2 + 1
                         AND s.p // 2 + 1 <= r.r_le
                        THEN CAST(r.dy AS DOUBLE) / r.dx END) AS v2
        FROM ranks r JOIN stat s ON s.t = r.t GROUP BY r.t
    )
    SELECT stat.t AS event_type, nn.n AS n_days, stat.p AS n_pairs,
           stat.s AS s_stat,
           CAST(nn.n * (nn.n - 1) * (2 * nn.n + 5) - ties.tcorr
                AS BIGINT) AS var18_num,
           ROUND(CASE WHEN stat.s = 0
                        OR nn.n * (nn.n - 1) * (2 * nn.n + 5)
                           - ties.tcorr = 0 THEN 0.0::DOUBLE
                      ELSE (CAST(stat.s AS DOUBLE)
                            - CASE WHEN stat.s > 0 THEN 1
                                   WHEN stat.s < 0 THEN -1
                                   ELSE 0 END)
                           / sqrt(CAST(nn.n * (nn.n - 1) * (2 * nn.n + 5)
                                       - ties.tcorr AS DOUBLE) / 18.0)
                 END, 6) AS z,
           ROUND((sen.v1 + sen.v2) / 2.0, 6) AS sen_slope,
           CASE WHEN (CAST(stat.s AS DOUBLE)
                      - CASE WHEN stat.s > 0 THEN 1
                             WHEN stat.s < 0 THEN -1 ELSE 0 END)
                     > 1.959964
                          * sqrt(CAST(nn.n * (nn.n - 1) * (2 * nn.n + 5)
                                      - ties.tcorr AS DOUBLE) / 18.0)
                THEN 'increasing'
                WHEN (CAST(stat.s AS DOUBLE)
                      - CASE WHEN stat.s > 0 THEN 1
                             WHEN stat.s < 0 THEN -1 ELSE 0 END)
                     < -1.959964
                          * sqrt(CAST(nn.n * (nn.n - 1) * (2 * nn.n + 5)
                                      - ties.tcorr AS DOUBLE) / 18.0)
                THEN 'decreasing' ELSE 'no_trend' END AS trend
    FROM stat JOIN nn ON nn.t = stat.t JOIN ties ON ties.t = stat.t
    JOIN sen ON sen.t = stat.t
    ORDER BY event_type
    """,
    doc="X159 Mann-Kendall trend test with tie-corrected variance and "
        "Theil-Sen slope over the daily per-type event series: S and "
        "var18 are exact BIGINT pairwise folds; the Sen median is "
        "selected by cross-multiplied BIGINT rank counts so equal "
        "rationals divide to identical doubles on both engines. The "
        "daily series is calendar-bounded, so every pairwise step is "
        "constant cost regardless of SF; the corpus is scanned once.",
    tags=("X159", "X136", "X82", "X49", "X7"),
)
def mannkendall_sen_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _ev(spark, sf_dir)
    daily = (ev.groupBy(F.col("event_type").alias("t"),
                        F.datediff(F.to_date("ts"),
                                   F.lit("1970-01-01").cast("date"))
                        .cast("long").alias("d"))
             .agg(F.count("*").cast("long").alias("c")))
    b = daily.select(F.col("t").alias("tb"), F.col("d").alias("db"),
                     F.col("c").alias("cb"))
    pairs = (daily.join(b, (F.col("tb") == F.col("t"))
                        & (F.col("db") > F.col("d")))
             .select("t", F.col("d").alias("da"), "db",
                     (F.col("cb") - F.col("c")).alias("dy"),
                     (F.col("db") - F.col("d")).alias("dx")))
    sign = (F.when(F.col("dy") > 0, 1)
            .when(F.col("dy") < 0, -1).otherwise(0))
    stat = (pairs.groupBy("t")
            .agg(F.sum(sign).cast("long").alias("s"),
                 F.count("*").cast("long").alias("p")))
    nn = daily.groupBy("t").agg(F.count("*").cast("long").alias("n"))
    ties = (daily.groupBy("t", "c")
            .agg(F.count("*").cast("long").alias("tg"))
            .groupBy("t")
            .agg(F.sum(F.col("tg") * (F.col("tg") - 1)
                       * (2 * F.col("tg") + 5))
                 .cast("long").alias("tcorr")))
    q = pairs.select(F.col("t").alias("tq"), F.col("dy").alias("qdy"),
                     F.col("dx").alias("qdx"))
    ranks = (pairs.join(q, F.col("tq") == F.col("t"))
             .groupBy("t", "da", "db", "dy", "dx")
             .agg(F.sum(F.when(F.col("qdy") * F.col("dx")
                               < F.col("dy") * F.col("qdx"), 1)
                        .otherwise(0)).cast("long").alias("r_lt"),
                  F.sum(F.when(F.col("qdy") * F.col("dx")
                               <= F.col("dy") * F.col("qdx"), 1)
                        .otherwise(0)).cast("long").alias("r_le")))
    k1 = F.expr("(p + 1) div 2")
    k2 = F.expr("p div 2 + 1")
    val = F.col("dy").cast("double") / F.col("dx")
    sen = (ranks.join(stat, "t")
           .groupBy("t")
           .agg(F.min(F.when((F.col("r_lt") < k1) & (k1 <= F.col("r_le")),
                             val)).alias("v1"),
                F.min(F.when((F.col("r_lt") < k2) & (k2 <= F.col("r_le")),
                             val)).alias("v2")))
    j = (stat.join(nn, "t").join(ties, "t").join(sen, "t"))
    var18 = (F.col("n") * (F.col("n") - 1) * (2 * F.col("n") + 5)
             - F.col("tcorr"))
    s_adj = (F.col("s").cast("double")
             - F.when(F.col("s") > 0, 1)
             .when(F.col("s") < 0, -1).otherwise(0))
    sd = F.sqrt(var18.cast("double") / 18.0)
    return (j.select(
        F.col("t").alias("event_type"), F.col("n").alias("n_days"),
        F.col("p").alias("n_pairs"), F.col("s").alias("s_stat"),
        var18.cast("long").alias("var18_num"),
        F.round(F.when((F.col("s") == 0) | (var18 == 0),
                       F.lit(0.0)).otherwise(s_adj / sd), 6).alias("z"),
        F.round((F.col("v1") + F.col("v2")) / 2.0, 6).alias("sen_slope"),
        F.when(s_adj > 1.959964 * sd, "increasing")
        .when(s_adj < -1.959964 * sd, "decreasing")
        .otherwise("no_trend").alias("trend"))
        .orderBy("event_type"))


# --------------------------------------------------------------------------
# X170: sequential-pattern support mining — for every ordered
# event-type triple (a, b, c), how many users' streams contain it as
# a (strictly time-increasing) subsequence? The GSP/PrefixSpan
# support-counting core, and the exploratory sibling of X128's
# fixed-pattern CEP matcher. The earliest-occurrence greedy is exact
# for existence ("is there an a, then a b after it, then a c after
# that?" succeeds iff the subsequence exists when each step takes its
# MINIMUM qualifying timestamp), so the whole search is three keyed
# min-aggregates/joins — per-user fan-out is bounded by the 5x5 type
# alphabet, never by stream length, and no per-user sequence is ever
# materialized. Timestamps compare as epoch microseconds (session-tz
# offset cancels in comparisons and is never output).
# --------------------------------------------------------------------------
@register(
    "sequence_triple_support",
    """
    WITH ev AS (
        SELECT user_id AS u, event_type AS t, epoch_us(ts) AS us
        FROM events
    ),
    nu AS (SELECT CAST(COUNT(DISTINCT u) AS BIGINT) AS n FROM ev),
    fa AS (SELECT u, t AS a, MIN(us) AS t1 FROM ev GROUP BY u, t),
    t2 AS (
        SELECT fa.u, fa.a, b.t AS b, MIN(b.us) AS t2
        FROM fa JOIN ev b ON b.u = fa.u AND b.us > fa.t1
        GROUP BY fa.u, fa.a, b.t
    ),
    sup AS (
        SELECT t2.a, t2.b, c.t AS c,
               CAST(COUNT(DISTINCT t2.u) AS BIGINT) AS support
        FROM t2 JOIN ev c ON c.u = t2.u AND c.us > t2.t2
        GROUP BY t2.a, t2.b, c.t
    )
    SELECT a, b, c, support,
           ROUND(CAST(support AS DOUBLE) / nu.n, 6) AS support_frac
    FROM sup CROSS JOIN nu
    ORDER BY a, b, c
    """,
    doc="X170 sequential-pattern support: users containing each "
        "ordered event-type triple as a strict-time subsequence, via "
        "the exact earliest-occurrence greedy (first a -> first b "
        "after it -> any c after that) as three keyed min/exists "
        "aggregates. Per-user fan-out bounded by the 25-cell (a, b) "
        "alphabet, independent of stream length; support counts and "
        "fractions hash-checked.",
    tags=("X170", "X128", "X57", "X71", "X7", "X3"),
)
def sequence_triple_support(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..caching import persist_tracked

    ev = persist_tracked(
        _ev(spark, sf_dir).select(
            F.col("user_id").alias("u"),
            F.col("event_type").alias("t"),
            F.unix_micros(F.col("ts").cast("timestamp")).alias("us")))
    nu = ev.select("u").distinct().count()
    fa = (ev.groupBy("u", F.col("t").alias("a"))
          .agg(F.min("us").alias("t1")))
    b = ev.select(F.col("u"), F.col("t").alias("b"),
                  F.col("us").alias("usb"))
    t2 = (fa.join(b, "u")
          .filter(F.col("usb") > F.col("t1"))
          .groupBy("u", "a", "b")
          .agg(F.min("usb").alias("t2")))
    c = ev.select(F.col("u"), F.col("t").alias("c"),
                  F.col("us").alias("usc"))
    sup = (t2.join(c, "u")
           .filter(F.col("usc") > F.col("t2"))
           .groupBy("a", "b", "c")
           .agg(F.countDistinct("u").cast("long").alias("support")))
    return (sup.select(
        "a", "b", "c", "support",
        F.round(F.col("support").cast("double") / nu, 6)
        .alias("support_frac"))
        .orderBy("a", "b", "c"))


# --------------------------------------------------------------------------
# X176: cohort LTV accumulation — the growth-accounting sibling of
# cohort_retention (X8): per weekly signup cohort, the retention
# curve AND the cumulative per-capita purchase value ("LTV curve")
# that payback-period decisions read. Weeks are integer epoch-day
# arithmetic from the corpus min day (gap-safe, engine-portable);
# purchase values snap to micro units per event and fold as BIGINTs;
# per-capita week value is ONE IEEE division of identical integers
# snapped back to micro, so the cumulative sum is again an exact
# BIGINT fold (order-proof). k = 0 retention is 1.0 by construction
# (the law test pins it); windows are per-cohort, never global.
# --------------------------------------------------------------------------
@register(
    "cohort_ltv_curves",
    """
    WITH ev AS (
        SELECT user_id,
               CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS d,
               CASE WHEN event_type = 'purchase'
                    THEN CAST(ROUND(value * 1000000, 0) AS BIGINT)
                    ELSE 0 END AS vmicro
        FROM events
    ),
    m AS (SELECT MIN(d) AS d0 FROM ev),
    wk AS (
        SELECT user_id, (d - m.d0) // 7 AS w, vmicro
        FROM ev CROSS JOIN m
    ),
    first AS (SELECT user_id, MIN(w) AS c FROM wk GROUP BY user_id),
    size_ AS (SELECT c, CAST(COUNT(*) AS BIGINT) AS cohort_size
              FROM first GROUP BY c),
    cell AS (
        SELECT f.c, wk.w - f.c AS k,
               CAST(COUNT(DISTINCT wk.user_id) AS BIGINT) AS n_active,
               CAST(SUM(wk.vmicro) AS BIGINT) AS v_micro
        FROM wk JOIN first f ON f.user_id = wk.user_id
        GROUP BY f.c, wk.w - f.c
    ),
    percap AS (
        SELECT cell.c, cell.k, s.cohort_size, cell.n_active,
               ROUND(CAST(cell.n_active AS DOUBLE) / s.cohort_size, 6)
                   AS retention,
               CAST(ROUND(CAST(cell.v_micro AS DOUBLE) / s.cohort_size,
                          0) AS BIGINT) AS percap_micro
        FROM cell JOIN size_ s ON s.c = cell.c
    )
    SELECT CAST(c AS BIGINT) AS cohort_week, CAST(k AS BIGINT) AS week_k,
           cohort_size, n_active, retention, percap_micro,
           CAST(SUM(percap_micro) OVER (PARTITION BY c ORDER BY k)
                AS BIGINT) AS cum_ltv_micro
    FROM percap ORDER BY cohort_week, week_k
    """,
    doc="X176 cohort LTV curves: weekly cohorts by integer epoch-day "
        "arithmetic, retention + per-capita purchase micro-value per "
        "offset week, cumulative LTV as a BIGINT window fold of "
        "micro-snapped per-capita values (order-proof). One events "
        "scan; per-cohort windows only.",
    tags=("X176", "X8", "X21", "X7", "X10"),
)
def cohort_ltv_curves(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..caching import persist_tracked

    ev = _ev(spark, sf_dir).select(
        "user_id",
        F.datediff(F.to_date("ts"),
                   F.lit("1970-01-01").cast("date"))
        .cast("long").alias("d"),
        F.when(F.col("event_type") == "purchase",
               F.round(F.col("value") * 1000000, 0).cast("long"))
        .otherwise(0).alias("vmicro"))
    m = ev.agg(F.min("d").alias("d0"))
    wk = persist_tracked(
        ev.crossJoin(F.broadcast(m))
        .select("user_id", F.expr("(d - d0) DIV 7").alias("w"),
                "vmicro"))
    first = wk.groupBy("user_id").agg(F.min("w").alias("c"))
    size = first.groupBy("c").agg(F.count("*").cast("long")
                                  .alias("cohort_size"))
    cell = (wk.join(first, "user_id")
            .groupBy("c", (F.col("w") - F.col("c")).alias("k"))
            .agg(F.countDistinct("user_id").cast("long")
                 .alias("n_active"),
                 F.sum("vmicro").cast("long").alias("v_micro")))
    percap = (cell.join(size, "c")
              .select("c", "k", "cohort_size", "n_active",
                      F.round(F.col("n_active").cast("double")
                              / F.col("cohort_size"), 6)
                      .alias("retention"),
                      F.round(F.col("v_micro").cast("double")
                              / F.col("cohort_size"), 0).cast("long")
                      .alias("percap_micro")))
    w = Window.partitionBy("c").orderBy("k") \
        .rowsBetween(Window.unboundedPreceding, 0)
    return (percap.select(
        F.col("c").cast("long").alias("cohort_week"),
        F.col("k").cast("long").alias("week_k"),
        "cohort_size", "n_active", "retention", "percap_micro",
        F.sum("percap_micro").over(w).cast("long")
        .alias("cum_ltv_micro"))
        .orderBy("cohort_week", "week_k"))


# --------------------------------------------------------------------------
# X179: jackknife variance of a ratio estimator — the classical
# delete-one resampling sibling of the X103 Poisson bootstrap, and
# the standard error experiment platforms quote for ratio metrics
# (revenue per click, CTR, value per session) where the i.i.d.-unit
# CLT does not apply directly. Units are DAYS (delete-one-day, the
# cluster-robust choice for serially-correlated event streams):
# theta = S/C over all days, theta_(i) = (S - s_i)/(C - c_i) per
# left-out day. Each replicate is ONE IEEE division of identical
# BIGINTs (purchase value folds in exact micro units, click counts
# integer), snapped back to the micro grid, so the jackknife moments
# (sum r_i, sum r_i^2) are exact BIGINT folds and the SE/bias are
# single closed-form expressions of those integers — no float
# accumulation anywhere. One events scan; the replicate frame is
# day-cardinality.
# --------------------------------------------------------------------------
@register(
    "jackknife_ratio_se",
    """
    WITH ev AS (
        SELECT CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS d,
               CASE WHEN event_type = 'purchase'
                    THEN CAST(ROUND(value * 1000000, 0) AS BIGINT)
                    ELSE 0 END AS vmicro,
               CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS clk
        FROM events
    ),
    byday AS (
        SELECT d, CAST(SUM(vmicro) AS BIGINT) AS s,
               CAST(SUM(clk) AS BIGINT) AS c
        FROM ev GROUP BY d
    ),
    tot AS (
        SELECT CAST(SUM(s) AS BIGINT) AS st, CAST(SUM(c) AS BIGINT) AS ct,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM byday
    ),
    reps AS (
        SELECT CAST(ROUND(CAST(tot.st - byday.s AS DOUBLE)
                          / NULLIF(tot.ct - byday.c, 0), 0) AS BIGINT)
                   AS r
        FROM byday CROSS JOIN tot
    ),
    mom AS (
        SELECT CAST(SUM(r) AS BIGINT) AS r1,
               CAST(SUM(r * r) AS BIGINT) AS r2,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM reps
    ),
    th AS (
        SELECT CAST(ROUND(CAST(st AS DOUBLE) / ct, 0) AS BIGINT)
                   AS theta, n FROM tot
    )
    SELECT th.n AS n_days,
           ROUND(th.theta / 1000000.0, 6) AS theta_hat,
           ROUND(CAST(mom.r1 AS DOUBLE) / mom.n / 1000000.0, 6)
               AS jk_mean,
           ROUND((th.n - 1) * (CAST(mom.r1 AS DOUBLE) / mom.n
                               - th.theta) / 1000000.0, 6) AS jk_bias,
           ROUND(SQRT(CAST((th.n - 1)
                           * (mom.n * mom.r2 - mom.r1 * mom.r1)
                           AS DOUBLE)) / mom.n / 1000000.0, 6) AS jk_se
    FROM th CROSS JOIN mom
    """,
    doc="X179 jackknife (delete-one-day) SE of the revenue-per-click "
        "ratio: per-day (value micro, clicks) cells, each replicate "
        "one IEEE division of identical BIGINTs snapped to micro, "
        "jackknife moments exact BIGINT folds, SE/bias closed-form. "
        "Day-cardinality replicate frame; cluster-robust units.",
    tags=("X179", "X103", "X56", "X7"),
)
def jackknife_ratio_se(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _ev(spark, sf_dir).select(
        F.datediff(F.to_date("ts"),
                   F.lit("1970-01-01").cast("date"))
        .cast("long").alias("d"),
        F.when(F.col("event_type") == "purchase",
               F.round(F.col("value") * 1000000, 0).cast("long"))
        .otherwise(0).alias("vmicro"),
        F.when(F.col("event_type") == "click", 1)
        .otherwise(0).alias("clk"))
    byday = ev.groupBy("d").agg(
        F.sum("vmicro").cast("long").alias("s"),
        F.sum("clk").cast("long").alias("c"))
    tot = byday.agg(F.sum("s").cast("long").alias("st"),
                    F.sum("c").cast("long").alias("ct"),
                    F.count("*").cast("long").alias("n"))
    reps = (byday.crossJoin(F.broadcast(tot))
            .select(F.round((F.col("st") - F.col("s")).cast("double")
                            / F.nullif(F.col("ct") - F.col("c"),
                                       F.lit(0)), 0)
                    .cast("long").alias("r")))
    mom = reps.agg(F.sum("r").cast("long").alias("r1"),
                   F.sum(F.col("r") * F.col("r")).cast("long")
                   .alias("r2"),
                   F.count("*").cast("long").alias("mn"))
    th = tot.select(F.round(F.col("st").cast("double") / F.col("ct"),
                            0).cast("long").alias("theta"),
                    F.col("n"))
    return (th.crossJoin(mom).select(
        F.col("n").alias("n_days"),
        F.round(F.col("theta") / F.lit(1e6), 6).alias("theta_hat"),
        F.round(F.col("r1").cast("double") / F.col("mn") / 1e6, 6)
        .alias("jk_mean"),
        F.round((F.col("n") - 1)
                * (F.col("r1").cast("double") / F.col("mn")
                   - F.col("theta")) / 1e6, 6).alias("jk_bias"),
        F.round(F.sqrt(((F.col("n") - 1)
                        * (F.col("mn") * F.col("r2")
                           - F.col("r1") * F.col("r1")))
                       .cast("double")) / F.col("mn") / 1e6, 6)
        .alias("jk_se")))


# --------------------------------------------------------------------------
# X183: RANSAC-style robust line fit (maximum-consensus estimation) —
# the model-fitting answer to outliers that OLS (X60) cannot give and
# rank methods (X159 Theil-Sen) only give for slope: hypothesize a
# line through every pair of points, count inliers within a fixed
# tolerance band, keep the maximum-consensus line, then refit OLS on
# its inliers. The point set is the CALENDAR-BOUNDED daily purchase
# series, so the pair-candidate frame is days^2 — scale-independent
# of event volume (the same boundedness argument as X124/X148); the
# corpus is touched once for the daily histogram. Exactness: the
# inlier test is one cross-multiplied BIGINT inequality
# 1000*|(y-y1)(x2-x1) - (x-x1)(y2-y1)| <= tol_milli*(x2-x1) with
# tol_milli = round(10% of the mean daily count * 1000) — a single
# snap of one exact division; consensus argmax ties break on
# (x1, x2); the refit moments are exact BIGINT folds.
# --------------------------------------------------------------------------
RANSAC_TOL_PCT = 10


@register(
    "ransac_daily_trend",
    f"""
    WITH pts AS (
        SELECT CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS x,
               CAST(COUNT(*) AS BIGINT) AS y
        FROM events WHERE event_type = 'purchase' GROUP BY 1
    ),
    tol AS (
        SELECT CAST(ROUND(CAST(SUM(y) AS DOUBLE) / COUNT(*)
                          * {RANSAC_TOL_PCT} * 10, 0) AS BIGINT) AS tm
        FROM pts
    ),
    cand AS (
        SELECT a.x AS x1, a.y AS y1, b.x AS x2, b.y AS y2
        FROM pts a JOIN pts b ON b.x > a.x
    ),
    scored AS (
        SELECT c.x1, c.y1, c.x2, c.y2,
               CAST(SUM(CASE WHEN
                    1000 * ABS((p.y - c.y1) * (c.x2 - c.x1)
                               - (p.x - c.x1) * (c.y2 - c.y1))
                    <= tol.tm * (c.x2 - c.x1) THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_in
        FROM cand c CROSS JOIN tol JOIN pts p ON TRUE
        GROUP BY c.x1, c.y1, c.x2, c.y2
    ),
    best AS (
        SELECT * FROM scored
        ORDER BY n_in DESC, x1, x2 LIMIT 1
    ),
    inl AS (
        SELECT p.x, p.y FROM pts p CROSS JOIN best b CROSS JOIN tol
        WHERE 1000 * ABS((p.y - b.y1) * (b.x2 - b.x1)
                         - (p.x - b.x1) * (b.y2 - b.y1))
              <= tol.tm * (b.x2 - b.x1)
    ),
    mom AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS k,
               CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
               CAST(SUM(x * x) AS BIGINT) AS sxx,
               CAST(SUM(x * y) AS BIGINT) AS sxy
        FROM inl
    ),
    np AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM pts)
    SELECT np.n AS n_days, best.x1, best.x2, best.n_in AS n_inliers,
           ROUND(CAST(best.y2 - best.y1 AS DOUBLE)
                 / (best.x2 - best.x1), 6) AS cand_slope,
           ROUND(CAST(mom.k * mom.sxy - mom.sx * mom.sy AS DOUBLE)
                 / NULLIF(mom.k * mom.sxx - mom.sx * mom.sx, 0), 6)
               AS refit_slope,
           ROUND((CAST(mom.sy AS DOUBLE)
                  - (CAST(mom.k * mom.sxy - mom.sx * mom.sy AS DOUBLE)
                     / NULLIF(mom.k * mom.sxx - mom.sx * mom.sx, 0))
                    * mom.sx) / mom.k, 6) AS refit_intercept
    FROM best CROSS JOIN mom CROSS JOIN np
    """,
    doc="X183 RANSAC robust daily-trend fit: every day pair is a "
        "candidate line, inliers counted by one cross-multiplied "
        "BIGINT inequality against a 10%-of-mean tolerance, maximum "
        "consensus wins (ties -> min pair), OLS refit on the inliers "
        "from exact BIGINT moments. Candidate frame is calendar^2, "
        "independent of event volume; one corpus pass.",
    tags=("X183", "X159", "X60", "X49", "X7"),
)
def ransac_daily_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..caching import persist_tracked

    pts = persist_tracked(
        _ev(spark, sf_dir)
        .filter(F.col("event_type") == "purchase")
        .groupBy(F.datediff(F.to_date("ts"),
                            F.lit("1970-01-01").cast("date"))
                 .cast("long").alias("x"))
        .agg(F.count("*").cast("long").alias("y")))
    tol = pts.agg(
        F.round(F.sum("y").cast("double") / F.count("*")
                * RANSAC_TOL_PCT * 10, 0).cast("long").alias("tm"))
    a = pts.select(F.col("x").alias("x1"), F.col("y").alias("y1"))
    b = pts.select(F.col("x").alias("x2"), F.col("y").alias("y2"))
    cand = a.join(b, F.col("x2") > F.col("x1"))
    resid = (1000 * F.abs((F.col("y") - F.col("y1"))
                          * (F.col("x2") - F.col("x1"))
                          - (F.col("x") - F.col("x1"))
                          * (F.col("y2") - F.col("y1"))))
    is_in = F.when(resid <= F.col("tm")
                   * (F.col("x2") - F.col("x1")), 1).otherwise(0)
    scored = (cand.crossJoin(F.broadcast(tol)).crossJoin(pts)
              .groupBy("x1", "y1", "x2", "y2")
              .agg(F.sum(is_in).cast("long").alias("n_in")))
    best = scored.orderBy(F.desc("n_in"), "x1", "x2").limit(1)
    inl = (pts.crossJoin(F.broadcast(best)).crossJoin(F.broadcast(tol))
           .filter(resid <= F.col("tm") * (F.col("x2") - F.col("x1")))
           .select("x", "y"))
    mom = inl.agg(F.count("*").cast("long").alias("k"),
                  F.sum("x").cast("long").alias("sx"),
                  F.sum("y").cast("long").alias("sy"),
                  F.sum(F.col("x") * F.col("x")).cast("long")
                  .alias("sxx"),
                  F.sum(F.col("x") * F.col("y")).cast("long")
                  .alias("sxy"))
    np_ = pts.agg(F.count("*").cast("long").alias("n"))
    num = F.col("k") * F.col("sxy") - F.col("sx") * F.col("sy")
    den = F.nullif(F.col("k") * F.col("sxx")
                   - F.col("sx") * F.col("sx"), F.lit(0))
    slope = num.cast("double") / den
    return (best.crossJoin(mom).crossJoin(np_).select(
        F.col("n").alias("n_days"), "x1", "x2",
        F.col("n_in").alias("n_inliers"),
        F.round((F.col("y2") - F.col("y1")).cast("double")
                / (F.col("x2") - F.col("x1")), 6).alias("cand_slope"),
        F.round(slope, 6).alias("refit_slope"),
        F.round((F.col("sy").cast("double") - slope * F.col("sx"))
                / F.col("k"), 6).alias("refit_intercept")))


# --------------------------------------------------------------------------
# X185: absorbing-Markov expected steps to conversion — the funnel
# question X57's one-step argmax cannot answer: starting from state
# i, how many events until 'purchase' absorbs the user? The chain is
# estimated from consecutive event pairs (one corpus pass); purchase
# is MODELED absorbing (its outgoing transitions are ignored), and
# t = (I - Q)^-1 * 1 is evaluated as the truncated fixed point
# v_{k+1} = 1 + Q v_k for MARKOV_ABS_T rounds — the inverse never
# materializes, each round is one join+agg over the STATE-ALPHABET-
# sized Q (16 cells here), and the iterate lives on the integer
# micro grid: Q entries snap once (round(1e6 c_ij / r_i)), each
# update sums exact BIGINT products and re-snaps via one division of
# a <2^53 integer — bit-identical on both engines, so the oracle
# replays all rounds as generated chained CTEs. Spark localCheckpoints
# the 4-row iterate per round to keep plan depth constant.
# --------------------------------------------------------------------------
MARKOV_ABS_T = 16
MARKOV_ABSORB = "purchase"


def _absorbing_markov_oracle() -> str:
    head = f"""
    WITH ev AS (
        SELECT user_id, event_type, ts, event_id FROM events
    ),
    pairs AS (
        SELECT event_type AS i,
               LEAD(event_type) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS j
        FROM ev
    ),
    c AS (
        SELECT i, j, CAST(COUNT(*) AS BIGINT) AS n
        FROM pairs WHERE j IS NOT NULL AND i <> '{MARKOV_ABSORB}'
        GROUP BY i, j
    ),
    r AS (SELECT i, CAST(SUM(n) AS BIGINT) AS r FROM c GROUP BY i),
    q AS (
        SELECT c.i, c.j,
               CAST(ROUND(1000000.0 * c.n / r.r, 0) AS BIGINT) AS qm
        FROM c JOIN r ON r.i = c.i WHERE c.j <> '{MARKOV_ABSORB}'
    ),
    s AS (SELECT i FROM r),
    v0 AS (SELECT i, CAST(0 AS BIGINT) AS v FROM s)"""
    steps = []
    for t in range(1, MARKOV_ABS_T + 1):
        steps.append(f"""
    v{t} AS (
        SELECT s.i,
               1000000 + COALESCE(CAST(ROUND(SUM(q.qm * v.v)
                                             / 1000000.0, 0) AS BIGINT),
                                  0) AS v
        FROM s LEFT JOIN q ON q.i = s.i
        LEFT JOIN v{t-1} v ON v.i = q.j
        GROUP BY s.i
    )""")
    return (head + "," + ",".join(steps) + f"""
    SELECT r.i AS state, r.r AS n_out,
           ROUND(COALESCE((SELECT CAST(c.n AS DOUBLE) FROM c
                           WHERE c.i = r.i
                             AND c.j = '{MARKOV_ABSORB}'), 0.0)
                 / r.r, 6) AS p_absorb_1step,
           v.v AS steps_micro,
           ROUND(v.v / 1000000.0, 4) AS expected_steps
    FROM r JOIN v{MARKOV_ABS_T} v ON v.i = r.i
    ORDER BY state
    """)


@register(
    "absorbing_markov_steps",
    _absorbing_markov_oracle(),
    doc=f"X185 absorbing-Markov expected steps to '{MARKOV_ABSORB}': "
        f"transition counts from one corpus pass, truncated fixed "
        f"point v=1+Qv for {MARKOV_ABS_T} rounds on the integer micro "
        "grid (Q snapped once, each update one exact-BIGINT fold + "
        "one sub-2^53 re-snap division); oracle replays every round "
        "as generated chained CTEs; per-round frames are state-"
        "alphabet-sized.",
    tags=("X185", "X57", "X71", "X42", "X7"),
)
def absorbing_markov_steps(spark: SparkSession,
                           sf_dir: str) -> DataFrame:
    from ..caching import persist_tracked

    ev = _ev(spark, sf_dir)
    wseq = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = ev.select(
        F.col("event_type").alias("i"),
        F.lead("event_type").over(wseq).alias("j"))
    c = persist_tracked(
        pairs.filter(F.col("j").isNotNull()
                     & (F.col("i") != MARKOV_ABSORB))
        .groupBy("i", "j").agg(F.count("*").cast("long").alias("n")))
    r = persist_tracked(
        c.groupBy("i").agg(F.sum("n").cast("long").alias("r")))
    q = persist_tracked(
        c.join(r, "i")
        .filter(F.col("j") != MARKOV_ABSORB)
        .select("i", "j",
                F.round(F.lit(1000000.0) * F.col("n") / F.col("r"), 0)
                .cast("long").alias("qm")))
    s = r.select("i")
    v = s.select("i", F.lit(0).cast("long").alias("v")) \
        .localCheckpoint()
    for _ in range(MARKOV_ABS_T):
        v = (s.join(q, "i", "left")
             .join(v.select(F.col("i").alias("j"),
                            F.col("v").alias("vj")),
                   "j", "left")
             .groupBy("i")
             .agg((F.lit(1000000)
                   + F.coalesce(
                       F.round(F.sum(F.col("qm") * F.col("vj"))
                               / 1000000.0, 0).cast("long"),
                       F.lit(0))).alias("v"))
             .localCheckpoint())
    absorb = (c.filter(F.col("j") == MARKOV_ABSORB)
              .select("i", F.col("n").alias("na")))
    return (r.join(absorb, "i", "left")
            .join(v, "i")
            .select(F.col("i").alias("state"),
                    F.col("r").alias("n_out"),
                    F.round(F.coalesce(F.col("na").cast("double"),
                                       F.lit(0.0)) / F.col("r"), 6)
                    .alias("p_absorb_1step"),
                    F.col("v").alias("steps_micro"),
                    F.round(F.col("v") / 1000000.0, 4)
                    .alias("expected_steps"))
            .orderBy("state"))


# --------------------------------------------------------------------------
# X196: Markov removal-effect attribution — the data-driven
# attribution model (Anderl et al.) that X124's Shapley answers from
# coalition VALUES, answered instead from the JOURNEY GRAPH: build
# the start -> channel -> conversion chain, compute the absorption
# probability into 'purchase', then re-compute it with each channel
# REMOVED (transitions into it become non-converting exits — no
# renormalization, the standard removal semantics); a channel's
# credit is its relative conversion drop. All five scenarios
# (baseline + 4 removals) iterate in ONE scenario-keyed truncated
# fixed point p = b + Q'p (MARKOV_ATTR_T rounds, X185's integer
# micro machinery: snapped Q/b, exact BIGINT folds, sub-2^53 re-snap
# divisions), so the whole model is one corpus pass + T joins over a
# scenario x state frame (25 rows). Oracle replays every round as
# generated chained CTEs.
# --------------------------------------------------------------------------
MARKOV_ATTR_T = 12


def _markov_attr_oracle() -> str:
    head = f"""
    WITH ev AS (
        SELECT user_id, event_type, ts, event_id FROM events
    ),
    seq AS (
        SELECT user_id, event_type AS j,
               ROW_NUMBER() OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS rn
        FROM ev
    ),
    pairs AS (
        SELECT 'start' AS i, j FROM seq WHERE rn = 1
        UNION ALL
        SELECT a.j AS i, b.j
        FROM seq a JOIN seq b ON b.user_id = a.user_id
                            AND b.rn = a.rn + 1
        WHERE a.j <> '{MARKOV_ABSORB}'
    ),
    occ AS (
        SELECT i, CAST(COUNT(*) AS BIGINT) AS occ FROM (
            SELECT 'start' AS i FROM seq WHERE rn = 1
            UNION ALL
            SELECT j FROM seq WHERE j <> '{MARKOV_ABSORB}'
        ) GROUP BY i
    ),
    c AS (
        SELECT i, j, CAST(COUNT(*) AS BIGINT) AS n
        FROM pairs GROUP BY i, j
    ),
    bvec AS (
        SELECT occ.i,
               COALESCE(CAST(ROUND(1000000.0 * c.n / occ.occ, 0)
                             AS BIGINT), 0) AS b
        FROM occ LEFT JOIN c ON c.i = occ.i
                            AND c.j = '{MARKOV_ABSORB}'
    ),
    q AS (
        SELECT c.i, c.j,
               CAST(ROUND(1000000.0 * c.n / occ.occ, 0) AS BIGINT)
                   AS qm
        FROM c JOIN occ ON occ.i = c.i
        WHERE c.j <> '{MARKOV_ABSORB}'
    ),
    chans AS (
        SELECT DISTINCT i AS ch FROM occ WHERE i <> 'start'
    ),
    scen AS (
        SELECT 'base' AS s FROM (SELECT 1)
        UNION ALL SELECT ch FROM chans
    ),
    ss AS (
        SELECT scen.s, occ.i FROM scen JOIN occ ON occ.i <> scen.s
    ),
    sq AS (
        SELECT scen.s, q.i, q.j, q.qm
        FROM scen JOIN q ON q.i <> scen.s AND q.j <> scen.s
    ),
    sb AS (
        SELECT ss.s, ss.i, bvec.b
        FROM ss JOIN bvec ON bvec.i = ss.i
    ),
    p0 AS (SELECT s, i, CAST(0 AS BIGINT) AS p FROM ss)"""
    steps = []
    for t in range(1, MARKOV_ATTR_T + 1):
        steps.append(f"""
    p{t} AS MATERIALIZED (
        SELECT sb.s, sb.i,
               sb.b + COALESCE(CAST(ROUND(SUM(sq.qm * pp.p)
                                          / 1000000.0, 0) AS BIGINT),
                               0) AS p
        FROM sb
        LEFT JOIN sq ON sq.s = sb.s AND sq.i = sb.i
        LEFT JOIN p{t-1} pp ON pp.s = sq.s AND pp.i = sq.j
        GROUP BY sb.s, sb.i, sb.b
    )""")
    return (head + "," + ",".join(steps) + f"""
    , conv AS (
        SELECT s, p AS pm FROM p{MARKOV_ATTR_T} WHERE i = 'start'
    ),
    base AS (SELECT pm AS pb FROM conv WHERE s = 'base'),
    eff AS (
        SELECT c2.s, c2.pm,
               CASE WHEN c2.s = 'base' THEN NULL
                    ELSE base.pb - c2.pm END AS drop_
        FROM conv c2 CROSS JOIN base
    ),
    tot AS (
        SELECT CAST(SUM(drop_) AS BIGINT) AS te FROM eff
        WHERE drop_ IS NOT NULL
    )
    SELECT eff.s AS scenario, eff.pm AS p_start_micro,
           ROUND(eff.pm / 1000000.0, 6) AS conv_prob,
           ROUND(CAST(eff.drop_ AS DOUBLE) / base.pb, 6)
               AS removal_effect,
           ROUND(CAST(eff.drop_ AS DOUBLE) / NULLIF(tot.te, 0), 6)
               AS attribution_share
    FROM eff CROSS JOIN base CROSS JOIN tot
    ORDER BY scenario
    """)


@register(
    "markov_removal_attribution",
    _markov_attr_oracle(),
    doc=f"X196 Markov removal-effect attribution: start->channel->"
        f"purchase chain from one corpus pass, absorption probability "
        f"via a scenario-keyed truncated fixed point p=b+Q'p "
        f"({MARKOV_ATTR_T} rounds, integer micro grid), each channel's "
        "credit = its relative conversion drop when removed "
        "(transitions into it become exits, no renormalization); "
        "baseline + per-channel shares; generated chained-CTE oracle.",
    tags=("X196", "X185", "X124", "X71", "X57"),
)
def markov_removal_attribution(spark: SparkSession,
                               sf_dir: str) -> DataFrame:
    from ..caching import persist_tracked

    ev = _ev(spark, sf_dir)
    wseq = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = persist_tracked(
        ev.select("user_id", F.col("event_type").alias("j"),
                  F.row_number().over(wseq).alias("rn")))
    firsts = seq.filter("rn = 1").select(F.lit("start").alias("i"),
                                         "j")
    nxt = (seq.alias("a")
           .join(seq.alias("b"),
                 (F.col("b.user_id") == F.col("a.user_id"))
                 & (F.col("b.rn") == F.col("a.rn") + 1))
           .filter(F.col("a.j") != MARKOV_ABSORB)
           .select(F.col("a.j").alias("i"), F.col("b.j").alias("j")))
    pairs = firsts.unionByName(nxt)
    occ = persist_tracked(
        firsts.select("i")
        .unionByName(seq.filter(F.col("j") != MARKOV_ABSORB)
                     .select(F.col("j").alias("i")))
        .groupBy("i").agg(F.count("*").cast("long").alias("occ")))
    c = persist_tracked(
        pairs.groupBy("i", "j").agg(F.count("*").cast("long")
                                    .alias("n")))
    bvec = (occ.join(c.filter(F.col("j") == MARKOV_ABSORB)
                     .select("i", "n"), "i", "left")
            .select("i", F.coalesce(
                F.round(F.lit(1000000.0) * F.col("n") / F.col("occ"),
                        0).cast("long"), F.lit(0)).alias("b")))
    q = (c.filter(F.col("j") != MARKOV_ABSORB)
         .join(occ, "i")
         .select("i", "j",
                 F.round(F.lit(1000000.0) * F.col("n") / F.col("occ"),
                         0).cast("long").alias("qm")))
    chans = occ.filter(F.col("i") != "start") \
        .select(F.col("i").alias("s"))
    # Repartition every alphabet-sized input to ONE partition BEFORE
    # the crossJoins: cartesian partitioning is left x right, so two
    # shuffled frames (64 x 32) would spawn thousands of near-empty
    # tasks — and a trailing coalesce(1) would then execute them all
    # SERIALLY inside one task (measured: 177s to build three
    # <100-row frames; 1x1 partitioning builds them in <1s).
    scen = chans.unionByName(
        spark.createDataFrame([("base",)], "s STRING")).repartition(1)
    occ1 = occ.select("i").repartition(1)
    q1 = q.select(F.col("i").alias("qi"), F.col("j").alias("qj"),
                  "qm").repartition(1)
    ss = persist_tracked(
        scen.crossJoin(occ1)
        .filter(F.col("i") != F.col("s")))
    sq = persist_tracked(
        scen.crossJoin(q1)
        .filter((F.col("qi") != F.col("s"))
                & (F.col("qj") != F.col("s"))))
    sb = persist_tracked(ss.join(F.broadcast(bvec), "i")
                         .select("s", "i", "b"))
    p = ss.select("s", "i", F.lit(0).cast("long").alias("p")) \
        .coalesce(1).localCheckpoint()
    for _ in range(MARKOV_ATTR_T):
        contrib = (sq.join(p.select(F.col("s").alias("ps"),
                                    F.col("i").alias("qj2"),
                                    F.col("p").alias("pj")),
                           (F.col("ps") == F.col("s"))
                           & (F.col("qj2") == F.col("qj")))
                   .groupBy(F.col("s"), F.col("qi").alias("i"))
                   .agg(F.round(F.sum(F.col("qm") * F.col("pj"))
                                / 1000000.0, 0).cast("long")
                        .alias("add")))
        p = (sb.join(contrib, ["s", "i"], "left")
             .select("s", "i",
                     (F.col("b") + F.coalesce("add", F.lit(0)))
                     .alias("p"))
             .coalesce(1).localCheckpoint())
    conv = p.filter(F.col("i") == "start").select("s", F.col("p")
                                                  .alias("pm"))
    base = conv.filter(F.col("s") == "base") \
        .select(F.col("pm").alias("pb"))
    eff = (conv.crossJoin(F.broadcast(base))
           .select("s", "pm", "pb",
                   F.when(F.col("s") == "base", F.lit(None))
                   .otherwise(F.col("pb") - F.col("pm"))
                   .alias("drop_")))
    eff = persist_tracked(eff)
    tot = eff.agg(F.sum("drop_").cast("long").alias("te"))
    return (eff.crossJoin(F.broadcast(tot)).select(
        F.col("s").alias("scenario"),
        F.col("pm").alias("p_start_micro"),
        F.round(F.col("pm") / 1000000.0, 6).alias("conv_prob"),
        F.round(F.col("drop_").cast("double") / F.col("pb"), 6)
        .alias("removal_effect"),
        F.round(F.col("drop_").cast("double")
                / F.nullif(F.col("te"), F.lit(0)), 6)
        .alias("attribution_share"))
        .orderBy("scenario"))


# --------------------------------------------------------------------------
# X197: off-policy evaluation (IPS / SNIPS) — the counterfactual
# question every recommender/ranking team asks of logged data:
# "what WOULD policy pi have earned?" Logged bandit feedback is
# constructed deterministically (each event was 'shown' arm
# md5(event_id) % 5 under the uniform logging policy, reward =
# micro value iff the shown arm equals the event's own type), so
# propensities are the exact rational 1/5 and the inverse-propensity
# weight is the INTEGER 5 — IPS and self-normalized SNIPS estimates
# are pure BIGINT folds with single final divisions. Because the
# reward function is known, the TRUE value of each target policy is
# also computed exactly, making the estimator's unbiasedness
# directly visible (the law test pins |IPS - truth| inside a
# 5-sigma band and SNIPS's weight identity). Policies evaluated:
# always-purchase, play-own-type (oracle), and an md5 uniform.
# --------------------------------------------------------------------------
OPE_ARMS = 5


@register(
    "offpolicy_ips_eval",
    f"""
    WITH types AS (
        SELECT event_type,
               CAST(DENSE_RANK() OVER (ORDER BY event_type) - 1
                    AS BIGINT) AS idx
        FROM (SELECT DISTINCT event_type FROM events)
    ),
    base AS (
        SELECT e.event_id, t.idx AS own,
               CAST(ROUND(e.value * 1000000, 0) AS BIGINT) AS vmicro,
               ('0x' || substr(md5('log:' || e.event_id), 1, 15))
                   ::BIGINT % {OPE_ARMS} AS a_log,
               ('0x' || substr(md5('tgt:' || e.event_id), 1, 15))
                   ::BIGINT % {OPE_ARMS} AS a_rand,
               (SELECT idx FROM types WHERE event_type = 'purchase')
                   AS a_purch
        FROM events e JOIN types t ON t.event_type = e.event_type
    ),
    logged AS (
        SELECT *,
               CASE WHEN a_log = own THEN vmicro ELSE 0 END AS r_log
        FROM base
    ),
    pol AS (
        SELECT 'always_purchase' AS policy, event_id, own, vmicro,
               a_log, r_log, a_purch AS a_pi
        FROM logged
        UNION ALL
        SELECT 'play_own_type', event_id, own, vmicro, a_log, r_log,
               own
        FROM logged
        UNION ALL
        SELECT 'uniform_md5', event_id, own, vmicro, a_log, r_log,
               a_rand
        FROM logged
    )
    SELECT policy,
           CAST(COUNT(*) AS BIGINT) AS n_logs,
           CAST(SUM(CASE WHEN a_pi = a_log THEN 1 ELSE 0 END)
                AS BIGINT) AS n_matched,
           ROUND(CAST({OPE_ARMS} * SUM(CASE WHEN a_pi = a_log
                                  THEN r_log ELSE 0 END) AS DOUBLE)
                 / COUNT(*) / 1000000.0, 6) AS ips_value,
           ROUND(CAST(SUM(CASE WHEN a_pi = a_log THEN r_log ELSE 0
                          END) AS DOUBLE)
                 / NULLIF(SUM(CASE WHEN a_pi = a_log THEN 1 ELSE 0
                              END), 0) / 1000000.0, 6) AS snips_value,
           ROUND(CAST(SUM(CASE WHEN a_pi = own THEN vmicro ELSE 0
                          END) AS DOUBLE)
                 / COUNT(*) / 1000000.0, 6) AS true_value
    FROM pol GROUP BY policy
    ORDER BY policy
    """,
    doc=f"X197 off-policy evaluation: uniform md5 logging policy over "
        f"{OPE_ARMS} arms (propensity exactly 1/{OPE_ARMS} -> integer "
        "IPS weights), rewards in exact micro units, IPS and SNIPS "
        "as BIGINT folds with single divisions; the known reward "
        "function also yields each policy's TRUE value, so estimator "
        "bias is directly measurable.",
    tags=("X197", "X56", "X103", "X7"),
)
def offpolicy_ips_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..caching import persist_tracked

    ev = _ev(spark, sf_dir)
    types = (ev.select("event_type").distinct()
             .withColumn("idx", (F.dense_rank().over(
                 Window.orderBy("event_type")) - 1).cast("long")))
    purch = types.filter(F.col("event_type") == MARKOV_ABSORB) \
        .select(F.col("idx").alias("a_purch"))

    def h60(salt):
        return F.conv(F.substring(F.md5(F.concat(
            F.lit(salt), F.col("event_id").cast("string"))),
            1, 15), 16, 10).cast("long")

    base = persist_tracked(
        ev.join(F.broadcast(types), "event_type")
        .crossJoin(F.broadcast(purch))
        .select(F.col("idx").alias("own"),
                F.round(F.col("value") * 1000000, 0).cast("long")
                .alias("vmicro"),
                (h60("log:") % OPE_ARMS).alias("a_log"),
                (h60("tgt:") % OPE_ARMS).alias("a_rand"),
                "a_purch"))
    logged = base.withColumn(
        "r_log", F.when(F.col("a_log") == F.col("own"),
                        F.col("vmicro")).otherwise(0))
    pol = None
    for name, col in [("always_purchase", "a_purch"),
                      ("play_own_type", "own"),
                      ("uniform_md5", "a_rand")]:
        p = logged.select(F.lit(name).alias("policy"), "own",
                          "vmicro", "a_log", "r_log",
                          F.col(col).alias("a_pi"))
        pol = p if pol is None else pol.unionByName(p)
    match = F.when(F.col("a_pi") == F.col("a_log"), 1).otherwise(0)
    mr = F.when(F.col("a_pi") == F.col("a_log"),
                F.col("r_log")).otherwise(0)
    tr = F.when(F.col("a_pi") == F.col("own"),
                F.col("vmicro")).otherwise(0)
    return (pol.groupBy("policy")
            .agg(F.count("*").cast("long").alias("n_logs"),
                 F.sum(match).cast("long").alias("n_matched"),
                 F.round((OPE_ARMS * F.sum(mr)).cast("double")
                         / F.count("*") / 1e6, 6).alias("ips_value"),
                 F.round(F.sum(mr).cast("double")
                         / F.nullif(F.sum(match).cast("long"),
                                    F.lit(0)) / 1e6, 6)
                 .alias("snips_value"),
                 F.round(F.sum(tr).cast("double") / F.count("*")
                         / 1e6, 6).alias("true_value"))
            .orderBy("policy"))


# --------------------------------------------------------------------------
# X199: UCB1 bandit replay — offline replay of an ONLINE learning
# policy (the standard way to evaluate a bandit algorithm on logged
# data, complementing X197's static-policy IPS): arms are event
# types, epochs are 3-day windows, an epoch's arm reward is its mean
# event value in exact micro units. The replay is the textbook UCB1:
# first |arms| epochs initialize round-robin (alphabetical), then
# each epoch plays argmax(mean + sqrt(2 ln t / n)) — ln t comes from
# a Python-precomputed micro table inlined into BOTH engines (the
# X99/X103 irrational-constant rule), means are single divisions of
# exact BIGINTs, the bonus is one correctly-rounded sqrt of
# identical doubles snapped to micro, so every argmax is an integer
# comparison (arm-name ties). State is |arms| rows; epochs are
# calendar-bounded (10), each one tiny join — the oracle replays all
# of them as generated MATERIALIZED CTEs. Cumulative regret is
# reported against the hindsight-best fixed arm.
# --------------------------------------------------------------------------
UCB_EPOCH_DAYS = 3
UCB_EPOCHS = 10
# round(ln(t) * 1e6) for t = 1..UCB_EPOCHS, precomputed in Python
UCB_LN_MICRO = (0, 693147, 1098612, 1386294, 1609438,
                1791759, 1945910, 2079442, 2197225, 2302585)


def _ucb_oracle() -> str:
    ln_rows = ", ".join(f"({t}, {v})"
                        for t, v in enumerate(UCB_LN_MICRO, start=1))
    head = f"""
    WITH ev AS (
        SELECT event_type AS arm,
               CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT)
                   AS d,
               CAST(ROUND(value * 1000000, 0) AS BIGINT) AS vm
        FROM events
    ),
    m AS (SELECT MIN(d) AS d0 FROM ev),
    wr AS MATERIALIZED (
        SELECT arm, (d - m.d0) // {UCB_EPOCH_DAYS} + 1 AS t,
               CAST(ROUND(CAST(SUM(vm) AS DOUBLE) / COUNT(*), 0)
                    AS BIGINT) AS r
        FROM ev CROSS JOIN m GROUP BY arm, (d - m.d0)
                                           // {UCB_EPOCH_DAYS} + 1
    ),
    arms AS MATERIALIZED (
        SELECT arm, ROW_NUMBER() OVER (ORDER BY arm) AS ai
        FROM (SELECT DISTINCT arm FROM wr)
    ),
    na AS (SELECT CAST(COUNT(*) AS BIGINT) AS k FROM arms),
    lnt(t, lnm) AS (VALUES {ln_rows}),
    s0 AS (SELECT arm, CAST(0 AS BIGINT) AS n, CAST(0 AS BIGINT)
               AS sm FROM arms)"""
    steps = []
    for t in range(1, UCB_EPOCHS + 1):
        steps.append(f"""
    pick{t} AS MATERIALIZED (
        SELECT arm FROM (
            SELECT s.arm,
                   ROW_NUMBER() OVER (ORDER BY
                       CASE WHEN (SELECT k FROM na) >= {t}
                            THEN CASE WHEN a.ai = {t} THEN 0 ELSE 1 END
                            WHEN s.n = 0 THEN 0
                            ELSE 1 END,
                       CASE WHEN s.n = 0 THEN 0
                            ELSE -((s.sm // s.n)
                                   + CAST(ROUND(SQRT(
                                       2.0 * (SELECT lnm FROM lnt
                                              WHERE t = {t})
                                       / 1000000.0 / s.n) * 1000000,
                                       0) AS BIGINT)) END,
                       s.arm) AS rn
            FROM s{t-1} s JOIN arms a ON a.arm = s.arm
        ) WHERE rn = 1
    ),
    obs{t} AS MATERIALIZED (
        SELECT p.arm, COALESCE(wr.r, 0) AS r
        FROM pick{t} p LEFT JOIN wr ON wr.arm = p.arm AND wr.t = {t}
    ),
    s{t} AS MATERIALIZED (
        SELECT s.arm,
               s.n + CASE WHEN o.arm IS NULL THEN 0 ELSE 1 END AS n,
               s.sm + COALESCE(o.r, 0) AS sm
        FROM s{t-1} s LEFT JOIN obs{t} o ON o.arm = s.arm
    )""")
    plays = " UNION ALL ".join(
        f"SELECT {t} AS t, arm, r FROM obs{t}"
        for t in range(1, UCB_EPOCHS + 1))
    return (head + "," + ",".join(steps) + f"""
    , plays AS (SELECT * FROM ({plays})),
    best AS (
        SELECT arm FROM (
            SELECT wr.arm, SUM(wr.r) AS tot
            FROM wr WHERE wr.t <= {UCB_EPOCHS} GROUP BY wr.arm
            ORDER BY tot DESC, arm LIMIT 1
        )
    )
    SELECT p.t AS epoch, p.arm AS played, p.r AS reward_micro,
           COALESCE(bw.r, 0) AS best_reward_micro,
           CAST(SUM(COALESCE(bw.r, 0) - p.r)
                OVER (ORDER BY p.t) AS BIGINT) AS cum_regret_micro
    FROM plays p
    CROSS JOIN best b
    LEFT JOIN wr bw ON bw.arm = b.arm AND bw.t = p.t
    ORDER BY epoch
    """)


@register(
    "ucb_bandit_replay",
    _ucb_oracle(),
    doc=f"X199 UCB1 replay over {UCB_EPOCHS} {UCB_EPOCH_DAYS}-day "
        "epochs: round-robin init then argmax(mean + sqrt(2 ln t / "
        "n)) with ln t from an inlined Python micro table, means as "
        "integer divisions, bonuses one correctly-rounded sqrt "
        "snapped to micro — every decision an integer argmax "
        "(arm-name ties); cumulative regret vs the hindsight-best "
        "fixed arm; state frames are arm-alphabet-sized.",
    tags=("X199", "X197", "X56", "X12"),
)
def ucb_bandit_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..caching import persist_tracked

    ev = _ev(spark, sf_dir).select(
        F.col("event_type").alias("arm"),
        F.datediff(F.to_date("ts"), F.lit("1970-01-01").cast("date"))
        .cast("long").alias("d"),
        F.round(F.col("value") * 1000000, 0).cast("long").alias("vm"))
    m = ev.agg(F.min("d").alias("d0"))
    wr = persist_tracked(
        ev.crossJoin(F.broadcast(m))
        .groupBy("arm",
                 (F.expr(f"(d - d0) DIV {UCB_EPOCH_DAYS}") + 1)
                 .alias("t"))
        .agg(F.round(F.sum("vm").cast("double") / F.count("*"), 0)
             .cast("long").alias("r"))
        .repartition(1))
    arms = persist_tracked(
        wr.select("arm").distinct()
        .withColumn("ai", F.row_number().over(Window.orderBy("arm")))
        .repartition(1))
    k = arms.count()  # arm alphabet size — bounded metadata
    s = arms.select("arm",
                    F.lit(0).cast("long").alias("n"),
                    F.lit(0).cast("long").alias("sm")) \
        .localCheckpoint()
    plays = None
    for t in range(1, UCB_EPOCHS + 1):
        lnm = UCB_LN_MICRO[t - 1]
        if t <= k:
            prio = F.when(F.col("ai") == t, 0).otherwise(1)
        else:
            prio = F.when(F.col("n") == 0, 0).otherwise(1)
        ucb = F.when(F.col("n") == 0, F.lit(0)).otherwise(
            -(F.expr("sm DIV n")
              + F.round(F.sqrt(F.lit(2.0) * F.lit(lnm) / 1e6
                               / F.col("n")) * 1e6, 0).cast("long")))
        pick = (s.join(arms.select("arm", "ai"), "arm")
                .withColumn("rn", F.row_number().over(
                    Window.orderBy(prio, ucb, F.asc("arm"))))
                .filter("rn = 1").select("arm"))
        obs = (pick.join(wr.filter(F.col("t") == t)
                         .select("arm", "r"), "arm", "left")
               .select("arm", F.coalesce("r", F.lit(0)).alias("r"))
               .localCheckpoint())
        row = obs.select(F.lit(t).cast("long").alias("epoch"),
                         F.col("arm").alias("played"),
                         F.col("r").alias("reward_micro"))
        plays = row if plays is None else plays.unionByName(row)
        s = (s.join(obs.select(F.col("arm").alias("oarm"), "r"),
                    s.arm == F.col("oarm"), "left")
             .select("arm",
                     (F.col("n") + F.when(F.col("oarm").isNull(), 0)
                      .otherwise(1)).alias("n"),
                     (F.col("sm") + F.coalesce("r", F.lit(0)))
                     .alias("sm"))
             .localCheckpoint())
    best = (wr.filter(F.col("t") <= UCB_EPOCHS)
            .groupBy("arm").agg(F.sum("r").alias("tot"))
            .orderBy(F.desc("tot"), F.asc("arm")).limit(1)
            .select(F.col("arm").alias("barm")))
    wcum = Window.orderBy("epoch").rowsBetween(
        Window.unboundedPreceding, 0)
    return (plays.crossJoin(F.broadcast(best))
            .join(wr.select(F.col("arm").alias("barm"),
                            F.col("t").alias("epoch"),
                            F.col("r").alias("br")),
                  ["barm", "epoch"], "left")
            .select("epoch", "played", "reward_micro",
                    F.coalesce("br", F.lit(0))
                    .alias("best_reward_micro"))
            .withColumn("cum_regret_micro",
                        F.sum(F.col("best_reward_micro")
                              - F.col("reward_micro")).over(wcum)
                        .cast("long"))
            .orderBy("epoch"))


# --------------------------------------------------------------------------
# X208: Viterbi decoding — max-likelihood hidden-state inference for a
# fixed 2-state HMM over each user's event sequence (the
# sessionization-with-semantics primitive: casual vs engaged browsing
# phases). Max-plus algebra over integer micro-log2 probabilities
# (Python-precomputed constants inlined into BOTH engines, the X160
# table pattern) makes the whole DP exact: no exp, no logsumexp, no
# floats anywhere. ONE shuffle per user: collect_list sorted by
# (ts, event_id) -> F.aggregate left fold carrying the 2-score state;
# the oracle replays the identical fold with DuckDB list_reduce. The
# uniform init term (log 0.5 per state) shifts every score equally
# and is dropped on both sides.
# --------------------------------------------------------------------------
def _l2micro(p: float) -> int:
    import math
    return round(math.log2(p) * 1000000)


_HMM_EMIT = {  # event_type -> (state0 "casual", state1 "engaged")
    "view": (0.35, 0.20),
    "click": (0.30, 0.25),
    "error": (0.15, 0.10),
    "signup": (0.15, 0.10),
    "purchase": (0.05, 0.35),
}
_HMM_STAY, _HMM_SWITCH = 0.75, 0.25


def _hmm_case(state: int, var: str) -> str:
    """Shared CASE expression mapping event_type -> micro emission."""
    whens = " ".join(
        f"WHEN '{et}' THEN {_l2micro(ps[state])}"
        for et, ps in sorted(_HMM_EMIT.items()))
    return f"CASE {var} {whens} ELSE -20000000 END"


@register(
    "viterbi_state_decode",
    f"""
    WITH seq AS (
        SELECT user_id,
               list(struct_pack(
                        v0 := {_hmm_case(0, 'event_type')},
                        v1 := {_hmm_case(1, 'event_type')})
                    ORDER BY ts, event_id) AS em
        FROM events GROUP BY user_id
    ),
    folded AS (
        SELECT user_id, len(em) AS n,
               list_reduce(
                   em,
                   (acc, x) -> struct_pack(
                       v0 := x.v0 + greatest(
                           acc.v0 + {_l2micro(_HMM_STAY)},
                           acc.v1 + {_l2micro(_HMM_SWITCH)}),
                       v1 := x.v1 + greatest(
                           acc.v0 + {_l2micro(_HMM_SWITCH)},
                           acc.v1 + {_l2micro(_HMM_STAY)}))) AS v
        FROM seq
    )
    SELECT user_id, CAST(n AS BIGINT) AS n_events,
           CAST(greatest(v.v0, v.v1) AS BIGINT) AS viterbi_micro,
           CAST(CASE WHEN v.v1 > v.v0 THEN 1 ELSE 0 END
                AS BIGINT) AS end_state
    FROM folded
    """,
    doc="X208 Viterbi decoding of a fixed 2-state HMM (casual/engaged) "
        "over per-user event sequences: exact max-plus DP on integer "
        "micro-log2 emissions/transitions (shared Python-precomputed "
        "constants), one collect_list+fold per user — no per-step "
        "joins, no floats. Output: per-user sequence length, best "
        "path score, decoded end state. Python-replay law-tested.",
    tags=("X208", "X14", "X11", "X57"),
)
def viterbi_state_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _ev(spark, sf_dir).select("user_id", "ts", "event_id",
                                   "event_type")
    stay, sw = _l2micro(_HMM_STAY), _l2micro(_HMM_SWITCH)
    e0c, e1c = _hmm_case(0, "x.et"), _hmm_case(1, "x.et")
    seq = (ev.groupBy("user_id")
           .agg(F.array_sort(F.collect_list(
               F.struct("ts", "event_id", "event_type"))).alias("evs"))
           .select(
               "user_id",
               F.expr(f"""transform(evs, x -> named_struct(
                   'v0', CAST({e0c.replace('x.et', 'x.event_type')}
                              AS BIGINT),
                   'v1', CAST({e1c.replace('x.et', 'x.event_type')}
                              AS BIGINT)))""").alias("em")))
    folded = seq.select(
        "user_id",
        F.size("em").cast("long").alias("n_events"),
        F.expr(f"""aggregate(
            slice(em, 2, greatest(size(em) - 1, 0)),
            named_struct('v0', em[0].v0, 'v1', em[0].v1),
            (acc, x) -> named_struct(
                'v0', x.v0 + greatest(acc.v0 + {stay}L,
                                      acc.v1 + {sw}L),
                'v1', x.v1 + greatest(acc.v0 + {sw}L,
                                      acc.v1 + {stay}L)))""").alias("v"))
    return folded.select(
        "user_id", "n_events",
        F.greatest("v.v0", "v.v1").cast("long").alias("viterbi_micro"),
        F.when(F.col("v.v1") > F.col("v.v0"), 1).otherwise(0)
        .cast("long").alias("end_state"))


# --------------------------------------------------------------------------
# X209: Holt linear-trend exponential smoothing — the forecasting
# recurrence (level + trend, alpha=1/2, beta=1/4) a naive/seasonal
# baseline (X130) can't express. The recurrence is order-dependent,
# so both engines run the IDENTICAL left fold over the day-ordered
# series; dyadic smoothing weights make every step one exact integer
# floor-division, snapped via the subtract-pmod identity
# fdiv(a, d) = (a - ((a % d) + d) % d) DIV d, which is exact for
# NEGATIVE trend values too (Spark DIV truncates, DuckDB // floors —
# the divisible numerator makes them agree). The series is
# calendar-bounded, so the fold state is ~30 elements at ANY data
# scale; the daily aggregate underneath is the only data-sized pass.
# --------------------------------------------------------------------------
def _fdiv(a: str, d: int) -> str:
    return f"(({a}) - ((({a}) % {d}) + {d}) % {d}) DIV {d}"


def _fdiv_duck(a: str, d: int) -> str:
    return f"(({a}) - ((({a}) % {d}) + {d}) % {d}) // {d}"


@register(
    "holt_linear_daily",
    f"""
    WITH RECURSIVE daily AS (
        SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
               CAST(COUNT(*) AS BIGINT) * 1000000 AS xm
        FROM events GROUP BY 1
    ),
    idx AS (
        SELECT day, xm, ROW_NUMBER() OVER (ORDER BY day) AS rn
        FROM daily
    ),
    -- sequential recurrence as a recursive CTE (DuckDB 1.0
    -- list_reduce lambdas mis-evaluate repeated subexpressions
    -- across struct fields, so the fold form is off-limits here)
    hw(rn, day, xm, l, b, err) AS (
        SELECT rn, day, xm, xm, CAST(0 AS BIGINT), CAST(NULL AS BIGINT)
        FROM idx WHERE rn = 1
        UNION ALL
        SELECT i.rn, i.day, i.xm,
               ((i.xm + h.l + h.b) - (((i.xm + h.l + h.b) % 2) + 2) % 2) // 2,
               ((((i.xm + h.l + h.b) - (((i.xm + h.l + h.b) % 2) + 2) % 2) // 2 - h.l + 3 * h.b) - (((((i.xm + h.l + h.b) - (((i.xm + h.l + h.b) % 2) + 2) % 2) // 2 - h.l + 3 * h.b) % 4) + 4) % 4) // 4,
               i.xm - (h.l + h.b)
        FROM hw h JOIN idx i ON i.rn = h.rn + 1
    )
    SELECT day, CAST(xm // 1000000 AS BIGINT) AS n,
           CAST(l AS BIGINT) AS level_micro,
           CAST(b AS BIGINT) AS trend_micro,
           CAST(err AS BIGINT) AS err_micro
    FROM hw WHERE rn >= 2
    """,
    doc="X209 Holt linear-trend smoothing (alpha=1/2, beta=1/4) of the "
        "daily event series: level/trend recurrence as one exact "
        "integer fold (dyadic weights -> floor divisions via the "
        "subtract-pmod identity, negative-trend-safe cross-engine); "
        "Spark runs it as ONE aggregate-HOF fold, the oracle as a "
        "recursive CTE (DuckDB 1.0 list_reduce lambdas mis-evaluate "
        "repeated struct-field subexpressions); per-day level, trend "
        "and one-step forecast error in micro units. Fold state is "
        "calendar-bounded (~30 steps) at any data scale; the daily "
        "aggregate is the only data pass.",
    tags=("X209", "X130", "X14", "X7", "X49"),
)
def holt_linear_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _ev(spark, sf_dir)
    daily = (ev.groupBy(F.date_trunc("day", "ts").cast("date")
                        .alias("day"))
             .agg((F.count("*") * 1000000).cast("long").alias("xm")))
    l2 = _fdiv("e.x + acc.l + acc.b", 2)
    b2 = _fdiv(f"{l2} - acc.l + 3 * acc.b", 4)
    arr = daily.agg(F.array_sort(F.collect_list(
        F.struct("day", "xm"))).alias("ds"))
    folded = arr.select(F.expr(f"""aggregate(
        slice(ds, 2, greatest(size(ds) - 1, 0)),
        named_struct(
            'd', ds[0].day, 'x', ds[0].xm, 'l', ds[0].xm,
            'b', CAST(0 AS BIGINT),
            'out', CAST(array() AS ARRAY<STRUCT<
                day DATE, n BIGINT, level_micro BIGINT,
                trend_micro BIGINT, err_micro BIGINT>>)),
        (acc, ee) -> named_struct(
            'd', ee.day, 'x', ee.xm,
            'l', CAST({l2.replace('e.x', 'ee.xm')} AS BIGINT),
            'b', CAST({b2.replace('e.x', 'ee.xm')} AS BIGINT),
            'out', array_append(acc.out, named_struct(
                'day', ee.day,
                'n', ee.xm DIV 1000000,
                'level_micro',
                    CAST({l2.replace('e.x', 'ee.xm')} AS BIGINT),
                'trend_micro',
                    CAST({b2.replace('e.x', 'ee.xm')} AS BIGINT),
                'err_micro', ee.xm - (acc.l + acc.b)))))""").alias("v"))
    return (folded.select(F.explode("v.out").alias("u"))
            .select("u.day", "u.n", "u.level_micro", "u.trend_micro",
                    "u.err_micro"))


# --------------------------------------------------------------------------
# X210: SAX symbolic aggregate approximation — the symbolic index for
# time-series motif/novelty search (Lin et al.): PAA-compress the
# daily series into fixed-width segments, discretize each segment into
# an alphabet symbol, read off sliding words. The classic breakpoints
# are Gaussian quantiles of a z-normalized series (floats); this uses
# the RANK-based equivalent — symbol = quartile of the PAA value's
# rank, sym = ((rank-1)*4) DIV n_segments — so the whole pipeline is
# integer/string exact in both engines. Words repeat => motifs.
# --------------------------------------------------------------------------
SAX_SEG_DAYS = 2
SAX_WORD = 3


@register(
    "sax_daily_words",
    f"""
    WITH daily AS (
        SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM events GROUP BY 1
    ),
    idx AS (
        SELECT day, n, ROW_NUMBER() OVER (ORDER BY day) - 1 AS rn
        FROM daily
    ),
    paa AS (
        SELECT rn // {SAX_SEG_DAYS} AS seg,
               CAST(SUM(n) AS BIGINT) AS v,
               MIN(day) AS seg_start,
               COUNT(*) AS width
        FROM idx GROUP BY 1
        HAVING COUNT(*) = {SAX_SEG_DAYS}
    ),
    sym AS (
        SELECT seg, seg_start, v,
               ((ROW_NUMBER() OVER (ORDER BY v, seg) - 1) * 4)
                   // (SELECT COUNT(*) FROM paa) AS s
        FROM paa
    ),
    words AS (
        SELECT s1.seg,
               s1.seg_start,
               chr(97 + CAST(s1.s AS INT)) || chr(97 + CAST(s2.s AS INT))
                   || chr(97 + CAST(s3.s AS INT)) AS word
        FROM sym s1
        JOIN sym s2 ON s2.seg = s1.seg + 1
        JOIN sym s3 ON s3.seg = s1.seg + 2
    )
    SELECT word,
           CAST(COUNT(*) AS BIGINT) AS n_occurrences,
           MIN(seg_start) AS first_seg_start,
           CAST(MIN(seg) AS BIGINT) AS first_seg
    FROM words GROUP BY word
    """,
    doc=f"X210 SAX symbolic words over the daily event series: PAA "
        f"({SAX_SEG_DAYS}-day segment sums), rank-quartile alphabet "
        "(sym = (rank-1)*4 DIV n_segments — the integer-exact stand-in "
        f"for Gaussian breakpoints), sliding {SAX_WORD}-symbol words; "
        "per-word occurrence counts (repeats = motifs). Calendar-"
        "bounded frames everywhere; the daily aggregate is the only "
        "data-sized pass.",
    tags=("X210", "X49", "X11", "X7", "X14"),
)
def sax_daily_words(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _ev(spark, sf_dir)
    daily = (ev.groupBy(F.date_trunc("day", "ts").cast("date")
                        .alias("day"))
             .agg(F.count("*").cast("long").alias("n")))
    idx = daily.select(
        "day", "n",
        (F.row_number().over(Window.orderBy("day")) - 1).alias("rn"))
    paa = (idx.groupBy((F.col("rn") / SAX_SEG_DAYS).cast("long")
                       .alias("seg"))
           .agg(F.sum("n").cast("long").alias("v"),
                F.min("day").alias("seg_start"),
                F.count("*").alias("width"))
           .filter(F.col("width") == SAX_SEG_DAYS))
    nseg = paa.agg(F.count("*").alias("nseg"))
    sym = (paa.crossJoin(F.broadcast(nseg))
           .select("seg", "seg_start", "v",
                   F.expr("((ROW_NUMBER() OVER (ORDER BY v, seg) - 1)"
                          " * 4) DIV nseg").alias("s")))
    w = Window.orderBy("seg")
    words = (sym.select(
        "seg", "seg_start", "s",
        F.lead("s", 1).over(w).alias("s2"),
        F.lead("s", 2).over(w).alias("s3"),
        F.lead("seg", 1).over(w).alias("n1"),
        F.lead("seg", 2).over(w).alias("n2"))
        .filter(F.col("n1") == F.col("seg") + 1)
        .filter(F.col("n2") == F.col("seg") + 2)
        .select("seg", "seg_start",
                F.concat(F.chr(F.col("s") + 97),
                         F.chr(F.col("s2") + 97),
                         F.chr(F.col("s3") + 97)).alias("word")))
    return (words.groupBy("word")
            .agg(F.count("*").cast("long").alias("n_occurrences"),
                 F.min("seg_start").alias("first_seg_start"),
                 F.min("seg").cast("long").alias("first_seg")))


# --------------------------------------------------------------------------
# X211: matrix profile — each sliding window's distance to its nearest
# non-overlapping neighbor (Yeh et al.), THE time-series primitive for
# motif + discord discovery. Distances are exact integer squared
# Euclidean (no z-normalization floats); candidate pairs come from a
# position-aligned equi-join of the exploded window table (k = offset
# in window), so the pair fan-out is calendar^2 * w — volume-
# independent, like X183's candidate frame. Exclusion zone |i-j| >= w.
# --------------------------------------------------------------------------
MP_W = 5


@register(
    "matrix_profile_daily",
    f"""
    WITH daily AS (
        SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM events GROUP BY 1
    ),
    idx AS (
        SELECT day, n, ROW_NUMBER() OVER (ORDER BY day) AS rn
        FROM daily
    ),
    nwin AS (SELECT COUNT(*) - {MP_W} + 1 AS nw FROM idx),
    win AS (
        SELECT w.i, i2.rn - w.i AS k, i2.n, i2.day
        FROM (SELECT rn AS i FROM idx
              WHERE rn <= (SELECT nw FROM nwin)) w
        JOIN idx i2 ON i2.rn >= w.i AND i2.rn < w.i + {MP_W}
    ),
    sed AS (
        SELECT a.i AS i, b.i AS j,
               CAST(SUM((a.n - b.n) * (a.n - b.n)) AS BIGINT) AS d2
        FROM win a JOIN win b ON a.k = b.k
        WHERE b.i >= a.i + {MP_W} OR b.i <= a.i - {MP_W}
        GROUP BY a.i, b.i
    ),
    prof AS (
        SELECT i, j, d2, ROW_NUMBER() OVER (
                   PARTITION BY i ORDER BY d2, j) AS rnk
        FROM sed
    ),
    st AS (SELECT i, MIN(day) AS start_day FROM win GROUP BY i)
    SELECT CAST(p.i AS BIGINT) AS window_i, s.start_day,
           CAST(p.j AS BIGINT) AS nn_j, p.d2 AS sed
    FROM prof p JOIN st s ON s.i = p.i
    WHERE p.rnk = 1
    """,
    doc=f"X211 matrix profile of the daily event series (window w="
        f"{MP_W}, exclusion zone |i-j| >= w): nearest-neighbor exact "
        "integer squared-Euclidean distance per window via a position-"
        "aligned equi-join of the exploded window table — candidate "
        "volume = calendar^2 * w, independent of event volume. Profile "
        "minima = motifs, maxima = discords. Python-replay law-tested.",
    tags=("X211", "X49", "X11", "X7"),
)
def matrix_profile_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..caching import persist_tracked

    ev = _ev(spark, sf_dir)
    daily = (ev.groupBy(F.date_trunc("day", "ts").cast("date")
                        .alias("day"))
             .agg(F.count("*").cast("long").alias("n")))
    idx = persist_tracked(daily.select(
        "day", "n",
        F.row_number().over(Window.orderBy("day")).alias("rn")))
    nw = idx.agg((F.count("*") - MP_W + 1).alias("nw"))
    starts = (idx.crossJoin(F.broadcast(nw))
              .filter(F.col("rn") <= F.col("nw"))
              .select(F.col("rn").alias("i")))
    win = persist_tracked(
        starts.join(idx, (F.col("rn") >= F.col("i"))
                    & (F.col("rn") < F.col("i") + MP_W))
        .select("i", (F.col("rn") - F.col("i")).alias("k"), "n", "day"))
    a = win.select(F.col("i").alias("ai"), "k", F.col("n").alias("an"))
    b = win.select(F.col("i").alias("bi"), "k", F.col("n").alias("bn"))
    sed = (a.join(b, "k")
           .filter((F.col("bi") >= F.col("ai") + MP_W)
                   | (F.col("bi") <= F.col("ai") - MP_W))
           .groupBy("ai", "bi")
           .agg(F.sum((F.col("an") - F.col("bn"))
                      * (F.col("an") - F.col("bn")))
                .cast("long").alias("d2")))
    prof = (sed.withColumn(
                "rnk", F.row_number().over(
                    Window.partitionBy("ai").orderBy("d2", "bi")))
            .filter(F.col("rnk") == 1))
    st = win.groupBy("i").agg(F.min("day").alias("start_day"))
    return (prof.join(st, prof["ai"] == st["i"])
            .select(F.col("ai").cast("long").alias("window_i"),
                    "start_day",
                    F.col("bi").cast("long").alias("nn_j"),
                    "d2")
            .withColumnRenamed("d2", "sed"))


# --------------------------------------------------------------------------
# X213: Cox proportional-hazards score test — the REGRESSION lens on
# time-to-convert that X83's Kaplan-Meier (nonparametric, covariate-
# free) can't give: does click volume associate with conversion
# hazard? The partial-likelihood score at beta=0 (the log-rank family)
# needs only risk-set moments: U = sum_events (x_i - S1/n),
# I = sum_events (n*S2 - S1^2)/n^2, with (n, S1, S2) = suffix sums of
# (1, x, x^2) over the duration-ordered per-time aggregates — one
# descending window, no per-event loop. Breslow tie handling. Every
# term is micro-snapped integer division of non-negative BIGINTs
# (trunc == floor), summed exactly; z^2 = U^2/I is the single final
# float, computed from identical doubles in both engines.
# --------------------------------------------------------------------------
@register(
    "cox_score_click_hazard",
    """
    WITH s AS (SELECT user_id, MIN(epoch_us(ts)) AS s_us
               FROM events WHERE event_type = 'signup' GROUP BY user_id),
    p AS (SELECT e.user_id, MIN(epoch_us(e.ts)) AS p_us
          FROM events e JOIN s ON e.user_id = s.user_id
                            AND epoch_us(e.ts) > s.s_us
          WHERE e.event_type = 'purchase' GROUP BY e.user_id),
    horizon AS (SELECT MAX(epoch_us(ts)) AS h_us FROM events),
    clicks AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS x
               FROM events WHERE event_type = 'click' GROUP BY user_id),
    durs AS (
        SELECT s.user_id,
               CAST(CASE WHEN p.p_us IS NOT NULL
                         THEN (p.p_us - s.s_us) // 3600000000
                         ELSE (h.h_us - s.s_us) // 3600000000 END
                    AS BIGINT) AS t_hours,
               CASE WHEN p.p_us IS NOT NULL THEN 1 ELSE 0 END AS ev,
               COALESCE(c.x, 0) AS x
        FROM s LEFT JOIN p ON s.user_id = p.user_id
        LEFT JOIN clicks c ON s.user_id = c.user_id
        CROSS JOIN horizon h
    ),
    grouped AS (
        SELECT t_hours,
               CAST(SUM(ev) AS BIGINT) AS d,
               CAST(SUM(ev * x) AS BIGINT) AS sx,
               CAST(COUNT(*) AS BIGINT) AS m,
               CAST(SUM(x) AS BIGINT) AS s1g,
               CAST(SUM(x * x) AS BIGINT) AS s2g
        FROM durs GROUP BY t_hours
    ),
    risk AS (
        SELECT t_hours, d, sx,
               CAST(SUM(m) OVER (ORDER BY t_hours DESC) AS BIGINT) AS n,
               CAST(SUM(s1g) OVER (ORDER BY t_hours DESC) AS BIGINT)
                   AS s1,
               CAST(SUM(s2g) OVER (ORDER BY t_hours DESC) AS BIGINT)
                   AS s2
        FROM grouped
    ),
    terms AS (
        SELECT SUM(sx * 1000000 - d * ((s1 * 1000000) // n)) AS u_micro,
               SUM(d * ((1000000 * (n * s2 - s1 * s1)) // (n * n)))
                   AS i_micro
        FROM risk WHERE d > 0
    ),
    counts AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
               CAST(SUM(ev) AS BIGINT) AS n_events,
               CAST(SUM(1 - ev) AS BIGINT) AS n_censored
        FROM durs
    )
    SELECT c.n_users, c.n_events, c.n_censored,
           CAST(t.u_micro AS BIGINT) AS score_micro,
           CAST(t.i_micro AS BIGINT) AS info_micro,
           ROUND((CAST(t.u_micro AS DOUBLE) * CAST(t.u_micro AS DOUBLE))
                 / (CAST(t.i_micro AS DOUBLE) * 1000000.0), 6) AS z2
    FROM counts c, terms t
    """,
    doc="X213 Cox proportional-hazards score test (beta=0, Breslow "
        "ties) of click volume vs time-to-purchase hazard: risk-set "
        "moments (n, S1, S2) as ONE descending suffix-sum window over "
        "per-time aggregates; score and information as micro-snapped "
        "BIGINT folds (non-negative divisions, trunc==floor); z^2 the "
        "single final float from identical doubles. The covariate-"
        "aware counterpart to X83's Kaplan-Meier.",
    tags=("X213", "X83", "X11", "X7"),
)
def cox_score_click_hazard(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..caching import persist_tracked

    ev = _ev(spark, sf_dir)
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    s = persist_tracked(
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id").agg(F.min(us).alias("s_us")))
    p = (ev.filter(F.col("event_type") == "purchase")
         .select("user_id", us.alias("e_us"))
         .join(s, "user_id")
         .filter(F.col("e_us") > F.col("s_us"))
         .groupBy("user_id").agg(F.min("e_us").alias("p_us")))
    clicks = (ev.filter(F.col("event_type") == "click")
              .groupBy("user_id")
              .agg(F.count("*").cast("long").alias("x")))
    horizon = ev.agg(F.max(us).alias("h_us"))
    durs = persist_tracked(
        s.join(p, "user_id", "left")
        .join(clicks, "user_id", "left")
        .crossJoin(F.broadcast(horizon))
        .select(
            "user_id",
            F.expr("CAST(CASE WHEN p_us IS NOT NULL"
                   " THEN (p_us - s_us) DIV 3600000000"
                   " ELSE (h_us - s_us) DIV 3600000000 END AS BIGINT)")
            .alias("t_hours"),
            F.when(F.col("p_us").isNotNull(), 1).otherwise(0)
            .alias("ev"),
            F.coalesce("x", F.lit(0)).cast("long").alias("x")))
    grouped = (durs.groupBy("t_hours")
               .agg(F.sum("ev").cast("long").alias("d"),
                    F.sum(F.col("ev") * F.col("x")).cast("long")
                    .alias("sx"),
                    F.count("*").cast("long").alias("m"),
                    F.sum("x").cast("long").alias("s1g"),
                    F.sum(F.col("x") * F.col("x")).cast("long")
                    .alias("s2g")))
    wd = Window.orderBy(F.desc("t_hours")) \
        .rowsBetween(Window.unboundedPreceding, 0)
    risk = grouped.select(
        "t_hours", "d", "sx",
        F.sum("m").over(wd).cast("long").alias("n"),
        F.sum("s1g").over(wd).cast("long").alias("s1"),
        F.sum("s2g").over(wd).cast("long").alias("s2"))
    terms = (risk.filter(F.col("d") > 0)
             .agg(F.sum(F.col("sx") * 1000000
                        - F.col("d")
                        * F.expr("(s1 * 1000000) DIV n"))
                  .cast("long").alias("u_micro"),
                  F.sum(F.col("d")
                        * F.expr("(1000000 * (n * s2 - s1 * s1))"
                                 " DIV (n * n)"))
                  .cast("long").alias("i_micro")))
    counts = durs.agg(F.count("*").cast("long").alias("n_users"),
                      F.sum("ev").cast("long").alias("n_events"),
                      F.sum(1 - F.col("ev")).cast("long")
                      .alias("n_censored"))
    return (counts.crossJoin(terms)
            .select("n_users", "n_events", "n_censored",
                    F.col("u_micro").alias("score_micro"),
                    F.col("i_micro").alias("info_micro"),
                    F.round((F.col("u_micro").cast("double")
                             * F.col("u_micro").cast("double"))
                            / (F.col("i_micro").cast("double")
                               * F.lit(1000000.0)), 6).alias("z2")))


# --------------------------------------------------------------------------
# X216: Dynamic Time Warping distance (Sakoe-Chiba band) between the
# per-event-type daily series — the alignment-aware series distance
# (X129's KS and X152's CCF compare distributions/fixed lags; DTW
# matches SHAPES under local time shifts). The DP is inherently
# sequential in both matrix dimensions, so this is the repo's
# canonical applyInPandas showcase: one Arrow batch per series pair,
# numpy int64 DP inside (exact squared-difference costs, band cells
# only), never a row-at-a-time Python UDF. The oracle replays the DP
# as an anti-diagonal recursive CTE (each diagonal depends only on
# the previous two — border cells take the min over whichever
# predecessors exist, which IS the INF-border DP). Series are
# calendar x event-type bounded: the DP state is ~30x30 per pair at
# ANY data scale; the daily aggregate is the only data-sized pass.
# --------------------------------------------------------------------------
DTW_BAND = 7


def _dtw_oracle_sql() -> str:
    return f"""
    WITH RECURSIVE daily AS (
        SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM events GROUP BY 1, 2
    ),
    days AS (SELECT DISTINCT day FROM daily),
    types AS (SELECT DISTINCT event_type AS et FROM daily),
    spine AS (
        SELECT t.et, d.day,
               ROW_NUMBER() OVER (PARTITION BY t.et ORDER BY d.day)
                   AS idx,
               COALESCE(x.n, 0) AS n
        FROM types t CROSS JOIN days d
        LEFT JOIN daily x ON x.event_type = t.et AND x.day = d.day
    ),
    costs AS (
        SELECT a.et AS ta, b.et AS tb, a.idx AS i, b.idx AS j,
               (a.n - b.n) * (a.n - b.n) AS c
        FROM spine a JOIN spine b ON a.idx - b.idx BETWEEN
             -{DTW_BAND} AND {DTW_BAND}
        WHERE a.et < b.et
    ),
    dp(it, d, ta, tb, i, j, cost) AS (
        SELECT 1, 2, ta, tb, 1, 1, c FROM costs WHERE i = 1 AND j = 1
        UNION ALL
        (
        SELECT p.it + 1, p.d, p.ta, p.tb, p.i, p.j, p.cost FROM dp p
        WHERE p.it < (SELECT MAX(i + j) FROM costs)
        UNION ALL
        SELECT p.it + 1, p.it + 2, c.ta, c.tb, c.i, c.j,
               c.c + MIN(p.cost)
        FROM dp p JOIN costs c ON c.ta = p.ta AND c.tb = p.tb
          AND c.i + c.j = p.it + 2
          AND ((c.i = p.i + 1 AND c.j = p.j)
            OR (c.i = p.i AND c.j = p.j + 1)
            OR (c.i = p.i + 1 AND c.j = p.j + 1))
        GROUP BY p.it, c.ta, c.tb, c.i, c.j, c.c
        )
    ),
    nmax AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM days)
    SELECT ta, tb, (SELECT n FROM nmax) AS n_days,
           CAST(MIN(cost) AS BIGINT) AS dtw
    FROM dp, nmax
    WHERE i = nmax.n AND j = nmax.n
    GROUP BY ta, tb
    """


@register(
    "dtw_event_type_distance",
    _dtw_oracle_sql(),
    doc=f"X216 banded DTW (Sakoe-Chiba r={DTW_BAND}) between every "
        "pair of per-event-type daily series: exact integer squared-"
        "difference costs; Spark side = ONE applyInPandas Arrow batch "
        "per pair running the numpy int64 DP (the canonical custom-"
        "operator slow path, never row-at-a-time); oracle = anti-"
        "diagonal recursive-CTE DP. Series are calendar-bounded, so "
        "DP state is ~30x30 per pair at any scale.",
    tags=("X216", "X24", "X49", "X7", "X3"),
)
def dtw_event_type_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd

    from ..caching import persist_tracked

    ev = _ev(spark, sf_dir)
    daily = (ev.groupBy("event_type",
                        F.date_trunc("day", "ts").cast("date")
                        .alias("day"))
             .agg(F.count("*").cast("long").alias("n")))
    days = daily.select("day").distinct()
    types = daily.select(F.col("event_type").alias("et")).distinct()
    spine = persist_tracked(
        types.crossJoin(days)
        .join(daily.withColumnRenamed("event_type", "et"),
              ["et", "day"], "left")
        .select("et", "day", F.coalesce("n", F.lit(0)).cast("long")
                .alias("n")))
    a = spine.select(F.col("et").alias("ta"), "day",
                     F.col("n").alias("na"))
    b = spine.select(F.col("et").alias("tb"), "day",
                     F.col("n").alias("nb"))
    pairs = (a.join(b, "day")
             .filter(F.col("ta") < F.col("tb"))
             .select("ta", "tb", "day", "na", "nb"))
    band = DTW_BAND

    def dtw_pair(pdf: "pd.DataFrame") -> "pd.DataFrame":
        import numpy as np
        pdf = pdf.sort_values("day")
        x = pdf["na"].to_numpy(dtype="int64")
        y = pdf["nb"].to_numpy(dtype="int64")
        n = len(x)
        inf = np.int64(1) << 50
        dmat = np.full((n + 1, n + 1), inf, dtype="int64")
        dmat[0, 0] = 0
        for i in range(1, n + 1):
            lo = max(1, i - band)
            hi = min(n, i + band)
            for j in range(lo, hi + 1):
                c = (x[i - 1] - y[j - 1]) ** 2
                best = min(dmat[i - 1, j], dmat[i, j - 1],
                           dmat[i - 1, j - 1])
                dmat[i, j] = c + best
        return pd.DataFrame(
            [[pdf["ta"].iloc[0], pdf["tb"].iloc[0], n,
              int(dmat[n, n])]],
            columns=["ta", "tb", "n_days", "dtw"])

    return pairs.groupBy("ta", "tb").applyInPandas(
        dtw_pair, "ta string, tb string, n_days long, dtw long")


# --------------------------------------------------------------------------
# X221: V-optimal histogram construction — the synopsis every
# cardinality estimator wants (Jagadish et al.): partition the daily
# series into B buckets minimizing total within-bucket SSE, solved
# EXACTLY by DP over interval costs. sse_micro(i,j) =
# (1e6*(m*S2 - S1^2)) DIV m is a non-negative integer from prefix
# sums; the DP table is (B x calendar) — volume-independent like
# X211's window table. Argmin ties break to the smallest split, so
# the bucket layout itself (not just the cost) is deterministic and
# hash-checked after an exact backtrack.
# --------------------------------------------------------------------------
VOPT_B = 5


def _vopt_oracle_sql() -> str:
    parts = ["""daily AS (
        SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
               CAST(COUNT(*) AS BIGINT) AS x
        FROM events GROUP BY 1
    ),
    idx AS (
        SELECT day, x, ROW_NUMBER() OVER (ORDER BY day) AS rn
        FROM daily
    ),
    nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM idx),
    iv AS (
        SELECT a.rn AS i, b.rn AS j,
               (b.rn - a.rn + 1) AS m,
               CAST(SUM(c.x) AS BIGINT) AS s1,
               CAST(SUM(c.x * c.x) AS BIGINT) AS s2
        FROM idx a JOIN idx b ON b.rn >= a.rn
        JOIN idx c ON c.rn BETWEEN a.rn AND b.rn
        GROUP BY a.rn, b.rn
    ),
    sse AS (
        SELECT i, j,
               (1000000 * (m * s2 - s1 * s1)) // m AS c
        FROM iv
    ),
    d1 AS (
        SELECT j, c AS cost, CAST(0 AS BIGINT) AS arg
        FROM sse WHERE i = 1
    )"""]
    for b in range(2, VOPT_B + 1):
        parts.append(f"""d{b} AS (
        SELECT j, cost, arg FROM (
            SELECT s.j, p.cost + s.c AS cost, p.j AS arg,
                   ROW_NUMBER() OVER (PARTITION BY s.j
                       ORDER BY p.cost + s.c, p.j) AS rk
            FROM d{b - 1} p JOIN sse s ON s.i = p.j + 1
            WHERE p.j >= {b - 1}
        ) WHERE rk = 1
    )""")
    # backtrack: p{B} is the last bucket (arg+1 .. n), then walk left
    parts.append(f"""p{VOPT_B} AS (
        SELECT CAST({VOPT_B} AS BIGINT) AS bucket, d.arg + 1 AS i,
               d.j, d.arg
        FROM d{VOPT_B} d, nn WHERE d.j = nn.n
    )""")
    for b in range(VOPT_B - 1, 0, -1):
        parts.append(f"""p{b} AS (
        SELECT CAST({b} AS BIGINT) AS bucket, d.arg + 1 AS i,
               d.j, d.arg
        FROM d{b} d JOIN p{b + 1} nxt ON d.j = nxt.arg
    )""")
    sel = " UNION ALL ".join(
        f"SELECT bucket, i, j FROM p{b}" for b in range(1, VOPT_B + 1))
    return ("WITH " + ",\n".join(parts) + f""",
    path AS ({sel})
    SELECT p.bucket,
           CAST(p.i AS BIGINT) AS start_idx,
           CAST(p.j AS BIGINT) AS end_idx,
           di.day AS start_day, dj.day AS end_day,
           CAST(s.c AS BIGINT) AS sse_micro
    FROM path p
    JOIN sse s ON s.i = p.i AND s.j = p.j
    JOIN idx di ON di.rn = p.i
    JOIN idx dj ON dj.rn = p.j""")


@register(
    "voptimal_daily_histogram",
    _vopt_oracle_sql(),
    doc=f"X221 V-optimal histogram of the daily event series (B="
        f"{VOPT_B}): exact DP over integer interval SSEs (micro-"
        "snapped, non-negative), smallest-split tie-breaks, exact "
        "backtrack — bucket boundaries AND costs hash-checked. All "
        "frames are calendar-bounded; the daily aggregate is the only "
        "data-sized pass. The synopsis construction behind optimizer "
        "histograms and range-pruning statistics. DP replay + "
        "optimality laws tested.",
    tags=("X221", "X49", "X7", "X11", "X12"),
)
def voptimal_daily_histogram(spark: SparkSession,
                             sf_dir: str) -> DataFrame:
    from ..caching import persist_tracked

    ev = _ev(spark, sf_dir)
    daily = (ev.groupBy(F.date_trunc("day", "ts").cast("date")
                        .alias("day"))
             .agg(F.count("*").cast("long").alias("x")))
    idx = persist_tracked(daily.select(
        "day", "x",
        F.row_number().over(Window.orderBy("day")).alias("rn")))
    a = idx.select(F.col("rn").alias("i"))
    b = idx.select(F.col("rn").alias("j"))
    c = idx.select(F.col("rn").alias("k"), "x")
    sse = persist_tracked(
        a.join(b, F.col("j") >= F.col("i"))
        .join(c, (F.col("k") >= F.col("i")) & (F.col("k") <= F.col("j")))
        .groupBy("i", "j")
        .agg(F.sum("x").cast("long").alias("s1"),
             F.sum(F.col("x") * F.col("x")).cast("long").alias("s2"))
        .selectExpr(
            "i", "j",
            "CAST((1000000 * (CAST(j - i + 1 AS BIGINT) * s2"
            " - s1 * s1)) DIV (j - i + 1) AS BIGINT) AS c"))
    levels = {1: sse.filter(F.col("i") == 1)
              .select("j", F.col("c").alias("cost"),
                      F.lit(0).cast("long").alias("arg"))
              .localCheckpoint()}
    for bb in range(2, VOPT_B + 1):
        prev = levels[bb - 1].select(F.col("j").alias("pj"), "cost")
        cand = (prev.filter(F.col("pj") >= bb - 1)
                .join(sse, sse["i"] == F.col("pj") + 1)
                .select("j", (F.col("cost") + F.col("c")).alias("cost"),
                        F.col("pj").alias("arg")))
        levels[bb] = (cand.withColumn(
            "rk", F.row_number().over(
                Window.partitionBy("j").orderBy("cost", "arg")))
            .filter(F.col("rk") == 1)
            .select("j", "cost", "arg").localCheckpoint())
    nn = idx.agg(F.max("rn").alias("n"))
    path = (levels[VOPT_B].crossJoin(F.broadcast(nn))
            .filter(F.col("j") == F.col("n"))
            .select(F.lit(VOPT_B).cast("long").alias("bucket"),
                    (F.col("arg") + 1).alias("i"), "j", "arg"))
    paths = [path]
    for bb in range(VOPT_B - 1, 0, -1):
        nxt = paths[-1].select(F.col("arg").alias("nj"))
        step = (levels[bb].join(F.broadcast(nxt),
                                levels[bb]["j"] == F.col("nj"))
                .select(F.lit(bb).cast("long").alias("bucket"),
                        (F.col("arg") + 1).alias("i"), "j", "arg"))
        paths.append(step)
    allp = paths[0]
    for p in paths[1:]:
        allp = allp.unionByName(p)
    di = idx.select(F.col("rn").alias("i"), F.col("day").alias("start_day"))
    dj = idx.select(F.col("rn").alias("j"), F.col("day").alias("end_day"))
    return (allp.join(sse, ["i", "j"])
            .join(di, "i").join(dj, "j")
            .select("bucket",
                    F.col("i").cast("long").alias("start_idx"),
                    F.col("j").cast("long").alias("end_idx"),
                    "start_day", "end_day",
                    F.col("c").cast("long").alias("sse_micro")))


# --------------------------------------------------------------------------
# X222: doubly-robust off-policy evaluation — the estimator that fixes
# both of X197's failure modes at once: IPS is unbiased but high-
# variance, the direct method (a reward model Q-hat) is low-variance
# but biased; DR = Q-hat(x, pi(x)) + 1{pi=a_log} * K * (r - Q-hat(x,
# a_log)) is unbiased whenever EITHER is right (Dudik et al.). Q-hat
# is the per-(context, action) logged-reward mean snapped to micro
# (SUM DIV cnt, non-negative), so every DR term is an exact BIGINT;
# the per-policy sums divide once into ROUND(...,6) doubles. Same md5
# logging channel and the same three target policies as X197, so DM /
# DR / true values are directly comparable across the two queries.
# --------------------------------------------------------------------------
@register(
    "offpolicy_dr_eval",
    f"""
    WITH types AS (
        SELECT event_type,
               CAST(DENSE_RANK() OVER (ORDER BY event_type) - 1
                    AS BIGINT) AS idx
        FROM (SELECT DISTINCT event_type FROM events)
    ),
    base AS (
        SELECT e.event_id, t.idx AS own,
               CAST(ROUND(e.value * 1000000, 0) AS BIGINT) AS vmicro,
               ('0x' || substr(md5('log:' || e.event_id), 1, 15))
                   ::BIGINT % {OPE_ARMS} AS a_log,
               ('0x' || substr(md5('tgt:' || e.event_id), 1, 15))
                   ::BIGINT % {OPE_ARMS} AS a_rand,
               (SELECT idx FROM types WHERE event_type = 'purchase')
                   AS a_purch
        FROM events e JOIN types t ON t.event_type = e.event_type
    ),
    logged AS (
        SELECT *,
               CASE WHEN a_log = own THEN vmicro ELSE 0 END AS r_log
        FROM base
    ),
    qhat AS (
        SELECT own, a_log AS a,
               CAST(SUM(r_log) AS BIGINT)
                   // CAST(COUNT(*) AS BIGINT) AS q
        FROM logged GROUP BY own, a_log
    ),
    pol AS (
        SELECT 'always_purchase' AS policy, l.*, l.a_purch AS a_pi
        FROM logged l
        UNION ALL
        SELECT 'play_own_type', l.*, l.own FROM logged l
        UNION ALL
        SELECT 'uniform_md5', l.*, l.a_rand FROM logged l
    ),
    terms AS (
        SELECT p.policy,
               COALESCE(qp.q, 0) AS q_pi,
               CASE WHEN p.a_pi = p.a_log
                    THEN {OPE_ARMS} * (p.r_log - COALESCE(ql.q, 0))
                    ELSE 0 END AS corr,
               CASE WHEN p.a_pi = p.own THEN p.vmicro ELSE 0 END
                   AS r_true
        FROM pol p
        LEFT JOIN qhat qp ON qp.own = p.own AND qp.a = p.a_pi
        LEFT JOIN qhat ql ON ql.own = p.own AND ql.a = p.a_log
    )
    SELECT policy,
           CAST(COUNT(*) AS BIGINT) AS n_logs,
           ROUND(CAST(SUM(q_pi) AS DOUBLE) / COUNT(*) / 1000000.0, 6)
               AS dm_value,
           ROUND(CAST(SUM(q_pi + corr) AS DOUBLE) / COUNT(*)
                 / 1000000.0, 6) AS dr_value,
           ROUND(CAST(SUM(r_true) AS DOUBLE) / COUNT(*) / 1000000.0, 6)
               AS true_value
    FROM terms GROUP BY policy
    ORDER BY policy
    """,
    doc=f"X222 doubly-robust OPE over the X197 logging channel "
        f"({OPE_ARMS} md5 arms, propensity 1/{OPE_ARMS}): Q-hat = "
        "per-(context, action) logged-reward mean micro-snapped to an "
        "integer, DR terms exact BIGINTs, one final division per "
        "policy. DM, DR and true values side by side — the "
        "bias/variance companion to X197's IPS/SNIPS. DR identity "
        "and replay laws tested.",
    tags=("X222", "X197", "X56", "X7", "X3"),
)
def offpolicy_dr_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..caching import persist_tracked

    ev = _ev(spark, sf_dir)
    types = (ev.select("event_type").distinct()
             .withColumn("idx", (F.dense_rank().over(
                 Window.orderBy("event_type")) - 1).cast("long")))
    purch = types.filter(F.col("event_type") == MARKOV_ABSORB) \
        .select(F.col("idx").alias("a_purch"))

    def h60(salt):
        return F.conv(F.substring(F.md5(F.concat(
            F.lit(salt), F.col("event_id").cast("string"))),
            1, 15), 16, 10).cast("long")

    logged = persist_tracked(
        ev.join(F.broadcast(types), "event_type")
        .crossJoin(F.broadcast(purch))
        .select(
            "event_id", F.col("idx").alias("own"),
            F.round(F.col("value") * 1000000, 0).cast("long")
            .alias("vmicro"),
            (h60("log:") % OPE_ARMS).alias("a_log"),
            (h60("tgt:") % OPE_ARMS).alias("a_rand"), "a_purch")
        .withColumn("r_log", F.when(F.col("a_log") == F.col("own"),
                                    F.col("vmicro")).otherwise(0)))
    qhat = (logged.groupBy("own", F.col("a_log").alias("a"))
            .agg(F.expr("SUM(r_log) DIV COUNT(*)").cast("long")
                 .alias("q")))
    pol = None
    for policy, api in (("always_purchase", F.col("a_purch")),
                        ("play_own_type", F.col("own")),
                        ("uniform_md5", F.col("a_rand"))):
        part = logged.select(
            F.lit(policy).alias("policy"), "own", "vmicro", "a_log",
            "r_log", api.alias("a_pi"))
        pol = part if pol is None else pol.unionByName(part)
    terms = (pol
             .join(F.broadcast(qhat.select(F.col("own"),
                                           F.col("a").alias("a_pi"),
                                           F.col("q").alias("q_pi"))),
                   ["own", "a_pi"], "left")
             .join(F.broadcast(qhat.select(F.col("own"),
                                           F.col("a").alias("a_log"),
                                           F.col("q").alias("q_log"))),
                   ["own", "a_log"], "left")
             .select(
                 "policy",
                 F.coalesce("q_pi", F.lit(0)).alias("q_pi"),
                 F.when(F.col("a_pi") == F.col("a_log"),
                        OPE_ARMS * (F.col("r_log")
                                    - F.coalesce("q_log", F.lit(0))))
                 .otherwise(0).alias("corr"),
                 F.when(F.col("a_pi") == F.col("own"), F.col("vmicro"))
                 .otherwise(0).alias("r_true")))
    return (terms.groupBy("policy")
            .agg(F.count("*").cast("long").alias("n_logs"),
                 F.round(F.sum("q_pi").cast("double") / F.count("*")
                         / 1000000.0, 6).alias("dm_value"),
                 F.round((F.sum(F.col("q_pi") + F.col("corr")))
                         .cast("double") / F.count("*") / 1000000.0, 6)
                 .alias("dr_value"),
                 F.round(F.sum("r_true").cast("double") / F.count("*")
                         / 1000000.0, 6).alias("true_value"))
            .orderBy("policy"))


# --------------------------------------------------------------------------
# X227: Needleman-Wunsch global alignment of each user's event
# sequence against the canonical funnel template — the GAP-PENALTY
# edit alignment the DTW family (X216, elastic, gap-free) and the
# conformance checker (X113, counting) don't give: how close is each
# journey to signup -> view -> click -> purchase, allowing insertions
# (extra events) and deletions (skipped stages) at integer cost? The
# DP row is template-width (5 cells), so the per-user state is
# constant: Spark folds the token array with an aggregate HOF whose
# row cells are substituted inline (r1..r4 reference their left
# neighbor — safe in Spark, and exactly the shared-subexpression shape
# DuckDB 1.0 lambdas mis-evaluate, so the oracle replays the DP as a
# recursive CTE over (user, step)). All integer max-plus.
# --------------------------------------------------------------------------
NW_TEMPLATE = ("signup", "view", "click", "purchase")
NW_MATCH = 3
NW_MISMATCH = -1
NW_GAP = -1


def _nw_oracle_sql() -> str:
    tpl = NW_TEMPLATE
    g, mm, mt = NW_GAP, NW_MISMATCH, NW_MATCH
    sub = {j: (f"CASE WHEN s.event_type = '{tpl[j - 1]}' "
               f"THEN {mt} ELSE {mm} END") for j in range(1, 5)}
    # new row cells with inline left-neighbor substitution
    cells = {0: f"h.r0 + {g}"}
    for j in range(1, 5):
        cells[j] = (f"GREATEST(h.r{j} + {g}, ({cells[j - 1]}) + {g}, "
                    f"h.r{j - 1} + ({sub[j]}))")
    init = ", ".join(f"CAST({j * g} AS BIGINT)" for j in range(5))
    steps = ",\n               ".join(
        f"CAST({cells[j]} AS BIGINT)" for j in range(5))
    return f"""
    WITH RECURSIVE seq AS (
        SELECT user_id, event_type,
               ROW_NUMBER() OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS t
        FROM events
    ),
    nu AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n
           FROM seq GROUP BY user_id),
    dp(user_id, t, r0, r1, r2, r3, r4) AS (
        SELECT user_id, CAST(0 AS BIGINT), {init}
        FROM nu
        UNION ALL
        SELECT h.user_id, h.t + 1,
               {steps}
        FROM dp h JOIN seq s ON s.user_id = h.user_id
                            AND s.t = h.t + 1
    )
    SELECT d.user_id, nu.n AS n_events,
           CAST(d.r4 AS BIGINT) AS align_score
    FROM dp d JOIN nu ON nu.user_id = d.user_id AND d.t = nu.n
    """


@register(
    "funnel_alignment_scores",
    _nw_oracle_sql(),
    doc=f"X227 Needleman-Wunsch alignment of per-user event sequences "
        f"to the {' -> '.join(NW_TEMPLATE)} funnel template (match "
        f"{NW_MATCH}, mismatch {NW_MISMATCH}, gap {NW_GAP}): exact "
        "integer max-plus DP with a template-width (5-cell) state — "
        "ONE collect_list + aggregate-HOF fold per user in Spark, "
        "recursive-CTE DP in the oracle. The gap-penalty journey-"
        "similarity lens next to X216 DTW and X113 conformance. "
        "Python DP replay + score-bound laws.",
    tags=("X227", "X216", "X113", "X14", "X11"),
)
def funnel_alignment_scores(spark: SparkSession,
                            sf_dir: str) -> DataFrame:
    ev = _ev(spark, sf_dir).select("user_id", "ts", "event_id",
                                   "event_type")
    tpl = NW_TEMPLATE
    g, mm, mt = NW_GAP, NW_MISMATCH, NW_MATCH
    sub = {j: (f"CASE WHEN x.event_type = '{tpl[j - 1]}' "
               f"THEN {mt} ELSE {mm} END") for j in range(1, 5)}
    cells = {0: f"acc.r0 + {g}"}
    for j in range(1, 5):
        cells[j] = (f"GREATEST(acc.r{j} + {g}, ({cells[j - 1]}) + {g}, "
                    f"acc.r{j - 1} + ({sub[j]}))")
    init = ", ".join(
        f"'r{j}', CAST({j * g} AS BIGINT)" for j in range(5))
    step = ", ".join(
        f"'r{j}', CAST({cells[j]} AS BIGINT)" for j in range(5))
    seq = (ev.groupBy("user_id")
           .agg(F.array_sort(F.collect_list(
               F.struct("ts", "event_id", "event_type"))).alias("evs")))
    folded = seq.select(
        "user_id",
        F.size("evs").cast("long").alias("n_events"),
        F.expr(f"""aggregate(
            evs,
            named_struct({init}),
            (acc, x) -> named_struct({step}))""").alias("v"))
    return folded.select("user_id", "n_events",
                         F.col("v.r4").cast("long").alias("align_score"))


# --------------------------------------------------------------------------
# X229: Page-Hinkley drift detection on the daily event series.
# Distinct from CUSUM (X85, fixed global-mean target): Page-Hinkley
# tests each observation against the RUNNING mean of everything seen
# so far, which is the form streaming drift monitors (river/MOA) ship.
# The sequential statistic PH_t = U_t - min_{i<=t} U_i with
# U_t = sum_{i<=t} (x_i - xbar_i - delta) is two ordered windows once
# xbar_i is written as a prefix-sum ratio; the whole detector stays on
# the BIGINT micro grid (xbar via floor division of positive sums), so
# both engines agree bit-for-bit. Mirrored side catches downward drift.
# The reference has no drift surface at all; [EXT] north-star op.
# --------------------------------------------------------------------------
PH_DELTA_MICRO = 2_000_000    # slack: 2 events/day on the micro grid
PH_LAMBDA_MICRO = 30_000_000  # alarm threshold: 30 event-days

# Shared by page_hinkley_drift (X229) and stream_page_hinkley (X261):
# the streaming variant merges per-batch daily partials into the same
# daily table, so the SAME recurrence is its exact oracle.
PH_ORACLE_SQL = f"""
    WITH daily AS (
        SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM events GROUP BY 1
    ),
    cum AS (
        SELECT day, n,
               SUM(n) OVER (ORDER BY day) AS cs,
               CAST(ROW_NUMBER() OVER (ORDER BY day) AS BIGINT) AS t
        FROM daily
    ),
    terms AS (
        SELECT day, n,
               n * 1000000 - (cs * 1000000) // t AS up_term,
               n * 1000000 - (cs * 1000000) // t AS dn_term
        FROM cum
    ),
    u AS (
        SELECT day, n,
               CAST(SUM(up_term - {PH_DELTA_MICRO})
                    OVER (ORDER BY day) AS BIGINT) AS u_up,
               CAST(SUM(dn_term + {PH_DELTA_MICRO})
                    OVER (ORDER BY day) AS BIGINT) AS u_dn
        FROM terms
    )
    SELECT day, n,
           CAST(u_up - MIN(u_up) OVER (ORDER BY day) AS BIGINT)
               AS ph_up_micro,
           CAST(MAX(u_dn) OVER (ORDER BY day) - u_dn AS BIGINT)
               AS ph_dn_micro,
           CASE WHEN u_up - MIN(u_up) OVER (ORDER BY day)
                     > {PH_LAMBDA_MICRO}
                  OR MAX(u_dn) OVER (ORDER BY day) - u_dn
                     > {PH_LAMBDA_MICRO}
                THEN 1 ELSE 0 END AS alarm
    FROM u
    """


@register(
    "page_hinkley_drift",
    PH_ORACLE_SQL,
    doc="X229 Page-Hinkley drift detector (delta=2/day, lambda=30 "
        "event-days) over daily event counts: deviation from the "
        "RUNNING mean (prefix-sum floor-divided on the BIGINT micro "
        "grid), cumulative U, PH = U - running min (mirrored max for "
        "downward drift). Streaming-monitor semantics expressed as "
        "three ordered windows on the calendar-bounded daily table — "
        "no per-row loop, exact cross-engine. Python-recurrence "
        "replay law in tests/test_round5_laws.py.",
    tags=("X229", "X49", "X11"),
)
def page_hinkley_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _ev(spark, sf_dir)
    daily = (ev.groupBy(F.date_trunc("day", "ts").cast("date").alias("day"))
             .agg(F.count("*").cast("long").alias("n")))
    return ph_from_daily(daily)


def ph_from_daily(daily: DataFrame) -> DataFrame:
    """The X229 Page-Hinkley recurrence over a (day, n) frame — shared
    with the X261 streaming variant, whose merged per-batch partials
    reduce to the identical daily table."""
    w = Window.orderBy("day") \
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cum = daily.select(
        "day", "n",
        F.sum("n").over(w).alias("cs"),
        F.row_number().over(Window.orderBy("day")).cast("long").alias("t"))
    terms = cum.select(
        "day", "n",
        F.expr("n * 1000000 - (cs * 1000000) DIV t").alias("dev"))
    u = terms.select(
        "day", "n",
        F.sum(F.col("dev") - PH_DELTA_MICRO).over(w).cast("long")
        .alias("u_up"),
        F.sum(F.col("dev") + PH_DELTA_MICRO).over(w).cast("long")
        .alias("u_dn"))
    ph_up = (F.col("u_up") - F.min("u_up").over(w)).cast("long")
    ph_dn = (F.max("u_dn").over(w) - F.col("u_dn")).cast("long")
    return u.select(
        "day", "n",
        ph_up.alias("ph_up_micro"),
        ph_dn.alias("ph_dn_micro"),
        F.when((ph_up > PH_LAMBDA_MICRO) | (ph_dn > PH_LAMBDA_MICRO), 1)
        .otherwise(0).alias("alarm"))


# --------------------------------------------------------------------------
# X236: statistical process control — the X-bar chart with Western
# Electric run rules, the shop-floor ancestor of every alerting
# pipeline: a baseline window fixes the center line and sigma, then
# each day trips R1 (beyond 3-sigma), R2 (2 of 3 consecutive beyond
# 2-sigma, same side), R3 (4 of 5 beyond 1-sigma, same side), or R4
# (8 consecutive on one side). Daily means fold exactly (values
# micro-snapped BEFORE summing so the fold is BIGINT), sigma comes
# from one exact moment fold + a correctly-rounded sqrt (X182
# discipline), and every rule is an integer comparison over a bounded
# ROWS window — four rolling sums, no state machine, no UDF.
# Complements X85/X229 (cumulative detectors) with the zone-rule
# family. Western Electric SQC Handbook (1956); [EXT].
# --------------------------------------------------------------------------
SPC_BASELINE_DAYS = 12


@register(
    "spc_control_chart",
    f"""
    WITH daily AS (
        SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CAST(ROUND(value * 1000000, 0) AS BIGINT))
                    AS BIGINT) AS sv
        FROM events GROUP BY 1
    ),
    seq AS (
        SELECT day, sv // n AS x,
               ROW_NUMBER() OVER (ORDER BY day) AS rn
        FROM daily
    ),
    base AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS bn,
               CAST(SUM(x) AS BIGINT) AS bs,
               CAST(SUM(x * x) AS BIGINT) AS bss
        FROM seq WHERE rn <= {SPC_BASELINE_DAYS}
    ),
    lim AS (
        SELECT bs // bn AS center,
               CAST(ROUND(SQRT(CAST(bss * bn - bs * bs AS DOUBLE))
                          / bn, 0) AS BIGINT) AS sigma
        FROM base
    ),
    dev AS (
        SELECT s.day, s.x, s.x - l.center AS d, l.sigma
        FROM seq s CROSS JOIN lim l
    ),
    flags AS (
        SELECT day, x, d, sigma,
               CASE WHEN ABS(d) > 3 * sigma THEN 1 ELSE 0 END AS b3,
               CASE WHEN d > 2 * sigma THEN 1 ELSE 0 END AS u2,
               CASE WHEN d < -2 * sigma THEN 1 ELSE 0 END AS d2,
               CASE WHEN d > sigma THEN 1 ELSE 0 END AS u1,
               CASE WHEN d < -sigma THEN 1 ELSE 0 END AS d1,
               CASE WHEN d > 0 THEN 1 ELSE 0 END AS u0,
               CASE WHEN d < 0 THEN 1 ELSE 0 END AS d0
        FROM dev
    ),
    rules AS (
        SELECT day, x AS x_micro, d AS dev_micro,
               b3 AS r1,
               CASE WHEN SUM(u2) OVER w3 >= 2
                      OR SUM(d2) OVER w3 >= 2 THEN 1 ELSE 0 END AS r2,
               CASE WHEN SUM(u1) OVER w5 >= 4
                      OR SUM(d1) OVER w5 >= 4 THEN 1 ELSE 0 END AS r3,
               CASE WHEN SUM(u0) OVER w8 = 8
                      OR SUM(d0) OVER w8 = 8 THEN 1 ELSE 0 END AS r4
        FROM flags
        WINDOW w3 AS (ORDER BY day ROWS BETWEEN 2 PRECEDING
                      AND CURRENT ROW),
               w5 AS (ORDER BY day ROWS BETWEEN 4 PRECEDING
                      AND CURRENT ROW),
               w8 AS (ORDER BY day ROWS BETWEEN 7 PRECEDING
                      AND CURRENT ROW)
    )
    SELECT day, x_micro, dev_micro, r1, r2, r3, r4,
           CASE WHEN r1 + r2 + r3 + r4 > 0 THEN 1 ELSE 0 END AS alarm
    FROM rules
    """,
    doc=f"X236 SPC X-bar chart with Western Electric rules over daily "
        "mean event value (micro-snapped before the fold so the mean "
        f"is a BIGINT floor division): first {SPC_BASELINE_DAYS} days "
        "fix center + sigma (exact moments, correctly-rounded sqrt); "
        "R1 3-sigma, R2 2-of-3 beyond 2-sigma one-sided, R3 4-of-5 "
        "beyond 1-sigma, R4 8-in-a-row one side — four bounded ROWS "
        "windows, all-integer comparisons. Python replay law.",
    tags=("X236", "X49", "X11", "X85"),
)
def spc_control_chart(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _ev(spark, sf_dir)
    daily = (ev.groupBy(F.date_trunc("day", "ts").cast("date")
                        .alias("day"))
             .agg(F.count("*").cast("long").alias("n"),
                  F.sum(F.round(F.col("value") * 1e6, 0).cast("long"))
                  .cast("long").alias("sv")))
    seq = daily.select(
        "day", F.expr("sv DIV n").alias("x"),
        F.row_number().over(Window.orderBy("day")).alias("rn"))
    base = (seq.filter(F.col("rn") <= SPC_BASELINE_DAYS)
            .agg(F.count("*").cast("long").alias("bn"),
                 F.sum("x").cast("long").alias("bs"),
                 F.sum(F.col("x") * F.col("x")).cast("long")
                 .alias("bss")))
    lim = base.select(
        F.expr("bs DIV bn").alias("center"),
        F.round(F.sqrt((F.col("bss") * F.col("bn")
                        - F.col("bs") * F.col("bs")).cast("double"))
                / F.col("bn"), 0).cast("long").alias("sigma"))
    dev = (seq.crossJoin(F.broadcast(lim))
           .select("day", "x", (F.col("x") - F.col("center")).alias("d"),
                   "sigma"))
    flags = dev.select(
        "day", "x", "d", "sigma",
        F.when(F.abs("d") > 3 * F.col("sigma"), 1).otherwise(0)
        .alias("b3"),
        F.when(F.col("d") > 2 * F.col("sigma"), 1).otherwise(0)
        .alias("u2"),
        F.when(F.col("d") < -2 * F.col("sigma"), 1).otherwise(0)
        .alias("d2"),
        F.when(F.col("d") > F.col("sigma"), 1).otherwise(0).alias("u1"),
        F.when(F.col("d") < -F.col("sigma"), 1).otherwise(0).alias("d1"),
        F.when(F.col("d") > 0, 1).otherwise(0).alias("u0"),
        F.when(F.col("d") < 0, 1).otherwise(0).alias("d0"))
    w3 = Window.orderBy("day").rowsBetween(-2, 0)
    w5 = Window.orderBy("day").rowsBetween(-4, 0)
    w8 = Window.orderBy("day").rowsBetween(-7, 0)
    rules = flags.select(
        "day", F.col("x").alias("x_micro"), F.col("d").alias("dev_micro"),
        F.col("b3").alias("r1"),
        F.when((F.sum("u2").over(w3) >= 2)
               | (F.sum("d2").over(w3) >= 2), 1).otherwise(0).alias("r2"),
        F.when((F.sum("u1").over(w5) >= 4)
               | (F.sum("d1").over(w5) >= 4), 1).otherwise(0).alias("r3"),
        F.when((F.sum("u0").over(w8) == 8)
               | (F.sum("d0").over(w8) == 8), 1).otherwise(0).alias("r4"))
    return rules.select(
        "day", "x_micro", "dev_micro", "r1", "r2", "r3", "r4",
        F.when(F.col("r1") + F.col("r2") + F.col("r3") + F.col("r4") > 0,
               1).otherwise(0).alias("alarm"))


# --------------------------------------------------------------------------
# X237: Huber M-estimation via IRLS — the third robust-regression
# family next to RANSAC (X183, consensus) and Theil-Sen (X159, rank):
# iteratively reweighted least squares on the daily event-count trend,
# weights w = min(1, c/|r|) from the previous iterate's residuals.
# Every iteration's moments are exact BIGINT folds of micro-grid
# weights; the closed-form (a, b) solve is the ONLY float step, two
# correctly-rounded divisions per iteration snapped straight back to
# the micro grid (X60 discipline), so both engines walk the identical
# trajectory. c is data-derived (10% of the mean daily count) so the
# detector is scale-honest. Output: the 5-step trajectory with
# downweighted-day counts — convergence is visible, not asserted.
# Huber (1964); [EXT] — the reference fits nothing.
# --------------------------------------------------------------------------
HUBER_ITERS = 5


def _huber_oracle_sql() -> str:
    solve = """
        SELECT CAST(ROUND((CAST(sw AS DOUBLE) * CAST(swxy AS DOUBLE)
                    - CAST(swx AS DOUBLE) * CAST(swy AS DOUBLE))
                   / (CAST(sw AS DOUBLE) * CAST(swxx AS DOUBLE)
                      - CAST(swx AS DOUBLE) * CAST(swx AS DOUBLE))
                   * 1000000, 0) AS BIGINT) AS b_micro,
               sw, swx, swy
        FROM m{i}"""
    ctes = ["""daily AS (
        SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
               CAST(COUNT(*) AS BIGINT) AS y
        FROM events GROUP BY 1
    )""", """seq AS MATERIALIZED (
        SELECT CAST(ROW_NUMBER() OVER (ORDER BY day) - 1 AS BIGINT)
                   AS x, y
        FROM daily
    )""", """cpar AS MATERIALIZED (
        SELECT ((SUM(y) * 1000000) // COUNT(*)) // 10 AS c_micro
        FROM seq
    )""", """w1 AS MATERIALIZED (
        SELECT x, y, CAST(1000000 AS BIGINT) AS w FROM seq
    )"""]
    rows = []
    for i in range(1, HUBER_ITERS + 1):
        ctes.append(f"""m{i} AS MATERIALIZED (
        SELECT CAST(SUM(w) AS BIGINT) AS sw,
               CAST(SUM(w * x) AS BIGINT) AS swx,
               CAST(SUM(w * y) AS BIGINT) AS swy,
               CAST(SUM(w * x * x) AS BIGINT) AS swxx,
               CAST(SUM(w * x * y) AS BIGINT) AS swxy,
               CAST(SUM(CASE WHEN w = 1000000 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_full,
               CAST(SUM(CASE WHEN w < 1000000 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_down
        FROM w{i}
    )""")
        ctes.append(f"""s{i} AS MATERIALIZED (
        SELECT b_micro,
               CAST(ROUND((CAST(swy AS DOUBLE) * 1000000
                           - CAST(b_micro AS DOUBLE)
                             * CAST(swx AS DOUBLE))
                          / CAST(sw AS DOUBLE), 0) AS BIGINT) AS a_micro
        FROM ({solve.format(i=i)})
    )""")
        if i < HUBER_ITERS:
            ctes.append(f"""w{i + 1} AS MATERIALIZED (
        SELECT q.x, q.y,
               CASE WHEN ABS(q.y * 1000000 - (s.a_micro
                         + s.b_micro * q.x)) <= c.c_micro
                    THEN CAST(1000000 AS BIGINT)
                    ELSE CAST((c.c_micro * 1000000)
                         // ABS(q.y * 1000000 - (s.a_micro
                                + s.b_micro * q.x)) AS BIGINT)
               END AS w
        FROM seq q CROSS JOIN s{i} s CROSS JOIN cpar c
    )""")
        rows.append(
            f"SELECT CAST({i} AS BIGINT) AS iter, s.a_micro, s.b_micro,"
            f" m.n_full, m.n_down, m.sw AS sum_w\n"
            f"FROM s{i} s CROSS JOIN m{i} m")
    return ("WITH " + ",\n    ".join(ctes) + "\n"
            + "\nUNION ALL\n".join(rows))


@register(
    "huber_irls_trend",
    _huber_oracle_sql(),
    doc=f"X237 Huber IRLS robust trend ({HUBER_ITERS} iterations) on "
        "daily event counts: micro-grid weights min(1, c/|r|) with "
        "data-derived c (10% of mean daily count), exact BIGINT "
        "weighted moments per iteration, closed-form solve as two "
        "correctly-rounded double divisions snapped back to the grid. "
        "Trajectory output (a, b, downweighted days per step); "
        "Python IRLS replay + weight-range laws.",
    tags=("X237", "X183", "X60", "X49", "X7"),
)
def huber_irls_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _ev(spark, sf_dir)
    daily = (ev.groupBy(F.date_trunc("day", "ts").cast("date")
                        .alias("day"))
             .agg(F.count("*").cast("long").alias("y")))
    seq = daily.select(
        (F.row_number().over(Window.orderBy("day")) - 1).cast("long")
        .alias("x"), "y").localCheckpoint()
    cpar = seq.agg(F.expr("((SUM(y) * 1000000) DIV COUNT(*)) DIV 10")
                   .cast("long").alias("c_micro")).localCheckpoint()
    w = seq.select("x", "y", F.lit(1000000).cast("long").alias("w"))
    out = None
    for i in range(1, HUBER_ITERS + 1):
        m = w.agg(
            F.sum("w").cast("long").alias("sw"),
            F.sum(F.col("w") * F.col("x")).cast("long").alias("swx"),
            F.sum(F.col("w") * F.col("y")).cast("long").alias("swy"),
            F.sum(F.col("w") * F.col("x") * F.col("x")).cast("long")
            .alias("swxx"),
            F.sum(F.col("w") * F.col("x") * F.col("y")).cast("long")
            .alias("swxy"),
            F.sum(F.when(F.col("w") == 1000000, 1).otherwise(0))
            .cast("long").alias("n_full"),
            F.sum(F.when(F.col("w") < 1000000, 1).otherwise(0))
            .cast("long").alias("n_down")).localCheckpoint()
        s = m.select(
            F.expr(
                "CAST(ROUND((CAST(sw AS DOUBLE) * CAST(swxy AS DOUBLE)"
                " - CAST(swx AS DOUBLE) * CAST(swy AS DOUBLE))"
                " / (CAST(sw AS DOUBLE) * CAST(swxx AS DOUBLE)"
                " - CAST(swx AS DOUBLE) * CAST(swx AS DOUBLE))"
                " * 1000000, 0) AS BIGINT)").alias("b_micro"),
            "sw", "swx", "swy").select(
            F.expr(
                "CAST(ROUND((CAST(swy AS DOUBLE) * 1000000"
                " - CAST(b_micro AS DOUBLE) * CAST(swx AS DOUBLE))"
                " / CAST(sw AS DOUBLE), 0) AS BIGINT)").alias("a_micro"),
            "b_micro").localCheckpoint()
        row = (s.crossJoin(m.select("n_full", "n_down",
                                    F.col("sw").alias("sum_w")))
               .select(F.lit(i).cast("long").alias("iter"),
                       "a_micro", "b_micro", "n_full", "n_down",
                       "sum_w"))
        out = row if out is None else out.unionByName(row)
        if i < HUBER_ITERS:
            resid = F.expr("ABS(y * 1000000 - (a_micro + b_micro * x))")
            w = (seq.crossJoin(F.broadcast(s))
                 .crossJoin(F.broadcast(cpar))
                 .select("x", "y",
                         F.when(resid <= F.col("c_micro"),
                                F.lit(1000000).cast("long"))
                         .otherwise(F.expr(
                             "CAST((c_micro * 1000000) DIV "
                             "ABS(y * 1000000 - (a_micro + b_micro * x))"
                             " AS BIGINT)")).alias("w")))
    return out


# --------------------------------------------------------------------------
# X245: Kruskal-Wallis k-sample rank test — the rank-based ANOVA the
# drift family lacked (X73 chi2 tests categories, X129 KS tests two
# samples; this tests k groups' locations at once, distribution-free).
# Scale design: ranks NEVER touch rows — midranks come off the
# cumulative value histogram (2x-midrank M2 = 2*cum_before + cnt + 1
# keeps everything integer), per-group rank mass folds exactly, and
# the H statistic works on CENTERED masses D_i = R2_i - n_i(N+1) whose
# squared-over-n terms evaluate in pure BIGINT via the split identity
# A^2 DIV n = q^2 n + 2qr + (r^2 DIV n), A = qn + r — no int128, no
# doubles. Tie correction applied at milli precision (documented).
# Kruskal & Wallis (1952); [EXT].
# --------------------------------------------------------------------------
@register(
    "kruskal_wallis_values",
    """
    WITH pts AS (
        SELECT event_type AS grp,
               CAST(ROUND(value * 100, 0) AS BIGINT) AS v
        FROM events
    ),
    hist AS (
        SELECT v, CAST(COUNT(*) AS BIGINT) AS cnt FROM pts GROUP BY v
    ),
    ranks AS (
        SELECT v, cnt,
               2 * (SUM(cnt) OVER (ORDER BY v) - cnt) + cnt + 1 AS m2
        FROM hist
    ),
    bytype AS (
        SELECT grp, v, CAST(COUNT(*) AS BIGINT) AS ct
        FROM pts GROUP BY grp, v
    ),
    tot AS (
        SELECT CAST(SUM(cnt) AS BIGINT) AS n,
               CAST(SUM(cnt * cnt * cnt - cnt) AS BIGINT) AS ties
        FROM hist
    ),
    g AS (
        SELECT b.grp,
               CAST(SUM(b.ct) AS BIGINT) AS n_i,
               CAST(SUM(b.ct * r.m2) AS BIGINT) AS r2
        FROM bytype b JOIN ranks r ON r.v = b.v
        GROUP BY b.grp
    ),
    d AS (
        SELECT grp, n_i, r2,
               ABS(r2 - n_i * (t.n + 1)) AS a, t.n
        FROM g CROSS JOIN tot t
    ),
    terms AS (
        SELECT grp, n_i, r2, a,
               (a // n_i) * (a // n_i) * n_i
               + 2 * (a // n_i) * (a % n_i)
               + ((a % n_i) * (a % n_i)) // n_i AS t_i
        FROM d
    ),
    h AS (
        SELECT CAST((3 * SUM(t_i)) // (t.n * (t.n + 1)) * 1000000
                    + (((3 * SUM(t_i)) % (t.n * (t.n + 1))) * 1000000)
                      // (t.n * (t.n + 1)) AS BIGINT) AS h_micro,
               CAST(((t.n * t.n * t.n - t.n - t.ties) * 1000)
                    // (t.n * t.n * t.n - t.n) AS BIGINT) AS c_milli
        FROM terms CROSS JOIN tot t GROUP BY t.n, t.ties
    )
    SELECT tm.grp, tm.n_i, tm.r2 AS rank_mass2,
           h.h_micro,
           CAST((h.h_micro * 1000) // h.c_milli AS BIGINT)
               AS h_adj_micro
    FROM terms tm CROSS JOIN h
    """,
    doc="X245 Kruskal-Wallis rank test over centi-snapped event "
        "values by event type: integer 2x-midranks from the cumulative "
        "value histogram (rows never individually ranked), centered "
        "rank masses, BIGINT split-division identity for the "
        "squared-over-n fold, milli-precision tie correction. "
        "Per-group exact rank mass + shared H / adjusted H. "
        "Python replay + rank-mass conservation laws.",
    tags=("X245", "X129", "X92", "X11", "X7"),
)
def kruskal_wallis_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _ev(spark, sf_dir)
    pts = ev.select(F.col("event_type").alias("grp"),
                    F.round(F.col("value") * 100, 0).cast("long")
                    .alias("v"))
    hist = pts.groupBy("v").agg(F.count("*").cast("long").alias("cnt"))
    w = Window.orderBy("v") \
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ranks = hist.select(
        "v", "cnt",
        (2 * (F.sum("cnt").over(w) - F.col("cnt"))
         + F.col("cnt") + 1).alias("m2"))
    bytype = pts.groupBy("grp", "v") \
        .agg(F.count("*").cast("long").alias("ct"))
    tot = hist.agg(
        F.sum("cnt").cast("long").alias("n"),
        F.sum(F.col("cnt") * F.col("cnt") * F.col("cnt")
              - F.col("cnt")).cast("long").alias("ties"))
    g = (bytype.join(ranks.select("v", "m2"), "v")
         .groupBy("grp")
         .agg(F.sum("ct").cast("long").alias("n_i"),
              F.sum(F.col("ct") * F.col("m2")).cast("long")
              .alias("r2")))
    d = g.crossJoin(F.broadcast(tot)).select(
        "grp", "n_i", "r2",
        F.abs(F.col("r2") - F.col("n_i") * (F.col("n") + 1)).alias("a"),
        "n", "ties")
    terms = d.select(
        "grp", "n_i", "r2", "n", "ties",
        F.expr("(a DIV n_i) * (a DIV n_i) * n_i"
               " + 2 * (a DIV n_i) * (a % n_i)"
               " + ((a % n_i) * (a % n_i)) DIV n_i").alias("t_i")
        ).localCheckpoint()
    h = terms.groupBy("n", "ties").agg(
        F.expr("CAST((3 * SUM(t_i)) DIV (n * (n + 1)) * 1000000"
               " + (((3 * SUM(t_i)) % (n * (n + 1))) * 1000000)"
               " DIV (n * (n + 1)) AS BIGINT)").alias("h_micro"),
        F.expr("CAST(((n * n * n - n - ties) * 1000)"
               " DIV (n * n * n - n) AS BIGINT)").alias("c_milli"))
    return (terms.crossJoin(F.broadcast(
        h.select("h_micro", "c_milli")))
        .select("grp", "n_i", F.col("r2").alias("rank_mass2"),
                "h_micro",
                F.expr("CAST((h_micro * 1000) DIV c_milli AS BIGINT)")
                .alias("h_adj_micro")))


# --------------------------------------------------------------------------
# X247: Smith-Waterman LOCAL alignment — the companion to X227's
# global NW: instead of charging the whole journey, find the
# best-scoring SEGMENT that matches the funnel template (cells floor
# at 0, answer is the max over all cells), which is the right lens
# when sessions embed one clean funnel pass inside hours of noise.
# Same constant-width integer max-plus DP state (template-width cells
# + a running best), same engine split: Spark folds each user's token
# array with one aggregate HOF (left-neighbor cells substituted
# inline), the oracle replays the DP as a recursive CTE. Smith &
# Waterman (1981); [EXT].
# --------------------------------------------------------------------------
SW_TEMPLATE = NW_TEMPLATE
SW_MATCH = 3
SW_MISMATCH = -2
SW_GAP = -1


def _sw_oracle_sql() -> str:
    tpl = SW_TEMPLATE
    g, mm, mt = SW_GAP, SW_MISMATCH, SW_MATCH
    sub = {j: (f"CASE WHEN s.event_type = '{tpl[j - 1]}' "
               f"THEN {mt} ELSE {mm} END") for j in range(1, 5)}
    cells = {0: "0"}
    for j in range(1, 5):
        cells[j] = (f"GREATEST(0, h.r{j - 1} + ({sub[j]}), "
                    f"h.r{j} + {g}, ({cells[j - 1]}) + {g})")
    init = ", ".join("CAST(0 AS BIGINT)" for _ in range(5))
    steps = ",\n               ".join(
        f"CAST({cells[j]} AS BIGINT)" for j in range(5))
    bests = ", ".join(f"({cells[j]})" for j in range(1, 5))
    return f"""
    WITH RECURSIVE seq AS (
        SELECT user_id, event_type,
               ROW_NUMBER() OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS t
        FROM events
    ),
    nu AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n
           FROM seq GROUP BY user_id),
    dp(user_id, t, r0, r1, r2, r3, r4, b) AS (
        SELECT user_id, CAST(0 AS BIGINT), {init}, CAST(0 AS BIGINT)
        FROM nu
        UNION ALL
        SELECT h.user_id, h.t + 1,
               {steps},
               CAST(GREATEST(h.b, {bests}) AS BIGINT)
        FROM dp h JOIN seq s ON s.user_id = h.user_id
                            AND s.t = h.t + 1
    )
    SELECT d.user_id, nu.n AS n_events,
           CAST(d.b AS BIGINT) AS local_score
    FROM dp d JOIN nu ON nu.user_id = d.user_id AND d.t = nu.n
    """


@register(
    "funnel_local_alignment",
    _sw_oracle_sql(),
    doc=f"X247 Smith-Waterman local alignment of per-user event "
        f"sequences to the {' -> '.join(SW_TEMPLATE)} template (match "
        f"{SW_MATCH}, mismatch {SW_MISMATCH}, gap {SW_GAP}): cells "
        "floor at 0, answer is the running max over all cells — the "
        "best funnel SEGMENT inside a noisy session, vs X227's "
        "whole-journey charge. One aggregate-HOF fold per user; "
        "recursive-CTE oracle. Python DP replay + 0 <= score <= "
        "4*match laws.",
    tags=("X247", "X227", "X216", "X14", "X11"),
)
def funnel_local_alignment(spark: SparkSession,
                           sf_dir: str) -> DataFrame:
    ev = _ev(spark, sf_dir)
    tpl = SW_TEMPLATE
    g, mm, mt = SW_GAP, SW_MISMATCH, SW_MATCH
    sub = {j: (f"CASE WHEN x.event_type = '{tpl[j - 1]}' "
               f"THEN {mt} ELSE {mm} END") for j in range(1, 5)}
    cells = {0: "CAST(0 AS BIGINT)"}
    for j in range(1, 5):
        cells[j] = (f"GREATEST(0, acc.r{j - 1} + ({sub[j]}), "
                    f"acc.r{j} + {g}, ({cells[j - 1]}) + {g})")
    init = ", ".join(f"'r{j}', CAST(0 AS BIGINT)" for j in range(5)) \
        + ", 'b', CAST(0 AS BIGINT)"
    step = ", ".join(f"'r{j}', CAST({cells[j]} AS BIGINT)"
                     for j in range(5))
    bests = ", ".join(f"({cells[j]})" for j in range(1, 5))
    step += f", 'b', CAST(GREATEST(acc.b, {bests}) AS BIGINT)"
    seq = (ev.groupBy("user_id")
           .agg(F.array_sort(F.collect_list(
               F.struct("ts", "event_id", "event_type"))).alias("evs")))
    folded = seq.select(
        "user_id",
        F.size("evs").cast("long").alias("n_events"),
        F.expr(f"""aggregate(
            evs,
            named_struct({init}),
            (acc, x) -> named_struct({step}))""").alias("v"))
    return folded.select("user_id", "n_events",
                         F.col("v.b").cast("long").alias("local_score"))


# --------------------------------------------------------------------------
# X250: periodogram at fixed periods — the frequency-domain
# seasonality detector next to X136 (ACF, lag domain), X153 (Haar,
# scale domain) and X82 (STL, decomposition): DFT power of the daily
# count series at candidate periods (weekly / biweekly / monthly).
# Exactness: the series is centered by the x n trick (y = n*x_t - S,
# integer), each cos/sin coefficient snaps to the micro grid with its
# ANGLE REDUCED FIRST (t % p before the division, so both engines'
# libm sees the same small argument), and the a/b folds are exact
# BIGINT; power is one double expression from the exact folds.
# Schuster (1898); [EXT].
# --------------------------------------------------------------------------
PGRAM_PERIODS = (7, 14, 30)


@register(
    "daily_periodogram",
    f"""
    WITH daily AS (
        SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
               CAST(COUNT(*) AS BIGINT) AS x
        FROM events GROUP BY 1
    ),
    seq AS (
        SELECT CAST(ROW_NUMBER() OVER (ORDER BY day) - 1 AS BIGINT)
                   AS t, x
        FROM daily
    ),
    tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(x) AS BIGINT) AS s FROM seq),
    periods(p) AS (VALUES {", ".join(f"({p})" for p in PGRAM_PERIODS)}),
    terms AS (
        SELECT pr.p, q.t,
               q.x * tt.n - tt.s AS y,
               CAST(ROUND(COS(2 * PI() * (q.t % pr.p) / pr.p)
                          * 1000000, 0) AS BIGINT) AS c,
               CAST(ROUND(SIN(2 * PI() * (q.t % pr.p) / pr.p)
                          * 1000000, 0) AS BIGINT) AS sn
        FROM seq q CROSS JOIN tot tt CROSS JOIN periods pr
    )
    SELECT p AS period,
           CAST(SUM(y * c) AS BIGINT) AS a_fold,
           CAST(SUM(y * sn) AS BIGINT) AS b_fold,
           ROUND((CAST(SUM(y * c) AS DOUBLE) * SUM(y * c)
                  + CAST(SUM(y * sn) AS DOUBLE) * SUM(y * sn))
                 / 1e12, 4) AS power
    FROM terms GROUP BY p
    """,
    doc=f"X250 periodogram at periods {PGRAM_PERIODS} over daily "
        "event counts: n-scaled centering (integer), per-day cos/sin "
        "micro-snapped on the REDUCED angle (t % p), exact BIGINT a/b "
        "folds, power one double expression. Weekly-seasonality "
        "detection in the frequency domain. Python replay + "
        "power >= 0 laws.",
    tags=("X250", "X136", "X153", "X82", "X7"),
)
def daily_periodogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _ev(spark, sf_dir)
    daily = (ev.groupBy(F.date_trunc("day", "ts").cast("date")
                        .alias("day"))
             .agg(F.count("*").cast("long").alias("x")))
    seq = daily.select(
        (F.row_number().over(Window.orderBy("day")) - 1).cast("long")
        .alias("t"), "x")
    tot = seq.agg(F.count("*").cast("long").alias("n"),
                  F.sum("x").cast("long").alias("s"))
    periods = ev.sparkSession.createDataFrame(
        [(p,) for p in PGRAM_PERIODS], "p long")
    terms = (seq.crossJoin(F.broadcast(tot))
             .crossJoin(F.broadcast(periods))
             .select(
                 "p", "t",
                 (F.col("x") * F.col("n") - F.col("s")).alias("y"),
                 F.expr("CAST(ROUND(COS(2 * PI() * (t % p) / p)"
                        " * 1000000, 0) AS BIGINT)").alias("c"),
                 F.expr("CAST(ROUND(SIN(2 * PI() * (t % p) / p)"
                        " * 1000000, 0) AS BIGINT)").alias("sn")))
    return (terms.groupBy(F.col("p").alias("period"))
            .agg(F.sum(F.col("y") * F.col("c")).cast("long")
                 .alias("a_fold"),
                 F.sum(F.col("y") * F.col("sn")).cast("long")
                 .alias("b_fold"),
                 F.expr("ROUND((CAST(SUM(y * c) AS DOUBLE) * SUM(y * c)"
                        " + CAST(SUM(y * sn) AS DOUBLE) * SUM(y * sn))"
                        " / 1e12, 4)").alias("power")))


# --------------------------------------------------------------------------
# X257: sliding-window funnel depth (ClickHouse windowFunnel parity) —
# the product-analytics primitive none of the existing funnel lenses
# covers: X113 checks CONFORMANCE to a model, X227/X247 ALIGN whole
# journeys; this measures, per user, HOW DEEP the canonical
# signup -> view -> click -> purchase chain gets inside a bounded time
# window. Semantics (documented, deterministic): the chain anchors at
# the user's EARLIEST step-1 event; each later step is the earliest
# strictly-later event of the right type still inside WINDOW of the
# anchor. Every step is a per-user MIN aggregate over an epoch-micros
# integer — four chained conditional folds, no state machine, no UDF,
# and the per-user work is one shuffle regardless of history length.
# Output: users per reached depth (0 = active user, no signup).
# ClickHouse windowFunnel; [EXT].
# --------------------------------------------------------------------------
WF_STEPS = ("signup", "view", "click", "purchase")
WF_WINDOW_US = 14 * 86_400 * 1_000_000


def _window_funnel_oracle_sql() -> str:
    return f"""
    WITH ev AS (
        SELECT user_id, event_type, epoch_us(ts) AS us FROM events
    ),
    u0 AS (SELECT DISTINCT user_id FROM ev),
    s1 AS (SELECT user_id, MIN(us) AS t1 FROM ev
           WHERE event_type = '{WF_STEPS[0]}' GROUP BY user_id),
    s2 AS (SELECT e.user_id, MIN(e.us) AS t2
           FROM ev e JOIN s1 ON s1.user_id = e.user_id
           WHERE e.event_type = '{WF_STEPS[1]}' AND e.us > s1.t1
             AND e.us <= s1.t1 + {WF_WINDOW_US}
           GROUP BY e.user_id),
    s3 AS (SELECT e.user_id, MIN(e.us) AS t3
           FROM ev e JOIN s1 ON s1.user_id = e.user_id
           JOIN s2 ON s2.user_id = e.user_id
           WHERE e.event_type = '{WF_STEPS[2]}' AND e.us > s2.t2
             AND e.us <= s1.t1 + {WF_WINDOW_US}
           GROUP BY e.user_id),
    s4 AS (SELECT e.user_id, MIN(e.us) AS t4
           FROM ev e JOIN s1 ON s1.user_id = e.user_id
           JOIN s3 ON s3.user_id = e.user_id
           WHERE e.event_type = '{WF_STEPS[3]}' AND e.us > s3.t3
             AND e.us <= s1.t1 + {WF_WINDOW_US}
           GROUP BY e.user_id),
    depth AS (
        SELECT u0.user_id,
               CASE WHEN s4.user_id IS NOT NULL THEN 4
                    WHEN s3.user_id IS NOT NULL THEN 3
                    WHEN s2.user_id IS NOT NULL THEN 2
                    WHEN s1.user_id IS NOT NULL THEN 1
                    ELSE 0 END AS depth
        FROM u0
        LEFT JOIN s1 ON s1.user_id = u0.user_id
        LEFT JOIN s2 ON s2.user_id = u0.user_id
        LEFT JOIN s3 ON s3.user_id = u0.user_id
        LEFT JOIN s4 ON s4.user_id = u0.user_id
    )
    SELECT CAST(depth AS BIGINT) AS depth,
           CAST(COUNT(*) AS BIGINT) AS n_users
    FROM depth GROUP BY depth
    """


@register(
    "window_funnel_depths",
    _window_funnel_oracle_sql(),
    doc=f"X257 sliding-window funnel (ClickHouse windowFunnel parity): "
        f"max depth of {' -> '.join(WF_STEPS)} anchored at each user's "
        f"earliest {WF_STEPS[0]} with a {WF_WINDOW_US // 86_400_000_000}"
        "-day window; each step the earliest strictly-later matching "
        "event (exact epoch-micros integers). Four chained conditional "
        "MIN folds per user — one shuffle, no UDF, no per-row state "
        "machine; output is the users-per-depth histogram. Python "
        "replay + monotone-depth laws.",
    tags=("X257", "X113", "X21", "X7", "X14"),
)
def window_funnel_depths(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _ev(spark, sf_dir).select(
        "user_id", "event_type",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"))
    u0 = ev.select("user_id").distinct()
    s1 = (ev.filter(F.col("event_type") == WF_STEPS[0])
          .groupBy("user_id").agg(F.min("us").alias("t1")))
    s2 = (ev.filter(F.col("event_type") == WF_STEPS[1])
          .join(s1, "user_id")
          .filter((F.col("us") > F.col("t1"))
                  & (F.col("us") <= F.col("t1") + WF_WINDOW_US))
          .groupBy("user_id").agg(F.min("us").alias("t2")))
    s3 = (ev.filter(F.col("event_type") == WF_STEPS[2])
          .join(s1, "user_id").join(s2, "user_id")
          .filter((F.col("us") > F.col("t2"))
                  & (F.col("us") <= F.col("t1") + WF_WINDOW_US))
          .groupBy("user_id").agg(F.min("us").alias("t3")))
    s4 = (ev.filter(F.col("event_type") == WF_STEPS[3])
          .join(s1, "user_id").join(s3, "user_id")
          .filter((F.col("us") > F.col("t3"))
                  & (F.col("us") <= F.col("t1") + WF_WINDOW_US))
          .groupBy("user_id").agg(F.min("us").alias("t4")))
    depth = (u0.join(s1, "user_id", "left")
             .join(s2, "user_id", "left")
             .join(s3, "user_id", "left")
             .join(s4, "user_id", "left")
             .select(F.when(F.col("t4").isNotNull(), 4)
                     .when(F.col("t3").isNotNull(), 3)
                     .when(F.col("t2").isNotNull(), 2)
                     .when(F.col("t1").isNotNull(), 1)
                     .otherwise(0).cast("long").alias("depth")))
    return (depth.groupBy("depth")
            .agg(F.count("*").cast("long").alias("n_users")))


# --------------------------------------------------------------------------
# X259: peak detection with topographic prominence — the time-series
# lens the detector family (X85 CUSUM, X229 Page-Hinkley, X236 SPC)
# does NOT give: those flag level SHIFTS; this ranks local MAXIMA by
# how far they rise above their surrounding terrain, scipy
# find_peaks(prominence=...) semantics made exact-integer. A day is a
# peak iff strictly higher than both neighbors; its prominence is
# height minus the HIGHER of the two valley floors, where each valley
# runs to the nearest strictly-higher day on that side (or the series
# edge). The nearest-higher-day search is a self-join on the
# CALENDAR-BOUNDED daily table (|days|^2 pairs, scale-free in rows —
# the repo's bounded-dimension join discipline), everything else is
# two ordered windows; all heights are exact BIGINT event counts.
# scipy.signal peak prominence; [EXT].
# --------------------------------------------------------------------------
PEAK_MIN_PROM = 5


@register(
    "daily_peak_prominence",
    f"""
    WITH daily AS (
        SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM events GROUP BY 1
    ),
    seq AS (
        SELECT day, n,
               LAG(n) OVER (ORDER BY day) AS pv,
               LEAD(n) OVER (ORDER BY day) AS nx
        FROM daily
    ),
    peaks AS (
        SELECT day, n FROM seq
        WHERE pv IS NOT NULL AND nx IS NOT NULL AND n > pv AND n > nx
    ),
    lb AS (
        SELECT p.day, p.n, MAX(d.day) AS lhi
        FROM peaks p LEFT JOIN daily d
          ON d.day < p.day AND d.n > p.n
        GROUP BY p.day, p.n
    ),
    rb AS (
        SELECT p.day, MIN(d.day) AS rhi
        FROM peaks p LEFT JOIN daily d
          ON d.day > p.day AND d.n > p.n
        GROUP BY p.day
    ),
    valleys AS (
        SELECT l.day, l.n,
               (SELECT MIN(d.n) FROM daily d
                WHERE d.day < l.day
                  AND (l.lhi IS NULL OR d.day > l.lhi)) AS lmin,
               (SELECT MIN(d.n) FROM daily d
                WHERE d.day > l.day
                  AND (r.rhi IS NULL OR d.day < r.rhi)) AS rmin
        FROM lb l JOIN rb r ON r.day = l.day
    )
    SELECT day, n,
           CAST(n - GREATEST(lmin, rmin) AS BIGINT) AS prominence
    FROM valleys
    WHERE n - GREATEST(lmin, rmin) >= {PEAK_MIN_PROM}
    """,
    doc="X259 topographic peak prominence over daily event counts "
        "(scipy find_peaks parity, exact integers): peaks are strict "
        "local maxima; each side's valley floor is the MIN between the "
        "peak and the nearest strictly-higher day (or the edge); "
        f"prominence = height - higher floor, reported when >= "
        f"{PEAK_MIN_PROM}. Nearest-higher search + valley mins are "
        "calendar-bounded joins (|days|^2, scale-free); heights are "
        "BIGINT counts. Python replay + prominence-bound laws.",
    tags=("X259", "X49", "X11", "X5"),
)
def daily_peak_prominence(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _ev(spark, sf_dir)
    daily = (ev.groupBy(F.date_trunc("day", "ts").cast("date")
                        .alias("day"))
             .agg(F.count("*").cast("long").alias("n"))
             .localCheckpoint())
    w = Window.orderBy("day")
    seq = daily.select("day", "n",
                       F.lag("n").over(w).alias("pv"),
                       F.lead("n").over(w).alias("nx"))
    peaks = (seq.filter(F.col("pv").isNotNull()
                        & F.col("nx").isNotNull()
                        & (F.col("n") > F.col("pv"))
                        & (F.col("n") > F.col("nx")))
             .select("day", "n"))
    d = daily.select(F.col("day").alias("dd"), F.col("n").alias("dn"))
    lb = (peaks.join(d, (F.col("dd") < F.col("day"))
                     & (F.col("dn") > F.col("n")), "left")
          .groupBy("day", "n").agg(F.max("dd").alias("lhi")))
    rb = (peaks.join(d, (F.col("dd") > F.col("day"))
                     & (F.col("dn") > F.col("n")), "left")
          .groupBy("day").agg(F.min("dd").alias("rhi")))
    lmin = (lb.join(d, (F.col("dd") < F.col("day"))
                    & (F.col("lhi").isNull()
                       | (F.col("dd") > F.col("lhi"))))
            .groupBy("day").agg(F.min("dn").alias("lmin")))
    rmin = (rb.join(d, (F.col("dd") > F.col("day"))
                    & (F.col("rhi").isNull()
                       | (F.col("dd") < F.col("rhi"))))
            .groupBy("day").agg(F.min("dn").alias("rmin")))
    return (peaks.join(lmin, "day").join(rmin, "day")
            .select("day", "n",
                    (F.col("n") - F.greatest("lmin", "rmin"))
                    .cast("long").alias("prominence"))
            .filter(F.col("prominence") >= PEAK_MIN_PROM))


# --------------------------------------------------------------------------
# X260: generalized ESD outlier rounds (Rosner 1983) — the ITERATIVE
# re-estimation outlier test the point detectors lack: X236 SPC fixes
# limits once from a baseline, X214/X220 score by local geometry;
# generalized ESD removes the most extreme point and RE-ESTIMATES mean
# and s.d. from the remainder, so one gross outlier cannot mask the
# next (the masking problem Grubbs' single-shot test suffers). Fixed
# ESD_ROUNDS rounds over the daily mean-value series: exact BIGINT
# micro folds give mean and SSD, the test statistic R = max|x - xbar|
# / s snaps to the micro grid through one correctly-rounded sqrt, and
# the argmax is an integer-ordered limit (X88 discipline: never order
# by a float). The removed day feeds the next round via an anti-join.
# Rosner, Technometrics 25(2); [EXT].
# --------------------------------------------------------------------------
ESD_ROUNDS = 3


def _esd_oracle_sql() -> str:
    parts = ["""d0 AS (
        SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
               CAST(SUM(CAST(ROUND(value * 1000000, 0) AS BIGINT))
                    // COUNT(*) AS BIGINT) AS x
        FROM events GROUP BY 1)"""]
    rows = []
    for r in range(ESD_ROUNDS):
        parts.append(f"""m{r} AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(x) AS BIGINT) AS sx,
               CAST(SUM(x * x) AS BIGINT) AS sxx
        FROM d{r})""")
        parts.append(f"""top{r} AS (
        SELECT d.day, d.x,
               ABS(d.x * m.n - m.sx) AS dev_n,
               m.n AS n, m.sx AS sx, m.sxx AS sxx
        FROM d{r} d CROSS JOIN m{r} m
        ORDER BY ABS(d.x * m.n - m.sx) DESC, d.day
        LIMIT 1)""")
        parts.append(f"""d{r + 1} AS (
        SELECT d.day, d.x FROM d{r} d
        WHERE d.day <> (SELECT day FROM top{r}))""")
        rows.append(f"""SELECT CAST({r + 1} AS BIGINT) AS round,
           day, x AS x_micro,
           CAST((dev_n * 1000000) //
                CAST(CEIL(SQRT(CAST(n AS DOUBLE)
                               * (n * sxx - sx * sx))) AS BIGINT)
                AS BIGINT) AS r_micro
        FROM top{r}""")
    return "WITH " + ",\n".join(parts) + "\n" + "\nUNION ALL\n".join(rows)


@register(
    "esd_outlier_rounds",
    _esd_oracle_sql(),
    doc=f"X260 generalized ESD (Rosner) outlier test, {ESD_ROUNDS} "
        "rounds over daily mean event values (micro grid): each round "
        "folds exact BIGINT moments of the REMAINING days, flags the "
        "max-|x*n - sx| day (integer argmax, day tiebreak), reports "
        "R = |x - xbar|/s micro-snapped through one ceil'd sqrt, and "
        "removes the day before re-estimating. The masking-proof "
        "iterative outlier family next to X236's fixed-limit chart. "
        "Python replay + monotone-R laws.",
    tags=("X260", "X49", "X36", "X7", "X12"),
)
def esd_outlier_rounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _ev(spark, sf_dir)
    d = (ev.groupBy(F.date_trunc("day", "ts").cast("date").alias("day"))
         .agg(F.expr("CAST(SUM(CAST(ROUND(value * 1000000, 0) AS"
                     " BIGINT)) DIV COUNT(*) AS BIGINT)").alias("x"))
         .localCheckpoint())
    out = None
    for r in range(ESD_ROUNDS):
        m = d.agg(F.count("*").cast("long").alias("n"),
                  F.sum("x").cast("long").alias("sx"),
                  F.sum(F.col("x") * F.col("x")).cast("long")
                  .alias("sxx"))
        top = (d.crossJoin(F.broadcast(m))
               .select("day", "x",
                       F.abs(F.col("x") * F.col("n") - F.col("sx"))
                       .alias("dev_n"), "n", "sx", "sxx")
               .orderBy(F.desc("dev_n"), F.asc("day")).limit(1)
               .localCheckpoint())
        row = top.select(
            F.lit(r + 1).cast("long").alias("round"),
            "day", F.col("x").alias("x_micro"),
            F.expr("CAST((dev_n * 1000000) DIV"
                   " CAST(CEIL(SQRT(CAST(n AS DOUBLE)"
                   " * (n * sxx - sx * sx))) AS BIGINT) AS BIGINT)")
            .alias("r_micro"))
        out = row if out is None else out.unionByName(row)
        if r + 1 < ESD_ROUNDS:
            d = (d.join(top.select("day"), "day", "left_anti")
                 .localCheckpoint())
    return out


# --------------------------------------------------------------------------
# X269: Holt-Winters additive seasonal smoothing — the seasonal third
# of the exponential-smoothing family: X209 (Holt) tracks level+trend
# but cannot carry a weekly shape, X82 (STL) decomposes offline with
# no forecast recurrence; Holt-Winters is what a daily-operations
# forecaster actually runs. Season m=7, alpha=1/2, beta=1/4,
# gamma=1/2 — all dyadic, so every update is one exact integer floor
# division via the subtract-pmod identity (negative-seasonal-safe:
# Spark DIV truncates, DuckDB // floors; the identity makes both
# compute floor). Init: level = floor-mean of the first season,
# trend 0, seasonals = first-season deviations. The fold state is
# (l, b, s1..s7) — calendar-bounded at ANY data scale; the daily
# aggregate is the only data-sized pass. Spark runs the recurrence as
# ONE aggregate-HOF fold, the oracle as a recursive CTE (the X209
# engine-placement). Winters (1960); [EXT].
# --------------------------------------------------------------------------
HW_SEASON = 7


def _hw_exprs(fdiv, x, l, b, s1):
    """The three Holt-Winters updates as strings, fully inlined so
    both engines evaluate textually identical arithmetic. fdiv is the
    engine's exact floor-division builder (_fdiv / _fdiv_duck)."""
    l_new = fdiv(f"{x} - {s1} + {l} + {b}", 2)
    b_new = fdiv(f"({l_new}) - {l} + 3 * {b}", 4)
    s_new = fdiv(f"{x} - ({l_new}) + {s1}", 2)
    return l_new, b_new, s_new


def _hw_oracle_sql() -> str:
    m = HW_SEASON
    xs = " + ".join(f"x{i}" for i in range(1, m + 1))
    l0 = _fdiv_duck(xs, m)
    seed_s = ", ".join(
        f"x{i} - ({l0}) AS s{i}" for i in range(1, m + 1))
    l_new, b_new, s_new = _hw_exprs(
        _fdiv_duck, "i.xm", "h.l", "h.b", "h.s1")
    rot = ", ".join(f"h.s{i + 1}" for i in range(1, m))
    return f"""
    WITH RECURSIVE daily AS (
        SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
               CAST(COUNT(*) AS BIGINT) * 1000000 AS xm
        FROM events GROUP BY 1
    ),
    idx AS (
        SELECT day, xm, ROW_NUMBER() OVER (ORDER BY day) AS rn
        FROM daily
    ),
    init AS (
        SELECT {", ".join(f"MAX(CASE WHEN rn = {i} THEN xm END) AS x{i}"
                          for i in range(1, m + 1))}
        FROM idx WHERE rn <= {m}
    ),
    seed AS (
        SELECT CAST({m} AS BIGINT) AS rn,
               CAST(({l0}) AS BIGINT) AS l, CAST(0 AS BIGINT) AS b,
               {seed_s}
        FROM init
    ),
    hw(rn, day, xm, l, b, {", ".join(f"s{i}" for i in range(1, m + 1))},
       err) AS (
        SELECT rn, CAST(NULL AS DATE), CAST(NULL AS BIGINT), l, b,
               {", ".join(f"s{i}" for i in range(1, m + 1))},
               CAST(NULL AS BIGINT)
        FROM seed
        UNION ALL
        SELECT i.rn, i.day, i.xm,
               CAST(({l_new}) AS BIGINT),
               CAST(({b_new}) AS BIGINT),
               {rot}, CAST(({s_new}) AS BIGINT),
               i.xm - (h.l + h.b + h.s1)
        FROM hw h JOIN idx i ON i.rn = h.rn + 1
    )
    SELECT day, CAST(xm // 1000000 AS BIGINT) AS n,
           CAST(l AS BIGINT) AS level_micro,
           CAST(b AS BIGINT) AS trend_micro,
           CAST(s{m} AS BIGINT) AS seasonal_micro,
           CAST(err AS BIGINT) AS err_micro
    FROM hw WHERE rn > {m}
    """


@register(
    "holt_winters_daily",
    _hw_oracle_sql(),
    doc=f"X269 Holt-Winters additive seasonal smoothing (m={HW_SEASON},"
        " alpha=1/2, beta=1/4, gamma=1/2) of the daily event series: "
        "level/trend/seasonal recurrence as exact integer floor "
        "divisions (subtract-pmod identity, negative-seasonal-safe "
        "cross-engine); init = floor-mean level + first-season "
        "deviations; per-day level, trend, updated seasonal and "
        "one-step forecast error in micro units. Spark folds ONE "
        "aggregate HOF, the oracle a recursive CTE; fold state is "
        "calendar-bounded at any scale. Extends X209 (trend-only) "
        "with the seasonal component X82 only decomposes offline. "
        "Python replay + seasonal-rotation laws.",
    tags=("X269", "X209", "X82", "X14", "X7"),
)
def holt_winters_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    m = HW_SEASON
    ev = _ev(spark, sf_dir)
    daily = (ev.groupBy(F.date_trunc("day", "ts").cast("date")
                        .alias("day"))
             .agg((F.count("*") * 1000000).cast("long").alias("xm")))
    l_new, b_new, s_new = _hw_exprs(
        _fdiv, "ee.xm", "acc.l", "acc.b", "acc.s1")
    xs = " + ".join(f"ds[{i}].xm" for i in range(m))
    l0 = _fdiv(xs, m)
    seed_s = ", ".join(
        f"'s{i + 1}', ds[{i}].xm - CAST(({l0}) AS BIGINT)"
        for i in range(m))
    rot = ", ".join(f"'s{i}', acc.s{i + 1}" for i in range(1, m))
    arr = daily.agg(F.array_sort(F.collect_list(
        F.struct("day", "xm"))).alias("ds"))
    folded = arr.select(F.expr(f"""aggregate(
        slice(ds, {m + 1}, greatest(size(ds) - {m}, 0)),
        named_struct(
            'l', CAST(({l0}) AS BIGINT), 'b', CAST(0 AS BIGINT),
            {seed_s},
            'out', CAST(array() AS ARRAY<STRUCT<
                day DATE, n BIGINT, level_micro BIGINT,
                trend_micro BIGINT, seasonal_micro BIGINT,
                err_micro BIGINT>>)),
        (acc, ee) -> named_struct(
            'l', CAST(({l_new}) AS BIGINT),
            'b', CAST(({b_new}) AS BIGINT),
            {rot}, 's{m}', CAST(({s_new}) AS BIGINT),
            'out', array_append(acc.out, named_struct(
                'day', ee.day,
                'n', ee.xm DIV 1000000,
                'level_micro', CAST(({l_new}) AS BIGINT),
                'trend_micro', CAST(({b_new}) AS BIGINT),
                'seasonal_micro', CAST(({s_new}) AS BIGINT),
                'err_micro', ee.xm - (acc.l + acc.b + acc.s1)))))""")
        .alias("v"))
    return (folded.select(F.explode("v.out").alias("u"))
            .select("u.day", "u.n", "u.level_micro", "u.trend_micro",
                    "u.seasonal_micro", "u.err_micro"))


# --------------------------------------------------------------------------
# X275: binary-segmentation changepoint detection — the MULTIPLE-
# changepoint extension of the single-shift detectors (X85 CUSUM one
# level shift, X229/X261 Page-Hinkley one drift alarm): greedily add
# the split with the largest between-segment contrast, then recurse
# into the segments (Scott-Knott / binseg, the standard first pass
# before PELT). Gain of splitting segment [s, e] at k is the SSE drop
# n1*n2/(n1+n2) * (mean1 - mean2)^2, evaluated exactly as
# A = S1*n2 - S2*n1 over prefix sums, gain = A^2/(n1*n2*n) snapped to
# the micro grid by ONE textually-identical DOUBLE expression (A^2
# can pass 2^63 at large SF, so the square is computed in IEEE double
# on both engines); argmax over snapped integers, (gain DESC, day)
# tiebreak. BINSEG_SPLITS fixed greedy rounds (X157 deterministic-
# prefix discipline). The series is calendar-bounded, so every
# candidate frame is tiny at any data scale; the daily aggregate is
# the only data-sized pass. [EXT]
# --------------------------------------------------------------------------
BINSEG_SPLITS = 3


def _binseg_gain(a: str, n1: str, n2: str, n: str) -> str:
    return (f"CAST(ROUND(CAST({a} AS DOUBLE) * ({a}) * 1000000.0"
            f" / (CAST({n1} AS DOUBLE) * ({n2}) * ({n})), 0)"
            " AS BIGINT)")


def _binseg_oracle_sql() -> str:
    gain = _binseg_gain(
        "(d.cum - g.cum_lo) * (g.e - d.rn)"
        " - (g.cum_hi - d.cum) * (d.rn - g.s + 1)",
        "d.rn - g.s + 1", "g.e - d.rn", "g.e - g.s + 1")
    parts = ["""daily AS (
        SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
               CAST(COUNT(*) AS BIGINT) AS x
        FROM events GROUP BY 1
    ),
    idx AS (
        SELECT day, x, ROW_NUMBER() OVER (ORDER BY day) AS rn,
               SUM(x) OVER (ORDER BY day) AS cum
        FROM daily
    ),
    nn AS (SELECT MAX(rn) AS n, MAX(cum) AS total FROM idx),
    cps0 AS (
        SELECT CAST(NULL AS BIGINT) AS rn, CAST(NULL AS BIGINT) AS cum
        WHERE 1 = 0
    )"""]
    for r in range(1, BINSEG_SPLITS + 1):
        parts.append(f"""bounds{r} AS (
        SELECT CAST(0 AS BIGINT) AS b, CAST(0 AS BIGINT) AS cb
        UNION ALL SELECT rn, cum FROM cps{r - 1}
        UNION ALL SELECT n, total FROM nn
    ),
    segs{r} AS (
        SELECT b + 1 AS s, LEAD(b) OVER (ORDER BY b) AS e,
               cb AS cum_lo, LEAD(cb) OVER (ORDER BY b) AS cum_hi
        FROM bounds{r}
    ),
    pick{r} AS (
        SELECT rn, cum, day, s, e, n_left, n_right, sum_left,
               sum_right, gain_micro
        FROM (
            SELECT d.rn, d.cum, d.day, g.s, g.e,
                   d.rn - g.s + 1 AS n_left, g.e - d.rn AS n_right,
                   d.cum - g.cum_lo AS sum_left,
                   g.cum_hi - d.cum AS sum_right,
                   {gain} AS gain_micro
            FROM segs{r} g
            JOIN idx d ON d.rn >= g.s AND d.rn < g.e
            WHERE g.e IS NOT NULL
        ) ORDER BY gain_micro DESC, rn LIMIT 1
    ),
    cps{r} AS (
        SELECT rn, cum FROM cps{r - 1}
        UNION ALL SELECT rn, cum FROM pick{r}
    )""")
    rows = "\nUNION ALL\n".join(
        f"""SELECT CAST({r} AS BIGINT) AS round, day AS split_day,
           CAST(rn AS BIGINT) AS k, CAST(s AS BIGINT) AS seg_start,
           CAST(e AS BIGINT) AS seg_end,
           CAST(n_left AS BIGINT) AS n_left,
           CAST(n_right AS BIGINT) AS n_right,
           CAST(sum_left AS BIGINT) AS sum_left,
           CAST(sum_right AS BIGINT) AS sum_right,
           CAST(gain_micro AS BIGINT) AS gain_micro
    FROM pick{r}""" for r in range(1, BINSEG_SPLITS + 1))
    return "WITH " + ",\n    ".join(parts) + "\n" + rows


@register(
    "binseg_changepoints",
    _binseg_oracle_sql(),
    doc=f"X275 binary-segmentation changepoints of the daily event "
        f"series ({BINSEG_SPLITS} greedy rounds): each round splits "
        "the segment with the largest exact between-segment contrast "
        "gain A^2/(n1*n2*n) (A = S1*n2 - S2*n1 over prefix sums), "
        "snapped micro by one identical DOUBLE expression, argmax "
        "with (gain DESC, day) tiebreak. Extends X85/X229 single-"
        "shift detection to multiple changepoints; candidate frames "
        "are calendar-bounded at any scale. Python brute-force "
        "replay + SSE-decomposition laws.",
    tags=("X275", "X85", "X49", "X11", "X7"),
)
def binseg_changepoints(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = _ev(spark, sf_dir)
    daily = (ev.groupBy(F.date_trunc("day", "ts").cast("date")
                        .alias("day"))
             .agg(F.count("*").cast("long").alias("x")))
    wd = Window.orderBy("day")
    idx = (daily.select("day", "x",
                        F.row_number().over(wd).cast("long").alias("rn"),
                        F.sum("x").over(wd).cast("long").alias("cum"))
           # calendar-bounded frame drives every round: one partition,
           # plan truncated (X196/X268 tiny-frame + plan-text lessons)
           .repartition(1).localCheckpoint())
    top = idx.agg(F.max("rn").alias("n"), F.max("cum").alias("t")) \
        .first()
    n, total = int(top["n"]), int(top["t"])
    gain = _binseg_gain(
        "(cum - cum_lo) * (e - rn) - (cum_hi - cum) * (rn - s + 1)",
        "rn - s + 1", "e - rn", "e - s + 1")
    bounds = [(0, 0), (n, total)]
    out_rows = []
    for r in range(1, BINSEG_SPLITS + 1):
        bs = sorted(bounds)
        segs = spark.createDataFrame(
            [(lo + 1, hi, clo, chi)
             for (lo, clo), (hi, chi) in zip(bs, bs[1:])],
            "s long, e long, cum_lo long, cum_hi long")
        pick = (idx.join(F.broadcast(segs),
                         (F.col("rn") >= F.col("s"))
                         & (F.col("rn") < F.col("e")))
                .selectExpr("rn", "cum", "day", "s", "e",
                            "rn - s + 1 AS n_left", "e - rn AS n_right",
                            "cum - cum_lo AS sum_left",
                            "cum_hi - cum AS sum_right",
                            f"{gain} AS gain_micro")
                .orderBy(F.desc("gain_micro"), F.asc("rn")).limit(1)
                .first())
        # r7 ADVICE (low): with every remaining segment shorter than a
        # splittable run (tiny SF), no candidate exists — emit only the
        # completed rounds, matching the oracle's empty pick{r} CTEs.
        if pick is None:
            break
        out_rows.append((r, pick["day"], pick["rn"], pick["s"],
                         pick["e"], pick["n_left"], pick["n_right"],
                         pick["sum_left"], pick["sum_right"],
                         pick["gain_micro"]))
        bounds.append((int(pick["rn"]), int(pick["cum"])))
    return spark.createDataFrame(
        out_rows,
        "round BIGINT, split_day DATE, k BIGINT, seg_start BIGINT, "
        "seg_end BIGINT, n_left BIGINT, n_right BIGINT, "
        "sum_left BIGINT, sum_right BIGINT, gain_micro BIGINT")


# --------------------------------------------------------------------------
# X278: damped-trend exponential smoothing (Gardner-McKenzie 1985) —
# the third member of the exponential-smoothing family next to X209
# (linear Holt: trend extrapolates without bound) and X269 (Holt-
# Winters: adds weekly shape): the damping factor phi < 1 decays the
# trend geometrically, which is what production forecasters deploy
# when a linear trend over-shoots beyond a few steps. alpha=1/2,
# beta=1/4, phi=3/4 — all dyadic, so EVERY update is an exact integer
# floor division via the subtract-pmod identity (negative-trend-safe
# cross-engine: Spark DIV truncates, DuckDB // floors, the divisible
# numerator makes both compute floor):
#     phib  = fdiv(3*b, 4)                    -- phi * b
#     l_new = fdiv(x + l + phib, 2)           -- alpha damped-Holt
#     b_new = fdiv(l_new - l + 3*phib, 4)     -- beta  damped-Holt
# The h-step forecast is l + sum_{j<=h} phi^j * b, realized as the
# integer chain inc_1 = fdiv(3*b, 4), inc_{h+1} = fdiv(3*inc_h, 4) —
# a SECOND tiny fold over h = 1..HD_HORIZON carrying inc as a VALUE
# (nesting the expression 7 deep would expand 3^7 copies). Fold state
# is (l, b) — calendar-bounded at any scale; the daily aggregate is
# the only data-sized pass. Spark = two aggregate-HOF folds, oracle =
# two recursive CTEs (the X209/X269 engine placement). [EXT]
# --------------------------------------------------------------------------
HD_HORIZON = 7


def _hd_exprs(fdiv, x: str, l: str, b: str):
    phib = fdiv(f"3 * ({b})", 4)
    l_new = fdiv(f"{x} + {l} + ({phib})", 2)
    b_new = fdiv(f"({l_new}) - ({l}) + 3 * ({phib})", 4)
    return phib, l_new, b_new


def _hd_oracle_sql() -> str:
    phib, l_new, b_new = _hd_exprs(_fdiv_duck, "i.xm", "h.l", "h.b")
    inc1 = _fdiv_duck("3 * f.b", 4)
    incn = _fdiv_duck("3 * fc.inc", 4)
    return f"""
    WITH RECURSIVE daily AS (
        SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
               CAST(COUNT(*) AS BIGINT) * 1000000 AS xm
        FROM events GROUP BY 1
    ),
    idx AS (
        SELECT day, xm, ROW_NUMBER() OVER (ORDER BY day) AS rn
        FROM daily
    ),
    hw(rn, day, xm, l, b, err) AS (
        SELECT rn, day, xm, xm, CAST(0 AS BIGINT), CAST(NULL AS BIGINT)
        FROM idx WHERE rn = 1
        UNION ALL
        SELECT i.rn, i.day, i.xm,
               CAST(({l_new}) AS BIGINT),
               CAST(({b_new}) AS BIGINT),
               i.xm - (h.l + ({phib}))
        FROM hw h JOIN idx i ON i.rn = h.rn + 1
    ),
    fin AS (
        SELECT day, l, b FROM hw
        WHERE rn = (SELECT MAX(rn) FROM hw)
    ),
    fc(h, day, inc, f) AS (
        SELECT CAST(1 AS BIGINT), f.day,
               CAST(({inc1}) AS BIGINT),
               f.l + CAST(({inc1}) AS BIGINT)
        FROM fin f
        UNION ALL
        SELECT fc.h + 1, fc.day,
               CAST(({incn}) AS BIGINT),
               fc.f + CAST(({incn}) AS BIGINT)
        FROM fc WHERE fc.h < {HD_HORIZON}
    )
    SELECT 'fit' AS kind, day, CAST(xm // 1000000 AS BIGINT) AS n,
           CAST(l AS BIGINT) AS level_micro,
           CAST(b AS BIGINT) AS trend_micro,
           CAST(err AS BIGINT) AS err_micro
    FROM hw WHERE rn >= 2
    UNION ALL
    SELECT 'forecast', day + CAST(h AS INT), CAST(h AS BIGINT),
           CAST(f AS BIGINT), CAST(inc AS BIGINT),
           CAST(NULL AS BIGINT)
    FROM fc
    """


@register(
    "holt_damped_daily",
    _hd_oracle_sql(),
    doc="X278 damped-trend exponential smoothing (alpha=1/2, beta=1/4, "
        "phi=3/4; Gardner-McKenzie 1985) of the daily event series: "
        "level/trend recurrence with a geometrically damped trend as "
        "exact integer floor divisions (subtract-pmod identity, "
        "negative-trend-safe cross-engine), plus the 7-step damped "
        "forecast fan f_h = l + sum_{j<=h} phi^j b as an integer "
        "value-carrying chain (fold, not 3^h expression nesting). "
        "Spark = two aggregate-HOF folds, oracle = two recursive "
        "CTEs; fold state is calendar-bounded at any scale. Completes "
        "the smoothing family: X209 linear, X269 seasonal, X278 "
        "damped. Python replay + damping-monotonicity laws.",
    tags=("X278", "X209", "X269", "X14", "X7"),
)
def holt_damped_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _ev(spark, sf_dir)
    daily = (ev.groupBy(F.date_trunc("day", "ts").cast("date")
                        .alias("day"))
             .agg((F.count("*") * 1000000).cast("long").alias("xm")))
    phib, l_new, b_new = _hd_exprs(_fdiv, "ee.xm", "acc.l", "acc.b")
    arr = daily.agg(F.array_sort(F.collect_list(
        F.struct("day", "xm"))).alias("ds"))
    folded = arr.select(F.expr(f"""aggregate(
        slice(ds, 2, greatest(size(ds) - 1, 0)),
        named_struct(
            'd', ds[0].day, 'l', ds[0].xm, 'b', CAST(0 AS BIGINT),
            'out', CAST(array() AS ARRAY<STRUCT<
                kind STRING, day DATE, n BIGINT, level_micro BIGINT,
                trend_micro BIGINT, err_micro BIGINT>>)),
        (acc, ee) -> named_struct(
            'd', ee.day,
            'l', CAST(({l_new}) AS BIGINT),
            'b', CAST(({b_new}) AS BIGINT),
            'out', array_append(acc.out, named_struct(
                'kind', 'fit',
                'day', ee.day,
                'n', ee.xm DIV 1000000,
                'level_micro', CAST(({l_new}) AS BIGINT),
                'trend_micro', CAST(({b_new}) AS BIGINT),
                'err_micro', ee.xm - (acc.l + ({phib})))))
        )""").alias("v"))
    inc1 = _fdiv("3 * v.b", 4)
    incn = _fdiv("3 * acc.inc", 4)
    fc = folded.select("v", F.expr(f"""aggregate(
        sequence(2, {HD_HORIZON}),
        named_struct(
            'inc', CAST(({inc1}) AS BIGINT),
            'f', v.l + CAST(({inc1}) AS BIGINT),
            'out', array(named_struct(
                'kind', 'forecast',
                'day', date_add(v.d, 1),
                'n', CAST(1 AS BIGINT),
                'level_micro', v.l + CAST(({inc1}) AS BIGINT),
                'trend_micro', CAST(({inc1}) AS BIGINT),
                'err_micro', CAST(NULL AS BIGINT)))),
        (acc, h) -> named_struct(
            'inc', CAST(({incn}) AS BIGINT),
            'f', acc.f + CAST(({incn}) AS BIGINT),
            'out', array_append(acc.out, named_struct(
                'kind', 'forecast',
                'day', date_add(v.d, CAST(h AS INT)),
                'n', CAST(h AS BIGINT),
                'level_micro', acc.f + CAST(({incn}) AS BIGINT),
                'trend_micro', CAST(({incn}) AS BIGINT),
                'err_micro', CAST(NULL AS BIGINT)))))""").alias("w"))
    return (fc.select(F.explode(F.concat("v.out", "w.out")).alias("u"))
            .select("u.kind", "u.day", "u.n", "u.level_micro",
                    "u.trend_micro", "u.err_micro"))


# --------------------------------------------------------------------------
# X281: token-bucket rate-limiter audit — traffic-shaping simulation,
# the admission-control family none of the existing stream operators
# cover (X85/X229 detect drift, X271 counts frequencies; this REPLAYS
# the canonical rate-limit algorithm): each user owns a bucket of
# capacity TB_CAP refilled TB_REFILL tokens/day; a day's arrivals are
# admitted up to the available tokens, the rest rejected. The
# recurrence per (user, day) is
#     avail  = least(CAP, tokens + REFILL)
#     admit  = least(arrivals, avail)
#     tokens = avail - admit
# — pure integer min/max algebra, zero rounding anywhere. The day
# grid is calendar-bounded, so the per-user fold state is O(1) at any
# data scale; arrivals aggregate is the only data-sized pass, and the
# fold runs PER USER in parallel (grouped aggregate-HOF over a day->
# arrivals map), not per event. Oracle = recursive CTE over
# (user, day-index). Output: per-user admitted/rejected totals,
# throttled-day count, worst single-day rejection, final tokens. [EXT]
# --------------------------------------------------------------------------
TB_CAP = 3
TB_REFILL = 1


def _tb_oracle_sql() -> str:
    av = f"LEAST({TB_CAP}, s.tokens + {TB_REFILL})"
    aa = "COALESCE(a.a, 0)"
    ad = f"LEAST({aa}, {av})"
    rj = f"({aa} - {ad})"
    return f"""
    WITH RECURSIVE bounds AS (
        SELECT MIN(CAST(date_trunc('day', ts) AS DATE)) AS d0,
               CAST(date_diff('day',
                    MIN(CAST(date_trunc('day', ts) AS DATE)),
                    MAX(CAST(date_trunc('day', ts) AS DATE)))
                    + 1 AS BIGINT) AS nd
        FROM events
    ),
    arr AS (
        SELECT user_id,
               CAST(date_diff('day', b.d0,
                    CAST(date_trunc('day', ts) AS DATE))
                    + 1 AS BIGINT) AS rn,
               CAST(COUNT(*) AS BIGINT) AS a
        FROM events, bounds b GROUP BY 1, 2
    ),
    users AS (SELECT DISTINCT user_id FROM events),
    sim(user_id, rn, tokens, adm, rej, thr, mxr) AS (
        SELECT user_id, CAST(0 AS BIGINT), CAST({TB_CAP} AS BIGINT),
               CAST(0 AS BIGINT), CAST(0 AS BIGINT),
               CAST(0 AS BIGINT), CAST(0 AS BIGINT)
        FROM users
        UNION ALL
        SELECT s.user_id, s.rn + 1,
               CAST({av} - {ad} AS BIGINT),
               s.adm + {ad},
               s.rej + {rj},
               s.thr + CASE WHEN {rj} > 0 THEN 1 ELSE 0 END,
               GREATEST(s.mxr, {rj})
        FROM sim s
        CROSS JOIN bounds b
        LEFT JOIN arr a ON a.user_id = s.user_id AND a.rn = s.rn + 1
        WHERE s.rn < b.nd
    )
    SELECT s.user_id, s.adm AS admitted, s.rej AS rejected,
           s.thr AS throttled_days, s.mxr AS max_day_rejected,
           s.tokens AS end_tokens
    FROM sim s, bounds b WHERE s.rn = b.nd
    """


@register(
    "token_bucket_rate_audit",
    _tb_oracle_sql(),
    doc=f"X281 token-bucket rate-limiter audit (capacity {TB_CAP}, "
        f"refill {TB_REFILL}/day) replayed per user over the daily "
        "arrival series: admitted = least(arrivals, least(cap, "
        "tokens+refill)), remainder rejected — pure integer min/max "
        "algebra, no rounding anywhere. Per-user outputs: admitted/"
        "rejected totals, throttled days, worst-day rejection, final "
        "tokens. Spark folds a calendar-bounded day grid per user "
        "(grouped aggregate-HOF over a day->arrivals map; one "
        "data-sized pass), oracle = recursive CTE over (user, day). "
        "The admission-control family next to X85/X229's detectors "
        "and X271's frequency sketch. Python replay + conservation "
        "laws (admitted + rejected = arrivals; tokens within "
        "[0, cap]).",
    tags=("X281", "X85", "X271", "X14", "X7"),
)
def token_bucket_rate_audit(spark: SparkSession,
                            sf_dir: str) -> DataFrame:
    ev = _ev(spark, sf_dir)
    day = F.date_trunc("day", "ts").cast("date")
    bounds = (ev.agg(F.min(day).alias("d0"), F.max(day).alias("d1"))
              .select("d0", (F.datediff("d1", "d0") + 1).cast("long")
                      .alias("nd")))
    arr = (ev.crossJoin(F.broadcast(bounds))
           .select("user_id", "nd",
                   (F.datediff(day, F.col("d0")) + 1).cast("long")
                   .alias("rn"))
           .groupBy("user_id", "nd", "rn")
           .agg(F.count("*").cast("long").alias("a")))
    per_user = (arr.groupBy("user_id", "nd")
                .agg(F.map_from_entries(
                    F.collect_list(F.struct("rn", "a"))).alias("m")))
    aa = "COALESCE(element_at(m, d), 0L)"
    av = f"LEAST({TB_CAP}L, acc.tokens + {TB_REFILL}L)"
    ad = f"LEAST({aa}, {av})"
    rj = f"({aa} - {ad})"
    return (per_user.select(
        "user_id",
        F.expr(f"""aggregate(
            sequence(CAST(1 AS BIGINT), nd),
            named_struct(
                'tokens', CAST({TB_CAP} AS BIGINT),
                'adm', CAST(0 AS BIGINT), 'rej', CAST(0 AS BIGINT),
                'thr', CAST(0 AS BIGINT), 'mxr', CAST(0 AS BIGINT)),
            (acc, d) -> named_struct(
                'tokens', CAST({av} - {ad} AS BIGINT),
                'adm', acc.adm + {ad},
                'rej', acc.rej + {rj},
                'thr', acc.thr
                       + CASE WHEN {rj} > 0 THEN 1L ELSE 0L END,
                'mxr', GREATEST(acc.mxr, {rj})))""").alias("s"))
        .select("user_id", F.col("s.adm").alias("admitted"),
                F.col("s.rej").alias("rejected"),
                F.col("s.thr").alias("throttled_days"),
                F.col("s.mxr").alias("max_day_rejected"),
                F.col("s.tokens").alias("end_tokens")))


# --------------------------------------------------------------------------
# X279: PrefixSpan frequent-sequence DISCOVERY (Pei et al. 2001) —
# pattern-growth mining, the discovery counterpart of X170's
# fixed-triple support counter: instead of scoring all 125 triples,
# grow patterns level-wise from frequent prefixes only (downward
# closure) and extend each prefix through its PROJECTED database —
# the per-(user, prefix) frontier timestamp of the prefix's earliest
# occurrence, which is exact for subsequence existence (greedy
# first-occurrence argument, X170). Levels 1..3 with a relative
# minimum support (PS_MINSUP_PCT% of users): L1 = frequent types;
# L2 grows only frequent 1-prefixes by frequent items; L3 grows only
# frequent 2-prefixes. Every join is (user)-keyed with fan-out
# bounded by the frequent alphabet, never stream length; no per-user
# sequence is materialized. Output: every frequent pattern with its
# support and level. [EXT]
# --------------------------------------------------------------------------
PS_MINSUP_PCT = 30


def _ps_oracle_sql() -> str:
    return f"""
    WITH ev AS (
        SELECT user_id AS u, event_type AS t, epoch_us(ts) AS us
        FROM events
    ),
    nu AS (SELECT CAST(COUNT(DISTINCT u) AS BIGINT) AS n FROM ev),
    ms AS (SELECT (n * {PS_MINSUP_PCT}) // 100 + 1 AS m FROM nu),
    f1 AS (SELECT u, t AS a, MIN(us) AS t1 FROM ev GROUP BY u, t),
    l1 AS (
        SELECT a, CAST(COUNT(*) AS BIGINT) AS support
        FROM f1 GROUP BY a
        HAVING COUNT(*) >= (SELECT m FROM ms)
    ),
    p2 AS (
        SELECT f1.u, f1.a, e.t AS b, MIN(e.us) AS t2
        FROM f1
        JOIN l1 ON l1.a = f1.a
        JOIN ev e ON e.u = f1.u AND e.us > f1.t1
        JOIN l1 lb ON lb.a = e.t
        GROUP BY f1.u, f1.a, e.t
    ),
    l2 AS (
        SELECT a, b, CAST(COUNT(*) AS BIGINT) AS support
        FROM p2 GROUP BY a, b
        HAVING COUNT(*) >= (SELECT m FROM ms)
    ),
    p3 AS (
        SELECT p2.u, p2.a, p2.b, e.t AS c, MIN(e.us) AS t3
        FROM p2
        JOIN l2 ON l2.a = p2.a AND l2.b = p2.b
        JOIN ev e ON e.u = p2.u AND e.us > p2.t2
        JOIN l1 lc ON lc.a = e.t
        GROUP BY p2.u, p2.a, p2.b, e.t
    ),
    l3 AS (
        SELECT a, b, c, CAST(COUNT(*) AS BIGINT) AS support
        FROM p3 GROUP BY a, b, c
        HAVING COUNT(*) >= (SELECT m FROM ms)
    )
    SELECT a AS pattern, CAST(1 AS BIGINT) AS length, support FROM l1
    UNION ALL
    SELECT a || '->' || b, CAST(2 AS BIGINT), support FROM l2
    UNION ALL
    SELECT a || '->' || b || '->' || c, CAST(3 AS BIGINT), support
    FROM l3
    """


@register(
    "prefixspan_top_patterns",
    _ps_oracle_sql(),
    doc=f"X279 PrefixSpan pattern-growth sequence mining (levels 1-3, "
        f"minsup {PS_MINSUP_PCT}% of users): frequent prefixes grow "
        "through projected first-occurrence frontiers (exact for "
        "subsequence existence), candidates restricted to frequent "
        "items (downward closure) — the DISCOVERY counterpart of "
        "X170's fixed-triple support counter. User-keyed joins with "
        "frequent-alphabet-bounded fan-out; no per-user sequence ever "
        "materialized; all supports exact BIGINTs. Python replay + "
        "anti-monotonicity laws (support(p) >= support(p extended); "
        "every frequent k-pattern's prefix is frequent).",
    tags=("X279", "X170", "X128", "X7", "X3"),
)
def prefixspan_top_patterns(spark: SparkSession,
                            sf_dir: str) -> DataFrame:
    from ..caching import persist_tracked

    ev = persist_tracked(
        _ev(spark, sf_dir).select(
            F.col("user_id").alias("u"),
            F.col("event_type").alias("t"),
            F.unix_micros(F.col("ts").cast("timestamp")).alias("us")))
    nu = ev.select("u").distinct().count()
    minsup = (nu * PS_MINSUP_PCT) // 100 + 1
    f1 = persist_tracked(
        ev.groupBy("u", F.col("t").alias("a"))
        .agg(F.min("us").alias("t1")))
    l1 = persist_tracked(
        f1.groupBy("a").agg(F.count("*").cast("long").alias("support"))
        .filter(F.col("support") >= minsup))
    # level-2 growth: frequent 1-prefixes extended by frequent items
    # through the projected frontier t1
    p2 = persist_tracked(
        f1.join(F.broadcast(l1.select("a")), "a")
        .join(ev.select("u", F.col("t").alias("b"),
                        F.col("us").alias("usb")), "u")
        .join(F.broadcast(l1.select(F.col("a").alias("b"))), "b")
        .filter(F.col("usb") > F.col("t1"))
        .groupBy("u", "a", "b").agg(F.min("usb").alias("t2")))
    l2 = persist_tracked(
        p2.groupBy("a", "b")
        .agg(F.count("*").cast("long").alias("support"))
        .filter(F.col("support") >= minsup))
    p3 = (p2.join(F.broadcast(l2.select("a", "b")), ["a", "b"])
          .join(ev.select("u", F.col("t").alias("c"),
                          F.col("us").alias("usc")), "u")
          .join(F.broadcast(l1.select(F.col("a").alias("c"))), "c")
          .filter(F.col("usc") > F.col("t2"))
          .groupBy("u", "a", "b", "c").agg(F.min("usc").alias("t3")))
    l3 = (p3.groupBy("a", "b", "c")
          .agg(F.count("*").cast("long").alias("support"))
          .filter(F.col("support") >= minsup))
    out1 = l1.select(F.col("a").alias("pattern"),
                     F.lit(1).cast("long").alias("length"), "support")
    out2 = l2.select(
        F.concat_ws("->", "a", "b").alias("pattern"),
        F.lit(2).cast("long").alias("length"), "support")
    out3 = l3.select(
        F.concat_ws("->", "a", "b", "c").alias("pattern"),
        F.lit(3).cast("long").alias("length"), "support")
    return out1.unionByName(out2).unionByName(out3)


# --------------------------------------------------------------------------
# X285: Wald sequential probability ratio test (SPRT, Wald 1945) —
# sequential hypothesis testing, the family the batch tests (X245/
# X280/X283/X284 all fix n first) and the drift detectors (X85/X229
# alarm without error guarantees) both miss: monitor the daily
# purchase fraction and STOP the experiment the first day the
# cumulative log-likelihood ratio leaves (B, A), with guaranteed
# alpha/beta error rates. For Bernoulli H0: p=1/5 vs H1: p=3/10 at
# alpha=beta=1/20, the LLR after (K successes, N trials) is
#     LLR = K*ln(p1/p0) + (N-K)*ln((1-p1)/(1-p0))
# — a BIGINT fold of two Python-precomputed micro constants (the X99
# irrational-constant pattern; nothing engine-evaluated is
# transcendental), compared against precomputed micro thresholds
# ln((1-beta)/alpha), ln(beta/(1-alpha)). Output: the full daily
# monitoring trajectory with the latched decision state. Everything
# after the daily aggregate is calendar-bounded. [EXT]
# --------------------------------------------------------------------------
SPRT_EVENT = "purchase"
SPRT_C1_MICRO = 405465    # round(1e6 * ln(0.3 / 0.2))
SPRT_C2_MICRO = -133531   # round(1e6 * ln(0.7 / 0.8))
SPRT_A_MICRO = 2944439    # round(1e6 * ln(0.95 / 0.05))
SPRT_B_MICRO = -2944439   # round(1e6 * ln(0.05 / 0.95))


@register(
    "sprt_conversion_monitor",
    f"""
    WITH daily AS (
        SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CASE WHEN event_type = '{SPRT_EVENT}'
                             THEN 1 ELSE 0 END) AS BIGINT) AS k
        FROM events GROUP BY 1
    ),
    cum AS (
        SELECT day, n, k,
               SUM(n) OVER (ORDER BY day) AS cum_n,
               SUM(k) OVER (ORDER BY day) AS cum_k
        FROM daily
    ),
    traj AS (
        SELECT day, n, k, cum_n, cum_k,
               cum_k * {SPRT_C1_MICRO}
               + (cum_n - cum_k) * ({SPRT_C2_MICRO}) AS llr_micro
        FROM cum
    ),
    dec AS (
        SELECT day AS d_day,
               CASE WHEN llr_micro >= {SPRT_A_MICRO}
                    THEN 'accept_h1' ELSE 'accept_h0' END AS d_state
        FROM traj
        WHERE llr_micro >= {SPRT_A_MICRO}
           OR llr_micro <= {SPRT_B_MICRO}
        ORDER BY day LIMIT 1
    )
    SELECT t.day, t.n, t.k,
           -- cum_n/cum_k are SUM(...) OVER results — HUGEINT in
           -- DuckDB, LongType in Spark. CAST the OUTPUT columns so the
           -- attested types match (cum_n <= |events| — int64-safe at
           -- any SF; the r8 driver hash-red was this uncast HUGEINT,
           -- values matched throughout).
           CAST(t.cum_n AS BIGINT) AS cum_n,
           CAST(t.cum_k AS BIGINT) AS cum_k,
           CAST(t.llr_micro AS BIGINT) AS llr_micro,
           CASE WHEN d.d_day IS NULL OR t.day < d.d_day
                THEN 'continue' ELSE d.d_state END AS state
    FROM traj t LEFT JOIN dec d ON 1 = 1
    """,
    doc="X285 Wald SPRT monitoring of the daily purchase fraction "
        "(H0 p=1/5 vs H1 p=3/10, alpha=beta=1/20): cumulative LLR as "
        "a BIGINT fold of Python-precomputed micro log constants (X99 "
        "pattern — no engine-evaluated transcendental), thresholds "
        "ln((1-b)/a), ln(b/(1-a)) precomputed the same way, decision "
        "latched from the first boundary crossing. The SEQUENTIAL "
        "testing family next to the fixed-n tests (X245/X280/X283/"
        "X284) and the guarantee-free drift alarms (X85/X229). "
        "Everything after the daily aggregate is calendar-bounded. "
        "Python replay + latch-monotonicity laws.",
    tags=("X285", "X229", "X85", "X7", "X11"),
)
def sprt_conversion_monitor(spark: SparkSession,
                            sf_dir: str) -> DataFrame:
    ev = _ev(spark, sf_dir)
    daily = (ev.groupBy(F.date_trunc("day", "ts").cast("date")
                        .alias("day"))
             .agg(F.count("*").cast("long").alias("n"),
                  F.sum(F.when(F.col("event_type") == SPRT_EVENT, 1)
                        .otherwise(0)).cast("long").alias("k")))
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    traj = (daily.select(
        "day", "n", "k",
        F.sum("n").over(w).alias("cum_n"),
        F.sum("k").over(w).alias("cum_k"))
        .withColumn(
            "llr_micro",
            (F.col("cum_k") * SPRT_C1_MICRO
             + (F.col("cum_n") - F.col("cum_k")) * SPRT_C2_MICRO)
            .cast("long")))
    dec = (traj.filter((F.col("llr_micro") >= SPRT_A_MICRO)
                       | (F.col("llr_micro") <= SPRT_B_MICRO))
           .orderBy("day").limit(1)
           .select(F.col("day").alias("d_day"),
                   F.when(F.col("llr_micro") >= SPRT_A_MICRO,
                          "accept_h1").otherwise("accept_h0")
                   .alias("d_state")))
    return (traj.join(F.broadcast(dec), F.lit(True), "left")
            .select("day", "n", "k", "cum_n", "cum_k", "llr_micro",
                    F.when(F.col("d_day").isNull()
                           | (F.col("day") < F.col("d_day")),
                           "continue").otherwise(F.col("d_state"))
                    .alias("state")))


# --------------------------------------------------------------------------
# X290: Little's-law flow audit — OPERATIONAL FLOW analytics, the lens
# the interval family lacks (X46 unions intervals, X131 classifies
# pair relations, X176 accumulates cohort value): treat each order as
# a job active from o_orderdate to its last line shipment and audit
# L = lambda * W per calendar month. With lambda = A/D (arrivals per
# day) and W = sum(dur)/A (mean flow days of the month's arrivals),
# lambda*W = sum(dur)/D EXACTLY — so the audit reduces to two integer
# day-sums over the month: total flow-days of arrivals vs total
# active-days observed in the month (the boundary residual measures
# edge effects, zero in steady state). Exactness: durations and
# interval overlaps are exact integer day arithmetic; each output is
# ONE correctly-rounded division. The month table is CALENDAR-bounded
# and broadcast; each order joins only its few overlapping months —
# no data-sized shuffle beyond the per-order MAX(shipdate). [EXT]
# --------------------------------------------------------------------------
@register(
    "littles_law_flow_audit",
    """
    WITH jobs AS (
        SELECT o.o_orderkey, o.o_orderdate AS d0,
               MAX(l.l_shipdate) AS d1
        FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        GROUP BY 1, 2
    ),
    span AS (
        SELECT date_trunc('month', MIN(d0)) AS lo,
               date_trunc('month', MAX(d1)) AS hi
        FROM jobs
    ),
    months AS (
        SELECT CAST(unnest(generate_series(lo, hi,
                    INTERVAL 1 MONTH)) AS DATE) AS m
        FROM span
    ),
    md AS (
        SELECT m, CAST(date_diff('day', m, m + INTERVAL 1 MONTH)
                       AS BIGINT) AS d
        FROM months
    ),
    arr AS (
        SELECT date_trunc('month', d0) AS m,
               CAST(COUNT(*) AS BIGINT) AS a,
               CAST(SUM(date_diff('day', d0, d1) + 1) AS BIGINT)
                   AS wsum
        FROM jobs GROUP BY 1
    ),
    act AS (
        SELECT md.m,
               CAST(SUM(GREATEST(0,
                   date_diff('day',
                       GREATEST(j.d0, md.m),
                       LEAST(j.d1, CAST(md.m + INTERVAL 1 MONTH
                             AS DATE) - 1)) + 1)) AS BIGINT) AS ov
        FROM md JOIN jobs j
          ON j.d0 < CAST(md.m + INTERVAL 1 MONTH AS DATE)
         AND j.d1 >= md.m
        GROUP BY 1
    )
    SELECT md.m AS month, md.d AS days,
           COALESCE(arr.a, 0) AS arrivals,
           CAST(ROUND(CAST(COALESCE(arr.a, 0) * 1000000 AS DOUBLE)
                / md.d, 0) AS BIGINT) AS lam_micro,
           CASE WHEN COALESCE(arr.a, 0) > 0 THEN
               CAST(ROUND(CAST(arr.wsum * 1000000 AS DOUBLE) / arr.a,
                    0) AS BIGINT)
           ELSE 0 END AS w_micro,
           CAST(ROUND(CAST(COALESCE(act.ov, 0) * 1000000 AS DOUBLE)
                / md.d, 0) AS BIGINT) AS l_micro,
           CAST(ROUND(CAST(COALESCE(arr.wsum, 0) * 1000000 AS DOUBLE)
                / md.d, 0) AS BIGINT) AS lw_micro,
           CAST(ROUND(CAST(COALESCE(act.ov, 0) * 1000000 AS DOUBLE)
                / md.d, 0) AS BIGINT)
           - CAST(ROUND(CAST(COALESCE(arr.wsum, 0) * 1000000
                AS DOUBLE) / md.d, 0) AS BIGINT) AS resid_micro
    FROM md
    LEFT JOIN arr ON arr.m = md.m
    LEFT JOIN act ON act.m = md.m
    """,
    doc="X290 Little's-law flow audit of the order pipeline (job = "
        "orderdate to last line shipdate, month granularity): "
        "arrivals/day lambda, mean flow-time W of the month's "
        "arrivals, observed mean WIP L from exact interval-overlap "
        "day counts, and the lambda*W vs L residual — using the "
        "identity lambda*W = sum(flow days)/days so every output is "
        "ONE correctly-rounded division of exact integer day sums. "
        "The operational-flow family next to X46 (interval union), "
        "X131 (Allen relations), X176 (cohort LTV). Calendar-bounded "
        "month table broadcast against the per-order span aggregate. "
        "Python replay + steady-state identity laws.",
    tags=("X290", "X46", "X131", "X7", "X3"),
)
def littles_law_flow_audit(spark: SparkSession,
                           sf_dir: str) -> DataFrame:
    from ..caching import persist_tracked

    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    jobs = persist_tracked(
        o.join(li, li.l_orderkey == o.o_orderkey)
        .groupBy(F.col("o_orderkey"), F.col("o_orderdate").alias("d0"))
        .agg(F.max("l_shipdate").alias("d1")))
    span = jobs.agg(
        F.date_trunc("month", F.min("d0")).cast("date").alias("lo"),
        F.date_trunc("month", F.max("d1")).cast("date").alias("hi"))
    md = (span.selectExpr(
        "explode(sequence(lo, hi, interval 1 month)) AS m")
        .selectExpr("m",
                    "CAST(datediff(add_months(m, 1), m) AS BIGINT)"
                    " AS d"))
    arr = (jobs.groupBy(F.date_trunc("month", "d0").cast("date")
                        .alias("m"))
           .agg(F.count("*").cast("long").alias("a"),
                F.sum(F.expr("datediff(d1, d0) + 1")).cast("long")
                .alias("wsum")))
    act = (F.broadcast(md).join(
        jobs,
        (jobs.d0 < F.expr("add_months(m, 1)"))
        & (jobs.d1 >= F.col("m")))
        .groupBy("m")
        .agg(F.sum(F.expr(
            "GREATEST(0, datediff(LEAST(d1, date_sub(add_months(m, 1),"
            " 1)), GREATEST(d0, m)) + 1)")).cast("long").alias("ov")))
    return (md.join(arr, "m", "left").join(act, "m", "left")
            .selectExpr(
                "m AS month", "d AS days",
                "COALESCE(a, 0L) AS arrivals",
                "CAST(ROUND(CAST(COALESCE(a, 0L) * 1000000 AS DOUBLE)"
                " / d, 0) AS BIGINT) AS lam_micro",
                "CASE WHEN COALESCE(a, 0L) > 0 THEN"
                " CAST(ROUND(CAST(wsum * 1000000 AS DOUBLE) / a,"
                " 0) AS BIGINT)"
                " ELSE 0L END AS w_micro",
                "CAST(ROUND(CAST(COALESCE(ov, 0L) * 1000000"
                " AS DOUBLE) / d, 0) AS BIGINT) AS l_micro",
                "CAST(ROUND(CAST(COALESCE(wsum, 0L) * 1000000"
                " AS DOUBLE) / d, 0) AS BIGINT) AS lw_micro",
                "CAST(ROUND(CAST(COALESCE(ov, 0L) * 1000000"
                " AS DOUBLE) / d, 0) AS BIGINT)"
                " - CAST(ROUND(CAST(COALESCE(wsum, 0L) * 1000000"
                " AS DOUBLE) / d, 0) AS BIGINT) AS resid_micro"))


# --------------------------------------------------------------------------
# X291: Gumbel block-maxima fit — EXTREME-VALUE analysis, the tail
# family the center-focused series stack misses (X82/X209/X269 model
# means, X49/X236/X260 flag outliers but never EXTRAPOLATE them):
# weekly maxima of order totals are Gumbel-distributed under EVT
# type-I, and the method-of-moments fit (scale = sqrt(6)/pi * sd,
# loc = mean - gamma*scale) yields return levels
# RL(T) = loc - scale*ln(-ln(1 - 1/T)) — "the largest weekly order
# expected once per T weeks", the capacity-planning number. Exactness:
# block maxima are exact cents; mean is one correctly-rounded
# division; sd is one textually-identical SQRT of a DECIMAL/HUGEINT-
# exact sum of squares; the irrational constants sqrt(6)/pi, gamma,
# -ln(-ln(1-1/T)) are Python-precomputed micro integers (X99
# pattern), applied by exact half-up integer division on the widened
# product. Block table is CALENDAR-bounded. [EXT]
# --------------------------------------------------------------------------
GUM_SQRT6_PI_MICRO = 779697   # round(1e6 * sqrt(6)/pi)
GUM_GAMMA_MICRO = 577216      # round(1e6 * 0.5772156649...)
GUM_C10_MICRO = 2250367       # round(-1e6 * ln(-ln(0.90)))
GUM_C100_MICRO = 4600149      # round(-1e6 * ln(-ln(0.99)))


def _gum_halfup(prod: str, wide: str) -> str:
    # exact half-up division by 1e6 of a widened positive product
    return (f"(CAST({prod} AS {wide}) + 500000) "
            "{div} 1000000")


@register(
    "gumbel_weekly_maxima",
    f"""
    WITH blocks AS (
        SELECT CAST(date_trunc('week', o_orderdate) AS DATE) AS wk,
               CAST(MAX(CAST(FLOOR(o_totalprice * 100 + 0.5)
                    AS BIGINT)) AS BIGINT) AS m
        FROM orders GROUP BY 1
    ),
    agg AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS b,
               CAST(SUM(m) AS BIGINT) AS sm
        FROM blocks
    ),
    mean AS (
        SELECT b, CAST(ROUND(CAST(CAST(sm AS HUGEINT) * 1000000
                    AS DOUBLE) / b, 0) AS BIGINT) AS mean_micro
        FROM agg
    ),
    ssq AS (
        SELECT CAST(SUM(CAST(bl.m * 1000000 - mn.mean_micro
                 AS HUGEINT) * (bl.m * 1000000 - mn.mean_micro))
                 AS HUGEINT) AS v
        FROM blocks bl CROSS JOIN mean mn
    ),
    fit AS (
        SELECT mn.b, mn.mean_micro,
               CAST(ROUND({GUM_SQRT6_PI_MICRO}
                    * SQRT(CAST(ssq.v AS DOUBLE) / (mn.b - 1))
                    / 1000000, 0) AS BIGINT) AS scale_micro
        FROM mean mn CROSS JOIN ssq
    )
    SELECT b AS n_blocks, mean_micro, scale_micro,
           CAST(mean_micro - (CAST(scale_micro AS HUGEINT)
               * {GUM_GAMMA_MICRO} + 500000) // 1000000 AS BIGINT)
               AS loc_micro,
           CAST(mean_micro - (CAST(scale_micro AS HUGEINT)
               * {GUM_GAMMA_MICRO} + 500000) // 1000000
             + (CAST(scale_micro AS HUGEINT)
                * {GUM_C10_MICRO} + 500000) // 1000000 AS BIGINT)
               AS rl10_micro,
           CAST(mean_micro - (CAST(scale_micro AS HUGEINT)
               * {GUM_GAMMA_MICRO} + 500000) // 1000000
             + (CAST(scale_micro AS HUGEINT)
                * {GUM_C100_MICRO} + 500000) // 1000000 AS BIGINT)
               AS rl100_micro
    FROM fit
    """,
    doc="X291 Gumbel block-maxima fit of weekly maximum order totals "
        "(method of moments): exact cents maxima per calendar week, "
        "mean one correctly-rounded division, sd one textually-"
        "identical SQRT of a HUGEINT/DECIMAL-exact sum of squares, "
        "irrational constants sqrt(6)/pi, Euler gamma, "
        "-ln(-ln(1-1/T)) as Python-precomputed micro integers applied "
        "by exact half-up division of the widened product; 10- and "
        "100-week return levels. The EXTREME-VALUE tail family next "
        "to X82/X209/X269 (center models) and X49/X260 (outlier "
        "flags). Python replay + monotonicity laws (rl100 > rl10 > "
        "loc; scale > 0).",
    tags=("X291", "X260", "X82", "X7", "X14"),
)
def gumbel_weekly_maxima(spark: SparkSession,
                         sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    blocks = (o.groupBy(F.date_trunc("week", "o_orderdate")
                        .cast("date").alias("wk"))
              .agg(F.max(F.expr("CAST(FLOOR(o_totalprice * 100 + 0.5)"
                                " AS BIGINT)")).cast("long")
                   .alias("m")))
    from ..caching import persist_tracked

    blocks = persist_tracked(blocks)
    agg = blocks.agg(F.count("*").cast("long").alias("b"),
                     F.sum("m").cast("long").alias("sm"))
    mean = agg.selectExpr(
        "b",
        "CAST(ROUND(CAST(CAST(sm AS DECIMAL(38,0)) * 1000000"
        " AS DOUBLE) / b, 0) AS BIGINT) AS mean_micro")
    ssq = (blocks.crossJoin(F.broadcast(mean))
           .selectExpr(
               "CAST(m * 1000000 - mean_micro AS DECIMAL(38,0))"
               " * (m * 1000000 - mean_micro) AS sq")
           .agg(F.sum("sq").alias("v")))
    fit = (mean.crossJoin(F.broadcast(ssq))
           .selectExpr(
               "b", "mean_micro",
               f"CAST(ROUND({GUM_SQRT6_PI_MICRO}"
               " * SQRT(CAST(v AS DOUBLE) / (b - 1))"
               " / 1000000, 0) AS BIGINT) AS scale_micro"))
    return fit.selectExpr(
        "b AS n_blocks", "mean_micro", "scale_micro",
        "mean_micro - (CAST(scale_micro AS DECIMAL(38,0))"
        f" * {GUM_GAMMA_MICRO} + 500000) DIV 1000000 AS loc_micro",
        "mean_micro - (CAST(scale_micro AS DECIMAL(38,0))"
        f" * {GUM_GAMMA_MICRO} + 500000) DIV 1000000"
        " + (CAST(scale_micro AS DECIMAL(38,0))"
        f" * {GUM_C10_MICRO} + 500000) DIV 1000000 AS rl10_micro",
        "mean_micro - (CAST(scale_micro AS DECIMAL(38,0))"
        f" * {GUM_GAMMA_MICRO} + 500000) DIV 1000000"
        " + (CAST(scale_micro AS DECIMAL(38,0))"
        f" * {GUM_C100_MICRO} + 500000) DIV 1000000 AS rl100_micro")


# --------------------------------------------------------------------------
# X292: log-rank survival test — the two-group COMPARISON the survival
# family lacks (X83 Kaplan-Meier ESTIMATES one curve, X213 Cox scores
# a continuous covariate): do two user cohorts (deterministic
# user_id-parity split) differ in time from first event to first
# purchase, honoring right-censoring at stream end? The Mantel-Cox
# statistic folds the hypergeometric risk-set identity at each
# distinct event second: O1 - E1 with E1 = d*n1/n and
# V = d*n1*n0*(n-d) / (n^2*(n-1)). Exactness: durations snap to whole
# SECONDS (the duration grid is VALUE-bounded by the stream span, so
# the risk-set suffix windows stay fixed-size at any user count —
# X137/X283 precedent); per-time E1/V terms are each ONE correctly-
# rounded nano division of HUGEINT-widened products; the chi-square
# is ONE final DOUBLE division of the HUGEINT-exact squared
# difference. [EXT]
# --------------------------------------------------------------------------
@register(
    "logrank_purchase_groups",
    """
    WITH u AS (
        SELECT user_id, user_id % 2 AS g,
               MIN(epoch_us(ts)) AS t0_us,
               MIN(CASE WHEN event_type = 'purchase'
                        THEN epoch_us(ts) END) AS tp_us
        FROM events GROUP BY 1, 2
    ),
    wend AS (SELECT MAX(epoch_us(ts)) AS w_us FROM events),
    subj AS (
        SELECT u.g,
               CAST((COALESCE(u.tp_us, w.w_us) - u.t0_us) // 1000000
                    AS BIGINT) AS dur,
               CASE WHEN u.tp_us IS NULL THEN 0 ELSE 1 END AS ev
        FROM u CROSS JOIN wend w
    ),
    grid AS (
        SELECT dur,
               CAST(SUM(CASE WHEN g = 1 THEN 1 ELSE 0 END) AS BIGINT)
                   AS c1,
               CAST(SUM(CASE WHEN g = 0 THEN 1 ELSE 0 END) AS BIGINT)
                   AS c0,
               CAST(SUM(CASE WHEN g = 1 AND ev = 1 THEN 1 ELSE 0 END)
                   AS BIGINT) AS e1,
               CAST(SUM(CASE WHEN g = 0 AND ev = 1 THEN 1 ELSE 0 END)
                   AS BIGINT) AS e0
        FROM subj GROUP BY 1
    ),
    risk AS (
        SELECT dur, e1, e0,
               CAST(SUM(c1) OVER (ORDER BY dur DESC) AS BIGINT) AS n1,
               CAST(SUM(c0) OVER (ORDER BY dur DESC) AS BIGINT) AS n0
        FROM grid
    ),
    terms AS (
        SELECT e1, e0, n1, n0, e1 + e0 AS d, n1 + n0 AS n,
               CAST(ROUND(CAST(CAST(e1 + e0 AS HUGEINT) * n1
                    * 1000000000 AS DOUBLE) / (n1 + n0), 0) AS BIGINT)
                   AS e1_nano_t,
               CASE WHEN n1 + n0 > 1 THEN
                   CAST(ROUND(CAST(CAST(e1 + e0 AS HUGEINT) * n1 * n0
                        * (n1 + n0 - e1 - e0) * 1000000000 AS DOUBLE)
                        / (CAST(n1 + n0 AS HUGEINT) * (n1 + n0)
                           * (n1 + n0 - 1)), 0) AS BIGINT)
               ELSE 0 END AS v_nano_t
        FROM risk WHERE e1 + e0 > 0
    ),
    folded AS (
        SELECT CAST(SUM(e1) AS BIGINT) AS o1,
               CAST(SUM(e0) AS BIGINT) AS o0,
               CAST(SUM(e1_nano_t) AS BIGINT) AS e1_nano,
               CAST(SUM(v_nano_t) AS BIGINT) AS v_nano
        FROM terms
    ),
    counts AS (
        SELECT CAST(SUM(CASE WHEN g = 1 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n1_users,
               CAST(SUM(CASE WHEN g = 0 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n0_users
        FROM subj
    )
    SELECT c.n1_users, c.n0_users, f.o1, f.o0, f.e1_nano, f.v_nano,
           CASE WHEN f.v_nano > 0 THEN
               CAST(ROUND(CAST(CAST(f.o1 * 1000000000 - f.e1_nano
                    AS HUGEINT) * (f.o1 * 1000000000 - f.e1_nano)
                    AS DOUBLE) / (CAST(f.v_nano AS DOUBLE) * 1000.0),
                    0) AS BIGINT)
           ELSE 0 END AS chi2_micro
    FROM folded f CROSS JOIN counts c
    """,
    doc="X292 Mantel-Cox log-rank test comparing time-to-first-"
        "purchase between the user_id-parity cohorts with right-"
        "censoring at stream end: whole-second duration grid "
        "(VALUE-bounded by the stream span, so risk-set suffix "
        "windows stay fixed-size at any user count), hypergeometric "
        "E1/V terms one correctly-rounded nano division each over "
        "HUGEINT-widened products, chi-square one final DOUBLE "
        "division of the HUGEINT-exact squared difference. The "
        "two-group comparison next to X83 (KM estimation) and X213 "
        "(Cox score). Python replay + conservation laws "
        "(O1+O0 = total events; E1 <= sum d).",
    tags=("X292", "X83", "X213", "X7", "X11"),
)
def logrank_purchase_groups(spark: SparkSession,
                            sf_dir: str) -> DataFrame:
    from ..caching import persist_tracked

    ev = _ev(spark, sf_dir)
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    u = (ev.groupBy("user_id", (F.col("user_id") % 2).alias("g"))
         .agg(F.min(us).alias("t0_us"),
              F.min(F.when(F.col("event_type") == "purchase", us))
              .alias("tp_us")))
    wend = ev.agg(F.max(us).alias("w_us"))
    subj = persist_tracked(
        u.crossJoin(F.broadcast(wend))
        .selectExpr(
            "g",
            "CAST((COALESCE(tp_us, w_us) - t0_us) DIV 1000000"
            " AS BIGINT) AS dur",
            "CASE WHEN tp_us IS NULL THEN 0 ELSE 1 END AS ev"))
    grid = (subj.groupBy("dur")
            .agg(F.sum(F.when(F.col("g") == 1, 1).otherwise(0))
                 .cast("long").alias("c1"),
                 F.sum(F.when(F.col("g") == 0, 1).otherwise(0))
                 .cast("long").alias("c0"),
                 F.sum(F.when((F.col("g") == 1) & (F.col("ev") == 1),
                              1).otherwise(0)).cast("long").alias("e1"),
                 F.sum(F.when((F.col("g") == 0) & (F.col("ev") == 1),
                              1).otherwise(0)).cast("long")
                 .alias("e0")))
    w = (Window.orderBy(F.desc("dur"))
         .rowsBetween(Window.unboundedPreceding, 0))
    risk = grid.select(
        "dur", "e1", "e0",
        F.sum("c1").over(w).cast("long").alias("n1"),
        F.sum("c0").over(w).cast("long").alias("n0"))
    terms = (risk.filter(F.expr("e1 + e0 > 0"))
             .selectExpr(
                 "e1", "e0",
                 "CAST(ROUND(CAST(CAST(e1 + e0 AS DECIMAL(38,0)) * n1"
                 " * 1000000000 AS DOUBLE) / (n1 + n0), 0) AS BIGINT)"
                 " AS e1_nano_t",
                 "CASE WHEN n1 + n0 > 1 THEN"
                 " CAST(ROUND(CAST(CAST(e1 + e0 AS DECIMAL(38,0))"
                 " * n1 * n0"
                 " * (n1 + n0 - e1 - e0) * 1000000000 AS DOUBLE)"
                 " / (CAST(n1 + n0 AS DECIMAL(38,0)) * (n1 + n0)"
                 " * (n1 + n0 - 1)), 0) AS BIGINT)"
                 " ELSE 0L END AS v_nano_t"))
    folded = terms.agg(
        F.sum("e1").cast("long").alias("o1"),
        F.sum("e0").cast("long").alias("o0"),
        F.sum("e1_nano_t").cast("long").alias("e1_nano"),
        F.sum("v_nano_t").cast("long").alias("v_nano"))
    counts = subj.agg(
        F.sum(F.when(F.col("g") == 1, 1).otherwise(0)).cast("long")
        .alias("n1_users"),
        F.sum(F.when(F.col("g") == 0, 1).otherwise(0)).cast("long")
        .alias("n0_users"))
    return (folded.crossJoin(F.broadcast(counts))
            .selectExpr(
                "n1_users", "n0_users", "o1", "o0", "e1_nano",
                "v_nano",
                "CASE WHEN v_nano > 0 THEN"
                " CAST(ROUND(CAST(CAST(o1 * 1000000000 - e1_nano"
                " AS DECIMAL(38,0)) * (o1 * 1000000000 - e1_nano)"
                " AS DOUBLE) / (CAST(v_nano AS DOUBLE) * 1000.0),"
                " 0) AS BIGINT)"
                " ELSE 0L END AS chi2_micro"))
