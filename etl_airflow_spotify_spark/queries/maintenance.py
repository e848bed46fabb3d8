"""Incremental-maintenance queries: CDC merge over the synthetic tables.

The reference pipeline rebuilds its whole output every run
(/root/reference/scripts/load.py writes full snapshots); at 100 TB a
rebuild is not an option, so the engine needs an upsert/merge primitive.
``cdc_merge_upsert`` treats ``customer`` as the maintained snapshot and
derives a changelog from ``events`` (latest event per user wins:
'error' events retract the profile, anything else updates the balance),
hash-checked against a DuckDB replay of the same merge.
"""

from __future__ import annotations

import os

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..catalog import load_table
from ..operators.cdc import cdc_merge
from ..registry import register


@register(
    "cdc_merge_upsert",
    """
    WITH latest AS (
        SELECT user_id, event_type, value FROM (
            SELECT user_id, event_type, value,
                   ROW_NUMBER() OVER (PARTITION BY user_id
                                      ORDER BY ts DESC, event_id DESC) AS rn
            FROM events
        ) WHERE rn = 1
    ),
    ch AS (
        SELECT user_id AS c_custkey,
               CASE WHEN event_type = 'error' THEN 'D' ELSE 'U' END AS op,
               ROUND(value * 1000, 2) AS c_acctbal
        FROM latest
    )
    SELECT COALESCE(s.c_custkey, ch.c_custkey) AS c_custkey,
           s.c_name,
           COALESCE(ch.c_acctbal, s.c_acctbal) AS c_acctbal,
           s.c_mktsegment,
           CASE WHEN ch.c_custkey IS NULL THEN 'kept' ELSE 'updated' END
               AS merge_action
    FROM customer s FULL OUTER JOIN ch ON s.c_custkey = ch.c_custkey
    WHERE ch.op IS NULL OR ch.op <> 'D'
    """,
    doc="CDC/SCD merge: latest event per user becomes an upsert "
        "('error' -> delete) applied to the customer snapshot via "
        "cdc_merge — one window shuffle + one full-outer join, "
        "column-level coalesce for partial updates (events carry no "
        "name/segment, so those keep their old values). The pattern "
        "that replaces full snapshot rebuilds at 100 TB.",
    tags=("X3", "X10", "X14"),
)
def cdc_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    ev = load_table(spark, sf_dir, "events")
    changes = ev.select(
        F.col("user_id").alias("c_custkey"), "ts", "event_id",
        F.when(F.col("event_type") == "error", "D").otherwise("U").alias("op"),
        F.round(F.col("value") * 1000, 2).alias("c_acctbal"))
    merged = cdc_merge(cust, changes, "c_custkey",
                       seq_cols=["ts", "event_id"])
    changed_keys = changes.select("c_custkey").distinct()
    return (merged
            .join(changed_keys.withColumn("_hit", F.lit(1)),
                  "c_custkey", "left")
            .select("c_custkey", "c_name", "c_acctbal", "c_mktsegment",
                    F.when(F.col("_hit").isNull(), "kept")
                    .otherwise("updated").alias("merge_action")))


_ONE_SHOT_ORACLE = """
    WITH latest AS (
        SELECT user_id, event_type, value FROM (
            SELECT user_id, event_type, value,
                   ROW_NUMBER() OVER (PARTITION BY user_id
                                      ORDER BY ts DESC, event_id DESC) AS rn
            FROM events
        ) WHERE rn = 1
    ),
    ch AS (
        SELECT user_id AS c_custkey,
               CASE WHEN event_type = 'error' THEN 'D' ELSE 'U' END AS op,
               'cdc:' || CAST(user_id AS VARCHAR) AS c_name,
               ROUND(value * 1000, 2) AS c_acctbal,
               upper(event_type) AS c_mktsegment
        FROM latest
    )
    SELECT COALESCE(s.c_custkey, ch.c_custkey) AS c_custkey,
           CASE WHEN ch.c_custkey IS NULL THEN s.c_name
                ELSE ch.c_name END AS c_name,
           ROUND(CASE WHEN ch.c_custkey IS NULL THEN s.c_acctbal
                      ELSE ch.c_acctbal END, 2) AS c_acctbal,
           CASE WHEN ch.c_custkey IS NULL THEN s.c_mktsegment
                ELSE ch.c_mktsegment END AS c_mktsegment
    FROM customer s FULL OUTER JOIN ch ON s.c_custkey = ch.c_custkey
    WHERE ch.op IS NULL OR ch.op <> 'D'
    """


def _customer_changes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The events changelog projected as full-row customer changes."""
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        F.col("user_id").alias("c_custkey"), "ts", "event_id",
        F.when(F.col("event_type") == "error", "D").otherwise("U")
        .alias("op"),
        F.concat(F.lit("cdc:"), F.col("user_id").cast("string"))
        .alias("c_name"),
        F.round(F.col("value") * 1000, 2).alias("c_acctbal"),
        F.upper("event_type").alias("c_mktsegment"))


def _versioned_customer(spark: SparkSession, sf_dir: str,
                        changes: DataFrame) -> DataFrame:
    from ..operators.cdc import init_versioned

    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_acctbal", "c_mktsegment")
    return init_versioned(cust, changes, ["ts", "event_id"])


def _finalized(snap: DataFrame) -> DataFrame:
    from ..operators.cdc import finalize_versioned

    out = finalize_versioned(snap, ["ts", "event_id"])
    return out.select("c_custkey", "c_name",
                      F.round("c_acctbal", 2).alias("c_acctbal"),
                      "c_mktsegment")


@register(
    "cdc_merge_incremental",
    _ONE_SHOT_ORACLE,
    doc="Order-independent incremental CDC: the events changelog is "
        "deliberately split into 4 INTERLEAVED slices (event_id % 4 — "
        "each slice spans the whole time range, so changes arrive out "
        "of order across slices) and folded into a versioned customer "
        "snapshot with cdc_apply_versioned (per-key seq guard + delete "
        "tombstones, full-row upserts). The oracle replays the ONE-SHOT "
        "latest-change merge — a hash match proves the fold converges "
        "to the same table no matter how the changelog is sliced, the "
        "property that lets a 100 TB snapshot absorb micro-batches and "
        "late backfills without rebuilds.",
    tags=("X31", "X3", "X10", "X13"),
)
def cdc_merge_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.cdc import cdc_apply_versioned

    changes = _customer_changes(spark, sf_dir)
    snap = _versioned_customer(spark, sf_dir, changes)
    for i in range(4):
        snap = cdc_apply_versioned(
            snap, changes.filter(F.pmod("event_id", F.lit(4)) == i),
            "c_custkey", seq_cols=["ts", "event_id"])
    return _finalized(snap)


@register(
    "scd2_customer_history",
    """
    WITH ch AS (
        SELECT user_id AS c_custkey, ts, event_id,
               CASE WHEN event_type = 'error' THEN 'D' ELSE 'U' END AS op,
               'cdc:' || CAST(user_id AS VARCHAR) AS c_name,
               ROUND(value * 1000, 2) AS c_acctbal,
               upper(event_type) AS c_mktsegment
        FROM events
    ),
    base AS (
        SELECT c_custkey, CAST(NULL AS TIMESTAMP) AS ts,
               CAST(NULL AS BIGINT) AS event_id, 'I' AS op,
               c_name, c_acctbal, c_mktsegment
        FROM customer
    ),
    hist AS (SELECT * FROM base UNION ALL SELECT * FROM ch),
    v AS (
        SELECT *, LEAD(ts) OVER (
                   PARTITION BY c_custkey
                   ORDER BY ts ASC NULLS FIRST, event_id ASC NULLS FIRST
               ) AS valid_to
        FROM hist
    )
    SELECT c_custkey, c_name, ROUND(c_acctbal, 2) AS c_acctbal,
           c_mktsegment, ts AS valid_from, valid_to,
           (valid_to IS NULL) AS is_current
    FROM v WHERE op <> 'D'
    """,
    doc="SCD TYPE 2: every change to a customer opens a new row version "
        "and closes the previous one (valid_from/valid_to/is_current), "
        "keeping ALL history point-in-time queryable — the audit table "
        "a reproducible-training pipeline pairs with its current "
        "snapshot ('which profile did the model see on date t?'). "
        "One union + ONE window (lead over the per-key change order): "
        "a single shuffle on the key, no join at all. Deletes close "
        "the preceding version and vanish — a deleted key has no "
        "current row until a later re-insert opens one. Exact LEAD "
        "replay as the DuckDB oracle.",
    tags=("X31", "X10", "X11"),
)
def scd2_customer_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.cdc import scd2_history

    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_acctbal", "c_mktsegment")
    changes = _customer_changes(spark, sf_dir)
    hist = scd2_history(cust, changes, "c_custkey", "ts",
                        seq_cols=["ts", "event_id"])
    return hist.select(
        "c_custkey", "c_name",
        F.round("c_acctbal", 2).alias("c_acctbal"),
        "c_mktsegment", "valid_from", "valid_to", "is_current")


@register(
    "snapshot_diff_audit",
    """
    WITH latest AS (
        SELECT user_id, event_type, value FROM (
            SELECT user_id, event_type, value,
                   ROW_NUMBER() OVER (PARTITION BY user_id
                                      ORDER BY ts DESC, event_id DESC) AS rn
            FROM events
        ) WHERE rn = 1
    ),
    ch AS (
        SELECT user_id AS c_custkey,
               CASE WHEN event_type = 'error' THEN 'D' ELSE 'U' END AS op,
               'cdc:' || CAST(user_id AS VARCHAR) AS c_name,
               ROUND(value * 1000, 2) AS c_acctbal,
               upper(event_type) AS c_mktsegment
        FROM latest
    ),
    merged AS (
        SELECT COALESCE(s.c_custkey, ch.c_custkey) AS c_custkey,
               CASE WHEN ch.c_custkey IS NULL THEN s.c_name
                    ELSE ch.c_name END AS c_name,
               CASE WHEN ch.c_custkey IS NULL THEN s.c_acctbal
                    ELSE ch.c_acctbal END AS c_acctbal,
               CASE WHEN ch.c_custkey IS NULL THEN s.c_mktsegment
                    ELSE ch.c_mktsegment END AS c_mktsegment
        FROM customer s FULL OUTER JOIN ch ON s.c_custkey = ch.c_custkey
        WHERE ch.op IS NULL OR ch.op <> 'D'
    )
    SELECT COALESCE(o.c_custkey, n.c_custkey) AS c_custkey,
           CASE WHEN o.c_custkey IS NULL THEN 'added'
                WHEN n.c_custkey IS NULL THEN 'deleted'
                ELSE 'changed' END AS change_type,
           ROUND(o.c_acctbal, 2) AS old_acctbal,
           ROUND(n.c_acctbal, 2) AS new_acctbal,
           o.c_mktsegment AS old_segment, n.c_mktsegment AS new_segment
    FROM customer o FULL OUTER JOIN merged n ON o.c_custkey = n.c_custkey
    WHERE o.c_custkey IS NULL OR n.c_custkey IS NULL
       OR NOT (o.c_name IS NOT DISTINCT FROM n.c_name
               AND o.c_acctbal IS NOT DISTINCT FROM n.c_acctbal
               AND o.c_mktsegment IS NOT DISTINCT FROM n.c_mktsegment)
    """,
    doc="Pipeline-run audit: the row-level diff between the customer "
        "snapshot BEFORE and AFTER a full-row CDC merge — one "
        "null-safe FULL OUTER join classifying rows added / deleted / "
        "changed, unchanged rows dropped so the output is change-"
        "sized, never table-sized. This is 'what did this run actually "
        "do?': diff(input, merge(input, changelog)) recovers the "
        "EFFECTIVE changelog, and the oracle replays merge + diff "
        "relationally, hash-pinning both. Pairs with bucketed layouts "
        "(both sides keyed alike -> shuffle-free join at 100 TB).",
    tags=("X31", "X3", "X13"),
)
def snapshot_diff_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.cdc import cdc_merge, snapshot_diff

    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_acctbal", "c_mktsegment")
    # full-row changes (cdc_merge coalesces, so supply every column)
    changes = _customer_changes(spark, sf_dir)
    merged = cdc_merge(cust, changes, "c_custkey",
                       seq_cols=["ts", "event_id"])
    d = snapshot_diff(cust, merged, "c_custkey")
    return d.select(
        "c_custkey", "change_type",
        F.round("old_c_acctbal", 2).alias("old_acctbal"),
        F.round("new_c_acctbal", 2).alias("new_acctbal"),
        F.col("old_c_mktsegment").alias("old_segment"),
        F.col("new_c_mktsegment").alias("new_segment"))


@register(
    "table_fingerprints",
    """
    SELECT 'customer' AS tbl, CAST(COUNT(*) AS BIGINT) AS n_rows,
           bit_xor(('0x' || substr(md5(
               COALESCE(CAST(c_custkey AS VARCHAR), '∅') || '|' ||
               COALESCE(c_name, '∅') || '|' ||
               COALESCE(CAST(c_acctbal AS VARCHAR), '∅') || '|' ||
               COALESCE(c_mktsegment, '∅')), 1, 15))::BIGINT)
           AS fingerprint
    FROM customer
    UNION ALL
    SELECT 'nation', CAST(COUNT(*) AS BIGINT),
           bit_xor(('0x' || substr(md5(
               COALESCE(CAST(n_nationkey AS VARCHAR), '∅') || '|' ||
               COALESCE(n_name, '∅')), 1, 15))::BIGINT)
    FROM nation
    UNION ALL
    SELECT 'orders', CAST(COUNT(*) AS BIGINT),
           bit_xor(('0x' || substr(md5(
               COALESCE(CAST(o_orderkey AS VARCHAR), '∅') || '|' ||
               COALESCE(CAST(o_custkey AS VARCHAR), '∅') || '|' ||
               COALESCE(o_orderstatus, '∅')), 1, 15))::BIGINT)
    FROM orders
    """,
    doc="Order-independent table fingerprints: per row, a 60-bit "
        "md5 of the null-sentineled column rendering; per table, the "
        "XOR-aggregate of row hashes + exact count. XOR is commutative/"
        "associative with no overflow, so the fingerprint is invariant "
        "to row order, partitioning and merge plan — two replicas (or "
        "two engines, as the oracle proves) agree iff their row "
        "multisets agree (up to XOR collision). THE cheap cross-"
        "replica/post-migration verification at 100 TB: one scan, one "
        "8-byte answer per table, no sort; on mismatch, "
        "snapshot_diff_audit localizes the rows.",
    tags=("X7", "X14", "X13"),
)
def table_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    def fp(name: str, cols: list[str]) -> DataFrame:
        t = load_table(spark, sf_dir, name)
        rendered = F.concat_ws(
            "|", *[F.coalesce(F.col(c).cast("string"), F.lit("∅"))
                   for c in cols])
        h = F.conv(F.substring(F.md5(rendered), 1, 15), 16, 10).cast("long")
        return (t.agg(F.count("*").cast("long").alias("n_rows"),
                      F.bit_xor(h).alias("fingerprint"))
                .select(F.lit(name).alias("tbl"), "n_rows", "fingerprint"))

    return (fp("customer", ["c_custkey", "c_name", "c_acctbal",
                            "c_mktsegment"])
            .unionByName(fp("nation", ["n_nationkey", "n_name"]))
            .unionByName(fp("orders", ["o_orderkey", "o_custkey",
                                       "o_orderstatus"])))


@register(
    "ivm_signed_aggregate",
    """
    WITH e AS (
        SELECT user_id, ROUND(value, 2) AS v,
               CASE WHEN event_type = 'error' THEN -1 ELSE 1 END AS w
        FROM events
    )
    SELECT c_mktsegment,
           CAST(SUM(w) AS BIGINT) AS net_events,
           CAST(ROUND(SUM(w * CAST(v AS DECIMAL(18,6))), 2) AS DOUBLE)
               AS net_value
    FROM e JOIN customer ON user_id = c_custkey
    GROUP BY c_mktsegment
    """,
    doc="Incremental view maintenance by SIGNED MULTIPLICITIES (the "
        "z-set/abelian-group trick of differential dataflow / DBSP): "
        "the per-segment revenue view is maintained by folding 4 "
        "INTERLEAVED changelog slices — each slice aggregates to "
        "(group, net_rows, net_value) partials and merges into the "
        "state by addition; 'error' events carry weight -1, i.e. "
        "RETRACTIONS, and fully-retracted groups net to zero and drop "
        "out. Weighted value sums run in DECIMAL so the group "
        "operation is exact and the fold provably order-independent — "
        "the oracle replays the ONE-SHOT aggregate, so a hash match "
        "proves fold(any slicing) == recompute. At 100 TB the view "
        "never re-reads history: each batch shuffles only its own "
        "groups (map-side combined).",
    tags=("X31", "X7", "X13"),
)
def ivm_signed_aggregate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.ivm import merge_state, signed_partial

    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment")
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id",
        F.round("value", 2).alias("v"),
        F.when(F.col("event_type") == "error", -1).otherwise(1).alias("w"))
    enriched = ev.join(cust, ev.user_id == cust.c_custkey)
    state = None
    for i in range(4):
        part = signed_partial(
            enriched.filter(F.pmod("event_id", F.lit(4)) == i),
            ["c_mktsegment"], F.col("w"), F.col("v"))
        state = merge_state(state, part, ["c_mktsegment"])
    return state.select(
        "c_mktsegment",
        F.col("_net_rows").alias("net_events"),
        F.round("_net_val", 2).cast("double").alias("net_value"))


@register(
    "stream_cdc_upsert",
    _ONE_SHOT_ORACLE,
    doc="Streaming CDC sink: the changelog arrives as a file stream "
        "(4 interleaved slice files, maxFilesPerTrigger=1 -> 4 real "
        "micro-batches in whatever order the source discovers them) and "
        "foreachBatch folds each batch into the versioned snapshot with "
        "cdc_apply_versioned — the foreachBatch-MERGE pattern behind "
        "every streaming-upsert sink. Because the fold is "
        "order-independent (seq guard + tombstones), the final table is "
        "EXACTLY the one-shot merge, so a streaming query with "
        "nondeterministic batch boundaries still hash-checks against a "
        "deterministic SQL oracle.",
    tags=("X23", "X31", "X3"),
)
def stream_cdc_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import shutil

    from ..operators.cdc import cdc_apply_versioned
    from ..streaming.windows import fold_stream_foreachbatch

    changes = _customer_changes(spark, sf_dir)
    suffix = os.path.basename(os.path.normpath(sf_dir)).replace(".", "_")
    feed = os.path.join("spark-warehouse", f"cdc_feed_{suffix}")
    ckpt = os.path.join("spark-warehouse", f"cdc_ckpt_{suffix}")
    # fresh feed + checkpoint per run: a reused checkpoint would replay
    # nothing and the fold would see zero batches
    for d in (feed, ckpt):
        shutil.rmtree(d, ignore_errors=True)
    for i in range(4):
        (changes.filter(F.pmod("event_id", F.lit(4)) == i)
         .coalesce(1).write.mode("append").parquet(feed))

    stream = (spark.readStream.schema(changes.schema)
              .option("maxFilesPerTrigger", 1).parquet(feed))
    init = _versioned_customer(spark, sf_dir, changes)

    def fold(state, batch_df):
        snap = state if state is not None else init
        # localCheckpoint: the fold's lineage would otherwise deepen by
        # one window+join per micro-batch for the stream's lifetime
        return cdc_apply_versioned(
            snap, batch_df, "c_custkey",
            seq_cols=["ts", "event_id"]).localCheckpoint()

    (final,) = fold_stream_foreachbatch(stream, fold, ckpt)
    return _finalized(final if final is not None else init)


# (child_table, fk_col, parent_table, pk_col) — the test schema's FK web.
FK_EDGES = [
    ("lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("orders", "o_custkey", "customer", "c_custkey"),
    ("customer", "c_nationkey", "nation", "n_nationkey"),
    ("supplier", "s_nationkey", "nation", "n_nationkey"),
    ("nation", "n_regionkey", "region", "r_regionkey"),
]


@register(
    "fk_integrity_audit",
    "\nUNION ALL\n".join(
        f"""SELECT '{child}.{fk}' AS fk_edge,
               CAST(COUNT(*) AS BIGINT) AS n_child_rows,
               CAST(SUM(CASE WHEN {fk} IS NULL THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_null_fk,
               CAST(SUM(CASE WHEN {fk} IS NOT NULL AND p.{pk} IS NULL
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_orphans
        FROM {child} c LEFT JOIN {parent} p ON c.{fk} = p.{pk}"""
        for child, fk, parent, pk in FK_EDGES),
    doc="Referential-integrity audit over the whole FK web: per edge, "
        "child rowcount, NULL FKs, and orphans (child keys missing in "
        "the parent). Each edge is a left join + conditional counts "
        "shipping only the (fk, pk) columns. Only the fixed-cardinality "
        "dimensions (nation, region) carry an explicit broadcast hint; "
        "SF-scaled parents (orders, part, customer, supplier) are left "
        "to AQE, which broadcasts them while they fit and shuffles "
        "when they don't — a forced broadcast of a fact-sized parent "
        "would OOM at exactly the scale an audit matters. The standard "
        "pre-flight data-quality gate before any star-schema join "
        "pipeline.",
    tags=("X14", "X3"),
)
def fk_integrity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    fixed_card_parents = {"nation", "region"}
    out = None
    for child, fk, parent, pk in FK_EDGES:
        c = load_table(spark, sf_dir, child).select(fk)
        p = load_table(spark, sf_dir, parent).select(
            F.col(pk).alias("_pk"))
        if parent in fixed_card_parents:
            p = F.broadcast(p)
        edge = (c.join(p, F.col(fk) == F.col("_pk"), "left")
                .agg(F.lit(f"{child}.{fk}").alias("fk_edge"),
                     F.count("*").cast("long").alias("n_child_rows"),
                     F.sum(F.col(fk).isNull().cast("int")).cast("long")
                     .alias("n_null_fk"),
                     F.sum((F.col(fk).isNotNull()
                            & F.col("_pk").isNull()).cast("int"))
                     .cast("long").alias("n_orphans")))
        out = edge if out is None else out.unionAll(edge)
    return out


SKEW_TOPK = 5


@register(
    "join_key_skew_profile",
    f"""
    WITH keys AS (
        SELECT 'l_partkey' AS key_col, l_partkey AS k FROM lineitem
        UNION ALL
        SELECT 'l_suppkey' AS key_col, l_suppkey AS k FROM lineitem
        UNION ALL
        SELECT 'o_custkey' AS key_col, o_custkey AS k FROM orders
    ),
    freq AS (
        SELECT key_col, k, COUNT(*) AS c FROM keys GROUP BY key_col, k
    ),
    tot AS (
        SELECT key_col, CAST(SUM(c) AS BIGINT) AS total,
               CAST(COUNT(*) AS BIGINT) AS n_distinct,
               CAST(MAX(c) AS BIGINT) AS max_c
        FROM freq GROUP BY key_col
    ),
    top AS (
        SELECT key_col,
               CAST(SUM(c) AS BIGINT) AS topk_rows
        FROM (SELECT key_col, c,
                     row_number() OVER (PARTITION BY key_col
                                        ORDER BY c DESC, k) AS rn
              FROM freq)
        WHERE rn <= {SKEW_TOPK}
        GROUP BY key_col
    )
    SELECT t.key_col, total, n_distinct, max_c,
           ROUND(max_c::DOUBLE * n_distinct / total, 4) AS skew_ratio,
           ROUND(topk_rows::DOUBLE / total, 4) AS topk_share
    FROM tot t JOIN top USING (key_col)
    """,
    doc="Join-key skew profiler: per candidate shuffle key, distinct "
        "count, heaviest-key weight, skew ratio (max/mean multiplicity) "
        "and top-5 key share. One map-side-combinable count per key "
        "column + a tiny per-key-column fold — the diagnostic that "
        "decides between plain, salted, and broadcast join strategies "
        "BEFORE burning a 100 TB shuffle.",
    tags=("X14", "X7", "X10"),
)
def join_key_skew_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    li = load_table(spark, sf_dir, "lineitem")
    od = load_table(spark, sf_dir, "orders")
    keys = (li.select(F.lit("l_partkey").alias("key_col"),
                      F.col("l_partkey").alias("k"))
            .unionAll(li.select(F.lit("l_suppkey"),
                                F.col("l_suppkey")))
            .unionAll(od.select(F.lit("o_custkey"),
                                F.col("o_custkey"))))
    freq = keys.groupBy("key_col", "k").agg(F.count("*").alias("c"))
    tot = freq.groupBy("key_col").agg(
        F.sum("c").cast("long").alias("total"),
        F.count("*").cast("long").alias("n_distinct"),
        F.max("c").cast("long").alias("max_c"))
    w = Window.partitionBy("key_col").orderBy(F.desc("c"), F.asc("k"))
    top = (freq.withColumn("rn", F.row_number().over(w))
           .filter(F.col("rn") <= SKEW_TOPK)
           .groupBy("key_col")
           .agg(F.sum("c").cast("long").alias("topk_rows")))
    return (tot.join(top, "key_col")
            .select("key_col", "total", "n_distinct", "max_c",
                    F.round(F.col("max_c") * F.col("n_distinct")
                            / F.col("total"), 4).alias("skew_ratio"),
                    F.round(F.col("topk_rows") / F.col("total"), 4)
                    .alias("topk_share")))


@register(
    "ivm_join_delta",
    """
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_lines,
           CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,6))
                          * (1 - CAST(l_discount AS DECIMAL(18,6)))), 2)
                AS DOUBLE) AS revenue
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_orderkey % 89 <> 0
    GROUP BY o_orderpriority
    """,
    doc="X31 incremental JOIN-view maintenance (z-set bilinear rule): "
        "revenue-by-priority over orders x lineitem, maintained from a "
        "planted changelog (orderkey%97=0 orders arrive, lineitems with "
        "orderkey%89=0 retract) as view_old + d(AxB), where d(AxB) = "
        "dAxB + AxdB + dAxdB with sign products — never re-joining the "
        "new snapshots. DECIMAL value sums keep signed cancellation "
        "exact, so the incremental result hash-matches the oracle's "
        "DIRECT recompute on the updated tables: the strongest "
        "equivalence an IVM path can claim.",
    tags=("X31", "X3", "X7"),
)
def ivm_join_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.ivm import delta_join_terms, merge_state, signed_partial

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority")
    lines = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("o_orderkey"),
        "l_extendedprice", "l_discount")

    a_old = orders.filter(F.col("o_orderkey") % 97 != 0)
    da = (orders.filter(F.col("o_orderkey") % 97 == 0)
          .withColumn("_wa", F.lit(1)))
    b_old = lines
    db = (lines.filter(F.col("o_orderkey") % 89 == 0)
          .withColumn("_wb", F.lit(-1)))

    val = (F.col("l_extendedprice").cast("decimal(18,6)")
           * (F.lit(1) - F.col("l_discount").cast("decimal(18,6)")))

    view_old = signed_partial(
        a_old.join(b_old, "o_orderkey").withColumn("_w", F.lit(1)),
        ["o_orderpriority"], F.col("_w"), val)
    delta = signed_partial(
        delta_join_terms(a_old, da, b_old, db, "o_orderkey"),
        ["o_orderpriority"], F.col("_w"), val)
    final = merge_state(view_old, delta, ["o_orderpriority"])
    return final.select(
        "o_orderpriority",
        F.col("_net_rows").alias("n_lines"),
        F.round(F.col("_net_val"), 2).cast("double").alias("revenue"))


@register(
    "schema_evolution_read",
    """
    WITH unioned AS (
        SELECT event_id, user_id, value, NULL AS event_type
        FROM events WHERE event_id % 2 = 0
        UNION ALL BY NAME
        SELECT event_id, user_id, value, event_type
        FROM events WHERE event_id % 2 = 1
    )
    SELECT COALESCE(event_type, '<pre-schema>') AS event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(SUM(value), 2) AS total_value
    FROM unioned GROUP BY COALESCE(event_type, '<pre-schema>')
    """,
    doc="Schema-evolution read: two parquet batches written with "
        "DIFFERENT schemas (the old ingest lacked event_type) are read "
        "as one table via mergeSchema — Spark unions footers and "
        "null-fills missing columns per file, the capability every "
        "long-lived 100 TB table needs when producers add fields. "
        "Missing-column rows are bucketed under '<pre-schema>'. The "
        "oracle replays the split with UNION ALL BY NAME on the "
        "original table (layout is invisible to results).",
    tags=("X1", "X14", "S7"),
)
def schema_evolution_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil

    ev = load_table(spark, sf_dir, "events")
    suffix = os.path.basename(os.path.normpath(sf_dir)).replace(".", "_")
    path = os.path.join("spark-warehouse", f"evolved_events_{suffix}")
    shutil.rmtree(path, ignore_errors=True)
    # batch 1: the "old producer" schema (no event_type column)
    (ev.filter(F.col("event_id") % 2 == 0)
     .select("event_id", "user_id", "value")
     .coalesce(4).write.mode("append").parquet(path))
    # batch 2: the evolved schema
    (ev.filter(F.col("event_id") % 2 == 1)
     .select("event_id", "user_id", "value", "event_type")
     .coalesce(4).write.mode("append").parquet(path))

    merged = spark.read.option("mergeSchema", "true").parquet(path)
    return (merged.groupBy(
        F.coalesce("event_type", F.lit("<pre-schema>")).alias("event_type"))
        .agg(F.count("*").cast("long").alias("n"),
             F.round(F.sum("value"), 2).alias("total_value")))


DQ_CHECKS = (
    ("completeness_l_quantity", 1.0),
    ("range_l_quantity_1_50", 1.0),
    ("range_l_discount_0_01", 1.0),
    ("domain_l_returnflag", 1.0),
    ("unique_orderkey_linenumber", 0.999),
    ("fk_lineitem_orders", 1.0),
    ("ship_after_order", 0.99),
)


@register(
    "data_quality_audit",
    f"""
    WITH j AS (
        SELECT l.*, o.o_orderkey AS ok, o.o_orderdate
        FROM lineitem l LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
    ),
    m AS (
        SELECT COUNT(*) AS n,
               COUNT(l_quantity) AS qty_nonnull,
               COUNT(*) FILTER (l_quantity BETWEEN 1 AND 50) AS qty_in,
               COUNT(*) FILTER (l_discount BETWEEN 0 AND 0.1) AS disc_in,
               COUNT(*) FILTER (l_returnflag IN ('A', 'N', 'R')) AS flag_in,
               COUNT(DISTINCT (l_orderkey, l_linenumber)) AS pk_distinct,
               COUNT(ok) AS fk_matched,
               COUNT(*) FILTER (l_shipdate >= o_orderdate) AS ship_ok
        FROM j
    ),
    long AS (
        SELECT 'completeness_l_quantity' AS check_name,
               qty_nonnull::DOUBLE / n AS metric, 1.0::DOUBLE AS threshold FROM m
        UNION ALL SELECT 'range_l_quantity_1_50', qty_in::DOUBLE / n, 1.0::DOUBLE FROM m
        UNION ALL SELECT 'range_l_discount_0_01', disc_in::DOUBLE / n, 1.0::DOUBLE FROM m
        UNION ALL SELECT 'domain_l_returnflag', flag_in::DOUBLE / n, 1.0::DOUBLE FROM m
        UNION ALL SELECT 'unique_orderkey_linenumber',
                         pk_distinct::DOUBLE / n, 0.999::DOUBLE FROM m
        UNION ALL SELECT 'fk_lineitem_orders', fk_matched::DOUBLE / n, 1.0::DOUBLE FROM m
        UNION ALL SELECT 'ship_after_order', ship_ok::DOUBLE / n, 0.99::DOUBLE FROM m
    )
    SELECT check_name, ROUND(metric, 6) AS metric, threshold,
           CASE WHEN metric >= threshold THEN 1 ELSE 0 END AS passed
    FROM long
    """,
    doc="X47 Deequ-style data-quality constraint suite: completeness, "
        "value-range, domain-membership, key-uniqueness, referential "
        "and temporal-sanity checks over lineitem in ONE wide aggregate "
        "(plus the distinct-PK count) unpivoted to a (check, metric, "
        "threshold, passed) report. The synthetic data genuinely fails "
        "two checks — (orderkey, linenumber) is only ~76% unique and "
        "~49% of shipdates precede the order date — so the audit "
        "demonstrates real violations, not vacuous passes. Single scan "
        "+ one broadcast-size join; all metrics are count ratios, "
        "exact cross-engine.",
    tags=("X47", "X7", "X14", "X2"),
)
def data_quality_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    j = li.join(o, li["l_orderkey"] == o["o_orderkey"], "left")
    m = j.agg(
        F.count("*").alias("n"),
        F.count("l_quantity").alias("qty_nonnull"),
        F.count(F.when(F.col("l_quantity").between(1, 50), 1)).alias("qty_in"),
        F.count(F.when(F.col("l_discount").between(0.0, 0.1), 1)).alias("disc_in"),
        F.count(F.when(F.col("l_returnflag").isin("A", "N", "R"), 1)).alias("flag_in"),
        F.countDistinct("l_orderkey", "l_linenumber").alias("pk_distinct"),
        F.count("o_orderkey").alias("fk_matched"),
        F.count(F.when(F.col("l_shipdate") >= F.col("o_orderdate"), 1)).alias("ship_ok"),
    )
    num = {"completeness_l_quantity": "qty_nonnull",
           "range_l_quantity_1_50": "qty_in",
           "range_l_discount_0_01": "disc_in",
           "domain_l_returnflag": "flag_in",
           "unique_orderkey_linenumber": "pk_distinct",
           "fk_lineitem_orders": "fk_matched",
           "ship_after_order": "ship_ok"}
    stack_args = ", ".join(
        f"'{name}', cast({num[name]} as double) / n, cast({thr} as double)"
        for name, thr in DQ_CHECKS)
    long_df = m.select(F.expr(
        f"stack({len(DQ_CHECKS)}, {stack_args}) "
        "as (check_name, metric, threshold)"))
    return long_df.select(
        "check_name", F.round("metric", 6).alias("metric"), "threshold",
        F.when(F.col("metric") >= F.col("threshold"), 1).otherwise(0)
        .alias("passed"))


@register(
    "orders_pointintime_dim",
    """
    WITH ch AS (
        SELECT user_id AS c_custkey, ts, event_id,
               CASE WHEN event_type = 'error' THEN 'D' ELSE 'U' END AS op,
               'cdc:' || CAST(user_id AS VARCHAR) AS c_name,
               ROUND(value * 1000, 2) AS c_acctbal,
               upper(event_type) AS c_mktsegment
        FROM events
    ),
    base AS (
        SELECT c_custkey, CAST(NULL AS TIMESTAMP) AS ts,
               CAST(NULL AS BIGINT) AS event_id, 'I' AS op,
               c_name, c_acctbal, c_mktsegment
        FROM customer
    ),
    hist AS (SELECT * FROM base UNION ALL SELECT * FROM ch),
    v AS (
        SELECT *, LEAD(ts) OVER (
                   PARTITION BY c_custkey
                   ORDER BY ts ASC NULLS FIRST, event_id ASC NULLS FIRST
               ) AS valid_to
        FROM hist
    ),
    versions AS (SELECT * FROM v WHERE op <> 'D')
    SELECT COALESCE(h.c_mktsegment, '<deleted-gap>') AS segment_at_order,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           ROUND(SUM(o.o_totalprice), 2) AS total_price
    FROM orders o LEFT JOIN versions h
      ON o.o_custkey = h.c_custkey
     AND (h.ts IS NULL OR o.o_orderdate >= h.ts)
     AND (h.valid_to IS NULL OR o.o_orderdate < h.valid_to)
    GROUP BY 1
    """,
    doc="X55 point-in-time dimension join: every order joins the SCD2 "
        "customer version that was valid ON ITS ORDER DATE ('which "
        "profile did the model see when this example was generated?'). "
        "Equi-join on the customer key with the interval containment "
        "as a residual predicate — per-key version counts are change-"
        "bounded, so the fan-out is bounded and the only shuffle is "
        "the key shuffle; orders falling inside a deleted period "
        "surface as '<deleted-gap>' via the LEFT join. Exact LEAD-"
        "replay oracle.",
    tags=("X55", "X31", "X3", "X11"),
)
def orders_pointintime_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.cdc import scd2_history

    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_acctbal", "c_mktsegment")
    changes = _customer_changes(spark, sf_dir)
    hist = scd2_history(cust, changes, "c_custkey", "ts",
                        seq_cols=["ts", "event_id"])
    h = hist.select("c_custkey", "c_mktsegment",
                    F.col("valid_from").cast("timestamp_ntz").alias("vf"),
                    F.col("valid_to").cast("timestamp_ntz").alias("vt"))
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey", F.col("o_orderdate").cast("timestamp_ntz").alias("od"),
        "o_totalprice")
    cond = ((o["o_custkey"] == h["c_custkey"])
            & (h["vf"].isNull() | (o["od"] >= h["vf"]))
            & (h["vt"].isNull() | (o["od"] < h["vt"])))
    return (o.join(h, cond, "left")
            .groupBy(F.coalesce("c_mktsegment", F.lit("<deleted-gap>"))
                     .alias("segment_at_order"))
            .agg(F.count("*").cast("long").alias("n_orders"),
                 F.round(F.sum("o_totalprice"), 2).alias("total_price")))


# --------------------------------------------------------------------------
# X72: k-anonymity generalization ladder. ONE corpus aggregate builds
# the finest quasi-identifier groups; because the generalization levels
# NEST, the coarser counts fold as window sums over that group-
# cardinality table — no second scan, no Expand (ROLLUP would replicate
# every input row once per level; the window-sum plan is asserted
# Expand-free in test_k_anonymity_single_rollup_pass). Each finest
# group then learns the minimal generalization that reaches k=5.
# --------------------------------------------------------------------------
K_ANON = 5


@register(
    "k_anonymity_generalization",
    f"""
    WITH base AS (
        SELECT c_mktsegment, c_nationkey,
               CAST(FLOOR(c_acctbal / 1000) AS BIGINT) AS bal_band
        FROM customer
    ),
    l0 AS (SELECT c_mktsegment, c_nationkey, bal_band,
                  CAST(COUNT(*) AS BIGINT) AS n0
           FROM base GROUP BY 1, 2, 3),
    l1 AS (SELECT c_mktsegment, c_nationkey, CAST(COUNT(*) AS BIGINT) AS n1
           FROM base GROUP BY 1, 2),
    l2 AS (SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n2
           FROM base GROUP BY 1)
    SELECT l0.c_mktsegment, l0.c_nationkey, l0.bal_band, n0, n1, n2,
           CASE WHEN n0 >= {K_ANON} THEN 0
                WHEN n1 >= {K_ANON} THEN 1
                WHEN n2 >= {K_ANON} THEN 2
                ELSE 3 END AS level_needed
    FROM l0 JOIN l1 USING (c_mktsegment, c_nationkey)
    JOIN l2 USING (c_mktsegment)
    """,
    doc=f"X72 k-anonymity (k={K_ANON}) generalization ladder over the "
        "quasi-identifiers (segment, nation, account-balance band): ONE "
        "corpus aggregate builds the finest groups; the coarser levels "
        "nest, so they fold as window sums over the group-cardinality "
        "table (no second scan, no Expand). Each finest group reports "
        "the minimal level that reaches k — the privacy audit that "
        "decides how much a public data release must coarsen.",
    tags=("X72", "X9", "X7"),
)
def k_anonymity_generalization(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    base = cust.select(
        "c_mktsegment", "c_nationkey",
        F.floor(F.col("c_acctbal") / 1000).cast("long").alias("bal_band"))
    # ONE corpus aggregate builds the finest level; the coarser levels
    # NEST, so they fold as window sums over the group-cardinality
    # table — no second scan, no Expand, no rollup-cache juggling.
    from pyspark.sql import Window
    l0 = (base.groupBy("c_mktsegment", "c_nationkey", "bal_band")
          .agg(F.count("*").cast("long").alias("n0")))
    w1 = Window.partitionBy("c_mktsegment", "c_nationkey")
    w2 = Window.partitionBy("c_mktsegment")
    out = (l0.withColumn("n1", F.sum("n0").over(w1).cast("long"))
           .withColumn("n2", F.sum("n0").over(w2).cast("long")))
    lvl = (F.when(F.col("n0") >= K_ANON, 0)
           .when(F.col("n1") >= K_ANON, 1)
           .when(F.col("n2") >= K_ANON, 2)
           .otherwise(3))
    return out.select("c_mktsegment", "c_nationkey", "bal_band",
                      "n0", "n1", "n2", lvl.alias("level_needed"))


# --------------------------------------------------------------------------
# X74: GDPR right-to-be-forgotten cascade audit. The deletion set is a
# pure md5 function of the customer key, so customer and orders never
# join anything — ONE conditional aggregate per table; only lineitem
# (which lacks the customer key) joins its parent orders to inherit the
# verdict, the real FK-cascade shape. Reports per-table blast radius.
# --------------------------------------------------------------------------
GDPR_DEL_PCT = 5


def _gdpr_bucket_sql(col: str) -> str:
    return (f"(('0x' || substr(md5(CAST({col} AS VARCHAR)), 1, 15))::BIGINT"
            f" % 100)")


@register(
    "gdpr_delete_cascade",
    f"""
    WITH c AS (
        SELECT 'customer' AS tbl, CAST(COUNT(*) AS BIGINT) AS n_total,
               CAST(SUM(CASE WHEN {_gdpr_bucket_sql('c_custkey')}
                             < {GDPR_DEL_PCT} THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_deleted
        FROM customer
    ),
    o AS (
        SELECT 'orders' AS tbl, CAST(COUNT(*) AS BIGINT) AS n_total,
               CAST(SUM(CASE WHEN {_gdpr_bucket_sql('o_custkey')}
                             < {GDPR_DEL_PCT} THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_deleted
        FROM orders
    ),
    l AS (
        SELECT 'lineitem' AS tbl, CAST(COUNT(*) AS BIGINT) AS n_total,
               CAST(SUM(CASE WHEN {_gdpr_bucket_sql('o_custkey')}
                             < {GDPR_DEL_PCT} THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_deleted
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    )
    SELECT tbl, n_total, n_deleted, n_total - n_deleted AS n_remaining
    FROM (SELECT * FROM c UNION ALL SELECT * FROM o UNION ALL
          SELECT * FROM l)
    """,
    doc=f"X74 GDPR delete-cascade audit: a deterministic md5 "
        f"{GDPR_DEL_PCT}% of customers is marked for erasure; the "
        "audit reports total/deleted/remaining per table down the FK "
        "chain. The deletion verdict is a pure key function, so "
        "customer and orders are single conditional aggregates (no "
        "join, no second scan); lineitem inherits via its parent-order "
        "join — the one genuinely required cascade join.",
    tags=("X74", "X3", "X7", "X13"),
)
def gdpr_delete_cascade(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .sampling import hash_bucket

    def audit(df: DataFrame, tbl: str, key: str) -> DataFrame:
        deleted = F.when(hash_bucket(F.col(key)) < GDPR_DEL_PCT, 1) \
                   .otherwise(0)
        return df.agg(
            F.lit(tbl).alias("tbl"),
            F.count("*").cast("long").alias("n_total"),
            F.sum(deleted).cast("long").alias("n_deleted"))

    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = (load_table(spark, sf_dir, "lineitem").select("l_orderkey")
          .join(orders.select("o_orderkey", "o_custkey"),
                F.col("l_orderkey") == F.col("o_orderkey")))
    out = (audit(cust, "customer", "c_custkey")
           .unionByName(audit(orders, "orders", "o_custkey"))
           .unionByName(audit(li, "lineitem", "o_custkey")))
    return out.select("tbl", "n_total", "n_deleted",
                      (F.col("n_total") - F.col("n_deleted"))
                      .alias("n_remaining"))


# --------------------------------------------------------------------------
# X77: join-size profiler — the planner question "how many rows will
# this join emit?" answered WITHOUT running the join: per-key counts on
# each side (map-side combinable), then sum-of-products over the
# (small) key-count tables. The third estimate prices a self-join,
# where the naive answer (run it) is quadratic.
# --------------------------------------------------------------------------
@register(
    "join_size_profile",
    """
    WITH lo AS (SELECT l_orderkey AS k, COUNT(*) AS c FROM lineitem
                GROUP BY 1),
    oo AS (SELECT o_orderkey AS k, COUNT(*) AS c FROM orders GROUP BY 1),
    lp AS (SELECT l_partkey AS k, COUNT(*) AS c FROM lineitem GROUP BY 1),
    oc AS (SELECT o_custkey AS k, COUNT(*) AS c FROM orders GROUP BY 1),
    cc AS (SELECT c_custkey AS k, COUNT(*) AS c FROM customer GROUP BY 1),
    est AS (
        SELECT 'lineitem*orders@orderkey' AS join_name,
               (SELECT CAST(SUM(c) AS BIGINT) FROM lo) AS left_rows,
               (SELECT CAST(SUM(c) AS BIGINT) FROM oo) AS right_rows,
               CAST(COALESCE(SUM(lo.c * oo.c), 0) AS BIGINT) AS out_rows,
               CAST(COALESCE(MAX(lo.c * oo.c), 0) AS BIGINT) AS max_key_rows
        FROM lo JOIN oo USING (k)
        UNION ALL
        SELECT 'lineitem*lineitem@partkey',
               (SELECT CAST(SUM(c) AS BIGINT) FROM lp),
               (SELECT CAST(SUM(c) AS BIGINT) FROM lp),
               CAST(COALESCE(SUM(lp.c * lp.c), 0) AS BIGINT),
               CAST(COALESCE(MAX(lp.c * lp.c), 0) AS BIGINT)
        FROM lp
        UNION ALL
        SELECT 'orders*customer@custkey',
               (SELECT CAST(SUM(c) AS BIGINT) FROM oc),
               (SELECT CAST(SUM(c) AS BIGINT) FROM cc),
               CAST(COALESCE(SUM(oc.c * cc.c), 0) AS BIGINT),
               CAST(COALESCE(MAX(oc.c * cc.c), 0) AS BIGINT)
        FROM oc JOIN cc USING (k)
    )
    SELECT join_name, left_rows, right_rows, out_rows,
           ROUND(out_rows::DOUBLE / GREATEST(left_rows, right_rows), 4)
               AS amplification,
           max_key_rows
    FROM est
    """,
    doc="X77 join-size profiler: exact output cardinality of three "
        "join shapes (FK join, self-join on a non-unique key, "
        "dimension join) from per-key count tables and sum-of-products "
        "— no join is ever materialized, so pricing a quadratic "
        "self-join costs two aggregates. max_key_rows is the hot-key "
        "contribution that decides salting. The pre-flight check every "
        "scheduled 100 TB join should run.",
    tags=("X77", "X7", "X3"),
)
def join_size_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")

    def counts(df: DataFrame, key: str) -> DataFrame:
        # persisted: each count table feeds the product join AND the
        # side-total aggregates — without this the fact scan + count
        # shuffle would run once per consumer
        from ..caching import persist_tracked
        return persist_tracked(df.groupBy(F.col(key).alias("k"))
                               .agg(F.count("*").alias("c")))

    def est(name: str, a: DataFrame, b: DataFrame | None) -> DataFrame:
        if b is None:  # self-join: one count table, products of itself
            prod = a.select(F.lit(name).alias("join_name"),
                            (F.col("c") * F.col("c")).alias("p"),
                            F.col("c").alias("ca"), F.col("c").alias("cb"))
        else:
            prod = (a.join(b.select(F.col("k"), F.col("c").alias("c_b")),
                           "k")
                    .select(F.lit(name).alias("join_name"),
                            (F.col("c") * F.col("c_b")).alias("p"),
                            F.col("c").alias("ca"), F.col("c_b").alias("cb")))
        sides = (a.agg(F.sum("c").alias("l")),
                 (b if b is not None else a).agg(F.sum("c").alias("r")))
        return (prod.groupBy("join_name")
                .agg(F.coalesce(F.sum("p"), F.lit(0)).cast("long")
                     .alias("out_rows"),
                     F.coalesce(F.max("p"), F.lit(0)).cast("long")
                     .alias("max_key_rows"))
                .crossJoin(F.broadcast(sides[0]))
                .crossJoin(F.broadcast(sides[1]))
                .select("join_name",
                        F.col("l").cast("long").alias("left_rows"),
                        F.col("r").cast("long").alias("right_rows"),
                        "out_rows", "max_key_rows"))

    lo = counts(li, "l_orderkey")
    oo = counts(orders, "o_orderkey")
    lp = counts(li, "l_partkey")
    oc = counts(orders, "o_custkey")
    cc = counts(cust, "c_custkey")
    out = (est("lineitem*orders@orderkey", lo, oo)
           .unionByName(est("lineitem*lineitem@partkey", lp, None))
           .unionByName(est("orders*customer@custkey", oc, cc)))
    return out.select(
        "join_name", "left_rows", "right_rows", "out_rows",
        F.round(F.col("out_rows").cast("double")
                / F.greatest("left_rows", "right_rows"), 4)
        .alias("amplification"),
        "max_key_rows")


# --------------------------------------------------------------------------
# X109: small-file compaction planner — the lakehouse maintenance op:
# a partitioned table accumulates one small file per ingest tick (here:
# one per order day); the planner groups CONSECUTIVE files inside each
# partition (order month) into output files of ~target size, preserving
# sort order and partition locality. Bin assignment is the running
# prefix sum DIV target — one window per partition, no driver loop; the
# plan itself is partition+file-cardinality metadata, never data rows.
# --------------------------------------------------------------------------
COMPACT_TARGET_ROWS = 2000


@register(
    "compaction_plan",
    f"""
    WITH files AS (
        SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS part,
               o_orderdate AS file_day,
               CAST(COUNT(*) AS BIGINT) AS n_rows
        FROM orders GROUP BY 1, 2
    ),
    binned AS (
        SELECT part, file_day, n_rows,
               CAST((SUM(n_rows) OVER (PARTITION BY part ORDER BY file_day
                                       ROWS UNBOUNDED PRECEDING) - n_rows)
                    // {COMPACT_TARGET_ROWS} AS BIGINT) AS bin
        FROM files
    )
    SELECT part, bin,
           CAST(COUNT(*) AS BIGINT) AS n_input_files,
           CAST(SUM(n_rows) AS BIGINT) AS total_rows,
           MIN(file_day) AS first_day,
           MAX(file_day) AS last_day
    FROM binned GROUP BY part, bin
    """,
    doc=f"X109 compaction planning: per-day ingest 'files' (row counts "
        "by order day) coalesce into ~{target}-row output files within "
        "each month partition, preserving day order — bin = preceding "
        "prefix sum DIV target, one ordered window per partition. "
        "Output is the compaction manifest (inputs, rows, day range "
        "per planned file): metadata-sized at any table size, the "
        "standard OPTIMIZE/rewrite planner every parquet lake needs."
        .format(target=COMPACT_TARGET_ROWS),
    tags=("X109", "X11", "X7", "X1"),
)
def compaction_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    o = load_table(spark, sf_dir, "orders")
    files = (o.groupBy(F.date_trunc("month", F.col("o_orderdate"))
                       .cast("date").alias("part"),
                       F.col("o_orderdate").alias("file_day"))
             .agg(F.count("*").cast("long").alias("n_rows")))
    w = (Window.partitionBy("part").orderBy("file_day")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    binned = files.select(
        "part", "file_day", "n_rows",
        F.expr(f"(sum(n_rows) OVER (PARTITION BY part ORDER BY file_day "
               f"ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) "
               f"- n_rows) DIV {COMPACT_TARGET_ROWS}").alias("bin"))
    return (binned.groupBy("part", "bin")
            .agg(F.count("*").cast("long").alias("n_input_files"),
                 F.sum("n_rows").cast("long").alias("total_rows"),
                 F.min("file_day").alias("first_day"),
                 F.max("file_day").alias("last_day")))


# --------------------------------------------------------------------------
# X149: join-order cost exploration — the Selinger cardinality model
# every cost-based optimizer runs, surfaced as a query so its
# estimates can be AUDITED against actuals: for the 3-way
# lineitem |x| orders |x| customer join, estimate each left-deep
# order's intermediate sizes with the independence formula
# |A |x| B| = |A|*|B| / max(d_A(k), d_B(k)) (pure integer DIV over
# exact distinct counts), rank orders by total intermediate volume,
# and report the TRUE first-join size next to the estimate. The
# stats pass is a handful of count/count-distinct aggregates; plan
# arithmetic is scalar. Includes the keyless (lineitem x customer)
# order so the cross-product blowup the model exists to avoid is
# visible in numbers.
# --------------------------------------------------------------------------
@register(
    "join_order_cost_explorer",
    """
    WITH s AS (
        SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem) AS nl,
               (SELECT CAST(COUNT(*) AS BIGINT) FROM orders) AS no,
               (SELECT CAST(COUNT(*) AS BIGINT) FROM customer) AS nc,
               (SELECT CAST(COUNT(DISTINCT l_orderkey) AS BIGINT)
                FROM lineitem) AS dl_ok,
               (SELECT CAST(COUNT(DISTINCT o_orderkey) AS BIGINT)
                FROM orders) AS do_ok,
               (SELECT CAST(COUNT(DISTINCT o_custkey) AS BIGINT)
                FROM orders) AS do_ck,
               (SELECT CAST(COUNT(DISTINCT c_custkey) AS BIGINT)
                FROM customer) AS dc_ck,
               (SELECT CAST(COUNT(*) AS BIGINT)
                FROM lineitem JOIN orders ON o_orderkey = l_orderkey)
                   AS act_lo,
               (SELECT CAST(COUNT(*) AS BIGINT)
                FROM orders JOIN customer ON c_custkey = o_custkey)
                   AS act_oc
    ),
    plans AS (
        SELECT 'LO_C' AS plan,
               nl * no // GREATEST(dl_ok, do_ok) AS est_first,
               nl * no // GREATEST(dl_ok, do_ok)
               + (nl * no // GREATEST(dl_ok, do_ok)) * nc
                 // GREATEST(do_ck, dc_ck) AS est_cost,
               act_lo AS actual_first
        FROM s
        UNION ALL
        SELECT 'OC_L',
               no * nc // GREATEST(do_ck, dc_ck),
               no * nc // GREATEST(do_ck, dc_ck)
               + (no * nc // GREATEST(do_ck, dc_ck)) * nl
                 // GREATEST(do_ok, dl_ok),
               act_oc
        FROM s
        UNION ALL
        SELECT 'LC_O', nl * nc,
               nl * nc + (nl * nc) * no // GREATEST(do_ok, dl_ok),
               nl * nc
        FROM s
    )
    SELECT plan, CAST(est_first AS BIGINT) AS est_first,
           CAST(est_cost AS BIGINT) AS est_cost,
           CAST(actual_first AS BIGINT) AS actual_first,
           CAST(ROW_NUMBER() OVER (ORDER BY est_cost, plan) AS BIGINT)
               AS rank
    FROM plans
    """,
    doc="X149 Selinger join-order cost audit for lineitem-orders-"
        "customer: independence-model size estimates (|A|*|B| DIV "
        "max distinct) for each left-deep order including the "
        "cross-product one, ranked by total intermediate volume, "
        "with the true first-join cardinalities alongside. Exact "
        "integer arithmetic over a bounded stats pass — the "
        "estimate-vs-actual gap is the operator's whole point.",
    tags=("X149", "X77", "X7", "X8"),
)
def join_order_cost_explorer(spark: SparkSession,
                             sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nl, no, nc = li.count(), orders.count(), customer.count()
    dl_ok = li.select("l_orderkey").distinct().count()
    do_ok = orders.select("o_orderkey").distinct().count()
    do_ck = orders.select("o_custkey").distinct().count()
    dc_ck = customer.select("c_custkey").distinct().count()
    act_lo = li.join(orders,
                     orders.o_orderkey == li.l_orderkey).count()
    act_oc = orders.join(customer,
                         customer.c_custkey == orders.o_custkey).count()
    est_lo = nl * no // max(dl_ok, do_ok)
    est_oc = no * nc // max(do_ck, dc_ck)
    plans = [
        ("LO_C", est_lo, est_lo + est_lo * nc // max(do_ck, dc_ck),
         act_lo),
        ("OC_L", est_oc, est_oc + est_oc * nl // max(do_ok, dl_ok),
         act_oc),
        ("LC_O", nl * nc, nl * nc + (nl * nc) * no // max(do_ok, dl_ok),
         nl * nc),
    ]
    ranked = sorted(plans, key=lambda p: (p[2], p[0]))
    rows = [p + (i + 1,) for p in plans
            for i, q in enumerate(ranked) if q[0] == p[0]]
    return spark.createDataFrame(
        rows, "plan STRING, est_first BIGINT, est_cost BIGINT, "
              "actual_first BIGINT, rank BIGINT")


# --------------------------------------------------------------------------
# X164: differential-privacy release — the daily event-type histogram
# published with discrete-Laplace noise (epsilon = 1, sensitivity 1:
# each count changes by at most 1 when one event is added/removed).
# The noise channel is FULLY deterministic and engine-portable: the
# per-cell uniform is 60 md5 bits, and the discrete-Laplace inverse
# CDF is precomputed ONCE in Python as 2^60-unit integer thresholds
# inlined into BOTH engines (the X103 Poisson-bootstrap pattern —
# neither engine evaluates exp, so there is nothing to disagree
# about). z = min level whose threshold exceeds the uniform: one
# broadcast range join against the 80-row table. True counts, noise,
# released counts and |error| are all hash-checked; the law test
# replays the channel and pins the empirical noise scale to the
# epsilon = 1 discrete-Laplace variance.
# --------------------------------------------------------------------------
DP_EPS_LABEL = "eps1"
DP_Z_MAX = 40


def _dlap_cuts_2p60() -> list[tuple[int, int]]:
    """(z, floor(CDF(z) * 2^60)) for the discrete Laplace with
    a = e^-1: p(z) = (1-a)/(1+a) * a^|z|, z in [-40, 39]."""
    import math

    a = math.exp(-1.0)
    cdf, cuts = 0.0, []
    for z in range(-DP_Z_MAX, DP_Z_MAX):
        cdf += (1 - a) / (1 + a) * a ** abs(z)
        cuts.append((z, math.floor(cdf * (1 << 60))))
    return cuts


_DLAP_SQL = "VALUES " + ", ".join(f"({z}, {c})"
                                  for z, c in _dlap_cuts_2p60())


@register(
    "dp_noisy_daily_counts",
    f"""
    WITH cuts(z, cut) AS ({_DLAP_SQL}),
    cells AS (
        SELECT event_type, CAST(ts AS DATE) AS d,
               CAST(COUNT(*) AS BIGINT) AS true_n
        FROM events GROUP BY 1, 2
    ),
    u AS (
        SELECT event_type, d, true_n,
               ('0x' || substr(md5('dp:{DP_EPS_LABEL}:' || event_type
                                   || ':' || d), 1, 15))::BIGINT AS u60
        FROM cells
    ),
    noise AS (
        SELECT event_type, d, true_n,
               COALESCE((SELECT MIN(z) FROM cuts
                         WHERE cut > u.u60), {DP_Z_MAX}) AS z
        FROM u
    )
    SELECT event_type, d, true_n, CAST(z AS BIGINT) AS noise,
           CAST(true_n + z AS BIGINT) AS released_n,
           CAST(ABS(z) AS BIGINT) AS abs_err
    FROM noise ORDER BY event_type, d
    """,
    doc="X164 differential-privacy histogram release (discrete "
        "Laplace, eps = 1, sensitivity 1) of daily event-type counts: "
        "per-cell md5 60-bit uniform -> inverse CDF via an 80-row "
        "Python-precomputed 2^60-unit threshold table inlined into "
        "both engines -> released = true + z. No float RNG, no "
        "transcendental in either engine; the channel, the release "
        "and the realized |error| all hash-check.",
    tags=("X164", "X72", "X74", "X103", "X7"),
)
def dp_noisy_daily_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    cells = (ev.groupBy("event_type", F.to_date("ts").alias("d"))
             .agg(F.count("*").cast("long").alias("true_n")))
    u60 = F.conv(F.substring(
        F.md5(F.concat(F.lit(f"dp:{DP_EPS_LABEL}:"), F.col("event_type"),
                       F.lit(":"), F.col("d").cast("string"))),
        1, 15), 16, 10).cast("long")
    cuts = spark.createDataFrame(_dlap_cuts_2p60(), "z INT, cut LONG")
    noise = (cells.withColumn("u60", u60)
             .join(F.broadcast(cuts), F.col("cut") > F.col("u60"),
                   "left")
             .groupBy("event_type", "d", "true_n", "u60")
             .agg(F.coalesce(F.min("z"), F.lit(DP_Z_MAX)).alias("z")))
    return (noise.select(
        "event_type", "d", "true_n",
        F.col("z").cast("long").alias("noise"),
        (F.col("true_n") + F.col("z")).cast("long").alias("released_n"),
        F.abs(F.col("z")).cast("long").alias("abs_err"))
        .orderBy("event_type", "d"))


# --------------------------------------------------------------------------
# X188: inclusion-dependency discovery (SPIDER-style IND mining) —
# the data-catalog operator that finds JOINABLE columns nobody
# documented: for every ordered pair of integer-typed columns across
# ALL ten tables, what fraction of A's distinct values appear in B?
# containment(A, B) = |dv(A) n dv(B)| / |dv(A)| = 1.0 exactly on
# true FK -> PK edges and exposes accidental small-domain overlaps
# (linenumber-like columns) that naive schema matching trips on.
# Scale shape: distinct-first per column (the X33 discipline), one
# melt of (column_id, value) rows, one self-equi-join on value —
# candidate volume is bounded by per-value column co-occurrence,
# never |table| x |table|. Both engines generate their scan from the
# SAME static column list, and every count is BIGINT so containment
# is a single division of identical integers.
# --------------------------------------------------------------------------
IND_COLS: tuple[tuple[str, str], ...] = (
    ("region", "r_regionkey"), ("nation", "n_nationkey"),
    ("nation", "n_regionkey"), ("customer", "c_custkey"),
    ("customer", "c_nationkey"), ("supplier", "s_suppkey"),
    ("supplier", "s_nationkey"), ("part", "p_partkey"),
    ("part", "p_size"), ("orders", "o_orderkey"),
    ("orders", "o_custkey"), ("lineitem", "l_orderkey"),
    ("lineitem", "l_partkey"), ("lineitem", "l_suppkey"),
    ("lineitem", "l_linenumber"), ("events", "event_id"),
    ("events", "user_id"), ("documents", "doc_id"),
    ("embeddings", "vec_id"), ("embeddings", "label"),
)
IND_MIN_CONTAIN = 0.25
IND_FK_THRESHOLD = 0.95


def _ind_oracle_sql() -> str:
    scans = "\n        UNION ALL\n".join(
        f"        SELECT '{t}.{c}' AS col, CAST({c} AS BIGINT) AS v "
        f"FROM {t} GROUP BY {c}"
        for t, c in IND_COLS)
    return f"""
    WITH dv AS (
{scans}
    ),
    nd AS (
        SELECT col, CAST(COUNT(*) AS BIGINT) AS n FROM dv GROUP BY col
    ),
    inter AS (
        SELECT a.col AS col_a, b.col AS col_b,
               CAST(COUNT(*) AS BIGINT) AS n_inter
        FROM dv a JOIN dv b ON b.v = a.v AND b.col <> a.col
        GROUP BY a.col, b.col
    )
    SELECT i.col_a, i.col_b, na.n AS n_a, i.n_inter,
           ROUND(CAST(i.n_inter AS DOUBLE) / na.n, 6) AS containment,
           CASE WHEN CAST(i.n_inter AS DOUBLE) / na.n
                     >= {IND_FK_THRESHOLD} THEN 1 ELSE 0 END
               AS fk_like
    FROM inter i JOIN nd na ON na.col = i.col_a
    WHERE CAST(i.n_inter AS DOUBLE) / na.n >= {IND_MIN_CONTAIN}
    ORDER BY col_a, col_b
    """


@register(
    "ind_discovery",
    _ind_oracle_sql(),
    doc=f"X188 inclusion-dependency discovery over "
        f"{len(IND_COLS)} integer columns of all ten tables: "
        "distinct-first melt, one self-equi-join on value, "
        "containment = |dv(A) n dv(B)|/|dv(A)| as one division of "
        f"identical BIGINTs; pairs >= {IND_MIN_CONTAIN} emitted, "
        f">= {IND_FK_THRESHOLD} flagged fk_like. The data-catalog "
        "joinability scanner.",
    tags=("X188", "X47", "X77", "X33", "X3"),
)
def ind_discovery(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..caching import persist_tracked

    dv = None
    for t, c in IND_COLS:
        part = (load_table(spark, sf_dir, t)
                .groupBy(F.col(c).cast("long").alias("v"))
                .agg(F.lit(1).alias("_one"))
                .select(F.lit(f"{t}.{c}").alias("col"), "v"))
        dv = part if dv is None else dv.unionByName(part)
    dv = persist_tracked(dv)
    nd = dv.groupBy("col").agg(F.count("*").cast("long").alias("n"))
    a = dv.select(F.col("col").alias("col_a"), "v")
    b = dv.select(F.col("col").alias("col_b"), "v")
    inter = (a.join(b, "v")
             .filter(F.col("col_b") != F.col("col_a"))
             .groupBy("col_a", "col_b")
             .agg(F.count("*").cast("long").alias("n_inter")))
    contain = F.col("n_inter").cast("double") / F.col("n_a")
    return (inter.join(nd.select(F.col("col").alias("col_a"),
                                 F.col("n").alias("n_a")), "col_a")
            .filter(contain >= IND_MIN_CONTAIN)
            .select("col_a", "col_b", "n_a", "n_inter",
                    F.round(contain, 6).alias("containment"),
                    F.when(contain >= IND_FK_THRESHOLD, 1)
                    .otherwise(0).alias("fk_like"))
            .orderBy("col_a", "col_b"))


# --------------------------------------------------------------------------
# X224: functional-dependency discovery — the column-profiling
# complement to X188's inclusion dependencies (INDs find joinable
# columns ACROSS tables; FDs find determinant structure WITHIN one):
# A -> B holds iff ndv(A) = ndv(A,B). One melted pass per table (pair
# fan-out is the column-pair count, not data volume re-reads), exact
# distinct counts, violations = ndv(A,B) - ndv(A). Key columns
# determine everything, so every key->attr pair must surface as
# holds=1 — law-pinned, alongside near-FD violation counts.
# --------------------------------------------------------------------------
_FD_PAIRS = (
    ("part", "p_partkey", "p_brand"),
    ("part", "p_partkey", "p_type"),
    ("part", "p_name", "p_brand"),
    ("part", "p_brand", "p_type"),
    ("part", "p_type", "p_brand"),
    ("part", "p_size", "p_brand"),
    ("orders", "o_orderkey", "o_custkey"),
    ("orders", "o_custkey", "o_orderpriority"),
    ("orders", "o_orderdate", "o_orderstatus"),
    ("orders", "o_orderstatus", "o_orderpriority"),
    ("customer", "c_custkey", "c_nationkey"),
    ("customer", "c_nationkey", "c_mktsegment"),
)


def _fd_oracle_sql() -> str:
    parts = []
    for tbl, a, b in _FD_PAIRS:
        parts.append(f"""SELECT '{tbl}' AS tbl, '{a}' AS lhs,
           '{b}' AS rhs,
           CAST(COUNT(DISTINCT CAST({a} AS VARCHAR)) AS BIGINT)
               AS ndv_lhs,
           CAST(COUNT(DISTINCT CAST({a} AS VARCHAR) || '|' ||
                      CAST({b} AS VARCHAR)) AS BIGINT) AS ndv_pair
        FROM {tbl}""")
    return ("WITH raw AS (" + "\nUNION ALL\n".join(parts) + """)
    SELECT tbl, lhs, rhs, ndv_lhs, ndv_pair,
           CAST(CASE WHEN ndv_lhs = ndv_pair THEN 1 ELSE 0 END
                AS BIGINT) AS holds,
           ndv_pair - ndv_lhs AS violations
    FROM raw""")


@register(
    "fd_discovery",
    _fd_oracle_sql(),
    doc="X224 functional-dependency discovery over part/orders/"
        "customer column pairs: A->B iff ndv(A)=ndv(A,B); exact "
        "distinct counts, violation counts for near-FDs. The within-"
        "table complement to X188's SPIDER IND mining; the key-"
        "determines-all FDs must surface as holds=1 (law-pinned).",
    tags=("X224", "X188", "X8", "X7", "X14"),
)
def fd_discovery(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = None
    for tbl, a, b in _FD_PAIRS:
        t = load_table(spark, sf_dir, tbl)
        row = t.agg(
            F.lit(tbl).alias("tbl"), F.lit(a).alias("lhs"),
            F.lit(b).alias("rhs"),
            F.countDistinct(F.col(a).cast("string")).cast("long")
            .alias("ndv_lhs"),
            F.countDistinct(F.concat(F.col(a).cast("string"),
                                     F.lit("|"),
                                     F.col(b).cast("string")))
            .cast("long").alias("ndv_pair"))
        out = row if out is None else out.unionByName(row)
    return out.select(
        "tbl", "lhs", "rhs", "ndv_lhs", "ndv_pair",
        F.when(F.col("ndv_lhs") == F.col("ndv_pair"), 1).otherwise(0)
        .cast("long").alias("holds"),
        (F.col("ndv_pair") - F.col("ndv_lhs")).alias("violations"))


# --------------------------------------------------------------------------
# X231: l-diversity / t-closeness audit — the privacy checks k-anonymity
# (X72) cannot see. A QI group can be k-anonymous yet reveal everyone's
# sensitive value when the group is homogeneous (l=1), or skew far from
# the corpus base rate (t-closeness, measured here as total-variation
# distance on the BIGINT micro grid). QI = (c_nationkey,
# o_orderpriority), sensitive = o_orderstatus; missing statuses in a
# group contribute the full global mass |0 - p(s)| via the
# group x status scaffold (cross join against the tiny status dim).
# Machanavajjhala et al. (l-diversity, ICDE 2006) / Li et al.
# (t-closeness, ICDE 2007); [EXT] — the reference has no privacy ops.
# --------------------------------------------------------------------------
LDIV_MIN_K = 5
LDIV_MIN_L = 2
TCLOSE_MAX_MICRO = 200_000  # t <= 0.2


@register(
    "ldiversity_tcloseness",
    f"""
    WITH joined AS (
        SELECT c.c_nationkey AS nation, o.o_orderpriority AS priority,
               o.o_orderstatus AS s
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    ),
    gdist AS (
        SELECT s, CAST(COUNT(*) AS BIGINT) AS sn FROM joined GROUP BY s
    ),
    tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM joined),
    grp AS (
        SELECT nation, priority,
               CAST(COUNT(*) AS BIGINT) AS k_count,
               CAST(COUNT(DISTINCT s) AS BIGINT) AS l_distinct
        FROM joined GROUP BY nation, priority
    ),
    gs AS (
        SELECT nation, priority, s, CAST(COUNT(*) AS BIGINT) AS gn
        FROM joined GROUP BY nation, priority, s
    ),
    scaffold AS (
        SELECT g.nation, g.priority, g.k_count, gdist.s, gdist.sn,
               COALESCE(gs.gn, 0) AS gn
        FROM grp g CROSS JOIN gdist
        LEFT JOIN gs ON gs.nation = g.nation
                    AND gs.priority = g.priority AND gs.s = gdist.s
    ),
    tvd AS (
        SELECT nation, priority,
               CAST(SUM(ABS((gn * 1000000) // k_count
                            - (sn * 1000000) // n)) // 2 AS BIGINT)
                   AS tvd_micro
        FROM scaffold CROSS JOIN tot
        GROUP BY nation, priority
    )
    SELECT g.nation, g.priority, g.k_count, g.l_distinct, t.tvd_micro,
           CASE WHEN g.k_count >= {LDIV_MIN_K} THEN 1 ELSE 0 END
               AS meets_k,
           CASE WHEN g.l_distinct >= {LDIV_MIN_L} THEN 1 ELSE 0 END
               AS meets_l,
           CASE WHEN t.tvd_micro <= {TCLOSE_MAX_MICRO} THEN 1 ELSE 0 END
               AS meets_t
    FROM grp g JOIN tvd t ON t.nation = g.nation
                         AND t.priority = g.priority
    """,
    doc="X231 l-diversity + t-closeness audit over QI groups "
        "(c_nationkey, o_orderpriority) with sensitive o_orderstatus: "
        "per group k (anonymity), l (distinct sensitive values), and "
        "total-variation distance to the global sensitive distribution "
        "on the BIGINT micro grid (group x status scaffold so absent "
        "statuses pay the full global mass), plus pass flags for "
        f"k>={LDIV_MIN_K}, l>={LDIV_MIN_L}, t<=0.2. Three aggregates + "
        "one broadcast-size scaffold join; no UDF, exact cross-engine. "
        "Python-replay + TVD-bounds laws.",
    tags=("X231", "X72", "X7", "X3"),
)
def ldiversity_tcloseness(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    joined = (o.join(c, o.o_custkey == c.c_custkey)
              .select(F.col("c_nationkey").alias("nation"),
                      F.col("o_orderpriority").alias("priority"),
                      F.col("o_orderstatus").alias("s")))
    glob = joined.groupBy("s").agg(F.count("*").cast("long").alias("sn"))
    tot = joined.agg(F.count("*").cast("long").alias("n"))
    grp = (joined.groupBy("nation", "priority")
           .agg(F.count("*").cast("long").alias("k_count"),
                F.countDistinct("s").cast("long").alias("l_distinct")))
    gs = (joined.groupBy("nation", "priority", "s")
          .agg(F.count("*").cast("long").alias("gn")))
    scaffold = (grp.crossJoin(F.broadcast(glob))
                .join(gs, ["nation", "priority", "s"], "left")
                .select("nation", "priority", "k_count", "s", "sn",
                        F.coalesce("gn", F.lit(0)).alias("gn")))
    tvd = (scaffold.crossJoin(F.broadcast(tot))
           .groupBy("nation", "priority")
           .agg(F.expr("SUM(ABS((gn * 1000000) DIV k_count"
                       " - (sn * 1000000) DIV n)) DIV 2")
                .cast("long").alias("tvd_micro")))
    return (grp.join(tvd, ["nation", "priority"])
            .select("nation", "priority", "k_count", "l_distinct",
                    "tvd_micro",
                    F.when(F.col("k_count") >= LDIV_MIN_K, 1).otherwise(0)
                    .alias("meets_k"),
                    F.when(F.col("l_distinct") >= LDIV_MIN_L, 1)
                    .otherwise(0).alias("meets_l"),
                    F.when(F.col("tvd_micro") <= TCLOSE_MAX_MICRO, 1)
                    .otherwise(0).alias("meets_t")))
