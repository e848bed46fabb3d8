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


@register(
    "cdc_merge_incremental",
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
    """,
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
    from ..operators.cdc import (cdc_apply_versioned, finalize_versioned,
                                 init_versioned)

    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_acctbal", "c_mktsegment")
    ev = load_table(spark, sf_dir, "events")
    changes = ev.select(
        F.col("user_id").alias("c_custkey"), "ts", "event_id",
        F.when(F.col("event_type") == "error", "D").otherwise("U")
        .alias("op"),
        F.concat(F.lit("cdc:"), F.col("user_id").cast("string"))
        .alias("c_name"),
        F.round(F.col("value") * 1000, 2).alias("c_acctbal"),
        F.upper("event_type").alias("c_mktsegment"))
    snap = init_versioned(cust, changes, ["ts", "event_id"])
    for i in range(4):
        snap = cdc_apply_versioned(
            snap, changes.filter(F.pmod("event_id", F.lit(4)) == i),
            "c_custkey", seq_cols=["ts", "event_id"])
    out = finalize_versioned(snap, ["ts", "event_id"])
    return out.select("c_custkey", "c_name",
                      F.round("c_acctbal", 2).alias("c_acctbal"),
                      "c_mktsegment")
