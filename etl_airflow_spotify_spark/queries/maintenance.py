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
