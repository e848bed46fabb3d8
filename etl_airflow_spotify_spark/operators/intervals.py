"""Interval-overlap join without a nested loop.

A naive overlap join (``a.s <= b.e AND b.s <= a.e``) has no equi-key,
so Spark would plan BroadcastNestedLoopJoin — quadratic, dead at scale.
The standard fix is temporal binning: explode each interval into the
coarse time buckets it covers, equi-join on (key, bucket) — overlapping
intervals MUST share at least one bucket — dedupe the pair, then apply
the exact predicate. Cost becomes |rows| x avg-buckets-per-interval
shuffled on a real key, instead of |rows|^2 compared on nothing.

Bucket granularity is the tuning knob: pick it near the typical interval
length so replication stays O(1) per row. (DuckDB/Postgres range joins
and Spark's own session_window do the same binning internally; the
reference has nothing comparable — its one join is an equi-merge,
/root/reference/scripts/transform.py:156-162.)
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def interval_overlap_self_join(iv: DataFrame, key: str, id_col: str,
                               start: str, end: str) -> DataFrame:
    """All pairs (a, b) with ``a.id < b.id``, equal ``key``, and
    overlapping [start, end] intervals. Output columns: the key, then
    a_id/a_s/a_e and b_id/b_s/b_e.

    Probe-on-start candidate generation: only ONE join input is
    exploded into its covered buckets; the other contributes a single
    row at the bucket of its START. If two intervals overlap, the later
    start lies inside the earlier interval, so the pair is found where
    the expanded earlier interval meets the later start's bucket.
    Versus expanding both sides, join input shrinks from
    O(rows x span-in-buckets) on EACH side to one side only, and a
    candidate pair is emitted at most twice (once per orientation)
    rather than once per shared bucket — with 30-bucket spans that is
    ~30x less join output to dedupe."""
    expanded = iv.select(
        F.col(key).alias("_k"),
        F.col(id_col).alias("a_id"),
        F.col(start).alias("a_s"),
        F.col(end).alias("a_e"),
        F.explode(F.sequence(
            F.date_trunc("month", F.col(start)),
            F.date_trunc("month", F.col(end)),
            F.expr("interval 1 month"))).alias("bucket"),
    )
    starts = iv.select(
        F.col(key).alias("_k"),
        F.col(id_col).alias("b_id"),
        F.col(start).alias("b_s"),
        F.col(end).alias("b_e"),
        F.date_trunc("month", F.col(start)).alias("bucket"),
    )
    cand = (expanded.join(starts, ["_k", "bucket"])
            .filter(F.col("a_id") != F.col("b_id"))
            .filter((F.col("a_s") <= F.col("b_e"))
                    & (F.col("b_s") <= F.col("a_e"))))
    swap = F.col("a_id") < F.col("b_id")
    norm = cand.select(
        "_k",
        F.when(swap, F.col("a_id")).otherwise(F.col("b_id")).alias("lo_id"),
        F.when(swap, F.col("a_s")).otherwise(F.col("b_s")).alias("lo_s"),
        F.when(swap, F.col("a_e")).otherwise(F.col("b_e")).alias("lo_e"),
        F.when(swap, F.col("b_id")).otherwise(F.col("a_id")).alias("hi_id"),
        F.when(swap, F.col("b_s")).otherwise(F.col("a_s")).alias("hi_s"),
        F.when(swap, F.col("b_e")).otherwise(F.col("a_e")).alias("hi_e"),
    )
    return (norm.dropDuplicates(["_k", "lo_id", "hi_id"])
                .select(F.col("_k").alias(key),
                        F.col("lo_id").alias("a_id"),
                        F.col("lo_s").alias("a_s"),
                        F.col("lo_e").alias("a_e"),
                        F.col("hi_id").alias("b_id"),
                        F.col("hi_s").alias("b_s"),
                        F.col("hi_e").alias("b_e")))
