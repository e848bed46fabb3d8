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
    a_id/a_s/a_e and b_id/b_s/b_e. Month-bucketed candidate generation;
    exact overlap verified after the equi-join."""

    def side(p: str) -> DataFrame:
        return iv.select(
            F.col(key).alias("_k"),
            F.col(id_col).alias(f"{p}_id"),
            F.col(start).alias(f"{p}_s"),
            F.col(end).alias(f"{p}_e"),
            F.explode(F.sequence(
                F.date_trunc("month", F.col(start)),
                F.date_trunc("month", F.col(end)),
                F.expr("interval 1 month"))).alias("bucket"),
        )

    a, b = side("a"), side("b")
    return (a.join(b, ["_k", "bucket"])
             .filter(F.col("a_id") < F.col("b_id"))
             .filter((F.col("a_s") <= F.col("b_e"))
                     & (F.col("b_s") <= F.col("a_e")))
             .drop("bucket")
             .dropDuplicates(["_k", "a_id", "b_id"])
             .withColumnRenamed("_k", key))
