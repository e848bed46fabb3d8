"""CDC / SCD merge: apply a changelog to a snapshot, latest change wins.

The incremental-maintenance primitive a training-data pipeline needs
the moment its corpus stops being append-only (document edits,
takedowns, re-crawls): instead of rebuilding a 100 TB snapshot, merge
the day's changes in. Spark-first shape: one window to pick the latest
change per key (single shuffle on key), one full-outer join against the
snapshot (same key — with both sides bucketed by key the join plans
shuffle-free), column-level coalesce for partial updates. Equivalent of
SQL MERGE / Delta Lake's upsert, expressed on plain DataFrames.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def cdc_merge(snapshot: DataFrame, changes: DataFrame, key: str,
              seq_cols: list[str], op_col: str = "op") -> DataFrame:
    """Merge ``changes`` into ``snapshot``; returns the new snapshot.

    ``changes`` carries ``key``, ``op_col`` ('U' upsert / 'D' delete),
    ``seq_cols`` (change ordering — later wins; ties broken by every
    seq col in order, so callers must pass a total order), and any
    subset of snapshot columns. Semantics per key:

      * no change row                -> snapshot row kept as-is
      * latest op 'U', key exists    -> per-column coalesce(change, old)
                                        (NULL change columns = partial
                                        update, keep the old value)
      * latest op 'U', key is new    -> insert (missing columns NULL)
      * latest op 'D'                -> row dropped
    """
    data_cols = [c for c in snapshot.columns if c != key]
    w = Window.partitionBy(key).orderBy(
        *[F.desc(c) for c in seq_cols])
    latest = (changes
              .withColumn("_rn", F.row_number().over(w))
              .filter(F.col("_rn") == 1)
              .drop("_rn", *[c for c in seq_cols if c not in snapshot.columns
                             and c != op_col]))

    s = snapshot.select(F.col(key).alias("_k"),
                        *[F.col(c).alias(f"_s_{c}") for c in data_cols])
    c = latest.select(
        F.col(key).alias("_ck"), F.col(op_col).alias("_op"),
        *[(F.col(col) if col in latest.columns else F.lit(None))
          .alias(f"_c_{col}") for col in data_cols])
    merged = s.join(c, s["_k"] == c["_ck"], "full_outer")
    keep = F.col("_op").isNull() | (F.col("_op") != F.lit("D"))
    return (merged.filter(keep)
            .select(F.coalesce("_k", "_ck").alias(key),
                    *[F.coalesce(f"_c_{col}", f"_s_{col}").alias(col)
                      for col in data_cols]))
