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


# -- incremental, order-independent CDC -------------------------------------
#
# cdc_merge above consumes a COMPLETE changelog (latest change per key
# wins). A 100 TB pipeline instead receives the changelog in arbitrary
# slices (micro-batches, backfills, late partitions) and must converge
# to the same snapshot no matter how the slices arrive. That needs two
# pieces of per-key metadata carried IN the snapshot:
#
#   * the sequence of the last applied change (`_seq_<col>`): a slice
#     holding an OLDER change for a key must not overwrite a newer one
#     already applied (out-of-order delivery);
#   * deletes as tombstones (`_deleted`), not row removal: if 'D' at
#     seq 10 arrives before 'U' at seq 7, dropping the row would let
#     the late 'U' resurrect it.
#
# With those, fold(cdc_apply_versioned, any partition of the changelog)
# == cdc one-shot — the law pinned by tests/test_curation.py and the
# cdc_merge_incremental query's DuckDB oracle. Upserts are full-row
# (replace, not column-coalesce): partial updates are inherently
# order-DEPENDENT, so an order-independent fold must carry whole rows.


def init_versioned(snapshot: DataFrame, changes: DataFrame,
                   seq_cols: list[str]) -> DataFrame:
    """Add the versioning metadata columns to a plain snapshot, typed
    from the changelog's seq columns."""
    types = dict(changes.dtypes)
    out = snapshot
    for c in seq_cols:
        out = out.withColumn(f"_seq_{c}", F.lit(None).cast(types[c]))
    return out.withColumn("_deleted", F.lit(False))


def cdc_apply_versioned(snapshot: DataFrame, changes: DataFrame, key: str,
                        seq_cols: list[str], op_col: str = "op") -> DataFrame:
    """Apply one changelog slice to a versioned snapshot; returns the
    new versioned snapshot. Idempotent and order-independent across
    slices (see module comment). One window shuffle on the slice + one
    full-outer join on the key — with snapshot and changelog bucketed
    by key the join plans shuffle-free, which is the steady-state shape
    of a 100 TB maintained table."""
    meta = [f"_seq_{c}" for c in seq_cols]
    data_cols = [c for c in snapshot.columns
                 if c != key and c not in meta and c != "_deleted"]

    w = Window.partitionBy(key).orderBy(*[F.desc(c) for c in seq_cols])
    latest = (changes.withColumn("_rn", F.row_number().over(w))
              .filter(F.col("_rn") == 1).drop("_rn"))

    s = snapshot.select(F.col(key).alias("_k"), "_deleted",
                        *[F.col(c).alias(f"_s_{c}") for c in data_cols],
                        *[F.col(m).alias(f"_s{m}") for m in meta])
    c = latest.select(
        F.col(key).alias("_ck"), F.col(op_col).alias("_op"),
        *[(F.col(col) if col in latest.columns else F.lit(None))
          .alias(f"_c_{col}") for col in data_cols],
        *[F.col(sc).alias(f"_c_seq_{sc}") for sc in seq_cols])

    m = s.join(c, s["_k"] == c["_ck"], "full_outer")
    # change applies iff the row is new to the snapshot OR the change's
    # seq tuple beats the stored one (lexicographic over seq_cols)
    stored = F.struct(*[F.col(f"_s_seq_{sc}") for sc in seq_cols])
    incoming = F.struct(*[F.col(f"_c_seq_{sc}") for sc in seq_cols])
    apply_change = F.col("_ck").isNotNull() & (
        F.col("_k").isNull()
        | F.col(f"_s_seq_{seq_cols[0]}").isNull()
        | (incoming > stored))
    return m.select(
        F.coalesce("_k", "_ck").alias(key),
        *[F.when(apply_change, F.col(f"_c_{col}"))
          .otherwise(F.col(f"_s_{col}")).alias(col) for col in data_cols],
        *[F.when(apply_change, F.col(f"_c_seq_{sc}"))
          .otherwise(F.col(f"_s_seq_{sc}")).alias(f"_seq_{sc}")
          for sc in seq_cols],
        F.when(apply_change, F.col("_op") == F.lit("D"))
        .otherwise(F.coalesce(F.col("_deleted"), F.lit(False)))
        .alias("_deleted"),
    )


def finalize_versioned(snapshot: DataFrame, seq_cols: list[str]) -> DataFrame:
    """Drop tombstones and versioning metadata: the user-facing table."""
    meta = [f"_seq_{c}" for c in seq_cols]
    return (snapshot.filter(~F.col("_deleted"))
            .drop("_deleted", *meta))


def scd2_history(snapshot: DataFrame, changes: DataFrame, key: str,
                 ts_col: str, seq_cols: list[str],
                 op_col: str = "op") -> DataFrame:
    """Slowly-Changing-Dimension TYPE 2: instead of overwriting (type
    1 = ``cdc_merge``), every change OPENS a new row version and CLOSES
    the previous one, so any historical state remains queryable with
    ``valid_from <= t < valid_to`` — the audit/backfill table every
    regulated or reproducible-training pipeline keeps next to its
    current snapshot.

    ``snapshot`` provides each key's initial version (``valid_from`` =
    NULL, i.e. "since before history began"); ``changes`` carries
    ``key``, ``ts_col``, ``seq_cols`` (total order), ``op_col`` and
    full replacement values. One union + ONE window (lead over the
    per-key change order — a single shuffle on key, no join at all):
    each version's ``valid_to`` is the next version's timestamp, NULL =
    still current. Delete rows ('D') close the preceding version and
    are then dropped — a deleted key has no current row. At 100 TB the
    history table appends per run and is naturally partitioned by
    ``valid_from`` date; point-in-time reads prune to one partition
    range.

    Deterministic (window order is the caller's total order), so the
    whole construction has an exact SQL twin via LEAD.
    """
    data_cols = [c for c in snapshot.columns if c != key]
    base = snapshot.select(
        F.col(key),
        F.lit(None).cast(dict(changes.dtypes)[ts_col]).alias(ts_col),
        *[F.lit(None).cast(dict(changes.dtypes).get(sc, "long")).alias(sc)
          for sc in seq_cols if sc != ts_col],
        F.lit("I").alias(op_col),
        *[F.col(c) for c in data_cols])
    ch = changes.select(
        F.col(key), F.col(ts_col),
        *[F.col(sc) for sc in seq_cols if sc != ts_col],
        F.col(op_col),
        *[(F.col(c) if c in changes.columns else F.lit(None)).alias(c)
          for c in data_cols])
    hist = base.unionByName(ch)
    # NULLs (the initial version) must sort FIRST in the per-key order
    w = Window.partitionBy(key).orderBy(
        *[F.asc_nulls_first(sc) for sc in seq_cols])
    return (hist
            .withColumn("valid_to", F.lead(ts_col).over(w))
            .filter(F.col(op_col) != "D")
            .select(F.col(key), *data_cols,
                    F.col(ts_col).alias("valid_from"), "valid_to",
                    F.col("valid_to").isNull().alias("is_current")))


def snapshot_diff(old: DataFrame, new: DataFrame, key: str) -> DataFrame:
    """Row-level diff of two snapshot versions sharing a schema: one
    FULL OUTER join on the key, null-safe column comparison, rows
    classified 'added' / 'deleted' / 'changed' ('unchanged' rows are
    dropped — the diff of a 100 TB table is change-sized, not
    table-sized). Returns (key, change_type, old_<col>..., new_<col>...).

    The audit primitive behind "what did this pipeline run actually
    change?" — pairs with cdc_merge (diff of input vs merged output ==
    the effective changelog) and with table fingerprints for
    cheap-first verification (compare fingerprints, diff only on
    mismatch). With both versions bucketed by key the join plans
    shuffle-free."""
    data_cols = [c for c in old.columns if c != key]
    o = old.select(F.col(key).alias("_ok"),
                   *[F.col(c).alias(f"_o_{c}") for c in data_cols])
    n = new.select(F.col(key).alias("_nk"),
                   *[F.col(c).alias(f"_n_{c}") for c in data_cols])
    j = o.join(n, o["_ok"] == n["_nk"], "full_outer")
    same = F.lit(True)
    for c in data_cols:
        same = same & F.col(f"_o_{c}").eqNullSafe(F.col(f"_n_{c}"))
    change = (F.when(F.col("_ok").isNull(), "added")
              .when(F.col("_nk").isNull(), "deleted")
              .when(~same, "changed")
              .otherwise("unchanged"))
    return (j.withColumn("change_type", change)
            .filter(F.col("change_type") != "unchanged")
            .select(F.coalesce("_ok", "_nk").alias(key), "change_type",
                    *[F.col(f"_o_{c}").alias(f"old_{c}") for c in data_cols],
                    *[F.col(f"_n_{c}").alias(f"new_{c}") for c in data_cols]))
