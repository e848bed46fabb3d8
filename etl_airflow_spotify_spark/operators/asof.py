"""As-of join: for each left row, the most recent right row at-or-before
(backward) its timestamp, per partition key.

Spark has no native ASOF JOIN (DuckDB/Pandas do). The scalable
formulation here is union-tag + carry-forward window:

    union(left, right) sorted by (ts, side) within each key,
    last(right_value, ignoreNulls) over rows-unbounded-preceding

One shuffle on the partition key, no range explosion, no per-key
driver loop — O(n log n) per key vs the naive range-join's O(n*m).
This beats a range join + row_number whenever right-side density is
non-trivial, and it is the formulation that survives 100 TB (the window
state is a single carried row).

Determinism: if multiple right rows share (key, ts), the carried one is
the one with the GREATEST ``right_order_cols`` tuple (those columns are
appended to the window ordering) — pass ``right_order_cols`` or
pre-dedupe the right side to make results reproducible.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def asof_join_backward(left: DataFrame, right: DataFrame,
                       on: list[str], ts: str,
                       value_cols: list[str],
                       strict: bool = False,
                       tolerance_seconds: int | None = None,
                       right_order_cols: list[str] | None = None) -> DataFrame:
    """Left as-of join: attach the latest ``value_cols`` from ``right``
    whose ``ts`` is <= (or < when ``strict``) the left row's ``ts``,
    matching on ``on`` keys. Left columns are preserved; right values
    arrive as ``asof_<col>`` (null when no prior right row exists).
    ``tolerance_seconds`` bounds the lookback: a matched right row older
    than the tolerance yields nulls, exactly like pandas merge_asof's
    ``tolerance`` (the carried ts is tracked as an internal column, so
    the plan shape is unchanged — still one window, no range join).
    ``right_order_cols`` breaks ties among right rows sharing
    (key, ts): the row with the greatest tuple wins; without it (and
    without pre-deduping), which equal-ts row carries is plan-dependent.
    """
    # side: right sorts before left at equal ts for inclusive semantics,
    # after left for strict semantics.
    right_side, left_side = (1, 0) if strict else (0, 1)
    l_tagged = left.withColumn("_side", F.lit(left_side))
    for c in value_cols:
        l_tagged = l_tagged.withColumn(f"_rv_{c}", F.lit(None).cast(
            dict(right.dtypes)[c]))
    carry_cols = list(value_cols)
    if tolerance_seconds is not None:
        carry_cols.append("__asofts")
        right = right.withColumn("__asofts", F.col(ts))
        l_tagged = l_tagged.withColumn("_rv___asofts", F.lit(None).cast(
            dict(right.dtypes)[ts]))
    order_cols = right_order_cols or []
    for c in order_cols:
        l_tagged = l_tagged.withColumn(f"_ord_{c}", F.lit(None).cast(
            dict(right.dtypes)[c]))
    r_tagged = right.select(
        *on, ts,
        *[F.col(c).alias(f"_rv_{c}") for c in carry_cols],
        *[F.col(c).alias(f"_ord_{c}") for c in order_cols],
    ).withColumn("_side", F.lit(right_side))
    # align schemas: left keeps all its columns; right rows carry nulls
    # for the left-only columns.
    left_only = [c for c in l_tagged.columns
                 if c not in r_tagged.columns]
    for c in left_only:
        r_tagged = r_tagged.withColumn(c, F.lit(None).cast(
            dict(l_tagged.dtypes)[c]))
    u = l_tagged.select(sorted(l_tagged.columns)).unionByName(
        r_tagged.select(sorted(l_tagged.columns)))

    # Order columns only reorder right rows WITHIN an equal (ts, _side)
    # group (left rows hold null there, and nulls_first keeps them ahead
    # of any non-null right ordering value at the same ts in the strict
    # case) — so the greatest right_order_cols tuple is the carried row.
    w = (Window.partitionBy(*on)
         .orderBy(ts, "_side",
                  *[F.asc_nulls_first(f"_ord_{c}") for c in order_cols])
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    carried = u.select(
        "*",
        *[F.last(f"_rv_{c}", ignorenulls=True).over(w).alias(f"asof_{c}")
          for c in carry_cols],
    )
    out = (carried.filter(F.col("_side") == left_side)
           .drop("_side", *[f"_rv_{c}" for c in carry_cols],
                 *[f"_ord_{c}" for c in order_cols]))
    if tolerance_seconds is not None:
        in_tol = F.expr(
            f"timestampdiff(SECOND, asof___asofts, {ts})") <= tolerance_seconds
        for c in value_cols:
            out = out.withColumn(
                f"asof_{c}",
                F.when(in_tol, F.col(f"asof_{c}")))
        out = out.drop("asof___asofts")
    return out
