"""Incremental view maintenance (IVM) for distributive aggregates via
SIGNED MULTIPLICITIES: every change row carries a weight (+1 insert /
-1 retraction), partial aggregates are weighted sums, and maintaining
the view under new changes is just "aggregate the slice, add it to the
state" — the z-set/abelian-group formulation behind differential
dataflow and DBSP (Budiu et al., VLDB'23), restricted here to the
SUM/COUNT family where a plain DataFrame groupBy is the whole engine.

Why it matters at 100 TB: a materialized aggregate over an append+
retract changelog never re-reads history — each micro-batch shuffles
only its own rows (grouped partials are map-side-combined), and because
weighted sums form an abelian group, slices may arrive in ANY order,
duplicated state merges are detectable, and a retraction is just a row
with negative weight. Exactness requires group arithmetic to be exact:
weighted value sums run in DECIMAL (double addition is not associative,
which would make the fold order-DEPENDENT).

The reference recomputes everything per run (its only aggregate is
len(df), /root/reference/scripts/etl_pipeline.py:212-217); [EXT].
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame


def signed_partial(changes: DataFrame, group_cols: list[str],
                   weight: Column, value: Column) -> DataFrame:
    """One slice's contribution to the maintained view: per group,
    net row multiplicity and net DECIMAL-exact weighted value sum.
    Map-side combine applies — a slice's shuffle volume is its group
    count, not its row count."""
    return (changes.groupBy(*group_cols)
            .agg(F.sum(weight).cast("long").alias("_net_rows"),
                 F.sum(weight.cast("decimal(18,6)")
                       * value.cast("decimal(18,6)")).alias("_net_val")))


def merge_state(state: DataFrame | None, partial: DataFrame,
                group_cols: list[str]) -> DataFrame:
    """Fold one partial into the view state (same schema as
    ``signed_partial`` output). Union + re-sum per group; groups whose
    multiplicity nets to zero are dropped — a fully-retracted group
    leaves no residue, so state size tracks LIVE groups only."""
    merged = partial if state is None else state.unionByName(partial)
    return (merged.groupBy(*group_cols)
            .agg(F.sum("_net_rows").cast("long").alias("_net_rows"),
                 F.sum("_net_val").alias("_net_val"))
            .filter(F.col("_net_rows") != 0))


def delta_join_terms(a_old: DataFrame, da: DataFrame,
                     b_old: DataFrame, db: DataFrame,
                     on: str, a_w: str = "_wa",
                     b_w: str = "_wb") -> DataFrame:
    """Signed delta of a JOIN view (the bilinear rule of z-set algebra):

        d(A join B) = dA join B_old  +  A_old join dB  +  dA join dB

    with each joined row weighted by the PRODUCT of its input signs —
    insert x insert = +1, insert x retract = -1, retract x retract = +1.
    ``da``/``db`` carry their sign in ``a_w``/``b_w``; the old
    snapshots have implicit weight +1. Returns the union of the three
    terms with a combined ``_w`` column; feed it to ``signed_partial``
    to maintain any distributive aggregate over the join without ever
    re-joining the full snapshots — at 100 TB each maintenance step
    joins only delta-sized inputs against the base (two one-sided
    joins) plus a delta-sized self term.
    """
    t1 = da.join(b_old, on).withColumn("_w", F.col(a_w))
    t2 = a_old.join(db, on).withColumn("_w", F.col(b_w))
    t3 = da.join(db, on).withColumn("_w", F.col(a_w) * F.col(b_w))
    cols = [c for c in t1.columns if c not in (a_w, b_w)]
    return (t1.select(*cols)
            .unionByName(t2.select(*cols))
            .unionByName(t3.select(*cols)))
