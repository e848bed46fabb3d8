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
