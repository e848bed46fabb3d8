"""Blocked fuzzy record linkage (edit-distance self-matching).

The classic entity-resolution problem: find pairs of values that are
*nearly* equal (typos, OCR noise, vendor-name drift) without comparing
all pairs. Reference parity: the reference engine has no linkage
operator — this is part of the §2.B training-data-pipeline extension
surface (dirty-key consolidation before joins/dedup).

Scale design (the part that matters at 100 TB):

1. **Distinct-first.** Edit distance is a function of the VALUE, not
   the row, so the similarity join runs on ``groupBy(value).count()``
   output — typically orders of magnitude smaller than the table (the
   driver's ``part`` table: 2000 rows -> 64 distinct names; a real
   vendor column: billions of rows -> millions of names). Row
   multiplicities come along as a weight column, so pair weights
   reconstruct row-level pair counts without ever joining rows.
2. **Multi-pass blocking.** Each blocking key (e.g. first token,
   second token, length band, soundex) produces candidate pairs via a
   plain shuffle equi-join on the block key; the union of passes is
   deduplicated. Two cheap passes catch pairs a single key misses
   (a pair differing in token 1 still shares token 2) — the standard
   blocking-union design from the record-linkage literature, and each
   pass is a hash join, never a cartesian product.
3. **Verify exactly.** ``levenshtein`` runs only on candidate pairs
   (JVM expression, no Python), so cost is O(candidates), not O(n^2).

Skew note: a degenerate block (every value sharing one token, or a
block function returning '' for one-token values) would re-create the
quadratic blow-up; ``max_block`` drops blocks above a width threshold
before the self-join, same as the LSH ``max_bucket`` cap in
``dedup.lsh_candidate_pairs``. Pairs inside a dropped block can still
surface through the OTHER blocking passes — the usual blocking-union
recall argument.
"""

from __future__ import annotations

from collections.abc import Callable

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame


def blocked_fuzzy_pairs(values: DataFrame,
                        value_col: str,
                        weight_col: str,
                        block_fns: list[Callable[[Column], Column]],
                        max_dist: int,
                        max_block: int | None = 1000) -> DataFrame:
    """Candidate-verified fuzzy self-join over a distinct-value frame.

    ``values`` must be distinct on ``value_col`` (one row per value,
    ``weight_col`` = how many base rows carry it). ``block_fns`` maps
    the value column to each blocking key. Output: one row per unique
    value pair (value_a < value_b) within ``max_dist`` edit distance,
    with ``edit_dist`` and ``pair_weight = n_a * n_b`` (the number of
    base-row pairs the value pair represents).

    ``max_block`` caps the width of any (pass, block key) group before
    the self-join: a degenerate block — every one-token value landing
    in the '' second-token block, say — would otherwise contribute
    width² candidate pairs. Dropped blocks lose no pair that another
    blocking pass still catches. ``None`` disables the cap.
    """
    blocked = None
    for i, fn in enumerate(block_fns):
        pass_df = values.select(
            # block keys are scoped per pass so a cap on one pass's
            # degenerate block never suppresses another pass's block
            # that happens to share the key string
            F.concat_ws(":", F.lit(str(i)),
                        fn(F.col(value_col))).alias("_blk"),
            F.col(value_col).alias("_val"),
            F.col(weight_col).alias("_n"))
        blocked = pass_df if blocked is None else blocked.unionAll(pass_df)

    if max_block is not None:
        ok = (blocked.groupBy("_blk").count()
              .filter(F.col("count") <= max_block).select("_blk"))
        blocked = blocked.join(ok, "_blk", "left_semi")
    a, b = blocked.alias("a"), blocked.alias("b")
    cand = (
        a.join(b, (F.col("a._blk") == F.col("b._blk"))
               & (F.col("a._val") < F.col("b._val")))
        .select(F.col("a._val").alias("value_a"),
                F.col("b._val").alias("value_b"),
                F.col("a._n").alias("n_a"),
                F.col("b._n").alias("n_b"))
        # same pair found by several blocking passes -> once
        .distinct()
    )
    return (
        cand
        .withColumn("edit_dist",
                    F.levenshtein("value_a", "value_b").cast("long"))
        .filter(F.col("edit_dist") <= max_dist)
        .select("value_a", "value_b", "edit_dist",
                (F.col("n_a") * F.col("n_b")).cast("long")
                .alias("pair_weight"))
    )
