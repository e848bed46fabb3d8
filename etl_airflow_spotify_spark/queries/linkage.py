"""Record-linkage queries (X33): blocked fuzzy matching.

The reference has no linkage surface; this extends §2.B with the
dirty-key consolidation step every real ingest hits (vendor names,
product titles, user agents) — see ``operators/linkage.py`` for the
distinct-first + multi-pass-blocking scale design.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..catalog import load_table
from ..operators.linkage import blocked_fuzzy_pairs
from ..registry import register

MAX_EDIT = 4


@register(
    "fuzzy_name_pairs",
    f"""
    WITH names AS (
        SELECT p_name AS nm, CAST(COUNT(*) AS BIGINT) AS n
        FROM part GROUP BY p_name
    ),
    blocked AS (
        SELECT split_part(nm, ' ', 1) AS blk, nm, n FROM names
        UNION ALL
        SELECT split_part(nm, ' ', 2) AS blk, nm, n FROM names
    ),
    cand AS (
        SELECT DISTINCT a.nm AS value_a, b.nm AS value_b,
                        a.n AS n_a, b.n AS n_b
        FROM blocked a JOIN blocked b
          ON a.blk = b.blk AND a.nm < b.nm
    )
    SELECT value_a, value_b,
           CAST(levenshtein(value_a, value_b) AS BIGINT) AS edit_dist,
           n_a * n_b AS pair_weight
    FROM cand
    WHERE levenshtein(value_a, value_b) <= {MAX_EDIT}
    """,
    doc="X33 blocked fuzzy self-linkage of part names: distinct-first "
        "(rows -> unique values + multiplicity), two blocking passes "
        "(token 1, token 2) unioned and deduped, exact Levenshtein "
        "verify on candidates only. pair_weight = n_a*n_b reconstructs "
        "row-level match counts without a row-level join.",
    tags=("X33", "X3", "X14"),
)
def fuzzy_name_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    names = (part.groupBy(F.col("p_name").alias("nm"))
             .agg(F.count("*").cast("long").alias("n")))
    return blocked_fuzzy_pairs(
        names, value_col="nm", weight_col="n",
        block_fns=[lambda c: F.split_part(c, F.lit(" "), F.lit(1)),
                   lambda c: F.split_part(c, F.lit(" "), F.lit(2))],
        max_dist=MAX_EDIT)
