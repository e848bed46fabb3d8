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


_FUZZY_EDGES_SQL = f"""
    WITH names AS (
        SELECT p_name AS nm, CAST(COUNT(*) AS BIGINT) AS n
        FROM part GROUP BY p_name
    ),
    blocked AS (
        SELECT split_part(nm, ' ', 1) AS blk, nm FROM names
        UNION ALL
        SELECT split_part(nm, ' ', 2) AS blk, nm FROM names
    ),
    edges AS (
        SELECT DISTINCT a.nm AS va, b.nm AS vb
        FROM blocked a JOIN blocked b ON a.blk = b.blk AND a.nm < b.nm
        WHERE levenshtein(a.nm, b.nm) <= {MAX_EDIT}
    )
"""


@register(
    "fuzzy_cluster_triangles",
    _FUZZY_EDGES_SQL + """
    , tri AS (
        SELECT e1.va AS a, e1.vb AS b, e2.vb AS c
        FROM edges e1
        JOIN edges e2 ON e2.va = e1.vb
        JOIN edges e3 ON e3.va = e1.va AND e3.vb = e2.vb
    ),
    corners AS (
        SELECT a AS v FROM tri UNION ALL
        SELECT b FROM tri UNION ALL
        SELECT c FROM tri
    )
    SELECT v AS value, CAST(COUNT(*) AS BIGINT) AS n_triangles
    FROM corners GROUP BY v
    """,
    doc="X39 triangle counting over the fuzzy-similarity graph: how "
        "densely interlinked each near-duplicate value cluster is "
        "(mutual-similarity triangles are the strongest merge "
        "evidence in entity resolution). The value_a < value_b edge "
        "orientation makes each triangle countable exactly once via "
        "two hash joins — the standard oriented-wedge formulation; at "
        "web scale the orientation key becomes (degree, id), bounding "
        "wedge fan-out by max out-degree ~ sqrt(edges).",
    tags=("X39", "X3", "X7"),
)
def fuzzy_cluster_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    names = (part.groupBy(F.col("p_name").alias("nm"))
             .agg(F.count("*").cast("long").alias("n")))
    edges = blocked_fuzzy_pairs(
        names, value_col="nm", weight_col="n",
        block_fns=[lambda c: F.split_part(c, F.lit(" "), F.lit(1)),
                   lambda c: F.split_part(c, F.lit(" "), F.lit(2))],
        max_dist=MAX_EDIT).select(F.col("value_a").alias("va"),
                                  F.col("value_b").alias("vb"))
    e1 = edges.select(F.col("va").alias("a"), F.col("vb").alias("b"))
    e2 = edges.select(F.col("va").alias("b"), F.col("vb").alias("c"))
    e3 = edges.select(F.col("va").alias("a"), F.col("vb").alias("c"))
    tri = e1.join(e2, "b").join(e3, ["a", "c"])
    corners = (tri.select(F.col("a").alias("v"))
               .unionAll(tri.select(F.col("b")))
               .unionAll(tri.select(F.col("c"))))
    return (corners.groupBy(F.col("v").alias("value"))
            .agg(F.count("*").cast("long").alias("n_triangles")))
