"""Vector similarity queries over ``embeddings`` (X17).

``vector_topk_exact`` hash-checks the brute-force cosine path against
DuckDB's list_cosine_similarity. The LSH variant is approx -> rows-only
(its recall is proven on planted fixtures in tests/test_operators.py).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..catalog import load_table
from ..operators import similarity as S
from ..registry import register

N_QUERIES = 10
K = 5


@register(
    "vector_topk_exact",
    f"""
    WITH scored AS (
        SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
               ROUND(list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
                                            CAST(c.embedding AS DOUBLE[])), 6) AS score
        FROM embeddings q JOIN embeddings c ON c.vec_id <> q.vec_id
        WHERE q.vec_id < {N_QUERIES}
    )
    SELECT query_id, cand_id, score, rn FROM (
        SELECT query_id, cand_id, score,
               CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                                       ORDER BY score DESC, cand_id) AS BIGINT) AS rn
        FROM scored
    ) WHERE rn <= {K}
    """,
    doc="Exact brute-force cosine top-k (broadcast queries x corpus scan).",
    tags=("X17",),
)
def vector_topk_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < N_QUERIES)
    return S.topk_cosine(emb, queries, K)


@register(
    "vector_near_dup_lsh",
    None,  # approx candidate generation -> rows-only check
    doc="Hyperplane-LSH near-duplicate vectors (cosine >= 0.95, verified).",
    tags=("X17", "X16"),
)
def vector_near_dup_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return S.near_duplicate_vectors(emb, threshold=0.95)
