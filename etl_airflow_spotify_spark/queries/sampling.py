"""Reproducible dataset splitting/sampling for training pipelines.

``df.sample``/``sampleBy`` draw per-row randoms whose outcome depends on
partition layout, so rerunning after a repartition (or at a different
cluster size) silently reassigns rows — poison for train/val/test
hygiene. The production-safe pattern is CONTENT-keyed hashing: a row's
split is a pure function of its id, stable across runs, engines,
partitionings, and incremental reprocessing. md5 is used (not
xxhash64/crc32) precisely because every engine agrees on it — the same
property that lets DuckDB hash-check the assignment here.

The reference has no sampling ([EXT]; its whole dataset is <=2,500 rows,
/root/reference/scripts/extract.py:109,155).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..catalog import load_table
from ..registry import register

TRAIN_PCT, VAL_PCT = 80, 10  # remainder -> test


def hash_bucket(col: F.Column, n: int = 100) -> F.Column:
    """Deterministic [0, n) bucket from a key column: first 15 hex chars
    of md5 (60 bits, fits signed int64) mod n. Engine-portable."""
    return (F.conv(F.substring(F.md5(col.cast("string")), 1, 15), 16, 10)
             .cast("long") % n)


def assign_split(df: DataFrame, key: str) -> DataFrame:
    b = hash_bucket(F.col(key))
    return df.withColumn(
        "split",
        F.when(b < TRAIN_PCT, "train")
         .when(b < TRAIN_PCT + VAL_PCT, "val")
         .otherwise("test"))


@register(
    "dataset_split",
    f"""
    WITH assigned AS (
        SELECT doc_id, lang,
               CASE WHEN b < {TRAIN_PCT} THEN 'train'
                    WHEN b < {TRAIN_PCT + VAL_PCT} THEN 'val'
                    ELSE 'test' END AS split
        FROM (SELECT doc_id, lang,
                     ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
                     % 100 AS b
              FROM documents)
    )
    SELECT lang, split, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(doc_id) AS BIGINT) AS id_sum
    FROM assigned GROUP BY lang, split
    """,
    doc="80/10/10 train/val/test split of documents by md5(doc_id) "
        "bucket — reproducible under any repartitioning, engine, or "
        "incremental re-run, unlike rand()-based sample(). The id_sum "
        "column pins the EXACT per-document assignment in the hash "
        "check, not just the stratum sizes.",
    tags=("X2", "X14"),
)
def dataset_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return (assign_split(d, "doc_id")
            .groupBy("lang", "split")
            .agg(F.count("*").alias("n_docs"),
                 F.sum("doc_id").cast("long").alias("id_sum")))
