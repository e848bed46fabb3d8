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


GROUP_SAMPLE_K = 20


def group_sample(df: DataFrame, group_col: str, key: str,
                 k: int) -> DataFrame:
    """Keep a deterministic uniform sample of exactly min(k, |group|)
    rows per group: rank rows inside each group by md5(key) — a pure
    function of the row, so membership is stable across runs, engines
    and repartitioning, and APPENDING rows only ever swaps members in/
    out by hash order (no global reshuffle of the sample). This is the
    reproducible replacement for per-group reservoir sampling: one
    window shuffle on the group key, no RNG state, no driver loop."""
    w_ = F.conv(F.substring(F.md5(F.col(key).cast("string")), 1, 15),
                16, 10).cast("long")
    from pyspark.sql import Window
    win = Window.partitionBy(group_col).orderBy(w_.asc(), F.col(key).asc())
    return (df.withColumn("rk", F.row_number().over(win).cast("long"))
            .filter(F.col("rk") <= k))


@register(
    "per_group_sample",
    f"""
    SELECT lang, doc_id, rk FROM (
        SELECT lang, doc_id,
               CAST(ROW_NUMBER() OVER (
                   PARTITION BY lang
                   ORDER BY ('0x' || substr(md5(CAST(doc_id AS VARCHAR)),
                                            1, 15))::BIGINT, doc_id
               ) AS BIGINT) AS rk
        FROM documents
    ) WHERE rk <= {GROUP_SAMPLE_K}
    """,
    doc=f"Exactly-{GROUP_SAMPLE_K}-per-language uniform document sample "
        "chosen by md5(doc_id) rank — the deterministic replacement for "
        "per-group reservoir sampling (inspection samples, eval slices, "
        "per-domain spot checks). Membership is a pure function of the "
        "row id: re-runs, engines and repartitionings agree, and the "
        "oracle hash-checks the EXACT member set, not just counts. One "
        "window shuffle on the group key; at 100 TB group count, not "
        "data size, bounds the output.",
    tags=("X10", "X12", "X28"),
)
def per_group_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return (group_sample(d, "lang", "doc_id", GROUP_SAMPLE_K)
            .select("lang", "doc_id", "rk"))


@register(
    "quality_weighted_sample",
    """
    WITH scored AS (
        SELECT doc_id, lang,
               LEAST(len(string_split_regex(trim(lower(text)), '\\s+')),
                     1000) AS w,
               ('0x' || substr(md5('qws:' || CAST(doc_id AS VARCHAR)),
                               1, 15))::BIGINT % 1000 AS u
        FROM documents
    )
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_kept,
           CAST(SUM(doc_id) AS BIGINT) AS id_sum,
           CAST(SUM(w) AS BIGINT) AS weight_kept
    FROM scored WHERE u < w
    GROUP BY lang
    """,
    doc="Deterministic QUALITY-WEIGHTED corpus sampling: each doc is "
        "kept with probability w/1000 where w = its (capped) token "
        "count — the importance-sampling step that upweights long/"
        "high-quality documents in a training mix. The keep decision "
        "is a pure scan predicate on md5(doc_id) (same u across runs, "
        "engines, and appends — unlike rand()-based sampling), so "
        "membership is exactly replayable: id_sum pins the precise "
        "kept set, not just counts.",
    tags=("X28", "X2", "X14"),
)
def quality_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    w = F.least(F.size(F.split(F.trim(F.lower(F.col("text"))), r"\s+")),
                F.lit(1000))
    u = (F.expr("CAST(conv(substring(md5(concat('qws:', "
                "CAST(doc_id AS STRING))), 1, 15), 16, 10) AS BIGINT)")
         % 1000)
    return (d.select("doc_id", "lang", w.alias("w"), u.alias("u"))
            .filter(F.col("u") < F.col("w"))
            .groupBy("lang")
            .agg(F.count("*").cast("long").alias("n_kept"),
                 F.sum("doc_id").cast("long").alias("id_sum"),
                 F.sum("w").cast("long").alias("weight_kept")))
