"""Typed loaders for the driver's synthetic test tables.

Tables (one parquet file per table under a scale-factor dir, see
/root/repo/TESTDATA.md): region nation customer supplier part orders
lineitem events documents embeddings.

The only normalization done here is the ``events.ts`` column:
the file stores parquet TIMESTAMP(NANOS) which Spark's vectorized reader
rejects, so we read the physical int64 (``spark.sql.legacy.parquet.
nanosAsLong``) and convert to TIMESTAMP_NTZ at microsecond precision —
bit-identical to what DuckDB produces for the same file.
"""

from __future__ import annotations

import os

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from .session import configure

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one test table with oracle-compatible types."""
    configure(spark)
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events":
        # The driver has generated events.ts two ways across rounds:
        # parquet TIMESTAMP(NANOS) (read as int64 via nanosAsLong) and
        # plain TIMESTAMP(MICROS). Normalize both to TIMESTAMP_NTZ
        # micros — bit-identical to DuckDB's read of the same file.
        ts_type = df.schema["ts"].dataType.simpleString()
        if ts_type == "bigint":
            # Integer DIV, not `/`: float division loses low bits at
            # 1e18 nanos.
            df = df.withColumn(
                "ts",
                F.timestamp_micros(F.expr("ts DIV 1000")).cast("timestamp_ntz"),
            )
        else:
            df = df.withColumn("ts", F.col("ts").cast("timestamp_ntz"))
    return df


def spread(df: DataFrame, key: str) -> DataFrame:
    """Hash-repartition to full parallelism when the input arrived in
    fewer splits than cores — applied BEFORE expensive per-row work
    (shingling, tokenizing, hashing) so that work parallelizes even when
    a small test file reads as one split. No-op shape at real scale,
    where scans already produce >= cores partitions.

    Gated on ``inputFiles()`` (a file listing), NOT
    ``df.rdd.getNumPartitions()``: the RDD conversion materializes the
    physical plan at query-BUILD time, driver-side work paid on every
    plan construction. File count under-estimates split count (big
    files split further by maxPartitionBytes), so this only ever errs
    toward repartitioning — and once file count reaches core count the
    shuffle is correctly skipped."""
    target = df.sparkSession.sparkContext.defaultParallelism
    if len(df.inputFiles()) < target:
        return df.repartition(target, key)
    return df


def load_tables(spark: SparkSession, sf_dir: str,
                names: tuple[str, ...] = TABLES) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in names}


def register_views(spark: SparkSession, sf_dir: str,
                   names: tuple[str, ...] = TABLES) -> None:
    """Expose the test tables as temp views for spark.sql queries."""
    for n in names:
        load_table(spark, sf_dir, n).createOrReplaceTempView(n)
