"""Scale levers for 100 TB joins: skew salting and bucketed co-location.

AQE's skew-join splitting (enabled in session.py) handles most skew at
runtime by splitting oversized partitions, but it only helps sort-merge
joins and cannot fix a single hot KEY whose rows genuinely belong
together. ``salted_join`` is the explicit fix: fan the hot side out
across ``n_salts`` sub-keys and replicate the other side, trading a
bounded replication factor for even partitioning.

``write_bucketed`` + a plain join is the zero-shuffle path for joins
repeated across many runs: both tables are hash-bucketed by the join
key at write time, so Spark proves co-partitioning from the catalog
and plans the join without any Exchange — at 100 TB that deletes the
single most expensive stage of the job. (Bucketed tables require the
table catalog: saveAsTable, not bare parquet paths.)
"""

from __future__ import annotations

import os
import shutil
from urllib.parse import urlparse

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def salted_join(big: DataFrame, small: DataFrame, key: str,
                n_salts: int = 8, how: str = "inner") -> DataFrame:
    """Equi-join resilient to a skewed ``key`` distribution on ``big``.

    big gains a deterministic per-row salt (hash of all columns, NOT
    random: retries/speculative tasks must re-derive the same salt);
    small is replicated n_salts times; the join key becomes
    (key, salt), splitting each hot key across n_salts reducers.
    Result equals ``big.join(small, key, how)`` exactly.
    """
    salt = (F.abs(F.xxhash64(*big.columns)) % n_salts).cast("int")
    b = big.withColumn("_salt", salt)
    s = small.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)])))
    return b.join(s, [key, "_salt"], how).drop("_salt")


def write_bucketed(df: DataFrame, table: str, key: str,
                   n_buckets: int = 16) -> None:
    """Persist ``df`` hash-bucketed (and sorted) by ``key`` so future
    joins/aggregations on ``key`` against an equally-bucketed table plan
    with NO shuffle on either side."""
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS `{table}`")
    # with the default in-memory catalog, a previous SESSION's managed
    # table leaves its warehouse dir behind with no catalog entry, and
    # saveAsTable refuses the location; clear it (no-op on a deployment
    # with a persistent metastore, where DROP TABLE removed it)
    wh = urlparse(spark.conf.get("spark.sql.warehouse.dir", "")).path
    loc = os.path.join(wh, table.lower())
    if wh and os.path.isdir(loc):
        shutil.rmtree(loc)
    (df.write.mode("overwrite")
       .bucketBy(n_buckets, key)
       .sortBy(key)
       .format("parquet")
       .saveAsTable(table))
