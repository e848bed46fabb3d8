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
    Result equals ``big.join(small, key, how)`` for how in
    {inner, left}: replicating ``small`` breaks right/full (each
    unmatched small row would surface n_salts times) and inverts
    semi/anti semantics, so those are rejected.
    """
    if how not in ("inner", "left", "leftouter", "left_outer"):
        raise ValueError(
            f"salted_join supports how='inner'/'left' only, got {how!r}: "
            "replicating the small side breaks right/full/semi/anti")
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


def build_bloom(keys: DataFrame, key: str, n_bits: int = 1 << 16,
                n_hashes: int = 3) -> DataFrame:
    """Build a Bloom filter over ``keys[key]`` as a ONE-ROW DataFrame
    carrying the bitmap (``__bloom``: array<long>, ``n_bits/64`` words).

    The heavy work — hashing every key n_hashes times and OR-ing bits
    per 64-bit word — is a distributed groupBy; only the finished
    word->mask rows (<= n_bits/64, metadata scale) reach the driver,
    exactly like Spark's own runtime bloom-filter exchange
    (spark.sql.optimizer.runtime.bloomFilter.*) collects its bitmap to
    the driver for broadcast. Hashes are seeded xxhash64 — deterministic
    across retries.
    """
    spark = keys.sparkSession
    n_words = n_bits // 64
    pos = keys.select(
        F.explode(F.array(*[
            # pmod, not abs-%: abs(Long.MIN_VALUE) is still negative
            F.pmod(F.xxhash64(F.col(key), F.lit(i)), F.lit(n_bits)).alias("p")
            for i in range(n_hashes)
        ])).alias("p"))
    words = (pos.select((F.col("p") / 64).cast("int").alias("w"),
                        F.expr("shiftleft(1L, cast(p % 64 as int))").alias("m"))
             .groupBy("w").agg(F.expr("bit_or(m)").alias("mask"))
             .collect())
    bitmap = [0] * n_words
    for row in words:
        bitmap[row["w"]] = row["mask"]
    return spark.createDataFrame([(bitmap,)], "__bloom: array<long>")


def bloom_prune(fact: DataFrame, key: str, bloom: DataFrame,
                n_bits: int = 1 << 16, n_hashes: int = 3) -> DataFrame:
    """Drop ``fact`` rows whose ``key`` is definitely absent from the
    Bloom filter built by ``build_bloom`` (same n_bits/n_hashes).

    No false negatives, so ``bloom_prune(fact, k, bloom).join(dim, k)``
    equals ``fact.join(dim, k)`` exactly — the filter only deletes rows
    the join would drop anyway, BEFORE they are shuffled. At 100 TB
    against a selective dim this is the difference between shuffling the
    whole fact table and shuffling the ~matching fraction; it is the
    manual form of AQE's runtime bloom pruning, usable where that can't
    reach (e.g. a dim produced by arbitrary upstream logic).
    """
    conds = []
    for i in range(n_hashes):
        p = f"pmod(xxhash64(`{key}`, {i}), {n_bits})"
        conds.append(f"(element_at(__bloom, cast(({p}) / 64 as int) + 1)"
                     f" & shiftleft(1L, cast(({p}) % 64 as int))) != 0")
    return (fact.crossJoin(F.broadcast(bloom))
            .filter(F.expr(" AND ".join(conds)))
            .drop("__bloom"))
