"""Multi-dimensional data layout: z-order (Morton) clustering for
row-group / file pruning on conjunctive range predicates.

A single-column sort gives parquet min/max pruning on that column only;
a query filtering a rectangle on (a, b) still scans every row group for
the non-sorted dimension. Interleaving the bits of both keys (Morton
order) and range-partition-sorting on the interleaved key clusters rows
so every file/row group covers a small HYPERCUBE of the key space —
min/max stats become tight on BOTH columns and a rectangle predicate
prunes most of the data before any I/O. This is the layout trick behind
Delta/Databricks Z-ORDER and Iceberg's z-order rewrite, expressed here
with plain DataFrame ops and a vanilla parquet writer.

Everything is JVM-side expressions (bit fiddling via shiftright /
bitwiseAND); layout NEVER changes query results — the oracle twin of a
query over a z-ordered copy is the same query over the original table,
and the pruning win is measured (not assumed) from parquet footer stats
in tests/test_layout.py and surfaced by bench.py.

Reference parity: the reference has no storage layout control at all
(pandas snapshots, /root/reference/scripts/load.py); [EXT] scale op.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame


def _scale_to_bits(col: Column, lo: Column, hi: Column, bits: int) -> Column:
    """Map a value in [lo, hi] to an integer in [0, 2^bits): rank-free
    min/max normalization (monotonic, so range predicates on the raw
    column translate to range predicates on the scaled key)."""
    span = (hi - lo + 1).cast("double")
    scaled = F.floor((col - lo).cast("double") * (1 << bits) / span)
    return F.least(scaled.cast("long"), F.lit((1 << bits) - 1))


def zorder_key(cols: list[Column], los: list[Column], his: list[Column],
               bits: int = 16) -> Column:
    """Morton-interleave ``len(cols)`` integer columns into one BIGINT.

    Each column is min/max-scaled to ``bits`` bits, then bit b of
    column i lands at interleaved position b*n + (n-1-i) — column 0's
    high bit is the global MSB, so sorting by the key alternates
    locality across dimensions. n*bits must be <= 63.  The whole
    expression is static (n*bits terms of shift/and/shift), stays
    inside whole-stage codegen, and costs one projection — no UDF.
    """
    n = len(cols)
    if n * bits > 63:
        raise ValueError(f"zorder_key: {n} cols x {bits} bits > 63")
    scaled = [_scale_to_bits(c, lo, hi, bits)
              for c, lo, hi in zip(cols, los, his)]
    out = F.lit(0).cast("long")
    for i, s in enumerate(scaled):
        for b in range(bits):
            pos = b * n + (n - 1 - i)
            out = out + F.shiftleft(
                F.shiftright(s, b).bitwiseAND(F.lit(1)), pos)
    return out


def write_zordered(df: DataFrame, path: str, zcols: list[str],
                   n_files: int = 16, bits: int = 16,
                   block_bytes: int | None = None) -> None:
    """Rewrite ``df`` as parquet clustered in z-order on ``zcols``.

    Column mins/maxes for the bit scaling come from one cheap stats
    scan (min/max aggregate — at 100 TB this reads parquet footers, not
    data). The frame is then range-partitioned AND sorted within
    partitions by the Morton key, so both FILES (range partitioner) and
    ROW GROUPS inside each file (writer cuts groups from sorted rows)
    cover tight hypercubes. ``n_files`` is the parallelism knob — at
    real scale set it so files land near the 1 GB sweet spot.

    The write is a full-table shuffle ONCE, amortized across every
    rectangle query after it — same economics as the bucketed-join and
    IVF index builds (bench.py times builds apart from probes).
    """
    stats = df.agg(*[f(c).alias(f"{tag}_{c}")
                     for c in zcols
                     for tag, f in (("lo", F.min), ("hi", F.max))]).first()
    key = zorder_key([F.col(c).cast("long") for c in zcols],
                     [F.lit(int(stats[f"lo_{c}"])) for c in zcols],
                     [F.lit(int(stats[f"hi_{c}"])) for c in zcols],
                     bits=bits)
    out = (df.withColumn("_zkey", key)
           .repartitionByRange(n_files, "_zkey")
           .sortWithinPartitions("_zkey")
           .drop("_zkey"))
    writer = out.write.mode("overwrite")
    if block_bytes is not None:
        # small row groups at test scale so pruning granularity exists
        # inside single files; leave at parquet defaults (128 MB) for
        # real data.
        writer = writer.option("parquet.block.size", block_bytes)
    writer.parquet(path)


def rowgroup_prune_stats(path: str,
                         ranges: dict[str, tuple[float, float]]) -> dict:
    """Measure (don't guess) layout quality from parquet footers: of all
    row groups under ``path``, how many could a conjunctive rectangle
    predicate skip on min/max stats alone?  Returns {"total": n,
    "matching": m, "fraction": m/n} — ``fraction`` is the share of row
    groups a stats-pruning reader (Spark's parquet source with filter
    pushdown, same logic) must actually read.  Driver-side metadata
    walk, no data I/O."""
    import glob
    import os

    import pyarrow.parquet as pq

    total = matching = 0
    for f in glob.glob(os.path.join(path, "*.parquet")):
        meta = pq.ParquetFile(f).metadata
        schema_names = [meta.schema.column(i).name
                        for i in range(meta.num_columns)]
        for rg in range(meta.num_row_groups):
            total += 1
            hit = True
            for col, (lo, hi) in ranges.items():
                st = meta.row_group(rg).column(
                    schema_names.index(col)).statistics
                if st is None or not st.has_min_max:
                    continue  # no stats -> cannot prune on this column
                if st.max < lo or st.min > hi:
                    hit = False
                    break
            matching += hit
    return {"total": total, "matching": matching,
            "fraction": (matching / total) if total else 1.0}


def compact_files(spark, src_path: str, dst_path: str,
                  target_bytes: int = 1 << 30) -> dict:
    """Small-files compaction: rewrite a fragmented parquet directory
    into ceil(total_bytes / target_bytes) files via ``coalesce`` — NO
    shuffle (coalesce only merges read splits), so compaction cost is
    one read + one write regardless of fragment count. The operational
    fix for the classic small-files problem (a 100 TB table ingested in
    10k micro-batches accumulates millions of KB-sized files whose
    open/footer overhead dominates scans; Delta OPTIMIZE / Iceberg
    rewrite_data_files are this same operation).

    File sizes come from the Hadoop FileSystem API (works on HDFS/S3/
    local alike). Returns {"files_before", "files_after", "bytes"}.
    """
    import math

    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(src_path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    sizes = [st.getLen() for st in fs.listStatus(hpath)
             if st.getPath().getName().endswith(".parquet")]
    total = sum(sizes)
    n_out = max(1, math.ceil(total / target_bytes))
    (spark.read.parquet(src_path).coalesce(n_out)
     .write.mode("overwrite").parquet(dst_path))
    dpath = jvm.org.apache.hadoop.fs.Path(dst_path)
    after = [st for st in fs.listStatus(dpath)
             if st.getPath().getName().endswith(".parquet")]
    return {"files_before": len(sizes), "files_after": len(after),
            "bytes": total}
