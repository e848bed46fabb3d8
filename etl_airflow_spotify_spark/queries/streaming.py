"""Streaming queries (X20-X23), each driven to completion with
availableNow and hash-checked against a batch-equivalent oracle where
the semantics are deterministic."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..registry import register
from ..streaming import windows as W
from . import curation as _curation


@register(
    "stream_tumbling_counts",
    """
    SELECT time_bucket(INTERVAL 10 MINUTE, ts) AS window_start,
           time_bucket(INTERVAL 10 MINUTE, ts) + INTERVAL 10 MINUTE AS window_end,
           event_type,
           COUNT(*) AS n,
           ROUND(SUM(value), 2) AS total_value
    FROM events
    GROUP BY 1, 2, 3
    """,
    doc="Streaming tumbling-window agg (availableNow), batch-equivalent oracle.",
    tags=("X20",),
)
def stream_tumbling_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = W.read_events_stream(spark, sf_dir)
    return W.run_to_table(W.tumbling_counts(ev), "t_tumbling")


@register(
    "stream_sliding_counts",
    """
    WITH expanded AS (
        SELECT e.*, ws
        FROM events e,
             unnest([time_bucket(INTERVAL 5 MINUTE, ts) - INTERVAL 5 MINUTE,
                     time_bucket(INTERVAL 5 MINUTE, ts)]) AS t(ws)
    )
    SELECT ws AS window_start,
           ws + INTERVAL 10 MINUTE AS window_end,
           COUNT(*) AS n,
           ROUND(SUM(value), 2) AS total_value
    FROM expanded
    GROUP BY 1, 2
    """,
    doc="Streaming sliding-window agg (10 min window / 5 min slide).",
    tags=("X20",),
)
def stream_sliding_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = W.read_events_stream(spark, sf_dir)
    return W.run_to_table(W.sliding_counts(ev), "t_sliding")


@register(
    "stream_session_windows",
    """
    WITH marked AS (
        SELECT user_id, ts,
               CASE WHEN ts - LAG(ts) OVER w > INTERVAL 30 MINUTE
                         OR LAG(ts) OVER w IS NULL
                    THEN 1 ELSE 0 END AS is_start
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ),
    numbered AS (
        SELECT user_id, ts,
               SUM(is_start) OVER (PARTITION BY user_id ORDER BY ts
                                   ROWS UNBOUNDED PRECEDING) AS seq
        FROM marked
    )
    SELECT user_id,
           MIN(ts) AS session_start,
           MAX(ts) + INTERVAL 30 MINUTE AS session_end,
           COUNT(*) AS n_events
    FROM numbered
    GROUP BY user_id, seq
    """,
    doc="Native streaming session_window; oracle emulates via gap islands "
        "(window end = last event + gap, per session_window semantics).",
    tags=("X21",),
)
def stream_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = W.read_events_stream(spark, sf_dir)
    return W.run_to_table(W.session_windows(ev), "t_sessions")


@register(
    "stream_dedup_watermark",
    """
    SELECT DISTINCT user_id, event_type FROM events
    """,
    doc="dropDuplicatesWithinWatermark: one row per key survives; "
        "projected to keys so the surviving set is deterministic.",
    tags=("X23",),
)
def stream_dedup_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = W.read_events_stream(spark, sf_dir)
    deduped = W.stream_dedup(ev, ["user_id", "event_type"])
    out = W.run_to_table(deduped.select("user_id", "event_type"),
                         "t_dedup", output_mode="append")
    return out


@register(
    "stream_watermark_append",
    None,  # emission timing of the final windows is trigger-dependent
    doc="Watermarked append-mode window counts: only watermark-passed "
        "windows emit; late rows past the watermark are dropped.",
    tags=("X22",),
)
def stream_watermark_append(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = W.read_events_stream(spark, sf_dir)
    return W.run_to_table(W.watermarked_counts(ev), "t_watermark",
                          output_mode="append")


@register(
    "stream_stateful_user_stats",
    """
    SELECT user_id, COUNT(*) AS n_events,
           ROUND(SUM(value), 2) AS total_value
    FROM events
    GROUP BY user_id
    """,
    doc="applyInPandasWithState custom stateful operator (X23/X24): "
        "per-user running totals in explicit group state. The whole "
        "input arrives in one availableNow batch here, so the final "
        "emission per user equals the batch GROUP BY oracle.",
    tags=("X23", "X24"),
)
def stream_stateful_user_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = W.read_events_stream(spark, sf_dir)
    out = W.run_to_table(W.stateful_user_stats(ev), "t_stateful",
                         output_mode="update")
    return out.select("user_id", "n_events",
                      F.round("total_value", 2).alias("total_value"))


@register(
    "stream_stream_join",
    """
    SELECT c.event_id AS click_id, p.event_id AS purchase_id,
           c.user_id, c.ts AS click_ts, p.ts AS purchase_ts
    FROM events c JOIN events p
      ON c.user_id = p.user_id
     AND c.event_type = 'click' AND p.event_type = 'purchase'
     AND p.ts BETWEEN c.ts AND c.ts + INTERVAL 30 MINUTE
    """,
    doc="Watermarked stream-stream inner join (clicks x purchases within "
        "30 min). The time-bound condition lets Spark purge join state "
        "as the watermark advances; batch-equivalent oracle.",
    tags=("X23",),
)
def stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    clicks = W.read_events_stream(spark, sf_dir) \
              .filter(F.col("event_type") == "click")
    purchases = W.read_events_stream(spark, sf_dir) \
                 .filter(F.col("event_type") == "purchase")
    return W.run_to_table(W.stream_stream_join(clicks, purchases),
                          "t_ssjoin", output_mode="append")


@register(
    "stream_decontaminate",
    _curation.DECON_ORACLE,  # identical semantics to the batch twin
    doc="STREAMING benchmark decontamination: training documents arrive "
        "as a file stream and each micro-batch is checked against the "
        "static benchmark suite — the shape of contamination-filtering "
        "an incoming crawl feed. foreachBatch runs the BATCH explode + "
        "ngram hash-join per micro-batch (same operator as "
        "decontaminate_ngram), so per-doc cost is O(doc ngrams), not "
        "O(suite ngrams): the previous per-row array_intersect-"
        "against-the-whole-suite HOF probed ~270k suite n-grams per "
        "document (13s at sf0.1; 1.4s as a join). Every doc lives in "
        "exactly one batch and the check is row-local, so batch "
        "boundaries cannot affect results — the batch oracle is exact. "
        "The eval side re-broadcasts per micro-batch from a persisted "
        "frame (benchmark suites are MBs vs TBs of stream).",
    tags=("X23", "X25", "X18"),
)
def stream_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import shutil

    from pyspark.sql.types import (LongType, StringType, StructField,
                                   StructType)

    from ..caching import persist_tracked
    from ..catalog import load_table
    from ..operators.curation import ngram_contamination
    from ..queries.curation import EVAL_MOD, NGRAM_N
    from ..streaming.windows import fold_stream_foreachbatch

    docs = load_table(spark, sf_dir, "documents")
    evals = persist_tracked(docs.filter(F.col("doc_id") % EVAL_MOD == 0)
                            .select("doc_id", "text"))

    schema = StructType([
        StructField("doc_id", LongType()),
        StructField("text", StringType()),
        StructField("lang", StringType()),
        StructField("source", StringType()),
        StructField("n_chars", LongType()),
    ])
    stream = (spark.readStream.schema(schema).format("parquet")
              .option("pathGlobFilter", "documents.parquet").load(sf_dir)
              # The file-stream source parallelizes per FILE (no
              # byte-range splitting like the batch scan), so a
              # few-big-files feed funnels each micro-batch into a few
              # tasks. Rebalance BEFORE the expensive per-doc n-gram
              # explode; shuffling raw text is cheap next to the
              # under-parallelized compute.
              .repartition(spark.sparkContext.defaultParallelism)
              .filter(F.col("doc_id") % EVAL_MOD != 0)
              .select("doc_id", "text"))

    suffix = os.path.basename(os.path.normpath(sf_dir)).replace(".", "_")
    ckpt = os.path.join("spark-warehouse", f"decon_ckpt_{suffix}")
    shutil.rmtree(ckpt, ignore_errors=True)

    def fold(state, batch_df):
        found = ngram_contamination(batch_df, evals, "doc_id", "text",
                                    n=NGRAM_N)
        # union of per-batch results; localCheckpoint keeps the plan
        # depth constant over the stream's lifetime
        out = found if state is None else state.unionAll(found)
        return out.localCheckpoint()

    (result,) = fold_stream_foreachbatch(stream, fold, ckpt)
    if result is None:
        return spark.createDataFrame(
            [], "doc_id long, n_shared_ngrams long, n_eval_docs long")
    return result


@register(
    "stream_static_enrich",
    """
    SELECT c_mktsegment, COUNT(*) AS n_events,
           ROUND(SUM(value), 2) AS total_value
    FROM events JOIN customer ON user_id = c_custkey
    GROUP BY c_mktsegment
    """,
    doc="Stream-static join: the events stream enriched per micro-batch "
        "against the broadcast customer dim, aggregated by segment.",
    tags=("X23", "X3"),
)
def stream_static_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..catalog import load_table

    ev = W.read_events_stream(spark, sf_dir)
    dim = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment")
    return W.run_to_table(W.stream_static_enrich(ev, dim), "t_enrich")


TOPK_USERS = 10


@register(
    "stream_topk_users",
    f"""
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           ROUND(SUM(value), 2) AS total_value
    FROM events
    GROUP BY user_id
    ORDER BY n_events DESC, user_id
    LIMIT {TOPK_USERS}
    """,
    doc="X61 streaming incremental top-k: the event feed arrives as 4 "
        "interleaved micro-batches; foreachBatch APPENDS each batch's "
        "partial per-user aggregate to a mergeable parquet rollup "
        "store (partials, not raw rows — the store grows with users x "
        "batches, not events), and the final read merges partials and "
        "takes the exact top-10. Counts/sums merge associatively, so "
        "batch boundaries cannot change the answer and the batch "
        "GROUP BY oracle is exact. This is the mergeable-rollup shape "
        "every streaming leaderboard/compaction pipeline uses at "
        "scale.",
    tags=("X61", "X23", "X20", "X12"),
)
def stream_topk_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import shutil

    from ..catalog import load_table
    from ..streaming.windows import fold_stream_foreachbatch

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "value")
    suffix = os.path.basename(os.path.normpath(sf_dir)).replace(".", "_")
    feed = os.path.join("spark-warehouse", f"topk_feed_{suffix}")
    store = os.path.join("spark-warehouse", f"topk_store_{suffix}")
    ckpt = os.path.join("spark-warehouse", f"topk_ckpt_{suffix}")
    for d in (feed, store, ckpt):
        shutil.rmtree(d, ignore_errors=True)
    for i in range(4):
        (ev.filter(F.pmod("event_id", F.lit(4)) == i)
         .coalesce(1).write.mode("append").parquet(feed))

    stream = (spark.readStream.schema(ev.schema)
              .option("maxFilesPerTrigger", 1).parquet(feed))

    def fold(state, batch_df):
        (batch_df.groupBy("user_id")
         .agg(F.count("*").alias("cnt"), F.sum("value").alias("val"))
         .write.mode("append").parquet(store))
        return (state or 0) + 1

    fold_stream_foreachbatch(stream, fold, ckpt)
    merged = (spark.read.parquet(store)
              .groupBy("user_id")
              .agg(F.sum("cnt").cast("long").alias("n_events"),
                   F.round(F.sum("val"), 2).alias("total_value")))
    return (merged.orderBy(F.desc("n_events"), F.asc("user_id"))
            .limit(TOPK_USERS))


@register(
    "stream_anomaly_days",
    """
    WITH daily AS (
        SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM events GROUP BY 1
    ),
    dowd AS (
        SELECT day, n, (day - DATE '1970-01-01') % 7 AS dow FROM daily
    ),
    base AS (
        SELECT dow, AVG(n) AS mu, stddev_samp(n) AS sd
        FROM dowd GROUP BY dow
    )
    SELECT d.day, d.n, CAST(d.dow AS BIGINT) AS dow,
           ROUND((d.n - b.mu) / b.sd, 4) AS z,
           CASE WHEN ABS((d.n - b.mu) / b.sd) > 2.5 THEN 1 ELSE 0 END
               AS is_anomaly
    FROM dowd d JOIN base b USING (dow)
    """,
    doc="X70 streaming anomaly detection over a mergeable daily rollup: "
        "the event feed arrives as 4 interleaved micro-batches; "
        "foreachBatch appends each batch's per-day partial counts to a "
        "parquet store (grows with days x batches, never events), and "
        "the detector — dow-seasonal z-scores, the X49 formula — runs "
        "on the merged calendar-bounded daily table. Counts merge "
        "associatively, so batch boundaries cannot change the answer "
        "and the batch GROUP BY oracle stays exact: the streaming path "
        "is hash-checked, not demoed.",
    tags=("X70", "X49", "X23", "X20"),
)
def stream_anomaly_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import shutil

    from pyspark.sql import Window

    from ..catalog import load_table
    from ..streaming.windows import fold_stream_foreachbatch

    ev = (load_table(spark, sf_dir, "events")
          .select("event_id",
                  F.date_trunc("day", "ts").cast("date").alias("day")))
    suffix = os.path.basename(os.path.normpath(sf_dir)).replace(".", "_")
    feed = os.path.join("spark-warehouse", f"anom_feed_{suffix}")
    store = os.path.join("spark-warehouse", f"anom_store_{suffix}")
    ckpt = os.path.join("spark-warehouse", f"anom_ckpt_{suffix}")
    for d in (feed, store, ckpt):
        shutil.rmtree(d, ignore_errors=True)
    for i in range(4):
        (ev.filter(F.pmod("event_id", F.lit(4)) == i)
         .coalesce(1).write.mode("append").parquet(feed))

    stream = (spark.readStream.schema(ev.schema)
              .option("maxFilesPerTrigger", 1).parquet(feed))

    def fold(state, batch_df):
        (batch_df.groupBy("day").agg(F.count("*").alias("cnt"))
         .write.mode("append").parquet(store))
        return (state or 0) + 1

    fold_stream_foreachbatch(stream, fold, ckpt)
    daily = (spark.read.parquet(store)
             .groupBy("day").agg(F.sum("cnt").cast("long").alias("n")))
    dowd = daily.withColumn(
        "dow", F.datediff("day", F.lit("1970-01-01").cast("date")) % 7)
    base = dowd.groupBy("dow").agg(F.avg("n").alias("mu"),
                                   F.stddev_samp("n").alias("sd"))
    z = (F.col("n") - F.col("mu")) / F.col("sd")
    return (dowd.join(F.broadcast(base), "dow")
            .select("day", "n", F.col("dow").cast("long").alias("dow"),
                    F.round(z, 4).alias("z"),
                    F.when(F.abs(z) > 2.5, 1).otherwise(0)
                    .alias("is_anomaly")))


@register(
    "stream_cdc_scd2",
    """
    WITH ch AS (
        SELECT user_id AS c_custkey, ts, event_id,
               CASE WHEN event_type = 'error' THEN 'D' ELSE 'U' END AS op,
               'cdc:' || CAST(user_id AS VARCHAR) AS c_name,
               ROUND(value * 1000, 2) AS c_acctbal,
               upper(event_type) AS c_mktsegment
        FROM events
    ),
    base AS (
        SELECT c_custkey, CAST(NULL AS TIMESTAMP) AS ts,
               CAST(NULL AS BIGINT) AS event_id, 'I' AS op,
               c_name, c_acctbal, c_mktsegment
        FROM customer
    ),
    hist AS (SELECT * FROM base UNION ALL SELECT * FROM ch),
    v AS (
        SELECT *, LEAD(ts) OVER (
                   PARTITION BY c_custkey
                   ORDER BY ts ASC NULLS FIRST, event_id ASC NULLS FIRST
               ) AS valid_to
        FROM hist
    )
    SELECT c_custkey, c_name, ROUND(c_acctbal, 2) AS c_acctbal,
           c_mktsegment, ts AS valid_from, valid_to,
           (valid_to IS NULL) AS is_current
    FROM v WHERE op <> 'D'
    """,
    doc="X95 streaming CDC feed folded into an SCD2 history table: the "
        "changelog arrives as 4 interleaved micro-batches; foreachBatch "
        "appends each batch's change rows to a change store (a CDC "
        "store grows with CHANGES, the dimension's churn, never the "
        "fact volume), and the SCD2 fold — one union + one LEAD window "
        "per key — runs on the accumulated store. SCD2 is a pure "
        "function of the change multiset, so batch boundaries cannot "
        "move a single validity interval and the batch oracle is "
        "exact. The lakehouse dimension-history ingestion pattern.",
    tags=("X95", "X31", "X23", "X11"),
)
def stream_cdc_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import shutil

    from ..catalog import load_table
    from ..operators.cdc import scd2_history
    from ..streaming.windows import fold_stream_foreachbatch
    from .maintenance import _customer_changes

    changes = _customer_changes(spark, sf_dir)
    suffix = os.path.basename(os.path.normpath(sf_dir)).replace(".", "_")
    feed = os.path.join("spark-warehouse", f"scd2_feed_{suffix}")
    store = os.path.join("spark-warehouse", f"scd2_store_{suffix}")
    ckpt = os.path.join("spark-warehouse", f"scd2_ckpt_{suffix}")
    for d in (feed, store, ckpt):
        shutil.rmtree(d, ignore_errors=True)
    for i in range(4):
        (changes.filter(F.pmod("event_id", F.lit(4)) == i)
         .coalesce(1).write.mode("append").parquet(feed))

    stream = (spark.readStream.schema(
        changes.schema).option("maxFilesPerTrigger", 1).parquet(feed))

    def fold(state, batch_df):
        batch_df.write.mode("append").parquet(store)
        return (state or 0) + 1

    fold_stream_foreachbatch(stream, fold, ckpt)
    acc = spark.read.parquet(store)
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_acctbal", "c_mktsegment")
    hist = scd2_history(cust, acc, "c_custkey", "ts",
                        seq_cols=["ts", "event_id"])
    return hist.select(
        "c_custkey", "c_name",
        F.round("c_acctbal", 2).alias("c_acctbal"),
        "c_mktsegment", "valid_from", "valid_to", "is_current")


# --------------------------------------------------------------------------
# X198: streaming KMV distinct sketch — X186's exact-replayable
# bottom-K sketch fitted to the mergeable-rollup streaming shape of
# X61: each micro-batch appends its OWN bottom-K per event type to a
# parquet sketch store (K rows per group per batch — the store grows
# with groups x batches, never events), and the final read re-ranks
# the union and keeps the global bottom-K. Because bottom-k is a
# lattice (merge = min-k of unions, associative and commutative),
# batch boundaries cannot change the merged sketch, so the batch
# GROUP BY oracle is EXACT — the only distinct-count sketch in the
# registry whose STREAMING variant hash-checks end to end (the HLL
# sliding path is rows-only).
# --------------------------------------------------------------------------
def _stream_kmv_sql() -> str:
    from .sketches import KMV_K
    two60 = 1 << 60
    return f"""
    WITH dv AS (
        SELECT DISTINCT event_type AS scope, user_id AS u FROM events
    ),
    h AS (
        SELECT scope, u,
               ('0x' || substr(md5('kmv:' || u), 1, 15))::BIGINT AS hv
        FROM dv
    ),
    rk AS (
        SELECT scope, hv,
               ROW_NUMBER() OVER (PARTITION BY scope
                                  ORDER BY hv, u) AS rn
        FROM h
    )
    SELECT scope, CAST(COUNT(*) AS BIGINT) AS n_sketch,
           MAX(CASE WHEN rn = {KMV_K} THEN hv END) AS kth_hash,
           CASE WHEN MAX(CASE WHEN rn = {KMV_K} THEN hv END) IS NULL
                THEN CAST(COUNT(*) AS BIGINT)
                ELSE CAST(ROUND(({KMV_K} - 1)
                     * ({two60}.0 / MAX(CASE WHEN rn = {KMV_K}
                                        THEN hv END)), 0) AS BIGINT)
           END AS est
    FROM rk WHERE rn <= {KMV_K}
    GROUP BY scope ORDER BY scope
    """


@register(
    "stream_kmv_distinct",
    _stream_kmv_sql(),
    doc="X198 streaming KMV distinct: 4 micro-batches each append "
        "their per-type bottom-K md5 sketch rows to a parquet store "
        "(groups x K x batches, never events); the final read "
        "re-ranks the union to the global bottom-K. Bottom-k is a "
        "lattice, so the merge is batch-boundary-proof and the batch "
        "oracle is exact — the registry's only hash-checked "
        "STREAMING distinct sketch.",
    tags=("X198", "X186", "X61", "X20"),
)
def stream_kmv_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import shutil

    from pyspark.sql import Window

    from ..catalog import load_table
    from ..streaming.windows import fold_stream_foreachbatch
    from .sketches import KMV_K

    two60 = float(1 << 60)
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "user_id")
    suffix = os.path.basename(os.path.normpath(sf_dir)).replace(".", "_")
    feed = os.path.join("spark-warehouse", f"kmv_feed_{suffix}")
    store = os.path.join("spark-warehouse", f"kmv_store_{suffix}")
    ckpt = os.path.join("spark-warehouse", f"kmv_ckpt_{suffix}")
    for d in (feed, store, ckpt):
        shutil.rmtree(d, ignore_errors=True)
    for i in range(4):
        (ev.filter(F.pmod("event_id", F.lit(4)) == i)
         .coalesce(1).write.mode("append").parquet(feed))

    stream = (spark.readStream.schema(ev.schema)
              .option("maxFilesPerTrigger", 1).parquet(feed))
    wg = Window.partitionBy("scope").orderBy("hv", "u")

    def fold(state, batch_df):
        sk = (batch_df
              .select(F.col("event_type").alias("scope"),
                      F.col("user_id").alias("u"))
              .distinct()
              .withColumn("hv", F.conv(F.substring(
                  F.md5(F.concat(F.lit("kmv:"),
                                 F.col("u").cast("string"))),
                  1, 15), 16, 10).cast("long"))
              .withColumn("rn", F.row_number().over(wg))
              .filter(F.col("rn") <= KMV_K)
              .select("scope", "u", "hv"))
        sk.write.mode("append").parquet(store)
        return (state or 0) + 1

    fold_stream_foreachbatch(stream, fold, ckpt)
    merged = (spark.read.parquet(store)
              .select("scope", "u", "hv").distinct()
              .withColumn("rn", F.row_number().over(wg))
              .filter(F.col("rn") <= KMV_K))
    est = F.when(F.col("kth_hash").isNull(), F.col("n_sketch")) \
        .otherwise(F.round((KMV_K - 1)
                           * (F.lit(two60) / F.col("kth_hash")), 0)
                   .cast("long"))
    return (merged.groupBy("scope")
            .agg(F.count("*").cast("long").alias("n_sketch"),
                 F.max(F.when(F.col("rn") == KMV_K, F.col("hv")))
                 .alias("kth_hash"))
            .select("scope", "n_sketch", "kth_hash", est.alias("est"))
            .orderBy("scope"))


# --------------------------------------------------------------------------
# X261: streaming Page-Hinkley drift monitoring — the r5-verdict
# stretch item: X229's detector lifted onto the X70/X198 mergeable-
# partial pattern. The PH recurrence is sequential in DAYS, so the
# streaming form keeps a MERGEABLE store of per-day partial counts
# (foreachBatch appends each micro-batch's (day, n) histogram; late
# batches for the same day merge by SUM — order-free, exactly the
# property that makes the detector replayable), then folds the X229
# recurrence over the merged dailies once the feed drains. Same
# output, same oracle as X229 — which is the point: a drift monitor
# whose batch and streaming answers are bit-identical.
# --------------------------------------------------------------------------
from . import events_ops as _events_ops  # noqa: E402


@register(
    "stream_page_hinkley",
    _events_ops.PH_ORACLE_SQL,  # bit-identical to X229 -> same oracle
    doc="X261 streaming Page-Hinkley: 4-batch event feed, foreachBatch "
        "appends per-batch (day, n) partials to a mergeable store "
        "(order-free SUM merge), final fold runs the exact X229 "
        "recurrence over merged dailies — bit-identical to the batch "
        "detector, attested by the SAME DuckDB oracle. The X70/X198 "
        "mergeable-rollup pattern applied to drift monitoring. "
        "Batch-equals-stream law in tests/test_round6_laws.py.",
    tags=("X261", "X229", "X23", "X20", "X49", "X11"),
)
def stream_page_hinkley(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import shutil

    from ..catalog import load_table
    from ..streaming.windows import fold_stream_foreachbatch
    from .events_ops import ph_from_daily

    ev = load_table(spark, sf_dir, "events").select("event_id", "ts")
    suffix = os.path.basename(os.path.normpath(sf_dir)).replace(".", "_")
    feed = os.path.join("spark-warehouse", f"ph_feed_{suffix}")
    store = os.path.join("spark-warehouse", f"ph_store_{suffix}")
    ckpt = os.path.join("spark-warehouse", f"ph_ckpt_{suffix}")
    for d in (feed, store, ckpt):
        shutil.rmtree(d, ignore_errors=True)
    for i in range(4):
        (ev.filter(F.pmod("event_id", F.lit(4)) == i)
         .coalesce(1).write.mode("append").parquet(feed))

    stream = (spark.readStream.schema(ev.schema)
              .option("maxFilesPerTrigger", 1).parquet(feed))

    def fold(state, batch_df):
        part = (batch_df
                .groupBy(F.date_trunc("day", "ts").cast("date")
                         .alias("day"))
                .agg(F.count("*").cast("long").alias("n")))
        part.write.mode("append").parquet(store)
        return (state or 0) + 1

    fold_stream_foreachbatch(stream, fold, ckpt)
    daily = (spark.read.parquet(store)
             .groupBy("day").agg(F.sum("n").cast("long").alias("n")))
    return ph_from_daily(daily)
