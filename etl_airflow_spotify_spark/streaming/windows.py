"""Streaming window operators over the events table.

Batch parity strategy: each operator is a *streaming* dataflow
(readStream -> transform -> writeStream) driven to completion with an
availableNow trigger and a memory sink, so the registered queries return
ordinary DataFrames the driver can hash against batch-equivalent oracle
SQL. At production scale the same plans run against Kafka/file streams
with processing-time triggers — nothing here depends on the data being
finite except the trigger choice.

The events parquet has stored ts two ways across driver rounds:
TIMESTAMP(NANOS) (readable only as int64 via nanosAsLong) and plain
TIMESTAMP(MICROS). File streams need an explicit schema, so we probe
the footer with a batch read (metadata only, no scan) and adapt —
watermarks need a true event-time TIMESTAMP column either way.
"""

from __future__ import annotations

import os

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..session import configure


def read_events_stream(spark: SparkSession, sf_dir: str,
                       max_files_per_trigger: int | None = None) -> DataFrame:
    """File-source stream of the events table with a proper event-time
    column (TIMESTAMP, session tz UTC)."""
    configure(spark)
    # Footer-only batch read to discover the physical ts encoding.
    raw_schema = spark.read.parquet(
        os.path.join(sf_dir, "events.parquet")).schema
    reader = (spark.readStream.schema(raw_schema)
              .format("parquet")
              # file stream sources take a directory; select just the
              # events table out of the shared scale-factor dir
              .option("pathGlobFilter", "events.parquet"))
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    raw = reader.load(sf_dir)
    if raw_schema["ts"].dataType.simpleString() == "bigint":
        return raw.withColumn(
            "ts", F.timestamp_micros(F.expr("ts DIV 1000")))
    return raw.withColumn("ts", F.col("ts").cast("timestamp"))


def run_to_table(stream_df: DataFrame, name: str,
                 output_mode: str = "complete") -> DataFrame:
    """Drive a streaming frame to completion (availableNow) into a memory
    sink; return the materialized result as a batch DataFrame."""
    spark = stream_df.sparkSession
    q = (stream_df.writeStream.outputMode(output_mode)
         .format("memory").queryName(name)
         .trigger(availableNow=True).start())
    q.awaitTermination()
    return spark.table(name)


def tumbling_counts(events: DataFrame, width: str = "10 minutes") -> DataFrame:
    """X20: tumbling event-time window aggregate."""
    return (
        events
        .groupBy(F.window("ts", width), "event_type")
        .agg(F.count("*").alias("n"),
             F.round(F.sum("value"), 2).alias("total_value"))
        .select(F.col("window.start").alias("window_start"),
                F.col("window.end").alias("window_end"),
                "event_type", "n", "total_value")
    )


def sliding_counts(events: DataFrame, width: str = "10 minutes",
                   slide: str = "5 minutes") -> DataFrame:
    """X20: sliding event-time window aggregate (each row lands in
    width/slide overlapping windows). No exact count-distinct here:
    streaming aggregation state must be mergeable, so Spark forbids it
    (use approx_count_distinct when needed)."""
    return (
        events
        .groupBy(F.window("ts", width, slide))
        .agg(F.count("*").alias("n"),
             F.round(F.sum("value"), 2).alias("total_value"))
        .select(F.col("window.start").alias("window_start"),
                F.col("window.end").alias("window_end"),
                "n", "total_value")
    )


def session_windows(events: DataFrame, gap: str = "30 minutes") -> DataFrame:
    """X21: native streaming session windows (gap-based). Window end is
    last-event + gap per Spark's session_window semantics."""
    return (
        events
        .groupBy("user_id", F.session_window("ts", gap))
        .agg(F.count("*").alias("n_events"))
        .select("user_id",
                F.col("session_window.start").alias("session_start"),
                F.col("session_window.end").alias("session_end"),
                "n_events")
    )


def watermarked_counts(events: DataFrame, delay: str = "1 hour",
                       width: str = "10 minutes") -> DataFrame:
    """X22: watermarked tumbling aggregate in append mode — only windows
    the watermark has passed are emitted; rows older than the watermark
    are dropped on arrival."""
    return (
        events
        .withWatermark("ts", delay)
        .groupBy(F.window("ts", width))
        .agg(F.count("*").alias("n"))
        .select(F.col("window.start").alias("window_start"), "n")
    )


def stream_dedup(events: DataFrame, keys: list[str],
                 delay: str = "1 hour") -> DataFrame:
    """X23: stateful streaming dedup — duplicates of a key arriving
    within the watermark horizon are dropped; state is purged as the
    watermark advances (bounded memory on an infinite stream)."""
    return events.withWatermark("ts", delay) \
                 .dropDuplicatesWithinWatermark(keys)


def stateful_user_stats(events: DataFrame) -> DataFrame:
    """Custom stateful operator via applyInPandasWithState: per-user
    running (count, sum) kept in explicit group state across
    micro-batches, current totals emitted per batch a user appears in.
    This is the escape hatch for stateful semantics the built-in
    windowed aggregates can't express (per-key ML feature state,
    CEP-style patterns); state lives in the state store (RocksDB on a
    real cluster), partitioned by the group key, bounded by key
    cardinality — not stream length."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def fn(key: tuple, pdfs, state: GroupState):
        n, s = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            s += float(pdf["value"].sum())
        state.update((n, s))
        yield pd.DataFrame({"user_id": [key[0]],
                            "n_events": [n], "total_value": [s]})

    return events.groupBy("user_id").applyInPandasWithState(
        fn,
        outputStructType="user_id long, n_events long, total_value double",
        stateStructType="n long, s double",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def stream_stream_join(clicks: DataFrame, purchases: DataFrame,
                       horizon: str = "30 minutes",
                       delay: str = "1 hour") -> DataFrame:
    """X23: watermarked stream-stream inner join — each click joined to
    the purchases that follow it within ``horizon``. Both sides carry
    watermarks plus a time-bound join condition, so Spark can purge
    buffered state once the watermark passes the horizon (bounded state
    on infinite streams)."""
    c = (clicks.withWatermark("ts", delay)
         .select(F.col("event_id").alias("click_id"),
                 F.col("user_id"), F.col("ts").alias("click_ts")))
    p = (purchases.withWatermark("ts", delay)
         .select(F.col("event_id").alias("purchase_id"),
                 F.col("user_id").alias("p_user_id"),
                 F.col("ts").alias("purchase_ts")))
    return (
        c.join(p, F.expr(f"""
                  user_id = p_user_id AND
                  purchase_ts BETWEEN click_ts AND
                                      click_ts + INTERVAL {horizon}
              """))
        .select("click_id", "purchase_id", "user_id",
                "click_ts", "purchase_ts")
    )


def tws_user_stats(events: DataFrame) -> DataFrame:
    """Same per-user running totals as ``stateful_user_stats``, on the
    Spark 4 transformWithStateInPandas API: a StatefulProcessor with a
    typed ValueState handle (the successor to applyInPandasWithState,
    adding multiple named state variables, TTL, and timers).

    NOTE: the TWS runner needs a working google.protobuf on Python
    workers, which this container lacks — so no driver query is
    registered for it; tests/test_streaming.py skips unless the
    dependency imports. applyInPandasWithState (stateful_user_stats)
    is the driver-checked custom-state path."""
    import pandas as pd
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor, StatefulProcessorHandle)

    class UserStats(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._agg = handle.getValueState("agg", "n BIGINT, s DOUBLE")

        def handleInputRows(self, key, rows, timerValues):
            n, s = self._agg.get() if self._agg.exists() else (0, 0.0)
            for pdf in rows:
                n += len(pdf)
                s += float(pdf["value"].sum())
            self._agg.update((n, s))
            yield pd.DataFrame({"user_id": [key[0]],
                                "n_events": [n], "total_value": [s]})

        def close(self) -> None:
            pass

    return events.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=UserStats(),
        outputStructType="user_id long, n_events long, total_value double",
        outputMode="Update",
        timeMode="None",
    )


def stream_static_enrich(events: DataFrame, dim: DataFrame,
                         dim_key: str = "c_custkey") -> DataFrame:
    """Stream-static join: each micro-batch joins against a batch dim
    table (re-read per batch, so slowly-changing dims stay current
    without restarting the query). The dim side is broadcast-HINTED,
    not left to the planner: micro-batch plans run without AQE, and
    static size estimation only works for direct file scans — any
    derived dim (filter/project/agg) loses stats and would fall back
    to shuffling the stream side. No stream state is kept for the
    join itself."""
    return (
        events.join(F.broadcast(dim), events.user_id == dim[dim_key])
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n_events"),
             F.round(F.sum("value"), 2).alias("total_value"))
    )


def fold_stream_foreachbatch(stream_df: DataFrame, fold_fn,
                             checkpoint_dir: str) -> list:
    """Drive a stream to completion (availableNow), folding each
    micro-batch into driver-held state with ``fold_fn(state, batch_df)
    -> state`` — the foreachBatch pattern behind streaming MERGE/upsert
    sinks. Returns the final state (a one-element list cell, because
    foreachBatch runs in a callback).

    The checkpoint dir must be FRESH per logical run (a reused
    checkpoint replays nothing — the source thinks it already processed
    the files); callers own that lifecycle."""
    state: list = [None]

    def _on_batch(batch_df: DataFrame, batch_id: int) -> None:
        state[0] = fold_fn(state[0], batch_df)

    q = (stream_df.writeStream.foreachBatch(_on_batch)
         .option("checkpointLocation", checkpoint_dir)
         .trigger(availableNow=True).start())
    q.awaitTermination()
    return state
