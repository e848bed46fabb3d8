"""Streaming semantics tests that need multi-batch input: watermark
late-data drop (X22) and stateful dedup (X23)."""

from __future__ import annotations

import datetime as dt
import os

import pyspark.sql.functions as F
import pytest


def _write_batches(spark, tmpdir: str, batches: list[list[tuple]]) -> str:
    """Write each batch as one parquet file with increasing mtimes so the
    file stream source processes them in order."""
    src = os.path.join(tmpdir, "stream_src")
    os.makedirs(src, exist_ok=True)
    for i, rows in enumerate(batches):
        df = spark.createDataFrame(
            rows, "event_id: long, ts: timestamp, user_id: long, value: double")
        df.coalesce(1).write.mode("overwrite").parquet(
            os.path.join(tmpdir, f"_stage{i}"))
        part = [f for f in os.listdir(os.path.join(tmpdir, f"_stage{i}"))
                if f.endswith(".parquet")][0]
        dst = os.path.join(src, f"{i:03d}.parquet")
        os.rename(os.path.join(tmpdir, f"_stage{i}", part), dst)
        os.utime(dst, (1_700_000_000 + i * 60, 1_700_000_000 + i * 60))
    return src


T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def _t(minutes: int) -> dt.datetime:
    return T0 + dt.timedelta(minutes=minutes)


@pytest.fixture()
def stream_schema():
    from pyspark.sql.types import (DoubleType, LongType, StructField,
                                   StructType, TimestampType)

    return StructType([
        StructField("event_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("user_id", LongType()),
        StructField("value", DoubleType()),
    ])


def test_watermark_drops_late_rows(spark, tmp_path, stream_schema):
    # Spark filters late records with the PREVIOUS batch's watermark, so
    # the watermark advanced by batch 0 (60-10=50min) only filters from
    # batch 2 onward:
    #   batch 0: events up to t=60min
    #   batch 1: on-time row (watermark 50min becomes effective next batch)
    #   batch 2: a late event at t=5min -> dropped
    batches = [
        [(1, _t(5), 1, 1.0), (2, _t(15), 1, 1.0), (3, _t(60), 1, 1.0)],
        [(5, _t(61), 1, 1.0)],
        [(4, _t(5), 1, 1.0), (6, _t(62), 1, 1.0)],  # event 4 is LATE
    ]
    src = _write_batches(spark, str(tmp_path), batches)

    stream = (spark.readStream.schema(stream_schema)
              .option("maxFilesPerTrigger", 1).parquet(src))
    agg = (stream.withWatermark("ts", "10 minutes")
           .groupBy(F.window("ts", "10 minutes"))
           .agg(F.count("*").alias("n"))
           .select(F.col("window.start").alias("ws"), "n"))
    q = (agg.writeStream.outputMode("append").format("memory")
         .queryName("wm_test").trigger(availableNow=True).start())
    q.awaitTermination()

    dropped = sum(p["stateOperators"][0]["numRowsDroppedByWatermark"]
                  for p in q.recentProgress if p["stateOperators"])
    assert dropped == 1, "the t=5min row in batch 1 must be dropped"

    out = {r.ws: r.n for r in spark.table("wm_test").collect()}
    # window [0,10) was finalized with only the batch-0 event
    assert out[_t(0)] == 1


def test_stream_dedup_drops_within_watermark(spark, tmp_path, stream_schema):
    batches = [
        [(1, _t(0), 7, 1.0), (2, _t(1), 7, 1.0)],    # dup of user 7 key
        [(3, _t(2), 7, 1.0), (4, _t(3), 8, 1.0)],    # another dup + new key
    ]
    src = _write_batches(spark, str(tmp_path), batches)
    stream = (spark.readStream.schema(stream_schema)
              .option("maxFilesPerTrigger", 1).parquet(src))
    deduped = (stream.withWatermark("ts", "1 hour")
               .dropDuplicatesWithinWatermark(["user_id"])
               .select("user_id"))
    q = (deduped.writeStream.outputMode("append").format("memory")
         .queryName("dedup_test").trigger(availableNow=True).start())
    q.awaitTermination()
    survivors = [r.user_id for r in spark.table("dedup_test").collect()]
    assert sorted(survivors) == [7, 8]


def test_streaming_batch_parity(spark, sf_dir):
    """Tumbling streaming agg == identical batch agg on the same table."""
    from etl_airflow_spotify_spark.catalog import load_table
    from etl_airflow_spotify_spark.streaming import windows as W

    ev_stream = W.read_events_stream(spark, sf_dir)
    streamed = W.run_to_table(W.tumbling_counts(ev_stream), "parity_stream")

    ev_batch = load_table(spark, sf_dir, "events").withColumn(
        "ts", F.col("ts").cast("timestamp"))
    batch = W.tumbling_counts(ev_batch)
    assert sorted(map(tuple, streamed.collect())) == \
           sorted(map(tuple, batch.collect()))


def test_tws_user_stats_matches_batch(spark, sf_dir):
    """transformWithStateInPandas parity with the batch GROUP BY —
    skipped where the TWS protobuf runtime dependency is unavailable."""
    import pytest

    try:
        from google.protobuf import descriptor  # noqa: F401
    except ImportError:
        pytest.skip("google.protobuf unavailable: TWS runner cannot start")

    import pyspark.sql.functions as F

    from etl_airflow_spotify_spark.catalog import load_table
    from etl_airflow_spotify_spark.streaming import windows as W

    ev = W.read_events_stream(spark, sf_dir)
    got = {(r.user_id, r.n_events)
           for r in W.run_to_table(W.tws_user_stats(ev), "t_tws_test",
                                   output_mode="update").collect()}
    want = {(r.user_id, r.n)
            for r in load_table(spark, sf_dir, "events")
            .groupBy("user_id").agg(F.count("*").alias("n")).collect()}
    assert got == want


def test_foreachbatch_sink(spark, sf_dir, tmp_path):
    """foreachBatch: the arbitrary-sink escape hatch — each micro-batch
    lands as parquet via the batch writer; totals match the source."""
    import pyspark.sql.functions as F

    from etl_airflow_spotify_spark.catalog import load_table
    from etl_airflow_spotify_spark.streaming import windows as W

    out_dir = str(tmp_path / "fb_out")
    seen = []

    def sink(batch_df, batch_id):
        seen.append(batch_id)
        batch_df.write.mode("append").parquet(out_dir)

    ev = W.read_events_stream(spark, sf_dir).select("event_id", "user_id")
    q = (ev.writeStream.foreachBatch(sink)
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination()
    assert len(seen) >= 1
    got = spark.read.parquet(out_dir).count()
    want = load_table(spark, sf_dir, "events").count()
    assert got == want

    # exactly-once via checkpoint: restarting over the same checkpoint
    # re-processes nothing, so the sink stays unchanged
    q2 = (ev.writeStream.foreachBatch(sink)
          .option("checkpointLocation", str(tmp_path / "ckpt"))
          .trigger(availableNow=True).start())
    q2.awaitTermination()
    assert spark.read.parquet(out_dir).count() == want
