"""The reference Spotify dataflow (SURVEY.md §2.A) as driver-visible
queries: synthetic-client extract (S1-S6) -> nested snapshot ->
normalize (P1-P13) -> merge (J1).

Rows-only checks by design: the raw input is the deterministic
FakeSpotifyClient fixture (seed=42), not one of the driver's parquet
tables, so no DuckDB twin can see it. Exact golden-value coverage for
the same operators lives in tests/test_spotify_dataflow.py; these
entries prove the dataflow runs end-to-end on a bare session and emits
a stable schema/row-count the driver can track round over round.

Citations: extract_full_dataset mirrors /root/reference/scripts/
extract.py:194-276; snapshot_tables mirrors transform.py:170-178 and
etl_pipeline.py:125 (merge).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..registry import register
from ..sources.snapshot import snapshot_from_dict
from ..sources.spotify_rest import FakeSpotifyClient, extract_full_dataset
from ..spotify.normalize import snapshot_tables

RUN_DATE = "2025-04-18"  # pinned so extraction_date is reproducible


def _tables(spark: SparkSession) -> dict[str, DataFrame]:
    raw = extract_full_dataset(FakeSpotifyClient(seed=42), limit=50)
    snap = snapshot_from_dict(spark, raw)
    return snapshot_tables(snap, run_date=RUN_DATE)


@register(
    "spotify_albums",
    None,  # input is the synthetic API fixture, not a parquet table
    doc="Reference album normalization (P1-P3, P9-P11): nested releases "
        "-> 12-column albums with main-artist struct hops and genre "
        "array_join.",
    tags=("S6", "P1", "P2", "P3"),
)
def spotify_albums(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _tables(spark)["albums"]


@register(
    "spotify_tracks_with_features",
    None,
    doc="Reference track explode (P4-P6) + audio-features projection "
        "(P7-P8) + left merge (J1): the pipeline's full relational path.",
    tags=("P4", "P6", "J1"),
)
def spotify_tracks_with_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _tables(spark)["tracks_with_features"]


@register(
    "spotify_categories",
    None,
    doc="Categories flatten — implemented for real (the reference stubs "
        "it to an empty frame, transform.py:177).",
    tags=("S4",),
)
def spotify_categories(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _tables(spark)["categories"]


@register(
    "spotify_rest_scan",
    None,  # source is the synthetic REST API, not a parquet table
    doc="Spark 4 Python DataSource REST scan (S1/S2 at scale): driver "
        "lists albums once, executors fetch tracks per album batch; "
        "aggregated to per-album track stats.",
    tags=("S1", "S2"),
)
def spotify_rest_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pyspark.sql.functions as F

    from ..sources import rest_datasource as R

    R.register(spark)
    df = (spark.read.format("spotify_rest")
          .option("seed", 42).option("albums_per_partition", 4).load())
    return (df.groupBy("album_id", "album_name")
            .agg(F.count("*").alias("n_tracks"),
                 F.sum("duration_ms").alias("total_ms"))
            .orderBy("album_id"))
