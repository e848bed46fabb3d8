"""Spark 4 Python DataSource for the REST ingest (S1/S2 at scale).

The reference fetches every album's tracks in a driver-side loop
(/root/reference/scripts/extract.py:212-231). This is the distributed
form SURVEY.md §2.A prescribes for S2: ONE cheap catalog call on the
driver lists the albums (``partitions()``), then the per-album track
fetches — the N+1 bulk of the HTTP work — run on EXECUTORS, one
partition per album batch, so ingest throughput scales with the
cluster, bounded per executor by the client's rate limit.

Usage:
    spark.dataSource.register(SpotifyRestDataSource)
    df = (spark.read.format("spotify_rest")
          .option("seed", 42).option("limit", 50)
          .option("albums_per_partition", 4).load())

The deterministic FakeSpotifyClient stands in for the network client;
a live client with auth/retry (O3) drops into the same two hooks.
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition
from pyspark.sql.types import (BooleanType, IntegerType, LongType, StringType,
                               StructField, StructType)

TRACK_SCAN_SCHEMA = StructType([
    StructField("album_id", StringType()),
    StructField("album_name", StringType()),
    StructField("release_date", StringType()),
    StructField("track_id", StringType()),
    StructField("track_name", StringType()),
    StructField("track_number", IntegerType()),
    StructField("duration_ms", LongType()),
    StructField("explicit", BooleanType()),
])


class AlbumBatch(InputPartition):
    """One executor work unit: fetch tracks for this batch of albums.
    Carries the album metadata captured by the driver's catalog call so
    executors never re-fetch it."""

    def __init__(self, albums: Sequence[tuple[str, str, str]]):
        self.albums = list(albums)


class SpotifyRestReader(DataSourceReader):
    def __init__(self, options: dict):
        self.seed = int(options.get("seed", 42))
        self.limit = int(options.get("limit", 50))
        self.per_partition = int(options.get("albums_per_partition", 4))

    def _client(self):
        from .spotify_rest import FakeSpotifyClient

        return FakeSpotifyClient(seed=self.seed)

    def partitions(self) -> list[AlbumBatch]:
        # Driver side: the single S1 catalog scan. At 50 albums/call the
        # reference's API cap (extract.py:109) this is one request.
        albums = [(a["id"], a["name"], a["release_date"])
                  for a in self._client().get_new_releases(limit=self.limit)]
        k = self.per_partition
        return [AlbumBatch(albums[i:i + k]) for i in range(0, len(albums), k)]

    def read(self, partition: AlbumBatch) -> Iterator[tuple]:
        # Executor side: the S2 keyed sub-resource scans for this batch.
        client = self._client()
        for album_id, album_name, release_date in partition.albums:
            for t in client.get_tracks_from_album(album_id):
                yield (album_id, album_name, release_date,
                       t["id"], t["name"], int(t["track_number"]),
                       int(t["duration_ms"]), bool(t["explicit"]))


class SpotifyRestDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "spotify_rest"

    def schema(self) -> StructType:
        return TRACK_SCAN_SCHEMA

    def reader(self, schema: StructType) -> SpotifyRestReader:
        return SpotifyRestReader(self.options)


def register(spark) -> None:
    """Idempotent format registration. Also configures the session:
    executor workers deserialize the DataSource by module reference, so
    the package zip must be shipped (session._ship_package) for sessions
    not launched from the repo root."""
    from ..session import configure

    configure(spark)
    spark.dataSource.register(SpotifyRestDataSource)
