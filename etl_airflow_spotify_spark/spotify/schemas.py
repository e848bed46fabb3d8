"""Explicit schemas for the Spotify dataflow.

The reference declares no schemas anywhere — columns exist because dict
literals name them (reference transform.py:44-57) and empty inputs
collapse to schema-less empty DataFrames (transform.py:60-63). Explicit
StructTypes close that bug class: every reader/normalizer yields the
same columns and types on empty input.

Shapes derive from the reference's extraction code:
  * snapshot top level        extract.py:271-276
  * enriched album            extract.py:234-249
  * track                     extract.py:144-159 (albums/{id}/tracks items)
  * audio features            extract.py:120-142 + transform.py:107-114
  * categories                extract.py:161-176
"""

from __future__ import annotations

from pyspark.sql.types import (ArrayType, BooleanType, DateType, DoubleType,
                               IntegerType, LongType, MapType, StringType,
                               StructField, StructType)

ARTIST_REF = StructType([
    StructField("id", StringType()),
    StructField("name", StringType()),
])

MAIN_ARTIST_DETAILS = StructType([
    StructField("id", StringType()),
    StructField("name", StringType()),
    StructField("genres", ArrayType(StringType())),
    StructField("popularity", IntegerType()),
    StructField("followers", StructType([StructField("total", LongType())])),
])

TRACK = StructType([
    StructField("id", StringType()),
    StructField("name", StringType()),
    StructField("track_number", IntegerType()),
    StructField("duration_ms", LongType()),
    StructField("explicit", BooleanType()),
    StructField("artists", ArrayType(ARTIST_REF)),
    StructField("external_urls", MapType(StringType(), StringType())),
])

ENRICHED_ALBUM = StructType([
    StructField("album_id", StringType()),
    StructField("album_name", StringType()),
    StructField("album_type", StringType()),
    StructField("release_date", StringType()),  # "YYYY"|"YYYY-MM"|"YYYY-MM-DD"
    StructField("total_tracks", IntegerType()),
    StructField("popularity", IntegerType()),
    StructField("artists", ArrayType(ARTIST_REF)),
    StructField("main_artist_details", MAIN_ARTIST_DETAILS),
    StructField("tracks", ArrayType(TRACK)),
    StructField("image_url", StringType()),
    StructField("spotify_url", StringType()),
    StructField("available_markets", ArrayType(StringType())),
])

AUDIO_FEATURE = StructType([
    StructField("id", StringType()),
    StructField("danceability", DoubleType()),
    StructField("energy", DoubleType()),
    StructField("loudness", DoubleType()),
    StructField("tempo", DoubleType()),
])

CATEGORY = StructType([
    StructField("id", StringType()),
    StructField("name", StringType()),
])

RAW_SNAPSHOT = StructType([
    StructField("extraction_timestamp", StringType()),
    StructField("releases", ArrayType(ENRICHED_ALBUM)),
    StructField("audio_features", ArrayType(AUDIO_FEATURE)),
    StructField("categories", ArrayType(CATEGORY)),
])

# Flat output tables (FIXTURES.md §A2).
ALBUMS = StructType([
    StructField("album_id", StringType()),
    StructField("album_name", StringType()),
    StructField("album_type", StringType()),
    StructField("release_date", StringType()),
    StructField("total_tracks", IntegerType()),
    StructField("popularity", IntegerType()),
    StructField("main_artist_id", StringType()),
    StructField("main_artist_name", StringType()),
    StructField("artist_genres", StringType()),
    StructField("image_url", StringType()),
    StructField("spotify_url", StringType()),
    StructField("extraction_date", DateType()),
])

TRACKS = StructType([
    StructField("track_id", StringType()),
    StructField("track_name", StringType()),
    StructField("album_id", StringType()),
    StructField("artists", StringType()),
    StructField("track_number", IntegerType()),
    StructField("duration_ms", LongType()),
    StructField("explicit", BooleanType()),
    StructField("spotify_url", StringType()),
    StructField("extraction_date", DateType()),
])

AUDIO_FEATURES = StructType([
    StructField("track_id", StringType()),
    StructField("danceability", DoubleType()),
    StructField("energy", DoubleType()),
    StructField("loudness", DoubleType()),
    StructField("tempo", DoubleType()),
    StructField("extraction_date", DateType()),
])

CATEGORIES = StructType([
    StructField("category_id", StringType()),
    StructField("category_name", StringType()),
    StructField("extraction_date", DateType()),
])
