"""Normalization: nested snapshot -> flat tables, as lazy DataFrame ops.

Parity map (operator ids from SURVEY.md §2.A):
  normalize_albums          P1-P3, P9-P11   (reference transform.py:38-68)
  normalize_tracks          P4-P6, P9, P11  (transform.py:70-97)
  normalize_audio_features  P7-P8, P11      (transform.py:99-124)
  normalize_categories      (real flatten — the reference stubs this to an
                             empty frame at transform.py:177)
  merge_tracks_features     J1, P12-P13     (transform.py:126-168)

Deliberate semantic decisions vs the reference (SURVEY.md §7):
  * Empty-side join guard (reference transform.py:152-154, J3): dropped.
    A left join with an empty right yields left rows + nulls — SQL
    semantics, schema preserved; the reference instead returns a
    schema-less empty frame.
  * Genre/artist list flattening to ", "-joined strings (P3/P5) is kept
    for table parity, but the nested source keeps arrays native; only
    the flat projection collapses them.
  * ``release_date`` keeps its variable-precision STRING (never parsed
    by the reference, transform.py:48); ``release_date_parsed`` adds a
    proper DATE via explicit per-precision handling [EXT].
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame


def _extraction_date(run_date: str | None) -> Column:
    # The reference stamps transform-time today() on every row
    # (transform.py:56,87,113); an explicit run_date makes runs
    # idempotent and replayable instead.
    return (F.to_date(F.lit(run_date)) if run_date is not None
            else F.current_date())


def release_date_parsed(release_date: Column) -> Column:
    """Variable-precision release date ("2025" | "2025-03" | "2025-03-19")
    -> DATE, padding missing parts to the period start. [EXT] — the
    reference never parses it."""
    return F.when(
        F.length(release_date) == 4, F.to_date(F.concat(release_date, F.lit("-01-01")))
    ).when(
        F.length(release_date) == 7, F.to_date(F.concat(release_date, F.lit("-01")))
    ).otherwise(F.to_date(release_date, "yyyy-MM-dd"))


def normalize_albums(releases: DataFrame, run_date: str | None = None) -> DataFrame:
    """12-column album projection with nested-struct access.

    P1: artists[0] main-artist extraction with null guard
        (transform.py:51-52) -> try_element_at: null on empty arrays
        (plain element_at THROWS under ANSI mode).
    P2: main_artist_details.genres with [] default (transform.py:53).
    P3: genres joined ", " (transform.py:66).
    P9: popularity already defaulted at ingest (extract.py:240).
    """
    main = F.try_element_at("artists", F.lit(1))
    genres = F.coalesce(F.col("main_artist_details.genres"),
                        F.array().cast("array<string>"))
    return releases.select(
        "album_id", "album_name", "album_type", "release_date",
        "total_tracks", "popularity",
        main["id"].alias("main_artist_id"),
        main["name"].alias("main_artist_name"),
        F.array_join(genres, ", ").alias("artist_genres"),
        "image_url", "spotify_url",
        _extraction_date(run_date).alias("extraction_date"),
    )


def normalize_tracks(releases: DataFrame, run_date: str | None = None) -> DataFrame:
    """Explode the nested tracks array, carrying the parent album_id
    (P4, transform.py:75-81); per-track artist names joined with
    "Unknown Artist" default (P5/P9, transform.py:77); map access for
    the spotify URL (P6, transform.py:86)."""
    t = F.col("t")
    artist_names = F.array_join(
        F.transform(t["artists"],
                    lambda a: F.coalesce(a["name"], F.lit("Unknown Artist"))),
        ", ")
    return (
        releases.select("album_id", F.explode("tracks").alias("t"))
        .select(
            t["id"].alias("track_id"),
            t["name"].alias("track_name"),
            "album_id",
            artist_names.alias("artists"),
            t["track_number"].alias("track_number"),
            t["duration_ms"].alias("duration_ms"),
            F.coalesce(t["explicit"], F.lit(False)).alias("explicit"),
            t["external_urls"]["spotify"].alias("spotify_url"),
            _extraction_date(run_date).alias("extraction_date"),
        )
    )


def normalize_audio_features(features: DataFrame,
                             run_date: str | None = None) -> DataFrame:
    """Project + rename id->track_id (P7, transform.py:107-114); drop the
    null elements the API returns for unknown tracks (P8,
    transform.py:105-106)."""
    return (
        features.filter(F.col("id").isNotNull())
        .select(
            F.col("id").alias("track_id"),
            "danceability", "energy", "loudness", "tempo",
            _extraction_date(run_date).alias("extraction_date"),
        )
    )


def normalize_categories(categories: DataFrame,
                         run_date: str | None = None) -> DataFrame:
    """Real category flatten — the reference wires categories through
    extraction (extract.py:266-268) but stubs the transform to an empty
    frame (transform.py:177)."""
    return categories.select(
        F.col("id").alias("category_id"),
        F.col("name").alias("category_name"),
        _extraction_date(run_date).alias("extraction_date"),
    )


def merge_tracks_features(tracks: DataFrame, features: DataFrame) -> DataFrame:
    """Left equi-join tracks with audio features on track_id (J1,
    transform.py:156-162). Joining on the key *string* avoids the
    duplicate-column suffix dance (P12) and the post-merge drop of
    extraction_date_audio (P13, transform.py:161-165) entirely."""
    return tracks.join(
        features.drop("extraction_date"), on="track_id", how="left")


def snapshot_tables(snapshot: DataFrame,
                    run_date: str | None = None) -> dict[str, DataFrame]:
    """transform_all (transform.py:170-178): one nested snapshot row ->
    the full flat-table dict, plus the merged tracks_with_features the
    CLI pipeline derives (etl_pipeline.py:125)."""
    releases = snapshot.select(F.explode("releases").alias("r")).select("r.*")
    features = snapshot.select(F.explode("audio_features").alias("f")).select("f.*")
    categories = snapshot.select(F.explode("categories").alias("c")).select("c.*")
    tracks = normalize_tracks(releases, run_date)
    audio = normalize_audio_features(features, run_date)
    return {
        "albums": normalize_albums(releases, run_date),
        "tracks": tracks,
        "audio_features": audio,
        "categories": normalize_categories(categories, run_date),
        "tracks_with_features": merge_tracks_features(tracks, audio),
    }
