"""Spotify-shaped REST ingest (reference S1-S6), network-free by design.

The reference couples extraction to live HTTP (extract.py). Here the
client is a Protocol; production would implement it with an HTTP
library + OAuth (O3 retry semantics), while tests and this container use
``FakeSpotifyClient`` — a deterministic generator that reproduces every
edge case the reference handles (null audio features, missing artists,
null artist detail, variable-precision release dates).

Scale notes (vs the reference's driver-side loops):
  * S3 batched multi-get: the reference TRUNCATES >100 track ids in one
    call path (extract.py:131-133); ``extract_full_dataset`` here batches
    exhaustively (L3) and never drops ids.
  * S5 point lookups: the reference fetches the artist per album,
    re-fetching repeated artists (extract.py:224-227); here lookups are
    memoized per distinct artist id.
  * For fan-out at scale, ``fetch_audio_features_distributed`` ships id
    batches to executors via mapInPandas — the pattern for millions of
    keys where driver-side fetching would bottleneck.
"""

from __future__ import annotations

import datetime as dt
import random
from collections.abc import Iterator
from typing import Any, Optional, Protocol

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from ..spotify.schemas import AUDIO_FEATURE


class SpotifyClient(Protocol):
    """Read surface the extractor needs (one method per reference op)."""

    def get_new_releases(self, limit: int = 50,
                         country: str | None = None) -> list[dict]: ...  # S1
    def get_tracks_from_album(self, album_id: str) -> list[dict]: ...   # S2
    def get_audio_features(self, track_ids: list[str]) -> list[dict]: ...  # S3
    def get_categories(self, limit: int = 50) -> list[dict]: ...        # S4
    def get_artist_info(self, artist_id: str) -> Optional[dict]: ...    # S5


class FakeSpotifyClient:
    """Deterministic synthetic Spotify API (seeded). Shapes match the
    reference's response handling; edge-case rows are planted at fixed
    indices so golden tests can target them."""

    def __init__(self, seed: int = 42, n_albums: int = 12,
                 tracks_per_album: int = 4):
        self.seed = seed
        self.n_albums = n_albums
        self.tracks_per_album = tracks_per_album

    def _rng(self, *key: Any) -> random.Random:
        return random.Random(":".join(map(str, (self.seed,) + key)))

    def get_new_releases(self, limit: int = 50,
                         country: str | None = None) -> list[dict]:
        # reference clamps limit to 50 (extract.py:109, L1)
        n = min(min(limit, 50), self.n_albums)
        out = []
        for i in range(n):
            rng = self._rng("album", i)
            precision = ("%Y", "%Y-%m", "%Y-%m-%d")[i % 3]  # variable dates
            date = dt.date(2020 + i % 6, 1 + i % 12, 1 + i % 28)
            album = {
                "id": f"alb{i:03d}",
                "name": f"Album {i}",
                "album_type": ["album", "single", "compilation"][i % 3],
                "release_date": date.strftime(precision),
                "total_tracks": self.tracks_per_album,
                # popularity key absent for some albums -> default 0
                # (extract.py:240, P9)
                **({"popularity": rng.randint(1, 100)} if i % 4 else {}),
                "artists": ([] if i == 1 else  # album with no artists (P1 guard)
                            [{"id": f"art{i % 5:03d}", "name": f"Artist {i % 5}"}]),
                "images": ([] if i == 2 else  # empty images (P10)
                           [{"url": f"https://img.example/{i}"}]),
                "external_urls": {"spotify": f"https://open.example/alb{i:03d}"},
                "available_markets": ["US", "MX", "DE"][: 1 + i % 3],
            }
            out.append(album)
        return out

    def get_tracks_from_album(self, album_id: str) -> list[dict]:
        i = int(album_id[3:])
        out = []
        for t in range(self.tracks_per_album):
            rng = self._rng("track", i, t)
            out.append({
                "id": f"trk{i:03d}_{t}",
                "name": f"Track {i}.{t}",
                "track_number": t + 1,
                "duration_ms": rng.randint(90_000, 420_000),
                "explicit": rng.random() < 0.2,
                # one track per album 0 has an artist missing its name
                # -> "Unknown Artist" (transform.py:77, P5/P9)
                "artists": ([{"id": "artX", "name": None}] if (i, t) == (0, 1)
                            else [{"id": f"art{i % 5:03d}",
                                   "name": f"Artist {i % 5}"}]),
                "external_urls": {"spotify": f"https://open.example/trk{i:03d}_{t}"},
            })
        return out

    def get_audio_features(self, track_ids: list[str]) -> list[dict]:
        # reference batches <=100 per call (extract.py:130-135)
        out: list[Optional[dict]] = []
        for tid in track_ids[:100]:
            if tid.endswith("_3"):
                out.append(None)  # unknown track -> null element (P8)
                continue
            rng = self._rng("feat", tid)
            out.append({
                "id": tid,
                "danceability": round(rng.random(), 3),
                "energy": round(rng.random(), 3),
                "loudness": round(-60 * rng.random(), 3),
                "tempo": round(60 + 140 * rng.random(), 3),
            })
        return out

    def get_categories(self, limit: int = 50) -> list[dict]:
        return [{"id": f"cat{i}", "name": f"Category {i}"}
                for i in range(min(limit, 6))]

    def get_artist_info(self, artist_id: str) -> Optional[dict]:
        if artist_id == "art003":
            return None  # lookup failure -> null detail (extract.py:224-227)
        rng = self._rng("artist", artist_id)
        return {
            "id": artist_id,
            "name": f"Artist {int(artist_id[3:])}",
            "genres": rng.sample(
                ["rock", "pop", "jazz", "electronic", "folk"], k=2),
            "popularity": rng.randint(1, 100),
            "followers": {"total": rng.randint(1_000, 5_000_000)},
        }


def extract_full_dataset(client: SpotifyClient, limit: int = 50,
                         country: str | None = None,
                         run_ts: str | None = None,
                         batch_size: int = 100) -> dict:
    """S6 composite ingest (extract.py:194-276): releases -> per-album
    tracks -> memoized artist details -> batched audio features ->
    categories, denormalized into enriched-album objects.

    Unlike the reference: ``limit``/``country`` are actually honored
    (the reference reads them from config but hardcodes limit=50,
    extract.py:203), artist lookups are memoized, and feature batching
    never truncates."""
    releases = client.get_new_releases(limit=limit, country=country)
    artist_cache: dict[str, Optional[dict]] = {}
    enriched, all_track_ids = [], []
    for album in releases:
        tracks = client.get_tracks_from_album(album["id"])  # S2
        all_track_ids.extend(t["id"] for t in tracks if t.get("id"))
        artists = album.get("artists") or []
        main = None
        if artists:
            aid = artists[0]["id"]
            if aid not in artist_cache:  # memoized S5
                artist_cache[aid] = client.get_artist_info(aid)
            main = artist_cache[aid]
        images = album.get("images") or []
        enriched.append({  # projection mirrors extract.py:234-249
            "album_id": album["id"],
            "album_name": album["name"],
            "album_type": album.get("album_type"),
            "release_date": album.get("release_date"),
            "total_tracks": album.get("total_tracks"),
            "popularity": album.get("popularity", 0),
            "artists": [{"id": a.get("id"), "name": a.get("name")}
                        for a in artists],
            "main_artist_details": main,
            "tracks": tracks,
            "image_url": images[0]["url"] if images else None,
            "spotify_url": (album.get("external_urls") or {}).get("spotify"),
            "available_markets": album.get("available_markets", []),
        })
    features = []
    for i in range(0, len(all_track_ids), batch_size):  # L3, no truncation
        features.extend(client.get_audio_features(
            all_track_ids[i:i + batch_size]))
    return {
        "extraction_timestamp": run_ts or dt.datetime.now(
            dt.timezone.utc).isoformat(),
        "releases": enriched,
        "audio_features": features,
        "categories": client.get_categories(),
    }


def fetch_audio_features_distributed(spark: SparkSession, track_ids: DataFrame,
                                     client_factory, batch_size: int = 100
                                     ) -> DataFrame:
    """Scale path for S3: ship id batches to executors. ``track_ids`` is
    a 1-column DataFrame of ids; ``client_factory()`` builds a client on
    the executor (credentials from env, no driver round-trip). Each
    partition issues ceil(n/batch_size) requests — rate limits are per
    executor, so cap parallelism via input partitioning."""
    def fetch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        client = client_factory()
        for pdf in batches:
            ids = pdf.iloc[:, 0].dropna().tolist()
            rows = []
            for i in range(0, len(ids), batch_size):
                rows.extend(f for f in client.get_audio_features(
                    ids[i:i + batch_size]) if f)
            yield pd.DataFrame(
                rows, columns=[f.name for f in AUDIO_FEATURE.fields])

    return track_ids.mapInPandas(fetch, schema=AUDIO_FEATURE)
