"""HTTP-backed SpotifyClient with the reference's retry/auth semantics
(O3), network-free by construction: the transport is injected, so unit
tests drive every failure path with a fake and no socket ever opens in
this container. Production drops in a requests/urllib transport.

Reference parity:
  * client-credentials token fetch (extract.py:40-59)
  * 401 -> refresh token + single retry of the failed call
    (extract.py:80-86)
  * limit clamp / batch<=100 shapes live in the endpoint methods,
    matching extract.py:109,130-135

Hardening beyond the reference (it retries nothing but 401):
  * 429: honor Retry-After, then retry (bounded)
  * 5xx / transport errors: bounded exponential backoff
    (base * 2^attempt), like the Airflow task-level retries the
    reference leans on (dags/spotify_etl_dag.py:60-61) but without
    re-running the whole task.
"""

from __future__ import annotations

import logging
from collections.abc import Callable
from typing import Any, Optional, Protocol

logger = logging.getLogger(__name__)

AUTH_URL = "https://accounts.spotify.com/api/token"
BASE_URL = "https://api.spotify.com/v1"


class TransportResponse(Protocol):
    status_code: int
    headers: dict[str, str]

    def json(self) -> Any: ...


class Transport(Protocol):
    """One function stands in for the HTTP library; implement it with
    requests/urllib in production. Raising ``TransportError`` signals a
    network-level failure (timeout, connection reset)."""

    def __call__(self, method: str, url: str, *,
                 headers: dict[str, str] | None = None,
                 params: dict[str, Any] | None = None,
                 data: dict[str, Any] | None = None) -> TransportResponse: ...


class TransportError(Exception):
    """Network-level failure (timeout / connection error)."""


def requests_transport(timeout_s: float = 30.0) -> Transport:
    """The production ``Transport``: a thin wrapper over ``requests``.

    Import-gated so this network-free container (and CI) never needs
    the package; enable by constructing the client with
    ``HttpSpotifyClient(..., transport=requests_transport())`` — or set
    ``SPOTIFY_REAL_TRANSPORT=1`` and use ``default_transport``. Network
    failures are normalized to ``TransportError`` so the client's
    bounded-backoff retry loop sees one exception type.
    """
    import requests  # deferred: not installed in the test container

    def call(method: str, url: str, *,
             headers: dict[str, str] | None = None,
             params: dict[str, Any] | None = None,
             data: dict[str, Any] | None = None) -> TransportResponse:
        try:
            return requests.request(method, url, headers=headers,
                                    params=params, data=data,
                                    timeout=timeout_s)
        except requests.RequestException as e:
            raise TransportError(str(e)) from e

    return call


def default_transport() -> Transport | None:
    """``requests_transport()`` when SPOTIFY_REAL_TRANSPORT=1, else None
    (callers fall back to the fake — the in-container default)."""
    import os

    if os.environ.get("SPOTIFY_REAL_TRANSPORT") == "1":
        return requests_transport()
    return None


class HttpError(Exception):
    def __init__(self, status_code: int, url: str):
        self.status_code = status_code
        self.url = url
        super().__init__(f"HTTP {status_code} for {url}")


class HttpSpotifyClient:
    """Implements the ``SpotifyClient`` protocol over an injected
    transport with token refresh and bounded retries."""

    def __init__(self, client_id: str, client_secret: str,
                 transport: Transport,
                 max_retries: int = 3, backoff_base_s: float = 1.0,
                 sleep: Callable[[float], None] | None = None):
        self.client_id = client_id
        self.client_secret = client_secret
        self.transport = transport
        self.max_retries = max_retries
        self.backoff_base_s = backoff_base_s
        self.token: str | None = None
        import time
        self._sleep = sleep if sleep is not None else time.sleep

    # -- auth + request core -------------------------------------------------

    def _get_token(self) -> None:
        resp = self.transport(
            "POST", AUTH_URL,
            headers={"Content-Type": "application/x-www-form-urlencoded"},
            data={"grant_type": "client_credentials",
                  "client_id": self.client_id,
                  "client_secret": self.client_secret})
        if resp.status_code != 200:
            raise HttpError(resp.status_code, AUTH_URL)
        self.token = resp.json().get("access_token")
        logger.info("Obtained Spotify API token")

    def _make_request(self, endpoint: str,
                      params: dict[str, Any] | None = None) -> dict:
        if not self.token:
            self._get_token()
        url = f"{BASE_URL}/{endpoint}"
        refreshed = False
        attempt = 0
        while True:
            try:
                resp = self.transport(
                    "GET", url,
                    headers={"Authorization": f"Bearer {self.token}"},
                    params=params)
            except TransportError as e:
                if attempt >= self.max_retries:
                    raise
                delay = self.backoff_base_s * (2 ** attempt)
                logger.warning("Transport error for %s (%s); retry in %.1fs",
                               endpoint, e, delay)
                self._sleep(delay)
                attempt += 1
                continue

            if resp.status_code == 401 and not refreshed:
                # expired token: refresh once and replay (extract.py:82-86)
                logger.info("Token expired, refreshing...")
                self._get_token()
                refreshed = True
                continue
            if resp.status_code == 429 and attempt < self.max_retries:
                delay = float(resp.headers.get(
                    "Retry-After", self.backoff_base_s * (2 ** attempt)))
                logger.warning("Rate limited on %s; retry in %.1fs",
                               endpoint, delay)
                self._sleep(delay)
                attempt += 1
                continue
            if 500 <= resp.status_code < 600 and attempt < self.max_retries:
                delay = self.backoff_base_s * (2 ** attempt)
                logger.warning("HTTP %d on %s; retry in %.1fs",
                               resp.status_code, endpoint, delay)
                self._sleep(delay)
                attempt += 1
                continue
            if resp.status_code != 200:
                raise HttpError(resp.status_code, url)
            return resp.json()

    # -- SpotifyClient protocol (shapes mirror FakeSpotifyClient) ------------

    def get_new_releases(self, limit: int = 50,
                         country: str | None = None) -> list[dict]:
        params: dict[str, Any] = {"limit": min(limit, 50)}  # L1 clamp
        if country:
            params["country"] = country
        resp = self._make_request("browse/new-releases", params)
        return resp.get("albums", {}).get("items", [])

    def get_tracks_from_album(self, album_id: str) -> list[dict]:
        resp = self._make_request(f"albums/{album_id}/tracks",
                                  {"limit": 50})
        return resp.get("items", [])

    def get_audio_features(self, track_ids: list[str]) -> list[dict]:
        out: list[Optional[dict]] = []
        for i in range(0, len(track_ids), 100):  # L3: batch, never truncate
            batch = track_ids[i:i + 100]
            resp = self._make_request("audio-features",
                                      {"ids": ",".join(batch)})
            out.extend(resp.get("audio_features", []))
        return out

    def get_categories(self, limit: int = 50) -> list[dict]:
        resp = self._make_request("browse/categories",
                                  {"limit": min(limit, 50)})
        return resp.get("categories", {}).get("items", [])

    def get_artist_info(self, artist_id: str) -> Optional[dict]:
        try:
            return self._make_request(f"artists/{artist_id}")
        except HttpError as e:
            if e.status_code == 404:
                return None  # reference returns None on lookup failure
            raise
