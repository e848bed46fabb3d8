"""Ingest sources: raw JSON snapshots (S7/S8) and the Spotify-shaped
REST client (S1-S6), network-free by default via the fake client."""
