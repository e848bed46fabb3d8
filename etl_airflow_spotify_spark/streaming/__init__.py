"""Structured Streaming operators (SURVEY.md §2.B X20-X23)."""
