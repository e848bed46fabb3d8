"""The reference pipeline's dataflow (Spotify new-releases ETL),
re-expressed as Spark-native schemas + transformations.

Reference: Playmaker3334/ETL-Airflow-Spotify (SURVEY.md §2.A). The
reference is eager single-process pandas; here the same semantics are a
lazy DataFrame plan over an explicitly-typed nested snapshot.
"""
