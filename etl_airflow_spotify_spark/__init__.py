"""PySpark-native analytics engine with the capabilities of the
Playmaker3334/ETL-Airflow-Spotify reference pipeline, rebuilt Spark-first.

Layout:
    session     - SparkSession construction/tuning for local + cluster
    catalog     - typed loaders for the driver's synthetic test tables
    registry    - query registry powering __spark_entry__ (queries + oracles)
    queries/    - named queries over the test tables (driver correctness gate)
    operators/  - reusable DataFrame operator library (asof join, top-k,
                  dedup, similarity, text analysis, multimodal plumbing)
    sources/    - ingest: REST client (Spotify-shaped), raw JSON snapshots
    sinks/      - csv/parquet/json writers + latest-pointer publish
    spotify/    - the reference's dataflow re-expressed in Spark
    streaming/  - Structured Streaming operators (windows, watermark, dedup)
"""

__version__ = "0.1.0"
