"""Headline benchmark: runs the flagship queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from etl_airflow_spotify_spark.registry import all_queries  # noqa: E402
from etl_airflow_spotify_spark.session import get_session  # noqa: E402

HEADLINE = [
    # relational core
    "pricing_summary",
    "top_revenue_orders",
    "revenue_by_region",
    "top_orders_per_customer",
    "customer_order_history",
    "range_join_price_band",
    "events_json_stats",
    "dedup_first_event",
    "asof_purchase_click",
    "sessionize_events",
    "late_ship_priority",
    "events_trailing_window",
    # LLM-data-pipeline extensions
    "doc_stats",
    "near_dup_minhash",
    "vector_topk_exact",
    "vector_topk_ivf",
    "multimodal_metadata",
    "multimodal_frames",
    # streaming
    "stream_tumbling_counts",
    "stream_stateful_user_stats",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    spark = get_session("bench")
    specs = all_queries()

    # warm the JVM + parquet footers with the cheapest query once
    specs["pricing_summary"].spark_fn(spark, sf_dir).count()

    timings: dict[str, float] = {}
    for name in HEADLINE:
        if name not in specs:
            continue
        t0 = time.time()
        df = specs[name].spark_fn(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        timings[name] = round(time.time() - t0, 3)

    total = round(sum(timings.values()), 3)
    print(json.dumps({
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
