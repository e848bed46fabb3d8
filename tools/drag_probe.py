"""r8 verdict item 2: re-measure the r7 localCheckpoint-loop drag
cluster (8 unchanged-body graph/loop queries that were +8-17% in r7's
min-of-5 vs r6) on a quiet box with a fresh session, using bench.py's
exact methodology (1 cold compile run + min of 2 steady-state runs,
tracked persists released between runs)."""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from etl_airflow_spotify_spark.caching import release_all
from etl_airflow_spotify_spark.registry import all_queries
from etl_airflow_spotify_spark.session import get_session

CLUSTER = [
    "clustering_coefficient_profile", "boruvka_msf_rounds", "luby_mis",
    "single_link_dendrogram", "dbscan_rfm_segments",
    "betweenness_kseeds", "scc_pivot_fwbw", "deepwalk_corpus",
]


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_session("bench")
    specs = all_queries()
    specs["pricing_summary"].spark_fn(spark, sf_dir).count()

    def run(name):
        t0 = time.time()
        specs[name].spark_fn(spark, sf_dir).count()
        dt = time.time() - t0
        release_all()
        return dt

    cold, best = {}, {}
    for n in CLUSTER:
        cold[n] = round(run(n), 3)
    for _ in range(2):
        for n in CLUSTER:
            dt = round(run(n), 3)
            best[n] = min(best.get(n, dt), dt)
    print(json.dumps({"cold": cold, "min2": best,
                      "total_min2": round(sum(best.values()), 3)}))
    spark.stop()


if __name__ == "__main__":
    main()
