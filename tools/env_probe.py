"""Round-9 (optimization) environment probe.

The r9-campaign bench carried a +12.6% environmental drag vs the r8
canonical (per-job overhead up; scan-bound flat; ams_f2_partkey SOLO
0.48 -> 6.72s). Before touching any query body this round, re-measure a
small signature set with bench.py's exact protocol (1 cold + min of 2
steady runs) on the current box and compare against the r8/r9 canonical
minima inline, so OPTIMIZATION_r09.md starts from facts about THIS
environment.

Usage: python tools/env_probe.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from etl_airflow_spotify_spark.caching import release_all  # noqa: E402
from etl_airflow_spotify_spark.registry import all_queries  # noqa: E402
from etl_airflow_spotify_spark.session import get_session  # noqa: E402

# name -> (r8 canonical min, r9 canonical min)
SIGNATURE = {
    "pricing_summary": (0.61, 0.65),        # scan-bound: flat in r9
    "events_json_stats": (1.25, 1.25),      # scan-bound: flat in r9
    "ams_f2_partkey": (0.48, 6.72),         # solo-reproduced drag row
    "dup_ngram_coverage": (0.26, 7.41),     # focused-solo r8 vs full r9
    "ucb_bandit_replay": (2.70, 3.52),      # job-count-heavy
    "bpe_merge_table": (3.74, 4.81),        # driver-loop heavy
    "scc_pivot_fwbw": (7.96, 9.19),         # localCheckpoint loop
    "greedy_graph_coloring": (3.88, 4.44),  # localCheckpoint loop
}


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else \
        os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_session("env-probe")
    specs = all_queries()
    specs["pricing_summary"].spark_fn(spark, sf_dir).count()

    def run(name: str) -> float:
        t0 = time.time()
        specs[name].spark_fn(spark, sf_dir) \
            .write.format("noop").mode("overwrite").save()
        dt = time.time() - t0
        release_all()
        return dt

    cold, best = {}, {}
    for n in SIGNATURE:
        cold[n] = round(run(n), 3)
    for _ in range(2):
        for n in SIGNATURE:
            dt = round(run(n), 3)
            best[n] = min(best.get(n, dt), dt)
    rows = []
    for n, (r8, r9) in SIGNATURE.items():
        rows.append({"query": n, "r8": r8, "r9": r9, "now": best[n],
                     "vs_r8": round(best[n] / r8, 2),
                     "vs_r9": round(best[n] / r9, 2)})
    print(json.dumps({"sf_dir": sf_dir, "cold": cold, "rows": rows},
                     indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
