"""A/B probe: time an explicit list of queries with bench.py's exact
protocol (1 cold + min of 2 steady runs, noop sink, tracked persists
released between runs) in one dedicated session, with the r10 in-run
load trace attached. Diagnostic only — never feeds the canonical
BENCH_DETAIL.json.

Usage:
    python tools/ab_probe.py query [query ...]
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import bench  # noqa: E402
from etl_airflow_spotify_spark.registry import all_queries  # noqa: E402
from etl_airflow_spotify_spark.session import get_session  # noqa: E402


def main() -> int:
    names = sys.argv[1:]
    if not names:
        print(__doc__)
        return 2
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_session("ab-probe")
    specs = all_queries()
    specs["pricing_summary"].spark_fn(spark, sf_dir).count()  # warm JVM
    trace = bench._LoadTrace()
    trace.start()
    for name, (build, _) in bench.BUILD_PROBE.items():
        if name in names:
            build(spark, sf_dir)
    cold: dict[str, float] = {}
    timings: dict[str, float] = {}
    t0 = time.time()
    for name in names:
        cold[name] = round(bench._run(specs, name, spark, sf_dir), 3)
    for _ in range(2):
        for name in names:
            dt = round(bench._run(specs, name, spark, sf_dir), 3)
            timings[name] = min(timings.get(name, dt), dt)
    print(json.dumps({
        "queries": timings, "cold": cold,
        "value": round(sum(timings.values()), 3),
        "wall": round(time.time() - t0, 1),
        "env_load": trace.stop(), "sf_dir": sf_dir}))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
