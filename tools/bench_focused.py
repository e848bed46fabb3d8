"""Focused bench session: re-time only the N slowest queries from a
merged detail file, in a dedicated session.

r8 verdict item 4: the r8 compare mixed five full sessions with one
focused top-24 session, which gave the focused queries a solo-run
context the other side of the compare never had. The adopted fix is
METHODOLOGICAL SYMMETRY — run one focused session every round, merge
it the same way, and record in the compare header which queries'
minima came from it. This tool makes the focused session a fixed,
repeatable step instead of an ad-hoc script.

Usage:
    python tools/bench_focused.py MERGED.json OUT.json [N]

Reads the N (default 24) slowest queries from MERGED.json's
"queries" map, then runs bench.py's exact timing protocol (1 cold +
2 steady runs, per-query min) over just those queries and writes a
session detail file shaped like bench.py's for tools/bench_merge.py.
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
    if len(sys.argv) < 3:
        print(__doc__)
        return 2
    merged_path, out_path = sys.argv[1], sys.argv[2]
    top_n = int(sys.argv[3]) if len(sys.argv) > 3 else 24
    merged = json.load(open(merged_path))
    names = sorted(merged["queries"], key=merged["queries"].get,
                   reverse=True)[:top_n]

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    spark = get_session("bench-focused")
    specs = all_queries()
    specs["pricing_summary"].spark_fn(spark, sf_dir).count()  # warm JVM

    builds: dict[str, float] = {}
    for name, (build, _) in bench.BUILD_PROBE.items():
        if name not in names:
            continue
        t0 = time.time()
        build(spark, sf_dir)
        builds[name] = round(time.time() - t0, 3)

    cold: dict[str, float] = {}
    timings: dict[str, float] = {}
    for name in names:
        cold[name] = round(bench._run(specs, name, spark, sf_dir), 3)
    for _ in range(2):
        for name in names:
            dt = round(bench._run(specs, name, spark, sf_dir), 3)
            timings[name] = min(timings.get(name, dt), dt)

    detail = {
        "metric": "focused_topN_session",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "cold_total": round(sum(cold.values()), 3),
        "cold_queries": cold,
        "index_build": builds,
        "runs_per_query": 3,
        "timing": "min_of_2_steady_state_runs (focused session)",
        "top_n": top_n,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }
    with open(out_path, "w") as f:
        json.dump(detail, f, indent=1, sort_keys=True)
    print(f"focused session over {len(names)} queries -> {out_path}: "
          f"{detail['value']}s")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
