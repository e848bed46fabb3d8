"""Merge several bench.py BENCH_DETAIL.json snapshots into ONE
canonical detail file (per-query minima across sessions — the same
estimator bench.py applies across its in-session runs), so the
headline, the detail file, and the round-over-round compare all derive
from identical numbers (r7 verdict item 6: the r7 artifacts disagreed
because the detail held min-of-2 while the compare held min-of-5).

Usage:
    python tools/bench_merge.py OUT.json SESSION1.json SESSION2.json ...
"""

from __future__ import annotations

import json
import sys


def main() -> int:
    if len(sys.argv) < 3:
        print(__doc__)
        return 2
    out_path, sessions = sys.argv[1], sys.argv[2:]
    details = [json.load(open(p)) for p in sessions]
    base = dict(details[0])
    merged: dict[str, float] = {}
    cold: dict[str, float] = {}
    builds: dict[str, float] = {}
    for d in details:
        for k, v in d.get("queries", {}).items():
            merged[k] = min(merged.get(k, v), v)
        for k, v in d.get("cold_queries", {}).items():
            cold[k] = min(cold.get(k, v), v)
        for k, v in d.get("index_build", {}).items():
            builds[k] = min(builds.get(k, v), v)
    base["queries"] = dict(sorted(merged.items()))
    base["cold_queries"] = dict(sorted(cold.items()))
    base["index_build"] = dict(sorted(builds.items()))
    # r9 verdict item 1a: keep each session's in-run load trace summary
    # with the merged file so external contention at measurement time is
    # recorded, not asserted. Raw samples stay in the session files.
    base.pop("env_load", None)
    base.pop("env_load_samples", None)
    base["env_load_sessions"] = [
        {"session": p, "env_load": d.get("env_load")}
        for p, d in zip(sessions, details)]
    base["value"] = round(sum(merged.values()), 3)
    base["cold_total"] = round(sum(cold.values()), 3)
    base["timing"] = (f"per-query min over {len(sessions)} sessions of "
                      "min_of_2_steady_state_runs")
    base["n_sessions"] = len(sessions)
    with open(out_path, "w") as f:
        json.dump(base, f, indent=1, sort_keys=True)
    print(f"merged {len(sessions)} sessions -> {out_path}: "
          f"{base['value']}s over {len(merged)} queries")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
