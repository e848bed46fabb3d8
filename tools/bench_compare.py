"""Compare two bench.py JSON outputs and flag per-query regressions.

Usage:
    python bench.py > /tmp/bench_new.json
    python tools/bench_compare.py BENCH_r1.json /tmp/bench_new.json [pct]

Exits non-zero if any query slowed by more than ``pct`` percent
(default 50 — bench noise on a contended machine runs up to ~45%, see
ROUND_NOTES.md) or if total regressed by more than ``pct``/2.
"""

from __future__ import annotations

import json
import sys


def load(path: str) -> dict:
    """Accept bench.py's raw one-line JSON, the driver's BENCH_r{N}.json
    wrapper (bench line under "parsed" — which can be null when the
    driver truncated the line; then we fall back), or a previous
    BENCH_COMPARE_*.txt whose "new" column carries that round's
    steady-state numbers."""
    with open(path) as f:
        text = f.read()
    if path.endswith(".txt"):
        import re
        qs = {m.group(1): float(m.group(3)) for m in re.finditer(
            r"^(\S+)\s+([\d.]+|-)\s+([\d.]+)\s+", text, re.M)}
        return {"queries": qs, "value": sum(qs.values())}
    try:
        obj = json.loads(text)
        if isinstance(obj, dict):
            parsed = obj.get("parsed", obj)
            return parsed if parsed is not None else {
                "queries": {}, "value": obj.get("value")}
        return obj
    except json.JSONDecodeError:
        pass
    for line in text.splitlines():
        line = line.strip()
        if line.startswith("{"):
            try:
                return json.loads(line)
            except json.JSONDecodeError:
                continue
    raise SystemExit(f"no JSON line found in {path}")


def main() -> int:
    if len(sys.argv) < 3:
        print(__doc__)
        return 2
    old, new = load(sys.argv[1]), load(sys.argv[2])
    pct = float(sys.argv[3]) if len(sys.argv) > 3 else 50.0

    oq, nq = old.get("queries", {}), new.get("queries", {})
    failed = False
    print(f"{'query':32s} {'old':>8s} {'new':>8s} {'delta':>8s}")
    for name in sorted(set(oq) | set(nq)):
        if name not in oq:
            print(f"{name:32s} {'-':>8s} {nq[name]:8.3f}    (new)")
            continue
        if name not in nq:
            print(f"{name:32s} {oq[name]:8.3f} {'-':>8s}    (dropped)")
            continue
        d = (nq[name] - oq[name]) / oq[name] * 100 if oq[name] else 0.0
        flag = ""
        if d > pct:
            flag = "  << REGRESSION"
            failed = True
        print(f"{name:32s} {oq[name]:8.3f} {nq[name]:8.3f} {d:+7.1f}%{flag}")

    # Like-for-like total: only queries present in BOTH runs, so adding
    # queries between rounds can't read as a total regression.
    shared = set(oq) & set(nq)
    if shared:
        ot = sum(oq[n] for n in shared)
        nt = sum(nq[n] for n in shared)
        d = (nt - ot) / ot * 100
        flag = ""
        if d > pct / 2:
            flag = "  << TOTAL REGRESSION"
            failed = True
        print(f"{'TOTAL (shared queries)':32s} {ot:8.3f} {nt:8.3f} "
              f"{d:+7.1f}%{flag}")
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
