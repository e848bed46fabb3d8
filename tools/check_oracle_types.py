"""Registry-wide oracle OUTPUT-type parity gate (r8 verdict item 1b).

Root cause of every driver hash-red row through r8: a DuckDB oracle
whose RESULT schema contained a HUGEINT column (uncast ``SUM(...)
OVER`` / cross-multiplied window sums) while the Spark twin emitted
LongType.  ``tools/check_correctness.py`` compares Python VALUES
(``Decimal(4096) == 4096``), so such rows pass every local gate and
go red only at the driver, whose hash is sensitive to the value's
type/representation.

This gate closes the recurrence channel: it runs a plan-only
``DESCRIBE`` over EVERY registered oracle (no query execution — the
full registry scans in seconds) and fails if any result column has a
type with no exact int64/float64 Spark counterpart:

- ``HUGEINT`` / ``UHUGEINT``: int128 — Spark has no such type; these
  appear whenever a window SUM or a product of window sums is emitted
  uncast.  CAST to BIGINT in the final projection (and note the int64
  headroom bound if the value can grow with SF).
- ``DECIMAL(p,s)`` / ``BIGNUM``: exact decimals — the repo's house
  style materializes DECIMAL intermediates back to BIGINT/DOUBLE
  before the final SELECT; an escaped DECIMAL output means a missing
  CAST (bare decimal literals like ``x * 1.5`` are a common source).

Usage: python tools/check_oracle_types.py [sf_dir]
"""

from __future__ import annotations

import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

BAD_TYPE = re.compile(r"HUGEINT|DECIMAL|BIGNUM", re.IGNORECASE)


def scan_oracle_types(sf_dir: str) -> dict[str, list[tuple[str, str]]]:
    """Return {query_name: [(column, duckdb_type), ...]} offenders.

    Plan-only: DESCRIBE binds and type-checks the query without
    executing it, so the whole registry scans in seconds.
    """
    import __spark_entry__ as entrymod
    from etl_airflow_spotify_spark.oracle import connect_oracle

    con = connect_oracle(sf_dir)
    offenders: dict[str, list[tuple[str, str]]] = {}
    for name, sql in entrymod.oracle_sql().items():
        rows = con.execute(f"DESCRIBE {sql}").fetchall()
        bad = [(r[0], r[1]) for r in rows if BAD_TYPE.search(r[1])]
        if bad:
            offenders[name] = bad
    return offenders


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    offenders = scan_oracle_types(sf_dir)
    import __spark_entry__ as entrymod
    total = len(entrymod.oracle_sql())
    if offenders:
        for name, bad in sorted(offenders.items()):
            cols = ", ".join(f"{c}:{t}" for c, t in bad)
            print(f"FAIL  {name}: {cols}")
        print(f"\n{len(offenders)} of {total} oracles emit "
              "HUGEINT/DECIMAL output columns — CAST them to "
              "BIGINT/DOUBLE in the final projection.")
        return 1
    print(f"OK: all {total} oracle result schemas are free of "
          "HUGEINT/DECIMAL output columns.")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
