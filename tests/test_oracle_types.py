"""Pin the registry-wide oracle OUTPUT-type parity gate (r8 item 1b).

The entire r5-r8 driver hash-red history (X137 original + twin, X283,
X285) shared one root cause: the DuckDB oracle's RESULT schema carried
HUGEINT columns (uncast window SUMs) while Spark emitted LongType —
values matched, the driver's type-sensitive hash did not.  The local
value-compare can never catch this class, so the gate is structural:
plan-only DESCRIBE over every registered oracle, zero
HUGEINT/DECIMAL output columns allowed, forever.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_SMALL", "/root/testdata/sf0.001")


def test_no_oracle_emits_hugeint_or_decimal():
    from tools.check_oracle_types import scan_oracle_types

    offenders = scan_oracle_types(SF_DIR)
    assert offenders == {}, (
        "Oracle result schemas with HUGEINT/DECIMAL columns (driver "
        "hash-red risk — CAST in the final projection): "
        f"{offenders}"
    )


def test_gate_catches_an_uncast_window_sum():
    # The gate must actually detect the defect class it exists for:
    # feed it a synthetic registry entry shaped like the X137 bug.
    import duckdb

    con = duckdb.connect()
    rows = con.execute(
        "DESCRIBE SELECT SUM(x) OVER (ORDER BY x) AS tp "
        "FROM (SELECT 1 AS x)"
    ).fetchall()
    from tools.check_oracle_types import BAD_TYPE

    assert any(BAD_TYPE.search(r[1]) for r in rows), (
        "DuckDB no longer widens window SUM(BIGINT) to HUGEINT — "
        "revisit whether this gate still guards the right types"
    )
