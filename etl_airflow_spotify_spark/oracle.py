"""Order-insensitive result comparison against the DuckDB oracle.

Mirrors the driver's correctness gate (row count + columns + value
multiset) so tests and tools/check_correctness.py agree on what "pass"
means before the driver ever runs.
"""

from __future__ import annotations

import math
from typing import Any

import duckdb

from .catalog import TABLES


def connect_oracle(sf_dir: str) -> "duckdb.DuckDBPyConnection":
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def norm_cell(v: Any) -> Any:
    # Driver-grade strictness (r3 verdict item 3): floats compare by
    # exact bits, NOT a 9-dp round — the driver's value hash has no
    # tolerance, and the old round let a 4-dp boundary flip
    # (cooccurrence_pmi, r3) pass locally while failing the driver.
    # Only -0.0 is normalized to +0.0 (x + 0.0 under round-to-nearest).
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v + 0.0
    if isinstance(v, (list, tuple)):
        return tuple(norm_cell(x) for x in v)
    return str(v) if not isinstance(v, (int, bool)) else v


def multiset(rows: list[tuple], colnames: list[str]) -> dict[tuple, int]:
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    out: dict[tuple, int] = {}
    for row in rows:
        key = tuple(norm_cell(row[i]) for i in order)
        out[key] = out.get(key, 0) + 1
    return out


def compare(spark_rows: list[tuple], spark_cols: list[str],
            oracle_rows: list[tuple], oracle_cols: list[str]) -> list[str]:
    """Return a list of mismatch descriptions (empty == pass)."""
    problems: list[str] = []
    if len(spark_rows) != len(oracle_rows):
        problems.append(
            f"rowcount spark={len(spark_rows)} oracle={len(oracle_rows)}")
    if sorted(c.lower() for c in spark_cols) != sorted(c.lower() for c in oracle_cols):
        problems.append(
            f"columns spark={sorted(spark_cols)} oracle={sorted(oracle_cols)}")
    if not problems:
        ms = multiset(spark_rows, spark_cols)
        mo = multiset(oracle_rows, oracle_cols)
        if ms != mo:
            diff = set(ms) ^ set(mo)
            problems.append(
                f"values differ; {len(diff)} distinct mismatched rows, "
                f"sample={sorted(diff, key=repr)[:3]}")
    return problems
