"""Physical-plan inspection helpers.

Used by tests to pin the plan properties that matter at 100 TB —
predicate pushdown reaching the parquet scan, column pruning in
ReadSchema, broadcast joins for dimensions, partial aggregation —
so a refactor that silently regresses one of them fails CI, not the
cluster bill.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def plan_string(df: DataFrame, mode: str = "formatted") -> str:
    """The explain output as a string (classic-mode private API with a
    stdout-capture fallback)."""
    try:
        jqe = df._jdf.queryExecution()
        jvm = df.sparkSession._jvm
        explain_mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString(mode)
        return jqe.explainString(explain_mode)
    except Exception:
        import contextlib
        import io

        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain(mode)
        return buf.getvalue()


def pushed_filters(df: DataFrame) -> list[str]:
    """Every PushedFilters list in the formatted plan, flattened."""
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", plan_string(df)):
        out.extend(s.strip() for s in m.group(1).split(",") if s.strip())
    return out


def read_schemas(df: DataFrame) -> list[str]:
    return re.findall(r"ReadSchema: (struct<[^\n]*)", plan_string(df))


def has_broadcast_hash_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in plan_string(df)


def num_exchanges(df: DataFrame) -> int:
    # count node-detail headers "(n) Exchange" — the tree section would
    # double-count every node
    return len(re.findall(r"\(\d+\) Exchange\b", plan_string(df)))


def num_nodes(df: DataFrame, node: str) -> int:
    return len(re.findall(rf"\(\d+\) {node}\b", plan_string(df)))


def has_cartesian_product(df: DataFrame) -> bool:
    return "CartesianProduct" in plan_string(df)


def num_broadcast_hints(df: DataFrame) -> int:
    """Count HARD broadcast hints in the analyzed logical plan.

    Physical BroadcastHashJoin presence is size-estimate-dependent (a
    tiny test SF can make Catalyst broadcast without any hint), so
    gate tests that assert "this path must never FORCE a broadcast"
    count ResolvedHint nodes instead — those exist iff the code called
    F.broadcast()/hint("broadcast"), independent of data size.
    """
    try:
        analyzed = df._jdf.queryExecution().analyzed().toString()
    except Exception:
        analyzed = plan_string(df, mode="extended")
    return len(re.findall(r"ResolvedHint .*broadcast", analyzed))


def wholestage_codegen_ids(df: DataFrame) -> list[int]:
    return sorted({int(m) for m in
                   re.findall(r"WholeStageCodegen \((\d+)\)", plan_string(df))})


def scan_paths(df: DataFrame) -> list[tuple[str, ...]]:
    """Root-to-scan node-label paths through the simple-mode plan tree.

    Lets tests assert *where* in the tree an operator sits — e.g. "every
    Window has an aggregate or join between it and the file scan" (the
    property separating a bucketed two-pass plan from a full-table
    window sort). Depth is recovered from the tree-drawing margin
    (every level indents by 3 columns).
    """
    paths: list[tuple[str, ...]] = []
    stack: list[str] = []
    for line in plan_string(df, mode="simple").splitlines():
        m = re.search(r"[+:]- ", line)
        if m:
            depth = m.start() // 3 + 1
            label = line[m.end():].strip()
        elif line.strip() and not line.startswith("=="):
            depth, label = 0, line.strip()
        else:
            continue
        del stack[depth:]
        stack.append(label)
        if label.startswith(("Scan ", "FileScan", "BatchScan")) or \
                "Scan parquet" in label:
            paths.append(tuple(stack))
    return paths
