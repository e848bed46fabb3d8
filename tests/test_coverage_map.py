"""Pin the COVERAGE.md inventory invariants (r6 verdict item 3).

Round 6 shipped two classes (X267/X268) whose queries were registered
and driver-green but silently absent from COVERAGE.md because
``tools/coverage_map.py``'s class dict stopped at X266 — exactly the
truncation the coverage artifact exists to prevent. These tests make
that failure mode impossible to repeat:

* every X-tag carried by a registered query must have an X_TITLES
  entry (and the generator itself now hard-fails on violations);
* every X_TITLES class must be exercised by at least one registered
  query (no phantom inventory rows);
* the committed COVERAGE.md must be regenerated whenever the registry
  changes (header query count matches the live registry).
"""

import os
import re

from etl_airflow_spotify_spark.registry import all_queries

import importlib.util

_SPEC = importlib.util.spec_from_file_location(
    "coverage_map",
    os.path.join(os.path.dirname(__file__), "..", "tools",
                 "coverage_map.py"))
coverage_map = importlib.util.module_from_spec(_SPEC)
_SPEC.loader.exec_module(coverage_map)


def _x_tags() -> set[str]:
    return {t for s in all_queries().values() for t in s.tags
            if t.startswith("X") and t[1:].isdigit()}


def test_every_registered_x_tag_has_a_class_title():
    missing = sorted(_x_tags() - set(coverage_map.X_TITLES))
    assert not missing, (
        f"X-tags carried by registered queries but absent from "
        f"tools/coverage_map.py X_TITLES (COVERAGE.md would silently "
        f"drop them): {missing}")


def test_every_class_title_has_a_registered_query():
    orphan = sorted(set(coverage_map.X_TITLES) - _x_tags())
    assert not orphan, (
        f"X_TITLES classes with no registered query carrying the tag: "
        f"{orphan}")


def test_committed_coverage_md_is_current():
    path = os.path.join(os.path.dirname(__file__), "..", "COVERAGE.md")
    with open(path) as f:
        head = f.read(2000)
    m = re.search(r"\*\*(\d+) queries registered", head)
    assert m, "COVERAGE.md header missing the query count"
    assert int(m.group(1)) == len(all_queries()), (
        "COVERAGE.md is stale — rerun `python tools/coverage_map.py` "
        "after changing the registry")
