"""Query registry powering __spark_entry__.

Each named query is a pair: a Spark callable ``(spark, sf_dir) -> DataFrame``
and (when SQL-expressible) a DuckDB oracle SQL string computing the same
result over the same parquet tables. The driver compares the two at sf0.01
(row count + schema + order-insensitive value hash), so:

  * every computed column is aliased IDENTICALLY on both sides;
  * double-typed aggregates are rounded (ROUND_DIGITS) on both sides so
    summation-order nondeterminism can't flip the hash;
  * DuckDB integer SUMs are cast to BIGINT to match Spark's long.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

ROUND_DIGITS = 4

SparkQuery = Callable[[SparkSession, str], DataFrame]


@dataclass
class QuerySpec:
    name: str
    spark_fn: SparkQuery
    oracle: str | None  # DuckDB SQL twin; None -> rows-only check
    doc: str = ""
    tags: tuple[str, ...] = field(default_factory=tuple)


_REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None, doc: str = "",
             tags: tuple[str, ...] = ()) -> Callable[[SparkQuery], SparkQuery]:
    """Decorator: add a query to the registry under ``name``."""

    def deco(fn: SparkQuery) -> SparkQuery:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        _REGISTRY[name] = QuerySpec(name=name, spark_fn=fn, oracle=oracle,
                                    doc=doc or (fn.__doc__ or ""), tags=tags)
        return fn

    return deco


def all_queries() -> dict[str, QuerySpec]:
    # Import query modules for their registration side effects.
    from . import queries  # noqa: F401

    return dict(_REGISTRY)
