"""File sinks + latest-pointer publish (reference S8-S12).

The reference writes one CSV/parquet per table with a timestamped name
(load.py:81-121) and maintains ``{name}_latest.csv`` symlinks — always
``.csv`` even for parquet output, a latent bug (load.py:181). Here the
"latest" pointer is a view over the newest timestamped path:
format-agnostic and atomic (view replacement), which is also the
pattern that works on object stores where symlinks don't exist.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

FORMATS = ("csv", "parquet", "json")


def save_tables(tables: dict[str, DataFrame], directory: str, run_ts: str,
                fmt: str = "parquet") -> dict[str, str]:
    """S9/S10: write every table under a timestamped dir. Unknown format
    raises (load.py:112-113). Unlike the reference (load.py:100-102),
    empty tables ARE written — schema-complete empty output beats a
    missing file downstream."""
    if fmt not in FORMATS:
        raise ValueError(f"unsupported format: {fmt!r} (use one of {FORMATS})")
    paths = {}
    for name, df in tables.items():
        path = os.path.join(directory, f"{name}_{run_ts}")
        writer = df.write.mode("errorifexists").format(fmt)
        if fmt == "csv":
            writer = writer.option("header", True)
        writer.save(path)
        paths[name] = path
    return paths


def publish_latest(spark: SparkSession, paths: dict[str, str],
                   fmt: str = "parquet") -> dict[str, str]:
    """S12: expose each newest artifact as ``{name}_latest`` (temp view
    here; ``CREATE OR REPLACE VIEW``/saveAsTable on a metastore deploy).
    Replacement is atomic; readers never see a half-written pointer."""
    views = {}
    for name, path in paths.items():
        reader = spark.read.format(fmt)
        if fmt == "csv":
            reader = reader.option("header", True).option("inferSchema", True)
        view = f"{name}_latest"
        reader.load(path).createOrReplaceTempView(view)
        views[name] = view
    return views
