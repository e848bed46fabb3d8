"""SparkSession construction and per-session tuning.

Two entry paths:
  * ``get_session()`` - build our own tuned local session (tests, bench).
  * ``configure(spark)`` - apply runtime-settable tuning to a session we
    were handed (the driver owns the session for ``__spark_entry__``).

Scale stance: every conf here is also the right default on a real
multi-executor cluster; nothing assumes local mode except the master URL
in ``get_session``.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Runtime-settable SQL confs (safe to apply to an existing session).
RUNTIME_CONFS: dict[str, str] = {
    # Deterministic timestamp semantics vs the DuckDB oracle (UTC-naive).
    "spark.sql.session.timeZone": "UTC",
    # events.parquet stores TIMESTAMP(NANOS) which the vectorized parquet
    # reader rejects; read the physical int64 and convert in catalog.py.
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # AQE: runtime partition coalescing, skew-join splitting, dynamic
    # broadcast selection. Essential at 100 TB, harmless at sf0.001.
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Arrow for any pandas_udf / applyInPandas path (the only Python hot
    # paths we allow) and for toPandas in tests.
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.execution.arrow.maxRecordsPerBatch": "10000",
    # Nested-schema pruning so struct/array projections prune at the scan.
    "spark.sql.optimizer.nestedSchemaPruning.enabled": "true",
}


def default_parallelism() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))


def _ship_package(spark: SparkSession) -> None:
    """Make this package importable on executor Python workers.

    Pandas UDF / mapInPandas closures that reference module-level names
    are cloudpickled BY REFERENCE (module + qualname), so workers must
    be able to import the package — true automatically when the driver
    runs from the repo root, false otherwise. Shipping a zip via
    addPyFile removes the cwd dependence (and is exactly what a
    spark-submit --py-files deploy does on a real cluster)."""
    if getattr(spark, "_etl_pkg_shipped", False):
        return
    import tempfile
    import zipfile

    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    zip_path = os.path.join(tempfile.gettempdir(),
                            "etl_airflow_spotify_spark_pkg.zip")
    with zipfile.ZipFile(zip_path, "w") as zf:
        for root, _dirs, files in os.walk(pkg_dir):
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    rel = os.path.relpath(full, os.path.dirname(pkg_dir))
                    zf.write(full, rel)
    try:
        spark.sparkContext.addPyFile(zip_path)
    except Exception:
        pass  # e.g. Connect sessions; cwd-based import still works there
    spark._etl_pkg_shipped = True


def configure(spark: SparkSession) -> SparkSession:
    """Apply runtime tuning to an externally-owned session (idempotent)."""
    _ship_package(spark)
    confs = dict(RUNTIME_CONFS)
    # Size shuffles to the machine, not Spark's default 200: on local
    # test runs 200 partitions mean 200 state-store instances per
    # streaming stage; on a real cluster the deploy sets this (or AQE
    # coalesces batch shuffles anyway).
    confs["spark.sql.shuffle.partitions"] = str(default_parallelism())
    for k, v in confs.items():
        try:
            spark.conf.set(k, v)
        except Exception:
            # Conf may be static on some builds; never fail a query over tuning.
            pass
    return spark


def _fast_local_dir() -> str | None:
    """Pick the fastest viable scratch dir for shuffle/localCheckpoint
    blocks. localCheckpoint-loop queries are bound by local-dir WRITE
    latency (r8 bisect: the whole r7 +8-17% graph-loop regression was
    /tmp disk I/O — the same eight queries ran 15% FASTER than their
    r6 numbers once local dirs moved to tmpfs). On a real cluster this
    is the standard "point spark.local.dir at local NVMe" deploy
    setting; in this 128 GiB container /dev/shm is that fast device.
    Only chosen when it has generous headroom (local-mode scratch at
    bench SFs is MBs; spills of that size are safe in RAM), and
    overridable via SPARK_GRAFT_LOCAL_DIRS.

    r8 ADVICE hardening: (a) sessions get a NAMED subdirectory
    (Spark already creates and deletes per-app ``spark-<uuid>``/
    ``blockmgr-<uuid>`` dirs inside spark.local.dir at shutdown, so
    the subdir keeps our blocks identifiable and off /dev/shm's
    root); (b) when SPARK_GRAFT_SF_DIR points at a large input
    (> 8 GiB of parquet), scratch can be GB-scale and a RAM-backed
    local dir risks an OOM-kill instead of a slow spill — fall back
    to the default disk path for those runs."""
    override = os.environ.get("SPARK_GRAFT_LOCAL_DIRS")
    if override:
        return override
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR")
    if sf_dir and os.path.isdir(sf_dir):
        try:
            total = sum(e.stat().st_size for e in os.scandir(sf_dir)
                        if e.is_file())
            if total > 8 * 1024 ** 3:
                return None
        except OSError:
            pass
    import shutil
    try:
        if os.path.isdir("/dev/shm") and \
                shutil.disk_usage("/dev/shm").free > 32 * 1024 ** 3:
            sub = "/dev/shm/spark-graft-local"
            os.makedirs(sub, exist_ok=True)
            return sub
    except OSError:
        pass
    return None


def get_session(app_name: str = "etl-airflow-spotify-spark",
                cpus: int | None = None,
                shuffle_partitions: int | None = None) -> SparkSession:
    """Build a tuned local session. On a real cluster the same confs apply;
    only the master URL changes (spark-submit supplies it)."""
    n = cpus or default_parallelism()
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{n}]")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or n))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    fast_dir = _fast_local_dir()
    if fast_dir:
        builder = builder.config("spark.local.dir", fast_dir)
    for k, v in RUNTIME_CONFS.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    return spark
