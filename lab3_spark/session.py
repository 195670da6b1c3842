"""SparkSession factory.

The reference sizes parallelism from ``MR_NUMTHREADS`` else all online
CPUs (phoenixLab/include/map_reduce.h:147-148); we mirror that with
``SPARK_GRAFT_CPUS`` else ``local[*]``.

Config choices (SURVEY.md §4):
- AQE on (runtime re-plan, skew-join handling, partition coalescing) —
  subsumes the reference's dynamic task sizing (map_reduce.h:223-224).
- shuffle.partitions sized to cores for local mode; at cluster scale this
  should be ~2-3x total cores or left to AQE coalescing.
- UTC session timezone so timestamp semantics match the DuckDB oracle.
- Arrow enabled for the few Pandas-UDF extension operators.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "lab3_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the engine's SparkSession.

    Parallelism mirrors the reference's MR_NUMTHREADS (map_reduce.h:147):
    ``SPARK_GRAFT_CPUS`` env var wins, else ``local[*]``.
    """
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS")
        master = f"local[{cpus}]" if cpus else "local[*]"
    if shuffle_partitions is None:
        cpus_s = os.environ.get("SPARK_GRAFT_CPUS")
        shuffle_partitions = int(cpus_s) if cpus_s else (os.cpu_count() or 8)

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # testdata events.parquet stores TIMESTAMP(NANOS); Spark has no
        # nanos timestamp type — read as long, convert in the loader
        # (sources/tables.py) by truncating to micros like DuckDB does.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.ui.enabled", "false")
    )
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    return builder.getOrCreate()
