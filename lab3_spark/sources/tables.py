"""Parquet table catalog for the driver-generated testdata star schema.

Tables (TESTDATA.md): region nation customer supplier part orders
lineitem events documents embeddings — one parquet file each under a
scale-factor directory.

Reading parquet via ``spark.read.parquet`` gets us columnar vectorized
scans, predicate pushdown, and column pruning for free (SURVEY.md §4) —
the Spark-native answer to the reference's whole-file pread
(wordCount.cpp:116-133).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES: tuple[str, ...] = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


_NANOS_CONF = "spark.sql.legacy.parquet.nanosAsLong"
_TZ_CONF = "spark.sql.session.timeZone"


def ensure_nanos_as_long(spark: SparkSession) -> None:
    """Set the runtime SQL conf that lets Spark read TIMESTAMP(NANOS)
    parquet columns as bigint.

    It's a *runtime* conf (not builder-only), so it works on ANY
    SparkSession — including ones constructed outside our session
    factory.  Without it, ``spark.read.parquet`` on events.parquet
    throws ``PARQUET_TYPE_ILLEGAL: INT64 (TIMESTAMP(NANOS,false))``.
    Only nano-timestamp columns are affected; all other tables read
    identically with or without it."""
    spark.conf.set(_NANOS_CONF, "true")


def ensure_session_defaults(spark: SparkSession) -> None:
    """Runtime confs every catalog query depends on, applied to ANY
    session (round-1 lesson: the correctness gate runs on a session we
    didn't build).

    - UTC session timezone: `date_format` renders timestamps in the
      session TZ; the DuckDB oracle's timestamps are TZ-less.  A
      non-UTC session would shift every formatted timestamp string.
    - nanosAsLong: see :func:`ensure_nanos_as_long`."""
    spark.conf.set(_TZ_CONF, "UTC")
    ensure_nanos_as_long(spark)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one table, normalizing nano-timestamps.

    events.parquet stores ts as TIMESTAMP(NANOS); with
    ``spark.sql.legacy.parquet.nanosAsLong`` Spark reads it as a long,
    which we truncate to micros (integer division — the same truncation
    DuckDB applies casting TIMESTAMP_NS → TIMESTAMP).

    Self-sufficient on any session: sets the conf itself (runtime SQL
    conf), with a catch-and-retry fallback should some other table ever
    carry a nano column."""
    path = os.path.join(sf_dir, f"{name}.parquet")
    ensure_session_defaults(spark)
    try:
        df = spark.read.parquet(path)
    except Exception as exc:  # pragma: no cover - defensive retry
        if "PARQUET_TYPE_ILLEGAL" not in str(exc):
            raise
        ensure_nanos_as_long(spark)
        df = spark.read.parquet(path)
    if name == "events":
        df = normalize_event_time(df)
    return df


def normalize_event_time(df: DataFrame, col: str = "ts") -> DataFrame:
    """Normalize an event-time column to TIMESTAMP regardless of how the
    parquet file encoded it — the testdata generator has shipped both:

    - TIMESTAMP(NANOS): read as bigint under nanosAsLong; truncate to
      micros with integer `div` (nano epochs ~1.7e18 exceed double's
      exact-integer range, float division would lose microseconds).
    - TIMESTAMP(MICROS, isAdjustedToUTC=false): read as TIMESTAMP_NTZ in
      Spark 4, which `unix_micros` and watermarks reject.  With the
      session TZ pinned to UTC the cast reinterprets the naive instant
      as UTC — zero shift — so the whole catalog (windows, date_format,
      unix_micros) sees one TIMESTAMP type either way.

    Works on batch and streaming frames alike (pure column expressions)."""
    t = dict(df.dtypes).get(col)
    if t == "bigint":
        df = df.withColumn(col, F.timestamp_micros(F.expr(f"{col} div 1000")))
    elif t == "timestamp_ntz":
        df = df.withColumn(col, F.col(col).cast("timestamp"))
    return df


def load_tables(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES
) -> dict[str, DataFrame]:
    """Load the star-schema parquet tables from `sf_dir`."""
    return {name: load_table(spark, sf_dir, name) for name in names}


def register_tables(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES
) -> dict[str, DataFrame]:
    """Load and register the tables as temp views (for ``spark.sql``)."""
    dfs = load_tables(spark, sf_dir, names)
    for name, df in dfs.items():
        df.createOrReplaceTempView(name)
    return dfs
