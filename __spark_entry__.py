"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Engine code lives in ``lab3_spark/``; this module only wires queries
to the driver contract.  Column names are aliased identically in the
Spark pipelines and the oracle SQL (the driver sorts columns by name
before hashing).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from lab3_spark import queries_catalog


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: word count over sf0.001 documents (SURVEY §3.1)."""
    return queries_catalog.QUERIES["word_count"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(queries_catalog.QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(queries_catalog.ORACLES)
