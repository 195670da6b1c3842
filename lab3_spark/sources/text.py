"""Text-corpus source with deterministic line numbers.

The reference's invert app splits its input on ``\\n`` and stamps a
0-based line number on each chunk (phoenixLab/invert/invert.cpp:91-105).
Spark's ``monotonically_increasing_id`` is NOT contiguous, so we use RDD
``zipWithIndex`` per file — deterministic because Spark's text splits
preserve file order within a file.

Scale note (SURVEY.md §7.4): a global contiguous counter over 100 TB
would serialize on a single pass; for multi-file corpora the id is
``(doc_id, line_no)`` with line_no contiguous *per file*, which keeps
the numbering embarrassingly parallel per file.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

LINES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("line_no", T.LongType(), False),
        T.StructField("text", T.StringType(), True),
    ]
)


def read_text_lines(spark: SparkSession, *paths: str) -> DataFrame:
    """Read text file(s) → DataFrame(doc_id, line_no, text).

    line_no is 0-based and contiguous within each file (parity with
    invert.cpp:101-103).  One ``zipWithIndex`` job per file — fine for
    the corpus-fixture scale this source serves; parquet `documents`
    is the scale path.
    """
    dfs = []
    for path in paths:
        doc_id = path.rsplit("/", 1)[-1]
        rdd = (
            spark.sparkContext.textFile(path)
            .zipWithIndex()
            .map(lambda kv, d=doc_id: (d, kv[1], kv[0]))
        )
        dfs.append(spark.createDataFrame(rdd, LINES_SCHEMA))
    out = dfs[0]
    for df in dfs[1:]:
        out = out.unionByName(df)
    return out
