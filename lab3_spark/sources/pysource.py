"""Custom Python DataSource (PySpark 4 DataSource API).

The reference's `split` hook hand-parallelizes input generation
(phoenixLab/include/map_reduce.h:120, wordCount.cpp:89-106: chunk the
mmap'd file, one task per chunk).  The modern Spark analog on the
source side is the Python DataSource API: `partitions()` declares the
parallel chunks, `read(partition)` generates that chunk's rows inside
an executor Python worker — a real pluggable source usable via
``spark.read.format("synthetic_docs")``.

This source generates a DETERMINISTIC synthetic corpus: every word of
every document derives from the portable md5 fold (int(md5[:15], 16) —
functions/text.hex_to_long's arithmetic), so the exact same table is
recomputable in SQL — the catalog gate hash-compares a custom Python
source against a DuckDB oracle, the strongest check a source can get.

Scale shape: rows are generated per partition with no driver
involvement and no shared state; partition count is an option, so the
source scales exactly like a parquet scan would.
"""

from __future__ import annotations

import hashlib

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

# 24 fixed words — the vocabulary of the synthetic corpus.
WORDS = [
    "alpha", "bravo", "charlie", "delta", "echo", "foxtrot",
    "golf", "hotel", "india", "juliet", "kilo", "lima",
    "mike", "november", "oscar", "papa", "quebec", "romeo",
    "sierra", "tango", "uniform", "victor", "whiskey", "yankee",
]
MIN_LEN = 5
LEN_SPREAD = 20


def _h(s: str) -> int:
    """The portable 60-bit md5 fold (== hex_to_long(md5(s)[:15]))."""
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def synth_text(doc_id: int) -> str:
    """Deterministic document text: length and every word choice are
    md5-derived — recomputable in any engine with md5."""
    length = MIN_LEN + _h(f"len,{doc_id}") % LEN_SPREAD
    return " ".join(
        WORDS[_h(f"{doc_id},{i}") % len(WORDS)] for i in range(length)
    )


class SyntheticDocsSource(DataSource):
    """``spark.read.format("synthetic_docs").option("n", N)
    .option("parts", P).load()`` → (doc_id, text), N rows split over P
    parallel partitions."""

    @classmethod
    def name(cls) -> str:
        return "synthetic_docs"

    def schema(self) -> str:
        return "doc_id bigint, text string"

    def reader(self, schema) -> DataSourceReader:
        return _SyntheticDocsReader(self.options)


class _SyntheticDocsReader(DataSourceReader):
    def __init__(self, options) -> None:
        self.n = int(options.get("n", 1000))
        self.parts = int(options.get("parts", 8))

    def partitions(self):
        return [InputPartition(p) for p in range(self.parts)]

    def read(self, partition):
        # contiguous id ranges per partition: ids [lo, hi)
        per = (self.n + self.parts - 1) // self.parts
        lo = partition.value * per
        hi = min(lo + per, self.n)
        for d in range(lo, hi):
            yield (d, synth_text(d))


def register(spark) -> None:
    spark.dataSource.register(SyntheticDocsSource)
