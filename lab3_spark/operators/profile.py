"""Single-scan column profiler — the data-quality primer every ingest
pipeline runs before training jobs touch a new source.

One aggregate row computes every metric for every column in ONE pass
over the data (count/null-count/distinct/min/max are all partial-agg
friendly — map-side combine, tiny shuffle), then the row is unpivoted
to one output row per column.  The alternative — one query per column
— scans the table N_cols times.

min/max are emitted as CANONICAL STRINGS (printf-style per type) so
profiles of heterogeneous columns share one schema AND the DuckDB
oracle can reproduce them byte-for-byte: %.4f for floating point (C
formatting matches across engines), ISO seconds for timestamps, plain
cast for integers/strings.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _canon(col: Column, dtype: str) -> Column:
    if dtype in ("double", "float"):
        return F.format_string("%.4f", col.cast("double"))
    if dtype.startswith("timestamp"):
        return F.date_format(col, "yyyy-MM-dd HH:mm:ss")
    if dtype.startswith("date"):
        return F.date_format(col, "yyyy-MM-dd")
    return col.cast("string")


def profile_table(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """(column, n_rows, n_nulls, n_distinct, min_repr, max_repr) — one
    row per profiled column, computed in a single scan.

    n_distinct is exact (count(DISTINCT)); nulls excluded from it and
    from min/max, per SQL semantics.  Binary and complex types are
    profiled for counts only (no ordering defined): min/max NULL."""
    dtypes = dict(df.dtypes)
    if cols is None:
        cols = [c for c in df.columns]
    aggs: list[Column] = [F.count(F.lit(1)).alias("_n_rows")]
    orderable = {}
    for c in cols:
        dt = dtypes[c]
        orderable[c] = not (
            dt == "binary" or dt.startswith(("array", "map", "struct"))
        )
        aggs.append(F.count(c).alias(f"_nn_{c}"))
        aggs.append(F.count_distinct(F.col(c)).alias(f"_nd_{c}"))
        if orderable[c]:
            aggs.append(_canon(F.min(c), dt).alias(f"_min_{c}"))
            aggs.append(_canon(F.max(c), dt).alias(f"_max_{c}"))
    one = df.agg(*aggs)
    rows = F.array(
        *[
            F.struct(
                F.lit(c).alias("column"),
                F.col("_n_rows").alias("n_rows"),
                (F.col("_n_rows") - F.col(f"_nn_{c}")).alias("n_nulls"),
                F.col(f"_nd_{c}").alias("n_distinct"),
                (F.col(f"_min_{c}") if orderable[c] else F.lit(None).cast("string")).alias("min_repr"),
                (F.col(f"_max_{c}") if orderable[c] else F.lit(None).cast("string")).alias("max_repr"),
            )
            for c in cols
        ]
    )
    return (
        one.select(F.explode(rows).alias("p"))
        .select("p.*")
        .orderBy("column")
    )
