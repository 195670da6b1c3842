"""Custom-aggregator extension point (the analogue of the reference's
associative_combiner CRTP scaffold, phoenixLab/include/combiner.h:109-161:
user supplies Init + F; the runtime handles partials and merge).

In this engine the native path is a Spark built-in aggregate Column
(preferred — JVM, partial-agg capable).  When the fold genuinely needs
Python (numpy/scipy math), a pandas grouped-agg UDF gives an
Arrow-batched UDAF: Spark ships each group's column as one pandas
Series.  NOTE the scale caveat: pandas grouped-agg UDAFs do NOT do
map-side partial aggregation — every row crosses the shuffle.  Keep
them off the hot path; they are the escape hatch, not the default.

UDFs are created lazily (inside the accessor) because ``@pandas_udf``
requires an active SparkSession at definition time.
"""

from __future__ import annotations

from functools import lru_cache

from pyspark.sql import Column


@lru_cache(maxsize=1)
def _geo_mean_udf():
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    def geometric_mean(v):
        arr = v.to_numpy(dtype="float64")
        arr = arr[arr > 0]
        if arr.size == 0:
            return float("nan")
        return float(np.exp(np.log(arr).mean()))

    # pandas_udf infers GROUPED_AGG from Series->scalar annotations;
    # this module uses `from __future__ import annotations` (string
    # hints it can't resolve), so set real annotations at runtime
    geometric_mean.__annotations__ = {"v": pd.Series, "return": float}
    return pandas_udf(geometric_mean, "double")


def geometric_mean_udaf(col) -> Column:
    """exp(mean(ln(x))) over positive values — a non-algebraic
    aggregate Spark lacks natively; numpy does the fold per group."""
    return _geo_mean_udf()(col)
