"""Batch grouped-map operators (applyInPandas).

The one Pandas-API shape the engine hadn't exercised in batch:
``groupBy(key).applyInPandas(fn, schema)`` — each group arrives as ONE
pandas DataFrame in an executor Python worker (Arrow transfer), the
canonical Spark shape for per-group numpy/sklearn-style logic that
built-in aggregates can't express.

Scale contract: a group must fit in one worker's memory — the operator
is only correct at 100 TB when the grouping key is bounded (here:
`label`, an IVF-centroid-sized partition). For unbounded groups use
window functions or re-aggregate; that trade is the documented
difference from the windowed form.

The demo operator is per-label min-max normalization of embeddings —
min/max are EXACT (order-independent), so unlike mean/std the result
is reproducible cross-engine and the DuckDB oracle can recompute it
element-for-element.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def minmax_normalize_embeddings(embeddings: DataFrame) -> DataFrame:
    """(vec_id, label, normalized array<double>): each dimension
    rescaled to [0, 1] within its label group — floor-truncated at 4
    decimals (the cross-engine float contract).  Constant dimensions
    (max == min) normalize to 0.0."""
    import numpy as np
    import pandas as pd

    def normalize(pdf: pd.DataFrame) -> pd.DataFrame:
        mat = np.array([np.asarray(e, dtype=np.float64) for e in pdf["embedding"]])
        lo = mat.min(axis=0)
        hi = mat.max(axis=0)
        span = hi - lo
        span[span == 0.0] = 1.0  # constant dims -> 0.0 after shift
        norm = (mat - lo) / span
        norm = np.floor(norm * 10_000.0) / 10_000.0
        return pd.DataFrame(
            {
                "vec_id": pdf["vec_id"],
                "label": pdf["label"],
                "normalized": list(norm),
            }
        )

    return (
        embeddings.select("vec_id", "label", "embedding")
        .groupBy("label")
        .applyInPandas(
            normalize, "vec_id bigint, label bigint, normalized array<double>"
        )
    )
