"""Skew stress bench: hot-key JOIN under three strategies, plus the
aggregation control experiment.

Synthetic Zipf-ish fact (1/3 of rows on one key 'hot', rest uniform
over 200k keys) joined to a 200k-row dim with broadcast DISABLED (at
real scale the dim wouldn't fit) — isolating shuffle-join skew:

  smj_aqe_off   sort-merge join, AQE fully off: the pathology — every
                'hot' row lands in ONE task.
  smj_aqe_skew  AQE + skew-join handling: runtime partition splitting.
  salted_join   explicit (key, salt) join, dim replicated n_salts×.

Aggregation control: plain groupBy-sum vs map_reduce_salted on the same
fact — expected ~parity, because map-side partial aggregation already
collapses the hot key before the shuffle.  (That result is the reason
salting budget should go to joins, not aggs.)

Each timing is min-of-N passes (this host has heavy CPU steal).
Prints one JSON line; paste the numbers into docs/SCALE.md.

Usage: python tools/bench_skew.py [n_rows] [passes] [hot_share]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from lab3_spark.operators.mapreduce import map_reduce, map_reduce_salted
from lab3_spark.operators.skew import salted_join, zipf_keys
from lab3_spark.session import get_spark

N_ROWS = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000_000
PASSES = int(sys.argv[2]) if len(sys.argv) > 2 else 2
HOT_SHARE = float(sys.argv[3]) if len(sys.argv) > 3 else 1 / 3
N_COLD = 200_000
N_SALTS = 32


def timed(fn):
    best = float("inf")
    result = None
    for _ in range(PASSES):
        t0 = time.time()
        result = fn()
        best = min(best, time.time() - t0)
    return best, result


def main() -> None:
    spark = get_spark("bench_skew")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

    fact = zipf_keys(spark, N_ROWS, hot_share=HOT_SHARE, n_cold=N_COLD)
    dim = spark.range(N_COLD).select(
        F.concat(F.lit("k"), F.col("id").cast("string")).alias("k"),
        (F.col("id") % 7).cast("double").alias("w"),
    ).union(
        spark.range(1).select(F.lit("hot").alias("k"), F.lit(1.0).alias("w"))
    )

    def run_join(join_df):
        row = join_df.agg(
            F.count("*").alias("n"), F.sum(F.col("v") * F.col("w")).alias("s")
        ).collect()[0]
        return (row["n"], float(row["s"]))

    def set_aqe(enabled: bool, skew: bool) -> None:
        spark.conf.set("spark.sql.adaptive.enabled", str(enabled).lower())
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", str(skew).lower())

    results: dict[str, float] = {}
    checks = {}

    set_aqe(False, False)
    results["join_smj_aqe_off"], checks["off"] = timed(
        lambda: run_join(fact.join(dim, "k"))
    )

    set_aqe(True, True)
    results["join_smj_aqe_skew"], checks["aqe"] = timed(
        lambda: run_join(fact.join(dim, "k"))
    )

    set_aqe(False, False)
    results["join_salted"], checks["salted"] = timed(
        lambda: run_join(salted_join(fact, dim, "k", n_salts=N_SALTS))
    )
    set_aqe(True, True)

    assert checks["off"] == checks["aqe"] == checks["salted"], checks

    # aggregation control: partial agg should already tame the hot key
    mapper = F.array(
        F.struct(F.col("k").alias("key"), F.col("v").alias("value"))
    )
    results["agg_plain"], _ = timed(
        lambda: map_reduce(fact, mapper, combiner="sum").count()
    )
    results["agg_salted"], _ = timed(
        lambda: map_reduce_salted(fact, mapper, combiner="sum", n_salts=N_SALTS).count()
    )

    print(
        json.dumps(
            {
                "metric": "skew_bench",
                "n_rows": N_ROWS,
                "n_cold_keys": N_COLD,
                "hot_share": round(HOT_SHARE, 4),
                "n_salts": N_SALTS,
                "passes": PASSES,
                "unit": "sec",
                "results": {k: round(v, 2) for k, v in results.items()},
                "join_rows": checks["off"][0],
            }
        )
    )


if __name__ == "__main__":
    main()
