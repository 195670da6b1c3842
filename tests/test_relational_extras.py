"""Lorenz/Gini concentration (operators/relational.py): invariants on
real testdata — value parity is the `customer_revenue_lorenz` oracle
gate."""

from pyspark.sql import functions as F  # noqa: F401


def test_customer_revenue_lorenz_invariants(spark, sf_dir):
    from lab3_spark.operators.relational import customer_revenue_lorenz

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    rows = customer_revenue_lorenz(orders).collect()
    assert [r["decile"] for r in rows] == list(range(1, 11))
    n_custs = sum(r["n_custs"] for r in rows)
    assert n_custs == orders.select("o_custkey").distinct().count()
    # deciles are as equal as ntile allows
    sizes = [r["n_custs"] for r in rows]
    assert max(sizes) - min(sizes) <= 1
    # Lorenz curve: cumulative shares strictly increase to exactly ~1
    # (truncating DIV: the last point is within 1 ulp of 1e6)
    cums = [r["cum_share_fp"] for r in rows]
    assert cums == sorted(cums)
    assert 10**6 - 1 <= cums[-1] <= 10**6
    # convexity of the Lorenz curve: since customers are sorted
    # ascending, each decile holds at least the previous one's revenue
    revs = [r["revenue_cents"] for r in rows]
    assert all(b >= a for a, b in zip(revs, revs[1:]))
    gini = {r["gini_fp"] for r in rows}
    assert len(gini) == 1
    (g,) = gini
    assert 0 <= g <= 10**6
