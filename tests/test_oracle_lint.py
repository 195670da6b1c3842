"""Every oracle must type-check under the driver's pandas bridge.

Guards against the round-2 HUGEINT artifact: numerically identical
results hashing differently because DuckDB's int128 materializes as
float64.  DESCRIBE-only — needs DuckDB + the parquet schemas, no Spark.
"""

import os

import pytest

from tools.oracle_lint import lint_oracles


@pytest.mark.skipif(
    not os.path.exists("/root/testdata/sf0.001"),
    reason="driver testdata not present",
)
def test_no_hugeint_or_decimal_oracle_columns():
    problems = lint_oracles("/root/testdata/sf0.001")
    assert problems == [], "\n".join(problems)
