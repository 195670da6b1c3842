"""Static type lint over every registered oracle.

Round 2 lesson: DuckDB ``sum()`` over INTEGER returns HUGEINT (int128),
which the driver's pandas materialization renders as float64 ("81.0"),
while the matching Spark BIGINT renders as "81" — a value-hash mismatch
with numerically identical results.  This lint DESCRIBEs every oracle
(no data is read; DuckDB plans the query against the parquet schema)
and fails on any output column whose type the pandas bridge cannot
represent exactly as its Spark counterpart:

- HUGEINT / UHUGEINT  -> float64 (precision + "81.0" rendering)
- DECIMAL             -> Decimal objects, str() differs from float

Run standalone: ``python tools/oracle_lint.py [sf_dir]``
Run in CI: ``tests/test_oracle_lint.py`` calls :func:`lint_oracles`.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

BAD_TYPES = ("HUGEINT", "UHUGEINT", "DECIMAL")

# Round-4 lesson (CORRECTNESS_r04: grouped_minmax_normalize): the
# DRIVER's canonicalizer — unlike tools/verify_local.py's — sorts the
# pandas frame with ``sort_values``/hashing, which raises
# ``TypeError: unhashable type: 'list'`` on any column that
# materializes as Python lists/dicts.  A value-correct query turns
# driver-RED on shape alone.  Nested SQL types (LIST/ARRAY, STRUCT,
# MAP, JSON) are therefore banned from every oracle's output schema;
# emit long form (one scalar row per element) or a deterministic
# string rendering instead.
NESTED_MARKERS = ("[]", "STRUCT", "MAP(", "LIST", "JSON", "UNION(")


def _nested(typ: str) -> bool:
    t = typ.upper()
    return any(m in t for m in NESTED_MARKERS)


def lint_oracles(sf_dir: str = "/root/testdata/sf0.001") -> list[str]:
    """Return a list of 'query.column: TYPE' violations (empty = clean)."""
    import __spark_entry__ as entrymod
    from lab3_spark.sources.tables import TABLES

    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')"
            )
    problems: list[str] = []
    for name, sql in entrymod.oracle_sql().items():
        try:
            desc = con.execute(f"DESCRIBE {sql}").fetchall()
        except Exception as e:  # a broken oracle is also a lint failure
            problems.append(f"{name}: DESCRIBE failed: {e}")
            continue
        for col, typ, *_ in desc:
            base = typ.split("(")[0].upper()
            if base in BAD_TYPES:
                problems.append(
                    f"{name}.{col}: {typ} (wrap in CAST(... AS BIGINT) "
                    f"or round to DOUBLE in the oracle SQL)"
                )
            if _nested(typ):
                problems.append(
                    f"{name}.{col}: {typ} (nested type — the driver "
                    f"canonicalizer cannot sort/hash list columns; "
                    f"emit long form or a string rendering)"
                )
    return problems


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    problems = lint_oracles(sf_dir)
    for p in problems:
        print("LINT", p)
    n = len(problems)
    print(f"{n} violation(s) across oracles" if n else "oracle lint clean")
    return 1 if problems else 0


if __name__ == "__main__":
    raise SystemExit(main())
