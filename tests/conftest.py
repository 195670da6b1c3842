import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("SPARK_GRAFT_CPUS", "4")  # small & fast for unit tests


@pytest.fixture(scope="session")
def spark():
    from lab3_spark.session import get_spark

    s = get_spark("lab3_spark_tests", shuffle_partitions=4)
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return os.environ.get("SPARK_GRAFT_SF_DIR_TEST", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def corpus(spark):
    """Tiny hand-built corpus exercising the parity quirks (FIXTURES.md
    §1.1): tabs, mixed case, digits, apostrophes, repeated words on one
    line, stop-word-substring collisions, frequency ties."""
    rows = [
        (0, "The quick brown fox\tjumps over the lazy dog"),
        (1, "Don't stop believin' — hold on to that feelin'"),
        (2, "fox fox dog 123 42nd"),
        (3, ""),
        (4, "Quick QUICK quick"),
        (5, "abo ve is not above but abo is a substring test"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")
