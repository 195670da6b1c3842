"""The real-sf1 generator must be deterministic (seeded) and match
the driver tables' marginal distributions — the scaling curve's
credibility rests on both."""

from __future__ import annotations

import os

import pyarrow.parquet as pq
import pytest

pytestmark = pytest.mark.skipif(
    not os.path.exists("/root/testdata/sf0.1"),
    reason="driver testdata not present",
)


def test_generator_is_deterministic(tmp_path):
    from tools.gen_sf1 import generate

    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    generate(a, scale=0.05)
    generate(b, scale=0.05)
    for t in ("documents", "embeddings", "events"):
        ta = pq.read_table(f"{a}/{t}.parquet")
        tb = pq.read_table(f"{b}/{t}.parquet")
        assert ta.equals(tb), f"{t} differs between seeded runs"


def test_generated_marginals_match_source(tmp_path):
    import numpy as np

    from tools.gen_sf1 import generate

    d = str(tmp_path / "m")
    generate(d, scale=0.2)
    docs = pq.read_table(f"{d}/documents.parquet")
    src = pq.read_table("/root/testdata/sf0.1/documents.parquet")
    # doc length distribution within 10% on the mean
    got = np.mean(docs.column("n_chars").to_numpy())
    want = np.mean(src.column("n_chars").to_numpy())
    assert abs(got - want) / want < 0.10
    # language mix: en must be the majority class like the source
    langs = docs.column("lang").to_pylist()
    assert max(set(langs), key=langs.count) == "en"
    # embeddings: unit vectors, source label cardinality
    emb = pq.read_table(f"{d}/embeddings.parquet")
    v = np.array(emb.column("embedding").to_pylist())
    norms = np.linalg.norm(v, axis=1)
    assert np.allclose(norms, 1.0, atol=1e-3)
    assert set(emb.column("label").to_pylist()) <= set(range(10))
