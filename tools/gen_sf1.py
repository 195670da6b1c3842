"""Real sf1 synthetic tables — fresh keys/text, NOT replication.

The round-4 scaling curve replicated sf0.1 ×10, which turns every
document into a 10-clique for the near-dup families (every copy is an
exact duplicate of 9 others) and distorts their growth numbers.  This
generator extends the driver's synthetic recipe forward instead
(seed=42, same schemas and marginal distributions as the driver's
tables, measured from sf0.1): documents get FRESH iid text drawn from
the same empirical vocabulary/length distributions, embeddings get
fresh random unit vectors, events get fresh uniform arrivals — so
near-dup/ANN growth is measured on non-adversarial data.

Only the three tables the heavy families scan are generated fresh;
the TPC-H fact tables keep bench_sf1's fact-grows-dims-don't
replication, which IS the realistic shape for joins.

Distribution fidelity (vs /root/testdata/sf0.1, all resampled
empirically): token unigram frequencies, words-per-doc, exact-dup
rate (~0.16%), source×lang marginals, event value/props marginals.
Deterministic under numpy default_rng(seed).
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"


def _read(table: str) -> pa.Table:
    return pq.read_table(os.path.join(SRC, f"{table}.parquet"))


def gen_documents(n_docs: int, rng: np.random.Generator) -> pa.Table:
    src = _read("documents")
    texts = src.column("text").to_pylist()
    # empirical unigram distribution + words-per-doc distribution
    from collections import Counter

    counts: Counter[str] = Counter()
    lengths = []
    for t in texts:
        ws = t.split(" ")
        counts.update(ws)
        lengths.append(len(ws))
    vocab = np.array(sorted(counts))
    freq = np.array([counts[w] for w in vocab], dtype=np.float64)
    freq /= freq.sum()
    lengths = np.array(lengths)

    dup_rate = 1.0 - (len(set(texts)) / len(texts))  # ~0.0016 at sf0.1

    # source × lang empirical marginal
    pairs = Counter(
        zip(src.column("source").to_pylist(), src.column("lang").to_pylist())
    )
    pair_keys = sorted(pairs)
    pair_p = np.array([pairs[k] for k in pair_keys], dtype=np.float64)
    pair_p /= pair_p.sum()

    doc_lens = rng.choice(lengths, size=n_docs, replace=True)
    total_words = int(doc_lens.sum())
    words = rng.choice(vocab, size=total_words, replace=True, p=freq)
    bounds = np.concatenate(([0], np.cumsum(doc_lens)))
    out_texts = [
        " ".join(words[bounds[i] : bounds[i + 1]]) for i in range(n_docs)
    ]
    # exact-dup injection at the empirical rate: late docs copy earlier
    n_dups = int(round(dup_rate * n_docs))
    if n_dups:
        dup_targets = rng.choice(n_docs, size=n_dups, replace=False)
        dup_sources = rng.choice(n_docs, size=n_dups, replace=True)
        for t_, s_ in zip(dup_targets, dup_sources):
            if t_ != s_:
                out_texts[t_] = out_texts[s_]

    pk = rng.choice(len(pair_keys), size=n_docs, replace=True, p=pair_p)
    sources = [pair_keys[i][0] for i in pk]
    langs = [pair_keys[i][1] for i in pk]
    return pa.table(
        {
            "doc_id": pa.array(np.arange(n_docs, dtype=np.int64)),
            "text": pa.array(out_texts),
            "lang": pa.array(langs),
            "source": pa.array(sources),
            "n_chars": pa.array(
                np.array([len(t) for t in out_texts], dtype=np.int64)
            ),
        }
    )


def gen_embeddings(n_vecs: int, rng: np.random.Generator) -> pa.Table:
    # sf0.1 embeddings are random unit vectors with uniform random
    # labels (measured: within-label scatter 1.0, between-centroid 0.1)
    src = _read("embeddings")
    dims = len(src.column("embedding")[0])
    n_labels = len(set(src.column("label").to_pylist()))
    m = rng.standard_normal((n_vecs, dims))
    m /= np.linalg.norm(m, axis=1, keepdims=True)
    m = m.astype(np.float32)
    flat = pa.array(m.reshape(-1))
    offs = pa.array(np.arange(n_vecs + 1, dtype=np.int32) * dims)
    emb = pa.ListArray.from_arrays(offs, flat)
    return pa.table(
        {
            "vec_id": pa.array(np.arange(n_vecs, dtype=np.int64)),
            "embedding": emb,
            "label": pa.array(
                rng.integers(0, n_labels, size=n_vecs, dtype=np.int32)
            ),
        }
    )


def gen_events(n_events: int, n_users: int, rng: np.random.Generator) -> pa.Table:
    src = _read("events")
    types = sorted(set(src.column("event_type").to_pylist()))
    values = np.array(src.column("value").to_pylist())
    ks = [json.loads(p)["k"] for p in src.column("props").to_pylist()[:20000]]
    ts_lo = np.datetime64("2024-01-01T00:00:00")
    span_us = 30 * 24 * 3600 * 1_000_000
    ts = ts_lo + rng.integers(0, span_us, size=n_events).astype("timedelta64[us]")
    ts = np.sort(ts)
    k_sample = rng.choice(np.array(ks), size=n_events, replace=True)
    return pa.table(
        {
            "event_id": pa.array(np.arange(n_events, dtype=np.int64)),
            "ts": pa.array(ts),
            "user_id": pa.array(
                rng.integers(0, n_users, size=n_events, dtype=np.int64)
            ),
            "event_type": pa.array(
                np.array(types)[rng.integers(0, len(types), size=n_events)]
            ),
            "value": pa.array(rng.choice(values, size=n_events, replace=True)),
            "props": pa.array([f'{{"k": {int(k)}}}' for k in k_sample]),
        }
    )


def generate(dst: str, scale: float = 10.0, seed: int = 42) -> None:
    """Write fresh documents/embeddings/events at ``scale`` × sf0.1
    into ``dst`` (multi row-group so scans split like cluster input)."""
    os.makedirs(dst, exist_ok=True)
    rng = np.random.default_rng(seed)
    n_docs = int(5000 * scale)
    n_vecs = int(2000 * scale)
    n_events = int(100_000 * scale)
    n_users = int(1500 * scale)
    for name, tbl in (
        ("documents", gen_documents(n_docs, rng)),
        ("embeddings", gen_embeddings(n_vecs, rng)),
        ("events", gen_events(n_events, n_users, rng)),
    ):
        path = os.path.join(dst, f"{name}.parquet")
        pq.write_table(tbl, path, row_group_size=max(1024, len(tbl) // 16))
        print(f"generated {name}: {len(tbl)} rows", file=sys.stderr)


if __name__ == "__main__":
    dst = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.scale_sf1"
    scale = float(sys.argv[2]) if len(sys.argv) > 2 else 10.0
    generate(dst, scale)
