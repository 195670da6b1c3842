"""Arrow-batched byte-level tokenizer — the measured alternative to the
JVM regex tokenizer on the word-count hot path.

The expression tokenizer (functions/text.py `tokenize`:
``regexp_extract_all(lower(text), "[a-z][a-z']*")``) is the engine's
documented word-count floor: ~360 MB/s aggregate at 430 MB vs the
reference's ~810 MB/s zero-copy C++ scanner (docs/SCALE.md).  This
module is the one unexplored rung of the engine's Python-boundary
ladder (expr → pandas → arrow, cf. operators/similarity.py LSH codes):
a ``mapInArrow`` kernel that scans the raw UTF-8 bytes with vectorized
numpy — ASCII tolower lookup table, [a-z'] run detection, first-letter
trim — and pre-aggregates PARTIAL COUNTS per batch with Arrow's C++
hash group-by, so the Python boundary returns ~vocabulary-sized
batches, never tokens.

Token spec parity: a token is ``[a-z][a-z']*`` after lowercasing —
byte-level ASCII tolower, which is EXACTLY the reference's semantics
(wordCount.cpp:67-86 does in-place ``tolower`` on bytes).  The
expression form instead applies Unicode lowercasing first, so the two
differ only for characters whose Unicode lowercase folds INTO a-z
(e.g. U+0130 LATIN CAPITAL I WITH DOT, U+212A KELVIN SIGN): the
expression form emits a token there, this kernel does not — the
reference agrees with this kernel.  On ASCII input (the reference
corpora; the synthetic documents table) they are bit-identical, pinned
by tests/test_wordcount_arrow.py.

Scale shape: per-batch partial counts make the Python stage a map-side
combiner — the shuffle after it carries one row per distinct word per
batch, identical to the JVM partial-aggregate shape; everything before
the shuffle is numpy/Arrow C loops over flat buffers (no per-row
Python).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pyarrow as pa

_LUT = np.arange(256, dtype=np.uint8)
_LUT[ord("A") : ord("Z") + 1] = np.arange(ord("a"), ord("z") + 1, dtype=np.uint8)
_A, _Z, _AP = ord("a"), ord("z"), ord("'")

_OUT_SCHEMA = pa.schema([("word", pa.string()), ("cnt", pa.int64())])


def token_counts_table(arr: pa.Array) -> pa.Table:
    """(word, cnt) partial counts for one Arrow string array of texts.

    Vectorized over the array's flat UTF-8 value buffer: string
    boundaries are token breaks (a row never continues the previous
    row's token), runs of ``[a-z']`` bytes are located with shifted
    masks, and each run's token starts at its first LETTER (leading
    apostrophes dropped, runs without letters discarded) — the
    ``[a-z][a-z']*`` spec without a regex engine.  UTF-8 continuation
    bytes are ≥ 0x80, never in ``[a-z']``, so multi-byte characters
    are separators, byte-for-byte like the reference's scanner."""
    if len(arr) == 0:
        return _OUT_SCHEMA.empty_table()  # zero-length slices may carry
        # null buffers — nothing to scan either way
    if arr.null_count:
        import pyarrow.compute as pc

        arr = pc.fill_null(arr, "")
    off_dtype = np.int64 if pa.types.is_large_string(arr.type) else np.int32
    bufs = arr.buffers()
    offs_all = np.frombuffer(bufs[1], dtype=off_dtype)
    offs = offs_all[arr.offset : arr.offset + len(arr) + 1].astype(np.int64)
    lo_b, hi_b = int(offs[0]), int(offs[-1])
    n = hi_b - lo_b
    if n == 0:
        return _OUT_SCHEMA.empty_table()
    raw = np.frombuffer(bufs[2], dtype=np.uint8, count=hi_b)[lo_b:hi_b]
    low = _LUT[raw]
    bounds = offs - lo_b  # row-start byte positions, relative

    is_letter = (low >= _A) & (low <= _Z)
    is_tok = is_letter | (low == _AP)

    prev = np.empty_like(is_tok)
    prev[0] = False
    prev[1:] = is_tok[:-1]
    row_starts = bounds[:-1]
    prev[row_starts[row_starts < n]] = False  # rows never continue a run
    nxt = np.empty_like(is_tok)
    nxt[-1] = False
    nxt[:-1] = is_tok[1:]
    row_ends = bounds[1:-1] - 1  # byte before each subsequent row start
    nxt[row_ends[row_ends >= 0]] = False

    rs = np.flatnonzero(is_tok & ~prev)
    re_ = np.flatnonzero(is_tok & ~nxt)
    if rs.size == 0:
        return _OUT_SCHEMA.empty_table()

    # first letter of each run via an exclusive letter-count prefix —
    # letter_pos[letters strictly before run start] IS the run's first
    # letter when the run contains one (no searchsorted: measured 10x
    # slower than this gather on this host)
    cl = np.cumsum(is_letter)
    letter_pos = np.flatnonzero(is_letter)
    excl = cl[rs] - is_letter[rs]
    valid = excl < cl[re_]  # run contains at least one letter
    ts = letter_pos[excl[valid]]
    te = re_[valid] + 1
    if ts.size == 0:
        return _OUT_SCHEMA.empty_table()

    lens = te - ts
    total = int(lens.sum())
    # gather-index construction by cumsum-of-deltas (one pass, no
    # np.repeat over token-sized arrays)
    cum = np.cumsum(lens)
    gidx = np.ones(total, dtype=np.int64)
    gidx[0] = ts[0]
    if ts.size > 1:
        gidx[cum[:-1]] = ts[1:] - (ts[:-1] + lens[:-1]) + 1
    gidx = np.cumsum(gidx)
    tok_bytes = low[gidx]
    new_offs = np.zeros(lens.size + 1, dtype=np.int32)
    np.cumsum(lens, out=new_offs[1:])

    words = pa.StringArray.from_buffers(
        lens.size, pa.py_buffer(new_offs.tobytes()), pa.py_buffer(tok_bytes.tobytes())
    )
    counts = (
        pa.table({"word": words})
        .group_by("word")
        .aggregate([([], "count_all")])
    )
    return pa.table(
        {
            "word": counts.column("word"),
            "cnt": counts.column("count_all").cast(pa.int64()),
        }
    )


def token_count_batches(
    it: Iterator[pa.RecordBatch],
) -> Iterator[pa.RecordBatch]:
    """``mapInArrow`` kernel: one (word, cnt) partial-count batch per
    input batch.  Input schema: a single string column of texts."""
    for batch in it:
        t = token_counts_table(batch.column(0))
        for out in t.to_batches():
            yield out
