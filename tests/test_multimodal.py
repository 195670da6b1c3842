"""Multimodal decode routing: the fake path is the deterministic
default; the real path activates exactly when Pillow is importable."""

import pytest

from lab3_spark.operators.multimodal import (
    attach_media,
    extract_features,
    pil_available,
)


def test_fake_decoder_is_deterministic(spark, corpus):
    feats = extract_features(attach_media(corpus.where("text != ''"))).collect()
    again = extract_features(attach_media(corpus.where("text != ''"))).collect()
    assert sorted(map(tuple, feats)) == sorted(map(tuple, again))
    for r in feats:
        assert 1 <= r["width"] <= 640 and 1 <= r["height"] <= 480


def test_real_decoder_raises_only_without_pillow(spark, corpus):
    media = attach_media(corpus.where("doc_id = 0"))
    if pil_available():
        pytest.skip("Pillow present: the absence contract can't be tested")
    with pytest.raises(Exception) as ei:
        extract_features(media, use_real_decoder=True).collect()
    assert "NotImplementedError" in str(ei.value) or isinstance(
        ei.value, NotImplementedError
    )


def test_auto_routing_matches_availability(spark, corpus):
    media = attach_media(corpus.where("doc_id = 0"))
    if not pil_available():
        # auto must fall back to the fake — and succeed
        rows = extract_features(media, use_real_decoder="auto").collect()
        assert len(rows) == 1 and rows[0]["n_bytes"] > 0


@pytest.mark.skipif(not pil_available(), reason="Pillow not installed")
def test_real_decoder_on_generated_png(spark):
    """With Pillow present, a real 8x5 PNG must decode to its true
    dimensions (not the md5 fake's)."""
    import io

    from PIL import Image

    buf = io.BytesIO()
    Image.new("RGB", (8, 5), color=(200, 10, 10)).save(buf, format="PNG")
    media = spark.createDataFrame(
        [(0, "image/png", bytearray(buf.getvalue()))],
        "doc_id long, media_type string, content binary",
    )
    row = extract_features(media, use_real_decoder=True).collect()[0]
    assert (row["width"], row["height"], row["n_frames"]) == (8, 5, 1)
    assert 0.0 <= row["mean_px"] <= 255.0


def test_byte_chunks_reassemble(spark, sf_dir):
    """Chunks tile each blob exactly: sizes sum to the blob length,
    indexes are contiguous from 0, every chunk but the last is full,
    and each chunk_md5 matches a Python recompute."""
    import hashlib
    import math

    from lab3_spark.operators.multimodal import attach_media, byte_chunks
    from lab3_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents").limit(50)
    media = attach_media(docs)
    blobs = {r.doc_id: bytes(r.content) for r in media.collect()}
    out = {}
    for r in byte_chunks(media).collect():
        out.setdefault(r.doc_id, []).append(r)
    for doc_id, chunks in out.items():
        blob = blobs[doc_id]
        chunks.sort(key=lambda r: r.chunk_idx)
        assert [c.chunk_idx for c in chunks] == list(range(len(chunks)))
        assert len(chunks) == math.ceil(len(blob) / 64)
        assert sum(c.n_bytes for c in chunks) == len(blob)
        for c in chunks[:-1]:
            assert c.n_bytes == 64
        for c in chunks:
            piece = blob[c.chunk_idx * 64 : c.chunk_idx * 64 + 64]
            assert c.chunk_md5 == hashlib.md5(piece).hexdigest(), (
                doc_id,
                c.chunk_idx,
            )


def test_phash_near_dup_semantics(spark):
    """Exact byte copy → all 16 chunks equal; a same-length
    substitution flips only its own chunks (≥13 survive → near-dup);
    an insertion shifts every later byte (documented miss — the
    fixed-grid image analogy)."""
    from lab3_spark.operators.multimodal import phash_near_dups

    base = "".join(f"word{i:03d} " for i in range(64))  # 512 ascii bytes
    sub = base.replace("word010", "WORDXXX")            # same length
    ins = base.replace("word010 ", "word010 extra ")    # shifts tail
    docs = spark.createDataFrame(
        [(1, base), (2, base), (3, sub), (4, ins)],
        "doc_id bigint, text string",
    )
    got = {
        (r.doc_a, r.doc_b): r.n_equal_chunks
        for r in phash_near_dups(docs).collect()
    }
    assert got[(1, 2)] == 16                      # exact copy
    assert (1, 3) in got and got[(1, 3)] >= 13    # substitution caught
    assert got[(2, 3)] == got[(1, 3)]
    assert (1, 4) not in got                      # insertion shifts all
