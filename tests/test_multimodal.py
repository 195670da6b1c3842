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
