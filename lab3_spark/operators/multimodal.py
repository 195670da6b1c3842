"""Multimodal column plumbing: opaque binary payloads + typed metadata,
processed with Arrow-batched ``mapInPandas``.

Real decode libraries (PIL / torchaudio / ffmpeg) are NOT in this
container, so the decode step is STUBBED (``_decode_real`` raises
NotImplementedError) behind a deterministic fake
(``_decode_fake``: md5-derived pseudo-metadata).  Everything around the
stub IS real and tested: the binary schema, the mapInPandas signature,
Arrow batch iteration, and the downstream aggregations.

Why mapInPandas (not a scalar UDF): decode is a bytes→many-columns
expansion with per-batch library state (decoder contexts); an iterator
of pandas DataFrames amortizes setup per Arrow batch and lets us drop
rows (corrupt files) — the canonical Spark shape for media pipelines.

Scale: decode work is embarrassingly parallel per partition; the only
knob that matters is input partition sizing (maxPartitionBytes) so one
task holds a bounded number of media blobs in memory.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("media_type", T.StringType(), False),
        T.StructField("content", T.BinaryType(), True),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("width", T.LongType(), True),
        T.StructField("height", T.LongType(), True),
        T.StructField("n_frames", T.LongType(), True),
        T.StructField("mean_px", T.DoubleType(), True),
    ]
)


def attach_media(documents: DataFrame, text_col: str = "text") -> DataFrame:
    """Materialize an opaque binary `content` column (utf-8 payload of
    the text — the stand-in for image/audio bytes) + media_type tag."""
    # Spread the single-row-group scan, but cap the partition count:
    # every mapInPandas partition forks a Python worker, and for small
    # blob batches the fork/Arrow-stream setup dominates.  At cluster
    # scale partitioning is driven by maxPartitionBytes (bounded blob
    # bytes per task), not a worker-count cap.
    par = min(documents.sparkSession.sparkContext.defaultParallelism, 8)
    return documents.repartition(par).select(
        "doc_id",
        F.lit("image/fake").alias("media_type"),
        F.encode(F.col(text_col), "UTF-8").alias("content"),
    )


def _decode_real(content: bytes) -> dict:
    """The real decoder hook — requires PIL/av, not in this container."""
    raise NotImplementedError(
        "media decode requires PIL/av; wire them here when available"
    )


def _decode_fake(content: bytes) -> dict:
    """Deterministic fake decode: md5-derived pseudo metadata.

    Chosen so a SQL oracle can recompute it: h1/h2 are the integer
    values of md5-hex substrings (functions/text.hex_to_long does the
    same fold in both engines)."""
    hexd = hashlib.md5(content).hexdigest()
    h1 = int(hexd[0:15], 16)
    h2 = int(hexd[15:30], 16)
    return {
        "n_bytes": len(content),
        "width": h1 % 640 + 1,
        "height": h2 % 480 + 1,
        "n_frames": h1 % 30 + 1,
        "mean_px": (h2 % 25600) / 100.0,
    }


def extract_features(media: DataFrame, use_real_decoder: bool = False) -> DataFrame:
    """media(doc_id, media_type, content) → FEATURE_SCHEMA rows via
    Arrow-batched mapInPandas."""
    decode = _decode_real if use_real_decoder else _decode_fake

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = [decode(c) for c in pdf["content"]]
            out = pd.DataFrame(feats)
            out.insert(0, "doc_id", pdf["doc_id"].values)
            yield out

    return media.mapInPandas(batches, FEATURE_SCHEMA)


def media_features(documents: DataFrame) -> DataFrame:
    """End-to-end: attach binary column → decode (stubbed) → features,
    ordered for stable comparison."""
    return extract_features(attach_media(documents)).orderBy("doc_id")


def frame_sample(media: DataFrame, every_n: int = 10) -> DataFrame:
    """Frame-sampling plumbing: one row per sampled frame index
    (explode over the fake n_frames) — the Spark-side shape of video
    frame extraction; the pixel payload stays stubbed."""
    feats = extract_features(media)
    return feats.select(
        "doc_id",
        F.explode(
            F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(every_n))
        ).alias("frame_idx"),
    ).orderBy("doc_id", "frame_idx")
