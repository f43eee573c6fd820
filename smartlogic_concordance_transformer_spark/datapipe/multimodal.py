"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The Spark-side plumbing is real and tested — schemas, Arrow batch shapes,
``mapInPandas`` partition iteration, partition sizing. The codec step is
stubbed (this container has no image/audio libraries): ``decode_image``
raises ``NotImplementedError`` unless ``fake=True``, in which case a
deterministic fake decoder produces stable features from the bytes, so the
distributed plumbing is exercised end to end.

At 100 TB: binary payloads dominate partition size, so
``spark.sql.files.maxPartitionBytes`` governs batch memory; metadata-only
queries never touch the binary column (columnar pruning), which is why the
payload and metadata live in separate columns rather than one struct.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),  # image | audio | video
        T.StructField("mime", T.StringType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.LongType()),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
        T.StructField("decode_error", T.StringType()),
    ]
)


def _fake_decode(payload: bytes, dim: int = 16) -> list[float]:
    """Deterministic stand-in for a real decoder: sha256 -> unit floats.
    STUB — replace with PIL/libav decode on a real deployment."""
    h = hashlib.sha256(payload or b"").digest()
    return [b / 255.0 for b in h[:dim]]


def extract_features(df: DataFrame, dim: int = 16, fake: bool = False) -> DataFrame:
    """mapInPandas feature extraction over media rows.

    Arrow streams each partition as record batches; the UDF sees pandas
    frames, never one row at a time. ``fake=False`` raises (no codecs in
    this environment) — the failure is per-partition and early.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "media decode requires image/audio codecs not present in "
                    "this environment; pass fake=True for the deterministic stub"
                )
            out = pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "feature": [_fake_decode(p, dim) for p in pdf["payload"]],
                    "decode_error": [None] * len(pdf),
                }
            )
            yield out

    return df.mapInPandas(run, FEATURE_SCHEMA)


def frame_sample_plan(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling plan: (media_id, frame_ts_ms) rows — pure SQL
    over metadata, no payload touch (column pruning keeps the scan thin)."""
    from pyspark.sql import functions as F

    return df.filter(df.kind == "video").select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), F.coalesce(df.duration_ms, F.lit(0)), F.lit(every_ms))
        ).alias("frame_ts_ms"),
    )
