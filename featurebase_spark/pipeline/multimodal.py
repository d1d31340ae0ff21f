"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed by Arrow-batched Pandas functions.

The Spark-side contract (schemas, partition-size control, mapInPandas batch
shape) is real and tested; the actual media decoding is STUBBED because
image/audio libraries are not in this container — each stub raises
``NotImplementedError`` unless ``fake=True``, which substitutes a
deterministic fake decode so the distributed plumbing can be exercised
end-to-end.

Scale notes: media blobs dominate row size, so operators (a) never shuffle
the binary column — feature extraction happens map-side before any
exchange; (b) cap per-task memory via ``maxRecordsPerBatch``; (c) return
compact fixed-width features, so downstream joins/aggs touch only metadata.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

#: Canonical multimodal table schema: opaque payload + typed metadata.
MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("payload", BinaryType(), True),
        StructField("media_type", StringType(), True),  # image|audio|video
        StructField("mime", StringType(), True),
        StructField("width", LongType(), True),
        StructField("height", LongType(), True),
        StructField("duration_ms", LongType(), True),
    ]
)

IMAGE_FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("sha256", StringType(), True),
        StructField("n_bytes", LongType(), True),
        StructField("features", ArrayType(DoubleType()), True),
    ]
)


def _fake_decode(payload: bytes, feat_dim: int) -> list[float]:
    """Deterministic fake 'decode+embed': bytes → sha256 → feat_dim floats
    in [0,1). Stands in for a real image/audio model so the distributed
    pipeline shape is testable in this container."""
    out: list[float] = []
    h = payload or b""
    counter = 0
    while len(out) < feat_dim:
        d = hashlib.sha256(h + counter.to_bytes(4, "big")).digest()
        out.extend(b / 255.0 for b in d)
        counter += 1
    return out[:feat_dim]


def extract_image_features(
    df: DataFrame,
    feat_dim: int = 16,
    fake: bool = False,
    batch_rows: int = 64,
) -> DataFrame:
    """Decode + feature-extract image payloads via ``mapInPandas`` (Arrow
    batches; the Pandas iterator keeps peak memory to one batch of blobs per
    task). Output drops the payload — only compact features flow downstream.

    ``fake=False`` raises NotImplementedError at execution time (no media
    libs in this container); ``fake=True`` uses the deterministic stub."""

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "real image decode requires PIL/opencv — not in container; "
                    "pass fake=True for the deterministic stub"
                )
            feats = [
                _fake_decode(bytes(p) if p is not None else b"", feat_dim)
                for p in pdf["payload"]
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "sha256": [
                        hashlib.sha256(bytes(p) if p is not None else b"").hexdigest()
                        for p in pdf["payload"]
                    ],
                    "n_bytes": [len(p) if p is not None else 0 for p in pdf["payload"]],
                    "features": feats,
                }
            )

    spark = df.sparkSession
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", str(batch_rows))
    return df.select("media_id", "payload").mapInPandas(run, IMAGE_FEATURES_SCHEMA)


def frame_sample_plan(
    df: DataFrame, every_ms: int = 1000
) -> DataFrame:
    """Video frame-sampling *plan*: one output row per (media_id, frame_ts).
    The timestamp lattice is computed JVM-side from metadata only — the
    payload is not touched until a downstream decode, so this explode is
    cheap even for hour-long videos."""
    return df.select(
        "media_id",
        F.explode(
            F.sequence(
                F.lit(0),
                F.coalesce(F.col("duration_ms"), F.lit(0)),
                F.lit(every_ms),
            )
        ).alias("frame_ts_ms"),
    )


def media_stats(df: DataFrame) -> DataFrame:
    """Metadata-only profile (never reads payloads thanks to column
    pruning): count/size distribution per media_type."""
    return df.groupBy("media_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.length("payload")).alias("total_bytes"),
        F.avg(F.col("width") * F.col("height")).alias("avg_pixels"),
    )
