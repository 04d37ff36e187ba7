"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed by Arrow-batched mapInPandas stages.

The image/audio libraries are not available in this container, so the DECODE
step is stubbed (deterministic fake features behind `fake=True`, otherwise
NotImplementedError) — but the Spark-side plumbing is real and tested:
schemas, batch iteration, partition-size control, and the pattern of
carrying media alongside text spans (the reference routes media properties
out of fusion, generate_buckets.py:81-133; here they become first-class
columns instead of being dropped).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_ref", T.StringType()),
        T.StructField("media_type", T.StringType()),  # image|audio|video
        T.StructField("payload", T.BinaryType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.IntegerType()),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_ref", T.StringType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
        T.StructField("n_frames", T.IntegerType()),
    ]
)


def media_table_from_refs(docs_media: DataFrame) -> DataFrame:
    """Synthesize the opaque media table from media_refs (deterministic
    payload bytes derived from the ref hash — stand-in for object storage)."""
    h = F.xxhash64("media_ref")
    return docs_media.select("media_ref").distinct().select(
        "media_ref",
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.pmod(h, F.lit(3)) + 1).cast("int"),
        ).alias("media_type"),
        F.encode(F.concat(F.lit("payload:"), "media_ref"), "utf-8").alias("payload"),
        (F.pmod(h, F.lit(1024)) + 16).cast("int").alias("width"),
        (F.pmod(h, F.lit(768)) + 16).cast("int").alias("height"),
        (F.pmod(h, F.lit(60000)) + 1000).cast("int").alias("duration_ms"),
    )


def extract_features(
    media: DataFrame, dim: int = 16, batch_hint: int = 1024, fake: bool = True
) -> DataFrame:
    """Decode + feature-extract via mapInPandas.

    fake=True: deterministic pseudo-features from the payload bytes (the
    Spark contract — schema, Arrow batching, per-batch vectorization — is
    identical to a real decoder). fake=False raises NotImplementedError
    where a real image/audio decode would go (libs absent in this env).
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "real media decode requires image/audio libs not present "
                    "in this environment; use fake=True for plumbing tests"
                )
            feats, frames = [], []
            for payload in pdf["payload"]:
                arr = np.frombuffer(bytes(payload), dtype=np.uint8)
                rng = np.resize(arr.astype(np.float32), dim)
                feats.append((rng / 255.0).tolist())
                frames.append(int(arr[:4].sum() % 32) + 1)
            yield pd.DataFrame(
                {
                    "media_ref": pdf["media_ref"],
                    "media_type": pdf["media_type"],
                    "feature": feats,
                    "n_frames": frames,
                }
            )

    return media.mapInPandas(run, FEATURE_SCHEMA)


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Frame-sampling plan for videos: one row per sampled timestamp —
    pure expressions (the decode of each frame would run in
    extract_features)."""
    return (
        media.filter(F.col("media_type") == "video")
        .select(
            "media_ref",
            F.explode(
                F.sequence(F.lit(0), F.col("duration_ms"), F.lit(every_ms))
            ).alias("sample_ms"),
        )
    )
