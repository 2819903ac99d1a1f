"""Multimodal column plumbing: image/audio/video as opaque BINARY +
typed metadata, processed by Arrow-batched ``mapInPandas``.

The decode step itself needs codec libraries that are not available
in this environment; ``decoder='stub'`` raises NotImplementedError
(clearly marked), ``decoder='fake'`` derives deterministic features
from the bytes (xxhash-seeded) so the Spark-side plumbing — schema,
batch shape, partitioning, UDF signature — is fully exercised and
tested. Swapping in Pillow/librosa/pyav is a one-function change.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("content", T.BinaryType(), True),
        T.StructField("mime", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
    ]
)


def _fake_decode(content: bytes, dim: int) -> np.ndarray:
    """Deterministic stand-in for a real decode+embed: features are a
    pure function of the bytes."""
    digest = hashlib.sha256(content or b"").digest()
    seed = int.from_bytes(digest[:8], "little") % (2**32)
    rng = np.random.RandomState(seed)
    return rng.randn(dim).astype(np.float32)


def extract_media_features(
    media: DataFrame, dim: int = 16, decoder: str = "fake"
) -> DataFrame:
    """Feature extraction over a media table (MEDIA_SCHEMA). Arrow
    batches; no shuffle. ``decoder='stub'`` marks where a real codec
    plugs in."""

    def run(batches):
        for pdf in batches:
            if decoder == "stub":
                raise NotImplementedError(
                    "real media decoding requires codec libraries (Pillow/"
                    "librosa/pyav) not present in this environment; use "
                    "decoder='fake' for deterministic plumbing tests"
                )
            feats = [
                _fake_decode(c, dim).tolist() if c is not None else None
                for c in pdf["content"]
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": [len(c) if c is not None else 0 for c in pdf["content"]],
                    "feature": feats,
                }
            )

    cols = [c for c in ("media_id", "kind", "content") if c in media.columns]
    return media.select(*cols).mapInPandas(run, schema=FEATURE_SCHEMA)


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling plumbing: one output row per planned frame
    (media_id, frame_idx, ts_ms) — the decode of each frame is the
    stubbed step. Native explode over a computed sequence."""
    from pyspark.sql import functions as F

    frames = F.sequence(
        F.lit(0), F.greatest((F.col("duration_ms") / every_ms).cast("long") - 1, F.lit(0))
    )
    return (
        media.where(F.col("kind") == "video")
        .select("media_id", F.explode(frames).alias("frame_idx"))
        .withColumn("ts_ms", F.col("frame_idx") * every_ms)
    )
