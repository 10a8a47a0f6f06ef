"""Multimodal columns: image/audio/video as opaque binary + typed
metadata, with decode / feature-extraction / resize / frame-sample as
Arrow-batched stages over ``mapInPandas``.

The decode kernels themselves are STUBBED (no image/audio libs in this
container): ``decode="fake"`` produces a deterministic feature
vector from the bytes' hash so the Spark-side plumbing — schema,
partitioning, UDF signature, Arrow batch shape — is real and tested;
``decode=real`` raises NotImplementedError at the exact point a codec
(PIL/librosa/ffmpeg) would plug in.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType([
    T.StructField("media_ref", T.StringType()),
    T.StructField("media_kind", T.StringType()),
    T.StructField("payload", T.BinaryType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("duration_ms", T.IntegerType()),
])

FEATURE_DIM = 16

FEATURES_SCHEMA = T.StructType([
    T.StructField("media_ref", T.StringType()),
    T.StructField("media_kind", T.StringType()),
    T.StructField("features", T.ArrayType(T.FloatType())),
    T.StructField("n_frames", T.IntegerType()),
])


def synth_media(media_dim: DataFrame) -> DataFrame:
    """Attach deterministic fake binary payloads + metadata to the
    media_dim table (JVM-side; payload = hash-derived bytes)."""
    return media_dim.select(
        "media_ref", "media_kind",
        F.sha2(F.col("media_ref"), 256).cast("binary").alias("payload"),
        F.when(F.col("media_kind") == "image",
               (F.pmod(F.xxhash64("media_ref"), 1920) + 16).cast("int"))
        .otherwise(F.lit(None).cast("int")).alias("width"),
        F.when(F.col("media_kind") == "image",
               (F.pmod(F.xxhash64("media_ref", F.lit(1)), 1080) + 16)
               .cast("int"))
        .otherwise(F.lit(None).cast("int")).alias("height"),
        F.when(F.col("media_kind") != "image",
               (F.pmod(F.xxhash64("media_ref", F.lit(2)), 600_000) + 1000)
               .cast("int"))
        .otherwise(F.lit(None).cast("int")).alias("duration_ms"))


def _fake_decode_features(payload: bytes, dim: int = FEATURE_DIM):
    """Deterministic stand-in for a real decoder: dim floats derived
    from a cryptographic hash of the payload."""
    h = hashlib.sha256(payload or b"").digest()
    return [((h[i % 32] / 255.0) * 2 - 1) for i in range(dim)]


def extract_features(media: DataFrame, frame_sample_ms: int = 1000,
                     decode: str = "fake") -> DataFrame:
    """Arrow-batched feature extraction over mapInPandas — each batch is
    a pandas DataFrame; the loop below is per-batch vectorizable work,
    NOT a row-at-a-time Python UDF boundary (one serialization per
    Arrow batch)."""
    if decode == "real":
        raise NotImplementedError(
            "real media decoding requires PIL/librosa/ffmpeg — not "
            "available in this container; plug the codec in here")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = pdf["payload"].map(_fake_decode_features)
            n_frames = (
                (pdf["duration_ms"].fillna(0) // frame_sample_ms)
                .clip(lower=0).astype("int32") + 1
            ).where(pdf["media_kind"] != "image", 1)
            yield pd.DataFrame({
                "media_ref": pdf["media_ref"],
                "media_kind": pdf["media_kind"],
                "features": feats,
                "n_frames": n_frames,
            })

    return media.mapInPandas(run, FEATURES_SCHEMA)


def resize_images(media: DataFrame, max_side: int = 256) -> DataFrame:
    """Resize stub: recomputes target dimensions (aspect-preserving) as
    Column math; payload re-encoding is where a real codec would go."""
    scale = F.least(
        F.lit(1.0),
        F.lit(max_side) / F.greatest(F.col("width"), F.col("height"))
        .cast("double"))
    return media.withColumn(
        "target_width", F.ceil(F.col("width") * scale).cast("int")
    ).withColumn(
        "target_height", F.ceil(F.col("height") * scale).cast("int"))
