"""Multimodal columns: image/audio/video as opaque binary + typed
metadata, with decode / feature-extraction / resize / frame-sample as
Arrow-batched stages over ``mapInPandas``.

``decode="fake"`` produces a deterministic feature vector from the
bytes' hash so the Spark-side plumbing — schema, partitioning, UDF
signature, Arrow batch shape — is real and tested regardless of
environment. ``decode="real"`` decodes PNG payloads with the pure-
stdlib codec in :mod:`jsi_spark.ops.png` (zlib scanlines + the 5
predictor filters) and derives features from the actual pixels;
non-PNG payloads (audio/video containers, JPEG, ...) still raise
NotImplementedError at the exact point PIL/librosa/ffmpeg would plug
in — those codecs are not stdlib-implementable.
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


def synth_png_media(media_dim: DataFrame, max_side: int = 16) -> DataFrame:
    """Attach REAL (small, deterministic) PNG payloads to the image rows
    of the media_dim table: pixels are a SHA-256 counter stream seeded
    by media_ref (jsi_spark.ops.png.synth_pixels), encoded through the
    stdlib codec. An Arrow mapInPandas stage, since PNG encoding is
    Python-side; payloads are a few hundred bytes each."""
    from jsi_spark.ops import png

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for ref in pdf["media_ref"]:
                w, h = png.synth_dims(ref, max_side)
                payload = png.encode_png(png.synth_pixels(ref, w, h),
                                         w, h, color_type=2)
                rows.append((ref, payload, w, h))
            out = pd.DataFrame(rows, columns=["media_ref", "payload",
                                              "width", "height"])
            out["media_kind"] = "image"
            out["duration_ms"] = pd.array([None] * len(out),
                                          dtype="Int32")
            yield out[["media_ref", "media_kind", "payload",
                       "width", "height", "duration_ms"]]

    imgs = media_dim.filter(F.col("media_kind") == "image") \
        .select("media_ref")
    return imgs.mapInPandas(run, MEDIA_SCHEMA)


def synth_wav_media(media_dim: DataFrame,
                    sample_rate: int = 16000) -> DataFrame:
    """Attach REAL (short, deterministic) 16-bit PCM WAV payloads to
    the audio rows of the media_dim table — the audio counterpart of
    :func:`synth_png_media`."""
    from jsi_spark.ops import wav

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for ref in pdf["media_ref"]:
                dur = wav.synth_duration_ms(ref)
                n = sample_rate * dur // 1000
                payload = wav.encode_wav(wav.synth_samples(ref, n),
                                         sample_rate)
                rows.append((ref, payload, dur))
            out = pd.DataFrame(rows, columns=["media_ref", "payload",
                                              "duration_ms"])
            out["media_kind"] = "audio"
            out["width"] = pd.array([None] * len(out), dtype="Int32")
            out["height"] = pd.array([None] * len(out), dtype="Int32")
            yield out[["media_ref", "media_kind", "payload",
                       "width", "height", "duration_ms"]]

    auds = media_dim.filter(F.col("media_kind") == "audio") \
        .select("media_ref")
    return auds.mapInPandas(run, MEDIA_SCHEMA)


def _fake_decode_features(payload: bytes, dim: int = FEATURE_DIM):
    """Deterministic stand-in for a real decoder: dim floats derived
    from a cryptographic hash of the payload."""
    h = hashlib.sha256(payload or b"").digest()
    return [((h[i % 32] / 255.0) * 2 - 1) for i in range(dim)]


def _real_decode_features(payload: bytes):
    """Decode the payload with a stdlib codec, dispatched on magic
    bytes — PNG (zlib scanlines) and 16-bit PCM WAV (wave module) —
    and compute 16 statistics features. Per-payload Python is the
    nature of codecs (PIL is, too) — the batching above this stays
    Arrow."""
    from jsi_spark.ops import png, wav
    if wav.is_wav(payload):
        rate, ch, samples = wav.decode_wav(bytes(payload))
        return [float(x) for x in wav.audio_stats(samples, rate, ch)]
    if not png.is_png(payload):
        raise NotImplementedError(
            "decode='real' covers PNG (stdlib zlib) and PCM WAV "
            "(stdlib wave); other formats need PIL/librosa/ffmpeg — "
            "plug the codec in here")
    w, h, ch, px = png.decode_png(bytes(payload))
    if ch != 3:
        # promote gray / strip alpha to RGB for uniform stats
        rgb = bytearray(w * h * 3)
        for p in range(w * h):
            if ch == 1:
                rgb[p * 3:p * 3 + 3] = px[p:p + 1] * 3
            elif ch == 2:
                rgb[p * 3:p * 3 + 3] = px[p * 2:p * 2 + 1] * 3
            else:  # RGBA
                rgb[p * 3:p * 3 + 3] = px[p * 4:p * 4 + 3]
        px = bytes(rgb)
    return [float(x) for x in png.pixel_stats(px, w, h)]


def extract_features(media: DataFrame, frame_sample_ms: int = 1000,
                     decode: str = "fake") -> DataFrame:
    """Arrow-batched feature extraction over mapInPandas — each batch is
    a pandas DataFrame; the loop below is per-batch vectorizable work,
    NOT a row-at-a-time Python UDF boundary (one serialization per
    Arrow batch)."""
    if decode not in ("fake", "real"):
        raise ValueError(f"decode must be 'fake' or 'real', got {decode!r}")
    decoder = _real_decode_features if decode == "real" \
        else _fake_decode_features

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = pdf["payload"].map(decoder)
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


def resize_images(media: DataFrame, max_side: int = 256,
                  decode: str = "fake") -> DataFrame:
    """Aspect-preserving shrink-only resize.

    ``decode="fake"`` (default): metadata-only — target dimensions as
    pure Column math, payload untouched (the planning/bookkeeping half
    of the operator, format-agnostic). ``decode="real"``: PNG payloads
    are decoded (stdlib codec), nearest-neighbor resampled, re-encoded;
    rows come back in MEDIA_SCHEMA with the new dimensions. Non-PNG
    payloads raise NotImplementedError at the codec plug point."""
    if decode == "real":
        from jsi_spark.ops import png

        def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                rows = []
                for ref, kind, payload in zip(pdf["media_ref"],
                                              pdf["media_kind"],
                                              pdf["payload"]):
                    if not png.is_png(payload):
                        raise NotImplementedError(
                            "resize decode='real' covers PNG; other "
                            "formats need PIL — plug the codec in here")
                    w, h, ch, px = png.decode_png(bytes(payload))
                    tw, th = png.target_dims(w, h, max_side)
                    out = png.encode_png(
                        png.resample_nearest(px, w, h, tw, th, ch),
                        tw, th,
                        color_type={1: 0, 3: 2, 2: 4, 4: 6}[ch])
                    rows.append((ref, kind, out, tw, th))
                out_pdf = pd.DataFrame(
                    rows, columns=["media_ref", "media_kind", "payload",
                                   "width", "height"])
                out_pdf["duration_ms"] = pd.array([None] * len(out_pdf),
                                                  dtype="Int32")
                yield out_pdf[["media_ref", "media_kind", "payload",
                               "width", "height", "duration_ms"]]

        imgs = media.filter(F.col("media_kind") == "image")
        return imgs.mapInPandas(run, MEDIA_SCHEMA)
    if decode != "fake":
        raise ValueError(f"decode must be 'fake' or 'real', got {decode!r}")
    scale = F.least(
        F.lit(1.0),
        F.lit(max_side) / F.greatest(F.col("width"), F.col("height"))
        .cast("double"))
    return media.withColumn(
        "target_width", F.ceil(F.col("width") * scale).cast("int")
    ).withColumn(
        "target_height", F.ceil(F.col("height") * scale).cast("int"))
