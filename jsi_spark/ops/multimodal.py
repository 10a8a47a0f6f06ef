"""Multimodal columns: image/audio/video as opaque binary + typed
metadata, with decode / feature-extraction / resize / frame-sample as
Arrow-batched stages over ``mapInPandas``.

``decode="fake"`` produces a deterministic feature vector from the
bytes' hash so the Spark-side plumbing — schema, partitioning, UDF
signature, Arrow batch shape — is real and tested regardless of
environment. ``decode="real"`` decodes payloads with the pure-
stdlib/numpy codecs — PNG (:mod:`jsi_spark.ops.png`, zlib scanlines +
the 5 predictor filters), 16-bit PCM WAV (:mod:`jsi_spark.ops.wav`),
animated GIF (:mod:`jsi_spark.ops.gif`, variable-width LZW), and
JPEG (:mod:`jsi_spark.ops.jpeg`, T.81 DCT + canonical Huffman —
grayscale, 4:4:4 color, 4:2:0/4:2:2/4:4:0 chroma subsampling, and
PROGRESSIVE SOF2 with spectral selection + successive
approximation), plus MJPEG-in-MP4 container demux
(:mod:`jsi_spark.ops.mp4`, ISO-BMFF box walk + stts/stsc/stsz/stco
sample tables) — and derives features from the actual
pixels/samples/frames; other codecs still raise NotImplementedError
at the exact point PIL/librosa/ffmpeg would plug in.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from jsi_spark.session import ensure_py_files

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

    ensure_py_files(media_dim.sparkSession)
    imgs = media_dim.filter(F.col("media_kind") == "image") \
        .select("media_ref")
    return imgs.mapInPandas(run, MEDIA_SCHEMA)


def synth_jpeg_media(media_dim: DataFrame, max_side: int = 16) -> DataFrame:
    """Attach REAL (small, deterministic) baseline-JPEG payloads to the
    image rows of the media_dim table: the same SHA-256 pixel stream as
    :func:`synth_png_media` (single channel), encoded through the
    pure-numpy T.81 codec (jsi_spark.ops.jpeg)."""
    from jsi_spark.ops import jpeg, png

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for ref in pdf["media_ref"]:
                w, h = png.synth_dims(ref, max_side)
                payload = jpeg.encode_jpeg(
                    png.synth_pixels(ref, w, h, channels=1), w, h)
                rows.append((ref, payload, w, h))
            out = pd.DataFrame(rows, columns=["media_ref", "payload",
                                              "width", "height"])
            out["media_kind"] = "image"
            out["duration_ms"] = pd.array([None] * len(out),
                                          dtype="Int32")
            yield out[["media_ref", "media_kind", "payload",
                       "width", "height", "duration_ms"]]

    ensure_py_files(media_dim.sparkSession)
    imgs = media_dim.filter(F.col("media_kind") == "image") \
        .select("media_ref")
    return imgs.mapInPandas(run, MEDIA_SCHEMA)


def synth_jpeg_color_media(media_dim: DataFrame, max_side: int = 16,
                           subsampling: str = "444") -> DataFrame:
    """Color variant of :func:`synth_jpeg_media`: the RGB SHA-256
    pixel stream encoded through the color T.81 path (4:4:4 by
    default; ``subsampling="420"`` exercises the box-averaged
    quarter-resolution chroma + 16x16 MCU layer)."""
    from jsi_spark.ops import jpeg, png

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for ref in pdf["media_ref"]:
                w, h = png.synth_dims(ref, max_side)
                payload = jpeg.encode_jpeg_color(
                    png.synth_pixels(ref, w, h, channels=3), w, h,
                    subsampling=subsampling)
                rows.append((ref, payload, w, h))
            out = pd.DataFrame(rows, columns=["media_ref", "payload",
                                              "width", "height"])
            out["media_kind"] = "image"
            out["duration_ms"] = pd.array([None] * len(out),
                                          dtype="Int32")
            yield out[["media_ref", "media_kind", "payload",
                       "width", "height", "duration_ms"]]

    ensure_py_files(media_dim.sparkSession)
    imgs = media_dim.filter(F.col("media_kind") == "image") \
        .select("media_ref")
    return imgs.mapInPandas(run, MEDIA_SCHEMA)


def synth_jpeg_progressive_media(media_dim: DataFrame,
                                 max_side: int = 16,
                                 subsampling: str = "420") -> DataFrame:
    """Progressive (SOF2) variant of :func:`synth_jpeg_color_media`:
    the RGB SHA-256 pixel stream encoded through the multi-scan
    spectral-selection + successive-approximation path (T.81 Annex G)
    — 4:2:0-subsampled by default, so the progressive entropy layer is
    gated against the SAME block-math golden as the baseline 4:2:0
    query (lossless coefficient coding ⇒ identical decoded pixels)."""
    from jsi_spark.ops import jpeg, png

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for ref in pdf["media_ref"]:
                w, h = png.synth_dims(ref, max_side)
                payload = jpeg.encode_jpeg_progressive(
                    png.synth_pixels(ref, w, h, channels=3), w, h,
                    channels=3, subsampling=subsampling)
                rows.append((ref, payload, w, h))
            out = pd.DataFrame(rows, columns=["media_ref", "payload",
                                              "width", "height"])
            out["media_kind"] = "image"
            out["duration_ms"] = pd.array([None] * len(out),
                                          dtype="Int32")
            yield out[["media_ref", "media_kind", "payload",
                       "width", "height", "duration_ms"]]

    ensure_py_files(media_dim.sparkSession)
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

    ensure_py_files(media_dim.sparkSession)
    auds = media_dim.filter(F.col("media_kind") == "audio") \
        .select("media_ref")
    return auds.mapInPandas(run, MEDIA_SCHEMA)


def synth_gif_media(media_dim: DataFrame, max_side: int = 12,
                    max_frames: int = 8) -> DataFrame:
    """Attach REAL (tiny, deterministic) animated-GIF payloads to the
    video rows of the media_dim table — the multi-frame counterpart of
    :func:`synth_png_media` (frame count, size, and per-frame delay all
    derived from the ref; encoded through the stdlib LZW codec)."""
    from jsi_spark.ops import gif

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for ref in pdf["media_ref"]:
                w, h, n_frames, delay = gif.synth_clip_params(
                    ref, max_side, max_frames)
                pal = gif.synth_gif_palette(ref)
                frames = [(delay,
                           gif.synth_frame_indexes(ref, i, w, h,
                                                   len(pal) // 3))
                          for i in range(n_frames)]
                payload = gif.encode_gif(frames, w, h, pal)
                rows.append((ref, payload, w, h, n_frames * delay))
            out = pd.DataFrame(rows, columns=["media_ref", "payload",
                                              "width", "height",
                                              "duration_ms"])
            out["media_kind"] = "video"
            yield out[["media_ref", "media_kind", "payload",
                       "width", "height", "duration_ms"]]

    ensure_py_files(media_dim.sparkSession)
    vids = media_dim.filter(F.col("media_kind") == "video") \
        .select("media_ref")
    return vids.mapInPandas(run, MEDIA_SCHEMA)


def synth_mp4_media(media_dim: DataFrame, max_side: int = 16,
                    max_frames: int = 5) -> DataFrame:
    """Attach REAL (tiny, deterministic) MJPEG-in-MP4 payloads to the
    video rows of the media_dim table — the ISO-BMFF counterpart of
    :func:`synth_gif_media`: frame count/size/delay derived from the
    ref (jsi_spark.ops.mp4.synth_mp4_params), each frame a 4:2:0
    baseline color JPEG of the SHA-256 pixel stream, muxed through the
    stdlib box writer."""
    from jsi_spark.ops import jpeg, mp4, png

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for ref in pdf["media_ref"]:
                w, h, n_frames, delay = mp4.synth_mp4_params(
                    ref, max_side, max_frames)
                frames = [(delay, jpeg.encode_jpeg_color(
                    png.synth_pixels(f"{ref}#f{i}", w, h, channels=3),
                    w, h, subsampling="420"))
                    for i in range(n_frames)]
                payload = mp4.encode_mp4(frames, w, h)
                rows.append((ref, payload, w, h, n_frames * delay))
            out = pd.DataFrame(rows, columns=["media_ref", "payload",
                                              "width", "height",
                                              "duration_ms"])
            out["media_kind"] = "video"
            yield out[["media_ref", "media_kind", "payload",
                       "width", "height", "duration_ms"]]

    ensure_py_files(media_dim.sparkSession)
    vids = media_dim.filter(F.col("media_kind") == "video") \
        .select("media_ref")
    return vids.mapInPandas(run, MEDIA_SCHEMA)


FRAME_SCHEMA = T.StructType([
    T.StructField("media_ref", T.StringType()),
    T.StructField("frame_index", T.IntegerType()),
    T.StructField("t_ms", T.IntegerType()),
    T.StructField("payload", T.BinaryType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
])


def sample_frames(media: DataFrame, every_ms: int = 100,
                  decode: str = "real") -> DataFrame:
    """Frame sampling over multi-frame payloads: decode each animated
    GIF (stdlib LZW) or MJPEG MP4 (ISO-BMFF sample-table demux +
    T.81 JPEG per frame), keep the frame on screen at t = 0, every_ms,
    2*every_ms, ... (gif.sample_ticks — pure integer math shared with
    the oracle), and re-encode each sampled frame as a standalone RGB
    PNG row. The output rows compose with extract_features /
    resize_images (decode="real"), i.e. video → frames → image
    pipeline on real codecs end-to-end.

    One exploded row per sampled frame; Arrow-batched mapInPandas, no
    per-row UDF boundary. At 100 TB the explode is the scale risk, not
    the codec: every_ms bounds output rows per clip to duration/every_ms,
    and the stage is embarrassingly parallel (no shuffle)."""
    if decode != "real":
        raise ValueError("sample_frames decodes actual frames; only "
                         "decode='real' is meaningful")
    from jsi_spark.ops import gif, jpeg, mp4, png

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for ref, payload in zip(pdf["media_ref"], pdf["payload"]):
                if gif.is_gif(payload):
                    w, h, pal, frames = gif.decode_gif(bytes(payload))
                    rgbs = None
                elif mp4.is_mp4(payload):
                    w, h, frames = mp4.decode_mp4(bytes(payload))
                    rgbs = {}
                else:
                    raise NotImplementedError(
                        "sample_frames covers animated GIF (stdlib "
                        "LZW) and MJPEG MP4 (ISO-BMFF demux); other "
                        "containers need ffmpeg — plug the demuxer "
                        "in here")
                delays = [d for d, _ in frames]
                starts = [0]
                for d in delays[:-1]:
                    starts.append(starts[-1] + d)
                for i in gif.sample_ticks(delays, every_ms):
                    if rgbs is None:            # GIF: indexed + palette
                        rgb = gif.expand_palette(frames[i][1], pal)
                    elif i in rgbs:             # MP4: decode each JPEG once
                        rgb = rgbs[i]
                    else:
                        fw, fh, ch, rgb = jpeg.decode_jpeg(frames[i][1])
                        if (fw, fh, ch) != (w, h, 3):
                            raise NotImplementedError(
                                "MJPEG sample dims/channels diverge "
                                "from the track header")
                        rgbs[i] = rgb
                    rows.append((ref, i, starts[i],
                                 png.encode_png(rgb, w, h, color_type=2),
                                 w, h))
            yield pd.DataFrame(rows, columns=["media_ref", "frame_index",
                                              "t_ms", "payload",
                                              "width", "height"])

    ensure_py_files(media.sparkSession)
    vids = media.select("media_ref", "payload")
    return vids.mapInPandas(run, FRAME_SCHEMA)


def _fake_decode_features(payload: bytes, dim: int = FEATURE_DIM):
    """Deterministic stand-in for a real decoder: dim floats derived
    from a cryptographic hash of the payload."""
    h = hashlib.sha256(payload or b"").digest()
    return [((h[i % 32] / 255.0) * 2 - 1) for i in range(dim)]


def _real_decode_features(payload: bytes):
    """Decode the payload with a stdlib codec, dispatched on magic
    bytes — PNG (zlib scanlines), 16-bit PCM WAV (wave module), and
    animated GIF (LZW; first-frame clip stats) — and compute 16
    statistics features. Per-payload Python is the
    nature of codecs (PIL is, too) — the batching above this stays
    Arrow."""
    from jsi_spark.ops import gif, jpeg, mp4, png, wav
    if mp4.is_mp4(payload):
        # clip-level features: pixel stats of the first MJPEG sample
        # (frame-granular work goes through sample_frames, as for GIF)
        w, h, frames = mp4.decode_mp4(bytes(payload))
        fw, fh, _ch, rgb = jpeg.decode_jpeg(frames[0][1])
        return [float(x) for x in png.pixel_stats(rgb, fw, fh)]
    if wav.is_wav(payload):
        rate, ch, samples = wav.decode_wav(bytes(payload))
        return [float(x) for x in wav.audio_stats(samples, rate, ch)]
    if jpeg.is_jpeg(payload):
        w, h, ch, px = jpeg.decode_jpeg(bytes(payload))
        if ch == 1:                 # promote gray to RGB for uniform stats
            rgb = bytearray(w * h * 3)
            for p in range(w * h):
                rgb[p * 3:p * 3 + 3] = px[p:p + 1] * 3
            px = bytes(rgb)
        return [float(x) for x in png.pixel_stats(px, w, h)]
    if gif.is_gif(payload):
        # clip-level features: pixel stats of the first frame (frame-
        # granular work goes through sample_frames, which explodes to
        # per-frame PNG rows and composes with this same path)
        w, h, pal, frames = gif.decode_gif(bytes(payload))
        rgb = gif.expand_palette(frames[0][1], pal)
        return [float(x) for x in png.pixel_stats(rgb, w, h)]
    if not png.is_png(payload):
        raise NotImplementedError(
            "decode='real' covers PNG (stdlib zlib), PCM WAV (stdlib "
            "wave), animated GIF (stdlib LZW), JPEG "
            "(numpy T.81: baseline gray/color incl. 4:2:0 subsampling "
            "+ progressive SOF2), and MJPEG MP4 (ISO-BMFF demux); "
            "other formats need PIL/librosa/ffmpeg — plug the codec "
            "in here")
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

    ensure_py_files(media.sparkSession)
    return media.mapInPandas(run, FEATURES_SCHEMA)


def resize_images(media: DataFrame, max_side: int = 256,
                  decode: str = "fake") -> DataFrame:
    """Aspect-preserving shrink-only resize.

    ``decode="fake"`` (default): metadata-only — target dimensions as
    pure Column math, payload untouched (the planning/bookkeeping half
    of the operator, format-agnostic). ``decode="real"``: PNG and
    baseline-JPEG payloads are decoded, nearest-neighbor resampled,
    and re-encoded as PNG (the lossless choice — a resize stage must
    not stack a second generation of quantization loss on lossy
    inputs); rows come back in MEDIA_SCHEMA with the new dimensions.
    Other payloads raise NotImplementedError at the codec plug point."""
    if decode == "real":
        from jsi_spark.ops import jpeg, png

        def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                rows = []
                for ref, kind, payload in zip(pdf["media_ref"],
                                              pdf["media_kind"],
                                              pdf["payload"]):
                    if jpeg.is_jpeg(payload):
                        w, h, ch, px = jpeg.decode_jpeg(bytes(payload))
                    elif png.is_png(payload):
                        w, h, ch, px = png.decode_png(bytes(payload))
                    else:
                        raise NotImplementedError(
                            "resize decode='real' covers PNG and "
                            "baseline JPEG; other formats "
                            "need PIL — plug the codec in here")
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

        ensure_py_files(media.sparkSession)
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
