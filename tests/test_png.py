"""Pure-stdlib PNG codec (jsi_spark.ops.png) + the real decode path.

The codec is the one real-format kernel behind
``extract_features(decode="real")``; everything here runs without Spark
except the final mapInPandas integration test.
"""

import struct
import zlib

import pytest

from jsi_spark.ops.multimodal import _real_decode_features
from jsi_spark.ops.png import (
    PngFormatError, decode_png, encode_png, is_png, pixel_stats,
    synth_dims, synth_pixels,
)

COLOR_TYPES = {0: 1, 2: 3, 4: 2, 6: 4}


@pytest.mark.parametrize("color_type", sorted(COLOR_TYPES))
@pytest.mark.parametrize("filter_type", range(5))
def test_round_trip_every_filter_and_color_type(color_type, filter_type):
    ch = COLOR_TYPES[color_type]
    w, h = 9, 4
    px = synth_pixels(f"rt{color_type}.{filter_type}", w, h, channels=ch)
    data = encode_png(px, w, h, color_type=color_type,
                      filter_type=filter_type)
    assert is_png(data)
    assert decode_png(data) == (w, h, ch, px)


def test_single_pixel_and_single_row():
    assert decode_png(encode_png(b"\x07\x08\x09", 1, 1)) == \
        (1, 1, 3, b"\x07\x08\x09")
    px = bytes(range(12))
    assert decode_png(encode_png(px, 4, 1, filter_type=4))[3] == px


def test_bad_signature_rejected():
    with pytest.raises(PngFormatError, match="signature"):
        decode_png(b"GIF89a not a png")


def test_crc_verified():
    data = bytearray(encode_png(synth_pixels("crc", 4, 4), 4, 4))
    data[40] ^= 0xFF  # inside IDAT body
    with pytest.raises(PngFormatError, match="CRC"):
        decode_png(bytes(data))


def _ihdr_png(depth=8, color_type=2, interlace=0):
    sig = b"\x89PNG\r\n\x1a\n"
    ihdr = struct.pack(">IIBBBBB", 2, 2, depth, color_type, 0, 0,
                       interlace)
    body = struct.pack(">I", len(ihdr)) + b"IHDR" + ihdr + struct.pack(
        ">I", zlib.crc32(b"IHDR" + ihdr) & 0xFFFFFFFF)
    return sig + body


def test_out_of_subset_features_raise_named_errors():
    with pytest.raises(PngFormatError, match="bit depth"):
        decode_png(_ihdr_png(depth=16))
    with pytest.raises(PngFormatError, match="color type"):
        decode_png(_ihdr_png(color_type=3))  # paletted
    with pytest.raises(PngFormatError, match="interlace"):
        decode_png(_ihdr_png(interlace=1))


def test_pixel_stats_definition():
    # 2x1 RGB: black and white → means 0.5, variance 0.25, lum bins at
    # the extremes, aspect 2.0
    st = pixel_stats(b"\x00\x00\x00\xff\xff\xff", 2, 1)
    assert st[0] == st[1] == st[2] == pytest.approx(0.5)
    assert st[3] == st[4] == st[5] == pytest.approx(0.25)
    assert st[6] == 0.5 and st[13] == 0.5          # lum 0 → bin0, 765 → bin7
    assert sum(st[6:14]) == pytest.approx(1.0)
    assert st[14] == 2.0 and st[15] == 1.0
    with pytest.raises(PngFormatError):
        pixel_stats(b"\x00\x00", 2, 1, channels=1)


def test_synth_corpus_is_deterministic():
    assert synth_dims("m0") == synth_dims("m0")
    assert synth_pixels("m0", 5, 5) == synth_pixels("m0", 5, 5)
    assert synth_pixels("m0", 5, 5) != synth_pixels("m1", 5, 5)
    w, h = synth_dims("m0")
    assert 4 <= w <= 16 and 4 <= h <= 16


def test_real_decode_features_promotes_to_rgb():
    # grayscale and RGBA payloads produce the same 16-feature shape;
    # gray value v promotes to (v,v,v) so mean_r == mean_g == mean_b
    g = encode_png(bytes([10, 200, 30, 250]), 2, 2, color_type=0)
    fg = _real_decode_features(g)
    assert len(fg) == 16 and fg[0] == fg[1] == fg[2]
    rgba = encode_png(synth_pixels("a", 2, 2, channels=4), 2, 2,
                      color_type=6)
    assert len(_real_decode_features(rgba)) == 16


def test_real_decode_rejects_unknown_format():
    # every named format (PNG/JPEG/GIF/WAV/MP4) now dispatches to its
    # own codec; a payload matching none of them is the remaining
    # named plug point
    with pytest.raises(NotImplementedError, match="PNG"):
        _real_decode_features(b"\x00\x01free-form bytes, no magic")


def test_real_decode_malformed_mp4_raises():
    # an ftyp magic with a box size past EOF is a corrupt file, not an
    # unknown format — the MP4 codec reports it as such
    from jsi_spark.ops.mp4 import Mp4FormatError
    with pytest.raises(Mp4FormatError):
        _real_decode_features(b"\x00\x00\x00\x18ftypmp42 video-ish")


def test_extract_features_real_distributed(spark):
    """End-to-end through mapInPandas: encode on executors, decode on
    executors, stats match the codec-free golden computation."""
    from jsi_spark.ops.multimodal import extract_features, synth_png_media
    from jsi_spark.session import ensure_py_files
    ensure_py_files(spark)
    dim = spark.createDataFrame(
        [(f"m{i}", "image") for i in range(6)],
        "media_ref string, media_kind string")
    media = synth_png_media(dim)
    out = {r["media_ref"]: r["features"]
           for r in extract_features(media, decode="real").collect()}
    assert len(out) == 6
    for ref, feats in out.items():
        w, h = synth_dims(ref)
        golden = pixel_stats(synth_pixels(ref, w, h), w, h)
        assert feats == pytest.approx(golden, rel=1e-6)


def test_target_dims_shrink_only():
    from jsi_spark.ops.png import target_dims
    assert target_dims(100, 50, 10) == (10, 5)
    assert target_dims(5, 5, 10) == (5, 5), "never upscales"
    assert target_dims(3, 9, 4) == (2, 4), "ceil keeps >= 1"


def test_resample_nearest_kernel():
    from jsi_spark.ops.png import resample_nearest
    # 2x2 RGB quadrants down to 1x1 picks the top-left source pixel
    px = bytes([1, 1, 1, 2, 2, 2, 3, 3, 3, 4, 4, 4])
    assert resample_nearest(px, 2, 2, 1, 1) == bytes([1, 1, 1])
    # identity resample is a no-op
    assert resample_nearest(px, 2, 2, 2, 2) == px
    # 4x1 gray -> 2x1 picks columns 0 and 2
    g = bytes([10, 20, 30, 40])
    assert resample_nearest(g, 4, 1, 2, 1, channels=1) == bytes([10, 30])


def test_resize_images_real_distributed(spark):
    from jsi_spark.ops.multimodal import resize_images, synth_png_media
    from jsi_spark.ops.png import (
        decode_png, resample_nearest, synth_dims, synth_pixels,
        target_dims,
    )
    from jsi_spark.session import ensure_py_files
    ensure_py_files(spark)
    dim = spark.createDataFrame(
        [(f"m{i}", "image") for i in range(4)],
        "media_ref string, media_kind string")
    out = resize_images(synth_png_media(dim), max_side=8,
                        decode="real").collect()
    assert len(out) == 4
    for r in out:
        w, h = synth_dims(r.media_ref)
        tw, th = target_dims(w, h, 8)
        assert (r.width, r.height) == (tw, th)
        golden = resample_nearest(synth_pixels(r.media_ref, w, h),
                                  w, h, tw, th)
        assert decode_png(bytes(r.payload)) == (tw, th, 3, golden)
