"""Pure-numpy baseline JPEG codec (jsi_spark.ops.jpeg) + the real
decode path.

The oracle-style check: JPEG is lossy, so correctness is defined as
``decode(encode(x)) == reference_roundtrip(x)`` BIT-FOR-BIT — the
reference is the pure block math (DCT → quantize → dequantize → IDCT)
with no marker/Huffman/byte code, so any defect in the entropy layer
(zigzag, DC prediction, canonical Huffman, 0xFF stuffing, padding)
diverges. Everything here runs without Spark except the final
mapInPandas integration test.
"""

import numpy as np
import pytest

from jsi_spark.ops.jpeg import (
    JpegFormatError, decode_jpeg, encode_jpeg, is_jpeg,
    reference_roundtrip,
)
from jsi_spark.ops.multimodal import _real_decode_features
from jsi_spark.ops.png import pixel_stats, synth_dims, synth_pixels


def _gray(ref: str, w: int, h: int) -> np.ndarray:
    return np.frombuffer(synth_pixels(ref, w, h, channels=1),
                         dtype=np.uint8).reshape(h, w)


@pytest.mark.parametrize("w,h", [(8, 8), (16, 16), (13, 9), (5, 7),
                                 (8, 24), (31, 17), (1, 1), (9, 1)])
def test_roundtrip_equals_reference(w, h):
    img = _gray(f"jp{w}x{h}", w, h)
    payload = encode_jpeg(img.tobytes(), w, h)
    assert is_jpeg(payload)
    dw, dh, ch, dec = decode_jpeg(payload)
    assert (dw, dh, ch) == (w, h, 1)
    got = np.frombuffer(dec, dtype=np.uint8).reshape(h, w)
    assert np.array_equal(got, reference_roundtrip(img)), \
        "entropy layer diverged from the block-math reference"


def test_quantization_error_bounded():
    """Sanity: the lossy error vs the SOURCE is quantization-sized,
    not garbage (SHA-noise images are the worst case for JPEG)."""
    img = _gray("jq", 16, 16)
    _, _, _, dec = decode_jpeg(encode_jpeg(img.tobytes(), 16, 16))
    err = np.abs(np.frombuffer(dec, np.uint8).astype(int)
                 - img.reshape(-1).astype(int))
    assert err.mean() < 30
    # smooth content survives nearly exactly
    smooth = np.tile(np.arange(16, dtype=np.uint8) * 8, (16, 1))
    _, _, _, dec2 = decode_jpeg(encode_jpeg(smooth.tobytes(), 16, 16))
    err2 = np.abs(np.frombuffer(dec2, np.uint8).astype(int)
                  - smooth.reshape(-1).astype(int))
    assert err2.mean() < 4


def test_byte_stuffing_roundtrip():
    """A checkerboard provably emits 0xFF bytes into the entropy
    stream; the stuffed 0xFF 0x00 must survive the round trip."""
    img = (np.indices((16, 16)).sum(0) % 2 * 255).astype(np.uint8)
    payload = encode_jpeg(img.tobytes(), 16, 16)
    scan = payload[payload.find(b"\xff\xda"):]
    assert b"\xff\x00" in scan, "test premise: stuffing occurs"
    _, _, _, dec = decode_jpeg(payload)
    got = np.frombuffer(dec, np.uint8).reshape(16, 16)
    assert np.array_equal(got, reference_roundtrip(img))


def test_dc_prediction_across_blocks():
    """A wide image (many blocks) with a strong DC ramp exercises DC
    diff coding with large positive and negative categories."""
    img = np.repeat(np.arange(0, 256, 8, dtype=np.uint8)[None, :],
                    8, axis=0)
    img = np.repeat(img, 8, axis=1)  # 8 x 256: 32 blocks, DC ramp
    payload = encode_jpeg(img.tobytes(), 256, 8)
    _, _, _, dec = decode_jpeg(payload)
    got = np.frombuffer(dec, np.uint8).reshape(8, 256)
    assert np.array_equal(got, reference_roundtrip(img))


def test_malformed_rejected():
    with pytest.raises(JpegFormatError, match="signature"):
        decode_jpeg(b"not a jpeg")
    with pytest.raises(JpegFormatError):
        decode_jpeg(b"\xff\xd8\xff\xd9")  # no SOF/SOS
    good = encode_jpeg(synth_pixels("trunc", 8, 8, 1), 8, 8)
    with pytest.raises(JpegFormatError):
        decode_jpeg(good[:40])
    # unsupported SOF flavors declared out of subset by NAME
    sof1 = bytearray(good)
    sof1[sof1.find(b"\xff\xc0") + 1] = 0xC1    # extended sequential
    with pytest.raises(JpegFormatError, match="SOF1"):
        decode_jpeg(bytes(sof1))
    # a baseline stream relabeled SOF2 is structurally invalid as
    # progressive (its single scan covers Ss=0..Se=63) — named error,
    # not garbage output
    sof2 = bytearray(good)
    sof2[sof2.find(b"\xff\xc0") + 1] = 0xC2
    with pytest.raises(JpegFormatError):
        decode_jpeg(bytes(sof2))


def test_tables_read_from_stream_not_assumed():
    """Halving the DQT table in the byte stream must change the decode
    (the decoder honors the stream's table, like any real reader)."""
    img = _gray("jt", 16, 16)
    payload = bytearray(encode_jpeg(img.tobytes(), 16, 16))
    q = payload.find(b"\xff\xdb") + 5   # FFDB len(2) PqTq, then 64 vals
    orig = decode_jpeg(bytes(payload))[3]
    payload[q:q + 64] = bytes(max(1, b // 2)
                              for b in payload[q:q + 64])
    assert decode_jpeg(bytes(payload))[3] != orig


def test_real_decode_features_dispatches_jpeg():
    w, h = synth_dims("mj")
    payload = encode_jpeg(synth_pixels("mj", w, h, channels=1), w, h)
    feats = _real_decode_features(payload)
    assert len(feats) == 16
    # gray promoted to RGB: the three channel means are identical
    assert feats[0] == feats[1] == feats[2]


def _golden_jpeg_stats(ref: str, max_side: int = 16):
    """Codec-free golden: stats over the pure-math reference pixels."""
    w, h = synth_dims(ref, max_side)
    exp = reference_roundtrip(_gray(ref, w, h))
    rgb = np.repeat(exp.reshape(-1, 1), 3, axis=1).tobytes()
    return pixel_stats(rgb, w, h)


def test_extract_features_real_distributed(spark):
    """End-to-end through mapInPandas: encode on executors, decode on
    executors, stats match the block-math reference golden."""
    from jsi_spark.ops.multimodal import extract_features, synth_jpeg_media
    from jsi_spark.session import ensure_py_files
    ensure_py_files(spark)
    dim = spark.createDataFrame(
        [(f"m{i}", "image") for i in range(6)],
        "media_ref string, media_kind string")
    media = synth_jpeg_media(dim)
    out = {r["media_ref"]: r["features"]
           for r in extract_features(media, decode="real").collect()}
    assert len(out) == 6
    for ref, feats in out.items():
        assert feats == pytest.approx(_golden_jpeg_stats(ref), rel=1e-6)


def test_resize_images_real_jpeg_to_png(spark):
    """JPEG in → decoded → resampled → re-encoded LOSSLESSLY as PNG
    (a resize stage must not stack a second quantization generation);
    pixels equal the pure-math reference resampled the same way."""
    from jsi_spark.ops.multimodal import resize_images, synth_jpeg_media
    from jsi_spark.ops.png import (
        decode_png, resample_nearest, target_dims,
    )
    from jsi_spark.session import ensure_py_files
    ensure_py_files(spark)
    dim = spark.createDataFrame(
        [(f"m{i}", "image") for i in range(4)],
        "media_ref string, media_kind string")
    out = resize_images(synth_jpeg_media(dim), max_side=8,
                        decode="real").collect()
    assert len(out) == 4
    for r in out:
        w, h = synth_dims(r["media_ref"])
        exp = reference_roundtrip(_gray(r["media_ref"], w, h))
        tw, th = target_dims(w, h, 8)
        assert (r["width"], r["height"]) == (tw, th)
        dw, dh, ch, px = decode_png(bytes(r["payload"]))
        assert (dw, dh, ch) == (tw, th, 1)
        assert px == resample_nearest(exp.tobytes(), w, h, tw, th,
                                      channels=1)


def _rgb(ref: str, w: int, h: int) -> np.ndarray:
    return np.frombuffer(synth_pixels(ref, w, h, channels=3),
                         dtype=np.uint8).reshape(h, w, 3)


@pytest.mark.parametrize("w,h", [(8, 8), (16, 16), (13, 9), (5, 7),
                                 (1, 1)])
def test_color_roundtrip_equals_reference(w, h):
    """4:4:4 color: three interleaved components, two quant tables,
    four Huffman tables, independent DC predictors — must match the
    pure-math color reference bit-for-bit."""
    from jsi_spark.ops.jpeg import (
        encode_jpeg_color, reference_roundtrip_color,
    )
    img = _rgb(f"jc{w}x{h}", w, h)
    payload = encode_jpeg_color(img.tobytes(), w, h)
    dw, dh, ch, dec = decode_jpeg(payload)
    assert (dw, dh, ch) == (w, h, 3)
    got = np.frombuffer(dec, dtype=np.uint8).reshape(h, w, 3)
    assert np.array_equal(got, reference_roundtrip_color(img))


def test_color_constant_image_stays_flat():
    """A flat color stays perfectly flat through the lossy pipeline
    (only DC terms survive), shifted at most by one DC quant step
    propagated through the color transform (luma step 16, chroma 17 →
    worst case ~|1.402|*8.5 + 8 ≈ 20 in a channel)."""
    from jsi_spark.ops.jpeg import encode_jpeg_color
    img = np.empty((16, 16, 3), dtype=np.uint8)
    img[:] = (200, 100, 50)
    _, _, _, dec = decode_jpeg(encode_jpeg_color(img.tobytes(), 16, 16))
    got = np.frombuffer(dec, np.uint8).reshape(16, 16, 3)
    assert len(np.unique(got.reshape(-1, 3), axis=0)) == 1, "not flat"
    assert np.abs(got.astype(int) - img.astype(int)).max() <= 21


def test_color_features_dispatch():
    """extract_features' magic-byte dispatch handles color JPEG: three
    distinct channel means (no gray promotion)."""
    from jsi_spark.ops.jpeg import encode_jpeg_color
    img = _rgb("mjc", 12, 10)
    feats = _real_decode_features(encode_jpeg_color(img.tobytes(), 12, 10))
    assert len(feats) == 16
    assert not (feats[0] == feats[1] == feats[2])


def test_color_resize_to_png():
    """resize path: color JPEG in → RGB PNG out, pixels equal the
    color reference resampled."""
    from jsi_spark.ops.jpeg import (
        encode_jpeg_color, reference_roundtrip_color,
    )
    from jsi_spark.ops.png import decode_png, resample_nearest
    img = _rgb("rjc", 16, 12)
    payload = encode_jpeg_color(img.tobytes(), 16, 12)
    w, h, ch, px = decode_jpeg(payload)
    exp = reference_roundtrip_color(img)
    assert px == exp.tobytes()
    # the resample+re-encode chain used by resize_images(decode='real')
    small = resample_nearest(px, 16, 12, 8, 6, channels=3)
    from jsi_spark.ops.png import encode_png
    assert decode_png(encode_png(small, 8, 6, color_type=2))[3] == small


@pytest.mark.parametrize("sub", ["420", "422", "440"])
@pytest.mark.parametrize("w,h", [(16, 16), (13, 9), (5, 7), (1, 1),
                                 (33, 2), (17, 31)])
def test_subsampled_roundtrip_equals_reference(w, h, sub):
    """Chroma-subsampled color: multi-block MCUs (T.81 A.2.3), box-
    averaged chroma downsample at encode, nearest-replication upsample
    at decode — must match the pure-math subsampled reference
    bit-for-bit (which gates the generalized sampling-factor MCU
    interleave AND the shared resample kernels)."""
    from jsi_spark.ops.jpeg import (
        encode_jpeg_color, reference_roundtrip_subsampled,
    )
    img = _rgb(f"js{sub}{w}x{h}", w, h)
    payload = encode_jpeg_color(img.tobytes(), w, h, subsampling=sub)
    dw, dh, ch, dec = decode_jpeg(payload)
    assert (dw, dh, ch) == (w, h, 3)
    got = np.frombuffer(dec, dtype=np.uint8).reshape(h, w, 3)
    assert np.array_equal(got, reference_roundtrip_subsampled(img, sub))


def test_420_sof_declares_luma_2x2():
    """The 4:2:0 stream declares Y as 2x2-sampled and chroma 1x1 in
    SOF0 (interoperability: other decoders read these factors)."""
    from jsi_spark.ops.jpeg import encode_jpeg_color
    img = _rgb("jsof", 16, 16)
    payload = encode_jpeg_color(img.tobytes(), 16, 16, subsampling="420")
    sof = payload.find(b"\xff\xc0")
    assert sof > 0
    comp = payload[sof + 10:sof + 19]         # 3 x (id, hv, tq)
    assert comp[1] == 0x22 and comp[4] == 0x11 and comp[7] == 0x11


def test_420_flat_image_stays_flat():
    """Chroma subsampling of a flat color must not introduce texture:
    box average of a constant is the constant."""
    from jsi_spark.ops.jpeg import encode_jpeg_color
    img = np.empty((16, 16, 3), dtype=np.uint8)
    img[:] = (200, 100, 50)
    _, _, _, dec = decode_jpeg(
        encode_jpeg_color(img.tobytes(), 16, 16, subsampling="420"))
    got = np.frombuffer(dec, np.uint8).reshape(16, 16, 3)
    assert len(np.unique(got.reshape(-1, 3), axis=0)) == 1, "not flat"
    assert np.abs(got.astype(int) - img.astype(int)).max() <= 21


def test_420_features_dispatch():
    """extract_features' dispatch decodes 4:2:0 payloads (the dominant
    real-world JPEG form) without a format hint."""
    from jsi_spark.ops.jpeg import encode_jpeg_color
    img = _rgb("mj420", 12, 10)
    feats = _real_decode_features(
        encode_jpeg_color(img.tobytes(), 12, 10, subsampling="420"))
    assert len(feats) == 16
    assert not (feats[0] == feats[1] == feats[2])


def test_unsupported_subsampling_rejected():
    from jsi_spark.ops.jpeg import encode_jpeg_color
    img = _rgb("jbad", 8, 8)
    with pytest.raises(JpegFormatError, match="subsampling"):
        encode_jpeg_color(img.tobytes(), 8, 8, subsampling="411")
    # decoder: sampling factors outside {1,2} are a named error
    payload = bytearray(encode_jpeg_color(img.tobytes(), 8, 8,
                                          subsampling="420"))
    sof = payload.find(b"\xff\xc0")
    payload[sof + 11] = 0x41                  # luma 4x1
    with pytest.raises(JpegFormatError, match="sampling factors"):
        decode_jpeg(bytes(payload))


# -- progressive (SOF2) -------------------------------------------------------

@pytest.mark.parametrize("w,h", [(8, 8), (16, 16), (13, 9), (5, 7),
                                 (8, 24), (31, 17), (1, 1), (9, 1),
                                 (64, 48)])
def test_progressive_gray_equals_reference(w, h):
    """Progressive entropy coding is lossless over the quantized
    coefficients, so the multi-scan round trip must bit-match the SAME
    block-math reference as baseline — gating spectral selection, EOB
    runs, and all four successive-approximation scan kinds."""
    from jsi_spark.ops.jpeg import encode_jpeg_progressive
    img = _gray(f"pg{w}x{h}", w, h)
    payload = encode_jpeg_progressive(img.tobytes(), w, h, channels=1)
    assert is_jpeg(payload)
    assert b"\xff\xc2" in payload             # really SOF2
    dw, dh, ch, dec = decode_jpeg(payload)
    assert (dw, dh, ch) == (w, h, 1)
    got = np.frombuffer(dec, dtype=np.uint8).reshape(h, w)
    assert np.array_equal(got, reference_roundtrip(img))


@pytest.mark.parametrize("sub", ["444", "420", "422", "440"])
@pytest.mark.parametrize("w,h", [(16, 16), (13, 9), (1, 1), (17, 31)])
def test_progressive_color_equals_reference(w, h, sub):
    """Color progressive: interleaved DC scans over subsampled MCU
    geometry + per-component non-interleaved AC band scans must land on
    the same pixels as the baseline subsampled reference."""
    from jsi_spark.ops.jpeg import (
        encode_jpeg_progressive, reference_roundtrip_color,
        reference_roundtrip_subsampled,
    )
    img = _rgb(f"pp{sub}{w}x{h}", w, h)
    payload = encode_jpeg_progressive(img.tobytes(), w, h, channels=3,
                                      subsampling=sub)
    dw, dh, ch, dec = decode_jpeg(payload)
    assert (dw, dh, ch) == (w, h, 3)
    got = np.frombuffer(dec, dtype=np.uint8).reshape(h, w, 3)
    exp = reference_roundtrip_color(img) if sub == "444" \
        else reference_roundtrip_subsampled(img, sub)
    assert np.array_equal(got, exp)


def test_progressive_decode_equals_baseline_decode():
    """Baseline and progressive encode the same quantized coefficients
    → identical decoded pixels, byte for byte (gray and 4:2:0 color)."""
    from jsi_spark.ops.jpeg import (
        encode_jpeg_color, encode_jpeg_progressive,
    )
    g = _gray("pbg", 23, 17)
    assert decode_jpeg(encode_jpeg(g.tobytes(), 23, 17)) == \
        decode_jpeg(encode_jpeg_progressive(g.tobytes(), 23, 17,
                                            channels=1))
    c = _rgb("pbc", 23, 17)
    assert decode_jpeg(encode_jpeg_color(c.tobytes(), 23, 17,
                                         subsampling="420")) == \
        decode_jpeg(encode_jpeg_progressive(c.tobytes(), 23, 17,
                                            channels=3,
                                            subsampling="420"))


def test_progressive_long_eob_runs():
    """Smooth/flat content pushes whole AC bands to zero across many
    consecutive blocks — EOBn symbols with n > 1 and extension bits
    must round-trip (the code path Annex-K baseline tables never
    exercise)."""
    from jsi_spark.ops.jpeg import encode_jpeg_progressive
    img = np.full((80, 200), 127, np.uint8)   # 250 blocks, all-zero AC
    payload = encode_jpeg_progressive(img.tobytes(), 200, 80,
                                      channels=1)
    _, _, _, dec = decode_jpeg(payload)
    assert np.array_equal(np.frombuffer(dec, np.uint8).reshape(80, 200),
                          reference_roundtrip(img))
    smooth = (np.add.outer(np.arange(96), np.arange(128)) % 256) \
        .astype(np.uint8)
    payload = encode_jpeg_progressive(smooth.tobytes(), 128, 96,
                                      channels=1)
    _, _, _, dec = decode_jpeg(payload)
    assert np.array_equal(np.frombuffer(dec, np.uint8).reshape(96, 128),
                          reference_roundtrip(smooth))


def test_progressive_errors():
    from jsi_spark.ops.jpeg import encode_jpeg_progressive
    img = _gray("pe", 16, 16)
    good = encode_jpeg_progressive(img.tobytes(), 16, 16, channels=1)
    with pytest.raises(JpegFormatError):      # truncated entropy data
        decode_jpeg(good[:-40])
    with pytest.raises(JpegFormatError, match="channels"):
        encode_jpeg_progressive(img.tobytes(), 16, 16, channels=2)
    with pytest.raises(JpegFormatError, match="subsampling"):
        encode_jpeg_progressive(_rgb("pe3", 8, 8).tobytes(), 8, 8,
                                channels=3, subsampling="411")
    # DRI before the scans is a named error in the progressive path too
    bad = bytearray(good)
    sos = bad.find(b"\xff\xda")
    bad[sos:sos] = b"\xff\xdd\x00\x04\x00\x08"
    with pytest.raises(JpegFormatError, match="restart"):
        decode_jpeg(bytes(bad))


def test_progressive_features_dispatch():
    """extract_features' magic-byte dispatch decodes progressive
    payloads transparently (same FFD8 signature, SOF2 inside)."""
    from jsi_spark.ops.jpeg import (
        encode_jpeg_progressive, reference_roundtrip_subsampled,
    )
    img = _rgb("mjp", 12, 10)
    payload = encode_jpeg_progressive(img.tobytes(), 12, 10, channels=3,
                                      subsampling="420")
    feats = _real_decode_features(payload)
    exp = reference_roundtrip_subsampled(img, "420")
    assert feats == pytest.approx(
        [float(np.float32(x)) for x in pixel_stats(exp.tobytes(),
                                                   12, 10)], rel=1e-6)


def test_progressive_media_distributed(spark):
    """End-to-end through mapInPandas: progressive encode on executors,
    multi-scan decode on executors, stats match the 4:2:0 block-math
    golden (the same golden the baseline 420 query uses — pinning
    baseline ≡ progressive at the pixel level, distributed)."""
    from jsi_spark.ops.jpeg import reference_roundtrip_subsampled
    from jsi_spark.ops.multimodal import (
        extract_features, synth_jpeg_progressive_media,
    )
    from jsi_spark.session import ensure_py_files
    ensure_py_files(spark)
    dim = spark.createDataFrame(
        [(f"m{i}", "image") for i in range(6)],
        "media_ref string, media_kind string")
    media = synth_jpeg_progressive_media(dim)
    out = {r["media_ref"]: r["features"]
           for r in extract_features(media, decode="real").collect()}
    assert len(out) == 6
    for ref, feats in out.items():
        w, h = synth_dims(ref)
        exp = reference_roundtrip_subsampled(_rgb(ref, w, h), "420")
        assert feats == pytest.approx(pixel_stats(exp.tobytes(), w, h),
                                      rel=1e-6)
