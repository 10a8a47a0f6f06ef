"""MJPEG-in-MP4 container (jsi_spark.ops.mp4) + the video frame path.

The ISO-BMFF layer under test is the CONTAINER: box framing, the
moov/trak/mdia/minf/stbl walk, and the stts/stsc/stsz/stco sample
tables that map samples to byte ranges. Sample bytes must round-trip
bit-exactly; decoded frame pixels are then gated against the pure
block-math JPEG reference, the same independence argument as
test_jpeg. Everything runs without Spark except the final mapInPandas
integration tests.
"""

import struct

import numpy as np
import pytest

from jsi_spark.ops.jpeg import (
    encode_jpeg_color, reference_roundtrip_subsampled,
)
from jsi_spark.ops.mp4 import (
    Mp4FormatError, decode_mp4, encode_mp4, is_mp4, synth_mp4_params,
)
from jsi_spark.ops.png import pixel_stats, synth_pixels


def _clip(ref: str, max_side: int = 16, max_frames: int = 5):
    w, h, n, delay = synth_mp4_params(ref, max_side, max_frames)
    frames = [(delay, encode_jpeg_color(
        synth_pixels(f"{ref}#f{i}", w, h, channels=3), w, h,
        subsampling="420")) for i in range(n)]
    return w, h, frames


def test_roundtrip_samples_bit_exact():
    w, h, frames = _clip("v0")
    payload = encode_mp4(frames, w, h)
    assert is_mp4(payload)
    dw, dh, out = decode_mp4(payload)
    assert (dw, dh) == (w, h)
    assert out == frames          # durations in ms AND bytes identical


def test_decoded_frames_match_block_math_reference():
    w, h, frames = _clip("v1")
    from jsi_spark.ops.jpeg import decode_jpeg
    _, _, out = decode_mp4(encode_mp4(frames, w, h))
    for i, (_d, sample) in enumerate(out):
        rgb = np.frombuffer(synth_pixels(f"v1#f{i}", w, h, channels=3),
                            dtype=np.uint8).reshape(h, w, 3)
        assert decode_jpeg(sample)[3] == \
            reference_roundtrip_subsampled(rgb, "420").tobytes()


def test_varied_durations_round_length_encode():
    """Non-uniform durations exercise multi-run stts."""
    w, h = 8, 8
    jpg = encode_jpeg_color(synth_pixels("vd", w, h, channels=3), w, h)
    frames = [(100, jpg), (100, jpg), (40, jpg), (250, jpg), (40, jpg)]
    _, _, out = decode_mp4(encode_mp4(frames, w, h))
    assert [d for d, _ in out] == [100, 100, 40, 250, 40]
    # stts really is run-length coded: 4 runs for 5 samples
    payload = encode_mp4(frames, w, h)
    i = payload.find(b"stts")
    (nruns,) = struct.unpack(">I", payload[i + 8:i + 12])
    assert nruns == 4


def test_timescale_conversion():
    """A 90 kHz timescale (the common video clock) must come back in
    exact milliseconds."""
    w, h = 8, 8
    jpg = encode_jpeg_color(synth_pixels("vt", w, h, channels=3), w, h)
    payload = encode_mp4([(40, jpg), (40, jpg)], w, h, timescale=90000)
    i = payload.find(b"mdhd")
    # mdhd: fourcc, ver/flags(4), ctime(4), mtime(4), timescale, duration
    ts, dur = struct.unpack(">II", payload[i + 16:i + 24])
    assert ts == 90000
    assert dur == 80 * 90           # 2 x 40 ms in 90 kHz units
    _, _, out = decode_mp4(payload)
    assert [d for d, _ in out] == [40, 40]


def test_multi_chunk_stsc_walk():
    """The demuxer must follow the general stsc/stco mapping, not
    assume the muxer's single chunk: hand-build a two-chunk layout
    (2 + 1 samples) and check the byte ranges still resolve."""
    w, h, frames = _clip("v2")
    frames = frames[:3] if len(frames) >= 3 else \
        frames + frames[:3 - len(frames)]
    payload = bytearray(encode_mp4(frames, w, h))
    # rewrite stsc: 2 entries — chunk 1 holds 2 samples, chunk 2 holds 1
    i = payload.find(b"stsc")
    old = 4 + 4 + 4 + 12            # type+ver/flags+count+one entry
    new_body = (b"\x00\x00\x00\x00" + struct.pack(">I", 2)
                + struct.pack(">III", 1, 2, 1)
                + struct.pack(">III", 2, 1, 1))
    new = struct.pack(">I", 8 + len(new_body)) + b"stsc" + new_body
    # second chunk offset = first + sizes of first two samples
    j = payload.find(b"stco")
    (off0,) = struct.unpack(">I", payload[j + 12:j + 16])
    stco_body = (b"\x00\x00\x00\x00" + struct.pack(">I", 2)
                 + struct.pack(">II", off0,
                               off0 + len(frames[0][1])
                               + len(frames[1][1])))
    new_stco = struct.pack(">I", 8 + len(stco_body)) + b"stco" + stco_body
    # splice (stsc comes before stsz before stco in our layout)
    stsz_start = payload.find(b"stsz") - 4
    stco_start = j - 4
    stco_end = stco_start + 8 + 8 + 4
    rebuilt = (payload[:i - 4] + new
               + payload[stsz_start:stco_start] + new_stco
               + payload[stco_end:])
    # fix enclosing box sizes (stbl/minf/mdia/trak/moov): sizes grew by
    delta = (len(new) - (4 + old)) + (len(new_stco) - (stco_end - stco_start))
    out = bytearray(rebuilt)
    for btype in (b"stbl", b"minf", b"mdia", b"trak", b"moov"):
        k = out.find(btype)
        (sz,) = struct.unpack(">I", out[k - 4:k])
        out[k - 4:k] = struct.pack(">I", sz + delta)
    dw, dh, decoded = decode_mp4(bytes(out))
    assert decoded == frames[:3]


def test_malformed_rejected():
    with pytest.raises(Mp4FormatError, match="signature"):
        decode_mp4(b"not an mp4 at all")
    w, h, frames = _clip("v3")
    good = encode_mp4(frames, w, h)
    with pytest.raises(Mp4FormatError):
        decode_mp4(good[:len(good) - 30])       # truncated moov
    # non-JPEG codec named at the plug point
    bad = bytearray(good)
    i = bad.find(b"jpeg", bad.find(b"stsd"))
    bad[i:i + 4] = b"avc1"
    with pytest.raises(Mp4FormatError, match="avc1"):
        decode_mp4(bytes(bad))
    # fragmented movies named
    frag = good + struct.pack(">I", 8) + b"moof"
    with pytest.raises(Mp4FormatError, match="fragmented"):
        decode_mp4(frag)
    with pytest.raises(Mp4FormatError, match="at least one"):
        encode_mp4([], 8, 8)


def test_largesize_box_framing():
    """A 64-bit largesize mdat (size==1 + 8-byte size) must demux."""
    w, h, frames = _clip("v4")
    payload = bytearray(encode_mp4(frames, w, h))
    i = payload.find(b"mdat")
    (sz,) = struct.unpack(">I", payload[i - 4:i])
    big = (struct.pack(">I", 1) + b"mdat" + struct.pack(">Q", sz + 8)
           + payload[i + 4:i - 4 + sz])
    rest = payload[i - 4 + sz:]
    head = payload[:i - 4]
    # chunk offsets shift by 8 (the largesize field)
    out = bytearray(head + big + rest)
    j = out.find(b"stco")
    (off0,) = struct.unpack(">I", out[j + 12:j + 16])
    out[j + 12:j + 16] = struct.pack(">I", off0 + 8)
    dw, dh, decoded = decode_mp4(bytes(out))
    assert decoded == frames


def test_real_decode_features_dispatches_mp4():
    from jsi_spark.ops.multimodal import _real_decode_features
    w, h, frames = _clip("v5")
    feats = _real_decode_features(encode_mp4(frames, w, h))
    rgb = np.frombuffer(synth_pixels("v5#f0", w, h, channels=3),
                        dtype=np.uint8).reshape(h, w, 3)
    exp = pixel_stats(
        reference_roundtrip_subsampled(rgb, "420").tobytes(), w, h)
    assert feats == pytest.approx([float(np.float32(x)) for x in exp],
                                  rel=1e-6)


def test_sample_frames_mp4_distributed(spark):
    """End-to-end through mapInPandas: mux on executors, demux +
    entropy-decode + PNG re-encode on executors; sampled indices and
    pixels match the codec-free golden construction."""
    from jsi_spark.ops.gif import sample_ticks
    from jsi_spark.ops.multimodal import sample_frames, synth_mp4_media
    from jsi_spark.ops.png import decode_png
    from jsi_spark.session import ensure_py_files
    ensure_py_files(spark)
    dim = spark.createDataFrame(
        [(f"m{i}", "video") for i in range(4)],
        "media_ref string, media_kind string")
    rows = sample_frames(synth_mp4_media(dim), every_ms=100).collect()
    by_ref: dict = {}
    for r in rows:
        by_ref.setdefault(r["media_ref"], []).append(r)
    assert set(by_ref) == {f"m{i}" for i in range(4)}
    for ref, frames in by_ref.items():
        w, h, n, delay = synth_mp4_params(ref)
        want = sample_ticks([delay] * n, 100)
        assert sorted(r["frame_index"] for r in frames) == sorted(want)
        for r in frames:
            assert r["t_ms"] == r["frame_index"] * delay
            rgb = np.frombuffer(
                synth_pixels(f"{ref}#f{r['frame_index']}", w, h,
                             channels=3),
                dtype=np.uint8).reshape(h, w, 3)
            exp = reference_roundtrip_subsampled(rgb, "420").tobytes()
            assert decode_png(bytes(r["payload"]))[3] == exp
