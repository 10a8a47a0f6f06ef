"""Pure-stdlib animated-GIF codec (jsi_spark.ops.gif) + frame sampling.

Counterpart of test_png.py / test_wav.py: everything runs without Spark
except the final sample_frames / query integration tests. The LZW tests
deliberately force code-width growth to 12 bits and a dictionary reset
(>4096 codes) so both the encoder's CLEAR emission and the decoder's
reset path are exercised.
"""

import pytest

from jsi_spark.ops.gif import (
    GifFormatError, _lzw_decode, _lzw_encode, decode_gif, encode_gif,
    expand_palette, is_gif, sample_ticks, synth_clip_params,
    synth_frame_indexes, synth_gif_palette,
)


def test_lzw_round_trip_small():
    data = bytes([0, 1, 2, 3, 0, 1, 2, 3, 0, 0, 0, 1, 1, 2])
    assert _lzw_decode(_lzw_encode(data, 2), 2, len(data)) == data


def test_lzw_round_trip_forces_dictionary_reset():
    # high-entropy indexed stream long enough to pass 4096 dictionary
    # entries (forcing encoder CLEAR + decoder reset) and every code
    # width from min_code_size+1 up to 12 bits
    data = synth_frame_indexes("lzw-reset", 0, 200, 200, 16)
    assert len(data) == 40_000
    enc = _lzw_encode(data, 4)
    assert _lzw_decode(enc, 4, len(data)) == data


def test_lzw_repetitive_stream_compresses():
    data = bytes([5]) * 10_000
    enc = _lzw_encode(data, 4)
    assert len(enc) < 200  # run-length collapses into growing codes
    assert _lzw_decode(enc, 4, len(data)) == data


def test_lzw_truncation_and_size_mismatch_raise():
    data = bytes([1, 2, 3, 1, 2, 3])
    enc = _lzw_encode(data, 2)
    with pytest.raises(GifFormatError, match="truncated"):
        _lzw_decode(enc[:1], 2, len(data))
    with pytest.raises(GifFormatError):
        _lzw_decode(enc, 2, len(data) + 1)


def test_gif_round_trip_multi_frame():
    pal = synth_gif_palette("rt", 16)
    frames = [(80, synth_frame_indexes("rt", i, 7, 5, 16))
              for i in range(4)]
    data = encode_gif(frames, 7, 5, pal)
    assert is_gif(data)
    w, h, pal2, frames2 = decode_gif(data)
    assert (w, h) == (7, 5)
    assert pal2 == pal
    assert frames2 == frames


@pytest.mark.parametrize("n_colors", [2, 4, 16, 64, 256])
def test_gif_round_trip_every_palette_size(n_colors):
    pal = synth_gif_palette(f"p{n_colors}", n_colors)
    idx = synth_frame_indexes(f"p{n_colors}", 0, 9, 6, n_colors)
    _, _, _, frames = decode_gif(encode_gif([(50, idx)], 9, 6, pal))
    assert frames == [(50, idx)]


def test_gif_sub_block_boundary():
    # enough pixels that the LZW stream spans multiple 255-byte
    # sub-blocks
    pal = synth_gif_palette("blocks", 16)
    idx = synth_frame_indexes("blocks", 0, 40, 30, 16)
    _, _, _, frames = decode_gif(encode_gif([(50, idx)], 40, 30, pal))
    assert frames[0][1] == idx


def test_gif_delay_round_trips_in_centiseconds():
    pal = synth_gif_palette("delay", 4)
    idx = synth_frame_indexes("delay", 0, 4, 4, 4)
    _, _, _, frames = decode_gif(
        encode_gif([(120, idx), (55, idx)], 4, 4, pal))
    # 55 ms is not centisecond-exact: stored as 5 cs = 50 ms
    assert [d for d, _ in frames] == [120, 50]


def test_gif_encoder_input_validation():
    pal = synth_gif_palette("v", 16)
    with pytest.raises(GifFormatError, match="power-of-two"):
        encode_gif([(50, b"\x00")], 1, 1, b"\x00" * 9)  # 3 entries
    with pytest.raises(GifFormatError, match="indexes"):
        encode_gif([(50, b"\x00\x01")], 3, 3, pal)
    with pytest.raises(GifFormatError, match="range"):
        encode_gif([(50, bytes([16] * 9))], 3, 3, pal)
    with pytest.raises(GifFormatError, match="frame"):
        encode_gif([], 3, 3, pal)


def test_gif_out_of_subset_rejected():
    with pytest.raises(GifFormatError, match="signature"):
        decode_gif(b"\x89PNG\r\n\x1a\nnot a gif")
    pal = synth_gif_palette("sub", 4)
    idx = synth_frame_indexes("sub", 0, 4, 4, 4)
    data = bytearray(encode_gif([(50, idx)], 4, 4, pal))
    # flip the interlace bit in the image descriptor's packed byte
    # (descriptor starts after 13-byte header + 12-byte palette + 8-byte
    # GCE: sig 0x2C, then 8 bytes of geometry, then packed)
    desc = 13 + 12 + 8  # header+LSD, 4-color table, GCE
    assert data[desc] == 0x2C
    data[desc + 9] |= 0x40
    with pytest.raises(GifFormatError, match="interlace"):
        decode_gif(bytes(data))


def test_expand_palette():
    pal = bytes([10, 11, 12, 20, 21, 22])
    assert expand_palette(bytes([1, 0, 1]), pal) == \
        bytes([20, 21, 22, 10, 11, 12, 20, 21, 22])


def test_sample_ticks_definition():
    # 3 frames x 100 ms, sampled every 100 ms → every frame once
    assert sample_ticks([100, 100, 100], 100) == [0, 1, 2]
    # coarse sampling skips frames
    assert sample_ticks([100, 100, 100], 250) == [0, 2]
    # fine sampling never repeats a frame (consecutive dedupe)
    assert sample_ticks([100, 100], 30) == [0, 1]
    # single frame
    assert sample_ticks([80], 100) == [0]
    # tick landing exactly on a frame boundary picks the new frame
    assert sample_ticks([100, 100], 100) == [0, 1]


def test_synth_constructors_deterministic():
    assert synth_clip_params("m2") == synth_clip_params("m2")
    assert synth_gif_palette("m2") == synth_gif_palette("m2")
    assert synth_frame_indexes("m2", 1, 5, 5) == \
        synth_frame_indexes("m2", 1, 5, 5)
    w, h, n_frames, delay = synth_clip_params("m2")
    assert 4 <= w <= 12 and 4 <= h <= 12
    assert 2 <= n_frames <= 8
    assert 50 <= delay <= 240 and delay % 10 == 0


def test_real_decode_features_gif_first_frame():
    from jsi_spark.ops.multimodal import _real_decode_features
    from jsi_spark.ops.png import pixel_stats
    pal = synth_gif_palette("feat", 16)
    frames = [(60, synth_frame_indexes("feat", i, 6, 4, 16))
              for i in range(3)]
    feats = _real_decode_features(encode_gif(frames, 6, 4, pal))
    rgb = expand_palette(frames[0][1], pal)
    assert feats == [float(x) for x in pixel_stats(rgb, 6, 4)]


def test_sample_frames_distributed(spark):
    import pandas as pd
    from pyspark.sql import functions as F

    from jsi_spark.ops.multimodal import sample_frames, synth_gif_media
    from jsi_spark.ops.png import decode_png
    from jsi_spark.session import ensure_py_files
    ensure_py_files(spark)
    dim = spark.createDataFrame(
        pd.DataFrame({"media_ref": [f"m{i}" for i in range(9)],
                      "media_kind": ["image", "audio", "video"] * 3}))
    frames = sample_frames(synth_gif_media(dim), every_ms=100)
    rows = frames.orderBy("media_ref", "frame_index").collect()
    assert rows  # at least one sampled frame per clip
    by_ref = {}
    for r in rows:
        by_ref.setdefault(r.media_ref, []).append(r)
    assert set(by_ref) == {"m2", "m5", "m8"}
    for ref, rs in by_ref.items():
        w, h, n_frames, delay = synth_clip_params(ref)
        expect = sample_ticks([delay] * n_frames, 100)
        assert [r.frame_index for r in rs] == expect
        pal = synth_gif_palette(ref)
        for r in rs:
            assert (r.width, r.height) == (w, h)
            assert r.t_ms == r.frame_index * delay
            dw, dh, ch, px = decode_png(bytes(r.payload))
            assert (dw, dh, ch) == (w, h, 3)
            assert px == expand_palette(
                synth_frame_indexes(ref, r.frame_index, w, h), pal)


def test_media_frames_real_query_matches_oracle(spark):
    """The entry query's rows equal the codec-free golden oracle —
    the same gate the driver applies via oracle_sql()."""
    import __spark_entry__ as entry
    from jsi_spark.oracles import media_frames_rows
    got = sorted(
        tuple(r) for r in
        entry.q_media_frames_real(spark, entry.SF_DEFAULT).collect())
    want = sorted(media_frames_rows())
    assert got == want
