"""Stdlib WAV codec (jsi_spark.ops.wav) + the audio real decode path."""

import io
import wave as stdlib_wave

import pytest

from jsi_spark.ops.multimodal import _real_decode_features
from jsi_spark.ops.wav import (
    WavFormatError, audio_stats, decode_wav, encode_wav, is_wav,
    synth_duration_ms, synth_samples,
)


def test_round_trip_mono_and_stereo():
    s = synth_samples("rt", 300)
    assert decode_wav(encode_wav(s, 16000)) == (16000, 1, s)
    assert decode_wav(encode_wav(s, 44100, channels=2)) == (44100, 2, s)


def test_bad_inputs_raise_named_errors():
    with pytest.raises(WavFormatError, match="RIFF"):
        decode_wav(b"not audio at all")
    with pytest.raises(WavFormatError, match="undecodable"):
        decode_wav(b"RIFF\x00\x00\x00\x00WAVE" + b"\x00" * 16)


def test_non_16bit_rejected():
    buf = io.BytesIO()
    with stdlib_wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(1)
        w.setframerate(8000)
        w.writeframes(b"\x00\x7f\xff")
    with pytest.raises(WavFormatError, match="sample width"):
        decode_wav(buf.getvalue())


def test_audio_stats_definition():
    # alternating full-scale square wave: rms=peak=mean_abs≈1, zcr=1
    s = [32767, -32767] * 8
    st = audio_stats(s, 16000)
    assert len(st) == 16
    assert st[0] == st[1] == st[2] == pytest.approx(32767 / 32768)
    assert st[3] == 1.0                      # every step crosses zero
    assert st[11] == 1.0                     # all |s| in the top bin
    assert sum(st[4:12]) == pytest.approx(1.0)
    assert st[13] == 1.0 and st[14] == pytest.approx(16 / 16000)
    # silence: everything at zero except bin 0
    zs = audio_stats([0] * 10, 16000)
    assert zs[0] == zs[1] == zs[3] == 0.0 and zs[4] == 1.0
    with pytest.raises(WavFormatError):
        audio_stats([], 16000)


def test_synth_is_deterministic():
    assert synth_samples("m1", 64) == synth_samples("m1", 64)
    assert synth_samples("m1", 64) != synth_samples("m2", 64)
    assert 20 <= synth_duration_ms("m1") <= 250


def test_real_decode_dispatches_on_magic():
    s = synth_samples("d", 50)
    feats = _real_decode_features(encode_wav(s, 16000))
    assert feats == pytest.approx(audio_stats(s, 16000))
    # MP4 payloads now dispatch to their own codec; use a payload
    # matching no known magic for the named plug point
    with pytest.raises(NotImplementedError, match="WAV"):
        _real_decode_features(b"\x00\x01free-form bytes, no magic")


def test_extract_features_real_audio_distributed(spark):
    from jsi_spark.ops.multimodal import extract_features, synth_wav_media
    from jsi_spark.session import ensure_py_files
    ensure_py_files(spark)
    dim = spark.createDataFrame(
        [(f"m{i}", "audio") for i in range(4)],
        "media_ref string, media_kind string")
    out = {r["media_ref"]: r["features"]
           for r in extract_features(synth_wav_media(dim),
                                     decode="real").collect()}
    assert len(out) == 4
    for ref, feats in out.items():
        n = 16000 * synth_duration_ms(ref) // 1000
        golden = audio_stats(synth_samples(ref, n), 16000)
        assert feats == pytest.approx(golden, rel=1e-6)
