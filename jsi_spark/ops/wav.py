"""Stdlib WAV (RIFF PCM) codec for the multimodal audio decode path.

Counterpart of :mod:`jsi_spark.ops.png`: the container has no audio
libraries, but 16-bit PCM WAV is fully covered by the stdlib ``wave``
module, so ``extract_features(decode="real")`` can decode real audio
payloads instead of stubbing. Out-of-subset streams (compressed,
24-bit, float) raise :class:`WavFormatError` by name at decode time;
feature math is defined on exact integer sums so the codec-free golden
oracle (jsi_spark/oracles.py) agrees bit-for-bit.
"""

from __future__ import annotations

import hashlib
import io
import struct
import wave

_I16_FULL = 32768.0


class WavFormatError(ValueError):
    """Payload is not a WAV this codec supports (bad RIFF header, or
    out-of-subset: non-PCM encoding, bit depth != 16)."""


def is_wav(data: bytes) -> bool:
    return (isinstance(data, (bytes, bytearray)) and len(data) >= 12
            and bytes(data[:4]) == b"RIFF" and bytes(data[8:12]) == b"WAVE")


def encode_wav(samples: list[int], sample_rate: int = 16000,
               channels: int = 1) -> bytes:
    """Encode int16 samples (interleaved if multi-channel) as PCM WAV."""
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(channels)
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(struct.pack(f"<{len(samples)}h", *samples))
    return buf.getvalue()


def decode_wav(data: bytes):
    """Decode → ``(sample_rate, channels, samples: list[int])`` with
    samples interleaved int16."""
    if not is_wav(data):
        raise WavFormatError("bad RIFF/WAVE header")
    try:
        with wave.open(io.BytesIO(bytes(data)), "rb") as w:
            if w.getsampwidth() != 2:
                raise WavFormatError(
                    f"unsupported sample width {w.getsampwidth()*8} bit "
                    "(16-bit PCM only)")
            rate = w.getframerate()
            channels = w.getnchannels()
            raw = w.readframes(w.getnframes())
    except wave.Error as exc:
        raise WavFormatError(f"undecodable WAV: {exc}") from exc
    return rate, channels, list(struct.unpack(f"<{len(raw) // 2}h", raw))


def synth_samples(media_ref: str, n: int) -> list[int]:
    """Deterministic int16 noise from a SHA-256 counter stream seeded by
    the ref (same constructor pattern as png.synth_pixels)."""
    need = n * 2
    seed = hashlib.sha256(media_ref.encode()).digest()
    out = bytearray()
    ctr = 0
    while len(out) < need:
        out += hashlib.sha256(seed + struct.pack(">I", ctr)).digest()
        ctr += 1
    return list(struct.unpack(f"<{n}h", bytes(out[:need])))


def synth_duration_ms(media_ref: str, max_ms: int = 250) -> int:
    """Deterministic clip length in [20, max_ms] ms."""
    seed = hashlib.sha256(media_ref.encode()).digest()
    return seed[2] % (max_ms - 19) + 20


def audio_stats(samples: list[int], sample_rate: int,
                channels: int = 1) -> list[float]:
    """16 deterministic features from int16 PCM, defined on exact
    integer sums (bit-identical across correct implementations):
    [rms, peak, mean_abs, zero_cross_rate,
     abs_hist_0..7 (8 bins over |s| in [0, 32768)),
     sample_rate/48000, channels, duration_s, 1.0].
    Amplitudes are /32768-normalized.
    """
    n = len(samples)
    if n == 0:
        raise WavFormatError("empty sample stream")
    sum_sq = sum_abs = peak = zc = 0
    hist = [0] * 8
    prev_neg = samples[0] < 0
    for s in samples:
        a = -s if s < 0 else s
        sum_sq += s * s
        sum_abs += a
        if a > peak:
            peak = a
        neg = s < 0
        if neg != prev_neg:
            zc += 1
        prev_neg = neg
        hist[min(a, 32767) * 8 // 32768] += 1
    feats = [(sum_sq / n) ** 0.5 / _I16_FULL, peak / _I16_FULL,
             sum_abs / n / _I16_FULL, zc / (n - 1) if n > 1 else 0.0]
    feats += [h / n for h in hist]
    feats += [sample_rate / 48000.0, float(channels),
              n / channels / sample_rate, 1.0]
    return feats
