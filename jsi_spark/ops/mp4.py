"""Minimal ISO BMFF (MP4, ISO/IEC 14496-12) container for the
multimodal video path — an MJPEG video track: each sample is a complete
baseline/progressive JPEG decoded by :mod:`jsi_spark.ops.jpeg`.

Fifth member of the pure-stdlib codec family (png/wav/gif/jpeg): the
container has no ffmpeg, but the ISO base-media *container* layer —
box (atom) framing, the moov/trak/mdia/minf/stbl hierarchy, and the
sample tables stts/stsc/stsz/stco that map samples to byte ranges —
is public structure implementable on ``struct`` alone. This de-stubs
the "MP4 needs ffmpeg" plug point for real container DEMUX: the frame
sampler walks actual sample tables instead of a fake. Supported
subset: one video track, ``jpeg`` sample entry (MJPEG), 32-bit sample
tables. Out-of-subset streams (other codecs inside stsd, encrypted
tracks, fragmented movies) raise ``Mp4FormatError`` by name — the
exact point a real decoder (ffmpeg) would plug in.

The muxer exists for fixtures and the deterministic synthetic corpus,
mirroring gif.encode_gif: mdat-before-moov layout, run-length stts,
single-chunk stsc/stco. Round-trip tests exercise the stsc chunk walk,
64-bit largesize framing, and the timescale → milliseconds conversion.
"""

from __future__ import annotations

import hashlib
import struct

__all__ = [
    "Mp4FormatError", "is_mp4", "encode_mp4", "decode_mp4",
    "synth_mp4_params",
]


class Mp4FormatError(ValueError):
    """Payload is not an MP4 this demuxer supports (bad box framing,
    no video track, or an out-of-subset feature: non-JPEG sample
    entry, fragmented movie, 64-bit co64 offsets)."""


def is_mp4(data) -> bool:
    return isinstance(data, (bytes, bytearray)) and len(data) >= 12 \
        and bytes(data[4:8]) == b"ftyp"


def _u32(v: int) -> bytes:
    return struct.pack(">I", v)


def _box(btype: bytes, payload: bytes) -> bytes:
    return _u32(len(payload) + 8) + btype + payload


def _full(btype: bytes, version: int, flags: int,
          payload: bytes) -> bytes:
    return _box(btype, bytes([version]) + flags.to_bytes(3, "big")
                + payload)


#: identity transformation matrix (16.16 / 2.30 fixed point)
_MATRIX = (_u32(0x00010000) + _u32(0) + _u32(0)
           + _u32(0) + _u32(0x00010000) + _u32(0)
           + _u32(0) + _u32(0) + _u32(0x40000000))


def _stts(durations: list[int]) -> bytes:
    """Run-length (sample_count, sample_delta) encoding."""
    runs: list[list[int]] = []
    for d in durations:
        if runs and runs[-1][1] == d:
            runs[-1][0] += 1
        else:
            runs.append([1, d])
    return _full(b"stts", 0, 0, _u32(len(runs))
                 + b"".join(_u32(c) + _u32(d) for c, d in runs))


def encode_mp4(frames: list[tuple[int, bytes]], width: int, height: int,
               timescale: int = 1000) -> bytes:
    """Mux ``[(duration_ms, jpeg_bytes), ...]`` as a single-video-track
    MP4 (MJPEG: ``jpeg`` sample entry). Layout is mdat-before-moov so
    the single stco chunk offset is known without patching. With the
    default ``timescale=1000`` one media unit is one millisecond."""
    if not frames:
        raise Mp4FormatError("MP4 needs at least one sample")
    durations = [d * timescale // 1000 for d, _ in frames]
    samples = [bytes(j) for _, j in frames]
    total = sum(durations)
    ftyp = _box(b"ftyp", b"isom" + _u32(512) + b"isom" + b"iso2"
                + b"mp41")
    chunk_offset = len(ftyp) + 8          # first sample byte in mdat
    mdat = _box(b"mdat", b"".join(samples))

    entry = (b"\x00" * 6 + struct.pack(">H", 1)     # data_reference_index
             + struct.pack(">HH", 0, 0) + b"\x00" * 12
             + struct.pack(">HH", width, height)
             + _u32(0x00480000) + _u32(0x00480000)  # 72 dpi
             + _u32(0) + struct.pack(">H", 1)       # frame_count 1
             + b"\x00" * 32                          # compressorname
             + struct.pack(">Hh", 24, -1))           # depth, pre_defined
    stsd = _full(b"stsd", 0, 0, _u32(1) + _box(b"jpeg", entry))
    stsc = _full(b"stsc", 0, 0, _u32(1)
                 + _u32(1) + _u32(len(samples)) + _u32(1))
    stsz = _full(b"stsz", 0, 0, _u32(0) + _u32(len(samples))
                 + b"".join(_u32(len(s)) for s in samples))
    stco = _full(b"stco", 0, 0, _u32(1) + _u32(chunk_offset))
    stbl = _box(b"stbl", stsd + _stts(durations) + stsc + stsz + stco)
    dinf = _box(b"dinf", _full(b"dref", 0, 0,
                               _u32(1) + _full(b"url ", 0, 1, b"")))
    vmhd = _full(b"vmhd", 0, 1, struct.pack(">HHHH", 0, 0, 0, 0))
    minf = _box(b"minf", vmhd + dinf + stbl)
    hdlr = _full(b"hdlr", 0, 0, _u32(0) + b"vide" + b"\x00" * 12
                 + b"VideoHandler\x00")
    mdhd = _full(b"mdhd", 0, 0, _u32(0) + _u32(0) + _u32(timescale)
                 + _u32(total) + struct.pack(">HH", 0x55C4, 0))
    mdia = _box(b"mdia", mdhd + hdlr + minf)
    tkhd = _full(b"tkhd", 0, 3, _u32(0) + _u32(0) + _u32(1) + _u32(0)
                 + _u32(total) + _u32(0) + _u32(0)
                 + struct.pack(">HHHH", 0, 0, 0, 0) + _MATRIX
                 + _u32(width << 16) + _u32(height << 16))
    mvhd = _full(b"mvhd", 0, 0, _u32(0) + _u32(0) + _u32(timescale)
                 + _u32(total) + _u32(0x00010000)
                 + struct.pack(">H", 0x0100) + b"\x00" * 10 + _MATRIX
                 + b"\x00" * 24 + _u32(2))
    moov = _box(b"moov", mvhd + _box(b"trak", tkhd + mdia))
    return ftyp + mdat + moov


# -- demuxer ------------------------------------------------------------------

def _boxes(data: bytes, start: int, end: int):
    """Walk sibling boxes in data[start:end] → (type, body_start,
    box_end); handles 64-bit largesize and size-0 (to end of file)."""
    pos = start
    while pos + 8 <= end:
        (size,) = struct.unpack(">I", data[pos:pos + 4])
        btype = bytes(data[pos + 4:pos + 8])
        hdr = 8
        if size == 1:
            if pos + 16 > end:
                raise Mp4FormatError("truncated largesize box")
            (size,) = struct.unpack(">Q", data[pos + 8:pos + 16])
            hdr = 16
        elif size == 0:
            size = end - pos
        if size < hdr or pos + size > end:
            raise Mp4FormatError(f"bad box size at offset {pos}")
        yield btype, pos + hdr, pos + size
        pos += size


def _find(data: bytes, start: int, end: int, btype: bytes):
    for t, b, e in _boxes(data, start, end):
        if t == btype:
            return b, e
    return None


def _full_body(data: bytes, b: int, e: int) -> tuple[int, int, int]:
    """(version, flags, body_start) of a FullBox body."""
    return data[b], int.from_bytes(data[b + 1:b + 4], "big"), b + 4


def decode_mp4(data: bytes):
    """Demux the first video track → ``(width, height,
    [(duration_ms, jpeg_bytes), ...])``. Sample byte ranges come from
    the real stts/stsc/stsz/stco walk (absolute file offsets), not
    from assuming the muxer's single-chunk layout."""
    if not is_mp4(data):
        raise Mp4FormatError("bad MP4 signature (no ftyp)")
    data = bytes(data)
    n = len(data)
    if _find(data, 0, n, b"moof") is not None:
        raise Mp4FormatError("fragmented MP4 (moof) unsupported")
    moov = _find(data, 0, n, b"moov")
    if moov is None:
        raise Mp4FormatError("no moov box")
    for t, tb, te in _boxes(data, *moov):
        if t != b"trak":
            continue
        mdia = _find(data, tb, te, b"mdia")
        if mdia is None:
            continue
        hdlr = _find(data, *mdia, b"hdlr")
        if hdlr is None or data[hdlr[0] + 8:hdlr[0] + 12] != b"vide":
            continue
        mdhd = _find(data, *mdia, b"mdhd")
        if mdhd is None:
            raise Mp4FormatError("video track without mdhd")
        ver, _fl, body = _full_body(data, *mdhd)
        if ver == 1:
            (timescale,) = struct.unpack(">I", data[body + 16:body + 20])
        else:
            (timescale,) = struct.unpack(">I", data[body + 8:body + 12])
        if timescale == 0:
            raise Mp4FormatError("zero timescale")
        minf = _find(data, *mdia, b"minf")
        stbl = minf and _find(data, *minf, b"stbl")
        if not stbl:
            raise Mp4FormatError("video track without stbl")
        return _demux_track(data, stbl, timescale)
    raise Mp4FormatError("no video track")


def _demux_track(data: bytes, stbl: tuple, timescale: int):
    stsd = _find(data, *stbl, b"stsd")
    if stsd is None:
        raise Mp4FormatError("missing stsd")
    _v, _f, body = _full_body(data, *stsd)
    fourcc = data[body + 8:body + 12]
    if fourcc != b"jpeg":
        raise Mp4FormatError(
            f"sample entry {fourcc!r} unsupported (MJPEG 'jpeg' only — "
            "other codecs need ffmpeg; plug the decoder in here)")
    width, height = struct.unpack(">HH", data[body + 36:body + 40])

    if _find(data, *stbl, b"co64") is not None:
        raise Mp4FormatError("64-bit chunk offsets (co64) unsupported")

    def table(btype, skip):
        t = _find(data, *stbl, btype)
        if t is None:
            raise Mp4FormatError(f"missing {btype.decode()}")
        _v2, _f2, b2 = _full_body(data, *t)
        (cnt,) = struct.unpack(">I", data[b2 + skip:b2 + skip + 4])
        return b2 + skip + 4, cnt

    # stts → per-sample durations (media units)
    b, nruns = table(b"stts", 0)
    durations: list[int] = []
    for i in range(nruns):
        c, d = struct.unpack(">II", data[b + 8 * i:b + 8 * i + 8])
        durations.extend([d] * c)
    # stsz → sizes
    t = _find(data, *stbl, b"stsz")
    if t is None:
        raise Mp4FormatError("missing stsz")
    _v3, _f3, b3 = _full_body(data, *t)
    uniform, nsamples = struct.unpack(">II", data[b3:b3 + 8])
    if uniform:
        sizes = [uniform] * nsamples
    else:
        sizes = list(struct.unpack(f">{nsamples}I",
                                   data[b3 + 8:b3 + 8 + 4 * nsamples]))
    if len(durations) < nsamples:
        raise Mp4FormatError("stts covers fewer samples than stsz")
    # stco chunk offsets + stsc sample→chunk mapping
    b, nchunks = table(b"stco", 0)
    chunk_offsets = list(struct.unpack(f">{nchunks}I",
                                       data[b:b + 4 * nchunks]))
    b, nstsc = table(b"stsc", 0)
    stsc = [struct.unpack(">III", data[b + 12 * i:b + 12 * i + 12])
            for i in range(nstsc)]
    samples: list[tuple[int, bytes]] = []
    si = 0
    for ci in range(nchunks):
        spc = 0
        for first, per_chunk, _sdi in stsc:
            if first <= ci + 1:
                spc = per_chunk
        off = chunk_offsets[ci]
        for _ in range(spc):
            if si >= nsamples:
                break
            sz = sizes[si]
            if off + sz > len(data):
                raise Mp4FormatError("sample range outside file")
            samples.append((durations[si] * 1000 // timescale,
                            data[off:off + sz]))
            off += sz
            si += 1
    if si != nsamples:
        raise Mp4FormatError("chunk tables cover fewer samples "
                             "than stsz declares")
    return width, height, samples


# -- deterministic synthetic MJPEG corpus ------------------------------------

def synth_mp4_params(media_ref: str, max_side: int = 16,
                     max_frames: int = 5) -> tuple[int, int, int, int]:
    """Deterministic (width, height, n_frames, frame_delay_ms) from the
    ref string — the MP4 analog of gif.synth_clip_params (payload
    constructor shared with the golden oracle, not the demuxer under
    test). Distinct hash domain from the GIF params so the two video
    corpora differ."""
    seed = hashlib.sha256(b"mp4:" + media_ref.encode()).digest()
    span = max_side - 7
    w, h = seed[3] % span + 8, seed[4] % span + 8
    n_frames = seed[5] % (max_frames - 1) + 2       # >= 2: animated
    delay_ms = (seed[6] % 20 + 5) * 10              # 50..240 ms
    return w, h, n_frames, delay_ms
