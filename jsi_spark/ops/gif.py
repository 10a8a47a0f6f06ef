"""Stdlib animated-GIF (87a/89a, LZW) codec for the multimodal
frame-sampling path.

Third member of the pure-stdlib codec family (:mod:`jsi_spark.ops.png`,
:mod:`jsi_spark.ops.wav`): the container has no video libraries, but
GIF's mandatory pipeline — variable-width LSB-first LZW over indexed
pixels, per-frame Graphic Control delays (the public GIF89a
specification) — is implementable on the stdlib, so the frame-sample
operator (multimodal.sample_frames) can decode an actual multi-frame
container instead of stubbing. Supported subset: global color table
only, full-screen non-interlaced frames, no transparency/disposal
compositing (each frame is a complete image — the shape the synthetic
corpus emits and the common case for generated/screen-capture GIFs).
Out-of-subset streams (local color tables, interlace, partial-canvas
frames) raise ``GifFormatError`` by name at decode time.

The encoder exists for fixtures and the deterministic synthetic corpus
(`synth_frames`), mirroring png.encode_png: round-trip tests exercise
code-width growth, dictionary reset (CLEAR emission at 4096 codes),
and sub-block packing of the decoder.
"""

from __future__ import annotations

import hashlib
import struct

_SIGS = (b"GIF87a", b"GIF89a")


class GifFormatError(ValueError):
    """Payload is not a GIF this codec supports (bad signature, or an
    out-of-subset feature: local color table, interlace, frames smaller
    than the logical screen)."""


def is_gif(data: bytes) -> bool:
    return isinstance(data, (bytes, bytearray)) and \
        bytes(data[:6]) in _SIGS


# -- LZW (GIF variant: LSB-first, variable width 3..12 bits) ---------------

def _lzw_encode(indexes: bytes, min_code_size: int) -> bytes:
    """GIF LZW: emit CLEAR, then greedy longest-match codes, growing
    the code width as the dictionary fills; reset at 4096 entries."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    bitbuf = bitcnt = 0

    def emit(code: int, width: int):
        nonlocal bitbuf, bitcnt
        bitbuf |= code << bitcnt
        bitcnt += width
        while bitcnt >= 8:
            out.append(bitbuf & 0xFF)
            bitbuf >>= 8
            bitcnt -= 8

    def fresh():
        return {bytes([i]): i for i in range(clear)}, eoi + 1, \
            min_code_size + 1

    table, next_code, width = fresh()
    emit(clear, width)
    run = b""
    for b in indexes:
        cand = run + bytes([b])
        if cand in table:
            run = cand
            continue
        emit(table[run], width)
        table[cand] = next_code
        next_code += 1
        if next_code - 1 == (1 << width) and width < 12:
            width += 1
        elif next_code > 4096:
            emit(clear, width)
            table, next_code, width = fresh()
        run = bytes([b])
    if run:
        emit(table[run], width)
    emit(eoi, width)
    if bitcnt:
        out.append(bitbuf & 0xFF)
    return bytes(out)


def _lzw_decode(data: bytes, min_code_size: int, expect: int) -> bytes:
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    pos = bits = acc = 0

    def fresh():
        return [bytes([i]) for i in range(clear)] + [b"", b""], \
            min_code_size + 1

    table, width = fresh()
    prev = None
    while True:
        while bits < width:
            if pos >= len(data):
                raise GifFormatError("LZW stream truncated")
            acc |= data[pos] << bits
            bits += 8
            pos += 1
        code = acc & ((1 << width) - 1)
        acc >>= width
        bits -= width
        if code == clear:
            table, width = fresh()
            prev = None
            continue
        if code == eoi:
            break
        if prev is None:
            if code >= len(table):
                raise GifFormatError("first code after CLEAR not literal")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise GifFormatError(f"LZW code {code} out of range")
        out += entry
        prev = entry
        if len(table) == (1 << width) and width < 12:
            width += 1
        if len(out) > expect:
            raise GifFormatError(
                f"LZW output exceeds frame size {expect}")
    if len(out) != expect:
        raise GifFormatError(
            f"LZW output {len(out)} != frame size {expect}")
    return bytes(out)


def _sub_blocks(data: bytes) -> bytes:
    out = bytearray()
    for i in range(0, len(data), 255):
        chunk = data[i:i + 255]
        out.append(len(chunk))
        out += chunk
    out.append(0)
    return bytes(out)


# -- container ---------------------------------------------------------------

def encode_gif(frames: list[tuple[int, bytes]], width: int, height: int,
               palette: bytes) -> bytes:
    """Encode an animated GIF89a.

    ``frames`` is ``[(delay_ms, indexes), ...]`` with indexes one byte
    per pixel, row-major, full-screen. ``palette`` is packed RGB and
    must be a power-of-two 2..256 entries long.
    """
    n_colors = len(palette) // 3
    if len(palette) % 3 or n_colors < 2 or n_colors > 256 or \
            n_colors & (n_colors - 1):
        raise GifFormatError(
            f"palette must be a power-of-two 2..256 RGB entries, "
            f"got {len(palette)} bytes")
    if not frames:
        raise GifFormatError("at least one frame required")
    depth = max(2, n_colors.bit_length() - 1)  # LZW min code size >= 2
    out = bytearray(b"GIF89a")
    # Logical Screen Descriptor: global table present, size field
    out += struct.pack("<HHBBB", width, height,
                       0x80 | (n_colors.bit_length() - 2), 0, 0)
    out += palette
    for delay_ms, idx in frames:
        if len(idx) != width * height:
            raise GifFormatError(
                f"frame has {len(idx)} indexes, need {width * height}")
        if max(idx) >= n_colors:
            raise GifFormatError("frame index out of palette range")
        # Graphic Control Extension: delay in centiseconds
        out += b"\x21\xf9\x04\x00" + struct.pack(
            "<H", min(0xFFFF, delay_ms // 10)) + b"\x00\x00"
        # Image Descriptor: full screen, no local table, no interlace
        out += b"\x2c" + struct.pack("<HHHHB", 0, 0, width, height, 0)
        out.append(depth)
        out += _sub_blocks(_lzw_encode(idx, depth))
    out.append(0x3B)
    return bytes(out)


def decode_gif(data: bytes):
    """Decode → ``(width, height, palette: bytes,
    frames: [(delay_ms, indexes: bytes), ...])``."""
    if not is_gif(data):
        raise GifFormatError("bad GIF signature")
    data = bytes(data)
    w, h, packed, _bg, _aspect = struct.unpack("<HHBBB", data[6:13])
    pos = 13
    if not packed & 0x80:
        raise GifFormatError("no global color table (subset requires one)")
    n_colors = 2 << (packed & 0x07)
    palette = data[pos:pos + 3 * n_colors]
    pos += 3 * n_colors
    frames: list[tuple[int, bytes]] = []
    delay_ms = 0
    while pos < len(data):
        b = data[pos]
        pos += 1
        if b == 0x3B:  # trailer
            break
        if b == 0x21:  # extension
            label = data[pos]
            pos += 1
            if label == 0xF9:  # graphic control
                size = data[pos]
                if size != 4:
                    raise GifFormatError("bad GCE size")
                (delay_cs,) = struct.unpack("<H", data[pos + 2:pos + 4])
                delay_ms = delay_cs * 10
                pos += 1 + size
            else:  # skip any other extension's sub-blocks
                pass
            while True:
                size = data[pos]
                pos += 1
                if size == 0:
                    break
                pos += size
        elif b == 0x2C:  # image descriptor
            left, top, fw, fh, fpacked = struct.unpack(
                "<HHHHB", data[pos:pos + 9])
            pos += 9
            if fpacked & 0x80:
                raise GifFormatError("local color table unsupported")
            if fpacked & 0x40:
                raise GifFormatError("interlaced frames unsupported")
            if (left, top, fw, fh) != (0, 0, w, h):
                raise GifFormatError(
                    "partial-canvas frame unsupported (subset requires "
                    "full-screen frames)")
            mcs = data[pos]
            pos += 1
            lzw = bytearray()
            while True:
                size = data[pos]
                pos += 1
                if size == 0:
                    break
                lzw += data[pos:pos + size]
                pos += size
            frames.append((delay_ms, _lzw_decode(bytes(lzw), mcs, w * h)))
            delay_ms = 0
        else:
            raise GifFormatError(f"unexpected block 0x{b:02x}")
    if not frames:
        raise GifFormatError("no frames")
    return w, h, palette, frames


def expand_palette(indexes: bytes, palette: bytes) -> bytes:
    """Indexed pixels → packed RGB through the palette."""
    return b"".join(palette[i * 3:i * 3 + 3] for i in indexes)


# -- deterministic synthetic animated corpus --------------------------------

def synth_clip_params(media_ref: str, max_side: int = 12,
                      max_frames: int = 8) -> tuple[int, int, int, int]:
    """Deterministic (width, height, n_frames, frame_delay_ms) from the
    ref string — the video analog of png.synth_dims / wav.synth_duration_ms
    (a payload constructor shared with the golden oracle, not the codec
    under test)."""
    seed = hashlib.sha256(media_ref.encode()).digest()
    span = max_side - 3
    w, h = seed[3] % span + 4, seed[4] % span + 4
    n_frames = seed[5] % (max_frames - 1) + 2       # >= 2: animated
    delay_ms = (seed[6] % 20 + 5) * 10              # 50..240 ms, cs-exact
    return w, h, n_frames, delay_ms


def synth_gif_palette(media_ref: str, n_colors: int = 16) -> bytes:
    """Deterministic packed-RGB palette (power-of-two entries)."""
    seed = hashlib.sha256(b"palette:" + media_ref.encode()).digest()
    out = bytearray()
    ctr = 0
    while len(out) < n_colors * 3:
        out += hashlib.sha256(seed + struct.pack(">I", ctr)).digest()
        ctr += 1
    return bytes(out[:n_colors * 3])


def synth_frame_indexes(media_ref: str, frame: int, width: int,
                        height: int, n_colors: int = 16) -> bytes:
    """Deterministic per-frame indexed pixels: SHA-256 counter stream
    seeded by (ref, frame), reduced mod the palette size."""
    need = width * height
    seed = hashlib.sha256(
        media_ref.encode() + struct.pack(">I", frame)).digest()
    out = bytearray()
    ctr = 0
    while len(out) < need:
        out += hashlib.sha256(seed + struct.pack(">I", ctr)).digest()
        ctr += 1
    return bytes(bytearray(b % n_colors for b in out[:need]))


def sample_ticks(delays_ms: list[int], every_ms: int) -> list[int]:
    """Frame indexes sampled at a fixed wall-clock cadence: frame i
    covers [start_i, start_i + delay_i); keep the frame on screen at
    t = 0, every_ms, 2*every_ms, ... up to the clip end. Pure integer
    math, shared verbatim with the golden oracle."""
    starts = [0]
    for d in delays_ms[:-1]:
        starts.append(starts[-1] + d)
    total = starts[-1] + delays_ms[-1]
    picked = []
    t = 0
    i = 0
    while t < total:
        while i + 1 < len(starts) and starts[i + 1] <= t:
            i += 1
        if not picked or picked[-1] != i:
            picked.append(i)
        t += every_ms
    return picked
