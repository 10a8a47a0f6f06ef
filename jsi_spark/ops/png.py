"""Minimal pure-stdlib PNG codec (zlib + struct) for the multimodal
decode path.

The container has no image libraries, but PNG's mandatory pipeline —
zlib-compressed scanlines with 5 per-row predictor filters (RFC 2083
§6; the public PNG specification) — is implementable on the stdlib, so
``extract_features(decode="real")`` can decode an actual format instead
of stubbing. Supports the common still-image subset: 8-bit depth,
grayscale (color type 0), RGB (2), gray+alpha (4), RGBA (6),
non-interlaced. Interlaced (Adam7), paletted, and 16-bit images raise
``PngFormatError`` — named, at decode time.

The encoder exists for fixtures and the deterministic synthetic corpus
(`synth_pixels`): it can emit any per-row filter type, so round-trip
tests exercise every unfilter branch of the decoder.
"""

from __future__ import annotations

import hashlib
import struct
import zlib

_SIG = b"\x89PNG\r\n\x1a\n"

#: channels per color type (8-bit only)
_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


class PngFormatError(ValueError):
    """Payload is not a PNG this codec supports (bad signature, CRC,
    or an out-of-subset feature: palette, 16-bit, interlace)."""


def is_png(data: bytes) -> bool:
    return isinstance(data, (bytes, bytearray)) and \
        bytes(data[:8]) == _SIG


def _chunk(tag: bytes, body: bytes) -> bytes:
    return (struct.pack(">I", len(body)) + tag + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF))


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def encode_png(pixels: bytes, width: int, height: int,
               color_type: int = 2, filter_type: int = 0) -> bytes:
    """Encode raw 8-bit pixel bytes (row-major, no padding) as PNG.

    ``filter_type`` selects the per-row predictor (0-4) so tests can
    produce streams that hit each unfilter branch of :func:`decode_png`.
    """
    ch = _CHANNELS.get(color_type)
    if ch is None:
        raise PngFormatError(f"unsupported color type {color_type}")
    stride = width * ch
    if len(pixels) != stride * height:
        raise PngFormatError(
            f"pixel buffer {len(pixels)} != {stride}x{height}")
    raw = bytearray()
    prev = bytes(stride)
    for y in range(height):
        row = pixels[y * stride:(y + 1) * stride]
        raw.append(filter_type)
        if filter_type == 0:
            raw += row
        elif filter_type == 1:   # Sub
            raw += bytes((row[i] - (row[i - ch] if i >= ch else 0)) & 0xFF
                         for i in range(stride))
        elif filter_type == 2:   # Up
            raw += bytes((row[i] - prev[i]) & 0xFF for i in range(stride))
        elif filter_type == 3:   # Average
            raw += bytes((row[i] - (((row[i - ch] if i >= ch else 0)
                                     + prev[i]) >> 1)) & 0xFF
                         for i in range(stride))
        elif filter_type == 4:   # Paeth
            raw += bytes((row[i] - _paeth(row[i - ch] if i >= ch else 0,
                                          prev[i],
                                          prev[i - ch] if i >= ch else 0))
                         & 0xFF for i in range(stride))
        else:
            raise PngFormatError(f"unsupported filter type {filter_type}")
        prev = row
    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    return (_SIG + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", zlib.compress(bytes(raw)))
            + _chunk(b"IEND", b""))


def decode_png(data: bytes):
    """Decode a PNG → ``(width, height, channels, pixels: bytes)`` with
    pixels row-major, filters undone. Verifies chunk CRCs."""
    if not is_png(data):
        raise PngFormatError("bad PNG signature")
    pos = 8
    width = height = color_type = None
    idat = bytearray()
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos:pos + 4])
        tag = data[pos + 4:pos + 8]
        body = data[pos + 8:pos + 8 + length]
        if len(body) != length:
            raise PngFormatError("truncated chunk")
        (crc,) = struct.unpack(
            ">I", data[pos + 8 + length:pos + 12 + length])
        if zlib.crc32(tag + body) & 0xFFFFFFFF != crc:
            raise PngFormatError(f"bad CRC in {tag!r}")
        pos += 12 + length
        if tag == b"IHDR":
            width, height, depth, color_type, comp, filt, interlace = \
                struct.unpack(">IIBBBBB", body)
            if depth != 8:
                raise PngFormatError(f"unsupported bit depth {depth}")
            if color_type not in _CHANNELS:
                raise PngFormatError(
                    f"unsupported color type {color_type} "
                    "(palette needs PLTE handling)")
            if interlace:
                raise PngFormatError("Adam7 interlace unsupported")
            if comp or filt:
                raise PngFormatError("nonzero compression/filter method")
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
    if width is None:
        raise PngFormatError("missing IHDR")
    ch = _CHANNELS[color_type]
    stride = width * ch
    raw = zlib.decompress(bytes(idat))
    if len(raw) != (stride + 1) * height:
        raise PngFormatError(
            f"decompressed size {len(raw)} != {(stride + 1) * height}")
    out = bytearray(stride * height)
    prev = bytes(stride)
    for y in range(height):
        ft = raw[y * (stride + 1)]
        line = bytearray(raw[y * (stride + 1) + 1:(y + 1) * (stride + 1)])
        if ft == 0:
            pass
        elif ft == 1:
            for i in range(ch, stride):
                line[i] = (line[i] + line[i - ch]) & 0xFF
        elif ft == 2:
            for i in range(stride):
                line[i] = (line[i] + prev[i]) & 0xFF
        elif ft == 3:
            for i in range(stride):
                left = line[i - ch] if i >= ch else 0
                line[i] = (line[i] + ((left + prev[i]) >> 1)) & 0xFF
        elif ft == 4:
            for i in range(stride):
                left = line[i - ch] if i >= ch else 0
                ul = prev[i - ch] if i >= ch else 0
                line[i] = (line[i] + _paeth(left, prev[i], ul)) & 0xFF
        else:
            raise PngFormatError(f"bad filter byte {ft}")
        out[y * stride:(y + 1) * stride] = line
        prev = bytes(line)
    return width, height, ch, bytes(out)


# -- deterministic synthetic image corpus ----------------------------------

def synth_dims(media_ref: str, max_side: int = 16) -> tuple[int, int]:
    """Deterministic small (w, h) in [4, max_side] from the ref string.
    Shared with the golden oracle the same way the ANN plane/centroid
    constructors are (a payload *constructor*, not the codec under
    test)."""
    seed = hashlib.sha256(media_ref.encode()).digest()
    span = max_side - 3
    return seed[0] % span + 4, seed[1] % span + 4


def synth_pixels(media_ref: str, width: int, height: int,
                 channels: int = 3) -> bytes:
    """Deterministic pixel bytes: SHA-256 counter stream seeded by the
    ref. Content-free but high-entropy, so decode bugs (filter math,
    stride, channel order) shift the statistics and fail the oracle."""
    need = width * height * channels
    seed = hashlib.sha256(media_ref.encode()).digest()
    out = bytearray()
    ctr = 0
    while len(out) < need:
        out += hashlib.sha256(seed + struct.pack(">I", ctr)).digest()
        ctr += 1
    return bytes(out[:need])


def target_dims(width: int, height: int, max_side: int) -> tuple[int, int]:
    """Aspect-preserving shrink-only target dims — the Python mirror of
    resize_images' Column math (least(1, max_side/greatest(w,h)), ceil),
    same IEEE-double op order so metadata and payload paths agree."""
    import math
    scale = min(1.0, max_side / float(max(width, height)))
    return math.ceil(width * scale), math.ceil(height * scale)


def resample_nearest(pixels: bytes, width: int, height: int,
                     tw: int, th: int, channels: int = 3) -> bytes:
    """Nearest-neighbor resample (floor source mapping sx = tx*w//tw —
    the standard integer-exact kernel, deterministic across
    implementations)."""
    out = bytearray(tw * th * channels)
    for ty in range(th):
        row = (ty * height // th) * width * channels
        for tx in range(tw):
            si = row + (tx * width // tw) * channels
            oi = (ty * tw + tx) * channels
            out[oi:oi + channels] = pixels[si:si + channels]
    return bytes(out)


def pixel_stats(pixels: bytes, width: int, height: int,
                channels: int = 3) -> list[float]:
    """16 deterministic features from raw RGB bytes, defined on exact
    integer sums (so any correct implementation agrees bit-for-bit):
    [mean_r, mean_g, mean_b, var_r, var_g, var_b,
     lum_hist_0..7 (8 bins over r+g+b in [0, 765]),
     width/height aspect, 1.0].
    Means are /255-normalized; variances /255².
    """
    if channels != 3:
        raise PngFormatError(
            f"pixel_stats is defined for RGB (got {channels} channels)")
    n = width * height
    sums = [0] * channels
    sumsq = [0] * channels
    hist = [0] * 8
    for p in range(n):
        base = p * channels
        lum = 0
        for c in range(channels):
            v = pixels[base + c]
            sums[c] += v
            sumsq[c] += v * v
            if c < 3:
                lum += v
        hist[lum * 8 // 766] += 1
    feats = [sums[c] / n / 255.0 for c in range(3)]
    feats += [(sumsq[c] / n - (sums[c] / n) ** 2) / (255.0 * 255.0)
              for c in range(3)]
    feats += [h / n for h in hist]
    feats += [width / height, 1.0]
    return feats
