"""Minimal pure-numpy baseline JPEG codec (ITU-T T.81) for the
multimodal decode path — grayscale (single-component) and 4:4:4 color
(three-component YCbCr, MCU-interleaved) baseline DCT:
SOI/APP0/DQT/SOF0/DHT/SOS/EOI markers, 8x8 forward/inverse DCT with
quantization, zigzag ordering, per-component DC prediction, canonical
Huffman entropy coding with the Annex-K luminance + chrominance
tables, the JFIF full-range color transform, and 0xFF byte stuffing.

This de-stubs the JPEG plug point the same way ops/png (zlib
scanlines) and ops/gif (LZW) did for their formats: the container has
no image libraries, but baseline JPEG's pipeline is implementable on
numpy + stdlib. Chroma subsampling is supported for any per-component
sampling factors in {1,2} — 4:2:0 (the dominant real-world form, with
2x2 box-average downsampling at encode and nearest-replication
upsampling at decode, T.81 A.1.1 MCU interleave) and 4:2:2/4:4:0 fall
out of the same generalized MCU decode. Progressive scans and restart
intervals raise ``JpegFormatError`` — named, at decode time.

Because JPEG is LOSSY, the golden oracle cannot compare against the
source pixels. Instead :func:`reference_roundtrip` defines the
expected decoded pixels in pure block math (DCT → quantize → dequant →
IDCT, no bytes, no Huffman) using the SAME float kernels the codec
uses, in the same order — IEEE-754 determinism then makes
``decode_jpeg(encode_jpeg(x))`` bit-equal to ``reference_roundtrip(x)``
exactly when the marker/entropy layer (zigzag, DC prediction, Huffman,
stuffing) is correct, which is precisely the layer under test.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = [
    "JpegFormatError", "is_jpeg", "encode_jpeg", "decode_jpeg",
    "encode_jpeg_color", "reference_roundtrip",
    "reference_roundtrip_color", "reference_roundtrip_420",
    "reference_roundtrip_subsampled", "QUANT_LUMA", "QUANT_CHROMA",
]


class JpegFormatError(ValueError):
    """Payload is not a JPEG this codec supports (bad signature, bad
    marker structure, or an out-of-subset feature: color, progressive,
    restart markers, 12-bit precision)."""


def is_jpeg(data) -> bool:
    return isinstance(data, (bytes, bytearray)) and \
        bytes(data[:2]) == b"\xff\xd8"


# -- tables (public Annex K of ITU-T T.81) ----------------------------------

#: luminance quantization table, natural (row-major) order
QUANT_LUMA = np.array([
    [16, 11, 10, 16, 24, 40, 51, 61],
    [12, 12, 14, 19, 26, 58, 60, 55],
    [14, 13, 16, 24, 40, 57, 69, 56],
    [14, 17, 22, 29, 51, 87, 80, 62],
    [18, 22, 37, 56, 68, 109, 103, 77],
    [24, 35, 55, 64, 81, 104, 113, 92],
    [49, 64, 78, 87, 103, 121, 120, 101],
    [72, 92, 95, 98, 112, 100, 103, 99]], dtype=np.int32)

#: chrominance quantization table (Annex K Table K.2), natural order
QUANT_CHROMA = np.array([
    [17, 18, 24, 47, 99, 99, 99, 99],
    [18, 21, 26, 66, 99, 99, 99, 99],
    [24, 26, 56, 99, 99, 99, 99, 99],
    [47, 66, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99]], dtype=np.int32)

#: DC luminance Huffman spec: BITS[i] = #codes of length i+1, then the
#: symbol values in code order (canonical construction, T.81 C.2)
_DC_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_DC_VALS = list(range(12))

_DC_C_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
_DC_C_VALS = list(range(12))

_AC_C_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
_AC_C_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
    0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
    0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
    0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
    0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
    0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
    0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
    0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
    0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
    0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
    0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA]

_AC_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
_AC_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
    0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
    0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
    0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
    0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
    0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
    0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
    0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
    0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA]


def _zigzag_order() -> list[int]:
    """Natural-order indexes in zigzag sequence, generated by the
    diagonal walk (no transcribed table to get wrong)."""
    order = []
    for s in range(15):               # anti-diagonal index r+c = s
        rng = range(s + 1) if s % 2 else range(s, -1, -1)
        for r in rng:                 # odd diagonals walk down, even up
            c = s - r
            if r < 8 and c < 8:
                order.append(r * 8 + c)
    return order


_ZIGZAG = _zigzag_order()             # zigzag position -> natural index


def _canonical_codes(bits: list[int], vals: list[int]) -> dict:
    """symbol -> (code, length) per T.81 Annex C canonical assignment."""
    out = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


_DC_ENC = _canonical_codes(_DC_BITS, _DC_VALS)
_AC_ENC = _canonical_codes(_AC_BITS, _AC_VALS)
_DC_C_ENC = _canonical_codes(_DC_C_BITS, _DC_C_VALS)
_AC_C_ENC = _canonical_codes(_AC_C_BITS, _AC_C_VALS)


# -- shared float kernels (encoder, decoder, AND reference) -----------------

def _dct_mat() -> np.ndarray:
    n = np.arange(8)
    mat = np.cos((2 * n[None, :] + 1) * n[:, None] * np.pi / 16) / 2.0
    mat[0, :] /= np.sqrt(2.0)
    return mat


_D = _dct_mat()


def _blocks_of(plane: np.ndarray) -> np.ndarray:
    """Pad (edge-replicate) to multiples of 8 and split into
    (rows, cols, 8, 8) float64 blocks, level-shifted by -128. Accepts
    uint8 (grayscale) or float64 (YCbCr) planes."""
    h, w = plane.shape
    ph, pw = (-h) % 8, (-w) % 8
    padded = np.pad(plane.astype(np.float64) - 128.0,
                    ((0, ph), (0, pw)), mode="edge")
    bh, bw = padded.shape[0] // 8, padded.shape[1] // 8
    return padded.reshape(bh, 8, bw, 8).transpose(0, 2, 1, 3), bh, bw


def _fdct_quant(block: np.ndarray, qt: np.ndarray) -> np.ndarray:
    coef = _D @ block @ _D.T
    return np.round(coef / qt).astype(np.int32)


def _dequant_idct_f(coef: np.ndarray, qt: np.ndarray) -> np.ndarray:
    """Float IDCT block WITHOUT the final round/clip — the color path
    must round only once, after the YCbCr→RGB transform."""
    return _D.T @ (coef * qt).astype(np.float64) @ _D


def _dequant_idct(coef: np.ndarray, qt: np.ndarray) -> np.ndarray:
    return np.clip(np.round(_dequant_idct_f(coef, qt) + 128.0),
                   0, 255).astype(np.uint8)


def _rgb_to_ycbcr(rgb: np.ndarray):
    """JFIF full-range color transform, float64 planes (shared by the
    encoder AND the pure-math reference — same ops, same order)."""
    r = rgb[..., 0].astype(np.float64)
    g = rgb[..., 1].astype(np.float64)
    b = rgb[..., 2].astype(np.float64)
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.331264 * b + 128.0
    return y, cb, cr


def _ycbcr_to_rgb(y: np.ndarray, cb: np.ndarray,
                  cr: np.ndarray) -> np.ndarray:
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    return np.clip(np.round(np.stack([r, g, b], axis=-1)),
                   0, 255).astype(np.uint8)


def reference_roundtrip(gray: np.ndarray,
                        qt: np.ndarray = QUANT_LUMA) -> np.ndarray:
    """The mathematical definition of a correct baseline-JPEG round
    trip: per-block DCT → quantize → dequantize → IDCT with the same
    kernels the codec uses — NO marker/Huffman/byte code. decode(
    encode(x)) must equal this bit-for-bit."""
    h, w = gray.shape
    blocks, bh, bw = _blocks_of(gray)
    out = np.empty((bh * 8, bw * 8), dtype=np.uint8)
    for r in range(bh):
        for c in range(bw):
            out[r * 8:r * 8 + 8, c * 8:c * 8 + 8] = _dequant_idct(
                _fdct_quant(blocks[r, c], qt), qt)
    return out[:h, :w]


def _plane_roundtrip_f(plane: np.ndarray, qt: np.ndarray,
                       h: int, w: int) -> np.ndarray:
    """Float DCT→quant→dequant→IDCT of one plane (no round/clip)."""
    blocks, bh, bw = _blocks_of(plane)
    out = np.empty((bh * 8, bw * 8), dtype=np.float64)
    for r in range(bh):
        for c in range(bw):
            out[r * 8:r * 8 + 8, c * 8:c * 8 + 8] = _dequant_idct_f(
                _fdct_quant(blocks[r, c], qt), qt) + 128.0
    return out[:h, :w]


#: subsampling name -> luma (horizontal, vertical) sampling factors
_SUBSAMPLINGS = {"444": (1, 1), "420": (2, 2), "422": (2, 1),
                 "440": (1, 2)}


def _box_downsample(plane: np.ndarray, fx: int, fy: int) -> np.ndarray:
    """fx x fy box-average chroma downsample (float64, factors 1 or 2),
    edge-replicating odd dimensions first — shared by the subsampled
    encoder AND the pure-math reference so the golden stays bit-exact."""
    h, w = plane.shape
    p = np.pad(plane, ((0, (-h) % fy), (0, (-w) % fx)), mode="edge")
    if fy == 2:
        p = (p[0::2, :] + p[1::2, :]) / 2.0
    if fx == 2:
        p = (p[:, 0::2] + p[:, 1::2]) / 2.0
    return p


def _downsample2(plane: np.ndarray) -> np.ndarray:
    return _box_downsample(plane, 2, 2)


def _upsample(plane: np.ndarray, fx: int, fy: int,
              h: int, w: int) -> np.ndarray:
    """Nearest-replication upsample cropped to (h, w) — shared by the
    decoder AND the reference."""
    if fy > 1:
        plane = np.repeat(plane, fy, axis=0)
    if fx > 1:
        plane = np.repeat(plane, fx, axis=1)
    return plane[:h, :w]


def _upsample2(plane: np.ndarray, h: int, w: int) -> np.ndarray:
    return _upsample(plane, 2, 2, h, w)


def reference_roundtrip_color(rgb: np.ndarray,
                              qt_luma: np.ndarray = QUANT_LUMA,
                              qt_chroma: np.ndarray = QUANT_CHROMA
                              ) -> np.ndarray:
    """Color (4:4:4) analog of :func:`reference_roundtrip`: RGB →
    YCbCr → per-plane DCT/quant/dequant/IDCT → RGB, same float kernels
    as the codec, single final round/clip. decode(encode_color(x))
    must equal this bit-for-bit."""
    h, w = rgb.shape[:2]
    y, cb, cr = _rgb_to_ycbcr(rgb)
    return _ycbcr_to_rgb(_plane_roundtrip_f(y, qt_luma, h, w),
                         _plane_roundtrip_f(cb, qt_chroma, h, w),
                         _plane_roundtrip_f(cr, qt_chroma, h, w))


def reference_roundtrip_subsampled(rgb: np.ndarray, subsampling: str,
                                   qt_luma: np.ndarray = QUANT_LUMA,
                                   qt_chroma: np.ndarray = QUANT_CHROMA
                                   ) -> np.ndarray:
    """Subsampled analog of :func:`reference_roundtrip_color`: RGB →
    YCbCr → box-average chroma downsample → per-plane block math →
    nearest-replication chroma upsample → RGB, same float kernels as
    the codec, single final round/clip.
    decode(encode_jpeg_color(x, subsampling=s)) must equal this
    bit-for-bit. (The encoder pads luma to MCU multiples; the
    edge-replicated padding only adds blocks outside the crop and
    leaves in-crop block content unchanged, so the 8-mult padding here
    is equivalent.)"""
    fx, fy = _SUBSAMPLINGS[subsampling]
    h, w = rgb.shape[:2]
    ch, cw = (h + fy - 1) // fy, (w + fx - 1) // fx
    y, cb, cr = _rgb_to_ycbcr(rgb)

    def chroma(plane):
        return _upsample(
            _plane_roundtrip_f(_box_downsample(plane, fx, fy),
                               qt_chroma, ch, cw), fx, fy, h, w)

    return _ycbcr_to_rgb(_plane_roundtrip_f(y, qt_luma, h, w),
                         chroma(cb), chroma(cr))


def reference_roundtrip_420(rgb: np.ndarray,
                            qt_luma: np.ndarray = QUANT_LUMA,
                            qt_chroma: np.ndarray = QUANT_CHROMA
                            ) -> np.ndarray:
    """4:2:0 reference round trip (see
    :func:`reference_roundtrip_subsampled`)."""
    return reference_roundtrip_subsampled(rgb, "420", qt_luma,
                                          qt_chroma)


# -- bit I/O with 0xFF stuffing ----------------------------------------------

class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            byte = (self.acc >> self.nbits) & 0xFF
            self.buf.append(byte)
            if byte == 0xFF:          # byte stuffing (T.81 B.1.1.5)
                self.buf.append(0x00)

    def flush(self) -> bytes:
        pad = (-self.nbits) % 8
        if pad:                       # pad with 1-bits (T.81 F.1.2.3)
            self.write((1 << pad) - 1, pad)
        return bytes(self.buf)


class _BitReader:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def read(self, n: int) -> int:
        while self.nbits < n:
            if self.pos >= len(self.data):
                raise JpegFormatError("entropy stream truncated")
            byte = self.data[self.pos]
            self.pos += 1
            if byte == 0xFF:          # un-stuff
                if self.pos >= len(self.data) or \
                        self.data[self.pos] != 0x00:
                    raise JpegFormatError(
                        "marker inside entropy-coded segment")
                self.pos += 1
            self.acc = (self.acc << 8) | byte
            self.nbits += 8
        self.nbits -= n
        val = (self.acc >> self.nbits) & ((1 << n) - 1)
        return val


def _decode_symbol(rd: _BitReader, table: dict) -> int:
    """table: (length, code) -> symbol; canonical codes are prefix-free
    so extending one bit at a time terminates within 16 bits."""
    code = 0
    for length in range(1, 17):
        code = (code << 1) | rd.read(1)
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise JpegFormatError("invalid Huffman code")


def _magnitude(v: int) -> tuple[int, int]:
    """(ssss, additional bits) per T.81 F.1.2.1 — negatives in
    one's-complement of the magnitude."""
    if v == 0:
        return 0, 0
    ssss = int(abs(v)).bit_length()
    bits = v if v > 0 else v + (1 << ssss) - 1
    return ssss, bits


def _extend(bits: int, ssss: int) -> int:
    if ssss == 0:
        return 0
    if bits < (1 << (ssss - 1)):
        return bits - (1 << ssss) + 1
    return bits


# -- encoder -----------------------------------------------------------------

def _encode_block(wr: _BitWriter, coef: np.ndarray, pred: int,
                  dc_enc: dict, ac_enc: dict) -> int:
    """Entropy-encode one quantized block; returns the new DC pred."""
    zz = coef.reshape(64)[_ZIGZAG]
    diff = int(zz[0]) - pred
    ssss, bits = _magnitude(diff)
    code, length = dc_enc[ssss]
    wr.write(code, length)
    if ssss:
        wr.write(bits, ssss)
    run = 0
    for k in range(1, 64):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            zc, zl = ac_enc[0xF0]               # ZRL = 16 zeros
            wr.write(zc, zl)
            run -= 16
        ssss, bits = _magnitude(v)
        code, length = ac_enc[(run << 4) | ssss]
        wr.write(code, length)
        wr.write(bits, ssss)
        run = 0
    if run:
        ec, el = ac_enc[0x00]                   # EOB
        wr.write(ec, el)
    return int(zz[0])


def _seg(marker: int, body: bytes) -> bytes:
    return struct.pack(">HH", marker, len(body) + 2) + body


def _zz_bytes(qt: np.ndarray) -> bytes:
    return qt.reshape(64)[_ZIGZAG].astype(np.uint8).tobytes()


_JFIF = b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
_DHT_LUMA = (bytes([0x00]) + bytes(_DC_BITS) + bytes(_DC_VALS)
             + bytes([0x10]) + bytes(_AC_BITS) + bytes(_AC_VALS))
_DHT_CHROMA = (bytes([0x01]) + bytes(_DC_C_BITS) + bytes(_DC_C_VALS)
               + bytes([0x11]) + bytes(_AC_C_BITS) + bytes(_AC_C_VALS))


def encode_jpeg(gray: bytes, width: int, height: int,
                qt: np.ndarray = QUANT_LUMA) -> bytes:
    """Encode 8-bit grayscale bytes (row-major) as baseline JFIF."""
    if len(gray) != width * height:
        raise JpegFormatError(
            f"pixel buffer {len(gray)} != {width}x{height}")
    img = np.frombuffer(bytes(gray), dtype=np.uint8).reshape(
        height, width)
    blocks, bh, bw = _blocks_of(img)
    wr = _BitWriter()
    pred = 0
    for r in range(bh):
        for c in range(bw):
            pred = _encode_block(wr, _fdct_quant(blocks[r, c], qt),
                                 pred, _DC_ENC, _AC_ENC)
    return (b"\xff\xd8"
            + _seg(0xFFE0, _JFIF)
            + _seg(0xFFDB, bytes([0x00]) + _zz_bytes(qt))
            + _seg(0xFFC0, struct.pack(">BHHB", 8, height, width, 1)
                   + bytes([1, 0x11, 0]))
            + _seg(0xFFC4, _DHT_LUMA)
            + _seg(0xFFDA, bytes([1, 1, 0x00, 0, 63, 0]))
            + wr.flush() + b"\xff\xd9")


def encode_jpeg_color(rgb: bytes, width: int, height: int,
                      qt_luma: np.ndarray = QUANT_LUMA,
                      qt_chroma: np.ndarray = QUANT_CHROMA,
                      subsampling: str = "444") -> bytes:
    """Encode 8-bit RGB bytes (row-major) as baseline color JFIF:
    three components (Y with the luminance tables, Cb/Cr with the
    chrominance tables), MCU-interleaved with independent DC
    predictors (T.81 E.2.3). ``subsampling="444"`` keeps all
    components 1x1-sampled (one block each per MCU);
    ``"420"`` samples luma 2x2 per 16x16 MCU (four Y blocks, then one
    Cb, one Cr over box-averaged quarter-resolution chroma) — the
    dominant real-world JPEG form; ``"422"``/``"440"`` halve chroma
    horizontally/vertically only."""
    if len(rgb) != width * height * 3:
        raise JpegFormatError(
            f"pixel buffer {len(rgb)} != {width}x{height}x3")
    if subsampling not in _SUBSAMPLINGS:
        raise JpegFormatError(
            f"subsampling {subsampling!r} unsupported "
            f"({'/'.join(sorted(_SUBSAMPLINGS))})")
    fx, fy = _SUBSAMPLINGS[subsampling]
    arr = np.frombuffer(bytes(rgb), dtype=np.uint8).reshape(
        height, width, 3)
    y, cb, cr = _rgb_to_ycbcr(arr)
    # MCU = (8*fx) x (8*fy) luma pixels: pad Y to MCU multiples (edge)
    # so every MCU has its full fx x fy luma block group; chroma is the
    # box-averaged reduced plane, one block per MCU.
    ph, pw = (-height) % (8 * fy), (-width) % (8 * fx)
    yb = _blocks_of(np.pad(y, ((0, ph), (0, pw)), mode="edge"))[0]
    cbb = _blocks_of(_box_downsample(cb, fx, fy))[0]
    crb = _blocks_of(_box_downsample(cr, fx, fy))[0]
    wr = _BitWriter()
    preds = [0, 0, 0]
    for r in range((height + 8 * fy - 1) // (8 * fy)):
        for c in range((width + 8 * fx - 1) // (8 * fx)):
            for by in range(fy):
                for bx in range(fx):
                    preds[0] = _encode_block(
                        wr, _fdct_quant(yb[fy * r + by, fx * c + bx],
                                        qt_luma),
                        preds[0], _DC_ENC, _AC_ENC)
            preds[1] = _encode_block(
                wr, _fdct_quant(cbb[r, c], qt_chroma), preds[1],
                _DC_C_ENC, _AC_C_ENC)
            preds[2] = _encode_block(
                wr, _fdct_quant(crb[r, c], qt_chroma), preds[2],
                _DC_C_ENC, _AC_C_ENC)
    sof = (struct.pack(">BHHB", 8, height, width, 3)
           + bytes([1, (fx << 4) | fy, 0]) + bytes([2, 0x11, 1])
           + bytes([3, 0x11, 1]))
    sos = bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0])
    return (b"\xff\xd8"
            + _seg(0xFFE0, _JFIF)
            + _seg(0xFFDB, bytes([0x00]) + _zz_bytes(qt_luma)
                   + bytes([0x01]) + _zz_bytes(qt_chroma))
            + _seg(0xFFC0, sof)
            + _seg(0xFFC4, _DHT_LUMA + _DHT_CHROMA)
            + _seg(0xFFDA, sos)
            + wr.flush() + b"\xff\xd9")


# -- decoder -----------------------------------------------------------------

def decode_jpeg(data: bytes):
    """Decode a baseline JPEG (grayscale or 4:4:4 color) →
    ``(width, height, channels, pixels: bytes)`` — channels is 1
    (gray) or 3 (RGB, converted back from YCbCr). Quantization and
    Huffman tables are read from the stream (DQT/DHT), not assumed."""
    if not is_jpeg(data):
        raise JpegFormatError("bad JPEG signature")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    htables: dict[tuple[int, int], dict] = {}
    width = height = None
    comps: list[tuple[int, int]] = []     # SOF order: (component id, Tq)
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            raise JpegFormatError(f"expected marker at {pos}")
        marker = data[pos + 1]
        if marker == 0xD9:
            break
        (length,) = struct.unpack(">H", data[pos + 2:pos + 4])
        body = data[pos + 4:pos + 2 + length]
        if len(body) != length - 2:
            raise JpegFormatError("truncated segment")
        if marker == 0xDB:            # DQT (possibly several tables)
            b = 0
            while b < len(body):
                pq, tq = body[b] >> 4, body[b] & 15
                if pq != 0:
                    raise JpegFormatError("16-bit quant unsupported")
                zz = np.frombuffer(body[b + 1:b + 65], dtype=np.uint8)
                nat = np.zeros(64, dtype=np.int32)
                nat[_ZIGZAG] = zz
                qtables[tq] = nat.reshape(8, 8)
                b += 65
        elif marker == 0xC4:          # DHT (possibly several tables)
            b = 0
            while b < len(body):
                tc, th = body[b] >> 4, body[b] & 15
                bits = list(body[b + 1:b + 17])
                n = sum(bits)
                vals = list(body[b + 17:b + 17 + n])
                enc = _canonical_codes(bits, vals)
                htables[(tc, th)] = {(ln, cd): sym
                                     for sym, (cd, ln) in enc.items()}
                b += 17 + n
        elif marker == 0xC0:          # SOF0 baseline
            prec, height, width, nf = struct.unpack(">BHHB", body[:6])
            if prec != 8:
                raise JpegFormatError(f"precision {prec} unsupported")
            if nf not in (1, 3):
                raise JpegFormatError(
                    f"{nf}-component JPEG unsupported (grayscale or "
                    "4:4:4 color baseline only)")
            for i in range(nf):
                cid, hv, tq = body[6 + 3 * i:9 + 3 * i]
                ch, cv = hv >> 4, hv & 15
                if ch not in (1, 2) or cv not in (1, 2):
                    raise JpegFormatError(
                        f"sampling factors {ch}x{cv} unsupported "
                        "(1 or 2 per axis: 4:4:4/4:2:2/4:4:0/4:2:0)")
                comps.append((cid, ch, cv, tq))
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise JpegFormatError(
                f"SOF{marker - 0xC0}: only baseline (SOF0) supported")
        elif marker == 0xDD:
            raise JpegFormatError("restart intervals unsupported")
        elif marker == 0xDA:          # SOS: entropy data follows
            ns = body[0]
            if width is None:
                raise JpegFormatError("SOS before SOF")
            if ns != len(comps):
                raise JpegFormatError(
                    "interleaved scan over all components expected")
            tabs = []                 # in SOF order: (h, v, qt, dc, ac)
            for i in range(ns):
                cs, tdta = body[1 + 2 * i], body[2 + 2 * i]
                cid, ch, cv, tq = comps[i]
                if cs != cid:
                    raise JpegFormatError(
                        "scan component order must match SOF")
                tabs.append((ch, cv, qtables[tq],
                             htables[(0, tdta >> 4)],
                             htables[(1, tdta & 15)]))
            pos = pos + 2 + length
            scan_end = data.rfind(b"\xff\xd9")
            if scan_end < 0:
                raise JpegFormatError("missing EOI")
            return _decode_scan(data[pos:scan_end], width, height, tabs)
        pos += 2 + length
    raise JpegFormatError("no SOS marker")


def _decode_one_block(rd: _BitReader, pred: int, qt: np.ndarray,
                      dc_tab: dict, ac_tab: dict):
    """Entropy-decode one block → (new pred, natural-order coef)."""
    zz = np.zeros(64, dtype=np.int32)
    ssss = _decode_symbol(rd, dc_tab)
    pred += _extend(rd.read(ssss), ssss)
    zz[0] = pred
    k = 1
    while k < 64:
        sym = _decode_symbol(rd, ac_tab)
        rrrr, ssss = sym >> 4, sym & 15
        if ssss == 0:
            if rrrr == 15:
                k += 16               # ZRL
                continue
            break                     # EOB
        k += rrrr
        if k > 63:
            raise JpegFormatError("coefficient index overflow")
        zz[k] = _extend(rd.read(ssss), ssss)
        k += 1
    coef = np.zeros(64, dtype=np.int32)
    coef[_ZIGZAG] = zz
    return pred, coef.reshape(8, 8)


def _decode_scan(scan: bytes, width: int, height: int, tabs: list):
    """MCU-interleaved decode of 1 (gray) or 3 (YCbCr) components with
    per-component sampling factors in {1,2} (T.81 A.2.3): each MCU
    carries h_i x v_i blocks per component in raster order, independent
    DC predictors; subsampled chroma is upsampled back to full
    resolution by nearest replication before the color transform."""
    rd = _BitReader(scan)
    nc = len(tabs)
    if nc == 1:
        # single-component scans are non-interleaved: a plain raster of
        # 8x8 blocks regardless of declared sampling factors (T.81 A.2.2)
        bh, bw = (height + 7) // 8, (width + 7) // 8
        out = np.empty((bh * 8, bw * 8), dtype=np.uint8)
        pred = 0
        _h, _v, qt, dc_tab, ac_tab = tabs[0]
        for r in range(bh):
            for c in range(bw):
                pred, coef = _decode_one_block(rd, pred, qt, dc_tab,
                                               ac_tab)
                out[r * 8:r * 8 + 8, c * 8:c * 8 + 8] = _dequant_idct(
                    coef, qt)
        return width, height, 1, out[:height, :width].tobytes()
    hmax = max(t[0] for t in tabs)
    vmax = max(t[1] for t in tabs)
    mch = (height + 8 * vmax - 1) // (8 * vmax)   # MCU rows
    mcw = (width + 8 * hmax - 1) // (8 * hmax)    # MCU cols
    planes = [np.empty((mch * v * 8, mcw * h * 8), dtype=np.float64)
              for h, v, _q, _d, _a in tabs]
    preds = [0] * nc
    for r in range(mch):
        for c in range(mcw):
            for ci, (h, v, qt, dc_tab, ac_tab) in enumerate(tabs):
                for by in range(v):
                    for bx in range(h):
                        preds[ci], coef = _decode_one_block(
                            rd, preds[ci], qt, dc_tab, ac_tab)
                        pr, pc = (r * v + by) * 8, (c * h + bx) * 8
                        planes[ci][pr:pr + 8, pc:pc + 8] = \
                            _dequant_idct_f(coef, qt) + 128.0
    full = []
    for (h, v, _q, _d, _a), plane in zip(tabs, planes):
        # true component dims per T.81 A.1.1, then replicate to full res
        cw = (width * h + hmax - 1) // hmax
        ch = (height * v + vmax - 1) // vmax
        p = plane[:ch, :cw]
        if h != hmax:
            p = np.repeat(p, hmax // h, axis=1)
        if v != vmax:
            p = np.repeat(p, vmax // v, axis=0)
        full.append(p[:height, :width])
    rgb = _ycbcr_to_rgb(full[0], full[1], full[2])
    return width, height, 3, rgb.tobytes()
