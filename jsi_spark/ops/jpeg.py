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
out of the same generalized MCU decode. PROGRESSIVE mode (SOF2, T.81
Annex G) is supported end-to-end: spectral selection (per-band AC
scans with EOB-run coding) and successive approximation (point
transform + DC/AC refinement scans), both encoder (a libjpeg-style
default scan script) and decoder (multi-scan coefficient
accumulation). Progressive entropy coding is LOSSLESS over the same
quantized coefficients, so a progressive round trip must bit-match
the SAME block-math references as baseline. Restart intervals raise
``JpegFormatError`` — named, at decode time.

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
    "encode_jpeg_color", "encode_jpeg_progressive",
    "reference_roundtrip",
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

def _parse_dqt(body: bytes, qtables: dict) -> None:
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


def _parse_dht(body: bytes, htables: dict) -> None:
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


def _parse_sof(body: bytes) -> tuple:
    """Shared SOF0/SOF2 frame-header parse → (width, height, comps)
    with comps = [(component id, h, v, Tq)] in SOF order."""
    prec, height, width, nf = struct.unpack(">BHHB", body[:6])
    if prec != 8:
        raise JpegFormatError(f"precision {prec} unsupported")
    if nf not in (1, 3):
        raise JpegFormatError(
            f"{nf}-component JPEG unsupported (grayscale or "
            "YCbCr color only)")
    comps = []
    for i in range(nf):
        cid, hv, tq = body[6 + 3 * i:9 + 3 * i]
        ch, cv = hv >> 4, hv & 15
        if ch not in (1, 2) or cv not in (1, 2):
            raise JpegFormatError(
                f"sampling factors {ch}x{cv} unsupported "
                "(1 or 2 per axis: 4:4:4/4:2:2/4:4:0/4:2:0)")
        comps.append((cid, ch, cv, tq))
    return width, height, comps


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
            _parse_dqt(body, qtables)
        elif marker == 0xC4:          # DHT (possibly several tables)
            _parse_dht(body, htables)
        elif marker == 0xC0:          # SOF0 baseline
            width, height, comps = _parse_sof(body)
        elif marker == 0xC2:          # SOF2 progressive (T.81 Annex G)
            width, height, comps = _parse_sof(body)
            return _decode_progressive(data, pos + 2 + length, width,
                                       height, comps, qtables, htables)
        elif marker in (0xC1, 0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise JpegFormatError(
                f"SOF{marker - 0xC0}: only baseline (SOF0) and "
                "progressive (SOF2) supported")
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


# -- progressive mode (SOF2, T.81 Annex G) -----------------------------------
#
# Progressive JPEG codes the SAME quantized coefficients as baseline,
# split across multiple scans: spectral selection (each AC scan covers
# one zigzag band Ss..Se of ONE component, with end-of-band run coding)
# and successive approximation (scans deliver the point-transformed
# high bits first — Ah=0 "first" scans — then one bit plane per
# refinement scan, Ah = Al+1). Entropy coding is lossless over the
# coefficients, so decode(encode_jpeg_progressive(x)) must bit-match
# the same block-math references as baseline.
#
# The encoder's Huffman tables are FLAT fixed-length canonical tables
# (DC: 16 symbols x 5 bits; AC: 128 x 8 bits + 128 x 9 bits) rather
# than Annex K: the Annex-K AC tables carry no EOBn symbols for n>=1
# (baseline never emits them), and compression ratio is not what this
# codec is for. The decoder reads whatever DHT the stream declares.

#: flat canonical Huffman specs (BITS list + symbol values)
_FLAT_DC_BITS = [0, 0, 0, 0, 16, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0]
_FLAT_DC_VALS = list(range(16))
_FLAT_AC_BITS = [0, 0, 0, 0, 0, 0, 0, 128, 128, 0, 0, 0, 0, 0, 0, 0]
_FLAT_AC_VALS = list(range(256))
_FLAT_DC_ENC = _canonical_codes(_FLAT_DC_BITS, _FLAT_DC_VALS)
_FLAT_AC_ENC = _canonical_codes(_FLAT_AC_BITS, _FLAT_AC_VALS)
_DHT_FLAT = (bytes([0x00]) + bytes(_FLAT_DC_BITS) + bytes(_FLAT_DC_VALS)
             + bytes([0x10]) + bytes(_FLAT_AC_BITS)
             + bytes(_FLAT_AC_VALS))


def _progressive_script(nc: int) -> list:
    """Default scan script: (component indexes, Ss, Se, Ah, Al) —
    libjpeg's default shape (public knowledge): interleaved DC first
    at Al=1, per-component AC bands at a coarse point transform, then
    AC and DC refinement scans down to Al=0. Exercises every Annex-G
    code path: interleaved + single-component DC, AC first with EOB
    runs and ZRL, AC refinement with buffered correction bits."""
    if nc == 1:
        return [([0], 0, 0, 0, 1),
                ([0], 1, 5, 0, 2), ([0], 6, 63, 0, 2),
                ([0], 1, 63, 2, 1),
                ([0], 0, 0, 1, 0),
                ([0], 1, 63, 1, 0)]
    return [([0, 1, 2], 0, 0, 0, 1),
            ([0], 1, 5, 0, 2), ([1], 1, 63, 0, 1), ([2], 1, 63, 0, 1),
            ([0], 6, 63, 0, 2),
            ([0], 1, 63, 2, 1),
            ([0, 1, 2], 0, 0, 1, 0),
            ([1], 1, 63, 1, 0), ([2], 1, 63, 1, 0), ([0], 1, 63, 1, 0)]


def _point_ac(v: int, al: int) -> int:
    """AC point transform (T.81 G.1.2.2): divide by 2^Al truncating
    toward zero — i.e. shift the MAGNITUDE."""
    return (v >> al) if v >= 0 else -((-v) >> al)


def _emit_eobrun(wr: "_BitWriter", eobrun: int, ac_enc: dict,
                 pending: list) -> None:
    """Flush an end-of-band run (EOBn symbol + extension bits) plus
    the correction bits buffered across the run's blocks."""
    if eobrun:
        nb = eobrun.bit_length() - 1
        code, ln = ac_enc[nb << 4]
        wr.write(code, ln)
        if nb:
            wr.write(eobrun & ((1 << nb) - 1), nb)
    for b in pending:
        wr.write(b, 1)
    pending.clear()


def _enc_ac_first(wr: "_BitWriter", zzs, ss: int, se: int, al: int,
                  ac_enc: dict) -> None:
    """AC first scan (Ah=0) over one component's blocks: run/size
    coding of the point-transformed band with EOB-run accumulation
    (T.81 G.1.2.2)."""
    eobrun = 0
    pending: list = []          # unused in first scans; keeps one flush
    for zz in zzs:
        run = 0
        for k in range(ss, se + 1):
            t = _point_ac(int(zz[k]), al)
            if t == 0:
                run += 1
                continue
            _emit_eobrun(wr, eobrun, ac_enc, pending)
            eobrun = 0
            while run > 15:
                code, ln = ac_enc[0xF0]
                wr.write(code, ln)
                run -= 16
            ssss, bits = _magnitude(t)
            code, ln = ac_enc[(run << 4) | ssss]
            wr.write(code, ln)
            wr.write(bits, ssss)
            run = 0
        if run:                 # band ended in zeros -> end-of-band
            eobrun += 1
            if eobrun == 32767:
                _emit_eobrun(wr, eobrun, ac_enc, pending)
                eobrun = 0
    _emit_eobrun(wr, eobrun, ac_enc, pending)


def _enc_ac_refine(wr: "_BitWriter", zzs, ss: int, se: int, al: int,
                   ac_enc: dict) -> None:
    """AC refinement scan (Ah=Al+1): newly significant coefficients
    coded as (run,1)+sign, already-nonzero coefficients contribute one
    correction bit each, buffered so they land after the symbol that
    carries them past (T.81 G.1.2.3 / libjpeg encode_mcu_AC_refine
    structure, public)."""
    eobrun = 0
    pending: list = []          # correction bits riding the EOB run
    for zz in zzs:
        absv = [abs(int(zz[k])) >> al for k in range(ss, se + 1)]
        eob = 0                 # position of the LAST newly-nonzero
        for i, t in enumerate(absv):
            if t == 1:
                eob = ss + i
        run = 0
        br: list = []           # this block's pending correction bits
        for k in range(ss, se + 1):
            t = absv[k - ss]
            if t == 0:
                run += 1
                continue
            # emit ZRLs only when they cannot fold into the EOB
            while run > 15 and k <= eob:
                _emit_eobrun(wr, eobrun, ac_enc, pending)
                eobrun = 0
                code, ln = ac_enc[0xF0]
                wr.write(code, ln)
                run -= 16
                for b in br:
                    wr.write(b, 1)
                br = []
            if t > 1:           # history coefficient: one more bit
                br.append(t & 1)
                continue
            # newly significant (+-1 at this bit plane)
            _emit_eobrun(wr, eobrun, ac_enc, pending)
            eobrun = 0
            code, ln = ac_enc[(run << 4) | 1]
            wr.write(code, ln)
            wr.write(1 if int(zz[k]) >= 0 else 0, 1)
            for b in br:
                wr.write(b, 1)
            br = []
            run = 0
        if run or br:
            eobrun += 1
            pending.extend(br)
            if eobrun == 32767 or len(pending) > 937:
                _emit_eobrun(wr, eobrun, ac_enc, pending)
                eobrun = 0
    _emit_eobrun(wr, eobrun, ac_enc, pending)


def encode_jpeg_progressive(pixels: bytes, width: int, height: int,
                            channels: int = 1,
                            qt_luma: np.ndarray = QUANT_LUMA,
                            qt_chroma: np.ndarray = QUANT_CHROMA,
                            subsampling: str = "444") -> bytes:
    """Encode 8-bit grayscale (``channels=1``) or RGB (``channels=3``)
    pixels as PROGRESSIVE JFIF (SOF2): the same quantized coefficients
    as the baseline encoder, delivered through the default spectral-
    selection + successive-approximation scan script. Because the
    entropy layer is lossless, decoding must reproduce exactly
    :func:`reference_roundtrip` (gray) /
    :func:`reference_roundtrip_subsampled` (color)."""
    if channels not in (1, 3):
        raise JpegFormatError(f"channels must be 1 or 3, got {channels}")
    if len(pixels) != width * height * channels:
        raise JpegFormatError(
            f"pixel buffer {len(pixels)} != {width}x{height}x{channels}")
    if subsampling not in _SUBSAMPLINGS:
        raise JpegFormatError(
            f"subsampling {subsampling!r} unsupported "
            f"({'/'.join(sorted(_SUBSAMPLINGS))})")
    if channels == 1:
        img = np.frombuffer(bytes(pixels), dtype=np.uint8).reshape(
            height, width)
        blocks, bh, bw = _blocks_of(img)
        planes_blocks = [blocks]
        qts = [qt_luma]
        geos = [(1, 1)]                      # (h, v) sampling factors
        rasters = [(bh, bw)]                 # non-interleaved raster
        mch, mcw = bh, bw
        fx = fy = 1
    else:
        fx, fy = _SUBSAMPLINGS[subsampling]
        arr = np.frombuffer(bytes(pixels), dtype=np.uint8).reshape(
            height, width, 3)
        y, cb, cr = _rgb_to_ycbcr(arr)
        ph, pw = (-height) % (8 * fy), (-width) % (8 * fx)
        yb = _blocks_of(np.pad(y, ((0, ph), (0, pw)), mode="edge"))[0]
        cbb = _blocks_of(_box_downsample(cb, fx, fy))[0]
        crb = _blocks_of(_box_downsample(cr, fx, fy))[0]
        planes_blocks = [yb, cbb, crb]
        qts = [qt_luma, qt_chroma, qt_chroma]
        geos = [(fx, fy), (1, 1), (1, 1)]
        rasters = [((height + 7) // 8, (width + 7) // 8),
                   cbb.shape[:2], crb.shape[:2]]
        mch = (height + 8 * fy - 1) // (8 * fy)
        mcw = (width + 8 * fx - 1) // (8 * fx)
    # quantize every block ONCE into zigzag-order coefficient arrays —
    # identical numbers to what the baseline encoder would emit
    coefs = []
    for blocks, qt in zip(planes_blocks, qts):
        bh_i, bw_i = blocks.shape[:2]
        zz = np.empty((bh_i, bw_i, 64), dtype=np.int32)
        for r in range(bh_i):
            for c in range(bw_i):
                zz[r, c] = _fdct_quant(blocks[r, c],
                                       qt).reshape(64)[_ZIGZAG]
        coefs.append(zz)

    def blocks_in_scan(idxs):
        """Block order: MCU-interleaved for multi-component scans,
        the component's own raster for single-component scans
        (T.81 A.2.2/A.2.3)."""
        if len(idxs) == 1:
            ci = idxs[0]
            rh, rw = rasters[ci]
            for r in range(rh):
                for c in range(rw):
                    yield ci, r, c
            return
        for r in range(mch):
            for c in range(mcw):
                for ci in idxs:
                    h, v = geos[ci]
                    for by in range(v):
                        for bx in range(h):
                            yield ci, r * v + by, c * h + bx

    scans = b""
    for idxs, ss, se, ah, al in _progressive_script(channels):
        wr = _BitWriter()
        if ss == 0:                          # DC scan
            if ah == 0:
                preds = [0] * len(coefs)
                for ci, r, c in blocks_in_scan(idxs):
                    v = int(coefs[ci][r, c, 0]) >> al
                    diff = v - preds[ci]
                    preds[ci] = v
                    ssss, bits = _magnitude(diff)
                    code, ln = _FLAT_DC_ENC[ssss]
                    wr.write(code, ln)
                    if ssss:
                        wr.write(bits, ssss)
            else:                            # DC refinement: 1 bit/block
                for ci, r, c in blocks_in_scan(idxs):
                    wr.write((int(coefs[ci][r, c, 0]) >> al) & 1, 1)
        else:                                # AC scan: one component
            ci = idxs[0]
            rh, rw = rasters[ci]
            zzs = (coefs[ci][r, c] for r in range(rh)
                   for c in range(rw))
            if ah == 0:
                _enc_ac_first(wr, zzs, ss, se, al, _FLAT_AC_ENC)
            else:
                _enc_ac_refine(wr, zzs, ss, se, al, _FLAT_AC_ENC)
        body = bytes([len(idxs)])
        for ci in idxs:
            body += bytes([ci + 1, 0x00])    # DC table 0 / AC table 0
        body += bytes([ss, se, (ah << 4) | al])
        scans += _seg(0xFFDA, body) + wr.flush()

    if channels == 1:
        sof = struct.pack(">BHHB", 8, height, width, 1) + bytes([1, 0x11, 0])
        dqt = _seg(0xFFDB, bytes([0x00]) + _zz_bytes(qt_luma))
    else:
        sof = (struct.pack(">BHHB", 8, height, width, 3)
               + bytes([1, (fx << 4) | fy, 0]) + bytes([2, 0x11, 1])
               + bytes([3, 0x11, 1]))
        dqt = _seg(0xFFDB, bytes([0x00]) + _zz_bytes(qt_luma)
                   + bytes([0x01]) + _zz_bytes(qt_chroma))
    return (b"\xff\xd8" + _seg(0xFFE0, _JFIF) + dqt
            + _seg(0xFFC2, sof) + _seg(0xFFC4, _DHT_FLAT)
            + scans + b"\xff\xd9")


# -- progressive decoder ------------------------------------------------------

def _find_scan_end(data: bytes, pos: int) -> int:
    """Index of the first marker (0xFF + non-stuffing byte) at or
    after pos — the end of an entropy-coded segment."""
    i = pos
    n = len(data)
    while i + 1 < n:
        if data[i] == 0xFF and data[i + 1] != 0x00:
            if 0xD0 <= data[i + 1] <= 0xD7:
                raise JpegFormatError("restart intervals unsupported")
            return i
        i += 1
    raise JpegFormatError("unterminated entropy-coded segment")


def _decode_progressive(data: bytes, pos: int, width: int, height: int,
                        comps: list, qtables: dict, htables: dict):
    """Multi-scan progressive decode: accumulate coefficients (zigzag
    order) across DC/AC first and refinement scans, then dequantize +
    IDCT once at EOI. Returns the same tuple shape as the baseline
    path."""
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcw = (width + 8 * hmax - 1) // (8 * hmax)
    mch = (height + 8 * vmax - 1) // (8 * vmax)
    geo: dict = {}              # cid -> (h, v, tq, cw, ch, rbw, rbh)
    coefs: dict = {}            # cid -> (rows, cols, 64) zigzag int32
    for cid, h, v, tq in comps:
        cw = (width * h + hmax - 1) // hmax      # T.81 A.1.1 comp dims
        ch_ = (height * v + vmax - 1) // vmax
        geo[cid] = (h, v, tq, cw, ch_, (cw + 7) // 8, (ch_ + 7) // 8)
        coefs[cid] = np.zeros((mch * v, mcw * h, 64), dtype=np.int32)
    got_scan = False
    while pos + 2 <= len(data):
        if data[pos] != 0xFF:
            raise JpegFormatError(f"expected marker at {pos}")
        marker = data[pos + 1]
        if marker == 0xD9:
            break
        (length,) = struct.unpack(">H", data[pos + 2:pos + 4])
        body = data[pos + 4:pos + 2 + length]
        if len(body) != length - 2:
            raise JpegFormatError("truncated segment")
        if marker == 0xC4:
            _parse_dht(body, htables)
        elif marker == 0xDB:
            _parse_dqt(body, qtables)
        elif marker == 0xDD:
            raise JpegFormatError("restart intervals unsupported")
        elif marker == 0xDA:
            ns = body[0]
            scomps = []
            for i in range(ns):
                cs, tdta = body[1 + 2 * i], body[2 + 2 * i]
                if cs not in geo:
                    raise JpegFormatError(
                        f"scan references unknown component {cs}")
                scomps.append((cs, tdta >> 4, tdta & 15))
            ss, se = body[1 + 2 * ns], body[2 + 2 * ns]
            ahal = body[3 + 2 * ns]
            start = pos + 2 + length
            end = _find_scan_end(data, start)
            _decode_prog_scan(_BitReader(data[start:end]), scomps,
                              ss, se, ahal >> 4, ahal & 15, coefs,
                              geo, htables, mch, mcw)
            got_scan = True
            pos = end
            continue
        pos += 2 + length
    if not got_scan:
        raise JpegFormatError("no SOS marker")
    # reconstruct: dequant + IDCT per block, crop, upsample, transform
    planes = []
    for cid, h, v, tq in comps:
        _h, _v, _tq, cw, ch_, rbw, rbh = geo[cid]
        qt = qtables[tq]
        zz_arr = coefs[cid]
        out = np.empty((rbh * 8, rbw * 8), dtype=np.float64)
        for r in range(rbh):
            for c in range(rbw):
                nat = np.zeros(64, dtype=np.int32)
                nat[_ZIGZAG] = zz_arr[r, c]
                out[r * 8:r * 8 + 8, c * 8:c * 8 + 8] = \
                    _dequant_idct_f(nat.reshape(8, 8), qt) + 128.0
        p = out[:ch_, :cw]
        if h != hmax:
            p = np.repeat(p, hmax // h, axis=1)
        if v != vmax:
            p = np.repeat(p, vmax // v, axis=0)
        planes.append(p[:height, :width])
    if len(planes) == 1:
        gray = np.clip(np.round(planes[0]), 0, 255).astype(np.uint8)
        return width, height, 1, gray.tobytes()
    return width, height, 3, _ycbcr_to_rgb(*planes).tobytes()


def _decode_prog_scan(rd: "_BitReader", scomps: list, ss: int, se: int,
                      ah: int, al: int, coefs: dict, geo: dict,
                      htables: dict, mch: int, mcw: int) -> None:
    """One progressive scan (T.81 G.2): DC scans may be interleaved;
    AC scans cover one band of one component with EOB-run skipping;
    refinement scans (Ah>0) deliver one bit plane."""
    if ss == 0:                              # DC scan
        if se != 0:
            raise JpegFormatError("DC scan must have Se=0")

        def dc_blocks():
            if len(scomps) == 1:
                cs = scomps[0][0]
                _h, _v, _tq, _cw, _ch, rbw, rbh = geo[cs]
                for r in range(rbh):
                    for c in range(rbw):
                        yield cs, r, c
                return
            for r in range(mch):
                for c in range(mcw):
                    for cs, _td, _ta in scomps:
                        h, v = geo[cs][0], geo[cs][1]
                        for by in range(v):
                            for bx in range(h):
                                yield cs, r * v + by, c * h + bx

        if ah == 0:                          # first DC scan
            tabs = {}
            for cs, td, _ta in scomps:
                tab = htables.get((0, td))
                if tab is None:
                    raise JpegFormatError(f"missing DC table {td}")
                tabs[cs] = tab
            preds = {cs: 0 for cs, _t, _a in scomps}
            for cs, r, c in dc_blocks():
                s = _decode_symbol(rd, tabs[cs])
                preds[cs] += _extend(rd.read(s), s)
                coefs[cs][r, c, 0] = preds[cs] << al
        else:                                # DC refinement: 1 bit/block
            p1 = 1 << al
            for cs, r, c in dc_blocks():
                if rd.read(1):
                    coefs[cs][r, c, 0] |= p1
        return
    if len(scomps) != 1:
        raise JpegFormatError("AC scans must be non-interleaved")
    cs, _td, ta = scomps[0]
    ac_tab = htables.get((1, ta))
    if ac_tab is None:
        raise JpegFormatError(f"missing AC table {ta}")
    _h, _v, _tq, _cw, _ch, rbw, rbh = geo[cs]
    zz_arr = coefs[cs]
    eobrun = 0
    if ah == 0:                              # AC first scan (G.2.2)
        for r in range(rbh):
            for c in range(rbw):
                if eobrun:
                    eobrun -= 1
                    continue
                blk = zz_arr[r, c]
                k = ss
                while k <= se:
                    sym = _decode_symbol(rd, ac_tab)
                    rr, sbits = sym >> 4, sym & 15
                    if sbits == 0:
                        if rr != 15:         # EOBn: run of ended bands
                            eobrun = (1 << rr) - 1
                            if rr:
                                eobrun += rd.read(rr)
                            break
                        k += 16              # ZRL
                        continue
                    k += rr
                    if k > se:
                        raise JpegFormatError("coefficient index "
                                              "outside scan band")
                    blk[k] = _extend(rd.read(sbits), sbits) << al
                    k += 1
        return
    # AC refinement scan (G.2.2 / public libjpeg decode structure):
    # every nonzero-history coefficient passed over consumes one
    # correction bit; new coefficients appear as +-1 at this bit plane.
    p1, m1 = 1 << al, -(1 << al)
    for r in range(rbh):
        for c in range(rbw):
            blk = zz_arr[r, c]
            k = ss
            if eobrun == 0:
                while k <= se:
                    sym = _decode_symbol(rd, ac_tab)
                    rr, sbits = sym >> 4, sym & 15
                    newval = 0
                    if sbits:
                        if sbits != 1:
                            raise JpegFormatError(
                                "refinement magnitude must be 1")
                        newval = p1 if rd.read(1) else m1
                    elif rr != 15:
                        eobrun = 1 << rr
                        if rr:
                            eobrun += rd.read(rr)
                        break                # rest handled below
                    # advance over rr zero-history positions,
                    # correcting nonzero-history coefficients en route
                    while k <= se:
                        cur = int(blk[k])
                        if cur != 0:
                            if rd.read(1) and (cur & p1) == 0:
                                blk[k] = cur + (p1 if cur >= 0 else m1)
                        else:
                            if rr == 0:
                                break
                            rr -= 1
                        k += 1
                    if newval:
                        if k > se:
                            raise JpegFormatError(
                                "refinement ran outside scan band")
                        blk[k] = newval
                    k += 1
            if eobrun > 0:
                while k <= se:               # trailing corrections
                    cur = int(blk[k])
                    if cur != 0:
                        if rd.read(1) and (cur & p1) == 0:
                            blk[k] = cur + (p1 if cur >= 0 else m1)
                    k += 1
                eobrun -= 1
