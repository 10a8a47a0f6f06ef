"""Pure-Python reimplementation of Spark's ``xxhash64`` expression
(XxHash64 / XXH64.java), bit-exact, for deriving DuckDB-free oracles of
hash-dependent operators (MinHash, SimHash, synthetic media metadata) on
the deterministic test corpora. Parity vs the JVM expression is pinned
by tests/test_xxh64_parity.py over random ints/longs/strings/chains.

Semantics mirrored:
- default seed 42;
- multi-argument ``xxhash64(a, b, ...)`` chains: the hash of each child
  becomes the seed for the next;
- IntegerType → hashInt (4-byte path), LongType → hashLong,
  StringType → hashUnsafeBytes over UTF-8 (little-endian word reads).
"""

from __future__ import annotations

M = (1 << 64) - 1
P1 = 0x9E3779B185EBCA87
P2 = 0xC2B2AE3D27D4EB4F
P3 = 0x165667B19E3779F9
P4 = 0x85EBCA77C2B2AE63
P5 = 0x27D4EB2F165667C5

DEFAULT_SEED = 42


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & M


def _fmix(h: int) -> int:
    h ^= h >> 33
    h = (h * P2) & M
    h ^= h >> 29
    h = (h * P3) & M
    h ^= h >> 32
    return h


def _to_signed(x: int) -> int:
    x &= M
    return x - (1 << 64) if x >= (1 << 63) else x


def hash_int(value: int, seed: int) -> int:
    """XXH64.hashInt — Spark's 4-byte path for IntegerType columns."""
    h = (seed + P5 + 4) & M
    h ^= ((value & 0xFFFFFFFF) * P1) & M
    h = ((_rotl(h, 23) * P2) + P3) & M
    return _to_signed(_fmix(h))


def hash_long(value: int, seed: int) -> int:
    """XXH64.hashLong — Spark's 8-byte path for LongType columns."""
    h = (seed + P5 + 8) & M
    h ^= (_rotl((value * P2) & M, 31) * P1) & M
    h = ((_rotl(h, 27) * P1) + P4) & M
    return _to_signed(_fmix(h))


def hash_bytes(data: bytes, seed: int) -> int:
    """XXH64.hashUnsafeBytes — Spark's byte-array path (strings hash
    their UTF-8 bytes). Word reads are little-endian (Unsafe/x86)."""
    seed &= M
    length = len(data)
    aligned = length - (length % 8)
    # hashBytesByWords
    if aligned >= 32:
        v1 = (seed + P1 + P2) & M
        v2 = (seed + P2) & M
        v3 = seed
        v4 = (seed - P1) & M
        i = 0
        while i <= aligned - 32:
            v1 = (_rotl((v1 + int.from_bytes(data[i:i + 8], "little")
                         * P2) & M, 31) * P1) & M
            v2 = (_rotl((v2 + int.from_bytes(data[i + 8:i + 16], "little")
                         * P2) & M, 31) * P1) & M
            v3 = (_rotl((v3 + int.from_bytes(data[i + 16:i + 24], "little")
                         * P2) & M, 31) * P1) & M
            v4 = (_rotl((v4 + int.from_bytes(data[i + 24:i + 32], "little")
                         * P2) & M, 31) * P1) & M
            i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12)
             + _rotl(v4, 18)) & M
        for v in (v1, v2, v3, v4):
            h ^= (_rotl((v * P2) & M, 31) * P1) & M
            h = ((h * P1) + P4) & M
    else:
        h = (seed + P5) & M
        i = 0
    h = (h + length) & M
    while i <= aligned - 8:
        k1 = (_rotl((int.from_bytes(data[i:i + 8], "little") * P2) & M,
                    31) * P1) & M
        h = ((_rotl(h ^ k1, 27) * P1) + P4) & M
        i += 8
    if i + 4 <= length:
        h ^= (int.from_bytes(data[i:i + 4], "little") * P1) & M
        h = ((_rotl(h, 23) * P2) + P3) & M
        i += 4
    while i < length:
        h ^= (data[i] * P5) & M
        h = (_rotl(h, 11) * P1) & M
        i += 1
    return _to_signed(_fmix(h))


def hash_long_np(values, seeds):
    """Vectorized :func:`hash_long` over numpy uint64 arrays (values and
    seeds broadcast). Returns int64 (Spark-signed) array."""
    import numpy as np

    with np.errstate(over="ignore"):
        v = np.asarray(values).astype(np.uint64)
        s = np.asarray(seeds).astype(np.uint64)
        v, s = np.broadcast_arrays(v, s)
        p1, p2 = np.uint64(P1), np.uint64(P2)
        h = s + np.uint64(P5) + np.uint64(8)
        k = v * p2
        k = ((k << np.uint64(31)) | (k >> np.uint64(33))) * p1
        h ^= k
        h = ((h << np.uint64(27)) | (h >> np.uint64(37))) * p1 + np.uint64(P4)
        return _fmix_np(h)


def hash_int_np(values, seeds):
    """Vectorized :func:`hash_int` (4-byte path)."""
    import numpy as np

    with np.errstate(over="ignore"):
        v = np.asarray(values).astype(np.uint64) & np.uint64(0xFFFFFFFF)
        s = np.asarray(seeds).astype(np.uint64)
        v, s = np.broadcast_arrays(v, s)
        h = s + np.uint64(P5) + np.uint64(4)
        h = h ^ v * np.uint64(P1)
        h = ((h << np.uint64(23)) | (h >> np.uint64(41))) * np.uint64(P2) \
            + np.uint64(P3)
        return _fmix_np(h)


def _fmix_np(h):
    import numpy as np

    with np.errstate(over="ignore"):
        h ^= h >> np.uint64(33)
        h *= np.uint64(P2)
        h ^= h >> np.uint64(29)
        h *= np.uint64(P3)
        h ^= h >> np.uint64(32)
        return h.astype(np.int64)


def xxhash64(*values, seed: int = DEFAULT_SEED) -> int:
    """Spark-compatible ``F.xxhash64(*cols)``: chain each value's hash
    as the next value's seed. Python ints in [-2^31, 2^31) hash as
    IntegerType (matching ``F.lit(int)``), larger ints as LongType;
    pass ``("long", v)`` to force the 8-byte path; str hashes UTF-8;
    bytes hash raw. None (NULL) leaves the running hash unchanged."""
    h = seed
    for v in values:
        if v is None:
            continue
        if isinstance(v, tuple):
            kind, v = v
            h = hash_long(v, h) if kind == "long" else hash_int(v, h)
        elif isinstance(v, bool):
            h = hash_int(1 if v else 0, h)
        elif isinstance(v, int):
            h = (hash_int(v, h) if -(1 << 31) <= v < (1 << 31)
                 else hash_long(v, h))
        elif isinstance(v, str):
            h = hash_bytes(v.encode("utf-8"), h)
        elif isinstance(v, bytes):
            h = hash_bytes(v, h)
        else:
            raise TypeError(f"unsupported type {type(v)}")
    return h
