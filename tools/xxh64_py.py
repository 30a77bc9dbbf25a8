"""Pure-Python / numpy XXH64 — bit-compatible with Spark's ``xxhash64``.

Spark's ``XxHash64`` expression (sql/catalyst XXH64.java) is the standard
xxHash64 algorithm applied to each child's byte representation, chaining
the running hash as the next child's seed (initial seed 42):

- LongType   -> XXH64 of the 8-byte little-endian two's complement
- IntegerType-> XXH64 of the 4-byte little-endian two's complement
- StringType -> XXH64 of the UTF-8 bytes

This module exists so the DuckDB oracle connection can replay the
xxhash64-based production dedup/ANN paths (MinHash seeds, band buckets,
SimHash token hashes) value-exactly. ``xxh64_bytes`` is the scalar
reference; ``hash8_vec``/``hash4_vec`` are numpy-vectorized
specializations of the 8-/4-byte tail paths (closed-form, no loop over
stripes) used for the hot per-row seeded re-hashes.

Public knowledge only: the xxHash64 algorithm is public domain
(Yann Collet); the Spark byte-encoding contract is from the Apache Spark
source (catalyst/expressions/XXH64.java, HashExpression codegen).
"""

from __future__ import annotations

import struct

import numpy as np

P1 = 0x9E3779B185EBCA87
P2 = 0xC2B2AE3D27D4EB4F
P3 = 0x165667B19E3779F9
P4 = 0x85EBCA77C2B2AE63
P5 = 0x27D4EB2F165667C5
_M = (1 << 64) - 1


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M


def _fmix(h: int) -> int:
    h ^= h >> 33
    h = (h * P2) & _M
    h ^= h >> 29
    h = (h * P3) & _M
    h ^= h >> 32
    return h


def xxh64_bytes(data: bytes, seed: int) -> int:
    """Standard XXH64 over ``data`` with ``seed`` (unsigned 64-bit out)."""
    seed &= _M
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + P1 + P2) & _M
        v2 = (seed + P2) & _M
        v3 = seed
        v4 = (seed - P1) & _M
        while i <= n - 32:
            for _ in range(1):
                k1, k2, k3, k4 = struct.unpack_from("<QQQQ", data, i)
            v1 = (_rotl((v1 + k1 * P2) & _M, 31) * P1) & _M
            v2 = (_rotl((v2 + k2 * P2) & _M, 31) * P1) & _M
            v3 = (_rotl((v3 + k3 * P2) & _M, 31) * P1) & _M
            v4 = (_rotl((v4 + k4 * P2) & _M, 31) * P1) & _M
            i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _M
        for v in (v1, v2, v3, v4):
            h ^= (_rotl((v * P2) & _M, 31) * P1) & _M
            h = (h * P1 + P4) & _M
    else:
        h = (seed + P5) & _M
    h = (h + n) & _M
    while i + 8 <= n:
        k = struct.unpack_from("<Q", data, i)[0]
        h ^= (_rotl((k * P2) & _M, 31) * P1) & _M
        h = (_rotl(h, 27) * P1 + P4) & _M
        i += 8
    if i + 4 <= n:
        k = struct.unpack_from("<I", data, i)[0]
        h ^= (k * P1) & _M
        h = (_rotl(h, 23) * P2 + P3) & _M
        i += 4
    while i < n:
        h ^= (data[i] * P5) & _M
        h = (_rotl(h, 11) * P1) & _M
        i += 1
    return _fmix(h)


def _signed(h: int) -> int:
    return h - (1 << 64) if h >= (1 << 63) else h


def xxh64_str(s: str, seed: int) -> int:
    """Spark ``xxhash64(string_col)`` twin (signed 64-bit)."""
    return _signed(xxh64_bytes(s.encode("utf-8"), seed))


def xxh64_long(x: int, seed: int) -> int:
    """Spark ``xxhash64(long_col)`` twin (signed in, signed out)."""
    return _signed(xxh64_bytes(struct.pack("<q", x), seed))


def xxh64_int(x: int, seed: int) -> int:
    """Spark ``xxhash64(int_col)`` twin (4-byte encoding)."""
    return _signed(xxh64_bytes(struct.pack("<i", x), seed))


# -- numpy-vectorized closed forms (8- and 4-byte inputs) -------------------

_uP1 = np.uint64(P1)
_uP2 = np.uint64(P2)
_uP3 = np.uint64(P3)
_uP4 = np.uint64(P4)
_uP5 = np.uint64(P5)


def _rotl_vec(x: np.ndarray, r: int) -> np.ndarray:
    return (x << np.uint64(r)) | (x >> np.uint64(64 - r))


def _fmix_vec(h: np.ndarray) -> np.ndarray:
    h = h ^ (h >> np.uint64(33))
    h = h * _uP2
    h = h ^ (h >> np.uint64(29))
    h = h * _uP3
    return h ^ (h >> np.uint64(32))


def hash8_vec(x: np.ndarray, seed: np.ndarray) -> np.ndarray:
    """XXH64 of each 8-byte LE value (uint64 views in, uint64 out)."""
    h = seed + _uP5 + np.uint64(8)
    k1 = _rotl_vec(x * _uP2, 31) * _uP1
    h = h ^ k1
    h = _rotl_vec(h, 27) * _uP1 + _uP4
    return _fmix_vec(h)


def hash4_vec(x: np.ndarray, seed: np.ndarray) -> np.ndarray:
    """XXH64 of each 4-byte LE value (int interpreted unsigned 32-bit)."""
    h = seed + _uP5 + np.uint64(4)
    h = h ^ ((x & np.uint64(0xFFFFFFFF)) * _uP1)
    h = _rotl_vec(h, 23) * _uP2 + _uP3
    return _fmix_vec(h)
