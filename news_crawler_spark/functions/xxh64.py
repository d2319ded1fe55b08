"""Pure-Python XXH64 — bit-identical to Spark's ``F.xxhash64`` on strings.

Spark hashes a string column as XXH64(utf8_bytes, seed=42)
(org.apache.spark.sql.catalyst.expressions.XxHash64). The engine uses the
JVM built-in everywhere; this Python twin exists so the *test oracle* and
the deterministic synthetic generators can reproduce the same 64-bit ids
without a JVM. Verified against ``F.xxhash64`` in tests/test_urls.py.

Algorithm: the public XXH64 spec (Yann Collet, github.com/Cyan4973/xxHash).
"""

from __future__ import annotations

import struct

_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5
_M64 = 0xFFFFFFFFFFFFFFFF

SPARK_SEED = 42  # Spark's default seed for xxhash64 (XxHash64 expression)


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M64


def _round(acc: int, inp: int) -> int:
    acc = (acc + inp * _P2) & _M64
    return (_rotl(acc, 31) * _P1) & _M64


def _merge_round(acc: int, val: int) -> int:
    acc ^= _round(0, val)
    return ((acc * _P1) + _P4) & _M64


def xxh64(data: bytes, seed: int = SPARK_SEED) -> int:
    """XXH64 of ``data`` as an *unsigned* 64-bit int."""
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _M64
        v2 = (seed + _P2) & _M64
        v3 = seed & _M64
        v4 = (seed - _P1) & _M64
        while i <= n - 32:
            x1, x2, x3, x4 = struct.unpack_from("<QQQQ", data, i)
            v1 = _round(v1, x1)
            v2 = _round(v2, x2)
            v3 = _round(v3, x3)
            v4 = _round(v4, x4)
            i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _M64
        h = _merge_round(h, v1)
        h = _merge_round(h, v2)
        h = _merge_round(h, v3)
        h = _merge_round(h, v4)
    else:
        h = (seed + _P5) & _M64
    h = (h + n) & _M64
    while i <= n - 8:
        (k1,) = struct.unpack_from("<Q", data, i)
        h ^= _round(0, k1)
        h = (_rotl(h, 27) * _P1 + _P4) & _M64
        i += 8
    if i <= n - 4:
        (k1,) = struct.unpack_from("<I", data, i)
        h ^= (k1 * _P1) & _M64
        h = (_rotl(h, 23) * _P2 + _P3) & _M64
        i += 4
    while i < n:
        h ^= (data[i] * _P5) & _M64
        h = (_rotl(h, 11) * _P1) & _M64
        i += 1
    h ^= h >> 33
    h = (h * _P2) & _M64
    h ^= h >> 29
    h = (h * _P3) & _M64
    h ^= h >> 32
    return h


def xxh64_str(s: str, seed: int = SPARK_SEED) -> int:
    """Signed 64-bit XXH64 of a string's UTF-8 bytes — equals Spark's
    ``F.xxhash64(col)`` for string columns."""
    u = xxh64(s.encode("utf-8"), seed)
    return u - (1 << 64) if u >= (1 << 63) else u
