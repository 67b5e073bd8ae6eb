"""Pure-Python XXH64 — the engine's shared hash *specification*.

Spark's built-in ``xxhash64(col)`` is XXH64 with seed 42 over the column's
byte representation (UTF-8 bytes for strings, little-endian 8 bytes for
longs). The reference simulator (maga_spark.sim) is plain Python and must
produce the *same* ``url_hash`` values the Spark engine computes with the
built-in, so this module implements the public XXH64 algorithm
(github.com/Cyan4973/xxHash spec, public domain) from scratch. Parity with
Spark's implementation is asserted by tests/test_functions.py.

Reference analog: the crawler's canonical identity key is
``proper_infohash`` (maga/utils.py:7-11); here identity = xxh64(url_canon).
All randomness in the reference (os.urandom, maga/utils.py:14-15) is replaced
by hash-derived values from this module (SURVEY.md §7.6).
"""

from __future__ import annotations

import struct

_M64 = (1 << 64) - 1
_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5

SPARK_SEED = 42


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M64


def _round(acc: int, inp: int) -> int:
    acc = (acc + inp * _P2) & _M64
    return (_rotl(acc, 31) * _P1) & _M64


def _merge_round(h: int, v: int) -> int:
    h ^= _round(0, v)
    return (h * _P1 + _P4) & _M64


def _avalanche(h: int) -> int:
    h ^= h >> 33
    h = (h * _P2) & _M64
    h ^= h >> 29
    h = (h * _P3) & _M64
    h ^= h >> 32
    return h


def xxh64(data: bytes, seed: int = SPARK_SEED) -> int:
    """XXH64 of raw bytes, unsigned 64-bit result."""
    seed &= _M64
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _M64
        v2 = (seed + _P2) & _M64
        v3 = seed
        v4 = (seed - _P1) & _M64
        while i <= n - 32:
            (a, b, c, d) = struct.unpack_from("<QQQQ", data, i)
            v1, v2, v3, v4 = _round(v1, a), _round(v2, b), _round(v3, c), _round(v4, d)
            i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _M64
        h = _merge_round(h, v1)
        h = _merge_round(h, v2)
        h = _merge_round(h, v3)
        h = _merge_round(h, v4)
    else:
        h = (seed + _P5) & _M64
    h = (h + n) & _M64
    while i + 8 <= n:
        (k,) = struct.unpack_from("<Q", data, i)
        h ^= _round(0, k)
        h = (_rotl(h, 27) * _P1 + _P4) & _M64
        i += 8
    if i + 4 <= n:
        (k,) = struct.unpack_from("<I", data, i)
        h ^= (k * _P1) & _M64
        h = (_rotl(h, 23) * _P2 + _P3) & _M64
        i += 4
    while i < n:
        h ^= (data[i] * _P5) & _M64
        h = (_rotl(h, 11) * _P1) & _M64
        i += 1
    return _avalanche(h)


def _to_signed(u: int) -> int:
    return u - (1 << 64) if u >= (1 << 63) else u


def xxh64_str(s: str, seed: int = SPARK_SEED) -> int:
    """Signed int64 XXH64 of a string's UTF-8 bytes — equals Spark's
    ``xxhash64(string_col)`` (Spark emits signed longs)."""
    return _to_signed(xxh64(s.encode("utf-8"), seed))


def xxh64_long(v: int, seed: int = SPARK_SEED) -> int:
    """Signed int64 XXH64 of a long's little-endian 8 bytes — equals Spark's
    ``xxhash64(long_col)``."""
    return _to_signed(xxh64(struct.pack("<q", v), seed))
