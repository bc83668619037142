"""Pure-Python xxHash64 compatible with Spark's ``F.xxhash64`` (seed 42).

Used by tools/gen_oracle_fixtures.py to reimplement the MinHash / SimHash /
IVF pipelines independently of Spark, so their gate oracles are not
self-referential. The algorithm is the public XXH64 spec
(https://github.com/Cyan4973/xxHash/blob/dev/doc/xxhash_spec.md); the
Spark-specific parts are the seed (42), the per-type encodings
(strings hash their UTF-8 bytes; int/long inputs use the 4-/8-byte
specialized paths), and multi-argument chaining (the running hash seeds the
next column's hash) — see Spark's
``org.apache.spark.sql.catalyst.expressions.XxHash64`` /
``org.apache.spark.unsafe.hash.XXH64`` (Apache-2.0, re-derived here from the
spec, not copied).
"""

from __future__ import annotations

_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5
_M = 0xFFFFFFFFFFFFFFFF

SPARK_SEED = 42


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M


def _fmix(h: int) -> int:
    h ^= h >> 33
    h = (h * _P2) & _M
    h ^= h >> 29
    h = (h * _P3) & _M
    h ^= h >> 32
    return h


def _round(acc: int, inp: int) -> int:
    acc = (acc + inp * _P2) & _M
    acc = _rotl(acc, 31)
    return (acc * _P1) & _M


def _merge_round(h: int, acc: int) -> int:
    h ^= _round(0, acc)
    return (h * _P1 + _P4) & _M


def xxh64_bytes(data: bytes, seed: int) -> int:
    """XXH64 of a byte string (unsigned 64-bit result)."""
    n = len(data)
    seed &= _M
    i = 0
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _M
        v2 = (seed + _P2) & _M
        v3 = seed
        v4 = (seed - _P1) & _M
        while i + 32 <= n:
            v1 = _round(v1, int.from_bytes(data[i : i + 8], "little"))
            v2 = _round(v2, int.from_bytes(data[i + 8 : i + 16], "little"))
            v3 = _round(v3, int.from_bytes(data[i + 16 : i + 24], "little"))
            v4 = _round(v4, int.from_bytes(data[i + 24 : i + 32], "little"))
            i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _M
        h = _merge_round(h, v1)
        h = _merge_round(h, v2)
        h = _merge_round(h, v3)
        h = _merge_round(h, v4)
    else:
        h = (seed + _P5) & _M
    h = (h + n) & _M
    while i + 8 <= n:
        k1 = _round(0, int.from_bytes(data[i : i + 8], "little"))
        h = (_rotl(h ^ k1, 27) * _P1 + _P4) & _M
        i += 8
    if i + 4 <= n:
        h ^= (int.from_bytes(data[i : i + 4], "little") * _P1) & _M
        h = (_rotl(h, 23) * _P2 + _P3) & _M
        i += 4
    while i < n:
        h ^= (data[i] * _P5) & _M
        h = (_rotl(h, 11) * _P1) & _M
        i += 1
    return _fmix(h)


def xxh64_long(value: int, seed: int) -> int:
    """Spark XXH64.hashLong: the 8-byte specialized path (LongType columns)."""
    h = (seed + _P5 + 8) & _M
    k1 = _round(0, value & _M)
    h = (_rotl(h ^ k1, 27) * _P1 + _P4) & _M
    return _fmix(h)


def xxh64_int(value: int, seed: int) -> int:
    """Spark XXH64.hashInt: the 4-byte specialized path (IntegerType columns,
    value zero-extended from its 32-bit two's-complement representation)."""
    h = (seed + _P5 + 4) & _M
    h ^= ((value & 0xFFFFFFFF) * _P1) & _M
    h = (_rotl(h, 23) * _P2 + _P3) & _M
    return _fmix(h)


def _signed(h: int) -> int:
    return h - (1 << 64) if h >= (1 << 63) else h


def spark_xxhash64(*cols) -> int:
    """Spark ``xxhash64(col, ...)`` (signed 64-bit, like Spark's LongType).

    Strings hash their UTF-8 bytes; Python ints are treated as Spark
    IntegerType when they fit in 32 bits (what ``F.lit(small_int)`` produces)
    — pass ``("long", v)`` to force the LongType path. The hash of column i
    seeds column i+1 (Spark folds left starting from seed 42).
    """
    h = SPARK_SEED
    for c in cols:
        if isinstance(c, tuple) and c[0] == "long":
            h = xxh64_long(int(c[1]), h)
        elif isinstance(c, str):
            h = xxh64_bytes(c.encode("utf-8"), h)
        elif isinstance(c, int):
            if -(2**31) <= c < 2**31:
                h = xxh64_int(c, h)
            else:
                h = xxh64_long(c, h)
        else:
            raise TypeError(f"unsupported type {type(c)}")
    return _signed(h)
