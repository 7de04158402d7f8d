"""Pure-python XXH64 matching Spark's `xxhash64` expression.

XXH64 is Yann Collet's public-domain/BSD hash (github.com/Cyan4973/xxHash);
Spark's Catalyst XxHash64 expression applies it per column with seed
chaining: ``hash = 42; for col in cols: hash = H(col, seed=hash)`` where H is
- standard XXH64 over UTF-8 bytes for strings/binary,
- a one-block primitive for int (4 bytes, zero-extended) and long (8 bytes).

Implemented here from the public specification so the single-process oracle
builder can reproduce Spark's MinHash/SRP bucket assignments exactly.  All
arithmetic is 64-bit wrapping; results are returned as *signed* 64-bit ints
(Java long semantics) to compare like Spark column values.
"""

from __future__ import annotations

_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5
_M = 0xFFFFFFFFFFFFFFFF

DEFAULT_SEED = 42


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


def _merge(h: int, acc: int) -> int:
    h ^= _round(0, acc)
    return (h * _P1 + _P4) & _M


def xxh64_bytes(data: bytes, seed: int = DEFAULT_SEED) -> int:
    """Standard XXH64 over bytes; returns unsigned 64-bit."""
    seed &= _M
    n = len(data)
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
        h = _merge(h, v1)
        h = _merge(h, v2)
        h = _merge(h, v3)
        h = _merge(h, v4)
    else:
        h = (seed + _P5) & _M
    h = (h + n) & _M
    while i + 8 <= n:
        h ^= _round(0, int.from_bytes(data[i : i + 8], "little"))
        h = (_rotl(h, 27) * _P1 + _P4) & _M
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


def xxh64_long(value: int, seed: int = DEFAULT_SEED) -> int:
    """Spark's hashLong primitive (8-byte block)."""
    h = (seed + _P5 + 8) & _M
    h ^= (_rotl((value & _M) * _P2 & _M, 31) * _P1) & _M
    h = (_rotl(h, 27) * _P1 + _P4) & _M
    return _fmix(h)


def xxh64_int(value: int, seed: int = DEFAULT_SEED) -> int:
    """Spark's hashInt primitive (4-byte block, zero-extended)."""
    h = (seed + _P5 + 4) & _M
    h ^= ((value & 0xFFFFFFFF) * _P1) & _M
    h = (_rotl(h, 23) * _P2 + _P3) & _M
    return _fmix(h)


def _signed(v: int) -> int:
    return v - (1 << 64) if v >= (1 << 63) else v


def spark_xxhash64(*values, seed: int = DEFAULT_SEED) -> int:
    """Replicates F.xxhash64(*cols): seed-chained per value, signed result.

    str/bytes -> byte hash; int -> Spark IntegerType primitive if it fits in
    int32 (pyspark F.lit of a small python int is IntegerType), else long.
    """
    h = seed
    for v in values:
        if isinstance(v, str):
            h = xxh64_bytes(v.encode("utf-8"), h)
        elif isinstance(v, (bytes, bytearray)):
            h = xxh64_bytes(bytes(v), h)
        elif isinstance(v, bool):
            raise TypeError("bool not supported")
        elif isinstance(v, int):
            if -(2**31) <= v < 2**31:
                h = xxh64_int(v, h)
            else:
                h = xxh64_long(v, h)
        else:
            raise TypeError(f"unsupported type {type(v)}")
    return _signed(h)
