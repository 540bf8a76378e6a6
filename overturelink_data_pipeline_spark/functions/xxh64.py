"""Pure-Python XXH64 matching Spark's ``F.xxhash64`` bit-for-bit.

Spark's hash expression applies the public xxHash64 algorithm
(Yann Collet's spec; Spark ports it in
sql/catalyst/expressions/XXH64 — public Apache-2 code) with seed 42,
chaining multi-argument calls by feeding each value's hash in as the
seed of the next. Per-type mapping (LongType → 8 LE bytes via the
specialized long path, IntegerType → 4 LE bytes, StringType → UTF-8
bytes), all public semantics.

Why this exists: the MinHash/SimHash dedup goldens
(fixtures/dedup_golden/, scripts/gen_dedup_goldens.py) are generated
by THIS independent implementation, never by the Spark operators they
check — the same freeze-by-independent-path pattern the geometry
goldens use (geo/fixtures.py). tests/test_llm_ops.py pins this module
against ``F.xxhash64`` on sampled strings/longs/ints and chains.

The numpy variants vectorize the two fixed-width kernels (long, and
the 64-bit signature math built on it) for the generator's
33-hash × shingle sweep; they are generation-time tools, not engine
operators — the engine's hot path stays JVM-side ``F.xxhash64``.
"""

from __future__ import annotations

import numpy as np

_M = (1 << 64) - 1
_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5

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


def _round(acc: int, lane: int) -> int:
    acc = (acc + lane * _P2) & _M
    return (_rotl(acc, 31) * _P1) & _M


def xxh64_bytes(data: bytes, seed: int = SPARK_SEED) -> int:
    """Canonical XXH64 over bytes (unsigned result)."""
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
        for v in (v1, v2, v3, v4):
            h = ((h ^ _round(0, v)) * _P1 + _P4) & _M
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


def hash_long(v: int, seed: int = SPARK_SEED) -> int:
    """XXH64 of one 64-bit value (Spark LongType path); unsigned."""
    h = (seed + _P5 + 8) & _M
    h ^= _round(0, v & _M)
    h = (_rotl(h, 27) * _P1 + _P4) & _M
    return _fmix(h)


def hash_int(v: int, seed: int = SPARK_SEED) -> int:
    """XXH64 of one 32-bit value (Spark IntegerType path); unsigned."""
    h = (seed + _P5 + 4) & _M
    h ^= ((v & 0xFFFFFFFF) * _P1) & _M
    h = (_rotl(h, 23) * _P2 + _P3) & _M
    return _fmix(h)


def _signed(u: int) -> int:
    return u - (1 << 64) if u >= (1 << 63) else u


def spark_xxhash64(*values, seed: int = SPARK_SEED) -> int:
    """``F.xxhash64(*values)`` replica: chain each value's hash as the
    next seed. Values: str → UTF-8 bytes, ('int', i) tuple → 32-bit
    path (an IntegerType literal), plain int → 64-bit path (LongType).
    Returns the SIGNED long Spark produces."""
    h = seed
    for v in values:
        if isinstance(v, str):
            h = xxh64_bytes(v.encode("utf-8"), h)
        elif isinstance(v, bytes):
            h = xxh64_bytes(v, h)
        elif isinstance(v, tuple) and v[0] == "int":
            h = hash_int(v[1], h)
        else:
            h = hash_long(v, h)
    return _signed(h)


# ---------------------------------------------------------------------------
# numpy-vectorized kernels (generator-side only)
# ---------------------------------------------------------------------------

_U = np.uint64


def hash_long_vec(vals: np.ndarray, seed: int) -> np.ndarray:
    """Vectorized :func:`hash_long` over a uint64 array (uint64 out)."""
    with np.errstate(over="ignore"):
        acc = vals.astype(np.uint64) * _U(_P2)
        acc = (acc << _U(31)) | (acc >> _U(33))
        k = acc * _U(_P1)
        h = np.full(vals.shape, (seed + _P5 + 8) & _M, dtype=np.uint64) ^ k
        h = ((h << _U(27)) | (h >> _U(37))) * _U(_P1) + _U(_P4)
        h ^= h >> _U(33)
        h *= _U(_P2)
        h ^= h >> _U(29)
        h *= _U(_P3)
        h ^= h >> _U(32)
    return h
