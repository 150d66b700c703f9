"""Pure-Python XXH64 (Collet's public xxHash spec), bit-compatible with
Spark's ``F.xxhash64`` on string columns (seed 42, UTF-8 bytes).

Used driver-side to map query terms to index buckets without launching
a Spark job per query; parity with the JVM implementation is pinned by
tests/test_xxhash.py across random strings.
"""

from __future__ import annotations

_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5
_M = (1 << 64) - 1

SPARK_SEED = 42  # Spark's fixed xxhash64 seed


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M


def _round(acc: int, inp: int) -> int:
    acc = (acc + inp * _P2) & _M
    return (_rotl(acc, 31) * _P1) & _M


def _merge_round(acc: int, val: int) -> int:
    acc ^= _round(0, val)
    return (acc * _P1 + _P4) & _M


def xxhash64(data: bytes | str, seed: int = SPARK_SEED) -> int:
    """XXH64 → signed 64-bit int (matching Spark's LongType output)."""
    if isinstance(data, str):
        data = data.encode("utf-8")
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _M
        v2 = (seed + _P2) & _M
        v3 = seed & _M
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
    h ^= h >> 33
    h = (h * _P2) & _M
    h ^= h >> 29
    h = (h * _P3) & _M
    h ^= h >> 32
    return h - (1 << 64) if h >= (1 << 63) else h


def term_bucket(term: str, n_buckets: int) -> int:
    """pmod(xxhash64(term), n_buckets) — Spark's pmod semantics."""
    return xxhash64(term) % n_buckets


def xxhash64_long_vec(vals, seed: int = SPARK_SEED):
    """Vectorized XXH64 of int64 values, bit-compatible with Spark's
    ``F.xxhash64`` on a LongType column (XXH64.hashLong: the 8-byte
    single-block path — one round fold + 27-rotl + fmix). Returns a
    SIGNED int64 array; parity with the JVM is pinned by
    tests/test_xxhash.py. Used to assign postings to shards inside the
    SPIMI run encoder without a JVM round-trip."""
    import numpy as np

    x = np.asarray(vals).astype(np.int64).view(np.uint64)
    P1, P2, P3 = np.uint64(_P1), np.uint64(_P2), np.uint64(_P3)
    P4, P5 = np.uint64(_P4), np.uint64(_P5)
    with np.errstate(over="ignore"):
        h = np.uint64((seed + _P5 + 8) & _M)
        k = x * P2
        k = ((k << np.uint64(31)) | (k >> np.uint64(33))) * P1
        h = h ^ k
        h = (((h << np.uint64(27)) | (h >> np.uint64(37))) * P1) + P4
        h ^= h >> np.uint64(33)
        h *= P2
        h ^= h >> np.uint64(29)
        h *= P3
        h ^= h >> np.uint64(32)
    return h.view(np.int64)
