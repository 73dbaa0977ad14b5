"""Pure-Python XXH64 for 8-byte integers — bit-identical to Spark's
``F.xxhash64`` on a LongType column (default seed 42).

Why it exists: the IVF/k-means training sample is hash-STRIDED across
the corpus (``operators/similarity.py kmeans_centroids``: rows where
``pmod(xxhash64(id), stride) == 0``). The DuckDB oracles for the
seeded similarity family recompute the whole pipeline sequentially,
so above the stride-1 scale (N > 4096: the sf1 gate caught q278
diverging there) they must reproduce the SAME sample — which requires
the same hash. This is the single-lane specialization of the public
XXH64 algorithm (Yann Collet), matching Spark's ``XXH64.hashLong``:
one 8-byte round, no stripe loop, standard avalanche.

``tests/test_similarity.py`` asserts equality against Spark's own
``xxhash64`` over a value sweep, so any drift fails fast.
"""

from __future__ import annotations

_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5
_M = (1 << 64) - 1


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M


def xxh64_long(value: int, seed: int = 42) -> int:
    """XXH64 of one 64-bit integer (two's-complement bits), unsigned
    result. Matches Spark ``xxhash64(bigint_col)`` reinterpreted
    unsigned."""
    inp = value & _M
    h = (seed + _P5 + 8) & _M
    k = (_rotl((inp * _P2) & _M, 31) * _P1) & _M
    h ^= k
    h = ((_rotl(h, 27) * _P1) + _P4) & _M
    h ^= h >> 33
    h = (h * _P2) & _M
    h ^= h >> 29
    h = (h * _P3) & _M
    h ^= h >> 32
    return h


def xxh64_long_signed(value: int, seed: int = 42) -> int:
    """Spark's LongType view of the same hash (two's complement)."""
    h = xxh64_long(value, seed)
    return h - (1 << 64) if h >= (1 << 63) else h
