"""Driver-side twin of Spark's ``xxhash64`` expression (XXH64, seed 42,
seed-chained across columns) so metadata-scale prunes can be computed
without launching a Spark job.

Spark's ``XxHash64`` expression is a faithful XXH64 port (little-endian
8-byte stripes, 4-byte then 1-byte tail) evaluated over each column's
UTF-8 bytes with the running hash as the seed, starting at 42 and
skipping nulls. ``tests/test_xxh64_twin.py`` pins byte-for-byte equality
against ``F.xxhash64`` over randomized unicode corpora; any divergence
fails the suite rather than mis-pruning a read.

Only used for small key sets (the changefeed's candidate prune) — pure
Python costs ~5 us/key, so callers cap the driver-side path and fall
back to the Spark expression beyond it.
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


def xxh64(data: bytes, seed: int) -> int:
    """Unsigned XXH64 of ``data`` with ``seed`` (both 64-bit)."""
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _M
        v2 = (seed + _P2) & _M
        v3 = seed & _M
        v4 = (seed - _P1) & _M
        while i <= n - 32:
            v1 = (_rotl((v1 + int.from_bytes(data[i:i + 8], "little")
                         * _P2) & _M, 31) * _P1) & _M
            v2 = (_rotl((v2 + int.from_bytes(data[i + 8:i + 16], "little")
                         * _P2) & _M, 31) * _P1) & _M
            v3 = (_rotl((v3 + int.from_bytes(data[i + 16:i + 24], "little")
                         * _P2) & _M, 31) * _P1) & _M
            v4 = (_rotl((v4 + int.from_bytes(data[i + 24:i + 32], "little")
                         * _P2) & _M, 31) * _P1) & _M
            i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12)
             + _rotl(v4, 18)) & _M
        for v in (v1, v2, v3, v4):
            h = (((h ^ ((_rotl((v * _P2) & _M, 31) * _P1) & _M))
                  * _P1) + _P4) & _M
    else:
        h = (seed + _P5) & _M
    h = (h + n) & _M
    while i <= n - 8:
        k = int.from_bytes(data[i:i + 8], "little")
        h ^= (_rotl((k * _P2) & _M, 31) * _P1) & _M
        h = ((_rotl(h, 27) * _P1) + _P4) & _M
        i += 8
    if i <= n - 4:
        h ^= (int.from_bytes(data[i:i + 4], "little") * _P1) & _M
        h = ((_rotl(h, 23) * _P2) + _P3) & _M
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
    return h


def spark_xxhash64_strings(values: tuple[str | None, ...],
                           seed: int = 42) -> int:
    """SIGNED hash matching ``F.xxhash64(c1, c2, ...)`` over string
    columns: seed-chained left to right, nulls skipped."""
    h = seed
    for v in values:
        if v is None:
            continue
        h = xxh64(v.encode("utf-8"), h)
    return h - (1 << 64) if h >= (1 << 63) else h


def bucket_of(repo: str, path: str, num_buckets: int) -> int:
    """Twin of ``lake.bucket_expr``: pmod(xxhash64(repo, path), nb)."""
    return spark_xxhash64_strings((repo, path)) % num_buckets
