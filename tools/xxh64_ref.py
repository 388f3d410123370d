#!/usr/bin/env python3
"""Reference XXH64 (public xxHash spec, Yann Collet) used only to develop
and sanity-check the DuckDB SQL oracle's hash arithmetic. Not shipped."""
M = (1 << 64) - 1
P1 = 0x9E3779B185EBCA87
P2 = 0xC2B2AE3D27D4EB4F
P3 = 0x165667B19E3779F9
P4 = 0x85EBCA77C2B2AE63
P5 = 0x27D4EB2F165667C5


def rot(x, r):
    return ((x << r) | (x >> (64 - r))) & M


def rnd(acc, lane):
    return (rot((acc + lane * P2) & M, 31) * P1) & M


def merge(h, v):
    return ((h ^ rnd(0, v)) * P1 + P4) & M


def xxh64(data: bytes, seed: int) -> int:
    n = len(data)
    pos = 0
    if n >= 32:
        v1 = (seed + P1 + P2) & M
        v2 = (seed + P2) & M
        v3 = seed & M
        v4 = (seed - P1) & M
        while pos + 32 <= n:
            v1 = rnd(v1, int.from_bytes(data[pos:pos + 8], "little"))
            v2 = rnd(v2, int.from_bytes(data[pos + 8:pos + 16], "little"))
            v3 = rnd(v3, int.from_bytes(data[pos + 16:pos + 24], "little"))
            v4 = rnd(v4, int.from_bytes(data[pos + 24:pos + 32], "little"))
            pos += 32
        h = (rot(v1, 1) + rot(v2, 7) + rot(v3, 12) + rot(v4, 18)) & M
        h = merge(h, v1)
        h = merge(h, v2)
        h = merge(h, v3)
        h = merge(h, v4)
    else:
        h = (seed + P5) & M
    h = (h + n) & M
    while pos + 8 <= n:
        h ^= rnd(0, int.from_bytes(data[pos:pos + 8], "little"))
        h = (rot(h, 27) * P1 + P4) & M
        pos += 8
    if pos + 4 <= n:
        h ^= (int.from_bytes(data[pos:pos + 4], "little") * P1) & M
        h = (rot(h, 23) * P2 + P3) & M
        pos += 4
    while pos < n:
        h ^= (data[pos] * P5) & M
        h = (rot(h, 11) * P1) & M
        pos += 1
    h ^= h >> 33
    h = (h * P2) & M
    h ^= h >> 29
    h = (h * P3) & M
    h ^= h >> 32
    return h


def xxh64_int(i: int, seed: int) -> int:
    """Spark XXH64.hashInt: the 4-byte path."""
    h = (seed + P5 + 4) & M
    h ^= ((i & 0xFFFFFFFF) * P1) & M
    h = (rot(h, 23) * P2 + P3) & M
    h ^= h >> 33
    h = (h * P2) & M
    h ^= h >> 29
    h = (h * P3) & M
    h ^= h >> 32
    return h


def xxh64_long(v: int, seed: int) -> int:
    """Spark XXH64.hashLong: the 8-byte path."""
    h = (seed + P5 + 8) & M
    h ^= rnd(0, v & M)
    h = (rot(h, 27) * P1 + P4) & M
    h ^= h >> 33
    h = (h * P2) & M
    h ^= h >> 29
    h = (h * P3) & M
    h ^= h >> 32
    return h


if __name__ == "__main__":
    import sys
    for s in sys.argv[1:]:
        print(s, xxh64(s.encode(), 42))
