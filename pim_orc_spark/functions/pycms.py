"""Pure-Python reader for Spark's serialized Count-Min Sketch.

``F.count_min_sketch(...)`` returns the binary produced by
``org.apache.spark.util.sketch.CountMinSketch.writeTo`` (format
version 1, documented in the Spark sketch module's javadoc and stable
since Spark 2.0):

    int32  version (= 1)          } big-endian, DataOutputStream
    int64  totalCount
    int32  depth
    int32  width
    int64  hashA[depth]           # per-row seeds for long-typed keys
    int64  table[depth][width]    # the counter matrix, row-major

Probing an item must reproduce the writer's bucket derivation exactly:

* binary/string keys hash with Spark's ``Murmur3_x86_32``
  (little-endian 4-byte words, byte-at-a-time tail — each tail byte is
  mixed as its own block, unlike reference murmur3) seeded 0 for h1
  and h1 for h2, then bucket_i = |(h1 + i*h2) mod width| in Java's
  32-bit truncated arithmetic;
* integer keys use ``hash = hashA[i]*item; hash += hash >>> 32;
  hash &= (1<<31)-1; bucket_i = (int)hash % width`` in 64-bit wrap
  arithmetic.

This removes the operator surface's only py4j JVM-handle dependency
(q89 previously round-tripped the bytes through
``CountMinSketch.readFrom`` driver-side — a private-API touch that
Spark Connect cannot serve). tests/test_relational.py cross-validates
both key paths estimate-for-estimate against the JVM class, the same
both-directions discipline as functions/pysnappy.py's snappy-java
cross-check.

Reference parity note: the reference engine has no sketch module; this
supports the mergeable-sketch family (SURVEY.md §2.4) beside HLL (q81)
and bitmaps (q88).
"""

from __future__ import annotations

import struct
from dataclasses import dataclass

_C1 = 0xCC9E2D51
_C2 = 0x1B873593
_M32 = 0xFFFFFFFF
_PRIME_MODULUS = (1 << 31) - 1


def _rotl32(x: int, r: int) -> int:
    return ((x << r) | (x >> (32 - r))) & _M32


def _mix_k1(k1: int) -> int:
    k1 = (k1 * _C1) & _M32
    k1 = _rotl32(k1, 15)
    return (k1 * _C2) & _M32


def _mix_h1(h1: int, k1: int) -> int:
    h1 ^= k1
    h1 = _rotl32(h1, 13)
    return (h1 * 5 + 0xE6546B64) & _M32


def _fmix(h1: int, length: int) -> int:
    h1 ^= length
    h1 ^= h1 >> 16
    h1 = (h1 * 0x85EBCA6B) & _M32
    h1 ^= h1 >> 13
    h1 = (h1 * 0xC2B2AE35) & _M32
    h1 ^= h1 >> 16
    return h1


def _to_signed32(x: int) -> int:
    x &= _M32
    return x - (1 << 32) if x >= (1 << 31) else x


def murmur3_x86_32(data: bytes, seed: int) -> int:
    """Spark's Murmur3_x86_32.hashUnsafeBytes: little-endian aligned
    words, then each TAIL byte mixed as its own signed block (the
    Spark-specific divergence from reference murmur3). Returns a
    signed 32-bit int, matching the Java API."""
    h1 = seed & _M32
    n_aligned = len(data) - (len(data) % 4)
    for i in range(0, n_aligned, 4):
        (word,) = struct.unpack_from("<i", data, i)
        h1 = _mix_h1(h1, _mix_k1(word & _M32))
    for i in range(n_aligned, len(data)):
        b = data[i]
        half_word = b - 256 if b >= 128 else b  # signed byte widen
        h1 = _mix_h1(h1, _mix_k1(half_word & _M32))
    return _to_signed32(_fmix(h1, len(data)))


@dataclass(frozen=True)
class CountMinSketchReader:
    """Parsed form of a Spark CountMinSketch binary; estimate-only."""

    total_count: int
    depth: int
    width: int
    hash_a: tuple[int, ...]
    table: tuple[tuple[int, ...], ...]

    @classmethod
    def from_bytes(cls, data: bytes) -> "CountMinSketchReader":
        version, total, depth, width = struct.unpack_from(">iqii", data, 0)
        if version != 1:
            raise ValueError(f"unsupported CountMinSketch version {version}")
        if depth < 1 or width < 1:
            # a degenerate header would make the probes fail obscurely
            # (empty min()) or silently (None) instead of loudly here
            raise ValueError(
                f"degenerate CountMinSketch: depth={depth} width={width}"
            )
        expected = 20 + 8 * depth + 8 * depth * width
        if len(data) != expected:
            raise ValueError(
                f"CountMinSketch payload is {len(data)} bytes, "
                f"expected {expected} for depth={depth} width={width}"
            )
        off = 20
        hash_a = struct.unpack_from(f">{depth}q", data, off)
        off += 8 * depth
        table = []
        for _ in range(depth):
            table.append(struct.unpack_from(f">{width}q", data, off))
            off += 8 * width
        return cls(total, depth, width, tuple(hash_a), tuple(table))

    def _buckets_binary(self, key: bytes) -> list[int]:
        h1 = murmur3_x86_32(key, 0)
        h2 = murmur3_x86_32(key, h1)
        out = []
        for i in range(self.depth):
            h = _to_signed32(h1 + i * h2)  # Java int overflow wrap
            out.append(abs(h) % self.width)  # = Math.abs(h % width)
        return out

    def estimate_binary(self, key: bytes) -> int:
        """Estimate for a binary/string key (strings are added as
        their UTF-8 bytes by the SQL aggregate)."""
        return min(
            self.table[i][b]
            for i, b in enumerate(self._buckets_binary(key))
        )

    def estimate_long(self, item: int) -> int:
        """Estimate for an integer key (byte/short/int/long columns)."""
        m64 = (1 << 64) - 1
        best = None
        for i in range(self.depth):
            h = (self.hash_a[i] * item) & m64
            h = (h + (h >> 32)) & m64
            h &= _PRIME_MODULUS  # non-negative, < 2^31
            bucket = h % self.width  # (int)h % width, h >= 0
            v = self.table[i][bucket]
            best = v if best is None else min(best, v)
        return best
