"""Vectorized Bloom filter (numpy bit array, double hashing).

Reference analog: the sharded Bloom pre-filter of the legacy exact
layer (`/root/reference/src/quarrycore/deduplicator/bloom_filter.py`:
per-shard pybloom filters behind locks, capacity/error_rate config at
bloom_filter.py:56-77). In the dataflow engine exact dedup is an exact
groupby, so the Bloom's role shifts to *optimization*: a compact,
broadcastable membership summary of a historical corpus, used inside
`map_batches` to pre-filter obviously-new documents before the
anti-join (see pipelines/incremental.py).

Double hashing (Kirsch & Mitzenmacher 2006): h_i(x) = h1(x) + i*h2(x),
derived from one 128-bit blake2b digest per key. Serializable (bytes)
so `ray.put` broadcasts it once per job.
"""

from __future__ import annotations

import hashlib
import math

import numpy as np


class BloomFilter:
    def __init__(self, capacity: int, error_rate: float = 0.001):
        m = max(64, int(-capacity * math.log(error_rate) / (math.log(2) ** 2)))
        self.n_bits = ((m + 63) // 64) * 64
        self.n_hashes = max(1, round(self.n_bits / max(capacity, 1) * math.log(2)))
        self.bits = np.zeros(self.n_bits // 64, dtype=np.uint64)

    @staticmethod
    def _h1h2(key: str) -> tuple[int, int]:
        d = hashlib.blake2b(key.encode("utf-8"), digest_size=16).digest()
        return int.from_bytes(d[:8], "little"), int.from_bytes(d[8:], "little") | 1

    def _positions(self, key: str) -> np.ndarray:
        h1, h2 = self._h1h2(key)
        i = np.arange(self.n_hashes, dtype=np.uint64)
        return (np.uint64(h1) + i * np.uint64(h2)) % np.uint64(self.n_bits)

    def add(self, key: str) -> None:
        if not self.bits.flags.writeable:
            # ufunc.at writes THROUGH a read-only frombuffer view
            # (mutating the shared plasma / bytes buffer) instead of
            # raising, so guard explicitly.
            raise ValueError("cannot add to a zero-copy (read-only) BloomFilter")
        pos = self._positions(key)
        np.bitwise_or.at(self.bits, (pos // 64).astype(np.int64), np.uint64(1) << (pos % 64))

    def add_many(self, keys) -> None:
        for k in keys:
            self.add(k)

    def __contains__(self, key: str) -> bool:
        pos = self._positions(key)
        word = self.bits[(pos // 64).astype(np.int64)]
        return bool(np.all((word >> (pos % 64)) & np.uint64(1)))

    def contains_many(self, keys) -> np.ndarray:
        """Vector of membership checks (bool array)."""
        return np.fromiter((k in self for k in keys), dtype=bool, count=len(keys))

    def to_bytes(self) -> bytes:
        header = np.array([self.n_bits, self.n_hashes], dtype=np.uint64).tobytes()
        return header + self.bits.tobytes()

    @classmethod
    def from_bytes(cls, data: bytes, copy: bool = True) -> "BloomFilter":
        """Deserialize. `copy=False` returns a READ-ONLY filter backed
        zero-copy by `data` — the right mode for membership probes
        against a `ray.put` blob (no per-task copy of the bit array;
        plasma buffers are shared). `add` on a zero-copy filter raises
        (numpy read-only array)."""
        n_bits, n_hashes = np.frombuffer(data[:16], dtype=np.uint64)
        bf = cls.__new__(cls)
        bf.n_bits = int(n_bits)
        bf.n_hashes = int(n_hashes)
        bits = np.frombuffer(data[16:], dtype=np.uint64)
        bf.bits = bits.copy() if copy else bits
        return bf
