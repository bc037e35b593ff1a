"""64-bit SimHash over character shingles + Hamming distance kernels.

The north rule adds a SimHash Hamming-distance verification stage on
top of the reference's MinHash candidate generation (the reference's
analog is the fuzzy/Jaccard re-verification,
`/root/reference/src/quarrycore/deduplicator/minhash_lsh.py:162-181`).

SimHash (Charikar 2002; Manku et al., WWW 2007 "Detecting Near-
Duplicates for Web Crawling"): each feature hashes to 64 bits; for each
bit position sum +1/-1 weighted votes across features; the sign vector
is the fingerprint. Near-duplicates have small Hamming distance.
"""

from __future__ import annotations

import hashlib

import numpy as np

from .minhash import shingle_set

_BIT_WEIGHTS = (np.uint64(1) << np.arange(64, dtype=np.uint64))


def _feature_hash64(token: str) -> int:
    """Stable 64-bit feature hash (first 8 bytes of SHA-1, little-endian).

    The dedup-core default: the combined signature stage derives MinHash
    (low 4 bytes) and SimHash (low 8) from one SHA-1 digest per shingle
    (minhash.py:CombinedMinSimHasher), so the verification fingerprints
    stay on SHA-1.
    """
    return int.from_bytes(hashlib.sha1(token.encode("utf-8")).digest()[:8], "little")


def md5_feature_hash64(token: str) -> int:
    """MD5 variant (first 8 bytes, little-endian) — identical SimHash
    algorithm on a different base hash. Used by the standalone
    `simhash_dup_pairs` query operator because DuckDB ships md5() but
    not sha1(), making the whole fingerprint SQL-reproducible for the
    exact-oracle gate."""
    return int.from_bytes(hashlib.md5(token.encode("utf-8")).digest()[:8], "little")


def simhash_from_hash64(hv: np.ndarray) -> int:
    """64-bit SimHash from an array of 64-bit feature hashes.

    Shared by `SimHasher` and the combined engine stage so both produce
    identical fingerprints. votes[j] = count of features with bit j set;
    majority wins.
    """
    if len(hv) == 0:
        return 0
    bits = (hv[:, None] >> np.arange(64, dtype=np.uint64)) & np.uint64(1)
    votes = bits.sum(axis=0)
    majority = votes * 2 > len(hv)
    return int((_BIT_WEIGHTS[majority]).sum(dtype=np.uint64))


class SimHasher:
    """Stateful SimHash generator with a feature-hash cache (actor-friendly)."""

    def __init__(
        self,
        shingle_size: int = 7,
        cache_limit: int = 4_000_000,
        feature_hash=_feature_hash64,
    ):
        self.shingle_size = shingle_size
        self._cache: dict[str, int] = {}
        self._cache_limit = cache_limit
        self._feature_hash = feature_hash

    def fingerprint(self, text: str) -> int:
        shingles = shingle_set(text, self.shingle_size)
        if not shingles:
            return 0
        cache = self._cache
        hv = np.empty(len(shingles), dtype=np.uint64)
        i = 0
        for s in shingles:
            h = cache.get(s)
            if h is None:
                h = self._feature_hash(s)
                if len(cache) < self._cache_limit:
                    cache[s] = h
            hv[i] = h
            i += 1
        return simhash_from_hash64(hv)

    def fingerprints(self, texts) -> np.ndarray:
        out = np.empty(len(texts), dtype=np.uint64)
        for i, t in enumerate(texts):
            out[i] = self.fingerprint(t)
        return out


def hamming_distance(a: np.ndarray | int, b: np.ndarray | int) -> np.ndarray | int:
    """Vectorized popcount of XOR for uint64 fingerprints."""
    x = np.bitwise_xor(np.asarray(a, dtype=np.uint64), np.asarray(b, dtype=np.uint64))
    # popcount via byte view + unpackbits (numpy<2 has no bit_count ufunc)
    bytes_view = x.reshape(-1).view(np.uint8)
    counts = np.unpackbits(bytes_view).reshape(-1, 64).sum(axis=1)
    if counts.size == 1:
        return int(counts[0])
    return counts
