"""Vectorized, datasketch-compatible MinHash.

The reference computes signatures with ``datasketch.MinHash(num_perm=128)``
(`/root/reference/src/quarrycore/dedup/minhash_redis.py:186-202`). That
library is not available here, so we re-implement the exact public
scheme from first principles (it is fully documented in the datasketch
docs/source on GitHub):

- token hash: first 4 bytes of SHA-1(token) as a little-endian uint32
  ("sha1_hash32"),
- num_perm universal hash permutations ``h_i(x) = ((a_i * x + b_i) mod p)
  & 0xFFFFFFFF`` with p = 2^61 - 1 (Mersenne prime),
- (a_i, b_i) drawn pairwise from ``numpy.random.RandomState(seed)`` with
  a in [1, p) and b in [0, p), seed defaults to 1,
- signature = elementwise min over all token hashes, initialised to 2^32.

Signatures produced here are therefore bit-identical to datasketch's for
the same input token set, which is what "same shingle/signature config as
the reference" requires.

The implementation is batch-vectorized: one numpy matmul-style pass per
document over its unique shingles, no per-permutation Python loop.
"""

from __future__ import annotations

import hashlib
from functools import lru_cache

import numpy as np

_MERSENNE_PRIME = np.uint64((1 << 61) - 1)
_MAX_HASH = np.uint64((1 << 32) - 1)
_HASH_INIT = np.uint64(1 << 32)


@lru_cache(maxsize=8)
def _pack_mask(k: int) -> np.uint64:
    """Low-k-bytes mask for the packed-shingle uint64 representation."""
    return np.uint64((1 << (8 * k)) - 1 if k < 8 else 0xFFFFFFFFFFFFFFFF)


@lru_cache(maxsize=8)
def permutations(num_perm: int = 128, seed: int = 1) -> tuple[np.ndarray, np.ndarray]:
    """(a, b) arrays of shape (num_perm,), drawn exactly like datasketch.

    datasketch draws the pair (a_i, b_i) together per permutation from a
    single RandomState stream, so ordering of draws matters for
    bit-compatibility.
    """
    gen = np.random.RandomState(seed)
    ab = np.array(
        [
            (
                gen.randint(1, int(_MERSENNE_PRIME), dtype=np.uint64),
                gen.randint(0, int(_MERSENNE_PRIME), dtype=np.uint64),
            )
            for _ in range(num_perm)
        ],
        dtype=np.uint64,
    ).T
    a, b = ab[0], ab[1]
    a.setflags(write=False)
    b.setflags(write=False)
    return a, b


def sha1_hash32(data: bytes) -> int:
    """First 4 bytes of SHA-1 digest as little-endian uint32."""
    return int.from_bytes(hashlib.sha1(data).digest()[:4], "little")


def shingle_set(text: str, k: int = 7) -> set[str]:
    """Character k-shingles over lowercased, whitespace-collapsed text.

    Exact port of the reference spec
    (`/root/reference/src/quarrycore/dedup/minhash_redis.py:162-184`):
    texts shorter than k yield the text itself; empty text yields the
    empty set.
    """
    if not text:
        return set()
    if len(text) < k:
        return {text}
    normalized = " ".join(text.lower().split())
    if len(normalized) < k:
        return {normalized} if normalized else set()
    return {normalized[i : i + k] for i in range(len(normalized) - k + 1)}


class MinHasher:
    """Stateful signature generator with a shingle-hash cache.

    Designed to live inside a Ray actor (`map_batches(Cls, ...)`) so the
    permutation table and the shingle->uint32 cache are built once per
    worker, not per batch. Text corpora repeat shingles heavily
    (boilerplate, shared vocabulary), so the SHA-1 cache converts the
    dominant cost into a dict lookup.
    """

    def __init__(self, num_perm: int = 128, seed: int = 1, shingle_size: int = 7,
                 cache_limit: int = 4_000_000):
        self.num_perm = num_perm
        self.shingle_size = shingle_size
        self.a, self.b = permutations(num_perm, seed)
        self._cache: dict[str, int] = {}
        self._cache_limit = cache_limit

    def _hash_shingles(self, shingles: set[str]) -> np.ndarray:
        cache = self._cache
        out = np.empty(len(shingles), dtype=np.uint64)
        i = 0
        for s in shingles:
            h = cache.get(s)
            if h is None:
                h = sha1_hash32(s.encode("utf-8"))
                if len(cache) < self._cache_limit:
                    cache[s] = h
            out[i] = h
            i += 1
        return out

    def signature(self, text: str) -> np.ndarray:
        """uint64[num_perm] signature (values < 2^32 once any token seen)."""
        shingles = shingle_set(text, self.shingle_size)
        if not shingles:
            return np.full(self.num_perm, _HASH_INIT, dtype=np.uint64)
        hv = self._hash_shingles(shingles)  # (n,)
        # (n, num_perm) universal hashing, then column-min.
        phv = (np.outer(hv, self.a) + self.b) % _MERSENNE_PRIME
        np.bitwise_and(phv, _MAX_HASH, out=phv)
        return phv.min(axis=0)

    def signatures(self, texts) -> np.ndarray:
        """(len(texts), num_perm) matrix of signatures."""
        out = np.empty((len(texts), self.num_perm), dtype=np.uint64)
        for i, t in enumerate(texts):
            out[i] = self.signature(t)
        return out


def jaccard_estimate(sig_a: np.ndarray, sig_b: np.ndarray) -> float:
    """MinHash estimate of Jaccard similarity (fraction of equal slots).

    Matches ``datasketch.MinHash.jaccard`` and the reference's candidate
    re-scoring (`/root/reference/src/quarrycore/deduplicator/minhash_lsh.py:162-181`).
    """
    return float(np.count_nonzero(sig_a == sig_b)) / len(sig_a)


def jaccard_matrix(sigs: np.ndarray) -> np.ndarray:
    """Pairwise signature-Jaccard for a small (m, num_perm) block."""
    m = sigs.shape[0]
    out = np.empty((m, m), dtype=np.float64)
    for i in range(m):
        out[i] = (sigs == sigs[i]).mean(axis=1)
    return out


class CombinedMinSimHasher:
    """MinHash signature + SimHash fingerprint in one pass.

    Both derive from the SAME SHA-1 digest per shingle: sha1_hash32 is
    the little-endian low 4 bytes, the SimHash feature hash the low 8,
    so ``h32 == h64 & 0xFFFFFFFF``. One digest, one shingle-set build
    and one shared cache serve both layers — outputs are bit-identical
    to running `MinHasher` and `SimHasher` separately (the oracle does
    exactly that, see tests).
    """

    def __init__(self, num_perm: int = 128, seed: int = 1, shingle_size: int = 7,
                 cache_limit: int = 4_000_000):
        self.num_perm = num_perm
        self.shingle_size = shingle_size
        self.a, self.b = permutations(num_perm, seed)
        self._cache: dict[str, int] = {}  # shingle -> h64 (SHA-1 amortization)
        # packed-uint64 shingle -> h64, for the vectorized ASCII path
        self._ucache: dict[int, int] = {}
        self._cache_limit = cache_limit

    def compute(
        self, texts, chunk_docs: int = 512, block_shingles: int = 4096
    ) -> tuple[np.ndarray, np.ndarray]:
        """(signatures (n, num_perm) uint64, fingerprints (n,) uint64).

        Chunked: each chunk's unique shingles are SHA-1-hashed (with an
        actor-lifetime cache) and universal-hash-permuted exactly once —
        shingles repeat heavily across documents, so the (U, num_perm)
        permute matrix is amortized over every occurrence. The mod-p step
        uses the branch-light Mersenne-prime reduction
        (x mod (2^61-1) == ((x >> 61) + (x & p)) with one conditional
        subtract — ~4x faster than np.remainder and bit-identical).
        Per-document signature = column-min over its rows; SimHash votes
        from the matching bit matrix. Bit-identical to `MinHasher` +
        `SimHasher` (the oracle path).

        The permute runs cache-blocked over `block_shingles`-row
        sub-blocks: a full (U, num_perm) uint64 intermediate is
        ~100 MB per chunk and its multi-pass arithmetic plus the
        scattered per-doc row gathers are DRAM-bandwidth-bound, which
        anti-scales when many actors share one memory bus
        (BASELINE.md round-2 bandwidth analysis). Blocks of 4096 keep
        each intermediate at ~4 MB (cache-resident); per-doc minima
        and SimHash votes accumulate across blocks — the column-min
        and vote-sum are order-independent, so outputs stay
        bit-identical.
        """
        from_bytes = int.from_bytes
        sha1 = hashlib.sha1
        n = len(texts)
        sigs = np.empty((n, self.num_perm), dtype=np.uint64)
        fps = np.empty(n, dtype=np.uint64)
        mask32 = np.uint64(0xFFFFFFFF)
        bit_w = np.uint64(1) << np.arange(64, dtype=np.uint64)
        shifts = np.arange(64, dtype=np.uint64)
        sixty_one = np.uint64(61)
        cache = self._cache
        limit = self._cache_limit
        k_sh = self.shingle_size
        ucache = self._ucache
        fast_ok = k_sh <= 8  # packed shingles must fit one uint64
        for c0 in range(0, n, chunk_docs):
            chunk = texts[c0 : c0 + chunk_docs]
            n_chunk = len(chunk)
            # --- shingle universe -------------------------------------
            # Vectorized ASCII fast path: a normalized ASCII text's
            # 7-char shingles are exactly its 7-BYTE windows, packed
            # into little-endian uint64s (high byte zero) and deduped
            # with one np.unique — no per-occurrence Python. Non-ASCII
            # / short / empty texts take the per-doc set path with ids
            # offset past the packed universe; a shingle present in
            # both universes gets two ids, which is harmless (same
            # SHA-1, same permuted row; column-min and vote-sum ignore
            # duplicates across DIFFERENT docs, and one doc's ids stay
            # distinct).
            doc_idx: list[np.ndarray | None] = [None] * n_chunk
            packed_parts: list[np.ndarray] = []
            fast_pos: list[int] = []
            fast_bounds = [0]
            slow_sets: list[tuple[int, set]] = []
            for i, t in enumerate(chunk):
                if not t or len(t) < k_sh or not fast_ok:
                    slow_sets.append((i, shingle_set(t, k_sh)))
                    continue
                norm = " ".join(t.lower().split())
                if len(norm) < k_sh:
                    slow_sets.append((i, {norm} if norm else set()))
                    continue
                if not norm.isascii():
                    # reuse the normalization already done (shingle_set
                    # would recompute it)
                    slow_sets.append(
                        (i, {norm[j : j + k_sh]
                             for j in range(len(norm) - k_sh + 1)})
                    )
                    continue
                bts = np.frombuffer(norm.encode("ascii"), dtype=np.uint8)
                w_cnt = len(bts) - k_sh + 1
                # overlapping little-endian uint64 loads at byte stride 1
                # (x86 tolerates unaligned reads) + ONE mask keep the
                # dominant temporary at (W,) uint64 — no (W, k)
                # materialization of the whole text
                pad = np.zeros(len(bts) + 8, dtype=np.uint8)
                pad[: len(bts)] = bts
                words = np.ndarray(
                    buffer=pad, shape=(w_cnt,), dtype="<u8", strides=(1,)
                )
                v = words & _pack_mask(k_sh)
                packed_parts.append(v)
                fast_pos.append(i)
                fast_bounds.append(fast_bounds[-1] + len(v))
            if packed_parts:
                allv = np.concatenate(packed_parts)
                uniq_vals, inverse = np.unique(allv, return_inverse=True)
                for fi, i in enumerate(fast_pos):
                    doc_idx[i] = np.unique(
                        inverse[fast_bounds[fi] : fast_bounds[fi + 1]]
                    )
            else:
                uniq_vals = np.empty(0, dtype=np.uint64)
            uf = len(uniq_vals)
            slow_uniq: dict[str, int] = {}
            for i, ss in slow_sets:
                arr = np.empty(len(ss), dtype=np.int64)
                j = 0
                for s in ss:
                    kk = slow_uniq.setdefault(s, uf + len(slow_uniq))
                    arr[j] = kk
                    j += 1
                arr.sort()
                doc_idx[i] = arr
            U = uf + len(slow_uniq)
            if U == 0:
                sigs[c0 : c0 + n_chunk] = _HASH_INIT
                fps[c0 : c0 + n_chunk] = 0
                continue
            # --- SHA-1 per UNIQUE shingle (actor-lifetime caches) -----
            h64 = np.empty(U, dtype=np.uint64)
            if uf:
                raw = uniq_vals.astype("<u8").tobytes()
                for ui in range(uf):
                    key = int(uniq_vals[ui])
                    h = ucache.get(key)
                    if h is None:
                        h = from_bytes(
                            sha1(raw[ui * 8 : ui * 8 + k_sh]).digest()[:8],
                            "little",
                        )
                        # the two caches share ONE residency budget
                        if len(ucache) + len(cache) < limit:
                            ucache[key] = h
                    h64[ui] = h
            for s, kk in slow_uniq.items():
                h = cache.get(s)
                if h is None:
                    h = from_bytes(sha1(s.encode("utf-8")).digest()[:8], "little")
                    if len(ucache) + len(cache) < limit:
                        cache[s] = h
                h64[kk] = h
            chunk_sigs = np.full((n_chunk, self.num_perm), _HASH_INIT, dtype=np.uint64)
            votes = np.zeros((n_chunk, 64), dtype=np.int64)
            for b0 in range(0, U, block_shingles):
                b1 = min(b0 + block_shingles, U)
                hb = h64[b0:b1]
                # (block, num_perm) permuted hashes, Mersenne reduction
                x = np.outer(hb & mask32, self.a)
                x += self.b  # wraps mod 2^64, as datasketch's uint64 math does
                hi = x >> sixty_one
                x &= _MERSENNE_PRIME
                x += hi
                x[x >= _MERSENNE_PRIME] -= _MERSENNE_PRIME
                x &= _MAX_HASH
                # (block, 64) bit matrix for SimHash votes
                bits = ((hb[:, None] >> shifts) & np.uint64(1)).astype(np.int8)
                for i, idx in enumerate(doc_idx):
                    lo, hi_i = np.searchsorted(idx, (b0, b1))
                    if lo == hi_i:
                        continue
                    sub = idx[lo:hi_i] - b0
                    np.minimum(
                        chunk_sigs[i], x[sub].min(axis=0), out=chunk_sigs[i]
                    )
                    votes[i] += bits[sub].sum(axis=0, dtype=np.int64)
            for i, idx in enumerate(doc_idx):
                row = c0 + i
                if len(idx) == 0:
                    sigs[row] = _HASH_INIT
                    fps[row] = 0
                    continue
                sigs[row] = chunk_sigs[i]
                majority = votes[i] * 2 > len(idx)
                fps[row] = bit_w[majority].sum(dtype=np.uint64)
        return sigs, fps


# --- band hashing ------------------------------------------------------------

_BAND_MULT = np.uint64(0x9E3779B97F4A7C15)  # 64-bit golden-ratio multiplier


def band_hashes(sigs: np.ndarray, bands: int, rows: int) -> np.ndarray:
    """(n_docs, bands) uint64 bucket keys, fully vectorized.

    Each band key mixes the band's `rows` signature slots with a
    polynomial pass using a 64-bit odd multiplier (Fibonacci hashing;
    public-domain construction). Collisions across distinct band
    contents are ~2^-64 and are caught downstream by the verifier, so a
    cryptographic hash is unnecessary — this keeps the stage pure numpy.
    """
    n = sigs.shape[0]
    out = np.zeros((n, bands), dtype=np.uint64)
    for b in range(bands):
        block = sigs[:, b * rows : (b + 1) * rows]
        acc = np.full(n, np.uint64(b + 1), dtype=np.uint64)
        for r in range(rows):
            acc = (acc ^ block[:, r]) * _BAND_MULT
        out[:, b] = acc
    return out
