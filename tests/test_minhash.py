"""MinHash core: shingle semantics, signature determinism, estimate accuracy.

Mirrors the semantic shapes of the reference suite
(`/root/reference/tests/test_deduplication.py:126-188` TestMinHashLSH).
"""

import numpy as np
import pytest

from quarrycore_ray.config import DedupConfig, optimal_band_plan
from quarrycore_ray.minhash import (
    MinHasher,
    band_hashes,
    jaccard_estimate,
    permutations,
    sha1_hash32,
    shingle_set,
)


class TestShingles:
    def test_shingle_normalization(self):
        # reference minhash_redis.py:176-182 — lowercase + whitespace collapse
        assert shingle_set("Hello   World", 7) == shingle_set("hello world", 7)

    def test_short_text_returns_itself(self):
        assert shingle_set("abc", 7) == {"abc"}

    def test_empty_text(self):
        assert shingle_set("", 7) == set()

    def test_count(self):
        s = "abcdefghij"  # 10 chars -> 4 shingles of 7
        assert len(shingle_set(s, 7)) == 4


class TestSignatures:
    def test_deterministic(self):
        mh = MinHasher()
        a = mh.signature("the quick brown fox jumps over the lazy dog")
        b = MinHasher().signature("the quick brown fox jumps over the lazy dog")
        assert (a == b).all()

    def test_permutation_scheme_is_datasketch_compatible(self):
        # a in [1, p), b in [0, p), drawn pairwise from RandomState(1)
        a, b = permutations(128, 1)
        p = (1 << 61) - 1
        assert a.shape == (128,) and b.shape == (128,)
        assert int(a.min()) >= 1 and int(a.max()) < p
        assert int(b.min()) >= 0 and int(b.max()) < p
        # first draws from RandomState(1) are fixed for all time
        gen = np.random.RandomState(1)
        exp_a0 = gen.randint(1, p, dtype=np.uint64)
        exp_b0 = gen.randint(0, p, dtype=np.uint64)
        assert int(a[0]) == int(exp_a0) and int(b[0]) == int(exp_b0)

    def test_sha1_hash32_known_value(self):
        import hashlib

        d = hashlib.sha1(b"abcdefg").digest()[:4]
        assert sha1_hash32(b"abcdefg") == int.from_bytes(d, "little")

    def test_jaccard_estimate_tracks_true_jaccard(self):
        mh = MinHasher()
        base = "machine learning with ray data pipelines over arrow batches " * 4
        near = base.replace("arrow", "arrwo")
        far = "completely unrelated text about cooking pasta and tomato sauce " * 4
        A, B = shingle_set(base), shingle_set(near)
        true_j = len(A & B) / len(A | B)
        est = jaccard_estimate(mh.signature(base), mh.signature(near))
        assert abs(est - true_j) < 0.12  # 128-perm sampling noise
        assert jaccard_estimate(mh.signature(base), mh.signature(far)) < 0.2

    def test_identical_signatures_for_identical_text(self):
        mh = MinHasher()
        assert jaccard_estimate(mh.signature("same text here"), mh.signature("same text here")) == 1.0

    def test_combined_hasher_mixed_paths_bit_parity(self):
        """CombinedMinSimHasher's dual universe (packed ASCII fast path
        + per-doc slow path with offset ids) must stay bit-identical to
        the separate MinHasher/SimHasher reference when one CHUNK mixes
        both paths — ASCII, unicode, short, empty, whitespace-only,
        exactly-k, Kelvin-sign lowercasing, control chars."""
        import numpy as np

        from quarrycore_ray.minhash import CombinedMinSimHasher, MinHasher
        from quarrycore_ray.simhash import SimHasher

        docs = [
            "plain ascii text with enough length to shingle repeatedly",
            "héllo wörld ümlauts éverywhere in this non-ascii document",
            "",
            "   ",
            "short",
            "exactly",  # len == k
            "KKelvin sign lowercases to a two-char sequence maybe",
            "tab\tand\nnewline   runs\fcollapse\vhere exactly as one",
            "control\x01chars\x02inside\x03ascii remain ascii shingles",
            "ascii then héllo mixed so fast and slow share shingles",
            "a" * 40,  # overlapping identical windows
        ] * 3  # repeat so caches get hits on the second pass
        combined = CombinedMinSimHasher()
        # tiny chunk/block sizes force multi-chunk, multi-block paths
        sigs, fps = combined.compute(docs, chunk_docs=4, block_shingles=8)
        ref_sigs = MinHasher().signatures(docs)
        ref_fps = SimHasher(7).fingerprints(docs)
        assert np.array_equal(sigs, ref_sigs)
        assert np.array_equal(fps, ref_fps)
        # warm-cache pass is identical too
        sigs2, fps2 = combined.compute(docs, chunk_docs=5, block_shingles=16)
        assert np.array_equal(sigs2, ref_sigs)
        assert np.array_equal(fps2, ref_fps)
        # k > 8 disables the packed path entirely; parity must hold
        c9 = CombinedMinSimHasher(shingle_size=9)
        s9, f9 = c9.compute(docs, chunk_docs=4)
        assert np.array_equal(s9, MinHasher(shingle_size=9).signatures(docs))
        assert np.array_equal(f9, SimHasher(9).fingerprints(docs))

    def test_sig_to_bytes_sentinel_invariant(self):
        import numpy as np
        import pytest

        from quarrycore_ray.stages.minhash_stage import (
            bytes_to_sigs, sig_to_bytes,
        )

        # the legitimate empty-text sentinel (all slots untouched) clamps
        empty = np.full(8, np.uint64(1 << 32), dtype=np.uint64)
        out = bytes_to_sigs([sig_to_bytes(empty)], 8)
        assert (out == 0xFFFFFFFF).all()
        # any other out-of-range value is a corrupted signature: raise
        with pytest.raises(ValueError, match="sentinel"):
            sig_to_bytes(np.array([1, (1 << 32) + 5, 2], dtype=np.uint64))
        # sentinel mixed with a second distinct out-of-range value: raise
        with pytest.raises(ValueError, match="sentinel"):
            sig_to_bytes(
                np.array([1 << 32, (1 << 32) + 1, 2], dtype=np.uint64)
            )


class TestBanding:
    def test_band_plan_covers_all_perms_reasonably(self):
        b, r = DedupConfig().band_plan()
        assert b * r <= 128
        assert b >= 4  # threshold 0.85 should not degenerate

    def test_band_plan_threshold_monotonicity(self):
        b_low, r_low = optimal_band_plan(0.5, 128)
        b_high, r_high = optimal_band_plan(0.9, 128)
        assert r_high > r_low  # higher threshold -> longer rows (stricter)

    def test_band_hashes_identical_iff_band_equal(self):
        mh = MinHasher()
        s1 = mh.signature("identical content for banding")
        s2 = mh.signature("identical content for banding")
        bh = band_hashes(np.vstack([s1, s2]), 8, 16)
        assert (bh[0] == bh[1]).all()

    def test_band_id_mixed_into_key(self):
        # same band content in different band positions must not collide
        sig = np.arange(128, dtype=np.uint64).reshape(1, -1)
        sig[:] = 7
        bh = band_hashes(sig, 8, 16)
        assert len(set(int(x) for x in bh[0])) == 8
