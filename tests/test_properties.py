"""Property-based tests (hypothesis) over the engine's pure kernels.

The reference suite has no property tests (SURVEY.md §5); these cover
the invariants the hand-written cases can't sweep: arbitrary unicode
through canonicalization/slugify, no-false-negative Bloom membership,
MinHash signature bounds and containment monotonicity, union-find
component consistency, floor-round ordering.
"""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from quarrycore_ray.exactmath import floor_round_np
from quarrycore_ray.functions.strings import slugify
from quarrycore_ray.minhash import MinHasher, jaccard_estimate, shingle_set
from quarrycore_ray.state.bloom import BloomFilter
from quarrycore_ray.stages.cluster import driver_union_find
from quarrycore_ray.text import normalize_whitespace

TEXT = st.text(max_size=300)


class TestTextProperties:
    @given(TEXT)
    @settings(max_examples=200, deadline=None)
    def test_normalize_whitespace_idempotent(self, s):
        once = normalize_whitespace(s)
        assert normalize_whitespace(once) == once
        assert "  " not in once
        assert once == once.strip()

    @given(TEXT)
    @settings(max_examples=200, deadline=None)
    def test_slugify_safe_and_idempotent(self, s):
        out = slugify(s)
        assert out == "untitled" or all(c.isalnum() or c == "-" for c in out)
        assert out == out.lower()
        assert len(out) <= 200
        assert slugify(out) == out  # slugs are fixed points

    @given(TEXT, st.integers(min_value=2, max_value=9))
    @settings(max_examples=150, deadline=None)
    def test_shingles_follow_spec(self, s, k):
        # mirrors the reference spec (minhash_redis.py:162-184): short
        # raw text passes through verbatim; otherwise shingles are over
        # the lowercased whitespace-collapsed text
        sh = shingle_set(s, k)
        if not s:
            assert sh == set()
        elif len(s) < k:
            assert sh == {s}
        else:
            normalized = " ".join(s.lower().split())
            if len(normalized) < k:
                assert sh == ({normalized} if normalized else set())
            else:
                assert all(len(x) == k for x in sh)
                # long texts are insensitive to extra whitespace
                assert shingle_set("  " + s + "\t", k) == sh


class TestBloomProperties:
    @given(st.lists(st.text(max_size=50), max_size=100))
    @settings(max_examples=50, deadline=None)
    def test_no_false_negatives(self, keys):
        bf = BloomFilter(capacity=1000)
        bf.add_many(keys)
        assert all(k in bf for k in keys)
        # serialization preserves membership
        back = BloomFilter.from_bytes(bf.to_bytes())
        assert all(k in back for k in keys)


class TestMinHashProperties:
    @given(st.text(min_size=7, max_size=200))
    @settings(max_examples=50, deadline=None)
    def test_signature_bounds_and_self_similarity(self, s):
        mh = MinHasher()
        sig = mh.signature(s)
        assert sig.shape == (128,)
        if shingle_set(s):
            assert (sig < (1 << 32)).all()
            assert jaccard_estimate(sig, sig) == 1.0

    @given(st.text(min_size=20, max_size=200), st.text(min_size=0, max_size=30))
    @settings(max_examples=50, deadline=None)
    def test_concat_overlaps(self, base, suffix):
        # appending text can only keep-or-lower each signature slot:
        # the shingle set of base+suffix is a superset of... NOT in
        # general (boundary shingles change) — but the estimate between
        # a text and itself-plus-suffix must be positive when they share
        # any shingle, and symmetric either way.
        mh = MinHasher()
        a = mh.signature(base)
        b = mh.signature(base + suffix)
        est_ab = jaccard_estimate(a, b)
        est_ba = jaccard_estimate(b, a)
        assert est_ab == est_ba
        shared = shingle_set(base) & shingle_set(base + suffix)
        if shared and not suffix.strip():
            # whitespace-only suffix is canonicalized away -> identical
            assert est_ab == 1.0


class TestClusterProperties:
    @given(
        st.lists(
            st.tuples(st.integers(0, 30), st.integers(0, 30)),
            max_size=60,
        )
    )
    @settings(max_examples=100, deadline=None)
    def test_union_find_components(self, raw_edges):
        edges = [(f"c{a}", f"c{b}") for a, b in raw_edges if a != b]
        assign = driver_union_find(edges)
        # representative is the component minimum and shared transitively
        import collections

        adj = collections.defaultdict(set)
        for a, b in edges:
            adj[a].add(b)
            adj[b].add(a)
        seen: set[str] = set()
        for start in adj:
            if start in seen:
                continue
            comp = {start}
            stack = [start]
            while stack:
                n = stack.pop()
                for m in adj[n]:
                    if m not in comp:
                        comp.add(m)
                        stack.append(m)
            seen |= comp
            rep = min(comp)
            for n in comp:
                assert assign.get(n, n) == rep


class TestExactMathProperties:
    @given(
        st.lists(
            st.floats(
                min_value=-1e6,
                max_value=1e6,
                allow_nan=False,
                allow_infinity=False,
            ),
            min_size=1,
            max_size=50,
        )
    )
    @settings(max_examples=200, deadline=None)
    def test_floor_round_ordering(self, xs):
        arr = np.array(xs, dtype=np.float64)
        out = floor_round_np(arr)
        # floor(x*1e6 + 0.5)/1e6 is round-half-up to the 1e-6 grid:
        # values stay within half a grid cell (plus float error) and
        # the map is monotone nondecreasing
        tol = 5e-7 + np.abs(arr) * 1e-9 + 1e-12
        assert (np.abs(out - arr) <= tol).all()
        order = np.argsort(arr, kind="stable")
        assert (np.diff(out[order]) >= -1e-12).all()
        # idempotent on its own grid
        assert np.allclose(floor_round_np(out), out, atol=1e-12)


class TestMisraGriesProperties:
    @given(
        st.lists(
            st.tuples(st.integers(0, 40), st.integers(1, 25)),
            max_size=150,
        ),
        st.integers(min_value=4, max_value=32),
    )
    @settings(max_examples=100, deadline=None)
    def test_bound_presence_and_merge(self, items, cap):
        import collections

        from quarrycore_ray.functions.sketches import MisraGries

        truth = collections.Counter()
        for k, n in items:
            truth[f"k{k}"] += n
        total = sum(truth.values())

        half = len(items) // 2
        a, b = MisraGries(capacity=cap), MisraGries(capacity=cap)
        for k, n in items[:half]:
            a.update_many([f"k{k}"], [n])
        for k, n in items[half:]:
            b.update_many([f"k{k}"], [n])
        m = a.merge(b)

        bound = total / cap
        for k, n in truth.items():
            if n > bound:
                assert k in m.counters
        for k, v in m.counters.items():
            assert v <= truth[k]
            assert truth[k] - v <= bound + 1e-9
        assert len(m.counters) <= cap


class TestQuantileSketchProperties:
    @given(
        st.lists(
            st.floats(min_value=-1e5, max_value=1e5,
                      allow_nan=False, allow_infinity=False),
            min_size=1,
            max_size=2000,
        )
    )
    @settings(max_examples=40, deadline=None)
    def test_rank_error_bound_and_merge(self, xs):
        from quarrycore_ray.functions.sketches import QuantileSketch

        cap = 128
        # per-batch sketches merged on the driver, like the Ray shape
        half = len(xs) // 2
        a, b = QuantileSketch(cap), QuantileSketch(cap)
        a.update(xs[:half])
        b.update(xs[half:])
        m = a.merge(b)

        s = sorted(xs)
        n = len(s)
        for q in (0.1, 0.5, 0.9):
            est = m.quantile(q)
            # rank of the estimate must be within a few chunks of q*n
            import bisect

            lo = bisect.bisect_left(s, est)
            hi = bisect.bisect_right(s, est)
            target = q * n
            slack = max(4.0, 4.0 * n / cap)
            assert lo - slack <= target <= hi + slack


class TestMattrProperties:
    @given(
        st.lists(st.sampled_from("abcdef"), min_size=0, max_size=60),
        st.integers(min_value=1, max_value=12),
    )
    @settings(max_examples=300, deadline=None)
    def test_on_matches_naive_window_scan(self, tokens, window):
        from quarrycore_ray.functions.textstats import mattr_fraction

        num, den = mattr_fraction(tokens, window)
        n = len(tokens)
        if n < window:
            assert (num, den) == (len(set(tokens)), max(n, 1))
        else:
            naive = sum(
                len(set(tokens[i : i + window]))
                for i in range(n - window + 1)
            )
            assert num == naive
            assert den == window * (n - window + 1)
        # a fraction in (0, 1] for non-empty inputs
        if n:
            assert 0 < num <= den


class TestCodecProperties:
    """Dimension/content sweeps over the from-spec media codecs: the
    hand-written cases pin known files; these sweep arbitrary shapes
    (odd dims, 1-pixel edges, non-multiple-of-8 JPEG crops)."""

    @given(
        st.integers(min_value=1, max_value=21),
        st.integers(min_value=1, max_value=21),
        st.sampled_from([1, 3, 4]),
        st.integers(min_value=0, max_value=2**32 - 1),
    )
    @settings(max_examples=60, deadline=None)
    def test_png_roundtrip_lossless(self, h, w, ch, seed):
        from quarrycore_ray.multimodal import decode_png, encode_png

        rng = np.random.default_rng(seed)
        img = rng.integers(0, 256, (h, w) if ch == 1 else (h, w, ch), dtype=np.uint8)
        assert np.array_equal(decode_png(encode_png(img)), img)

    @given(
        st.integers(min_value=1, max_value=4),
        st.integers(min_value=1, max_value=13),
        st.integers(min_value=1, max_value=13),
        st.integers(min_value=0, max_value=2**32 - 1),
    )
    @settings(max_examples=40, deadline=None)
    def test_y4m_roundtrip_lossless(self, n, h, w, seed):
        from quarrycore_ray.multimodal import encode_y4m, iter_y4m_frames

        rng = np.random.default_rng(seed)
        frames = rng.integers(0, 256, (n, h, w), dtype=np.uint8)
        got = list(iter_y4m_frames(encode_y4m(frames)))
        assert len(got) == n
        assert all(gw == w and gh == h for gw, gh, _ in got)
        assert all(luma == frames[i].tobytes() for i, (_, _, luma) in enumerate(got))

    @given(
        st.integers(min_value=1, max_value=20),
        st.integers(min_value=1, max_value=20),
        st.booleans(),
        st.integers(min_value=0, max_value=2**32 - 1),
    )
    @settings(max_examples=30, deadline=None)
    def test_jpeg_roundtrip_shape_and_range(self, h, w, color, seed):
        from quarrycore_ray.jpeg import decode_jpeg, encode_jpeg

        rng = np.random.default_rng(seed)
        shape = (h, w, 3) if color else (h, w)
        img = rng.integers(0, 256, shape, dtype=np.uint8)
        out = decode_jpeg(encode_jpeg(img))
        assert out.shape == shape
        assert out.dtype == np.uint8

    @given(
        st.integers(min_value=0, max_value=127),
        st.integers(min_value=1, max_value=20),
        st.integers(min_value=1, max_value=20),
    )
    @settings(max_examples=30, deadline=None)
    def test_jpeg_even_constant_gray_lossless(self, half, h, w):
        # T.81 Annex K Q[0]=16 with our floor(x/Q+0.5) tie rule makes any
        # even constant raster reconstruct exactly (the jpeg_decode_stats
        # oracle's premise, swept over arbitrary dims)
        from quarrycore_ray.jpeg import decode_jpeg, encode_jpeg

        img = np.full((h, w), 2 * half, dtype=np.uint8)
        assert np.array_equal(decode_jpeg(encode_jpeg(img)), img)
