"""Dedup engine configuration.

Mirrors the authoritative production config of the reference
(`/root/reference/src/quarrycore/dedup/hybrid_dedup.py:42-51`,
`/root/reference/src/quarrycore/dedup/minhash_redis.py:57-79`,
`/root/reference/docs/dedup.md:70-79`): character shingles of size 7
over lowercased whitespace-collapsed text, 128 MinHash permutations,
Jaccard threshold 0.85, SHA-256 exact layer over canonicalized text.

The LSH band plan (b bands x r rows, b*r <= num_perm) is derived with
the same optimization the reference's LSH library uses: minimize
``0.5 * P(false positive) + 0.5 * P(false negative)`` (weights per
`/root/reference/src/quarrycore/deduplicator/minhash_lsh.py:68-72`).
"""

from __future__ import annotations

from dataclasses import dataclass


@dataclass(frozen=True)
class DedupConfig:
    """Configuration for the multi-level dedup pipeline."""

    # --- MinHash / LSH layer (reference: dedup/minhash_redis.py:57-79) ---
    shingle_size: int = 7
    num_perm: int = 128
    threshold: float = 0.85
    minhash_seed: int = 1  # datasketch default seed
    false_positive_weight: float = 0.5
    false_negative_weight: float = 0.5

    # Per-content-type verification thresholds (reference
    # deduplicator/deduplicator.py:84-91). A conversation table may carry
    # a `domain` column (DomainType values, protocols.py:68-78); the pair
    # verifier then applies max(thr_a, thr_b) — the stricter side wins.
    # Stored as a tuple of pairs so the config stays hashable; see
    # `threshold_for` / `domain_thresholds`. Domains without an entry
    # (news/academic/social) fall back to `threshold` (the reference
    # falls back to its "general" entry; our default threshold 0.85 is
    # the production hybrid config, stricter than legacy general 0.8).
    domain_minhash_thresholds: tuple = (
        ("medical", 0.85),
        ("legal", 0.83),
        ("technical", 0.8),
        ("ecommerce", 0.75),
        ("general", 0.8),
    )

    # banding plan override: when set, band_plan() uses this instead of
    # `threshold` (threshold-sweep analysis: fixed candidates, varying
    # verify predicate)
    band_threshold: float | None = None

    # --- SimHash verification layer (north-rule addition) ---
    simhash_bits: int = 64
    # A candidate pair is a duplicate iff signature-Jaccard >= threshold
    # OR SimHash Hamming <= strict_hamming (the Hamming clause recovers
    # very-near duplicates whose 128-slot Jaccard estimate fell just
    # under the threshold by sampling noise). Wired through both
    # PairVerifier and the sequential oracle.
    strict_hamming: int = 3

    # --- skew handling (north-rule "skew-aware bucket splitting") ---
    # An LSH bucket with more than `bucket_cap` members is assumed to be
    # boilerplate-driven. Instead of emitting O(n^2) pairs we split the
    # bucket into salted sub-buckets of at most `bucket_cap` members
    # (deterministic salt = rank of member within sorted bucket) and
    # emit pairs only within sub-buckets plus a chain linking
    # consecutive sub-buckets, preserving connected-component
    # connectivity while bounding pair count to O(n * bucket_cap).
    bucket_cap: int = 64

    # --- execution sizing ---
    batch_size: int = 4096
    # signature batches are CPU-heavy (~1 ms/doc): smaller batches = more
    # tasks = better pool utilization and shorter stragglers
    sig_batch_size: int = 512
    # None = size actor pools from the cluster at runtime (CPU-proportional)
    verify_concurrency: int | None = None
    minhash_concurrency: int | None = None

    # --- substring stage ---
    min_substring_overlap: int = 100  # chars, reference fuzzy_matcher.py:213-236

    # --- clustering scale switch ---
    # Verified edge sets up to this size are union-found on the driver
    # (O(duplicate-pairs) memory, the fast path). Beyond it the pipeline
    # auto-switches to distributed min-label propagation
    # (stages/cluster.py:label_propagation) and cluster assignment via
    # partitioned joins — no driver-side edge or label materialization.
    labelprop_edge_threshold: int = 50_000_000

    # --- fault injection (tests only) ---
    # When set, the FIRST PairVerifier actor to observe the flag file
    # absent creates it and kills its own process (os._exit) mid-batch,
    # exercising Ray's actor-restart + task-retry path end-to-end
    # (reference e2e analog: tests/e2e/test_resume.py). Production runs
    # leave this None.
    fault_kill_verify_once: str | None = None

    def threshold_for(self, domain: str | None) -> float:
        """MinHash verification threshold for a content domain."""
        if domain:
            for d, t in self.domain_minhash_thresholds:
                if d == domain:
                    return t
        return self.threshold

    def resolved_minhash_concurrency(self) -> int:
        return self.minhash_concurrency or _cpu_fraction(0.5)

    def sig_pool_size(self, n_rows: int | None = None) -> int:
        """FIXED signature-stage actor-pool size.

        An autoscaling ``(1, N)`` pool ramps one actor at a time, so a
        burst of signature blocks runs half-idle for most of its life —
        measured 2.2x wall (14.3 s vs 6.5 s) on the 116,830-rep sf0.1
        corpus at 32 CPUs. A fixed pool starts every actor up front.
        When the input row count is known, small inputs get only as
        many actors as their batch count can feed (one batch per actor
        minimum), so tiny corpora keep fast startup.
        """
        conc = self.resolved_minhash_concurrency()
        if n_rows is None:
            return conc
        return max(1, min(conc, n_rows // self.sig_batch_size + 1))

    def resolved_verify_concurrency(self) -> int:
        return self.verify_concurrency or _cpu_fraction(0.125)

    def band_plan(self) -> tuple[int, int]:
        """Return (bands, rows_per_band) minimizing weighted FP+FN.

        Same integral-minimization as the reference's LSH library
        (public algorithm), evaluated with a trapezoidal integral so we
        need no scipy dependency. For threshold=0.85 / num_perm=128
        this yields b*r == 128 with r around 8-10.

        `band_threshold` (when set) decouples the banding plan from the
        verification threshold — used by the threshold-sweep analysis,
        which holds the candidate set fixed while varying only the
        verify predicate.
        """
        return optimal_band_plan(
            self.band_threshold
            if self.band_threshold is not None
            else self.threshold,
            self.num_perm,
            self.false_positive_weight,
            self.false_negative_weight,
        )


def fixed_probe_pool(frac: float = 0.125, lo: int = 1, hi: int = 16) -> int:
    """Pre-started FIXED actor-pool size for light broadcast-probe and
    media-decode stages (turn-dedup probes, dHash/audio fingerprints).

    Same rationale as `DedupConfig.sig_pool_size`: an autoscaling
    ``(1, N)`` pool ramps one actor at a time and measured 2.2x the wall
    of a pre-started pool on bursty stages; these stages are light per
    batch, so an eighth of the cluster (capped) keeps them off the
    critical path without starving the heavy pools. ``lo=1``: fixed
    actors hold their CPU for the pipeline's lifetime, and a pipeline
    stacks several pools — on a tiny cluster (the 4-CPU test fixture)
    a 2-actor floor per probe stage can pin every CPU under actors and
    deadlock the task operators between them.
    """
    return _cpu_fraction(frac, lo, hi)


def _cpu_fraction(frac: float, lo: int = 2, hi: int = 64) -> int:
    try:
        import ray

        cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    except Exception:  # pragma: no cover - ray not importable
        cpus = 8
    return max(lo, min(hi, int(cpus * frac)))


def _integrate(f, a: float, b: float, n: int = 2000) -> float:
    import numpy as np

    x = np.linspace(a, b, n)
    y = f(x)
    return float(np.trapz(y, x))


import functools


@functools.lru_cache(maxsize=32)
def optimal_band_plan(
    threshold: float,
    num_perm: int,
    fp_weight: float = 0.5,
    fn_weight: float = 0.5,
) -> tuple[int, int]:
    """Pick (b, r) with b*r <= num_perm minimizing weighted FP+FN error.

    P(candidate | s) = 1 - (1 - s^r)^b. FP error integrates that curve
    below the threshold; FN error integrates its complement above.
    """
    best = (1, num_perm)
    best_err = float("inf")
    for b in range(1, num_perm + 1):
        max_r = num_perm // b
        for r in range(1, max_r + 1):
            fp = _integrate(lambda s: 1.0 - (1.0 - s**float(r)) ** float(b), 0.0, threshold)
            fn = _integrate(
                lambda s: 1.0 - (1.0 - (1.0 - s**float(r)) ** float(b)), threshold, 1.0
            )
            err = fp_weight * fp + fn_weight * fn
            if err < best_err:
                best_err = err
                best = (b, r)
    return best


DEFAULT_CONFIG = DedupConfig()
