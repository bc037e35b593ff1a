"""In-process, row-at-a-time reference oracle for near-dup detection.

Mirrors the reference's sequential Redis-LSH behavior
(`/root/reference/src/quarrycore/dedup/minhash_redis.py:204-255`):
for each document in arrival order, compute the MinHash signature,
query the LSH index (band-hash buckets) for candidates, verify, record
edges, then insert the document. Because every pair sharing a band
bucket is discovered by whichever member arrives later, the resulting
edge set equals "all within-bucket pairs passing verification" — the
same set the distributed engine computes with its groupby shuffle. The
oracle is therefore the correctness yardstick for dup-pair recall
(BASELINE.md: recall >= 0.99 vs reference clusters).

Verification rule (shared verbatim with the engine,
`quarrycore_ray/stages/verify.py`): a candidate pair is a duplicate iff
signature-Jaccard >= threshold, OR its SimHash Hamming distance <=
`strict_hamming` (catches very-near duplicates whose MinHash estimate
fell just under the threshold by sampling noise). The reference analog
of re-verification is `deduplicator/minhash_lsh.py:162-181`.
"""

from __future__ import annotations

from collections import defaultdict

import numpy as np

from .config import DedupConfig
from .minhash import MinHasher, band_hashes, jaccard_estimate
from .simhash import SimHasher, hamming_distance

# spec default for DedupConfig.strict_hamming (kept as a named constant
# for standalone `pair_is_duplicate` callers)
STRICT_HAMMING = 3


def pair_is_duplicate(
    jacc_est: float, ham: int, threshold: float, strict_hamming: int = STRICT_HAMMING
) -> bool:
    """The single shared verification predicate (engine + oracle)."""
    return jacc_est >= threshold or ham <= strict_hamming


class UnionFind:
    """Path-compressed union-find keyed by arbitrary hashables."""

    def __init__(self):
        self.parent: dict = {}

    def find(self, x):
        p = self.parent.setdefault(x, x)
        while p != x:
            self.parent[x] = p = self.parent.setdefault(p, p)
            x, p = p, self.parent[p]
        return x

    def union(self, a, b):
        ra, rb = self.find(a), self.find(b)
        if ra != rb:
            # deterministic: smaller id becomes the root
            lo, hi = (ra, rb) if ra <= rb else (rb, ra)
            self.parent[hi] = lo

    def components(self) -> dict:
        """{member: min-id representative} over all seen keys."""
        return {x: self.find(x) for x in list(self.parent)}


class SequentialLSHOracle:
    """Row-at-a-time MinHash-LSH dedup, as the reference would run it."""

    def __init__(self, config: DedupConfig | None = None):
        self.cfg = config or DedupConfig()
        self.bands, self.rows = self.cfg.band_plan()
        self.mh = MinHasher(self.cfg.num_perm, self.cfg.minhash_seed, self.cfg.shingle_size)
        self.sh = SimHasher(self.cfg.shingle_size)
        self.buckets: dict[tuple[int, int], list[str]] = defaultdict(list)
        self.sigs: dict[str, np.ndarray] = {}
        self.fps: dict[str, int] = {}
        self.thrs: dict[str, float] = {}
        self.edges: list[tuple[str, str]] = []

    def add(self, doc_id: str, text: str, domain: str | None = None) -> list[str]:
        """Query-then-insert; returns verified near-duplicate doc ids.

        `domain` selects the per-content-type threshold
        (config.domain_minhash_thresholds); a pair uses the stricter of
        its two sides, matching PairVerifier.
        """
        sig = self.mh.signature(text)
        fp = self.sh.fingerprint(text)
        thr = self.cfg.threshold_for(domain)
        bh = band_hashes(sig.reshape(1, -1), self.bands, self.rows)[0]
        candidates: set[str] = set()
        for b in range(self.bands):
            candidates.update(self.buckets[(b, int(bh[b]))])
        hits = []
        for cand in candidates:
            je = jaccard_estimate(sig, self.sigs[cand])
            ham = int(hamming_distance(fp, self.fps[cand]))
            pair_thr = max(thr, self.thrs[cand])
            if pair_is_duplicate(je, ham, pair_thr, self.cfg.strict_hamming):
                hits.append(cand)
                self.edges.append((min(cand, doc_id), max(cand, doc_id)))
        for b in range(self.bands):
            self.buckets[(b, int(bh[b]))].append(doc_id)
        self.sigs[doc_id] = sig
        self.fps[doc_id] = fp
        self.thrs[doc_id] = thr
        return sorted(hits)

    def clusters(self) -> dict[str, str]:
        """{doc_id: cluster_rep} where rep = min doc_id of the component."""
        uf = UnionFind()
        for d in self.sigs:
            uf.find(d)
        for a, b in self.edges:
            uf.union(a, b)
        return uf.components()


def cluster_pairs(assign: dict[str, str]) -> set[tuple[str, str]]:
    """All unordered co-membership pairs implied by a cluster assignment."""
    groups: dict[str, list[str]] = defaultdict(list)
    for doc, rep in assign.items():
        groups[rep].append(doc)
    pairs: set[tuple[str, str]] = set()
    for members in groups.values():
        members.sort()
        for i in range(len(members)):
            for j in range(i + 1, len(members)):
                pairs.add((members[i], members[j]))
    return pairs


def pair_recall(truth: dict[str, str], predicted: dict[str, str]) -> float:
    """Fraction of truth co-membership pairs recovered by `predicted`."""
    tp = cluster_pairs(truth)
    if not tp:
        return 1.0
    pp = cluster_pairs(predicted)
    return len(tp & pp) / len(tp)
