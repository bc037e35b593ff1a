"""Stage S3 — MinHash signatures + SimHash fingerprints (actor pool).

Reference semantics: `RedisMinHashLSH._create_minhash`
(`/root/reference/src/quarrycore/dedup/minhash_redis.py:186-202`) — 7-char
shingles over lowercased whitespace-collapsed text, 128 permutations,
datasketch hashing scheme (reproduced bit-exactly in
`quarrycore_ray.minhash`). SimHash fingerprints are computed in the
same pass (shared shingle sets) for the north-rule Hamming verification
stage.

This is a *stateful* stage: the permutation table and the shingle->hash
caches are built once per actor (`__init__`), then reused across
batches — the canonical Ray actor-pool pattern for amortizing setup.
Signatures are emitted as a fixed-width binary column
(num_perm * 8 bytes, little-endian uint64) so blocks stay compact and
pandas round-trips never see object arrays of numpy vectors.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..config import DedupConfig


#: untouched-slot init value for an empty shingle set (minhash._HASH_INIT)
_EMPTY_SENTINEL = np.uint64(1 << 32)


def sig_to_bytes(sig: np.ndarray) -> bytes:
    """Serialize a signature as little-endian uint32 (num_perm * 4 bytes).

    MinHash slot values are < 2^32 by construction (bitwise_and with
    0xFFFFFFFF); only the empty-text sentinel 2^32 (the untouched
    `_HASH_INIT` slot of an empty shingle set) may exceed it, and is
    clamped — the exact layer guarantees at most one empty-text rep, so
    the clamp cannot create spurious slot equalities. Any OTHER
    out-of-range value would mean a corrupted signature whose clamp
    could silently alias distinct texts, so it raises instead of
    clamping. Half the bytes of a u8 encoding = half the shuffle
    volume.
    """
    over = sig > 0xFFFFFFFF
    if over.any():
        bad = np.unique(sig[over])
        if bad.size > 1 or bad[0] != _EMPTY_SENTINEL:
            raise ValueError(
                "out-of-range MinHash slot values "
                f"{bad[:8].tolist()} != empty-text sentinel "
                f"{int(_EMPTY_SENTINEL)}; refusing to clamp a corrupted "
                "signature"
            )
    return np.minimum(sig, 0xFFFFFFFF).astype("<u4").tobytes()


def bytes_to_sigs(col: list[bytes], num_perm: int) -> np.ndarray:
    """(n, num_perm) uint64 matrix from a u4 binary column."""
    if not col:
        return np.empty((0, num_perm), dtype=np.uint64)
    return (
        np.frombuffer(b"".join(col), dtype="<u4")
        .reshape(len(col), num_perm)
        .astype(np.uint64)
    )


class MinHashSimHashStage:
    """Callable class for `map_batches(MinHashSimHashStage, concurrency=N)`."""

    def __init__(self, config: DedupConfig | None = None, lineage: bool = False):
        from ..minhash import CombinedMinSimHasher

        cfg = config or DedupConfig()
        self.cfg = cfg
        self.lineage = lineage
        self.hasher = CombinedMinSimHasher(
            cfg.num_perm, cfg.minhash_seed, cfg.shingle_size
        )
        # Cache-block size for the permute kernel, sized so the POOL's
        # aggregate (block, num_perm) uint64 working set stays within a
        # shared-LLC budget: measured on a bandwidth-capped host, 4096
        # wins with <=8 actors (1835 vs 1632 rows/s at pool=2) and 2048
        # wins with 16 actors (4512 vs 3920 rows/s) — one actor's block
        # is ~block KB, and past ~32 MB aggregate the kernel falls off
        # the LLC onto the shared DRAM bus and anti-scales.
        pool = cfg.resolved_minhash_concurrency()
        budget_rows = (32 * 1024 * 1024) // (max(pool, 1) * cfg.num_perm * 8)
        self.block_shingles = max(1024, min(4096, 1 << budget_rows.bit_length() - 1))

    def __call__(self, batch: pa.Table) -> pa.Table:
        import time as _time

        t0 = _time.perf_counter()
        texts = batch["canonical_text"].to_pylist()
        sigs, fps = self.hasher.compute(texts, block_shingles=self.block_shingles)
        if self.lineage:
            from ..state.metrics import report

            report("minhash", batch.num_rows, batch.num_rows,
                   (_time.perf_counter() - t0) * 1000.0)
        batch = batch.append_column(
            "minhash_sig", pa.array([sig_to_bytes(s) for s in sigs], pa.binary())
        )
        # store simhash as int64 view (bit pattern preserved) — Arrow/pandas
        # round-trip uint64 poorly through some paths.
        batch = batch.append_column("simhash", pa.array(fps.view(np.int64), pa.int64()))
        return batch
