"""Stage S5 — pair verification (stateful actor pool).

Reference semantics: LSH candidates are re-scored with the
signature-estimated Jaccard (`/root/reference/src/quarrycore/deduplicator/
minhash_lsh.py:162-181`). The north rule adds SimHash Hamming-distance
verification. The shared predicate (`quarrycore_ray.oracle.
pair_is_duplicate`) keeps the engine bit-consistent with the in-process
sequential oracle: a pair is a duplicate iff

    jaccard_estimate >= threshold  OR  hamming <= config.strict_hamming

(the Hamming clause recovers very-near duplicates whose 128-slot
estimate fell just below the threshold by sampling noise).

Runs as an actor pool (`map_batches(PairVerifier, concurrency=N)`):
verification is pure vectorized numpy — XOR/popcount for Hamming and a
columnwise equality count for the Jaccard estimate — with zero per-pair
Python.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..config import DedupConfig
from .minhash_stage import bytes_to_sigs


def _popcount64(x: np.ndarray) -> np.ndarray:
    """Per-element popcount of a uint64 array (unpackbits on byte view)."""
    if x.size == 0:
        return np.zeros(0, dtype=np.int64)
    return (
        np.unpackbits(np.ascontiguousarray(x).view(np.uint8))
        .reshape(x.size, 64)
        .sum(axis=1)
        .astype(np.int64)
    )


class PairVerifier:
    def __init__(self, config: DedupConfig | None = None, lineage: bool = False):
        self.cfg = config or DedupConfig()
        self.lineage = lineage

    def __call__(self, batch: pa.Table) -> pa.Table:
        import time as _time

        if self.cfg.fault_kill_verify_once:
            import os as _os

            try:  # exclusive create = at-most-once across the pool
                fd = _os.open(
                    self.cfg.fault_kill_verify_once,
                    _os.O_CREAT | _os.O_EXCL | _os.O_WRONLY,
                )
                _os.close(fd)
                _os._exit(1)  # simulated hard actor death mid-run
            except FileExistsError:
                pass

        t0 = _time.perf_counter()
        out = self._verify(batch)
        if self.lineage:
            from ..state.metrics import report

            report("verify", batch.num_rows, out.num_rows,
                   (_time.perf_counter() - t0) * 1000.0)
        return out

    def _verify(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        if n == 0:
            return pa.table(
                {
                    "a_id": pa.array([], pa.string()),
                    "b_id": pa.array([], pa.string()),
                    "jaccard": pa.array([], pa.float64()),
                    "hamming": pa.array([], pa.int64()),
                }
            )
        num_perm = self.cfg.num_perm
        a_sig = bytes_to_sigs(batch["a_sig"].to_pylist(), num_perm)
        b_sig = bytes_to_sigs(batch["b_sig"].to_pylist(), num_perm)
        jacc = (a_sig == b_sig).sum(axis=1) / float(num_perm)
        a_fp = np.asarray(batch["a_fp"], dtype=np.int64).view(np.uint64)
        b_fp = np.asarray(batch["b_fp"], dtype=np.int64).view(np.uint64)
        ham = _popcount64(np.bitwise_xor(a_fp, b_fp))
        # per-pair threshold: strictest of the two sides' domain
        # thresholds (config.domain_minhash_thresholds); the attach
        # stages guarantee a_thr/b_thr when the input carried `thr`
        if "a_thr" in batch.column_names:
            thr = np.maximum(
                np.asarray(batch["a_thr"], dtype=np.float64),
                np.asarray(batch["b_thr"], dtype=np.float64),
            )
        else:
            thr = self.cfg.threshold
        keep = (jacc >= thr) | (ham <= self.cfg.strict_hamming)
        out = pa.table(
            {
                "a_id": batch["a_id"],
                "b_id": batch["b_id"],
                "jaccard": pa.array(jacc, pa.float64()),
                "hamming": pa.array(ham, pa.int64()),
            }
        )
        return out.filter(pa.array(keep))
