"""Mergeable sketches: HyperLogLog approximate distinct count.

SURVEY.md §2.6: the reference's dataset analytics computes vocabulary
size by exact counting (`/root/reference/src/quarrycore/dataset/
analytics.py:27-101`); at corpus scale the dataflow answer is a
mergeable sketch — one HLL per batch inside `map_batches`, a tiny
merge reduce at the end (the canonical pre-aggregation shape for
distributed distinct counts).

Standard HLL (Flajolet et al. 2007) with the usual bias correction;
register hash = 64-bit blake2b, first `p` bits select the register,
leading-zero rank of the rest sets it.
"""

from __future__ import annotations

import hashlib

import numpy as np


class HyperLogLog:
    def __init__(self, p: int = 12):
        self.p = p
        self.m = 1 << p
        self.registers = np.zeros(self.m, dtype=np.uint8)
        if p == 12:
            self.alpha = 0.7213 / (1 + 1.079 / self.m)
        else:
            self.alpha = 0.7213 / (1 + 1.079 / self.m)

    def add(self, value: str) -> None:
        h = int.from_bytes(
            hashlib.blake2b(value.encode("utf-8"), digest_size=8).digest(), "little"
        )
        idx = h & (self.m - 1)
        w = h >> self.p
        rank = (64 - self.p) - w.bit_length() + 1
        if rank > self.registers[idx]:
            self.registers[idx] = rank

    def add_many(self, values) -> None:
        for v in values:
            self.add(v)

    def merge(self, other: "HyperLogLog") -> "HyperLogLog":
        assert self.p == other.p
        out = HyperLogLog(self.p)
        out.registers = np.maximum(self.registers, other.registers)
        return out

    def cardinality(self) -> float:
        est = self.alpha * self.m * self.m / np.sum(2.0 ** -self.registers.astype(np.float64))
        zeros = int((self.registers == 0).sum())
        if est <= 2.5 * self.m and zeros:
            est = self.m * np.log(self.m / zeros)  # small-range correction
        return float(est)

    def to_bytes(self) -> bytes:
        return bytes([self.p]) + self.registers.tobytes()

    @classmethod
    def from_bytes(cls, data: bytes) -> "HyperLogLog":
        h = cls(data[0])
        h.registers = np.frombuffer(data[1:], dtype=np.uint8).copy()
        return h


class MisraGries:
    """Mergeable weighted Misra-Gries heavy-hitter sketch.

    Guarantee: after summarizing a stream of total weight N with
    capacity m, every key's sketch count undercounts its true count by
    at most N/m, and any key with true count > N/m is present. Merging
    (Agarwal et al., "Mergeable Summaries", PODS 2012) sums counters
    then subtracts the (m+1)-th largest value, preserving the bound —
    so per-batch sketches built inside `map_batches` combine into one
    cluster-wide summary without shuffling token counts.
    """

    def __init__(self, capacity: int = 4096):
        self.capacity = capacity
        self.counters: dict[str, int] = {}

    def update_many(self, keys, counts) -> None:
        c = self.counters
        for k, n in zip(keys, counts):
            if k in c:
                c[k] += int(n)
            else:
                c[k] = int(n)
        if len(c) > self.capacity:
            self._shrink()

    def _shrink(self) -> None:
        # subtract the (capacity+1)-th largest count from everything;
        # at least one counter drops to <= 0 and is evicted
        vals = sorted(self.counters.values(), reverse=True)
        cut = vals[self.capacity]
        self.counters = {
            k: v - cut for k, v in self.counters.items() if v > cut
        }

    def merge(self, other: "MisraGries") -> "MisraGries":
        out = MisraGries(self.capacity)
        merged = dict(self.counters)
        for k, v in other.counters.items():
            merged[k] = merged.get(k, 0) + v
        out.counters = merged
        if len(merged) > out.capacity:
            out._shrink()
        return out

    def candidates(self) -> list[str]:
        return list(self.counters)


def approx_vocab_size(ds, text_col: str = "canonical", p: int = 12) -> float:
    """Distributed approximate distinct-token count: one HLL per batch
    (pre-aggregation inside map_batches), merged on the driver — the
    shuffle-free alternative to an exact token groupby."""
    import pyarrow as pa

    def _sketch(batch: pa.Table) -> pa.Table:
        hll = HyperLogLog(p)
        for t in batch[text_col].to_pylist():
            if t:
                hll.add_many(t.split(" "))
        return pa.table({"sketch": pa.array([hll.to_bytes()], pa.binary())})

    merged = HyperLogLog(p)
    for b in ds.map_batches(_sketch, batch_format="pyarrow").iter_batches(
        batch_size=1024, batch_format="pyarrow"
    ):
        for blob in b["sketch"].to_pylist():
            merged = merged.merge(HyperLogLog.from_bytes(blob))
    return merged.cardinality()
