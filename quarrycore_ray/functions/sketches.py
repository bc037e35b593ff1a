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
    """p-bit HyperLogLog with a pluggable 64-bit hash.

    Default hash = blake2b (the engine-internal choice). Pass
    ``hash64=simhash.md5_feature_hash64`` to make register contents —
    and therefore the estimate — reproducible in DuckDB SQL (md5 is the
    one 64-bit-capable digest DuckDB 1.0 ships); the driver query
    `vocab_size_approx` uses that variant so the sketch is
    exact-oracle-checked, the same two-hash design as simhash.py.
    """

    def __init__(self, p: int = 12, hash64=None):
        self.p = p
        self.m = 1 << p
        self.registers = np.zeros(self.m, dtype=np.uint8)
        self.alpha = 0.7213 / (1 + 1.079 / self.m)
        self._hash64 = hash64

    def add(self, value: str) -> None:
        if self._hash64 is not None:
            h = self._hash64(value)
        else:
            h = int.from_bytes(
                hashlib.blake2b(value.encode("utf-8"), digest_size=8).digest(),
                "little",
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
        # exact-integer harmonic sum: sum(2^-r) == S / 2^maxrank with
        # S = sum(2^(maxrank - r)) computed in unbounded python ints —
        # summation-order-free and bit-identical to the SQL oracle's
        # HUGEINT sum (the max possible rank is 64 - p + 1)
        import math

        maxrank = 64 - self.p + 1
        s_int = sum(1 << (maxrank - int(r)) for r in self.registers)
        inv = s_int / float(1 << maxrank)
        est = self.alpha * self.m * self.m / inv
        zeros = int((self.registers == 0).sum())
        if est <= 2.5 * self.m and zeros:
            # math.log (libm) rather than np.log (SIMD variant) so the
            # correction matches DuckDB's ln() on the same libm
            est = self.m * math.log(self.m / zeros)  # small-range correction
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


class QuantileSketch:
    """Mergeable equal-weight quantile summary (t-digest-lite).

    Keeps at most `capacity` (value, weight) centroids. Updating or
    merging concatenates centroids and, over capacity, re-compresses by
    sorting and pooling into equal-weight chunks — each centroid then
    spans ~1/capacity of the total weight, so any quantile query lands
    within one chunk of the true rank: rank error <= totalWeight /
    capacity per compression round. The distributed shape mirrors the
    HLL/Misra-Gries operators: one sketch per batch inside
    `map_batches`, a tiny driver merge — no sort, no shuffle, where the
    exact path (`documents.length_quantiles`) needs a value-histogram
    groupby.
    """

    def __init__(self, capacity: int = 512):
        self.capacity = capacity
        self.values = np.empty(0, dtype=np.float64)
        self.weights = np.empty(0, dtype=np.float64)

    def update(self, values) -> None:
        v = np.asarray(values, dtype=np.float64)
        self.values = np.concatenate([self.values, v])
        self.weights = np.concatenate([self.weights, np.ones(len(v))])
        if len(self.values) > 2 * self.capacity:
            self._compress()

    def merge(self, other: "QuantileSketch") -> "QuantileSketch":
        out = QuantileSketch(self.capacity)
        out.values = np.concatenate([self.values, other.values])
        out.weights = np.concatenate([self.weights, other.weights])
        if len(out.values) > out.capacity:
            out._compress()
        return out

    def _compress(self) -> None:
        order = np.argsort(self.values, kind="stable")
        v, w = self.values[order], self.weights[order]
        total = w.sum()
        # pool sorted centroids into <= capacity equal-weight chunks
        edges = np.linspace(0, total, self.capacity + 1)
        cum = np.cumsum(w)
        idx = np.searchsorted(cum - 1e-9, edges[1:-1])
        bounds = np.concatenate([[0], idx, [len(v)]])
        vals, wts = [], []
        for s, e in zip(bounds[:-1], bounds[1:]):
            if e > s:
                cw = w[s:e].sum()
                vals.append(float((v[s:e] * w[s:e]).sum() / cw))
                wts.append(float(cw))
        self.values = np.array(vals)
        self.weights = np.array(wts)

    def quantile(self, q: float) -> float:
        if len(self.values) == 0:
            return float("nan")
        order = np.argsort(self.values, kind="stable")
        v, w = self.values[order], self.weights[order]
        cum = np.cumsum(w)
        target = q * cum[-1]
        return float(v[min(int(np.searchsorted(cum, target)), len(v) - 1)])


def approx_quantiles(
    ds,
    col: str,
    qs: tuple[float, ...] = (0.25, 0.5, 0.75, 0.9),
    capacity: int = 512,
) -> dict[float, float]:
    """Distributed approximate quantiles: one QuantileSketch per batch
    inside `map_batches`, merged on the driver — the shuffle-free
    alternative to the exact value-histogram groupby
    (`pipelines/documents.length_quantiles`). Use when the column is
    high-cardinality continuous (no small histogram exists)."""
    import pickle

    import pyarrow as pa

    def _sketch(batch: pa.Table) -> pa.Table:
        sk = QuantileSketch(capacity)
        sk.update(np.asarray(batch[col], dtype=np.float64))
        blob = pickle.dumps((sk.values, sk.weights))
        return pa.table({"sketch": pa.array([blob], pa.binary())})

    merged = QuantileSketch(capacity)
    for b in ds.map_batches(_sketch, batch_format="pyarrow").iter_batches(
        batch_size=1024, batch_format="pyarrow"
    ):
        for blob in b["sketch"].to_pylist():
            other = QuantileSketch(capacity)
            other.values, other.weights = pickle.loads(blob)
            merged = merged.merge(other)
    return {q: merged.quantile(q) for q in qs}


def approx_vocab_size(
    ds, text_col: str = "canonical", p: int = 12, hash64=None
) -> float:
    """Distributed approximate distinct-token count: one HLL per batch
    (pre-aggregation inside map_batches), merged on the driver — the
    shuffle-free alternative to an exact token groupby. `hash64` picks
    the register hash (see HyperLogLog; md5 variant = SQL-checkable)."""
    import pyarrow as pa

    def _sketch(batch: pa.Table) -> pa.Table:
        hll = HyperLogLog(p, hash64=hash64)
        for t in batch[text_col].to_pylist():
            if t:
                hll.add_many(t.split(" "))
        return pa.table({"sketch": pa.array([hll.to_bytes()], pa.binary())})

    merged = HyperLogLog(p, hash64=hash64)
    for b in ds.map_batches(_sketch, batch_format="pyarrow").iter_batches(
        batch_size=1024, batch_format="pyarrow"
    ):
        for blob in b["sketch"].to_pylist():
            merged = merged.merge(HyperLogLog.from_bytes(blob))
    return merged.cardinality()
