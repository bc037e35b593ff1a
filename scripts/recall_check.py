"""Dup-pair recall validation: engine vs sequential oracle vs planted truth.

Usage: python scripts/recall_check.py [n_convs] [seed]
Prints one JSON line with recall numbers (BASELINE.md criterion:
engine-vs-oracle dup-pair recall >= 0.99).
"""

from __future__ import annotations

import collections
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    n_convs = int(sys.argv[1]) if len(sys.argv) > 1 else 20000
    seed = int(sys.argv[2]) if len(sys.argv) > 2 else 42

    import pyarrow.parquet as pq

    import ray

    from quarrycore_ray.util import silence_empty_bundle_warnings

    silence_empty_bundle_warnings()
    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
            include_dashboard=False,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    import ray.data as rd

    from quarrycore_ray.oracle import SequentialLSHOracle, pair_recall
    from quarrycore_ray.pipelines.dedup import dedup_transcripts
    from quarrycore_ray.stages.canonical import TURN_SEP
    from quarrycore_ray.synth import write_corpus
    from quarrycore_ray.text import normalize_whitespace, sha256_hex

    root = write_corpus("/tmp/qc_bench_corpus", n_convs, seed=seed, boilerplate_group=n_convs // 50)
    tdir = os.path.join(root, "transcripts")

    t0 = time.perf_counter()
    res = dedup_transcripts(rd.read_parquet(tdir))
    cl = res.clusters.to_pandas()
    engine = dict(zip(cl["conv_id"], cl["cluster_id"]))
    engine_s = time.perf_counter() - t0

    # sequential oracle over the same canonical texts
    t0 = time.perf_counter()
    transcripts = pq.read_table(tdir)
    rows = sorted(
        zip(
            transcripts.column("conv_id").to_pylist(),
            transcripts.column("turn_idx").to_pylist(),
            transcripts.column("text").to_pylist(),
        )
    )
    conv: dict[str, list[tuple[int, str]]] = collections.defaultdict(list)
    for cid, ti, tx in rows:
        conv[cid].append((ti, tx))
    canon = {
        cid: TURN_SEP.join(t for t in (normalize_whitespace(x) for _, x in sorted(v)) if t)
        for cid, v in conv.items()
    }
    by_hash: dict[str, list[str]] = collections.defaultdict(list)
    for cid, t in canon.items():
        by_hash[sha256_hex(t)].append(cid)
    rep_of = {}
    for members in by_hash.values():
        rep = min(members)
        for m in members:
            rep_of[m] = rep
    orc = SequentialLSHOracle()
    for cid in sorted(canon):
        if rep_of[cid] == cid:
            orc.add(cid, canon[cid])
    near = orc.clusters()
    oracle = {cid: near.get(rep_of[cid], rep_of[cid]) for cid in canon}
    oracle_s = time.perf_counter() - t0

    truth = pq.read_table(os.path.join(root, "truth_clusters.parquet"))
    truth_assign = dict(
        zip(truth.column("conv_id").to_pylist(), truth.column("truth_cluster_id").to_pylist())
    )

    print(
        json.dumps(
            {
                "n_convs": len(canon),
                "recall_vs_oracle": round(pair_recall(oracle, engine), 6),
                "precision_vs_oracle": round(pair_recall(engine, oracle), 6),
                "recall_vs_truth": round(pair_recall(truth_assign, engine), 6),
                "engine_s": round(engine_s, 1),
                "oracle_s": round(oracle_s, 1),
            }
        )
    )
    ray.shutdown()


if __name__ == "__main__":
    main()
