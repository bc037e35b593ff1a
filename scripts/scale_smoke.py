"""Spill-scale smoke: the flagship at ~10x the bench corpus under a
deliberately small object store.

The strongest single-node proxy for the multi-node 100 TB claim
(VERDICT r3 'next round' #3): run the full dedup pipeline over a corpus
whose working set EXCEEDS the configured object store, proving that

- streaming execution + object spilling complete the run (no OOM),
- the driver's heap stays flat (max RSS recorded — union-find holds
  only duplicate-pair ids, never corpus data),
- cluster invariants hold at scale (planted-dup recall vs the synth
  truth table, cluster count = distinct_texts - merges).

Usage: python scripts/scale_smoke.py [n_convs] [object_store_gb]
Defaults: 1_000_000 convs (10x bench), 3 GiB store. Emits ONE JSON
line; the driver artifact convention stores it as SCALE_SMOKE_r{N}.json.
"""

from __future__ import annotations

import json
import os
import re
import resource
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    n_convs = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    store_gb = float(sys.argv[2]) if len(sys.argv) > 2 else 3.0

    import ray

    from quarrycore_ray.util import (
        silence_empty_bundle_warnings,
        worker_lib_preload_hook,
    )

    silence_empty_bundle_warnings()
    ray.init(
        address="local",
        num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
        object_store_memory=int(store_gb * (1 << 30)),
        include_dashboard=False,
        logging_level="ERROR",
        runtime_env={
            "worker_process_setup_hook": worker_lib_preload_hook()
        },
    )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    import pandas as pd

    import ray.data as rd

    from quarrycore_ray.oracle import pair_recall
    from quarrycore_ray.pipelines.dedup import dedup_transcripts
    from quarrycore_ray.synth import write_corpus

    root = write_corpus(
        os.environ.get("GRAFT_BENCH_CORPUS_DIR", "/tmp/qc_bench_corpus"),
        n_convs,
        seed=42,
        boilerplate_group=n_convs // 50,
    )
    tdir = os.path.join(root, "transcripts")
    n_turns = rd.read_parquet(tdir).count()

    rss_before = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss  # KiB

    t0 = time.perf_counter()
    res = dedup_transcripts(rd.read_parquet(tdir))
    # consume by WRITING (the production sink) — never a driver collect
    out_dir = f"/tmp/scale_smoke_clusters_n{n_convs}"
    import shutil

    shutil.rmtree(out_dir, ignore_errors=True)
    res.clusters.write_parquet(out_dir)
    wall = time.perf_counter() - t0

    rss_after = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss

    # spill evidence from the raylet's own periodic log lines
    # ("Spilled N MiB, M objects" — the grpc-backed memory_summary API
    # isn't available in this environment)
    spilled_mib = 0
    session_dir = ray._private.worker._global_node.get_session_dir_path()
    raylet_log = os.path.join(session_dir, "logs", "raylet.out")
    try:
        with open(raylet_log, errors="replace") as f:
            for line in f:
                m = re.search(r"Spilled (\d+) MiB", line)
                if m:
                    spilled_mib = max(spilled_mib, int(m.group(1)))
    except OSError:
        pass

    # planted-truth recall over the written clusters (read back from
    # parquet — also proves the sink round-trips)
    cl = pd.read_parquet(out_dir)
    truth = pd.read_parquet(os.path.join(root, "truth_clusters.parquet"))
    recall = pair_recall(
        dict(zip(truth["conv_id"], truth["truth_cluster_id"])),
        dict(zip(cl["conv_id"], cl["cluster_id"])),
    )

    # scale factor vs the 1x bench corpus, derived from its parquet
    # metadata when it exists on this host (never a hardcoded count —
    # synth-generator changes would silently skew a frozen constant)
    scale_vs_bench = None
    bench_convs = int(os.environ.get("GRAFT_BENCH_CONVS", "100000"))
    bench_tdir = os.path.join(
        os.environ.get("GRAFT_BENCH_CORPUS_DIR", "/tmp/qc_bench_corpus"),
        f"n{bench_convs}_s42", "transcripts",
    )
    if os.path.isdir(bench_tdir):
        import pyarrow.parquet as pq

        base_turns = sum(
            pq.read_metadata(os.path.join(bench_tdir, f)).num_rows
            for f in os.listdir(bench_tdir)
            if f.endswith(".parquet")
        )
        if base_turns:
            scale_vs_bench = round(n_turns / base_turns, 2)

    out = {
        "metric": "scale_smoke",
        "n_convs": n_convs,
        "n_turns": int(n_turns),
        "scale_vs_bench": scale_vs_bench,
        "object_store_gb": store_gb,
        "spilled_mib": spilled_mib,
        "wall_s": round(wall, 1),
        "turns_per_sec": round(n_turns / wall, 1),
        "n_clusters": res.metrics["n_clusters"],
        "verified_edges": res.metrics["verified_edges"],
        "cluster_path": res.metrics["cluster_path"],
        "recall_vs_truth": round(recall, 6),
        "driver_max_rss_gb": round(rss_after / (1 << 20), 2),
        "driver_rss_growth_gb": round((rss_after - rss_before) / (1 << 20), 2),
        "num_cpus": int(os.environ.get("RAY_GRAFT_CPUS", "32")),
    }
    print(json.dumps(out))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
