"""Incremental-tier spill-scale smoke: signature-index build + new-batch
probe at ~10x the bench corpus under a deliberately small object store.

The incremental path (`pipelines/incremental.py`) is the 100 TB
OPERATIONAL mode — daily batches probed against the historical
signature index — and until round 5 it had only sf-scale evidence
(VERDICT r4 'next round' #5). This smoke mirrors SCALE_SMOKE_r04 for
that tier:

- split the 10x synth corpus 80/20 by conv serial (% 5): the 80% side
  is "history", the 20% side is "today's batch";
- phase 1: assemble history and persist its MinHash+SimHash signature
  index to Parquet (`write_signature_index`) — the artifact a real
  deployment carries forward between days;
- phase 2: assemble the new batch and probe it against the index
  (`incremental_near_dup`, partitioned-confirmation path), consuming
  `matches` by writing Parquet — never a driver collect;
- verify OPERATIONAL recall at the document level: a new conversation
  must be flagged (>= 1 verified historical match) iff its planted
  truth cluster has >= 1 member on the history side. (Pairwise recall
  is not the metric here: the historical-side bucket cap deliberately
  drops redundant pairs inside the giant boilerplate group — the
  decision a production run acts on is dup-vs-new per document.)

Usage: python scripts/incremental_smoke.py [n_convs] [object_store_gb]
Defaults: 1_000_000 convs (10x bench), 3 GiB store. Emits ONE JSON
line; artifact convention: SCALE_SMOKE_INCR_r{N}.json.
"""

from __future__ import annotations

import json
import os
import re
import resource
import shutil
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
    import pyarrow as pa
    import pyarrow.compute as pc

    import ray.data as rd

    from quarrycore_ray.pipelines.incremental import (
        incremental_near_dup,
        write_signature_index,
    )
    from quarrycore_ray.stages.canonical import assemble_conversations
    from quarrycore_ray.synth import write_corpus

    root = write_corpus(
        os.environ.get("GRAFT_BENCH_CORPUS_DIR", "/tmp/qc_bench_corpus"),
        n_convs,
        seed=42,
        boilerplate_group=n_convs // 50,
    )
    tdir = os.path.join(root, "transcripts")
    n_turns = rd.read_parquet(tdir).count()

    def _side(new_side: bool):
        # deterministic 80/20 split on the conv serial ('conv-%06d' —
        # zero-padded to six digits but WIDER once serials pass 1e6, so
        # slice to the end of the string, not a fixed width)
        def _f(batch: pa.Table) -> pa.Table:
            serial = pc.cast(
                pc.utf8_slice_codeunits(batch["conv_id"], 5, 32), pa.int64()
            )
            is_new = pc.equal(
                pc.subtract(serial, pc.multiply(pc.divide(serial, 5), 5)),
                pa.scalar(4, pa.int64()),
            )
            return batch.filter(is_new if new_side else pc.invert(is_new))

        return _f

    rss_before = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss  # KiB

    index_path = f"/tmp/incr_index_n{n_convs}"
    shutil.rmtree(index_path, ignore_errors=True)
    t0 = time.perf_counter()
    hist = assemble_conversations(
        rd.read_parquet(tdir).map_batches(_side(False), batch_format="pyarrow")
    )
    write_signature_index(hist, index_path)
    wall_index = time.perf_counter() - t0
    n_hist = rd.read_parquet(index_path).count()

    t1 = time.perf_counter()
    new_batch = assemble_conversations(
        rd.read_parquet(tdir).map_batches(_side(True), batch_format="pyarrow")
    )
    res = incremental_near_dup(new_batch, index_path)
    out_dir = f"/tmp/incr_matches_n{n_convs}"
    shutil.rmtree(out_dir, ignore_errors=True)
    res.matches.write_parquet(out_dir)
    wall_probe = time.perf_counter() - t1
    n_new_only = res.new_only.count()

    rss_after = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss

    # spill evidence from the raylet's periodic log lines (same source
    # as scripts/scale_smoke.py)
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

    # document-level operational recall/precision vs the planted truth
    truth = pd.read_parquet(os.path.join(root, "truth_clusters.parquet"))
    serial = truth["conv_id"].str[5:].astype(int)
    truth = truth.assign(_new=(serial % 5 == 4))
    hist_clusters = set(truth.loc[~truth["_new"], "truth_cluster_id"])
    new_rows = truth[truth["_new"]]
    true_dup = set(
        new_rows.loc[
            new_rows["truth_cluster_id"].isin(hist_clusters), "conv_id"
        ]
    )
    # a zero-match probe writes NO parquet files (Ray skips empty
    # blocks) — treat the fileless dir as the empty flagged set instead
    # of crashing the multi-minute run at the metric step
    has_matches = os.path.isdir(out_dir) and any(
        f.endswith(".parquet") for f in os.listdir(out_dir)
    )
    flagged = (
        set(
            rd.read_parquet(out_dir)
            .select_columns(["new_id"])
            .to_pandas()["new_id"]
            .unique()
        )
        if has_matches
        else set()
    )
    n_new = len(new_rows)
    recall = (
        len(true_dup & flagged) / len(true_dup) if true_dup else None
    )
    precision = (
        len(true_dup & flagged) / len(flagged) if flagged else None
    )

    out = {
        "metric": "incremental_smoke",
        "n_convs": n_convs,
        "n_turns": int(n_turns),
        "object_store_gb": store_gb,
        "spilled_mib": spilled_mib,
        "hist_index_rows": int(n_hist),
        "new_batch_docs": int(n_new),
        "wall_index_s": round(wall_index, 1),
        "wall_probe_s": round(wall_probe, 1),
        "index_docs_per_sec": round(n_hist / wall_index, 1),
        "probe_docs_per_sec": round(n_new / wall_probe, 1),
        "matches_rows": (
            int(rd.read_parquet(out_dir).count()) if has_matches else 0
        ),
        "new_only_docs": int(n_new_only),
        "true_dup_docs": len(true_dup),
        "doc_recall_vs_truth": round(recall, 6) if recall is not None else None,
        "doc_precision_vs_truth": (
            round(precision, 6) if precision is not None else None
        ),
        "driver_max_rss_gb": round(rss_after / (1 << 20), 2),
        "driver_rss_growth_gb": round((rss_after - rss_before) / (1 << 20), 2),
        "num_cpus": int(os.environ.get("RAY_GRAFT_CPUS", "32")),
    }
    print(json.dumps(out))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
