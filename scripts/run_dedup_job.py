"""Cluster entry point for the flagship dedup job — the script you hand
to `ray job submit` on a real multi-node cluster (the north rule's
launch mode), and run directly for local testing:

    # multi-node (head node address from the cluster; working_dir ships
    # the package):
    ray job submit --address http://<head>:8265 \
        --working-dir . -- python scripts/run_dedup_job.py \
        --input s3://bucket/transcripts --output s3://bucket/dedup_out

    # local:
    python scripts/run_dedup_job.py --input /root/testdata/sf0.001 \
        --output /tmp/dedup_out

Inside a `ray job submit` runtime the cluster is already attached, so
`ray.init(address="auto")` is a no-op connect; standalone it falls back
to a local session. The job itself (pipelines/job.run_dedup_job) is
checkpoint-resumable: re-submitting with the same --output skips
completed stages via the atomic stage manifests, which is how a killed
cluster run is resumed.

Reference analog: the reference's pipeline CLI + asyncio orchestrator
(`/root/reference/src/quarrycore/cli.py`, `pipeline.py`) — re-expressed
as a Ray Job over Dataset stages instead of an in-process task graph.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--input", required=True,
                    help="Parquet transcript table/dir (conv_id, turn_idx, role, text, ...)")
    ap.add_argument("--output", required=True,
                    help="output root: clusters/ deduped/ metrics/ + checkpoints")
    ap.add_argument("--threshold", type=float, default=None,
                    help="override MinHash verification threshold")
    ap.add_argument("--no-lineage", action="store_true",
                    help="disable per-partition lineage counters")
    ap.add_argument("--address", default=None,
                    help="Ray address (default: auto inside a job, local otherwise)")
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        addr = args.address
        if addr is None:
            # inside `ray job submit` the runtime sets RAY_ADDRESS; bare
            # invocation starts a local session
            addr = os.environ.get("RAY_ADDRESS", "local")
        ray.init(address=addr, include_dashboard=False, ignore_reinit_error=True)

    from quarrycore_ray.config import DedupConfig
    from quarrycore_ray.pipelines.job import run_dedup_job

    cfg = DedupConfig()
    if args.threshold is not None:
        cfg.threshold = args.threshold

    summary = run_dedup_job(
        args.input, args.output, config=cfg, lineage=not args.no_lineage
    )
    print(json.dumps(summary, default=str))
    ray.shutdown()


if __name__ == "__main__":
    main()
