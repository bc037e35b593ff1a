"""Stage-boundary checkpointing with atomic manifests.

The reference checkpoints a URL worklist as atomic JSON
(`/root/reference/src/quarrycore/pipeline.py:990-1027`,
`utils/atomic.py`). A batch dataflow engine checkpoints *stage
products* instead: each named stage writes partitioned Parquet to a
temp dir, atomically renames it into place, then writes a small
manifest. A rerun (same root) skips every stage whose manifest is
present and valid — the "resumable from checkpoint" semantics of the
north rule. Outputs are many part files, so a downstream consumer can
also re-read per-partition.
"""

from __future__ import annotations

import json
import os
import shutil
import time
from typing import Callable

import ray.data

MANIFEST = "_MANIFEST.json"


class CheckpointManager:
    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)
        self.stages_run: list[str] = []
        self.stages_skipped: list[str] = []

    def _dir(self, name: str) -> str:
        return os.path.join(self.root, name)

    def is_complete(self, name: str) -> bool:
        path = os.path.join(self._dir(name), MANIFEST)
        if not os.path.exists(path):
            return False
        try:
            with open(path) as f:
                m = json.load(f)
            return m.get("complete", False)
        except (json.JSONDecodeError, OSError):
            return False

    def stage(
        self,
        name: str,
        fn: Callable[[], "ray.data.Dataset"],
        empty_schema: "object | None" = None,
    ) -> "ray.data.Dataset":
        """Run `fn` and persist its Dataset, or reload a completed stage.

        ``empty_schema`` (a ``pyarrow.Schema``): a ZERO-ROW stage writes
        no parquet files at all (Ray skips empty blocks), which would
        leave an unreadable checkpoint; when the caller knows the stage
        schema, an empty typed parquet file is written instead so the
        checkpoint — and every downstream resume — stays well-formed
        (e.g. a corpus with no verified near-dup edges).
        """
        import ray.data as rd

        final = self._dir(name)
        if self.is_complete(name):
            self.stages_skipped.append(name)
            return rd.read_parquet(os.path.join(final, "data"))
        tmp = final + ".tmp"
        shutil.rmtree(tmp, ignore_errors=True)
        shutil.rmtree(final, ignore_errors=True)
        t0 = time.perf_counter()
        ds = fn()
        os.makedirs(tmp, exist_ok=True)
        ds.write_parquet(os.path.join(tmp, "data"))
        data_tmp = os.path.join(tmp, "data")
        if not os.path.isdir(data_tmp) or not any(
            f.endswith(".parquet") for f in os.listdir(data_tmp)
        ):
            if empty_schema is None:
                raise ValueError(
                    f"stage '{name}' produced zero rows and no "
                    "empty_schema was provided — the checkpoint would "
                    "be unreadable on resume"
                )
            import pyarrow.parquet as _pq

            os.makedirs(data_tmp, exist_ok=True)
            _pq.write_table(
                empty_schema.empty_table(),
                os.path.join(data_tmp, "part-empty.parquet"),
            )
        os.rename(tmp, final)  # atomic on one filesystem
        out = rd.read_parquet(os.path.join(final, "data"))
        manifest = {
            "stage": name,
            "complete": True,
            "rows": out.count(),
            "wall_s": round(time.perf_counter() - t0, 3),
            "written_at": time.strftime("%Y-%m-%dT%H:%M:%S"),
        }
        with open(os.path.join(final, MANIFEST) + ".tmp", "w") as f:
            json.dump(manifest, f)
        os.rename(os.path.join(final, MANIFEST) + ".tmp", os.path.join(final, MANIFEST))
        self.stages_run.append(name)
        return out

    def invalidate(self, name: str) -> None:
        shutil.rmtree(self._dir(name), ignore_errors=True)
