"""Tiered-storage retention + backup (the warm -> cold lifecycle).

Reference semantics: `RetentionConfig.archive_after_days` moves warm
Parquet data to `cold_storage_path`, and `BackupConfig.interval_hours`
snapshots the hot metadata store
(`/root/reference/src/quarrycore/config/config.py:106-148`,
`storage/storage_manager.py:274-276`, `storage/sqlite_manager.py:142-150`).

Dataflow re-expression: warm storage here is a directory of partitioned
Parquet outputs (one subdirectory per partition, the resumable-output
layout every pipeline writes). Retention is a deterministic pass:

- `archive_partitions`: partitions whose manifest timestamp (or mtime)
  is older than the cutoff move to cold storage ATOMICALLY (copy to
  `<name>.tmp` inside cold, rename, then remove the warm copy) and are
  appended to `_archive_manifest.json` — a crash between copy and
  remove leaves both copies and the next run reconciles, never loses
  data (same tmp+rename discipline as state/checkpoint.py).
- `backup_store`: timestamped snapshot of a hot-store file (the SQLite
  analog — any single-file state such as a checkpoint manifest or a
  metrics db), pruning to the newest `keep` snapshots.

`now` is always an explicit parameter: retention decisions are
deterministic and testable, never wall-clock-implicit.
"""

from __future__ import annotations

import json
import os
import shutil
import time
from dataclasses import dataclass

_MANIFEST = "_archive_manifest.json"


@dataclass(frozen=True)
class RetentionConfig:
    """Mirror of the reference RetentionConfig (config.py:106-122)."""

    archive_after_days: float | None = None
    cold_storage_path: str | None = None
    backup_keep: int = 3


def _partition_age_s(path: str, now: float) -> float:
    """Age of a partition dir from its manifest `written_at` when
    present, else the directory mtime. Understands both manifest
    dialects: retention's own `_manifest.json` (epoch float, written by
    `stamp_partition`) and the checkpoint manager's `_MANIFEST.json`
    (ISO local time, state/checkpoint.py) — so a job's stage
    directories are retention-ready with no extra stamping."""
    for name in ("_manifest.json", "_MANIFEST.json"):
        mf = os.path.join(path, name)
        if not os.path.exists(mf):
            continue
        try:
            with open(mf) as f:
                raw = json.load(f)["written_at"]
            if isinstance(raw, (int, float)):
                return now - float(raw)
            return now - time.mktime(
                time.strptime(str(raw), "%Y-%m-%dT%H:%M:%S")
            )
        except Exception:
            continue
    return now - os.path.getmtime(path)


def load_archive_manifest(cold_dir: str) -> list[dict]:
    mf = os.path.join(cold_dir, _MANIFEST)
    if os.path.exists(mf):
        with open(mf) as f:
            return json.load(f)
    return []


def archive_partitions(
    warm_dir: str,
    cold_dir: str,
    archive_after_days: float,
    now: float | None = None,
) -> list[str]:
    """Move warm partitions older than the cutoff to cold storage.

    Returns the archived partition names. Idempotent + crash-safe:
    - copy to `cold/<name>.tmp`, rename to `cold/<name>`, THEN remove
      the warm copy (a crash can duplicate, never lose);
    - a partition already present in cold is reconciled (warm copy
      removed without re-copying);
    - every archived partition is appended to the cold manifest with
      its archive timestamp.
    """
    now = time.time() if now is None else now
    cutoff_s = archive_after_days * 86400.0
    os.makedirs(cold_dir, exist_ok=True)
    manifest = load_archive_manifest(cold_dir)
    done = {m["partition"] for m in manifest}
    archived: list[str] = []
    for name in sorted(os.listdir(warm_dir)):
        src = os.path.join(warm_dir, name)
        if not os.path.isdir(src) or name.endswith(".tmp"):
            continue
        if _partition_age_s(src, now) < cutoff_s:
            continue
        dst = os.path.join(cold_dir, name)
        if not os.path.exists(dst):
            tmp = dst + ".tmp"
            shutil.rmtree(tmp, ignore_errors=True)
            shutil.copytree(src, tmp)
            os.rename(tmp, dst)
        shutil.rmtree(src)
        archived.append(name)
        if name not in done:
            manifest.append({"partition": name, "archived_at": now})
    with open(os.path.join(cold_dir, _MANIFEST), "w") as f:
        json.dump(manifest, f, indent=2)
    return archived


def backup_store(
    store_path: str, backup_dir: str, keep: int = 3, now: float | None = None
) -> str:
    """Snapshot a hot-store file into `backup_dir` (timestamped name),
    pruning to the newest `keep` snapshots. The copy goes through a
    `.tmp` + rename so a crash never leaves a partial snapshot that a
    restore could mistake for a complete one (reference online-backup
    semantics, sqlite_manager.py:142-150)."""
    now = time.time() if now is None else now
    os.makedirs(backup_dir, exist_ok=True)
    base = os.path.basename(store_path)
    snap = os.path.join(backup_dir, f"{base}.{int(now)}.bak")
    tmp = snap + ".tmp"
    shutil.copyfile(store_path, tmp)
    os.rename(tmp, snap)
    snaps = sorted(
        (p for p in os.listdir(backup_dir)
         if p.startswith(base + ".") and p.endswith(".bak")),
        key=lambda p: int(p.rsplit(".", 2)[-2]),
    )
    for old in snaps[:-keep]:
        os.remove(os.path.join(backup_dir, old))
    return snap


def stamp_partition(path: str, now: float | None = None) -> None:
    """Write the `_manifest.json` retention stamp for a partition dir
    (pipelines call this after a successful partition write)."""
    now = time.time() if now is None else now
    with open(os.path.join(path, "_manifest.json"), "w") as f:
        json.dump({"written_at": now}, f)


def read_tiered(
    warm_dir: str, cold_dir: str, columns: list[str] | None = None
):
    """One streaming `ray.data.Dataset` over BOTH tiers — archived data
    stays queryable, matching the reference's cold tier remaining part
    of the store (`storage_manager.py`: cold storage holds the same
    Parquet, only relocated). Warm wins a name collision (a partition
    caught mid-archive is read exactly once). Column projection is
    pushed into the read."""
    import ray.data as rd

    def _parts(root: str) -> dict[str, str]:
        if not os.path.isdir(root):
            return {}
        return {
            n: os.path.join(root, n)
            for n in os.listdir(root)
            if os.path.isdir(os.path.join(root, n))
            and not n.endswith(".tmp")
        }

    warm, cold = _parts(warm_dir), _parts(cold_dir)
    paths = sorted(
        list(warm.values())
        + [p for n, p in cold.items() if n not in warm]
    )
    if not paths:
        import pyarrow as pa

        return rd.from_arrow(pa.table({}))
    # retention stamps live next to the data files; exclude them from
    # the parquet scan by listing the part files per partition
    files = sorted(
        os.path.join(d, f)
        for d in paths
        for f in os.listdir(d)
        if f.endswith(".parquet")
    )
    return rd.read_parquet(files, columns=columns)


def compact_partition(
    partition_dir: str,
    min_fragments: int = 8,
    target_rows_per_file: int = 1_000_000,
) -> bool:
    """Rewrite a fragmented partition's many small part files into few
    large ones — the Parquet-tier VACUUM
    (`storage/sqlite_manager.py:158-174`, `storage_manager.py:266-272`:
    reclaim/compact a store in place without blocking readers of other
    partitions).

    Streams the fragments through ray.data (no driver
    materialization), writes to `<dir>.compact.tmp`, then swaps
    directories atomically; the retention stamp is preserved so
    compaction never resets a partition's archive age. Returns True
    when a rewrite happened — partitions under `min_fragments` files
    are left alone (compaction cost would exceed the read
    amplification it saves). One partition at a time: on a 100 TB
    store this is an embarrassingly parallel maintenance sweep with no
    shuffle and bounded temp space."""
    import ray.data as rd

    frags = [
        f for f in os.listdir(partition_dir) if f.endswith(".parquet")
    ]
    if len(frags) < min_fragments:
        return False
    stamp = None
    stamp_path = os.path.join(partition_dir, "_manifest.json")
    if os.path.exists(stamp_path):
        with open(stamp_path) as f:
            stamp = f.read()
    ds = rd.read_parquet(
        [os.path.join(partition_dir, f) for f in sorted(frags)]
    )
    tmp = partition_dir + ".compact.tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    ds.write_parquet(tmp, min_rows_per_file=target_rows_per_file)
    if stamp is not None:
        with open(os.path.join(tmp, "_manifest.json"), "w") as f:
            f.write(stamp)
    old = partition_dir + ".compact.old"
    shutil.rmtree(old, ignore_errors=True)
    os.rename(partition_dir, old)
    os.rename(tmp, partition_dir)
    shutil.rmtree(old)
    return True
