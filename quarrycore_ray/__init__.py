"""quarrycore_ray — a Ray-Data-native data-processing / dedup engine.

A from-scratch reimplementation of the data-processing capabilities of
the reference engine (shua-ie/QuarryCore), re-expressed as
`ray.data.Dataset` pipelines: zero-copy Arrow `map_batches` transforms,
actor pools for stateful stages, and groupby shuffles in place of the
reference's shared mutable indexes (SQLite/Redis/FAISS).

Core surface:
- `quarrycore_ray.pipelines.dedup` — the flagship multi-level transcript
  dedup pipeline (canonicalize -> exact -> MinHash/LSH -> verify ->
  cluster -> substring).
- `quarrycore_ray.pipelines.documents` — document-table operators
  (dedup variants, text analysis, similarity search) used by the
  driver's correctness harness.
- `quarrycore_ray.oracle` — in-process sequential reference oracle.
"""

from .config import DedupConfig, DEFAULT_CONFIG

__all__ = ["DedupConfig", "DEFAULT_CONFIG"]
__version__ = "0.1.0"
