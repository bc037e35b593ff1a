"""Dead-letter side output for failing rows.

Reference: failed documents go to a SQLite `DeadLetterQueue` with error
metadata (`/root/reference/src/quarrycore/recovery/dead_letter.py`,
enqueue at `pipeline.py:859-877`). The dataflow analog: a fallible
per-row transform is wrapped so failures become *tagged rows* instead
of task crashes; the stream then forks into a clean output and a
dead-letter table (written as Parquet, queryable like any other).

The wrapped function is applied per row inside the batch (a fallible
UDF is row-granular by nature) but the mechanics — batch in, two typed
Arrow outputs — stay columnar.
"""

from __future__ import annotations

from typing import Callable

import pyarrow as pa

import ray.data

ERROR_COL = "_error"


class FallibleRowStage:
    """map_batches wrapper: fn(row_value) per row of `input_col`; failures
    captured into `_error` instead of raising (fail-open, like the
    reference's dedup error path hybrid_dedup.py:177-182)."""

    def __init__(
        self,
        fn: Callable,
        input_col: str,
        output_col: str,
        output_type: "pa.DataType | None" = None,
    ):
        self.fn = fn
        self.input_col = input_col
        self.output_col = output_col
        # An all-failure batch would otherwise infer a null-typed column
        # and break schema unification against successful batches; the
        # type is either given explicitly or inferred once from the
        # first successful value and cached for the actor's lifetime.
        self.output_type = output_type

    def __call__(self, batch: pa.Table) -> pa.Table:
        out: list = []
        errs: list[str | None] = []
        for v in batch[self.input_col].to_pylist():
            try:
                out.append(self.fn(v))
                errs.append(None)
            except Exception as e:  # noqa: BLE001 — the whole point
                out.append(None)
                errs.append(f"{type(e).__name__}: {e}")
        if self.output_type is None and any(v is not None for v in out):
            self.output_type = pa.array(
                [v for v in out if v is not None][:1]
            ).type
        batch = batch.append_column(
            self.output_col, pa.array(out, type=self.output_type)
        )
        return batch.append_column(ERROR_COL, pa.array(errs, pa.string()))


def split_dead_letter(
    ds: "ray.data.Dataset",
) -> tuple["ray.data.Dataset", "ray.data.Dataset"]:
    """(clean rows without _error, dead rows with _error) from a tagged ds."""
    import pyarrow.compute as pc

    tagged = ds.materialize()  # evaluate once, fork twice
    clean = tagged.map_batches(
        lambda b: b.filter(pc.is_null(b[ERROR_COL])).drop_columns([ERROR_COL]),
        batch_format="pyarrow",
    )
    dead = tagged.map_batches(
        lambda b: b.filter(pc.is_valid(b[ERROR_COL])), batch_format="pyarrow"
    )
    return clean, dead
