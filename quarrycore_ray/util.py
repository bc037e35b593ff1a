"""Small runtime utilities shared by scripts and entry points."""

from __future__ import annotations

import logging
import re

#: matches ONLY the benign variant of Ray's schema-divergence warning:
#: a zero-row bundle whose schema the framework stripped ("new schema: .").
#: Ray 2.49's map operators skip the UDF entirely for zero-row input
#: blocks and emit a schemaless empty bundle, so even stages that
#: return correctly TYPED empty tables trigger the message — it is
#: framework noise, not a schema bug in the pipeline. Real divergences
#: (a non-empty "new schema:") are left alone.
_EMPTY_BUNDLE_RE = re.compile(
    r"RefBundle with a different schema.*new schema: \. This", re.DOTALL
)


class _EmptyBundleFilter(logging.Filter):
    def filter(self, record: logging.LogRecord) -> bool:  # True = keep
        try:
            msg = record.getMessage()
        except Exception:  # pragma: no cover - defensive
            return True
        return not _EMPTY_BUNDLE_RE.search(msg)


def silence_empty_bundle_warnings() -> None:
    """Install a log filter dropping Ray's schema-divergence warning for
    ZERO-ROW schemaless bundles only (see `_EMPTY_BUNDLE_RE`). Called by
    the CLI scripts (`bench.py`, `scripts/recall_check.py`); the library
    itself never touches logging config.

    The filter goes on the EMITTING module logger (filters on ancestor
    loggers don't apply to propagated records) and, belt-and-braces, on
    any handlers already attached to the ``ray.data`` ancestor."""
    flt = _EmptyBundleFilter()
    logging.getLogger(
        "ray.data._internal.execution.streaming_executor_state"
    ).addFilter(flt)
    for h in logging.getLogger("ray.data").handlers:
        h.addFilter(flt)


def worker_lib_preload_hook():
    """Return a ``worker_process_setup_hook`` that imports the heavy
    batch-kernel libraries ONCE, serially, at worker startup:

        ray.init(..., runtime_env={
            "worker_process_setup_hook": worker_lib_preload_hook()})

    Observed under 32-way load (10x incremental smoke, 2026-08-20): a
    worker's FIRST ``import polars`` racing other in-process activity
    can surface a partially-initialized module ("module 'polars' has no
    attribute 'Series'" / "'polars._reexport' has no attribute
    'DataTypeExpr'") inside a map UDF, aborting the dataset. Importing
    in the setup hook — before any task runs — removes the
    first-import race from the hot path entirely.

    This is a FACTORY returning a nested closure on purpose: cloudpickle
    ships a closure BY VALUE, while a module-level function (or its
    dotted-path string) is resolved by import on the worker — which
    fails, because the setup hook runs before the driver's sys.path
    reaches the worker process.
    """

    def _preload() -> None:
        import numpy  # noqa: F401
        import pandas  # noqa: F401
        import polars  # noqa: F401
        import pyarrow  # noqa: F401
        import pyarrow.compute  # noqa: F401

    return _preload
