"""Bit-reproducible float rounding shared by engine and SQL oracles.

Library `round(x, n)` implementations legitimately disagree by one ulp
(pyarrow's round-to-multiple vs DuckDB's scaled nearbyint), which breaks
value-hash comparisons. Both our engine and the oracle SQL therefore
express decimal rounding as the identical IEEE sequence

    floor(x * scale + 0.5) / scale

so results are bitwise equal regardless of execution engine.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def floor_round(arr, ndigits: int = 6):
    """pyarrow: floor(x * 10^n + 0.5) / 10^n (elementwise, float64)."""
    scale = float(10**ndigits)
    scaled = pc.floor(pc.add(pc.multiply(pc.cast(arr, pa.float64()), pa.scalar(scale)), pa.scalar(0.5)))
    return pc.divide(scaled, pa.scalar(scale))


def floor_round_np(x: np.ndarray, ndigits: int = 6) -> np.ndarray:
    """numpy twin of `floor_round`."""
    scale = float(10**ndigits)
    return np.floor(np.asarray(x, dtype=np.float64) * scale + 0.5) / scale


def sql_round(expr: str, ndigits: int = 6) -> str:
    """DuckDB twin: the same floor-based rounding as a SQL fragment."""
    scale = 10**ndigits
    return f"floor(({expr}) * {scale} + 0.5) / {scale}.0"
