"""Helpers to keep Ray results bit-comparable with the DuckDB oracle."""

from __future__ import annotations

import numpy as np


def sql_round(x, ndigits: int):
    """ROUND() with half-away-from-zero ties, matching DuckDB/ANSI SQL.

    numpy's ``round`` is half-to-even; the two differ on exact decimal ties
    (e.g. 1/128 = 0.0078125 at 6 digits), which integer-derived ratios can
    hit. Used wherever a query column is also ROUND()ed in its oracle SQL.
    """
    arr = np.asarray(x, dtype=np.float64)
    factor = 10.0 ** ndigits
    return np.sign(arr) * np.floor(np.abs(arr) * factor + 0.5) / factor
