"""Shape bucketing: pad leading dims to powers of two so jitted passes
compile once per bucket instead of once per input length."""

from __future__ import annotations

import numpy as np


def next_bucket(n: int, minimum: int = 16) -> int:
    """Smallest power of two >= max(n, minimum)."""
    b = minimum
    while b < n:
        b <<= 1
    return b


def pad_rows(arr: np.ndarray, target_rows: int) -> np.ndarray:
    """Zero-pad axis 0 of ``arr`` to ``target_rows``."""
    if arr.shape[0] == target_rows:
        return arr
    pad = [(0, target_rows - arr.shape[0])] + [(0, 0)] * (arr.ndim - 1)
    return np.pad(arr, pad)
