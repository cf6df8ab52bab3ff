"""Fixed-length epoching (windowing) of continuous recordings."""

from __future__ import annotations

import numpy as np


def epoch_fixed(arr: np.ndarray, samples_per_epoch: int, overlap: float = 0.0) -> np.ndarray:
    """Segment (T, C) into (N, samples_per_epoch, C) float32 windows.

    Fixed sample count across all files (prevents 768-vs-766 mismatches),
    non-overlapping by default, fractional ``overlap`` shrinks the hop
    (reference: timeGAN/pre-processing.py:101-113). A strided view replaces the
    reference's per-start Python stack.
    """
    win = int(samples_per_epoch)
    step = win if overlap <= 0 else int(win * (1 - overlap))
    if step <= 0:
        step = win
    T = arr.shape[0]
    n = (T - win) // step + 1 if T >= win else 0
    if n <= 0:
        return np.empty((0, win, arr.shape[1]), dtype=np.float32)
    starts = np.arange(n) * step
    idx = starts[:, None] + np.arange(win)[None, :]
    return np.ascontiguousarray(arr[idx]).astype(np.float32)
