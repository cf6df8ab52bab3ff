"""Welch PSD + canonical EEG band powers, batched.

Parity targets: mental fatigue/basic_plot.py:93-132 and ratio_plot.py:105-131 —
per-epoch/channel Welch (1 s windows, 50% overlap), epoch mean ± SEM, trapezoid
band integration over δ/θ/α/β/γ. The reference's N×C Python loops collapse into
one batched `welch_psd` call.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from eegsynth.ops.spectral import trapezoid, welch_psd

BANDS = {
    "Delta": (1.0, 4.0),
    "Theta": (4.0, 8.0),
    "Alpha": (8.0, 13.0),
    "Beta": (13.0, 30.0),
    "Gamma": (30.0, 45.0),
}

REGION_ORDER = {
    "Frontal": ["AF3", "AF4", "F3", "F4", "FC5", "FC6", "F7", "F8"],
    "Temporal": ["T7", "T8"],
    "Parietal": ["P7", "P8"],
    "Occipital": ["O1", "O2"],
}

FRONTAL_SET = {"AF3", "AF4", "F3", "F4"}
PARIETAL_OCC_SET = {"P7", "P8", "O1", "O2"}


def compute_psd_per_channel(X: np.ndarray, fs: float, nperseg: int | None = None,
                            noverlap: int | None = None):
    """(N, T, C) → (f (F,), psd_mean (C, F), psd_sem (C, F)).

    One batched Welch over all epochs × channels (basic_plot.py:93-124 parity:
    1 s windows / 50% overlap by default, epoch mean, ddof=1 SEM).
    """
    N, T, C = X.shape
    nperseg = int(fs) if nperseg is None else nperseg
    noverlap = int(nperseg // 2) if noverlap is None else noverlap
    f, psd = welch_psd(jnp.asarray(X, dtype=jnp.float64), fs=fs, nperseg=nperseg,
                       noverlap=noverlap, axis=1)       # (N, F, C)
    psd = np.asarray(psd).transpose(0, 2, 1)            # (N, C, F)
    psd_mean = psd.mean(axis=0)
    psd_sem = psd.std(axis=0, ddof=1) / np.sqrt(max(1, N))
    return np.asarray(f), psd_mean, psd_sem


def bandpower_from_psd(f: np.ndarray, psd: np.ndarray, lo: float, hi: float):
    """Trapezoid band integral; psd (..., F) → (...,)."""
    idx = (f >= lo) & (f <= hi)
    if not np.any(idx):
        return np.zeros(psd.shape[:-1])
    return np.asarray(trapezoid(jnp.asarray(psd[..., idx]), jnp.asarray(f[idx])))


def band_powers(f: np.ndarray, psd: np.ndarray) -> dict:
    """dict band → (...,) trapezoid power (ratio_plot.py:131-135)."""
    return {name: bandpower_from_psd(f, psd, lo, hi)
            for name, (lo, hi) in BANDS.items()}


def order_channels_grouped(ch_names: list[str]):
    """Region-grouped channel ordering for bar plots (ratio_plot.py:137-168)."""
    present = set(ch_names)
    ordered_names, ordered_indices, boundaries = [], [], []
    cursor = 0
    for region, group in REGION_ORDER.items():
        group_present = [ch for ch in group if ch in present]
        if group_present:
            start = cursor
            for ch in group_present:
                ordered_names.append(ch)
                ordered_indices.append(ch_names.index(ch))
                cursor += 1
            boundaries.append((region, start, cursor))
    for i, ch in enumerate(ch_names):
        if ch not in ordered_names:
            boundaries.append(("Other", len(ordered_names), len(ordered_names) + 1))
            ordered_names.append(ch)
            ordered_indices.append(i)
    return ordered_names, ordered_indices, boundaries
