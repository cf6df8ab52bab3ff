"""Fatigue / workload indices from band powers.

Parity: mental fatigue/ratio_plot.py:239-260 (TBR/TABR/ABR/θα + frontal-θ over
parietal-occipital-α workload) and t_test.py:72-91 (per-epoch per-channel
Welch TBR). The per-epoch TBR matrix is one batched Welch + two band integrals
instead of N·C scipy calls.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from eegsynth.analysis.bandpower import (
    BANDS, FRONTAL_SET, PARIETAL_OCC_SET, bandpower_from_psd,
)
from eegsynth.ops.spectral import welch_psd

EPS = 1e-12


def fatigue_indices(bp: dict) -> dict:
    """Per-channel indices from a band→(C,) power dict (ratio_plot.py:239-247)."""
    T, A, B = bp["Theta"], bp["Alpha"], bp["Beta"]
    return {
        "TBR (Theta/Beta)": T / (B + EPS),
        "TABR ((Theta+Alpha)/Beta)": (T + A) / (B + EPS),
        "ABR (Alpha/Beta)": A / (B + EPS),
        "Theta/Alpha": T / (A + EPS),
    }


def _region_mean(values: np.ndarray, ch_names: list[str], wanted: set) -> float:
    idxs = [i for i, n in enumerate(ch_names) if n in wanted]
    if not idxs:
        return float(np.mean(values))  # reference falls back to global mean
    return float(np.mean(values[idxs]))


def workload_ratio(bp: dict, ch_names: list[str]) -> float:
    """Frontal-θ mean / parietal-occipital-α mean (ratio_plot.py:256-260)."""
    theta_f = _region_mean(bp["Theta"], ch_names, FRONTAL_SET)
    alpha_po = _region_mean(bp["Alpha"], ch_names, PARIETAL_OCC_SET)
    return theta_f / (alpha_po + EPS)


def global_indices(bp: dict) -> dict:
    """Channel-mean index summary (ratio_plot.py:264-276)."""
    T, A, B = np.mean(bp["Theta"]), np.mean(bp["Alpha"]), np.mean(bp["Beta"])
    return {
        "Global Theta/Alpha": float(T / (A + EPS)),
        "Global TBR": float(T / (B + EPS)),
        "Global TABR": float((T + A) / (B + EPS)),
        "Global ABR": float(A / (B + EPS)),
    }


def tbr_matrix(X: np.ndarray, fs: float, nperseg: int | None = None,
               noverlap: int | None = None) -> np.ndarray:
    """Per-(epoch, channel) Welch theta/beta ratio (t_test.py:82-91), batched.

    X: (N, T, C) → (N, C) float64.
    """
    nperseg = int(fs) if nperseg is None else nperseg
    noverlap = int(nperseg // 2) if noverlap is None else noverlap
    f, psd = welch_psd(jnp.asarray(X, dtype=jnp.float64), fs=fs, nperseg=nperseg,
                       noverlap=noverlap, axis=1)           # (N, F, C)
    f = np.asarray(f)
    psd = np.asarray(psd).transpose(0, 2, 1)                # (N, C, F)
    theta = bandpower_from_psd(f, psd, *BANDS["Theta"])
    beta = bandpower_from_psd(f, psd, *BANDS["Beta"])
    return theta / (beta + EPS)
