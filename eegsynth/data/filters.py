"""EEG filter design + line-frequency detection (host-side design, device apply).

Reference semantics: 4th-order Butterworth band-pass 1-45 Hz and IIR notch (Q=30)
designed per-file at the estimated sampling rate, applied zero-phase with filtfilt,
notch first (timeGAN/pre-processing.py:93-99,173-179). Coefficient design stays on
the host via scipy (a handful of scalars); application runs through
``eegsynth.ops.filtering.filtfilt`` which compiles to a fused XLA scan.
"""

from __future__ import annotations

import numpy as np

from eegsynth.ops.filtering import filtfilt
from eegsynth.ops.spectral import welch_psd, trapezoid


def design_filters(fs: float, low_cut: float = 1.0, high_cut: float = 45.0,
                   notch_hz: float = 60.0, notch_q: float = 30.0):
    """Butterworth band-pass + iirnotch coefficient pairs (pre-processing.py:93-99)."""
    from scipy.signal import butter, iirnotch
    nyq = 0.5 * fs
    lo = max(0.001, low_cut / nyq)
    hi = min(0.999, high_cut / nyq)
    b_bp, a_bp = butter(4, [lo, hi], btype="band")
    b_n, a_n = iirnotch(notch_hz / nyq, notch_q)
    return (b_bp, a_bp), (b_n, a_n)


def detect_line_freq(x: np.ndarray, fs: float) -> float:
    """50 vs 60 Hz mains detection from the first 20 s of one channel.

    Welch PSD with 4 s segments / 2 s overlap, trapezoid band power 49-51 vs
    59-61 Hz (pre-processing.py:84-91). Returns 60.0 if the clip is too short.
    """
    n = min(len(x), int(fs * 20))
    if n < int(fs * 4):
        return 60.0
    freqs, psd = welch_psd(np.asarray(x[:n], dtype=np.float64), fs=fs,
                           nperseg=int(fs * 4), noverlap=int(fs * 2))
    freqs = np.asarray(freqs)
    psd = np.asarray(psd)

    def band_power(lo, hi):
        m = (freqs >= lo) & (freqs <= hi)
        if not np.any(m):
            return 0.0
        return float(trapezoid(psd[m], freqs[m]))

    return 50.0 if band_power(49, 51) > band_power(59, 61) else 60.0


def notch_then_bandpass(x, fs: float, low_cut: float = 1.0, high_cut: float = 45.0,
                        notch_hz: float | None = None, notch_q: float = 30.0):
    """Apply the reference's filtering stage: notch first, then band-pass, both
    zero-phase (pre-processing.py:173-179). ``x``: (T, C) array-like."""
    x = np.asarray(x)
    if notch_hz is None:
        notch_hz = detect_line_freq(x[:, 0], fs)
    (b_bp, a_bp), (b_n, a_n) = design_filters(fs, low_cut, high_cut, notch_hz, notch_q)
    try:
        xn = filtfilt(b_n, a_n, x, axis=0)
    except ValueError:
        xn = x  # too short for notch padding — reference falls back to unfiltered
    return filtfilt(b_bp, a_bp, xn, axis=0)


def estimate_fs(time_values: np.ndarray, fallback_fs: float = 128.0) -> float:
    """Sampling-rate estimate from a time/counter column (pre-processing.py:52-64).

    Median of positive diffs below the 99th percentile; seconds vs milliseconds
    heuristic; fallback when degenerate.
    """
    s = np.asarray(time_values, dtype=np.float64)
    s = s[np.isfinite(s)]
    if len(s) < 6:
        return fallback_fs
    diffs = np.diff(s)
    diffs = diffs[(diffs > 0) & (diffs < np.nanpercentile(diffs, 99))]
    if len(diffs) == 0:
        return fallback_fs
    med = float(np.median(diffs))
    if med > 1.0 or (0.001 <= med <= 0.2):
        fs = 1.0 / med
    else:
        fs = 1000.0 / med
    if not np.isfinite(fs) or fs < 10:
        return fallback_fs
    return fs
