"""Filter parity vs scipy (SURVEY.md §4 unit tier: impulse/frequency response)."""

import numpy as np
import pytest
import scipy.signal as sig

from eegsynth.data.filters import design_filters, detect_line_freq, estimate_fs
from eegsynth.ops.filtering import filtfilt, lfilter, lfilter_zi


def test_lfilter_zi_matches_scipy():
    b, a = sig.butter(4, [0.0156, 0.7], btype="band")
    np.testing.assert_allclose(lfilter_zi(b, a), sig.lfilter_zi(b, a), rtol=1e-9)
    b, a = sig.iirnotch(60 / 64.0, 30.0)
    np.testing.assert_allclose(lfilter_zi(b, a), sig.lfilter_zi(b, a), rtol=1e-9)


def test_lfilter_matches_scipy(rng):
    b, a = sig.butter(3, 0.2)
    x = rng.standard_normal((500, 4))
    ours = np.asarray(lfilter(b, a, x.astype(np.float64), axis=0))
    ref = sig.lfilter(b, a, x, axis=0)
    np.testing.assert_allclose(ours, ref, atol=1e-8)


@pytest.mark.parametrize("design", ["bandpass", "notch"])
def test_filtfilt_matches_scipy(rng, design):
    fs = 128.0
    (b_bp, a_bp), (b_n, a_n) = design_filters(fs, 1.0, 45.0, 60.0, 30.0)
    b, a = (b_bp, a_bp) if design == "bandpass" else (b_n, a_n)
    x = np.cumsum(rng.standard_normal((2000, 14)), axis=0)  # random-walk EEG-ish
    ours = np.asarray(filtfilt(b, a, x.astype(np.float64), axis=0))
    ref = sig.filtfilt(b, a, x, axis=0)
    scale = np.abs(ref).max()
    np.testing.assert_allclose(ours, ref, atol=1e-6 * scale)


def test_filtfilt_float32_reasonable(rng):
    """The on-device float32 path stays close to the float64 oracle."""
    fs = 128.0
    (b, a), _ = design_filters(fs)
    x = rng.standard_normal((768, 14))
    ours32 = np.asarray(filtfilt(b, a, x.astype(np.float32), axis=0))
    ref = sig.filtfilt(b, a, x.astype(np.float64), axis=0)
    assert np.abs(ours32 - ref).max() < 2e-2 * np.abs(ref).max()


def test_detect_line_freq():
    fs = 128.0
    t = np.arange(int(fs * 25)) / fs
    x50 = np.sin(2 * np.pi * 50 * t) + 0.1 * np.random.RandomState(0).randn(len(t))
    x60 = np.sin(2 * np.pi * 60 * t) + 0.1 * np.random.RandomState(1).randn(len(t))
    assert detect_line_freq(x50, fs) == 50.0
    assert detect_line_freq(x60, fs) == 60.0
    assert detect_line_freq(x50[: int(fs * 2)], fs) == 60.0  # too short → default


def test_estimate_fs():
    jitter = 1e-5 * np.random.RandomState(0).randn(1000)
    t = np.arange(1000) / 128.0 + jitter  # jitter: uniform diffs all fail the <p99 cut
    assert abs(estimate_fs(t) - 128.0) < 0.5
    t_ms = np.arange(1000) * 0.5 + jitter  # ms diffs in (0.2, 1.0) → ms branch
    assert abs(estimate_fs(t_ms) - 2000.0) < 1.0
    # ms diffs > 1.0 hit the seconds branch and fall back (reference heuristic)
    assert estimate_fs(np.arange(1000) * (1000.0 / 256.0)) == 128.0
    assert estimate_fs(np.array([1.0, 2.0])) == 128.0  # degenerate → fallback
