"""Statistical similarity metrics — parity with timeGAN/evaluation.py:117-135.

All three statistics run as batched jnp on the accelerator (one Welch over the
whole corpus, FFT-based lag correlations, one einsum corrcoef) instead of the
reference's scipy + Python-loop formulation; outputs match to float tolerance
(golden-file test vs the committed reference eval CSVs).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from eegsynth.ops.acf import mean_acf_per_channel
from eegsynth.ops.spectral import welch_psd
from eegsynth.ops.stats import channel_corrcoef


def psd_difference(real, fake, fs: float = 128.0, nperseg: int = 256) -> float:
    """mean |Δ mean-PSD| — Welch along time, epoch-mean (evaluation.py:119-121)."""
    _, psd_r = welch_psd(jnp.asarray(real), fs=fs, nperseg=nperseg, axis=1)
    _, psd_f = welch_psd(jnp.asarray(fake), fs=fs, nperseg=nperseg, axis=1)
    return float(jnp.mean(jnp.abs(jnp.mean(psd_r, axis=0) - jnp.mean(psd_f, axis=0))))


def acf_difference(real, fake, fs: float = 128.0) -> float:
    """mean |Δ per-channel mean lag-1..0.75fs autocorr| (evaluation.py:122-128)."""
    maxlag = int(0.75 * fs)
    acf_r = mean_acf_per_channel(jnp.asarray(real), maxlag)
    acf_f = mean_acf_per_channel(jnp.asarray(fake), maxlag)
    return float(jnp.mean(jnp.abs(acf_r - acf_f)))


def corr_difference(real, fake) -> float:
    """mean |Δ inter-channel Pearson corr| — the reference's "coherence" proxy
    (evaluation.py:130-134)."""
    corr_r = channel_corrcoef(jnp.asarray(real))
    corr_f = channel_corrcoef(jnp.asarray(fake))
    return float(jnp.mean(jnp.abs(corr_r - corr_f)))


def statistical_similarity(real: np.ndarray, fake: np.ndarray, fs: float = 128.0):
    """(psd_diff, acf_diff, coh_diff) for (N, T, C) real/fake corpora."""
    return (psd_difference(real, fake, fs),
            acf_difference(real, fake, fs),
            corr_difference(real, fake))
