"""Log-PSD features for the CGAN eval family (CGAN/eval_cgan.py:110-121)."""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def psd_features(X: np.ndarray, n_bins: int = 64, eps: float = 1e-6) -> np.ndarray:
    """(N, C, T) → (N, C·n_bins) float32: rFFT power / (T/2), log, adaptive
    average-pool of the frequency axis to n_bins, NaN-safe.

    Runs on the CPU backend: the T=768 rFFT is mixed-radix, which compiles
    pathologically slowly through the remote TPU tunnel (CLAUDE.md), and
    pow-2 padding would change the features (reference parity,
    eval_cgan.py:110-121)."""
    import jax
    with jax.default_device(jax.devices("cpu")[0]):
        return _psd_features_impl(X, n_bins, eps)


def _psd_features_impl(X, n_bins, eps):
    N, C, T = X.shape
    F = jnp.fft.rfft(jnp.asarray(X, dtype=jnp.float32), axis=2)
    P = (F.real ** 2 + F.imag ** 2) / (T / 2.0 + 1e-8)
    P = jnp.log(P + eps)
    Fbins = P.shape[2]
    if n_bins < Fbins:
        pool = Fbins // n_bins
        P = P[:, :, :pool * n_bins].reshape(N, C, n_bins, pool).mean(-1)
    else:
        pad = n_bins - Fbins
        P = jnp.pad(P, ((0, 0), (0, 0), (0, max(0, pad))), mode="edge")[:, :, :n_bins]
    feats = np.asarray(P.reshape(N, C * n_bins))
    return np.nan_to_num(feats, nan=0.0, posinf=0.0, neginf=0.0).astype(np.float32)
