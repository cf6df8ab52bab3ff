"""Vectorized autocorrelation statistics.

Replaces the reference's Python triple loop ``autocorr_seq`` (channels × sequences ×
lags, timeGAN/evaluation.py:63-70) and the per-lag loop ACF loss
(timeGAN/train_timegan.py:103-126) with batched jnp formulations — exact Pearson
lag correlations for all lags at once, no Python iteration in the compiled graph.
Two formulations coexist: fused direct slice products for small lag counts (the
training-loss regime — faster than the FFT on TPU, see ``acf_per_channel``) and
FFT cross-correlation + prefix sums (O(T log T) per series) for large ones.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("max_lag",))
def acf_per_channel(x: jax.Array, max_lag: int) -> jax.Array:
    """Globally z-normed lag correlations — the TimeGAN ACF-loss statistic.

    ``x``: (B, T, C). z-norm over (B, T) per channel (std normalized by N, torch
    ``.std`` uses N-1 — we match torch's unbiased std), then for each lag
    ``mean_{B,T-lag}(xz[:, :-lag] * xz[:, lag:])``. Matches
    timeGAN/train_timegan.py:110-122 (``acf_all``). Returns (max_lag, C).

    Two formulations, picked by lag count:

    - small ``max_lag`` (the training-loss regime, config 48 / CLI 64): direct
      static-slice lag products — L fused multiply-reduces over contiguous
      slices. On the TPU this is 2.4× faster per value+grad than the FFT
      (0.26 vs 0.61 ms at (26, 768, 14), L=48, interleaved A/B on v5e): the
      2T-point FFT is a non-power-of-2 custom call the MXU can't help with,
      while the slice products fuse into elementwise passes.
    - large ``max_lag``: one FFT autocorrelation, O(T log T) per series.
    """
    B, T, C = x.shape
    max_lag = max(1, min(max_lag, T - 1))
    xm = jnp.mean(x, axis=(0, 1), keepdims=True)
    xs = jnp.std(x, axis=(0, 1), ddof=1, keepdims=True) + 1e-8
    xz = (x - xm) / xs                                        # (B, T, C)

    if max_lag <= 96:
        cols = [jnp.sum(xz[:, :T - lag, :] * xz[:, lag:, :], axis=(0, 1))
                / (B * (T - lag)) for lag in range(1, max_lag + 1)]
        return jnp.stack(cols, axis=0)                        # (L, C)

    xzt = jnp.moveaxis(xz, 1, -1)                             # (B, C, T)
    spec = jnp.fft.rfft(xzt, n=2 * T, axis=-1)
    cross = jnp.fft.irfft(spec * jnp.conj(spec), n=2 * T, axis=-1)[..., :T]
    # cross[..., lag] = sum_t xz[t] * xz[t+lag]
    lags = jnp.arange(1, max_lag + 1)
    counts = (B * (T - lags)).astype(x.dtype)                 # (L,)
    corr = jnp.sum(cross[:, :, 1:max_lag + 1], axis=0) / counts[None, :]  # (C, L)
    return jnp.moveaxis(corr, 0, 1)                           # (L, C)


@partial(jax.jit, static_argnames=("max_lag",))
def pearson_lag_corrs(x: jax.Array, max_lag: int) -> jax.Array:
    """Pearson correlation of (x[:-lag], x[lag:]) for lags 1..max_lag, batched.

    ``x``: (..., T) → (..., max_lag). Exact equivalent of
    ``np.corrcoef(x[:-lag], x[lag:])[0,1]`` (timeGAN/evaluation.py:63-70),
    via FFT cross-correlation + cumulative sums.
    """
    T = x.shape[-1]
    L = min(max_lag, T - 1)
    xd = x.astype(jnp.promote_types(x.dtype, jnp.float32))
    # Pre-center each sequence: Pearson is shift-invariant, so this is exact —
    # and it removes the catastrophic f32 cancellation of E[x²]−m² when
    # mean ≫ std (measured: a (std 0.013, mean ~1) synthetic channel returned
    # −1.1e5 uncentered vs the f64 oracle's −0.243; centered matches).
    xd = xd - jnp.mean(xd, axis=-1, keepdims=True)

    spec = jnp.fft.rfft(xd, n=2 * T, axis=-1)
    cross = jnp.fft.irfft(spec * jnp.conj(spec), n=2 * T, axis=-1)[..., 1:L + 1]

    csum = jnp.cumsum(xd, axis=-1)
    csum2 = jnp.cumsum(xd * xd, axis=-1)
    total, total2 = csum[..., -1:], csum2[..., -1:]
    lags = jnp.arange(1, L + 1)
    n = (T - lags).astype(xd.dtype)                           # (L,)
    # Contiguous slices instead of gathers (slow-compiling on some backends):
    # head segment x[:T-lag] sums live at cumsum indices T-2 .. T-1-L (reversed);
    # tail segment x[lag:] sums are total - cumsum[0 .. L-1].
    sum_a = jnp.flip(csum[..., T - 1 - L: T - 1], axis=-1)
    sum_a2 = jnp.flip(csum2[..., T - 1 - L: T - 1], axis=-1)
    sum_b = total - csum[..., 0:L]
    sum_b2 = total2 - csum2[..., 0:L]

    ma, mb = sum_a / n, sum_b / n
    cov = cross / n - ma * mb
    var_a = sum_a2 / n - ma * ma
    var_b = sum_b2 / n - mb * mb
    den = jnp.sqrt(jnp.maximum(var_a, 0.0) * jnp.maximum(var_b, 0.0))
    return (cov / (den + 1e-12)).astype(x.dtype)


def _pearson_lag_corrs_np64(xt, max_lag: int):
    """Host float64 twin of :func:`pearson_lag_corrs` (same FFT + prefix-sum
    formulation, numpy). Float64 is REQUIRED for the eval statistic: a
    sequence whose per-lag head/tail SEGMENT is nearly constant relative to
    its mean (segment var/mean² ~1e-5, e.g. a GAN output flat over the tail)
    cancels catastrophically in the f32 ``E[x²]−m²`` form — measured |corr|
    up to 1e6 on a window whose f64 oracle value is −0.71 (round-5 pipeline,
    posture9_with_exo). Global pre-centering/standardization cannot fix it
    (the cancellation is in the per-segment moments); the reference computes
    this statistic with f64 ``np.corrcoef`` (evaluation.py:63-70), so f64 is
    also the parity semantics. Host cost is negligible at eval-corpus sizes
    (~1 s for the full 2,338-window global)."""
    import numpy as np

    xt = np.asarray(xt, np.float64)
    T = xt.shape[-1]
    L = min(max_lag, T - 1)
    xd = xt - xt.mean(axis=-1, keepdims=True)
    spec = np.fft.rfft(xd, n=2 * T, axis=-1)
    cross = np.fft.irfft(spec * np.conj(spec), n=2 * T, axis=-1)[..., 1:L + 1]
    csum = np.cumsum(xd, axis=-1)
    csum2 = np.cumsum(xd * xd, axis=-1)
    total, total2 = csum[..., -1:], csum2[..., -1:]
    n = (T - np.arange(1, L + 1)).astype(np.float64)
    sum_a = csum[..., T - 1 - L: T - 1][..., ::-1]
    sum_a2 = csum2[..., T - 1 - L: T - 1][..., ::-1]
    sum_b = total - csum[..., 0:L]
    sum_b2 = total2 - csum2[..., 0:L]
    ma, mb = sum_a / n, sum_b / n
    cov = cross / n - ma * mb
    var_a = sum_a2 / n - ma * ma
    var_b = sum_b2 / n - mb * mb
    den = np.sqrt(np.maximum(var_a, 0.0) * np.maximum(var_b, 0.0))
    return cov / (den + 1e-12)


def mean_acf_per_channel(x, max_lag: int):
    """Reference-eval ACF feature: per-channel mean over sequences of the mean
    lag-1..max_lag Pearson autocorrelation (timeGAN/evaluation.py:124-128).

    ``x``: (B, T, C) → (C,) numpy. Sequences that are nearly constant
    contribute 0.0, matching the reference's std guard (std < 1e-8 → 0).
    Runs on the HOST in float64 — see :func:`_pearson_lag_corrs_np64` for why
    f32 is numerically unsafe for this statistic (eval-only; the training ACF
    loss keeps the on-device :func:`acf_per_channel`)."""
    import numpy as np

    xt = np.moveaxis(np.asarray(x), 1, -1)                    # (B, C, T)
    corr = _pearson_lag_corrs_np64(xt, max_lag)               # (B, C, L)
    val = corr.mean(axis=-1)                                  # (B, C)
    # np.std (ddof=0) guard, matching evaluation.py:64
    val = np.where(xt.std(axis=-1) < 1e-8, 0.0, val)
    return val.mean(axis=0)
