"""Batched Welch PSD and spectral helpers (scipy-parity, jnp-native).

Replaces the reference's scipy.signal.welch calls (timeGAN/evaluation.py:119-121,
mental fatigue/basic_plot.py, timeGAN/pre-processing.py:87) with a fully batched
rFFT formulation: all epochs × channels are transformed in one call so the TPU
sees a single large FFT + elementwise reduction instead of Python loops.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def hann_periodic(n: int, dtype=jnp.float64) -> jax.Array:
    """Periodic Hann window — scipy.signal.get_window('hann', n) with fftbins=True."""
    k = np.arange(n)
    w = 0.5 - 0.5 * np.cos(2.0 * np.pi * k / n)
    return jnp.asarray(w, dtype=dtype)


@partial(jax.jit, static_argnames=("nperseg", "noverlap", "detrend", "axis", "fs"))
def welch_psd(x: jax.Array, fs: float = 128.0, nperseg: int = 256,
              noverlap: int | None = None, detrend: str = "constant",
              axis: int = -1):
    """Welch power spectral density, matching scipy.signal.welch defaults.

    Hann (periodic) window, 50% overlap, constant detrend per segment, density
    scaling, one-sided doubling. Works on arbitrarily-batched inputs; the time
    axis is segmented via a strided gather so the whole batch FFTs at once.

    Returns ``(freqs, psd)`` with ``psd`` replacing the time axis by frequency bins.
    """
    x = jnp.moveaxis(x, axis, -1)
    T = x.shape[-1]
    nperseg = min(nperseg, T)
    if noverlap is None:
        noverlap = nperseg // 2
    step = nperseg - noverlap
    n_seg = (T - nperseg) // step + 1

    # Static slices (not a gather): gathers compile pathologically slowly on
    # some TPU toolchains; n_seg is small so unrolled slicing is cheap and fuses.
    segs = jnp.stack([x[..., s: s + nperseg] for s in range(0, n_seg * step, step)],
                     axis=-2)                                    # (..., n_seg, nperseg)
    if detrend == "constant":
        segs = segs - jnp.mean(segs, axis=-1, keepdims=True)
    elif detrend:  # don't silently skip e.g. scipy's "linear"
        raise ValueError(f"unsupported detrend mode {detrend!r} "
                         "(supported: 'constant', False/None)")

    win = hann_periodic(nperseg, dtype=x.dtype)
    scale = 1.0 / (fs * jnp.sum(win * win))

    spec = jnp.fft.rfft(segs * win, axis=-1)
    psd = (spec.real ** 2 + spec.imag ** 2) * scale
    # one-sided: double everything except DC and (for even nperseg) Nyquist.
    # Constant-mask multiply, not .at[].multiply — scatters compile very slowly
    # on the remote TPU toolchain.
    nbins = nperseg // 2 + 1
    mask = np.full((nbins,), 2.0)
    mask[0] = 1.0
    if nperseg % 2 == 0:
        mask[-1] = 1.0
    psd = psd * jnp.asarray(mask, dtype=psd.dtype)
    psd = jnp.mean(psd, axis=-2)                                 # average segments
    psd = jnp.moveaxis(psd, -1, axis if axis >= 0 else psd.ndim + axis)
    freqs = jnp.fft.rfftfreq(nperseg, d=1.0 / fs).astype(x.dtype)
    return freqs, psd


def trapezoid(y: jax.Array, x: jax.Array, axis: int = -1) -> jax.Array:
    """np.trapz equivalent (band-power integration, mental fatigue/basic_plot.py)."""
    y = jnp.moveaxis(y, axis, -1)
    dx = jnp.diff(x)
    return jnp.sum((y[..., 1:] + y[..., :-1]) * 0.5 * dx, axis=-1)


def rfft_power(x: jax.Array, axis: int = -2):
    """Plain rFFT power ``re^2 + im^2`` along the time axis — the un-windowed
    power inside the CGAN PSD losses (losses/spectral.py psd_loss and the
    posture-conditional psd branch; reference: CGAN/cgan.py:283-289).

    (The coherence statistic lives in losses/spectral.py:_pair_coherence —
    per-sample normalization with one-hot pair selection, matching the
    reference's per-pair ``coh``.)"""
    spec = jnp.fft.rfft(x, axis=axis)
    return spec.real ** 2 + spec.imag ** 2
