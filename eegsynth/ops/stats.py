"""Covariance / correlation primitives used by losses and evaluation."""

from __future__ import annotations

import jax
import jax.numpy as jnp


@jax.jit
def channel_cov(x: jax.Array) -> jax.Array:
    """Channel covariance over flattened (B·T, C) samples, ddof=1.

    The TimeGAN covariance-loss statistic (timeGAN/train_timegan.py:82-101).
    ``x``: (B, T, C) → (C, C). One einsum → MXU.
    """
    B, T, C = x.shape
    X = x.reshape(B * T, C)
    X = X - jnp.mean(X, axis=0, keepdims=True)
    return (X.T @ X) / (B * T - 1)


@jax.jit
def channel_corrcoef(x: jax.Array) -> jax.Array:
    """np.corrcoef(rowvar=False) of flattened samples — the reference eval's
    "coherence" proxy (timeGAN/evaluation.py:130-134). ``x``: (B, T, C) → (C, C)."""
    cov = channel_cov(x)
    d = jnp.sqrt(jnp.diagonal(cov))
    return cov / (d[:, None] * d[None, :])


@jax.jit
def per_sample_channel_cov(x: jax.Array) -> jax.Array:
    """Per-sample channel covariance over time, batch-meaned — the CGAN
    channel-covariance loss statistic (CGAN/cgan.py:306-311).
    ``x``: (B, C, T) → (C, C)."""
    xc = x - jnp.mean(x, axis=-1, keepdims=True)
    cov = jnp.einsum("bct,bdt->bcd", xc, xc) / (x.shape[-1] - 1)
    return jnp.mean(cov, axis=0)
