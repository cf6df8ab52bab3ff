"""TimeGAN losses — numerically matched to the reference formulas.

Sources: timeGAN/train_timegan.py:40-47 (labels/noise), :72-126 (recon/sup/cov/ACF),
:196-216 (BCE + R1 + throttle). Each has a NumPy-oracle unit test.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from eegsynth.ops.acf import acf_per_channel
from eegsynth.ops.stats import channel_cov


def recon_loss(x: jax.Array, x_tilde: jax.Array, eps: float = 1e-8,
               weight: jax.Array | None = None) -> jax.Array:
    """10·sqrt(MSE + eps) (train_timegan.py:72-74). Optional per-sample weight
    mask supports reference drop_last=False partial batches under fixed shapes."""
    se = (x - x_tilde) ** 2
    if weight is None:
        mse = jnp.mean(se)
    else:
        w = weight.reshape((-1,) + (1,) * (se.ndim - 1))
        mse = jnp.sum(se * w) / (jnp.sum(w) * se.shape[1] * se.shape[2])
    return 10.0 * jnp.sqrt(mse + eps)


def sup_loss(h: jax.Array, weight: jax.Array | None = None) -> jax.Array:
    """Mean squared one-step latent difference (train_timegan.py:76-80)."""
    d = (h[:, 1:, :] - h[:, :-1, :]) ** 2
    if weight is None:
        return jnp.mean(d)
    w = weight.reshape((-1,) + (1,) * (d.ndim - 1))
    return jnp.sum(d * w) / (jnp.sum(w) * d.shape[1] * d.shape[2])


def bce(p: jax.Array, y: jax.Array, weight: jax.Array | None = None) -> jax.Array:
    """torch.nn.BCELoss parity: element BCE on probabilities with log clamped
    at -100 (torch semantics), mean reduction."""
    logp = jnp.clip(jnp.log(p), -100.0, None)
    log1mp = jnp.clip(jnp.log1p(-p), -100.0, None)
    el = -(y * logp + (1.0 - y) * log1mp)
    if weight is None:
        return jnp.mean(el)
    w = weight.reshape((-1,) + (1,) * (el.ndim - 1))
    return jnp.sum(el * w) / jnp.maximum(jnp.sum(w) * el.shape[-1], 1.0)


def smooth_labels(key: jax.Array, size: int, smooth: float, dtype=jnp.float32):
    """real ∈ [1−s, 1], fake ∈ [0, s], uniform (train_timegan.py:40-43)."""
    kr, kf = jax.random.split(key)
    real = (1.0 - smooth) + smooth * jax.random.uniform(kr, (size, 1), dtype)
    fake = smooth * jax.random.uniform(kf, (size, 1), dtype)
    return real, fake


def add_instance_noise(key: jax.Array, h: jax.Array, std: jax.Array) -> jax.Array:
    """Gaussian instance noise with scheduled std (train_timegan.py:46-47).
    ``std`` may be a traced scalar (linear decay inside the scanned GAN loop)."""
    return h + std * jax.random.normal(key, h.shape, h.dtype)


def cov_loss(x_fake: jax.Array, x_real: jax.Array) -> jax.Array:
    """Frobenius diff of channel covariance / sqrt(numel)
    (train_timegan.py:253-258); real side carries no gradient."""
    cov_r = jax.lax.stop_gradient(channel_cov(x_real))
    cov_g = channel_cov(x_fake)
    C = cov_r.shape[0]
    return jnp.linalg.norm(cov_g - cov_r, ord="fro") / (C * C) ** 0.5


def acf_loss(x_fake: jax.Array, x_real: jax.Array, max_lag: int) -> jax.Array:
    """Mean |Δ autocorrelation| over lags × channels (train_timegan.py:103-126)."""
    acf_g = acf_per_channel(x_fake, max_lag)
    acf_r = jax.lax.stop_gradient(acf_per_channel(x_real, max_lag))
    return jnp.mean(jnp.abs(acf_g - acf_r))


def throttle_scale(acc: jax.Array, target_acc: float, band: float) -> jax.Array:
    """Soft D throttle: scale ∈ [0.2, 1], 1 near target, 0.2 when D is far too
    strong (train_timegan.py:210-216). ``band`` is static; callers skip when 0."""
    over = jnp.maximum(0.0, acc - target_acc)
    return jnp.maximum(0.2, 1.0 - over / band)
