"""GAN objectives for the CGAN family (CGAN/cgan.py:258-267,458-461;
cgan_v2.py:198-240)."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def d_hinge(real_scores: jax.Array, fake_scores: jax.Array) -> jax.Array:
    """mean(relu(1 − s_r) + relu(1 + s_f)) (cgan.py:258-259)."""
    return jnp.mean(jax.nn.relu(1.0 - real_scores) + jax.nn.relu(1.0 + fake_scores))


def g_hinge(fake_scores: jax.Array) -> jax.Array:
    return -jnp.mean(fake_scores)


def cross_entropy(logits: jax.Array, labels: jax.Array) -> jax.Array:
    """torch CrossEntropyLoss (mean reduction) for ACGAN heads."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    return -jnp.mean(jnp.take_along_axis(logp, labels[:, None], axis=1))


def feature_matching(fake_feats: jax.Array, real_feats: jax.Array) -> jax.Array:
    """MSE between batch-mean D features, real side detached (cgan.py:460-461)."""
    return jnp.mean((jnp.mean(fake_feats, axis=0)
                     - jax.lax.stop_gradient(jnp.mean(real_feats, axis=0))) ** 2)


def amp_calib_loss(real: jax.Array, fake: jax.Array) -> jax.Array:
    """L1 of per-channel mean + per-channel std (torch .std = unbiased) over
    (B, T) — v2-only amplitude calibration (cgan_v2.py:237-240). x: (B,C,T)."""
    mu_r = jnp.mean(real, axis=(0, 2))
    mu_f = jnp.mean(fake, axis=(0, 2))
    sd_r = jnp.std(real.transpose(1, 0, 2).reshape(real.shape[1], -1), axis=1, ddof=1)
    sd_f = jnp.std(fake.transpose(1, 0, 2).reshape(fake.shape[1], -1), axis=1, ddof=1)
    return jnp.mean(jnp.abs(mu_f - mu_r)) + jnp.mean(jnp.abs(sd_f - sd_r))
