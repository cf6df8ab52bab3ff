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


def d_bce(real_scores: jax.Array, fake_scores: jax.Array) -> jax.Array:
    """BCE-with-logits D loss, real→1 / fake→0. The reference's --loss flag
    advertises "bce" without implementing it (cgan.py:48,258-261); this is the
    standard numerically-stable formulation."""
    return (jnp.mean(jax.nn.softplus(-real_scores))
            + jnp.mean(jax.nn.softplus(fake_scores)))


def g_bce(fake_scores: jax.Array) -> jax.Array:
    """Non-saturating BCE generator loss (fake→1)."""
    return jnp.mean(jax.nn.softplus(-fake_scores))


def d_wgan(real_scores: jax.Array, fake_scores: jax.Array) -> jax.Array:
    """Wasserstein critic loss (pair with gradient_penalty). Advertised by the
    reference's --loss flag ("wgan-gp") but never implemented there."""
    return jnp.mean(fake_scores) - jnp.mean(real_scores)


def g_wgan(fake_scores: jax.Array) -> jax.Array:
    return -jnp.mean(fake_scores)


def gradient_penalty(score_fn, key, real: jax.Array, fake: jax.Array) -> jax.Array:
    """WGAN-GP two-sided penalty: E[(‖∇_x̂ D(x̂)‖₂ − 1)²] on per-sample random
    interpolates x̂ = ε·real + (1−ε)·fake (Gulrajani et al. 2017).

    ``score_fn(x) -> (B,) scores``; gradients flow to the critic parameters
    closed over by score_fn, not through real/fake."""
    real = jax.lax.stop_gradient(real)
    fake = jax.lax.stop_gradient(fake)
    eps_shape = (real.shape[0],) + (1,) * (real.ndim - 1)
    eps = jax.random.uniform(key, eps_shape, real.dtype)
    x_hat = eps * real + (1.0 - eps) * fake
    g = jax.grad(lambda xx: jnp.sum(score_fn(xx)))(x_hat)
    norms = jnp.sqrt(jnp.sum(g.reshape(g.shape[0], -1) ** 2, axis=1) + 1e-12)
    return jnp.mean((norms - 1.0) ** 2)


def cross_entropy(logits: jax.Array, labels: jax.Array) -> jax.Array:
    """torch CrossEntropyLoss (mean reduction) for ACGAN heads.

    Selects the label log-prob with a one_hot mask-sum instead of
    take_along_axis — traced-index gathers compile pathologically slowly
    through the remote tunnel (CLAUDE.md rule); exact for finite log-probs
    (log_softmax of finite f32 logits cannot underflow to −inf)."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    picked = jnp.sum(logp * jax.nn.one_hot(labels, logits.shape[-1],
                                           dtype=logp.dtype), axis=-1)
    return -jnp.mean(picked)


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
