"""DiffAugment-1D: three stochastic augmentations, each applied w.p. ``p``
(reference CGAN/cgan.py:163-178; v2 uses p=0.5, cgan_v2.py:116-130).

- time shift: roll by a batch-shared int in [−8, 8]
- amplitude jitter: per-sample scale ∈ [0.9, 1.1] + 0.02·N bias, clamp [0, 1]
- time cutout: zero a 5%-of-T window at a per-sample random start

All branches are shape-static; the cutout mask is a broadcasted iota compare
(no scatter). The per-branch coin flips become `lax.select`s so one compiled
graph covers every outcome.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def diffaugment_1d(key: jax.Array, x: jax.Array, p: float = 0.25) -> jax.Array:
    """x: (B, C, T) in [0, 1] → augmented (B, C, T)."""
    B, C, T = x.shape
    k_c1, k_c2, k_c3, k_shift, k_scale, k_bias, k_start = jax.random.split(key, 7)

    # 1) time shift (batch-shared), via gather-free double-slice roll
    do1 = jax.random.uniform(k_c1) < p
    shift = jax.random.randint(k_shift, (), -8, 9)
    rolled = jnp.roll(x, shift, axis=2)
    x = jnp.where(do1, rolled, x)

    # 2) amplitude jitter
    do2 = jax.random.uniform(k_c2) < p
    scale = 0.9 + 0.2 * jax.random.uniform(k_scale, (B, 1, 1), x.dtype)
    bias = 0.02 * jax.random.normal(k_bias, (B, 1, 1), x.dtype)
    jittered = jnp.clip(x * scale + bias, 0.0, 1.0)
    x = jnp.where(do2, jittered, x)

    # 3) time cutout
    do3 = jax.random.uniform(k_c3) < p
    w = max(1, int(0.05 * T))
    start = jax.random.randint(k_start, (B, 1, 1), 0, T - w)
    t = jnp.arange(T)[None, None, :]
    mask = ((t < start) | (t >= start + w)).astype(x.dtype)
    x = jnp.where(do3, x * mask, x)
    return x
