"""Conditional batch normalization with explicit running-stat state.

Reference CBN1d (CGAN/cgan.py:181-192): affine-free BatchNorm1d + per-class
(γ, β) embedding, γ initialized to 1 and β to 0. PyTorch's BatchNorm hides
running mean/var as buffers; here they are explicit state threaded through
training (train: batch stats + EMA update, momentum 0.1; eval: running stats).
Under data parallelism the batch-stat means are jnp reductions over the sharded
batch axis, so GSPMD inserts the cross-device mean automatically.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def cbn1d_init(key, num_features: int, num_classes: int, dtype=jnp.float32):
    del key  # deterministic init (γ=1, β=0 per reference)
    return {
        "embed": jnp.concatenate(
            [jnp.ones((num_classes, num_features), dtype),
             jnp.zeros((num_classes, num_features), dtype)], axis=1),
    }


def cbn1d_state_init(num_features: int, dtype=jnp.float32):
    return {"mean": jnp.zeros((num_features,), dtype),
            "var": jnp.ones((num_features,), dtype)}


def cbn1d_apply(params, state, x: jax.Array, labels: jax.Array,
                train: bool = True, momentum: float = 0.1, eps: float = 1e-5):
    """x: (B, C, L), labels: (B,) int → (y, new_state)."""
    if train:
        mean = jnp.mean(x, axis=(0, 2))
        var = jnp.var(x, axis=(0, 2))          # biased, used for normalization
        n = x.shape[0] * x.shape[2]
        # torch updates running_var with the unbiased estimate
        var_unbiased = var * n / max(1, n - 1)
        new_state = {"mean": (1 - momentum) * state["mean"] + momentum * mean,
                     "var": (1 - momentum) * state["var"] + momentum * var_unbiased}
    else:
        mean, var = state["mean"], state["var"]
        new_state = state
    h = (x - mean[None, :, None]) * jax.lax.rsqrt(var[None, :, None] + eps)
    nf = x.shape[1]
    # one_hot matmul, not embed[labels]: traced-index gathers compile
    # pathologically slowly through the remote tunnel (CLAUDE.md rule)
    gb = jax.nn.one_hot(labels, params["embed"].shape[0],
                        dtype=params["embed"].dtype) @ params["embed"]  # (B, 2C)
    gamma, beta = gb[:, :nf], gb[:, nf:]
    return gamma[:, :, None] * h + beta[:, :, None], new_state
