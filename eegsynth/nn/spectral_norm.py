"""Spectral normalization as explicit functional state.

PyTorch hides the power-iteration vector ``u`` inside a forward-pre hook
(reference: timegan_model.py:92, CGAN/cgan.py:227-231). In JAX the vector is
part of the parameter pytree and each training forward returns the updated
state — matching torch TRAIN semantics exactly: one power iteration per
training forward, weight divided by the estimated top singular value.

Documented deviation at EVAL: torch caches ``v`` and computes
``sigma = u·W·v_stored`` with no iteration; we store only ``u`` and re-derive
``v = normalize(Wᵀu)`` (the same formula torch uses to refresh it), without
advancing the stored ``u``. At a converged power iteration the two sigmas
agree to float tolerance (full-model checkpoint parity ≤2e-5,
tests/test_convert_ckpt.py); keeping ``v`` out of the state keeps checkpoints
one-vector and loaders simple.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from eegsynth.nn.layers import xavier_uniform


def _l2_normalize(v, eps=1e-12):
    return v / (jnp.linalg.norm(v) + eps)


def spectral_normalize(w2d: jax.Array, u: jax.Array, update: bool = True):
    """Return (w / sigma, new_u) for a 2-D weight (out, in).

    torch.nn.utils.spectral_norm with n_power_iterations=1:
    v = normalize(W^T u); u' = normalize(W v); sigma = u'^T W v.
    """
    # u, v are buffers in torch (no grad); sigma keeps grad through W itself.
    v = jax.lax.stop_gradient(_l2_normalize(w2d.T @ u))
    u_new = jax.lax.stop_gradient(_l2_normalize(w2d @ v))
    sigma = u_new @ (w2d @ v)
    w_sn = w2d / sigma
    return w_sn, (u_new if update else u)


def sn_dense_init(key: jax.Array, in_dim: int, out_dim: int, dtype=jnp.float32):
    k1, k2 = jax.random.split(key)
    return {
        "w": xavier_uniform(k1, (out_dim, in_dim), dtype),
        "b": jnp.zeros((out_dim,), dtype),
        "u": _l2_normalize(jax.random.normal(k2, (out_dim,), dtype)),
    }


def sn_dense_apply(params, x: jax.Array, train: bool = True):
    """Spectrally-normalized linear layer. Returns (y, updated_params)."""
    w_sn, u_new = spectral_normalize(params["w"], params["u"], update=train)
    y = x @ w_sn.T + params["b"]
    new_params = {**params, "u": u_new}
    return y, new_params
