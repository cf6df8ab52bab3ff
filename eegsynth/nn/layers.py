"""Dense layer + initializers (PyTorch-parity xavier_uniform)."""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def xavier_uniform(key: jax.Array, shape: tuple[int, ...], dtype=jnp.float32) -> jax.Array:
    """torch.nn.init.xavier_uniform_ semantics: fan_in/fan_out from the last two
    dims as (out, in), bound sqrt(6/(fan_in+fan_out))."""
    fan_out, fan_in = shape[-2], shape[-1]
    bound = math.sqrt(6.0 / (fan_in + fan_out))
    return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)


def dense_init(key: jax.Array, in_dim: int, out_dim: int, dtype=jnp.float32):
    """Linear layer, torch layout w: (out, in); xavier-uniform + zero bias
    (reference init, timegan_model.py:11-15)."""
    return {"w": xavier_uniform(key, (out_dim, in_dim), dtype),
            "b": jnp.zeros((out_dim,), dtype)}


def dense_apply(params, x: jax.Array) -> jax.Array:
    return x @ params["w"].T + params["b"]


def torch_dense_init(key: jax.Array, in_dim: int, out_dim: int, dtype=jnp.float32):
    """torch.nn.Linear default: kaiming_uniform(a=√5) ⇒ weight and bias
    ~ U(±1/√in_dim)."""
    kw, kb = jax.random.split(key)
    bound = 1.0 / math.sqrt(in_dim)
    return {"w": jax.random.uniform(kw, (out_dim, in_dim), dtype, -bound, bound),
            "b": jax.random.uniform(kb, (out_dim,), dtype, -bound, bound)}
