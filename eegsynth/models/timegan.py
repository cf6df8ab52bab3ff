"""TimeGAN: embedder / recovery / generator / supervisor / discriminator.

Functional re-design of the reference's five-GRU bundle
(timeGAN/timegan_model.py:101-118) on the shared scan-GRU core:

- Embedder      X (B,T,C)   → H (B,T,z)        GRU(x_dim→z_dim)
- Recovery      H           → X̃ (B,T,C)        GRU(z_dim→h_dim) + Linear(h_dim→x_dim)
- Generator     Z (B,T,z)   → Ê                GRU(z_dim→h_dim) + Linear(h_dim→z_dim)
- Supervisor    Ê           → Ĥ                same shape as Generator
- Discriminator H           → p(real) (B,1)    GRU(z_dim→h_dim), last step,
                                               spectral-norm Linear → sigmoid
                                               (timegan_model.py:86-98)

Params are a plain pytree; every apply is a pure function, so the whole bundle
jits, shards, and differentiates as one graph. The discriminator threads its
power-iteration vector explicitly (PyTorch hides it in a hook).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict

import jax
import jax.numpy as jnp

from eegsynth.nn.gru import gru_stack_apply, gru_stack_init
from eegsynth.nn.layers import dense_apply, dense_init
from eegsynth.nn.spectral_norm import sn_dense_apply, sn_dense_init

Params = Dict[str, Any]


@dataclasses.dataclass(frozen=True)
class TimeGANConfig:
    x_dim: int = 14
    z_dim: int = 28
    h_dim: int = 56
    num_layers: int = 1
    dropout: float = 0.2


def adaptive_dims(x_dim: int, seq_len: int) -> tuple[int, int]:
    """z=clip(2C,16,64), h=clip(4C,32,128); +8/+16 if T>800
    (train_timegan.py:50-55; C=14 → z=28, h=56)."""
    z = max(16, min(64, x_dim * 2))
    h = max(32, min(128, x_dim * 4))
    if seq_len > 800:
        z = min(64, z + 8)
        h = min(128, h + 16)
    return z, h


def timegan_init(key: jax.Array, cfg: TimeGANConfig, dtype=jnp.float32) -> Params:
    ks = jax.random.split(key, 9)
    L = cfg.num_layers
    params: Params = {
        "embedder": {"gru": gru_stack_init(ks[0], cfg.x_dim, cfg.z_dim, L, dtype)},
        "recovery": {"gru": gru_stack_init(ks[1], cfg.z_dim, cfg.h_dim, L, dtype),
                     "out": dense_init(ks[2], cfg.h_dim, cfg.x_dim, dtype)},
        "generator": {"gru": gru_stack_init(ks[3], cfg.z_dim, cfg.h_dim, L, dtype),
                      "proj": dense_init(ks[4], cfg.h_dim, cfg.z_dim, dtype)},
        "supervisor": {"gru": gru_stack_init(ks[5], cfg.z_dim, cfg.h_dim, L, dtype),
                       "proj": dense_init(ks[6], cfg.h_dim, cfg.z_dim, dtype)},
        "discriminator": {"gru": gru_stack_init(ks[7], cfg.z_dim, cfg.h_dim, L, dtype),
                          "fc": sn_dense_init(ks[8], cfg.h_dim, 1, dtype)},
    }
    if cfg.h_dim == cfg.z_dim:  # reference uses Identity when dims match
        params["generator"]["proj"] = None
        params["supervisor"]["proj"] = None
    return params


def _rnn_proj(sub: Params, x: jax.Array) -> jax.Array:
    y = gru_stack_apply(sub["gru"], x)
    if sub.get("proj") is not None:
        y = dense_apply(sub["proj"], y)
    return y


def encode(params: Params, x: jax.Array) -> jax.Array:
    """X → H (timegan_model.py:113)."""
    return gru_stack_apply(params["embedder"]["gru"], x)


def recover(params: Params, h: jax.Array) -> jax.Array:
    """H → X̃ — GRU + output head (timegan_model.py:47-57)."""
    y = gru_stack_apply(params["recovery"]["gru"], h)
    return dense_apply(params["recovery"]["out"], y)


def reconstruct(params: Params, x: jax.Array) -> jax.Array:
    return recover(params, encode(params, x))


def gen_latent(params: Params, z: jax.Array) -> jax.Array:
    return _rnn_proj(params["generator"], z)


def refine_latent(params: Params, e: jax.Array) -> jax.Array:
    return _rnn_proj(params["supervisor"], e)


def decode(params: Params, h: jax.Array) -> jax.Array:
    return recover(params, h)


def discriminate(params: Params, h: jax.Array, train: bool = True):
    """H → p(real) via last-step GRU output + spectral-norm head + sigmoid.

    Returns (probs (B,1), updated discriminator params) — the power-iteration
    vector advances once per forward in train mode, as in torch.
    """
    d = params["discriminator"]
    y = gru_stack_apply(d["gru"], h, impl="xla")  # R1 needs 2nd-order (see trainer)
    last = y[:, -1, :]
    logits, fc_new = sn_dense_apply(d["fc"], last, train=train)
    new_d = {**d, "fc": fc_new}
    return jax.nn.sigmoid(logits), new_d


def sample_noise(key: jax.Array, batch: int, seq_len: int, z_dim: int,
                 dtype=jnp.float32) -> jax.Array:
    """Uniform [0,1) noise — the reference's torch.rand source
    (train_timegan.py:64-65)."""
    return jax.random.uniform(key, (batch, seq_len, z_dim), dtype)
