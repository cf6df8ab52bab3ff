"""Scan-GRU: the TPU-native recurrent core shared by all five TimeGAN networks.

Design (SURVEY.md §7 "hard parts"): a GRU at T=768 is inherently sequential in the
hidden state, but the *input* projection is not — so ``x @ W_ih^T + b_ih`` for all
timesteps is hoisted out of the recurrence into one large (B·T, in)×(in, 3H)
matmul that tiles onto the MXU, and only the small h-recurrence runs inside
``lax.scan``. Gate math follows the PyTorch GRU definition (gate order r, z, n;
reset gate applied to the *projected* hidden branch) so parameters and dynamics
match the reference model (timeGAN/timegan_model.py:24-34) — verified against
torch.nn.GRU in tests/test_nn_gru.py.

A fused Pallas kernel for the recurrence lives in ``eegsynth.nn.pallas_gru`` and
is used automatically on TPU for supported sizes; this module is the portable
XLA reference path.
"""

from __future__ import annotations

from typing import Any, Dict, List

import jax
import jax.numpy as jnp

from eegsynth.nn.layers import xavier_uniform

GRUParams = Dict[str, Any]


def gru_init(key: jax.Array, input_dim: int, hidden_dim: int,
             dtype=jnp.float32) -> GRUParams:
    """One GRU layer, PyTorch weight layout: w_ih (3H, in), w_hh (3H, H),
    b_ih/b_hh (3H,). Xavier-uniform weights / zero biases per the reference init
    (timegan_model.py:11-21 applies xavier_uniform to each full GRU weight matrix).
    """
    k1, k2 = jax.random.split(key)
    return {
        "w_ih": xavier_uniform(k1, (3 * hidden_dim, input_dim), dtype),
        "w_hh": xavier_uniform(k2, (3 * hidden_dim, hidden_dim), dtype),
        "b_ih": jnp.zeros((3 * hidden_dim,), dtype),
        "b_hh": jnp.zeros((3 * hidden_dim,), dtype),
    }


_GRU_IMPL = "xla"
"""Global recurrence implementation: "xla" | "pallas" | "auto" (pallas on TPU).

Default is the XLA scan: at the reference's model sizes (H=56, B≤64) the fused
Pallas kernel is bit-exact but measured marginally slower end-to-end inside the
scan-chunked training step (41.8 vs 43.9 steps/s on v5e) and much slower to
compile through the remote toolchain — the recurrence matmul is far below one
MXU tile, so there is nothing for the kernel to win. Flip with
``set_gru_impl("pallas")`` (or "auto") for larger hidden sizes."""


def set_gru_impl(impl: str) -> None:
    """Select the recurrence backend for subsequent traces ("xla"/"pallas"/"auto")."""
    global _GRU_IMPL
    assert impl in ("xla", "pallas", "auto"), impl
    _GRU_IMPL = impl


def _use_pallas() -> bool:
    """Backend test for the resolved impl value "auto" (the global override is
    applied by the caller before this is consulted)."""
    try:
        return jax.default_backend() not in ("cpu",)
    except Exception:
        return False


def gru_apply(params: GRUParams, x: jax.Array, h0: jax.Array | None = None,
              *, unroll: int = 8, impl: str | None = None) -> jax.Array:
    """Run one GRU layer over a batch-first sequence.

    ``x``: (B, T, in) → (B, T, H). The input projection for every timestep is one
    MXU matmul; the scan carries only (B, H). On TPU the recurrence dispatches
    to the fused Pallas sequence kernel (eegsynth.nn.pallas_gru) unless
    overridden via ``impl`` or :func:`set_gru_impl`.
    """
    use = impl if impl is not None else _GRU_IMPL
    if use == "pallas" or (use == "auto" and _use_pallas()):
        from eegsynth.nn.pallas_gru import gru_apply_pallas
        return gru_apply_pallas(params, x, h0)
    B, T, _ = x.shape
    H = params["w_hh"].shape[1]
    if h0 is None:
        h0 = jnp.zeros((B, H), x.dtype)

    # Hoisted input projection: (B, T, 3H), time-major for the scan.
    xp = jnp.einsum("bti,gi->btg", x, params["w_ih"]) + params["b_ih"]
    xp = jnp.moveaxis(xp, 1, 0)                      # (T, B, 3H)

    w_hh_t = params["w_hh"].T                        # (H, 3H)
    b_hh = params["b_hh"]

    def cell(h, xp_t):
        hp = h @ w_hh_t + b_hh                       # (B, 3H)
        xr, xz, xn = jnp.split(xp_t, 3, axis=-1)
        hr, hz, hn = jnp.split(hp, 3, axis=-1)
        r = jax.nn.sigmoid(xr + hr)
        z = jax.nn.sigmoid(xz + hz)
        n = jnp.tanh(xn + r * hn)
        h_new = (1.0 - z) * n + z * h
        return h_new, h_new

    # Rematerialize the cell: the backward pass recomputes the cheap gate math
    # instead of storing ~5 per-step residual tensors — cuts BPTT activation
    # memory ~5× (essential for vmapped multi-bucket training; SURVEY §7 remat).
    _, ys = jax.lax.scan(jax.checkpoint(cell), h0, xp, unroll=unroll)
    return jnp.moveaxis(ys, 0, 1)                    # (B, T, H)


def gru_stack_init(key: jax.Array, input_dim: int, hidden_dim: int,
                   num_layers: int = 1, dtype=jnp.float32) -> List[GRUParams]:
    """Multi-layer GRU stack (reference GRUStack, timegan_model.py:24-34)."""
    keys = jax.random.split(key, num_layers)
    dims = [input_dim] + [hidden_dim] * (num_layers - 1)
    return [gru_init(k, d, hidden_dim, dtype) for k, d in zip(keys, dims)]


def gru_stack_apply(params: List[GRUParams], x: jax.Array,
                    *, dropout: float = 0.0, key: jax.Array | None = None,
                    train: bool = False, impl: str | None = None) -> jax.Array:
    """Stacked GRU with inter-layer dropout (PyTorch semantics: dropout applies
    between layers only, so a 1-layer stack — the reference default,
    timegan_config.json "layers": 1 — has no dropout in effect).

    ``impl="xla"`` forces the scan path — required wherever the stack sits under
    second-order differentiation (R1 penalties), since the Pallas kernel's
    custom VJP is first-order only."""
    y = x
    for i, layer in enumerate(params):
        y = gru_apply(layer, y, impl=impl)
        if train and dropout > 0.0 and i < len(params) - 1:
            assert key is not None, "dropout requires a PRNG key"
            key, sub = jax.random.split(key)
            keep = jax.random.bernoulli(sub, 1.0 - dropout, y.shape)
            y = jnp.where(keep, y / (1.0 - dropout), 0.0)
    return y
