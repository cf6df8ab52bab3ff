"""Fused Pallas GRU sequence kernel (TPU) with exact custom VJP.

The XLA reference path (``eegsynth.nn.gru.gru_apply``) lowers the recurrence to
a `lax.scan` of small HLO ops; this kernel instead runs the ENTIRE hidden
recurrence inside one `pallas_call`: the recurrent weight matrix, bias, and the
carried hidden state live in VMEM for all T steps (grid iterations are
sequential on TPU, and scratch persists across them), so nothing round-trips
through HBM between timesteps. The input projection ``x @ W_ih^T + b_ih`` stays
outside as one large MXU matmul (the standard trick — it has no sequential
dependency).

Training support: the op carries a `jax.custom_vjp` whose backward pass is an
exact reverse-time scan (gates recomputed from the saved hidden states), so the
kernel is a drop-in replacement inside the jitted D/G training steps.

Layouts (f32): xp (T, B, 3H) with gate order [r, z, n] (PyTorch convention),
w_hh_t (H, 3H) = W_hh^T, b_hh (1, 3H), h0 (B, H) → ys (T, B, H).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _gru_seq_kernel(xp_ref, whh_ref, bhh_ref, h0_ref, ys_ref, h_scr):
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        h_scr[:] = h0_ref[:]

    h = h_scr[:]
    H = h.shape[-1]
    hp = jnp.dot(h, whh_ref[:], preferred_element_type=jnp.float32) + bhh_ref[:]
    xp = xp_ref[0]
    r = jax.nn.sigmoid(xp[:, 0:H] + hp[:, 0:H])
    z = jax.nn.sigmoid(xp[:, H:2 * H] + hp[:, H:2 * H])
    n = jnp.tanh(xp[:, 2 * H:3 * H] + r * hp[:, 2 * H:3 * H])
    h_new = (1.0 - z) * n + z * h
    h_scr[:] = h_new
    ys_ref[0] = h_new


def _gru_seq_pallas(xp, w_hh_t, b_hh, h0, *, interpret=False):
    T, B, threeH = xp.shape
    H = threeH // 3
    return pl.pallas_call(
        _gru_seq_kernel,
        grid=(T,),
        in_specs=[
            pl.BlockSpec((1, B, threeH), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((H, threeH), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, threeH), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((B, H), lambda t: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, B, H), lambda t: (t, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((T, B, H), xp.dtype),
        scratch_shapes=[pltpu.VMEM((B, H), jnp.float32)],
        interpret=interpret,
    )(xp, w_hh_t, b_hh, h0)


@partial(jax.custom_vjp, nondiff_argnums=(4,))
def gru_sequence(xp, w_hh_t, b_hh, h0, interpret=False):
    """Run the fused recurrence: (T,B,3H), (H,3H), (1,3H), (B,H) → (T,B,H)."""
    return _gru_seq_pallas(xp, w_hh_t, b_hh, h0, interpret=interpret)


def _gru_seq_fwd(xp, w_hh_t, b_hh, h0, interpret):
    ys = _gru_seq_pallas(xp, w_hh_t, b_hh, h0, interpret=interpret)
    return ys, (xp, w_hh_t, b_hh, h0, ys)


def _gru_seq_bwd(interpret, res, d_ys):
    """Exact reverse-time BPTT; gates recomputed from saved hidden states."""
    xp, w_hh_t, b_hh, h0, ys = res
    T, B, threeH = xp.shape
    H = threeH // 3

    h_prev_seq = jnp.concatenate([h0[None], ys[:-1]], axis=0)     # (T, B, H)

    def step(carry, inp):
        dh_next, dw, db = carry
        xp_t, h_prev, h_t, dy_t = inp
        dh = dh_next + dy_t

        hp = h_prev @ w_hh_t + b_hh                                # (B, 3H)
        r = jax.nn.sigmoid(xp_t[:, 0:H] + hp[:, 0:H])
        z = jax.nn.sigmoid(xp_t[:, H:2 * H] + hp[:, H:2 * H])
        hn = hp[:, 2 * H:3 * H]
        n = jnp.tanh(xp_t[:, 2 * H:3 * H] + r * hn)

        dz = dh * (h_prev - n)
        dn = dh * (1.0 - z)
        dh_prev = dh * z

        dn_pre = dn * (1.0 - n * n)
        dxn = dn_pre
        dr = dn_pre * hn
        dhn = dn_pre * r
        dz_pre = dz * z * (1.0 - z)
        dr_pre = dr * r * (1.0 - r)

        dxp_t = jnp.concatenate([dr_pre, dz_pre, dxn], axis=-1)   # (B, 3H)
        dhp_t = jnp.concatenate([dr_pre, dz_pre, dhn], axis=-1)   # (B, 3H)

        dh_prev = dh_prev + dhp_t @ w_hh_t.T
        dw = dw + h_prev.T @ dhp_t                                 # (H, 3H)
        db = db + jnp.sum(dhp_t, axis=0, keepdims=True)
        return (dh_prev, dw, db), dxp_t

    init = (jnp.zeros_like(h0), jnp.zeros_like(w_hh_t), jnp.zeros_like(b_hh))
    (dh0, dw, db), dxp = jax.lax.scan(
        step, init, (xp, h_prev_seq, ys, d_ys), reverse=True)
    return dxp, dw, db, dh0


gru_sequence.defvjp(_gru_seq_fwd, _gru_seq_bwd)


def gru_apply_pallas(params, x: jax.Array, h0: jax.Array | None = None,
                     *, interpret: bool = False) -> jax.Array:
    """Drop-in replacement for ``gru.gru_apply`` using the fused kernel.

    ``x``: (B, T, in) batch-first → (B, T, H). The kernel's recurrence state
    lives in f32 VMEM scratch, so half-precision callers (the bf16 synthesis
    policy casts the whole model tree) are cast to f32 for the kernel and the
    output is cast back — same policy as the flash-attention kernel."""
    B, T, _ = x.shape
    H = params["w_hh"].shape[1]
    out_dtype = x.dtype
    if out_dtype != jnp.float32:
        x = x.astype(jnp.float32)
        params = {k: params[k].astype(jnp.float32)
                  for k in ("w_ih", "w_hh", "b_ih", "b_hh")}
        h0 = None if h0 is None else h0.astype(jnp.float32)
    if h0 is None:
        h0 = jnp.zeros((B, H), jnp.float32)
    xp = jnp.einsum("bti,gi->btg", x, params["w_ih"]) + params["b_ih"]
    xp = jnp.moveaxis(xp, 1, 0)                       # (T, B, 3H)
    ys = gru_sequence(xp, params["w_hh"].T, params["b_hh"][None, :], h0, interpret)
    return jnp.moveaxis(ys, 0, 1).astype(out_dtype)
