"""Fused multi-network multi-bucket GRU kernel (TPU Pallas) — SURVEY §7's
"batch all networks' cells into one fused kernel per step", built for the
vmapped multi-bucket trainer's D-step geometry.

One ``pallas_call`` runs the THREE forward-only recurrences the discriminator
step needs — embedder(x), generator(z) → supervisor — for EVERY stacked bucket
at once: all recurrent weights, projection weights, and the three carried
hidden states live in VMEM for all T grid steps (TPU grid iterations are
sequential and scratch persists across them), so nothing round-trips HBM
between timesteps. The input projections ``x@W_ihᵀ`` / ``z@W_ihᵀ`` stay outside
as large batched MXU matmuls (no sequential dependency).

Buckets have DIFFERENT weights (the vmapped trainer stacks 6–18 independent
models, train/timegan_multi.py), so the per-timestep matmuls are per-bucket
(a static unroll over ``nb`` small dots — the same block structure XLA's
batched dot lowers to). Reference recurrence being reproduced:
timeGAN/timegan_model.py:24-34 (torch GRU, gate order [r, z, n]).

Forward-only by design: the D step differentiates only through the
discriminator (reference train_timegan.py:166-225 — E/G/S forwards are
no-grad), so this kernel needs no VJP. The training G-step keeps the XLA
fused scans (models/timegan.py), which autodiff exactly.

MEASURED NEGATIVE (v5e, real 6-bucket stack, B=64, T=768, z=28, h=56;
interleaved 250-step-chunk A/B, two rounds, values reproduced to 0.1):
60.2 vs the XLA fused scan's 66.2 aggregate steps/s (0.91×). The vmapped
step is sequential-latency-bound, not HBM-bound — XLA's fused scan already
keeps the carries on-chip, and the kernel's per-timestep unrolled per-bucket
dots serialize worse than XLA's batched bmm (whose cost BASELINE.md measured
nb-independent). Full roofline: BASELINE.md "MFU / roofline". Retained as a
parity-tested opt-in (`TimeGANHParams.pallas_multigru`); the XLA fused scan
stays the default.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _gru_gates(xp_t, hp, H):
    r = jax.nn.sigmoid(xp_t[:, 0:H] + hp[:, 0:H])
    z = jax.nn.sigmoid(xp_t[:, H:2 * H] + hp[:, H:2 * H])
    n = jnp.tanh(xp_t[:, 2 * H:3 * H] + r * hp[:, 2 * H:3 * H])
    return z, n


def _make_kernel(nb: int, He: int, Hg: int, Hs: int, Z: int, dtype):
    """Kernel body builder — nb and the net dims are static."""

    def kernel(xpe_ref, xpg_ref,                      # (1, nb, B, 3H*) blocks
               we_ref, be_ref,                         # E:  (nb, He, 3He), (nb, 1, 3He)
               wg_ref, bg_ref,                         # G:  (nb, Hg, 3Hg), (nb, 1, 3Hg)
               wpg_ref, bpg_ref,                       # G proj: (nb, Hg, Z), (nb, 1, Z)
               wis_ref, bis_ref,                       # S in:   (nb, Z, 3Hs), (nb, 1, 3Hs)
               ws_ref, bs_ref,                         # S:  (nb, Hs, 3Hs), (nb, 1, 3Hs)
               wps_ref, bps_ref,                       # S proj: (nb, Hs, Z), (nb, 1, Z)
               hr_ref, hf_ref,                         # out (1, nb, B, He/Z)
               he_scr, hg_scr, hs_scr):                # (nb, B, H*)
        t = pl.program_id(0)

        @pl.when(t == 0)
        def _():
            he_scr[:] = jnp.zeros_like(he_scr)
            hg_scr[:] = jnp.zeros_like(hg_scr)
            hs_scr[:] = jnp.zeros_like(hs_scr)

        for b in range(nb):                            # static unroll
            dot = partial(jnp.dot, preferred_element_type=dtype)
            # embedder cell (independent of G/S within the timestep)
            h_e = he_scr[b]
            z_e, n_e = _gru_gates(xpe_ref[0, b], dot(h_e, we_ref[b]) + be_ref[b],
                                  He)
            h_e = (1.0 - z_e) * n_e + z_e * h_e
            he_scr[b] = h_e
            hr_ref[0, b] = h_e

            # generator cell
            h_g = hg_scr[b]
            z_g, n_g = _gru_gates(xpg_ref[0, b], dot(h_g, wg_ref[b]) + bg_ref[b],
                                  Hg)
            h_g = (1.0 - z_g) * n_g + z_g * h_g
            hg_scr[b] = h_g

            # generator output proj -> supervisor input proj (causal chain)
            e_t = dot(h_g, wpg_ref[b]) + bpg_ref[b]
            s_in = dot(e_t, wis_ref[b]) + bis_ref[b]

            # supervisor cell + output proj
            h_s = hs_scr[b]
            z_s, n_s = _gru_gates(s_in, dot(h_s, ws_ref[b]) + bs_ref[b], Hs)
            h_s = (1.0 - z_s) * n_s + z_s * h_s
            hs_scr[b] = h_s
            hf_ref[0, b] = dot(h_s, wps_ref[b]) + bps_ref[b]

    return kernel


def _block(shape):
    return pl.BlockSpec(shape, lambda t: (0,) * len(shape),
                        memory_space=pltpu.VMEM)


def multigru_disc_inputs_pallas(params, x, z, *, interpret: bool | None = None):
    """(h_real, h_fake) for the vmapped D step via the fused Pallas kernel.

    ``params``: the vmapped TimeGAN pytree (leading bucket axis ``nb`` on every
    leaf, single-layer, with generator/supervisor projections present).
    ``x``: (nb, B, T, C) real windows; ``z``: (nb, B, T, Z) noise.
    Returns ((nb, B, T, He), (nb, B, T, Z)) — same contract as
    ``jax.vmap(models.timegan.fused_disc_inputs)``.

    ``interpret=None`` auto-selects interpret mode off-TPU (CPU tests).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    el = params["embedder"]["gru"][0]
    gl = params["generator"]["gru"][0]
    sl = params["supervisor"]["gru"][0]
    gp, sp = params["generator"]["proj"], params["supervisor"]["proj"]
    if gp is None or sp is None:
        raise ValueError("pallas multigru requires explicit G/S projections")
    nb, B, T, _ = x.shape
    He = el["w_hh"].shape[-1]
    Hg = gl["w_hh"].shape[-1]
    Hs = sl["w_hh"].shape[-1]
    Z = z.shape[-1]

    # hoisted input projections: one big batched MXU matmul each
    xp_e = jnp.einsum("nbti,ngi->tnbg", x, el["w_ih"]) + el["b_ih"][:, None]
    xp_g = jnp.einsum("nbti,ngi->tnbg", z, gl["w_ih"]) + gl["b_ih"][:, None]
    dtype = jnp.result_type(xp_e.dtype, xp_g.dtype)
    xp_e, xp_g = xp_e.astype(dtype), xp_g.astype(dtype)

    args = (
        xp_e, xp_g,
        jnp.swapaxes(el["w_hh"], -1, -2), el["b_hh"][:, None, :],
        jnp.swapaxes(gl["w_hh"], -1, -2), gl["b_hh"][:, None, :],
        jnp.swapaxes(gp["w"], -1, -2), gp["b"][:, None, :],
        jnp.swapaxes(sl["w_ih"], -1, -2), sl["b_ih"][:, None, :],
        jnp.swapaxes(sl["w_hh"], -1, -2), sl["b_hh"][:, None, :],
        jnp.swapaxes(sp["w"], -1, -2), sp["b"][:, None, :],
    )
    in_specs = [
        pl.BlockSpec((1, nb, B, 3 * He), lambda t: (t, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, nb, B, 3 * Hg), lambda t: (t, 0, 0, 0),
                     memory_space=pltpu.VMEM),
    ] + [_block(a.shape) for a in args[2:]]

    args = tuple(a.astype(dtype) for a in args)
    hr, hf = pl.pallas_call(
        _make_kernel(nb, He, Hg, Hs, Z, dtype),
        grid=(T,),
        in_specs=in_specs,
        out_specs=(pl.BlockSpec((1, nb, B, He), lambda t: (t, 0, 0, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((1, nb, B, Z), lambda t: (t, 0, 0, 0),
                                memory_space=pltpu.VMEM)),
        out_shape=(jax.ShapeDtypeStruct((T, nb, B, He), dtype),
                   jax.ShapeDtypeStruct((T, nb, B, Z), dtype),),
        scratch_shapes=[pltpu.VMEM((nb, B, He), dtype),
                        pltpu.VMEM((nb, B, Hg), dtype),
                        pltpu.VMEM((nb, B, Hs), dtype)],
        interpret=interpret,
    )(*args)
    # (T, nb, B, H) -> (nb, B, T, H)
    return (jnp.transpose(hr, (1, 2, 0, 3)), jnp.transpose(hf, (1, 2, 0, 3)))
