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
from jax import custom_batching

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


def _rnn_proj(sub: Params, x: jax.Array, *, dropout: float = 0.0,
              key: jax.Array | None = None, train: bool = False) -> jax.Array:
    y = gru_stack_apply(sub["gru"], x, dropout=dropout, key=key, train=train)
    if sub.get("proj") is not None:
        y = dense_apply(sub["proj"], y)
    return y


def encode(params: Params, x: jax.Array, *, dropout: float = 0.0,
           key: jax.Array | None = None, train: bool = False) -> jax.Array:
    """X → H (timegan_model.py:113).

    ``dropout``/``key``/``train`` reproduce torch nn.GRU's inter-layer dropout
    (active only for multi-layer stacks, like the reference's num_layers>1
    configs; the default single-layer path never consumes the key)."""
    return gru_stack_apply(params["embedder"]["gru"], x, dropout=dropout,
                           key=key, train=train)


def recover(params: Params, h: jax.Array, *, dropout: float = 0.0,
            key: jax.Array | None = None, train: bool = False) -> jax.Array:
    """H → X̃ — GRU + output head (timegan_model.py:47-57)."""
    y = gru_stack_apply(params["recovery"]["gru"], h, dropout=dropout,
                        key=key, train=train)
    return dense_apply(params["recovery"]["out"], y)


def reconstruct(params: Params, x: jax.Array, *, dropout: float = 0.0,
                key: jax.Array | None = None, train: bool = False) -> jax.Array:
    ke = kr = None
    if key is not None:
        ke, kr = jax.random.split(key)
    h = encode(params, x, dropout=dropout, key=ke, train=train)
    return recover(params, h, dropout=dropout, key=kr, train=train)


def gen_latent(params: Params, z: jax.Array, *, dropout: float = 0.0,
               key: jax.Array | None = None, train: bool = False) -> jax.Array:
    return _rnn_proj(params["generator"], z, dropout=dropout, key=key, train=train)


def refine_latent(params: Params, e: jax.Array, *, dropout: float = 0.0,
                  key: jax.Array | None = None, train: bool = False) -> jax.Array:
    return _rnn_proj(params["supervisor"], e, dropout=dropout, key=key, train=train)


def decode(params: Params, h: jax.Array, *, dropout: float = 0.0,
           key: jax.Array | None = None, train: bool = False) -> jax.Array:
    return recover(params, h, dropout=dropout, key=key, train=train)


def discriminate(params: Params, h: jax.Array, train: bool = True, *,
                 dropout: float = 0.0, key: jax.Array | None = None):
    """H → p(real) via last-step GRU output + spectral-norm head + sigmoid.

    Returns (probs (B,1), updated discriminator params) — the power-iteration
    vector advances once per forward in train mode, as in torch.
    """
    d = params["discriminator"]
    y = gru_stack_apply(d["gru"], h, impl="xla",  # R1 needs 2nd-order (trainer)
                        dropout=dropout, key=key, train=train)
    last = y[:, -1, :]
    logits, fc_new = sn_dense_apply(d["fc"], last, train=train)
    new_d = {**d, "fc": fc_new}
    return jax.nn.sigmoid(logits), new_d


def sample_noise(key: jax.Array, batch: int, seq_len: int, z_dim: int,
                 dtype=jnp.float32) -> jax.Array:
    """Uniform [0,1) noise — the reference's torch.rand source
    (train_timegan.py:64-65)."""
    return jax.random.uniform(key, (batch, seq_len, z_dim), dtype)


# --------------------------------------------------------------------------
# Fused cascades (TPU latency optimization)
#
# generator → supervisor → recovery are causally aligned: each downstream net's
# input at time t is the upstream net's output at time t. Running them as
# separate lax.scans costs 3× the sequential-dependency latency (the dominant
# term at these tiny hidden sizes). These fused paths carry all hidden states
# through ONE scan; the upstream input projection stays hoisted (z is known),
# downstream projections become small per-step matmuls inside the cell.
# Only the reference configuration (num_layers == 1) fuses; other depths fall
# back to the composed functions. Parity: tests/test_timegan_fused.py.
#
# MEASURED (v5e, reference sizes H=56, B=26): the composed separate-scan path
# with fully hoisted input projections is FASTER end-to-end (58.9 vs 52.0
# steps/s) — the per-step downstream projections inside the fused cell cost
# more than the extra scans' latency. The trainers therefore use the composed
# functions; these fused paths are retained (and parity-tested) for geometries
# where per-step latency dominates (very small B, very long T, larger H).
# --------------------------------------------------------------------------

def _cell(w_hh_t, b_hh, h, xp_t):
    """One PyTorch-convention GRU cell step given the precomputed x-projection."""
    hp = h @ w_hh_t + b_hh
    H = h.shape[-1]
    r = jax.nn.sigmoid(xp_t[:, :H] + hp[:, :H])
    z = jax.nn.sigmoid(xp_t[:, H:2 * H] + hp[:, H:2 * H])
    n = jnp.tanh(xp_t[:, 2 * H:] + r * hp[:, 2 * H:])
    return (1.0 - z) * n + z * h


def _layer0(sub):
    return sub["gru"][0]


def _xproj(layer, x):
    return jnp.einsum("bti,gi->btg", x, layer["w_ih"]) + layer["b_ih"]


def _proj(p, v):
    return v if p is None else dense_apply(p, v)


def _fusable(params) -> bool:
    return all(len(params[k]["gru"]) == 1
               for k in ("generator", "supervisor", "recovery", "embedder"))


def cascade_init_carry(params: Params, batch: int, dtype=jnp.float32):
    """Zero hidden states (h_gen, h_sup, h_rec) for the fused G→S→R cascade."""
    g, s, r = params["generator"], params["supervisor"], params["recovery"]
    return tuple(jnp.zeros((batch, _layer0(sub)["w_hh"].shape[1]), dtype)
                 for sub in (g, s, r))


def fused_gen_refine_carry(params: Params, z: jax.Array, carry,
                           with_decode: bool = False):
    """Carry-threaded fused cascade: one scan over this chunk of ``z``,
    starting from the given (h_gen, h_sup, h_rec) hidden states.

    Returns ``(carry_out, h_hat)`` or ``(carry_out, (h_hat, x_hat))``. Because a
    GRU is strictly causal, scanning T in chunks with threaded carries is
    bit-identical to one full-length scan — this is what lets long-horizon
    synthesis reuse ONE compiled executable for any requested length
    (generate_long_synth.py's arbitrary --gen_len, reference
    generate_long_synth.py:105-121). Requires the fusable (single-layer)
    configuration — callers check ``_fusable`` / fall back to composed scans.
    """
    g, s, r = params["generator"], params["supervisor"], params["recovery"]
    gl, sl, rl = _layer0(g), _layer0(s), _layer0(r)
    xp_g = jnp.moveaxis(_xproj(gl, z), 1, 0)                 # (T, B, 3Hg)
    wg, ws, wr = gl["w_hh"].T, sl["w_hh"].T, rl["w_hh"].T
    ws_ih, wr_ih = sl["w_ih"].T, rl["w_ih"].T

    def cell(carry, xp_g_t):
        h_g, h_s, h_r = carry
        h_g = _cell(wg, gl["b_hh"], h_g, xp_g_t)
        e_t = _proj(g.get("proj"), h_g)
        h_s = _cell(ws, sl["b_hh"], h_s, e_t @ ws_ih + sl["b_ih"])
        hh_t = _proj(s.get("proj"), h_s)
        if with_decode:
            h_r = _cell(wr, rl["b_hh"], h_r, hh_t @ wr_ih + rl["b_ih"])
            x_t = _proj(r["out"], h_r)
            return (h_g, h_s, h_r), (hh_t, x_t)
        return (h_g, h_s, h_r), hh_t

    carry, ys = jax.lax.scan(jax.checkpoint(cell), carry, xp_g, unroll=8)
    if with_decode:
        h_hat, x_hat = ys
        return carry, (jnp.moveaxis(h_hat, 0, 1), jnp.moveaxis(x_hat, 0, 1))
    return carry, jnp.moveaxis(ys, 0, 1)


def fused_gen_refine(params: Params, z: jax.Array, with_decode: bool = False):
    """Ĥ = supervisor(generator(z)) (and optionally X̂ = recovery(Ĥ)) in one scan.

    Returns ``h_hat`` or ``(h_hat, x_hat)``. Falls back to the composed
    functions for multi-layer stacks.
    """
    if not _fusable(params):
        e_hat = gen_latent(params, z)
        h_hat = refine_latent(params, e_hat)
        return (h_hat, recover(params, h_hat)) if with_decode else h_hat
    init = cascade_init_carry(params, z.shape[0], z.dtype)
    return fused_gen_refine_carry(params, z, init, with_decode)[1]


def fused_disc_inputs(params: Params, x: jax.Array, z: jax.Array):
    """D-step latents (h_real, h_fake) = (embedder(x), supervisor(generator(z)))
    in ONE scan.

    The discriminator update differentiates only through the discriminator
    (train_timegan.py:166-225 — E/G/S forwards are under no-grad), so these
    three forward-only recurrences can share a single scan: the embedder carry
    is independent of the generator→supervisor causal chain. MEASURED (v5e,
    reference sizes): 58.1 vs 58.9 steps/s — no win, the trainer keeps the
    composed scans; retained (parity-tested) for geometries where per-scan
    dispatch latency dominates. Falls back to composed applies for multi-layer
    stacks.
    """
    if not _fusable(params):
        return encode(params, x), refine_latent(params, gen_latent(params, z))

    e, g, s = params["embedder"], params["generator"], params["supervisor"]
    el, gl, sl = _layer0(e), _layer0(g), _layer0(s)
    B = x.shape[0]
    xp_e = jnp.moveaxis(_xproj(el, x), 1, 0)                 # (T, B, 3He)
    xp_g = jnp.moveaxis(_xproj(gl, z), 1, 0)                 # (T, B, 3Hg)
    we, wg, ws = el["w_hh"].T, gl["w_hh"].T, sl["w_hh"].T
    ws_ih = sl["w_ih"].T

    def cell(carry, inp):
        h_e, h_g, h_s = carry
        xp_e_t, xp_g_t = inp
        h_e = _cell(we, el["b_hh"], h_e, xp_e_t)
        h_g = _cell(wg, gl["b_hh"], h_g, xp_g_t)
        e_t = _proj(g.get("proj"), h_g)
        h_s = _cell(ws, sl["b_hh"], h_s, e_t @ ws_ih + sl["b_ih"])
        return (h_e, h_g, h_s), (h_e, _proj(s.get("proj"), h_s))

    init = tuple(jnp.zeros((B, l["w_hh"].shape[1]), x.dtype)
                 for l in (el, gl, sl))
    _, (h_real, h_fake) = jax.lax.scan(jax.checkpoint(cell), init,
                                       (xp_e, xp_g), unroll=8)
    return jnp.moveaxis(h_real, 0, 1), jnp.moveaxis(h_fake, 0, 1)


disc_inputs_multigru = custom_batching.custom_vmap(fused_disc_inputs)


@disc_inputs_multigru.def_vmap
def _disc_inputs_multigru_rule(axis_size, in_batched, params, x, z):
    """vmap rule: when the D-input computation is batched over stacked buckets
    (the vmapped multi-bucket trainer), run ALL buckets' E / G→S recurrences in
    ONE fused Pallas kernel with every hidden state VMEM-resident — SURVEY §7's
    "batch all networks' cells into one fused kernel per step". Unbatched calls
    (the sequential trainer) hit the plain XLA fused scan.
    """
    px, bx, bz = in_batched
    fully_batched = (bx and bz
                     and all(jax.tree_util.tree_leaves(px)))
    g_proj, s_proj = params.get("generator", {}).get("proj"), \
        params.get("supervisor", {}).get("proj")
    fusable = (g_proj is not None and s_proj is not None
               and all(len(params[k]["gru"]) == 1
                       for k in ("generator", "supervisor", "embedder")))
    if not (fully_batched and fusable):
        return jax.vmap(fused_disc_inputs)(params, x, z), (True, True)
    from eegsynth.nn.pallas_multigru import multigru_disc_inputs_pallas
    return multigru_disc_inputs_pallas(params, x, z), (True, True)


def fused_reconstruct(params: Params, x: jax.Array) -> jax.Array:
    """X̃ = recovery(embedder(x)) in one scan (reference reconstruct,
    timegan_model.py:114)."""
    if not _fusable(params):
        return reconstruct(params, x)
    e, r = params["embedder"], params["recovery"]
    el, rl = _layer0(e), _layer0(r)
    B = x.shape[0]
    He, Hr = el["w_hh"].shape[1], rl["w_hh"].shape[1]
    xp_e = jnp.moveaxis(_xproj(el, x), 1, 0)
    we, wr = el["w_hh"].T, rl["w_hh"].T
    wr_ih = rl["w_ih"].T

    def cell(carry, xp_e_t):
        h_e, h_r = carry
        h_e = _cell(we, el["b_hh"], h_e, xp_e_t)
        h_r = _cell(wr, rl["b_hh"], h_r, h_e @ wr_ih + rl["b_ih"])
        return (h_e, h_r), _proj(r["out"], h_r)

    init = (jnp.zeros((B, He), x.dtype), jnp.zeros((B, Hr), x.dtype))
    _, ys = jax.lax.scan(jax.checkpoint(cell), init, xp_e, unroll=8)
    return jnp.moveaxis(ys, 0, 1)
