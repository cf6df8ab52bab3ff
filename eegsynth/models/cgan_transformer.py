"""Transformer CGAN: posture-conditioned transformer generator/discriminator.

A framework extra beyond the reference (whose CGAN is Conv1d-based,
CGAN/cgan.py:194-255, despite the README's "conditional transformer" claim,
README.md:5). This realizes the claimed architecture TPU-natively:

- **Generator** (DiT-style): the class one-hot and the noise vector feed a
  conditioning MLP; learned patch tokens (seq_len/patch of them) pass through
  pre-LN transformer blocks whose LayerNorm scale/shift/gate are produced per
  sample by zero-initialized adaLN heads ("adaLN-zero" — blocks start as
  identity), then a linear patch head → (B, C, T) → sigmoid, matching the conv
  generator's output contract (cgan.py:205-223).
- **Discriminator**: patch-embed → pre-LN transformer blocks → final LN →
  token-mean features, then the exact reference head math (cgan.py:237-252):
  score = sn_fc(f) + proj_scale·⟨f, embed(y)⟩ + std·minibatch_std, plus an
  ACGAN logits head; v2 adds Dropout(0.1) and fixed 0.1·std. Positional
  embeddings are sliced to the token count, so the same weights serve the
  global (T=768) and local-crop (T=256) discriminators.

Attention runs through ``eegsynth.nn.attention.mha`` — dense XLA softmax at the
default 96-token geometry, the Pallas flash-attention kernel for long-token
geometries or when forced via ``set_attention_impl("pallas")``.

The apply signatures mirror ``eegsynth.models.cgan`` exactly, so the trainers
(``eegsynth.train.cgan``) drive either architecture unchanged.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from eegsynth.models.cgan import CGANConfig
from eegsynth.nn.attention import mha
from eegsynth.nn.layers import dense_apply, torch_dense_init
from eegsynth.nn.spectral_norm import _l2_normalize


@dataclasses.dataclass(frozen=True)
class TransformerCGANConfig(CGANConfig):
    arch: str = "transformer"
    dim: int = 256              # token width (heads · 64 keeps MXU-friendly Dh)
    depth: int = 4
    heads: int = 4
    patch: int = 8              # samples per token → 768/8 = 96 tokens
    mlp_ratio: int = 4
    attn_impl: str | None = None  # None → module default ("auto")
    # Rematerialize the discriminator blocks (jax.checkpoint): the R1 penalty
    # double-differentiates the D trunk, and under vmapped weight sweeps the
    # per-point double-backward residuals of every block are what OOMs the
    # 16 GB HBM above 5 stacked points (round-3 limit). Numerics-identical
    # (same ops re-executed); off by default for the single-model trainers
    # where memory is not the constraint.
    remat: bool = False

    @property
    def tokens(self) -> int:
        return self.seq_len // self.patch


def _ln(x, eps=1e-6):
    """Parameter-free LayerNorm over the last axis (affine comes from adaLN
    in the generator; the discriminator adds learned affine on top)."""
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps)


def _zeros_dense(in_dim, out_dim, dtype):
    return {"w": jnp.zeros((out_dim, in_dim), dtype), "b": jnp.zeros((out_dim,), dtype)}


_dense = dense_apply   # same {w, b} torch layout as every dense in nn.layers


def _attn_init(key, dim, dtype):
    ks = jax.random.split(key, 4)
    return {n: torch_dense_init(ks[i], dim, dim, dtype)
            for i, n in enumerate(("wq", "wk", "wv", "wo"))}


def _attn_apply(p, x, heads: int, impl):
    b, l, dim = x.shape
    dh = dim // heads
    split = lambda y: y.reshape(b, l, heads, dh).transpose(0, 2, 1, 3)
    q, k, v = split(_dense(p["wq"], x)), split(_dense(p["wk"], x)), split(_dense(p["wv"], x))
    o = mha(q, k, v, impl=impl)
    o = o.transpose(0, 2, 1, 3).reshape(b, l, dim)
    return _dense(p["wo"], o)


def _mlp_init(key, dim, hidden, dtype):
    k1, k2 = jax.random.split(key)
    return {"fc1": torch_dense_init(k1, dim, hidden, dtype),
            "fc2": torch_dense_init(k2, hidden, dim, dtype)}


def _mlp_apply(p, x):
    return _dense(p["fc2"], jax.nn.gelu(_dense(p["fc1"], x)))


# ------------------------------ Generator ------------------------------

def generator_init(key: jax.Array, cfg: TransformerCGANConfig, dtype=jnp.float32):
    ks = jax.random.split(key, 4 + 3 * cfg.depth)
    dim, hidden = cfg.dim, cfg.dim * cfg.mlp_ratio
    params = {
        "cond1": torch_dense_init(ks[0], cfg.noise_dim + cfg.num_classes, dim, dtype),
        "cond2": torch_dense_init(ks[1], dim, dim, dtype),
        "tok": 0.02 * jax.random.normal(ks[2], (cfg.tokens, dim), dtype),
        "head_ada": _zeros_dense(dim, 2 * dim, dtype),      # adaLN-zero
        # NOT zero-init: an exactly-constant initial output puts the spectral
        # structure losses (coherence: |A·conj(B)|/√(|A|²|B|²)) on the
        # zero-spectrum point where their gradients are NaN
        "head_out": torch_dense_init(ks[3], dim, cfg.patch * cfg.channels, dtype),
    }
    for i in range(cfg.depth):
        params[f"blk{i}"] = {
            "attn": _attn_init(ks[4 + 3 * i], dim, dtype),
            "mlp": _mlp_init(ks[5 + 3 * i], dim, hidden, dtype),
            "ada": _zeros_dense(dim, 6 * dim, dtype),        # adaLN-zero
        }
    return params, {}      # no running stats (BN-free by construction)


def generator_apply(params, state, z: jax.Array, labels: jax.Array,
                    cfg: TransformerCGANConfig, train: bool = True):
    """(z (B,noise), labels (B,)) → (x (B,C,T) in (0,1), state) — same contract
    as the conv generator (models/cgan.py:66-83)."""
    del train  # no batch statistics
    z = z.astype(params["tok"].dtype)
    oh = jax.nn.one_hot(labels, cfg.num_classes, dtype=z.dtype)
    c = _dense(params["cond2"], jax.nn.silu(_dense(params["cond1"],
                                                   jnp.concatenate([z, oh], 1))))
    c = jax.nn.silu(c)                                       # (B, dim)
    x = jnp.broadcast_to(params["tok"][None], (z.shape[0],) + params["tok"].shape)
    for i in range(cfg.depth):
        blk = params[f"blk{i}"]
        mod = _dense(blk["ada"], c)[:, None, :]              # (B, 1, 6·dim)
        sh1, sc1, g1, sh2, sc2, g2 = jnp.split(mod, 6, axis=-1)
        h = _ln(x) * (1.0 + sc1) + sh1
        x = x + g1 * _attn_apply(blk["attn"], h, cfg.heads, cfg.attn_impl)
        h = _ln(x) * (1.0 + sc2) + sh2
        x = x + g2 * _mlp_apply(blk["mlp"], h)
    mod = _dense(params["head_ada"], c)[:, None, :]
    sh, sc = jnp.split(mod, 2, axis=-1)
    h = _ln(x) * (1.0 + sc) + sh
    y = _dense(params["head_out"], h)                        # (B, L, patch·C)
    b, l, _ = y.shape
    y = y.reshape(b, l * cfg.patch, cfg.channels).transpose(0, 2, 1)
    return jax.nn.sigmoid(y), state


# ---------------------------- Discriminator ----------------------------

def disc_init(key: jax.Array, cfg: TransformerCGANConfig, dtype=jnp.float32):
    ks = jax.random.split(key, 9 + 3 * cfg.depth)
    dim, hidden = cfg.dim, cfg.dim * cfg.mlp_ratio
    params = {
        "embed_in": torch_dense_init(ks[0], cfg.patch * cfg.channels, dim, dtype),
        "pos": 0.02 * jax.random.normal(ks[1], (cfg.tokens, dim), dtype),
        "ln_g": jnp.ones((dim,), dtype),
        "ln_b": jnp.zeros((dim,), dtype),
    }
    for i in range(cfg.depth):
        params[f"blk{i}"] = {
            "attn": _attn_init(ks[2 + 3 * i], dim, dtype),
            "mlp": _mlp_init(ks[3 + 3 * i], dim, hidden, dtype),
        }
    fc = torch_dense_init(ks[-5], dim, 1, dtype)
    fc["u"] = _l2_normalize(jax.random.normal(ks[-4], (1,), dtype))
    cls = torch_dense_init(ks[-3], dim, cfg.num_classes, dtype)
    cls["u"] = _l2_normalize(jax.random.normal(ks[-2], (cfg.num_classes,), dtype))
    params["fc"] = fc
    params["cls"] = cls
    params["embed"] = jax.random.normal(ks[-1], (cfg.num_classes, dim), dtype)
    params["std_weight"] = jnp.zeros((1,), dtype)
    return params


def disc_features(params, x: jax.Array, train: bool = True, *,
                  cfg: TransformerCGANConfig):
    """(B,C,T) → token-mean transformer features (B,dim). Params pass through
    unchanged (no power iteration in the trunk)."""
    del train
    b, c, t = x.shape
    assert t % cfg.patch == 0, (t, cfg.patch)
    l = t // cfg.patch
    h = x.astype(params["pos"].dtype).transpose(0, 2, 1)     # (B, T, C)
    h = h.reshape(b, l, cfg.patch * c)
    h = _dense(params["embed_in"], h) + params["pos"][None, :l]

    def block(blk, h):
        # Discriminator attention pins the XLA path: the R1 penalty
        # differentiates the D twice and the flash kernel's custom VJP is
        # first-order only (same rationale as the GRU discriminator,
        # README "TPU-first design notes"). D sees ≤96 tokens, where dense
        # is the faster path anyway.
        h = h + _attn_apply(blk["attn"], _ln(h), cfg.heads, "xla")
        h = h + _mlp_apply(blk["mlp"], _ln(h))
        return h

    if cfg.remat:
        block = jax.checkpoint(block)
    for i in range(cfg.depth):
        h = block(params[f"blk{i}"], h)
    h = _ln(h) * params["ln_g"] + params["ln_b"]
    return jnp.mean(h, axis=1), params


def disc_apply(params, x: jax.Array, labels: jax.Array,
               cfg: TransformerCGANConfig, train: bool = True,
               dropout_key: jax.Array | None = None):
    """→ (score (B,1), acgan logits (B,K), features (B,dim), updated params) —
    the head IS the conv discriminator's (models/cgan.py disc_head); only the
    trunk differs."""
    from eegsynth.models.cgan import disc_head

    f, _ = disc_features(params, x, train=train, cfg=cfg)
    score, logits, f_used, u_fc, u_cls = disc_head(params, f, labels, cfg,
                                                   train, dropout_key)
    new = dict(params)
    new["fc"] = {**params["fc"], "u": u_fc}
    new["cls"] = {**params["cls"], "u": u_cls}
    return score, logits, f_used, new
