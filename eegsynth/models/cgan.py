"""Conditional GAN for EEG (14 × 768): upsampling conv generator + twin
projection-ACGAN discriminators.

Functional rebuild of the reference CGAN family:
- Generator (CGAN/cgan.py:205-223): Linear(noise+onehot → 512·24) → five
  (nearest×2 ▸ Conv1d k3 ▸ class-conditional BN ▸ ReLU) blocks
  512→256→128→64→32→16 over lengths 24→…→768 → Conv1d(16→14,k3) → Sigmoid.
- DiscBase (cgan.py:225-252, v2 cgan_v2.py:167-192): five spectral-norm
  Conv1d(k4,s2,p1) 14→32→…→512 with LeakyReLU(0.2), time-mean features,
  score = fc(f) + proj_scale·⟨f, embed(y)⟩ + std_term(minibatch-std),
  ACGAN logits head. Two flavors: v1 (9 posture classes, learned std_weight)
  and v2 (2 condition classes, fixed 0.1·std + Dropout(0.1)).

Batch-norm running stats and spectral-norm power-iteration vectors are explicit
state threaded through every apply (PyTorch hides both in module buffers/hooks).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from eegsynth.nn.conv import (
    conv1d_apply, conv1d_init, sn_conv1d_apply, sn_conv1d_init, upsample_nearest_2x,
)
from eegsynth.nn.layers import torch_dense_init
from eegsynth.nn.norm import cbn1d_apply, cbn1d_init, cbn1d_state_init
from eegsynth.nn.spectral_norm import _l2_normalize, spectral_normalize

GEN_CHANNELS = (512, 256, 128, 64, 32, 16)
DISC_CHANNELS = (32, 64, 128, 256, 512)


@dataclasses.dataclass(frozen=True)
class CGANConfig:
    noise_dim: int = 100
    num_classes: int = 9        # 9 postures (v1) or 2 conditions (v2/v3)
    channels: int = 14
    seq_len: int = 768
    init_len: int = 24
    proj_scale: float = 0.25    # v2 uses 0.10
    variant: str = "v1"         # "v1": learned std_weight; "v2": 0.1·std + dropout
    dropout: float = 0.1        # v2 feature dropout
    arch: str = "conv"          # "conv" (reference parity) | "transformer" extra


# ------------------------------ Generator ------------------------------

def generator_init(key: jax.Array, cfg: CGANConfig, dtype=jnp.float32):
    ks = jax.random.split(key, 8)
    params = {"proj": torch_dense_init(
        ks[0], cfg.noise_dim + cfg.num_classes, GEN_CHANNELS[0] * cfg.init_len, dtype)}
    state = {}
    for i in range(5):
        ci, co = GEN_CHANNELS[i], GEN_CHANNELS[i + 1]
        params[f"up{i+1}"] = {
            "conv": conv1d_init(ks[i + 1], ci, co, 3, dtype),
            "cbn": cbn1d_init(ks[i + 1], co, cfg.num_classes, dtype),
        }
        state[f"up{i+1}"] = cbn1d_state_init(co, dtype)
    params["to_out"] = conv1d_init(ks[6], GEN_CHANNELS[5], cfg.channels, 3, dtype)
    return params, state


def generator_apply(params, state, z: jax.Array, labels: jax.Array,
                    cfg: CGANConfig, train: bool = True):
    """(z (B,noise), labels (B,)) → (x (B,C,T) in (0,1), new_bn_state)."""
    z = z.astype(params["proj"]["w"].dtype)
    oh = jax.nn.one_hot(labels, cfg.num_classes, dtype=z.dtype)
    h = jnp.concatenate([z, oh], axis=1)
    h = h @ params["proj"]["w"].T + params["proj"]["b"]
    h = h.reshape(-1, GEN_CHANNELS[0], cfg.init_len)
    new_state = {}
    for i in range(5):
        blk = params[f"up{i+1}"]
        h = upsample_nearest_2x(h)
        h = conv1d_apply(blk["conv"], h, stride=1, padding=1)
        h, new_state[f"up{i+1}"] = cbn1d_apply(blk["cbn"], state[f"up{i+1}"],
                                               h, labels, train=train)
        h = jax.nn.relu(h)
    x = conv1d_apply(params["to_out"], h, stride=1, padding=1)
    return jax.nn.sigmoid(x), new_state


# ---------------------------- Discriminators ----------------------------

def disc_init(key: jax.Array, cfg: CGANConfig, dtype=jnp.float32):
    ks = jax.random.split(key, 10)
    chans = (cfg.channels,) + DISC_CHANNELS
    params = {}
    for i in range(5):
        params[f"c{i+1}"] = sn_conv1d_init(ks[i], chans[i], chans[i + 1], 4, dtype)
    feat = DISC_CHANNELS[-1]
    fc = torch_dense_init(ks[5], feat, 1, dtype)
    fc["u"] = _l2_normalize(jax.random.normal(ks[6], (1,), dtype))
    cls = torch_dense_init(ks[7], feat, cfg.num_classes, dtype)
    cls["u"] = _l2_normalize(jax.random.normal(ks[8], (cfg.num_classes,), dtype))
    params["fc"] = fc
    params["cls"] = cls
    params["embed"] = jax.random.normal(ks[9], (cfg.num_classes, feat), dtype)
    params["std_weight"] = jnp.zeros((1,), dtype)
    return params


def disc_features(params, x: jax.Array, train: bool = True, compute_dtype=None):
    """Five strided spectral-norm convs + LeakyReLU(0.2), time-mean pooled.
    Returns (f (B,512), updated conv params).

    ``compute_dtype=bfloat16`` runs the conv trunk in bf16 (the TPU analogue of
    the reference's AMP-on-D, CGAN/cgan.py:351,399-426) with f32 master params,
    f32 power iteration, and the pooled features cast back to the parameter
    dtype so the head/losses stay full precision."""
    new = dict(params)
    pdtype = params["c1"]["w"].dtype
    h = x.astype(compute_dtype if compute_dtype is not None else pdtype)
    for i in range(5):
        h, new[f"c{i+1}"] = sn_conv1d_apply(params[f"c{i+1}"], h, stride=2,
                                            padding=1, train=train,
                                            compute_dtype=compute_dtype)
        h = jax.nn.leaky_relu(h, 0.2)
    return jnp.mean(h.astype(pdtype), axis=2), new  # f32 pooling accumulation


def disc_head(params, f, labels: jax.Array, cfg, train: bool = True,
              dropout_key: jax.Array | None = None):
    """Projection-ACGAN discriminator head (cgan.py:244-252; v2 dropout +
    fixed 0.1·std, cgan_v2.py:180-190), shared by the conv and transformer
    trunks so the math cannot diverge. Returns
    (score (B,1), acgan logits (B,K), f_used, u_fc, u_cls)."""
    if cfg.variant == "v2" and train and cfg.dropout > 0:
        assert dropout_key is not None, "v2 discriminator needs a dropout key"
        keep = jax.random.bernoulli(dropout_key, 1.0 - cfg.dropout, f.shape)
        f_used = jnp.where(keep, f / (1.0 - cfg.dropout), 0.0)
    else:
        f_used = f

    std = jnp.sqrt(jnp.var(f_used, axis=0) + 1e-8)        # biased var, torch parity
    mb = jnp.mean(std)
    # one_hot matmul, not embed[labels]: traced-index gathers compile
    # pathologically slowly through the remote tunnel (CLAUDE.md rule); the
    # 0/1-weighted matmul selects the row bit-exactly for finite embeddings
    emb = jax.nn.one_hot(labels, params["embed"].shape[0],
                         dtype=params["embed"].dtype) @ params["embed"]
    proj = jnp.sum(f_used * emb, axis=1, keepdims=True)

    w_fc, u_fc = spectral_normalize(params["fc"]["w"], params["fc"]["u"], update=train)
    score = f_used @ w_fc.T + params["fc"]["b"]
    if cfg.variant == "v2":
        score = score + cfg.proj_scale * proj + 0.1 * mb
    else:
        score = score + cfg.proj_scale * proj + params["std_weight"] * mb

    w_cls, u_cls = spectral_normalize(params["cls"]["w"], params["cls"]["u"], update=train)
    logits = f_used @ w_cls.T + params["cls"]["b"]
    return score, logits, f_used, u_fc, u_cls


def disc_apply(params, x: jax.Array, labels: jax.Array, cfg: CGANConfig,
               train: bool = True, dropout_key: jax.Array | None = None,
               compute_dtype=None):
    """→ (score (B,1), acgan logits (B,K), features (B,512), updated params).
    ``compute_dtype``: see disc_features (bf16 trunk, full-precision head)."""
    f, new = disc_features(params, x, train=train, compute_dtype=compute_dtype)
    score, logits, f_used, u_fc, u_cls = disc_head(params, f, labels, cfg,
                                                   train, dropout_key)
    new["fc"] = {**params["fc"], "u": u_fc}
    new["cls"] = {**params["cls"], "u": u_cls}
    return score, logits, f_used, new
