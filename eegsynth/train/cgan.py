"""CGAN training loops — jitted epoch scans for both reference flavors.

- v1 (CGAN/cgan.py:335-515): one model per condition, posture-conditional
  (9 classes), balanced posture sampling, hinge + ACGAN + R1(every 8) +
  DiffAugment + feature matching + posture-conditional PSD/coh/cov, EMA,
  TTUR Adam, per-epoch diagnostics → metrics.csv, checkpoint/best/last saves.
- v2/v3 (cgan_v2.py:253-364): one model per posture, condition-conditional
  (2 classes), 50/50 condition sampling, fixed first-256 local crop, 24
  random coherence pairs, amplitude calibration, pre-warm epochs where G
  trains on structure/FM/amp only.

TPU design: one device dispatch per epoch — a `lax.scan` over steps carrying
(G, BN state, Dg, Dl, EMA, both optimizer states, PRNG). Balanced sampling
runs on device from a padded per-class index table. The reference's AMP-on-D
(cgan.py:351,399-426) maps to ``precision_d="bf16"``: bf16 conv trunks on the
D update with f32 master weights/power-iteration/head — no GradScaler needed
on TPU since bf16 keeps f32's exponent range. Default stays f32.
Deviation noted: best-EMA saves include the live generator's BN running stats
(the reference snapshots stale initial buffers into its EMA copy).
"""

from __future__ import annotations

import dataclasses
import functools
import json
import os
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import optax

from eegsynth.data.datasets import (
    build_label_table, load_condition_dataset, load_posture_both_conditions,
)
from eegsynth.losses.augment import diffaugment_1d
from eegsynth.losses.gan import (
    amp_calib_loss, cross_entropy, d_bce, d_hinge, d_wgan, feature_matching,
    g_bce, g_hinge, g_wgan, gradient_penalty,
)
from eegsynth.losses.spectral import (
    coh_loss_random, cov_loss, log_psd_loss, posture_conditional_losses,
    psd_loss,
)
from eegsynth.models import cgan as _conv_model
from eegsynth.models import cgan_transformer as _tf_model
from eegsynth.models.cgan import CGANConfig
from eegsynth.models.cgan_transformer import TransformerCGANConfig
from eegsynth.train import checkpoint as ckpt_io
from eegsynth.train.sharding import constrain_batch, is_coordinator

NUM_POSTURES = 9


# Both architectures (conv = reference parity, transformer = framework extra)
# share the apply contracts, so the training loop below is arch-agnostic.

def _model(cfg):
    return _tf_model if getattr(cfg, "arch", "conv") == "transformer" else _conv_model


def generator_init(key, cfg, dtype=jnp.float32):
    return _model(cfg).generator_init(key, cfg, dtype)


def generator_apply(G, bn, z, labels, cfg, train=True):
    return _model(cfg).generator_apply(G, bn, z, labels, cfg, train=train)


def disc_init(key, cfg, dtype=jnp.float32):
    return _model(cfg).disc_init(key, cfg, dtype)


def disc_apply(params, x, labels, cfg, train=True, dropout_key=None,
               compute_dtype=None):
    m = _model(cfg)
    if m is _tf_model:
        # transformer D keeps f32 (its LayerNorms want full precision, the
        # same ops torch autocast pins to fp32); callers gate precision_d
        return m.disc_apply(params, x, labels, cfg, train=train,
                            dropout_key=dropout_key)
    return m.disc_apply(params, x, labels, cfg, train=train,
                        dropout_key=dropout_key, compute_dtype=compute_dtype)


def disc_features(params, x, cfg, train=True):
    m = _model(cfg)
    if m is _tf_model:
        return m.disc_features(params, x, train=train, cfg=cfg)
    return m.disc_features(params, x, train=train)


def _copy_u(dst, src):
    """Write advanced spectral-norm power-iteration vectors ("u" leaves) from
    src back into dst after an optimizer update (u is state, not a weight)."""
    def pick(path, d, s):
        return s if getattr(path[-1], "key", None) == "u" else d
    return jax.tree_util.tree_map_with_path(pick, dst, src)


@dataclasses.dataclass(frozen=True)
class CGANHParams:
    """v1 defaults = cgan.py:34-102; v2 overrides noted inline."""
    epochs: int = 800            # v2: 600
    prewarm: int = 0             # v2: 5
    batch_size: int = 64
    noise_dim: int = 100
    lr_g: float = 3e-4           # v2: 6e-4
    lr_d: float = 1e-4           # v2: 8e-5
    beta1: float = 0.5
    beta2: float = 0.999
    d_steps: int = 1
    proj_scale: float = 0.25     # v2: 0.10
    acgan_weight: float = 1.5    # v2: 1.25
    g_acgan_weight: float = 2.0  # v2: 1.5
    # None → auto: 0.5 (reference cgan.py:63 default, hinge/bce) but 0.0 for
    # wgan-gp — GP already regularizes the critic's gradient norm toward 1,
    # and composing it with R1 (norm toward 0 at real data) gives the critic
    # two contradictory targets. An explicit value always wins.
    r1_gamma: float | None = None
    r1_every: int = 8
    inst_noise_start: float = 0.20
    inst_noise_end: float = 0.02  # v2: 0.06
    use_diffaugment: bool = True
    diffaugment_p: float = 0.25  # v2: 0.5
    psd_weight: float = 0.5      # v2: 0.3
    coh_weight: float = 0.25     # v2: 0.8
    cov_weight: float = 0.25     # v2: 0.3
    amp_weight: float = 0.0      # v2: 0.5
    coh_pairs: int = 24
    local_crop: int = 256
    fm_weight: float = 15.0      # v2: 50.0
    # log-domain PSD matching (framework extra, losses/spectral.py
    # log_psd_loss): targets the evaluation's log-PSD LogReg features, which
    # the linear psd_weight cannot move (round-4 diagnosis). 0 = off
    # (reference-parity default; the graph is unchanged).
    log_psd_weight: float = 0.0
    ema: bool = True
    ema_decay: float = 0.999
    lr_decay: float = 1.0
    lr_decay_step: int = 200
    save_every: int = 100
    print_every: int = 20
    epochs_per_dispatch: int = 25  # epochs fused per device dispatch (TPU extra)
    # full-state resume checkpoints: "orbax" (default; async saves hide the
    # seconds-long device->host pull) | "npz" (reference-artifact parity,
    # always synchronous). async_ckpt=None means "async iff orbax".
    ckpt_format: str = "orbax"
    async_ckpt: bool | None = None
    seed: int = 42
    variant: str = "v1"          # "v1" | "v2"
    arch: str = "conv"           # "conv" (reference parity) | "transformer" extra
    gan_loss: str = "hinge"      # "hinge" (reference) | "bce" | "wgan-gp"
    gp_weight: float = 10.0      # wgan-gp only (the reference's --gp-weight)
    tf_dim: int = 256            # transformer-arch shape knobs
    tf_depth: int = 4
    tf_heads: int = 4
    tf_patch: int = 8
    # remat the transformer D blocks (models/cgan_transformer.py: R1's
    # double-backward residuals are the vmapped-sweep HBM limit)
    tf_remat: bool = False
    # "bf16" runs the D-step conv trunks in bfloat16 (f32 master weights,
    # f32 power iteration/head/losses) — the TPU analogue of the reference's
    # AMP-on-D (cgan.py:351,399-426). R1 and the G step stay f32, exactly as
    # the reference forces fp32 there (cgan.py:422-426 and the fp32 G step).
    precision_d: str = "f32"     # "f32" | "bf16"

    def __post_init__(self):
        if self.r1_gamma is None:
            object.__setattr__(
                self, "r1_gamma",
                0.0 if self.gan_loss == "wgan-gp" else 0.5)
        if self.precision_d not in ("f32", "bf16"):
            raise ValueError(f"precision_d must be 'f32' or 'bf16', "
                             f"got {self.precision_d!r}")
        if self.precision_d == "bf16" and self.arch == "transformer":
            raise ValueError("precision_d='bf16' applies to the conv "
                             "discriminators only (the transformer D keeps "
                             "f32 LayerNorms)")


# G-step loss weights that may be swept as TRACED scalars through one
# executable (train/cgan_sweep.py). Order defines the sweep vector layout.
G_WEIGHT_NAMES = ("fm_weight", "psd_weight", "coh_weight", "cov_weight",
                  "amp_weight", "g_acgan_weight", "log_psd_weight")


V2_OVERRIDES = dict(epochs=600, prewarm=5, lr_g=6e-4, lr_d=8e-5, proj_scale=0.10,
                    acgan_weight=1.25, g_acgan_weight=1.5, inst_noise_end=0.06,
                    diffaugment_p=0.5, psd_weight=0.3, coh_weight=0.8,
                    cov_weight=0.3, amp_weight=0.5, fm_weight=50.0, variant="v2")


def sigma_at(hp: CGANHParams, total_epochs: int, e: int) -> float:
    """Linear instance-noise schedule (cgan.py:386-387)."""
    t = e / max(1, total_epochs - 1)
    return (1 - t) * hp.inst_noise_start + t * hp.inst_noise_end


def make_lr(hp: CGANHParams, updates_per_epoch: int, base: float,
            epoch_offset: int = 0):
    """torch StepLR stepped once per epoch (cgan.py:348-349,476), expressed
    over the optax update count. ``updates_per_epoch`` is THIS optimizer's
    updates per epoch — D takes ``d_steps`` updates per step while G takes
    one — and ``epoch_offset`` accounts for epochs with zero updates (the v2
    prewarm skips D entirely), so the per-epoch decay boundary lands on the
    same epoch for both optimizers as the reference's paired schG/schD."""
    if hp.lr_decay >= 1.0:
        return base
    return lambda count: base * hp.lr_decay ** (
        ((count // updates_per_epoch) + epoch_offset) // hp.lr_decay_step)


def generator_meta(hp: CGANHParams, num_classes: int, tag: str) -> dict:
    """Checkpoint meta sufficient to rebuild the generator (load_generator)."""
    meta = {"tag": tag, "variant": hp.variant, "num_classes": num_classes,
            "noise_dim": hp.noise_dim, "arch": hp.arch,
            "proj_scale": hp.proj_scale}
    if hp.arch == "transformer":
        meta.update(tf_dim=hp.tf_dim, tf_depth=hp.tf_depth,
                    tf_heads=hp.tf_heads, tf_patch=hp.tf_patch)
    return meta


def _sample_balanced(key, X, y, table, counts, batch: int, variant: str):
    """On-device balanced batch. v1: uniform class then uniform row within class
    (cgan.py:143-148). v2: half/half over 2 conditions (cgan_v2.py:106-113).
    Returns (real (B,C,T), labels (B,) int32 in 0..K-1)."""
    k1, k2, k3 = jax.random.split(key, 3)
    K = table.shape[0]
    if variant == "v1":
        lab = jax.random.randint(k1, (batch,), 0, K)
    else:
        half = batch // 2
        lab = jnp.concatenate([jnp.zeros(half, jnp.int32),
                               jnp.ones(batch - half, jnp.int32)])
        lab = jax.random.permutation(k3, lab)
    u = jax.random.uniform(k2, (batch,))
    offs = jnp.floor(u * counts[lab]).astype(jnp.int32)
    idx = table[lab, offs]
    return X[idx], lab


def _crop(key, x, L: int, variant: str):
    """Local-D input: v1 random crop (cgan.py:150-154), v2 fixed first L
    (cgan_v2.py:301)."""
    T = x.shape[2]
    L = min(L, T)
    if variant == "v2" or T == L:
        return x[:, :, :L]
    start = jax.random.randint(key, (), 0, T - L + 1)
    return jax.lax.dynamic_slice_in_dim(x, start, L, axis=2)


def _make_epoch_core(cfg: CGANConfig, hp: CGANHParams, optG, optD,
                     steps_per_epoch: int, prewarm: bool, mesh=None):
    """One (unjitted) epoch: scan over steps_per_epoch (D step then G step).
    With a mesh, batch-major tensors are sharded over the ``data`` axis and
    GSPMD inserts the gradient all-reduce (params stay replicated)."""
    B = hp.batch_size
    # adversarial objective: hinge is the reference's (only) implementation;
    # bce / wgan-gp honor the reference's advertised-but-unimplemented --loss
    # modes (cgan.py:48,258-261)
    d_advs = {"hinge": d_hinge, "bce": d_bce, "wgan-gp": d_wgan}
    g_advs = {"hinge": g_hinge, "bce": g_bce, "wgan-gp": g_wgan}
    if hp.gan_loss not in d_advs:
        raise ValueError(f"gan_loss must be one of {sorted(d_advs)}, "
                         f"got {hp.gan_loss!r}")
    d_adv, g_adv = d_advs[hp.gan_loss], g_advs[hp.gan_loss]
    # bf16 conv trunks on the D update only (reference AMP-on-D analogue);
    # R1 / GP / the whole G step stay f32 like the reference's fp32 forcing.
    d_cd = jnp.bfloat16 if hp.precision_d == "bf16" else None

    def r1_penalty(d_params, x_in, labels):
        def score_sum(xx):
            return jnp.sum(disc_apply(d_params, xx, labels, cfg, train=False)[0])
        g = jax.grad(score_sum)(x_in)
        return 0.5 * jnp.mean(jnp.sum(g.reshape(g.shape[0], -1) ** 2, axis=1))

    def one_step(carry, step_idx, w):
        (G, bn, D, ema, g_state, d_state, X, y_tab, sigma, key) = carry
        table, counts = y_tab
        key, *ks = jax.random.split(key, 21)  # ks[0..11] D step, ks[12..19] G step

        diag = jnp.zeros((8,))
        d_loss_out = jnp.float32(0.0)

        if not prewarm:
            def d_update(G, bn, D, d_state, kd):
                real, labels = _sample_balanced(kd[0], X, None, table, counts, B, hp.variant)
                real = constrain_batch(real, mesh)
                z = constrain_batch(jax.random.normal(kd[1], (B, hp.noise_dim),
                                                      jnp.float32), mesh)
                fake, bn = generator_apply(G, bn, z, labels, cfg, train=True)
                fake = jax.lax.stop_gradient(fake)

                real_in = jnp.clip(real + sigma * jax.random.normal(kd[2], real.shape, real.dtype), 0, 1)
                fake_in = jnp.clip(fake + sigma * jax.random.normal(kd[3], fake.shape, fake.dtype), 0, 1)
                if hp.use_diffaugment:
                    real_in = diffaugment_1d(kd[4], real_in, hp.diffaugment_p)
                    fake_in = diffaugment_1d(kd[5], fake_in, hp.diffaugment_p)
                real_loc = _crop(kd[6], real_in, hp.local_crop, hp.variant)
                fake_loc = _crop(kd[7], fake_in, hp.local_crop, hp.variant)
                do_r1 = (step_idx % max(1, hp.r1_every)) == 0

                def d_loss_fn(D):
                    rs_g, rlog_g, _, Dg1 = disc_apply(D["dg"], real_in, labels, cfg,
                                                      train=True, dropout_key=kd[8],
                                                      compute_dtype=d_cd)
                    fs_g, flog_g, _, Dg2 = disc_apply(Dg1, fake_in, labels, cfg,
                                                      train=True, dropout_key=kd[9],
                                                      compute_dtype=d_cd)
                    rs_l, rlog_l, _, Dl1 = disc_apply(D["dl"], real_loc, labels, cfg,
                                                      train=True, dropout_key=kd[10],
                                                      compute_dtype=d_cd)
                    fs_l, flog_l, _, Dl2 = disc_apply(Dl1, fake_loc, labels, cfg,
                                                      train=True, dropout_key=kd[11],
                                                      compute_dtype=d_cd)
                    loss = (d_adv(rs_g, fs_g) + d_adv(rs_l, fs_l)
                            + hp.acgan_weight * (cross_entropy(rlog_g, labels)
                                                 + cross_entropy(rlog_l, labels)))
                    if hp.gan_loss == "wgan-gp" and hp.gp_weight > 0:
                        # per-step two-sided GP on both critics; keys are
                        # fold_in-derived so the default hinge RNG stream is
                        # untouched (tags chosen far outside split indices)
                        gp = (gradient_penalty(
                                  lambda xx: disc_apply(D["dg"], xx, labels,
                                                        cfg, train=False)[0],
                                  jax.random.fold_in(kd[2], 0x47500001),
                                  real_in, fake_in)
                              + gradient_penalty(
                                  lambda xx: disc_apply(D["dl"], xx, labels,
                                                        cfg, train=False)[0],
                                  jax.random.fold_in(kd[3], 0x47500002),
                                  real_loc, fake_loc))
                        loss = loss + hp.gp_weight * gp
                    if hp.r1_gamma > 0:
                        r1 = jax.lax.cond(
                            do_r1,
                            lambda: r1_penalty(D["dg"], real_in, labels)
                            + r1_penalty(D["dl"], real_loc, labels),
                            lambda: jnp.float32(0.0))
                        loss = loss + hp.r1_gamma * r1
                    diag = jnp.stack([
                        jnp.mean((rs_g > 0).astype(jnp.float32)),
                        jnp.mean((fs_g < 0).astype(jnp.float32)),
                        jnp.mean((rs_l > 0).astype(jnp.float32)),
                        jnp.mean((fs_l < 0).astype(jnp.float32)),
                        jnp.mean((jnp.argmax(rlog_g, 1) == labels).astype(jnp.float32)),
                        jnp.mean((jnp.argmax(flog_g, 1) == labels).astype(jnp.float32)),
                        jnp.mean((jnp.argmax(rlog_l, 1) == labels).astype(jnp.float32)),
                        jnp.mean((jnp.argmax(flog_l, 1) == labels).astype(jnp.float32)),
                    ])
                    u_new = {"dg": Dg2, "dl": Dl2}
                    return loss, (diag, u_new)

                (d_loss, (diag, u_new)), d_grads = jax.value_and_grad(
                    d_loss_fn, has_aux=True)(D)
                d_updates, d_state = optD.update(d_grads, d_state, D)
                D = optax.apply_updates(D, d_updates)
                D = _copy_u(D, u_new)  # advanced power-iteration vectors
                return bn, D, d_state, d_loss, diag

            # Reference runs d_steps D updates per G update (cgan.py:396);
            # iteration 0 consumes ks[0..11] so d_steps=1 keeps the original
            # key stream, extras draw fresh keys.
            bn, D, d_state, d_loss_out, diag = d_update(G, bn, D, d_state, ks[0:12])
            for _ in range(1, max(1, hp.d_steps)):
                key, sub = jax.random.split(key)
                bn, D, d_state, d_loss_out, diag = d_update(
                    G, bn, D, d_state, list(jax.random.split(sub, 12)))

        # ---------------- G step (fp32, cgan.py:445-474) ----------------
        real_g, labels_g = _sample_balanced(ks[12], X, None, table, counts, B, hp.variant)
        real_g = constrain_batch(real_g, mesh)
        z2 = constrain_batch(jax.random.normal(ks[13], (B, hp.noise_dim),
                                               jnp.float32), mesh)

        def g_loss_fn(G):
            fake2, bn_new = generator_apply(G, bn, z2, labels_g, cfg, train=True)
            fake2_in = jnp.clip(fake2 + sigma * jax.random.normal(ks[14], fake2.shape, fake2.dtype), 0, 1)
            if hp.use_diffaugment:
                fake2_in = diffaugment_1d(ks[15], fake2_in, hp.diffaugment_p)
            gs_g, glog_g, ffeat, Dg1 = disc_apply(D["dg"], fake2_in, labels_g, cfg,
                                                  train=True, dropout_key=ks[17])
            fake2_loc = _crop(ks[16], fake2_in, hp.local_crop, hp.variant)
            gs_l, glog_l, _, Dl1 = disc_apply(D["dl"], fake2_loc, labels_g, cfg,
                                              train=True, dropout_key=ks[18])
            loss = jnp.float32(0.0)
            if not prewarm:
                loss = (g_adv(gs_g) + g_adv(gs_l)
                        + w["g_acgan_weight"] * (cross_entropy(glog_g, labels_g)
                                                 + cross_entropy(glog_l, labels_g)))
            rfeat, _ = disc_features(D["dg"], real_g, cfg, train=False)
            loss = loss + w["fm_weight"] * feature_matching(ffeat, rfeat)
            if hp.variant == "v1":
                loss = loss + posture_conditional_losses(
                    real_g, fake2, labels_g, cfg.num_classes,
                    w["psd_weight"], w["coh_weight"], w["cov_weight"],
                    w["log_psd_weight"])
            else:
                loss = loss + w["psd_weight"] * psd_loss(real_g, fake2)
                loss = loss + w["coh_weight"] * coh_loss_random(ks[19], real_g, fake2,
                                                                hp.coh_pairs)
                loss = loss + w["cov_weight"] * cov_loss(real_g, fake2)
                loss = loss + w["amp_weight"] * amp_calib_loss(real_g, fake2)
                if (isinstance(w["log_psd_weight"], jax.Array)
                        or w["log_psd_weight"] > 0):
                    loss = loss + w["log_psd_weight"] * log_psd_loss(real_g, fake2)
            return loss, (bn_new, {"dg": Dg1, "dl": Dl1})

        (g_loss_out, (bn, u_new2)), g_grads = jax.value_and_grad(
            g_loss_fn, has_aux=True)(G)
        g_updates, g_state = optG.update(g_grads, g_state, G)
        G = optax.apply_updates(G, g_updates)
        D = _copy_u(D, u_new2)

        if hp.ema:
            ema = jax.tree_util.tree_map(
                lambda e, g: hp.ema_decay * e + (1.0 - hp.ema_decay) * g, ema, G)

        return (G, bn, D, ema, g_state, d_state, X, y_tab, sigma, key), \
            jnp.concatenate([diag, jnp.stack([g_loss_out, d_loss_out])])

    def epoch_core(G, bn, D, ema, g_state, d_state, X, table, counts, sigma, key,
                   weights=None):
        # weights: optional (len(G_WEIGHT_NAMES),) vector of TRACED G-step loss
        # weights (sweep path). None → hp's static floats, bit-identical to the
        # pre-sweep trainer (zero weights still prune their loss components).
        if weights is None:
            w = {n: getattr(hp, n) for n in G_WEIGHT_NAMES}
        else:
            w = dict(zip(G_WEIGHT_NAMES, weights))
        carry = (G, bn, D, ema, g_state, d_state, X, (table, counts), sigma, key)
        carry, logs = jax.lax.scan(lambda c, s: one_step(c, s, w), carry,
                                   jnp.arange(steps_per_epoch, dtype=jnp.int32))
        (G, bn, D, ema, g_state, d_state, _, _, _, _) = carry
        return G, bn, D, ema, g_state, d_state, logs

    return epoch_core


def make_cgan_epoch(cfg: CGANConfig, hp: CGANHParams, optG, optD,
                    steps_per_epoch: int, prewarm: bool, mesh=None):
    """One jitted epoch (kept for tests / external callers)."""
    return jax.jit(_make_epoch_core(cfg, hp, optG, optD, steps_per_epoch,
                                    prewarm, mesh))


def make_cgan_chunk(cfg: CGANConfig, hp: CGANHParams, optG, optD,
                    steps_per_epoch: int, prewarm: bool, mesh=None):
    """K epochs per device dispatch with ON-DEVICE best tracking.

    Through the remote TPU attachment a device→host pull of fresh arrays costs
    seconds, so the reference's per-epoch best-snapshot + CSV row
    (cgan.py:490-512) would dominate wall-clock. This scans K epochs in one
    dispatch, carrying {best G-loss, best (EMA-)G/bn/Dg/Dl} updated with
    `where`-selects, and returns per-epoch logs (K, steps, 10) for one fetch.
    """
    core = _make_epoch_core(cfg, hp, optG, optD, steps_per_epoch, prewarm, mesh)

    @jax.jit
    def chunk_fn(G, bn, D, ema, g_state, d_state, best, X, table, counts,
                 sigmas, keys):
        def body(carry, xs):
            (G, bn, D, ema, g_state, d_state, best) = carry
            sigma, key = xs
            G, bn, D, ema, g_state, d_state, logs = core(
                G, bn, D, ema, g_state, d_state, X, table, counts, sigma, key)
            if not prewarm:   # reference tracks best only in adversarial epochs
                g_loss = logs[-1, 8]
                imp = jnp.logical_and(jnp.isfinite(g_loss), g_loss < best["loss"])
                snap = {"G": ema if hp.ema else G, "bn": bn,
                        "dg": D["dg"], "dl": D["dl"]}
                sel = jax.tree_util.tree_map(
                    lambda n, o: jnp.where(imp, n, o),
                    snap, {k: best[k] for k in snap})
                best = {"loss": jnp.where(imp, g_loss, best["loss"]), **sel}
            return (G, bn, D, ema, g_state, d_state, best), logs

        carry, logs = jax.lax.scan(
            body, (G, bn, D, ema, g_state, d_state, best), (sigmas, keys))
        return carry, logs

    return chunk_fn


# ------------------------------------------------------------------
# Drivers
# ------------------------------------------------------------------

METRICS_HEADER_V1 = ("epoch,g_loss,d_loss,d_g_real_acc,d_g_fake_acc,d_l_real_acc,"
                     "d_l_fake_acc,acgan_real_global,acgan_fake_global,"
                     "acgan_real_local,acgan_fake_local\n")
METRICS_HEADER_V2 = ("epoch,g_loss,d_loss,Dg_R,Dg_F,Dl_R,Dl_F,ACg_R,ACg_F,ACl_R,ACl_F\n")


def _train_cgan(X_np, y_np, cfg: CGANConfig, hp: CGANHParams, save_dir: Path,
                tag: str, label_base: int, resume: str = "", log=print,
                mesh=None) -> dict:
    """Shared driver: tag is '{condition}' (v1) or 'posture{p}' (v2)."""
    if hp.ckpt_format not in ("npz", "orbax"):
        raise ValueError(f"ckpt_format must be 'npz' or 'orbax', got {hp.ckpt_format!r}")
    if hp.async_ckpt and hp.ckpt_format != "orbax":
        raise ValueError("async_ckpt requires ckpt_format='orbax'")
    async_save = (hp.ckpt_format == "orbax" if hp.async_ckpt is None
                  else hp.async_ckpt)
    # Only the full-state resume checkpoints switch format: every
    # generator/discriminator artifact keeps its reference-contract NPZ name
    # (eval/serving/generate load those by name). The full state is the big
    # pull (157 MB for the transformer arch — BASELINE.md: checkpoint pulls
    # dominate short-run wall), and its only consumer is --resume, which
    # auto-detects the format from the path suffix.
    ckpt_ext = ".npz" if hp.ckpt_format == "npz" else ".orbax"
    write_artifacts = is_coordinator()  # multi-host: coordinator writes only
    save_dir.mkdir(parents=True, exist_ok=True)
    if write_artifacts:
        with open(save_dir / "hparams.json", "w") as f:
            json.dump({**dataclasses.asdict(hp), "tag": tag}, f, indent=2)

    key = jax.random.key(hp.seed)
    kG, kDg, kDl, key = jax.random.split(key, 4)
    G, bn = generator_init(kG, cfg)
    D = {"dg": disc_init(kDg, cfg), "dl": disc_init(kDl, cfg)}
    ema = jax.tree_util.tree_map(lambda a: a, G)

    steps = max(1, X_np.shape[0] // hp.batch_size)

    optG = optax.adam(make_lr(hp, steps, hp.lr_g), b1=hp.beta1, b2=hp.beta2)
    optD = optax.adam(make_lr(hp, steps * max(1, hp.d_steps), hp.lr_d,
                              epoch_offset=hp.prewarm),
                      b1=hp.beta1, b2=hp.beta2)
    g_state = optG.init(G)
    d_state = optD.init(D)

    start_epoch = 0
    best_g = float("inf")
    if resume:
        trees, meta = ckpt_io.load_checkpoint(resume, {
            "G": G, "bn": bn, "D": D, "ema": ema, "optG": g_state, "optD": d_state})
        G, bn, D, ema = trees["G"], trees["bn"], trees["D"], trees["ema"]
        g_state, d_state = trees["optG"], trees["optD"]
        start_epoch = int(meta.get("epoch", 0))
        # "best_g" is the historical best (reference restores `best`,
        # cgan.py:372-378); legacy checkpoints only stored the last-epoch
        # g_loss — fall back to that rather than letting flush_best overwrite
        # the best generator with a worse one.
        best_g = float(meta.get("best_g", meta.get("g_loss", best_g)))
        # Advance the RNG stream past the consumed epochs (same fix as the
        # timegan trainer): without this a resumed run replays the exact
        # balanced-batch/noise/label draws of epochs 0..start_epoch. High tag
        # keeps the fold clear of split indices (fold_in(k,i)==split(k,n)[i]).
        key = jax.random.fold_in(key, 0x5EED0200 + start_epoch)
        log(f"[{tag}] Resumed from {resume} @ epoch {start_epoch}")

    table_np, counts_np = build_label_table(y_np, cfg.num_classes, label_base)
    X = jnp.asarray(X_np)
    table = jnp.asarray(table_np)
    counts = jnp.asarray(counts_np, dtype=jnp.float32)

    total_epochs = hp.prewarm + hp.epochs
    log(f"[{tag}] Training {total_epochs} epochs, steps/epoch ≈ {steps}")

    metrics_csv = save_dir / "metrics.csv" if write_artifacts else Path(os.devnull)
    if write_artifacts and not metrics_csv.exists():
        metrics_csv.write_text(METRICS_HEADER_V2 if hp.variant == "v2"
                               else METRICS_HEADER_V1)

    chunk_fns = {
        False: make_cgan_chunk(cfg, hp, optG, optD, steps, prewarm=False, mesh=mesh),
        True: (make_cgan_chunk(cfg, hp, optG, optD, steps, prewarm=True, mesh=mesh)
               if hp.prewarm > 0 else None),
    }

    def save_generator(path, params, bn_state):
        if not write_artifacts:
            return
        ckpt_io.save_checkpoint(path, {"model": params, "bn": bn_state},
                                generator_meta(hp, cfg.num_classes, tag))

    # Best artifacts live ON DEVICE inside the chunk carry (where-selected per
    # epoch) and are written to disk only at save_every boundaries and at the
    # end — device→host pulls through the remote TPU attachment cost seconds
    # per tree, so the reference's per-epoch best-write (cgan.py:508-512) and
    # even a per-epoch logs fetch would dominate the epoch.
    best = {"loss": jnp.float32(best_g), "G": ema if hp.ema else G, "bn": bn,
            "dg": D["dg"], "dl": D["dl"]}
    best_dirty = False

    def flush_best():
        nonlocal best_dirty
        if not best_dirty or not write_artifacts:
            return
        save_generator(save_dir / f"CGAN_generator_{tag}_best.npz",
                       best["G"], best["bn"])
        ckpt_io.save_checkpoint(save_dir / f"CGAN_globalD_{tag}_best.npz",
                                {"model": best["dg"]}, {"tag": tag})
        ckpt_io.save_checkpoint(save_dir / f"CGAN_localD_{tag}_best.npz",
                                {"model": best["dl"]}, {"tag": tag})
        best_dirty = False

    t0 = time.perf_counter()
    g_loss = d_loss = float("nan")
    # Dispatch pipeline: chunk k+1 is enqueued BEFORE chunk k's logs are
    # pulled, so the (already finished) log buffer transfers over the tunnel
    # while the device runs the next chunk, and the best-loss scalar is read
    # only at save boundaries. Per-chunk host syncs previously serialized one
    # tunnel round-trip per dispatch with device work (BASELINE.md: the same
    # sync-per-dispatch pattern capped a 435 steps/s computation at 34).
    pending = None   # (first epoch, k, device logs) of the last chunk

    def process_pending():
        nonlocal pending, g_loss, d_loss
        if pending is None:
            return
        ep0, k, dev_logs = pending
        pending = None
        logs = np.asarray(dev_logs)                  # (k, steps, 10) — one fetch
        for i in range(k):
            e = ep0 + i
            diag = logs[i, :, :8].mean(axis=0)
            g_loss, d_loss = float(logs[i, -1, 8]), float(logs[i, -1, 9])
            if (e + 1) % hp.print_every == 0 or e == 0:
                log(f"[{tag}] Ep {e+1}/{total_epochs} | D={d_loss:.4f} G={g_loss:.4f} | "
                    f"Dg(R/F)={diag[0]:.2f}/{diag[1]:.2f} Dl(R/F)={diag[2]:.2f}/{diag[3]:.2f} | "
                    f"ACGAN G(R/F)={diag[4]:.2f}/{diag[5]:.2f} L(R/F)={diag[6]:.2f}/{diag[7]:.2f}")
            with open(metrics_csv, "a") as f:
                f.write(f"{e+1},{g_loss},{d_loss},"
                        + ",".join(f"{v}" for v in diag) + "\n")

    def refresh_best():
        # One scalar pull; same result as the reference's per-epoch best
        # tracking because `best` is where-selected on device every epoch.
        nonlocal best_g, best_dirty
        new_best = float(best["loss"])
        if new_best < best_g:
            best_g = new_best
            best_dirty = True

    ep = start_epoch
    while ep < total_epochs:
        prewarm = ep < hp.prewarm
        bound = hp.prewarm if prewarm else total_epochs
        next_save = (ep // hp.save_every + 1) * hp.save_every
        k = min(bound, next_save, ep + max(1, hp.epochs_per_dispatch)) - ep
        sigmas = jnp.asarray([sigma_at(hp, total_epochs, e)
                              for e in range(ep, ep + k)], jnp.float32)
        key, sub = jax.random.split(key)
        keys = jax.random.split(sub, k)
        (G, bn, D, ema, g_state, d_state, best), logs = chunk_fns[prewarm](
            G, bn, D, ema, g_state, d_state, best, X, table, counts, sigmas, keys)
        process_pending()     # previous chunk's logs, overlapped with this one
        pending = (ep, k, logs)
        ep += k

        if ep % hp.save_every == 0:
            process_pending()
            refresh_best()
            if write_artifacts:
                ckpt_io.save_checkpoint(
                    save_dir / f"checkpoint_epoch{ep}{ckpt_ext}",
                    {"G": G, "bn": bn, "D": D, "ema": ema, "optG": g_state, "optD": d_state},
                    {"epoch": ep, "g_loss": g_loss, "d_loss": d_loss,
                     "best_g": best_g, "tag": tag},
                    async_save=async_save)
            save_generator(save_dir / f"CGAN_generator_{tag}_epoch{ep}.npz", G, bn)
            flush_best()

    process_pending()
    refresh_best()
    flush_best()
    save_generator(save_dir / f"CGAN_generator_{tag}_last.npz",
                   ema if hp.ema else G, bn)
    ckpt_io.wait_for_saves()  # join any in-flight async orbax save
    dt = time.perf_counter() - t0
    sps = (total_epochs - start_epoch) * steps / dt if dt > 0 else float("nan")
    log(f"[{tag}] Done. Best G loss: {best_g:.4f} ({sps:.2f} steps/s)")
    return {"best_g": best_g, "steps_per_sec": sps, "G": G, "bn": bn,
            "ema": ema, "D": D, "cfg": cfg}


def build_cfg(hp: CGANHParams, num_classes: int):
    """CGANConfig for hp.arch ("conv" parity model or transformer extra)."""
    if hp.arch == "transformer":
        return TransformerCGANConfig(
            noise_dim=hp.noise_dim, num_classes=num_classes,
            proj_scale=hp.proj_scale, variant=hp.variant, dim=hp.tf_dim,
            depth=hp.tf_depth, heads=hp.tf_heads, patch=hp.tf_patch,
            remat=hp.tf_remat)
    return CGANConfig(noise_dim=hp.noise_dim, num_classes=num_classes,
                      proj_scale=hp.proj_scale, variant=hp.variant)


def train_one_condition(data_dir, save_root, condition: str, log=print,
                        resume: str = "", mesh=None, **hparams) -> dict:
    """v1 entry (cgan.py:335-515): posture-conditional model for one condition."""
    hp = CGANHParams(**{"variant": "v1", **hparams})
    np.random.seed(hp.seed)
    X, y, meta = load_condition_dataset(data_dir, condition)
    cfg = build_cfg(hp, NUM_POSTURES)
    res = _train_cgan(X, y, cfg, hp, Path(save_root) / condition, condition,
                      label_base=1, resume=resume, log=log, mesh=mesh)
    res["meta"] = meta
    return res


def train_one_posture(data_dir, runs_root, posture: int, log=print, mesh=None,
                      **hparams) -> dict:
    """v2 entry (cgan_v2.py:253-364): condition-conditional model per posture."""
    hp = CGANHParams(**{**V2_OVERRIDES, **hparams, "variant": "v2"})
    np.random.seed(hp.seed)
    X, y, meta = load_posture_both_conditions(data_dir, posture)
    cfg = build_cfg(hp, 2)
    res = _train_cgan(X, y, cfg, hp, Path(runs_root) / f"posture{posture}",
                      f"posture{posture}", label_base=0, log=log, mesh=mesh)
    res["meta"] = meta
    return res


def load_generator(path, num_classes: int | None = None, variant: str = "v1"):
    """Rebuild a saved generator of either architecture from its meta.

    Arch/shape come from the checkpoint meta (older checkpoints without an
    "arch" key load as the conv parity model). Returns (params, bn, cfg, meta).
    """
    meta = ckpt_io.load_meta(path)
    var = str(meta.get("variant", variant))
    hp = CGANHParams(
        noise_dim=int(meta.get("noise_dim", 100)),
        variant=var,
        proj_scale=float(meta.get("proj_scale", 0.10 if var == "v2" else 0.25)),
        arch=str(meta.get("arch", "conv")),
        tf_dim=int(meta.get("tf_dim", 256)), tf_depth=int(meta.get("tf_depth", 4)),
        tf_heads=int(meta.get("tf_heads", 4)), tf_patch=int(meta.get("tf_patch", 8)))
    cfg = build_cfg(hp, int(meta.get("num_classes", num_classes or NUM_POSTURES)))
    template, bn_t = generator_init(jax.random.key(0), cfg)
    trees, _ = ckpt_io.load_checkpoint(path, {"model": template, "bn": bn_t})
    return trees["model"], trees["bn"], cfg, meta


@functools.partial(jax.jit, static_argnames=("cfg", "m"))
def _generate_padded(G, bn, key, label, cfg: CGANConfig, m: int):
    z = jax.random.normal(key, (m, cfg.noise_dim))
    labels = jnp.full((m,), label, jnp.int32)
    x, _ = generator_apply(G, bn, z, labels, cfg, train=False)
    return x


def generate_batch(G, bn, cfg: CGANConfig, key, n: int, label: int):
    """n samples of one class from N(0,1) noise, eval-mode BN (cgan.py:531-535).

    Compiled: the batch pads up to the next power of two (≥64) so log-many
    executables serve every request size (eval "match"-count synthesis, viz,
    serving) instead of eager per-op dispatches — on the remote-attached TPU
    an eager generator forward costs dozens of round-trips. ``label`` is
    traced, so one executable covers all classes. Rows are independent in
    eval-mode BN (running stats), and the padded noise's leading rows equal
    the unpadded draw (row-major counter RNG), so outputs match the unpadded
    computation."""
    m = 64
    while m < n:
        m *= 2
    return _generate_padded(G, bn, key, jnp.int32(label), cfg, m)[:n]
