"""Three-phase TimeGAN trainer — jit-compiled end-to-end, data-parallel ready.

Reference behavior being reproduced (timeGAN/train_timegan.py):
- Phase 1 autoencoder pretrain (:131-144): E+R joint Adam, 10·sqrt(MSE) recon
  loss, global-norm grad clip, epoch loss = sample-weighted mean.
- Phase 2 supervisor pretrain (:147-163): frozen encoder, next-step latent MSE.
- Phase 3 joint adversarial (:166-276, :365-413): D step (BCE with smoothed
  labels + instance noise + R1 on real latents + soft accuracy throttle) then
  G step (adv + α·sup + β·recon + γ_cov·cov + γ_acf·ACF), MultiStepLR halving
  at 50%/75%, per-step CSV log, ckpt_latest every 500 steps, ckpt_best by
  minimum G total, final synthetic.npz sized like the real bucket.

TPU-first design: each phase is a `lax.scan` over jitted steps — the GAN phase
runs in chunks of ``chunk`` steps per device dispatch, carrying params, both
optimizer states, the running best (exact best-step semantics on device), and
the PRNG key. Batches are drawn on device from the resident bucket (a leading-
axis gather), so the host touches the device once per chunk instead of twice
per step. With a mesh, the batch dimension is sharded across ICI and GSPMD
inserts the gradient all-reduce (SURVEY.md §2.6).

Deviation from the reference (documented): the reference's DataLoader yields a
short final batch per epoch (drop_last=False). Phases 1–2 reproduce that exactly
via weighted masks; the GAN phase instead samples fixed-size batches without
replacement per step (shape-static, distribution-equivalent).
"""

from __future__ import annotations

import dataclasses
import os
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import optax

from eegsynth.losses.timegan import (
    acf_loss, add_instance_noise, bce, cov_loss, recon_loss, smooth_labels,
    sup_loss, throttle_scale,
)
from eegsynth.models.timegan import (
    TimeGANConfig, adaptive_dims, decode, disc_inputs_multigru, encode,
    fused_disc_inputs,
    fused_gen_refine, fused_gen_refine_carry, fused_reconstruct, gen_latent,
    reconstruct, refine_latent, sample_noise, timegan_init,
)
from eegsynth.nn.gru import gru_stack_apply
from eegsynth.nn.spectral_norm import sn_dense_apply
from eegsynth.train import checkpoint as ckpt_io
from eegsynth.train.sharding import (
    constrain_batch, is_coordinator, round_batch_to_mesh,
)


@dataclasses.dataclass(frozen=True)
class TimeGANHParams:
    """Knobs of train_single_npz (train_timegan.py:281-303); defaults match the
    committed timegan_config.json."""
    batch_size: int = 64
    ae_epochs: int = 120
    sup_epochs: int = 150
    gan_steps: int = 8000
    lr_g: float = 1e-3
    lr_d: float = 3e-4
    beta1: float = 0.5
    beta2: float = 0.9
    alpha_sup: float = 3.0
    beta_rec: float = 0.15
    label_smooth: float = 0.2
    inst_noise_start: float = 0.25
    inst_noise_end: float = 0.05
    grad_clip: float = 0.5
    layers: int = 1
    dropout: float = 0.2
    seed: int = 42
    r1_gamma: float = 1.0
    d_min_acc: float = 0.45
    d_max_acc: float = 0.68
    gamma_cov: float = 0.03
    gamma_acf: float = 0.02
    acf_max_lag: int = 48
    chunk: int = 500          # GAN steps per device dispatch (ours)
    # Fused-scan GAN step (ours): run the D-step E/G/S forwards and the G-step
    # G→S→R / E→R recurrences as single fused scans instead of composed
    # per-network scans. Numerics are identical (same math, same RNG stream);
    # the tradeoff is per-step projection work inside the cell vs the HBM
    # round-trips of the (B,T,H) latents between scans. Measured on v5e:
    # composed wins at the sequential trainer's reference sizes (B≤64, nb=1),
    # fused wins for the vmapped multi-bucket trainer where the effective
    # batch is nb× larger (see BASELINE.md). Single-layer configs only
    # (fused cells don't thread inter-layer dropout).
    fused_step: bool = False
    # Pallas fused multi-network kernel for the vmapped D-step inputs (ours):
    # run ALL stacked buckets' E / G→S recurrences in one pallas_call with the
    # carried hidden states VMEM-resident across the T grid steps (SURVEY §7).
    # Only takes effect with fused_step under the vmapped multi-bucket trainer
    # (single-chip; the custom_vmap rule falls back to the XLA fused scan when
    # the geometry doesn't apply). MEASURED NEGATIVE at the reference geometry:
    # 60.2 vs 66.2 aggregate steps/s (BASELINE.md roofline) — opt-in only.
    pallas_multigru: bool = False
    # A/B instrument for the documented GAN-phase sampling deviation (module
    # docstring): emulate the reference's epoch-cycled shuffled DataLoader —
    # one permutation per epoch, consumed in consecutive size-B slices — vs
    # the default independent per-step permutation batches. Shape-static, so
    # the short final batch is dropped (drop_last=True emulation; the
    # reference uses drop_last=False) and the cycle restarts at chunk
    # boundaries. Sequential (non-vmapped) trainer only. QUALITY.md records
    # the measured A/B equivalence.
    epoch_cycle: bool = False


def _multistep_lr(init: float, milestones: tuple[int, ...], gamma: float = 0.5):
    """torch MultiStepLR semantics on the optax update count
    (train_timegan.py:348-349)."""
    ms = jnp.asarray(milestones)

    def sched(count):
        return init * gamma ** jnp.sum(count >= ms)

    return sched


# R1 second-derivative strategy: True = forward-over-reverse surrogate
# (identical value & θ-gradient to the direct penalty, measured faster on
# v5e — see BASELINE.md), False = direct reverse-over-reverse penalty.
_R1_FWD_OVER_REV = True


def _make_opt(lr, clip: float, beta1: float, beta2: float):
    return optax.chain(optax.clip_by_global_norm(clip), optax.adam(lr, b1=beta1, b2=beta2))


def _disc_apply(d_params, h, train: bool, dropout: float = 0.0, key=None):
    """H → (p(real), updated d) — GRU last step + spectral-norm head + sigmoid
    (timegan_model.py:86-98). Uses the XLA recurrence: the R1 penalty takes a
    second derivative through this forward, which the Pallas kernel's
    first-order custom VJP cannot provide."""
    y = gru_stack_apply(d_params["gru"], h, impl="xla",
                        dropout=dropout, key=key, train=train)
    logits, fc_new = sn_dense_apply(d_params["fc"], y[:, -1, :], train=train)
    return jax.nn.sigmoid(logits), {**d_params, "fc": fc_new}


def _dropout_cfg(hp: "TimeGANHParams"):
    """Inter-layer GRU dropout is a multi-layer-only feature (torch semantics:
    dropout applies BETWEEN layers, so the reference's default layers=1 has
    none in effect). Returns (rate, active)."""
    active = hp.dropout > 0.0 and hp.layers > 1
    return (hp.dropout if active else 0.0), active


def _padded_batches(key, n: int, batch: int):
    """Shuffled epoch split into fixed-size batches with validity weights —
    exact DataLoader(shuffle=True, drop_last=False) semantics under static
    shapes. Returns (idx (nb, B), w (nb, B))."""
    nb = -(-n // batch)
    perm = jax.random.permutation(key, n)
    pad = nb * batch - n
    idx = jnp.concatenate([perm, jnp.zeros((pad,), perm.dtype)])
    w = jnp.concatenate([jnp.ones((n,), jnp.float32), jnp.zeros((pad,), jnp.float32)])
    return idx.reshape(nb, batch), w.reshape(nb, batch)


def _run_logged_phase(epoch_fn, params, opt_state, X, key, n_epochs: int,
                      tag: str, label: str, group: int = 32):
    """Drive a per-epoch jitted phase with deferred log pulls.

    Epoch dispatches enqueue asynchronously; the per-epoch loss scalars are
    pulled and printed one GROUP behind the dispatch frontier, so the tunnel
    round-trip of each pull overlaps the next group's device work instead of
    serializing every epoch (a per-epoch ``float(loss)`` costs ~170 ms through
    the remote-compile tunnel — ~45 s of pure sync over the reference's
    120 AE + 150 supervisor epochs). Same pattern as the CGAN chunk-log
    pipeline in train/cgan.py. RNG stream is identical to the eager loop:
    one ``split(key)`` per epoch, in order."""
    pending = None  # (first epoch index of the group, [device loss scalars])

    def flush():
        nonlocal pending
        if pending is None:
            return
        ep0, devs = pending
        pending = None
        for i, v in enumerate(jax.device_get(devs)):
            print(f"[{tag}] epoch {ep0 + i}/{n_epochs}  {label}={float(v):.5f}",
                  flush=True)

    buf, ep0 = [], 1
    for ep in range(1, n_epochs + 1):
        key, sub = jax.random.split(key)
        params, opt_state, loss = epoch_fn(params, opt_state, X, sub)
        buf.append(loss)
        if len(buf) == group:
            flush()                     # previous group — already finished
            pending = (ep0, buf)
            buf, ep0 = [], ep + 1
    if buf:
        flush()
        pending = (ep0, buf)
    flush()
    return params, opt_state, key


# --------------------------------------------------------------------------
# Phase factories: each returns one jitted epoch/chunk function.
# --------------------------------------------------------------------------

def make_ae_epoch(hp: TimeGANHParams, opt, mesh=None):
    do_rate, do_active = _dropout_cfg(hp)

    @jax.jit
    def ae_epoch(params, opt_state, X, key):
        n = X.shape[0]
        if do_active:  # extra split only when dropout is live — keeps the
            key, k_do = jax.random.split(key)  # default RNG stream unchanged
        idx_b, w_b = _padded_batches(key, n, min(hp.batch_size, n))
        nb = idx_b.shape[0]
        dkeys = (jax.random.split(k_do, nb) if do_active
                 else jnp.zeros((nb, 2), jnp.uint32))

        def batch_step(carry, inp):
            params, opt_state = carry
            idx, w, dk = inp
            x = constrain_batch(X[idx], mesh)

            def loss_fn(er):
                p = {**params, **er}
                x_hat = reconstruct(p, x, dropout=do_rate,
                                    key=dk if do_active else None, train=True)
                return recon_loss(x, x_hat, weight=w)

            er = {"embedder": params["embedder"], "recovery": params["recovery"]}
            loss, grads = jax.value_and_grad(loss_fn)(er)
            updates, opt_state = opt.update(grads, opt_state, er)
            er = optax.apply_updates(er, updates)
            return ({**params, **er}, opt_state), loss * jnp.sum(w)

        (params, opt_state), losses = jax.lax.scan(
            batch_step, (params, opt_state), (idx_b, w_b, dkeys))
        return params, opt_state, jnp.sum(losses) / n

    return ae_epoch


def make_sup_epoch(hp: TimeGANHParams, opt, mesh=None):
    do_rate, do_active = _dropout_cfg(hp)

    @jax.jit
    def sup_epoch(params, opt_state, X, key):
        n = X.shape[0]
        if do_active:
            key, k_do = jax.random.split(key)
        idx_b, w_b = _padded_batches(key, n, min(hp.batch_size, n))
        nb = idx_b.shape[0]
        dkeys = (jax.random.split(k_do, nb) if do_active
                 else jnp.zeros((nb, 2), jnp.uint32))

        def batch_step(carry, inp):
            params, opt_state = carry
            idx, w, dk = inp
            x = constrain_batch(X[idx], mesh)
            if do_active:
                dk_e, dk_s = jax.random.split(dk)
            # torch keeps the module in train mode here, so inter-layer
            # dropout stays active even under the encoder's no-grad
            h = jax.lax.stop_gradient(encode(
                params, x, dropout=do_rate,
                key=dk_e if do_active else None, train=True))

            def loss_fn(sup):
                p = {**params, "supervisor": sup}
                h_pred = refine_latent(p, h[:, :-1, :], dropout=do_rate,
                                       key=dk_s if do_active else None,
                                       train=True)
                se = (h_pred - h[:, 1:, :]) ** 2
                wr = w.reshape(-1, 1, 1)
                return jnp.sum(se * wr) / (jnp.sum(w) * se.shape[1] * se.shape[2])

            loss, grads = jax.value_and_grad(loss_fn)(params["supervisor"])
            updates, opt_state = opt.update(grads, opt_state, params["supervisor"])
            sup = optax.apply_updates(params["supervisor"], updates)
            return ({**params, "supervisor": sup}, opt_state), loss * jnp.sum(w)

        (params, opt_state), losses = jax.lax.scan(
            batch_step, (params, opt_state), (idx_b, w_b, dkeys))
        return params, opt_state, jnp.sum(losses) / n

    return sup_epoch


def make_gan_opts(hp: TimeGANHParams, milestones=None):
    """Adversarial-phase optimizer pair: Adam + global-norm clip with the
    reference's MultiStepLR halving at 50%/75% of gan_steps
    (train_timegan.py:331-349). ONE constructor shared by the trainers,
    bench.py, and the multichip dryrun, so the measured protocol cannot
    drift from the trained one."""
    if milestones is None:
        milestones = (hp.gan_steps // 2, int(hp.gan_steps * 0.75))
    optD = _make_opt(_multistep_lr(hp.lr_d, milestones), hp.grad_clip,
                     hp.beta1, hp.beta2)
    optG = _make_opt(_multistep_lr(hp.lr_g, milestones), hp.grad_clip,
                     hp.beta1, hp.beta2)
    return optD, optG


def _epoch_cycle_next(perm, cursor, key, B: int):
    """One draw of the epoch-cycled loader emulation (hp.epoch_cycle).

    ``perm`` is the current epoch's permutation of the N sample ids, ``cursor``
    the next batch slot in [0, N // B). At cursor 0 a fresh permutation is
    drawn (epoch boundary); each step consumes the next consecutive size-B
    slice, so every sample is visited exactly once per epoch (minus the
    dropped short tail — drop_last=True; shapes must stay static under jit).
    Returns (idx, perm, cursor) for threading through the scan carry.
    """
    n = perm.shape[0]
    spe = max(1, n // B)  # static steps per epoch
    fresh = jax.random.permutation(key, n).astype(perm.dtype)
    perm = jnp.where(cursor == 0, fresh, perm)
    idx = jax.lax.dynamic_slice(perm, (cursor * B,), (B,))
    cursor = ((cursor + 1) % spe).astype(cursor.dtype)
    return idx, perm, cursor


# G-step loss weights that may enter the jitted chunk as a TRACED vector
# (per-bucket tuning / vmapped weight sweeps — the same trick as
# train/cgan_sweep.py's G_WEIGHT_NAMES). Order is the reference's
# train_timegan.py:265 total-loss formula.
TIMEGAN_G_WEIGHT_NAMES = ("alpha_sup", "beta_rec", "gamma_cov", "gamma_acf")


def make_gan_chunk(cfg: TimeGANConfig, hp: TimeGANHParams, optD, optG, mesh=None):
    """One device dispatch = ``n_steps`` full D+G GAN iterations via lax.scan."""
    target_acc = 0.5 * (hp.d_min_acc + hp.d_max_acc)
    band = max(0.0, hp.d_max_acc - hp.d_min_acc)
    noise_decay = (hp.inst_noise_start - hp.inst_noise_end) / max(1, hp.gan_steps)

    do_rate, do_active = _dropout_cfg(hp)
    use_fused = hp.fused_step and not do_active and hp.layers == 1

    def one_step(B_eff, carry, step):
        # B_eff is bound per build() below (not a shared mutable closure —
        # two runners from one factory must not alias each other's batch size)
        (params, d_state, g_state, best_params, best_loss, best_step, key,
         X, n_valid, samp, gw) = carry
        key, k_idx, k_z1, k_nr, k_nf, k_lbl, k_z2, k_ng = jax.random.split(key, 8)
        if do_active:  # fresh inter-layer dropout masks per forward, as torch
            key, k_do = jax.random.split(key)
            dks = list(jax.random.split(k_do, 12))
        else:
            dks = [None] * 12
        inst = jnp.maximum(hp.inst_noise_end,
                           hp.inst_noise_start - (step - 1).astype(jnp.float32) * noise_decay)

        if samp is not None:
            # epoch-cycled DataLoader emulation (hp.epoch_cycle A/B)
            perm, cursor = samp
            idx, perm, cursor = _epoch_cycle_next(perm, cursor, k_idx, B_eff)
            samp = (perm, cursor)
        elif n_valid is None:
            # exact without-replacement batch over the full bucket
            idx = jax.random.permutation(k_idx, X.shape[0])[:B_eff]
        else:
            # padded/stacked buckets (vmapped multi-bucket training): uniform
            # with replacement over the valid prefix — shape-static per bucket
            idx = jnp.floor(jax.random.uniform(k_idx, (B_eff,))
                            * n_valid).astype(jnp.int32)
        x = constrain_batch(X[idx], mesh)
        B, T = x.shape[0], x.shape[1]

        # ---------------- D step (train_timegan.py:166-225) ----------------
        # NOTE: at the sequential trainer's sizes (nb=1, B≤64) fusing these
        # three forward-only recurrences into one scan measured 58.1 vs 58.9
        # steps/s on v5e — composed scans stay the default there. The vmapped
        # multi-bucket trainer (hp.fused_step) flips the tradeoff: with nb
        # stacked buckets the (nb,B,T,H) latents between scans are HBM
        # round-trips that the fused cell avoids (BASELINE.md).
        z = sample_noise(k_z1, B, T, cfg.z_dim)
        if use_fused and hp.pallas_multigru:
            # under the vmapped trainer the custom_vmap rule dispatches the
            # fused all-bucket Pallas kernel; unbatched it == fused_disc_inputs
            h_real, h_fake = disc_inputs_multigru(params, x, z)
        elif use_fused:
            h_real, h_fake = fused_disc_inputs(params, x, z)
        else:
            h_real = encode(params, x, dropout=do_rate, key=dks[0],
                            train=True)               # E frozen for D update
            e_hat = gen_latent(params, z, dropout=do_rate, key=dks[1], train=True)
            h_fake = refine_latent(params, e_hat, dropout=do_rate, key=dks[2],
                                   train=True)
        h_real_n = constrain_batch(add_instance_noise(k_nr, h_real, inst), mesh)
        h_fake_n = constrain_batch(add_instance_noise(k_nf, h_fake, inst), mesh)
        y_real, y_fake = smooth_labels(k_lbl, B, hp.label_smooth)

        def d_loss_fn(d_params):
            # NOTE: stacking real+fake into one 2B disc pass was measured
            # SLOWER (55.1 vs 58.8 steps/s on v5e) — the concat/split
            # materializations outweigh the saved scan at these sizes.
            d_real, d_after = _disc_apply(d_params, h_real_n, train=True,
                                          dropout=do_rate, key=dks[3])
            d_fake, d_after = _disc_apply(d_after, h_fake_n, train=True,
                                          dropout=do_rate, key=dks[4])
            loss = 0.5 * (bce(d_real, y_real) + bce(d_fake, y_fake))
            if hp.r1_gamma > 0.0:
                def score_sum(h, dp):
                    return jnp.sum(_disc_apply(dp, h, train=False,
                                               dropout=do_rate, key=dks[5])[0])
                if _R1_FWD_OVER_REV:
                    # R1 = mean_b ||∇_h D(h_b)||² differentiated wrt d_params.
                    # Writing the penalty directly makes the outer
                    # value_and_grad reverse-differentiate through the inner
                    # reverse pass (reverse-over-reverse through the GRU
                    # scan). Instead use the standard surrogate with the SAME
                    # value and the SAME θ-gradient: with v = ∇_h D at
                    # stop_grad(θ) (a constant), ∇_θ mean||∇_h D||² =
                    # (2/B)(∂²D/∂θ∂h)ᵀ v = ∇_θ (2/B)·⟨∇_h D(h;θ), v⟩, and the
                    # inner product is a directional derivative — one jvp. The
                    # outer grad then reverse-differentiates a forward-mode
                    # pass (cheap) instead of a reverse-mode one.
                    v = jax.grad(score_sum)(
                        h_real_n, jax.lax.stop_gradient(d_params))
                    dir_dot = jax.jvp(lambda h: score_sum(h, d_params),
                                      (h_real_n,), (v,))[1]
                    r1 = (2.0 * dir_dot - jnp.sum(v * v)) / B
                else:
                    grad_h = jax.grad(score_sum)(h_real_n, d_params)
                    r1 = jnp.mean(jnp.sum(grad_h.reshape(B, -1) ** 2, axis=1))
                loss = loss + 0.5 * hp.r1_gamma * r1
            acc_real = jnp.mean((d_real > 0.5).astype(jnp.float32))
            acc_fake = jnp.mean((d_fake < 0.5).astype(jnp.float32))
            acc = 0.5 * (acc_real + acc_fake)
            if band > 0:
                loss = loss * throttle_scale(acc, target_acc, band)
            return loss, (acc, d_after["fc"]["u"])

        (d_loss, (d_acc, u_new)), d_grads = jax.value_and_grad(
            d_loss_fn, has_aux=True)(params["discriminator"])
        d_updates, d_state = optD.update(d_grads, d_state, params["discriminator"])
        new_d = optax.apply_updates(params["discriminator"], d_updates)
        new_d["fc"] = {**new_d["fc"], "u": u_new}
        params = {**params, "discriminator": new_d}

        # ---------------- G step (train_timegan.py:228-276) ----------------
        z2 = sample_noise(k_z2, B, T, cfg.z_dim)

        def g_loss_fn(gser):
            p = {**params, **gser}
            if use_fused:
                # one G→S→R scan yields both h_hat and x_hat; one E→R scan
                # yields the reconstruction — 3 traversals instead of 6
                h_hat, x_hat = fused_gen_refine(p, z2, with_decode=True)
            else:
                e2 = gen_latent(p, z2, dropout=do_rate, key=dks[6], train=True)
                h_hat = refine_latent(p, e2, dropout=do_rate, key=dks[7],
                                      train=True)
            d_fake, d_after = _disc_apply(params["discriminator"],
                                          add_instance_noise(k_ng, h_hat, inst),
                                          train=True, dropout=do_rate, key=dks[8])
            g_adv = bce(d_fake, jnp.ones_like(d_fake))
            g_sup = sup_loss(h_hat)
            if use_fused:
                g_rec = recon_loss(x, fused_reconstruct(p, x))
            else:
                g_rec = recon_loss(x, reconstruct(p, x, dropout=do_rate,
                                                  key=dks[9], train=True))
                x_hat = decode(p, h_hat, dropout=do_rate, key=dks[10], train=True)
            if gw is None:
                a_sup, b_rec = hp.alpha_sup, hp.beta_rec
                g_cov_w, g_acf_w = hp.gamma_cov, hp.gamma_acf
                with_cov, with_acf = hp.gamma_cov > 0, hp.gamma_acf > 0
            else:
                # traced (len(TIMEGAN_G_WEIGHT_NAMES),) weight vector: both
                # structure terms are computed unconditionally (a traced zero
                # cannot prune the graph; zero weight still zeroes the grad)
                a_sup, b_rec, g_cov_w, g_acf_w = gw[0], gw[1], gw[2], gw[3]
                with_cov = with_acf = True
            cov_term = cov_loss(x_hat, x) if with_cov else jnp.float32(0.0)
            acf_term = (acf_loss(x_hat, x, hp.acf_max_lag)
                        if with_acf else jnp.float32(0.0))
            total = (g_adv + a_sup * g_sup + b_rec * g_rec
                     + g_cov_w * cov_term + g_acf_w * acf_term)
            return total, (g_adv, g_sup, g_rec, cov_term, acf_term, d_after["fc"]["u"])

        gser = {k: params[k] for k in ("generator", "supervisor", "embedder", "recovery")}
        (g_total, (g_adv, g_supv, g_rec, g_cov, g_acf, u_new2)), g_grads = \
            jax.value_and_grad(g_loss_fn, has_aux=True)(gser)
        g_updates, g_state = optG.update(g_grads, g_state, gser)
        gser = optax.apply_updates(gser, g_updates)
        params = {**params, **gser}
        params["discriminator"]["fc"] = {**params["discriminator"]["fc"], "u": u_new2}

        # Best-by-G-total tracking, exact per-step (train_timegan.py:410-413)
        is_best = g_total < best_loss
        best_params = jax.tree_util.tree_map(
            lambda a, b: jnp.where(is_best, a, b), params, best_params)
        best_loss = jnp.where(is_best, g_total, best_loss)
        best_step = jnp.where(is_best, step, best_step)

        logs = jnp.stack([d_loss, d_acc, g_total, g_adv, g_supv, g_rec, g_cov, g_acf])
        return (params, d_state, g_state, best_params, best_loss, best_step, key,
                X, n_valid, samp, gw), logs

    def build(batch_eff, with_valid_n: bool = False, vmapped: bool = False,
              with_weights: bool = False):
        """Build the jitted chunk runner.

        - default: exact single-bucket semantics (X as argument, permutation
          batches)
        - with_valid_n: padded bucket with a traced valid count (replacement
          sampling) — required for vmapping over stacked buckets
        - vmapped: vmap every argument except the shared step ids over a
          leading bucket axis (one dispatch trains every bucket in parallel)
        - with_weights: the runner takes a TRACED
          ``(len(TIMEGAN_G_WEIGHT_NAMES),)`` G-loss weight vector as its last
          argument ((nb, 4) when vmapped) — per-bucket weight tuning / weight
          sweeps through one executable. Omitted (default) the hp floats are
          baked in as constants, bit-identical to the pre-weights trainer.
        """
        if hp.epoch_cycle and with_valid_n:
            raise ValueError("epoch_cycle is a sequential-trainer A/B "
                             "instrument; unsupported with stacked buckets")
        step_fn = lambda carry, step: one_step(batch_eff, carry, step)

        def chunk(params, d_state, g_state, best_params, best_loss, best_step,
                  key, X, n_valid, g_weights, steps):
            # cursor 0 ⇒ the first step draws a fresh epoch permutation (the
            # cycle restarts each chunk — at most one partial epoch per 500
            # steps is re-dealt, documented in TimeGANHParams.epoch_cycle)
            samp = ((jnp.zeros(X.shape[0], jnp.int32), jnp.int32(0))
                    if hp.epoch_cycle else None)
            carry = (params, d_state, g_state, best_params, best_loss, best_step,
                     key, X, n_valid if with_valid_n else None, samp,
                     g_weights if with_weights else None)
            # unroll=2 measured 59.2 vs 58.7 steps/s (noise) at ~2× the chunk
            # compile time — not worth it
            carry, logs = jax.lax.scan(step_fn, carry, steps)
            return carry[:7], logs

        if vmapped:
            chunk = jax.vmap(chunk,
                             in_axes=(0, 0, 0, 0, 0, 0, 0, 0, 0,
                                      0 if with_weights else None, None))

        if with_weights:
            @jax.jit
            def gan_chunk(params, d_state, g_state, best_params, best_loss,
                          best_step, key, step0, n_steps_arr, X, n_valid,
                          g_weights):
                steps = step0 + n_steps_arr
                return chunk(params, d_state, g_state, best_params, best_loss,
                             best_step, key, X, n_valid, g_weights, steps)
        else:
            @jax.jit
            def gan_chunk(params, d_state, g_state, best_params, best_loss,
                          best_step, key, step0, n_steps_arr, X, n_valid=0):
                steps = step0 + n_steps_arr  # (chunk,) global 1-based step ids
                return chunk(params, d_state, g_state, best_params, best_loss,
                             best_step, key, X, n_valid, None, steps)

        return gan_chunk

    return build


# --------------------------------------------------------------------------
# Full driver (train_single_npz parity, train_timegan.py:281-422)
# --------------------------------------------------------------------------

def train_single_npz(npz_path, out_dir, device=None, mesh=None,
                     log_every: int = 100, profile_dir=None, resume: bool = False,
                     ckpt_format: str = "orbax", async_ckpt: bool | None = None,
                     **hparams) -> dict:
    """Train one TimeGAN on one (posture, condition) bucket NPZ.

    Writes the reference artifact set into ``out_dir``: train_log.csv (same
    columns), ckpt_latest / ckpt_best ({step, model, optG, optD, meta}),
    synthetic.npz. Returns a summary dict incl. measured GAN steps/sec.
    ``profile_dir`` wraps the adversarial phase in a ``jax.profiler`` trace
    (the reference has no profiling; SURVEY.md §5).

    Checkpoints default to orbax with async saves — through the remote TPU
    attachment a synchronous state pull costs seconds per save, so the async
    default recovers ~1.8x wall at the reference config (BASELINE.md).
    ``ckpt_format="npz"`` writes ckpt_latest.npz / ckpt_best.npz instead for
    reference-artifact parity runs (always synchronous). ``async_ckpt=None``
    means "async iff orbax". All loaders (resume here, generate_long_synth,
    serve_synthesis) accept either format.
    """
    npz_path, out_dir = Path(npz_path), Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    hp = TimeGANHParams(**hparams)
    if ckpt_format not in ("npz", "orbax"):
        raise ValueError(f"ckpt_format must be 'npz' or 'orbax', got {ckpt_format!r}")
    if async_ckpt and ckpt_format != "orbax":
        raise ValueError("async_ckpt requires ckpt_format='orbax'")
    if async_ckpt is None:
        async_ckpt = ckpt_format == "orbax"
    ext = ".npz" if ckpt_format == "npz" else ".orbax"

    data = np.load(npz_path)
    X_host = data["X"].astype(np.float32)
    N, T, C = X_host.shape
    z_dim, h_dim = adaptive_dims(C, T)
    cfg = TimeGANConfig(x_dim=C, z_dim=z_dim, h_dim=h_dim,
                        num_layers=hp.layers, dropout=hp.dropout)

    log_file = out_dir / "train_log.csv"
    # resume restores the NEWEST ckpt_latest regardless of backend format
    # (find_checkpoint arbitrates by mtime — a run previously resumed under a
    # different --ckpt_format must not silently restore stale weights); new
    # checkpoints are written in the requested format
    ckpt_latest = out_dir / f"ckpt_latest{ext}"
    if resume:
        found = ckpt_io.find_checkpoint(out_dir, "ckpt_latest")
        ckpt_latest = found if found is not None else ckpt_latest
    resuming = resume and ckpt_latest.exists()
    write_artifacts = is_coordinator()  # multi-host: coordinator writes only
    if not resuming and write_artifacts:
        with open(log_file, "w") as f:
            f.write("step,phase,loss_D,acc_D,loss_G,loss_adv,loss_sup,loss_rec,loss_cov,loss_acf\n")

    print(f"==> {npz_path.name} | N={N} T={T} C={C}  z_dim={z_dim} h_dim={h_dim}", flush=True)

    key = jax.random.key(hp.seed)
    key, k_init = jax.random.split(key)
    params = timegan_init(k_init, cfg)
    X = jnp.asarray(X_host)

    if not resuming:
        # Phase 1: autoencoder (E+R)
        optER = _make_opt(hp.lr_g, hp.grad_clip, hp.beta1, hp.beta2)
        er0 = {"embedder": params["embedder"], "recovery": params["recovery"]}
        opt_state = optER.init(er0)
        ae_epoch = make_ae_epoch(hp, optER, mesh)
        params, opt_state, key = _run_logged_phase(
            ae_epoch, params, opt_state, X, key, hp.ae_epochs, "AE", "recon")

        # Phase 2: supervisor
        optS = _make_opt(hp.lr_g, hp.grad_clip, hp.beta1, hp.beta2)
        opt_state = optS.init(params["supervisor"])
        sup_epoch = make_sup_epoch(hp, optS, mesh)
        params, opt_state, key = _run_logged_phase(
            sup_epoch, params, opt_state, X, key, hp.sup_epochs, "SUP", "sup")

    # Phase 3: adversarial
    optD, optG = make_gan_opts(hp)
    d_state = optD.init(params["discriminator"])
    gser = {k: params[k] for k in ("generator", "supervisor", "embedder", "recovery")}
    g_state = optG.init(gser)

    batch_eff = round_batch_to_mesh(min(hp.batch_size, N), mesh)
    gan_chunk = make_gan_chunk(cfg, hp, optD, optG, mesh)(batch_eff)

    best_params = params
    best_loss = jnp.float32(np.inf)
    best_step = jnp.int32(0)
    start_step = 0
    if resuming:
        # Mid-GAN-phase resume (the reference only resumes its CGAN; SURVEY §5)
        trees, ck_meta = ckpt_io.load_checkpoint(
            ckpt_latest, {"model": params, "optG": g_state, "optD": d_state})
        params, g_state, d_state = trees["model"], trees["optG"], trees["optD"]
        start_step = int(ck_meta.get("step", 0))
        best_path = ckpt_io.find_checkpoint(out_dir, "ckpt_best")
        if best_path is not None:
            btrees, bmeta = ckpt_io.load_checkpoint(best_path, {"model": params})
            best_params = btrees["model"]
            best_loss = jnp.float32(bmeta.get("best_loss", np.inf))
            best_step = jnp.int32(bmeta.get("step", 0))
        # high tag: fold_in(k, i) == split(k, n)[i] for threefry, so a bare
        # start_step < 2 would collide with this function's own split(key)
        key = jax.random.fold_in(key, 0x5EED0000 + start_step)
        print(f"[resume] {npz_path.name} from step {start_step}", flush=True)
    # x_dim/layers beyond the reference's meta: loaders (serve_synthesis,
    # generate_long_synth) can rebuild non-default geometries without the
    # real NPZ on hand
    meta = {"npz": npz_path.name, "z_dim": z_dim, "h_dim": h_dim,
            "x_dim": C, "layers": hp.layers,
            "fs": float(data["fs"]) if "fs" in data.files else 128.0}

    def save(path, p, dstate_, gstate_, step, extra_meta=None):
        if not write_artifacts:
            return
        ckpt_io.save_checkpoint(path, {"model": p, "optG": gstate_, "optD": dstate_},
                                {**meta, "step": int(step), **(extra_meta or {})},
                                async_save=async_ckpt)

    prof = None
    if profile_dir is not None:
        prof = jax.profiler.trace(str(profile_dir))
        prof.__enter__()
    t_start = time.perf_counter()
    done = start_step
    last_saved_best = int(best_step) if resuming else -1
    while done < hp.gan_steps:
        n_steps = min(hp.chunk, hp.gan_steps - done)
        key, sub = jax.random.split(key)
        (params, d_state, g_state, best_params, best_loss, best_step, _), logs = gan_chunk(
            params, d_state, g_state, best_params, best_loss, best_step,
            sub, jnp.int32(done), jnp.arange(1, n_steps + 1, dtype=jnp.int32), X)
        logs = np.asarray(logs)
        done += n_steps
        with open(log_file if write_artifacts else os.devnull, "a") as f:
            for i in range(n_steps):
                s = done - n_steps + i + 1
                row = logs[i]
                f.write(f"{s},GAN," + ",".join(repr(float(v)) for v in row) + "\n")
                if s % log_every == 0:
                    print(f"[GAN] step {s}/{hp.gan_steps}  D:loss={row[0]:.4f} "
                          f"acc≈{row[1]:.2f}  G:total={row[2]:.4f} (adv={row[3]:.4f}, "
                          f"sup={row[4]:.4f}, rec={row[5]:.4f}, cov={row[6]:.4f}, "
                          f"acf={row[7]:.4f})", flush=True)
        # every-500-step cadence (train_timegan.py:407): fire whenever a
        # 500 boundary was crossed, so a non-multiple --chunk still saves
        if done // 500 > (done - n_steps) // 500 or done == hp.gan_steps:
            save(out_dir / f"ckpt_latest{ext}", params, d_state, g_state, done)
        # ckpt_best.pt semantics (train_timegan.py:410-413) without redundant
        # device→host pulls: only rewrite when the on-device best advanced
        bs = int(best_step)
        if bs != last_saved_best:
            save(out_dir / f"ckpt_best{ext}", best_params, d_state, g_state,
                 bs, {"best": True, "best_loss": float(best_loss)})
            last_saved_best = bs
        # no-op unless the fault-injection env var is set (crash-recovery tests)
        from eegsynth.train.faults import maybe_inject_crash
        maybe_inject_crash(done)
    ckpt_io.wait_for_saves()  # join any in-flight async orbax save
    gan_seconds = time.perf_counter() - t_start
    if prof is not None:
        prof.__exit__(None, None, None)
    steps_per_sec = ((hp.gan_steps - start_step) / gan_seconds
                     if gan_seconds > 0 else float("nan"))
    print(f"[GAN] {hp.gan_steps} steps in {gan_seconds:.1f}s → {steps_per_sec:.2f} steps/s",
          flush=True)

    # Final sampling, same count as real (train_timegan.py:416-421)
    key, sub = jax.random.split(key)
    X_hat = synthesize(params, cfg, sub, N, T)
    if write_artifacts:
        np.savez_compressed(out_dir / "synthetic.npz",
                            X=np.asarray(X_hat, dtype=np.float32))
        print(f"Saved synthetic: {out_dir / 'synthetic.npz'}", flush=True)

    return {"steps_per_sec": steps_per_sec, "gan_seconds": gan_seconds,
            "best_step": int(best_step), "best_loss": float(best_loss),
            "params": params, "cfg": cfg}


# Module-level jits: serve_synthesis calls synthesize per HTTP request, and a
# per-call `@jax.jit` closure would re-trace every time (jit caches on function
# identity) — hoisting keeps warm requests at executable-lookup cost.
@jax.jit
def _synth_run(p, z):
    _, x_hat = fused_gen_refine(p, z, with_decode=True)
    return x_hat.astype(jnp.float32)  # no-op at f32; bf16 returns f32 to callers


@jax.jit
def _synth_step(p, z, carry):
    carry, (_, x_hat) = fused_gen_refine_carry(p, z, carry, with_decode=True)
    return x_hat.astype(jnp.float32), carry


def synthesize(params, cfg: TimeGANConfig, key, n: int, seq_len: int,
               batch: int | None = None,
               time_chunk: int | None = None,
               precision: str = "f32",
               mesh=None):
    """Z → decode(refine(gen(Z))) (train_timegan.py:416-419;
    generate_long_synth.py:117-121). Static shape per (n, seq_len).

    Uses the fused single-scan G→S→R cascade (models.timegan.fused_gen_refine):
    the composed three-scan path materializes the (n, T, z/h) intermediate
    latents to HBM between scans, which dominates at synthesis batch sizes —
    measured 137.5k vs 15.8k windows/s at n=4096 on v5e (8.7×). Parity with the
    composed path is exact (tests/test_timegan_fused.py).

    ``batch`` micro-batches huge n at one compiled shape to cap memory.
    ``time_chunk`` streams the sequence axis: the GRU hidden states are
    carried across fixed-(batch, time_chunk) dispatches, so ANY requested
    length reuses one compiled executable, and chunk outputs accumulate on the
    host — device memory stays bounded at one (batch, time_chunk, C) buffer.
    A chunked run over the SAME noise is bit-identical to the one-shot scan
    (GRUs are strictly causal; tests/test_timegan_fused.py). Note on seeds:
    noise keys are split per micro-batch and per time chunk, so the same seed
    reproduces outputs only for identical (n, seq_len, batch, time_chunk) —
    requests of different sizes draw different noise. Falls back to one-shot
    for multi-layer stacks (not the reference configuration).

    ``precision="bf16"`` runs the cascade in bfloat16 (master params stay f32;
    noise is drawn in f32 then cast, so the sample grid matches the reference
    torch.rand source; outputs return in f32). The cascade is HBM-bound at
    synthesis batches — see BASELINE.md for the measured speedup — and bf16's
    f32 exponent range keeps the bounded GRU recurrence stable; quality parity
    is verified in tests/test_precision.py and QUALITY.md.

    ``mesh`` shards the batch axis over the mesh's devices (params replicated,
    noise split on the leading dim; GSPMD partitions the scan — per-window
    GRU chains are independent, so no collectives are inserted). Dispatch
    batches round up to a device-count multiple and slice back, so any ``n``
    works. This is SURVEY §5's "batch sharded across devices" long-sequence
    plan item; equivalence to the unsharded path is tested on an 8-device
    CPU mesh (tests/test_precision.py)."""
    from eegsynth.models.timegan import _fusable, cascade_init_carry
    from eegsynth.nn.precision import cast_floating, compute_dtype

    dtype = compute_dtype(precision)
    if dtype != jnp.float32:
        params = cast_floating(params, dtype)
    cast = (lambda z: z.astype(dtype)) if dtype != jnp.float32 else (lambda z: z)

    ndev = 1
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec
        axis = mesh.axis_names[0]
        ndev = int(mesh.devices.size)
        params = jax.device_put(params, NamedSharding(mesh, PartitionSpec()))
        _zs = NamedSharding(mesh, PartitionSpec(axis))  # leading dim split
        shard = lambda t: jax.device_put(t, _zs)
        cast_ = cast
        cast = lambda z: shard(cast_(z))

    chunked = (time_chunk is not None and time_chunk < seq_len
               and _fusable(params))
    if not chunked:
        run_batch = lambda p, k, b: _synth_run(
            p, cast(sample_noise(k, b, seq_len, cfg.z_dim)))
    else:
        def run_batch(p, k, b):
            # chunk outputs land on HOST so device memory stays bounded at one
            # (b, time_chunk, C) buffer regardless of seq_len
            carry = cascade_init_carry(p, b, dtype)
            if mesh is not None:
                carry = jax.device_put(carry, _zs)
            pieces = []
            for t0 in range(0, seq_len, time_chunk):
                k, sub = jax.random.split(k)
                z = sample_noise(sub, b, time_chunk, cfg.z_dim)  # static shape
                x, carry = _synth_step(p, cast(z), carry)
                pieces.append(np.asarray(x[:, :min(time_chunk, seq_len - t0)]))
            return np.concatenate(pieces, axis=1)

    if batch is None or batch >= n:
        b = -(-n // ndev) * ndev           # round up so the batch dim shards
        out = run_batch(params, key, b)
        return out[:n] if b != n else out
    batch = -(-batch // ndev) * ndev
    pieces = []
    for i in range(0, n, batch):
        key, sub = jax.random.split(key)
        m = min(batch, n - i)
        pieces.append(np.asarray(run_batch(params, sub, batch)[:m]))
    return np.concatenate(pieces, axis=0)
