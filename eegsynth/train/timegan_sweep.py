"""Vmapped TimeGAN G-loss-weight sweep: S settings of one bucket in one job.

The reference tunes ONE global weight set by hand (timegan_config.json:24-27:
alpha_sup/beta_rec/gamma_cov/gamma_acf) for all 18 buckets. Here the sweep
axis becomes a vmap axis over ``make_gan_chunk(..., with_weights=True)``'s
traced (S, 4) weight matrix (train/timegan.py TIMEGAN_G_WEIGHT_NAMES — the
same traced-vector trick as train/cgan_sweep.py): one executable advances
every weight setting simultaneously on IDENTICAL data with IDENTICAL RNG
streams (same init, same batches, same noise), isolating the weight effect
from GAN run-to-run variance. Built to tune per-bucket weights for the
vmapped trainer's ``bucket_weights`` knob (QUALITY.md seed-repeat table's one
losing cell, posture2_with_exo acf).
"""

from __future__ import annotations

import json
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from eegsynth.models.timegan import TimeGANConfig, adaptive_dims, timegan_init
from eegsynth.train import checkpoint as ckpt_io
from eegsynth.train.timegan import (
    TIMEGAN_G_WEIGHT_NAMES, TimeGANHParams, _make_opt, make_gan_chunk,
    make_gan_opts, synthesize,
)
from eegsynth.train.timegan_multi import _advance_keys, _make_pre_phase


def timegan_weight_matrix(hp: TimeGANHParams, grid: list[dict]) -> np.ndarray:
    """(S, 4) f32: hp defaults overridden per sweep point."""
    W = np.zeros((len(grid), len(TIMEGAN_G_WEIGHT_NAMES)), np.float32)
    for i, overrides in enumerate(grid):
        unknown = set(overrides) - set(TIMEGAN_G_WEIGHT_NAMES)
        if unknown:
            raise ValueError(f"unsweepable weights {sorted(unknown)}; "
                             f"sweepable: {TIMEGAN_G_WEIGHT_NAMES}")
        for j, n in enumerate(TIMEGAN_G_WEIGHT_NAMES):
            W[i, j] = float(overrides.get(n, getattr(hp, n)))
    return W


def sweep_bucket(npz_path, out_root, grid: list[dict], log=print,
                 **hparams) -> list[dict]:
    """Train len(grid) weight settings of ONE bucket simultaneously.

    Every sweep point sees the same data, init, batch indices, and noise
    (identical keys across the stacked axis) — only the traced G-loss weight
    vector differs. Writes ``{out_root}/sweep{i}/`` with hparams.json and
    ckpt_latest/ckpt_best + synthetic.npz per point (the standard run-dir
    contract, so eval CLIs consume sweep points like any run).
    """
    hp = TimeGANHParams(**{"fused_step": True, **hparams})
    data = np.load(npz_path)
    Xb = data["X"].astype(np.float32)
    fs = float(data["fs"]) if "fs" in data.files else 128.0
    N, T, C = Xb.shape
    S = len(grid)
    W = jnp.asarray(timegan_weight_matrix(hp, grid))
    out_root = Path(out_root)

    z_dim, h_dim = adaptive_dims(C, T)
    cfg = TimeGANConfig(x_dim=C, z_dim=z_dim, h_dim=h_dim,
                        num_layers=hp.layers, dropout=hp.dropout)
    log(f"[tsweep] {Path(npz_path).stem}: {S} weight settings | N={N} T={T} "
        f"C={C} z={z_dim} h={h_dim}")

    # identical per-point streams: broadcast ONE key across the sweep axis
    key0 = jax.random.key(hp.seed)
    keys = jnp.broadcast_to(key0[None], (S,) + key0.shape)
    params = jax.vmap(timegan_init, in_axes=(0, None))(keys, cfg)
    keys = _advance_keys(keys, 1)
    X = jnp.broadcast_to(jnp.asarray(Xb)[None], (S, N, T, C))
    n_valid = jnp.full((S,), N, jnp.float32)

    steps_per_epoch = -(-N // min(hp.batch_size, N))

    optER = _make_opt(hp.lr_g, hp.grad_clip, hp.beta1, hp.beta2)
    er0 = jax.vmap(lambda p: {"embedder": p["embedder"],
                              "recovery": p["recovery"]})(params)
    # _make_pre_phase's phase returns (params, opt_state, carried_keys,
    # losses); the carried keys are dropped because the sweep advances its
    # own per-phase tag stream below (matching train_all_buckets).
    params, _, _, ae_losses = _make_pre_phase(hp, optER, "ae")(
        params, jax.vmap(optER.init)(er0), keys, X,
        n_valid.astype(jnp.int32), hp.ae_epochs * steps_per_epoch)
    keys = _advance_keys(keys, 2)
    optS = _make_opt(hp.lr_g, hp.grad_clip, hp.beta1, hp.beta2)
    params, _, _, sup_losses = _make_pre_phase(hp, optS, "sup")(
        params, jax.vmap(lambda p: optS.init(p["supervisor"]))(params), keys, X,
        n_valid.astype(jnp.int32), hp.sup_epochs * steps_per_epoch)
    keys = _advance_keys(keys, 3)
    log(f"[tsweep] pre-phases done (recon≈{float(ae_losses[0, -1]):.5f}, "
        f"sup≈{float(sup_losses[0, -1]):.5f})")

    optD, optG = make_gan_opts(hp)
    d_state = jax.vmap(lambda p: optD.init(p["discriminator"]))(params)
    g_state = jax.vmap(lambda p: optG.init(
        {k: p[k] for k in ("generator", "supervisor", "embedder",
                           "recovery")}))(params)
    gan_chunk = make_gan_chunk(cfg, hp, optD, optG, None)(
        min(hp.batch_size, N), with_valid_n=True, vmapped=True,
        with_weights=True)

    best_params = params
    best_loss = jnp.full((S,), jnp.inf, jnp.float32)
    best_step = jnp.zeros((S,), jnp.int32)
    t0 = time.perf_counter()
    done, last = 0, None
    while done < hp.gan_steps:
        n_steps = min(hp.chunk, hp.gan_steps - done)
        keys = _advance_keys(keys, 4)
        (params, d_state, g_state, best_params, best_loss, best_step, _), logs = \
            gan_chunk(params, d_state, g_state, best_params, best_loss,
                      best_step, keys, jnp.int32(done),
                      jnp.arange(1, n_steps + 1, dtype=jnp.int32), X, n_valid, W)
        done += n_steps
        last = logs
    g_last = np.asarray(last)[:, -1, 2]
    dt = time.perf_counter() - t0
    log(f"[tsweep] {S}×{hp.gan_steps} GAN steps in {dt:.1f}s "
        f"({S * hp.gan_steps / dt:.1f} aggregate steps/s) | final G "
        + " ".join(f"{v:.3f}" for v in g_last))

    host = jax.device_get({"model": params, "best": best_params,
                           "best_loss": best_loss, "best_step": best_step})
    results = []
    meta_base = {"z_dim": z_dim, "h_dim": h_dim, "x_dim": C,
                 "layers": hp.layers, "fs": fs,
                 "npz": Path(npz_path).name}
    for i, overrides in enumerate(grid):
        d = out_root / f"sweep{i}"
        d.mkdir(parents=True, exist_ok=True)
        resolved = dict(zip(TIMEGAN_G_WEIGHT_NAMES, np.asarray(W[i]).tolist()))
        take = lambda tree: jax.tree_util.tree_map(lambda a: np.asarray(a[i]),
                                                   tree)
        with open(d / "hparams.json", "w") as f:
            json.dump({**resolved, "sweep_overrides": overrides,
                       "gan_steps": hp.gan_steps, "seed": hp.seed}, f, indent=2)
        ckpt_io.save_checkpoint(d / "ckpt_latest.npz",
                                {"model": take(host["model"])},
                                {**meta_base, "step": hp.gan_steps})
        ckpt_io.save_checkpoint(d / "ckpt_best.npz",
                                {"model": take(host["best"])},
                                {**meta_base, "best": True,
                                 "step": int(host["best_step"][i]),
                                 "best_loss": float(host["best_loss"][i])})
        # same synthesis noise for every point — eval differences are pure
        # weight effects, not generation-RNG noise
        key_i = jax.random.key(hp.seed ^ 0x5eed)
        X_hat = synthesize(take(host["model"]), cfg, key_i, N, T)
        np.savez_compressed(d / "synthetic.npz",
                            X=np.asarray(X_hat, np.float32))
        results.append({"dir": str(d), "weights": resolved,
                        "final_g": float(g_last[i]),
                        "best_step": int(host["best_step"][i])})
    return results
